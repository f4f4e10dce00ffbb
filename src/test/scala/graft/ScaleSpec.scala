package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Scale-tooling specs: salting, two-phase agg, bucketing, and
  * partitioning-invariance of results. */
class ScaleSpec extends SparkSpec {

  test("salted join matches plain join on skewed keys") {
    import spark.implicits._
    // 90% of rows share one key — the classic hot key
    val large = (1 to 5000).map(i =>
      (if (i % 10 == 0) i.toLong else 1L, i.toDouble)).toDF("k", "v")
    val small = Seq((1L, "hot"), (20L, "a"), (30L, "b")).toDF("k", "name")
    val plain = large.join(small, Seq("k"), "inner")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("two-phase aggregation matches direct aggregation") {
    import spark.implicits._
    val df = (1 to 10000).map(i => ((i % 3).toLong, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    val twoPhase = Skew.twoPhaseAgg(df, Seq("k"), 16, Map(
        "total" -> (("v", (c: org.apache.spark.sql.Column) => sum(c),
          (c: org.apache.spark.sql.Column) => sum(c))),
        "n" -> (("v", (c: org.apache.spark.sql.Column) => count(c),
          (c: org.apache.spark.sql.Column) => sum(c)))))
      .orderBy("k").collect()
    assert(direct.map(_.toSeq).toSeq == twoPhase.map(_.toSeq).toSeq)
  }

  test("bucketed tables join without an exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "x")
      val b = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      graft.sources.IO.writeBucketed(a, "bucketed_a", Seq("id"), 4)
      graft.sources.IO.writeBucketed(b, "bucketed_b", Seq("id"), 4)
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("query results are invariant to shuffle partition count") {
    for (parts <- Seq("3", "17")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
    }
    try {
      val dir = "/root/testdata/sf0.001"
      def run(parts: String): Seq[Seq[Any]] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        SparkEntry.queries("a1_agg_named")(spark, dir).collect()
          .map(_.toSeq).toSeq ++
          SparkEntry.queries("w3_moving_avg")(spark, dir).collect()
            .map(_.toSeq).toSeq ++
          SparkEntry.queries("j6_asof_backward")(spark, dir).collect()
            .map(_.toSeq).toSeq
      }
      assert(run("3") == run("17"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
