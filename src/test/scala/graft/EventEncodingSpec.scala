package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.{EventQueries, StreamingQueries}

/** The harness owns the physical encoding of the testdata and has
  * re-typed `events.ts` across regenerations (int64 epoch-ns in one
  * drop, timestamp[us] in the next — the round-6 breakage). This spec
  * pins the structural defense: the SAME synthetic events table is
  * written in three physical encodings and every event/streaming query
  * builder must produce IDENTICAL output over all of them.
  *
  *  - `long`: ts as a raw int64 epoch-ns column
  *  - `ntz`:  ts as TIMESTAMP_NTZ (parquet timestamp[us],
  *            isAdjustedToUTC=false — the round-6 regenerated shape)
  *  - `tz`:   ts as an instant TIMESTAMP (timestamp[us] adjusted-to-UTC)
  *
  * ts values are µs-aligned, matching the generator (µs-resolution
  * timestamps; DuckDB's epoch_us and our normalizer agree only on the
  * µs grid, which is the documented contract).
  */
class EventEncodingSpec extends SparkSpec {

  private lazy val dirs: Map[String, String] = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_enc").toString
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "refund", "signup")
    val rows = (1 to 400).map { i =>
      val tsNs = (1700000000000000L + rnd.nextInt(10 * 3600) * 1000000L +
        rnd.nextInt(1000000)) * 1000L // µs-aligned ns over ~10 hours
      (i.toLong, tsNs, (rnd.nextInt(30) + 1).toLong,
        types(rnd.nextInt(types.size)),
        // heavy tail so the z-score query (e6) actually flags rows —
        // uniform data never exceeds 2σ
        math.round(rnd.nextDouble() * 10000) / 100.0 *
          (if (rnd.nextInt(50) == 0) 40 else 1),
        s"""{"k": ${rnd.nextInt(100)}}""")
    }
    val longDf = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tzDf = longDf.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val ntzDf = tzDf.withColumn("ts", col("ts").cast(TimestampNTZType))
    val customer = (1 to 30).map(i => (i.toLong, s"seg_${i % 4}"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Map("long" -> longDf, "ntz" -> ntzDf, "tz" -> tzDf).map {
      case (enc, df) =>
        val d = s"$base/$enc"
        df.repartition(2).write.parquet(s"$d/events.parquet")
        customer.write.parquet(s"$d/customer.parquet")
        enc -> d
    }
    assert(spark.read.parquet(s"${out("ntz")}/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"${out("long")}/events.parquet")
      .schema("ts").dataType == LongType)
    out
  }

  private def collectCanon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col).toIndexedSeq: _*).collect()
      .map(_.toSeq.map(String.valueOf).toIndexedSeq.toSeq).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, String])
  }

  for ((name, fn) <- EventQueries.queries.toSeq.sortBy(_._1))
    test(s"$name is invariant to the events ts physical encoding") {
      val expected = collectCanon(fn(spark, dirs("long")))
      assert(expected.nonEmpty, s"$name returned no rows on the long encoding")
      for (enc <- Seq("ntz", "tz"))
        assert(collectCanon(fn(spark, dirs(enc))) == expected,
          s"$name differs between long and $enc encodings")
    }

  // The streaming builders share one normalizer (Tables.withEventTimestamp)
  // and one staging path; exercising two representatives over all three
  // encodings pins the stream-side dispatch without paying 8 queries ×
  // 3 encodings of micro-batch runs in every suite execution.
  for (name <- Seq("st1_stream_windows", "st6_stream_sessions")) {
    val fn = StreamingQueries.queries(name)
    test(s"$name is invariant to the events ts physical encoding") {
      val expected = collectCanon(fn(spark, dirs("long")))
      assert(expected.nonEmpty, s"$name returned no rows on the long encoding")
      for (enc <- Seq("ntz", "tz"))
        assert(collectCanon(fn(spark, dirs(enc))) == expected,
          s"$name differs between long and $enc encodings")
    }
  }
}
