package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftStreamSink, SnapshotTable}

/** Round-17 hardening of the Update-mode sink's CDC path:
  *  - the deterministic replay tie-break hashes every batch column,
  *    and Spark's hash family refuses MapType — map-bearing columns
  *    now canonicalize through to_json so CDC replication of a table
  *    carrying a map column works again (ADVICE r16 #3);
  *  - a CDC-shaped batch whose change_type values are NOT the four
  *    dispositions refuses loudly instead of silently dropping the
  *    unrecognized rows from both upserts and removals, and the `cdc`
  *    sink option pins the interpretation explicitly instead of
  *    column-name sniffing (ADVICE r16 #4). */
class StreamSinkHardeningSpec extends SparkSpec {
  import spark.implicits._

  test("CDC replication of a table carrying a MAP column works " +
      "(tie-break canonicalizes unhashable types)") {
    val base = java.nio.file.Files.createTempDirectory("graftmapsink")
    val src = s"$base/src"
    val rep = s"$base/rep"
    def rows(r: Seq[(Long, Map[String, String])]) =
      r.toDF("id", "props")
    SnapshotTable.create(
      rows((0L until 20L).map(i =>
        (i, Map("k" -> s"v$i", "n" -> i.toString))))
        .repartition(2, col("id")), src)
    SnapshotTable.merge(
      rows(Seq((3L, Map("k" -> "patched")),
        (100L, Map("k" -> "new")))),
      src, Seq("id"),
      removeKeys = Some(Seq(7L).toDF("id")))
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("updateImages", "true")
      .load(src)
      .writeStream.format("graft").outputMode("update")
      .option("mergeKeys", "id")
      .option("checkpointLocation", s"$base/ckpt")
      .start(rep)
    try q.processAllAvailable() finally q.stop()
    def snap(p: String): Set[(Long, Map[String, String])] =
      SnapshotTable.read(spark, p).as[(Long, Map[String, String])]
        .collect().toSet
    assert(snap(rep) === snap(src),
      "replica must equal the map-bearing source")
  }

  test("CDC-shaped batch with an unrecognized change_type refuses " +
      "loudly; cdc=false forces the plain-upsert interpretation; " +
      "cdc=true demands the CDC columns") {
    val base = java.nio.file.Files.createTempDirectory("graftcdcval")
    // a batch that merely LOOKS CDC-shaped: bogus change_type values
    val bogus = Seq((1L, "upserted", 3L), (2L, "insert", 3L))
      .toDF("id", "change_type", "_commit_version")
    val err = intercept[IllegalStateException] {
      GraftStreamSink.applyKeyedBatch(bogus, s"$base/t1", Seq("id"), 0L)
    }
    assert(err.getMessage.contains("'upserted'") &&
      err.getMessage.contains("cdc"),
      s"expected the unknown-disposition refusal, got: $err")
    assert(SnapshotTable.versions(spark, s"$base/t1").isEmpty,
      "the refused batch must land nothing")
    // cdc=false: the SAME batch upserts as plain images — the
    // lookalike columns stay ordinary data columns
    GraftStreamSink.applyKeyedBatch(bogus, s"$base/t2", Seq("id"), 0L,
      cdcOverride = Some(false))
    val got = SnapshotTable.read(spark, s"$base/t2")
    assert(got.columns.toSet ===
      Set("id", "change_type", "_commit_version"))
    assert(got.count() === 2)
    // cdc=true on a stream WITHOUT the CDC columns refuses at once
    val plain = Seq((1L, 1.0)).toDF("id", "bal")
    val err2 = intercept[IllegalArgumentException] {
      GraftStreamSink.applyKeyedBatch(plain, s"$base/t3", Seq("id"), 0L,
        cdcOverride = Some(true))
    }
    assert(err2.getMessage.contains("change_type"),
      s"expected the missing-CDC-columns refusal, got: $err2")
  }
}
