package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.SnapshotTable

/** SQL schema evolution on graft catalog tables (round-17):
  * ALTER TABLE ADD / RENAME / DROP / ALTER COLUMN TYPE through the
  * hint-batch rule (plans/GraftAlterTable.scala), each a
  * METADATA-ONLY commit — zero files rewritten — with the catalog's
  * pinned schema re-recorded so the next SELECT resolves evolved. */
class GraftSqlAlterTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"sqlalter$tag").toString + "/t"

  private def msgs(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("|")

  test("ADD / RENAME / DROP / widen evolve the table metadata-only; " +
      "SQL reads track every step") {
    val path = freshPath("evo")
    SnapshotTable.create(
      Seq((1, 10.0, "x"), (2, 20.0, "y")).toDF("id", "bal", "tag"), path)
    val files0 = SnapshotTable.fileCount(spark, path)
    val tbl = "graft_alter_evo"
    spark.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
    try {
      // ADD COLUMNS: nullable fields append; old rows read null
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (score DOUBLE, " +
        "note STRING COMMENT 'freeform')")
      assert(spark.table(tbl).columns.toSeq ===
        Seq("id", "bal", "tag", "score", "note"))
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE score IS NULL")
        .head.getLong(0) === 2)
      // new column is immediately writable through SQL DML
      spark.sql(s"INSERT INTO $tbl VALUES (3, 30.0, 'z', 0.5, 'n')")
      assert(spark.table(tbl).count() === 3)

      // RENAME COLUMN: logical name flips, files untouched (column
      // mapping — the physical name persists under the hood)
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN bal TO balance")
      assert(spark.sql(s"SELECT sum(balance) FROM $tbl")
        .head.getDouble(0) === 60.0)

      // widen: INT -> BIGINT, metadata-only, old files up-cast
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN id TYPE BIGINT")
      assert(spark.table(tbl).schema("id").dataType === LongType)
      assert(spark.sql(s"SELECT sum(id) FROM $tbl").head.getLong(0) === 6)

      // DROP COLUMN: leaves the schema; IF EXISTS skips absentees
      spark.sql(s"ALTER TABLE $tbl DROP COLUMN note")
      spark.sql(s"ALTER TABLE $tbl DROP COLUMNS IF EXISTS (ghost)")
      assert(spark.table(tbl).columns.toSeq ===
        Seq("id", "balance", "tag", "score"))

      // every step was metadata-only: the original file count only
      // grew by the one INSERT
      assert(SnapshotTable.fileCount(spark, path) === files0 + 1)
      val ops = spark.sql(s"DESCRIBE HISTORY $tbl").collect()
        .map(_.getString(2)).toSeq
      assert(ops === Seq("DROP-COLUMN", "WIDEN-COLUMN", "RENAME-COLUMN",
        "APPEND", "ADD-COLUMNS", "CREATE"))
      // time travel still reads the pre-evolution shape
      assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 0")
        .columns.toSeq === Seq("id", "bal", "tag"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("unsupported ALTER grammar refuses loudly; non-graft tables " +
      "keep Spark's own behavior") {
    val path = freshPath("ref")
    SnapshotTable.create(Seq((1, "a")).toDF("id", "s"), path)
    val tbl = "graft_alter_ref"
    spark.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
    try {
      val e1 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (c INT FIRST)") }
      assert(msgs(e1).contains("FIRST/AFTER"))
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (c INT DEFAULT 7)") }
      assert(msgs(e2).contains("DEFAULT"))
      val e3 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $tbl ALTER COLUMN id COMMENT 'x'") }
      assert(msgs(e3).contains("TYPE widening only"))
      // narrowing refuses in the engine verb
      val e4 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $tbl ALTER COLUMN id TYPE SMALLINT") }
      assert(msgs(e4).nonEmpty)
      assert(SnapshotTable.versions(spark, path) === Seq(0),
        "every refusal must commit nothing")
      // a non-graft (parquet) table falls through to Spark: RENAME
      // COLUMN keeps the stock "v2 only" refusal
      val loc = freshPath("pq2")
      spark.sql("CREATE TABLE plain_alter_pq (id INT) USING parquet " +
        s"LOCATION '$loc'")
      try {
        val e5 = intercept[Exception] {
          spark.sql("ALTER TABLE plain_alter_pq RENAME COLUMN id TO j") }
        assert(msgs(e5).contains("does not support RENAME COLUMN"),
          "non-graft tables must keep Spark's own v2-only refusal")
      } finally spark.sql("DROP TABLE IF EXISTS plain_alter_pq")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
