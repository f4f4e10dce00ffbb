package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** The SQL DML surface's SAFETY contracts (round-17 hardening):
  *  - DML through a VIEW over a graft table must NOT pierce the view
  *    and rewrite into a whole-base-table command (ADVICE r16 #1 —
  *    verified silent data loss before the fix): the rewrite rule now
  *    fires only on the BARE relation target, so views fall through
  *    to Spark's own loud unsupported-DML refusal;
  *  - MERGE INTO with multiple source rows matching one target key
  *    refuses loudly instead of silently landing duplicate key rows
  *    (ADVICE r16 #2 — the SQL/Delta cardinality rule).
  */
class GraftSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"sqldml$tag").toString + "/t"

  private def msgs(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("|")

  test("DML through a SQL view refuses loudly and touches NOTHING " +
      "(no view piercing)") {
    val path = freshPath("view")
    SnapshotTable.create(
      Seq((1L, "EU", 10.0), (2L, "EU", 20.0), (3L, "US", 30.0),
        (4L, "US", 40.0)).toDF("id", "region", "bal"), path)
    spark.sql(s"CREATE TABLE graft_dml_base USING graft " +
      s"OPTIONS (path '$path')")
    spark.sql("CREATE OR REPLACE TEMP VIEW graft_dml_v AS " +
      "SELECT id, bal FROM graft_dml_base WHERE region = 'EU'")
    try {
      // before the fix: this deleted id=3 and id=4 too — rows the
      // view never showed. Now: Spark's own refusal, zero commits.
      val delErr = intercept[Exception] {
        spark.sql("DELETE FROM graft_dml_v WHERE id >= 1")
      }
      assert(msgs(delErr).nonEmpty)
      assert(SnapshotTable.versions(spark, path).max === 0,
        "refused view DELETE must commit nothing")
      assert(SnapshotTable.read(spark, path).count() === 4)
      val updErr = intercept[Exception] {
        spark.sql("UPDATE graft_dml_v SET bal = 0.0")
      }
      assert(msgs(updErr).nonEmpty)
      assert(SnapshotTable.versions(spark, path).max === 0,
        "refused view UPDATE must commit nothing")
      val mrgErr = intercept[Exception] {
        spark.sql("MERGE INTO graft_dml_v t USING (SELECT 1L AS id, " +
          "0.0 AS bal) s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET *")
      }
      assert(msgs(mrgErr).nonEmpty)
      assert(SnapshotTable.versions(spark, path).max === 0,
        "refused view MERGE must commit nothing")
      assert(SnapshotTable.read(spark, path)
        .agg(sum(col("bal"))).head().getDouble(0) === 100.0,
        "base table must be byte-identical after the refusals")
      // control: the same statements on the BASE table still rewrite
      // into manifest commits
      spark.sql("DELETE FROM graft_dml_base WHERE id = 4")
      assert(SnapshotTable.read(spark, path).count() === 3)
      assert(SnapshotTable.versions(spark, path).max === 1)
    } finally {
      spark.sql("DROP VIEW IF EXISTS graft_dml_v")
      spark.sql("DROP TABLE graft_dml_base")
    }
  }

  test("MERGE INTO refuses multiple source rows matching one target " +
      "key; duplicate NOT-matched keys still insert") {
    val path = freshPath("card")
    SnapshotTable.create(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"), path)
    spark.sql(s"CREATE TABLE graft_dml_card USING graft " +
      s"OPTIONS (path '$path')")
    try {
      // two source images of MATCHED key 1 — ambiguous, refused
      val err = intercept[Exception] {
        spark.sql("MERGE INTO graft_dml_card t USING (SELECT * FROM " +
          "VALUES (1L, 100.0), (1L, 200.0) AS v(id, bal)) s " +
          "ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(msgs(err).contains("multiple source rows matched"),
        s"expected the cardinality refusal, got: $err")
      assert(SnapshotTable.versions(spark, path).max === 0,
        "refused merge must commit nothing")
      // same ambiguity under the matched-DELETE shape
      val err2 = intercept[Exception] {
        spark.sql("MERGE INTO graft_dml_card t USING (SELECT * FROM " +
          "VALUES (2L), (2L) AS v(id)) s ON t.id = s.id " +
          "WHEN MATCHED THEN DELETE")
      }
      assert(msgs(err2).contains("multiple source rows matched"))
      // duplicate keys that match NOTHING insert twice — SQL allows
      // it (each source row independently hits the not-matched clause)
      spark.sql("MERGE INTO graft_dml_card t USING (SELECT * FROM " +
        "VALUES (7L, 1.0), (7L, 2.0) AS v(id, bal)) s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      assert(spark.table("graft_dml_card")
        .filter(col("id") === 7L).count() === 2)
    } finally spark.sql("DROP TABLE graft_dml_card")
  }

  test("rich SQL MERGE: clause AND-conditions, explicit SET lists, " +
      "INSERT (cols) VALUES — one manifest commit") {
    val path = freshPath("rich")
    SnapshotTable.create(
      Seq((1L, 10.0, 0L), (2L, 20.0, 0L), (3L, 30.0, 0L))
        .toDF("id", "bal", "cnt"), path)
    spark.sql(s"CREATE TABLE graft_dml_rich USING graft " +
      s"OPTIONS (path '$path')")
    try {
      spark.sql("""MERGE INTO graft_dml_rich t USING (SELECT * FROM
        |  VALUES (1L, 50.0), (2L, 5.0), (9L, 9.0), (10L, -1.0)
        |  AS v(id, bal)) s ON t.id = s.id
        |WHEN MATCHED AND s.bal > t.bal
        |  THEN UPDATE SET bal = s.bal, cnt = t.cnt + 1
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.bal > 0
        |  THEN INSERT (id, bal) VALUES (s.id, s.bal)""".stripMargin)
      // id=1: first clause claims (50>10) → explicit SET, cnt bumps
      // id=2: first clause passes over (5<20), DELETE claims
      // id=3: matched by nothing → untouched
      // id=9: not matched, bal>0 → INSERT with cnt defaulting NULL
      // id=10: not matched, bal<0 → no clause claims → dropped
      val got = spark.table("graft_dml_rich")
        .select(col("id"), col("bal"), col("cnt"))
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) -999L else r.getLong(2))).toSet
      assert(got === Set((1L, 50.0, 1L), (3L, 30.0, 0L),
        (9L, 9.0, -999L)))
      assert(SnapshotTable.versions(spark, path).max === 1,
        "the rich merge must land as exactly ONE manifest commit")
    } finally spark.sql("DROP TABLE graft_dml_rich")
  }

  test("WHEN NOT MATCHED BY SOURCE: the sync-two-tables idiom " +
      "(conditional delete + update), one commit") {
    val path = freshPath("nmbs")
    SnapshotTable.create(
      (1L to 6L).map(i => (i, i * 10.0)).toDF("id", "bal"), path)
    spark.sql(s"CREATE TABLE graft_dml_sync USING graft " +
      s"OPTIONS (path '$path')")
    try {
      spark.sql("""MERGE INTO graft_dml_sync t USING (SELECT * FROM
        |  VALUES (1L, 111.0), (2L, 222.0), (3L, 333.0)
        |  AS v(id, bal)) s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE AND t.id >= 5 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = -1.0
        |""".stripMargin)
      val got = spark.table("graft_dml_sync")
        .as[(Long, Double)].collect().toSet
      // 1-3 take the source images, 4 is stale-marked (NMBS update),
      // 5-6 are gone (NMBS conditional delete)
      assert(got === Set((1L, 111.0), (2L, 222.0), (3L, 333.0),
        (4L, -1.0)))
      assert(SnapshotTable.versions(spark, path).max === 1)
    } finally spark.sql("DROP TABLE graft_dml_sync")
  }

  test("MERGE UPDATE reassigning a merge key MOVES the row (original " +
      "key removed in the same commit)") {
    val path = freshPath("rekey")
    SnapshotTable.create(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"), path)
    spark.sql(s"CREATE TABLE graft_dml_rekey USING graft " +
      s"OPTIONS (path '$path')")
    try {
      spark.sql("MERGE INTO graft_dml_rekey t USING (SELECT 1L AS id)" +
        " s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET id = t.id + 100, bal = t.bal")
      assert(spark.table("graft_dml_rekey")
        .as[(Long, Double)].collect().toSet ===
        Set((101L, 10.0), (2L, 20.0)),
        "the row must live under its NEW key only")
      assert(SnapshotTable.versions(spark, path).max === 1)
      // re-keying ONTO an existing key replaces that key's row (keyed
      // upsert semantics — the new image wins)
      spark.sql("MERGE INTO graft_dml_rekey t USING (SELECT 101L AS " +
        "id) s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET id = 2L, bal = t.bal")
      assert(spark.table("graft_dml_rekey")
        .as[(Long, Double)].collect().toSet === Set((2L, 10.0)))
    } finally spark.sql("DROP TABLE graft_dml_rekey")
  }

  test("rich-merge cardinality counts only CLAIMING source rows") {
    val path = freshPath("richcard")
    SnapshotTable.create(Seq((1L, 10.0)).toDF("id", "bal"), path)
    spark.sql(s"CREATE TABLE graft_dml_rcard USING graft " +
      s"OPTIONS (path '$path')")
    try {
      // two source rows match key 1, but the condition lets exactly
      // ONE claim it — no ambiguity, no refusal
      spark.sql("MERGE INTO graft_dml_rcard t USING (SELECT * FROM " +
        "VALUES (1L, 5.0), (1L, 50.0) AS v(id, bal)) s " +
        "ON t.id = s.id " +
        "WHEN MATCHED AND s.bal > t.bal THEN UPDATE SET bal = s.bal")
      assert(spark.table("graft_dml_rcard")
        .as[(Long, Double)].collect().toSet === Set((1L, 50.0)))
      // both claiming → the cardinality refusal
      val err = intercept[Exception] {
        spark.sql("MERGE INTO graft_dml_rcard t USING (SELECT * FROM " +
          "VALUES (1L, 60.0), (1L, 70.0) AS v(id, bal)) s " +
          "ON t.id = s.id " +
          "WHEN MATCHED AND s.bal > t.bal THEN UPDATE SET bal = s.bal")
      }
      assert(msgs(err).contains("multiple source rows matched"),
        s"expected the cardinality refusal, got: $err")
    } finally spark.sql("DROP TABLE graft_dml_rcard")
  }

  test("SQL UPDATE on a nested struct field (SET s.f = x) rewrites " +
      "the struct via withField; sibling fields keep their bytes") {
    val path = freshPath("nested")
    val df = spark.sql(
      "SELECT id, named_struct('city', CASE WHEN id % 2 = 0 " +
        "THEN 'paris' ELSE 'lyon' END, 'zip', CAST(10000 + id AS INT))" +
        " AS addr, CAST(id * 1.5 AS DOUBLE) AS bal FROM range(10)")
    SnapshotTable.create(df, path)
    spark.sql(s"CREATE TABLE graft_dml_nest USING graft " +
      s"OPTIONS (path '$path')")
    try {
      spark.sql("UPDATE graft_dml_nest SET addr.city = 'marseille', " +
        "bal = bal + 1.0 WHERE id >= 8")
      val got = spark.table("graft_dml_nest")
        .selectExpr("id", "addr.city", "addr.zip", "bal")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getInt(2), r.getDouble(3))).toSet
      val want = (0L until 10L).map { i =>
        val city = if (i >= 8) "marseille"
          else if (i % 2 == 0) "paris" else "lyon"
        val bal = if (i >= 8) i * 1.5 + 1.0 else i * 1.5
        (i, city, 10000 + i.toInt, bal)
      }.toSet
      assert(got === want)
      assert(SnapshotTable.versions(spark, path).max === 1,
        "the nested update must land as one MoR commit")
      // whole-column AND nested assignment of one base column in a
      // single statement is ambiguous — refused
      val err = intercept[Exception] {
        spark.sql("UPDATE graft_dml_nest SET addr = addr, " +
          "addr.city = 'nice'")
      }
      assert(msgs(err).contains("ambiguous"),
        s"expected the whole+nested ambiguity refusal, got: $err")
    } finally spark.sql("DROP TABLE graft_dml_nest")
  }

  test("SQL CTAS: CREATE TABLE USING graft AS SELECT creates the " +
      "manifest table; partitionBy option passes through; " +
      "already-exists refuses") {
    val path = freshPath("ctas")
    spark.sql(s"CREATE TABLE graft_dml_ctas USING graft OPTIONS " +
      s"(path '$path', partitionBy 'grp') AS " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END " +
      "AS grp FROM range(20)")
    try {
      assert(SnapshotTable.versions(spark, path) === Seq(0),
        "CTAS must land as the table's v0 manifest commit")
      assert(spark.table("graft_dml_ctas").count() === 20)
      assert(SnapshotTable.partitioning(spark, path) === Seq("grp"),
        "the partitionBy option must reach the stored layout")
      // partition pruning works through the catalog table
      assert(spark.table("graft_dml_ctas")
        .filter(col("grp") === "even").count() === 10)
      // a second CTAS at the same path refuses (ErrorIfExists)
      val err = intercept[Exception] {
        spark.sql("CREATE TABLE graft_dml_ctas2 USING graft OPTIONS " +
          s"(path '$path') AS SELECT id FROM range(3)")
      }
      // Spark itself refuses first (non-empty CTAS location); the
      // data source's own ErrorIfExists require() is the backstop
      assert(msgs(err).toLowerCase.contains("already exists") ||
        msgs(err).toLowerCase.contains("non-empty"),
        s"expected the already-exists refusal, got: $err")
      spark.sql("DROP TABLE IF EXISTS graft_dml_ctas2")
      // the CTAS-created catalog table takes the full DML surface
      spark.sql("DELETE FROM graft_dml_ctas WHERE id >= 10")
      assert(spark.table("graft_dml_ctas").count() === 10)
      assert(SnapshotTable.versions(spark, path).max === 1)
    } finally spark.sql("DROP TABLE graft_dml_ctas")
  }
}
