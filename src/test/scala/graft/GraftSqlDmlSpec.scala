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

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns ADD " +
      "metadata-only on both the star fast path and the rich path") {
    val path = freshPath("mse")
    SnapshotTable.create(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"), path)
    spark.sql(s"CREATE TABLE graft_dml_mse USING graft " +
      s"OPTIONS (path '$path')")
    try {
      // star fast path: upsert with an extra source column — the
      // column ADDS (old rows read null), matched key takes the new
      // image, unmatched inserts
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO graft_dml_mse t " +
        "USING (SELECT * FROM VALUES (2L, 22.0, 'b'), (3L, 33.0, 'c')" +
        " AS v(id, bal, tag)) s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      def got(): Set[(Long, Double, String)] =
        spark.table("graft_dml_mse").collect()
          .map(r => (r.getLong(0), r.getDouble(1),
            if (r.isNullAt(2)) null else r.getString(2))).toSet
      assert(spark.table("graft_dml_mse").columns.toSeq ===
        Seq("id", "bal", "tag"))
      assert(got() === Set((1L, 10.0, null), (2L, 22.0, "b"),
        (3L, 33.0, "c")))
      assert(SnapshotTable.versions(spark, path).max === 1,
        "the evolving merge must land as one commit")
      // rich path (clause condition) with a SECOND new column: star
      // rows carry it, null elsewhere
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO graft_dml_mse t " +
        "USING (SELECT * FROM VALUES " +
        "(1L, 100.0, 'a2', 7), (3L, 3.0, 'c2', 9) " +
        "AS v(id, bal, tag, rank)) s ON t.id = s.id " +
        "WHEN MATCHED AND s.bal > t.bal THEN UPDATE SET *")
      val rows = spark.table("graft_dml_mse")
        .selectExpr("id", "bal", "tag", "rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
      // id=1 claimed (100>10) → new image with rank 7; id=3 passed
      // over (3<33) → untouched, rank null; id=2 unmatched by the
      // source → untouched
      assert(rows === Set((1L, 100.0, "a2", 7), (2L, 22.0, "b", -1),
        (3L, 33.0, "c", -1)))
      // plain star merge (no evolution keyword) still DROPS unknown
      // source columns instead of evolving
      spark.sql("MERGE INTO graft_dml_mse t USING (SELECT * FROM " +
        "VALUES (9L, 9.0, 'z', 0, true) AS v(id, bal, tag, rank, x))" +
        " s ON t.id = s.id " +
        "WHEN NOT MATCHED THEN INSERT (id, bal, tag, rank) " +
        "VALUES (s.id, s.bal, s.tag, s.rank)")
      assert(spark.table("graft_dml_mse").columns.toSeq ===
        Seq("id", "bal", "tag", "rank"))
    } finally spark.sql("DROP TABLE graft_dml_mse")
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on a graft " +
      "catalog table resolve to the pinned relation") {
    val path = freshPath("tt")
    SnapshotTable.create(Seq(1L, 2L).toDF("id"), path)
    // epoch millis — the timestampAsOf form that is session-zone-proof
    val tsAfterV0 = System.currentTimeMillis().toString
    Thread.sleep(20)
    SnapshotTable.append(Seq(3L, 4L, 5L).toDF("id"), path)
    spark.sql(s"CREATE TABLE graft_dml_tt USING graft " +
      s"OPTIONS (path '$path')")
    try {
      assert(spark.table("graft_dml_tt").count() === 5)
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_dml_tt VERSION AS OF 0")
        .head().getLong(0) === 2)
      // joins across two pins of the SAME table work (each pin is
      // its own relation instance)
      assert(spark.sql(
        "SELECT count(*) FROM graft_dml_tt VERSION AS OF 1 t1 " +
          "LEFT ANTI JOIN graft_dml_tt VERSION AS OF 0 t0 " +
          "ON t1.id = t0.id").head().getLong(0) === 3)
      assert(spark.sql("SELECT count(*) FROM graft_dml_tt " +
        s"TIMESTAMP AS OF '$tsAfterV0'").head().getLong(0) === 2)
      // an unknown version refuses loudly, as the option door does
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM graft_dml_tt VERSION AS OF 99")
          .collect()
      }
      assert(msgs(err).nonEmpty)
      // non-graft targets keep Spark's own time-travel refusal
      spark.sql("CREATE TABLE graft_dml_tt_pq (id BIGINT) USING parquet")
      try {
        val e2 = intercept[Exception] {
          spark.sql("SELECT * FROM graft_dml_tt_pq VERSION AS OF 0")
            .collect()
        }
        assert(msgs(e2).contains("TIME_TRAVEL") ||
          msgs(e2).toLowerCase.contains("time travel"))
      } finally spark.sql("DROP TABLE graft_dml_tt_pq")
    } finally spark.sql("DROP TABLE graft_dml_tt")
  }

  test("DML conditions may carry subqueries: DELETE/UPDATE WHERE id " +
      "IN (SELECT ...) resolve against the verb's fresh read") {
    val path = freshPath("subq")
    SnapshotTable.create((0L until 10L).map(i => (i, i * 1.0))
      .toDF("id", "bal"), path)
    val path2 = freshPath("subq2")
    SnapshotTable.create(Seq(2L, 4L, 6L).toDF("k"), path2)
    spark.sql(s"CREATE TABLE graft_dml_sq USING graft " +
      s"OPTIONS (path '$path')")
    spark.sql(s"CREATE TABLE graft_dml_sq2 USING graft " +
      s"OPTIONS (path '$path2')")
    try {
      spark.sql("DELETE FROM graft_dml_sq WHERE id IN " +
        "(SELECT k FROM graft_dml_sq2 WHERE k < 5)")
      assert(spark.table("graft_dml_sq").select("id")
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq ===
        Seq(0L, 1L, 3L, 5L, 6L, 7L, 8L, 9L))
      spark.sql("UPDATE graft_dml_sq SET bal = -1.0 WHERE id IN " +
        "(SELECT k FROM graft_dml_sq2)")
      assert(spark.table("graft_dml_sq")
        .filter(col("bal") === -1.0).select("id")
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq === Seq(6L))
      assert(SnapshotTable.versions(spark, path).max === 2,
        "each subquery DML must land as one commit")
    } finally {
      spark.sql("DROP TABLE graft_dml_sq")
      spark.sql("DROP TABLE graft_dml_sq2")
    }
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
