package graft

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Datasets, Extracts}

/** Unit tests for the ETL pipelines over synthetic fixtures matching
  * FIXTURES.md §3 input schemas. */
class EtlSpec extends SparkSpec {

  private def d(s: String): Date = Date.valueOf(s)

  test("cotisation: window parse, monthly spread, per-siren sum") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // 14-char siret → siren = first 9; 3-month window, dû=300
        Row("12345678900011", "c1",
          "2018-01-01T00:00:00-2018-04-01T00:00:00", 250.0, 300.0),
        // second establishment of the same company, same window
        Row("12345678900022", "c2",
          "2018-01-01T00:00:00-2018-04-01T00:00:00", 100.0, 150.0),
        Row("98765432100011", "c3", null, 10.0, 20.0))),
      StructType(Seq(
        StructField("siret", StringType, nullable = false),
        StructField("numéro_compte", StringType, nullable = true),
        StructField("fenêtre", StringType, nullable = true),
        StructField("encaissé", DoubleType, nullable = true),
        StructField("dû", DoubleType, nullable = true))))
    val out = Extracts.cotisation(raw).orderBy("période").collect()
    // 3 months (jan, feb, mar — end exclusive), both sirets same siren
    assert(out.length == 3)
    assert(out.forall(_.getString(0) == "123456789"))
    // per month: 300/3 + 150/3 = 150
    assert(out.forall(r => math.abs(r.getDouble(2) - 150.0) < 1e-9))
  }

  test("cotisation: spine-join path (bounded) equals explode path") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("12345678900011", "c1",
          "2018-01-01T00:00:00-2018-04-01T00:00:00", 250.0, 300.0),
        // mid-month start: the month CONTAINING the start must be kept
        Row("12345678900022", "c2",
          "2018-02-14T00:00:00-2018-05-20T00:00:00", 100.0, 150.0),
        Row("98765432100011", "c3",
          "2017-11-03T00:00:00-2018-02-01T00:00:00", 10.0, 20.0))),
      StructType(Seq(
        StructField("siret", StringType, nullable = false),
        StructField("numéro_compte", StringType, nullable = true),
        StructField("fenêtre", StringType, nullable = true),
        StructField("encaissé", DoubleType, nullable = true),
        StructField("dû", DoubleType, nullable = true))))
    val viaExplode = Extracts.cotisation(raw)
      .orderBy("siren", "période").collect()
    val viaSpine = Extracts.cotisation(raw, maxDate = Some("2018-12-01"))
      .orderBy("siren", "période").collect()
    assert(viaExplode.nonEmpty)
    assert(viaSpine.map(_.toSeq).toSeq == viaExplode.map(_.toSeq).toSeq)
  }

  test("debit: latest revision kept, visible from treatment month on") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // two revisions of the same debt: hist 1 (100) then hist 2 (60)
        Row("12345678900011", "c1", 1, "2018-01-15", 100.0, 0.0,
          java.lang.Short.valueOf(1.toShort), "2017-T1"),
        Row("12345678900011", "c1", 1, "2018-01-20", 60.0, 0.0,
          java.lang.Short.valueOf(2.toShort), "2017-T1"))),
      StructType(Seq(
        StructField("siret", StringType, nullable = false),
        StructField("numéro_compte", StringType, nullable = true),
        StructField("numéro_écart_négatif", IntegerType, nullable = true),
        StructField("date_traitement", StringType, nullable = false),
        StructField("dette_sociale_ouvrière", DoubleType, nullable = true),
        StructField("dette_sociale_patronale", DoubleType, nullable = true),
        StructField("numéro_historique_écart_négatif", ShortType, nullable = true),
        StructField("période_cotisation", StringType, nullable = true))))
    val out = Extracts.debit(raw, maxDate = "2018-04-01")
      .orderBy("période").collect()
    // visible from Feb (first month-start ≥ Jan 15) through Apr = 3 rows
    assert(out.length == 3)
    assert(out.map(_.getAs[Date]("période").toString).toSeq ==
      Seq("2018-02-01", "2018-03-01", "2018-04-01"))
    // latest revision only: 60, not 100 or 160
    assert(out.forall(r =>
      math.abs(r.getAs[Double]("dette_sociale_ouvrière") - 60.0) < 1e-9))
  }

  test("ap: overlapping demande intervals merge; hours integrate per month") {
    val demande = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // 10 days × 24 h/day in January
        Row("12345678900011", d("2018-01-05"), d("2018-01-14"), 240.0),
        // overlapping: 10 days spanning Jan→Feb, 120 h
        Row("12345678900011", d("2018-01-10"), d("2018-02-08"), 300.0))),
      StructType(Seq(
        StructField("siret", StringType, nullable = false),
        StructField("date_début", DateType, nullable = false),
        StructField("date_fin", DateType, nullable = false),
        StructField("hta", DoubleType, nullable = true))))
    val conso = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("12345678900011", d("2018-01-01"), 55.0))),
      StructType(Seq(
        StructField("siret", StringType, nullable = false),
        StructField("période", DateType, nullable = false),
        StructField("ap_heures_consommées", DoubleType, nullable = true))))
    val out = Extracts.ap(demande, conso, maxDate = "2018-12-31")
      .orderBy("période").collect()
    assert(out.length == 2)
    val jan = out(0); val feb = out(1)
    // Jan: full first interval (240h) + 22 days of the 30-day 300h one
    assert(math.abs(jan.getAs[Double]("ap_heures_autorisées")
      - (240.0 + 22 * 10.0)) < 1e-9)
    assert(math.abs(jan.getAs[Double]("ap_heures_consommées") - 55.0) < 1e-9)
    // Feb: remaining 8 days × 10 h/day
    assert(math.abs(feb.getAs[Double]("ap_heures_autorisées") - 80.0) < 1e-9)
  }

  test("altares: FPI clip/normalize + latest snapshot per month") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("123456789", "A", 10, 80.0f, 5, 1000.0f, 150.0f, -20.0f,
          d("2018-03-05")),
        Row("123456789", "A", 11, 85.0f, 6, 1100.0f, 50.0f, 30.0f,
          d("2018-03-20")))),
      StructType(Seq(
        StructField("siren", StringType, nullable = false),
        StructField("état_organisation", StringType, nullable = true),
        StructField("code_paydex", IntegerType, nullable = true),
        StructField("paydex", FloatType, nullable = true),
        StructField("n_fournisseurs", IntegerType, nullable = true),
        StructField("encours_étudiés", FloatType, nullable = true),
        StructField("fpi_30", FloatType, nullable = true),
        StructField("fpi_90", FloatType, nullable = true),
        StructField("date", DateType, nullable = false))))
    val out = Extracts.altares(raw).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Date]("période") == d("2018-03-01"))
    assert(r.getAs[Float]("paydex") == 85.0f)        // latest by date
    assert(r.getAs[Double]("fpi_30") == 0.5)          // 50/100
    assert(r.getAs[Double]("fpi_90") == 0.3)          // clip(-20→... no: 30/100
  }

  test("judgments: code filter + first judgment per siren") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("123456789", "1", 20180315),
        Row("123456789", "4", 20170210),
        Row("123456789", "7", 20150101),   // excluded code
        Row("987654321", "5", 20190101))), // excluded code
      StructType(Seq(
        StructField("siren", StringType, nullable = false),
        StructField("najug", StringType, nullable = true),
        StructField("djug", IntegerType, nullable = true))))
    val out = Extracts.judgments(raw, "najug", "djug").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "123456789")
    assert(out.head.getAs[Date]("date_jugement") == d("2017-02-10"))
  }

  test("rar processPayment: cumulative per-claim payments") {
    val mvt = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("FRP1", "A", d("2018-01-10"), d("2018-01-12"), 100.0, 0.0, 0),
        Row("FRP1", "A", d("2018-02-10"), d("2018-02-12"), 50.0, 0.0, 1),
        Row("FRP2", "A", d("2018-03-10"), d("2018-03-12"), 70.0, 0.0, 0))),
      StructType(Seq(
        StructField("frp", StringType, nullable = false),
        StructField("art_cleart", StringType, nullable = false),
        StructField("date_effective", DateType, nullable = true),
        StructField("mvt_djc", DateType, nullable = true),
        StructField("mvt_mcrd", DoubleType, nullable = true),
        StructField("mvt_mdb", DoubleType, nullable = true),
        StructField("mvt_nacrd", IntegerType, nullable = true))))
    val out = Datasets.processPayment(mvt)
      .orderBy("frp", "mnt_paiement_cum").collect()
    assert(out.length == 3)
    // FRP1 cumulates 100 then 150; FRP2 (later djc) sees 220
    val byKey = out.map(r => (r.getString(0),
      r.getAs[Double]("mnt_paiement_cum"))).toSeq
    assert(byKey.contains(("FRP1", 100.0)))
    assert(byKey.contains(("FRP1", 150.0)))
    assert(byKey.contains(("FRP2", 220.0)))
  }

  test("joinDatasets: panel assembly end-to-end") {
    def df(rows: Seq[Row], schema: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val sp = StructType(_: Seq[StructField])
    val cot = df(Seq(
      Row("123456789", d("2018-01-01"), 100.0),
      Row("123456789", d("2018-02-01"), 110.0),
      Row("555555555", d("2018-01-01"), 50.0)),
      sp(Seq(StructField("siren", StringType), StructField("période", DateType),
        StructField("cotisation", DoubleType))))
    val deb = df(Seq(Row("123456789", d("2018-01-01"), 10.0, 5.0)),
      sp(Seq(StructField("siren", StringType), StructField("période", DateType),
        StructField("dette_sociale_ouvrière", DoubleType),
        StructField("dette_sociale_patronale", DoubleType))))
    val ap = df(Seq(Row("123456789", d("2018-01-01"), 8.0, 12.0)),
      sp(Seq(StructField("siren", StringType), StructField("période", DateType),
        StructField("ap_heures_consommées", DoubleType),
        StructField("ap_heures_autorisées", DoubleType))))
    val eff = df(Seq(
      Row("123456789", d("2018-01-01"), 12),
      Row("123456789", d("2018-02-01"), 15),
      // below the 10-workforce threshold → filtered out entirely
      Row("555555555", d("2018-01-01"), 3)),
      sp(Seq(StructField("siren", StringType), StructField("période", DateType),
        StructField("effectif", IntegerType))))
    val jud = df(Seq(Row("123456789", d("2019-06-01"))),
      sp(Seq(StructField("siren", StringType),
        StructField("date_jugement", DateType))))
    val alt = df(Seq(Row("123456789", d("2018-01-01"), 85.0f)),
      sp(Seq(StructField("siren", StringType), StructField("période", DateType),
        StructField("paydex", FloatType))))
    val cat = df(Seq(Row("123456789", "1234", "6420Z", "11", "5710")),
      sp(Seq(StructField("siren", StringType), StructField("code_commune", StringType),
        StructField("code_naf", StringType), StructField("région", StringType),
        StructField("catégorie_juridique", StringType))))
    val dates = df(Seq(Row("123456789", null, d("2010-01-01"))),
      sp(Seq(StructField("siren", StringType), StructField("date_fin", DateType),
        StructField("date_début", DateType))))
    val dgfip = df(Seq(Row("123456789", d("2017-12-31"), 0.42)),
      sp(Seq(StructField("siren", StringType), StructField("période", DateType),
        StructField("ebe_sur_ca", DoubleType))))

    val out = Datasets.joinDatasets(cot, deb, ap, eff, jud, alt, cat,
      dates, dgfip).orderBy("période")
    val rows = out.collect()
    // company 555555555 dropped by workforce filter
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("siren") == "123456789"))
    // as-of backward enrichment from the yearly dgfip data (≤ 365 days)
    assert(rows.forall(r => math.abs(r.getAs[Double]("ebe_sur_ca") - 0.42) < 1e-9))
    assert(rows.head.getAs[Double]("cotisation") == 100.0)
  }

  test("CLI twins: join_datasets → post_join_processing → RunPipeline " +
      "end-to-end over fixture files") {
    import graft.etl.{JoinDatasets, PostJoinProcessing}
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli").toString
    val rng = new scala.util.Random(11)
    val months = (0 until 14).map(m =>
      d(f"${2018 + m / 12}%04d-${m % 12 + 1}%02d-01"))
    val sirens = (1 to 40).map(i => f"$i%09d")
    def failing(i: Int): Boolean = i % 3 == 0

    def df(rows: Seq[Row], schema: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    def dateF(n: String, nullable: Boolean = true) =
      StructField(n, DateType, nullable)
    def strF(n: String) = StructField(n, StringType, nullable = true)
    def dblF(n: String) = StructField(n, DoubleType, nullable = true)

    // prepared ORC datasets (the join_datasets.py inputs)
    val cot = df(
      for ((s, i) <- sirens.zipWithIndex; p <- months) yield Row(s, p,
        (if (failing(i + 1)) 20.0 else 100.0) + rng.nextDouble() * 10),
      StructType(Seq(strF("siren"), dateF("période"), dblF("cotisation"))))
    val deb = df(
      for ((s, i) <- sirens.zipWithIndex; p <- months) yield Row(s, p,
        (if (failing(i + 1)) 60.0 else 4.0) + rng.nextDouble(),
        (if (failing(i + 1)) 40.0 else 2.0) + rng.nextDouble()),
      StructType(Seq(strF("siren"), dateF("période"),
        dblF("dette_sociale_ouvrière"), dblF("dette_sociale_patronale"))))
    val ap = df(
      for ((s, i) <- sirens.zipWithIndex; p <- months; if i % 4 == 0)
        yield Row(s, p, 8.0),
      StructType(Seq(strF("siren"), dateF("période"),
        dblF("ap_heures_consommées"))))
    val jud = df(
      sirens.zipWithIndex.collect { case (s, i) if failing(i + 1) =>
        Row(s, d("2018-10-15")) },
      StructType(Seq(strF("siren"), dateF("date_jugement"))))
    val alt = df(
      for ((s, _) <- sirens.zipWithIndex.take(10); p <- months)
        yield Row(s, p, 70.0),
      StructType(Seq(strF("siren"), dateF("période"),
        dblF("paydex"))))
    // two yearly snapshots so the 365-day as-of tolerance covers the
    // 2019 prediction months too
    val dgfip = df(
      for (s <- sirens; i = sirens.indexOf(s) + 1;
           y <- Seq("2017-12-31", "2018-12-31")) yield
        Row(s, d(y), if (failing(i)) -0.2 else 0.3),
      StructType(Seq(strF("siren"), dateF("période"), dblF("ebe_sur_ca"))))
    graft.sources.IO.writeOrc(cot, s"$tmp/cot.orc")
    graft.sources.IO.writeOrc(deb, s"$tmp/deb.orc")
    graft.sources.IO.writeOrc(ap, s"$tmp/ap.orc")
    graft.sources.IO.writeOrc(jud, s"$tmp/jud.orc")
    graft.sources.IO.writeOrc(alt, s"$tmp/alt.orc")
    graft.sources.IO.writeOrc(dgfip, s"$tmp/dgfip.orc")

    // headered CSV files (the reference reads these with explicit
    // schemas) — one low-workforce siren exercises the ≥ 10 filter
    val eff = df(
      (for ((s, i) <- sirens.zipWithIndex; p <- months)
        yield Row(s, p, Integer.valueOf(12 + i % 20))) ++
        months.map(p => Row("999999999", p, Integer.valueOf(3))),
      JoinDatasets.effectifSchema)
    val cat = df(
      sirens.map(s => Row(s, s + "00011", "75101", "6420Z", "11", "5710")),
      JoinDatasets.sireneCategoriesSchema)
    val dates = df(
      sirens.map(s => Row(s, null, d("2010-01-01"))),
      JoinDatasets.sireneDatesSchema)
    graft.sources.IO.writeCsv(eff, s"$tmp/effectif.csv")
    graft.sources.IO.writeCsv(cat, s"$tmp/categories.csv")
    graft.sources.IO.writeCsv(dates, s"$tmp/dates.csv")

    // 1. join_datasets twin
    JoinDatasets.run(spark, Map(
      "urssaf_cotisation" -> s"$tmp/cot.orc",
      "urssaf_debit" -> s"$tmp/deb.orc",
      "ap" -> s"$tmp/ap.orc",
      "dgfip_yearly" -> s"$tmp/dgfip.orc",
      "judgments" -> s"$tmp/jud.orc",
      "altares" -> s"$tmp/alt.orc",
      "effectif" -> s"$tmp/effectif.csv",
      "sirene_categories" -> s"$tmp/categories.csv",
      "sirene_dates" -> s"$tmp/dates.csv",
      "output_path" -> s"$tmp/joined.orc"))
    val joined = graft.sources.IO.readOrc(spark, s"$tmp/joined.orc")
    assert(joined.count() === 40L * 14,
      "40 kept sirens × 14 months (999999999 dropped by workforce filter)")
    assert(!joined.select("siren").distinct().collect()
      .map(_.getString(0)).contains("999999999"))

    // 2. post_join_processing twin (config shared with RunPipeline)
    val cfgJson =
      """{
        |  "fill_default_values": {"cotisation": 0.0},
        |  "time_aggregation": {"lag": {"cotisation": [1]},
        |    "mean": {"cotisation": [2]}},
        |  "target": {"class_col": "failure", "n_months": 2,
        |    "judgment_date_col": "date_jugement",
        |    "target_resampling_ratio": 0.4,
        |    "resampling_method": "oversampling"},
        |  "features_transformers": {
        |    "cotisation": ["StandardScaler"],
        |    "dette_par_effectif": ["StandardScaler"],
        |    "ebe_sur_ca": ["StandardScaler"]},
        |  "train_dates": ["2018-01-01", "2018-12-01"],
        |  "prediction_date": "2019-02-01"
        |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "cfg.json"),
      cfgJson.getBytes("UTF-8"))
    PostJoinProcessing.run(spark, Map(
      "input" -> s"$tmp/joined.orc",
      "configuration" -> s"$tmp/cfg.json",
      "output" -> s"$tmp/panel.parquet",
      "output_format" -> "parquet"))
    val panel = spark.read.parquet(s"$tmp/panel.parquet")
    assert(panel.columns.contains("failure") &&
      panel.columns.contains("dette_par_effectif") &&
      panel.columns.contains("cotisation_lag1m"))
    // failing sirens labeled 1 from août 2018 (jugement - 2 months)
    assert(panel.filter(col("failure") === 1).count() > 0)

    // 3. the trained-model lifecycle over the CLI-produced panel
    RunPipeline.run(spark, s"$tmp/cfg.json", s"$tmp/panel.parquet",
      s"$tmp/out", Map.empty)
    val preds = spark.read.parquet(s"$tmp/out/predictions.parquet")
    assert(preds.count() === 40L, "one scored row per siren")
    val metrics = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/out/metrics.json")), "UTF-8")
    assert(metrics.contains("Area under ROC curve"), metrics)
  }

  test("postJoin: target + fills + configured time aggregates") {
    val cfg = graft.ml.PipelineConfig.fromJson(
      """{
        |  "fill_default_values": {"cotisation": 0.0},
        |  "time_aggregation": {
        |    "lag": {"cotisation": [1]},
        |    "diff": {"cotisation": [1]},
        |    "mean": {"cotisation": [2]}
        |  },
        |  "target": {"class_col": "failure", "n_months": 2,
        |             "judgment_date_col": "date_jugement"}
        |}""".stripMargin)
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("123456789", d("2018-01-01"), 100.0, d("2018-04-15"), 10.0, 5.0, 20),
        Row("123456789", d("2018-02-01"), 110.0, d("2018-04-15"), 10.0, 5.0, 20),
        Row("123456789", d("2018-03-01"), 120.0, d("2018-04-15"), 10.0, 5.0, 20))),
      StructType(Seq(
        StructField("siren", StringType), StructField("période", DateType),
        StructField("cotisation", DoubleType),
        StructField("date_jugement", DateType),
        StructField("dette_sociale_ouvrière", DoubleType),
        StructField("dette_sociale_patronale", DoubleType),
        StructField("effectif", IntegerType))))
    val out = Datasets.postJoin(input, cfg).orderBy("période").collect()
    assert(out.length == 3)
    // failure when add_months(période, 2) >= 2018-04-15: feb (apr 1 < apr 15? no
    // → 0), mar (may 1 >= apr 15 → 1)
    assert(out.map(_.getAs[Int]("failure")).toSeq == Seq(0, 0, 1))
    // lag bfilled then defaults: first row bfilled from second (100.0)
    assert(out.map(_.getAs[Double]("cotisation_lag1m")).toSeq ==
      Seq(100.0, 100.0, 110.0))
    // diff = x - lag; bfill fills the leading null with the next diff
    assert(out.map(_.getAs[Double]("cotisation_diff1m")).toSeq ==
      Seq(10.0, 10.0, 10.0))
    // moving mean over 3 months inclusive
    assert(out.map(_.getAs[Double]("cotisation_mean2m")).toSeq ==
      Seq(100.0, 105.0, 110.0))
    assert(out.head.schema.fieldNames.contains("dette_par_effectif"))
    assert(out.head.schema.fieldNames.contains("dette_sur_cotisation_mean2m"))
  }
}
