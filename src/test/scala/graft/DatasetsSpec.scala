package graft

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Datasets
import graft.sources.IO

/** Tests for the composite ETL builders (TVA harmonization, DGFiP
  * financials) and the remaining IO surface. */
class DatasetsSpec extends SparkSpec {

  test("tva: CA3/CA12 outer join + harmonized sums") {
    // minimal frames carrying the raw declaration fields used by a few
    // harmonized columns; all other referenced fields default to 0 via
    // the numeric zero-fill
    val allRaw = (Datasets.tvaSumColumns.values.flatten.toSeq ++ Seq(
      "d3310_16", "d3310_7c", "d3310_5b", "d3517s_16_i", "d3517s_aa_i",
      "d3517s_ab_i", "d3517s_ac_i", "d3517s_13_i", "d3517s_14_i",
      "d3310_22a", "d3517s_25a_tx_ded")).distinct.sorted
    val keyCols = Seq("siren", "dte_debut_periode", "dte_fin_periode")
    val schema = StructType(
      keyCols.map(StructField(_, StringType)) ++
        allRaw.map(StructField(_, DoubleType)))
    def row(siren: String, d0: String, d1: String,
        vals: Map[String, Double]): Row =
      Row.fromSeq(Seq(siren, d0, d1) ++
        allRaw.map(c => vals.getOrElse(c, 0.0)))
    val ca3 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        row("111111111", "2019-01-01", "2019-01-31",
          Map("d3310_29" -> 100.0, "d3310_28" -> 40.0, "d3310_01" -> 7.0)))),
      schema)
    val ca12 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        row("222222222", "2019-01-01", "2019-12-31",
          Map("d3517s_55_i" -> 50.0, "d3517s_28_i" -> 20.0)))),
      schema)
    val out = Datasets.tva(ca3, ca12).orderBy("siren").collect()
    assert(out.length == 2)
    val bySiren = out.map(r => r.getAs[String]("siren") -> r).toMap
    // d_tca_total = d3310_29 + d3517s_55_i per declaration
    assert(bySiren("111111111").getAs[Double]("d_tca_total") == 100.0)
    assert(bySiren("222222222").getAs[Double]("d_tca_total") == 50.0)
    assert(bySiren("111111111").getAs[Double]("m_tva_net_due") == 40.0)
    assert(bySiren("222222222").getAs[Double]("m_tva_net_due") == 20.0)
    // coef dedux default: both raw fields 0 → 100
    assert(bySiren("111111111").getAs[Double]("d_tva_ded_tx_coef_ded") == 100.0)
    // raw declaration fields dropped, renamed period bounds present
    assert(!out.head.schema.fieldNames.exists(_.startsWith("d3310")))
    assert(out.head.schema.fieldNames.contains("date_deb_tva"))
  }

  test("financialDgfip: join, monthly explode, least-null dedup, ratios") {
    val indmapCols = Seq("siren", "date_deb_exercice", "date_fin_exercice",
      "no_ocfi", "annee_exercice", "d_actf_stk_march_net",
      "d_actf_stk_mat1e_net", "d_cr_250_expl_salaire",
      "d_cr_252_expl_ch_soc", "d_cr_260_expl_dt_syndic",
      "d_dvs_376_nbr_pers", "d_passf_120_k", "d_passf_142_k_propres",
      "rto_invest_ca", "rto_af_solidite_financiere")
    val afCols = Seq("siren", "date_deb_exercice", "date_fin_exercice",
      "no_ocfi", "annee_exercice", "mnt_af_bfonc_actif_circ_expl",
      "mnt_af_bfonc_actif_circ_h_expl", "mnt_af_bfonc_bfr",
      "mnt_af_bfonc_passif_circ_expl", "mnt_af_bfonc_passif_circ_h_expl",
      "mnt_af_bfonc_tresorerie", "mnt_af_ca", "mnt_af_endettement_net",
      "mnt_af_sig_ebe_ret", "mnt_af_sig_va_ret",
      "nbr_af_jours_creance_cli", "nbr_af_jours_reglt_fourn",
      "rto_af_endettement_a_terme", "rto_af_rent_eco")
    val dircoCols = Seq("siren", "date_deb_exercice", "date_fin_exercice",
      "rto_6", "rto_56")
    def df(cols: Seq[String], rows: Seq[Seq[Any]]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromSeq)),
        StructType(cols.map {
          case c @ ("siren" | "date_deb_exercice" | "date_fin_exercice"
            | "no_ocfi") => StructField(c, StringType)
          case "annee_exercice" => StructField("annee_exercice", StringType)
          case c => StructField(c, DoubleType)
        }))
    val base = Seq("123456789", "2018-01-01", "2019-01-01", "X", "2018")
    val indmap = df(indmapCols,
      Seq(base ++ Seq(10.0, 5.0, 100.0, 40.0, 10.0, 10.0, 1000.0, 500.0,
        0.12, 0.3)))
    val af = df(afCols,
      Seq(base ++ Seq(300.0, 100.0, 150.0, 120.0, 80.0, 60.0, 2000.0,
        400.0, 200.0, 600.0, 30.0, 45.0, 2.0, 0.05)))
    val dirco = df(dircoCols,
      Seq(Seq("123456789", "2018-01-01", "2019-01-01", 80.0, 0.9)))

    val out = Datasets.financialDgfip(indmap, af, dirco)
    val rows = out.orderBy("période").collect()
    // exercise 2018-01-01 .. 2018-12-31 inclusive-exclusive → 12 months
    assert(rows.length == 12)
    val r = rows.head
    // ebe_sur_ca = 200/2000, normalized by exercise days (365)
    assert(math.abs(r.getAs[Double]("ebe_sur_ca") - 0.1 / 365) < 1e-12)
    // dette_à_terme_sur_k_propres = 1/2, normalized
    assert(math.abs(r.getAs[Double]("dette_à_terme_sur_k_propres")
      - 0.5 / 365) < 1e-12)
    assert(r.getAs[Int]("année_exercice") == 2018)
    assert(r.schema.fieldNames.contains("liquidité_réduite"))
  }

  test("io: text sink + csv→orc converter") {
    val dir = java.nio.file.Files.createTempDirectory("io2").toString
    IO.writeText(spark, Seq("{\"run\": 1}", "{\"run\": 2}"), s"$dir/txt")
    val lines = spark.read.text(s"$dir/txt").collect().map(_.getString(0))
    assert(lines.toSet == Set("{\"run\": 1}", "{\"run\": 2}"))

    import spark.implicits._
    IO.writeCsv(Seq((1, "a"), (2, "b")).toDF("id", "s"), s"$dir/csv")
    IO.csvToOrc(spark, s"$dir/csv", s"$dir/orc")
    val back = IO.readOrc(spark, s"$dir/orc").orderBy("id").collect()
    assert(back.map(r => (r.get(0).toString, r.getString(1))).toSeq ==
      Seq(("1", "a"), ("2", "b")))
  }

  test("io: partitioned sink prunes directories and round-trips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("iopart").toString
    val df = Seq((1L, "en", 10.0), (2L, "fr", 20.0), (3L, "en", 30.0))
      .toDF("id", "lang", "v")
    IO.writePartitioned(df, s"$dir/p", Seq("lang"), sortCols = Seq("id"))
    // hive-style directories per partition value
    val subdirs = new java.io.File(s"$dir/p").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs == Set("lang=en", "lang=fr"))
    // round-trip, and a partition filter reaches the scan as pruning
    val back = spark.read.parquet(s"$dir/p")
    assert(back.count() == 3)
    val pruned = back.filter(org.apache.spark.sql.functions.col("lang") === "en")
    assert(pruned.collect().map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(1L, 3L))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("lang"), scan.take(1500))
  }

  test("io: compact rewrites a many-file table to the target file count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("iocompact").toString
    val path = s"$dir/t"
    // accrete 16 tiny files (the per-batch-append pathology)
    spark.range(4000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(16).write.parquet(path)
    def files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.length())
    assert(files.length == 16)
    val total = files.sum
    // target ~= half the table -> 2 files
    val n = IO.compact(spark, path, targetFileBytes = total / 2 + 1,
      sortCols = Seq("id"))
    assert(n == 2 && files.length == 2)
    val back = spark.read.parquet(path)
    assert(back.count() == 4000)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 4000L * 3999 / 2)
    // range layout restored: the two files cover disjoint id ranges
    val spans = back.groupBy(input_file_name())
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length == 2 && spans(0)._2 < spans(1)._1)
  }
}
