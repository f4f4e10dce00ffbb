package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps
import graft.ml.IdentifierNormalizer
import graft.operators.{AsOfJoin, TimeOps}

/** The reference's composite dataset builders: yearly DGFiP financials,
  * TVA declarations, RAR claims, the panel join, and post-join feature
  * engineering (SURVEY.md §3.2-3.3). */
object Datasets {

  /** Yearly DGFiP financial ratios exploded to a monthly panel
    * (reference extract_financial_DGFiP.py:60-331): join the three
    * declaration tables, keep the least-null declaration per
    * (siren, month), derive the financial ratios, normalize by exercise
    * length.
    *
    * `indmap`/`af` join on (siren, exercise dates, no_ocfi, année);
    * `dirco` left-joins on (siren, exercise dates).
    */
  def financialDgfip(indmap: DataFrame, af: DataFrame, dirco: DataFrame,
      minDate: String = "2014-01-01"): DataFrame = {
    val joinCols = Seq("siren", "date_deb_exercice", "date_fin_exercice",
      "no_ocfi", "annee_exercice")
    val afDropped = af.drop(af.columns
      .filter(c => indmap.columns.contains(c) && !joinCols.contains(c)): _*)
    val joined = indmap
      .join(afDropped, joinCols, "inner")
      .join(dirco, Seq("siren", "date_deb_exercice", "date_fin_exercice"),
        "left")
      .withColumnRenamed("annee_exercice", "année_exercice")
      .withColumn("année_exercice", col("année_exercice").cast(IntegerType))
      .withColumnRenamed("date_deb_exercice", "date_début_exercice")
      .withColumn("date_début_exercice", to_date(col("date_début_exercice")))
      .withColumn("date_fin_exercice", to_date(col("date_fin_exercice")))
      .filter(col("date_fin_exercice") > lit(minDate))

    // exercise interval → monthly rows (exclusive end), then keep the
    // least-null declaration per (siren, période)
    val monthly = TimeOps.explodeInterval(joined, "date_début_exercice",
      "date_fin_exercice", outCol = "période", endExclusive = true)
    val deduped = TimeOps.leastNullDedup(monthly, Seq("siren", "période"),
      monthly.columns.toSeq, tieBreak = Seq("date_début_exercice"))

    val sourceVars = Seq("mnt_af_endettement_net", "rto_6",
      "rto_af_endettement_a_terme", "mnt_af_sig_ebe_ret", "mnt_af_ca",
      "mnt_af_sig_va_ret", "d_dvs_376_nbr_pers", "d_cr_250_expl_salaire",
      "d_cr_252_expl_ch_soc", "d_cr_260_expl_dt_syndic",
      "d_actf_stk_march_net", "mnt_af_bfonc_actif_circ_expl",
      "mnt_af_bfonc_actif_circ_h_expl", "mnt_af_bfonc_passif_circ_expl",
      "mnt_af_bfonc_passif_circ_h_expl", "mnt_af_bfonc_tresorerie",
      "nbr_af_jours_reglt_fourn", "nbr_af_jours_creance_cli",
      "d_passf_120_k", "mnt_af_bfonc_bfr", "d_passf_142_k_propres")
    val filled = deduped.na.fill(0.0, sourceVars)

    val ratios = filled
      .withColumn("dette_nette_sur_caf",
        col("mnt_af_endettement_net") / col("rto_6"))
      .withColumn("dette_à_terme_sur_k_propres",
        lit(1) / col("rto_af_endettement_a_terme"))
      .withColumn("ebe_sur_ca", col("mnt_af_sig_ebe_ret") / col("mnt_af_ca"))
      .withColumn("va_sur_effectif",
        col("mnt_af_sig_va_ret") / col("d_dvs_376_nbr_pers"))
      .withColumn("charges_personnel_sur_va",
        (col("d_cr_250_expl_salaire") + col("d_cr_252_expl_ch_soc")
          + col("d_cr_260_expl_dt_syndic")) / col("mnt_af_sig_va_ret"))
      .withColumn("stocks_sur_ca",
        col("d_actf_stk_march_net") / col("mnt_af_ca"))
      .withColumn("liquidité_absolue",
        (col("mnt_af_bfonc_actif_circ_expl")
          + col("mnt_af_bfonc_actif_circ_h_expl"))
          / (col("mnt_af_bfonc_passif_circ_expl")
            + col("mnt_af_bfonc_passif_circ_h_expl")))
      .withColumn("liquidité_générale",
        col("mnt_af_bfonc_tresorerie")
          / (col("mnt_af_bfonc_actif_circ_expl")
            + col("mnt_af_bfonc_actif_circ_h_expl")))
      .withColumn("délai_paiement_sur_délai_encaissement",
        col("nbr_af_jours_reglt_fourn") / col("nbr_af_jours_creance_cli"))
      .withColumn("k_propres_sur_k_social",
        col("d_passf_142_k_propres") / col("d_passf_120_k"))
      .withColumn("bfr_sur_k_propres",
        col("mnt_af_bfonc_bfr") / col("d_passf_142_k_propres"))
      .withColumnRenamed("rto_invest_ca", "taux_investissement")
      .withColumnRenamed("rto_af_solidite_financiere", "solidité_financière")
      .withColumnRenamed("rto_56", "liquidité_réduite")
      .withColumnRenamed("rto_af_rent_eco", "rentabilité_économique")
      .drop(sourceVars: _*)

    val featureCols = Seq("dette_nette_sur_caf",
      "dette_à_terme_sur_k_propres", "ebe_sur_ca", "va_sur_effectif",
      "charges_personnel_sur_va", "stocks_sur_ca", "liquidité_absolue",
      "liquidité_générale", "liquidité_réduite",
      "délai_paiement_sur_délai_encaissement", "k_propres_sur_k_social",
      "bfr_sur_k_propres", "taux_investissement", "solidité_financière",
      "rentabilité_économique")
    val normalized = Extracts.timeNormalize(ratios, featureCols,
      "date_début_exercice", "date_fin_exercice")
      .na.fill(0.0, featureCols)
    normalized.select((featureCols ++ Seq("siren", "date_début_exercice",
      "date_fin_exercice", "no_ocfi", "période", "année_exercice"))
      .map(col): _*)
  }

  /** TVA declaration harmonization (reference tva_dataset.py:40-246):
    * full-outer join of monthly/quarterly (CA3) and yearly (CA12)
    * declarations on their common columns, zero-fill, then the
    * harmonized amounts as sums of raw declaration fields. The
    * field-combination table below is the reference's data dictionary
    * re-expressed declaratively.
    */
  val tvaSumColumns: Map[String, Seq[String]] = Map(
    "d_tca_total" -> Seq("d3310_29", "d3517s_55_i"),
    "d_tva_ni_b0032_export" -> Seq("d3517s_02_b", "d3310_04"),
    "d_tva_ni_b0034_lic" -> Seq("d3517s_04_b", "d3310_06"),
    "d_tva_ni_b0037_ach_frch" -> Seq("d3517s_01_b", "d3310_07"),
    "d_tva_ni_b0029_liv_el_gaz" -> Seq("d3517s_4d_b", "d3310_6a"),
    "d_tva_ni_b0043_assjt_hs_fr" -> Seq("d3517s_4b_b", "d3310_7a"),
    "m_tva_ni_b0033_autr_op_ni" -> Seq("d3310_7b", "d3517s_03_b", "d3310_05"),
    "m_tva_bi_b0979_ca" -> Seq("d3310_01", "d3517s_5a_b", "d3517s_06_b",
      "d3517s_6c_b", "d3517s_07_b", "d3517s_08_b", "d3517s_09_b",
      "d3517s_10_b"),
    "m_tva_bi_b0981_autr_op_imp" -> Seq("d3310_02", "d3310_3c",
      "d3517s_13_b", "d3517s_11_b", "d3517s_12_b"),
    "d_tva_bi_b0044_ach_ps_ic" -> Seq("d3517s_ac_b", "d3310_2a"),
    "d_tva_bi_b0031_aic" -> Seq("d3517s_14_b", "d3310_03"),
    "d_tva_bi_b0030_liv_el_gaz" -> Seq("d3517s_aa_b", "d3310_3a"),
    "d_tva_bi_b0040_assjt_hs_fr" -> Seq("d3517s_ab_b", "d3310_3b"),
    "m_tva_bi_b0207_normal" -> Seq("d3310_08_btx196", "d3517s_5a_b",
      "d3310_08_b", "d3517s_11_b", "d3517s_12_b", "d3517s_13_b",
      "d3517s_14_b", "d3517s_ab_b", "d3517s_ac_b", "d3517s_aa_b"),
    "m_tva_bi_b0105_reduit_5_5" -> Seq("d3517s_06_b", "d3310_09_b"),
    "m_tva_bi_b0151_reduit_10" -> Seq("d3310_9b_btx7", "d3517s_6c_b",
      "d3310_9b_b"),
    "m_tva_bi_b0100_dom_2_1" -> Seq("d3517s_08_b", "d3310_11_b"),
    "m_tva_bi_b0201_dom_8_5" -> Seq("d3517s_07_b", "d3310_10_b"),
    "d_tva_bi_b0950_tx_part" -> Seq("d3517s_09_b", "d3310_14_b"),
    "m_tva_bi_b0900_anc_tx" -> Seq("d3517s_10_b", "d3310_13_b"),
    "d_tva_col_i0600_ant_ded" -> Seq("d3310_15", "d3517s_18_i"),
    "d_tva_col_i0031_aic" -> Seq("d3517s_14_i", "d3310_17"),
    "d_tva_ded_i0703_imm" -> Seq("d3310_19", "d3517s_23_i"),
    "m_tva_ded_i0702_abs" -> Seq("d3310_20", "d3517s_20_i", "d3517s_21_i"),
    "d_tva_ded_i0059_autr" -> Seq("d3310_21", "d3517s_25_i"),
    "d_tva_ded_i0705_total" -> Seq("d3310_23", "d3517s_26_i"),
    "d_tva_ded_i0709_dt_es_dom" -> Seq("d3310_24", "d3517s_27_i"),
    "m_tva_net_i8002_remb_dem" -> Seq("d3310_26", "d3517s_50_i"),
    "m_tva_net_due" -> Seq("d3310_28", "d3517s_28_i"))

  def tva(ca3: DataFrame, ca12: DataFrame): DataFrame = {
    val joinCols = ca3.columns.toSet.intersect(ca12.columns.toSet).toSeq
    val joined = ca3.join(ca12, joinCols, "outer")
    val numeric = joined.schema.fields.collect {
      case f if Set[DataType](ByteType, ShortType, IntegerType, LongType,
        FloatType, DoubleType).contains(f.dataType)
        || f.dataType.isInstanceOf[DecimalType] => f.name
    }
    val filled = joined.na.fill(0, numeric)

    val withSums = tvaSumColumns.foldLeft(filled) { case (d, (out, ins)) =>
      d.withColumn(out, ins.map(col).reduce(_ + _))
    }
    val derived = withSums
      .withColumn("sum_tva_ni_btotal",
        Seq("d_tva_ni_b0032_export", "d_tva_ni_b0034_lic",
          "d_tva_ni_b0037_ach_frch", "d_tva_ni_b0029_liv_el_gaz",
          "d_tva_ni_b0043_assjt_hs_fr", "m_tva_ni_b0033_autr_op_ni")
          .map(col).reduce(_ + _))
      .withColumn("sum_tva_bi_btotal",
        Seq("m_tva_bi_b0979_ca", "m_tva_bi_b0981_autr_op_imp",
          "d_tva_bi_b0044_ach_ps_ic", "d_tva_bi_b0031_aic",
          "d_tva_bi_b0030_liv_el_gaz", "d_tva_bi_b0040_assjt_hs_fr")
          .map(col).reduce(_ + _))
      .withColumn("sum_tva_ni_bi_btotal",
        col("sum_tva_bi_btotal") + col("sum_tva_ni_btotal"))
      .withColumn("sum_tva_col_total",
        col("d3310_16") - col("d3310_15") + col("d3517s_16_i")
          - col("d3310_7c") - col("d3310_17") - col("d3310_5b")
          - col("d3517s_aa_i") - col("d3517s_ab_i") - col("d3517s_ac_i")
          - col("d3517s_13_i") - col("d3517s_14_i"))
      .withColumn("d_tva_ded_tx_coef_ded",
        when(col("d3310_22a") === 0.0 && col("d3517s_25a_tx_ded") === 0.0,
          100).otherwise(col("d3310_22a") + col("d3517s_25a_tx_ded")))
      .withColumn("d_tva_ded_total_hs_report",
        col("d_tva_ded_i0703_imm") + col("m_tva_ded_i0702_abs")
          + col("d_tva_ded_i0059_autr"))

    val rawCols = derived.columns.filter(c =>
      c.startsWith("d3310") || c.startsWith("d3517"))
    derived.drop(rawCols ++ Seq("no_ocfi", "mode_depot", "version_form",
      "dte_depot"): _*)
      .withColumnRenamed("dte_debut_periode", "date_deb_tva")
      .withColumnRenamed("dte_fin_periode", "date_fin_tva")
  }

  /** Cumulative payment series per claim (reference
    * rar_dataset.py:38-76 process_payment): aggregate movements per
    * (frp, art_cleart, date_effective), then running sum + count over
    * the partition ordered by (frp, first accounting date). */
  def processPayment(tMvt: DataFrame, suffix: Option[String] = None): DataFrame = {
    val mnt = suffix.fold("mnt_paiement_cum")(s => s"mnt_paiement_cum_$s")
    val nb = suffix.fold("nb_paiement")(s => s"nb_paiement_$s")
    val agg = tMvt
      .withColumn("mvt_djc_int", unix_timestamp(col("mvt_djc")))
      .groupBy(col("frp"), col("art_cleart"), col("date_effective"))
      .agg(min(col("mvt_djc_int")).as("min(mvt_djc_int)"),
        sum(col("mvt_mcrd")).as("sum(mvt_mcrd)"))
      .select("frp", "art_cleart", "min(mvt_djc_int)", "sum(mvt_mcrd)")
      .dropDuplicates()
    val w = Window.partitionBy(col("art_cleart"))
      .orderBy(col("frp"), col("min(mvt_djc_int)"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    agg.filter(col("sum(mvt_mcrd)") =!= 0)
      .withColumn(mnt, sum(col("sum(mvt_mcrd)")).over(w))
      .withColumn(nb, count(col("sum(mvt_mcrd)")).over(w))
      .dropDuplicates()
      .drop("sum(mvt_mcrd)", "min(mvt_djc_int)")
  }

  /** RAR (restes à recouvrer) claims dataset (reference
    * rar_dataset.py:96-218): per-claim amounts joined with cumulative
    * payments, hors-CF indicators and outstanding amounts. */
  def rar(tArt: DataFrame, tMvt: DataFrame,
      etablissementAnnee: DataFrame): DataFrame = {
    val art = tArt
      .withColumn("date_inscription_rar", to_date(col("art_disc"), "yyyyMMdd"))
      .withColumn("date_exigibilite", to_date(col("art_didr"), "yyyyMMdd"))
      .withColumn("date_notification_redressement",
        to_date(col("art_datedcf"), "yyyyMMdd"))
      .withColumn("date_origine", to_date(col("art_dori"), "yyyyMMdd"))
    val mvt = tMvt
      .withColumn("date_effective", to_date(col("mvt_deff"), "yyyyMMdd"))
      .withColumn("date_journee_comptable", to_date(col("mvt_djc"), "yyyyMMdd"))
    val corresp = etablissementAnnee
      .withColumn("frp", concat(col("frp_service"), col("frp_dossier")))
      .drop("frp_service", "frp_dossier")

    val creanceAmounts = mvt.join(
      mvt.groupBy(col("frp"), col("art_cleart"))
        .agg(sum(col("mvt_mdb")).as("mnt_creance")),
      Seq("frp", "art_cleart"), "left")
    val paiements01 = processPayment(
      mvt.filter("mvt_nacrd == 0 OR mvt_nacrd == 1"))
    val paiementsAutre = processPayment(
      mvt.filter("mvt_nacrd != 0 AND mvt_nacrd != 1"), Some("autre"))

    val creances = art
      .join(creanceAmounts.select("frp", "art_cleart", "mnt_creance")
        .dropDuplicates(), Seq("frp", "art_cleart"), "left")
      .join(paiements01, Seq("frp", "art_cleart"), "left")
      .join(paiementsAutre, Seq("frp", "art_cleart"), "left")
      .join(corresp, Seq("frp"), "left")

    creances
      .na.fill(0, Seq("mnt_creance", "mnt_paiement_cum",
        "mnt_paiement_cum_autre"))
      .withColumn("ind_cf",
        when(col("art_datedcf").isNotNull, 1).otherwise(0))
      .withColumn("ind_hcf",
        when(col("art_datedcf").isNotNull, 0).otherwise(1))
      .withColumn("mnt_paiement_cum_tot",
        ColumnOps.rowSum(Seq(col("mnt_paiement_cum"),
          col("mnt_paiement_cum_autre"))))
      .withColumn("mnt_paiement_cum_tot_hcf",
        col("mnt_paiement_cum_tot") * col("ind_hcf"))
      .withColumn("mnt_creance_hcf", col("mnt_creance") * col("ind_hcf"))
      .withColumn("mnt_rar", col("mnt_creance") - col("mnt_paiement_cum_tot"))
      .withColumn("mnt_rar_hcf", col("mnt_rar") * col("ind_hcf"))
  }

  /** The monthly panel assembly (reference join_datasets.py:104-215):
    * workforce ≥ 10 semi-filter, 6-way join chain on (siren, période) /
    * siren, as-of enrichment with yearly DGFiP financials (backward,
    * tolerance 365 d), optional perimeter semi-join, activity-window
    * theta semi-join against sirene dates. */
  def joinDatasets(
      cotisation: DataFrame, debit: DataFrame, ap: DataFrame,
      effectif: DataFrame, judgments: DataFrame, altares: DataFrame,
      sireneCategories: DataFrame, sireneDates: DataFrame,
      dgfipYearly: DataFrame,
      perimeter: Option[DataFrame] = None): DataFrame = {

    def norm(df: DataFrame): DataFrame =
      new IdentifierNormalizer("siren", 9).transform(df)

    val dates = norm(sireneDates).na.fill(Map("date_fin" -> "2100-01-01"))
    val eff = {
      val n = norm(effectif)
      val mask = n.groupBy(col("siren"))
        .agg(max(col("effectif")).as("max_effectif"))
        .filter(col("max_effectif") >= 10)
      n.join(mask, Seq("siren"), "left_semi")
    }

    val monthly = norm(cotisation)
      .join(norm(debit), Seq("siren", "période"), "left")
      .join(eff, Seq("siren", "période"), "inner")
      .join(norm(ap), Seq("siren", "période"), "left")
      .join(norm(judgments), Seq("siren"), "left")
      .join(norm(altares), Seq("siren", "période"), "left")
      .join(norm(sireneCategories), Seq("siren"), "inner")

    val enriched = AsOfJoin.mergeAsOf(monthly, norm(dgfipYearly),
      on = "période", by = Seq("siren"), toleranceDays = Some(365),
      direction = "backward")

    val inPerimeter = perimeter match {
      case Some(p) => enriched.join(p, Seq("siren"), "left_semi")
      case None => enriched
    }

    inPerimeter.join(dates,
      inPerimeter("siren") === dates("siren")
        && inPerimeter("période") >= dates("date_début")
        && inPerimeter("période") < dates("date_fin"),
      "left_semi")
  }

  /** Post-join feature engineering (reference
    * post_join_processing.py:40-179): lowercase columns, target label,
    * dette_par_effectif ratio, configured default fills + imputation,
    * configured lag/diff/mean time aggregates, bfill + default-fill of
    * the new lag/diff columns, dette_sur_cotisation ratios. */
  def postJoin(input: DataFrame, config: graft.ml.PipelineConfig): DataFrame = {
    import graft.ml._

    var df = input.toDF(input.columns.map(_.toLowerCase): _*)
    val targetCfg = config.target
    df = new TargetVariable(
      inputCol = targetCfg("judgment_date_col").toString,
      outputCol = targetCfg("class_col").toString,
      nMonths = targetCfg("n_months").toString.toDouble.toInt)
      .transform(df)

    if (Seq("dette_sociale_ouvrière", "dette_sociale_patronale", "effectif")
        .forall(df.columns.contains)) {
      df = df.withColumn("dette_par_effectif",
        (col("dette_sociale_ouvrière") + col("dette_sociale_patronale"))
          / col("effectif"))
    }

    val defaults = config.fillDefaultValues
      .filter { case (k, _) => df.columns.contains(k) }
    if (defaults.nonEmpty)
      df = new MissingValuesHandler(defaults.keys.toSeq, value = defaults)
        .transform(df)
    val strategies = config.fillImputationStrategy
      .filter { case (k, _) => df.columns.contains(k) }
      .groupBy(_._2).map { case (s, m) => s -> m.keys.toSeq }
    for ((strategy, cols) <- strategies)
      df = new MissingValuesHandler(cols, strategy = strategy).transform(df)

    val ta = config.timeAggregation
    for ((feat, ns) <- ta.getOrElse("lag", Map.empty); n <- ns)
      df = new LagOperator(feat, n).transform(df)
    for ((feat, ns) <- ta.getOrElse("diff", Map.empty); n <- ns)
      df = new DiffOperator(feat, n).transform(df)
    for ((feat, ns) <- ta.getOrElse("mean", Map.empty); n <- ns)
      df = new MovingAverage(feat, n).transform(df)

    val lagCols = for ((f, ns) <- ta.getOrElse("lag", Map.empty).toSeq; n <- ns)
      yield s"${f}_lag${n}m"
    val diffCols = for ((f, ns) <- ta.getOrElse("diff", Map.empty).toSeq; n <- ns)
      yield s"${f}_diff${n}m"
    val bfilled = diffCols ++ lagCols
    if (bfilled.nonEmpty) {
      df = new MissingValuesHandler(bfilled, strategy = "bfill").transform(df)
      val bfilledDefaults = (for {
        (base, v) <- config.fillDefaultValues.toSeq
        c <- bfilled if c.startsWith(base)
      } yield c -> v).toMap
      if (bfilledDefaults.nonEmpty)
        df = new MissingValuesHandler(bfilledDefaults.keys.toSeq,
          value = bfilledDefaults).transform(df)
    }

    for (n <- ta.getOrElse("mean", Map.empty).getOrElse("cotisation", Nil))
      df = df.withColumn(s"dette_sur_cotisation_mean${n}m",
        (col("dette_sociale_patronale") + col("dette_sociale_ouvrière"))
          / col(s"cotisation_mean${n}m"))
    df
  }
}
