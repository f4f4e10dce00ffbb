package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps
import graft.operators.TimeOps

/** The reference's dataset-extraction scripts re-expressed as pure
  * DataFrame → DataFrame functions (SURVEY.md §3, reference
  * src/sf_datalake/preprocessing). Input schemas are documented in
  * FIXTURES.md §3; every function takes the already-loaded raw frames so
  * the pipelines compose and unit-test without the proprietary files.
  *
  * Scale notes: interval → month explosion uses sequence+explode (no
  * range join against a spine); every per-entity window shares one
  * exchange on the entity key; aggregations are plain hash aggregates.
  */
object Extracts {

  /** Monthly called-contribution amounts per siren (reference
    * extract_cotisation_urssaf.py:56-112).
    *
    * Input: (siret, numéro_compte, fenêtre "start'T'..-end'T'..",
    * encaissé, dû). Output: (siren, période, cotisation).
    */
  def cotisation(raw: DataFrame, minDate: String = "2014-01-01",
      maxDate: Option[String] = None,
      fillDefaults: Map[String, Any] = Map("cotisation" -> 0.0)): DataFrame = {
    val windowed = raw
      .na.drop(Seq("fenêtre"))
      .withColumn("date_début", to_date(substring(col("fenêtre"), 1, 10)))
      .withColumn("date_fin", to_date(substring(col("fenêtre"), 21, 10)))
      .filter(col("date_fin") > lit(minDate))
      .withColumn("siren", ColumnOps.siretToSiren(col("siret")))
      .withColumn("cotisation_appelée_par_mois",
        col("dû") / months_between(col("date_fin"), col("date_début")))
    // période ∈ [date_début, date_fin - 1 day], monthly. With a known
    // global bound the broadcast-spine range join wins (ScaleProbe:
    // ~3.5× over sequence+explode, whose per-element calendar arithmetic
    // dominates); without one, fall back to the per-row explode.
    val monthly = (maxDate match {
      case Some(mx) => TimeOps.explodeIntervalViaSpine(windowed,
        "date_début", "date_fin", spineStart = minDate, spineEnd = mx,
        outCol = "période", endExclusive = true)
      case None => TimeOps.explodeInterval(windowed, "date_début",
        "date_fin", outCol = "période", endExclusive = true)
    }).filter(col("période") >= lit(minDate))
    monthly.groupBy(col("siren"), col("période"))
      .agg(sum(col("cotisation_appelée_par_mois")).as("cotisation"))
      .na.fill(fillDefaults.filter(_._1 == "cotisation"))
  }

  /** Monthly social-debt amounts per siren (reference
    * extract_debit_urssaf.py:58-150): latest revision per
    * (compte, écart, période, période_cotisation) ordered by the history
    * number, summed per (siren, période).
    *
    * The reference joins every row against a full monthly spine with
    * `période >= date_traitement` (one-sided interval — each debt visible
    * from its treatment date onward). We bound the explosion with
    * `maxDate` (the reference's spine also ends at "today").
    */
  def debit(raw: DataFrame, minDate: String = "2014-01-01",
      maxDate: String): DataFrame = {
    val withSiren = raw.withColumn("siren", ColumnOps.siretToSiren(col("siret")))
      .withColumn("date_traitement_d", to_date(col("date_traitement")))
    // one-sided interval (each debt visible from its treatment date on)
    // against a broadcast month spine: the codegen'd broadcast join beats
    // per-row sequence+explode (ScaleProbe ~3.5×), and a month-start m
    // satisfies m >= date_traitement exactly when m is on/after the first
    // spine month >= date_traitement — the reference's visibility rule.
    val spine = broadcast(
      TimeOps.dateSpine(raw.sparkSession, minDate, maxDate))
    val monthly = withSiren
      .filter(col("date_traitement_d") <= lit(maxDate))
      .join(spine, col("période") >= col("date_traitement_d"))
    val latest = TimeOps.latestRevision(monthly,
      Seq("numéro_compte", "numéro_écart_négatif", "période",
        "période_cotisation"),
      "numéro_historique_écart_négatif")
    latest.groupBy(col("siren"), col("période"))
      .agg(sum(col("dette_sociale_ouvrière")).as("dette_sociale_ouvrière"),
        sum(col("dette_sociale_patronale")).as("dette_sociale_patronale"))
      .na.fill(Map("dette_sociale_ouvrière" -> 0.0,
        "dette_sociale_patronale" -> 0.0))
  }

  /** Monthly partial-activity hours per siren (reference
    * extract_ap_data.py:85-240): authorized hours from `demande`
    * (overlapping validity intervals merged gaps-and-islands style,
    * amounts normalized per day), consumed hours from `consommation`,
    * full-outer joined.
    *
    * Scale deviation (same result): the reference explodes every
    * interval to DAILY rows against a day spine, then re-aggregates to
    * months — an O(days) blowup. We integrate the daily rate over each
    * month arithmetically: rows stay monthly.
    */
  def ap(demande: DataFrame, consommation: DataFrame,
      minDate: String = "2014-01-01", maxDate: String): DataFrame = {
    // per-day authorized hours over [date_début, date_fin] inclusive
    val normalized = demande
      .select(col("siret"), col("date_début"), col("date_fin"), col("hta"))
      .withColumn("ap_heures_autorisées_par_jour",
        col("hta") / (datediff(col("date_fin"), col("date_début")) + 1))
    // islands of overlapping intervals per siret (reference W8)
    val w = Window.partitionBy(col("siret")).orderBy(col("date_début"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(col("siret")).orderBy(col("date_début"))
    val islands = normalized
      .withColumn("date_fin_max_cumulé", max(col("date_fin")).over(w))
      .withColumn("nouvel_intervalle",
        when(col("date_début") > lag(col("date_fin_max_cumulé"), 1).over(wLag), 1)
          .otherwise(0))
      .withColumn("id_intervalle", sum(col("nouvel_intervalle")).over(w))
      .drop("nouvel_intervalle", "date_fin_max_cumulé")
    // month × interval rows: month list each interval touches, with the
    // number of covered days in that month (daily explode → monthly,
    // done arithmetically)
    val monthly = islands
      .withColumn("mois", explode(sequence(
        date_trunc("month", col("date_début")).cast(DateType),
        date_trunc("month", col("date_fin")).cast(DateType),
        expr("interval 1 month"))))
      .withColumn("jours_couverts",
        datediff(
          least(col("date_fin"), last_day(col("mois"))),
          greatest(col("date_début"), col("mois"))) + 1)
      .withColumn("ap_heures_mois",
        col("ap_heures_autorisées_par_jour") * col("jours_couverts"))
    val demandeAgg = monthly
      .groupBy(col("mois").as("période"), col("siret"), col("id_intervalle"))
      .agg(sum(col("ap_heures_mois")).as("ap_heures_autorisées"))
      .withColumn("siren", ColumnOps.siretToSiren(col("siret")))
      .groupBy(col("siren"), col("période"))
      .agg(sum(col("ap_heures_autorisées")).as("ap_heures_autorisées"))
      .filter(col("période").between(lit(minDate), lit(maxDate)))
    val consoAgg = consommation
      .select(col("siret"), col("période"), col("ap_heures_consommées"))
      .withColumn("siren", ColumnOps.siretToSiren(col("siret")))
      .groupBy(col("siren"), col("période"))
      .agg(sum(col("ap_heures_consommées")).as("ap_heures_consommées"))
    demandeAgg.join(consoAgg, Seq("période", "siren"), "outer")
      .select(col("siren"), col("période"), col("ap_heures_consommées"),
        col("ap_heures_autorisées"))
      .na.fill(Map("ap_heures_consommées" -> 0.0,
        "ap_heures_autorisées" -> 0.0))
  }

  /** Monthly paydex snapshot per siren (reference
    * altares_preprocessing.py:44-95): FPIs clipped to [0,100] and
    * normalized; latest value per month kept. The reference relies on
    * nondeterministic groupBy+last over file order (SURVEY.md §7.4.5);
    * we keep the value at the max `date` per month via max_by. */
  def altares(raw: DataFrame): DataFrame = {
    val numCols = Seq("paydex", "fpi_30", "fpi_90", "encours_étudiés",
      "n_fournisseurs")
    val clipped = raw
      .withColumn("fpi_30",
        ColumnOps.clip(col("fpi_30"), Some(lit(0)), Some(lit(100))) / 100)
      .withColumn("fpi_90",
        ColumnOps.clip(col("fpi_90"), Some(lit(0)), Some(lit(100))) / 100)
    clipped
      .groupBy(col("siren"),
        trunc(col("date"), "month").as("période"))
      .agg(max_by(col(numCols.head), col("date")).as(numCols.head),
        numCols.tail.map(c => max_by(col(c), col("date")).as(c)): _*)
  }

  /** First qualifying judgment date per siren (reference
    * extract_judgment_DGFiP_data.py:40-70). `dateCol` is a yyyyMMdd
    * string/int column; `codeCol` the judgment-nature code. */
  def judgments(raw: DataFrame, codeCol: String, dateCol: String,
      codes: Seq[String] = Seq("1", "2", "3", "4", "8"),
      startDate: String = "2014-01-01",
      endDate: String = "2100-01-01"): DataFrame = {
    raw.withColumn("djug",
        to_date(col(dateCol).cast(StringType), "yyyyMMdd"))
      .filter(col(codeCol).cast(StringType).isin(codes: _*)
        && col("djug") >= lit(startDate) && col("djug") <= lit(endDate))
      .groupBy(col("siren"))
      .agg(min(col("djug")).as("date_jugement"))
  }

  /** Normalize data by its validity time-span length in days (reference
    * TimeNormalizer, transform.py:542-598). */
  def timeNormalize(df: DataFrame, inputCols: Seq[String], start: String,
      end: String): DataFrame =
    inputCols.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c) / datediff(col(end), col(start))))
}
