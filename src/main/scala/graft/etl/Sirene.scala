package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sirene registry extraction (reference
  * extract_sirene_categorical.py:140-202 and extract_sirene_dates.py:30-87
  * — the reference runs these driver-side in pandas; here they are
  * ordinary distributed DataFrame transforms).
  *
  * The department→region tables are the public INSEE mapping the
  * reference embeds. */
object Sirene {

  /** INSEE department code (2 chars) → region. */
  val Regions: Map[String, String] = Map(
    "01" -> "Auvergne-Rhône-Alpes",
    "03" -> "Auvergne-Rhône-Alpes",
    "07" -> "Auvergne-Rhône-Alpes",
    "15" -> "Auvergne-Rhône-Alpes",
    "26" -> "Auvergne-Rhône-Alpes",
    "38" -> "Auvergne-Rhône-Alpes",
    "42" -> "Auvergne-Rhône-Alpes",
    "43" -> "Auvergne-Rhône-Alpes",
    "63" -> "Auvergne-Rhône-Alpes",
    "69" -> "Auvergne-Rhône-Alpes",
    "73" -> "Auvergne-Rhône-Alpes",
    "74" -> "Auvergne-Rhône-Alpes",
    "02" -> "Hauts-de-France",
    "59" -> "Hauts-de-France",
    "60" -> "Hauts-de-France",
    "62" -> "Hauts-de-France",
    "80" -> "Hauts-de-France",
    "04" -> "Provence-Alpes-Côte d'Azur",
    "05" -> "Provence-Alpes-Côte d'Azur",
    "06" -> "Provence-Alpes-Côte d'Azur",
    "13" -> "Provence-Alpes-Côte d'Azur",
    "83" -> "Provence-Alpes-Côte d'Azur",
    "84" -> "Provence-Alpes-Côte d'Azur",
    "08" -> "Grand Est",
    "10" -> "Grand Est",
    "51" -> "Grand Est",
    "52" -> "Grand Est",
    "54" -> "Grand Est",
    "55" -> "Grand Est",
    "57" -> "Grand Est",
    "67" -> "Grand Est",
    "68" -> "Grand Est",
    "88" -> "Grand Est",
    "09" -> "Occitanie",
    "11" -> "Occitanie",
    "12" -> "Occitanie",
    "30" -> "Occitanie",
    "31" -> "Occitanie",
    "32" -> "Occitanie",
    "34" -> "Occitanie",
    "46" -> "Occitanie",
    "48" -> "Occitanie",
    "65" -> "Occitanie",
    "66" -> "Occitanie",
    "81" -> "Occitanie",
    "82" -> "Occitanie",
    "14" -> "Normandie",
    "27" -> "Normandie",
    "50" -> "Normandie",
    "61" -> "Normandie",
    "76" -> "Normandie",
    "18" -> "Centre-Val de Loire",
    "28" -> "Centre-Val de Loire",
    "36" -> "Centre-Val de Loire",
    "37" -> "Centre-Val de Loire",
    "41" -> "Centre-Val de Loire",
    "45" -> "Centre-Val de Loire",
    "16" -> "Nouvelle-Aquitaine",
    "17" -> "Nouvelle-Aquitaine",
    "19" -> "Nouvelle-Aquitaine",
    "23" -> "Nouvelle-Aquitaine",
    "24" -> "Nouvelle-Aquitaine",
    "33" -> "Nouvelle-Aquitaine",
    "40" -> "Nouvelle-Aquitaine",
    "47" -> "Nouvelle-Aquitaine",
    "64" -> "Nouvelle-Aquitaine",
    "79" -> "Nouvelle-Aquitaine",
    "86" -> "Nouvelle-Aquitaine",
    "87" -> "Nouvelle-Aquitaine",
    "20" -> "Corse",
    "21" -> "Bourgogne-Franche-Comté",
    "25" -> "Bourgogne-Franche-Comté",
    "39" -> "Bourgogne-Franche-Comté",
    "58" -> "Bourgogne-Franche-Comté",
    "70" -> "Bourgogne-Franche-Comté",
    "71" -> "Bourgogne-Franche-Comté",
    "89" -> "Bourgogne-Franche-Comté",
    "90" -> "Bourgogne-Franche-Comté",
    "22" -> "Bretagne",
    "29" -> "Bretagne",
    "35" -> "Bretagne",
    "56" -> "Bretagne",
    "44" -> "Pays de la Loire",
    "49" -> "Pays de la Loire",
    "53" -> "Pays de la Loire",
    "72" -> "Pays de la Loire",
    "85" -> "Pays de la Loire",
    "75" -> "Île-de-France",
    "77" -> "Île-de-France",
    "78" -> "Île-de-France",
    "91" -> "Île-de-France",
    "92" -> "Île-de-France",
    "93" -> "Île-de-France",
    "94" -> "Île-de-France",
    "95" -> "Île-de-France",
    "97" -> "DROM",
    "98" -> "DROM",
    "2A" -> "Corse-du-Sud",
    "2B" -> "Haute-Corse")

  /** Overseas (DROM) 3-char commune prefixes → region. */
  val Drom: Map[String, String] = Map(
    "971" -> "Guadeloupe",
    "972" -> "Martinique",
    "973" -> "Guyane",
    "974" -> "La Réunion",
    "975" -> "Saint-Pierre-et-Miquelon",
    "976" -> "Mayotte",
    "977" -> "Saint-Barthélemy",
    "978" -> "Saint-Martin",
    "984" -> "Terres australes et antarctiques françaises",
    "986" -> "Wallis-et-Futuna",
    "987" -> "Polynésie française",
    "988" -> "Nouvelle-Calédonie",
    "989" -> "île Clipperton")

  /** Head-office categorical attributes per company: join établissement
    * (head offices only) with unité légale, derive the région from the
    * commune code. */
  def categorical(etablissement: DataFrame, uniteLegale: DataFrame): DataFrame = {
    val regionsCol = typedLit(Regions)
    val dromCol = typedLit(Drom)
    val et = etablissement
      .select(col("siren"), col("siret"),
        col("etablissementSiege").as("siège"),
        col("codeCommuneEtablissement").as("code_commune"),
        col("activitePrincipaleEtablissement").as("code_naf"))
      .filter(col("siège"))
      .drop("siège")
      .withColumn("région", regionsCol(substring(col("code_commune"), 1, 2)))
      .withColumn("région",
        when(col("région") === "DROM", dromCol(substring(col("code_commune"), 1, 3)))
          .otherwise(col("région")))
    val ul = uniteLegale.select(col("siren"),
      col("categorieJuridiqueUniteLegale").as("catégorie_juridique"))
    et.join(ul, Seq("siren"), "inner")
  }

  /** Activity-date intervals per company: head-office sirets joined with
    * the historical établissement records, active periods only. */
  def dates(etHistorique: DataFrame, categoricalOut: DataFrame): DataFrame = {
    // the reference drops null RAW dates ("entreprise purgée") before
    // parsing with errors=coerce — unparseable non-null dates are KEPT
    // as nulls; try_to_date reproduces the coercion
    val hist = etHistorique
      .select(col("siret"),
        col("etatAdministratifEtablissement").as("état_actif"),
        col("dateDebut"), col("dateFin"))
      .na.drop(Seq("état_actif", "dateDebut"))
      .filter(col("état_actif") === "A")
      .select(col("siret"),
        try_to_date(col("dateDebut"), "yyyy-MM-dd").as("date_début"),
        try_to_date(col("dateFin"), "yyyy-MM-dd").as("date_fin"))
    categoricalOut.select(col("siren"), col("siret"))
      .join(hist, Seq("siret"), "inner")
      .drop("siret")
  }
}
