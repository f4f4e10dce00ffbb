package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Multimodal

/** Graded multimodal-pipeline queries — the opaque-binary column
  * plumbing a training-data pipeline runs over image/audio/video
  * payloads (builder brief: multimodal columns as first-class
  * components), exercised end-to-end on deterministic payloads so the
  * DuckDB oracle can replay every SQL-expressible output.
  *
  * The payloads here are document bytes: not decodable as image or
  * audio, so the codec attempt runs its REAL probe path (ImageIO +
  * sound registry lookups per payload) and honestly reports unknown
  * dimensions (NULL width/height/sample_rate — the fake-feature arm is
  * spec-gated for determinism, not oracle-gated, since a hash-derived
  * feature vector is not SQL). What the oracle does pin: the batched
  * mapPartitions decode preserves row identity, byte lengths survive
  * the binary cast, duration-driven frame sampling explodes exactly
  * `floor(max(dur-1,0)/every)+1` rows per media, and the whole
  * pipeline is scan-shaped (one shuffle, for the per-media frame
  * count).
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MM1: documents -> media table (binary payload + typed meta) ->
    // batched decode (real probe, honest-null dims) + duration-driven
    // frame sampling. duration_ms is injected as the payload byte
    // length, making the video-style frame schedule deterministic and
    // oracle-able. media_id keyed join of the two operator outputs =
    // one shuffle; decode itself is scan-stage mapPartitions (the
    // codec is a black box, the justified non-Catalyst case).
    "mm1_media_pipeline" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
      val media = Multimodal.asMedia(docs, "doc_id", "payload", "text/plain")
        .withColumn("meta", struct(
          col("meta.mime").as("mime"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          octet_length(col("content")).cast(LongType).as("duration_ms")))
      val feats = Multimodal.decodeBatch(media, dim = 8)
      val frames = Multimodal.sampleFrames(media, everyMs = 500L, dim = 4)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
      feats.join(frames, Seq("media_id"))
        .select(col("media_id"), col("n_bytes").cast(LongType).as("n_bytes"),
          col("width"), col("sample_rate"), col("n_frames"))
        .orderBy(col("media_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "mm1_media_pipeline" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(NULL AS INTEGER) AS width,
        |  CAST(NULL AS INTEGER) AS sample_rate,
        |  CAST(floor(greatest(octet_length(encode(text)) - 1, 0) / 500.0)
        |    + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
