package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-contract registrations for the multimodal plumbing over
  * `documents` (payload = UTF-8 bytes as the opaque binary column).
  * The metadata pass is oracle-checked (byte length + md5 digest are
  * engine-independent); the feature extraction is stub-decoded →
  * rows-only check + exact ScalaTest assertions.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.payloadMeta(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .as[Multimodal.MediaRow]
      // The array column is flattened to a deterministic string for the
      // driver's rows-only check (pandas can't sort ndarray cells); the
      // typed Dataset[MediaFeatures] API keeps the real array and is
      // exact-asserted in IoMultimodalSpec.
      Multimodal.extractFeatures(media, dim = 16).toDF()
        .select(col("media_id"), col("modality"),
          size(col("features")).as("dim"),
          concat_ws(",", transform(col("features"),
            f => format_string("%.3f", f.cast("double")))).as("features_csv"))
    }),
    // frame-sampling plumbing; the stub's byte-range frames make the
    // stats pure arithmetic, so this one IS oracle-checked
    "mm_frame_stats" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .as[Multimodal.MediaRow]
      Multimodal.frameStats(media, every = 32).toDF()
    }))

  val oracleSql: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id, 'image' AS modality,
        |       octet_length(encode(text))::INT AS n_bytes,
        |       md5(text) AS digest,
        |       'fake/raw' AS format,
        |       (length(text) % 640)::INT AS width,
        |       (length(text) % 480)::INT AS height
        |FROM documents""".stripMargin,
    "mm_frame_stats" ->
      """WITH l AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id AS media_id,
        |       ceil(n / 32.0)::INT AS n_frames,
        |       least(32, n)::INT AS first_bytes,
        |       CASE WHEN n = 0 THEN 0
        |            ELSE n - (ceil(n / 32.0)::INT - 1) * 32 END::INT
        |         AS last_bytes
        |FROM l""".stripMargin)
}
