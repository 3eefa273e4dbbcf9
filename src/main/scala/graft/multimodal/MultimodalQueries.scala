package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      Multimodal.extractFeatures(media, dim = 16).toDF()
    }))

  val oracleSql: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id, 'image' AS modality,
        |       octet_length(encode(text))::INT AS n_bytes,
        |       md5(text) AS digest,
        |       'fake/raw' AS format,
        |       (length(text) % 640)::INT AS width,
        |       (length(text) % 480)::INT AS height
        |FROM documents""".stripMargin)
}
