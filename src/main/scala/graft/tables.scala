package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All queries in [[SparkEntry]] read these parquet tables; the DuckDB
  * oracle reads the very same files, so names/types line up by
  * construction. Reads go through `spark.read.parquet` so Catalyst gets
  * full pushdown (PushedFilters / ReadSchema pruning) into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL). Read it as raw long nanos
    * (legacy conf) and convert with integer division — ns-since-epoch
    * exceeds 2^53, so a double division would corrupt the value.
    * DuckDB reads the same file natively at ns precision; every query
    * that emits a timestamp therefore truncates to a common grain
    * (second or hour) on both sides.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Unlike `events.ts` (TIMESTAMP NANOS), the star-schema date
    * columns are plain microsecond TIMESTAMP_NTZ — the ordinary
    * loaders are timestamp-safe, and date predicates push down to the
    * parquet scan. These aliases exist so query code documents that
    * the timestamp column is deliberately touched.
    */
  def ordersTs(s: SparkSession, d: String): DataFrame = orders(s, d)
  def lineitemTs(s: SparkSession, d: String): DataFrame = lineitem(s, d)

  /** Streaming file-source variant of [[events]] (S4 semantics:
    * schema-declared streaming read of a drop location). Same nanos →
    * micros conversion as the batch reader, so stream and batch
    * lineages produce identical rows.
    */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    // glob (not a bare file path) so the stream source's basePath
    // resolves to the directory
    s.readStream.schema(schema).parquet(s"$d/events.parque[t]")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming file-source variant of [[documents]] (same S4 drop-
    * location semantics as [[eventsStream]]); plain µs-safe types, no
    * conversion needed.
    */
  def documentsStream(s: SparkSession, d: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    s.readStream.schema(schema).parquet(s"$d/documents.parque[t]")
  }

  /** Streaming file-source variant of [[embeddings]] (S4 drop-location
    * semantics) — the arrival shape of a vector-ingest pipeline.
    */
  def embeddingsStream(s: SparkSession, d: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType)))
    s.readStream.schema(schema).parquet(s"$d/embeddings.parque[t]")
  }
}
