package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Pluggable source/sink layer (SURVEY.md §7.1 step 4): every external
  * system the reference touches (S1–S6, O1–O7) behind a trait, with
  * hermetic file/memory implementations as first-class citizens and
  * connector-backed implementations as configuration.
  *
  * Kafka (S1) and JDBC (S2) bind by format name at runtime — the code
  * is complete and mirrors the reference's options
  * (streaming_etl.py:36-46, 66-85), but executing them requires the
  * spark-sql-kafka / JDBC-driver jars on the deployment classpath
  * (not shipped in this hermetic environment).
  */
sealed trait BatchSource { def load(spark: SparkSession): DataFrame }
sealed trait StreamSource { def loadStream(spark: SparkSession): DataFrame }

/** S3: CSV batch scan, header + optional schema/inference. */
final case class CsvSource(path: String, schema: Option[StructType] = None,
                           inferSchema: Boolean = true) extends BatchSource {
  def load(spark: SparkSession): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", inferSchema.toString))(r.schema)
      .csv(path)
  }
}

/** Parquet batch scan (the engine's native at-rest format). */
final case class ParquetSource(path: String) extends BatchSource {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** JSON-lines batch scan (schema-declared to skip the inference pass,
  * or inferred when absent — same contract as [[CsvSource]]).
  */
final case class JsonSource(path: String, schema: Option[StructType] = None)
    extends BatchSource {
  def load(spark: SparkSession): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }
}

/** ORC batch scan — the other columnar format Spark ships natively;
  * predicate pushdown and column pruning work as for parquet.
  */
final case class OrcSource(path: String) extends BatchSource {
  def load(spark: SparkSession): DataFrame = spark.read.orc(path)
}

/** S2: JDBC full-table scan of a dimension, cached after load
  * (streaming_etl.py:73-85). Requires the driver jar at deploy time.
  */
final case class JdbcSource(url: String, table: String,
                            props: Map[String, String]) extends BatchSource {
  def load(spark: SparkSession): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p).cache()
  }
}

/** S4: schema-declared streaming file source (drop folder). */
final case class FileStreamSource(path: String, schema: StructType,
                                  format: String = "csv") extends StreamSource {
  def loadStream(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)
}

/** S1: Kafka streaming source with the reference's exact options
  * (subscribe, earliest, failOnDataLoss=false, maxOffsetsPerTrigger).
  * Requires spark-sql-kafka on the deployment classpath.
  */
final case class KafkaSource(bootstrap: String, topic: String,
                             maxOffsetsPerTrigger: Long = 1000L)
    extends StreamSource {
  def loadStream(spark: SparkSession): DataFrame =
    try spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .load()
    catch {
      // Spark surfaces a missing connector at lookup time as
      // DATA_SOURCE_NOT_FOUND (an AnalysisException in Spark 4, a raw
      // ClassNotFoundException in older lines); translate it into an
      // actionable deploy-posture message instead of a class name
      case e @ (_: ClassNotFoundException |
                _: org.apache.spark.sql.AnalysisException)
          if String.valueOf(e.getMessage).contains("DATA_SOURCE_NOT_FOUND") ||
            String.valueOf(e.getMessage).contains("Failed to find") ||
            e.isInstanceOf[ClassNotFoundException] =>
        throw new IllegalStateException(
        "KafkaSource: the Kafka connector is not on the classpath. Add " +
          "the spark-sql-kafka-0-10 package (matching your Spark/Scala " +
          "version, with its kafka-clients dependency) to the deployment " +
          "classpath — e.g. spark-submit --packages org.apache.spark:" +
          "spark-sql-kafka-0-10_2.13:<spark-version>.", e)
    }
}

/** Rate source for load testing (rows/sec generator). */
final case class RateSource(rowsPerSecond: Long) extends StreamSource {
  def loadStream(spark: SparkSession): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
}

sealed trait BatchSink { def write(df: DataFrame): Unit }

/** O7: CSV sink (batch overwrite, as src/teste.py:175). */
final case class CsvSink(path: String, mode: String = "overwrite")
    extends BatchSink {
  def write(df: DataFrame): Unit =
    df.write.option("header", "true").mode(mode).csv(path)
}

/** O2/O3-style append sink in the engine's native format. */
final case class ParquetSink(path: String, mode: String = "append")
    extends BatchSink {
  def write(df: DataFrame): Unit = df.write.mode(mode).parquet(path)
}

/** JSON-lines sink (interchange with non-columnar consumers). */
final case class JsonSink(path: String, mode: String = "overwrite")
    extends BatchSink {
  def write(df: DataFrame): Unit = df.write.mode(mode).json(path)
}

/** ORC sink — columnar alternative for ORC-native warehouses. */
final case class OrcSink(path: String, mode: String = "overwrite")
    extends BatchSink {
  def write(df: DataFrame): Unit = df.write.mode(mode).orc(path)
}

/** O2/O3: JDBC append (at-least-once; duplicate risk documented in
  * SURVEY.md T5 — offer PK dedup upstream via dropDuplicates).
  */
final case class JdbcSink(url: String, table: String,
                          props: Map[String, String]) extends BatchSink {
  def write(df: DataFrame): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    df.write.mode("append").jdbc(url, table, p)
  }
}

/** PK-upsert JDBC sink — the idempotent-write option SURVEY.md §7.4
  * documents for the at-least-once foreachBatch JDBC path: rows are
  * keyed by `keyCols` and a write REPLACES the key's previous row, so
  * a redelivered micro-batch (or a retried partition task) collapses
  * to one row per key instead of appending duplicates — effective
  * exactly-once on a keyed table, where [[JdbcSink]] is at-least-once.
  *
  * Shape: the batch is first deduplicated on the key (arbitrary
  * within-batch winner, same as any upsert under one batch id), then
  * each PARTITION opens one connection and runs a transactional
  * batched delete-then-insert per key — the dialect-portable upsert
  * (works on every JDBC engine; swap in MERGE / INSERT..ON CONFLICT
  * for engines where the single-statement form is cheaper, the plan
  * shape is unchanged). Rows never pass through the driver. Partition
  * transactions make task retries safe: a replayed partition deletes
  * its own half-written keys before reinserting. Assumes the batch
  * query is the table's single writer (the foreachBatch posture);
  * concurrent writers would need the engine's native upsert + a
  * unique index.
  */
final case class JdbcUpsertSink(url: String, table: String,
                                keyCols: Seq[String],
                                props: Map[String, String]) extends BatchSink {
  def write(df: DataFrame): Unit = {
    val cols = df.schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"key columns $keyCols must be a subset of row columns $cols")
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    // first use creates the (empty) table with Spark's JDBC schema
    // mapping — same conventions as the append sink
    df.limit(0).write.mode("append").jdbc(url, table, p)
    // Spark quotes column identifiers on CREATE; mirror it
    def q(c: String) = "\"" + c + "\""
    // engines that map StringType to a LOB type (Derby → CLOB) reject
    // equality on the raw column; compare through a VARCHAR cast
    val keyPred = df.schema.filter(f => keyCols.contains(f.name))
      .sortBy(f => keyCols.indexOf(f.name))
      .map(f => f.dataType match {
        case org.apache.spark.sql.types.StringType =>
          s"CAST(${q(f.name)} AS VARCHAR(32672)) = ?"
        case _ => s"${q(f.name)} = ?"
      }).mkString(" AND ")
    val (u, t, drv, keys, all) =
      (url, table, props.get("driver"), keyCols, cols)
    df.dropDuplicates(keyCols).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        drv.foreach(Class.forName(_))
        val conn = java.sql.DriverManager.getConnection(u)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(s"DELETE FROM $t WHERE $keyPred")
          val ins = conn.prepareStatement(
            s"INSERT INTO $t (${all.map(q).mkString(", ")}) VALUES (" +
              all.map(_ => "?").mkString(", ") + ")")
          rows.foreach { r =>
            keys.zipWithIndex.foreach { case (k, i) =>
              del.setObject(i + 1, r.get(r.fieldIndex(k))) }
            del.addBatch()
            all.zipWithIndex.foreach { case (c, i) =>
              ins.setObject(i + 1, r.get(r.fieldIndex(c))) }
            ins.addBatch()
          }
          del.executeBatch()
          ins.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
    }
  }
}

/** Replay-safe batch sink for at-least-once streaming delivery (T5):
  * each micro-batch lands in its own `batch=<id>` partition directory
  * with overwrite, so a redelivered batch replaces itself instead of
  * appending duplicates. Readers scan the root path. This closes the
  * duplicate-risk gap the reference leaves open on its JDBC append
  * path (SURVEY.md T5).
  */
final case class IdempotentBatchSink(root: String) {
  def write(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$root/batch=$batchId")
}

object Sinks {
  /** O6: console debug sink on a stream (truncate off, 5 rows). */
  def console(stream: DataFrame, intervalMs: Long = 30000L): StreamingQuery =
    graft.streaming.StreamingJob.startConsoleMetrics(stream, intervalMs)
}
