package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregations: two-phase salted
  * aggregation. Phase 1 groups on (key, salt) — a hot key's rows
  * spread over `buckets` reducers; phase 2 merges the partials on the
  * key alone (tiny input: ≤ buckets rows per key).
  *
  * Spark's AQE skew-join handling covers joins; salting covers
  * aggregations whose partial aggregation doesn't reduce enough
  * (e.g. count-distinct-ish states, collect-style aggs) or
  * pre-AQE/streaming plans. For plain algebraic aggs Catalyst's
  * map-side combine usually suffices — salting is the explicit,
  * plan-visible variant for the pathological-key case.
  */
object Skew {

  /** Salted count: equals `df.groupBy(key).count()` for any data. */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(buckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("n"))

  /** Salted sum/avg: two-phase (sum, count) merge. */
  def saltedAvg(df: DataFrame, key: Column, value: Column,
                buckets: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(buckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("s"), count(lit(1)).as("c"))
      .groupBy(col("key"))
      .agg((sum(col("s")) / sum(col("c"))).as("avg"),
        sum(col("c")).as("n"))
}
