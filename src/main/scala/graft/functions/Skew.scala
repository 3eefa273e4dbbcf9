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

  /** Salted inner equi-join for a skewed fact side against a dim too
    * big (or undesirable) to broadcast: fact rows get a deterministic
    * salt in [0, buckets), the dim is replicated once per salt value,
    * and the join key becomes (key, salt) — a hot key's rows spread
    * over `buckets` reducers instead of landing on one. Result equals
    * the plain inner equi-join for any data (each fact row meets
    * exactly the one dim replica carrying its salt). Cost: dim is
    * shuffled `buckets`×. AQE's skew-join split is the optimizer-side
    * equivalent; this is the explicit plan-visible variant that also
    * works pre-AQE and in streaming plans.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 32): DataFrame = {
    // content-hash salt, NOT partition-id/monotonic-id: those change
    // when a lost task recomputes with different row order, so a
    // straggler retry could re-salt rows into reduce partitions that
    // were already consumed (rows joined twice or dropped). A hash of
    // the row's columns is stable under any recomputation; identical
    // duplicate rows share a bucket, which only matters if one exact
    // row dominates the skew.
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
