package graft.operators

import org.apache.spark.sql.SparkSession

/** Runtime Bloom-filter join pruning (Catalyst `InjectRuntimeFilter`).
  *
  * For a shuffle join where one side carries a selective predicate,
  * Spark can build a Bloom filter over the creation side's join keys
  * (`bloom_filter_agg`) and push a `might_contain` probe into the
  * application side's SCAN — fact rows that cannot match are dropped
  * before they are shuffled. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling only the ~selectivity
  * fraction that can survive the join; the filter is lossless (Bloom
  * false positives are re-checked by the join itself).
  *
  * Spark only plans this on non-broadcast joins and gates it on size
  * thresholds, so [[session]] returns an isolated child session (own
  * conf, shared context — no cross-query conf races) tuned so the
  * pattern fires on local test data: broadcast off (forcing the
  * shuffle join that makes pruning meaningful) and the
  * application-side floor lowered (upstream default 10 GB — the right
  * gate at cluster scale, meaningless at sf0.01).
  */
object BloomJoin {
  def session(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2
  }
}
