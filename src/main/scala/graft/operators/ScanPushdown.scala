package graft.operators

import org.apache.spark.sql.SparkSession

/** Parquet AGGREGATE pushdown — answering MIN / MAX / COUNT straight
  * from parquet footer statistics, with no row group ever decoded.
  *
  * Filter and column pushdown (exercised throughout the suite) cut
  * what a scan DECODES; aggregate pushdown goes further and removes
  * the row domain entirely: every parquet footer already stores
  * row-count plus per-column min/max per row group, so a global
  * MIN/MAX/COUNT query is a pure METADATA read — at 100 TB that is
  * the difference between touching ~thousands of KB-sized footers and
  * decoding every page of every file. The scan node advertises it as
  * `PushedAggregation` (plan-guarded in PlanShapeSpec), and the
  * aggregate the executor runs merely merges one pre-aggregated row
  * per file split.
  *
  * Two caveats pin the semantics:
  *   - Spark only plans it when the query has NO residual filter and
  *     groups by nothing (or by partition columns only) — otherwise
  *     stats can't answer exactly and the scan silently falls back to
  *     rows. The fallback is lossless, never wrong.
  *   - It is a DSv2-scan feature; parquet reads default to the v1
  *     path, so [[session]] scopes `useV1SourceList` (and the
  *     pushdown flag itself) to an isolated child session rather than
  *     flipping the whole process onto v2 semantics.
  *
  * COUNT(col) (non-null counts) also pushes via footer null-counts;
  * COUNT(DISTINCT …) and AVG never push (not derivable from stats).
  * Min/max over NaN-able float/double columns are excluded by Spark
  * itself (parquet stats order NaN differently than SQL) — the
  * `layout_agg_pushdown` query therefore reads integer, decimal-free
  * numeric and timestamp columns, where footer stats equal row-scan
  * answers exactly (oracle-checked).
  */
object ScanPushdown {
  def session(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    // empty list = every built-in source reads through its DSv2 scan
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s2
  }
}
