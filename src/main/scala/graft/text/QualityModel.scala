package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Model-based quality scoring: a fastText-shaped linear classifier
  * over a hashed bag-of-words — the shape of the "quality classifier"
  * stage every large-scale curation pipeline runs (CCNet / GPT-3-style
  * filtering), distilled to its dataflow.
  *
  * The dataflow is the point: per doc, hash each token into one of
  * `Buckets` weight slots, mean-pool the weights, add a bias, squash.
  * Everything happens INSIDE one row via higher-order array functions
  * (`transform` + `aggregate`) — no explode, no shuffle, no UDF; the
  * scoring pass is map-only at any corpus size and pipelines into
  * whatever scan precedes it. A trained model would arrive as a
  * `Buckets`-sized weight array literal (or broadcast); here the
  * weights are a deterministic function of the bucket id so the DuckDB
  * oracle replays scoring END-TO-END (md5-derived bucket → weight →
  * ordered mean-pool → sigmoid) and hash-matches the scores.
  *
  * Floating-point parity: the fold accumulates in list order in both
  * engines, so the double sum is bit-identical; only `exp` may differ
  * by an ulp between libms, which the 6-decimal rounding absorbs —
  * and the label compares the ROUNDED score against the threshold so
  * a boundary ulp cannot flip it on one side only.
  */
object QualityModel {

  val Buckets = 1000
  val Bias = -0.1

  /** Weight slot for one token: uniform in [-0.5, 0.5), keyed by the
    * first 8 hex digits of md5 (fits a long; no overflow on either
    * engine).
    */
  def tokenWeight(t: Column): Column =
    (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % Buckets)
      .cast("double") / Buckets - 0.5

  /** Mean-pooled hashed-linear score squashed to (0,1); tokenless docs
    * score the bare bias.
    */
  def score(text: Column): Column = {
    val toks = Text.tokens(lower(text))
    val pooled = aggregate(transform(toks, tokenWeight(_)),
      lit(0.0), (acc, x) => acc + x) / size(toks)
    val z = when(size(toks) > 0, lit(Bias) + pooled).otherwise(lit(Bias))
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
