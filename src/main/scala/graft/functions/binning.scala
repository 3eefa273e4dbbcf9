package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value binning (reference P17: dashboard.py:447-450,185-192 uses
  * `pd.cut`). Implemented as a `when` chain — a pure Catalyst expression
  * that stays inside whole-stage codegen (vs ml.feature.Bucketizer which
  * needs a Double input column and leaves the expression world).
  */
object Binning {

  /** Left-open/right-closed buckets like pd.cut: (b0,b1], (b1,b2], ...
    * Values <= b0 or null fall into the `null` label like pd.cut.
    * Labels are "lo-hi" with "+" for the open top bucket.
    */
  def cut(c: Column, bounds: Seq[Double], labels: Seq[String]): Column = {
    require(bounds.size == labels.size + 1 || bounds.size == labels.size,
      "bounds must be labels+1 (closed) or labels (open top)")
    val pairs = labels.zipWithIndex.map { case (lbl, i) =>
      val lo = bounds(i)
      val hiOpt = if (i + 1 < bounds.size) Some(bounds(i + 1)) else None
      (lo, hiOpt, lbl)
    }
    pairs.foldLeft(Option.empty[Column]) { case (acc, (lo, hiOpt, lbl)) =>
      val cond = hiOpt.fold(c > lit(lo))(hi => c > lit(lo) && c <= lit(hi))
      Some(acc.fold(when(cond, lbl))(_.when(cond, lbl)))
    }.get
  }

  /** Integer bucket index, SQL `width_bucket`-style: equal-width buckets
    * over [lo, hi) → 1..n, below → 0, at/above hi → n+1. Matches DuckDB /
    * ANSI width_bucket so the oracle can express the same thing.
    */
  def widthBucket(c: Column, lo: Double, hi: Double, n: Int): Column =
    when(c < lit(lo), 0)
      .when(c >= lit(hi), n + 1)
      .otherwise((floor((c - lit(lo)) / lit((hi - lo) / n)) + 1).cast("int"))

  /** Deterministic split bucket in [0, 100): the Knuth-multiplicative
    * assignment (id·2654435761) mod 100, computed in modular space —
    * (id mod 100)·(2654435761 mod 100 = 61) mod 100, identical for
    * every id by modular arithmetic but free of the i64 overflow the
    * direct product hits for ids above ~3.5·10⁹ (which ANSI mode turns
    * into a runtime error — a real id range at 100 TB). Oracle SQL
    * must use the same `(id % 100) * 61 % 100` form.
    */
  def knuthBucket(id: Column): Column =
    pmod(pmod(id, lit(100)) * lit(61), lit(100))

  /** Deterministic pseudo-uniform u ∈ [0, 1) from an integer id over a
    * prime modulus: (id·2654435761) mod 1000003, divided by 1000003 —
    * the acceptance-test hash behind the deterministic samplers
    * (sample_quality_weighted / sample_temperature_mix /
    * sample_source_epochs and the s27/s32 streams). Same modular-space
    * discipline as [[knuthBucket]]: computed as
    * (id mod 1000003)·(2654435761 mod 1000003 = 427799) mod 1000003,
    * identical to the direct product for every id but free of the i64
    * overflow the direct form hits above ~3.5·10⁹ (Spark would wrap
    * silently — biasing every large id toward +1 copy — while DuckDB
    * raises). Deliberately the SIGN-PRESERVING `%`, not pmod: both
    * engines' `%` keeps the dividend's sign, and congruent
    * representatives below the modulus with matching signs are equal
    * — so a negative id hashes identically to the pre-r8 direct
    * product on BOTH sides, where pmod would diverge from the oracle.
    * Oracle SQL must use the same
    * `(id % 1000003) * 427799 % 1000003` form.
    */
  def unitHash(id: Column): Column =
    (id % lit(1000003L) * lit(427799L) % lit(1000003L))
      .cast("double") / lit(1000003.0)
}
