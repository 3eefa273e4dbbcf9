package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar scoring / gating expressions of the reference's fraud pipeline,
  * as pure `Column`-valued functions (all Spark built-ins → whole-stage
  * codegen, zero UDFs).
  *
  * Reference semantics (file:line in /root/reference):
  *  - t5 distance score: containers/spark-etl/streaming_etl.py:115-120
  *  - t6 threshold score: streaming_etl.py:121-123
  *  - t7 hour-of-day score: streaming_etl.py:125-127
  *  - score combine (product form, canonical): streaming_etl.py:128-130;
  *    dev mean form: src/teste.py:103-106
  *  - score gate (NOT >6 via when/otherwise): streaming_etl.py:131-133
  *  - balance gate: streaming_etl.py:134-136
  *  - per-modality limit gate (strict `<`, DOC = otherwise arm):
  *    streaming_etl.py:137-149
  *  - conjunction: streaming_etl.py:150-153
  *  - latency metrics (seconds math despite `_ms` name):
  *    streaming_etl.py:173-174
  *  - geodesic upgrade (dashboard geopy): containers/dashboard/dashboard.py:187-191
  */
object Scoring {

  /** t5 — euclidean distance in coordinate degrees (production form). */
  def euclideanDegrees(latT: Column, lonT: Column, latU: Column, lonU: Column): Column =
    sqrt(pow(latT - latU, 2) + pow(lonT - lonU, 2))

  /** Haversine great-circle distance in km — the dashboard's geodesic
    * upgrade, built natively from trig exprs (no UDF, codegen-friendly).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(6371.0) * lit(2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** t6 — high-value indicator: (value > threshold) as 0.0/1.0. */
  def thresholdScore(value: Column, threshold: Double = 2000.0): Column =
    (value > lit(threshold)).cast("double")

  /** t7 — hour-of-day score: (hour(ts) - 12) / 12.0 (production form). */
  def hourScore(ts: Column): Column = (hour(ts) - lit(12)) / lit(12.0)

  /** t7 dashboard variant: abs(hour - 12) / 12.0. */
  def hourScoreAbs(ts: Column): Column = abs(hour(ts) - lit(12)) / lit(12.0)

  /** score_medio, production (product) semantics: (t5*t6*t7)/3. */
  def scoreCombineProduct(t5: Column, t6: Column, t7: Column): Column =
    (t5 * t6 * t7) / lit(3.0)

  /** score_medio, dev (mean) semantics: (t5+t6+t7)/3. */
  def scoreCombineMean(t5: Column, t6: Column, t7: Column): Column =
    (t5 + t6 + t7) / lit(3.0)

  /** score gate: approve unless score_medio > 6. */
  def scoreGate(scoreMedio: Column, cutoff: Double = 6.0): Column =
    !(scoreMedio > lit(cutoff))

  /** balance gate: payer balance strictly greater than the amount. */
  def balanceGate(saldo: Column, value: Column): Column = saldo > value

  /** Per-modality limit gate: dispatch on the modality column to the
    * matching limit, strict `<` (production), last modality = otherwise
    * arm, mirroring streaming_etl.py:137-149.
    */
  def limitGate(modality: Column, value: Column, limits: Seq[(String, Column)]): Column = {
    require(limits.nonEmpty)
    val armed = limits.init.foldLeft(Option.empty[Column]) { case (acc, (name, lim)) =>
      val arm = value < lim
      Some(acc.fold(when(modality === lit(name), arm))(_.when(modality === lit(name), arm)))
    }
    armed.fold(value < limits.last._2)(_.otherwise(value < limits.last._2))
  }

  /** transacao_aprovada = score AND balance AND limit. */
  def approved(scoreOk: Column, balanceOk: Column, limitOk: Column): Column =
    scoreOk && balanceOk && limitOk

  /** Latency in (mis-named) seconds, reference parity:
    * unix_timestamp(end) - unix_timestamp(start).
    */
  def latencySecondsAsMs(end: Column, start: Column): Column =
    unix_timestamp(end) - unix_timestamp(start)

  /** True-millisecond latency (the parity-mode fix). */
  def latencyTrueMs(end: Column, start: Column): Column =
    ((end.cast("double") - start.cast("double")) * 1000).cast("long")

  /** P18 z-score ingredients are window exprs; see analytics.Windows. */

  /** P19 3-way frequency score: <=3 -> 0.0, 4..10 -> 0.5, >10 -> 1.0. */
  def frequencyScore(freq: Column): Column =
    when(freq <= 3, 0.0).when(freq <= 10, 0.5).otherwise(1.0)
}
