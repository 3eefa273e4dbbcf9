package graft

import org.apache.spark.sql.functions._
import graft.functions.Sampling

/** Weighted-sampling semantics: the split-multiplier hash equals the
  * direct Knuth product, the engine sample equals a plain-Scala A-ES
  * model, weight monotonicity, and the shuffle-free plan shape.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def modelKey(id: Long, w: Double): Double = {
    val u = ((id * 2654435761L) % 4294967296L + 1).toDouble / 4294967296.0
    math.log(u) / w
  }

  test("hashUniform: split-multiplier form equals the direct product") {
    val ids = (0L until 5000L) ++ Seq(3400000000L, 123456789012L)
    val got = ids.toDF("id").select(Sampling.hashUniform(col("id")))
      .as[Double].collect()
    ids.zip(got).foreach { case (id, u) =>
      // BigInt avoids the i64 overflow the engine expression exists to dodge
      val h = (BigInt(id) * 2654435761L).mod(BigInt(4294967296L)).toLong
      assert(u == (h + 1).toDouble / 4294967296.0, s"id $id")
      assert(u > 0.0 && u <= 1.0)
    }
  }

  test("weightedSample equals the plain-Scala A-ES model") {
    val rows = (1L to 3000L).map(i => (i, 1.0 + (i % 7).toDouble))
    val got = Sampling.weightedSample(
        rows.toDF("id", "w"), "id", "w", k = 50)
      .select(col("id")).as[Long].collect().toSet
    val want = rows.sortBy { case (id, w) => (-modelKey(id, w), id) }
      .take(50).map(_._1).toSet
    assert(got == want)
  }

  test("esKey is increasing in weight for a fixed id") {
    val ks = Seq((7L, 1.0), (7L, 10.0), (7L, 100.0)).toDF("id", "w")
      .select(Sampling.esKey(col("id"), col("w"))).as[Double].collect()
    assert(ks(0) < ks(1) && ks(1) < ks(2))
    assert(ks.forall(_ <= 0.0), "ln(u)/w is never positive")
  }

  test("heavier rows are sampled proportionally more often") {
    // ids alternate weight 1 / weight 9 -> a k=600 sample of 6000 rows
    // should pick heavy rows ~9x as often (A-ES inclusion odds)
    val rows = (1L to 6000L).map(i => (i, if (i % 2 == 0) 9.0 else 1.0))
    val sample = Sampling.weightedSample(
        rows.toDF("id", "w"), "id", "w", k = 600)
      .select(col("w")).as[Double].collect()
    val heavy = sample.count(_ == 9.0)
    assert(heavy > 450 && heavy < 600,
      s"expected heavy dominance near 9:1, got $heavy/600 heavy")
  }

  test("zero/negative/null weights are dropped, not fatal (ANSI-safe)") {
    val rows = Seq((1L, Some(5.0)), (2L, Some(0.0)), (3L, Some(-1.0)),
      (4L, None: Option[Double]), (5L, Some(2.0)))
    val got = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", 10)
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 5L),
      "only strictly-positive-weight rows are sampleable")
  }

  test("plan is TakeOrderedAndProject: no corpus shuffle, no global sort") {
    val df = Sampling.weightedSample(
      (1L to 100L).map(i => (i, 2.0)).toDF("id", "w"), "id", "w", k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
