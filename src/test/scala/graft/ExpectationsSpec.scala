package graft

import org.apache.spark.sql.functions._
import graft.functions.Expectations.{Check, report}

/** Expectations report semantics and the one-scan plan guarantee. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0)), (2L, Some(-3.0)), (2L, None)).toDF("id", "v")

  test("failing and passing checks report correctly") {
    val n = count(lit(1)).cast("double")
    val got = report(df, Seq(
      Check("pk_unique", countDistinct(col("id")) / n, 1.0, 1.0),
      Check("v_nonnull", sum(col("v").isNotNull.cast("int")) / n, 1.0, 1.0),
      Check("v_min", min(col("v")), -10.0, 0.0),
      Check("rows_bounded", n, 1.0, 100.0)))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("pk_unique") == (0.666667, false))
    assert(got("v_nonnull") == (0.666667, false))
    assert(got("v_min") == (-3.0, true))
    assert(got("rows_bounded") == (3.0, true))
  }

  test("all checks ride one aggregate: a single scan, no join") {
    val r = report(df, Seq(
      Check("a", count(lit(1)).cast("double"), 0, 10),
      Check("b", min(col("v")), -10, 10),
      Check("c", countDistinct(col("id")).cast("double"), 0, 10)))
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join:\n$plan")
    // one scan of the input: the local relation appears exactly once
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) == 1, plan)
  }

  test("NULL metric fails closed, never passes as NULL") {
    val allNull = Seq((1L, None: Option[Double]), (2L, None))
      .toDF("id", "v")
    val got = report(allNull, Seq(
      Check("v_min", min(col("v")), -10.0, 10.0)))
      .as[(String, Option[Double], Boolean)].head()
    assert(got._2.isEmpty && !got._3,
      "min over all-null column must report pass = false, not null")
  }

  test("bad check definitions are rejected") {
    intercept[IllegalArgumentException] {
      report(df, Seq(Check("dup", count(lit(1)), 0, 1),
        Check("dup", min(col("v")), 0, 1)))
    }
    intercept[IllegalArgumentException] { Check("bad name!", lit(1), 0, 1) }
  }

  test("drift psi: identical slices stable, planted shift flagged, hand-check") {
    import graft.functions.Drift
    // ref: 100 values in bin 0, 100 in bin 1; cur shifts 80 of bin 0's
    // mass into bin 2. Hand PSI over [0,30) in 3 bins:
    //   p = (.5, .5, eps), q = (.1, .5, .4)
    //   psi = (.1-.5)ln(.1/.5) + 0 + (.4-eps)ln(.4/eps)
    val eps = 1e-4
    val expected = BigDecimal((0.1 - 0.5) * math.log(0.1 / 0.5) +
      (0.4 - eps) * math.log(0.4 / eps))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = ((1 to 100).map(_ => 5.0) ++ (1 to 100).map(_ => 15.0))
      .map(("a", _)).toDF("g", "v")
    val cur = ((1 to 20).map(_ => 5.0) ++ (1 to 100).map(_ => 15.0) ++
      (1 to 80).map(_ => 25.0)).map(("a", _)).toDF("g", "v")
    val drifted = Drift.psi(ref, cur, "g", "v", 0.0, 30.0, 3)
      .as[(String, Long, Long, Double, Boolean)].collect().toList
    assert(drifted == List(("a", 200L, 200L, expected, true)),
      s"planted drift: $drifted != psi $expected")
    // identical slices: psi is exactly 0 (every bin term is ln(1)=0)
    val same = Drift.psi(ref, ref, "g", "v", 0.0, 30.0, 3)
      .as[(String, Long, Long, Double, Boolean)].collect().toList
    assert(same == List(("a", 200L, 200L, 0.0, false)))
    // clamping: out-of-range values land in the edge bins, not a crash
    val wild = Seq(("a", -5.0), ("a", 999.0)).toDF("g", "v")
    assert(Drift.psi(wild, wild, "g", "v", 0.0, 30.0, 3).count() == 1)
  }
}
