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
}
