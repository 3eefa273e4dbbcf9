package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Sym-delete join semantics: the deletion-neighborhood blocking is
  * lossless for edit distance ≤ 1 and finds nothing beyond it.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants: self + each deletion, dupes collapsed") {
    val got = Seq("abc", "aab", "x", "")
      .toDF("s").select(FuzzyJoin.deletionVariants(col("s")))
      .as[Seq[String]].collect()
    assert(got(0).toSet == Set("abc", "bc", "ac", "ab"))
    assert(got(1).toSet == Set("aab", "ab", "aa"), "dup deletions collapse")
    assert(got(2).toSet == Set("x", ""))
    assert(got(3).toSet == Set(""))
  }

  test("matches exactly the ED<=1 pairs: sub/ins/del yes, ED2 no") {
    val a = Seq((1L, "kitten"), (2L, "hello"), (3L, "abc"))
      .toDF("id", "s")
    val b = Seq(
      (10L, "kitten"),   // equal -> dist 0
      (11L, "kitte"),    // deletion -> 1
      (12L, "kittens"),  // insertion -> 1
      (13L, "mitten"),   // substitution -> 1
      (14L, "mittens"),  // sub+ins -> 2: excluded
      (15L, "bac"),      // transposition = ED 2: excluded
      (16L, "hallo")     // substitution -> 1
    ).toDF("id", "s")
    val got = FuzzyJoin.symDeleteJoin(a, "id", "s", b, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 10L, 0), (1L, 11L, 1), (1L, 12L, 1), (1L, 13L, 1),
      (2L, 16L, 1)))
  }

  test("plan: one equi-join on the variant key, no cartesian product") {
    val a = Seq((1L, "ab")).toDF("id", "s")
    val df = FuzzyJoin.symDeleteJoin(a, "id", "s", a, "id", "s")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
