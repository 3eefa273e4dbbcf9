package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** The two-phase bounded-heap per-key top-k must equal the window
  * row_number formulation exactly, including ties resolved by the
  * tiebreak column, nulls-last ordering, and keys with < k rows.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("equals window formulation on sf0.001 events (multi-partition)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"))
      .repartition(7)
    val got = TopK.topKPerKey(ev, Seq("event_type"),
      Seq("value" -> false, "event_id" -> true), k = 5)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val want = ev.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("keys with fewer than k rows, ties, and nulls-last") {
    val df = Seq(
      ("a", 1L, Some(3.0)), ("a", 2L, Some(3.0)), ("a", 3L, Some(1.0)),
      ("a", 4L, None), ("b", 5L, Some(9.0))
    ).toDF("k", "id", "v").repartition(3)
    val got = TopK.topKPerKey(df, Seq("k"),
      Seq("v" -> false, "id" -> true), k = 2)
      .select("k", "id", "rank").as[(String, Long, Int)].collect().toSet
    // ties on v=3.0 resolve by id asc; null v sorts last and falls out
    assert(got == Set(("a", 1L, 1), ("a", 2L, 2), ("b", 5L, 1)))
  }

  test("ascending order and string order columns work") {
    val df = Seq(("x", "bb"), ("x", "aa"), ("x", "cc"), ("y", "zz"))
      .toDF("k", "s")
    val got = TopK.topKPerKey(df, Seq("k"), Seq("s" -> true), k = 2)
      .select("k", "s", "rank").as[(String, String, Int)].collect().toSet
    assert(got == Set(("x", "aa", 1), ("x", "bb", 2), ("y", "zz", 1)))
  }
}
