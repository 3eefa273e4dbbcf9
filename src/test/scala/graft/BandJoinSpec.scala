package graft

import org.apache.spark.sql.functions._
import graft.operators.BandJoin

/** The bucketed band/interval joins must equal the naive inequality
  * join exactly — boundary-inclusive, no duplicate pairs, no misses
  * across cell boundaries.
  */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bandPairs equals the naive |Δ|<=ε cross formulation, once each") {
    val df = Seq(
      (1L, 0L), (2L, 4L), (3L, 5L), (4L, 11L), (5L, 14L), (6L, 30L),
      (7L, 31L), (8L, 100L)
    ).toDF("id", "p").repartition(3)
    val got = BandJoin.bandPairs(df, "id", "p", epsilon = 5L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val want = df.as("a").join(df.as("b"),
        col("a.id") < col("b.id") &&
          abs(col("a.p") - col("b.p")) <= 5)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSeq
    // same multiset: exactly-once emission matters as much as coverage
    assert(got.sorted == want.sorted)
    // boundary |Δ| == ε is included (ids 1-3: Δ=5 and Δ=4,1)
    assert(got.contains((1L, 3L)))
  }

  test("bandPairs on events equals naive join at sf0.001") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val eps = 60L * 1000000L
    val got = BandJoin.bandPairs(ev, "event_id", "us", eps)
    val want = ev.as("a").join(ev.as("b"),
        col("a.event_id") < col("b.event_id") &&
          abs(col("a.us") - col("b.us")) <= eps)
      .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"),
        col("a.us").as("pos_a"), col("b.us").as("pos_b"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("intervalJoin: inclusive ends, multi-cell intervals, exact once") {
    val pts = Seq((1L, 0L), (2L, 10L), (3L, 20L), (4L, 25L), (5L, 39L))
      .toDF("pid", "p").repartition(2)
    // interval C spans many cells; D is degenerate (lo == hi)
    val ivs = Seq(("A", 0L, 10L), ("B", 11L, 19L), ("C", 0L, 39L),
      ("D", 25L, 25L)).toDF("iid", "lo", "hi").repartition(2)
    val got = BandJoin.intervalJoin(pts, "p", ivs, "lo", "hi", cellWidth = 7L)
      .select("pid", "iid").as[(Long, String)].collect().toSeq.sorted
    val want = pts.join(ivs, col("p").between(col("lo"), col("hi")))
      .select("pid", "iid").as[(Long, String)].collect().toSeq.sorted
    assert(got == want)
    assert(got.contains((1L, "A")) && got.contains((2L, "A"))) // both ends
    assert(got.contains((4L, "D")))                            // degenerate
    assert(got.count(_ == (5L, "C")) == 1)                     // exactly once
  }

  test("null positions and inverted intervals drop cleanly") {
    val pts = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "p")
    val ivs = Seq(("A", Some(0L), Some(10L)), ("B", Some(9L), Some(1L)),
      ("C", None, Some(10L))).toDF("iid", "lo", "hi")
    val got = BandJoin.intervalJoin(pts, "p", ivs, "lo", "hi", 4L)
      .select("pid", "iid").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "A")))
  }
}
