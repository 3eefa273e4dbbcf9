package graft

import java.sql.Timestamp
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("attaches latest right row at-or-before each left row per key") {
    val left = Seq((1L, ts(10), "a"), (1L, ts(20), "b"), (2L, ts(5), "c"))
      .toDF("k", "t", "v")
    val right = Seq((1L, ts(10), 100), (1L, ts(15), 150), (2L, ts(99), 999))
      .toDF("k", "t", "x")
    val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("x"))
      .collect().map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet
    assert(got == Set(
      (1L, "a", Some(100)), // inclusive: equal timestamp matches
      (1L, "b", Some(150)), // latest preceding, not first
      (2L, "c", None)))     // right row is in the future -> null
  }

  test("a NULL right payload wins over older rows; multi-cols stay row-consistent") {
    val left = Seq((1L, ts(30), "L")).toDF("k", "t", "v")
    val right = Seq(
      (1L, ts(10), Some(5), Some("old")),
      (1L, ts(20), None: Option[Int], Some("new"))) // a is null in newest row
      .toDF("k", "t", "a", "b")
    val r = AsofJoin.asofJoin(left, right, "k", "t", Seq("a", "b")).collect()(0)
    // DuckDB ASOF semantics: the t=20 row is the match — a=null, b="new";
    // never a=5 (older row) stitched with b="new"
    assert(r.isNullAt(3) && r.getString(4) == "new")
  }

  test("right rows with NULL timestamp never match (SQL ASOF parity)") {
    val left = Seq((1L, ts(10), "a")).toDF("k", "t", "v")
    val right = Seq((1L, None: Option[Timestamp], 5))
      .toDF("k", "t", "x")
    val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("x")).collect()
    assert(got.length == 1 && got(0).isNullAt(3))
  }

  test("left rows with no key on the right side get null") {
    val left = Seq((7L, ts(1), "z")).toDF("k", "t", "v")
    val right = Seq((8L, ts(0), 5)).toDF("k", "t", "x")
    val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("x")).collect()
    assert(got.length == 1 && got(0).isNullAt(3))
  }
}
