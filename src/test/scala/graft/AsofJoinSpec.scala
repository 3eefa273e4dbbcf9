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

  test("left rows with NULL timestamp never match, either direction") {
    val left = Seq((1L, None: Option[Timestamp], "nul"), (1L, Some(ts(20)), "ok"))
      .toDF("k", "t", "v")
    val right = Seq((1L, ts(10), 100), (1L, ts(30), 300)).toDF("k", "t", "x")
    for (dir <- Seq("backward", "forward")) {
      val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("x"), direction = dir)
        .select("v", "asof_x").as[(String, Option[Int])].collect().toMap
      assert(got("nul").isEmpty, s"null left ts must not match ($dir)")
      assert(got("ok") == Some(if (dir == "backward") 100 else 300))
    }
  }

  test("left rows with no key on the right side get null") {
    val left = Seq((7L, ts(1), "z")).toDF("k", "t", "v")
    val right = Seq((8L, ts(0), 5)).toDF("k", "t", "x")
    val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("x")).collect()
    assert(got.length == 1 && got(0).isNullAt(3))
  }

  test("forward direction picks the earliest at-or-after row") {
    val left = Seq((1L, ts(10), "p"), (1L, ts(50), "q")).toDF("k", "t", "v")
    val right = Seq((1L, ts(5), 100), (1L, ts(10), 200), (1L, ts(30), 300))
      .toDF("k", "t", "x")
    val got = AsofJoin
      .asofJoin(left, right, "k", "t", Seq("x"), direction = "forward")
      .select("v", "asof_x").as[(String, Option[Int])].collect().toMap
    // at-or-after is inclusive: t=10 matches the t=10 right row;
    // t=50 has nothing after it
    assert(got == Map("p" -> Some(200), "q" -> None))
  }

  test("tolerance nulls matches beyond the staleness bound") {
    val left = Seq((1L, ts(100), "near"), (1L, ts(500), "far"))
      .toDF("k", "t", "v")
    val right = Seq((1L, ts(90), 7)).toDF("k", "t", "x")
    val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("x"),
      toleranceUs = Some(15L * 60L * 1000000L)) // 15 min
      .select("v", "asof_x").as[(String, Option[Int])].collect().toMap
    // 10 min stale -> kept; 410 min stale -> nulled by the tolerance
    assert(got == Map("near" -> Some(7), "far" -> None))
  }
}
