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

  test("left rows with no key on the right side get null") {
    val left = Seq((7L, ts(1), "z")).toDF("k", "t", "v")
    val right = Seq((8L, ts(0), 5)).toDF("k", "t", "x")
    val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("x")).collect()
    assert(got.length == 1 && got(0).isNullAt(3))
  }
}
