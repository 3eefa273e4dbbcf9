package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** snapshotDiff semantics: op classification, null-safe change
  * detection, the changed-column list, and unchanged-row elision.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, Some("a"), Some(10)),  // unchanged -> dropped
    (2L, Some("b"), Some(20)),  // value change -> update [x]
    (3L, None: Option[String], Some(30)), // null -> value: update [s]
    (4L, Some("d"), Some(40)),  // value -> null: update [x]
    (5L, Some("e"), Some(50))   // only in old -> delete
  ).toDF("id", "s", "x")

  private val newSnap = Seq(
    (1L, Some("a"), Some(10)),
    (2L, Some("b"), Some(21)),
    (3L, Some("c"), Some(30)),
    (4L, Some("d"), None: Option[Int]),
    (6L, Some("f"), Some(60))   // only in new -> insert
  ).toDF("id", "s", "x")

  test("op classification, changed lists, unchanged rows dropped") {
    val got = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id"))
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (2L, "update", "x"),
      (3L, "update", "s"),
      (4L, "update", "x"),
      (5L, "delete", "s,x"),
      (6L, "insert", "s,x")))
  }

  test("old/new value columns carry both sides; absent side is null") {
    val byId = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val upd = byId(2L)
    assert(upd.getAs[Int]("old_x") == 20 && upd.getAs[Int]("new_x") == 21)
    assert(upd.getAs[String]("old_s") == "b" && upd.getAs[String]("new_s") == "b")
    val del = byId(5L)
    assert(del.getAs[String]("old_s") == "e" && del.isNullAt(del.fieldIndex("new_s")))
    val ins = byId(6L)
    assert(ins.isNullAt(ins.fieldIndex("old_x")) && ins.getAs[Int]("new_x") == 60)
  }

  test("composite keys join correctly") {
    val a = Seq(("x", 1, 10), ("x", 2, 20)).toDF("k1", "k2", "v")
    val b = Seq(("x", 1, 11), ("y", 2, 20)).toDF("k1", "k2", "v")
    val got = Cdc.snapshotDiff(a, b, Seq("k1", "k2"))
      .select(col("k1"), col("k2"), col("op")).as[(String, Int, String)]
      .collect().toSet
    assert(got == Set(("x", 1, "update"), ("x", 2, "delete"), ("y", 2, "insert")))
  }

  test("diff replayed onto the old snapshot reproduces the new one") {
    val d = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id")).cache()
    val upserts = d.filter(col("op") =!= "delete")
      .select(col("id"), col("new_s").as("s"), col("new_x").as("x"))
    val replayed = oldSnap
      // remove deleted and updated keys, then apply the new-side rows
      .join(d.select(col("id")), Seq("id"), "left_anti")
      .unionByName(upserts)
    val want = newSnap.as[(Long, Option[String], Option[Int])].collect().toSet
    val got = replayed.as[(Long, Option[String], Option[Int])].collect().toSet
    assert(got == want)
  }
}
