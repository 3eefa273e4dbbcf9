package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def snaps(rows: (Int, Int, Int, String)*) =
    rows.toDF("k", "ts", "tb", "attr")

  test("fromSnapshots: change-detection + half-open validity intervals") {
    val hist = Scd2.fromSnapshots(
      snaps((1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"), (1, 40, 4, "a"),
        (2, 10, 5, "x")),
      "k", "ts", Seq("attr"), "tb")
      .select($"k", $"valid_from", $"valid_to", $"attr", $"is_current")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getString(3), r.getBoolean(4)))
      .toSet
    assert(hist == Set(
      (1, 10, Some(30), "a", false), // the ts=20 duplicate 'a' collapsed
      (1, 30, Some(40), "b", false),
      (1, 40, None, "a", true),      // re-transition to 'a' is a NEW version
      (2, 10, None, "x", true)))
  }

  test("fromSnapshots: null-safe change detection versions NULL transitions") {
    val df = Seq((1, 10, 1, Some("a")), (1, 20, 2, None), (1, 30, 3, None),
      (1, 40, 4, Some("a"))).toDF("k", "ts", "tb", "attr")
    val hist = Scd2.fromSnapshots(df, "k", "ts", Seq("attr"), "tb")
    assert(hist.count() == 3) // a → NULL (run collapsed) → a
  }

  test("fromSnapshots: a key whose first snapshot is all-NULL still versions") {
    val df = Seq((1, 10, 1, Option.empty[String]), (1, 20, 2, Some("a")),
      (2, 5, 3, Option.empty[String])).toDF("k", "ts", "tb", "attr")
    val hist = Scd2.fromSnapshots(df, "k", "ts", Seq("attr"), "tb")
      .select($"k", $"valid_from", $"valid_to", $"attr", $"is_current")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.getString(3)), r.getBoolean(4))).toSet
    assert(hist == Set(
      (1, 10, Some(20), None, false), // NULL initial version kept
      (1, 20, None, Some("a"), true),
      (2, 5, None, None, true)))      // all-NULL-forever key not dropped
  }

  test("applyUpdates: history-relative — a late row inside a collapsed run " +
    "extends from the late value (suppressed duplicates are gone)") {
    val hist0 = Scd2.fromSnapshots(
      snaps((1, 10, 1, "a"), (1, 20, 2, "a")), // duplicate a@20 collapses
      "k", "ts", Seq("attr"), "tb")
    val merged = Scd2.applyUpdates(hist0,
      snaps((1, 15, 9, "z")), "k", "ts", Seq("attr"), "tb")
    val rows = merged.select($"valid_from", $"valid_to", $"attr")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getString(2))).toSet
    // equals fromSnapshots(versionRows ∪ updates) = {a@10, z@15}; the
    // suppressed a@20 is not re-asserted — that is the documented
    // contract of merging into a compacted history
    assert(rows == Set((10, Some(15), "a"), (15, None, "z")))
  }

  test("applyUpdates: untouched keys pass through; touched keys rebuild") {
    val hist0 = Scd2.fromSnapshots(
      snaps((1, 10, 1, "a"), (1, 30, 2, "b"), (2, 10, 3, "x")),
      "k", "ts", Seq("attr"), "tb")
    val merged = Scd2.applyUpdates(hist0,
      snaps((1, 50, 9, "c")), "k", "ts", Seq("attr"), "tb")
    val k2 = merged.filter($"k" === 2).select($"attr", $"is_current")
      .as[(String, Boolean)].collect().toSet
    assert(k2 == Set(("x", true)), "key 2 untouched")
    val k1 = merged.filter($"k" === 1)
      .select($"valid_from", $"valid_to", $"attr", $"is_current")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getString(2)))
    assert(k1.toSet == Set((10, Some(30), "a"), (30, Some(50), "b"),
      (50, None, "c")), "old open row closed at the update's ts")
  }

  test("applyUpdates: late-arriving snapshot splits an existing interval") {
    val hist0 = Scd2.fromSnapshots(
      snaps((1, 10, 1, "a"), (1, 40, 2, "b")), "k", "ts", Seq("attr"), "tb")
    val merged = Scd2.applyUpdates(hist0,
      snaps((1, 25, 9, "z")), "k", "ts", Seq("attr"), "tb")
    val rows = merged.select($"valid_from", $"valid_to", $"attr")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getString(2))).toSet
    assert(rows == Set((10, Some(25), "a"), (25, Some(40), "z"),
      (40, None, "b")))
  }

  test("streaming CDC: foreachBatch merges each micro-batch into the history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Int, Int, Int, String)]
    // history survives across batches; localCheckpoint truncates the
    // lineage so N batches don't stack N merge plans
    var hist = Scd2.fromSnapshots(
      snaps((1, 10, 1, "a")), "k", "ts", Seq("attr"), "tb").localCheckpoint(true)
    val q = ms.toDF().toDF("k", "ts", "tb", "attr").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        hist = Scd2.applyUpdates(hist, batch, "k", "ts", Seq("attr"), "tb")
          .localCheckpoint(true)
      }.start()
    ms.addData((1, 30, 2, "b"), (2, 5, 3, "x"))
    q.processAllAvailable()
    ms.addData((1, 20, 4, "z")) // late: splits the [10, 30) interval
    q.processAllAvailable(); q.stop()
    val expected = Scd2.fromSnapshots(
      snaps((1, 10, 1, "a"), (1, 30, 2, "b"), (2, 5, 3, "x"), (1, 20, 4, "z")),
      "k", "ts", Seq("attr"), "tb")
    assert(hist.collect().toSet == expected.collect().toSet,
      "incremental streamed merges must equal the one-shot batch build")
  }

  test("applyUpdates is idempotent") {
    val hist0 = Scd2.fromSnapshots(
      snaps((1, 10, 1, "a"), (1, 30, 2, "b")), "k", "ts", Seq("attr"), "tb")
    val up = snaps((1, 50, 9, "c"), (2, 5, 8, "x"))
    val once = Scd2.applyUpdates(hist0, up, "k", "ts", Seq("attr"), "tb")
    val twice = Scd2.applyUpdates(once, up, "k", "ts", Seq("attr"), "tb")
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
