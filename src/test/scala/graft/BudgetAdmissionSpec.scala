package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingJob
import graft.streaming.StreamingJob.BudgetDoc

/** s20: streaming per-source token-budget admission — cross-batch state
  * carry, prefix-while semantics, batch-slicing invariance.
  */
class BudgetAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private def admitted(batches: Seq[Seq[BudgetDoc]], budget: Long): Set[Long] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[BudgetDoc]
    val name = s"budget_${System.nanoTime()}"
    val query = StreamingJob.streamTokenBudgetAdmission(ms.toDS(), budget)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => ms.addData(b: _*); query.processAllAvailable() }
    query.stop()
    spark.table(name).as[BudgetDoc].collect().map(_.doc_id).toSet
  }

  test("budget admission: prefix-while per source, state carried across batches") {
    val docs = Seq(
      BudgetDoc("a", 1, 40), BudgetDoc("a", 2, 40), BudgetDoc("a", 3, 40),
      BudgetDoc("b", 4, 10), BudgetDoc("b", 5, 200), BudgetDoc("b", 6, 1))
    // budget 100: source a admits docs 1,2 (cum 40,80; doc3 → 120 over);
    // source b admits 4 only — doc5 overflows, doc6 stays rejected
    // (prefix-while: cum keeps advancing after the overflow)
    val expected = Set(1L, 2L, 4L)
    assert(admitted(Seq(docs), 100) == expected)
    // same docs sliced into three micro-batches → same admitted set
    assert(admitted(Seq(docs.take(2), docs.slice(2, 4), docs.drop(4)), 100)
      == expected)
  }

  test("streaming shard pack: placements carry across batches and equal one batch") {
    import graft.streaming.StreamingJob.{ShardDoc, ShardPlaced}
    def run(batches: Seq[Seq[ShardDoc]]): Set[ShardPlaced] = {
      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[ShardDoc]
      val name = s"pack_${System.nanoTime()}"
      val query = StreamingJob.streamShardPack(ms.toDS(), seqLen = 10L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => ms.addData(b: _*); query.processAllAvailable() }
      query.stop()
      spark.table(name).as[ShardPlaced].collect().toSet
    }
    val docs = Seq(
      ShardDoc(0, 1, 6), ShardDoc(0, 2, 6), ShardDoc(1, 3, 4),
      ShardDoc(0, 4, 9), ShardDoc(1, 5, 30))
    val once = run(Seq(docs))
    // shard 0: offsets 0,6,12 — doc 2 straddles seq 0/1 (tokens 6..11)
    assert(once.contains(ShardPlaced(1, 0, 6, 0, 0, 0, crosses = false)))
    assert(once.contains(ShardPlaced(2, 0, 6, 6, 0, 1, crosses = true)))
    assert(once.contains(ShardPlaced(4, 0, 9, 12, 1, 2, crosses = true)))
    // shard 1: doc 5 spans seqs 0..3 (tokens 4..33)
    assert(once.contains(ShardPlaced(5, 1, 30, 4, 0, 3, crosses = true)))
    // sliced into three micro-batches: identical placements
    assert(run(Seq(docs.take(1), docs.slice(1, 3), docs.drop(3))) == once)
  }

  test("budget admission: within-batch iterator order normalized to doc_id") {
    // arrivals out of doc_id order within one batch; doc_id order decides
    val docs = Seq(
      BudgetDoc("a", 9, 60), BudgetDoc("a", 1, 60), BudgetDoc("a", 5, 60))
    // order 1,5,9: cum 60,120,180 → budget 130 admits 1 and 5, not 9
    assert(admitted(Seq(docs), 130) == Set(1L, 5L))
  }
}
