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

  test("budget admission: within-batch iterator order normalized to doc_id") {
    // arrivals out of doc_id order within one batch; doc_id order decides
    val docs = Seq(
      BudgetDoc("a", 9, 60), BudgetDoc("a", 1, 60), BudgetDoc("a", 5, 60))
    // order 1,5,9: cum 60,120,180 → budget 130 admits 1 and 5, not 9
    assert(admitted(Seq(docs), 130) == Set(1L, 5L))
  }
}
