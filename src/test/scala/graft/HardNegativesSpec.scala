package graft

import org.apache.spark.sql.functions._
import graft.similarity.Ann

/** Hard-negative mining: positives excluded, mined ranks re-densified
  * after the filter, determinism, and the no-negatives edge.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // 2-D cosine geometry: similarity to the (1,0) anchor decreases
  // with index; labels interleave positives among the top candidates
  private val corpus = Seq(
    (0L, Seq(1.0f, 0.0f), 0),   // the anchor itself
    (1L, Seq(0.9f, 0.1f), 0),   // nearest — but a positive (label 0)
    (2L, Seq(0.8f, 0.2f), 1),   // hardest negative
    (3L, Seq(0.5f, 0.5f), 1),
    (4L, Seq(0.0f, 1.0f), 2),
    (5L, Seq(-1.0f, 0.1f), 2)
  ).toDF("vec_id", "embedding", "label")

  private def mine(k: Int, nNeg: Int) = Ann.hardNegatives(
    corpus.filter(col("vec_id") === 0), corpus, "vec_id", "embedding",
    labels = corpus.select(col("vec_id"), col("label")),
    labelCol = "label", k = k, nNeg = nNeg)

  test("positives are excluded and ranks re-densify after the filter") {
    val got = mine(k = 4, nNeg = 3).collect()
      .map(r => (r.getAs[Long]("vid"), r.getAs[Int]("neg_label"),
        r.getAs[Int]("neg_rank"))).sortBy(_._3)
    // top-4 candidates by cosine: 1 (pos), 2, 3, 4 → negatives 2, 3, 4
    // with CONTIGUOUS mined ranks (not the pre-filter 2, 3, 4)
    assert(got.toSeq == Seq((2L, 1, 1), (3L, 1, 2), (4L, 2, 3)))
  }

  test("nNeg caps the mined set at the hardest survivors") {
    val got = mine(k = 5, nNeg = 1).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("vid") == 2L)
    assert(got.head.getAs[Int]("neg_rank") == 1)
  }

  test("an anchor whose candidate pool is all-positive emits no rows") {
    // k=1: the only candidate is vec 1 — same label as the anchor
    assert(mine(k = 1, nNeg = 3).count() == 0)
  }

  test("the mine is deterministic") {
    val a = mine(k = 4, nNeg = 3).collect().map(_.toSeq).toSeq
    val b = mine(k = 4, nNeg = 3).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
