package graft

import org.apache.spark.sql.functions._
import graft.similarity.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("jacobi recovers a known symmetric eigensystem") {
    // eigenvalues of [[2,1],[1,2]] are 3 and 1, vectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-12)
    val top = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(top(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(top(0) - top(1)) < 1e-12, "top eigvec is (1,1)-direction")
  }

  test("fit: components are orthonormal, variance ordered and in (0,1]") {
    val model = Pca.fit(Tables.embeddings(spark, dir), "embedding", k = 3)
    val c = model.components
    assert(c.length == 3 && c.head.length == 64)
    for (i <- c.indices; j <- i until c.length) {
      val d = c(i).zip(c(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"<c$i,c$j> = $d")
    }
    assert(model.varianceExplained == model.varianceExplained.sorted.reverse)
    model.varianceExplained.foreach(v => assert(v > 0 && v <= 1))
    // deterministic sign convention: max-|coordinate| entry positive
    c.foreach { v => assert(v(v.indices.maxBy(i => (math.abs(v(i)), -i))) > 0) }
  }

  test("project: matches the driver-side centered dot product per row") {
    val emb = Tables.embeddings(spark, dir)
    val model = Pca.fit(emb, "embedding", k = 2)
    val got = Pca.project(emb, "embedding", model)
      .select(col("vec_id"), col("pc1"), col("pc2"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val raw = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    got.zip(raw).foreach { case ((idG, p1, p2), (idR, v)) =>
      assert(idG == idR)
      val centered = v.zip(model.mean).map { case (x, m) => x - m }
      val e1 = centered.zip(model.components(0)).map { case (a, b) => a * b }.sum
      val e2 = centered.zip(model.components(1)).map { case (a, b) => a * b }.sum
      assert(math.abs(p1 - e1) < 1e-8 && math.abs(p2 - e2) < 1e-8)
    }
  }

  test("top component maximizes captured variance vs any other axis") {
    val emb = Tables.embeddings(spark, dir)
    val model = Pca.fit(emb, "embedding", k = 1)
    val proj = Pca.project(emb, "embedding", model)
    // one pass: pc1 variance + every coordinate axis's variance
    val aggs = var_pop(col("pc1")) +:
      (0 until 64).map(i => var_pop(col("embedding").cast("array<double>")(i)))
    val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
    val vTop = row.getDouble(0)
    // projecting on ANY raw coordinate axis captures no more variance
    val perAxisMax = (1 to 64).map(row.getDouble).max
    assert(vTop >= perAxisMax - 1e-9,
      s"pc1 variance $vTop must dominate axis variance $perAxisMax")
  }
}
