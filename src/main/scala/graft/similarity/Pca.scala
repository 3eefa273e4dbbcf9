package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction step of a training-data pipeline
  * (visualization, whitening, cheap pre-filtering before ANN).
  *
  * Scale shape: [[fit]] is ONE distributed pass — each partition
  * accumulates (n, Σv, upper-triangular Σvvᵀ) imperatively (BLAS-style
  * per-partition accumulation is the genuine mapPartitions case), and
  * only `numPartitions × d(d+3)/2` doubles reach the driver, at any
  * corpus size. The d×d eigenproblem is driver-side (d = embedding
  * dim, tiny) via cyclic Jacobi — dependency-free and deterministic.
  * [[project]] is map-only: mean-centering folds into the dot product
  * (⟨v−μ, c⟩ = ⟨v,c⟩ − ⟨μ,c⟩, the second term a precomputed scalar),
  * so each output component is one codegen'd dot minus a constant.
  */
object Pca {

  /** @param mean       per-dimension mean of the fitted corpus
    * @param components top-k principal axes (unit, deterministic sign:
    *                   the max-|entry| coordinate is positive)
    * @param varianceExplained fraction of total variance per component
    * @param totalVariance trace of the covariance (sum of all
    *                   eigenvalues) — lets callers state reconstruction
    *                   error in absolute terms: the mean squared error
    *                   of the rank-k projection is
    *                   `totalVariance * (1 - sum(varianceExplained))`
    */
  case class Model(mean: Array[Double], components: Seq[Array[Double]],
                   varianceExplained: Seq[Double], totalVariance: Double)

  def fit(df: DataFrame, vec: String, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(vec).cast("array<double>")).as[Array[Double]]
      .mapPartitions { it =>
        var n = 0L
        var s: Array[Double] = null
        var g: Array[Double] = null
        it.foreach { v =>
          val d = v.length
          if (s == null) { s = new Array[Double](d); g = new Array[Double](d * (d + 1) / 2) }
          n += 1
          var i = 0; var idx = 0
          while (i < d) {
            s(i) += v(i)
            var j = i
            while (j < d) { g(idx) += v(i) * v(j); j += 1; idx += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((n, s, g))
      }.collect()
    require(parts.nonEmpty, "PCA fit on an empty corpus")
    val d = parts.head._2.length
    val n = parts.map(_._1).sum.toDouble
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    parts.foreach { case (_, s, g) =>
      var i = 0
      while (i < d) { sum(i) += s(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += g(i); i += 1 }
    }
    val mean = sum.map(_ / n)
    // covariance C = E[vvᵀ] − μμᵀ (population; the scaling cancels in
    // both the eigenvectors and the explained-variance ratios)
    val c = Array.ofDim[Double](d, d)
    var i = 0; var idx = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = gram(idx) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1; idx += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEig(c)
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i)).take(k)
    val total = math.max(eigVals.map(math.max(_, 0.0)).sum, Double.MinPositiveValue)
    val comps = order.map { oi =>
      val v = Array.tabulate(d)(r => eigVecs(r)(oi))
      // deterministic sign: the largest-|coordinate| entry is positive
      val m = v.indices.maxBy(ii => (math.abs(v(ii)), -ii))
      if (v(m) < 0) v.map(-_) else v
    }
    Model(mean, comps, order.map(oi => eigVals(oi) / total), total)
  }

  /** Append `pc1..pck` projection columns (map-only, codegen'd dots). */
  def project(df: DataFrame, vec: String, model: Model): DataFrame = {
    val v = col(vec).cast("array<double>")
    val pcs: Seq[Column] = model.components.zipWithIndex.map { case (comp, j) =>
      val offset = comp.zip(model.mean).map { case (ci, mi) => ci * mi }.sum
      (Ann.dot(v, lit(comp)) - lit(offset)).as(s"pc${j + 1}")
    }
    df.select(col("*") +: pcs: _*)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-columns). O(d³) per sweep, converges
    * quadratically; deterministic rotation order.
    */
  private[graft] def jacobiEig(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((r, cIdx) => if (r == cIdx) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0; var p = 0
      while (p < d) { var q = p + 1; while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && offDiag() > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val sth = t * cth
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = cth * arp - sth * arq
              a(r)(q) = sth * arp + cth * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = cth * apr - sth * aqr
              a(q)(r) = sth * apr + cth * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = cth * vrp - sth * vrq
              v(r)(q) = sth * vrp + cth * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
