package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (proximity) and interval joins via fixed-width bucketing — the
  * two inequality-join shapes Spark would otherwise plan as a
  * broadcast-nested-loop (O(n·m) compares, single-node collapse at
  * scale).
  *
  * Both operators reduce the inequality predicate to an EQUI-join on a
  * cell id plus a residual filter, so Catalyst plans an ordinary
  * shuffled hash/sort-merge join keyed by cell: the shuffle carries
  * each row a bounded number of times (≤ 3 for [[bandPairs]], ≤
  * span/cellWidth + 1 for [[intervalJoin]]), work distributes across
  * the cluster by cell, and AQE/skew handling apply as with any
  * equi-join. This is the standard "bucketed band join" formulation
  * (cf. interval joins in Flink and range-join binning hints in other
  * engines), built from composition — no custom strategy needed.
  *
  * Positions are integral (e.g. `unix_micros` of a timestamp). Cells
  * are `pos div cellWidth`, so everything stays in exact long
  * arithmetic — no float boundary jitter.
  *
  * Skew note: cells inherit the data's time/value distribution. A
  * burst concentrated inside one epsilon-width cell skews that cell's
  * shuffle partition; AQE's skew-join split handles moderate cases,
  * and a caller can shrink cellWidth (more, smaller cells) since
  * correctness only needs `cellWidth >= epsilon` for [[bandPairs]].
  */
object BandJoin {

  /** All pairs (a, b) with `|pos_a - pos_b| <= epsilon` and
    * `id_a < id_b`, as `(id_a, id_b, pos_a, pos_b)`.
    *
    * Side A keeps its own cell; side B is exploded to its cell ± 1.
    * `cellWidth = epsilon` guarantees any qualifying pair lands in
    * adjacent-or-equal cells, and since A occupies exactly one cell
    * and B's three are distinct, each pair is emitted exactly once —
    * no post-join dedup.
    *
    * @param posCol integral column (cast to long); e.g.
    *               `unix_micros(ts)` precomputed by the caller.
    */
  def bandPairs(df: DataFrame, idCol: String, posCol: String,
                epsilon: Long): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(posCol).cast("long").as("__p"))
      .filter(col("__p").isNotNull)
    val cell = expr(s"__p div ${epsilon}L")
    val a = base.select(col("__id").as("id_a"), col("__p").as("pos_a"),
      cell.as("__cell"))
    val b = base.select(col("__id").as("id_b"), col("__p").as("pos_b"),
      explode(array(cell - 1, cell, cell + 1)).as("__cell"))
    a.join(b, Seq("__cell"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("pos_a") - col("pos_b")) <= epsilon)
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"))
  }

  /** Point-in-interval join: every (point, interval) pair with
    * `lo <= p <= hi` (inclusive ends). Output = point columns ++
    * interval columns (pre-select non-colliding names).
    *
    * Intervals explode to the cells they cover
    * (`sequence(lo div w, hi div w)` — exact long arithmetic); points
    * map to their single cell; the equi-join on cell meets each
    * qualifying pair exactly once, because a point has one cell and an
    * interval covers it iff the containment predicate can hold.
    *
    * Choose `cellWidth` ≈ the typical interval span: the interval side
    * of the shuffle is amplified by span/cellWidth + 1, the residual
    * filter does the rest. A pathologically long interval amplifies
    * its own row only (bounded blowup, never quadratic).
    */
  def intervalJoin(points: DataFrame, pCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   cellWidth: Long): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    for (c <- Seq("__cell", "__p", "__lo", "__hi")
         if points.columns.contains(c) || intervals.columns.contains(c))
      throw new IllegalArgumentException(
        s"intervalJoin reserves column name '$c'")
    val p = points
      .withColumn("__p", col(pCol).cast("long"))
      .filter(col("__p").isNotNull)
      .withColumn("__cell", expr(s"__p div ${cellWidth}L"))
    val iv = intervals
      .withColumn("__lo", col(loCol).cast("long"))
      .withColumn("__hi", col(hiCol).cast("long"))
      .filter(col("__lo").isNotNull && col("__hi").isNotNull &&
        col("__lo") <= col("__hi"))
      .withColumn("__cell",
        explode(expr(s"sequence(__lo div ${cellWidth}L, __hi div ${cellWidth}L)")))
    p.join(iv, Seq("__cell"))
      .filter(col("__p").between(col("__lo"), col("__hi")))
      .drop("__cell", "__p", "__lo", "__hi")
  }
}
