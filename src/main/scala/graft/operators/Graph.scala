package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over an edge list, Spark-first: each
  * round is one join + one keyed aggregation, lineage truncated with
  * localCheckpoint so plans stay flat (the same pattern as
  * [[graft.dedup.Dedup.connectedComponents]]). State per round is one
  * (node, value) table — shuffle keyed by node id, linear in edges.
  */
object Graph {

  /** Undirected PageRank with a fixed iteration count (deterministic,
    * so a SQL oracle can replay it with unrolled CTEs). Only the node
    * COUNT reaches the driver — inherent to the uniform teleport term,
    * same as k-means centroid materialization.
    *
    * FP parity note: the teleport term is computed as column
    * arithmetic `(1 − damping) / n`, NOT pre-folded in Scala, so both
    * engines evaluate the identical IEEE expression tree ((1 − 0.85)
    * in binary is not the same double as the literal 0.15).
    */
  def pageRank(edges: DataFrame, src: String, dst: String, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val und = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct().localCheckpoint(true)
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val nodes = und.select(col("u")).distinct().localCheckpoint(true)
    val n = nodes.count()
    val teleport = (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var ranks = nodes.withColumn("rank", lit(1.0) / lit(n.toDouble))
    for (i <- 1 to iters) {
      val contrib = und.join(ranks, Seq("u")).join(deg, Seq("u"))
        .select(col("v").as("u"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("u")).agg(sum(col("c")).as("inr"))
      ranks = nodes.join(contrib, Seq("u"), "left")
        .select(col("u"),
          (teleport + lit(damping) * coalesce(col("inr"), lit(0.0)))
            .as("rank"))
      // checkpoint only every few rounds: each eager checkpoint is a
      // full job, and a handful of join/agg layers is a perfectly
      // plannable lineage — deep-iteration runs still get truncated
      if (i % 4 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("u").as("node"), round(col("rank"), 8).as("rank"))
  }
}
