package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: raw theta estimates for the cross-split gram overlap, to
  * pick honest error bounds for sk_decontam_overlap.
  * Usage: runMain graft.tools.ProbeSketch <sfDir> [n] [lgK]
  */
object ProbeSketch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(13)
    val lgK = args.lift(2).map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.TextHashing.register(spark)
    val g = Tables.documents(spark, dir).select(
      graft.functions.Binning.knuthBucket(col("doc_id")).as("b"),
      explode(graft.functions.TextHashing.ngramHashes(col("text"), n)).as("g"))
    val row = g.agg(
      expr(s"theta_sketch_agg(CASE WHEN b < 80 THEN g END, $lgK)").as("str"),
      expr(s"theta_sketch_agg(CASE WHEN b >= 90 THEN g END, $lgK)").as("ste"),
      countDistinct(when(col("b") < 80, col("g"))).as("n_train"),
      countDistinct(when(col("b") >= 90, col("g"))).as("n_test"))
    val ex = g.filter(col("b") < 80 || col("b") >= 90)
      .groupBy(col("g"))
      .agg(max(when(col("b") < 80, 1).otherwise(0)).as("tr"),
        max(when(col("b") >= 90, 1).otherwise(0)).as("te"))
      .agg(sum(col("tr") * col("te")).as("n_overlap"))
    val out = row.crossJoin(ex).select(
      col("n_train"), col("n_test"), col("n_overlap"),
      expr("theta_sketch_estimate(str)").as("est_train"),
      expr("theta_sketch_estimate(ste)").as("est_test"),
      expr("theta_sketch_estimate(theta_intersection(str, ste))")
        .as("est_overlap")).head()
    println(s"[probe] $out")
    spark.stop()
  }
}
