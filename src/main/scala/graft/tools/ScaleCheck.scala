package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.{ScoringPipeline, TestdataAdapter}

/** Dev-only scale stress: replicate the sf0.1 event stream `factor`×
  * (explode over a sequence, then re-key ids so join keys keep their
  * original distribution) and measure scoring-pipeline throughput.
  * Validates that the map-only plan scales linearly with rows before
  * anyone trusts the 100 TB story.
  * Usage: runMain graft.tools.ScaleCheck <sfDir> <factor>
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tx = TestdataAdapter.transactions(spark, dir)
      .withColumn("rep", explode(sequence(lit(1), lit(factor))))
      .withColumn("id_transacao",
        concat(col("id_transacao"), lit("_"), col("rep")))
      .drop("rep")
      .repartition(32) // spread the exploded rows like a real multi-file scan
    val users = TestdataAdapter.users(spark, dir)
    val regions = TestdataAdapter.regions(spark, dir)

    // warmup
    ScoringPipeline.runDeterministic(
      TestdataAdapter.transactions(spark, dir), users, regions,
      TestdataAdapter.eventLimitArms).count()

    val t0 = System.nanoTime()
    val n = ScoringPipeline.runDeterministic(tx, users, regions,
      TestdataAdapter.eventLimitArms).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[scale] batch  rows=$n%,d secs=$secs%.2f rate=${n / secs}%,.0f rows/s")

    // streaming micro-batch throughput (directly comparable to the
    // reference's ~1,000 tx/s steady / peak catch-up baseline)
    val t1 = System.nanoTime()
    val streamed = graft.streaming.StreamingJob.runToMemory(
      ScoringPipeline.score(ScoringPipeline.enrich(
        TestdataAdapter.transactionsStream(spark, dir), users, regions),
        TestdataAdapter.eventLimitArms))
    val sn = streamed.count()
    val ssecs = (System.nanoTime() - t1) / 1e9
    println(f"[scale] stream rows=$sn%,d secs=$ssecs%.2f rate=${sn / ssecs}%,.0f rows/s")
    spark.stop()
  }
}
