package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only: break the streaming-pipeline wall time into stream
  * machinery vs sink vs collect, via StreamingQueryProgress.
  * Usage: runMain graft.tools.ProfileStream <sfDir>
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.etl.{ScoringPipeline, TestdataAdapter}

    // warm
    graft.SparkEntry.queries("pipeline_score")(spark, dir).count()

    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val tx = TestdataAdapter.transactionsStream(spark, dir)
        .withWatermark("data_horario", "10 minutes")
      val scored = ScoringPipeline.score(
        ScoringPipeline.enrich(tx,
          TestdataAdapter.users(spark, dir), TestdataAdapter.regions(spark, dir)),
        TestdataAdapter.eventLimitArms)
      val t1 = System.nanoTime()
      val q = scored.writeStream.format("memory").queryName(s"ps_$round")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val t2 = System.nanoTime()
      val n = spark.table(s"ps_$round").collect().length
      val t3 = System.nanoTime()
      println(f"[pstream] round=$round rows=$n build=${(t1 - t0) / 1e9}%.2f stream=${(t2 - t1) / 1e9}%.2f collect=${(t3 - t2) / 1e9}%.2f")
      for (p <- q.recentProgress) {
        val d = p.durationMs
        println(s"[pstream]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")} " +
          s"latestOffset=${d.get("latestOffset")} queryPlanning=${d.get("queryPlanning")} " +
          s"walCommit=${d.get("walCommit")} commitOffsets=${d.get("commitOffsets")} " +
          s"total=${d.get("triggerExecution")}")
      }
    }
    spark.stop()
  }
}
