package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only: like [[JobProfile]] but attributes every Spark job to its
  * first stage's NAME (the RDD call site Spark embeds there), plus task
  * counts — JobProfile's property-based call-site lookup comes back
  * empty for SQL-execution jobs, which made multi-job operators
  * unattributable. Usage: runMain graft.tools.ProfJobs <sfDir> <query> [reps]
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("tx_hybrid_rrf_ivf")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.jobs.Jobs.localBuilder("graft-profjobs", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("pipeline_score")(spark, dir).count() // warm
    case class J(t0: Long, desc: String, nTasks: Int, nStages: Int)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val stage = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val tasks = j.stageInfos.map(_.numTasks).sum
        starts.put(j.jobId,
          J(System.nanoTime(), stage.take(120), tasks, j.stageInfos.size))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { s =>
          val dt = (System.nanoTime() - s.t0) / 1e9
          println(f"[job] ${j.jobId}%4d ${dt}%7.3f s stages=${s.nStages}%2d " +
            f"tasks=${s.nTasks}%4d  ${s.desc}")
        }
      }
    })
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[total] rep $rep  $wall%.2f s")
    }
    spark.stop()
  }
}
