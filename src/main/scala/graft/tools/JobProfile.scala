package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only: run one driver-contract query and log every Spark job's
  * wall time + call site, to see where a multi-job operator (the
  * streaming maintenance loops especially) actually spends its time.
  * Usage: runMain graft.tools.JobProfile <sfDir> <query>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("s30_stream_keeper_maintenance")
    val spark = graft.jobs.Jobs.localBuilder("graft-profile", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dev-only A/B lever: GRAFT_NOAQE=1 runs the profiled query with
    // AQE off, to separate the job-count floor AQE's per-stage jobs
    // impose on micro-loop queries from the query's own actions
    if (sys.env.get("GRAFT_NOAQE").contains("1"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    graft.SparkEntry.queries("pipeline_score")(spark, dir).count() // warm
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobSec = new java.util.concurrent.atomic.DoubleAdder()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          val dt = (System.nanoTime() - t0) / 1e9
          nJobs.incrementAndGet(); jobSec.add(dt)
          if (dt > 0.02)
            println(f"[job] ${j.jobId}%4d  $dt%6.2f s  $site")
        }
      }
    })
    // the listener bus is async: drain before reading/resetting the
    // per-rep counters, or late job-end events undercount this rep
    // and bleed into the next (quiesce = no in-flight jobs AND the
    // counter stable across a settle window)
    // returns false when the deadline expired with events still in
    // flight — the rep's counts are then a LOWER BOUND, and the rep
    // line must say so (a silently truncated count is exactly the
    // undercount this drain exists to prevent)
    def quiesce(): Boolean = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline &&
        (!starts.isEmpty || nJobs.get() != last)) {
        last = nJobs.get()
        Thread.sleep(100)
      }
      starts.isEmpty && nJobs.get() == last
    }
    for (rep <- 1 to 2) {
      nJobs.set(0); jobSec.reset()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val drained = quiesce()
      val ge = if (drained) "" else ">="
      println(f"[total] rep $rep  $wall%.2f s" +
        f"  jobs=$ge${nJobs.get()}%d  jobSec=$ge${jobSec.sum()}%.2f")
    }
    spark.stop()
  }
}
