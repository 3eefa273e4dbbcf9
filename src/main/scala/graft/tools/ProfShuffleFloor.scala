package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: isolate the per-exchange cost of a tiny aggregate at
  * different reducer counts with AQE on/off — the mechanism behind the
  * r10 train-clone reducer pin. Usage: runMain graft.tools.ProfShuffleFloor
  */
object ProfShuffleFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.jobs.Jobs.localBuilder("graft-floor", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 200000).map(i => (i % 997, i.toLong)).toDF("k", "v")
      .localCheckpoint()
    def cpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => Double.NaN
      }
    for (aqe <- Seq("true", "false"); parts <- Seq(32, 4)) {
      val s = org.apache.spark.sql.GraftSqlBridge.cloneSession(spark)
      s.conf.set("spark.sql.adaptive.enabled", aqe)
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val d = org.apache.spark.sql.GraftSqlBridge.reRoot(s, df)
      // warm once
      d.groupBy("k").agg(sum("v")).orderBy(desc("sum(v)")).limit(5).collect()
      val reps = 10
      val c0 = cpuSec(); val t0 = System.nanoTime()
      for (_ <- 1 to reps)
        d.groupBy("k").agg(sum("v")).orderBy(desc("sum(v)")).limit(5).collect()
      val wall = (System.nanoTime() - t0) / 1e9 / reps
      val cpu = (cpuSec() - c0) / reps
      println(f"[floor] aqe=$aqe%-5s parts=$parts%2d  wall=$wall%6.3f s/op  cpu=$cpu%6.2f s/op")
    }
    spark.stop()
  }
}
