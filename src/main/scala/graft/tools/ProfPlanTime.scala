package graft.tools

/** Dev-only: split each driver-contract query's wall into Catalyst
  * phase time (parsing/analysis/optimization/planning, driver-side and
  * single-threaded) vs everything else, via QueryPlanningTracker — to
  * size the planning share of the per-query floor across the sweep.
  * Usage: runMain graft.tools.ProfPlanTime <sfDir> <q1,q2,...> [reps]
  */
object ProfPlanTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("tx_mlt_topk"))
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.jobs.Jobs.localBuilder("graft-plantime", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("pipeline_score")(spark, dir).count() // warm
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.count()
        val tExec = (System.nanoTime() - t1) / 1e9
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => k -> (v.endTimeMs - v.startTimeMs) / 1e3 }
        (tBuild, tExec, phases)
      }
      val (tb, te, ph) = times.minBy(x => x._1 + x._2)
      val phStr = ph.toSeq.sortBy(_._1)
        .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
      println(f"[plan] $n%-30s build=$tb%6.2f exec=$te%6.2f  $phStr")
    }
    spark.stop()
  }
}
