package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: print formatted physical plans for selected queries so
  * join strategies / pushdown / codegen spans can be reviewed.
  * Usage: runMain graft.tools.PlanCheck <sfDir> [queryName...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("pipeline_score", "j2_star_join_agg", "a6_rate_by_region",
        "dedup_ngram_jaccard", "ann_bruteforce_topk")
    val spark = graft.jobs.Jobs.localBuilder("graft-plancheck", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
