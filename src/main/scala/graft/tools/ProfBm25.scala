package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: fine-grained wall breakdown of the BM25 index build and
  * the more-like-this probe (the shared kernel of the round-10 worst
  * tier: tx_hybrid_rrf*, tx_mlt_topk, tx_bm25_persisted, s22/s24).
  * Usage: runMain graft.tools.ProfBm25 <sfDir> [reps]
  */
object ProfBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.jobs.Jobs.localBuilder("graft-profbm25", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("pipeline_score")(spark, dir).count() // warm
    val s = spark
    import graft.text.{Bm25, Text}
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val Split = 100
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") >= Split)
      val base = "/tmp/graft_profbm25"
      t("tokenize.count") {
        corpus.select(explode(Text.tokens(lower(col("text")))).as("t"))
          .selectExpr("count(t)").collect()
      }
      t("postings.noop") {
        Bm25.postings(corpus, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      t("indexBuild.full") {
        Bm25.indexBuild(corpus, "doc_id", "text", s"$base/bm")
      }
      val queries = docs.filter(col("doc_id") < Split)
      val qTermsPlan = queries.select(col("doc_id").as("qid"),
        explode(array_distinct(Text.tokens(lower(col("text"))))).as("term"))
      t("qterms.collect")(qTermsPlan.collect())
      val stats = t("stats.read")(Bm25.readStats(s, s"$base/bm"))
      val mlt = t("mlt.plan") {
        Bm25.moreLikeThisFromIndex(s, queries, "doc_id", "text",
          s"$base/bm", 5, stats = Some(stats), localizeProbe = true)
      }
      t("mlt.count")(mlt.count())
      t("mlt.count2")(mlt.count())
      // decomposition of the probe's internals
      val pruned = s.read.parquet(s"$base/bm/postings")
      t("postings.read.count")(pruned.count())
      val nParts = pruned.rdd.getNumPartitions
      println(s"[info] postings scan partitions = $nParts")
      val qT = qTermsPlan
      val fan = pruned.join(broadcast(qT), "term")
      t("fanout.count")(fan.count())
      t("fanout.agg.count") {
        fan.groupBy(col("qid"), col("doc_id"))
          .agg(count(lit(1)).as("n")).count()
      }
      val rep32 = pruned.repartition(64)
      t("fanout.agg.rep.count") {
        rep32.join(broadcast(qT), "term")
          .groupBy(col("qid"), col("doc_id"))
          .agg(count(lit(1)).as("n")).count()
      }
    }
    spark.stop()
  }
}
