package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: phase-level wall breakdown of the hybrid-RRF queries
  * (the round-10 worst tier) — index builds vs legs vs fusion.
  * Usage: runMain graft.tools.ProfHybrid <sfDir> [reps]
  */
object ProfHybrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.jobs.Jobs.localBuilder("graft-profhybrid", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("pipeline_score")(spark, dir).count() // warm
    val s = spark
    import graft.text.{Bm25, HybridQueries, Retrieval}
    val Split = HybridQueries.Split
    val HK = HybridQueries.HK
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val base = s"/tmp/graft_profhybrid"
      t("bm25.indexBuild") {
        Bm25.indexBuild(docs.filter(col("doc_id") >= Split),
          "doc_id", "text", s"$base/bm")
      }
      t("ann.ivfIndexBuild") {
        graft.similarity.Ann.ivfIndexBuild(
          emb.filter(col("vec_id") >= Split), "vec_id", "embedding",
          HybridQueries.IvfCells, s"$base/ivf")
      }
      val lex = t("mlt.plan") {
        Bm25.moreLikeThisFromIndex(s,
            docs.filter(col("doc_id") < Split), "doc_id", "text",
            s"$base/bm", HK, localizeProbe = true)
          .select(col("qid"), col("doc_id").as("doc"), col("rank"))
      }
      t("mlt.count")(lex.count())
      val vecIvf = t("ivfprobe.plan") {
        graft.similarity.Ann.ivfTopKFromIndex(
            emb.filter(col("vec_id") < Split), "vec_id", "embedding",
            s"$base/ivf", HK, HybridQueries.IvfProbe, pruneCells = true)
          .select(col("qid"), col("vid").as("doc"), col("rank"))
      }
      t("ivfprobe.count")(vecIvf.count())
      val vecBrute = t("brute.plan") {
        graft.similarity.Ann.bruteForceTopK(
            emb.filter(col("vec_id") < Split),
            emb.filter(col("vec_id") >= Split), "vec_id", "embedding", HK)
          .select(col("qid"), col("vid").as("doc"), col("rank"))
      }
      t("brute.count")(vecBrute.count())
      t("fuse_ivf.count")(Retrieval.rrfFuse(lex, vecIvf, HK).count())
      t("fuse_brute.count")(Retrieval.rrfFuse(lex, vecBrute, HK).count())
    }
    spark.stop()
  }
}
