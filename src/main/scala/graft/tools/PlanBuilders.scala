package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool: print formatted plans for the EAGER BUILDER subtrees the
  * round-10 optimizations touched — these run inside the query fns
  * before the returned frame exists, so the registered queries'
  * explain() never shows them. Usage: runMain graft.tools.PlanBuilders <sfDir>
  */
object PlanBuilders {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.jobs.Jobs.localBuilder("graft-planbuilders", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)

    // the r9 formulations, reconstructed verbatim (the differential
    // specs pin them), so one binary emits the before/after plan pair
    println("\n=================== bm25_postings_build_BEFORE ===================")
    docs.select(col("doc_id"),
        graft.text.Text.tokens(lower(col("text"))).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf")).explain("formatted")

    println("\n=================== bm25_postings_build ===================")
    graft.text.Bm25.postings(docs, "doc_id", "text").explain("formatted")

    graft.functions.BpeMerge.register(spark)
    val vocab = graft.text.Bpe.pieceVocab(docs, "text").localCheckpoint()

    println("\n=================== bpe_candidate_pass_BEFORE ===================")
    vocab.select(col("n"), explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
      .select(col("p.0").as("a"), col("p.1").as("b"), col("n"))
      .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(8).explain("formatted")

    println("\n=================== bpe_candidate_pass ===================")
    // the per-pass candidate aggregate exactly as trainPasses builds it
    vocab.select(col("n"),
        explode(graft.functions.BpeMerge.pairCounts(col("syms"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        (col("n") * col("p.cnt")).as("w"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("cnt"))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(8).explain("formatted")

    spark.stop()
  }
}
