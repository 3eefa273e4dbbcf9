package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: A/B the more-like-this probe's aggregation shape —
  * term-major fan-out + hash agg (current) vs doc-major array fold
  * (candidate r10 rewrite). Usage: runMain graft.tools.ProfMlt <sfDir>
  */
object ProfMlt {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.jobs.Jobs.localBuilder("graft-profmlt", "32")
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
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") >= Split)
    val base = "/tmp/graft_profmlt"
    Bm25.indexBuild(corpus, "doc_id", "text", s"$base/bm")
    val (n, avgdl) = Bm25.readStats(s, s"$base/bm")
    val queries = docs.filter(col("doc_id") < Split)
    val K1 = Bm25.K1; val B = Bm25.B
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val qTermsPlan = queries.select(col("doc_id").as("qid"),
        explode(array_distinct(Text.tokens(lower(col("text"))))).as("term"))
      val rows = qTermsPlan.collect()
      val qTerms = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), qTermsPlan.schema)
      val termSet = s.createDataFrame(
        java.util.Arrays.asList(rows.map(_.getString(1)).distinct
          .map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("term",
            org.apache.spark.sql.types.StringType, nullable = true))))
      val buckets = termSet
        .select(pmod(hash(col("term")), lit(Bm25.IndexBuckets)).as("b"))
        .collect().map(_.getInt(0)).distinct.toSeq
      val matched = s.read.parquet(s"$base/bm/postings")
        .filter(col("bucket").isin(buckets: _*))
        .join(broadcast(termSet), "term")
      val df = matched.groupBy("term").agg(count(lit(1)).as("qdf"))
      val contrib = matched
        .join(broadcast(df), "term")
        .withColumn("c", round(
          log(lit(1.0) + (lit(n) - col("qdf") + 0.5) / (col("qdf") + 0.5)) *
            col("tf") * (lit(K1) + 1.0) /
            (col("tf") + lit(K1) * (lit(1.0) - lit(B) +
              lit(B) * col("dl") / lit(avgdl))), 6))
      // v1: current — fan out by term, hash agg on (qid, doc_id)
      val scoredV1 = contrib.join(broadcast(qTerms), "term")
        .groupBy(col("qid"), col("doc_id"))
        .agg(round(sum(col("c")), 6).as("score"),
          count(lit(1)).as("n_shared"))
      t("v1.scored.count")(scoredV1.count())
      t("v1.topk.count")(graft.plans.TopKPlan.topKPerKey(scoredV1,
        Seq("qid"), Seq("score" -> false, "doc_id" -> true), 5).count())
      // v1b: doc-colocated fan-out — one cheap narrow shuffle of the
      // contributions by doc_id makes the (qid, doc_id) partial agg
      // reduce 18× before the exchange instead of not at all
      val scoredV1b = contrib.repartition(col("doc_id"))
        .join(broadcast(qTerms), "term")
        .groupBy(col("qid"), col("doc_id"))
        .agg(round(sum(col("c")), 6).as("score"),
          count(lit(1)).as("n_shared"))
      t("v1b.scored.count")(scoredV1b.count())
      t("v1b.topk.count")(graft.plans.TopKPlan.topKPerKey(scoredV1b,
        Seq("qid"), Seq("score" -> false, "doc_id" -> true), 5).count())
      if (rep == 1) {
        val diffB = scoredV1.exceptAll(scoredV1b).count() +
          scoredV1b.exceptAll(scoredV1).count()
        println(s"[check] v1 vs v1b row diff = $diffB")
      }
      // v2: doc-major — one array of (term, c) per doc, per-query fold
      val qdocs = qTerms.groupBy(col("qid"))
        .agg(collect_list(col("term")).as("qts"))
      val docArr = contrib.select(col("doc_id"), col("term"), col("c"))
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("term"), col("c"))).as("tc"))
      val pairs = docArr.join(broadcast(qdocs))
        .withColumn("hits", filter(col("tc"),
          x => array_contains(col("qts"), x.getField("term"))))
        .withColumn("n_shared", size(col("hits")).cast("long"))
        .filter(col("n_shared") > 0)
      val scoredV2 = pairs.select(col("qid"), col("doc_id"),
        round(aggregate(col("hits"), lit(0.0),
          (acc, x) => acc + x.getField("c")), 6).as("score"),
        col("n_shared"))
      t("v2.scored.count")(scoredV2.count())
      t("v2.topk.count")(graft.plans.TopKPlan.topKPerKey(scoredV2,
        Seq("qid"), Seq("score" -> false, "doc_id" -> true), 5).count())
      // cross-check identical results
      if (rep == 1) {
        val d1 = scoredV1.select("qid", "doc_id", "score", "n_shared")
        val d2 = scoredV2.select("qid", "doc_id", "score", "n_shared")
        val diff = d1.exceptAll(d2).count() + d2.exceptAll(d1).count()
        println(s"[check] v1 vs v2 row diff = $diff")
      }
    }
    spark.stop()
  }
}
