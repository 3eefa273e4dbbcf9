package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 retrieval over the corpus: score documents against a query-term
  * set through an inverted-index join, top-k per term through the native
  * TopK operator. The training-data use case is retrieval-based
  * curation/decontamination probes ("which documents would this query
  * surface?") — the reference has no retrieval surface at all.
  *
  * Scale shape: the postings build is one explode + map-side-combined
  * groupBy (the same shape as tx_word_freq); the query-term set is tiny
  * by construction, so it broadcasts and the postings stream is
  * semi-join-pruned down to the probed terms BEFORE any scoring work;
  * corpus-level stats (N, avgdl) are two scalars from one aggregate,
  * folded in as literals. Nothing in the plan grows with k or with the
  * query count beyond the pruned postings themselves. Ranking runs on
  * round(score, 6) with a doc_id tiebreak so float jitter cannot flip
  * an order the oracle disagrees with.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** (term, doc_id, tf, dl): one row per distinct term per doc, over
    * lowercased whitespace tokens.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        Text.tokens(lower(col(textCol))).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))

  /** Top `nTerms` non-stopword terms by document frequency (df desc,
    * term asc) — the deterministic auto-generated "query workload".
    */
  def queryTerms(post: DataFrame, nTerms: Int): DataFrame = {
    val stop = Text.enStop ++ Text.ptStop ++ Text.esStop
    // postings are already one row per (term, doc): plain count IS the
    // document frequency — no countDistinct Expand
    post.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(!col("term").isInCollection(stop) && length(col("term")) >= 4)
      .orderBy(col("df").desc, col("term"))
      .limit(nTerms)
  }

  /** Top-k docs per query term by BM25. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           nTerms: Int, k: Int): DataFrame = {
    val post = postings(docs, idCol, textCol)
    // same dl derivation as the postings (lowercased tokens) so the
    // oracle's avgdl is the identical expression
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(size(Text.tokens(lower(col(textCol)))).cast("double")).as("avgdl")).head()
    val (n, avgdl) = (stats.getDouble(0), stats.getDouble(1))
    val q = queryTerms(post, nTerms).withColumnRenamed("df", "qdf")
    val scored = post
      .join(broadcast(q), "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(n) - col("qdf") + lit(0.5)) / (col("qdf") + lit(0.5))))
      .withColumn("score", round(
        col("idf") * col("tf") * (lit(K1) + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0) - lit(B) +
            lit(B) * col("dl") / lit(avgdl))), 6))
      .select(col("term"), col("doc_id"), col("score"),
        col("tf").cast("long").as("tf"), col("dl"))
    graft.operators.TopK.topKPerKey(scored, keys = Seq("term"),
      orderCols = Seq("score" -> false, "doc_id" -> true), k = k)
  }
}
