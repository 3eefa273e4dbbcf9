package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID (stopword-marker heuristic), quality
  * scoring, and document fingerprinting. All pure Catalyst expression
  * composition — no UDFs — so every function stays inside whole-stage
  * codegen and scales as a map-only pass over the corpus (no shuffle,
  * no state, no driver involvement at any corpus size).
  *
  * The reference system (pedrotokar/banking-streaming-ETL) has no text
  * surface; these extend the engine per the training-data-pipeline
  * charter (SURVEY.md §7.4 north-star extensions).
  */
object Text {

  /** Marker stopwords per language for the voting heuristic. */
  val enStop: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it")
  val ptStop: Seq[String] = Seq("de", "que", "e", "o", "os", "um", "uma", "para")
  val esStop: Seq[String] = Seq("el", "la", "los", "las", "y", "un", "una", "por")

  private def litArr(s: Seq[String]): Column = array(s.map(lit): _*)

  /** Whitespace-run tokenization, empty tokens excluded — the engine's
    * canonical definition, shared with the native kernels
    * ([[graft.functions.TextHashing]]). The empty-token filter matters
    * when text has leading non-space whitespace (`trim` strips only
    * spaces; the regex split then emits a leading "" artifact).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens present in `stop` (duplicates counted — NOT set
    * intersection, so frequency information survives).
    */
  def stopwordHits(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => array_contains(litArr(stop), t)))

  /** Fraction of characters that are sentence punctuation; 0.0 for the
    * empty string (defined, not NaN/null, so degenerate docs score
    * deterministically downstream).
    */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") /
        length(text)).otherwise(0.0)

  /** Fraction of tokens that are (any-language) stopwords; 0.0 for a
    * tokenless (empty/whitespace-only) document.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      stopwordHits(toks, enStop ++ ptStop ++ esStop).cast("double") /
        size(toks)).otherwise(0.0)
  }

  /** Language-ID by stopword votes; ties resolve en > pt > es. */
  def langVotes(text: Column): (Column, Column, Column) = {
    val toks = tokens(text)
    (stopwordHits(toks, enStop), stopwordHits(toks, ptStop),
      stopwordHits(toks, esStop))
  }

  def langGuess(text: Column): Column = {
    val (en, pt, es) = langVotes(text)
    when(en >= pt && en >= es, "en").when(pt >= es, "pt").otherwise("es")
  }

  /** Composite quality score in [0,1]: length saturation + low
    * punctuation density + stopword presence (fluency proxy).
    */
  def qualityScore(text: Column): Column =
    lit(0.4) * least(lit(1.0), tokenCount(text) / lit(100.0)) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.3) * stopwordRatio(text)

  /** Whitespace-normalized lowercase form used for exact-dup keys. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text (hex string). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Polynomial rolling hash over characters (base 31, mod 1e9+7) —
    * a native Catalyst fold via `aggregate`, no UDF. Unit-tested;
    * fingerprint() is the oracle-checkable variant.
    */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)

  /** TF-IDF top-k terms per document over a corpus.
    *
    * tf = term count in the doc; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    * sklearn-style); ranking by score rounded to 6 decimals (term
    * tiebreak) so ordering is reproducible across engines. Three
    * shuffles total — (doc,term) counts, per-term document frequency,
    * and the final per-doc top-k via the map-side-pruned
    * [[graft.operators.TopK]] operator; the corpus size joins in as a
    * broadcast scalar, never a driver-side constant.
    */
  def tfIdfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfT, "term")
      .join(org.apache.spark.sql.functions.broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * (log((col("n_docs") + 1.0) / (col("df_t") + 1.0))
          + 1.0), 6).as("tfidf"))
    graft.operators.TopK.topKPerKey(scored, Seq("doc_id"),
      Seq("tfidf" -> false, "term" -> true), k)
  }
}
