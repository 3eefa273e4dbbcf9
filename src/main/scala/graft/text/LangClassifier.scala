package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based language identification: one [[LangModel]] bigram LM
  * per language, docs classified by exact-long likelihood argmax —
  * the naive-Bayes upgrade of the heuristic `tx_lang_id` voter (and
  * the CLD/fastText-langid shape: per-class n-gram likelihoods,
  * argmax wins; the reference repo has no model-based classification
  * at all, containers/spark-etl/streaming_etl.py:115-153).
  *
  * Determinism is the whole design: each model's per-bigram
  * log-probs quantize to LONG micro-nats ([[LangModel.termMicroNats]]
  * — the three add-one backoff arms), a doc's score under a model is
  * a sum of longs (order-free under any partial-agg schedule), and
  * the argmax compares exact longs with ties broken by language name
  * — so the predicted label replays bit-for-bit in the oracle, which
  * no float-scored classifier can promise.
  *
  * Plan shape: the corpus explodes to its bigram stream ONCE; every
  * model joins that one stream as a broadcast (pruned vocabularies
  * fit executors — the [[Dsir]] two-model pattern generalized to k),
  * so scoring k languages is one map-only pass + the per-doc fold.
  * Training is k counting aggregations over disjoint slices — one
  * shuffle of O(bigram types) each, model-sized driver state only
  * (the vocab-size scalars).
  */
object LangClassifier {

  /** One trained per-language model: counts + derived context totals
    * + vocab size, all frozen-able for streaming reuse.
    */
  case class LangLm(lang: String, bigrams: DataFrame, c1: DataFrame,
                    v: Long)

  /** Fit one LM per language over `train` (slices by `langCol`) in
    * ONE corpus pass: bigrams count under a (lang, w1, w2) key and
    * vocab sizes under a (lang) key — k languages never cost k scans
    * (per-slice `bigramCounts` calls would re-read the corpus per
    * language; at 100 TB that difference is the whole job). Each
    * model is then a filter of the shared counted table, which is
    * exactly `bigramCounts(slice)` by the group-key algebra. Refuses
    * languages with an empty vocabulary — a zero-V model would
    * silently win every argmax through its 1/V arm.
    */
  def fit(train: DataFrame, textCol: String, langCol: String,
          langs: Seq[String]): Seq[LangLm] = {
    require(langs.nonEmpty && langs.distinct.size == langs.size,
      s"fit needs a non-empty, duplicate-free language list, got $langs")
    val ls = langs.sorted
    val base = train.filter(col(langCol).isInCollection(ls))
      .select(col(langCol).as("lang_"),
        Text.tokens(lower(col(textCol))).as("tk"))
    val tk = col("tk")
    val n1 = greatest(size(tk) - 1, lit(0))
    val counts = base
      .select(col("lang_"),
        explode(arrays_zip(slice(tk, lit(1), n1), slice(tk, lit(2), n1)))
          .as("b"))
      .select(col("lang_"), col("b").getField("0").as("w1"),
        col("b").getField("1").as("w2"))
      .groupBy(col("lang_"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .cache()
    val vocab = base.select(col("lang_"), explode(tk).as("t"))
      .groupBy(col("lang_")).agg(countDistinct(col("t")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ls.map { l =>
      val v = vocab.getOrElse(l, 0L)
      require(v > 0, s"language '$l' has an empty training vocabulary — " +
        "every argmax would tie at its uniform arm; drop it from `langs` " +
        "or train on a larger corpus")
      val bg = counts.filter(col("lang_") === l)
        .select(col("w1"), col("w2"), col("c12"))
      LangLm(l, bg, LangModel.derivedContextTotals(bg), v)
    }
  }

  /** Per-doc likelihood scores under every model (`sum_lq_<lang>`
    * exact longs, one row per input doc) and the argmax label:
    * `pred` = highest total, ties to the lexicographically smallest
    * language, null for bigram-less docs (no evidence — the [[Dsir]]
    * convention).
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               models: Seq[LangLm]): DataFrame = {
    require(models.nonEmpty, "classify needs at least one language model")
    val ms = models.sortBy(_.lang)
    val base = LangModel.tokenized(docs, idCol, textCol)
    val terms = ms.foldLeft(LangModel.bigramStream(base)) { (t, m) =>
      t.join(broadcast(m.bigrams
          .withColumnRenamed("c12", s"c12_${m.lang}")),
          Seq("w1", "w2"), "left")
        .join(broadcast(m.c1.withColumnRenamed("c1", s"c1_${m.lang}")),
          Seq("w1"), "left")
    }.select(col("doc_id") +: ms.map(m =>
      LangModel.termMicroNats(col(s"c12_${m.lang}"), col(s"c1_${m.lang}"),
        lit(m.v)).as(s"lq_${m.lang}")): _*)
    val scored = LangModel.foldPerDoc(base, terms,
      sums = ms.map(m => s"lq_${m.lang}"))
    val sumCols = ms.map(m => col(s"sum_lq_${m.lang}"))
    val best =
      if (sumCols.size == 1) sumCols.head else greatest(sumCols: _*)
    // first match wins → lexicographically smallest language on ties
    val pred = ms.tail.foldLeft(
      when(col(s"sum_lq_${ms.head.lang}") === best, ms.head.lang)) {
      (acc, m) => acc.when(col(s"sum_lq_${m.lang}") === best, m.lang)
    }
    scored.withColumn("pred",
      when(col("n_bigrams") > 0, pred))
  }
}
