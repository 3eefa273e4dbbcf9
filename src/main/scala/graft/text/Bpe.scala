package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — learn the merge table from
  * the corpus (the step before any `tx_bpe_tokens`-style encode can
  * exist). Classic Sennrich-style BPE with an explicit `</w>`
  * end-of-word symbol.
  *
  * Scale shape — the part that matters at 100 TB: BPE statistics are
  * a function of the *weighted word vocabulary*, not the corpus. The
  * corpus is scanned ONCE (token explode → word counts); every merge
  * iteration then runs over the distinct-word table (millions of rows
  * at web scale, not trillions): adjacent-pair explode weighted by
  * word count → one small keyed aggregate → a 1-row argmax to the
  * driver (the merge decision is the only thing collected — BPE is
  * inherently sequential in its merge choices). The symbol rewrite is
  * a map-only higher-order fold over each word's symbol array;
  * lineage is checkpoint-truncated every few iterations so the plan
  * doesn't grow with the merge count.
  *
  * Determinism: ties in pair frequency break on (left ASC, right ASC),
  * so the learned table is reproducible run-over-run and replayable by
  * the [[BpeSpec]] in-memory reference implementation.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  val EndOfWord = "</w>"

  /** Greedy left-to-right single-pair merge over a symbol array — the
    * BPE rewrite step. Fold semantics: a symbol consumed by a merge
    * cannot start another ("aaa" + merge(a,a) → [aa, a]).
    */
  def mergePair(syms: Column, left: String, right: String): Column = {
    val fused = left + right
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
        element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
        .otherwise(concat(acc, array(x))))
  }

  /** Initial symbol array of a word: characters + `</w>`. */
  def initialSymbols(word: Column): Column =
    concat(filter(split(word, ""), c => c =!= ""), array(lit(EndOfWord)))

  /** The weighted word vocabulary — the ONE corpus pass. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Learn `merges` BPE merges. Returns the ordered merge table and
    * the final vocabulary state (word, count, symbols) for inspection/
    * encoding. Stops early when no adjacent pair remains.
    */
  def train(docs: DataFrame, textCol: String, merges: Int,
            checkpointEvery: Int = 4): (Seq[Merge], DataFrame) = {
    require(merges >= 0, "merges must be non-negative")
    var vocab = wordVocab(docs, textCol)
      .withColumn("syms", initialSymbols(col("w")))
      .localCheckpoint()
    val learned = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val top = vocab
        .select(col("n"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("p.0").as("a"), col("p.1").as("b"), col("n"))
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top.head
        val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
        rank += 1
        learned += Merge(rank, a, b, cnt)
        vocab = vocab.withColumn("syms", mergePair(col("syms"), a, b))
        if (rank % checkpointEvery == 0) vocab = vocab.localCheckpoint()
      }
    }
    (learned.result(), vocab)
  }

  /** Batched merge learning — the standard large-vocabulary
    * optimization: one pair-count pass learns up to `batch` mutually
    * NON-OVERLAPPING merges (no symbol appears in two selected pairs),
    * so a 32k-vocabulary run needs merges/batch driver round-trips
    * instead of one per merge. Non-overlap is what keeps the batch
    * honest: merging (a,b) can only create/destroy pairs that contain
    * a or b, so every other selected pair's count is EXACTLY what the
    * pass measured — the approximation relative to classic BPE is
    * only that pairs created mid-batch can't be chosen until the next
    * pass. With `batch = 1` this IS [[train]], merge for merge
    * (differentially pinned in BpeSpec).
    *
    * Driver state stays bounded: one ordered candidate collect of
    * O(batch) rows per pass (4·batch+8 — each selected pair can block
    * at most the later candidates sharing its two symbols; an
    * under-filled batch is benign, the next pass re-counts).
    */
  def trainBatched(docs: DataFrame, textCol: String, merges: Int,
                   batch: Int): (Seq[Merge], DataFrame) = {
    require(merges >= 0, "merges must be non-negative")
    require(batch >= 1, "batch must be positive")
    var vocab = wordVocab(docs, textCol)
      .withColumn("syms", initialSymbols(col("w")))
      .localCheckpoint()
    val learned = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val want = math.min(batch, merges - rank)
      val cands = vocab
        .select(col("n"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("p.0").as("a"), col("p.1").as("b"), col("n"))
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(4 * want + 8).collect()
      if (cands.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val picked = cands.iterator
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .filter { case (a, b, _) =>
            if (used(a) || used(b)) false
            else { used += a; used += b; true }
          }.take(want).toSeq
        for ((a, b, cnt) <- picked) {
          rank += 1
          learned += Merge(rank, a, b, cnt)
          vocab = vocab.withColumn("syms", mergePair(col("syms"), a, b))
        }
        // truncate lineage once per pass: `batch` chained HOF rewrite
        // projects is the deepest plan this loop may stack
        vocab = vocab.localCheckpoint()
      }
    }
    (learned.result(), vocab)
  }

  /** Persist a learned merge table — the tokenizer ARTIFACT a training
    * pipeline ships between the train job and every encode job. One
    * tiny rank-ordered parquet; overwrite is atomic enough for the
    * single-writer train step (encoders read a complete table or the
    * previous one).
    */
  def saveMerges(s: org.apache.spark.sql.SparkSession, merges: Seq[Merge],
                 dir: String): Unit = {
    import s.implicits._
    merges.toDF().repartition(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted merge table, rank-ordered — ready for
    * [[encode]]. Fails loudly on an empty/missing artifact rather
    * than silently encoding with zero merges.
    */
  def loadMerges(s: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[Merge] = {
    import s.implicits._
    val m = s.read.parquet(dir).as[Merge].collect().sortBy(_.rank).toSeq
    require(m.nonEmpty, s"no BPE merge table at $dir")
    require(m.map(_.rank) == (1 to m.length),
      s"BPE merge table at $dir has non-contiguous ranks — torn write?")
    m
  }

  /** Encode a word column with a learned merge table (merges applied
    * in rank order — BPE encode-by-replay; production encoders use the
    * equivalent priority-queue form, same result).
    */
  def encode(word: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(initialSymbols(word)) { (c, m) =>
      mergePair(c, m.left, m.right)
    }
}
