package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora, four ways:
  *
  *  - [[jaccardPairs]] — exact n-gram Jaccard via an inverted-index
  *    shingle join (the correctness baseline; oracle-checkable).
  *  - [[minhashLshPairs]] — MinHash signatures + banded LSH candidate
  *    generation, then exact verification of the (tiny) candidate set.
  *    This is the 100 TB path: cost is O(docs × shingles) for
  *    signatures plus a bucket join on (band, bandHash) keys, never an
  *    all-pairs product.
  *  - [[simhashPairs]] — 64-bit SimHash + banded Hamming search
  *    (pigeonhole: distance ≤ 3 ⇒ one of 4 16-bit blocks equal).
  *  - [[graft.similarity.Ann.cosinePairs]] — embedding-space near-dups.
  *
  * Everything is expression-only (no UDFs): shingling via
  * `transform`/`sequence`, hashing via `xxhash64`, signatures via 128
  * map-side-combined `min` aggregates. Shuffles are keyed on doc id or
  * (band, hash) — both salt-free and uniformly distributed because the
  * key is itself a hash.
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column (whitespace-run
    * tokens, empty tokens excluded — matching [[graft.text.Text.tokens]]
    * and the native kernel).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = filter(split(trim(text), "\\s+"), t => t =!= "")
    // n-gram windows as arrays_zip of n shifted slices: the transform
    // lambda touches only its own argument — a lambda that closed over
    // `toks` would re-evaluate the full split PER ELEMENT (O(tokens·n)
    // splits per doc). m = 0 when size < n ⇒ empty result, no guard.
    val m = greatest(size(toks) - (n - 1), lit(0))
    val zipped = arrays_zip((1 to n).map(j => slice(toks, lit(j), m)): _*)
    // NULL text ⇒ empty array, not NULL (slice(null,…) propagates null;
    // callers rely on size() = 0 for empty/null docs)
    coalesce(
      array_distinct(transform(zipped, s =>
        concat_ws(" ", (0 until n).map(j => s.getField(j.toString)): _*))),
      array().cast("array<string>"))
  }

  /** Exact Jaccard-similar pairs (ids a < b) above `threshold`, via
    * explode + inverted-index self-join on the shingle string. At scale
    * the join key would be `xxhash64(shingle)` (narrower shuffle, same
    * result modulo 2^-64 collisions); the string key keeps the oracle
    * bit-exact.
    */
  /** (doc, sorted distinct shingle-hash array) via the single-pass
    * native kernel ([[graft.functions.TextHashing]]).
    */
  private def hashedShingles(df: DataFrame, id: String, text: String,
                             n: Int): DataFrame = {
    graft.functions.TextHashing.register(df.sparkSession)
    df.select(col(id).as("doc"),
      graft.functions.TextHashing.ngramHashes(col(text), n).as("hs"))
  }

  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int,
                   threshold: Double): DataFrame = {
    val sh = hashedShingles(df, id, text, n)
    // The shuffle carries two longs per row; shingle strings never
    // materialize. (Cross-shingle hash collisions would inflate `inter`
    // with probability ~|shingles|²/2⁶⁴ — negligible at any realistic
    // corpus size.)
    val ex = sh.select(col("doc"), explode(col("hs")).as("h"))
    val sizes = sh.select(col("doc"), size(col("hs")).as("sz"))
    val inter = ex.as("a")
      .join(ex.as("b"), col("a.h") === col("b.h") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("doc").as("doc_a"), col("sz").as("sza"))),
        Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc").as("doc_b"), col("sz").as("szb"))),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature columns via the standard universal-hash family
    * gᵢ(x) = (aᵢ·x + bᵢ) mod p over the base shingle hash x =
    * xxhash64(shingle) mod p, p = 2³¹−1 (the same family Spark ML's
    * MinHashLSH uses). The shingle string is hashed ONCE; each of the
    * `numHashes` permutations is two long ops — all inside one
    * map-side-combined groupBy(doc) with `numHashes` min aggregates: a
    * single shuffle keyed by doc id. Products stay < 2⁶² so ANSI-mode
    * arithmetic never overflows.
    */
  private val MinhashPrime = 2147483647L // 2^31 - 1
  private def hashFamily(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1), rnd.nextInt(Int.MaxValue).toLong))
  }

  def minhashSignatures(df: DataFrame, id: String, text: String, n: Int,
                        numHashes: Int): DataFrame =
    signatures(df, id, text, n, numHashes)

  private def signatures(df: DataFrame, id: String, text: String, n: Int,
                         numHashes: Int): DataFrame = {
    val ex = hashedShingles(df, id, text, n)
      .select(col("doc"), explode(col("hs")).as("h"))
      .select(col("doc"), pmod(col("h"), lit(MinhashPrime)).as("x"))
    val mins = hashFamily(numHashes, seed = 7L).zipWithIndex.map {
      case ((a, b), i) =>
        min((lit(a) * col("x") + lit(b)) % MinhashPrime).as(s"m$i")
    }
    ex.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + banded LSH near-dup pairs, exact-verified.
    *
    * `numHashes` minhashes in `bands` bands of r = numHashes/bands rows:
    * docs sharing any band bucket become candidates; candidates are then
    * verified with exact Jaccard over their (distinct) shingle sets, so
    * the output equals [[jaccardPairs]] except for pairs the LSH missed —
    * with 128/32 and j ≥ 0.8 the miss probability per pair is
    * (1 − j⁴)³² < 5·10⁻⁸.
    */
  def minhashLshPairs(df: DataFrame, id: String, text: String, n: Int,
                      threshold: Double, numHashes: Int = 128,
                      bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = signatures(df, id, text, n, numHashes)
    // band value = hash of its r signature entries
    val banded = sig.select(col("doc") +: (0 until bands).map { bnd =>
      xxhash64((bnd * r until (bnd + 1) * r).map(i => col(s"m$i")): _*)
        .as(s"b$bnd")
    }: _*)
    val ex = banded.select(col("doc"), explode(map(
      (0 until bands).flatMap(bnd => Seq(lit(bnd), col(s"b$bnd"))): _*))
      .as(Seq("band", "bh")))
    val cand = ex.as("x").join(ex.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    // exact verification over the candidates only
    val sh = hashedShingles(df, id, text, n)
    cand
      .join(sh.select(col("doc").as("doc_a"), col("hs").as("sha")), Seq("doc_a"))
      .join(sh.select(col("doc").as("doc_b"), col("hs").as("shb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over a near-dup pair list → dedup groups:
    * every doc in a component labels itself with the component's
    * minimum doc id (the canonical keeper). Iterative min-label
    * propagation — per round one join + one min-aggregate, lineage
    * truncated with localCheckpoint so plans stay flat; rounds are
    * bounded by component diameter (near-dup clusters are shallow).
    * The driver sees only a one-row convergence check per round, never
    * the data. Only docs that appear in some pair are emitted
    * (singletons are their own trivial component).
    */
  def connectedComponents(pairs: DataFrame, aCol: String,
                          bCol: String): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var converged = false
    while (!converged) {
      val prop = edges
        .join(labels.select(col("node").as("v"), col("label").as("vlab")), "v")
        .groupBy(col("u").as("node")).agg(min(col("vlab")).as("nlab"))
      // carry the previous label through the checkpoint so convergence
      // is a filter over materialized data — not another join per round
      val next = labels.join(prop, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlab"), col("label")))
            .as("label"),
          col("label").as("prev"))
        .localCheckpoint(true)
      converged = next.filter(col("label") =!= col("prev")).isEmpty
      labels = next.select(col("node"), col("label"))
    }
    labels.select(col("node").as("doc"), col("label").as("component"))
  }

  /** 64-bit SimHash per doc: sign of the per-bit ±1 vote sum over token
    * hashes. A per-document scalar via the native single-pass kernel
    * ([[graft.functions.TextHashing.simhash64]]) — map-only, no
    * explode, no shuffle.
    */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    graft.functions.TextHashing.register(df.sparkSession)
    df.select(col(id).as("doc"),
      graft.functions.TextHashing.simhash64(col(text)).as("simhash"))
  }

  /** SimHash pairs within `maxHamming` (≤ 3), via banded search: split
    * the 64-bit signature into 4 16-bit blocks; by pigeonhole any pair
    * within Hamming distance ≤ 3 shares at least one exact block, so the
    * join is on (block index, block value) — never all-pairs. Verified
    * with exact `bit_count(xor)`.
    */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   maxHamming: Int = 3): DataFrame = {
    // 4 blocks guarantee recall only for distance <= 3 (pigeonhole);
    // larger thresholds would silently drop qualifying pairs
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] for 4-block banding, got $maxHamming")
    val sig = simhash(df, id, text)
    val blocks = sig.select(col("doc"), col("simhash"), explode(map(
      (0 until 4).flatMap(i => Seq(lit(i),
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL))): _*))
      .as(Seq("blk", "bv")))
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
