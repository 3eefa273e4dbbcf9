package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-contract registrations for similarity search over the
  * `embeddings` table. ALL variants are oracle-checked — including the
  * "approximate" ones, because their randomness is fixed: IVF seeds
  * centroids deterministically (first-N corpus vectors by id) and LSH
  * draws its ±1 hyperplanes from a fixed seed, which the oracle SQL
  * embeds as literals. Dot products sum left-to-right in
  * both engines (graft_dot_d ↔ DuckDB list_dot_product), so cell
  * assignment, band signatures, and rounded cosines match bit-for-bit.
  */
object AnnQueries {

  private[graft] val K = 5
  private[graft] val NQueries = 8
  /** Hard-negative mining: candidate pool depth and kept negatives. */
  private[graft] val MineK = 20
  private[graft] val MineNeg = 5
  private val PairThreshold = 0.45
  /** Contract floor for the k-means-refined IVF recall@K (see
    * `ann_ivf_kmeans_topk`). Measured with tools/ProbeRecall
    * (nProbe=4 of 16 cells): worst query 3/5 at sf0.01, 5/5 across the
    * board at sf0.1. 0.4 (= 2 hits at K=5) sits one full hit below the
    * observed minimum so partition-order float noise in the centroid
    * sums can never flip the row, while a real regression (probe or
    * assignment bug) still fails it.
    */
  private val RecallBound = 0.4

  /** Shared oracle CTE: embeddings as double vectors + L2 norms. */
  private val nCte =
    """n AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         sqrt(list_dot_product(embedding::DOUBLE[],
      |                               embedding::DOUBLE[])) AS nrm
      |  FROM embeddings)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.bruteForceTopK(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding", K)
    }),
    // SEMANTIC decontamination — the embedding-space complement of the
    // lexical 13-gram check (dedup_decontaminate): each held-out
    // vector's top-K nearest TRAIN vectors, flagged when cosine ≥
    // 0.35. Paraphrased test items share no 13-gram with their train
    // source but sit next to it in embedding space — this is the
    // contamination mode the gram check structurally cannot see. The
    // split is the engine's deterministic Knuth bucket on vec_id, the
    // candidate set is bounded at K per held-out item (top-k first,
    // threshold second — the standard protocol), and at sf0.01 the
    // audit fires both ways: 31 of 50 held-out vecs flag, 19 are
    // clean.
    "dedup_semantic_decontam" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val b = graft.functions.Binning.knuthBucket(col("vec_id"))
      Ann.bruteForceTopK(emb.filter(b >= 90), emb.filter(b < 80),
          "vec_id", "embedding", K)
        .filter(col("sim") >= 0.35)
    }),
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.lshTopK(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding", K)
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.ivfTopK(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding", K)
    }),
    // k-means centroids are float-sum accumulations (partition-order
    // dependent) — no cross-engine bit parity possible for the raw
    // top-k rows. The ORACLE therefore checks the operator by CONTRACT
    // (the a37/a24 trick): per query, the refined index must return
    // exactly K rows and achieve recall@K ≥ RecallBound against the
    // brute-force truth computed in the same plan. The expected rows
    // are then fully literal (one per query, all-true), and a recall
    // regression in the k-means path turns the row red. Exact top-k
    // values stay pinned by DedupAnnSpec.
    "ann_ivf_kmeans_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < NQueries)
      val approx = Ann.ivfKmeansTopK(q, emb, "vec_id", "embedding", K)
      val exact = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", K)
      val hits = exact.select(col("qid"), col("vid"))
        .join(approx.select(col("qid"), col("vid")), Seq("qid", "vid"),
          "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      approx.groupBy(col("qid")).agg(count(lit(1)).as("k_returned"))
        .join(hits, Seq("qid"), "left")
        .select(col("qid"), col("k_returned"),
          (coalesce(col("n_hits"), lit(0L)) >= lit(RecallBound * K))
            .as("recall_ok"))
    }),
    // Persisted IVF index: build on the id >= 100 slice, ingest
    // 8 <= id < 100 as an assign-only APPEND (stored centroids frozen
    // — no rebuild, existing rows untouched), then answer top-k from
    // the stored table. Everything deterministic ⇒ the oracle replays
    // seed + assignment + probe; DedupAnnSpec pins persisted ==
    // recompute.
    // Two-stage truncated-prefix retrieval (matryoshka): rank on the
    // first 32 of 64 dims, exact-rerank only the surviving 20
    // candidates per query. Deterministic end-to-end, so the oracle
    // replays the CASCADE (candidate cut included), not just a recall
    // bound.
    "ann_truncated_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.truncatedRerankTopK(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding", K, prefixDims = 32, candidates = 20)
    }),
    // The full maintenance loop, composed: build → skewed ingest (40
    // near-duplicates of one corpus vector, all landing in one cell) →
    // PSI drift gate over the 16-cell occupancy histogram (32 scalars
    // on the driver — the gate is a decision, not a dataflow) → gate
    // fires → refresh → self-check. What ann_ivf_refresh proves for
    // the refresh alone, this proves for the trigger wiring.
    "pipeline_index_maintenance" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val ix = s"/tmp/graft_ivf_maint-${ProcessHandle.current().pid()}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ix))
      Ann.ivfIndexBuild(emb.filter(col("vec_id") >= 100),
        "vec_id", "embedding", nCells = 16, ix)
      def cellHist(): Map[Int, Long] =
        s.read.parquet(s"${Ann.ivfRoot(ix)}/assigned").groupBy("cell").count()
          .as[(Int, Long)].collect().toMap
      val before = cellHist()
      val base = emb.filter(col("vec_id") === 100)
        .select(col("embedding")).as[Seq[Float]].head()
      // the skew must be material at ANY corpus size: 25% of the base
      // slice, all near-duplicates of one vector → one cell's share
      // jumps ~20 points and the PSI gate fires at every sf
      val nBase = emb.filter(col("vec_id") >= 100).count()
      val nDelta = math.ceil(nBase * 0.25).toLong
      val delta = (0L until nDelta).map { i =>
        (100000L + i, base.updated(0, base.head + (i % 7).toFloat / 100f))
      }.toDF("vec_id", "embedding")
      Ann.ivfIndexAppend(delta, "vec_id", "embedding", ix)
      val after = cellHist()
      def shares(h: Map[Int, Long]): Seq[Double] = {
        val t = h.values.sum.toDouble
        (0 until 16).map(c => math.max(h.getOrElse(c, 0L) / t, 1e-6))
      }
      val psi = shares(before).zip(shares(after))
        .map { case (p, q) => (q - p) * math.log(q / p) }.sum
      val fired = psi > 0.05
      if (fired) Ann.ivfIndexRefresh(s, ix, iters = 3)
      Ann.indexSelfCheck(s, ix)
        .select(lit(fired).as("drift_fired"), col("misassigned"),
          col("n_vectors"))
    }),
    // Index refresh/rebalance: build (first-N seeding), Lloyd-refine
    // in place via the atomic staged swap, then prove (in-plan) that
    // the refreshed index is self-consistent (every stored cell IS the
    // max-cosine cell under the stored centroids), conserves rows, and
    // still clears the kmeans-tier recall floor on probes. Float-sum
    // centroids preclude a bit-replay — contract oracle, like
    // ann_ivf_kmeans_topk.
    "ann_ivf_refresh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ix = s"/tmp/graft_ivf_refresh-${ProcessHandle.current().pid()}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ix))
      Ann.ivfIndexBuild(emb, "vec_id", "embedding", nCells = 16, ix)
      Ann.ivfIndexRefresh(s, ix, iters = 3)
      val q = emb.filter(col("vec_id") < NQueries)
      val approx = Ann.ivfTopKFromIndex(q, "vec_id", "embedding", ix,
        K, nProbe = 4)
      val exact = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", K)
      val hits = exact.select(col("qid"), col("vid"))
        .join(approx.select(col("qid"), col("vid")), Seq("qid", "vid"),
          "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      approx.groupBy(col("qid")).agg(count(lit(1)).as("k_returned"))
        .join(hits, Seq("qid"), "left")
        .select(col("qid"), col("k_returned"),
          (coalesce(col("n_hits"), lit(0L)) >= lit(RecallBound * K))
            .as("recall_ok"))
        .crossJoin(broadcast(Ann.indexSelfCheck(s, ix)))
    }),
    "ann_ivf_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ix = s"/tmp/graft_ivf_index-${ProcessHandle.current().pid()}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ix))
      // append assigns against the same frozen centroids the build
      // returned, so the probe can reuse them without a re-read
      val cents = Ann.ivfIndexBuild(emb.filter(col("vec_id") >= 100),
        "vec_id", "embedding", nCells = 16, ix)
      Ann.ivfIndexAppend(
        emb.filter(col("vec_id") >= NQueries && col("vec_id") < 100),
        "vec_id", "embedding", ix)
      Ann.ivfTopKFromIndex(emb.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", ix, K, nProbe = 4, cents = Some(cents))
    }),
    "emb_cosine_pairs" -> ((s, dir) =>
      Ann.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        PairThreshold)),
    // Product quantization: 4 subspaces × 16 codes, first-K seeding
    // (deterministic ⇒ the oracle replays encode + ADC exactly)
    "ann_pq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.pqTopK(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding", K)
    }),
    // IVF-PQ composition: cells prune candidates, codes do the ranking
    "ann_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.ivfPqTopK(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding", K)
    }),
    // ANN similarity JOIN between two corpus-sized relations (no
    // broadcast side): every id < 200 vector matched to its nearest
    // id >= 200 vector via shared IVF cells — deterministic seeding ⇒
    // the oracle replays assignment, probing and the rank-1 cut
    "ann_join_top1" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.annJoinTop1(emb.filter(col("vec_id") < 200),
        emb.filter(col("vec_id") >= 200), "vec_id", "embedding")
    }),
    // k-NN variant of the ANN join (kNN-graph construction), cut by
    // the native TopK plan node — same deterministic replay, k rows
    // per left vector
    "ann_join_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.annJoinTopK(emb.filter(col("vec_id") < 200),
        emb.filter(col("vec_id") >= 200), "vec_id", "embedding", k = 3)
    }),
    // Hard-negative mining (DPR recipe): top-20 cosine candidates per
    // anchor, same-label candidates dropped as positives, 5 hardest
    // survivors kept with a fresh mined rank — the contrastive-
    // training data loop closed in-engine
    "mine_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.hardNegatives(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding",
        labels = emb.select(col("vec_id"), col("label")),
        labelCol = "label", k = MineK, nNeg = MineNeg)
    }),
    // mutual-kNN-graph clustering of the WHOLE corpus against itself
    // (k=3 neighbors through the shared IVF cells, edges kept only
    // when reciprocated AND sim ≥ 0.35, components labeled, every
    // vector emitted with its cluster + representative flag) — the
    // graph-shaped semantic dedup; at sf0.01 this yields 97 mutual
    // edges over 63 multi-member clusters (max size 6) with the rest
    // singletons, so the oracle exercises non-trivial structure
    "dedup_knn_clusters" -> ((s, dir) =>
      Ann.knnGraphClusters(Tables.embeddings(s, dir), "vec_id",
        "embedding", k = 3, threshold = 0.35)))

  /** Shared replay CTE of the ANN-join family (left < 200 probes the
    * id >= 200 corpus): seeding, assignment, probing, rounded-sim
    * ranking — callers append their rank cut over `ranked`.
    */
  private val annJoinOracle: String =
    s"""WITH $nCte,
       |cents AS (
       |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS idx,
       |         v AS cv, nrm AS cn
       |  FROM n WHERE vec_id >= 200 ORDER BY vec_id LIMIT 16),
       |csims AS (
       |  SELECT n.vec_id, cents.idx,
       |         list_dot_product(n.v, cents.cv) / (n.nrm * cents.cn) AS sim
       |  FROM n, cents),
       |assigned AS (
       |  SELECT vec_id, idx AS cell FROM (
       |    SELECT vec_id, idx, row_number() OVER (
       |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
       |    FROM csims WHERE vec_id >= 200) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS lid, idx AS cell FROM (
       |    SELECT vec_id, idx, row_number() OVER (
       |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
       |    FROM csims WHERE vec_id < 200) WHERE rn <= 4),
       |cand AS (
       |  SELECT p.lid, a.vec_id AS rid,
       |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell
       |  JOIN n q ON q.vec_id = p.lid
       |  JOIN n c ON c.vec_id = a.vec_id),
       |ranked AS (
       |  SELECT lid, rid, sim, row_number() OVER (
       |           PARTITION BY lid ORDER BY sim DESC, rid ASC) AS rn
       |  FROM cand)
       |""".stripMargin

  /** DuckDB literal for a double vector. */
  private def vecLit(v: Seq[Double]): String =
    v.map(x => if (x == x.floor) f"$x%.1f" else x.toString)
      .mkString("[", ", ", "]::DOUBLE[]")

  /** IVF oracle: replays centroid seeding (first `nCentroids` by id),
    * max-sim cell assignment (ties → larger centroid index, matching
    * Spark's struct-max), nProbe probing, and the exact rerank.
    */
  private def ivfOracle(nCentroids: Int, nProbe: Int): String =
    s"""WITH $nCte,
       |cents AS (
       |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS idx,
       |         v AS cv, nrm AS cn
       |  FROM n ORDER BY vec_id LIMIT $nCentroids),
       |csims AS (
       |  SELECT n.vec_id, cents.idx,
       |         list_dot_product(n.v, cents.cv) / (n.nrm * cents.cn) AS sim
       |  FROM n, cents),
       |assigned AS (
       |  SELECT vec_id, idx AS cell FROM (
       |    SELECT vec_id, idx, row_number() OVER (
       |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
       |    FROM csims) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS qid, idx AS cell FROM (
       |    SELECT vec_id, idx, row_number() OVER (
       |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
       |    FROM csims WHERE vec_id < $NQueries) WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT DISTINCT p.qid, a.vec_id AS vid,
       |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell AND a.vec_id != p.qid
       |  JOIN n q ON q.vec_id = p.qid
       |  JOIN n c ON c.vec_id = a.vec_id),
       |ranked AS (
       |  SELECT qid, vid, sim,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY sim DESC, vid ASC)::INT AS rank
       |  FROM cand)
       |SELECT * FROM ranked WHERE rank <= $K""".stripMargin

  /** PQ oracle: replays codebook seeding (first-k subvectors by id),
    * per-subspace argmin-L2 encode (same 3-dot distance formula →
    * bit-equal doubles; ties → lower code), and the ADC rank. The ADC
    * sum runs over an s-ORDERED list so the fold order matches Spark's
    * fixed s=0..m−1 reduce; ranking is by the ROUNDED distance on both
    * sides so residual last-ULP fold noise cannot reorder the cut.
    */
  private def pqOracle(m: Int, k: Int, dim: Int): String = {
    val w = dim / m
    val l2 = "list_dot_product(vs, vs) - 2 * list_dot_product(vs, c) " +
      "+ list_dot_product(c, c)"
    s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ss AS (SELECT unnest(range(0, $m))::INT AS s),
       |sub AS (
       |  SELECT vec_id, s, v[(s*$w + 1):(s*$w + $w)] AS vs FROM n, ss),
       |seed AS (SELECT vec_id FROM n ORDER BY vec_id LIMIT $k),
       |cb AS (
       |  SELECT sub.s,
       |         (row_number() OVER (PARTITION BY sub.s
       |                             ORDER BY sub.vec_id) - 1)::INT AS j,
       |         sub.vs AS c
       |  FROM sub JOIN seed USING (vec_id)),
       |enc AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT sub.vec_id, sub.s, cb.j,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |             ORDER BY $l2 ASC, cb.j ASC) AS rn
       |    FROM sub JOIN cb USING (s)) WHERE rn = 1),
       |qt AS (
       |  SELECT sub.vec_id AS qid, sub.s, cb.j, $l2 AS qd
       |  FROM sub JOIN cb USING (s) WHERE sub.vec_id < $NQueries),
       |adc AS (
       |  SELECT qt.qid, enc.vec_id AS vid,
       |         round(list_sum(list(qt.qd ORDER BY qt.s)), 6) AS adc_dist
       |  FROM enc JOIN qt ON enc.s = qt.s AND enc.code = qt.j
       |  WHERE enc.vec_id != qt.qid
       |  GROUP BY qt.qid, enc.vec_id),
       |ranked AS (
       |  SELECT qid, vid, adc_dist,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY adc_dist ASC, vid ASC)::INT AS rank
       |  FROM adc)
       |SELECT * FROM ranked WHERE rank <= $K""".stripMargin
  }

  /** IVF-PQ oracle: [[ivfOracle]]'s cell assignment + probing glued to
    * [[pqOracle]]'s encode + ADC — candidates from the probed cells,
    * scores from the codes.
    */
  private def ivfPqOracle(nCentroids: Int, nProbe: Int, m: Int, k: Int,
                          dim: Int): String = {
    val w = dim / m
    val l2 = "list_dot_product(vs, vs) - 2 * list_dot_product(vs, c) " +
      "+ list_dot_product(c, c)"
    s"""WITH $nCte,
       |cents AS (
       |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS idx,
       |         v AS cv, nrm AS cn
       |  FROM n ORDER BY vec_id LIMIT $nCentroids),
       |csims AS (
       |  SELECT n.vec_id, cents.idx,
       |         list_dot_product(n.v, cents.cv) / (n.nrm * cents.cn) AS sim
       |  FROM n, cents),
       |assigned AS (
       |  SELECT vec_id, idx AS cell FROM (
       |    SELECT vec_id, idx, row_number() OVER (
       |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
       |    FROM csims) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS qid, idx AS cell FROM (
       |    SELECT vec_id, idx, row_number() OVER (
       |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
       |    FROM csims WHERE vec_id < $NQueries) WHERE rn <= $nProbe),
       |ss AS (SELECT unnest(range(0, $m))::INT AS s),
       |sub AS (
       |  SELECT vec_id, s, v[(s*$w + 1):(s*$w + $w)] AS vs FROM n, ss),
       |seed AS (SELECT vec_id FROM n ORDER BY vec_id LIMIT $k),
       |cb AS (
       |  SELECT sub.s,
       |         (row_number() OVER (PARTITION BY sub.s
       |                             ORDER BY sub.vec_id) - 1)::INT AS j,
       |         sub.vs AS c
       |  FROM sub JOIN seed USING (vec_id)),
       |enc AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT sub.vec_id, sub.s, cb.j,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |             ORDER BY $l2 ASC, cb.j ASC) AS rn
       |    FROM sub JOIN cb USING (s)) WHERE rn = 1),
       |qt AS (
       |  SELECT sub.vec_id AS qid, sub.s, cb.j, $l2 AS qd
       |  FROM sub JOIN cb USING (s) WHERE sub.vec_id < $NQueries),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS vid
       |  FROM probes p JOIN assigned a
       |    ON a.cell = p.cell AND a.vec_id != p.qid),
       |adc AS (
       |  SELECT cand.qid, cand.vid,
       |         round(list_sum(list(qt.qd ORDER BY qt.s)), 6) AS adc_dist
       |  FROM cand
       |  JOIN enc ON enc.vec_id = cand.vid
       |  JOIN qt ON qt.qid = cand.qid AND qt.s = enc.s AND qt.j = enc.code
       |  GROUP BY cand.qid, cand.vid),
       |ranked AS (
       |  SELECT qid, vid, adc_dist,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY adc_dist ASC, vid ASC)::INT AS rank
       |  FROM adc)
       |SELECT * FROM ranked WHERE rank <= $K""".stripMargin
  }

  /** LSH oracle: the ±1 hyperplanes are embedded as literals (same
    * seed-42 draw as [[Ann.lshTopK]]); band values are the identical
    * sign-bit sums, candidates any-band-equal pairs, then exact rerank.
    */
  private def lshOracle(bands: Int, bitsPerBand: Int, dim: Int,
                        seed: Long): String = {
    val planes = Ann.hyperplanes(bands * bitsPerBand, dim, seed)
    def bandExpr(bnd: Int): String =
      (0 until bitsPerBand).map { j =>
        s"""CASE WHEN list_dot_product(v, ${vecLit(planes(bnd * bitsPerBand + j))})
           |          >= 0 THEN ${1L << j} ELSE 0 END""".stripMargin
      }.mkString("(", "\n + ", s") AS b$bnd")
    val bandCols = (0 until bands).map(bandExpr).mkString(",\n         ")
    val bandMatch = (0 until bands).map(b => s"q.b$b = c.b$b").mkString(" OR ")
    s"""WITH $nCte,
       |sig AS (
       |  SELECT vec_id, v, nrm,
       |         $bandCols
       |  FROM n),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vid,
       |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
       |  FROM sig q JOIN sig c
       |    ON q.vec_id < $NQueries AND c.vec_id != q.vec_id
       |   AND ($bandMatch)),
       |ranked AS (
       |  SELECT qid, vid, sim,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY sim DESC, vid ASC)::INT AS rank
       |  FROM cand)
       |SELECT * FROM ranked WHERE rank <= $K""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // contract oracle (see the query's comment): K rows per query,
    // recall above the floor — expected rows fully literal
    "ann_ivf_kmeans_topk" ->
      s"""SELECT vec_id AS qid, $K::BIGINT AS k_returned,
         |       TRUE AS recall_ok
         |FROM embeddings WHERE vec_id < $NQueries""".stripMargin,
    "ann_ivf_topk" -> ivfOracle(nCentroids = 16, nProbe = 4),
    // full cascade replay: prefix-cosine cut at 20, exact rerank at 5
    "ann_truncated_rerank" ->
      s"""WITH $nCte,
         |np AS (
         |  SELECT vec_id, v[1:32] AS p,
         |         sqrt(list_dot_product(v[1:32], v[1:32])) AS pn,
         |         v, nrm
         |  FROM n WHERE sqrt(list_dot_product(v[1:32], v[1:32])) > 0),
         |s1 AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vid,
         |         round(list_dot_product(q.p, c.p) / (q.pn * c.pn), 6)
         |           AS psim
         |  FROM np q JOIN np c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < $NQueries),
         |cand AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid, row_number() OVER (PARTITION BY qid
         |             ORDER BY psim DESC, vid ASC) AS pr
         |    FROM s1) WHERE pr <= 20),
         |rr AS (
         |  SELECT cand.qid, cand.vid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)
         |           AS sim
         |  FROM cand
         |  JOIN np q ON q.vec_id = cand.qid
         |  JOIN np c ON c.vec_id = cand.vid)
         |SELECT qid, vid, sim, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY sim DESC, vid ASC) AS INT) AS rank FROM rr)
         |WHERE rank <= $K""".stripMargin,
    // the skewed ingest MUST fire the gate; the refreshed index must
    // be self-consistent and conserve base + 25%-delta rows
    "pipeline_index_maintenance" ->
      s"""WITH b AS (SELECT count(*)::BIGINT AS n FROM embeddings
         |           WHERE vec_id >= 100)
         |SELECT true AS drift_fired, 0::BIGINT AS misassigned,
         |       (n + CAST(ceil(n * 0.25) AS BIGINT))::BIGINT AS n_vectors
         |FROM b""".stripMargin,
    // contract: conservation + self-consistency + recall floor (the
    // refreshed centroids are float sums — no bit replay possible)
    "ann_ivf_refresh" ->
      s"""SELECT vec_id AS qid, $K::BIGINT AS k_returned,
         |       TRUE AS recall_ok,
         |       (SELECT count(*) FROM embeddings)::BIGINT AS n_vectors,
         |       0::BIGINT AS misassigned
         |FROM embeddings WHERE vec_id < $NQueries""".stripMargin,
    // persisted-index variant: centroids seeded from the BUILD slice
    // (vec_id >= 100), the stored table covers build + appended delta
    // (vec_id >= 8), probes replay against it
    "ann_ivf_persisted" ->
      s"""WITH $nCte,
         |cents AS (
         |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS idx,
         |         v AS cv, nrm AS cn
         |  FROM n WHERE vec_id >= 100 ORDER BY vec_id LIMIT 16),
         |csims AS (
         |  SELECT n.vec_id, cents.idx,
         |         list_dot_product(n.v, cents.cv) / (n.nrm * cents.cn) AS sim
         |  FROM n, cents),
         |assigned AS (
         |  SELECT vec_id, idx AS cell FROM (
         |    SELECT vec_id, idx, row_number() OVER (
         |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
         |    FROM csims WHERE vec_id >= $NQueries) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS qid, idx AS cell FROM (
         |    SELECT vec_id, idx, row_number() OVER (
         |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
         |    FROM csims WHERE vec_id < $NQueries) WHERE rn <= 4),
         |cand AS (
         |  SELECT DISTINCT p.qid, a.vec_id AS vid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |  FROM probes p
         |  JOIN assigned a ON a.cell = p.cell AND a.vec_id != p.qid
         |  JOIN n q ON q.vec_id = p.qid
         |  JOIN n c ON c.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT qid, vid, sim,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY sim DESC, vid ASC)::INT AS rank
         |  FROM cand)
         |SELECT * FROM ranked WHERE rank <= $K""".stripMargin,
    // replay of annJoinTop1/TopK (shared CTE via annJoinOracle):
    // right-seeded centroids, right-side cell assignment, left-side
    // nProbe probes, rounded-sim ranking with the (sim DESC, rid ASC)
    // tie-break, cut at 1 / k
    // LEFT join from the full left-id domain: annJoinTop1 is total —
    // a left row with zero probed candidates emits a NULL match
    "ann_join_top1" ->
      s"""${annJoinOracle}SELECT l.vec_id AS lid, r.rid, r.sim
         |FROM (SELECT vec_id FROM n WHERE vec_id < 200) l
         |LEFT JOIN (SELECT lid, rid, sim FROM ranked WHERE rn = 1) r
         |  ON r.lid = l.vec_id""".stripMargin,
    "ann_join_topk" ->
      s"""${annJoinOracle}SELECT lid, rid, sim, rn::INT AS rank
         |FROM ranked WHERE rn <= 3""".stripMargin,
    // self-join replay of knnGraphClusters: same seeding/assignment/
    // probing CTE but over the WHOLE corpus (no 200 split), self
    // matches excluded, rank cut + threshold, mutuality as the
    // canonical-pair count, components via recursive min-label
    // reachability, singletons restored by the left join
    "dedup_knn_clusters" ->
      s"""WITH RECURSIVE $nCte,
         |cents AS (
         |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS idx,
         |         v AS cv, nrm AS cn
         |  FROM n ORDER BY vec_id LIMIT 16),
         |csims AS (
         |  SELECT n.vec_id, cents.idx,
         |         list_dot_product(n.v, cents.cv) / (n.nrm * cents.cn) AS sim
         |  FROM n, cents),
         |assigned AS (
         |  SELECT vec_id, idx AS cell FROM (
         |    SELECT vec_id, idx, row_number() OVER (
         |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
         |    FROM csims) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS lid, idx AS cell FROM (
         |    SELECT vec_id, idx, row_number() OVER (
         |             PARTITION BY vec_id ORDER BY sim DESC, idx DESC) AS rn
         |    FROM csims) WHERE rn <= 4),
         |cand AS (
         |  SELECT p.lid, a.vec_id AS rid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |  FROM probes p
         |  JOIN assigned a ON a.cell = p.cell AND a.vec_id != p.lid
         |  JOIN n q ON q.vec_id = p.lid
         |  JOIN n c ON c.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT lid, rid, sim, row_number() OVER (
         |           PARTITION BY lid ORDER BY sim DESC, rid ASC) AS rn
         |  FROM cand),
         |knn AS (SELECT lid, rid FROM ranked WHERE rn <= 3 AND sim >= 0.35),
         |canon AS (
         |  SELECT least(lid, rid) AS a, greatest(lid, rid) AS b FROM knn),
         |mutual AS (SELECT a, b FROM canon GROUP BY a, b HAVING count(*) = 2),
         |cedges AS (
         |  SELECT a AS u, b AS v FROM mutual
         |  UNION
         |  SELECT b, a FROM mutual),
         |reach(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges)
         |  UNION
         |  SELECT e.u, r.label FROM cedges e JOIN reach r ON e.v = r.u),
         |comp AS (SELECT u AS vid, min(label) AS cluster FROM reach GROUP BY u)
         |SELECT n.vec_id,
         |       coalesce(comp.cluster, n.vec_id) AS cluster,
         |       coalesce(comp.cluster, n.vec_id) = n.vec_id
         |         AS is_representative
         |FROM n LEFT JOIN comp ON comp.vid = n.vec_id""".stripMargin,
    "ann_pq_topk" -> pqOracle(m = 4, k = 16, dim = 64),
    "ann_ivfpq_topk" -> ivfPqOracle(nCentroids = 16, nProbe = 4,
      m = 4, k = 16, dim = 64),
    "ann_lsh_topk" -> lshOracle(bands = 8, bitsPerBand = 4, dim = 64,
      seed = 42L),
    "dedup_semantic_decontam" ->
      s"""WITH $nCte,
         |t AS (SELECT * FROM n WHERE (vec_id % 100) * 61 % 100 >= 90),
         |tr AS (SELECT * FROM n WHERE (vec_id % 100) * 61 % 100 < 80),
         |sims AS (
         |  SELECT t.vec_id AS qid, tr.vec_id AS vid,
         |         round(list_dot_product(t.v, tr.v) / (t.nrm * tr.nrm), 6)
         |           AS sim
         |  FROM t JOIN tr ON t.vec_id != tr.vec_id),
         |ranked AS (
         |  SELECT qid, vid, sim,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY sim DESC, vid ASC)::INT AS rank
         |  FROM sims)
         |SELECT * FROM ranked WHERE rank <= $K AND sim >= 0.35""".stripMargin,
    "ann_bruteforce_topk" ->
      s"""WITH $nCte,
         |sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |  FROM n q JOIN n c ON q.vec_id < $NQueries AND c.vec_id != q.vec_id),
         |ranked AS (
         |  SELECT qid, vid, sim,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY sim DESC, vid ASC)::INT AS rank
         |  FROM sims)
         |SELECT * FROM ranked WHERE rank <= $K""".stripMargin,
    "mine_hard_negatives" ->
      s"""WITH $nCte,
         |sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |  FROM n q JOIN n c ON q.vec_id < $NQueries AND c.vec_id != q.vec_id),
         |ranked AS (
         |  SELECT qid, vid, sim,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY sim DESC, vid ASC) AS rank
         |  FROM sims),
         |negs AS (
         |  SELECT r.qid, r.vid, r.sim, cl.label AS neg_label
         |  FROM ranked r
         |  JOIN embeddings ql ON r.qid = ql.vec_id
         |  JOIN embeddings cl ON r.vid = cl.vec_id
         |  WHERE r.rank <= $MineK AND ql.label != cl.label)
         |SELECT qid, vid, sim, neg_label,
         |       row_number() OVER (PARTITION BY qid
         |                          ORDER BY sim DESC, vid ASC)::INT AS neg_rank
         |FROM negs QUALIFY neg_rank <= $MineNeg""".stripMargin,
    "emb_cosine_pairs" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[],
         |                               embedding::DOUBLE[])) AS nrm
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $PairThreshold""".stripMargin)
}
