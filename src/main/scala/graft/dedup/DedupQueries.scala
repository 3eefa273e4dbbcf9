package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-contract registrations for near-dup detection over
  * `documents`. The exact n-gram Jaccard query and the MinHash-LSH
  * query share one oracle: LSH candidates are exact-verified, and at
  * 128 hashes / 32 bands the per-pair miss probability at j ≥ 0.8 is
  * < 5·10⁻⁸, so both produce the identical pair set on this data.
  * SimHash has no cross-engine hash parity → contract oracle
  * (recall/precision floors in its own bag-of-words feature space),
  * with exact pair semantics pinned by ScalaTest.
  */
object DedupQueries {

  private val N = 3
  private val Threshold = 0.8

  /** Temporal-proximity graph: events within one minute are linked
    * (cell-bucketed band join — never the quadratic cross join);
    * ordered (u < v) edge list, the contract the graph operators want.
    */
  private def temporalEdges(s: SparkSession, dir: String): DataFrame =
    graft.operators.BandJoin.bandPairs(
        graft.Tables.events(s, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us")),
        "event_id", "ts_us", 60000000L)
      .select(col("id_a").as("u"), col("id_b").as("v"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", N, Threshold)
        .select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard"))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text", N, Threshold)
        .select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard"))),
    // SimHash signatures have no cross-engine hash parity, so the
    // ORACLE checks the operator by CONTRACT (the a37/recall trick),
    // in simhash's own feature space (token bags, not shingles):
    //  · n_high_pairs: the 3-gram-Jaccard ≥ 0.9 truth-pair count —
    //    recomputed independently by DuckDB, so this cell is a real
    //    cross-engine number, not a literal;
    //  · recall_ok: simhash@hamming≤3 recovers ≥ half of those pairs
    //    (measured 17/25 at sf0.01 — banded 64-bit simhash is lossy on
    //    shingle-similarity by design, it hashes unigram bags);
    //  · precision_ok: every reported pair has exact UNIGRAM Jaccard
    //    ≥ 0.5 (measured min 0.9: a near-identical token bag in a
    //    different order is a true positive for THIS operator).
    // Exact pair rows stay pinned by DedupAnnSpec's planted-pair test.
    "dedup_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text")
      val high = Dedup.jaccardPairs(docs, "doc_id", "text", N, 0.9)
        .select(col("doc_a"), col("doc_b"))
      val nHigh = high.agg(count(lit(1)).as("n_high_pairs"))
      val nRecalled = high.join(pairs.select(col("doc_a"), col("doc_b")),
          Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_recalled"))
      val toks = docs.select(col("doc_id"),
        array_distinct(filter(split(trim(col("text")), "\\s+"),
          t => t =!= "")).as("w"))
      val uniJac = pairs
        .join(toks.select(col("doc_id").as("doc_a"), col("w").as("wa")),
          Seq("doc_a"))
        .join(toks.select(col("doc_id").as("doc_b"), col("w").as("wb")),
          Seq("doc_b"))
        .select((size(array_intersect(col("wa"), col("wb"))).cast("double") /
          (size(col("wa")) + size(col("wb")) -
            size(array_intersect(col("wa"), col("wb"))))).as("uj"))
        .agg(min(col("uj")).as("min_uj"))
      nHigh.crossJoin(nRecalled).crossJoin(uniJac)
        .select(col("n_high_pairs"),
          (col("n_recalled") >= col("n_high_pairs") * lit(0.5))
            .as("recall_ok"),
          (coalesce(col("min_uj"), lit(1.0)) >= lit(0.5))
            .as("precision_ok"))
    }),
    // Boilerplate span mining: 6-gram spans appearing in >= 3 docs
    // (the substring-level dedup signal near-dup pair search misses)
    "dedup_common_ngrams" -> ((s, dir) =>
      Dedup.commonNgrams(Tables.documents(s, dir), "doc_id", "text",
        n = 6, minDf = 3)),
    // Benchmark decontamination: train docs sharing a 13-gram with a
    // held-out test doc (split = the deterministic Knuth bucket). On
    // this corpus only the planted near-dup pairs collide at n=13 —
    // exactly the intended semantics
    "dedup_decontaminate" -> ((s, dir) =>
      Dedup.decontaminate(Tables.documents(s, dir), "doc_id", "text",
        n = 13)),
    // Per-test-doc 5-gram novelty census vs the train split (5 of the
    // 50 held-out docs at sf0.01 are partially seen — both directions
    // of the audit fire on the corpus)
    "dedup_novelty" -> ((s, dir) =>
      Dedup.noveltyProfile(Tables.documents(s, dir), "doc_id", "text",
        n = 5)),
    // The same census served from the PERSISTED gram index: built on
    // half the train split, grown to the full split by an O(delta)
    // append, then probed by the held-out docs — an appended index
    // must probe identically to a one-shot build AND to the corpus
    // co-scan above (the oracle is shared verbatim)
    "dedup_novelty_persisted" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val b = graft.functions.Binning.knuthBucket(col("doc_id"))
      val ix = s"/tmp/graft_novelty_ix-${ProcessHandle.current().pid()}"
      Boilerplate.gramIndexBuild(
        docs.filter(b < 80 && col("doc_id") < 250), "doc_id", "text",
        n = 5, ix)
      Boilerplate.gramIndexAppend(
        docs.filter(b < 80 && col("doc_id") >= 250), "doc_id", "text",
        n = 5, ix)
      // the probe plan reads the index lazily, so the scratch dir is
      // reclaimed at JVM exit rather than leaked one-per-process
      // (an eager checkpoint-then-delete was a measured ~0.6 s loss)
      org.apache.commons.io.FileUtils
        .forceDeleteOnExit(new java.io.File(ix))
      Boilerplate.noveltyFromIndex(s, docs.filter(b >= 90),
        "doc_id", "text", n = 5, ix)
    }),
    // Asymmetric containment (sub ⊆ super at 90% of the sub's
    // shingles) — the embedded-document signal Jaccard misses
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        N, 0.9)
        .select(col("doc_sub"), col("doc_super"),
          round(col("containment"), 6).as("containment"))),
    // Persisted band index (incremental corpus dedup): build on the
    // doc_id >= 300 slice, ingest 150 <= doc_id < 300 as an APPEND
    // (delta-only signature pass, existing rows untouched), then
    // near-dup-check the doc_id < 150 batch against the stored index.
    // Deterministic seed ⇒ the oracle replays the exact cross-slice
    // Jaccard; DedupSpec pins appended == single-build and probe ==
    // corpusAdmission recompute.
    // Index-maintenance lifecycle: batch build + two streaming-shaped
    // ingest partitions + COMPACTION (fold ingest partitions into the
    // batch partition, one file per band) — then the probe must return
    // exactly what the uncompacted index (and the exact cross-slice
    // Jaccard oracle) returns. Compaction is pure layout.
    "dedup_index_compacted" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ix = s"/tmp/graft_band_compact-${ProcessHandle.current().pid()}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ix))
      Dedup.bandIndexBuild(docs.filter(col("doc_id") >= 300),
        "doc_id", "text", N, ix)
      Dedup.bandIndexIngestBatch(
        docs.filter(col("doc_id") >= 150 && col("doc_id") < 225),
        "doc_id", "text", N, ix, batchId = 0)
      Dedup.bandIndexIngestBatch(
        docs.filter(col("doc_id") >= 225 && col("doc_id") < 300),
        "doc_id", "text", N, ix, batchId = 1)
      Dedup.bandIndexCompact(s, ix)
      Dedup.bandIndexProbe(docs.filter(col("doc_id") < 150),
        "doc_id", "text", N, ix, Threshold)
        .select(col("in_doc"), col("corpus_doc"),
          round(col("jaccard"), 6).as("jaccard"))
    }),
    "dedup_index_persisted" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ix = s"/tmp/graft_band_index-${ProcessHandle.current().pid()}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ix))
      Dedup.bandIndexBuild(docs.filter(col("doc_id") >= 300),
        "doc_id", "text", N, ix)
      Dedup.bandIndexAppend(
        docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
        "doc_id", "text", N, ix)
      Dedup.bandIndexProbe(docs.filter(col("doc_id") < 150),
        "doc_id", "text", N, ix, Threshold)
        .select(col("in_doc"), col("corpus_doc"),
          round(col("jaccard"), 6).as("jaccard"))
    }),
    "dedup_components" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          N, Threshold), "doc_a", "doc_b")),
    // Incremental component maintenance: labels built from the
    // doc_id >= 150 slice only, then the < 150 delta's new edges
    // (delta–delta and delta–corpus — what a band-index probe of the
    // delta yields) merged via componentsAppend. The ORACLE is the
    // full-graph recompute — bit-equality of incremental and scratch
    // labeling IS the contract.
    "dedup_components_incr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", N, Threshold)
      val oldLabels = Dedup.connectedComponents(
        Dedup.jaccardPairs(docs.filter(col("doc_id") >= 150), "doc_id",
          "text", N, Threshold), "doc_a", "doc_b")
      Dedup.componentsAppend(oldLabels,
        pairs.filter(col("doc_a") < 150 || col("doc_b") < 150),
        "doc_a", "doc_b")
    }),
    // SemDeDup-shaped semantic dedup: cosine near-dup search bounded
    // to Voronoi cells of the embedding space (the clusters cap the
    // quadratic; emb_cosine_pairs is the all-pairs exact form).
    // Deterministic first-N seeding ⇒ the oracle replays cell
    // assignment and the within-cell pair scan exactly.
    "dedup_semantic" -> ((s, dir) =>
      graft.similarity.Ann.semanticDedup(Tables.embeddings(s, dir),
        "vec_id", "embedding", nCells = 16, threshold = 0.35)),
    // PageRank over the near-dup graph (3 deterministic iterations —
    // the oracle unrolls them as CTE stages)
    "graph_pagerank" -> ((s, dir) =>
      graft.operators.Graph.pageRank(
        Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          N, Threshold), "doc_a", "doc_b", iters = 3)),
    // Triangle census over the temporal-proximity event graph (edges =
    // same-minute band pairs, found by the cell-bucketed band join —
    // never the quadratic cross join). Ordered ids u<v<w count each
    // wedge and each triangle exactly once; closing is a LEFT SEMI
    // probe of the wedge set against the edge set, so wedges never
    // multiply. One localCheckpoint because the edge set is referenced
    // three times (no exchange reuse across self-references).
    "graph_triangles" -> ((s, dir) =>
      graft.operators.Graph.triangleCensus(temporalEdges(s, dir))),
    // Link-prediction feature extraction over the same graph: for
    // every node pair sharing ≥1 neighbor, the common-neighbor count,
    // the Adamic–Adar score (Σ 1/ln deg(m) over shared neighbors m —
    // the classic degree-discounted evidence), and whether the pair
    // is already linked (the supervised target). All joins key on
    // node ids; the wedge join bounds candidate pairs to 2-hop
    // neighborhoods — never all-pairs.
    "graph_link_features" -> ((s, dir) =>
      graft.operators.Graph.linkFeatures(temporalEdges(s, dir))),
    // The full near-dup clustering pipeline: pairs → components →
    // per-cluster stats joined back to the corpus. The component label
    // IS the min doc id, so the canonical keeper is the row where
    // doc = component — no extra argmin pass needed.
    // The end-to-end corpus-curation pass as ONE declarative plan —
    // what a training-data pipeline actually ships at 100 TB: quality
    // gate (map-only, runs inside the scan) → near-dup components over
    // the SURVIVORS only → keep one doc per cluster (the component
    // label IS the min id — no argmin pass; docs outside the pair
    // graph keep themselves via the LEFT join) → growth-stable split →
    // per-split doc and token budgets. Composing the proven operators
    // stays a single lazy plan, so Catalyst prunes columns through the
    // whole chain.
    "pipeline_curation" -> ((s, dir) => {
      val kept = Tables.documents(s, dir)
        .filter(graft.text.Text.qualityScore(col("text")) >= 0.45)
      val comp = Dedup.connectedComponents(
        Dedup.jaccardPairs(kept, "doc_id", "text", N, Threshold),
        "doc_a", "doc_b")
      val b = graft.functions.Binning.knuthBucket(col("doc_id"))
      kept.join(comp, kept("doc_id") === comp("doc"), "left")
        .filter(col("component").isNull || col("component") === col("doc_id"))
        .withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.text.Text.tokenCount(col("text"))).as("ws_tokens"),
          sum(graft.text.Text.bpeTokenCount(col("text"))).as("bpe_tokens"))
    }),
    // The full training-data path as ONE declarative plan: quality
    // gate -> near-dup keeper -> PII redaction (planted PII, so the
    // scrub is non-vacuous) -> 64/16 context-window chunking ->
    // per-split chunk/token budgets + chunk-level dup signal. Every
    // stage is an operator proven by its own oracle; composition adds
    // no new shuffle beyond the dedup join and the final aggregate.
    "pipeline_curation_v2" -> ((s, dir) => {
      val kept = Tables.documents(s, dir)
        .filter(graft.text.Text.qualityScore(col("text")) >= 0.45)
      val comp = Dedup.connectedComponents(
        Dedup.jaccardPairs(kept, "doc_id", "text", N, Threshold),
        "doc_a", "doc_b")
      val keeper = kept
        .join(comp, kept("doc_id") === comp("doc"), "left")
        .filter(col("component").isNull || col("component") === col("doc_id"))
        .select(kept("doc_id"), kept("text"))
      val red = keeper.withColumn("text",
        graft.text.Text.piiRedact(graft.text.TextQueries.piiAugmented))
      val b = graft.functions.Binning.knuthBucket(col("doc_id"))
      graft.text.Text.chunkTokens(red, "doc_id", "text", 64, 16)
        .withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("n_tok")).as("chunk_tokens"),
          countDistinct(col("chunk_fp")).as("n_uniq_chunks"),
          // at 100 TB the exact distinct-chunk count is the one Expand
          // this plan pays; the sketch form below is the documented
          // swap-in (single pass, fixed memory, no Expand). Oracle
          // contract like a24: HLL++ default rsd 5%, 3×rsd envelope.
          (abs(approx_count_distinct(col("chunk_fp")) -
            countDistinct(col("chunk_fp"))) <=
            lit(0.15) * countDistinct(col("chunk_fp")))
            .as("uniq_chunks_within_bound"))
    }),
    // Curation v4: the end-to-end pass with the QUALITY-KEEPER policy —
    // quality gate → near-dup components over survivors → keep each
    // cluster's best-quality member (dedup_canonical_best's argmax,
    // where v1 kept the min-id label) → growth-stable split census.
    // Still one declarative plan; the keeper cut adds one aggregate +
    // one LEFT SEMI join over the gated slice, no window. min/max
    // quality per split are order-free aggregates (no float-sum
    // association hazard a mean would carry).
    "pipeline_curation_v4" -> ((s, dir) => {
      val q6 = round(graft.text.Text.qualityScore(col("text")), 6)
      val kept = Tables.documents(s, dir)
        .filter(graft.text.Text.qualityScore(col("text")) >= 0.45)
      val comp = Dedup.connectedComponents(
        Dedup.jaccardPairs(kept, "doc_id", "text", N, Threshold),
        "doc_a", "doc_b")
      val keepers = kept.select(col("doc_id"), q6.as("q"))
        .join(comp, col("doc_id") === comp("doc"), "left")
        .select(coalesce(col("component"), col("doc_id")).as("component"),
          col("doc_id"), col("q"))
        .groupBy(col("component"))
        .agg(max(struct(col("q"), (-col("doc_id")).as("nid"))).as("m"))
        .select((-col("m.nid")).as("keeper_id"))
      val b = graft.functions.Binning.knuthBucket(col("doc_id"))
      kept.join(keepers, kept("doc_id") === keepers("keeper_id"),
          "left_semi")
        .withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.text.Text.tokenCount(col("text"))).as("ws_tokens"),
          min(q6).as("min_quality"), max(q6).as("max_quality"))
    }),
    "dedup_cluster_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val comp = Dedup.connectedComponents(
        Dedup.jaccardPairs(docs, "doc_id", "text", N, Threshold),
        "doc_a", "doc_b")
      comp.join(docs, comp("doc") === docs("doc_id"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          max(when(col("doc") === col("component"), col("n_chars")))
            .as("keeper_chars"))
    }),
    // Quality-aware canonical selection: every near-dup cluster keeps
    // its HIGHEST-quality member (ties -> lower doc_id) instead of the
    // min-id one — the decision production curation passes actually
    // ship, since the min-id rule discards the best copy whenever a
    // duplicate family has one. Singletons (docs outside the pair
    // graph) keep themselves via the LEFT join. Keeper + census come
    // from ONE map-side-combined aggregate (argmax as max-of-struct,
    // the a19 idiom) — no window, no per-component sort, so a
    // mega-cluster costs its partial aggregates, never a single
    // task's sort buffer.
    "dedup_canonical_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val comp = Dedup.connectedComponents(
        Dedup.jaccardPairs(docs, "doc_id", "text", N, Threshold),
        "doc_a", "doc_b")
      canonicalOf(docs, comp)
    }),
    // Incremental canonical-keeper maintenance: the keeper table built
    // from the doc_id >= 150 slice only, then the < 150 delta folded
    // in via canonicalAppend — per-component argmax structs merge with
    // the delta docs' candidates, O(delta + touched), no old doc row
    // re-read. The ORACLE is the scratch full-corpus recompute:
    // bit-equality of incremental and scratch canonical tables IS the
    // contract (the dedup_components_incr pattern, one layer up).
    "dedup_canonical_incr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", N, Threshold)
      val oldDocs = docs.filter(col("doc_id") >= 150)
      val oldLabels = Dedup.connectedComponents(
        Dedup.jaccardPairs(oldDocs, "doc_id", "text", N, Threshold),
        "doc_a", "doc_b")
      val delta = docs.filter(col("doc_id") < 150)
        .select(col("doc_id"),
          round(graft.text.Text.qualityScore(col("text")), 6).as("q"))
      Dedup.canonicalAppend(canonicalOf(oldDocs, oldLabels), oldLabels,
        delta, "doc_id", "q",
        pairs.filter(col("doc_a") < 150 || col("doc_b") < 150),
        "doc_a", "doc_b")
    }))

  /** Scratch canonical build: score quality, then the shared
    * [[Dedup.canonicalTable]] argmax (the single keeper tie-break
    * definition).
    */
  private def canonicalOf(docs: DataFrame, comp: DataFrame): DataFrame =
    Dedup.canonicalTable(
      docs.select(col("doc_id"),
        round(graft.text.Text.qualityScore(col("text")), 6).as("q")),
      comp, "doc_id", "q")

  /** The exact-Jaccard pair SQL over an arbitrary source relation
    * (table name or CTE) — the curation oracle feeds it the
    * quality-filtered subset instead of the raw table.
    */
  private def jaccardOracleOver(src: String) =
    s"""WITH docs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
       |         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
       |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
       |                                   '\\s+'), t -> t != '') AS w
       |        FROM $src)),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
       |pairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b,
       |       round(inter::DOUBLE / (x.n + y.n - inter), 6) AS jaccard
       |FROM pairs
       |JOIN (SELECT doc_id, len(sh) AS n FROM docs) x ON da = x.doc_id
       |JOIN (SELECT doc_id, len(sh) AS n FROM docs) y ON db = y.doc_id
       |WHERE inter::DOUBLE / (x.n + y.n - inter) >= $Threshold""".stripMargin

  private val jaccardOracle = jaccardOracleOver("documents")

  /** Recursive min-label reachability over the full near-dup pair
    * graph — shared by the scratch labeling and its incremental twin
    * (whose contract is bit-equality with the scratch recompute).
    */
  private[graft] lazy val componentsOracle =
    s"""WITH RECURSIVE pairs AS ($jaccardOracle),
       |cedges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |reach(u, label) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges)
       |  UNION
       |  SELECT e.u, r.label FROM cedges e JOIN reach r ON e.v = r.u)
       |SELECT u AS doc, min(label) AS component
       |FROM reach GROUP BY u""".stripMargin

  /** Per-test-doc 5-gram novelty replay — shared by the corpus
    * co-scan, the persisted-index probe, and the streaming twin.
    */
  private[graft] lazy val noveltyOracle =
    """WITH toks AS (
      |  SELECT doc_id, (doc_id % 100) * 61 % 100 AS b,
      |         list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                     t -> t != '') AS w
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, b,
      |         unnest(list_distinct(list_transform(
      |           range(1, greatest(len(w) - 3, 1)),
      |           i -> list_aggregate(w[i:i+4], 'string_agg', ' ')))) AS g
      |  FROM toks WHERE len(w) >= 5),
      |tr AS (SELECT DISTINCT g FROM grams WHERE b < 80),
      |te AS (SELECT doc_id, g FROM grams WHERE b >= 90)
      |SELECT te.doc_id, count(*) AS n_grams,
      |       sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |         AS n_seen,
      |       round(1.0 - sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0
      |                       END)::DOUBLE / count(*), 6) AS novelty
      |FROM te LEFT JOIN tr ON te.g = tr.g
      |GROUP BY 1""".stripMargin

  /** Scratch canonical-selection replay: the component CTE chain of
    * [[componentsOracle]] + quality labeling + struct-max argmax —
    * shared by the scratch build and its incremental twin (whose
    * contract is bit-equality with this recompute).
    */
  private[graft] lazy val canonicalOracle =
    s"""WITH RECURSIVE pairs AS ($jaccardOracle),
       |cedges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |reach(u, label) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges)
       |  UNION
       |  SELECT e.u, r.label FROM cedges e JOIN reach r ON e.v = r.u),
       |comp AS (SELECT u AS doc, min(label) AS component
       |         FROM reach GROUP BY u),
       |lab AS (
       |  SELECT coalesce(c.component, d.doc_id) AS component,
       |         d.doc_id,
       |         round(${graft.text.TextQueries.qualitySql}, 6) AS q
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc)
       |SELECT component,
       |       (max({'q': q, 'nid': -doc_id})).nid * -1 AS keeper,
       |       (max({'q': q, 'nid': -doc_id})).q AS keeper_q,
       |       count(*) AS n_members
       |FROM lab GROUP BY 1""".stripMargin

  /** Cross-slice variant of [[jaccardOracleOver]]: exact Jaccard
    * between a probe slice and a corpus slice of `documents` — the ONE
    * replay every admission-shaped query shares (dedup_index_persisted,
    * s11, s16), so a tokenization/shingle fix lands everywhere at once.
    */
  private[graft] def crossJaccardOracle(probePred: String,
                                        corpusPred: String,
                                        threshold: Double): String =
    s"""WITH docs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
       |         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
       |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
       |                                   '\\s+'), t -> t != '') AS w
       |        FROM documents)),
       |inx AS (SELECT doc_id, unnest(sh) AS s FROM docs WHERE $probePred),
       |cx AS (SELECT doc_id, unnest(sh) AS s FROM docs WHERE $corpusPred),
       |pairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |  FROM inx a JOIN cx b ON a.s = b.s
       |  GROUP BY 1, 2)
       |SELECT da AS in_doc, db AS corpus_doc,
       |       round(inter::DOUBLE / (x.n + y.n - inter), 6) AS jaccard
       |FROM pairs
       |JOIN (SELECT doc_id, len(sh) AS n FROM docs) x ON da = x.doc_id
       |JOIN (SELECT doc_id, len(sh) AS n FROM docs) y ON db = y.doc_id
       |WHERE inter::DOUBLE / (x.n + y.n - inter) >= $threshold""".stripMargin

  private val pagerankOracle = {
    def round(prev: String, cur: String) =
      s"""c$cur AS (
         |  SELECT e.v AS u, sum(r.rank / d.deg) AS inr
         |  FROM cedges e
         |  JOIN r$prev r ON e.u = r.u
         |  JOIN deg d ON e.u = d.u
         |  GROUP BY 1),
         |r$cur AS (
         |  SELECT nodes.u,
         |         (1 - 0.85) / nn.n + 0.85 * coalesce(c$cur.inr, 0) AS rank
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN c$cur ON nodes.u = c$cur.u)""".stripMargin
    s"""WITH pairs AS ($jaccardOracle),
       |cedges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT u, count(*) AS deg FROM cedges GROUP BY 1),
       |nodes AS (SELECT DISTINCT u FROM cedges),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
       |r0 AS (SELECT u, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
       |${round("0", "1")},
       |${round("1", "2")},
       |${round("2", "3")}
       |SELECT u AS node, round(rank, 8) AS rank FROM r3""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "dedup_ngram_jaccard" -> jaccardOracle,
    // replays semanticDedup: first-16 centroid seeding, max-cosine
    // cell assignment (ties → larger index, matching Spark's
    // struct-max), within-cell pairs at cos >= 0.35, keeper = min
    // lower-id collision (same CTE skeleton as the ann_ivf oracle)
    "dedup_semantic" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[],
        |                               embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
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
        |pairs AS (
        |  SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos
        |  FROM assigned a
        |  JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  JOIN n x ON x.vec_id = a.vec_id
        |  JOIN n y ON y.vec_id = b.vec_id)
        |SELECT id_b AS doc, any_value(cell)::INT AS cell,
        |       min(id_a) AS keeper, max(cos) AS max_cosine,
        |       count(*)::BIGINT AS n_collisions
        |FROM pairs WHERE cos >= 0.35
        |GROUP BY id_b""".stripMargin,
    "dedup_common_ngrams" ->
      """WITH docs AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
        |                             '\s+'), t -> t != '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |           range(1, len(w) - 4),
        |           i -> concat_ws(' ', w[i], w[i+1], w[i+2],
        |                          w[i+3], w[i+4], w[i+5])))) AS ngram
        |  FROM docs)
        |SELECT ngram, count(*) AS df, min(doc_id) AS first_doc
        |FROM grams GROUP BY 1 HAVING count(*) >= 3""".stripMargin,
    "dedup_containment" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
        |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
        |                                   '\s+'), t -> t != '') AS w
        |        FROM documents)),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS doc_sub, db AS doc_super,
        |       round(inter::DOUBLE / x.n, 6) AS containment
        |FROM pairs
        |JOIN (SELECT doc_id, len(sh) AS n FROM docs) x ON da = x.doc_id
        |WHERE inter::DOUBLE / x.n >= 0.9""".stripMargin,
    "dedup_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, (doc_id % 100) * 61 % 100 AS b,
        |         list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                     t -> t != '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, b,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(w) - 11, 1)),
        |           i -> list_aggregate(w[i:i+12], 'string_agg', ' ')))) AS g
        |  FROM toks WHERE len(w) >= 13)
        |SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
        |       count(*) AS n_shared
        |FROM grams tr JOIN grams te ON tr.g = te.g
        |WHERE tr.b < 80 AND te.b >= 90
        |GROUP BY 1, 2""".stripMargin,
    // string grams in the oracle vs xxhash64 grams in the plan — the
    // decontaminate contract (exact modulo 2^-64 collisions); novelty
    // ranks on counts of the same distinct sets
    "dedup_novelty" -> noveltyOracle,
    // index-served probe ≡ corpus co-scan (and appended ≡ one-shot):
    // the oracle is the same replay, verbatim
    "dedup_novelty_persisted" -> noveltyOracle,
    "dedup_minhash_lsh" -> jaccardOracle,
    // exact cross-slice Jaccard between the probe batch and the
    // indexed corpus (build slice + appended delta) — at 128/32
    // banding the j >= 0.8 miss probability is < 5e-8, so the banded
    // probe and the exact pair set coincide (same argument as
    // dedup_minhash_lsh / s11)
    "dedup_index_persisted" ->
      crossJaccardOracle("doc_id < 150", "doc_id >= 150", Threshold),
    // compaction is layout-only: the probe replay is identical
    "dedup_index_compacted" ->
      crossJaccardOracle("doc_id < 150", "doc_id >= 150", Threshold),
    // contract oracle (see the query's comment): the truth-pair count
    // is DuckDB-recomputed; the recall/precision cells are literal
    "dedup_simhash" ->
      s"""WITH pairs AS (${jaccardOracleOver("documents")})
         |SELECT count(*)::BIGINT AS n_high_pairs,
         |       TRUE AS recall_ok, TRUE AS precision_ok
         |FROM pairs WHERE jaccard >= 0.9""".stripMargin,
    "pipeline_curation_v2" -> {
      import graft.text.{Text, TextQueries}
      s"""WITH RECURSIVE kept AS (
         |  SELECT * FROM documents
         |  WHERE (${TextQueries.qualitySql}) >= 0.45),
         |pairs AS (${jaccardOracleOver("kept")}),
         |cedges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs),
         |reach(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges)
         |  UNION
         |  SELECT e.u, r.label FROM cedges e JOIN reach r ON e.v = r.u),
         |comp AS (SELECT u AS doc, min(label) AS component
         |         FROM reach GROUP BY u),
         |keeper AS (
         |  SELECT kept.doc_id, kept.text FROM kept
         |  LEFT JOIN comp ON kept.doc_id = comp.doc
         |  WHERE comp.component IS NULL OR comp.component = kept.doc_id),
         |red AS (
         |  SELECT doc_id,
         |         regexp_replace(regexp_replace(regexp_replace(
         |           ${TextQueries.augSql},
         |           '${Text.emailRe}', '<EMAIL>', 'g'),
         |           '${Text.ipv4Re}', '<IP>', 'g'),
         |           '${Text.phoneRe}', '<PHONE>', 'g') AS rt
         |  FROM keeper),
         |toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(rt),
         |           '\\s+'), t -> t != '') AS w
         |  FROM red),
         |st AS (SELECT doc_id, w,
         |              unnest(generate_series(1, len(w), 48)) AS s
         |       FROM toks WHERE len(w) > 0),
         |ch AS (SELECT doc_id, s, w[s : least(s + 63, len(w))] AS c
         |       FROM st WHERE s = 1 OR len(w) >= s + 16)
         |SELECT CASE WHEN (doc_id % 100) * 61 % 100 < 80 THEN 'train'
         |            WHEN (doc_id % 100) * 61 % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       count(DISTINCT doc_id) AS n_docs,
         |       count(*) AS n_chunks,
         |       sum(len(c))::BIGINT AS chunk_tokens,
         |       count(DISTINCT md5(array_to_string(c, ' ')))
         |         AS n_uniq_chunks,
         |       TRUE AS uniq_chunks_within_bound
         |FROM ch GROUP BY 1""".stripMargin
    },
    "graph_pagerank" -> pagerankOracle,
    "pipeline_curation_v4" -> {
      import graft.text.TextQueries
      val toksSql =
        """list_filter(regexp_split_to_array(trim(text), '\s+'),
          |                     t -> t != '')""".stripMargin
      s"""WITH RECURSIVE kept AS (
         |  SELECT * FROM documents
         |  WHERE (${TextQueries.qualitySql}) >= 0.45),
         |pairs AS (${jaccardOracleOver("kept")}),
         |cedges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs),
         |reach(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges)
         |  UNION
         |  SELECT e.u, r.label FROM cedges e JOIN reach r ON e.v = r.u),
         |comp AS (SELECT u AS doc, min(label) AS component
         |         FROM reach GROUP BY u),
         |lab AS (
         |  SELECT coalesce(c.component, k.doc_id) AS component,
         |         k.doc_id,
         |         round(${TextQueries.qualitySql}, 6) AS q
         |  FROM kept k LEFT JOIN comp c ON k.doc_id = c.doc),
         |keepers AS (
         |  SELECT (max({'q': q, 'nid': -doc_id})).nid * -1 AS keeper_id
         |  FROM lab GROUP BY component),
         |sel AS (
         |  SELECT kept.* FROM kept
         |  JOIN keepers ON kept.doc_id = keepers.keeper_id)
         |SELECT CASE WHEN (doc_id % 100) * 61 % 100 < 80 THEN 'train'
         |            WHEN (doc_id % 100) * 61 % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       sum(len($toksSql))::BIGINT AS ws_tokens,
         |       min(round(${TextQueries.qualitySql}, 6)) AS min_quality,
         |       max(round(${TextQueries.qualitySql}, 6)) AS max_quality
         |FROM sel GROUP BY 1""".stripMargin
    },
    "pipeline_curation" -> {
      val toksSql =
        """list_filter(regexp_split_to_array(trim(text), '\s+'),
          |                     t -> t != '')""".stripMargin
      val bpePat = graft.text.Text.BpePattern.replace("'", "''")
      s"""WITH RECURSIVE kept AS (
         |  SELECT * FROM documents
         |  WHERE (${graft.text.TextQueries.qualitySql}) >= 0.45),
         |pairs AS (${jaccardOracleOver("kept")}),
         |cedges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs),
         |reach(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges)
         |  UNION
         |  SELECT e.u, r.label FROM cedges e JOIN reach r ON e.v = r.u),
         |comp AS (SELECT u AS doc, min(label) AS component
         |         FROM reach GROUP BY u),
         |keeper AS (
         |  SELECT kept.* FROM kept
         |  LEFT JOIN comp ON kept.doc_id = comp.doc
         |  WHERE comp.component IS NULL OR comp.component = kept.doc_id)
         |SELECT CASE WHEN (doc_id % 100) * 61 % 100 < 80 THEN 'train'
         |            WHEN (doc_id % 100) * 61 % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       sum(len($toksSql))::BIGINT AS ws_tokens,
         |       sum(len(regexp_extract_all(text, '$bpePat')))::BIGINT
         |         AS bpe_tokens
         |FROM keeper GROUP BY 1""".stripMargin
    },
    "dedup_components" -> componentsOracle,
    // incremental == scratch is the contract, so the oracle IS the
    // full-graph recompute, verbatim
    "dedup_components_incr" -> componentsOracle,
    // same component CTE chain as componentsOracle; keeper = argmax by
    // (q, -doc_id) as max-of-struct, replayed with DuckDB's struct max
    // (both engines compare struct fields left-to-right). q is rounded
    // to 6 decimals BEFORE ranking on both sides, so a last-ULP flip
    // cannot reorder a tie the other engine breaks by doc_id.
    "dedup_canonical_best" -> canonicalOracle,
    // incremental == scratch is the contract (the components_incr
    // pattern, one layer up), so the oracle IS the full recompute
    "dedup_canonical_incr" -> canonicalOracle,
    "graph_link_features" ->
      """WITH e AS (
        |  SELECT a.event_id AS u, b.event_id AS v
        |  FROM events a JOIN events b
        |    ON a.event_id < b.event_id
        |   AND b.ts::TIMESTAMP >= a.ts::TIMESTAMP - INTERVAL 1 MINUTE
        |   AND b.ts::TIMESTAMP <= a.ts::TIMESTAMP + INTERVAL 1 MINUTE),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u, count(*) AS d FROM und GROUP BY 1),
        |cand AS (
        |  SELECT n1.u AS a, n2.u AS b, n1.v AS m
        |  FROM und n1 JOIN und n2 ON n1.v = n2.v AND n1.u < n2.u),
        |feat AS (
        |  SELECT a, b, count(*) AS cn,
        |         round(sum(1.0 / ln(d.d)), 6) AS adamic_adar
        |  FROM cand JOIN deg d ON cand.m = d.u
        |  GROUP BY 1, 2)
        |SELECT a, b, cn, adamic_adar,
        |       EXISTS (SELECT 1 FROM e WHERE e.u = feat.a AND e.v = feat.b)
        |         AS linked
        |FROM feat""".stripMargin,
    "graph_triangles" ->
      """WITH e AS (
        |  SELECT a.event_id AS u, b.event_id AS v
        |  FROM events a JOIN events b
        |    ON a.event_id < b.event_id
        |   AND b.ts::TIMESTAMP >= a.ts::TIMESTAMP - INTERVAL 1 MINUTE
        |   AND b.ts::TIMESTAMP <= a.ts::TIMESTAMP + INTERVAL 1 MINUTE),
        |w AS (SELECT e1.u, e1.v, e2.v AS w
        |      FROM e e1 JOIN e e2 ON e1.v = e2.u),
        |t AS (SELECT * FROM w
        |      WHERE EXISTS (SELECT 1 FROM e
        |                    WHERE e.u = w.u AND e.v = w.w))
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |       (SELECT count(*) FROM w) AS n_wedges,
        |       (SELECT count(*) FROM t) AS n_triangles,
        |       round((SELECT count(*) FROM t)::DOUBLE
        |             / (SELECT count(*) FROM w), 6) AS closure_rate""".stripMargin,
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE pairs AS ($jaccardOracle),
         |cedges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs),
         |reach(u, label) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM cedges)
         |  UNION
         |  SELECT e.u, r.label FROM cedges e JOIN reach r ON e.v = r.u),
         |comp AS (
         |  SELECT u AS doc, min(label) AS component
         |  FROM reach GROUP BY u)
         |SELECT component, count(*) AS n_docs,
         |       count(DISTINCT lang) AS n_langs,
         |       sum(n_chars)::BIGINT AS total_chars,
         |       max(CASE WHEN doc = component THEN n_chars END)
         |         AS keeper_chars
         |FROM comp JOIN documents ON doc = doc_id
         |GROUP BY 1""".stripMargin)
}
