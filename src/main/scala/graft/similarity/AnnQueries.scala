package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-contract registrations for similarity search over the
  * `embeddings` table. Exact variants (brute-force top-k, all-pairs
  * cosine) are oracle-checked: ranks order by cosine rounded to 6
  * decimals with id tiebreak, so ordering is reproducible across
  * engines. The LSH variant is approximate by construction → no oracle
  * entry (rows-only driver check) + ScalaTest recall assertions.
  */
object AnnQueries {

  private val K = 5
  private val NQueries = 8
  private val PairThreshold = 0.45

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.bruteForceTopK(emb.filter(col("vec_id") < NQueries), emb,
        "vec_id", "embedding", K)
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
    "emb_cosine_pairs" -> ((s, dir) =>
      Ann.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        PairThreshold)))

  val oracleSql: Map[String, String] = Map(
    "ann_bruteforce_topk" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[],
         |                               embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
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
