package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{ScoringPipeline, TestdataAdapter}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a named operator/query from the SURVEY.md
  * §2 inventory (or the LLM-pipeline extension set), expressed over the
  * driver's parquet tables; [[oracleSql]] carries the DuckDB-equivalent
  * SQL. Column names and value rounding match on both sides by
  * construction (the driver hash-compares after sorting columns by name).
  */
object SparkEntry {

  /** Modality→limit dispatch for the events-shaped stream: the testdata
    * `event_type` values play the banking modalities; `signup`/`view`
    * fall to the otherwise arm (as DOC does in the reference).
    */
  private val eventLimitArms = Seq(
    "click" -> "limite_PIX", "purchase" -> "limite_TED",
    "error" -> "limite_Boleto", "signup" -> "limite_DOC")

  /** Flagship: the full fraud-scoring pipeline (decode→enrich→score),
    * deterministic projection, on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    pipelineScore(spark, "/root/testdata/sf0.001")

  private def pipelineScore(s: SparkSession, dir: String): DataFrame = {
    val out = ScoringPipeline.runDeterministic(
      TestdataAdapter.transactions(s, dir),
      TestdataAdapter.users(s, dir),
      TestdataAdapter.regions(s, dir),
      eventLimitArms)
    out.select(
      col("id_transacao"), col("id_usuario_pagador"), col("id_regiao"),
      col("modalidade_pagamento"),
      date_trunc("second", col("data_horario")).as("data_horario"),
      col("valor_transacao"),
      round(col("t5_score"), 6).as("t5_score"),
      col("t6_score"),
      round(col("t7_score"), 6).as("t7_score"),
      round(col("score_medio"), 6).as("score_medio"),
      col("score_aprovado"), col("saldo_aprovado"), col("limite_aprovado"),
      col("transacao_aprovada"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- the reference's core dataflow, end-to-end (P1-P15, J1/J2) ----
    "pipeline_score" -> ((s, dir) => pipelineScore(s, dir)),

    // ---- A1: count by boolean flag ----
    "a1_count_by_flag" -> ((s, dir) => {
      val out = ScoringPipeline.runDeterministic(
        TestdataAdapter.transactions(s, dir),
        TestdataAdapter.users(s, dir),
        TestdataAdapter.regions(s, dir),
        eventLimitArms)
      out.groupBy(col("transacao_aprovada")).agg(count(lit(1)).as("n"))
    }),

    // ---- J2/A6-ish: star join + agg (lineitem⋈orders⋈customer⋈nation⋈region) ----
    "j2_star_join_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
    }),

    // ---- A12/W3: hourly tumbling rollup on the event stream ----
    "a12_hourly_rollup" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hora"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))),

    // ---- K1/W4: top-N most recent events (recency view) ----
    "k1_topn_recent" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), date_trunc("second", col("ts")).as("ts_s"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("ts_s").desc, col("event_id").desc)
        .limit(100)))

  def oracleSql: Map[String, String] = {
    val ctes = TestdataAdapter.oracleCtes
    val scoredSql =
      s"""WITH $ctes,
         |enriched AS (
         |  SELECT t.*, u.saldo, u.limite_PIX, u.limite_TED, u.limite_DOC,
         |         u.limite_Boleto,
         |         rt.latitude AS lat_t, rt.longitude AS lon_t,
         |         ru.latitude AS lat_u, ru.longitude AS lon_u
         |  FROM tx t
         |  LEFT JOIN users u ON t.id_usuario_pagador = u.id_usuario
         |  LEFT JOIN regions rt ON t.id_regiao = rt.id_regiao
         |  LEFT JOIN regions ru ON u.id_regiao = ru.id_regiao),
         |scored AS (
         |  SELECT *,
         |    sqrt((lat_t - lat_u)*(lat_t - lat_u) + (lon_t - lon_u)*(lon_t - lon_u)) AS t5_score,
         |    CASE WHEN valor_transacao > 2000 THEN 1.0 ELSE 0.0 END AS t6_score,
         |    (EXTRACT(hour FROM data_horario) - 12) / 12.0 AS t7_score
         |  FROM enriched),
         |gated AS (
         |  SELECT *,
         |    (t5_score * t6_score * t7_score) / 3.0 AS score_medio,
         |    NOT ((t5_score * t6_score * t7_score) / 3.0 > 6.0) AS score_aprovado,
         |    saldo > valor_transacao AS saldo_aprovado,
         |    CASE WHEN modalidade_pagamento = 'click' THEN valor_transacao < limite_PIX
         |         WHEN modalidade_pagamento = 'purchase' THEN valor_transacao < limite_TED
         |         WHEN modalidade_pagamento = 'error' THEN valor_transacao < limite_Boleto
         |         ELSE valor_transacao < limite_DOC END AS limite_aprovado
         |  FROM scored)
         |SELECT id_transacao, id_usuario_pagador, id_regiao,
         |       modalidade_pagamento,
         |       date_trunc('second', data_horario) AS data_horario,
         |       valor_transacao,
         |       round(t5_score, 6) AS t5_score, t6_score,
         |       round(t7_score, 6) AS t7_score,
         |       round(score_medio, 6) AS score_medio,
         |       score_aprovado, saldo_aprovado, limite_aprovado,
         |       (score_aprovado AND saldo_aprovado AND limite_aprovado)
         |         AS transacao_aprovada
         |FROM gated""".stripMargin
    Map(
      "pipeline_score" -> scoredSql,
      "a1_count_by_flag" ->
        s"""WITH base AS ($scoredSql)
           |SELECT transacao_aprovada, count(*) AS n
           |FROM base GROUP BY 1""".stripMargin,
      "j2_star_join_agg" ->
        """SELECT r_name, n_name, count(*) AS n_rows,
          |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name, n_name""".stripMargin,
      "a12_hourly_rollup" ->
        """SELECT date_trunc('hour', ts) AS hora, count(*) AS n,
          |       round(avg(value), 4) AS avg_value
          |FROM events GROUP BY 1""".stripMargin,
      "k1_topn_recent" ->
        """SELECT event_id, date_trunc('second', ts) AS ts_s, user_id,
          |       event_type, value
          |FROM events
          |ORDER BY ts_s DESC, event_id DESC LIMIT 100""".stripMargin)
  }
}
