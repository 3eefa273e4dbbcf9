package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Scoring

/** The reference's core dataflow (containers/spark-etl/streaming_etl.py)
  * re-expressed as pure `DataFrame => DataFrame` stages. Each stage works
  * identically on a batch or streaming DataFrame — the property that lets
  * one codepath replace both `streaming_etl.py` and `src/teste.py`
  * (SURVEY.md §7.1 step 3).
  *
  * Scale notes (100 TB): dims are broadcast (27 regions / 10k–10M users
  * stay far under executor memory); the fact stream never shuffles —
  * the whole scoring pass is map-only, so it scales linearly with
  * executors and partitions. No driver-side collects anywhere.
  */
object ScoringPipeline {

  /** Transaction event schema (streaming_etl.py:23-31). */
  val transactionSchema: StructType = StructType(Seq(
    StructField("id_transacao", StringType),
    StructField("id_usuario_pagador", StringType),
    StructField("id_usuario_recebedor", StringType),
    StructField("id_regiao", StringType),
    StructField("modalidade_pagamento", StringType),
    StructField("data_horario", TimestampType),
    StructField("valor_transacao", DoubleType)))

  /** Decode stage (P1–P5, T2): raw kafka-shaped rows (binary `value`,
    * `timestamp`) → typed transaction columns + processing stamp +
    * watermark. streaming_etl.py:51-62.
    */
  def decode(raw: DataFrame, watermark: String = "10 minutes"): DataFrame =
    raw
      .select(
        col("value").cast("string").as("json_value"),
        col("timestamp").as("tempo_entrada_kafka"))
      .select(
        from_json(col("json_value"), transactionSchema).as("dados"),
        col("tempo_entrada_kafka"))
      .select(col("dados.*"), col("tempo_entrada_kafka"))
      .withColumn("tempo_inicio_processamento", current_timestamp())
      .withWatermark("data_horario", watermark)
      .withColumnRenamed("id_regiao", "id_regiao_transacao")

  /** Enrich stage (J1/J2): tx ⟕ users (payer) ⟕ regions(tx) ⟕ regions(payer).
    * Dims are explicitly broadcast — with 27-row / dim-scale right sides a
    * broadcast-hash join keeps the fact side shuffle-free at any scale.
    * streaming_etl.py:90-112.
    */
  def enrich(tx0: DataFrame, users: DataFrame, regions: DataFrame): DataFrame = {
    // Accept both decoded-stream input (already renamed) and plain batch
    // input with the wire-format `id_regiao` column (src/teste.py path).
    val tx = if (tx0.columns.contains("id_regiao_transacao")) tx0
             else tx0.withColumnRenamed("id_regiao", "id_regiao_transacao")
    val u = users.select(
      col("id_usuario"), col("id_regiao").as("id_regiao_usuario"),
      col("saldo"), col("limite_PIX"), col("limite_TED"),
      col("limite_DOC"), col("limite_Boleto"))
    val rT = regions.select(
      col("id_regiao").as("id_regiao_transacao"),
      col("latitude").as("latitude_transacao"),
      col("longitude").as("longitude_transacao"))
    val rU = regions.select(
      col("id_regiao").as("id_regiao_usuario"),
      col("latitude").as("latitude_usuario"),
      col("longitude").as("longitude_usuario"))
    tx.join(broadcast(u), tx("id_usuario_pagador") === u("id_usuario"), "left")
      .join(broadcast(rT), Seq("id_regiao_transacao"), "left")
      .join(broadcast(rU), Seq("id_regiao_usuario"), "left")
  }

  /** Banking modality → limit-column dispatch (streaming_etl.py:137-149).
    * DOC is the `otherwise` arm, as in the reference.
    */
  val bankingLimitArms: Seq[(String, String)] = Seq(
    "PIX" -> "limite_PIX", "TED" -> "limite_TED",
    "Boleto" -> "limite_Boleto", "DOC" -> "limite_DOC")

  /** Score + gate stage (P6–P13), production semantics:
    * product score combine, strict-< limit gate, NOT(>6) score gate.
    * `limitArms` maps modality value → limit column; last arm is the
    * `otherwise` branch.
    */
  def score(df: DataFrame,
            limitArms: Seq[(String, String)] = bankingLimitArms): DataFrame = {
    val t5 = Scoring.euclideanDegrees(
      col("latitude_transacao"), col("longitude_transacao"),
      col("latitude_usuario"), col("longitude_usuario"))
    val scored = df
      .withColumn("t5_score", t5)
      .withColumn("t6_score", Scoring.thresholdScore(col("valor_transacao")))
      .withColumn("t7_score", Scoring.hourScore(col("data_horario")))
      .withColumn("score_medio", Scoring.scoreCombineProduct(
        col("t5_score"), col("t6_score"), col("t7_score")))
      .withColumn("score_aprovado", Scoring.scoreGate(col("score_medio")))
      .withColumn("saldo_aprovado",
        Scoring.balanceGate(col("saldo"), col("valor_transacao")))
      .withColumn("limite_aprovado", Scoring.limitGate(
        col("modalidade_pagamento"), col("valor_transacao"),
        limitArms.map { case (m, c) => m -> col(c) }))
    scored.withColumn("transacao_aprovada", Scoring.approved(
      col("score_aprovado"), col("saldo_aprovado"), col("limite_aprovado")))
  }

  /** Shape stage (P14/P15): final projection + latency telemetry.
    * streaming_etl.py:156-175.
    */
  def shape(df: DataFrame): DataFrame =
    df.withColumn("tempo_saida_resultado", current_timestamp())
      .withColumn("latencia_total_ms", Scoring.latencySecondsAsMs(
        col("tempo_saida_resultado"), col("tempo_entrada_kafka")))
      .withColumn("tempo_processamento_ms", Scoring.latencySecondsAsMs(
        col("tempo_saida_resultado"), col("tempo_inicio_processamento")))
      .select(
        col("id_transacao"), col("id_usuario_pagador"),
        col("id_usuario_recebedor"),
        col("id_regiao_transacao").as("id_regiao"),
        col("modalidade_pagamento"), col("data_horario"),
        col("valor_transacao"),
        col("t5_score"), col("t6_score"), col("t7_score"),
        col("score_medio"), col("transacao_aprovada"),
        col("tempo_entrada_kafka"), col("tempo_inicio_processamento"),
        col("tempo_saida_resultado"),
        col("latencia_total_ms"), col("tempo_processamento_ms"))

  /** Full pipeline on already-decoded transaction rows (batch path,
    * src/teste.py semantics but single-pass column-wise).
    */
  def run(tx: DataFrame, users: DataFrame, regions: DataFrame,
          limitArms: Seq[(String, String)] = bankingLimitArms): DataFrame =
    shape(score(enrich(tx, users, regions), limitArms))

  /** Deterministic variant of the pipeline for testing/oracles: no
    * wall-clock columns, no telemetry — just scores and gates.
    */
  def runDeterministic(tx: DataFrame, users: DataFrame, regions: DataFrame,
                       limitArms: Seq[(String, String)] = bankingLimitArms): DataFrame =
    score(enrich(tx, users, regions), limitArms)
      .select(
        col("id_transacao"), col("id_usuario_pagador"),
        col("id_regiao_transacao").as("id_regiao"),
        col("modalidade_pagamento"), col("data_horario"),
        col("valor_transacao"),
        col("t5_score"), col("t6_score"), col("t7_score"),
        col("score_medio"),
        col("score_aprovado"), col("saldo_aprovado"), col("limite_aprovado"),
        col("transacao_aprovada"))
}
