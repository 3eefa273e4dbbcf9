package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Binds the driver's star schema (TESTDATA.md) to the banking data model
  * so the reference pipeline runs — and is DuckDB-oracle-checkable — on
  * /root/testdata. Pure deterministic integer/string arithmetic only, so
  * the oracle SQL can derive the exact same inputs.
  *
  *  - events   → transaction stream (event_type plays modalidade)
  *  - customer → usuarios dim (per-modality limits derived from acctbal)
  *  - nation   → regioes dim (synthetic lat/lon from the nation key)
  */
object TestdataAdapter {

  def transactions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id").cast("string").as("id_transacao"),
      col("user_id").cast("string").as("id_usuario_pagador"),
      col("user_id").cast("string").as("id_usuario_recebedor"),
      (col("event_id") % 25).cast("string").as("id_regiao"),
      col("event_type").as("modalidade_pagamento"),
      col("ts").as("data_horario"),
      col("value").as("valor_transacao"))

  def users(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").cast("string").as("id_usuario"),
      col("c_nationkey").cast("string").as("id_regiao"),
      col("c_acctbal").as("saldo"),
      (lit(100.0) + col("c_acctbal")).as("limite_PIX"),
      (lit(200.0) + col("c_acctbal")).as("limite_TED"),
      (lit(50.0) + col("c_acctbal")).as("limite_DOC"),
      (lit(150.0) + col("c_acctbal")).as("limite_Boleto"))

  def regions(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(
      col("n_nationkey").cast("string").as("id_regiao"),
      ((col("n_nationkey") * 37) % 180 - 90).cast("double").as("latitude"),
      ((col("n_nationkey") * 91) % 360 - 180).cast("double").as("longitude"))

  /** Matching DuckDB CTEs for the three adapted inputs. */
  val oracleCtes: String =
    """tx AS (
      |  SELECT CAST(event_id AS VARCHAR) AS id_transacao,
      |         CAST(user_id AS VARCHAR) AS id_usuario_pagador,
      |         CAST(user_id AS VARCHAR) AS id_usuario_recebedor,
      |         CAST(event_id % 25 AS VARCHAR) AS id_regiao,
      |         event_type AS modalidade_pagamento,
      |         ts AS data_horario,
      |         value AS valor_transacao
      |  FROM events),
      |users AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS id_usuario,
      |         CAST(c_nationkey AS VARCHAR) AS id_regiao,
      |         c_acctbal AS saldo,
      |         100.0 + c_acctbal AS limite_PIX,
      |         200.0 + c_acctbal AS limite_TED,
      |         50.0 + c_acctbal AS limite_DOC,
      |         150.0 + c_acctbal AS limite_Boleto
      |  FROM customer),
      |regions AS (
      |  SELECT CAST(n_nationkey AS VARCHAR) AS id_regiao,
      |         CAST((n_nationkey * 37) % 180 - 90 AS DOUBLE) AS latitude,
      |         CAST((n_nationkey * 91) % 360 - 180 AS DOUBLE) AS longitude
      |  FROM nation)""".stripMargin
}
