package graft

import org.apache.spark.sql.functions._
import graft.functions.{Binning, Scoring}

/** Unit tests for the scalar scoring/gating expressions, pinning the
  * reference's semantics discrepancies (SURVEY.md §7.4): product-form
  * score combine, strict-< limit gate, NOT(>6) score gate boundaries.
  */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("t6 threshold score: strict > 2000") {
    val got = Seq(1999.99, 2000.0, 2000.01).toDF("v")
      .select(Scoring.thresholdScore(col("v")).as("t6"))
      .as[Double].collect()
    assert(got.toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("t7 hour score: (hour-12)/12, negative mornings") {
    val got = Seq("2024-01-01 00:30:00", "2024-01-01 12:00:00",
      "2024-01-01 23:59:59").toDF("s")
      .select(Scoring.hourScore(to_timestamp(col("s"))).as("t7"))
      .as[Double].collect()
    assert(got(0) == -1.0 && got(1) == 0.0 && got(2) == (23 - 12) / 12.0)
  }

  test("score gate: approve unless score_medio > 6 (6.0 approves)") {
    val got = Seq(5.9, 6.0, 6.000001).toDF("s")
      .select(Scoring.scoreGate(col("s")).as("ok")).as[Boolean].collect()
    assert(got.toSeq == Seq(true, true, false))
  }

  test("limit gate: strict <, dispatch by modality, last arm = otherwise") {
    val rows = Seq(
      ("PIX", 99.0, true), ("PIX", 100.0, false), // strict <
      ("TED", 150.0, true), ("Boleto", 250.0, true),
      ("DOC", 49.0, true), ("DOC", 50.0, false),
      ("UNKNOWN", 10.0, true) // falls to DOC arm
    ).toDF("mod", "v", "want")
    val limits = Seq("PIX" -> lit(100.0), "TED" -> lit(200.0),
      "Boleto" -> lit(300.0), "DOC" -> lit(50.0))
    val got = rows.select(col("want"),
      Scoring.limitGate(col("mod"), col("v"), limits).as("got"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (want, g) => assert(g == want) }
  }

  test("product score combine and conjunction null propagation") {
    val df = Seq((2.0, 1.0, 0.5)).toDF("t5", "t6", "t7")
      .select(Scoring.scoreCombineProduct(col("t5"), col("t6"), col("t7")).as("p"),
        Scoring.scoreCombineMean(col("t5"), col("t6"), col("t7")).as("m"))
    val (p, m) = df.as[(Double, Double)].head()
    assert(p == (2.0 * 1.0 * 0.5) / 3.0 && m == (2.0 + 1.0 + 0.5) / 3.0)

    // null AND false = false; null AND true = null (SQL 3-valued logic)
    val nulls = Seq((Some(true), None: Option[Boolean], Some(false)),
      (Some(true), None, Some(true)))
      .toDF("a", "b", "c")
      .select(Scoring.approved(col("a"), col("b"), col("c")).as("ok"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(nulls.toSeq == Seq(Some(false), None))
  }

  test("haversine: known distance Lisbon->Madrid ~503 km") {
    val km = Seq((38.7223, -9.1393, 40.4168, -3.7038))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(Scoring.haversineKm(col("lat1"), col("lon1"),
        col("lat2"), col("lon2")).as("km")).as[Double].head()
    assert(math.abs(km - 503) < 3)
  }

  test("binning cut: right-closed pd.cut semantics, null below/at lo") {
    val got = Seq(0.0, 0.5, 100.0, 100.5, 2000.0).toDF("v")
      .select(Binning.cut(col("v"), Seq(0.0, 100.0, 1000.0),
        Seq("lo", "hi", "open")).as("bin"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(None, Some("lo"), Some("lo"), Some("hi"),
      Some("open")))
  }

  test("widthBucket: below->0, at/above hi->n+1, edges") {
    val got = Seq(-1.0, 0.0, 99.9, 100.0, 999.9, 1000.0).toDF("v")
      .select(Binning.widthBucket(col("v"), 0, 1000, 10).as("b"))
      .as[Int].collect()
    assert(got.toSeq == Seq(0, 1, 1, 2, 10, 11))
  }

  test("frequency score 3-way select") {
    val got = Seq(1, 3, 4, 10, 11).toDF("f")
      .select(Scoring.frequencyScore(col("f")).as("s")).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 0.0, 0.5, 0.5, 1.0))
  }

  test("latency: seconds-as-ms reference parity and true ms") {
    val df = Seq(("2024-01-01 00:00:01.500", "2024-01-01 00:00:00.000"))
      .toDF("e", "s")
      .select(to_timestamp(col("e")).as("e"), to_timestamp(col("s")).as("s"))
    val secs = df.select(Scoring.latencySecondsAsMs(col("e"), col("s")))
      .as[Long].head()
    val ms = df.select(Scoring.latencyTrueMs(col("e"), col("s")))
      .as[Long].head()
    assert(secs == 1L && ms == 1500L)
  }
}
