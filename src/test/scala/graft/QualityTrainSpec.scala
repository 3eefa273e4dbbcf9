package graft

import org.apache.spark.sql.functions._
import graft.text.{QualityModel, Text}

/** In-engine classifier training: differential against a sequential
  * in-memory reference of the same quantized GD, and the training
  * actually helps (log-loss drops from the w=0 starting point).
  */
class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sequential replay of QualityModel.train's quantized GD on plain
    * Scala collections — no Spark, no SQL.
    */
  private def referenceTrain(docs: Seq[(String, Double)], steps: Int,
                             lr: Double): (IndexedSeq[Double], Double) = {
    val slotted = docs.map { case (text, y) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val slots = toks.map { t =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(md5.take(8), 16) %
          QualityModel.Buckets).toInt
      }
      (slots.toSeq, y)
    }.filter(_._1.nonEmpty)
    val nd = slotted.size.toDouble
    var w = IndexedSeq.fill(QualityModel.Buckets)(0.0)
    var b = 0.0
    for (_ <- 1 to steps) {
      val errs = slotted.map { case (slots, y) =>
        val z = b + slots.map(w).sum / slots.size
        (slots, round6(1.0 / (1.0 + math.exp(-z))) - y)
      }
      val grad = Array.fill(QualityModel.Buckets)(0.0)
      errs.foreach { case (slots, err) =>
        val g = round6(err / slots.size)
        slots.foreach(s => grad(s) += g)
      }
      val bg = errs.map { case (_, err) => round6(err) }.sum
      w = w.indices.map(j => round6(w(j) - lr * grad(j) / nd))
      b = round6(b - lr * bg / nd)
    }
    (w, b)
  }

  test("distributed quantized GD equals the sequential reference") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "spark table join filter agg window batch merge value row",
      "a a a a a", "one two three four five six seven eight nine ten",
      "data quality model training loss gradient descent step value",
      "short", "the the the the the the the the",
      "mixed bag of words with the usual suspects in a line")
    val labeled = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = labeled.toDF("doc_id", "text")
    val y = texts.map(t => if (referenceQuality(t) >= 0.45) 1.0 else 0.0)
    val (w, b) = QualityModel.train(df, "text", steps = 3, lr = 1.0)
    val (wr, br) = referenceTrain(texts.zip(y), steps = 3, lr = 1.0)
    assert(b == br, s"bias: engine $b vs reference $br")
    assert(w == wr, "weight vectors must match slot-for-slot")
  }

  /** Plain-Scala mirror of Text.qualityScore for the reference labels. */
  private def referenceQuality(text: String): Double = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val punct = if (text.nonEmpty)
      text.count(".!?,;:".contains(_)).toDouble / text.length else 0.0
    val stop = Text.enStop ++ Text.ptStop ++ Text.esStop
    val stopR = if (toks.nonEmpty)
      toks.count(stop.contains).toDouble / toks.length else 0.0
    0.4 * math.min(1.0, toks.length / 100.0) + 0.3 * (1.0 - punct) +
      0.3 * stopR
  }

  test("training lowers log-loss vs the zero-weight start") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (w, b) = QualityModel.train(docs, "text",
      graft.text.HybridQueries.TrainSteps, graft.text.HybridQueries.TrainLr)
    val y = (Text.qualityScore(col("text")) >= 0.45).cast("double")
    val p = QualityModel.scoreWith(col("text"), w, b)
    val eps = 1e-9
    val loss = docs.filter(size(Text.tokens(lower(col("text")))) > 0)
      .select(avg(-(y * log(p + eps) +
        (lit(1.0) - y) * log(lit(1.0) - p + eps))).as("ll"))
      .head().getDouble(0)
    // w = 0, b = 0 predicts p = 0.5 everywhere: log-loss exactly ln 2
    assert(loss < math.log(2.0),
      s"3 GD steps must beat the uninformed ln(2) baseline, got $loss")
  }
}
