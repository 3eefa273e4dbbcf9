package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Dev-only stage profiler: times individual pieces of the heavy
  * pairwise operators so optimization is measurement-driven.
  * Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir).cache()
    time("docs count")(docs.count())

    graft.functions.TextHashing.register(spark)
    val sh = docs.select(col("doc_id").as("doc"),
      graft.functions.TextHashing.ngramHashes(col("text"), 3).as("hs"))
    time("hashed shingles")(
      sh.select(sum(size(col("hs")))).collect())

    val ex = sh.select(col("doc"), explode(col("hs")).as("h"))
    time("explode count")(ex.count())

    time("jaccardPairs full")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count())

    time("minhash signatures")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 3, 128).count())

    time("minhashLshPairs full")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8).count())

    time("simhashPairs full")(
      Dedup.simhashPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
