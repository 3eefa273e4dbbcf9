package graft.tools
import org.apache.spark.sql.functions._
object ProfS30 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.jobs.Jobs.localBuilder("prof-s30", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    val work = s"/tmp/prof_s30-${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    // simulate the 4 micro-batches synchronously with per-stage timing
    val nb = 4
    docs.count() // warm
    for (b <- 0 until nb) {
      val batch = docs.filter(pmod(col("doc_id"), lit(nb)) === b)
      var t0 = System.nanoTime()
      val edges = graft.dedup.Dedup.bandIndexIngestProbeBatch(batch,
          "doc_id", "text", 3, s"$work/ix", b, 0.8)
        .filter(col("in_doc") =!= col("corpus_doc"))
        .select(least(col("in_doc"), col("corpus_doc")).as("a"),
          greatest(col("in_doc"), col("corpus_doc")).as("b"))
        .distinct().localCheckpoint(true)
      val tProbe = (System.nanoTime()-t0)/1e9
      val delta = batch.select(col("doc_id").cast("long").as("doc"),
        round(graft.text.Text.qualityScore(col("text")), 6).as("q"))
      t0 = System.nanoTime()
      graft.dedup.Dedup.curationMerge(s"$work/cur", edges, delta,
        "doc", "q", "a", "b", 16, pairsPinned = true)
      val tMerge = (System.nanoTime()-t0)/1e9
      println(f"[prof] batch=$b probe=$tProbe%.2f merge=$tMerge%.2f")
    }
    spark.stop(); sys.exit(0)
  }
}
