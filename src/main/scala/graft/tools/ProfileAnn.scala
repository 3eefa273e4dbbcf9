package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Ann

/** Dev-only: phase timings for the IVF ANN path (tiny data, so any
  * cost here is plan/codegen/job overhead, not compute).
  * Usage: runMain graft.tools.ProfileAnn <sfDir>
  */
object ProfileAnn {
  import Profile.time

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    time("embeddings count")(emb.count())
    for (rep <- 1 to 3) {
      val e2 = Tables.embeddings(spark, dir)
      time(s"rep$rep ivfTopK full")(
        Ann.ivfTopK(e2.filter(col("vec_id") < 8), e2,
          "vec_id", "embedding", 5).count())
    }
    // phase split: seeding collect vs the rest
    val e3 = Tables.embeddings(spark, dir)
    val prep = e3.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val cents = time("seeding collect")(
      prep.orderBy(col("vid")).limit(16).collect()
        .map(_.getSeq[Double](1).toSeq).toSeq)
    graft.functions.VectorExprs.register(spark)
    def sims(v: org.apache.spark.sql.Column) =
      transform(typedlit(cents), (c, i) => struct(
        (graft.similarity.Ann.dot(v, c) /
          (sqrt(graft.similarity.Ann.dot(v, v)) *
            sqrt(graft.similarity.Ann.dot(c, c)))).as("sim"), i.as("idx")))
    time("assign only")(
      prep.withColumn("cell", array_max(sims(col("v"))).getField("idx"))
        .groupBy("cell").count().collect())
    time("probe explode only")(
      prep.filter(col("vid") < 8)
        .select(col("vid"), explode(slice(sort_array(sims(col("v")), asc = false),
          1, 4).getField("idx")).as("cell")).count())
    spark.stop()
  }
}
