package graft

import org.apache.spark.sql.functions._

/** The pure-SQL user surface: a reference user's dashboards speak SQL
  * (its analytics layer is SQL views over the sink tables), so every
  * major query family must be expressible as literal `spark.sql` text
  * over registered views and agree with the DataFrame formulation.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def view(name: String): Unit =
    Tables.load(spark, dir, name).createOrReplaceTempView(s"sql_$name")

  test("warehouse agg as literal SQL == DataFrame formulation (q1 shape)") {
    view("lineitem")
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
        |         AS sum_base_price,
        |       count(*) AS n
        |FROM sql_lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-09-01'
        |GROUP BY 1, 2""".stripMargin)
    val df = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1999-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .as("sum_base_price"),
        count(lit(1)).as("n"))
    assert(sql.collect().toSet == df.collect().toSet)
  }

  test("window ranking as literal SQL == DataFrame formulation") {
    view("orders")
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC,
        |                                         o_orderkey ASC) AS rn
        |      FROM sql_orders)
        |WHERE rn <= 2""".stripMargin)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    assert(sql.collect().toSet == df.collect().toSet)
    // and the row_number-filter pattern still rewrites onto the TopK
    // operator when it comes in through the SQL front door
    assert(sql.queryExecution.optimizedPlan.toString.contains("TopKNode"),
      "SQL-path row_number()<=k must hit TopKRewriteRule too:\n" +
        sql.queryExecution.optimizedPlan)
  }

  test("a31 array semantics: nations is a sorted array<string> per region") {
    // the registered query projects through to_json so the driver's
    // pandas comparator can hash it; the ArrayType form is the real
    // operator semantics and is pinned here
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val arr = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_sort(collect_set(col("n_name"))).as("nations"))
    assert(arr.schema("nations").dataType == ArrayType(StringType, false))
    val rows = arr.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val ns = r.getSeq[String](1)
      assert(ns == ns.sorted && ns.distinct == ns,
        s"per-group member list must be sorted and distinct: $ns")
    }
    // and the registered to_json projection round-trips to the same list
    val viaJson = SparkEntry.queries("a31_nations_per_region")(spark, dir)
      .select(col("r_name"), from_json(col("nations"),
        ArrayType(StringType)).as("nations"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      assert(viaJson(r.getString(0)) == r.getSeq[String](1))
    }
  }

  test("injected native function works from literal SQL over a view") {
    view("embeddings")
    val r = spark.sql(
      """SELECT vec_id,
        |       round(graft_dot_d(CAST(embedding AS ARRAY<DOUBLE>),
        |                         CAST(embedding AS ARRAY<DOUBLE>)), 6) AS nrm2
        |FROM sql_embeddings ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    assert(r.length == 3 && r.forall(_.getDouble(1) > 0))
  }
}
