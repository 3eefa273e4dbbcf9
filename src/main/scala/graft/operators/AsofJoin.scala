package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the most recent
  * right row with `right.ts <= left.ts` for the same key — the
  * operator behind "state of X as of this event" joins that Spark has
  * no built-in for.
  *
  * Implementation is the scalable union-and-carry formulation: tag
  * both sides, union, and per key carry the last right-side payload
  * forward with `last(_, ignoreNulls) over (rows unbounded preceding ..
  * current)`. One shuffle + one sort per key — crucially NOT the
  * O(left × right-per-key) blowup of an inequality range join, and no
  * per-key state bounded by time. Right rows sort before left rows at
  * equal timestamps, giving inclusive (`<=`) semantics identical to
  * DuckDB/kdb ASOF JOIN (oracle-checked).
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry; emitted as
    *                  `asof_<name>` (null when no right row precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__r_$c")): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(col("*") +: valueCols.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c")): _*)
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
