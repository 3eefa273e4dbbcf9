package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: attach to each left row the most recent
  * right row with `right.ts <= left.ts` for the same key — the
  * operator behind "state of X as of this event" joins that Spark has
  * no built-in for.
  *
  * Implementation is the scalable union-and-carry formulation: tag
  * both sides, union, and per key carry the last right-side payload
  * forward with `last(_, ignoreNulls) over (rows unbounded preceding ..
  * current)`. One shuffle + one sort per key — crucially NOT the
  * O(left × right-per-key) blowup of an inequality range join. Right
  * rows sort before left rows at equal timestamps, giving inclusive
  * (`<=`) semantics identical to DuckDB/kdb ASOF JOIN (oracle-checked).
  *
  * The whole right payload travels as ONE nullable struct, so (a) a
  * right row whose payload columns are all NULL still wins over older
  * rows (struct non-null ⇒ row exists), and (b) multiple `valueCols`
  * always come from the SAME right row — never stitched across rows.
  *
  * Caveats vs SQL equality semantics: NULL keys group together (SQL
  * `l.k = r.k` would never match them) — filter them out beforehand if
  * that matters; and if several right rows share (key, ts), the pick
  * among them is tie-ordered by the carry, so deduplicate the right
  * side per (key, ts) for deterministic results.
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry; emitted as
    *                  `asof_<name>` (all null when no right row is at
    *                  or before the left row's timestamp).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val reserved = Seq("__side", "__r", "__asof")
    for (c <- reserved; side <- Seq("left" -> left, "right" -> right)
         if side._2.columns.contains(c))
      throw new IllegalArgumentException(
        s"asofJoin reserves column name '$c'; rename it in the ${side._1} input")
    for (c <- valueCols if left.columns.contains(s"asof_$c"))
      throw new IllegalArgumentException(
        s"output column 'asof_$c' collides with an existing left column; " +
          "rename it in the left input")
    val leftCols = left.columns.toSeq
    val otherLeft = leftCols.filterNot(c => c == key || c == ts)
    val payloadType = StructType(valueCols.map(c => right.schema(c)))
    val lTagged = left
      .select(Seq(col(key), col(ts), lit(1).as("__side")) ++
        otherLeft.map(col) :+
        lit(null).cast(payloadType).as("__r"): _*)
    val rTagged = right
      // SQL ASOF never matches a NULL right timestamp (r.ts <= l.ts is
      // never true); without this filter a null ts would sort first
      // (asc nulls-first) and its payload would leak into every row
      .filter(col(ts).isNotNull)
      .select(Seq(col(key), col(ts), lit(0).as("__side")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c =>
        col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
