package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** As-of (point-in-time) join: attach to each left row the nearest
  * right row for the same key — backward (`right.ts <= left.ts`,
  * most recent at-or-before; the DuckDB/kdb ASOF JOIN) or forward
  * (`right.ts >= left.ts`, earliest at-or-after), optionally bounded
  * by a staleness tolerance — the full pandas `merge_asof` surface.
  *
  * Implementation is the scalable union-and-carry formulation: tag
  * both sides, union, and per key carry the last right-side payload
  * forward with `last(_, ignoreNulls) over (rows unbounded preceding ..
  * current)` under (ts asc) for backward / (ts desc) for forward.
  * One shuffle + one sort per key — crucially NOT the
  * O(left × right-per-key) blowup of an inequality range join. Right
  * rows sort before left rows at equal timestamps, giving inclusive
  * semantics identical to DuckDB/kdb ASOF JOIN (oracle-checked).
  *
  * The whole right payload travels as ONE nullable struct (with the
  * matched right timestamp), so (a) a right row whose payload columns
  * are all NULL still wins over older rows (struct non-null ⇒ row
  * exists), (b) multiple `valueCols` always come from the SAME right
  * row — never stitched across rows, and (c) the tolerance check
  * compares against the actual matched timestamp.
  *
  * Caveats vs SQL equality semantics: NULL keys group together (SQL
  * `l.k = r.k` would never match them) — filter them out beforehand if
  * that matters; and if several right rows share (key, ts), the pick
  * among them is tie-ordered by the carry, so deduplicate the right
  * side per (key, ts) for deterministic results. With a tolerance on
  * TIMESTAMP_NTZ columns the delta is computed after a cast to
  * session-zone TIMESTAMP (exact except across a DST discontinuity).
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry; emitted as
    *                  `asof_<name>` (all null when no right row
    *                  qualifies).
    * @param direction "backward" (default; nearest at-or-before) or
    *                  "forward" (nearest at-or-after).
    * @param toleranceUs maximum |left.ts − matched.ts| in microseconds
    *                  (timestamp columns) or plain units (numeric
    *                  columns); matches further away become NULL.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String], direction: String = "backward",
               toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    require(toleranceUs.forall(_ >= 0), "tolerance must be non-negative")
    val reserved = Seq("__side", "__r", "__asof")
    for (c <- reserved; side <- Seq("left" -> left, "right" -> right)
         if side._2.columns.contains(c))
      throw new IllegalArgumentException(
        s"asofJoin reserves column name '$c'; rename it in the ${side._1} input")
    require(!valueCols.contains("__ts"),
      "asofJoin reserves the payload field name '__ts'")
    for (c <- valueCols if left.columns.contains(s"asof_$c"))
      throw new IllegalArgumentException(
        s"output column 'asof_$c' collides with an existing left column; " +
          "rename it in the left input")
    val leftCols = left.columns.toSeq
    val otherLeft = leftCols.filterNot(c => c == key || c == ts)
    val payloadType = StructType(
      valueCols.map(c => right.schema(c)) :+ right.schema(ts).copy(name = "__ts"))
    val lTagged = left
      .select(Seq(col(key), col(ts), lit(1).as("__side")) ++
        otherLeft.map(col) :+
        lit(null).cast(payloadType).as("__r"): _*)
    val rTagged = right
      // SQL ASOF never matches a NULL right timestamp; without this
      // filter a null ts would sort first and its payload would leak
      .filter(col(ts).isNotNull)
      .select(Seq(col(key), col(ts), lit(0).as("__side")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col) :+ col(ts).as("__ts"): _*).as("__r"): _*)
    // backward: ascending ts, carry last-at-or-before; forward:
    // descending ts, carry last-at-or-after. Right (side 0) sorts
    // before left at equal ts either way → inclusive bounds. NULLS
    // FIRST: a left row with NULL ts must sort before every right row
    // (all right ts are non-null here) so the carry sees no payload and
    // yields NULL — ASOF semantics never match a null timestamp.
    val tsOrd =
      if (direction == "backward") col(ts).asc_nulls_first else col(ts).desc_nulls_first
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = toleranceUs match {
      case None => col("__asof")
      case Some(tol) =>
        val delta = tsDelta(col(ts), col("__asof").getField("__ts"),
          right.schema(ts).dataType)
        when(col("__asof").isNotNull && abs(delta) <= tol, col("__asof"))
    }
    carried.select(leftCols.map(col) ++ valueCols.map(c =>
      matched.getField(c).as(s"asof_$c")): _*)
  }

  private def tsDelta(a: Column, b: Column,
                      dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case TimestampType => unix_micros(a) - unix_micros(b)
      case TimestampNTZType =>
        unix_micros(a.cast(TimestampType)) - unix_micros(b.cast(TimestampType))
      case _ => a - b
    }
}
