package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture between two snapshots of a keyed table:
  * per-key `op` ∈ {insert, delete, update}, the names of changed
  * columns, and old/new values side by side. Unchanged keys are
  * dropped — the output IS the minimal change set that replays
  * snapshot A into snapshot B (what an incremental pipeline ships
  * downstream instead of the full table; the complement of
  * `io.IdempotentBatchSink`'s replay story and the input shape
  * `Scd2.applyUpdates` consumes).
  *
  * Semantics: keys are equi-joined (full outer); value columns are
  * compared null-safely (`<=>`), so NULL → value and value → NULL are
  * updates listing that column, NULL → NULL is equal. `changed` lists
  * the differing columns uniformly — for inserts and deletes that is
  * every column that is non-null on the present side — as a
  * comma-joined string in the caller's column order (deterministic,
  * oracle-expressible as `concat_ws` of per-column CASEs).
  *
  * Scale shape: one co-partitioned shuffle join keyed on the pk —
  * both sides hash-partition by the same key, no broadcast needed,
  * no skew (pks are unique per side by contract). Snapshots stored
  * bucketed by pk diff with ZERO exchanges. The change set is
  * typically ≪ |snapshot|, so everything downstream of the join is
  * cheap; nothing here ever collects or widens.
  */
object Cdc {

  /** @param keys primary-key columns (non-null, unique per snapshot).
    * Value columns = the non-key columns of `newDf`, which must exist
    * in `oldDf` with compatible types. Output: keys, `op`, `changed`,
    * then `old_<c>`/`new_<c>` per value column.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val valueCols = newDf.columns.filterNot(keys.contains).toSeq
    for (c <- valueCols)
      require(oldDf.columns.contains(c), s"old snapshot lacks column '$c'")
    for (c <- valueCols ++ keys)
      require(!c.startsWith("__present"),
        s"snapshotDiff reserves the '__present*' names; rename '$c'")
    for (v <- valueCols; p <- Seq("old_", "new_"))
      require(!keys.contains(p + v),
        s"key '${p + v}' collides with the renamed output of value column '$v'")
    // value columns named op/changed are fine (they emit as old_op/
    // new_op); only a KEY would clash with the op/changed outputs
    for (r <- Seq("op", "changed"))
      require(!keys.contains(r),
        s"snapshotDiff reserves output column name '$r'; rename the key")
    def tag(df: DataFrame, side: String) =
      df.select(keys.map(col) ++ valueCols.map(c => col(c).as(s"${side}_$c")) :+
        lit(true).as(s"__present_$side"): _*)
    val joined = tag(oldDf, "old")
      .join(tag(newDf, "new"), keys, "full_outer")
    val diff: Column = valueCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    val op = when(col("__present_old").isNull, "insert")
      .when(col("__present_new").isNull, "delete")
      .otherwise("update")
    val changed = concat_ws(",", valueCols.map(c =>
      when(!(col(s"old_$c") <=> col(s"new_$c")), c)): _*)
    joined
      .filter(col("__present_old").isNull || col("__present_new").isNull || diff)
      .select(keys.map(col) ++ Seq(op.as("op"), changed.as("changed")) ++
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
