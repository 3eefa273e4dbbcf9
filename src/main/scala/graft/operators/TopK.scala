package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Per-key top-k as a two-phase bounded-heap operator.
  *
  * Honest comparison with the built-in formulation
  * (`row_number().over(Window.partitionBy(keys).orderBy(...)) <= k`):
  * since 3.5, Spark plans that as Sort → WindowGroupLimit(Partial) →
  * Exchange → Sort → WindowGroupLimit(Final) → Window → Filter —
  * i.e. it ALSO prunes to ≤ k·keys·partitions rows before the
  * shuffle, but only after FULLY SORTING each input partition
  * (O(n log n) per partition, spill-eligible). This operator replaces
  * that pre-shuffle sort with bounded per-key heaps: O(n log k) work,
  * O(heapKeys·k) memory, no sort buffer over the input — the same
  * shuffle volume for strictly less map-side work. Post-shuffle both
  * sort only the pruned survivors.
  *
  * Results are identical to the window formulation with explicit
  * nulls-LAST ordering (`desc` / `asc_nulls_last`) — tested
  * differentially; note Spark's bare `asc` defaults to nulls FIRST,
  * which this operator deliberately does not reproduce. Pass tiebreak
  * columns for a total order, as you would for a deterministic window.
  */
object TopK {

  /** @param orderCols (column, ascending) lexicographic sort spec;
    *                  columns must be Comparable (numeric, string,
    *                  timestamp, ...). Nulls sort last.
    * @param maxHeapKeys phase-1 memory bound: at most this many per-key
    *                  heaps are held per input partition (≈ maxHeapKeys·k
    *                  rows). Rows for keys beyond the bound stream through
    *                  unpruned — correct (phase 2 is exact) but unpruned,
    *                  so high-cardinality keys degrade gracefully to the
    *                  shuffle-then-sort plan instead of OOMing.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
                 orderCols: Seq[(String, Boolean)], k: Int,
                 rankCol: String = "rank",
                 maxHeapKeys: Int = 100000): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty && k > 0)
    val schema = df.schema
    require(!schema.fieldNames.contains(rankCol),
      s"input already has a '$rankCol' column; pass a different rankCol")
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val ordIdx = orderCols.map { case (c, asc) => (schema.fieldIndex(c), asc) }.toArray

    // lexicographic "is a better than b" under the requested directions
    def better(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < ordIdx.length) {
        val (idx, asc) = ordIdx(i)
        val (x, y) = (a.get(idx), b.get(idx))
        val c =
          if (x == null && y == null) 0
          else if (x == null) 1 // nulls last regardless of direction
          else if (y == null) -1
          else {
            val cmp = x.asInstanceOf[Comparable[Any]].compareTo(y)
            if (asc) cmp else -cmp
          }
        if (c != 0) return c < 0
        i += 1
      }
      false
    }
    val rowOrd: Ordering[Row] = (a: Row, b: Row) =>
      if (better(a, b)) -1 else if (better(b, a)) 1 else 0

    // Phase 1 map-side prune: per key a bounded "worst-first" heap of
    // the best k seen. The heap map itself is bounded by maxHeapKeys —
    // once exceeded, rows of unseen keys are emitted IMMEDIATELY
    // (never buffered), so memory stays O(maxHeapKeys · k) rows even
    // on a partition of entirely distinct keys; heap survivors follow
    // once the input is exhausted. Exact either way — phase 2 ranks
    // after a full sort.
    def prunePartition(rows: Iterator[Row]): Iterator[Row] = {
      val heaps = mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[Row]]
      val passthrough = rows.flatMap { r =>
        val key = keyIdx.map(r.get).toSeq
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < k) h.enqueue(r)
            else if (better(r, h.head)) { h.dequeue(); h.enqueue(r) }
            Iterator.empty
          case None if heaps.size < maxHeapKeys =>
            val h = mutable.PriorityQueue.empty[Row](rowOrd) // max = worst first
            h.enqueue(r)
            heaps.put(key, h)
            Iterator.empty
          case None => Iterator.single(r)
        }
      }
      passthrough ++ heaps.valuesIterator.flatMap(_.iterator)
    }

    val enc = Encoders.row(schema)
    val outSchema = StructType(schema.fields :+
      StructField(rankCol, IntegerType, nullable = false))
    val outEnc = Encoders.row(outSchema)
    // Phase 2 is fully streaming: survivors are hash-partitioned by key
    // and sorted (spillable external sort) by (key, order); ranks then
    // fall out of a single forward pass — no per-partition
    // materialization, so post-shuffle memory is O(1) rows.
    val sortCols = keys.map(c => col(c).asc) ++ orderCols.map { case (c, asc) =>
      if (asc) col(c).asc_nulls_last else col(c).desc_nulls_last
    }
    df.mapPartitions(prunePartition _)(enc)                       // phase 1
      .repartition(keys.map(col): _*)                             // ≤ k·keys·P rows
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { rows =>                                    // phase 2
        var curKey: Seq[Any] = null
        var rank = 0
        rows.flatMap { r =>
          val key = keyIdx.map(r.get).toSeq
          if (key != curKey) { curKey = key; rank = 0 }
          rank += 1
          if (rank <= k) Iterator.single(Row.fromSeq(r.toSeq :+ rank))
          else Iterator.empty
        }
      }(outEnc)
  }
}
