package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout expressions for write-side clustering.
  *
  * Z-ordering (Morton curve) interleaves the bits of two sort keys so
  * that sorting by the single z-value co-locates rows that are close
  * in BOTH dimensions. Written that way (with bounded file sizes),
  * min/max column statistics become selective for range predicates on
  * EITHER column — the reader skips files/row-groups for both, where a
  * plain lexicographic sort only prunes its leading column. This is
  * the OPTIMIZE ZORDER capability of lakehouse table formats,
  * expressed as a pure Catalyst expression: `sortWithinPartitions` /
  * `orderBy` on [[zValue]] at write time, nothing at read time.
  *
  * Pure integer bit arithmetic (shifts, masks, or) — deterministic,
  * codegen'd, and replayable bit-for-bit by the DuckDB oracle.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: result bit 2i is bit i of `x`, bit 2i+1 is bit i of `y`.
    * Values are masked to `bits` first, so out-of-range inputs degrade
    * to their low bits rather than corrupting neighbors' ordering.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(mask)
    val ym = y.cast("long").bitwiseAND(mask)
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }
}
