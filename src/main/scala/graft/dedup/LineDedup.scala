package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact dedup across the corpus (the RefinedWeb-style
  * boilerplate pass): every non-blank line keeps exactly one canonical
  * occurrence — the (doc_id, position)-least one — and all other
  * instances are marked removable. Emitted as per-document removal
  * stats, the form a curation pipeline consumes to rewrite or drop
  * boilerplate-heavy docs.
  *
  * Scale shape: explode is map-only; the canonical-occurrence pick is a
  * `min(struct(doc_id, pos))` groupBy — partial-aggregated, so a
  * boilerplate line repeated 10^9 times costs each map task one struct,
  * not a single reducer 10^9 rows. The attribution join back on the
  * line key is the one skew-exposed exchange, and it is a plain
  * equi-join — exactly the shape AQE's skew-join splitting handles
  * (unlike a window over the line key, which cannot be split). Final
  * per-doc rollup re-aggregates on doc_id, uniform by construction.
  */
object LineDedup {

  /** One row per non-blank line instance:
    * (doc_id, pos, line_chars, kept).
    */
  def lineInstances(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(trim(col("line")) =!= "")
    val canon = lines
      .groupBy("line")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    lines.join(canon, "line")
      .select(col("doc_id"), col("pos"),
        length(col("line")).cast("long").as("line_chars"),
        (col("first.doc_id") === col("doc_id") &&
          col("first.pos") === col("pos")).as("kept"))
  }

  /** Per-doc rollup: lines seen / removed as duplicates / chars that a
    * rewrite would drop. Docs that are entirely blank (no non-blank
    * line) don't appear — the oracle replays the same filter.
    */
  def docStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    lineInstances(docs, idCol, textCol)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dup_removed"),
        sum(when(!col("kept"), col("line_chars")).otherwise(0L)).as("chars_removed"))
}
