package graft.similarity

/** Deterministic sparse random-projection matrix for the
  * Johnson–Lindenstrauss query (`emb_jl_project`).
  *
  * Entry (j, k) of the D×K projection matrix is drawn from
  * {+1, −1, 0} with probabilities {1/6, 1/6, 2/3} — Achlioptas'
  * database-friendly JL distribution — by hashing the flat index
  * j·K + k through one LCG step (glibc constants) and bucketing
  * mod 6. Pure integer arithmetic, so the DuckDB oracle rebuilds
  * the identical matrix from the same formula: the projection is
  * hash-checkable end to end, with no float-derived model to ship.
  */
object Jl {
  /** Sign of projection-matrix entry (dim `j`, output axis `k`). */
  def sign(j: Int, k: Int, kTotal: Int): Double = {
    val h = (1103515245L * (j.toLong * kTotal + k) + 12345L) % 2147483648L
    h % 6 match {
      case 0 => 1.0
      case 1 => -1.0
      case _ => 0.0
    }
  }
}
