package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance ≤ 1) equi-joinable matching via the symmetric
  * deletion trick (SymSpell): two strings are within Levenshtein
  * distance 1 iff they share a member of their DELETION NEIGHBORHOODS
  * — the string itself plus every single-character deletion. A
  * deletion pairs with the original (insert/delete) and two deletions
  * at the differing position pair with each other (substitution), so
  * the blocking is LOSSLESS for distance ≤ 1; candidates are then
  * exact-verified with `levenshtein`, which also assigns the final
  * distance.
  *
  * Scale shape: each side explodes into |s|+1 variant keys — linear
  * row amplification — and the match is ONE equi-join on the variant
  * string, where the naive formulation is an all-pairs cross join
  * with a levenshtein filter (quadratic; the oracle runs exactly that
  * to prove equality). Variant buckets are bounded (a length-k
  * variant has ≤ ~alphabet·(k+1) possible originators), so there is
  * no skew bomb. This is the record-linkage kernel: typo'd entity
  * names match their canonical rows in one shuffle.
  */
object FuzzyJoin {

  /** The deletion neighborhood: s plus each single-char deletion,
    * deduplicated (repeated chars produce identical deletions).
    */
  def deletionVariants(s: Column): Column =
    array_distinct(concat(array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s))))))

  /** All (aId, bId, dist) pairs with levenshtein(aStr, bStr) <= 1.
    * Ids must be unique per side.
    */
  def symDeleteJoin(a: DataFrame, aId: String, aStr: String,
                    b: DataFrame, bId: String, bStr: String): DataFrame = {
    val av = a.select(col(aId).as("a_id"), col(aStr).as("a_s"),
      explode(deletionVariants(col(aStr))).as("v"))
    val bv = b.select(col(bId).as("b_id"), col(bStr).as("b_s"),
      explode(deletionVariants(col(bStr))).as("v"))
    av.join(bv, "v")
      .select(col("a_id"), col("b_id"), col("a_s"), col("b_s"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_s"), col("b_s")).as("dist"))
      .filter(col("dist") <= 1)
  }
}
