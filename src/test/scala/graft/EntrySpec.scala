package graft

/** The driver contract itself: entry() returns rows, every query name
  * has either an oracle or is a documented rows-only approximate, and
  * query/oracle name sets stay consistent.
  */
class EntrySpec extends SparkSpec {

  test("entry() flagship returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() == 1000)
    assert(df.columns.contains("transacao_aprovada"))
  }

  test("every oracle key has a matching query; rows-only set is exactly the approximates") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // count pin: a refactor that silently drops a registration (e.g. a
    // ++ collision between two query maps) fails here, not at judging
    assert(q.size == 253, s"expected 253 registered queries, got ${q.size}")
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    val rowsOnly = q -- o
    // r5: every query now has an oracle — the five former rows-only
    // approximates moved to CONTRACT oracles (recall@K floor, PCA
    // reconstruction bound, simhash recall/precision floors, BPE
    // structural invariants, feature-mass invariants)
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("all queries are runnable on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
