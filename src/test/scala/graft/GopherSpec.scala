package graft

import graft.text.Gopher

/** Gopher rule battery: each rule exercised in both directions on
  * hand-computed fixtures, plus totality on token-free docs.
  */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: (Long, String)*) =
    Gopher.report(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  // 53 words, all alphabetic, several distinct stopwords, no symbols
  private val good = (("the quick brown fox jumps over the lazy dog " * 5)
    + "and that would have been fine with everyone").trim

  test("a clean long document passes every rule") {
    val r = report((1L, good))(1L)
    assert(r.getAs[Long]("words") == 53)
    assert(r.getAs[Boolean]("keep"),
      r.mkString(" | "))
  }

  test("word-count bounds: a short doc fails pass_words only for length") {
    val r = report((1L, "the dog and that have with be to of words here"))(1L)
    assert(!r.getAs[Boolean]("pass_words"))
    assert(r.getAs[Boolean]("pass_stop"))
    assert(!r.getAs[Boolean]("keep"))
  }

  test("symbol rule: hashes and both ellipsis forms count per occurrence") {
    // 10 words + 2 '#' + 1 '...' + 1 '…' → 4 symbols / 12 words = 0.333…
    val t = good.split(" ").take(8).mkString(" ") +
      " # # word... more…"
    val r = report((1L, t))(1L)
    assert(r.getAs[Long]("words") == 12)
    assert(r.getAs[Double]("symbol_ratio") == 0.333333)
    assert(!r.getAs[Boolean]("pass_symbols"))
  }

  test("bullet rule: >90% bullet-started lines fails, boundary passes") {
    val bullets = (1 to 19).map(i => s"- item $i").mkString("\n")
    val fail = report((1L, bullets))(1L) // 19/19 = 1.0
    assert(!fail.getAs[Boolean]("pass_bullets"))
    // 9 bullets + 1 plain of 10 lines = 0.9 — the ≤ boundary keeps it
    val boundary = (1 to 9).map(i => s"* b $i").mkString("\n") + "\nplain"
    val pass = report((1L, boundary))(1L)
    assert(pass.getAs[Double]("bullet_ratio") == 0.9)
    assert(pass.getAs[Boolean]("pass_bullets"))
  }

  test("ellipsis rule: >30% of lines ending in ... or … fails") {
    val t = "one...\ntwo…\nthree\nfour"
    val r = report((1L, t))(1L)
    assert(r.getAs[Double]("ellipsis_ratio") == 0.5)
    assert(!r.getAs[Boolean]("pass_ellipsis"))
  }

  test("alpha rule: mostly-numeric docs fail") {
    val t = (1 to 20).map(_.toString).mkString(" ") + " word"
    val r = report((1L, t))(1L)
    assert(r.getAs[Double]("alpha_ratio") == 0.047619)
    assert(!r.getAs[Boolean]("pass_alpha"))
  }

  test("stop-word rule counts DISTINCT stopwords present") {
    // 'the' repeated is one hit; needs ≥2 distinct
    val r = report((1L, "the the the the word list goes on"))(1L)
    assert(r.getAs[Long]("stop_hits") == 1)
    assert(!r.getAs[Boolean]("pass_stop"))
    val r2 = report((2L, "the words and more words"))(2L)
    assert(r2.getAs[Long]("stop_hits") == 2)
    assert(r2.getAs[Boolean]("pass_stop"))
  }

  test("totality: token-free docs report null ratios and keep = false") {
    val r = report((1L, ""), (2L, "   "))
    for (id <- Seq(1L, 2L)) {
      val row = r(id)
      assert(row.getAs[Long]("words") == 0)
      assert(row.isNullAt(row.fieldIndex("mean_word_len")))
      assert(row.isNullAt(row.fieldIndex("alpha_ratio")))
      // negative screens pass vacuously, positive evidence rules fail
      assert(row.getAs[Boolean]("pass_symbols"))
      assert(!row.getAs[Boolean]("pass_alpha"))
      assert(!row.getAs[Boolean]("keep"))
    }
  }
}
