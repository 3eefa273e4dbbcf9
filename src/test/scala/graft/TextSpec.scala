package graft

import org.apache.spark.sql.functions._
import graft.text.Text

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace runs, leading/trailing trimmed") {
    val got = Seq("  a  b\tc \n d  ", "single", "x y")
      .toDF("t").select(Text.tokenCount(col("t"))).as[Int].collect()
    assert(got.toSeq == Seq(4, 1, 2))
  }

  test("stopword hits count duplicates") {
    val got = Seq("the cat the dog the end")
      .toDF("t")
      .select(Text.stopwordHits(Text.tokens(col("t")), Seq("the")))
      .as[Int].head()
    assert(got == 3)
  }

  test("langGuess votes: en text -> en, pt text -> pt, tie -> en") {
    val got = Seq(
      "the cat and the dog of it",
      "o gato de casa que um dia para",
      "zzz yyy xxx")
      .toDF("t").select(Text.langGuess(col("t"))).as[String].collect()
    assert(got.toSeq == Seq("en", "pt", "en"))
  }

  test("punctRatio and qualityScore bounded in [0,1]") {
    val q = Seq("Hello, world. This is a test!", "no punct here")
      .toDF("t")
      .select(Text.punctRatio(col("t")).as("p"),
        Text.qualityScore(col("t")).as("q"))
      .as[(Double, Double)].collect()
    q.foreach { case (p, s) =>
      assert(p >= 0.0 && p <= 1.0 && s >= 0.0 && s <= 1.0)
    }
  }

  test("fingerprint is whitespace/case insensitive; rollingHash stable") {
    val fps = Seq("A  B\tC", "a b c", "a b d")
      .toDF("t").select(Text.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(1) != fps(2))

    // rollingHash: differential vs a plain Scala fold
    val s = "hello"
    val want = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val got = Seq(s).toDF("t").select(Text.rollingHash(col("t")))
      .as[Long].head()
    assert(got == want)
  }

  test("normalized dedup key groups exact dups") {
    val df = Seq((1L, "Foo  Bar"), (2L, "foo bar"), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = df.groupBy(Text.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
      .select("n", "keeper").as[(Long, Long)].collect().toSet
    assert(groups == Set((2L, 1L), (1L, 3L)))
  }

  test("stem: suffix rules in order, short words untouched") {
    val cases = Seq(
      "classes" -> "class", "ties" -> "ti", "running" -> "runn",
      "wanted" -> "want", "cats" -> "cat", "its" -> "its",
      "miss" -> "miss", "glass" -> "glass", "ing" -> "ing")
    val got = cases.map(_._1).toDF("t")
      .select(Text.stem(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("bigram LM: hand-checked add-one smoothing on a tiny corpus") {
    // corpus: "a b a b" + "a b"  → bigrams: (a,b)x3, (b,a)x1
    // C(a,b)=3 C(b,a)=1; C1(a)=3 C1(b)=1; V=2
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = Text.bigramLmScores(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "avg_logp")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val pAB = math.log((3 + 1.0) / (3 + 3))  // V counts 'solo' too: V=3
    val pBA = math.log((1 + 1.0) / (1 + 3))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // 'solo' has no bigrams
    assert(got(0)._2 == 3L && got(0)._3 == r6((2 * pAB + pBA) / 3))
    assert(got(1)._2 == 1L && got(1)._3 == r6(pAB))
  }

  test("native normalize == regexp chain, including the odd edges") {
    val cases = Seq(
      "  Hello   World  ",      // plain trim + collapse
      "\tTabs\tEverywhere\t",   // regex-\s trim does NOT strip tabs:
                                // leading tab run → leading space
      "A\r\nB\u000BC\fD",       // every \s class member collapses
      "MiXeD CaSe",
      "ΜΕΓΑΣ İstanbul", // full-string case
                                // mapping: final sigma + dotted I
      " ", "", "nospace",
      "a  b", "  a", "b  ")
    val df = cases.toDF("t")
    val got = df.select(Text.normalized(col("t"))).as[String].collect()
    val want = df.select(Text.normalizedComposable(col("t"))).as[String].collect()
    got.zip(want).zip(cases).foreach { case ((g, w), in) =>
      assert(g == w, s"input ${in.map(_.toInt.toHexString)}: '$g' != '$w'")
    }
    // corpus-level: every document normalizes identically both ways
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(Text.normalized(col("text")).as("a"),
      Text.normalizedComposable(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("bpeTokenCount: contractions, digit runs, punct runs, spaces") {
    val got = Seq(
      "don't stop, it's 42 meters-long!", // 11 chunks (checked by hand)
      "hello world",                      // 2
      "")                                 // 0
      .toDF("t").select(Text.bpeTokenCount(col("t"))).as[Int].collect()
    assert(got.toSeq == Seq(11, 2, 0))
  }

  test("repetitionProfile: hand-checked fractions, degenerate docs 0.0") {
    val docs = Seq(
      (1L, "a a a a a a"),     // 4 trigrams all "a a a" -> dup 3/4; top 6/6
      (2L, "a b c d e f"),     // all trigrams distinct -> dup 0; top 1/6
      (3L, "x y"),             // no trigrams -> dup 0.0
      (4L, "")                 // no tokens -> both 0.0
    ).toDF("doc_id", "text")
    val got = Text.repetitionProfile(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 6, 0.75, 1.0),
      (2L, 6, 0.0, math.rint(1.0 / 6 * 1e6) / 1e6),
      (3L, 2, 0.0, 0.5),
      (4L, 0, 0.0, 0.0)))
  }

  test("chunkTokens: coverage, overlap, contained-tail drop, empty doc") {
    // chunkSize 4, overlap 2 -> step 2
    val docs = Seq(
      (1L, "a b c"),              // shorter than chunk -> 1 chunk of 3
      (2L, "a b c d e f"),        // starts 1,3; window@5 ⊂ window@3
      (3L, "a b c d e"),          // same: window@5 adds nothing
      (4L, "")                    // empty -> no chunks
    ).toDF("doc_id", "text")
    val got = Text.chunkTokens(docs, "doc_id", "text", 4, 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_start", "n_tok")
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 1, 3),
      (2L, 0, 1, 4), (2L, 1, 3, 4),
      (3L, 0, 1, 4), (3L, 1, 3, 3)))
    // every token index is covered by at least one chunk
    val cover = Text.chunkTokens(docs, "doc_id", "text", 4, 2)
      .groupBy("doc_id")
      .agg(max(col("chunk_start") + col("n_tok") - 1).as("last"))
      .as[(Long, Int)].collect().toMap
    assert(cover == Map(1L -> 3, 2L -> 6, 3L -> 5))
  }

  test("piiRedact masks email/ip/phone; email wins over embedded IP") {
    val got = Seq(
      "mail a.b+c@host.example.com now",
      "server at 192.168.0.1 port 80",
      "call +55 11 91234-5678 today",
      // TLD-anchored email pattern doesn't match an IP-host address;
      // the IP arm still scrubs the quad — nothing leaks either way
      "root@10.2.3.4 logged in",
      "version 1.2.3.4.5 is not an ip word")
      .toDF("t").select(Text.piiRedact(col("t"))).as[String].collect()
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "server at <IP> port 80")
    assert(got(2) == "call <PHONE> today")
    assert(got(3) == "root@<IP> logged in")
    // 1.2.3.4.5: \b-anchored quad still matches the 1.2.3.4 prefix —
    // documented residual risk of regex-level PII scrubbing
    assert(got(4) == "version <IP>.5 is not an ip word")
  }

  test("piiCount counts matches; null text -> 0 counts, null redaction") {
    val df = Seq(
      Some("a@b.co and c@d.org plus 10.0.0.1"),
      None).toDF("t")
    val counts = df.select(
      Text.piiCount(col("t"), Text.emailRe).as("e"),
      Text.piiCount(col("t"), Text.ipv4Re).as("i"),
      Text.piiRedact(col("t")).as("r"))
      .collect()
    assert(counts(0).getInt(0) == 2 && counts(0).getInt(1) == 1)
    assert(counts(1).getInt(0) == 0 && counts(1).getInt(1) == 0)
    assert(counts(1).isNullAt(2))
  }

  test("encoding QA counters: mojibake, controls, non-ASCII, digits") {
    val rows = Seq(
      "clean ascii 42",            // 2 digits / 14 chars
      "caf� m�nch",      // 2 replacement chars
      "bell\u0007 and\u0002null",  // 2 control chars (not \t\n\r)
      "tab\tok\nline\rend",        // whitelisted controls: clean
      "汉字 text",                  // 2 non-ASCII of 7 chars
      "")
    val got = rows.toDF("t").select(
      Text.replacementChars(col("t")).as("r"),
      Text.controlChars(col("t")).as("c"),
      Text.nonAsciiRatio(col("t")).as("na"),
      Text.digitRatio(col("t")).as("dg"))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2),
        x.getDouble(3)))
    assert(got(0) == ((0, 0, 0.0, 2.0 / 14)))
    assert(got(1)._1 == 2 && got(1)._2 == 0)
    assert(got(2)._1 == 0 && got(2)._2 == 2)
    assert(got(3) == ((0, 0, 0.0, 0.0)))
    assert(got(4)._3 == 2.0 / 7 && got(4)._1 == 0)
    assert(got(5) == ((0, 0, 0.0, 0.0)), "empty text is clean, ratios 0")
  }

  test("pipeline_pack_sequences: per-shard streams are gapless and " +
    "boundary flags match the arithmetic") {
    import graft.text.TextQueries.{PackCapacity => C}
    val rows = SparkEntry.queries("pipeline_pack_sequences")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("start_off"),
        r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last"),
        r.getAs[Boolean]("crosses")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._2)
      // gapless concatenation: each doc starts where the previous ended
      val expectedStarts = inOrder.scanLeft(0L)(_ + _._3).init
      assert(inOrder.map(_._4).toSeq == expectedStarts.toSeq)
      inOrder.foreach { case (_, _, n, off, f, l, x) =>
        assert(f == off / C && l == (off + n - 1) / C && x == (l > f))
      }
    }
  }

  test("tx_vocab_coverage: rates bounded, counts consistent, all splits present") {
    val rows = SparkEntry.queries("tx_vocab_coverage")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("split"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Double]("oov_rate"), r.getAs[Long]("oov_types")))
    assert(rows.map(_._1).toSet == Set("train", "val", "test"))
    rows.foreach { case (_, n, oov, rate, types) =>
      assert(oov >= 0 && oov <= n)
      assert(rate >= 0.0 && rate <= 1.0)
      assert((types > 0) == (oov > 0),
        "oov type count must agree with the token count")
    }
    // the 16-of-31 vocab must leave SOME split with out-of-vocab mass —
    // a vacuously-zero query would prove nothing
    assert(rows.exists(_._3 > 0))
  }
}
