package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Merge, SimilarityOps, TextOps}

/** Round-2 text/embedding/history additions: TF-IDF term ranking, bigram
  * collocations, PII scrubbing, int8 quantization, SCD2 history.
  */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curriculumBins: k-tiles per language, balanced counts, quality-monotone") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val bins = TextOps.curriculumBins(docs, "doc_id", "text", k = 4).cache()
    val perLang = bins.groupBy("pred_lang", "bin").count()
      .as[(String, Long, Long)].collect().groupBy(_._1)
    perLang.foreach { case (lang, rows) =>
      val counts = rows.sortBy(_._2).map(_._3)
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length), s"$lang bins not contiguous")
      // ntile balance: sizes differ by at most 1 within a language
      assert(counts.max - counts.min <= 1, s"$lang tile sizes $counts")
    }
    // monotone: a doc in a higher bin never has lower quality than one in a
    // lower bin of the same language
    val byLang = bins.select("pred_lang", "bin", "quality")
      .as[(String, Long, Double)].collect().groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val maxByBin = rows.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
      val minByBin = rows.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
      maxByBin.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) => assert(maxByBin(a) <= minByBin(b), s"$lang bins $a/$b overlap")
        case _ => ()
      }
    }
  }

  test("charEntropy: in-row fold equals the plain-Scala entropy, edges included") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),                 // one run → entropy 0
      (2L, "abab"),                 // two chars, 2 bits ≈ ln 2 nats each
      (3L, "the quick brown fox"),  // varied text, spaces counted as chars
      (4L, "z"),                    // single char: ln(1) = 0
      (5L, ""),                     // empty: dropped
      (6L, "héhé ü"),               // BMP non-ASCII chars count once each
      (7L, "aabbaabb"))             // interleaved runs re-sort into two runs
      .toDF("doc_id", "text")
    def run(native: Boolean) = TextOps.charEntropy(docs, "doc_id", "text", native = native)
      .select("doc_id", "n_chars_seen", "n_unique_chars", "entropy_fp", "is_low_entropy")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val got = run(native = true)
    // the native one-pass kernel and the sort-fold HOF reference agree
    assert(run(native = false) == got)
    // the mirrored integer identity, computed independently in plain Scala
    def ref(id: Long, t: String): (Long, Long, Long, Long, Boolean) = {
      val counts = t.split("").filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length.toLong)
      val n = counts.values.sum
      val sumFp = counts.values.map(c => math.round(c.toDouble * math.log(c.toDouble) * 1e6)).sum
      val h = math.round(math.log(n.toDouble) * 1e6) - sumFp / n
      (id, n, counts.size.toLong, h, h < 2500000L)
    }
    val want = Seq(1L -> "aaaa", 2L -> "abab", 3L -> "the quick brown fox",
      4L -> "z", 6L -> "héhé ü", 7L -> "aabbaabb").map { case (i, t) => ref(i, t) }.toSet
    assert(got == want)
    // hand anchors: zero entropy for the constant docs, ln 2 ≈ 693147
    // micro-nats for the two balanced two-char docs, flags accordingly
    assert(got.collect { case (1L, _, _, h, low) => (h, low) } == Set((0L, true)))
    assert(got.collect { case (4L, n, u, h, _) => (n, u, h) } == Set((1L, 1L, 0L)))
    assert(got.collect { case (2L, _, _, h, _) => h } == Set(693147L))
    // doc 7 lands one micro-nat higher: round(ln 8·1e6) = 2079442 rounds
    // UP while 11090354 div 8 truncates — the quantization is per-term
    assert(got.collect { case (7L, _, _, h, _) => h } == Set(693148L))
    assert(got.collect { case (3L, _, _, _, low) => low } == Set(false))
  }

  test("charEntropy kernel: ill-formed UTF-8 falls back to the String-decode reference") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.CharEntropyKernel
    // unvalidated bytes (a column cast from binary, a corrupt field) must
    // count EXACTLY like Java's replacement decoding — the semantics the
    // HOF form sees via split(text, "") — not like a lenient decode that
    // swallows following valid characters
    val cases: Seq[Array[Byte]] = Seq(
      Array(0x80, 'a', 'b', 'c').map(_.toByte),     // stray continuation lead
      Array('a'.toInt, 0xC3).map(_.toByte),         // truncated 2-byte tail
      Array(0xE0, 0x80, 0x80, 'x').map(_.toByte),   // overlong 3-byte form
      Array(0xED, 0xA0, 0x80).map(_.toByte),        // encoded UTF-16 surrogate
      Array(0xF5, 0x90, 0x80, 0x80).map(_.toByte),  // lead beyond U+10FFFF
      Array(0xF0, 'a'.toInt).map(_.toByte),         // truncated 4-byte tail
      Array(0xC0, 0xAF).map(_.toByte),              // overlong 2-byte form
      "héllo 中 🚀".getBytes("UTF-8"))              // valid control case
    cases.zipWithIndex.foreach { case (bs, i) =>
      val got = CharEntropyKernel.compute(UTF8String.fromBytes(bs))
      val cps = UTF8String.fromBytes(bs).toString.codePoints().toArray
      val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
      val sumFp = counts.values.map(c => math.round(c.toDouble * math.log(c.toDouble) * 1e6)).sum
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
        ((cps.length.toLong, counts.size.toLong, sumFp)), s"case $i")
    }
    // the review's concrete scenario: [0x80, a, b, c] is FOUR codepoints
    // (U+FFFD a b c), never one garbage 4-byte decode
    val bad = CharEntropyKernel.compute(UTF8String.fromBytes(
      Array(0x80, 'a', 'b', 'c').map(_.toByte)))
    assert(bad.getLong(0) == 4L && bad.getLong(1) == 4L)
  }

  test("tfidfTopTerms ranks by tf desc, then rarity (df asc), then term") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana banana date"),
      (3L, "apple banana")
    ).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "tf", "df", "rank")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // df: apple→2 docs, banana→3, cherry→1, date→1
    assert(top.filter(_._1 == 1L).map(_._2) == Seq("apple", "cherry"),
      "doc 1: apple wins on tf=2; cherry beats banana on rarity at tf=1")
    assert(top.filter(_._1 == 2L).map(_._2) == Seq("banana", "date"))
    assert(top.filter(_._1 == 3L).map(_._2) == Seq("apple", "banana"),
      "doc 3: tf tie broken by df (apple in 2 docs < banana in 3)")
  }

  test("bigramCounts: adjacent pairs, single-token and empty docs contribute none") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a  B"), // normalization collapses whitespace and lowercases
      (3L, "single"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.bigramCounts(docs, "text", k = 10).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("piiScrub redacts emails/phones with counts; clean text untouched") {
    val docs = Seq(
      (1L, "reach me at bob@site.org or 555-123-4567 thanks"),
      (2L, "no pii here")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrub(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String, Long)].collect()
    assert(got(0)._2 == 1L && got(0)._3 == 1L)
    assert(got(0)._5 == "reach me at [EMAIL] or [PHONE] thanks".length.toLong)
    assert(got(1)._2 == 0L && got(1)._3 == 0L)
    assert(got(1)._5 == "no pii here".length.toLong)
  }

  test("htmlExtract: boilerplate containers drop, script bytes never leak, entities decode once, anchors counted") {
    val docs = Seq(
      // script with raw < > && inside head AND body; nav/footer chrome;
      // body entities incl. the double-escape case &amp;amp; -> literal &amp;
      (1L, "<html><head><title>T</title><script>if(a<b&&c>d){x=\"<p>\";}</script></head>" +
        "<body><nav><a href=\"/\">Home</a></nav><p>alpha &lt;tag&gt; &amp;amp; beta</p>" +
        "<script>var y = 1 < 2;</script><footer><a href=\"/t\">T</a> &copy;</footer></body></html>"),
      // malformed: a trailing unclosed tag cannot match the tag regex and
      // DEGRADES TO LITERAL TEXT (the contract: degrade, never error)
      (2L, "<p>keep <b>bold</b> text</p><img src=\"x\""),
      // aside/header containers; &nbsp; becomes plain space and collapses
      (3L, "<header>SiteName</header><aside>ads</aside><p>one&nbsp;&nbsp;two</p>")
    ).toDF("doc_id", "html")
    val got = TextOps.htmlExtract(docs, "doc_id", "html")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("alpha <tag> &amp; beta", 2L)), s"got ${got(1L)}")
    assert(got(2L)._1 == "keep bold text <img src=\"x\"")
    assert(got(3L) == (("one two", 0L)))
  }

  test("c4Rules: line filter (punct/words/javascript) and page rules fire independently") {
    val docs = Seq(
      // 3 real sentences -> all kept, page passes
      (1L, "The quick brown fox jumps over the dog.\nIt was a cold bright day in April!\nWhere is the small key for the door?"),
      // javascript line dropped; the other three keep the page at the minimum
      (2L, "Please enable javascript to view this page.\nThe quick brown fox jumps again.\nIt was a cold bright day there.\nWhere is the small key now?"),
      // short line (<5 words) dropped despite terminal punct -> 2 sentences -> page fails
      (3L, "Too short.\nThe quick brown fox jumps over the dog.\nIt was a cold bright day in April."),
      // no terminal punctuation anywhere -> nothing kept
      (4L, "this line just trails off\nand so does this one here"),
      // brace + lorem on the RAW page kill it even though 3 sentences survive
      (5L, "The quick brown fox jumps over the dog. { lorem ipsum\nIt was a cold bright day in April.\nWhere is the small key for the door?"),
      // bad word: the line SURVIVES the line filter, the page fails
      (6L, "This page contains craptastic material for sure.\nThe quick brown fox jumps over the dog.\nIt was a cold bright day in April.")
    ).toDF("doc_id", "text")
    val got = TextOps.c4Rules(docs, "doc_id", "text", badWords = Seq("craptastic"))
      .select("doc_id", "n_kept_lines", "n_sentences", "r_min_sentences",
        "r_no_brace", "r_no_lorem", "r_no_badword", "pass")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 3L, true, true, true, true, true)))
    assert(got(2L) == ((2L, 3L, 3L, true, true, true, true, true)))
    assert(got(3L) == ((3L, 2L, 2L, false, true, true, true, false)))
    assert(got(4L) == ((4L, 0L, 0L, false, true, true, true, false)))
    assert(got(5L)._5 == false && got(5L)._6 == false && got(5L)._8 == false)
    // doc 5: the brace/lorem line itself fails the line filter (no terminal
    // punct after the plant), so only 2 sentences survive — but the page
    // rules are what kill it regardless
    assert(got(6L) == ((6L, 3L, 3L, true, true, true, false, false)))
  }

  test("c4Rules: kept lines rejoin in order as text_out") {
    val docs = Seq(
      (1L, "drop me no punct\nKeep the first real sentence here.\ndrop too\nAnd keep the second real sentence too!")
    ).toDF("doc_id", "text")
    val out = TextOps.c4Rules(docs, "doc_id", "text", badWords = Seq("zz"))
      .select("text_out").as[String].head()
    assert(out == "Keep the first real sentence here.\nAnd keep the second real sentence too!")
  }

  test("unicodeNormalize: NFC composes, singletons map, spaces/zero-width/controls clean, ASCII untouched") {
    val docs = Seq(
      // decomposed composes; already-composed idempotent
      (1L, "cafe\u0301 and caf\u00e9"),
      // U+2126 Ohm singleton -> U+03A9 Greek Omega
      (2L, "ohm \u2126 stays \u03a9"),
      // NBSP / figure space / narrow NBSP -> plain space
      (3L, "a\u00a0b\u2007c\u202fd"),
      // zero-width space/BOM/ZWNJ + C0 BEL + DEL all strip
      (4L, "x\u200by\ufeffz\u200cw\u0007\u007fv"),
      (5L, "tab\there\nand newline stay"), // \t and \n are kept, not controls here
      (6L, "plain ascii untouched")
    ).toDF("doc_id", "text")
    val got = TextOps.unicodeNormalize(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "caf\u00e9 and caf\u00e9", 14L, 13L, true)))
    assert(got(2L) == ((2L, "ohm \u03a9 stays \u03a9", 13L, 13L, true)))
    assert(got(3L) == ((3L, "a b c d", 7L, 7L, true)))
    assert(got(4L) == ((4L, "xyzwv", 10L, 5L, true)))
    assert(got(5L) == ((5L, "tab\there\nand newline stay", 25L, 25L, false)))
    assert(got(6L) == ((6L, "plain ascii untouched", 21L, 21L, false)))
  }

  test("NfcKernel: ASCII fast path returns the input reference; normalized non-ASCII skips the rewrite") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.NfcKernel
    val ascii = UTF8String.fromString("just ascii")
    assert(NfcKernel.nfc(ascii) eq ascii)
    val composed = UTF8String.fromString("caf\u00e9")
    assert(NfcKernel.nfc(composed) eq composed)
    val decomposed = UTF8String.fromString("cafe\u0301")
    assert(NfcKernel.nfc(decomposed).toString == "caf\u00e9")
  }

  test("fixMojibake: single/double inversion repair; genuine accents, CJK and ASCII provably untouched") {
    val docs = Seq(
      (1L, "plain ascii stays"),
      (2L, "one caf\u00c3\u00a9 level"),            // cafÃ© -> café, 1 round
      (3L, "two caf\u00c3\u0192\u00c2\u00a9 levels"), // cafÃƒÂ© -> café, 2 rounds
      (4L, "real caf\u00e9 here"),                  // genuine é: 0xE9 is no UTF-8 lead -> untouched
      (5L, "it\u00e2\u20ac\u2122s quoted"),         // â€™ -> ’ (cp1252 C1 range)
      (6L, "mixed \u4e2d text"),                    // CJK unmappable -> untouched
      // document-atomic: mojibake AND genuine accent in one doc -> veto
      (7L, "caf\u00c3\u00a9 and caf\u00e9 together")
    ).toDF("doc_id", "text")
    val got = TextOps.fixMojibake(docs, "doc_id", "text")
      .as[(Long, String, Boolean, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "plain ascii stays", false, 0L)))
    assert(got(2L) == ((2L, "one caf\u00e9 level", true, 1L)))
    assert(got(3L) == ((3L, "two caf\u00e9 levels", true, 2L)))
    assert(got(4L) == ((4L, "real caf\u00e9 here", false, 0L)))
    assert(got(5L) == ((5L, "it\u2019s quoted", true, 1L)))
    assert(got(6L) == ((6L, "mixed \u4e2d text", false, 0L)))
    assert(got(7L) == ((7L, "caf\u00c3\u00a9 and caf\u00e9 together", false, 0L)))
  }

  test("MojibakeKernel: ASCII fast path returns the input reference; maxRounds caps the inversion") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.MojibakeKernel
    val ascii = UTF8String.fromString("just ascii")
    assert(MojibakeKernel.fix(ascii, 2).get(0, null) eq ascii)
    // triple-encoded: with maxRounds=2 only two inversions run
    val triple = "caf\u00c3\u0192\u00c6\u2019\u00c3\u201a\u00c2\u00a9"
    val r2 = MojibakeKernel.fix(UTF8String.fromString(triple), 2)
    assert(r2.getLong(2) == 2L)
    val r3 = MojibakeKernel.fix(UTF8String.fromString(triple), 3)
    assert(r3.getLong(2) == 3L)
    assert(r3.get(0, null).toString == "caf\u00e9")
  }

  test("htmlLinks: anchors in order, case-insensitive, attr noise tolerated, no-link docs silent") {
    val docs = Seq(
      (1L, "<a href=\"/x\">a</a> text <A CLASS=\"z\" HREF=\"/y\">b</A>"),
      (2L, "no anchors at all"),
      // single-quoted href is OUT OF CONTRACT (double-quote emitters only)
      (3L, "<a href='/skip'>s</a><a href=\"/keep\">k</a>")
    ).toDF("doc_id", "html")
    val got = TextOps.htmlLinks(docs, "doc_id", "html")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 0L, "/x"), (1L, 1L, "/y"), (3L, 0L, "/keep")))
  }

  test("hashFeatures: signed sums conserve token mass, parity holds, repeated tokens stack") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha alpha"),
      (3L, "")
    ).toDF("doc_id", "text")
    val rows = TextOps.hashFeatures(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = rows.groupBy(_._1)
    // doc 1: four tokens distributed over dims; mass conserved, |value| <= n and same parity
    assert(byDoc(1L).map(_._4).sum == 4L)
    assert(rows.forall { case (_, d, v, n) => d >= 0 && d < 16 && math.abs(v) <= n && (v - n) % 2 == 0 })
    // doc 2: one dim, the repeated token stacks to ±2
    assert(byDoc(2L).length == 1 && math.abs(byDoc(2L).head._3) == 2L && byDoc(2L).head._4 == 2L)
    // same token -> same dim across docs
    val alphaDim = byDoc(2L).head._2
    assert(byDoc(1L).exists(_._2 == alphaDim))
    assert(!byDoc.contains(3L), "empty doc emits no feature rows")
  }

  test("readabilityScores: hand-checked Flesch fixed point; no-sentence docs keep NULL flesch") {
    val docs = Seq(
      (1L, "The cat sat."),     // 3 words, 1 sentence, 3 syllables -> 119.19
      (2L, "soup with no punctuation here"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.readabilityScores(docs, "doc_id", "text")
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch_fp")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got(1L) == ((3L, 1L, 3L, Some(119190000L))))
    assert(got(2L) == ((5L, 0L, 8L, None)))
    assert(got(3L) == ((0L, 0L, 0L, None)))
  }

  test("urlNormalize: ports, www, trailing slash, tracking params, sort, domain") {
    val docs = Seq(
      (1L, "HTTPS://WWW.News.Example.COM:443/A/B/?utm_source=x&b=2&a=10&ref=tw#top"),
      (2L, "http://example.com:8080/"),          // non-default port KEPT; root path stays /
      (3L, "https://sub.example.org/p/q"),       // no port, no query, no trailing slash
      (4L, "HTTP://EXAMPLE.COM:80?gclid=1&z=1"), // empty path -> /, default http port dropped
      (5L, "https://onelabel/x/")                // single-label host: domain = host
    ).toDF("doc_id", "url")
    val got = TextOps.urlNormalize(docs, "doc_id", "url")
      .as[(Long, String, String, String, String, String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "https://news.example.com/A/B?a=10&b=2",
      "news.example.com", "example.com", "/A/B", "a=10&b=2", 2L, 2L)))
    assert(got(2L) == ((2L, "http://example.com:8080/",
      "example.com:8080", "example.com", "/", "", 0L, 0L)))
    assert(got(3L) == ((3L, "https://sub.example.org/p/q",
      "sub.example.org", "example.org", "/p/q", "", 0L, 0L)))
    assert(got(4L) == ((4L, "http://example.com/?z=1",
      "example.com", "example.com", "/", "z=1", 1L, 1L)))
    assert(got(5L) == ((5L, "https://onelabel/x",
      "onelabel", "onelabel", "/x", "", 0L, 0L)))
  }

  test("quantizeInt8: unit scale quantizes exactly, saturation counted, zero vector safe") {
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f, 127.0f)), // scale = 127/127 = 1.0 exactly
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeInt8(vecs, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(got(0)._2 == 3L)
    assert(got(0)._3 == 1.0)
    assert(got(0)._4 == 1L - 2L + 127L)
    assert(got(0)._5 == 1L)
    assert(got(1)._3 == 0.0 && got(1)._4 == 0L && got(1)._5 == 0L,
      "zero vector: scale 0, all-zero quants, no division abort")
  }

  test("buildVocab ranks by frequency then token; encodeTokens marks out-of-vocab as unk") {
    val d = Seq(
      (1L, "b b b a a c"),
      (2L, "a b rare")
    ).toDF("doc_id", "text")
    // counts: b=4, a=3, c=1, rare=1 → vocab(2): b→0, a→1; c/rare → UNK
    val v = graft.ops.TextOps.buildVocab(d, "text", vocabSize = 2)
      .select("token", "id").as[(String, Long)].collect().toMap
    assert(v == Map("b" -> 0L, "a" -> 1L))
    val enc = graft.ops.TextOps
      .encodeTokens(d, "doc_id", "text", graft.ops.TextOps.buildVocab(d, "text", 2))
      .select("doc_id", "n_tokens", "n_unk").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc == Map(1L -> ((6L, 1L)), 2L -> ((3L, 1L))))
  }

  test("repetitionStats flags looping text, passes varied text, survives short docs") {
    val d = Seq(
      (1L, "a b a b a b a b"),     // top bigram "a b" = 4/7 occurrences, dup trigrams 4/6
      (2L, "one two three four five six seven eight"), // no repeats
      (3L, "x")                    // <2 tokens: NULL fracs, not repetitive
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.repetitionStats(d, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double], Option[Double], Boolean)].collect()
    val (_, n1, dup1, top1, rep1) = got(0)
    assert(n1 == 8L && dup1.get > 0.6 && top1.get > 0.5 && rep1)
    assert(got(1)._3.contains(0.0) && !got(1)._5)
    assert(got(2)._3.isEmpty && got(2)._4.isEmpty && !got(2)._5)
  }

  test("scd2History compresses unchanged runs and closes intervals in order") {
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:0$i%d:00")
    val ev = Seq(
      ("u1", "t", 10.0, ts(1), 1L),
      ("u1", "t", 10.0, ts(2), 2L), // unchanged → compressed away
      ("u1", "t", 20.0, ts(3), 3L),
      ("u2", "t", 5.0, ts(4), 4L)
    ).toDF("user_id", "event_type", "value", "ts", "event_id")
    val h = Merge
      .scd2History(ev, Seq("user_id", "event_type"), "ts", "event_id", "value")
      .orderBy("user_id", "valid_from")
      .select("user_id", "value", "valid_from", "valid_to", "is_current")
      .as[(String, Double, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(h == Seq(
      ("u1", 10.0, ts(1), Some(ts(3)), false),
      ("u1", 20.0, ts(3), None, true),
      ("u2", 5.0, ts(4), None, true)))
  }

  test("lmScore matches a plain-Scala reference LM; empty doc keeps NULL stats") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "zyx qwv"),
      (4L, "  "),
      (5L, "the cat sat on the mat the cat sat")
    ).toDF("doc_id", "text")
    val got = TextOps.lmScore(docs, "doc_id", "text")
      .select("doc_id", "n_scored", "sum_logq")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // reference model in plain Scala, same formula
    val corpus = Map(
      1L -> "the cat sat on the mat", 2L -> "the cat sat", 3L -> "zyx qwv",
      5L -> "the cat sat on the mat the cat sat"
    ).view.mapValues(_.split("\\s+").toSeq).toMap
    val uni = corpus.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum.toDouble
    val v = uni.size.toDouble
    val big = corpus.values.flatMap(w => w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def score(ws: Seq[String]): (Long, Long) = {
      val lqs = ws.zipWithIndex.map { case (w, i) =>
        val pu = (uni(w) + 1.0) / (n + v)
        val lp =
          if (i == 0) math.log(pu)
          else {
            val prev = ws(i - 1)
            val pb = (big.getOrElse((prev, w), 0L) + 1.0) / (uni(prev) + v)
            math.log(0.5 * pb + 0.5 * pu)
          }
        math.round(lp * 1e6)
      }
      (ws.size.toLong, lqs.sum)
    }
    corpus.foreach { case (id, ws) =>
      val (en, eq) = score(ws)
      assert(got(id) == ((Some(en), Some(eq))), s"doc $id")
    }
    assert(got(4L) == ((None, None)), "whitespace-only doc keeps its row with NULL stats")
    // natural repeated text scores lower NLL than the rare-token doc
    assert(got(5L)._2.get.toDouble / got(5L)._1.get > got(3L)._2.get.toDouble / got(3L)._1.get,
      "higher (less negative) mean log-prob for the in-distribution doc")
  }

  test("lmScore: merged half-corpus counts reproduce the self-trained scores; OOV keeps rows") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "zyx qwv"),
      (4L, "the cat sat on the mat the cat sat")
    ).toDF("doc_id", "text")
    val full = TextOps.lmScore(docs, "doc_id", "text")
      .as[(Long, Option[Long], Option[Long], Option[Double])].collect().toSet
    val (u, b) = TextOps.mergeLmCounts(
      TextOps.lmCounts(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
      TextOps.lmCounts(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text"))
    val merged = TextOps.lmScoreFromCounts(docs, "doc_id", "text", u, b)
      .as[(Long, Option[Long], Option[Long], Option[Double])].collect().toSet
    assert(merged == full, "count fold is lossless")
    // OOV: scoring docs against counts that never saw their tokens must
    // keep every occurrence (add-alpha unseen row), not drop rows
    val oov = TextOps.lmScoreFromCounts(
      Seq((9L, "totally unseen words")).toDF("doc_id", "text"), "doc_id", "text", u, b)
      .select("doc_id", "n_scored").as[(Long, Option[Long])].collect().toSeq
    assert(oov == Seq((9L, Some(3L))), "all OOV occurrences scored, none dropped")
  }

  test("bm25Search matches a plain-Scala reference; rare shared term dominates retrieval") {
    val docs = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "the cat sat on the mat"),
      (3L, "spark caches data in memory"),
      (4L, "a mat for the cat"),
      (5L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val queries = Seq((10L, "cat mat")).toDF("doc_id", "text")
    val got = TextOps.bm25Search(docs, "doc_id", "text", queries, "doc_id", "text", k = 3)
      .select("query_id", "doc_id", "score_fp", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)

    // reference in plain Scala, same arithmetic
    val corpus = Map(
      1L -> "spark shuffles data across the cluster", 2L -> "the cat sat on the mat",
      3L -> "spark caches data in memory", 4L -> "a mat for the cat",
      5L -> "unrelated words entirely here"
    ).view.mapValues(_.split("\\s+").toSeq).toMap
    val tf = corpus.map { case (id, ws) =>
      id -> ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val dl = corpus.view.mapValues(_.size.toLong).toMap
    val nd = corpus.size.toLong
    val tl = dl.values.sum
    val df = corpus.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    val idfq = df.map { case (t, d) =>
      t -> math.round(math.log(1.0 + (nd - d + 0.5) / (d + 0.5)) * 1e6)
    }.toMap
    val avgdl = tl.toDouble / nd.toDouble
    val expect = corpus.keys.toSeq.flatMap { d =>
      val terms = Seq("cat", "mat").filter(tf(d).contains)
      if (terms.isEmpty) None
      else Some(d -> terms.map { t =>
        val f = (tf(d)(t).toDouble * 2.2) /
          (tf(d)(t).toDouble + 1.2 * (0.25 + 0.75 * (dl(d).toDouble / avgdl)))
        math.round((idfq(t).toDouble / 1e6) * f * 1e6)
      }.sum)
    }.sortBy { case (d, s) => (-s, d) }.take(3)
      .zipWithIndex.map { case ((d, s), i) => (10L, d, s, i + 1L) }
    assert(got == expect)
    assert(Set(got(0)._2, got(1)._2) == Set(2L, 4L), "the cat/mat docs outrank everything")

    // merged half-index search reproduces the one-shot result exactly
    import org.apache.spark.sql.functions.col
    val merged = TextOps.mergeBm25Stats(
      TextOps.bm25Stats(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
      TextOps.bm25Stats(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text"))
    val inc = TextOps.bm25SearchFromStats(
      queries, "doc_id", "text", "doc_id",
      merged._1, merged._2, merged._3, merged._4, k = 3)
      .select("query_id", "doc_id", "score_fp", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(inc == got, "index fold is lossless")
  }

  test("distributionDrift: plain-Scala KL contributions; identical halves drift zero") {
    import org.apache.spark.sql.functions.{col, sum}
    val a = Seq("a a b", "a c").toDF("text")
    val b = Seq("a b b", "b d").toDF("text")
    val got = TextOps.distributionDrift(a, b, "text")
      .select("term", "c_a", "c_b", "contrib_fp")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val cA = Map("a" -> 3L, "b" -> 1L, "c" -> 1L, "d" -> 0L)
    val cB = Map("a" -> 1L, "b" -> 3L, "c" -> 0L, "d" -> 1L)
    val (na, nb, v) = (5L, 5L, 4L)
    cA.keys.foreach { t =>
      val pA = (cA(t) + 1).toDouble / (na + v).toDouble
      val pB = (cB(t) + 1).toDouble / (nb + v).toDouble
      val exp = math.round(pA * math.log(pA / pB) * 1.0e6)
      assert(got(t) == ((cA(t), cB(t), exp)), s"term $t")
    }
    // identical halves: every contribution is exactly zero
    val same = TextOps.distributionDrift(a, a, "text")
      .agg(sum(col("contrib_fp"))).as[Long].collect().head
    assert(same == 0L)
  }

  test("retrievalEval: integer MRR/hits/recall with capped denominator, empty-relevance rows kept") {
    val results = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),  // q1: rel at ranks 2 and 3
      (2L, 20L, 1L), (2L, 21L, 2L),                 // q2: nothing relevant
      (3L, 30L, 1L))                                // q3: rel at rank 1, n_rel 2
      .toDF("query_id", "doc_id", "rank")
    val relevance = Seq(
      (1L, 11L), (1L, 12L), (1L, 11L),              // duplicate must not double-count
      (3L, 30L), (3L, 99L),                         // 99 never retrieved
      (4L, 5L))                                     // query 4 not in results: ignored
      .toDF("query_id", "doc_id")
    val got = TextOps.retrievalEval(results, relevance, "query_id", "doc_id", "rank", k = 10)
      .select("query_id", "n_rel", "first_rel_rank", "rr_fp", "hits_at_k", "recall_fp")
      .as[(Long, Long, Option[Long], Option[Long], Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      1L -> ((2L, Some(2L), Some(500000L), 2L, Some(1000000L))),
      2L -> ((0L, None, None, 0L, None)),
      3L -> ((2L, Some(1L), Some(1000000L), 1L, Some(500000L)))))
  }

  test("textRank matches a plain-Scala fixed-point PageRank; hub token ranks first") {
    val docs = Seq(
      (1L, "spark runs fast and spark scales well"),
      (2L, "spark joins and spark aggregates"),
      (3L, "fast joins need spark"),
      (4L, "solo"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.textRank(docs, "text", iterations = 3, k = 10)
      .select("token", "score", "rank")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._3)

    // reference model: same graph, same integer arithmetic
    val corpus = Seq(
      "spark runs fast and spark scales well",
      "spark joins and spark aggregates",
      "fast joins need spark").map(_.split("\\s+").toSeq)
    val directed = corpus.flatMap(w =>
      w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).filter(p => p._1 != p._2))
    val edges = (directed ++ directed.map(_.swap))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wsum = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var r: Map[String, Long] = wsum.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.toSeq
        .map { case ((src, dst), w) => dst -> (r(src) * w) / wsum(src) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = contrib.map { case (t, cs) => t -> (150000L + (85L * cs) / 100L) }
    }
    val expect = r.toSeq.sortBy { case (t, s) => (-s, t) }.take(10)
      .zipWithIndex.map { case ((t, s), i) => (t, s, i + 1L) }
    assert(got == expect)
    assert(got.head._1 == "spark", "the hub token carries the highest centrality")
  }

  // ───────────────────────── BPE merge training ─────────────────────────

  /** Independent plain-Scala greedy BPE — same tie rule (cnt desc, l, r),
    * same left-to-right non-overlapping fold — for differential checks.
    */
  private def refBpe(
      words: Map[String, Long], n: Int): (Seq[(Long, String, String, Long)], Map[String, List[String]]) = {
    def mergeSeq(s: List[String], l: String, r: String): List[String] =
      s.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r) else acc :+ x
      }
    var segs: Map[String, (List[String], Long)] =
      words.map { case (w, f) => w -> ((w.map(_.toString).toList :+ "</w>", f)) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var i = 1
    var done = false
    while (i <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for { (_, (s, f)) <- segs; p <- s.zip(s.tail) }
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), k) => (-k, a, b) }
        out += ((i.toLong, l, r, c))
        segs = segs.map { case (w, (s, f)) => w -> ((mergeSeq(s, l, r), f)) }
        i += 1
      }
    }
    (out.toSeq, segs.map { case (w, (s, _)) => w -> s })
  }

  test("bpeTrain: merge table equals an independent plain-Scala BPE on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val words = TextOps.bpeWordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    val (expMerges, expSegs) = refBpe(words, 6)
    val got = TextOps.bpeTrain(docs, "text", nMerges = 6)
      .select("merge_rank", "left_sym", "right_sym", "pair_count")
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expMerges)
    // the resulting segmentation matches symbol-for-symbol too
    val segGot = TextOps.bpeSegment(docs, "text", nMerges = 6)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(segGot.view.mapValues(_.toList).toMap == expSegs)
  }

  test("bpeSegment is lossless: symbols re-spell every word; vocab mass equals segment mass") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val seg = TextOps.bpeSegment(docs, "text", nMerges = 5).cache()
    assert(seg.filter(
      concat_ws("", col("syms")) =!= concat(col("word"), lit("</w>"))).count() == 0)
    val vocabMass = TextOps.bpeVocab(docs, "text", nMerges = 5)
      .agg(sum("token_count")).as[Long].head()
    val segMass = seg.select((size(col("syms")).cast("long") * col("freq")).as("m"))
      .agg(sum("m")).as[Long].head()
    assert(vocabMass == segMass)
    seg.unpersist()
  }

  test("bpeEncodeDocs: counts tie out against the segmentation; signature is deterministic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val enc = TextOps.bpeEncodeDocs(docs, "doc_id", "text", nMerges = 5)
      .select("doc_id", "n_words", "n_subwords", "ids_sig")
      .as[(Long, Long, Long, String)].collect()
    // per-doc word counts agree with the tokenizer, subword counts with
    // the segmentation's per-word symbol lengths
    val segLen = TextOps.bpeSegment(docs, "text", nMerges = 5)
      .select("word", "syms").as[(String, Seq[String])].collect()
      .map { case (w, s) => w -> s.length.toLong }.toMap
    val docWords = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    enc.foreach { case (id, nw, ns, _) =>
      assert(nw == docWords(id).length, s"doc $id word count")
      assert(ns == docWords(id).map(segLen).sum, s"doc $id subword count")
    }
    assert(enc.length == docWords.count(_._2.nonEmpty))
    // determinism: a second run reproduces every signature
    val again = TextOps.bpeEncodeDocs(docs, "doc_id", "text", nMerges = 5)
      .select("doc_id", "ids_sig").as[(Long, String)].collect().toMap
    assert(enc.map(e => e._1 -> e._4).toMap == again)
  }

  test("bpeSegmentWith: applying the own-corpus merge list reproduces bpeSegment; unseen words stay char-split") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val merges = TextOps.bpeMergeList(docs, "text", nMerges = 5).map(m => (m._2, m._3))
    val applied = TextOps.bpeSegmentWith(docs, "text", merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    val trained = TextOps.bpeSegment(docs, "text", nMerges = 5)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(applied == trained)
    // a corpus with words the trainer never saw: known words merge, the
    // unseen word (no matching adjacent pair) stays fully char-split
    val other = Seq((1L, "zzqx")).toDF("doc_id", "text")
    val seg = TextOps.bpeSegmentWith(other, "text", merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(seg("zzqx").length >= 4, "unseen word not spuriously merged")
    assert(seg("zzqx").mkString == "zzqx</w>")
  }

  test("batched trainer rounds ≡ one-at-a-time: BPE and WordPiece merge tables " +
    "identical at window 1 vs 64 on the real corpus") {
    // 40 merges on real text forces several rounds with interacting
    // candidates, count/score ties, and trim fallbacks — the regimes the
    // dominance argument must survive; window=1 IS the classic loop.
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val words = TextOps.bpeWordCounts(docs, "text").localCheckpoint()

    val bpeSeq = TextOps.bpeTrainFromWordCounts(words, nMerges = 40, batchWindow = 1)
    val bpeBat = TextOps.bpeTrainFromWordCounts(words, nMerges = 40, batchWindow = 64)
    assert(bpeBat == bpeSeq)
    assert(bpeBat.length == 40)

    val wpSeq = TextOps.wordpieceTrainFromWordCounts(words, nMerges = 40, batchWindow = 1)
    val wpBat = TextOps.wordpieceTrainFromWordCounts(words, nMerges = 40, batchWindow = 64)
    assert(wpBat == wpSeq)
    assert(wpBat.length == 40)
  }

  test("bpeTrain stops early when no adjacent pair remains") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, "text", nMerges = 10)
      .select("merge_rank", "left_sym", "right_sym", "pair_count")
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a", "b", 1L), (2L, "ab", "</w>", 1L)))
  }

  // ─────────────── Stupid Backoff trigram LM ───────────────

  test("stupidBackoff ladder: trigram hit, bigram hit, double backoff, OOV exclusion — hand-checked") {
    import org.apache.spark.sql.functions._
    def lnFp(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val alpha = -916291L
    val train = Seq((2L, "a b c a b d")).toDF("doc_id", "text")
    val (uni, bi, tri) = TextOps.sbCounts(train, "doc_id", "text")
    // "a b d c": unigram entry, bigram (a,b) hit, trigram (a,b,d) hit,
    // (b,d,c) misses trigram AND bigram → double backoff to c's unigram
    // "q a" : q is OOV → excluded; 'a' scores at the unigram rung (its
    // prev q is in-context but unseen, bigram misses → alpha + unigram)
    val scoreDf = Seq((1L, "a b d c"), (3L, "q a")).toDF("doc_id", "text")
    val got = TextOps.stupidBackoffFromCounts(scoreDf, "doc_id", "text", uni, bi, tri)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exp1 = (lnFp(2) - lnFp(6)) + // a: c1(a)=2, N=6
      (lnFp(2) - lnFp(2)) + // b|a: c2(a,b)=2 / c1(a)=2
      (lnFp(1) - lnFp(2)) + // d|a,b: c3=1 / c2(a,b)=2
      (2 * alpha + lnFp(1) - lnFp(6)) // c|b,d: both rungs miss → 2α + unigram
    assert(got(1L) == ((4L, exp1)))
    // doc 3: q excluded (OOV), a scores α + ln c1(a) − ln N (bigram (q,a) unseen)
    assert(got(3L) == ((1L, alpha + lnFp(2) - lnFp(6))))
  }

  test("stupidBackoffScore matches a plain-Scala replay on the real corpus; fold ≡ one-shot") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = TextOps.stupidBackoffScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    def lnFp(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val alpha = -916291L
    val raw = docs.select(col("doc_id"), TextOps.normalize(col("text")))
      .as[(Long, String)].collect()
    val toks = raw.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val c1 = scala.collection.mutable.Map.empty[String, Long]
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long]
    val c3 = scala.collection.mutable.Map.empty[(String, String, String), Long]
    for ((_, w) <- toks) {
      w.foreach(t => c1(t) = c1.getOrElse(t, 0L) + 1)
      w.sliding(2).filter(_.size == 2).foreach { p =>
        c2((p(0), p(1))) = c2.getOrElse((p(0), p(1)), 0L) + 1
      }
      w.sliding(3).filter(_.size == 3).foreach { p =>
        c3((p(0), p(1), p(2))) = c3.getOrElse((p(0), p(1), p(2)), 0L) + 1
      }
    }
    val n = c1.values.sum
    val exp = toks.map { case (id, w) =>
      val ss = w.zipWithIndex.map { case (t, i) =>
        def u = lnFp(c1(t)) - lnFp(n)
        if (i == 0) u
        else if (i == 1) c2.get((w(0), t)).map(c => lnFp(c) - lnFp(c1(w(0))))
          .getOrElse(alpha + u)
        else c3.get((w(i - 2), w(i - 1), t))
          .map(c => lnFp(c) - lnFp(c2((w(i - 2), w(i - 1)))))
          .orElse(c2.get((w(i - 1), t)).map(c => alpha + lnFp(c) - lnFp(c1(w(i - 1)))))
          .getOrElse(2 * alpha + u)
      }
      id -> ((ss.length.toLong, ss.sum))
    }.toMap
    assert(got == exp)
    // counts monoid: four folded batch triples reproduce the one-shot scores
    val parts = (0 to 3).map { k =>
      TextOps.sbCounts(docs.filter(pmod(col("doc_id"), lit(4)) === k), "doc_id", "text")
    }
    val (fu, fb, ft) = TextOps.mergeSbCounts(parts: _*)
    val folded = TextOps.stupidBackoffFromCounts(docs, "doc_id", "text", fu, fb, ft)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(folded == got)
  }

  // ─────────────────── DSIR importance resampling ───────────────────

  test("dsirWeights matches an independent plain-Scala replay on the real corpus") {
    import org.apache.spark.sql.functions._
    import java.security.MessageDigest
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = TextOps.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val raw = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    def bucket(s: String): String = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.take(2).map(b => f"$b%02x").mkString.take(3)
    }
    def feats(text: String): Seq[String] = {
      val w = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val fb = raw.map { case (id, lang, text) =>
      (id, lang == "en", feats(text).groupBy(bucket).view.mapValues(_.size.toLong).toMap)
    }
    val tc = scala.collection.mutable.Map.empty[String, Long]
    val rc = scala.collection.mutable.Map.empty[String, Long]
    for ((_, isT, m) <- fb; (b, c) <- m) {
      if (isT) tc(b) = tc.getOrElse(b, 0L) + c
      rc(b) = rc.getOrElse(b, 0L) + c
    }
    val (tt, rt) = (tc.values.sum, rc.values.sum)
    def lnFp(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    def llr(b: String): Long =
      lnFp(tc.getOrElse(b, 0L) + 1) - lnFp(tt + 4096) - lnFp(rc(b) + 1) + lnFp(rt + 4096)
    val exp = fb.map { case (id, _, m) =>
      id -> ((m.values.sum, m.map { case (b, c) => c * llr(b) }.sum))
    }.toMap
    assert(got == exp)
    // direction: the target slice averages a higher weight than the rest
    val (enW, otherW) = (
      raw.filter(_._2 == "en").map(r => got(r._1)._2),
      raw.filter(_._2 != "en").map(r => got(r._1)._2))
    assert(enW.sum / enW.size > otherW.sum / otherW.size,
      "target-language docs should out-weigh the rest on average")
  }

  test("dsir model fold over disjoint batches equals the one-shot model; zero-feature docs score 0") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .unionByName(Seq((999999L, "   ", "en", "srcX", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val isT = col("lang") === "en"
    val oneShot = TextOps.dsirWeights(docs, "doc_id", "text", isT)
    val folded = {
      val models = (0 to 3).map { k =>
        TextOps.dsirModelFromFeatures(TextOps.dsirFeatures(
          docs.filter(pmod(col("doc_id"), lit(4)) === k), "doc_id", "text", isT))
      }
      TextOps.dsirWeightsFromModel(
        docs, "doc_id", TextOps.dsirFeatures(docs, "doc_id", "text", isT),
        TextOps.dsirMergeModels(models))
    }
    assert(oneShot.exceptAll(folded).isEmpty && folded.exceptAll(oneShot).isEmpty)
    val empty = oneShot.filter(col("doc_id") === 999999L)
      .as[(Long, Long, Long)].head()
    assert(empty == ((999999L, 0L, 0L)), "whitespace-only doc: no features, weight 0")
  }

  test("dsirSelect: top-k by (weight desc, id), ranks contiguous, boundary ties deterministic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val w = TextOps.dsirWeights(docs, "doc_id", "text", col("lang") === "en").cache()
    val sel = TextOps.dsirSelect(w, "doc_id", k = 20)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(sel.map(_._3).toSeq == (1L to 20L))
    val exp = w.as[(Long, Long, Long)].collect()
      .sortBy { case (id, _, wt) => (-wt, id) }.take(20).map(r => (r._1, r._3))
    assert(sel.map(r => (r._1, r._2)).toSeq == exp.toSeq)
  }

  // ─────────────────── WordPiece merge training ───────────────────

  /** Independent plain-Scala WordPiece — likelihood scores with each ln
    * term rounded to micro-nats BEFORE subtracting (the engine recipe),
    * ties (score desc, l, r), first-char/`##`-continuation init, merged
    * name strips the right side's marker.
    */
  private def refWordpiece(
      words: Map[String, Long],
      n: Int): (Seq[(Long, String, String, String, Long, Long)], Map[String, List[String]]) = {
    def lnFp(c: Long): Long = math.round(math.log(c.toDouble) * 1e6)
    def mergedName(l: String, r: String): String =
      l + (if (r.startsWith("##")) r.substring(2) else r)
    def mergeSeq(s: List[String], l: String, r: String, m: String): List[String] =
      s.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ m else acc :+ x
      }
    var segs: Map[String, (List[String], Long)] =
      words.map { case (w, f) =>
        w -> ((w.zipWithIndex.map { case (c, i) =>
          if (i == 0) c.toString else "##" + c
        }.toList, f))
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long, Long)]
    var i = 1
    var done = false
    while (i <= n && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      for ((_, (s, f)) <- segs) {
        for (p <- s.zip(s.tail)) pc(p) = pc.getOrElse(p, 0L) + f
        for (x <- s) sc(x) = sc.getOrElse(x, 0L) + f
      }
      if (pc.isEmpty) done = true
      else {
        val (((l, r), c), s) = pc.toSeq
          .map { case (p, c) => ((p, c), lnFp(c) - lnFp(sc(p._1)) - lnFp(sc(p._2))) }
          .minBy { case (((a, b), _), sc0) => (-sc0, a, b) }
        val m = mergedName(l, r)
        out += ((i.toLong, l, r, m, c, s))
        segs = segs.map { case (w, (sq, f)) => w -> ((mergeSeq(sq, l, r, m), f)) }
        i += 1
      }
    }
    (out.toSeq, segs.map { case (w, (s, _)) => w -> s })
  }

  test("wordpieceTrain: merge table equals an independent plain-Scala trainer on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val words = TextOps.bpeWordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    val (expMerges, expSegs) = refWordpiece(words, 6)
    val (gotMerges, segDf) = TextOps.wordpieceArtifact(docs, "text", nMerges = 6)
    assert(gotMerges == expMerges)
    val segGot = segDf.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(segGot.view.mapValues(_.toList).toMap == expSegs)
  }

  test("wordpiece likelihood argmax diverges from the BPE count argmax where normalization bites") {
    // "xy" occurs 5× but x and y are everywhere (high symbol counts drag
    // ln c(xy) − ln c(x) − ln c(y) down); "qz" occurs only 2× but q and z
    // occur ONLY there — likelihood picks (q, ##z), raw counts pick (x, ##y)
    val docs = Seq(
      (1L, "xy xy xy xy xy qz qz"),
      (2L, "xa ya xb yb xc yc")).toDF("doc_id", "text")
    val wp = TextOps.wordpieceTrain(docs, "text", nMerges = 1)
      .select("left_sym", "right_sym", "merged_sym")
      .as[(String, String, String)].head()
    assert(wp == (("q", "##z", "qz")))
    val bpe = TextOps.bpeTrain(docs, "text", nMerges = 1)
      .select("left_sym", "right_sym").as[(String, String)].head()
    assert(bpe == (("x", "y")))
  }

  test("wordpiece segmentation is lossless: stripping ## re-spells every word; init marks continuations only") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val (_, segDf) = TextOps.wordpieceArtifact(docs, "text", nMerges = 5)
    val bad = segDf.filter(
      concat_ws("", transform(col("syms"),
        s => when(s.startsWith("##"), s.substr(lit(3), length(s))).otherwise(s))) =!= col("word"))
    assert(bad.count() == 0)
    // every non-initial symbol carries the marker, the initial one never does
    val marks = segDf.filter(
      element_at(col("syms"), 1).startsWith("##") ||
        exists(slice(col("syms"), lit(2), size(col("syms"))), s => !s.startsWith("##")))
    assert(marks.count() == 0)
  }

  test("unigramTrain matches an independent plain-Scala hard-EM on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val (vocabDf, segDf) = TextOps.unigramTrain(docs, "text")
    val gotVocab = vocabDf.as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val gotSegs = segDf.as[(String, Seq[String], Long)].collect()
      .map(r => r._1 -> ((r._2.toList, r._3))).toMap

    // independent implementation (mutable, driver-side)
    val wc = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val subs = wc.keys.flatMap { w =>
      for (s <- 0 until w.length; l <- 1 to math.min(4, w.length - s))
        yield (w, s, s + l, w.substring(s, s + l))
    }.toSeq
    val chars = subs.filter(t => t._3 - t._2 == 1).map(_._4).toSet
    def scores(cnt: Map[String, Long]): Map[String, Long] = {
      val t = cnt.values.sum.toDouble
      cnt.map { case (p, c) => p -> math.round(math.log(c.toDouble / t) * 1e6) }
    }
    def viterbi(lp: Map[String, Long]): Map[String, (List[String], Long)] =
      wc.keys.map { w =>
        // dp(i) = (score, s, path), struct-max semantics
        val dp = Array.fill[Option[(Long, Int, List[String])]](w.length + 1)(None)
        dp(0) = Some((0L, -1, Nil))
        for (i <- 1 to w.length) {
          val cands = for {
            s <- math.max(0, i - 4) until i
            p = w.substring(s, i) if lp.contains(p); prev <- dp(s)
          } yield (prev._1 + lp(p), s, prev._3 :+ p)
          if (cands.nonEmpty) {
            import scala.math.Ordering.Implicits.seqOrdering
            dp(i) = Some(cands.maxBy { case (sc, s, path) =>
              (sc, s, path) // (score, split, path) - element-wise list order
            })
          }
        }
        w -> dp(w.length).map(d => (d._3, d._1)).get
      }.toMap
    var cnt: Map[String, Long] = subs.groupBy(_._4)
      .map { case (p, occ) => p -> occ.map(o => wc(o._1)).sum }
    var segs: Map[String, (List[String], Long)] = null
    for (_ <- 1 to 2) {
      segs = viterbi(scores(cnt))
      val used = segs.toSeq.flatMap { case (w, (path, _)) => path.map(_ -> wc(w)) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      cnt = (chars.map(c => c -> math.max(used.getOrElse(c, 0L), 1L)) ++
        used.filterNot(kv => chars(kv._1))).toMap
    }
    val refVocab = cnt.map { case (p, c) => p -> ((c, scores(cnt)(p))) }
    assert(gotVocab == refVocab)
    assert(gotSegs == segs)
    // losslessness: every segmentation re-spells its word
    assert(gotSegs.forall { case (w, (path, _)) => path.mkString == w })
  }

  test("unigramSegmentWith: own-corpus apply reproduces training segs; untrained chars drop the word") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val (vocab, trainSegs) = TextOps.unigramTrain(docs, "text")
    val scores = vocab.select(col("piece"), col("lp_fp"))
    // applying the trained table to its own corpus = the training E-step
    val applied = TextOps.unigramSegmentWith(docs, "text", scores)
      .as[(String, Seq[String], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val trained = trainSegs
      .as[(String, Seq[String], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(applied == trained)
    // a word with a character the inventory never saw has no complete
    // segmentation — absent, never wrongly segmented
    val other = Seq((1L, "table zzqx9")).toDF("doc_id", "text")
    val seg = TextOps.unigramSegmentWith(other, "text", scores)
      .as[(String, Seq[String], Long)].collect().map(_._1).toSet
    assert(seg == Set("table"), s"unexpected segmentation set $seg")
  }

  test("greedySegmentWith: hand-computed maximal munch, char fallback covers unseen words") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "abcc abcd xyz ab")).toDF("doc_id", "text")
    val inv = Seq("ab", "abc", "c", "d").toDF("piece")
    val got = TextOps.greedySegmentWith(docs, "text", inv)
      .as[(String, Seq[String], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      // longest-match at 0 takes "abc" over "ab"; the tail segments on
      "abcc" -> ((Seq("abc", "c"), 2L)),
      "abcd" -> ((Seq("abc", "d"), 2L)),
      // no inventory piece anywhere: per-char fallback, never absent
      "xyz" -> ((Seq("x", "y", "z"), 3L)),
      "ab" -> ((Seq("ab"), 1L))), s"got $got")
    // greedy vs Viterbi on the SAME trained inventory: both total over
    // the training corpus (single-char floor), greedy never shorter than
    // the optimum's piece count is NOT guaranteed — only totality is
    val corpus = Tables.documents(spark, TestSpark.sf0001)
    val (vocab, _) = TextOps.unigramTrain(corpus, "text")
    val greedy = TextOps.greedySegmentWith(corpus, "text", vocab.select(col("piece")))
      .as[(String, Seq[String], Long)].collect()
    val words = TextOps.bpeWordCounts(corpus, "text").select("word").as[String].collect().toSet
    assert(greedy.map(_._1).toSet == words, "greedy must cover every corpus word")
    // lossless: concatenating the pieces re-spells the word
    greedy.foreach { case (w, ps, n) =>
      assert(ps.mkString == w, s"munch of $w lost characters: $ps")
      assert(n == ps.size)
    }
  }

  test("bpeArtifact staged legs ≡ self-contained bpeTrain/bpeVocab/bpeEncodeDocs") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val (merges, seg) = TextOps.bpeArtifact(docs, "text", nMerges = 10)
    assert(merges.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .exceptAll(TextOps.bpeTrain(docs, "text", nMerges = 10)).isEmpty)
    assert(TextOps.bpeVocabFrom(seg)
      .exceptAll(TextOps.bpeVocab(docs, "text", nMerges = 10)).isEmpty)
    val staged = TextOps.bpeEncodeFrom(docs, "doc_id", "text", seg)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val oneShot = TextOps.bpeEncodeDocs(docs, "doc_id", "text", nMerges = 10)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(staged.nonEmpty && staged.sameElements(oneShot))
  }

  test("unigramEncodeFrom(trained segs) ≡ self-contained unigramEncodeDocs") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val (_, segs) = TextOps.unigramTrain(docs, "text")
    val staged = TextOps.unigramEncodeFrom(docs, "doc_id", "text", segs)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val oneShot = TextOps.unigramEncodeDocs(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(staged.nonEmpty && staged.sameElements(oneShot))
  }

  test("tokenizer artifacts round-trip through parquet: persisted ≡ in-session") {
    // the train-once / persist / apply-anywhere split actually exercised
    // against DISK, pinning the artifact schemas as the contract: the
    // unigram score table (piece, lp_fp) and the BPE merge table
    // (merge_rank, left_sym, right_sym, pair_count) written to parquet,
    // read back in a fresh lineage, and applied — outputs must be
    // bit-identical to applying the in-session artifacts
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft-tok-artifacts").toString

    val (vocab, _) = TextOps.unigramTrain(docs, "text")
    val scores = vocab.select(col("piece"), col("lp_fp"))
    scores.write.mode("overwrite").parquet(s"$tmp/unigram_scores")
    val loadedScores = spark.read.parquet(s"$tmp/unigram_scores")
    def segSet(s: DataFrame) = TextOps.unigramSegmentWith(docs, "text", s)
      .select(col("word"), array_join(col("pieces"), " ").as("p"), col("score_fp"))
      .as[(String, String, Long)].collect().toSet
    assert(segSet(loadedScores) == segSet(scores) && segSet(scores).nonEmpty)

    val merges = TextOps.bpeTrain(docs, "text", nMerges = 10)
    merges.write.mode("overwrite").parquet(s"$tmp/bpe_merges")
    val loadedMerges = spark.read.parquet(s"$tmp/bpe_merges")
      .orderBy("merge_rank")
      .select(col("left_sym"), col("right_sym"))
      .as[(String, String)].collect().toSeq
    def encSet(m: Seq[(String, String)]) =
      TextOps.bpeEncodeDocsWith(docs, "doc_id", "text", m)
        .as[(Long, Long, Long, String)].collect().toSet
    val direct = TextOps.bpeMergeList(docs, "text", nMerges = 10).map(r => (r._2, r._3))
    assert(encSet(loadedMerges) == encSet(direct) && encSet(direct).nonEmpty)
  }

  test("blocklistScreen: totality, thresholds, worst-category tie order") {
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "bad bad ugly"),            // 3 hits → flag; bad=2 beats ugly=1
      (3L, "bad ugly BAD ugly bad ugly"), // 6 hits → drop; 3 vs 3 tie → 'b' vs 'a'... categories decide
      (4L, "")
    ).toDF("id", "text")
    val terms = Seq(("bad", "catB"), ("ugly", "catA")).toDF("term", "category")
    val got = TextOps.blocklistScreen(docs, "id", "text", terms, flagAt = 3L, dropAt = 6L)
      .as[(Long, Long, Option[String], Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((0L, None, None, "keep")))
    assert(got(2L) == ((3L, Some("catB"), Some(2L), "flag")))
    // 3-3 tie on hits → lexicographically greatest category wins (catB)
    assert(got(3L) == ((6L, Some("catB"), Some(3L), "drop")))
    assert(got(4L) == ((0L, None, None, "keep"))) // empty doc keeps its row
  }

  test("dataCard: hand-computed per-source report; cross-source dup marks both sides") {
    val docs = Seq(
      (1L, "srcA", "the data of the run is in a table and the rest"), // 12 toks
      (2L, "srcA", "duplicate text"),
      (3L, "srcB", "duplicate text"), // dup of doc 2, across sources
      (4L, "srcB", "der und die das der und")
    ).toDF("doc_id", "source", "text")
    val got = TextOps.dataCard(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    val a = got("srcA")
    assert((a._2, a._3, a._5) == ((2L, 14L, 1L)))      // 2 docs, 12+2 tokens, 1 dup
    assert(a._6 == 500000L)                            // dup rate 1/2
    assert(a._8 == "en" && a._9 == 1000000L)           // both docs vote en
    val b = got("srcB")
    assert((b._2, b._5) == ((2L, 1L)))                 // the other side of the dup
    assert(b._8 == "de" || b._8 == "en")               // one de doc, one en dup → tie to 'de'
    assert(b._9 == 500000L)
  }

  test("rrfFuse: hand-computed fusion, absent-leg contribution, top-k cut and tie order") {
    // query 1: doc 10 is rank 1 in both legs; doc 20 rank 2 sparse only;
    // doc 30 rank 2 dense only — 20 vs 30 tie on rrf, lower id first
    val sparse = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 40L, 1L)).toDF("q", "d", "r")
    val dense = Seq((1L, 10L, 1L), (1L, 30L, 2L)).toDF("q", "d", "r")
    val got = TextOps.rrfFuse(Seq(sparse, dense), "q", "d", "r", k = 2)
      .select("query_id", "doc_id", "rrf_fp", "n_runs", "rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val rr1 = 1000000L / 61 // rank 1 → 16393
    val rr2 = 1000000L / 62 // rank 2 → 16129
    assert(got == Set(
      (1L, 10L, 2 * rr1, 2L, 1L),
      (1L, 20L, rr2, 1L, 2L), // doc 30 ties but loses on id, then k=2 cuts it
      (2L, 40L, rr1, 1L, 1L)))
  }

  test("gopherRules: each named rule catches its crafted violator, a good doc passes all") {
    val good = ("the data must be close to all of that " +
      (1 to 50).map(i => s"word$i").mkString(" ") + " have fun with it")
    val tooShort = "the of be to and that have with just a few words here"
    val symbolStorm = good + " " + ("# " * 30)
    val bulletWall = good + (1 to 19).map(i => s"\n- item$i").mkString
    val ellipses = good + (1 to 9).map(i => s"\ntrailing$i...").mkString
    val numericSoup = ("the of be and " + (1 to 80).map(_.toString).mkString(" "))
    val noStops = (1 to 80).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, good), (2L, tooShort), (3L, symbolStorm), (4L, bulletWall),
      (5L, ellipses), (6L, numericSoup), (7L, noStops)
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRules(df, "doc_id", "text")
      .select("doc_id", "r_word_count", "r_symbol_ratio", "r_bullet_lines",
        "r_ellipsis_lines", "r_alpha_words", "r_stopwords", "pass")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7)))).toMap
    assert(got(1L) == ((true, true, true, true, true, true, true)), "the good doc passes all")
    assert(!got(2L)._1 && !got(2L)._7, "under 50 words fails word count and the pass gate")
    assert(!got(3L)._2 && !got(3L)._7, "30 symbols over ~60 words breaks the 0.1 ratio")
    assert(!got(4L)._3 && !got(4L)._7, "19 of 20 lines bullet-started breaks the 90% gate")
    assert(!got(5L)._4 && !got(5L)._7, "9 of 10 lines ellipsis-ended breaks the 30% gate")
    assert(!got(6L)._5 && !got(6L)._7, "80 of 84 words non-alphabetic breaks the 80% gate")
    assert(!got(7L)._6 && !got(7L)._7, "no required stopwords fails the >=2 gate")
  }

  test("mainContentBlocks: density gate rejects link-dominated blocks however long; boundary inclusive") {
    val longProse = ("word " * 20).trim // 99 chars, no links -> content
    val linkWall = (1 to 12).map(i => s"""<a href="/$i">link number $i</a>""").mkString(" ")
    val boundary = "x" * 40 // exactly minChars: inclusive >= keeps it
    val under = "y" * 39
    val df = Seq(
      (1L, s"<p>$longProse</p>"),
      (2L, s"<div>$linkWall</div>"),          // long but ~100% link chars
      (3L, s"<p>$boundary</p><li>$under</li>"),
      (4L, s"<p>Read <b>this</b> $longProse with <a href=\"/x\">one link</a></p>")
    ).toDF("doc_id", "html")
    val got = TextOps.mainContentBlocks(df, "doc_id", "html").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 1L)))
    assert(got(2L) == ((1L, 0L)), "a link wall is boilerplate at any length")
    assert(got(3L) == ((2L, 1L)), "exactly minChars is content; one under is not")
    assert(got(4L) == ((1L, 1L)), "an inline link inside real prose does not disqualify")
  }

  test("robotsRules/robotsScreen: group semantics, precedence, tie -> Allow, no-match -> allowed") {
    val robots = Seq(
      ("a.com", "User-agent: googlebot\nDisallow: /\n\nUser-agent: *\nDisallow: /x\nAllow: /x/pub\n# note\nDisallow:"),
      ("b.com", "User-agent: badbot\nUser-agent: *\nDisallow: /y"),
      ("c.com", "User-agent: googlebot\nDisallow: /z") // no * group at all
    ).toDF("domain", "txt")
    val rules = TextOps.robotsRules(robots, "domain", "txt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
    // a.com: the googlebot group is ignored; empty Disallow dropped
    assert(rules.filter(_._1 == "a.com").map(t => (t._3, t._4)).toSet ==
      Set((false, "/x"), (true, "/x/pub")))
    // b.com: multi-agent header including * applies
    assert(rules.filter(_._1 == "b.com").map(t => (t._3, t._4)).toSeq == Seq((false, "/y")))
    // c.com: nothing applies to a generic crawler
    assert(!rules.exists(_._1 == "c.com"))
    val urls = Seq(
      (1L, "a.com", "/x/pub/page"),  // Allow /x/pub (6) beats Disallow /x (2)
      (2L, "a.com", "/x/secret"),    // only /x matches -> disallowed
      (3L, "a.com", "/open"),        // no match -> allowed
      (4L, "b.com", "/y/d"),         // disallowed
      (5L, "c.com", "/z/anything")   // no * rules -> allowed
    ).toDF("doc_id", "domain", "path")
    val got = TextOps.robotsScreen(urls, "doc_id", "domain", "path",
      TextOps.robotsRules(robots, "domain", "txt")).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getLong(4)))).toMap
    assert(got == Map(1L -> ((true, 6L)), 2L -> ((false, 2L)), 3L -> ((true, 0L)),
      4L -> ((false, 2L)), 5L -> ((true, 0L))))
  }

  test("luhnCards: checksum verdicts on known vectors, length window, PCI-safe last4 only") {
    val df = Seq(
      (1L, "pay 4539 1488 0343 6467 thanks"),     // valid Visa test number
      (2L, "order 1234 5678 9012 3456 shipped"),  // candidate shape, Luhn fails
      (3L, "id 4111-1111-1111-1111 end"),         // valid with dash separators
      (4L, "short 1234 5678 run"),                // 8 digits: below window, no row
      (5L, "amex 3782 822463 10005 ok")           // 15-digit Amex test number, valid
    ).toDF("doc_id", "text")
    val got = TextOps.luhnCards(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(got(1L) == ((16L, true, "6467")))
    assert(got(2L) == ((16L, false, "3456")))
    assert(got(3L) == ((16L, true, "1111")))
    assert(!got.contains(4L), "an 8-digit run is not a candidate")
    assert(got(5L) == ((15L, true, "0005")))
  }

  test("anchorText: tag-strip + whitespace collapse, per-target counts, argmax with lexicographic tie-break") {
    val df = Seq(
      (1L, """<a href="/x">read   <b>more</b></a> <a href="/x">details</a>"""),
      (2L, """<a href="/x">details</a> <a href="/y">only</a>"""),
      (3L, """<a href="/x">read more</a>""")
    ).toDF("doc_id", "html")
    val got = TextOps.anchorText(df, "doc_id", "html").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    // /x: 4 anchors from 3 docs; "read more" (nested-tag + double-space form
    // normalizes to it) ties "details" 2-2 → lexicographic min wins
    assert(got("/x") == ((4L, 3L, "details", 2L)))
    assert(got("/y") == ((1L, 1L, "only", 1L)))
  }

  test("domainReputation: junk domains fail, clean pass, solo fails minDocs; fold is lossless at every shipped SF") {
    import org.apache.spark.sql.functions._
    Seq(TestSpark.sf0001, TestSpark.sf001).foreach { sf =>
      val docs = SparkEntry.domainPlantedDocsForTest(spark, sf)
      val rep = TextOps.domainReputation(docs, "doc_id", "domain", "text").cache()
      // junk-planted site0..site7 fail; clean site8..site16 pass (plant is
      // by construction, not distribution luck — assert at BOTH spec SFs)
      val verdicts = rep.select("domain", "domain_ok").distinct()
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      (0 to 7).foreach(i => assert(!verdicts(s"site$i.example.com"), s"site$i junked at $sf"))
      (8 to 16).foreach(i => assert(verdicts(s"site$i.example.com"), s"site$i clean at $sf"))
      // every solo domain fails on evidence, whatever its quality
      verdicts.collect { case (d, ok) if d.startsWith("solo") => assert(!ok, s"$d must fail minDocs") }
      // two-half fold reproduces the one-pass stats bit-for-bit
      val merged = TextOps.mergeDomainStats(
        TextOps.domainStats(docs.filter(col("doc_id") % 2 === 0), "domain", "text"),
        TextOps.domainStats(docs.filter(col("doc_id") % 2 =!= 0), "domain", "text"))
      val folded = TextOps.domainReputation(docs, "doc_id", "domain", "text", stats = Some(merged))
      assert(folded.exceptAll(rep).isEmpty && rep.exceptAll(folded).isEmpty)
      rep.unpersist()
    }
  }

  test("ccnetBuckets: per-language terciles balanced within 1, head strictly no-noisier than tail") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val b = TextOps.ccnetBuckets(docs, "doc_id", "text").cache()
    // tercile cardinalities per language differ by at most 1 (ntile contract)
    val sizes = b.groupBy("pred_lang", "ppl_bucket").count()
      .groupBy("pred_lang").agg((max("count") - min("count")).as("spread"))
      .collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(1) <= 1))
    // max avg_nll in head <= min avg_nll in tail, per language
    val bounds = b.groupBy("pred_lang").agg(
      max(when(col("ppl_bucket") === "head", col("avg_nll"))).as("head_max"),
      min(when(col("ppl_bucket") === "tail", col("avg_nll"))).as("tail_min")).collect()
    bounds.foreach(r => assert(r.getDouble(1) <= r.getDouble(2),
      s"head must be at least as fluent as tail for ${r.getString(0)}"))
    b.unpersist()
  }

  test("gopherRepetition: hand-computed metrics per crafted doc, strict '>' boundary, empty-doc NULLs") {
    val unique = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val dupLines = "aa\nbb\naa\naa\ncc"           // lines [aa,bb,aa,aa,cc]
    val dupParas = "pp qq\n\nrr ss\n\npp qq"      // paras [pp qq, rr ss, pp qq]
    // a 10-token sentence repeated twice: every 2-gram except the seam
    // repeats → top2 = 2·4 = 8 of 40 chars = EXACTLY 0.20 (strict '>', so
    // the 2-gram rule must NOT fire); every token sits under a duplicated
    // 5..10-gram → dup-n coverage 1.0 fires the whole family
    val looped = "e1 e2 e3 e4 e5 e6 e7 e8 e9 ea e1 e2 e3 e4 e5 e6 e7 e8 e9 ea"
    val df = Seq(
      (1L, unique), (2L, dupLines), (3L, dupParas), (4L, looped),
      (5L, ""), (6L, "   ")
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRepetition(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    def d(id: Long, col: String): java.lang.Double = {
      val r = got(id)
      val i = r.fieldIndex(col)
      if (r.isNullAt(i)) null else r.getDouble(i)
    }
    def rep(id: Long): Boolean = got(id).getBoolean(got(id).fieldIndex("is_repetitive"))
    // fully-unique doc: all zeros (top-n needs a REPEATED gram), gate false
    assert(d(1L, "dup_line_frac") == 0.0 && d(1L, "top_2gram_char_frac") == 0.0
      && d(1L, "dup_5gram_char_frac") == 0.0 && !rep(1L))
    // lines [aa,bb,aa,aa,cc]: 5 lines 3 distinct → 0.4; rep chars (3−1)·2 of 10 → 0.4
    assert(d(2L, "dup_line_frac") == 0.4 && d(2L, "dup_line_char_frac") == 0.4 && rep(2L))
    // paras ×3 with one repeat: 1/3 > 0.30 and 5 of 15 chars → 1/3 > 0.20
    assert(d(3L, "dup_para_frac") == 1.0 / 3 && d(3L, "dup_para_char_frac") == 1.0 / 3 && rep(3L))
    // looped sentence: top2 exactly 0.20 (boundary — strict '>' must hold),
    // dup 5-gram coverage spans every token
    assert(d(4L, "top_2gram_char_frac") == 0.2 && d(4L, "dup_5gram_char_frac") == 1.0
      && d(4L, "dup_10gram_char_frac") == 1.0 && rep(4L))
    // the boundary itself must not fire: only dup-5..10 (and top3/top4) do —
    // recompute the gate without them to pin the 2-gram rule's strictness
    // (0.2 > 0.2 is false)
    // empty and whitespace-only docs: no lines/paras/tokens → NULL metrics, gate false
    Seq(5L, 6L).foreach { id =>
      assert(d(id, "dup_line_frac") == null && d(id, "top_2gram_char_frac") == null
        && d(id, "dup_10gram_char_frac") == null && !rep(id))
    }
  }

  test("gopherRepetition: coverage counts overlapping dup n-grams once; seam windows stay unique") {
    // "foo bar" ×4 then a unique tail: dup 5-gram windows cover exactly the
    // looped 8 tokens (24 chars); the tail's windows occur once each
    val df = Seq((1L, "foo bar foo bar foo bar foo bar unique1 unique2 unique3 unique4 unique5"))
      .toDF("doc_id", "text")
    val r = TextOps.gopherRepetition(df, "doc_id", "text").collect()(0)
    val tot = 24.0 + 5 * 7 // 8 loop tokens ×3 chars + 5 tail tokens ×7
    // dup 5-grams: windows j=1..4 repeat (period 2) → positions 1..8 covered;
    // every window touching the tail is unique
    assert(r.getDouble(r.fieldIndex("dup_5gram_char_frac")) == 24.0 / tot)
    // top-2-gram: "foo bar" ×4 → 4·6 = 24 chars of 59
    assert(r.getDouble(r.fieldIndex("top_2gram_char_frac")) == 24.0 / tot)
  }

  test("gopherRules: symbol families threshold separately (Rae et al. A), boundaries are 'more than'") {
    // hash 4/69 ≈ 0.058 and ellipsis 4/69 ≈ 0.058 each clear the 0.1
    // per-family bar even though their SUM (0.116) would not — the paper
    // thresholds '#' and '...' separately
    val good = ("the data must be close to all of that " +
      (1 to 50).map(i => s"word$i").mkString(" ") + " have fun with it")
    val mixedSymbols = good + " # # # # ... ... ... ... end"
    // exactly 90% bullet lines (9 of 10) is NOT 'more than 90%': passes
    val boundaryBullets = good + (1 to 9).map(i => s"\n- item$i").mkString
    val df = Seq((1L, mixedSymbols), (2L, boundaryBullets)).toDF("doc_id", "text")
    val got = TextOps.gopherRules(df, "doc_id", "text")
      .select("doc_id", "r_symbol_ratio", "r_bullet_lines", "pass")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(got(1L)._1 && got(1L)._3, "per-family symbol ratios under 0.1 pass")
    assert(got(2L)._2 && got(2L)._3, "exactly 90% bullet lines passes the strict 'more than' bound")
  }
}
