package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for the PII scrub primitives — the redaction behavior
  * itself, independent of the (PII-free) corpus fixture: emails/phones at
  * string boundaries, separator variants, near-misses that must NOT
  * match, and the email-before-phone ordering that keeps email-local-part
  * digits out of the phone pattern. `text_pii_scrub` then cross-verifies
  * the same patterns against DuckDB on injected synthetic PII. */
class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(texts: Seq[String]): Seq[(Int, Int, String)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        TextFunctions.emailCount(col("text")).as("e"),
        TextFunctions.phoneCount(col("text")).as("p"),
        TextFunctions.scrubPii(col("text")).as("s"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
  }

  private def one(text: String): (Int, Int, String) = run(Seq(text)).head

  test("canonicalizeUrl: every documented rule, plus garbage stability") {
    import spark.implicits._
    val cases = Seq(
      // scheme/host case + default port + fragment + tracking + sort + trailing slash
      ("HTTP://Example.COM:80/a/1/?utm_source=f&b=2&a=1#sec",
        "http://example.com/a/1?a=1&b=2"),
      ("https://EXAMPLE.com:443/x?a=1", "https://example.com/x?a=1"),
      // non-default port survives; all-tracking query drops the '?'
      ("https://cdn.Ex.com:8080/img/?gclid=abc&fbclid=z&msclkid=q&ref=tw",
        "https://cdn.ex.com:8080/img"),
      // empty path -> '/', empty params pruned, utm_ prefix family
      ("http://A.b.C?utm_campaign&&z=9&y=8", "http://a.b.c/?y=8&z=9"),
      // root path kept; https default port with explicit path
      ("https://host:443/", "https://host/"),
      // path/query case preserved, only scheme+host fold
      ("HTTPS://Host/Path/File?Q=V", "https://host/Path/File?Q=V"),
      // ftp: unknown scheme, port kept (no default known)
      ("FTP://Host:21/f", "ftp://host:21/f"),
      // whitespace trim
      ("  http://h/x  ", "http://h/x"),
      // userinfo and IPv6 literals stay opaque inside the host segment
      ("http://User@Host.com/x", "http://user@host.com/x"),
      ("https://[::1]:8080/v6", "https://[::1]:8080/v6"),
      ("https://[::1]:443/v6", "https://[::1]/v6"),
      // mixed tracking + real params interleaved, all resorted
      ("http://h/p?z=1&utm_a=2&y=3&gclid=4&x=5", "http://h/p?x=5&y=3&z=1"),
      // garbage in, stable garbage out — no exception
      ("not a url", "://not a url/"))
    val got = cases.map(_._1).toDF("url")
      .select(TextFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    for (((in, want), g) <- cases.zip(got))
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
  }

  test("emails are counted and redacted at start, middle, and end of string") {
    assert(one("alice@example.com wrote this") ==
      ((1, 0, "[EMAIL] wrote this")))
    assert(one("reply to bob.smith+tag@sub.domain.org for details") ==
      ((1, 0, "reply to [EMAIL] for details")))
    assert(one("send mail to carol_99@test.co") ==
      ((1, 0, "send mail to [EMAIL]")))
  }

  test("multiple emails in one document are each redacted") {
    assert(one("a@x.com then b@y.org") == ((2, 0, "[EMAIL] then [EMAIL]")))
  }

  test("phone variants: +prefix, parens, dashes, spaces") {
    assert(one("call +1 (555) 012-3456 now") == ((0, 1, "call [PHONE] now")))
    assert(one("tel: 555-012-3456") == ((0, 1, "tel: [PHONE]")))
    assert(one("+44 20 7946 0958") == ((0, 1, "[PHONE]")))
    assert(one("digits 01234567 end") == ((0, 1, "digits [PHONE] end")))
  }

  test("phone at string boundaries") {
    assert(one("555-012-3456 called") == ((0, 1, "[PHONE] called")))
    assert(one("they dialed 555-012-3456") == ((0, 1, "they dialed [PHONE]")))
  }

  test("near-misses are NOT redacted") {
    // no TLD / no domain dot → not an email; short digit runs → not phones
    val clean = Seq(
      "mention a@b without tld",
      "user at domain dot com",
      "only 12345 digits",
      "short 123 456 run",
      "version 1.2.3 of the lib")
    run(clean).zip(clean).foreach { case ((e, p, s), t) =>
      assert(e == 0 && p == 0 && s == t, s"false positive on: $t -> $s")
    }
  }

  test("clean text is a byte-exact no-op through the scrub") {
    val prose = "The quick brown fox jumps over the lazy dog, twice."
    assert(one(prose) == ((0, 0, prose)))
  }

  test("email redaction runs first: local-part digits never leave phone residue") {
    // '20251234567' inside the local part is phone-shaped on its own: the
    // raw-text phone COUNT sees it (identically on both engines), but the
    // scrub replaces the email first, so no '[PHONE]' token ever appears
    // inside a redacted address
    assert(one("u20251234567@example.com") == ((1, 1, "[EMAIL]")))
  }

  test("documents with both kinds redact both") {
    assert(one("u7@ex.com or +1 (555) 0107") == ((1, 1, "[EMAIL] or [PHONE]")))
  }

  test("the text_pii_scrub injected-cohort shape yields exactly one email and one phone") {
    // mirror of the in-query injection for doc_id = 33 — pins the cohort
    // contract the oracle comparison relies on (nonzero counts)
    assert(one("some doc text contact: u33@example.com or +1 (555) 0133") ==
      ((1, 1, "some doc text contact: [EMAIL] or [PHONE]")))
  }

  test("null text propagates null counts and scrub, never throws") {
    import spark.implicits._
    val out = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(
        TextFunctions.emailCount(col("text")),
        TextFunctions.phoneCount(col("text")),
        TextFunctions.scrubPii(col("text")))
      .head
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  // --- Gopher rule-filter fixtures: each doc violates exactly ONE rule
  // (plus one clean doc), so a surviving violator identifies WHICH bound
  // regressed rather than just "the filter changed" ---

  private def survivors(rows: Seq[(Long, String)]): Set[Long] = {
    import spark.implicits._
    TextQueries.gopherRules(rows.toDF("doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("gopher rules: clean prose survives, each single-rule violator is dropped") {
    val prose = "the cat and the dog ran over the hill while it was " +
      "raining and the farmer watched from the barn with his old friend"
    val fixtures = Seq(
      1L -> prose,                                   // every rule passes
      2L -> "the cat and the dog ran",               // too few tokens (7 < 20)
      3L -> (Seq("the", "and") ++ (1 to 23).map(i => "x" * 15 + i)).mkString(" "),
        // 23 DISTINCT 16-17 char tokens → mean_tok_len ≈ 15 > 10 is the
        // only violation ("the and" keeps stop_hits at 2, distinctness
        // keeps repetition at 0)
      4L -> (1 to 25).map(i => s"kw$i").mkString(" "), // zero stopwords
      5L -> (prose + " " + "!@#$%^&*()" * 12),       // alnum_ratio < 0.6
      6L -> Seq.fill(10)("the cat and").flatMap(_.split(" ")).mkString(" "))
        // 30 tokens, 3 distinct trigrams / 28 → repetition ≈ 0.89
    assert(survivors(fixtures) == Set(1L))
  }

  test("gopher rules: bounds are inclusive on both ends of the token-count band") {
    val tok20 = (Seq("the", "and") ++ (1 to 18).map(i => s"word$i")).mkString(" ")
    val tok19 = (Seq("the", "and") ++ (1 to 17).map(i => s"word$i")).mkString(" ")
    assert(survivors(Seq(1L -> tok20)) == Set(1L), "20 tokens is in-band")
    assert(survivors(Seq(1L -> tok19)).isEmpty, "19 tokens is out of band")
  }

  test("gopher rules: null text never survives and never throws") {
    assert(survivors(Seq(1L -> null.asInstanceOf[String])).isEmpty)
  }

  // --- span-level decontamination ---

  test("contamination spans: a verbatim 60-char copy of benchmark text is localized") {
    import spark.implicits._
    val benchText = "the quick brown fox jumps over the lazy dog while " +
      "the farmer watches from the barn door in the evening light"  // 109 chars
    val copied = benchText.substring(20, 80)                         // 60-char block
    val docs = Seq(
      7L  -> benchText,
      10L -> ("completely original content here with nothing shared at all " +
        "and plenty of its own words to fill forty characters"),
      11L -> ("intro text then " + copied + " and an original tail here")
    ).toDF("doc_id", "text")
    val out = TextQueries.contaminationSpansVs(docs, col("doc_id") === 7)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(4))).toMap
    // only the copying doc appears — never the benchmark doc itself, and
    // never the disjoint doc
    assert(out.keySet == Set(11L), s"got ${out.keySet}")
    val (nw, nc, firstPos) = out(11L)
    assert(nc >= 1 && nc < nw, "some but not all windows are contaminated")
    // the copy sits at corpus offset 17 — shifted 4 (mod 10) relative to
    // its benchmark origin, so stride-10 windows on BOTH sides would
    // never align and this exact case read Set() before the benchmark
    // side defaulted to stride 1; the earliest hit must lie inside the
    // copied region (1-based char 17, 60 chars long)
    assert(firstPos >= 17 && firstPos <= 17 + 60 - 40,
      s"first contaminated window at $firstPos must start inside the copy")
  }

  test("contamination spans: short and null docs are excluded, empty bench flags nothing") {
    import spark.implicits._
    val docs = Seq(
      1L -> "tiny",
      2L -> null.asInstanceOf[String],
      3L -> ("a normal length document with plenty of words to have " +
        "windows but no benchmark to hit")
    ).toDF("doc_id", "text")
    assert(TextQueries.contaminationSpansVs(docs, lit(false)).count() == 0)
  }

  // --- LM-perplexity quality score ---

  test("lm perplexity: common-bigram prose scores lower ppl than unique-bigram text") {
    import spark.implicits._
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the rug",
      3L -> "the cat sat on the hill",
      4L -> "zebra quark flux nebula prism glimmer",  // every bigram unique
      5L -> "single",                                  // <2 tokens: no evidence
      6L -> null.asInstanceOf[String]
    ).toDF("doc_id", "text")
    val out = TextQueries.lmPerplexityVs(docs)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "docs without bigrams are excluded")
    // n_bigrams = token count − 1 (multiplicity kept, not deduped)
    assert(out(1L)._1 == 5 && out(4L)._1 == 5)
    // docs 1-3 share 4 of 5 bigrams (seen 3x each in the model); doc 4's
    // are all singletons — its mean bigram probability must be lower
    assert(out(1L)._2 < out(4L)._2,
      s"shared-bigram doc must have lower perplexity: ${out(1L)._2} vs ${out(4L)._2}")
    assert(out.values.forall(_._2 > 0), "perplexity is strictly positive")
  }

  // --- BM25 ranked retrieval ---

  test("bm25 ranks the topically-matching doc first; disjoint docs never retrieved") {
    import spark.implicits._
    val docs = Seq(
      (7L, "spark shuffle partition executor memory"),                  // query
      (10L, "spark shuffle partition executor memory tuning guide here"), // near copy
      (11L, "spark overview with several extra unrelated words beyond"),  // partial overlap
      (12L, "cooking recipes for pasta and delicious tomato sauce")       // disjoint
    ).toDF("doc_id", "text")
    val out = TextQueries.bm25TopK(docs, col("doc_id") === 7, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.forall(_._1 == 7L), "only the query doc retrieves")
    val ranked = out.sortBy(_._3).map(_._2)
    assert(ranked.head == 10L, s"the near copy must rank first: ${ranked.toSeq}")
    assert(!ranked.contains(12L), "a doc sharing no terms can never score")
  }

  test("bm25 length normalization: same tf prefers the shorter document") {
    import spark.implicits._
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (7L, "target term here"),
      (10L, "target term here plus few more words"),
      (11L, s"target term here $filler")
    ).toDF("doc_id", "text")
    val out = TextQueries.bm25TopK(docs, col("doc_id") === 7, k = 2)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(out(10L) < out(11L),
      s"b>0 must penalize the padded doc at equal tf: $out")
  }

  // --- C4 line-level cleaning ---

  test("c4 line rules: each violator class is cut, clean prose lines survive") {
    import spark.implicits._
    val page = Seq(
      "this is a perfectly fine prose line.",   // kept
      "another good line ends with a question?", // kept
      "a third fine line with words.",           // kept
      "and a fourth one right here!",            // kept
      "the fifth good line of prose.",           // kept
      "no terminal punctuation on this line",    // cut: not terminal
      "too short.",                              // cut: <3 words
      "please enable javascript to continue.").mkString("\n") // cut: javascript
    val docs = Seq(
      (1L, page),
      (2L, "lorem ipsum dolor sit amet.\n" + page),  // page cut: lorem ipsum
      (3L, "function() { return 0; }\n" + page),     // page cut: brace
      (4L, "one good line is not enough."),          // page cut: <5 kept lines
      (5L, null.asInstanceOf[String])                // page cut: null
    ).toDF("doc_id", "text")
    val out = TextQueries.c4LineClean(docs)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out.keySet == Set(1L), s"survivors: ${out.keySet}")
    assert(out(1L) == ((8, 5)), s"8 lines in, 5 prose lines kept: ${out(1L)}")
  }

  test("c4 cleaned text contains exactly the kept lines in order") {
    import spark.implicits._
    val keptLines = Seq("first fine prose line.", "second fine prose line.",
      "third fine prose line.", "fourth fine prose line.", "fifth fine prose line.")
    val page = (keptLines.take(2) ++ Seq("cut me no punct") ++ keptLines.drop(2))
      .mkString("\n")
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(keptLines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = TextQueries.c4LineClean(Seq((1L, page)).toDF("doc_id", "text"))
      .collect().map(r => r.getString(3)).head
    assert(got == expectMd5, "cleaning must preserve kept-line order byte-exactly")
  }

  // --- DSIR importance weighting ---

  test("dsir weights rank target-overlapping docs above disjoint docs") {
    import spark.implicits._
    val docs = Seq(
      (7L, "alpha beta gamma delta alpha beta gamma delta"),    // target
      (107L, "alpha beta gamma epsilon alpha beta gamma zeta"), // target
      (10L, "alpha beta gamma delta epsilon intro words"),      // overlapping raw
      (11L, "totally different vocabulary entirely unrelated topic here"), // disjoint raw
      (12L, null.asInstanceOf[String])                          // null: excluded
    ).toDF("doc_id", "text")
    val w = TextQueries.dsirWeights(docs, col("doc_id") % 100 === 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val byId = w.map(x => x._1 -> x._3).toMap
    // only raw docs with tokens are scored — never the target cohort
    assert(byId.keySet == Set(10L, 11L), s"scored: ${byId.keySet}")
    // n_grams = unigrams + bigrams = 2·len − 1
    assert(w.find(_._1 == 10L).get._2 == 13)
    assert(byId(10L) > byId(11L),
      s"target-vocabulary overlap must raise the importance weight: $byId")
  }

  test("dsir weights: empty target cohort still yields finite scores") {
    import spark.implicits._
    val docs = Seq((1L, "some words here"), (2L, "other words there"))
      .toDF("doc_id", "text")
    val w = TextQueries.dsirWeights(docs, lit(false))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // p_target degrades to the uniform 1/B prior — weights finite, all docs scored
    assert(w.keySet == Set(1L, 2L))
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite), s"$w")
  }

  // --- Bloom decontamination vs the exact broadcast twin ---

  test("bloom contamination matches the exact twin bit-for-bit at tight fpp") {
    import spark.implicits._
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      7L  -> bench,                                   // the benchmark doc
      10L -> ("totally unrelated words here nothing shared at all " +
        "different content entirely"),                // disjoint → not flagged
      11L -> ("alpha beta gamma delta epsilon intro " +
        "plus some trailing filler words"),           // heavy overlap → flagged
      12L -> null.asInstanceOf[String]                // null: contributes nothing
    ).toDF("doc_id", "text")
    val isBench = col("doc_id") === 7
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_grams", "n_hit", "contamination")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val exact = key(TextQueries.contaminationVs(docs, isBench, 0.05))
    val bloom = key(TextQueries.contaminationBloomVs(docs, isBench, 0.05, 1e-6))
    assert(exact.map(_._1) == Set(11L), "fixture sanity: only 11 is contaminated")
    assert(bloom == exact,
      s"bloom (fpp=1e-6) must reproduce the exact twin here: $bloom vs $exact")
  }

  test("bloom contamination never under-reports: per-doc hits >= exact at any fpp") {
    import spark.implicits._
    val docs = (0L to 40L).map { i =>
      val shared = if (i % 3 == 0) "common phrase fragment repeated across docs "
        else ""
      (i, shared + s"unique body $i with words w${i}a w${i}b w${i}c w${i}d")
    }.toDF("doc_id", "text")
    val isBench = col("doc_id") % 10 === 0
    val exact = TextQueries.contaminationVs(docs, isBench, 0.0)
      .select(col("doc_id"), col("n_hit").as("n_hit_exact"))
    // deliberately coarse fpp: the superset property must hold regardless
    val bloom = TextQueries.contaminationBloomVs(docs, isBench, 0.0, 0.05)
    val under = bloom.join(exact, "doc_id")
      .where(col("n_hit") < col("n_hit_exact")).count()
    assert(under == 0, "bloom membership has no false negatives")
    assert(exact.join(bloom, Seq("doc_id"), "left_anti").count() == 0,
      "every exact-flagged doc is bloom-flagged")
  }

  test("bloom span decontamination matches the exact span twin at tight fpp, including the shifted copy") {
    import spark.implicits._
    // same geometry as the exact-span shifted-copy test: the copy's
    // offset shift is not ≡ 0 mod the corpus stride, so the any-offset
    // (stride-1) benchmark windows are what makes it findable — the
    // bloom form must preserve exactly that sensitivity
    val benchText = "the quick brown fox jumps over the lazy dog while " +
      "the farmer watches from the barn door in the evening light"
    val copied = benchText.substring(20, 80)
    val docs = Seq(
      7L  -> benchText,
      10L -> ("completely original content here with nothing shared at all " +
        "and plenty of its own words to fill forty characters"),
      11L -> ("intro text then " + copied + " and an original tail here")
    ).toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val exact = key(TextQueries.contaminationSpansVs(docs, col("doc_id") === 7))
    val bloom = key(TextQueries.contaminationSpansBloomVs(docs, col("doc_id") === 7,
      fpp = 1e-6))
    assert(exact.map(_._1) == Set(11L), "fixture sanity: only the copying doc")
    assert(bloom == exact,
      s"bloom spans (fpp=1e-6) must reproduce the exact twin here: $bloom vs $exact")
  }

  test("bloom span decontamination never under-reports at any fpp; empty bench flags nothing") {
    import spark.implicits._
    val boiler = "this exact boilerplate sentence is long enough to span windows "
    val docs = (0L to 40L).map { i =>
      val shared = if (i % 3 == 0) boiler else ""
      (i, shared + s"unique body $i padded with enough original words to " +
        s"clear the window floor w${i}a w${i}b w${i}c w${i}d w${i}e")
    }.toDF("doc_id", "text")
    val isBench = col("doc_id") % 10 === 0
    val exact = TextQueries.contaminationSpansVs(docs, isBench)
      .select(col("doc_id"), col("n_contam_windows").as("n_exact"))
    // deliberately coarse fpp: the superset property must hold regardless
    val bloom = TextQueries.contaminationSpansBloomVs(docs, isBench, fpp = 0.05)
    assert(exact.join(bloom, Seq("doc_id"), "left_anti").count() == 0,
      "every exact-flagged doc is bloom-flagged")
    assert(bloom.join(exact, "doc_id")
      .where(col("n_contam_windows") < col("n_exact")).count() == 0,
      "bloom membership has no span undercounts")
    assert(TextQueries.contaminationSpansBloomVs(docs, lit(false)).count() == 0,
      "an empty benchmark branch flags nothing (sentinel keeps the sketch alive)")
  }

  // --- paragraph dedup ---

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("paragraph dedup: keep-first across docs, within docs, and full-drop hashing") {
    import spark.implicits._
    val docs = Seq(
      1L -> "alpha\nbravo\ncharlie",
      2L -> "bravo\ndelta",         // bravo owned by doc 1
      3L -> "alpha\nalpha\necho",   // both alphas owned by doc 1
      4L -> "alpha\nbravo",         // every paragraph already owned
      5L -> null.asInstanceOf[String]
    ).toDF("doc_id", "text")
    val out = TextQueries.paragraphDedup(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "null text excluded, rest kept")
    assert(out(1L) == ((3, 3, md5Hex("alpha\nbravo\ncharlie"))),
      "the first owner keeps everything")
    assert(out(2L) == ((2, 1, md5Hex("delta"))))
    assert(out(3L) == ((3, 1, md5Hex("echo"))),
      "intra-doc repeats of a foreign paragraph are all dropped")
    assert(out(4L) == ((2, 0, md5Hex(""))),
      "a fully-duplicated doc reassembles to the empty string")
  }

  test("paragraph dedup: an intra-doc repeat whose first owner is the doc itself keeps one copy") {
    import spark.implicits._
    val docs = Seq(9L -> "same\nsame\nother").toDF("doc_id", "text")
    val r = TextQueries.paragraphDedup(docs).head
    assert((r.getInt(1), r.getInt(2)) == ((3, 2)))
    assert(r.getString(3) == md5Hex("same\nother"))
  }

  // --- boilerplate scrub ---

  test("boilerplate scrub: every occurrence cut, per-source scope, minDf floor") {
    import spark.implicits._
    // source A: 10 docs; "cookie banner" in 4 of them (df=4 >= 3,
    // 4*10 > 10*1) -> boilerplate, cut EVERYWHERE including doc 0.
    // "rare note" in 2 docs: df=2 < minDf -> kept.
    // source B: 3 docs all sharing "cookie banner" — but that's B's own
    // df=3, 3*10 > 3*1 -> boilerplate IN B independently.
    val a = (0L until 10L).map { i =>
      val banner = if (i < 4) "cookie banner\n" else ""
      val rare = if (i >= 8) "rare note\n" else ""
      (i, "A", s"${banner}${rare}content line $i")
    }
    val b = (10L until 13L).map(i => (i, "B", s"cookie banner\nbody $i"))
    val docs = (a ++ b).toDF("doc_id", "source", "text")
    val out = TextQueries.boilerplateScrub(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // doc 0: banner cut (even though it "owns" it), content kept
    assert(out(0L) == ((2, 1, md5Hex("content line 0"))))
    // doc 8 (no banner): rare note survives (below minDf), nothing cut
    assert(out(8L) == ((2, 0, md5Hex("rare note\ncontent line 8"))))
    // source B docs: banner cut under B's own threshold
    assert(out(10L) == ((2, 1, md5Hex("body 10"))))
  }

  test("boilerplate scrub: a fully-boilerplate doc hashes the empty string") {
    import spark.implicits._
    val docs = ((0L until 5L).map(i => (i, "S", "only line")) :+
      ((9L, "S", "only line")))
      .toDF("doc_id", "source", "text")
    val out = TextQueries.boilerplateScrub(docs)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.values.toSet == Set(md5Hex("")),
      "a doc that is entirely source-wide boilerplate reassembles empty")
  }

  // --- surgical span scrub ---

  /** Reference model: stride-grid window hits vs the bench substring set,
    * fixed-width interval merge, cut, for cross-checking the distributed
    * plan byte-exactly. */
  private def scrubModel(text: String, bench: Set[String], w: Int, stride: Int)
      : Option[(Int, Int, String)] = {
    if (text == null || text.length < w) return None
    val hits = (0 to text.length - w by stride)
      .filter(p => bench.contains(text.substring(p, p + w)))
    if (hits.isEmpty) return None
    val spans = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    hits.foreach { p =>
      if (spans.nonEmpty && p <= spans.last(1) + 1) spans.last(1) = p + w - 1
      else spans += Array(p, p + w - 1)
    }
    val kept = new StringBuilder
    var prev = 0
    spans.foreach { case Array(s, e) => kept ++= text.substring(prev, s); prev = e + 1 }
    kept ++= text.substring(prev)
    Some((spans.length, spans.map(s => s(1) - s(0) + 1).sum, md5Hex(kept.toString)))
  }

  test("span scrub: the cut text matches the reference model byte-exactly") {
    import spark.implicits._
    val benchText = "the quick brown fox jumps over the lazy dog while " +
      "the farmer watches from the barn door in the evening light"
    val copied = benchText.substring(20, 80)
    val docs = Seq(
      7L  -> benchText,
      10L -> ("completely original content here with nothing shared at all " +
        "and plenty of its own words to fill forty characters"),
      11L -> ("intro text then " + copied + " and an original tail here"),
      12L -> (copied + " " + copied)  // two copies → still one merged span?
    ).toDF("doc_id", "text")
    val w = 16; val stride = 4
    val bench = (0 to benchText.length - w).map(i => benchText.substring(i, i + w)).toSet
    val out = TextQueries.scrubContaminatedSpans(docs, col("doc_id") === 7,
        windowChars = w, stride = stride)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val expect = Seq(10L, 11L, 12L).flatMap { id =>
      val t = docs.where(col("doc_id") === id).head.getString(1)
      scrubModel(t, bench, w, stride).map(id -> _)
    }.toMap
    assert(out == expect, s"got $out\nexpected $expect")
    assert(out.contains(11L) && !out.contains(10L),
      "only docs with contaminated spans are returned")
  }

  test("span scrub: a fully-contaminated doc scrubs to the empty string") {
    import spark.implicits._
    val benchText = "abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijklmnopqrstuvwxyz"
    val docs = Seq(
      7L -> benchText,
      // length 60 ≡ 0 mod stride 4: the last grid window starts at 45 and
      // its span [45, 60] reaches the final char, so coverage is total
      8L -> benchText.substring(0, 60)
    ).toDF("doc_id", "text")
    val out = TextQueries.scrubContaminatedSpans(docs, col("doc_id") === 7,
      windowChars = 16, stride = 4).collect()
    assert(out.length == 1 && out.head.getLong(0) == 8L)
    assert(out.head.getInt(2) == 60, "every char removed")
    assert(out.head.getString(3) == md5Hex(""))
  }

  // --- heavy-hitter n-grams + CMS ---

  test("top n-grams: occurrence counts with lexicographic tie-break") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c a b c a b c",   // "a b c" ×3, "b c a" ×2, "c a b" ×2
      2L -> "x y z",               // "x y z" ×1
      3L -> "tiny doc",            // <3 tokens → no trigrams
      4L -> null.asInstanceOf[String]
    ).toDF("doc_id", "text")
    val out = TextQueries.topNgrams(docs, n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a b c", 3L, 1), ("b c a", 2L, 2), ("c a b", 2L, 3)),
      s"got ${out.toSeq}")
  }

  test("cms estimates never undercount and respect the eps bound on the fixture") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, s"common gram here plus unique tail u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    val est = TextQueries.ngramSketchEstimates(docs,
        Seq("common gram here", "gram here plus", "never seen gram"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("common gram here") >= 50L)
    assert(est("gram here plus") >= 50L)
    // N = 50 docs × 5 trigrams = 250; eps=1e-3 → slack < 1 ⇒ exact here
    assert(est("common gram here") == 50L && est("never seen gram") == 0L,
      s"sub-slack fixture must be exact: $est")
  }

  test("dup-span scrub: the first occurrence survives, every later copy is cut") {
    import spark.implicits._
    val block = "this exact block of text repeats verbatim across docs!!"  // 56 chars
    // both copies start at char offset 32 — aligned mod stride, so the
    // grids see the same windows (the operator's documented stride caveat
    // is exercised by the detection-side dupSpans tests)
    val docs = Seq(
      1L -> ("the original home of the block: " + block + " and a tail"),
      2L -> ("a later doc copying it whole".padTo(32, ' ') + block + " plus words"),
      3L -> "a doc with entirely original content and no shared windows at all"
    ).toDF("doc_id", "text")
    val w = 16; val stride = 4
    val out = TextQueries.scrubDupSpans(docs, windowChars = w, stride = stride)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // doc 1 owns every window first (smaller doc_id) — only doc 2 is cut;
    // doc 3 shares nothing
    assert(out.keySet == Set(2L), s"got ${out.keySet}")
    // reference: cut doc 2's windows that also occur in doc 1 on BOTH
    // stride grids (copy offsets differ, so only grid-aligned shared
    // windows are evidence — the documented stride caveat)
    val t1 = docs.where(col("doc_id") === 1).head.getString(1)
    val t2 = docs.where(col("doc_id") === 2).head.getString(1)
    val owned = (0 to t1.length - w by stride).map(i => t1.substring(i, i + w)).toSet
    val expect = scrubModel(t2, owned, w, stride).get
    assert(out(2L) == expect, s"got ${out(2L)} expected $expect")
  }

  test("dup-span scrub: intra-doc repeats keep the earliest copy") {
    import spark.implicits._
    val unit = "abcdefghijklmnop"  // exactly one window at stride-aligned repeats
    val docs = Seq(5L -> (unit + unit + unit)).toDF("doc_id", "text")
    val out = TextQueries.scrubDupSpans(docs, windowChars = 16, stride = 16).collect()
    assert(out.length == 1 && out.head.getInt(2) == 32,
      s"two later copies cut: ${out.toSeq}")
    assert(out.head.getString(3) == md5Hex(unit))
  }

  test("per-source vocab: HLL estimates agree with exact counts within 3 rsd") {
    import spark.implicits._
    val docs = (0L until 200L).map { i =>
      (i, s"src${i % 4}", s"common words everywhere plus unique u${i}a u${i}b u${i}c")
    }.toDF("doc_id", "source", "text")
    val est = TextQueries.vocabHllVs(docs)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(3)))).toMap
    // exact: 50 docs per source; vocab = 4 common + 1 ("plus") + 3×50 unique
    est.foreach { case (src, (nDocs, nVocab)) =>
      assert(math.abs(nDocs - 50) <= math.ceil(50 * 0.15),
        s"$src doc estimate $nDocs vs 50")
      assert(math.abs(nVocab - 155L) <= math.ceil(155 * 0.15),
        s"$src vocab estimate $nVocab vs 155")
    }
  }

  test("chunkDocs: exact boundaries, redundant tail dropped, byte-exact content") {
    import spark.implicits._
    val t95 = "x" * 95
    val docs = Seq(
      1L -> "short doc",          // len 9 < max → one chunk
      2L -> ("a" * 100),          // starts 1,31,61,91; 91 > 100−10 → dropped
      3L -> t95                   // starts 1,31,61,91 → 91 dropped; e=95
    ).toDF("doc_id", "text")
    val out = TextQueries.chunkDocs(docs, maxChars = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out.keySet.count(_._1 == 1L) == 1 && out((1L, 0)) == ((1, 9, md5Hex("short doc"))))
    // doc 2: chunks [1,40],[31,70],[61,100]; the s=91 tail adds nothing
    // beyond chunk 2's overlap and must be dropped
    assert(out.keySet.count(_._1 == 2L) == 3, s"${out.keySet}")
    assert(out((2L, 2)) == ((61, 100, md5Hex("a" * 40))))
    // doc 3: last kept chunk is cut at len
    assert(out((3L, 2)) == ((61, 95, md5Hex("x" * 35))))
    // coverage: kept chunks tile every character of every doc
    out.groupBy(_._1._1).foreach { case (id, chunks) =>
      val covered = chunks.values.flatMap { case (s, e, _) => s to e }.toSet
      val len = Map(1L -> 9, 2L -> 100, 3L -> 95)(id)
      assert(covered == (1 to len).toSet, s"doc $id coverage hole")
    }
  }

  test("quality budget: ceil(0.8n) kept, selection is the lexicographic prefix") {
    val out = TextQueries.qualityBudget.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val kept = out.filter(_._3 == 1).map(r => (r._2, r._1))
    val dropped = out.filter(_._3 == 0).map(r => (r._2, r._1))
    assert(kept.length == math.ceil(0.8 * out.length).toLong)
    // deterministic (score, id) tie-break: every kept key precedes every
    // dropped key in lexicographic order
    val keptMax = kept.max
    val droppedMin = dropped.min
    assert(Ordering[(Double, Long)].lt(keptMax, droppedMin),
      s"kept max $keptMax vs dropped min $droppedMin")
  }

  test("quality threshold: cutoff keeps ~the target fraction; ties stay one side") {
    import spark.implicits._
    // 100 docs: 70 clean (repetition 0 — a massive tie at the cutoff
    // region), 30 with increasing repetition
    val docs = (0L until 100L).map { i =>
      val text =
        if (i < 70) s"unique words only here ${i}a ${i}b ${i}c ${i}d ${i}e"
        else ("repeat me now " * (i - 68).toInt).trim
      (i, text)
    }.toDF("doc_id", "text")
    val res = TextQueries.qualityThresholdVs(docs, keepRate = 0.6).collect()
    assert(res.length == 100)
    val cutoff = res.head.getDouble(2)
    // the 60th percentile of a 70%-zero distribution is 0 — every zero
    // doc is kept (value threshold: ties never straddle the cut)
    assert(cutoff == 0.0, s"cutoff $cutoff")
    assert(res.count(_.getInt(3) == 1) == 70)
    res.foreach { r =>
      assert((r.getDouble(1) <= cutoff) == (r.getInt(3) == 1))
    }
  }

  test("BPE training reproduces the classic Sennrich merge order; encode applies it") {
    import spark.implicits._
    // the Sennrich et al. 2016 §3.2 example vocabulary, as a corpus whose
    // word counts reproduce it: low×5, lower×2, newest×6, widest×3
    val docs = Seq(
      1L -> (("low " * 5) + ("lower " * 2)).trim,
      2L -> (("newest " * 6) + ("widest " * 3)).trim
    ).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, numMerges = 5, minPairCount = 1)
    // pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8... tie (e,s)/(s,t)
    // broken lexicographically → (e,s); then (es,t)=9; then (l,o)=7,
    // (lo,w)=7 → (l,o) first; then (lo,w); then (n,e)=6 vs (w,e): after
    // "es" merge w-e survives only in "we" of newest? n-e=6, w-i=3,
    // e-w... verify the documented greedy order:
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")), s"got $merges")
    assert(merges(2) == (("l", "o")) && merges(3) == (("lo", "w")), s"got $merges")
    // encode: "lowest" was never a training word, but the learned merges
    // segment it into the reusable subwords
    val enc = BpeTrainer.encodeWord("lowest", merges)
    assert(enc.sameElements(Array("low", "est")), s"got ${enc.toSeq}")
    // segmentCounts: doc 1 = 5·"low" + 2·"lower"; with the 5 merges
    // low→1 token, lower→2 (low+e+r → wait for merge list) — assert via
    // the encode primitive instead of hand numbers
    val counts = BpeTrainer.segmentCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val exp1 = 5 * BpeTrainer.encodeWord("low", merges).length +
      2 * BpeTrainer.encodeWord("lower", merges).length
    assert(counts(1L) == ((5 * 3 + 2 * 5, exp1)), s"${counts(1L)} vs $exp1")
    // empty merge list: one token per character symbol
    val noMerge = BpeTrainer.segmentCounts(docs, Seq.empty)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(noMerge(1L)._1 == noMerge(1L)._2)
  }

  test("driver md5Hash64Jvm is bit-identical to the column expression") {
    import spark.implicits._
    val samples = Seq("common gram here", "a", "", "üñïçôdé mix 42", "x y z")
    val fromCol = samples.toDF("s")
      .select(TextFunctions.md5Hash64(col("s")))
      .collect().map(_.getLong(0))
    assert(fromCol.toSeq == samples.map(TextFunctions.md5Hash64Jvm),
      "sketch inserts (column) and query reads (driver) must hash alike")
  }
}

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("distributed fit matches the sequential driver twin") {
    val dist = QualityClassifier.train(docs, epochs = 10)
    val local = QualityClassifier.trainLocal(docs, epochs = 10)
    assert(dist.threshold == local.threshold)
    val rel = math.abs(dist.lossHistory.last - local.lossHistory.last) /
      local.lossHistory.last
    assert(rel <= 1e-9, s"loss ${dist.lossHistory.last} vs ${local.lossHistory.last}")
    dist.weights.zip(local.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9, s"weight gap ${math.abs(a - b)}")
    }
  }

  test("training reduces loss and separates the teacher classes") {
    val m = QualityClassifier.train(docs)
    assert(m.lossHistory.last < m.lossHistory.head * 0.6,
      s"loss did not move: ${m.lossHistory.head} -> ${m.lossHistory.last}")
    // in-sample AUC must be near-perfect if the optimizer works at all
    val auc = QualityClassifier.aucOf(
      QualityClassifier.score(docs, m),
      QualityClassifier.teacherLabels(docs, m.threshold))
    assert(auc >= 0.9, s"in-sample AUC $auc")
  }

  test("featurize is deterministic, bounded, and null-safe") {
    val (i1, v1) = QualityClassifier.featurize("The quick brown fox", 256)
    val (i2, v2) = QualityClassifier.featurize("The quick brown fox", 256)
    assert(i1.toSeq == i2.toSeq && v1.toSeq == v2.toSeq)
    assert(i1.forall(_ < 256 + QualityClassifier.DenseStats))
    // null/empty text: no hashed n-grams, just 4 raw stats + 4 one-hot
    // bucket slots, all finite
    val (i0, v0) = QualityClassifier.featurize(null, 256)
    assert(i0.length == 8 && v0.forall(!_.isNaN))
    val (ie, ve) = QualityClassifier.featurize("", 256)
    assert(ie.length == 8 && ve.forall(!_.isNaN))
  }

  test("auc: exact rank formula with tie handling") {
    // perfect separation
    assert(QualityClassifier.auc(Array((0.9, 1.0), (0.8, 1.0), (0.2, 0.0))) == 1.0)
    // reversed
    assert(QualityClassifier.auc(Array((0.1, 1.0), (0.9, 0.0))) == 0.0)
    // all-tied scores -> 0.5 by average ranks
    assert(QualityClassifier.auc(Array((0.5, 1.0), (0.5, 0.0), (0.5, 1.0))) == 0.5)
    // degenerate single class
    assert(QualityClassifier.auc(Array((0.5, 1.0), (0.7, 1.0))) == 0.5)
  }
}
