package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct semantics checks for the text-quality helpers whose main gate is
  * the DuckDB oracle battery (q_text_*): here the REPETITION metrics must
  * actually separate boilerplate from varied text. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionMetrics: boilerplate scores low TTR / high top fraction") {
    val docs = Seq(
      (1L, "spam spam spam spam spam ham"),          // machine-repetitive
      (2L, "every word here is completely different") // varied prose
    ).toDF("doc_id", "text")
    val m = TextFunctions.repetitionMetrics(
        docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok")),
        "doc_id", "tok")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n1, d1, ttr1, top1) = m(1L)
    val (n2, d2, ttr2, top2) = m(2L)
    assert(n1 === 6L && d1 === 2L)
    assert(ttr1 < ttr2, "repetitive text must have the lower type-token ratio")
    assert(top1 > top2, "repetitive text must have the higher top-token fraction")
    assert(math.abs(top1 - 5.0 / 6.0) < 1e-6) // rounded to 6 places upstream
    assert(n2 === 6L && d2 === 6L && ttr2 === 1.0)
  }

  test("gopherGate: each rule fires on its own pathological fixture") {
    val good = ("the cat sat with the dog and that was fine to see " +
      "because everyone have been waiting of course ") * 4 // >50 words, stopword-rich
    val docs = Seq(
      (1L, good),
      (2L, "short doc"),                               // word-count floor
      (3L, ("## " * 60) + good),                       // symbol ratio (#/word)
      (4L, (1 to 60).map(_ => "- bullet line").mkString("\n")), // bullet lines
      (5L, good.split(" ").take(60).mkString("...\n") + "..."), // ellipsis line ends
      (6L, (1 to 60).map(_ => "12345").mkString(" ")), // alpha fraction
      (7L, (1 to 60).map(i => s"w$i").mkString(" ")),  // stopword evidence
      (8L, "")                                         // empty: fails, no NULLs
    ).toDF("doc_id", "text")
    val out = TextFunctions.gopherGate(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(15), s"healthy doc must pass: ${out(1L)}")
    assert(!out(2L).getBoolean(8) && !out(2L).getBoolean(15), "word-count floor")
    assert(!out(3L).getBoolean(10), "symbol-to-word ratio")
    assert(!out(4L).getBoolean(11), "bullet-line fraction")
    assert(!out(5L).getBoolean(12), "ellipsis-line fraction")
    assert(!out(6L).getBoolean(13), "alphabetic-word fraction")
    assert(!out(7L).getBoolean(14), "distinct-stopword evidence")
    val empty = out(8L)
    assert(!empty.getBoolean(15) && !empty.anyNull,
      s"empty doc must fail with explicit zeros, not NULLs: $empty")
  }

  test("canonicalText makes composed and decomposed Unicode digest-identical") {
    import org.apache.spark.sql.functions.{col, sha2}
    // the same word three ways: NFC composed, NFD decomposed, case+space noise
    val docs = Seq(
      (1L, "Café au lait"),          // composed é
      (2L, "Café au lait"),         // e + combining acute
      (3L, "  CAFÉ   AU  LAIT ")     // composed uppercase É + noise
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextFunctions.canonicalText(col("text")).as("canon"),
        sha2(TextFunctions.canonicalText(col("text")), 256).as("digest"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == "café au lait")
    assert(out.values.map(_._1).toSet.size == 1,
      s"all three variants must canonicalize identically: ${out.values.map(_._1)}")
    assert(out.values.map(_._2).toSet.size == 1,
      "content digests must collapse — this is the dedup-miss the op closes")
    // ASCII fast path: identity, and NULL propagates
    val ascii = Seq((1L, "plain ascii text")).toDF("doc_id", "text")
      .select(TextFunctions.unicodeNfc(col("text"))).head().getString(0)
    assert(ascii == "plain ascii text")
    val nul = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(TextFunctions.canonicalText(col("text"))).head()
    assert(nul.isNullAt(0))
  }

  test("stripAccents/foldForMatch: marks dropped, letters kept, forms collapse") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "Hanwëlla"),              // composed diaeresis
      (2L, "Hanwëlla"),             // e + combining diaeresis (NFD)
      (3L, "café señor āē"),         // acute/tilde/macron
      (4L, "Øystein straße æon"),    // NON-decomposable letters: unchanged
      (5L, "plain ascii"))
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        TextFunctions.stripAccents(col("text")).as("s"),
        TextFunctions.foldForMatch(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(1L)._1 == "Hanwella" && got(2L)._1 == "Hanwella",
      "both Unicode forms must strip to the same ASCII")
    assert(got(1L)._2 == "hanwella" && got(2L)._2 == "hanwella")
    assert(got(3L)._1 == "cafe senor ae")
    // ß/ø/æ are LETTERS, not accents — a transliterator would be lying
    assert(got(4L)._1 == "Øystein straße æon")
    assert(got(5L)._1 == "plain ascii", "ASCII identity fast path")
    // NULL propagates; codegen (no fallback) for the expression chain
    val df = rows.select(TextFunctions.foldForMatch(col("text")))
    assert(!df.queryExecution.executedPlan.toString.contains("CodegenFallback"))
    val nul = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(TextFunctions.stripAccents(col("text"))).head()
    assert(nul.isNullAt(0))
  }

  test("normalizeUrl: host case, ports, slashes, tracking params, ordering, fragments") {
    val cases = Seq(
      // the full gauntlet collapses to one key
      "HTTPS://Site.COM:443/A/Path/?b=2&utm_source=x&a=1#frag" ->
        "https://site.com/A/Path?a=1&b=2",
      "https://site.com/A/Path?a=1&b=2" -> "https://site.com/A/Path?a=1&b=2",
      // http default port; params all tracking → no '?' at all
      "HTTP://x.org:80/p?utm_campaign=c&fbclid=1&gclid=2" -> "http://x.org/p",
      // non-default port survives; path case survives
      "https://x.org:8443/P" -> "https://x.org:8443/P",
      // root URL: trailing slash strips to the bare authority
      "https://x.org/" -> "https://x.org",
      // utm must match as a PREFIX key, not a substring (param named
      // 'autumn' survives; value mentioning utm_ survives)
      "https://x.org/p?autumn=1&q=utm_source" ->
        "https://x.org/p?autumn=1&q=utm_source",
      // non-URL strings pass through lightly (no authority to rewrite)
      "not a url" -> "not a url")
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "u")
      .select(col("id"), TextFunctions.normalizeUrl(col("u")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"for '$u': got '${got(i.toLong)}' want '$want'")
    }
  }

  test("sentences: rule-based boundaries, degenerate cases, and stats agree with the split") {
    val cases = Seq(
      1L -> "One sentence here. Two follows!   Three asks? no boundary after lowercase",
      2L -> "no boundary at all",
      3L -> "", // empty → one empty sentence
      4L -> "Dr. Smith arrived. He sat.", // abbreviation splits — documented rule behavior
      5L -> "Ünïcode über. Ärger begins.") // \p{Lu} catches non-ASCII capitals
    val df = cases.toDF("id", "t")
    val got = df.select(col("id"),
        TextFunctions.sentences(col("t")).as("ss"),
        TextFunctions.sentenceStats(col("t")).as("st"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getStruct(2).getLong(0),
          r.getStruct(2).getDouble(1)))).toMap
    assert(got(1L)._1 === Seq("One sentence here.", "Two follows!",
      "Three asks? no boundary after lowercase"))
    assert(got(2L)._1 === Seq("no boundary at all"))
    assert(got(3L)._1 === Seq(""))
    assert(got(4L)._1 === Seq("Dr.", "Smith arrived.", "He sat."))
    assert(got(5L)._1 === Seq("Ünïcode über.", "Ärger begins."))
    // stats must equal what the materialized split implies, for every case
    got.foreach { case (id, (ss, n, mean)) =>
      assert(n == ss.length, s"id $id")
      val want = math.rint(ss.map(_.length).sum.toDouble / ss.length * 100) / 100
      assert(math.abs(mean - want) < 1e-9, s"id $id: $mean vs $want")
    }
  }

  test("duplicateLineMetrics: hand-computed fractions; empties dropped; no-line doc scores 0") {
    val docs = Seq(
      // 4 lines, "dup" twice (3+3 of 3+3+5+4=15 chars): 2/4 lines, 6/15 chars
      (1L, "dup\ndup\nalpha\nbeta"),
      (2L, "a\n\n  \nb"), // whitespace-only lines drop → 2 lines, no dups
      (3L, ""),           // no surviving lines → explicit zeros
      (4L, "  x \nx"))    // trim makes these DUPLICATES: 2/2 lines
      .toDF("doc_id", "text")
    val got = TextFunctions.duplicateLineMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 0.5, 0.4)))
    assert(got(2L) === ((2L, 0.0, 0.0)))
    assert(got(3L) === ((0L, 0.0, 0.0)))
    assert(got(4L) === ((2L, 1.0, 1.0)))
  }

  test("repetitionGate: each paper threshold fires on its own pathological doc") {
    val clean = (1 to 40).map(i => s"u$i").mkString(" ") // all-unique tokens
    val docs = Seq(
      (1L, clean),                                      // passes everything
      (2L, Seq.fill(4)("dup line").mkString("\n") + "\nunique one\nunique two"),
      // ^ 4 duplicate lines of 6 → dup_line_frac = 0.667 > 0.30
      (3L, (1 to 16).map(_ => "x y").mkString(" ") + " " + clean))
      // ^ "x y" occurs 16x over ~214 chars → top2gram_frac ≈ 0.22 > 0.20
      .toDF("doc_id", "text")
    val got = TextFunctions.repetitionGate(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(6),
        r.getDouble(1), r.getDouble(3)))).toMap
    assert(got(1L)._1, s"clean doc must pass: ${got(1L)}")
    assert(!got(2L)._1 && got(2L)._2 > 0.30,
      s"duplicate lines must fail the line rule: ${got(2L)}")
    assert(!got(3L)._1 && got(3L)._3 > 0.20,
      s"bigram spam must fail the 2-gram rule: ${got(3L)}")
  }

  test("readabilityScore: hand-computed Flesch-style cases; short simple text scores higher") {
    val cases = Seq(
      // 1 sentence, 3 words, vowel groups: "The"(1) "cat"(1) "sat"(1) = 3
      // 206.835 - 1.015*3 - 84.6*1 = 119.19
      1L -> "The cat sat",
      // complex: 1 sentence, 3 words, groups: in-com-pre-hen-si-bil-i-ty…
      2L -> "incomprehensibility notwithstanding electroencephalography",
      3L -> "")
    val got = cases.toDF("id", "t")
      .select(col("id"), TextFunctions.readabilityScore(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 119.19)
    assert(got(3L) === 0.0, "empty text scores the explicit 0 guard")
    assert(got(1L) > got(2L),
      "polysyllabic single-sentence text must score lower (harder)")
  }
}
