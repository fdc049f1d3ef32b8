package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.BpeMerges

/** Real-BPE tokenizer: hand-verified encodings, the min-rank ⇄ rank-order-
  * sweep equivalence that the DuckDB oracle relies on, reconstruction and
  * determinism properties, trainer behavior, and the codegen posture. */
class BpeSpec extends SparkSpec {

  private val tiny = BpeMerges(IndexedSeq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("in", "g")))

  test("hand-verified encodings against the tiny table") {
    assert(tiny.encodeWord("the").toSeq == Seq("the"))
    assert(tiny.encodeWord("thern").toSeq == Seq("the", "r", "n"))
    assert(tiny.encodeWord("and").toSeq == Seq("and"))
    assert(tiny.encodeWord("ander").toSeq == Seq("and", "er"))
    assert(tiny.encodeWord("singing").toSeq == Seq("s", "ing", "ing"))
    assert(tiny.encodeWord("x").toSeq == Seq("x"))
    assert(tiny.encodeWord("").toSeq == Seq.empty)
    // leftmost-first on overlapping occurrences: "ththe" → th, th, e →
    // second th then absorbs e
    assert(tiny.encodeWord("ththe").toSeq == Seq("th", "the"))
  }

  test("min-rank iterative encoding equals the rank-order sweep (oracle form)") {
    // independent reimplementation: apply each merge everywhere, in rank
    // order, left-to-right — the nested-replace() form a SQL engine replays
    def sweep(m: BpeMerges, word: String): Seq[String] = {
      var syms: Vector[String] = word.map(_.toString).toVector
      m.pairs.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(200).collect().map(_.getString(0))
    val base = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct
    // the synthetic vocab is small (31 words) — stress the equivalence on
    // pairwise concatenations too (unseen shapes, partial merges)
    val words = base ++ (for (a <- base.take(30); b <- base.take(30)) yield a + b)
    assert(words.length > 500, "word population must be non-trivial")
    words.foreach { w =>
      assert(tiny.encodeWord(w).toSeq == sweep(tiny, w),
        s"algorithms diverge on '$w'")
    }
    // and against the committed trained table
    val m = Bpe.defaultMerges
    words.foreach { w =>
      assert(m.encodeWord(w).toSeq == sweep(m, w),
        s"trained-table divergence on '$w'")
    }
  }

  test("token concatenation reconstructs the word exactly") {
    val m = Bpe.defaultMerges
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(100).collect().map(_.getString(0))
      .flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct
    words.foreach { w =>
      assert(m.encodeWord(w).mkString == w, s"lossy encoding of '$w'")
    }
  }

  test("symbol-causality validation rejects an acausal table") {
    val e = intercept[IllegalArgumentException] {
      BpeMerges(IndexedSeq(("th", "e"))) // 'th' produced by no earlier merge
    }
    assert(e.getMessage.contains("causality"))
  }

  test("merges.txt round-trip and comment/blank handling") {
    val txt = "# comment\nt h\n\nth e\n"
    val m = Bpe.loadMerges(txt.linesIterator)
    assert(m.pairs == IndexedSeq(("t", "h"), ("th", "e")))
    assert(Bpe.loadMerges(Bpe.renderMerges(m).linesIterator) == m)
  }

  test("trainer learns the dominant pairs deterministically") {
    import spark.implicits._
    val df = Seq.fill(50)("the then there").toDF("text")
    val m1 = Bpe.train(df, "text", numMerges = 4)
    val m2 = Bpe.train(df, "text", numMerges = 4)
    assert(m1 == m2, "training must be deterministic")
    // (t,h) and (h,e) tie at 150 occurrences; the lexicographic tiebreak
    // picks (h,e), then (t,he) dominates, then the 50-count ties resolve
    // lexicographically: (r,e) before (the,n)
    assert(m1.pairs == IndexedSeq(("h", "e"), ("t", "he"), ("r", "e"),
      ("the", "n")))
    // trained tables are causal by construction (BpeMerges validated) and
    // the learned 'the' symbol applies inside unseen words
    assert(m1.encodeWord("thex").toSeq == Seq("the", "x"))
  }

  test("column API: codegen'd bpe_tokens with no fallback, null passthrough") {
    import spark.implicits._
    val df = Seq(("a", "the band sang"), ("b", ""), ("c", "in  the\nend"))
      .toDF("id", "text")
    val out = df.select(col("id"), Bpe.tokens(col("text"), tiny).as("toks"),
      Bpe.tokenCount(col("text"), tiny).as("n"))
    val rows = out.collect().map(r =>
      r.getString(0) -> (r.getSeq[String](1), r.getLong(2))).toMap
    assert(rows("a")._1 == Seq("the", "b", "and", "s", "an", "g"))
    assert(rows("b") == (Seq.empty, 0L))
    // whitespace runs (double space, newline) split without empty tokens
    assert(rows("c")._1 == Seq("in", "the", "e", "n", "d"))
    // plan posture over a REAL scan (a local relation constant-folds the
    // expression away before execution)
    val pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Bpe.tokens(col("text"), tiny).as("toks"))
    pq.collect()
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("bpe_tokens"), plan.take(800))
    assert(!plan.contains("CodegenFallback"), plan.take(800))
  }

  test("packChunks budgets with BPE counts when asked") {
    import spark.implicits._
    val df = Seq((1L, "thern thern"), (2L, "x"), (3L, "thern"))
      .toDF("doc_id", "text")
    // whitespace counts: 2,1,1; tiny-table BPE counts: 6,1,3 ("thern" → the,r,n)
    val ws = graft.trainprep.TrainPrep.packChunks(df, "doc_id", "text", 4L)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(ws.toSeq == Seq((2L, 0L), (1L, 0L), (1L, 0L)))
    val bpe = graft.trainprep.TrainPrep.packChunks(df, "doc_id", "text", 4L,
        tokenCountFn = Bpe.tokenCount(_, tiny))
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(3)))
    // 6 BPE tokens fill chunk 0 and spill into chunk 1; doc 2 starts at
    // offset 6 → chunk 1; doc 3 at 7 → chunk 1
    assert(bpe.toSeq == Seq((6L, 0L), (1L, 1L), (3L, 1L)))
  }

  test("property: random causal tables keep min-rank == sweep and reconstruction") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): Option[A] =
      g.apply(Gen.Parameters.default, Seed(seed))
    // grow a random CAUSAL table: each merge joins two symbols drawn from
    // {current single chars} ∪ {earlier outputs} — exactly the population
    // a real trainer draws from
    val alphabet = "abcdef".map(_.toString)
    def randomTable(seed: Long): BpeMerges = {
      val rnd = new scala.util.Random(seed)
      val syms = collection.mutable.ArrayBuffer[String](alphabet: _*)
      val pairs = collection.mutable.ArrayBuffer.empty[(String, String)]
      val seen = collection.mutable.Set.empty[(String, String)]
      while (pairs.length < 12) {
        val l = syms(rnd.nextInt(syms.length))
        val r = syms(rnd.nextInt(syms.length))
        if ((l + r).length <= 8 && !seen((l, r))) {
          seen += ((l, r)); pairs += ((l, r)); syms += l + r
        }
      }
      BpeMerges(pairs.toIndexedSeq)
    }
    def sweep(m: BpeMerges, word: String): Seq[String] = {
      var syms: Vector[String] = word.map(_.toString).toVector
      m.pairs.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val wordGen = Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alphabet)).map(_.mkString))
    for (ts <- 0L until 25L) {
      val table = randomTable(ts)
      for (ws <- 0L until 80L; w <- sample(wordGen, ts * 1000 + ws)) {
        val enc = table.encodeWord(w)
        assert(enc.mkString == w, s"lossy on '$w' table $ts")
        assert(enc.toSeq == sweep(table, w),
          s"min-rank != sweep on '$w' table $ts: ${enc.toSeq} vs ${sweep(table, w)}")
      }
    }
  }

  test("vocabOf order is deterministic and tokenIds maps OOV to 0") {
    import spark.implicits._
    val v = Bpe.vocabOf(tiny)
    // sorted single code points of the sides, then outputs in rank order
    assert(v.takeWhile(_.length == 1).sorted == v.takeWhile(_.length == 1))
    assert(v.endsWith(Seq("th", "the", "in", "an", "and", "er", "ing")))
    val out = Seq(("a", "the Z and")).toDF("id", "text")
      .select(Bpe.tokenIds(col("text"), tiny).as("ids"))
      .head().getSeq[Int](0)
    // 'the' and 'and' are vocab entries; 'Z' is outside the table → <unk> 0
    assert(out == Seq(v.indexOf("the") + 1, 0, v.indexOf("and") + 1))
  }

  test("decodeIds round-trips in-vocabulary words, marks unks, erases whitespace") {
    import spark.implicits._
    // property: any word over the table's own character set round-trips
    // exactly (every token is a vocab symbol, so id → symbol is lossless)
    val chars = Bpe.vocabOf(tiny).filter(_.length == 1)
    val rnd = new scala.util.Random(7)
    val words = (1 to 300).map { _ =>
      (0 until (1 + rnd.nextInt(9))).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }.distinct
    val rt = words.toDF("w")
      .select(col("w"),
        Bpe.decodeIds(Bpe.tokenIds(col("w"), tiny), tiny).as("d"))
      .filter(col("w") =!= col("d")).count()
    assert(rt == 0L, "an in-vocabulary word failed the decode round trip")
    // OOV code point decodes to the replacement marker; a custom marker
    // threads through; whitespace between words is erased
    val out = Seq(("the Zand", 1)).toDF("text", "k")
      .select(
        Bpe.decodeIds(Bpe.tokenIds(col("text"), tiny), tiny).as("d"),
        Bpe.decodeIds(Bpe.tokenIds(col("text"), tiny), tiny, unkMarker = "<unk>").as("dm"))
      .head()
    assert(out.getString(0) == "the�and")
    assert(out.getString(1) == "the<unk>and")
    // empty token stream decodes to the empty string
    val empty = Seq(("   ", 1)).toDF("text", "k")
      .select(Bpe.decodeIds(Bpe.tokenIds(col("text"), tiny), tiny).as("d"))
      .head().getString(0)
    assert(empty == "")
  }

  test("byte fallback: exact round-trip of ANY input, zero unk") {
    import spark.implicits._
    // adversarial inputs: emoji (4-byte UTF-8, surrogate pair in UTF-16),
    // CJK, combining marks, mixed scripts, tabs/newlines/runs of spaces,
    // leading/trailing whitespace, C0 control chars, U+FFFD itself, and
    // plain in-vocabulary prose
    val inputs = Seq(
      "the inner thing", "  leading and trailing  ", "tabs\there\nnewline",
      "emoji 🐕🦺 mix", "日本語のテキスト", "café né é", "αβγ δ",
      "ctrlchars", "repl�acement", "ｆｕｌｌwidth",
      "a", "", " ", "\t\n", "👨‍👩‍👧 zwj family",
      "mixed the 日本 🐕 and er")
    val df = inputs.toDF("text")
    val enc = Bpe.tokenIds(col("text"), tiny, byteFallback = true)
    val got = df.select(
        col("text"),
        Bpe.decodeIds(enc, tiny, byteFallback = true).as("rt"),
        size(filter(enc, i => i === 0)).as("n_unk"),
        size(enc).as("n"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"round-trip broke on '${r.getString(0)}' -> '${r.getString(1)}'")
      assert(r.getInt(2) === 0, s"unk appeared on '${r.getString(0)}'")
    }
    // empty string: zero tokens, decodes to empty
    assert(got.find(_.getString(0) == "").get.getInt(3) === 0)
    // and on the real fixture: every doc round-trips exactly
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ids = Bpe.tokenIds(col("text"), tiny, byteFallback = true)
    val bad = docs.select(col("text"),
        Bpe.decodeIds(ids, tiny, byteFallback = true).as("rt"),
        size(filter(ids, i => i === 0)).as("u"))
      .filter(col("rt") =!= col("text") || col("u") > 0)
      .count()
    assert(bad === 0L, s"$bad fixture docs failed the lossless contract")
  }

  test("byte fallback: vocab layout appends bytes, closed ids never move") {
    val base = Bpe.vocabOf(tiny)
    val ext = Bpe.vocabOf(tiny, byteFallback = true)
    assert(ext.take(base.size) == base,
      "closed-vocabulary ids must be identical in both modes")
    assert(ext.size == base.size + 256)
    assert(ext(base.size) == "<0x00>" && ext.last == "<0xFF>")
    // fallback on a known-OOV word: 'q' is outside the merge alphabet —
    // it must become exactly its UTF-8 byte id, not unk
    import spark.implicits._
    val ids = Seq("q").toDF("text")
      .select(Bpe.tokenIds(col("text"), tiny, byteFallback = true).as("ids"))
      .head().getSeq[Int](0)
    assert(ids == Seq(base.size + 1 + 'q'.toInt),
      s"expected the <0x71> byte id, got $ids")
    // whitespace separators are kept: "a b" has a <0x20> token between
    val toks = Seq("in in").toDF("text")
      .select(Bpe.tokens(col("text"), tiny, byteFallback = true).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("in", "<0x20>", "in"))
  }

  test("byte fallback: a vocab colliding with byte symbols is refused") {
    // an adversarial merge table whose output IS a literal byte-symbol
    // string would duplicate map keys in tokenIds/decodeIds — vocabOf
    // refuses it up front (ADVICE r13)
    // built causally (each side a single char or an earlier output) so
    // only the collision check can reject it
    val evil = graft.expressions.BpeMerges(IndexedSeq(
      ("<", "0"), ("<0", "x"), ("<0x", "4"), ("<0x4", "1"), ("<0x41", ">")))
    val e = intercept[IllegalArgumentException] {
      Bpe.vocabOf(evil, byteFallback = true)
    }
    assert(e.getMessage.contains("collides"), e.getMessage)
    // without fallback the same table is fine — no byte half to collide
    assert(Bpe.vocabOf(evil).contains("<0x41>"))
  }

  test("fertility: in-vocabulary prose near 1, OOV text above, empty 0") {
    import spark.implicits._
    val df = Seq(("a", "the the the"), ("b", "zzqq wwxx"), ("c", ""),
      ("d", "   ")).toDF("id", "text")
    val out = df.select(col("id"), Bpe.fertility(col("text"), tiny).as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 1.0)       // 'the' is a single merged symbol
    assert(out("b") == 4.0)       // untrained 4-char words stay characters
    assert(out("c") == 0.0 && out("d") == 0.0)
  }

  test("seqLenHistogram buckets, sequence counts and padding waste are exact") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(_ => "w").mkString(" ")),   // 10 tokens  → bucket 16
      (2L, (1 to 100).map(_ => "w").mkString(" ")),  // 100 tokens → bucket 128
      (3L, (1 to 130).map(_ => "w").mkString(" ")),  // 130 tokens → bucket 256
      (4L, "")).toDF("doc_id", "text")               // 0 tokens   → bucket 16
    val out = graft.trainprep.TrainPrep
      .seqLenHistogram(df, "doc_id", "text", contextTokens = 128)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bucket 16: docs {10, 0} → 1 sequence (the empty doc costs none),
    // waste 128−10
    assert(out(16L) == (2L, 10L, 1L, 118L))
    assert(out(128L) == (1L, 100L, 1L, 28L))
    // 130 tokens at ctx 128 → 2 sequences, waste 256−130
    assert(out(256L) == (1L, 130L, 2L, 126L))
  }

  test("default merges resource loads, is non-trivial, and counts differ from the lexer") {
    val m = Bpe.defaultMerges
    // the synthetic fixture has a 31-word vocabulary that saturates (every
    // word one symbol) at 89 merges; the committed budget is 60 so subword
    // splitting stays real
    assert(m.pairs.length >= 50, s"expected a real table, got ${m.pairs.length}")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val counted = docs.select(
      Bpe.tokenCount(col("text")).as("bpe"),
      TextFunctions.tokenCount(col("text")).as("ws")).collect()
    // BPE splits words into subwords: count is >= the whitespace count
    counted.foreach { r =>
      assert(r.getLong(0) >= r.getLong(1), s"bpe ${r.getLong(0)} < ws ${r.getLong(1)}")
    }
    assert(counted.exists(r => r.getLong(0) > r.getLong(1)),
      "some document must actually split into subwords")
  }
}
