package graft.trainprep

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.BpeMerges
import graft.functions.Bpe
import graft.trainprep.SftPrep.ChatTemplate

/** SFT prep: render/span agreement (the token-additivity contract the
  * template's whitespace requires exist for), hand-verified span
  * arithmetic, loss-role semantics, and the plan posture. */
class SftPrepSpec extends SparkSpec {

  private val merges = BpeMerges(IndexedSeq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("in", "g")))
  private def cnt = Bpe.tokenCount(_: org.apache.spark.sql.Column, merges)

  private def convs = {
    import spark.implicits._
    Seq(
      (1L, Seq(("system", "be terse"), ("user", "the thing sang"),
        ("assistant", "and it rang ander"))),
      (2L, Seq(("user", "in and er"), ("assistant", "thern"),
        ("user", "the"), ("assistant", "and"))),
      (3L, Seq(("assistant", "")))
    ).toDF("conv_id", "raw")
      .select(col("conv_id"), transform(col("raw"),
        t => struct(t.getField("_1").as("role"), t.getField("_2").as("content")))
        .as("turns"))
  }

  test("span counts sum to the tokenization of the rendered text") {
    val rendered = SftPrep.renderChat(convs, "conv_id", "turns")
      .select(col("conv_id"), cnt(col("text")).as("full"))
    val spans = SftPrep.completionLossSpans(convs, "conv_id", "turns", cnt)
      .groupBy("conv_id").agg(sum("n_tokens").as("summed"),
        max("tok_end").as("last_end"))
    val bad = rendered.join(spans, "conv_id")
      .filter(col("full") =!= col("summed") || col("full") =!= col("last_end"))
      .count()
    assert(bad == 0L, "per-turn token counts must be additive against " +
      "tokenizing the full rendered text (the template whitespace contract)")
  }

  test("hand-verified spans: loss covers assistant content+footer, never headers") {
    val out = SftPrep.completionLossSpans(convs, "conv_id", "turns", cnt)
      .filter(col("conv_id") === 2L).orderBy("turn_idx")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(5), r.getLong(4), r.getLong(6), r.getLong(7)))
    // under the tiny table: header "<|user|>\n" = <,|,u,s,er,|,> → 7
    // tokens; footer "\n<|end|>\n" = <,|,e,n,d,|,> → 7 (no (e,n) merge);
    // header "<|assistant|>\n" = 13 chars with one (a,n) merge → 12
    // turn 0 user "in and er": in/and/er = 3 tokens → n = 7+3+7 = 17
    assert(out(0) == ((0, "user", 17L, 0L, 17L, 17L, 17L)))
    // turn 1 assistant "thern": the,r,n = 3 → n = 12+3+7 = 22; loss
    // skips exactly the 12 header tokens
    assert(out(1) == ((1, "assistant", 22L, 17L, 39L, 29L, 39L)))
    // turn 2 user "the" → 1 token, n = 7+1+7 = 15
    assert(out(2) == ((2, "user", 15L, 39L, 54L, 54L, 54L)))
    // turn 3 assistant "and" → 1 token, n = 12+1+7 = 20
    assert(out(3) == ((3, "assistant", 20L, 54L, 74L, 66L, 74L)))
  }

  test("empty assistant content still earns the footer as loss") {
    val out = SftPrep.completionLossSpans(convs, "conv_id", "turns", cnt)
      .filter(col("conv_id") === 3L).collect()
    assert(out.length == 1)
    val r = out.head
    val (start, end, lossStart, lossEnd) =
      (r.getLong(5), r.getLong(4), r.getLong(6), r.getLong(7))
    assert(start == 0L && end == 19L)   // 12 header + 0 content + 7 footer
    assert(lossStart == 12L && lossEnd == 19L)
  }

  test("lossRole parameter moves the mask; unknown role masks nothing") {
    val spans = SftPrep.completionLossSpans(convs, "conv_id", "turns", cnt,
      lossRole = "user")
    val byRole = spans.groupBy("role")
      .agg(sum(col("loss_end") - col("loss_start")).as("loss_toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRole("user") > 0L)
    assert(byRole("assistant") == 0L && byRole.getOrElse("system", 0L) == 0L)
    val none = SftPrep.completionLossSpans(convs, "conv_id", "turns", cnt,
      lossRole = "nobody")
      .agg(sum(col("loss_end") - col("loss_start"))).head().getLong(0)
    assert(none == 0L)
  }

  test("preferencePairPrep: shared prefix, exact token geometry, no shuffle") {
    import spark.implicits._
    val pairs = Seq(
      (1L, Seq(("system", "be terse"), ("user", "the thing")),
        "and it rang", "thern"),
      (2L, Seq(("user", "in")), "", "the and"))
      .toDF("pair_id", "rawp", "chosen", "rejected")
      .select(col("pair_id"), transform(col("rawp"),
        t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("prompt"),
        col("chosen"), col("rejected"))
    val out = SftPrep.preferencePairPrep(
      pairs, "pair_id", "prompt", "chosen", "rejected", cnt)
    // both sides share the prompt+header prefix byte-for-byte up to the
    // completion, and the token geometry matches tokenizing the strings
    val rows = out.collect()
    rows.foreach { r =>
      val chosenText = r.getAs[String]("chosen_text")
      val rejectedText = r.getAs[String]("rejected_text")
      // common prefix covers prompt + assistant header on both sides
      val common = chosenText.zip(rejectedText).takeWhile(p => p._1 == p._2).length
      assert(chosenText.take(common).contains("<|assistant|>\n"),
        "the shared prefix must include the completion header")
    }
    val geo = out.select(
      (cnt(col("chosen_text")) === col("chosen_tokens")).as("a"),
      (cnt(col("rejected_text")) === col("rejected_tokens")).as("b"),
      (col("loss_start") > col("prompt_tokens")).as("c"))
      .filter(!col("a") || !col("b") || !col("c")).count()
    assert(geo == 0L,
      "token geometry must match tokenizing the rendered sequences")
    val exchanges = out.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 0, "preference prep is a pure map")
  }

  test("packedLossMasks aligns with packedTokenIds: masked positions carry exactly the completion ids") {
    import spark.implicits._
    val ctx = 16
    // pack the RENDERED conversations with the same tokenizer
    val rendered = SftPrep.renderChat(convs, "conv_id", "turns")
    val packed = graft.trainprep.TrainPrep.packedTokenIds(
        rendered, "conv_id", "text", merges, ctx)
      .collect().map(r => r.getLong(0) ->
        r.getString(2).split(",").filter(_.nonEmpty).map(_.toInt)).toMap
    val masks = SftPrep.packedLossMasks(convs, "conv_id", "turns", cnt, ctx)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // masks stay in-window, non-empty, and never overlap within a window
    masks.foreach { case (_, s, e) =>
      assert(s >= 0 && s < e && e <= ctx, s"bad mask [$s,$e)")
    }
    masks.groupBy(_._1).foreach { case (seq, ms) =>
      val sorted = ms.sortBy(_._2).toSeq
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._3 <= b._2, s"overlap in seq $seq")
      }
    }
    // gather masked ids in global (seq, position) order
    val maskedIds = masks.sortBy(m => (m._1, m._2)).flatMap { case (seq, s, e) =>
      packed(seq).slice(s.toInt, e.toInt)
    }.toSeq
    // expected: per conv in id order, per assistant turn in turn order,
    // the ids of content+footer — computed INDEPENDENTLY via encodeWord
    val vocab = Bpe.vocabOf(merges)
    def idsOf(text: String): Seq[Int] = text.split("\\s+").filter(_.nonEmpty)
      .flatMap(merges.encodeWord(_)).map(t => vocab.indexOf(t) + 1).toSeq
    val expected = convs.select(col("conv_id"), col("turns"))
      .collect().sortBy(_.getLong(0)).flatMap { r =>
      r.getSeq[org.apache.spark.sql.Row](1)
        .filter(_.getString(0) == "assistant")
        .flatMap(t => idsOf(t.getString(1) + "\n<|end|>\n"))
    }.toSeq
    assert(maskedIds == expected,
      s"masked ids must equal the completion token stream: " +
        s"${maskedIds.take(20)} vs ${expected.take(20)}")
    assert(expected.nonEmpty && masks.map(_._1).distinct.length > 1,
      "fixture must split masks across multiple windows")
  }

  test("template whitespace contract is enforced loudly") {
    intercept[IllegalArgumentException] {
      ChatTemplate(headerSuffix = "|>") // no trailing whitespace
    }
    intercept[IllegalArgumentException] {
      ChatTemplate(footer = "<|end|>\n") // no leading whitespace
    }
    intercept[IllegalArgumentException] {
      ChatTemplate(footer = "\n<|end|>") // no trailing whitespace
    }
    // Unicode whitespace the BPE word split does NOT break on must be
    // rejected too — Char.isWhitespace would accept these and the spans
    // would silently misalign (boundary words fuse)
    intercept[IllegalArgumentException] {
      ChatTemplate(headerSuffix = "|> ") // LINE SEPARATOR
    }
    intercept[IllegalArgumentException] {
      ChatTemplate(footer = " <|end|>\n") // OGHAM SPACE MARK
    }
    // a custom compliant template renders and budgets consistently
    val tpl = ChatTemplate("[", "]\t", " [eot] ")
    val rendered = SftPrep.renderChat(convs, "conv_id", "turns", tpl)
      .select(col("conv_id"), cnt(col("text")).as("full"))
    val summed = SftPrep.completionLossSpans(convs, "conv_id", "turns", cnt,
        template = tpl)
      .groupBy("conv_id").agg(sum("n_tokens").as("summed"))
    assert(rendered.join(summed, "conv_id")
      .filter(col("full") =!= col("summed")).count() == 0L)
  }

  test("plan posture: render is exchange-free; spans shuffle once") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange"))
    import spark.implicits._
    val flat = Seq((1L, Seq(("user", "the")))).toDF("conv_id", "raw")
      .select(col("conv_id"), transform(col("raw"),
        t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))
    assert(exchanges(SftPrep.renderChat(flat, "conv_id", "turns")) == 0,
      "rendering must stay a pure map")
    assert(exchanges(SftPrep.completionLossSpans(flat, "conv_id", "turns",
      cnt)) == 1, "spans need exactly the per-conversation window exchange")
  }

  test("bestOfN: winner, lower-cand tiebreak, NULL margin for singletons") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.9), // tie at 0.9 → cand 10
      (2L, 20L, 0.5),                                 // singleton
      (3L, 30L, 0.1), (3L, 31L, 0.4))
      .toDF("prompt_id", "cand", "score")
    val got = SftPrep.bestOfN(cands, "prompt_id", "cand", "score")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got(1L) === ((10L, 0.9, 3L, Some(0.0))),
      "equal scores tie toward the LOWER candidate id, margin 0")
    assert(got(2L) === ((20L, 0.5, 1L, None)),
      "a single candidate has no runner-up: margin NULL, not 0")
    assert(got(3L)._1 === 31L &&
      math.abs(got(3L)._4.get - 0.3) < 1e-12)
  }

  test("chatGate: no-system convs, short/long/empty edges, null safety") {
    import spark.implicits._
    def conv(id: Long, ts: Seq[(String, String)]) = (id, ts)
    val df = Seq(
      conv(1, Seq("user" -> "hi", "assistant" -> "hello")),   // pass, no system
      conv(2, Seq("system" -> "s", "user" -> "hi",
        "assistant" -> "hello")),                              // pass, system
      conv(3, Seq("user" -> "hi")),                            // ends user
      conv(4, Seq("system" -> "s")),                           // empty body
      conv(5, Seq("assistant" -> "hi", "user" -> "x")),        // swapped
      conv(6, Seq("user" -> "hi", "assistant" -> " ")),        // blank content
      conv(7, Seq.empty[(String, String)]))                    // no turns at all
      .toDF("conv_id", "raw")
      .select(col("conv_id"), transform(col("raw"),
        t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))
    val got = SftPrep.chatGate(df, "conv_id", "turns")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(got(1L) === ((2L, false, true, "")))
    assert(got(2L) === ((3L, true, true, "")))
    assert(got(3L) === ((1L, false, false, "no_assistant_end")))
    assert(got(4L) === ((1L, true, false, "bad_alternation")),
      "a system-only conversation has an empty body")
    assert(got(5L) === ((2L, false, false, "bad_alternation")))
    assert(got(6L) === ((2L, false, false, "empty_turn")))
    assert(got(7L) === ((0L, false, false, "bad_alternation")))
    // too_long fires past maxTurns on an otherwise-valid conversation
    val long = Seq((8L, (0 until 3).flatMap(_ =>
      Seq("user" -> "q", "assistant" -> "a"))))
      .toDF("conv_id", "raw")
      .select(col("conv_id"), transform(col("raw"),
        t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))
    val l = SftPrep.chatGate(long, "conv_id", "turns", maxTurns = 4)
      .head()
    assert(!l.getBoolean(3) && l.getString(4) === "too_long")
  }

  test("chatGate: a NULL role FAILS — never nulls through to pass (review fix)") {
    import spark.implicits._
    // null === "user" is NULL and when() skips NULL predicates — without
    // the role coalesce this conversation fell through to pass = true
    val df = Seq(1L).toDF("conv_id").select(col("conv_id"), array(
      struct(lit(null).cast("string").as("role"), lit("x").as("content")),
      struct(lit("assistant").as("role"), lit("ok").as("content"))).as("turns"))
    val r = SftPrep.chatGate(df, "conv_id", "turns").head()
    assert(!r.getBoolean(3) && r.getString(4) === "bad_alternation",
      s"null-role conversation must gate: $r")
  }

  test("bestOfN: a non-integral candidate column is refused at plan time") {
    import spark.implicits._
    // a string candidate id would cast to NULL under non-ANSI semantics,
    // sort first within equal scores, and be returned as a NULL best_cand
    // instead of failing (ADVICE r13)
    val cands = Seq((1L, "c-10", 0.9), (1L, "c-11", 0.7))
      .toDF("prompt_id", "cand", "score")
    val e = intercept[IllegalArgumentException] {
      SftPrep.bestOfN(cands, "prompt_id", "cand", "score")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("bestOfN: NULL-scored candidates never win (review fix)") {
    import spark.implicits._
    // ascending struct sort puts a null field FIRST — an unscored
    // candidate would otherwise beat every real score
    val cands = Seq((1L, 10L, Some(0.9)), (1L, 11L, None),
      (2L, 20L, None))
      .toDF("prompt_id", "cand", "score")
    val got = SftPrep.bestOfN(cands, "prompt_id", "cand", "score").collect()
    assert(got.length === 1, "a prompt with only null scores yields no row")
    val r = got.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 10L &&
      r.getDouble(2) === 0.9 && r.getLong(3) === 1L && r.isNullAt(4),
      s"the scored candidate must win with the null one excluded: $r")
  }
}
