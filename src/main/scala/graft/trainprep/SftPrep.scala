package graft.trainprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning (SFT) data prep: render conversations to the
  * training text and compute the completion-loss token spans — the two
  * artifacts an instruction-tuning run consumes (render feeds the
  * tokenizer; spans feed the loss mask, so gradient flows only through
  * assistant completions, never through prompts).
  *
  * Both operators take a conversations frame: one row per conversation
  * with an `array<struct<role: string, content: string>>` turns column,
  * ordered. Rendering is a pure map over the array column (zero
  * shuffle); spans explode turns and prefix-sum per-turn token counts
  * with one per-conversation window — shuffle rows = TURN COUNT (a few
  * small ints each), never text bytes, so the shuffle is negligible
  * against the tokenizer's map-side scan at any corpus size.
  */
object SftPrep {

  /** Chat template: each turn renders as
    * `headerPrefix + role + headerSuffix + content + footer`.
    *
    * The requires below are the TOKEN-ADDITIVITY precondition, not
    * style: [[completionLossSpans]] computes span boundaries from
    * per-segment BPE counts, and `tokenCount(a ++ b) ==
    * tokenCount(a) + tokenCount(b)` only when the boundary sits on
    * whitespace (the tokenizer splits on whitespace runs; a merge never
    * crosses a word boundary). headerSuffix must end with whitespace
    * (header|content boundary), footer must start with whitespace
    * (content|footer) AND end with whitespace (footer|next-header), so
    * every segment boundary — and every turn boundary — is a word
    * boundary and span arithmetic is exact against tokenizing the full
    * rendered text. */
  final case class ChatTemplate(headerPrefix: String = "<|",
      headerSuffix: String = "|>\n", footer: String = "\n<|end|>\n") {
    // the boundary test is the TOKENIZER'S split predicate (ASCII \s),
    // not Char.isWhitespace: U+2028/U+1680 are Unicode whitespace the
    // BPE word split does NOT break on — accepting them here would let
    // a "validated" template emit misaligned loss spans
    private def ws(c: Char) = graft.expressions.BpeMerges.isAsciiSpace(c)
    require(headerSuffix.nonEmpty && ws(headerSuffix.last),
      "headerSuffix must end with ASCII whitespace — the header|content " +
        "token boundary must be a word boundary for span counts to be additive")
    require(footer.nonEmpty && ws(footer.head) && ws(footer.last),
      "footer must start and end with ASCII whitespace — the content|footer " +
        "and footer|next-header boundaries must be word boundaries")

    private[trainprep] def header(role: Column): Column =
      concat(lit(headerPrefix), role, lit(headerSuffix))
    private[trainprep] def body(content: Column): Column =
      concat(content, lit(footer))
  }

  /** Render conversations to training text: per-turn
    * header+content+footer, concatenated in turn order. Pure codegen'd
    * map over the array column — zero shuffle, one scan. */
  def renderChat(convs: DataFrame, convId: String, turnsCol: String,
      template: ChatTemplate = ChatTemplate()): DataFrame =
    convs.select(col(convId),
      array_join(transform(col(turnsCol), t =>
        concat(template.header(t.getField("role")),
          template.body(t.getField("content")))), "").as("text"))

  /** Loss masks for PACKED sequences — the last piece of the SFT tensor:
    * conversations lie end-to-end in `contextTokens` windows (exactly
    * [[TrainPrep.packedTokenIds]] over the rendered text — the
    * template-additivity contract makes the two token streams align),
    * and each completion-loss span lands in its window(s) as
    * `[loss_start_in_seq, loss_end_in_seq)` rows, split at window
    * boundaries. Consuming (seq_id, token_ids) from packedTokenIds plus
    * these rows yields the (input_ids, loss_mask) pair an SFT run feeds
    * the model.
    *
    * Scale shape: per-conversation totals aggregate from the span frame
    * (span-count rows), global offsets ride the distributed two-pass
    * prefix scan (never a single-partition sort), spans join offsets
    * keyed by conversation, and the window split is a map-side generate
    * — every shuffled row is span metadata (a few longs), never text. */
  def packedLossMasks(convs: DataFrame, convId: String, turnsCol: String,
      tokenCountFn: Column => Column, contextTokens: Int,
      lossRole: String = "assistant",
      template: ChatTemplate = ChatTemplate()): DataFrame =
    packedLossMasksFromSpans(
      completionLossSpans(convs, convId, turnsCol, tokenCountFn, lossRole,
        template),
      convId, contextTokens)

  /** [[packedLossMasks]] over an ALREADY-COMPUTED spans frame. The spans
    * subtree appears on BOTH sides of the offsets join below (the
    * per-conv totals branch and the loss-rows branch), so a caller that
    * just materialized spans — SftExport writes them to parquet anyway —
    * should pass the disk-backed frame here rather than re-deriving from
    * conversations, or the per-turn tokenization scan executes twice
    * more inside one action. */
  def packedLossMasksFromSpans(spans: DataFrame, convId: String,
      contextTokens: Int): DataFrame = {
    require(contextTokens > 0,
      s"contextTokens must be positive, got $contextTokens")
    val ctx = lit(contextTokens.toLong)
    val perConv = spans.groupBy(col(convId)).agg(max("tok_end").as("__tot"))
    val offs = graft.ops.TimeSeriesOps.scanCumSumLong(
        perConv, Seq(convId), "__tot", "__cum")
      .select(col(convId), (col("__cum") - col("__tot")).as("__off"))
    spans.filter(col("loss_end") > col("loss_start"))
      .join(offs, convId)
      .withColumn("__gs", col("__off") + col("loss_start"))
      .withColumn("__ge", col("__off") + col("loss_end"))
      // same floor(gpos / ctx.toDouble) grid as packedTokenIds — exact
      // below 2^52 global tokens, far past a 100 TB corpus
      .select(col(convId), col("turn_idx"), col("__gs"), col("__ge"),
        explode(sequence(
          floor(col("__gs") / lit(contextTokens.toDouble)).cast("long"),
          floor((col("__ge") - 1) / lit(contextTokens.toDouble)).cast("long")))
          .as("seq_id"))
      .select(col("seq_id"), col(convId), col("turn_idx"),
        greatest(col("__gs") - col("seq_id") * ctx, lit(0L))
          .as("loss_start_in_seq"),
        least(col("__ge") - col("seq_id") * ctx, ctx).as("loss_end_in_seq"))
  }

  /** Preference-pair prep — the DPO/RLHF-reward data artifact: a shared
    * prompt (ordered turns) plus a chosen and a rejected completion
    * render to the two full sequences, with the token geometry a
    * preference trainer needs: `prompt_tokens` (the shared prefix both
    * sequences start with — what prefix-sharing batchers cache),
    * `loss_start` (= prompt + completion header; identical for both
    * sides since they share `lossRole`'s header) and each side's total.
    * Counts are exact against tokenizing the rendered strings by the
    * [[ChatTemplate]] additivity contract. Pure codegen'd map — zero
    * shuffle; the completions tokenize once each, the prompt once. */
  def preferencePairPrep(pairs: DataFrame, pairId: String,
      promptTurnsCol: String, chosenCol: String, rejectedCol: String,
      tokenCountFn: Column => Column,
      lossRole: String = "assistant",
      template: ChatTemplate = ChatTemplate()): DataFrame = {
    val promptText = array_join(transform(col(promptTurnsCol), t =>
      concat(template.header(t.getField("role")),
        template.body(t.getField("content")))), "")
    val compHeader = template.header(lit(lossRole))
    def full(c: Column) = concat(promptText, compHeader, template.body(c))
    val promptToks = tokenCountFn(promptText)
    pairs.select(col(pairId),
      full(col(chosenCol)).as("chosen_text"),
      full(col(rejectedCol)).as("rejected_text"),
      promptToks.as("prompt_tokens"),
      (promptToks + tokenCountFn(compHeader)).as("loss_start"),
      (promptToks + tokenCountFn(compHeader) +
        tokenCountFn(template.body(col(chosenCol)))).as("chosen_tokens"),
      (promptToks + tokenCountFn(compHeader) +
        tokenCountFn(template.body(col(rejectedCol)))).as("rejected_tokens"))
  }

  /** Completion-loss token spans over the rendered text: one row per
    * turn with its token extent `[tok_start, tok_end)` and its LOSS
    * extent — `[tok_start + header_tokens, tok_end)` for `lossRole`
    * turns (the model learns the completion AND the end marker, never
    * the role header), the empty span `[tok_end, tok_end)` otherwise.
    * Offsets index the token stream of [[renderChat]]'s output under
    * the SAME tokenizer: the template's whitespace requires make
    * per-segment counts additive, so `sum(n_tokens) ==
    * tokenCount(rendered)` exactly (property-pinned in SftPrepSpec).
    *
    * `tokenCountFn` is the [[graft.functions.Bpe.tokenCount]] plug —
    * counts stay a codegen'd map over the exploded turns; the only
    * shuffle is the per-conversation prefix-sum window (rows = turns).
    */
  def completionLossSpans(convs: DataFrame, convId: String, turnsCol: String,
      tokenCountFn: Column => Column,
      lossRole: String = "assistant",
      template: ChatTemplate = ChatTemplate()): DataFrame = {
    val ex = convs.select(col(convId),
      posexplode(col(turnsCol)).as(Seq("turn_idx", "__t")))
    val w = Window.partitionBy(col(convId)).orderBy(col("turn_idx"))
    ex.select(col(convId), col("turn_idx"),
        col("__t.role").as("role"),
        tokenCountFn(template.header(col("__t.role"))).as("__h"),
        tokenCountFn(template.body(col("__t.content"))).as("__b"))
      .withColumn("n_tokens", col("__h") + col("__b"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .withColumn("loss_start",
        when(col("role") === lit(lossRole), col("tok_start") + col("__h"))
          .otherwise(col("tok_end")))
      .withColumn("loss_end", col("tok_end"))
      .drop("__h", "__b")
  }

  /** BEST-OF-N selection — rejection sampling over scored candidate
    * completions (the RLHF data-prep step between the reward model and
    * SFT-on-winners: sample n, keep the best, and keep the MARGIN to the
    * runner-up as the confidence signal that gates weak prompts out).
    * Input: one row per (prompt, candidate, score). Winner = max score,
    * ties broken toward the LOWER candidate id (deterministic on any
    * engine); margin = best − runner-up, NULL for single-candidate
    * prompts (no runner-up — unmeasurable, not zero). NULL-scored
    * candidates (a reward-model scoring failure) are EXCLUDED before
    * selection — Spark's ascending struct sort puts a null field FIRST,
    * so an unscored candidate would otherwise silently WIN best-of-n
    * (review-pass finding); a prompt with no scored candidate yields no
    * row. One groupBy: the per-prompt candidate list is n-sized BY
    * CONSTRUCTION (best-of-n, n ≤ dozens), so
    * `sort_array(collect_list(...))` is the bounded per-row collect
    * pattern, never a data-sized array. */
  def bestOfN(cands: DataFrame, promptCol: String, candCol: String,
      scoreCol: String, roundTo: Int = 6): DataFrame = {
    // the tiebreak cast to long must be loud, not lossy: under non-ANSI
    // semantics a non-numeric candidate id casts to NULL, sorts FIRST
    // within equal scores, and is returned as a NULL best_cand instead of
    // failing (ADVICE r13) — so require a numeric/long-safe column type
    // at plan time
    val candType = cands.schema(candCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(candType.typeName),
      s"candidate column '$candCol' must be an integral type for the " +
        s"deterministic tiebreak, got ${candType.typeName} — cast it " +
        "explicitly (and losslessly) before bestOfN")
    // sort key: score DESC then candidate id ASC — struct ordering is
    // lexicographic, so (−score′, cand) ascending gives exactly that;
    // negating a rounded score is exact
    val sorted = sort_array(collect_list(struct(
      (-round(col(scoreCol).cast("double"), roundTo)).as("__ns"),
      col(candCol).cast("long").as("__c"))))
    cands.filter(col(scoreCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(count(lit(1)).as("n_cands"), sorted.as("__s"))
      .select(col(promptCol),
        col("__s").getItem(0).getField("__c").as("best_cand"),
        (-col("__s").getItem(0).getField("__ns")).as("best_score"),
        col("n_cands"),
        when(col("n_cands") > 1,
          col("__s").getItem(1).getField("__ns")
            - col("__s").getItem(0).getField("__ns")).as("margin"))
  }

  /** Conversation-STRUCTURE gate — the schema half of SFT corpus QA
    * (render/spans assume well-formed conversations; a malformed one
    * silently trains garbage): per conversation,
    *
    *  - an optional leading system turn, then STRICT user/assistant
    *    alternation starting at user;
    *  - no empty or whitespace-only content anywhere (NULL counts as
    *    empty);
    *  - the last turn is the assistant's (a trailing user turn has no
    *    completion to learn);
    *  - body turn count (system excluded) in [2, maxTurns].
    *
    * Returns (convId, n_turns, has_system, pass, reason) with `reason`
    * the FIRST failed check in the fixed order empty_turn →
    * bad_alternation → no_assistant_end → too_short → too_long ('' when
    * pass). Pure map over the turns array (higher-order functions) —
    * zero shuffle, gate rates aggregate map-side. */
  def chatGate(convs: DataFrame, convId: String, turnsCol: String,
      maxTurns: Int = 64): DataFrame = {
    require(maxTurns >= 2, s"maxTurns must be >= 2, got $maxTurns")
    val turns = coalesce(col(turnsCol),
      array().cast(convs.schema(turnsCol).dataType))
    val nAll = size(turns)
    // a NULL role must FAIL the structural checks, not null them out:
    // `null === "user"` is NULL, and a when() chain SKIPS a NULL
    // predicate — without the coalesce a null-role turn would fall
    // through every branch to the pass verdict (review-pass finding)
    def roleOf(t: Column) = coalesce(t.getField("role"), lit(""))
    val hasSystem = nAll >= 1 && roleOf(element_at(turns, 1)) === "system"
    val body = when(hasSystem, slice(turns, lit(2), greatest(nAll - 1, lit(0))))
      .otherwise(turns)
    val n = size(body)
    val emptyTurn = exists(turns, t =>
      length(trim(coalesce(t.getField("content"), lit("")))) === 0)
    // sequence(1, 0) would DESCEND — guard the empty body explicitly
    val alternates = when(n < 1, lit(false)).otherwise(
      forall(sequence(lit(1), n), i =>
        roleOf(element_at(body, i)) ===
          when(pmod(i, lit(2)) === 1, "user").otherwise("assistant")))
    val endsAssistant = n >= 1 &&
      roleOf(element_at(body, -1)) === "assistant"
    val reason = when(emptyTurn, "empty_turn")
      .when(!alternates, "bad_alternation")
      .when(!endsAssistant, "no_assistant_end")
      .when(n < 2, "too_short")
      .when(n > maxTurns, "too_long")
      .otherwise("")
    convs.select(col(convId), nAll.cast("long").as("n_turns"),
      hasSystem.as("has_system"),
      (reason === "").as("pass"), reason.as("reason"))
  }
}
