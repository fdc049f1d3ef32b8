package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.trainprep.SftPrep

/** SFT-artifact exporter — one command from a conversations table
  * (`--id-col` + an ordered `array<struct<role,content>>` `--turns-col`)
  * to everything an instruction-tuning run consumes:
  *
  *   - `rendered/`  conv_id, text — the chat-template render (E116)
  *   - `spans/`     per-turn token extents + loss extents (E117)
  *   - `packed/`    seq_id, n_tokens, token_ids — fixed-`--context`
  *                  packed windows over the render (E113)
  *   - `masks/`     per-window `[loss_start_in_seq, loss_end_in_seq)`
  *                  rows (E121) — `packed/` + `masks/` are the
  *                  (input_ids, loss_mask) tensor pair
  *
  * plus a one-line JSON stats contract. The run REQUIRES the real
  * composition invariant it exports — packed/ holds exactly the token
  * total the span arithmetic predicts — so a template/tokenizer mismatch
  * between the render and the span counts fails the command, not the
  * training run. (Masked == loss-span tokens is true BY CONSTRUCTION —
  * masks partition the spans — and is only sanity-asserted.)
  * `--loss-role` (default assistant) and `--bpe-merges` (a merges.txt;
  * default: the committed trained table) parameterize it.
  *
  * Scale shape: render/tokenize are map passes; spans shuffle turn
  * metadata once; packing rides the distributed two-pass prefix scan;
  * masks join span metadata. Downstream sections read `rendered/` back
  * from disk rather than re-deriving it, so the render computes once.
  *
  * `--pack atomic` switches `packed/` from fixed-window SPLIT packing to
  * no-split ([[graft.trainprep.TrainPrep.packNoSplit]]) packing —
  * conversations stay whole inside a sequence (adds `packed_docs/`,
  * the per-conv offsets) — and `--oversize truncate|drop` decides the
  * one case that packer cannot: a conversation longer than the context
  * (truncate keeps exactly the first `--context` BPE ids — a true
  * prefix of the full id stream — drop omits it). The atomic run
  * REQUIRES no sequence exceeds the context AND the oversize-adjusted
  * composition invariant (shipped tokens == span total − exactly the
  * tokens the policy removed).
  *
  * `runMain graft.cli.SftExport --in <convs.parquet> --out <dir>
  *   [--context 4096] [--loss-role assistant] [--bpe-merges <file>]
  *   [--pack split|atomic] [--oversize truncate|drop]`
  */
object SftExport {

  def run(spark: SparkSession, args: Map[String, String]): Map[String, Long] = {
    val in = args("in")
    val out = args("out")
    val convId = args.getOrElse("id-col", "conv_id")
    val turnsCol = args.getOrElse("turns-col", "turns")
    val context = args.getOrElse("context", "4096").toInt
    require(context > 0, s"--context must be positive, got $context")
    val lossRole = args.getOrElse("loss-role", "assistant")
    val packMode = args.getOrElse("pack", "split")
    require(Seq("split", "atomic").contains(packMode),
      s"--pack must be 'split' or 'atomic', got '$packMode'")
    val oversizePolicy = args.getOrElse("oversize", "truncate")
    require(Seq("truncate", "drop").contains(oversizePolicy),
      s"--oversize must be 'truncate' or 'drop', got '$oversizePolicy'")
    require(packMode == "atomic" || !args.contains("oversize"),
      "--oversize only applies to --pack atomic (split packing never " +
        "meets an unsplittable oversize document)")
    val merges = args.get("bpe-merges").map(Bpe.loadMergesFile)
      .getOrElse(Bpe.defaultMerges)
    val cnt = Bpe.tokenCount(_: org.apache.spark.sql.Column, merges)

    val convs = spark.read.parquet(in)
    for (c <- Seq(convId, turnsCol))
      require(convs.columns.contains(c),
        s"'$c' is not a column of the input (have: ${convs.columns.mkString(", ")})")
    val turnsType = convs.schema(turnsCol).dataType
    require(turnsType.isInstanceOf[org.apache.spark.sql.types.ArrayType] && {
      val el = turnsType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType
      el.isInstanceOf[org.apache.spark.sql.types.StructType] &&
        Set("role", "content").subsetOf(
          el.asInstanceOf[org.apache.spark.sql.types.StructType]
            .fieldNames.toSet)
    }, s"--turns-col '$turnsCol' must be array<struct<role,content,…>>, " +
      s"got $turnsType")

    SftPrep.renderChat(convs, convId, turnsCol)
      .write.mode("overwrite").parquet(s"$out/rendered")
    SftPrep.completionLossSpans(convs, convId, turnsCol, cnt, lossRole)
      .write.mode("overwrite").parquet(s"$out/spans")
    // downstream sections read rendered/ and spans/ back from disk: the
    // render and the per-turn tokenization each compute exactly once
    // (the masks plan references spans twice — see
    // packedLossMasksFromSpans — which is cheap only on a materialized
    // frame)
    val rendered = spark.read.parquet(s"$out/rendered")
    val spans = spark.read.parquet(s"$out/spans")
    // empty input → null sums: the shared CliArgs.longOr0 guard
    def longOr0(r: org.apache.spark.sql.Row, i: Int): Long = CliArgs.longOr0(r, i)
    val spanRow = spans.agg(count(lit(1)),
      sum(col("loss_end") - col("loss_start")),
      sum(col("n_tokens"))).head()
    val lossTokens = longOr0(spanRow, 1)
    val totalTokens = longOr0(spanRow, 2)

    val stats: Map[String, Long] = packMode match {
      case "split" =>
        graft.trainprep.TrainPrep.packedTokenIds(
            rendered, convId, "text", merges, context)
          .write.mode("overwrite").parquet(s"$out/packed")
        SftPrep.packedLossMasksFromSpans(spans, convId, context)
          .write.mode("overwrite").parquet(s"$out/masks")
        val packed = spark.read.parquet(s"$out/packed")
        val masks = spark.read.parquet(s"$out/masks")
        val maskRow = masks.agg(count(lit(1)),
          sum(col("loss_end_in_seq") - col("loss_start_in_seq"))).head()
        val maskTokens = longOr0(maskRow, 1)
        val packedRow = packed.agg(count(lit(1)), sum(col("n_tokens"))).head()
        // THE composition invariant: the packed windows tokenize the
        // render to exactly the token total the span arithmetic
        // predicts — this is what breaks when template additivity or the
        // tokenizer drifts. (masked == loss-span tokens holds by
        // construction — masks partition the spans — sanity assert.)
        require(longOr0(packedRow, 1) == totalTokens,
          s"composition invariant violated: packed/ holds " +
            s"${longOr0(packedRow, 1)} tokens but the spans predict " +
            s"$totalTokens — template/tokenizer mismatch between the " +
            "render and the span arithmetic")
        assert(maskTokens == lossTokens,
          s"mask partition identity broke: $maskTokens vs $lossTokens")
        Map("convs" -> rendered.count(), "turns" -> spanRow.getLong(0),
          "total_tokens" -> totalTokens, "loss_tokens" -> lossTokens,
          "sequences" -> packedRow.getLong(0),
          "mask_rows" -> maskRow.getLong(0))

      case "atomic" =>
        // NO-SPLIT packing: conversations stay whole inside a sequence;
        // the --oversize policy (truncate = keep exactly the first
        // `context` BPE ids; drop = omit the conversation) resolves the
        // one case the packer cannot: a conversation longer than the
        // context. packed_docs/ carries per-conv offsets so masks are a
        // shift (+clip for truncated tails) of the conv-local spans.
        // compute-once discipline (review finding — the first cut ran the
        // tokenize/pack pipeline twice and tokenized rendered a third
        // time for the oversize count): the offsets pipeline runs ONCE,
        // everything downstream aggregates the disk-backed frames —
        // packed/ is a roll-up of packed_docs/, and the oversize
        // arithmetic comes from spans/ (which keeps the composition
        // check a comparison of two INDEPENDENT token accountings:
        // tokenization-of-render on one side, span arithmetic on the
        // other)
        graft.trainprep.TrainPrep.packNoSplitOffsets(
            rendered, convId, "text", merges, context,
            oversize = oversizePolicy)
          .write.mode("overwrite").parquet(s"$out/packed_docs")
        val docs = spark.read.parquet(s"$out/packed_docs")
        // per-ROW policy cross-check (r15 ADVICE): the aggregate
        // composition invariant below compares two corpus-level sums, so
        // offsetting per-conv drifts could in principle cancel in it;
        // this pins the oversize policy at max granularity on the
        // already-materialized frame — shipped == min(doc, context)
        // under truncate (== doc under drop: oversize rows are gone),
        // and the shipped count IS the shipped ids array's length
        val expectShipped =
          if (oversizePolicy == "truncate")
            least(col("n_tokens_doc"), lit(context.toLong))
          else col("n_tokens_doc")
        val policyDrift = docs.filter(
          col("n_tokens") =!= expectShipped ||
            col("n_tokens") =!= size(col("token_ids")).cast("long"))
          .limit(1).count()
        require(policyDrift == 0L,
          s"oversize policy drifted on at least one conversation: a row's " +
            s"shipped n_tokens disagrees with min(n_tokens_doc, $context) " +
            "or with its own token_ids length")
        graft.trainprep.TrainPrep.packNoSplitRollup(docs)
          .write.mode("overwrite").parquet(s"$out/packed")
        // masks: conv-local loss spans shifted to sequence coordinates,
        // clipped to the shipped (possibly truncated) token range
        spans.filter(col("loss_end") > col("loss_start"))
          .join(docs.select(col(convId), col("grp"), col("bin_in_grp"),
            col("start_in_seq"),
            col("n_tokens").as("__shipped")), convId) // spans has n_tokens too
          .select(col("grp"), col("bin_in_grp"), col(convId), col("turn_idx"),
            (col("start_in_seq") + least(col("loss_start"), col("__shipped")))
              .as("loss_start_in_seq"),
            (col("start_in_seq") + least(col("loss_end"), col("__shipped")))
              .as("loss_end_in_seq"))
          .filter(col("loss_end_in_seq") > col("loss_start_in_seq"))
          .write.mode("overwrite").parquet(s"$out/masks")
        val packed = spark.read.parquet(s"$out/packed")
        val masks = spark.read.parquet(s"$out/masks")
        val packedRow = packed.agg(count(lit(1)), sum(col("n_tokens")),
          max(col("n_tokens"))).head()
        // the atomic contract: NO sequence exceeds the context — this is
        // exactly what the oversize policy exists to guarantee
        require(longOr0(packedRow, 2) <= context,
          s"a packed sequence holds ${longOr0(packedRow, 2)} tokens " +
            s"> --context $context — oversize policy failed")
        // exact composition invariant, oversize-adjusted: shipped tokens
        // == span-predicted total MINUS the tokens the policy removed
        // (truncate: each oversize conv loses total−context; drop: all).
        // Derived from spans/ — the SPAN-side accounting, independent of
        // the ids-side tokenization it cross-checks — via template
        // additivity (a conv's span total IS its render's token count)
        val overRow = spans.groupBy(col(convId))
          .agg(sum(col("n_tokens")).as("__n"))
          .filter(col("__n") > context)
          .agg(count(lit(1)), coalesce(sum(
            if (oversizePolicy == "truncate") col("__n") - context
            else col("__n")), lit(0L))).head()
        val removed = longOr0(overRow, 1)
        require(longOr0(packedRow, 1) == totalTokens - removed,
          s"composition invariant violated: packed/ holds " +
            s"${longOr0(packedRow, 1)} tokens but spans predict " +
            s"$totalTokens minus $removed policy-removed")
        val maskRow = masks.agg(count(lit(1)),
          sum(col("loss_end_in_seq") - col("loss_start_in_seq"))).head()
        // truncation can only SHRINK loss coverage, never grow it
        assert(longOr0(maskRow, 1) <= lossTokens,
          s"mask tokens ${longOr0(maskRow, 1)} exceed span loss $lossTokens")
        Map("convs" -> rendered.count(), "turns" -> spanRow.getLong(0),
          "total_tokens" -> totalTokens, "loss_tokens" -> lossTokens,
          "sequences" -> packedRow.getLong(0),
          "mask_rows" -> maskRow.getLong(0),
          "oversize_convs" -> overRow.getLong(0),
          "tokens_removed" -> removed)
    }
    println(stats.map { case (k, v) => s""""$k":$v""" }
      .mkString("{\"metric\":\"sft_export\",", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("sft-export")(s => run(s, CliArgs.parse(args)))
}
