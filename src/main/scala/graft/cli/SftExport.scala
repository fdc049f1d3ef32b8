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
  * plus a one-line JSON stats contract. The run REQUIRES the composition
  * invariant it exports — total masked tokens == total loss-span tokens —
  * so a template/tokenizer mismatch fails the command, not the training
  * run. `--loss-role` (default assistant) and `--bpe-merges` (a
  * merges.txt; default: the committed trained table) parameterize it.
  *
  * Scale shape: render/tokenize are map passes; spans shuffle turn
  * metadata once; packing rides the distributed two-pass prefix scan;
  * masks join span metadata. Downstream sections read `rendered/` back
  * from disk rather than re-deriving it, so the render computes once.
  *
  * `runMain graft.cli.SftExport --in <convs.parquet> --out <dir>
  *   [--context 4096] [--loss-role assistant] [--bpe-merges <file>]`
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
    // packing reads the render back from disk — one render computation
    val rendered = spark.read.parquet(s"$out/rendered")
    graft.trainprep.TrainPrep.packedTokenIds(
        rendered, convId, "text", merges, context)
      .write.mode("overwrite").parquet(s"$out/packed")
    SftPrep.packedLossMasks(convs, convId, turnsCol, cnt, context, lossRole)
      .write.mode("overwrite").parquet(s"$out/masks")

    val spans = spark.read.parquet(s"$out/spans")
    val packed = spark.read.parquet(s"$out/packed")
    val masks = spark.read.parquet(s"$out/masks")
    val spanRow = spans.agg(count(lit(1)),
      sum(col("loss_end") - col("loss_start")),
      sum(col("n_tokens"))).head()
    val maskRow = masks.agg(count(lit(1)),
      sum(col("loss_end_in_seq") - col("loss_start_in_seq"))).head()
    val lossTokens = spanRow.getLong(1)
    val maskTokens = if (maskRow.isNullAt(1)) 0L else maskRow.getLong(1)
    require(maskTokens == lossTokens,
      s"composition invariant violated: $maskTokens masked tokens vs " +
        s"$lossTokens loss-span tokens — template/tokenizer mismatch")
    val stats = Map(
      "convs" -> rendered.count(),
      "turns" -> spanRow.getLong(0),
      "total_tokens" -> spanRow.getLong(2),
      "loss_tokens" -> lossTokens,
      "sequences" -> packed.count(),
      "mask_rows" -> maskRow.getLong(0))
    println(stats.map { case (k, v) => s""""$k":$v""" }
      .mkString("{\"metric\":\"sft_export\",", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("sft-export")(s => run(s, CliArgs.parse(args)))
}
