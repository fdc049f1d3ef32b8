package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SftExport CLI: all four sections written, the stats contract
  * internally consistent, the composition invariant enforced, and loud
  * argument diagnostics. */
class SftExportSpec extends SparkSpec {

  private def writeConvs(dir: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, Seq(("system", "be terse"), ("user", "the thing sang"),
        ("assistant", "and it rang ander"))),
      (2L, Seq(("user", "in and er"), ("assistant", "thern"),
        ("user", "the"), ("assistant", "and"))),
      (3L, Seq(("user", "the rain"), ("assistant", "")))
    ).toDF("conv_id", "raw")
      .select(col("conv_id"), transform(col("raw"),
        t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))
      .write.parquet(dir)
  }

  test("exports rendered/spans/packed/masks with a consistent stats contract") {
    val dir = Files.createTempDirectory("sft_export").toString
    writeConvs(s"$dir/in")
    val stats = SftExport.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/out", "context" -> "16"))
    assert(stats("convs") == 3L && stats("turns") == 9L)
    assert(stats("loss_tokens") > 0L)
    assert(stats("total_tokens") > stats("loss_tokens"))
    // packing covers every rendered token in ceil(total/ctx) windows
    assert(stats("sequences") == (stats("total_tokens") + 15) / 16)
    val packed = spark.read.parquet(s"$dir/out/packed")
    val packedTokens = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(packedTokens == stats("total_tokens"),
      "the packed windows and the span totals must count the same stream")
    // every mask row points into an existing window and stays in range
    val masks = spark.read.parquet(s"$dir/out/masks")
    val seqIds = packed.select("seq_id").collect().map(_.getLong(0)).toSet
    masks.collect().foreach { r =>
      assert(seqIds.contains(r.getAs[Long]("seq_id")))
      val (s0, e0) = (r.getAs[Long]("loss_start_in_seq"),
        r.getAs[Long]("loss_end_in_seq"))
      assert(s0 >= 0 && s0 < e0 && e0 <= 16)
    }
    // loss-role parameter reaches both spans and masks consistently
    val stats2 = SftExport.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/out2", "context" -> "16",
      "loss-role" -> "user"))
    assert(stats2("loss_tokens") > 0L &&
      stats2("loss_tokens") != stats("loss_tokens"))
  }

  test("atomic pack: convs stay whole, truncate ships the exact id prefix, drop omits") {
    import graft.functions.Bpe
    val dir = Files.createTempDirectory("sft_export_atomic").toString
    writeConvs(s"$dir/in")
    val convs = spark.read.parquet(s"$dir/in")
    // choose a context that makes the LONGEST conversation oversize —
    // the policy path must actually fire
    val fullIds = graft.trainprep.SftPrep.renderChat(convs, "conv_id", "turns")
      .select(col("conv_id"), Bpe.tokenIds(col("text")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val ctx = fullIds.values.map(_.size).max - 1
    assert(ctx >= 2, s"fixture too small for an oversize case: $fullIds")

    val stats = SftExport.run(spark, Map("in" -> s"$dir/in",
      "out" -> s"$dir/out", "context" -> ctx.toString, "pack" -> "atomic"))
    assert(stats("oversize_convs") >= 1L && stats("tokens_removed") >= 1L)
    val docs = spark.read.parquet(s"$dir/out/packed_docs").collect()
      .map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[Boolean]("oversize"),
          r.getSeq[Int](r.fieldIndex("token_ids")).toList)))
      .toMap
    assert(docs.size === 3, "truncate keeps every conversation")
    docs.foreach { case (id, (over, shipped)) =>
      val full = fullIds(id).toList
      if (over) assert(shipped === full.take(ctx),
        s"conv $id: truncated ids must be the exact prefix of the full ids")
      else assert(shipped === full)
    }
    // the atomic require held: no sequence exceeds the context
    val packed = spark.read.parquet(s"$dir/out/packed")
    assert(packed.agg(max("n_tokens")).head().getLong(0) <= ctx)
    // oversize-adjusted composition: shipped == predicted − removed
    assert(packed.agg(sum("n_tokens")).head().getLong(0) ===
      stats("total_tokens") - stats("tokens_removed"))
    // masks stay inside their conv's shipped range
    spark.read.parquet(s"$dir/out/masks").collect().foreach { r =>
      val (s0, e0) = (r.getAs[Long]("loss_start_in_seq"),
        r.getAs[Long]("loss_end_in_seq"))
      assert(s0 >= 0 && s0 < e0 && e0 <= ctx)
    }

    // drop: the oversize conversation leaves the corpus entirely
    val stats2 = SftExport.run(spark, Map("in" -> s"$dir/in",
      "out" -> s"$dir/out2", "context" -> ctx.toString,
      "pack" -> "atomic", "oversize" -> "drop"))
    val kept = spark.read.parquet(s"$dir/out2/packed_docs")
      .select("conv_id").collect().map(_.getLong(0)).toSet
    val overIds = docs.collect { case (id, (true, _)) => id }.toSet
    assert(kept === docs.keySet -- overIds, s"dropped wrong convs: $kept")
    assert(stats2("tokens_removed") === overIds.toSeq.map(fullIds(_).size.toLong).sum)

    // --oversize is an atomic-only flag
    val e = intercept[IllegalArgumentException] {
      SftExport.run(spark, Map("in" -> s"$dir/in", "out" -> s"$dir/o3",
        "oversize" -> "truncate"))
    }
    assert(e.getMessage.contains("atomic"), e.getMessage)
  }

  test("empty input exports empty sections instead of blowing up") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sft_export_empty").toString
    Seq.empty[(Long, Seq[(String, String)])].toDF("conv_id", "raw")
      .select(col("conv_id"), transform(col("raw"),
        t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))
      .write.parquet(s"$dir/in")
    val stats = SftExport.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/out", "context" -> "16"))
    assert(stats("convs") == 0L && stats("turns") == 0L &&
      stats("total_tokens") == 0L && stats("loss_tokens") == 0L &&
      stats("sequences") == 0L && stats("mask_rows") == 0L)
  }

  test("argument diagnostics are loud") {
    val dir = Files.createTempDirectory("sft_export_bad").toString
    writeConvs(s"$dir/in")
    intercept[IllegalArgumentException] {
      SftExport.run(spark, Map("in" -> s"$dir/in", "out" -> s"$dir/o",
        "turns-col" -> "nope"))
    }
    intercept[IllegalArgumentException] {
      SftExport.run(spark, Map("in" -> s"$dir/in", "out" -> s"$dir/o",
        "context" -> "0"))
    }
    // a flat string column is not a turns array
    import spark.implicits._
    Seq((1L, "not turns")).toDF("conv_id", "turns")
      .write.parquet(s"$dir/flat")
    intercept[IllegalArgumentException] {
      SftExport.run(spark, Map("in" -> s"$dir/flat", "out" -> s"$dir/o"))
    }
  }
}
