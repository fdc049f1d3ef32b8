package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dataset-card CLI: sections land, summary numbers cross-check against
  * direct computations on the same fixture. */
class CorpusReportSpec extends SparkSpec {

  test("report sections and summary agree with direct computation") {
    import spark.implicits._
    val in = Files.createTempDirectory("report_in").toString
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, boiler, "web"), (2L, boiler, "web"),       // exact dup pair
      (3L, "a short clean doc of words", "web"),
      (4L, "unique text with broken ���� chars", "books"),
      (5L, (1 to 200).map(i => s"tok$i").mkString(" "), "books"))
      .toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("report_out").toString
    val stats = CorpusReport.run(spark, Map(
      "in" -> in, "out" -> out, "context" -> "128"))

    assert(stats("docs") == 5L)
    assert(stats("distinct_texts") == 4L) // the dup pair collapses
    // tokens: 12 + 12 + 6 + 6 + 200
    assert(stats("tokens") == 236L)
    // doc 4 carries 4 replacement chars in ~45 chars — ratio far above
    // the 0.001 default; everything else is clean
    assert(stats("encoding_clean") == 4L)

    val slices = spark.read.parquet(s"$out/slices")
    assert(slices.count() == 2L) // web, books
    val web = slices.filter(col("source") === "web").head()
    assert(web.getAs[Long]("n_docs") == 3L)
    assert(web.getAs[Long]("n_distinct_texts") == 2L)

    val clusters = spark.read.parquet(s"$out/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 3L, 2L -> 1L))

    val hist = spark.read.parquet(s"$out/seq_len")
    // doc 5 has 200 tokens → bucket 256, 2 sequences at ctx 128
    val b256 = hist.filter(col("len_bucket") === 256).head()
    assert(b256.getAs[Long]("n_sequences") == 2L)
    assert(b256.getAs[Long]("pad_waste_tokens") == 56L)
  }

  test("--embedding-lake adds the drift section; --lake-baseline adds verdicts") {
    import spark.implicits._
    import graft.io.EmbeddingLake
    val in = Files.createTempDirectory("report_emb_in").toString
    Seq((1L, "a doc", "web"), (2L, "b doc", "web"))
      .toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in)
    // a small lake with its codebook persisted inside, then a drifted
    // append so the baseline comparison has something to flag
    val lake = Files.createTempDirectory("report_lake").toString + "/emb"
    val vecs = (0L until 60L).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(4)(r.nextFloat() * 2 - 1))
    }
    val cb = EmbeddingLake.writePartitioned(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", lake,
      nCentroids = 3, kmeansIters = 1)
    EmbeddingLake.writeCodebook(spark, lake, cb)
    assert((EmbeddingLake.readCodebook(spark, lake) zip cb)
      .forall { case (a, b) => a == b }, "codebook round-trips")
    val basePath = Files.createTempDirectory("report_base").toString + "/drift"
    EmbeddingLake.driftReport(spark, lake, "embedding", cb)
      .write.parquet(basePath)
    EmbeddingLake.append((100L until 140L).map(i =>
        (i, Seq.fill(4)(9.0f + (i % 3)))).toDF("vec_id", "embedding"),
      "embedding", lake, cb)

    // without a baseline: raw drift report + totals in the summary
    val out1 = Files.createTempDirectory("report_emb_o1").toString
    val s1 = CorpusReport.run(spark, Map("in" -> in, "out" -> out1,
      "embedding-lake" -> lake))
    assert(s1("lake_cells") == 3L && s1("lake_vectors") == 100L)
    assert(!s1.contains("lake_retrain_cells"),
      "no baseline -> no verdict column to summarize")
    assert(spark.read.parquet(s"$out1/embedding_drift")
      .columns.toSet == Set("ivf_cell", "n", "mean_residual", "max_residual"))

    // with the training-time baseline: per-cell retrain verdicts
    val out2 = Files.createTempDirectory("report_emb_o2").toString
    val s2 = CorpusReport.run(spark, Map("in" -> in, "out" -> out2,
      "embedding-lake" -> lake, "lake-baseline" -> basePath))
    assert(s2("lake_cells") == 3L && s2("lake_vectors") == 100L)
    assert(s2("lake_retrain_cells") >= 1L,
      "the far-field append must flag at least one cell")
    val drift = spark.read.parquet(s"$out2/embedding_drift")
    assert(drift.columns.contains("retrain") && drift.count() == 3L)

    // a baseline without a lake must be refused, not silently ignored
    val e = intercept[IllegalArgumentException] {
      CorpusReport.run(spark, Map("in" -> in, "out" -> out2,
        "lake-baseline" -> basePath))
    }
    assert(e.getMessage.contains("--embedding-lake"), e.getMessage)
  }

  test("--integrity emits the manifest + root; baseline localizes one planted edit") {
    import spark.implicits._
    val in = Files.createTempDirectory("report_int_in").toString
    val docs = (0L until 80L).map(i => (i, s"doc body $i", "web"))
    docs.toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("report_int_out").toString
    val stats = CorpusReport.run(spark, Map(
      "in" -> in, "out" -> out, "integrity" -> "8"))
    // fresh shape: manifest section on disk, groups counted in the card,
    // root recomputable from the published parquet
    val m = spark.read.parquet(s"$out/integrity")
    assert(stats("integrity_groups") == m.count())
    assert(graft.io.IntegrityManifest.root(m).length == 64)
    assert(m.agg(sum(col("n_docs"))).head.getLong(0) == 80L)

    // one planted edit → exactly one content_changed group in the diff
    val in2 = Files.createTempDirectory("report_int_in2").toString
    docs.map { case (7L, _, s) => (7L, "doc body 7 EDITED", s); case r => r }
      .toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in2)
    val out2 = Files.createTempDirectory("report_int_out2").toString
    val stats2 = CorpusReport.run(spark, Map(
      "in" -> in2, "out" -> out2, "integrity" -> "8",
      "integrity-baseline" -> s"$out/integrity"))
    assert(stats2("integrity_content_changed") == 1L, stats2.toString)
    assert(stats2("integrity_group_added") == 0L &&
      stats2("integrity_group_dropped") == 0L &&
      stats2("integrity_count_changed") == 0L)
    assert(spark.read.parquet(s"$out2/integrity_diff").count() == 1L)
    // roots differ across the edit (the card's headline comparison)
    assert(graft.io.IntegrityManifest.root(m) !==
      graft.io.IntegrityManifest.root(spark.read.parquet(s"$out2/integrity")))
    // flag dependency refuses loudly
    val e = intercept[IllegalArgumentException] {
      CorpusReport.run(spark, Map("in" -> in, "out" -> out,
        "integrity-baseline" -> s"$out/integrity"))
    }
    assert(e.getMessage.contains("--integrity"))
  }

  test("an EMPTY input corpus reports zeros instead of throwing") {
    import spark.implicits._
    val in = Files.createTempDirectory("report_empty_in").toString
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("report_empty_out").toString
    // sum() over zero rows is NULL — every summary read-back must take
    // the longOr0 path (docs/tokens/gates/clusters), not NPE
    val stats = CorpusReport.run(spark, Map("in" -> in, "out" -> out))
    assert(stats === Map("docs" -> 0L, "tokens" -> 0L,
      "distinct_texts" -> 0L, "gopher_pass" -> 0L, "c4_pass" -> 0L,
      "repetition_pass" -> 0L, "encoding_clean" -> 0L))
  }

  test("--token-counter bpe adds the vocab section with per-slice unk rates") {
    import spark.implicits._
    val in = Files.createTempDirectory("report_vocab_in").toString
    Seq(
      (1L, "the and the", "clean"),   // every token in the tiny vocab
      (2L, "zz qq", "oov"))           // nothing in vocab → all unks
      .toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("report_vocab_out").toString
    val merges = Files.createTempFile("merges", ".txt")
    Files.writeString(merges, "t h\nth e\na n\nan d\n")
    CorpusReport.run(spark, Map(
      "in" -> in, "out" -> out, "context" -> "128",
      "token-counter" -> "bpe", "bpe-merges" -> merges.toString))
    val vocab = spark.read.parquet(s"$out/vocab")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_unk"), r.getAs[Double]("unk_rate"))).toMap
    assert(vocab("clean") == ((0L, 0.0)))
    assert(vocab("oov")._2 == 1.0)
    // whitespace counting (the default) writes no vocab section
    val out2 = Files.createTempDirectory("report_vocab_out2").toString
    CorpusReport.run(spark, Map("in" -> in, "out" -> out2))
    assert(!new java.io.File(s"$out2/vocab").exists())
  }

  test("bad token-counter and missing group column diagnose loudly") {
    import spark.implicits._
    val in = Files.createTempDirectory("report_in2").toString
    Seq((1L, "a b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    intercept[IllegalArgumentException] {
      CorpusReport.run(spark, Map("in" -> in,
        "out" -> Files.createTempDirectory("report_out2").toString))
    } // no 'source' column
    intercept[RuntimeException] {
      CorpusReport.run(spark, Map("in" -> in,
        "out" -> Files.createTempDirectory("report_out3").toString,
        "group-col" -> "doc_id", "token-counter" -> "sentencepiece"))
    }
  }
}
