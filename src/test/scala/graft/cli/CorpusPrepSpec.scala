package graft.cli

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end corpus-prep CLI over the driver's real documents table:
  * filter → sample → redact → near-dedup → pack, then the stats contract. */
class CorpusPrepSpec extends SparkSpec {

  test("full pipeline runs end-to-end and reports consistent stats") {
    val out = Files.createTempDirectory("corpus_prep").toString
    val stats = CorpusPrep.run(spark, Map(
      "in" -> "/root/testdata/sf0.001/documents.parquet",
      "out" -> out,
      "lang" -> "en",
      "min-quality" -> "0.4",
      "redact" -> "true",
      "dedup" -> "near",
      "budget" -> "512"))
    assert(stats("docs_in") > 0)
    assert(stats("docs_out") > 0 && stats("docs_out") <= stats("docs_in"))
    assert(stats("chunks") > 0)
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.count() == stats("docs_out"))
    assert(chunks.columns.toSet ==
      Set("doc_id", "n_tokens", "start_offset", "chunk_id", "chunk_end_id"))
  }

  test("transitive dedup keeps no more docs than one-hop near dedup") {
    // chains collapse further under the CC closure, never less
    val outNear = Files.createTempDirectory("corpus_near").toString
    val outTrans = Files.createTempDirectory("corpus_trans").toString
    val in = "/root/testdata/sf0.001/documents.parquet"
    val near = CorpusPrep.run(spark, Map(
      "in" -> in, "out" -> outNear, "dedup" -> "near"))
    val trans = CorpusPrep.run(spark, Map(
      "in" -> in, "out" -> outTrans, "dedup" -> "transitive"))
    assert(trans("docs_in") == near("docs_in"))
    assert(trans("docs_out") <= near("docs_out"))
    assert(trans("docs_out") > 0)
  }

  test("decontamination drops exactly the docs sharing an n-gram with the bench set") {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // benchmark = 5 docs lifted straight from the corpus: those docs (and
    // any near-identical template siblings) must be dropped, others kept
    val benchDir = Files.createTempDirectory("bench").toString + "/bench.parquet"
    base.filter(col("doc_id") < 5).write.parquet(benchDir)
    val out = Files.createTempDirectory("corpus_decon").toString
    val stats = CorpusPrep.run(spark, Map(
      "in" -> "/root/testdata/sf0.001/documents.parquet",
      "out" -> out, "decontaminate" -> benchDir, "ngram" -> "8"))
    assert(stats("contaminated_dropped") >= 5,
      "the benchmark's own source docs must be flagged")
    assert(stats("docs_out") == stats("docs_in") - stats("contaminated_dropped"))
    // surviving docs contain none of the flagged ids
    val survivors = spark.read.parquet(s"$out/chunks")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((0L until 5L).forall(!survivors.contains(_)))
  }

  test("exact dedup stage removes the duplicates a shifted copy introduces") {
    val out = Files.createTempDirectory("corpus_prep2").toString
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import org.apache.spark.sql.functions._
    val dup = base.unionByName(base.withColumn("doc_id", col("doc_id") + 1000000L))
    val in = Files.createTempDirectory("corpus_in").toString + "/docs.parquet"
    dup.write.parquet(in)
    val stats = CorpusPrep.run(spark, Map(
      "in" -> in, "out" -> out, "dedup" -> "exact"))
    assert(stats("docs_in") == 2 * base.count())
    assert(stats("docs_out") == base.count())
  }
}
