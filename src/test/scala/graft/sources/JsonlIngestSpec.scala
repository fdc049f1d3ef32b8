package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** JSONL ingest with corrupt-record quarantine: good and bad rows must
  * PARTITION the input (nothing silently dropped), and the round trip with
  * CorpusPrep's gzip JSONL export must parse clean. */
class JsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("doc_id LONG, text STRING")

  test("corrupt lines quarantine; good+bad partition the input exactly") {
    val dir = Files.createTempDirectory("jsonl_ingest").toFile
    val f = new java.io.File(dir, "shard.jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2 "text": "missing comma"}""", // corrupt
      """{"doc_id": 3, "text": "gamma"}""",
      """not json at all""") // corrupt
    Files.write(f.toPath, lines.mkString("\n").getBytes("UTF-8"))
    val (good, bad) = Sources.readJsonlCorpus(spark, f.getPath, schema)
    val goodRows = good.as[(Long, String)].collect().toSet
    val badRows = bad.as[String].collect().toSet
    assert(goodRows == Set((1L, "alpha"), (3L, "gamma")))
    assert(badRows.size == 2, badRows.toString)
    assert(badRows.exists(_.contains("missing comma")))
    assert(badRows.contains("not json at all"))
    assert(goodRows.size + badRows.size == lines.size, "nothing silently dropped")
  }

  test("round-trips CorpusPrep's gzip JSONL export cleanly") {
    val dir = Files.createTempDirectory("jsonl_rt").toString
    Seq((1L, "hello world"), (2L, "foo bar")).toDF("doc_id", "text")
      .repartition(1).write.option("compression", "gzip").json(s"$dir/export")
    val (good, bad) = Sources.readJsonlCorpus(spark, s"$dir/export", schema)
    assert(good.count() == 2 && bad.count() == 0)
  }
}
