package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** The genuinely-streaming property of E54 that the single-file parity query
  * cannot show: LSH candidate state SPANS micro-batches. A near-dup pair
  * split across two files (→ two AvailableNow batches under
  * maxFilesPerTrigger=1) must land in one bucket, because the band-bucket
  * state carries the batch-1 member until its batch-2 twin arrives. */
class StreamLshSpec extends SparkSpec {
  import spark.implicits._

  test("band buckets accumulate across micro-batches (near-dup split over two files)") {
    val d = Files.createTempDirectory("stream_lsh").toFile
    d.deleteOnExit()
    val shared = "alpha beta gamma delta epsilon zeta"
    // file 1: doc 1 = shared text, doc 2 = unrelated
    Seq((1L, shared), (2L, "one two three four five six"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/in/f1")
    // file 2: doc 3 = the near-identical twin of doc 1
    Seq((3L, shared))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/in/f2")
    // flatten to two leaf files so maxFilesPerTrigger=1 forces two batches
    val leaves = Seq("f1", "f2").map { f =>
      new java.io.File(s"$d/in/$f").listFiles()
        .find(_.getName.endsWith(".parquet")).get
    }
    leaves.zipWithIndex.foreach { case (part, i) =>
      Files.move(part.toPath, new java.io.File(s"$d/docs_$i.parquet").toPath)
    }
    Seq("f1", "f2").foreach(f => new java.io.File(s"$d/in/$f").listFiles()
      .foreach(_.delete()))

    val src = spark.readStream.schema("doc_id LONG, text STRING")
      .option("pathGlobFilter", "docs_*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(d.getAbsolutePath)
    val agg = StreamParity.lshBucketAgg(StreamParity.bandedDocs(src))
    val ckpt = Files.createTempDirectory("stream_lsh_ckpt").toFile
    spark.catalog.dropTempView("stream_lsh_spec")
    val q = agg.writeStream.format("memory").queryName("stream_lsh_spec")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()

    assert(nBatches >= 2, s"expected >=2 data micro-batches, saw $nBatches")
    val buckets = spark.table("stream_lsh_spec")
      .select("band", "ids_csv", "n").as[(Int, String, Long)].collect().toSeq
    // identical text → identical signature → both bands collide; members
    // arrived in DIFFERENT batches, so the pairing proves cross-batch state
    assert(buckets.map(_._2).distinct == Seq("1,3"), buckets.toString)
    assert(buckets.map(_._1).sorted == Seq(0, 1))
    assert(buckets.forall(_._3 == 2L))
  }

  test("HLL register state spans micro-batches and equals the batch estimate") {
    val d = Files.createTempDirectory("stream_hll").toFile
    d.deleteOnExit()
    val batch1 = Seq((1L, "en", "alpha beta gamma delta"),
      (2L, "de", "eins zwei drei"))
    val batch2 = Seq((3L, "en", "gamma delta epsilon zeta eta"))
    Seq(batch1, batch2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "lang", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$d/stage_$i")
      val part = new java.io.File(s"$d/stage_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$d/docs_$i.parquet").toPath)
    }
    val src = spark.readStream.schema("doc_id LONG, lang STRING, text STRING")
      .option("pathGlobFilter", "docs_*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(d.getAbsolutePath)
    val regs = graft.trainprep.CorpusOverlap.hllRegisters(src, "lang", "text")
    val sink = StreamParity.runToTable(spark, regs, "stream_hll_spec",
      OutputMode.Complete())
    val got = graft.trainprep.CorpusOverlap.hllEstimate(sink, "lang")
      .as[(String, Double)].collect().toMap
    val want = graft.trainprep.CorpusOverlap.hllDistinctTokens(
        (batch1 ++ batch2).toDF("doc_id", "lang", "text"), "lang", "text")
      .as[(String, Double)].collect().toMap
    // register max is order-insensitive: stream state == batch sketch, so
    // the estimates are bit-identical (en spans both micro-batches)
    assert(got === want)
    assert(got.keySet === Set("en", "de"))
  }
}
