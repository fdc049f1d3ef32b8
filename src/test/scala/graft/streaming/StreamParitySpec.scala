package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming runs must equal their batch twins once all input is consumed —
  * the §2.9 duality claim, checked end-to-end on a real file-stream source
  * (the oracle-gated q_stream_* queries check the same thing against
  * DuckDB at the driver's scale factors). */
class StreamParitySpec extends SparkSpec {
  import spark.implicits._

  // a tiny events.parquet in the shape the testdata uses (ts = epoch ns)
  private lazy val dir: String = {
    val d = Files.createTempDirectory("stream_parity").toFile
    d.deleteOnExit()
    val base = 1700000000000000000L
    Seq(
      (1L, base + 1000L, 10L, "view", 1.0, "{}"),
      (2L, base + 2000L, 10L, "view", 2.0, "{}"),
      (3L, base + 900L * 1000000000L, 11L, "click", 3.0, "{}"),
      (4L, base + 901L * 1000000000L, 11L, "view", 4.0, "{}"),
      (5L, base + 901L * 1000000000L, 10L, "click", 5.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/staging")
    // the testdata ships events.parquet as a single FILE (pathGlobFilter
    // matches leaf file names) — promote the part file to that shape
    val part = new java.io.File(s"$d/staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new java.io.File(s"$d/events.parquet").toPath)
    d.getAbsolutePath
  }

  test("streaming right-closed resample equals the batch bucketing") {
    val out = StreamParity.resampleComplete(spark, dir, 900)
      .orderBy("bucket_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      .select(graft.ops.TimeSeriesOps.bucketRightClosedNs(col("ts"), 900).as("bucket_ns"),
        col("value"))
      .groupBy("bucket_ns").agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("bucket_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.sameElements(batch))
    assert(out.length == 2) // right-closed: the t=+900s events close bucket 2
  }

  test("streaming dropDuplicates emits exactly the distinct key set") {
    val out = StreamParity.distinctPairs(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(out == Set((10L, "view"), (10L, "click"), (11L, "click"), (11L, "view")))
  }

  test("streaming session_window sessionization: gap merge + exact-boundary split") {
    val base = 1700000000000000000L
    // gap 600 s: user 10's µs-spaced pair is one session, its 901 s event
    // opens another; user 11's 900/901 s events merge into one
    val out = StreamParity.sessionizePerUser(spark, dir, 600)
      .orderBy("user_id", "start_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val gapNs = 600L * 1000000000L
    assert(out.toSeq == Seq(
      (10L, base + 1000L, base + 2000L + gapNs, 2L, 3.0),
      (10L, base + 901L * 1000000000L, base + 901L * 1000000000L + gapNs, 1L, 5.0),
      (11L, base + 900L * 1000000000L, base + 901L * 1000000000L + gapNs, 2L, 7.0)))
  }

  // a docs fixture for the decontamination stream: 0-49 are "eval", 50+
  // "train"; doc 55 carries eval doc 10's exact text (natural leak)
  private lazy val docsDir: String = {
    val d = Files.createTempDirectory("stream_decontam").toFile
    d.deleteOnExit()
    val rows = (0L until 60L).map { i =>
      val text = if (i == 55L) "text 10" else s"text $i"
      (i, text, "en", "src", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/staging")
    val part = new java.io.File(s"$d/staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new java.io.File(s"$d/documents.parquet").toPath)
    d.getAbsolutePath
  }

  test("streaming decontamination flags planted copies and natural leaks, statelessly") {
    val out = StreamParity.decontaminateStream(spark, docsDir)
      .as[(Long, Boolean)].collect().toMap
    // stream side = train (50-59) + id-shifted eval copies (200000-200049)
    assert(out.size == 60)
    (0L until 50L).foreach(i => assert(out(200000L + i), s"planted copy $i must flag"))
    assert(out(55L), "train doc with an eval text must flag")
    ((50L until 60L).filter(_ != 55L)).foreach(i => assert(!out(i), s"clean doc $i"))
  }

  test("streaming OHLC bars equal the batch compaction") {
    val out = StreamParity.ohlcBars(spark, dir, stepSeconds = 900, maxUser = 100L)
      .orderBy("user_id", "bucket_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    val batch = graft.ops.TimeSeriesOps.ohlcBars(
        spark.read.parquet(s"$dir/events.parquet")
          .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
          .filter(col("user_id") < 100 && !isnan(col("value"))),
        Seq("user_id"), "ts", "value", stepSeconds = 900,
        tiebreak = Seq("event_id"))
      .orderBy("user_id", "bucket_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(out.sameElements(batch))
    assert(out.nonEmpty)
  }

  test("streaming max-time equals the batch aggregate") {
    val out = StreamParity.maxTimePerUser(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    val base = 1700000000000000000L
    assert(out == Set(
      (10L, base + 901L * 1000000000L, 3L),
      (11L, base + 901L * 1000000000L, 2L)))
  }
}
