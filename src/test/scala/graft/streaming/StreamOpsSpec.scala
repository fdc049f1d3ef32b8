package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming resample semantics match the batch path — SURVEY.md §2.9: the
  * streaming window agg must agree exactly with `TimeSeriesOps`'
  * right-closed batch resample so cron-batch and stream deployments of the
  * same pipeline converge to identical series. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming right-closed 15-min resample matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF.toDF("id", "time", "value")

    val agg = StreamOps.resampleRightClosedSum(stream, 900)
    val q = agg.writeStream.format("memory").queryName("resampled")
      .outputMode("update").start()
    try {
      mem.addData(
        ("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0),
        ("a", Timestamp.valueOf("2024-01-01 00:15:00"), 2.0), // boundary → (00:00,00:15]
        ("a", Timestamp.valueOf("2024-01-01 00:20:00"), 4.0),
        ("b", Timestamp.valueOf("2024-01-01 00:30:00"), 8.0))
      q.processAllAvailable()
      val got = spark.table("resampled")
        .groupBy("id", "time").agg(max("value").as("value")) // update-mode emits per-batch rows
        .orderBy("id", "time")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2)))
      assert(got === Array(
        ("a", "2024-01-01 00:15:00.0", 3.0),
        ("a", "2024-01-01 00:30:00.0", 4.0),
        ("b", "2024-01-01 00:30:00.0", 8.0)))
    } finally q.stop()
  }

  test("watermarked append query through the parity harness still flushes closed windows") {
    // StreamParity.runToTable disables the no-data microbatch ONLY for
    // unwatermarked plans. This plan IS watermarked and append-mode: its
    // closed windows are emitted by the watermark-advancing empty batch
    // after the data batch — if the harness suppressed it here, the sink
    // would stay EMPTY and the asserts below fail (the ADVICE regression).
    val dir = java.nio.file.Files.createTempDirectory("wm_parity").toFile
    Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0),
      ("a", Timestamp.valueOf("2024-01-01 00:20:00"), 2.0),
      // sentinel far past the real data: advances the watermark beyond the
      // real windows so append mode may flush them; its own window stays
      // open and is correctly withheld
      ("zz", Timestamp.valueOf("2024-01-01 03:00:00"), 0.0)
    ).toDF("id", "time", "value").coalesce(1)
      .write.parquet(new java.io.File(dir, "s.parquet").toString)
    val stream = spark.readStream
      .schema("id STRING, time TIMESTAMP, value DOUBLE")
      .parquet(new java.io.File(dir, "s.parquet").toString)
    val agg = StreamOps.resampleRightClosedSum(stream, 900,
      watermarkDelay = "0 seconds")
    val out = StreamParity.runToTable(spark, agg, "wm_parity_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = out.filter(col("id") === "a").orderBy("time")
      .collect().map(r => (r.getString(0), r.getTimestamp(2).toString, r.getDouble(1)))
    assert(got === Array(
      ("a", "2024-01-01 00:15:00.0", 1.0),
      ("a", "2024-01-01 00:30:00.0", 2.0)))
  }

  test("watermarked parity run flushes windows WHILE unwatermarked helpers start concurrently") {
    // Round-17 race regression pin: per-start confs used to be set and
    // restored on the SHARED session, so a watermarked query that started
    // while an unwatermarked sibling held noDataMicroBatches=false never
    // flushed its final windows. Confs now ride a memoized cloned session;
    // this drives both shapes CONCURRENTLY and asserts the watermarked
    // results stay complete. Purely semantic — no wall-clock assertions.
    val dir = java.nio.file.Files.createTempDirectory("wm_race").toFile
    Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0),
      ("zz", Timestamp.valueOf("2024-01-01 03:00:00"), 0.0)
    ).toDF("id", "time", "value").coalesce(1)
      .write.parquet(new java.io.File(dir, "s.parquet").toString)
    def watermarked() = {
      val stream = spark.readStream
        .schema("id STRING, time TIMESTAMP, value DOUBLE")
        .parquet(new java.io.File(dir, "s.parquet").toString)
      StreamParity.runToTable(spark,
        StreamOps.resampleRightClosedSum(stream, 900, watermarkDelay = "0 seconds"),
        "wm_race_out", org.apache.spark.sql.streaming.OutputMode.Append())
    }
    def unwatermarked() = {
      val stream = spark.readStream
        .schema("id STRING, time TIMESTAMP, value DOUBLE")
        .parquet(new java.io.File(dir, "s.parquet").toString)
      StreamParity.runToTable(spark,
        stream.groupBy(col("id")).agg(count(lit(1)).as("n")),
        "uw_race_out", org.apache.spark.sql.streaming.OutputMode.Complete())
    }
    val churn = new Thread(() => (1 to 4).foreach(_ => unwatermarked()))
    churn.setDaemon(true)
    churn.start()
    try {
      for (_ <- 1 to 2) {
        val got = watermarked().filter(col("id") === "a").collect()
        assert(got.length === 1,
          s"watermarked run lost its flushed window under concurrent starts: ${got.length}")
      }
    } finally churn.join(120000)
  }

  test("sessionizeStream: native session_window closes sessions past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF.toDF("id", "time", "value")
    // 10-min gap, 0-delay watermark so sessions close as event time advances
    val agg = StreamOps.sessionizeStream(stream, gapSeconds = 600,
      watermarkDelay = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(
        ("a", Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
        ("a", Timestamp.valueOf("2024-01-01 00:05:00"), 2.0)) // same session
      q.processAllAvailable()
      mem.addData(("a", Timestamp.valueOf("2024-01-01 01:00:00"), 4.0)) // new session; watermark passes the first
      q.processAllAvailable()
      mem.addData(("a", Timestamp.valueOf("2024-01-01 03:00:00"), 8.0)) // closes the second
      q.processAllAvailable()
      val got = spark.table("sessions").orderBy("session_start")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      assert(got.length >= 2)
      // first session: both points merged, end = last event + gap
      assert(got(0) === ("a", "2024-01-01 00:00:00.0", "2024-01-01 00:15:00.0", 2L, 3.0))
      assert(got(1) === ("a", "2024-01-01 01:00:00.0", "2024-01-01 01:10:00.0", 1L, 4.0))
    } finally q.stop()
  }

  test("fileSeriesStream picks up newly arriving parquet files per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("fstream").toString
    val first = Seq(("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0))
      .toDF("id", "time", "value")
    first.write.parquet(s"$dir/batch1.parquet")
    // the source dir is the parent; each arriving file is a new batch
    val stream = StreamOps.fileSeriesStream(spark, s"$dir/*.parquet")
    val q = stream.writeStream.format("memory").queryName("arrivals")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("arrivals").count() === 1)
      Seq(("b", Timestamp.valueOf("2024-01-01 00:10:00"), 2.0))
        .toDF("id", "time", "value").write.parquet(s"$dir/batch2.parquet")
      q.processAllAvailable()
      assert(spark.table("arrivals").count() === 2)
    } finally q.stop()
  }

  test("stream -> windowed resample -> foreachBatch upsert converges in the JDBC store") {
    import java.sql.DriverManager
    val url = "jdbc:derby:memory:streamdb;create=true"
    val c0 = DriverManager.getConnection(url)
    c0.createStatement().execute(
      "CREATE TABLE agg (id VARCHAR(16), time TIMESTAMP, value DOUBLE, PRIMARY KEY (id, time))")
    c0.close()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF.toDF("id", "time", "value")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = StreamOps.upsertSink(
      StreamOps.resampleRightClosedSum(stream, 900),
      url, "agg", Seq("id", "time"), Seq("value"),
      graft.io.JdbcUpsertSink.UpdateInsertDialect, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try {
      mem.addData(("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0))
      q.processAllAvailable()
      // late row lands in the SAME bucket → upsert overwrites with new sum
      mem.addData(("a", Timestamp.valueOf("2024-01-01 00:10:00"), 2.0))
      q.processAllAvailable()
      val c = DriverManager.getConnection(url)
      val rs = c.createStatement().executeQuery("SELECT id, time, value FROM agg")
      val rows = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), r.getTimestamp(2).toString, r.getDouble(3))).toList
      c.close()
      assert(rows === List(("a", "2024-01-01 00:15:00.0", 3.0)))
    } finally q.stop()
  }

  test("stream -> foreachBatch lake merge == batch merges; replayed batch converges") {
    import graft.io.LakeMerge
    implicit val sqlCtx = spark.sqlContext
    def lakeRows(dir: String): Seq[(String, String, String, Double)] =
      LakeMerge.readLake(spark, dir)
        .select("tms_id", "fgt", "time", "value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getDouble(3))).toSeq.sorted

    // identical initial lakes; one grows by BATCH merges, one by the
    // STREAMING sink fed the same rows (out-of-order dates included)
    val root = java.nio.file.Files.createTempDirectory("lakestream").toString
    val (batchDir, streamDir) = (s"$root/batch", s"$root/stream")
    val fgt = "2024-01-02 06:00:00"
    val init = LakeMerge.withPartDate(Seq(
      ("wl_a", fgt, "2024-01-01 00:00:00", 1.0),
      ("wl_a", fgt, "2024-01-02 00:00:00", 2.0))
      .toDF("tms_id", "fgt", "time", "value"))
    LakeMerge.writeLake(init, batchDir)
    LakeMerge.writeLake(init, streamDir)

    // batch 1: out-of-order (day 3 insert + day 1 correction); batch 2:
    // re-correction of day 1 + a new station
    val b1 = Seq(("wl_a", fgt, "2024-01-03 00:00:00", 9.0),
      ("wl_a", fgt, "2024-01-01 00:00:00", 1.5))
    val b2 = Seq(("wl_a", fgt, "2024-01-01 00:00:00", 1.75),
      ("wl_b", fgt, "2024-01-02 00:00:00", 7.0))
    for (b <- Seq(b1, b2))
      LakeMerge.merge(spark, batchDir, LakeMerge.withPartDate(
        b.toDF("tms_id", "fgt", "time", "value")))

    val mem = MemoryStream[(String, String, String, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("lakeckpt").toString
    val q = StreamOps.lakeMergeSink(
      mem.toDF.toDF("tms_id", "fgt", "time", "value"), streamDir, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      assert(lakeRows(streamDir) === lakeRows(batchDir),
        "stream-merged lake must equal the batch-merged lake")
      // at-least-once replay: the same batch delivered AGAIN (what a
      // restart-from-checkpoint re-delivery does) must change nothing —
      // exactly-once-by-key absorbs it
      val before = lakeRows(streamDir)
      mem.addData(b2: _*); q.processAllAvailable()
      assert(lakeRows(streamDir) === before,
        "a replayed batch must converge, not duplicate")
    } finally q.stop()
  }

  test("changesStream reads post-widening columns via the stored lake schema") {
    import graft.io.LakeMerge
    val root = java.nio.file.Files.createTempDirectory("cswiden").toString
    val lakeDir = s"$root/lake"
    val fgt = "2024-01-02 06:00:00"
    val keys = Seq("tms_id", "fgt", "time")
    def mk(rows: Seq[(String, String, String, Double)]) =
      LakeMerge.withPartDate(rows.toDF("tms_id", "fgt", "time", "value"))
    LakeMerge.writeLake(mk(Seq(("wl_a", fgt, "2024-01-01 00:00:00", 1.0))),
      lakeDir)
    // seq 0: pre-widening feed files (no `quality` column on disk)
    LakeMerge.merge(spark, lakeDir,
      mk(Seq(("wl_b", fgt, "2024-01-01 06:00:00", 2.0))), keys,
      captureChanges = true)
    // E178 widening, published as seq 1 — its feed files DO carry quality
    LakeMerge.merge(spark, lakeDir,
      mk(Seq(("wl_c", fgt, "2024-01-01 12:00:00", 3.0)))
        .withColumn("quality", lit(7)), keys,
      captureChanges = true, schemaEvolution = true)
    // a stream started NOW must see the widened column (review finding:
    // pinning the schema from the published feed made `quality` absent —
    // parquet schema probing could pick a pre-widening file)
    val stream = StreamOps.changesStream(spark, lakeDir)
    assert(stream.schema.fieldNames.contains("quality"),
      s"stored schema must be authoritative: ${stream.schema.treeString}")
    val q = stream.writeStream.format("memory").queryName("cs_widen")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("cs_widen")
      .select("seq", "tms_id", "quality", LakeMerge.ChangeTypeCol).collect()
    assert(rows.filter(_.getLong(0) == 0L).forall(_.isNullAt(2)),
      "pre-widening commits read the new column back NULL")
    val seq1Inserts = rows.filter(r =>
      r.getLong(0) == 1L && r.getString(3) == "insert")
    assert(seq1Inserts.nonEmpty && seq1Inserts.forall(_.getInt(2) == 7),
      "post-widening commits carry the new column's values")
  }

  test("changesStream -> feedMaintainSink: live IVM over the feed, effectively-once") {
    import graft.io.{FeedMaintain, LakeMerge}
    val root = java.nio.file.Files.createTempDirectory("feedstream").toString
    val (lakeDir, aggDir) = (s"$root/lake", s"$root/agg")
    val fgt = "2024-01-02 06:00:00"
    val keys = Seq("tms_id", "fgt", "time")
    val measures = Seq("v_sum" -> (col("value") * 100).cast("long"))
    def mkBatch(rows: Seq[(String, String, String, Double)]) =
      LakeMerge.withPartDate(rows.toDF("tms_id", "fgt", "time", "value"))
    LakeMerge.writeLake(mkBatch(Seq(
      ("wl_a", fgt, "2024-01-01 00:00:00", 1.0),
      ("wl_a", fgt, "2024-01-02 00:00:00", 2.0),
      ("wl_b", fgt, "2024-01-01 00:00:00", 3.0))), lakeDir)

    // seq 0 captured, THEN the aggregate seeded from the post-seq-0
    // snapshot (stamp 0) — the stream must skip 0 and fold 1..2
    LakeMerge.merge(spark, lakeDir, mkBatch(Seq(
      ("wl_a", fgt, "2024-01-01 00:00:00", 1.5),
      ("wl_c", fgt, "2024-01-02 00:00:00", 4.0))), keys,
      captureChanges = true)
    FeedMaintain.seedAggregate(LakeMerge.readLake(spark, lakeDir), aggDir,
      Seq("tms_id"), measures, asOfSeq = 0L)
    LakeMerge.merge(spark, lakeDir, mkBatch(Seq(
      ("wl_b", fgt, "2024-01-01 00:00:00", 3.25))), keys,
      captureChanges = true) // seq 1
    LakeMerge.delete(spark, lakeDir,
      Seq(("wl_a", fgt, "2024-01-02 00:00:00")).toDF("tms_id", "fgt", "time"),
      keys, captureChanges = true) // seq 2

    def direct() = FeedMaintain.snapshotAgg(
      LakeMerge.readLake(spark, lakeDir), Seq("tms_id"), measures)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    def stored() = FeedMaintain.readAggregate(spark, aggDir)
      .select("tms_id", "n_rows", "v_sum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

    val ckpt1 = java.nio.file.Files.createTempDirectory("feedckpt1").toString
    val q1 = StreamOps.feedMaintainSink(
      StreamOps.changesStream(spark, lakeDir), aggDir, Seq("tms_id"),
      measures, ckpt1,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(stored() === direct(),
      "the streamed fold must equal the direct recompute")
    assert(FeedMaintain.readAggregate(spark, aggDir)
      .agg(max(col("as_of_seq"))).head().getLong(0) === 2L)

    // FULL redelivery (fresh checkpoint replays every commit): the
    // as_of_seq watermark must absorb it — no double-count
    val ckpt2 = java.nio.file.Files.createTempDirectory("feedckpt2").toString
    val q2 = StreamOps.feedMaintainSink(
      StreamOps.changesStream(spark, lakeDir), aggDir, Seq("tms_id"),
      measures, ckpt2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(stored() === direct(),
      "a fully replayed feed must be absorbed by the seq watermark")

    // a LIVE commit while a consumer runs: picked up and folded
    val ckpt3 = java.nio.file.Files.createTempDirectory("feedckpt3").toString
    val q3 = StreamOps.feedMaintainSink(
      StreamOps.changesStream(spark, lakeDir), aggDir, Seq("tms_id"),
      measures, ckpt3,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try {
      LakeMerge.merge(spark, lakeDir, mkBatch(Seq(
        ("wl_d", fgt, "2024-01-01 00:00:00", 8.0))), keys,
        captureChanges = true) // seq 3
      q3.processAllAvailable()
    } finally q3.stop()
    assert(stored() === direct(),
      "a commit published while the consumer runs must fold in")
  }

  test("changesStream -> keeperMaintainSink: live keeper maintenance == recompute; replay folds once") {
    import graft.dedup.Dedup
    import graft.io.LakeMerge
    val root = java.nio.file.Files.createTempDirectory("keeperstream").toString
    val (lakeDir, stateDir) = (s"$root/lake", s"$root/keepers")
    val keys = Seq("doc_id")
    def docs(rows: Seq[(String, String, String)]) =
      LakeMerge.withPartDate(rows.toDF("doc_id", "time", "text"))
    LakeMerge.writeLake(docs(Seq(
      ("d1", "2024-01-01 00:00:00", "alpha"),
      ("d2", "2024-01-01 06:00:00", "alpha"),
      ("d3", "2024-01-02 00:00:00", "beta"))), lakeDir,
      seriesCol = "doc_id")

    // seq 0 captured, THEN the state seeded from the post-seq-0 snapshot
    LakeMerge.merge(spark, lakeDir, docs(Seq(
      ("d4", "2024-01-01 12:00:00", "alpha"),
      ("d3", "2024-01-02 00:00:00", "gamma"))), keys,
      seriesCol = "doc_id", captureChanges = true) // seq 0
    Dedup.seedKeeperState(LakeMerge.readLake(spark, lakeDir), stateDir,
      "doc_id", "text", asOfSeq = 0L)
    // seq 1: a SMALLER id joins the alpha group → new keeper candidate
    LakeMerge.merge(spark, lakeDir, docs(Seq(
      ("d0", "2024-01-01 18:00:00", "alpha"))), keys,
      seriesCol = "doc_id", captureChanges = true)
    // seq 2: the original alpha keeper d1 is PURGED → re-election path
    LakeMerge.delete(spark, lakeDir,
      Seq(("d1", "2024-01-01 00:00:00")).toDF("doc_id", "time"),
      keys, seriesCol = "doc_id", timeCol = "time", captureChanges = true)

    def recompute() = Dedup.keeperState(
      LakeMerge.readLake(spark, lakeDir), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).mkString("|")))
      .toSeq.sorted
    def stored() = Dedup.readKeeperState(spark, stateDir)
      .select("text_hash", "ids")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).mkString("|")))
      .toSeq.sorted

    val ckpt1 = java.nio.file.Files.createTempDirectory("keeperckpt1").toString
    val q1 = StreamOps.keeperMaintainSink(
      StreamOps.changesStream(spark, lakeDir), stateDir, "doc_id", "text",
      ckpt1,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(stored() === recompute(),
      "streamed keeper maintenance must equal the full recompute")
    assert(Dedup.readKeeperState(spark, stateDir)
      .agg(max(col("as_of_seq"))).head().getLong(0) === 2L)
    // the retraction actually re-elected: alpha's keeper is now d0
    val alphaKeeper = Dedup.keepersOf(
      Dedup.readKeeperState(spark, stateDir).drop("as_of_seq"))
      .filter(col("n_dups") >= 2).select("keeper_id")
      .collect().map(_.getString(0)).toSeq
    assert(alphaKeeper === Seq("d0"), s"$alphaKeeper")

    // RESTART mid-stream with a FRESH checkpoint: the full feed redelivers
    // and the as_of_seq watermark folds it exactly once (no drift)
    val ckpt2 = java.nio.file.Files.createTempDirectory("keeperckpt2").toString
    val q2 = StreamOps.keeperMaintainSink(
      StreamOps.changesStream(spark, lakeDir), stateDir, "doc_id", "text",
      ckpt2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(stored() === recompute(),
      "a fully replayed feed must fold exactly once (watermark absorbs)")

    // a LIVE commit while the consumer runs: picked up, folded, equal at
    // the new watermark — "maintained == recompute at every commit"
    val ckpt3 = java.nio.file.Files.createTempDirectory("keeperckpt3").toString
    val q3 = StreamOps.keeperMaintainSink(
      StreamOps.changesStream(spark, lakeDir), stateDir, "doc_id", "text",
      ckpt3,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try {
      LakeMerge.merge(spark, lakeDir, docs(Seq(
        ("d5", "2024-01-02 12:00:00", "beta"))), keys,
        seriesCol = "doc_id", captureChanges = true) // seq 3
      q3.processAllAvailable()
    } finally q3.stop()
    assert(stored() === recompute(),
      "a commit published while the consumer runs must fold in")
    assert(Dedup.readKeeperState(spark, stateDir)
      .agg(max(col("as_of_seq"))).head().getLong(0) === 3L)
  }

  test("runningSeriesStats: mapGroupsWithState folds state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF.toDF("id", "time", "value")
    val q = StatefulOps.runningSeriesStats(stream)
      .writeStream.format("memory").queryName("stats")
      .outputMode(StatefulOps.StatsOutputMode).start()
    try {
      mem.addData(
        ("a", Timestamp.valueOf("2024-01-01 00:05:00"), 3.0),
        ("a", Timestamp.valueOf("2024-01-01 00:10:00"), 1.0))
      q.processAllAvailable()
      mem.addData(("a", Timestamp.valueOf("2024-01-01 00:20:00"), 2.0)) // batch 2
      q.processAllAvailable()
      val last = spark.table("stats").filter($"id" === "a")
        .orderBy($"n".desc).collect().head
      assert(last.getAs[Long]("n") === 3L)          // state survived the batch boundary
      assert(last.getAs[Double]("maxValue") === 3.0)
      assert(last.getAs[Timestamp]("lastTime").toString === "2024-01-01 00:20:00.0")
    } finally q.stop()
  }

  test("dedupeStream suppresses duplicate (id, time) points within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF.toDF("id", "time", "value")
    val q = StatefulOps.dedupeStream(stream).writeStream
      .format("memory").queryName("deduped").outputMode("append").start()
    try {
      mem.addData(
        ("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0),
        ("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0)) // same-batch dup
      q.processAllAvailable()
      mem.addData(("a", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0)) // cross-batch dup
      q.processAllAvailable()
      assert(spark.table("deduped").count() === 1)
    } finally q.stop()
  }

  test("enrichForecast: horizon filter + sha256 tms_id derivation (F2+X14)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF.toDF("id", "time", "value")
    val out = StreamOps.enrichForecast(stream, "2024-01-01 12:00:00", "flo2d_250", "MME")
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(
        ("e1", Timestamp.valueOf("2024-01-01 11:59:59"), 1.0), // before cutoff → dropped
        ("e1", Timestamp.valueOf("2024-01-01 12:00:00"), 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Double]("value") === 2.0)
      assert(rows.head.getAs[String]("tms_id").matches("[0-9a-f]{64}"))
    } finally q.stop()
  }
}
