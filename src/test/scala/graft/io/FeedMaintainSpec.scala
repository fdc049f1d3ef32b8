package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental aggregate maintenance from the change feed (E175):
  * folding a feed sequence into a snapshot-0 additive aggregate equals
  * the direct recompute over the final snapshot — exactly, for integer
  * measures — including through deletes, group extinction, and
  * commit-at-a-time vs all-at-once folding. */
class FeedMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("tms_id", "fgt", "time")
  private val measures = Seq("v_sum" -> (col("value") * 100).cast("long"))

  private def batch(ids: Seq[String], fgt: String, times: Seq[String],
      v: (String, String) => Double): DataFrame =
    LakeMerge.withPartDate(
      ids.flatMap(id => times.map(t => (id, fgt, t, v(id, t))))
        .toDF("tms_id", "fgt", "time", "value"))

  private def aggRows(df: DataFrame): Seq[(String, Long, Long)] =
    df.select("tms_id", "n_rows", "v_sum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  private val fgt = "2024-01-03 06:00:00"
  private val day1 = Seq("2024-01-01 00:00:00", "2024-01-01 12:00:00")
  private val day2 = Seq("2024-01-02 00:00:00", "2024-01-02 12:00:00")

  test("maintained through a lake's published merge+delete feed == direct recompute") {
    val dir = java.nio.file.Files.createTempDirectory("feedmaint").toString + "/lake"
    val b0 = batch(Seq("wl_a", "wl_b", "wl_c"), fgt, day1 ++ day2,
      (id, t) => id.length + t.takeRight(8).take(2).toDouble)
    LakeMerge.writeLake(b0, dir)
    val agg0 = FeedMaintain.snapshotAgg(
      LakeMerge.readLake(spark, dir), Seq("tms_id"), measures)
      .localCheckpoint(true)

    // commit 0: a re-crawl merge (updates day-2 values, adds a day-2 row)
    val b1 = batch(Seq("wl_a", "wl_b"), fgt, day2, (_, _) => 42.5)
      .unionByName(batch(Seq("wl_d"), fgt, day2.take(1), (_, _) => 7.0))
    LakeMerge.merge(spark, dir, b1, keys, captureChanges = true)
    // commit 1: a purge (all of wl_c, one wl_a row)
    val purge = day1.map(t => ("wl_c", fgt, t)).toDF("tms_id", "fgt", "time")
      .unionByName(day2.map(t => ("wl_c", fgt, t)).toDF("tms_id", "fgt", "time"))
      .unionByName(Seq(("wl_a", fgt, day1.head)).toDF("tms_id", "fgt", "time"))
    LakeMerge.delete(spark, dir, purge, keys, captureChanges = true)

    val direct = aggRows(FeedMaintain.snapshotAgg(
      LakeMerge.readLake(spark, dir), Seq("tms_id"), measures))

    // all commits folded at once
    val allChanges = LakeMerge.readChanges(spark, dir)
    assert(aggRows(FeedMaintain.maintain(agg0, allChanges,
      Seq("tms_id"), measures)) === direct)

    // commit-at-a-time folding agrees (the fold is associative)
    val step1 = FeedMaintain.maintain(agg0,
      allChanges.filter(col("seq") === 0), Seq("tms_id"), measures)
    val step2 = FeedMaintain.maintain(step1,
      allChanges.filter(col("seq") === 1), Seq("tms_id"), measures)
    assert(aggRows(step2) === direct)

    // group extinction: wl_c retracted to zero rows must be ABSENT, not
    // a zero row (the direct recompute never emits it)
    assert(!direct.exists(_._1 == "wl_c"))
    agg0.unpersist()
  }

  test("keeper maintenance: retraction RE-ELECTS; maintained == recompute; stored twin effectively-once") {
    import graft.dedup.Dedup
    val dir = java.nio.file.Files.createTempDirectory("keepermaint").toString + "/lake"
    // documents-shaped lake: doc 1 and doc 2 share a text (keeper = 1),
    // docs 3..5 distinct; the delete kills doc 1 (THE KEEPER) and doc 4
    // (a singleton digest, which must vanish)
    val docs = Seq(
      (1L, "2024-01-01 00:00:00", "shared text"),
      (2L, "2024-01-01 01:00:00", "shared text"),
      (3L, "2024-01-01 02:00:00", "solo three"),
      (4L, "2024-01-02 00:00:00", "solo four"),
      (5L, "2024-01-02 01:00:00", "solo five")).toDF("doc_id", "time", "text")
    val dKeys = Seq("doc_id")
    LakeMerge.writeLake(LakeMerge.withPartDate(docs), dir,
      seriesCol = "doc_id")
    val stateDir = java.nio.file.Files
      .createTempDirectory("keeperstate").toString + "/state"
    Dedup.seedKeeperState(LakeMerge.readLake(spark, dir), stateDir,
      "doc_id", "text", asOfSeq = -1L)

    // commit 0: doc 5 rewrites onto the shared digest (insert-side move),
    // doc 6 arrives as a brand-new duplicate of "solo three"
    val b1 = LakeMerge.withPartDate(Seq(
      (5L, "2024-01-02 01:00:00", "shared text"),
      (6L, "2024-01-02 02:00:00", "solo three")).toDF("doc_id", "time", "text"))
    LakeMerge.merge(spark, dir, b1, dKeys, seriesCol = "doc_id",
      captureChanges = true)
    // commit 1: DELETE the shared digest's keeper (doc 1) and doc 4
    LakeMerge.delete(spark, dir,
      Seq((1L), (4L)).toDF("doc_id"), dKeys, seriesCol = "doc_id",
      captureChanges = true)

    Dedup.foldKeeperStateInto(LakeMerge.readChanges(spark, dir), stateDir,
      "doc_id", "text")
    def keeperRows(df: DataFrame) =
      df.select("text_hash", "keeper_id", "n_dups").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val maintained = keeperRows(
      Dedup.keepersOf(Dedup.readKeeperState(spark, stateDir)))
    val recomputed = keeperRows(
      Dedup.exact(LakeMerge.readLake(spark, dir), "doc_id", "text"))
    assert(maintained === recomputed,
      "maintained keepers must equal the full recompute")
    // the re-election itself: "shared text" (now members {2, 5}) lost
    // keeper 1 and must re-elect doc 2 — the MIN of the remaining
    // members, not the newest arrival (5); nothing is keepered by the
    // retracted doc 1, and "solo four"'s digest vanished with its only row
    assert(maintained.exists(r => r._2 == 2L && r._3 == 2L),
      s"shared digest must re-elect keeper 2: $maintained")
    assert(!maintained.exists(_._2 == 1L),
      s"the deleted keeper must not survive: $maintained")
    assert(maintained.map(_._3) === Seq(2L, 2L),
      s"exactly two digests remain, both pairs: $maintained")

    // effectively-once: re-delivering the whole feed is a no-op
    Dedup.foldKeeperStateInto(LakeMerge.readChanges(spark, dir), stateDir,
      "doc_id", "text")
    assert(keeperRows(Dedup.keepersOf(
      Dedup.readKeeperState(spark, stateDir))) === maintained)
  }

  test("foldInto refuses a feed gap instead of folding past it") {
    val root = java.nio.file.Files.createTempDirectory("feedgap").toString
    val (dir, aggDir) = (s"$root/lake", s"$root/agg")
    LakeMerge.writeLake(batch(Seq("wl_a", "wl_b"), fgt, day1,
      (id, t) => id.length + t.takeRight(8).take(2).toDouble), dir)
    // the consumer seeds from the post-seq-0 snapshot, THEN two more
    // commits land (the honest seedAggregate contract: snapshot and
    // stamp observed together)
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), fgt, day2.take(1), (_, _) => 10.0),
      keys, captureChanges = true)
    FeedMaintain.seedAggregate(LakeMerge.readLake(spark, dir), aggDir,
      Seq("tms_id"), measures, asOfSeq = 0L)
    for (v <- Seq(11.0, 12.0))
      LakeMerge.merge(spark, dir,
        batch(Seq("wl_a"), fgt, day2.take(1), (_, _) => v),
        keys, captureChanges = true)
    // ...but commit 1 was vacuumed past this consumer's watermark
    LakeMerge.hadoopFs(spark, dir).delete(
      new org.apache.hadoop.fs.Path(dir, "_changes/seq=1"), true)
    val e = intercept[IllegalArgumentException] {
      FeedMaintain.foldInto(LakeMerge.readChanges(spark, dir), aggDir,
        Seq("tms_id"), measures)
    }
    assert(e.getMessage.contains("gap"), e.getMessage)
    // the watermark must not have advanced — the aggregate is untouched
    assert(FeedMaintain.readAggregate(spark, aggDir)
      .agg(max(col("as_of_seq"))).head().getLong(0) === 0L)
  }

  test("pure-feed maintenance equals direct recompute; unknown change type refuses") {
    val cur = batch(Seq("wl_a", "wl_b"), fgt, day1 ++ day2,
      (id, t) => id.length + t.takeRight(8).take(2).toDouble)
    val upd = batch(Seq("wl_a", "wl_x"), fgt, day2, (_, _) => 3.25)
    val post = cur.join(upd, keys, "left_anti").unionByName(upd)
    val maintained = FeedMaintain.maintain(
      FeedMaintain.snapshotAgg(cur, Seq("tms_id"), measures),
      LakeMerge.changeFeed(Some(cur), upd, keys), Seq("tms_id"), measures)
    assert(aggRows(maintained) ===
      aggRows(FeedMaintain.snapshotAgg(post, Seq("tms_id"), measures)))

    val bogus = cur.withColumn(LakeMerge.ChangeTypeCol, lit("upsert"))
    val e = intercept[Exception] {
      FeedMaintain.maintain(
        FeedMaintain.snapshotAgg(cur, Seq("tms_id"), measures),
        bogus, Seq("tms_id"), measures).collect()
    }
    assert(e.getMessage.contains("unknown change type") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown change type")),
      s"unknown change type must refuse loudly: $e")

    // a malformed aggregate (missing the measure column) refuses at entry
    val e2 = intercept[IllegalArgumentException] {
      FeedMaintain.maintain(cur, bogus, Seq("tms_id"), measures)
    }
    assert(e2.getMessage.contains("snapshotAgg"), e2.getMessage)
  }
}
