package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change data feed on the lake merge (E172 — the Delta CDF shape):
  * `merge(captureChanges = true)` publishes `_changes/seq=N` carrying
  * exactly the pure [[LakeMerge.changeFeed]] of (pre-merge affected
  * partitions, batch); replaying insert + postimage rows onto the
  * pre-merge snapshot reproduces the post-merge lake; sequence numbers
  * are monotonic and `readChanges(since)` is incremental; publication is
  * part of the committed roll-forward work, so a crash between the
  * manifest and the publish rename never loses or duplicates a feed. */
class LakeCdfSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("tms_id", "fgt", "time")
  private val day1 = Seq("2024-01-01 00:00:00", "2024-01-01 12:00:00")
  private val day2 = Seq("2024-01-02 00:00:00", "2024-01-02 12:00:00")
  private val day3 = Seq("2024-01-03 00:00:00")

  private def batch(ids: Seq[String], fgt: String, times: Seq[String],
      v: (String, String) => Double): DataFrame =
    LakeMerge.withPartDate(
      ids.flatMap(id => times.map(t => (id, fgt, t, v(id, t))))
        .toDF("tms_id", "fgt", "time", "value"))

  private def sortedRows(df: DataFrame): Seq[(String, String, String, Double, String)] =
    df.select(col("tms_id"), col("fgt"), col("time"), col("value"),
        col(LakeMerge.ChangeTypeCol))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getString(4)))
      .toSeq.sorted

  private def lakeSorted(dir: String): Seq[(String, String, String, Double)] =
    LakeMerge.readLake(spark, dir)
      .select("tms_id", "fgt", "time", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSeq.sorted

  test("captured feed == pure changeFeed; replay reproduces the lake") {
    val base = java.nio.file.Files.createTempDirectory("lakecdf").toString
    val dirA = base + "/lakeA"
    val dirB = base + "/lakeB"
    val b1 = batch(Seq("wl_a", "wl_b"), "2024-01-02 06:00:00",
      day1 ++ day2, (id, t) => id.length + t.takeRight(8).take(2).toDouble)
    // corrections on day 2 + brand-new day 3 → both update and insert rows
    val b2 = batch(Seq("wl_a"), "2024-01-02 06:00:00", day2, (_, _) => 42.5)
      .unionByName(batch(Seq("wl_b"), "2024-01-03 06:00:00", day3, (_, _) => 99.0))
    LakeMerge.writeLake(b1, dirA)
    LakeMerge.writeLake(b1, dirB) // the pre-merge snapshot, kept aside

    LakeMerge.merge(spark, dirA, b2, keys, captureChanges = true)
    val feed = LakeMerge.readChanges(spark, dirA)
    assert(feed.select("seq").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(0L), "first captured merge must publish seq=0")

    // the published feed is exactly the pure function of (snapshot, batch)
    val pure = LakeMerge.changeFeed(
      Some(LakeMerge.readLake(spark, dirB)), b2, keys)
    assert(sortedRows(feed) === sortedRows(pure))
    val types = feed.groupBy(col(LakeMerge.ChangeTypeCol)).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(types === Map("update_preimage" -> 2L, "update_postimage" -> 2L,
      "insert" -> 1L), s"$types")

    // CDC soundness: replaying insert + postimage onto the snapshot as an
    // upsert reproduces the post-merge lake — a downstream incremental
    // consumer needs nothing but the feed
    val replay = feed
      .filter(col(LakeMerge.ChangeTypeCol).isin("insert", "update_postimage"))
      .drop(LakeMerge.ChangeTypeCol, "seq")
    LakeMerge.merge(spark, dirB, replay, keys)
    assert(lakeSorted(dirB) === lakeSorted(dirA))
  }

  test("seq is monotonic; non-capturing merges consume none; readChanges(since) prunes") {
    val dir = java.nio.file.Files.createTempDirectory("lakecdf2").toString + "/lake"
    val b1 = batch(Seq("wl_a"), "2024-01-02 06:00:00", day1 ++ day2, (_, _) => 1.0)
    LakeMerge.writeLake(b1, dir)

    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day2, (_, _) => 2.0),
      keys, captureChanges = true) // seq 0
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day2, (_, _) => 3.0),
      keys) // uncaptured — no seq
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_b"), "2024-01-03 06:00:00", day3, (_, _) => 4.0),
      keys, captureChanges = true) // seq 1

    val all = LakeMerge.readChanges(spark, dir)
    assert(all.select("seq").distinct().collect().map(_.getLong(0)).toSeq.sorted
      === Seq(0L, 1L))
    val inc = LakeMerge.readChanges(spark, dir, sinceSeq = 0L)
    assert(inc.select("seq").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(1L))
    assert(inc.count() === 1L, "seq 1 is one pure insert")
    assert(inc.head().getAs[String](LakeMerge.ChangeTypeCol) === "insert")
    // uncaptured merge's change (value 3.0) is in the lake but NOT the feed
    assert(LakeMerge.readChanges(spark, dir)
      .filter(col("value") === 3.0).count() === 0L)
  }

  test("crash before publication: committed feed visible, roll-forward publishes once") {
    val dir = java.nio.file.Files.createTempDirectory("lakecdf3").toString + "/lake"
    LakeMerge.writeLake(
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day1 ++ day2, (_, _) => 1.0), dir)
    val upd = batch(Seq("wl_a"), "2024-01-02 06:00:00", day2, (_, _) => 5.5)
    // crash at the FIRST swap: manifest (with change_seq) committed,
    // staged feed not yet published
    val e = intercept[IllegalStateException] {
      LakeMerge.mergeImpl(spark, dir, upd, keys, "part_date", "tms_id",
        "time", 4, true, crashAfterSwaps = 0, captureChanges = true)
    }
    assert(e.getMessage.contains("simulated crash"), e.getMessage)

    // the merge is committed — readChanges resolves the staged feed
    val pending = LakeMerge.readChanges(spark, dir)
    assert(pending.select("seq").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(0L))
    val pendingRows = sortedRows(pending)
    assert(pendingRows.count(_._5 == "update_postimage") === 2)
    // a consumer that already saw seq 0 polls again BEFORE any recovery:
    // an empty frame, exactly like a published lake — never the no-feed
    // refusal (review finding: it crashed the poll loop in the very
    // crash window the feed exists to survive)
    assert(LakeMerge.readChanges(spark, dir, sinceSeq = 0L).count() === 0L)

    // roll-forward publishes the feed exactly once, then cleans up
    assert(LakeMerge.recover(spark, dir))
    assert(sortedRows(LakeMerge.readChanges(spark, dir)) === pendingRows)
    assert(new java.io.File(s"$dir/_changes/seq=0").isDirectory)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".merge-staging-")), "staging cleaned")
    // and the lake itself holds the corrected values
    assert(LakeMerge.readLake(spark, dir)
      .filter(col("value") === 5.5).count() === 2L)
  }

  test("changeFeed with no current corpus is all inserts; readChanges on a feedless lake refuses") {
    val upd = batch(Seq("wl_a"), "2024-01-02 06:00:00", day1, (_, _) => 1.0)
    val feed = LakeMerge.changeFeed(None, upd, keys)
    assert(feed.count() === 2L)
    assert(feed.select(LakeMerge.ChangeTypeCol).distinct().head().getString(0)
      === "insert")

    val dir = java.nio.file.Files.createTempDirectory("lakecdf4").toString + "/lake"
    LakeMerge.writeLake(upd, dir)
    val e = intercept[IllegalArgumentException] {
      LakeMerge.readChanges(spark, dir)
    }
    assert(e.getMessage.contains("no change feed"), e.getMessage)
  }
}
