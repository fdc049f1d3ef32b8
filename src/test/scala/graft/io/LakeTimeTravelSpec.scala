package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time travel over the copy-on-write lake (E173): `retainHistory`
  * commits move pre-images to `_history/seq=N` and log themselves in
  * `_commits/`; `readLakeAsOf(seq)` reproduces every committed state
  * bit-exactly (created partitions excluded, pending mid-swap commits
  * resolved through the committed-view discipline), a broken pre-image
  * chain (non-retaining commit, vacuumed history) refuses loudly, and
  * `vacuum` bounds retention without touching newer snapshots. */
class LakeTimeTravelSpec extends SparkSpec {
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

  private def sorted(df: DataFrame): Seq[(String, String, String, Double)] =
    df.select("tms_id", "fgt", "time", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSeq.sorted

  private def lakeNow(dir: String) = sorted(LakeMerge.readLake(spark, dir))
  private def asOf(dir: String, seq: Long) =
    sorted(LakeTimeTravel.readLakeAsOf(spark, dir, seq))

  test("snapshots reproduce every committed state; created partitions excluded") {
    val dir = java.nio.file.Files.createTempDirectory("laketi").toString + "/lake"
    LakeMerge.writeLake(batch(Seq("wl_a", "wl_b"), "2024-01-02 06:00:00",
      day1 ++ day2, (_, _) => 1.0), dir)
    val sInit = lakeNow(dir)

    LakeMerge.merge(spark, dir, // seq 0: day-2 corrections
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day2, (_, _) => 2.0),
      keys, retainHistory = true)
    val s0 = lakeNow(dir)
    LakeMerge.merge(spark, dir, // seq 1: day 3 CREATED
      batch(Seq("wl_b"), "2024-01-03 06:00:00", day3, (_, _) => 3.0),
      keys, retainHistory = true)
    val s1 = lakeNow(dir)
    LakeMerge.merge(spark, dir, // seq 2: day-1 corrections
      batch(Seq("wl_b"), "2024-01-02 06:00:00", day1, (_, _) => 4.0),
      keys, retainHistory = true)
    val s2 = lakeNow(dir)

    assert(asOf(dir, -1L) === sInit, "-1 = before the first recorded commit")
    assert(asOf(dir, 0L) === s0)
    assert(asOf(dir, 1L) === s1)
    assert(asOf(dir, 2L) === s2)
    assert(asOf(dir, 0L).count(_._3.startsWith("2024-01-03")) === 0,
      "day 3 did not exist at seq 0")
    val log = LakeTimeTravel.readCommits(spark, dir)
    assert(log.map(_.seq) === Seq(0L, 1L, 2L))
    assert(log(1).created === Seq("2024-01-03"), s"${log(1)}")
    assert(log.forall(_.op == "merge") && log.forall(_.retained))
  }

  test("compaction with retention is snapshot-invariant; vacuum bounds it loudly") {
    val dir = java.nio.file.Files.createTempDirectory("laketi2").toString + "/lake"
    LakeMerge.writeLake(batch((0 until 8).map(i => s"wl_$i"),
      "2024-01-02 06:00:00", day1 ++ day2, (_, _) => 1.0), dir,
      filesPerPartition = 8)
    LakeMerge.merge(spark, dir, // seq 0
      batch(Seq("wl_0"), "2024-01-02 06:00:00", day2, (_, _) => 2.0),
      keys, retainHistory = true)
    val s0 = lakeNow(dir)
    val c = LakeMerge.compactPartitions(spark, dir, // seq 1
      targetFileBytes = 64L * 1024 * 1024, retainHistory = true)
    assert(c.partitionsCompacted > 0)
    assert(asOf(dir, 0L) === s0,
      "a pre-compact snapshot must read the retained pre-images")
    assert(asOf(dir, 1L) === s0, "compaction is physical only")
    val log = LakeTimeTravel.readCommits(spark, dir)
    assert(log.map(_.op) === Seq("merge", "compact"))

    // vacuum below seq 1: the pre-images merge 0 and compact 1 retained
    // for OLDER snapshots are gone; seq ≥ 1 still resolves
    assert(LakeTimeTravel.vacuum(spark, dir, oldestAsOf = 1L) > 0)
    val e = intercept[IllegalStateException] { asOf(dir, -1L) }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    val e0 = intercept[IllegalStateException] { asOf(dir, 0L) }
    assert(e0.getMessage.contains("vacuumed"), e0.getMessage)
    assert(asOf(dir, 1L) === s0)
    assert(LakeTimeTravel.readCommits(spark, dir).length === 2,
      "vacuum must never delete commit records")
    // the delete is irreversible, so its seq is range-checked like the
    // read's (review finding: a change-feed seq or timestamp passed here
    // would silently destroy every snapshot)
    val eRange = intercept[IllegalArgumentException] {
      LakeTimeTravel.vacuum(spark, dir, oldestAsOf = 99L)
    }
    assert(eRange.getMessage.contains("COMMIT range"), eRange.getMessage)
  }

  test("a non-retaining commit breaks only the snapshots that need its pre-image") {
    val dir = java.nio.file.Files.createTempDirectory("laketi3").toString + "/lake"
    LakeMerge.writeLake(batch(Seq("wl_a"), "2024-01-02 06:00:00",
      day1 ++ day2, (_, _) => 1.0), dir)
    LakeMerge.merge(spark, dir, // seq 0, retained
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day1, (_, _) => 2.0),
      keys, retainHistory = true)
    val s0 = lakeNow(dir)
    // the log exists → this commit RECORDS itself even without retention
    LakeMerge.merge(spark, dir, // seq 1, NOT retained, touches day 2
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day2, (_, _) => 3.0), keys)
    val s1 = lakeNow(dir)
    val log = LakeTimeTravel.readCommits(spark, dir)
    assert(log.map(_.retained) === Seq(true, false),
      "every commit after the first retained one must be recorded")
    assert(asOf(dir, 1L) === s1, "the latest snapshot never needs pre-images")
    val e = intercept[IllegalArgumentException] { asOf(dir, 0L) }
    assert(e.getMessage.contains("without retaining"), e.getMessage)
  }

  test("crash mid-swap: snapshots stay exact before and after roll-forward") {
    val dir = java.nio.file.Files.createTempDirectory("laketi4").toString + "/lake"
    LakeMerge.writeLake(batch(Seq("wl_a"), "2024-01-02 06:00:00",
      day1 ++ day2, (_, _) => 1.0), dir)
    LakeMerge.merge(spark, dir, // seq 0
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day1, (_, _) => 2.0),
      keys, retainHistory = true)
    val s0 = lakeNow(dir)
    // seq 1 touches BOTH days, crashes after one swap — one partition's
    // pre-image is in history, the other's still live with its staged
    // copy waiting
    val e = intercept[IllegalStateException] {
      LakeMerge.mergeImpl(spark, dir,
        batch(Seq("wl_a"), "2024-01-02 06:00:00", day1 ++ day2, (_, _) => 5.0),
        keys, "part_date", "tms_id", "time", 4, true, crashAfterSwaps = 1,
        retainHistory = true)
    }
    assert(e.getMessage.contains("simulated crash"), e.getMessage)
    val committed = lakeNow(dir) // committed view: all values 5.0
    assert(committed.forall(_._4 == 5.0), committed.toString)
    assert(asOf(dir, 0L) === s0,
      "mid-crash, the pre-crash snapshot must resolve exactly")
    assert(asOf(dir, 1L) === committed,
      "mid-crash, the pending commit's snapshot is the committed view")
    assert(LakeMerge.recover(spark, dir))
    assert(asOf(dir, 0L) === s0)
    assert(asOf(dir, 1L) === lakeNow(dir))
    assert(LakeTimeTravel.readCommits(spark, dir).map(_.seq) === Seq(0L, 1L),
      "roll-forward must append the pending commit's record")
  }

  test("the FIRST retained commit crashed mid-swap is already time-travelable") {
    // before recovery ever runs, _commits/ does not exist — the pending
    // manifest alone must carry the snapshot (review finding: the
    // no-commit-log refusal contradicted the works-while-pending contract)
    val dir = java.nio.file.Files.createTempDirectory("laketi6").toString + "/lake"
    LakeMerge.writeLake(batch(Seq("wl_a"), "2024-01-02 06:00:00",
      day1 ++ day2, (_, _) => 1.0), dir)
    val sInit = lakeNow(dir)
    val e = intercept[IllegalStateException] {
      LakeMerge.mergeImpl(spark, dir,
        batch(Seq("wl_a"), "2024-01-02 06:00:00", day1 ++ day2, (_, _) => 9.0),
        keys, "part_date", "tms_id", "time", 4, true, crashAfterSwaps = 1,
        retainHistory = true)
    }
    assert(e.getMessage.contains("simulated crash"), e.getMessage)
    assert(LakeTimeTravel.readCommits(spark, dir).isEmpty,
      "the record is roll-forward work — not yet appended")
    assert(asOf(dir, -1L) === sInit)
    assert(asOf(dir, 0L) === lakeNow(dir), "pending commit = committed view")
    assert(LakeMerge.recover(spark, dir))
    assert(asOf(dir, -1L) === sInit)
    assert(LakeTimeTravel.readCommits(spark, dir).map(_.seq) === Seq(0L))
  }

  test("guards: unlogged lake and out-of-range seq refuse") {
    val dir = java.nio.file.Files.createTempDirectory("laketi5").toString + "/lake"
    LakeMerge.writeLake(batch(Seq("wl_a"), "2024-01-02 06:00:00",
      day1, (_, _) => 1.0), dir)
    val e = intercept[IllegalArgumentException] {
      LakeTimeTravel.readLakeAsOf(spark, dir, 0L)
    }
    assert(e.getMessage.contains("no commit log"), e.getMessage)
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), "2024-01-02 06:00:00", day1, (_, _) => 2.0),
      keys, retainHistory = true)
    intercept[IllegalArgumentException] {
      LakeTimeTravel.readLakeAsOf(spark, dir, 7L)
    }
    intercept[IllegalArgumentException] {
      LakeTimeTravel.readLakeAsOf(spark, dir, -2L)
    }
  }
}
