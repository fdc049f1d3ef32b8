package graft.cli

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{IntegrityManifest, LakeMerge, LakeTimeTravel}

/** The lake-admin CLI (E177): every maintenance duty of the COW lake —
  * recover, compact, vacuum, keyed delete, commit log, snapshot export,
  * feed export, integrity root — reachable as one `--op`, each printing
  * the cron-log summary and riding the writers' own lease/manifest
  * machinery. */
class LakeAdminSpec extends SparkSpec {
  import spark.implicits._

  private val fgt = "2024-01-02 06:00:00"
  private val keys = Seq("tms_id", "fgt", "time")

  private def mkBatch(rows: Seq[(String, String, String, Double)]): DataFrame =
    LakeMerge.withPartDate(rows.toDF("tms_id", "fgt", "time", "value"))

  private def freshLake(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString + "/lake"
    LakeMerge.writeLake(mkBatch(Seq(
      ("wl_a", fgt, "2024-01-01 00:00:00", 1.0),
      ("wl_a", fgt, "2024-01-02 00:00:00", 2.0),
      ("wl_b", fgt, "2024-01-01 00:00:00", 3.0),
      ("wl_b", fgt, "2024-01-02 00:00:00", 4.0))), dir)
    dir
  }

  test("delete / log / snapshot / changes / vacuum round-trip through the CLI") {
    val dir = freshLake("lakeadmin")
    val root = java.nio.file.Files.createTempDirectory("lakeadmin-out").toString

    // a retained captured merge (seq 0) so log/snapshot/changes all exist
    LakeMerge.merge(spark, dir, mkBatch(Seq(
      ("wl_a", fgt, "2024-01-01 00:00:00", 1.5))), keys,
      captureChanges = true, retainHistory = true)

    // keyed purge via the CLI, keys arriving as a parquet file
    val keysPath = s"$root/purge.parquet"
    Seq(("wl_b", fgt, "2024-01-02 00:00:00")).toDF("tms_id", "fgt", "time")
      .write.parquet(keysPath)
    val del = LakeAdmin.run(spark, Map("op" -> "delete", "lake" -> dir,
      "keys" -> keysPath, "key-cols" -> "tms_id,fgt,time",
      "capture-changes" -> "true", "retain-history" -> "true"))
    assert(del("rows_deleted") === "1" && del("partitions_dropped") === "0")
    assert(LakeMerge.readLake(spark, dir).count() === 3L)

    // commit log: the retained merge + the delete
    val log = LakeAdmin.run(spark, Map("op" -> "log", "lake" -> dir))
    assert(log("commits") === "2")
    assert(LakeTimeTravel.readCommits(spark, dir).map(_.op) ===
      Seq("merge", "delete"))

    // snapshot as of seq 0: the purged row is still there
    val snapOut = s"$root/snap0"
    val snap = LakeAdmin.run(spark, Map("op" -> "snapshot", "lake" -> dir,
      "asof" -> "0", "out" -> snapOut))
    assert(snap("rows") === "4")
    assert(spark.read.parquet(snapOut)
      .filter(col("tms_id") === "wl_b").count() === 2L)

    // change feed export: seq 0 (pre+post) + seq 1 (delete)
    val feedOut = s"$root/feed"
    val feed = LakeAdmin.run(spark, Map("op" -> "changes", "lake" -> dir,
      "out" -> feedOut))
    assert(feed("rows") === "3")
    assert(spark.read.parquet(feedOut)
      .filter(col(LakeMerge.ChangeTypeCol) === "delete").count() === 1L)

    // vacuum commit 0's pre-image, then the snapshot refuses
    val vac = LakeAdmin.run(spark, Map("op" -> "vacuum", "lake" -> dir,
      "oldest-asof" -> "0"))
    assert(vac("history_dirs_removed").toInt >= 1)
    intercept[IllegalStateException] {
      LakeTimeTravel.readLakeAsOf(spark, dir, -1L).count()
    }

    // feed retention: drop the consumed seq-0 commit, keep seq 1; an
    // out-of-range seq (a commit-log seq, say) refuses loudly
    intercept[IllegalArgumentException] {
      LakeAdmin.run(spark, Map("op" -> "vacuum-changes", "lake" -> dir,
        "consumed-seq" -> "9"))
    }
    val fvac = LakeAdmin.run(spark, Map("op" -> "vacuum-changes",
      "lake" -> dir, "consumed-seq" -> "0"))
    assert(fvac("feed_commits_removed") === "1")
    assert(LakeMerge.readChanges(spark, dir).select("seq").distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(1L),
      "only the consumed commit may be dropped")

    // FULL retention: the newest commit is erasable too (a GDPR
    // delete's captured pre-images must not be pinned by the counter —
    // second-review finding); the _hwm marker keeps seq assignment
    // monotonic, and the fully-vacuumed feed refuses reads with the
    // vacuum diagnosis rather than the never-captured one
    val fvac2 = LakeAdmin.run(spark, Map("op" -> "vacuum-changes",
      "lake" -> dir, "consumed-seq" -> "1"))
    assert(fvac2("feed_commits_removed") === "1",
      "the newest commit must be erasable")
    val eFeed = intercept[IllegalArgumentException] {
      LakeMerge.readChanges(spark, dir)
    }
    assert(eFeed.getMessage.contains("vacuumed"), eFeed.getMessage)
    // idempotent cron re-run after FULL retention: the same consumed
    // seq must no-op via the _hwm marker (which proves the seq was once
    // published), not refuse as out-of-range (review finding)
    val fvac3 = LakeAdmin.run(spark, Map("op" -> "vacuum-changes",
      "lake" -> dir, "consumed-seq" -> "1"))
    assert(fvac3("feed_commits_removed") === "0",
      "re-vacuuming an already-vacuumed seq must be a no-op")
    LakeMerge.merge(spark, dir, LakeMerge.withPartDate(
      Seq(("wl_a", fgt, "2024-01-01 00:00:00", 2.25))
        .toDF("tms_id", "fgt", "time", "value")),
      keys, captureChanges = true)
    assert(LakeMerge.readChanges(spark, dir, sinceSeq = 1L)
      .select("seq").distinct().collect().map(_.getLong(0)).toSeq ===
      Seq(2L), "seq assignment must stay monotonic across full retention")
  }

  test("keeper-seed / keeper-fold: the dedup keeper state as admin ops") {
    val dir = freshLake("lakeadmin-keeper")
    val root = java.nio.file.Files.createTempDirectory("lakeadmin-kst").toString
    val st = s"$root/state"
    val seeded = LakeAdmin.run(spark, Map("op" -> "keeper-seed",
      "lake" -> dir, "state" -> st, "id-col" -> "tms_id",
      "text-col" -> "fgt"))
    assert(seeded("seeded") === "true" && seeded("digests").toLong > 0)
    // a captured commit folds in; the watermark advances
    LakeMerge.merge(spark, dir, LakeMerge.withPartDate(
      Seq(("wl_z", "2024-01-09 06:00:00", "2024-01-01 00:00:00", 5.0))
        .toDF("tms_id", "fgt", "time", "value")),
      keys, captureChanges = true)
    val folded = LakeAdmin.run(spark, Map("op" -> "keeper-fold",
      "lake" -> dir, "state" -> st, "id-col" -> "tms_id",
      "text-col" -> "fgt"))
    assert(folded("as_of_seq") === "0", folded.toString)
    assert(folded("digests").toLong === seeded("digests").toLong + 1,
      "the new fgt digest must join the state")
  }

  test("recover / compact / integrity ops; unknown op and missing args refuse") {
    val dir = freshLake("lakeadmin2")
    // healthy lake: recover is a clean no-op
    assert(LakeAdmin.run(spark, Map("op" -> "recover", "lake" -> dir))
      .apply("recovered") === "false")

    // fragment one partition, then compact via the CLI (checkpoint the
    // read so the rewrite does not overwrite its own input; drop the
    // restored partition column — the lake's files never carry it)
    val frag = LakeMerge.readLake(spark, dir)
      .filter(col("part_date") === "2024-01-01").drop("part_date")
      .localCheckpoint(true)
    frag.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/part_date=2024-01-01")
    frag.unpersist()
    val comp = LakeAdmin.run(spark, Map("op" -> "compact", "lake" -> dir,
      "target-file-mb" -> "128"))
    assert(comp("partitions_compacted").toInt >= 1)
    assert(comp("files_after").toLong < comp("files_before").toLong)

    // integrity: refuses before a maintained manifest exists, reports
    // root + as_of after one
    val e = intercept[IllegalArgumentException] {
      LakeAdmin.run(spark, Map("op" -> "integrity", "lake" -> dir))
    }
    assert(e.getMessage.contains("_integrity"), e.getMessage)
    val s = IntegrityManifest.mergeAndMaintain(spark, dir,
      mkBatch(Seq(("wl_c", fgt, "2024-01-01 00:00:00", 9.0))),
      idCol = "tms_id", textCol = "time", keyCols = keys,
      seriesCol = "tms_id", timeCol = "time", groups = 8)
    val integ = LakeAdmin.run(spark, Map("op" -> "integrity", "lake" -> dir))
    assert(integ("as_of") === s.mergeId)
    assert(integ("integrity_root").length === 64)

    // a CLI purge with --maintain-integrity refreshes the fingerprint
    // under the same lease: the stored manifest equals a full recompute
    // and its as_of names the delete
    val purgePath = java.nio.file.Files
      .createTempDirectory("lakeadmin-purge").toString + "/keys.parquet"
    Seq(("wl_c", fgt, "2024-01-01 00:00:00")).toDF("tms_id", "fgt", "time")
      .write.parquet(purgePath)
    val del = LakeAdmin.run(spark, Map("op" -> "delete", "lake" -> dir,
      "keys" -> purgePath, "key-cols" -> "tms_id,fgt,time",
      "maintain-integrity" -> "tms_id,time", "integrity-groups" -> "8"))
    assert(del("rows_deleted") === "1")
    val m = IntegrityManifest.readLakeManifest(spark, dir).get
    assert(m.select("as_of").distinct().head.getString(0) === del("delete_id"))
    val full = IntegrityManifest.manifest(
      graft.io.LakeMerge.readLake(spark, dir), "tms_id", "time", groups = 8)
    assert(IntegrityManifest.diff(m, full).isEmpty,
      "post-purge stored manifest must equal the full recompute")
    intercept[IllegalArgumentException] {
      LakeAdmin.run(spark, Map("op" -> "delete", "lake" -> dir,
        "keys" -> purgePath, "maintain-integrity" -> "tms_id"))
    }
    // routing-shape mismatch refuses: the stored manifest was built with
    // groups = 8, so a default-shape (256) maintenance would silently
    // corrupt the fingerprint if it were allowed through
    val eShape = intercept[IllegalArgumentException] {
      LakeAdmin.run(spark, Map("op" -> "delete", "lake" -> dir,
        "keys" -> purgePath, "key-cols" -> "tms_id,fgt,time",
        "maintain-integrity" -> "tms_id,time"))
    }
    assert(eShape.getMessage.contains("same shape"), eShape.getMessage)

    intercept[IllegalArgumentException] {
      LakeAdmin.run(spark, Map("op" -> "defrag", "lake" -> dir))
    }
    intercept[IllegalArgumentException] {
      LakeAdmin.run(spark, Map("op" -> "vacuum", "lake" -> dir))
    }
  }
}
