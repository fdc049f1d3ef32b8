package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Small-file compaction over the parquet lake (E171 — the table-format
  * OPTIMIZE maintenance op): partitions whose data-file count exceeds the
  * ideal for the target file size are rewritten to exactly that ideal,
  * rows bit-identical (integrity-manifest root unchanged), untouched
  * partitions physically untouched, a second run selects nothing, and a
  * crash mid-swap heals through the merge's own manifest machinery. */
class LakeCompactSpec extends SparkSpec {
  import spark.implicits._

  private val stations = (0 until 12).map(i => f"wl_$i%02d")
  private val times = Seq("2024-01-01", "2024-01-02", "2024-01-03").flatMap(d =>
    Seq(s"$d 00:00:00", s"$d 06:00:00", s"$d 12:00:00", s"$d 18:00:00"))

  private def fullBatch: DataFrame =
    LakeMerge.withPartDate(
      stations.flatMap(id => times.map(t =>
        (id, "2024-01-03 06:00:00", t, id.length + t.takeRight(8).take(2).toDouble)))
        .toDF("tms_id", "fgt", "time", "value"))

  private def fragmentedLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("lakecompact").toString + "/lake"
    // 8 series-hashed writers over 12 stations → many small files per date
    LakeMerge.writeLake(fullBatch, dir, filesPerPartition = 8)
    dir
  }

  private def rowsSorted(dir: String): Seq[(String, String, String, Double)] =
    LakeMerge.readLake(spark, dir)
      .select("tms_id", "fgt", "time", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSeq.sorted

  /** Content fingerprint of the lake — compaction must not move it. */
  private def lakeRoot(dir: String): String =
    IntegrityManifest.root(IntegrityManifest.manifest(
      LakeMerge.readLake(spark, dir)
        .withColumn("__id", concat_ws("|", col("tms_id"), col("fgt"), col("time")))
        .withColumn("__text", col("value").cast("string")),
      "__id", "__text", groups = 16, subGroups = 4))

  private def dataFiles(dir: String, part: String): Seq[(String, Long)] = {
    val d = new java.io.File(s"$dir/part_date=$part")
    d.listFiles().filter { f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")
    }.map(f => (f.getName, f.lastModified)).toSeq.sorted
  }

  test("fragmented partitions compact to the ideal; content fingerprint unchanged") {
    val dir = fragmentedLake()
    val before = rowsSorted(dir)
    val rootBefore = lakeRoot(dir)
    assert(dataFiles(dir, "2024-01-01").length > 1, "fixture must be fragmented")

    // tiny rows, huge target → ideal is 1 file per partition
    val stats = LakeMerge.compactPartitions(spark, dir,
      targetFileBytes = 64L * 1024 * 1024)
    assert(stats.partitionsCompacted === 3 && stats.partitionsTotal === 3, s"$stats")
    assert(stats.filesAfter < stats.filesBefore, s"$stats")
    Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach { p =>
      assert(dataFiles(dir, p).length === 1,
        s"partition $p must compact to its ideal (1 file)")
    }
    assert(rowsSorted(dir) === before, "compaction must be physical only")
    assert(lakeRoot(dir) === rootBefore,
      "the integrity-manifest root must survive compaction bit-exactly")
  }

  test("idempotent: a second run selects zero and touches no files") {
    val dir = fragmentedLake()
    LakeMerge.compactPartitions(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    val files = Seq("2024-01-01", "2024-01-02", "2024-01-03").map(dataFiles(dir, _))
    val again = LakeMerge.compactPartitions(spark, dir,
      targetFileBytes = 64L * 1024 * 1024)
    assert(again.partitionsCompacted === 0, s"$again")
    assert(again.filesBefore === again.filesAfter, s"$again")
    assert(Seq("2024-01-01", "2024-01-02", "2024-01-03").map(dataFiles(dir, _))
      === files, "a no-op run must not rewrite or move any file")
  }

  test("maxPartitions bounds one run, worst offender first; the rest drain next run") {
    val dir = fragmentedLake()
    val before = rowsSorted(dir)
    val stats = LakeMerge.compactPartitions(spark, dir,
      targetFileBytes = 64L * 1024 * 1024, maxPartitions = 1)
    assert(stats.partitionsCompacted === 1 && stats.partitionsTotal === 3, s"$stats")
    val stats2 = LakeMerge.compactPartitions(spark, dir,
      targetFileBytes = 64L * 1024 * 1024, maxPartitions = 2)
    assert(stats2.partitionsCompacted === 2, s"backlog must drain: $stats2")
    val stats3 = LakeMerge.compactPartitions(spark, dir,
      targetFileBytes = 64L * 1024 * 1024)
    assert(stats3.partitionsCompacted === 0, s"drained: $stats3")
    assert(rowsSorted(dir) === before)
  }

  test("a crash between swaps heals: committed view torn-free, roll-forward completes") {
    val dir = fragmentedLake()
    val before = rowsSorted(dir)
    val rootBefore = lakeRoot(dir)
    val e = intercept[IllegalStateException] {
      LakeMerge.compactImpl(spark, dir, 64L * 1024 * 1024, "part_date",
        "tms_id", "time", Int.MaxValue, 15L * 60 * 1000, crashAfterSwaps = 1)
    }
    assert(e.getMessage.contains("simulated crash"), e.getMessage)
    // mid-crash: the manifest pends; readers assemble the committed view
    assert(rowsSorted(dir) === before,
      "a reader mid-crash must see the full committed content")
    assert(LakeMerge.recover(spark, dir), "roll-forward must run")
    assert(rowsSorted(dir) === before && lakeRoot(dir) === rootBefore)
    Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach { p =>
      assert(dataFiles(dir, p).length === 1,
        s"partition $p must be compacted after roll-forward")
    }
    assert(!LakeMerge.recover(spark, dir), "second recover must be a no-op")
  }

  test("guards: positive target, sane maxPartitions, missing lake") {
    val dir = fragmentedLake()
    intercept[IllegalArgumentException] {
      LakeMerge.compactPartitions(spark, dir, targetFileBytes = 0L)
    }
    intercept[IllegalArgumentException] {
      LakeMerge.compactPartitions(spark, dir, maxPartitions = 0)
    }
    intercept[IllegalArgumentException] {
      LakeMerge.compactPartitions(spark, dir + "/nope")
    }
  }
}
