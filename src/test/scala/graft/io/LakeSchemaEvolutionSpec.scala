package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution on the copy-on-write lake (E178): an evolution merge
  * widens the authoritative `_schema-vN.json` and every reader — plain,
  * committed-view, pruned, time-travel, compact — applies it
  * schema-on-read, so partitions written before the widening read back
  * null-filled with ZERO rewrite (the Delta/Iceberg mergeSchema posture
  * without the per-read footer-merge job). */
class LakeSchemaEvolutionSpec extends SparkSpec {
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
      ("wl_b", fgt, "2024-01-01 00:00:00", 3.0))), dir)
    dir
  }

  test("an evolution merge adds a column; old partitions read back null-filled unrewritten") {
    val dir = freshLake("lakeevo")
    val fs = LakeMerge.hadoopFs(spark, dir)
    def files(v: String) = fs.listStatus(new Path(dir, s"part_date=$v"))
      .toSeq.filter(_.isFile)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).sorted
    val day1Before = files("2024-01-01")

    // the batch carries a NEW column (qc flag) and touches only day 2
    val evolved = mkBatch(Seq(("wl_a", fgt, "2024-01-02 00:00:00", 2.5)))
      .withColumn("qc", lit("good"))
    val e = intercept[IllegalArgumentException] {
      LakeMerge.merge(spark, dir, evolved, keys)
    }
    assert(e.getMessage.contains("schemaEvolution"), e.getMessage)
    LakeMerge.merge(spark, dir, evolved, keys, schemaEvolution = true)

    val lake = LakeMerge.readLake(spark, dir)
    assert(lake.columns.contains("qc"))
    assert(lake.filter(col("qc") === "good").count() === 1L,
      "the evolved row must carry its new-column value")
    assert(lake.filter(col("qc").isNull).count() === 2L,
      "pre-widening rows must read back null")
    assert(files("2024-01-01") === day1Before,
      "evolution must not rewrite untouched partitions")

    // a second widening stacks (v1 over v0); updates missing an existing
    // column refuse even with evolution on
    intercept[IllegalArgumentException] {
      LakeMerge.merge(spark, dir,
        evolved.drop("value").withColumn("src", lit("x")), keys,
        schemaEvolution = true)
    }
    LakeMerge.merge(spark, dir,
      mkBatch(Seq(("wl_b", fgt, "2024-01-01 00:00:00", 3.5)))
        .withColumn("qc", lit("ok")).withColumn("src", lit("crawl2")),
      keys, schemaEvolution = true)
    val lake2 = LakeMerge.readLake(spark, dir)
    assert(lake2.columns.toSet.contains("src"))
    assert(lake2.filter(col("src").isNull).count() === 2L)
    // subsequent NON-evolution merges must now carry the full schema
    LakeMerge.merge(spark, dir,
      mkBatch(Seq(("wl_c", fgt, "2024-01-02 00:00:00", 9.0)))
        .withColumn("qc", lit(null: String)).withColumn("src", lit("late")),
      keys)
    assert(LakeMerge.readLake(spark, dir).count() === 4L)

    // a REFUSED evolution batch must not widen the schema: a duplicate
    // key aborts the merge pre-commit, and the phantom column must not
    // brick every existing non-evolution writer (review finding)
    val dup = mkBatch(Seq(
      ("wl_z", fgt, "2024-01-01 00:00:00", 1.0),
      ("wl_z", fgt, "2024-01-01 00:00:00", 2.0)))
      .withColumn("qc", lit("x")).withColumn("src", lit("x"))
      .withColumn("phantom", lit(1))
    val before = LakeMerge.schemaVersions(spark, dir)
    intercept[IllegalArgumentException] {
      LakeMerge.merge(spark, dir, dup, keys, schemaEvolution = true)
    }
    assert(LakeMerge.schemaVersions(spark, dir) === before,
      "a refused evolution batch must not widen the schema")
    assert(!LakeMerge.readLake(spark, dir).columns.contains("phantom"))

    // the widening audit trail + the admin surface
    assert(LakeMerge.schemaVersions(spark, dir) === Seq(0L, 1L))
    val adm = graft.cli.LakeAdmin.run(spark,
      Map("op" -> "schema", "lake" -> dir))
    assert(adm("evolved") === "true" && adm("schema_versions") === "2")
    assert(adm("columns").contains("qc:string") &&
      adm("columns").contains("src:string"))
  }

  test("delete, compact and the committed view work across mixed-vintage partitions") {
    val dir = freshLake("lakeevo2")
    LakeMerge.merge(spark, dir,
      mkBatch(Seq(("wl_a", fgt, "2024-01-02 00:00:00", 2.5)))
        .withColumn("qc", lit("good")),
      keys, schemaEvolution = true)

    // keyed delete whose scan path reads BOTH vintages (day 1 never
    // rewritten since the widening)
    val s = LakeMerge.delete(spark, dir,
      Seq(("wl_b", fgt, "2024-01-01 00:00:00")).toDF("tms_id", "fgt", "time"),
      keys)
    assert(s.rowsDeleted === 1L)
    assert(LakeMerge.readLake(spark, dir).filter(col("qc").isNull).count() === 1L)

    // compact UPGRADES a pre-widening partition's files to the current
    // schema: after the rewrite the files themselves carry qc
    val frag = LakeMerge.readLake(spark, dir)
      .filter(col("part_date") === "2024-01-01")
      .drop("part_date", "qc").localCheckpoint(true)
    frag.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/part_date=2024-01-01")
    frag.unpersist()
    LakeMerge.compactPartitions(spark, dir,
      targetFileBytes = 128L * 1024 * 1024)
    val day1Files = spark.read
      .parquet(s"$dir/part_date=2024-01-01")
    assert(day1Files.columns.contains("qc"),
      "compaction must upgrade rewritten files to the stored schema")
    assert(LakeMerge.readLake(spark, dir).count() === 2L)

    // crash mid-swap AFTER a widening: the pending committed view is
    // whole-schema and torn-free
    val evolved2 = mkBatch(Seq(
      ("wl_a", fgt, "2024-01-01 00:00:00", 7.0),
      ("wl_a", fgt, "2024-01-02 00:00:00", 8.0)))
      .withColumn("qc", lit("v2")).withColumn("rev", lit(2L))
    intercept[IllegalStateException] {
      LakeMerge.mergeImpl(spark, dir, evolved2, keys, "part_date",
        "tms_id", "time", 4, requireUniqueKeys = true, crashAfterSwaps = 1,
        schemaEvolution = true)
    }
    LakeMerge.hadoopFs(spark, dir)
      .delete(new Path(dir, "_merge_lease"), false)
    val pending = LakeMerge.readLake(spark, dir)
    assert(pending.columns.contains("rev"))
    assert(pending.filter(col("rev") === 2L).count() === 2L,
      "the committed view must show the evolved merge whole")
    assert(LakeMerge.recover(spark, dir))
    assert(LakeMerge.readLake(spark, dir)
      .filter(col("rev") === 2L).count() === 2L)
  }
}
