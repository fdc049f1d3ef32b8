package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{LakeMerge, LakeTimeTravel}

/** The `graftlake` registered data source: format reads must be
  * BIT-IDENTICAL to the Scala entry points they expose — live committed
  * view == readLake (including mid-swap crash windows), asOf ==
  * readLakeAsOf, changesSince == readChanges — and partition pruning must
  * reach the file index (an excluded partition's files are never listed
  * into the scan). */
class GraftLakeSourceSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("tms_id", "fgt", "time")
  private val fgt = "2024-01-02 06:00:00"
  private val day1 = Seq("2024-01-01 00:00:00", "2024-01-01 12:00:00")
  private val day2 = Seq("2024-01-02 00:00:00", "2024-01-02 12:00:00")
  private val day3 = Seq("2024-01-03 00:00:00")

  private def batch(ids: Seq[String], f: String, times: Seq[String],
      v: (String, String) => Double): DataFrame =
    LakeMerge.withPartDate(
      ids.flatMap(id => times.map(t => (id, f, t, v(id, t))))
        .toDF("tms_id", "fgt", "time", "value"))

  private def freshLake(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString + "/lake"
    LakeMerge.writeLake(
      batch(Seq("wl_a", "wl_b"), fgt, day1 ++ day2 ++ day3,
        (id, t) => id.length + t.takeRight(8).take(2).toDouble), dir)
    dir
  }

  private def rows(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(col): _*)
      .collect().map(_.mkString("|")).toSeq.sorted

  private def fmt(dir: String): org.apache.spark.sql.DataFrameReader =
    spark.read.format("graftlake")

  test("live format read == readLake (schema and rows)") {
    val dir = freshLake("glsrc-live")
    val viaFormat = spark.read.format("graftlake").load(dir)
    val viaFn = LakeMerge.readLake(spark, dir)
    assert(viaFormat.columns.sorted.toSeq === viaFn.columns.sorted.toSeq)
    assert(rows(viaFormat) === rows(viaFn))
    // the partition column reads back as STRING like readLake's
    assert(viaFormat.schema("part_date").dataType ===
      org.apache.spark.sql.types.StringType)
  }

  test("mid-swap crash window: format read serves the committed view") {
    val dir = freshLake("glsrc-crash")
    intercept[RuntimeException] {
      LakeMerge.mergeImpl(spark, dir,
        batch(Seq("wl_a"), "2024-01-03 06:00:00", day2 ++ day3, (_, _) => 77.0),
        keys, "part_date", "tms_id", "time", 4, requireUniqueKeys = true,
        crashAfterSwaps = 1)
    }
    // manifest pends, directories torn — both readers must resolve the
    // SAME committed (post-merge) view through the manifest
    assert(rows(spark.read.format("graftlake").load(dir)) ===
      rows(LakeMerge.readLake(spark, dir)),
      "format read must apply the committed-view resolution mid-swap")
    assert(spark.read.format("graftlake").load(dir)
      .filter(col("value") === 77.0).count() === 3L)
    LakeMerge.recover(spark, dir)
  }

  test("asOf format read == readLakeAsOf across history") {
    val dir = freshLake("glsrc-asof")
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), "2024-01-03 06:00:00", day2, (_, _) => 42.0),
      keys, retainHistory = true) // seq 0
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_c"), "2024-01-04 06:00:00", day3, (_, _) => 9.0),
      keys, retainHistory = true) // seq 1
    for (seq <- Seq(-1L, 0L, 1L)) {
      val viaFormat = spark.read.format("graftlake")
        .option("asOf", seq).load(dir)
      val viaFn = LakeTimeTravel.readLakeAsOf(spark, dir, seq)
      assert(rows(viaFormat) === rows(viaFn), s"asOf $seq diverged")
    }
  }

  test("changesSince format read == readChanges; refusals match") {
    val dir = freshLake("glsrc-cdf")
    // no feed yet: both refuse with the same diagnosis
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graftlake").option("changesSince", -1).load(dir)
    }
    assert(e1.getMessage.contains("no change feed"), e1.getMessage)
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), "2024-01-03 06:00:00", day2, (_, _) => 1.5),
      keys, captureChanges = true) // seq 0
    LakeMerge.delete(spark, dir,
      Seq(("wl_b", fgt, day3.head)).toDF("tms_id", "fgt", "time"),
      keys, captureChanges = true) // seq 1
    for (since <- Seq(-1L, 0L, 1L)) {
      val viaFormat = spark.read.format("graftlake")
        .option("changesSince", since).load(dir)
      val viaFn = LakeMerge.readChanges(spark, dir, since)
      assert(rows(viaFormat) === rows(viaFn), s"changesSince $since diverged")
    }
    assert(spark.read.format("graftlake").option("changesSince", -1)
      .load(dir).filter(col(LakeMerge.ChangeTypeCol) === "delete")
      .count() === 1L)
  }

  test("partition pruning reaches the file index: one partition's files only") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val dir = freshLake("glsrc-prune")
    val fs = LakeMerge.hadoopFs(spark, dir)
    def filesIn(v: String): Int =
      fs.listStatus(new Path(dir, s"part_date=$v"))
        .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val pruned = spark.read.format("graftlake").load(dir)
      .filter(col("part_date") === "2024-01-02")
    pruned.collect()
    val scans = flatten(pruned.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    assert(numFiles === filesIn("2024-01-02").toLong,
      s"pruned read must list only day-2 files, saw $numFiles of " +
        s"${filesIn("2024-01-01") + filesIn("2024-01-02") + filesIn("2024-01-03")}")
    // and parquet filter pushdown still works through the relation
    val plan = org.apache.spark.sql.GraftBridge.finalPlanString(
      spark.read.format("graftlake").load(dir)
        .filter(col("time") > "2024-01-01 06:00:00"))
    assert(plan.contains("PushedFilters: [IsNotNull(time), GreaterThan(time"),
      "data predicate must push into the parquet scan:\n" + plan.take(800))
  }

  test("SQL path: the format is usable from plain spark.sql via USING") {
    val dir = freshLake("glsrc-sql")
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_sql
      USING graftlake OPTIONS (path '$dir')""")
    val n = spark.sql(
      "SELECT count(*) AS n FROM lake_sql WHERE part_date = '2024-01-01'")
      .head().getLong(0)
    assert(n === LakeMerge.readLake(spark, dir)
      .filter(col("part_date") === "2024-01-01").count())
    // feedless lake: CREATE VIEW resolves the relation eagerly, so the
    // no-feed refusal fires right here with the readChanges diagnosis
    val e = intercept[Exception] {
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_changes_sql
        USING graftlake OPTIONS (path '$dir', changesSince '-1')""")
    }
    assert(e.getMessage.contains("no change feed"), e.getMessage)
    spark.catalog.dropTempView("lake_sql")
  }

  test("schema evolution: format read applies the stored schema (nulls backfill)") {
    val dir = freshLake("glsrc-evolve")
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), "2024-01-03 06:00:00", day2, (_, _) => 3.0)
        .withColumn("quality", lit(7)),
      keys, schemaEvolution = true)
    val viaFormat = spark.read.format("graftlake").load(dir)
    val viaFn = LakeMerge.readLake(spark, dir)
    assert(viaFormat.columns.contains("quality"))
    assert(rows(viaFormat) === rows(viaFn))
    // pre-widening partitions read the new column back NULL
    assert(viaFormat.filter(col("part_date") === "2024-01-01")
      .filter(col("quality").isNotNull).count() === 0L)
  }

  test("asOf and changesSince together refuse") {
    val dir = freshLake("glsrc-refuse")
    intercept[IllegalArgumentException] {
      spark.read.format("graftlake")
        .option("asOf", 0).option("changesSince", 0).load(dir)
    }
  }
}
