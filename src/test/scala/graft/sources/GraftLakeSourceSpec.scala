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

  // ---- write path (round 17, judge task 2) --------------------------------

  test("df.write append == LakeMerge.merge (rows, CDF seqs monotonic, commit recorded)") {
    val viaScala = freshLake("glsrc-w-scala")
    val viaWrite = freshLake("glsrc-w-fmt")
    val upd = batch(Seq("wl_a", "wl_z"), "2024-01-05 06:00:00", day2, (_, _) => 5.5)
    LakeMerge.merge(spark, viaScala, upd, keys, captureChanges = true)
    upd.write.format("graftlake").mode("append")
      .option("captureChanges", true).save(viaWrite)
    assert(rows(LakeMerge.readLake(spark, viaWrite)) ===
      rows(LakeMerge.readLake(spark, viaScala)),
      "format append must equal the Scala merge")
    // the OCC append RECORDS its commit; a second append's feed seq is
    // monotonic
    val commits = LakeTimeTravel.readCommits(spark, viaWrite)
    assert(commits.map(_.seq) === Seq(0L), s"$commits")
    assert(commits.head.op === "merge")
    batch(Seq("wl_y"), "2024-01-06 06:00:00", day3, (_, _) => 6.5)
      .write.format("graftlake").mode("append")
      .option("captureChanges", true).save(viaWrite)
    assert(LakeMerge.readChanges(spark, viaWrite).select("seq")
      .distinct().collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))
  }

  test("df.write bootstraps a missing lake; ErrorIfExists/Overwrite refuse; Ignore no-ops") {
    val root = java.nio.file.Files.createTempDirectory("glsrc-w-new").toString
    val dir = root + "/lake"
    val df = batch(Seq("wl_a"), fgt, day1, (_, _) => 1.0)
    df.write.format("graftlake").save(dir) // ErrorIfExists on MISSING → create
    assert(rows(spark.read.format("graftlake").load(dir)) === rows(df))
    val e1 = intercept[IllegalArgumentException] {
      df.write.format("graftlake").save(dir) // now it exists
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      df.write.format("graftlake").mode("overwrite").save(dir)
    }
    assert(e2.getMessage.contains("bypass the commit log"), e2.getMessage)
    val before = rows(LakeMerge.readLake(spark, dir))
    batch(Seq("wl_b"), fgt, day1, (_, _) => 2.0)
      .write.format("graftlake").mode("ignore").save(dir)
    assert(rows(LakeMerge.readLake(spark, dir)) === before,
      "Ignore on an existing lake must write nothing")
    // a batch MISSING part_date derives it from timeCol
    val noPart = Seq(("wl_c", fgt, day1.head, 3.0))
      .toDF("tms_id", "fgt", "time", "value")
    noPart.write.format("graftlake").mode("append").save(dir)
    assert(LakeMerge.readLake(spark, dir)
      .filter(col("tms_id") === "wl_c" && col("part_date") === "2024-01-01")
      .count() === 1L)
  }

  test("concurrent DISJOINT SQL appends both land (OCC, E182)") {
    val dir = freshLake("glsrc-w-occ")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def appendDay(ids: Seq[String], times: Seq[String], v: Double) = Future {
      batch(ids, "2024-01-07 06:00:00", times, (_, _) => v)
        .write.format("graftlake").mode("append")
        .option("captureChanges", true).save(dir)
    }
    // day-2-only and day-3-only writers — disjoint partitions
    val f1 = appendDay(Seq("occ_a"), day2, 21.0)
    val f2 = appendDay(Seq("occ_b"), day3, 31.0)
    Await.result(f1, 120.seconds); Await.result(f2, 120.seconds)
    val lake = LakeMerge.readLake(spark, dir)
    assert(lake.filter(col("tms_id") === "occ_a").count() === 2L)
    assert(lake.filter(col("tms_id") === "occ_b").count() === 1L)
    // both commits recorded, distinct monotonic seqs
    val seqs = LakeTimeTravel.readCommits(spark, dir).map(_.seq)
    assert(seqs === seqs.sorted && seqs.distinct === seqs && seqs.size === 2,
      s"$seqs")
  }

  test("SQL INSERT INTO routes through the OCC merge (commit log grows; OVERWRITE refuses)") {
    val dir = freshLake("glsrc-w-sql")
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_ins
      USING graftlake OPTIONS (path '$dir')""")
    val commitsBefore = LakeTimeTravel.readCommits(spark, dir).length
    // relation schema order: data columns then part_date last
    spark.sql("""INSERT INTO lake_ins
      VALUES ('ins_a', '2024-01-08 06:00:00', '2024-01-02 00:00:00', 88.0,
              '2024-01-02')""")
    assert(LakeMerge.readLake(spark, dir)
      .filter(col("tms_id") === "ins_a" && col("value") === 88.0)
      .count() === 1L, "INSERT INTO must land in the committed view")
    // the insert went through the MERGE, not a raw file write: the OCC
    // commit recorded itself, and no un-merged debris sits in the root
    val commits = LakeTimeTravel.readCommits(spark, dir)
    assert(commits.length === commitsBefore + 1 &&
      commits.last.op === "merge", s"$commits")
    val e = intercept[Exception] {
      spark.sql("""INSERT OVERWRITE TABLE lake_ins
        VALUES ('x', 'f', '2024-01-02 00:00:00', 1.0, '2024-01-02')""")
    }
    assert(e.getMessage.contains("bypass the commit log") ||
      e.getMessage.contains("INSERT OVERWRITE"), e.getMessage)
    spark.catalog.dropTempView("lake_ins")
  }

  test("raw file writes against a graftlake relation refuse loudly (guarded format)") {
    // the safety net for sessions built WITHOUT GraftExtensions: any plan
    // reaching InsertIntoHadoopFsRelationCommand hits prepareWrite first
    val e = intercept[UnsupportedOperationException] {
      new GraftLakeGuardedParquet().prepareWrite(spark, null, Map.empty,
        new org.apache.spark.sql.types.StructType())
    }
    assert(e.getMessage.contains("bypass the commit log"), e.getMessage)
  }

  test("history option: commit log as a table == readCommits; OCC refusal seqs queryable") {
    val dir = freshLake("glsrc-hist")
    LakeMerge.merge(spark, dir,
      batch(Seq("wl_a"), "2024-01-09 06:00:00", day2, (_, _) => 1.0),
      keys, retainHistory = true) // seq 0
    LakeMerge.delete(spark, dir,
      Seq(("wl_b", fgt, day3.head)).toDF("tms_id", "fgt", "time"),
      keys) // seq 1
    val hist = spark.read.format("graftlake").option("history", true)
      .load(dir).orderBy("seq").collect()
    val commits = LakeTimeTravel.readCommits(spark, dir)
    assert(hist.length === commits.length && commits.length === 2)
    hist.zip(commits).foreach { case (r, c) =>
      assert(r.getAs[Long]("seq") === c.seq)
      assert(r.getAs[String]("op") === c.op)
      assert(r.getAs[String]("writer") === c.mergeId)
      assert(r.getAs[Seq[String]]("partitions") === c.partitions)
      assert(r.getAs[Boolean]("retained") === c.retained)
    }
    assert(hist.last.getAs[String]("op") === "delete")
    // history is mutually exclusive with asOf/changesSince
    intercept[IllegalArgumentException] {
      spark.read.format("graftlake").option("history", true)
        .option("asOf", 0).load(dir)
    }
    // SQL surface
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_hist
      USING graftlake OPTIONS (path '$dir', history 'true')""")
    assert(spark.sql("SELECT max(seq) FROM lake_hist").head().getLong(0) === 1L)
    spark.catalog.dropTempView("lake_hist")
  }
}
