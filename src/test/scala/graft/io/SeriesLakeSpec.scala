package graft.io

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed series-lake layout: joins and aggregations on the bucket key
  * run without any Exchange in the physical plan. */
class SeriesLakeSpec extends SparkSpec {
  // conf-mutating suite: isolated session (see TestSession.isolated)
  override lazy val spark: org.apache.spark.sql.SparkSession =
    graft.TestSession.isolated()
  import spark.implicits._

  private def series(seed: Int) = (0 until 100).map { i =>
    (s"id${i % 7}", Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"), (i * seed).toDouble)
  }.toDF("id", "time", "value")

  /** The in-memory catalog forgets managed tables across JVMs but their
    * warehouse directories persist — clear both before (re)creating. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  test("bucket-aligned join on id has no Exchange and correct results") {
    resetTable("lake_a"); resetTable("lake_b")
    SeriesLake.writeBucketed(series(1), "lake_a", nBuckets = 4)
    SeriesLake.writeBucketed(series(3).groupBy("id").agg(sum("value").as("total")),
      "lake_b", nBuckets = 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = SeriesLake.read(spark, "lake_a")
        .join(SeriesLake.read(spark, "lake_b"), Seq("id"))
      assert(SeriesLake.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)
      assert(joined.count() === 100)

      // groupBy on the bucket key also skips the shuffle
      val agg = SeriesLake.read(spark, "lake_a").groupBy("id").agg(sum("value"))
      assert(SeriesLake.isShuffleFree(agg))
      assert(agg.count() === 7)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketBy writes sorted buckets usable by per-series windows") {
    resetTable("lake_c")
    SeriesLake.writeBucketed(series(2), "lake_c", nBuckets = 2)
    val cum = graft.ops.TimeSeriesOps.cumulativeSum(
      SeriesLake.read(spark, "lake_c"), keys = Seq("id"))
    val rows = cum.filter(col("id") === "id0").orderBy("time")
      .select("cum").collect().map(_.getDouble(0))
    assert(rows.length === 15)
    assert(rows.toSeq === rows.sorted.toSeq) // nonneg values → monotone prefix sums
  }
}
