package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The trunc-range rule must (a) preserve results exactly and (b) make the
  * range reach the parquet scan's PushedFilters. */
class PushableTruncRangeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("truncrange").toString
    (0L until 10000L).map(i => (i, i * 777L)).toDF("id", "ts")
      .write.parquet(s"$d/t")
    d
  }

  private def truncated = {
    val raw = spark.read.parquet(s"$dir/t")
    raw.withColumn("tus", col("ts") - pmod(col("ts"), lit(1000L)))
  }

  test("rewritten plan pushes the raw range to the scan and keeps results identical") {
    PushableTruncRange.install(spark)
    val lo = 1000000L // multiples of the 1000 step
    val hi = 2000000L
    val q = truncated.filter(col("tus") >= lo && col("tus") <= hi).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts,1000000)") &&
      plan.contains("LessThanOrEqual(ts,2000999)"), plan)

    val expected = (0L until 10000L)
      .filter { i => val t = i * 777L - (i * 777L % 1000); t >= lo && t <= hi }
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === expected)
  }

  test("strict bounds and non-multiple literals are left alone but still correct") {
    PushableTruncRange.install(spark)
    // 1234567 is not a step multiple → no rewrite, plan still correct
    val q = truncated.filter(col("tus") > 1234000L && col("tus") < 2000000L).select("id")
    val expected = (0L until 10000L)
      .filter { i => val t = i * 777L - (i * 777L % 1000); t > 1234000L && t < 2000000L }
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === expected)
    // strict > with multiple bound: rewritten to ts >= lo + step
    val plan2 = truncated.filter(col("tus") > 1234000L).select("id")
      .queryExecution.executedPlan.toString
    assert(plan2.contains("GreaterThanOrEqual(ts,1235000)"), plan2)
  }
}
