package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew-mitigation operators: results must be identical to their unsalted
  * forms on skewed inputs (one key holding most rows). */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on key "hot"
  private lazy val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("key", "value")

  test("saltedSum equals plain groupBy sum on skewed data") {
    val plain = skewed.groupBy("key").agg(sum("value").as("sum_value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = TimeSeriesOps.saltedSum(skewed, Seq("key"), "value", saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin equals plain join on skewed data") {
    val dim = Seq(("hot", 10.0), ("k1", 1.0), ("k2", 2.0)).toDF("key", "factor")
    val plain = skewed.join(dim, Seq("key"))
      .agg(sum(col("value") * col("factor"))).head.getDouble(0)
    val salted = TimeSeriesOps.saltedJoin(skewed, dim, Seq("key"), saltFactor = 8)
      .agg(sum(col("value") * col("factor"))).head.getDouble(0)
    assert(salted === plain)
    // row multiplicity preserved, not just the aggregate
    assert(TimeSeriesOps.saltedJoin(skewed, dim, Seq("key"), 8).count() ===
      skewed.join(dim, Seq("key")).count())
  }
}
