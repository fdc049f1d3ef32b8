package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/aliases MUST match between the two — the driver's compare
  * sorts columns by name before hashing.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  import org.apache.spark.sql.functions.{col, lit, pmod}

  /** All queries read the driver's synthetic parquet tables (TESTDATA.md). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` (epoch ns, read via nanosAsLong) floor-truncated to
    * microsecond precision: DuckDB's TIMESTAMP is µs, so its parquet reader
    * truncates TIMESTAMP(NANOS) — we mirror that so every derived value
    * (buckets, anchors, elapsed) agrees exactly with the oracle. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
  }
}
