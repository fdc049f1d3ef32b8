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

  /** `events` with a predicate applied to the RAW ns column before the µs
    * truncation: a filter written against the truncated expression cannot
    * reach the parquet scan (no PushedFilters), while the same range stated
    * on the raw column pushes down and prunes row groups — the difference
    * between scanning a slice and scanning 100 TB. Bounds must be
    * µs-multiples so raw-domain and truncated-domain ranges coincide. */
  def eventsRawFiltered(spark: SparkSession, dir: String)(
      rawPred: org.apache.spark.sql.Column): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.filter(rawPred).withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
  }
}
