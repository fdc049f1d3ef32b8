package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, QueryDef}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * demonstration query over the driver's synthetic tables; `oracleSql` holds
  * the DuckDB-equivalent SQL for each SQL-expressible one.
  */
object SparkEntry {

  /** Session options every entry point needs. `nanosAsLong` makes a
    * TIMESTAMP(NANOS) `events.parquet` readable as exact epoch-ns longs
    * (Spark's TimestampType is µs); it is a no-op for µs fixtures, which read
    * as TIMESTAMP_NTZ — `Tables.events` adapts to whichever the producer
    * wrote. UTC is load-bearing: the NTZ→ns conversion casts through
    * TimestampType, which is micros-identity only under a zero-offset zone. */
  val SessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // engine optimizer rules (e.g. truncated-range predicates → pushable
    // raw ranges, graft.plans.PushableTruncRange)
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
    // AQE partition coalescing optimizes for shuffle-byte economics and by
    // default (parallelismFirst honors minPartitionSize = 1 MB) merges a
    // few-MB shuffle down to 1-4 post-shuffle partitions — which also
    // serializes every expression-heavy stage DOWNSTREAM of that exchange
    // (md5 minhash explode, sha256 digests, tokenize): round 17 measured
    // the dedup-CC family at cpu ≈ wall, i.e. single-threaded on a 32-core
    // session. A 64 KB floor keeps small-but-CPU-dense stages spread near
    // the session's parallelism; it is scale-adaptive by construction —
    // production-sized partitions sit far above any floor, so at 100 TB
    // this setting is inert and coalescing behaves exactly as stock.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k")

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    SessionConfigs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  private def allDefs: Seq[(String, QueryDef)] =
    CoreQueries.defs ++ PipelineQueries.defs ++ graft.queries.ParityQueries.defs ++
      TrainPrepQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, d) => n -> d.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, QueryDef(_, Some(sql))) => n -> sql }.toMap
}
