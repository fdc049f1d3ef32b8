package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** One verifiable operator demo: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/aliases MUST match between the two — the driver's compare
  * sorts columns by name before hashing.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  import org.apache.spark.sql.functions.{col, lit, pmod, unix_micros}

  /** All queries read the driver's synthetic parquet tables (TESTDATA.md). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Native dtype of `events.ts` for a fixture dir (one parquet footer read).
    * The fixtures have shipped BOTH precisions across rounds —
    * TIMESTAMP(NANOS), which Spark reads as raw epoch-ns LONG under
    * `nanosAsLong`, and TIMESTAMP(MICROS, adj=false), which Spark reads as
    * TIMESTAMP_NTZ — so the engine adapts to what the producer wrote instead
    * of assuming a precision. */
  def eventsTsType(spark: SparkSession, dir: String): DataType =
    t(spark, dir, "events").schema("ts").dataType

  /** ns-domain view of a native event-time column, at µs precision: DuckDB's
    * TIMESTAMP is µs, so pinning every derived value (buckets, anchors,
    * elapsed) to the µs grid keeps the oracle compare exact.
    *  - raw ns longs floor-truncate to the µs (`ts - pmod(ts, 1000)`);
    *  - µs timestamps scale exactly (`unix_micros * 1000` — no sub-µs bits
    *    exist to lose). The NTZ→TZ cast is micros-identity because the
    *    session timezone is pinned to UTC (SparkEntry.SessionConfigs).
    * `PushableTruncRange` recognizes BOTH shapes, so downstream ns-domain
    * range filters still reach PushedFilters on the native column. */
  def tsToNs(native: DataType, ts: Column): Column = native match {
    case LongType => ts - pmod(ts, lit(1000L))
    case TimestampNTZType | TimestampType =>
      unix_micros(ts.cast(TimestampType)) * lit(1000L)
    case other => throw new IllegalStateException(
      s"events.ts: unsupported type $other (expected ns LONG or TIMESTAMP[_NTZ]) — " +
        "fixture drift? run graft.FixtureSanity")
  }

  /** `events` with `ts` normalized to epoch-ns longs at µs precision,
    * whatever precision the fixture's producer chose. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.withColumn("ts", tsToNs(raw.schema("ts").dataType, col("ts")))
  }

  /** Builds range predicates against the NATIVE `ts` column — the form that
    * reaches the parquet scan's PushedFilters and prunes row groups, which at
    * 100 TB is the difference between scanning a slice and scanning the lake.
    * Bounds are epoch-ns and MUST be µs-multiples, so the raw-domain and
    * µs-truncated-domain ranges coincide under every fixture precision. */
  final class EventsTs private[queries] (val native: DataType) {
    private def usLit(ns: Long): Column = {
      require(ns % 1000L == 0, s"ts bound $ns ns is not a µs-multiple")
      val us = ns / 1000L
      val sec = Math.floorDiv(us, 1000000L)
      val nanoAdj = (Math.floorMod(us, 1000000L) * 1000L).toInt
      native match {
        case TimestampNTZType => // NTZ literal: pushable against an NTZ scan
          lit(java.time.LocalDateTime.ofEpochSecond(sec, nanoAdj, java.time.ZoneOffset.UTC))
        case _ =>
          lit(java.time.Instant.ofEpochSecond(sec, nanoAdj.toLong))
      }
    }
    /** µs-truncated `ts` within `[loNs, hiNs]` (both inclusive). */
    def betweenNs(loNs: Long, hiNs: Long): Column = native match {
      // +999 widens the raw-ns range to cover sub-µs bits of the top µs
      case LongType => col("ts").between(loNs, hiNs + 999L)
      case _ => col("ts").between(usLit(loNs), usLit(hiNs))
    }
    /** µs-truncated `ts >= ns`. */
    def geqNs(ns: Long): Column = native match {
      case LongType => col("ts") >= ns
      case _ => col("ts") >= usLit(ns)
    }
  }

  /** `events` filtered by a predicate built against the RAW native column
    * BEFORE the ns normalization: a filter written on the derived ns
    * expression depends on the optimizer rule to push, while a range stated
    * natively always reaches PushedFilters. */
  def eventsRawFiltered(spark: SparkSession, dir: String)(
      mk: EventsTs => Column): DataFrame = {
    val raw = t(spark, dir, "events")
    val native = raw.schema("ts").dataType
    raw.filter(mk(new EventsTs(native)))
      .withColumn("ts", tsToNs(native, col("ts")))
  }
}
