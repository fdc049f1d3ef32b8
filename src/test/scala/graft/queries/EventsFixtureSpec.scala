package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The round-9 lesson, pinned: the testdata producer switched `events.ts`
  * from TIMESTAMP(NANOS) (→ raw ns LONG under `nanosAsLong`) to
  * TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ) and the engine broke. This spec
  * materializes the SAME logical events under both precisions and asserts
  * the shared reader produces identical ns-domain frames — batch and
  * streaming — and that range predicates still reach PushedFilters under
  * the timestamp encoding.
  */
class EventsFixtureSpec extends SparkSpec {

  // 2024-01-01T00:00:00Z plus offsets; one value carries sub-µs ns bits so
  // the nanos fixture exercises the µs floor-truncation
  private val baseNs = 1704067200000000000L
  private val rows = Seq(
    (1L, baseNs + 1L, 7L, "a", 1.5, "{}"), // sub-µs bits → floors to baseNs
    (2L, baseNs + 123456000L, 7L, "b", 2.5, "{}"),
    (3L, baseNs + 3600000000000L, 8L, "a", 3.5, "{}"),
    (4L, baseNs + 7200000000000L + 999L, 8L, "b", 4.5, "{}"))

  /** Writes events.parquet carrying ts as raw INT64 epoch-ns — what a
    * TIMESTAMP(NANOS) fixture looks like to the engine under nanosAsLong. */
  private def nanosFixture(): String = {
    val dir = Files.createTempDirectory("graft-ev-nanos").toFile
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp")
    promote(dir); dir.getPath
  }

  /** Writes events.parquet carrying ts as TIMESTAMP_NTZ (µs) — the micros
    * fixture shape. Sub-µs bits are floored, as parquet micros would. */
  private def microsFixture(): String = {
    val dir = Files.createTempDirectory("graft-ev-micros").toFile
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // `div` (integral), NOT `/`: double division loses ns precision at 1.7e18
      .withColumn("ts", timestamp_micros(expr("ts div 1000"))
        .cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp")
    promote(dir); dir.getPath
  }

  /** Writes events.parquet carrying ts as tz-adjusted TIMESTAMP (µs,
    * isAdjustedToUTC=true) — the third encoding a producer could ship. */
  private def microsUtcFixture(): String = {
    val dir = Files.createTempDirectory("graft-ev-utc").toFile
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp")
    promote(dir); dir.getPath
  }

  /** The real fixtures are a single FILE per table; mirror that. */
  private def promote(dir: java.io.File): Unit = {
    val part = new java.io.File(s"$dir/tmp").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new java.io.File(s"$dir/events.parquet").toPath)
  }

  private def collectSorted(df: DataFrame): Seq[Row] =
    df.orderBy("event_id").collect().toSeq

  test("Tables.events yields identical ns-domain frames under all three fixture encodings") {
    val (nanos, micros, utc) = (nanosFixture(), microsFixture(), microsUtcFixture())
    val a = collectSorted(Tables.events(spark, nanos))
    val b = collectSorted(Tables.events(spark, micros))
    val c = collectSorted(Tables.events(spark, utc))
    assert(a == b)
    assert(a == c, "tz-adjusted TIMESTAMP encoding must normalize identically")
    // and the ns domain is the µs-floored one
    assert(a.head.getAs[Long]("ts") == baseNs)
    assert(a.last.getAs[Long]("ts") == baseNs + 7200000000000L)
    assert(Tables.events(spark, micros).schema("ts").dataType == LongType)
    // the tz-adjusted encoding also keeps native range predicates pushable
    val df = Tables.eventsRawFiltered(spark, utc)(
      _.betweenNs(baseNs, baseNs + 3600000000000L))
    assert(df.collect().map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L, 3L))
    val pushed = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"), pushed)
  }

  test("eventsRawFiltered range semantics agree across precisions (incl. boundary µs)") {
    val (nanos, micros) = (nanosFixture(), microsFixture())
    def run(dir: String): Seq[Row] = collectSorted(
      Tables.eventsRawFiltered(spark, dir)(_.betweenNs(baseNs, baseNs + 3600000000000L)))
    val a = run(nanos); val b = run(micros)
    assert(a == b)
    // row 1 floors INTO the range bottom; row 3 sits exactly on the top
    assert(a.map(_.getAs[Long]("event_id")) == Seq(1L, 2L, 3L))
    def geq(dir: String): Seq[Row] =
      collectSorted(Tables.eventsRawFiltered(spark, dir)(_.geqNs(baseNs + 7200000000000L)))
    assert(geq(nanos) == geq(micros))
    assert(geq(nanos).map(_.getAs[Long]("event_id")) == Seq(4L))
  }

  test("native range predicates reach PushedFilters under the timestamp fixture") {
    val micros = microsFixture()
    val df = Tables.eventsRawFiltered(spark, micros)(
      _.betweenNs(baseNs, baseNs + 3600000000000L))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThanOrEqual(ts"),
      s"ts range must push under the timestamp encoding:\n$plan")
  }

  test("PushableTruncRange makes DERIVED ns-domain filters pushable under timestamps") {
    val micros = microsFixture()
    val df = Tables.events(spark, micros)
      .filter(col("ts") >= baseNs + 3600000000000L && col("ts") <= baseNs + 7200000000000L)
    assert(df.collect().map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(3L, 4L))
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThanOrEqual(ts"),
      s"derived-filter range must be rewritten onto the native column:\n$plan")
  }

  test("streaming reads a DIRECTORY-shaped events.parquet too (no silent zero-row stream)") {
    // a producer re-shard can turn the single file into a directory of part
    // files; the leaf-name glob then matches nothing and a naive stream
    // yields zero rows without erroring — the round-9 failure class
    val dir = Files.createTempDirectory("graft-ev-dir").toFile
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.streaming.StreamParity.maxTimePerUser(spark, dir.getPath)
      .orderBy("user_id").collect().toSeq
    assert(out.map(_.getAs[Long]("n_events")) == Seq(2L, 2L),
      s"directory-shaped fixture must stream every row: $out")
  }

  test("streaming parity operators read both precisions identically") {
    val (nanos, micros) = (nanosFixture(), microsFixture())
    def resample(dir: String): Seq[Row] =
      graft.streaming.StreamParity.resampleComplete(spark, dir, 900)
        .orderBy("bucket_ns").collect().toSeq
    assert(resample(nanos) == resample(micros))
    def maxt(dir: String): Seq[Row] =
      graft.streaming.StreamParity.maxTimePerUser(spark, dir)
        .orderBy("user_id").collect().toSeq
    val a = maxt(nanos)
    assert(a == maxt(micros))
    assert(a.map(_.getAs[Long]("max_ts_ns")) == Seq(baseNs + 123456000L, baseNs + 7200000000000L))
  }
}
