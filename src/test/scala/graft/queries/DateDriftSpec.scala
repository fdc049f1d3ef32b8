package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proactive twin of EventsFixtureSpec for the OTHER timestamp columns the
  * producer could plausibly re-type: `o_orderdate` / `l_shipdate` are dates
  * conceptually and today ship as TIMESTAMP(MICROS) — a regeneration could
  * flip them to parquet DATE. Every engine access pattern used by the
  * q_* battery (range filters against timestamp literals, date_format,
  * interval arithmetic, unix_micros via timestamp cast) must yield
  * identical results under both encodings, so a DATE drift degrades to a
  * FixtureSanity diagnosis instead of silent breakage. */
class DateDriftSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(asDate: Boolean): String = {
    val dir = Files.createTempDirectory(s"orders-${if (asDate) "date" else "ts"}").toFile
    dir.deleteOnExit()
    val base = Seq(
      (1L, "1995-01-15"), (2L, "1995-03-14"), (3L, "1995-03-15"),
      (4L, "1996-12-31"), (5L, "1994-01-01"))
      .toDF("o_orderkey", "d")
    val typed =
      if (asDate) base.withColumn("o_orderdate", col("d").cast("date"))
      else base.withColumn("o_orderdate", to_timestamp(col("d")).cast("timestamp_ntz"))
    typed.drop("d").coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir.getPath
  }

  private def battery(dir: String): Seq[Row] =
    Tables.t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("formatted"),
        date_format(col("o_orderdate") + expr("INTERVAL 5 HOURS 30 MINUTES"),
          "yyyy-MM-dd HH:mm:ss").as("sl_time"),
        (unix_micros(col("o_orderdate").cast("timestamp")) / lit(3.6e9)).as("epoch_h"))
      .orderBy("o_orderkey").collect().toSeq

  test("order-date access patterns agree under TIMESTAMP_NTZ and DATE encodings") {
    val ts = battery(fixture(asDate = false))
    val dt = battery(fixture(asDate = true))
    assert(ts == dt, s"\nntz : $ts\ndate: $dt")
    // the range filter kept exactly the strictly-before rows either way
    assert(ts.map(_.getLong(0)) == Seq(1L, 2L, 5L))
    assert(ts.head.getString(1) == "1995-01-15 00:00:00")
    assert(ts.head.getString(2) == "1995-01-15 05:30:00")
  }
}
