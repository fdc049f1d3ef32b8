package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** S1 JDBC range scan: the single-connection overload's contract and the
  * partitioned overload for fat tables — same results, >1 input partition
  * (each partition a separate server-side stride query). */
class JdbcSeriesSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:seriesdb;create=true"

  private def seedSeries(table: String, n: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try { st.execute(s"DROP TABLE $table") } catch { case _: Exception => () }
      st.execute(s"CREATE TABLE $table (seq BIGINT, id VARCHAR(32), " +
        "time TIMESTAMP, value DOUBLE, PRIMARY KEY (seq))")
      st.close()
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?, ?)")
      for (i <- 0 until n) {
        ps.setLong(1, i.toLong)
        ps.setString(2, if (i % 2 == 0) "stn_a" else "stn_b")
        ps.setTimestamp(3, java.sql.Timestamp.valueOf(
          f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"))
        ps.setDouble(4, i * 0.5)
        ps.addBatch()
      }
      ps.executeBatch()
      ps.close()
    } finally conn.close()
  }

  test("partitioned overload reads the same slice over >1 input partition") {
    seedSeries("ts_part", 240)
    val single = Sources.jdbcSeries(spark, url, "ts_part",
      "stn_a", "2024-01-01 00:30:00", "2024-01-01 02:30:00")
    val parted = Sources.jdbcSeriesPartitioned(spark, url, "ts_part",
      "stn_a", "2024-01-01 00:30:00", "2024-01-01 02:30:00",
      partitionColumn = "seq", lowerBound = 0L, upperBound = 240L,
      numPartitions = 4)
    // the partitioned scan is genuinely parallel: one JDBC stride per task
    assert(single.rdd.getNumPartitions === 1)
    assert(parted.rdd.getNumPartitions === 4)
    val a = single.collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toSet
    val b = parted.collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toSet
    assert(a === b)
    assert(a.size === 61) // stn_a = even seq, window [30, 150] → 61 rows
  }
}
