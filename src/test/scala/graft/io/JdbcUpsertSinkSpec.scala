package graft.io

import java.sql.DriverManager

import graft.SparkSpec

/** K2 upsert sink against embedded Derby (ANSI MERGE dialect): insert, then
  * re-apply with changed values — the key contract of the reference's
  * `insert_data(upsert=True)` (reference: output/extract_water_level.py:216)
  * is converge-by-key, which also makes Spark task retries exactly-once. */
class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:upsertdb;create=true"

  private def withTable[A](ddl: String, table: String)(f: => A): A = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try { st.execute(s"DROP TABLE $table") } catch { case _: Exception => () }
      st.execute(ddl)
      st.close()
    } finally conn.close()
    f
  }

  private def readAll(table: String): Seq[(String, String, Double)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT tms_id, t, v FROM $table ORDER BY tms_id, t")
      val buf = scala.collection.mutable.ListBuffer.empty[(String, String, Double)]
      while (rs.next()) buf += ((rs.getString(1), rs.getString(2), rs.getDouble(3)))
      buf.toList
    } finally conn.close()
  }

  test("upsert inserts new keys and updates existing ones; re-apply is idempotent") {
    withTable(
      "CREATE TABLE series (tms_id VARCHAR(64), t VARCHAR(19), v DOUBLE, PRIMARY KEY (tms_id, t))",
      "series") {
      val v1 = Seq(
        ("id1", "2024-01-01 00:00:00", 1.0),
        ("id1", "2024-01-01 00:05:00", 2.0),
        ("id2", "2024-01-01 00:00:00", 3.0)
      ).toDF("tms_id", "t", "v")
      JdbcUpsertSink.upsert(v1, url, "series", Seq("tms_id", "t"), Seq("v"),
        JdbcUpsertSink.UpdateInsertDialect, batchSize = 2)
      assert(readAll("series") === Seq(
        ("id1", "2024-01-01 00:00:00", 1.0),
        ("id1", "2024-01-01 00:05:00", 2.0),
        ("id2", "2024-01-01 00:00:00", 3.0)))

      // overlapping re-run: one update, one insert (reference's cron overlap)
      val v2 = Seq(
        ("id1", "2024-01-01 00:05:00", 9.5), // update
        ("id2", "2024-01-01 00:05:00", 4.0)  // insert
      ).toDF("tms_id", "t", "v")
      JdbcUpsertSink.upsert(v2, url, "series", Seq("tms_id", "t"), Seq("v"),
        JdbcUpsertSink.UpdateInsertDialect)
      // idempotency: applying the same batch again changes nothing
      JdbcUpsertSink.upsert(v2, url, "series", Seq("tms_id", "t"), Seq("v"),
        JdbcUpsertSink.UpdateInsertDialect)
      assert(readAll("series") === Seq(
        ("id1", "2024-01-01 00:00:00", 1.0),
        ("id1", "2024-01-01 00:05:00", 9.5),
        ("id2", "2024-01-01 00:00:00", 3.0),
        ("id2", "2024-01-01 00:05:00", 4.0)))
    }
  }

  test("MySQL dialect renders the reference's ON DUPLICATE KEY UPDATE shape") {
    val sql = JdbcUpsertSink.MySqlDialect.upsertSql("data", Seq("id", "time"), Seq("value", "fgt"))
    assert(sql ===
      "INSERT INTO data (id, time, value, fgt) VALUES (?, ?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE value=VALUES(value), fgt=VALUES(fgt)")
  }
}
