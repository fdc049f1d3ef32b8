package graft.io

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC upsert sink — SURVEY.md §2 K2.
  *
  * The reference's write path is `insert_data(timeseries, tms_id, fgt,
  * upsert=True)` — INSERT with update-on-duplicate-key, keyed
  * `(tms_id, fgt, time)` (reference: output/extract_water_level.py:206-217).
  * Spark's `DataFrameWriter.jdbc` only appends/overwrites, so the sink is a
  * `foreachPartition` writing batched upsert statements: executors fan out,
  * the driver never materializes data, and task retries are safe because the
  * statement is idempotent by key (exactly-once-by-key).
  *
  * Dialects: MySQL `INSERT … ON DUPLICATE KEY UPDATE` (what the reference's
  * store speaks) and ANSI `MERGE` (Derby/Postgres-15+/standard warehouses).
  */
object JdbcUpsertSink {

  sealed trait Dialect

  /** reference: db_adapter insert_data upsert=True semantics — one batched
    * `INSERT … ON DUPLICATE KEY UPDATE` statement. */
  case object MySqlDialect extends Dialect {
    def upsertSql(table: String, keyCols: Seq[String], valueCols: Seq[String]): String = {
      val cols = keyCols ++ valueCols
      val updates = valueCols.map(c => s"$c=VALUES($c)").mkString(", ")
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON DUPLICATE KEY UPDATE $updates"
    }
  }

  /** Portable ANSI fallback: UPDATE; if no row matched, INSERT (retrying the
    * UPDATE once on a key-collision race). Works on any JDBC store without
    * vendor upsert syntax (Derby, older Postgres, generic warehouses). */
  case object UpdateInsertDialect extends Dialect {
    def updateSql(table: String, keyCols: Seq[String], valueCols: Seq[String]): String =
      s"UPDATE $table SET ${valueCols.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    def insertSql(table: String, keyCols: Seq[String], valueCols: Seq[String]): String = {
      val cols = keyCols ++ valueCols
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    }
  }

  /** Upsert `df` into `table` keyed on `keyCols`. Each partition opens one
    * connection and writes `batchSize`-row statement batches. */
  def upsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], valueCols: Seq[String],
      dialect: Dialect = MySqlDialect, batchSize: Int = 1000,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    val cols = keyCols ++ valueCols
    val nKeys = keyCols.length
    val projected = df.selectExpr(cols: _*)
    projected.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url, props)
        try dialect match {
          case MySqlDialect =>
            writeBatches(conn, MySqlDialect.upsertSql(table, keyCols, valueCols),
              cols.length, rows, batchSize)
          case UpdateInsertDialect =>
            writeUpdateInsert(conn,
              UpdateInsertDialect.updateSql(table, keyCols, valueCols),
              UpdateInsertDialect.insertSql(table, keyCols, valueCols),
              nKeys, cols.length, rows, batchSize)
        } finally conn.close()
      }
    }
  }

  private[io] def writeBatches(conn: Connection, sql: String, width: Int,
      rows: Iterator[Row], batchSize: Int): Unit = {
    conn.setAutoCommit(false)
    val st = conn.prepareStatement(sql)
    try {
      var n = 0
      rows.foreach { r =>
        var i = 0
        while (i < width) { st.setObject(i + 1, r.get(i)); i += 1 }
        st.addBatch()
        n += 1
        if (n % batchSize == 0) { st.executeBatch(); conn.commit() }
      }
      if (n % batchSize != 0) { st.executeBatch(); conn.commit() }
    } finally st.close()
  }

  /** Row layout: keys first then values (as projected by `upsert`). UPDATE
    * params are (values…, keys…); INSERT params are (keys…, values…). */
  private[io] def writeUpdateInsert(conn: Connection, updateSql: String,
      insertSql: String, nKeys: Int, width: Int,
      rows: Iterator[Row], batchSize: Int): Unit = {
    conn.setAutoCommit(false)
    val up = conn.prepareStatement(updateSql)
    val ins = conn.prepareStatement(insertSql)
    try {
      var n = 0
      rows.foreach { r =>
        var i = 0
        while (i < width - nKeys) { up.setObject(i + 1, r.get(nKeys + i)); i += 1 }
        var k = 0
        while (k < nKeys) { up.setObject(width - nKeys + k + 1, r.get(k)); k += 1 }
        val updated = up.executeUpdate()
        if (updated == 0) {
          var j = 0
          while (j < width) { ins.setObject(j + 1, r.get(j)); j += 1 }
          try ins.executeUpdate()
          catch {
            // key-collision race with a concurrent writer: re-run the UPDATE.
            // Match on SQLState class 23 (integrity violation) — not the
            // exception subclass, which e.g. PostgreSQL's driver never throws
            case e: java.sql.SQLException
                if e.getSQLState != null && e.getSQLState.startsWith("23") =>
              up.executeUpdate()
          }
        }
        n += 1
        if (n % batchSize == 0) conn.commit()
      }
      conn.commit()
    } finally { up.close(); ins.close() }
  }

  /** Run-metadata sink (K3): one row per extraction run —
    * `(source, variable, sim_tag, fgt, metadata JSON, template blob)`
    * (reference: output/extract_water_level.py:589-591). Driver-side single
    * insert; the blob is the K5 template archive when present. */
  def insertRunMetadata(url: String, table: String, sourceId: Long,
      variableId: Long, simTag: String, fgt: java.sql.Timestamp,
      metadataJson: String, templateBlob: Option[Array[Byte]] = None,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"INSERT INTO $table (source_id, variable_id, sim_tag, fgt, metadata, template) " +
          "VALUES (?, ?, ?, ?, ?, ?)")
      try {
        st.setLong(1, sourceId); st.setLong(2, variableId); st.setString(3, simTag)
        st.setTimestamp(4, fgt); st.setString(5, metadataJson)
        templateBlob match {
          case Some(b) => st.setBytes(6, b)
          case None => st.setNull(6, java.sql.Types.BLOB)
        }
        st.executeUpdate()
      } finally st.close()
    } finally conn.close()
  }

  /** Post-upsert bookkeeping the reference performs per series: bump
    * `latest_fgt` FORWARD and pull `start_date` BACK — monotone in both
    * directions so replaying an old extraction cannot regress the run table
    * (reference: output/extract_water_level.py:214-217). CASE instead of
    * GREATEST/LEAST for Derby portability. Dimension-sized: one connection,
    * one statement, batched rows. */
  /** Returns the tms_ids that had NO run-table row (batch count 0) so the
    * caller can register them — a silent skip would lose bookkeeping for
    * unregistered series. */
  def updateRunBookkeeping(url: String, runTable: String,
      rows: Seq[(String, java.sql.Timestamp, java.sql.Timestamp)],
      props: java.util.Properties = new java.util.Properties()): Seq[String] = {
    if (rows.isEmpty) return Nil
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"UPDATE $runTable SET " +
          "latest_fgt = CASE WHEN latest_fgt IS NULL OR latest_fgt < ? THEN ? ELSE latest_fgt END, " +
          "start_date = CASE WHEN start_date IS NULL OR start_date > ? THEN ? ELSE start_date END " +
          "WHERE tms_id = ?")
      try {
        rows.foreach { case (tmsId, fgt, startDate) =>
          st.setTimestamp(1, fgt); st.setTimestamp(2, fgt)
          st.setTimestamp(3, startDate); st.setTimestamp(4, startDate)
          st.setString(5, tmsId)
          st.addBatch()
        }
        val counts = st.executeBatch()
        rows.zip(counts).collect { case ((tmsId, _, _), 0) => tmsId }
      } finally st.close()
    } finally conn.close()
  }

  /** Register run rows for series the run table has never seen — the
    * reference's `get_timeseries_id_if_exists → generate_timeseries_id →
    * insert_run → update_start_date` path on first extraction of a station
    * (reference: output/extract_water_level.py:206-217). A concurrent
    * registration races as a key collision (SQLState class 23) and is
    * treated as already-registered; the caller re-applies bookkeeping
    * afterwards so the raced row still converges to the right fgt/start. */
  def registerRuns(url: String, runTable: String,
      rows: Seq[(String, java.sql.Timestamp, java.sql.Timestamp)],
      props: java.util.Properties = new java.util.Properties()): Unit = {
    if (rows.isEmpty) return
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"INSERT INTO $runTable (tms_id, latest_fgt, start_date) VALUES (?, ?, ?)")
      try rows.foreach { case (tmsId, fgt, startDate) =>
        st.setString(1, tmsId); st.setTimestamp(2, fgt); st.setTimestamp(3, startDate)
        try st.executeUpdate()
        catch {
          case e: java.sql.SQLException
              if e.getSQLState != null && e.getSQLState.startsWith("23") => ()
        }
      } finally st.close()
    } finally conn.close()
  }

  /** Full run-row shape of the reference's forecast store: the series id plus
    * the dimension ids tms_meta carries into insert_run
    * (output/extract_water_level.py:163-217 — sim_tag, station_id, source_id,
    * unit_id, variable_id, with fgt/start_date bookkeeping). */
  final case class RunRow(tmsId: String, fgt: java.sql.Timestamp,
      startDate: java.sql.Timestamp, stationId: Long, simTag: String,
      sourceId: Long, unitId: Long, variableId: Long)

  /** [[registerRuns]] against the reference's full run schema. Same race
    * contract: a key collision means another writer registered the series —
    * the caller re-applies bookkeeping so fgt/start still converge. */
  def registerRunsFull(url: String, runTable: String, rows: Seq[RunRow],
      props: java.util.Properties = new java.util.Properties()): Unit = {
    if (rows.isEmpty) return
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"INSERT INTO $runTable (tms_id, sim_tag, station_id, source_id, " +
          "unit_id, variable_id, latest_fgt, start_date) " +
          "VALUES (?, ?, ?, ?, ?, ?, ?, ?)")
      try rows.foreach { r =>
        st.setString(1, r.tmsId); st.setString(2, r.simTag)
        st.setLong(3, r.stationId); st.setLong(4, r.sourceId)
        st.setLong(5, r.unitId); st.setLong(6, r.variableId)
        st.setTimestamp(7, r.fgt); st.setTimestamp(8, r.startDate)
        try st.executeUpdate()
        catch {
          case e: java.sql.SQLException
              if e.getSQLState != null && e.getSQLState.startsWith("23") => ()
        }
      } finally st.close()
    } finally conn.close()
  }
}
