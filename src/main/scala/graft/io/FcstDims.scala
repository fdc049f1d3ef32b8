package graft.io

import java.sql.{Connection, DriverManager}

/** Forecast-store dimension registration — the engine-side counterpart of the
  * reference's init/run-registration surface (reference: init/init.py:63-100
  * `add_source`/`add_station`, output/extract_water_level.py:380-398
  * `get_source_id`/`get_variable_id`/`get_unit_id`/
  * `get_flo2d_output_stations`).
  *
  * Expected store shape (natural keys in parentheses; ids are
  * store-generated, e.g. Derby/MySQL identity columns):
  *
  *   source(id, model, version, parameters)        (model, version)
  *   variable(id, variable)                        (variable)
  *   unit(id, unit, unit_type)                     (unit, unit_type)
  *   station(id, name, latitude, longitude,
  *           station_type, description)            (name, station_type)
  *
  * Everything here is dimension-sized by construction (stations are the
  * extract cell map — hundreds of rows, not data volume), so each helper is
  * one driver-side connection with batched statements; the 100 TB data path
  * never touches this module. All get-or-insert helpers treat a key-collision
  * race (SQLState class 23) as already-inserted and re-read, so concurrent
  * initializers converge.
  */
object FcstDims {

  /** One output station: `name` is the reference's `{cellNo}_{label}`,
    * coordinates are already-formatted strings ("%.6f" in the reference —
    * formatting belongs to the caller so the dim stores exactly what init
    * wrote). */
  final case class StationRow(name: String, latitude: String, longitude: String,
      stationType: String, description: String)

  /** Dimension ids a run row links to (reference tms_meta minus the
    * per-element station: output/extract_water_level.py:388-398). */
  final case class RunDimIds(simTag: String, sourceId: Long, unitId: Long,
      variableId: Long)

  /** Get-or-insert the source row, storing the model's `parameters` JSON
    * (the reference registers the whole extract-stations config:
    * init/init.py:80). Returns the source id. */
  def ensureSource(url: String, model: String, version: String,
      parametersJson: String, table: String = "source",
      props: java.util.Properties = new java.util.Properties()): Long =
    withConnection(url, props) { conn =>
      getOrInsert(conn,
        s"SELECT id FROM $table WHERE model = ? AND version = ?",
        Seq(model, version),
        s"INSERT INTO $table (model, version, parameters) VALUES (?, ?, ?)",
        Seq(model, version, parametersJson))
    }

  /** Get-or-insert a variable (reference: db_adapter get_variable_id /
    * add_variable call sites, init/init.py:81). */
  def ensureVariable(url: String, variable: String, table: String = "variable",
      props: java.util.Properties = new java.util.Properties()): Long =
    withConnection(url, props) { conn =>
      getOrInsert(conn,
        s"SELECT id FROM $table WHERE variable = ?", Seq(variable),
        s"INSERT INTO $table (variable) VALUES (?)", Seq(variable))
    }

  /** Get-or-insert a unit + type (reference: init/init.py:66-67 'm' /
    * Instantaneous). */
  def ensureUnit(url: String, unit: String, unitType: String,
      table: String = "unit",
      props: java.util.Properties = new java.util.Properties()): Long =
    withConnection(url, props) { conn =>
      getOrInsert(conn,
        s"SELECT id FROM $table WHERE unit = ? AND unit_type = ?",
        Seq(unit, unitType),
        s"INSERT INTO $table (unit, unit_type) VALUES (?, ?)", Seq(unit, unitType))
    }

  /** Get-or-insert every station row; returns name → id. Mirrors the
    * reference's add_station loop over the cell maps (init/init.py:86-100).
    * One connection for the whole batch. */
  def ensureStations(url: String, rows: Seq[StationRow],
      table: String = "station",
      props: java.util.Properties = new java.util.Properties()): Map[String, Long] =
    withConnection(url, props) { conn =>
      rows.map { r =>
        r.name -> getOrInsert(conn,
          s"SELECT id FROM $table WHERE name = ? AND station_type = ?",
          Seq(r.name, r.stationType),
          s"INSERT INTO $table (name, latitude, longitude, station_type, description) " +
            "VALUES (?, ?, ?, ?, ?)",
          Seq(r.name, r.latitude, r.longitude, r.stationType, r.description))
      }.toMap
    }

  /** All stations of a type, keyed by the element number leading their name —
    * the reference's `get_flo2d_output_stations` shape
    * `{elementNo: (station_id, latitude, longitude)}`
    * (output/extract_water_level.py:380,388-398). */
  def outputStations(url: String, stationType: String,
      table: String = "station",
      props: java.util.Properties = new java.util.Properties())
      : Map[String, (Long, String, String)] =
    withConnection(url, props) { conn =>
      val st = conn.prepareStatement(
        s"SELECT id, name, latitude, longitude FROM $table WHERE station_type = ?")
      try {
        st.setString(1, stationType)
        val rs = st.executeQuery()
        val buf = scala.collection.mutable.Map.empty[String, (Long, String, String)]
        while (rs.next()) {
          val element = rs.getString(2).split("_", 2)(0)
          buf += element -> ((rs.getLong(1), rs.getString(3), rs.getString(4)))
        }
        buf.toMap
      } finally st.close()
    }

  private def withConnection[A](url: String, props: java.util.Properties)
      (f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def getOrInsert(conn: Connection, selectSql: String, selectArgs: Seq[String],
      insertSql: String, insertArgs: Seq[String]): Long = {
    def select(): Option[Long] = {
      val st = conn.prepareStatement(selectSql)
      try {
        selectArgs.zipWithIndex.foreach { case (a, i) => st.setString(i + 1, a) }
        val rs = st.executeQuery()
        if (rs.next()) Some(rs.getLong(1)) else None
      } finally st.close()
    }
    select().getOrElse {
      val st = conn.prepareStatement(insertSql)
      try {
        insertArgs.zipWithIndex.foreach { case (a, i) => st.setString(i + 1, a) }
        st.executeUpdate()
      } catch {
        // lost a get-or-insert race: the winner's row is the answer
        case e: java.sql.SQLException
            if e.getSQLState != null && e.getSQLState.startsWith("23") => ()
      } finally st.close()
      select().getOrElse(throw new IllegalStateException(
        s"dimension row vanished after insert: $insertSql ${insertArgs.mkString(",")}"))
    }
  }
}
