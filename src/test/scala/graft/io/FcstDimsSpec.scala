package graft.io

import java.nio.file.{Files, Paths}
import java.sql.DriverManager

import graft.SparkSpec
import graft.extract.ExtractPipeline
import graft.sources.Sources

/** Full init/run-registration parity against embedded Derby: the reference's
  * dim surface (source with parameters JSON, variable, unit, stations with
  * "%.6f" coordinates — init/init.py:63-100) and the full run row a first
  * extraction registers (sim_tag + station/source/unit/variable ids,
  * output/extract_water_level.py:166-217,388-398). */
class FcstDimsSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:dimsdb;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try sqls.foreach { s =>
      val st = conn.createStatement()
      try st.execute(s) catch { case _: java.sql.SQLException => () } finally st.close()
    } finally conn.close()
  }

  private def createDims(): Unit = exec(
    "DROP TABLE run", "DROP TABLE station", "DROP TABLE unit",
    "DROP TABLE variable", "DROP TABLE source",
    "CREATE TABLE source (id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, " +
      "model VARCHAR(64), version VARCHAR(64), parameters CLOB, " +
      "CONSTRAINT uq_source UNIQUE (model, version))",
    "CREATE TABLE variable (id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, " +
      "variable VARCHAR(64), CONSTRAINT uq_variable UNIQUE (variable))",
    "CREATE TABLE unit (id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, " +
      "unit VARCHAR(16), unit_type VARCHAR(32), CONSTRAINT uq_unit UNIQUE (unit, unit_type))",
    "CREATE TABLE station (id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, " +
      "name VARCHAR(128), latitude VARCHAR(16), longitude VARCHAR(16), " +
      "station_type VARCHAR(64), description VARCHAR(128), " +
      "CONSTRAINT uq_station UNIQUE (name, station_type))",
    "CREATE TABLE run (tms_id VARCHAR(64) PRIMARY KEY, sim_tag VARCHAR(64), " +
      "station_id BIGINT, source_id BIGINT, unit_id BIGINT, variable_id BIGINT, " +
      "latest_fgt TIMESTAMP, start_date TIMESTAMP)")

  test("ensure* helpers are get-or-insert: same id on re-registration") {
    createDims()
    val params = """{"CHANNEL_CELL_MAP": {"250": "Hanwella"}}"""
    val s1 = FcstDims.ensureSource(url, "FLO2D", "150_v2", params)
    val s2 = FcstDims.ensureSource(url, "FLO2D", "150_v2", params)
    assert(s1 == s2)
    assert(FcstDims.ensureSource(url, "FLO2D", "250", params) != s1)
    val v1 = FcstDims.ensureVariable(url, "WaterLevel")
    assert(FcstDims.ensureVariable(url, "WaterLevel") == v1)
    val u1 = FcstDims.ensureUnit(url, "m", "Instantaneous")
    assert(FcstDims.ensureUnit(url, "m", "Instantaneous") == u1)
    assert(FcstDims.ensureUnit(url, "m3/s", "Instantaneous") != u1)

    // the stored parameters JSON round-trips (init.py:80 add_source)
    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement()
      .executeQuery(s"SELECT parameters FROM source WHERE id = $s1")
    assert(rs.next() && rs.getString(1) === params)
    conn.close()
  }

  test("ensureStations registers the reference's station shape, idempotently") {
    createDims()
    val rows = Seq(
      FcstDims.StationRow("250_Hanwella", "6.909722", "80.081667",
        "flo2d_150_v2", "flo2d_150_v2_channel_cell_map_element"),
      FcstDims.StationRow("369_Glencourse", "6.978056", "80.203611",
        "flo2d_150_v2", "flo2d_150_v2_channel_cell_map_element"))
    val ids = FcstDims.ensureStations(url, rows)
    assert(ids.keySet === Set("250_Hanwella", "369_Glencourse"))
    assert(FcstDims.ensureStations(url, rows) === ids) // same ids again

    // outputStations: keyed by leading element number, coords as stored
    val byElement = FcstDims.outputStations(url, "flo2d_150_v2")
    assert(byElement.keySet === Set("250", "369"))
    assert(byElement("250") === ((ids("250_Hanwella"), "6.909722", "80.081667")))
    // other station types don't leak in
    assert(FcstDims.outputStations(url, "flo2d_250").isEmpty)
  }

  test("first extraction registers the FULL run row; bookkeeping stays monotone") {
    createDims()
    val sourceId = FcstDims.ensureSource(url, "FLO2D", "150_v2", "{}")
    val unitId = FcstDims.ensureUnit(url, "m", "Instantaneous")
    val variableId = FcstDims.ensureVariable(url, "WaterLevel")
    val stationIds = FcstDims.ensureStations(url, Seq(
      FcstDims.StationRow("250_Hanwella", "6.909722", "80.081667",
        "flo2d_150_v2", "flo2d_150_v2_channel_cell_map_element")))
    val stations = FcstDims.outputStations(url, "flo2d_150_v2")

    val series = Seq(
      ("250", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 12.3),
      ("250", java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 12.6)
    ).toDF("element", "time", "value")
    val enriched = ExtractPipeline.withStationDims(
      ExtractPipeline.withSeriesIds(series, "flo2d_150_v2", "daily_run",
        "2024-01-01 03:00:00"),
      stations)
    // the lat/lon patch is on every series row (extract_water_level.py:200-203)
    val patched = enriched.select("station_id", "latitude", "longitude").head()
    assert(patched.getLong(0) === stationIds("250_Hanwella"))
    assert(patched.getString(1) === "6.909722" && patched.getString(2) === "80.081667")

    val dims = FcstDims.RunDimIds("daily_run", sourceId, unitId, variableId)
    ExtractPipeline.updateRunTableFull(enriched, url, "run", dims)

    def runRow(): (String, Long, Long, Long, Long, String, String) = {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT sim_tag, station_id, source_id, unit_id, variable_id, " +
            "latest_fgt, start_date FROM run")
        assert(rs.next(), "run row must exist after first extraction")
        val t = (rs.getString(1), rs.getLong(2), rs.getLong(3), rs.getLong(4),
          rs.getLong(5), rs.getTimestamp(6).toString, rs.getTimestamp(7).toString)
        assert(!rs.next(), "exactly one run row per series")
        t
      } finally conn.close()
    }
    assert(runRow() === (("daily_run", stationIds("250_Hanwella"), sourceId,
      unitId, variableId, "2024-01-01 03:00:00.0", "2024-01-01 01:00:00.0")))

    // a later extraction bumps latest_fgt; a stale replay regresses nothing
    val later = ExtractPipeline.withStationDims(
      ExtractPipeline.withSeriesIds(series, "flo2d_150_v2", "daily_run",
        "2024-01-02 03:00:00"), stations)
    ExtractPipeline.updateRunTableFull(later, url, "run", dims)
    assert(runRow()._6 === "2024-01-02 03:00:00.0")
    val stale = ExtractPipeline.withStationDims(
      ExtractPipeline.withSeriesIds(series, "flo2d_150_v2", "daily_run",
        "2023-06-01 00:00:00"), stations)
    ExtractPipeline.updateRunTableFull(stale, url, "run", dims)
    assert(runRow()._6 === "2024-01-02 03:00:00.0") // not regressed
  }

  test("withStationDims fails loudly on an element missing from the dim") {
    val series = Seq(("999", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1.0))
      .toDF("element", "time", "value")
    val e = intercept[IllegalArgumentException] {
      ExtractPipeline.withStationDims(series,
        Map("250" -> ((1L, "6.9", "80.1"))))
    }
    assert(e.getMessage.contains("999"))
  }

  test("InitDims --url registers source/variable/unit/stations from grid+cellmap") {
    createDims()
    val dir = Files.createTempDirectory("initdims").toString
    Files.writeString(Paths.get(s"$dir/grid.csv"),
      "Grid_ID,X,Y\n250,80.081667,6.909722\n369,80.203611,6.978056\n")
    Files.writeString(Paths.get(s"$dir/cells.json"),
      """{"250": "Hanwella", "369": "Glencourse"}""")
    graft.cli.InitDims.run(spark, Map(
      "grid" -> s"$dir/grid.csv", "cellmap" -> s"$dir/cells.json",
      "kind" -> "CHANNEL", "url" -> url,
      "model" -> "FLO2D", "version" -> "150_v2"))
    val stations = FcstDims.outputStations(url, "flo2d_150_v2")
    assert(stations.keySet === Set("250", "369"))
    // "%.6f" formatting like the reference's add_station loop (init.py:88-89)
    assert(stations("250")._2 === "6.909722" && stations("250")._3 === "80.081667")
    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement().executeQuery(
      "SELECT s.parameters, st.description FROM source s, station st " +
        "WHERE st.name = '250_Hanwella'")
    assert(rs.next())
    assert(rs.getString(1).contains("Hanwella")) // whole cell map registered
    assert(rs.getString(2) === "flo2d_150_v2_channel_cell_map_element")
    conn.close()
    // re-running init is a no-op (get-or-insert everywhere)
    graft.cli.InitDims.run(spark, Map(
      "grid" -> s"$dir/grid.csv", "cellmap" -> s"$dir/cells.json",
      "kind" -> "CHANNEL", "url" -> url,
      "model" -> "FLO2D", "version" -> "150_v2"))
    assert(FcstDims.outputStations(url, "flo2d_150_v2") === stations)
  }
}
