package graft.cli

import java.nio.file.{Files, Paths}
import java.sql.{DriverManager, Timestamp}

import graft.SparkSpec
import graft.extract.ExtractPipeline
import graft.io.JdbcUpsertSink
import graft.sources.Sources

/** End-to-end lifecycle specs — SURVEY.md §3: parquet fixture → CLI main →
  * deck file on disk; HYCHAN report → enriched series → Derby forecast
  * store, converging under re-extraction. */
class CliIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("GenRain: parquet series fixture → RAIN.DAT on disk with run_meta merge") {
    val dir = tmp("genrain")
    val series = Seq(
      ("h1", Timestamp.valueOf("2024-01-01 00:05:00"), 1.0),
      ("h1", Timestamp.valueOf("2024-01-01 00:10:00"), 3.0),
      ("h2", Timestamp.valueOf("2024-01-01 00:10:00"), 99.0) // other id: excluded
    ).toDF("id", "time", "value")
    series.write.parquet(s"$dir/series")

    GenRain.run(spark, CliArgs.parse(Array(
      "--series", s"$dir/series", "--id", "h1",
      "-s", "2024-01-01 00:00:00", "-e", "2024-01-01 00:30:00",
      "-m", "flo2d_250", "-d", dir)))

    val lines = Files.readAllLines(Paths.get(s"$dir/RAIN.DAT")).toArray.toSeq
    assert(lines === Seq(
      " 0             0 ",
      " 4.000         5             0             0 ",
      "R              0.083         0.250 ",
      "R              0.167         1.000 "))
    assert(Files.readString(Paths.get(s"$dir/run_meta.json")).contains("\"RAIN\""))
    // K6: rerun leaves the file untouched
    GenRain.run(spark, CliArgs.parse(Array(
      "--series", s"$dir/series", "--id", "h1",
      "-s", "2024-01-01 00:00:00", "-e", "2024-01-01 00:30:00",
      "-m", "flo2d_250", "-d", dir)))
    assert(Files.readAllLines(Paths.get(s"$dir/RAIN.DAT")).size === 4)
  }

  test("GenRain flo2d_10: nearest station -> series-index lookup selects the series") {
    val dir = tmp("genrain10")
    Seq((100057L, "Naula", 7.0, 80.0), (100099L, "Far", 9.9, 89.9))
      .toDF("station_id", "name", "lat", "lon")
      .write.parquet(s"$dir/stations")
    Seq(("rainfall_100057_Naula_MDPA", "MME", "hashX"),
        ("rainfall_100057_Naula_MDPA", "OBS", "hashWrong"))
      .toDF("grid_id", "method", "id")
      .write.parquet(s"$dir/index")
    Seq(("hashX", Timestamp.valueOf("2024-01-01 00:05:00"), 2.0),
        ("other", Timestamp.valueOf("2024-01-01 00:05:00"), 7.0))
      .toDF("id", "time", "value")
      .write.parquet(s"$dir/series")

    GenRain.run(spark, CliArgs.parse(Array(
      "--series", s"$dir/series", "--stations", s"$dir/stations",
      "--series-index", s"$dir/index", "--lat", "7.01", "--lon", "80.01",
      "-s", "2024-01-01 00:00:00", "-e", "2024-01-01 00:10:00",
      "-m", "flo2d_10_test", "-d", dir)))
    val lines = Files.readAllLines(Paths.get(s"$dir/RAIN.DAT")).toArray.map(_.toString)
    assert(lines(1).startsWith(" 2.000")) // hashX's series, not `other`
  }

  test("GenRaincell: F7-clamps the window to available data") {
    val dir = tmp("genraincell")
    val cells = Seq(
      (Timestamp.valueOf("2024-01-01 00:05:00"), 1, 1.0),
      (Timestamp.valueOf("2024-01-01 00:10:00"), 1, 2.0)
    ).toDF("time", "cell_id", "value")
    cells.write.parquet(s"$dir/cells")
    // requested end 01:00 but data ends 00:10 → header says 2 steps
    GenRaincell.run(spark, CliArgs.parse(Array(
      "--cells", s"$dir/cells",
      "-s", "2024-01-01 00:00:00", "-e", "2024-01-01 01:00:00",
      "-m", "flo2d_250", "-d", dir)))
    val lines = Files.readAllLines(Paths.get(s"$dir/RAINCELL.DAT")).toArray.toSeq
    assert(lines.head === "5 2 2024-01-01 00:00:00 2024-01-01 00:10:00")
    assert(lines.tail === Seq("1 1.003", "", "1 2.003", ""))
  }

  private val hychanText =
    """PREAMBLE
      |     CHANNEL HYDROGRAPH FOR ELEMENT NO:    250
      |   TIME      ELEV
      |   1.00    12.30    0.0   0.0   100.00
      |   2.00    12.60    0.0   0.0   101.00
      |     CHANNEL HYDROGRAPH FOR ELEMENT NO:    999
      |   1.00    50.00    0.0   0.0   500.00""".stripMargin

  test("GenOutflow --config: reference config_150_v2.json dict shape drives the deck") {
    val dir = tmp("genoutflow")
    // the reference's exact config shape: versioned dict keys, boundary cell
    // → tide grid id, multiple boundaries sharing one tide station
    // (input/outflow/config_150_v2.json, gen_outflow.py:226-249)
    Files.writeString(Paths.get(s"$dir/config.json"),
      """{
        |  "tide_ids_150_v2_v1": {"356": "tide_colombo"},
        |  "tide_ids_150_v2": {
        |    "330": "tide_wellawatta",
        |    "462": "tide_wellawatta",
        |    "1282": "tide_mattakkuliya"
        |  }
        |}""".stripMargin)
    Seq(
      ("tide_wellawatta", Timestamp.valueOf("2024-01-01 00:00:00"), 0.52),
      ("tide_wellawatta", Timestamp.valueOf("2024-01-01 00:30:00"), 0.57),
      ("tide_mattakkuliya", Timestamp.valueOf("2024-01-01 00:00:00"), 0.61)
    ).toDF("cell", "time", "value").write.parquet(s"$dir/tides.parquet")
    GenOutflow.run(spark, Map(
      "tides" -> s"$dir/tides.parquet", "config" -> s"$dir/config.json",
      "kcells" -> "268,1174", "d" -> dir,
      "s" -> "2024-01-01 00:00:00", "e" -> "2024-01-01 06:00:00"))
    val lines = Files.readAllLines(Paths.get(s"$dir/OUTFLOW.DAT")).toArray.map(_.toString).toSeq
    // dict insertion order = block order; shared tide series is replicated
    assert(lines === Seq(
      "K             268",
      "K            1174",
      "N             330               1",
      "S           0.000           0.520",
      "S           0.500           0.570",
      "N             462               1",
      "S           0.000           0.520",
      "S           0.500           0.570",
      "N            1282               1",
      "S           0.000           0.610"))
    // missing config key fails loudly, naming what IS there
    val e = intercept[IllegalArgumentException] {
      GenOutflow.run(spark, Map(
        "tides" -> s"$dir/tides.parquet", "config" -> s"$dir/config.json",
        "config-key" -> "tide_ids_250", "d" -> dir,
        "s" -> "2024-01-01 00:00:00", "e" -> "2024-01-01 06:00:00"))
    }
    assert(e.getMessage.contains("tide_ids_150_v2"))
  }

  test("ExtractPipeline: HYCHAN → cell-map filter → horizon → Derby upsert, idempotent") {
    val dir = tmp("extract")
    Files.writeString(Paths.get(s"$dir/HYCHAN.OUT"), hychanText)
    Files.writeString(Paths.get(s"$dir/cells.json"), """{"250": "Hanwella"}""")

    val url = "jdbc:derby:memory:extractdb;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE data (tms_id VARCHAR(64), fgt TIMESTAMP, time TIMESTAMP, " +
        "value DOUBLE, PRIMARY KEY (tms_id, fgt, time))")
    conn.close()

    val cellMap = Sources.cellMapJson(spark, s"$dir/cells.json", "CHANNEL")
    def runOnce(): Unit = {
      val series = ExtractPipeline.channelSeries(
        spark, s"$dir/HYCHAN.OUT", "2024-01-01 00:00:00", cellMap,
        valueIndex = 1, cutoff = Some("2024-01-01 02:00:00"))
      val enriched = ExtractPipeline.withSeriesIds(
        series, "flo2d_150_v2", "daily_run", "2024-01-01 03:00:00")
      ExtractPipeline.upsertForecast(enriched, url, "data",
        JdbcUpsertSink.UpdateInsertDialect)
    }
    runOnce()
    runOnce() // re-extraction converges, no duplicates

    val c2 = DriverManager.getConnection(url)
    val rs = c2.createStatement()
      .executeQuery("SELECT tms_id, time, value FROM data ORDER BY time")
    val rows = Iterator.continually(rs)
      .takeWhile(_.next())
      .map(r => (r.getString(1), r.getTimestamp(2).toString, r.getDouble(3)))
      .toList
    c2.close()
    // element 999 is not in the cell map (F6); 1.00 h row is pre-cutoff (F2)
    assert(rows.map(_._2) === List("2024-01-01 02:00:00.0"))
    assert(rows.head._3 === 12.60)
    assert(rows.head._1.matches("[0-9a-f]{64}"))

    // run-table bookkeeping: latest_fgt bumped, start_date pulled back (K2)
    val c3 = DriverManager.getConnection(url)
    c3.createStatement().execute(
      "CREATE TABLE run (tms_id VARCHAR(64) PRIMARY KEY, latest_fgt TIMESTAMP, start_date TIMESTAMP)")
    c3.createStatement().execute(
      s"INSERT INTO run VALUES ('${rows.head._1}', TIMESTAMP('2020-01-01 00:00:00'), TIMESTAMP('2030-01-01 00:00:00'))")
    c3.close()
    val series = ExtractPipeline.channelSeries(
      spark, s"$dir/HYCHAN.OUT", "2024-01-01 00:00:00", cellMap,
      valueIndex = 1, cutoff = Some("2024-01-01 02:00:00"))
    val enriched = ExtractPipeline.withSeriesIds(
      series, "flo2d_150_v2", "daily_run", "2024-01-01 03:00:00")
    ExtractPipeline.updateRunTable(enriched, url, "run")
    // replaying an OLDER extraction must not regress the run table
    val stale = ExtractPipeline.withSeriesIds(
      series, "flo2d_150_v2", "daily_run", "2023-06-01 00:00:00")
    ExtractPipeline.updateRunTable(stale, url, "run")
    val c4 = DriverManager.getConnection(url)
    val rs4 = c4.createStatement().executeQuery("SELECT latest_fgt, start_date FROM run")
    assert(rs4.next())
    assert(rs4.getTimestamp(1).toString === "2024-01-01 03:00:00.0") // not regressed
    assert(rs4.getTimestamp(2).toString === "2024-01-01 02:00:00.0")
    c4.close()

    // first extraction of a NEW station: the series has no run row yet —
    // updateRunTable must REGISTER it (reference insert_run path,
    // extract_water_level.py:206-213), not just log and skip
    val fresh = ExtractPipeline.withSeriesIds(
      series, "flo2d_150_v2", "new_sim_tag", "2024-01-01 03:00:00")
    ExtractPipeline.updateRunTable(fresh, url, "run")
    val newId = fresh.select("tms_id").head().getString(0)
    assert(newId !== rows.head._1)
    val c5 = DriverManager.getConnection(url)
    val rs5 = c5.createStatement().executeQuery(
      s"SELECT latest_fgt, start_date FROM run WHERE tms_id = '$newId'")
    assert(rs5.next(), "first extraction must create a run row")
    assert(rs5.getTimestamp(1).toString === "2024-01-01 03:00:00.0")
    assert(rs5.getTimestamp(2).toString === "2024-01-01 02:00:00.0")
    c5.close()
  }

  test("Sources: cell-map JSON, first-value-in-window, nearest station") {
    val dir = tmp("sources")
    Files.writeString(Paths.get(s"$dir/map.json"), """{"10": "A", "20": "B"}""")
    val cm = Sources.cellMapJson(spark, s"$dir/map.json", "CHANNEL")
      .orderBy("cell_no").collect().map(r => (r.getString(0), r.getString(1)))
    assert(cm === Array(("10", "A"), ("20", "B")))

    val obs = Seq(
      ("w1", Timestamp.valueOf("2024-01-01 00:30:00"), 7.5),
      ("w1", Timestamp.valueOf("2024-01-01 01:00:00"), 8.0),
      ("w1", Timestamp.valueOf("2024-01-01 09:00:00"), 9.0) // outside window
    ).toDF("id", "time", "value")
    assert(Sources.firstValueInWindow(obs, "2024-01-01 00:00:00", 2) === Some(7.5))
    assert(Sources.firstValueInWindow(obs, "2024-02-01 00:00:00", 2) === None)

    val stations = Seq((1, 6.90, 79.95), (2, 7.10, 80.10)).toDF("sid", "lat", "lon")
    val nearest = Sources.nearestStation(stations, 6.95, 80.00)
      .collect().head.getInt(0)
    assert(nearest === 1)
  }
}
