package graft.cli

import java.nio.file.{Files, Paths}
import java.sql.{DriverManager, Timestamp}

import graft.SparkSpec
import graft.decks.{InflowDeck, OutflowDeck}
import graft.extract.ExtractPipeline
import graft.io.{FcstDims, JdbcUpsertSink}
import graft.sources.Sources

/** ONE end-to-end pass through the whole reference lifecycle, chained the
  * way a production day runs it — each stage consuming the previous
  * stage's real output, against one Derby store and the reference's own
  * golden artifacts:
  *
  *   1. `InitDims` registers source/variable/unit/stations (full dim
  *      schema) from grid CSV + cell-map JSONs;
  *   2. deck generation reproduces
  *      `/root/reference/res/flo2d_150_v2/{INFLOW,OUTFLOW}.DAT` BYTE-FOR-
  *      BYTE through the CLI writer (K6 existence guard + run_meta merge);
  *   3. HYCHAN + TIMDEP extraction with the +05:30 UTC-offset shift,
  *      station-dim enrichment from the store initialized in (1);
  *   4. forecast upsert + `updateRunTableFull` registers the FULL run row
  *      (sim_tag and station/source/unit/variable ids);
  *   5. every stage re-runs: decks untouched, upserts converge, stale
  *      bookkeeping regresses nothing, init is get-or-insert.
  *
  * The stages are individually covered by GoldenArtifactsSpec /
  * FcstDimsSpec / CliIntegrationSpec; what THIS spec adds is the chain —
  * ids minted in stage 1 flowing through stage 4's run rows.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:lifecycledb;create=true"
  private val res = "/root/reference/res/flo2d_150_v2"

  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try sqls.foreach { s =>
      val st = conn.createStatement()
      try st.execute(s) catch { case _: java.sql.SQLException => () } finally st.close()
    } finally conn.close()
  }

  private def createStore(): Unit = exec(
    "DROP TABLE data", "DROP TABLE run", "DROP TABLE station",
    "DROP TABLE unit", "DROP TABLE variable", "DROP TABLE source",
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
      "latest_fgt TIMESTAMP, start_date TIMESTAMP)",
    "CREATE TABLE data (tms_id VARCHAR(64), fgt TIMESTAMP, time TIMESTAMP, " +
      "value DOUBLE, PRIMARY KEY (tms_id, fgt, time))")

  private def fileLines(path: String): Seq[String] = {
    val raw = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val segs = raw.split("\n", -1).toSeq
    if (segs.nonEmpty && segs.last.isEmpty) segs.dropRight(1) else segs
  }

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def atHours(h: Double) = new Timestamp(base + (h * 3600000L).toLong)

  test("full lifecycle: init dims → golden decks → offset extract → full run registration → idempotent re-run") {
    // ---- 1. initialize the forecast store's dimension surface ------------
    createStore()
    val dir = Files.createTempDirectory("lifecycle").toString
    Files.writeString(Paths.get(s"$dir/grid.csv"),
      "Grid_ID,X,Y\n250,80.081667,6.909722\n369,80.203611,6.978056\n" +
        "101,80.10,6.95\n102,80.11,6.96\n")
    Files.writeString(Paths.get(s"$dir/cells_channel.json"),
      """{"250": "Hanwella", "369": "Glencourse"}""")
    Files.writeString(Paths.get(s"$dir/cells_fp.json"),
      """{"101": "FP_A", "102": "FP_B"}""")
    def initOnce(): Unit = {
      InitDims.run(spark, Map(
        "grid" -> s"$dir/grid.csv", "cellmap" -> s"$dir/cells_channel.json",
        "kind" -> "CHANNEL", "url" -> url,
        "model" -> "FLO2D", "version" -> "150_v2"))
      InitDims.run(spark, Map(
        "grid" -> s"$dir/grid.csv", "cellmap" -> s"$dir/cells_fp.json",
        "kind" -> "FLOOD_PLAIN", "url" -> url,
        "model" -> "FLO2D", "version" -> "150_v2"))
    }
    initOnce()
    val stations = FcstDims.outputStations(url, "flo2d_150_v2")
    assert(stations.keySet === Set("101", "102", "250", "369"))
    assert(stations("250")._2 === "6.909722" && stations("250")._3 === "80.081667")

    // ---- 2. deck generation vs the reference's golden artifacts ----------
    // INFLOW: series recovered from the artifact (its only record), pushed
    // through the archived-dialect deck pipeline and the CLI writer
    val glIn = fileLines(s"$res/INFLOW.DAT")
    val inHead = glIn.take(3)
    val inSeries = ((0.0, 0.0) +: glIn.drop(3).map { l =>
      val t = l.split("\\s+"); (t(1).toDouble, t(2).toDouble)
    }).map { case (h, v) => (atHours(h), v) }.toDF("time", "value")
    val deckDir = s"$dir/decks"
    Files.createDirectories(Paths.get(deckDir))
    CliArgs.writeDeck(InflowDeck.lines(spark, inSeries, inHead, InflowDeck.resHRow),
      s"$deckDir/INFLOW.DAT", "INFLOW", "2024-01-01 00:00:00")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$deckDir/INFLOW.DAT")),
      Files.readAllBytes(Paths.get(s"$res/INFLOW.DAT"))),
      "generated INFLOW.DAT must equal the reference artifact byte-for-byte")

    // OUTFLOW: boundaries + tide series recovered from the artifact
    val glOut = fileLines(s"$res/OUTFLOW.DAT")
    val kCells = glOut.filter(_.startsWith("K")).map(_.split("\\s+")(1))
    var cell = ""
    var order = -1
    val boundariesB = Seq.newBuilder[(Int, String)]
    val tidesB = Seq.newBuilder[(String, Timestamp, Double)]
    glOut.foreach { l =>
      if (l.startsWith("N")) {
        cell = l.split("\\s+")(1); order += 1; boundariesB += ((order, cell))
      } else if (l.startsWith("S")) {
        val t = l.split("\\s+")
        tidesB += ((cell, atHours(t(1).toDouble), t(2).toDouble))
      }
    }
    val tail = fileLines("/root/reference/input/outflow/tail_150_v2.txt")
    CliArgs.writeDeck(
      OutflowDeck.linesRes(spark, boundariesB.result().toDF("block_order", "cell"),
        tidesB.result().toDF("cell", "time", "value"), kCells, tail),
      s"$deckDir/OUTFLOW.DAT", "OUTFLOW", "2024-01-01 00:00:00")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$deckDir/OUTFLOW.DAT")),
      Files.readAllBytes(Paths.get(s"$res/OUTFLOW.DAT"))),
      "generated OUTFLOW.DAT must equal the reference artifact byte-for-byte")
    val meta = Files.readString(Paths.get(s"$deckDir/run_meta.json"))
    assert(meta.contains("\"INFLOW\"") && meta.contains("\"OUTFLOW\""))

    // ---- 3. model-output extraction with the UTC-offset shift ------------
    Files.writeString(Paths.get(s"$dir/HYCHAN.OUT"),
      """PREAMBLE
        |     CHANNEL HYDROGRAPH FOR ELEMENT NO:    250
        |   TIME      ELEV
        |   1.00    12.30    0.0   0.0   100.00
        |   2.00    12.60    0.0   0.0   101.00
        |     CHANNEL HYDROGRAPH FOR ELEMENT NO:    999
        |   1.00    50.00    0.0   0.0   500.00""".stripMargin)
    Files.writeString(Paths.get(s"$dir/TIMDEP.OUT"),
      """   0.50
        |    101   1.0   2.0   3.0   4.0   21.50
        |    102   1.0   2.0   3.0   4.0   22.75
        |   1.00
        |    101   1.0   2.0   3.0   4.0   21.80""".stripMargin)
    val chanMap = Sources.cellMapJson(spark, s"$dir/cells_channel.json", "CHANNEL")
    val fpMap = Sources.cellMapJson(spark, s"$dir/cells_fp.json", "FLOOD_PLAIN")
    val fgt = "2024-01-01 08:00:00"
    def extractOnce(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      // +05:30 shift: model hours 1.00/2.00 land at 06:30/07:30 wall-clock;
      // the 07:00 horizon is applied POST-shift (reference getUTCOffset +
      // extract boundary semantics), keeping only the 07:30 point
      val channel = ExtractPipeline.channelSeries(
        spark, s"$dir/HYCHAN.OUT", "2024-01-01 00:00:00", chanMap,
        valueIndex = 1, cutoff = Some("2024-01-01 07:00:00"), utcOffset = "+05:30")
      val flood = ExtractPipeline.floodPlainSeries(
        spark, s"$dir/TIMDEP.OUT", "2024-01-01 00:00:00", fpMap,
        cutoff = None, utcOffset = "+05:30")
      val enrichedC = ExtractPipeline.withStationDims(
        ExtractPipeline.withSeriesIds(channel, "flo2d_150_v2", "daily_run", fgt),
        stations)
      val enrichedF = ExtractPipeline.withStationDims(
        ExtractPipeline.withSeriesIds(flood, "flo2d_150_v2", "daily_run", fgt),
        stations)
      ExtractPipeline.upsertForecast(enrichedC, url, "data",
        JdbcUpsertSink.UpdateInsertDialect)
      ExtractPipeline.upsertForecast(enrichedF, url, "data",
        JdbcUpsertSink.UpdateInsertDialect)
      (enrichedC, enrichedF)
    }
    val (enrichedC, enrichedF) = extractOnce()
    def dataRows(): List[(String, String, Double)] = {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT tms_id, time, value FROM data ORDER BY time, value")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getString(1), r.getTimestamp(2).toString, r.getDouble(3)))
          .toList
      } finally conn.close()
    }
    val rows1 = dataRows()
    // channel: element 999 filtered by the cell map, 06:30 point pre-horizon
    // → one row at 07:30; flood plain: both blocks shifted, missing 102 in
    // block 2 densified to the -999 sentinel
    assert(rows1.map(r => (r._2, r._3)) === List(
      ("2024-01-01 06:00:00.0", 21.50), ("2024-01-01 06:00:00.0", 22.75),
      ("2024-01-01 06:30:00.0", -999.0), ("2024-01-01 06:30:00.0", 21.80),
      ("2024-01-01 07:30:00.0", 12.60)))

    // ---- 4. full run registration with the stage-1 dimension ids ---------
    val sourceId = FcstDims.ensureSource(url, "FLO2D", "150_v2",
      Files.readString(Paths.get(s"$dir/cells_channel.json")))
    val unitId = FcstDims.ensureUnit(url, "m", "Instantaneous")
    val variableId = FcstDims.ensureVariable(url, "WaterLevel")
    val dims = FcstDims.RunDimIds("daily_run", sourceId, unitId, variableId)
    ExtractPipeline.updateRunTableFull(enrichedC, url, "run", dims)
    ExtractPipeline.updateRunTableFull(enrichedF, url, "run", dims)
    def runRows(): Map[Long, (String, Long, Long, Long, String, String)] = {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT station_id, sim_tag, source_id, unit_id, variable_id, " +
            "latest_fgt, start_date FROM run")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getTimestamp(6).toString, r.getTimestamp(7).toString)))
          .toMap
      } finally conn.close()
    }
    val reg1 = runRows()
    assert(reg1.keySet === Set(stations("250")._1, stations("101")._1,
      stations("102")._1), "one run row per extracted station")
    assert(reg1(stations("250")._1) === (("daily_run", sourceId, unitId,
      variableId, "2024-01-01 08:00:00.0", "2024-01-01 07:30:00.0")))
    assert(reg1(stations("101")._1)._6 === "2024-01-01 06:00:00.0")

    // ---- 5. the whole chain re-runs without drift ------------------------
    // decks: the K6 existence guard skips regeneration even with different
    // inputs — the artifacts stay byte-identical
    CliArgs.writeDeck(
      InflowDeck.lines(spark,
        Seq((atHours(0.0), 0.0), (atHours(1.0), 99.9)).toDF("time", "value"),
        inHead, InflowDeck.resHRow),
      s"$deckDir/INFLOW.DAT", "INFLOW", "2024-01-01 00:00:00")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$deckDir/INFLOW.DAT")),
      Files.readAllBytes(Paths.get(s"$res/INFLOW.DAT"))))
    // extraction + upsert: converges by key, no duplicates
    extractOnce()
    assert(dataRows() === rows1)
    // bookkeeping: a stale replay regresses nothing
    val stale = ExtractPipeline.withStationDims(
      ExtractPipeline.withSeriesIds(
        ExtractPipeline.channelSeries(spark, s"$dir/HYCHAN.OUT",
          "2024-01-01 00:00:00", chanMap, valueIndex = 1,
          cutoff = Some("2024-01-01 07:00:00"), utcOffset = "+05:30"),
        "flo2d_150_v2", "daily_run", "2023-06-01 00:00:00"),
      stations)
    ExtractPipeline.updateRunTableFull(stale, url, "run", dims)
    assert(runRows() === reg1, "stale fgt must not regress the run table")
    // init: get-or-insert, same ids on re-run
    initOnce()
    assert(FcstDims.outputStations(url, "flo2d_150_v2") === stations)
  }
}
