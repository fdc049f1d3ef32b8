package graft.decks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Sentinels
import graft.ops.TimeSeriesOps

/** FLO-2D input-deck generators — SURVEY.md §2 K1/X4-X6, §7 step 5.
  *
  * Each deck is a pure `DataFrame → DataFrame(section, seq, line)` pipeline:
  * `section` orders the head/body/tail parts, `seq` orders lines within a
  * section, `line` is the exact fixed-width text. The ordered write itself is
  * `graft.io.OrderedTextSink` — decks never collect data to the driver, so
  * the same pipeline serves a 39k-cell basin or a 100×-denser grid.
  */
object DeckFormat {
  def ljust(c: Column, n: Int): Column = rpad(c, n, " ")
  def rjust(c: Column, n: Int): Column = lpad(c, n, " ")
  /** `'%.Nf' %` — the reference's ubiquitous fixed-point format (X4). */
  def fixed(c: Column, decimals: Int): Column =
    format_string(s"%.${decimals}f", c.cast("double"))

  /** `str(float)`-style rendering used by the archived golden artifacts
    * (reference: res/flo2d_150_v2/INFLOW.DAT values like `1.593`, `54.22`,
    * `0.0`): fixed-point with trailing zeros trimmed, at least one decimal
    * kept. Exact for values with ≤ `decimals` decimal places. */
  def trimmedFixed(c: Column, decimals: Int): Column = {
    val t = regexp_replace(fixed(c, decimals), "0+$", "")
    when(t.endsWith("."), concat(t, lit("0"))).otherwise(t)
  }

  /** Literal head/tail lines as an ordered one-section DataFrame. */
  def literalLines(spark: SparkSession, section: Int, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.zipWithIndex
      .map { case (l, i) => (section, i.toLong, l) }
      .toDF("section", "seq", "line")
  }

  /** Stitch sections into one ordered deck frame. */
  def stitch(sections: DataFrame*): DataFrame =
    sections.reduce(_ unionByName _)
}

/** RAIN.DAT — cumulative rain fraction curve
  * (reference: input/rain/gen_rain.py:138-193).
  *
  * Pipeline: dense 5-min grid (J1) → left-join series → drop missing →
  * right-closed 15-min resample when the model is a 150 variant (A2) →
  * negatives dropped (F5) → cumulative sum (A4) normalized by the total
  * (A3/A5) → `R<time.3f ljust14><frac.3f> ` lines with the two-line totals
  * header. One shuffle (grid join) + one window sort.
  */
object RainDeck {
  def lines(spark: SparkSession, series: DataFrame, startTime: String, endTime: String,
      targetModel: String, tiebreak: Seq[String] = Nil): DataFrame =
    linesMany(spark, series.withColumn("deck_id", lit("0")), startTime, endTime, targetModel,
      tiebreak)
      .drop("deck_id")

  /** Multi-deck form: `series` carries a `deck_id` column and the result is
    * (deck_id, section, seq, line). Every window and aggregate partitions by
    * deck_id, so generating N basins' decks in one job spreads across N
    * tasks instead of funneling the union through a single unpartitioned
    * WindowExec — the per-deck sequential cumsum is inherent (one file, one
    * running total), the cross-deck serialization is not. */
  def linesMany(spark: SparkSession, series: DataFrame, startTime: String, endTime: String,
      targetModel: String, tiebreak: Seq[String] = Nil): DataFrame = {
    import DeckFormat._
    val grid = TimeSeriesOps.timeGrid(spark, startTime, endTime, 5)
    val decks = series.select("deck_id").distinct()
    val aligned = grid.crossJoin(decks)
      .join(series, Seq("deck_id", "time"), "left").na.drop(Seq("value"))
    val stepped =
      if (targetModel == "flo2d_150" || targetModel == "flo2d_150_v2")
        TimeSeriesOps.resampleRightClosedSum(aligned, 900, keys = Seq("deck_id"))
      else aligned
    val clean = TimeSeriesOps.dropNegatives(stepped)
    // `tiebreak` gives the cumsum and line numbering a total order when the
    // input carries duplicate (deck_id, time) rows — without it, seq
    // assignment (and the intermediate cum values) would be shuffle-order
    // dependent, the determinism rule every other window here follows.
    // The 150 resample path collapses duplicates by aggregation, so the
    // tiebreak column need not survive it: ordering applies to what remains.
    val tieCols = tiebreak.filter(stepped.columns.contains)
    val frac = TimeSeriesOps.normalizedCumulative(
      clean, "value", "time", Seq("deck_id"), "frac", tieCols)
    val withElapsed = frac.withColumn("elapsed_h",
      (unix_micros(col("time")) - lit(graft.model.SlTime.microsOf(startTime))) / lit(3.6e9))
    val rRows = withElapsed.select(
      col("deck_id"),
      lit(1).as("section"),
      row_number().over(Window.partitionBy("deck_id")
          .orderBy(("time" +: tieCols).map(col(_).asc): _*))
        .cast("long").as("seq"),
      concat(lit("R              "),
        ljust(fixed(col("elapsed_h"), 3), 14),
        fixed(col("frac"), 3), lit(" ")).as("line"))
    // header: " 0             0 " then " {total:.3f}         5             0             0 "
    // (reference: input/rain/gen_rain.py:188-191, note insert-at-0 order);
    // posexplode supplies the 0/1 seq — no window needed. Decks whose rows
    // all dropped still get a header (0.0 total) via the left join.
    val header = decks
      .join(clean.groupBy("deck_id").agg(sum("value").as("total")), Seq("deck_id"), "left")
      .select(col("deck_id"), posexplode(array(
        lit(" 0             0 "),
        concat(lit(" "), fixed(coalesce(col("total"), lit(0.0)), 3),
          lit("         5             0             0 ")))).as(Seq("seq0", "line")))
      .select(col("deck_id"), lit(0).as("section"),
        col("seq0").cast("long").as("seq"), col("line"))
    stitch(header, rRows)
  }
}

/** Per-model INFLOW header constants as DATA. The reference hardcodes these
  * inside each generator (150: input/inflow/gen_150_inflow.py:102-104,
  * 150_v2: input/inflow/gen_150_v2_inflow.py:105-107, 250:
  * input/inflow/gen_250_inflow.py:122-124) — so the 150 vs 150_v2 header
  * difference (41550 vs 37814) lives in code paths there; here every model
  * is one table entry, overridable from a JSON config file shaped like the
  * reference's input/inflow/config_*.json with a `head_lines` array added. */
object InflowConfig {
  val headLines: Map[String, Seq[String]] = Map(
    "flo2d_150" -> Seq(
      "0           41550",
      "C               0           41550",
      "H               0               0"),
    "flo2d_150_v2" -> Seq(
      "0           37814",
      "C               0           37814",
      "H               0               0"),
    "flo2d_250" -> Seq(
      "0               0",
      "C               0            8655",
      "H               0               0"))

  def headLinesFor(model: String): Seq[String] =
    headLines.getOrElse(model,
      throw new IllegalArgumentException(
        s"unknown FLO-2D model '$model' (known: ${headLines.keys.mkString(", ")})"))

  /** Load `{"head_lines": [...]}` from a JSON config, falling back to the
    * built-in table when the file has no such key. */
  def headLinesFromJson(spark: SparkSession, path: String, model: String): Seq[String] = {
    val df = spark.read.option("multiLine", "true").json(path)
    if (df.columns.contains("head_lines"))
      df.select("head_lines").head().getSeq[String](0)
    else headLinesFor(model)
  }
}

/** INFLOW.DAT — discharge hydrograph `H` rows
  * (reference: input/inflow/gen_150_inflow.py:90-115).
  *
  * First series row only anchors t0 and emits the fixed `H 0 0` (W3); data
  * rows are `'H' + %.1f(elapsed_h).rjust(16) + %.1f(value).rjust(16)` (W1/X3).
  *
  * Row dialects: `genHRow` is the generators' format above; `resHRow` is the
  * archived-artifact dialect of res/flo2d_150_v2/INFLOW.DAT (`'H' + 13
  * spaces + %.1f(elapsed).ljust(14) + str(value)`), byte-verified against
  * that golden file in GoldenArtifactsSpec. */
object InflowDeck {
  import DeckFormat._

  /** gen_150_inflow.py:107-110 format. */
  val genHRow: (Column, Column) => Column = (elapsedH, value) =>
    concat(lit("H"), rjust(fixed(elapsedH, 1), 16), rjust(fixed(value, 1), 16))

  /** res/flo2d_150_v2/INFLOW.DAT archived dialect. */
  val resHRow: (Column, Column) => Column = (elapsedH, value) =>
    concat(lit("H" + " " * 13), ljust(fixed(elapsedH, 1), 14), trimmedFixed(value, 3))

  /** Model-keyed convenience: header constants from [[InflowConfig]]. */
  def linesFor(spark: SparkSession, series: DataFrame, model: String): DataFrame =
    lines(spark, series, InflowConfig.headLinesFor(model))

  /** flo2d_250 variant (reference: input/inflow/gen_250_inflow.py:119-133):
    * different header cells and two trailing `R` rows — the observed water
    * level at cell 2265 (first obs in [start, start+10h], default 0.5) and
    * a fixed 6.6 at cell 3559. */
  def lines250(spark: SparkSession, series: DataFrame, obsWl: Option[Double]): DataFrame = {
    import DeckFormat._
    val base = lines(spark, series, InflowConfig.headLinesFor("flo2d_250"))
    val wl = obsWl.getOrElse(0.5)
    val wlStr = if (wl == wl.toLong.toDouble) s"${wl.toLong}.0" else wl.toString
    val tail = literalLines(spark, 2, Seq(
      "R            2265" + " " * (16 - wlStr.length) + wlStr,
      "R            3559             6.6"))
    stitch(base, tail)
  }

  def lines(spark: SparkSession, series: DataFrame,
      headLines: Seq[String] = InflowConfig.headLinesFor("flo2d_150"),
      hRow: (Column, Column) => Column = genHRow,
      tiebreak: Seq[String] = Nil): DataFrame =
    linesMany(spark, series.withColumn("deck_id", lit("0")), headLines, hRow, tiebreak)
      .drop("deck_id")

  /** Multi-deck form: `series` carries a `deck_id` column; windows partition
    * by it so N inflow decks generate in parallel in one job (the anchor min
    * and row numbering are per-deck state, not global). `tiebreak` extends
    * the line-numbering order past `time` so duplicate timestamps still
    * produce a deterministic deck (sessionize's contract). */
  def linesMany(spark: SparkSession, series: DataFrame,
      headLines: Seq[String],
      hRow: (Column, Column) => Column = genHRow,
      tiebreak: Seq[String] = Nil): DataFrame = {
    import DeckFormat._
    val byDeck = Window.partitionBy("deck_id")
    val anchored = series
      .withColumn("rn", row_number().over(
        byDeck.orderBy(("time" +: tiebreak).map(col(_).asc): _*)))
      .withColumn("elapsed_h",
        (unix_micros(col("time")) - min(unix_micros(col("time"))).over(byDeck))
          / lit(3.6e9))
      .filter(col("rn") > 1)
    val hRows = anchored.select(
      col("deck_id"),
      lit(1).as("section"), col("rn").cast("long").as("seq"),
      hRow(col("elapsed_h"), col("value")).as("line"))
    val heads = series.select("deck_id").distinct()
      .select(col("deck_id"),
        posexplode(typedlit(headLines.toSeq)).as(Seq("seq0", "line")))
      .select(col("deck_id"), lit(0).as("section"),
        col("seq0").cast("long").as("seq"), col("line"))
    stitch(heads, hRows)
  }
}

/** OUTFLOW.DAT — per-boundary tidal `S` rows under `K`/`N` headers
  * (reference: input/outflow/gen_outflow.py:95-135, 226-249).
  *
  * `boundaries` = (block_order INT, cell STRING); `tides` = (cell, time,
  * value) raw per-boundary series. The elapsed-hours anchor is the FIRST raw
  * row (sentinels included — reference anchors `tide_ts[0][0]` before the
  * −99999 skip); sentinel rows are then dropped (F3). Four small per-boundary
  * frames union into one deck (§2.7).
  */
object OutflowDeck {
  def lines(spark: SparkSession, boundaries: DataFrame, tides: DataFrame,
      kCells: Seq[String], tiebreak: Seq[String] = Nil): DataFrame = {
    import DeckFormat._
    val kSection = DeckFormat.literalLines(spark, 0,
      kCells.map(c => "K" + " " * (16 - c.length) + c))
    val nLines = boundaries.select(
      lit(1).as("section"),
      (col("block_order").cast("long") * 1000000L).as("seq"),
      concat(lit("N"), rjust(col("cell"), 16), rjust(lit("1"), 16)).as("line"))
    val anchor = Window.partitionBy("cell")
    val sRows = tides
      .withColumn("t0_us", min(unix_micros(col("time"))).over(anchor))
      .withColumn("rn", row_number().over(Window.partitionBy("cell")
        .orderBy(("time" +: tiebreak).map(col(_).asc): _*)))
      // exact double equality, like the reference's `== -99999` — an int
      // cast would also drop legitimate values truncating to -99999
      .filter(col("value") =!= lit(Sentinels.InvalidTide))
      .join(boundaries, Seq("cell"))
      .select(
        lit(1).as("section"),
        (col("block_order").cast("long") * 1000000L + col("rn")).as("seq"),
        concat(lit("S"),
          rjust(fixed((unix_micros(col("time")) - col("t0_us")) / lit(3.6e9), 3), 16),
          rjust(fixed(col("value"), 3), 16)).as("line"))
    stitch(kSection, nLines, sRows)
  }

  /** Archived-artifact dialect of res/flo2d_150_v2/OUTFLOW.DAT (byte-verified
    * in GoldenArtifactsSpec): K/N cells left-aligned after 14 spaces, S rows
    * numbered 1..n per boundary with `str(float)`-trimmed values and a
    * trailing space, and the literal template tail (the reference appends
    * input/outflow/tail_150_v2.txt, gen_outflow.py:250-255). Sentinel rows
    * are dropped before numbering, so emitted S rows stay contiguous. */
  def linesRes(spark: SparkSession, boundaries: DataFrame, tides: DataFrame,
      kCells: Seq[String], tailLines: Seq[String],
      tiebreak: Seq[String] = Nil): DataFrame = {
    import DeckFormat._
    val kSection = DeckFormat.literalLines(spark, 0,
      kCells.map(c => "K" + " " * 14 + c))
    val nLines = boundaries.select(
      lit(1).as("section"),
      (col("block_order").cast("long") * 1000000L).as("seq"),
      concat(lit("N" + " " * 14), ljust(col("cell"), 14), lit("1 ")).as("line"))
    val sRows = tides
      .filter(col("value") =!= lit(Sentinels.InvalidTide))
      .withColumn("rn", row_number().over(Window.partitionBy("cell")
        .orderBy(("time" +: tiebreak).map(col(_).asc): _*)))
      .join(boundaries, Seq("cell"))
      .select(
        lit(1).as("section"),
        (col("block_order").cast("long") * 1000000L + col("rn")).as("seq"),
        concat(lit("S" + " " * 14), ljust(col("rn").cast("string"), 14),
          trimmedFixed(col("value"), 3), lit(" ")).as("line"))
    stitch(kSection, nLines, sRows, literalLines(spark, 2, tailLines))
  }
}

/** Boundary-cell → tide-grid dict from the reference's outflow config JSON
  * (reference: input/outflow/config_150_v2.json, gen_outflow.py:226-249).
  * The dict's INSERTION order is the deck's block order — the reference
  * emits N blocks in iteration order of `tide_config_dict` — so parsing
  * goes through Jackson's order-preserving node tree, not a Spark JSON
  * scan (driver-side, dimension-sized: a handful of boundary cells). */
object OutflowConfig {
  /** (block_order, cell, tide_id) rows for `configKey`
    * (e.g. "tide_ids_150_v2"). */
  def boundariesFromJson(spark: SparkSession, path: String,
      configKey: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val node = root.get(configKey)
    require(node != null && node.isObject,
      s"outflow config '$path' has no object at key '$configKey' " +
        s"(available: ${root.fieldNames.asScala.mkString(", ")})")
    import spark.implicits._
    node.fields.asScala.zipWithIndex
      .map { case (e, i) => (i, e.getKey, e.getValue.asText) }
      .toSeq.toDF("block_order", "cell", "tide_id")
  }

  /** Re-key a (cell=tide_id, time, value) tide series to boundary cells:
    * each boundary gets its own copy of its tide station's series, exactly
    * as the reference calls prepare_tide_data_set once per boundary with
    * the dict's grid id (gen_outflow.py:231-249). Broadcast join — the
    * config side is a handful of rows. */
  def tidesForBoundaries(tides: DataFrame, boundaries: DataFrame): DataFrame = {
    val dim = boundaries.select(col("cell").as("__b_cell"), col("tide_id"))
    tides.join(broadcast(dim), tides("cell") === dim("tide_id"))
      .select(col("__b_cell").as("cell"), tides("time"), tides("value"))
  }
}

/** RAINCELL.DAT — per-timestep cell-rain blocks
  * (reference: input/raincell/gen_raincell.py:99-147).
  *
  * One range scan replaces the reference's one-proc-call-per-timestep loop
  * (S3): blocks are the right-closed timestep buckets, each cell row gets the
  * model's water-supply correction (X12), a blank line closes each block.
  * Ordered by (timestep, cell); the header carries timestep count and range.
  */
object RaincellDeck {
  def lines(spark: SparkSession, cells: DataFrame, startTime: String, endTime: String,
      targetModel: String): DataFrame = {
    import DeckFormat._
    val (stepMin, waterSupply) = targetModel match {
      case "flo2d_250" => (5, 1.0 / (24 * 12))
      case "flo2d_150" | "flo2d_150_v2" => (15, 1.0 / (24 * 4))
      case _ => (5, 1.0 / (24 * 12))
    }
    val length = ((graft.model.SlTime.microsOf(endTime) -
      graft.model.SlTime.microsOf(startTime)) / 60000000L / stepMin).toInt
    val header = DeckFormat.literalLines(spark, 0,
      Seq(s"$stepMin $length $startTime $endTime"))
    val stepped = cells
      .withColumn("step", TimeSeriesOps.bucketRightClosedTs(col("time"), stepMin * 60L))
      .filter(col("step") > lit(startTime).cast("timestamp") &&
        col("step") <= lit(endTime).cast("timestamp"))
    // seq = epoch-seconds * 4e6 + cell; the block-closing blank sits at the
    // reserved top slot 3,999,999, so cell ids up to 3,999,998 are safe
    // (150_v2 has 39,526 — res/grids/flo2d_150_v2m.csv) and Long holds
    // through epoch-seconds ~2.3e12 (year ~74,000). Oversized ids fail
    // loudly instead of silently corrupting block order.
    val guardedCell = when(col("cell_id").cast("long") >= 3999999L,
      raise_error(concat(lit("RaincellDeck: cell_id exceeds seq capacity (3,999,998): "),
        col("cell_id").cast("string"))).cast("long"))
      .otherwise(col("cell_id").cast("long"))
    val cellRows = stepped.select(
      lit(1).as("section"),
      (unix_seconds(col("step")) * 4000000L + guardedCell).as("seq"),
      concat(col("cell_id").cast("string"), lit(" "),
        fixed(col("value") + lit(waterSupply), 3)).as("line"))
    val blanks = stepped.select("step").distinct().select(
      lit(1).as("section"),
      (unix_seconds(col("step")) * 4000000L + 3999999L).as("seq"),
      lit("").as("line"))
    stitch(header, cellRows, blanks)
  }

}

/** CHAN.DAT — template head/tail around a generated body where each channel
  * node pair takes its observed initial water level if present, else the
  * template default (reference: input/chan/gen_chan.py:129-190, J6).
  *
  * `bodyPairs` = (pair_idx, up, up_default, down, down_default);
  * `conditions` = (grid_id, wl_id, wl_id_dwn) initial-condition lookup;
  * `obsFirstWl` = (wl_id, wl) first observed value in [start, start+2h]
  * per id (S4). All three are dimension-sized → broadcast joins.
  */
object ChanDeck {
  import DeckFormat._

  /** gen_chan.py:166-180 format: cell.ljust(6) + value.rjust(6). */
  val genBodyRow: (Column, Column) => Column = (cell, value) =>
    concat(ljust(cell, 6), rjust(value, 6))

  /** Archived-artifact dialect of res/flo2d_150_v2/CHAN.DAT body rows
    * (byte-verified in GoldenArtifactsSpec): `' ' + cell + 4 spaces + value`
    * with the leading zero of `0.x` values stripped (`.5`, `.798`). */
  val resBodyRow: (Column, Column) => Column = (cell, value) =>
    concat(lit(" "), cell, lit("    "), regexp_replace(value, "^0\\.", "."))

  def lines(spark: SparkSession, model: String, bodyPairs: DataFrame,
      conditions: DataFrame, obsFirstWl: DataFrame,
      headLines: Seq[String], tailLines: Seq[String],
      bodyRow: (Column, Column) => Column = genBodyRow): DataFrame = {
    val joined = bodyPairs
      .withColumn("grid_id",
        concat_ws("_", lit(model), col("up"), col("down")))
      .join(broadcast(conditions), Seq("grid_id"), "left")
      .join(broadcast(obsFirstWl.select(col("wl_id"), col("wl").as("up_wl"))),
        Seq("wl_id"), "left")
      .join(broadcast(obsFirstWl.select(col("wl_id").as("wl_id_dwn"),
        col("wl").as("down_wl"))), Seq("wl_id_dwn"), "left")
    // reference :163-178 — when no downstream id exists, the upstream
    // observation (if any) is written for BOTH nodes of the pair
    val upVal = coalesce(col("up_wl"), col("up_default").cast("string"))
    val downVal = when(col("wl_id_dwn").isNull, coalesce(col("up_wl"), col("down_default").cast("string")))
      .otherwise(coalesce(col("down_wl"), col("down_default").cast("string")))
    val body = joined.select(
      lit(1).as("section"),
      (col("pair_idx").cast("long") * 2).as("seq"),
      bodyRow(col("up"), upVal).as("line"))
      .unionByName(joined.select(
        lit(1).as("section"),
        (col("pair_idx").cast("long") * 2 + 1).as("seq"),
        bodyRow(col("down"), downVal).as("line")))
    stitch(literalLines(spark, 0, headLines), body, literalLines(spark, 2, tailLines))
  }
}
