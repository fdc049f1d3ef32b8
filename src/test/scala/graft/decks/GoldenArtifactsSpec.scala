package graft.decks

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec

/** Byte-level reproduction of the reference's checked-in golden artifacts —
  * res/flo2d_150_v2/{INFLOW,OUTFLOW,CHAN}.DAT, which SURVEY.md §5 identifies
  * as the de-facto expected outputs of the deck generators.
  *
  * Method: the time series / body values are recovered FROM each artifact
  * (they are the only record of the data that produced it), pushed through
  * the real distributed deck pipelines in the artifacts' archived dialect
  * (`resHRow` / `linesRes` / `resBodyRow`), and compared line-by-line:
  *
  *  - INFLOW and OUTFLOW: BYTE equality on every line.
  *  - CHAN: byte equality on every generated body row; head/tail template
  *    passthrough modulo trailing blanks — the archived file carries
  *    trailing spaces its own chan_150_v2_{head,tail}.dat templates lack
  *    (documented trailing-space rule).
  */
class GoldenArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private val res = "/root/reference/res/flo2d_150_v2"
  private val chanTpl = "/root/reference/input/chan"

  private def fileLines(path: String): Seq[String] = {
    val raw = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    // keep interior empties, drop only the final newline's phantom segment
    val segs = raw.split("\n", -1).toSeq
    if (segs.nonEmpty && segs.last.isEmpty) segs.dropRight(1) else segs
  }

  private def render(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("section", "seq").select("line").collect().map(_.getString(0)).toSeq

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def atHours(h: Double) = new Timestamp(base + (h * 3600000L).toLong)

  test("INFLOW.DAT golden: 117 hourly H rows reproduce the artifact byte-for-byte") {
    val gl = fileLines(s"$res/INFLOW.DAT")
    assert(gl.length === 120)
    val head = gl.take(3)
    // recover (elapsed_h, value) from the artifact's own H rows
    val data = gl.drop(3).map { l =>
      val t = l.split("\\s+"); (t(1).toDouble, t(2).toDouble)
    }
    assert(data.length === 117)
    // anchor row at t0 (value irrelevant — W3 skips it, it only pins t0)
    val series = ((0.0, 0.0) +: data)
      .map { case (h, v) => (atHours(h), v) }
      .toDF("time", "value")
    val out = render(InflowDeck.lines(spark, series, head, InflowDeck.resHRow))
    assert(out === gl)
  }

  test("OUTFLOW.DAT golden: K/N/S blocks + template tail reproduce the artifact byte-for-byte") {
    val gl = fileLines(s"$res/OUTFLOW.DAT")
    assert(gl.length === 607)
    val kCells = gl.filter(_.startsWith("K")).map(_.split("\\s+")(1))
    assert(kCells === Seq("268", "391", "464", "1174"))
    // N rows open boundary blocks in block_order; following S rows belong
    // to that boundary (rn, value)
    var cell = ""
    var order = -1
    val boundariesB = Seq.newBuilder[(Int, String)]
    val tidesB = Seq.newBuilder[(String, Timestamp, Double)]
    gl.foreach { l =>
      if (l.startsWith("N")) {
        cell = l.split("\\s+")(1); order += 1
        boundariesB += ((order, cell))
      } else if (l.startsWith("S")) {
        val t = l.split("\\s+")
        tidesB += ((cell, atHours(t(1).toDouble), t(2).toDouble))
      }
    }
    val boundaries = boundariesB.result().toDF("block_order", "cell")
    val tides = tidesB.result().toDF("cell", "time", "value")
    assert(tides.count() === 484) // 4 boundaries × 121 hourly points
    // the artifact's O-row tail IS the reference's tail template
    // (gen_outflow.py:250-255 appends input/outflow/tail_150_v2.txt)
    val tail = fileLines("/root/reference/input/outflow/tail_150_v2.txt")
    assert(gl.filter(_.startsWith("O")) === tail)
    val out = render(OutflowDeck.linesRes(spark, boundaries, tides, kCells, tail))
    assert(out === gl)
  }

  test("CHAN.DAT golden: template head/tail + generated body reproduce the artifact") {
    val gl = fileLines(s"$res/CHAN.DAT")
    assert(gl.length === 1035)
    val head = fileLines(s"$chanTpl/chan_150_v2_head.dat")
    val tail = fileLines(s"$chanTpl/chan_150_v2_tail.dat")
    val tplPairs = fileLines(s"$chanTpl/chan_150_v2_body.dat").map(_.split("\\s+")(0))
    val nBody = tplPairs.length
    // recover body values from the artifact (initial conditions observed at
    // generation time — the artifact is their only record); cells must match
    // the template's pair order
    val bodyRe = """ (\S+)    (\S+)""".r
    val bodyVals = gl.slice(head.length, head.length + nBody).map {
      case bodyRe(c, v) => (c, if (v.startsWith(".")) "0" + v else v)
      case other => fail(s"unparseable CHAN body row: '$other'")
    }
    assert(bodyVals.map(_._1) === tplPairs)
    val bodyPairs = bodyVals.grouped(2).zipWithIndex.map { case (Seq(u, d), i) =>
      (i, u._1, u._2, d._1, d._2)
    }.toSeq.toDF("pair_idx", "up", "up_default", "down", "down_default")
    // no DB: every wl_id lookup misses, defaults pass through (gen_chan.py
    // J6 coalesce), so defaults = the recovered values
    val conditions = Seq.empty[(String, String, String)]
      .toDF("grid_id", "wl_id", "wl_id_dwn")
    val obsFirstWl = Seq.empty[(String, String)].toDF("wl_id", "wl")
    val out = render(ChanDeck.lines(spark, "flo2d_150_v2", bodyPairs, conditions,
      obsFirstWl, head, tail, ChanDeck.resBodyRow))
    assert(out.length === gl.length)
    // generated body rows: byte-exact
    assert(out.slice(head.length, head.length + nBody) ===
      gl.slice(head.length, head.length + nBody))
    // template passthrough: equal modulo the artifact's trailing blanks
    out.zip(gl).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.replaceAll("\\s+$", "") === b.replaceAll("\\s+$", ""),
        s"line $i differs beyond trailing spaces")
    }
  }

  test("INFLOW head constants: three model variants match the reference generators") {
    // reference: gen_150_inflow.py:102-104, gen_150_v2_inflow.py:105-107,
    // gen_250_inflow.py:122-124 — header cells as data, per model
    assert(InflowConfig.headLinesFor("flo2d_150") === Seq(
      "0           41550",
      "C               0           41550",
      "H               0               0"))
    assert(InflowConfig.headLinesFor("flo2d_150_v2") === Seq(
      "0           37814",
      "C               0           37814",
      "H               0               0"))
    assert(InflowConfig.headLinesFor("flo2d_250") === Seq(
      "0               0",
      "C               0            8655",
      "H               0               0"))
    val ex = intercept[IllegalArgumentException](InflowConfig.headLinesFor("flo2d_9"))
    assert(ex.getMessage.contains("unknown FLO-2D model"))
    // deck rendering picks the model's head: first lines of each variant
    // value stays on the repo's determinism rule: 1-decimal input at %.1f,
    // where Java HALF_UP and C half-even render identically (x.25-style
    // inputs at %.1f would diverge: Java "2.3" vs C/Python "2.2")
    val s = Seq((atHours(0.0), 1.0), (atHours(1.0), 2.2)).toDF("time", "value")
    Seq("flo2d_150", "flo2d_150_v2", "flo2d_250").foreach { m =>
      val out = render(InflowDeck.linesFor(spark, s, m))
      assert(out.take(3) === InflowConfig.headLinesFor(m))
      assert(out.drop(3) === Seq("H             1.0             2.2"))
    }
  }
}
