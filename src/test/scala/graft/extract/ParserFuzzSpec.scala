package graft.extract

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Fuzz the FLO-2D block parsers: arbitrary garbage interleaved with valid
  * structure must never crash the plan (ANSI mode is on — every cast in the
  * parsers must be a try_cast), never emit a row from garbage, and always
  * emit exactly the rows the valid fragments define. */
class ParserFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  private val garbageGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(40)),
    Gen.const(""),
    Gen.const("   "),
    Gen.const("NaN NaN NaN"),
    Gen.const("1.5"), // numeric but wrong arity
    Gen.const("TIME = abc"), // marker-like but unparseable payload
    Gen.listOfN(3, Gen.chooseNum(-1e9, 1e9)).map(_.mkString("  ")))

  private def linesDf(lines: Seq[String]) =
    FloOutputParsers.fromOrderedLines(
      lines.zipWithIndex.map { case (l, i) => ("f", i.toLong, l) }
        .toDF("file", "line_no", "line"))

  // numeric garbage INSIDE an open block is indistinguishable from data by
  // design (the reference accepts any numeric row there too) - so strict
  // row-count checks use non-numeric garbage after the header, and numeric
  // garbage goes before it, where no block is open yet
  private val nonNumericGarbage: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map(_.take(30)), Gen.const(""), Gen.const("   "),
    Gen.const("NaN NaN NaN"), Gen.const("TIME = abc"))

  test("HYCHAN parser survives garbage and keeps only well-formed data rows") {
    val valid = Seq(
      "     CHANNEL HYDROGRAPH FOR ELEMENT NO:    123",
      "      1.00   11.00   1.10    4.40    0.0",
      "      2.00   12.00   1.20    4.80    0.0")
    val lines = sample(garbageGen, 120) ++ valid ++ sample(nonNumericGarbage, 60)
    val out = FloOutputParsers.parseHychan(linesDf(lines), valueIndex = 1)
    val rows = out.collect()
    assert(rows.length == 2, s"expected the 2 valid rows, got ${rows.length}")
    assert(rows.forall(_.getAs[String]("element") == "123"))
  }

  test("TIMDEP parser survives garbage blocks") {
    val valid = Seq(
      "   1.50",
      "     10   1.1   2.2   3.3   4.4   5.5",
      "     11   1.1   2.2   3.3   4.4   6.6")
    val lines = sample(garbageGen, 120) ++ valid ++ sample(nonNumericGarbage, 60)
    val out = FloOutputParsers.parseTimdep(linesDf(lines))
    val rows = out.collect()
    // rows attach to the nearest preceding single-token time marker; the
    // two valid cells must survive with their block time and col-5 value
    assert(rows.exists(r => r.getAs[String]("element") == "10"
      && r.getAs[Double]("value") == 5.5))
    assert(rows.exists(r => r.getAs[String]("element") == "11"
      && r.getAs[Double]("value") == 6.6))
  }
}
