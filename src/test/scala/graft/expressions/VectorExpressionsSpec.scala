package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Custom codegen'd vector expressions: results vs hand computation, float
  * and double element types, degenerate inputs, and interpreted-path
  * agreement (the same expressions run with whole-stage codegen disabled). */
class VectorExpressionsSpec extends SparkSpec {
  // conf-mutating suite: isolated session (see TestSession.isolated)
  override lazy val spark: org.apache.spark.sql.SparkSession =
    graft.TestSession.isolated()
  import spark.implicits._

  private val fdf = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)),          // zero norm left
    (3L, Seq(1.0f, 1.0f, 1.0f, 9.0f), Seq(2.0f, 3.0f)) // length mismatch → min len
  ).toDF("id", "a", "b")

  private def run(codegen: Boolean): Map[Long, (Double, Double, Double)] = {
    spark.conf.set("spark.sql.codegen.wholeStage", codegen)
    try fdf.select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("dot"),
        VectorFunctions.cosine(col("a"), col("b")).as("cos"),
        VectorFunctions.l2(col("a"), col("b")).as("l2"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    finally spark.conf.set("spark.sql.codegen.wholeStage", true)
  }

  test("dot/cosine/l2 on float arrays match hand computation") {
    val m = run(codegen = true)
    assert(m(1L)._1 === 32.0) // 4+10+18
    val cosExpected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(m(1L)._2 - cosExpected) < 1e-12)
    assert(math.abs(m(1L)._3 - math.sqrt(27.0)) < 1e-12)
  }

  test("zero-norm vectors give cosine 0, not NaN") {
    assert(run(codegen = true)(2L)._2 === 0.0)
  }

  test("length mismatch uses the common prefix") {
    val m = run(codegen = true)
    assert(m(3L)._1 === 5.0) // 1*2 + 1*3
  }

  test("interpreted eval (codegen off) agrees bit-for-bit with codegen") {
    assert(run(codegen = false) === run(codegen = true))
  }

  test("double arrays are accepted too") {
    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).head.getDouble(0)
    assert(d === 11.0)
  }

  test("null input propagates null") {
    val r = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("bitsHex: exact IEEE bits, fixed width, injective, both elem types") {
    def hexOf(v: Seq[Float]): String =
      Seq(Tuple1(v)).toDF("v").select(VectorFunctions.bitsHex(col("v")))
        .head.getString(0)
    // 1.0f = 0x3f800000, -2.5f = 0xc0200000, 0.0f = 0x00000000
    assert(hexOf(Seq(1.0f, -2.5f, 0.0f)) === "3f800000c0200000" + "0" * 8)
    // fixed width ⇒ [1.0] and [1.0, 0.0] differ; -0.0 and 0.0 differ by bits
    assert(hexOf(Seq(1.0f)) !== hexOf(Seq(1.0f, 0.0f)))
    assert(hexOf(Seq(-0.0f)) === "80000000")
    // NaN canonicalizes (floatToIntBits): any NaN payload → one pattern
    assert(hexOf(Seq(Float.NaN)) ===
      hexOf(Seq(java.lang.Float.intBitsToFloat(0x7fc00001))))
    // doubles use 16 hex chars
    val d = Seq(Tuple1(Seq(1.0))).toDF("v")
      .select(VectorFunctions.bitsHex(col("v"))).head.getString(0)
    assert(d === "3ff0000000000000")
    // null vector → null; interpreted agrees with codegen
    val r = Seq(Tuple1(Option.empty[Seq[Float]])).toDF("v")
      .select(VectorFunctions.bitsHex(col("v"))).head
    assert(r.isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", false)
    try assert(hexOf(Seq(1.5f, -1.5f)) === "3fc00000bfc00000")
    finally spark.conf.set("spark.sql.codegen.wholeStage", true)
  }
}
