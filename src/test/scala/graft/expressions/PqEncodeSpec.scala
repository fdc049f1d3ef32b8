package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

/** The fused pq_encode expression must be bit-identical to the relational
  * `transform(sequence, c -> struct(vec_l2(slice(vec,…)), c))` argmin it
  * replaces — including sqrt'd-distance tie-breaks (duplicated centroids),
  * the signed-byte wrap for codes ≥ 128, and short/NULL vectors — under
  * both interpreted eval and whole-stage codegen. */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8
  private val vecs: Seq[(Long, Seq[Float])] = (0L until 120L).map { i =>
    val r = new scala.util.Random(31 + i)
    i -> Seq.fill(Dim)(r.nextFloat() * 2 - 1)
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  private def relational(codebooks: Array[Array[Seq[Float]]]): Map[Long, Seq[Byte]] = {
    val m = codebooks.length
    val ds = Dim / m
    val codeCols = (0 until m).map { j =>
      val cbLit = typedlit(codebooks(j).toSeq)
      val sub = slice(col("embedding"), j * ds + 1, ds)
      val best = array_min(transform(
        sequence(lit(0), lit(codebooks(j).length - 1)),
        c => struct(
          VectorFunctions.l2(sub, element_at(cbLit, c + 1)).as("d"),
          c.as("i"))))
        .getField("i")
      when(best > 127, best - 256).otherwise(best).cast("tinyint")
    }
    df.select(col("vec_id"), array(codeCols: _*).as("pq_code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
  }

  private def fused(codebooks: Array[Array[Seq[Float]]]): Map[Long, Seq[Byte]] =
    graft.ann.Similarity.withPqCodes(df, "embedding", Dim, codebooks)
      .select("vec_id", "pq_code")
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap

  private def books(m: Int, nCodes: Int, seed: Int): Array[Array[Seq[Float]]] = {
    val r = new scala.util.Random(seed)
    Array.fill(m)(Array.fill(nCodes)(Seq.fill(Dim / m)(r.nextFloat() * 2 - 1)))
  }

  test("pq_encode equals the relational argmin across shapes") {
    for ((m, n) <- Seq((2, 4), (4, 16), (8, 3))) {
      val cb = books(m, n, 100 * m + n)
      assert(fused(cb) == relational(cb), s"m=$m nCodes=$n")
    }
  }

  test("ties break to the lowest code index in both paths") {
    // codebook with every centroid duplicated: argmin distance always ties
    val base = books(2, 3, 7)
    val dup = base.map(cb => cb.flatMap(c => Array(c, c)))
    val f = fused(dup)
    assert(f == relational(dup))
    // winners must be even indices: the first copy of each duplicated pair
    assert(f.values.forall(_.forall(b => (b & 0xFF) % 2 == 0)))
  }

  test("codes >= 128 wrap; interpreted eval matches codegen; short/NULL vectors are NULL") {
    val cb = books(2, 200, 11)
    val f = fused(cb)
    assert(f == relational(cb))
    // interpreted path (direct eval, no codegen)
    val flat = new Array[Float](200 * Dim)
    for (j <- 0 until 2; c <- 0 until 200; i <- 0 until 4)
      flat((j * 200 + c) * 4 + i) = cb(j)(c)(i)
    val e = PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head._2, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      Dim, 2, 200, flat)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until 2).map(got.getByte) == f(0L))
    // short vector -> NULL
    val short = PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      Dim, 2, 200, flat)
    assert(short.eval(null) == null)
  }
}
