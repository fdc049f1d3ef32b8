package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout (E81): key correctness against a local bit-interleave
  * model, and the CLAIM the layout exists for — range-partitioning by the
  * Z-key yields files tight on BOTH dimensions, where a single-column sort
  * is tight on one and full-width on the other. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def localZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zOrderKey equals the local bit-interleave model") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (255L, 255L), (170L, 85L))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Layout.zOrderKey(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case ((a, b), z) =>
      assert(z == localZ(a, b, 8), s"($a,$b)")
    }
    // canonical small cases: z(1,0)=1 (a on even bits), z(0,1)=2 (b on odd)
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L)
  }

  test("zOrderKey masks out-of-range and NEGATIVE inputs to the low bits — no sign-extension garbage") {
    // pre-mask, an arithmetic shiftright on a negative long sign-extended
    // ones into every interleaved position; now -1 folds to 255, -256 to 0
    val df = Seq((-1L, 0L), (-256L, 7L), (256L, 3L), (-1L, -1L))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Layout.zOrderKey(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((-1L, 0L)) == localZ(255L, 0L, 8))
    assert(got((-256L, 7L)) == localZ(0L, 7L, 8))
    assert(got((256L, 3L)) == localZ(0L, 3L, 8))
    assert(got((-1L, -1L)) == localZ(255L, 255L, 8))
    // and every key stays inside the 2·bits-bit range
    assert(got.values.forall(z => z >= 0 && z < (1L << 16)))
  }

  test("Z-sorted chunks are tight on BOTH dims; single-dim sort is full-width on the other") {
    // a 32x32 grid, one row per cell
    val grid = (0 until 1024).map(i => (i.toLong % 32, i.toLong / 32)).toDF("a", "b")
    def chunkRanges(sorted: Seq[(Long, Long)]): Seq[(Long, Long)] =
      sorted.grouped(64).map { c =>
        (c.map(_._1).max - c.map(_._1).min, c.map(_._2).max - c.map(_._2).min)
      }.toSeq
    val byZ = grid.select(col("a"), col("b"),
        Layout.zOrderKey(col("a"), col("b"), 5).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byA = grid.orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val zR = chunkRanges(byZ)
    val aR = chunkRanges(byA)
    // 64 consecutive Z values = one 8x8 block: range 7 in each dimension
    assert(zR.forall { case (ra, rb) => ra <= 7 && rb <= 7 },
      s"z chunks must be 8x8 blocks: $zR")
    // a-sorted chunks cover 2 full columns: b spans the whole 0..31 width
    assert(aR.forall(_._2 == 31), s"single-dim chunks are full-width on b: $aR")
  }
}
