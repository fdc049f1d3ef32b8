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

  /** The classic iterative xy2d (public reference algorithm) — the
    * driver-side model the unrolled state-table expression must match. */
  private def localHilbert(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertKey equals the classic xy2d model over a FULL grid; bijective; masks negatives") {
    val n = 32 // bits = 5, exhaustive
    val grid = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
      .toDF("a", "b")
    val got = grid.select(col("a"), col("b"),
        Layout.hilbertKey(col("a"), col("b"), 5).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    got.foreach { case ((a, b), h) =>
      assert(h == localHilbert(a, b, 5), s"($a,$b): got $h")
    }
    // a space-filling curve is a bijection onto [0, n^2)
    assert(got.map(_._2).toSet === (0L until (n.toLong * n)).toSet)
    // ADJACENCY — the property z-order lacks: consecutive keys are grid
    // neighbors (|Δa| + |Δb| == 1), every single step of the traversal
    val byKey = got.map { case (ab, h) => h -> ab }.toMap
    (0L until n.toLong * n - 1).foreach { h =>
      val (a1, b1) = byKey(h); val (a2, b2) = byKey(h + 1)
      assert(math.abs(a1 - a2) + math.abs(b1 - b2) == 1,
        s"keys $h->${h + 1} jump from ($a1,$b1) to ($a2,$b2)")
    }
    // negative / out-of-range inputs mask onto the low bits like zOrderKey
    val masked = Seq((-1L, 0L), (32L, 3L)).toDF("a", "b")
      .select(Layout.hilbertKey(col("a"), col("b"), 5).as("h"))
      .collect().map(_.getLong(0))
    assert(masked(0) == localHilbert(31L, 0L, 5))
    assert(masked(1) == localHilbert(0L, 3L, 5))
  }

  test("zOrderKeyN: 3-column interleave equals the local model; 2-column equals zOrderKey") {
    def localZN(cs: Seq[Long], bits: Int): Long =
      (for (i <- 0 until bits; j <- cs.indices)
        yield ((cs(j) >> i) & 1L) << (cs.length * i + j)).sum
    val df = (0 until 200).map { i =>
      (i.toLong % 7, (i.toLong * 31) % 13, (i.toLong * 17) % 11)
    }.toDF("a", "b", "c")
    val got = df.select(col("a"), col("b"), col("c"),
        Layout.zOrderKeyN(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .collect()
    got.foreach { r =>
      val cs = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == localZN(cs, 4), s"$cs")
    }
    // 2-column N-form degenerates to the pinned 2-D layout
    val two = Seq((5L, 9L), (255L, 255L)).toDF("a", "b")
      .select(Layout.zOrderKeyN(Seq(col("a"), col("b")), 8).as("zn"),
        Layout.zOrderKey(col("a"), col("b"), 8).as("z2"))
      .collect()
    two.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("hilbertMachine(d=3): bijective + ADJACENT at every step over the full 8x8x8 grid") {
    val bits = 3; val n = 1L << bits
    val cells = for (x <- 0L until n; y <- 0L until n; z <- 0L until n)
      yield (x, y, z)
    val keyed = cells.map(c => Layout.hilbertModel(Seq(c._1, c._2, c._3), bits))
    // bijection onto [0, n^3)
    assert(keyed.toSet === (0L until n * n * n).toSet)
    // adjacency: consecutive indices are L1-neighbors — the property that
    // makes contiguous key ranges cover tight boxes, and the check that
    // catches any cross-subcell discontinuity in the generated machine
    val byKey = cells.zip(keyed).map(_.swap).toMap
    (0L until n * n * n - 1).foreach { h =>
      val (a, b) = (byKey(h), byKey(h + 1))
      val d1 = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs(a._3 - b._3)
      assert(d1 == 1, s"keys $h->${h + 1} jump from $a to $b")
    }
  }

  test("hilbertMachine(d=4): bijective + adjacent over the full 4^4 grid; d=2 generator sane") {
    val bits = 2; val n = 1L << bits
    val cells = for (w <- 0L until n; x <- 0L until n; y <- 0L until n;
        z <- 0L until n) yield Seq(w, x, y, z)
    val keyed = cells.map(Layout.hilbertModel(_, bits))
    assert(keyed.toSet === (0L until n * n * n * n).toSet)
    val byKey = cells.zip(keyed).map(_.swap).toMap
    (0L until n * n * n * n - 1).foreach { h =>
      val d1 = byKey(h).zip(byKey(h + 1)).map(p => math.abs(p._1 - p._2)).sum
      assert(d1 == 1, s"keys $h->${h + 1} jump from ${byKey(h)} to ${byKey(h + 1)}")
    }
    // the generator at d=2 also yields a true Hilbert curve (bijective +
    // adjacent over 16x16) — orientation may differ from the hand-written
    // xy2d tables, validity may not
    val g2 = for (x <- 0L until 16L; y <- 0L until 16L)
      yield Seq(x, y)
    val k2 = g2.map(Layout.hilbertModel(_, 4))
    assert(k2.toSet === (0L until 256L).toSet)
    val by2 = g2.zip(k2).map(_.swap).toMap
    (0L until 255L).foreach { h =>
      val d1 = by2(h).zip(by2(h + 1)).map(p => math.abs(p._1 - p._2)).sum
      assert(d1 == 1, s"d=2 generator: keys $h->${h + 1} jump")
    }
  }

  test("hilbertKeyN (unrolled expression) equals the driver model; masks negatives") {
    val df = (0 until 512).map { i =>
      (i.toLong % 8, (i.toLong / 8) % 8, i.toLong / 64)
    }.toDF("a", "b", "c")
    val got = df.select(col("a"), col("b"), col("c"),
        Layout.hilbertKeyN(Seq(col("a"), col("b"), col("c")), 3).as("h"))
      .collect()
    got.foreach { r =>
      val cs = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == Layout.hilbertModel(cs, 3), s"$cs")
    }
    // full-grid output doubles as a bijectivity check of the EXPRESSION
    assert(got.map(_.getLong(3)).toSet === (0L until 512L).toSet)
    // negatives mask onto the low bits, exactly the 2-D discipline
    val m = Seq((-1L, 0L, 3L)).toDF("a", "b", "c")
      .select(Layout.hilbertKeyN(Seq(col("a"), col("b"), col("c")), 3).as("h"))
      .head().getLong(0)
    assert(m == Layout.hilbertModel(Seq(7L, 0L, 3L), 3))
    // d=4 expression spot-check against the model
    val q = Seq((1L, 2L, 3L, 0L), (3L, 3L, 3L, 3L)).toDF("a", "b", "c", "d")
      .select(Layout.hilbertKeyN(
        Seq(col("a"), col("b"), col("c"), col("d")), 2).as("h"))
      .collect().map(_.getLong(0))
    assert(q(0) == Layout.hilbertModel(Seq(1L, 2L, 3L, 0L), 2))
    assert(q(1) == Layout.hilbertModel(Seq(3L, 3L, 3L, 3L), 2))
  }

  test("hilbert chunks are at least as tight as z-order at matched chunk counts") {
    // 64x64 grid split into 32 contiguous key ranges per curve: mean
    // per-chunk bounding-box area — the min-max skipping quantity — must
    // not be worse under hilbert (typically ~20-30% tighter)
    val n = 64
    val grid = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
      .toDF("a", "b")
    def meanArea(curve: String): Double = {
      val keyed = grid.select(col("a"), col("b"),
        Layout.curveKey(curve, col("a"), col("b"), 6).as("k"))
      val chunk = (col("k") * 32 / (n * n)).cast("int")
      keyed.groupBy(chunk.as("c"))
        .agg(((max(col("a")) - min(col("a")) + 1) *
          (max(col("b")) - min(col("b")) + 1)).as("area"))
        .agg(avg(col("area"))).head().getDouble(0)
    }
    val z = meanArea("zorder"); val h = meanArea("hilbert")
    info(f"mean 32-chunk bounding-box area: zorder $z%.1f, hilbert $h%.1f")
    assert(h <= z,
      f"hilbert must not be looser than z-order at matched chunks: $h%.1f vs $z%.1f")
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
