package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — the write-side complement of
  * partition pruning. A lake queried by EITHER of two dimensions (say
  * station id AND time bucket, or language AND length band) cannot serve
  * both from a single-column sort: files tight on the sort key are
  * full-width on every other column, so min-max skipping only prunes one
  * access path. Interleaving the dimensions' bits (Morton / Z-order — the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`) makes file-level
  * min-max ranges tight on BOTH columns at once; LayoutSpec measures the
  * effect directly.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — column `a` occupies even bit positions,
    * `b` odd. The expression is an UNROLLED mask/shift sum (2·bits codegen'd
    * integer terms, no HOF lambda, no UDF), so it rides whole-stage codegen
    * and replays exactly in any engine with `&`/`<<`. Inputs are masked to
    * their low `bits` bits up front, so out-of-range values — INCLUDING
    * negatives, whose arithmetic shiftright would otherwise sign-extend
    * ones into every interleaved position — fold deterministically onto
    * the low bits. Folding preserves nothing of the original ordering,
    * so for meaningful locality the caller should still bucket values
    * into [0, 2^bits) (offset-shift negative domains first); the mask
    * guarantees the key is merely non-local, never corrupt. */
  def zOrderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = lit((1L << bits) - 1)
    val aa = a.cast("long").bitwiseAND(mask)
    val bb = b.cast("long").bitwiseAND(mask)
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(aa, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Per-(state, quadrant) OUTPUT DIGIT and NEXT STATE of the 4-state
    * Hilbert-curve machine, indexed `state * 4 + (2·xbit + ybit)`. The
    * tables are derived from (and exhaustively verified against — see
    * LayoutSpec) the classic iterative xy2d algorithm: the four states
    * are the orientations {identity, swap, swap+flip, flip} the loop's
    * per-level rotation composes, so the sequential rotate-in-place
    * becomes a pure per-level table lookup whose only carried value is
    * the 2-bit state — an UNROLLABLE expression (O(bits) lookups) where
    * the literal rotation would nest the whole coordinate transform
    * per level. */
  private val HilbertDigit: Seq[Long] =
    Seq(0L, 1L, 3L, 2L, 0L, 3L, 1L, 2L, 2L, 1L, 3L, 0L, 2L, 3L, 1L, 0L)
  private val HilbertNext: Seq[Long] =
    Seq(1L, 0L, 2L, 0L, 0L, 3L, 1L, 1L, 2L, 2L, 0L, 3L, 3L, 1L, 3L, 2L)

  /** Hilbert-curve key of two non-negative integer columns — Z-order's
    * better-locality sibling: Morton order jumps across the square at
    * every quadrant seam (the classic diagonal-jump artifact), while the
    * Hilbert traversal is ADJACENT at every step, so contiguous key
    * ranges (→ files) cover tighter rectangles for the same file count
    * (LakeZorderSpec measures hilbert ≤ zorder mean bounding-box area).
    * Unrolled state-transition-table form: per level one digit lookup +
    * one state lookup over 16-element literal arrays — whole-stage
    * codegen'd, no HOF lambda, no UDF, and engine-replayable (the
    * q_hilbert_key oracle replays the identical tables in SQL).
    * Out-of-range/negative inputs mask onto the low `bits` like
    * [[zOrderKey]]. */
  def hilbertKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = lit((1L << bits) - 1)
    val x = a.cast("long").bitwiseAND(mask)
    val y = b.cast("long").bitwiseAND(mask)
    val dig = typedlit(HilbertDigit)
    val nxt = typedlit(HilbertNext)
    var state: Column = lit(0L)
    var acc: Column = lit(0L)
    for (lvl <- (bits - 1) to 0 by -1) {
      val q = shiftright(x, lvl).bitwiseAND(lit(1L)) * lit(2L) +
        shiftright(y, lvl).bitwiseAND(lit(1L))
      val idx = (state * lit(4L) + q + lit(1L)).cast("int")
      acc = acc + shiftleft(element_at(dig, idx), 2 * lvl)
      state = element_at(nxt, idx)
    }
    acc
  }

  /** The clustering key for a named curve — the `--curve` surface. */
  def curveKey(curve: String, a: Column, b: Column, bits: Int): Column =
    curve match {
      case "zorder" => zOrderKey(a, b, bits)
      case "hilbert" => hilbertKey(a, b, bits)
      case other => throw new IllegalArgumentException(
        s"unknown clustering curve '$other' — zorder or hilbert")
    }

  /** Range-partition and sort a frame by its Z-order key: each output
    * partition (→ file) covers one contiguous Z-range, i.e. a small square
    * in (a, b) space — tight min-max on both columns. `nFiles` bounds the
    * file count; at 100 TB pick it from target file size (~1 GB). */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
      nFiles: Int): DataFrame = writeClustered(df, a, b, bits, nFiles)

  /** [[writeZOrdered]] generalized over the space-filling curve. */
  def writeClustered(df: DataFrame, a: Column, b: Column, bits: Int,
      nFiles: Int, curve: String = "zorder"): DataFrame = {
    val keyed = df.withColumn("__z", curveKey(curve, a, b, bits))
    keyed.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
