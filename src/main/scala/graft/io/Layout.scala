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

  /** Range-partition and sort a frame by its Z-order key: each output
    * partition (→ file) covers one contiguous Z-range, i.e. a small square
    * in (a, b) space — tight min-max on both columns. `nFiles` bounds the
    * file count; at 100 TB pick it from target file size (~1 GB). */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
      nFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", zOrderKey(a, b, bits))
    keyed.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
