package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

import graft.expressions.{FloatVecBitsHex, FloatVecCosine, FloatVecDot, FloatVecL2}

/** Dense-vector math over `array<float|double>` embedding columns, backed
  * by the custom codegen'd Catalyst expressions in `graft.expressions` —
  * one fused Java loop per row instead of interpreted `zip_with`/`aggregate`
  * lambdas (which are CodegenFallback and dominate n²-pair similarity).
  *
  * Sums accumulate left-to-right in element order, so results are
  * deterministic and bit-identical to the higher-order-function
  * formulation.
  *
  * At 100 TB scale the embedding column stays packed (no explode): one row
  * per vector, all arithmetic inside whole-stage codegen.
  */
object VectorFunctions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def e(col: Column) = GraftBridge.expression(col)

  /** Dot product of two numeric-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column = c(FloatVecDot(e(a), e(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = c(FloatVecCosine(e(a), e(b)))

  /** L2 (Euclidean) distance. */
  def l2(a: Column, b: Column): Column = c(FloatVecL2(e(a), e(b)))

  /** Bounded per-group top-k aggregate (score DESC, id ASC), evaluating
    * to a rank-ordered `array<struct<id, score>>` — partial-merge-able,
    * so map-side combine caps the shuffle at k entries per (group × task).
    * See [[graft.expressions.ScoreTopKAgg]] for the scale rationale. */
  def scoreTopK(score: Column, id: Column, k: Int): Column =
    c(graft.expressions.ScoreTopKAgg(e(score), e(id), k)
      .toAggregateExpression())

  /** Canonical IEEE-754 bit encoding of a vector as one fixed-width hex
    * string (8 chars/float, 16/double; null elements emit `n…n`) — the
    * injective, bit-exact vector fingerprint
    * [[graft.io.IntegrityManifest.embeddingManifest]] hashes into its
    * leaves. */
  def bitsHex(a: Column): Column = c(FloatVecBitsHex(e(a)))

  /** Random-hyperplane (SimHash-family) LSH signature of a vector: `nBits`
    * sign bits packed into a long. Hyperplane components are deterministic
    * pseudo-random values derived from (bit, dim) via a splitmix-style hash,
    * so executors regenerate identical planes with no broadcast state.
    */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    require(nBits <= 63, "signature packed into one long")
    // Plane components in [-1, 1) derived from a splitmix hash of (seed, bit, dim).
    val planes: Seq[Seq[Double]] = (0 until nBits).map { b =>
      (0 until dim).map { d =>
        splitmix64(seed + b.toLong * 1000003L + d.toLong).toDouble / Long.MaxValue.toDouble
      }
    }
    val planesLit = typedlit(planes)
    // Fold over bit indices in order: acc = acc*2 + sign_bit(plane_b . vec).
    aggregate(
      sequence(lit(0), lit(nBits - 1)),
      lit(0L),
      (acc, b) =>
        acc * lit(2L) + when(dot(vec, element_at(planesLit, b + 1)) >= 0, lit(1L)).otherwise(lit(0L)))
  }

  /** BINARY (sign-bit) quantization — the 1-bit-per-dim serving path
    * for embeddings: dimension `i` contributes bit `i mod 32` of word
    * `i / 32` iff its component is > 0. Words pack 32 bits into a 64-bit
    * long (half density → 16× smaller than float32, not the dense 32×)
    * so every packed value stays non-negative — sign-safe shift/compare
    * on any engine, and an exact SQL replay via (1<<j) sums. Pure
    * codegen'd column expression, one pass over the vector. */
  def binarySignature(vec: Column, dim: Int): Column = {
    require(dim > 0 && dim % 32 == 0,
      s"binary signature needs a multiple of 32 dims, got $dim")
    array((0 until dim / 32).map { w =>
      (0 until 32).map { j =>
        when(element_at(vec, w * 32 + j + 1) > lit(0.0f), lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Driver-side twin of [[binarySignature]] for query vectors. */
  def binarySignatureLocal(vec: Seq[Float]): Seq[Long] = {
    require(vec.nonEmpty && vec.length % 32 == 0,
      s"binary signature needs a multiple of 32 dims, got ${vec.length}")
    vec.grouped(32).map(_.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
      if (v > 0f) acc | (1L << j) else acc
    }).toSeq
  }

  /** Hamming distance between two packed signatures (equal length). */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0L), (acc, h) => acc + h.cast("long"))

  /** SplitMix64 mix (Steele et al., "Fast splittable pseudorandom number
    * generators", OOPSLA'14) — THE shared deterministic hash behind the
    * hyperplane planes, the driver-side query signature and the smoke
    * harness's synthetic fixtures. One definition so signatures computed
    * on executors and the driver can never drift. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
