package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - `bruteForceTopK` is the exact baseline: one codegen'd pass computing
  *    cosine against the (broadcast) query vector, then a distributed
  *    TakeOrdered — no global sort, no explode.
  *  - `lshTopK` is the scale path: random-hyperplane signatures bucket the
  *    corpus; only the query's bucket (plus optional multi-probe neighbors)
  *    is reranked exactly. At 100 TB the signature column is precomputed and
  *    the bucket join prunes the scan via partition/bucket pruning.
  */
object Similarity {

  /** Exact top-k by cosine against a literal query vector. Deterministic:
    * score rounded, ties broken by id. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      roundTo: Int = 6): DataFrame = {
    val q = typedlit(query)
    df.select(
        col(idCol),
        round(VectorFunctions.cosine(col(vecCol), q), roundTo).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Attach an LSH bucket id (hyperplane signature) to each vector. */
  def withSignature(df: DataFrame, vecCol: String, dim: Int, nBits: Int, seed: Long = 42L): DataFrame =
    df.withColumn("lsh_sig", VectorFunctions.hyperplaneSignature(col(vecCol), dim, nBits, seed))

  /** ANN top-k: rerank only vectors whose signature matches the query's
    * signature within `maxHammingProbe` flipped bits (0 = exact bucket). */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      dim: Int,
      k: Int,
      nBits: Int = 16,
      maxHammingProbe: Int = 1,
      seed: Long = 42L): DataFrame = {
    val signed = withSignature(df, vecCol, dim, nBits, seed)
    val qSig = querySignature(query, dim, nBits, seed)
    // Multi-probe: query bucket plus all buckets within Hamming distance 1.
    val probes: Seq[Long] =
      if (maxHammingProbe <= 0) Seq(qSig)
      else qSig +: (0 until nBits).map(b => qSig ^ (1L << b))
    val candidates = signed.filter(col("lsh_sig").isin(probes: _*))
    bruteForceTopK(candidates, idCol, vecCol, query, k)
  }

  /** Driver-side signature of the query vector — same splitmix planes the
    * executors regenerate, so bucket ids agree. */
  def querySignature(query: Seq[Float], dim: Int, nBits: Int, seed: Long = 42L): Long = {
    var sig = 0L
    for (b <- 0 until nBits) {
      var d0 = 0.0
      for (d <- 0 until dim) {
        val h = splitmix64(seed + b.toLong * 1000003L + d.toLong)
        d0 += query(d).toDouble * (h.toDouble / Long.MaxValue.toDouble)
      }
      sig = sig * 2 + (if (d0 >= 0) 1L else 0L)
    }
    sig
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
