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

  /** Attach one signature column per hash table (`lsh_sig_0` …
    * `lsh_sig_{nTables-1}`, the [[tableSeed]] family) — the precompute
    * step for [[lshTopK]]'s `sigCols` path: sign once at ingest, persist,
    * and every later query prunes on the stored columns instead of
    * re-hashing the corpus. */
  def withSignatures(df: DataFrame, vecCol: String, dim: Int, nBits: Int,
      nTables: Int, seed: Long = 42L): DataFrame =
    (0 until nTables).foldLeft(df) { (d, t) =>
      d.withColumn(s"lsh_sig_$t",
        VectorFunctions.hyperplaneSignature(col(vecCol), dim, nBits,
          tableSeed(seed, t)))
    }

  /** Seed for hash table `t` of a multi-table LSH family — one fixed
    * stride so executors, the driver-side query signature, and any
    * precomputed signature columns all agree. */
  private def tableSeed(seed: Long, t: Int): Long = seed + t.toLong * 7919L

  /** ANN top-k: rerank only vectors whose signature matches the query's
    * signature within `maxHammingProbe` flipped bits (0 = exact bucket) in
    * AT LEAST ONE of `nTables` independent hyperplane families.
    *
    * Recall amplification the classic LSH way: a true neighbor missed by
    * one table's banding is caught by another (miss probability decays
    * exponentially in `nTables`), which lifts recall far more per
    * candidate than widening the Hamming ball of a single table — a
    * wider ball admits uniformly more of the corpus, an extra table
    * admits specifically the near vectors. All tables are evaluated in
    * ONE scan (the per-table popcount predicates OR together), so there
    * is no union or dedup pass.
    *
    * By default each table's signature is recomputed inline per row (the
    * right shape for one-shot queries). At 100 TB, sign once instead:
    * [[withSignatures]] persists `lsh_sig_0…n` at ingest, and passing
    * those names as `sigCols` makes every later query filter on the
    * STORED columns — no per-query re-hash of the corpus, and the
    * probe-0 case is a plain column equality that bucket/partition
    * pruning can use. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      dim: Int,
      k: Int,
      nBits: Int = 16,
      maxHammingProbe: Int = 1,
      seed: Long = 42L,
      roundTo: Int = 6,
      nTables: Int = 1,
      sigCols: Seq[String] = Nil): DataFrame = {
    val tables = math.max(nTables, 1)
    require(sigCols.isEmpty || sigCols.length == tables,
      s"sigCols must name one precomputed signature column per table " +
        s"(got ${sigCols.length} for $tables tables)")
    // Multi-probe: every bucket within Hamming distance <= maxHammingProbe
    // of the query signature (maxHammingProbe = nBits probes everything —
    // exact recall at brute-force cost). Expressed as a popcount predicate,
    // not an enumerated IN list: O(1) expression size at any nBits, and the
    // probe-0 case stays an equality (bucket/partition-prunable at scale).
    val probe = math.max(maxHammingProbe, 0)
    val pred = (0 until tables).map { t =>
      val s = tableSeed(seed, t)
      val sig =
        if (sigCols.nonEmpty) col(sigCols(t))
        else VectorFunctions.hyperplaneSignature(col(vecCol), dim, nBits, s)
      val qSig = querySignature(query, dim, nBits, s)
      if (probe == 0) sig === qSig
      else bit_count(sig.bitwiseXOR(lit(qSig))) <= math.min(probe, nBits)
    }.reduce(_ || _)
    bruteForceTopK(df.filter(pred), idCol, vecCol, query, k, roundTo)
  }

  /** IVF-style ANN: coarse-quantize the corpus into `nCentroids` cells,
    * probe the `nProbe` cells nearest to the query, rerank exactly inside
    * them. Centroids here are a deterministic id-ordered sample (a k-means
    * codebook trained offline slots into the same shape). At scale the cell
    * id becomes a partition/bucket column, so probing prunes the scan to
    * nProbe/nCentroids of the data.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      roundTo: Int = 6,
      kmeansIters: Int = 0): DataFrame = {
    val centroids = codebook(df, idCol, vecCol, nCentroids, kmeansIters)
    val assigned = withIvfCell(df, vecCol, centroids)
    val probes = centroids.indices
      .sortBy(i => l2Local(query, centroids(i)))
      .take(nProbe)
    bruteForceTopK(
      assigned.filter(col("ivf_cell").isin(probes: _*)), idCol, vecCol, query, k, roundTo)
  }

  /** IVF codebook: deterministic id-ordered seeds refined by `iters`
    * Lloyd's-k-means steps. Each step is ONE distributed aggregate — cells
    * assigned by the fused codegen'd argmin, per-cell mean via explode +
    * (cell, dim) groupBy (map-side partial agg; the shuffle carries only
    * nCentroids × dim partial sums per task, never vectors). Empty cells
    * keep their previous centroid. */
  def codebook(df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int): Array[Seq[Float]] = {
    var cents: Array[Seq[Float]] = df.orderBy(col(idCol)).limit(nCentroids)
      .select(vecCol).collect().map(_.getSeq[Float](0))
    var it = 0
    while (it < iters) {
      val means = withIvfCell(df, vecCol, cents)
        .select(col("ivf_cell"), posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy("ivf_cell", "d")
        .agg(avg(col("x")).as("m"))
        .groupBy("ivf_cell")
        .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
        .select(col("ivf_cell"),
          transform(col("dm"), e => e.getField("m").cast("float")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1))
        .toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
      it += 1
    }
    cents
  }

  /** Assign each vector its nearest-centroid cell id (the IVF coarse code). */
  def withIvfCell(df: DataFrame, vecCol: String, centroids: Array[Seq[Float]]): DataFrame = {
    val cLit = typedlit(centroids.toSeq)
    // argmin over centroids: array_min on (distance, index) structs — the
    // per-element l2 is the fused codegen'd expression
    val best = array_min(transform(
      sequence(lit(0), lit(centroids.length - 1)),
      i => struct(
        VectorFunctions.l2(col(vecCol), element_at(cLit, i + 1)).as("d"),
        i.as("i"))))
    df.withColumn("ivf_cell", best.getField("i"))
  }

  private[graft] def l2Local(a: Seq[Float], b: Seq[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)

  /** Driver-side signature of the query vector — same splitmix planes the
    * executors regenerate, so bucket ids agree. */
  def querySignature(query: Seq[Float], dim: Int, nBits: Int, seed: Long = 42L): Long = {
    var sig = 0L
    for (b <- 0 until nBits) {
      var d0 = 0.0
      for (d <- 0 until dim) {
        val h = VectorFunctions.splitmix64(seed + b.toLong * 1000003L + d.toLong)
        d0 += query(d).toDouble * (h.toDouble / Long.MaxValue.toDouble)
      }
      sig = sig * 2 + (if (d0 >= 0) 1L else 0L)
    }
    sig
  }

}
