package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** The q_ann_lsh / q_ann_ivf CORRECTNESS rows use the exact cosine top-10 as
  * their oracle — which is only honest if the approximate path (a) really
  * prunes (its candidate set is a strict subset of the corpus) and (b) still
  * contains the true top-10, so the pruned rerank provably reproduces the
  * exact answer. This spec pins both on the driver's fixtures; if a future
  * fixture regeneration drops recall below 1.0, this fails with the measured
  * candidate fraction instead of a silent red CORRECTNESS row. */
class AnnPruningSpec extends SparkSpec {

  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/embeddings.parquet").exists())

  private def queryVec(dir: String): Seq[Float] =
    Tables.t(spark, dir, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)

  for (dir <- dirs) test(s"LSH q_ann_lsh config prunes yet keeps the exact top-10 ($dir)") {
    val corpus = Tables.t(spark, dir, "embeddings").filter(col("vec_id") > 0)
    val n = corpus.count()
    val q = queryVec(dir)
    // candidate set = corpus filtered by the same predicate lshTopK applies:
    // rerank with k = corpus so nothing is cut by the limit
    val cand = Similarity.lshTopK(corpus, "vec_id", "embedding", q,
      dim = 64, k = n.toInt, nBits = 12, maxHammingProbe = 4, nTables = 4)
    val nCand = cand.count()
    info(f"LSH candidates: $nCand/$n (${nCand.toDouble / n}%.3f of corpus)")
    assert(nCand < n, "LSH probe must prune — otherwise the demo is brute force")
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(corpus, "vec_id", "embedding", q,
      dim = 64, k = 10, nBits = 12, maxHammingProbe = 4, nTables = 4)
      .collect().map(_.getLong(0)).toSet
    assert(approx == exact,
      s"recall@10 must be 1.0 for the exact-cosine oracle to apply; " +
        s"missed ${exact -- approx}")
  }

  // q_ann_ivf's oracle REPLAYS the whole pipeline (seeded codebook → argmin
  // cells → 4 probe cells → rerank), so unlike LSH it does not need recall
  // 1.0 — this test pins only that the probe genuinely prunes and that the
  // approximate answer stays useful (recall floor) on the fixtures.
  for (dir <- dirs) test(s"IVF q_ann_ivf config prunes 4/16 cells with useful recall ($dir)") {
    val corpus = Tables.t(spark, dir, "embeddings").filter(col("vec_id") > 0)
    val n = corpus.count()
    val q = queryVec(dir)
    val cand = Similarity.ivfTopK(corpus, "vec_id", "embedding", q,
      k = n.toInt, nCentroids = 16, nProbe = 4)
    val nCand = cand.count()
    info(f"IVF candidates: $nCand/$n (${nCand.toDouble / n}%.3f of corpus)")
    assert(nCand < n, "IVF probe must prune — otherwise the demo is brute force")
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfTopK(corpus, "vec_id", "embedding", q,
      k = 10, nCentroids = 16, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = approx.intersect(exact).size / 10.0
    info(f"IVF recall@10 = $recall%.1f")
    assert(recall >= 0.4,
      s"4/16-cell probe should keep a useful share of the true top-10; got $recall")
  }
}
