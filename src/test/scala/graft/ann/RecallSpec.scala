package graft.ann

import graft.SparkSpec

/** Measured recall@10 of the approximate ANN paths against brute force at a
  * fixed seed — the quality numbers behind the q_ann_lsh / q_ann_ivf
  * rows-only demos (their exact-recall configurations are oracle-gated as
  * q_ann_lsh_exact / q_ann_ivf_exact). Also demonstrates that k-means
  * refinement of the IVF codebook does not degrade — and typically
  * improves — recall over the raw id-ordered seeds. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private val N = 400

  // deterministic clustered corpus: 8 cluster centers + small jitter, so
  // an IVF codebook has real structure to find
  private val vecs: Seq[(Long, Seq[Float])] = (0L until N).map { i =>
    val r = new scala.util.Random(1000 + i)
    val center = (i % 8).toInt
    i -> Seq.tabulate(Dim) { d =>
      (if (d % 8 == center) 1f else 0f) + (r.nextFloat() - 0.5f) * 1.2f
    }
  }
  private lazy val df = vecs.toDF("vec_id", "embedding").cache()

  private def recallAt10(approx: Seq[Long], exact: Seq[Long]): Double =
    approx.toSet.intersect(exact.toSet).size.toDouble / exact.size

  private def exactTop10(q: Seq[Float]): Seq[Long] =
    Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq

  test("LSH multi-table multi-probe recall@10 >= 0.95 averaged over 20 queries") {
    def lshRecall(tables: Int): Double = {
      val recalls = (0 until 20).map { qi =>
        val q = vecs(qi * 17 % N)._2
        val approx = Similarity.lshTopK(df, "vec_id", "embedding", q,
          dim = Dim, k = 10, nBits = 12, maxHammingProbe = 4, nTables = tables)
          .collect().map(_.getLong(0)).toSeq
        recallAt10(approx, exactTop10(q))
      }
      recalls.sum / recalls.size
    }
    val one = lshRecall(1)
    val three = lshRecall(3)
    info(f"LSH recall@10 (nBits=12, probe<=4): tables=1 $one%.3f, tables=3 $three%.3f")
    // a second/third independent family catches the neighbors one table's
    // banding misses — recall amplification without widening the ball
    assert(three >= 0.95, s"LSH 3-table recall@10 $three below 0.95")
    assert(three >= one - 1e-9, "additional tables can only add candidates")
  }

  test("IVF recall@10 >= 0.9 with k-means-refined codebook; refinement does not hurt") {
    def ivfRecall(iters: Int): Double = {
      val recalls = (0 until 20).map { qi =>
        val q = vecs(qi * 13 % N)._2
        val approx = Similarity.ivfTopK(df, "vec_id", "embedding", q,
          k = 10, nCentroids = 8, nProbe = 2, kmeansIters = iters)
          .collect().map(_.getLong(0)).toSeq
        recallAt10(approx, exactTop10(q))
      }
      recalls.sum / recalls.size
    }
    val raw = ivfRecall(0)
    val refined = ivfRecall(3)
    info(f"IVF recall@10 (8 cells, probe 2): seeds=$raw%.3f kmeans3=$refined%.3f")
    assert(refined >= 0.9, s"refined IVF recall@10 $refined below 0.9")
    assert(refined >= raw - 0.05, "k-means refinement degraded recall")
  }

  test("batched topKForQueries equals looping bruteForceTopK per query") {
    // 40-query block against the remaining corpus — the batched single-
    // scan result must be ROW-IDENTICAL (ids, scores, rank order) to the
    // one-plan-per-query loop it replaces
    val queries = df.filter(org.apache.spark.sql.functions.col("vec_id") < 40)
    val corpus = df.filter(org.apache.spark.sql.functions.col("vec_id") >= 40)
    val batched = Similarity.topKForQueries(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, roundTo = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val looped = (0L until 40L).flatMap { qid =>
      Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        vecs(qid.toInt)._2, k = 10, roundTo = 5)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }.sortBy(t => (t._1, t._2))
    assert(batched.length === looped.length)
    assert(batched.toSeq === looped,
      "batched and looped retrieval must agree exactly")
  }

  test("ivfTopKForQueries: full probe equals batched brute force; narrow probe keeps recall") {
    val queries = df.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val corpus = df.filter(org.apache.spark.sql.functions.col("vec_id") >= 20)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val exact = rows(Similarity.topKForQueries(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, roundTo = 5))
    val fullProbe = rows(Similarity.ivfTopKForQueries(corpus, "vec_id",
      "embedding", queries, "vec_id", "embedding", k = 10,
      nCentroids = 8, nProbe = 8, roundTo = 5, kmeansIters = 2))
    assert(fullProbe === exact, "probing every cell must equal brute force")
    val narrow = Similarity.ivfTopKForQueries(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10,
      nCentroids = 8, nProbe = 2, roundTo = 5, kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val exactByQ = exact.map(t => (t._1, t._3)).groupBy(_._1)
    val recall = (0L until 20L).map { qid =>
      val a = narrow.getOrElse(qid, Array.empty).map(_._2).toSet
      val e = exactByQ(qid).map(_._2).toSet
      a.intersect(e).size.toDouble / e.size
    }.sum / 20
    info(f"batched IVF recall@10 (8 cells, probe 2): $recall%.3f")
    assert(recall >= 0.85, s"batched IVF recall@10 $recall below 0.85")
  }

  test("batched retrieval output feeds retrievalMetrics as the runs frame") {
    import org.apache.spark.sql.functions._
    val queries = df.filter(col("vec_id") < 10)
    val corpus = df.filter(col("vec_id") >= 10)
    val runs = Similarity.topKForQueries(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, roundTo = 5)
    // qrels = the exact top-3 per query (grade 1): a perfect-ranking run
    // must score recall 1, MRR 1 at k=5
    val qrels = Similarity.topKForQueries(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 3, roundTo = 5)
      .select(col("query_id"), col("vec_id"), lit(1).as("grade"))
    val report = graft.eval.EvalMetrics.retrievalMetrics(runs, qrels,
      "query_id", "vec_id", "cos", "grade", k = 5)
    val bad = report.filter(col("recall") < 1.0 || col("mrr") < 1.0).count()
    assert(bad === 0L, "a perfect run must score recall=1, mrr=1 per query")
    assert(report.count() === 10L)
  }

  test("batched PQ (ADC + rerank) equals looping the per-query PQ plans (shared codes)") {
    import org.apache.spark.sql.functions.col
    val queries = df.filter(col("vec_id") < 15)
    val corpus = df.filter(col("vec_id") >= 15)
    val cents = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      Dim, m = 4, nCodes = 16, iters = 2)
    val coded = Similarity.withPqCodes(corpus, "embedding", Dim, cents)
    // ADC-only stage: batched == looping pqAdcTopKFromCodes
    val adcBatched = Similarity.pqAdcTopKForQueriesFromCodes(coded,
      "vec_id", queries, "vec_id", "embedding", Dim, cents, k = 10,
      roundTo = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val adcLooped = (0L until 15L).flatMap { qid =>
      Similarity.pqAdcTopKFromCodes(coded, "vec_id", vecs(qid.toInt)._2,
        Dim, cents, k = 10, roundTo = 5)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }.sortBy(t => (t._1, t._2))
    assert(adcBatched.toSeq === adcLooped,
      "batched ADC must equal the per-query ADC loop exactly")
    // full rerank stage: batched == looping pqRerankedFromCodes
    val batched = Similarity.pqRerankedForQueriesFromCodes(coded, "vec_id",
      "embedding", queries, "vec_id", "embedding", Dim, cents, k = 10,
      shortlist = 30, roundTo = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val looped = (0L until 15L).flatMap { qid =>
      Similarity.pqRerankedFromCodes(coded, "vec_id", "embedding",
        vecs(qid.toInt)._2, Dim, cents, k = 10, shortlist = 30, roundTo = 5)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }.sortBy(t => (t._1, t._2))
    assert(batched.toSeq === looped,
      "batched PQ rerank must equal the per-query loop exactly")
  }

  test("PQ reranked recall@10 >= 0.9; widening the ADC shortlist does not hurt") {
    def pqRecall(shortlist: Int): Double = {
      val recalls = (0 until 20).map { qi =>
        val q = vecs(qi * 11 % N)._2
        val approx = Similarity.pqTopKReranked(df, "vec_id", "embedding", q,
          dim = Dim, k = 10, m = 4, nCodes = 16, kmeansIters = 2,
          shortlist = shortlist)
          .collect().map(_.getLong(0)).toSeq
        recallAt10(approx, exactTop10(q))
      }
      recalls.sum / recalls.size
    }
    val narrow = pqRecall(30)
    val wide = pqRecall(80)
    info(f"PQ recall@10 (m=4, 16 codes): shortlist=30 $narrow%.3f, shortlist=80 $wide%.3f")
    assert(wide >= 0.9, s"PQ reranked recall@10 $wide below 0.9")
    assert(wide >= narrow - 1e-9,
      "a wider ADC shortlist is a superset of candidates — recall can only grow")
  }

  test("PQ ADC ranking equals exhaustive encode-and-scan ranking (shared scan invariant)") {
    // pqAdcTopK with shortlist-free ranking and pqTopKReranked's candidate
    // stage must price candidates identically: rerank with shortlist = N
    // and full-probe ADC must both recover the exact brute-force top-10
    val q = vecs(3)._2
    val exact = exactTop10(q)
    val rerankAll = Similarity.pqTopKReranked(df, "vec_id", "embedding", q,
      dim = Dim, k = 10, m = 4, nCodes = 16, kmeansIters = 2, shortlist = N)
      .collect().map(_.getLong(0)).toSeq
    assert(rerankAll == exact,
      "shortlist = corpus must make PQ rerank exactly brute force")
  }
}
