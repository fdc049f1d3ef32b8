package graft.ann

import graft.SparkSpec

/** SemDeDup (E74): embedding-space near-dup pruning — k-means cells, then
  * greedy keep-first-in-id-order over within-cell cosine pairs. The spec
  * cross-checks the distributed pipeline against a local brute-force model
  * on a corpus with PLANTED semantic twins, and pins the operator's scale
  * contract: a twin split across cells is (by design) not compared. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16

  // 4 well-separated cluster centers; 40 base vectors + planted twins:
  // id+1000 is id's vector with tiny jitter (cos ~ 0.999)
  private val base: Seq[(Long, Seq[Float])] = (0L until 40L).map { i =>
    val r = new scala.util.Random(7 + i)
    val center = (i % 4).toInt
    i -> Seq.tabulate(Dim) { d =>
      (if (d / 4 == center) 2f else 0f) + (r.nextFloat() - 0.5f) * 0.4f
    }
  }
  private val twins: Seq[(Long, Seq[Float])] = base.take(10).map { case (i, v) =>
    val r = new scala.util.Random(9000 + i)
    (i + 1000L) -> v.map(x => x + (r.nextFloat() - 0.5f) * 0.02f)
  }
  private lazy val df = (base ++ twins).toDF("vec_id", "embedding").cache()

  private def localModel(nClusters: Int, threshold: Double): Map[Long, Boolean] = {
    val all = (base ++ twins).sortBy(_._1)
    val seeds = all.take(nClusters).map(_._2)
    def l2(a: Seq[Float], b: Seq[Float]) = Similarity.l2Local(a, b)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cell = all.map { case (id, v) =>
      id -> seeds.indices.minBy(c => (l2(v, seeds(c)), c))
    }.toMap
    all.map { case (id, v) =>
      val dropped = all.exists { case (lo, lv) =>
        lo < id && cell(lo) == cell(id) &&
          BigDecimal(cos(lv, v)).setScale(5, BigDecimal.RoundingMode.HALF_UP) >= threshold
      }
      id -> !dropped
    }.toMap
  }

  test("planted twins drop, bases keep; equals the local brute-force model") {
    val got = Similarity.semDedup(df, "vec_id", "embedding", nClusters = 4, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val want = localModel(4, 0.9)
    assert(got.size == 50)
    assert(got == want)
    // every planted twin shares its base's cell (twins are jitter-sized)
    // and the base has the lower id, so the twin always drops; bases may
    // themselves drop against an earlier same-center base — the local
    // model equality above covers those. The four center-first bases have
    // no lower-id partner at all, so they keep unconditionally.
    twins.foreach { case (tid, _) =>
      assert(!got(tid), s"twin $tid should drop against its base")
    }
    (0L until 4L).foreach(id => assert(got(id), s"center-first base $id should keep"))
  }

  test("threshold above max pairwise cosine keeps everything") {
    val got = Similarity.semDedup(df, "vec_id", "embedding", nClusters = 4, threshold = 1.1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.values.forall(identity))
  }

  test("chain collapses to its minimum id within a cell") {
    // a ~ b ~ c all mutually similar in one cell: only the min id keeps
    val tight = Seq(
      1L -> Seq.tabulate(Dim)(d => if (d == 0) 1f else 0.01f * d),
      2L -> Seq.tabulate(Dim)(d => if (d == 0) 1f else 0.011f * d),
      3L -> Seq.tabulate(Dim)(d => if (d == 0) 1f else 0.012f * d))
      .toDF("vec_id", "embedding")
    val got = Similarity.semDedup(tight, "vec_id", "embedding", nClusters = 1, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }
}
