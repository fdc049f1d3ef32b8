package graft.ann

import graft.SparkSpec

/** Similarity search: exact top-k ordering, LSH bucket recall for
  * self-lookup, IVF probe behavior. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: unit-ish 4-d vectors
  private val vecs: Seq[(Long, Seq[Float])] = (0L until 50L).map { i =>
    val r = new scala.util.Random(i)
    i -> Seq.fill(4)(r.nextFloat() * 2 - 1)
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  private def cosLocal(a: Seq[Float], b: Seq[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na * nb == 0) 0 else d / (na * nb)
  }

  test("bruteForceTopK returns the true top-k in order") {
    val q = vecs.head._2
    val got = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    val expected = vecs
      .map { case (id, v) => (id, BigDecimal(cosLocal(q, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got === expected)
  }

  test("withPqCodes matches a local argmin model (ties to lowest code)") {
    val cents = Similarity.pqCodebooks(df, "vec_id", "embedding", dim = 4,
      m = 2, nCodes = 4, iters = 0)
    val got = Similarity.withPqCodes(df, "embedding", 4, cents)
      .select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    def l2Local(a: Seq[Float], b: Seq[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    for ((id, v) <- vecs) {
      val expected = (0 until 2).map { j =>
        val sub = v.slice(j * 2, j * 2 + 2)
        cents(j).zipWithIndex.minBy { case (c, i) => (l2Local(sub, c), i) }._2.toByte
      }
      assert(got(id) == expected, s"vec $id")
    }
  }

  test("PQ codes above 127 wrap into the signed byte and still rank correctly") {
    // 300 vectors, nCodes = 200: codes 128..199 are stored as negative
    // bytes; the ADC lookup masks with & 0xFF, so full-shortlist rerank
    // must still equal brute force — and the wrap must actually occur
    val big = (0L until 300L).map { i =>
      val r = new scala.util.Random(77 + i)
      i -> Seq.fill(4)(r.nextFloat() * 2 - 1)
    }
    val bigDf = big.toDF("vec_id", "embedding")
    val cents = Similarity.pqCodebooks(bigDf, "vec_id", "embedding", dim = 4,
      m = 2, nCodes = 200, iters = 0)
    val codes = Similarity.withPqCodes(bigDf, "embedding", 4, cents)
      .select("pq_code").collect().flatMap(_.getSeq[Byte](0))
    assert(codes.exists(_ < 0), "fixture must exercise the signed-byte wrap")
    val q = big(5)._2
    val exact = Similarity.bruteForceTopK(bigDf, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val viaPq = Similarity.pqTopKReranked(bigDf, "vec_id", "embedding", q,
      dim = 4, k = 10, m = 2, nCodes = 200, shortlist = 300)
      .collect().map(_.getLong(0)).toSeq
    assert(viaPq == exact)
  }

  test("lshTopK: the query vector's own bucket contains it (self-recall)") {
    val q = vecs(7)._2
    val got = Similarity.lshTopK(df, "vec_id", "embedding", q,
      dim = 4, k = 3, nBits = 6, maxHammingProbe = 6)
      .collect().map(_.getLong(0)).toSeq
    assert(got.contains(7L))
  }

  test("lshTopK over withSignatures-precomputed columns equals the inline-signature path") {
    val q = vecs(3)._2
    val signed = Similarity.withSignatures(df, "embedding",
      dim = 4, nBits = 6, nTables = 3)
    val pre = Similarity.lshTopK(signed, "vec_id", "embedding", q,
        dim = 4, k = 5, nBits = 6, maxHammingProbe = 2, nTables = 3,
        sigCols = (0 until 3).map(t => s"lsh_sig_$t"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = Similarity.lshTopK(df, "vec_id", "embedding", q,
        dim = 4, k = 5, nBits = 6, maxHammingProbe = 2, nTables = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pre === inline)
    // one signature column name per table, enforced up front
    val ex = intercept[IllegalArgumentException] {
      Similarity.lshTopK(signed, "vec_id", "embedding", q,
        dim = 4, k = 5, nBits = 6, nTables = 3, sigCols = Seq("lsh_sig_0"))
    }
    assert(ex.getMessage.contains("one precomputed signature column"))
  }

  test("ivfTopK with full probing equals brute force") {
    val q = vecs(3)._2
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", q,
      k = 5, nCentroids = 8, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf === exact)
  }

  test("embeddingNearDupsViaLsh finds near-identical vectors without a cross join") {
    val base = vecs.toMap
    val withDup = (vecs :+ (100L -> base(5L).map(x => x * 1.0001f))).toDF("vec_id", "embedding")
    val pairs = graft.dedup.Dedup.embeddingNearDupsViaLsh(
        withDup, "vec_id", "embedding", dim = 4, threshold = 0.9999, nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 100L)))
  }

  test("ivfTopK with narrow probing still finds the query's own cell") {
    val q = vecs(11)._2
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", q,
      k = 3, nCentroids = 8, nProbe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf.contains(11L))
    assert(ivf.size === 3)
  }

  test("standardizeEmbeddings: per-dim mean 0 / std 1; constant dim pins to 0") {
    // dim 0 dominant (scale 100), dim 1 small, dim 2 CONSTANT
    val rows = Seq(
      (1L, Array(100.0f, 0.1f, 7.0f)), (2L, Array(300.0f, 0.3f, 7.0f)),
      (3L, Array(200.0f, 0.2f, 7.0f)), (4L, Array(400.0f, 0.4f, 7.0f)))
    val out = Similarity.standardizeEmbeddings(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val byDim = (0 until 3).map(d => out.values.map(_(d)).toSeq)
    byDim.take(2).foreach { xs =>
      assert(math.abs(xs.sum / xs.length) < 1e-4, s"mean ~ 0: $xs")
      val sd = math.sqrt(xs.map(x => x * x).sum / xs.length)
      assert(math.abs(sd - 1.0) < 1e-4, s"std ~ 1: $xs")
    }
    assert(byDim(2).forall(_ == 0.0), "zero-variance dim must pin to 0")
    // the dominant dimension no longer dominates: same z-spread as dim 1
    assert(byDim(0).map(math.abs).max <= byDim(1).map(math.abs).max + 1e-9)
  }

  test("vec_zscore codegen expression is bit-identical to the relational transform form") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val rows = (1L to 200L).map(i =>
      (i, Array.fill(16)((rnd.nextGaussian() * (1 + i % 5)).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val mus = Array.tabulate(16)(d => rnd.nextGaussian())
    val sds = Array.tabulate(16)(d => 0.5 + rnd.nextDouble())
    val fused = df.select(col("vec_id"),
        org.apache.spark.sql.GraftBridge.column(graft.expressions.VecZScore(
          org.apache.spark.sql.GraftBridge.expression(col("embedding")),
          mus, sds, 5)).as("z"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val relational = df.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          round((x.cast("double") - element_at(typedlit(mus.toSeq), i + 1))
            / element_at(typedlit(sds.toSeq), i + 1), 5)).as("z"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fused === relational)
  }

  // 64-dim clustered corpus for the quantized/truncated retrieval paths:
  // every dimension's SIGN carries cluster signal (a ±1 pattern per
  // cluster, magnitude jittered) — the shape of real normalized
  // embeddings, and the regime 1-bit quantization is designed for; a
  // corpus whose noise dims straddle zero would flip bits at random
  private lazy val wide: Seq[(Long, Seq[Float])] = (0L until 300L).map { i =>
    val r = new scala.util.Random(7000 + i)
    val c = i % 6
    i -> Seq.tabulate(64) { d =>
      val sign =
        if (graft.functions.VectorFunctions.splitmix64(c * 131L + d) > 0) 1f
        else -1f
      // energy front-loaded into the first half — the matryoshka
      // training objective's defining property, which is what makes
      // prefix truncation a valid coarse embedding
      val scale = if (d < 32) 1f else 0.3f
      (sign * (0.4f + r.nextFloat()) + (r.nextFloat() - 0.5f) * 0.3f) * scale
    }
  }
  private lazy val wideDf = wide.toDF("vec_id", "embedding").cache()

  test("binarySignature matches the driver-side twin bit for bit") {
    import org.apache.spark.sql.functions._
    val got = wideDf.select(col("vec_id"),
        graft.functions.VectorFunctions.binarySignature(col("embedding"), 64)
          .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    wide.foreach { case (id, v) =>
      assert(got(id) ==
        graft.functions.VectorFunctions.binarySignatureLocal(v),
        s"signature drift at vec $id")
      got(id).foreach(w => assert(w >= 0L, "packed words must stay sign-safe"))
    }
  }

  test("binaryTopK equals the local hamming model; truncatedTopK at full dim equals brute force") {
    val q = wide.head._2
    def localHamming(v: Seq[Float]): Long =
      graft.functions.VectorFunctions.binarySignatureLocal(v)
        .zip(graft.functions.VectorFunctions.binarySignatureLocal(q))
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum
    val expected = wide.map { case (id, v) => (localHamming(v), id) }
      .sorted.take(10).map { case (h, id) => id -> h }
    val got = Similarity.binaryTopK(wideDf, "vec_id", "embedding", q, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expected)
    val full = Similarity.bruteForceTopK(wideDf, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val trunc = Similarity.truncatedTopK(wideDf, "vec_id", "embedding", q,
      d = 64, k = 10).collect().map(_.getLong(0)).toSeq
    assert(trunc == full, "d == dim truncation must be exact retrieval")
  }

  test("sq8: codes in range, reconstruction within half a step, near-exact recall") {
    import org.apache.spark.sql.functions._
    val (mins, maxs) = Similarity.sq8Train(wideDf, "embedding", 64)
    mins.zip(maxs).foreach { case (mn, mx) => assert(mn <= mx) }
    // codes stay in [0, 255]; decode error is bounded by half a
    // quantization step per dimension
    val decErr = wideDf.select(col("vec_id"), col("embedding"),
        Similarity.sq8Codes(col("embedding"), mins, maxs).as("codes"))
      .collect()
    decErr.foreach { r =>
      val v = r.getSeq[Float](1); val c = r.getSeq[Int](2)
      c.zipWithIndex.foreach { case (code, d) =>
        assert(code >= 0 && code <= 255)
        val step = (maxs(d) - mins(d)) / 255.0
        val dec = mins(d) + code * (maxs(d) - mins(d)) / 255.0
        assert(math.abs(dec - v(d)) <= step / 2 + 1e-9,
          s"reconstruction out of bounds at dim $d")
      }
    }
    // 8 bits barely disturb cosine order: recall@10 stays ~exact where
    // 1-bit needed a rescore
    val rs = (0 until 10).map { k =>
      val q = wide(k * 29)._2
      val exact = Similarity.bruteForceTopK(wideDf, "vec_id", "embedding",
        q, 10).collect().map(_.getLong(0)).toSet
      val sq = Similarity.sq8TopK(wideDf, "vec_id", "embedding", q,
        mins, maxs, 10).collect().map(_.getLong(0)).toSet
      (sq & exact).size / 10.0
    }
    val avg = rs.sum / rs.length
    assert(avg >= 0.9, s"sq8 recall@10 collapsed: $avg")
  }

  test("quantized paths keep recall@10 on the clustered corpus") {
    import org.apache.spark.sql.functions._
    def recall(approx: Seq[Long], exact: Seq[Long]): Double =
      approx.toSet.intersect(exact.toSet).size.toDouble / exact.size
    val rs = (0 until 10).map { k =>
      val q = wide(k * 29)._2
      val exact = Similarity.bruteForceTopK(wideDf, "vec_id", "embedding",
        q, 10).collect().map(_.getLong(0)).toSeq
      // the production binary pattern: 1-bit shortlist (5x over-fetch),
      // then float rescore of the survivors — raw 1-bit top-10 alone
      // loses fine order by design (~0.4 here), which is WHY serving
      // stacks always rescore
      val shortlist = Similarity.binaryTopK(wideDf, "vec_id", "embedding",
        q, 50).collect().map(_.getLong(0)).toSet
      val rescored = Similarity.bruteForceTopK(
          wideDf.filter(col("vec_id").isInCollection(shortlist)),
          "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSeq
      val tr = Similarity.truncatedTopK(wideDf, "vec_id", "embedding", q,
        d = 32, k = 10).collect().map(_.getLong(0)).toSeq
      (recall(rescored, exact), recall(tr, exact))
    }
    val binAvg = rs.map(_._1).sum / rs.length
    val trAvg = rs.map(_._2).sum / rs.length
    assert(binAvg >= 0.9, s"binary shortlist+rescore recall@10 collapsed: $binAvg")
    assert(trAvg >= 0.7, s"truncated-32 recall@10 collapsed: $trAvg")
  }

  test("rrfFuse matches the local reciprocal-rank model") {
    // list A ranks 10,20,30; list B ranks 20,40 — 20 is the only overlap
    val a = Seq((10L, 3.0), (20L, 2.0), (30L, 1.0)).toDF("doc_id", "score")
    val b = Seq((20L, 9.0), (40L, 8.0)).toDF("doc_id", "score")
    val got = Similarity.rrfFuse(Seq(a, b), "doc_id", "score", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    def c(rank: Int) = 1.0 / (60 + rank)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(
      20L -> r6(c(2) + c(1)), // present in both lists
      10L -> r6(c(1)), 40L -> r6(c(2)), 30L -> r6(c(3)))
      .sortBy { case (id, s) => (-s, id) }
    assert(got === expected)
  }

  test("rrfFuse rank ties break by id and absent docs contribute nothing") {
    val a = Seq((7L, 5.0), (3L, 5.0)).toDF("doc_id", "score") // tie: 3 ranks first
    val got = Similarity.rrfFuse(Seq(a), "doc_id", "score", k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(3L -> r6(1.0 / 61), 7L -> r6(1.0 / 62)))
  }

  test("rrfFuse ENFORCES the shortlist contract at execution time") {
    // a corpus-sized frame passed as a "shortlist" must fail loudly, not
    // silently plan a single-partition global sort (the mmrSelect
    // maxShortlist precedent) — and with zero extra actions for compliant
    // inputs (no count() re-executing the upstream top-k scan)
    val big = (1L to 50L).map(i => (i, i.toDouble)).toDF("doc_id", "score")
    val ok = Similarity.rrfFuse(Seq(big), "doc_id", "score", k = 3,
      maxShortlist = 50).collect()
    assert(ok.length === 3)
    val e = intercept[Exception] {
      Similarity.rrfFuse(Seq(big), "doc_id", "score", k = 3,
        maxShortlist = 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("maxShortlist")),
      s"expected the shortlist-contract assert, got: $e")
  }

  test("mmrSelect at lambda=1 is pure relevance — the brute-force order") {
    val q = vecs.head._2
    val mmr = Similarity.mmrSelect(df, "vec_id", "embedding", q,
        m = 10, k = 5, lambda = 1.0, roundTo = 5)
      .collect().map(_.getLong(1)).toSeq
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q,
        5, roundTo = 5).collect().map(_.getLong(0)).toSeq
    assert(mmr === exact)
  }

  test("mmrSelect skips a planted near-duplicate that plain top-k keeps") {
    // corpus: the query's clone, a SECOND clone, and a diverse 45° vector
    // — relevance top-2 is the clone pair; MMR's diversity term pushes
    // the redundant second clone below the diverse vector. Note when the
    // first pick ≈ q, a clone's step-2 score is exactly 2λ−1 while a
    // diverse candidate's is ≈ (2λ−1)·rel — so the diversity trade only
    // bites at λ < 0.5
    val q = Seq(1f, 0f, 0f, 0f)
    val planted = Seq(
      1L -> Seq(1f, 0.001f, 0f, 0f),
      2L -> Seq(1f, 0f, 0.001f, 0f),
      3L -> Seq(1f, 1f, 0f, 0f)).toDF("vec_id", "embedding")
    val top2 = Similarity.bruteForceTopK(planted, "vec_id", "embedding",
      q, 2).collect().map(_.getLong(0)).toSet
    val mmr2 = Similarity.mmrSelect(planted, "vec_id", "embedding", q,
        m = 3, k = 2, lambda = 0.3)
      .collect().map(_.getLong(1)).toSeq
    assert(top2 === Set(1L, 2L))
    assert(mmr2.head === 1L, "first MMR pick is the most relevant")
    assert(mmr2(1) === 3L, "second pick trades relevance for diversity")
  }

  test("mmrSelect returns selection order with monotone first-pick score") {
    val q = vecs.head._2
    val rows = Similarity.mmrSelect(df, "vec_id", "embedding", q, m = 12, k = 4)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    // first pick is lambda * max-rel; later picks pay the diversity tax
    assert(rows.tail.forall(_.getDouble(2) <= rows.head.getDouble(2)))
  }

  test("mmrSelect rejects an unbounded shortlist") {
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(df, "vec_id", "embedding", vecs.head._2,
        m = 5000, k = 5, maxShortlist = 4096)
    }
    assert(e.getMessage.contains("maxShortlist"))
  }
}
