package graft.trainprep

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.trainprep.CorpusOverlap._

/** The minhash_sketch group aggregate: hash-family parity with the
  * per-row minhash_sigs expression, bit-equality with the relational
  * explode+groupBy formulation (including under forced partial/merge),
  * estimator sanity against exact Jaccard, and NULL/empty-group algebra. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the quick brown fox jumps"),
    (2L, "en", "the lazy dog sleeps"),
    (3L, "de", "der schnelle braune fuchs"),
    (4L, "de", "the quick brown fox rests"),
    (5L, "fr", null.asInstanceOf[String])
  ).toDF("doc_id", "lang", "text")

  test("a single-row group's sketch equals that row's minhash_sigs signature") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("sketch_docs")
    val perRow = spark.sql(
      "SELECT doc_id, minhash_sigs(text, 8) AS sig FROM sketch_docs WHERE doc_id = 1")
      .head().getSeq[Long](1)
    val grouped = docs.filter(col("doc_id") === 1)
      .groupBy("doc_id").agg(minhashSketch(col("text"), 8).as("sk"))
      .head().getSeq[Long](1)
    assert(grouped == perRow)
  }

  test("sketch equals the relational explode+min formulation, incl. under merges") {
    val mins = (0 until 8).map(k =>
      min(xxhash64(lit(k), col("tok"))).as(s"m$k"))
    val relational = docs.filter(col("text").isNotNull)
      .select(col("lang"), explode(split(col("text"), " ", -1)).as("tok"))
      .groupBy("lang")
      .agg(mins.head, mins.tail: _*)
      .collect()
      .map(r => r.getString(0) -> (1 to 8).map(r.getLong)).toMap
    // repartition(7) forces partial buffers on separate tasks → real merges
    val sketched = docs.repartition(7)
      .groupBy("lang").agg(minhashSketch(col("text"), 8).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (l <- Seq("en", "de"))
      assert(sketched(l) == relational(l), s"lang $l")
    // a NULL-only group has the empty sketch (all Long.MaxValue)
    assert(sketched("fr") == Seq.fill(8)(Long.MaxValue))
  }

  test("sketch estimate tracks exact Jaccard on slices with known overlap") {
    // two slices sharing exactly half their vocabulary union
    val half = Seq(
      (1L, "a", "w1 w2 w3 w4 w5 w6"),
      (2L, "b", "w1 w2 w3 w7 w8 w9")
    ).toDF("doc_id", "slice", "text")
    val exact = sliceOverlapExact(half, "slice", "text")
      .head().getDouble(2)
    assert(exact === 0.333333) // 3/9, rounded to 6 places by the operator
    val est = sliceOverlapSketched(half, "slice", "text", numHashes = 512)
      .head().getDouble(2)
    // deterministic hashes → reproducible estimate; 512 components give
    // σ ≈ 0.021, assert within 5σ of the true 1/3
    assert(math.abs(est - exact) < 0.11, s"estimate $est vs exact $exact")
    // identical slices estimate 1 exactly, disjoint ones sit near 0
    val same = Seq((1L, "a", "x y z"), (2L, "b", "x y z"))
      .toDF("doc_id", "slice", "text")
    assert(sliceOverlapSketched(same, "slice", "text", 16)
      .head().getDouble(2) === 1.0)
  }

  test("md5 estimator variant agrees with its own exact twin's support") {
    // every pair of langs shares at least the space-split empty-token-free
    // vocabulary drawn from the same generator, so both variants must
    // produce one row per lang pair with estimates in [0, 1]
    val est = sliceOverlapMd5(docs.filter(col("text").isNotNull),
      "lang", "text", numHashes = 4).collect()
    assert(est.length == 1) // de < en is the only slice pair with tokens
    assert(est.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) <= 1))
  }

  test("HLL distinct estimate lands within the m=256 error band of the exact count") {
    import spark.implicits._
    // 5000 distinct tokens in one group — far above the linear-counting
    // regime, so this exercises the raw harmonic-mean estimator
    val corpus = (0 until 500).map { i =>
      (i.toLong, "g", (0 until 10).map(j => s"tok_${i * 10 + j}").mkString(" "))
    }.toDF("doc_id", "grp", "text")
    val est = CorpusOverlap.hllDistinctTokens(corpus, "grp", "text")
      .head().getDouble(1)
    val exact = 5000.0
    val relErr = math.abs(est - exact) / exact
    info(f"HLL estimate $est%.1f vs exact $exact%.0f (rel err $relErr%.4f)")
    // σ ≈ 1.04/√256 ≈ 6.5%; assert within 4σ — deterministic hashes make
    // this reproducible, not flaky
    assert(relErr < 0.26, s"estimate $est too far from $exact")
    // small-range regime: few distincts → linear counting, much tighter
    val small = Seq((1L, "g", "a b c d e")).toDF("doc_id", "grp", "text")
    val estSmall = CorpusOverlap.hllDistinctTokens(small, "grp", "text")
      .head().getDouble(1)
    assert(math.abs(estSmall - 5.0) < 1.0, s"linear-counting estimate $estSmall")
  }

  test("CMS never underestimates and is exact on heavy hitters here") {
    import spark.implicits._
    // skewed corpus: token "hot" appears 1000×, 200 rare tokens once each
    val corpus = ((0 until 100).map(i => (i.toLong, Seq.fill(10)("hot").mkString(" ")))
      ++ (0 until 200).map(i => (1000L + i, s"rare_$i"))).toDF("doc_id", "text")
    val cms = CorpusOverlap.cmsTokenCounts(corpus, "text")
    // the sketch is depth×256 counters however many tokens went in
    assert(cms.count() <= 4L * 256L)
    val queries = ("hot" +: (0 until 200).map(i => s"rare_$i")).toDF("token")
    val est = CorpusOverlap.cmsEstimate(cms, queries, "token")
      .as[(String, Long)].collect().toMap
    val exact = Map("hot" -> 1000L) ++ (0 until 200).map(i => s"rare_$i" -> 1L)
    // CMS property: estimates are exact-or-over, never under
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t estimated ${est(t)} below true $c")
    }
    // the heavy hitter dominates its cells, so its estimate is exact
    assert(est("hot") == 1000L)
    // collision inflation stays bounded: corpus/width per row
    val worst = exact.map { case (t, c) => est(t) - c }.max
    info(s"max CMS overestimate: $worst (corpus 3000 tokens / 256 buckets)")
    assert(worst <= 3000 / 256 * 4 + 50, s"overestimate $worst out of band")
    // the xxhash64 production twin shares every CMS property
    val fast = CorpusOverlap.cmsEstimateFast(
      CorpusOverlap.cmsTokenCountsFast(corpus, "text"), queries, "token")
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) =>
      assert(fast(t) >= c, s"fast variant: $t estimated ${fast(t)} below true $c")
    }
    assert(fast("hot") == 1000L)
  }

  test("CMS estimates unseen tokens as 0 when a cell is empty (left-join semantics)") {
    import spark.implicits._
    // sparse sketch: 5 distinct tokens → ~5/256 buckets occupied per row,
    // so an unseen token almost surely hits an empty cell in one of the 4
    // rows — a deterministic check that empty cells count as 0 instead of
    // being dropped from the min
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    for ((build, est) <- Seq[(org.apache.spark.sql.DataFrame,
        (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, String)
          => org.apache.spark.sql.DataFrame)](
        (CorpusOverlap.cmsTokenCounts(corpus, "text"),
          (c, q, t) => CorpusOverlap.cmsEstimate(c, q, t)),
        (CorpusOverlap.cmsTokenCountsFast(corpus, "text"),
          (c, q, t) => CorpusOverlap.cmsEstimateFast(c, q, t)))) {
      val got = est(build, Seq("zzz_never_seen").toDF("token"), "token")
        .as[(String, Long)].collect().toMap
      assert(got.contains("zzz_never_seen"),
        "an all-empty-cells token must still return a row")
      assert(got("zzz_never_seen") == 0L,
        s"unseen token must estimate 0, got ${got("zzz_never_seen")}")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("bottomKSample: deterministic md5 bottom-k, mergeable across shards") {
    val rows = (0L until 1000L).map(i => (i, i % 97))
    val df = rows.toDF("id", "m")
    val got = bottomKSample(df, "id", 50).select("id")
      .collect().map(_.getLong(0)).toSet
    val want = rows.map(_._1).sortBy(i => md5hex(i.toString)).take(50).toSet
    assert(got === want)
    // mergeability: bottom-k over per-shard bottom-k == global bottom-k
    val shardA = bottomKSample(df.filter(col("id") < 500), "id", 50).drop("__h")
    val shardB = bottomKSample(df.filter(col("id") >= 500), "id", 50).drop("__h")
    val merged = bottomKSample(shardA.unionByName(shardB), "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(merged === want)
  }

  test("tokenDrift: zero on identical slices, positive and asymmetric on drifted ones") {
    val en = Seq((1L, "alpha beta gamma alpha"), (2L, "beta gamma delta")).toDF("id", "text")
    val de = Seq((3L, "eins eins eins zwei"), (4L, "zwei drei")).toDF("id", "text")
    val same = tokenDrift(en, en, "text").head()
    assert(same.getDouble(3) === 0.0, "identical distributions must have KL 0")
    val ab = tokenDrift(en, de, "text").head()
    val ba = tokenDrift(de, en, "text").head()
    assert(ab.getDouble(3) > 0.0 && ba.getDouble(3) > 0.0)
    assert(ab.getDouble(3) !== ba.getDouble(3), "KL is asymmetric")
    // union vocab and totals are reported alongside
    assert(ab.getLong(0) === 7L) // 4 en + 3 de distinct tokens, disjoint
    assert(ab.getLong(1) === 7L && ab.getLong(2) === 6L)
  }

  test("heavyHittersExact equals brute force; the sketch only prunes the shuffle") {
    // planted frequencies: "hot" 40×, "warm" 12×, everything else < 10
    val corpus = ((1 to 40).map(i => (i.toLong, "hot x" + i)) ++
      (41 to 52).map(i => (i.toLong, "warm y" + i)) ++
      (53 to 60).map(i => (i.toLong, "cold z" + i))).toDF("id", "text")
    val got = heavyHittersExact(corpus, "text", minCount = 12)
      .as[(String, Long)].collect().toMap
    assert(got === Map("hot" -> 40L, "warm" -> 12L))
    // threshold above every count → empty, not an error
    assert(heavyHittersExact(corpus, "text", minCount = 1000).count() === 0L)
  }

  test("groupQuantiles: per-group ranks match per-group local computation") {
    val rows = (0L until 600L).map(i => (i, s"g${i % 3}", i % 101))
    val got = groupQuantiles(rows.toDF("id", "g", "m"), "g", "id", "m",
        k = 40, qs = Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val vals = rows.filter(_._2 == g)
        .sortBy(t => md5hex(t._1.toString)).take(40).map(_._3).sorted
      val (n, p50, p90) = got(g)
      assert(n === 40L)
      assert(p50 === vals(math.ceil(0.5 * 40).toInt - 1), g)
      assert(p90 === vals(math.ceil(0.9 * 40).toInt - 1), g)
    }
  }

  test("kmvQuantiles: exact inverted-CDF ranks over the sample") {
    val rows = (0L until 1000L).map(i => (i, i % 97))
    val sample = bottomKSample(rows.toDF("id", "m"), "id", 50)
    val r = kmvQuantiles(sample, "m", Seq(0.5, 0.9)).head()
    assert(r.getLong(0) === 50L)
    val vals = rows.sortBy(t => md5hex(t._1.toString)).take(50)
      .map(_._2).sorted
    assert(r.getLong(1) === vals(math.ceil(0.5 * 50).toInt - 1)) // p50
    assert(r.getLong(2) === vals(math.ceil(0.9 * 50).toInt - 1)) // p90
    // a sample smaller than k: n reflects reality, ranks stay in range
    val tiny = bottomKSample(rows.take(3).toDF("id", "m"), "id", 50)
    val t = kmvQuantiles(tiny, "m", Seq(1.0)).head()
    assert(t.getLong(0) === 3L && t.getLong(1) === rows.take(3).map(_._2).max)
  }

  test("topTokensPerGroup: per-group isolation, count ordering, token tiebreak") {
    val d = Seq(
      ("en", "a a a b b c"),
      ("de", "x x y"),
      ("de", "y z")).toDF("lang", "text")
    val got = CorpusOverlap.topTokensPerGroup(d, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(3)) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got(("en", 1)) == ("a", 3L) && got(("en", 2)) == ("b", 2L))
    // de: x and y tie at 2 — token asc breaks it
    assert(got(("de", 1)) == ("x", 2L) && got(("de", 2)) == ("y", 2L))
    assert(got.size == 4, "k cuts per group, groups never mix")
  }
}
