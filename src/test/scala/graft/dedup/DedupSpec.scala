package graft.dedup

import graft.SparkSpec

/** Dedup operators: exact groups, the full MinHash→LSH→verify→keeper
  * pipeline, and SimHash similarity ordering. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),    // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),    // near dup of 1/2
    (4L, "completely different text about spark engines"),
    (5L, "another unrelated document mentioning parquet files")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under the min id") {
    val m = Dedup.exact(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m(1L) === 2L) // keeper 1 covers docs 1,2
    assert(m.values.sum === 5L)
  }

  test("nearDupKeepers maps exact+near dups to the smallest verified id") {
    val keepers = Dedup.nearDupKeepers(corpus, "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(1L) === 1L)
    assert(keepers(2L) === 1L) // exact dup collides in every band
    assert(keepers(3L) === 1L) // near dup (8/10 token Jaccard = 0.8 ≥ 0.6)
    assert(keepers(4L) === 4L)
    assert(keepers(5L) === 5L)
  }

  test("fastHash pipeline finds the same keepers, with no SortAggregate in the plan") {
    val fast = Dedup.nearDupKeepers(corpus, "doc_id", "text",
      numHashes = 8, rowsPerBand = 2, threshold = 0.6, hashFn = Dedup.fastHash)
    val keepers = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
    // the signature min() over LONGs must stay a HashAggregate — min(string)
    // of the md5 oracle path degrades to Sort + SortAggregate over the whole
    // exploded token stream, which is the at-scale cost this path removes
    val sigPlan = Dedup.minhashSignature(corpus, "doc_id", "text", 8, Dedup.fastHash)
      .queryExecution.executedPlan.toString
    assert(!sigPlan.contains("SortAggregate"), sigPlan)
    assert(sigPlan.contains("HashAggregate"), sigPlan)
  }

  test("nearDupKeepers with threshold 1.0 keeps only exact duplicates together") {
    val keepers = Dedup.nearDupKeepers(corpus, "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(2L) === 1L)
    assert(keepers(3L) === 3L) // near dup no longer qualifies
  }

  test("connectedComponents collapses chains to the minimum reachable id") {
    val edges = Seq((2L, 1L), (2L, 3L), (7L, 8L), (9L, 8L), (20L, 21L))
      .toDF("src", "dst")
    val comps = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(comps(7L) === 7L && comps(8L) === 7L && comps(9L) === 7L)
    assert(comps(20L) === 20L && comps(21L) === 20L)
  }

  test("star-contraction CC matches the min-label formulation oracle on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 60
      // raw random edges: duplicates happen, self-loops kept — both
      // implementations must agree on the full contract. Run the bounded
      // local-finish path (default) AND the fully distributed rounds
      // (localFinishEdges = 0): identical labels from both.
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .toDF("src", "dst")
      val local = Dedup.connectedComponents(edges, maxIter = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponents(edges, maxIter = 20,
          localFinishEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oracle = Dedup.connectedComponentsMinLabel(edges, maxIter = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === oracle)
      assert(star === oracle)
    }
  }

  test("connectedComponents fails loudly when maxIter is exhausted") {
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      // localFinishEdges = 0: the 39-edge chain would otherwise be
      // closed driver-side before any distributed round could run out
      Dedup.connectedComponents(chain, maxIter = 1, localFinishEdges = 0)
        .count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("an empty edge list converges to empty labels, not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }

  test("a vertex with only self-loops is a singleton component, not dropped") {
    val edges = Seq((2L, 1L), (5L, 5L), (1L, 1L)).toDF("src", "dst")
    val comps = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }

  test("star contraction collapses a diameter-40 chain within 8 rounds") {
    // min-label propagation needs O(diameter) iterations on a path graph;
    // the alternating star algorithm is logarithmic — this converging at
    // maxIter = 8 is exactly the contraction property the rewrite buys
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("src", "dst")
    val comps = Dedup.connectedComponents(chain, maxIter = 8,
        localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length === 40)
    assert(comps.forall(_._2 === 0L))
  }

  test("nearDupKeepersTransitive collapses duplicate chains to one keeper") {
    // 1≈2 (exact), 2≈3 (near): transitive closure puts all three under 1
    val keepers = Dedup.nearDupKeepersTransitive(corpus, "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(1L) === 1L && keepers(2L) === 1L && keepers(3L) === 1L)
    assert(keepers(4L) === 4L && keepers(5L) === 5L)
  }

  test("rowwise transitive keepers match the md5-oracle path at threshold 1.0") {
    // at 1.0 the verified pairs are exactly the exact-dup groups under ANY
    // hash family (identical signatures share every band; chance collisions
    // die at the Jaccard=1 verify) — so the zero-shuffle production path
    // must produce the same keepers as the md5 formulation
    val dup = corpus.unionByName(
      corpus.filter($"doc_id" <= 3).withColumn("doc_id", $"doc_id" + 100))
    val md5Path = Dedup.nearDupKeepersTransitive(dup, "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rowwise = Dedup.nearDupKeepersTransitiveRowwise(dup, "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rowwise === md5Path)
    // transitive semantics survive: 101/102 (dups of 1/2) collapse under 1
    assert(rowwise.contains((101L, 1L)) && rowwise.contains((102L, 1L)))
  }

  test("embeddingNearDupKeepers: cosine chains collapse transitively") {
    // unit vectors at 0°, 15°, 30°, 90°: adjacent cosines ≈ 0.966 pass the
    // 0.9 threshold, the 0°–30° cosine (0.866) does not — vec 3 joins vec 1
    // only through the chain, which is exactly what the CC closure adds
    def at(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    val vecs = Seq((1L, at(0)), (2L, at(15)), (3L, at(30)), (4L, at(90)))
      .toDF("vec_id", "embedding")
    val keepers = Dedup.embeddingNearDupKeepers(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("keepersFromPairs works when the id universe is keyed by the common name 'id'") {
    // CC's own output carries an "id" column — the compose point must not
    // produce an ambiguous-reference error for callers keyed the same way
    val ids = Seq(1L, 2L, 3L, 9L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val keepers = Dedup.keepersFromPairs(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("simhash64: identical texts share a hash; near texts are closer than far ones") {
    val h = Dedup.simhash64(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(3L)) < hamming(h(1L), h(4L)))
  }

  test("lshCandidateGroups only emits buckets with >1 member") {
    val sig = Dedup.minhashSignature(corpus, "doc_id", "text", 8)
    val groups = Dedup.lshCandidateGroups(sig, "doc_id", 8, 2).collect()
    assert(groups.nonEmpty)
    assert(groups.forall(_.getLong(3) > 1))
    // docs 1 and 2 are identical → some band groups them
    assert(groups.exists(r => r.getSeq[Long](2).containsSlice(Seq(1L, 2L))))
  }

  test("lshCandidateGroups mega-bucket cap drops oversize buckets whole") {
    val sig = Dedup.minhashSignature(corpus, "doc_id", "text", 8)
    val all = Dedup.lshCandidateGroups(sig, "doc_id", 8, 2).collect()
    val maxN = all.map(_.getLong(3)).max
    val capped = Dedup.lshCandidateGroups(sig, "doc_id", 8, 2,
      maxBucketSize = (maxN - 1).toInt).collect()
    // buckets above the cap vanish entirely (under-merge, never truncate)
    assert(capped.forall(_.getLong(3) < maxN))
    assert(capped.length == all.count(_.getLong(3) < maxN))
  }

  /** Template-spam fixture: `n` DISTINCT texts (multiset varies with the
    * bits of i) over one shared token SET — they survive exact-dup
    * collapse, share every MinHash component (duplicate tokens cannot
    * change a min), and so land in ONE bucket per band with pairwise
    * Jaccard 1.0. The worst case the mega-bucket guardrail exists for.
    * Two extra docs over a DIFFERENT shared token set form one small
    * legitimate near-dup pair, keeping the verified-pairs branch non-empty
    * (an all-empty branch is pruned by AQE together with its audit metric
    * — see ObservationPruningSpec). */
  private def spamDocs(n: Int) = {
    val toks = (0 until 14).map(j => s"tok$j")
    val spam = (0 until n).map { i =>
      val text = toks.zipWithIndex
        .flatMap { case (t, j) => Seq.fill(((i >> j) & 1) + 1)(t) }
        .mkString(" ")
      (i.toLong, text)
    }
    val pair = Seq(
      (1000000L, "pairtok0 pairtok1 pairtok2 pairtok3"),
      (1000001L, "pairtok0 pairtok0 pairtok1 pairtok2 pairtok3"))
    (spam ++ pair).toDF("doc_id", "text")
  }

  test("default-capped rowwise run on template spam drops the mega-bucket and reports it in-pass") {
    // 10 050 distinct spam texts > DefaultMaxBucketSize: an argument-free
    // production run must NOT attempt the ~5·10⁷-pair verification — the
    // bucket is dropped whole (every spam doc keeps itself) and the drop
    // count is observed in the same pass, not by a second banding job.
    assert(Dedup.DefaultMaxBucketSize == 10000)
    val n = Dedup.DefaultMaxBucketSize + 50
    val obs = org.apache.spark.sql.Observation("graft_oversize_spec")
    val keepers = Dedup.nearDupKeepersRowwise(spamDocs(n), "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 0.8,
        oversizeObs = Some(obs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers.size == n + 2)
    assert((0 until n).forall(i => keepers(i.toLong) == i.toLong),
      "a dropped bucket must under-merge, never partially merge")
    assert(keepers(1000001L) == 1000000L, "small legitimate buckets still verify")
    // 8 hashes / 2 rows-per-band = 4 bands, each one oversize spam bucket;
    // the size filter must not push through the CollectMetrics node, so
    // the metric sees all four (the pair's size-2 buckets are kept)
    val m = obs.get
    assert(m("dropped_buckets") == 4L)
    assert(m("dropped_members") == 4L * n)
    assert(m("max_bucket") == n.toLong)
  }

  test("explicit Int.MaxValue uncaps: the same spam fixture merges to one keeper") {
    val keepers = Dedup.nearDupKeepersRowwise(spamDocs(40), "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, threshold = 0.8,
        maxBucketSize = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers.size == 42)
    assert((0 until 40).forall(i => keepers(i.toLong) == 0L),
      "uncapped, Jaccard-1 spam all merges under doc 0")
    // and a small explicit cap on the transitive path reports its drops too
    val obs = org.apache.spark.sql.Observation("graft_oversize_spec_t")
    val capped = Dedup.nearDupKeepersTransitiveRowwise(spamDocs(40), "doc_id",
        "text", numHashes = 8, rowsPerBand = 2, threshold = 0.8,
        maxBucketSize = 10, oversizeObs = Some(obs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 40).forall(i => capped(i.toLong) == i.toLong))
    assert(capped(1000001L) == 1000000L)
    assert(obs.get("dropped_buckets") == 4L)
  }

  test("paragraphKeepFirst: a paragraph shared by two docs survives only in the first") {
    val docs = Seq(
      (1L, "alpha beta\n\nshared boilerplate line\n\ngamma"),
      (2L, "delta epsilon\n\nshared boilerplate line\n\nzeta")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphKeepFirst(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("alpha beta\n\nshared boilerplate line\n\ngamma", 3L)))
    assert(out(2L) === (("delta epsilon\n\nzeta", 2L)))
  }

  test("paragraphKeepFirst: within-doc repeats, blank paragraphs, NULL and empty texts") {
    val docs = Seq(
      (1L, "p1\n\np2\n\np1\n\n   \n\np3"), // p1 repeats; one all-blank para
      (2L, null.asInstanceOf[String]),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphKeepFirst(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("p1\n\np2\n\np3", 3L)))
    assert(out(2L) === (("", 0L)), "NULL text yields an empty doc row, not a missing one")
    assert(out(3L) === (("", 0L)))
  }

  test("nearDupKeepersBest: the component winner is the highest score, not the lowest id") {
    // docs 1,2,3 are one near-dup cluster; doc 2 is the longest → keeper;
    // docs 10,11 tie on score → lowest id 10 wins; doc 20 is a singleton
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta PLUS EXTRA LENGTH HERE"),
      (3L, "alpha beta gamma delta epsilon zeta eta"),
      (10L, "totally different words one two three"),
      (11L, "totally different words one two three"),
      (20L, "a lone document about nothing shared")
    ).toDF("doc_id", "text")
      .withColumn("score", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    val out = Dedup.nearDupKeepersBest(docs, "doc_id", "text", "score",
        numHashes = 4, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L && out(2L) == 2L && out(3L) == 2L,
      s"longest member must win the cluster: $out")
    assert(out(10L) == 10L && out(11L) == 10L, "score tie breaks to lowest id")
    assert(out(20L) == 20L, "singletons keep themselves")
  }

  test("containmentPairs: asymmetric subset detection, exact vs local brute force") {
    // doc 2 = doc 1 quoted whole inside extra prose: containment(1→2) = 1.0
    // but Jaccard is low; 3 shares a phrase below threshold; 4 is too short
    // for a 3-gram; 5/6 are exact copies (1.0 both ways)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, "intro words first " + base + " trailing commentary here now extra"),
      (3L, "alpha beta gamma completely different tail of words here"),
      (4L, "two words"),
      (5L, "same exact duplicated content spread over many tokens right here"),
      (6L, "same exact duplicated content spread over many tokens right here")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // local brute force over string 3-gram shingle sets
    val sets = Seq(1L -> base, 2L -> ("intro words first " + base +
        " trailing commentary here now extra"),
        3L -> "alpha beta gamma completely different tail of words here",
        4L -> "two words",
        5L -> "same exact duplicated content spread over many tokens right here",
        6L -> "same exact duplicated content spread over many tokens right here")
      .map { case (id, t) =>
        id -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet }
      .filter(_._2.nonEmpty).toMap
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      c = (sa & sb).size.toDouble / sa.size if c >= 0.9
    } yield (a, b) -> (math.rint(c * 1e6) / 1e6)).toMap
    assert(got === want, s"got $got want $want")
    assert(got((1L, 2L)) === 1.0 && !got.contains((2L, 1L)),
      "containment must be directed")
    assert(got((5L, 6L)) === 1.0 && got((6L, 5L)) === 1.0)
  }

  test("winnowCandidatePairs: lifted passage surfaces where MinHash resemblance dilutes") {
    val rnd = new scala.util.Random(19)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val lifted = "this exact passage was copied verbatim between documents"
    // two long docs sharing ONLY the lifted passage (~15% of each), plus
    // an unrelated doc — resemblance-Jaccard over the whole docs is far
    // below any dedup threshold, but winnowing must pair them
    val docs = Seq(
      (1L, noise(150) + " " + lifted + " " + noise(150)),
      (2L, noise(160) + " " + lifted + " " + noise(140)),
      (3L, noise(360))
    ).toDF("doc_id", "text")
    val viaCodegen = Dedup.winnowCandidatePairs(docs, "doc_id", "text",
        k = 8, w = 4, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaCodegen.keySet === Set((1L, 2L)),
      s"only the lifted-passage pair may qualify: $viaCodegen")
    // the guarantee floor: a shared run of L chars yields >= ~(L-k-w+2)/w
    // selected-window hits; 56 shared chars at k=8,w=4 gives >= 5
    assert(viaCodegen((1L, 2L)) >= 5L)
    // md5 relational selection and codegen xxhash64 selection agree on
    // the PAIR STRUCTURE (values differ, counts may differ by ties only)
    val viaMd5 = Dedup.winnowCandidatePairs(docs, "doc_id", "text",
        k = 8, w = 4, minShared = 5, hashFn = Some(org.apache.spark.sql.functions.md5(_)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaMd5 === viaCodegen.keySet)
  }

  test("containmentDrop: subsets drop, twins keep the lower id, chains stay covered") {
    val core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val mid = "start words here " + core + " middle tail words"
    val docs = Seq(
      (1L, core),                                      // ⊂ 2 (chain bottom)
      (2L, mid),                                       // ⊂ 3 (chain middle)
      (3L, "preamble goes first " + mid + " and a much longer ending here"),
      (10L, "identical twin content spread over quite many tokens right here"),
      (11L, "identical twin content spread over quite many tokens right here"),
      (20L, "an unrelated survivor document about nothing shared at all")
    ).toDF("doc_id", "text")
    val kept = Dedup.containmentDrop(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 10L, 20L),
      s"chain collapses to its top, twins keep the lower id: $kept")
  }

  test("containmentDrop matches the rule computed from brute-force pairs on random corpora") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 3) {
      // small vocab + 4-10 token docs: plenty of chance subsets, twins,
      // and mutual near-equals at threshold 0.8
      val docs = (1L to 14L).map { id =>
        val n = 4 + rnd.nextInt(7)
        id -> Seq.fill(n)(s"w${rnd.nextInt(5)}").mkString(" ")
      }
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet }.toMap
      val pairs = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
        if a != b && sa.nonEmpty
        if (sa & sb).size.toDouble / sa.size >= 0.8
      } yield (a, b)).toSet
      // the documented rule: a non-mutual sub drops; of a mutual pair the
      // HIGHER id drops
      val expectDrop = pairs.collect {
        case (sub, sup) if !pairs((sup, sub)) => sub
        case (sub, sup) if pairs((sup, sub)) && sub > sup => sub
      }
      val kept = Dedup.containmentDrop(docs.toDF("doc_id", "text"),
          "doc_id", "text", threshold = 0.8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === docs.map(_._1).toSet -- expectDrop, s"round $round")
    }
  }

  test("boilerplateParagraphRemove matches a naive doc-frequency model on random corpora") {
    val rnd = new scala.util.Random(29)
    for (round <- 1 to 3) {
      val docs = (1L to 12L).map { id =>
        val n = 1 + rnd.nextInt(5)
        id -> Seq.fill(n)(s"para v${rnd.nextInt(6)}").mkString("\n\n")
      }
      val df0 = docs.flatMap { case (id, t) => t.split("\n\n").map(_ -> id) }
        .groupBy(_._1).map { case (p, os) => p -> os.map(_._2).distinct.size }
      val maxDf = 2
      val expected = docs.map { case (id, t) =>
        val paras = t.split("\n\n")
        val kept = paras.filter(p => df0(p) <= maxDf)
        id -> ((kept.mkString("\n\n"), kept.length.toLong,
          (paras.length - kept.length).toLong))
      }.toMap
      val got = Dedup.boilerplateParagraphRemove(docs.toDF("doc_id", "text"),
          "doc_id", "text", maxDocFreq = maxDf)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === expected, s"round $round mismatch")
    }
  }

  test("boilerplateParagraphRemove: frequency threshold, not keep-first") {
    val docs = Seq(
      (1L, "intro one\n\nCOOKIE BANNER\n\nbody a"),
      (2L, "COOKIE BANNER\n\nshared quote\n\nbody b"),
      (3L, "body c\n\nshared quote\n\nCOOKIE BANNER"),
      (4L, "rep\n\nrep\n\nbody d"), // within-doc repeat: doc-frequency 1
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val at2 = Dedup.boilerplateParagraphRemove(docs, "doc_id", "text",
        maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // banner is in 3 docs -> removed everywhere incl. its first occurrence;
    // the quote is in 2 docs -> survives in BOTH (keep-first would keep one)
    assert(at2(1L) === (("intro one\n\nbody a", 2L, 1L)))
    assert(at2(2L) === (("shared quote\n\nbody b", 2L, 1L)))
    assert(at2(3L) === (("body c\n\nshared quote", 2L, 1L)))
    // within-doc repetition is doc-frequency 1: both copies survive
    assert(at2(4L) === (("rep\n\nrep\n\nbody d", 3L, 0L)))
    assert(at2(5L) === (("", 0L, 0L)))
    // tightening to maxDocFreq = 1 also removes the quote from both docs
    val at1 = Dedup.boilerplateParagraphRemove(docs, "doc_id", "text",
        maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at1(2L) === "body b")
    assert(at1(3L) === "body c")
  }

  test("paragraphKeepFirst: fast xxhash64 path matches the md5 oracle path") {
    val docs = Seq(
      (1L, "one two\n\nshared\n\nthree"),
      (2L, "shared\n\nfour five\n\none two"),
      (3L, "six\n\nshared")
    ).toDF("doc_id", "text")
    val md5Out = Dedup.paragraphKeepFirst(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val fastOut = Dedup.paragraphKeepFirst(docs, "doc_id", "text",
        hashFn = Dedup.fastParaHash)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(md5Out === fastOut)
  }

  test("paragraphKeepFirst: maxOccurrences drops boilerplate everywhere and reports it in-pass") {
    val docs = (1 to 6).map(i => (i.toLong, s"unique $i\n\nboiler")).toDF("doc_id", "text")
    val obs = org.apache.spark.sql.Observation("graft_oversize_para")
    val out = Dedup.paragraphKeepFirst(docs, "doc_id", "text",
        maxOccurrences = 5, oversizeObs = Some(obs))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // 'boiler' occurs 6 > 5 times: dropped from EVERY doc, first included
    (1 to 6).foreach(i => assert(out(i.toLong) === ((s"unique $i", 1L))))
    val m = obs.get
    assert(m("dropped_buckets") == 1L)
    assert(m("dropped_members") == 6L)
    assert(m("max_bucket") == 6L)
  }

  test("duplicatedSpans: cross-doc spans flagged with first-occurrence keep; within-doc needs crossDocOnly=false") {
    val docs = Seq(
      // docs 1 and 2 share exactly the 4-token sentence "w x y z"
      (1L, "a b c w x y z d"),
      (2L, "p q w x y z r s"),
      // doc 3 repeats its own 4-token span twice, shares nothing
      (3L, "m n o t m n o t")
    ).toDF("doc_id", "text")
    val cross = Dedup.duplicatedSpans(docs, "doc_id", "text", windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3))).toSet
    // the shared window at doc 1 pos 3 / doc 2 pos 2; keep = doc 1's
    assert(cross === Set((1L, 3, true), (2L, 2, false)))
    val within = Dedup.duplicatedSpans(docs, "doc_id", "text",
        windowTokens = 4, crossDocOnly = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3))).toSet
    assert(within.contains((3L, 0, true)) && within.contains((3L, 4, false)),
      "within-doc repetition surfaces when crossDocOnly is off")
    assert(within.contains((1L, 3, true)) && within.contains((2L, 2, false)),
      "the cross-doc pair is still present")
    assert(within.size === 4)
  }

  test("duplicatedSpans: xxhash64 fast path marks the same occurrences as md5") {
    val docs = Seq(
      (1L, "a b c w x y z d"),
      (2L, "p q w x y z r s")
    ).toDF("doc_id", "text")
    def occ(hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Dedup.duplicatedSpans(docs, "doc_id", "text", 4, hashFn = hashFn)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3))).toSet
    assert(occ(Dedup.oracleParaHash) === occ(Dedup.fastParaHash))
  }

  test("removeDuplicatedSpans: overlapping later occurrences merge into one cut") {
    val passage = (1 to 12).map(i => s"t$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      (1L, s"intro words here $passage trailing bits"),
      (2L, s"other start $passage different end"),
      (3L, "totally unrelated text")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", windowTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === ((s"intro words here $passage trailing bits", 0L)),
      "the corpus-order first occurrence survives verbatim")
    // five 8-token windows fit the shared passage; their union is the
    // whole 12-token passage, cut as ONE island
    assert(out(2L) === (("other start different end", 12L)))
    assert(out(3L) === (("totally unrelated text", 0L)))
  }

  test("removeDuplicatedSpans: a fully duplicated doc empties; NULL text passes through") {
    val t = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, t), (2L, t),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", windowTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === ((t, 0L)))
    assert(out(2L) === (("", 10L)), "every token sat under a later occurrence")
    assert(out(3L) === (("", 0L)))
  }

  /** Naive driver-side model of the keep-first substring rewrite, for the
    * randomized cross-check: mark every occurrence of a window whose text
    * recurs in another doc, rank occurrences by (doc, pos), delete the
    * token positions covered by non-first occurrences. */
  private def localSpanRewrite(docs: Seq[(Long, String)], w: Int): Map[Long, (String, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> (if (t == null) Array.empty[String] else t.split(" ", -1))
    }
    val occ = for {
      (id, ts) <- toks
      p <- 0 to ts.length - w
    } yield (ts.slice(p, p + w).mkString(" "), id, p)
    val byWin = occ.groupBy(_._1).filter { case (_, os) => os.map(_._2).distinct.size > 1 }
    val later = byWin.values.flatMap(os => os.sortBy(o => (o._2, o._3)).drop(1))
    val covered = later.groupBy(_._2).map { case (id, os) =>
      id -> os.flatMap(o => o._3 until o._3 + w).toSet
    }
    toks.map { case (id, ts) =>
      val cut = covered.getOrElse(id, Set.empty)
      val kept = ts.zipWithIndex.collect { case (t, i) if !cut(i) => t }
      id -> ((kept.mkString(" "), (ts.length - kept.length).toLong))
    }.toMap
  }

  test("removeDuplicatedSpans matches a naive local model on random corpora") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      // small vocab + short docs force plenty of chance window collisions,
      // overlaps and cross-doc repeats
      val docs = (1L to 12L).map { id =>
        val n = 8 + rnd.nextInt(20)
        id -> Seq.fill(n)(s"v${rnd.nextInt(6)}").mkString(" ")
      }
      val expected = localSpanRewrite(docs, 4)
      val got = Dedup.removeDuplicatedSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", windowTokens = 4)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got === expected, s"round $round mismatch")
    }
  }

  /** Naive driver-side paragraph keep-first: rank every (doc, pos)
    * occurrence of each trimmed non-empty paragraph by (doc, pos); the
    * rank-1 occurrence keeps, everything else drops. */
  private def localParaKeepFirst(docs: Seq[(Long, String)]): Map[Long, (String, Long)] = {
    val occ = for {
      (id, t) <- docs
      (p, pos) <- (if (t == null) Array.empty[String] else t.split("\n\n", -1))
        .zipWithIndex
      trimmed = p.trim if trimmed.nonEmpty
    } yield (trimmed, id, pos)
    val winners = occ.groupBy(_._1).map { case (p, os) =>
      p -> os.map(o => (o._2, o._3)).min
    }
    docs.map { case (id, t) =>
      val kept = (if (t == null) Array.empty[String] else t.split("\n\n", -1))
        .zipWithIndex
        .map { case (p, pos) => (p.trim, pos) }
        .collect { case (p, pos) if p.nonEmpty && winners(p) == ((id, pos)) => p }
      id -> ((kept.mkString("\n\n"), kept.length.toLong))
    }.toMap
  }

  test("paragraphKeepFirst matches a naive local model on random corpora") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 3) {
      // tiny paragraph vocab forces heavy cross-doc and in-doc repetition;
      // occasional empties/whitespace exercise the trim-and-drop path
      val docs = (1L to 15L).map { id =>
        val n = 1 + rnd.nextInt(6)
        id -> Seq.fill(n)(rnd.nextInt(8) match {
          case 0 => ""
          case 1 => "  "
          case k => s"para v$k"
        }).mkString("\n\n")
      }
      val expected = localParaKeepFirst(docs)
      val got = Dedup.paragraphKeepFirst(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got === expected, s"round $round mismatch")
    }
  }

  test("paragraphKeepFirst: an uncapped run still completes a supplied Observation") {
    val docs = Seq((1L, "a\n\nb"), (2L, "b\n\nc")).toDF("doc_id", "text")
    val obs = org.apache.spark.sql.Observation("graft_oversize_para_uncapped")
    val out = Dedup.paragraphKeepFirst(docs, "doc_id", "text",
        oversizeObs = Some(obs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) === "c")
    val m = obs.get // must not block: attached even though uncapped
    assert(m("dropped_buckets") == 0L)
    assert(m("max_bucket") == 2L)
  }

  test("paragraphKeepFirst: the occurrence cap ENGAGES on q_dedup_para_capped's replicated fixture") {
    // the same 8×-replicated boilerplate-chain shape as the oracled
    // q_dedup_para_capped query, shrunk: paragraph "B" occurs 24 times
    // (2 in-doc × 8 reps + 8 as the neighbor's tail) — over the cap of
    // 20 — so it drops EVERYWHERE and the in-pass audit must SAY so
    val docs = (0 until 8).flatMap { rep =>
      Seq((10L + rep * 1000, "B\n\nx\n\nB\n\ny"), (11L + rep * 1000, "B\n\nz"))
    }.toDF("doc_id", "text")
    val obs = org.apache.spark.sql.Observation("graft_oversize_para_capped")
    val out = Dedup.paragraphKeepFirst(docs, "doc_id", "text",
        maxOccurrences = 20, oversizeObs = Some(obs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = obs.get
    assert(m("dropped_buckets") == 1L, m.toString) // exactly the B bucket
    assert(m("dropped_members") == 24L)
    assert(m("max_bucket") == 24L)
    assert(out(10L) === "x\n\ny", "B dropped everywhere, even first occurrence")
    assert(out(11L) === "z")
    assert(!out.values.exists(_.contains("B")))
  }

  test("bloomPrefilteredAnti equals the exact anti-join even at extreme fpp") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // fpp = 0.5 forces plenty of false positives through the bloom probe —
    // the positive-branch exact re-check must scrub every one of them
    val corpus = spark.range(500).toDF("id")
      .withColumn("k", concat(lit("key"), col("id")))
    val ref = spark.range(120).toDF("rid")
      .withColumn("k", concat(lit("key"), col("rid") * 3)) // keys 0,3,...,357
      .select("k")
    val got = Dedup.bloomPrefilteredAnti(corpus, "k", ref, "k",
        expectedItems = 120L, fpp = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = corpus.join(ref, Seq("k"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === exact)
    // sanity on the fixture: multiples of 3 under 360 are dropped
    assert(!got.contains(0L) && !got.contains(357L) && got.contains(358L))
    intercept[IllegalArgumentException] {
      Dedup.bloomPrefilteredAnti(corpus, "k", ref, "k", 0L, 0.1)
    }
    intercept[IllegalArgumentException] {
      Dedup.bloomPrefilteredAnti(corpus, "k", ref, "k", 10L, 1.5)
    }
  }

  test("semDedupKeepers merges within cells, misses across the boundary, and caps loudly") {
    // ids 1/2 seed the two centroids (kmeansIters = 0); 3/4 are
    // near-identical cluster members; 5/6 straddle the boundary — nearly
    // parallel to each other (cos ≈ 0.9998) but assigned to different
    // cells, the documented SemDeDup miss
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.999f, 0.001f, 0.0f, 0.0f)),
      (4L, Seq(0.001f, 0.999f, 0.0f, 0.0f)),
      (5L, Seq(0.71f, 0.70f, 0.0f, 0.0f)),
      (6L, Seq(0.70f, 0.71f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val keepers = Dedup.semDedupKeepers(vecs, "vec_id", "embedding",
        nCentroids = 2, kmeansIters = 0, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(3L) === 1L && keepers(4L) === 2L, s"in-cell near-dups must merge: $keepers")
    assert(keepers(5L) === 5L && keepers(6L) === 6L,
      s"boundary-straddling near-dups land in different cells and must NOT merge: $keepers")
    // a 2-member cap drops both 3-member cells whole: nobody merges, and
    // the in-pass observation reports the drop
    // with every cell dropped the pair set is empty, so AQE's
    // empty-relation pruning would strip the CollectMetrics node — the
    // audit-reliant run goes under withReliableOversizeAudit, same as
    // CorpusPrep/MediaPrep
    val obs = org.apache.spark.sql.Observation("graft_semdedup_cap")
    val capped = Dedup.withReliableOversizeAudit(spark) {
      Dedup.semDedupKeepers(vecs, "vec_id", "embedding",
          nCentroids = 2, kmeansIters = 0, threshold = 0.95,
          maxCellSize = 2, oversizeObs = Some(obs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(capped.forall { case (id, k) => id == k }, s"capped run must under-merge: $capped")
    assert(obs.get("dropped_buckets") === 2L)
  }

  test("bloomPrefilteredAnti keeps null keys (membership of nothing is false)") {
    val corpus = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "k")
    val ref = Seq("a").toDF("k")
    val got = Dedup.bloomPrefilteredAnti(corpus, "k", ref, "k", 10L, 0.01)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L)) // "a" dropped; NULL key survives on both branches
  }

  private def localLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("crossCorpusNearDupPairs flags train docs near a reference doc, never joins corpora") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog yesterday"), // near ref 10
      (3L, "completely unrelated training document about parquet files"),
      (4L, "the quick brown fox jumps over the lazy dog today")  // exact ref 10? no — exact of 1
    ).toDF("doc_id", "text")
    val ref = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "reference corpus text that matches nothing in training")
    ).toDF("ref_id", "text")
    val got = Dedup.crossCorpusNearDupPairs(train, "doc_id", "text",
        ref, "ref_id", "text", numHashes = 8, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 10L)) === 1.0)
    assert(got((4L, 10L)) === 1.0)
    // doc 2: 9-distinct-token sets differing in one token → jaccard 8/10,
    // exactly at the >= 0.8 threshold boundary
    assert(got((2L, 10L)) === 0.8)
    assert(!got.keys.exists(_._1 == 3L), s"unrelated doc must not flag: $got")
    assert(!got.keys.exists(_._2 == 11L), s"unmatched ref must not appear: $got")
  }

  test("editDistancePairs equals local brute force at maxDist 1 and 2") {
    // substitution / deletion / insertion / exact dup / empty-vs-1-char
    // neighbors / an unrelated far string — and a dist-2 chain (1→2→"sittin")
    val strs = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "kitte", 4L -> "kittens",
      5L -> "sittin", 6L -> "totally different", 7L -> "kitten",
      8L -> "", 9L -> "a", 10L -> "b")
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = Dedup.editDistancePairs(df, "id", "s", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val want = (for {
        (i, a) <- strs; (j, b) <- strs if i < j
        dd = localLev(a, b) if dd <= d
      } yield (i, j) -> dd).toMap
      assert(got === want, s"maxDist=$d: got $got want $want")
    }
  }

  test("editDistancePairs: mega-bucket cap drops hot variants loudly") {
    // 50 copies of "x" all share every bucket — a 3-cap run must drop the
    // bucket whole and report it through the observation
    val df = (1L to 50L).map(i => (i, "x")).toDF("id", "s")
    val obs = org.apache.spark.sql.Observation("graft_editdist_cap")
    val got = Dedup.withReliableOversizeAudit(spark) {
      Dedup.editDistancePairs(df, "id", "s", maxDist = 1,
        maxPostingSize = 3, oversizeObs = Some(obs)).collect()
    }
    assert(got.isEmpty)
    assert(obs.get("dropped_buckets").asInstanceOf[Long] >= 1L)
  }

  test("sourceOverlapMatrix: cross-source pairs only, duplicate mass counted") {
    import spark.implicits._
    // t1 lives in A(×1) and B(×2); t2 in A and C; t3 only in C (twice —
    // same-source dup, must NOT pair); NULL text never pairs (per-id hash)
    val docs = Seq(
      (1L, "t1", "A"), (2L, "t2", "A"),
      (3L, "t1", "B"), (4L, "t1", "B"),
      (5L, "t2", "C"), (6L, "t3", "C"), (7L, "t3", "C"),
      (8L, null.asInstanceOf[String], "A"),
      (9L, null.asInstanceOf[String], "B"))
      .toDF("doc_id", "text", "source")
    val got = graft.dedup.Dedup
      .sourceOverlapMatrix(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("A", "B") -> ((1L, 1L, 2L)), // t1: one digest, 1 doc in A, 2 in B
      ("A", "C") -> ((1L, 1L, 1L))), // t2 only; t3's same-source dup no pair
      got.toString)
  }
}
