package graft.eval

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
  private def gain(g: Double, r: Int): Double =
    (math.pow(2.0, g) - 1.0) / log2(r + 1.0)

  test("retrievalMetrics matches the hand model: graded gains, mrr, recall") {
    // query 1: qrels a(2), b(1), c(1); run ranks [a, x, b] at k=3
    val runs = Seq((1L, "a", 0.9), (1L, "x", 0.8), (1L, "b", 0.7),
      (3L, "a", 0.5)) // query 3 has no judgments -> unmeasurable, drops
      .toDF("q", "d", "s")
    val qrels = Seq((1L, "a", 2), (1L, "b", 1), (1L, "c", 1),
      (2L, "a", 1)) // query 2 judged but absent from the run -> all zeros
      .toDF("q", "d", "g")
    val got = EvalMetrics.retrievalMetrics(runs, qrels, "q", "d", "s", "g",
        k = 3)
      .orderBy("q")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.length === 2, "the query set is DEFINED by qrels")
    val dcg = gain(2, 1) + gain(1, 3)
    val idcg = gain(2, 1) + gain(1, 2) + gain(1, 3)
    // AP: precision at the hit ranks (1 and 3) over n_rel = 3
    val ap = (1.0 / 1.0 + 2.0 / 3.0) / 3.0
    def r5(x: Double) = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((1L, 3L, 2L, r5(2.0 / 3.0), 1.0, r5(ap),
      r5(dcg / idcg))))
    assert(got(1) === ((2L, 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("retrievalMetrics ranks the raw run itself and truncates at k") {
    // unsorted scored frame; the only relevant doc sits at rank 3 of the
    // scores, so k=2 must miss it and k=3 must find it at rank 3
    val runs = Seq((1L, "low", 0.1), (1L, "mid", 0.5), (1L, "top", 0.9))
      .toDF("q", "d", "s")
    val qrels = Seq((1L, "low", 1)).toDF("q", "d", "g")
    val at2 = EvalMetrics.retrievalMetrics(runs, qrels, "q", "d", "s", "g", 2)
      .select("recall").head().getDouble(0)
    val at3 = EvalMetrics.retrievalMetrics(runs, qrels, "q", "d", "s", "g", 3)
      .select("mrr").head().getDouble(0)
    assert(at2 === 0.0)
    assert(at3 === BigDecimal(1.0 / 3.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("retrievalMetrics tie scores break by doc id, same as the oracle") {
    val runs = Seq((1L, "b", 0.5), (1L, "a", 0.5)).toDF("q", "d", "s")
    val qrels = Seq((1L, "b", 1)).toDF("q", "d", "g")
    // tie broken toward "a" (id asc), so "b" lands at rank 2
    val mrr = EvalMetrics.retrievalMetrics(runs, qrels, "q", "d", "s", "g", 2)
      .select("mrr").head().getDouble(0)
    assert(mrr === 0.5)
  }

  test("prSweep matches the hand confusion matrices; ties enter atomically") {
    val scored = Seq((0.9, true), (0.8, false), (0.8, true), (0.7, false),
      (0.5, true)).toDF("s", "y")
    val got = EvalMetrics.prSweep(scored, "y", "s")
      .orderBy(col("threshold").desc)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    def r5(x: Double) = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq(
      (0.9, 1L, 0L, 2L, 1.0, r5(1.0 / 3.0), 0.5),
      // the 0.8 tie group (one pos, one neg) enters as ONE threshold
      (0.8, 2L, 1L, 1L, r5(2.0 / 3.0), r5(2.0 / 3.0), r5(2.0 / 3.0)),
      (0.7, 2L, 2L, 1L, 0.5, r5(2.0 / 3.0), r5(2.0 * 0.5 * (2.0 / 3.0) / (0.5 + 2.0 / 3.0))),
      (0.5, 3L, 2L, 0L, 0.6, 1.0, 0.75)))
  }

  test("prSweep with zero positives: recall and f1 are 0, never NaN") {
    val scored = Seq((0.9, false), (0.1, false)).toDF("s", "y")
    val got = EvalMetrics.prSweep(scored, "y", "s").collect()
    assert(got.length === 2)
    got.foreach { r =>
      assert(r.getDouble(4) === 0.0) // precision: tp=0
      assert(r.getDouble(5) === 0.0)
      assert(r.getDouble(6) === 0.0)
    }
  }

  test("batchAssembly: total assignment, full batches, sorted beats arrival") {
    import graft.trainprep.TrainPrep
    // lengths deliberately shuffled so arrival-order batches mix lengths
    val docs = (0L until 20L)
      .map(i => (i, Seq.fill((i * 7 % 13 + 1).toInt)("w").mkString(" ")))
      .toDF("id", "text")
    val sorted = TrainPrep.batchAssembly(docs, "id", "text", batchSize = 4)
    val rows = sorted.collect()
    assert(rows.length === 20, "every doc gets exactly one batch")
    assert(rows.map(_.getLong(2)).distinct.sorted.toSeq === (0L until 5L))
    // batch membership == consecutive runs of the (n_tok, id) sort
    val byLen = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
    byLen.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(2) === i / 4, s"doc ${r.getLong(0)} in wrong batch")
    }
    val arrival = TrainPrep.batchAssembly(docs, "id", "text", batchSize = 4,
      orderByLength = false)
    def waste(assigned: org.apache.spark.sql.DataFrame): Long =
      TrainPrep.batchPaddingReport(assigned)
        .agg(sum("pad_tokens")).head().getLong(0)
    assert(waste(sorted) < waste(arrival),
      "length bucketing must cut padding on a shuffled-length corpus")
  }

  test("batchAssembly is deterministic across repartitioned layouts") {
    val docs = (0L until 50L)
      .map(i => (i, Seq.fill((i * 11 % 17 + 1).toInt)("w").mkString(" ")))
      .toDF("id", "text")
    import graft.trainprep.TrainPrep
    val a = TrainPrep.batchAssembly(docs, "id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = TrainPrep.batchAssembly(docs.repartition(7), "id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a === b)
  }

  test("rocAuc matches the hand Mann-Whitney with tie-half counting") {
    // ranks asc: 0.5->1(T), 0.7->2(F), 0.8 tie->avg 3.5 (F,T), 0.9->5(T)
    // ranksum_pos = 1 + 3.5 + 5 = 9.5; U = 9.5 - 3*4/2 = 3.5; AUC = 3.5/6
    val scored = Seq((0.9, true), (0.8, false), (0.8, true), (0.7, false),
      (0.5, true)).toDF("s", "y")
    val r = EvalMetrics.rocAuc(scored, "y", "s").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === BigDecimal(3.5 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // perfect separation and perfect anti-separation
    val sep = Seq((0.9, true), (0.8, true), (0.2, false)).toDF("s", "y")
    assert(EvalMetrics.rocAuc(sep, "y", "s").head().getDouble(2) === 1.0)
    val anti = Seq((0.9, false), (0.2, true)).toDF("s", "y")
    assert(EvalMetrics.rocAuc(anti, "y", "s").head().getDouble(2) === 0.0)
  }

  test("rocAuc is NULL (undefined) with a single class, never 0/NaN") {
    val onlyPos = Seq((0.9, true), (0.2, true)).toDF("s", "y")
    assert(EvalMetrics.rocAuc(onlyPos, "y", "s").head().isNullAt(2))
  }

  test("calibrationReport bins, clamps edges, and ECE weights the gaps") {
    val scored = Seq(
      (0.05, false), (0.08, true), // bin 0: conf 0.065, acc 0.5
      (1.0, true),                 // score 1.0 clamps into bin 9
      (-0.1, false),               // below-range clamps into bin 0
      (0.95, true), (0.99, true)   // bin 9 with the clamp: conf/acc below
    ).toDF("s", "y")
    val rep = EvalMetrics.calibrationReport(scored, "y", "s", nBins = 10)
    val byBin = rep.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(byBin.keySet === Set(0L, 9L))
    val (n0, conf0, acc0) = byBin(0L)
    assert(n0 === 3L)
    assert(conf0 === BigDecimal((0.05 + 0.08 - 0.1) / 3.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(acc0 === BigDecimal(1.0 / 3.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val (n9, conf9, acc9) = byBin(9L)
    assert(n9 === 3L && acc9 === 1.0)
    assert(conf9 === BigDecimal((1.0 + 0.95 + 0.99) / 3.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val ece = EvalMetrics.expectedCalibrationError(rep).head().getDouble(0)
    val expected = (3.0 * math.abs(acc0 - conf0) + 3.0 * math.abs(acc9 - conf9)) / 6.0
    assert(ece === BigDecimal(expected)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("retrievalSummary: macro means over the rounded per-query report") {
    val runs = Seq((1L, "a", 0.9), (1L, "b", 0.8), (2L, "x", 0.5))
      .toDF("q", "d", "s")
    val qrels = Seq((1L, "a", 1), (1L, "b", 1), (2L, "z", 1)).toDF("q", "d", "g")
    val rep = EvalMetrics.retrievalMetrics(runs, qrels, "q", "d", "s", "g", 2)
    val sum = EvalMetrics.retrievalSummary(rep).head()
    // query 1 perfect (all metrics 1.0), query 2 total miss (all 0.0)
    assert(sum.getLong(0) === 2L)
    (1 to 4).foreach(i => assert(sum.getDouble(i) === 0.5, sum.toString))
  }

  test("rankAgreement: exact Spearman over the shared set, NULL under n=2") {
    // query 1: B reverses A's 4-doc order exactly -> rho = -1
    // query 2: identical order -> rho = 1
    // query 3: one shared doc -> undefined (NULL)
    // doc "x" exists only in run A -> inner-join drops it everywhere
    val runA = Seq((1L, "a", 0.9), (1L, "b", 0.8), (1L, "c", 0.7),
      (1L, "d", 0.6), (1L, "x", 0.99),
      (2L, "a", 0.9), (2L, "b", 0.1), (3L, "a", 0.5)).toDF("q", "d", "sa")
    val runB = Seq((1L, "a", 0.1), (1L, "b", 0.2), (1L, "c", 0.3),
      (1L, "d", 0.4),
      (2L, "a", 0.7), (2L, "b", 0.6), (3L, "a", 0.5)).toDF("q", "d", "sb")
    val got = EvalMetrics.rankAgreement(runA, runB, "q", "d", "sa", "sb")
      .orderBy("q").collect()
    assert(got(0).getLong(1) === 4L && got(0).getDouble(2) === -1.0)
    assert(got(1).getDouble(2) === 1.0)
    assert(got(2).getLong(1) === 1L && got(2).isNullAt(2))
  }

  test("classificationReport covers the label union with sklearn zero rules") {
    // "c" is never predicted (precision 0), "x" never actual (recall 0)
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("c", "x"))
      .toDF("actual", "pred")
    val rep = EvalMetrics.classificationReport(df, "actual", "pred")
    val byClass = rep.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))).toMap
    assert(byClass.keySet === Set("a", "b", "c", "x"))
    def r5(x: Double) = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byClass("a") === ((3L, 2L, 2L, 1.0, r5(2.0 / 3.0), 0.8)))
    assert(byClass("b") === ((1L, 2L, 1L, 0.5, 1.0, r5(2.0 / 3.0))))
    assert(byClass("c") === ((1L, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(byClass("x") === ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
    val sum = EvalMetrics.classificationSummary(rep).head()
    assert(sum.getLong(0) === 5L)
    assert(sum.getDouble(1) === 0.6) // 3 diagonal hits of 5
    assert(sum.getDouble(2) === r5((1.0 + 0.5 + 0.0 + 0.0) / 4.0))
    assert(sum.getDouble(4) === r5((0.8 + r5(2.0 / 3.0)) / 4.0))
  }

  test("classificationReport folds NULL labels into ONE (null) class") {
    val df = Seq((Some("a"), None), (None, Some("a")), (None, None))
      .toDF("actual", "pred")
    val rep = EvalMetrics.classificationReport(df, "actual", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // one (null) row, not two disjoint null-keyed rows — and the
    // (null, null) agreement reaches the diagonal
    assert(rep.keySet === Set("a", "(null)"))
    assert(rep("(null)") === ((2L, 2L, 1L)))
    assert(rep("a") === ((1L, 1L, 0L)))
  }

  test("brierScore + Murphy decomposition reconstruct the binned Brier") {
    val scored = Seq((0.1, false), (0.15, false), (0.12, true),
      (0.8, true), (0.85, true), (0.9, false), (0.95, true))
      .toDF("s", "y")
    val b = EvalMetrics.brierScore(scored, "y", "s").head()
    val exact = Seq(0.1 * 0.1, 0.15 * 0.15, 0.88 * 0.88, 0.2 * 0.2,
      0.15 * 0.15, 0.9 * 0.9, 0.05 * 0.05).sum / 7.0
    assert(b.getLong(0) === 7L)
    assert(b.getDouble(1) === BigDecimal(exact)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the decomposition over the binned report: REL - RES + UNC equals the
    // BINNED Brier (scores replaced by their bin-mean confidence) up to
    // the report's rounding
    val rep = EvalMetrics.calibrationReport(scored, "y", "s", nBins = 10)
    val m = EvalMetrics.murphyDecomposition(rep).head()
    // binned Brier = mean (conf_b - y)^2; per bin that expands to
    // (conf - acc)^2 + acc(1 - acc), and Murphy's REL - RES + UNC equals
    // it exactly when computed over the same bin means (here: to rounding)
    val binnedBrier = rep.collect().map { r =>
      val (n, conf, acc) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      n * (math.pow(conf - acc, 2) + acc * (1 - acc))
    }.sum / 7.0
    val recon = m.getDouble(1) - m.getDouble(2) + m.getDouble(3)
    assert(math.abs(recon - binnedBrier) < 1e-4,
      s"identity drifted: $recon vs $binnedBrier")
    assert(m.getDouble(3) > 0 && m.getDouble(1) >= 0 && m.getDouble(2) >= 0)
  }

  test("mcnemarTest: textbook discordant counts, continuity, undefined case") {
    import org.apache.spark.sql.Row
    // 10 items only A gets right, 4 only B, 30 both, 6 neither
    val rows = Seq.fill(10)(("x", "x", "y")) ++ Seq.fill(4)(("x", "y", "x")) ++
      Seq.fill(30)(("x", "x", "x")) ++ Seq.fill(6)(("x", "y", "y"))
    val df = rows.toDF("label", "pa", "pb")
    val r = EvalMetrics.mcnemarTest(df, "label", "pa", "pb").head()
    assert(r === Row(50L, 10L, 4L, BigDecimal((6.0 - 1) * 5 / 14.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble))
    val raw = EvalMetrics.mcnemarTest(df, "label", "pa", "pb",
      continuity = false).head()
    assert(raw.getDouble(3) === BigDecimal(36.0 / 14.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // no discordant pairs: the statistic is undefined, not zero
    val agree = Seq(("x", "x", "x"), ("y", "z", "z")).toDF("label", "pa", "pb")
    assert(EvalMetrics.mcnemarTest(agree, "label", "pa", "pb").head().isNullAt(3))
  }

  test("bootstrapAccuracyCI: deterministic, ordered, degenerate-perfect") {
    val df = spark.range(200).select(col("id").as("doc_id"),
      (pmod(col("id"), lit(3)) === 0).as("correct"))
    val a = EvalMetrics.bootstrapAccuracyCI(df, "doc_id", "correct",
      resamples = 20).head()
    val b = EvalMetrics.bootstrapAccuracyCI(df, "doc_id", "correct",
      resamples = 20).head()
    assert(a === b, "hash-driven resampling must be bit-deterministic")
    val (acc, lo, hi) = (a.getDouble(1), a.getDouble(2), a.getDouble(3))
    assert(lo <= hi && lo <= acc + 0.05 && hi >= acc - 0.05,
      s"CI [$lo, $hi] must bracket the point estimate $acc")
    assert(hi - lo < 0.25, s"CI [$lo, $hi] absurdly wide for n=200")
    // every row correct → every resample's weighted accuracy is exactly 1
    val perfect = spark.range(50).select(col("id").as("doc_id"),
      lit(true).as("correct"))
    val p = EvalMetrics.bootstrapAccuracyCI(perfect, "doc_id", "correct",
      resamples = 8).head()
    assert(p.getDouble(1) === 1.0 && p.getDouble(2) === 1.0 &&
      p.getDouble(3) === 1.0)
    // EMPTY input: the all-null row, never an index-out-of-bounds on the
    // zero collected resamples (second-review fix)
    val none = EvalMetrics.bootstrapAccuracyCI(
      perfect.filter(lit(false)), "doc_id", "correct", resamples = 8).head()
    assert(none.getInt(0) === 8 && none.isNullAt(1) && none.isNullAt(2)
      && none.isNullAt(3))
  }

  test("fleissKappa: hand-computed table, perfect, unmeasurable, ragged") {
    // items: (a,a,a) (a,b,b) (a,a,b) (b,b,b) — P̄ = 2/3, Pe = 1/2, κ = 1/3
    val ratings = Seq(
      (1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "b"), (2, "b"),
      (3, "a"), (3, "a"), (3, "b"), (4, "b"), (4, "b"), (4, "b"))
      .toDF("item", "r")
    val k = EvalMetrics.fleissKappa(ratings, "item", "r").head()
    def r5(x: Double) = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(k.getLong(0) === 4L && k.getLong(1) === 3L)
    assert(k.getDouble(2) === r5(2.0 / 3.0) && k.getDouble(3) === 0.5)
    assert(k.getDouble(4) === r5(1.0 / 3.0))
    // perfect agreement on a non-degenerate category split → κ = 1
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b")).toDF("item", "r")
    assert(EvalMetrics.fleissKappa(perfect, "item", "r")
      .head().getDouble(4) === 1.0)
    // one category only: pe = 1, agreement unmeasurable → NULL
    val constant = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a")).toDF("item", "r")
    assert(EvalMetrics.fleissKappa(constant, "item", "r").head().isNullAt(4))
    // ragged rater counts break the formula → reject loudly
    val ragged = Seq((1, "a"), (1, "a"), (2, "a")).toDF("item", "r")
    val e = intercept[IllegalArgumentException] {
      EvalMetrics.fleissKappa(ragged, "item", "r")
    }
    assert(e.getMessage.contains("constant rater count"))
    // EMPTY input: the all-null row, never an NPE on the null min/max
    // (the CorpusReport longOr0 class — review fix)
    val empty = EvalMetrics.fleissKappa(
      ratings.filter(lit(false)), "item", "r").head()
    assert(empty.getLong(0) === 0L && empty.isNullAt(1) && empty.isNullAt(4))
  }

  test("cohenKappa matches the textbook contingency table") {
    // 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no: po=0.7, pe=0.5, k=0.4
    val pairs = (Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no"))
      ++ Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no")))
      .toDF("a", "b")
    val r = EvalMetrics.cohenKappa(pairs, "a", "b").head()
    assert(r.getLong(0) === 50L)
    assert(r.getDouble(1) === 0.7 && r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 0.4)
  }

  test("cohenKappa: one-sided categories drop from pe; constant raters NULL") {
    // category y rated only by a, z only by b — they contribute 0 to pe
    val oneSided = Seq(("x", "x"), ("y", "x"), ("x", "z")).toDF("a", "b")
    val r = EvalMetrics.cohenKappa(oneSided, "a", "b").head()
    // po = 1/3; pe = na(x)*nb(x)/9 = 2*2/9
    assert(r.getDouble(1) === BigDecimal(1.0 / 3.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(2) === BigDecimal(4.0 / 9.0)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val constant = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val c = EvalMetrics.cohenKappa(constant, "a", "b").head()
    assert(c.getDouble(1) === 1.0 && c.isNullAt(3),
      "pe = 1 means agreement is unmeasurable, not perfect")
  }

  test("cohenKappa: high-cardinality rater columns fail loudly, not driver-OOM") {
    // ids/free text passed as rater labels used to degrade into an
    // unbounded collect (ADVICE r13): the cell cap turns that into a
    // distributed-side limit + loud require
    val ids = (0 until 50).map(i => (s"id_$i", s"id_${i + 1}")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      EvalMetrics.cohenKappa(ids, "a", "b", maxCells = 20).head()
    }
    assert(e.getMessage.contains("contingency"), e.getMessage)
    // at a sufficient cap the same input is legal (50 distinct cells)
    assert(EvalMetrics.cohenKappa(ids, "a", "b").head().getLong(0) === 50L)
  }

  test("cohenKappa: NULL labels are the '(null)' class, not silent disagreement") {
    // (null, null) is an AGREEMENT on the null class, and the null class
    // participates in the pe marginals — the classificationReport sentinel
    // convention. Without it, null === null is null in the diagonal sum
    // and null keys drop from the marginal join, deflating kappa.
    val pairs = Seq((Some("x"), Some("x")), (None, None),
      (Some("x"), None), (None, Some("x"))).toDF("a", "b")
    val r = EvalMetrics.cohenKappa(pairs, "a", "b").head()
    def r5(x: Double) = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    // po = 2/4; pe = (na(x)*nb(x) + na(null)*nb(null))/16 = (4+4)/16
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 0.5 && r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === r5(0.0))
    // the sentinel also means kappa REWARDS all-null agreement
    val allNull = Seq((None: Option[String], None: Option[String]),
      (None, None)).toDF("a", "b")
    val an = EvalMetrics.cohenKappa(allNull, "a", "b").head()
    assert(an.getDouble(1) === 1.0 && an.isNullAt(3),
      "constant-null raters hit the same pe=1 unmeasurable branch")
  }

  test("cohenKappa plans ZERO scans of the input in its returned frame") {
    // the contingency cells collect once inside the call (category²-sized);
    // the returned one-row frame is literals over range(1) — consuming it
    // must not re-scan the pair projection (r12 shipped 3 re-plans)
    val pairs = Seq(("x", "x"), ("x", "y")).toDF("a", "b")
    val plan = EvalMetrics.cohenKappa(pairs, "a", "b")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation [a") && !plan.contains("Join"),
      s"returned kappa frame should be literal-only, got:\n$plan")
  }

  test("scanCumSumLong puts NULL leading keys FIRST, matching sort order") {
    import graft.ops.TimeSeriesOps
    // nulls-first is Spark's ascending-sort contract: the null-key rows
    // must take bucket 0 and contribute to every later bucket's offset
    val df = Seq((Some("b"), 1L, 10L), (None, 2L, 1L), (Some("a"), 3L, 100L),
      (None, 4L, 2L)).toDF("k", "id", "v")
    val got = TimeSeriesOps.scanCumSumLong(df, Seq("k", "id"), "v", "cum",
        numParts = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // sequential order: (null,2)=1, (null,4)=3, (a,3)=103, (b,1)=113
    assert(got === Map(2L -> 1L, 4L -> 3L, 3L -> 103L, 1L -> 113L))
  }

  test("scanCumSumsLong multi-column == two independent single-column scans") {
    import graft.ops.TimeSeriesOps
    val df = (0L until 200L).map(i => (i % 37, i, i % 5 + 1, i % 3))
      .toDF("k", "id", "v1", "v2")
    val multi = TimeSeriesOps.scanCumSumsLong(df, Seq("k", "id"),
        Seq("v1", "v2"), Seq("c1", "c2"))
      .select("id", "c1", "c2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val s1 = TimeSeriesOps.scanCumSumLong(df, Seq("k", "id"), "v1", "c1")
      .select("id", "c1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val s2 = TimeSeriesOps.scanCumSumLong(df, Seq("k", "id"), "v2", "c2")
      .select("id", "c2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(multi.map(t => (t._1, t._2)).toSeq === s1.toSeq)
    assert(multi.map(t => (t._1, t._3)).toSeq === s2.toSeq)
  }
}
