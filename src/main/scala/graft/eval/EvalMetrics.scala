package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for the retrieval stack and the quality
  * classifiers — the measuring half of the pipeline: E75/E9/E123-E127
  * build ranked stages, E44/E102 score documents; these operators grade
  * them against judgments, distributedly and engine-replayably.
  *
  * Cross-engine determinism: every metric is arithmetic over integer
  * counts and ranks (log2 written as ln/ln 2, gains as 2^grade − 1 over
  * integer grades), rounded at `roundTo` before compare — the same
  * contract as the cosine/BM25 oracles.
  */
object EvalMetrics {

  /** trec_eval-style retrieval metrics per query: recall@k, MRR@k,
    * AP@k (whose mean over queries is MAP) and nDCG@k of a run against
    * graded relevance judgments.
    *
    * `runs` is the SCORED candidate frame (query, doc, score) — the
    * operator ranks it per query (score desc, doc id tiebreak) and
    * truncates at `k` itself, so callers pass a stage's raw output;
    * `qrels` is (query, doc, grade) with grade > 0 meaning relevant
    * (graded gains 2^g − 1, binary qrels degrade to gain 1). The query
    * set is DEFINED by qrels — a run query without judgments is
    * unmeasurable and drops (trec_eval's rule); a judged query with no
    * run rows scores 0 across the board.
    *
    * Scale shape: the per-query rank windows partition by query — the
    * corpus-sized work happened upstream in the stages that produced
    * the runs; the qrels join is judgment-sized (AQE broadcasts the
    * usual dimension-sized eval set) and every aggregate groups by
    * query with map-side combine. Nothing here shuffles more than the
    * run frame itself. */
  def retrievalMetrics(runs: DataFrame, qrels: DataFrame, queryCol: String,
      docCol: String, scoreCol: String, gradeCol: String, k: Int,
      roundTo: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def log2(c: Column): Column = log(c) / log(lit(2.0))
    def gain(g: Column, rank: Column): Column =
      (pow(lit(2.0), g) - lit(1.0)) / log2(rank.cast("double") + lit(1.0))
    val rankW = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol))
    val topk = runs.select(col(queryCol), col(docCol), col(scoreCol))
      .withColumn("__rank", row_number().over(rankW))
      .filter(col("__rank") <= k)
    val rels = qrels.filter(col(gradeCol) > 0)
      .select(col(queryCol), col(docCol), col(gradeCol).cast("double").as("__g"))
    // ideal ranking = qrels by grade desc (doc tiebreak), truncated at k —
    // the nDCG denominator; n_rel is the recall denominator
    val idealW = Window.partitionBy(col(queryCol))
      .orderBy(col("__g").desc, col(docCol))
    val ideal = rels.withColumn("__ir", row_number().over(idealW))
      .groupBy(col(queryCol)).agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__ir") <= k, gain(col("__g"), col("__ir")))
          .otherwise(lit(0.0))).as("__idcg"))
    // running relevant-count down the ranking: precision@r for the AP sum
    // (average precision per query; its mean over queries is MAP). The
    // window partitions by query over ≤ k rows — never data-sized.
    val cumW = Window.partitionBy(col(queryCol)).orderBy(col("__rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perQuery = topk.join(rels, Seq(queryCol, docCol), "left")
      .withColumn("__hit", when(col("__g").isNotNull, 1L).otherwise(0L))
      .withColumn("__cum", sum(col("__hit")).over(cumW))
      .groupBy(col(queryCol)).agg(
        sum(col("__hit")).as("rel_found"),
        max(when(col("__g").isNotNull, lit(1.0) / col("__rank"))).as("__rr"),
        sum(when(col("__g").isNotNull,
          col("__cum").cast("double") / col("__rank"))
          .otherwise(lit(0.0))).as("__apnum"),
        sum(when(col("__g").isNotNull, gain(col("__g"), col("__rank")))
          .otherwise(lit(0.0))).as("__dcg"))
    ideal.join(perQuery, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("rel_found"), lit(0L)).as("rel_found"),
        round(coalesce(col("rel_found"), lit(0L)).cast("double")
          / col("n_rel"), roundTo).as("recall"),
        round(coalesce(col("__rr"), lit(0.0)), roundTo).as("mrr"),
        round(coalesce(col("__apnum"), lit(0.0)) / col("n_rel"), roundTo)
          .as("ap"),
        round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), roundTo)
          .as("ndcg"))
  }

  /** One-row macro summary over a [[retrievalMetrics]] report: the
    * numbers a retrieval eval actually quotes — MAP (the ap mean),
    * mean recall/MRR/nDCG — as unweighted means of the ROUNDED
    * per-query values (replayable from any engine's report, the ECE
    * contract). One query-set-sized aggregate. */
  def retrievalSummary(report: DataFrame, roundTo: Int = 5): DataFrame =
    report.agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("recall")), roundTo).as("mean_recall"),
      round(avg(col("mrr")), roundTo).as("mean_mrr"),
      round(avg(col("ap")), roundTo).as("map"),
      round(avg(col("ndcg")), roundTo).as("mean_ndcg"))

  /** Spearman rank agreement between two scored runs, per query — the
    * quantization-QA number beyond recall: how much does the cheap
    * stage's ORDER disagree with the exact one? Both rankings are
    * recomputed inside the SHARED candidate set (inner join on
    * (query, doc)) with the engine's ranking contract (score desc, doc
    * id tiebreak — a total order, so ranks are distinct integers and
    * ρ = 1 − 6·Σd²/(n·(n²−1)) is exact integer arithmetic until the
    * final division; classic average-rank tie handling doesn't apply
    * because the REALIZED serving order is what's being graded). ρ is
    * NULL for queries with fewer than 2 shared candidates. Σd² sums as
    * doubles — exact below 2^52, i.e. shortlists to ~10⁵ rows; rounding
    * absorbs anything beyond.
    *
    * Scale shape: one (query, doc)-keyed equi-join of the two run
    * frames, two per-query rank windows, one per-query aggregate —
    * parallel across queries, nothing beyond the run frames shuffles. */
  def rankAgreement(runA: DataFrame, runB: DataFrame, queryCol: String,
      docCol: String, scoreColA: String, scoreColB: String,
      roundTo: Int = 5): DataFrame = {
    // duplicate (query, doc) rows collapse to their MAX score first: the
    // join would otherwise fan identical rows out and the two windows
    // could pair their copies differently across layouts — the one place
    // in the eval family where duplicate keys would make output
    // nondeterministic (max is order-free, so the collapse is not)
    def dedup(df: DataFrame, s: String, out: String) = df
      .groupBy(col(queryCol), col(docCol))
      .agg(max(col(s)).as(out))
    val joined = dedup(runA, scoreColA, "__sa")
      .join(dedup(runB, scoreColB, "__sb"), Seq(queryCol, docCol))
    def w(s: String) = Window.partitionBy(col(queryCol))
      .orderBy(col(s).desc, col(docCol))
    val nD = col("n").cast("double")
    joined
      .withColumn("__ra", row_number().over(w("__sa")))
      .withColumn("__rb", row_number().over(w("__sb")))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n"),
        sum(pow(col("__ra") - col("__rb"), 2)).as("__d2"))
      .select(col(queryCol), col("n"),
        round(when(col("n") >= 2,
          lit(1.0) - lit(6.0) * col("__d2") / (nD * (nD * nD - 1.0))),
          roundTo).as("spearman"))
  }

  /** Precision/recall/F1 at EVERY distinct score threshold — the
    * operating-point sweep behind a classifier's PR curve (which
    * threshold ships is THE deployment decision for the E44/E102 quality
    * and language gates). At each distinct score t (descending):
    * predicted-positive = score ≥ t, so tp/fp/fn are cumulative counts
    * down the sorted score axis. Tied scores are one threshold — a tie
    * group enters the confusion matrix atomically, never split.
    *
    * Scale shape: three aggregate passes over a 2-column
    * (score, label) projection — the (threshold, pos, n) pre-aggregate
    * (map-side combined, output is distinct-score-sized), its reuse as
    * the calibration scan inside the bucketed prefix scan, and the
    * grand-total row — then the cumulatives run as ONE
    * [[graft.ops.TimeSeriesOps.scanCumSumsLong]] two-pass scan over the
    * distinct-score frame (never a single-partition data window, even
    * when every score is unique and the threshold axis is data-sized).
    * Persist the scored frame upstream if the corpus scan itself is the
    * bottleneck. */
  def prSweep(scored: DataFrame, labelCol: String, scoreCol: String,
      roundTo: Int = 5): DataFrame = {
    val byScore = scored
      .select(col(scoreCol).as("threshold"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy(col("threshold"))
      .agg(sum(col("__y")).as("__pos"), count(lit(1)).as("__n"))
      .withColumn("__negt", -col("threshold"))
    val cum = graft.ops.TimeSeriesOps.scanCumSumsLong(
      byScore, Seq("__negt"), Seq("__pos", "__n"), Seq("__tp", "__pp"))
    val totals = broadcast(scored.select(
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .agg(sum(col("__y")).as("__p")))
    val p = col("__tp").cast("double") / col("__pp")
    val r = when(col("__p") > 0, col("__tp").cast("double") / col("__p"))
      .otherwise(lit(0.0))
    cum.crossJoin(totals)
      .select(col("threshold"),
        col("__tp").as("tp"), (col("__pp") - col("__tp")).as("fp"),
        (col("__p") - col("__tp")).as("fn"),
        round(p, roundTo).as("precision"), round(r, roundTo).as("recall"),
        round(when(p + r > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)), roundTo).as("f1"))
  }

  /** Exact tie-aware ROC AUC via the Mann-Whitney rank-sum identity —
    * AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N) — WITHOUT a global sort:
    * a tie group at cumulative count cn with n members has average rank
    * cn − (n−1)/2, so the whole statistic falls out of the same
    * distinct-score cumulative the PR sweep uses (one bucketed prefix
    * scan over the (score, pos, n) pre-aggregate; ranks ascend with
    * score). Equals trapezoidal ROC integration with ties counted half —
    * sklearn's roc_auc_score semantics. Every term is integer or
    * half-integer (exact in doubles below 2^52), so the statistic
    * replays bit-identically; only the final division rounds.
    * Returns one row (n_pos, n_neg, auc); auc is NULL when either class
    * is empty (undefined, not 0.5). */
  def rocAuc(scored: DataFrame, labelCol: String, scoreCol: String,
      roundTo: Int = 6): DataFrame = {
    val byScore = scored
      .select(col(scoreCol).as("__s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__pos"), count(lit(1)).as("__n"))
    val cum = graft.ops.TimeSeriesOps.scanCumSumLong(
      byScore, Seq("__s"), "__n", "__cn")
    val sums = cum.agg(
      sum(col("__pos").cast("double")
        * (col("__cn").cast("double")
          - (col("__n").cast("double") - 1.0) / 2.0)).as("__ranksum"),
      sum(col("__pos")).as("__p"), sum(col("__n")).as("__t"))
    sums.select(
      col("__p").as("n_pos"), (col("__t") - col("__p")).as("n_neg"),
      round(when(col("__p") > 0 && col("__t") > col("__p"),
        (col("__ranksum")
          - col("__p").cast("double") * (col("__p").cast("double") + 1.0) / 2.0)
          / (col("__p").cast("double")
            * (col("__t") - col("__p")).cast("double"))), roundTo).as("auc"))
  }

  /** Reliability-diagram calibration report: scores (assumed in [0, 1] —
    * sigmoid outputs; out-of-range clamps into the edge bins) cut into
    * `nBins` fixed equal-width bins, per bin the count, mean predicted
    * score (confidence) and empirical positive rate (accuracy) — the
    * table behind a calibration curve and the
    * [[expectedCalibrationError]] scalar. One map pass into one
    * bin-sized aggregate; fixed literal bin edges so every engine cuts
    * identically (the seqLenHistogram contract). */
  def calibrationReport(scored: DataFrame, labelCol: String,
      scoreCol: String, nBins: Int = 10, roundTo: Int = 5): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val bin = least(greatest(
      floor(col(scoreCol).cast("double") * nBins), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    scored
      .select(bin.as("bin"), col(scoreCol).cast("double").as("__s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__s")) / count(lit(1)), roundTo).as("confidence"),
        round(sum(col("__y")).cast("double") / count(lit(1)), roundTo)
          .as("accuracy"))
  }

  /** Expected calibration error over a [[calibrationReport]]:
    * ECE = Σ_bins (n_b / N) · |accuracy_b − confidence_b|, computed on
    * the ROUNDED per-bin values so the scalar replays from the report
    * any engine produced. One bin-sized aggregate. */
  def expectedCalibrationError(report: DataFrame, roundTo: Int = 5): DataFrame =
    report.agg(round(
      sum(col("n").cast("double") * abs(col("accuracy") - col("confidence")))
        / sum(col("n")), roundTo).as("ece"))

  /** Multi-class classification report — the confusion-matrix summary for
    * the E102 language-ID and E44 quality heads: per class its support
    * (n_actual), prediction count (n_pred), true positives and
    * precision/recall/F1. The class set is the UNION of actual and
    * predicted labels; a class never predicted scores precision 0 (the
    * sklearn zero-division convention), a class predicted but never true
    * scores recall 0. One (actual, pred) contingency aggregate
    * (category²-sized), marginals and the diagonal derived from it —
    * the corpus shuffles nothing but label pairs. */
  def classificationReport(df: DataFrame, actualCol: String,
      predCol: String, roundTo: Int = 5): DataFrame = {
    // NULL labels become the explicit "(null)" class up front: the
    // marginal joins below use plain equality (null keys would produce
    // TWO disjoint null-class rows) and the diagonal filter would score
    // a (null, null) agreement as a miss (null === null is null). A real
    // "(null)" label collides with the sentinel — rename it first.
    def cls(c: Column) = coalesce(c.cast("string"), lit("(null)"))
    val cell = df
      .select(cls(col(actualCol)).as("__a"), cls(col(predCol)).as("__p"))
      .groupBy(col("__a"), col("__p")).agg(count(lit(1)).as("__c"))
    val actualM = cell.groupBy(col("__a").as("class"))
      .agg(sum(col("__c")).as("n_actual"))
    val predM = cell.groupBy(col("__p").as("class"))
      .agg(sum(col("__c")).as("n_pred"))
    val diag = cell.filter(col("__a") === col("__p"))
      .select(col("__a").as("class"), col("__c").as("__tp"))
    val na = coalesce(col("n_actual"), lit(0L))
    val np = coalesce(col("n_pred"), lit(0L))
    val tp = coalesce(col("__tp"), lit(0L))
    val p = when(np > 0, tp.cast("double") / np).otherwise(lit(0.0))
    val r = when(na > 0, tp.cast("double") / na).otherwise(lit(0.0))
    actualM.join(predM, Seq("class"), "full_outer")
      .join(diag, Seq("class"), "left")
      .select(col("class"), na.as("n_actual"), np.as("n_pred"), tp.as("tp"),
        round(p, roundTo).as("precision"), round(r, roundTo).as("recall"),
        round(when(p + r > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)), roundTo).as("f1"))
  }

  /** One-row macro summary over a [[classificationReport]]: accuracy
    * (= micro-F1 for single-label multi-class) from the exact counts,
    * macro precision/recall/F1 as unweighted means of the ROUNDED
    * per-class values — replayable from any engine's report, the ECE
    * contract. */
  def classificationSummary(report: DataFrame, roundTo: Int = 5): DataFrame =
    report.agg(
      sum(col("n_actual")).as("n"),
      round(sum(col("tp")).cast("double") / sum(col("n_actual")), roundTo)
        .as("accuracy"),
      round(avg(col("precision")), roundTo).as("macro_precision"),
      round(avg(col("recall")), roundTo).as("macro_recall"),
      round(avg(col("f1")), roundTo).as("macro_f1"))

  /** Brier score — the proper scoring rule over probabilistic scores:
    * mean (score − label)². One map-side aggregate; lower is better,
    * and unlike AUC it punishes MIScalibration, not just misordering —
    * the capstone of the sweep/AUC/calibration triple. */
  def brierScore(scored: DataFrame, labelCol: String, scoreCol: String,
      roundTo: Int = 6): DataFrame = {
    val y = when(col(labelCol).cast("boolean"), 1.0).otherwise(0.0)
    val e = col(scoreCol).cast("double") - y
    scored.agg(count(lit(1)).as("n"),
      round(avg(e * e), roundTo).as("brier"))
  }

  /** Murphy decomposition of the Brier score over a
    * [[calibrationReport]]: reliability REL = Σ n_b(conf_b − acc_b)²/N
    * (how far predictions sit from their realized rates — lower
    * better), resolution RES = Σ n_b(acc_b − ȳ)²/N (how much the bins
    * separate outcomes — higher better), uncertainty UNC = ȳ(1 − ȳ);
    * binned Brier ≈ REL − RES + UNC (exact when conf_b is the exact bin
    * mean; computed here over the ROUNDED report, the ECE replay
    * contract, so the identity holds to rounding). Two bin-sized
    * aggregates (ȳ first, broadcast back). */
  def murphyDecomposition(report: DataFrame, roundTo: Int = 5): DataFrame = {
    val ybar = broadcast(report.agg(
      (sum(col("n") * col("accuracy")) / sum(col("n"))).as("__ybar")))
    report.crossJoin(ybar)
      .agg(sum(col("n")).as("n"),
        round(sum(col("n") * pow(col("confidence") - col("accuracy"), 2))
          / sum(col("n")), roundTo).as("reliability"),
        round(sum(col("n") * pow(col("accuracy") - col("__ybar"), 2))
          / sum(col("n")), roundTo).as("resolution"),
        round(first(col("__ybar")) * (lit(1.0) - first(col("__ybar"))),
          roundTo).as("uncertainty"))
  }

  /** McNemar's test — the PAIRED comparison of two classifiers on the
    * same items (the A/B question "is the new quality gate actually
    * better?" asked correctly: marginal accuracies share the items, so
    * only the DISCORDANT pairs carry signal): b = items A got right and
    * B wrong, c = the reverse, χ² = (|b−c| − 1)²/(b+c) with the Edwards
    * continuity correction (the textbook small-sample default; pass
    * `continuity = false` for the raw (b−c)²/(b+c)). ONE map-side
    * aggregate — four conditional sums over the (label, predA, predB)
    * projection; exact integer arithmetic until the final division.
    * Statistic is NULL when b + c = 0 (no discordant pairs — the test
    * is undefined, not zero). Reference under ~3.84 (χ²₁ at α=0.05)
    * means no evidence of a difference. */
  def mcnemarTest(df: DataFrame, labelCol: String, predACol: String,
      predBCol: String, continuity: Boolean = true,
      roundTo: Int = 5): DataFrame = {
    val okA = col(predACol) === col(labelCol)
    val okB = col(predBCol) === col(labelCol)
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(when(okA && !okB, 1L).otherwise(0L)).as("b"),
      sum(when(!okA && okB, 1L).otherwise(0L)).as("c"))
    val bD = col("b").cast("double")
    val cD = col("c").cast("double")
    val diff = if (continuity)
      greatest(abs(bD - cD) - lit(1.0), lit(0.0)) else abs(bD - cD)
    agg.select(col("n"), col("b"), col("c"),
      round(when(col("b") + col("c") > 0,
        diff * diff / (bD + cD)), roundTo).as("chi2"))
  }

  /** Poisson-bootstrap confidence interval — THE distributed bootstrap
    * (each classic resample would need a corpus-wide multinomial draw;
    * the Poisson approximation gives every row an INDEPENDENT
    * Poisson(1) multiplicity per resample, so resampling becomes a map
    * pass). Deterministic and engine-portable: multiplicity m_r(id)
    * derives from the md5 integer hash of `id#r` compared against
    * integer thresholds floor(cdf_k · 2³²) of the Poisson(1) CDF —
    * exact integer compares, no float RNG to drift between engines.
    * Per resample the metric is weighted accuracy Σm·x / Σm; the CI is
    * EXACT-RANK percentiles over the B resample values (never
    * interpolated — the group_quantile contract). Shuffle: rows fan out
    * ×B as (resample, m, m·x) triples but map-side combine collapses to
    * B partials per task — shuffled records = O(B · tasks), never
    * O(rows · B). Returns one row (resamples, mean, lo, hi). */
  def bootstrapAccuracyCI(df: DataFrame, idCol: String, correctCol: String,
      resamples: Int = 40, alpha: Double = 0.05,
      roundTo: Int = 5): DataFrame = {
    require(resamples >= 4, s"need >= 4 resamples, got $resamples")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    // Poisson(1) CDF as integer thresholds on the 32-bit hash space:
    // m = #{k : h >= floor(cdf_k · 2^32)} — identical literals on both
    // engines by construction (generated from the same series here)
    val cdfThresholds: Seq[Long] = PoissonThresholds
    val tLit = typedlit(cdfThresholds)
    val perResample = df
      .select(col(idCol),
        when(col(correctCol).cast("boolean"), 1L).otherwise(0L).as("__x"),
        explode(sequence(lit(1), lit(resamples))).as("__r"))
      // the hash is hoisted into its OWN column: inlined in the filter
      // lambda it would re-evaluate (md5 + conv) once per threshold
      // element — 9× the hashing on the ×B hot path (second-review
      // finding)
      .withColumn("__h", conv(substring(md5(concat(
        col(idCol).cast("string"), lit("#"), col("__r").cast("string"))),
        1, 8), 16, 10).cast("long"))
      .withColumn("__m",
        size(filter(tLit, t => col("__h") >= t)).cast("long"))
      .groupBy(col("__r"))
      .agg(sum(col("__m") * col("__x")).as("__hits"), sum(col("__m")).as("__n"))
      .select(col("__r"),
        round(col("__hits").cast("double") /
          greatest(col("__n"), lit(1L)), roundTo).as("__acc"))
    // B is literal-sized: exact-rank percentile over the collected values
    val accs = perResample.collect().map(_.getDouble(1)).sorted
    // EMPTY input: zero exploded rows → zero resample groups — the
    // all-null row, not an ArrayIndexOutOfBounds (second-review finding;
    // the fleissKappa/CorpusReport empty-input class)
    if (accs.isEmpty) {
      val nullD = lit(null).cast("double")
      return df.sparkSession.range(1).select(
        lit(resamples).as("resamples"), nullD.as("acc"),
        nullD.as("ci_lo"), nullD.as("ci_hi"))
    }
    val lo = accs(math.max(0, math.ceil(alpha / 2 * resamples).toInt - 1))
    val hi = accs(math.min(resamples - 1,
      math.ceil((1 - alpha / 2) * resamples).toInt - 1))
    val mean = df.agg(
      round(sum(when(col(correctCol).cast("boolean"), 1.0).otherwise(0.0))
        / count(lit(1)), roundTo).as("acc"))
    mean.select(lit(resamples).as("resamples"), col("acc"),
      lit(lo).as("ci_lo"), lit(hi).as("ci_hi"))
  }

  /** floor(cdf · 2³²) thresholds of the Poisson(1) CDF for k = 0..8 —
    * the shared literal both [[bootstrapAccuracyCI]] and its SQL oracle
    * build from (multiplicity capped at 9; P(X > 8) < 1.1e-6). */
  private[graft] val PoissonThresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val pmf = Iterator.iterate((0, e1)) { case (k, p) =>
      (k + 1, p / (k + 1)) }.take(9).map(_._2).toSeq
    pmf.scanLeft(0.0)(_ + _).tail
      .map(c => math.min((c * 4294967296.0).toLong, 4294967296L))
  }

  /** Fleiss' kappa — chance-corrected agreement for MANY raters (the
    * multi-annotator QA number preference data actually needs: Cohen's
    * κ only compares two): with n raters per item and n_ij the count of
    * raters putting item i in category j, per-item agreement
    * P_i = (Σ_j n_ij² − n)/(n(n−1)), observed P̄ = mean_i P_i, chance
    * P̄_e = Σ_j p_j² over the category marginals p_j = Σ_i n_ij/(Nn),
    * κ = (P̄ − P̄_e)/(1 − P̄_e). Input is one row per (item, rater
    * label); every item must carry the SAME rater count (require'd from
    * the data — a missing rating breaks the formula, not the code).
    * Two (item, category)-cell aggregates, exact integer arithmetic
    * until the final divisions; NULL κ when P̄_e = 1. NULL labels take
    * the '(null)' sentinel class, the [[classificationReport]]
    * convention. */
  def fleissKappa(ratings: DataFrame, itemCol: String, labelCol: String,
      roundTo: Int = 5): DataFrame = {
    def cls(c: Column) = coalesce(c.cast("string"), lit("(null)"))
    val cells = ratings
      .select(col(itemCol).as("__i"), cls(col(labelCol)).as("__j"))
      .groupBy(col("__i"), col("__j")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // (item × category)-sized; read twice below
    val perItem = cells.groupBy(col("__i"))
      .agg(sum(col("__c") * col("__c")).as("__sq"), sum(col("__c")).as("__n"))
    val nRatersRow = perItem.agg(min(col("__n")).as("lo"),
      max(col("__n")).as("hi"), count(lit(1)).as("items")).head()
    // EMPTY ratings: min/max over zero rows are NULL (the CorpusReport
    // longOr0 class) — return the all-null row the siblings produce
    // instead of NPE-ing on getLong (review-pass finding)
    if (nRatersRow.isNullAt(0)) {
      val nullD = lit(null).cast("double")
      return ratings.sparkSession.range(1).select(
        lit(0L).as("n_items"), lit(null).cast("long").as("n_raters"),
        nullD.as("pbar"), nullD.as("pe"), nullD.as("kappa"))
    }
    val (nLo, nHi, nItems) =
      (nRatersRow.getLong(0), nRatersRow.getLong(1), nRatersRow.getLong(2))
    require(nLo == nHi,
      s"Fleiss' kappa needs a constant rater count per item; got [$nLo, $nHi]")
    require(nLo >= 2, s"need >= 2 raters per item, got $nLo")
    val n = nLo.toDouble
    val pbar = perItem.agg(
      (sum((col("__sq") - col("__n")).cast("double")) /
        (lit(nItems.toDouble) * n * (n - 1))).as("__pbar"))
    val pe = cells.groupBy(col("__j")).agg(sum(col("__c")).as("__nj"))
      .agg(sum(pow(col("__nj").cast("double") /
        lit(nItems.toDouble * n), 2)).as("__pe"))
    pbar.crossJoin(broadcast(pe)).select(
      lit(nItems).as("n_items"), lit(nLo).as("n_raters"),
      round(col("__pbar"), roundTo).as("pbar"),
      round(col("__pe"), roundTo).as("pe"),
      round(when(col("__pe") < 1.0,
        (col("__pbar") - col("__pe")) / (lit(1.0) - col("__pe"))),
        roundTo).as("kappa"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters (THE preference-data QA number: are the DPO/RLHF judgments
    * better than coin flips?): κ = (p_o − p_e)/(1 − p_e) with p_o the
    * observed agreement and p_e = Σ_k marginal_a(k)·marginal_b(k). ONE
    * (a, b) contingency aggregate over the pair projection — the cells
    * are category²-sized by construction, so they collect (the
    * codebook/shortlist pattern) and the marginals, diagonal and p_e
    * derive driver-side in exact integer arithmetic; only the final
    * divisions and rounding run as Spark expressions over the collected
    * scalars, keeping the rounding semantics identical to every other
    * metric here. (r12 shipped this as three re-plans of the pair
    * projection = 3 input scans; the cells were always tiny enough to
    * collect once.) NULL rater labels become the explicit "(null)"
    * class — the [[classificationReport]] sentinel — so a (null, null)
    * pair counts as agreement and null categories participate in the
    * p_e marginals instead of silently deflating κ. κ is NULL when
    * p_e = 1 (both raters constant and equal — agreement is
    * unmeasurable, not perfect). */
  def cohenKappa(pairs: DataFrame, aCol: String, bCol: String,
      roundTo: Int = 5, maxCells: Int = 10000): DataFrame = {
    def cls(c: Column) = coalesce(c.cast("string"), lit("(null)"))
    // the collect is category²-sized BY CONTRACT; a misuse with
    // high-cardinality rater columns (ids, free text) must fail loudly
    // at `maxCells` distributed rows, not as a driver OOM (ADVICE r13).
    // limit(maxCells + 1) keeps the guard zero-extra-scan: the overflow
    // row rides the same collect that would have fetched the cells.
    val cells = pairs
      .select(cls(col(aCol)).as("__a"), cls(col(bCol)).as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c"))
      .limit(maxCells + 1)
      .collect()
    require(cells.length <= maxCells,
      s"cohenKappa saw more than $maxCells (rater_a, rater_b) contingency " +
        s"cells — '$aCol'/'$bCol' look like high-cardinality columns, not " +
        "categorical labels (raise maxCells only if the label vocabulary " +
        "is genuinely that large)")
    val n = cells.iterator.map(_.getLong(2)).sum
    val ag = cells.iterator
      .filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    val na = cells.groupBy(_.getString(0)).map { case (k, rs) =>
      k -> rs.iterator.map(_.getLong(2)).sum }
    val nb = cells.groupBy(_.getString(1)).map { case (k, rs) =>
      k -> rs.iterator.map(_.getLong(2)).sum }
    // Σ na·nb over the shared categories: each product and every partial
    // sum is an exact integer below 2^53, so the double sum is exact in
    // any order — bit-identical to the aggregate it replaces
    val pe = na.keysIterator.toSeq.sorted.iterator
      .map(k => na(k).toDouble * nb.getOrElse(k, 0L).toDouble).sum
    // empty input replays the old aggregate's null row (sum over zero
    // rows is NULL, so po/pe/kappa all null out downstream)
    val one = pairs.sparkSession.range(1).select(
      (if (n > 0) lit(n) else lit(null).cast("long")).as("__n"),
      lit(ag).as("__ag"), lit(pe).as("__pe"))
    val nD = col("__n").cast("double")
    val po = col("__ag").cast("double") / nD
    val peFrac = col("__pe") / (nD * nD)
    one.select(col("__n").as("n"),
      round(po, roundTo).as("po"),
      round(peFrac, roundTo).as("pe"),
      round(when(col("__pe") < nD * nD,
        (po - peFrac) / (lit(1.0) - peFrac)), roundTo).as("kappa"))
  }
}
