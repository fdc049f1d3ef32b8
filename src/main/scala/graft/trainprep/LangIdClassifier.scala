package graft.trainprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — the fastText-langid-style upgrade of
  * the stopword heuristic ([[graft.functions.TextFunctions.langIdHeuristic]],
  * which stays the zero-setup default): one-vs-rest logistic heads over
  * the same engine-portable hashed bag-of-words feature space as the
  * quality classifier (E44), sharing its trainer.
  *
  * Training: one [[QualityClassifier.trainLogReg]] run per language with
  * the binary label `label == lang` — each run is the E44 machinery
  * verbatim (per-iteration work is two distributed hash aggregates over a
  * persisted (doc, bucket) frame; nothing driver-side beyond the weight
  * vector).
  *
  * Scoring: ALL heads in one pass — a single (doc, bucket) count
  * aggregate, then one per-doc aggregate computing every language's
  * margin simultaneously (each head's weights ride as a broadcast literal
  * array; `element_at` on a literal is codegen'd). Argmax with a
  * deterministic tiebreak (score desc, language asc — mirroring the
  * heuristic's fixed language order). ONE corpus scan and one shuffle
  * regardless of the number of languages, where per-head `scoreLinear`
  * calls would cost a scan each.
  *
  * Cross-engine: bucket = first 8 md5 hex digits mod numFeatures — the
  * q_quality_lr portability contract — so the scoring path is
  * DuckDB-oracled end to end (q_text_langid_lr replays margins and the
  * argmax tiebreak exactly); training is spec-gated (LangIdSpec trains on
  * a planted 4-language fixture and requires clean separation).
  */
object LangIdClassifier {

  /** One trained head: (language tag, weights, bias). */
  final case class Head(lang: String, weights: Seq[Double], bias: Double)

  /** Train one-vs-rest heads, one per language in `langs` (order defines
    * the argmax tiebreak preference). SEQUENTIAL reference implementation:
    * |langs| independent [[QualityClassifier.trainLogReg]] runs = langs ×
    * iters × 2 corpus-frame aggregates. Kept as the semantic reference
    * [[trainOneVsRestFused]] is spec-equated against; prefer the fused
    * trainer — at 100 languages it runs 100× fewer passes. */
  def trainOneVsRest(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, langs: Seq[String], numFeatures: Int = 256,
      iters: Int = 30, lr: Double = 1.0): Seq[Head] =
    langs.map { lang =>
      val bin = docs.withColumn("__is_lang",
        when(col(labelCol) === lang, 1.0).otherwise(0.0))
      val (w, b) = QualityClassifier.trainLogReg(
        bin, idCol, textCol, "__is_lang", numFeatures, iters, lr)
      Head(lang, w.toSeq, b)
    }

  /** Train EVERY head in one pass per iteration — the scoring side's
    * all-heads-at-once shape applied to training. The (doc, bucket)
    * count frame is label-independent, so it is built and persisted ONCE
    * (labels ride along as a language INDEX — `__y = indexOf(label)`,
    * −1 for off-list labels, which are a 0 target for every head exactly
    * as `label === lang` is false for each); each iteration runs
    *
    *  - ONE per-doc aggregate with |langs| sum columns (every head's
    *    margin — each head's weights a broadcast literal, the bias as
    *    the scoring-side bucket −1 trick), and
    *  - ONE per-bucket aggregate with |langs| gradient sums over the
    *    margins join,
    *
    * i.e. iters × 2 aggregates TOTAL where the sequential trainer pays
    * langs × iters × 2. Per-head sums are separate COLUMNS of the same
    * aggregate rather than an exploded array: rows never fan out ×langs,
    * and every head's sum accumulates over the SAME row stream in the
    * same order, which is what lets LangIdFusedSpec require
    * head-for-head weight EQUALITY with the sequential trainer (the
    * per-head arithmetic is the identical expression over the identical
    * row order — not merely algebraically equal). */
  def trainOneVsRestFused(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, langs: Seq[String], numFeatures: Int = 256,
      iters: Int = 30, lr: Double = 1.0, l2: Double = 0.0): Seq[Head] = {
    require(langs.nonEmpty, "need at least one language")
    val H = langs.length
    // label → head index, −1 off-list (bucketed() casts it to double —
    // indices are small integers, exact in a double)
    val li = langs.zipWithIndex.foldLeft(lit(-1.0)) { case (acc, (l, i)) =>
      when(col(labelCol) === l, lit(i.toDouble)).otherwise(acc)
    }
    val docsIdx = docs.withColumn("__li", li)
    val feats = QualityClassifier
      .bucketed(docsIdx, idCol, textCol, Some("__li"), numFeatures)
      .select(col(idCol), col("__b"), col("__c"), col("__y"))
      .unionByName(docsIdx.select(col(idCol), lit(-1).as("__b"),
        lit(1.0).as("__c"), col("__li").as("__y")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count().toDouble
    val w = Array.fill(H)(new Array[Double](numFeatures))
    val bias = new Array[Double](H)
    var it = 0
    while (it < iters) {
      // one per-doc aggregate: every head's margin as its own sum column
      val zCols = (0 until H).map { h =>
        val wOf = when(col("__b") === -1, lit(bias(h)))
          .otherwise(element_at(typedlit(w(h).toSeq), col("__b") + 1))
        sum(wOf * col("__c")).as(s"__z$h")
      }
      val margins = feats.groupBy(col(idCol))
        .agg(zCols.head, (zCols.drop(1) :+ first(col("__y")).as("__y")): _*)
      val errs = margins.select(col(idCol) +: (0 until H).map { h =>
        val y = when(col("__y") === h.toDouble, lit(1.0)).otherwise(lit(0.0))
        (lit(1.0) / (lit(1.0) + exp(-col(s"__z$h"))) - y).as(s"__e$h")
      }: _*)
      // one per-bucket aggregate: every head's gradient column
      val gCols = (0 until H).map(h =>
        sum(col(s"__e$h") * col("__c")).as(s"__g$h"))
      val grad = feats.join(errs, Seq(idCol))
        .groupBy(col("__b"))
        .agg(gCols.head, gCols.drop(1): _*)
        .collect()
      val gm = Array.fill(H)(new Array[Double](numFeatures))
      val gBias = new Array[Double](H)
      grad.foreach { r =>
        val b = r.getInt(0)
        var h = 0
        while (h < H) {
          if (b == -1) gBias(h) = r.getDouble(h + 1)
          else gm(h)(b) = r.getDouble(h + 1)
          h += 1
        }
      }
      var h = 0
      while (h < H) {
        var i = 0
        while (i < numFeatures) {
          w(h)(i) -= lr * (gm(h)(i) / n + l2 * w(h)(i))
          i += 1
        }
        bias(h) -= lr * gBias(h) / n
        h += 1
      }
      it += 1
    }
    feats.unpersist()
    langs.zipWithIndex.map { case (l, h) => Head(l, w(h).toSeq, bias(h)) }
  }

  /** Score every head in one pass and pick the argmax language. Returns
    * (idCol, one `score_<lang>` column per head rounded to `roundTo`,
    * `pred_lang`). Docs with no tokens score every head at σ(bias) and
    * resolve by the tiebreak alone. */
  def scoreArgmax(docs: DataFrame, idCol: String, textCol: String,
      heads: Seq[Head], roundTo: Int = 5): DataFrame = {
    require(heads.nonEmpty, "scoreArgmax needs at least one trained head")
    val n = heads.head.weights.length
    require(heads.forall(_.weights.length == n),
      "all heads must share one feature space")
    // the E44 feature space VERBATIM (shared bucketed() — not a copy, so
    // the md5-bucket portability contract cannot drift between scorers)
    val bucketed = QualityClassifier.bucketed(docs, idCol, textCol, None, n)
    // every head's margin in ONE per-doc aggregate — weights are literal
    // arrays, so adding a language adds a sum, not a scan
    val zCols = heads.map { h =>
      sum(element_at(typedlit(h.weights), col("__b") + 1) * col("__c"))
        .as(s"__z_${h.lang}")
    }
    val z = bucketed.groupBy(col(idCol)).agg(zCols.head, zCols.drop(1): _*)
    def scoreOf(h: Head): Column =
      round(lit(1.0) / (lit(1.0) +
        exp(-(coalesce(col(s"__z_${h.lang}"), lit(0.0)) + lit(h.bias)))),
        roundTo)
    val scoreCols = heads.map(h => scoreOf(h).as(s"score_${h.lang}"))
    val withScores = docs.select(col(idCol)).join(z, Seq(idCol), "left")
      .select(col(idCol) +: scoreCols: _*)
    val scores = heads.map(h => col(s"score_${h.lang}"))
    val best =
      if (scores.length == 1) scores.head else greatest(scores: _*)
    // head order is the tiebreak: first language reaching the max wins
    val pred = heads.zip(scores).foldRight(lit(heads.last.lang)) {
      case ((h, s), rest) => when(s === best, lit(h.lang)).otherwise(rest)
    }
    withScores.select(
      col(idCol) +: scores :+ pred.as("pred_lang"): _*)
  }
}
