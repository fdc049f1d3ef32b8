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
    * the argmax tiebreak preference). */
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
