package graft.trainprep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Linear (logistic) document-quality classifier over hashed bag-of-words
  * features — the fastText-style supervised filter training pipelines run
  * when heuristic quality scores are not enough (label a few thousand
  * docs good/bad, train, score the corpus).
  *
  * Feature space: each space-split token hashes into one of `numFeatures`
  * buckets via the first 8 hex digits of md5 — deliberately
  * engine-portable (any SQL engine replays `('0x' || substr(md5(t),1,8))
  * ::BIGINT % F`), so the scoring path is DuckDB-oracled end to end
  * (q_quality_lr). Training is standard full-batch gradient descent where
  * EVERY iteration is two distributed hash aggregates — no per-row state
  * on the driver, nothing collected bigger than the weight vector:
  *
  *  1. margins: per-doc z = Σ w[bucket]·count (groupBy doc — map-side
  *     partial sums), error e = σ(z + b₀) − y;
  *  2. gradient: per-bucket Σ e·count (groupBy bucket — at most
  *     numFeatures rows collected, the only driver materialization).
  *
  * The bucketed count frame is computed ONCE and persisted; iterations
  * reuse it (the 100 TB corpus is scanned once, the per-iteration work is
  * over the much smaller (doc, bucket) aggregate). Weights broadcast each
  * round as a literal array — `element_at` on it is codegen'd. */
object QualityClassifier {

  /** Engine-portable token → feature bucket in [0, numFeatures). */
  def tokenBucket(tok: Column, numFeatures: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % numFeatures

  /** Hashed-feature counts: one row per (doc, bucket) with the token
    * count and the label carried through. The single corpus scan — THE
    * feature-space definition, shared with LangIdClassifier so the
    * cross-engine bucket contract cannot drift between the two scorers. */
  private[trainprep] def bucketed(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Option[String], numFeatures: Int): DataFrame = {
    val base = docs.select(
      col(idCol) +: labelCol.map(l => col(l).cast("double").as("__y")).toSeq :+
        explode(split(col(textCol), " ", -1)).as("__t"): _*)
      .filter(length(col("__t")) > 0)
      .withColumn("__b", tokenBucket(col("__t"), numFeatures).cast("int"))
    val keys = Seq(col(idCol), col("__b"))
    labelCol match {
      case Some(_) => base.groupBy(keys: _*)
        .agg(count(lit(1)).cast("double").as("__c"), first(col("__y")).as("__y"))
      case None => base.groupBy(keys: _*)
        .agg(count(lit(1)).cast("double").as("__c"))
    }
  }

  /** Score docs against a fixed weight vector: σ(bias + Σ w[bucket]) with
    * repeated tokens weighted by multiplicity. Returns
    * (idCol, quality_score); docs with no tokens score σ(bias). */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double], bias: Double = 0.0, roundTo: Int = 5): DataFrame = {
    val wLit = typedlit(weights)
    val scored = bucketed(docs, idCol, textCol, None, weights.length)
      .select(col(idCol),
        (element_at(wLit, col("__b") + 1) * col("__c")).as("__w"))
      .groupBy(col(idCol))
      .agg(sum("__w").as("__z"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__z"), lit(0.0)) + lit(bias)))), roundTo)
          .as("quality_score"))
  }

  /** Full-batch logistic-regression training; returns (weights, bias).
    * `l2` is the ridge penalty (never applied to the bias). */
  def trainLogReg(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, numFeatures: Int = 1024, iters: Int = 30,
      lr: Double = 1.0, l2: Double = 0.0): (Array[Double], Double) = {
    // the bias is bucket −1 with count 1 on every doc: its gradient rides
    // the same per-bucket aggregate as the weights (no separate job)
    val feats = bucketed(docs, idCol, textCol, Some(labelCol), numFeatures)
      .select(col(idCol), col("__b"), col("__c"), col("__y"))
      .unionByName(docs.select(col(idCol), lit(-1).as("__b"),
        lit(1.0).as("__c"), col(labelCol).cast("double").as("__y")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count().toDouble
    val w = new Array[Double](numFeatures)
    var bias = 0.0
    var it = 0
    while (it < iters) {
      val wLit = typedlit(w.toSeq)
      val wOf = when(col("__b") === -1, lit(bias))
        .otherwise(element_at(wLit, col("__b") + 1))
      val margins = feats.groupBy(col(idCol))
        .agg(sum(wOf * col("__c")).as("__z"), first(col("__y")).as("__y"))
        .select(col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-col("__z"))) - col("__y")).as("__e"))
      val grad = feats.join(margins, Seq(idCol))
        .groupBy(col("__b"))
        .agg(sum(col("__e") * col("__c")).as("__g"))
        .collect()
      val gm = new Array[Double](numFeatures)
      var biasGrad = 0.0
      grad.foreach { r =>
        if (r.getInt(0) == -1) biasGrad = r.getDouble(1)
        else gm(r.getInt(0)) = r.getDouble(1)
      }
      var i = 0
      while (i < numFeatures) {
        w(i) -= lr * (gm(i) / n + l2 * w(i))
        i += 1
      }
      bias -= lr * biasGrad / n
      it += 1
    }
    feats.unpersist()
    (w, bias)
  }
}
