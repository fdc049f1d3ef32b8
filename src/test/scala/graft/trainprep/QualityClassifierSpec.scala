package graft.trainprep

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The hashed-feature logistic classifier: bucket portability against a
  * local md5 model, scoring against a local model, and distributed
  * training separating a labeled fixture. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("tokenBucket matches a local first-8-md5-hex-digits model") {
    val toks = Seq("hello", "world", "a", "", "日本語").toDF("t")
      .filter(length(col("t")) > 0)
    val got = toks.select(col("t"),
        QualityClassifier.tokenBucket(col("t"), 256).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def local(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 256
    }
    for ((t, b) <- got) assert(b == local(t), s"token '$t'")
  }

  test("scoreLinear matches a local model incl. repeated tokens and empty docs") {
    val w = Array.tabulate(64)(b => (b % 7) / 10.0 - 0.3)
    val docs = Seq(
      (1L, "alpha beta alpha"), // repeated token counts twice
      (2L, ""),                 // no tokens -> sigma(bias)
      (3L, "gamma")
    ).toDF("doc_id", "text")
    val got = QualityClassifier.scoreLinear(docs, "doc_id", "text", w,
        bias = 0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def local(toks: Seq[String]): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val z = toks.map { t =>
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        w((java.lang.Long.parseLong(hex.take(8), 16) % 64).toInt)
      }.sum
      BigDecimal(1.0 / (1.0 + math.exp(-(z + 0.25))))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) == local(Seq("alpha", "beta", "alpha")))
    assert(got(2L) == local(Nil))
    assert(got(3L) == local(Seq("gamma")))
  }

  test("trainLogReg separates a spam/quality fixture and reduces loss") {
    // 40 docs: label-1 docs speak 'good' vocabulary, label-0 docs 'bad';
    // a shared neutral token appears everywhere
    val docs = (0 until 40).map { i =>
      val good = i % 2 == 1
      val words =
        if (good) Seq(s"insight${i % 5}", "coherent", "argument", "shared")
        else Seq(s"spam${i % 5}", "clickbait", "garbage", "shared")
      (i.toLong, words.mkString(" "), if (good) 1 else 0)
    }.toDF("doc_id", "text", "label")
    def loss(w: Array[Double], b: Double): Double = {
      val scored = QualityClassifier.scoreLinear(docs, "doc_id", "text",
          w.toSeq, b, roundTo = 10)
        .join(docs.select(col("doc_id"), col("label").cast("double").as("y")), "doc_id")
        .select(when(col("y") === 1.0, -log(col("quality_score")))
          .otherwise(-log(lit(1.0) - col("quality_score"))).as("l"))
      scored.agg(avg("l")).head().getDouble(0)
    }
    val initial = loss(new Array[Double](128), 0.0)
    val (w, b) = QualityClassifier.trainLogReg(docs, "doc_id", "text",
      "label", numFeatures = 128, iters = 40, lr = 2.0)
    assert(loss(w, b) < initial / 4,
      s"training must cut the log-loss well below ln 2 = $initial")
    val preds = QualityClassifier.scoreLinear(docs, "doc_id", "text", w.toSeq, b)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1) > 0.5)).toMap
    assert((0 until 40).forall(i => preds(i.toLong) == (i % 2 == 1)),
      "the separable fixture must classify perfectly")
  }
}
