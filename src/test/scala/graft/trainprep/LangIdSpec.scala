package graft.trainprep

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trained language ID: one-vs-rest training separates a planted
  * 4-language corpus cleanly, scoring is one corpus scan for all heads,
  * and the argmax tiebreak is deterministic. */
class LangIdSpec extends SparkSpec {

  private val vocab = Map(
    "en" -> Seq("the", "and", "with", "that", "have", "from", "this"),
    "de" -> Seq("der", "die", "und", "nicht", "ist", "eine", "auch"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "une", "pour"),
    "es" -> Seq("el", "los", "y", "es", "una", "para", "como"))
  private val noise = Seq("data", "spark", "table", "row")

  /** 40 docs/language: language words + shared noise, deterministic mix. */
  private def fixture() = {
    import spark.implicits._
    val rows = for {
      (lang, words) <- vocab.toSeq.sortBy(_._1)
      i <- 0 until 40
    } yield {
      val toks = (0 until 12).map { j =>
        if ((i + j) % 3 == 0) noise((i + j) % noise.length)
        else words((i * 7 + j) % words.length)
      }
      (s"$lang-$i", toks.mkString(" "), lang)
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("one-vs-rest heads separate the planted languages completely") {
    val docs = fixture()
    val heads = LangIdClassifier.trainOneVsRest(
      docs, "doc_id", "text", "lang", Seq("en", "de", "fr", "es"),
      numFeatures = 64, iters = 25, lr = 1.0)
    assert(heads.map(_.lang) == Seq("en", "de", "fr", "es"))
    val pred = LangIdClassifier.scoreArgmax(docs, "doc_id", "text", heads)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val wrong = pred.filter(col("pred_lang") =!= col("lang")).count()
    assert(wrong == 0, s"$wrong of 160 planted docs misclassified")
    // scores are honest probabilities: the winning head is confident
    val minWin = pred.select(greatest(col("score_en"), col("score_de"),
      col("score_fr"), col("score_es"))).collect().map(_.getDouble(0)).min
    assert(minWin > 0.6, s"winning score only $minWin")
  }

  test("fused trainer: head-for-head weight equality with the sequential one") {
    val docs = fixture()
    val langs = Seq("en", "de", "fr", "es")
    // ITERATION 1 is bit-exact BY CONSTRUCTION in any summation order:
    // w = 0 ⇒ every margin sum is exactly 0.0, e = 0.5 − y, and the
    // gradient sums are multiples of 0.5 far below 2^53 — every partial
    // sum exactly representable. So the first-step weights pin the two
    // trainers to the identical FORMULA over the identical cells, with
    // zero tolerance.
    val seq1 = LangIdClassifier.trainOneVsRest(
      docs, "doc_id", "text", "lang", langs, numFeatures = 64, iters = 1)
    val fused1 = LangIdClassifier.trainOneVsRestFused(
      docs, "doc_id", "text", "lang", langs, numFeatures = 64, iters = 1)
    seq1.zip(fused1).foreach { case (a, b) =>
      assert(a.bias == b.bias && a.weights == b.weights,
        s"${a.lang}: iteration-1 weights must be BIT-identical")
    }
    // At depth the two plans join margins differently, so double addition
    // order can differ by ulps (measured: 1 ulp on the bias after 10
    // iterations — FP addition is not associative). The contract is ulp-
    // bounded equivalence plus identical discrete behavior, never drift.
    val seq = LangIdClassifier.trainOneVsRest(
      docs, "doc_id", "text", "lang", langs, numFeatures = 64, iters = 10)
    val fused = LangIdClassifier.trainOneVsRestFused(
      docs, "doc_id", "text", "lang", langs, numFeatures = 64, iters = 10)
    assert(fused.map(_.lang) == langs)
    seq.zip(fused).foreach { case (a, b) =>
      val dw = a.weights.zip(b.weights).map { case (x, y) => math.abs(x - y) }.max
      assert(dw <= 1e-12 && math.abs(a.bias - b.bias) <= 1e-12,
        s"${a.lang} diverged beyond ulp noise: |Δw|=$dw |Δb|=${math.abs(a.bias - b.bias)}")
    }
    val ps = LangIdClassifier.scoreArgmax(docs, "doc_id", "text", seq)
      .select("doc_id", "pred_lang").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val pf = LangIdClassifier.scoreArgmax(docs, "doc_id", "text", fused)
      .select("doc_id", "pred_lang").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ps == pf, "the two trainers must classify identically")
  }

  test("fused trainer still separates the planted languages completely") {
    val docs = fixture()
    val heads = LangIdClassifier.trainOneVsRestFused(
      docs, "doc_id", "text", "lang", Seq("en", "de", "fr", "es"),
      numFeatures = 64, iters = 25, lr = 1.0)
    val pred = LangIdClassifier.scoreArgmax(docs, "doc_id", "text", heads)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val wrong = pred.filter(col("pred_lang") =!= col("lang")).count()
    assert(wrong == 0, s"$wrong of 160 planted docs misclassified (fused)")
  }

  test("off-list labels are a zero target for every head in both trainers") {
    import spark.implicits._
    val docs = fixture().unionByName(
      Seq(("zz-0", "mystery words here unknown tongue", "zz"))
        .toDF("doc_id", "text", "lang"))
    val langs = Seq("en", "de")
    val seq = LangIdClassifier.trainOneVsRest(
      docs, "doc_id", "text", "lang", langs, numFeatures = 32, iters = 5)
    val fused = LangIdClassifier.trainOneVsRestFused(
      docs, "doc_id", "text", "lang", langs, numFeatures = 32, iters = 5)
    seq.zip(fused).foreach { case (a, b) =>
      assert(a.bias == b.bias && a.weights == b.weights,
        s"${a.lang} diverged with an off-list label present")
    }
  }

  test("scoring all heads costs one corpus scan") {
    val dir = java.nio.file.Files.createTempDirectory("langid").toString
    fixture().write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val heads = Seq("en", "de", "fr", "es").zipWithIndex.map { case (l, k) =>
      LangIdClassifier.Head(l,
        Array.tabulate(64)(b => ((b * 31 + k) % 17) / 10.0 - 0.8).toSeq, 0.0)
    }
    val out = LangIdClassifier.scoreArgmax(docs, "doc_id", "text", heads)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(plan).length <= 2,
      "adding languages must not add corpus scans:\n" + plan.take(1200))
    assert(!plan.contains("ScalaUDF"), plan.take(800))
  }

  test("deterministic head-order tiebreak on an all-noise document") {
    import spark.implicits._
    val docs = Seq(("x", "data data")).toDF("doc_id", "text")
    // identical zero weights → every head scores the same → first head wins
    val heads = Seq("en", "de").map(l =>
      LangIdClassifier.Head(l, Seq.fill(16)(0.0), 0.0))
    val r = LangIdClassifier.scoreArgmax(docs, "doc_id", "text", heads)
      .select("pred_lang").collect().head.getString(0)
    assert(r == "en")
  }
}
