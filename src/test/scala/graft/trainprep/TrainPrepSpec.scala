package graft.trainprep

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat"),
    (3L, "a bird")
  ).toDF("doc_id", "text")

  test("tfIdf computes smoothed idf and per-doc tf") {
    val out = TrainPrep.tfIdf(docs, "doc_id", "text")
      .select("doc_id", "token", "tf", "df", "idf").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // 'the' appears in 2 of 3 docs: idf = ln(4/3)
    val (tf, df, idf) = out((1L, "the"))
    assert(tf == 1L && df == 2L)
    assert(math.abs(idf - math.log(4.0 / 3.0)) < 1e-12)
    // 'bird' is unique to doc 3: idf = ln(4/2)
    assert(math.abs(out((3L, "bird"))._3 - math.log(2.0)) < 1e-12)
  }

  test("tfIdf with supplied N matches the counting overload exactly") {
    val counted = TrainPrep.tfIdf(docs, "doc_id", "text")
      .select("doc_id", "token", "tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val supplied = TrainPrep.tfIdf(docs, "doc_id", "text", nDocs = 3L)
      .select("doc_id", "token", "tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(supplied == counted)
    intercept[IllegalArgumentException] {
      TrainPrep.tfIdf(docs, "doc_id", "text", nDocs = 0L)
    }
  }

  test("hashSampleFilter is deterministic and rate-accurate") {
    val ids = spark.range(10000).toDF("id")
    val kept = ids.filter(TrainPrep.hashSampleFilter(col("id"), "15")).count()
    val kept2 = ids.filter(TrainPrep.hashSampleFilter(col("id"), "15")).count()
    assert(kept == kept2) // no RNG, no partition sensitivity
    // expected rate 0x15/256 ~ 8.2%; binomial 3-sigma on n=10000 is ~0.8%
    assert(math.abs(kept / 10000.0 - 0x15 / 256.0) < 0.01)
  }

  test("hashSampleFilter normalizes uppercase hex and rejects non-hex") {
    val ids = spark.range(2000).toDF("id")
    val lower = ids.filter(TrainPrep.hashSampleFilter(col("id"), "a0")).count()
    val upper = ids.filter(TrainPrep.hashSampleFilter(col("id"), "A0")).count()
    assert(lower == upper && lower > 0) // "A0" must not silently select ~0 rows
    intercept[IllegalArgumentException] {
      TrainPrep.hashSampleFilter(col("id"), "0x15")
    }
    intercept[IllegalArgumentException] {
      TrainPrep.stratifiedSampleFilter(col("id"), lit("en"), Seq("en" -> "GG"))
    }
  }

  test("hash thresholds reject Unicode digits that would silently select ~100%") {
    // fullwidth '５' (U+FF15) and Arabic-Indic '٥' (U+0665) satisfy
    // Character.isDigit but sort above 'f', making the filter a no-op
    intercept[IllegalArgumentException] {
      TrainPrep.hashSampleFilter(col("id"), "５")
    }
    intercept[IllegalArgumentException] {
      TrainPrep.hashSampleFilter(col("id"), "٥" + "0")
    }
  }

  test("stratifiedSampleFilter rejects thresholds longer than the 2-char prefix") {
    // "a00" > prefix "a0" lexicographically, so a 3-digit threshold would
    // silently round the rate up to 1/256 granularity — must fail loudly
    intercept[IllegalArgumentException] {
      TrainPrep.stratifiedSampleFilter(col("id"), lit("en"), Seq("en" -> "a00"))
    }
  }

  test("stratifiedSampleFilter drops unlisted strata") {
    val d = Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("id", "lang")
    val kept = d.filter(TrainPrep.stratifiedSampleFilter(col("id"), col("lang"),
      Seq("en" -> "ff", "de" -> "ff"))) // threshold ff ~ keep (almost) all
      .select("lang").as[String].collect().toSet
    assert(!kept.contains("fr"))
  }

  test("redactPii masks emails and phone numbers, leaves the rest") {
    val d = Seq("mail a.b-c%d@sub.example.org and call 555-1234 today").toDF("t")
    val out = d.select(TrainPrep.redactPii(col("t"))).head().getString(0)
    assert(out == "mail <EMAIL> and call <PHONE> today")
  }

  test("packChunks lays docs end-to-end and cuts at the budget") {
    val d = Seq(
      (1L, Seq.fill(5)("w").mkString(" ")), // 5 tokens, offsets [0,5)
      (2L, Seq.fill(4)("w").mkString(" ")), // [5,9) - spans the 8-boundary
      (3L, Seq.fill(2)("w").mkString(" ")) // [9,11)
    ).toDF("doc_id", "text")
    val rows = TrainPrep.packChunks(d, "doc_id", "text", 8L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "chunk_id", "chunk_end_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows(0) == ((1L, 5L, 0L, 0L, 0L)))
    assert(rows(1) == ((2L, 4L, 5L, 0L, 1L))) // spans chunks 0 and 1
    assert(rows(2) == ((3L, 2L, 9L, 1L, 1L)))
  }

  test("packChunks clamps zero-token docs to their own chunk (never -1)") {
    val d = Seq(
      (1L, ""), // 0 tokens at offset 0: end id must clamp to chunk 0
      (2L, Seq.fill(8)("w").mkString(" ")), // fills chunk 0 exactly
      (3L, ""), // 0 tokens exactly ON the budget boundary (offset 8)
      (4L, "w")
    ).toDF("doc_id", "text")
    val rows = TrainPrep.packChunks(d, "doc_id", "text", 8L)
      .orderBy("doc_id").select("doc_id", "chunk_id", "chunk_end_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows(0) == ((1L, 0L, 0L)))
    assert(rows(2) == ((3L, 1L, 1L))) // not (1, 0)
    rows.foreach { case (_, cid, cend) => assert(cend >= cid) }
  }

  test("ngramShingles: sliding windows, short docs emit nothing") {
    val d = Seq((1L, "a b c d"), (2L, "a b"), (3L, ""), (4L, "x y z"))
      .toDF("doc_id", "text")
    val sh = TrainPrep.ngramShingles(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(sh.filter(_._1 == 1L).map(_._2).toSet === Set("a b c", "b c d"))
    assert(sh.forall(_._1 != 2L), "doc shorter than n emits no shingles")
    assert(sh.forall(_._1 != 3L), "empty doc emits no shingles")
    assert(sh.filter(_._1 == 4L).map(_._2).toSeq === Seq("x y z"))
  }

  test("contaminationPairs flags only docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // contains bench 1
      (101L, "completely unrelated text about spark plans"),
      (102L, "prefix words then the quick brown fox appears here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "the quick brown fox"),
      (2L, "no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val pairs = TrainPrep.contaminationPairs(
        train, "doc_id", "text", bench, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 1L), (102L, 1L)))
    // the benchmark side must broadcast: the training scan is one pass
    val plan = TrainPrep.contaminationPairs(
        train, "doc_id", "text", bench, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan.take(800))
  }
}
