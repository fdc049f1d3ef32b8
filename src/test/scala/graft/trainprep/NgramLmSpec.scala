package graft.trainprep

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Word-bigram stupid-backoff LM (E162): all three score branches against
  * hand arithmetic, the no-transition edge, and the count tables. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq((1L, "a b a c"), (2L, "b a")).toDF("doc_id", "text")
  // uni: a=3, b=2, c=1, T=6; bi: (a,b)=1, (b,a)=2, (a,c)=1

  test("count tables match hand tallies") {
    val uni = NgramLm.unigramCounts(train, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val bi = NgramLm.bigramCounts(train, "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi === Map(("a", "b") -> 1L, ("b", "a") -> 2L, ("a", "c") -> 1L))
  }

  test("seen / backoff / OOV branches, no-transition docs emit no row") {
    val uni = NgramLm.unigramCounts(train, "text")
    val bi = NgramLm.bigramCounts(train, "text")
    val docs = Seq(
      (10L, "a b"),              // seen bigram: S = c12/c1 = 1/3
      (11L, "c b"),              // unseen bigram, seen w2: S = 0.4·2/6
      (12L, "a z"),              // OOV w2: S = 0.4·1/6
      (13L, "a"),                // one token — no transitions
      (14L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = NgramLm.stupidBackoffNll(docs, "doc_id", "text", uni, bi, 6L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet === Set(10L, 11L, 12L),
      "token-poor and NULL docs have nothing to score")
    assert(got(10L) === ((1L, 0.0, r6(-math.log(1.0 / 3.0)))))
    assert(got(11L) === ((1L, 1.0, r6(-math.log(0.4 * 2.0 / 6.0)))))
    assert(got(12L) === ((1L, 1.0, r6(-math.log(0.4 * 1.0 / 6.0)))))
    // in-domain text must score below off-domain at equal length
    assert(got(10L)._3 < got(11L)._3 && got(11L)._3 < got(12L)._3)
  }

  test("sourceJsDivergence: hand case, identical = 0, disjoint pair absent") {
    val docs = Seq(
      ("A", "x x y"), ("B", "x y"), ("C", "z"), ("D", "x x y"))
      .toDF("source", "text")
    val got = NgramLm.sourceJsDivergence(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A = {x: 2/3, y: 1/3}, B = {x: 1/2, y: 1/2}; both fully shared
    val core =
      (2.0 / 3) * math.log(2 * (2.0 / 3) / (2.0 / 3 + 0.5)) +
        0.5 * math.log(2 * 0.5 / (2.0 / 3 + 0.5)) +
      (1.0 / 3) * math.log(2 * (1.0 / 3) / (1.0 / 3 + 0.5)) +
        0.5 * math.log(2 * 0.5 / (1.0 / 3 + 0.5))
    assert(got(("A", "B")) === ((2L, r6(0.5 * core))))
    assert(got(("A", "D")) === ((2L, 0.0)), "identical distributions: JSD 0")
    assert(!got.contains(("A", "C")) && !got.contains(("B", "C")),
      "a vocabulary-disjoint pair has no row (JSD = ln 2 by definition)")
    // divergences live in [0, ln 2]
    got.values.foreach { case (_, d) =>
      assert(d >= 0.0 && d <= math.log(2.0) + 1e-9, d.toString)
    }
  }

  test("argument guards are loud") {
    val uni = NgramLm.unigramCounts(train, "text")
    val bi = NgramLm.bigramCounts(train, "text")
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      NgramLm.stupidBackoffNll(docs, "doc_id", "text", uni, bi, 0L)
    }
    intercept[IllegalArgumentException] {
      NgramLm.stupidBackoffNll(docs, "doc_id", "text", uni, bi, 6L, alpha = 0.0)
    }
  }

  test("sourceJsDivergence refuses a non-dimension-sized source column") {
    // the shared-word self-join fans out sources²/2 per shared word — a
    // source column that is secretly a document id must fail loudly, not
    // quadratically
    val docs = Seq(("A", "x y"), ("B", "x y"), ("C", "x z"))
      .toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      NgramLm.sourceJsDivergence(docs, "source", "text", maxSources = 2)
    }
    assert(e.getMessage.contains("distinct sources"), e.getMessage)
    // at the default bound the same frame passes
    assert(NgramLm.sourceJsDivergence(docs, "source", "text").count() === 3L)
  }
}
