package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct semantics checks for the text-quality helpers whose main gate is
  * the DuckDB oracle battery (q_text_*): here the REPETITION metrics must
  * actually separate boilerplate from varied text. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionMetrics: boilerplate scores low TTR / high top fraction") {
    val docs = Seq(
      (1L, "spam spam spam spam spam ham"),          // machine-repetitive
      (2L, "every word here is completely different") // varied prose
    ).toDF("doc_id", "text")
    val m = TextFunctions.repetitionMetrics(
        docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok")),
        "doc_id", "tok")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n1, d1, ttr1, top1) = m(1L)
    val (n2, d2, ttr2, top2) = m(2L)
    assert(n1 === 6L && d1 === 2L)
    assert(ttr1 < ttr2, "repetitive text must have the lower type-token ratio")
    assert(top1 > top2, "repetitive text must have the higher top-token fraction")
    assert(math.abs(top1 - 5.0 / 6.0) < 1e-6) // rounded to 6 places upstream
    assert(n2 === 6L && d2 === 6L && ttr2 === 1.0)
  }
}
