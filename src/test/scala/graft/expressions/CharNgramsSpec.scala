package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-pass char_ngrams expression must be bit-identical to the
  * relational `transform(sequence, i -> substr(text, i, n))` formulation
  * it replaces — including multibyte UTF-8 (codepoint slicing, not byte
  * slicing), empty and too-short inputs, and under both interpreted eval
  * and whole-stage codegen. */
class CharNgramsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "abcdef"),
    (2L, "ab"),              // fewer codepoints than n=3 → NULL
    (3L, ""),                // empty → NULL
    (4L, "日本語のテキスト"),  // 3-byte codepoints: slicing must be per char
    (5L, "a日b本c"),          // mixed 1- and 3-byte codepoints
    (6L, "abc"),             // exactly n → one n-gram
    (7L, "naïve café")       // 2-byte codepoints + space
  ).toDF("doc_id", "text")

  private def relational(n: Int) =
    docs.select(col("doc_id"),
      when(length(col("text")) >= n,
        transform(sequence(lit(1), length(col("text")) - (n - 1)),
          i => col("text").substr(i, lit(n)))).as("grams"))

  private def rowwise(n: Int) =
    docs.select(col("doc_id"),
      org.apache.spark.sql.GraftBridge.column(CharNgrams(
        org.apache.spark.sql.GraftBridge.expression(col("text")), n)).as("grams"))

  test("char_ngrams == transform(substr) formulation incl. multibyte UTF-8") {
    for (n <- Seq(1, 2, 3, 5)) {
      val rel = relational(n).orderBy("doc_id").collect()
        .map(r => Option(r.getSeq[String](1)))
      val row = rowwise(n).orderBy("doc_id").collect()
        .map(r => Option(r.getSeq[String](1)))
      assert(row.toSeq == rel.toSeq, s"n=$n")
    }
  }

  test("char_ngrams agrees between interpreted eval and codegen") {
    // interpreted: force the expression through a filter on a literal-built
    // row where codegen is bypassed via eval()
    val e = CharNgrams(
      org.apache.spark.sql.catalyst.expressions.Literal("a日b"), 2)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val strs = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
    assert(strs == Seq("a日", "日b"))
    // short and empty inputs are NULL, not empty arrays
    assert(CharNgrams(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 2).eval(null) == null)
    assert(CharNgrams(
      org.apache.spark.sql.catalyst.expressions.Literal(""), 1).eval(null) == null)
    // the SQL registration resolves and computes the same thing
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT char_ngrams('abcd', 3) AS g")
      .head().getSeq[String](0)
    assert(viaSql == Seq("abc", "bcd"))
  }

  test("char_ngrams copies bytes out — values survive buffer reuse across rows") {
    // many rows through one whole-stage-codegen pipeline: if the expression
    // returned views into the (reused) unsafe row buffer, later rows would
    // corrupt earlier outputs collected here
    val many = spark.range(1000)
      .select(concat(lit("textbody"), col("id")).as("text"))
    val grams = many.select(org.apache.spark.sql.GraftBridge.column(CharNgrams(
        org.apache.spark.sql.GraftBridge.expression(col("text")), 4)).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(grams.forall(_.head == "text"), "first 4-gram of every row must be 'text'")
    assert(grams.exists(_.exists(_.contains("999"))))
  }
}
