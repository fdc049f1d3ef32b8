package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-pass span_hashes expression must be bit-identical to the
  * relational HOF formulation it replaces (xxhash64 of each w-token
  * window re-joined on spaces), under both interpreted eval and codegen —
  * including the empty-token edge cases where the byte-range shortcut
  * could silently diverge from concat_ws. */
class SpanHashesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f"),
    (2L, "a b  c d e"),          // double space → empty token mid-window
    (3L, " a b c d"),            // leading space → empty first token
    (4L, "a b c d "),            // trailing space → empty last token
    (5L, "a b"),                 // fewer tokens than the window → NULL
    (6L, ""),                    // one empty token → NULL at w=3
    (7L, "exactly three tokens") // nTokens == w → one span
  ).toDF("doc_id", "text")

  private val W = 3

  private def relational(w: Int) = {
    val toks = split(col("text"), " ")
    docs.select(col("doc_id"),
      when(size(toks) >= w,
        transform(sequence(lit(0), size(toks) - w),
          i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(w))))))
        .as("spans"))
  }

  private def rowwise(w: Int) =
    docs.select(col("doc_id"),
      org.apache.spark.sql.GraftBridge.column(SpanHashes(
        org.apache.spark.sql.GraftBridge.expression(col("text")), w)).as("spans"))

  test("span_hashes == HOF xxhash64(concat_ws(slice)) formulation (bit parity)") {
    for (w <- Seq(1, 2, 3, 5)) {
      val rel = relational(w).orderBy("doc_id").collect()
        .map(r => Option(r.getSeq[Long](1)))
      val row = rowwise(w).orderBy("doc_id").collect()
        .map(r => Option(r.getSeq[Long](1)))
      assert(row.toSeq == rel.toSeq, s"window $w")
    }
  }

  test("interpreted eval matches codegen") {
    val viaCodegen = rowwise(W).orderBy("doc_id").collect()
      .map(r => Option(r.getSeq[Long](1)).map(_.toSeq))
    val viaEval = docs.orderBy("doc_id").collect().map { r =>
      Option(SpanHashes(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))), W)
        .eval(null))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
          .toLongArray().toSeq)
    }
    assert(viaCodegen.toSeq == viaEval.toSeq)
  }

  test("null text yields null spans") {
    val d = Seq((1L, Option("a b c")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val out = d.select(org.apache.spark.sql.GraftBridge.column(SpanHashes(
        org.apache.spark.sql.GraftBridge.expression(col("text")), 2)).as("s"))
      .orderBy(lit(1)).collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }
}
