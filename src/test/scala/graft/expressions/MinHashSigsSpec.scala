package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** The zero-shuffle per-row MinHash expression must be bit-identical to
  * the relational explode+agg formulation it replaces (fastHash =
  * xxhash64(i, tok)), under both interpreted eval and codegen. */
class MinHashSigsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick  brown fox"), // double space → empty token
    (3L, " leading and trailing "),
    (4L, ""), // empty doc → one empty token
    (5L, "single"),
    (6L, "the quick brown fox") // exact dup of 1 → identical signature
  ).toDF("doc_id", "text")

  private val N = 6

  test("rowwise signature == explode+agg fastHash signature (bit parity)") {
    val rel = Dedup.minhashSignature(docs, "doc_id", "text", N, Dedup.fastHash)
      .orderBy("doc_id").collect().map(r => (0 until N).map(i => r.getLong(i + 1)))
    val row = Dedup.minhashSignatureRowwise(docs, "doc_id", "text", N)
      .orderBy("doc_id").collect().map(r => (0 until N).map(i => r.getLong(i + 1)))
    assert(row.toSeq == rel.toSeq)
    // exact dup docs share signatures under any hash family
    assert(row(0) == row(5))
  }

  test("interpreted eval matches codegen") {
    val withSig = docs.select(col("doc_id"),
      org.apache.spark.sql.GraftBridge.column(MinHashSigs(
        org.apache.spark.sql.GraftBridge.expression(col("text")), N)).as("sig"))
    val viaCodegen = withSig.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val viaEval = docs.orderBy("doc_id").collect().map { r =>
      MinHashSigs(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))), N)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray().toSeq
    }
    assert(viaCodegen.map(_.toSeq).toSeq == viaEval.toSeq)
  }

  test("null text yields null signature") {
    val d = Seq((1L, Option("a b")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val out = Dedup.minhashSignatureRowwise(d, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
  }

  test("SQL registration resolves minhash_sigs") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    val n = spark.sql("SELECT minhash_sigs(text, 4) AS s FROM mh_docs")
      .selectExpr("size(s)").as[Int].collect()
    assert(n.forall(_ == 4))
  }

  test("null-text docs survive the collapse fan-out as keeper-of-self singletons") {
    val d = Seq((1L, Option("a b")), (2L, Option.empty[String]),
      (3L, Option.empty[String]), (4L, Option("a b"))).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.nearDupKeepers(d, "doc_id", "text", 4, 2, 0.6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "every input doc must be emitted")
    assert(out(2L) == 2L && out(3L) == 3L, "null texts never merge")
    assert(out(4L) == 1L, "exact dups still collapse")
    // same contract through the ROWWISE path: a null text gets a null
    // signature there, which must not put all null docs in one LSH bucket
    val row = graft.dedup.Dedup.nearDupKeepersRowwise(d, "doc_id", "text", 4, 2, 0.6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(row == out, "rowwise path must preserve the null-text contract")
  }

  test("keepers via rowwise signatures match keepers via explode+agg") {
    val dup = docs.unionByName(
      docs.filter(col("doc_id") <= 2).withColumn("doc_id", col("doc_id") + 100))
    val a = Dedup.nearDupKeepers(dup, "doc_id", "text", 4, 2, 0.6, Dedup.fastHash)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.nearDupKeepersFromSigs(dup,
        Dedup.minhashSignatureRowwise(dup, "doc_id", "text", 4),
        "doc_id", "text", 4, 2, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
