package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** minhashSignatureRowwise projects the signature array into mh0..mhN via
  * N getItems over the same MinHashSigs call — whole-stage codegen's
  * subexpression elimination must collapse those to ONE evaluation per row
  * (the generated code contains exactly one hashing loop). If this breaks
  * (e.g. the projection stops being codegen-eligible), signing silently
  * becomes N× as expensive. */
class MinHashCseSpec extends SparkSpec {
  test("rowwise minhash signature is computed once per row, not once per column") {
    val docs = spark.range(4).select(col("id").as("doc_id"),
      concat(lit("w x y z "), col("id").cast("string")).as("text"))
    val plan = graft.dedup.Dedup.minhashSignatureRowwise(docs, "doc_id", "text", 4)
    val code = org.apache.spark.sql.execution.debug.codegenString(plan.queryExecution.executedPlan)
    val n = "hashUnsafeBytes".r.findAllIn(code).length
    assert(n == 1, s"expected one generated hashing loop, found $n")
  }
}
