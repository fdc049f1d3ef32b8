package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(xxhash64(key))` over a BROADCAST Bloom filter —
  * the membership probe of the Bloom-prefiltered anti-join.
  *
  * Why not Spark's own `BloomFilterMightContain`: that expression requires
  * the serialized filter as a FOLDABLE child, i.e. an in-plan Binary
  * literal — at the operator's documented scale (1 B keys ≈ 1.2 GB) the
  * byte array would ride the plan tree into every branch that references
  * it, bloat driver plan memory, and stringify in every explain()/plan
  * audit. Here the filter stays a broadcast variable (torrent-shipped
  * once per executor, a few bytes in the plan); the generated code probes
  * `broadcast.value()` directly, so the filter is deserialized once per
  * executor instead of once per codegen'd stage. Codegen'd (no
  * CodegenFallback, no UDF); `eval` mirrors it for interpreted paths.
  */
case class BloomMightContain(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName probes 64-bit hashes, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bf.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBroadcast", bf,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((${classOf[BloomFilter].getName}) $ref.value())" +
        s".mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
