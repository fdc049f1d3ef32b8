package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash signature: `minhash_sigs(text, n)` = for each seed
  * i ∈ [0, n), the minimum of `xxhash64(i, token)` over the whitespace
  * tokens of `text` — bit-identical to the relational formulation
  *
  *   explode(split(text, " ")) → groupBy(doc) → min(xxhash64(lit(i), tok))
  *
  * (Dedup.minhashSignature with Dedup.fastHash), but computed in ONE pass
  * over the string bytes inside whole-stage codegen: no explode, no
  * per-token row materialization, and — because a document's text lives in
  * a single row — NO SHUFFLE at all. At 100 TB the explode+agg form
  * shuffles a partial-agg row per document; this form is a pure map, so
  * MinHash signing never touches the network.
  *
  * Token parity details with `split(text, " ")` limit -1: consecutive
  * spaces yield empty tokens, leading/trailing spaces yield empty edge
  * tokens, and the empty string yields one empty token — all hashed, as the
  * column formulation hashes them. A space byte (0x20) cannot occur inside
  * a UTF-8 multibyte sequence, so the byte scan is character-safe.
  *
  * Seed parity: Spark's `xxhash64(lit(i), tok)` evaluates
  * `hashUnsafeBytes(tok, hashInt(i, 42))` — the per-i seeds are
  * precomputed once.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "minhash_sigs needs numHashes > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  // xxhash64(lit(i), tok) hashes the int literal first: seed_i = hashInt(i, 42)
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        var k = 0
        while (k < numHashes) {
          val hv = XXH64.hashUnsafeBytes(base, off + start, i - start, seeds(k))
          if (hv < mins(k)) mins(k) = hv
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, s => {
      val mins = ctx.freshName("mins")
      val nb = ctx.freshName("nb")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val hv = ctx.freshName("hv")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $nb = $s.numBytes();
         |Object $base = $s.getBaseObject();
         |long $off = $s.getBaseOffset();
         |int $start = 0;
         |for (int $i = 0; $i <= $nb; $i++) {
         |  if ($i == $nb || $s.getByte($i) == 0x20) {
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $hv = $xxh.hashUnsafeBytes($base, $off + $start, $i - $start, $seedsRef[$k]);
         |      if ($hv < $mins[$k]) $mins[$k] = $hv;
         |    }
         |    $start = $i + 1;
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
