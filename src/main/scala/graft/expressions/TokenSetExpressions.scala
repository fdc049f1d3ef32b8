package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token SET as a sorted array of xxhash64 values:
  * `sorted_token_hashes(text)` = sort(distinct(xxhash64(token))) over the
  * whitespace tokens of `text` — the rowwise form of
  *
  *   explode(array_distinct(split(text, " "))) → xxhash64(tok)
  *
  * (set-equal modulo xxhash64 collisions between two distinct tokens of the
  * SAME document, ~t²/2⁶⁵ per doc — negligible). Like [[MinHashSigs]] this
  * is ONE pass over the string bytes inside whole-stage codegen: no explode,
  * no per-token rows, no shuffle. Pairwise token-overlap verification
  * (near-dup Jaccard) then becomes an equi-join carrying one array per side
  * plus an in-row [[SortedLongIntersectCount]] — replacing the
  * candidate×token row fan-out (the widest shuffle of the LSH pipeline)
  * with a candidate-sized one.
  *
  * Token parity with `split(text, " ")` limit -1 (same as [[MinHashSigs]]):
  * consecutive spaces yield empty tokens, the empty string yields one empty
  * token; a space byte (0x20) cannot occur inside a UTF-8 multibyte
  * sequence, so the byte scan is character-safe. Hash parity with Spark's
  * `xxhash64(tok)`: hashUnsafeBytes with the default seed 42.
  */
case class SortedTokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    new GenericArrayData(SortedTokenHashes.tokenHashSet(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SortedTokenHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = new $gad($helper.tokenHashSet($s));")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedTokenHashes =
    copy(child = newChild)
}

object SortedTokenHashes {
  /** Sorted distinct xxhash64(seed 42) values of the whitespace tokens —
    * shared by interpreted eval and codegen (the per-doc sort/dedup loop
    * gains nothing from inlining into generated Java). */
  def tokenHashSet(s: UTF8String): Array[Long] = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // one hash per token (empties included), then sort + dedup in place
    var nTokens = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) nTokens += 1
      i += 1
    }
    val hashes = new Array[Long](nTokens)
    var t = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        hashes(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        t += 1
        start = i + 1
      }
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var w = 0
    i = 1
    while (i < nTokens) {
      if (hashes(i) != hashes(w)) { w += 1; hashes(w) = hashes(i) }
      i += 1
    }
    if (w + 1 == nTokens) hashes else java.util.Arrays.copyOf(hashes, w + 1)
  }
}

/** `sorted_long_intersect_count(a, b)`: the number of elements common to
  * two SORTED DISTINCT long arrays (e.g. two [[SortedTokenHashes]] sets) —
  * a primitive two-pointer merge, O(|a|+|b|) with zero allocation, inside
  * whole-stage codegen. With `size(a)`/`size(b)` it yields exact set
  * Jaccard without ever exploding the sets into rows. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |${ev.value} = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}
