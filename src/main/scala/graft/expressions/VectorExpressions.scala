package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector arithmetic over `array<float|double>` columns.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every element evaluation crosses an interpreted lambda
  * boundary, which makes pairwise similarity (n² pairs × dim elements)
  * orders of magnitude slower than a fused loop. These expressions compile
  * to a single tight Java loop inside whole-stage codegen.
  *
  * Accumulation is left-to-right in element order, bit-identical to the
  * `aggregate(zip_with(...))` formulation they replace, so oracle parity is
  * unaffected. That includes element nulls: a null element inside either
  * array nulls the whole result (`zip_with` would propagate it through the
  * aggregate), rather than silently reading 0.0.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = {
    def elemNullable(dt: DataType) = dt match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
    left.nullable || right.nullable ||
      elemNullable(left.dataType) || elemNullable(right.dataType)
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(FloatType, DoubleType).contains(lt) && Seq(FloatType, DoubleType).contains(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  protected def leftElem: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType = right.dataType.asInstanceOf[ArrayType].elementType

  protected def get(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  protected def getterJava(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** Dot product; length = min(|a|, |b|). */
case class FloatVecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += get(leftElem, x, i) * get(rightElem, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += ${getterJava(leftElem, a, i)} * ${getterJava(rightElem, b, i)};
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity in one fused pass (dot + both norms); 0.0 when either
  * norm is zero. Matches `dot/(norm*norm)` with independent per-sum
  * left-to-right accumulation. */
case class FloatVecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = get(leftElem, x, i)
      val yv = get(rightElem, y, i)
      d += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else d / nn
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nn = ctx.freshName("nn")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xv = ${getterJava(leftElem, a, i)};
         |  double $yv = ${getterJava(rightElem, b, i)};
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $nn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if (!${ev.isNull}) { ${ev.value} = ($nn == 0.0) ? 0.0 : $d / $nn; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-element z-score with embedded (μ, σ) constants and HALF_UP decimal
  * rounding — one fused codegen loop replacing the CodegenFallback
  * `transform(vec, (x, i) -> round((x − μᵢ)/σᵢ, r))` formulation, with
  * IDENTICAL semantics: rounding is `java.math.BigDecimal.valueOf(x)
  * .setScale(r, HALF_UP)` exactly as Spark's `round` does it; a null
  * element stays a null element; an element beyond the stats arrays
  * yields null (the `element_at` out-of-range behavior). */
case class VecZScore(child: Expression, mus: Array[Double],
    sds: Array[Double], roundTo: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(mus.length == sds.length, "mus/sds must be same length")

  override def prettyName: String = "vec_zscore"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if Seq(FloatType, DoubleType).contains(t) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $other")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && i < mus.length) {
        val x = elemType match {
          case FloatType => arr.getFloat(i).toDouble
          case _ => arr.getDouble(i)
        }
        out(i) = VecZScore.zround((x - mus(i)) / sds(i), roundTo)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val musRef = ctx.addReferenceObj("zscoreMus", mus, "double[]")
      val sdsRef = ctx.addReferenceObj("zscoreSds", sds, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val getter = elemType match {
        case FloatType => s"(double)$a.getFloat($i)"
        case _ => s"$a.getDouble($i)"
      }
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $i < $musRef.length) {
         |    $out[$i] = graft.expressions.VecZScore.zround(
         |      ($getter - $musRef[$i]) / $sdsRef[$i], $roundTo);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecZScore =
    copy(child = newChild)
}

object VecZScore {
  /** Spark `round(double, s)` semantics exactly: shortest-decimal
    * BigDecimal, HALF_UP. Public because generated code calls it. */
  def zround(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** Euclidean (L2) distance, fused. */
case class FloatVecL2(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val dd = get(leftElem, x, i) - get(rightElem, y, i)
      s += dd * dd
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("dd")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $dd = ${getterJava(leftElem, a, i)} - ${getterJava(rightElem, b, i)};
         |  $s += $dd * $dd;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Canonical IEEE-754 bit encoding of a float/double vector as one hex
  * string — the integrity-manifest leaf primitive for embedding lakes
  * ([[graft.io.IntegrityManifest.embeddingManifest]]): each element emits
  * its EXACT bit pattern (`Float.floatToIntBits` — NaNs canonicalize to
  * the single quiet-NaN pattern, so equal-by-bits means equal-for-
  * training) as a FIXED-WIDTH zero-padded hex field (8 chars per float,
  * 16 per double; a null element emits the same-width non-hex sentinel
  * `n…n`), making the encoding injective: two different vectors can
  * never produce the same string, and the string never depends on
  * decimal formatting. Fused codegen loop — a relational
  * `transform(vec, x -> lpad(hex(…)))` has no float→bits primitive to
  * call and would cross an interpreted lambda per element. */
case class FloatVecBitsHex(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "vec_bits_hex"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if Seq(FloatType, DoubleType).contains(t) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    FloatVecBitsHex.encode(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.FloatVecBitsHex.encode($a, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): FloatVecBitsHex =
    copy(child = newChild)
}

object FloatVecBitsHex {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Public because generated code calls it. */
  def encode(arr: ArrayData, isFloat: Boolean)
      : org.apache.spark.unsafe.types.UTF8String = {
    val n = arr.numElements()
    val width = if (isFloat) 8 else 16
    val out = new Array[Byte](n * width)
    var i = 0
    while (i < n) {
      val base = i * width
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < width) { out(base + j) = 'n'; j += 1 }
      } else {
        val bits: Long =
          if (isFloat) java.lang.Float.floatToIntBits(arr.getFloat(i)) & 0xFFFFFFFFL
          else java.lang.Double.doubleToLongBits(arr.getDouble(i))
        var j = 0
        while (j < width) {
          out(base + j) =
            HexDigits(((bits >>> ((width - 1 - j) * 4)) & 0xF).toInt).toByte
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
}
