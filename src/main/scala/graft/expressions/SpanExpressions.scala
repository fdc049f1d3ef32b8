package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row sliding-window span hashes: `span_hashes(text, w)` = for each
  * w-token window of the whitespace-tokenized text, `xxhash64` of the
  * window re-joined on single spaces — bit-identical to
  *
  *   transform(sequence(0, n-w), i ->
  *     xxhash64(concat_ws(" ", slice(split(text, " "), i+1, w))))
  *
  * but computed in ONE pass over the string bytes inside whole-stage
  * codegen. The higher-order formulation evaluates its lambda interpreted
  * (HOFs are CodegenFallback) and re-materializes every window as a fresh
  * string — measured 42 s for 100 k replicated docs at sf0.1 where this
  * expression needs ~2 s. The trick making one-pass possible: tokens come
  * from splitting on a SINGLE space, so a window re-joined on single
  * spaces is exactly the original text's byte range from its first
  * token's start to its last token's end (empty tokens from consecutive
  * spaces reproduce those spaces under concat_ws, preserving equality).
  * A space byte (0x20) cannot occur inside a UTF-8 multibyte sequence,
  * so the byte scan is character-safe. NULL when the text has fewer than
  * `windowTokens` tokens (the relational form's `when` guard).
  *
  * Seed parity: Spark's single-argument `xxhash64(col)` is
  * `hashUnsafeBytes(bytes, 42L)`.
  */
case class SpanHashes(child: Expression, windowTokens: Int)
    extends UnaryExpression {

  require(windowTokens > 0, "span_hashes needs windowTokens > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "span_hashes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // pass 1: token count = spaces + 1
    var spaces = 0
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val nTokens = spaces + 1
    if (nTokens < windowTokens) return null
    // pass 2: token start offsets; token j ends at starts(j+1)-1 (or n)
    val starts = new Array[Int](nTokens)
    var t = 1
    i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nSpans = nTokens - windowTokens + 1
    val hashes = new Array[Long](nSpans)
    var p = 0
    while (p < nSpans) {
      val from = starts(p)
      val last = p + windowTokens - 1
      val until = if (last + 1 < nTokens) starts(last + 1) - 1 else n
      hashes(p) = XXH64.hashUnsafeBytes(base, off + from, until - from, 42L)
      p += 1
    }
    new GenericArrayData(hashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, s => {
      val nb = ctx.freshName("nb")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val spaces = ctx.freshName("spaces")
      val i = ctx.freshName("i")
      val nTokens = ctx.freshName("nTokens")
      val starts = ctx.freshName("starts")
      val t = ctx.freshName("t")
      val nSpans = ctx.freshName("nSpans")
      val hashes = ctx.freshName("hashes")
      val p = ctx.freshName("p")
      val from = ctx.freshName("from")
      val last = ctx.freshName("last")
      val until = ctx.freshName("until")
      s"""
         |int $nb = $s.numBytes();
         |Object $base = $s.getBaseObject();
         |long $off = $s.getBaseOffset();
         |int $spaces = 0;
         |for (int $i = 0; $i < $nb; $i++) {
         |  if ($s.getByte($i) == 0x20) $spaces++;
         |}
         |int $nTokens = $spaces + 1;
         |if ($nTokens < $windowTokens) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $starts = new int[$nTokens];
         |  int $t = 1;
         |  for (int $i = 0; $i < $nb; $i++) {
         |    if ($s.getByte($i) == 0x20) { $starts[$t] = $i + 1; $t++; }
         |  }
         |  int $nSpans = $nTokens - $windowTokens + 1;
         |  long[] $hashes = new long[$nSpans];
         |  for (int $p = 0; $p < $nSpans; $p++) {
         |    int $from = $starts[$p];
         |    int $last = $p + $windowTokens - 1;
         |    int $until = ($last + 1 < $nTokens) ? $starts[$last + 1] - 1 : $nb;
         |    $hashes[$p] = $xxh.hashUnsafeBytes($base, $off + $from, $until - $from, 42L);
         |  }
         |  ${ev.value} = new $gad($hashes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

/** Per-row character n-grams: `char_ngrams(text, n)` = every n-CODEPOINT
  * substring, in order — bit-identical to
  *
  *   transform(sequence(1, length(text) - (n-1)), i -> substr(text, i, n))
  *
  * but one pass over the string bytes inside whole-stage codegen. The
  * relational form calls `substr(i, n)` per position, and UTF8String's
  * codepoint-indexed substring re-scans from byte 0 each call — O(chars²)
  * per document; this expression records codepoint start offsets once and
  * slices byte ranges. Each n-gram is COPIED out (never a view into the
  * input buffer — unsafe-row buffers are reused across rows). NULL when
  * the text has fewer than `n` codepoints (explode of NULL drops the row,
  * matching the relational guard). */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "char_ngrams needs n > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // a codepoint starts at every byte that is not a UTF-8 continuation
    var chars = 0
    var i = 0
    while (i < nb) {
      if ((s.getByte(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    if (chars < n) return null
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      if ((s.getByte(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = nb
    val out = new Array[AnyRef](chars - n + 1)
    var p = 0
    while (p < out.length) {
      val from = starts(p)
      val len = starts(p + n) - from
      val bytes = new Array[Byte](len)
      org.apache.spark.unsafe.Platform.copyMemory(base, off + from,
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      out(p) = UTF8String.fromBytes(bytes)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val utf8 = classOf[UTF8String].getName
    val platform = "org.apache.spark.unsafe.Platform"
    nullSafeCodeGen(ctx, ev, s => {
      val nb = ctx.freshName("nb")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val chars = ctx.freshName("chars")
      val i = ctx.freshName("i")
      val starts = ctx.freshName("starts")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val from = ctx.freshName("from")
      val len = ctx.freshName("len")
      val bytes = ctx.freshName("bytes")
      s"""
         |int $nb = $s.numBytes();
         |Object $base = $s.getBaseObject();
         |long $off = $s.getBaseOffset();
         |int $chars = 0;
         |for (int $i = 0; $i < $nb; $i++) {
         |  if (($s.getByte($i) & 0xC0) != 0x80) $chars++;
         |}
         |if ($chars < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $starts = new int[$chars + 1];
         |  int $c = 0;
         |  for (int $i = 0; $i < $nb; $i++) {
         |    if (($s.getByte($i) & 0xC0) != 0x80) { $starts[$c] = $i; $c++; }
         |  }
         |  $starts[$chars] = $nb;
         |  Object[] $out = new Object[$chars - $n + 1];
         |  for (int $p = 0; $p < $out.length; $p++) {
         |    int $from = $starts[$p];
         |    int $len = $starts[$p + $n] - $from;
         |    byte[] $bytes = new byte[$len];
         |    $platform.copyMemory($base, $off + $from, $bytes, $platform.BYTE_ARRAY_OFFSET, $len);
         |    $out[$p] = $utf8.fromBytes($bytes);
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03 — the MOSS scheme) in ONE codegen pass:
  * `winnow_hashes(text, k, w)` = the sorted distinct minima of every
  * `w`-wide window over the xxhash64 values of the text's k-CODEPOINT
  * grams. Value-set-identical to the relational form
  *
  *   array_sort(array_distinct(transform(sequence(0, m-w), i ->
  *     array_min(slice(hashes, i+1, w)))))        // hashes over char_ngrams
  *
  * (window minima are selected by VALUE, so the paper's tie rule is
  * irrelevant to the set) but O(n) per doc via a monotonic deque instead
  * of the HOF form's O(n·w) window re-materialization — and the k-gram
  * hashes come straight off the codepoint byte ranges with no substring
  * copies. Fewer than `w` windows selects the global minimum (the
  * relational `when(m <= w, ...)` guard); fewer than `k` codepoints is
  * NULL (char_ngrams convention). Hash parity: Spark's `xxhash64(gram)`
  * = hashUnsafeBytes(bytes, seed 42), signed-long comparison both
  * places. */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, s"winnow_hashes needs k > 0 and w > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = WinnowHashes.winnow(input.asInstanceOf[UTF8String], k, w)
    if (arr == null) null else new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WinnowHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    val arr = ctx.freshName("arr")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |long[] $arr = $helper.winnow($s, $k, $w);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new $gad($arr); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashes {
  /** Selection loop shared by interpreted eval and codegen (the per-doc
    * deque gains nothing from inlining into generated Java). Returns null
    * when the text has fewer than `k` codepoints. */
  def winnow(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // codepoint starts: every byte that is not a UTF-8 continuation
    var chars = 0
    var i = 0
    while (i < nb) {
      if ((s.getByte(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    if (chars < k) return null
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      if ((s.getByte(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = nb
    val m = chars - k + 1
    val hashes = new Array[Long](m)
    var p = 0
    while (p < m) {
      val from = starts(p)
      hashes(p) = XXH64.hashUnsafeBytes(base, off + from,
        starts(p + k) - from, 42L)
      p += 1
    }
    val sel = new Array[Long](if (m <= w) 1 else m - w + 1)
    var nSel = 0
    if (m <= w) {
      var mn = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) < mn) mn = hashes(i); i += 1 }
      sel(0) = mn
      nSel = 1
    } else {
      // monotonic deque of candidate indices: increasing hash values,
      // head = current window minimum
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < m) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
        dq(tail) = i
        tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) { sel(nSel) = hashes(dq(head)); nSel += 1 }
        i += 1
      }
    }
    val out = java.util.Arrays.copyOf(sel, nSel)
    java.util.Arrays.sort(out)
    var wr = 0
    i = 1
    while (i < nSel) {
      if (out(i) != out(wr)) { wr += 1; out(wr) = out(i) }
      i += 1
    }
    if (wr + 1 == nSel) out else java.util.Arrays.copyOf(out, wr + 1)
  }
}
