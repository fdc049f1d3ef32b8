package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A ranked byte-pair-encoding merge table (the standard `merges.txt`
  * contract: one "left right" pair per line, earlier line = lower rank =
  * higher merge priority).
  *
  * Construction validates SYMBOL CAUSALITY: each side of merge j must be a
  * single code point or the output of a merge with rank < j — exactly the
  * invariant a real BPE trainer produces (a pair can only be learned
  * between symbols that already exist). Causality is what makes the two
  * canonical application algorithms agree:
  *
  *  - iterative min-rank (HuggingFace-style: repeatedly merge the
  *    lowest-ranked adjacent pair present) — what [[encodeWord]] runs;
  *  - rank-order sweep (apply each merge everywhere, in rank order) — what
  *    a SQL engine can replay as a chain of `replace()` calls, and what
  *    the q_text_bpe DuckDB oracle does.
  *
  * Merging two adjacent symbols only ever creates adjacencies that involve
  * the NEW symbol, and under causality every pair containing that symbol
  * has a LATER rank — so a later merge can never resurrect an occurrence
  * of an earlier-ranked pair, and the two algorithms produce identical
  * token streams (property-pinned in BpeSpec against an independent sweep
  * implementation).
  */
final case class BpeMerges(pairs: IndexedSeq[(String, String)])
    extends Serializable {
  require(pairs.nonEmpty, "BPE merge table must not be empty")
  pairs.foreach { case (l, r) =>
    require(l.nonEmpty && r.nonEmpty, s"empty merge side in ($l, $r)")
    require(!l.exists(_.isWhitespace) && !r.exists(_.isWhitespace),
      s"merge sides must not contain whitespace: ($l, $r)")
  }
  // symbol causality: each side must be a single code point or an earlier
  // merge's output
  locally {
    val seen = collection.mutable.Set.empty[String]
    pairs.zipWithIndex.foreach { case ((l, r), i) =>
      def ok(s: String) = s.codePointCount(0, s.length) == 1 || seen.contains(s)
      require(ok(l) && ok(r),
        s"merge $i ($l, $r) references a symbol produced by no earlier merge " +
          "— the table violates BPE symbol causality")
      seen += l + r
    }
  }

  /** rank by pair; the encoder's only lookup */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    pairs.zipWithIndex.foreach { case ((l, r), i) =>
      // sides are whitespace-free by construction, so a space is a
      // collision-free pair-key separator
      m.put(l + " " + r, i)
    }
    m
  }

  private def rankOf(l: String, r: String): Int = {
    val v = rank.get(l + " " + r)
    if (v == null) Int.MaxValue else v.intValue()
  }

  /** Canonical greedy BPE over one whitespace-free word: repeatedly merge
    * the lowest-ranked adjacent pair (leftmost-first among equal
    * occurrences) until no ranked pair remains. Starts from code points. */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = new collection.mutable.ArrayBuffer[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms += word.substring(ci, ci + n)
      ci += n
    }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val rk = rankOf(syms(i), syms(i + 1))
        if (rk < bestRank) bestRank = rk
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = pairs(bestRank)
        val out = new collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r
            j += 2 // leftmost-first, non-overlapping
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out
      }
    }
    syms.toArray
  }

  /** Row entry point for the codegen'd expression: tokenize `text` on
    * ASCII whitespace runs (empty words dropped — the `\s+` split
    * convention), BPE-encode each word, concatenate the token streams.
    * ASCII whitespace bytes cannot occur inside a UTF-8 multibyte
    * sequence, so the byte scan is character-safe. */
  def encodeRow(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new collection.mutable.ArrayBuffer[UTF8String](s.length / 4 + 1)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || isAsciiSpace(s.charAt(i))) {
        if (i > start) {
          val toks = encodeWord(s.substring(start, i))
          var k = 0
          while (k < toks.length) {
            out += UTF8String.fromString(toks(k)); k += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** The CLOSED-VOCABULARY symbol set this table can emit: every single
    * code point appearing in a merge side plus every merge output —
    * exactly `Bpe.vocabOf`'s membership, as a set for the fallback test. */
  @transient lazy val knownSymbols: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String](pairs.length * 4)
    pairs.foreach { case (l, r) =>
      val w = l + r
      var ci = 0
      while (ci < w.length) {
        val n = Character.charCount(w.codePointAt(ci))
        set.add(w.substring(ci, ci + n))
        ci += n
      }
      set.add(w)
    }
    set
  }

  /** BYTE-FALLBACK row entry point — the GPT-2-class zero-unk contract:
    * every symbol the greedy encoder leaves OUTSIDE the closed vocabulary
    * decomposes into its UTF-8 bytes, one `<0xAB>` token per byte (the
    * SentencePiece byte-fallback rendering), and the ASCII whitespace
    * separators the plain tokenizer DROPS are emitted as byte tokens too
    * (space = `<0x20>` …) — so `decodeIds(tokenIds(text))` reproduces ANY
    * input byte-for-byte, whitespace runs included, with id 0 (<unk>)
    * unreachable. Same one-pass zero-shuffle posture as [[encodeRow]]. */
  def encodeRowFallback(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new collection.mutable.ArrayBuffer[UTF8String](s.length / 4 + 1)
    val known = knownSymbols
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || isAsciiSpace(s.charAt(i))) {
        if (i > start) {
          val toks = encodeWord(s.substring(start, i))
          var k = 0
          while (k < toks.length) {
            val t = toks(k)
            if (known.contains(t)) out += UTF8String.fromString(t)
            else {
              val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              var bi = 0
              while (bi < bytes.length) {
                out += BpeMerges.byteSymbolU(bytes(bi) & 0xFF); bi += 1
              }
            }
            k += 1
          }
        }
        // the separator itself: ASCII by isAsciiSpace, so one byte
        if (i < s.length) out += BpeMerges.byteSymbolU(s.charAt(i).toInt)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def isAsciiSpace(c: Char): Boolean = BpeMerges.isAsciiSpace(c)
}

object BpeMerges {
  /** The EXACT split set of [[BpeMerges.encodeRow]] (Java regex `\s`
    * without UNICODE_CHARACTER_CLASS). Callers building token-additivity
    * contracts (e.g. SftPrep's ChatTemplate) must test boundary chars
    * against THIS predicate, not `Char.isWhitespace` — U+2028/U+1680
    * etc. are Unicode whitespace but do NOT split a word here. */
  private[graft] def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B

  /** The 256 byte-fallback symbols in byte order — SentencePiece's
    * `<0xAB>` rendering (uppercase hex), appended after the closed
    * vocabulary by `Bpe.vocabOf(_, byteFallback = true)` so existing
    * symbol ids never move. */
  val ByteSymbols: IndexedSeq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")

  private val byteSymbolsU: Array[UTF8String] =
    ByteSymbols.map(UTF8String.fromString).toArray

  /** Interned UTF8String for byte `b` (0–255) — hot-path allocation-free. */
  def byteSymbolU(b: Int): UTF8String = byteSymbolsU(b)
}

/** `bpe_tokens(text)` — greedy BPE tokenization against a fixed merge
  * table, in ONE pass per row inside whole-stage codegen (the
  * `minhash_sigs` pattern: the generated code calls one audited JVM
  * method with the merge table attached as a codegen reference object —
  * no UDF, no CodegenFallback, no per-token row materialization, and no
  * shuffle: tokenization is a pure map over the corpus scan).
  *
  * Returns `array<string>`; `size(...)` of it is the real token count
  * that budgets/packing/chunking key on. Cross-engine replay: see
  * [[BpeMerges]] — the rank-order-sweep equivalence lets a SQL oracle
  * reproduce the exact token stream with nested `replace()` calls.
  *
  * With `byteFallback = true` the encoder runs
  * [[BpeMerges.encodeRowFallback]] instead: out-of-vocabulary symbols
  * decompose into `<0xAB>` byte tokens and whitespace separators are
  * kept as byte tokens — the zero-unk exact-round-trip mode.
  */
case class BpeTokens(child: Expression, merges: BpeMerges,
    byteFallback: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    if (byteFallback) merges.encodeRowFallback(input.asInstanceOf[UTF8String])
    else merges.encodeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges,
      classOf[BpeMerges].getName)
    val m = if (byteFallback) "encodeRowFallback" else "encodeRow"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.$m($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
