package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{BpeMerges, BpeTokens}

/** Real byte-pair-encoding tokenization (upgrade of the `bpeishTokens`
  * lexer regex): a vocab/merges-driven greedy BPE, the thing production
  * pipelines actually budget tokens with. Three pieces:
  *
  *  - [[tokens]] / [[tokenCount]]: encode against a [[BpeMerges]] table
  *    with the codegen'd [[graft.expressions.BpeTokens]] expression — a
  *    pure map over the corpus scan, no shuffle, no UDF;
  *  - [[loadMerges]] / [[defaultMerges]]: the standard `merges.txt`
  *    contract (one "left right" pair per line, rank = line order;
  *    `#`-comments and blanks skipped). The committed default table was
  *    trained by [[train]] on the driver's document fixture;
  *  - [[train]]: the classic Sennrich BPE trainer, Spark-shaped. BPE
  *    training operates on the WORD-FREQUENCY DICTIONARY, not the corpus
  *    stream — so the distributed part is one word-count aggregate
  *    (map-side combined, shuffle is vocabulary-bound, the dsir_select
  *    shape), optionally capped to the `maxVocabWords` most frequent
  *    words (count-desc, word-asc — deterministic), and the merge loop
  *    runs on the driver over that bounded dictionary. At 100 TB the
  *    corpus contributes one aggregation pass; the O(numMerges × vocab)
  *    loop never touches executors.
  *
  * Reference: Sennrich, Haddow, Birch — "Neural Machine Translation of
  * Rare Words with Subword Units" (ACL 2016), the merges.txt lineage.
  */
object Bpe {

  /** Parse a merges table: one "left right" pair per line, earlier line =
    * higher priority; blank lines and `#` comments skipped. Validates BPE
    * symbol causality (see [[BpeMerges]]). */
  def loadMerges(lines: Iterator[String]): BpeMerges = {
    val pairs = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2,
          s"merges line must be 'left right', got: '$l'")
        (parts(0), parts(1))
      }.toIndexedSeq
    BpeMerges(pairs)
  }

  def loadMergesFile(path: String): BpeMerges = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try loadMerges(src.getLines()) finally src.close()
  }

  /** The committed default table (classpath resource), trained with
    * [[train]] on the driver's sf0.1 document fixture at a 60-merge
    * budget (the 31-word synthetic vocabulary saturates — every word one
    * symbol — at 89, so the budget sits below saturation to keep subword
    * splitting real). */
  lazy val defaultMerges: BpeMerges = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bpe_merges.txt resource missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadMerges(src.getLines()) finally src.close()
  }

  /** BPE token stream of `text` (split on whitespace runs, each word
    * greedily merged). Codegen'd one-pass expression — zero shuffle.
    * `byteFallback = true` switches to the zero-unk mode: symbols outside
    * the closed vocabulary decompose into `<0xAB>` byte tokens
    * (SentencePiece rendering) and whitespace separators are KEPT as
    * byte tokens, so the stream is lossless — see
    * [[graft.expressions.BpeMerges.encodeRowFallback]]. */
  def tokens(text: Column, merges: BpeMerges = defaultMerges,
      byteFallback: Boolean = false): Column =
    org.apache.spark.sql.GraftBridge.column(BpeTokens(
      org.apache.spark.sql.GraftBridge.expression(text), merges, byteFallback))

  /** Real token count for budget/packing/chunking call sites. */
  def tokenCount(text: Column, merges: BpeMerges = defaultMerges): Column =
    size(tokens(text, merges)).cast("long")

  /** Tokenizer-fit FERTILITY: BPE tokens per whitespace word — the
    * standard tokenizer-evaluation metric (≈1 on in-vocabulary prose,
    * rising on domains the merge table never saw). Zero words → explicit
    * 0.0. Pure map, like everything else here. */
  def fertility(text: Column, merges: BpeMerges = defaultMerges): Column = {
    val words = size(filter(split(text, "\\s+", -1),
      w => length(w) > 0)).cast("long")
    when(words === 0, lit(0.0))
      .otherwise(round(tokenCount(text, merges).cast("double") / words, 6))
  }

  /** The CLOSED VOCABULARY a merge table induces, in a deterministic
    * order: the distinct single code points appearing in merge sides
    * (sorted), then each merge's output in rank order. Id 0 is reserved
    * for <unk> (a token outside the table — BPE without byte-fallback);
    * real ids start at 1. The (symbol → id) contract both engines can
    * rebuild from the same literal table.
    *
    * With `byteFallback = true` the 256 `<0xAB>` byte symbols are
    * APPENDED after the closed vocabulary (byte b = id size+1+b), so
    * every closed-vocabulary id is identical in both modes and existing
    * packed-id artifacts never shift; under fallback id 0 is
    * unreachable. */
  def vocabOf(merges: BpeMerges, byteFallback: Boolean = false): IndexedSeq[String] = {
    val chars = merges.pairs.flatMap { case (l, r) =>
      (l + r).codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }.distinct.sorted
    val outs = merges.pairs.map { case (l, r) => l + r }
    val base = (chars ++ outs).distinct.toIndexedSeq
    if (byteFallback) {
      // a merge output that equals a literal byte-symbol string (an
      // adversarial table containing e.g. "<0xAB>") would put the same
      // key in both vocabulary halves — duplicate map keys in
      // tokenIds/decodeIds (runtime DUPLICATED_MAP_KEY / ambiguous
      // decode). Refuse the table up front (ADVICE r13).
      val collide = base.toSet
        .intersect(graft.expressions.BpeMerges.ByteSymbols.toSet)
      require(collide.isEmpty,
        s"closed vocabulary collides with byte-fallback symbols: " +
          s"${collide.toSeq.sorted.take(5).mkString(", ")} — this merge " +
          "table cannot be used with byteFallback = true")
      base ++ graft.expressions.BpeMerges.ByteSymbols
    } else base
  }

  /** Token IDS under the table's closed vocabulary — the array a trainer
    * actually consumes: `transform` over the codegen'd token stream with
    * an `element_at` on a literal map (codegen'd; no join, no shuffle).
    * Out-of-vocabulary tokens map to 0 (<unk>); under
    * `byteFallback = true` the stream contains only vocab + byte symbols,
    * so 0 never appears. */
  def tokenIds(text: Column, merges: BpeMerges = defaultMerges,
      byteFallback: Boolean = false): Column = {
    val vocab = vocabOf(merges, byteFallback)
    val m = map(vocab.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(s), lit(i + 1))
    }: _*)
    transform(tokens(text, merges, byteFallback),
      t => coalesce(element_at(m, t), lit(0)))
  }

  /** DECODE: token ids back to text — the inspection path every trainer
    * pairs with [[tokenIds]] (spot-reading packed sequences, debugging
    * masks). Inverse literal map (id → symbol), unknown/\<unk\> ids
    * rendered as `unkMarker`; `array_join` concatenation. Round-trip
    * contract WITHOUT fallback: a single in-vocabulary word round-trips
    * EXACTLY (`decodeIds(tokenIds(w)) == w` whenever every token of `w`
    * is in the closed vocabulary); across a document the plain tokenizer
    * normalizes whitespace away, so the document contract is
    * `decodeIds(tokenIds(text)) == regexp_replace(text, "\\s+", "")` for
    * unk-free text.
    *
    * With `byteFallback = true` the contract is TOTAL:
    * `decodeIds(tokenIds(text, m, true), m, byteFallback = true) == text`
    * for ANY input
    * — whitespace, emoji, CJK, control bytes — because the encoder emits
    * lossless byte tokens for everything outside the closed vocabulary
    * (whitespace separators included) and the decoder reassembles
    * through bytes: every symbol maps to the HEX of its UTF-8 bytes
    * (byte symbols to their one byte), the concatenation `unhex`es to
    * binary and decodes as UTF-8 — multi-byte sequences split across
    * byte tokens fuse back correctly, which a per-token string decode
    * could never do. Pure codegen'd builtins (`transform`/`element_at`/
    * `unhex`/`decode`) — zero shuffle, same posture as [[tokenIds]]. */
  def decodeIds(ids: Column, merges: BpeMerges = defaultMerges,
      unkMarker: String = "�", byteFallback: Boolean = false): Column =
    if (!byteFallback) {
      val vocab = vocabOf(merges)
      val m = map(vocab.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit(i + 1), lit(s))
      }: _*)
      array_join(
        transform(ids, i => coalesce(element_at(m, i), lit(unkMarker))), "")
    } else {
      def hexOf(s: String): String =
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => f"${b & 0xFF}%02X").mkString
      val base = vocabOf(merges)
      val entries =
        base.zipWithIndex.map { case (s, i) => (i + 1) -> hexOf(s) } ++
          (0 until 256).map(b => (base.size + 1 + b) -> f"$b%02X")
      val m = map(entries.flatMap { case (i, h) => Seq(lit(i), lit(h)) }: _*)
      decode(unhex(array_join(
        transform(ids, i => coalesce(element_at(m, i), lit(hexOf(unkMarker)))),
        "")), "UTF-8")
    }

  /** Train a merge table on a corpus column. Distributed word-frequency
    * aggregate + driver-side Sennrich merge loop over the bounded
    * dictionary (see object doc). Deterministic: pair selection breaks
    * frequency ties lexicographically; the vocab cap breaks count ties by
    * word. Stops early when no adjacent pair occurs twice. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 100000): BpeMerges = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val freqs: Array[(String, Long)] = df
      .select(explode(split(col(textCol), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // driver loop over the dictionary: words as symbol arrays
    var words: Array[(Array[String], Long)] = freqs.map { case (w, c) =>
      val syms = collection.mutable.ArrayBuffer.empty[String]
      var ci = 0
      while (ci < w.length) {
        val n = Character.charCount(w.codePointAt(ci))
        syms += w.substring(ci, ci + n)
        ci += n
      }
      (syms.toArray, c)
    }
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2).toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case None => done = true
        case Some(((l, r), _)) =>
          merges += ((l, r))
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                  out += l + r; j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.toArray, c)
            }
          }
      }
    }
    BpeMerges(merges.toIndexedSeq)
  }

  /** Render a table in merges.txt format (the inverse of [[loadMerges]]). */
  def renderMerges(m: BpeMerges): String =
    m.pairs.map { case (l, r) => s"$l $r" }.mkString("", "\n", "\n")
}
