package graft.trainprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.TimeSeriesOps

/** Training-corpus preparation operators — the steps between "raw documents"
  * and "token stream ready for a trainer" that the LLM-pipeline extension
  * (SURVEY.md §7 step 8) needs beyond dedup/ANN: TF-IDF weighting,
  * deterministic sampling, PII redaction, and sequence packing.
  *
  * Cross-engine determinism rules (same as graft.queries.*): hashes are
  * sha256 hex (identical in DuckDB); token splits are single-space (matches
  * the oracle's `string_split(text, ' ')`); floats round before compare;
  * every ordering has a total-order key.
  */
object TrainPrep {

  /** Per-(doc, token) TF-IDF over a corpus.
    *
    * tf = occurrences of token in doc; df = documents containing token;
    * idf = ln((N + 1) / (df + 1)) (smoothed, non-negative);
    * weight = tf * idf.
    *
    * Shape: explode → two hash-aggregations (map-side partials apply) → one
    * equi-join on token. The token-dimension table (distinct tokens) is
    * vocabulary-sized, orders of magnitude under the corpus — Spark's AQE
    * picks a broadcast join for it at realistic vocabularies; at 100 TB the
    * join key is the token string, never doc bodies, so shuffle volume is
    * bounded by (docs × distinct-tokens-per-doc), the same as the MinHash
    * signature pass. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // N as a broadcast 1-row frame keeps the whole thing one LAZY plan (no
    // eager driver action at definition time). The N branch is still a
    // second scan of the corpus in the plan; at real scale persist `docs`
    // (or supply N from table metadata) before calling.
    val nDf = docs.agg(countDistinct(col(idCol)).as("__n"))
    val tok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    val tf = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(df, "token").crossJoin(broadcast(nDf))
      .withColumn("idf", log((col("__n") + 1.0) / (col("df") + 1.0)))
      .withColumn("tfidf", col("tf") * col("idf"))
      .drop("__n")
  }

  /** Deterministic hash sample: keep a row iff the first `hexDigits` hex
    * chars of sha256(key) sort strictly below `threshold`. Rate ≈
    * threshold/16^hexDigits; reproducible on any engine with sha256 and on
    * any cluster layout (no RNG, no partition sensitivity — unlike
    * `df.sample`, which depends on partitioning). Pure filter: pushes down
    * past projections, no shuffle.
    *
    * `threshold` is lowercased here because sha2 emits lowercase hex — an
    * uppercase "A0" would otherwise sort below every digest and silently
    * select ~0 rows. Non-hex thresholds are rejected loudly. */
  def hashSampleFilter(key: Column, threshold: String): Column = {
    val thr = normalizeHexThreshold(threshold)
    substring(sha2(key.cast("string"), 256), 1, thr.length) < lit(thr)
  }

  private def normalizeHexThreshold(threshold: String): String = {
    val thr = threshold.toLowerCase
    require(thr.nonEmpty && thr.forall(c => c.isDigit || (c >= 'a' && c <= 'f')),
      s"hash-sample threshold must be non-empty hex, got '$threshold'")
    thr
  }

  /** Stratified deterministic sample: per-stratum hex thresholds (2 hex
    * digits → rate granularity 1/256). Strata absent from `rates` are
    * dropped. Still a pure filter — the CASE is codegen'd per row.
    * Thresholds are lowercased/validated like [[hashSampleFilter]]'s. */
  def stratifiedSampleFilter(key: Column, stratum: Column,
      rates: Seq[(String, String)]): Column = {
    val prefix = substring(sha2(key.cast("string"), 256), 1, 2)
    rates.foldLeft(lit(false)) { case (acc, (s, thr)) =>
      acc || (stratum === lit(s) && prefix < lit(normalizeHexThreshold(thr)))
    }
  }

  /** PII redaction: mask email addresses and NNN-NNNN phone numbers.
    * Patterns are deliberately RE2-compatible (no backrefs/lookaround) so
    * the same regex means the same thing in Java (Spark) and RE2 (DuckDB —
    * whose oracle needs the 'g' flag to match Spark's replace-all). */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{4}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Concat-then-chunk sequence packing: lay documents end-to-end in a
    * deterministic order and cut the token stream every `budgetTokens` —
    * exactly the packing GPT-style pretraining uses (documents may span a
    * chunk boundary; `chunk_id`/`chunk_end_id` name the chunks a doc
    * touches).
    *
    * The token-offset prefix sum is `TimeSeriesOps.scanCumSumLong` — the
    * distributed two-pass range-partition scan, NOT a single-partition
    * global window, so packing a 100 TB corpus parallelizes: pass 1 is
    * per-partition, pass 2 scans one row per partition. Token counts are
    * longs → integer addition re-associates exactly → offsets are
    * bit-identical to a sequential scan regardless of partitioning. */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    // NULL text packs as a zero-token doc (tokenCount(NULL) is NULL, which
    // would otherwise null out the whole chunk assignment chain)
    val withTok = docs.select(col(idCol),
      coalesce(TextFunctions.tokenCount(col(textCol)), lit(0L)).as("n_tokens"))
    val cum = TimeSeriesOps.scanCumSumLong(withTok, Seq(idCol), "n_tokens", "cum_tokens")
    cum
      .withColumn("start_offset", col("cum_tokens") - col("n_tokens"))
      .withColumn("chunk_id", floor(col("start_offset") / budgetTokens))
      // a zero-token doc spans no tokens: its "last token" clamps to its
      // start offset so chunk_end_id == chunk_id (never -1 / never below
      // chunk_id when the offset sits exactly on a budget boundary)
      .withColumn("chunk_end_id",
        floor(greatest(col("cum_tokens") - 1, col("start_offset")) / budgetTokens))
      .select(idCol, "n_tokens", "start_offset", "chunk_id", "chunk_end_id")
  }
}
