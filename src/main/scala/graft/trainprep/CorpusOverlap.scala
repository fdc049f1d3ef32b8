package graft.trainprep

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.expressions.MinHashSketchAgg

/** Corpus-slice overlap estimation: how much vocabulary do two slices of a
  * corpus (source vs source, shard vs shard, training corpus vs an
  * incoming batch) share? The production path sketches each slice with the
  * mergeable [[MinHashSketchAgg]] group aggregate — one fixed-size buffer
  * per slice, no token explode, no pairwise doc work — and compares
  * sketches; slices are few, so the pairwise stage is over GROUPS, never
  * over rows. The md5 variant and the exact variant exist to be
  * cross-engine replayable (both DuckDB-oracled).
  *
  * Reference scope note: the reference engine has no corpus-analysis
  * surface; this extends the LLM-pipeline inventory (SURVEY §2.11). */
object CorpusOverlap {

  /** Group-level MinHash sketch column (xxhash64 family — the fast path).
    * See [[MinHashSketchAgg]] for the scale shape and hash-family parity
    * with `minhash_sigs`. */
  def minhashSketch(text: Column, numHashes: Int): Column =
    GraftBridge.column(
      MinHashSketchAgg(GraftBridge.expression(text), numHashes)
        .toAggregateExpression())

  /** Jaccard estimate between two sketches: the fraction of equal
    * components. Tiny per-pair arithmetic over group rows — the
    * CodegenFallback HOF cost is irrelevant off the hot path. */
  def sketchJaccard(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), b => b)).cast("double") /
      size(a)

  /** Pairwise slice overlap from per-slice sketches — the production
    * shape: ONE pass over the corpus (map-side-combined fixed buffers),
    * then a self-join over the handful of slice rows. Returns
    * (slice_a, slice_b, jaccard_est) for slice_a < slice_b. */
  def sliceOverlapSketched(docs: DataFrame, sliceCol: String,
      textCol: String, numHashes: Int = 64): DataFrame = {
    val sk = docs.groupBy(col(sliceCol))
      .agg(minhashSketch(col(textCol), numHashes).as("__sk"))
    sk.as("a").join(sk.as("b"),
        col(s"a.$sliceCol") < col(s"b.$sliceCol"))
      .select(
        col(s"a.$sliceCol").as("slice_a"),
        col(s"b.$sliceCol").as("slice_b"),
        round(sketchJaccard(col("a.__sk"), col("b.__sk")), 6).as("jaccard_est"))
  }

  /** md5-family sketch overlap — identical estimator, built entirely from
    * engine-portable primitives (`min(md5(tok || '#k'))` per seed), so a
    * SQL oracle replays it bit for bit. numHashes seeds become numHashes
    * aggregate columns; the token explode this needs is exactly what
    * [[MinHashSketchAgg]] exists to avoid at scale. */
  def sliceOverlapMd5(docs: DataFrame, sliceCol: String, textCol: String,
      numHashes: Int = 4): DataFrame = {
    val tok = docs.select(col(sliceCol),
      explode(split(col(textCol), " ", -1)).as("__t"))
    val mins = (0 until numHashes).map(k =>
      min(md5(concat(col("__t"), lit(s"#$k")))).as(s"__m$k"))
    val sk = tok.groupBy(col(sliceCol)).agg(mins.head, mins.tail: _*)
    val eq = (0 until numHashes).map(k =>
      when(col(s"a.__m$k") === col(s"b.__m$k"), 1).otherwise(0))
      .reduce(_ + _)
    sk.as("a").join(sk.as("b"),
        col(s"a.$sliceCol") < col(s"b.$sliceCol"))
      .select(
        col(s"a.$sliceCol").as("slice_a"),
        col(s"b.$sliceCol").as("slice_b"),
        round(eq.cast("double") / numHashes, 6).as("jaccard_est"))
  }

  /** EXACT pairwise slice Jaccard over distinct token vocabularies:
    * |A ∩ B| via an equi-join on the token (never a cross join — a token
    * only meets its equal), |A ∪ B| = |A| + |B| − |A ∩ B|. At 100 TB the
    * join key would be xxhash64(token) (8-byte keys); the raw-token join
    * here keeps the DuckDB oracle byte-exact. Slices missing from the
    * output share no tokens at all. */
  def sliceOverlapExact(docs: DataFrame, sliceCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(sliceCol),
      explode(split(col(textCol), " ", -1)).as("__t")).distinct()
    val sizes = tok.groupBy(col(sliceCol)).agg(count(lit(1)).as("__n"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.__t") === col("b.__t") &&
          col(s"a.$sliceCol") < col(s"b.$sliceCol"))
      .groupBy(col(s"a.$sliceCol").as("slice_a"),
        col(s"b.$sliceCol").as("slice_b"))
      .agg(count(lit(1)).as("__ni"))
    inter
      .join(sizes.withColumnRenamed(sliceCol, "slice_a")
        .withColumnRenamed("__n", "__na"), "slice_a")
      .join(sizes.withColumnRenamed(sliceCol, "slice_b")
        .withColumnRenamed("__n", "__nb"), "slice_b")
      .select(col("slice_a"), col("slice_b"),
        round(col("__ni").cast("double") /
          (col("__na") + col("__nb") - col("__ni")), 6).as("jaccard"))
  }

  /** Portable deterministic HyperLogLog distinct-token estimate per group
    * (Flajolet, Fusy, Gandouet, Meunier, AofA 2007): the 100 TB answer to
    * exact `COUNT(DISTINCT token)`, whose distinct pre-aggregation must
    * shuffle every distinct token. Here the shuffle carries at most
    * groups × 256 (bucket, max-rank) rows regardless of corpus size:
    * register = md5-derived, so DuckDB replays the sketch BIT FOR BIT —
    * bucket is the first 2 hex digits (m = 256), rank = leading zero bits
    * of the next 60 bits + 1, extracted with exact string/integer ops (no
    * float log2 whose rounding could differ across engines). Estimator:
    * raw = α·m²/Σ 2^-M (empty registers contribute 2⁰), with the standard
    * small-range linear-counting correction when raw ≤ 2.5·m and empty
    * registers exist. Standard error ≈ 1.04/√m ≈ 6.5 % at m = 256 —
    * SketchSpec pins the realized fixture error. Rounded at 4: the final
    * double is a few arithmetic ops over a Σ of ≤256 powers of two, so
    * cross-engine addition order sits far below 1e-4. */
  def hllDistinctTokens(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    hllEstimate(hllRegisters(docs, groupCol, textCol), groupCol)

  /** The REGISTER stage of [[hllDistinctTokens]]: per-(group, bucket)
    * max-rank rows (≤ groups×256 however big the corpus). Split out so the
    * streaming parity path can run it as the single stateful aggregation
    * of a stream (complete mode — register state is exactly the mergeable
    * sketch) and finish with [[hllEstimate]] as a batch over the sink. */
  private[graft] def hllRegisters(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val h = md5(col("__t"))
    val sub = substring(h, 3, 15) // 60 bits after the 8-bit bucket
    val stripped = regexp_replace(sub, "^0+", "")
    val bitsOfFirst = // bit length of the first non-zero hex digit
      when(substring(stripped, 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 4)
        .when(substring(stripped, 1, 1).isin("4", "5", "6", "7"), 3)
        .when(substring(stripped, 1, 1).isin("2", "3"), 2)
        .otherwise(1)
    val rank = when(length(stripped) === 0, lit(61))
      .otherwise((lit(15) - length(stripped)) * 4 + (lit(4) - bitsOfFirst) + 1)
    docs
      .select(col(groupCol), explode(split(col(textCol), " ", -1)).as("__t"))
      .select(col(groupCol), substring(h, 1, 2).as("__bucket"), rank.as("__rank"))
      .groupBy(col(groupCol), col("__bucket"))
      .agg(max("__rank").as("__m"))
  }

  /** The ESTIMATOR finish of [[hllDistinctTokens]] over a register frame. */
  private[graft] def hllEstimate(regs: DataFrame, groupCol: String): DataFrame = {
    val m = 256
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("__m"))).as("__s"),
        count(lit(1)).as("__nb"))
      .select(col(groupCol), (lit(m) - col("__nb")).as("__zeros"),
        (lit(alpha * m * m) / (col("__s") + (lit(m) - col("__nb")))).as("__raw"))
      .select(col(groupCol),
        round(when(col("__raw") <= 2.5 * m && col("__zeros") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros")))
          .otherwise(col("__raw")), 4).as("n_distinct_est"))
  }

  /** Portable deterministic count-min sketch of token frequencies (Cormode
    * & Muthukrishnan 2005) — the frequency member of the sketch family
    * next to MinHash (similarity) and HLL (distinct): `depth` independent
    * md5-derived hash rows over 256 buckets each, so the WHOLE corpus
    * compresses to ≤ depth×256 counter rows (that is the entire shuffle,
    * after map-side combine) and DuckDB replays it exactly. Estimates
    * never underestimate; collisions only inflate, by ≤ corpus/256 per
    * row whp, and taking the min over `depth` rows drives the inflation
    * probability down exponentially. */
  def cmsTokenCounts(docs: DataFrame, textCol: String,
      depth: Int = 4): DataFrame = {
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        substring(md5(concat(col("__t"), lit(s"#$r"))), 1, 2).as("b"))
    }
    docs.select(explode(split(col(textCol), " ", -1)).as("__t"))
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.r").as("row"), col("rb.b").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Production-hash twin of [[cmsTokenCounts]] (same split as MinHash's
    * `oracleHash`/`fastHash`): xxhash64 cells instead of md5 — measured
    * ~7× faster to build (the md5 path is hash-bound at 4 digests per
    * token) — for pipelines where no external engine needs to replay the
    * sketch. Same width/depth/estimator; pair with
    * [[cmsEstimateFast]]. */
  def cmsTokenCountsFast(docs: DataFrame, textCol: String,
      depth: Int = 4): DataFrame = {
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("r"), pmod(xxhash64(lit(r), col("__t")), lit(256L)).as("b"))
    }
    docs.select(explode(split(col(textCol), " ", -1)).as("__t"))
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.r").as("row"), col("rb.b").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[cmsEstimate]] against a [[cmsTokenCountsFast]] sketch (same
    * empty-cell-is-zero left-join semantics). */
  def cmsEstimateFast(cms: DataFrame, tokens: DataFrame, tokenCol: String,
      depth: Int = 4): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("row"),
        pmod(xxhash64(lit(r), col(tokenCol)), lit(256L)).as("bucket"))
    }
    tokens.select(col(tokenCol), explode(array(cells: _*)).as("rb"))
      .select(col(tokenCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cnt_est"))
  }

  /** Frequency estimates for a token set from a [[cmsTokenCounts]] sketch:
    * each query token joins its `depth` (row, bucket) cells against the
    * BROADCAST sketch (≤ depth×256 rows however big the corpus was) and
    * takes the min. One broadcast join + a query-set-sized aggregate —
    * the corpus itself is never touched again. */
  def cmsEstimate(cms: DataFrame, tokens: DataFrame, tokenCol: String,
      depth: Int = 4): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("row"),
        substring(md5(concat(col(tokenCol), lit(s"#$r"))), 1, 2).as("bucket"))
    }
    // LEFT join + coalesce 0: a cell with no counter row means count 0 —
    // an inner join would drop it and min over only the nonzero cells,
    // inflating (or losing) estimates for tokens the corpus never saw
    tokens.select(col(tokenCol), explode(array(cells: _*)).as("rb"))
      .select(col(tokenCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cnt_est"))
  }

  /** Token-distribution drift between two corpus slices: KL(P_a ∥ P_b)
    * in nats with add-one smoothing over the UNION vocabulary — the
    * corpus-monitoring number that says "this crawl's language has
    * shifted from the training distribution" before a model does.
    * Smoothed p_i = (count_a(i)+1)/(n_a+V) (so tokens absent from one
    * side contribute finitely), KL = Σ p_i ln(p_i/q_i). Returns one row
    * (vocab, n_a, n_b, kl_nats).
    *
    * Scale shape: two token hash-aggregates (map-side combined), one
    * vocab-sized full-outer join on the token, totals as one tiny
    * aggregate broadcast back over the vocab frame — the corpus itself
    * is scanned once per side and never shuffled beyond (token, count)
    * rows. */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame) =
      df.select(explode(split(col(textCol), " ", -1)).as("__t"))
        .groupBy("__t").agg(count(lit(1)).as("c"))
    val joined = counts(a).withColumnRenamed("c", "ca")
      .join(counts(b).withColumnRenamed("c", "cb"), Seq("__t"), "full_outer")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .persist()
    graft.multimodal.Multimodal.unpersistAfterFirstUse(joined)
    val totals = joined.agg(sum("ca").as("na"), sum("cb").as("nb"),
      count(lit(1)).as("v"))
    val p = (col("ca") + 1.0) / (col("na") + col("v"))
    val q = (col("cb") + 1.0) / (col("nb") + col("v"))
    joined.crossJoin(broadcast(totals))
      .groupBy(col("v").as("vocab"), col("na").as("n_a"), col("nb").as("n_b"))
      .agg(round(sum(p * log(p / q)), 4).as("kl_nats"))
  }

  /** EXACT heavy hitters (tokens with true count ≥ `minCount`) with a
    * sketch-pruned shuffle — the two-pass pattern that makes exact
    * frequency mining 100 TB-viable. Pass 1 builds the xxhash64 CMS
    * ([[cmsTokenCountsFast]], ≤ depth×256 counters — driver-bounded BY
    * CONSTRUCTION, so the collect here is a codebook fetch, not a data
    * read). Pass 2 re-scans the corpus and estimates every token's count
    * IN-ROW against the broadcast-literal counter table (depth
    * element_at lookups + least — no join, no distinct), shuffling ONLY
    * tokens whose estimate clears the bar. CMS never underestimates, so
    * the pruned set is a SUPERSET of the true heavy hitters and the
    * final exact groupBy + HAVING returns exactly the brute-force
    * answer: the sketch changes the shuffle volume (vocabulary-sized →
    * candidates-sized), never the result. Two corpus scans total —
    * persist `docs` upstream to make them one I/O pass. */
  /** Per-group top-k tokens — the slice-level monitoring twin of global
    * heavy hitters (E65): per-language/source vocabularies drift
    * independently, and a global top-k hides a slice whose crawl went bad.
    * Shape: explode feeds ONE map-side-combined (group, token) hash
    * aggregate — the shuffle carries distinct (group, token) counts, never
    * corpus text — then a rank window partitioned BY GROUP (each group's
    * rank sorts within one task) cuts at k with a total order (count desc,
    * token asc). For vocabulary-dominated workloads swap the exact count
    * frame for the per-group CMS shortlist (the E65 prune composes). */
  def topTokensPerGroup(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"top-k size must be positive, got $k")
    val counts = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def heavyHittersExact(docs: DataFrame, textCol: String, minCount: Long,
      depth: Int = 4): DataFrame = {
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val table = Array.fill(depth)(Array.fill(256)(0L))
    cmsTokenCountsFast(docs, textCol, depth).collect().foreach { r =>
      table(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
    }
    val est = (0 until depth).map { r =>
      element_at(typedLit(table(r).toSeq),
        (pmod(xxhash64(lit(r), col("__t")), lit(256L)) + 1L).cast("int"))
    }.reduce(least(_, _))
    docs.select(explode(split(col(textCol), " ", -1)).as("__t"))
      .filter(est >= minCount)
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("__t").as("token"), col("cnt"))
  }

  /** Deterministic bottom-k (KMV) uniform sample: the k rows whose
    * `md5(id)` hashes are globally smallest (Bar-Yossef et al. 2002's
    * k-minimum-values sketch, used as a corpus sample). md5 over the
    * UNIQUE id is a fixed random permutation of the corpus, so the
    * bottom k of it is a uniform sample that is (a) identical on every
    * run and every engine — DuckDB replays it with ORDER BY md5 LIMIT k —
    * and (b) MERGEABLE: bottom-k of a union is the bottom-k of each
    * side's bottom-k, so shards sample independently and a coordinator
    * merges. The quantile member of the sketch family (MinHash =
    * similarity E43, HLL = distinct E58, CMS = frequency E59):
    * an exact quantile over the sample estimates the corpus quantile
    * with error O(1/√k) regardless of corpus size.
    *
    * Scale shape: `orderBy(h).limit(k)` plans as TakeOrderedAndProject —
    * each partition forwards at most its local bottom-k, the exchange
    * carries ≤ k·partitions (hash, metric) rows and the text never
    * moves. Keep the metric columns you need in `df` before calling;
    * the sample is row-count-bounded, so downstream exact quantiles /
    * means over it are driver-cheap at any corpus size. */
  def bottomKSample(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    df.withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy("__h").limit(k)
  }

  /** Per-GROUP KMV sample + exact rank quantiles — the grouped form of
    * [[bottomKSample]]+[[kmvQuantiles]] (per-source length profiles,
    * per-lang quality spreads): within each group, the k rows with the
    * smallest md5(id) are the deterministic uniform sample, and each
    * requested q maps to the value at 1-based rank ⌈q·n⌉ of that sample.
    * Returns one row per group: (group, n, p<label>...).
    *
    * Scale shape: the shuffle carries slim (group, hash, metric) triples
    * once; the per-group sort is the cost — at extreme group sizes,
    * pre-filter with a per-group hash threshold (hashSampleFilter) to
    * cut rows before the window. Sample truncation and ranking replay
    * exactly in any engine with row_number. */
  def groupQuantiles(df: DataFrame, groupCol: String, idCol: String,
      metricCol: String, k: Int, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"sample size k must be positive, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val sampled = df
      .select(col(groupCol), col(metricCol),
        md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__rs", row_number().over(
        Window.partitionBy(groupCol).orderBy("__h")))
      .filter(col("__rs") <= k)
    val ranked = sampled
      .withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col(metricCol), col("__h"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = qs.map { q =>
      val label = (q * 100).round.toString
      max(when(col("__rn") === ceil(lit(q) * col("__n")),
        col(metricCol))).as(s"p$label")
    }
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Exact rank-based quantiles OVER a [[bottomKSample]]: for each q in
    * `qs`, the value of `metricCol` at 1-based rank ⌈q·n⌉ of the sample
    * (the inverted-CDF definition — no interpolation, so the result is a
    * value the data actually contains and every engine agrees bit for
    * bit; DuckDB replays it with row_number). Returns one row:
    * (n, q_<label>...). The window sort is over the k-row sample only —
    * bounded work, never corpus-shaped. */
  def kmvQuantiles(sample: DataFrame, metricCol: String,
      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val ranked = sample
      .withColumn("__rn", row_number().over(
        Window.orderBy(col(metricCol), col("__h"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    val aggs = qs.map { q =>
      val label = (q * 100).round.toString
      max(when(col("__rn") === ceil(lit(q) * col("__n")),
        col(metricCol))).as(s"p$label")
    }
    ranked.agg(count(lit(1)).as("n"), aggs: _*)
  }
}
