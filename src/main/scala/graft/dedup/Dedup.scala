package graft.dedup

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design:
  *  - exact dedup is a single hash-groupBy (map-side partial agg, one shuffle
  *    on the 32-byte digest, never on the document body);
  *  - MinHash/LSH turns the O(n²) near-dup problem into a band-bucket
  *    shuffle: only documents sharing a band hash ever meet;
  *  - pairwise verifiers (`ngramJaccardPairs`, `embeddingNearDupPairs`) are
  *    meant to run WITHIN candidate buckets, not across the full corpus —
  *    the full-cross-join form here is the correctness oracle for small n.
  */
object Dedup {

  /** Default mega-bucket cap for the production (`*Rowwise`) near-dup entry
    * points. A bucket of n DISTINCT texts sharing a band is n² verify
    * pairs; template-spam corpora produce 10⁵+-member buckets, and one
    * such bucket is a corpus²-shaped task. 10 000 caps the worst single
    * bucket at ~5·10⁷ in-row intersect pairs (seconds of one executor's
    * time) while sitting far above any bucket an organically-duplicated
    * corpus produces. Capped runs are loud: the drop count is observed
    * in-pass (`graft_oversize_buckets*` metric) and logged by a
    * session-level listener whenever it is non-zero. ONE caveat: when the
    * capped run leaves ZERO verified pairs corpus-wide, AQE's
    * empty-relation propagation prunes the metric node with the branch
    * and the observation completes empty (pinned in
    * ObservationPruningSpec) — wrap the consuming action in
    * [[withReliableOversizeAudit]] to make the count unconditional, or
    * cross-check with [[oversizeBuckets]]. Pass `Int.MaxValue` to uncap
    * explicitly. */
  val DefaultMaxBucketSize = 10000

  private val obsCounter = new AtomicLong(0)
  // weak keys: the set only memoizes "listener already registered" — it
  // must not pin stopped sessions for the JVM lifetime
  private val listenerInstalled =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private val AqeEmptyRule =
    "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"

  // per-session refcount for the audit scope: the LAST scope out removes
  // the exclusion (and only if the outermost scope added it) — weak keys
  // so stopped sessions are not pinned
  private final class AuditScope(var depth: Int, val added: Boolean)
  private val auditScopes =
    new java.util.WeakHashMap[SparkSession, AuditScope]()

  /** Runs `body` with `AQEPropagateEmptyRelation` excluded, so a capped
    * dedup's in-pass oversize audit survives even when the candidate
    * branch materializes empty (the all-spam worst case — exactly when
    * the audit matters most). Scopes on one session are REFCOUNTED: the
    * exclusion is added by the first scope in and removed by the last
    * scope out (never if the conf already carried it), so nested and
    * concurrent overlapping scopes compose. The rule only optimizes
    * branches that ARE empty, so excluding it costs nothing on the
    * workloads it is excluded for. */
  def withReliableOversizeAudit[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.optimizer.excludedRules"
    def rules(v: Option[String]): Seq[String] =
      v.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    auditScopes.synchronized {
      val s = auditScopes.get(spark)
      if (s != null) s.depth += 1
      else {
        val before = rules(spark.conf.getOption(key))
        val had = before.contains(AqeEmptyRule)
        if (!had)
          spark.conf.set(key, (before :+ AqeEmptyRule).mkString(","))
        auditScopes.put(spark, new AuditScope(1, !had))
      }
    }
    try body
    finally auditScopes.synchronized {
      val s = auditScopes.get(spark)
      s.depth -= 1
      if (s.depth == 0) {
        auditScopes.remove(spark)
        if (s.added) {
          val rest = rules(spark.conf.getOption(key))
            .filterNot(_ == AqeEmptyRule)
          if (rest.isEmpty) spark.conf.unset(key)
          else spark.conf.set(key, rest.mkString(","))
        }
      }
    }
  }

  /** One listener per session that turns any `graft_oversize*` observed
    * metric with a non-zero drop count into a WARN log — the "capped runs
    * are loud" half of the default-on guardrail. Covers both the
    * auto-named internal observes and caller-supplied [[Observation]]s
    * whose name starts with `graft_oversize`. When a query's plan carries
    * such an audit node but the executed plan reported no metric for it
    * (AQE pruned the branch — the zero-surviving-pairs worst case), it
    * warns about THAT instead, so even the pruned case is never silent. */
  private def ensureOversizeListener(spark: SparkSession): Unit =
    if (listenerInstalled.add(spark)) {
      val log = org.slf4j.LoggerFactory.getLogger(getClass)
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          // per-row try: one malformed metric row (e.g. a caller-supplied
          // graft_oversize-prefixed Observation with a different shape)
          // must not swallow a sibling's genuine drop WARN
          val metrics = qe.observedMetrics
          metrics.foreach { case (name, row) =>
            if (name.startsWith("graft_oversize")) try {
              if (row.getAs[Long]("dropped_buckets") > 0) {
                log.warn(
                  s"graft dedup mega-bucket cap dropped " +
                    s"${row.getAs[Long]("dropped_buckets")} LSH bucket(s) " +
                    s"covering ${row.getAs[Long]("dropped_members")} member(s) " +
                    s"(largest bucket ${row.getAs[Long]("max_bucket")}); a capped " +
                    "run UNDER-merges — inspect via Dedup.oversizeBuckets or " +
                    "raise maxBucketSize")
              }
            } catch { case scala.util.control.NonFatal(e) =>
              log.warn(s"graft oversize metric '$name' has an unexpected shape", e)
            }
          }
          try qe.logical.foreach {
            case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
                if c.name.startsWith("graft_oversize") &&
                  !metrics.contains(c.name) =>
              log.warn(
                s"graft dedup oversize audit '${c.name}' was pruned from the " +
                  "executed plan (AQE empty-relation propagation — zero " +
                  "verified pairs survived this query), so the drop count is " +
                  "UNAVAILABLE here; run the action under " +
                  "Dedup.withReliableOversizeAudit or count via " +
                  "Dedup.oversizeBuckets")
            case _ => ()
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }

  /** Text digest with a per-id sentinel for NULL texts: NULL texts must
    * never merge with each other (sha2(NULL) is NULL — a groupBy or
    * equi-join key would pool them), so each gets its own key. THE one
    * definition every dedup path keys on — the capped-run audit
    * (`oversizeBuckets` over `collapseReps`) relies on all paths banding
    * the identical population. */
  private def sentinelTextHash(idCol: String, textCol: String): Column =
    coalesce(sha2(col(textCol), 256),
      concat(lit("__null__"), col(idCol).cast("string")))

  /** Exact dedup (hash-groupBy): one keeper (min id) per distinct text.
    * Returns (text_hash, keeper_id, n_dups). NULL texts stay singletons
    * (per-id sentinel hash) — same contract as the near-dup collapse. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sentinelTextHash(idCol, textCol).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  // ---- FEED-MAINTAINED exact keepers (round 16, E175's dedup consumer) --

  /** The maintainable exact-dedup STATE: one row per live digest holding
    * the SORTED live member ids. [[keepersOf]] derives the [[exact]]
    * keeper view from it; [[maintainKeepers]] folds a change-feed slice
    * into it, so an incremental crawl consults a current keeper table
    * without re-hashing the corpus (E1 re-runs stop at 100 TB — the
    * expensive part of exact dedup is the full-text scan+sha256, and the
    * feed carries only commit-sized text). The member list is what makes
    * MIN maintainable under retraction: a deleted keeper RE-ELECTS from
    * the remaining ids of its digest (min alone folds forward but cannot
    * retract). Per-digest frames are duplicate-group-sized — small by
    * construction for exact content dups; the state table overall is one
    * (digest, ids) row per distinct text. */
  def keeperState(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sentinelTextHash(idCol, textCol).as("text_hash"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))

  /** The (text_hash, keeper_id, n_dups) view of a [[keeperState]] —
    * row-identical to [[exact]] over the same corpus (q_dedup_maintain
    * pins the equivalence through a merge+delete feed sequence). */
  def keepersOf(state: DataFrame): DataFrame =
    state.select(col("text_hash"),
      element_at(col("ids"), 1).as("keeper_id"),
      size(col("ids")).cast("long").as("n_dups"))

  /** Fold one change-feed slice (rows carrying the lake's columns plus
    * [[graft.io.LakeMerge.ChangeTypeCol]]) into a [[keeperState]]:
    * additions join their digest's member list, retractions (preimages,
    * deletes) leave it, a digest whose members all retract vanishes, and
    * a retracted keeper re-elects the next-smallest id — all set algebra
    * over per-digest frames, the feed (commit-sized) is the only thing
    * hashed or shuffled. An update whose text is UNCHANGED nets to zero
    * for its digest (preimage and postimage cancel per (digest, id)
    * BEFORE the set difference — order-insensitive). */
  def maintainKeepers(state: DataFrame, changes: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val net = changes.select(
        sentinelTextHash(idCol, textCol).as("text_hash"),
        col(idCol).as("__id"), graft.io.FeedMaintain.signExpr.as("__s"))
      .groupBy(col("text_hash"), col("__id"))
      .agg(sum(col("__s")).as("__net"))
      .filter(col("__net") =!= 0)
    val delta = net.groupBy(col("text_hash")).agg(
      sort_array(collect_list(when(col("__net") > 0, col("__id"))))
        .as("__adds"),
      collect_list(when(col("__net") < 0, col("__id"))).as("__rems"))
    val combined = when(col("ids").isNull, col("__adds"))
      .when(col("__adds").isNull, col("ids"))
      .otherwise(concat(col("ids"), col("__adds")))
    val afterRems = when(col("__rems").isNull, combined)
      .otherwise(array_except(combined, col("__rems")))
    state.join(delta, Seq("text_hash"), "full")
      .select(col("text_hash"), array_sort(afterRems).as("ids"))
      .filter(size(col("ids")) > 0)
  }

  /** Seed a STORED keeper state at `stateDir` from a snapshot, stamped
    * with the change-feed seq the snapshot already includes — the same
    * watermark contract as [[graft.io.FeedMaintain.seedAggregate]]. */
  def seedKeeperState(snapshot: DataFrame, stateDir: String,
      idCol: String, textCol: String, asOfSeq: Long = -1L): Unit =
    keeperState(snapshot, idCol, textCol)
      .withColumn("as_of_seq", lit(asOfSeq))
      .write.mode("errorifexists").parquet(stateDir)

  /** Read the stored keeper state (mid-replacement-safe). */
  def readKeeperState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = {
    val live = new org.apache.hadoop.fs.Path(stateDir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = graft.io.LakeMerge.resolveReplacedDir(fs, live)
    require(fs.exists(dir),
      s"no keeper state at $stateDir — seed it with seedKeeperState")
    spark.read.parquet(dir.toString)
  }

  /** Fold a delivered feed slice into the STORED keeper state at
    * `stateDir`, effectively once — the watermark/gap/atomic-swap
    * discipline is [[graft.io.FeedMaintain.foldInto]]'s, shared. */
  def foldKeeperStateInto(changes: DataFrame, stateDir: String,
      idCol: String, textCol: String): Unit =
    graft.io.FeedMaintain.foldStoredSlice(changes, stateDir,
      "seedKeeperState")((state, fresh) =>
      maintainKeepers(state, fresh, idCol, textCol))

  /** Source-provenance duplicate matrix — the curation question BEHIND
    * dedup counts: which source feeds duplicate content INTO which (is
    * "forum_mirror" a scrape of "forum"? does a crawl snapshot re-ingest
    * the books slice?). For every content digest present in ≥ 2 sources,
    * one (source_a, source_b) pair per unordered source pair, counting
    * shared digests and the total duplicate-document mass on each side —
    * the table that decides which source to DROP rather than dedup
    * piecemeal.
    *
    * Scale shape: one (digest, source) aggregate over the corpus scan
    * (map-side combined; carries per-cell doc counts), then a digest-
    * keyed self-join of THAT frame — posting-list sized: rows = distinct
    * (digest, source) cells, and the join only fans out where a digest
    * truly spans sources, so work tracks cross-source duplication, never
    * corpus². Output is source²-bounded. */
  def sourceOverlapMatrix(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val cells = df
      .groupBy(sentinelTextHash(idCol, textCol).as("__d"),
        col(sourceCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
    cells.as("a")
      .join(cells.as("b"),
        col("a.__d") === col("b.__d") && col("a.__s") < col("b.__s"))
      .groupBy(col("a.__s").as("source_a"), col("b.__s").as("source_b"))
      .agg(count(lit(1)).as("shared_digests"),
        sum(col("a.__n")).as("dup_docs_a"),
        sum(col("b.__n")).as("dup_docs_b"))
  }

  /** Bloom-prefiltered anti-join — incremental / cross-corpus exact dedup:
    * keep corpus rows whose `keyCol` does NOT appear in `ref`'s `refKeyCol`
    * (drop re-crawls already in the trained corpus, strip rows matching a
    * blocklist digest set, …). Result is EXACTLY the plain anti-join —
    * Bloom filters have no false negatives, and every maybe-positive is
    * re-checked by a real anti-join — so the operator oracle-verifies
    * against `NOT IN` while keeping the scale shape below.
    *
    * Scale shape: the reference side is aggregated into a driver-built
    * Bloom filter (`expectedItems`/`fpp` size it: 1 B keys at 1 % fpp ≈
    * 1.2 GB — ship-once-per-stage viable where the raw key set is not).
    * Bloom-negative rows — at 100 TB, almost all of them — pass as a
    * pure filter with NO shuffle and NO join; only the maybe-positive
    * sliver (true hits + fpp of the rest) enters the exact anti-join, so
    * the join's shuffle volume is `fpp`-bounded instead of corpus-sized.
    * The corpus is scanned twice (negative filter + positive branch);
    * persist upstream if the scan dominates.
    *
    * The membership probe is the codegen'd
    * [[graft.expressions.BloomMightContain]] over a BROADCAST filter: it
    * probes LONGS, so the filter is built over `xxhash64(key)` and the
    * probe hashes the corpus key identically; semantics are unchanged (a
    * Bloom prefilter only needs no-false-negatives, and the exact
    * anti-join re-checks every maybe-positive — the 64-bit pre-hash's
    * collisions fold into the fpp budget). This retired the last UDF in
    * the codebase: the probe now runs inside whole-stage codegen instead
    * of as a per-row Scala call, while the filter keeps the broadcast
    * ship-once property (Spark's own BloomFilterMightContain would embed
    * the ~GB serialized filter as an in-plan literal in BOTH filter
    * branches — plan bloat the round-12 review caught). NULL keys never
    * probe (explicit isNotNull conjunct) and land in the kept negatives,
    * exactly as before. */
  def bloomPrefilteredAnti(corpus: DataFrame, keyCol: String,
      ref: DataFrame, refKeyCol: String,
      expectedItems: Long, fpp: Double): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    import org.apache.spark.sql.GraftBridge
    // eager by nature (the filter must exist before the plan runs) — the
    // reference side is the bounded one, same contract as stat.bloomFilter
    val bf = ref.filter(col(refKeyCol).isNotNull)
      .select(xxhash64(col(refKeyCol)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    val maybe = GraftBridge.column(graft.expressions.BloomMightContain(
      GraftBridge.convertedExpression(xxhash64(col(keyCol))), bc)) &&
      col(keyCol).isNotNull
    val negatives = corpus.filter(!maybe)
    val positives = corpus.filter(maybe)
      .join(ref.select(col(refKeyCol).as(keyCol)).distinct(), Seq(keyCol), "left_anti")
    negatives.unionByName(positives)
  }

  /** MinHash signature over whitespace tokens: `numHashes` independent
    * min-of-hash values. Uses md5(token ⊕ seed) so any SQL engine can
    * reproduce it; swap `hashFn` for xxhash64 in throughput-critical paths.
    *
    * Shape: explode + hash-aggregate rather than a higher-order `transform`
    * — HOF lambdas evaluate interpreted (outside whole-stage codegen), while
    * this keeps every md5 in generated code and the map-side partial agg
    * collapses each partition to one row per document before the shuffle.
    * (Distinct-ing tokens first is pointless: duplicates can't change a min.)
    */
  /** Cross-engine-reproducible hash: md5 of token ⊕ seed (any SQL engine can
    * recompute it — the oracle path). min(string) aggregation falls back to
    * SortAggregate (string buffers aren't HashAggregate-able), so prefer
    * [[fastHash]] where no external engine needs to reproduce signatures. */
  val oracleHash: (Column, Int) => Column = (tok, i) => md5(concat(tok, lit(s"#$i")))

  /** Throughput hash: seeded xxhash64 → LONG. min(long) keeps the whole
    * signature aggregation in HashAggregate (mutable fixed-width buffer, no
    * sort of the exploded token stream) and shuffles 8-byte partials instead
    * of 32-char strings — the default for production-shaped pipelines where
    * only downstream Jaccard verification (hash-agnostic) must agree. */
  val fastHash: (Column, Int) => Column = (tok, i) => xxhash64(lit(i), tok)

  def minhashSignature(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      hashFn: (Column, Int) => Column = oracleHash): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__tok"))
    val sigAggs = (0 until numHashes).map { i =>
      min(hashFn(col("__tok"), i)).as(s"mh$i")
    }
    toks.groupBy(col(idCol)).agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** Zero-shuffle MinHash signatures: the custom codegen'd
    * [[graft.expressions.MinHashSigs]] expression computes each document's
    * whole signature in one pass over its text bytes — a pure map, no
    * explode, no aggregation. Bit-identical to
    * `minhashSignature(…, hashFn = fastHash)` (spec-asserted), with the
    * same `mh*` column shape, so it drops into `lshCandidateGroups`
    * unchanged. The production default at scale; the explode+agg forms
    * remain the cross-engine-verifiable (md5) and formulation-oracle paths. */
  def minhashSignatureRowwise(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int): DataFrame = {
    val sig = org.apache.spark.sql.GraftBridge.column(
      graft.expressions.MinHashSigs(
        org.apache.spark.sql.GraftBridge.expression(col(textCol)), numHashes))
    df.select(
      col(idCol) +: (0 until numHashes).map(i => sig.getItem(i).as(s"mh$i")): _*)
  }

  /** LSH banding over a MinHash signature: groups ids sharing a band hash.
    * Each band is a hash of `rowsPerBand` consecutive signature components;
    * near-duplicates collide in ≥1 band with high probability. Returns
    * (band, band_hash, ids) candidate groups with >1 member. */
  /** Band-key projection shared by batch [[lshCandidateGroups]] and the
    * streaming banding (`StreamParity.bandedDocs`): an `mh0..mh{n-1}`
    * signature frame → one (idCol, band, band_hash) row per band. The ONE
    * definition of which mh columns pair into which band, the `"|"`
    * separator and the sha2-256 — so the documented streaming-equals-batch
    * invariant cannot drift. Rows with a NULL signature (NULL-text doc
    * under the rowwise expression — nullSafeEval yields a NULL array, so
    * every mh is NULL) get NO bucket; without that filter ALL such rows
    * would share the one sha2(concat_ws of nulls) = sha2('') bucket and
    * pair quadratically. (The explode-based signature path never emits
    * such rows at all.) */
  private[graft] def bandedByHash(sig: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    val bands = numHashes / rowsPerBand
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), sha2(concat_ws("|", cols: _*), 256).as("band_hash"))
    }
    // The NULL guard is the GENERATOR's input (empty array → zero rows),
    // NOT a Filter node (round 18): a `filter(mh0.isNotNull && …)` above a
    // rowwise-PROJECTED signature gets predicate-pushed through the
    // projection with the signature expressions SUBSTITUTED into the
    // predicate — the streaming banding's 4×md5-per-token minhash ran
    // twice per row (once as the pushed scan filter, once as the
    // projection), doubling the micro-batch's whole CPU cost. As the
    // explode input the null checks reference the projected mh attributes
    // and evaluate once; an all-null signature explodes an empty slice —
    // zero rows, exactly the old filter's semantics.
    val all = array(bandStructs: _*)
    val nonNull = (0 until numHashes).map(i => col(s"mh$i").isNotNull)
      .reduce(_ && _)
    sig.select(col(idCol),
        explode(when(nonNull, all).otherwise(slice(all, 1, 0))).as("bh"))
      .select(col(idCol), col("bh.band").as("band"),
        col("bh.band_hash").as("band_hash"))
  }

  /** Duplicate-cluster size histogram — the dataset-card view of a dedup
    * run (how much of the corpus is 1-of-a-kind vs 200-copy template
    * spam): from any keepers frame (doc_id, keeper_id), one row per
    * cluster size with the cluster count and the docs they cover. Two
    * count-sized hash aggregates; nothing touches text. */
  def dupClusterHistogram(keepers: DataFrame,
      keeperCol: String = "keeper_id"): DataFrame =
    keepers.groupBy(col(keeperCol)).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** MinHash Jaccard ESTIMATE from two signature arrays: the fraction of
    * equal components — the estimator whose concentration the banding
    * S-curve ([[lshCollisionProb]]) integrates. Pure array arithmetic
    * (zip_with + aggregate), replayable in any SQL engine; use it to
    * rank candidates cheaply before the exact in-row verify. */
  def minhashJaccardEstimate(sigA: Column, sigB: Column): Column =
    round(
      aggregate(zip_with(sigA, sigB,
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / size(sigA), 6)

  /** MinHash-LSH S-curve: the probability that two documents with
    * Jaccard similarity `j` collide in at least one of `bands` bands of
    * `rowsPerBand` rows — 1 − (1 − j^r)^b (Leskovec/Rajaraman/Ullman,
    * "Mining of Massive Datasets" ch. 3). THE design equation of every
    * banding scheme in this module: it says what a (b, r) choice actually
    * promises about recall and candidate noise. Pure arithmetic Column —
    * codegen'd, trivially replayed by any SQL engine (q_lsh_scurve). */
  def lshCollisionProb(j: Column, bands: Int, rowsPerBand: Int): Column = {
    require(bands > 0 && rowsPerBand > 0,
      s"need positive bands/rows, got b=$bands r=$rowsPerBand")
    lit(1.0) - pow(lit(1.0) - pow(j, lit(rowsPerBand)), lit(bands))
  }

  /** Plan a banding scheme: among the (bands, rowsPerBand) factorizations
    * of `numHashes`, pick the one whose S-curve threshold (1/b)^(1/r) —
    * the similarity at which collision probability crosses ~0.5 — lands
    * closest to `targetThreshold`; ties prefer MORE rows per band (a
    * steeper curve: fewer sub-threshold candidates at equal recall).
    * Driver-side arithmetic over ≤ numHashes divisor pairs — use it to
    * derive the (numHashes, rowsPerBand) arguments the near-dup entry
    * points take instead of hand-guessing. */
  def lshPlan(numHashes: Int, targetThreshold: Double): (Int, Int) = {
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    require(targetThreshold > 0.0 && targetThreshold < 1.0,
      s"threshold must be in (0,1), got $targetThreshold")
    val candidates = for {
      r <- 1 to numHashes if numHashes % r == 0
      b = numHashes / r
    } yield (b, r)
    candidates.minBy { case (b, r) =>
      (math.abs(math.pow(1.0 / b, 1.0 / r) - targetThreshold), -r)
    }
  }

  def lshCandidateGroups(sig: DataFrame, idCol: String, numHashes: Int, rowsPerBand: Int,
      maxBucketSize: Int = Int.MaxValue,
      oversizeObs: Option[Observation] = None): DataFrame = {
    val groups = bandedByHash(sig, idCol, numHashes, rowsPerBand)
      .groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    // Mega-bucket guard (default-ON via the `*Rowwise` entry points): with
    // exact dups collapsed upstream, a bucket of size n is n DISTINCT
    // texts sharing a band — n² verify pairs. Boilerplate/template spam
    // produces buckets of 10⁵+ distinct near-identical docs, and one such
    // bucket is a corpus²-shaped task. The cap DROPS the bucket WHOLE, so
    // a capped run under-merges (never wrongly merges a truncated
    // membership) — and it is never silent: the drop count is collected
    // IN the same pass (a CollectMetrics node on the aggregated groups —
    // Catalyst does not push the size filter through it, so the metric
    // sees every bucket), surfaced through the caller's `oversizeObs` if
    // supplied, and WARN-logged by the session listener whenever
    // non-zero. Full membership of what was dropped stays inspectable
    // through `oversizeBuckets`.
    // An UNCAPPED run with a caller-supplied Observation still attaches it
    // (reporting zero drops and the true max_bucket): the groups frame is
    // the output either way, so the metric is free — and a never-attached
    // Observation would block the caller's obs.get forever.
    if (maxBucketSize == Int.MaxValue && oversizeObs.isEmpty) groups
    else {
      val audited = observeOversize(groups, col("n"), maxBucketSize, oversizeObs)
      if (maxBucketSize == Int.MaxValue) audited
      else audited.filter(col("n") <= maxBucketSize)
    }
  }

  /** Attach the in-pass oversize audit to a bucket-counts frame: observes
    * (dropped_buckets, dropped_members, max_bucket) over `sizeCol` against
    * `maxBucketSize` — into the caller's [[Observation]] when supplied,
    * else an auto-named `graft_oversize_*` observe — and registers the
    * session WARN listener. Shared by the text LSH banding and the image
    * Hamming banding so every capped dedup surface is loud the same way.
    *
    * Placement caveat: the observed frame must not end up as the BUILD
    * side of a broadcast join — a broadcast subtree materializes outside
    * the normal execute path and its CollectMetrics silently reports
    * zeros (pinned in MediaPrepSpec). Callers joining the observed frame
    * against a larger side add a `shuffle_hash` hint. */
  private[graft] def observeOversize(bucketCounts: DataFrame, sizeCol: Column,
      maxBucketSize: Int, oversizeObs: Option[Observation]): DataFrame = {
    ensureOversizeListener(bucketCounts.sparkSession)
    val metrics = Seq(
      coalesce(sum(when(sizeCol > maxBucketSize, 1L)), lit(0L))
        .as("dropped_buckets"),
      coalesce(sum(when(sizeCol > maxBucketSize, sizeCol)), lit(0L))
        .as("dropped_members"),
      coalesce(max(sizeCol), lit(0L)).as("max_bucket"))
    oversizeObs match {
      case Some(obs) => bucketCounts.observe(obs, metrics.head, metrics.tail: _*)
      case None => bucketCounts.observe(
        s"graft_oversize_buckets_${obsCounter.incrementAndGet()}",
        metrics.head, metrics.tail: _*)
    }
  }

  /** The buckets a `maxBucketSize`-capped run drops: same banding, size
    * above the cap. Dimension-sized (one row per oversize bucket) — cheap
    * to count/log next to the capped pipeline. */
  def oversizeBuckets(sig: DataFrame, idCol: String, numHashes: Int,
      rowsPerBand: Int, maxBucketSize: Int): DataFrame =
    lshCandidateGroups(sig, idCol, numHashes, rowsPerBand)
      .filter(col("n") > maxBucketSize)

  /** Cross-engine paragraph hash (md5 — any SQL engine reproduces it). */
  val oracleParaHash: Column => Column = md5(_)

  /** Throughput paragraph hash: xxhash64 → LONG keys (8-byte shuffle rows,
    * no hex strings). Keep-first depends only on hash EQUALITY, so the
    * output is identical to the md5 path modulo 64-bit collisions
    * (~n²/2⁶⁵ corpus-wide — negligible; spec-asserted equal). */
  val fastParaHash: Column => Column = xxhash64(_)

  /** Paragraph-level keep-first dedup — the layer training-corpus pipelines
    * run AFTER document-level dedup: boilerplate paragraphs (headers,
    * footers, license blocks, templated intros) recur across
    * otherwise-distinct documents, where document-level MinHash sees only
    * whole-text similarity.
    *
    * Split on `sep` → trim → drop empty paragraphs → hash each paragraph →
    * the FIRST occurrence in corpus order (smallest (id, position)) keeps
    * it; every later occurrence — in another doc or later in the same doc —
    * is dropped. Returns one row per input doc:
    * (idCol, text_dedup, n_kept), `text_dedup` the kept paragraphs
    * re-joined with `sep` in their original order ('' when none survive,
    * including NULL/empty input texts).
    *
    * Scale shape: keep-first is a min(struct(id, pos)) hash-aggregate on
    * the paragraph hash — map-side partial agg, skew-robust (a boilerplate
    * paragraph in 10⁸ docs is ONE group whose partials collapse before the
    * shuffle; nothing is ever pairwise) — plus an equi-join back on the
    * hash and a per-doc re-assembly aggregate. `maxOccurrences` is the
    * [[DefaultMaxBucketSize]]-style guardrail with keep-first semantics:
    * a paragraph occurring more than `maxOccurrences` times is boilerplate
    * and is dropped EVERYWHERE (even its first occurrence — under-keep,
    * never a wrong merge), with the drop observed in-pass through the same
    * `graft_oversize*` machinery (WARN-logged by the session listener;
    * same AQE-pruning caveat and [[withReliableOversizeAudit]] remedy). */
  /** Shared paragraph stream: split on `sep` → trim → drop empties → hash.
    * One row per (doc, position) with columns (idCol, __pos, __para, __h). */
  private def splitParas(df: DataFrame, idCol: String, textCol: String,
      sep: String, hashFn: Column => Column): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep), -1)).as(Seq("__pos", "__para")))
      .withColumn("__para", trim(col("__para")))
      .filter(length(col("__para")) > 0)
      .withColumn("__h", hashFn(col("__para")))

  def paragraphKeepFirst(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n",
      hashFn: Column => Column = oracleParaHash,
      maxOccurrences: Int = Int.MaxValue,
      oversizeObs: Option[Observation] = None): DataFrame = {
    val paras = splitParas(df, idCol, textCol, sep, hashFn)
    val counted = paras.groupBy("__h")
      .agg(min(struct(col(idCol).as("__wid"), col("__pos").as("__wpos")))
        .as("__w"), count(lit(1)).as("__n"))
    // uncapped + Observation still attaches (zeros + true max_bucket),
    // same contract as lshCandidateGroups
    val winners0 =
      if (maxOccurrences == Int.MaxValue && oversizeObs.isEmpty) counted
      else {
        val audited = observeOversize(counted, col("__n"), maxOccurrences,
          oversizeObs)
        if (maxOccurrences == Int.MaxValue) audited
        else audited.filter(col("__n") <= maxOccurrences)
      }
    // audited runs must not let the observed subtree become the BUILD side
    // of a broadcast join (metrics would silently read zero — see
    // observeOversize); at corpus scale the winner frame is Ω(distinct
    // paragraphs) and never broadcasts anyway
    val auditAttached = maxOccurrences != Int.MaxValue || oversizeObs.nonEmpty
    val winners =
      if (auditAttached) winners0.hint("shuffle_hash") else winners0
    val kept = paras
      .join(winners.select(col("__h"), col("__w")), "__h")
      .filter(col(idCol) === col("__w.__wid") && col("__pos") === col("__w.__wpos"))
    val rebuilt0 = kept.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__para"))))
        .as("__ps"))
      .select(col(idCol),
        array_join(transform(col("__ps"), _.getField("__para")), sep)
          .as("text_dedup"),
        size(col("__ps")).cast("long").as("n_kept"))
    val rebuilt =
      if (auditAttached) rebuilt0.hint("shuffle_hash") else rebuilt0
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Corpus-frequency boilerplate removal (the CCNet-shape complement of
    * [[paragraphKeepFirst]]): a paragraph occurring in MORE than
    * `maxDocFreq` distinct documents is boilerplate (header, footer,
    * cookie banner, license block) and is removed from EVERY document —
    * including its first occurrence — while a paragraph at or under the
    * threshold keeps ALL its occurrences. Keep-first dedups recurring
    * content to one copy; this filter instead preserves legitimate
    * repetition (a quote shared by two docs survives in both) and targets
    * only template chrome.
    *
    * Returns one row per input doc: (idCol, text_clean, n_kept,
    * n_removed), `text_clean` the surviving paragraphs re-joined with
    * `sep` in original order ('' when none survive).
    *
    * Scale shape: document frequency is a two-level hash aggregate —
    * groupBy(hash, doc) collapses a boilerplate paragraph's 10⁸
    * occurrences to one row per doc map-side, then groupBy(hash) counts
    * docs — no Expand-based distinct aggregate, no pairwise work; the
    * verdict joins back on the hash (Ω(distinct paragraphs), never
    * broadcast) and re-assembly is the same per-doc aggregate as
    * keep-first. */
  def boilerplateParagraphRemove(df: DataFrame, idCol: String,
      textCol: String, maxDocFreq: Int, sep: String = "\n\n",
      hashFn: Column => Column = oracleParaHash): DataFrame = {
    val paras = splitParas(df, idCol, textCol, sep, hashFn)
    val docFreq = paras.select(col("__h"), col(idCol)).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__df"))
    val kept = paras
      .join(docFreq.filter(col("__df") <= maxDocFreq).select("__h"), "__h")
    val perDocTotal = paras.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_paras"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__para"))))
        .as("__ps"))
      .select(col(idCol),
        array_join(transform(col("__ps"), _.getField("__para")), sep)
          .as("text_clean"),
        size(col("__ps")).cast("long").as("n_kept"))
    df.select(col(idCol))
      .join(perDocTotal, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("__n_paras"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  /** Duplicated token-span detection — the SUBSTRING layer below
    * [[paragraphKeepFirst]]: training corpora carry repeated spans that
    * respect no paragraph boundary (navigation chrome, license
    * sentences, templated intros), and exact-substring dedup finds them
    * by hashing every `windowTokens`-token sliding window.
    *
    * Returns one row per OCCURRENCE of a duplicated span:
    * (idCol, pos, span_hash, keep) — `pos` the 0-based token offset,
    * `keep` true only for the first occurrence in corpus order
    * (min (id, pos) per hash), which is the occurrence a keep-first
    * rewrite would retain. A span is duplicated when its hash appears in
    * more than one document (`crossDocOnly`, the default) or more than
    * once anywhere (`crossDocOnly = false` also surfaces within-doc
    * repetition).
    *
    * Scale shape: windows are built IN-ROW (a `transform` over the token
    * array — no token-row explode), and the whole dup-test + ranking is
    * ONE shuffle on the span hash: per-hash window functions — min ≠ max
    * over the doc id decides cross-doc duplication without a distinct
    * aggregate (which would plan as Expand + SortAggregate; measured 45 s
    * → 17 s at 100 k replicated docs), row_number gives the
    * first-occurrence marker, and no join back is needed. Bounded by
    * span volume, never pairwise; a boilerplate span shared by a large
    * corpus fraction makes its hash partition the hotspot — inherent to
    * emitting every occurrence of that span. `hashFn` hashes the
    * space-rejoined window — [[fastParaHash]] (xxhash64) by DEFAULT,
    * which routes through the one-pass codegen'd span_hashes expression;
    * pass [[oracleParaHash]] (md5) explicitly only when an external SQL
    * engine must replay the hash values — the md5 form takes the
    * relational HOF path, which is CodegenFallback and ~20× slower at
    * corpus scale. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int,
      crossDocOnly: Boolean = true,
      hashFn: Column => Column = fastParaHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowTokens > 0, "windowTokens must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    // The fastParaHash family routes through the one-pass codegen'd
    // span_hashes expression (bit-identical to the relational form,
    // spec-asserted; the HOF lambda below is CodegenFallback and
    // re-materializes every window — 20× slower at corpus scale). Any
    // other hashFn (md5 oracle path) keeps the relational formulation.
    val spanArr =
      if (hashFn eq fastParaHash)
        org.apache.spark.sql.GraftBridge.column(
          graft.expressions.SpanHashes(
            org.apache.spark.sql.GraftBridge.expression(col(textCol)),
            windowTokens))
      else
        // no otherwise: short/NULL docs get a NULL span array, which
        // posexplode skips — and the branch type follows hashFn (md5
        // strings or xxhash64 longs) without an explicit cast
        when(size(toks) >= windowTokens,
          transform(sequence(lit(0), size(toks) - windowTokens),
            i => hashFn(concat_ws(" ", slice(toks, i + 1, lit(windowTokens))))))
    val spans = df
      .select(col(idCol), spanArr.as("__spans"))
      .select(col(idCol), posexplode(col("__spans")).as(Seq("pos", "span_hash")))
    val byHash = Window.partitionBy(col("span_hash"))
    val dupFlag =
      if (crossDocOnly)
        min(col(idCol)).over(byHash) =!= max(col(idCol)).over(byHash)
      else count(lit(1)).over(byHash) > 1
    spans
      .withColumn("__dup", dupFlag)
      .withColumn("__rn",
        row_number().over(byHash.orderBy(col(idCol), col("pos"))))
      .filter(col("__dup"))
      .select(col(idCol), col("pos"), col("span_hash"),
        (col("__rn") === 1).as("keep"))
  }

  /** Keep-first SUBSTRING rewrite over [[duplicatedSpans]]: every token
    * covered by a duplicated `windowTokens`-token window whose occurrence
    * is NOT the corpus-order first is deleted; the first occurrence (and
    * all non-duplicated text) survives verbatim. Overlapping duplicate
    * windows in one doc merge into maximal intervals before deletion, so
    * a repeated 50-token passage costs one contiguous cut, not 43
    * window-sized ones. Returns (idCol, text_dedup, n_removed) — the
    * rewritten text re-joined on single spaces and the count of deleted
    * tokens ('' / full count when everything was a later occurrence).
    *
    * Scale shape: interval merging is a per-doc window (gaps-and-islands
    * over span starts — partitioned by doc, never global); the deletion
    * itself is IN-ROW (a two-arg `filter` over the token array testing
    * interval membership — no token-row explode), with each doc's
    * disjoint intervals riding in as an array bounded by its own token
    * count. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int,
      crossDocOnly: Boolean = true,
      hashFn: Column => Column = fastParaHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val later = duplicatedSpans(df, idCol, textCol, windowTokens,
        crossDocOnly, hashFn)
      .filter(!col("keep"))
      .select(col(idCol), col("pos"), (col("pos") + windowTokens).as("__e"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val intervals = later
      .withColumn("__prevMax", max(col("__e")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__ni",
        when(col("__prevMax").isNull || col("pos") > col("__prevMax"), 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__ni")).over(byDoc))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("__s"), max(col("__e")).as("__end"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__s"), col("__end"))).as("__iv"))
    val toks = TextFunctions.tokens(col(textCol))
    val keptArr = filter(toks, (_, i) =>
      !exists(col("__iv"), iv =>
        i >= iv.getField("__s") && i < iv.getField("__end")))
    df.join(intervals, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__iv").isNull, coalesce(col(textCol), lit("")))
          .otherwise(concat_ws(" ", keptArr)).as("text_dedup"),
        when(col("__iv").isNull, lit(0L))
          .otherwise(size(toks) - size(keptArr)).cast("long").as("n_removed"))
  }

  /** 64-bit SimHash over whitespace tokens using xxhash64 (codegen'd native
    * hash — the throughput path; the md5-nibble variant in PipelineQueries
    * is the cross-engine-verifiable form). */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Explode (token, bit) pairs once and aggregate bit votes relationally —
    // a nested HOF over bits × tokens would be quadratic in expression depth.
    val tokenHashes = df
      .select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = tokenHashes
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(63))).as("b"))
      .withColumn("bit", expr("shiftright(h, b)").bitwiseAND(lit(1L)))
      .groupBy(col(idCol), col("b"))
      .agg(sum(when(col("bit") === 1, 1L).otherwise(-1L)).as("vote"))
    votes
      .groupBy(col(idCol))
      .agg(sum(when(col("vote") >= 0, expr("shiftleft(1L, b)")).otherwise(0L)).as("simhash"))
  }

  /** Token-set Jaccard similarity pairs above `threshold` (exact verifier;
    * run within LSH candidate buckets at scale). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    val toks = df.select(
      col(idCol).as("id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = toks.as("a")
      .join(toks.as("b"), col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Full near-dup pipeline at scale shape: MinHash signatures → LSH band
    * buckets → pairwise Jaccard verification ONLY within buckets → connected
    * keeper selection (min id per verified duplicate group, one hop).
    *
    * Returns (doc_id, keeper_id): every document maps to the smallest id it
    * was verified near-duplicate with (itself if unique). The n² work is
    * confined to bucket-local pairs — the global joins are all equi-joins on
    * band hashes / ids, so the plan is shuffle-bounded by candidate volume,
    * not corpus².
    */
  /** Collapse exact duplicates to their group-min representative, run
    * `pipeline` over the unique texts only, fan the result back out.
    *
    * Semantics-preserving for any text-determined keeper pipeline:
    * identical texts have identical signatures, hence identical bucket
    * membership and identical verification outcomes, so a group behaves
    * exactly like its representative and the final keeper of every doc is
    * `keeper(rep(doc))` (reps are group minima, so keeper_rep ≤ rep ≤ id).
    *
    * The scale property this buys: an exact-duplicate cluster of size n
    * would otherwise sit in every one of its LSH buckets as an n-clique —
    * C(n,2) candidate pairs, each verified by a token-intersection join.
    * Collapsing first makes candidate volume a function of UNIQUE-text
    * structure; replication factor (the dominant redundancy in crawled
    * corpora) costs one digest groupBy + two digest joins, never n².
    */
  /** The exact-dup representative set the collapsed pipelines band over:
    * one (group-min id, text) row per distinct text, NULL texts kept as
    * per-id singletons. Public so callers reporting on a capped run (e.g.
    * `oversizeBuckets`) can inspect the SAME population the pipeline
    * banded, not the raw rows. */
  def collapseReps(df: DataFrame, idCol: String, textCol: String): DataFrame =
    collapseGroups(df, idCol, textCol)._2
      .select(col("__rep").as(idCol), col(textCol))

  /** (hashed rows with `__h`, groups keyed `__h` with `__rep` + text). */
  private def collapseGroups(df: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val hashed = df.select(col(idCol), col(textCol),
      sentinelTextHash(idCol, textCol).as("__h"))
    // all texts in a group are identical, so first(text) is deterministic
    val groups = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__rep"), first(col(textCol)).as(textCol))
    (hashed, groups)
  }

  private def collapsedRun(df: DataFrame, idCol: String, textCol: String)(
      pipeline: DataFrame => DataFrame): DataFrame = {
    // NULL-text docs must survive the fan-out joins (NULL = NULL never
    // matches an equi-join) AND must not merge with each other — the
    // uncollapsed pipeline leaves them as keeper-of-self singletons (no
    // tokens → no signature → no bucket). The per-id sentinel key keeps
    // each one its own group, preserving that contract exactly.
    val (hashed, groups) = collapseGroups(df, idCol, textCol)
    val reps = groups.select(col("__rep").as(idCol), col(textCol))
    val keepersRep = pipeline(reps)
      .select(col("doc_id").as("__rep"), col("keeper_id"))
    hashed.select(col(idCol), col("__h"))
      .join(groups.select(col("__h"), col("__rep")), "__h")
      .join(keepersRep, "__rep")
      .select(col(idCol).as("doc_id"), col("keeper_id"))
  }

  def nearDupKeepers(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, rowsPerBand: Int, threshold: Double,
      hashFn: (Column, Int) => Column = oracleHash): DataFrame =
    collapsedRun(df, idCol, textCol) { reps =>
      nearDupKeepersFromSigs(reps,
        minhashSignature(reps, idCol, textCol, numHashes, hashFn),
        idCol, textCol, numHashes, rowsPerBand, threshold)
    }

  /** `nearDupKeepers` signed by the zero-shuffle rowwise expression
    * (xxhash64 family) — the production-default combination: exact-dup
    * collapse, pure-map signatures, bucket-bounded verification, and the
    * [[DefaultMaxBucketSize]] mega-bucket guardrail ON by default (capped
    * drops are observed in-pass and WARN-logged; pass `Int.MaxValue` to
    * uncap, or an [[Observation]] to read the drop count after an action). */
  def nearDupKeepersRowwise(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, rowsPerBand: Int, threshold: Double,
      maxBucketSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None): DataFrame =
    collapsedRun(df, idCol, textCol) { reps =>
      nearDupKeepersFromSigs(reps,
        minhashSignatureRowwise(reps, idCol, textCol, numHashes),
        idCol, textCol, numHashes, rowsPerBand, threshold, maxBucketSize,
        oversizeObs)
    }

  /** `nearDupKeepers` with the signature step supplied by the caller —
    * e.g. `minhashSignatureRowwise` (zero-shuffle custom expression) or a
    * signature table persisted by an earlier pipeline stage. */
  /** All Jaccard-verified near-dup pairs (id_a < id_b) among the LSH
    * candidates — the edge set both keeper variants reduce. The n² work is
    * confined to bucket-local pairs, and the verification itself never
    * leaves the candidate-pair row: each side's token SET rides along as a
    * sorted xxhash64 array ([[graft.expressions.SortedTokenHashes]], a
    * pure-map codegen expression — no explode, no token rows), and the
    * intersection is an in-row two-pointer merge
    * ([[graft.expressions.SortedLongIntersectCount]]). Compared to the
    * (id, token) equi-join formulation this removes the candidate×token
    * row fan-out — the widest shuffle of the pipeline — plus the
    * per-pair count aggregation and the two token-set-size joins
    * (`size(arr)` is free). Set equality survives token hashing modulo
    * xxhash64 collisions between two distinct tokens of one document
    * (~t²/2⁶⁵ per doc — negligible). */
  def verifiedNearDupPairs(df: DataFrame, sig: DataFrame, idCol: String,
      textCol: String, numHashes: Int, rowsPerBand: Int,
      threshold: Double, maxBucketSize: Int = Int.MaxValue,
      oversizeObs: Option[Observation] = None): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val cand = lshCandidateGroups(sig, idCol, numHashes, rowsPerBand,
      maxBucketSize, oversizeObs)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    val tokSets = df.select(col(idCol).as("__id"),
      GraftBridge.column(graft.expressions.SortedTokenHashes(
        GraftBridge.expression(col(textCol)))).as("__toks"))
    val inter = GraftBridge.column(graft.expressions.SortedLongIntersectCount(
      GraftBridge.expression(col("__ta")), GraftBridge.expression(col("__tb"))))
    cand
      .join(tokSets.select(col("__id").as("id_a"), col("__toks").as("__ta")), Seq("id_a"))
      .join(tokSets.select(col("__id").as("id_b"), col("__toks").as("__tb")), Seq("id_b"))
      .withColumn("__inter", inter)
      .filter(col("__inter") / (size(col("__ta")) + size(col("__tb")) - col("__inter"))
        >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  def nearDupKeepersFromSigs(df: DataFrame, sig: DataFrame, idCol: String,
      textCol: String, numHashes: Int, rowsPerBand: Int,
      threshold: Double, maxBucketSize: Int = Int.MaxValue,
      oversizeObs: Option[Observation] = None): DataFrame = {
    val verified = verifiedNearDupPairs(df, sig, idCol, textCol,
        numHashes, rowsPerBand, threshold, maxBucketSize, oversizeObs)
      .select(col("id_b").as("dup_id"), col("id_a").as("cand_keeper"))
    df.select(col(idCol).as("doc_id"))
      .join(verified.groupBy("dup_id").agg(min("cand_keeper").as("keeper")),
        col("doc_id") === col("dup_id"), "left")
      .select(col("doc_id"), coalesce(col("keeper"), col("doc_id")).as("keeper_id"))
  }

  /** Cross-corpus near-duplicate pairs — fuzzy decontamination and
    * incremental-crawl dedup: (train_id, ref_id, jaccard) for train docs
    * whose MinHash-banded candidates against a REFERENCE corpus verify
    * at token-set Jaccard ≥ threshold. The fuzzy complement of the
    * Bloom-prefiltered exact anti-join (E38): digests catch
    * byte-identical re-crawls, this catches the near-identical ones
    * (boilerplate swaps, whitespace drift, small edits) — without ever
    * joining train×ref. Only same-bucket pairs meet, so a 100 TB crawl
    * against a 100 TB training set stays band-join-shaped.
    *
    * Scale shape: signatures are rowwise codegen by default (pass
    * `hashFn = Some(oracleHash)` for the md5 SQL-replayable family);
    * the band join shuffles (id, 64-hex band hash) rows only — never
    * text; hot REFERENCE buckets (site chrome every page shares) cap
    * through the shared loud oversize audit, and a train doc landing in
    * a dropped bucket can still match through its other bands;
    * verification rides each candidate row as two sorted xxhash64 token
    * arrays intersected in-row. Drop flagged rows with an anti-join on
    * the distinct `train_id` column. */
  def crossCorpusNearDupPairs(train: DataFrame, trainIdCol: String,
      trainTextCol: String, ref: DataFrame, refIdCol: String,
      refTextCol: String, numHashes: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.9,
      hashFn: Option[(Column, Int) => Column] = None,
      maxPostingSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    def sigs(df: DataFrame, id: String, text: String) = hashFn match {
      case Some(h) => minhashSignature(df, id, text, numHashes, h)
      case None => minhashSignatureRowwise(df, id, text, numHashes)
    }
    val bt = bandedByHash(sigs(train, trainIdCol, trainTextCol), trainIdCol,
        numHashes, rowsPerBand)
      .select(col(trainIdCol).as("__tid"), col("band"), col("band_hash"))
    val br = bandedByHash(sigs(ref, refIdCol, refTextCol), refIdCol,
        numHashes, rowsPerBand)
      .select(col(refIdCol).as("__rid"), col("band"), col("band_hash"))
    val postings = br.groupBy("band", "band_hash").agg(count(lit(1)).as("__n"))
    val audited = observeOversize(postings, col("__n"), maxPostingSize,
      oversizeObs)
    val kept =
      if (maxPostingSize == Int.MaxValue) audited
      else audited.filter(col("__n") <= maxPostingSize)
    val cands = bt
      .join(kept.select("band", "band_hash"), Seq("band", "band_hash"))
      .join(br, Seq("band", "band_hash"))
      .select(col("__tid"), col("__rid")).distinct()
    def tokSets(df: DataFrame, id: String, text: String, a: String, b: String) =
      df.select(col(id).as(a), GraftBridge.column(
        graft.expressions.SortedTokenHashes(
          GraftBridge.expression(col(text)))).as(b))
    val inter = GraftBridge.column(graft.expressions.SortedLongIntersectCount(
      GraftBridge.expression(col("__ta")), GraftBridge.expression(col("__tb"))))
    cands
      .join(tokSets(train, trainIdCol, trainTextCol, "__tid", "__ta"), Seq("__tid"))
      .join(tokSets(ref, refIdCol, refTextCol, "__rid", "__tb"), Seq("__rid"))
      .withColumn("__i", inter)
      .withColumn("__j",
        col("__i") / (size(col("__ta")) + size(col("__tb")) - col("__i")))
      .filter(col("__j") >= threshold)
      .select(col("__tid").as("train_id"), col("__rid").as("ref_id"),
        round(col("__j"), 6).as("jaccard"))
  }

  /** Directed CONTAINMENT pairs — |A∩B| / |A| ≥ threshold over word
    * `shingleTokens`-gram shingle sets — the asymmetric near-dup relation
    * resemblance-Jaccard misses: a short doc quoted whole inside a long
    * one has Jaccard ≈ |A|/|B| (small) but containment 1.0. Returns
    * (sub_id, sup_id, containment): `sub_id`'s shingles are ≥ threshold
    * covered by `sup_id`'s.
    *
    * Candidates come from PREFIX FILTERING (Chaudhuri et al. ICDE'06 /
    * Xiao et al. WWW'08 PPJoin): order each doc's shingle set by global
    * document frequency ascending (rarest first, ties by hash); if
    * C(A,B) ≥ t then B must contain one of A's first
    * |A| − ⌊t·|A|⌋ + 1 shingles (pigeonhole — ⌊⌋ keeps the prefix
    * conservative under float rounding of t·|A|, so pruning is LOSSLESS:
    * unlike MinHash banding the result is exactly the brute-force answer).
    * Joining only those prefix shingles against the inverted index bounds
    * the candidate fan-out by the posting lists of RARE shingles.
    *
    * Scale shape: shingle sets are one-pass codegen rowwise
    * ([[graft.expressions.SpanHashes]] → distinct+sort in-row, no token
    * explode for the verify side); the exploded (doc, shingle) frame is
    * paid once for the df count and prefix selection (the same explode
    * LSH banding pays); verification is candidate-local — each side's
    * set rides the pair row as a sorted xxhash64 array and intersects
    * in-row ([[graft.expressions.SortedLongIntersectCount]]). Posting
    * lists above `maxPostingSize` are dropped from BOTH prefix and index
    * with the shared loud oversize audit (hot boilerplate shingles;
    * df-ascending prefixes make this rare — a drop can only lose pairs
    * whose every prefix shingle is that hot, and the audit counts it).
    * Docs with fewer than `shingleTokens` tokens have no shingles and
    * appear on neither side. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleTokens: Int = 3,
      maxPostingSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.expressions.Window
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1], got $threshold")
    // the set frame feeds five plan branches (df count, prefix, index,
    // both verify sides): persist once so text is shingled in one pass,
    // released by the first completed action (one-shot listener — same
    // lifecycle as the image hash frame)
    val sets = df.select(col(idCol).as("__id"),
      array_sort(array_distinct(GraftBridge.column(
        graft.expressions.SpanHashes(
          GraftBridge.expression(col(textCol)), shingleTokens)))).as("__hs"))
      .filter(col("__hs").isNotNull)
      .withColumn("__n", size(col("__hs")).cast("long"))
      .persist()
    graft.multimodal.Multimodal.unpersistAfterFirstUse(sets)
    val ex = sets.select(col("__id"), col("__n"), explode(col("__hs")).as("__h"))
    // sets are per-doc distinct, so count(*) IS document frequency
    val dfreq = ex.groupBy("__h").agg(count(lit(1)).as("__df"))
    val audited = observeOversize(dfreq, col("__df"), maxPostingSize,
      oversizeObs)
    val kept =
      if (maxPostingSize == Int.MaxValue) audited
      else audited.filter(col("__df") <= maxPostingSize)
    val prefix = ex.join(kept, "__h")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__df"), col("__h"))))
      .filter(col("__rn") <= col("__n") - floor(lit(threshold) * col("__n")) + 1)
      .select(col("__id").as("sub_id"), col("__h"))
    val cands = prefix
      .join(ex.select(col("__id").as("sup_id"), col("__h")), "__h")
      .filter(col("sub_id") =!= col("sup_id"))
      .select("sub_id", "sup_id").distinct()
    val inter = GraftBridge.column(graft.expressions.SortedLongIntersectCount(
      GraftBridge.expression(col("__ha")), GraftBridge.expression(col("__hb"))))
    cands
      .join(sets.select(col("__id").as("sub_id"), col("__hs").as("__ha"),
        col("__n").as("__na")), Seq("sub_id"))
      .join(sets.select(col("__id").as("sup_id"), col("__hs").as("__hb")),
        Seq("sup_id"))
      .withColumn("__i", inter)
      .filter(col("__i").cast("double") / col("__na") >= threshold)
      .select(col("sub_id"), col("sup_id"),
        round(col("__i").cast("double") / col("__na"), 6).as("containment"))
  }

  /** Winnow-overlap candidate pairs: docs sharing at least `minShared`
    * winnowing fingerprints (Schleimer et al. SIGMOD'03 selection via
    * [[graft.functions.TextFunctions.winnowFingerprints]]). The THIRD
    * candidate generator next to MinHash-LSH (set resemblance) and the
    * prefix-filter join (containment): winnowing guarantees a shared
    * fingerprint for ANY shared substring of ≥ w+k−1 chars, so this
    * surfaces LOCAL copying — a lifted paragraph inside two otherwise
    * unrelated docs — that both set-level generators dilute away.
    * Returns (id_a, id_b, shared) with id_a < id_b.
    *
    * Scale shape: fingerprint selection is rowwise (the codegen
    * winnow_hashes expression when `hashFn` is null-default xxhash64 via
    * [[fastWinnow]], or the md5 HOF form for SQL replay); the pair join
    * explodes only the SELECTED ~2/(w+1) density fingerprints, and hot
    * fingerprints (site chrome shared by everything) cap through the
    * same loud oversize audit as every banded pipeline here. */
  def winnowCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int,
      hashFn: Option[Column => Column] = None,
      maxPostingSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    require(minShared > 0, "minShared must be positive")
    val fps = hashFn match {
      case Some(h) => graft.functions.TextFunctions
        .winnowFingerprints(col(textCol), k, w, h)
      case None => GraftBridge.column(graft.expressions.WinnowHashes(
        GraftBridge.expression(col(textCol)), k, w))
    }
    // the fingerprint explode feeds three plan branches (posting counts +
    // both pair-join sides): persist once so each doc is winnowed in one
    // pass, released by the first completed action
    val ex = df.select(col(idCol).as("__id"), explode(fps).as("__fp"))
      .persist()
    graft.multimodal.Multimodal.unpersistAfterFirstUse(ex)
    val posting = ex.groupBy("__fp").agg(count(lit(1)).as("__n"))
    val audited = observeOversize(posting, col("__n"), maxPostingSize,
      oversizeObs)
    val kept =
      if (maxPostingSize == Int.MaxValue) audited
      else audited.filter(col("__n") <= maxPostingSize)
    ex.join(kept.select("__fp"), "__fp")
      .select(col("__id"), col("__fp")).as("a")
      .join(ex.select(col("__id").as("__idb"), col("__fp")), "__fp")
      .filter(col("__id") < col("__idb"))
      .groupBy(col("__id").as("id_a"), col("__idb").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("id_a"), col("id_b"), col("shared"))
  }

  /** Edit-distance similarity join (FastSS deletion neighborhoods, Bocek
    * et al. 2007): pairs of rows whose `strCol` values are within
    * Levenshtein distance `maxDist` (1 or 2) — the fuzzy-KEY join the
    * set-resemblance generators cannot express well (a one-char typo
    * flips every shingle containing it, but barely moves the deletion
    * neighborhood). Returns (id_a, id_b, dist) with id_a < id_b.
    *
    * Candidate generation is LOSSLESS: ed(a,b) ≤ d guarantees the
    * depth-d deletion neighborhoods intersect (delete the edited
    * positions from both sides), so after the levenshtein verify the
    * result EQUALS the brute-force join; overgenerated candidates are
    * simply filtered. Meant for SHORT keys (titles, normalized URLs,
    * names): a length-L string emits 1+L variants at d=1, O(L²) at d=2.
    *
    * Scale shape: the neighborhood is a rowwise codegen'd expression
    * chain whose variants md5-collapse to 32-hex bucket keys BEFORE the
    * shuffle (the exchange carries hashes, never variant strings;
    * per-row `array_distinct` keeps a doc from meeting a bucket twice);
    * mega-buckets (e.g. a corpus of near-empty keys) cap through the
    * shared loud oversize audit; the levenshtein verify runs on
    * bucket-mates only. Distance semantics are Spark's codepoint
    * levenshtein; variant slicing is by UTF-16 code unit, which can
    * OVER-generate on astral-plane chars but never drops a true pair. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1,
      maxPostingSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (neighborhood size is O(len^d)), got $maxDist")
    val strs = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
    // {s} ∪ {one-char deletions of s}; the empty string's neighborhood is
    // itself (sequence(1,0) would walk BACKWARD, not empty — guard it)
    def del1(s: Column): Column =
      when(length(s) === 0, array(s)).otherwise(concat(array(s),
        transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i)))))
    val nbhd =
      if (maxDist == 1) del1(col("__s"))
      else flatten(transform(del1(col("__s")), v => del1(v)))
    // the exploded (id, bucket-hash) frame feeds three plan branches
    // (posting counts + both candidate-join sides): persist once,
    // released by the first completed action
    val ex = strs.select(col("__id"), explode(array_distinct(nbhd)).as("__v"))
      .select(col("__id"), md5(col("__v")).as("__h"))
      .persist()
    graft.multimodal.Multimodal.unpersistAfterFirstUse(ex)
    val posting = ex.groupBy("__h").agg(count(lit(1)).as("__n"))
    val audited = observeOversize(posting, col("__n"), maxPostingSize,
      oversizeObs)
    val kept =
      if (maxPostingSize == Int.MaxValue) audited
      else audited.filter(col("__n") <= maxPostingSize)
    val cands = ex.join(kept.select("__h"), "__h")
      .join(ex.select(col("__id").as("__idb"), col("__h")), "__h")
      .filter(col("__id") < col("__idb"))
      .select(col("__id").as("id_a"), col("__idb").as("id_b")).distinct()
    cands
      .join(strs.select(col("__id").as("id_a"), col("__s").as("__sa")), Seq("id_a"))
      .join(strs.select(col("__id").as("id_b"), col("__s").as("__sb")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Corpus filter over [[containmentPairs]]: drop every doc that is
    * ≥ threshold contained in a doc that (transitively) survives. The
    * rule is deterministic and safe under chains:
    *
    *   - non-mutual pair (A ⊂ B only): A drops — its shingles live on in
    *     B, and non-mutual edges point small→large so they cannot cycle;
    *     if B later drops, B's superset (or equal twin) survives, so A's
    *     content is still covered transitively.
    *   - mutual pair (near-equal twins): the LOWER id survives.
    *
    * Returns the surviving rows of `df` unchanged. */
  def containmentDrop(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleTokens: Int = 3,
      maxPostingSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None): DataFrame = {
    // the pairs frame feeds three plan branches (mutual semi, non-mutual
    // anti, twin filter) — without a persist each branch re-runs the whole
    // shingle→prefix→verify pipeline (measured 5.9 s → 2.4 s at sf0.1).
    // Result-sized (only above-threshold pairs), released after the first
    // completed action.
    val pairs = containmentPairs(df, idCol, textCol, threshold,
        shingleTokens, maxPostingSize, oversizeObs)
      .select("sub_id", "sup_id")
      .persist()
    graft.multimodal.Multimodal.unpersistAfterFirstUse(pairs)
    // pairs whose reverse direction also qualified = near-equal twins
    val mutual = pairs.as("p").join(pairs.as("q"),
      col("p.sub_id") === col("q.sup_id") &&
        col("p.sup_id") === col("q.sub_id"), "left_semi")
    val drops = pairs.as("p").join(pairs.as("q"),
        col("p.sub_id") === col("q.sup_id") &&
          col("p.sup_id") === col("q.sub_id"), "left_anti")
      .select(col("sub_id"))
      .unionByName(mutual.filter(col("sub_id") > col("sup_id"))
        .select(col("sub_id")))
      .distinct()
    df.join(drops.withColumnRenamed("sub_id", idCol), Seq(idCol), "left_anti")
  }

  /** Connected components over an undirected edge list by alternating
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): every vertex ends with
    * the smallest id reachable from it.
    *
    * Each round rewires edges toward local minima — large-star hangs every
    * neighbor larger than a node off that node's minimum, small-star hangs
    * the smaller neighbors off it — contracting any component to a star
    * rooted at its global minimum in O(log²) rounds WORST case and 1-2
    * rounds for the near-clique shapes duplicate groups actually have
    * (min-label propagation needs O(diameter) rounds and re-shuffles the
    * full edge set each time; here the edge set itself contracts, so later
    * rounds shuffle less). Lineage is cut with localCheckpoint per round.
    *
    * Convergence is certified STRUCTURALLY, not by change-detection: the
    * parent-pointer edge set is the answer exactly when it is a star
    * forest — every child has one parent and no parent is itself a child
    * (rounds preserve connectivity, and the u > v invariant makes each
    * star's root its component minimum). The witness count for that
    * property rides the large-star phase's own aggregation as an observed
    * metric, so each round is ONE job — no separate probe (see
    * `largeStarAudited`).
    *
    * Small graphs finish DRIVER-SIDE: once the (checkpointed, counted)
    * edge set is at most `localFinishEdges` rows — at entry, or after the
    * rounds have contracted it below the bound — the remaining closure is
    * a bounded collect (≤ 16 B/edge, ~6.4 MB at the default) plus a
    * union-find, instead of 2+ more Spark rounds of pure stage overhead.
    * The bound makes the collect dimension-sized BY CONSTRUCTION; pass
    * `localFinishEdges = 0` to force the fully distributed path.
    *
    * 400k (round 17, raised from 100k): a path-compressed union-find
    * closes 400k edges in ~10 ms of driver time, while ONE distributed
    * star round at that size is ~10 sequential AQE stages (~2 s of pure
    * dispatch on an idle 32-core session — q_dedup_keepers_cc's verified
    * template-cluster graph measured ~200k edges, just over the old bound,
    * and paid a full round before contracting under it). The collect stays
    * two longs per edge; the driver-memory ceiling it implies (~40 MB of
    * transient Rows) is far under any driver this engine configures. */
  val DefaultLocalFinishEdges = 400000

  def connectedComponents(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 10,
      localFinishEdges: Int = DefaultLocalFinishEdges): DataFrame = {
    // one materialization of the caller's edge plan: both the canonical
    // set and the self-loop scan read the checkpoint, so a general caller
    // passing an expensive edge-producing plan pays for it exactly once
    // (the dedup pipeline's canonical fast path skips all of this)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val labels = ccCanonical(
      e.filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("u"),
          least(col("src"), col("dst")).as("v"))
        .distinct(),
      maxIter, localFinishEdges)
    // a vertex whose only edges are self-loops is still a vertex: it gets
    // a singleton component (matching the min-label formulation), instead
    // of silently vanishing with the filtered loops. The union+min is
    // labels-sized — vertices with real edges keep their (≤ id) label.
    val selfOnly = e.filter(col("src") === col("dst"))
      .select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
    labels.unionByName(selfOnly)
      .groupBy("id").agg(min("component").as("component"))
  }

  /** [[connectedComponents]] for callers whose edge list is ALREADY
    * canonical — distinct rows with src > dst, no self-loops (e.g.
    * `verifiedNearDupPairs`, which emits distinct id_a < id_b) — skipping
    * the canonicalization shuffle the general entry point pays. */
  private[dedup] def connectedComponentsCanonical(edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int,
      localFinishEdges: Int = DefaultLocalFinishEdges): DataFrame =
    ccCanonical(edges.select(col(srcCol).as("u"), col(dstCol).as("v")),
      maxIter, localFinishEdges)

  /** Driver-side closure of a bounded edge set: path-compressed union-find
    * attaching larger roots under smaller ones, so every find lands on the
    * component MINIMUM — the same labels the distributed rounds produce.
    * Only called on a counted, ≤ `localFinishEdges`-row frame. Returns a
    * LocalRelation, so downstream fan-out joins broadcast it for free. */
  private def ccLocalFinish(e: DataFrame): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp); x = p; p = gp
      }
      x
    }
    val nodes = new java.util.HashSet[Long]()
    e.collect().foreach { r =>
      val u = r.getLong(0); val v = r.getLong(1)
      nodes.add(u); nodes.add(v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) {
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.size)
    nodes.forEach(n => out.add(org.apache.spark.sql.Row(n, find(n))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("component",
        org.apache.spark.sql.types.LongType, nullable = false)))
    e.sparkSession.createDataFrame(out, schema)
  }

  private def ccCanonical(canonical: DataFrame, maxIter: Int,
      localFinishEdges: Int = DefaultLocalFinishEdges): DataFrame = {
    // Input checkpoint: the rounds reference their input multiple times,
    // and AQE's runtime join planning does not reliably reuse a common
    // upstream exchange across those references — without the checkpoint
    // the (possibly expensive) edge-producing plan re-executes (measured
    // ~1 s slower on the sf0.1 dedup graph).
    var e = canonical.localCheckpoint()
    // empty graph: zero rounds, empty labels — returned here both as a
    // fast path and so the audited round below never observes a metric on
    // an empty plan (AQE would prune the audit node with the branch)
    if (e.isEmpty)
      return e.select(col("u").as("id"), col("v").as("component"))

    // star forest ⇔ no duplicate child AND no parent appearing as a child.
    // FALLBACK probe only (see ccRoundConverged): the per-round verdict
    // normally rides the round's own aggregate below.
    def isStarForest(g: DataFrame): Boolean = {
      val multiParent = g.groupBy("u").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).select(lit(1).as("w"))
      val parentIsChild = g.as("a")
        .join(g.as("b"), col("a.v") === col("b.u"), "left_semi")
        .select(lit(1).as("w"))
      multiParent.unionByName(parentIsChild).isEmpty
    }

    // large-star: per node, hang every LARGER neighbor off min(Γ⁺(node)).
    // Output keeps the u > v invariant: emitted (v, m) has v > node ≥ m.
    //
    // The convergence audit rides the per-node groupBy this phase already
    // pays: tagging each symmetrized row with its direction makes the
    // aggregate see, per node, its child-side degree (rows where it is
    // the u of g) and parent-side degree — and g is a star forest exactly
    // when no node has two parents or stands on both sides. A
    // CollectMetrics node on that aggregate surfaces the witness count in
    // the SAME action that materializes the round (the localCheckpoint),
    // replacing the separate per-round probe job. The audit describes g —
    // this phase's INPUT, the smallStar output — which is sound because
    // star forests are fixpoints of BOTH phases: zero witnesses means
    // this round's output IS g and the loop may stop. (Detection shifts
    // from the round's output to its midpoint; a component whose forest
    // is first produced by the large-star half pays one extra — cheap,
    // identity — round, while every earlier round saves its probe job.)
    def largeStarAudited(g: DataFrame, obs: Observation): DataFrame = {
      val sym = g.select(col("u"), col("v"), lit(1L).as("__c"))
        .unionByName(
          g.select(col("v").as("u"), col("u").as("v"), lit(0L).as("__c")))
      val mins = sym.groupBy("u")
        .agg(min("v").as("mn"), sum(col("__c")).as("__cd"),
          sum(lit(1L) - col("__c")).as("__pd"))
        .select(col("u"), least(col("u"), col("mn")).as("m"),
          (col("__cd") > 1 || (col("__cd") > 0 && col("__pd") > 0))
            .as("__viol"))
      // The metric sits on the JOIN OUTPUT, not on mins: mins is the
      // (small, per-node) build side Spark rightly broadcasts, and a
      // CollectMetrics node inside a broadcast subtree silently reports
      // zeros (see observeOversize) — which here would fake a convergence
      // verdict. On the probe side every mins row reappears (each node has
      // ≥1 incident sym row), so summing the flag WITH edge multiplicity
      // is still exactly zero iff g is a star forest. Placed BEFORE the
      // v > u filter so nodes whose edges all point down stay visible;
      // CollectMetrics is a pushdown barrier, so the filter cannot slide
      // above it.
      sym.join(mins, "u")
        .observe(obs,
          coalesce(sum(when(col("__viol"), 1L)), lit(0L)).as("witnesses"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // The round's verdict: the observation completed with the checkpoint
    // action just above; poll briefly (defensive: never deadlock on an
    // exotic plan change), then fall back to the explicit probe of the
    // same frame the metric described.
    def ccRoundConverged(obs: Observation, ss: DataFrame): Boolean = {
      import scala.concurrent.{Await, Future, TimeoutException}
      import scala.concurrent.duration.DurationInt
      try {
        val m = Await.result(
          Future(obs.get)(scala.concurrent.ExecutionContext.global), 10.seconds)
        m.get("witnesses") match {
          case Some(w: java.lang.Long) => w == 0L
          case _ => isStarForest(ss)
        }
      } catch { case _: TimeoutException => isStarForest(ss) }
    }

    // small-star: edges already point large→small, so per node u all
    // neighbors are < u and m = min(Γ(u)); rewire u and each non-min
    // neighbor to m. Emitted edges again satisfy u > v (m is the minimum).
    def smallStar(g: DataFrame): DataFrame = {
      val mins = g.groupBy("u").agg(min("v").as("m"))
      g.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }

    // Small-star FIRST: a verified-duplicate graph is a union of dense
    // near-cliques, where most nodes already touch their component min —
    // small-star hangs them all off it in the opening phase, converging a
    // full round earlier than the large-star-first order (measured 2 vs 3
    // rounds on the sf0.1 template-cluster corpus). Either order is
    // correct: both phases preserve connectivity and the certificate, not
    // the phase order, decides termination.
    // No pre-loop probe: real edge lists are almost never already stars,
    // so probing before the first round is a wasted job in the common
    // case; an already-star input just pays one no-op round instead.
    // Bounded local finish: the graph is checkpointed at every loop head,
    // so the count is a cheap cached-scan job; once it fits the bound the
    // driver-side union-find replaces the remaining rounds — on a
    // contracted near-clique graph those are 2+ rounds of pure stage
    // overhead over a few hundred edges. Long-keyed graphs only (every
    // dedup pipeline keys on long ids); other key types stay distributed.
    val localFinishable = localFinishEdges > 0 &&
      e.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.LongType)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      if (localFinishable && e.count() <= localFinishEdges)
        return ccLocalFinish(e)
      val ss = smallStar(e)
      val obs = Observation(s"graft_cc_audit_${obsCounter.incrementAndGet()}")
      e = largeStarAudited(ss, obs).localCheckpoint()
      converged = ccRoundConverged(obs, ss)
      iter += 1
    }
    // a silent partial result would hand out "keepers" that are not roots —
    // fail loudly so the caller raises maxIter instead
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds " +
        "(pathological component shape) — raise maxIter")
    // at the fixpoint every edge is (member, component-min root); roots
    // themselves appear only on the v side
    e.select(col("u").as("id"), col("v").as("component"))
      .unionByName(e.select(col("v").as("id"), col("v").as("component")))
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Min-label propagation CC — the formulation oracle for
    * [[connectedComponents]] (one shuffle join per iteration, O(diameter)
    * iterations; kept for cross-checking the star-contraction path on
    * arbitrary graphs, not for production use). */
  def connectedComponentsMinLabel(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 10): DataFrame = {
    val sym = edges.select(col(srcCol).as("id"), col(dstCol).as("nbr"))
      .unionByName(edges.select(col(dstCol).as("id"), col(srcCol).as("nbr")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    // labels only ever DECREASE (min-propagation), so the label sum is
    // strictly monotone until fixpoint: one cheap agg per iteration
    // replaces a join-diff convergence check (decimal: no wrap collisions)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = sym.as("e")
        .join(labels.as("lb"), col("e.nbr") === col("lb.id"))
        .select(col("e.id").as("id"), col("lb.component").as("component"))
      val next = labels.select(col("id"), col("component"))
        .unionByName(msgs)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    require(converged,
      s"connectedComponentsMinLabel did not converge within $maxIter " +
        "iterations (component diameter too large) — raise maxIter")
    labels
  }

  /** Transitive near-dup keepers: like `nearDupKeepers` but duplicate
    * CHAINS collapse to one keeper (A≈B and B≈C puts C with A even when
    * A,C never share a bucket) — the semantics corpus-level dedup actually
    * wants. */
  def nearDupKeepersTransitive(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, rowsPerBand: Int, threshold: Double, maxIter: Int = 10,
      hashFn: (Column, Int) => Column = oracleHash): DataFrame =
    collapsedRun(df, idCol, textCol) { reps =>
      transitiveKeepersFromSigs(reps,
        minhashSignature(reps, idCol, textCol, numHashes, hashFn),
        idCol, textCol, numHashes, rowsPerBand, threshold, maxIter)
    }

  /** Transitive near-dup keepers that keep the BEST document of each
    * duplicate cluster instead of the smallest id — what production
    * pipelines actually retain (highest quality score, longest text,
    * freshest crawl). Components come from the same star-contraction CC;
    * the winner of each component is argmax(`scoreCol`), ties to the
    * lowest id. Returns (doc_id, keeper_id) where keeper_id is the
    * winning MEMBER of the doc's component.
    *
    * Scale shape: one groupBy over the component labels (map-side
    * `max_by` partials) + an equi-join of the member frame against the
    * component-count-sized winner frame — nothing beyond the CC run
    * itself. NULL scores never win (`max_by` ignores null ordering keys)
    * — coalesce a sentinel first if null-scored singletons must keep
    * themselves. */
  def nearDupKeepersBest(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String, numHashes: Int, rowsPerBand: Int, threshold: Double,
      maxIter: Int = 10,
      hashFn: (Column, Int) => Column = oracleHash): DataFrame = {
    val comp = nearDupKeepersTransitive(df, idCol, textCol, numHashes,
      rowsPerBand, threshold, maxIter, hashFn)
    val scored = comp.join(
      df.select(col(idCol).as("doc_id"), col(scoreCol).as("__s")), "doc_id")
    val winners = scored.groupBy(col("keeper_id").as("__comp"))
      .agg(max_by(col("doc_id"),
        struct(col("__s"), (-col("doc_id")).as("__tb"))).as("__best"))
    scored.join(winners, col("keeper_id") === col("__comp"))
      .select(col("doc_id"), col("__best").as("keeper_id"))
  }

  /** `nearDupKeepersTransitive` in its production-default shape: exact-dup
    * collapse, ZERO-SHUFFLE rowwise signatures, optional mega-bucket cap,
    * star-contraction components. The md5 explode+agg variant above stays
    * the cross-engine-verifiable oracle form (same keepers at threshold
    * 1.0 under any hash family — spec-asserted, q_dedup_keepers_fast
    * precedent). */
  def nearDupKeepersTransitiveRowwise(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int, rowsPerBand: Int, threshold: Double,
      maxIter: Int = 10, maxBucketSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None): DataFrame =
    collapsedRun(df, idCol, textCol) { reps =>
      transitiveKeepersFromSigs(reps,
        minhashSignatureRowwise(reps, idCol, textCol, numHashes),
        idCol, textCol, numHashes, rowsPerBand, threshold, maxIter,
        maxBucketSize, oversizeObs)
    }

  // CC runs over UNIQUE-text edges (collapsedRun fans groups back out):
  // exact-dup clusters never enter the graph, only cross-text links.
  // Edges are ALL verified pairs — reducing to per-doc min-neighbor
  // keepers first would lose links whose only verified neighbors have
  // larger ids (A≈C, B≈C with A<B<C: keeper edges give only A—C,
  // leaving B out of the component its own doc promises it joins).
  // Verified pairs are distinct with id_a < id_b — already the canonical
  // parent-pointer form (src = the larger id), so CC skips the general
  // entry point's canonicalization shuffle.
  private def transitiveKeepersFromSigs(reps: DataFrame, sig: DataFrame,
      idCol: String, textCol: String, numHashes: Int, rowsPerBand: Int,
      threshold: Double, maxIter: Int,
      maxBucketSize: Int = Int.MaxValue,
      oversizeObs: Option[Observation] = None): DataFrame = {
    val pairs = verifiedNearDupPairs(reps, sig,
      idCol, textCol, numHashes, rowsPerBand, threshold, maxBucketSize,
      oversizeObs)
    val comps = connectedComponentsCanonical(
      pairs.select(col("id_b").as("src"), col("id_a").as("dst")),
      "src", "dst", maxIter)
    reps.select(col(idCol).as("doc_id"))
      .join(comps, col("doc_id") === comps("id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("keeper_id"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` (exact verifier
    * for small n / within-ANN-bucket use). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Transitive keepers from an arbitrary verified pair set (id_a < id_b):
    * star-contraction CC closure, fanned back over the id universe (ids
    * with no pair keep themselves). The compose point for ANY pair source
    * — text LSH ([[verifiedNearDupPairs]]), embedding exact or LSH
    * ([[embeddingNearDupPairs]]/[[embeddingNearDupsViaLsh]]), image
    * Hamming bands ([[graft.multimodal.Multimodal.imageNearDupPairs]]).
    * Returns (idCol, keeper_id). */
  def keepersFromPairs(ids: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 10): DataFrame = {
    // comps columns renamed up front: an `ids` frame keyed by the common
    // column name "id" must not collide with CC's (id, component) output
    val comps = connectedComponents(
        pairs.select(col("id_b").as("src"), col("id_a").as("dst")),
        maxIter = maxIter)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    ids.select(col(idCol).cast("long").as(idCol))
      .join(comps, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol), coalesce(col("__cc_comp"), col(idCol)).as("keeper_id"))
  }

  /** Transitive embedding near-dup keepers: duplicate CHAINS collapse to
    * the smallest reachable id via star-contraction CC over the verified
    * cosine pairs — the embedding sibling of
    * [[nearDupKeepersTransitive]]. The threshold cuts on the ROUNDED
    * cosine so the edge set is identical across engines despite sum-order
    * fp noise. Pairs here are the exact small-n verifier; at corpus scale
    * feed [[embeddingNearDupsViaLsh]] pairs through [[keepersFromPairs]]. */
  def embeddingNearDupKeepers(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundTo: Int = 5, maxIter: Int = 10): DataFrame =
    keepersFromPairs(df, idCol,
      embeddingNearDupPairs(df, idCol, vecCol, -2.0)
        .filter(round(col("cos"), roundTo) >= threshold),
      maxIter)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * clustering embeddings and collapsing near-identical vectors WITHIN
    * each cluster — the pairwise cosine never crosses cluster boundaries,
    * so the quadratic cost is (cell size)², not corpus². Cells come from
    * [[graft.ann.Similarity.codebook]] (deterministic id-ordered seeds +
    * `kmeansIters` Lloyd's refinements; the collect is nCentroids rows,
    * bounded) and rows are assigned by the fused codegen'd argmin.
    * Pairs above `threshold` (on the ROUNDED cosine — identical edge set
    * across engines despite sum-order fp noise) close transitively via
    * star-contraction CC; every id keeps the smallest reachable id.
    *
    * Scale shape: choose `nCentroids` so cells hold ~10³ rows (the paper
    * runs n/k ≈ 1 k) — the within-cell join is then an equi-join on the
    * cell id with bounded fan-out. The cap is the same loud guardrail as
    * the LSH mega-buckets: cells larger than `maxCellSize` are dropped
    * WHOLE (under-merge, never a silent corpus²), counted in-pass via
    * [[observeOversize]] and WARN-logged. `kmeansIters = 0` keeps the
    * codebook = the first nCentroids vectors in id order, which an
    * external SQL engine can replay exactly (the oracle path);
    * refinement iterations are for production recall. */
  def semDedupKeepers(df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, kmeansIters: Int, threshold: Double,
      roundTo: Int = 5,
      maxCellSize: Int = DefaultMaxBucketSize,
      oversizeObs: Option[Observation] = None,
      maxIter: Int = 10): DataFrame = {
    import graft.ann.Similarity
    import graft.functions.VectorFunctions
    require(nCentroids > 0, s"nCentroids must be positive, got $nCentroids")
    val assigned = Similarity.withIvfCell(
      df.select(col(idCol), col(vecCol)), vecCol,
      Similarity.codebook(df, idCol, vecCol, nCentroids, kmeansIters))
    val cellCounts = assigned.groupBy(col("ivf_cell"))
      .agg(count(lit(1)).as("__n"))
    val admitted0 =
      if (maxCellSize == Int.MaxValue && oversizeObs.isEmpty) cellCounts
      else {
        val audited = observeOversize(cellCounts, col("__n"), maxCellSize,
          oversizeObs)
        if (maxCellSize == Int.MaxValue) audited
        else audited.filter(col("__n") <= maxCellSize)
      }
    // the observed subtree must not become a broadcast BUILD side (metrics
    // would silently read zero — see observeOversize)
    val auditAttached = maxCellSize != Int.MaxValue || oversizeObs.nonEmpty
    val admitted =
      (if (auditAttached) admitted0.hint("shuffle_hash") else admitted0)
        .select("ivf_cell")
    val inCells = assigned.join(admitted, Seq("ivf_cell"))
    val a = inCells.select(col("ivf_cell"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = inCells.select(col("ivf_cell"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val pairs = a.join(b, Seq("ivf_cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(VectorFunctions.cosine(col("__va"), col("__vb")), roundTo))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
    keepersFromPairs(df.select(col(idCol)), idCol, pairs, maxIter)
  }

  /** Embedding near-dup at corpus scale: random-hyperplane LSH buckets the
    * vectors, exact cosine runs only on same-bucket pairs — an equi-join on
    * the signature instead of a cross join. Near-identical vectors share all
    * sign bits with high probability; recall tunes with fewer bits. */
  def embeddingNearDupsViaLsh(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, nBits: Int = 12, seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions
    val signed = df.select(col(idCol), col(vecCol),
      VectorFunctions.hyperplaneSignature(col(vecCol), dim, nBits, seed).as("__sig"))
    val a = signed.select(col("__sig"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = signed.select(col("__sig"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("__sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
