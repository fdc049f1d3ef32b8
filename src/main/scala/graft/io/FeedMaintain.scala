package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE MAINTENANCE from the lake's change feed
  * (E175) — the consumer-side payoff of capturing changes: a downstream
  * aggregate table (per-source doc counts, token totals, quality-score
  * sums — the dataset-card numbers) stays current by folding each
  * published commit's row images into the previous aggregate, instead of
  * re-scanning 100 TB per publish. This is classic incremental view
  * maintenance restricted to ADDITIVE aggregates (count and sums — the
  * abelian-group case where a row's retraction is its negation; avg and
  * ratios derive from maintained sums at read time):
  *
  *   agg'(g) = agg(g) + Σ_{insert, update_postimage ∈ g} m(row)
  *                    − Σ_{update_preimage, delete ∈ g}  m(row)
  *
  * which is why the feed carries full pre-images: the preimage IS the
  * retraction certificate — without it an update could not be subtracted
  * from the group it leaves.
  *
  * Equivalence contract (the oracle, q_agg_maintain): maintaining the
  * snapshot-0 aggregate through any feed sequence equals the direct
  * recompute over the final snapshot — EXACTLY for integer measures
  * (counts, lengths, token counts; float sums agree only up to addition
  * order, the standard IVM caveat). A group whose rows all retract
  * vanishes (n_rows reaches 0), exactly as the direct recompute would
  * never emit it.
  *
  * Plan shape at 100 TB: the delta aggregate shuffles the FEED (commit-
  * sized), never the lake; the previous aggregate is groups-sized; one
  * union + one map-side-combined groupBy merges them. Maintaining across
  * N commits is N feed-sized folds — or one, since [[LakeMerge.readChanges]]
  * returns the commits unioned and the fold is associative. */
object FeedMaintain {

  /** The additive aggregate of a snapshot: one row per group,
    * `n_rows` plus one summed column per measure. `measures` maps each
    * output column name to its per-row expression — integer-typed
    * expressions keep the maintenance equivalence exact (cast to long
    * here so snapshot and delta sides sum in the same type). */
  def snapshotAgg(df: DataFrame, groupCols: Seq[String],
      measures: Seq[(String, Column)]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        measures.map { case (n, e) => sum(e.cast("long")).as(n) }: _*)

  /** The ±1 multiplicity of one feed row: additions count forward,
    * retractions backward. An unrecognized change type refuses LOUDLY at
    * evaluation (a silently dropped type would make the maintained
    * aggregate drift from the lake — the failure mode IVM must never
    * have). */
  private[graft] def signExpr: Column =
    when(col(LakeMerge.ChangeTypeCol)
        .isin("insert", "update_postimage"), lit(1L))
      .when(col(LakeMerge.ChangeTypeCol)
        .isin("update_preimage", "delete"), lit(-1L))
      .otherwise(coalesce(
        assert_true(lit(false),
          concat(lit("FeedMaintain: unknown change type '"),
            col(LakeMerge.ChangeTypeCol), lit("'"))).cast("long"),
        lit(0L)))

  /** Fold `changes` (one or more commits of a [[LakeMerge.readChanges]]
    * feed — any frame carrying [[LakeMerge.ChangeTypeCol]] plus the
    * lake's columns) into a previously computed [[snapshotAgg]].
    * `groupCols`/`measures` must be the ones the aggregate was built
    * with. Returns the maintained aggregate, same schema. Pure-frame
    * form; [[foldInto]] is the stored/effectively-once twin. */
  def maintain(agg: DataFrame, changes: DataFrame, groupCols: Seq[String],
      measures: Seq[(String, Column)]): DataFrame = {
    val names = measures.map(_._1)
    require(agg.columns.contains("n_rows") &&
        names.forall(agg.columns.contains),
      s"aggregate must carry n_rows and every measure column " +
        s"(${names.mkString(", ")}) — build it with snapshotAgg, got " +
        agg.columns.mkString(", "))
    val sign = signExpr
    val deltas = changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        measures.map { case (n, e) =>
          sum(sign * e.cast("long")).as(n)
        }: _*)
    val cols = groupCols.map(col) ++ ("n_rows" +: names).map(col)
    agg.select(cols: _*).unionByName(deltas.select(cols: _*))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        names.map(n => sum(col(n)).as(n)): _*)
      .filter(col("n_rows") > 0)
  }

  // ---- the aggregate MAINTAINED ON DISK (E176: the streaming consumer) --

  /** Initialize a stored maintained aggregate at `aggDir` from a
    * snapshot: [[snapshotAgg]] stamped with `as_of_seq` — the change-feed
    * seq the snapshot already INCLUDES (−1 for a snapshot taken before
    * any captured commit). The stamp is the fold's idempotency
    * watermark; get it wrong and the aggregate double-counts or skips a
    * commit, so seed from a snapshot read in the same lease-quiet moment
    * the seq was observed. Refuses to overwrite an existing aggregate. */
  def seedAggregate(snapshot: DataFrame, aggDir: String,
      groupCols: Seq[String], measures: Seq[(String, Column)],
      asOfSeq: Long = -1L): Unit =
    snapshotAgg(snapshot, groupCols, measures)
      .withColumn("as_of_seq", lit(asOfSeq))
      .write.mode("errorifexists").parquet(aggDir)

  /** Read the stored aggregate, resolved through any mid-replacement
    * state without mutating ([[LakeMerge.resolveReplacedDir]] — the
    * reader discipline shared with the lake-maintained integrity
    * manifest). */
  def readAggregate(spark: org.apache.spark.sql.SparkSession,
      aggDir: String): DataFrame = {
    val live = new org.apache.hadoop.fs.Path(aggDir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = LakeMerge.resolveReplacedDir(fs, live)
    require(fs.exists(dir),
      s"no maintained aggregate at $aggDir — seed it with seedAggregate")
    spark.read.parquet(dir.toString)
  }

  /** Fold one delivered slice of the change feed (rows carrying a `seq`
    * column — a [[graft.streaming.StreamOps.changesStream]] micro-batch,
    * or a [[LakeMerge.readChanges]] read) into the STORED aggregate at
    * `aggDir`, EFFECTIVELY ONCE: rows with `seq` ≤ the stored
    * `as_of_seq` stamp are dropped before the fold, so an at-least-once
    * redelivery (foreachBatch crash-replay, a restarted stream with a
    * fresh checkpoint) is a no-op instead of a double-count — the
    * additive fold is not idempotent by itself, the watermark makes it
    * so. The refreshed aggregate swaps in atomically
    * ([[LakeMerge.atomicReplaceDir]]); a crash mid-swap heals at the
    * next fold (writer-side recover — single-consumer contract, like
    * every stored-artifact writer here). Whole feed COMMITS must be the
    * delivery unit: a `_changes/seq=N` directory appears atomically
    * (one rename) and the default file source lists all its files into
    * one batch — do not set `maxFilesPerTrigger` on a feed consumer, it
    * could split a commit, and the contiguity check below refuses the
    * torn slice loudly. The same check catches a feed vacuumed past
    * this consumer's watermark. */
  def foldInto(changes: DataFrame, aggDir: String, groupCols: Seq[String],
      measures: Seq[(String, Column)]): Unit =
    foldStoredSlice(changes, aggDir, "seedAggregate")((agg, fresh) =>
      maintain(agg, fresh, groupCols, measures))

  /** The stored-fold DISCIPLINE shared by every feed-maintained artifact
    * (the additive aggregate above, the exact-dedup keeper state in
    * [[graft.dedup.Dedup.foldKeeperStateInto]]): resolve any
    * mid-replacement state, drop already-folded commits by the
    * `as_of_seq` watermark (effectively-once under at-least-once
    * delivery), REFUSE feed gaps loudly, fold, stamp, atomic-swap. */
  private[graft] def foldStoredSlice(changes: DataFrame, dir: String,
      seeder: String)(fold: (DataFrame, DataFrame) => DataFrame): Unit = {
    val spark = changes.sparkSession
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    LakeMerge.recoverReplacedDir(fs, live)
    require(fs.exists(live),
      s"no maintained state at $dir — seed it with $seeder")
    val agg = spark.read.parquet(live.toString)
    val seqRow = agg.agg(max(col("as_of_seq"))).head()
    // an EMPTY stored state has no watermark row — folding from a
    // guessed seq could double-count, so refuse loudly (it can only
    // happen from an empty seed snapshot; re-seed at a known seq)
    require(!seqRow.isNullAt(0),
      s"maintained state at $dir is empty — its as_of_seq " +
        "watermark is gone; re-seed it from a snapshot")
    val storedSeq = seqRow.getLong(0)
    val fresh = changes.withColumn("seq", col("seq").cast("long"))
      .filter(col("seq") > storedSeq)
      .localCheckpoint(true) // evaluated twice (seq probe + fold)
    try {
      // GAP DETECTION (review finding): published seqs are DENSE (max+1
      // assignment; producers skip empty commits), so the slice must
      // start at watermark+1 and hold a contiguous run — a hole means
      // vacuumChanges passed this consumer's watermark, a commit was
      // split across deliveries (maxFilesPerTrigger — see above), or a
      // pre-r15-review producer published an empty commit; folding past
      // it would make the aggregate silently wrong forever, the one
      // failure IVM must never have. Delta CDF likewise throws on reads
      // past the retention horizon. ONE commit-count-sized probe serves
      // the check and both watermark bounds.
      val seqs = fresh.select(col("seq")).distinct()
        .collect().map(_.getLong(0)).sorted
      if (seqs.nonEmpty) {
        require(seqs.head == storedSeq + 1 &&
            seqs.zip(seqs.tail).forall { case (a, b) => b == a + 1 },
          s"change-feed gap: the aggregate's watermark is $storedSeq but " +
            s"the delivered commits are ${seqs.mkString(",")} — the feed " +
            "was vacuumed past this consumer (re-seed from a snapshot), " +
            "a commit was split across deliveries (never set " +
            "maxFilesPerTrigger on a feed consumer), or an old producer " +
            "published an empty commit (vacuum past it)")
        val maintained = fold(agg.drop("as_of_seq"), fresh)
          .withColumn("as_of_seq", lit(seqs.last))
          .localCheckpoint(true) // must not re-read aggDir mid-swap
        try LakeMerge.atomicReplaceDir(fs, live) { tmp =>
          maintained.write.mode("overwrite").parquet(tmp.toString)
        } finally maintained.unpersist()
      }
    } finally fresh.unpersist()
  }
}
