package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE upsert over a partitioned parquet series lake —
  * the file-sink half of K2 (SURVEY.md §1.5: the reference's
  * `insert_data(timeseries, tms_id, fgt, upsert=True)` keyed
  * `(tms_id, fgt, time)`, reference output/extract_water_level.py:206-217,
  * maps to MySQL ON DUPLICATE KEY UPDATE at station count and to a
  * Delta-style MERGE over a partitioned lake at 100 TB).
  *
  * Layout contract (the [[SeriesLake]] layout re-expressed for a
  * path-based lake): one directory per event date
  * (`part_date=yyyy-MM-dd/`), files within a partition clustered and
  * sorted by `(tms_id, time)` — date pruning serves the reference's
  * ubiquitous `[start, end]` scans, series clustering keeps per-series
  * reads to a handful of files. Metastore `bucketBy` metadata cannot
  * survive a directory swap (Spark records bucketing in the catalog, not
  * the files — Delta/Iceberg move that metadata into a transaction log,
  * which is the production upgrade path), so the merge reproduces the
  * CLUSTERING physically (`repartition` by series + sort within files)
  * without the catalog entry.
  *
  * Merge algorithm — the standard copy-on-write shape:
  *
  *  1. PRUNE: the affected partition set is `updates`' distinct partition
  *     values (collected — bounded by the date span of one extraction,
  *     a handful of values for the reference's daily runs);
  *  2. REWRITE: only those partitions are read back (explicit per-
  *     directory reads — never a full-lake scan), matched rows removed
  *     with a BROADCAST anti-join on the key (an extraction batch is
  *     always dimension-sized next to the lake), updates unioned in, and
  *     the result staged under a dot-prefixed directory Spark readers
  *     ignore;
  *  3. SWAP: each affected partition directory is atomically renamed
  *     into place (old → trash, staged → live, trash deleted — rename is
  *     the atomic primitive on HDFS/POSIX; on rename-less object stores
  *     this step is where a manifest commit would substitute). Untouched
  *     partitions are never read, rewritten, or moved — the property
  *     [[graft.ScaleSmoke]] measures as partitions-rewritten ≪ total.
  *
  * Idempotency contract (K2): the merge is exactly-once-by-key — re-
  * applying the same update batch, or overlapping re-extractions,
  * converge to the same table a JDBC upsert would produce
  * (LakeMergeSpec proves equality against [[JdbcUpsertSink]] on the same
  * batches). `updates` must be unique by key with no NULL key values and
  * a partition column agreeing with its derivation — all checked with
  * batch-sized aggregates over an entry `localCheckpoint` (ONE
  * evaluation of the batch lineage for the whole merge) unless
  * `requireUniqueKeys = false`: duplicate keys in ONE batch have no
  * defined winner in any upsert dialect — MySQL takes statement order,
  * which a distributed write cannot reproduce — and NULL keys never
  * equi-join, so re-applying a batch would duplicate them forever.
  */
object LakeMerge {

  final case class MergeStats(partitionsTotal: Int, partitionsRewritten: Int,
      rowsBeforeAffected: Long, rowsUpserted: Long, rowsUpdated: Long,
      rowsInserted: Long, rowsAfterAffected: Long)

  /** Derive the lake partition column from an event-time column — one
    * date directory per day, matching the reference's scan axis. */
  def withPartDate(df: DataFrame, timeCol: String = "time",
      partitionCol: String = "part_date"): DataFrame =
    df.withColumn(partitionCol, date_format(col(timeCol), "yyyy-MM-dd"))

  /** Initialize (or fully rewrite) a lake from `df`: date-partitioned
    * parquet, `filesPerPartition` series-clustered sorted files per date. */
  def writeLake(df: DataFrame, lakeDir: String,
      partitionCol: String = "part_date", seriesCol: String = "tms_id",
      timeCol: String = "time", filesPerPartition: Int = 4): Unit =
    df.repartition(filesPerPartition, col(partitionCol), col(seriesCol))
      .sortWithinPartitions(partitionCol, seriesCol, timeCol)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(lakeDir)

  /** Read the whole lake with the partition column restored AS STRING
    * (yyyy-MM-dd), independent of Spark's partition-type inference. */
  def readLake(spark: SparkSession, lakeDir: String,
      partitionCol: String = "part_date"): DataFrame =
    spark.read.parquet(lakeDir)
      .withColumn(partitionCol, col(partitionCol).cast("string"))

  /** The partition directory values present on disk. */
  def partitionValues(spark: SparkSession, lakeDir: String,
      partitionCol: String = "part_date"): Seq[String] = {
    val root = new Path(lakeDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(partitionCol + "="))
      .map(_.stripPrefix(partitionCol + "="))
      .sorted
  }

  /** Explicit pruned read of the named partitions: one read per affected
    * directory with the partition value restored as a literal — never a
    * full-lake scan, and immune to partition-column type inference
    * (a date-shaped string would otherwise read back as DATE and poison
    * the union with `updates`). Empty selection → empty frame shaped
    * like `updates` minus nothing (caller guards). */
  private def readPartitions(spark: SparkSession, lakeDir: String,
      partitionCol: String, values: Seq[String]): Option[DataFrame] = {
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val existing = values.filter(v =>
      fs.exists(new Path(lakeDir, s"$partitionCol=$v")))
    if (existing.isEmpty) None
    else Some(existing.map { v =>
      spark.read.parquet(s"$lakeDir/$partitionCol=$v")
        .withColumn(partitionCol, lit(v))
    }.reduce(_ unionByName _))
  }

  /** MERGE `updates` into the lake at `lakeDir`, keyed `keyCols` —
    * matched keys take the update row, unmatched insert. `updates` must
    * carry `partitionCol` (see [[withPartDate]]) and the lake's exact
    * column set. Returns per-merge stats; all counts ride parquet
    * footers / the staged write, never an extra data scan. */
  def merge(spark: SparkSession, lakeDir: String, updates: DataFrame,
      keyCols: Seq[String] = Seq("tms_id", "fgt", "time"),
      partitionCol: String = "part_date", seriesCol: String = "tms_id",
      timeCol: String = "time", filesPerPartition: Int = 4,
      requireUniqueKeys: Boolean = true): MergeStats = {
    require(updates.columns.contains(partitionCol),
      s"updates must carry the lake partition column '$partitionCol' " +
        "(derive it with LakeMerge.withPartDate)")
    val allParts = partitionValues(spark, lakeDir, partitionCol)
    require(allParts.nonEmpty,
      s"no lake at $lakeDir — initialize with LakeMerge.writeLake")
    val lakeCols = readLake(spark, lakeDir, partitionCol).columns.sorted.toSeq
    require(updates.columns.sorted.toSeq == lakeCols,
      s"updates columns ${updates.columns.sorted.mkString(",")} must match " +
        s"lake columns ${lakeCols.mkString(",")}")

    // evaluate the batch ONCE: the validations, counts, anti-join and
    // staging write below are ~6 actions, and an un-cached `updates`
    // (typically the tail of an extraction pipeline) would re-run its
    // full lineage for each — the merge's cost must scale with the date
    // span, not 6× the batch's production cost (second-review finding).
    // Batch-sized by contract, released before return.
    val upd = updates.localCheckpoint(true)
    try {

    if (requireUniqueKeys) {
      // NULL key columns break exactly-once-by-key at its root: the
      // anti-join's EqualTo never matches NULL, so a re-applied batch
      // would INSERT its null-key rows again every run (the JDBC sink's
      // PRIMARY KEY rejects them loudly; so do we) — and a NULL timeCol
      // would also fail the derivation check OPEN (=!= on NULL is NULL,
      // filter drops it). Second-review finding.
      val nullKeys = upd.filter(
        keyCols.map(col(_).isNull).reduce(_ || _)).limit(1).count()
      require(nullKeys == 0L,
        s"updates contain NULL (${keyCols.mkString(", ")}) key values — " +
          "no upsert key may be NULL (re-applying the batch would " +
          "duplicate such rows: NULL never equi-joins)")
      val dup = upd.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1).limit(1).count()
      require(dup == 0L,
        s"updates contain duplicate (${keyCols.mkString(", ")}) keys — " +
          "no upsert dialect defines a winner inside one batch")
      // the partition value must agree with the layout's derivation: a
      // mis-derived part_date (different session timezone, hand-set)
      // would prune to the WRONG partition, miss the existing key in the
      // anti-join and silently INSERT a duplicate — breaking
      // exactly-once-by-key (review-pass finding). One batch-sized
      // scan; custom layouts whose partition column is not
      // date_format(timeCol) pass requireUniqueKeys = false and own
      // these checks themselves.
      val drifted = upd.filter(
        col(partitionCol).cast("string") =!=
          date_format(col(timeCol), "yyyy-MM-dd")).limit(1).count()
      require(drifted == 0L,
        s"updates carry a $partitionCol that disagrees with " +
          s"date_format($timeCol) — a mis-derived partition would upsert " +
          "into the wrong directory and duplicate its key")
    }

    // 1. PRUNE — the affected partitions are the updates' date span.
    // A NULL partition value must fail HERE, before anything is written:
    // the staging write would name it __HIVE_DEFAULT_PARTITION__ while
    // the swap loop looks for 'part_date=null', throwing only after
    // other partitions already swapped (review-pass finding)
    val affectedRaw = upd.select(col(partitionCol).cast("string"))
      .distinct().collect().map(r => Option(r.getString(0))).toSeq
    require(affectedRaw.forall(_.isDefined),
      s"updates contain NULL $partitionCol values — derive the partition " +
        "from a non-null event time before merging")
    val affected = affectedRaw.flatten.sorted
    val fs = new Path(lakeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())

    // 2. REWRITE into staging (dot-prefixed: invisible to Spark readers)
    val staging = new Path(lakeDir, s".merge-staging-${java.util.UUID.randomUUID}")
    val current = readPartitions(spark, lakeDir, partitionCol, affected)
    val rowsBefore = current.map(_.count()).getOrElse(0L) // footer-count only
    val rowsUpserted = upd.count()
    val merged = current match {
      case Some(cur) =>
        // broadcast anti-join: the extraction batch is dimension-sized
        // next to the lake, so matched-row removal never shuffles the lake
        cur.join(broadcast(upd.select(keyCols.map(col): _*)),
            keyCols, "left_anti")
          .unionByName(upd.select(cur.columns.map(col): _*))
      case None => upd
    }
    merged.repartition(filesPerPartition, col(partitionCol), col(seriesCol))
      .sortWithinPartitions(partitionCol, seriesCol, timeCol)
      .write.mode("overwrite").partitionBy(partitionCol)
      .parquet(staging.toString)
    val rowsAfter =
      spark.read.parquet(staging.toString).count() // footer-count only

    // 3. SWAP — per affected partition: old → trash, staged → live. Each
    // rename is atomic, but the PAIR is not: between the two renames the
    // partition exists in NEITHER location, so a failed second rename
    // ROLLS BACK (trash → live) before surfacing the error, restoring the
    // old data. What this per-partition discipline canNOT give is
    // multi-partition atomicity: a crash mid-LOOP leaves earlier
    // partitions on the new data and later ones on the old — each
    // partition individually consistent, the merge as a whole
    // half-applied. Re-running the same merge converges it (the
    // exactly-once-by-key contract makes the retry safe); a
    // manifest/transaction log (Delta/Iceberg) is the upgrade that makes
    // the whole commit one atomic pointer swing.
    affected.foreach { v =>
      val live = new Path(lakeDir, s"$partitionCol=$v")
      val staged = new Path(staging, s"$partitionCol=$v")
      require(fs.exists(staged),
        s"staged partition $partitionCol=$v missing — staging write failed")
      val trash = new Path(staging, s".old-$partitionCol=$v")
      val hadOld = fs.exists(live)
      if (hadOld) require(fs.rename(live, trash),
        s"could not move old partition $live aside")
      if (!fs.rename(staged, live)) {
        val restored = hadOld && fs.rename(trash, live)
        throw new IllegalStateException(
          s"could not move staged partition $staged into place" +
            (if (hadOld)
              (if (restored) s" — old data ROLLED BACK into $live"
               else s" — ROLLBACK ALSO FAILED: old data is at $trash")
             else ""))
      }
    }
    fs.delete(staging, true)

    // updated = keys that existed before (rows replaced in place);
    // inserted = net new rows. Both derive from the three footer counts.
    val rowsUpdated = rowsBefore + rowsUpserted - rowsAfter
    MergeStats(allParts.length, affected.length, rowsBefore, rowsUpserted,
      rowsUpdated, rowsUpserted - rowsUpdated, rowsAfter)

    // release the entry checkpoint — every action above has completed
    } finally upd.unpersist()
  }
}
