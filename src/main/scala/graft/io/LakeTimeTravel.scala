package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TIME TRAVEL over the copy-on-write lake (E173) — the snapshot-read /
  * retention half of the table-format feature set ([[LakeMerge]] is the
  * MERGE, [[LakeMerge.compactPartitions]] the OPTIMIZE,
  * [[LakeMerge.readChanges]] the CDF): reproduce the lake exactly as it
  * stood after any retained commit, so "train on the corpus the March
  * run saw" is a read, not an archaeology project.
  *
  * Mechanism — copy-on-write makes this nearly free: a merge/compact
  * run with `retainHistory = true` MOVES each touched partition's
  * pre-image to `_history/seq=N/part=V` during the swap (the same two
  * renames; the pre-image was being renamed anyway — to trash), and
  * every commit appends a record to the `_commits/` log naming the
  * partitions it touched and which of them it CREATED (no pre-image).
  * The log is the source of truth for resolution:
  *
  *  - a partition untouched after `asOfSeq` reads LIVE;
  *  - a partition whose FIRST later toucher (min commit seq > asOfSeq
  *    naming it) retained history reads that commit's pre-image — the
  *    state at every seq since its previous toucher, `asOfSeq` included;
  *  - a partition CREATED by its first later toucher did not exist at
  *    `asOfSeq` and is excluded;
  *  - a first later toucher that did NOT retain (or whose pre-image was
  *    [[vacuum]]ed) refuses LOUDLY — a silent fallback to live would
  *    fabricate a snapshot that never existed.
  *
  * Once the log exists every subsequent commit records itself even when
  * not retaining (the recording rule in [[LakeMerge]]), so the refusal
  * logic always sees the full commit sequence; records are tiny, are
  * never deleted (the audit trail; seq assignment reads max+1 from
  * them), and at 100 TB the log is one small file per publish — the
  * `_delta_log` growth curve, checkpointable the same way if it ever
  * matters. Resolution itself stays plan-cheap: live partitions ride ONE
  * basePath-rooted multi-path scan (partition pruning intact), only the
  * history-resolved few get per-directory reads — the committed-view
  * plan shape. */
object LakeTimeTravel {

  private[io] val HistoryDirName = "_history"
  private[io] val CommitsDirName = "_commits"

  /** One committed writer run, as recorded in `_commits/<seq>.json`. */
  final case class CommitRecord(seq: Long, mergeId: String, op: String,
      partitionCol: String, partitions: Seq[String], created: Seq[String],
      retained: Boolean)

  private def hadoopFs(spark: SparkSession, lakeDir: String): FileSystem =
    new Path(lakeDir).getFileSystem(spark.sessionState.newHadoopConf())

  private[io] def commitsDir(lakeDir: String) = new Path(lakeDir, CommitsDirName)

  private[io] def historyDir(lakeDir: String, seq: Long) =
    new Path(lakeDir, s"$HistoryDirName/seq=$seq")

  /** The next commit sequence number — max recorded + 1 (the writer
    * lease serializes assignment; records are never deleted, so a seq is
    * never reused). */
  private[io] def nextCommitSeq(fs: FileSystem, lakeDir: String): Long = {
    val dir = commitsDir(lakeDir)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max) + 1L
  }

  /** Append the commit record — idempotent (recovery may re-run it while
    * the manifest still pends; an existing record is the same content). */
  private[io] def writeCommitRecord(fs: FileSystem, lakeDir: String,
      r: CommitRecord): Unit = {
    val p = new Path(commitsDir(lakeDir), s"${r.seq}.json")
    if (fs.exists(p)) return
    fs.mkdirs(commitsDir(lakeDir))
    def arr(vs: Seq[String]) = vs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"seq":"${r.seq}","merge_id":"${r.mergeId}","op":"${r.op}",""" +
        s""""partition_col":"${r.partitionCol}",""" +
        s""""retained":"${if (r.retained) "1" else "0"}",""" +
        s""""partitions":${arr(r.partitions)},""" +
        s""""created":${arr(r.created)}}"""
    val tmp = new Path(lakeDir, s".commit-${r.seq}-${r.mergeId}.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, p), s"could not record commit at $p")
  }

  private def strField(txt: String, name: String, where: Path): String =
    ("\"" + name + "\":\"([^\"]*)\"").r.findFirstMatchIn(txt)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"corrupt commit record at $where: missing $name in: $txt"))

  private def listField(txt: String, name: String, where: Path): Seq[String] =
    ("\"" + name + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(txt)
      .map(m => "\"([^\"]*)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      .getOrElse(throw new IllegalStateException(
        s"corrupt commit record at $where: missing $name in: $txt"))

  /** The full commit log, seq-ascending. Driver-side metadata — one tiny
    * file per commit. */
  def readCommits(spark: SparkSession, lakeDir: String): Seq[CommitRecord] = {
    val fs = hadoopFs(spark, lakeDir)
    val dir = commitsDir(lakeDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .map { p =>
        val in = fs.open(p)
        val txt = try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toString("UTF-8")
        } finally in.close()
        CommitRecord(strField(txt, "seq", p).toLong,
          strField(txt, "merge_id", p), strField(txt, "op", p),
          strField(txt, "partition_col", p),
          listField(txt, "partitions", p), listField(txt, "created", p),
          strField(txt, "retained", p) == "1")
      }
      .sortBy(_.seq)
  }

  private def escapeGlob(s: String): String =
    s.flatMap { c =>
      if ("*?[]{}\\".indexOf(c.toInt) >= 0) s"\\$c" else c.toString
    }

  /** Read the lake EXACTLY as it stood after commit `asOfSeq`
    * (`asOfSeq = -1` is the state before the first recorded commit).
    * Works while a later merge pends mid-swap — the pending commit's
    * pre-images resolve through history, the still-unswapped ones
    * through live, exactly the committed-view discipline — and refuses
    * loudly when the pre-image chain after `asOfSeq` is broken (a
    * non-retaining commit, or a [[vacuum]]ed one). */
  def readLakeAsOf(spark: SparkSession, lakeDir: String, asOfSeq: Long,
      partitionCol: String = "part_date"): DataFrame = {
    val fs = hadoopFs(spark, lakeDir)
    val recorded = readCommits(spark, lakeDir)
    require(recorded.nonEmpty,
      s"no commit log at $lakeDir/$CommitsDirName — run merges with " +
        "retainHistory = true to enable time travel")
    // a pending manifest is a committed-but-unswapped commit; once the
    // log exists every writer records, so it must carry a seq
    val pending = LakeMerge.readManifest(fs, lakeDir)
    val pendingRec = pending.map { m =>
      val seq = m.histSeq.getOrElse(throw new IllegalStateException(
        s"pending merge ${m.mergeId} carries no commit seq although the " +
          "lake has a commit log — manifest written by an older writer?"))
      CommitRecord(seq, m.mergeId, m.op, m.partitionCol, m.partitions,
        m.created, m.retainHist)
    }
    val commits = (recorded ++ pendingRec).sortBy(_.seq)
    require(asOfSeq >= -1L && asOfSeq <= commits.last.seq,
      s"asOfSeq $asOfSeq out of range: the log records commits " +
        s"0..${commits.last.seq}")
    commits.filter(_.seq > asOfSeq).foreach { c =>
      require(c.partitionCol == partitionCol,
        s"commit ${c.seq} partitions by '${c.partitionCol}' but the read " +
          s"asked for '$partitionCol'")
    }

    val later = commits.filter(_.seq > asOfSeq)
    val touchedFirst: Map[String, CommitRecord] =
      later.flatMap(c => c.partitions.map(_ -> c))
        .groupBy(_._1).map { case (v, cs) => v -> cs.minBy(_._2.seq)._2 }

    // partitions of an INCLUDED pending commit (handled below) may not be
    // live yet (swap pending), and a fully-swapped pending partition that
    // was CREATED later must still be classified (and excluded) — union
    // all three views of the partition set
    val liveVals = LakeMerge.partitionValues(spark, lakeDir, partitionCol)
    val allVals = (liveVals ++ touchedFirst.keys ++
      pendingRec.filter(_.seq <= asOfSeq).toSeq.flatMap(_.partitions))
      .distinct.sorted

    // partitions of an INCLUDED pending commit (pendingSeq ≤ asOfSeq) are
    // mid-swap: the committed content is the staged copy where the swap
    // has not landed — the readLake committed-view resolution
    val pendingIncluded: Set[String] = pendingRec
      .filter(_.seq <= asOfSeq).map(_.partitions.toSet)
      .getOrElse(Set.empty)

    final case class Sources(liveDirs: Vector[String],
        litDirs: Vector[(String, String)]) // (dir, restoredValue)
    val resolved = allVals.foldLeft(Sources(Vector.empty, Vector.empty)) {
      (acc, v) =>
        touchedFirst.get(v) match {
          case None if pendingIncluded.contains(v) =>
            val staged = new Path(new Path(lakeDir, pending.get.staging),
              s"$partitionCol=$v")
            val dir = if (fs.exists(staged)) staged.toString
                      else s"$lakeDir/$partitionCol=$v"
            acc.copy(litDirs = acc.litDirs :+ ((dir, v)))
          case None =>
            acc.copy(liveDirs = acc.liveDirs :+
              escapeGlob(s"$lakeDir/$partitionCol=$v"))
          case Some(c) if c.created.contains(v) =>
            acc // did not exist at asOfSeq
          case Some(c) =>
            require(c.retained,
              s"cannot read as of seq $asOfSeq: commit ${c.seq} (${c.op}) " +
                s"touched $partitionCol=$v without retaining history — " +
                "re-run writers with retainHistory = true to keep " +
                "snapshots readable")
            val hist = new Path(historyDir(lakeDir, c.seq), s"$partitionCol=$v")
            if (fs.exists(hist))
              acc.copy(litDirs = acc.litDirs :+ ((hist.toString, v)))
            else if (pendingRec.exists(_.seq == c.seq) &&
                fs.exists(new Path(new Path(lakeDir, pending.get.staging),
                  s"$partitionCol=$v")))
              // the pending commit has not swapped this partition yet —
              // live still IS the pre-image
              acc.copy(litDirs = acc.litDirs :+
                ((s"$lakeDir/$partitionCol=$v", v)))
            else throw new IllegalStateException(
              s"cannot read as of seq $asOfSeq: commit ${c.seq}'s " +
                s"pre-image of $partitionCol=$v was vacuumed — " +
                "snapshots older than the vacuum horizon are gone")
        }
    }
    val liveFrame =
      if (resolved.liveDirs.isEmpty) None
      else Some(spark.read.option("basePath", lakeDir)
        .parquet(resolved.liveDirs: _*)
        .withColumn(partitionCol, col(partitionCol).cast("string")))
    val litFrames = resolved.litDirs.map { case (dir, v) =>
      spark.read.parquet(escapeGlob(dir))
        .withColumn(partitionCol, lit(v))
    }
    val frames = liveFrame.toVector ++ litFrames
    require(frames.nonEmpty,
      s"the lake had no partitions at seq $asOfSeq")
    frames.reduce(_ unionByName _)
  }

  /** Drop the pre-images needed only by snapshots OLDER than
    * `oldestAsOf` — every `_history/seq=N` with N ≤ `oldestAsOf` (a
    * snapshot at `asOfSeq ≥ oldestAsOf` resolves only through commits
    * with seq > asOfSeq ≥ oldestAsOf, all kept). Commit records are
    * NEVER deleted: they are the audit trail, seq assignment reads
    * them, and the refusal in [[readLakeAsOf]] needs the full sequence
    * to stay loud. Runs under the writer lease — retention is a write.
    * Returns the number of history directories removed. */
  def vacuum(spark: SparkSession, lakeDir: String, oldestAsOf: Long,
      leaseStaleMs: Long = 15L * 60 * 1000): Int = {
    val fs = hadoopFs(spark, lakeDir)
    val writerId = java.util.UUID.randomUUID.toString
    LakeMerge.acquireLease(fs, lakeDir, writerId, leaseStaleMs)
    try {
      // heal any crashed writer first: deleting a PENDING commit's
      // half-written history dir would leave its recovery with nowhere
      // to park the remaining pre-images' deterministic names
      LakeMerge.recover(spark, lakeDir)
      val root = new Path(lakeDir, HistoryDirName)
      if (!fs.exists(root)) 0
      else {
        val victims = fs.listStatus(root).toSeq
          .map(_.getPath)
          .filter(_.getName.startsWith("seq="))
          .filter(_.getName.stripPrefix("seq=").toLong <= oldestAsOf)
        victims.foreach(p => fs.delete(p, true))
        victims.length
      }
    } finally LakeMerge.releaseLease(fs, lakeDir, writerId)
  }
}
