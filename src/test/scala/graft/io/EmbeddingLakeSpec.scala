package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ann.Similarity

/** The at-scale ANN claims, asserted on the physical plan: a probe query
  * reads only the probed cells' files (partition pruning), and its result
  * equals brute force restricted to those cells. */
class EmbeddingLakeSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8
  private lazy val vecs: Seq[(Long, Seq[Float])] = (0L until 200L).map { i =>
    val r = new scala.util.Random(i)
    i -> Seq.fill(Dim)(r.nextFloat() * 2 - 1)
  }

  test("probe query prunes partitions to the probed cells and reranks exactly") {
    val path = Files.createTempDirectory("embedding_lake").toString + "/emb"
    val df = vecs.toDF("vec_id", "embedding")
    val codebook = EmbeddingLake.writePartitioned(
      df, "vec_id", "embedding", path, nCentroids = 8, kmeansIters = 1)

    val q = vecs(5)._2
    val probed = EmbeddingLake.probeTopK(spark, path, codebook,
      "vec_id", "embedding", q, k = 5, nProbe = 2)

    // pruning: the probe plan lists strictly fewer files than the full scan
    val allFiles = EmbeddingLake.filesRead(EmbeddingLake.read(spark, path))
    val probeFiles = EmbeddingLake.filesRead(probed)
    assert(probeFiles < allFiles,
      s"probe read $probeFiles of $allFiles files - no pruning happened")
    // 8 cells, 2 probed: at one file per cell partition this is 1/4
    assert(probeFiles <= allFiles / 2)

    // correctness: equals brute force over the probed cells
    val probes = codebook.indices
      .sortBy(i => Similarity.l2Local(q, codebook(i))).take(2)
    val expected = Similarity.bruteForceTopK(
      Similarity.withIvfCell(df, "embedding", codebook)
        .filter(col("ivf_cell").isin(probes: _*)),
      "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(probed.collect().map(_.getLong(0)).toSeq == expected)
  }

  test("IVFADC: code scan is partition-pruned AND column-pruned; full probe equals exact") {
    val path = Files.createTempDirectory("embedding_lake_pq").toString + "/emb"
    val df = vecs.toDF("vec_id", "embedding")
    val (cells, pq) = EmbeddingLake.writePartitionedPq(
      df, "vec_id", "embedding", path, dim = Dim, nCentroids = 4,
      m = 2, nCodes = 16, kmeansIters = 1, pqIters = 1)

    val q = vecs(9)._2
    // probing EVERY cell with shortlist = corpus makes IVFADC exactly
    // brute force — certifies the code/fetch/rerank machinery end to end
    val full = EmbeddingLake.probeTopKAdc(spark, path, cells, pq,
      "vec_id", "embedding", q, Dim, k = 5, nProbe = 4, shortlist = 200)
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(full.collect().map(_.getLong(0)).toSeq == exact)

    // narrow probe: partition pruning holds
    val narrow = EmbeddingLake.probeTopKAdc(spark, path, cells, pq,
      "vec_id", "embedding", q, Dim, k = 5, nProbe = 1, shortlist = 20)
    narrow.collect()
    val allFiles = EmbeddingLake.filesRead(EmbeddingLake.read(spark, path))
    assert(EmbeddingLake.filesRead(narrow) < allFiles)

    // the ADC candidate stage's scan must NOT read the embedding column —
    // that is the m-bytes-per-row memory story
    val cand = Similarity.pqAdcTopKFromCodes(
      EmbeddingLake.read(spark, path)
        .filter(col("ivf_cell") === 0).select(col("vec_id"), col("pq_code")),
      "vec_id", q, Dim, pq, 5)
    cand.collect()
    val scanSchemas = cand.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSeq
    }
    assert(scanSchemas.nonEmpty && scanSchemas.forall(!_.contains("embedding")),
      s"ADC scan read $scanSchemas — the vector column must stay unread")
  }

  test("append == rebuild at fixed codebooks: identical probes, no file rewrites") {
    val pathA = Files.createTempDirectory("emb_append").toString + "/emb"
    val pathB = Files.createTempDirectory("emb_rebuild").toString + "/emb"
    val (oldVecs, newVecs) = vecs.splitAt(150)
    val dfOld = oldVecs.toDF("vec_id", "embedding")
    val dfNew = newVecs.toDF("vec_id", "embedding")

    // lake A: initial write on the old half, then APPEND the new half
    val codebook = EmbeddingLake.writePartitioned(
      dfOld, "vec_id", "embedding", pathA, nCentroids = 8, kmeansIters = 1)
    def fileSet(p: String): Set[String] = {
      val root = new java.io.File(p)
      root.listFiles().filter(_.isDirectory).flatMap(d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => d.getName + "/" + f.getName + ":" + f.lastModified)).toSet
    }
    val before = fileSet(pathA)
    EmbeddingLake.append(dfNew, "embedding", pathA, codebook)
    val after = fileSet(pathA)
    assert(before.subsetOf(after) && after.size > before.size,
      "append must only ADD files — never rewrite or move existing ones")

    // lake B: full rebuild over ALL vectors with the SAME frozen codebook
    Similarity.withIvfCell(vecs.toDF("vec_id", "embedding"), "embedding",
        codebook)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(pathB)

    // probes over the two lakes are IDENTICAL (assignment is a pure
    // function of (vector, codebook)) — recall parity by construction
    for (qi <- Seq(3, 42, 180)) {
      val q = vecs(qi)._2
      val a = EmbeddingLake.probeTopK(spark, pathA, codebook,
        "vec_id", "embedding", q, k = 7, nProbe = 3)
        .collect().map(_.getLong(0)).toSeq
      val b = EmbeddingLake.probeTopK(spark, pathB, codebook,
        "vec_id", "embedding", q, k = 7, nProbe = 3)
        .collect().map(_.getLong(0)).toSeq
      assert(a == b, s"query $qi diverged: appended=$a rebuilt=$b")
    }
    // and the grown lake still prunes
    val probed = EmbeddingLake.probeTopK(spark, pathA, codebook,
      "vec_id", "embedding", vecs(3)._2, k = 7, nProbe = 3)
    assert(EmbeddingLake.filesRead(probed) <
      EmbeddingLake.filesRead(EmbeddingLake.read(spark, pathA)))

    // r15: incremental manifest maintenance across an append — recompute
    // ONLY the cells the appended vectors landed in, splice into the
    // pre-append manifest, and land hash-exact on the full recompute.
    // A SMALL batch (3 vectors) so the touched set is a strict subset of
    // the cells and the partition-pruning claim is non-vacuous.
    val pathC = Files.createTempDirectory("emb_incmf").toString + "/emb"
    val cbC = EmbeddingLake.writePartitioned(dfOld, "vec_id", "embedding",
      pathC, nCentroids = 8, kmeansIters = 1)
    val mPre = IntegrityManifest.embeddingManifest(
      EmbeddingLake.read(spark, pathC), "vec_id", "embedding")
      .localCheckpoint(true)
    val small = dfNew.limit(3)
    EmbeddingLake.append(small, "embedding", pathC, cbC)
    val touched = Similarity.withIvfCell(small, "embedding", cbC)
      .select("ivf_cell").distinct().collect().map(_.getInt(0)).toSeq
    assert(touched.size < 8, s"fixture: 3 vectors must not touch all cells")
    val lakeNow = EmbeddingLake.read(spark, pathC)
    val inc = IntegrityManifest.embeddingManifestUpdated(
      mPre, lakeNow, touched, "vec_id", "embedding")
    val full = IntegrityManifest.embeddingManifest(lakeNow, "vec_id", "embedding")
    assert(inc.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet === full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet,
      "incremental embedding manifest must equal the full recompute")
    // the cell filter IS a partition filter: the recompute reads only the
    // touched directories (file-listing-level pruning)
    val prunedScan = lakeNow.filter(col("ivf_cell").isin(touched: _*))
    assert(EmbeddingLake.filesRead(prunedScan) <
      EmbeddingLake.filesRead(lakeNow),
      "the incremental recompute's cell filter must prune at file listing")
    mPre.unpersist()
  }

  test("drift report flags out-of-distribution appends for retrain") {
    val path = Files.createTempDirectory("emb_drift").toString + "/emb"
    val dfOld = vecs.toDF("vec_id", "embedding")
    val codebook = EmbeddingLake.writePartitioned(
      dfOld, "vec_id", "embedding", path, nCentroids = 4, kmeansIters = 1)
    val baseline = EmbeddingLake.driftReport(
      spark, path, "embedding", codebook)
    baseline.collect().foreach(r => assert(r.getLong(1) > 0))

    // in-distribution append: residual stats stay put (same generator)
    val inDist = (1000L until 1100L).map { i =>
      val r = new scala.util.Random(i % 200)
      (i, Seq.fill(Dim)(r.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    EmbeddingLake.append(inDist, "embedding", path, codebook)
    val mid = EmbeddingLake.driftReport(spark, path, "embedding", codebook)
    val calm = EmbeddingLake.retrainAdvice(baseline, mid, growthThreshold = 1.5)
      .filter(col("retrain")).count()
    assert(calm === 0L, "in-distribution appends must not demand a retrain")

    // out-of-distribution append: vectors far from every centroid
    val outDist = (2000L until 2100L).map { i =>
      (i, Seq.fill(Dim)(10.0f + (i % 7)))
    }.toDF("vec_id", "embedding")
    EmbeddingLake.append(outDist, "embedding", path, codebook)
    val cur = EmbeddingLake.driftReport(spark, path, "embedding", codebook)
    val advice = EmbeddingLake.retrainAdvice(baseline, cur, growthThreshold = 1.5)
    assert(advice.filter(col("retrain")).count() > 0,
      "a cell absorbing far-field vectors must flag for retrain")
  }

  test("drift-driven compact: flagged cells split, recall recovers, untouched partitions byte-identical") {
    val path = Files.createTempDirectory("emb_compact").toString + "/emb"
    def noise(seed: Long): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(Dim - 2)(r.nextFloat() * 0.2f - 0.1f)
    }
    // four tight core clusters; ids interleaved so codebook seeding
    // (first-4-by-id) lands one seed per cluster. Geometry is engineered
    // around the L2-probe/cosine-rerank split: C3/C4 sit L2-CLOSER to the
    // upcoming query than C1/C2 (they win the probe) but point 0.58 off
    // its direction (they lose the rerank), while the drift mass points
    // 0.8 along it
    val centers = Seq((30f, 0f, 0f), (-30f, 0f, 0f),
      (0f, 10f, 14f), (0f, 10f, -14f))
    val core = (0L until 160L).map { i =>
      val (cx, cy, cz) = centers((i % 4).toInt)
      (i, Seq(cx + noise(i).head * 5, cy + noise(i + 7).head * 5,
        cz + noise(i + 11).head * 5) ++ noise(i).drop(1))
    }
    val codebook = EmbeddingLake.writePartitioned(
      core.toDF("vec_id", "embedding"), "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 1)
    val baseline = EmbeddingLake.driftReport(spark, path, "embedding", codebook)

    // drift: a new mass at y=40 SPLIT across the two x=±30 cells (each
    // half is L2-nearest its side's frozen centroid) — the worst case for
    // frozen codebooks: a probe near the mass ranks the UNDRIFTED middle
    // cells closer than either holder
    val drift = (1000L until 1020L).map(i =>
        (i, Seq(30f + noise(i).head, 40f + noise(i + 3).head,
          noise(i + 5).head) ++ noise(i).drop(1))) ++
      (1020L until 1040L).map(i =>
        (i, Seq(-30f + noise(i).head, 40f + noise(i + 3).head,
          noise(i + 5).head) ++ noise(i).drop(1)))
    EmbeddingLake.append(drift.toDF("vec_id", "embedding"), "embedding",
      path, codebook)

    val advice = EmbeddingLake.retrainAdvice(baseline,
      EmbeddingLake.driftReport(spark, path, "embedding", codebook))
    val flagged = advice.filter(col("retrain"))
      .select("ivf_cell").collect().map(_.getInt(0)).toSeq.sorted
    assert(flagged.length === 2,
      s"exactly the two drift-absorbing cells must flag, got $flagged")

    // ground truth + pre-compact recall@10 for a query aimed at the mass
    val q = Seq(0f, 40f) ++ Seq.fill(Dim - 2)(0f)
    val all = (core ++ drift).toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(all, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    def recall(cb: Array[Seq[Float]]): Double = {
      val got = EmbeddingLake.probeTopK(spark, path, cb,
        "vec_id", "embedding", q, k = 10, nProbe = 2)
        .collect().map(_.getLong(0)).toSet
      (got & truth).size / 10.0
    }
    val pre = recall(codebook)
    assert(pre <= 0.2, s"fixture must mislead the frozen probe, recall=$pre")

    // snapshot the unflagged cells' files (name, size, checksum)
    def partFiles(cell: Int): Seq[(String, Long, Long)] = {
      val d = new java.io.File(s"$path/ivf_cell=$cell")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        (f.getName, f.length, java.util.Arrays.hashCode(bytes).toLong)
      }.toSeq.sortBy(_._1)
    }
    val untouchedCells = codebook.indices.filterNot(flagged.contains)
    val before = untouchedCells.map(partFiles)

    // a STALE codebook (shorter than the lake's cell range) would hand a
    // fresh sub-cell an id an existing partition owns and the swap would
    // destroy it — refused loudly (review finding)
    val stale = intercept[IllegalArgumentException] {
      EmbeddingLake.compactCells(spark, path, "vec_id", "embedding",
        codebook.take(3), Seq(0), splitInto = 2)
    }
    assert(stale.getMessage.contains("stale"), stale.getMessage)

    // persist the codebook so the compact's refresh obligation is live
    EmbeddingLake.writeCodebook(spark, path, codebook)
    // r15: fingerprint the lake before the compact — the embedding
    // manifest's group IS the ivf_cell, so the compact's touched set must
    // read directly off IntegrityManifest.diff afterwards
    val mBefore = IntegrityManifest.embeddingManifest(
      EmbeddingLake.read(spark, path), "vec_id", "embedding")
      .localCheckpoint(true)
    val (newCb, stats) = EmbeddingLake.compactCells(spark, path,
      "vec_id", "embedding", codebook, flagged, splitInto = 2, kmeansIters = 3)
    assert((EmbeddingLake.readCodebook(spark, path) zip newCb)
      .forall { case (a, b) => a == b } &&
      EmbeddingLake.readCodebook(spark, path).length == newCb.length,
      "compact must refresh the persisted _codebook (review finding)")
    assert(stats.partitionsTotal === 4 && stats.partitionsRewritten === 2,
      s"only the flagged cells may be rewritten: $stats")
    assert(stats.cellsAdded >= 1 && newCb.length === 4 + stats.cellsAdded)
    assert(untouchedCells.map(partFiles) === before,
      "unflagged cell partitions must stay byte-identical")
    // …and the same contract MEASURED as a manifest comparison (r15):
    // exactly the flagged cells diverge (rows moved out → count_changed
    // or content change) plus the fresh sub-cells appear as group_added;
    // every untouched cell's (count, hash) row is identical
    val mAfter = IntegrityManifest.embeddingManifest(
      EmbeddingLake.read(spark, path), "vec_id", "embedding")
    val verdicts = IntegrityManifest.diff(mBefore, mAfter).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val addedCells = (codebook.length until newCb.length).map(_.toLong).toSet
    assert(verdicts.keySet === flagged.map(_.toLong).toSet ++ addedCells,
      s"manifest must attest exactly the compact's touched set: $verdicts")
    assert(addedCells.forall(c => verdicts(c) == "group_added"), verdicts)
    mBefore.unpersist()
    assert(LakeMerge.readManifest(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf()), path).isEmpty,
      "compact must finish its commit")

    // the split gave the drift mass its own centroids — the same probe
    // budget now lands on it
    val post = recall(newCb)
    assert(post >= 0.9 && post > pre,
      s"post-compact recall must recover: pre=$pre post=$post")
    // and nothing was lost: the lake still holds every row exactly once
    val ids = EmbeddingLake.read(spark, path)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids.length === ids.distinct.length && ids.length === 200)
  }

  test("compact crash mid-swap: committed read survives, codebook persisted, recover heals") {
    // small lake with a persisted codebook and a drifted far-field mass
    val path = Files.createTempDirectory("emb_compact_crash").toString + "/emb"
    val base = (0L until 80L).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(Dim)(r.nextFloat() * 2 - 1))
    }
    val cb = EmbeddingLake.writePartitioned(
      base.toDF("vec_id", "embedding"), "vec_id", "embedding", path,
      nCentroids = 4, kmeansIters = 1)
    EmbeddingLake.writeCodebook(spark, path, cb)
    EmbeddingLake.append((500L until 540L).map(i =>
        (i, Seq.fill(Dim)(8.0f + (i % 3)))).toDF("vec_id", "embedding"),
      "embedding", path, cb)
    val idsBefore = EmbeddingLake.read(spark, path)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    // the far-field mass lands in ONE cell; splitting it touches that
    // cell + one fresh id = 2 swaps — crash between them
    val flagged = EmbeddingLake.retrainAdvice(
        EmbeddingLake.driftReport(spark, path, "embedding", cb)
          .filter(col("ivf_cell") =!= -999), // shape no-op, keeps lineage fresh
        EmbeddingLake.driftReport(spark, path, "embedding", cb))
      .filter(col("n_now") > 25).select("ivf_cell") // the drift-absorbing cell
      .collect().map(_.getInt(0)).toSeq
    assert(flagged.nonEmpty)
    val e = intercept[IllegalStateException] {
      EmbeddingLake.compactCellsImpl(spark, path, "vec_id", "embedding",
        cb, flagged, 2, 2, crashAfterSwaps = 1)
    }
    assert(e.getMessage.contains("simulated crash"), e.getMessage)

    // mid-crash: the manifest-aware reader still serves every row once,
    // and the POST-compact codebook is already on disk (written before
    // the commit point — a crash here must not strand new cells without
    // centroids)
    val midIds = EmbeddingLake.read(spark, path)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(midIds === idsBefore, "committed view must not tear")
    val persisted = EmbeddingLake.readCodebook(spark, path)
    assert(persisted.length > cb.length,
      "refreshed codebook must be on disk before the commit point")

    // recovery heals; the persisted codebook matches the healed lake:
    // drift over it has NO null residuals and a further compact works
    assert(graft.io.LakeMerge.recover(spark, path))
    assert(EmbeddingLake.read(spark, path)
      .select("vec_id").collect().map(_.getLong(0)).toSet === idsBefore)
    val drift = EmbeddingLake.driftReport(spark, path, "embedding", persisted)
    assert(drift.filter(col("mean_residual").isNull).count() === 0L,
      "post-recovery drift must cover every cell (no stale-codebook NULLs)")
    val (_, again) = EmbeddingLake.compactCells(spark, path, "vec_id",
      "embedding", persisted, Seq.empty)
    assert(again.partitionsRewritten === 0, "no-op compact after recovery")
  }

  test("codebook refresh crash window heals: roll forward with _SUCCESS, roll back without") {
    // the refresh's residual window is between its two renames: live
    // moved aside, replacement not yet in place. readCodebook /
    // writeCodebook / compactCells must HEAL that (review finding: the
    // exists-gate used to silently disable refreshes forever)
    val path = Files.createTempDirectory("emb_cbrec").toString + "/emb"
    new java.io.File(path).mkdirs()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cbV1 = Array(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    val cbV2 = Array(Seq(2.0f, 0.0f), Seq(0.0f, 2.0f), Seq(1.0f, 1.0f))
    import spark.implicits._
    def writeDir(cb: Array[Seq[Float]], name: String): Unit =
      cb.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("cell_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/$name")

    // crash AFTER tmp completed, live moved aside (tmp has _SUCCESS,
    // old parked, no live): a READER resolves forward WITHOUT mutating
    // (second-review finding: a healing rename in the read path races
    // the lease-holding writer and other readers); the WRITER-side
    // recoverCodebook then heals by rename
    writeDir(cbV2, "._codebook_tmp")
    writeDir(cbV1, "._codebook_old")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_codebook")))
    val resolved = EmbeddingLake.readCodebook(spark, path)
    assert(resolved.toSeq === cbV2.toSeq, "reader must RESOLVE to the completed tmp")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "._codebook_tmp")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(path, "_codebook")),
      "a reader must not mutate the lake")
    EmbeddingLake.recoverCodebook(fs, path) // the writer-side heal
    assert(EmbeddingLake.readCodebook(spark, path).toSeq === cbV2.toSeq)
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_codebook")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(path, "._codebook_old")),
      "the writer-side heal must roll FORWARD and clean the old copy")

    // crash BEFORE tmp completed (no _SUCCESS): reader resolves BACK to
    // the parked old copy; writer-side heal rolls back
    fs.rename(new org.apache.hadoop.fs.Path(path, "_codebook"),
      new org.apache.hadoop.fs.Path(path, "._codebook_old"))
    val tmp = new org.apache.hadoop.fs.Path(path, "._codebook_tmp")
    fs.mkdirs(tmp) // torn write: directory exists, no _SUCCESS
    assert(EmbeddingLake.readCodebook(spark, path).toSeq === cbV2.toSeq,
      "reader must resolve back to the parked old copy")
    EmbeddingLake.recoverCodebook(fs, path)
    assert(EmbeddingLake.readCodebook(spark, path).toSeq === cbV2.toSeq)
    assert(!fs.exists(tmp), "the writer-side heal must clean the torn tmp")
  }

  test("rowwise minhash signing is shuffle-free (pure map)") {
    val docs = vecs.map { case (i, _) => (i, s"tok$i common words here") }
      .toDF("doc_id", "text")
    val plan = graft.dedup.Dedup.minhashSignatureRowwise(docs, "doc_id", "text", 8)
    assert(SeriesLake.isShuffleFree(plan), "rowwise signatures must not shuffle")
    // while the explode+agg form does shuffle (one partial-agg row per doc)
    val agg = graft.dedup.Dedup.minhashSignature(docs, "doc_id", "text", 8,
      graft.dedup.Dedup.fastHash)
    assert(!SeriesLake.isShuffleFree(agg))
  }
}
