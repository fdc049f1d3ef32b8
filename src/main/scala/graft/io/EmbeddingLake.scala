package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Similarity

/** Embedding-lake storage layout — how the ANN operators survive 100 TB.
  *
  * Layout contract: vectors are stored with their IVF cell id as a
  * PARTITION column. An `ivfTopK` probe then touches only the `nProbe`
  * nearest cells — partition pruning at the file-listing level, so a
  * 16-cell / 4-probe search scans 1/4 of the corpus and a
  * 1024-cell / 16-probe search scans ~1.6%, before a single row is read.
  * The cosine rerank inside the probed cells is the same fused codegen'd
  * expression as the in-memory path.
  *
  * The codebook (cell centroids) is cluster-metadata-sized (nCentroids ×
  * dim floats) — it lives with the table and is broadcast-trivial.
  */
object EmbeddingLake {

  /** Assign each vector its IVF cell and write partitioned by `ivf_cell`.
    * Returns the codebook used, to be persisted alongside the table. */
  def writePartitioned(df: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int, kmeansIters: Int = 2,
      mode: SaveMode = SaveMode.Overwrite): Array[Seq[Float]] = {
    val cents = Similarity.codebook(df, idCol, vecCol, nCentroids, kmeansIters)
    Similarity.withIvfCell(df, vecCol, cents)
      .write.mode(mode).partitionBy("ivf_cell").parquet(path)
    cents
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Top-k cosine search against the lake: prune to the `nProbe` cells
    * nearest the query (partition filter — pruned at file listing), rerank
    * exactly inside them. */
  def probeTopK(spark: SparkSession, path: String, codebook: Array[Seq[Float]],
      idCol: String, vecCol: String, query: Seq[Float], k: Int,
      nProbe: Int, roundTo: Int = 6): DataFrame = {
    val probes = codebook.indices
      .sortBy(i => Similarity.l2Local(query, codebook(i)))
      .take(nProbe)
    val pruned = read(spark, path).filter(col("ivf_cell").isin(probes: _*))
    Similarity.bruteForceTopK(pruned, idCol, vecCol, query, k, roundTo)
  }

  /** IVFADC layout (Jégou et al., TPAMI 2011 §IV): the IVF cell id as the
    * partition column AND the PQ byte code stored beside the vector. A
    * query then composes BOTH prunings: partition pruning cuts the scan to
    * nProbe/nCentroids of the files, and the ADC ranking inside the
    * probed cells reads only (id, pq_code) — m bytes of code instead of
    * dim·4 bytes of vector — before a shortlist-sized fetch touches any
    * float. Returns (cellCodebook, pqCodebooks) — both
    * cluster-metadata-sized, persisted alongside the table. (Classic
    * IVFADC quantizes the residual vs the cell centroid; codes here cover
    * the raw vector — the layout and scan discipline are identical, the
    * residual refinement drops into `withPqCodes`'s input unchanged.) */
  def writePartitionedPq(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, nCentroids: Int, m: Int, nCodes: Int,
      kmeansIters: Int = 2, pqIters: Int = 1,
      mode: SaveMode = SaveMode.Overwrite)
      : (Array[Seq[Float]], Array[Array[Seq[Float]]]) = {
    val cents = Similarity.codebook(df, idCol, vecCol, nCentroids, kmeansIters)
    val pq = Similarity.pqCodebooks(df, idCol, vecCol, dim, m, nCodes, pqIters)
    Similarity.withIvfCell(
        Similarity.withPqCodes(df, vecCol, dim, pq), vecCol, cents)
      .write.mode(mode).partitionBy("ivf_cell").parquet(path)
    (cents, pq)
  }

  /** IVFADC top-k: partition-prune to the `nProbe` nearest cells, ADC-rank
    * the probed rows from the STORED byte codes (scan 1 — column-pruned to
    * (id, pq_code); EmbeddingLakeSpec pins the read schema), then fetch
    * only the `shortlist` candidates' vectors via a broadcast semi-join
    * (scan 2) and rerank them exactly. */
  def probeTopKAdc(spark: SparkSession, path: String,
      cellCodebook: Array[Seq[Float]],
      pqCodebooks: Array[Array[Seq[Float]]],
      idCol: String, vecCol: String, query: Seq[Float], dim: Int, k: Int,
      nProbe: Int, shortlist: Int = 64, roundTo: Int = 6): DataFrame = {
    val probes = cellCodebook.indices
      .sortBy(i => Similarity.l2Local(query, cellCodebook(i)))
      .take(nProbe)
    val pruned = read(spark, path).filter(col("ivf_cell").isin(probes: _*))
    val cand = Similarity.pqAdcTopKFromCodes(
        pruned.select(col(idCol), col("pq_code")),
        idCol, query, dim, pqCodebooks, math.max(shortlist, k), roundTo)
      .select(col(idCol))
    val fetched = pruned.select(col(idCol), col(vecCol))
      .join(broadcast(cand), Seq(idCol))
    Similarity.bruteForceTopK(fetched, idCol, vecCol, query, k, roundTo)
  }

  /** Number of files the plan will actually read — the partition-pruning
    * assertion (compare against the unfiltered table's file count). */
  def filesRead(df: DataFrame): Long = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans.map(_.selectedPartitions.totalNumberOfFiles).sum
  }

  // ---- incremental ingest (round 13) ---------------------------------------

  /** APPEND new vectors into an existing lake: assign cells from the
    * PERSISTED codebook — ingest never retrains — and write new files
    * into the cell partitions (`SaveMode.Append` adds files beside the
    * existing ones; nothing is read, rewritten, or moved). Because cell
    * assignment is a pure function of (vector, codebook), a lake grown by
    * appends is row-identical to one rebuilt from scratch WITH THE SAME
    * codebook — probes return the same results (EmbeddingLakeSpec pins
    * recall parity) — while the work is one map pass over the batch.
    * The price of frozen codebooks is DRIFT: see [[driftReport]]. */
  def append(df: DataFrame, vecCol: String, path: String,
      cellCodebook: Array[Seq[Float]]): Unit =
    Similarity.withIvfCell(df, vecCol, cellCodebook)
      .write.mode(SaveMode.Append).partitionBy("ivf_cell").parquet(path)

  /** [[append]] for the IVFADC layout: PQ codes from the persisted
    * per-subspace codebooks ride along, same frozen-codebook contract. */
  def appendPq(df: DataFrame, vecCol: String, path: String,
      cellCodebook: Array[Seq[Float]],
      pqCodebooks: Array[Array[Seq[Float]]], dim: Int): Unit =
    Similarity.withIvfCell(
        Similarity.withPqCodes(df, vecCol, dim, pqCodebooks), vecCol,
        cellCodebook)
      .write.mode(SaveMode.Append).partitionBy("ivf_cell").parquet(path)

  /** Per-cell DRIFT report — the number that decides when a frozen
    * codebook must retrain/compact: for every cell its row count and the
    * mean + max L2 residual to the cell centroid. A lake that only ever
    * saw in-distribution appends keeps residuals near the training-time
    * baseline; rising mean residual means the centroid no longer sits in
    * its cell's mass (probes scan more junk per hit), and a hot max is an
    * outlier magnet. ONE aggregate over (ivf_cell, vector); the centroid
    * lookup is an `element_at` on the broadcast codebook literal. */
  def driftReport(spark: SparkSession, path: String, vecCol: String,
      cellCodebook: Array[Seq[Float]], roundTo: Int = 6): DataFrame = {
    val cLit = typedlit(cellCodebook.toSeq)
    read(spark, path)
      .select(col("ivf_cell"),
        graft.functions.VectorFunctions
          .l2(col(vecCol), element_at(cLit, col("ivf_cell") + 1))
          .as("__r"))
      .groupBy(col("ivf_cell"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__r")), roundTo).as("mean_residual"),
        round(max(col("__r")), roundTo).as("max_residual"))
  }

  /** Retrain/compact advice: joins a training-time baseline [[driftReport]]
    * against the current one and flags cells whose mean residual grew past
    * `growthThreshold`× (or that baseline never saw — unseeded cells have
    * no honest baseline and always warrant a look). Both frames are
    * cell-count-sized; the join broadcasts. */
  def retrainAdvice(baseline: DataFrame, current: DataFrame,
      growthThreshold: Double = 1.5): DataFrame = {
    require(growthThreshold > 1.0,
      s"growthThreshold must exceed 1.0, got $growthThreshold")
    val b = baseline.select(col("ivf_cell"),
      col("n").as("n_base"), col("mean_residual").as("mean_base"))
    current.select(col("ivf_cell"), col("n").as("n_now"),
        col("mean_residual").as("mean_now"), col("max_residual"))
      .join(broadcast(b), Seq("ivf_cell"), "left")
      .select(col("ivf_cell"), col("n_base"), col("n_now"),
        col("mean_base"), col("mean_now"),
        round(col("mean_now") / col("mean_base"), 4).as("growth"),
        (col("mean_base").isNull ||
          col("mean_now") > col("mean_base") * growthThreshold)
          .as("retrain"))
  }
}
