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

  /** Number of files the plan will actually read — the partition-pruning
    * assertion (compare against the unfiltered table's file count). */
  def filesRead(df: DataFrame): Long = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans.map(_.selectedPartitions.totalNumberOfFiles).sum
  }
}
