package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Series-lake storage layout — the at-scale replacement for the
  * reference's MySQL series store (SURVEY.md §1.5).
  *
  * Layout contract: partitioned by event date (partition pruning serves the
  * reference's ubiquitous `[start, end]` scans — S1/F1) and bucketed +
  * sorted by series id (joins, dedup groupBys and per-series windows on
  * `id` are co-located: no Exchange in the plan, SortMergeJoin reads
  * pre-sorted buckets). At 100 TB this is the difference between a full
  * cluster shuffle per query and a scan of the relevant date partitions.
  */
object SeriesLake {

  /** Write `(id, time, value, …)` as a date-partitioned, id-bucketed table;
    * buckets are sorted by (id, time) when a time column exists. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      dateCol: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sortCols = Seq("id", "time").filter(df.columns.contains)
    val writer = df.write.mode(mode)
      .bucketBy(nBuckets, "id")
      .sortBy(sortCols.head, sortCols.tail: _*)
    dateCol.fold(writer)(c => writer.partitionBy(c)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan of `df` contains no shuffle — the check
    * that a bucket-aligned join/agg actually avoided the Exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
