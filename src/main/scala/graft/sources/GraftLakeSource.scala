package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.io.{LakeMerge, LakeTimeTravel}

/** `spark.read.format("graftlake")` — the lake's committed view, time
  * travel, and change feed as a REGISTERED Spark data source, so plain
  * SQL/DataFrame users reach them without the bespoke Scala entry points:
  *
  * {{{
  *   spark.read.format("graftlake").load(lakeDir)                  // committed live view  == LakeMerge.readLake
  *   spark.read.format("graftlake").option("asOf", 2).load(dir)    // snapshot at commit 2 == LakeTimeTravel.readLakeAsOf
  *   spark.read.format("graftlake").option("changesSince", 0).load(dir) // feed commits > 0 == LakeMerge.readChanges
  *   -- SQL
  *   CREATE TEMPORARY VIEW lake USING graftlake OPTIONS (path '/data/lake');
  *   SELECT * FROM lake WHERE part_date = '2024-01-02';
  * }}}
  *
  * Architecture (the Delta-Lake V1 read-path pattern): a custom
  * [[FileIndex]] whose listing IS the lake's transaction-log resolution —
  * [[LakeMerge.resolveCommitted]] (manifest-aware committed view),
  * [[LakeTimeTravel.resolveAsOf]] (snapshot reconstruction through the
  * commit log + retained pre-images), [[LakeMerge.resolveChanges]]
  * (published feed + committed-but-unpublished staged feed) — wrapped in
  * a [[HadoopFsRelation]] over the stock parquet [[FileFormat]]. The
  * SAME resolution functions back the Scala entry points, so the two
  * paths cannot drift (GraftLakeSourceSpec pins bit-identity across the
  * crash windows), and because the index declares a real partition
  * schema, partition PRUNING and parquet filter/column PUSHDOWN work
  * exactly as on a native parquet table: a `part_date = X` predicate
  * reaches [[GraftLakeFileIndex.listFiles]] as a partition filter and
  * only X's files are ever listed into the scan.
  *
  * Schema-on-read (E178) holds: the stored lake schema is authoritative
  * when present, so pre-widening files read back NULL for new columns —
  * identical to the function entry points. */
class GraftLakeSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graftlake"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val lakeDir = parameters.get("path").map(p => new Path(p).toString)
      .getOrElse(throw new IllegalArgumentException(
        "graftlake needs a path: spark.read.format(\"graftlake\").load(lakeDir)"))
    val partitionCol = parameters.getOrElse("partitionCol", "part_date")
    val asOf = parameters.get("asOf").map(_.toLong)
    val since = parameters.get("changesSince").map(_.toLong)
    require(asOf.isEmpty || since.isEmpty,
      "graftlake: asOf and changesSince are mutually exclusive " +
        "(a snapshot read and a feed read are different tables)")
    val fs = LakeMerge.hadoopFs(spark, lakeDir)
    require(fs.exists(new Path(lakeDir)),
      s"no lake at $lakeDir — initialize with LakeMerge.writeLake")
    val stored = LakeMerge.lakeSchema(fs, lakeDir)

    if (since.isDefined) {
      val resolved = LakeMerge.resolveChanges(spark, lakeDir)
      if (resolved.isEmpty) LakeMerge.refuseNoFeed(spark, lakeDir)
      val kept = resolved.filter(_._1 > since.get)
        .map { case (seq, dir) => (seq: Any, dir) }
      // feed files carry the lake's data columns (part_date included —
      // it is a DATA column of the feed) plus _change_type appended last;
      // the stored schema stays authoritative for the data columns
      val dataSchema = stored match {
        case Some(s) => StructType(
          s.fields :+ StructField(LakeMerge.ChangeTypeCol, StringType))
        case None => spark.read.parquet(
          LakeMerge.escapeGlob(resolved.head._2)).schema
      }
      mkRelation(spark, lakeDir, kept, "seq", LongType, dataSchema,
        parameters)
    } else {
      val resolved: Seq[(Any, String)] = asOf match {
        case None =>
          LakeMerge.resolveCommitted(spark, lakeDir, partitionCol)
            .map { case (v, d) => (v: Any, d) }
        case Some(seq) =>
          val r = LakeTimeTravel.resolveAsOf(spark, lakeDir, seq, partitionCol)
          val prefix = partitionCol + "="
          (r.liveDirs.map(d =>
              (new Path(d).getName.stripPrefix(prefix): Any, d)) ++
            r.litDirs.map { case (d, v) => (v: Any, d) })
            .sortBy(_._1.toString)
      }
      require(resolved.nonEmpty, asOf match {
        case Some(seq) => s"the lake had no partitions at seq $seq"
        case None => s"no partitions at $lakeDir"
      })
      val dataSchema = LakeMerge.dirSchema(stored, partitionCol).getOrElse(
        spark.read.parquet(LakeMerge.escapeGlob(resolved.head._2)).schema)
      mkRelation(spark, lakeDir, resolved, partitionCol, StringType,
        dataSchema, parameters)
    }
  }

  private def mkRelation(spark: SparkSession, lakeDir: String,
      resolved: Seq[(Any, String)], partitionCol: String,
      partitionType: DataType, dataSchema: StructType,
      options: Map[String, String]): BaseRelation = {
    val index = new GraftLakeFileIndex(spark, lakeDir, resolved,
      partitionCol, partitionType)
    HadoopFsRelation(index, index.partitionSchema,
      StructType(dataSchema.filterNot(_.name == partitionCol)),
      None, new ParquetFileFormat(), options)(spark)
  }
}

/** [[FileIndex]] over a RESOLVED set of lake partition directories: each
  * entry is (partitionValue, directory), where the directory may be live,
  * staged (mid-swap committed view), or a retained `_history/` pre-image —
  * whatever the lake's resolution said the committed bytes are. Partition
  * filters evaluate against the values BEFORE any file listing, so a
  * pruned read never even stats the excluded directories (the behavior
  * PlanAuditSpec-style file counts pin). */
class GraftLakeFileIndex(
    @transient private val spark: SparkSession,
    lakeDir: String,
    resolved: Seq[(Any, String)],
    partitionCol: String,
    partitionType: DataType) extends FileIndex {

  override val partitionSchema: StructType =
    StructType(Seq(StructField(partitionCol, partitionType,
      nullable = false)))

  override def rootPaths: Seq[Path] = Seq(new Path(lakeDir))

  private def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  private def dataFiles(dir: String): Seq[FileStatus] = {
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(dir)).toSeq.filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // bind the partition predicate to our single partition column and
    // prune the RESOLVED values — excluded directories are never listed
    val predicate = partitionFilters.reduceOption(And).map { e =>
      Predicate.create(e.transform {
        case a: AttributeReference if a.name == partitionCol =>
          BoundReference(0, partitionType, nullable = false)
      })
    }
    resolved
      .filter { case (v, _) =>
        predicate.forall(_.eval(InternalRow(toCatalyst(v))))
      }
      .map { case (v, dir) =>
        PartitionDirectory(InternalRow(toCatalyst(v)), dataFiles(dir).toArray)
      }
  }

  override def inputFiles: Array[String] =
    resolved.flatMap { case (_, d) => dataFiles(d).map(_.getPath.toString) }
      .toArray

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long =
    resolved.map { case (_, d) => dataFiles(d).map(_.getLen).sum }.sum
}
