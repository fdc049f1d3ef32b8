package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.trainprep.TrainPrep

/** End-to-end training-corpus preparation: the extension-side counterpart
  * of the deck CLIs — one command from raw documents parquet to packed,
  * deduplicated, quality-filtered training chunks plus a stats report.
  *
  * Stages (each optional, all scale-shaped):
  *   1. language filter (`--lang en`)            — codegen'd n-gram heuristic
  *   2. quality floor (`--min-quality 0.5`)      — pure filter
  *   3. deterministic sample (`--sample 28`)     — sha256 prefix < threshold
  *   4. PII redaction (`--redact true`)          — RE2-safe replace-all
  *   5. dedup (`--dedup exact|near|transitive`)  — collapse + rowwise MinHash
  *      + LSH (+ `--max-bucket` mega-bucket cap, dropped buckets logged);
  *      `transitive` closes duplicate CHAINS via star-contraction CC
  *   6. decontamination (`--decontaminate <bench.parquet>` [`--ngram 13`])
  *      — drop docs sharing a word n-gram with the eval set
  *   7. sequence packing (`--budget 4096`)       — distributed prefix scan
  *
  * `runMain graft.cli.CorpusPrep --in <docs.parquet> --out <dir> [flags]`
  * writes `<out>/chunks` (doc→chunk assignments) and prints a one-line
  * JSON stats report.
  */
object CorpusPrep {

  def run(spark: SparkSession, args: Map[String, String]): Map[String, Long] = {
    val in = args("in")
    val out = args("out")
    val docs0 = spark.read.parquet(in)
    val idCol = args.getOrElse("id-col", "doc_id")
    val textCol = args.getOrElse("text-col", "text")

    var docs: DataFrame = docs0
    val nIn = docs.count()

    args.get("lang").foreach { l =>
      docs = docs.filter(TextFunctions.langIdHeuristic(col(textCol)) === lit(l))
    }
    args.get("min-quality").foreach { q =>
      docs = docs.filter(TextFunctions.qualityScore(col(textCol)) >= q.toDouble)
    }
    args.get("sample").foreach { thr =>
      docs = docs.filter(TrainPrep.hashSampleFilter(col(idCol), thr))
    }
    if (args.get("redact").contains("true")) {
      docs = docs.withColumn(textCol, TrainPrep.redactPii(col(textCol)))
    }

    val maxBucket = args.get("max-bucket").map(_.toInt).getOrElse(Int.MaxValue)
    val nDropped: Long = args.get("dedup") match {
      case Some("exact") =>
        val keepers = Dedup.exact(docs, idCol, textCol)
          .select(col("keeper_id").as(idCol))
        docs = docs.join(keepers, idCol)
        0L
      case Some(mode @ ("near" | "transitive")) =>
        // count dropped buckets over the SAME population the pipeline
        // banded (the collapsed reps), BEFORE dedup removes survivors —
        // counting afterwards both under- and over-reports. This is a
        // second collapse+sign+band pass, paid only when --max-bucket is
        // set: the audit's price for an exact dropped-bucket count.
        val dropped =
          if (maxBucket == Int.MaxValue) 0L
          else Dedup.oversizeBuckets(
            Dedup.minhashSignatureRowwise(
              Dedup.collapseReps(docs, idCol, textCol), idCol, textCol, 8),
            idCol, numHashes = 8, rowsPerBand = 2, maxBucket).count()
        val keepers =
          if (mode == "near")
            Dedup.nearDupKeepersRowwise(docs, idCol, textCol,
              numHashes = 8, rowsPerBand = 2, threshold = 0.8,
              maxBucketSize = maxBucket)
          else
            Dedup.nearDupKeepersTransitiveRowwise(docs, idCol, textCol,
              numHashes = 8, rowsPerBand = 2, threshold = 0.8,
              maxBucketSize = maxBucket)
        docs = docs.join(
          keepers.filter(col("doc_id") === col("keeper_id"))
            .select(col("doc_id").as(idCol)), idCol)
        dropped
      case Some(other) =>
        sys.error(s"--dedup must be 'exact', 'near' or 'transitive', got '$other'")
      case None => 0L
    }

    // decontamination AFTER dedup: keepers already collapsed, so the
    // benchmark join sees each surviving text once
    val nContaminated: Long = args.get("decontaminate") match {
      case Some(benchPath) =>
        val n = args.getOrElse("ngram", "13").toInt
        val bench = spark.read.parquet(benchPath)
        val contaminated = TrainPrep.contaminationPairs(
            docs, idCol, textCol, bench, idCol, textCol, n)
          .select(col("train_id").as(idCol)).distinct()
        val c = contaminated.count()
        docs = docs.join(contaminated, Seq(idCol), "left_anti")
        c
      case None => 0L
    }

    val budget = args.getOrElse("budget", "4096").toLong
    val packed = TrainPrep.packChunks(docs, idCol, textCol, budget)
    packed.write.mode("overwrite").parquet(s"$out/chunks")

    val written = spark.read.parquet(s"$out/chunks")
    val nOut = written.count()
    val maxChunk = written.agg(max("chunk_end_id")).head()
    val nChunks = if (nOut == 0 || maxChunk.isNullAt(0)) 0L
      else maxChunk.getLong(0) + 1
    val stats = Map("docs_in" -> nIn, "docs_out" -> nOut,
      "chunks" -> nChunks, "oversize_buckets_dropped" -> nDropped,
      "contaminated_dropped" -> nContaminated)
    println(stats.map { case (k, v) => s""""$k":$v""" }
      .mkString("{\"metric\":\"corpus_prep\",", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("corpus-prep")(s => run(s, CliArgs.parse(args)))
}
