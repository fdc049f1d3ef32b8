package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** End-to-end image-corpus preparation: the multimodal counterpart of
  * [[CorpusPrep]] — one command from raw image-blob parquet to a
  * deduplicated, decodability- and size-filtered survivor table plus a
  * stats report.
  *
  * Stages (each optional, all scale-shaped — blobs never cross a shuffle;
  * only (id, hash/metadata) rows do):
  *   1. decode gate            — REAL JDK header decode; undecodable rows drop
  *   2. size floor (`--min-width`/`--min-height`) — header metadata filter
  *   3. near-dup collapse (`--dedup-images <maxHamming>`) — aHash64
  *      perceptual fingerprint → Hamming-LSH banding → popcount verify →
  *      star-contraction CC keepers (duplicate CHAINS collapse)
  *
  * `runMain graft.cli.MediaPrep --in <blobs.parquet> --out <dir> [flags]`
  * writes `<out>/keep` (media_id, width, height, format of survivors) and
  * prints a one-line JSON stats report.
  */
object MediaPrep {

  def run(spark: SparkSession, args: Map[String, String]): Map[String, Long] = {
    val in = args("in")
    val out = args("out")
    val idCol = args.getOrElse("id-col", "media_id")
    val bytesCol = args.getOrElse("bytes-col", "bytes")
    val blobs = spark.read.parquet(in)
    val nIn = blobs.count()

    // one real decode pass: metadata columns ride along, undecodable rows
    // surface as NULL width and are dropped at the gate
    var media: DataFrame = Multimodal.decodeImageBatch(blobs, bytesCol)
      .filter(col("width").isNotNull)
    val nDecodable = media.count()

    args.get("min-width").foreach(w => media = media.filter(col("width") >= w.toInt))
    args.get("min-height").foreach(h => media = media.filter(col("height") >= h.toInt))

    val nDupDropped: Long = args.get("dedup-images") match {
      case Some(maxHamming) =>
        val keepers = Multimodal.imageNearDupKeepers(
          media, idCol, bytesCol, maxHamming.toInt)
        val kept = keepers.filter(col(idCol) === col("keeper_id"))
          .select(col(idCol))
        val before = media
        media = media.join(kept, idCol)
        before.count() - media.count()
      case None => 0L
    }

    media.select(col(idCol), col("width"), col("height"), col("format"))
      .write.mode("overwrite").parquet(s"$out/keep")
    val nOut = spark.read.parquet(s"$out/keep").count()
    val stats = Map("images_in" -> nIn, "decodable" -> nDecodable,
      "images_out" -> nOut, "near_dups_dropped" -> nDupDropped)
    println(stats.map { case (k, v) => s""""$k":$v""" }
      .mkString("{\"metric\":\"media_prep\",", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("media-prep")(s => run(s, CliArgs.parse(args)))
}
