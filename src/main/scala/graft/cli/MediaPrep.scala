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

    // Blob scans are the budget at scale: exactly TWO — one header-only
    // metadata pass here, one full-pixel hashing pass inside the dedup
    // stage. Everything else (counts, floors, the survivor write) runs on
    // this persisted metadata-only frame — a few dozen bytes per image,
    // never the blobs.
    val meta = Multimodal.decodeImageBatch(blobs, bytesCol)
      .select(col(idCol), col("width"), col("height"), col("format"))
      .persist()
    val nIn = meta.count()
    val nDecodable = meta.filter(col("width").isNotNull).count()

    // the decode/size gate as a plain filter, applied to the metadata
    // frame for bookkeeping AND re-applied on the hashing scan below —
    // re-deriving the header there keeps the blob path a pure map (an
    // id-join against the eligible set would shuffle the blobs)
    def gate(df: DataFrame): DataFrame = {
      var g = df.filter(col("width").isNotNull)
      args.get("min-width").foreach(w => g = g.filter(col("width") >= w.toInt))
      args.get("min-height").foreach(h => g = g.filter(col("height") >= h.toInt))
      g
    }
    val eligible = gate(meta)

    val survivors: DataFrame = args.get("dedup-images") match {
      case Some(maxHamming) =>
        // second (and last) blob scan: header-gate + full-pixel hash in
        // one pass, no shuffle touches a bytes column. The keeper id
        // universe is the PERSISTED metadata frame — handing the gated
        // blob frame to the keeper helper would make its id side a third
        // full blob scan (mapPartitions blocks column pruning). Hash-less
        // eligible rows (header ok, pixels undecodable) keep themselves.
        // mega-bucket cap: default-on like CorpusPrep's (`--max-bucket N`
        // overrides, `0` uncaps) — a crawl of identical/blank images is
        // one n² band bucket without it
        val maxBucket = args.get("max-bucket").map(_.toInt) match {
          case Some(m) if m <= 0 => Int.MaxValue
          case Some(m) => m
          case None => graft.dedup.Dedup.DefaultMaxBucketSize
        }
        val hashed = Multimodal.imageAHashes(
          gate(Multimodal.decodeImageBatch(blobs, bytesCol)), idCol, bytesCol)
          .persist()
        val keepers =
          try graft.dedup.Dedup.keepersFromPairs(eligible, idCol,
            Multimodal.imageNearDupPairsFromHashes(hashed, maxHamming.toInt,
              maxBucket))
          finally hashed.unpersist() // CC materialized the pairs eagerly
        eligible.join(
          keepers.filter(col(idCol) === col("keeper_id")).select(col(idCol)),
          idCol)
      case None => eligible
    }

    survivors.select(col(idCol), col("width"), col("height"), col("format"))
      .write.mode("overwrite").parquet(s"$out/keep")
    val nOut = spark.read.parquet(s"$out/keep").count()
    val nEligible = eligible.count()
    meta.unpersist()
    val stats = Map("images_in" -> nIn, "decodable" -> nDecodable,
      "images_out" -> nOut, "near_dups_dropped" -> (nEligible - nOut))
    println(stats.map { case (k, v) => s""""$k":$v""" }
      .mkString("{\"metric\":\"media_prep\",", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("media-prep")(s => run(s, CliArgs.parse(args)))
}
