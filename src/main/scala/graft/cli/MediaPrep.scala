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

  def run(spark: SparkSession, args: Map[String, String]): Map[String, Long] =
    // same rationale as CorpusPrep: keep the capped-dedup audit metric
    // alive even when zero pairs survive (AQE would prune it otherwise)
    graft.dedup.Dedup.withReliableOversizeAudit(spark)(runInner(spark, args))

  private def runInner(spark: SparkSession, args: Map[String, String]): Map[String, Long] = {
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

    var oversizeObs: Option[org.apache.spark.sql.Observation] = None
    var obsAttached = false
    // the (id, ahash) frame outlives the keeper computation: the
    // pruned-audit fallback below recounts oversize buckets from it, so
    // it is unpersisted only after the stats line is assembled
    var hashedCache: Option[DataFrame] = None
    var dedupMaxBucket = Int.MaxValue
    val survivors: DataFrame = args.get("dedup-images") match {
      case Some(maxHamming) =>
        // the keeper pipeline keys on LONG ids — fail fast with a clear
        // message instead of a ClassCastException inside an executor task
        require(blobs.schema(idCol).dataType
            .isInstanceOf[org.apache.spark.sql.types.NumericType],
          s"--id-col '$idCol' must be numeric for --dedup-images " +
            s"(found ${blobs.schema(idCol).dataType.simpleString}); " +
            "near-dup keepers key on long ids")
        // second (and last) blob scan: header-gate + full-pixel hash in
        // one pass, no shuffle touches a bytes column. The keeper id
        // universe is the PERSISTED metadata frame — handing the gated
        // blob frame to the keeper helper would make its id side a third
        // full blob scan (mapPartitions blocks column pruning). Hash-less
        // eligible rows (header ok, pixels undecodable) keep themselves.
        // Mega-bucket cap: default-on, shared `--max-bucket` semantics
        // (CliArgs.maxBucket); drops are observed in-pass and reported in
        // the stats line, same loudness contract as CorpusPrep.
        val maxBucket = CliArgs.maxBucket(args)
        dedupMaxBucket = maxBucket
        if (maxBucket != Int.MaxValue) {
          oversizeObs = Some(org.apache.spark.sql.Observation(
            "graft_oversize_media_audit"))
          obsAttached = true
        }
        val hashed = Multimodal.imageAHashes(
          gate(Multimodal.decodeImageBatch(blobs, bytesCol)), idCol, bytesCol)
          .persist()
        hashedCache = Some(hashed)
        val keepers = graft.dedup.Dedup.keepersFromPairs(eligible, idCol,
          Multimodal.imageNearDupPairsFromHashes(hashed, maxHamming.toInt,
            maxBucket, oversizeObs))
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
    // the observation fired during the CC rounds / the survivor write; the
    // reliable-audit wrapper keeps it un-pruned even when zero pairs
    // survive. If AQE still pruned the audit node (caller raced the
    // excluded-rules conf), recount from the persisted hash frame instead
    // of reporting a silent 0 — same fallback contract as CorpusPrep.
    val nOversize: Long =
      if (obsAttached)
        oversizeObs.flatMap(_.get.get("dropped_buckets"))
          .map(_.asInstanceOf[Long]).getOrElse {
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              "oversize-bucket observation was pruned from the executed " +
                "plan; recomputing the drop count with a one-off banding " +
                "pass over the persisted hash frame")
            hashedCache.map(h =>
              Multimodal.oversizeImageBuckets(h, dedupMaxBucket).count())
              .getOrElse(0L)
          }
      else 0L
    hashedCache.foreach(_.unpersist())
    val stats = Map("images_in" -> nIn, "decodable" -> nDecodable,
      "images_out" -> nOut, "near_dups_dropped" -> (nEligible - nOut),
      "oversize_buckets_dropped" -> nOversize)
    println(stats.map { case (k, v) => s""""$k":$v""" }
      .mkString("{\"metric\":\"media_prep\",", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("media-prep")(s => run(s, CliArgs.parse(args)))
}
