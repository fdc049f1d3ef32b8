package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** End-to-end media-corpus preparation: the multimodal counterpart of
  * [[CorpusPrep]] — one command from raw blob parquet (images, audio or
  * video via `--kind`) to a deduplicated, decodability- and floor-filtered
  * survivor table plus a stats report.
  *
  * Stages (each optional, all scale-shaped — blobs never cross a shuffle;
  * only (id, hash/digest/metadata) rows do):
  *   1. decode gate — REAL JDK header decode per kind (ImageIO /
  *      javax.sound.sampled / container-header byte parse); undecodable
  *      rows drop
  *   2. metadata floors — `--min-width`/`--min-height` (image, video),
  *      `--min-duration` (audio, video), `--min-sample-rate` (audio);
  *      a floor that does not apply to the kind fails fast
  *   3. dedup — `--dedup-perceptual <maxHamming>` (image or audio;
  *      `--dedup-images` is the image-only spelling): the kind's 64-bit
  *      perceptual fingerprint (pixel aHash64 / PCM energy-envelope
  *      aHash64) → Hamming-LSH banding → popcount verify →
  *      star-contraction CC keepers (duplicate CHAINS collapse);
  *      `--dedup-exact true` (any kind): exact content digest
  *      (sha256 of the blob, computed scan-side) → min-id keeper — the
  *      only video dedup (no pixel codec in the JDK, no perceptual hash)
  *
  * Blob scans are the budget at scale: exactly TWO — one header-only
  * metadata pass, one hashing/digest pass inside the dedup stage (none
  * without dedup). Counts, floors and the survivor write run on the
  * persisted metadata-only frame.
  *
  * `runMain graft.cli.MediaPrep --in <blobs.parquet> --out <dir> [flags]`
  * writes `<out>/keep` (id + the kind's header metadata of survivors) and
  * prints a one-line JSON stats report.
  */
object MediaPrep {

  def run(spark: SparkSession, args: Map[String, String]): Map[String, Long] =
    // same rationale as CorpusPrep: keep the capped-dedup audit metric
    // alive even when zero pairs survive (AQE would prune it otherwise)
    graft.dedup.Dedup.withReliableOversizeAudit(spark)(runInner(spark, args))

  /** Floor flag → the metadata column it gates; kinds whose decoder does
    * not produce the column reject the flag up front. */
  private val FloorFlags = Seq(
    "min-width" -> "width", "min-height" -> "height",
    "min-duration" -> "duration_s", "min-sample-rate" -> "sample_rate_hz")

  private def runInner(spark: SparkSession, args: Map[String, String]): Map[String, Long] = {
    val in = args("in")
    val out = args("out")
    val idCol = args.getOrElse("id-col", "media_id")
    val bytesCol = args.getOrElse("bytes-col", "bytes")
    val kind = args.getOrElse("kind", "image")
    val blobs = spark.read.parquet(in)

    val (decodeFn, metaCols): (DataFrame => DataFrame, Seq[String]) = kind match {
      case "image" => ((d: DataFrame) => Multimodal.decodeImageBatch(d, bytesCol),
        Seq("width", "height", "format"))
      case "audio" => ((d: DataFrame) => Multimodal.decodeAudioBatch(d, bytesCol),
        Seq("sample_rate_hz", "channels", "frames", "duration_s"))
      case "video" => ((d: DataFrame) => Multimodal.decodeVideoBatch(d, bytesCol),
        Seq("width", "height", "duration_s", "format"))
      case other => sys.error(
        s"--kind must be 'image', 'audio' or 'video', got '$other'")
    }
    FloorFlags.foreach { case (flag, c) =>
      if (args.contains(flag) && !metaCols.contains(c))
        sys.error(s"--$flag does not apply to --kind $kind")
    }

    // first (of at most two) blob scans: header-only metadata, persisted
    // without the bytes column — a few dozen bytes per blob
    val meta = decodeFn(blobs)
      .select((idCol +: metaCols).map(col): _*)
      .persist()
    val nIn = meta.count()
    // every decoder NULLs its whole metadata row for undecodable blobs —
    // the first metadata column doubles as the decodability marker
    val decodableCol = metaCols.head
    val nDecodable = meta.filter(col(decodableCol).isNotNull).count()

    // the decode/floor gate as a plain filter, applied to the metadata
    // frame for bookkeeping AND re-applied on the dedup scan below —
    // re-deriving the header there keeps the blob path a pure map (an
    // id-join against the eligible set would shuffle the blobs)
    def gate(df: DataFrame): DataFrame =
      FloorFlags.foldLeft(df.filter(col(decodableCol).isNotNull)) {
        case (g, (flag, c)) =>
          args.get(flag).map(v => g.filter(col(c) >= v.toDouble)).getOrElse(g)
      }
    val eligible = gate(meta)

    require(!(args.contains("dedup-images") && args.contains("dedup-exact")),
      "--dedup-images and --dedup-exact are mutually exclusive")
    var oversizeObs: Option[org.apache.spark.sql.Observation] = None
    var obsAttached = false
    // the (id, ahash) frame outlives the keeper computation: the
    // pruned-audit fallback below recounts oversize buckets from it, so
    // it is unpersisted only after the stats line is assembled
    var hashedCache: Option[DataFrame] = None
    var dedupMaxBucket = Int.MaxValue
    // `--dedup-perceptual <maxHamming>` picks the kind's fingerprint
    // (image aHash64 / audio energy-envelope aHash64); `--dedup-images`
    // stays as the image-only spelling. Video has no perceptual hash
    // (no pixel codec in the JDK) — content digest only.
    val perceptual = args.get("dedup-perceptual").orElse(args.get("dedup-images"))
    val survivors: DataFrame = perceptual match {
      case Some(maxHamming) =>
        if (args.contains("dedup-images"))
          require(kind == "image",
            s"--dedup-images is the perceptual image path; --kind $kind " +
              "uses --dedup-perceptual (audio) or --dedup-exact (digest)")
        require(kind == "image" || kind == "audio",
          s"--dedup-perceptual supports image and audio; --kind $kind " +
            "dedups with --dedup-exact (content digest)")
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
          gate(decodeFn(blobs)), idCol, bytesCol,
          if (kind == "audio") Multimodal.audioAHash64
          else Multimodal.imageAHash64)
          .persist()
        hashedCache = Some(hashed)
        val keepers = graft.dedup.Dedup.keepersFromPairs(eligible, idCol,
          Multimodal.imageNearDupPairsFromHashes(hashed, maxHamming.toInt,
            maxBucket, oversizeObs))
        eligible.join(
          keepers.filter(col(idCol) === col("keeper_id")).select(col(idCol)),
          idCol)
      case None if args.get("dedup-exact").contains("true") =>
        // second (and last) blob scan: header-gate + scan-side sha256 in
        // one pass — the digest is a codegen'd projection, so the shuffle
        // (digest groupBy) carries 32-byte hashes + ids, never blobs.
        // Exact-digest keep-first: min id per distinct payload — the
        // kind-agnostic dedup (and the only audio/video one until a
        // perceptual audio fingerprint exists). No bucket cap needed: a
        // spam digest is ONE aggregation group, never a pairwise join.
        val digests = gate(decodeFn(blobs))
          .select(col(idCol), sha2(col(bytesCol), 256).as("__digest"))
        eligible.join(
          digests.groupBy("__digest").agg(min(col(idCol)).as(idCol))
            .select(col(idCol)),
          idCol)
      case None => eligible
    }

    survivors.select((idCol +: metaCols).map(col): _*)
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
    val stats = Map("media_in" -> nIn, "decodable" -> nDecodable,
      "media_out" -> nOut, "near_dups_dropped" -> (nEligible - nOut),
      "oversize_buckets_dropped" -> nOversize)
    println(stats.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"metric":"media_prep","kind":"$kind",""", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("media-prep")(s => run(s, CliArgs.parse(args)))
}
