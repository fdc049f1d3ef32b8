package graft.cli

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end media-prep CLI: per-kind decode gate → metadata floors →
  * dedup (perceptual for images, exact digest for audio/video) →
  * survivor table, and the stats contract. */
class MediaPrepSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, mark: Option[(Int, Int)] = None): Array[Byte] =
    graft.TestImages.gradient(w, h, "png", mark)

  test("--max-bucket drops spam band buckets whole; 0 uncaps") {
    val dir = Files.createTempDirectory("media_spam").toString
    // 8 byte-identical images: one 8-member bucket in every band
    (1L to 8L).map(i => (i, png(32, 32))).toDF("media_id", "bytes")
      .write.parquet(s"$dir/in")
    val capped = MediaPrep.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/outc",
      "dedup-images" -> "3", "max-bucket" -> "5"))
    assert(capped("near_dups_dropped") === 0L,
      "oversize buckets drop whole → everything keeps itself")
    assert(capped("media_out") === 8L)
    assert(capped("oversize_buckets_dropped") === 4L,
      "8 identical hashes = one oversize bucket in each of the 4 bands, " +
        "counted in-pass by the observation")
    // non-numeric ids fail fast at the driver, not as an executor CCE
    Seq(("uuid-1", png(32, 32))).toDF("media_id", "bytes")
      .write.parquet(s"$dir/in_str")
    val e = intercept[IllegalArgumentException] {
      MediaPrep.run(spark, Map(
        "in" -> s"$dir/in_str", "out" -> s"$dir/oute", "dedup-images" -> "3"))
    }
    assert(e.getMessage.contains("must be numeric"))
    val uncapped = MediaPrep.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/outu",
      "dedup-images" -> "3", "max-bucket" -> "0"))
    assert(uncapped("media_out") === 1L)
    assert(uncapped("near_dups_dropped") === 7L)
  }

  test("decode gate, size floor and near-dup collapse compose; stats are consistent") {
    val dir = Files.createTempDirectory("media_prep").toString
    Seq(
      (1L, png(64, 64)),                         // keeper of the dup group
      (2L, png(64, 64)),                         // exact pixel dup of 1
      (3L, png(64, 64, mark = Some((48, 48)))),  // near-edit of 1
      (4L, png(64, 64, mark = Some((0, 0)))),    // distinct edit
      (5L, png(8, 64)),                          // below the width floor
      (6L, "not an image at all".getBytes)       // undecodable
    ).toDF("media_id", "bytes").write.parquet(s"$dir/in")

    val stats = MediaPrep.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/out",
      "min-width" -> "16", "dedup-images" -> "16"))
    assert(stats("media_in") === 6)
    assert(stats("decodable") === 5, "the junk row fails the decode gate")
    assert(stats("media_out") + stats("near_dups_dropped") === 4,
      "size floor leaves 4; dedup splits them into survivors + dropped")
    val kept = spark.read.parquet(s"$dir/out/keep")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L), "group minimum survives")
    assert(!kept.contains(2L) && !kept.contains(3L),
      "pixel dup and near-edit collapse under the keeper")
    assert(!kept.contains(5L) && !kept.contains(6L))
    // survivors carry the decoded metadata columns
    val row = spark.read.parquet(s"$dir/out/keep")
      .filter($"media_id" === 1L).head()
    assert(row.getAs[Int]("width") === 64 && row.getAs[String]("format") === "png")
  }

  test("--kind audio: decode gate, duration/sample-rate floors, exact-digest dedup") {
    import graft.multimodal.Multimodal
    val dir = Files.createTempDirectory("media_audio").toString
    // synthesizeWavs params are id mod (8, 2, 100): ids 51 and 851
    // produce BYTE-IDENTICAL payloads (the exact-dup pair, 52 frames at
    // 11 kHz = 4.7 ms); id 7 lasts 8/15000 s = 0.53 ms; id 2 lasts
    // 3/10000 s = 0.3 ms — under the 0.4 ms floor
    val wavs = Multimodal.synthesizeWavs(
      Seq(51L, 2L, 7L, 851L).toDF("id"), "id")
    val junk = Seq((999L, "not audio".getBytes)).toDF("media_id", "bytes")
    wavs.toDF("media_id", "bytes").unionByName(junk)
      .write.parquet(s"$dir/in")

    val stats = MediaPrep.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/out", "kind" -> "audio",
      "min-duration" -> "0.0004", "dedup-exact" -> "true"))
    assert(stats("media_in") === 5)
    assert(stats("decodable") === 4, "the junk row fails the audio decode gate")
    // id 2: 3 frames / 10 kHz = 0.0003 s < floor → dropped by the floor;
    // 51 and 851 are byte-identical → 851 collapses under keeper 51
    assert(stats("media_out") === 2)
    assert(stats("near_dups_dropped") === 1)
    val kept = spark.read.parquet(s"$dir/out/keep")
    assert(kept.select("media_id").collect().map(_.getLong(0)).toSet === Set(51L, 7L))
    val r7 = kept.filter($"media_id" === 7L).head()
    assert(r7.getAs[Int]("sample_rate_hz") === 15000)
    // a floor that does not exist for the kind fails fast
    val e = intercept[RuntimeException] {
      MediaPrep.run(spark, Map("in" -> s"$dir/in", "out" -> s"$dir/oute",
        "kind" -> "audio", "min-width" -> "8"))
    }
    assert(e.getMessage.contains("does not apply"))
  }

  test("--kind audio --dedup-perceptual: volume-scaled copies collapse") {
    import graft.multimodal.Multimodal
    val dir = Files.createTempDirectory("media_audio_perc").toString
    // distinct burst RHYTHMS (the triangle synth's envelope is flat, so
    // every id would hash alike): id 3 bursts early, id 7 bursts late —
    // far apart; 1003 is id 3 at half volume — envelope hash identical,
    // bytes (and so the exact digest) different
    def wav(samples: Array[Int]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val early = Array.tabulate(640)(i => if (i < 200) 8000 else 100)
    val late = Array.tabulate(640)(i => if (i >= 440) 8000 else 100)
    Seq((3L, wav(early)), (7L, wav(late)), (1003L, wav(early.map(_ / 2))))
      .toDF("media_id", "bytes").write.parquet(s"$dir/in")

    val stats = MediaPrep.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/out", "kind" -> "audio",
      "dedup-perceptual" -> "2"))
    assert(stats("media_in") === 3 && stats("decodable") === 3)
    assert(stats("media_out") === 2 && stats("near_dups_dropped") === 1)
    val kept = spark.read.parquet(s"$dir/out/keep")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 7L), s"the half-volume copy collapses: $kept")
    // --dedup-images stays image-only; video rejects perceptual entirely
    val e1 = intercept[IllegalArgumentException] {
      MediaPrep.run(spark, Map("in" -> s"$dir/in", "out" -> s"$dir/oute",
        "kind" -> "audio", "dedup-images" -> "2"))
    }
    assert(e1.getMessage.contains("--dedup-images"))
    val e2 = intercept[IllegalArgumentException] {
      MediaPrep.run(spark, Map("in" -> s"$dir/in", "out" -> s"$dir/outv",
        "kind" -> "video", "dedup-perceptual" -> "2"))
    }
    assert(e2.getMessage.contains("--dedup-perceptual"))
  }

  test("--kind video: header decode gate, dimension/duration floors, exact-digest dedup") {
    import graft.multimodal.Multimodal
    val dir = Files.createTempDirectory("media_video").toString
    // synthesizeVideos params are id mod (2, 64, 48, 500): ids 10 and
    // 24010 produce byte-identical MP4s (11/16 s); id 4 lasts
    // (4%500+1)/16 = 0.3125 s (under the 0.5 s floor); id 11 is an AVI
    val vids = Multimodal.synthesizeVideos(
      Seq(10L, 4L, 11L, 24010L).toDF("id"), "id")
    val junk = Seq((999L, "not a video container".getBytes)).toDF("media_id", "bytes")
    vids.toDF("media_id", "bytes").unionByName(junk)
      .write.parquet(s"$dir/in")

    val stats = MediaPrep.run(spark, Map(
      "in" -> s"$dir/in", "out" -> s"$dir/out", "kind" -> "video",
      "min-duration" -> "0.5", "dedup-exact" -> "true"))
    assert(stats("media_in") === 5)
    assert(stats("decodable") === 4, "the junk row fails the container parse")
    assert(stats("media_out") === 2, "floor drops id 4; digest collapses 24010 under 10")
    assert(stats("near_dups_dropped") === 1)
    val kept = spark.read.parquet(s"$dir/out/keep")
    assert(kept.select("media_id").collect().map(_.getLong(0)).toSet === Set(10L, 11L))
    val r11 = kept.filter($"media_id" === 11L).head()
    assert(r11.getAs[String]("format") === "avi")
    assert(r11.getAs[Int]("width") === 11 % 64 + 16)
    // perceptual image dedup stays image-only
    val e = intercept[IllegalArgumentException] {
      MediaPrep.run(spark, Map("in" -> s"$dir/in", "out" -> s"$dir/oute",
        "kind" -> "video", "dedup-images" -> "3"))
    }
    assert(e.getMessage.contains("--dedup-exact"))
  }
}
