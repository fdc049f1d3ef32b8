package graft.cli

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end image-prep CLI: decode gate → size floor → perceptual
  * near-dup collapse → survivor table, and the stats contract. */
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
    assert(capped("images_out") === 8L)
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
    assert(uncapped("images_out") === 1L)
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
    assert(stats("images_in") === 6)
    assert(stats("decodable") === 5, "the junk row fails the decode gate")
    assert(stats("images_out") + stats("near_dups_dropped") === 4,
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
}
