package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: schema/kind mapping, stub decode agreement between
  * the expression path and the mapPartitions batch path, frame sampling
  * boundary cases, feature vector shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "x" * 100), (1L, "y" * 64), (2L, "z" * 65), (3L, "")
  ).toDF("doc_id", "text")

  private lazy val media = Multimodal.syntheticMedia(docs, "doc_id", "text")

  test("kind cycles image/audio/video by id") {
    val kinds = media.orderBy("media_id").select("kind").collect().map(_.getString(0))
    assert(kinds === Array("image", "audio", "video", "image"))
  }

  test("decodeStub and decodeBatch (mapPartitions) produce identical metadata") {
    val viaExpr = media.select(col("media_id"),
        Multimodal.decodeStub(col("bytes")).as("m"))
      .select(col("media_id"), col("m.width"), col("m.height"), col("m.duration_s"))
      .collect().map(_.toSeq).toSet
    val viaBatch = Multimodal.decodeBatch(media)
      .select("media_id", "width", "height", "duration_s")
      .collect().map(_.toSeq).toSet
    assert(viaExpr === viaBatch)
  }

  test("sampleFrames: exact chunking incl. partial tail and empty payload") {
    // 100 bytes @32-byte frames → 4 frames (3 full + 4-byte tail); everyN=2 → idx 0,2
    val frames = Multimodal.sampleFrames(
        media.filter(col("media_id") === 0), "bytes", frameBytes = 32, everyN = 2)
      .select(col("frame_idx"), length(col("frame")).as("len"))
      .orderBy("frame_idx").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(frames === Array((0, 32), (2, 32)))
    // empty payload → no frames (sequence(0, max(nFrames-1,0)) guards via substr)
    val empty = Multimodal.sampleFrames(
      media.filter(col("media_id") === 3), "bytes", 32, 1)
    assert(empty.filter(length(col("frame")) > 0).count() === 0)
  }

  test("featureStub emits fixed-dim deterministic float vectors") {
    val f = media.select(Multimodal.featureStub(col("bytes"), 16).as("f"))
      .collect().map(_.getSeq[Float](0))
    assert(f.forall(_.length == 16))
    assert(f.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
    val again = media.select(Multimodal.featureStub(col("bytes"), 16).as("f"))
      .collect().map(_.getSeq[Float](0))
    assert(f.toSeq === again.toSeq)
  }
}
