package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Fuzz the pure-byte video container parsers: arbitrary garbage, mutated
  * valid headers, and adversarial size fields must never throw, never loop,
  * and either parse to plausible metadata or return None. The parsers walk
  * caller-supplied length fields — the classic out-of-bounds/overflow
  * surface — so this is the spec that pins their bounds discipline. */
class VideoFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(31L + i)))

  private def vid(id: Long): Array[Byte] =
    Multimodal.synthesizeVideos(Seq(id).toDF("doc_id"), "doc_id")
      .collect()(0).getAs[Array[Byte]]("bytes")

  test("random byte blobs never throw; magic-prefixed garbage never throws") {
    val blobs = sample(Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)), 200)
    blobs.foreach { b =>
      Multimodal.decodeVideo(b) // must not throw
      // the same garbage behind each container magic must not throw either
      Multimodal.decodeVideo("RIFF".getBytes ++ b)
      Multimodal.decodeVideo(Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes ++ b)
    }
  }

  test("single-byte mutations of valid MP4/AVI headers never throw or loop") {
    val mp4 = vid(0L)
    val avi = vid(1L)
    val deadline = System.nanoTime() + 60_000_000_000L
    for (base <- Seq(mp4, avi); pos <- base.indices; delta <- Seq(1, 0x7f, 0xff)) {
      val m = base.clone()
      m(pos) = (m(pos) + delta).toByte
      Multimodal.decodeVideo(m) match {
        case Some(meta) => // mutated-but-parseable is fine; fields stay sane
          assert(meta.durationS >= 0 && !meta.durationS.isNaN &&
            meta.width > 0 && meta.height > 0,
            s"insane metadata $meta after mutating offset $pos by $delta")
        case None => ()
      }
      assert(System.nanoTime() < deadline,
        s"parser too slow (possible loop) after mutating offset $pos")
    }
  }

  test("double-wrapping 64-bit largesize cannot cycle the box walk") {
    // box(24, free) whose payload encodes a second size==1/largesize pair
    // at the offset a wrapped walk would revisit, then a size==1 box whose
    // largesize ~2^63 makes `o + size` wrap negative: with a naive bounds
    // check the walk cycles 0 → 24 → -(2^63)+8 → 0 forever. The
    // subtraction-form check must terminate it immediately.
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val blob =
      be32(24) ++ "free".getBytes ++           // [0..7]
      be32(1) ++ "moov".getBytes ++            // [8..15] (revisit target)
      be64(Long.MaxValue - 7) ++               // [16..23]
      be32(1) ++ "moov".getBytes ++            // [24..31]
      be64(Long.MaxValue - 15)                 // [32..39]
    val t0 = System.nanoTime()
    assert(Multimodal.decodeVideo(blob).isEmpty)
    assert(System.nanoTime() - t0 < 5_000_000_000L, "walk must terminate")
  }

  test("a moov with thousands of empty trak boxes neither overflows the stack nor loops") {
    def b32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, p: Array[Byte]) = b32(p.length + 8L) ++ t.getBytes ++ p
    val mvhd = box("mvhd", b32(0) ++ b32(0) ++ b32(0) ++ b32(16) ++ b32(32))
    val emptyTrak = box("trak", Array.empty[Byte])
    val moov = box("moov",
      mvhd ++ Array.fill(20000)(emptyTrak).flatten)
    // dims-less traks all the way down → no video track → None, reached by
    // an ITERATIVE sibling walk (a recursive one would StackOverflowError,
    // which escapes the NonFatal catch and would kill a Spark task)
    assert(Multimodal.decodeVideo(moov).isEmpty)
  }

  test("adversarial size fields: zero, 64-bit, and overflowing boxes terminate cleanly") {
    // top-level box with size 0 (= to-end) but wrong type, then truncation
    val toEnd = Array[Byte](0, 0, 0, 0) ++ "free".getBytes ++ new Array[Byte](20)
    assert(Multimodal.decodeVideo(toEnd).isEmpty)
    // 64-bit size marker (size == 1) with a largesize pointing past the end
    val large = Array[Byte](0, 0, 0, 1) ++ "moov".getBytes ++
      Array[Byte](0, 0, 0, 0, 0x7f.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      new Array[Byte](32)
    assert(Multimodal.decodeVideo(large).isEmpty)
    // RIFF chunk whose little-endian size wraps negative territory
    val wrap = "RIFF".getBytes ++ Array[Byte](0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte,
        0x7f.toByte) ++ new Array[Byte](16)
    assert(Multimodal.decodeVideo(wrap).isEmpty)
  }
}
