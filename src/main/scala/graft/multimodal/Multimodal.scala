package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch decoders.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libs) — `realDecoder` is the hook where libjpeg/ffmpeg-backed code plugs
  * in. Everything Spark-side is real and tested: schema, partitioning,
  * batch shape, binary slicing, feature output types.
  *
  * Scale notes: media bytes never pass through a shuffle — metadata and
  * features are extracted in a scan-side projection / mapPartitions, and
  * downstream joins carry only (id, features). Partition sizing for blob
  * columns: spark.sql.files.maxPartitionBytes should be tuned down so a
  * partition of multi-MB blobs still fits executor memory.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Build a media table from any (id, text) source — the text bytes stand
    * in for encoded media so the pipeline is runnable and deterministic. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      col(textCol).cast("binary").as("bytes"),
      map(lit("src"), lit("synthetic")).as("meta"))

  /** STUB decode: deterministic pseudo-metadata from byte statistics, shaped
    * like a real decoder's output (width/height/duration). A production
    * build replaces the body with a codec call — see `realDecoder`. */
  def decodeStub(bytes: Column): Column = {
    val n = length(bytes).cast("long")
    struct(
      (pmod(n, lit(640L)) + lit(1L)).as("width"),
      (pmod(n * lit(7L), lit(480L)) + lit(1L)).as("height"),
      (n / lit(100.0)).as("duration_s"))
  }

  /** Where a real codec plugs in (libjpeg / ffmpeg via JNI or subprocess);
    * intentionally unimplemented in this container. */
  def realDecoder(bytes: Array[Byte]): Nothing = ???

  /** Fixed-size "frame" sampling from a binary payload: every `everyN`-th
    * chunk of `frameBytes` bytes, the final (possibly partial) chunk
    * included — the Spark-side shape of video frame extraction (binary
    * slicing stays codegen'd, no UDF). */
  def sampleFrames(df: DataFrame, bytesCol: String, frameBytes: Int, everyN: Int): DataFrame = {
    // ceil(len / frameBytes) via exact integer arithmetic; empty payloads
    // yield an empty index array (→ no rows), not a phantom frame 0
    val nFrames = expr(s"CAST((octet_length($bytesCol) + ${frameBytes - 1}) DIV $frameBytes AS INT)")
    val idxs = when(nFrames > 0,
      filter(sequence(lit(0), nFrames - 1), i => pmod(i, lit(everyN)) === 0))
      .otherwise(array().cast("array<int>"))
    df.withColumn("frame_idx", explode(idxs))
      .withColumn("frame",
        col(bytesCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
  }

  /** Per-partition batch decode: the mapPartitions shape a Pandas-UDF-style
    * batch decoder uses. The decode itself is the deterministic stub; the
    * iterator/batch plumbing, schema and encoder handling are real. */
  def decodeBatch(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", LongType), StructField("height", LongType),
      StructField("duration_s", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val n = bytes.length.toLong
        // deterministic stand-in for realDecoder(bytes); Seq[Any] keeps the
        // Longs from widening to Double (BIGINT fields must stay Long)
        Row.fromSeq(r.toSeq ++ Seq[Any](n % 640 + 1, (n * 7) % 480 + 1, n / 100.0))
      }
    }(enc)
  }

  /** Deterministic integer lattice underlying the fake features: per
    * dimension, three md5-hex character codes of `md5(bytes || '#' || i)`
    * folded into [0, 1000). Built only from md5/ascii/substr so an external
    * SQL engine (the DuckDB oracle) recomputes it bit-for-bit — unlike
    * xxhash64, whose seeding is Spark-internal. */
  def featureLattice(bytes: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i => {
      val h = md5(concat(bytes.cast("string"), lit("#"), i.cast("string")))
      pmod(
        ascii(h.substr(lit(1), lit(1))) * lit(17) +
          ascii(h.substr(lit(2), lit(1))) * lit(7) +
          ascii(h.substr(lit(3), lit(1))),
        lit(1000))
    })

  /** Fake feature extraction: fixed-dim float vector from chunk hashes —
    * the output shape/type of an embedding model over decoded media. Values
    * are `featureLattice / 1000` so the float vector is certified by the
    * lattice's exact integer oracle. */
  def featureStub(bytes: Column, dim: Int): Column =
    // outer cast back to float: Spark's Divide promotes to double
    transform(featureLattice(bytes, dim), v => (v / lit(1000.0)).cast("float"))
}
