package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Measures the fixed cost of one Trigger.AvailableNow microbatch run
  * through the parity harness — a minimal 3-row in-memory... file stream
  * with a trivial projection, no stateful operator. This is the floor any
  * stream-parity query pays regardless of data volume; the assertion is
  * generous (smoke), the printed number is the evidence. */
class StreamFloorSpec extends SparkSpec {
  import spark.implicits._

  test("no-op AvailableNow run: measure harness floor") {
    withTimingLock {
    val dir = java.nio.file.Files.createTempDirectory("stream_floor").toFile
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
      .coalesce(1).write.parquet(new java.io.File(dir, "tiny.parquet").toString)
    val src = spark.readStream.schema("id LONG, v DOUBLE")
      .option("pathGlobFilter", "*.parquet")
      .parquet(new java.io.File(dir, "tiny.parquet").toString)
      .select(col("id"), col("v"))
    // warm-up once (class loading, codegen cache), then measure three runs
    StreamParity.runToTable(spark, src, "stream_floor_warm", OutputMode.Append())
    val times = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val out = StreamParity.runToTable(spark, src, s"stream_floor_$i",
        OutputMode.Append())
      val n = out.count()
      assert(n == 3)
      (System.nanoTime() - t0) / 1e9
    }
    info(f"no-op AvailableNow floor: ${times.map(t => f"$t%.3f").mkString(", ")} s")
    assertTiming(times.min < 2.0,
      f"harness floor ${times.min}%.2f s exceeds the 2 s smoke bound")
    }
  }
}
