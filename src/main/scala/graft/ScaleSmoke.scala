package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-scale throughput smoke: the headline raincell workload — a
  * 4-day flo2d_150_v2 run is 384 timesteps × 39,526 grid cells ≈ 15.2 M
  * deck lines (reference: input/raincell/gen_raincell.py:124-142,
  * res/grids/flo2d_150_v2m.csv). The reference does one MySQL proc call per
  * timestep plus single-threaded string building; here it is one plan:
  * synthesize the series, bucket, format, range-partitioned ordered write.
  *
  * `runMain graft.ScaleSmoke [stepsMultiplier]` — prints one JSON line.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val steps = 384 * mult
    val cells = 39526
    val start = "2024-01-01 00:00:00"
    val startUs = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val end = new java.sql.Timestamp(startUs / 1000L + steps.toLong * 15 * 60000L)
      .toString.stripSuffix(".0")

    // synthetic (time, cell_id, value): one row per (step, cell)
    val df = spark.range(steps.toLong * cells)
      .select(
        timestamp_micros(lit(startUs) +
          (col("id") / cells + 1).cast("long") * 900000000L).as("time"),
        (pmod(col("id"), lit(cells)) + 1).cast("int").as("cell_id"),
        round(rand(42) * 10, 2).as("value"))

    val outDir = java.nio.file.Files.createTempDirectory("raincell_scale").toString
    val t0 = System.nanoTime()
    val deck = graft.decks.RaincellDeck.lines(spark, df, start, end, "flo2d_150_v2")
    graft.io.OrderedTextSink.writePartFiles(deck, s"$outDir/RAINCELL", cpus.toInt)
    val secs = (System.nanoTime() - t0) / 1e9

    val lines = spark.read.text(s"$outDir/RAINCELL").count()
    println(s"""{"metric":"raincell_scale","steps":$steps,"cells":$cells,""" +
      s""""lines":$lines,"seconds":$secs,"lines_per_sec":${(lines / secs).toLong}}""")
    spark.stop()
  }
}
