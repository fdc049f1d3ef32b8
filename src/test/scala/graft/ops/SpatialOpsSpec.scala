package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IDW interpolation (E82): hand-checkable weighted means, the exact-hit
  * singularity rule, k-selection with deterministic ties. */
class SpatialOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val stations = Seq(
    (1L, 0L, 0L, 10.0),
    (2L, 4L, 0L, 20.0),
    (3L, 0L, 4L, 30.0),
    (4L, 50L, 50L, 999.0) // far away — outside k=3 for near cells
  ).toDF("sid", "x", "y", "v")

  test("weighted mean matches the hand-computed Shepard form") {
    val targets = Seq((100L, 2L, 0L)).toDF("cell", "x", "y")
    // distances²: s1=4, s2=4, s3=20, s4 far (excluded at k=3)
    val got = SpatialOps.idwInterpolate(targets, stations, "cell", "sid", "v", k = 3)
      .head.getDouble(1)
    val num = 10.0 / 4 + 20.0 / 4 + 30.0 / 20
    val den = 1.0 / 4 + 1.0 / 4 + 1.0 / 20
    val want = BigDecimal(num / den).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want, s"$got vs $want (output rounds to 5 decimals)")
  }

  test("a cell exactly on a station takes that station's value") {
    val targets = Seq((100L, 4L, 0L)).toDF("cell", "x", "y")
    val got = SpatialOps.idwInterpolate(targets, stations, "cell", "sid", "v", k = 3)
      .head.getDouble(1)
    assert(got == 20.0)
  }

  test("k=1 degenerates to the nearest-station lookup (S5 semantics)") {
    val targets = Seq((100L, 1L, 0L), (101L, 0L, 3L)).toDF("cell", "x", "y")
    val got = SpatialOps.idwInterpolate(targets, stations, "cell", "sid", "v", k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(100L -> 10.0, 101L -> 30.0))
  }

  test("equidistant tie at the k cutoff resolves by station id") {
    // two stations at d2=16 from (0,0); k=1 must pick the lower id
    val st = Seq((7L, 4L, 0L, 1.0), (5L, 0L, 4L, 2.0)).toDF("sid", "x", "y", "v")
    val targets = Seq((1L, 0L, 0L)).toDF("cell", "x", "y")
    val got = SpatialOps.idwInterpolate(targets, st, "cell", "sid", "v", k = 1)
      .head.getDouble(1)
    assert(got == 2.0, "station 5 (lower id) wins the tie")
  }
}
