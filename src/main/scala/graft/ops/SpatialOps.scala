package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial interpolation — the hydrology-side extension of the reference's
  * nearest-station lookup (S5, `Sources.nearestStation`): FLO-2D's raincell
  * deck maps every grid cell to its single nearest gauge
  * (reference: input/raincell/gen_raincell.py nearest-method); inverse-
  * distance weighting over the k nearest gauges is the standard upgrade
  * (Shepard 1968) and the shape a distributed engine should own.
  */
object SpatialOps {

  /** Inverse-distance-weighted interpolation: each target cell takes
    * Σ vᵢ/d²ᵢ / Σ 1/d²ᵢ over its `k` nearest stations (power-2 Shepard
    * weights); a cell sitting exactly on a station takes that station's
    * value (the 1/0 singularity rule). `stations` is a DIMENSION —
    * broadcast onto the cell frame, ranked per cell by (squared distance,
    * station id). Shuffle honesty: the rank window exchanges the
    * cells × stations CANDIDATE rows (slim (cell, sid, d², v) tuples, the
    * same volume the broadcast join emits — NOT just k rows per cell; the
    * per-cell k-row combine after the rank filter is the second, small
    * exchange). Fine for gauge-network-sized dimensions (10²-10⁴
    * stations); for larger station sets prune candidates first with a
    * coarse spatial cell join (the E81 Z-order key gives the bucketing).
    * Determinism: integer coordinates make d² exact; the weighted sums
    * fold a rank-SORTED neighbor array left-to-right (`aggregate` HOF), so
    * float accumulation order is pinned — a bare `sum()` over a group is
    * not (partial-aggregation order is partition-dependent).
    *
    * Columns: targets (cellCol, "x", "y"); stations (stationCol, "x", "y",
    * valueCol). Coordinates integral (cast to long internally). */
  def idwInterpolate(targets: DataFrame, stations: DataFrame,
      cellCol: String, stationCol: String, valueCol: String,
      k: Int = 4, roundTo: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val st = stations.select(
      col(stationCol).as("__sid"),
      col("x").cast("long").as("__sx"), col("y").cast("long").as("__sy"),
      col(valueCol).as("__sv"))
    val dx = col("x").cast("long") - col("__sx")
    val dy = col("y").cast("long") - col("__sy")
    val d2 = (dx * dx + dy * dy).as("__d2")
    val w = Window.partitionBy(col(cellCol)).orderBy(col("__d2"), col("__sid"))
    val ranked = targets.crossJoin(broadcast(st))
      .withColumn("__d2", d2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    val nb = ranked.groupBy(col(cellCol))
      .agg(array_sort(collect_list(
        struct(col("__rn").as("rn"), col("__d2").as("d2"), col("__sv").as("v"))))
        .as("__nb"))
    val num = aggregate(col("__nb"), lit(0.0),
      (acc, e) => acc + e.getField("v") / e.getField("d2").cast("double"))
    val den = aggregate(col("__nb"), lit(0.0),
      (acc, e) => acc + lit(1.0) / e.getField("d2").cast("double"))
    val nearest = element_at(col("__nb"), 1)
    nb.select(col(cellCol),
      round(
        when(nearest.getField("d2") === 0L, nearest.getField("v"))
          .otherwise(num / den),
        roundTo).as("idw_value"))
  }
}
