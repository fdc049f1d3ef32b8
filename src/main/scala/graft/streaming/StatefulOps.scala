package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-series running stats carried across micro-batches. */
case class SeriesStats(id: String, n: Long, maxValue: Double, lastTime: Timestamp)

/** Input point shape for stateful series ops (top-level: encoder codegen
  * cannot access classes nested inside the object). */
case class SeriesPoint(id: String, time: Timestamp, value: Double)

/** Custom streaming state — the `mapGroupsWithState` shapes a series store
  * needs beyond windowed aggregation (SURVEY.md §2.9 extension).
  */
object StatefulOps {

  /** Streaming exact dedup on (id, time): built-in watermarked
    * drop-duplicates — state is bounded by the watermark horizon, late
    * duplicates inside it are suppressed. */
  def dedupeStream(stream: DataFrame, watermarkDelay: String = "1 hour",
      timeCol: String = "time", keys: Seq[String] = Seq("id")): DataFrame =
    stream
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys :+ timeCol)

  /** mapGroupsWithState: per series id, fold each micro-batch's points into
    * persistent (count, max, last-time) state and emit the updated stats —
    * the custom-state primitive the reference's cron-plus-store loop
    * becomes when run continuously. State lives in the state store
    * (checkpointed, recoverable). Pass `idleTimeout` to evict series that
    * go quiet — without it, a high-cardinality id space grows the state
    * store monotonically. */
  def runningSeriesStats(stream: DataFrame,
      idCol: String = "id", timeCol: String = "time",
      valueCol: String = "value",
      idleTimeout: Option[String] = None): Dataset[SeriesStats] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val timeoutConf = idleTimeout.fold(GroupStateTimeout.NoTimeout)(
      _ => GroupStateTimeout.ProcessingTimeTimeout)
    stream
      .select(col(idCol).as("id"), col(timeCol).as("time"), col(valueCol).as("value"))
      .as[SeriesPoint]
      .groupByKey(_.id)
      .mapGroupsWithState[SeriesStats, SeriesStats](timeoutConf) {
        (id: String, points: Iterator[SeriesPoint], state: GroupState[SeriesStats]) =>
          val prev = state.getOption.getOrElse(
            SeriesStats(id, 0L, Double.NegativeInfinity, new Timestamp(0L)))
          if (state.hasTimedOut) {
            // series went idle: evict state, emit its final snapshot
            state.remove()
            prev
          } else {
            val updated = points.foldLeft(prev) { (acc, p) =>
              SeriesStats(id, acc.n + 1, math.max(acc.maxValue, p.value),
                if (p.time.after(acc.lastTime)) p.time else acc.lastTime)
            }
            state.update(updated)
            idleTimeout.foreach(state.setTimeoutDuration)
            updated
          }
      }
  }

  /** Output mode required by mapGroupsWithState sinks. */
  val StatsOutputMode: OutputMode = OutputMode.Update()
}
