package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** O17 with exact reference semantics (`delay.go:15-39`): a lock-free
  * atomic max of pipeline delay, swap-reset and emitted every interval.
  *
  * The plain windowed-max version is in Aggregations/StreamPipeline; this
  * is the `flatMapGroupsWithState` formulation for when the *reset*
  * contract matters: each emitted gauge covers exactly one interval, state
  * is a single long per key (bounded), and a processing-time timeout
  * triggers the swap — the Spark analog of the 15-second ticker goroutine.
  */
object DelayTracker {

  final case class DelayState(maxDelaySec: Long)
  final case class DelayGauge(key: String, max_delay_sec: Long)

  /** point-timestamped rows (key, point_ts) → per-key max-delay gauges,
    * emitted when the interval timeout fires, then reset (swap). `nowSec`
    * is injectable for deterministic tests. */
  def track(
      points: DataFrame,
      intervalMs: Long = 15000,
      nowSec: () => Long = () => System.currentTimeMillis() / 1000
  ): Dataset[DelayGauge] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("key").cast("string"), col("point_ts").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DelayState, DelayGauge](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout
      ) { (key, rows, state: GroupState[DelayState]) =>
        if (state.hasTimedOut) {
          // the 15-s tick: emit the gauge and swap-reset (delay.go:35-39)
          val gauge = DelayGauge(key, state.getOption.map(_.maxDelaySec).getOrElse(0L))
          state.remove()
          Iterator(gauge)
        } else {
          val now = nowSec()
          val incoming = rows.map(r => now - r._2).foldLeft(0L)(math.max)
          val merged = math.max(incoming, state.getOption.map(_.maxDelaySec).getOrElse(0L))
          state.update(DelayState(merged))
          state.setTimeoutDuration(intervalMs)
          Iterator.empty
        }
      }
  }
}
