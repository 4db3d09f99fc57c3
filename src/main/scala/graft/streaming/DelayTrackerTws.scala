package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** O17 (`delay.go:15-39`) on Spark 4's `transformWithState` — the
  * successor API to `flatMapGroupsWithState` (which `DelayTracker` keeps
  * in its classic formulation). Same contract, new vocabulary:
  * `GroupState` + `setTimeoutDuration` becomes `ValueState[DelayState]`
  * + an explicit per-key processing-time timer, with the silence tick in
  * `handleExpiredTimer` instead of `state.hasTimedOut`. Re-arming
  * replaces the timer (delete + register — TWS timers are absolute
  * timestamps, not durations, and don't overwrite).
  *
  * Requires the RocksDB state store provider (the TWS backend) —
  * [[track]] verifies `spark.sql.streaming.stateStore.providerClass` up
  * front and fails with the exact conf to set, instead of the opaque
  * `STATE_STORE_INVALID_PROVIDER`-style error the query would otherwise
  * die with at start.
  *
  * Emission semantics (same contract as the classic lane,
  * `StreamPipeline.scala` meta-series doc): gauges are APPEND-mode —
  * each emitted row covers exactly one closed interval, never revised.
  * After a checkpoint restart the last in-flight interval's batch
  * replays, so the gauge for that interval can ship twice with the same
  * (key, value); the downstream receiver is assumed last-write-wins on
  * identical (metric, tags, ts) — Datadog gauge points at the same
  * timestamp overwrite, making the replay idempotent (`delay.go:15-39`
  * has the same property: the ticker re-reads whatever the atomic held).
  */
object DelayTrackerTws {
  import DelayTracker.{DelayGauge, DelayState}

  final class DelayProcessor(
      intervalMs: Long,
      nowSec: () => Long,
      alwaysEmit: Boolean
  ) extends StatefulProcessor[String, (String, Long), DelayGauge] {

    @transient private var state: ValueState[DelayState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DelayState](
        "delay", Encoders.product[DelayState], TTLConfig.NONE)

    private def rearm(tv: TimerValues): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + intervalMs)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[DelayGauge] = {
      val now = nowSec()
      val incoming = rows.map(r => now - r._2).foldLeft(0L)(math.max)
      val prev = if (state.exists()) Some(state.get()) else None
      val start = prev.map(_.intervalStartSec).getOrElse(now)
      val merged = math.max(incoming, prev.map(_.maxDelaySec).getOrElse(0L))
      rearm(timerValues)
      if ((now - start) * 1000 >= intervalMs) {
        // interval elapsed under continuous traffic: emit inline and
        // start a fresh interval (swap-reset)
        state.update(DelayState(0L, now))
        Iterator.single(DelayGauge(key, merged))
      } else {
        state.update(DelayState(merged, start))
        Iterator.empty
      }
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DelayGauge] = {
      // silence tick: emit the gauge and swap-reset (delay.go:35-39)
      val gauge =
        DelayGauge(key, if (state.exists()) state.get().maxDelaySec else 0L)
      if (alwaysEmit) {
        // reference parity: the ticker never stops — re-arm and keep
        // emitting 0-gauges while idle
        state.update(DelayState(0L, nowSec()))
        getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + intervalMs)
      } else state.clear()
      Iterator.single(gauge)
    }
  }

  val ProviderConfKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Same surface as `DelayTracker.track`. Fails fast (with the conf to
    * set) when the session isn't on the RocksDB state store provider —
    * checking here is deliberate: the conf is read at query START, so a
    * check at track() time is both early enough to be friendly and late
    * enough to see the session the query will actually run on.
    */
  def track(
      points: DataFrame,
      intervalMs: Long = 15000,
      nowSec: () => Long = () => System.currentTimeMillis() / 1000,
      alwaysEmit: Boolean = false
  ): Dataset[DelayGauge] = {
    val spark = points.sparkSession
    import spark.implicits._
    val provider = spark.conf.getOption(ProviderConfKey).getOrElse("")
    require(
      provider.contains("RocksDBStateStoreProvider"),
      s"DelayTrackerTws.track runs on transformWithState, which requires the " +
        s"RocksDB state store provider. Before starting the query, set\n" +
        s"""  spark.conf.set("$ProviderConfKey",\n    "$RocksDbProvider")\n""" +
        s"(current: ${if (provider.isEmpty) "<unset, default HDFS-backed>" else provider}). " +
        s"Alternatively use graft.streaming.DelayTracker.track — the " +
        s"flatMapGroupsWithState formulation with identical semantics — " +
        s"which runs on the default provider.")
    points
      .select(col("key").cast("string"), col("point_ts").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new DelayProcessor(intervalMs, nowSec, alwaysEmit),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
