package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Parity between the two delay-tracker formulations: the classic
  * `flatMapGroupsWithState` (`DelayTracker`) and Spark 4's
  * `transformWithState` (`DelayTrackerTws`) must emit the same gauges
  * for the same deterministic scenario — the inline swap-reset path
  * under continuous traffic (timeout/timer never fires, so the test is
  * clock-exact). TWS runs on the RocksDB state store provider.
  */
class TwsDelaySpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val anchor = 1700000000L

  /** Runs one tracker impl through the inline-emission scenario and
    * returns the emitted (key, max_delay_sec) rows. */
  private def run(
      name: String,
      track: (org.apache.spark.sql.DataFrame, Long, () => Long) =>
        org.apache.spark.sql.Dataset[graft.streaming.DelayTracker.DelayGauge]
  ): Seq[(String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val clock = new java.util.concurrent.atomic.AtomicLong(anchor)
    val ms = MemoryStream[(String, Long)]
    val points = ms.toDF().toDF("key", "point_ts")
    // 10-MINUTE interval >> any plausible wall-time stall: the real
    // processing-time timer cannot fire inside the 30-s poll windows, so
    // emission can only come from the inline elapsed-interval path,
    // deterministic under the injected clock (a 5-s interval could let
    // the timer path win on a stalled host, silently changing which code
    // path the parity assertion exercises)
    val gauges = track(points, 600000L, () => clock.get())
    val q = gauges.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      def deadline = System.currentTimeMillis() + 30000
      ms.addData(("app", anchor - 10)) // delay 10 at t=anchor
      val d1 = deadline
      while (q.recentProgress.map(_.numInputRows).sum < 1 && System.currentTimeMillis() < d1)
        Thread.sleep(100)
      clock.set(anchor + 601) // interval (600 s) elapsed, traffic continues
      ms.addData(("app", anchor + 592)) // delay 9 at t=anchor+601
      def rows() = spark.sql(s"SELECT key, max_delay_sec FROM $name").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      val d2 = deadline
      while (rows().isEmpty && System.currentTimeMillis() < d2) Thread.sleep(100)
      rows()
    } finally q.stop()
  }

  test("transformWithState delay tracker matches the flatMapGroupsWithState formulation") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val fmgws = run("tws_parity_classic",
      (df, i, now) => graft.streaming.DelayTracker.track(df, i, now))
    val tws =
      try {
        spark.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        run("tws_parity_new",
          (df, i, now) => graft.streaming.DelayTrackerTws.track(df, i, now))
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    assert(fmgws === Seq("app" -> 10L), fmgws.mkString(","))
    assert(tws === fmgws, s"tws=$tws fmgws=$fmgws")
  }

  test("TWS tracker fails fast with the conf to set when RocksDB provider is absent") {
    val key = graft.streaming.DelayTrackerTws.ProviderConfKey
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.unset(key) // back to the default HDFS-backed provider
      val points = Seq(("app", anchor)).toDF("key", "point_ts")
      val e = intercept[IllegalArgumentException] {
        graft.streaming.DelayTrackerTws.track(points)
      }
      // actionable: names the conf key, the provider class to set, and
      // the classic-lane alternative
      assert(e.getMessage.contains(key), e.getMessage)
      assert(e.getMessage.contains(graft.streaming.DelayTrackerTws.RocksDbProvider), e.getMessage)
      assert(e.getMessage.contains("DelayTracker.track"), e.getMessage)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("TWS timer path: always-emit keeps ticking 0-gauges through data silence") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val ms = MemoryStream[(String, Long)]
      // local copy: a closure over the spec's `anchor` field would drag
      // the (unserializable) suite instance into the task
      val fixedNow = anchor + 5
      val gauges = graft.streaming.DelayTrackerTws.track(
        ms.toDF().toDF("key", "point_ts"),
        intervalMs = 100, nowSec = () => fixedNow, alwaysEmit = true)
      val q = gauges.writeStream.format("memory").queryName("tws_idle")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .start()
      try {
        ms.addData(("app", anchor)) // delay 5, then silence
        val deadline = System.currentTimeMillis() + 60000
        def rows() = spark.sql("SELECT max_delay_sec FROM tws_idle").collect().map(_.getLong(0))
        // handleExpiredTimer: the accumulated 5 flushes on the first
        // expiry, then re-armed timers tick 0-gauges forever (delay.go:35-39)
        while (rows().length < 3 && System.currentTimeMillis() < deadline) Thread.sleep(100)
        val got = rows()
        assert(got.count(_ == 5L) === 1, got.mkString(","))
        assert(got.count(_ == 0L) >= 2, got.mkString(","))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
