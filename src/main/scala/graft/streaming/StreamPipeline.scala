package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.parse.LogParse
import graft.routes.RouteEngine
import graft.project.MetricProject

/** O1/O2/O14/O15 — the streaming wrapper around the kayvee pipeline.
  *
  * Reference wiring (`main.go:54-59,85-86`): KCL source → 5 s / 100-record
  * micro-batches per routing tag → Datadog/CloudWatch submit with 5×
  * exponential-backoff retry (50 ms base) → failed records spilled to a
  * file. Spark mapping: any `readStream` source (file/socket/kinesis
  * connector in prod; MemoryStream in tests) → the SAME declarative
  * parse/route/project operators (they are stateless narrow ops, so the
  * logical plan is incrementalizable untouched) → `foreachBatch` sink that
  * groups by tag, retries, and appends failures to a parquet dead-letter
  * path (`FailedLogsFile` analog).
  *
  * Scale: the only stateful operator is the windowed volume aggregation
  * (state store, watermark-bounded); everything else is narrow → the
  * pipeline scales with source partitions (Kinesis shards ≙ partitions).
  */
object StreamPipeline {

  /** Operating envelope, mirroring the reference's config (`main.go:54-59`).
    * `fastLane` switches the dd projection to the imperative FastKayvee
    * implementation (same semantics — FastKayveeParitySpec — at ~8× the
    * per-line throughput; dead-letter splitting stays declarative). */
  final case class Config(
      deployEnv: String,
      triggerInterval: String = "5 seconds", // BatchInterval (main.go:57)
      retryAttempts: Int = 5, // alerts_consumer.go:257
      retryBaseMs: Long = 50,
      deadLetterPath: Option[String] = None, // FailedLogsFile (main.go:55)
      checkpointLocation: Option[String] = None, // KCL DynamoDB lease table analog
      fastLane: Boolean = false,
      batchCount: Int = 100, // BatchCount (main.go:56)
      // the four configured CW region clients (main.go:61-66)
      cwRegions: Set[String] = Set("us-west-1", "us-west-2", "us-east-1", "us-east-2"),
      // delivery fan-out width; None = spark.sql.shuffle.partitions
      deliveryPartitions: Option[Int] = None
  )

  /** Per-tag batch delivery target (Datadog/CloudWatch client analog).
    * Implementations may throw; delivery is retried with exponential
    * backoff and dead-lettered on exhaustion. */
  trait BatchSink extends Serializable {
    def submit(tag: String, rows: Seq[Row]): Unit
  }

  /** 5-attempt exponential backoff, 50 ms base — `alerts_consumer.go:257`,
    * `metrics.go:42`. */
  def withRetry[T](attempts: Int, baseMs: Long)(f: => T): T = {
    var delay = baseMs
    var left = attempts
    while (true) {
      try return f
      catch {
        case e: Exception =>
          left -= 1
          if (left <= 0) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The full metric pipeline on a streaming (or batch) raw-line frame. */
  def metrics(raw: DataFrame, deployEnv: String): MetricProject.Projected =
    MetricProject.project(RouteEngine.withRoutes(LogParse.parse(raw, deployEnv)))

  /** Wires the full fan-out sink: per-tag ≤100-record flushes (O14), DD
    * submit with subset-narrowing retry (O19), per-region CW submit
    * (logged-not-retried), and replayable dead letters (O15) — parse-stage
    * failures (raw line + error) under `deadLetterPath/parse`, sink-stage
    * failures (typed dd rows) under `deadLetterPath/sink`.
    *
    * No driver-side collect and no shuffle: delivery is partition-local
    * `mapPartitions` (see [[Delivery.deliverPartition]] for why that is the
    * faithful analog of kbc's per-shard batching). Caller starts the
    * returned writer. */
  def deliver(
      raw: DataFrame,
      cfg: Config,
      sink: BatchSink,
      cwSink: Option[Delivery.CwSink] = None
  ): DataStreamWriter[Row] = {
    val writer =
      if (cfg.fastLane) {
        val u = graft.fast.FastKayvee.unified(raw, cfg.deployEnv).toDF()
        u.writeStream
          .trigger(Trigger.ProcessingTime(cfg.triggerInterval))
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.persist()
            try deliverBatch(batch, cfg, sink, cwSink)
            finally { batch.unpersist(); () }
          }
      } else {
        // stream the statused frame (one parse per record); all lanes are
        // derived from the persisted micro-batch inside foreachBatch
        val statused = MetricProject.withStatus(
          RouteEngine.withRoutes(LogParse.parse(raw, cfg.deployEnv)))
        statused.writeStream
          .trigger(Trigger.ProcessingTime(cfg.triggerInterval))
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.persist()
            try deliverBatch(Delivery.unifiedFromStatused(batch), cfg, sink, cwSink)
            finally { batch.unpersist(); () }
          }
      }
    cfg.checkpointLocation.fold(writer)(c => writer.option("checkpointLocation", c))
  }

  /** One micro-batch of the unified frame: spill parse-stage dead letters,
    * then run executor-side delivery and spill whatever exhausted retries. */
  private def deliverBatch(
      unified: DataFrame,
      cfg: Config,
      sink: BatchSink,
      cwSink: Option[Delivery.CwSink]
  ): Unit = {
    cfg.deadLetterPath.foreach { p =>
      val dead = unified.filter(col("kind") === "dead").select(col("raw"), col("err"))
      if (!dead.isEmpty) dead.write.mode("append").parquet(p + "/parse")
    }
    // (tag, record_id) hash partitioning: every flush is single-tag and
    // record-whole (dd + cw datums of one record land together, so the
    // CW-after-dd-success coupling of SendBatch holds), while the dominant
    // "default" tag still spreads across all partitions — repartition(tag)
    // alone would funnel ~all traffic into one task.
    val deliverable = unified
      .filter(col("kind") =!= "dead")
      .withColumn("rid", coalesce(col("dd.record_id"), col("cw.record_id")))
    val failed = cfg.deliveryPartitions
      .fold(deliverable.repartition(col("tag"), col("rid")))(
        n => deliverable.repartition(n, col("tag"), col("rid")))
      // (tag, rid)-sorted partitions make each record's rows consecutive,
      // letting deliverPartition stream the iterator with O(batchCount)
      // memory instead of buffering the whole partition
      .sortWithinPartitions(col("tag"), col("rid"))
      .mapPartitions { it =>
        Delivery.deliverPartition(
          it, sink, cwSink, cfg.retryAttempts, cfg.retryBaseMs, cfg.batchCount, cfg.cwRegions)
      }(org.apache.spark.sql.Encoders.row(Delivery.failedSchema))
    // exactly ONE action over `failed` runs the delivery side effects once
    // per partition (never .isEmpty here — a limit-1 probe would deliver a
    // partial prefix)
    cfg.deadLetterPath match {
      case Some(p) => failed.write.mode("append").parquet(p + "/sink")
      case None    => failed.foreach(_ => ())
    }
  }

  /** O16 streaming: watermarked 1-minute tumbling volume aggregation in
    * update mode — the state store replaces the reference's double-buffered
    * maps (and survives restarts, which the reference's in-memory maps do
    * not; SURVEY.md §7.4 notes the deviation). */
  def volumeAgg(raw: DataFrame, deployEnv: String, watermark: String = "2 minutes"): DataFrame = {
    val parsed = LogParse.parse(raw, deployEnv).withWatermark("ts", watermark)
    parsed
      .groupBy(
        window(col("ts"), "1 minute").as("w"),
        coalesce(when(col("container_env") =!= "", col("container_env")), lit("unknown")).as("env"),
        coalesce(when(col("container_app") =!= "", col("container_app")), lit("unknown")).as("application"),
        coalesce(when(col("team") =!= "", col("team")), lit("unknown")).as("team")
      )
      .agg(count(lit(1)).as("log_volume_count"), sum(col("nbytes")).as("log_volume_size"))
      .select(col("w.start").as("window_start"), col("env"), col("application"), col("team"),
        col("log_volume_count"), col("log_volume_size"))
  }

  /** O16b streaming: watermarked 1-minute tumbling route counts over ALL
    * kvmeta route types (`metrics.go:63-67`) in update mode — the second
    * half of the reference's meta-metrics aggregator goroutine. */
  def routeCountsAgg(raw: DataFrame, deployEnv: String, watermark: String = "2 minutes"): DataFrame = {
    val routed = RouteEngine.withRoutes(LogParse.parse(raw, deployEnv))
      .withWatermark("ts", watermark)
    routed
      .select(
        col("ts"),
        coalesce(when(col("container_env") =!= "", col("container_env")), lit("unknown")).as("env"),
        coalesce(when(col("container_app") =!= "", col("container_app")), lit("unknown")).as("application"),
        explode(col("rule_names")).as("route")
      )
      .groupBy(window(col("ts"), "1 minute").as("w"), col("env"), col("application"), col("route"))
      .agg(count(lit(1)).as("log_route_count"))
      .select(col("w.start").as("window_start"), col("env"), col("application"), col("route"),
        col("log_route_count"))
  }

  /** O16+O16b streaming, fused: ONE watermarked 1-minute aggregation over
    * ONE parse of the source feeds both the volume and route-count maps —
    * the Spark shape of the reference's single aggregator goroutine
    * (`metrics.go:73-89`, one channel consumer updating both hash maps).
    * Each record contributes one "vol" row (grp = team, nbytes) plus one
    * "route" row per kvmeta route (grp = rule, `metrics.go:63-67`), then a
    * single hash agg on (window, kind, env, application, grp). Returns the
    * grouped frame (window_start TimestampType). */
  def metaAgg(raw: DataFrame, deployEnv: String, watermark: String = "2 minutes"): DataFrame = {
    def unknown(c: org.apache.spark.sql.Column) =
      coalesce(when(c =!= "", c), lit("unknown"))
    val routed = RouteEngine.withRoutes(LogParse.parse(raw, deployEnv))
      .withWatermark("ts", watermark)
    val rows = routed.select(
      col("ts"),
      unknown(col("container_env")).as("env"),
      unknown(col("container_app")).as("application"),
      explode(concat(
        array(struct(lit("vol").as("kind"), unknown(col("team")).as("grp"),
          col("nbytes").as("nbytes"))),
        transform(coalesce(col("rule_names"), array().cast("array<string>")),
          r => struct(lit("route").as("kind"), r.as("grp"), lit(0L).as("nbytes")))
      )).as("m")
    )
    rows
      .groupBy(window(col("ts"), "1 minute").as("w"), col("m.kind").as("kind"),
        col("env"), col("application"), col("m.grp").as("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("m.nbytes")).as("sz"))
      .select(col("w.start").as("window_start"), col("kind"), col("env"),
        col("application"), col("grp"), col("cnt"), col("sz"))
  }

  /** [[metaAgg]] over the imperative `FastKayvee.meta` parse (~8× the
    * declarative per-line throughput; parity: FastKayveeParitySpec). The
    * meta rows arrive minute-bucketed already, so the 1-minute window over
    * the bucket timestamp is the bucket itself — same grouped schema. */
  def metaAggFast(raw: DataFrame, deployEnv: String, watermark: String = "2 minutes"): DataFrame =
    graft.fast.FastKayvee.meta(raw, deployEnv).toDF()
      .withColumn("ts", col("window_start").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("kind"),
        col("env"), col("application"), col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("nbytes")).as("sz"))
      .select(col("w.start").as("window_start"), col("kind"), col("env"),
        col("application"), col("grp"), col("cnt"), col("sz"))

  /** Streaming `shipMetrics` (`metrics.go:91-172`): the fused meta
    * aggregate ([[metaAgg]] — one source reader, one parse, one shuffle)
    * projected into DD series rows and submitted per trigger under tag
    * "meta" — retried 5×, then logged-not-fatal (`metrics.go:159-171`;
    * meta metrics are never dead-lettered).
    *
    * Emission semantics, chosen by `exactlyOnce`:
    *  - false (default, update mode): a window touched by several
    *    triggers is re-shipped with its cumulative total under the same
    *    point_ts; the receiver is assumed last-write-wins on identical
    *    (metric, tags, ts) — Datadog count points at the same timestamp
    *    overwrite. Low latency (first totals within a trigger).
    *  - true (append mode): each 1-minute window ships EXACTLY ONCE with
    *    its final total, after the watermark passes — the Spark analog of
    *    the reference's ship-once-per-tick swap-reset deltas
    *    (`metrics.go:92-96`); latency is the watermark delay.
    * Either way the checkpointed state store beats the reference's
    * in-memory maps, which drop data on restart. Submission happens per
    * partition on executors; the aggregate frame is bounded-keyspace
    * tiny. */
  def shipMetaSeries(
      raw: DataFrame,
      cfg: Config,
      sink: BatchSink,
      exactlyOnce: Boolean = false
  ): DataStreamWriter[Row] = {
    val agg = if (cfg.fastLane) metaAggFast(raw, cfg.deployEnv) else metaAgg(raw, cfg.deployEnv)
    val grouped = agg
      .select(unix_timestamp(col("window_start")).as("window_start"), col("kind"),
        col("env"), col("application"), col("grp"), col("cnt"), col("sz"))
    val series = graft.agg.Aggregations.metaSeriesUnified(grouped)
    series.writeStream
      .outputMode(if (exactlyOnce) "append" else "update")
      .trigger(Trigger.ProcessingTime(cfg.triggerInterval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val attempts = cfg.retryAttempts
        val baseMs = cfg.retryBaseMs
        batch.foreachPartition { (rows: Iterator[Row]) =>
          val buf = rows.toSeq
          if (buf.nonEmpty)
            try withRetry(attempts, baseMs)(sink.submit("meta", buf))
            catch {
              case e: Exception =>
                org.slf4j.LoggerFactory.getLogger("graft.streaming.StreamPipeline")
                  .warn(s"failed-sending-volumes: ${e.getMessage}")
            }
        }
      }
  }

  /** O17 streaming: max pipeline delay per trigger via `observe` — the
    * lock-free-atomic analog; read from QueryProgress events. */
  def withDelayObserver(dd: DataFrame): DataFrame =
    dd.observe("delay", max(unix_timestamp(current_timestamp()) - col("point_ts")).as("max_delay_sec"))
}
