package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O16/O17 — the consumer's own streaming aggregations (reference:
  * `metrics.go`, `delay.go`).
  *
  * The Go version hand-builds this with a 10k-buffered channel, one
  * aggregator goroutine, double-buffered hash maps and a 1-minute ticker.
  * In Spark the channel/maps/ticker are replaced by a shuffle into a
  * hash aggregate (partial map-side combine comes free), and in streaming
  * mode by the state store + a 1-minute tumbling window — strictly more
  * durable than the reference (its in-memory maps double-count on restart).
  */
object Aggregations {

  private def unknown(c: Column): Column =
    coalesce(when(c =!= "", c), lit("unknown"))

  /** Per-(env,app,team) log volume: count + byte size
    * (`metrics.go:48-68,91-157`). `windowCol` is any precomputed time-bucket
    * column (batch analog of the 1-minute flush tick).
    */
  def volumeByEnvAppTeam(parsed: DataFrame, windowCol: Column): DataFrame =
    parsed
      .groupBy(
        windowCol.as("window_start"),
        unknown(col("container_env")).as("env"),
        unknown(col("container_app")).as("application"),
        unknown(col("team")).as("team")
      )
      .agg(
        count(lit(1)).as("log_volume_count"),
        sum(col("nbytes")).as("log_volume_size")
      )

  /** Per-(app,env,rule) route counts over ALL kvmeta routes
    * (`metrics.go:63-67` — note: all route types, not just alerts).
    */
  def routeCounts(routed: DataFrame, windowCol: Column): DataFrame =
    routed
      .select(
        windowCol.as("window_start"),
        unknown(col("container_env")).as("env"),
        unknown(col("container_app")).as("application"),
        explode(col("rule_names")).as("route")
      )
      .groupBy(col("window_start"), col("env"), col("application"), col("route"))
      .agg(count(lit(1)).as("log_route_count"))

  /** `shipMetrics` series projection (`metrics.go:91-157`): the volume and
    * route-count aggregates as Datadog MetricSeries rows —
    * `kinesis_alerts_consumer.log_volume_count` / `.log_volume_size` tagged
    * env/application/team, and `.log_route_count` tagged
    * env/application/route, all type "count". `point_ts` is the window
    * start (the reference stamps flush time — `time.Now` at the tick; the
    * window start is the deterministic batch analog). */
  def metaSeries(volumes: DataFrame, routeCounts: DataFrame): DataFrame =
    volumeSeries(volumes).unionByName(routeSeries(routeCounts))

  /** The two volume series per (env,app,team) group (`metrics.go:104-136`).
    * Emitted via a 2-element explode from ONE scan — a union of two
    * selects would recompute the whole upstream aggregation (and its
    * parse) once per branch. */
  def volumeSeries(volumes: DataFrame): DataFrame = {
    val eatTags = concat_ws(
      ",",
      concat(lit("env:"), col("env")),
      concat(lit("application:"), col("application")),
      concat(lit("team:"), col("team"))
    )
    def series(metric: String, value: Column) = struct(
      lit(metric).as("metric"),
      lit("count").as("type"),
      eatTags.as("tags_str"),
      col("window_start").as("point_ts"),
      value.cast("double").as("point_value")
    )
    volumes
      .select(explode(array(
        series("kinesis_alerts_consumer.log_volume_count", col("log_volume_count")),
        series("kinesis_alerts_consumer.log_volume_size", col("log_volume_size"))
      )).as("s"))
      .select(col("s.metric").as("metric"), col("s.type").as("type"),
        col("s.tags_str").as("tags_str"), col("s.point_ts").as("point_ts"),
        col("s.point_value").as("point_value"))
  }

  /** The route-count series per (env,app,rule) group (`metrics.go:138-157`). */
  def routeSeries(routeCounts: DataFrame): DataFrame = {
    val lrTags = concat_ws(
      ",",
      concat(lit("env:"), col("env")),
      concat(lit("application:"), col("application")),
      concat(lit("route:"), col("route"))
    )
    routeCounts.select(
      lit("kinesis_alerts_consumer.log_route_count").as("metric"),
      lit("count").as("type"),
      lrTags.as("tags_str"),
      col("window_start").as("point_ts"),
      col("log_route_count").cast("double").as("point_value")
    )
  }

  /** O17 — max pipeline delay vs an anchor instant (`delay.go:15-33`).
    * The reference tracks `max(now - point_ts)` in a lock-free atomic; the
    * Spark analog is a partial-aggregated global max — no shuffle of note
    * (one row per partition to the final agg). `anchorSec` is a fixed
    * instant so declared queries stay deterministic.
    */
  def maxDelay(df: DataFrame, tsSecCol: Column, anchorSec: Long, groupCols: Seq[Column]): DataFrame = {
    val delay = lit(anchorSec) - tsSecCol
    if (groupCols.isEmpty) df.agg(max(delay).as("max_delay_sec"))
    else df.groupBy(groupCols: _*).agg(max(delay).as("max_delay_sec"))
  }
}
