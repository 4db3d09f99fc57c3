package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.parse.LogParse
import graft.routes.RouteEngine
import graft.project.MetricProject

/** Drives the kayvee pipeline end-to-end at the package boundary: reference
  * fixture lines plus raw lines synthesized from the real `events` parquet,
  * through parse → routes → project, printing the four output streams.
  *
  * Usage: `sbt "runMain graft.tools.PipelineDemo [sfDir]"`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-pipeline-demo")
    import spark.implicits._

    val fixtures = Seq(
      // golden counter line (alerts_consumer_test.go:21)
      """2017-08-15T18:39:07.000000+00:00 my-hostname production--my-app/arn%3Aaws%3Aecs[3337]: {"level":"info","title":"login_start","auth_method":"auth","district":"ddd","_kvmeta":{"team":"eng-team","routes":[{"type":"alerts","series":"oauth.login_start","dimensions":["district","title","auth_method"],"stat_type":"counter","value_field":"value","rule":"login-start"}]}}""",
      // mongo slow query (global rule O7)
      """2018-08-07T10:00:00.000000+00:00 mongo-host production--mongo/arn[1]: [conn20887805] query business-data.mauhistory query: { clever_id: ObjectId('58c83465cc56680001d02a76') } planSummary: COLLSCAN ntoskip:0 nscanned:0 168ms""",
      // probes: garbage, empty-ish, bad dim type
      "total garbage not even a header",
      " ",
      """2018-08-07T10:00:00.000000+00:00 h production--x/arn[1]: {"bad":{"o":1},"_kvmeta":{"routes":[{"type":"alerts","series":"s","dimensions":["bad"],"stat_type":"counter","value_field":"value","rule":"r"}]}}"""
    )

    // Synthesize kayvee raw lines from the real events table: event_type as
    // route selector, value as value_field, user_id as dimension.
    val events = Tables(spark, sfDir).events
    val synthesized = events.select(
      concat(
        date_format(timestamp_micros((col("ts") / 1000).cast("long")), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'+00:00'"),
        lit(" host-"), col("user_id") % 50,
        lit(" production--"), col("event_type"), lit("-svc/arn[") , col("event_id"), lit("]: "),
        to_json(struct(
          col("event_type").as("title"), col("value"), col("user_id"),
          struct(
            concat(lit("team-"), col("user_id") % 7).as("team"),
            array(struct(
              lit("alerts").as("type"),
              concat(lit("events."), col("event_type")).as("series"),
              array(lit("title"), lit("user_id")).as("dimensions"),
              lit("counter").as("stat_type"),
              lit("value").as("value_field"),
              concat(lit("evt-"), col("event_type")).as("rule")
            )).as("routes")
          ).as("_kvmeta")
        ))
      ).as("raw")
    )

    // Materialize the synthesized lines: feeding the pipeline a large
    // *expression* as its raw column would re-inline the to_json tree per
    // downstream reference; real inputs are storage/stream columns.
    val raw = fixtures.toDF("raw").unionByName(synthesized).cache()
    val out = MetricProject.project(RouteEngine.withRoutes(LogParse.parse(raw, "demo-env")))

    println(s"== input lines: ${raw.count()}")
    println(s"== dd series rows: ${out.dd.count()}")
    println(s"== cw rows: ${out.cw.count()}")
    println(s"== dead-letter rows: ${out.deadLetter.count()}")
    println(s"== ignored rows: ${out.ignored.count()}")
    println("== sample DD output:")
    out.dd.show(8, truncate = false)
    println("== dead-letter errors:")
    out.deadLetter.select(col("record_err"), substring(col("raw"), 0, 60)).show(5, truncate = false)
    println("== volume agg by (env,app,team), 1-min buckets:")
    val parsed = LogParse.parse(raw, "demo-env")
    graft.agg.Aggregations
      .volumeByEnvAppTeam(parsed, date_trunc("minute", col("ts")))
      .orderBy(desc("log_volume_count")).show(5, truncate = false)
    spark.stop()
  }
}
