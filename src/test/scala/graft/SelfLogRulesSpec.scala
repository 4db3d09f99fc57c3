package graft

import graft.parse.LogParse
import graft.routes.{RouteEngine, SelfLogRules}
import graft.project.MetricProject

/** O18 — self-log routing rules (`kvconfig.yml`): exact-value matchers,
  * "*" presence wildcards, and pass-through for unmatched logs. */
class SelfLogRulesSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val header = "2017-08-15T18:39:07.000000+00:00 consumer-host production--kinesis-alerts-consumer/arn[1]: "

  private def run(lines: Seq[String]) = {
    val parsed = RouteEngine.withRoutes(LogParse.parse(lines.toDF("raw"), "test-env"))
    MetricProject.project(SelfLogRules.withSelfRoutes(parsed)).dd
  }

  test("title equality match routes the consumer's own error log") {
    val dd = run(Seq(header + """{"title":"unknown-parse-failure","value":1}""")).collect()
    assert(dd.map(_.getAs[String]("metric")).toSeq ===
      Seq("kv.kinesis-consumer.alerts.unknown-parse-failure"))
    assert(dd.head.getAs[Seq[String]]("tags") ===
      Seq("Hostname:consumer-host", "env:test-env"))
  }

  test("wildcard matcher requires field presence") {
    val matched = header + """{"title":"failed-sending-volumes","error":"boom"}"""
    val noError = header + """{"title":"failed-sending-volumes"}"""
    val dd = run(Seq(matched, noError)).collect()
    assert(dd.length === 1)
    assert(dd.head.getAs[String]("metric") === "kv.kinesis-consumer.alerts.failed-sending-volumes")
  }

  test("cloudwatch-error rule carries the region dimension") {
    val dd = run(Seq(header + """{"title":"error-sending-to-cloudwatch","region":"us-west-2"}""")).collect()
    assert(dd.length === 1)
    assert(dd.head.getAs[scala.collection.Seq[String]]("tags").contains("region:us-west-2"))
  }

  test("unmatched self-logs flow through untouched") {
    val dd = run(Seq(header + """{"title":"some-other-log"}""")).collect()
    assert(dd.isEmpty)
  }
}
