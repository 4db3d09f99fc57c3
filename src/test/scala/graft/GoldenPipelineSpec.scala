package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.parse.LogParse
import graft.routes.RouteEngine
import graft.project.MetricProject

/** Golden tests lifted from the reference's own suite
  * (`alerts_consumer_test.go`, `global_routes_test.go`) — raw fixture lines
  * in, exact Datadog/CloudWatch payloads out.
  */
class GoldenPipelineSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val header =
    "2017-08-15T18:39:07.000000+00:00 my-hostname production--my-app/arn%3Aaws%3Aecs%3Aus-west-1%3A589690932525%3Atask%2Fbe5eafc1-8e44-489a-8942-aaaaaaaaaaaa[3337]: "

  /** Wraps a kayvee JSON body (or any body) in the golden syslog header. */
  private def line(body: String): String = header + body

  private def run(lines: Seq[String], deployEnv: String = "test-env"): MetricProject.Projected = {
    val df = lines.toDF("raw")
    MetricProject.project(RouteEngine.withRoutes(LogParse.parse(df, deployEnv)))
  }

  // --- end-to-end goldens (alerts_consumer_test.go:17-100) ---------------

  private val goldenLine = line(
    """{"level":"info","source":"oauth","title":"login_start","action":"login","type":"counter","session_id":"sss","auth_method":"auth","district":"ddd","client_id":"ccc","app_id":"aaa","request_id":"","_kvmeta":{"team":"eng-team","kv_version":"3.8.2","kv_language":"js","routes":[{"type":"analytics","series":"series-name","rule":"login-events"},{"type":"alerts","series":"oauth.login_start","dimensions":["district","title","auth_method"],"stat_type":"counter","value_field":"value","rule":"login-start"}]}}"""
  )

  test("golden counter line → one DD series (alerts_consumer_test.go:17-52)") {
    val out = run(Seq(goldenLine))
    val dd = out.dd.collect()
    assert(dd.length === 1)
    val r = dd.head
    assert(r.getAs[String]("metric") === "kv.oauth.login_start")
    assert(r.getAs[String]("type") === "count")
    assert(r.getAs[Seq[String]]("tags") === Seq(
      "district:ddd", "title:login_start", "auth_method:auth",
      "Hostname:my-hostname", "env:test-env"))
    assert(r.getAs[Long]("point_ts") === 1502822347L)
    assert(r.getAs[Double]("point_value") === 1.0)
    assert(r.getAs[String]("tag") === "default")
    assert(out.cw.count() === 0)
    assert(out.deadLetter.count() === 0)
  }

  test("golden cloudwatch line → DD + CW, region tag (alerts_consumer_test.go:54-100)") {
    val cwLine = line(
      """{"_kvmeta":{"kv_language":"go","kv_version":"6.16.0","routes":[{"dimensions":["dimension1"],"rule":"unexpected-stop","series":"ContainerExitCount","stat_type":"counter","type":"alerts","value_field":"value"}],"team":"eng-infra"},"category":"app_lifecycle","level":"info","title":"title","dimension1":"dim","region":"reg","type":"counter","value":1}"""
    )
    val out = run(Seq(cwLine))
    val dd = out.dd.collect()
    assert(dd.length === 1)
    assert(dd.head.getAs[String]("metric") === "kv.ContainerExitCount")
    assert(dd.head.getAs[Seq[String]]("tags") === Seq(
      "dimension1:dim", "Hostname:my-hostname", "env:test-env"))
    assert(dd.head.getAs[Double]("point_value") === 1.0)
    assert(dd.head.getAs[String]("tag") === "reg")

    val cw = out.cw.collect()
    assert(cw.length === 1)
    assert(cw.head.getAs[String]("metric_name") === "ContainerExitCount")
    assert(cw.head.getAs[Seq[Row]]("dimensions").map(d =>
      (d.getAs[String]("name"), d.getAs[String]("value"))) === Seq(("dimension1", "dim")))
    assert(cw.head.getAs[Double]("value") === 1.0)
    assert(cw.head.getAs[Int]("storage_resolution") === 1)
    assert(cw.head.getAs[String]("region_tag") === "reg")
  }

  // --- parse/enrich (decode.ParseAndEnhance observable spec) -------------

  test("parse extracts envelope fields") {
    val parsed = LogParse.parse(Seq(goldenLine).toDF("raw"), "test-env")
    val r = parsed.select(
      unix_timestamp($"ts"), $"hostname", $"container_env", $"container_app",
      $"env", $"team").collect().head
    assert(r.getLong(0) === 1502822347L)
    assert(r.getString(1) === "my-hostname")
    assert(r.getString(2) === "production")
    assert(r.getString(3) === "my-app")
    assert(r.getString(4) === "test-env")
    assert(r.getString(5) === "eng-team")
  }

  // --- encodeMessage unit semantics (alerts_consumer_test.go:103-404) ----

  private def kvLine(extraFields: String, routes: String): String =
    line(s"""{$extraFields"_kvmeta":{"team":"t","kv_version":"1","kv_language":"go","routes":[$routes]}}""")

  private val counterRoute =
    """{"type":"alerts","series":"s1","dimensions":["dim_a","dim_b"],"stat_type":"counter","value_field":"value","rule":"r1"}"""

  test("non-string dims coerced: 3.2→\"3\", true→\"true\" (alerts_consumer_test.go:149-200)") {
    val l = kvLine(""""dim_a":3.2,"dim_b":true,""", counterRoute)
    val dd = run(Seq(l)).dd.collect()
    assert(dd.length === 1)
    assert(dd.head.getAs[Seq[String]]("tags") === Seq(
      "dim_a:3", "dim_b:true", "Hostname:my-hostname", "env:test-env"))
  }

  test("half-even float coercion: 2.5→\"2\", 3.5→\"4\" (Go %.0f parity)") {
    val l = kvLine(""""dim_a":2.5,"dim_b":3.5,""", counterRoute)
    val dd = run(Seq(l)).dd.collect()
    assert(dd.head.getAs[Seq[String]]("tags").take(2) === Seq("dim_a:2", "dim_b:4"))
  }

  test("missing dim field silently skipped (alerts_consumer.go:131)") {
    val l = kvLine(""""dim_a":"present",""", counterRoute)
    val dd = run(Seq(l)).dd.collect()
    assert(dd.head.getAs[Seq[String]]("tags") === Seq(
      "dim_a:present", "Hostname:my-hostname", "env:test-env"))
  }

  test("object-typed dim → record dead-letters (alerts_consumer_test.go:202-228)") {
    val l = kvLine(""""dim_a":{"nested":1},""", counterRoute)
    val out = run(Seq(l))
    assert(out.dd.count() === 0)
    assert(out.deadLetter.count() === 1)
    assert(out.deadLetter.select($"record_err").as[String].collect().head
      .startsWith("error casting dimension value"))
  }

  test("value present but wrong type → dead-letter (alerts_consumer_test.go:230-255)") {
    val l = kvLine(""""value":"not-a-number",""", counterRoute)
    val out = run(Seq(l))
    assert(out.dd.count() === 0)
    assert(out.deadLetter.count() === 1)
  }

  test("counter defaults to 1; explicit float used (alerts_consumer_test.go:103-147)") {
    val l1 = kvLine("", counterRoute)
    val l2 = kvLine(""""value":123,""", counterRoute)
    val vals = run(Seq(l1, l2)).dd.select($"point_value").as[Double].collect().sorted
    assert(vals === Array(1.0, 123.0))
  }

  test("gauge defaults to 0 (alerts_consumer_test.go:257-304)") {
    val g = """{"type":"alerts","series":"g1","dimensions":[],"stat_type":"gauge","value_field":"value","rule":"rg"}"""
    val dd = run(Seq(kvLine("", g))).dd.collect()
    assert(dd.head.getAs[String]("type") === "gauge")
    assert(dd.head.getAs[Double]("point_value") === 0.0)
  }

  test("invalid stat_type → dead-letter (alerts_consumer.go:190-191)") {
    val bad = """{"type":"alerts","series":"b1","dimensions":[],"stat_type":"weird","value_field":"value","rule":"rb"}"""
    val out = run(Seq(kvLine("", bad)))
    assert(out.dd.count() === 0)
    assert(out.deadLetter.count() === 1)
  }

  test("multi-route fan-out: N alert routes → N series (alerts_consumer_test.go:306-380)") {
    val r2 = """{"type":"alerts","series":"s2","dimensions":["dim_a"],"stat_type":"gauge","value_field":"value","rule":"r2"}"""
    val dd = run(Seq(kvLine(""""dim_a":"x","value":7,""", s"$counterRoute,$r2"))).dd
    val rows = dd.orderBy($"metric").collect()
    assert(rows.map(_.getAs[String]("metric")).toSeq === Seq("kv.s1", "kv.s2"))
    assert(rows.map(_.getAs[Double]("point_value")).toSeq === Seq(7.0, 7.0))
  }

  test("non-alert routes intentionally skipped (alerts_consumer_test.go:382-404)") {
    val analytics = """{"type":"analytics","series":"a","rule":"ra"}"""
    val out = run(Seq(kvLine("", analytics)))
    assert(out.dd.count() === 0)
    assert(out.deadLetter.count() === 0)
    assert(out.ignored.count() === 1)
  }

  // --- global routes (global_routes_test.go) -----------------------------

  test("process-metrics counter + gauge w/ guage typo (global_routes_test.go:11-74)") {
    val c = line("""{"via":"process-metrics","source":"some-source","title":"some-title","value":123,"type":"counter"}""")
    val g = line("""{"via":"process-metrics","source":"some-source-2","title":"some-title-2","value":0.35,"type":"guage"}""")
    val dd = run(Seq(c, g)).dd.orderBy($"metric").collect()
    assert(dd.length === 2)
    assert(dd(0).getAs[String]("metric") === "kv.process-metrics.some-title")
    assert(dd(0).getAs[String]("type") === "count")
    assert(dd(0).getAs[Double]("point_value") === 123.0)
    assert(dd(0).getAs[Seq[String]]("tags") === Seq(
      "Hostname:my-hostname", "env:test-env", "source:some-source"))
    assert(dd(1).getAs[String]("metric") === "kv.process-metrics.some-title-2")
    assert(dd(1).getAs[String]("type") === "gauge")
    assert(dd(1).getAs[Double]("point_value") === 0.35)
  }

  test("process-metrics requires all four string fields") {
    val missing = line("""{"via":"process-metrics","source":"s","title":"t"}""")
    val numericTitle = line("""{"via":"process-metrics","source":"s","title":42,"type":"counter"}""")
    val out = run(Seq(missing, numericTitle))
    assert(out.dd.count() === 0)
    assert(out.ignored.count() === 2)
  }

  // Mongo slow-query corpus (global_routes_test.go:88-152); body is NOT
  // JSON — the rule regexes the raw body.
  private val mongoCorpus: Seq[(String, String, String, Boolean, Double)] = Seq(
    ("""[conn2852884] update clever.students query: { district: ObjectId('527bac1858c5a34a0c0000d0'), _id: ObjectId('598894d5d6528a4c00036450') } update: { $set: { location: { zip: "", state: "", address: "", city: "" } }, $unset: { enrollments: true, _rti_status: true, rti_ela: true, rti_social: true, rti_math: true, rti_behavior: true, rti_health: true, rti_communication: true, rti_gifted: true, _iep_code: true, _rti_code: true, _emails: true } } nscanned:1 nscannedObjects:1 nMatched:1 nModified:1 keyUpdates:0 writeConflicts:0 numYields:1 locks:{ Global: { acquireCount: { r: 3, w: 3 } }, Database: { acquireCount: { w: 3 }, acquireWaitCount: { w: 1 }, timeAcquiringMicros: { w: 4234 } }, Collection: { acquireCount: { w: 2 } }, oplog: { acquireCount: { w: 1 } } } 2964ms""",
      "update", "clever.students", false, 2964d),
    ("""[conn5261282] command archive.archive.sections command: getMore { getMore: 136494780397, collection: "archive.sections" } originatingCommand: { find: "archive.sections", filter: { _id: { $regex: /^53daa05528c680240d001ea2..+/ } }, skip: 0 } planSummary: IXSCAN { _id: 1 } cursorid:136494780397 keysExamined:43401 docsExamined:43400 cursorExhausted:1 numYields:340 nreturned:43400 reslen:4589709 locks:{ Global: { acquireCount: { r: 682 } }, Database: { acquireCount: { r: 341 } }, Collection: { acquireCount: { r: 341 } } } protocol:op_query 112ms""",
      "command", "archive.archive.sections", false, 112d),
    ("""[conn18124] remove clever.studentcontacts query: { district: ObjectId('5a15d3f286c90f00017376ef'), _id: ObjectId('5a15d5f70c3828572b00001d') } ndeleted:1 keyUpdates:0 writeConflicts:0 numYields:1 locks:{ Global: { acquireCount: { r: 3, w: 3 } }, Database: { acquireCount: { w: 3 }, acquireWaitCount: { w: 1 }, timeAcquiringMicros: { w: 5597 } }, Collection: { acquireCount: { w: 2 } }, oplog: { acquireCount: { w: 1 } } } 11906ms""",
      "remove", "clever.studentcontacts", false, 11906d),
    ("""[conn1990136] getmore local.oplog.rs query: { ts: { $gte: Timestamp 1533635999000|220 } } cursorid:338612476018 ntoreturn:0 keyUpdates:0 writeConflicts:0 numYields:8 nreturned:1144 reslen:181853 locks:{ Global: { acquireCount: { r: 20 }, acquireWaitCount: { r: 1 }, timeAcquiringMicros: { r: 2743564 } }, Database: { acquireCount: { r: 10 } }, oplog: { acquireCount: { r: 10 } } } 3747ms""",
      "getmore", "local.oplog.rs", false, 3747d),
    ("""[conn20887805] query business-data.mauhistory query: { clever_id: ObjectId('58c83465cc56680001d02a76') } planSummary: COLLSCAN ntoskip:0 nscanned:0 nscannedObjects:9979 keyUpdates:0 writeConflicts:0 numYields:77 nreturned:1 reslen:24941 locks:{ Global: { acquireCount: { r: 156 } }, Database: { acquireCount: { r: 78 } }, Collection: { acquireCount: { r: 78 } } } 168ms""",
      "query", "business-data.mauhistory", true, 168d)
  )

  test("mongo slow-query corpus → 2 routes + derived dims (global_routes_test.go:76-190)") {
    mongoCorpus.foreach { case (raw, op, ns, collscan, millis) =>
      val dd = run(Seq(line(raw))).dd.orderBy($"metric").collect()
      assert(dd.length === 2, s"for op=$op")
      val counter = dd(0)
      assert(counter.getAs[String]("metric") === "kv.mongo.slow-query")
      assert(counter.getAs[String]("type") === "count")
      assert(counter.getAs[Double]("point_value") === 1.0)
      assert(counter.getAs[Seq[String]]("tags") === Seq(
        "hostname:my-hostname", s"operation:$op", s"namespace:$ns", s"is_collscan:$collscan"))
      val gauge = dd(1)
      assert(gauge.getAs[String]("metric") === "kv.mongo.slow-query-millis")
      assert(gauge.getAs[String]("type") === "gauge")
      assert(gauge.getAs[Double]("point_value") === millis)
      assert(gauge.getAs[String]("rule") === "global-mongo-slow-query-gauge")
    }
  }

  test("mongo non-match emits nothing (global_routes_test.go:146-151)") {
    val out = run(Seq(line("hello hello hello hello hello hello hello hello hello hello hello hello")))
    assert(out.dd.count() === 0)
    assert(out.ignored.count() === 1)
  }

  test("rds slow-query: match + rdsadmin exclusion (global_routes_test.go:192-254)") {
    val hdr = "2019-10-09T20:19:43.000000+00:00 aws-rds production--rds/arn[1]: "
    val match_ = hdr + """{"rawbody":"x","user":"clever[clever]"}"""
    val excluded = hdr + """{"rawbody":"x","user":"rdsadmin[rdsadmin]"}"""
    val noUser = hdr + """{"rawbody":"x"}"""
    val out = run(Seq(match_, excluded, noUser))
    val dd = out.dd.collect()
    assert(dd.length === 1)
    assert(dd.head.getAs[String]("metric") === "kv.rds.slow-query")
    assert(dd.head.getAs[String]("rule") === "global-rds-slow-query-count")
    assert(dd.head.getAs[Seq[String]]("tags") === Seq(
      "env:test-env", "programname:production--rds/arn"))
    assert(out.ignored.count() === 2)
  }
}
