package graft.fast

import java.time.OffsetDateTime
import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Imperative single-pass implementation of the kayvee pipeline
  * (parse → routes → project), semantically identical to the declarative
  * `LogParse`/`RouteEngine`/`MetricProject` chain (cross-checked by
  * `FastKayveeParitySpec`).
  *
  * Why it exists: the reference's record pipeline is genuinely row-at-a-time
  * imperative work (JSON parse + per-route map lookups). The declarative
  * chain is the canonical, Catalyst-visible implementation (and the one the
  * streaming wrapper uses), but higher-order-function + variant expressions
  * evaluate interpreted in Spark, costing ~25-40µs/line/core; this
  * `mapPartitions` lane with Jackson runs the same semantics at ~3-5µs —
  * on par with the Go reference — and is what the hot declared queries use.
  * This is the sanctioned "genuine per-partition imperative logic" case:
  * one JSON parse per record, zero shuffles, streaming-friendly.
  */
object FastKayvee {

  /** One Datadog series row (mirror of MetricProject dd output, minus the
    * non-deterministic record_id). */
  final case class DD(
      metric: String,
      `type`: String,
      tags: Seq[String],
      point_ts: Long,
      point_value: Double,
      rule: String,
      tag: String
  )

  /** One CloudWatch datum row (mirror of MetricProject cw output). */
  final case class CW(
      metric_name: String,
      dim_names: Seq[String],
      dim_values: Seq[String],
      value: Double,
      ts_sec: Long,
      storage_resolution: Int,
      region_tag: String
  )

  final case class Route(
      series: String,
      dimensions: Seq[String],
      statType: String,
      valueField: String,
      rule: String
  )

  private val mongoPattern: Pattern =
    Pattern.compile("^\\[conn\\d+\\]\\s([a-z]+)\\s([^\\s]+?)\\s.*\\s(\\d+)ms$")

  private val defaultDims = Seq("Hostname", "env")
  private val cwAllowList = Set("ContainerExitCount")

  // --- parsed record ----------------------------------------------------

  /** Field value in the merged fields map: the reference's
    * map[string]interface{} restricted to what dimension/value projection
    * dispatches on. */
  sealed trait FV
  final case class FStr(s: String) extends FV
  final case class FNum(d: Double) extends FV
  final case class FBool(b: Boolean) extends FV
  case object FOther extends FV

  final case class Parsed(
      tsSec: Long,
      hostname: String,
      programname: String,
      containerEnv: String,
      containerApp: String,
      env: String,
      rawlog: String,
      body: JsonNode, // null when the body is not JSON
      derived: Map[String, FV], // mongo-rule additions
      routes: Seq[Route]
  ) {
    /** `team` field, else `_kvmeta.team` (`alerts_consumer.go:86-89`). */
    def team: Option[String] =
      (if (body == null) None
       else
         Option(body.get("team")).filter(_.isTextual).map(_.asText).filter(_.nonEmpty)
           .orElse {
             val t = body.path("_kvmeta").path("team")
             if (t.isTextual && t.asText.nonEmpty) Some(t.asText) else None
           })
    private def bodyField(name: String): Option[FV] =
      if (body == null) None
      else
        Option(body.get(name)).map {
          case n if n.isTextual => FStr(n.asText)
          case n if n.isNumber  => FNum(n.doubleValue)
          case n if n.isBoolean => FBool(n.asBoolean)
          case _                => FOther
        }
    /** envelope wins over body (LAST_WIN map_concat parity) — but a NULL
      * envelope field falls back to a same-named body key: the declarative
      * lane drops null envelope entries (map_filter) before map_concat, so
      * the body value shows through there. */
    def field(name: String): Option[FV] = name match {
      case "hostname" | "Hostname" => Option(hostname).map(FStr.apply).orElse(bodyField(name))
      case "programname"           => Option(programname).map(FStr.apply).orElse(bodyField(name))
      case "container_env"         => Option(containerEnv).map(FStr.apply).orElse(bodyField(name))
      case "container_app"         => Option(containerApp).map(FStr.apply).orElse(bodyField(name))
      case "env"                   => Option(env).map(FStr.apply).orElse(bodyField(name))
      case "rawlog"                => Some(FStr(rawlog))
      case "timestamp"             => Some(FOther) // time value: un-coercible as a dim
      case _                       => derived.get(name).orElse(bodyField(name))
    }
  }

  // --- per-line pipeline -------------------------------------------------

  /** Go fmt `%.0f` parity: round half-even, no decimals. */
  def coerceNum(d: Double): String =
    BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toBigInt.toString

  private def coerceDim(v: FV): Option[String] = v match {
    case FStr(s)  => Some(s)
    case FNum(d)  => Some(coerceNum(d))
    case FBool(b) => Some(if (b) "true" else "false")
    case FOther   => None
  }

  def parseLine(line: String, deployEnv: String, mapper: ObjectMapper): Option[Parsed] = {
    // header: <ts> <hostname> <prog>[pid]: <body>   (split on first 3 spaces)
    val i1 = line.indexOf(' ')
    val tsSec = try {
      if (i1 <= 0) return None
      OffsetDateTime.parse(line.substring(0, i1)).toEpochSecond
    } catch { case _: Exception => return None }

    val i2 = line.indexOf(' ', i1 + 1)
    val hostname = if (i2 > i1 + 1) line.substring(i1 + 1, i2) else null
    val i3 = if (i2 < 0) -1 else line.indexOf(' ', i2 + 1)
    val progSeg = if (i2 >= 0) {
      if (i3 > i2 + 1) line.substring(i2 + 1, i3) else line.substring(i2 + 1)
    } else ""
    val progname = {
      val b = progSeg.indexOf('[')
      val p = if (b >= 0) progSeg.substring(0, b) else progSeg
      if (p.isEmpty) null else p
    }
    val (cEnv, cApp) =
      if (progname == null) (null, null)
      else {
        val d = progname.indexOf("--")
        if (d < 0) (null, null)
        else {
          val after = progname.substring(d + 2)
          val slash = after.indexOf('/')
          (progname.substring(0, d), if (slash >= 0) after.substring(0, slash) else after)
        }
      }
    val sep = line.indexOf("]: ")
    val rawlog = if (sep >= 0) line.substring(sep + 3) else line

    val body: JsonNode =
      if (rawlog.nonEmpty && rawlog.charAt(0) == '{')
        try mapper.readTree(rawlog) catch { case _: Exception => null }
      else null

    // kvmeta alert routes + default dims (alerts_consumer.go:92-95)
    val kvRoutes = ArrayBuffer.empty[Route]
    if (body != null) {
      val routes = body.path("_kvmeta").path("routes")
      if (routes.isArray) routes.elements.asScala.foreach { r =>
        if (r.path("type").asText("") == "alerts") {
          val dims = {
            val d = r.path("dimensions")
            if (d.isArray) d.elements.asScala.map(_.asText).toSeq else Seq.empty
          }
          kvRoutes += Route(
            r.path("series").asText(null),
            dims ++ defaultDims,
            r.path("stat_type").asText(null),
            Option(r.get("value_field")).map(_.asText).getOrElse(""),
            r.path("rule").asText(null)
          )
        }
      }
    }

    // global rules (global_routes.go), reference order: process-metrics, rds, mongo
    val global = ArrayBuffer.empty[Route]
    def strBody(name: String): Option[String] =
      if (body == null) None
      else Option(body.get(name)).filter(_.isTextual).map(_.asText)

    strBody("via").filter(_ == "process-metrics").foreach { _ =>
      (strBody("source"), strBody("title"), strBody("type")) match {
        case (Some(_), Some(title), Some(st)) =>
          global += Route(
            s"process-metrics.$title",
            Seq("Hostname", "env", "source"),
            if (st == "guage") "gauge" else st,
            "value",
            "global-process-metrics"
          )
        case _ =>
      }
    }

    if (hostname == "aws-rds")
      strBody("user").filter(_ != "rdsadmin[rdsadmin]").foreach { _ =>
        global += Route(
          "rds.slow-query", Seq("env", "programname"), "counter", "value",
          "global-rds-slow-query-count"
        )
      }

    var derived = Map.empty[String, FV]
    val m = mongoPattern.matcher(rawlog)
    if (m.matches()) {
      derived = Map(
        "operation" -> FStr(m.group(1)),
        "namespace" -> FStr(m.group(2)),
        "is_collscan" -> FBool(rawlog.contains("COLLSCAN")),
        "millis" -> FNum(m.group(3).toDouble)
      )
      val dims = Seq("hostname", "operation", "namespace", "is_collscan")
      global += Route("mongo.slow-query", dims, "counter", "", "global-mongo-slow-query-count")
      global += Route("mongo.slow-query-millis", dims, "gauge", "millis", "global-mongo-slow-query-gauge")
    }

    Some(Parsed(tsSec, hostname, progname, cEnv, cApp, deployEnv, rawlog,
      body, derived, (kvRoutes ++ global).toSeq))
  }

  /** Full per-record projection; Left(err) reproduces the record-poisoning
    * early return (one bad route kills the whole record). Right(Nil) =
    * intentionally-skipped record. */
  def encode(p: Parsed): Either[String, Seq[DD]] = {
    if (p.routes.isEmpty) return Right(Nil)
    val out = ArrayBuffer.empty[DD]
    val regionTag = p.field("region").orElse(p.field("pod-region")) match {
      case Some(FStr(s)) => Some(s)
      case _             => None
    }
    val hasAllowlisted = p.routes.exists(r => cwAllowList.contains(r.series))
    val tag = if (hasAllowlisted) regionTag.getOrElse("default") else "default"

    p.routes.foreach { r =>
      val tags = ArrayBuffer.empty[String]
      r.dimensions.foreach { d =>
        p.field(d).foreach { v =>
          coerceDim(v) match {
            case Some(s) => tags += s"$d:$s"
            case None    => return Left(s"error casting dimension value. rule=${r.rule} dim=$d")
          }
        }
      }
      val value: Double = p.field(r.valueField) match {
        case Some(FNum(d)) => d
        case Some(_)       => return Left(s"value exists but is wrong type. rule=${r.rule} value_field=${r.valueField}")
        case None =>
          r.statType match {
            case "counter" => 1.0
            case "gauge"   => 0.0
            case other     => return Left(s"invalid StatType: $other")
          }
      }
      // value-present but invalid statType still errors (reference checks
      // stat type inside the emit switch)
      if (r.statType != "counter" && r.statType != "gauge")
        return Left(s"invalid StatType: ${r.statType}")
      out += DD(
        s"kv.${r.series}",
        if (r.statType == "counter") "count" else "gauge",
        tags.toSeq, p.tsSec, value, r.rule, tag
      )
    }
    Right(out.toSeq)
  }

  /** Datadog-series lane: raw lines → DD rows (valid records only). */
  def dd(raw: DataFrame, deployEnv: String): Dataset[DD] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.flatMap { line =>
        parseLine(line, deployEnv, mapper) match {
          case Some(p) => encode(p).getOrElse(Nil)
          case None    => Nil
        }
      }
    }
  }

  /** One volume-accounting row per parsed record (O16 input). */
  final case class VolumeRow(
      window_start: Long, // minute bucket, epoch seconds
      env: String,
      application: String,
      team: String,
      nbytes: Long
  )

  /** Volume lane: raw lines → per-record accounting rows ("unknown"
    * null-fills per `metrics.go:49-57`); group downstream. */
  def volume(raw: DataFrame, deployEnv: String): Dataset[VolumeRow] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.flatMap { line =>
        parseLine(line, deployEnv, mapper).map { p =>
          VolumeRow(
            // floorDiv: declarative date_trunc floors toward -inf, so
            // pre-epoch timestamps must too (-61s → -120, not -60)
            Math.floorDiv(p.tsSec, 60) * 60,
            Option(p.containerEnv).filter(_.nonEmpty).getOrElse("unknown"),
            Option(p.containerApp).filter(_.nonEmpty).getOrElse("unknown"),
            p.team.getOrElse("unknown"),
            // codepoint count, not UTF-16 units — declarative length()
            // counts codepoints, diverging on supplementary characters
            line.codePointCount(0, line.length).toLong
          )
        }
      }
    }
  }

  /** One determined route, pre-projection (O4-O8 output). `record_key` is
    * the value of `keyField` in the JSON body when numeric (join key for
    * route-level analyses); -1 when absent. */
  final case class RouteOut(
      record_key: Long,
      series: String,
      stat_type: String,
      value_field: String,
      rule: String,
      n_dims: Int
  )

  /** Route-determination lane: raw lines → one row per determined route. */
  def routes(raw: DataFrame, deployEnv: String, keyField: String): Dataset[RouteOut] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.flatMap { line =>
        parseLine(line, deployEnv, mapper).toSeq.flatMap { p =>
          val key = p.field(keyField) match {
            case Some(FNum(d)) => d.toLong
            case _             => -1L
          }
          p.routes.map(r => RouteOut(key, r.series, r.statType, r.valueField, r.rule, r.dimensions.size))
        }
      }
    }
  }

  /** CW datums of one valid parsed record (callers have ruled out
    * `encode(p).isLeft`): allow-listed series w/ resolvable region. */
  private def cwRows(p: Parsed): Seq[CW] = {
    val region = p.field("region").orElse(p.field("pod-region")) match {
      case Some(FStr(s)) => Some(s)
      case _             => None
    }
    if (region.isEmpty) Nil
    else p.routes.filter(r => cwAllowList.contains(r.series)).flatMap { r =>
      val names = ArrayBuffer.empty[String]
      val values = ArrayBuffer.empty[String]
      r.dimensions.filterNot(defaultDims.contains).foreach { d =>
        p.field(d).flatMap(coerceDim).foreach { s => names += d; values += s }
      }
      val value = p.field(r.valueField) match {
        case Some(FNum(d)) => d
        // wrong-typed value is unreachable here (encode(p) errored first),
        // but never non-local-return inside an executor closure
        case _ => if (r.statType == "counter") 1.0 else 0.0
      }
      Seq(CW(r.series, names.toSeq, values.toSeq, value, p.tsSec, 1, region.get))
    }
  }

  /** CloudWatch lane: allow-listed series w/ resolvable region. */
  def cw(raw: DataFrame, deployEnv: String): Dataset[CW] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.flatMap { line =>
        parseLine(line, deployEnv, mapper).toSeq.flatMap { p =>
          if (encode(p).isLeft) Nil else cwRows(p)
        }
      }
    }
  }

  /** One row per (record, kvmeta route rule) for the route-count lane —
    * ALL kvmeta route types count, not just alerts (`metrics.go:63-67`,
    * `alerts_consumer.go:90`); env/app are "unknown"-filled. */
  final case class RouteNameRow(
      window_start: Long,
      env: String,
      application: String,
      route: String
  )

  /** Route-count lane (O16b): raw lines → one row per kvmeta route name,
    * ts-parseable records only (the reference's recordMetrics runs after a
    * successful ParseAndEnhance). Imperative mirror of
    * Aggregations.routeCounts over the declarative rule_names column. */
  def routeNames(raw: DataFrame, deployEnv: String): Dataset[RouteNameRow] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.flatMap { line =>
        parseLine(line, deployEnv, mapper).toSeq.flatMap { p =>
          val names = ArrayBuffer.empty[String]
          if (p.body != null) {
            val routes = p.body.path("_kvmeta").path("routes")
            if (routes.isArray)
              routes.elements.asScala.foreach(r => names += r.path("rule").asText(null))
          }
          val env = Option(p.containerEnv).filter(_.nonEmpty).getOrElse("unknown")
          val app = Option(p.containerApp).filter(_.nonEmpty).getOrElse("unknown")
          names.map(n => RouteNameRow(Math.floorDiv(p.tsSec, 60) * 60, env, app, n))
        }
      }
    }
  }

  /** One row of the single-pass meta lane: the reference's ONE aggregator
    * goroutine consumes each record once and feeds BOTH meta maps
    * (`metrics.go:73-89`) — this row is that record's contribution to
    * either map. `kind` = "vol" (one per record; `grp` = team, `nbytes` =
    * codepoint size) or "route" (one per kvmeta route; `grp` = rule name,
    * `nbytes` = 0). Group downstream on all of (kind, window_start, env,
    * application, grp) — one parse, one shuffle for both aggregates. */
  final case class MetaRow(
      kind: String,
      window_start: Long,
      env: String,
      application: String,
      grp: String,
      nbytes: Long
  )

  /** Single-pass meta lane (O16 + O16b fused): raw lines → one vol row plus
    * one route row per kvmeta route, per ts-parseable record. Semantically
    * `volume(raw) ∪ routeNames(raw)` but with ONE parse of the corpus
    * (parity: FastKayveeParitySpec). */
  def meta(raw: DataFrame, deployEnv: String): Dataset[MetaRow] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.flatMap { line =>
        parseLine(line, deployEnv, mapper).toSeq.flatMap { p =>
          val ws = Math.floorDiv(p.tsSec, 60) * 60
          val env = Option(p.containerEnv).filter(_.nonEmpty).getOrElse("unknown")
          val app = Option(p.containerApp).filter(_.nonEmpty).getOrElse("unknown")
          val vol = MetaRow("vol", ws, env, app, p.team.getOrElse("unknown"),
            line.codePointCount(0, line.length).toLong)
          val names = ArrayBuffer.empty[String]
          if (p.body != null) {
            val routes = p.body.path("_kvmeta").path("routes")
            if (routes.isArray)
              routes.elements.asScala.foreach(r => names += r.path("rule").asText(null))
          }
          vol +: names.map(n => MetaRow("route", ws, env, app, n, 0L)).toSeq
        }
      }
    }
  }

  /** One record-level classification row (O9/§7.4 split semantics).
    * `title` is the string-typed body "title" field (null otherwise) —
    * the grouping key of the declared error-split query. */
  final case class StatusRow(title: String, status: String, err: String)

  /** Status lane: raw lines → ('ok' | 'dead' | 'ignored', first error) per
    * record, the imperative mirror of MetricProject.withStatus (parity:
    * FastKayveeParitySpec). The declarative variant/HOF evaluation of the
    * per-route error scan is interpreted (~30µs/line); this runs the same
    * early-return semantics at Jackson speed. */
  def status(raw: DataFrame, deployEnv: String): Dataset[StatusRow] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.map { line =>
        parseLine(line, deployEnv, mapper) match {
          case None => StatusRow(null, "dead", "unable parse Time from message's 'timestamp' field")
          case Some(p) =>
            val title = p.field("title") match {
              case Some(FStr(t)) => t
              case _             => null
            }
            if (p.routes.isEmpty) StatusRow(title, "ignored", "")
            else encode(p) match {
              case Left(err) => StatusRow(title, "dead", err)
              case Right(_)  => StatusRow(title, "ok", "")
            }
        }
      }
    }
  }

  /** Same record identity as the declarative lane's `xxhash64(raw)`
    * (LogParse.scala:136) — seed 42 is the `xxhash64` function's. */
  def recordId(line: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(line),
      org.apache.spark.sql.types.StringType, 42L)

  /** Fast-lane unified delivery frame: dd + cw + dead rows in one pass per
    * line (schema-identical to `Delivery.unifiedFromStatused`). Ignored
    * records (zero routes) are dropped, like the reference's
    * `kbc.ErrMessageIgnored` skip. */
  def unified(raw: DataFrame, deployEnv: String): Dataset[graft.streaming.Delivery.Unified] = {
    import graft.streaming.Delivery.{CWRec, DDRec, Unified}
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(raw.columns.head).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper
      it.flatMap { line =>
        parseLine(line, deployEnv, mapper) match {
          case None =>
            Seq(Unified("dead", "parse", None, None, Some(line),
              Some("unable parse Time from message's 'timestamp' field")))
          case Some(p) =>
            encode(p) match {
              case Left(err) =>
                Seq(Unified("dead", "parse", None, None, Some(line), Some(err)))
              case Right(Nil) => Nil
              case Right(dds) =>
                val rid = recordId(line)
                dds.map(d => Unified("dd", d.tag,
                  Some(DDRec(rid, d.metric, d.`type`, d.tags, d.point_ts, d.point_value, d.rule)),
                  None, None, None)) ++
                  cwRows(p).map(c => Unified("cw", c.region_tag, None,
                    Some(CWRec(rid, c.metric_name, c.dim_names, c.dim_values, c.value, c.ts_sec,
                      c.storage_resolution)),
                    None, None))
            }
        }
      }
    }
  }
}
