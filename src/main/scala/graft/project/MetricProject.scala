package graft.project

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.KayveeModel
import graft.routes.RouteEngine

/** O9–O13 — per-route dimension/value projection into metric datapoints
  * (reference: `alerts_consumer.go:101-223`).
  *
  * Per-row error semantics are the hard part (SURVEY.md §7.4): the Go code
  * returns a hard error for the whole record when ANY route hits a bad
  * dimension type / bad value type / bad stat type, and the framework spills
  * that record to a failed-log file. Spark expressions must not throw, so
  * every potential error becomes an `err` string inside the per-route
  * projection (computed map-side, pre-explode), the record-level error is
  * the first route error, and the output splits into valid / dead-letter /
  * ignored DataFrames. One bad route poisons the whole record, exactly like
  * the reference's early return.
  */
object MetricProject {

  /** dd: one row per (record, route) — the Datadog series projection.
    * cw:  allow-listed subset with CloudWatch dimensions.
    * deadLetter: records that would hard-error in the reference.
    * ignored: records with zero routes (`kbc.ErrMessageIgnored`).
    */
  final case class Projected(
      dd: DataFrame,
      cw: DataFrame,
      deadLetter: DataFrame,
      ignored: DataFrame
  )

  /** Go-style `%.0f` coercion: round half-even, drop decimals
    * (`alerts_consumer.go:136-138`, golden `3.2 → "3"`). Java's
    * `format_string("%.0f")` rounds HALF_UP and would disagree with Go on
    * `2.5`, so bround (HALF_EVEN) + integral cast is used instead.
    */
  def coerceNumericDim(v: Column): Column =
    bround(v.cast("double"), 0).cast("decimal(30,0)").cast("string")

  /** Coerce one variant-typed field for use as a dimension value: string
    * as-is, number `%.0f`, bool `%t`; anything else (objects, arrays, JSON
    * null, timestamps) is un-coercible → null here, hard error upstream
    * (`alerts_consumer.go:131-146`).
    */
  def coerceDim(v: Column): Column = {
    val tp = schema_of_variant(v)
    when(tp === "STRING", v.cast("string"))
      .when(RouteEngine.numericVariant(tp), coerceNumericDim(v))
      .when(tp === "BOOLEAN", when(v.cast("boolean"), "true").otherwise("false"))
  }

  private def perRoute(defaultDims: Seq[String])(r: Column): Column = {
    // O10 — dimension projection, order-preserving; missing field → tag
    // silently skipped; present-but-uncoercible → error
    val entries = transform(
      r.getField("dimensions"),
      d => {
        val v = try_element_at(col("fields"), d)
        val coerced = coerceDim(v)
        struct(
          d.as("dim"),
          when(v.isNotNull, concat(d, lit(":"), coerced)).as("tag"),
          coerced.as("value"),
          (v.isNotNull && coerced.isNull).as("bad")
        )
      }
    )
    val badDim = try_element_at(filter(entries, e => e.getField("bad")), lit(1))
    val dimErr = when(
      badDim.isNotNull,
      concat(
        lit("error casting dimension value. rule="),
        coalesce(r.getField("rule"), lit("")),
        lit(" dim="),
        badDim.getField("dim")
      )
    )

    // O11 — value resolution: float → use; present-but-not-float → error;
    // absent → default (counter 1, gauge 0); bad stat_type → error
    // (`alerts_consumer.go:157-192`)
    val v = try_element_at(col("fields"), coalesce(r.getField("value_field"), lit("")))
    val num = when(RouteEngine.numericVariant(schema_of_variant(v)), v.cast("double"))
    val valueErr = when(
      v.isNotNull && num.isNull,
      concat(
        lit("value exists but is wrong type. rule="),
        coalesce(r.getField("rule"), lit("")),
        lit(" value_field="),
        r.getField("value_field")
      )
    )
    val statType = r.getField("stat_type")
    val value = when(statType === "counter", coalesce(num, lit(1.0)))
      .when(statType === "gauge", coalesce(num, lit(0.0)))
    val statErr = when(value.isNull, concat(lit("invalid StatType: "), coalesce(statType, lit(""))))

    struct(
      concat(lit("kv."), r.getField("series")).as("metric"),
      r.getField("series").as("series"),
      when(statType === "counter", "count").otherwise("gauge").as("dd_type"),
      filter(transform(entries, e => e.getField("tag")), t => t.isNotNull).as("tags"),
      filter(
        transform(
          entries,
          e =>
            when(
              e.getField("tag").isNotNull && !e.getField("dim").isin(defaultDims: _*),
              struct(e.getField("dim").as("name"), e.getField("value").as("value"))
            )
        ),
        x => x.isNotNull
      ).as("cw_dimensions"),
      value.as("value"),
      r.getField("rule").as("rule"),
      coalesce(dimErr, valueErr, statErr).as("err")
    )
  }

  def project(routed: DataFrame): Projected = {
    val allowlist = KayveeModel.cloudwatchAllowList
    val withProj = routed
      .withColumn("proj", transform(col("routes"), r => perRoute(KayveeModel.defaultDimensions)(r)))
      .withColumn(
        "record_err",
        // timestamp is required once a record has routes
        // (`alerts_consumer.go:111-114`); otherwise first route error wins
        when(col("ts").isNull, lit("unable parse Time from message's 'timestamp' field"))
          .otherwise(
            try_element_at(filter(col("proj"), p => p.getField("err").isNotNull), lit(1))
              .getField("err")
          )
      )

    // Unparseable header (null ts) → dead-letter for ALL records — the
    // `decode.ParseAndEnhance` error precedes the route check in the
    // reference (`alerts_consumer.go:55-63`). Then O9: zero routes →
    // intentionally skipped (`alerts_consumer.go:101-103`).
    val parseable = withProj.filter(col("ts").isNotNull)
    val ignored = parseable.filter(size(col("routes")) === 0)
    val nonEmpty = parseable.filter(size(col("routes")) > 0)
    val deadLetter = withProj
      .filter(col("ts").isNull || (size(col("routes")) > 0 && col("record_err").isNotNull))
    val valid = nonEmpty.filter(col("record_err").isNull)

    // O13/O14 — routing tag: an AWS region only when an allow-listed series
    // is present AND the record carries region/pod-region; else "default"
    // (`alerts_consumer.go:214-223`)
    def strField(name: String): Column = {
      val f = try_element_at(col("fields"), lit(name))
      when(schema_of_variant(f) === "STRING", f.cast("string"))
    }
    val hasAllowlisted =
      exists(col("routes"), r => r.getField("series").isin(allowlist: _*))
    val tag = when(
      hasAllowlisted,
      coalesce(strField("region"), strField("pod-region"), lit("default"))
    ).otherwise(lit("default"))

    // O12 — Datadog series: one point per series entry, Unix-second ts
    // (`alerts_consumer.go:194-204`)
    val dd = valid
      .withColumn("tag", tag)
      .select(
        explode(col("proj")).as("m"),
        unix_timestamp(col("ts")).as("ts_sec"),
        col("tag")
      )
      .select(
        col("m.metric").as("metric"),
        col("m.dd_type").as("type"),
        col("m.tags").as("tags"),
        col("ts_sec").as("point_ts"),
        col("m.value").as("point_value"),
        col("m.rule").as("rule"),
        col("tag")
      )

    // O13 — CloudWatch datum for allow-listed series, only when a region is
    // resolvable (`alerts_consumer.go:206-223`); StorageResolution fixed 1
    val cw = valid
      .withColumn("region_tag", coalesce(strField("region"), strField("pod-region")))
      .filter(col("region_tag").isNotNull)
      .select(
        explode(filter(col("proj"), p => p.getField("series").isin(allowlist: _*))).as("m"),
        col("ts"),
        col("region_tag")
      )
      .select(
        col("m.series").as("metric_name"),
        col("m.cw_dimensions").as("dimensions"),
        col("m.value").as("value"),
        col("ts").as("timestamp"),
        lit(1).as("storage_resolution"),
        col("region_tag")
      )

    Projected(dd, cw, deadLetter.select(col("*")), ignored.select(col("*")))
  }
}
