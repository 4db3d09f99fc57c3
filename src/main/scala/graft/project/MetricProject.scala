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
  * the record-level error is computed as a *cheap* predicate over the route
  * array (no tag/datum construction), the stream splits on it, and the
  * expensive per-route projection runs only on valid records AFTER
  * `explode` — one bad route still poisons the whole record, exactly like
  * the reference's early return.
  *
  * Plan-size note: an earlier shape built an array of fully-projected route
  * structs pre-explode; Catalyst's filter pushdown re-inlined that tree into
  * every downstream consumer (1.3M-char plans, 50 MiB task binaries). The
  * explode-first shape keeps each Project small and the Generate node stops
  * expression substitution — plans stay in the tens-of-KB range.
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

  /** First hard error a route would produce, else null — dimension cast
    * error, value-type error, or invalid stat type
    * (`alerts_consumer.go:126-192`). Kept intentionally small: this is the
    * only per-route expression that runs pre-explode (and gets inlined into
    * the stream-split filters by predicate pushdown).
    */
  private def routeErr(r: Column): Column = {
    val badDim = try_element_at(
      filter(
        r.getField("dimensions"),
        d => {
          val v = try_element_at(col("fields"), d)
          v.isNotNull && coerceDim(v).isNull
        }
      ),
      lit(1)
    )
    val v = try_element_at(col("fields"), coalesce(r.getField("value_field"), lit("")))
    val valueBad =
      v.isNotNull && !RouteEngine.numericVariant(schema_of_variant(v))
    val statType = r.getField("stat_type")
    when(
      badDim.isNotNull,
      concat(
        lit("error casting dimension value. rule="),
        coalesce(r.getField("rule"), lit("")),
        lit(" dim="), badDim
      )
    ).when(
      valueBad,
      concat(
        lit("value exists but is wrong type. rule="),
        coalesce(r.getField("rule"), lit("")),
        lit(" value_field="), r.getField("value_field")
      )
    ).when(
      !statType.isin("counter", "gauge"),
      concat(lit("invalid StatType: "), coalesce(statType, lit("")))
    )
  }

  private def strField(name: String): Column = {
    val f = try_element_at(col("fields"), lit(name))
    when(schema_of_variant(f) === "STRING", f.cast("string"))
  }

  /** Adds `record_err` (first hard error, or null) and `status`
    * ('ok' | 'dead' | 'ignored') in one pass — the record-level split
    * decision without materializing three frames. */
  def withStatus(routed: DataFrame): DataFrame =
    routed
      .withColumn(
        "record_err",
        // unparseable header (null ts) → the `decode.ParseAndEnhance` error
        // analog, checked before anything else (`alerts_consumer.go:55-63`,
        // `:111-114`); otherwise first route error wins (early return).
        // Fenced: consumers reference it several times (status, filters,
        // aggregates) and the routeErr scan must run once per record.
        graft.plans.OptimizerBarrier.once(
          when(col("ts").isNull, lit("unable parse Time from message's 'timestamp' field"))
            .otherwise(
              try_element_at(
                filter(transform(col("routes"), r => routeErr(r)), e => e.isNotNull),
                lit(1)
              )
            )
        )
      )
      .withColumn(
        "status",
        when(col("record_err").isNotNull, "dead")
          // O9 — zero routes → intentionally skipped (`alerts_consumer.go:101-103`)
          .when(size(col("routes")) === 0, "ignored")
          .otherwise("ok")
      )

  def project(routed: DataFrame): Projected = projectStatused(withStatus(routed))

  /** Same as [[project]] but over an already-statused frame — lets the
    * streaming sink persist one parsed/statused micro-batch and derive all
    * four lanes from the cache (one parse per record, three cached scans). */
  def projectStatused(withErr: DataFrame): Projected = {
    val allowlist = KayveeModel.cloudwatchAllowList

    val deadLetter = withErr.filter(col("status") === "dead")
    val ignored = withErr.filter(col("status") === "ignored")
    val valid = withErr.filter(col("status") === "ok")

    // O13/O14 — routing tag: an AWS region only when an allow-listed series
    // is present AND the record carries region/pod-region; else "default"
    // (`alerts_consumer.go:214-223`)
    val hasAllowlisted =
      exists(col("routes"), r => r.getField("series").isin(allowlist: _*))
    val tag = when(
      hasAllowlisted,
      coalesce(strField("region"), strField("pod-region"), lit("default"))
    ).otherwise(lit("default"))

    // Heavy per-route projection runs POST-explode on the generator output:
    // order-preserving dim→tag transform (missing fields silently skipped),
    // value resolution w/ counter-1/gauge-0 defaults.
    val r = col("route")
    val entries = transform(
      r.getField("dimensions"),
      d => {
        val v = try_element_at(col("fields"), d)
        struct(
          d.as("dim"),
          when(v.isNotNull, concat(d, lit(":"), coerceDim(v))).as("tag")
        )
      }
    )
    val num = {
      val v = try_element_at(col("fields"), coalesce(r.getField("value_field"), lit("")))
      when(RouteEngine.numericVariant(schema_of_variant(v)), v.cast("double"))
    }
    val statType = r.getField("stat_type")
    val value = when(statType === "counter", coalesce(num, lit(1.0)))
      .otherwise(coalesce(num, lit(0.0)))

    // O12 — Datadog series: one point per series entry, Unix-second ts
    // (`alerts_consumer.go:194-204`)
    // record_id retained end-to-end: the per-record grouping the reference
    // keeps via EncodeOutput — and it keeps the upstream non-deterministic
    // projection alive so column pruning can't re-enable filter pushdown
    // into the parse tree (the plan-size guard above).
    val dd = valid
      .withColumn("tag", tag)
      .select(
        explode(col("routes")).as("route"),
        col("record_id"), col("fields"), col("ts"), col("tag")
      )
      .withColumn("entries", entries)
      .select(
        col("record_id"),
        concat(lit("kv."), r.getField("series")).as("metric"),
        when(statType === "counter", "count").otherwise("gauge").as("type"),
        filter(transform(col("entries"), e => e.getField("tag")), t => t.isNotNull).as("tags"),
        unix_timestamp(col("ts")).as("point_ts"),
        value.as("point_value"),
        r.getField("rule").as("rule"),
        col("tag")
      )

    // O13 — CloudWatch datum for allow-listed series, only when a region is
    // resolvable (`alerts_consumer.go:206-223`); StorageResolution fixed 1;
    // CW dimensions exclude the appended defaults (`alerts_consumer.go:151-155`)
    val defaults = KayveeModel.defaultDimensions
    val cw = valid
      .withColumn("region_tag", coalesce(strField("region"), strField("pod-region")))
      .filter(col("region_tag").isNotNull)
      .select(
        explode(filter(col("routes"), rt => rt.getField("series").isin(allowlist: _*))).as("route"),
        col("record_id"), col("fields"), col("ts"), col("region_tag")
      )
      .withColumn("entries", entries)
      .select(
        col("record_id"),
        r.getField("series").as("metric_name"),
        filter(
          transform(
            col("entries"),
            e =>
              when(
                e.getField("tag").isNotNull && !e.getField("dim").isin(defaults: _*),
                struct(
                  e.getField("dim").as("name"),
                  // tag is "dim:value"; strip the "dim:" prefix to recover
                  // the coerced value without re-coercing
                  e.getField("tag").substr(length(e.getField("dim")) + 2, lit(Int.MaxValue)).as("value")
                )
              )
          ),
          x => x.isNotNull
        ).as("dimensions"),
        value.as("value"),
        col("ts").as("timestamp"),
        lit(1).as("storage_resolution"),
        col("region_tag")
      )

    Projected(dd, cw, deadLetter, ignored)
  }
}
