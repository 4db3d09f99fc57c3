package graft.routes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O4–O9 — route determination: kvmeta-embedded rules plus the three
  * hard-coded global rules, all expressed as columnar `when`-guarded route
  * arrays concatenated per record (reference: `alerts_consumer.go:83-103`,
  * `global_routes.go`).
  *
  * One log record fans out to N routes; the fan-out is a single `transform`/
  * `concat` over arrays — no shuffle, fused by whole-stage codegen — and the
  * actual row explosion happens once, downstream in MetricProject.
  */
object RouteEngine {

  /** Emitted-route struct DDL (wire `type` dropped — only `alerts` survive;
    * `alerts_consumer.go:92`). */
  val routeDdl =
    "array<struct<series:string,dimensions:array<string>,stat_type:string,value_field:string,rule:string>>"

  /** Mongo slow-query regex, verbatim semantics of `global_routes.go:88`. */
  val mongoRegex = "^\\[conn\\d+\\]\\s([a-z]+)\\s([^\\s]+?)\\s.*\\s(\\d+)ms$"

  private def emptyRoutes: Column = array().cast(routeDdl)

  private[graft] def numericVariant(tp: Column): Column =
    tp.isin("DOUBLE", "FLOAT", "BIGINT", "INT", "SMALLINT", "TINYINT") ||
      tp.startsWith("DECIMAL")

  /** String-typed field lookup: Go type-asserts `.(string)`, so a numeric or
    * bool value does NOT match (`global_routes.go:41-58,139-150`). */
  private def strField(name: String): Column = {
    val v = try_element_at(col("fields"), lit(name))
    when(schema_of_variant(v) === "STRING", v.cast("string"))
  }

  private def route(
      series: Column,
      dims: Column,
      statType: Column,
      valueField: Column,
      rule: String
  ): Column =
    struct(
      series.as("series"),
      dims.as("dimensions"),
      statType.as("stat_type"),
      valueField.as("value_field"),
      lit(rule).as("rule")
    )

  /** Adds `routes` (emitted alert routes, reference order: kvmeta, then
    * process-metrics, rds, mongo), `rule_names` (ALL kvmeta route rules,
    * for the volume aggregation — `alerts_consumer.go:90`), and merges the
    * mongo-derived fields into `fields` (the reference mutates the fields
    * map, `global_routes.go:107-110`).
    */
  def withRoutes(parsed: DataFrame): DataFrame = {
    // O4/O5 — kvmeta alert routes + default dims appended
    val kvRoutes = coalesce(col("kvmeta").getField("routes"), array().cast(
      "array<struct<type:string,series:string,dimensions:array<string>,stat_type:string,value_field:string,rule:string>>"))
    val kvAlertsNamed = transform(
      filter(kvRoutes, r => r.getField("type") === "alerts"),
      r =>
        struct(
          r.getField("series").as("series"),
          concat(
            coalesce(r.getField("dimensions"), array().cast("array<string>")),
            array(lit("Hostname"), lit("env"))
          ).as("dimensions"),
          r.getField("stat_type").as("stat_type"),
          coalesce(r.getField("value_field"), lit("")).as("value_field"),
          r.getField("rule").as("rule")
        )
    )

    // O6 — process-metrics (`global_routes.go:40-74`); all four guard fields
    // must be string-typed; "guage" library typo normalized
    val via = strField("via")
    val pmSource = strField("source")
    val pmTitle = strField("title")
    val pmStat = strField("type")
    val pmRoutes = when(
      via === "process-metrics" && pmSource.isNotNull && pmTitle.isNotNull && pmStat.isNotNull,
      array(
        route(
          concat(lit("process-metrics."), pmTitle),
          array(lit("Hostname"), lit("env"), lit("source")),
          when(pmStat === "guage", lit("gauge")).otherwise(pmStat),
          lit("value"),
          "global-process-metrics"
        )
      )
    ).otherwise(emptyRoutes)

    // O8 — rds slow queries (`global_routes.go:138-162`)
    val user = strField("user")
    val rdsRoutes = when(
      col("hostname") === "aws-rds" && user.isNotNull && user =!= "rdsadmin[rdsadmin]",
      array(
        route(
          lit("rds.slow-query"),
          array(lit("env"), lit("programname")),
          lit("counter"),
          lit("value"),
          "global-rds-slow-query-count"
        )
      )
    ).otherwise(emptyRoutes)

    // O7 — mongo slow queries (`global_routes.go:88-136`): regex over the
    // unparsed body; derives operation/namespace/is_collscan/millis into the
    // fields map; emits a counter + a gauge route
    val op = regexp_extract(col("rawlog"), mongoRegex, 1)
    val ns = regexp_extract(col("rawlog"), mongoRegex, 2)
    val ms = regexp_extract(col("rawlog"), mongoRegex, 3)
    // cheap prefix guard short-circuits the (anchored) regex for the vast
    // majority of records — the regex itself only runs on "[conn…" lines
    val mongoMatch =
      col("rawlog").isNotNull && col("rawlog").startsWith("[conn") && op =!= "" && ms =!= ""
    val mongoDims = array(lit("hostname"), lit("operation"), lit("namespace"), lit("is_collscan"))
    val mongoRoutes = when(
      mongoMatch,
      array(
        route(lit("mongo.slow-query"), mongoDims, lit("counter"), lit(""),
          "global-mongo-slow-query-count"),
        route(lit("mongo.slow-query-millis"), mongoDims, lit("gauge"), lit("millis"),
          "global-mongo-slow-query-gauge")
      )
    ).otherwise(emptyRoutes)

    parsed
      .withColumn(
        "fields",
        // evaluate-once fence: the merged map is read per-dimension by
        // every downstream consumer (see graft.plans.OptimizerBarrier)
        graft.plans.OptimizerBarrier.once(
          when(
            mongoMatch,
            map_concat(
              col("fields"),
              map(
                lit("operation"), op.cast("variant"),
                lit("namespace"), ns.cast("variant"),
                lit("is_collscan"), col("rawlog").contains("COLLSCAN").cast("variant"),
                lit("millis"), ms.cast("double").cast("variant")
              )
            )
          ).otherwise(col("fields"))
        )
      )
      .withColumn(
        "routes",
        graft.plans.OptimizerBarrier.once(concat(kvAlertsNamed, pmRoutes, rdsRoutes, mongoRoutes))
      )
      .withColumn(
        "rule_names",
        transform(kvRoutes, r => r.getField("rule"))
      )
  }
}
