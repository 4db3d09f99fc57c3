package graft.routes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O18 — declarative self-log routing rules (`kvconfig.yml:1-28`): the
  * consumer routes its OWN logs through the same engine. A rule is a set of
  * field matchers (exact allowed-values list, or "*" = field-presence
  * wildcard) plus an output route. Rules compile to one `when`-guarded
  * route-array concat — same shape as RouteEngine's global rules, but
  * driven by data, so a config file maps 1:1 onto `Seq[SelfLogRule]`.
  */
object SelfLogRules {

  /** One matcher rule: every listed field must match (AND); a value list of
    * ["*"] means "field present with any string value". */
  final case class SelfLogRule(
      name: String,
      matchers: Map[String, Seq[String]],
      series: String,
      dimensions: Seq[String],
      statType: String = "counter",
      valueField: String = "value"
  )

  /** The reference's own config (`kvconfig.yml`), as data. The Slack
    * notification route is modeled as a counter series — notification
    * transports are a sink concern, not a routing one. */
  val referenceRules: Seq[SelfLogRule] = Seq(
    SelfLogRule(
      "unknown-error",
      Map("title" -> Seq("unknown-parse-failure")),
      "kinesis-consumer.alerts.unknown-parse-failure",
      Seq("Hostname", "env")
    ),
    SelfLogRule(
      "failed-sending-volumes",
      Map("title" -> Seq("failed-sending-volumes"), "error" -> Seq("*")),
      "kinesis-consumer.alerts.failed-sending-volumes",
      Seq("Hostname", "env")
    ),
    SelfLogRule(
      "cloudwatch-error",
      Map("title" -> Seq("error-sending-to-cloudwatch")),
      "kinesis-consumer.alerts.cloudwatch-error",
      Seq("Hostname", "env", "region")
    )
  )

  private def strField(name: String): Column = {
    val v = try_element_at(col("fields"), lit(name))
    when(schema_of_variant(v) === "STRING", v.cast("string"))
  }

  private def ruleGuard(r: SelfLogRule): Column =
    r.matchers
      .map { case (field, allowed) =>
        val f = strField(field)
        if (allowed == Seq("*")) f.isNotNull
        else f.isin(allowed: _*)
      }
      .reduce(_ && _)

  /** Adds the matched self-log routes to a parsed frame's `routes` column
    * (post-RouteEngine), so the rest of the pipeline (projection, sinks)
    * is reused unchanged. */
  def withSelfRoutes(parsed: DataFrame, rules: Seq[SelfLogRule] = referenceRules): DataFrame = {
    val routeCols = rules.map { r =>
      when(
        ruleGuard(r),
        array(struct(
          lit(r.series).as("series"),
          lit(r.dimensions.toArray).as("dimensions"),
          lit(r.statType).as("stat_type"),
          lit(r.valueField).as("value_field"),
          lit(r.name).as("rule")
        ))
      ).otherwise(array().cast(RouteEngine.routeDdl))
    }
    parsed.withColumn(
      "routes",
      concat(col("routes") +: routeCols: _*)
    )
  }
}
