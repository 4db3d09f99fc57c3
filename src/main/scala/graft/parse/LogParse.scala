package graft.parse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.KayveeModel

/** O3 — line parse / enrich (reference: `decode.ParseAndEnhance`, called at
  * `alerts_consumer.go:57`; observable spec `alerts_consumer_test.go:21-63`).
  *
  * Raw line shape (FIXTURES.md A1):
  * {{{
  * <RFC3339Nano ts> <hostname> <env>--<app>/<url-enc ARN>[pid]: <kayvee JSON>
  * }}}
  *
  * Everything is a columnar expression (regexp_extract / from_json), so the
  * whole parse stage stays inside whole-stage codegen and Catalyst's
  * `OptimizeJsonExprs` can prune unused JSON branches.
  */
object LogParse {

  /** Parses a DataFrame with a raw-line string column into the envelope +
    * dynamic-payload shape of KayveeModel. Adds columns:
    * ts, hostname, programname, container_env, container_app, env, team,
    * rawlog, nbytes, kvmeta, fields (map<string,variant>).
    *
    * @param deployEnv injected `DEPLOY_ENV` — overrides the env embedded in
    *   the program name (`alerts_consumer_test.go:19,41`: raw says
    *   `production`, emitted tag says `env:test-env`).
    */
  def parse(df: DataFrame, deployEnv: String, rawCol: String = "raw"): DataFrame = {
    val raw = col(rawCol)
    def nonEmpty(c: org.apache.spark.sql.Column) = when(c =!= "", c)

    val withEnvelope = df
      .withColumn("nbytes", length(raw).cast("long"))
      // try_: Spark 4 runs ANSI mode; an unparseable header must yield a
      // null ts (→ dead-letter downstream, the `ParseAndEnhance` error
      // analog) rather than fail the task
      .withColumn("ts", try_to_timestamp(regexp_extract(raw, "^(\\S+)", 1)))
      .withColumn("hostname", nonEmpty(regexp_extract(raw, "^\\S+\\s+(\\S+)", 1)))
      .withColumn(
        "programname",
        nonEmpty(regexp_extract(raw, "^\\S+\\s+\\S+\\s+([^\\s\\[]+)\\[", 1))
      )
      // `env--app/arn` decode (`alerts_consumer.go:84-85`)
      .withColumn("container_env", nonEmpty(regexp_extract(col("programname"), "^(.*?)--", 1)))
      .withColumn("container_app", nonEmpty(regexp_extract(col("programname"), "--([^/]*)", 1)))
      .withColumn("env", lit(deployEnv))
      // unparsed message body; the mongo global rule regex-matches this
      // (`global_routes.go:91-96`) so it is set for JSON and non-JSON alike
      .withColumn(
        "rawlog",
        when(instr(raw, "]: ") > 0, raw.substr(instr(raw, "]: ") + lit(3), length(raw)))
          .otherwise(raw)
      )

    val payload = from_json(col("rawlog"), lit("map<string,variant>"))
    val typed = from_json(col("rawlog"), KayveeModel.bodySchema)

    withEnvelope
      .withColumn(
        "payload",
        coalesce(payload, from_json(lit("{}"), lit("map<string,variant>")))
      )
      .withColumn("kvmeta", typed.getField("_kvmeta"))
      // `team` field, else `_kvmeta.team` (`alerts_consumer.go:86-89`)
      .withColumn(
        "team",
        coalesce(
          nonEmpty(typed.getField("team")),
          nonEmpty(col("kvmeta").getField("team"))
        )
      )
      // Fields map for data-driven dimension lookup: JSON payload merged
      // with the envelope; envelope wins on collision (LAST_WIN, matching
      // header-over-body precedence). `Hostname` duplicated for backwards
      // compat (`alerts_consumer.go:106-109`).
      .withColumn(
        "fields",
        map_concat(
          col("payload"),
          map_filter(
            map(
              lit("timestamp"), col("ts").cast("variant"),
              lit("hostname"), col("hostname").cast("variant"),
              lit("Hostname"), col("hostname").cast("variant"),
              lit("programname"), col("programname").cast("variant"),
              lit("container_env"), col("container_env").cast("variant"),
              lit("container_app"), col("container_app").cast("variant"),
              lit("env"), col("env").cast("variant"),
              lit("rawlog"), col("rawlog").cast("variant")
            ),
            (_, v) => v.isNotNull
          )
        )
      )
  }
}
