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

    // Header fields via substring_index, not regexp_extract: the syslog
    // header is strictly space-delimited, and a regex scan of the full line
    // (which is mostly JSON body) per field is ~100× the cost of indexed
    // splits — this is the 100 TB hot path.
    def token(n: Int) = substring_index(substring_index(raw, " ", n), " ", -1)
    val progSeg = token(3)
    val withEnvelope = df
      .withColumn("nbytes", length(raw).cast("long"))
      // try_: Spark 4 runs ANSI mode; an unparseable header must yield a
      // null ts (→ dead-letter downstream, the `ParseAndEnhance` error
      // analog) rather than fail the task
      .withColumn("ts", try_to_timestamp(substring_index(raw, " ", 1)))
      .withColumn("hostname", nonEmpty(token(2)))
      .withColumn(
        "programname",
        nonEmpty(when(instr(progSeg, "[") > 0, substring_index(progSeg, "[", 1)).otherwise(progSeg))
      )
      // `env--app/arn` decode (`alerts_consumer.go:84-85`)
      .withColumn(
        "container_env",
        when(instr(col("programname"), "--") > 0, substring_index(col("programname"), "--", 1))
      )
      .withColumn(
        "container_app",
        // after the FIRST "--" (an app name may itself contain dashes),
        // then before any "/arn" suffix
        when(
          instr(col("programname"), "--") > 0,
          substring_index(
            col("programname").substr(instr(col("programname"), "--") + 2, length(col("programname"))),
            "/", 1
          )
        )
      )
      .withColumn("env", lit(deployEnv))
      // unparsed message body; the mongo global rule regex-matches this
      // (`global_routes.go:91-96`) so it is set for JSON and non-JSON alike
      .withColumn(
        "rawlog",
        when(instr(raw, "]: ") > 0, raw.substr(instr(raw, "]: ") + lit(3), length(raw)))
          .otherwise(raw)
      )

    // ONE JSON parse per record (the hot path at 100 TB): payload is a
    // variant map, and the typed `_kvmeta` struct is carved out of the
    // already-parsed variant with try_variant_get — no second from_json.
    val payload = from_json(col("rawlog"), lit("map<string,variant>"))

    withEnvelope
      .withColumn(
        "payload",
        // OptimizerBarrier: the JSON parse is the hot path — force
        // evaluate-once-per-row (see graft.plans.OptimizerBarrier)
        graft.plans.OptimizerBarrier.once(
          coalesce(payload, from_json(lit("{}"), lit("map<string,variant>")))
        )
      )
      .withColumn(
        "kvmeta",
        try_variant_get(
          try_element_at(col("payload"), lit("_kvmeta")),
          "$",
          KayveeModel.kvmetaSchema.sql
        )
      )
      // `team` field, else `_kvmeta.team` (`alerts_consumer.go:86-89`)
      .withColumn(
        "team",
        coalesce(
          nonEmpty(try_variant_get(try_element_at(col("payload"), lit("team")), "$", "string")),
          nonEmpty(col("kvmeta").getField("team"))
        )
      )
      // Fields map for data-driven dimension lookup: JSON payload merged
      // with the envelope; envelope wins on collision (LAST_WIN, matching
      // header-over-body precedence). `Hostname` duplicated for backwards
      // compat (`alerts_consumer.go:106-109`).
      .withColumn(
        "fields",
        graft.plans.OptimizerBarrier.once(map_concat(
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
        ))
      )
      // Record identity, assigned at parse time (the reference treats each
      // raw Kinesis record as the unit of work). Hash-based rather than
      // monotonically_increasing_id so the same pipeline runs under
      // Structured Streaming (which rejects m_i_id); duplicate raw lines
      // share an id, which is the right correlation semantics anyway.
      .withColumn("record_id", xxhash64(raw))
  }
}
