package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O1/O2 — source wiring with the reference's ingest envelope
  * (`run_kcl.sh`, `consumer.properties.template`, `main.go:54-59`).
  *
  * The reference consumes Kinesis through the KCL MultiLangDaemon with
  * DynamoDB lease checkpointing, TRIM_HORIZON/LATEST start positions, a
  * per-worker read rate limit, and 10k-record GetRecords fetches. Spark
  * mapping, by config key:
  *
  * | reference                           | Spark option                          |
  * |-------------------------------------|---------------------------------------|
  * | initialPositionInStream             | startingPosition (kinesis connector)  |
  * | DynamoDB lease/checkpoint table     | checkpointLocation                    |
  * | READ_RATE_LIMIT / maxRecords        | maxFetchRate / maxFilesPerTrigger /   |
  * |                                     |   maxOffsetsPerTrigger (per source)   |
  * | BatchInterval 5s                    | Trigger.ProcessingTime("5 seconds")   |
  * | failed-log spill file               | StreamPipeline.Config.deadLetterPath  |
  *
  * The zero-egress build has no Kinesis connector jar, so the production
  * source is constructed by format name (resolved at runtime when the
  * connector is on the cluster classpath); tests and local runs use the
  * file/memory sources below — the pipeline itself is source-agnostic.
  */
object Sources {

  /** Kinesis source (requires the spark-sql-kinesis connector on the
    * cluster classpath; `format` overridable for compatible forks). */
  def kinesis(
      spark: SparkSession,
      streamName: String,
      region: String,
      startingPosition: String = "TRIM_HORIZON",
      maxFetchRate: Option[Int] = None,
      format: String = "aws-kinesis"
  ): DataFrame = {
    val base = spark.readStream
      .format(format)
      .option("streamName", streamName)
      .option("region", region)
      .option("startingPosition", startingPosition)
    maxFetchRate.fold(base)(r => base.option("maxFetchRate", r.toString))
      .load()
      .selectExpr("CAST(data AS STRING) AS raw")
  }

  /** File-drop source — the local/integration-test stand-in; rate-limited
    * ingest via maxFilesPerTrigger (READ_RATE_LIMIT analog). */
  def fileLines(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .withColumnRenamed("value", "raw")
}
