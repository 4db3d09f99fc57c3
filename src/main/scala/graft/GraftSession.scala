package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard local-mode tuning.
  *
  * Shuffle partitions track the core count (instead of the 200 default) so
  * local runs don't pay idle-task scheduling overhead; AQE coalesces and
  * re-plans beyond that. On a real cluster the same code runs with
  * cluster-sized `spark.sql.shuffle.partitions` — nothing below hard-codes
  * local assumptions.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Runtime confs any externally-created session needs before running the
    * engine: `events.parquet` carries TIMESTAMP(NANOS) (read as epoch-nano
    * LongType), and the log parser merges payload/envelope maps where the
    * envelope must win on key collision (reference semantics: header fields
    * override body fields, `alerts_consumer.go:106-109`).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark
  }
}
