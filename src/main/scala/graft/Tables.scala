package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * `events.ts` is epoch-nano LongType engine-wide. Early driver fixtures
  * wrote parquet TIMESTAMP(NANOS), which Spark reads as that directly
  * under `nanosAsLong` (Spark has no ns-precision timestamp); round-10
  * fixtures write TIMESTAMP(MICROS) instead, which [[events]] converts
  * back to nano-longs at this single load point so no query changes.
  * DuckDB sees a µs timestamp either way (it truncated NANOS on read), so
  * oracle-visible precision is µs — conversions downstream always
  * floor-divide, never round, and µs×1000 nanos floor identically.
  */
final case class Tables(spark: SparkSession, dir: String) {
  GraftSession.tune(spark)
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // TIMESTAMP(NANOS) fixture
      case _ =>
        // TIMESTAMP(MICROS) fixture: NTZ wall time is UTC (session tz is
        // pinned UTC, so the cast is identity) → epoch-µs → epoch-ns
        import org.apache.spark.sql.functions.{col, unix_micros}
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
