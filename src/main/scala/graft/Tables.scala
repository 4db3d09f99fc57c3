package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark reads as epoch-nano
  * LongType under `nanosAsLong` (Spark has no ns-precision timestamp).
  * DuckDB truncates the same column to µs on read, so oracle-visible
  * precision is µs — conversions here always floor-divide, never round.
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
  def events: DataFrame = t("events")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
