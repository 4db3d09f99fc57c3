package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-facing query: a Spark implementation over the parquet test
  * tables plus (usually) a DuckDB-equivalent SQL oracle. Column names must
  * match between the two — the driver sorts columns by name and hashes
  * values — so every computed column is aliased identically on both sides.
  * Oracle-less queries get a weaker rows-only check from the driver.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
