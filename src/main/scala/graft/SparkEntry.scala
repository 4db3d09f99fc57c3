package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query over `/root/testdata/sf*` with (usually) a DuckDB-oracle SQL
  * equivalent. Column names are aliased identically in both: the driver
  * sorts columns by name and hashes values.
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    RelationalQueries.defs ++ KayveeQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ MultimodalQueries.defs ++
      FunctionQueries.defs ++ PipelineQueries.defs ++ AnalyticsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q1_agg").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
