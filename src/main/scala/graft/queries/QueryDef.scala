package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-facing query: a Spark implementation over the parquet test
  * tables plus a DuckDB-equivalent SQL oracle. Column names must match
  * between the two — the driver sorts columns by name and hashes values —
  * so every computed column is aliased identically on both sides. The
  * oracle is an Option only for the DataFrame shape; since round 14 every
  * declared query carries one (the last oracle-less lane,
  * q_fleet_pipeline, now declares its batch-equivalence contract as a
  * hash-checkable per-shard aggregate).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
}

/** Cross-engine rounding for RATIONAL-valued output columns (ratios of
  * small integers: recall, Jaccard, token/stopword ratios, percent_rank).
  * These land on EXACT decimal halves (11/32 = 0.34375), where Spark's
  * `round()` (BigDecimal via Double.toString — rounds the printed decimal
  * UP) and DuckDB's `round()` (rounds the binary double, which sits a hair
  * BELOW the printed half) disagree — a cross-engine oracle-gate failure
  * measured live at sf0.1 in round 13 (q_quality_score, 0.53875). The
  * floor-first composition `floor(x·10ᵖ + 0.5)/10ᵖ` is the same correctly
  * rounded IEEE multiply/add/floor/divide in both engines, so the boundary
  * case is deterministic instead of engine-dependent. ONE definition per
  * engine lives here; every rational-valued column must use these, never
  * `round()`. (Irrational-valued columns — cosines, float averages — may
  * keep `round()`: their mass on the boundary is zero.) */
private[graft] object CrossRound {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.floor

  /** Spark side: floor-first rounding of `c` to `p` decimals. */
  def col(c: Column, p: Int): Column = {
    val m = math.pow(10, p)
    floor(c * m + 0.5d) / m
  }

  /** DuckDB side: the identical expression as SQL text. */
  def sql(expr: String, p: Int): String = {
    val m = s"1e$p"
    s"floor(($expr) * $m + 0.5) / $m"
  }
}
