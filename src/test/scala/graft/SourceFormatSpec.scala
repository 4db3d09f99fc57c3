package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-format parity: the engine's queries are declared over frames,
  * not files, so any Spark-readable format must produce identical
  * results. Round-trips the orders table through ORC, JSON and CSV
  * (schema-pinned — the two text formats can't self-describe types) and
  * asserts a representative aggregation matches the parquet original
  * bit-for-bit. At 100 TB this is the contract that lets a corpus land
  * in whatever format the upstream produces and still join the parquet
  * lake losslessly.
  */
class SourceFormatSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def probe(df: DataFrame): Seq[String] =
    df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        max(col("o_orderdate")).as("last"))
      .collect().map(_.toString).sorted.toSeq

  test("orders reads identically from parquet, ORC, JSON and CSV") {
    val dir = Files.createTempDirectory("graft-formats").toString
    val orders = Tables(spark, sf).orders
    val expect = probe(orders)
    val schema = orders.schema

    orders.write.mode("overwrite").orc(s"$dir/orc")
    orders.write.mode("overwrite").json(s"$dir/json")
    orders.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(s"$dir/csv")

    assert(probe(spark.read.orc(s"$dir/orc")) === expect, "orc")
    assert(probe(spark.read.schema(schema).json(s"$dir/json")) === expect, "json")
    assert(probe(spark.read.schema(schema)
      .option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(s"$dir/csv")) === expect, "csv")
  }
}
