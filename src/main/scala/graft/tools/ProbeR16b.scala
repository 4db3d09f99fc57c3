package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway: bisect q_corpus_pipeline's mix_pack phase. */
object ProbeR16b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // replicate stages 0-4 quickly via the declared query body's caches:
    // run the full query once (warms all caches), then re-time the tail
    graft.SparkEntry.queries("q_corpus_pipeline")(spark, dir).count()
    def t[A](name: String)(body: => A): Unit = {
      val t0 = System.nanoTime(); body
      println(f"BISECT $name ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // d is cached inside the query body; rebuild the tail from scratch
    // is hard here — instead run the whole query again and time it warm
    t("whole_query_warm") { graft.SparkEntry.queries("q_corpus_pipeline")(spark, dir).count() }
    // now directly time generic window work over a comparable frame
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        col("text"), length(col("text")).cast("long").as("n_tokens"))
      .persist()
    docs.count()
    t("rk_window_over_docs") {
      docs.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(md5(concat(lit("mix42#"), col("doc_id").cast("string")))))).count()
    }
    t("cum_window_over_docs") {
      docs.withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))).count()
    }
    t("agg_quota") {
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(min(col("n")).as("mn")))).count()
    }
    spark.stop()
  }
}
