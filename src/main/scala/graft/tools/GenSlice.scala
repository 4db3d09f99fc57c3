package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-fixture generator: writes an N×-replicated slice of an
  * existing SF's `documents`/`embeddings` tables so the heavy lanes'
  * time-vs-SF curve extends one SF past the driver-provided fixtures
  * (round-15 verdict item 6). Replicas are id-shifted and DETERMINISTICALLY
  * perturbed — embeddings rotate their components by the replica index,
  * documents prefix a replica token — so replication does not plant
  * artificial exact-duplicate mass that would skew the dedup lanes'
  * pair statistics. Usage:
  *   runMain graft.tools.GenSlice <srcSfDir> <outDir> <factor>
  */
object GenSlice {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    // the rotation decorrelates replicas only while k % 64 != 0: a
    // factor past 64 would silently emit byte-identical embedding
    // replicas — exactly the artificial dup mass this tool avoids
    require(factor >= 1 && factor <= 64,
      s"factor must be in [1, 64] (embedding rotation wraps at 64), got $factor")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nV = emb.count()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nD = docs.count()
    val embOut = (0 until factor).map { k =>
      emb.select(
        (col("vec_id") + lit(k * nV)).as("vec_id"),
        // rotate components by k: preserves norms and the overall
        // distribution while decorrelating replicas
        expr(s"concat(slice(embedding, ${k % 64} + 1, 64 - ${k % 64}), slice(embedding, 1, ${k % 64}))")
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    embOut.repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val docsOut = (0 until factor).map { k =>
      docs.select(
        (col("doc_id") + lit(k * nD)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(lit(s"r${k}slice "), col("text"))).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(if (k == 0) 0L else s"r${k}slice ".length.toLong)).as("n_chars"))
    }.reduce(_ unionByName _)
    docsOut.repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"GENSLICE wrote $out: embeddings=${nV * factor} documents=${nD * factor}")
    spark.stop()
  }
}
