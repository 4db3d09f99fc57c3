package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.DedupQueries

/** Scratch timing probe for the banded q_dedup_embed stages.
  *
  * DEV TOOL ONLY — the `.collect()` below is deliberate (tiny 1-row agg,
  * driver-side timing harness) and is the one allowed in `src/main`. Do
  * NOT imitate it in a declared query: query results stay distributed.
  */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("embed-probe")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val n = DedupQueries.embedCorpus(spark, dir)
    time("corpus count")(n.count())
    // DEV TOOL collect (see header): 1-row aggregate, timing only
    time("corpus+nrm collect-ish")(n.agg(sum(col("nrm"))).collect())
    val cands = DedupQueries.embedCandidates(n)
    val c = time("candidates count")(cands.count())
    println(s"== candidates: $c")
    val full = graft.SparkEntry.queries("q_dedup_embed")(spark, dir)
    time("full query")(full.count())
    spark.stop()
  }
}
