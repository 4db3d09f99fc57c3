package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway round-16 probe (deleted at round close): the beam-serving
  * recall-vs-eval-budget curve for docs/SCALING.md. */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for ((w, b) <- Seq((4, 3), (8, 3), (16, 3), (32, 4))) {
      val (_, _, out) = graft.queries.SimilarityQueries.beamServe(spark, dir, w, b)
      val r = out.selectExpr("sum(n_cand_g)", "sum(n_hit_g)", "sum(n_cand_beam)", "sum(n_hit_beam)")
        .head()
      println(s"PROBE beam W=$w B=$b: 2hop ${r.getLong(0)} evals ${r.getLong(1)}/40 | beam ${r.getLong(2)} evals ${r.getLong(3)}/40")
      graft.Bench.cleanup(spark)
    }
    spark.stop()
  }
}
