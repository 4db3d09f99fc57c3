package graft

import org.apache.spark.sql.functions._

/** The banded-recall harnesses' construction contract, pinned across all
  * three perceptual modalities (image / video / audio): every planted
  * pair's measured hamming must be EXACTLY its target t (the oracle
  * verifies the SQL replay agrees with the codec path; this spec closes
  * the remaining loop — that the replayed construction itself lands on
  * t, min = max = t per group), and the measured per-t recall curve is
  * the banding math's prediction: 1.0 at t ≤ 3 (pigeonhole over 4 bands),
  * decaying above.
  */
class RecallHarnessSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def curve(name: String): Map[Long, (Long, Long, Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("t"), col("n_pairs"), col("n_recovered"),
        col("min_hamming"), col("max_hamming"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def checkConstruction(name: String): Map[Long, (Long, Long, Long, Long)] = {
    val c = curve(name)
    assert(c.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L), s"$name t groups: ${c.keySet}")
    c.foreach { case (t, (n, rec, mn, mx)) =>
      assert(mn === t && mx === t, s"$name t=$t hamming not exact: min=$mn max=$mx")
      assert(n > 0 && rec <= n, s"$name t=$t degenerate group")
      if (t <= 3) assert(rec === n, s"$name t=$t pigeonhole recall broken: $rec/$n")
    }
    Bench.cleanup(spark)
    c
  }

  test("image harness: exact hamming t, pigeonhole recall at t <= 3") {
    val c = checkConstruction("q_dedup_phash_recall")
    // above the guarantee the curve decays — pinned at sf0.001
    assert(c(5L)._2 === 0L && c(6L)._2 === 0L,
      s"image t=5/6 recall changed: ${c(5L)} ${c(6L)}")
  }

  test("video harness: exact WORST-FRAME hamming t, pigeonhole recall at t <= 3") {
    val c = checkConstruction("q_dedup_phash_recall_video")
    assert(c(5L)._2 === 0L && c(6L)._2 === 0L,
      s"video t=5/6 recall changed: ${c(5L)} ${c(6L)}")
  }

  test("audio harness: exact hamming t, pigeonhole recall at t <= 3") {
    val c = checkConstruction("q_dedup_phash_recall_audio")
    assert(c(5L)._2 === 0L && c(6L)._2 === 0L,
      s"audio t=5/6 recall changed: ${c(5L)} ${c(6L)}")
  }
}
