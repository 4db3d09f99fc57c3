package graft

/** The property q_dedup_incremental exists for: candidates are CROSS-SET
  * by construction of the band join, so duplicates WITHIN the existing
  * index (or within the batch) are never re-reported — the full-corpus
  * pass already owns those. The fixture plants exactly that trap: two
  * identical docs inside the index, two identical docs inside the batch,
  * and one genuine batch-vs-index near-duplicate; only the last may
  * surface. Shingle width is 3 (the production w), so doc texts are long
  * enough to band.
  */
class IncrementalDedupSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  test("only batch-vs-index pairs surface; intra-index and intra-batch dups never do") {
    val text = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val other = "completely different words about spark plans shuffles and partitions in a cluster engine"
    val docs = Seq(
      (1L, "en", text),            // index
      (2L, "en", text),            // index — identical to 1 (intra-index dup)
      (3L, "en", other),           // index — unrelated
      (100L, "en", text + " tail"), // batch — near-dup of index docs 1 and 2
      (101L, "en", "unrelated batch text that matches nothing in the index at all today ok"),
      (102L, "en", "unrelated batch text that matches nothing in the index at all today ok")
      // 101/102 identical: intra-batch dup, must not surface either
    ).toDF("doc_id", "lang", "text")

    val out = graft.queries.DedupQueries.incrementalDedup(docs, 100L, 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    // every reported pair is (batch, index) — cross-set by construction
    out.foreach { case (b, i) =>
      assert(b >= 100L && i < 100L, s"non-cross-set pair ($b, $i) surfaced")
    }
    // the genuine near-dup is found against BOTH identical index docs
    assert(out === Set((100L, 1L), (100L, 2L)))
  }

  test("index bands survive a parquet round-trip: the STORED-index dataflow") {
    // the scale claim: the full pass writes (doc_id, b, bv) once; every
    // increment joins fresh batch bands against the stored frame. Prove
    // the storage contract - band rows written to parquet and read back
    // drive the same candidate join as the recomputed frame.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-band-index").toString
    val corpus = Tables(SharedSpark.spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("lang"), col("text"))
    val sarr = graft.queries.DedupQueries.shingleArrays(corpus)
    val bands = graft.queries.DedupQueries.minhashBands(sarr)
    bands.write.mode("overwrite").parquet(s"$dir/band_index")
    val stored = SharedSpark.spark.read.parquet(s"$dir/band_index")

    def cands(idx: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      bands.select(col("b"), col("bv"), col("doc_id").as("doc_a"))
        .join(idx.select(col("b"), col("bv"), col("doc_id").as("doc_b")), Seq("b", "bv"))
        .filter(col("doc_a") =!= col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val fromStored = cands(stored)
    assert(fromStored === cands(bands), "stored index must drive identical candidates")
  }
}
