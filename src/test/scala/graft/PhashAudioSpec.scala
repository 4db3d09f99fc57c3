package graft

import graft.media.MediaCodec
import graft.queries.MultimodalQueries

/** q_dedup_phash_audio behavioral contract plus the PCM dHash kernel's
  * defining properties:
  *
  *  - GAIN INVARIANCE: a positive amplitude scale changes every PCM byte
  *    but not one hash bit — window means scale together and the
  *    cross-multiplied comparisons (ties included) are scale-invariant.
  *    Pinned on the fixture twins (×2, clip-free by the hard walk
  *    bound) AND on a hand-built low-amplitude clip at ×3.
  *  - CONTENT SENSITIVITY: perturbing the envelope flips bits.
  *  - ZERO FALSE POSITIVES AT sf0.1: the declared query's output at the
  *    LARGEST fixture SF is exactly the planted twin set at hamming 0 —
  *    the measured claim the lane's scaladoc makes, re-derived here
  *    (round-12 verdict asked for the sf0.1 re-measure to be pinned).
  */
class PhashAudioSpec extends SparkSpec {

  private def bandsOf(p: Array[Byte]): Seq[Int] = {
    val m = MediaCodec.decode(p).get
    MediaCodec.pcmDhashBands(p, m).get.toSeq
  }

  test("fixture twins: every PCM byte pair differs, hash identical") {
    Seq(2L, 8L, 44L, 998L).foreach { id =>
      val a = MultimodalQueries.encodePcmWalkWav(id, gain = 1)
      val b = MultimodalQueries.encodePcmWalkWav(id, gain = 2)
      assert(bandsOf(a) === bandsOf(b), s"gain twin drifted for id $id")
      val ma = MediaCodec.decode(a).get
      val mb = MediaCodec.decode(b).get
      // the twin is a genuinely different byte stream (every nonzero
      // sample doubles), so byte-level dedup cannot recover it
      val da = a.slice(ma.dataOffset, ma.dataOffset + ma.dataLength)
      val db = b.slice(mb.dataOffset, mb.dataOffset + mb.dataLength)
      assert(!java.util.Arrays.equals(da, db))
    }
  }

  private def wav16(samples: Array[Int]): Array[Byte] = {
    val data = new Array[Byte](2 * samples.length)
    samples.indices.foreach { i =>
      data(2 * i) = samples(i).toByte
      data(2 * i + 1) = (samples(i) >> 8).toByte
    }
    MediaCodec.encodeWav(16000, 1, 16, data)
  }

  test("gain x3 on a hand-built clip is hash-invariant; envelope edits are not") {
    val n = 130
    // a low-amplitude wobble: alternating plateaus the windows resolve
    val s = Array.tabulate(n)(i => ((i / 10) % 3 - 1) * 500 + i % 7)
    val base = bandsOf(wav16(s))
    assert(bandsOf(wav16(s.map(_ * 3))) === base, "x3 gain flipped a bit")
    // flip the middle third's envelope: bits must move
    val edited = s.zipWithIndex.map { case (v, i) =>
      if (i >= n / 3 && i < 2 * n / 3) -v else v
    }
    assert(bandsOf(wav16(edited)) !== base, "an envelope edit left the hash unchanged")
  }

  test("short clips (< 65 samples) and non-wav payloads hash to None") {
    val short = wav16(Array.tabulate(64)(_ * 10))
    val m = MediaCodec.decode(short).get
    assert(MediaCodec.pcmDhashBands(short, m).isEmpty)
    val bmp = MediaCodec.encodeBmp(8, 8, Array.fill(64)(7.toByte))
    val mb = MediaCodec.decode(bmp).get
    assert(MediaCodec.pcmDhashBands(bmp, mb).isEmpty)
  }

  test("sf0.1: output is exactly the planted twin set at hamming 0 (zero false positives)") {
    val sf = "/root/testdata/sf0.1"
    val rows = SparkEntry.queries("q_dedup_phash_audio")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = Tables(spark, sf).documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 6 === 2)
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 4000000L, 0L)).toSet
    assert(rows.toSet === expected,
      "sf0.1 output must be exactly the twin pairs at hamming 0")
    Bench.cleanup(spark)
  }
}
