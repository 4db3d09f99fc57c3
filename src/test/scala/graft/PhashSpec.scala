package graft

import graft.media.MediaCodec

/** q_dedup_phash behavioral contract plus the dHash kernel's defining
  * properties:
  *
  *  - the declared query recovers EXACTLY the planted brightness-shifted
  *    twins at hamming 0 with zero false positives on the fixture (the
  *    per-id gradient+curvature formula keeps distinct images apart —
  *    measured at design time, pinned here);
  *  - brightness invariance: a clamp-free global luma shift never
  *    changes a single hash bit (cell means shift together, gradient
  *    signs cannot flip) — the property that makes dHash a perceptual
  *    signature rather than a byte hash;
  *  - content sensitivity: overwriting a grid cell's pixels flips bits;
  *  - the decoded-payload hash equals a formula-level recompute over the
  *    logical pixel array (no codec in the loop), so a stride or
  *    row-orientation bug in the BMP walk is a named failure.
  */
class PhashSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("planted twins recovered at hamming 0; zero false positives") {
    val rows = SparkEntry.queries("q_dedup_phash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val expected = Tables(spark, sf).documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 6 === 3)
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 2000000L, 0L)).toSet
    assert(rows.toSet === expected,
      "output must be exactly the twin pairs at hamming 0")
  }

  test("dHash is brightness-invariant, content-sensitive, and codec-free recomputable") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 25).foreach { _ =>
      val w = 9 + rnd.nextInt(30)
      val h = 8 + rnd.nextInt(20)
      // clamp-free range so +shift stays in [0,255]
      val px = Array.fill(w * h)((20 + rnd.nextInt(200)).toByte)
      val base = MediaCodec.encodeBmp(w, h, px)
      val m = MediaCodec.decode(base).get
      val bands = MediaCodec.dhashBands(base, m).get

      // formula-level recompute over the logical array — no codec
      val means = Array.tabulate(72) { ci =>
        val gx = ci % 9; val gy = ci / 9
        val xs = gx * w / 9 until (gx + 1) * w / 9
        val ys = gy * h / 8 until (gy + 1) * h / 8
        val vs = for (y <- ys; x <- xs) yield (px(y * w + x) & 0xff).toLong
        vs.sum / vs.length
      }
      val expect = new Array[Int](4)
      (0 until 64).foreach { b =>
        val gy = b / 8; val gx = b % 8
        if (means(gy * 9 + gx + 1) > means(gy * 9 + gx)) expect(b / 16) |= 1 << (b % 16)
      }
      assert(bands.toSeq === expect.toSeq, s"${w}x$h hash != logical recompute")

      // brightness invariance: +shift, clamp-free
      val shift = 1 + rnd.nextInt(30)
      val shifted = MediaCodec.encodeBmp(w, h, px.map(v => ((v & 0xff) + shift).toByte))
      val sb = MediaCodec.dhashBands(shifted, MediaCodec.decode(shifted).get).get
      assert(sb.toSeq === bands.toSeq, s"brightness +$shift changed the hash")

      // content sensitivity: FORCE bit (gy=2, gx=0) to flip — rewrite
      // cells (0,2) and (1,2) so their mean comparison inverts (a blind
      // single-cell blowout can leave both adjacent comparisons
      // unchanged, which made this probe flaky)
      val bitWas = means(2 * 9 + 1) > means(2 * 9 + 0)
      val (v0, v1) = if (bitWas) (255.toByte, 0.toByte) else (0.toByte, 255.toByte)
      val px2 = px.clone()
      val ys = (2 * h / 8) until (3 * h / 8)
      for (y <- ys; x <- 0 until w / 9) px2(y * w + x) = v0
      for (y <- ys; x <- (w / 9) until (2 * w / 9)) px2(y * w + x) = v1
      val changed = MediaCodec.encodeBmp(w, h, px2)
      val cb = MediaCodec.dhashBands(changed, MediaCodec.decode(changed).get).get
      assert(cb.toSeq !== bands.toSeq, s"${w}x$h forced bit flip left hash unchanged")
    }
    Bench.cleanup(spark)
  }

  test("video twins recovered at max-hamming 0 with aligned frame counts; no false positives") {
    val rows = SparkEntry.queries("q_dedup_phash_video")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val expected = Tables(spark, sf).documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 6 === 0)
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 3000000L, 4L + id % 4, 0L)).toSet
    assert(rows.toSet === expected,
      "output must be exactly the twin clip pairs at max-hamming 0")
  }

  test("dhashFrame == dhashBands of the same pixels through a BMP (cross-container)") {
    // the two wrappers differ only in storage mapping (raw logical frame
    // vs stride-padded bottom-up rows); same pixels must hash identically
    val rnd = new scala.util.Random(20260815L)
    (1 to 15).foreach { _ =>
      val w = 9 + rnd.nextInt(25)
      val h = 8 + rnd.nextInt(15)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val bmp = MediaCodec.encodeBmp(w, h, px)
      val viaBmp = MediaCodec.dhashBands(bmp, MediaCodec.decode(bmp).get).get
      val viaFrame = MediaCodec.dhashFrame(px, 0, px.length, w, h).get
      assert(viaFrame.toSeq === viaBmp.toSeq, s"${w}x$h wrappers disagree")
    }
    Bench.cleanup(spark)
  }

  test("phash cluster: twin components, minimum-member reps, exact pair-graph membership") {
    val rows = SparkEntry.queries("q_dedup_phash_cluster")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val pairs = SparkEntry.queries("q_dedup_phash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(rows.map(_._1).toSet === members,
      "cluster membership must be exactly the pair graph's node set")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min === cid, s"cluster $cid rep is not the minimum member")
      ms.foreach { m =>
        assert(m._3 === ms.length.toLong, s"csize drifted in cluster $cid")
        assert(m._4 === (m._1 == cid), s"is_rep wrong for ${m._1}")
      }
    }
    // at this SF the pair graph is exactly the planted twins — every
    // component is one twin pair
    assert(byCluster.values.forall(_.length == 2),
      "sf0.001 components must all be twin pairs")
    Bench.cleanup(spark)
  }

  test("sf0.1: twins all recovered at 0; every other emitted pair is a genuine sub-threshold near-dup") {
    // The round-12 scaladoc claimed zero false positives, measured at
    // sf0.01. The sf0.1 RE-MEASURE (this test, round-13 verdict item)
    // shows the honest picture: the 6x corpus contains non-twin image
    // pairs whose formula parameters land close enough that their TRUE
    // dHash distance is 3-6 — those are sub-threshold near-dups by the
    // hash's own definition, exact-verified, not banding errors. The
    // contract pinned here: (a) no planted twin is ever lost and twins
    // sit at hamming 0; (b) the verify step makes an over-threshold
    // emission impossible; (c) no two DISTINCT fixture images are
    // hash-identical (a 0-distance non-twin would mean the fixture
    // formula collapsed).
    val sf01 = "/root/testdata/sf0.1"
    def ids(res: Int): Set[Long] = Tables(spark, sf01).documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 6 === res)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def check(rows: Array[(Long, Long, Long)], twins: Set[(Long, Long)], lane: String): Unit = {
      val byPair = rows.map(r => (r._1, r._2) -> r._3).toMap
      twins.foreach { p =>
        assert(byPair.get(p) === Some(0L), s"$lane lost twin $p (or not at hamming 0)")
      }
      rows.filterNot(r => twins((r._1, r._2))).foreach { r =>
        assert(r._3 >= 1L && r._3 <= 6L,
          s"$lane non-twin pair $r outside (0, 6] — verify or fixture broke")
      }
    }
    check(
      SparkEntry.queries("q_dedup_phash")(spark, sf01)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
      ids(3).map(id => (id, id + 2000000L)), "image")
    check(
      SparkEntry.queries("q_dedup_phash_video")(spark, sf01)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))),
      ids(0).map(id => (id, id + 3000000L)), "video")
    Bench.cleanup(spark)
  }
}
