package graft

/** q_image_stats / q_image_filter behavioral contract (the shape of
  * AudioFilterSpec/VideoFilterSpec, for the fourth modality):
  *
  * Part 1 (filter): the verdict must be exactly the first-failing-rule
  * fold over the stats the SAME row reports, and the fixture must
  * exercise keep plus all four drop reasons (21/6/8/16 planted images by
  * residue at sf0.001, verified at fixture-design time).
  *
  * Part 2 (stats): the engine's numbers come from walking DECODED padded
  * bottom-up BMP rows; this spec recomputes them straight from the pixel
  * formula — no container, no codec — so a stride/orientation/offset bug
  * in the BMP walk diverges as a per-image named failure. (The codec
  * itself is additionally cross-validated against the JDK's ImageIO BMP
  * reader in MediaCodecSpec — pixel-exact, not just geometry.)
  */
class ImageFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def classAndPixels(id: Long): (Int, Int, Seq[Int]) = {
    val w = (13 + id % 9).toInt
    val h = (6 + id % 6).toInt
    val cls =
      if (id % 8 == 5) 0 else if (id % 11 == 3) 1
      else if (id % 7 == 2) 2 else if (id % 9 == 7) 3 else 4
    val px = for (y <- 0 until h; x <- 0 until w) yield cls match {
      case 0 => (x * 3 + y * 5) % 28
      case 1 => 228 + (x + y) % 28
      case 2 => 120 + (x + y) % 9
      case 3 => 28 + (y * 199) / (h - 1)
      case _ => ((x * 7 + y * 11 + id * 13L) % 200L + 28L).toInt
    }
    (w, h, px)
  }

  test("verdict == first-failing-rule over the row's own stats; every reason occurs") {
    val rows = SparkEntry.queries("q_image_filter")(spark, sf)
      .select("doc_id", "mean_luma_q", "dark_ppm", "bright_ppm", "contrast",
        "grad_q", "verdict", "reason")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dark, bright, contrast, grad) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val expected =
        if (dark > 400000) "too_dark"
        else if (bright > 350000) "overexposed"
        else if (contrast < 64) "low_contrast"
        else if (grad < 4) "flat"
        else ""
      assert(r.getString(7) === expected, s"doc ${r.getLong(0)}")
      assert(r.getString(6) === (if (expected.isEmpty) "keep" else "drop"),
        s"doc ${r.getLong(0)}: verdict/reason disagree")
    }
    val reasons = rows.map(_.getString(7)).toSet
    assert(reasons === Set("", "too_dark", "overexposed", "low_contrast", "flat"),
      s"fixture must exercise keep + all four drop reasons, got $reasons")
  }

  test("decoded-pixel stats match a formula-level recompute (no codec in the loop)") {
    val rows = SparkEntry.queries("q_image_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = classAndPixels(id)
      val grads = for {
        y <- 0 until h; x <- 1 until w
      } yield math.abs(px(y * w + x) - px(y * w + x - 1)).toLong
      assert(r.getLong(1) === w.toLong && r.getLong(2) === h.toLong, s"doc $id geometry")
      assert(r.getLong(3) === w.toLong * h, s"doc $id n_px")
      assert(r.getLong(4) === px.map(_.toLong).sum / (w.toLong * h), s"doc $id mean")
      assert(r.getLong(5) === px.count(_ < 32).toLong, s"doc $id n_dark")
      assert(r.getLong(6) === px.count(_ >= 224).toLong, s"doc $id n_bright")
      assert(r.getLong(7) === (px.max - px.min).toLong, s"doc $id contrast")
      assert(r.getLong(8) === grads.sum / (w.toLong * h), s"doc $id grad_q")
    }
    Bench.cleanup(spark)
  }
}
