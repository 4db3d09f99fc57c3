package graft

/** q_video_stats / q_video_filter behavioral contract.
  *
  * Part 1 (filter): the verdict must be exactly the first-failing-rule
  * fold over the stats the SAME row reports — an independent Scala
  * re-derivation, so a rule reorder or threshold drift in either the
  * query or its oracle shows up as a named failure before the hash gate
  * turns it into an opaque mismatch (AudioFilterSpec's shape). The
  * fixture must exercise every drop reason: the planted pathologies
  * (shorts, dark prefixes, bright suffixes, static scenes) all exist at
  * sf0.001 (12/17/5/6 clips by residue — verified at fixture-design
  * time and pinned here).
  *
  * Part 2 (stats): the engine's numbers come from walking DECODED frame
  * bytes at movi-chunk offsets; this spec recomputes them straight from
  * the pixel formula — no container, no codec — so a codec-walk bug
  * (shifted offset, skipped JUNK handling, stride error) diverges from
  * the formula-level truth as a per-clip named failure.
  */
class VideoFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("verdict == first-failing-rule over the row's own stats; every reason occurs") {
    val rows = SparkEntry.queries("q_video_filter")(spark, sf)
      .select("doc_id", "duration_ms", "mean_luma_q", "dark_ppm",
        "bright_ppm", "scene_changes", "verdict", "reason")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dur, dark, bright, sc) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      val expected =
        if (dur < 250) "too_short"
        else if (dark > 400000) "too_dark"
        else if (bright > 350000) "overexposed"
        else if (sc <= 1) "static"
        else ""
      assert(r.getString(7) === expected, s"doc ${r.getLong(0)}")
      assert(r.getString(6) === (if (expected.isEmpty) "keep" else "drop"),
        s"doc ${r.getLong(0)}: verdict/reason disagree")
    }
    val reasons = rows.map(_.getString(7)).toSet
    assert(reasons === Set("", "too_short", "too_dark", "overexposed", "static"),
      s"fixture must exercise keep + all four drop reasons, got $reasons")
  }

  test("decoded-frame stats match a formula-level recompute (no codec in the loop)") {
    val rows = SparkEntry.queries("q_video_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (16 + 4 * (id % 8)).toInt
      val h = (8 + id % 8).toInt
      val npx = w * h
      val fpsIn = (10 + (id % 3) * 5).toInt
      val nf = if (id % 7 == 3) 2 else (6 + id % 7).toInt
      val seg = if (id % 5 == 0) 1000 else (2 + id % 3).toInt
      val dpre = if (id % 8 == 6) nf * 2 / 3 else 1
      val bsuf =
        if (id % 11 == 7) math.max(nf / 2, 1)
        else if (id % 4 == 2) 1 else 0
      def px(f: Int, k: Int): Int =
        if (f < dpre) k % 25
        else if (f >= nf - bsuf) 230 + k % 26
        else (((f / seg) * 61L + id * 17L + (k * 7) % 97) % 200L + 28L).toInt
      val all = for (f <- 0 until nf; k <- 0 until npx) yield px(f, k)
      val deltas = (1 until nf).map { f =>
        (0 until npx).map(k => math.abs(px(f, k) - px(f - 1, k)).toLong).sum / npx
      }
      val mspf = 1000000 / fpsIn
      assert(r.getLong(1) === w.toLong && r.getLong(2) === h.toLong, s"doc $id geometry")
      assert(r.getLong(3) === 1000000L / mspf, s"doc $id fps")
      assert(r.getLong(4) === nf.toLong, s"doc $id n_frames")
      assert(r.getLong(5) === nf.toLong * mspf / 1000L, s"doc $id duration")
      assert(r.getLong(6) === nf.toLong * npx, s"doc $id n_px")
      assert(r.getLong(7) === all.map(_.toLong).sum / (nf.toLong * npx), s"doc $id mean_luma")
      assert(r.getLong(8) === all.count(_ < 32).toLong, s"doc $id n_dark")
      assert(r.getLong(9) === all.count(_ >= 224).toLong, s"doc $id n_bright")
      assert(r.getLong(10) === deltas.count(_ >= 8).toLong, s"doc $id scene_changes")
      assert(r.getLong(11) === (if (deltas.isEmpty) 0L else deltas.max), s"doc $id max_delta")
    }
  }
}
