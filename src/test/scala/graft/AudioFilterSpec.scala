package graft

/** q_audio_filter behavioral contract: the verdict must be exactly the
  * first-failing-rule fold over the stats the SAME row reports — an
  * independent Scala re-derivation, so a rule reorder or threshold drift
  * in either the query or its oracle shows up as a named failure here
  * before the hash gate turns it into an opaque mismatch.
  */
class AudioFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("verdict == first-failing-rule over the row's own stats; both outcomes occur") {
    val rows = SparkEntry.queries("q_audio_filter")(spark, sf)
      .select("doc_id", "duration_ms", "rms_q", "clip_ppm", "sil_ppm", "verdict", "reason")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dur, rms, clip, sil) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val expected =
        if (dur < 10) "too_short"
        else if (clip > 20000) "clipped"
        else if (sil > 245000) "mostly_silence"
        else if (rms < 64) "low_level"
        else ""
      assert(r.getString(6) === expected, s"doc ${r.getLong(0)}")
      assert(r.getString(5) === (if (expected.isEmpty) "keep" else "drop"),
        s"doc ${r.getLong(0)}: verdict/reason disagree")
    }
    val verdicts = rows.map(_.getString(5)).toSet
    assert(verdicts === Set("keep", "drop"),
      s"fixture must exercise both outcomes, got $verdicts")
  }

  test("filter agrees row-for-row with q_audio_stats (shared decode, no drift)") {
    val stats = SparkEntry.queries("q_audio_stats")(spark, sf)
      .select("doc_id", "duration_ms", "rms_q").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val filt = SparkEntry.queries("q_audio_filter")(spark, sf)
      .select("doc_id", "duration_ms", "rms_q").collect()
    assert(filt.length === stats.size)
    filt.foreach { r =>
      assert(stats(r.getLong(0)) === ((r.getLong(1), r.getLong(2))),
        s"doc ${r.getLong(0)} stats drifted between the two lanes")
    }
  }
}
