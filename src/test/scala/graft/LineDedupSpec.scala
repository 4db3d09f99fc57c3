package graft

/** Edge coverage for the C4-style line-level dedup
  * (`DedupQueries.lineDedup`) at a small segment width (w=2), where every
  * rewrite is hand-checkable: a cross-doc repeated line, a whole-doc
  * repeat that scrubs to the empty string, an INTRA-doc repeat (keep-first
  * applies within a document too), a short tail segment (doc length not a
  * multiple of w), a doc shorter than w (single short segment), and the
  * short-tail cross-doc collision that also occurs naturally at corpus
  * scale.
  *
  * Keep policy under test: per distinct line text the lexicographically
  * smallest (doc_id, position) occurrence survives; every later
  * occurrence is removed and docs are reassembled from survivors in
  * order.
  */
class LineDedupSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  test("keep-first line dedup: cross-doc, intra-doc, whole-doc, short tails") {
    val docs = Seq(
      (1L, "a b c d"),   // both lines first occurrences — untouched
      (2L, "a b x y"),   // "a b" repeats doc 1 line 0 — only "x y" survives
      (3L, "c d"),       // whole doc repeats doc 1 line 1 — scrubs to empty
      (4L, "p q r"),     // short tail "r" (len 3, w=2) — kept
      (5L, "z"),         // doc shorter than w: one short segment, kept
      (6L, "r"),         // collides with doc 4's short tail — removed
      (7L, "e f e f")    // intra-doc repeat: second "e f" removed
    ).toDF("doc_id", "text")

    val out = graft.queries.DedupQueries.lineDedup(docs, 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(out(1L) === ((2L, 2L, 0L, "a b c d")))
    assert(out(2L) === ((2L, 1L, 1L, "x y")))
    assert(out(3L) === ((1L, 0L, 1L, "")))
    assert(out(4L) === ((2L, 2L, 0L, "p q r")))
    assert(out(5L) === ((1L, 1L, 0L, "z")))
    assert(out(6L) === ((1L, 0L, 1L, "")))
    assert(out(7L) === ((2L, 1L, 1L, "e f")))
  }
}
