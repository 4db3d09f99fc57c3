package graft

/** Edge coverage for the repeated-span removal pass
  * (`DedupQueries.substringScrub`) at a small window (w=3), where every
  * rewrite is hand-checkable: a shared span at the loser's doc START, at
  * its doc END, a WHOLE-DOC duplicate that scrubs to the empty string, an
  * untouched unique doc, and a doc shorter than the window (zero windows,
  * exercises the ANSI descending-sequence guard).
  *
  * Keep policy under test: per shared fingerprint the HIGHEST doc_id
  * keeps its occurrences; lower doc_ids lose the covered tokens.
  */
class SubstringScrubSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  test("span at start/end excised, whole-doc dup scrubs to empty, unique docs untouched") {
    val docs = Seq(
      (1L, "a b c x1 y1 z1"),        // shared "a b c" at loser's START
      (2L, "p2 q2 r2 a b c"),        // keeper of "a b c" (higher id)
      (3L, "m n o p"),               // whole-doc duplicate — loser
      (4L, "m n o p"),               // keeper
      (5L, "solo words only here"),  // no shared windows
      (6L, "k l m6 d e f"),          // shared "d e f" at loser's END
      (7L, "d e f n7 o7 p7"),        // keeper of "d e f"
      (8L, "tiny")                   // 1 token < w: zero windows
    ).toDF("doc_id", "text")

    val out = graft.queries.DedupQueries.substringScrub(docs, 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    assert(out(1L) === (("x1 y1 z1", 3L, 3L)))            // start span cut
    assert(out(2L) === (("p2 q2 r2 a b c", 0L, 6L)))      // keeper intact
    assert(out(3L) === (("", 4L, 0L)))                    // whole doc gone
    assert(out(4L) === (("m n o p", 0L, 4L)))             // keeper intact
    assert(out(5L) === (("solo words only here", 0L, 4L)))
    assert(out(6L) === (("k l m6", 3L, 3L)))              // end span cut
    assert(out(7L) === (("d e f n7 o7 p7", 0L, 6L)))      // keeper intact
    assert(out(8L) === (("tiny", 0L, 1L)))                // short doc passes
  }
}
