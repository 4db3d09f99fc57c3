package graft.queries

/** Byte-budget arithmetic for the iterate-to-ε loop family's driver-local
  * endgame switch (pagerankConverge, kmeansConvergeFrame).
  *
  * The loops collect their working set to the driver when it is small,
  * because a distributed round costs ~0.3-1 s of pure stage scheduling
  * (measured: the sf0.1 pagerank fixture is ~0.85 s/round × 15 rounds
  * distributed vs <0.2 s total for the whole local loop). The gate used
  * to be a bare ROW count (4M edges / 1M vectors), which was byte-unsafe:
  * the old edge collect materialized boxed (Long,Long,Long) tuples at
  * ~112 B each — ~450 MB at the gate, an OOM on a 4-8 GB production
  * driver that should have taken the (correct, available) distributed
  * path. The gate is now derived from an explicit byte budget and
  * per-row driver-heap cost:
  *
  *   budget 128 MB — 13% of even the default 1 GB
  *   `spark.driver.maxResultSize`, and small against any plausible
  *   driver heap (a driver already buffers task results and broadcast
  *   blocks of this order).
  *
  * Per-row cost, JDK-17 compressed-oops arithmetic:
  *   - edge row, collected as `Dataset[(Long, Long)]`: Tuple2 is
  *     @specialized on Long, so each element is a Tuple2$mcJJ$sp —
  *     16 B header + 2×8 B unboxed fields = 32 B — plus the array slot
  *     ref (8 B) and the loop's index-compressed side arrays (two Int +
  *     one Long array = 16 B/edge); call it 64 B with transient decode
  *     headroom. 128 MB / 64 B = 2 097 152 edges (~75 MB real for the
  *     sf0.1 fixture's 1.18M edges — measured collect 0.23 s warm).
  *     (The old row-count gate's danger came from the UNspecialized
  *     Tuple3 shape; the local path now counts degrees on the driver,
  *     which both drops the third column and removes a distributed
  *     groupBy+join from the prep.)
  *   - vector row, collected as Row(vec_id, Seq[Long] of 64): long[64]
  *     payload 528 B + WrappedArray and Row shells + the immediate copy
  *     into Array[Long] ≈ 640 B. 128 MB / 640 B = 209 715 vectors.
  *
  * Both gates keep worst-case collected bytes ~10× below the old row
  * gates' worst case while leaving the benchmark fixtures (sf0.1: 1.18M
  * edges, ~15k vectors) on the fast local path. The bit-identity specs
  * (PagerankConvergeSpec, KmeansConvergeSpec) force BOTH paths on one
  * input regardless of the gate value, so correctness never depends on
  * which side of the boundary a dataset lands.
  */
object DriverLocalGate {
  /** Driver-heap budget for a collected loop working set. */
  val byteBudget: Long = 128L << 20

  /** Per-collected-edge driver-heap bytes: specialized (Long,Long)
    * Tuple2 32 B + array ref 8 B + index-compressed loop arrays
    * 16 B + decode headroom (see object doc). */
  val edgeRowBytes: Long = 64L

  /** Per-collected-vector driver-heap bytes (long[64] payload + Row/
    * WrappedArray shells + the Array[Long] copy; see object doc). */
  val vectorRowBytes: Long = 640L

  /** Max edges the pagerank local path may collect: 2 097 152. */
  val maxLocalEdges: Long = byteBudget / edgeRowBytes

  /** Max vectors the k-means local path may collect: 209 715. */
  val maxLocalVectors: Long = byteBudget / vectorRowBytes
}
