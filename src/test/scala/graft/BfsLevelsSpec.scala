package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** BFS levels (q_bfs_levels): exact hop distances on hand-solvable
  * graphs, driver-local vs distributed path identity, and the oracle's
  * unroll constant re-measured against the sf0.01 fixture (the
  * (retired) measured-round-constant discipline — a fixture regeneration that stretches
  * the graph fails HERE with a named message, not at the driver gate as
  * an opaque hash mismatch).
  */
class BfsLevelsSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  // chain 1-2-3-4 plus a star 1-{10,11,12}, undirected (both directions)
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (1L, 10L), (1L, 11L), (1L, 12L))
    .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    .toDF("src", "dst")

  private def collectLevels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("exact hop distances on a chain + star, rounds = eccentricity") {
    val (lv, rounds) = AnalyticsQueries.bfsLevels(spark, edges, 1L, 64)
    assert(rounds === 3)
    assert(collectLevels(lv) === Map(
      1L -> 0L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("driver-local and distributed paths are identical") {
    val (lvLocal, rLocal) = AnalyticsQueries.bfsLevels(spark, edges, 1L, 64)
    val (lvDist, rDist) =
      AnalyticsQueries.bfsLevels(spark, edges, 1L, 64, localThreshold = 0L)
    assert(rLocal === rDist)
    assert(collectLevels(lvLocal) === collectLevels(lvDist))
    Bench.cleanup(spark)
  }

  test("maxRounds truncation is identical on both paths") {
    // the chain's last node sits at lvl 3; a 2-round cap must omit it the
    // SAME way locally and distributed (the local twin honors maxRounds)
    val (lvLocal, rLocal) = AnalyticsQueries.bfsLevels(spark, edges, 1L, 2)
    val (lvDist, rDist) =
      AnalyticsQueries.bfsLevels(spark, edges, 1L, 2, localThreshold = 0L)
    assert(rLocal === 2 && rDist === 2)
    val local = collectLevels(lvLocal)
    assert(local === collectLevels(lvDist))
    assert(!local.contains(4L), "node beyond the round cap must be unexplored")
    Bench.cleanup(spark)
  }

  test("unreachable nodes never appear; a lone root yields zero rounds") {
    // two components: {1,2} and {5,6}; BFS from 1 must not reach 5/6
    val disc = Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L)).toDF("src", "dst")
    val (lv, rounds) = AnalyticsQueries.bfsLevels(spark, disc, 1L, 64)
    assert(rounds === 1)
    assert(collectLevels(lv) === Map(1L -> 0L, 2L -> 1L))
    // root with no out-edges at all
    val (lv0, r0) = AnalyticsQueries.bfsLevels(spark, disc, 99L, 64)
    assert(r0 === 0)
    assert(collectLevels(lv0) === Map(99L -> 0L))
  }

  test("oracle round-count constant matches the sf0.01 fixture") {
    val sp = Tables(spark, "/root/testdata/sf0.01").lineitem
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
    val ed = sp
      .select(explode(array(
        struct(col("s").as("src"), (col("p") + 1000000L).as("dst")),
        struct((col("p") + 1000000L).as("src"), col("s").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val root = sp.agg(min(col("s"))).head.getLong(0)
    val (_, rounds) = AnalyticsQueries.bfsLevels(spark, ed, root, 64)
    assert(rounds === AnalyticsQueries.bfsRounds,
      s"fixture eccentricity moved: update AnalyticsQueries.bfsRounds to $rounds")
    Bench.cleanup(spark)
  }
}
