package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef.q

/** Analytics operators beyond the rollup/cube/window basics (SURVEY.md
  * §2.1 ★): arbitrary grouping sets, ntile/distribution window functions,
  * value histograms, cohort retention, and per-key anomaly scoring — the
  * event-analytics shapes the reference's consumers compute downstream of
  * the metrics it ships (e.g. Datadog dashboards over the shipped series).
  *
  * Scale notes are per query; every plan is one-or-two hash-aggregate
  * shuffles with bounded output — no global sorts, no driver collects.
  */
object AnalyticsQueries {

  /** Round count the q_pagerank_converge loop reaches at sf0.01 with
    * damping 0.5 and max-|Δpr| < 1e-3 — the oracle unrolls exactly this
    * many CTE stages and emits it as the n_rounds literal, so a loop that
    * converges early/late hash-mismatches. Deterministic because the
    * convergence metric is a MAX over per-node deltas whose ranks are
    * ordered folds (fixture + seed pinned by the driver). Measured 15 at
    * sf0.001, sf0.01 AND sf0.1 alike — the count is set by the damping
    * rate, not the data scale, so fixture regeneration is low-risk. */
  private val prConvergeRounds = 15

  /** DuckDB oracle for q_pagerank_converge: r0 = all-ones (1e9 nano
    * units), then `prConvergeRounds` unrolled fixed-point damped-update
    * stages. Integer arithmetic end to end — contributions are floor
    * divisions and the per-node Σ is a BIGINT sum, which COMMUTES
    * exactly, so no ordering clause is needed anywhere for cross-engine
    * parity (the float version needed an ORDER BY src fold per stage;
    * fixed point is both the determinism fix and the scale fix, because
    * commutative sums get map-side partial aggregation back). */
  private def pagerankConvergeSql: String = {
    val stages = (1 to prConvergeRounds).map { i =>
      s"""r$i AS (
         |  SELECT n.id, 500000000 + coalesce(x.sm, 0) // 2 AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.pr // e.d)::BIGINT AS sm
         |    FROM e JOIN r${i - 1} r ON e.src = r.id GROUP BY e.dst) x USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |ed AS (
       |  SELECT s AS src, p + 1000000 AS dst FROM sp
       |  UNION ALL SELECT p + 1000000, s FROM sp),
       |deg AS (SELECT src, count(*) AS d FROM ed GROUP BY 1),
       |e AS (SELECT ed.src, ed.dst, deg.d FROM ed JOIN deg USING (src)),
       |nodes AS (SELECT DISTINCT src AS id FROM ed),
       |r0 AS (SELECT id, 1000000000::BIGINT AS pr FROM nodes),
       |$stages
       |SELECT id, (pr // 1000) / 1000000.0 AS pr,
       |  ${prConvergeRounds}::BIGINT AS n_rounds
       |FROM r$prConvergeRounds ORDER BY pr DESC, id LIMIT 25""".stripMargin
  }

  /** Damping-0.5 PageRank iterated to convergence over a directed edge
    * frame (src, dst), in FIXED-POINT nano units: per round each node's
    * out-rank floor-divides across its edges (pr/deg, integer) and every
    * node re-scores to 0.5e9 + Σinbound/2. Integer sums commute exactly,
    * so the result is bit-deterministic across engines, partitionings,
    * and merge orders WITHOUT ordered folds — and the per-round agg is a
    * plain codegen'd sum with map-side partials (the float-determinism
    * workaround, sort_array + fold, shipped every contribution row to
    * the reduce side and measured 7× slower at sf0.1). Stops when max
    * per-node |Δpr| < epsNano (an order-independent scalar agg — ONE
    * small action per round, never a rank collect) or at maxRounds.
    * Ranks are localCheckpoint'd each round to truncate lineage, the
    * CC-lane pattern (DedupQueries.connectedComponents). Returns
    * (ranks(id, pr nano), rounds). Public so PagerankConvergeSpec can
    * pin ranks + round count on a hand-solvable graph. */
  def pagerankConverge(s: SparkSession, edges: DataFrame,
      epsNano: Long, maxRounds: Int,
      localThreshold: Long = DriverLocalGate.maxLocalEdges): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Endgame switch, the CC-lane pattern (connectedComponents): a loop
    // of Spark jobs costs ~1 s/round in stage scheduling alone, so a
    // graph whose edges fit comfortably on the driver iterates LOCALLY —
    // bit-identical by construction, because every operation is a
    // commutative integer op (sums have no order, degree counts are
    // exact) — and the distributed path takes over beyond the threshold,
    // where per-round shuffle work dwarfs scheduling. The default gate is
    // BYTE-derived, not a bare row count: 128 MB budget / 64 B per
    // collected specialized-(Long,Long) edge = 2M edges (DriverLocalGate's
    // driver-heap arithmetic), so the local path can never ask a small
    // driver for a gigabyte-scale collect. PagerankConvergeSpec pins path
    // equivalence
    // by running both on one graph. The gate count runs against the
    // persisted edge cache, so the local path's follow-up collect is a
    // memory-local read, not a recompute — and the degree count folds
    // into the driver loop (no deg shuffle + join at all on this path).
    val ed = edges.persist(MEMORY_AND_DISK)
    if (ed.count() <= localThreshold) {
      import s.implicits._
      val rows = ed.select(col("src"), col("dst")).as[(Long, Long)].collect()
      ed.unpersist(false)
      return pagerankLocal(s, rows, epsNano, maxRounds)
    }
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val e = ed.join(deg, "src")
      .select(col("src"), col("dst"), col("d"))
      .persist(MEMORY_AND_DISK)
    var ranks = e.select(col("src").as("id")).distinct()
      .unionByName(e.select(col("dst").as("id")).distinct())
      .distinct()
      .select(col("id"), lit(1000000000L).as("pr"))
      .localCheckpoint(true)
    // the ranks init action just materialized e's cache; the raw edge
    // cache behind it is dead weight for the rest of the loop (a rare
    // e-block eviction recomputes from the scan instead — cheaper than
    // doubling the cached edge footprint across every round)
    ed.unpersist(false)
    // Block-manager hygiene (the r10 advisor's leak): each round's eager
    // localCheckpoint caches an O(nodes) RDD; without explicit release the
    // loop holds rounds × nodes blocks until the session GCs them. Track
    // the checkpointed RDD behind each round's frame and unpersist it as
    // soon as the NEXT round has materialized (the final round's blocks
    // back the returned frame and must stay).
    var prevCkpt = graft.plans.Checkpoints.checkpointedRdd(ranks)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val summed = e
        .join(ranks.select(col("id").as("src"), col("pr")), "src")
        // `div`, not `/`: Spark's / on longs is double division; div is
        // the integral floor the oracle's // mirrors (operands are ≥ 0)
        .select(col("dst").as("id"), expr("pr div d").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("sm"))
      val next = ranks.select(col("id"), col("pr").as("pr_old"))
        .join(summed, Seq("id"), "left")
        .select(col("id"),
          (lit(500000000L) + expr("coalesce(sm, 0L) div 2")).as("pr"),
          col("pr_old"))
        .localCheckpoint(true)
      val delta = next
        .agg(max(abs(col("pr") - col("pr_old")))).head.getLong(0)
      prevCkpt.foreach(_.unpersist(false))
      prevCkpt = graft.plans.Checkpoints.checkpointedRdd(next)
      ranks = next.select(col("id"), col("pr"))
      rounds += 1
      converged = delta < epsNano
    }
    // the returned ranks are checkpoint-backed (lineage truncated), so
    // the degree-joined edge cache can be released too (ed went after
    // the ranks init)
    e.unpersist(false)
    (ranks, rounds)
  }

  /** Driver-local twin of the distributed loop: same nano-unit integer
    * update, same convergence rule, over collected (src, dst) edge
    * arrays — index-compressed node ids, two long arrays per round. The
    * per-edge out-degree is counted HERE (an exact integer count, so
    * bit-identical to the distributed deg groupBy + join it replaces —
    * and two distributed stages cheaper). Returns a distributed frame so
    * downstream plans are path-agnostic. */
  private def pagerankLocal(s: SparkSession, rows: Array[(Long, Long)],
      epsNano: Long, maxRounds: Int): (DataFrame, Int) = {
    import s.implicits._
    val ids = (rows.iterator.map(_._1) ++ rows.iterator.map(_._2))
      .toArray.distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val srcI = rows.map(r => idx(r._1))
    val dstI = rows.map(r => idx(r._2))
    val degI = new Array[Long](ids.length)
    srcI.foreach(i => degI(i) += 1)
    val dArr = srcI.map(i => degI(i))
    var pr = Array.fill(ids.length)(1000000000L)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val sm = new Array[Long](ids.length)
      var i = 0
      while (i < srcI.length) {
        sm(dstI(i)) += pr(srcI(i)) / dArr(i)
        i += 1
      }
      var delta = 0L
      val next = new Array[Long](ids.length)
      var j = 0
      while (j < next.length) {
        next(j) = 500000000L + sm(j) / 2
        val d0 = math.abs(next(j) - pr(j))
        if (d0 > delta) delta = d0
        j += 1
      }
      pr = next
      rounds += 1
      converged = delta < epsNano
    }
    (ids.indices.map(i => (ids(i), pr(i))).toDF("id", "pr"), rounds)
  }

  /** Round count q_bfs_levels reaches from the min-supplier source: the
    * source's eccentricity in the supplier↔part graph. Measured 3 at
    * sf0.001, sf0.01 and sf0.1 — the bipartite graph densifies with
    * scale, so the count is scale-invariant (pagerank's situation, not
    * k-means'). BfsLevelsSpec re-measures it on the sf0.01 fixture so a
    * regeneration that stretches the graph fails with a named message
    * instead of an opaque hash mismatch. */
  private[graft] val bfsRounds = 3

  /** DuckDB oracle for q_bfs_levels: `bfsRounds` unrolled frontier
    * expansions, each keeping min(lvl) per node — min over a UNION ALL
    * commutes, so no ordering clause is needed for parity. */
  private def bfsLevelsSql: String = {
    val stages = (1 to bfsRounds).map { i =>
      s"""v$i AS (
         |  SELECT id, min(lvl)::BIGINT AS lvl FROM (
         |    SELECT id, lvl FROM v${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, ${i}::BIGINT AS lvl
         |    FROM e JOIN v${i - 1} v ON e.src = v.id
         |  ) GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |e AS (SELECT s AS src, p + 1000000 AS dst FROM sp
       |      UNION ALL SELECT p + 1000000, s FROM sp),
       |v0 AS (SELECT (SELECT min(s) FROM sp)::BIGINT AS id, 0::BIGINT AS lvl),
       |$stages
       |SELECT lvl AS level, count(*)::BIGINT AS n_nodes,
       |  ${bfsRounds}::BIGINT AS n_rounds,
       |  (SELECT count(DISTINCT src) FROM e)::BIGINT
       |    - (SELECT count(*) FROM v$bfsRounds)::BIGINT AS n_unreached
       |FROM v$bfsRounds GROUP BY lvl""".stripMargin
  }

  /** Single-source BFS over a directed edge frame (src, dst): returns
    * (levels(id, lvl), rounds) where lvl is the exact hop distance from
    * `root` and rounds its eccentricity. Levels are unique per node —
    * no expansion order can change them — so local and distributed paths
    * are identical by construction. Per round the distributed path runs
    * one keyed join (frontier → neighbors), a distinct, and an anti join
    * against the visited set, all O(frontier ∪ visited); every round's
    * frames are eagerly localCheckpoint'd and the round-before-last's
    * blocks released (the pagerank-loop hygiene). Below
    * `localThreshold` edges (DriverLocalGate's byte budget) the loop
    * collects once and runs driver-local. Public so BfsLevelsSpec can
    * pin both paths on a hand-built graph. */
  def bfsLevels(s: SparkSession, edges: DataFrame, root: Long, maxRounds: Int,
      localThreshold: Long = DriverLocalGate.maxLocalEdges): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    import s.implicits._
    val ed = edges.persist(MEMORY_AND_DISK)
    if (ed.count() <= localThreshold) {
      val rows = ed.select(col("src"), col("dst")).as[(Long, Long)].collect()
      ed.unpersist(false)
      return bfsLocal(s, rows, root, maxRounds)
    }
    var visited = Seq((root, 0L)).toDF("id", "lvl").localCheckpoint(true)
    var frontier = visited
    var prevVisitedCkpt = graft.plans.Checkpoints.checkpointedRdd(visited)
    var prevFrontierCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = ed.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .select(col("id"), lit((rounds + 1).toLong).as("lvl"))
        .localCheckpoint(true)
      // the previous frontier's blocks fed the join above; with `next`
      // materialized they are dead (visited holds its own copy)
      prevFrontierCkpt.foreach(_.unpersist(false))
      prevFrontierCkpt = graft.plans.Checkpoints.checkpointedRdd(next)
      if (next.isEmpty) done = true
      else {
        rounds += 1
        val grown = visited.unionByName(next).localCheckpoint(true)
        prevVisitedCkpt.foreach(_.unpersist(false))
        prevVisitedCkpt = graft.plans.Checkpoints.checkpointedRdd(grown)
        visited = grown
        frontier = next
      }
    }
    // the final frontier's blocks are dead on every exit path: its data
    // is already copied into the returned visited frame (or the frontier
    // was empty) — release it, the pagerank-loop discipline
    prevFrontierCkpt.foreach(_.unpersist(false))
    ed.unpersist(false)
    (visited, rounds)
  }

  /** Driver-local BFS twin: adjacency over index-compressed ids, a
    * frontier queue, exact integer levels — identical to the distributed
    * loop (same `maxRounds` truncation included) because levels are
    * order-independent. */
  private def bfsLocal(s: SparkSession, rows: Array[(Long, Long)],
      root: Long, maxRounds: Int): (DataFrame, Int) = {
    import s.implicits._
    val adj = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val lvl = scala.collection.mutable.LongMap[Long](root -> 0L)
    var frontier = Array(root)
    var rounds = 0
    while (frontier.nonEmpty && rounds < maxRounds) {
      val next = frontier.flatMap(adj.getOrElse(_, Array.empty[Long]))
        .distinct.filterNot(lvl.contains)
      if (next.nonEmpty) {
        rounds += 1
        next.foreach(n => lvl(n) = rounds.toLong)
      }
      frontier = next
    }
    (lvl.toSeq.toDF("id", "lvl"), rounds)
  }

  val defs: Seq[QueryDef] = Seq(

    // Arbitrary GROUPING SETS — the grouping-set shape rollup/cube can't
    // express (disjoint single-column slices + grand total, no pair
    // slice). Catalyst plans one Expand (3× row fan-out, bounded by the
    // set count) + one hash agg; shuffle stays O(groups) at any scale.
    q(
      "q_grouping_sets",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus")
        )
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    },

    // ntile + distribution window functions, partitioned by priority class
    // so each window is a per-group sort (shuffle by o_orderpriority, sort
    // within partition) — NOT a global single-partition ORDER BY, which
    // would serialize 100 TB through one task. Global quantiles at scale
    // are q_agg_percentile's job (approx_percentile, mergeable sketches).
    q(
      "q_window_ntile",
      // floor-first rounding, not round(): percent_rank/cume_dist are
      // ratios of small integers ((rank-1)/(n-1), rank/n), the
      // exact-decimal-half class where Spark's and DuckDB's round()
      // disagree (the q_quality_score sf0.1 lesson, round 13)
      s"""SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER w AS quartile,
        |  ${CrossRound.sql("percent_rank() OVER w", 6)} AS pct_rank,
        |  ${CrossRound.sql("cume_dist() OVER w", 6)} AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir).orders.select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        CrossRound.col(percent_rank().over(w), 6).as("pct_rank"),
        CrossRound.col(cume_dist().over(w), 6).as("cdist")
      )
    },

    // Fixed-bound value histogram via the native width_bucket expression
    // (codegen'd): bucket 0 = below range, 13 = at/above range, 1..12 the
    // uniform bins. One partial-aggregated shuffle of O(buckets) rows —
    // the 100 TB histogram is as cheap as the 100 MB one. The oracle
    // spells width_bucket's clamp semantics with CASE (DuckDB 1.0 lacks
    // the function).
    q(
      "q_histogram",
      """SELECT (CASE WHEN o_totalprice < 0 THEN 0
        |        WHEN o_totalprice >= 600000 THEN 13
        |        ELSE 1 + floor(o_totalprice / 50000) END)::BIGINT AS bucket,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(width_bucket(col("o_totalprice"), lit(0d), lit(600000d), lit(12L))
          .cast("long").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi")
        )
    },

    // ★ Equi-DEPTH binning — q_histogram's feature-engineering
    // counterpart (equal counts per bin, not equal widths), done the way
    // that scales: ONE exact-percentile agg produces the 9 decile
    // boundaries (both engines linear-interpolate over the same sorted
    // data, so the raw doubles agree bit-for-bit — q_agg_percentile's
    // precedent), the 1-row boundary array broadcasts, and bin
    // assignment is a per-row array filter inside codegen. The naive
    // formulation — ntile(10) OVER (ORDER BY value) — plans a GLOBAL
    // sort of the table through one task and is exactly what this query
    // exists to avoid; at 100 TB the boundary agg swaps for
    // approx_percentile (same 1-row broadcast, same assignment) and
    // nothing else changes. Ties land in the lower bin on both engines
    // (strict < against the boundary).
    q(
      "q_bin_equidepth",
      """WITH b AS (
        |  SELECT quantile_cont(o_totalprice::DOUBLE,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        |  FROM orders)
        |SELECT bin, count(*) AS n,
        |  round(min(v), 2) AS lo, round(max(v), 2) AS hi
        |FROM (
        |  SELECT o_totalprice AS v,
        |    1 + len(list_filter(b.bs, x -> x < o_totalprice)) AS bin
        |  FROM orders, b)
        |GROUP BY bin""".stripMargin
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val bnds = t.orders.agg(
        percentile(col("o_totalprice"),
          array((1 to 9).map(i => lit(i / 10.0)): _*)).as("bs"))
      t.orders.crossJoin(broadcast(bnds))
        .select(col("o_totalprice").as("v"),
          (lit(1) + size(filter(col("bs"), x => x < col("o_totalprice"))))
            .cast("long").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("v")), 2).as("lo"), round(max(col("v")), 2).as("hi"))
    },

    // Weekly cohort retention over events: a user's cohort is their first
    // active ISO week; active_users counts distinct users per (cohort,
    // week offset). ONE shuffle by user builds cohort + the user's
    // distinct-week set (collect_set bounded by weeks-in-corpus, not
    // events); the explode emits one row per user-week, so the final
    // count is a plain count(*), never a countDistinct re-shuffle.
    q(
      "q_retention_cohort",
      """WITH ue AS (
        |  SELECT user_id, floor(epoch(date_trunc('week', ts)))::BIGINT AS wk FROM events
        |), per_user AS (
        |  SELECT user_id, min(wk) AS cohort_wk, list_distinct(list(wk)) AS wks
        |  FROM ue GROUP BY user_id
        |)
        |SELECT cohort_wk, ((wk - cohort_wk) / 604800)::BIGINT AS week_offset,
        |  count(*) AS active_users
        |FROM (SELECT user_id, cohort_wk, unnest(wks) AS wk FROM per_user)
        |GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val perUser = Tables(s, dir).events
        // events.ts is parquet TIMESTAMP(NANOS) → epoch-nano BIGINT in Spark
        .select(col("user_id"),
          unix_timestamp(date_trunc("week", timestamp_micros(expr("ts div 1000")))).as("wk"))
        .groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"), collect_set(col("wk")).as("wks"))
      perUser
        .select(col("cohort_wk"), explode(col("wks")).as("wk"))
        .groupBy(col("cohort_wk"),
          ((col("wk") - col("cohort_wk")) / 604800).cast("long").as("week_offset"))
        .agg(count(lit(1)).as("active_users"))
    },

    // Per-key anomaly scoring: daily event counts z-scored against the
    // key's own mean/stddev (population — defined even for 1-day keys).
    // Plan: one hash agg to daily grain, then a window partitioned by
    // event_type — partitions are bounded by days-per-key, so no task
    // ever sees more than one key's daily series. The 100 TB version
    // shuffles O(keys × days) pre-aggregated rows, not raw events.
    q(
      "q_anomaly_zscore",
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
        |  round((n - avg(n) OVER w) / nullif(stddev_pop(n) OVER w, 0), 4) AS z
        |FROM daily WINDOW w AS (PARTITION BY event_type)""".stripMargin
    ) { (s, dir) =>
      val daily = Tables(s, dir).events
        // events.ts is parquet TIMESTAMP(NANOS) → epoch-nano BIGINT in Spark
        .groupBy(col("event_type"),
          date_trunc("day", timestamp_micros(expr("ts div 1000"))).as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
      daily.select(
        col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"),
        round((col("n") - avg(col("n")).over(w)) /
          when(stddev_pop(col("n")).over(w) === 0d, lit(null))
            .otherwise(stddev_pop(col("n")).over(w)), 4).as("z")
      )
    },

    // Bivariate statistical aggregates — correlation, sample/population
    // covariance, and the least-squares fit (regr_slope/intercept), all
    // single-pass mergeable co-moment aggregates: the shuffle carries one
    // co-moment tuple per (group, partition), so the 100 TB regression
    // costs the same shuffle as a count. Rounded because partial-merge
    // order differs between engines at ~1e-12 relative.
    q(
      "q_agg_corr",
      """SELECT l_returnflag,
        |  round(corr(l_extendedprice, l_quantity), 5) AS r,
        |  round(covar_samp(l_extendedprice, l_quantity), 3) AS cov_s,
        |  round(covar_pop(l_extendedprice, l_quantity), 3) AS cov_p,
        |  round(regr_slope(l_extendedprice, l_quantity), 5) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 3) AS icept,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_extendedprice"), col("l_quantity")), 5).as("r"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 3).as("cov_s"),
          round(covar_pop(col("l_extendedprice"), col("l_quantity")), 3).as("cov_p"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 5).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 3).as("icept"),
          count(lit(1)).as("n")
        )
    },

    // Ordered-set string aggregation (SQL:2016 LISTAGG ... WITHIN GROUP)
    // over a broadcast dim join — deterministic because the within-group
    // order is total. Output is O(groups); safe at any fact scale when
    // the per-group member list is bounded (here: nations per region).
    q(
      "q_agg_listagg",
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*)::BIGINT AS n
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin
    ) { (s, dir) =>
      val t = Tables(s, dir)
      t.nation
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
          count(lit(1)).as("n")
        )
    },

    // RANGE window frame — a value-based sliding window (trailing 30 days
    // per customer), the frame shape q_window_frame's ROWS frame can't
    // express: ties on the order value share one frame, so the result is
    // deterministic under any intra-key row order. Shuffle by customer,
    // sort within partition — never a global sort.
    q(
      "q_window_range_frame",
      """SELECT o_orderkey, o_custkey,
        |  floor(epoch(o_orderdate))::BIGINT AS od,
        |  count(*) OVER w AS n_30d,
        |  round(sum(o_totalprice) OVER w, 2) AS spend_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY floor(epoch(o_orderdate))::BIGINT
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""".stripMargin
    ) { (s, dir) =>
      val od = unix_timestamp(col("o_orderdate").cast("timestamp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("od"))
        .rangeBetween(-2592000L, 0L)
      Tables(s, dir).orders
        .withColumn("od", od)
        .select(
          col("o_orderkey"), col("o_custkey"), col("od"),
          count(lit(1)).over(w).as("n_30d"),
          round(sum(col("o_totalprice")).over(w), 2).as("spend_30d")
        )
    },

    // Map construction + access functions (DuckDB: map literal, [k][1]
    // scalar extraction, cardinality, map_keys). Per-row expressions,
    // zero shuffle; insertion order of literal maps is preserved by both
    // engines, so keys_csv is deterministic.
    q(
      "q_map_funcs",
      """SELECT doc_id,
        |  m['lang'][1] AS m_lang,
        |  cardinality(m)::INT AS m_size,
        |  array_to_string(map_keys(m), ',') AS keys_csv
        |FROM (SELECT doc_id,
        |        map(['lang','source'], [lang, source]) AS m
        |      FROM documents)""".stripMargin
    ) { (s, dir) =>
      val m = map(lit("lang"), col("lang"), lit("source"), col("source"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        element_at(m, "lang").as("m_lang"),
        size(m).cast("int").as("m_size"),
        concat_ws(",", map_keys(m)).as("keys_csv")
      )
    },

    // UNPIVOT (melt) — the inverse of q_pivot: wide measure columns to
    // (measure, value) rows. Catalyst plans an Expand over the aggregated
    // frame, so the row fan-out is O(groups × measures), not O(input).
    q(
      "q_unpivot",
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS qty,
        |    round(sum(l_extendedprice), 2) AS price,
        |    round(sum(l_discount), 2) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, val
        |FROM wide UNPIVOT (val FOR measure IN (qty, price, disc))""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("price"),
          round(sum(col("l_discount")), 2).as("disc")
        )
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("price"), col("disc")),
          "measure", "val")
    },

    // ★ SCD2 merge — slowly-changing-dimension versioning, the batch
    // upsert shape behind every dimension table a warehouse maintains:
    // collapse each user's event stream into consecutive-run versions
    // (gaps-and-islands: change flag via lag, running sum numbers the
    // island) with [valid_from, valid_to) intervals and an is_current
    // flag. Every window is partitioned by user_id — the whole query is
    // one shuffle on the natural key and scales embarrassingly; the
    // second (per-version) window reuses the same partitioning so AQE
    // plans no extra exchange.
    q(
      "q_scd2_merge",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |marked AS (
        |  SELECT user_id, event_type, ts_us, event_id,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |ver AS (
        |  SELECT user_id, event_type, ts_us,
        |    (sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                    ROWS UNBOUNDED PRECEDING))::BIGINT AS version_no
        |  FROM marked),
        |v AS (
        |  SELECT user_id, version_no, event_type,
        |    min(ts_us) AS valid_from_us, count(*) AS n_events
        |  FROM ver GROUP BY 1, 2, 3)
        |SELECT user_id, version_no, event_type, valid_from_us,
        |  lead(valid_from_us) OVER wv AS valid_to_us,
        |  (lead(valid_from_us) OVER wv IS NULL) AS is_current, n_events
        |FROM v WINDOW wv AS (PARTITION BY user_id ORDER BY version_no)""".stripMargin
    ) { (s, dir) =>
      val wRow = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val wVer = Window.partitionBy(col("user_id")).orderBy(col("version_no"))
      val e = Tables(s, dir).events
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts_us"), col("event_id"))
      e.withColumn("chg",
          when(not(lag(col("event_type"), 1).over(wRow) <=> col("event_type")), 1)
            .otherwise(0))
        .withColumn("version_no",
          sum(col("chg")).over(wRow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("version_no"), col("event_type"))
        .agg(min(col("ts_us")).as("valid_from_us"), count(lit(1)).as("n_events"))
        .select(
          col("user_id"), col("version_no"), col("event_type"), col("valid_from_us"),
          lead(col("valid_from_us"), 1).over(wVer).as("valid_to_us"),
          lead(col("valid_from_us"), 1).over(wVer).isNull.as("is_current"),
          col("n_events"))
    },

    // ★ Table profiling — the "analyze my table" data-quality pass every
    // ingest pipeline runs first: per-column row count, null count,
    // distinct count, min/max, all in ONE scan. The single wide agg
    // (multi-column distinct → one Expand) is exploded into one row per
    // column afterwards, so adding columns widens the agg instead of
    // adding scans (plan guard pins scan count = 1). At 100 TB the
    // distinct counts switch to approx_count_distinct — same plan minus
    // the Expand; the exact version here is the oracle-checkable shape.
    q(
      "q_profile_table",
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
        |    floor(min(l_quantity) * 1e6) / 1e6 AS min_q,
        |    floor(max(l_quantity) * 1e6) / 1e6 AS max_q,
        |    count(l_extendedprice) AS nn_p, count(DISTINCT l_extendedprice) AS nd_p,
        |    floor(min(l_extendedprice) * 1e6) / 1e6 AS min_p,
        |    floor(max(l_extendedprice) * 1e6) / 1e6 AS max_p,
        |    count(l_returnflag) AS nn_f, count(DISTINCT l_returnflag) AS nd_f,
        |    min(l_returnflag) AS sm_f, max(l_returnflag) AS sx_f
        |  FROM lineitem)
        |SELECT 'l_quantity' AS column_name, n, n - nn_q AS n_null,
        |  nd_q AS n_distinct, min_q AS min_num, max_q AS max_num,
        |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM a
        |UNION ALL
        |SELECT 'l_extendedprice', n, n - nn_p, nd_p, min_p, max_p,
        |  NULL::VARCHAR, NULL::VARCHAR FROM a
        |UNION ALL
        |SELECT 'l_returnflag', n, n - nn_f, nd_f,
        |  NULL::DOUBLE, NULL::DOUBLE, sm_f, sx_f FROM a""".stripMargin
    ) { (s, dir) =>
      val a = Tables(s, dir).lineitem.agg(
        count(lit(1)).as("n"),
        count(col("l_quantity")).as("nn_q"),
        countDistinct(col("l_quantity")).as("nd_q"),
        (floor(min(col("l_quantity")) * 1e6) / 1e6).as("min_q"),
        (floor(max(col("l_quantity")) * 1e6) / 1e6).as("max_q"),
        count(col("l_extendedprice")).as("nn_p"),
        countDistinct(col("l_extendedprice")).as("nd_p"),
        (floor(min(col("l_extendedprice")) * 1e6) / 1e6).as("min_p"),
        (floor(max(col("l_extendedprice")) * 1e6) / 1e6).as("max_p"),
        count(col("l_returnflag")).as("nn_f"),
        countDistinct(col("l_returnflag")).as("nd_f"),
        min(col("l_returnflag")).as("sm_f"),
        max(col("l_returnflag")).as("sx_f"))
      val nullD = lit(null).cast("double")
      val nullS = lit(null).cast("string")
      a.select(explode(array(
          struct(lit("l_quantity").as("column_name"), col("n"),
            (col("n") - col("nn_q")).as("n_null"), col("nd_q").as("n_distinct"),
            col("min_q").as("min_num"), col("max_q").as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("l_extendedprice").as("column_name"), col("n"),
            (col("n") - col("nn_p")).as("n_null"), col("nd_p").as("n_distinct"),
            col("min_p").as("min_num"), col("max_p").as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("l_returnflag").as("column_name"), col("n"),
            (col("n") - col("nn_f")).as("n_null"), col("nd_f").as("n_distinct"),
            nullD.as("min_num"), nullD.as("max_num"),
            col("sm_f").as("min_str"), col("sx_f").as("max_str")))).as("p"))
        .select(col("p.*"))
    },

    // ★ Approximate one-scan profiler — the 100-TB variant of
    // q_profile_table: the exact profiler's multi-column count(DISTINCT)
    // plans an Expand (one row copy per distinct column — 3× the scan
    // feeding the aggregate), which is exactly what a wide-table profile
    // job cannot afford at scale. Here every distinct count is an HLL++
    // `approx_count_distinct` (rsd 0.02): ONE pass, NO Expand, per-column
    // sketch buffers merging map-side — profile cost becomes independent
    // of column cardinality. Verified under the same bounded-error
    // contract as q_agg_approx_distinct: the query also carries the exact
    // counts (via collect_set size — an object hash agg, still no
    // Expand, still one scan; it's the HARNESS, dropped at 100 TB where
    // only the sketches ship) and emits |approx − exact| / exact ≤ 0.05
    // booleans the oracle asserts TRUE — a hash match proves every
    // column's estimate landed in the bound. Plan guard pins: no Expand,
    // exactly one scan.
    q(
      "q_profile_table_approx",
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
        |    count(l_extendedprice) AS nn_p, count(DISTINCT l_extendedprice) AS nd_p,
        |    count(l_returnflag) AS nn_f, count(DISTINCT l_returnflag) AS nd_f
        |  FROM lineitem)
        |SELECT 'l_quantity' AS column_name, n, n - nn_q AS n_null,
        |  nd_q AS n_distinct, TRUE AS within_bound FROM a
        |UNION ALL
        |SELECT 'l_extendedprice', n, n - nn_p, nd_p, TRUE FROM a
        |UNION ALL
        |SELECT 'l_returnflag', n, n - nn_f, nd_f, TRUE FROM a""".stripMargin
    ) { (s, dir) =>
      val a = Tables(s, dir).lineitem.agg(
        count(lit(1)).as("n"),
        count(col("l_quantity")).as("nn_q"),
        approx_count_distinct(col("l_quantity"), 0.02).as("ad_q"),
        size(collect_set(col("l_quantity"))).cast("long").as("nd_q"),
        count(col("l_extendedprice")).as("nn_p"),
        approx_count_distinct(col("l_extendedprice"), 0.02).as("ad_p"),
        size(collect_set(col("l_extendedprice"))).cast("long").as("nd_p"),
        count(col("l_returnflag")).as("nn_f"),
        approx_count_distinct(col("l_returnflag"), 0.02).as("ad_f"),
        size(collect_set(col("l_returnflag"))).cast("long").as("nd_f"))
      def bound(ad: String, nd: String) =
        abs(col(ad) - col(nd)) <= col(nd) * 0.05
      a.select(explode(array(
          struct(lit("l_quantity").as("column_name"), col("n"),
            (col("n") - col("nn_q")).as("n_null"), col("nd_q").as("n_distinct"),
            bound("ad_q", "nd_q").as("within_bound")),
          struct(lit("l_extendedprice").as("column_name"), col("n"),
            (col("n") - col("nn_p")).as("n_null"), col("nd_p").as("n_distinct"),
            bound("ad_p", "nd_p").as("within_bound")),
          struct(lit("l_returnflag").as("column_name"), col("n"),
            (col("n") - col("nn_f")).as("n_null"), col("nd_f").as("n_distinct"),
            bound("ad_f", "nd_f").as("within_bound")))).as("p"))
        .select(col("p.*"))
    },

    // ★ Time-series gap fill — materialize the missing days of each
    // user's daily activity as explicit zero rows (the densification
    // step every downstream window/forecast op assumes). The spine is
    // generated per-user from its own [min_day, max_day] span via
    // sequence+explode — fan-out is O(span), computed from an O(users)
    // agg, never a calendar cross join — and the left join back to the
    // daily counts is a natural-key join on (user_id, d). All shuffles
    // are on user_id / (user_id, d); nothing global.
    q(
      "q_gapfill",
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
        |  FROM span)
        |SELECT s.user_id, floor(epoch(s.d))::BIGINT AS d_sec,
        |  coalesce(daily.cnt, 0)::BIGINT AS cnt,
        |  daily.cnt IS NULL AS filled
        |FROM spine s LEFT JOIN daily
        |  ON s.user_id = daily.user_id AND s.d = daily.d""".stripMargin
    ) { (s, dir) =>
      val daily = Tables(s, dir).events
        .select(col("user_id"),
          date_trunc("day", timestamp_micros(expr("ts div 1000"))).as("d"))
        .groupBy(col("user_id"), col("d"))
        .agg(count(lit(1)).as("cnt"))
      val spine = daily
        .groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      spine.join(daily, Seq("user_id", "d"), "left")
        .select(
          col("user_id"),
          unix_timestamp(col("d")).as("d_sec"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          col("cnt").isNull.as("filled"))
    },

    // ★ Forward fill (last observation carried forward) — the second
    // half of time-series repair: at every event, the user's most
    // recent purchase amount, nulls carried forward via
    // last(ignoreNulls) over a user-partitioned running frame. One
    // shuffle on the natural key; the frame is ROWS-bounded so state
    // per partition is O(1). Values are copied, not computed, so the
    // oracle matches bit-for-bit with no float guard.
    q(
      "q_fill_forward",
      """SELECT event_id, user_id,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
        |FROM (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type = 'purchase' THEN value END AS v
        |  FROM events)""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
          when(col("event_type") === "purchase", col("value")).as("v"))
        .select(col("event_id"), col("user_id"),
          last(col("v"), ignoreNulls = true).over(w).as("last_purchase"))
    },

    // ★ OHLC downsampling — the time-series COMPACTION step (per-minute
    // open/high/low/close candles per series), the shape every metrics
    // store rolls raw points into before retention kicks in. The scalable
    // plan is ONE HASH aggregation with map-side partials: open/close are
    // min_by/max_by over a PACKED-LONG ordering key — the µs offset
    // within the minute (< 2²⁶) shifted past the row id (event_id < 2³⁷,
    // comfortably any fixture and most real tables) — so the aggregate
    // buffer stays primitive (double, long) and Spark plans
    // HashAggregate, where a struct-min ordering key would force
    // SortAggregate's per-partition sort of raw points (measured in the
    // plan audit; this rewrite is why). The key is unique per row within
    // its (series, minute) group, so both engines' arg-extremes are
    // deterministic, and open/high/low/close are copied row values — no
    // float arithmetic, bit-exact across engines. The shuffle carries
    // O(series × minutes) candle partials, never raw points.
    q(
      "q_ohlc",
      """SELECT event_type,
        |  strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
        |  min_by(value, (epoch_us(ts) % 60000000) * 137438953472 + event_id) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max_by(value, (epoch_us(ts) % 60000000) * 137438953472 + event_id) AS close,
        |  count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      ohlcCandles(Tables(s, dir).events.select(
        col("event_type"), expr("ts div 1000").as("t_us"),
        col("event_id"), col("value")))
    },

    // ★ Feature scaling — z-score and min-max standardization, the last
    // hop before numeric features feed a trainer. Global stats come from
    // ONE single-pass agg (mergeable moments: avg/stddev_pop/min/max),
    // ride to every row as a 1-row broadcast (BroadcastNestedLoopJoin of
    // a single row — constant cost at any scale), and the per-row scaling
    // is pure codegen arithmetic. Verified through order-insensitive
    // per-group aggregates (counts + floored min/max) so the oracle
    // needs no float-fold ordering tricks; the |z|>2 outlier threshold
    // sits far from any attainable knife-edge (quantities are small
    // integers).
    q(
      "q_feature_scale",
      """WITH st AS (
        |  SELECT avg(l_quantity) AS mq, stddev_pop(l_quantity) AS sq,
        |    min(l_extendedprice) AS mnp, max(l_extendedprice) AS mxp
        |  FROM lineitem),
        |sc AS (
        |  SELECT l_returnflag AS flag,
        |    (l_quantity - mq) / sq AS z,
        |    (l_extendedprice - mnp) / (mxp - mnp) AS mm
        |  FROM lineitem CROSS JOIN st)
        |SELECT flag, count(*) AS n,
        |  sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END)::BIGINT AS n_outlier,
        |  floor(min(z) * 1e6) / 1e6 + 0.0 AS min_z,
        |  floor(max(z) * 1e6) / 1e6 + 0.0 AS max_z,
        |  floor(min(mm) * 1e6) / 1e6 + 0.0 AS min_mm,
        |  floor(max(mm) * 1e6) / 1e6 + 0.0 AS max_mm
        |FROM sc GROUP BY flag""".stripMargin
    ) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      val st = li.agg(
        avg(col("l_quantity")).as("mq"),
        stddev_pop(col("l_quantity")).as("sq"),
        min(col("l_extendedprice")).as("mnp"),
        max(col("l_extendedprice")).as("mxp"))
      li.crossJoin(broadcast(st))
        .select(
          col("l_returnflag").as("flag"),
          ((col("l_quantity") - col("mq")) / col("sq")).as("z"),
          ((col("l_extendedprice") - col("mnp")) / (col("mxp") - col("mnp"))).as("mm"))
        .groupBy(col("flag"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(abs(col("z")) > 2, 1L).otherwise(0L)).as("n_outlier"),
          (floor(min(col("z")) * 1e6) / 1e6 + 0.0).as("min_z"),
          (floor(max(col("z")) * 1e6) / 1e6 + 0.0).as("max_z"),
          (floor(min(col("mm")) * 1e6) / 1e6 + 0.0).as("min_mm"),
          (floor(max(col("mm")) * 1e6) / 1e6 + 0.0).as("max_mm"))
    },

    // ★ PageRank step — one damped iteration over the supplier→part
    // bipartite graph distilled from lineitem (distinct edges), the
    // weighted-iterative-compute family that the connected-components
    // dedup lane (pure label min) doesn't cover. Shapes per iteration:
    // one distinct (edge shuffle), one out-degree agg, one key join, one
    // destination agg — all key-partitioned, output O(nodes); iterating
    // re-runs join+agg with the ranks frame checkpointed every few
    // rounds exactly like the dedup CC lane's lineage bound. Per-node
    // contribution sums fold in sorted source order (ordered-list
    // aggregate) so both engines replay the same IEEE sum; top-25 via
    // TakeOrderedAndProject on the floored score.
    q(
      "q_pagerank_step",
      """WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        |od AS (SELECT s, count(*) AS deg FROM e GROUP BY 1),
        |contrib AS (
        |  SELECT e.p, e.s, 1.0 / od.deg AS c FROM e JOIN od USING (s)),
        |r AS (SELECT p, list(c ORDER BY s) AS cl FROM contrib GROUP BY p)
        |SELECT p AS partkey,
        |  floor((0.15 + 0.85 * list_sum(cl)) * 1e6) / 1e6 + 0.0 AS pr
        |FROM r ORDER BY pr DESC, partkey LIMIT 25""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir).lineitem
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
      val od = e.groupBy(col("s")).agg(count(lit(1)).as("deg"))
      e.join(od, "s")
        .select(col("p"), col("s"), (lit(1.0) / col("deg")).as("c"))
        .groupBy(col("p"))
        .agg(sort_array(collect_list(struct(col("s"), col("c")))).as("cl"))
        .select(
          col("p").as("partkey"),
          (floor((lit(0.15) + lit(0.85) *
            aggregate(col("cl"), lit(0.0), (a, x) => a + x.getField("c"))) * 1e6) / 1e6
            + 0.0).as("pr"))
        .orderBy(col("pr").desc, col("partkey"))
        .limit(25)
    },

    // ★ PageRank to CONVERGENCE — the iterative-compute shape where the
    // LOOP, not the step, is the hard part: q_pagerank_step is one damped
    // iteration; this drives the per-round dataflow (keyed join +
    // destination agg) inside a driver loop with a deterministic
    // convergence check and per-round lineage truncation — the CC dedup
    // lane's machinery (DedupQueries.connectedComponents) applied to a
    // weighted fixpoint. Arithmetic is FIXED-POINT (nano-unit longs):
    // integer sums commute exactly, so cross-engine determinism needs no
    // ordered folds and the per-round agg keeps map-side partials — both
    // the determinism fix and the scale fix in one move (the float
    // ordered-fold variant shipped every contribution row to the reduce
    // side and measured 7× slower at sf0.1). Graph: the supplier↔part
    // bipartite graph from lineitem, both directions (part ids offset by
    // 1e6 into a disjoint node space), so rank flows round-trip and no
    // node dangles. Convergence: max per-node |Δpr| < 1e-3 (1e6 nano) —
    // MAX is order-independent, so the round count is deterministic and
    // the oracle unrolls exactly that many CTE stages (the n_rounds
    // output column pins loop-count parity, not just final values).
    // Scale: per round one keyed join of O(edges) against O(nodes) ranks
    // + one partially-aggregated keyed sum — shuffle O(nodes×partitions),
    // state O(nodes), localCheckpoint per round exactly like the CC
    // lane; the convergence scalar is one tiny agg action, never a
    // collect of ranks. Below the DriverLocalGate byte-budget threshold
    // (2M edges ≈ 128 MB collected) the loop runs driver-local instead
    // (the CC endgame pattern — a job round costs ~1 s in stage
    // scheduling alone, pure overhead at fixture scale); commutative
    // integer arithmetic makes the paths bit-identical, spec-pinned, so
    // the oracle covers both. The two edge directions come from ONE
    // explode over the distinct pair set — a union of two selects over
    // `sp` would scan + distinct lineitem twice (Catalyst does not reuse
    // common subplans across union branches).
    q(
      "q_pagerank_converge",
      pagerankConvergeSql
    ) { (s, dir) =>
      val sp = Tables(s, dir).lineitem
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
      val edges = sp
        .select(explode(array(
          struct(col("s").as("src"), (col("p") + 1000000L).as("dst")),
          struct((col("p") + 1000000L).as("src"), col("s").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // phase split (round-20 attribution sweep): the fixpoint loop does
      // its work in body-internal actions (per-round checkpoints or the
      // driver-local endgame) — time it as one phase; the top-25 rollup
      // is the declared output, forced as an eager leaf
      val (ranks, rounds) = graft.Bench.phase("q_pagerank_converge.iterate") {
        pagerankConverge(s, edges, 1000000L, 60)
      }
      graft.plans.AuditFrames.forced("q_pagerank_converge", "rollup") {
        ranks
          .select(col("id"),
            (expr("pr div 1000").cast("double") / lit(1000000.0)).as("pr"),
            lit(rounds.toLong).as("n_rounds"))
          .orderBy(col("pr").desc, col("id"))
          .limit(25)
      }
    },

    // ★ BFS levels — single-source shortest hop-distance over the same
    // supplier↔part graph, the reachability member of the loop family
    // (pagerank ranks, k-means trains, BFS measures). Levels are integer
    // and UNIQUE per node regardless of expansion order, so the loop is
    // bit-deterministic with no fixed-point tricks needed; the round
    // count is the source's eccentricity — measured 3 at sf0.001, sf0.01
    // AND sf0.1 alike (the bipartite graph densifies as it grows, so
    // diameter never stretches; scale-invariant like pagerank's 15, and
    // BfsLevelsSpec turns a fixture drift into a named failure). Output
    // is the per-level node histogram + the unreached count — the
    // dup-graph ops report ("how many hops does contamination spread").
    // Per round: one keyed join + distinct + an anti join against
    // visited, all O(frontier); localCheckpoint truncates lineage and
    // the previous round's blocks are released (the pagerank-loop
    // hygiene). Below DriverLocalGate's byte budget the loop runs
    // driver-local, spec-proven identical.
    q(
      "q_bfs_levels",
      bfsLevelsSql
    ) { (s, dir) =>
      // cached: the distinct pair frame is the expensive part (lineitem
      // scan + distinct) and feeds the root lookup, the BFS edge build,
      // AND the node-total arm — bfsLevels manages (and releases) its own
      // edge cache internally, so the reuse point must sit ABOVE it
      // (Bench.cleanup unpersists)
      val sp = Tables(s, dir).lineitem
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = sp
        .select(explode(array(
          struct(col("s").as("src"), (col("p") + 1000000L).as("dst")),
          struct((col("p") + 1000000L).as("src"), col("s").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // one scalar driver action for the source id — the loop family's
      // per-round actions dwarf this. The loop does its work in
      // body-internal actions — phased, the q_pagerank_converge shape
      // (round-20 attribution sweep: the lane drifts across the
      // multi-second bar between runs)
      val (levels, rounds) = graft.Bench.phase("q_bfs_levels.iterate") {
        val root = sp.agg(min(col("s"))).head.getLong(0)
        bfsLevels(s, edges, root, 64)
      }
      // node total from the EDGE frame itself (count DISTINCT src over
      // both directions) — exactly the oracle's derivation, so the two
      // sides cannot diverge even if fixture suppkeys ever grew past the
      // 1e6 partkey offset: a collision would then be counted once on
      // BOTH sides instead of double-counted on one; edges derives from
      // the cached pair frame, so this is still one scan of the cache
      graft.plans.AuditFrames.forced("q_bfs_levels", "rollup") {
        val totals = edges
          .agg(countDistinct(col("src")).as("n_nodes_total"))
          .crossJoin(broadcast(levels.agg(count(lit(1)).as("n_reached"))))
        levels.groupBy(col("lvl").as("level"))
          .agg(count(lit(1)).as("n_nodes"))
          .crossJoin(broadcast(totals))
          .select(col("level"), col("n_nodes"), lit(rounds.toLong).as("n_rounds"),
            (col("n_nodes_total") - col("n_reached")).as("n_unreached"))
      }
    },

    // ★ Z-order layout key — multi-dimensional data clustering for the
    // write path: interleave the bits of two dimensions (user bucket ×
    // day-of-month) so one range-partitioned sort gives parquet row-group
    // min/max locality on BOTH columns. The key is pure per-row integer
    // arithmetic inside whole-stage codegen (zero shuffle to compute); at
    // scale the layout pass is repartitionByRange(zkey) +
    // sortWithinPartitions before write. The query verifies the property
    // that makes z-order work — each contiguous z-range covers a BOUNDED
    // (x, y) rectangle — by aggregating per-bucket spans.
    {
      // Bit-interleave, generated once and spliced into BOTH engines so
      // the arithmetic is literally identical: 10 bits of x (even
      // positions) and 5 of y (odd positions).
      val zTerms = (0 until 10).map { i =>
        val xe = s"(((x >> $i) & 1) << ${2 * i})"
        if (i < 5) s"$xe + (((y >> $i) & 1) << ${2 * i + 1})" else xe
      }.mkString(" + ")
      q(
        "q_zorder_key",
        s"""WITH b AS (
           |  SELECT user_id % 1024 AS x, day(ts)::BIGINT AS y FROM events),
           |z AS (SELECT x, y, ($zTerms) AS zkey FROM b)
           |SELECT zkey >> 12 AS bucket, count(*) AS cnt,
           |  count(DISTINCT x) AS n_x, count(DISTINCT y) AS n_y,
           |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
           |FROM z GROUP BY 1""".stripMargin
      ) { (s, dir) =>
        Tables(s, dir).events
          .select(
            (col("user_id") % 1024).as("x"),
            dayofmonth(timestamp_micros(expr("ts div 1000"))).cast("long").as("y"))
          .withColumn("zkey", expr(zTerms))
          .groupBy(expr("zkey >> 12").as("bucket"))
          .agg(
            count(lit(1)).as("cnt"),
            countDistinct(col("x")).as("n_x"),
            countDistinct(col("y")).as("n_y"),
            (max(col("x")) - min(col("x"))).as("x_span"),
            (max(col("y")) - min(col("y"))).as("y_span"))
      }
    },

    // ★ Distribution-DRIFT monitor — the data-quality report a production
    // ingest runs between corpus versions: split the table at the
    // midpoint epoch-day into reference and current slices, then compare
    // the slices' distributions per monitored column — `value` over 10
    // equal-width bins derived from the REFERENCE slice's range (so a
    // current-side range excursion lands in the edge bins instead of
    // moving the edges), `event_type` over its categories. Divergence is
    // total-variation distance in ppm (Σ|p_ref − p_cur| / 2) — a pure
    // integer statistic over integer ppm shares, so both engines agree
    // bit-for-bit where a PSI/KL ln() would hang cross-engine parity on
    // libm rounding. Plan: the 3-column projection is cached; one pass
    // derives the day range, one the reference stats + slice totals
    // (single conditional agg), and ONE pass bins every row into its two
    // (column, bin) contributions — a bounded hash agg + an O(bins)
    // window. Output is O(bins + categories): the drift dashboard stays
    // driver-readable at any table size. DriftReportSpec proves
    // sensitivity on a planted shift and zero on identical slices.
    q(
      "q_drift_report",
      """WITH e AS (
        |  SELECT datediff('day', TIMESTAMP '1970-01-01', ts) AS day,
        |    event_type, value
        |  FROM events),
        |r AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
        |st AS (
        |  SELECT min(CASE WHEN day < mid THEN value END) AS lo,
        |    max(CASE WHEN day < mid THEN value END) AS hi,
        |    sum(CASE WHEN day < mid THEN 1 ELSE 0 END)::BIGINT AS tot_ref,
        |    sum(CASE WHEN day >= mid THEN 1 ELSE 0 END)::BIGINT AS tot_cur
        |  FROM e CROSS JOIN r),
        |b AS (
        |  SELECT CASE WHEN day < mid THEN 0 ELSE 1 END AS side, col, bin
        |  FROM (
        |    SELECT day, mid, unnest([
        |      struct_pack(col := 'value', bin := 'b' || CAST(
        |        CASE WHEN hi = lo THEN 0 ELSE least(greatest(
        |          CAST(floor((value - lo) * 10 / (hi - lo)) AS BIGINT), 0), 9) END
        |        AS VARCHAR)),
        |      struct_pack(col := 'event_type', bin := event_type)
        |    ], recursive := true)
        |  FROM e CROSS JOIN r CROSS JOIN st)),
        |c AS (
        |  SELECT col, bin,
        |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ref,
        |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS n_cur
        |  FROM b GROUP BY 1, 2),
        |p AS (
        |  SELECT col, bin,
        |    (n_ref * 1000000 // tot_ref)::BIGINT AS ref_ppm,
        |    (n_cur * 1000000 // tot_cur)::BIGINT AS cur_ppm
        |  FROM c CROSS JOIN st)
        |SELECT col, bin, ref_ppm, cur_ppm,
        |  abs(ref_ppm - cur_ppm)::BIGINT AS diff_ppm,
        |  (sum(abs(ref_ppm - cur_ppm)) OVER (PARTITION BY col) // 2)::BIGINT AS tv_ppm
        |FROM p""".stripMargin
    ) { (s, dir) =>
      // datediff-on-date floors like the oracle's datediff (a raw
      // `ts div 86400e9` would TRUNCATE toward zero and misclassify any
      // pre-epoch timestamp into the wrong slice)
      driftReport(Tables(s, dir).events.select(
        expr("cast(datediff(cast(timestamp_micros(ts div 1000) as date), date'1970-01-01') as bigint)")
          .as("day"),
        col("event_type"), col("value")))
    },

    // ★ Join-key skew profile — the diagnostic every 100-TB join runs
    // FIRST: per-key counts → hottest-key list with corpus share (integer
    // ppm) plus a global skew factor (max key count over mean key count,
    // ×1000 fixed point). skew_x1000 ≈ 1000 means uniform; ≥ ~5000 means
    // the hottest key funnels one sort-merge task and the join wants AQE
    // skew split or salting (q_join_salted / q_join_salted_auto). Plan:
    // one keyed hash agg (map-side partials), a 1-row global agg
    // broadcast back over the key frame (BroadcastNestedLoopJoin with an
    // O(1) side — the stats-join idiom), and a bounded top-10 TakeOrdered
    // — no global sort, no driver collect, O(distinct keys) intermediate.
    // All ratios are integer floor-divides so the hash matches DuckDB
    // bit-for-bit. At 100 TB the count agg runs on a block sample instead
    // of the full fact (the factor only needs one significant digit) —
    // same plan, ~free.
    q(
      "q_skew_profile",
      """WITH k AS (
        |  SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
        |g AS (
        |  SELECT count(*) AS n_keys, sum(cnt)::BIGINT AS n_rows,
        |    max(cnt) AS max_cnt FROM k)
        |SELECT k.key, k.cnt, (k.cnt * 1000000) // g.n_rows AS share_ppm,
        |  g.n_keys, g.n_rows,
        |  (g.max_cnt * g.n_keys * 1000) // g.n_rows AS skew_x1000
        |FROM k CROSS JOIN g
        |ORDER BY k.cnt DESC, k.key LIMIT 10""".stripMargin
    ) { (s, dir) =>
      // cached: k feeds the top-10 AND the 1-row global stats — one fact
      // scan, not two (the frame is O(distinct keys); Bench.cleanup
      // unpersists)
      val k = Tables(s, dir).lineitem
        .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val g = k.agg(
        count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"))
      k.crossJoin(broadcast(g))
        .select(col("key"), col("cnt"),
          expr("cnt * 1000000 div n_rows").as("share_ppm"),
          col("n_keys"), col("n_rows"),
          expr("max_cnt * n_keys * 1000 div n_rows").as("skew_x1000"))
        .orderBy(col("cnt").desc, col("key")).limit(10)
    },

    // ★ Small-file compaction plan — the lakehouse OPTIMIZE planner, the
    // third leg of the layout-maintenance family (q_zorder_key orders
    // within files, q_mv_refresh maintains derived tables, this bin-packs
    // the files themselves): per (day, hour) micro-partition byte
    // estimates are packed into target-sized output files by the
    // streaming first-fit rule — file_id = exclusive-prefix-sum of bytes
    // // target — so every output file except a partition's last is
    // ≥ target − max(part) full and parts stay hour-contiguous (specs pin
    // both invariants). The prefix sum runs per DAY partition, so at
    // 100 TB the plan is embarrassingly parallel across partition
    // directories — the window never sees more than one directory's file
    // list (thousands of rows), and no global sort exists anywhere.
    // Target here is 4 KiB to produce multi-file plans at fixture scale;
    // production uses 1 GiB — one constant, same plan. Byte estimate =
    // sum(length(props)) + 32/row stands in for the file-listing sizes a
    // real catalog provides.
    q(
      "q_compact_plan",
      """WITH p AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, hour(ts)::BIGINT AS hr,
        |    count(*) AS n_rows,
        |    (coalesce(sum(length(props)), 0) + 32 * count(*))::BIGINT AS est_bytes
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT day, hr, est_bytes,
        |    (sum(est_bytes) OVER (PARTITION BY day ORDER BY hr
        |       ROWS UNBOUNDED PRECEDING) - est_bytes)::BIGINT AS cum0
        |  FROM p),
        |a AS (SELECT day, hr, est_bytes, cum0 // 4096 AS file_id FROM c)
        |SELECT day, file_id, count(*) AS n_parts, sum(est_bytes)::BIGINT AS bytes,
        |  min(hr) AS hr_from, max(hr) AS hr_to
        |FROM a GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val tsUs = timestamp_micros(expr("ts div 1000"))
      compactBins(Tables(s, dir).events
          .select(date_format(tsUs, "yyyy-MM-dd").as("day"),
            hour(tsUs).cast("long").as("hr"), length(col("props")).as("pb")))
        .groupBy(col("day"), col("file_id"))
        .agg(count(lit(1)).as("n_parts"), sum(col("est_bytes")).as("bytes"),
          min(col("hr")).as("hr_from"), max(col("hr")).as("hr_to"))
    },

    // ★ Compaction APPLY — the rewrite q_compact_plan only plans, the
    // lakehouse OPTIMIZE executed: a deliberately fragmented store (one
    // file per (day, hour) directory — the small-file problem) is
    // rewritten into day-partitioned files following the SAME bin
    // assignment the plan query reports (shared compactBins, so plan and
    // apply can never disagree). The declared output is read back from
    // the COMPACTED store — per (day, file_id, hour) row counts — so the
    // oracle (which recomputes the bins and hour counts straight from
    // events) proves the rewrite lost and duplicated nothing at hour
    // granularity; CompactApplySpec adds what SQL can't see: the rewrite
    // plan reads the fragmented store (not the source), the physical
    // file count actually DROPS, and row-level content is bit-identical.
    // Scale: the rewrite is one broadcast bins join + a (day, file_id)
    // repartition — embarrassingly parallel across day directories, no
    // global sort; at 100 TB each day compacts independently and
    // unaffected days are never rewritten.
    q(
      "q_compact_apply",
      """WITH p AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, hour(ts)::BIGINT AS hr,
        |    count(*) AS n_rows,
        |    (coalesce(sum(length(props)), 0) + 32 * count(*))::BIGINT AS est_bytes
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT day, hr, n_rows, est_bytes,
        |    (sum(est_bytes) OVER (PARTITION BY day ORDER BY hr
        |       ROWS UNBOUNDED PRECEDING) - est_bytes)::BIGINT AS cum0
        |  FROM p)
        |SELECT day, (cum0 // 4096)::BIGINT AS file_id, hr,
        |  n_rows::BIGINT AS n_rows
        |FROM c""".stripMargin
    ) { (s, dir) => compactApplyServe(s, dir)._5 }
  )

  /** q_compact_apply's fragment→rewrite→read-back, exposed private[graft]
    * so CompactApplySpec can pin what the SQL oracle cannot see. Builds
    * eagerly by design (the served frame reads the compacted store this
    * body writes — docs/SCALING.md "Why stored-lane query bodies build
    * eagerly"); Bench splits the cost into manufacture/rewrite phase
    * timers. Returns
    * (fragmented path, compacted path, physical plan of the frag frame
    * captured BEFORE the cache hides its scan — the store-provenance
    * witness, the rewrite only composes frag+bins on top — the planned
    * bins frame, and the served frame). */
  private[graft] def compactApplyServe(s: SparkSession, dir: String)
      : (String, String, String, DataFrame, DataFrame) = {
    val tsUs = timestamp_micros(expr("ts div 1000"))
    val ev = Tables(s, dir).events.select(
      col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"),
      date_format(tsUs, "yyyy-MM-dd").as("day"), hour(tsUs).cast("long").as("hr"))
    val fragPath = graft.plans.ScratchDirs.unique("graft-compact-frag").getAbsolutePath
    // manufacture the small-file problem: one file per (day, hour) dir.
    // Phase-timed (Bench emits it as q_compact_apply.manufacture): the
    // ~720 physical file creates here are the PATHOLOGY, not the
    // OPTIMIZE — splitting the timer makes a regression in the headline
    // number attributable without re-profiling (round-11 review item).
    graft.Bench.phase("q_compact_apply.manufacture") {
      // explicit partition count: with `repartition(cols)` alone AQE is
      // free to coalesce the tiny shuffle to 2-3 partitions, serializing
      // the ~720 parquet file creates onto 3 tasks (measured 7.3 s of
      // this phase — guide §2.5/§6: the file-create cost, not the bytes,
      // is the work here, so it must spread over the cluster). With the
      // (day, hr) hash spread over defaultParallelism tasks each task
      // creates ~#dirs/#cores files; at real scale a day×hour ingest is
      // naturally this parallel.
      ev.repartition(s.sparkContext.defaultParallelism, col("day"), col("hr"))
        .write.mode("overwrite").partitionBy("day", "hr").parquet(fragPath)
    }
    val frag = s.read.parquet(fragPath).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"),
      col("day").cast("string").as("day"), col("hr").cast("long").as("hr"))
    // capture provenance while the scan is still visible: once cached,
    // every downstream plan shows only InMemoryTableScan
    val fragPlan = frag.queryExecution.executedPlan.toString
    // the 720-file store feeds BOTH the bins derivation and the rewrite
    // join — cache it so the small-file listing+scan is paid once
    // (Bench.cleanup unpersists)
    frag.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bins derive from the STORE's stats (the catalog-file-listing
    // stand-in), not from the source table
    val bins = compactBins(
        frag.select(col("day"), col("hr"), length(col("props")).as("pb")))
      .select(col("day"), col("hr"), col("file_id"))
    val rewritten = frag.join(broadcast(bins), Seq("day", "hr"))
      .repartition(col("day"), col("file_id"))
    val compPath = graft.plans.ScratchDirs.unique("graft-compact-out").getAbsolutePath
    // phase-timed as q_compact_apply.rewrite: the actual OPTIMIZE work —
    // bins join + compacted write (the read-back proof stays in the
    // untimed remainder, it runs when the returned frame is consumed)
    graft.Bench.phase("q_compact_apply.rewrite") {
      rewritten.write.mode("overwrite").partitionBy("day").parquet(compPath)
    }
    val served = s.read.parquet(compPath)
      .groupBy(col("day").cast("string").as("day"), col("file_id"), col("hr"))
      .agg(count(lit(1)).as("n_rows"))
    (fragPath, compPath, fragPlan, bins, served)
  }

  /** q_drift_report's engine over a (day, event_type, value) frame —
    * factored so DriftReportSpec can plant a known distribution shift.
    * Requires both slices non-empty (the ppm divisions are integer and
    * unguarded — a one-sided frame is a caller error, and the fixture's
    * 30-day span guarantees both sides). */
  private[graft] def driftReport(ev0: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // one cached 3-column projection; the parquet is read ONCE, and the
    // cache is then scanned once per stats consumer (the 1-row mid and
    // stats frames are re-derived where referenced — six cheap cache
    // scans total, two of them full conditional aggs) — Bench.cleanup
    // unpersists
    val ev = ev0.persist(MEMORY_AND_DISK)
    val r = broadcast(ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid")))
    val st = broadcast(ev.crossJoin(r).agg(
      min(when(col("day") < col("mid"), col("value"))).as("lo"),
      max(when(col("day") < col("mid"), col("value"))).as("hi"),
      sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("tot_ref"),
      sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("tot_cur")))
    val binCol = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(greatest(
        floor((col("value") - col("lo")) * lit(10) / (col("hi") - col("lo"))),
        lit(0L)), lit(9L)))
    val b = ev.crossJoin(r).crossJoin(st)
      .select(when(col("day") < col("mid"), 0).otherwise(1).as("side"),
        explode(array(
          struct(lit("value").as("col"),
            concat(lit("b"), binCol.cast("string")).as("bin")),
          struct(lit("event_type").as("col"), col("event_type").as("bin")))).as("cb"))
      .select(col("side"), col("cb.col").as("col"), col("cb.bin").as("bin"))
    val c = b.groupBy(col("col"), col("bin")).agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_cur"))
    c.crossJoin(st)
      .select(col("col"), col("bin"),
        expr("n_ref * 1000000 div tot_ref").as("ref_ppm"),
        expr("n_cur * 1000000 div tot_cur").as("cur_ppm"))
      .select(col("col"), col("bin"), col("ref_ppm"), col("cur_ppm"),
        abs(col("ref_ppm") - col("cur_ppm")).as("diff_ppm"),
        expr("sum(abs(ref_ppm - cur_ppm)) over (partition by col) div 2").as("tv_ppm"))
  }

  /** The compaction bin assignment shared by q_compact_plan (reports it)
    * and q_compact_apply (executes it): per-(day, hr) stats off one row
    * per record (day, hr, pb), prefix-sum first-fit file ids within each
    * day at the 4 KiB fixture target. Input rows carry pb =
    * length(props); the estimate stands in for catalog file sizes. */
  private[graft] def compactBins(rows: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val p = rows.groupBy(col("day"), col("hr"))
      // coalesce: a (day,hr) group whose props are ALL NULL must still
      // pack as a 32-bytes/record bin, not poison file_id with NULL
      .agg((coalesce(sum(col("pb")), lit(0L)) + lit(32L) * count(lit(1))).as("est_bytes"))
    val w = Window.partitionBy(col("day")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.withColumn("cum0", sum(col("est_bytes")).over(w) - col("est_bytes"))
      .withColumn("file_id", expr("cum0 div 4096"))
  }

  /** The q_ohlc aggregation over a (event_type, t_us, event_id, value)
    * points frame — shared between the declared batch query and the
    * streaming parity test (StreamingSpec drives the SAME candle agg as
    * a complete-mode streaming aggregation, so batch and live roll-ups
    * cannot drift). See q_ohlc's scaladoc for the packed-key rationale.
    * CONTRACT: event_id must sit in [0, 2³⁷) — the pack reserves the low
    * 37 bits for it under the 26-bit µs-offset, and an id outside that
    * range would silently order candles by id instead of time, so the
    * guard below turns a violation into a loud per-row error instead. */
  private[graft] def ohlcCandles(points: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    points.select(col("event_type"),
      date_format(date_trunc("minute", timestamp_micros(col("t_us"))),
        "yyyy-MM-dd HH:mm").as("minute"),
      when(col("event_id").between(0L, (1L << 37) - 1),
        (col("t_us") % 60000000L) * lit(1L << 37) + col("event_id"))
        .otherwise(raise_error(concat(
          lit("ohlc pack out of range: event_id "),
          col("event_id").cast("string")))).as("pack"),
      col("value").as("v"))
    .groupBy(col("event_type"), col("minute"))
    .agg(
      min_by(col("v"), col("pack")).as("open"),
      max(col("v")).as("high"),
      min(col("v")).as("low"),
      max_by(col("v"), col("pack")).as("close"),
      count(lit(1)).as("n_events"))
}
