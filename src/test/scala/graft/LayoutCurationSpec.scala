package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 diagnostics/layout/curation additions:
  * q_skew_profile (the pre-join skew report), q_compact_plan (the
  * bin-packing OPTIMIZE planner) and q_domain_stats (the per-domain
  * curation decision table). Each query's VALUES are pinned by its DuckDB
  * oracle; these tests pin the semantic properties the oracle hash can't
  * name — packing bounds, contiguity, rate clamps — so a future edit that
  * shifts both engines in lockstep still can't break the contract.
  */
class LayoutCurationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q_skew_profile: shares are floor-ppm of the fact, hottest first") {
    val rows = SparkEntry.queries("q_skew_profile")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val factRows = Tables(spark, sfDir).lineitem.count()
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "not sorted by cnt desc")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === factRows)
      assert(r.getAs[Long]("share_ppm") === r.getAs[Long]("cnt") * 1000000L / factRows)
      // skew factor ≥ 1000 by construction: max ≥ mean
      assert(r.getAs[Long]("skew_x1000") >= 1000L)
    }
  }

  test("q_compact_plan: files are hour-contiguous, non-overlapping, and filled") {
    val plan = SparkEntry.queries("q_compact_plan")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("file_id"),
        r.getAs[Long]("n_parts"), r.getAs[Long]("bytes"),
        r.getAs[Long]("hr_from"), r.getAs[Long]("hr_to")))
    assert(plan.nonEmpty)
    val target = 4096L
    plan.groupBy(_._1).foreach { case (day, files) =>
      val ordered = files.sortBy(_._2)
      // file ids are 0..n-1 with no gaps (the prefix-sum rule can't skip)
      assert(ordered.map(_._2).toSeq === ordered.indices.map(_.toLong),
        s"$day: non-contiguous file ids")
      // hour ranges tile the day's populated hours without overlap
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"$day: overlapping hour ranges")
        case _           =>
      }
      // every file except the day's last starts before the boundary it
      // crosses: bytes(file) ≥ target − max single part would need part
      // sizes; the weaker universal bound is that the preceding files'
      // cumulative bytes reach file_id × target (exactly the packing rule)
      val cum = ordered.scanLeft(0L)(_ + _._4)
      ordered.zipWithIndex.drop(1).foreach { case (f, i) =>
        assert(cum(i) >= f._2 * target,
          s"$day file ${f._2}: opened before its boundary was reached")
      }
    }
  }

  test("q_bin_equidepth: bins are ordered, non-overlapping, and count-balanced") {
    val rows = SparkEntry.queries("q_bin_equidepth")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq, "bins must be 1..k")
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"bins ${a._1}/${b._1} overlap")
      case _           =>
    }
    // equi-DEPTH: on tie-free data every bin holds within one boundary-tie
    // of total/k (the fixture's 2-decimal prices are effectively tie-free)
    val total = rows.map(_._2).sum
    val per = total / rows.length
    rows.foreach { case (bin, n, _, _) =>
      assert(math.abs(n - per) <= math.max(1L, per / 20),
        s"bin $bin holds $n of ~$per — not equi-depth")
    }
  }

  test("q_cluster_stats: the report partitions the corpus exactly") {
    val rows = SparkEntry.queries("q_cluster_stats")(spark, sfDir).collect()
    val totalDocs = Tables(spark, sfDir).documents.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs,
      "histogram + singleton row must cover every document exactly once")
    rows.foreach { r =>
      val size = r.getAs[Long]("cluster_size")
      assert(r.getAs[Long]("n_docs") === size * r.getAs[Long]("n_clusters"))
      // CC clusters have ≥2 members; size 1 is the synthetic singleton row
      if (size >= 2L) assert(!r.isNullAt(r.fieldIndex("min_cluster_id")))
      else assert(r.isNullAt(r.fieldIndex("min_cluster_id")))
    }
    Bench.cleanup(spark)
  }

  test("q_domain_stats: rates are clamped and doc counts conserve") {
    val rows = SparkEntry.queries("q_domain_stats")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables(spark, sfDir).documents.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_score_x10000")
      val keep = r.getAs[Long]("keep_ppm")
      val low = r.getAs[Long]("low_ppm")
      assert(mean >= 0L && mean <= 10000L)
      assert(low >= 0L && low <= 1000000L)
      assert(keep >= 0L && keep <= 1000000L)
      // keep_ppm is min(quality-proportional, corpus cap): never above the
      // quality rate
      assert(keep <= mean * 100L)
      // cap: no domain may be asked to contribute more than 25% of corpus
      val cap = (totalDocs / 4L) * 1000000L / r.getAs[Long]("n_docs")
      assert(keep <= math.min(cap, 1000000L))
    }
    Bench.cleanup(spark)
  }
}
