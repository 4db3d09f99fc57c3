package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime filtering — the two Spark mechanisms that shrink a 100 TB
  * fact scan using information only available at RUN time, complementing
  * the static layout specs (PartitionPruningSpec: directory pruning on a
  * literal; BucketJoinSpec: join-key layout):
  *
  *  - dynamic partition pruning: a selective filter on the DIM side of a
  *    join prunes fact PARTITIONS via a runtime subquery, so the fact
  *    scan lists only the directories the joined keys can live in;
  *  - runtime bloom-filter join pruning: the same idea below directory
  *    granularity — a bloom filter built from the dim side's join keys
  *    is pushed into the fact scan as a row-level semi-join filter.
  *
  * Both are correctness-invisible (they only skip rows the join would
  * drop), which the tests pin alongside the plan shape.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("dynamic partition pruning: dim filter prunes fact partitions through the join") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    val t = Tables(spark, "/root/testdata/sf0.01")
    // orders partitioned by year = the fact; a filtered 1-year dim drives
    // the runtime pruning
    t.orders.withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders_p")
    val fact = spark.read.parquet(s"$dir/orders_p")
    // DPP requires a SELECTIVE FILTER over a scan on the dim side — a
    // year-dimension table where only one row survives the predicate
    spark.range(1992, 1999)
      .select(col("id").cast("int").as("o_year"),
        when(col("id") === 1995, "picked").otherwise("skip").as("tag"))
      .write.mode("overwrite").parquet(s"$dir/years")
    val dim = spark.read.parquet(s"$dir/years").filter(col("tag") === "picked")

    val joined = fact.join(dim, Seq("o_year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in fact scan:\n${plan.take(3000)}")

    // pruning must be semantically invisible
    val expect = t.orders.filter(year(col("o_orderdate")) === 1995).count()
    assert(joined.count() === expect)
    assert(expect > 0)
  }

  test("runtime bloom filter from the dim side reaches the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join path the bloom filter targets
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t = Tables(spark, "/root/testdata/sf0.01")
      // selective dim: a fraction of customers; fact: orders
      val dim = t.customer.filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("o_custkey"))
      val joined = t.orders.join(dim, Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no bloom-filter runtime pruning in plan:\n${plan.take(3000)}")

      // filter must be semantically invisible
      val expect = t.orders.filter(col("o_custkey") % 97 === 0).count()
      assert(joined.count() === expect)
      assert(expect > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("declared q_join_bloom: probe upstream of the fact exchange, pruning invisible") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.functions.BloomMightContain

    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case o                        => o.children
      }
      p +: kids.flatMap(flatten)
    }
    def scansLineitem(p: SparkPlan): Boolean = flatten(p).exists {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("lineitem"))
      case _ => false
    }

    val dir = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q_join_bloom")(spark, dir)
    val got = df.collect() // finalize AQE so the executed plan is the real one
    val all = flatten(df.queryExecution.executedPlan)
    val plan = df.queryExecution.executedPlan.toString

    // the merge hint held: this is the shuffle-join plan the pattern exists for
    assert(all.exists(_.nodeName.contains("SortMergeJoin")), plan.take(3000))
    // every exchange that moves lineitem rows must sit ABOVE the bloom
    // probe — rows the filter drops never pay shuffle bytes
    val factEx = all.collect { case s: ShuffleExchangeExec if scansLineitem(s) => s }
    assert(factEx.nonEmpty, s"no fact-side exchange:\n${plan.take(3000)}")
    factEx.foreach { e =>
      val pruned = flatten(e).exists {
        case f: FilterExec => f.condition.find(_.isInstanceOf[BloomMightContain]).isDefined
        case _             => false
      }
      assert(pruned, s"bloom probe not below the fact exchange:\n${plan.take(3000)}")
    }
    // the probe actually PRUNES, measured at the filter operator itself:
    // the fact-side bloom FilterExec's numOutputRows (populated by the
    // collect above) must admit well under half of lineitem — a
    // degenerate filter that passes everything (broken bytes, fpp→1)
    // fails here even though the join output would be unchanged.
    // (Catalyst propagates the probe to the dim side too, so pick the
    // FilterExec whose subtree scans lineitem.)
    val t = Tables(spark, dir)
    val total = t.lineitem.count()
    val bloomFiltered = flatten(df.queryExecution.executedPlan).collectFirst {
      case f: FilterExec
          if f.condition.find(_.isInstanceOf[BloomMightContain]).isDefined &&
            scansLineitem(f) => f
    }
    assert(bloomFiltered.isDefined, s"no bloom filter over lineitem:\n${plan.take(3000)}")
    val probeOut = bloomFiltered.get.metrics("numOutputRows").value
    assert(probeOut > 0 && probeOut < total / 2,
      s"bloom probe admitted $probeOut of $total lineitem rows — not selective")
    // and pruning is semantically invisible: identical aggregate without it
    val dim = t.orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val plainRows = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .collect()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(keyed(got) === keyed(plainRows))
  }

  test("property: bloom_might_contain has NO false negatives and a bounded fp rate") {
    import graft.functions.SketchExpressions.bloomMightContain
    import org.apache.spark.util.sketch.BloomFilter
    val rnd = new scala.util.Random(20260814L)
    val members = Array.fill(5000)(rnd.nextLong()).distinct
    val bf = BloomFilter.create(members.length, 0.01)
    members.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    val memberSet = members.toSet
    val others = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(20000).toArray
    val s = spark
    import s.implicits._
    // evaluated THROUGH the expression (codegen path), not the driver API
    val probed = (members ++ others).toSeq.toDF("k")
      .withColumn("hit", bloomMightContain(col("k"), bytes))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // the join-safety contract: every member MUST hit
    members.foreach(m => assert(probed(m), s"false negative for member $m"))
    // and the fp rate stays near the configured 1%
    val fps = others.count(probed(_))
    assert(fps < others.length * 0.03,
      s"false-positive rate ${fps.toDouble / others.length} far above configured 1%")
  }
}
