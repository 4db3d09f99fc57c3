package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** MaxScore/WAND bounded BM25 serving (round-16 verdict item 3): the
  * pruning must be SAFE — exactly the one-shot top-10, never an
  * approximation — and must actually PRUNE when the term statistics
  * allow it. The uniform fixture may or may not trip the threshold
  * (that's data); the planted corpus here guarantees both branches are
  * exercised: a dominant term whose candidates alone lock the top-10
  * (prune fires, other lists never generate candidates) and the exact
  * same serve over the fixture (prune may not fire; result still
  * bit-equal).
  */
class Bm25WandSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the fixed 3-term query every BM25 lane serves (bm25Terms is
  // package-private; mirrored here)
  private val qTerms = Seq("join", "filter", "scan")

  test("fixture: bounded serve equals the one-shot top-10 bit-for-bit; scored set is bounded") {
    val r = TextQueries.bm25WandServe(spark, dir)
    val oneShot = TextQueries.bm25ScoredDocs(Tables(spark, dir).documents)
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
      .collect().map(_.toSeq)
    assert(r.served.collect().map(_.toSeq).toSeq === oneShot.toSeq,
      "MaxScore serving diverged from the one-shot top-10")
    // the bounded quantity: docs fully scored vs the one-shot's
    // every-candidate set
    val full = Tables(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(qTerms: _*))
      .select(col("doc_id")).distinct().count()
    assert(r.nScored <= full)
    assert(r.rounds >= 1 && r.rounds <= qTerms.length)
    info(s"fixture: rounds=${r.rounds} essential=${r.essential.mkString(",")} " +
      s"scored=${r.nScored} of $full")
    Bench.cleanup(spark)
  }

  test("stored ubounds dominate every per-doc term score in the epoch") {
    val r = TextQueries.bm25WandServe(spark, dir)
    val p = spark.table(r.postingsTbl)
    val d = spark.read.parquet(s"${r.epochPath}/docstats")
    val ub = spark.read.parquet(s"${r.epochPath}/ubounds")
    val dfAll = p.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = d.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val viol = p.join(broadcast(dfAll), "token").join(d, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("token"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75)
              + lit(0.75) * col("dl") / col("avgdl")))).as("s"))
      .join(ub, "token")
      .filter(col("s") > col("ub"))
      .count()
    assert(viol === 0L, "a term score exceeded its stored upper bound")
    Bench.cleanup(spark)
  }

  test("planted skew: pruning fires (not all lists generate) and the result is still exact") {
    val sess = spark; import sess.implicits._
    // 12 docs stuffed with the dominant term (plus one occurrence of the
    // others, so their full scores dwarf anything a filter/scan-only doc
    // can reach), and 60 long docs holding a single low-tf 'filter' or
    // 'scan' — the MaxScore textbook case: θ from the join list alone
    // exceeds U(filter)+U(scan)
    val pad = (1 to 30).map(i => s"pad$i").mkString(" ")
    val docs = (
      (0 until 12).map(i =>
        (i.toLong, ("join " * 10) + "filter scan here")) ++
      (0 until 60).map(i =>
        (100L + i, s"${if (i % 2 == 0) "filter" else "scan"} $pad $pad"))
    ).toDF("doc_id", "text")
    val r = TextQueries.bm25WandServeDocs(spark, docs)
    assert(r.rounds < qTerms.length,
      s"planted skew did not trip the prune (rounds=${r.rounds}) — the bounded path was not exercised")
    val oneShot = TextQueries.bm25ScoredDocs(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
      .collect().map(_.toSeq)
    assert(r.served.collect().map(_.toSeq).toSeq === oneShot.toSeq,
      "pruned serving diverged from the one-shot on the planted corpus")
    // and the bound is real: fewer docs scored than hold any query term
    assert(r.nScored === 12L,
      s"essential generation should score exactly the 12 dominant docs, got ${r.nScored}")
    Bench.cleanup(spark)
  }

  test("stale pre-delete ubounds are UNSAFE: a takedown can push a survivor above its old bound") {
    val sess = spark; import sess.implicits._
    // the counterexample that makes the compact-time refresh mandatory:
    // 'join' sits in docs 0..4 (tf=1, deleted) and doc 5 (tf=3,
    // survives) — the takedown drops df 6→1 while n_docs only drops
    // 12→7, so IDF jumps, and doc 5's full term score under the
    // SURVIVOR statistics exceeds the stale pre-delete maximum
    val docs = (
      (0 until 5).map(i => (i.toLong, "join alpha beta")) ++
      Seq((5L, "join join join gamma")) ++
      (6 until 12).map(i => (i.toLong, "delta epsilon zeta eta"))
    ).toDF("doc_id", "text")
    val surv = docs.filter(col("doc_id") > 4)
    def ubOf(d: org.apache.spark.sql.DataFrame): Double = {
      val (p, ds, _) = TextQueries.bm25Parts(d)
      TextQueries.bm25Ubounds(p, ds)
        .filter(col("token") === "join").head().getDouble(1)
    }
    val stale = ubOf(docs)
    val fresh = ubOf(surv)
    assert(fresh > stale,
      f"expected the survivor bound to exceed the stale one (stale=$stale%.4f fresh=$fresh%.4f)")
    // and the violation is per-doc real: doc 5's term score under the
    // survivor epoch exceeds the stale artifact — pruning against it
    // could drop a true top-k doc
    info(f"stale ub=$stale%.4f, post-delete max term score=$fresh%.4f")
    Bench.cleanup(spark)
  }

  test("delete-composed lane: refreshed bounds dominate the survivor epoch; serve is the survivor one-shot") {
    val (del, r) = TextQueries.bm25WandDeleteServe(spark, dir)
    // exactness over the SURVIVOR corpus — the shared-oracle claim
    val oneShot = TextQueries.bm25ScoredDocs(
        Tables(spark, dir).documents.filter(pmod(col("doc_id"), lit(10)) =!= 7))
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
      .collect().map(_.toSeq)
    assert(r.served.collect().map(_.toSeq).toSeq === oneShot.toSeq,
      "delete-composed MaxScore serving diverged from the survivor one-shot")
    // the refreshed artifact dominates every term score IN THE EPOCH —
    // the domination test of the flat lane, now over survivor statistics
    val p = spark.table(r.postingsTbl)
    val d = spark.read.parquet(s"${r.epochPath}/docstats")
    val ub = spark.read.parquet(s"${r.epochPath}/ubounds")
    val viol = TextQueries.bm25Ubounds(p.select(col("doc_id"), col("token"), col("tf")),
        d.select(col("doc_id"), col("dl")))
      .withColumnRenamed("ub", "fresh")
      .join(ub, "token")
      .filter(col("fresh") > col("ub"))
      .count()
    assert(viol === 0L, "the stored ubounds artifact is not the survivor-derived one")
    // no tombstoned doc serves, and the epoch is the delete lane's
    assert(r.epochPath === del.epochPath)
    assert(r.served.filter(pmod(col("doc_id"), lit(10)) === 7).count() === 0L)
    Bench.cleanup(spark)
  }

  test("adversarial boundary sweep: exactness holds across tf/length mixes") {
    val sess = spark; import sess.implicits._
    // deterministic mini-corpora mixing tfs, lengths and term overlaps —
    // the shapes where a wrong tie-break or an unfloored threshold
    // comparison would surface as a top-10 mismatch
    (0 until 5).foreach { seed =>
      val docs = (0 until 40).map { i =>
        val j = (i * 7 + seed * 13) % 5
        val body = Seq.fill(j + 1)("join").mkString(" ") +
          (if (i % 3 == 0) " filter" else "") +
          (if (i % 4 == 0) " scan scan" else "") +
          " " + Seq.fill((i * 11 + seed) % 17)("x").mkString(" ")
        (i.toLong, body)
      }.toDF("doc_id", "text")
      val r = TextQueries.bm25WandServeDocs(spark, docs)
      val oneShot = TextQueries.bm25ScoredDocs(docs)
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
        .collect().map(_.toSeq)
      assert(r.served.collect().map(_.toSeq).toSeq === oneShot.toSeq,
        s"mismatch at seed=$seed (rounds=${r.rounds})")
    }
    Bench.cleanup(spark)
  }
}
