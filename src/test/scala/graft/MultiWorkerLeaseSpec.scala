package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import graft.streaming.{LeaseWorker, ShardLeases}

/** The between-workers contract of the lease table (ShardLeases): a fleet
  * of readers over ONE stream dir must split shards fairly on join,
  * hand records over with no loss and no duplicate, and survive worker
  * death by resuming a dead worker's shards from the checkpoints in the
  * lease table — the reference's 20-worker KCL deployment semantics
  * (failoverTimeMillis / DynamoDB lease table), tick-driven here so
  * every interleaving is deterministic.
  */
class MultiWorkerLeaseSpec extends SparkSpec {

  private val FAILOVER = 1000L

  /** One scenario harness: stream dir + lease dir + manual clock + a
    * per-worker processed-record log keyed (worker, shard) → seq→line. */
  private class Fixture(nShards: Int) {
    val streamDir: String = Files.createTempDirectory("graft-mw-stream").toString
    val leaseDir: String = Files.createTempDirectory("graft-mw-lease").toString
    var clockMs: Long = 100000L
    val processed = mutable.Map[(String, String), mutable.Buffer[(Long, String)]]()

    def appendAll(lines: Int, tag: String): Unit =
      (0 until nShards).foreach { i =>
        val f = Paths.get(streamDir, s"shard-$i.txt")
        val cur = if (Files.exists(f)) new String(Files.readAllBytes(f)) else ""
        val start = cur.count(_ == '\n')
        val body = (0 until lines).map(j => s"$tag-s$i-${start + j}\n").mkString
        Files.write(f, (cur + body).getBytes)
      }

    def worker(id: String): LeaseWorker =
      new LeaseWorker(id, streamDir, leaseDir, FAILOVER, 1000, () => clockMs,
        (shard, from, recs) => {
          val buf = processed.getOrElseUpdate((id, shard), mutable.Buffer.empty)
          recs.zipWithIndex.foreach { case (r, k) => buf += ((from + k, r)) }
        })

    /** All sequences processed for `shard`, across every worker. */
    def seqsOf(shard: String): Seq[Long] =
      processed.collect { case ((_, s), buf) if s == shard => buf.map(_._1) }
        .flatten.toSeq.sorted
  }

  test("join rebalances 4 shards to a 2/2 split via graceful handoff, no loss, no dup") {
    val fx = new Fixture(4)
    fx.appendAll(10, "a")
    val w1 = fx.worker("w1")
    val w2 = fx.worker("w2")

    // alone, w1's fair share is all 4 shards; it drains everything
    w1.tick(); fx.clockMs += 10
    assert(w1.ownedShards.size === 4)
    (0 until 4).foreach(i => assert(fx.seqsOf(s"shard-$i.txt") === (0L until 10L)))

    // w2 joins: it cannot claim a live lease — it marks wantedBy (one per
    // tick) and the over-share incumbent releases at its batch boundary
    w2.tick(); fx.clockMs += 10 // mark #1
    assert(w2.ownedShards.isEmpty, "must not steal a live lease outright")
    w1.tick(); fx.clockMs += 10 // sees the marker, releases one
    w2.tick(); fx.clockMs += 10 // claims the freed shard, marks another
    w1.tick(); fx.clockMs += 10 // releases the second
    w2.tick(); fx.clockMs += 10 // claims it; fleet is balanced

    assert(w1.ownedShards.size === 2, s"w1 owns ${w1.ownedShards}")
    assert(w2.ownedShards.size === 2, s"w2 owns ${w2.ownedShards}")
    assert((w1.ownedShards & w2.ownedShards).isEmpty)

    // records that arrive after the rebalance drain on BOTH sides, each
    // worker resuming its shards exactly at the handed-over checkpoint
    fx.appendAll(10, "b")
    w1.tick(); fx.clockMs += 10
    w2.tick(); fx.clockMs += 10

    // every shard saw sequences 0..19 exactly once across the fleet —
    // the handoff lost nothing and re-read nothing
    (0 until 4).foreach { i =>
      assert(fx.seqsOf(s"shard-$i.txt") === (0L until 20L),
        s"shard-$i sequences across workers")
    }
    // the shards w2 picked up were entered exactly at the released
    // checkpoint (sequence 10), not from 0 — checkpoint-in-table handoff
    w2.ownedShards.foreach { s =>
      val w2seqs = fx.processed(("w2", s)).map(_._1)
      assert(w2seqs === (10L until 20L).toBuffer, s"w2 drained $s: $w2seqs")
    }
  }

  test("worker death: survivor takes over expired leases from their checkpoints") {
    val fx = new Fixture(4)
    fx.appendAll(10, "a")
    val w1 = fx.worker("w1")
    val w2 = fx.worker("w2")

    // reach the 2/2 split (same dance as above)
    w1.tick(); fx.clockMs += 10
    w2.tick(); fx.clockMs += 10
    w1.tick(); fx.clockMs += 10
    w2.tick(); fx.clockMs += 10
    w1.tick(); fx.clockMs += 10
    w2.tick(); fx.clockMs += 10
    assert(w1.ownedShards.size === 2 && w2.ownedShards.size === 2)

    // both drain the next tranche, then w2 dies (stops ticking)
    fx.appendAll(10, "b")
    w1.tick(); fx.clockMs += 10
    w2.tick(); fx.clockMs += 10
    val w2Shards = w2.ownedShards

    // within the failover window the leases are still w2's: w1 must not touch them
    fx.appendAll(10, "c")
    w1.tick(); fx.clockMs += 10
    assert(w1.ownedShards.size === 2)
    w2Shards.foreach { s =>
      assert(ShardLeases.read(fx.leaseDir, s).owner === "w2")
      assert(fx.seqsOf(s) === (0L until 20L), s"$s must pause at w2's checkpoint")
    }

    // past failoverTimeMillis the heartbeats are stale: w1 takes over and
    // resumes exactly at the checkpoints w2 committed (sequence 20)
    fx.clockMs += FAILOVER + 1
    w1.tick(); fx.clockMs += 10
    assert(w1.ownedShards.size === 4, s"survivor owns ${w1.ownedShards}")
    (0 until 4).foreach { i =>
      assert(fx.seqsOf(s"shard-$i.txt") === (0L until 30L),
        s"shard-$i sequences after takeover")
    }
    // on w2's shards, w1 processed 0..9 before the split and then NOTHING
    // until the takeover batch 20..29 — w2's tranche was never re-read
    w2Shards.foreach { s =>
      val w1seqs = fx.processed(("w1", s)).map(_._1).filter(_ >= 10L)
      assert(w1seqs === (20L until 30L).toBuffer, s"w1 post-split on $s: $w1seqs")
    }
  }

  test("reshard: a shard that appears later gets a lease and an owner") {
    val fx = new Fixture(2)
    fx.appendAll(5, "a")
    val w1 = fx.worker("w1")
    w1.tick(); fx.clockMs += 10
    assert(w1.ownedShards.size === 2)

    // a new shard file appears (split); the next tick builds its lease row
    // and claims it from sequence 0
    Files.write(Paths.get(fx.streamDir, "shard-2.txt"), "n-s2-0\nn-s2-1\n".getBytes)
    w1.tick(); fx.clockMs += 10
    assert(w1.ownedShards.contains("shard-2.txt"))
    assert(fx.seqsOf("shard-2.txt") === (0L until 2L))
  }

  test("fleet drives the kayvee pipeline: union of per-worker projections == one batch pass") {
    // the multi-worker O1→O13 story: each worker's drained batch enters
    // the SAME parse → route → project path the streaming query runs
    // (StreamPipeline.metrics); with records split across workers and a
    // mid-stream rebalance, the union of everyone's projected dd rows
    // must equal a single-pass batch projection of all lines — shard
    // ownership is a delivery concern, invisible in the data
    import SharedSpark.spark.implicits._
    def line(shard: Int, seq: Int): String =
      s"""2017-08-15T18:39:07.000000+00:00 host-$shard production--my-app/arn[33]: {"district":"d$shard-$seq","value":$seq,"_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"oauth.login_start","dimensions":["district"],"stat_type":"counter","value_field":"value","rule":"login-start"}]}}"""

    val streamDir = Files.createTempDirectory("graft-mw-pipe").toString
    val leaseDir = Files.createTempDirectory("graft-mw-pipe-lease").toString
    (0 until 2).foreach { i =>
      Files.write(Paths.get(streamDir, s"shard-$i.txt"),
        (0 until 3).map(j => line(i, j) + "\n").mkString.getBytes)
    }
    var clockMs = 100000L
    val projected = mutable.Buffer[String]()
    def worker(id: String) =
      new LeaseWorker(id, streamDir, leaseDir, FAILOVER, 1000, () => clockMs,
        (_, _, recs) => {
          val dd = graft.streaming.StreamPipeline
            .metrics(recs.toDF("raw"), "test-env").dd
          projected ++= dd.collect().map(_.toString)
        })

    val w1 = worker("w1")
    val w2 = worker("w2")
    w1.tick(); clockMs += 10 // w1 drains both shards' first tranche
    w2.tick(); clockMs += 10 // join: mark
    w1.tick(); clockMs += 10 // release one
    w2.tick(); clockMs += 10 // claim it
    // second tranche lands after the rebalance; each side drains its own
    (0 until 2).foreach { i =>
      val f = Paths.get(streamDir, s"shard-$i.txt")
      Files.write(f, (3 until 6).map(j => line(i, j) + "\n").mkString.getBytes,
        java.nio.file.StandardOpenOption.APPEND)
    }
    w1.tick(); clockMs += 10
    w2.tick(); clockMs += 10
    assert(w1.ownedShards.size === 1 && w2.ownedShards.size === 1)

    val allLines = (0 until 2).flatMap(i => (0 until 6).map(j => line(i, j)))
    val expect = graft.streaming.StreamPipeline
      .metrics(allLines.toDF("raw"), "test-env").dd
      .collect().map(_.toString)
    assert(projected.sorted === expect.toSeq.sorted)
    assert(projected.size === 12)
  }

  test("threaded soak: concurrent workers with a real clock lose nothing") {
    // the tick specs above pin exact interleavings; this drives REAL
    // concurrency — two workers on their own threads, wall-clock
    // heartbeats, records arriving while leases move. The lease protocol
    // is at-least-once under contention (a claim race can re-deliver a
    // batch before the loser notices), so the soak asserts the lossless
    // half exactly — every (shard, seq) processed at least once, every
    // processed line matches the shard file — and that any duplicate is
    // an identical re-delivery, never a corruption.
    val nShards = 4
    val streamDir = Files.createTempDirectory("graft-mw-soak").toString
    val leaseDir = Files.createTempDirectory("graft-mw-soak-lease").toString
    def append(lines: Int, tag: String): Unit =
      (0 until nShards).foreach { i =>
        val f = Paths.get(streamDir, s"shard-$i.txt")
        val cur = if (Files.exists(f)) new String(Files.readAllBytes(f)) else ""
        val start = cur.count(_ == '\n')
        Files.write(f,
          (cur + (0 until lines).map(j => s"$tag-s$i-${start + j}\n").mkString).getBytes)
      }
    append(20, "a")
    val processed = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, String, Long, String)]()
    val dups = new java.util.concurrent.atomic.AtomicLong()
    val seen = new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()
    def worker(id: String) =
      new LeaseWorker(id, streamDir, leaseDir, failoverMillis = 600, 1000,
        () => System.currentTimeMillis(),
        (shard, from, recs) => recs.zipWithIndex.foreach { case (r, k) =>
          processed.add((id, shard, from + k, r))
          val prev = seen.putIfAbsent((shard, from + k), r)
          if (prev != null) {
            dups.incrementAndGet()
            assert(prev === r, s"duplicate delivery of $shard/${from + k} differs")
          }
        })
    val w1 = worker("s1")
    val w2 = worker("s2")
    @volatile var stop = false
    val threads = Seq(w1, w2).map { w =>
      new Thread(() => {
        while (!stop) { w.tick(); Thread.sleep(40) }
      })
    }
    threads.foreach(_.start())
    try {
      Thread.sleep(500)
      append(20, "b")
      Thread.sleep(500)
      append(20, "c")
      // drain with a deadline, not a fixed sleep — steal/GC pauses on a
      // contended host must not flake the coverage assertion
      val deadline = System.currentTimeMillis() + 15000
      while (seen.size < nShards * 60 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally {
      stop = true
      threads.foreach(_.join(5000))
    }
    // lossless: every appended record was processed by someone
    (0 until nShards).foreach { i =>
      val got = seen.keySet().toArray(Array.empty[(String, Long)])
        .collect { case (s, q) if s == s"shard-$i.txt" => q }.sorted.toSeq
      assert(got === (0L until 60L), s"shard-$i coverage: $got (dups=${dups.get()})")
    }
    // the fleet actually split the work (both workers processed records)
    val workersSeen = processed.toArray(Array.empty[(String, String, Long, String)])
      .map(_._1).distinct
    assert(workersSeen.toSet === Set("s1", "s2"), workersSeen.mkString(","))
  }

  test("restart under the same worker id reclaims its own leases immediately") {
    // the normal crash-recovery / redeploy path: the dead incarnation's
    // leases still carry this workerId with fresh-looking heartbeats; the
    // new incarnation must take them back WITHOUT waiting out failover
    // (no other worker may hold this id), resuming from the committed
    // checkpoints — without the own-lease arm a solo restart deadlocks
    // the stream forever
    val fx = new Fixture(4)
    fx.appendAll(10, "a")
    val w1 = fx.worker("w1")
    w1.tick(); fx.clockMs += 10
    assert(w1.ownedShards.size === 4)
    // crash: a fresh instance, same id, leases still fresh (clock barely moved)
    val w1b = fx.worker("w1")
    fx.appendAll(10, "b")
    w1b.tick(); fx.clockMs += 10
    assert(w1b.ownedShards.size === 4, s"reclaimed ${w1b.ownedShards}")
    (0 until 4).foreach { i =>
      assert(fx.seqsOf(s"shard-$i.txt") === (0L until 20L),
        s"shard-$i must resume at the old incarnation's checkpoint")
    }
  }

  test("drain I/O is O(appended): a tick reads the suffix, not the file") {
    val fx = new Fixture(1)
    fx.appendAll(1000, "a")
    val w1 = fx.worker("w1")
    w1.tick(); fx.clockMs += 10
    val fullScan = w1.bytesRead.get()
    assert(fullScan > 5000L, s"first drain should read the whole shard: $fullScan")
    fx.appendAll(5, "b")
    w1.tick(); fx.clockMs += 10
    val delta = w1.bytesRead.get() - fullScan
    // 5 appended lines ≈ 60 bytes; a full re-read would be >10 KB
    assert(delta < 1000L, s"second drain re-read $delta bytes")
    assert(fx.seqsOf("shard-0.txt") === (0L until 1005L))
  }

  test("lease rows survive the file round-trip and reject hostile ids") {
    val l = ShardLeases.Lease("shard-0.txt", "w-1", 7L, 123L, 42L, "w.2", 99L)
    assert(ShardLeases.parse(l.json) === l)
    intercept[IllegalArgumentException] {
      ShardLeases.requireId("""w1","owner":"evil""")
    }
  }
}
