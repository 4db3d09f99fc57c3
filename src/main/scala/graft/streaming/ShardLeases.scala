package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.mutable

/** Multi-worker shard leases — the KCL consumption model the reference
  * deploys as a FIXED FLEET sharing one stream: 20 workers
  * (`launch/kinesis-alerts-consumer-us-west-2.yml:15-16`, min=max=20)
  * coordinate shard ownership through a DynamoDB lease table named by
  * `applicationName`, with failover after a lease holder stops renewing
  * (`consumer.properties.template:10-13,38` — `failoverTimeMillis`,
  * default 10 s). kinesis-lite's single-consumer source covers one
  * worker's read path; this file adds the BETWEEN-workers contract:
  *
  *  - the lease table is a directory: one file per shard
  *    (`<shard>.lease`), carrying (owner, counter, heartbeatAt,
  *    checkpoint, wantedBy) — the exact fields a KCL DynamoDB lease item
  *    carries (leaseOwner / leaseCounter / checkpoint), `wantedBy` being
  *    the graceful-handoff marker;
  *  - every write is tmp-file + atomic rename, the same
  *    compare-and-swap-by-rename discipline as the kinesis-lite
  *    checkpoint offsets — readers never observe a torn lease;
  *  - the per-shard CHECKPOINT lives in the lease file, not in any
  *    worker: takeover resumes exactly where the previous owner
  *    committed, which is what makes worker death lossless;
  *  - fair share is ceil(shards / live workers), where "live" is
  *    derived from fresh heartbeats in the table itself — there is no
  *    central membership service, exactly like the KCL;
  *  - a joining worker under its fair share never steals a LIVE lease
  *    outright: it writes `wantedBy` and the over-share owner releases
  *    at its next batch boundary (owner="", checkpoint committed), so
  *    rebalance hands records over with no loss and no duplicate — the
  *    graceful handoff newer KCLs implement; hard takeover happens only
  *    when a heartbeat is older than `failoverMillis` (a dead worker
  *    cannot be mid-batch, so that path is lossless too);
  *  - a worker that crashes mid-batch (processed but not yet
  *    checkpointed) is re-delivered from the last checkpoint on
  *    takeover — at-least-once, the KCL contract.
  *
  * Scale: lease traffic is O(shards) tiny files touched once per
  * heartbeat, independent of record volume; workers never communicate
  * except through the table. The production deployment swaps the file
  * directory for the real DynamoDB table; everything above the storage
  * primitive is the same state machine.
  */
object ShardLeases {

  /** One shard's lease row. `owner == ""` means unowned (free);
    * `checkpoint` is the next sequence to read (records below it are
    * committed); `wantedBy` is a standing graceful-handoff request. */
  final case class Lease(
      shard: String, owner: String, counter: Long,
      heartbeatAt: Long, checkpoint: Long, wantedBy: String, wantedAt: Long) {
    def json: String =
      s"""{"shard":"$shard","owner":"$owner","counter":$counter,""" +
        s""""heartbeatAt":$heartbeatAt,"checkpoint":$checkpoint,""" +
        s""""wantedBy":"$wantedBy","wantedAt":$wantedAt}"""
  }

  // Owner / worker ids share the shard-name discipline (strict charset):
  // they are spliced into hand-parsed JSON, so confine them up front.
  private val IdPattern = "[A-Za-z0-9_.-]+".r
  def requireId(id: String): String = {
    require(IdPattern.matches(id), s"worker id must match ${IdPattern.regex}: '$id'")
    id
  }

  private def field(body: String, key: String): String = {
    val m = ("\"" + key + "\":(\"[^\"]*\"|[-0-9]+)").r.findFirstMatchIn(body)
      .getOrElse(throw new IllegalArgumentException(s"lease missing $key: $body"))
    m.group(1).stripPrefix("\"").stripSuffix("\"")
  }

  def parse(json: String): Lease = Lease(
    shard = field(json, "shard"),
    owner = field(json, "owner"),
    counter = field(json, "counter").toLong,
    heartbeatAt = field(json, "heartbeatAt").toLong,
    checkpoint = field(json, "checkpoint").toLong,
    wantedBy = field(json, "wantedBy"),
    wantedAt = field(json, "wantedAt").toLong)

  def leaseFile(leaseDir: String, shard: String): java.io.File =
    new java.io.File(leaseDir, s"$shard.lease")

  /** Read one lease; an absent, empty, or torn file reads as a free lease
    * at checkpoint 0 (the pre-creation state — benign, because claiming is
    * itself a lease write that the next read observes). */
  def read(leaseDir: String, shard: String): Lease = {
    val f = leaseFile(leaseDir, shard)
    if (!f.exists() || f.length() == 0L)
      Lease(shard, owner = "", counter = 0L, heartbeatAt = 0L, checkpoint = 0L,
        wantedBy = "", wantedAt = 0L)
    else
      try parse(new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
      catch {
        case _: IllegalArgumentException =>
          Lease(shard, owner = "", counter = 0L, heartbeatAt = 0L, checkpoint = 0L,
            wantedBy = "", wantedAt = 0L)
      }
  }

  /** Atomic lease write: private tmp file (worker-unique, so concurrent
    * writers never share a tmp) + rename onto the lease file. */
  def write(leaseDir: String, lease: Lease, writerId: String): Unit = {
    val dir = Paths.get(leaseDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".${lease.shard}.lease.tmp-$writerId")
    Files.write(tmp, lease.json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, leaseFile(leaseDir, lease.shard).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** All lease rows for the stream's current shard set, creating missing
    * lease files (free, checkpoint 0) for shards that appeared since the
    * table was built — the reshard path. Creation races are benign: the
    * empty/absent file already reads as the same free lease. */
  def table(streamDir: String, leaseDir: String, writerId: String): Seq[Lease] =
    KinesisLiteSource.shardFiles(streamDir).map { f =>
      val shard = f.getName
      val lf = leaseFile(leaseDir, shard)
      val l = read(leaseDir, shard)
      if (!lf.exists()) write(leaseDir, l, writerId)
      l
    }
}

/** One worker of the fleet. Single-threaded and tick-driven: each
  * [[tick]] is one heartbeat + rebalance + drain cycle (the KCL worker
  * loop), so a spec can interleave workers deterministically and a
  * deployment can run one thread per worker calling tick on a cadence
  * well inside `failoverMillis`.
  *
  * `process(shard, fromSeq, records)` receives each drained batch BEFORE
  * its checkpoint commits — the at-least-once boundary sits exactly
  * where the KCL's record-processor checkpoint call sits.
  */
final class LeaseWorker(
    val workerId: String,
    streamDir: String,
    leaseDir: String,
    failoverMillis: Long,
    maxRecordsPerFetch: Int,
    clock: () => Long,
    process: (String, Long, Seq[String]) => Unit) {

  ShardLeases.requireId(workerId)

  private val owned = mutable.SortedSet[String]()

  def ownedShards: Set[String] = owned.toSet

  private def now(): Long = clock()

  private def fresh(l: ShardLeases.Lease): Boolean =
    l.owner.nonEmpty && (now() - l.heartbeatAt) <= failoverMillis

  /** Live workers per the table itself, plus self. Membership is derived,
    * not registered (the KCL way): fresh lease OWNERS are live, and so is
    * any `wantedBy` marker — a joining worker owns nothing yet, so its
    * standing handoff request IS its liveness announcement (without this
    * the incumbent would never compute a smaller fair share and never
    * release). Markers age like heartbeats (`wantedAt`): a wanter that
    * died before claiming stops counting after `failoverMillis`, so a
    * stale request can't deflate fair shares forever — the released lease
    * comes back as free and the under-share incumbent reclaims it. */
  private def wantFresh(l: ShardLeases.Lease): Boolean =
    l.wantedBy.nonEmpty && (now() - l.wantedAt) <= failoverMillis

  private def liveWorkers(table: Seq[ShardLeases.Lease]): Set[String] =
    table.filter(fresh).map(_.owner).toSet ++
      table.filter(wantFresh).map(_.wantedBy) + workerId

  private def fairShare(table: Seq[ShardLeases.Lease]): Int = {
    val workers = math.max(1, liveWorkers(table).size)
    (table.size + workers - 1) / workers
  }

  /** One worker-loop cycle: renew/release, then claim, then drain. */
  def tick(): Unit = {
    val table = ShardLeases.table(streamDir, leaseDir, workerId)
    renew(table)
    acquire(ShardLeases.table(streamDir, leaseDir, workerId))
    drain()
  }

  /** Heartbeat owned leases; notice losses; honor graceful-handoff
    * requests when over fair share (release at a batch boundary — this
    * method never runs mid-drain, so the checkpoint is committed). */
  private def renew(table: Seq[ShardLeases.Lease]): Unit = {
    val share = fairShare(table)
    owned.toSeq.foreach { shard =>
      val l = ShardLeases.read(leaseDir, shard)
      if (l.owner != workerId) { owned -= shard; readPos -= shard } // lost
      else if (wantFresh(l) && owned.size > share) {
        // release KEEPING the marker: it is the wanter's membership
        // evidence — clearing it here would let this worker's own acquire
        // pass see a 1-worker fleet and immediately reclaim the lease.
        // The CLAIMER clears it.
        ShardLeases.write(leaseDir,
          l.copy(owner = "", counter = l.counter + 1, heartbeatAt = now()),
          workerId)
        owned -= shard
        readPos -= shard
      } else
        ShardLeases.write(leaseDir,
          l.copy(counter = l.counter + 1, heartbeatAt = now()), workerId)
    }
  }

  /** Claim free/expired leases up to fair share; if still short and
    * nothing is claimable, ask the most-loaded live owner for one via
    * `wantedBy` (re-asserted every tick until satisfied — a concurrent
    * owner heartbeat may have overwritten the marker). A lease whose
    * owner is THIS workerId but absent from `owned` is a previous
    * incarnation's orphan (crash + restart under the same id — the
    * normal redeploy path): reclaimable immediately, without waiting out
    * failover, because no other worker may hold this id. Without that
    * arm, a solo worker restarting could never recover its own leases
    * (they fail both the free and the expired test forever). */
  private def acquire(table: Seq[ShardLeases.Lease]): Unit = {
    val share = fairShare(table)
    val claimable = table
      .filter(l => !owned.contains(l.shard))
      .filter(l => l.owner.isEmpty || l.owner == workerId || !fresh(l))
      .sortBy(_.shard)
    claimable.take(math.max(0, share - owned.size)).foreach { l =>
      ShardLeases.write(leaseDir,
        l.copy(owner = workerId, counter = l.counter + 1, heartbeatAt = now(),
          wantedBy = "", wantedAt = 0L),
        workerId)
      owned += l.shard
      readPos -= l.shard
    }
    if (owned.size < share) {
      val byOwner = table.filter(l => fresh(l) && l.owner != workerId)
        .groupBy(_.owner)
      if (byOwner.nonEmpty) {
        val (_, leases) = byOwner.maxBy { case (o, ls) => (ls.size, o) }
        leases.sortBy(_.shard).find(l => !wantFresh(l)).foreach { l =>
          // The marker write rewrites the WHOLE row, and `l` came from
          // this tick's table snapshot — an owner commit or release may
          // have landed since. Blindly writing the stale row would
          // REWIND the owner's checkpoint (duplicate redelivery) or
          // resurrect a just-released lease with an owner set until
          // failover expiry. So: re-read immediately before the write
          // and skip the tick if the row moved (counter is bumped by
          // every commit/heartbeat/release); the marker is re-asserted
          // next tick anyway. The remaining read→write microseconds are
          // the same window drain()'s fenced commit documents — the
          // DynamoDB conditional write closes both in production.
          val cur = ShardLeases.read(leaseDir, l.shard)
          if (cur.counter == l.counter && cur.owner == l.owner)
            ShardLeases.write(leaseDir,
              cur.copy(wantedBy = workerId, wantedAt = now()), workerId)
        }
      }
    }
  }

  // Per-shard resume position for drain: next sequence + its byte offset.
  // Purely an I/O cache — the authoritative checkpoint is the lease row —
  // but without it every drain re-reads the file from byte 0 and a
  // long-lived worker pays O(total stream) per tick instead of
  // O(appended). Evicted on claim/loss/release; a cache whose sequence
  // disagrees with the lease checkpoint falls back to a full skip-scan.
  private val readPos = mutable.Map[String, (Long, Long)]()

  /** Bytes consumed by [[drain]] reads — spec instrumentation for the
    * O(appended)-I/O contract (the shardEnd counter's sibling). */
  private[graft] val bytesRead = new java.util.concurrent.atomic.AtomicLong()

  /** Read lines [fromSeq, toSeq) of `f` as UTF-8, resuming from the cached
    * byte offset when it matches fromSeq. Caches the end position only
    * when the last consumed byte was a newline: an unterminated trailing
    * line may still be appended to, so resuming past its START would
    * misread the completed record (shardEnd has the same partial-line
    * subtlety; dropping the cache forces a clean rescan instead). */
  private def readLines(f: java.io.File, shard: String,
      fromSeq: Long, toSeq: Long): Vector[String] = {
    val (startSeq, startOff) = readPos.get(shard) match {
      case Some((s, o)) if s == fromSeq => (s, o)
      case _                            => (0L, 0L)
    }
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
    try {
      var toSkip = startOff
      while (toSkip > 0) { val n = in.skip(toSkip); if (n <= 0) toSkip = 0 else toSkip -= n }
      val out = Vector.newBuilder[String]
      val line = new java.io.ByteArrayOutputStream()
      var seq = startSeq
      var consumed = 0L
      var endedOnNewline = true
      var b = in.read()
      while (b != -1 && seq < toSeq) {
        consumed += 1
        if (b == '\n') {
          if (seq >= fromSeq) out += new String(line.toByteArray, StandardCharsets.UTF_8)
          line.reset()
          seq += 1
          endedOnNewline = true
          b = if (seq < toSeq) in.read() else -1
        } else {
          line.write(b)
          endedOnNewline = false
          b = in.read()
        }
      }
      // unterminated trailing line counts as a record (shardEnd parity)
      if (b == -1 && line.size() > 0 && seq >= fromSeq && seq < toSeq) {
        out += new String(line.toByteArray, StandardCharsets.UTF_8)
        seq += 1
      }
      bytesRead.addAndGet(consumed)
      if (endedOnNewline) readPos(shard) = (seq, startOff + consumed)
      else readPos -= shard
      out.result()
    } finally in.close()
  }

  /** Read each owned shard from its lease checkpoint (capped by the
    * per-fetch budget, the GetRecords cap), hand the batch to `process`,
    * then commit the new checkpoint into the lease — checkpoint-after-
    * process, the at-least-once order. The commit is FENCED on the lease
    * counter: if the row changed since the batch was read (a hard
    * takeover by a peer while this worker was paused mid-batch), the
    * commit is dropped and the shard forgotten instead of blindly
    * rewriting ownership and regressing the peer's checkpoint. File
    * renames cannot make the read-verify-write atomic, so a microsecond
    * window remains — here AND in acquire()'s wantedBy marker write,
    * which re-reads-then-writes under the same discipline — the DynamoDB
    * conditional write closes both in production; the state machine
    * above is unchanged. */
  private def drain(): Unit =
    owned.toSeq.foreach { shard =>
      val f = new java.io.File(streamDir, shard)
      val end = KinesisLiteSource.shardEnd(f)
      val l = ShardLeases.read(leaseDir, shard)
      if (l.owner == workerId && end > l.checkpoint) {
        val to = math.min(end, l.checkpoint + maxRecordsPerFetch)
        val records = readLines(f, shard, l.checkpoint, to)
        process(shard, l.checkpoint, records)
        val l2 = ShardLeases.read(leaseDir, shard)
        if (l2.owner == workerId && l2.counter == l.counter)
          ShardLeases.write(leaseDir,
            l.copy(counter = l.counter + 1, heartbeatAt = now(), checkpoint = to),
            workerId)
        else { // fenced out mid-batch: the peer's checkpoint stands
          owned -= shard
          readPos -= shard
        }
      }
    }
}
