package graft.plans

import org.apache.spark.sql.DataFrame

/** Pre-force plan registry for the eager-leaf lanes.
  *
  * Lanes that force their declared output inside a Bench.phase (the
  * attribution contract: the caller's action must be a cache read, not
  * an unattributed tail) return a `localCheckpoint(true)` leaf — which
  * made their entry in the plans artifact a bare `Scan ExistingRDD`,
  * hiding exactly the serve plan the audit exists to review (through
  * round 19 those plans were only visible via their specs' captured
  * strings). A forced lane now registers its UN-forced frame here right
  * before checkpointing; `graft.tools.ExplainAudit` audits the
  * registered frame when present, so the artifact shows the real serve
  * plan and the BNLJ build-side machine check runs over it too.
  *
  * The registered frame is the same logical plan the checkpoint
  * materialized — registering it costs nothing at run time (no action);
  * only ExplainAudit ever plans it.
  */
object AuditFrames {
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Register `pre` as the auditable plan for lane `name`; returns `pre`
    * so call sites can stay expression-shaped. */
  def put(name: String, pre: DataFrame): DataFrame = {
    frames.put(name, pre)
    pre
  }

  /** The registered object has usually been EXECUTED by the forcing
    * checkpoint (same QueryExecution): its AQE plan is finalized and
    * `executedPlan.toString` then prints BOTH the final and the initial
    * plan sections — doubling every node count a plan-guard greps for.
    * Hand back a fresh wrapper over the same analyzed logical plan
    * instead: one pristine, unexecuted QueryExecution (the extra
    * Project(*) is plan-shape-neutral). */
  def get(name: String): Option[DataFrame] =
    Option(frames.get(name))
      .map(_.select(org.apache.spark.sql.functions.col("*")))

  /** ExplainAudit clears between lanes so a stale registration from a
    * previous lane (or a helper invoked with another lane's prefix)
    * can't be mistaken for this lane's plan. */
  def clear(): Unit = frames.clear()

  /** The eager-leaf idiom in one call: time `pre`'s materialization into
    * Bench.phase "<lane>.<phaseName>", register the un-forced plan for
    * the audit, and hand back the checkpoint leaf the caller's action
    * reads from cache. ONLY for the lane's declared output (forcing a
    * spec-only arm charges never-declared work to the headline —
    * the round-17 q_graph_compact regression). */
  def forced(lane: String, phaseName: String)(pre: => DataFrame): DataFrame =
    graft.Bench.phase(s"$lane.$phaseName") {
      put(lane, pre).localCheckpoint(true)
    }
}
