package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Block-manager hygiene for iterate-to-ε loops that localCheckpoint a
  * frame per round: Dataset.unpersist only clears CacheManager entries,
  * so releasing a ROUND's blocks needs the checkpointed RDD itself.
  * localCheckpoint rewrites the logical plan to a LogicalRDD leaf, which
  * carries that RDD — the pattern shared by the pagerank and BPE training
  * loops (each round unpersists the previous round's blocks as soon as
  * the new round has materialized). */
object Checkpoints {
  /** The RDD a localCheckpoint'd frame caches its rows in; None for any
    * other plan shape. */
  def checkpointedRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
