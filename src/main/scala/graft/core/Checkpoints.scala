package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block management for per-round `localCheckpoint` loops.
  *
  * `Dataset.unpersist` only reaches cache-manager entries — the blocks
  * a localCheckpoint stores belong to the underlying RDD and are
  * otherwise freed only when the driver's ContextCleaner notices the
  * RDD is garbage (GC-timing-dependent). An iterative operator that
  * checkpoints every round therefore accrues O(sum of round sizes)
  * storage on adversarial inputs (a long path peels in O(n) k-core
  * rounds — round-14 advice) unless it releases the superseded round
  * explicitly. A localCheckpointed Dataset's plan is a [[LogicalRDD]]
  * leaf whose `rdd` IS the block-backed data — unpersisting that RDD
  * frees the blocks deterministically.
  */
object Checkpoints {

  /** Free the storage behind a localCheckpointed frame. No-op for
    * frames that are not checkpoint results (plan is not a bare
    * LogicalRDD leaf). `blocking = false`: removal is async, the next
    * round's work proceeds immediately.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
