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
    * frames that are not LOCAL checkpoint results: the plan must be a
    * bare [[LogicalRDD]] leaf AND the rdd must actually carry local-
    * checkpoint data (r15 advice — a caller-supplied
    * `createDataFrame(rdd)` over an rdd the CALLER persisted is a bare
    * LogicalRDD too, and releasing it would silently drop the caller's
    * persistence; reliable `checkpoint()` results hold no executor
    * blocks, so their unpersist is a harmless no-op). `isCheckpointed`
    * is the public discriminator: true only for materialized checkpoint
    * results, false for a raw caller-persisted RDD wrapped in a frame.
    * `blocking = false`: removal is async, the next round's work
    * proceeds immediately.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: LogicalRDD if lr.rdd.isCheckpointed =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
