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

  /** Per-round checkpoint saver for iterative loops — the
    * ConnectedComponents durability pattern, generalized (r15 verdict):
    * with `checkpointDir` set, EVERY round goes through reliable
    * `checkpoint()` (an HDFS/object-store path at cluster scale — a
    * lost executor re-reads its partitions instead of killing the job);
    * without it, `localCheckpoint` (executor blocks, truncated lineage,
    * single-node default). Mixing the two would be pointless: any round
    * downstream of a lost LOCAL checkpoint is unrecoverable, so
    * reliable mode must cover every round including the static sides.
    * Single-node overhead of the reliable arm is ~zero (CcMacroBench
    * r8: 97.4 vs 103.4 s; its real cluster cost is replication
    * bandwidth). [[release]] stays correct for both: reliable results
    * hold no executor blocks, so their unpersist is a no-op.
    */
  def saver(df: DataFrame, checkpointDir: Option[String])
      : DataFrame => DataFrame = {
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    d => if (checkpointDir.isDefined) d.checkpoint(eager = true)
         else d.localCheckpoint(eager = true)
  }
}
