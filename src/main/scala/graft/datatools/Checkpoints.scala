package graft.datatools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of eager `localCheckpoint` blocks.
  *
  * `Dataset.unpersist()` only evicts cache-manager entries created by
  * `persist()`; a `localCheckpoint` pins its rows as RDD storage
  * blocks that survive until the driver GCs the RDD object and the
  * ContextCleaner notices — which on a long-lived iterative job means
  * an R-round loop can hold R copies of its working set. The
  * checkpointed RDD rides in the dataset's `LogicalRDD` leaf; calling
  * `unpersist` THERE frees the blocks immediately.
  *
  * Only call on frames whose checkpoints are superseded — a released
  * checkpoint cannot be recomputed (its lineage was truncated), so a
  * later action on the frame fails. Loop code releases round r−1 only
  * after round r's checkpoint is materialized, and never releases the
  * returned frame.
  */
private[graft] object Checkpoints {
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
