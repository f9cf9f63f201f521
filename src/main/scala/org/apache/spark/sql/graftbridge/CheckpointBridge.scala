package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the block-level storage behind a `localCheckpoint`ed
  * DataFrame. `Dataset.unpersist()` only uncaches CacheManager entries
  * (`.cache()`/`.persist()`); the RDD a local checkpoint pins lives in
  * the plan's `LogicalRDD` leaf and otherwise stays in the block store
  * until the ContextCleaner happens to garbage-collect it —
  * nondeterministic on a long-lived driver. Iterative trainers (the
  * BPE merge loop) release each superseded round's table
  * deterministically through this hook.
  *
  * Only safe once every downstream plan that reads the checkpoint has
  * materialized: a local checkpoint cannot be recomputed after its
  * blocks are dropped.
  */
object CheckpointBridge {
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(_.unpersist(blocking = false))
}
