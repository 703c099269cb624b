package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint` storage.
  *
  * `Dataset.localCheckpoint(eager = true)` persists the query's internal
  * RDD (MEMORY_AND_DISK) and replaces the logical plan with a [[LogicalRDD]]
  * over it. `Dataset.unpersist()` does NOT free those blocks — it only
  * uncaches CacheManager entries, and a checkpoint never registers one —
  * so without help the blocks live until the ContextCleaner happens to GC
  * the unreferenced RDD. Iterative operators (connected components, star
  * contraction) that checkpoint every round would otherwise accumulate one
  * endpoint-sized block set per round on a storage-tight cluster; this
  * helper lets the loop drop round k-1's blocks as soon as round k is
  * materialized.
  *
  * Safe only when no live frame still references the checkpointed RDD: a
  * local checkpoint truncates lineage, so its blocks are the ONLY copy of
  * the data and any later action over a released frame fails.
  */
object Checkpoints {

  /** Unpersist the RDD blocks behind every [[LogicalRDD]] leaf of `df`'s
    * analyzed plan (non-blocking). No-op for frames that were never
    * checkpointed.
    */
  def release(df: DataFrame): Unit = releaseExcept(df)

  /** [[release]] restricted to checkpoints the walked plan OWNS: any
    * [[LogicalRDD]] leaf that also appears in one of the `keep` frames'
    * plans is left persisted. An operator that checkpoints internally but
    * receives caller frames as input must use this form — a caller-supplied
    * frame may itself be checkpoint-backed (e.g. one `curate`'s output fed
    * into another), and blanket-releasing every leaf would free the
    * caller's ONLY copy of that data out from under it.
    */
  def releaseExcept(df: DataFrame, keep: DataFrame*): Unit = {
    val keepIds: Set[Int] = keep
      .flatMap(_.queryExecution.analyzed.collectLeaves().collect {
        case l: LogicalRDD => l.rdd.id
      })
      .toSet
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD if !keepIds.contains(l.rdd.id) =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
