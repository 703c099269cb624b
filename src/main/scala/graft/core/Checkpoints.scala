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
  *
  * ==House checkpoint-release policy (the round-19/20 rule)==
  *
  * An operator may leave a checkpoint in its RETURNED lineage (where the
  * caller cannot release it without killing the result) ONLY when the
  * checkpointed frame is SMALL BY CONSTRUCTION — bounded by a model or
  * group cardinality, never by corpus size: ≤ `topV` rows (nbClassify /
  * nbClassifyMulti models), ≤ #sources (sourceReport's per-source
  * table), ≤ #groups (madOutliers' median frames, groupQuantiles),
  * queries×k (knnLabelEval's hits, top-k frames), ≤ #shards
  * (trainingShards' summary), batch-sized in a batch-vs-corpus op
  * (curateIncremental's `fresh`). Such blocks persist until session end
  * as HYGIENE, not a leak that scales with data; a caller that is fully
  * done can still free them via [[release]].
  *
  * Checkpoints of UNBOUNDED frames must be INTERNAL: materialize the
  * (bounded) result, then release them before returning — `trainNb`'s
  * release of its model-build checkpoint (TextStats) and `curate`'s tail
  * `releaseExcept` are the models. When the released plan also FEEDS a
  * caller-visible frame, use [[releaseExcept]] naming every caller-owned
  * frame (this walks the WHOLE lineage — round 18's MeasureIncCC2
  * lesson), or leave the release to the single tail call.
  *
  * Grep-able inventory of returned-lineage checkpoints (all bounded):
  * sourceReport, knnLabelEval, madOutliers, nbModelFrames,
  * nbClassifyMulti, prCurve/sourceDivergence (via their model frames),
  * trainingShards' summary, curate/curateSoft/curateIncremental
  * survivors (survivor-sized — the documented return contract).
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
