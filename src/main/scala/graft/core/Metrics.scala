package graft.core

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Spill/peak-memory telemetry (reference: DbpediaDgraphSparkApp.scala:79-90,
  * printed at :450). Accumulates per-stage executor metrics; the reference
  * uses the printed line as its operational performance gauge
  * (README.md:164-169) — e.g. "memory spill: 51 GB disk spill: 4 GB".
  */
class SpillMetrics extends SparkListener {
  val memSpilled = new AtomicLong()
  val diskSpilled = new AtomicLong()
  val peakMem = new AtomicLong()

  override def onStageCompleted(event: SparkListenerStageCompleted): Unit = {
    val stageId = event.stageInfo.stageId
    memSpilled.addAndGet(event.stageInfo.taskMetrics.memoryBytesSpilled)
    diskSpilled.addAndGet(event.stageInfo.taskMetrics.diskBytesSpilled)
    val tasks = math.max(event.stageInfo.numTasks, 1)
    peakMem.getAndUpdate { cur =>
      math.max(cur, event.stageInfo.taskMetrics.peakExecutionMemory / tasks)
    }
  }

  def summary: String =
    s"memory spill: ${memSpilled.get / 1024 / 1024 / 1024} GB  " +
      s"disk spill: ${diskSpilled.get / 1024 / 1024 / 1024} GB  " +
      s"peak mem per task: ${peakMem.get / 1024 / 1024} MB"
}

object SpillMetrics {
  /** Register a fresh listener on the session. */
  def register(spark: SparkSession): SpillMetrics = {
    val m = new SpillMetrics
    spark.sparkContext.addSparkListener(m)
    m
  }
}
