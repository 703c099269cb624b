package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form: tumbling-window aggregation and
  * gap-based sessionization. The streaming equivalents (Structured
  * Streaming `window()` / `session_window()` with watermarks) live in
  * [[graft.streaming]]; these batch versions share the same semantics and
  * are the oracle-checkable path.
  *
  * Scale: tumbling aggregation is a plain hash aggregate on (window, key) —
  * partial map-side combine, one shuffle. Sessionization shuffles once on
  * `user_id` (the window partition key); per-user event streams sort within
  * partitions (spillable ExternalSorter), no global sort.
  */
object Events {

  /** Tumbling-window aggregate: epoch-second bucket start of width
    * `widthSec`, per (bucket, event_type): count + exact-decimal value sum.
    * The bucket is emitted as a BIGINT epoch so results are
    * timezone-representation-proof across engines. */
  def tumblingAgg(events: DataFrame, widthSec: Long): DataFrame =
    events
      .groupBy(
        (floor(unix_timestamp(col("ts")) / widthSec) * widthSec).cast("long").as("bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSec`. Returns per-user
    * session counts and bounds. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(
      prevTs.isNull || unix_timestamp(col("ts")) - unix_timestamp(prevTs) > gapSec, 1L)
      .otherwise(0L)
    events
      .withColumn("session_start", newSession)
      .groupBy(col("user_id"))
      .agg(
        sum(col("session_start")).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }
}
