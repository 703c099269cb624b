package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: for each left row, attach the latest
  * right row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no built-in as-of join; the classic scalable formulation is
  * union + carry-forward window rather than a per-row range probe:
  *
  *   1. tag both sides, union on (key, ts)
  *   2. one window per key ordered by (ts, side): `last(right value,
  *      ignoreNulls)` carries the most recent right value forward
  *   3. keep left rows
  *
  * Cost: ONE shuffle on the key (the window partition), a spillable
  * within-partition sort — no quadratic candidate explosion, no broadcast
  * requirement on either side. This is the 100 TB shape: both sides can be
  * arbitrarily large as long as per-key event streams fit a sort spill.
  *
  * Right rows sort before left rows at equal timestamps, so a right row
  * with exactly `rightTs == leftTs` IS matched (inclusive as-of).
  */
object AsOfJoin {

  /** @param left     fact side; every row is preserved
    * @param right    timeline side providing the carried-forward value
    * @param keyCol   equi-key column name present on both sides
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @param valueCols right columns to carry onto left rows
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    // ONE struct carries all value columns so the attached values always
    // come from a single right row — carrying each column independently
    // with last(ignoreNulls) would mix columns of different rows whenever
    // a later right row holds a null in one of them
    val rowStruct = struct(valueCols.map(col): _*)
    val rowStructType = right.select(rowStruct).schema.head.dataType
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == keyCol).map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(rowStructType).as("__r"): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        rowStruct.as("__r"): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(Seq(col(keyCol)) ++
        left.columns.filterNot(_ == keyCol).map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col(s"__r.$c").as(s"asof_$c")): _*)
  }
}
