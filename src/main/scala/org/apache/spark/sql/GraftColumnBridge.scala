package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** graft's bridge to the classic `Column` ↔ Catalyst `Expression`
  * converters, which Spark 4 marks `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). The object lives in
  * this package purely for access; it contains no Spark-internal logic.
  *
  * Building a `Column` from an `Expression` directly — instead of only
  * through a function registered by
  * [[graft.plans.GraftExtensions]] — lets graft's typed helpers
  * (`shingle_minhash(col, n)`, `extract_datatype(col)`) run on ANY
  * session, including ones created without the
  * `spark.sql.extensions=graft.plans.GraftExtensions` config. The SQL
  * registration remains the surface for `spark.sql(...)` users.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
