package graft.plans

import graft.functions.ExtractDataTypeExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer: makes graft's native expressions
  * available as SQL functions.
  *
  * Activate with either
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_extract_datatype"),
      new ExpressionInfo(
        classOf[ExtractDataTypeExpr].getName,
        null,
        "graft_extract_datatype",
        "graft_extract_datatype(o) - splits an RDF object into struct<v, t>",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ExtractDataTypeExpr(children.head)))
  }
}
