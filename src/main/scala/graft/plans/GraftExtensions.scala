package graft.plans

import graft.functions.{ExtractDataTypeExpr, ShingleMinhashExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.IntegerType

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

    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_minhash"),
      new ExpressionInfo(
        classOf[ShingleMinhashExpr].getName,
        null,
        "graft_shingle_minhash",
        "graft_shingle_minhash(text, n) - MinHash pair struct<a, b> over n-char shingles",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_shingle_minhash(text, n) takes 2 arguments")
        val n = children(1) match {
          case e if e.foldable && e.dataType == IntegerType =>
            e.eval().asInstanceOf[Int]
          case other =>
            throw new IllegalArgumentException(
              s"shingle size must be an integer literal, got $other")
        }
        ShingleMinhashExpr(children.head, n)
      }))
  }
}
