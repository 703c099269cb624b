package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for RDF object datatype extraction —
  * `o -> struct<v: string, t: string>` — with full parity to the
  * reference's Scala UDF semantics (DbpediaDgraphSparkApp.scala:544-553)
  * including the pathological split edge cases (embedded `^`, trailing
  * `^^`), which the `when/otherwise` native approximation in
  * [[graft.ops.DataTypes.extractDataTypeNative]] does not cover.
  *
  * Unlike a Scala UDF this expression:
  *  - participates in whole-stage codegen (`doGenCode` emits a static
  *    call — no row-at-a-time encoder/decoder boundary),
  *  - is deterministic as far as Catalyst is concerned, with no
  *    `.asNondeterministic()` workaround needed to prevent double
  *    evaluation: the generated code evaluates it exactly once per use
  *    site and subexpression elimination can dedupe across sites.
  */
case class ExtractDataTypeExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // analysis-time coercion/type error instead of a runtime ClassCastException
  // — same contract as the other graft SQL functions
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("v", StringType, nullable = true),
    StructField("t", StringType, nullable = true)))

  override protected def nullSafeEval(input: Any): Any =
    ExtractDataTypeExpr.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractDataTypeExpr.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_extract_datatype"
}

object ExtractDataTypeExpr {

  private val Uri = UTF8String.fromString("<uri>")

  /** Static kernel shared by interpreted eval and generated code. Exactly
    * the reference UDF's semantics via `String.split("\\^")`. */
  def extract(value: UTF8String): InternalRow = {
    val s = value.toString
    if (s.startsWith("<")) {
      new GenericInternalRow(Array[Any](value, Uri))
    } else if (s.contains("^^")) {
      val fields = s.split("\\^")
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(fields.dropRight(2).mkString("^")),
        UTF8String.fromString(fields.last)))
    } else {
      new GenericInternalRow(Array[Any](value, null))
    }
  }

  /** Column-level entry point: `extract_datatype($"o")`. Resolves through
    * the function registry — requires [[graft.plans.GraftExtensions]] to be
    * installed on the session. */
  def extract_datatype(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_extract_datatype", c)
}
