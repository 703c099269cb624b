package graft.functions

import graft.SparkSpec
import graft.ops.DataTypes
import org.apache.spark.sql.functions._

class ExtractDataTypeExprSpec extends SparkSpec {

  // includes the pathological cases where the when/otherwise native
  // approximation diverges from the reference UDF
  private val inputs = Seq(
    "<http://x>",
    "\"5\"^^<http://www.w3.org/2001/XMLSchema#integer>",
    "\"plain\"",
    "\"x^^y^z\"", // embedded ^ after the separator
    "\"a\"^^", // trailing separator, java split drops empties
    "\"a@b\"@en")

  test("expression matches the reference scala semantics on all edge cases") {
    val spark2 = spark
    import spark2.implicits._
    val out = inputs.toDF("o")
      .select(ExtractDataTypeExpr.extract_datatype(col("o")).as("vt"))
      .select(col("vt.v"), col("vt.t")).as[(String, Option[String])].collect()
    inputs.zip(out).foreach { case (in, (v, t)) =>
      val ref = DataTypes.extractDataType(in)
      assert(v === ref(0), s"v for $in")
      assert(t === (if (ref.length > 1) Option(ref(1)) else None), s"t for $in")
    }
  }

  test("registered as a SQL function via SparkSessionExtensions") {
    val row = spark.sql(
      """SELECT graft_extract_datatype('"5"^^<http://t>') AS vt""")
      .selectExpr("vt.v", "vt.t").head()
    assert(row.getString(0) === "\"5\"")
    assert(row.getString(1) === "<http://t>")
  }

  test("stays inside whole-stage codegen (no UDF/BatchEvalPython boundary)") {
    // a local Seq collapses to LocalTableScan (constant-folded at plan
    // time); a parquet scan forces a real codegen stage
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select(concat(lit("\"x\"^^<t"), col("n_nationkey").cast("string"), lit(">")).as("o"))
      .select(ExtractDataTypeExpr.extract_datatype(col("o")).as("vt"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_extract_datatype"), plan)
    assert(df.count() === 25)
  }
}
