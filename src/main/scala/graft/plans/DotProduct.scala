package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The composable form (`aggregate(zip_with(...))`, Similarity.dot) is
  * correct but interpreted: higher-order functions evaluate a lambda per
  * array element, which dominates ANN scoring cost (dims × candidates
  * lambda invocations). This expression evaluates the whole array in one
  * tight loop and participates in whole-stage codegen via doGenCode —
  * preference order (b) from the build rules: a custom Expression before
  * any UDF.
  *
  * Semantics match Similarity.dot exactly: per-element widen-to-double,
  * multiply, sequential left-to-right sum — so results stay bit-identical
  * to the DuckDB list_reduce oracle.
  *
  * Input contract: DENSE vectors — array elements must be non-null.
  * The tight loop reads element slots primitively (a null slot reads as
  * 0.0), whereas SQL's `a[i] * b[i]` would propagate NULL through the
  * whole sum; embeddings are dense by construction everywhere this is
  * used, and keeping the loop branch-free is the expression's whole
  * point. Validate upstream if a source can ship sparse arrays. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(v: String, t: DataType, i: String): String = t match {
        case FloatType => s"(double) $v.getFloat($i)"
        case _ => s"$v.getDouble($i)"
      }
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_s += ${get(a, elemType(left), s"${ev.value}_i")}
         |    * ${get(b, elemType(right), s"${ev.value}_i")};
         |}
         |${ev.value} = ${ev.value}_s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Register `graft_dot` in the session function registry (makes the
    * expression usable from Column programs via call_function and from
    * SQL text). Truly idempotent: a no-op when already registered, so
    * repeated query runs don't log `replaced a previously registered
    * function` on every execution. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
      reg.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}
