package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the engine's custom Catalyst
  * functions — `SparkSession.builder().withExtensions(new GraftExtensions)`
  * makes `graft_dot` resolvable from SQL text in every session of the
  * application (cluster deployments set
  * `spark.sql.extensions=graft.plans.GraftExtensions`). For an existing
  * session, [[DotProduct.register]] does the same through the runtime
  * function registry. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
