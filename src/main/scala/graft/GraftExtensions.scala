package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VecDot

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions for SQL-text users —
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`) makes
  * `SELECT vec_dot(a, b)` resolvable in `spark.sql`.
  * DataFrame callers don't need this: `VectorExprs.vecDot` embeds the
  * expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      GraftExtensions.vecDotInfo,
      GraftExtensions.vecDotBuilder))
  }
}

object GraftExtensions {
  private[graft] val vecDotInfo =
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot")
  private[graft] val vecDotBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "vec_dot takes exactly 2 arguments")
    VecDot(children.head, children(1))
  }

  /** Same registration for a session the library didn't construct. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftShim.registerFunction(
      spark, "vec_dot", vecDotInfo, vecDotBuilder)
}
