package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSig, PlaneBucketCode, SimHash16, TopAdjacentPairCount, VecDot}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions for SQL-text users —
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`) makes
  * `SELECT vec_dot(a, b)`, `minhash_sig(shingles)`,
  * `simhash16(tokens)`, `plane_bucket_code(embedding)` resolvable in
  * `spark.sql`. DataFrame callers don't need this: the wrappers in
  * `functions/` embed the expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def unary(name: String, f: Expression => Expression):
      Seq[Expression] => Expression = children => {
    require(children.length == 1, s"$name takes exactly 1 argument")
    f(children.head)
  }

  private[graft] val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      children => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(children.head, children(1))
      }),
    ("minhash_sig", new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      unary("minhash_sig", MinHashSig(_))),
    ("simhash16", new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      unary("simhash16", SimHash16(_))),
    ("plane_bucket_code", new ExpressionInfo(classOf[PlaneBucketCode].getName, "plane_bucket_code"),
      unary("plane_bucket_code", PlaneBucketCode(_))),
    ("top_adjacent_pair_count",
      new ExpressionInfo(classOf[TopAdjacentPairCount].getName, "top_adjacent_pair_count"),
      unary("top_adjacent_pair_count", TopAdjacentPairCount(_))))

  /** Same registration for a session the library didn't construct. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftShim.registerFunction(spark, name, info, builder)
    }
}
