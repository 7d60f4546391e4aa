package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The pure-builtin formulation (`aggregate(zip_with(a, b, _*_), 0, _+_)`)
  * is correct but evaluates through interpreted higher-order-function
  * lambdas — fine at thousands of rows, a bottleneck at billions. This
  * expression participates in whole-stage codegen (`doGenCode` emits a
  * tight primitive loop over the two ArrayData buffers, no per-element
  * boxing) while producing BIT-IDENTICAL results: same left-to-right
  * accumulation order, elements widened to double before multiply, so the
  * DuckDB oracle comparison is unaffected.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float> inputs, got ${l.sql} and ${r.sql}")
    }

  // Length mismatch → NULL, matching the builtin formulation exactly
  // (zip_with null-pads the shorter array, the product is null, and the
  // fold propagates it): a malformed embedding row must surface as a
  // detectable null, never as a plausible prefix dot product.
  override def nullable: Boolean = true

  // Null ELEMENTS also propagate to a null result (ArrayData.getFloat
  // would silently read a null slot as 0): same as the builtin fold,
  // where a null element nulls the product and the sum.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column wrapper over [[VecDot]] (float-array inputs). */
  def vecDot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Codegen'd cosine over float-vector columns — bit-identical to
    * [[ColFns.cosine]] (same accumulation order and widening). */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))
  }
}
