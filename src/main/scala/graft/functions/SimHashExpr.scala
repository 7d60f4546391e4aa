package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the 16-bit SimHash signature
  * (queries/Docs.scala d08): per token, bit j of the sketch votes +1 if
  * the j-th hex nibble of md5(token) has its high bit set (hex digit
  * 8-f), else -1; signature bit j is set iff the vote sum is strictly
  * positive.
  *
  * The pure-builtin formulation explodes the token set, materializes
  * the md5 hex string, and runs 16 substring+IN aggregations through a
  * per-doc groupBy shuffle. This expression turns the whole sketch into
  * a per-row MAP: one MD5 per token, nibbles read straight from the
  * digest bytes, all 16 vote counters updated in a tight loop — no
  * explode, no shuffle, bit-identical results (hex digit ≥ '8' ⇔
  * nibble value ≥ 8).
  *
  * Returns null for a null array or an array with no non-null token —
  * mirroring the builtin's explode, which emits no row for such a doc
  * (callers filter nulls to match); a doc whose every vote ties or goes
  * negative yields 0, which stays distinguishable from absent.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires array<string> input, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long r = graft.functions.SimHash16.compute($c);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {

  val Bits = 16

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One pass over the token array → signature, or null if no non-null
    * token exists (the builtin explode emits no row for that doc). */
  def compute(arr: ArrayData): java.lang.Long = {
    val md = mdPool.get()
    val sums = new Array[Int](Bits)
    var found = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        found = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < Bits) {
          val b = d(j >> 1)
          val nib = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
          sums(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (!found) return null
    var code = 0L
    var j = 0
    while (j < Bits) {
      if (sums(j) > 0) code |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(code)
  }
}

object SimHashExpr {
  /** Column wrapper over [[SimHash16]] (array<string> tokens → long). */
  def simHash16(tokens: Column): Column =
    GraftShim.column(SimHash16(GraftShim.expression(tokens)))
}
