package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Point-query side of Spark's own `count_min_sketch` aggregate: the
  * builtin produces the serialized sketch but ships no expression to
  * READ it, so a sketch built in one pass (d24_heavy_hitters) could
  * otherwise only be queried on the driver. This expression embeds the
  * sketch bytes (a few hundred KB — the whole point of a CMS at 100 TB)
  * and answers estimateCount per row inside codegen.
  *
  * Hash-path consistency: CountMinSketchAgg adds STRING values via
  * `addBinary(UTF8String.getBytes)`; the estimate side must therefore
  * query with the same UTF-8 `byte[]` item (the String overload hashes
  * the same bytes, but byte[] keeps it byte-for-byte the same path).
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires string input, got ${t.sql}")
  }

  @transient private lazy val reader = new CmsEstimate.Reader(sketchBytes)

  override protected def nullSafeEval(input: Any): Any =
    reader.estimate(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rd = ctx.addReferenceObj("cmsReader", reader,
      classOf[CmsEstimate.Reader].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $rd.estimate($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsEstimate {
  /** Lazily-deserialized sketch holder, shipped as a codegen reference
    * object (bytes serialize with the plan; the sketch materializes once
    * per executor). */
  final class Reader(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val cms =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
    def estimate(item: UTF8String): Long = cms.estimateCount(item.getBytes)
  }
}

object CmsExprs {
  /** Column wrapper over [[CmsEstimate]]: string term → estimated count
    * from the serialized count-min sketch. */
  def cmsEstimate(term: Column, sketchBytes: Array[Byte]): Column =
    GraftShim.column(CmsEstimate(GraftShim.expression(term), sketchBytes))
}
