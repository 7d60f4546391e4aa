package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** d33's per-document retrieval statistics in ONE compiled byte pass:
  * `struct(ndl, tfs)` where `ndl` is the whitespace token count of the
  * document and `tfs(i)` counts occurrences of query term `terms(i)`.
  *
  * Replaces the two-pass scan the first d33 formulation paid per row —
  * `tokenCount(text)` (two regexp_replace walks + length arithmetic)
  * plus `filter(words(text), isin(terms))` (a third regex walk, a
  * split allocation, then an INTERPRETED higher-order-function lambda
  * per token) — with a single zero-allocation byte scan that never
  * materializes the token array. Because the expression emits per-TERM
  * counts (not matched occurrences), the downstream plan also drops the
  * (doc_id, term) occurrence exchange: `posexplode(tfs)` already IS the
  * per-(doc, term) tf frame.
  *
  * Tokenization is bit-identical to `words`/`tokenCount`
  * (ColFns.scala:84-96): Java-regex `\s` whitespace is exactly the six
  * ASCII bytes {0x09..0x0D, 0x20} (no Unicode classes), all < 0x80, so
  * a UTF-8 byte scan splits on precisely the same boundaries — tokens
  * are maximal runs of non-`\s` bytes, `ndl` is the run count (0 for
  * blank text, matching tokenCount's empty-string special case), and
  * term matching compares exact UTF-8 bytes via zero-copy UTF8String
  * views (no String materialization, no per-token allocation).
  * Null text → null struct, matching the builtin chain's propagation.
  * Pinned to the builtin formulation on adversarial inputs by
  * Bm25ExprsSpec.
  */
case class Bm25DocStats(child: Expression, terms: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = Bm25DocStats.schema
  override def prettyName: String = "bm25_doc_stats"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bm25_doc_stats requires string input, got ${t.sql}")
  }

  /** Term → tfs index; built once per (serialized) expression instance,
    * shared across rows on the executor. */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.zipWithIndex.foreach { case (t, i) => m.put(UTF8String.fromString(t), i) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    Bm25DocStats.compute(input.asInstanceOf[UTF8String], lookup, terms.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25Lookup", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.Bm25DocStats.compute($c, $ref, ${terms.size});")
  }

  override protected def withNewChildInternal(newChild: Expression): Bm25DocStats =
    copy(child = newChild)
}

object Bm25DocStats {

  val schema: StructType = StructType(Seq(
    StructField("ndl", LongType, nullable = false),
    StructField("tfs", ArrayType(LongType, containsNull = false), nullable = false)))

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** One byte pass: count whitespace-token runs and per-term matches.
    * Token views are zero-copy (UTF8String.fromAddress over the input's
    * buffer); the map probe hashes the view's bytes directly. */
  def compute(text: UTF8String,
      lookup: java.util.HashMap[UTF8String, Integer], nTerms: Int): InternalRow = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val n = text.numBytes()
    val tfs = new Array[Long](nTerms)
    var ndl = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.getByte(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(text.getByte(i))) i += 1
        ndl += 1
        val idx = lookup.get(UTF8String.fromAddress(base, offset + start, i - start))
        if (idx != null) tfs(idx.intValue()) += 1L
      }
    }
    new GenericInternalRow(Array[Any](ndl, new GenericArrayData(tfs)))
  }
}

object Bm25Exprs {
  /** text → struct(ndl long, tfs array<long> aligned to `terms`), one
    * compiled byte pass (see [[Bm25DocStats]]). */
  def bm25DocStats(text: Column, terms: Seq[String]): Column =
    GraftShim.column(Bm25DocStats(GraftShim.expression(text), terms))
}
