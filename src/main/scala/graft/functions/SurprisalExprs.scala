package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document unigram surprisal against a FROZEN snapshot model, in
  * ONE compiled byte pass: `struct(n_tokens, surprisal_bits)` where
  * surprisal_bits = Σ_tokens (bits(n_total) − bits(count(token))) with
  * bits(x) = ⌊log2 x⌋ + 1 — the d25 integer-exact formulation
  * (queries/Docs.scala `surprisalDf`), with the corpus-derived model
  * (term → count) shipped as a literal instead of computed by the
  * plan. This is the SERVING path of the d25/d44 family: LM "training"
  * (the corpus frequency table) is a batch job; scoring an unbounded
  * ingest against the snapshot is a stateless per-row expression — no
  * join, no shuffle, no state.
  *
  * The shipped model stores only terms with snapshot count ≥ 2: a
  * lookup miss scores bits(1) = 1, which is EXACTLY what a count-1
  * term scores, so the scores of all snapshot-known tokens are
  * bit-identical to the batch d25 path while the model bytes roughly
  * halve (hapax legomena are typically ~half a corpus's vocabulary).
  * Out-of-vocabulary stream tokens (count 0 under the snapshot, which
  * the batch formulation never sees) score as count-1 — maximal
  * surprisal under the model, the principled OOV convention.
  *
  * Tokenization is bit-identical to `words`/`tokenCount`
  * (ColFns.scala): Java-regex `\s` is exactly the six ASCII bytes
  * {0x09..0x0D, 0x20}, so a UTF-8 byte scan splits on the same
  * boundaries; tokens are maximal non-ws runs, compared as zero-copy
  * UTF8String views (no String materialization). Null text → null
  * struct. Pinned batch≡stream by StreamingSpec's d44 twin test.
  */
case class SnapshotSurprisal(child: Expression, terms: Seq[String],
    counts: Seq[Long], nTotal: Long) extends UnaryExpression {

  require(terms.size == counts.size,
    s"terms (${terms.size}) and counts (${counts.size}) must align")

  override def dataType: DataType = SnapshotSurprisal.schema
  override def prettyName: String = "snapshot_surprisal"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"snapshot_surprisal requires string input, got ${t.sql}")
  }

  /** Term → bits(count); built once per (serialized) expression
    * instance, shared across rows on the executor. Values are the
    * PRE-COMPUTED bit lengths — the per-token work is one hash probe
    * and one subtraction. */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.iterator.zip(counts.iterator).foreach { case (t, c) =>
      m.put(UTF8String.fromString(t), 64 - java.lang.Long.numberOfLeadingZeros(c))
    }
    m
  }

  private lazy val nTotalBits: Int =
    64 - java.lang.Long.numberOfLeadingZeros(nTotal)

  override protected def nullSafeEval(input: Any): Any =
    SnapshotSurprisal.compute(input.asInstanceOf[UTF8String], lookup, nTotalBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("surprisalLookup", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.SnapshotSurprisal.compute($c, $ref, $nTotalBits);")
  }

  override protected def withNewChildInternal(newChild: Expression): SnapshotSurprisal =
    copy(child = newChild)
}

object SnapshotSurprisal {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("surprisal_bits", LongType, nullable = false)))

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def compute(text: UTF8String,
      lookup: java.util.HashMap[UTF8String, Integer], nTotalBits: Int): InternalRow = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val n = text.numBytes()
    var nTok = 0L
    var bitsSum = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.getByte(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(text.getByte(i))) i += 1
        nTok += 1
        val cb = lookup.get(UTF8String.fromAddress(base, offset + start, i - start))
        bitsSum += nTotalBits - (if (cb != null) cb.intValue() else 1)
      }
    }
    new GenericInternalRow(Array[Any](nTok, bitsSum))
  }
}

object SurprisalExprs {
  /** text → struct(n_tokens long, surprisal_bits long) under a frozen
    * snapshot model (see [[SnapshotSurprisal]]). */
  def snapshotSurprisal(text: Column, terms: Seq[String], counts: Seq[Long],
      nTotal: Long): Column =
    GraftShim.column(SnapshotSurprisal(GraftShim.expression(text), terms, counts, nTotal))
}
