package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd k-means assignment: argmin over a tiny broadcast model,
  * fused into ONE expression so assignment — the hot scan at 100 TB —
  * stays inside whole-stage codegen instead of evaluating K interpreted
  * `aggregate` HOF lambdas per row (HOFs are CodegenFallback; see
  * BENCH_NOTES). Reference behavior: temporai-mivdp clusters embeddings
  * with a driver-resident model and a full-corpus assignment scan.
  *
  * Semantics are bit-identical to the builtin fold it replaces
  * (spec'd in ClusteringSpec):
  *   - centroids are visited in model order (labels sorted ascending),
  *   - score(k) = cc(k) − 2·(e·c(k)) — the same ordering as squared
  *     euclidean distance, since e·e is constant per vector — with the
  *     dot accumulated left-to-right in double (exactly [[VecDot]]),
  *   - strict `<` comparison, so ties keep the earlier (smaller) label,
  *   - a dimension mismatch or null element skips that centroid (the
  *     fold's null-propagating comparison keeps the accumulator), and a
  *     vector NO centroid can score assigns NULL: unscoreable vectors
  *     are excluded from assignment, the semantics every call site
  *     (e08/e09 twins included) pins — a null element is in-scope data
  *     the centroid aggregations already skip, so silently adopting
  *     some cluster (what a row_number over all-NULL scores would do)
  *     or surfacing a sentinel label would both smuggle garbage into
  *     downstream aggregates.
  *
  * The model rides along as constructor constants (labels, centroid
  * matrix, precomputed c·c), registered as codegen reference objects —
  * at any corpus scale the model is K×dim floats, far below broadcast
  * thresholds.
  */
case class KMeansArgMin(
    child: Expression,
    labels: Array[Int],
    cents: Array[Array[Float]],
    ccs: Array[Double]) extends UnaryExpression {

  require(labels.length == cents.length && labels.length == ccs.length,
    "model arrays must be parallel")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "kmeans_argmin"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmeans_argmin requires array<float> input, got ${t.sql}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    var bestS = Double.PositiveInfinity
    var bestL = Int.MaxValue
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      if (!hasNull && c.length == n) {
        var acc = 0.0
        var j = 0
        while (j < n) { acc += arr.getFloat(j).toDouble * c(j).toDouble; j += 1 }
        val s = ccs(k) - 2.0 * acc
        if (s < bestS) { bestS = s; bestL = labels(k) }
      }
      k += 1
    }
    if (bestL == Int.MaxValue) null else bestL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val labelsRef = ctx.addReferenceObj("labels", labels, "int[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      val ccsRef = ctx.addReferenceObj("ccs", ccs, "double[]")
      val n = ctx.freshName("n")
      val hasNull = ctx.freshName("hasNull")
      val bestS = ctx.freshName("bestS")
      val bestL = ctx.freshName("bestL")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n && !$hasNull; $i++) { $hasNull = $a.isNullAt($i); }
         |double $bestS = Double.POSITIVE_INFINITY;
         |int $bestL = Integer.MAX_VALUE;
         |for (int $k = 0; $k < $centsRef.length; $k++) {
         |  float[] $c = $centsRef[$k];
         |  if ($hasNull || $c.length != $n) continue;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += (double) $a.getFloat($j) * (double) $c[$j];
         |  }
         |  double $s = $ccsRef[$k] - 2.0 * $acc;
         |  if ($s < $bestS) { $bestS = $s; $bestL = $labelsRef[$k]; }
         |}
         |${ev.isNull} = ($bestL == Integer.MAX_VALUE);
         |${ev.value} = $bestL;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KMeansArgMin =
    copy(child = newChild)
}

/** [[KMeansArgMin]]'s fused sibling: ONE model loop emits BOTH the
  * winning label and its score as struct(cluster int, score double) —
  * for consumers that need the distance of the assignment (e09's
  * quota sample), where running argmin and then re-deriving the score
  * via a per-label conditional would pay a second dot product per row.
  * The score is the loop's own bestS = cc(k*) − 2·(e·c(k*)), the exact
  * double the argmin compared — bit-identical to the oracle's `s` by
  * construction. Null/unscoreable semantics match [[KMeansArgMin]]:
  * no scoreable centroid → null struct.
  */
case class KMeansAssign(
    child: Expression,
    labels: Array[Int],
    cents: Array[Array[Float]],
    ccs: Array[Double]) extends UnaryExpression {

  require(labels.length == cents.length && labels.length == ccs.length,
    "model arrays must be parallel")

  override def dataType: DataType = KMeansAssign.schema
  override def nullable: Boolean = true
  override def prettyName: String = "kmeans_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmeans_assign requires array<float> input, got ${t.sql}")
  }

  @transient private lazy val scorer = new KMeansAssign.Scorer(labels, cents, ccs)

  override protected def nullSafeEval(a: Any): Any =
    scorer.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("scorer", scorer,
      classOf[KMeansAssign.Scorer].getName)
    // freshName, NOT a raw local: a fixed `r` redefines itself when the
    // expression appears twice in one codegen context — Janino failed
    // with "Redefinition of local variable r" and the WHOLE stage fell
    // back to interpreted eval, re-paying the failed compile on every
    // materialization (found via the bench stderr in r17).
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
      |Object $r = $sc.compute($a);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
     """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): KMeansAssign =
    copy(child = newChild)
}

object KMeansAssign {
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  final class Scorer(labels: Array[Int], cents: Array[Array[Float]],
      ccs: Array[Double]) extends Serializable {
    def compute(arr: ArrayData): Any = {
      val n = arr.numElements()
      var hasNull = false
      var i = 0
      while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
      var bestS = Double.PositiveInfinity
      var bestL = Int.MaxValue
      var k = 0
      while (k < cents.length) {
        val c = cents(k)
        if (!hasNull && c.length == n) {
          var acc = 0.0
          var j = 0
          while (j < n) { acc += arr.getFloat(j).toDouble * c(j).toDouble; j += 1 }
          val s = ccs(k) - 2.0 * acc
          if (s < bestS) { bestS = s; bestL = labels(k) }
        }
        k += 1
      }
      if (bestL == Int.MaxValue) null
      else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestL, bestS))
    }
  }
}

object KMeansExprs {
  /** Column wrapper over [[KMeansArgMin]]: assign `embedding` to the
    * nearest centroid of a driver-resident model. `model` pairs each
    * label with its centroid; entries are sorted by label so the
    * first-wins tie rule is "smaller label". */
  def assignCluster(embedding: Column, model: Seq[(Int, Array[Float])]): Column = {
    val sorted = model.sortBy(_._1)
    val labels = sorted.map(_._1).toArray
    val cents = sorted.map(_._2).toArray
    // c·c on the driver with the same left-to-right fold the assignment
    // (and the DuckDB twin's list_inner_product(cvec, cvec)) uses.
    val ccs = cents.map(_.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    GraftShim.column(KMeansArgMin(GraftShim.expression(embedding), labels, cents, ccs))
  }

  /** Column wrapper over [[KMeansAssign]]: struct(cluster, score) of the
    * nearest centroid in one fused pass. */
  def assignWithScore(embedding: Column, model: Seq[(Int, Array[Float])]): Column = {
    val sorted = model.sortBy(_._1)
    val labels = sorted.map(_._1).toArray
    val cents = sorted.map(_._2).toArray
    val ccs = cents.map(_.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    GraftShim.column(KMeansAssign(GraftShim.expression(embedding), labels, cents, ccs))
  }
}
