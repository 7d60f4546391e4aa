package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The codegen'd VecDot must be BIT-identical to the HOF-fold dot — it
  * replaces it in the oracle-gated queries, so any accumulation-order
  * difference would surface as hash mismatches. */
class VectorExprsSpec extends SparkSpec {

  test("VecDot == aggregate/zip_with fold, bit-exact, on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = e.select(
      VectorExprs.vecDot(col("embedding"), col("embedding")).as("fast"),
      ColFns.dot(col("embedding"), col("embedding")).as("fold"))
    val mismatches = both.filter(col("fast") =!= col("fold")).count()
    assert(mismatches === 0)
  }

  test("cosineFast == cosine, bit-exact, across pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = e.select((col("vec_id") - 1).as("ida"), col("embedding").as("eb"))
    val both = a.join(b, "ida").select(
      VectorExprs.cosineFast(col("ea"), col("eb")).as("fast"),
      ColFns.cosine(col("ea"), col("eb")).as("fold"))
    assert(both.filter(col("fast") =!= col("fold")).count() === 0)
  }

  test("precomputed vecNorm pair cosine == cosineFast, bit-exact (the self-join hot-path split)") {
    // the e05/e06/e11/e12/e10/e14 shapes compute vecNorm once per ROW
    // before the join and divide the pair dot by the norm product —
    // must be bit-identical to the fused cosineFast (same vecDot, same
    // sqrt, same multiplication order), else hash gates drift
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"),
      VectorExprs.vecNorm(col("embedding")).as("na"))
    val b = e.select((col("vec_id") - 1).as("ida"), col("embedding").as("eb"),
      VectorExprs.vecNorm(col("embedding")).as("nb"))
    val both = a.join(b, "ida").select(
      (VectorExprs.vecDot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("pre"),
      VectorExprs.cosineFast(col("ea"), col("eb")).as("fused"))
    assert(both.filter(col("pre") =!= col("fused")).count() === 0)
  }

  test("VecDot rejects non-float-array inputs at analysis") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b") // double arrays
    val ex = intercept[Exception] {
      df.select(VectorExprs.vecDot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("vec_dot") ||
      ex.getMessage.contains("DATATYPE"))
  }

  test("VecDot null semantics: null array -> null result") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f)), None: Option[Seq[Float]])).toDF("a", "b")
    val r = df.select(VectorExprs.vecDot(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("VecDot null ELEMENT -> null (ArrayData would read it as 0 otherwise)") {
    import spark.implicits._
    val df = Seq((Seq(Some(1.0f), None, Some(3.0f)), Seq(Some(1.0f), Some(2.0f), Some(3.0f))))
      .toDF("a", "b")
    val r = df.select(VectorExprs.vecDot(col("a"), col("b")).as("fast"),
      ColFns.dot(col("a"), col("b")).as("fold")).head
    assert(r.isNullAt(0) && r.isNullAt(1)) // both null — still bit-identical
  }

  test("VecDot length mismatch -> null (matches zip_with null-padding), both eval paths") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    // codegen'd path
    val r = df.select(VectorExprs.vecDot(col("a"), col("b")).as("d"),
      ColFns.dot(col("a"), col("b")).as("fold")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
    // interpreted path (eval via filter on a literal-free comparison)
    assert(df.filter(VectorExprs.vecDot(col("a"), col("b")).isNull).count() === 1)
  }
}
