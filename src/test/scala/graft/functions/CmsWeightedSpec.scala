package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[CmsWeightedAgg]]: a sketch built from the (term, count)
  * rollup must be BYTE-IDENTICAL to the builtin `count_min_sketch`
  * over the raw occurrence stream — the property that lets d24 pay one
  * corpus pass instead of two, and the property a production pipeline
  * relies on when merging sketches from per-shard rollups. */
class CmsWeightedSpec extends SparkSpec {

  test("weighted sketch over the rollup ≡ builtin sketch over raw occurrences (bytes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val raw = (0 until 5000).map(_ => s"term${rnd.nextInt(300)}").toDF("term")
    val builtin = raw
      .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val weighted = raw.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .agg(CmsExprs.cmsSketchWeighted(col("term"), col("cnt"), 0.001, 0.99, 42))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(builtin, weighted),
      "weighted-from-rollup sketch must serialize to the builtin's exact bytes")
  }

  test("null terms and non-positive counts contribute nothing") {
    import spark.implicits._
    val withJunk = Seq(
      (Some("a"), 3L), (None, 5L), (Some("b"), 0L), (Some("c"), -2L), (Some("a"), 1L))
      .toDF("term", "cnt")
    val clean = Seq(("a", 3L), ("a", 1L)).toDF("term", "cnt")
    val b1 = withJunk
      .agg(CmsExprs.cmsSketchWeighted(col("term"), col("cnt"), 0.01, 0.9, 7))
      .head().getAs[Array[Byte]](0)
    val b2 = clean
      .agg(CmsExprs.cmsSketchWeighted(col("term"), col("cnt"), 0.01, 0.9, 7))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(b1, b2))
    // and the estimate side reads it back: exactly 4 for 'a' (no
    // collisions possible in a sketch this wide with one live term)
    val est = spark.range(1).select(
      CmsExprs.cmsEstimate(lit("a"), b1).as("e")).head().getLong(0)
    assert(est === 4L)
  }
}
