package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CmsEstimate must read back what Spark's own `count_min_sketch`
  * aggregate wrote — same UTF-8 byte[] hash path — and honor the CMS
  * one-sided error contract (never under-estimates; over-estimate
  * bounded by ε·N). */
class CmsSpec extends SparkSpec {

  test("estimate == exact count on a collision-free vocabulary") {
    import spark.implicits._
    val terms = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(7)("gamma") ++ Seq("delta")
    val df = terms.toDF("term")
    val bytes = df.agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    // eps=0.001 → width 2719 for a 4-term vocab: no collisions possible
    val est = df.distinct()
      .select(col("term"), CmsExprs.cmsEstimate(col("term"), bytes).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 7L, "delta" -> 1L))
  }

  test("never under-estimates on an adversarial wide vocabulary") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val terms = (0 until 5000).map(_ => s"t${rnd.nextInt(800)}")
    val df = terms.toDF("term")
    // deliberately NARROW sketch (eps=0.05 → w=55) to force collisions
    val bytes = df.agg(expr("count_min_sketch(term, 0.05d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val rows = df.groupBy("term").agg(count(lit(1)).as("cnt"))
      .select(col("term"), col("cnt"),
        CmsExprs.cmsEstimate(col("term"), bytes).as("est"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS under-estimated ${r.getString(0)}: est=${r.getLong(2)} < cnt=${r.getLong(1)}")
    }
    // and with forced collisions at least one term must over-estimate —
    // proving the assertion above isn't vacuously testing equality
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("null terms pass through as null estimates") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a")).toDF("term")
    val bytes = df.agg(expr("count_min_sketch(term, 0.01d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val rows = df.select(CmsExprs.cmsEstimate(col("term"), bytes).as("est"))
      .collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    assert(rows.filter(!_.isNullAt(0)).forall(_.getLong(0) === 2L))
  }
}
