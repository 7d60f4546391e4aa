package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ColFns.tokenSet

/** The codegen'd SimHash16 expression must be bit-identical to the
  * explode + md5-hex + 16-substring-aggregation formulation it
  * replaced (queries/Docs.scala d08) — including the doc-with-no-tokens
  * case, where the builtin explode emits no row. */
class SimHashSpec extends SparkSpec {

  private val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  private def builtin(docs: org.apache.spark.sql.DataFrame) = {
    val toks = docs.select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
      .withColumn("m", md5(col("tok").cast("binary")))
    val sums = (0 until 16).map(j =>
      sum(when(substring(col("m"), j + 1, 1).isin(hexHigh: _*), 1).otherwise(-1)).as(s"s$j"))
    val agg = toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val code = (0 until 16).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    agg.select(col("doc_id"), code.cast("long").as("ref"))
  }

  private def fast(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), SimHashExpr.simHash16(tokenSet(col("text"))).as("simhash"))
      .filter(col("simhash").isNotNull)

  test("expression == builtin formulation on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = builtin(docs)
    val got = fast(docs)
    assert(got.count() === ref.count())
    val joined = ref.join(got, "doc_id")
    assert(joined.filter(col("ref") =!= col("simhash")).count() === 0)
    assert(joined.count() === ref.count())
  }

  test("docs with no tokens are absent, matching the builtin explode; unicode hashes as UTF-8") {
    import spark.implicits._
    val docs = Seq(
      (1L, "héllo wörld héllo 日本語 テスト"),
      (2L, null.asInstanceOf[String]),
      (3L, "a b a b"),
      (4L, "")).toDF("doc_id", "text")
    val ref = builtin(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = fast(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref)
    assert(!got.contains(2L)) // null text -> no tokens -> absent
  }
}
