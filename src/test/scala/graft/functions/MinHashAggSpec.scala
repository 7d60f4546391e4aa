package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The mergeable Aggregator must produce the same signatures as the
  * per-row expression path (queries/Docs.scala) — same hash families,
  * same mins — regardless of partitioning (merge associativity). */
class MinHashAggSpec extends SparkSpec {

  private def words(c: org.apache.spark.sql.Column) =
    split(trim(regexp_replace(c, "\\s+", " ")), " ")
  private def shingles(ws: org.apache.spark.sql.Column) =
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))

  test("grouped Aggregator signature == per-row expression signature") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("ws", words(col("text")))
      .withColumn("sh", shingles(col("ws")))

    // per-row expression path (the d06 shape): one md5 per shingle,
    // Carter-Wegman families over its two 32-bit halves
    val hashed = docs.withColumn("hh",
      transform(transform(col("sh"), x => md5(x.cast("binary"))), m =>
        struct(conv(substring(m, 1, 8), 16, 10).cast("long").as("h1"),
          conv(substring(m, 9, 8), 16, 10).cast("long").as("h2"))))
    val exprSig = hashed.select(
      col("doc_id") +: (0 until MinHashAgg.K).map(i =>
        array_min(transform(col("hh"), h =>
          pmod(h.getField("h1") + h.getField("h2") * lit(i.toLong),
            lit(1000000007L)))).as(s"mh$i")): _*)

    // exploded shingles → grouped Aggregator, forced through a shuffle
    // with several partitions so merge() actually runs
    val aggSig = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .repartition(7)
      .groupBy(col("doc_id"))
      .agg(MinHashAgg.minhashCol(col("shingle")))

    val joined = exprSig.join(aggSig, "doc_id")
    val bad = joined.filter(
      (0 until MinHashAgg.K).map(i =>
        col(s"mh$i") =!= element_at(col("mh_sig"), i + 1)).reduce(_ || _))
    assert(bad.count() === 0)
    assert(joined.count() === docs.count())
  }

  test("null shingles are skipped — signature matches the per-row path") {
    import spark.implicits._
    // per-row path: md5(null) is null so every family value is null →
    // the null shingle contributes nothing; the Aggregator must agree
    val withNull = Seq((1L, Some("a b c")), (1L, None), (1L, Some("b c d")))
      .toDF("doc_id", "shingle")
    val without = Seq((1L, "a b c"), (1L, "b c d")).toDF("doc_id", "shingle")
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("doc_id")).agg(MinHashAgg.minhashCol(col("shingle")))
        .head.getAs[scala.collection.Seq[java.lang.Long]]("mh_sig")
    assert(sig(withNull) === sig(without))
  }

  test("all-null input yields the empty (all-null) signature, not hashes of 'null'") {
    import spark.implicits._
    val allNull = Seq((1L, None: Option[String])).toDF("doc_id", "shingle")
    val sig = allNull.groupBy(col("doc_id")).agg(MinHashAgg.minhashCol(col("shingle")))
      .head.getAs[scala.collection.Seq[java.lang.Long]]("mh_sig")
    assert(sig.length === MinHashAgg.K && sig.forall(_ == null))
  }

  test("merge handles empty partitions (null mins)") {
    import spark.implicits._
    val one = Seq((1L, "a b c")).toDF("doc_id", "shingle")
    val sig = one.groupBy(col("doc_id")).agg(MinHashAgg.minhashCol(col("shingle")))
      .head.getAs[scala.collection.Seq[java.lang.Long]]("mh_sig")
    assert(sig.length === MinHashAgg.K && sig.forall(_ != null))
  }
}
