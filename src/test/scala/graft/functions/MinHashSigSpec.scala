package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The codegen'd MinHashSig expression must be bit-identical to the
  * pure-builtin Carter-Wegman formulation (md5 hex → conv → per-family
  * array_min) it replaced — that formulation is what the DuckDB oracle
  * mirrors, so any divergence here is an oracle break. */
class MinHashSigSpec extends SparkSpec {

  private def words(c: org.apache.spark.sql.Column) =
    split(trim(regexp_replace(c, "\\s+", " ")), " ")
  private def shingles(ws: org.apache.spark.sql.Column) =
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))

  test("expression == builtin hex/conv formulation on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("ws", words(col("text")))
      .withColumn("sh", shingles(col("ws")))

    val builtin = docs.withColumn("hh",
      transform(transform(col("sh"), x => md5(x.cast("binary"))), m =>
        struct(conv(substring(m, 1, 8), 16, 10).cast("long").as("h1"),
          conv(substring(m, 9, 8), 16, 10).cast("long").as("h2"))))
      .select(col("doc_id") +: (0 until MinHashSig.K).map(i =>
        array_min(transform(col("hh"), h =>
          pmod(h.getField("h1") + h.getField("h2") * lit(i.toLong),
            lit(MinHashSig.P)))).as(s"ref$i")): _*)

    val fast = docs.withColumn("mh", MinHashExprs.minHashSig(col("sh")))
      .select(col("doc_id") +: (0 until MinHashSig.K).map(i =>
        element_at(col("mh"), i + 1).as(s"mh$i")): _*)

    val joined = builtin.join(fast, "doc_id")
    val bad = joined.filter((0 until MinHashSig.K).map(i =>
      !(col(s"ref$i") <=> col(s"mh$i"))).reduce(_ || _))
    assert(bad.count() === 0)
    assert(joined.count() === docs.count())
  }

  test("unicode shingles hash over UTF-8 bytes, matching md5(cast as binary)") {
    import spark.implicits._
    val df = Seq((1L, Seq("héllo wörld ünïcode", "日本語 テスト 文字", "emoji 🚀 test")))
      .toDF("doc_id", "sh")
    val ref = df.select((0 until MinHashSig.K).map(i =>
      array_min(transform(col("sh"), x =>
        pmod(conv(substring(md5(x.cast("binary")), 1, 8), 16, 10).cast("long") +
          conv(substring(md5(x.cast("binary")), 9, 8), 16, 10).cast("long") * lit(i.toLong),
          lit(MinHashSig.P)))).as(s"v$i")): _*).head
    val got = df.select(MinHashExprs.minHashSig(col("sh")).as("mh")).head
      .getAs[scala.collection.Seq[Long]]("mh")
    (0 until MinHashSig.K).foreach(i => assert(got(i) === ref.getLong(i)))
  }

  test("empty array and all-null elements yield the all-null signature; null array yields null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, Some(Seq(null.asInstanceOf[String], null.asInstanceOf[String]))),
      (3L, None: Option[Seq[String]])).toDF("doc_id", "sh")
    val out = df.select(col("doc_id"), MinHashExprs.minHashSig(col("sh")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[java.lang.Long]]("mh")).toMap
    assert(out(1L) !== null); assert(out(1L).length === MinHashSig.K && out(1L).forall(_ == null))
    assert(out(2L) !== null); assert(out(2L).length === MinHashSig.K && out(2L).forall(_ == null))
    assert(out(3L) === null)
  }

  test("null elements are skipped, not hashed") {
    import spark.implicits._
    val withNull = Seq((1L, Seq("a b c", null, "b c d"))).toDF("doc_id", "sh")
    val without = Seq((1L, Seq("a b c", "b c d"))).toDF("doc_id", "sh")
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(MinHashExprs.minHashSig(col("sh")).as("mh")).head
        .getAs[scala.collection.Seq[java.lang.Long]]("mh")
    assert(sig(withNull) === sig(without))
  }
}
