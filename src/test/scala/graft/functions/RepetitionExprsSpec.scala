package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TopAdjacentPairCount]] must be bit-identical to the pure-builtin
  * HOF formulation it replaced in d14 (array_max over
  * filter-count-per-distinct-bigram of the concat_ws bigram array). */
class RepetitionExprsSpec extends SparkSpec {

  /** The builtin twin, including its concat_ws null-skipping. */
  private def builtinTop(ws: org.apache.spark.sql.Column) = {
    val bg = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    coalesce(array_max(transform(array_distinct(bg), x =>
      size(filter(bg, y => y === x)))).cast("long"), lit(0L))
  }

  test("equivalent to the builtin HOF formulation on random token arrays") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "cc", "d e".replace(" ", ""), "", "é", "xx")
    val rows = (1 to 300).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    import spark.implicits._
    val df = rows.toDF("id", "ws")
    val diff = df.select(col("id"),
        RepetitionExprs.topAdjacentPairCount(col("ws")).as("fast"),
        builtinTop(col("ws")).as("slow"))
      .filter(col("fast") =!= col("slow") ||
        col("fast").isNull =!= col("slow").isNull)
    assert(diff.count() === 0L, diff.collect().mkString("; "))
  }

  test("edge cases: null array, empty, singleton, all-same, null elements") {
    import spark.implicits._
    val df = Seq(
      (1L, null: Seq[String]),
      (2L, Seq.empty[String]),
      (3L, Seq("only")),
      (4L, Seq("x", "x", "x", "x")),        // "x x" x3
      (5L, Seq(null, "b", null, "b", null)) // concat_ws skips nulls: "b" x4
    ).toDF("id", "ws")
    val out = df.select(col("id"),
        RepetitionExprs.topAdjacentPairCount(col("ws")).as("top"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out(1L) === null)
    assert(out(2L) === 0L)
    assert(out(3L) === 0L)
    assert(out(4L) === 3L)
    assert(out(5L) === 4L)
  }

  test("interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq((1L, Seq("p", "q", "p", "q", "p"))).toDF("id", "ws")
    val viaExpr = df.select(RepetitionExprs.topAdjacentPairCount(col("ws")))
      .collect().head.getLong(0)
    // direct interpreted call
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("p", "q", "p", "q", "p").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    assert(TopAdjacentPairCount.compute(arr) === viaExpr)
    assert(viaExpr === 2L) // "p q" x2
  }
}
