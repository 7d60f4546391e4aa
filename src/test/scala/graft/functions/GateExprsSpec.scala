package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[GopherStats]] / [[HashedTokenScore]] must be bit-identical to the
  * pure-builtin HOF formulations they replaced in d37/d38 (the gates'
  * oracles pin the outputs cross-engine; these pin the expressions to
  * the builtins on arbitrary arrays, including shapes the gate path
  * filters out). */
class GateExprsSpec extends SparkSpec {

  /** The builtin d37 statistics chain over a bound token array. */
  private def builtinStats(ws: org.apache.spark.sql.Column) = {
    val topCnt = aggregate(array_sort(ws),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run2 = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run2.as("run"),
          greatest(acc.getField("best"), run2).as("best"))
      },
      acc => acc.getField("best"))
    struct(
      size(ws).cast("long").as("n_words"),
      aggregate(ws, lit(0L), (acc, x) => acc + length(x)).as("sum_len"),
      size(array_intersect(ws, array(GopherStats.stops.map(lit): _*)))
        .cast("long").as("stop_hits"),
      size(array_distinct(ws)).cast("long").as("n_distinct"),
      topCnt.as("top_cnt"))
  }

  /** The builtin d38 fold. */
  private def builtinScore(ws: org.apache.spark.sql.Column) =
    aggregate(ws, lit(0L), (acc, x) =>
      acc + (conv(substring(md5(x.cast("binary")), 1, 8), 16, 10)
        .cast("long") % 2001L - 1000L))

  private def tokenRows = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("the", "a", "of", "b", "cc", "ddd", "é漢", "xx", "longtokenvalue")
    (1 to 300).map { i =>
      val n = rnd.nextInt(14)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
  }

  test("gopherStats equivalent to the builtin chain on random token arrays") {
    import spark.implicits._
    val df = tokenRows.toDF("id", "ws")
    val diff = df.select(col("id"),
        GateExprs.gopherStats(col("ws")).as("fast"),
        builtinStats(col("ws")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() === 0L, diff.collect().take(3).mkString("; "))
  }

  test("gopherStats edge cases: empty array, unicode lengths, all-same") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("é漢字")),          // numChars, not bytes
      (3L, Seq.fill(9)("the")),    // mode = 9, distinct 1, stop hit 1
      (4L, Seq("the", "a", "of", "and", "be", "to", "in", "it"))
    ).toDF("id", "ws")
    val got = df.select(col("id"), GateExprs.gopherStats(col("ws")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    assert(got(1L) === Seq(0L, 0L, 0L, 0L, 0L))
    assert(got(2L) === Seq(1L, 3L, 0L, 1L, 1L))
    assert(got(3L) === Seq(9L, 27L, 1L, 1L, 9L))
    assert(got(4L) === Seq(8L, 17L, 8L, 8L, 1L))
  }

  test("hashedTokenScore equivalent to the builtin md5 fold; null array → null") {
    import spark.implicits._
    val df = tokenRows.toDF("id", "ws")
    val diff = df.select(col("id"),
        GateExprs.hashedTokenScore(col("ws")).as("fast"),
        builtinScore(col("ws")).as("slow"))
      .filter(col("fast") =!= col("slow") ||
        col("fast").isNull =!= col("slow").isNull)
    assert(diff.count() === 0L, diff.collect().take(3).mkString("; "))
    val nulls = Seq((1L, null: Seq[String]), (2L, Seq.empty[String]))
      .toDF("id", "ws")
      .select(col("id"), GateExprs.hashedTokenScore(col("ws")).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(nulls(1L) === null, "null array must stay null")
    assert(nulls(2L) === 0L, "empty array scores 0")
  }
}
