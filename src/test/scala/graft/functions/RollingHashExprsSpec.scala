package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[RollingHash]] to the builtin formulation it replaces —
  * `coalesce(aggregate(transform(words(text), code), 0, fold), 0)` —
  * on adversarial inputs: multibyte and astral-plane code points
  * (first/last char decode + char counting), every `\s` byte as a
  * separator, blank/empty/null text, and long token streams where the
  * mod discipline matters. */
class RollingHashExprsSpec extends SparkSpec {

  private def builtin(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val code = (x: org.apache.spark.sql.Column) =>
      (ascii(x) * lit(256L) + ascii(substring(x, -1, 1)) * lit(16L) + length(x)).cast("long")
    val ws = split(graft.functions.ColFns.normWs(c), " ")
    coalesce(aggregate(transform(ws, x => code(x)), lit(0L),
      (acc, v) => pmod(acc * 31L + v, lit(1000000007L))), lit(0L))
  }

  test("rollingHash ≡ builtin words/transform/aggregate chain on adversarial inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabets = Seq("abcdef", "éüñßø", "日本語漢字", "😀🎉🚀", "a1!_-")
    def tok(): String = {
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until 1 + rnd.nextInt(6)).map(_ => a(rnd.nextInt(a.length))).mkString
    }
    val seps = Seq(" ", "\t", "\n", "\r", "  ", " \n\t ")
    val gen = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ => tok())
        .mkString(seps(rnd.nextInt(seps.length))))
    }
    val edge = Seq((900L, ""), (901L, "   "), (902L, "\t\n"), (903L, "x"),
      (904L, " leading"), (905L, "trailing "), (906L, "😀"), (907L, "é é é"))
    val df = (gen ++ edge).toDF("id", "text")
      .union(Seq((999L, Option.empty[String])).toDF("id", "text"))
    val rows = df.select(col("id"),
      RollingHashExprs.rollingHash(col("text")).as("got"),
      builtin(col("text")).as("want")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}: '${r}'")
    }
    // null text pins to 0 explicitly (builtin needs the coalesce too)
    assert(rows.find(_.getLong(0) == 999L).get.getLong(1) === 0L)
  }
}
