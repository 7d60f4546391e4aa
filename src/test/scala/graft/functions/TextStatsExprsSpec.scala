package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[MarkerStats]] and [[BpeRunStats]] to the builtin
  * formulations they replace (queries/Docs.scala d02/d03/d10) on
  * adversarial inputs: multibyte + astral-plane code points (char
  * counting via code points, not UTF-16 units), every `\s` byte as a
  * separator (but NOTE 0x20 is the only separator d10's regex knows),
  * blank/empty/null text, marker words embedded inside larger tokens
  * (must NOT match), and repeated markers (must count every hit). */
class TextStatsExprsSpec extends SparkSpec {

  private def normWs(c: Column) = trim(regexp_replace(c, "\\s+", " "))
  private def words(c: Column) = split(normWs(c), " ")

  private val groups = Seq(
    Seq("the", "a"), Seq("data", "spark", "stream"), Seq("join", "merge", "hash"))

  private def adversarial = {
    val rnd = new scala.util.Random(31)
    val markers = groups.flatten
    val fillers = Seq("xs", "éü", "日本語", "😀🚀", "a1!", "thedata", "ajoin", "datax")
    val seps = Seq(" ", "\t", "\n", "\r", "", "\f", "  ", " \n\t ")
    def tok(): String =
      if (rnd.nextBoolean()) markers(rnd.nextInt(markers.length))
      else fillers(rnd.nextInt(fillers.length))
    val gen = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(25)).map(_ => tok())
        .mkString(seps(rnd.nextInt(seps.length))))
    }
    val edge = Seq((900L, ""), (901L, "   "), (902L, "\t\n"), (903L, "the"),
      (904L, " the a "), (905L, "the the the"), (906L, "😀 the 😀"),
      (907L, "a"), (908L, "tab\tand0x0Bruns"), (909L, "é1ü2ñ3"))
    gen ++ edge
  }

  test("markerStats ≡ builtin split + filter(isin) chain on adversarial inputs") {
    import spark.implicits._
    val df = adversarial.toDF("id", "text")
    val ws = words(col("text"))
    val ms = MarkerStats.markerStats(col("text"), groups)
    val rows = df.select(col("id"),
      ms.getField("n_tokens").as("gt"),
      size(ws).cast("long").as("wt"),
      ms.getField("n_chars_norm").as("gc"),
      length(normWs(col("text"))).cast("long").as("wc"),
      ms.getField("g0").as("g0"),
      size(filter(ws, x => x.isin(groups(0): _*))).cast("long").as("w0"),
      ms.getField("g1").as("g1"),
      size(filter(ws, x => x.isin(groups(1): _*))).cast("long").as("w1"),
      ms.getField("g2").as("g2"),
      size(filter(ws, x => x.isin(groups(2): _*))).cast("long").as("w2")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"n_tokens mismatch: $r")
      assert(r.getLong(3) === r.getLong(4), s"n_chars_norm mismatch: $r")
      assert(r.getLong(5) === r.getLong(6), s"g0 mismatch: $r")
      assert(r.getLong(7) === r.getLong(8), s"g1 mismatch: $r")
      assert(r.getLong(9) === r.getLong(10), s"g2 mismatch: $r")
    }
  }

  test("markerStats null text → null struct (mirrors the builtin chain)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String])).toDF("id", "text")
    val got = df.select(
      MarkerStats.markerStats(col("text"), groups).as("ms")).collect()
    assert(got.head.isNullAt(0))
  }

  test("bpeRunStats ≡ builtin triple regexp_extract_all on adversarial inputs") {
    import spark.implicits._
    // tabs/newlines are `other` to d10's regex — the adversarial set
    // covers them plus class transitions without separators (é1ü2ñ3,
    // a1!, thedata) and multibyte runs.
    val df = adversarial.toDF("id", "text")
    val bs = BpeRunStats.bpeRunStats(col("text"))
    val rows = df.select(col("id"),
      bs.getField("n_bpe").as("gb"),
      size(regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"), lit(0))).cast("long").as("wb"),
      bs.getField("n_alpha").as("ga"),
      size(regexp_extract_all(col("text"), lit("[a-zA-Z]+"), lit(0))).cast("long").as("wa"),
      bs.getField("n_num").as("gn"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).cast("long").as("wn")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"n_bpe mismatch: $r")
      assert(r.getLong(3) === r.getLong(4), s"n_alpha mismatch: $r")
      assert(r.getLong(5) === r.getLong(6), s"n_num mismatch: $r")
    }
  }

  test("bpeRunStats null text → null struct") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String])).toDF("id", "text")
    val got = df.select(BpeRunStats.bpeRunStats(col("text")).as("bs")).collect()
    assert(got.head.isNullAt(0))
  }
}
