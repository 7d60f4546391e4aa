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

  /** Adversarial Unicode token generator: the battery's synthetic corpus
    * is ASCII, so these are the shapes the oracles never exercise —
    * zero-width "words", combining marks, astral code points (surrogate
    * pairs in the JVM, 4-byte sequences in UTF-8), RTL text, ligatures,
    * and random valid code points across the BMP and astral planes.
    * Both expressions operate on UTF8String BYTES; the builtins they
    * must equal operate through the same UTF8String layer, so any
    * byte-walk bug (numChars vs numBytes, 4-byte-sequence stride,
    * hash-over-partial-bytes) surfaces as a diff here. */
  private def unicodeTokenRows = {
    val fixed = Vector(
      "​",            // zero-width space as a whole "word"
      "é",           // e + combining acute (2 code points, looks like é)
      "é",                 // precomposed (1 code point) — must NOT equal e+◌́
      "😀😀😀",            // astral: 3 code points, 6 UTF-16 units, 12 UTF-8 bytes
      "𝕊𝕡𝕒𝕣𝕜",         // mathematical alphanumerics (astral)
      "العربية",           // RTL
      "ﬃ",                 // ligature, NFKC-sensitive
      "ｔｈｅ",             // fullwidth "the" — must NOT stop-hit
      "the​",         // stopword + zero-width tail — must NOT stop-hit
      "日本語の形態素解析")
    val scalarGen = org.scalacheck.Gen.frequency(
      6 -> org.scalacheck.Gen.oneOf(fixed),
      2 -> org.scalacheck.Gen.oneOf(GopherStats.stops),
      // random valid code points: BMP below surrogates + an astral band
      2 -> org.scalacheck.Gen.listOfN(3, org.scalacheck.Gen.frequency(
          3 -> org.scalacheck.Gen.choose(0x20, 0xd7ff),
          1 -> org.scalacheck.Gen.choose(0x10000, 0x10fff)))
        .map(cps => cps.map(Character.toChars(_).mkString).mkString))
    val rowGen = org.scalacheck.Gen.listOfN(400,
      org.scalacheck.Gen.choose(0, 12).flatMap(n =>
        org.scalacheck.Gen.listOfN(n, scalarGen)))
    // pureApply with a pinned seed: total (retries internally, never
    // returns Option.empty like .sample) and reproducible run-to-run —
    // a failure here is a deterministic diff, not a flaky None.get
    rowGen.pureApply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(0x6772616674L))
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
  }

  test("gopherStats ≡ builtin chain on adversarial Unicode tokens") {
    import spark.implicits._
    val df = unicodeTokenRows.toDF("id", "ws")
    val diff = df.select(col("id"), col("ws"),
        GateExprs.gopherStats(col("ws")).as("fast"),
        builtinStats(col("ws")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() === 0L, diff.collect().take(3).mkString("; "))
  }

  test("hashedTokenScore ≡ builtin md5 fold on adversarial Unicode tokens") {
    import spark.implicits._
    val df = unicodeTokenRows.toDF("id", "ws")
    val diff = df.select(col("id"), col("ws"),
        GateExprs.hashedTokenScore(col("ws")).as("fast"),
        builtinScore(col("ws")).as("slow"))
      .filter(col("fast") =!= col("slow") ||
        col("fast").isNull =!= col("slow").isNull)
    assert(diff.count() === 0L, diff.collect().take(3).mkString("; "))
  }

  test("gopherStats Unicode semantics pinned: code-point lengths, no NFC folding, exact-bytes stop hits") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("​", "​")),      // two zero-width words: len 1 each
      (2L, Seq("é", "é")),          // distinct BYTES → 2 distinct words
      (3L, Seq("😀😀😀")),                // astral: numChars = 3 code points
      (4L, Seq("ｔｈｅ", "the​"))    // lookalikes never hit the stop set
    ).toDF("id", "ws")
    val got = df.select(col("id"), GateExprs.gopherStats(col("ws")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    assert(got(1L) === Seq(2L, 2L, 0L, 1L, 2L))
    assert(got(2L) === Seq(2L, 3L, 0L, 2L, 1L))  // e+◌́ is 2 chars, é is 1
    assert(got(3L) === Seq(1L, 3L, 0L, 1L, 1L))
    assert(got(4L) === Seq(2L, 7L, 0L, 2L, 1L))
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
