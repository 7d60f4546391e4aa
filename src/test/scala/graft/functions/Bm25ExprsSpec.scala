package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ColFns.{normWs, tokenCount}

/** [[Bm25DocStats]] must be bit-identical to the builtin formulation it
  * replaced in d33 — `tokenCount(text)` for ndl and
  * `size(filter(split(normWs(text), " "), _ === term))` per term for
  * tfs — on arbitrary text, including whitespace shapes the synthetic
  * corpus never exercises. The d33 oracle pins the query output
  * cross-engine; this pins the expression to the builtins directly. */
class Bm25ExprsSpec extends SparkSpec {

  private val terms = Seq("merge", "vector", "stream", "é漢")

  /** The builtin two-pass chain the expression fuses. */
  private def builtin(text: org.apache.spark.sql.Column) =
    struct(
      tokenCount(text).as("ndl"),
      transform(lit(terms.toArray), t =>
        coalesce(
          size(filter(split(normWs(text), " "), x => x === t)).cast("long"),
          lit(0L))).as("tfs"))

  /** Adversarial text shapes: Java-regex `\s` whitespace (the six ASCII
    * chars) must split; Unicode whitespace lookalikes (NBSP, figure
    * space, zero-width space, ideographic space, NEL) must NOT; plus
    * multibyte tokens, blank/empty strings, and run boundaries. */
  private def textRows = {
    val fixed = Vector(
      "",
      "   ",
      "\t\n\f\r",
      "merge",
      " merge ",
      "merge merge\tmerge\nvector",
      "a merge",           // NBSP glues: "a merge" is ONE token
      "merge​vector",      // zero-width space glues
      "　merge　",      // ideographic space glues
      "streamstream",     // NEL is not \s by default
      "é漢 é漢字 merge",
      "x\rmerge\fvectorstream",
      "MERGE Merge merge.",     // case / punctuation: no match except exact
      "mergemerge merge s tream st ream")
    val wsGen = org.scalacheck.Gen.oneOf(" ", "\t", "\n", "", "\f", "\r",
      " ", " ", "​", "　", "")
    val tokGen = org.scalacheck.Gen.frequency(
      4 -> org.scalacheck.Gen.oneOf(terms),
      2 -> org.scalacheck.Gen.oneOf("x", "yz", "漢字", "mergee", "vecto"),
      1 -> org.scalacheck.Gen.const(""))
    val rowGen = org.scalacheck.Gen.listOfN(300,
      org.scalacheck.Gen.choose(0, 12).flatMap(n =>
        org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.zip(tokGen, wsGen))
          .map(_.flatMap { case (t, w) => Seq(t, w) }.mkString)))
    rowGen.pureApply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(0x626d3235L))
      .++(fixed).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  test("bm25DocStats ≡ builtin tokenCount + per-term filter counts") {
    import spark.implicits._
    val df = textRows.toDF("id", "text")
    val diff = df.select(col("id"), col("text"),
        Bm25Exprs.bm25DocStats(col("text"), terms).as("fast"),
        builtin(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() === 0L, diff.collect().take(3).mkString("; "))
  }

  test("bm25DocStats edges: null text → null struct; blank → (0, zeros)") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, ""), (3L, " \t "), (4L, "merge merge"))
      .toDF("id", "text")
      .select(col("id"), Bm25Exprs.bm25DocStats(col("text"), terms).as("s"))
    val got = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null
        else (r.getStruct(1).getLong(0), r.getStruct(1).getSeq[Long](1))))
      .toMap
    assert(got(1L) === null)
    assert(got(2L) === ((0L, Seq(0L, 0L, 0L, 0L))))
    assert(got(3L) === ((0L, Seq(0L, 0L, 0L, 0L))))
    assert(got(4L) === ((2L, Seq(2L, 0L, 0L, 0L))))
  }
}
