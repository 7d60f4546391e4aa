package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.SparkSpec

/** The one-pass-per-pattern RedactStats expression must agree exactly
  * with the 4-pass builtin chain it replaced (queries/Docs.scala d17:
  * regexp_extract_all + regexp_replace per pattern) — same engine, same
  * patterns, so any divergence is a bug in the count-while-replace
  * loop, not a regex semantics question. Also pins the d17 regex
  * rewrites (possessive local-part, run-start lookbehind) against the
  * ORIGINAL plain-greedy spelling the DuckDB oracle still uses.
  */
class RedactSpec extends SparkSpec with TableDrivenPropertyChecks {

  // the d17 production spellings
  private val emailRe = "(?<![a-z0-9._%+-])[a-z0-9._%+-]++@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\+?[0-9][0-9-]{6,}+"
  // the plain-greedy spellings (what the DuckDB twin runs via RE2)
  private val emailPlain = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phonePlain = "\\+?[0-9][0-9-]{6,}"

  private def builtin(df: org.apache.spark.sql.DataFrame, eRe: String, pRe: String) = {
    val noEmail = regexp_replace(col("t"), eRe, "<EMAIL>")
    val redacted = regexp_replace(noEmail, pRe, "<PHONE>")
    df.select(col("id"),
      size(regexp_extract_all(col("t"), lit(eRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(pRe), lit(0))).cast("long").as("n_phones"),
      redacted.as("redacted"))
  }

  private def fast(df: org.apache.spark.sql.DataFrame) = {
    val r = RedactExprs.redactStats(col("t"), emailRe, phoneRe)
    df.select(col("id"),
      r.getField("n_emails").as("n_emails"),
      r.getField("n_phones").as("n_phones"),
      r.getField("redacted").as("redacted"))
  }

  private val sharp = Seq(
    "plain words only no matches at all",
    "a@b.co",                                 // minimal email
    "x a@b.co y c.d-e@f-g.h.ij z",            // two emails, classful chars
    "trailing dot fails a@b.c",               // 1-letter TLD: no match
    "a@b.com-x",                              // domain run past the match end
    "@nolocal.com b@.com c@com",              // degenerate forms
    "zzzabc@x.co",                            // match consumes the whole run
    "+1-555-0001234 and 9876543210",          // phones
    "1+2345678",                              // phone starting mid-digit-run
    "12345 too short",                        // 5 digits: below {6,} tail
    "--1234567-- dashes around",
    "a-1@b.co +0-0-0-0-0-0-0",                // email then dashed phone
    "user5@mail.example.com or +1-555-0005",  // the d17 synthetic shape
    "",                                       // empty
    "ünïcödé mixed tëxt a@b.de 1234567")

  test("expression == 4-pass builtin chain on sharp fixtures") {
    import spark.implicits._
    val df = sharp.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val a = fast(df).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    val b = builtin(df, emailRe, phoneRe).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(a === b)
  }

  test("anchored/possessive spellings == plain-greedy spellings (oracle parity)") {
    import spark.implicits._
    val df = sharp.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val a = fast(df).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    val b = builtin(df, emailPlain, phonePlain).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(a === b)
  }

  test("expression == builtin on randomized classful soup (seeded)") {
    import spark.implicits._
    // strings biased toward the regex character classes — the worst case
    // for divergence (runs, dots, dashes, @s, digits in every interleaving)
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "ab.-@+019 _%"
    val docs = (0 until 400).map { i =>
      val n = 1 + rnd.nextInt(60)
      (i.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = docs.toDF("id", "t")
    val a = fast(df).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    val b = builtin(df, emailRe, phoneRe).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    val c = builtin(df, emailPlain, phonePlain).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(a === b)
    assert(a === c)
  }

  test("null text yields null struct fields (builtin chain parity)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("a@b.co"))).toDF("id", "t")
    val rows = fast(df).orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(rows(1).getLong(1) === 1L)
  }
}
