package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for d41 (BPE merge application) on crafted corpora
  * with hand-simulated merge outcomes: overlap chains need the
  * multi-pass sweep, same-char runs converge to the documented
  * alternating split, merges apply in mined-rank order, and
  * non-mergeable words (uppercase/short/unicode) stay out of both the
  * mining and the encoding. */
class BpeApplySpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val dir = Files.createTempDirectory("graft-bpe").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    Registry.queries("d41_bpe_apply")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("d41: overlap chain ththth fully merges via the pass sweep; aaaa splits [aa][aa]") {
    // corpus pairs: th x3, aa x3, ht x2 -> merges [aa, th, ht] (count
    // DESC, pair ASC). 'ththth' = t h t h t h -> th th th (pass 1 merges
    // occurrences 1 and 3, pass 2 catches the separator-consumed middle
    // one); 'aaaa' = a a a a -> aa aa (the simultaneous-merge variant's
    // alternating split, documented on bpeApplyDf).
    val out = run(Seq((1L, "ththth"), (2L, "aaaa")))
    assert(out(1L) === ((1L, 6L, 3L)))
    assert(out(2L) === ((1L, 4L, 2L)))
  }

  test("d41: earlier merge consumes the char a later merge needed (rank order is load-bearing)") {
    // corpus: 'thethe' (th x2, he x2, et x1) + 'hehe' (he x2, eh x1) ->
    // counts: he 4, th 2, eh 1, et 1 -> merges [he, th, eh, et].
    // 'thethe': t h e t h e -> he first: t [he] t [he]; th can no longer
    // apply (h is consumed); eh/et see no single-char pairs left.
    // 4 symbols. 'hehe': [he] [he] -> 2 symbols.
    val out = run(Seq((1L, "thethe"), (2L, "hehe")))
    assert(out(1L) === ((1L, 6L, 4L)))
    assert(out(2L) === ((1L, 4L, 2L)))
  }

  test("fused BpeEncodeStats == builtin replace chain, byte-for-byte (seeded random + sharp)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val alpha = "abthe01" // small alphabet -> dense merges, deep chains
    def word() = Seq.fill(1 + rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
    val randomDocs = Seq.tabulate(300) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(8))(word()).mkString(" "))
    }
    val sharpDocs = Seq(
      (1000L, ""), (1001L, "x"), (1002L, "aaaaaaaaaaaaaaaa"),
      (1003L, "ththththththth"), (1004L, "ab ab ab ab"),
      (1005L, "a b a b a b"), (1006L, "the the the he he th"))
    val docs = (randomDocs ++ sharpDocs).toDF("doc_id", "text")
    val withElig = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), graft.queries.Docs.bpeEligWords.as("elig"))
    // mined merges AND adversarial hand lists (same-char pair, chain
    // pairs, a pair absent from the corpus, rank order shuffled)
    val mined = graft.queries.Docs.bpeMergesEligibleDf(docs, 8)
      .collect().map(_.getString(0)).toSeq
    val handLists = Seq(
      Seq("aa", "th", "he", "ab", "ba", "e0", "01", "zz"),
      Seq("th", "ht", "aa", "a0"),
      mined.reverse)
    for (merges <- mined +: handLists) {
      val fused = graft.queries.Docs.bpeEncodeFrom(withElig, merges)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      val chain = withElig
        .select((col("doc_id") +: graft.queries.Docs.bpeEncodeColsChain(merges)): _*)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(fused.keySet === chain.keySet)
      fused.foreach { case (id, v) =>
        assert(v === chain(id), s"doc_id=$id merges=$merges")
      }
    }
  }

  test("d41: uppercase, len-1, and non-ASCII words are out of scope; stats say so") {
    val out = run(Seq((1L, "Hello a X9 Ünïcödé"), (2L, "thth the")))
    // doc 1 has NO mergeable words: zero counts, and its pairs never
    // entered the mining (else 'll'/'He' could outrank 'th')
    assert(out(1L) === ((0L, 0L, 0L)))
    // doc 2: pairs th x3 (thth: th,ht,th; the: th,he) -> 'th' wins.
    // thth -> [th][th]; the -> [th] e. 2 words, 7 chars, 2+2=4 symbols? no:
    // thth = t h t h -> th th (2), the = t h e -> th e (2) -> 4 total.
    assert(out(2L) === ((2L, 7L, 4L)))
  }
}
