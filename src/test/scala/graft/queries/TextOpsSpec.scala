package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 text/mixing operators (d33–d36, e16)
  * on hand-computable fixtures — the oracle battery checks engine
  * equivalence at sf0.01; these check the MATH means what the Scaladoc
  * says it means.
  */
class TextOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("d33 bm25: higher tf + shorter doc outranks; term-free docs absent") {
    val d = docs(
      1L -> "apple banana apple",
      2L -> "apple banana cherry date egg fig grape hat ice jug",
      3L -> "banana cherry")
    val out = Docs.bm25TopKDf(d, Seq("apple"), 10)
      .orderBy(col("score_micro").desc).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L), "only docs containing a query term score")
    assert(out.head.getLong(0) === 1L, "tf=2 in a 3-token doc must outrank tf=1 in a 10-token doc")
    assert(out.forall(_.getLong(1) > 0), "Lucene idf is always positive, so scores are positive")
  }

  test("d33 bm25: integer scores are layout-independent") {
    val d = docs((1L to 40L).map(i => i -> s"apple w$i x y z"): _*)
    val a = Docs.bm25TopKDf(d.repartition(7), Seq("apple"), 10).collect().toSet
    val b = Docs.bm25TopKDf(d.coalesce(1), Seq("apple"), 10).collect().toSet
    assert(a === b)
  }

  test("d34 bigram surprisal: repeated bigrams score below all-unique bigrams") {
    // doc1's lone bigram pair occurs 32/31 times → smoothed ratio ≈ 1
    // → ~0 bits; doc2's bigrams are all unique → bits(1+V)−bits(2) ≥ 2
    // (integer-bits granularity needs a wide gap to register)
    val d = docs(
      1L -> Seq.fill(32)("x y").mkString(" "),
      2L -> "a b c d e f g h i j")
    val out = Docs.bigramSurprisalDf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(2L),
      s"frequent-bigram doc must be less surprising, got $out")
  }

  test("d34 bigram surprisal: docs with <2 tokens drop (d25's zero-token convention)") {
    val d = docs(1L -> "solo", 2L -> "two tokens")
    val ids = Docs.bigramSurprisalDf(d).collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
    // 1 bigram, c(ab)=1, history c("two ·")=1, V=3 distinct unigrams:
    // bits(1+3) - bits(1+1) = 3 - 2 = 1 bit
    val r = Docs.bigramSurprisalDf(d).collect().head
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L && r.getLong(3) === 1000L)
  }

  test("d35 bpe pairs: occurrence-weighted within-word pair counts") {
    val d = docs(1L -> "ab ab abc", 2L -> "x")
    val out = Docs.bpeMergePairsDf(d, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "ab"×2 contributes ab:2; "abc" contributes ab:1, bc:1; "x" too short
    assert(out === Map("ab" -> 3L, "bc" -> 1L))
  }

  test("d36 mixture plan: quotas honor weights without upsampling") {
    import spark.implicits._
    // en: 1000 tokens, de: 100 tokens → T = min(2_500_000? no:
    // 1000·1e6/400000 = 2500, 100·1e6/150000 = 666) = 666
    val en = (1 to 100).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "en"))
    val de = (101 to 110).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "de"))
    val d = (en ++ de).toDF("doc_id", "text", "lang")
    val out = Docs.mixturePlanDf(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nEn, wEn, qEn, _) = out("en")
    val (nDe, wDe, qDe, rDe) = out("de")
    assert((nEn, nDe) === (1000L, 100L))
    assert((wEn, wDe) === (400000L, 150000L))
    assert(qEn === 266L && qDe === 99L, s"quotas from T=666: got $out")
    // never upsample; the binding language (de) saturates its inventory
    assert(out.values.forall { case (n, _, q, r) => q <= n && r <= 1000000L })
    assert(rDe >= 990000L, "binding language must be near-fully sampled")
  }

  test("d37 gopher rules: each rule flips exactly its own mask bit") {
    val d = docs(
      // 12 tokens, mwl in range, has 'the'+'a', no repetition, diverse → keep
      1L -> "the a quick brown fox jumps over lazy dogs near riverbank today",
      // 3 tokens → fails min count (bit 1), stopwords (bit 4), and the
      // repetition ratio (bit 8: 1 of 3 tokens = 333333 ppm > 150000 —
      // short docs trip the ratio rules, which is why Gopher gates on
      // count first)
      2L -> "tiny doc here",
      // 12 tokens of one repeated word → top_ppm=1e6 (bit 8), ttr (bit 16),
      // stopwords absent (bit 4); mean len 4 passes
      3L -> Seq.fill(12)("spam").mkString(" "),
      // empty text → n=0: fails count, len, stop, rep, ttr = 31
      4L -> "")
    val out = Docs.gopherRulesDf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(6), r.getLong(7))).toMap
    assert(out(1L) === (0L, 1L), s"clean doc must keep: $out")
    assert(out(2L) === (1L + 4L + 8L, 0L))
    assert(out(3L) === (4L + 8L + 16L, 0L))
    assert(out(4L) === (31L, 0L))
  }

  test("d37 gopher rules: top-token fold equals the explode+mode count") {
    val d = docs(1L -> "b a b c b a", 2L -> "x y z", 3L -> "q")
    val folded = Docs.gopherRulesDf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap // top_ppm
    // doc1: top 'b'=3 of 6 → 500000 ppm; doc2: 1 of 3 → 333333; doc3: 1e6
    assert(folded === Map(1L -> 500000L, 2L -> 333333L, 3L -> 1000000L))
  }

  test("d38 hashed scorer: weights deterministic and layout-independent") {
    val d = docs((1L to 50L).map(i => i -> s"tok$i the a common words here"): _*)
    val a = Docs.hashedScoreDf(d.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Docs.hashedScoreDf(d.coalesce(1)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b, "hashed score must not depend on physical layout")
    // same token bag ⇒ same score regardless of order (integer sum)
    val p = docs(1L -> "alpha beta gamma", 2L -> "gamma alpha beta")
    val s = Docs.hashedScoreDf(p).collect().map(_.getLong(2)).distinct
    assert(s.length === 1, "score is a bag-of-words sum, order-free")
  }

  test("d38 hashed scorer: empty/zero-token docs score 0 and keep") {
    val d = docs(1L -> "", 2L -> "  ")
    val out = Docs.hashedScoreDf(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSet === Set((1L, 0L, 0L, 0L, 1L), (2L, 0L, 0L, 0L, 1L)))
  }

  test("e17 hard negatives: every result is cross-label and ranked like e02") {
    val dir = "/root/testdata/sf0.001"
    val e = Registry.t(spark, dir, "embeddings")
    val ql = e.filter(col("vec_id") === 0).select(col("label")).collect().head.getInt(0)
    val out = Registry.queries("e17_hard_negatives")(spark, dir).collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) != ql.toLong),
      "hard negatives must exclude the anchor's label")
    // equals e02's full cross-label ranking cut to k: recompute via e02's
    // body shape (rounded cosine, vec_id tie) filtered by label
    val full = Registry.queries("e02_ann_topk")(spark, dir)
    // e02 keeps top-10 over ALL labels; e17's set must be the cross-label
    // prefix of the same ordering — check contained ordering consistency
    val e02 = full.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      e02.get(r.getLong(0)).foreach(c => assert(c === r.getDouble(2),
        "shared vectors must carry identical rounded cosines"))
    }
  }

  test("e16 topic mix: purity bounded, members partition the scoreable set") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queries("e16_topic_mix")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) > 0L && r.getLong(3) <= 1000000L),
      "purity_ppm must lie in (0, 1e6]")
    val scoreable = Registry.t(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull &&
        !exists(col("embedding"), _.isNull)).count()
    assert(out.map(_.getLong(1)).sum === scoreable,
      "cluster members must partition the scoreable vectors")
  }
}
