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
