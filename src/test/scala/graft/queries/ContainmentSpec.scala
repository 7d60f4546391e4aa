package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for d45 (containment dedup): every emitted row's
  * containment equals the exact shingle-set value recomputed in plain
  * Scala, the evict rule drops the SMALLER set (tie → larger doc_id),
  * and the operator's point — a full-quote subset pair that Jaccard
  * would keep — is caught when the pair is a candidate. Identical docs
  * have identical signatures, so their candidate pair is guaranteed
  * regardless of hash luck; the subset pair's candidacy is derived from
  * the engine's own d06 signatures (banding recomputed in the test),
  * so the expected row set is independent of lshCandidatePairs.
  */
class ContainmentSpec extends SparkSpec {

  private def shingleSet(text: String): Set[String] = {
    val ws = text.trim.split("\\s+").toSeq
    if (ws.size < 3) Set.empty
    else ws.sliding(3).map(_.mkString(" ")).toSet
  }

  test("d45: containment exact vs plain-Scala sets; subset pair evicts the contained doc; identical pair evicts the larger id") {
    val dir = Files.createTempDirectory("graft-contain").toString
    import spark.implicits._
    val core = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      // 1 ⊂ 2: doc 1 fully quoted inside doc 2 (containment 1.0, the
      // Jaccard of the pair is well under 0.8 — the d20 verdict keeps it)
      (1L, core),
      (2L, core + " while extra unrelated trailing sentences keep piling on and on" +
        " until the jaccard similarity drops far below any dedup threshold value"),
      // 3 == 4: identical docs → identical signatures → guaranteed pair
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // unrelated singleton
      (5L, "completely different words about spark shuffles and broadcast exchanges"))
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // Expected candidate set from the engine's own signatures (d06),
    // banded 4×2 exactly as the dedup family documents.
    val sig = Registry.queries("d06_minhash_sig")(spark, dir).collect()
      .map(r => r.getLong(0) -> (0 until 4).map(b => (b, r.get(b * 2 + 1), r.get(b * 2 + 2))))
      .toMap
    val expectedPairs = (for {
      a <- sig.keys; b <- sig.keys if a < b
      if sig(a).exists(sig(b).contains)
    } yield (a, b)).toSet
    assert(expectedPairs.contains((3L, 4L)), "identical docs must share every band")

    val byText = docs.toMap
    val rows = Registry.queries("d45_containment_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap

    assert(rows.keySet === expectedPairs)
    for (((a, b), (c, evict)) <- rows) {
      val (sa, sb) = (shingleSet(byText(a)), shingleSet(byText(b)))
      val exact = sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)
      assert(math.abs(c - BigDecimal(exact).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      val expectEvict =
        if (exact < 0.8) None
        else if (sa.size < sb.size) Some(a)
        else if (sb.size < sa.size) Some(b)
        else Some(math.max(a, b))
      assert(evict === expectEvict, s"pair ($a,$b)")
    }
    // the identical pair: containment 1.0, tie → larger id evicts
    assert(rows((3L, 4L)) === ((1.0, Some(4L))))
    // the subset pair (when banded together): the CONTAINED doc evicts
    // even though Jaccard is below threshold — the gate's reason to exist
    if (rows.contains((1L, 2L))) {
      val (c, evict) = rows((1L, 2L))
      assert(c === 1.0 && evict === Some(1L))
      val (sa, sb) = (shingleSet(byText(1L)), shingleSet(byText(2L)))
      val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(jac < 0.8, "fixture must keep the pair below the Jaccard dedup threshold")
    }
  }
}
