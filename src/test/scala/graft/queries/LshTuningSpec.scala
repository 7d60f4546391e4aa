package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for d42 (LSH banding tuning report): the sample
  * gate, the per-config subset/cost ordering, and exact counts on a
  * crafted corpus where the only true duplicate pair is known. */
class LshTuningSpec extends SparkSpec {

  test("d42: identical docs hit every config; cost orders by sensitivity; off-sample dups are invisible") {
    val dir = Files.createTempDirectory("graft-lshtune").toString
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog today and tomorrow"
    Seq(
      (3L, dup),                                              // in sample
      (13L, dup),                                             // in sample — THE true pair
      (23L, "completely different words about spark shuffles and exchanges everywhere"),
      (33L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (5L, dup),                                              // identical but OFF-sample
      (7L, dup))                                              // identical but OFF-sample
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("d42_lsh_tuning")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // identical docs share every minhash, so ALL configs surface them
    assert(rows.keySet === Set("b8r1", "b4r2", "b2r4"))
    // exactly one true duplicate pair (3, 13); (5, 7) is off-sample and
    // (5, 3)/(7, 13)... never enter — the sample gate is load-bearing
    for ((cfg, (cand, ver, tru, ppm)) <- rows) {
      assert(tru === 1L, s"$cfg n_true")
      assert(ver === 1L, s"$cfg n_verified")
      assert(ppm === 1000000L, s"$cfg recall_ppm")
      assert(cand >= 1L, s"$cfg n_candidates")
    }
    // coarser bands can only shed candidates (the subset argument)
    assert(rows("b2r4")._1 <= rows("b4r2")._1 &&
      rows("b4r2")._1 <= rows("b8r1")._1)
  }
}
