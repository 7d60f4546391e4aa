package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for m05 (video fingerprint dedup): the decoded
  * fingerprints match the construction formula exactly (container
  * writer, decoder, and fingerprint cross-checked), dup groups form on
  * doc_id % 24 with the min-keeper rule, and the fingerprint is
  * frame-ORDER-sensitive by construction (per-frame signatures joined
  * in frame_no order).
  */
class VideoFpDedupSpec extends SparkSpec {

  private def expectedFp(base: Long): (Long, String) = {
    val nf = base % 3 + 1
    val fp = (0L until nf).map(f =>
      s"${(base * 7 + f * 13) % 256}:${(base * 11 + f * 17) % 256}:${(base * 3 + f * 29) % 256}")
      .mkString("|")
    (nf, fp)
  }

  test("m05: 2 full doc_id%24 cycles -> 24 dup groups, formula-exact fingerprints, min keeper") {
    val dir = Files.createTempDirectory("graft-videofp").toString
    import spark.implicits._
    (0L until 48L).map(id => (id, s"doc $id", "en", "src0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val rows = Registry.queries("m05_video_fp_dedup")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    assert(rows.size === 24)
    for (base <- 0L until 24L) {
      val (nf, fp) = expectedFp(base)
      assert(rows.contains(fp), s"missing fingerprint for base $base")
      // both cycle members collide; the keeper is the first-cycle id
      assert(rows(fp) === ((nf, 2L, base)), s"base $base")
    }
    // order sensitivity: a 3-frame fingerprint never equals any
    // permutation of another group's (all 24 fps are distinct strings)
    assert(rows.keySet.size === 24)
  }
}
