package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.SparkSpec

/** Session-scoped trained-index cache lifecycle (ADVICE r11): after a
  * corpus rewrite, the DOCUMENTED invalidation sequence
  * (`Registry.invalidate(dir)` + `Sim.invalidateIndexCaches()`) must
  * make every PQ-family query serve results trained on the NEW corpus —
  * clearing only one of the three model caches (the pre-round-12 bug)
  * would leave the others serving stale codebooks / code tables.
  */
class IndexCacheSpec extends SparkSpec {

  /** A tiny labeled embedding corpus where vec 0 (the query) has
    * `twin` as its identical nearest neighbor and everything else is
    * far away — so every PQ variant's top re-ranked row must be
    * `twin`, whatever the codebooks learned. */
  private def writeCorpus(dir: String, twin: Long): Unit = {
    import spark.implicits._
    val base = Array.fill(16)(0.9f)
    val far = (i: Long) => Array.tabulate(16)(j =>
      if (j % 2 == 0) -0.8f - 0.01f * ((i + j) % 7) else 0.7f + 0.01f * ((i * 3 + j) % 5))
    val rows = (0L until 20L).map { i =>
      val e =
        if (i == 0L || i == twin) base.clone()
        else far(i)
      (i, e, i % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
  }

  test("invalidateIndexCaches: every trained PQ index retrains after a corpus rewrite") {
    val dir = Files.createTempDirectory("graft-idxcache").toString
    def topOf(q: String): Long =
      Registry.queries(q)(spark, dir).collect().head.getLong(0)

    writeCorpus(dir, twin = 7L)
    for (q <- Seq("e15_pq_ann", "e19_pq_residual_ann", "e20_pq4_ann", "e21_opq4_ann"))
      assert(topOf(q) === 7L, s"$q should rank the identical twin first")

    // rewrite the corpus in place: a different vector is now the twin
    writeCorpus(dir, twin = 13L)
    Registry.invalidate(dir)
    Sim.invalidateIndexCaches()
    for (q <- Seq("e15_pq_ann", "e19_pq_residual_ann", "e20_pq4_ann", "e21_opq4_ann"))
      assert(topOf(q) === 13L,
        s"$q served a stale index after the documented invalidation sequence")

    // the deprecated alias must clear everything too (doc contract)
    writeCorpus(dir, twin = 4L)
    Registry.invalidate(dir)
    Sim.invalidateResidualModels()
    for (q <- Seq("e15_pq_ann", "e19_pq_residual_ann", "e20_pq4_ann", "e21_opq4_ann"))
      assert(topOf(q) === 4L, s"$q stale after invalidateResidualModels alias")
  }
}
