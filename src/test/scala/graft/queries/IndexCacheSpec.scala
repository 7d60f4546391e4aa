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

  test("semDedupIndex: one clustering per corpus snapshot; documented invalidation retrains") {
    val dir = Files.createTempDirectory("graft-semdedupcache").toString
    def reps(): Map[Long, Long] =
      Registry.queries("e10_semdedup")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    writeCorpus(dir, twin = 7L)
    Registry.invalidate(dir)
    Sim.invalidateIndexCaches()
    val before = Sim.indexCacheSize
    val a = reps()
    assert(a(7L) === 0L, "identical twin must share vec 0's cluster")
    assert(Sim.indexCacheSize === before + 1, "first build must train the cluster index")
    val a2 = reps()
    assert(Sim.indexCacheSize === before + 1,
      "a second build of the same corpus must serve from the cache, not retrain")
    assert(a2 === a)

    // corpus rewrite + the documented invalidation sequence → fresh clusters
    writeCorpus(dir, twin = 13L)
    Registry.invalidate(dir)
    Sim.invalidateIndexCaches()
    val b = reps()
    assert(b(13L) === 0L, "retrained index must cluster the NEW twin with vec 0")
    assert(b(7L) !== 0L, "the old twin is far from vec 0 in the rewritten corpus")
  }

  test("stored index: save → load → serve is bit-identical to the in-session serve") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-idxstore").toString
    val idx = Files.createTempDirectory("graft-idxstore-idx").toString
    writeCorpus(dir, twin = 7L)
    Sim.invalidateIndexCaches()
    val e = Registry.t(spark, dir, "embeddings")
    Sim.savePq4Index(e, idx)
    val inSession = Sim.pq4AdcCandidates(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromStore = Sim.pq4CandidatesFromIndex(spark, idx,
        e.select(col("vec_id"), col("embedding"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore === inSession,
      "stored-index serve diverges from the session-cache serve")
    // the stored format is the model pair itself
    val (cw, codes) = Sim.loadPq4Index(spark, idx)
    assert(cw.columns.sorted === Array("c", "pos", "sub", "w"))
    assert(codes.columns.sorted === Array("b", "mask", "packed", "vec_id"))
  }

  test("index append: new vectors encode against the stored codebook, no retrain") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-idxapp").toString
    val idx = Files.createTempDirectory("graft-idxapp-idx").toString
    writeCorpus(dir, twin = 7L)
    Sim.invalidateIndexCaches()
    val e = Registry.t(spark, dir, "embeddings")
    Sim.savePq4Index(e, idx)
    // a NEW vector identical to the query arrives after the index is built
    val twin2 = Seq((99L, Array.fill(16)(0.9f), 1L)).toDF("vec_id", "embedding", "label")
    Sim.appendPq4Index(spark, idx, twin2)
    val q = e.filter(col("vec_id") === 0L).select(col("vec_id"), col("embedding"))
    val ranked = Sim.pq4CandidatesFromIndex(spark, idx, q).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the appended twin must carry the SAME ADC distance as the original
    // twin (identical vector, same codebook, no retrain happened)
    val byId = ranked.toMap
    assert(byId.contains(99L), "appended vector missing from the served index")
    assert(byId(99L) === byId(7L),
      "appended twin's ADC distance diverges from the original twin's — " +
        "the append must encode against the STORED codebook")
  }
}
