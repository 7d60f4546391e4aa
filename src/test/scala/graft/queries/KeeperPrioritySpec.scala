package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for d43 (cross-source keeper selection): the keeper
  * of a near-dup cluster is the (source, doc_id)-minimum — source rank
  * beats doc_id — and the per-source attrition report books every doc
  * exactly once. */
class KeeperPrioritySpec extends SparkSpec {

  test("d43: priority source wins the cluster; same-source ties fall to min doc_id; singletons keep themselves") {
    val dir = Files.createTempDirectory("graft-keeper").toString
    import spark.implicits._
    val dupA = "the quick brown fox jumps over the lazy dog today and tomorrow"
    val dupB = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    Seq(
      // cluster {1, 2} spans sources: the b_crawl copy arrived FIRST
      // (smaller doc_id) but a_wiki outranks it — keeper must be doc 2
      (1L, dupA, "b_crawl"),
      (2L, dupA, "a_wiki"),
      // singleton: keeps itself
      (3L, "completely different words about spark shuffles and exchanges", "b_crawl"),
      // same-source cluster {4, 5}: tie falls to min doc_id
      (4L, dupB, "b_crawl"),
      (5L, dupB, "b_crawl"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("d43_keeper_priority")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // a_wiki holds 1 doc and wins its cluster (doc 1's copy evicts)
    assert(rows("a_wiki") === ((1L, 1L, 0L)))
    // b_crawl holds 4 docs, keeps the singleton (3) and the same-source
    // cluster's min id (4); docs 1 and 5 evict
    assert(rows("b_crawl") === ((4L, 2L, 2L)))
    // conservation: every doc is either kept or evicted, exactly once
    val (docs, keeps, evicts) = rows.values.foldLeft((0L, 0L, 0L)) {
      case ((d, k, e), (nd, nk, ne)) => (d + nd, k + nk, e + ne)
    }
    assert(docs === 5L && keeps + evicts === docs)
  }
}
