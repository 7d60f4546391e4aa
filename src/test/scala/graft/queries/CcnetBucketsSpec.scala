package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for d44 (CCNet perplexity terciles): bucket labels
  * follow the per-language surprisal ordering, thresholds are computed
  * PER LANGUAGE, and value ties collapse into one bucket (the
  * histogram-threshold semantics — no ntile tie-splitting).
  *
  * The corpus is built so the exact milli-bits are hand-derivable:
  * 36 en + 16 fr tokens = 52 total → bits(52) = 6; "data" appears 21×
  * → bits 5; every unique word once → bits 1; every fr word 4× →
  * bits 3. So en class mbpts are 1000 / 2000 / 5000 and fr's is 3000.
  */
class CcnetBucketsSpec extends SparkSpec {

  test("d44: en terciles land head/middle/tail; fr ties all collapse to head; thresholds are per-lang") {
    val dir = Files.createTempDirectory("graft-ccnet").toString
    import spark.implicits._
    val en =
      (0 until 3).map(i => (i.toLong, "data data data data")) ++
      (3 until 6).map(i => (i.toLong, s"data data uniq$i data")) ++
      (6 until 9).map(i => (i.toLong, s"aa$i bb$i cc$i dd$i"))
    val fr = (9 until 13).map(i => (i.toLong, "le chat dort bien"))
    (en.map { case (id, t) => (id, t, "en") } ++
      fr.map { case (id, t) => (id, t, "fr") })
      .map { case (id, t, l) => (id, t, l, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val rows = Registry.queries("d44_ccnet_buckets")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3))))
      .toMap

    assert(rows.size === 13)
    // en: 3 distinct mbpt classes of 3 docs each → exact terciles
    for (i <- 0 until 3) assert(rows(i.toLong) === (("en", 1000L, "head")))
    for (i <- 3 until 6) assert(rows(i.toLong) === (("en", 2000L, "middle")))
    for (i <- 6 until 9) assert(rows(i.toLong) === (("en", 5000L, "tail")))
    // fr: every doc has the same mbpt (3000) → t1 = t2 = 3000 → every
    // doc is head (ties never split across buckets). Per-lang isolation:
    // 3000 would be "tail" under en's thresholds (t2 = 2000).
    for (i <- 9 until 13) assert(rows(i.toLong) === (("fr", 3000L, "head")))
  }
}
