package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic checks for the data-curation battery (d14–d17): repetition
  * stats, decontamination overlap, stratified quota sampling, and PII
  * redaction, on crafted documents with hand-computed expectations.
  * (The DuckDB value-oracle runs driver-side; these pin the semantics
  * on inputs the synthetic corpus doesn't contain.)
  */
class CurationSpec extends SparkSpec {

  /** Write crafted docs as `documents.parquet` under a fresh temp dir
    * (the Registry table cache keys on the dir, so each fixture set gets
    * its own). Returns the dir. */
  private def fixture(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-curation").toString
    val df = spark.createDataFrame(rows.map { case (id, text, lang, src) =>
      (id, text, lang, src, if (text == null) 0L else text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d14: dup-token and top-bigram fractions match hand computation") {
    val dir = fixture(Seq(
      (1L, "a a a a", "en", "s"),            // 4 tokens, 1 distinct; bigram "a a" x3
      (2L, "w x y z", "en", "s"),            // all distinct; every bigram unique
      (3L, "go", "en", "s")))                // 1 token, no bigrams
    val out = Registry.queries("d14_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 4L)
    assert(out(1L).getDouble(2) === 0.75)          // 1 - 1/4
    assert(out(1L).getLong(3) === 3L)              // "a a" occurs 3x
    assert(out(1L).getDouble(4) === 1.0)           // 3/3 bigrams are the mode
    assert(out(2L).getDouble(2) === 0.0)
    assert(out(2L).getLong(3) === 1L)
    assert(out(3L).getLong(3) === 0L)              // no bigrams
    assert(out(3L).isNullAt(4))
  }

  test("d15: exact copy of a benchmark doc is fully contaminated; fresh text is clean") {
    val bench = "alpha beta gamma delta epsilon zeta"
    val dir = fixture(Seq(
      (0L, bench, "en", "s"),                     // doc_id % 20 == 0 → benchmark
      (1L, bench, "en", "s"),                     // exact copy → contam 1.0
      (2L, "one two three four five six", "en", "s"), // disjoint → contam 0
      (3L, "tiny doc", "en", "s")))               // <5 tokens → 0 grams, null frac
    val out = Registry.queries("d15_decontam")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(0L))                      // benchmark rows excluded
    assert(out(1L).getLong(1) === 2L && out(1L).getLong(2) === 2L)
    assert(out(1L).getDouble(3) === 1.0)
    assert(out(2L).getLong(2) === 0L && out(2L).getDouble(3) === 0.0)
    assert(out(3L).getLong(1) === 0L && out(3L).isNullAt(3))
  }

  test("d16: deterministic, quota-bounded, and a subset of the input") {
    val docs = (0L until 40L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "fr", s"src${i % 3}"))
    val dir = fixture(docs)
    val a = Registry.queries("d16_stratified_sample")(spark, dir).collect()
    val b = Registry.queries("d16_stratified_sample")(spark, dir).collect()
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted) // deterministic
    val perStratum = a.groupBy(r => (r.getString(1), r.getString(2)))
    assert(perStratum.forall(_._2.length <= 3), "stratum over quota")
    assert(a.forall(_.getLong(3) <= 3L))
    assert(a.map(_.getLong(0)).toSet.subsetOf(docs.map(_._1).toSet))
    // 6 strata x ~6-7 docs each, quota 3 → exactly 18 kept
    assert(a.length === 18)
  }

  test("d19: chunk boundaries, counts, and content hashes match hand computation") {
    val t33 = (1 to 33).map(i => s"w$i").mkString(" ")
    val t10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val t56 = (1 to 56).map(i => s"w$i").mkString(" ")
    val dir = fixture(Seq((1L, t33, "en", "s"), (2L, t10, "en", "s"), (3L, t56, "en", "s")))
    val out = Registry.queries("d19_chunking")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 33 tokens -> [1..32] and [25..33]
    assert(out((1L, 0L)) === ((1L, 32L, md5hex((1 to 32).map(i => s"w$i").mkString(" ")))))
    assert(out((1L, 1L)) === ((25L, 9L, md5hex((25 to 33).map(i => s"w$i").mkString(" ")))))
    // 10 tokens -> single short chunk
    assert(out((2L, 0L)) === ((1L, 10L, md5hex(t10))))
    assert(!out.contains((2L, 1L)))
    // 56 tokens -> [1..32] and [25..56], both full-ish, no third chunk
    assert(out((3L, 1L)) === ((25L, 32L, md5hex((25 to 56).map(i => s"w$i").mkString(" ")))))
    assert(!out.contains((3L, 2L)))
  }

  test("d20: exact duplicates verify at jaccard 1.0 with a true verdict") {
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val other = (100 to 119).map(i => s"zzz$i").mkString(" ")
    val dir = fixture(Seq((1L, text, "en", "s"), (2L, text, "en", "s"), (3L, other, "en", "s")))
    val out = Registry.queries("d20_neardup_verified")(spark, dir).collect()
    val dup = out.find(r => r.getLong(1) === 1L && r.getLong(0) === 2L)
      .orElse(out.find(r => r.getLong(0) === 1L && r.getLong(1) === 2L))
    assert(dup.isDefined, s"identical docs must surface as a candidate pair: ${out.mkString}")
    assert(dup.get.getDouble(2) === 1.0 && dup.get.getBoolean(3))
    assert(!out.exists(r => r.getLong(0) === 3L || r.getLong(1) === 3L),
      "unrelated doc must not pair")
  }

  test("d19: chunk invariants hold at every boundary size") {
    // sizes straddling each formula boundary: window 32, stride 24
    val sizes = Seq(1, 5, 23, 24, 25, 32, 33, 56, 57, 80, 81, 100)
    val dir = fixture(sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"t$t").mkString(" "), "en", "s") })
    val byDoc = Registry.queries("d19_chunking")(spark, dir)
      .collect().groupBy(_.getLong(0))
    sizes.zipWithIndex.foreach { case (n, i) =>
      val chunks = byDoc(i.toLong).sortBy(_.getLong(1))
      val expected = if (n > 32) 1 + (n - 9) / 24 else 1
      assert(chunks.length === expected, s"n=$n chunk count")
      chunks.zipWithIndex.foreach { case (c, k) =>
        assert(c.getLong(2) === 1L + 24L * k, s"n=$n k=$k start")     // stride
        assert(c.getLong(3) === math.min(32L, n - 24L * k), s"n=$n k=$k len")
        assert(c.getLong(3) >= 1L && c.getLong(3) <= 32L)
      }
      // full coverage: last chunk reaches token n
      val last = chunks.last
      assert(last.getLong(2) + last.getLong(3) - 1 === n.toLong, s"n=$n tail coverage")
    }
  }

  test("d21: duplicated docs have dup_chunk_frac 1.0; unique docs 0.0") {
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")  // 2 chunks
    val uniq = (100 to 139).map(i => s"uni$i").mkString(" ")
    val dir = fixture(Seq((1L, text, "en", "s"), (2L, text, "en", "s"), (3L, uniq, "en", "s")))
    val out = Registry.queries("d21_dup_chunks")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((2L, 2L, 1.0)))
    assert(out(2L) === ((2L, 2L, 1.0)))
    assert(out(3L) === ((2L, 0L, 0.0)))
  }

  test("d22: packing offsets and bin spans match hand computation") {
    val tok = (n: Int) => Seq.fill(n)("t").mkString(" ")
    val dir = fixture(Seq(
      (1L, tok(500), "en", "s"),  // [0, 500)   -> bin 0 only
      (2L, tok(20), "en", "s"),   // [500, 520) -> straddles bins 0-1
      (3L, "", "en", "s"),        // zero tokens at offset 520 -> no bins
      (4L, tok(600), "en", "s"),  // [520, 1120) -> bins 1-2
      (5L, tok(7), "de", "s")))   // separate shard: offsets restart at 0
    val rows = Registry.queries("d22_sequence_pack")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows(1L) === ((0L, 0L, 1L)))
    assert(rows(2L) === ((500L, 0L, 2L)))
    assert(rows(3L) === ((520L, 1L, 0L)))
    assert(rows(4L) === ((520L, 1L, 2L)))
    assert(rows(5L) === ((0L, 0L, 1L)))
  }

  test("d22: dominant shard spans >1 sub-shard window; output identical to naive cumsum") {
    import spark.implicits._
    // one dominant shard (120 docs) + a tiny one; subWidth=16 forces the
    // dominant shard's cumsum across >1 window partition group
    val rows = (1L to 120L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("t").mkString(" "), "en", "web")) :+
      (500L, "a b c", "de", "web")
    val docs = rows.toDF("doc_id", "text", "lang", "source")
    val subWidth = 16L
    val fast = Docs.sequencePack(docs, ctx = 64L, subWidth = subWidth)
    // naive single-window reference formulation (the pre-r8 shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"source").orderBy($"doc_id")
    val nTok = coalesce(graft.functions.ColFns.tokenCount($"text"), lit(0L))
    val naive = docs
      .select($"doc_id", $"lang", $"source", nTok.as("n_tokens"))
      .withColumn("end_tok", sum($"n_tokens").over(w))
      .withColumn("start_tok", $"end_tok" - $"n_tokens")
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"start_tok",
        graft.functions.ColFns.floorDiv($"start_tok", 64L).as("first_bin"),
        when($"n_tokens" === 0, 0L)
          .otherwise(graft.functions.ColFns.floorDiv($"end_tok" - 1, 64L) -
            graft.functions.ColFns.floorDiv($"start_tok", 64L) + 1).as("n_bins"))
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(fast.collect().sortBy(key).toSeq === naive.collect().sortBy(key).toSeq)
    // and the dominant shard genuinely splits: >1 sub-shard key value
    val subs = docs.filter($"lang" === "en")
      .select(graft.functions.ColFns.floorDiv($"doc_id", subWidth)).distinct().count()
    assert(subs > 1, s"fixture must span >1 sub-shard, got $subs")
  }

  test("d23: rate sample is deterministic, a subset, and near the nominal rate") {
    val dir = "/root/testdata/sf0.001"
    val a = Registry.queries("d23_rate_sample")(spark, dir)
      .collect().map(_.getLong(0)).sorted
    val b = Registry.queries("d23_rate_sample")(spark, dir)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "sample must be run-to-run identical")
    val n = Registry.t(spark, dir, "documents").count()
    // md5 is uniform: P(|X/n - 0.1| > 5σ) is negligible even at n=500
    val sigma = math.sqrt(0.1 * 0.9 / n)
    assert(math.abs(a.length.toDouble / n - 0.1) <= 5 * sigma,
      s"rate ${a.length.toDouble / n} too far from 0.1 (n=$n)")
  }

  test("d25: surprisal bits and milli-bits/token match hand computation") {
    val dir = fixture(Seq(
      (1L, "a a a a", "en", "s"), // 4× the common token
      (2L, "a b", "en", "s"),     // one common + one rare
      (3L, "c", "en", "s")))      // one rare
    // corpus: N=7 tokens; counts a=5, b=1, c=1
    // bits(7)=3, bits(5)=3, bits(1)=1 → surprisal a=0, b=2, c=2
    val out = Registry.queries("d25_lm_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 4L && out(1L).getLong(2) === 0L &&
      out(1L).getLong(3) === 0L)
    assert(out(2L).getLong(1) === 2L && out(2L).getLong(2) === 2L &&
      out(2L).getLong(3) === 1000L)
    assert(out(3L).getLong(1) === 1L && out(3L).getLong(2) === 2L &&
      out(3L).getLong(3) === 2000L)
  }

  test("d27: rate-1 docs always kept, rate-0 docs always dropped") {
    // corpus: 62 copies of the common token + 2 unique rare tokens →
    // N=64 (7 bits); common c=62 (6 bits) → 1000 milli-bits (rate 1);
    // rare c=1 (1 bit) → 6000 milli-bits (rate 0)
    val dir = fixture(Seq(
      (1L, Seq.fill(62)("x").mkString(" "), "en", "s"),
      (2L, "qqqq zzzz", "en", "s")))
    val out = Registry.queries("d27_importance_sample")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1000L)) // doc 1 kept at rate 1; doc 2 rate 0
  }

  test("d28: two-level positions equal the naive shard-serial window; permutation per shard") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queries("d28_train_order")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent naive formulation: ONE window per shard (the shape the
    // two-level decomposition replaces), same keys
    val naive = Registry.t(spark, dir, "documents")
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        md5(concat(lit("ord:"), col("doc_id").cast("string")).cast("binary")).as("k"))
      .withColumn("shard", conv(substring(col("k"), 1, 1), 16, 10).cast("long") % 8)
      .withColumn("train_pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("k"), col("doc_id"))).cast("long") - 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === naive)
    // per-shard positions are a 0-based permutation
    out.groupBy(_._2._1).foreach { case (_, rows) =>
      val ps = rows.values.map(_._2).toSeq.sorted
      assert(ps === (0L until ps.size.toLong))
    }
  }

  test("d26: deletion-neighborhood pairs at distance 1; transpositions excluded") {
    val dir = fixture(Seq(
      (1L, "hello hello hallo helo", "en", "s"),
      (2L, "world wordl tiny abc", "en", "s"))) // abc: <4 chars, out of vocab
    val out = Registry.queries("d26_typo_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // substitution (hallo↔hello) and deletion (helo↔hello) pair up;
    // world/wordl share deletion variants but sit at distance 2
    // (transposition) and must be killed by the exact check
    assert(out.keySet === Set(("hallo", "hello"), ("hello", "helo")))
    assert(out(("hallo", "hello")) === ((1L, 2L)))
    assert(out(("hello", "helo")) === ((2L, 1L)))
  }

  test("d17: crafted email+phone are redacted and counted") {
    val dir = fixture(Seq(
      (1L, "reach me at john.doe@example.com or 555-123-4567 now", "en", "s"),
      (2L, "no contact info here", "en", "s")))
    val out = Registry.queries("d17_pii_redact")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // 1 in-text + 1 appended synthetic contact each
    assert(out(1L).getLong(1) === 2L && out(1L).getLong(2) === 2L)
    assert(out(2L).getLong(1) === 1L && out(2L).getLong(2) === 1L)
    // differently-formatted international numbers both count as phones
    val dir2 = fixture(Seq(
      (1L, "call +49-30-1234567 today", "en", "s"),
      (2L, "call +33-11-7654321 today", "en", "s")))
    val red = Registry.queries("d17_pii_redact")(spark, dir2).collect()
    assert(red.forall(_.getLong(2) === 2L)) // in-text + appended phone
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("d31: PMI value, min-count cut, and ordering match hand computation") {
    // "new york" appears 5x (passes min count), "of the" 10x (low PMI —
    // both words are frequent), "odd duo" only 4x (cut)
    val docs = (1L to 5L).map(i =>
      (i, "new york of the stuff and of the other rare pair thing", "en", "s")) ++
      (7L to 10L).map(i => (i, "odd duo here", "en", "s"))
    val dir = fixture(docs)
    val out = Registry.queries("d31_collocations")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // corpus: 5 docs x 12 tokens + 4 x 3 = 72 tokens
    // c(new)=5 c(york)=5 c(new york)=5 -> pmi = ln(72*5/25)
    assert(out.contains(("new", "york")))
    assert(out(("new", "york"))._1 === 5L)
    assert(out(("new", "york"))._2 === BigDecimal(math.log(72.0 * 5 / 25))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // c(of)=10 c(the)=10 c(of the)=10 -> pmi = ln(72*10/100), far lower
    assert(out(("of", "the"))._1 === 10L)
    assert(out(("of", "the"))._2 < out(("new", "york"))._2)
    assert(!out.contains(("odd", "duo")), "4 occurrences must not pass the min-count cut")
  }

  test("d32: per-reference leak counts and match volume match hand computation") {
    val bench = "alpha beta gamma delta epsilon zeta"   // grams: a..e, b..z
    val dir = fixture(Seq(
      (0L, bench, "en", "s"),                            // ref doc (leaked)
      (20L, "one two three four five six", "en", "s"),   // ref doc (clean)
      (1L, bench, "en", "s"),                            // verbatim copy: both grams
      (2L, s"intro $bench outro", "en", "s"),            // superset: contains both grams
      (3L, "alpha beta gamma delta epsilon stop", "en", "s"), // shares gram 1 only
      (4L, "totally unrelated text right here", "en", "s")))
    val out = Registry.queries("d32_contam_attribution")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set(0L, 20L))
    // ref 0: targets 1, 2, 3 leak; grams shared: 2 + 2 + 1 = 5
    assert(out(0L) === ((3L, 5L)))
    // ref 20: nobody shares a gram — reported with explicit zeros
    assert(out(20L) === ((0L, 0L)))
  }

  test("d30: duplicate 16-token blocks keep exactly one corpus-wide copy; docs rebuild from survivors") {
    val blockA = (1 to 16).map(i => s"a$i").mkString(" ")
    val blockB = (1 to 16).map(i => s"b$i").mkString(" ")
    val blockC = (1 to 16).map(i => s"c$i").mkString(" ")
    val blockD = (1 to 16).map(i => s"d$i").mkString(" ")
    val dir = fixture(Seq(
      (1L, s"$blockA $blockB", "en", "s"),   // first occurrence of A and B → untouched
      (2L, s"$blockA $blockC", "en", "s"),   // A is (2,0), keeper is (1,0) → removed
      (3L, "u1 u2 u3 u4 u5", "en", "s"),     // one short unique block
      (4L, s"$blockD $blockD", "en", "s")))  // in-DOC repeat: second copy removed
    val out = Registry.queries("d30_dupspan_removal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 2L && out(1L).getLong(2) === 0L)
    assert(out(1L).getLong(3) === 32L)
    assert(out(1L).getString(4) === md5hex(s"$blockA $blockB"))
    assert(out(2L).getLong(2) === 1L)                     // blockA stripped
    assert(out(2L).getLong(3) === 16L)
    assert(out(2L).getString(4) === md5hex(blockC))
    assert(out(3L).getLong(1) === 1L && out(3L).getLong(3) === 5L)
    assert(out(3L).getString(4) === md5hex("u1 u2 u3 u4 u5"))
    assert(out(4L).getLong(2) === 1L)                     // internal dup removed too
    assert(out(4L).getString(4) === md5hex(blockD))
    // corpus invariant: survivors = distinct block contents (each block
    // content kept exactly once, anywhere)
    val kept = out.values.map(r => r.getLong(1) - r.getLong(2)).sum
    assert(kept === 5L)                                   // A B C D + the short block
  }

  test("d39: counts exact under a degenerate fingerprint group (one text x 200k copies)") {
    // the d39 Scaladoc claims a boilerplate fingerprint group streams
    // through WindowExec (spilling, not OOMing) — drive the whole-
    // partition window count through one 200k-row group plus unique
    // rows split across two sources and pin the exact report
    val dupRows = (1L to 200000L).map(i =>
      (i, "the same boilerplate text", "en", if (i % 2 == 0) "sa" else "sb"))
    val uniqRows = (200001L to 200010L).map(i => (i, s"unique text $i", "en", "sa"))
    val dir = fixture(dupRows ++ uniqRows)
    val out = Registry.queries("d39_source_report")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    // sa: 100k dup copies + 10 unique docs; sb: 100k dup copies
    assert(out(("en", "sa")) === ((100010L, 100000L, 999900L)))
    assert(out(("en", "sb")) === ((100000L, 100000L, 1000000L)))
  }
}
