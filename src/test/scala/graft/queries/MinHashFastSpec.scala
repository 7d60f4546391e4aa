package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The xxhash64 production minhash path has no DuckDB oracle, so it is
  * verified by hash-agnostic invariants: exact duplicates share every
  * signature (hence every band, hence a cluster), unrelated documents
  * don't merge, and signatures are deterministic.
  */
class MinHashFastSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("fastmh").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "a", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "b", 43L), // exact dup of 1
      (3L, "completely different legal boilerplate paragraph about warranty terms", "en", "a", 70L),
      (4L, "completely different legal boilerplate paragraph about warranty terms", "en", "c", 70L), // dup of 3
      (5L, "unique musings on distributed aggregation trees and shuffle topology", "en", "a", 69L),
      (6L, null.asInstanceOf[String], "en", "a", 0L) // shingle-less: own cluster
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("exact duplicates share signatures and cluster together; strangers don't merge") {
    val sig = Docs.minhashSignaturesFast(spark, dir)
    val rows = sig.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(3L) === rows(4L))
    assert(rows(1L) !== rows(3L))
    val reps = Docs.dedupClustersFast(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps(1L) === reps(2L))
    assert(reps(3L) === reps(4L))
    assert(reps(1L) !== reps(3L))
    assert(reps(5L) === 5L && reps(6L) === 6L) // singletons keep their own id
    assert(reps.size === 6)
  }

  test("fast signatures are deterministic across invocations") {
    val a = Docs.minhashSignaturesFast(spark, dir).orderBy("doc_id").collect().map(_.toSeq)
    val b = Docs.minhashSignaturesFast(spark, dir).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
