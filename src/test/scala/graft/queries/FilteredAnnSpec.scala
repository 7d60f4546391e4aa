package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for e22 (predicate-filtered ANN) on crafted inputs:
  * pre-filter semantics (the globally best vector is excluded by the
  * metadata predicate, not ranked-then-dropped) and probe pruning (a
  * vector in an unprobed cell never appears even when it passes the
  * predicate). */
class FilteredAnnSpec extends SparkSpec {

  test("e22: pre-filter + multi-probe IVF returns the best ALLOWED vectors from PROBED cells only") {
    val dir = Files.createTempDirectory("graft-fann").toString
    import spark.implicits._
    // Query vec 0 = [1, 0]. Cells by label: 0 and 1 point query-ward
    // (centroid dots 0.933 / 0.9), cell 2 points away (-1) → best-2
    // probe = {0, 1}. vec 1 is the global cosine winner but lang=de;
    // vec 4 is lang=en but lives in the unprobed cell 2.
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.8f, 0.2f), 0),
      (3L, Seq(0.9f, 0.1f), 1),
      (4L, Seq(-1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    Seq(
      (0L, "q", "en", "s", 1L),
      (1L, "best but filtered", "de", "s", 17L),
      (2L, "allowed", "en", "s", 7L),
      (3L, "allowed best", "en", "s", 12L),
      (4L, "allowed, unprobed cell", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val rows = Registry.queries("e22_filtered_ann")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // exactly the two allowed-and-probed candidates, best first
    assert(rows.map(_._1).toSeq === Seq(3L, 2L))
    // vec 3 ([0.9, 0.1]) outranks vec 2 ([0.8, 0.2]) against [1, 0]
    assert(rows(0)._2 > rows(1)._2 && rows(1)._2 > 0.9)
    // neither the filtered global winner nor the unprobed-cell vector leaks in
    assert(!rows.map(_._1).contains(1L) && !rows.map(_._1).contains(4L))
  }
}
