package graft.queries

import java.nio.file.Files
import graft.SparkSpec

/** Semantic checks for e23 (radius search): membership is decided by
  * the ROUNDED cosine against the 0.25 threshold — boundary vectors at
  * exactly 0.25 are IN, just-below are OUT — the query row itself is
  * excluded, and null embeddings drop out instead of failing. */
class RadiusSearchSpec extends SparkSpec {

  test("e23: threshold membership incl. the exact-boundary vector; query row and null embeddings excluded") {
    val dir = Files.createTempDirectory("graft-radius").toString
    import spark.implicits._
    val s15 = math.sqrt(15.0).toFloat // cos((1,0),(1,√15)) = 1/4 exactly
    Seq(
      (0L, Some(Seq(1f, 0f)), 9),        // the query vector
      (1L, Some(Seq(2f, 0f)), 1),        // cos 1.0 → in
      (2L, Some(Seq(0f, 3f)), 2),        // cos 0.0 → out
      (3L, Some(Seq(1f, 1f)), 3),        // cos 0.7071 → in
      (4L, Some(Seq(1f, s15)), 4),       // cos 0.2500 → in (boundary)
      (5L, Some(Seq(1f, 5f)), 5),        // cos 0.1961 → out
      (6L, None, 6))                     // null embedding → out, no crash
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    val rows = Registry.queries("e23_radius_search")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap

    assert(rows.keySet === Set(1L, 3L, 4L))
    assert(rows(1L) === ((1, 1.0)))
    assert(rows(3L) === ((3, 0.7071)))
    assert(rows(4L) === ((4, 0.25)))
  }
}
