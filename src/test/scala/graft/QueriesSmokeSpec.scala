package graft

import graft.queries.Registry

/** Every registered gate query runs on sf0.001 and yields a readable,
  * non-degenerate result (the DuckDB value-oracle runs driver-side;
  * this pins schema stability and run-ability per operator). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // Queries whose result can legitimately be empty at sf0.001
  private val mayBeEmpty = Set("q05_anti_join", "d07_lsh_pairs", "e05_embed_neardup")

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.forall(c => c == c.toLowerCase),
        s"${q.name} has non-lowercase columns (driver compare sorts by name)")
    }
  }

  test("every query has oracle SQL or a documented omission") {
    // q38: approx_count_distinct sketches differ across engines — the
    // driver records the weaker rows-only check for it by design.
    val allowedNoOracle = Set("q38_approx_vocab")
    val missing = Registry.all.filter(_.sql.isEmpty).map(_.name)
      .filterNot(allowedNoOracle)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
