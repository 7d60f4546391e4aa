package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  test("chain, clique, and singleton components converge to min labels") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("u", "v")
    val comps = ConnectedComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("non-convergence at maxIter raises under strict, never silent") {
    import spark.implicits._
    // a 30-node path cannot converge in 1 round even with pointer jumping
    val edges = (1 until 30).map(i => (i.toLong, (i + 1).toLong)).toDF("u", "v")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(edges, maxIter = 1, strict = true,
        localThreshold = 0)
    }
    assert(e.getMessage.contains("did NOT converge"))
    // non-strict: returns (possibly under-merged) labels for every node
    // and logs a WARN instead of throwing
    val lax = ConnectedComponents.components(edges, maxIter = 1,
      localThreshold = 0)
    assert(lax.count() === 30)
  }

  test("long path needs multiple rounds and still converges") {
    import spark.implicits._
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("u", "v")
    val comps = ConnectedComponents.components(edges, localThreshold = 0)
    assert(comps.select(col("rep")).distinct().count() === 1)
    assert(comps.agg(min(col("rep"))).head.getLong(0) === 1L)
    assert(comps.count() === n)
  }

  test("single-task union-find fast path equals the distributed loop") {
    import spark.implicits._
    // pseudo-random graph: chains, merges, and self-contained cliques
    val rnd = new scala.util.Random(42)
    val edges = (1 to 400).map { _ =>
      val a = rnd.nextInt(120).toLong; val b = rnd.nextInt(120).toLong
      (a, b)
    }.toDF("u", "v")
    val fast = ConnectedComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = ConnectedComponents.components(edges, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === loop)
    assert(fast.nonEmpty)
  }

  test("components frees intermediate checkpoint blocks — only the result stays persisted") {
    import spark.implicits._
    val sc = spark.sparkContext
    val edges = (1 until 50).map(i => (i.toLong, (i + 1).toLong)).toDF("u", "v")
    for (threshold <- Seq(0L, 4L << 20)) { // distributed loop; union-find fast path
      val before = sc.getPersistentRDDs.keySet
      val comps = ConnectedComponents.components(edges, localThreshold = threshold)
      assert(comps.count() === 50)
      val leaked = sc.getPersistentRDDs.keySet -- before
      // at most the returned frame's own checkpoint may remain: leaked
      // edge/round blocks starved execution memory over a 75-query
      // battery at sf10 (AGGREGATE_OUT_OF_MEMORY in a later query)
      assert(leaked.size <= 1,
        s"threshold=$threshold leaked ${leaked.size} persisted RDDs")
    }
  }

  test("union-find primitive map: growth past initial capacity and extreme ids") {
    import spark.implicits._
    // >64k distinct nodes forces several LongLongMap doublings; the
    // Long.MinValue / MaxValue ids exercise the sentinel side-slot.
    val chain = (0L until 70000L).sliding(2).map(s => (s(0), s(1))).toSeq
    val extremes = Seq((Long.MinValue, 0L), (Long.MaxValue, 69999L))
    val comps = ConnectedComponents.components((chain ++ extremes).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size === 70002)
    // everything connects through the chain; min id is Long.MinValue
    assert(comps.values.forall(_ == Long.MinValue))
  }
}
