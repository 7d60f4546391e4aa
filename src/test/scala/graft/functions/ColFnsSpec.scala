package graft.functions

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Property tests for the pandas-compat column helpers — the §2.4
  * truncation semantics are the #1 silent-drift risk (SURVEY §7.4.1). */
class ColFnsSpec extends SparkSpec {

  private def hoursBetween(endS: Long, startS: Long): Long = {
    import spark.implicits._
    val df = Seq((new Timestamp(startS * 1000L), new Timestamp(endS * 1000L)))
      .toDF("s", "e")
    df.select(ColFns.tdHours(col("e"), col("s"))).head.getLong(0)
  }

  test("tdHours equals pandas day*24+hour component semantics (floor)") {
    // pandas renders -4980s as '-1 days +22:37:00' → -24 + 22 = -2
    assert(hoursBetween(0L, 4980L) === -2L)
    assert(hoursBetween(4980L, 0L) === 1L)   // +1:23:00 → 1
    assert(hoursBetween(3600L, 0L) === 1L)
    assert(hoursBetween(-3600L, 0L) === -1L)
    assert(hoursBetween(0L, 0L) === 0L)
    assert(hoursBetween(-1L, 0L) === -1L)    // '-1 days +23:59:59' → -24+23
  }

  test("tdHours floor property on random offsets (batch)") {
    val gen = Gen.chooseNum(-1000000L, 1000000L)
    val samples = Gen.listOfN(200, gen).sample.get
    import spark.implicits._
    val df = samples.map(d => (new Timestamp(0L), new Timestamp(d * 1000L), d))
      .toDF("s", "e", "d")
    val rows = df.select(ColFns.tdHours(col("e"), col("s")).as("h"), col("d")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) === Math.floorDiv(r.getLong(1), 3600L),
        s"offset ${r.getLong(1)}")
    }
  }

  test("floorDiv matches Math.floorDiv incl. negatives") {
    import spark.implicits._
    val vals = Seq(-7L, -1L, 0L, 1L, 7L, -3600L, 3599L)
    val df = vals.toDF("x")
    val got = df.select(ColFns.floorDiv(col("x"), 4L)).collect().map(_.getLong(0))
    assert(got.toSeq === vals.map(Math.floorDiv(_, 4L)))
  }

  test("tokenCount counts whitespace tokens after normalization") {
    import spark.implicits._
    val df = Seq("a b  c", "  ", "", "one", "x\t y").toDF("t")
    val got = df.select(ColFns.tokenCount(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(3L, 0L, 0L, 1L, 2L))
  }

  test("cosine of identical vectors is 1") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = df.select(ColFns.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("DoubleOrderBits is monotone over sign/magnitude/zero boundaries") {
    import spark.implicits._
    val vals = Seq(Double.NegativeInfinity, -1e300, -2.5, -1.0, -1e-300, -0.0,
      0.0, 1e-300, 0.5, 1.0, 2.5, 1e300, Double.PositiveInfinity)
    val got = vals.toDF("v")
      .select(graft.functions.DoubleOrderBits.orderBits(col("v"))).collect().map(_.getLong(0))
    assert(got.toSeq === got.sorted.toSeq)
    // strict except at -0.0/0.0 which must stay adjacent
    assert(got.distinct.length >= got.length - 1)
  }

  test("histPercentilesByKey == percentilesByKey (ties, negatives, 1-row and null-only groups)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(4000) { i =>
      val k = s"g${i % 5}"
      val v: java.lang.Double = (i % 5) match {
        case 0 => rnd.nextInt(10).toDouble                 // heavy ties
        case 1 => rnd.nextDouble() * 2000 - 1000           // negatives
        case 2 => math.exp(rnd.nextDouble() * 20 - 10)     // wide magnitude
        case 3 => if (i % 7 == 0) null else rnd.nextDouble()
        case _ => 42.0                                     // constant group
      }
      (k, v)
    } ++ Seq(("solo", java.lang.Double.valueOf(3.25)), ("allnull", null: java.lang.Double))
    val df = rows.toDF("k", "v")
    val ps = Seq("p05" -> 0.05, "p50" -> 0.5, "p95" -> 0.95)
    def collectMap(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getString(0) ->
        (1 to ps.size).map(i => r.getDouble(i)).toSeq).toMap
    val a = collectMap(ColFns.percentilesByKey(df, "k", "v", ps))
    // coarse shift too: many values collapse into one bucket, local ranks do the work
    for (shift <- Seq(40, 58)) {
      val b = collectMap(ColFns.histPercentilesByKey(df, "k", "v", ps, bucketShift = shift))
      assert(b.keySet === a.keySet)        // null-only group absent from both
      assert(!a.keySet.contains("allnull"))
      a.foreach { case (k, exp) =>
        assert(b(k) === exp, s"key=$k shift=$shift")  // bit-identical doubles
      }
    }
  }

  test("percentilesByKeyAdaptive dispatches by size estimate, identical results either way") {
    import spark.implicits._
    val df = Seq.tabulate(500)(i => (s"g${i % 3}", i.toDouble)).toDF("k", "v")
    val ps = Seq("p05" -> 0.05, "p95" -> 0.95)
    def rows(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    val exp = rows(ColFns.percentilesByKey(df, "k", "v", ps))
    // tiny threshold -> histogram branch; huge -> window branch; both equal
    for (t <- Seq("1", (1L << 40).toString)) {
      spark.conf.set("spark.graft.percentiles.histMinBytes", t)
      try assert(rows(ColFns.percentilesByKeyAdaptive(df, "k", "v", ps)) === exp, s"thresh=$t")
      finally spark.conf.unset("spark.graft.percentiles.histMinBytes")
    }
    // branch choice is observable in the plan: the histogram branch joins
    // on the bucket column, the window branch has no `_b` attribute
    spark.conf.set("spark.graft.percentiles.histMinBytes", "1")
    val histPlan = ColFns.percentilesByKeyAdaptive(df, "k", "v", ps)
      .queryExecution.optimizedPlan.toString
    spark.conf.set("spark.graft.percentiles.histMinBytes", (1L << 40).toString)
    val winPlan = ColFns.percentilesByKeyAdaptive(df, "k", "v", ps)
      .queryExecution.optimizedPlan.toString
    spark.conf.unset("spark.graft.percentiles.histMinBytes")
    assert(histPlan.contains("_b") && !winPlan.contains("_b"))
  }
}
