package graft.mimic

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stage-4 semantics: hour-los recompute, bucketing vs the reference's
  * per-bucket loop, dense grid, impute chain, med signal, task windows. */
class DatagenSpec extends SparkSpec {

  test("generateAdm: los recomputed in floor hours, zero-los dropped") {
    val adm = Datagen.generateAdm(Fixtures.icustays(spark))
    val los = adm.select(col("stay_id"), col("los"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(los(11L) === 76L) // 3d 4h 30m → 76 (minutes truncated)
    assert(los(51L) === 48L)
  }

  test("bucketMeds == reference per-bucket loop semantics") {
    import spark.implicits._
    // start_time, stop_time, rate, amount per (stay, item, order)
    val meds = Seq(
      (11L, 1L, 600L, 1L, 0L, 5L, Some(2.0), Some(8.0)),
      (11L, 1L, 600L, 1L, 1L, 6L, Some(4.0), None), // same order, next hour
      (11L, 1L, 600L, 2L, 3L, 4L, None: Option[Double], Some(1.0)))
      .toDF("stay_id", "subject_id", "itemid", "orderid", "start_time",
        "stop_time", "rate", "amount")
    val b = Datagen.bucketMeds(meds, bucket = 2, los = 8)
    val rows = b.collect().map(r => (r.getAs[Long]("orderid"), r.getAs[Long]("t")) ->
      (r.getAs[Double]("stop_time"), r.getAs[Double]("rate"), r.getAs[Double]("amount"))).toMap
    // order 1, bucket 0 (hours 0-1): stop max(5,6)=6 → /2 = 3.0; rate nanmean(2,4)=3; amount nanmean(8)=8
    assert(rows((1L, 0L)) === ((3.0, 3.0, 8.0)))
    // order 2, bucket 1 (hours 2-3): stop 4/2=2, rate null→(null skipped: avg of none = null)
    assert(rows((2L, 1L))._1 === 2.0)
    // events at start_time == los excluded
    val atLos = Seq((11L, 1L, 600L, 9L, 8L, 9L, Some(1.0), Some(1.0)))
      .toDF("stay_id", "subject_id", "itemid", "orderid", "start_time",
        "stop_time", "rate", "amount")
    assert(Datagen.bucketMeds(atLos, 2, 8).count() === 0)
  }

  test("denseGrid injects every (stay,item) × t with nulls") {
    import spark.implicits._
    val b = Seq((11L, 700L, 0L, 1.0), (11L, 700L, 2L, 3.0))
      .toDF("stay_id", "itemid", "t", "valuenum")
    val grid = Datagen.denseGrid(b, losBuckets = 4)
    assert(grid.count() === 4)
    val missing = grid.filter(col("valuenum").isNull)
      .select(col("t")).collect().map(_.getLong(0)).toSet
    assert(missing === Set(1L, 3L))
  }

  test("impute: ffill then bfill then mean") {
    import spark.implicits._
    val g = Seq(
      (11L, 700L, 0L, None: Option[Double]),
      (11L, 700L, 1L, Some(10.0)),
      (11L, 700L, 2L, None: Option[Double]),
      (11L, 700L, 3L, Some(20.0)),
      (11L, 700L, 4L, None: Option[Double]))
      .toDF("stay_id", "itemid", "t", "valuenum")
    val out = Datagen.impute(g, "valuenum", "Mean")
      .orderBy(col("t")).select(col("valuenum")).collect().map(_.getDouble(0))
    // t0: no prior → bfill 10; t2: ffill 10; t4: ffill 20
    assert(out.toSeq === Seq(10.0, 10.0, 10.0, 20.0, 20.0))
    // all-null group falls to within-group mean → null → 0.0
    val empty = Seq((11L, 701L, 0L, None: Option[Double]))
      .toDF("stay_id", "itemid", "t", "valuenum")
    val out2 = Datagen.impute(empty, "valuenum", "Mean").select(col("valuenum")).head.getDouble(0)
    assert(out2 === 0.0)
  }

  test("medSignal over the order-keyed grid: active while ffilled stop_time > t") {
    import spark.implicits._
    val b = Seq((11L, 600L, 1L, 0L, Some(2.5), Some(1.5), Some(6.0)))
      .toDF("stay_id", "itemid", "orderid", "t", "stop_time", "rate", "amount")
    // production shape: grid keyed per (stay, itemid, ORDERID) so filler
    // rows share the ffill window partition
    val grid = Datagen.denseGrid(b, losBuckets = 4,
      keys = Seq("stay_id", "itemid", "orderid"))
    val sig = Datagen.medSignal(grid)
      .orderBy(col("t"))
      .select(col("t"), col("signal"), col("rate")).collect()
    val byT = sig.map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(byT(0L) === ((1, 1.5)))  // stop 2.5 > 0
    assert(byT(2L) === ((1, 1.5)))  // 2.5 > 2 — FILLER row, ffilled
    assert(byT(3L) === ((0, 0.0)))  // 2.5 < 3 → inactive, zeroed
  }

  test("denseGrid keeps observed tail buckets beyond range(losBuckets)") {
    import spark.implicits._
    // include_time=24, bucket=5 → losBuckets=4 but events land in t=4 too;
    // the reference CONCATS missing indices, it never drops observed rows
    val b = Seq((11L, 700L, 4L, 9.0)).toDF("stay_id", "itemid", "t", "valuenum")
    val grid = Datagen.denseGrid(b, losBuckets = 4)
    assert(grid.count() === 5) // 0..3 injected + observed t=4 kept
    assert(grid.filter(col("t") === 4 && col("valuenum") === 9.0).count() === 1)
    // losBuckets<=0 (bucket > include_time): observed rows pass through
    assert(Datagen.denseGrid(b, losBuckets = 0).count() === 1)
  }

  test("frontWindow truncates at include_time; endWindow shifts to the tail") {
    import spark.implicits._
    val adm = Seq((11L, 48L), (12L, 20L)).toDF("stay_id", "los")
    val ev = Seq((11L, 700L, 10L), (11L, 700L, 30L), (12L, 700L, 10L))
      .toDF("stay_id", "itemid", "start_time")
    // front: keep start <= 24 (stay 12 excluded by keepStays filter)
    val keep = adm.filter(col("los") >= 24)
    val front = Datagen.frontWindow(ev, keep, 24, isInterval = false)
    assert(front.select(col("start_time")).collect().map(_.getLong(0)).toSeq === Seq(10L))
    // end-aligned: stay 11 select_time = 48-24 = 24 → event at 30 → 6; at 10 → dropped
    val end = Datagen.endWindow(ev, adm.filter(col("los") >= 24), 24, isInterval = false)
    assert(end.select(col("start_time")).collect().map(_.getLong(0)).toSeq === Seq(6L))
  }

  test("interval endWindow: stop>=0 kept, start floored at 0") {
    import spark.implicits._
    val adm = Seq((11L, 48L)).toDF("stay_id", "los")
    val meds = Seq(
      (11L, 600L, 1L, 20L, 30L),  // start 20-24=-4 → 0; stop 6 → kept
      (11L, 600L, 2L, 10L, 20L))  // stop 20-24=-4 → dropped
      .toDF("stay_id", "itemid", "orderid", "start_time", "stop_time")
    val out = Datagen.endWindow(meds, adm, 24, isInterval = true)
      .select(col("orderid"), col("start_time"), col("stop_time")).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L)
    assert(out.head.getLong(1) === 0L && out.head.getLong(2) === 6L)
  }

  test("capacity: max group count and max rows per stay (A6)") {
    import spark.implicits._
    val b = Seq(
      (11L, 700L, 0L), (11L, 700L, 1L), (11L, 701L, 0L),
      (12L, 700L, 0L))
      .toDF("stay_id", "itemid", "t")
    val (maxGroups, maxRows) = Datagen.capacity(b, Seq("stay_id", "itemid"))
    assert(maxGroups === 2L) // stay 11 has items {700, 701}
    assert(maxRows === 3L)
  }

  test("capacity: empty input returns (0, 0), not NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("stay_id", "itemid", "t")
    assert(Datagen.capacity(empty, Seq("stay_id", "itemid")) === (0L, 0L))
  }

  test("perStayNested: one row per stay, itemid -> t-ordered value array") {
    import spark.implicits._
    val grid = Seq(
      (11L, 700L, 0L, 1.0), (11L, 700L, 1L, 2.0), (11L, 700L, 2L, 3.0),
      (11L, 701L, 0L, 9.0), (11L, 701L, 1L, 9.0), (11L, 701L, 2L, 9.0),
      (12L, 700L, 0L, 4.0), (12L, 700L, 1L, 5.0), (12L, 700L, 2L, 6.0))
      .toDF("stay_id", "itemid", "t", "valuenum")
    val nested = Datagen.perStayNested(grid, "valuenum", "chart")
    assert(nested.count() === 2)
    val m11 = nested.filter(col("stay_id") === 11).head
      .getAs[Map[Long, Seq[Double]]]("chart")
    assert(m11(700L) === Seq(1.0, 2.0, 3.0)) // position == t
    assert(m11(701L) === Seq(9.0, 9.0, 9.0))
    val m12 = nested.filter(col("stay_id") === 12).head
      .getAs[Map[Long, Seq[Double]]]("chart")
    assert(m12(700L) === Seq(4.0, 5.0, 6.0))
  }

  test("wideModality + assemble: MapType rows joined on (stay,t)") {
    import spark.implicits._
    val chart = Seq((11L, 0L, 700L, 1.5), (11L, 0L, 701L, 2.5))
      .toDF("stay_id", "t", "itemid", "valuenum")
    val proc = Seq((11L, 0L, 900L, 1.0)).toDF("stay_id", "t", "itemid", "present")
    val wide = Datagen.assemble(Seq(
      Datagen.wideModality(chart, "valuenum", "chart"),
      Datagen.wideModality(proc, "present", "proc")))
    val row = wide.head
    val chartMap = row.getAs[Map[Long, Double]]("chart")
    assert(chartMap === Map(700L -> 1.5, 701L -> 2.5))
    assert(row.getAs[Map[Long, Double]]("proc") === Map(900L -> 1.0))
  }
}
