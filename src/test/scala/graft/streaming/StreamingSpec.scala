package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Structured-Streaming mode: the SAME bucketAgg transformation must
  * produce identical results on a stream (micro-batched via MemoryStream)
  * and on the equivalent batch DataFrame. */
case class StreamEv(event_id: Long, ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  private type Ev = StreamEv
  private val Ev = StreamEv

  private def mkEvents: Seq[Ev] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 100).map { i =>
      Ev(i.toLong, new Timestamp(base + i * 5 * 60 * 1000L), // every 5 min
        if (i % 3 == 0) "click" else "view", i.toDouble)
    }
  }

  test("streaming bucketAgg equals batch bucketAgg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents

    val stream = MemoryStream[StreamEv]
    val agg = StreamingBuckets.bucketAgg(stream.toDF())
    val query = agg.writeStream
      .format("memory").queryName("buckets")
      .outputMode("complete").start()
    try {
      // two micro-batches — state must carry across
      stream.addData(events.take(60))
      query.processAllAvailable()
      stream.addData(events.drop(60))
      query.processAllAvailable()
      val streamed = spark.table("buckets")
        .select(col("event_type"), col("bucket_start"), col("n_events"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet

      val batch = StreamingBuckets.bucketAgg(events.toDF())
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("dedupStream drops duplicate event_ids within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamEv]
    val query = StreamingBuckets.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      val evs = mkEvents.take(10)
      stream.addData(evs ++ evs) // duplicates in one batch
      query.processAllAvailable()
      assert(spark.table("dedup").count() === 10)
    } finally query.stop()
  }
}
