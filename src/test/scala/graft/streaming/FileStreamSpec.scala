package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Real file-source ingest: `readStream` over a parquet directory through
  * the SAME bucketAgg used in batch — the readStream → transform →
  * writeStream path with actual files, not MemoryStream. */
class FileStreamSpec extends SparkSpec {

  test("readStream over events parquet == batch bucketAgg") {
    // stage a copy (file sources want a directory they can list)
    val dir = java.nio.file.Files.createTempDirectory("stream_src").toString
    // Registry.t handles the source's TIMESTAMP(NANOS) physical type
    val batchEvents = graft.queries.Registry.t(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "event_type", "value")
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
    val query = StreamingBuckets.bucketAgg(streamed)
      .writeStream.format("memory").queryName("file_buckets")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val s = spark.table("file_buckets")
        .agg(sum(col("n_events"))).head.getLong(0)
      val b = StreamingBuckets.bucketAgg(spark.read.parquet(dir))
        .agg(sum(col("n_events"))).head.getLong(0)
      assert(s === b)
      assert(s === batchEvents.count())
    } finally query.stop()
  }
}
