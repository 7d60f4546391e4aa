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

  test("checkpointed incremental curation: a resumed query processes ONLY new files") {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("inc_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("inc_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("inc_out").toString
    import spark.implicits._
    def docs(ids: Range, tokens: Int) = ids.map { i =>
      (i.toLong, (1 to tokens).map(t => s"w$t").mkString(" "))
    }.toDF("doc_id", "text")

    // batch 1: 20 docs pass the gate, 5 short docs don't
    docs(1 to 20, 8).union(docs(21 to 25, 2))
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      val q = StreamingBuckets.qualityGate(
          spark.readStream.schema(schema).parquet(src))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 20L)

    // batch 2 arrives; the RESUMED query must curate only the new files
    docs(100 to 129, 8).union(docs(130 to 133, 1))
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val ids = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.length === 50, s"expected 20 + 30 curated docs, got ${ids.length}")
    assert(ids.count(_ >= 100L) === 30)
    assert(ids.distinct.length === ids.length, "no doc may be processed twice")
  }

  test("checkpointed spanDedupStream: a killed-and-resumed query cuts snapshot spans exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("span_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("span_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("span_out").toString
    def blk(p: String) = (1 to 16).map(i => s"$p$i").mkString(" ")
    val A = blk("a"); val F = blk("f"); val G = blk("g")
    val keeperBloom = graft.queries.Docs.spanKeeperBloomBytes(
      Seq((100L, A)).toDF("doc_id", "text"), expectedItems = 100L)

    // batch 1 lands, the query runs to completion and is KILLED
    Seq((1L, s"$A $F"), (2L, A)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      val q = StreamingBuckets.spanDedupStream(
          spark.readStream.schema(schema).parquet(src), keeperBloom)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // batch 2 lands; the RESUMED query must process ONLY the new files
    Seq((3L, s"$G $A"), (4L, A)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val rows = spark.read.parquet(out).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    // docs 2 and 4 were pure snapshot spans -> gone; 1 and 3 rebuilt,
    // each exactly once across the kill/resume boundary
    assert(rows.map(_._1).toSeq === Seq(1L, 3L), s"got $rows")
    assert(rows.toMap === Map(1L -> F, 3L -> G))
  }

  test("readStream over documents parquet -> nearDedupStream keeps one doc per signature") {
    val dir = java.nio.file.Files.createTempDirectory("stream_docs").toString
    val docs = graft.queries.Registry.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"),
        // synthesize an arrival timestamp (documents has none)
        to_timestamp(lit("2026-01-01 00:00:00")).as("ts"))
    docs.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
    val query = StreamingBuckets.nearDedupStream(streamed)
      .writeStream.format("memory").queryName("file_neardedup")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val kept = spark.table("file_neardedup").count()
      // batch twin: distinct signature count (shingle-less docs are each
      // their own key) — the streaming filter must keep exactly one per key
      val ws = split(graft.functions.ColFns.normWs(col("text")), " ")
      val batchKeys = spark.read.parquet(dir)
        .withColumn("ws", ws)
        .withColumn("sh", graft.queries.Docs.shingles(col("ws")))
        .withColumn("mh", graft.functions.MinHashExprs.minHashSig(col("sh")))
        .withColumn("sig",
          when(size(col("sh")) >= 1, concat_ws(":", col("mh").cast("array<string>")))
            .otherwise(concat(lit("uniq:"), col("doc_id").cast("string"))))
        .select("sig").distinct().count()
      assert(kept === batchKeys)
      assert(kept > 0 && kept <= docs.count())
    } finally query.stop()
  }
}
