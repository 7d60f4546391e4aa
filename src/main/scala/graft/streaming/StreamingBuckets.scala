package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest mode for the engine's temporal core —
  * the reference is batch-only (SURVEY §2.6), so this is the north-star
  * extension: the SAME tumbling-bucket aggregation (T1,
  * data_generation_icu.py:537-604) expressed over an unbounded stream.
  *
  * The transformation is input-agnostic: pass a batch DataFrame and it
  * plans as a normal aggregate; pass a `readStream` source and it plans
  * as a stateful streaming aggregate — one definition, two runtimes.
  * With a watermark, state for closed windows is dropped, so the
  * operator runs indefinitely at cluster scale.
  */
object StreamingBuckets {

  /** Tumbling bucket counts/sums per (event_type, window). For streaming
    * input, `withWatermark` bounds state; for batch input it's a no-op
    * column-metadata marker. */
  def bucketAgg(events: DataFrame, bucketLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), bucketLen).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("event_type"), col("w.start").as("bucket_start"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup by key within the watermark horizon — the streaming
    * twin of exact dedup (d09): dropDuplicates keeps first-seen state
    * per key and expires it past the watermark. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))
}
