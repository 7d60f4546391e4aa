package graft.mimic

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for cluster-scale runs — the knobs
  * that matter for this engine's plan shapes, with the reasoning
  * attached. Local test mains pin only shuffle.partitions; a 100 TB
  * deployment should start from [[apply]].
  */
object Tuning {

  /** Apply scale defaults to a session builder. `shufflePartitions`
    * should be ~2-3× total executor cores; AQE coalesces the excess. */
  def apply(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b
      // AQE re-plans with runtime statistics: converts SMJ→broadcast when
      // a filtered side turns out small, splits skewed partitions, and
      // coalesces tiny post-shuffle partitions.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // hot itemids/event_types: split partitions over 256 MB or 5× median
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // scan parallelism: one task per 128 MB of parquet
      .config("spark.sql.files.maxPartitionBytes", "128m")
      // deterministic timestamps across the whole engine
      .config("spark.sql.session.timeZone", "UTC")
      // broadcast anything under 64 MB — cohort id-lists, stats tables,
      // and the ICD mapping all qualify far beyond the 10 MB default
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
}
