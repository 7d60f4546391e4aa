package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the oracle.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    doc: String = "")

object Registry {
  /** `spark.read.parquet` on one of the driver-generated tables.
    *
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL)
    * — even when `ts` is pruned away. We read nanos as a raw long
    * (legacy.parquet.nanosAsLong) and convert to a microsecond
    * TIMESTAMP with exact integer math (`div`, no double round-trip —
    * ns-since-epoch ≈ 1.7e18 overflows a double's 53-bit mantissa).
    * DuckDB reads the same column as TIMESTAMP_NS and truncates to µs
    * on cast, so both engines agree.
    */
  // Session-scoped catalog: resolving a table (file listing + footer
  // schema read + relation analysis) costs tens of ms per spark.read —
  // re-paying it on every query construction is what a catalog exists
  // to avoid. DataFrames are immutable, so reuse across queries is safe
  // AS LONG AS the underlying files are not rewritten: the cached plan
  // pins its file-listing snapshot. Callers that rewrite parquet under
  // a cached dir mid-session must call `invalidate(dir)` (or
  // `invalidate()` for everything). Entries whose session has stopped
  // are purged opportunistically on each lookup, so a long-lived JVM
  // cycling many sessions does not grow the map unboundedly.
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Drop every cached table under `dir` (all sessions). Call after
    * rewriting the parquet files in that directory. */
  def invalidate(dir: String): Unit =
    tableCache.keySet.removeIf(k => k._2 == dir)

  /** Drop the whole catalog cache. */
  def invalidate(): Unit = tableCache.clear()

  private def purgeStopped(): Unit =
    tableCache.keySet.removeIf(k => k._1.sparkContext.isStopped)

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    purgeStopped()
    tableCache.computeIfAbsent((s, dir, name), _ => tUncached(s, dir, name))
  }

  private def tUncached(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = s.read.parquet(s"$dir/$name.parquet")
      // Robust to the actual physical type: NANOS reads as long under the
      // flag (convert with exact integer math); micro/milli files read as
      // a timestamp type directly (normalize NTZ → TIMESTAMP under the
      // pinned UTC session zone).
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ =>
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } else s.read.parquet(s"$dir/$name.parquet")

  lazy val all: Seq[Q] =
    Relational.qs ++ Temporal.qs ++ Docs.qs ++ Sim.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
