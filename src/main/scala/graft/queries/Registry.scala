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
  /** `spark.read.parquet` on one of the driver-generated tables. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  lazy val all: Seq[Q] =
    Relational.qs ++ Temporal.qs ++ Docs.qs ++ Sim.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
