package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full query inventory lives in graft.queries.{Relational, Temporal,
  * Docs, Sim}; each entry pairs a Spark DataFrame program with the ANSI
  * SQL the driver runs in DuckDB as the correctness oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The corpus-cleanup composite (d13): lang gate → quality gate →
    * exact dedup → MinHash-LSH near-dup dedup — the engine's
    * end-to-end showcase (SURVEY round-6 table). */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("d13_corpus_clean")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
