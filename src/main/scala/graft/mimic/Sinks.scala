package graft.mimic

import org.apache.spark.sql.{DataFrame, Row}

/** Output sinks matching the reference's artifact surface (SURVEY S7-S10).
  * Parquet is the default stage boundary; the csv.gz writer exists for
  * byte-compat with the reference's files, and the per-stay fan-out
  * becomes a partitioned write — one directory per stay, the same layout
  * contract as the reference's per-stay csv dirs, but splittable and
  * pruned.
  */
object Sinks {

  /** S7: cohort/features csv.gz sink (cohort.py:660-664). Single gzip
    * member like pandas' to_csv — coalesce(1) is intentional here (these
    * artifacts are small); large data belongs in parquet().
    *
    * Null/empty rendering follows pandas' convention byte-for-byte
    * (golden test in SinksSpec): NaN/None AND the empty string are both
    * an empty unquoted field — Spark's default would quote the empty
    * string as `""`, which pandas' reader round-trips but a byte diff
    * against the reference artifact would flag. */
  def writeCsvGz(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("compression", "gzip")
      .option("nullValue", "").option("emptyValue", "").csv(path)

  /** S8: cohort summary txt (cohort.py:667-683) — driver-side write of
    * the 4 scalar aggregates. */
  def writeSummaryTxt(summary: Row, label: String, path: String): Unit = {
    val txt =
      s"""$label FOR ${summary.getAs[Long]("n_visits")} VISITS
         |# Admissions: ${summary.getAs[Long]("n_visits")}
         |# Patients: ${summary.getAs[Long]("n_patients")}
         |# Positive cases: ${summary.getAs[Long]("n_pos")}
         |# Negative cases: ${summary.getAs[Long]("n_neg")}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(path), txt.getBytes)
  }

  /** S9: per-stay fan-out (datagen.py csv/<stay_id>/... layout) as a
    * partitioned columnar write — partition pruning gives O(1) access to
    * one stay's data at any scale. */
  def writePerStay(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("stay_id").parquet(path)

  /** S10: vocabulary sidecar (datagen.py:936-984) — small distinct list
    * as single-file CSV next to the data. */
  def writeVocab(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
