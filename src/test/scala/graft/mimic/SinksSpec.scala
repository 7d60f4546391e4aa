package graft.mimic

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sink layout contracts (S7-S9) + the generic pivot_cohort surface. */
class SinksSpec extends SparkSpec {

  test("writeCsvGz produces a single gzip csv part readable back") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/out"
    Sinks.writeCsvGz(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(parts.length === 1)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 2)
  }

  test("writeCsvGz null/empty rendering is byte-compatible with pandas to_csv") {
    import spark.implicits._
    // pandas to_csv renders NaN/None and "" identically: an empty,
    // UNQUOTED field (SURVEY §7.4.7). Golden bytes, not a round-trip —
    // the reference artifacts are diffed byte-for-byte.
    val df = Seq(
      (1L, Option("a"), Option(1.5)),
      (2L, Option.empty[String], Option.empty[Double]),
      (3L, Option(""), Option(2.0)))
      .toDF("id", "s", "x")
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/nulls"
    Sinks.writeCsvGz(df, dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv.gz")).head
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(part))
    val txt = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    assert(txt === "id,s,x\n1,a,1.5\n2,,\n3,,2.0\n")
  }

  test("writeSummaryTxt renders the 4 scalar aggregates") {
    import spark.implicits._
    val cohort = Seq((1L, 10L, 1), (1L, 11L, 0), (2L, 12L, 0))
      .toDF("subject_id", "stay_id", "label")
    val s = Cohort.summary(cohort, Cohort.icuRoles).head
    val p = java.nio.file.Files.createTempDirectory("sink").toString + "/summary.txt"
    Sinks.writeSummaryTxt(s, "MORTALITY", p)
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(txt.contains("# Patients: 2") && txt.contains("# Positive cases: 1"))
  }

  test("writePerStay partitions by stay_id (one dir per stay)") {
    import spark.implicits._
    val df = Seq((10L, 1.0), (11L, 2.0)).toDF("stay_id", "v")
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/stays"
    Sinks.writePerStay(df, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("stay_id=10", "stay_id=11"))
    // partition pruning: reading one stay touches one dir
    val one = spark.read.parquet(dir).filter(col("stay_id") === 10)
    assert(one.count() === 1)
  }

  test("pivotCohort: top-K restriction, deterministic vocab, one-hot mode") {
    import spark.implicits._
    val long = Seq(
      (10L, "hr", 60.0), (10L, "hr", 70.0), (10L, "bp", 120.0),
      (11L, "hr", 80.0), (11L, "spo2", 0.98))
      .toDF("stay_id", "feat", "v")
    // top-2 by count: hr (3), bp/spo2 tie (1) → bp by code asc
    val wide = Features.pivotCohort(long, "stay_id", "feat", "v", maxFeatures = Some(2))
    assert(wide.columns.toSeq === Seq("stay_id", "bp", "hr"))
    val r10 = wide.filter(col("stay_id") === 10).head
    assert(r10.getAs[Double]("hr") === 65.0 && r10.getAs[Double]("bp") === 120.0)
    // one-hot mode: presence flags
    val ohe = Features.pivotCohort(long, "stay_id", "feat", "v", oneHot = true)
    val o11 = ohe.filter(col("stay_id") === 11).head
    assert(o11.getAs[Int]("spo2") === 1 && o11.getAs[Int]("bp") === 0)
  }
}
