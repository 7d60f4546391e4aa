package graft

import org.apache.spark.sql.functions._
import graft.mimic._

/** End-to-end pipeline run on the synthetic fixture tree — mirrors the
  * reference's pytest style (full upstream run + schema/shape
  * assertions, SURVEY §5) with golden values where we pinned semantics. */
class PipelineE2ESpec extends SparkSpec {

  lazy val tmpRoot: String = {
    val d = java.nio.file.Files.createTempDirectory("mimic_e2e").toString
    Fixtures.writeTree(spark, d)
    d
  }

  test("full ICU mortality pipeline: cohort → features → summaries → time series") {
    val out = java.nio.file.Files.createTempDirectory("graft_out").toString
    val pipe = Pipeline(spark, MimicSource(spark, tmpRoot), s"$tmpRoot/icd_mapping.txt", out)

    val cohort = pipe.cohort(useIcu = true, label = "Mortality")
    assert(cohort.count() > 0)
    assert(cohort.columns.contains("label"))

    val feats = pipe.featureIcu(cohort)
    assert(feats.keySet === Set("diag", "out", "chart", "proc", "med"))
    feats.values.foreach(df => assert(df.count() > 0))
    // preproc schemas (FIXTURES.md stage schemas)
    assert(feats("chart").columns.toSet ===
      Set("itemid", "stay_id", "valuenum", "valueuom", "event_time_from_admit"))
    assert(feats("med").columns.contains("start_hours_from_admit"))

    val cleaned = pipe.cleanFeatures(feats, groupDiag = "convert",
      cleanChart = true, imputeOutlier = true, thresh = 98, leftThresh = 0)
    assert(cleaned("diag").columns.toSet ===
      Set("subject_id", "hadm_id", "stay_id", "new_icd_code"))

    val sums = pipe.summaries(cleaned)
    assert(sums("chart").columns.toSet ===
      Set("itemid", "mean_frequency", "missing_count", "total_count"))
    assert(sums("diag").columns.toSet ===
      Set("new_icd_code", "mean_frequency", "total_count"))

    val ts = pipe.timeSeries(cohort, cleaned, task = "Mortality",
      includeTime = 24, bucket = 1, predW = 6, imputeHow = "Mean")
    assert(ts.contains("dynamic") && ts.contains("labels") && ts.contains("demo"))
    val dyn = ts("dynamic")
    // stay 11 (los 76h >= 30) survives; per-(stay,t) rows bounded by include_time
    assert(dyn.select(col("stay_id")).distinct().count() >= 1)
    assert(dyn.agg(max(col("t"))).head.getLong(0) < 24)
    // chart map column carries itemid→value entries
    val m = ts("chart")
    assert(m.filter(col("valuenum").isNull).count() === 0) // imputed
  }

  test("readmission task produces end-aligned windows") {
    val out = java.nio.file.Files.createTempDirectory("graft_out2").toString
    val pipe = Pipeline(spark, MimicSource(spark, tmpRoot), s"$tmpRoot/icd_mapping.txt", out)
    val cohort = pipe.cohort(useIcu = true, label = "Readmission", time = 30)
    assert(cohort.filter(col("label") === 1).count() >= 1)
    val feats = pipe.featureIcu(cohort, diag = false, out = false, chart = true,
      proc = false, med = false)
    val ts = pipe.timeSeries(cohort, feats, task = "Readmission", includeTime = 24)
    // stay 11 (los 76h): only the late events (hours 60, 70) survive the
    // end-aligned shift — at t = 60-52 = 8 and 70-52 = 18
    val t11 = ts("chart").filter(col("stay_id") === 11 && col("valuenum").isNotNull)
    // dense grid carries all 24 buckets; the observed (pre-impute) values
    // land at shifted offsets < 24
    assert(ts("chart").agg(max(col("t"))).head.getLong(0) < 24)
    assert(t11.count() > 0)
  }
}
