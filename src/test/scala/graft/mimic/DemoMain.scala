package graft.mimic

import org.apache.spark.sql.functions._

/** Dev drive harness: runs the full mivdp pipeline on the synthetic
  * fixture tree and prints each stage — the package-boundary surface for
  * manual verification (`sbt "Test/runMain graft.mimic.DemoMain"`). */
object DemoMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val root = java.nio.file.Files.createTempDirectory("mimic_drive").toString
    Fixtures.writeTree(spark, root)
    val out = java.nio.file.Files.createTempDirectory("drive_out").toString
    val pipe = Pipeline(spark, MimicSource(spark, root), s"$root/icd_mapping.txt", out)

    val cohort = pipe.cohort(useIcu = true, label = "Mortality")
    println("=== COHORT ===")
    cohort.orderBy(col("stay_id")).show(10, truncate = false)

    val feats = pipe.featureIcu(cohort)
    val cleaned = pipe.cleanFeatures(feats)
    println("=== CHART SUMMARY ===")
    pipe.summaries(cleaned)("chart").orderBy(col("itemid")).show(truncate = false)

    val ts = pipe.timeSeries(cohort, cleaned, task = "Mortality", imputeHow = "Mean")
    println("=== DYNAMIC (wide MapType rows) ===")
    ts("dynamic").orderBy(col("stay_id"), col("t")).show(5, truncate = false)
    println("=== LABELS ===")
    ts("labels").orderBy(col("stay_id")).show(truncate = false)
    println("stage dirs: " + new java.io.File(out).listFiles().map(_.getName).sorted.mkString(", "))

    // probes: error paths + parquet-preferred rereads
    try pipe.cleanFeatures(feats, groupDiag = "bogus")
    catch { case e: IllegalArgumentException => println("PROBE groupDiag bogus -> " + e.getMessage) }
    try Cohort.extract(MimicSource(spark, root), useIcu = true, label = "Nope")
    catch { case e: IllegalArgumentException => println("PROBE label Nope -> " + e.getMessage) }
    MimicSource(spark, root).ingestToParquet()
    println("PROBE ingest: patients parquet exists = " +
      new java.io.File(s"$root/core/patients.parquet").exists())
    println("PROBE re-read rows via parquet path = " + MimicSource(spark, root).patients.count())

    // sinks + generic pivot surface
    Sinks.writeSummaryTxt(Cohort.summary(cohort, Cohort.icuRoles).head, "MORTALITY", s"$out/summary.txt")
    println("=== SUMMARY TXT ===")
    println(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/summary.txt"))))
    Sinks.writePerStay(ts("chart"), s"$out/per_stay")
    println("per-stay dirs: " + new java.io.File(s"$out/per_stay").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.mkString(", "))
    println("=== PIVOT_COHORT (top-2, wide) ===")
    Features.pivotCohort(cleaned("chart"), "stay_id", "itemid", "valuenum",
      maxFeatures = Some(2)).show(truncate = false)

    // typed Dataset boundary (Model)
    {
      import Model._
      import spark.implicits._
      val meds = MimicSource(spark, root).inputEventsTyped
        .map(m => (m.orderid, (m.endtime.getTime - m.starttime.getTime) / 3600000L))
        .collect().toMap
      println("TYPED med durations (h): " + meds.toSeq.sortBy(_._1).mkString(", "))
    }

    // non-ICU (hospital admissions) path: hadm roles, days-only los
    println("=== HOSP COHORT (Readmission, 30d gap) ===")
    Cohort.extract(MimicSource(spark, root), useIcu = false,
      label = "Readmission", time = 30)
      .select(col("hadm_id"), col("los"), col("label"))
      .orderBy(col("hadm_id")).show(truncate = false)

    // SQL surface for the custom expression
    graft.GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    println("SQL vec_dot self-similarity top-1: " + spark.sql(
      "SELECT vec_id, round(vec_dot(embedding, embedding), 3) AS sq FROM emb ORDER BY sq DESC, vec_id LIMIT 1")
      .head)
    spark.stop()
  }
}
