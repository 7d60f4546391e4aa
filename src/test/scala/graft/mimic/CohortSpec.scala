package graft.mimic

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Label semantics against hand-computed expectations on the FIXTURES.md
  * synthetic cohort (reference: day_intervals_cohort_v1.py:240-372). */
class CohortSpec extends SparkSpec {

  private lazy val roles = Cohort.icuRoles

  private lazy val visits = {
    // icustays ⋈ patients(dod) shape the label functions consume
    Fixtures.icustays(spark)
      .join(Fixtures.patients(spark).select(col("subject_id"), col("dod")), Seq("subject_id"))
  }

  test("mortalityLabel: 1 iff dod within [intime, outtime]") {
    val (cohort, invalid) = Cohort.mortalityLabel(visits, roles)
    assert(invalid.count() === 0)
    val labels = cohort.select(col("stay_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels(12L) === 1) // subject 2 dies at outtime boundary (<=)
    assert(labels(11L) === 0)
    assert(labels(51L) === 0)
  }

  test("readmissionLabel: gap-window semantics, last visit always 0") {
    val labeled = Cohort.readmissionLabel(visits, roles, gapDays = 30)
    val labels = labeled.select(col("stay_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // subject 5: v1 (51) readmitted 10d after disch → 1
    assert(labels(51L) === 1)
    // v2 (52): next admit is 40d after disch → 0
    assert(labels(52L) === 0)
    // v3 (53): last visit → 0
    assert(labels(53L) === 0)
    // single-visit subjects → 0
    assert(labels(11L) === 0)
  }

  test("readmissionLabel boundary: admit exactly at disch+gap counts (<= gap)") {
    import spark.implicits._
    val ts = Fixtures.ts _
    val df = Seq(
      (9L, 91L, ts("2019-01-01 00:00:00"), ts("2019-01-02 00:00:00")),
      (9L, 92L, ts("2019-02-01 00:00:00"), ts("2019-02-02 00:00:00")))
      .toDF("subject_id", "stay_id", "intime", "outtime")
    // gap 30: admit 2019-02-01 == disch 01-02 + 30d → within (<=)
    val labels = Cohort.readmissionLabel(df, roles, 30)
      .select(col("stay_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels(91L) === 1)
    // gap 29: outside
    val labels29 = Cohort.readmissionLabel(df, roles, 29)
      .select(col("stay_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels29(91L) === 0)
  }

  test("losLabel: label 1 iff los > threshold") {
    val withLos = Datagen.generateAdm(visits) // los in hours
    val (cohort, _) = Cohort.losLabel(withLos, roles, losThreshold = 48)
    val labels = cohort.select(col("stay_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels(11L) === 1) // 76h
    assert(labels(51L) === 0) // 48h → not > 48
  }

  test("visitPts: adult filter, survivor filter, demographics join") {
    val tmp = java.nio.file.Files.createTempDirectory("mimic").toString
    Fixtures.writeTree(spark, tmp)
    val src = MimicSource(spark, tmp)
    // readmission mode (useAdmn): subject 2 died before outtime? dod ==
    // outtime → kept (dod >= outtime); minor subject 3 dropped
    val v = Cohort.visitPts(src, Cohort.icuRoles, useIcu = true,
      useAdmn = true, diseaseHids = None)
    val stays = v.select(col("stay_id")).collect().map(_.getLong(0)).toSet
    assert(!stays.contains(13L)) // minor
    assert(stays.contains(12L))  // dod == outtime boundary kept
    assert(stays.contains(11L))
    assert(v.columns.toSet.contains("insurance") && v.columns.toSet.contains("ethnicity"))
  }

  test("visitPts: ICU path only applies disease filter under useAdmn (cohort.py:86-88)") {
    val tmp = java.nio.file.Files.createTempDirectory("mimic").toString
    Fixtures.writeTree(spark, tmp)
    val src = MimicSource(spark, tmp)
    import spark.implicits._
    val hids = Seq(101L).toDF("hadm_id") // disease cohort = admission 101 only

    // ICU Mortality/LOS (useAdmn=false): reference IGNORES disease_label
    // on this branch — both adult stays survive
    val noAdmn = Cohort.visitPts(src, Cohort.icuRoles, useIcu = true,
      useAdmn = false, diseaseHids = Some(hids))
      .select(col("stay_id")).collect().map(_.getLong(0)).toSet
    assert(noAdmn.contains(11L) && noAdmn.contains(12L))

    // ICU Readmission (useAdmn=true): filter applies — only hadm 101's stay
    val admn = Cohort.visitPts(src, Cohort.icuRoles, useIcu = true,
      useAdmn = true, diseaseHids = Some(hids))
      .select(col("stay_id")).collect().map(_.getLong(0)).toSet
    assert(admn.contains(11L) && !admn.contains(12L))

    // hosp path applies the filter regardless of useAdmn (cohort.py:112-115)
    val hosp = Cohort.visitPts(src, Cohort.hospRoles, useIcu = false,
      useAdmn = false, diseaseHids = Some(hids))
      .select(col("hadm_id")).collect().map(_.getLong(0)).toSet
    assert(hosp === Set(101L))
  }

  test("extract: ICU mortality end-to-end on fixture tree") {
    val tmp = java.nio.file.Files.createTempDirectory("mimic").toString
    Fixtures.writeTree(spark, tmp)
    val src = MimicSource(spark, tmp)
    val cohort = Cohort.extract(src, useIcu = true, label = "Mortality")
    val labels = cohort.select(col("stay_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels(12L) === 1 && labels(11L) === 0)
    val s = Cohort.summary(cohort, Cohort.icuRoles).head
    assert(s.getAs[Long]("n_visits") === labels.size)
    assert(s.getAs[Long]("n_pos") === 1L)
  }
}
