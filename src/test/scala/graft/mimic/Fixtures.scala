package graft.mimic

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic MIMIC-IV fixture per FIXTURES.md design requirements:
  * a minor (P4), a death-before-discharge (P2), readmission inside /
  * outside the gap + single-visit subjects (W1), ICD-9 codes with
  * 0 / 1 / duplicate mapping matches (J13), an itemid with UOM majority
  * above and below the cutoff (A8), chart outliers (A7), med intervals
  * crossing the include-time boundary and events before intime (§2.4
  * negative offsets), and los with non-zero minutes (truncation).
  */
object Fixtures {

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** subjects: 1 normal, 2 dies in stay, 3 minor, 5 has 3 visits */
  def patients(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "F", 45, 2015, "2014 - 2016", None: Option[Timestamp]),
      (2L, "M", 60, 2015, "2014 - 2016", Some(ts("2019-01-05 10:00:00"))),
      (3L, "F", 17, 2015, "2014 - 2016", None: Option[Timestamp]),
      (5L, "M", 30, 2015, "2017 - 2019", None: Option[Timestamp]))
      .toDF("subject_id", "gender", "anchor_age", "anchor_year",
        "anchor_year_group", "dod")
  }

  def admissions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // subject 1: one admission
      (1L, 101L, ts("2019-01-01 08:00:00"), ts("2019-01-04 12:30:00"),
        None: Option[Timestamp], 0, "Medicare", "WHITE"),
      // subject 2: dies in hospital
      (2L, 102L, ts("2019-01-02 00:00:00"), ts("2019-01-05 10:00:00"),
        Some(ts("2019-01-05 10:00:00")), 1, "Medicaid", "BLACK"),
      // subject 3: minor
      (3L, 103L, ts("2019-01-01 00:00:00"), ts("2019-01-02 00:00:00"),
        None: Option[Timestamp], 0, "Other", "ASIAN"),
      // subject 5: three visits — v2 within 30d of v1 disch (label 1),
      // v3 40d after v2 disch (label 0), v3 last (label 0)
      (5L, 501L, ts("2019-01-01 00:00:00"), ts("2019-01-03 00:00:00"),
        None: Option[Timestamp], 0, "Medicare", "WHITE"),
      (5L, 502L, ts("2019-01-13 00:00:00"), ts("2019-01-15 00:00:00"),
        None: Option[Timestamp], 0, "Medicare", "WHITE"),
      (5L, 503L, ts("2019-02-24 00:00:00"), ts("2019-02-26 00:00:00"),
        None: Option[Timestamp], 0, "Medicare", "WHITE"))
      .toDF("subject_id", "hadm_id", "admittime", "dischtime", "deathtime",
        "hospital_expire_flag", "insurance", "ethnicity")
  }

  /** icustays: los has non-zero minutes (stay 11: 3d 4h 30m = 76h floor). */
  def icustays(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 101L, 11L, ts("2019-01-01 08:00:00"), ts("2019-01-04 12:30:00"), 3.19),
      (2L, 102L, 12L, ts("2019-01-02 00:00:00"), ts("2019-01-05 10:00:00"), 3.42),
      (3L, 103L, 13L, ts("2019-01-01 00:00:00"), ts("2019-01-02 00:00:00"), 1.0),
      (5L, 501L, 51L, ts("2019-01-01 00:00:00"), ts("2019-01-03 00:00:00"), 2.0),
      (5L, 502L, 52L, ts("2019-01-13 00:00:00"), ts("2019-01-15 00:00:00"), 2.0),
      (5L, 503L, 53L, ts("2019-02-24 00:00:00"), ts("2019-02-26 00:00:00"), 2.0))
      .toDF("subject_id", "hadm_id", "stay_id", "intime", "outtime", "los")
  }

  /** chartevents: itemid 700 has 2 UOMs at 96% majority (minority drops at
    * cutoff .95), itemid 701 at 60% (kept), itemid 702 single UOM; one
    * event BEFORE intime (negative offset), outlier values on 700. */
  def chartevents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = ts("2019-01-01 09:00:00")
    def at(h: Int) = new Timestamp(base.getTime + h * 3600L * 1000L)
    val uom700 = (1 to 24).map(i =>
      (11L, at(i), 700L, Some(i.toDouble), if (i <= 23) "mg" else "mL"))
    val uom701 = (1 to 5).map(i =>
      (11L, at(i), 701L, Some(10.0 + i), if (i <= 3) "mg" else "mL"))
    val single = Seq(
      (11L, at(2), 702L, Some(1000.0), "u"), // outlier high
      (11L, at(3), 702L, Some(1.0), "u"),
      (11L, at(4), 702L, Some(2.0), "u"),
      (11L, at(5), 702L, Some(3.0), "u"),
      (11L, at(6), 702L, None: Option[Double], "u"), // null valuenum drops
      (11L, new Timestamp(base.getTime - 5 * 3600L * 1000L), 702L, Some(9.0), "u"), // before intime
      (11L, at(60), 702L, Some(5.0), "u"), // late events: inside the
      (11L, at(70), 702L, Some(6.0), "u"), // end-aligned (T4) window
      (12L, at(1), 702L, Some(4.0), "u"))
    (uom700 ++ uom701 ++ single)
      .toDF("stay_id", "charttime", "itemid", "valuenum", "valueuom")
  }

  def outputevents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 101L, 11L, ts("2019-01-01 10:00:00"), 800L),
      (1L, 101L, 11L, ts("2019-01-02 10:00:00"), 800L),
      (2L, 102L, 12L, ts("2019-01-02 05:00:00"), 801L))
      .toDF("subject_id", "hadm_id", "stay_id", "charttime", "itemid")
  }

  def procedureevents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (11L, ts("2019-01-01 12:00:00"), 900L),
      (11L, ts("2019-01-03 12:00:00"), 901L),
      (12L, ts("2019-01-02 08:00:00"), 900L))
      .toDF("stay_id", "starttime", "itemid")
  }

  /** inputevents: order 2 crosses the include_time=24h boundary; order 3
    * starts before intime (negative offset). */
  def inputevents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 11L, 600L, ts("2019-01-01 10:00:00"), ts("2019-01-01 14:00:00"),
        Some(2.0), Some(8.0), 1L),
      (1L, 11L, 600L, ts("2019-01-02 06:00:00"), ts("2019-01-03 06:00:00"),
        Some(1.0), Some(24.0), 2L),
      (1L, 11L, 601L, ts("2019-01-01 06:00:00"), ts("2019-01-01 12:00:00"),
        Some(3.0), Some(12.0), 3L),
      (2L, 12L, 600L, ts("2019-01-02 01:00:00"), ts("2019-01-02 03:00:00"),
        None: Option[Double], Some(4.0), 4L))
      .toDF("subject_id", "stay_id", "itemid", "starttime", "endtime",
        "rate", "amount", "orderid")
  }

  /** diagnoses: ICD9 "4280" (dup-key mapping → first match wins), ICD9
    * "9999" (no match → null root), ICD10 "I509" passthrough. */
  def diagnosesIcd(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 101L, "4280", 9),
      (1L, 101L, "9999", 9),
      (2L, 102L, "I509", 10),
      (5L, 501L, "4280", 9))
      .toDF("subject_id", "hadm_id", "icd_code", "icd_version")
  }

  /** ICD dictionary (d_icd_diagnoses) for the S11 title joins. */
  def dIcdDiagnoses(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("4280", "congestive heart failure"), ("I509", "heart failure, unspecified"))
      .toDF("icd_code", "long_title")
  }

  /** Mapping with a DUPLICATE diagnosis_code row: first-in-file must win. */
  def icdMapping(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("DX", "428", "heart failure", "428", "I50.9", "", 0L),
      ("DX", "428", "heart failure dup", "428", "I50.1", "", 1L),
      ("DX", "410", "myocardial infarction", "410", "I21.9", "", 2L))
      .toDF("diagnosis_type", "diagnosis_code", "diagnosis_description",
        "icd9cm", "icd10cm", "flags", "line_no")
  }

  /** Write the fixture as a csv.gz MIMIC tree + mapping TSV; returns root. */
  def writeTree(spark: SparkSession, dir: String): String = {
    def writeCsv(df: DataFrame, rel: String): Unit = {
      val tmp = s"$dir/_tmp"
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("compression", "gzip").csv(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".csv.gz")).get
      val dest = new java.io.File(s"$dir/$rel")
      dest.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeCsv(patients(spark), "core/patients.csv.gz")
    writeCsv(admissions(spark), "core/admissions.csv.gz")
    writeCsv(icustays(spark), "icu/icustays.csv.gz")
    writeCsv(chartevents(spark), "icu/chartevents.csv.gz")
    writeCsv(outputevents(spark), "icu/outputevents.csv.gz")
    writeCsv(procedureevents(spark), "icu/procedureevents.csv.gz")
    writeCsv(inputevents(spark), "icu/inputevents.csv.gz")
    writeCsv(diagnosesIcd(spark), "hosp/diagnoses_icd.csv.gz")
    writeCsv(dIcdDiagnoses(spark), "hosp/d_icd_diagnoses.csv.gz")
    // mapping TSV (uncompressed, like the reference's static file)
    val map = icdMapping(spark).drop("line_no")
    val rows = map.collect().map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("")).mkString("\t"))
    val header = map.columns.mkString("\t")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/icd_mapping.txt"),
      (header +: rows).mkString("\n").getBytes)
    dir
  }
}
