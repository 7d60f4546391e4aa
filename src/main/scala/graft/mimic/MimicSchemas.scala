package graft.mimic

import org.apache.spark.sql.types._

/** Pinned schemas for every MIMIC-IV table the reference reads — the
  * reference relies on pandas dtype inference (SURVEY §1.3); we declare
  * schemas explicitly so reads are deterministic and scans prune.
  * Column sets cite the reference's `usecols` (file:line into
  * /root/reference/src/tempor/datasources/mivdp/).
  */
object MimicSchemas {

  private def ts(n: String) = StructField(n, TimestampType, nullable = true)
  private def lng(n: String) = StructField(n, LongType, nullable = true)
  private def dbl(n: String) = StructField(n, DoubleType, nullable = true)
  private def str(n: String) = StructField(n, StringType, nullable = true)
  private def int(n: String) = StructField(n, IntegerType, nullable = true)

  /** core/patients.csv.gz — cohort.py:116-129, icu_preprocess_util.py:48-64 */
  val patients: StructType = StructType(Seq(
    lng("subject_id"), str("gender"), int("anchor_age"), int("anchor_year"),
    str("anchor_year_group"), ts("dod")))

  /** core/admissions.csv.gz — cohort.py:91-97, 179-185 */
  val admissions: StructType = StructType(Seq(
    lng("subject_id"), lng("hadm_id"), ts("admittime"), ts("dischtime"),
    ts("deathtime"), int("hospital_expire_flag"), str("insurance"),
    str("ethnicity")))

  /** icu/icustays.csv.gz — cohort.py:64-71 */
  val icustays: StructType = StructType(Seq(
    lng("subject_id"), lng("hadm_id"), lng("stay_id"), ts("intime"),
    ts("outtime"), dbl("los")))

  /** icu/chartevents.csv.gz — feature_preproc_icu.py:116-122 usecols */
  val chartevents: StructType = StructType(Seq(
    lng("stay_id"), ts("charttime"), lng("itemid"), dbl("valuenum"),
    str("valueuom")))

  /** icu/outputevents.csv.gz — icu_preprocess_util.py:235-277 */
  val outputevents: StructType = StructType(Seq(
    lng("subject_id"), lng("hadm_id"), lng("stay_id"), ts("charttime"),
    lng("itemid")))

  /** icu/procedureevents.csv.gz — feature_preproc_icu.py:138-146 usecols */
  val procedureevents: StructType = StructType(Seq(
    lng("stay_id"), ts("starttime"), lng("itemid")))

  /** icu/inputevents.csv.gz — icu_preprocess_util.py:155-175 */
  val inputevents: StructType = StructType(Seq(
    lng("subject_id"), lng("stay_id"), lng("itemid"), ts("starttime"),
    ts("endtime"), dbl("rate"), dbl("amount"), lng("orderid")))

  /** hosp/diagnoses_icd.csv.gz — disease_cohort.py:22-25 */
  val diagnosesIcd: StructType = StructType(Seq(
    lng("subject_id"), lng("hadm_id"), str("icd_code"), int("icd_version")))

  /** hosp/d_icd_{diagnoses,procedures}.csv.gz — icu_preprocess_util.py:76-79 */
  val dIcd: StructType = StructType(Seq(
    str("icd_code"), str("long_title")))

  /** hosp/procedures_icd.csv.gz (unused hosp path, icu_preprocess_util.py:122-131) */
  val proceduresIcd: StructType = diagnosesIcd

  /** ICD9→ICD10 mapping TSV — disease_cohort.py:14-19;
    * utils/mappings/ICD9_to_ICD10_mapping.txt header. */
  val icdMapping: StructType = StructType(Seq(
    str("diagnosis_type"), str("diagnosis_code"), str("diagnosis_description"),
    str("icd9cm"), str("icd10cm"), str("flags")))
}
