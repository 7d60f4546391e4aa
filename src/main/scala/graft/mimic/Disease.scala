package graft.mimic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** ICD9→ICD10 standardization + disease cohort extraction — the
  * Spark-first rewrite of disease_cohort.py (per-group Python loop with
  * `.iloc[0]` lookups → one broadcast join; SURVEY J13).
  */
object Disease {

  /** standardize_icd(root=true) (disease_cohort.py:28-71;
    * icu_preprocess_util.py:341-428 twin): for icd_version=9 rows, map the
    * 3-char root through the mapping table's FIRST match in file order
    * (`.iloc[0]`, made deterministic by `line_no` from
    * [[MimicSource.icdMapping]]); non-9 rows keep their code. Adds
    *  - root_icd10_convert: mapped code (null when no match — np.nan)
    *  - root: first 3 chars of the converted code.
    *
    * Plan shape: the 24k-row mapping is deduped to first-match per key
    * (tiny) and broadcast — the diagnoses side never shuffles.
    */
  def standardizeIcd(mapping: DataFrame, diag: DataFrame): DataFrame = {
    val firstMatch = mapping
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("diagnosis_code")).orderBy(col("line_no").asc)))
      .filter(col("rn") === 1)
      .select(col("diagnosis_code"), col("icd10cm"))

    diag
      .withColumn("_root9", ColFns.icdRoot(col("icd_code")))
      .join(broadcast(firstMatch),
        col("icd_version") === 9 && col("_root9") === col("diagnosis_code"),
        "left")
      .withColumn("root_icd10_convert",
        when(col("icd_version") === 9, col("icd10cm")).otherwise(col("icd_code")))
      .withColumn("root", ColFns.icdRoot(col("root_icd10_convert")))
      .drop("_root9", "diagnosis_code", "icd10cm")
  }

  /** preproc_icd_module + extract_diag_cohort (disease_cohort.py:74-103):
    * hadm_ids with ≥1 diagnosis whose converted root CONTAINS the given
    * ICD10 code prefix (str.contains, disease_cohort.py:86).
    */
  def extractDiagCohort(src: MimicSource, mapPath: String, icd10Code: String): DataFrame = {
    val std = standardizeIcd(src.icdMapping(mapPath), src.diagnosesIcd)
    std.filter(col("root").isNotNull && col("root").contains(icd10Code))
      .select(col("hadm_id")).distinct()
  }
}
