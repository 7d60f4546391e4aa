package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output-side file management for corpus-scale writes — the half of a
  * 100 TB pipeline the read path doesn't cover. A cleaned corpus write
  * must control three things:
  *
  *  1. **Partition pruning for consumers**: `partitionBy` on the
  *     low-cardinality routing column (lang / source / date) so
  *     downstream jobs scan only the slices they need.
  *  2. **File sizing**: `maxRecordsPerFile` bounds the largest file (a
  *     skewed partition otherwise writes one multi-GB file that a
  *     single downstream task must read); AQE coalescing already
  *     bounds the smallest.
  *  3. **Run-length locality**: `sortWithinPartitions` on the primary
  *     read key gives parquet column-chunk statistics real selectivity
  *     (min/max per row-group become disjoint), so point/range reads
  *     skip row groups instead of scanning them.
  *
  * No repartition is forced here: callers that need exactly-N output
  * files per partition should `repartition(n, col(partitionCol))`
  * first; this sink only bounds and orders what it is given.
  */
object CorpusSink {

  def write(
      df: DataFrame,
      path: String,
      partitionCol: String = "lang",
      sortCol: String = "doc_id",
      maxRecordsPerFile: Long = 100000L,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.sortWithinPartitions(partitionCol, sortCol)
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
}
