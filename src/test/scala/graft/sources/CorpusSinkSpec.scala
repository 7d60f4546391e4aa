package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusSinkSpec extends SparkSpec {

  test("partitioned layout, bounded file sizes, round-trip equality, pruned reads") {
    val dir = Files.createTempDirectory("graft-corpus-sink").toString
    val docs = graft.queries.Registry.t(spark, "/root/testdata/sf0.001", "documents")
    CorpusSink.write(docs, s"$dir/out", maxRecordsPerFile = 40L)

    // lang=... hive layout exists
    val langDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.nonEmpty, "expected lang= partition directories")

    // every data file respects the record bound
    val back = spark.read.parquet(s"$dir/out")
    val perFile = back.groupBy(input_file_name()).count().collect()
    assert(perFile.forall(_.getLong(1) <= 40L),
      s"file over maxRecordsPerFile: ${perFile.map(_.getLong(1)).max}")

    // round-trip: same rows and columns (partition column comes back)
    assert(back.count() === docs.count())
    val a = docs.select(col("doc_id"), col("text"), col("lang")).collect().map(_.toString).sorted
    val b = back.select(col("doc_id"), col("text"), col("lang")).collect().map(_.toString).sorted
    assert(a === b)

    // partition pruning: a lang filter reads only that directory
    val one = back.filter(col("lang") === "en")
    val files = one.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      "lang filter must prune to the lang=en directory")
  }
}
