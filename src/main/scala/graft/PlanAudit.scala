package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of selected (or all)
  * queries at a given sf dir, for scale auditing — check that filters
  * reach the parquet scan (PushedFilters), small sides broadcast, and
  * whole-stage codegen spans are wide.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [name1 name2 ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names(name)) {
        println(s"\n########## $name ##########")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
