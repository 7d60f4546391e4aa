package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: materialize selected queries and print the FINAL adaptive
  * physical plan — the only place runtime stage reuse is visible.
  * `PlanAudit` dumps the pre-execution plan, where AQE hides
  * `ReusedExchange`/reused shuffle stages; a query that looks like it
  * scans twice there may well reuse the materialized stage at runtime.
  * This prints the truth after execution.
  *
  * Usage: sbt "runMain graft.ExecPlan <sfDir> name1 [name2 ...]"
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n########## $name ##########")
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() (not a noop write) so the materialization runs through
      // THIS df's QueryExecution — a write spawns a separate one and the
      // printed plan would still say isFinalPlan=false with no stages
      val n = df.collect().length
      println(s"rows=$n")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
