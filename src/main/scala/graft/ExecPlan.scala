package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: materialize selected queries and print the FINAL adaptive
  * physical plan — the only place runtime stage reuse is visible.
  * `PlanAudit` dumps the pre-execution plan, where AQE hides
  * `ReusedExchange`/reused shuffle stages; a query that looks like it
  * scans twice there may well reuse the materialized stage at runtime.
  * This prints the truth after execution.
  *
  * Usage:
  *   sbt "runMain graft.ExecPlan <sfDir> name1 [name2 ...]"
  *   sbt "runMain graft.ExecPlan <sfDir> --assert-reuse <name> <col>"
  *
  * `--assert-reuse` exits nonzero unless some reused-exchange payload of
  * <name>'s executed plan contains column <col> — a CI-callable guard
  * against the float-through trap (a "shared" computed stage whose
  * projection silently migrated above the exchange, making every
  * consumer recompute it; see BENCH_NOTES and the round-9 d20 incident).
  */
object ExecPlan {
  private val usage =
    "usage: ExecPlan <sfDir> name1 [name2 ...] | ExecPlan <sfDir> --assert-reuse <name> <col>"

  def main(args: Array[String]): Unit = {
    if (args.length < 2) { System.err.println(usage); sys.exit(2) }
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(name: String) = SparkEntry.queries.get(name) match {
      case Some(fn) => fn(spark, sfDir)
      case None =>
        System.err.println(s"unknown query '$name'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
        spark.stop(); sys.exit(2); throw new IllegalStateException
    }

    // Materialize through THIS df's QueryExecution (a write would spawn a
    // separate one and the printed plan would say isFinalPlan=false), but
    // WITHOUT collecting rows to the driver — row-heavy queries would OOM
    // a dev-tool JVM. Counting the executed plan's RDD keeps every row on
    // the executors.
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.execute().count()

    if (args(1) == "--assert-reuse") {
      if (args.length != 4) { System.err.println(usage); spark.stop(); sys.exit(2) }
      val (name, colName) = (args(2), args(3))
      val df = build(name)
      materialize(df)
      val payloads = PlanInspect.reused(df).map(_.output.map(_.name))
      val ok = payloads.exists(_.contains(colName))
      println(s"$name reused-exchange payloads: ${payloads.mkString("; ")}")
      println(s"assert-reuse $colName: ${if (ok) "OK" else "ABSENT"}")
      spark.stop()
      if (!ok) sys.exit(1)
    } else {
      args.drop(1).foreach { name =>
        println(s"\n########## $name ##########")
        val df = build(name)
        val n = materialize(df)
        println(s"rows=$n")
        println(df.queryExecution.executedPlan.toString)
      }
      spark.stop()
    }
  }
}
