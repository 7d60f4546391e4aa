package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: rep-profile selected queries — construct once, materialize
  * N times via the noop sink, print every rep's time (not just the min)
  * so warm-path cost and variance are visible separately from codegen.
  *
  * Usage: sbt "runMain graft.ProfileOne <sfDir> <reps> name1 [name2 ...]"
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val c0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val cs = (System.nanoTime() - c0) / 1e9
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-26s construct $cs%6.3f  reps ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
