package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query dispatch profile — jobs / stages / tasks counted
  * by a SparkListener across one warm materialization, plus construct
  * and per-rep exec times. The point: at bench SF a stage wave costs a
  * near-constant dispatch floor, so `stages × floor` predicts the warm
  * exec time of a tiny-data query; a query whose time exceeds that
  * prediction has real (data or driver) cost worth attacking.
  *
  * Usage: sbt "runMain graft.JobProfile <sfDir> <reps> name1 [name2 ...]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    println(f"${"query"}%-26s constr   plan  jobs stages tasks  reps(s)")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val c0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val cs = (System.nanoTime() - c0) / 1e9
      // fresh-optimize probe: how much driver time does EVERY action pay
      // re-running the optimizer + physical planner on this tree?
      val p0 = System.nanoTime()
      df.select("*").queryExecution.executedPlan
      val ps = (System.nanoTime() - p0) / 1e9
      // warmup rep (codegen compile), then counted rep, then timed reps
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(50) // let listener events drain
      jobs.set(0); stages.set(0); tasks.set(0)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val firstRep = (System.nanoTime() - t1) / 1e9
      Thread.sleep(100)
      val (j, st, tk) = (jobs.get, stages.get, tasks.get)
      val ts = firstRep +: (2 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-26s $cs%6.3f $ps%6.3f  $j%4d $st%5d $tk%5d  ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
