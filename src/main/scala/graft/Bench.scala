package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Per-query failures are recorded in an `errors`
  * map (and stderr) instead of being silently folded into the timing —
  * an aborted job must be visible in BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions pinned per scale factor (SURVEY 4.2): at the
    // bench SFs every shuffle is a few MB, so fewer reducers cut task
    // dispatch overhead; AQE coalescing handles the rest. Override with
    // SPARK_GRAFT_SHUFFLE for larger SFs.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup: pays one-off JIT/codegen/scan-index costs so the
    // first timed query isn't charged for them
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      // noop sink forces FULL evaluation of every output column —
      // count() would let Catalyst prune projection-only work and
      // under-report (a minhash query "benched" in 0.26s that actually
      // costs 1.3s to materialize). min-of-2 runs absorbs per-query
      // planning/JIT noise.
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(500)
          System.err.println(s"[bench] FAILED $name: ${errors(name)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${Verify.jq(k)}:${Verify.jq(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
