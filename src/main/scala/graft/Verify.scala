package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failures are NOT swallowed silently: every per-query error is printed
  * to stderr and collected into `outDir/errors.json` — a query that
  * crashes must fail the gate loudly, not vanish from the report.
  */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd+ args: restrict to named queries (dev spot-checks at
    // scales where the full battery dump is impractical); the driver's
    // 2-arg call keeps the full battery. `--sql-only` dumps the full
    // oracle_sql.json without running any query (feeds tools/duckbench.py
    // when only the DuckDB side needs timing).
    val sqlOnly = args.contains("--sql-only")
    val only = args.drop(2).toSet - "--sql-only"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // wipe stale per-query outputs: a query that fails THIS run must not
    // leave a previous run's parquet behind to be compared as if current
    val outRoot = new java.io.File(outDir)
    if (outRoot.exists())
      outRoot.listFiles().filter(_.isDirectory).foreach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(d)
      }
    outRoot.mkdirs()
    val selected = if (sqlOnly) Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
      else if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(2000)
        errors(name) = msg
        System.err.println(s"[verify] FAILED $name: $msg")
      }
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
    if (errors.nonEmpty)
      // Loud but non-fatal: the driver must still oracle-compare the
      // queries that DID succeed; errors.json carries the failures.
      System.err.println(s"[verify] ${errors.size}/${selected.size} queries FAILED: ${errors.keys.mkString(", ")}")
  }
}
