package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: knnJoinFast at a density-chosen plane count vs the
  * 8-plane gate geometry, on a given sf dir. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.queries.Registry.t(spark, sfDir, "embeddings").count()
    val planes = graft.queries.Sim.planesFor(n)
    println(s"n=$n planes=$planes")
    val t0 = System.nanoTime()
    val rows = graft.queries.Sim.knnJoinFast(spark, sfDir, planes).count()
    println(f"knnJoinFast($planes): ${(System.nanoTime() - t0) / 1e9}%.1f s, $rows rows")
    spark.stop()
  }
}
