package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway dev experiments (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rep(name: String, df: => DataFrame, n: Int = 4): Unit = {
      val d = df
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        d.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-30s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    rep("ev raw 2col", raw.select("user_id", "event_type"))
    rep("ev via t 2col", graft.queries.Registry.t(spark, dir, "events").select("user_id", "event_type"))
    rep("ev via t +ts", graft.queries.Registry.t(spark, dir, "events").select("user_id", "ts"))
    rep("ev raw full", raw)
    rep("e03_ann_ivf", SparkEntry.queries("e03_ann_ivf")(spark, dir))
    rep("e04_lsh_ann", SparkEntry.queries("e04_lsh_ann")(spark, dir))
    rep("e05_embed_neardup", SparkEntry.queries("e05_embed_neardup")(spark, dir))
    SparkEntry.queries("e05_embed_neardup")(spark, dir).explain("formatted")
    spark.stop()
  }
}
