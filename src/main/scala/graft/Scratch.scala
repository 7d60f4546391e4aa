package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Registry.t

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
    def t0[T](f: => T): Double = { val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }
    def sig = {
      val d = t(spark, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("ws", split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
        .withColumn("sh", when(size(col("ws")) >= 3,
          transform(sequence(lit(1), size(col("ws")) - 2), i =>
            concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
          .otherwise(array().cast("array<string>")))
        .withColumn("mh", graft.functions.MinHashExprs.minHashSig(col("sh")))
      d.select(col("doc_id") +: (0 until 8).map(i => element_at(col("mh"), i + 1).as(s"mh$i")): _*)
    }
    // warmup
    SparkEntry.queries("d12_dedup_clusters")(spark, dir)
    (1 to 2).foreach { _ =>
      println(f"sig noop       ${t0 { sig.write.format("noop").mode("overwrite").save() }}%.3f")
      println(f"staredges noop ${t0 { graft.queries.Docs.lshStarEdges(sig).write.format("noop").mode("overwrite").save() }}%.3f")
      println(f"edges chkpt    ${t0 { graft.queries.Docs.lshStarEdges(sig).localCheckpoint(true) }}%.3f")
      println(f"d12 construct  ${t0 { SparkEntry.queries("d12_dedup_clusters")(spark, dir) }}%.3f")
    }
    spark.stop()
  }
}
