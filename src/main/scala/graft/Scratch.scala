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
    def rep(name: String, df: => DataFrame, n: Int = 5): Unit = {
      val d = df
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        d.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-30s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    rep("q01 new dsum", SparkEntry.queries("q01_agg_sum")(spark, dir))
    rep("q22 fused", SparkEntry.queries("q22_summary_stats")(spark, dir))
    rep("q03", SparkEntry.queries("q03_join_multi")(spark, dir))

    // minhash variants over the real documents table
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(col("doc_id"))
      .withColumn("ws", split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
    val sh = when(size(col("ws")) >= 3,
      transform(sequence(lit(0), size(col("ws")) - 3), i =>
        concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))))
      .otherwise(array().cast("array<string>"))
    val base = docs.withColumn("sh", sh)
      .withColumn("hh", transform(transform(col("sh"), x => md5(x.cast("binary"))), m =>
        struct(conv(substring(m, 1, 8), 16, 10).cast("long").as("h1"),
          conv(substring(m, 9, 8), 16, 10).cast("long").as("h2"))))
    val P = 1000000007L
    // variant A: current — 8 passes, array_min(transform)
    val a = base.select(col("doc_id") +: (0 until 8).map(i =>
      array_min(transform(col("hh"), h =>
        pmod(h.getField("h1") + h.getField("h2") * lit(i.toLong), lit(P)))).as(s"mh$i")): _*)
    rep("mh A 8-pass", a)
    // variant B: one aggregate pass, 8-slot accumulator
    val zero = array((0 until 8).map(_ => lit(null).cast("long")): _*)
    val accd = base.withColumn("mh", aggregate(col("hh"), zero, (acc, h) =>
      transform(acc, (m, i) =>
        least(m, pmod(h.getField("h1") + h.getField("h2") * i.cast("long"), lit(P))))))
    val b = accd.select(col("doc_id") +: (0 until 8).map(i =>
      element_at(col("mh"), i + 1).as(s"mh$i")): _*)
    rep("mh B 1-pass agg", b)
    spark.stop()
  }
}
