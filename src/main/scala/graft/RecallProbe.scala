package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs.cosineFast

/** Dev probe: recall of the bucketed KNN join vs brute-force ground
  * truth on a random sample of query vectors. Quantifies the
  * recall-for-bounded-work trade of raising the plane count
  * (Sim.planesFor) — the number behind BENCH_NOTES' sf10 section.
  *
  * Usage: sbt "runMain graft.RecallProbe <sfDir> <sampleN> <planes...>"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sampleN = args(1).toInt
    val planeCounts = args.drop(2).map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.queries.Registry.t(spark, sfDir, "embeddings")
    val n = e.count()
    // deterministic sample: hash-ordered, reproducible across runs
    val ids = e.select(col("vec_id")).orderBy(xxhash64(col("vec_id")))
      .limit(sampleN).collect().map(_.getLong(0))
    val q = e.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // ground truth: brute-force top-3 for the sample against the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", round(cosineFast(col("embedding"), col("qe")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("vec_id").as("nbr_id"))
    truth.cache()
    val truthN = truth.count()
    println(s"n=$n sample=${ids.length} truthPairs=$truthN")
    planeCounts.foreach { planes =>
      val got = graft.queries.Sim.knnJoinFast(spark, sfDir, planes)
        .filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("qid"), col("nbr_id"))
      val hit = truth.join(got, Seq("qid", "nbr_id"), "left_semi").count()
      println(f"planes=$planes recall@3 ${hit.toDouble / truthN}%.3f ($hit/$truthN)")
    }
    Seq(2, 4, 7).foreach { fams =>
      val got = graft.queries.Sim.knnJoinOr(spark, sfDir, families = fams)
        .filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("qid"), col("nbr_id"))
      val hit = truth.join(got, Seq("qid", "nbr_id"), "left_semi").count()
      println(f"families=$fams recall@3 ${hit.toDouble / truthN}%.3f ($hit/$truthN)")
    }
    spark.stop()
  }
}
