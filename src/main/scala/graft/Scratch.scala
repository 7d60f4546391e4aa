package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ColFns.{tdHours, tdDays}
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
    def rep(name: String, df: => DataFrame, n: Int = 4): Unit = {
      val d = df
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        d.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-30s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    rep("q21 current", SparkEntry.queries("q21_td_hours")(spark, dir))
    rep("q21 repart", t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .repartition(col("l_orderkey"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        tdHours(col("l_shipdate"), col("o_orderdate")).as("ship_hours_from_order"),
        tdDays(col("l_shipdate"), col("o_orderdate")).as("ship_days_from_order")))
    rep("q08 current", SparkEntry.queries("q08_readmission_label")(spark, dir))
    val o = t(spark, dir, "orders")
    val a = o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")).repartition(col("o_custkey"))
    val b = o.select(col("o_custkey").as("b_custkey"), col("o_orderdate").as("b_orderdate"))
    val pos = a.join(b,
        col("o_custkey") === col("b_custkey") &&
        col("b_orderdate") > col("o_orderdate") + expr("INTERVAL 3 DAYS") &&
        col("b_orderdate") <= col("o_orderdate") + expr("INTERVAL 33 DAYS"),
        "left_semi")
      .select(col("o_orderkey")).withColumn("label", lit(1))
    rep("q08 repart", a.join(pos, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), coalesce(col("label"), lit(0)).as("label")))
    rep("e03 current", SparkEntry.queries("e03_ann_ivf")(spark, dir))
    val e = t(spark, dir, "embeddings").repartition(col("vec_id"))
    rep("e03 explode-repart", {
      val qd = e.filter(col("vec_id") === 0)
        .select(posexplode(transform(col("embedding"), x => x.cast("double")))).toDF("pos", "qv")
      val cent = e.select(col("label"), posexplode(transform(col("embedding"), x => x.cast("double"))))
        .toDF("label", "pos", "v")
        .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("c"))
      cent.join(broadcast(qd), Seq("pos"))
        .groupBy(col("label")).agg(sum(col("c") * col("qv")).as("dot"))
        .orderBy(col("dot").desc, col("label").asc).limit(1)
        .select(col("label"))
    })
    spark.stop()
  }
}
