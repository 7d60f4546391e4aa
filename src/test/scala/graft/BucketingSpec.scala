package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location: two tables bucketed on the join key join
  * WITHOUT a shuffle exchange — the pre-partitioning strategy for
  * repeatedly-joined 100 TB fact tables (SURVEY §4.2 scale config). */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no Exchange") {
    // bucketed joins must not be force-broadcast for the test to observe
    // the exchange-free sort-merge path
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_b")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_b")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ===
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
