package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQL-surface registration of the custom expression — via the
  * register-on-existing-session path (the extensions class applies the
  * same builder at session construction). */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot resolves in spark.sql after GraftExtensions.register") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("graft_ext_v")
    val r = spark.sql("SELECT vec_dot(a, b) AS d FROM graft_ext_v").head.getDouble(0)
    assert(r === 11.0)
    // wrong arity is rejected at resolution with the function named
    val ex = intercept[Exception] {
      spark.sql("SELECT vec_dot(a) FROM graft_ext_v").collect()
    }
    assert(ex.getMessage.contains("2 arguments") ||
      ex.getMessage.toLowerCase.contains("vec_dot"))
  }

  test("sketch expressions resolve in spark.sql") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Seq("a b c", "b c d"), Seq(1.0f, -2.0f, 3.0f)))
      .toDF("sh", "emb").createOrReplaceTempView("graft_ext_sketch_v")
    val r = spark.sql(
      """SELECT minhash_sig(sh) AS mh, simhash16(sh) AS sim,
        |       plane_bucket_code(emb) AS bkt,
        |       top_adjacent_pair_count(sh) AS topbg
        |FROM graft_ext_sketch_v""".stripMargin).head
    assert(r.getAs[Long]("topbg") === 1L)
    assert(r.getAs[scala.collection.Seq[Long]]("mh").length ===
      graft.functions.MinHashSig.K)
    // cross-check against the DataFrame-side wrappers
    val df = spark.table("graft_ext_sketch_v").select(
      graft.functions.SimHashExpr.simHash16(col("sh")).as("sim"),
      graft.functions.PlaneBucketExpr.planeBucketCode(col("emb")).as("bkt")).head
    assert(r.getLong(1) === df.getLong(0))
    assert(r.getLong(2) === df.getLong(1))
  }

  test("saltedJoin equals plain join exactly") {
    import spark.implicits._
    val fact = (0 until 1000).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "k")
    val dim = Seq(("k0", 10L), ("k1", 20L), ("k2", 30L)).toDF("k", "v")
    val salted = graft.functions.ColFns.saltedJoin(fact, dim, Seq("k"), col("id"), 8)
      .select(col("id"), col("k"), col("v"))
    val plain = fact.join(dim, Seq("k")).select(col("id"), col("k"), col("v"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }
}
