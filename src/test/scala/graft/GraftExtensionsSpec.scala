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
