package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D12Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    Registry.t(spark, dir, "documents").write.format("noop").mode("overwrite").save()
    val q = Docs.qs.find(_.name=="d06_minhash_sig").get.fn(spark, dir)
    tm("sig warm1")(q.write.format("noop").mode("overwrite").save())
    tm("sig warm2")(q.write.format("noop").mode("overwrite").save())
    val sig = Docs.qs.find(_.name=="d06_minhash_sig").get.fn(spark, dir)
    val edges = Docs.lshStarEdges(sig)
    val e2 = tm("star edges ckpt")(edges.localCheckpoint(true))
    println(s"PROBE edges=${e2.count()}")
    val comps = tm("CC total")(graft.operators.ConnectedComponents.components(e2))
    println(s"PROBE comps=${comps.count()}")
  }
}
