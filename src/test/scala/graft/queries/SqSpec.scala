package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.SqExprs

/** The production SQ path (packed byte codes + codegen ADC kernel) is
  * spec-pinned EQUAL to the oracle-checked e13 gate — the long-format
  * gate is the cross-engine twin, the codes table is what a deployment
  * scans. */
class SqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("SqEncode bytes equal the gate's long-format integer codes") {
    val e = Registry.t(spark, sfDir, "embeddings").filter(col("embedding").isNotNull)
    val (lo, hi) = Sim.sqStats(e)
    val packed = Sim.sqCodesDf(e, lo, hi)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // independent long-format formulation (the e13 gate's coded CTE)
    val loArr = array(lo.map(lit): _*)
    val hiArr = array(hi.map(lit): _*)
    val longFmt = e
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .filter(col("vf").isNotNull)
      .select(col("vec_id"), col("pos"),
        element_at(loArr, col("pos") + 1).as("lo"),
        element_at(hiArr, col("pos") + 1).as("hi"),
        ((col("vf").cast("double") * 1000000.0).as("d")))
      .select(col("vec_id"), col("pos"), col("lo"), col("hi"),
        when(col("d") >= 0, floor(col("d") + 0.5))
          .otherwise(-floor(-col("d") + 0.5)).cast("long").as("m"))
      .select(col("vec_id"), col("pos"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(Sim.halfAwayDiv((col("m") - col("lo")) * 255,
            col("hi") - col("lo"))).as("q"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(packed.nonEmpty)
    packed.foreach { case (id, bytes) =>
      bytes.zipWithIndex.foreach { case (b, pos) =>
        assert((b & 0xff).toLong === longFmt((id, pos)),
          s"code mismatch at vec $id pos $pos")
      }
    }
  }

  test("sqSearch output equals the oracle-checked e13 gate") {
    val gate = Registry.queries("e13_sq_ann")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val prod = Sim.sqSearch(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(prod === gate)
  }

  test("null elements encode to 0 and contribute nothing to the ADC") {
    val dir = Files.createTempDirectory("graft-sq-null").toString
    import spark.implicits._
    Seq(
      (0L, Seq[java.lang.Float](1.0f, 0.0f), 0),
      (1L, Seq[java.lang.Float](1.0f, null), 0), // null second dim
      (2L, Seq[java.lang.Float](0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val e = Registry.t(spark, dir, "embeddings")
    val (lo, hi) = Sim.sqStats(e)
    val codes = Sim.sqCodesDf(e, lo, hi)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert((codes(1L)(0) & 0xff) === 255 && (codes(1L)(1) & 0xff) === 0)
    // ADC of vec 1 against query [255, 255]: the null dim adds 0
    val adc = Sim.sqCodesDf(e, lo, hi)
      .select(col("vec_id"), SqExprs.sqAdc(col("codes"),
        Array(255.toByte, 255.toByte)).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adc(1L) === 255L * 255L)
    assert(adc(0L) === 255L * 255L && adc(2L) === 255L * 255L)
  }

  test("SqAdc sums over the common prefix on length mismatch") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](2, 3, 4))).toDF("vec_id", "codes")
    val adc = df.select(SqExprs.sqAdc(col("codes"), Array[Byte](10, 10)))
      .collect().head.getLong(0)
    assert(adc === 2L * 10 + 3L * 10)
  }

  test("the ADC scan stays inside whole-stage codegen (no fallback)") {
    val e = Registry.t(spark, sfDir, "embeddings").filter(col("embedding").isNotNull)
    val (lo, hi) = Sim.sqStats(e)
    val scan = Sim.sqCodesDf(e, lo, hi)
      .select(SqExprs.sqAdc(col("codes"), Array.fill(64)(1.toByte)).as("adc"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; a CodegenFallback expression would strip it from Project
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"ADC scan fell out of codegen:\n$plan")
  }
}
