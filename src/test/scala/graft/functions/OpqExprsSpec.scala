package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[OpqRotateMicro]] to (1) the builtin-composable formulation of
  * the same formula — posexplode + bit_count sign + per-(i,j) popcount
  * mix, the exact text the DuckDB twin evaluates — and (2) the
  * orthogonality identity that makes the rotation distance-preserving
  * on power-of-two dims. Null semantics (null array / null element /
  * empty array) are pinned explicitly. */
class OpqExprsSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def refRotate(df: DataFrame): DataFrame = {
    // the oracle's formula, spelled in Spark builtins: micro-quantize,
    // sign-flip on popcount((j+1)*0x9E3779B9), mix on popcount(i AND j)
    val mq = (v: org.apache.spark.sql.Column) => {
      val d = v.cast("double") * lit(1000000.0)
      when(d >= 0, floor(d + lit(0.5))).otherwise(-floor(-d + lit(0.5))).cast("long")
    }
    val x = df
      .filter(col("embedding").isNotNull &&
        !exists(col("embedding"), _.isNull))
      .select(col("id"), posexplode(col("embedding")).as(Seq("j", "v")))
      .select(col("id"), col("j"),
        (when(bit_count((col("j") + 1) * lit(2654435769L)) % 2 === 0, 1L)
          .otherwise(-1L) * mq(col("v"))).as("x"))
    val dims = df
      .filter(col("embedding").isNotNull && !exists(col("embedding"), _.isNull))
      .select(col("id").as("did"), posexplode(col("embedding")).as(Seq("i", "_v")))
      .select(col("did"), col("i"))
    x.join(dims, col("id") === col("did"))
      .groupBy(col("id"), col("i"))
      .agg(sum(when(bit_count(col("i").cast("long").bitwiseAND(col("j"))) % 2 === 0,
        col("x")).otherwise(-col("x"))).as("r"))
  }

  test("opqRotateMicro ≡ the builtin-composed popcount formula (incl. non-pow2 dims)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map { id =>
      val d = Seq(64, 16, 5, 1)(rnd.nextInt(4)) // non-pow2 on purpose
      (id, Array.fill(d)((rnd.nextFloat() - 0.5f) * 4f))
    }
    val df = rows.toDF("id", "embedding")
    val got = df.select(col("id"), posexplode(OpqExprs.opqRotateMicro(col("embedding"))).as(Seq("i", "r")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = refRotate(df)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("opqRotateMicro null semantics: null array and null element → null; empty → empty") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f))),
      (2L, None),
      (3L, Some(Array[Float]()))).toDF("id", "embedding")
      .union(Seq((4L, Array(Option(1.0f), Option.empty[Float])))
        .toDF("id", "embedding"))
    val out = df.select(col("id"), OpqExprs.opqRotateMicro(col("embedding")).as("rm"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty, "null array must rotate to null")
    assert(out(3L).exists(_.asInstanceOf[scala.collection.Seq[_]].isEmpty),
      "empty array rotates to empty, not null (the vector stays seed-eligible)")
    assert(out(4L).isEmpty, "any null element must poison the rotation")
  }

  test("opqRotateMicro is orthogonal on power-of-two dims: ‖r‖² = d·‖x‖² exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (0L until 20L).map(id => (id, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f)))
      .toDF("id", "embedding")
    val rows = df.select(col("id"),
      aggregate(OpqExprs.opqRotateMicro(col("embedding")), lit(0L),
        (acc, r) => acc + r * r).as("rr"),
      aggregate(transform(col("embedding"), v => {
        val d = v.cast("double") * lit(1000000.0)
        when(d >= 0, floor(d + lit(0.5))).otherwise(-floor(-d + lit(0.5))).cast("long")
      }), lit(0L), (acc, m) => acc + m * m).as("xx"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === 64L * r.getLong(2),
        s"id ${r.getLong(0)}: rotated energy ${r.getLong(1)} != 64 x ${r.getLong(2)}")
    }
  }
}
