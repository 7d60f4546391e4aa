package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash sketch as a typed `Aggregator` — the custom-UDAF
  * path SURVEY §2.9 reserves for the north-star operators.
  *
  * Input is one shingle per row; the buffer is the running k-way minimum
  * of md5("i|" + shingle) per hash family — the same family definition as
  * the per-row query path (queries/Docs.scala minhash), so grouped
  * aggregation produces IDENTICAL signatures. Because `merge` is an
  * elementwise min, the sketch is associative and commutative: partial
  * aggregation (map-side combine), shuffle-side merge, and streaming
  * state updates all compose — which is what makes MinHash viable over
  * 100 TB (each partition reduces its shingles locally; only k hashes per
  * doc cross the wire).
  */
object MinHashAgg {

  val K = 8

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Aggregator over shingle strings → k-min signature. Empty-input
    * signature is all-null (matches array_min of an empty transform). */
  val minhash: Aggregator[String, Array[String], Array[String]] =
    new Aggregator[String, Array[String], Array[String]] {
      override def zero: Array[String] = Array.fill[String](K)(null)
      override def reduce(buf: Array[String], shingle: String): Array[String] = {
        // null shingles contribute nothing — matches the per-row path,
        // where md5(concat(i, '|', null)) is null and array_min skips it;
        // hashing the literal "i|null" here would silently diverge
        if (shingle == null) return buf
        var i = 0
        while (i < K) {
          val h = md5Hex(s"$i|$shingle")
          if (buf(i) == null || h < buf(i)) buf(i) = h
          i += 1
        }
        buf
      }
      override def merge(a: Array[String], b: Array[String]): Array[String] = {
        var i = 0
        while (i < K) {
          if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
          i += 1
        }
        a
      }
      override def finish(buf: Array[String]): Array[String] = buf
      override def bufferEncoder: Encoder[Array[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
      override def outputEncoder: Encoder[Array[String]] = bufferEncoder
    }

  /** Untyped-DataFrame view: `df.groupBy("doc_id").agg(minhashCol($"shingle"))`. */
  def minhashCol(shingle: Column): Column =
    org.apache.spark.sql.functions.udaf(minhash, Encoders.STRING)
      .apply(shingle).as("mh_sig")
}
