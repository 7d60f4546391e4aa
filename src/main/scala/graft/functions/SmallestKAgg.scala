package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "K smallest longs" aggregation — the scale-safe replacement
  * for `sort_array(collect_set(id))[1:K]` on grouped keys whose group
  * size is adversarial (LSH band buckets: a mass-duplicated boilerplate
  * corpus at 100 TB can put hundreds of millions of docs behind ONE band
  * key).
  *
  * `collect_set` buffers the ENTIRE group in a single aggregation-buffer
  * row before any downstream `slice` can cap it — the buffer itself is
  * the OOM. This aggregator's buffer is a size-K binary max-heap plus a
  * running count: memory is O(K) at every stage — map-side partial
  * aggregation, shuffle-side merge, final — no matter the group size,
  * and partial aggregation now actually REDUCES shuffle volume for hot
  * keys (each map task ships at most K ids per key instead of its whole
  * slice of the bucket). The true group size `n` is carried through the
  * merge so truncation stays observable (`n - size(ids)` docs dropped).
  *
  * Output ids are sorted ascending — identical to the old
  * sort_array(collect_set)+slice semantics when inputs are distinct per
  * group (LSH banding emits each doc_id at most once per band key).
  */
object SmallestKAgg {

  /** Max-heap over heap(0 until size) (root = largest kept id) + true
    * running count. Mutable vars keep per-row allocation to the Buf shell
    * (the Aggregator contract allows mutating and returning the buffer).
    */
  final case class Buf(var heap: Array[Long], var size: Int, var n: Long)

  final case class Result(ids: Array[Long], n: Long)

  private def siftUp(h: Array[Long], from: Int): Unit = {
    var i = from
    while (i > 0 && h((i - 1) / 2) < h(i)) {
      val p = (i - 1) / 2
      val t = h(p); h(p) = h(i); h(i) = t
      i = p
    }
  }

  private def siftDown(h: Array[Long], size: Int): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < size && h(l) > h(m)) m = l
      if (r < size && h(r) > h(m)) m = r
      if (m == i) done = true
      else {
        val t = h(m); h(m) = h(i); h(i) = t
        i = m
      }
    }
  }

  private def insert(buf: Buf, k: Int, x: Long): Unit = {
    if (buf.size < k) {
      if (buf.size == buf.heap.length) {
        // grow ×2 up to k: the overwhelmingly common bucket is tiny, so
        // allocating the full k-slot heap per group (16 KB at k=2048)
        // would dominate the aggregation in alloc churn
        val grown = new Array[Long](math.min(k, math.max(4, buf.heap.length * 2)))
        System.arraycopy(buf.heap, 0, grown, 0, buf.size)
        buf.heap = grown
      }
      buf.heap(buf.size) = x
      buf.size += 1
      siftUp(buf.heap, buf.size - 1)
    } else if (x < buf.heap(0)) {
      buf.heap(0) = x
      siftDown(buf.heap, buf.size)
    }
  }

  def agg(k: Int): Aggregator[Long, Buf, Result] =
    new Aggregator[Long, Buf, Result] {
      override def zero: Buf = Buf(new Array[Long](0), 0, 0L)
      override def reduce(buf: Buf, x: Long): Buf = {
        buf.n += 1
        insert(buf, k, x)
        buf
      }
      override def merge(a: Buf, b: Buf): Buf = {
        a.n += b.n
        var i = 0
        while (i < b.size) { insert(a, k, b.heap(i)); i += 1 }
        a
      }
      override def finish(buf: Buf): Result =
        Result(buf.heap.take(buf.size).sorted, buf.n)
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }

  /** Untyped-DataFrame view: `.agg(smallestK(K)(col("id")).as("b"))` →
    * struct column with fields `ids` (sorted, ≤ K) and `n` (true count).
    */
  def smallestK(k: Int): Column => Column = {
    val u = org.apache.spark.sql.functions.udaf(agg(k), Encoders.scalaLong)
    c => u(c)
  }
}
