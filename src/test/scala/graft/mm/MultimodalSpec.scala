package graft.mm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multimodal plumbing: payload column, partition-parallel decode stub,
  * frame sampling — schema and batch shape are the real contract. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, ""), (3L, "a longer payload of bytes"))
      .toDF("doc_id", "text")
  }

  test("withPayload attaches binary + metadata columns") {
    val df = Multimodal.withPayload(docs)
    assert(df.schema("payload").dataType.typeName === "binary")
    val m = df.select(col("doc_id"), col("n_bytes")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === 11L && m(2L) === 0L)
  }

  test("decodeStub: deterministic fake decode with per-row error channel") {
    val metas = Multimodal.decodeStub(Multimodal.withPayload(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(2L).ok === false && metas(2L).err === "empty payload")
    assert(metas(1L).ok === true)
    assert(metas(1L).width === (11 % 320 + 32))
    // sha present and stable
    assert(metas(1L).sha.length === 64)
  }

  test("frameSample explodes one row per sampled byte") {
    val frames = Multimodal.frameSample(Multimodal.withPayload(docs.filter(col("doc_id") === 1)), 4)
    // 11 bytes, every 4th → frames at 0,4,8 → (11-1)/4 = 2 → 0..2 = 3 rows
    assert(frames.count() === 3)
    assert(frames.columns.toSet === Set("doc_id", "frame_no", "frame_byte"))
  }

  test("frameSample yields ZERO frames for an empty payload") {
    // sequence(0, -1) would be a descending range — guard must produce
    // no rows, not two bogus frames
    val frames = Multimodal.frameSample(Multimodal.withPayload(docs.filter(col("doc_id") === 2)), 4)
    assert(frames.count() === 0)
  }
}
