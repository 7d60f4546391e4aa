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

  test("decodeImage parses real PNG/JPEG/GIF headers for pixel dimensions") {
    import spark.implicits._
    // a genuine, complete 1x1 transparent PNG (signature+IHDR+IDAT+IEND)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    // minimal JPEG: SOI, APP0 (2-byte body), SOF0 with height=2/width=3
    // (1 component), EOI — exercises the marker walk past a skipped segment
    val jpeg = Array[Int](
      0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0, len 4
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01, 0x01, 0x11, 0x00, // SOF0
      0xff, 0xd9 // EOI
    ).map(_.toByte)
    // GIF89a logical screen 7x5 (little-endian)
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x07, 0x00, 0x05, 0x00, 0x00, 0x00, 0x00).map(_.toByte))
    val junk = "not an image at all".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpeg), (3L, gif), (4L, junk))
      .toDF("doc_id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
    val m = Multimodal.decodeImage(df).collect().map(x => x.doc_id -> x).toMap
    assert(m(1L).ok && m(1L).format === "png" && m(1L).width === 1 && m(1L).height === 1)
    assert(m(2L).ok && m(2L).format === "jpeg" && m(2L).width === 3 && m(2L).height === 2)
    assert(m(3L).ok && m(3L).format === "gif" && m(3L).width === 7 && m(3L).height === 5)
    assert(!m(4L).ok && m(4L).err === "unknown container")
  }

  test("resizeStub: fixed output size, input-sensitive, deterministic, empty flagged") {
    import spark.implicits._
    val a = "some modestly sized binary payload standing in for pixels".getBytes("UTF-8")
    val b = a.clone(); b(10) = (b(10) ^ 0x55).toByte // single-byte perturbation
    val df = Seq((1L, a), (2L, b), (3L, Array.emptyByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.resizeStub(df, 4, 3).collect().map(m => m.doc_id -> m).toMap
    // contract: every non-empty payload resizes to exactly w*h bytes
    assert(out(1L).ok && out(1L).resized.length === 12)
    assert(out(1L).out_w === 4 && out(1L).out_h === 3)
    // data-dependence: one flipped input byte must change the output
    assert(!out(1L).resized.sameElements(out(2L).resized))
    // determinism: same input, same bytes
    val again = Multimodal.resizeStub(df, 4, 3).collect().map(m => m.doc_id -> m).toMap
    assert(again(1L).resized.sameElements(out(1L).resized))
    // empty payload flows to the flag, not an exception
    assert(!out(3L).ok && out(3L).resized.isEmpty)
    // upscale beyond the payload still fills w*h (stripes repeat-fold)
    val up = Multimodal.resizeStub(df.filter(col("doc_id") === 1), 16, 16)
      .collect().head
    assert(up.resized.length === 256)
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
