package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): media payloads are opaque
  * `binary` columns with typed metadata structs. The actual codec step is
  * STUBBED — image/audio libraries are not in this container — behind
  * [[DecodeStub]]: a deterministic fake that preserves the real Spark
  * shape (schema, partition-parallel batch decode via mapPartitions,
  * per-row error channel). Swapping in a real decoder changes ONE
  * function, none of the plumbing.
  */
object Multimodal {

  /** Typed decode result — what a real image decoder would emit. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, sha: String,
      width: Int, height: Int, ok: Boolean, err: String)

  /** Attach the opaque payload column + cheap byte-level metadata
    * (no decode): the columnar, codegen'd part. */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("n_bytes", octet_length(col(textCol)).cast("long"))
      .withColumn("content_sha", sha2(col("payload"), 256))

  /** STUB decode: deterministic fake dimensions from payload bytes.
    * Real implementation would call an image codec here — per PARTITION
    * (one codec init per task, not per row), which is why this is
    * mapPartitions and not a per-row UDF.
    */
  def decodeStub(df: DataFrame): Dataset[MediaMeta] = {
    val enc = Encoders.product[MediaMeta]
    df.select(col("doc_id"), col("payload"), col("n_bytes"), col("content_sha"))
      .mapPartitions { rows =>
        // >>> real codec init would happen once HERE per partition <<<
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = r.getLong(2)
          val sha = r.getString(3)
          if (bytes == null || bytes.isEmpty)
            MediaMeta(id, 0L, sha, 0, 0, ok = false, err = "empty payload")
          else
            // deterministic fake decode: dimensions from byte stats
            MediaMeta(id, n, sha,
              (n % 320 + 32).toInt, (n % 240 + 32).toInt, ok = true, err = "")
        }
      }(enc)
  }

  /** Frame-sample stub: take every k-th byte as a "frame" — stands in for
    * video frame sampling; the plumbing (explode to one row per frame,
    * keyed by (doc_id, frame_no)) is the real shape. */
  def frameSample(df: DataFrame, everyK: Int): DataFrame =
    df.select(col("doc_id"), col("payload"))
      // guard empty payloads: sequence(0, -1) is a DESCENDING range in
      // Spark (two bogus frames), not empty — same edge class as the
      // shingle guard in queries/Docs.scala
      .withColumn("frame_no",
        explode(when(octet_length(col("payload")) > 0,
          sequence(lit(0),
            floor((octet_length(col("payload")) - 1) / everyK).cast("int")))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame_byte",
        expr(s"substring(payload, frame_no * $everyK + 1, 1)"))
      .drop("payload")
}
