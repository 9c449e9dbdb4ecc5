package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `BINARY` payloads with
  * typed metadata, decoded/feature-extracted in batched executor-side
  * passes (mapPartitions — the Scala analog of mapInPandas batches).
  *
  * The container has no image/audio codecs, so [[DecodeStub]] is a
  * deterministic fake decoder over the raw bytes; the Spark-side
  * plumbing — binary schema, partition-parallel batched decode,
  * frame explosion — is real and tested, and a production codec slots
  * in by replacing DecodeStub alone.
  */
object Multimodal {

  val FrameBytes = 64

  /** ===== STUB: replace with a real codec (jpeg/opus/h264) ===== */
  object DecodeStub {
    /** "Decode" a payload: byte count + rolling checksum (the stand-in
      * for width/height/duration extraction).
      */
    def features(payload: Array[Byte]): (Long, Long) = {
      var checksum = 0L
      var i = 0
      while (i < payload.length) {
        checksum = (checksum * 31 + (payload(i) & 0xff)) % 1000000007L
        i += 1
      }
      (payload.length.toLong, checksum)
    }
  }
  /** ============================================================ */

  /** Attach a binary payload column (UTF-8 bytes of `textCol` — the
    * deterministic fake "media file").
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("modality", lit("text/fake-media"))

  /** Batched decode: one partition pass, features per payload. */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_bytes", LongType),
      StructField("checksum", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val (n, c) = DecodeStub.features(r.getAs[Array[Byte]](pIdx))
        Row(r.getLong(idIdx), n, c)
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** ===== STUB: replace with a real resampler (bilinear scaling /
    * audio sample-rate conversion) =====
    * Deterministic fake "resize": keep every `factor`-th byte — the
    * stand-in for a media downsample that preserves the plumbing
    * contract (binary in, smaller binary + size metadata out).
    */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }
  /** ============================================================ */

  /** Batched resize: one partition pass, the [[resizeStub]] per
    * payload, original/new byte counts as the typed metadata a real
    * media pipeline tracks (width/height → bytes here). Output:
    * (id, orig_bytes, new_bytes, resized BINARY).
    */
  def resize(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be ≥ 1, got $factor")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("orig_bytes", LongType),
      StructField("new_bytes", LongType),
      StructField("resized", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](pIdx)
        val out = resizeStub(p, factor)
        Row(r.getLong(idIdx), p.length.toLong, out.length.toLong, out)
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Frame sampling: split the payload into fixed-size frames, keep
    * every `stride`-th — the video-frame-sampling shape (explode =
    * one output row per kept frame, work stays partition-parallel).
    */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(FrameBytes.toDouble))
      .cast("int")
    // nFrames=0 (empty payload) must yield NO frames — a bare
    // sequence(0, -1) would count downward and emit phantom rows
    val frameNos = when(nFrames > 0,
      filter(sequence(lit(0), nFrames - 1), i => i % stride === 0))
      .otherwise(array().cast("array<int>"))
    df.withColumn("frame_no", explode(frameNos))
      .select(col(idCol), col("frame_no").cast("bigint"),
        substring_index_bytes(col("payload"), col("frame_no")))
  }

  private def substring_index_bytes(payload: org.apache.spark.sql.Column,
      frameNo: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(payload, frameNo * FrameBytes + 1, lit(FrameBytes)).as("frame")
}
