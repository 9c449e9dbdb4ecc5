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

  /** PERCEPTUAL 64-bit GRID HASH over the binary payload — the
    * multimodal near-dup fingerprint (dHash family, Krawetz 2013
    * "Kind of Like That"; aHash/dHash/pHash are the standard
    * image-dedup fingerprints): the byte stream is resampled onto a
    * fixed 65-cell grid (cell of byte i = ⌊i·65/len⌋ — the 1-D
    * analog of the 9×8 downscale a real dHash runs after decode),
    * and bit c (0..63) is set when cell c's byte-sum exceeds cell
    * c+1's — a brightness-gradient signature that survives small
    * local edits, because one changed byte moves only its own cell's
    * sum. A real image pipeline swaps the byte stream for decoded
    * luma (the [[DecodeStub]] contract); the hash derivation,
    * schema, and banded join are codec-independent.
    *
    * One partition-parallel pass, 8 B output per payload — the
    * fingerprint column a 100 TB media corpus carries instead of its
    * payloads from here on.
    */
  def perceptualHash(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("phash", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](pIdx)
        val len = p.length
        val sums = new Array[Long](65)
        var i = 0
        while (i < len) {
          sums((i.toLong * 65 / len).toInt) += (p(i) & 0xff)
          i += 1
        }
        var h = 0L
        var c = 0
        while (c < 64) {
          if (sums(c) > sums(c + 1)) h |= (1L << c)
          c += 1
        }
        Row(r.getLong(idIdx), h)
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Sub-quadratic perceptual near-dup pairs — the multimodal cell of
    * the dedup matrix ([[graft.operators.Dedup.simhashBandedPairs]]'s
    * 4-band machinery on the 64-bit [[perceptualHash]]): the hash
    * splits into 4×16-bit bands; two hashes within Hamming distance 3
    * differ in ≤3 bands, so they AGREE on at least one (pigeonhole) —
    * per-band equi-joins generate every qualifying pair and the exact
    * `bit_count(xor)` filter verifies candidates only. EXACT: returns
    * precisely the brute-force hd ≤ `maxHamming` pair set. Four
    * hash-partitioned equi-joins on 2¹⁶-value band keys, no cross
    * product anywhere — the same shape that holds the MinHash/SimHash
    * families sub-quadratic at corpus scale.
    */
  def phashBandedPairs(ph: DataFrame, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4 bands guarantee recall only for Hamming <= 3, got $maxHamming")
    val s = ph.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perBand = (0 until 4).map { bi =>
        val key = shiftright(col("phash"), bi * 16)
          .bitwiseAND(lit(0xffffL))
        val a = s.select(col(idCol).as("da"), col("phash").as("sa"), key.as("k"))
        val b = s.select(col(idCol).as("db"), col("phash").as("sb"), key.as("k"))
        a.join(b, Seq("k")).filter(col("da") < col("db"))
          .select("da", "db", "sa", "sb")
      }
      perBand.reduce(_ unionAll _).distinct()
        .withColumn("hd",
          bit_count(col("sa").bitwiseXOR(col("sb"))).cast("bigint"))
        .filter(col("hd") <= maxHamming)
        .select("da", "db", "hd")
        .localCheckpoint()
    } finally s.unpersist()
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
