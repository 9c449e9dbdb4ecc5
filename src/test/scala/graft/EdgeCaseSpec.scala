package graft

import graft.functions.{quantize, text}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  test("frame sampling of an empty payload yields no frames") {
    val df = Multimodal.withPayload(
      Seq((1L, ""), (2L, "x" * 200)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.sampleFrames(df, "doc_id", stride = 1)
    assert(frames.filter(col("doc_id") === 1).count() == 0)
    assert(frames.filter(col("doc_id") === 2).count() == 4) // ceil(200/64)
  }

  test("quality score of empty/whitespace text is 0.0, not null") {
    val got = Seq("", "   ", "real text here")
      .toDF("t").select(text.qualityScore(col("t"))).as[Double].collect()
    assert(got(0) == 0.0 && got(1) == 0.0 && got(2) > 0.0)
  }

  test("packed codes: empty arrays, length mismatch, zero vector") {
    // empty vector → empty binary → zero dot
    val empty = Seq(Seq.empty[Long]).toDF("c")
      .select(quantize.packCodes(col("c")).as("b"))
    assert(empty.select(length(col("b"))).as[Int].head() == 0)
    assert(empty.select(
      quantize.packedDot(col("b"), col("b"))).as[Long].head() == 0L)
    // mismatched lengths dot over the common prefix (same contract as
    // the float kernels)
    val mixed = Seq((Seq(127L, 127L, 127L), Seq(127L)))
      .toDF("a", "c")
      .select(quantize.packedDot(quantize.packCodes(col("a")),
        quantize.packCodes(col("c"))).as("d"))
    assert(mixed.as[Long].head() == 127L * 127L)
    // zero vector packs to the bias byte everywhere and self-dots to 0
    val zero = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .select(quantize.packCodes(
        quantize.codes(col("v"), quantize.maxAbs(col("v")))).as("b"))
    assert(zero.select(
      quantize.packedDot(col("b"), col("b"))).as[Long].head() == 0L)
    // a null element refuses loudly rather than masking
    val boom = intercept[Exception] {
      Seq(Tuple1(Seq(Option(1L), None))).toDF("c")
        .select(quantize.packCodes(col("c"))).collect()
    }
    assert(boom.getMessage != null)
  }

  test("matvec rotation: short input reads the common prefix, empty " +
      "basis yields an empty vector") {
    import graft.operators.ProductQuantizer
    val basis = Array(Array(1.0, 0.0, 0.0), Array(0.0, 2.0, 0.0))
    // input shorter than the basis row: forward loop stops at min(n)
    val short = Seq(Seq(3.0, 5.0)).toDF("v")
      .select(ProductQuantizer.rotateExpr(col("v"), basis).as("r"))
      .as[Seq[Double]].head()
    assert(short == Seq(3.0, 10.0))
    val none = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(ProductQuantizer.rotateExpr(col("v"),
        Array.empty[Array[Double]]).as("r"))
      .as[Seq[Double]].head()
    assert(none.isEmpty)
  }

  test("redaction of empty text is empty with zero counts") {
    val got = Seq("", "customer data", "no match here")
      .toDF("text")
      .select(
        size(regexp_extract_all(col("text"),
          lit("\\b(customer|supplier|spark)\\b"), lit(0))).as("n"),
        regexp_replace(col("text"),
          lit("\\b(customer|supplier|spark)\\b"), lit("[TERM]")).as("r"))
      .as[(Int, String)].collect()
    assert(got(0) == ((0, "")))
    assert(got(1) == ((1, "[TERM] data")))
    assert(got(2) == ((0, "no match here")))
  }

  test("zero vector quantizes to all-zero codes") {
    val df = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .withColumn("ma", quantize.maxAbs(col("v")))
    val codes = df.select(quantize.codes(col("v"), col("ma")))
      .as[Seq[Long]].head()
    assert(codes == Seq(0L, 0L, 0L))
  }

  test("compact survives and preserves data across the swap") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    Seq((1L, "a", 1), (1L, "b", 2), (2L, "c", 1)).toDF("id", "v", "ver")
      .write.parquet(dir)
    graft.streaming.StreamUpdate.compact(spark, dir, "id", "ver")
    val got = spark.read.parquet(dir)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "c"))
    // idempotent second compact
    graft.streaming.StreamUpdate.compact(spark, dir, "id", "ver")
    assert(spark.read.parquet(dir).count() == 2)
  }
}
