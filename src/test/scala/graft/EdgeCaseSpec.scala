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
