package graft

import graft.pipeline.{FeatureHashEmbedder, Retry}
import java.util.concurrent.atomic.AtomicInteger

class RetrySpec extends SparkTestBase {

  test("retry recovers from transient failures within the budget") {
    val calls = new AtomicInteger(0)
    val got = Retry.withRetries(maxAttempts = 3, delayMs = 0) { () =>
      if (calls.incrementAndGet() < 3) sys.error("transient")
      else "ok"
    }
    assert(got == "ok" && calls.get() == 3)
  }

  test("retry gives up after maxAttempts") {
    val calls = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      Retry.withRetries(maxAttempts = 3, delayMs = 0) { () =>
        calls.incrementAndGet(); sys.error("permanent")
      }
    }
    assert(e.getMessage == "permanent" && calls.get() == 3)
  }

  test("embedder retries flaky model calls per batch") {
    // flaky model: fails the first call for every batch
    class Flaky extends FeatureHashEmbedder(dim = 16, batchSize = 4,
        maxAttempts = 3, retryDelayMs = 0L) {
      @transient private lazy val seen =
        scala.collection.mutable.Set.empty[String]
      override protected def callModel(texts: Seq[String]): Seq[Array[Float]] = {
        val key = texts.mkString("|")
        if (seen.add(key)) sys.error("first call always fails")
        super.callModel(texts)
      }
    }
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(10)
    val out = new Flaky().transform(docs, "text")
    assert(out.count() == 10)
    assert(out.select(size(col("embedding"))).distinct().head().getInt(0) == 16)
  }
}
