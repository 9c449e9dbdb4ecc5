package graft

import graft.operators.IvfIndex
import graft.pipeline.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("full index build + search lifecycle round-trips") {
    val cfg = Ingest.Config(tmp("ix") + "/index", tmp("md") + "/meta")
    val docs = Tables.documents(spark, sf)
    Ingest.run(docs, "doc_id", "text", "source", cfg)

    val index = spark.read.parquet(cfg.indexPath)
    assert(index.count() == docs.count())
    assert(index.columns.contains("crowding_tag"))

    val hits = Ingest.search(spark, cfg, "spark join stream table", k = 5)
    assert(hits.count() == 5)
    assert(hits.columns.contains("content"))

    // restrict filter narrows the candidate set (content_length lives
    // in the index; verify via the joined-back content itself)
    val restricted = Ingest.search(spark, cfg, "spark join", k = 5,
      restrict = Some(col("content_length") > 300))
    assert(restricted.filter(length(col("content")) <= 300).count() == 0)
    assert(restricted.count() > 0)
  }

  test("fail-fast on over-limit documents") {
    val cfg = Ingest.Config(tmp("ix2") + "/i", tmp("md2") + "/m")
    val big = Seq((1L, ("tok " * 3000).trim, "s")).toDF("doc_id", "text", "source")
    intercept[Ingest.TokenLimitExceeded] {
      Ingest.run(big, "doc_id", "text", "source", cfg)
    }
  }

  test("heuristic and BPE token caps disagree at the boundary") {
    // 300 whitespace tokens — comfortably under the 2042 heuristic
    // cap — but each word is 10 characters no merge rule touches, so
    // real BPE counts 3000 tokens and must reject the document the
    // way the reference's tiktoken validation would
    val word = "z" * 10
    val txt = Array.fill(300)(word).mkString(" ")
    assert(graft.functions.BpeCodec.countText(
      org.apache.spark.unsafe.types.UTF8String.fromString(txt)) == 3000L)
    val docs = Seq((1L, txt, "s")).toDF("doc_id", "text", "source")
    val heur = Ingest.Config(tmp("ixh") + "/i", tmp("mdh") + "/m")
    Ingest.run(docs, "doc_id", "text", "source", heur) // heuristic accepts
    assert(spark.read.parquet(heur.indexPath).count() == 1)
    val bpe = Ingest.Config(tmp("ixb") + "/i", tmp("mdb") + "/m",
      bpeCounting = true)
    intercept[Ingest.TokenLimitExceeded] {
      Ingest.run(docs, "doc_id", "text", "source", bpe) // real BPE rejects
    }
  }

  test("IVF persisted index search uses partition pruning") {
    val path = tmp("ivf") + "/index"
    val emb = Tables.embeddings(spark, sf)
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding", 8)
    IvfIndex.write(indexed, path)

    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val search = IvfIndex.search(spark, path, model, query, nProbe = 2,
      k = 5, "vec_id", "embedding")
    val plan = search.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [leaf_id"),
      s"expected leaf_id partition pruning in:\n$plan")
    assert(search.count() == 5)
  }

  test("bucketed join avoids shuffles on the join key") {
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_bkt")
    val joined = spark.table("orders_bkt")
      .join(spark.table("customer_bkt").hint("merge"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }
}
