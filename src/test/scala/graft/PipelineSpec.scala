package graft

import graft.operators.IvfIndex
import graft.pipeline.FeatureHashEmbedder
import graft.sources.{DocumentSource, MetadataStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("md dir source reads whole files and filters by glob") {
    val dir = Files.createTempDirectory("graft-md")
    Files.writeString(dir.resolve("a.md"), "hello world\nsecond line")
    Files.writeString(dir.resolve("b.md"), "another doc")
    Files.writeString(dir.resolve("skip.txt"), "not markdown")
    val df = DocumentSource.readMdDir(spark, dir.toString)
    val rows = df.as[(String, String)].collect().toMap
    assert(rows.keySet == Set("a.md", "b.md"))
    assert(rows("a.md") == "hello world\nsecond line")
  }

  test("md dir source fails fast on empty corpus") {
    val dir = Files.createTempDirectory("graft-empty")
    intercept[DocumentSource.EmptyCorpusException] {
      DocumentSource.readMdDir(spark, dir.toString)
    }
  }

  test("csv source: RFC 4180 round trip survives commas, doubled " +
      "quotes, and embedded newlines; FAILFAST kills on a corrupt row") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csv")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val hard = Seq(
      (1L, "plain text"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "two\nlines"))
    hard.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dir.toString)
    val back = DocumentSource.readCsv(spark, dir.toString, schema)
      .as[(Long, String)].collect().toSet
    assert(back == hard.toSet, s"round trip must be identity: $back")
    val bad = Files.createTempDirectory("graft-csv-bad")
    Files.writeString(bad.resolve("bad.csv"),
      "doc_id,text\nnot_a_long,oops\n")
    // collect, not count: CSV count() takes a no-parse fast path
    // (zero columns materialized) and would never see the bad value
    intercept[org.apache.spark.SparkException] {
      DocumentSource.readCsv(spark, bad.toString, schema).collect()
    }
    ()
  }

  test("jsonl source: pinned schema, FAILFAST kills on one corrupt " +
      "line, quarantine splits good rows from raw offending lines") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Files.writeString(dir.resolve("good.jsonl"),
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2, "text": "beta"}
        |""".stripMargin)
    val clean = DocumentSource.readJsonl(spark, dir.toString, schema)
    assert(clean.as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (2L, "beta")))
    // a corrupt line: FAILFAST dies loudly, quarantine splits
    Files.writeString(dir.resolve("bad.jsonl"),
      """{"doc_id": 3, "text": "gamma"}
        |{"doc_id": 4, "text": NOT VALID JSON
        |""".stripMargin)
    val e = intercept[org.apache.spark.SparkException] {
      DocumentSource.readJsonl(spark, dir.toString, schema).count()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(
        _.getMessage.toLowerCase.contains("malformed")))
    val (good, quarantined) =
      DocumentSource.readJsonlQuarantined(spark, dir.toString, schema)
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")),
      "good side carries exactly the pinned schema rows")
    val badLines = quarantined.as[String].collect()
    assert(badLines.length == 1 && badLines.head.contains("NOT VALID"),
      s"quarantine must carry the raw offending line: ${badLines.toSeq}")
  }

  test("ingestJsonl: steady-state form writes good rows to the target " +
      "and quarantines corrupt lines with NOTHING pinned to storage") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl-ingest")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // the feed carries the edge shapes: a corrupt line, an EMPTY line
    // (not a record — the json datasource skips it, so must we), and
    // a whitespace-only line (a record the parser rejects)
    Files.writeString(dir.resolve("feed.jsonl"),
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2, "text": NOT VALID JSON
        |
        |
        |{"doc_id": 3, "text": "gamma"}
        |""".stripMargin)
    val target = Files.createTempDirectory("graft-jsonl-good")
      .resolve("good").toString
    // ids, not a count: another test's checkpointed RDD may be
    // cleaner-unpersisted concurrently — assert no NEW pins only
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val (good, quarantined) =
      DocumentSource.ingestJsonl(spark, dir.toString, schema, target)
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (3L, "gamma")))
    val badLines = quarantined.as[String].collect()
    assert(badLines.length == 1 && badLines.head.contains("NOT VALID"),
      s"empty lines are skipped, not quarantined: ${badLines.toSeq}")
    // the good frame is the persisted parquet artifact, re-openable
    // by a fresh reader independent of this session's lineage
    assert(spark.read.parquet(target).count() == 2)
    // bounded-state contract: unlike readJsonlQuarantined's corpus
    // checkpoint, nothing was pinned to executor storage
    assert((spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore)
      .isEmpty, "ingestJsonl must not pin blocks")
    // empty feed keeps the fail-fast contract of the other readers
    val empty = Files.createTempDirectory("graft-jsonl-none")
    intercept[DocumentSource.EmptyCorpusException] {
      DocumentSource.ingestJsonl(spark, empty.toString, schema, target)
    }
  }

  test("feature-hash embedder is deterministic, unit-norm, batched") {
    val emb = new FeatureHashEmbedder(dim = 64, batchSize = 3)
    val docs = Tables.documents(spark, sf).limit(10)
    val out = emb.transform(docs, "text")
      .select(col("doc_id"), col("embedding"))
    val a = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = emb.transform(docs, "text")
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    a.values.foreach { v =>
      val n = v.map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(n - 1.0) < 1e-3, s"norm was $n")
    }
  }

  test("metadata store upsert is idempotent and last-write-wins") {
    val v1 = Seq((1L, "one", 1), (2L, "two", 1)).toDF("id", "content", "v")
    val v2 = Seq((1L, "one-updated", 2)).toDF("id", "content", "v")
    val resolved = MetadataStore.resolve(
      MetadataStore.append(MetadataStore.append(v1, v2), v2),
      "id", col("v"))
    val got = resolved.select("id", "content").as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "one-updated", 2L -> "two"))
  }

  test("IVF search recall@10 vs exact kNN, probing 25% of leaves") {
    val emb = Tables.embeddings(spark, sf).cache()
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding", 16)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    var hit = 0; var total = 0
    queries.foreach { case (qid, q) =>
      val exact = Knn10(emb, qid, q)
      val approx = IvfIndex.searchDf(indexed.filter(col("vec_id") =!= qid),
        model, q, nProbe = 4, k = 10, "vec_id", "embedding")
        .select("vec_id").as[Long].collect().toSet
      hit += exact.count(approx.contains); total += exact.size
    }
    val recall = hit.toDouble / total
    assert(recall >= 0.4, s"recall@10 = $recall")
    // probing all leaves must recover exact search entirely
    val (qid, q) = queries.head
    val full = IvfIndex.searchDf(indexed.filter(col("vec_id") =!= qid),
      model, q, nProbe = 16, k = 10, "vec_id", "embedding")
      .select("vec_id").as[Long].collect().toSet
    assert(full == Knn10(emb, qid, q).toSet)
  }

  test("IVF sample-fit (k-means on a bounded sample) keeps recall@10") {
    val emb = Tables.embeddings(spark, sf).cache()
    // maxFitRows=300 < the 500-row corpus forces the sampled-fit path
    val (indexed, model) =
      IvfIndex.build(emb, "vec_id", "embedding", 16, maxFitRows = 300)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    var hit = 0; var total = 0
    queries.foreach { case (qid, q) =>
      val exact = Knn10(emb, qid, q)
      val approx = IvfIndex.searchDf(indexed.filter(col("vec_id") =!= qid),
        model, q, nProbe = 4, k = 10, "vec_id", "embedding")
        .select("vec_id").as[Long].collect().toSet
      hit += exact.count(approx.contains); total += exact.size
    }
    val recall = hit.toDouble / total
    assert(recall >= 0.4, s"sampled-fit recall@10 = $recall")
  }

  private def Knn10(emb: org.apache.spark.sql.DataFrame, qid: Long,
      q: Array[Double]): Seq[Long] = {
    import graft.functions.vectors
    emb.filter(col("vec_id") =!= qid)
      .select(col("vec_id"),
        vectors.dotProduct(col("embedding"), typedLit(q.toSeq)).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSeq
  }
}
