package graft

import graft.operators.{IvfIndex, Lexical, Serving}
import graft.streaming.IndexMaintenance
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-17 lexical read-path hardening: registry-winner stamping on
  * a lived-in attach (the r16 advisor's high-severity hole — a
  * re-attach after upserts silently dropped every upserted doc from
  * the BM25 leg), the loud pinned-range guard on the public Lexical
  * API, duplicate-qid rejection on the batch surfaces, term-clustered
  * postings / doc_id-sorted dls files (row-group skipping at scale),
  * and the incrementally maintained BM25 totals that replace the
  * per-query corpus scan (r16 verdict What's-wrong #2/#3).
  */
class LexicalReadPathSpec extends SparkTestBase {
  import spark.implicits._

  private val terms = Seq("alpha", "beta")

  private val baseDocs = Seq(
    (0L, "alpha beta gamma"),
    (1L, "alpha alpha delta"),
    (2L, "beta beta epsilon"),
    (3L, "gamma delta epsilon"),
    (4L, "alpha beta beta zeta"),
    (5L, "zeta eta theta"),
    (6L, "beta gamma gamma"),
    (7L, "alpha zeta zeta eta"))

  private def denseify(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("v",
      array(col("doc_id").cast("double"), lit(1.0)).cast("array<double>"))

  private def mkLayout(docs: Seq[(Long, String)],
      attach: Boolean = true): String = {
    val path = Files.createTempDirectory("graft_lexrp").toString + "/idx"
    val df = denseify(docs.toDF("doc_id", "text"))
      .withColumn("version", lit(1L))
    val model = IvfIndex.Model(Array(Array(0.0, 1.0), Array(8.0, 1.0)))
    val indexed = df.select("doc_id", "v", "version")
      .withColumn("leaf_id", IvfIndex.probeExpr(model, col("v"), 1)(0))
    IvfIndex.write(indexed, path, model)
    if (attach)
      Lexical.attach(spark, path, docs.toDF("doc_id", "text"),
        "doc_id", "text")
    path
  }

  private def upBatch(rows: Seq[(Long, String, Long)]) =
    denseify(rows.toDF("doc_id", "text", "version"))
      .select("doc_id", "v", "version", "text")

  private def scores(path: String): Seq[(Long, Long)] =
    Serving.open(spark, path, id = "doc_id", vecCol = "v")
      .lexicalScores(terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  /** S over the sidecar dls: per-doc self-LWW winner sum/count — the
    * invariant [[Lexical.totalsFor]] must track exactly.
    */
  private def recomputedS(path: String): (Long, Long) = {
    val all = spark.read.parquet(s"$path/${Lexical.Dir}/dls")
      .groupBy("doc_id")
      .agg(max(struct(col("ver"), col("dl"))).as("__w"))
      .agg(coalesce(sum(col("__w.dl")), lit(0L)).cast("long"),
        count(lit(1)))
      .head
    (all.getLong(0), all.getLong(1))
  }

  private def parquetFiles(dir: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.Path]()
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f.getPath
    }
    out.toSeq
  }

  test("re-attach on a LIVED-IN layout keeps upserted docs in the " +
      "BM25 leg — base rows carry registry-winner versions, not −1") {
    // streamed layout that never had a sidecar: upsert, then attach
    // over the live corpus — the exact remediation searchHybrid's
    // staleness error recommends
    val path = mkLayout(baseDocs, attach = false)
    IndexMaintenance.appendToServing(spark, path,
      upBatch(Seq((20L, "alpha omega", 2L))).drop("text"),
      "doc_id", "v", "version", spill = 1)
    val liveCorpus = (baseDocs :+ (20L, "alpha omega")).toDF("doc_id", "text")
    Serving.open(spark, path, id = "doc_id", vecCol = "v")
      .attachLexical(liveCorpus, "doc_id", "text")
    val got = scores(path)
    assert(got.map(_._1).contains(20L),
      "upserted doc missing from the BM25 leg after a lived-in attach")
    // bit-identical to a one-shot attach on a never-mutated layout
    // over the same corpus (totals + idf + per-doc resolution agree)
    assert(got == scores(mkLayout(baseDocs :+ (20L, "alpha omega"))))
    // a later delete still drops through the shared registry authority
    IndexMaintenance.removeFromServing(spark, path,
      Seq((1L, 9L)).toDF("doc_id", "version"), "doc_id", "version")
    val afterDel = scores(path)
    assert(!afterDel.map(_._1).contains(1L),
      "tombstoned doc still scored after a lived-in attach")
    assert(afterDel == scores(mkLayout(
      baseDocs.filterNot(_._1 == 1L) :+ (20L, "alpha omega"))),
      "post-delete scores must match the one-shot corpus without the doc")
  }

  test("a direct pinned Lexical read outside the stamp range fails " +
      "loudly instead of serving newer statistics") {
    val path = mkLayout(baseDocs)
    val e = intercept[IllegalArgumentException] {
      Lexical.bm25FromStats(spark, path, terms, pinnedAt = Some(0))
    }
    assert(e.getMessage.contains("cannot reconstruct pinned"),
      e.getMessage)
  }

  test("duplicate qid rows are rejected on the batch surfaces " +
      "(doubled BM25 contributions would be silent)") {
    val path = mkLayout(baseDocs)
    val serving = Serving.open(spark, path, id = "doc_id", vecCol = "v")
    val dupQs = Seq((0L, Seq("alpha"), Seq(1.0, 0.0)),
      (0L, Seq("beta"), Seq(0.0, 1.0)))
      .toDF("query_id", "terms", "qv")
    val e = intercept[IllegalArgumentException] {
      serving.searchHybridBatch(dupQs, "query_id", "terms", "qv",
        nProbe = 1, kLex = 5, kDense = 5, kPool = 4, k = 2)
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    val dupMmr = Seq((1L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("query_id", "qv")
    val e2 = intercept[IllegalArgumentException] {
      serving.searchMmrBatch(dupMmr, "query_id", "qv",
        nProbe = 1, kPool = 4, k = 2, lam = 0.5)
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
  }

  test("restricted searchMmrBatch: every pick satisfies the " +
      "restrict, and per-query results are independent of the batch") {
    val path = mkLayout(baseDocs)
    val serving = Serving.open(spark, path, id = "doc_id", vecCol = "v")
    val restricts = Seq(col("doc_id") % 2 === 0)
    val queries = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 2.0)))
      .toDF("query_id", "qv")
    val batch = serving.searchMmrBatch(queries, "query_id", "qv",
      nProbe = 2, kPool = 5, k = 3, lam = 0.5, restricts = restricts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(batch.nonEmpty)
    assert(batch.forall(_._3 % 2 == 0),
      "a restricted MMR pick violates the restrict")
    for (qid <- Seq(0L, 1L)) {
      val solo = serving.searchMmrBatch(
        queries.filter(col("query_id") === qid), "query_id", "qv",
        nProbe = 2, kPool = 5, k = 3, lam = 0.5, restricts = restricts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(batch.filter(_._1 == qid) == solo,
        s"restricted batch and single-query results diverge for $qid")
    }
  }

  test("postings files are term-clustered within buckets and dls " +
      "files doc_id-sorted — attached, appended, and compacted " +
      "(row-group t/doc_id stats stay narrow at scale)") {
    val path = mkLayout(baseDocs)
    IndexMaintenance.appendToServing(spark, path,
      upBatch(Seq((20L, "alpha omega omega", 2L),
        (21L, "beta beta omega theta", 2L))),
      "doc_id", "v", "version", spill = 1, textCol = Some("text"))
    def assertClustered(tag: String): Unit = {
      parquetFiles(s"$path/${Lexical.Dir}/postings").foreach { f =>
        val ts = spark.read.parquet(f.toString)
          .select("t").collect().map(_.getString(0)).toSeq
        assert(ts == ts.sorted,
          s"$tag: postings file $f is not t-sorted — row-group t " +
            "stats span the whole bucket and the pushed t IN filter " +
            "cannot skip")
      }
      parquetFiles(s"$path/${Lexical.Dir}/dls").foreach { f =>
        val ids = spark.read.parquet(f.toString)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids == ids.sorted,
          s"$tag: dls file $f is not doc_id-sorted")
      }
    }
    assertClustered("attached+appended")
    val before = scores(path)
    IndexMaintenance.compactServing(spark, path, "doc_id", "version")
    assertClustered("compacted")
    assert(scores(path) == before,
      "compaction changed BM25 scores")
  }

  test("stamped BM25 totals track the self-LWW winner invariant " +
      "through attach → append → delete → re-upsert → compact") {
    val path = mkLayout(baseDocs)
    assert(Lexical.totalsFor(spark, path).contains(recomputedS(path)))
    IndexMaintenance.appendToServing(spark, path,
      upBatch(Seq((20L, "alpha omega omega", 2L),
        (0L, "beta beta beta beta", 3L))),
      "doc_id", "v", "version", spill = 1, textCol = Some("text"))
    assert(Lexical.totalsFor(spark, path).contains(recomputedS(path)),
      "incremental totals diverged from the self-LWW recompute " +
        "(new doc + superseding upsert)")
    IndexMaintenance.removeFromServing(spark, path,
      Seq((2L, 5L)).toDF("doc_id", "version"), "doc_id", "version")
    // deletes do not touch the stamp — the READ corrects: scores must
    // match the one-shot corpus without the doc and with doc 0's new text
    val expect = scores(mkLayout(
      baseDocs.filterNot(_._1 == 2L)
        .map { case (i, t) => if (i == 0L) (i, "beta beta beta beta") else (i, t) }
        :+ (20L, "alpha omega omega")))
    assert(scores(path) == expect,
      "live scores after delete must equal the resolved one-shot corpus")
    IndexMaintenance.appendToServing(spark, path,
      upBatch(Seq((2L, "epsilon alpha", 6L))),
      "doc_id", "v", "version", spill = 1, textCol = Some("text"))
    assert(Lexical.totalsFor(spark, path).contains(recomputedS(path)),
      "incremental totals diverged after resurrecting a tombstoned doc")
    IndexMaintenance.compactServing(spark, path, "doc_id", "version")
    assert(Lexical.totalsFor(spark, path).contains(recomputedS(path)),
      "compacted totals diverged from the materialized winners")
  }

  test("the pristine BM25 plan scans dls ONCE (candidate join) — the " +
      "per-query totals aggregate over the corpus is gone") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = mkLayout(baseDocs)
    val q = Lexical.bm25FromStats(spark, path, terms)
    val dlsScans = q.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("/dls")) => f
    }
    assert(dlsScans.length == 1,
      s"pristine plan scans dls ${dlsScans.length} times — the stamped " +
        "totals should have replaced the per-query corpus aggregate")
    // and the scores still match the totals-free arithmetic exactly
    val viaLegacy = {
      val tf = spark.read.parquet(s"$path/${Lexical.Dir}/postings")
        .filter(col("t").isin(terms: _*))
        .select("doc_id", "t", "tf")
      val dls = spark.read.parquet(s"$path/${Lexical.Dir}/dls")
        .select("doc_id", "dl")
      Lexical.bm25Tail(tf, dls)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    assert(scores(path) == viaLegacy,
      "stamped-totals scores diverge from the corpus-aggregate arithmetic")
  }
}
