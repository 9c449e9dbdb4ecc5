package graft

import graft.operators.{CertifiedSearch, IvfIndex, Serving}
import graft.streaming.IndexMaintenance
import org.apache.spark.sql.functions._

class CertifiedSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(data: org.apache.spark.sql.DataFrame,
      q: Array[Double], k: Int): Seq[(Long, Double)] =
    data.select(col("vec_id"),
        graft.functions.vectors.dotProduct(col("embedding"),
          typedLit(q.toSeq)).as("score"))
      .groupBy("vec_id").agg(max("score").as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("certified search is exact AND sublinear on clustered data; " +
      "missing radii degrade to always-probed, never wrong") {
    // tight planted clusters: the ball bounds close after few leaves
    val n = 4000L
    val vecs = graft.pipeline.SyntheticCorpus
      .vectors(spark, n, 8, 16)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val (indexed, model) = IvfIndex.build(vecs, "vec_id", "embedding", 16)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cert").toString + "/idx"
    IvfIndex.write(indexed, dir, model)
    CertifiedSearch.buildRadii(spark, dir)

    val serving = Serving.open(spark, dir)
    val queries = Seq(3L, 777L, 2048L)
    var probedTotal = 0
    for (qid <- queries) {
      val q = vecs.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Double](0).toArray
      val (res, probed) = serving.searchCertified(q, k = 10,
        initialProbe = 2)
      probedTotal += probed
      val got = res.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(got == brute(serving.data, q, 10),
        s"certified result must equal brute force for query $qid")
      assert(probed <= serving.numLeaves)
    }
    assert(probedTotal < queries.size * serving.numLeaves / 2,
      s"clustered data should close the certificate well under half " +
        s"the leaves (probed $probedTotal of " +
        s"${queries.size * serving.numLeaves})")

    // drop one leaf's radius: the convention is +infinity — that leaf
    // is ALWAYS probed, results stay exact
    val radii = CertifiedSearch.loadRadii(spark, dir)
    val dropped = radii.keys.head
    spark.createDataFrame((radii - dropped).toSeq)
      .toDF("leaf_id", "radius").coalesce(1)
      .write.mode("overwrite").parquet(CertifiedSearch.radiiDir(dir))
    val q0 = vecs.filter(col("vec_id") === 3L)
      .select("embedding").head().getSeq[Double](0).toArray
    val s2 = Serving.open(spark, dir)
    val (res2, probed2) = s2.searchCertified(q0, 10, initialProbe = 2)
    assert(res2.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      == brute(s2.data, q0, 10),
      "a missing radius must never produce a wrong answer")
    assert(probed2 >= 1)
  }

  test("appends max-merge the radii; certified stays exact after " +
      "out-of-cluster upserts") {
    val vecs = graft.pipeline.SyntheticCorpus
      .vectors(spark, 2000L, 8, 8)
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .withColumn("version", lit(1))
    val (indexed, model) = IvfIndex.build(vecs, "vec_id", "embedding", 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_certup").toString + "/idx"
    IvfIndex.write(indexed, dir, model)
    CertifiedSearch.buildRadii(spark, dir)
    val before = CertifiedSearch.loadRadii(spark, dir)

    // upsert vectors scaled FAR outside their cluster ball: without
    // the max-merge, the stale (smaller) radii would certify skipping
    // leaves that now hold the true best rows
    val far = vecs.filter(col("vec_id") % 97 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000)
      .withColumn("embedding", transform(col("embedding"), x => x * 3.0))
      .withColumn("version", lit(2))
    IndexMaintenance.appendToServing(spark, dir, far,
      "vec_id", "embedding", "version")
    val after = CertifiedSearch.loadRadii(spark, dir)
    assert(after.exists { case (l, r) => r > before.getOrElse(l, 0.0) },
      "the append must have raised at least one touched leaf's radius")

    val serving = Serving.open(spark, dir)
    val q = vecs.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Double](0).toArray
    val (res, _) = serving.searchCertified(q, 10, initialProbe = 2)
    val got = res.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == brute(serving.data, q, 10),
      "certified search must stay exact across serving appends")
    // the scaled copies dominate the dot ranking — the exact answer
    // MUST surface them (this is what a stale bound would have missed)
    assert(got.exists(_._1 >= 1000000),
      "construction check: the upserted far vectors should rank")
  }
}
