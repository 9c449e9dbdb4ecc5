package graft

import org.apache.spark.sql.functions._
import graft.functions.quantize
import graft.operators.{IvfIndex, ProductQuantizer, Serving}
import graft.streaming.IndexMaintenance

/** Coded-layout recluster (round-10): leaf geometry re-fits over
  * DEQUANTIZED reconstructions because the raw vectors are gone by
  * design. The load-bearing invariants are the decode round trips —
  * codes must ride through a recluster unchanged.
  */
class CodedReclusterSpec extends SparkTestBase {
  import spark.implicits._

  test("SQ decode → re-quantize reproduces identical packed codes") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("ma", quantize.maxAbs(col("v")))
      .withColumn("sq_code", quantize.packCodes(quantize.codes(col("v"), col("ma"))))
    val rt = base
      .withColumn("recon", quantize.decode(col("sq_code"), col("ma")))
      .withColumn("ma2", quantize.maxAbs(col("recon")))
      .withColumn("sq2", quantize.packCodes(quantize.codes(col("recon"), col("ma2"))))
    val bad = rt.filter(col("sq_code") =!= col("sq2") ||
      abs(col("ma") - col("ma2")) > col("ma") * 1e-12).count()
    assert(bad == 0, s"$bad rows change codes across the decode round trip")
  }

  test("PQ decode → re-encode reproduces the identical code word; " +
      "OPQ rotate/unrotate round-trips") {
    val emb = Tables.embeddings(spark, sf)
    val pqIds = (0 until 16).map(c => c * 31L + 5L)
    val cb = ProductQuantizer.codebook(emb, "vec_id", "embedding", pqIds)
    // materialization barriers between encode → decode → re-encode:
    // collapsed into ONE projection, the 128-distance encode tree
    // would inline the whole decode subtree per distance (≈10⁵ nodes,
    // codegen OOM) — the barrier is the spec's concern, not the
    // operator's (reclusterCoded decodes off a parquet scan)
    val coded = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("pq_code", ProductQuantizer.encodeExpr(col("v"), cb))
      .select("vec_id", "pq_code")
      .localCheckpoint(true)
    val recon = coded
      .withColumn("recon", ProductQuantizer.decodeExpr(col("pq_code"), cb))
      .localCheckpoint(true)
    val rt = recon
      .withColumn("pq2", ProductQuantizer.encodeExpr(col("recon"), cb))
    assert(rt.filter(col("pq_code") =!= col("pq2")).count() == 0,
      "re-encoding a reconstruction must reproduce the code word")

    // orthonormal inverse: unrotate(rotate(x)) == x to rounding
    val basis = ProductQuantizer.identityBasis(64)
    // a non-trivial orthonormal basis: swap pairs + sign flips
    val rot = Array.tabulate(64) { r =>
      val c = if (r % 2 == 0) r + 1 else r - 1
      Array.tabulate(64)(j => if (j == c) (if (r % 2 == 0) 1.0 else -1.0) else 0.0)
    }
    val x = Array.tabulate(64)(j => math.sin(j + 1) * 3)
    val back = ProductQuantizer.rotate(
      ProductQuantizer.rotate(x, rot), ProductQuantizer.transposed(rot))
    x.zip(back).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"roundtrip drift: $a vs $b")
    }
    assert(basis.length == 64) // silence unused warning
  }

  test("maintain reclusters an overflowed SQ layout behind the policy " +
      "bit; codes and full-scan scores survive, geometry heals") {
    import IndexMaintenance.{MaintenancePolicy, maintain}
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        lit(1L).as("version"))
    // ONE leaf holding everything — maximally overflowed
    val model = IvfIndex.Model(Array(Array.fill(64)(0.0)))
    val sq = base
      .withColumn("leaf_id", lit(0))
      .withColumn("ma", quantize.maxAbs(col("v")))
      .withColumn("sq_code", quantize.packCodes(quantize.codes(col("v"), col("ma"))))
      .drop("v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_codedrecluster").toString + "/idx"
    IvfIndex.write(sq, dir, model)
    val total = base.count()

    val q = base.filter(col("vec_id") === 7)
      .select(col("v")).head().getSeq[Double](0).toArray
    val before = Serving.open(spark, dir)
      .searchSq(q, 1, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq

    // report-only without the bit
    val r0 = maintain(spark, dir, "vec_id", "v", "version",
      MaintenancePolicy(maxLeafSize = 50))
    assert(!r0.reclustered && r0.splits == 0 && r0.maxLeafAfter == total,
      s"without the policy bit the sweep only reports: $r0")

    val r1 = maintain(spark, dir, "vec_id", "v", "version",
      MaintenancePolicy(maxLeafSize = 50, reclusterCodedTo = Some(16)))
    assert(r1.reclustered && r1.splits == 0, s"expected a recluster: $r1")
    assert(r1.maxLeafAfter < total,
      s"geometry must heal: max leaf ${r1.maxLeafAfter} of $total")

    val served = Serving.open(spark, dir)
    assert(served.tier == "sq")
    assert(served.numLeaves >= 2, "fresh model sidecar must load")
    // codes unchanged → the FULL-probe scan returns identical scores
    val after = served.searchSq(q, served.numLeaves, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(after == before,
      "a recluster moves leaf_id only — full-scan SQ scores must be " +
        s"bit-identical\nbefore=$before\nafter =$after")
    // idempotent: a healthy layout passes the next sweep untouched
    val r2 = maintain(spark, dir, "vec_id", "v", "version",
      MaintenancePolicy(maxLeafSize = 500, reclusterCodedTo = Some(16)))
    assert(!r2.reclustered && r2.maxLeafAfter == 0L)
  }

  test("reclusterCoded on a PQ/OPQ layout carries codebook + rotation " +
      "sidecars and preserves code words") {
    val emb = Tables.embeddings(spark, sf)
    val pqIds = (0 until 16).map(c => c * 31L + 5L)
    val cb = ProductQuantizer.codebook(emb, "vec_id", "embedding", pqIds)
    val rot = Array.tabulate(64) { r =>
      val c = if (r % 2 == 0) r + 1 else r - 1
      Array.tabulate(64)(j => if (j == c) 1.0 else 0.0)
    }
    val base = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"), lit(1L).as("version"))
    val model = IvfIndex.Model(Array(Array.fill(64)(0.0)))
    val coded = base
      .withColumn("leaf_id", lit(0))
      .withColumn("pq_code", ProductQuantizer.encodeExpr(
        ProductQuantizer.rotateExpr(col("v"), rot), cb))
      .drop("v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_codedrecluster_pq").toString + "/idx"
    IvfIndex.write(coded, dir, model)
    ProductQuantizer.writeCodebook(spark, dir, cb)
    ProductQuantizer.writeRotation(spark, dir, rot)
    val before = spark.read.parquet(dir)
      .select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    IndexMaintenance.reclusterCoded(spark, dir, "vec_id", "version", 8)

    val cb2 = ProductQuantizer.loadCodebook(spark, dir)
    assert(cb2.length == cb.length && cb2.head.sameElements(cb.head),
      "codebook sidecar must survive the recluster")
    val rot2 = ProductQuantizer.loadRotation(spark, dir)
    assert(rot2.nonEmpty && rot2.get(0).sameElements(rot(0)),
      "rotation sidecar must survive the recluster")
    val after = spark.read.parquet(dir)
      .select("vec_id", "pq_code", "leaf_id").collect()
    assert(after.map(_.getLong(0)).toSet == before.keySet)
    after.foreach(r => assert(r.getLong(1) == before(r.getLong(0)),
      s"code word changed for ${r.getLong(0)}"))
    assert(after.map(r => r.getInt(2)).distinct.length >= 2,
      "fresh geometry must actually distribute leaves")
  }
}
