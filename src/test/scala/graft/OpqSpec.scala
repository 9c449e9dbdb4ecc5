package graft

import graft.operators.ProductQuantizer
import org.apache.spark.sql.functions._

class OpqSpec extends SparkTestBase {

  /** A deterministic non-axis-aligned orthonormal basis (seeded
    * Gram–Schmidt) — used to smear structure across the 8-dim
    * subspace slices so axis-aligned PQ cannot exploit it.
    */
  private def scrambleBasis(d: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val b = Array.fill(d)(Array.fill(d)(rnd.nextGaussian()))
    var i = 0
    while (i < d) {
      var j = 0
      while (j < i) {
        var dot = 0.0; var k = 0
        while (k < d) { dot += b(i)(k) * b(j)(k); k += 1 }
        k = 0
        while (k < d) { b(i)(k) -= dot * b(j)(k); k += 1 }
        j += 1
      }
      var nrm = 0.0; var k = 0
      while (k < d) { nrm += b(i)(k) * b(i)(k); k += 1 }
      nrm = math.sqrt(nrm); k = 0
      while (k < d) { b(i)(k) /= nrm; k += 1 }
      i += 1
    }
    b
  }

  /** Anisotropic Gaussian-ish corpus with a decaying variance profile
    * ROTATED off the coordinate axes — the textbook OPQ case: after
    * the scramble every 8-dim slice mixes high- and low-variance
    * directions, so fixed-slice PQ wastes its codes; a learned
    * rotation re-aligns and re-balances them. Deterministic
    * (hash-uniform components, fixed mixing basis).
    */
  private def anisotropic(n: Long, d: Int,
      mix: Array[Array[Double]]): org.apache.spark.sql.DataFrame = {
    val sigma = Array.tabulate(d)(j => math.pow(0.93, j))
    val z = array((0 until d).map { j =>
      ((pmod(xxhash64(col("vec_id"), lit(j)), lit(2001L)) - 1000L)
        .cast("double") / 1000.0) * lit(sigma(j) * math.sqrt(3.0))
    }: _*)
    spark.range(n).select(col("id").as("vec_id"))
      .select(col("vec_id"),
        ProductQuantizer.rotateExpr(z, mix).as("v"))
  }

  test("trainOpq: orthogonal, deterministic, and it beats axis-aligned " +
      "PQ on rotated anisotropic data (the OPQ claim)") {
    val d = ProductQuantizer.NumSub * ProductQuantizer.SubDim
    val mix = scrambleBasis(d, 12345L)
    val vecs = anisotropic(3000L, d, mix).persist()
    vecs.count()

    val plainCb = ProductQuantizer.trainCodebooks(vecs, "vec_id", "v",
      maxSample = 3000, iters = 6)
    val plainErr = ProductQuantizer.reconstructionError(vecs, "v", plainCb)

    val (basis, cb) = ProductQuantizer.trainOpq(vecs, "vec_id", "v",
      maxSample = 3000, outer = 6, iters = 6)
    // B orthonormal: B·Bᵀ = I
    val dIdent = (0 until d).flatMap { i =>
      (0 until d).map { j =>
        var s = 0.0; var k = 0
        while (k < d) { s += basis(i)(k) * basis(j)(k); k += 1 }
        math.abs(s - (if (i == j) 1.0 else 0.0))
      }
    }.max
    assert(dIdent < 1e-9, s"basis not orthonormal: max deviation $dIdent")
    // rotation preserves inner products (serving metric unchanged)
    val x = Array.tabulate(d)(i => math.sin(i + 1.0))
    val q = Array.tabulate(d)(i => math.cos(2.0 * i))
    val raw = x.zip(q).map { case (a, b) => a * b }.sum
    val rot = ProductQuantizer.rotate(x, basis)
      .zip(ProductQuantizer.rotate(q, basis)).map { case (a, b) => a * b }.sum
    assert(math.abs(raw - rot) < 1e-9 * math.max(1.0, math.abs(raw)))

    val rotated = vecs.select(col("vec_id"),
      ProductQuantizer.rotateExpr(col("v"), basis).as("vr"))
    val opqErr = ProductQuantizer.reconstructionError(rotated, "vr", cb)
    info(f"reconstruction error: plain=$plainErr%.4f opq=$opqErr%.4f " +
      f"(${(1 - opqErr / plainErr) * 100}%.1f%% better)")
    assert(opqErr < 0.85 * plainErr,
      s"OPQ must beat axis-aligned PQ on rotated anisotropic data: " +
        s"opq=$opqErr plain=$plainErr")

    // deterministic end to end
    val (basis2, cb2) = ProductQuantizer.trainOpq(vecs, "vec_id", "v",
      maxSample = 3000, outer = 6, iters = 6)
    assert(basis.zip(basis2).forall { case (a, b) => a.sameElements(b) },
      "two OPQ trains over the same data must produce one basis")
    assert(cb.zip(cb2).forall { case (a, b) => a.sameElements(b) })
    vecs.unpersist()
  }

  test("durable OPQ serving tier: rotation sidecar reopens for " +
      "appends, queries, and survives compaction") {
    import graft.operators.IvfIndex
    import graft.streaming.IndexMaintenance
    val d = ProductQuantizer.NumSub * ProductQuantizer.SubDim
    val mix = scrambleBasis(d, 4242L)
    val vecs = anisotropic(1200L, d, mix)
      .withColumn("version", lit(1L)).persist()
    vecs.count()
    val (basis, cb) = ProductQuantizer.trainOpq(vecs, "vec_id", "v",
      maxSample = 1200, outer = 4, iters = 5)
    val cents = vecs.filter(col("vec_id") % 150 === 0).limit(8)
      .select(col("vec_id"), col("v")).collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val model = IvfIndex.Model(cents)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_opqserve").toString + "/idx"
    val coded = vecs
      .withColumn("leaf_id",
        explode(IvfIndex.probeExpr(model, col("v"), 1)))
      .withColumn("pq_code", ProductQuantizer.encodeExpr(
        ProductQuantizer.rotateExpr(col("v"), basis), cb))
      .drop("v")
    IvfIndex.write(coded, dir, model)
    ProductQuantizer.writeCodebook(spark, dir, cb)
    ProductQuantizer.writeRotation(spark, dir, basis)

    // a FRESH session appends through the sidecars alone: the upsert
    // must be encoded via the reloaded rotation or its ADC score is
    // garbage in the rotated codebook space
    val query = vecs.filter(col("vec_id") === 5)
      .select("v").head().getSeq[Double](0).toArray
    val up = spark.range(1).select(lit(900000L).as("vec_id"),
      typedLit(query.toSeq).as("v"), lit(2L).as("version"))
    IndexMaintenance.appendCodedToServing(spark, dir, up,
      "vec_id", "v", "version")

    def searchAll(): Seq[Long] = {
      val cb2 = ProductQuantizer.loadCodebook(spark, dir)
      val rot = ProductQuantizer.loadRotation(spark, dir).get
      IndexMaintenance.readServing(spark, dir, "vec_id", "version")
        .select(col("vec_id"),
          ProductQuantizer.adcScoreExpr(col("pq_code"),
            ProductQuantizer.adcTable(
              ProductQuantizer.rotate(query, rot), cb2)).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(5)
        .collect().map(_.getLong(0)).toSeq
    }
    val top = searchAll()
    assert(top.contains(900000L) && top.contains(5L),
      s"the appended copy of the query and the query row itself must " +
        s"rank in the ADC top-5, got $top")

    // compaction carries BOTH sidecars; the tier keeps serving
    IndexMaintenance.compactServing(spark, dir, "vec_id", "version")
    assert(ProductQuantizer.loadRotation(spark, dir).isDefined,
      "the rotation sidecar must survive compaction")
    assert(searchAll() == top,
      "compaction must not change the served ADC ranking")
    vecs.unpersist()
  }

  test("rotated encode/ADC pipeline serves through the learned basis") {
    val d = ProductQuantizer.NumSub * ProductQuantizer.SubDim
    val mix = scrambleBasis(d, 777L)
    val vecs = anisotropic(1500L, d, mix).persist()
    vecs.count()
    val (basis, cb) = ProductQuantizer.trainOpq(vecs, "vec_id", "v",
      maxSample = 1500, outer = 4, iters = 5)
    val codes = vecs.select(col("vec_id"),
      ProductQuantizer.encodeExpr(
        ProductQuantizer.rotateExpr(col("v"), basis), cb).as("pq_code"))
    val query = vecs.filter(col("vec_id") === 5)
      .select("v").head().getSeq[Double](0).toArray
    val adcTop = ProductQuantizer.searchCodes(codes, "vec_id", cb,
        ProductQuantizer.rotate(query, basis), 100)
      .collect().map(_.getLong(0)).toSet
    // the compressed shortlist must contain most of the exact top-10
    // (recall@100 — the standard PQ serving contract; exact ranking
    // comes from the re-rank stage, v_ivfpq_rerank)
    val exact = vecs.select(col("vec_id"),
        graft.functions.vectors.dotProduct(col("v"),
          typedLit(query.toSeq)).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0))
    val recall = exact.count(adcTop.contains) / 10.0
    info(f"rotated-ADC recall@100 of exact top-10: $recall%.2f")
    assert(recall >= 0.7,
      s"rotated ADC shortlist lost the exact top-10: recall=$recall")
    vecs.unpersist()
  }
}
