package graft

import org.apache.spark.sql.functions._
import graft.functions.{bquant, vectors, PackSign}

/** Binary-quantization kernel identities — the bit-level contracts
  * the `v_bq_*` value oracles can't isolate: the packed buffer is the
  * sign pattern, the asymmetric dot equals the float dot against the
  * ±1 sign vector, hamming is a metric consistent with the sign
  * inner product, and the driver-side pack mirrors the expression.
  */
class BqSpec extends SparkTestBase {
  import spark.implicits._

  test("signDot == dot against the ±1 sign vector, on every corpus row") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = emb.filter(col("vec_id") === 3L)
      .select("v").head().getSeq[Double](0)
    val mismatches = emb.select(
        bquant.signDot(bquant.packSigns(col("v")), typedLit(q)).as("a"),
        vectors.dotProduct(
          transform(col("v"), x => when(x > 0d, 1d).otherwise(-1d)),
          typedLit(q)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0L,
      "asymmetric sign-dot must be bit-identical to the ±1 dot")
  }

  test("hamming: identity, symmetry, and the sign-inner-product relation") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(100)
    val q = emb.filter(col("vec_id") === 3L)
      .select("v").head().getSeq[Double](0).toArray
    val qBits = PackSign.packLocal(q)
    // h(x, x) = 0
    assert(emb.select(max(bquant.hamming(bquant.packSigns(col("v")),
        bquant.packSigns(col("v"))))).head().getInt(0) == 0)
    // h(x, q) = (d − ⟨sign(x), sign(q)⟩) / 2, exactly, on every row
    val qs = q.toSeq.map(x => if (x > 0) 1d else -1d)
    val bad = emb.select(
        bquant.hamming(bquant.packSigns(col("v")), lit(qBits)).as("h"),
        ((lit(64) - vectors.dotProduct(
          transform(col("v"), x => when(x > 0d, 1d).otherwise(-1d)),
          typedLit(qs)).cast("int")) / 2).cast("int").as("rel"))
      .filter(col("h") =!= col("rel")).count()
    assert(bad == 0L, "hamming must satisfy h = (d - <sa,sq>)/2")
  }

  test("driver-side packLocal mirrors the PackSign expression") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(20)
    emb.select(col("v"), bquant.packSigns(col("v")).as("bits"))
      .collect().foreach { r =>
        val v = r.getSeq[Double](0).toArray
        val expr = r.getAs[Array[Byte]](1)
        assert(java.util.Arrays.equals(expr, PackSign.packLocal(v)),
          s"pack mismatch for ${v.take(4).mkString(",")}…")
      }
  }
}
