package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Signed-random-projection LSH (Charikar 2002) — the sub-quadratic
  * candidate path for EMBEDDING-cosine near-dup, completing the
  * bucketed-dedup family (exact → MinHash/Jaccard → SimHash/Hamming →
  * SRP/cosine). `d_cosine_pairs` stays the brute-force recall oracle;
  * this is what runs at corpus scale.
  *
  * Signature: bit j of a vector x is [⟨x, r_j⟩ ≥ 0] where r_j is a
  * fixed ±1 projection derived from an integer mixer over (j, idx) —
  * deterministic, data-independent, and exactly reproducible in SQL
  * (all arithmetic is bigint; there is NO floating point anywhere in
  * this operator, so the oracle hash-matches bit-for-bit).
  *
  * Candidates: the 56-bit signature splits into 7 byte bands; high
  * cosine ⇒ most sign bits agree ⇒ some whole band collides with high
  * probability (p_band = p_bit⁸, recall = 1-(1-p_band)⁷ ≈ 0.91 at
  * cosine 0.9, →1 for near-identical vectors). Per-band equi-joins —
  * the same bucketed shape as MinHash banding, no cross product.
  * 56 bits keeps every packed value positive (DuckDB raises on a
  * 1<<63 bigint overflow, and the sign bit would complicate nothing
  * else but that); recall tunes with more bits/bands if needed.
  *
  * Verification keeps integer exactness: cosine(a,b) ≥ τ (τ = p/q
  * rational) ⟺ dot > 0 ∧ q²·dot² ≥ p²·na·nb, evaluated in bigint.
  *
  * Scale: signatures are two linear aggregations (S:2); band joins
  * shuffle on the band byte; verification touches candidate pairs
  * only. At 100 TB widen the signature (64/128 bits) so band-key
  * cardinality doesn't cap parallelism.
  */
object SrpLsh {

  val Bits = 56
  val BandBits = 8
  /** idx stride when mixing (j, idx) — must exceed the vector dim. */
  val Stride = 1024L

  /** ±1 projection component r_j[idx]: a HIGH bit of an LCG mix —
    * the low bits of an LCG are strongly patterned and produced
    * measurably correlated projections (recall 0.47 vs the 0.9
    * theory); bit 20 restores independence.
    */
  private def projSign(j: org.apache.spark.sql.Column,
      idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(shiftright(((lit(1103515245L) * (j * Stride + idx) + 12345L)
      % 2147483647L).cast("long"), 20).bitwiseAND(lit(1L)) === 0L, 1L)
      .otherwise(-1L)

  /** (id, idx, w) sparse integer vectors → (id, srp) 32-bit signatures. */
  def signatures(vec: DataFrame, id: String): DataFrame = {
    val perBit = vec
      .withColumn("j", explode(sequence(lit(0), lit(Bits - 1))))
      .withColumn("p", projSign(col("j"), col("idx")))
      .groupBy(col(id), col("j"))
      .agg(sum(col("w") * col("p")).as("s"))
    perBit.groupBy(id)
      .agg(sum(when(col("s") >= 0,
        expr("shiftleft(cast(1 as bigint), j)")).otherwise(0L)).as("srp"))
  }

  /** Banded candidate pairs + exact integer cosine-≥(p/q) verify.
    * Output: (da, db, dot, na, nb) — all bigint, hash-exact.
    */
  def nearDupPairs(vec: DataFrame, id: String,
      tauP: Long = 9L, tauQ: Long = 10L): DataFrame = {
    val v = vec.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sig = signatures(v, id)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nBands = Bits / BandBits
        val mask = (1L << BandBits) - 1L
        val perBand = (0 until nBands).map { b =>
          val key = shiftright(col("srp"), b * BandBits).bitwiseAND(lit(mask))
          val a = sig.select(col(id).as("da"), key.as("k"))
          val bb = sig.select(col(id).as("db"), key.as("k"))
          a.join(bb, Seq("k")).filter(col("da") < col("db"))
            .select("da", "db")
        }
        val cand = perBand.reduce(_ unionAll _).distinct()
        val norms = v.groupBy(id).agg(sum(col("w") * col("w")).as("n2"))
        val dots = cand
          .join(v.select(col(id).as("da"), col("idx"), col("w").as("wa")), "da")
          .join(v.select(col(id).as("db"), col("idx"), col("w").as("wb")),
            Seq("db", "idx"))
          .groupBy("da", "db")
          .agg(sum(col("wa") * col("wb")).as("dot"))
        dots
          .join(norms.select(col(id).as("da"), col("n2").as("na")), "da")
          .join(norms.select(col(id).as("db"), col("n2").as("nb")), "db")
          .filter(col("dot") > 0 &&
            lit(tauQ * tauQ) * col("dot") * col("dot") >=
              lit(tauP * tauP) * col("na") * col("nb"))
          .select("da", "db", "dot", "na", "nb")
          .localCheckpoint()
      } finally { sig.unpersist(); () }
    } finally v.unpersist()
  }
}
