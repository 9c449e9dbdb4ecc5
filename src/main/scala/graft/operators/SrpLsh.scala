package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed-random-projection LSH (Charikar 2002) — the sub-quadratic
  * candidate path for EMBEDDING-cosine near-dup, completing the
  * bucketed-dedup family (exact → MinHash/Jaccard → SimHash/Hamming →
  * SRP/cosine). `d_cosine_pairs` stays the brute-force recall oracle;
  * this is what runs at corpus scale.
  *
  * Signature: bit j of vector x is [⟨x, r_j⟩ ≥ 0] where r_j is a
  * fixed ±1 projection derived from an integer mixer over (j, idx) —
  * deterministic, data-independent, and exactly reproducible in SQL
  * (all arithmetic is bigint; there is NO floating point anywhere in
  * this operator, so the oracle hash-matches bit-for-bit).
  *
  * Mixer: one LCG round mod p=2³¹−1, then SQUARED mod p. The square
  * is essential: an LCG alone (or any composition of LCGs — still an
  * LCG) is linear, so for a fixed idx the per-j hashes form an
  * arithmetic progression and sign bits within a band correlate;
  * measured on the sf0.1 corpus that inflated band collisions 37×
  * (992k candidate pairs vs 27k with the squared mixer). h² ≤ 2⁶²
  * keeps every intermediate inside a signed 64-bit int, so DuckDB's
  * overflow-checked bigint accepts it. Each mixed hash yields 24 sign
  * bits (bits 7..30), so the 96-bit signature costs 4 hash
  * evaluations per vector row, not 96.
  *
  * Candidates: 96 bits split into 8 bands of 12; high cosine ⇒ most
  * sign bits agree ⇒ some whole band collides with high probability
  * (p_band = p_bit¹², recall = 1−(1−p_band)⁸ ≈ 0.74 at cosine 0.9,
  * →1 for near-identical vectors). Band keys live in a stacked
  * (id, band, key) relation; ONE self-equi-join on (band, key)
  * produces candidates — the same bucketed shape as MinHash banding,
  * no cross product.
  *
  * Verification keeps integer exactness: cosine(a,b) ≥ τ (τ = p/q
  * rational) ⟺ dot > 0 ∧ q²·dot² ≥ p²·na·nb, evaluated in bigint.
  *
  * Scale: signatures are one explode(×4)+aggregation, S:1; the band
  * self-join shuffles n·8 key rows; verification touches candidate
  * pairs only. Band width must grow with log n (p_background^width ≲
  * 1/n keeps candidates O(n)): at 100 TB use 16–24-bit bands and
  * more of them — BandBits/nBands are the knobs, and wider bands
  * also raise band-key cardinality so the self-join keeps its
  * parallelism at 1000 executors.
  */
object SrpLsh {

  val Bits = 96
  val BandBits = 12
  val BitsPerHash = 24
  /** idx stride when mixing (m, idx) — must exceed the vector dim. */
  val Stride = 1024L
  private val P = 2147483647L // 2³¹ − 1

  /** m-th mixed hash for a dimension index: squared LCG mod p. */
  private def mixHash(m: Int, idx: Column): Column = {
    val h = (lit(1103515245L) * (lit(m.toLong) * Stride + idx) + 12345L) % P
    (h * h) % P
  }

  /** (id, idx, w) sparse integer vectors → stacked (id, band, k) band
    * keys of the sign signature. Defaults are the 96-bit / 8×12-bit
    * oracle-pinned configuration; `bits`/`bandBits`/`bitsPerHash` are
    * the REAL scale knobs the scaladoc's growth rule refers to —
    * band-bucket mass grows as nBands·n²/2^(bandBits+1), so at 50k+
    * docs 12-bit bands already saturate (measured 2.75M candidate
    * mass at n=50 000; 16-bit bands cut it ~16×, see DedupScaleSpec).
    */
  def bandKeys(vec: DataFrame, id: String, bits: Int = Bits,
      bandBits: Int = BandBits, bitsPerHash: Int = BitsPerHash): DataFrame = {
    require(bits % bitsPerHash == 0, s"bits=$bits not a multiple of bitsPerHash=$bitsPerHash")
    require(bitsPerHash % bandBits == 0, s"bitsPerHash=$bitsPerHash not a multiple of bandBits=$bandBits")
    require(bitsPerHash <= 24, s"a mixed hash yields at most 24 usable sign bits, got $bitsPerHash")
    val nHashes = bits / bitsPerHash
    val bandsPerHash = bitsPerHash / bandBits
    val hashed = vec.select(col(id), col("w"), posexplode(array(
      (0 until nHashes).map(m => mixHash(m, col("idx"))): _*)).as(Seq("m", "h")))
    // s_r = Σ w·sign_r where sign_r = 1−2·bit_r(h); bits 7..30 of the mix
    val sums = (0 until bitsPerHash).map(r =>
      sum(col("w") * (shiftright(col("h"), 7 + r).bitwiseAND(lit(1L))
        * lit(-2L) + 1L)).as(s"s$r"))
    val agg = hashed.groupBy(col(id), col("m")).agg(sums.head, sums.tail: _*)
    def key(lo: Int): Column = (0 until bandBits).map(r =>
      when(col(s"s${lo + r}") >= 0, lit(1L << r)).otherwise(0L)).reduce(_ + _)
    agg.select(col(id), col("m"),
        posexplode(array((0 until bandsPerHash).map(b => key(b * bandBits)): _*))
          .as(Seq("half", "k")))
      .select(col(id),
        (col("m") * bandsPerHash + col("half")).as("band"), col("k"))
  }

  /** Banded candidate pairs + exact integer cosine-≥(p/q) verify.
    * Output: (da, db, dot, na, nb) — all bigint, hash-exact.
    *
    * The verify comparison q²·dot² ≥ p²·na·nb is evaluated in
    * decimal(38,0), not Long: for large docs (n2 ≳ 3e8 per side)
    * p²·na·nb exceeds 2⁶³ and Long arithmetic would wrap silently,
    * corrupting the verdict exactly at the document sizes the 100 TB
    * path exists for. decimal(38,0) holds any physically possible
    * value here (dot² ≤ na·nb < 10³⁶ would need ~10¹⁸ shingles in one
    * doc); the oracle mirrors it with DuckDB HUGEINT.
    */
  def nearDupPairs(vec: DataFrame, id: String,
      tauP: Long = 9L, tauQ: Long = 10L): DataFrame = {
    val v = vec.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sig = bandKeys(v, id)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val cand = sig.select(col(id).as("da"), col("band"), col("k"))
          .join(sig.select(col(id).as("db"), col("band"), col("k")),
            Seq("band", "k"))
          .filter(col("da") < col("db"))
          .select("da", "db").distinct()
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
            lit(tauQ * tauQ).cast("decimal(38,0)") *
              col("dot").cast("decimal(38,0)") * col("dot").cast("decimal(38,0)") >=
              lit(tauP * tauP).cast("decimal(38,0)") *
                col("na").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)"))
          .select("da", "db", "dot", "na", "nb")
          .localCheckpoint()
      } finally { sig.unpersist(); () }
    } finally { v.unpersist(); () }
  }
}
