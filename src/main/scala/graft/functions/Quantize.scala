package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Int8 vector quantization — the memory lever for 100 TB embedding
  * corpora: a 64-dim float vector (256 B) becomes 64 int8-ish values
  * + one scale (≈66 B), and the quantized dot product is exact
  * integer arithmetic (fast, overflow-free in BIGINT, and
  * bit-reproducible across engines — unlike float dot products, no
  * accumulation-order concern at all).
  *
  * Scheme: symmetric linear — q_i = floor(v_i · 127/maxabs + 0.5),
  * dequantized score ≈ (Σ qa_i·qb_i) · (ma·mb)/127².
  */
object quantize {

  /** Per-vector scale: max |v_i|. */
  def maxAbs(v: Column): Column = array_max(transform(v, x => abs(x)))

  /** Quantize to BIGINT codes in [-127, 127]. floor(x+0.5) rounding is
    * bit-deterministic (no banker's-rounding ambiguity). A zero vector
    * (m = 0) quantizes to all-zero codes — without the guard Spark's
    * x/0 → NULL while DuckDB's IEEE 0·inf → NaN, and the engines
    * diverge.
    */
  def codes(v: Column, m: Column): Column =
    transform(v, x => when(m === 0d, lit(0L))
      .otherwise(floor(x * (lit(127.0) / m) + 0.5).cast("bigint")))

  /** Exact integer dot product of two code vectors. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Dequantized approximate score (one deterministic float expr). */
  def score(intDotCol: Column, ma: Column, mb: Column): Column =
    intDotCol.cast("double") * (ma * mb / lit(127.0 * 127.0))
}
