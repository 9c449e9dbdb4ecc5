package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** BINARY (1-bit) vector quantization — the shortlist rung below the
  * coded ladder's PQ tier: a 64-dim float vector (256 B raw, ≈66 B
  * SQ8, 4 B PQ) becomes EIGHT BYTES of sign bits. Two scoring
  * kernels, both exact integer/sign arithmetic and therefore
  * bit-reproducible across engines and partitionings:
  *
  *  - asymmetric sign-dot ([[BqDot]]): score(bits, q) =
  *    Σⱼ (bitⱼ ? qⱼ : −qⱼ) = ⟨sign(x), q⟩ — the query stays float,
  *    only the corpus is binarized (the same asymmetry as ADC), so
  *    ranking quality degrades far less than symmetric hamming;
  *  - hamming ([[BqHamming]]): popcount(a XOR b) — the symmetric
  *    distance for code-to-code comparison (near-dup, clustering),
  *    related to the sign inner product by h = (d − ⟨sa, sb⟩)/2.
  *
  * The production shape is shortlist-then-rescore (`v_bq_rerank`):
  * BQ top-M from an 8 B/vector scan, then the exact float dot over
  * the M survivors — a 32× scan-byte reduction with exact final
  * ranking, the same two-stage economics as `v_ivfpq_rerank`.
  *
  * Sign convention: bit = 1 iff xⱼ > 0 (zero → 0) — deterministic,
  * no epsilon. Bit j lives in byte j/8, mask 1 << (j & 7).
  */
case class PackSign(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bq_pack"

  override def nullSafeEval(a: Any): Any =
    PackSign.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PackSign.pack($a)")

  override protected def withNewChildInternal(c: Expression): PackSign =
    copy(child = c)
}

object PackSign {
  /** Called from generated code. */
  def pack(x: ArrayData): Array[Byte] = {
    val n = x.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var j = 0
    while (j < n) {
      require(!x.isNullAt(j), "graft_bq_pack: null vector element")
      if (x.getDouble(j) > 0.0)
        out(j >> 3) = (out(j >> 3) | (1 << (j & 7))).toByte
      j += 1
    }
    out
  }

  /** Driver-side mirror for query-time literals. */
  def packLocal(v: Array[Double]): Array[Byte] = {
    val out = new Array[Byte]((v.length + 7) / 8)
    var j = 0
    while (j < v.length) {
      if (v(j) > 0.0)
        out(j >> 3) = (out(j >> 3) | (1 << (j & 7))).toByte
      j += 1
    }
    out
  }
}

/** Asymmetric sign-dot: Σⱼ (bitⱼ(a) ? qⱼ : −qⱼ), j ascending — the
  * summation order is fixed so the double result is bit-identical to
  * `list_inner_product(sign(x), q)` computed in the same order (each
  * term is EXACTLY ±qⱼ; IEEE addition of identical terms in the
  * identical order gives identical partial sums).
  */
case class BqDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_bq_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    BqDot.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BqDot.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BqDot = copy(left = l, right = r)
}

object BqDot {
  /** Called from generated code. */
  def dot(bits: Array[Byte], q: ArrayData): Double = {
    val n = q.numElements()
    require(bits.length == (n + 7) / 8,
      s"graft_bq_dot: ${bits.length} code bytes cannot hold $n dims")
    var s = 0.0
    var j = 0
    while (j < n) {
      require(!q.isNullAt(j), "graft_bq_dot: null query element")
      val x = q.getDouble(j)
      s += (if ((bits(j >> 3) & (1 << (j & 7))) != 0) x else -x)
      j += 1
    }
    s
  }
}

/** popcount(a XOR b) — symmetric hamming distance between two
  * [[PackSign]] buffers of equal length. Int result; exact.
  */
case class BqHamming(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bq_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    BqHamming.hamming(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BqHamming.hamming($a, $b)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BqHamming = copy(left = l, right = r)
}

object BqHamming {
  /** Called from generated code. */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length,
      s"graft_bq_hamming: length mismatch ${a.length} vs ${b.length}")
    var h = 0
    var i = 0
    while (i < a.length) {
      h += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    h
  }
}

/** Column-API facade for the BQ tier. */
object bquant {
  /** array<double> → sign-bit buffer ((n+7)/8 bytes). */
  def packSigns(v: Column): Column =
    Shims.column(PackSign(Shims.expression(v.cast("array<double>"))))

  /** Asymmetric sign-dot of a packed buffer against a float query. */
  def signDot(bits: Column, q: Column): Column =
    Shims.column(BqDot(Shims.expression(bits),
      Shims.expression(q.cast("array<double>"))))

  /** Symmetric hamming distance between two packed buffers. */
  def hamming(a: Column, b: Column): Column =
    Shims.column(BqHamming(Shims.expression(a), Shims.expression(b)))

  /** THE sign-code drift predicate: true where a stored companion
    * code disagrees with the vector it rides next to. The single
    * definition shared by the append path's derivation audit
    * ([[graft.operators.Serving.verifyBqCodes]]) and the autopilot
    * sweep ([[graft.streaming.IndexMaintenance.maintain]]) — one
    * formula, so a probe can never drift from the derivation it
    * checks ([[graft.streaming.IndexMaintenance.appendToServing]]
    * writes `packSigns(vec)` itself).
    */
  def codeDrift(vec: Column, code: Column): Column =
    code =!= packSigns(vec)
}
