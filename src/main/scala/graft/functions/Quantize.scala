package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

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

  /** Pack int8 codes to ONE byte per dimension — the storage form of
    * the SQ8 serving tier: a 64-dim vector is 64 B + one float scale,
    * vs 256 B raw (and vs 512 B for the same codes as array<bigint>,
    * which parquet can't pack below its int encoding width). Byte i
    * holds code_i + 127 (0..254, biased so the byte is order-free of
    * sign games); [[packedDot]] un-biases inside its loop.
    */
  def packCodes(codes: Column): Column =
    Shims.column(PackInt8(Shims.expression(codes.cast("array<bigint>"))))

  /** Exact integer dot product over two PACKED code buffers — the SQ8
    * scan kernel: one fused byte loop, no array headers, no boxing;
    * the accumulator stays integer (≤ 127²·dim per pair, overflow-free
    * in long), so the result is bit-reproducible anywhere.
    */
  def packedDot(a: Column, b: Column): Column =
    Shims.column(SqDot(Shims.expression(a), Shims.expression(b)))

  /** Dequantize a PACKED code buffer back to an approximate vector:
    * x̂ᵢ = codeᵢ · ma/127. The decode is what a coded-layout
    * RECLUSTER fits fresh leaf geometry over (the raw vectors are
    * gone by design — the tier exists to not store them), and the
    * round trip is IDEMPOTENT: re-quantizing x̂ under its own maxAbs
    * reproduces the identical codes (the max coordinate decodes to
    * exactly ma, and floor(c + 0.5) = c for integer c), so a
    * recluster never degrades the stored codes.
    */
  def decode(packed: Column, ma: Column): Column =
    transform(
      Shims.column(UnpackInt8(Shims.expression(packed))),
      c => c * (ma / lit(127.0)))

  /** Driver-side mirror of maxAbs + codes + packCodes for query-time
    * literals (same floor(x·127/m + 0.5) arithmetic, same +127 bias).
    */
  def packLocal(v: Array[Double]): (Double, Array[Byte]) = {
    var ma = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > ma) ma = a; i += 1 }
    val out = new Array[Byte](v.length)
    i = 0
    while (i < v.length) {
      val c = if (ma == 0) 0L
        else math.floor(v(i) * (127.0 / ma) + 0.5).toLong
      out(i) = (c + 127L).toByte
      i += 1
    }
    (ma, out)
  }
}

/** codes (array<bigint>, each in [-127, 127]) → binary, byte_i =
  * code_i + 127. Null elements are rejected loudly — a null code
  * inside a vector is a corrupt row, not a maskable value.
  */
case class PackInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq_pack"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    PackInt8.pack(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PackInt8.pack($a)")

  override protected def withNewChildInternal(c: Expression): PackInt8 =
    copy(child = c)
}

object PackInt8 {
  /** Called from generated code. */
  def pack(x: ArrayData): Array[Byte] = {
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      require(!x.isNullAt(i), "graft_sq_pack: null code element")
      val c = x.getLong(i)
      require(c >= -127L && c <= 127L,
        s"graft_sq_pack: code $c outside [-127, 127]")
      out(i) = (c + 127L).toByte
      i += 1
    }
    out
  }
}

/** Σ (aᵢ-127)·(bᵢ-127) over the common prefix of two packed code
  * buffers ([[PackInt8]] layout). Long result; exact.
  */
case class SqDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sq_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDot.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SqDot.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SqDot = copy(left = l, right = r)
}

object SqDot {
  /** Called from generated code. */
  def dot(x: Array[Byte], y: Array[Byte]): Long = {
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += ((x(i) & 0xFF) - 127).toLong * ((y(i) & 0xFF) - 127).toLong
      i += 1
    }
    s
  }
}

/** Un-bias a [[PackInt8]] buffer back to its raw codes as
  * array<double> — the scan-side half of [[quantize.decode]].
  */
case class UnpackInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_sq_unpack"

  override def nullSafeEval(a: Any): Any =
    UnpackInt8.unpack(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.UnpackInt8.unpack($a)")

  override protected def withNewChildInternal(c: Expression): UnpackInt8 =
    copy(child = c)
}

object UnpackInt8 {
  /** Called from generated code. */
  def unpack(b: Array[Byte]): ArrayData = {
    val out = new Array[Double](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = ((b(i) & 0xFF) - 127).toDouble
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
