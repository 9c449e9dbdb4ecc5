package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dense-vector hot loop.
  *
  * Semantics mirror the reference's implied scoring
  * (`DOT_PRODUCT_DISTANCE`, /root/reference/common/config.py:33): the
  * score between a query and a datapoint vector is Σ qᵢ·vᵢ.
  *
  * All accumulate sequentially (forward) in double — that makes the
  * result independent of partitioning AND bit-identical to the DuckDB
  * oracle's list_* functions, so kNN scores hash-match exactly.
  * Codegen keeps the loop inside whole-stage codegen (no UDF
  * serialization, no boxing); interpreted eval is the fallback.
  */
trait VectorBinaryOp { self: BinaryExpression with ExpectsInputTypes =>
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
}

/** dot(a, b) = Σ aᵢ·bᵢ over the common prefix length. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with VectorBinaryOp {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  // all locals via freshName: many instances of this expression can be
  // inlined into ONE generated method (e.g. a 16-centroid score array),
  // where fixed names collide and kick the whole stage to the interpreter
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
      |${ev.value} = $s;
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (sqrt(Σa²) · sqrt(Σb²)) — the norm factors are
  * rooted separately (matches DuckDB list_cosine_similarity bit-for-bit).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with VectorBinaryOp {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xa = x.getDouble(i); val yb = y.getDouble(i)
      s += xa * yb; na += xa * xa; nb += yb * yb
      i += 1
    }
    s / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $xa = $a.getDouble($i); double $yb = $b.getDouble($i);
      |  $s += $xa * $yb; $na += $xa * $xa; $nb += $yb * $yb;
      |}
      |${ev.value} = $s / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** l2(a, b) = sqrt(Σ (aᵢ-bᵢ)²) — matches DuckDB list_distance. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with VectorBinaryOp {
  override def prettyName: String = "graft_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val t = x.getDouble(i) - y.getDouble(i); s += t * t; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $t = $a.getDouble($i) - $b.getDouble($i); $s += $t * $t;
      |}
      |${ev.value} = java.lang.Math.sqrt($s);
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Distance =
    copy(left = l, right = r)
}

/** norm(a) = sqrt(Σ aᵢ²). */
case class L2Norm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.L2Norm.normOf($a)")

  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
}

object L2Norm {
  /** Called from generated code. */
  def normOf(x: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }
}

/** y = B·x for a PLAN-CONSTANT matrix B (an orthonormal OPQ rotation):
  * one expression, one referenced double[][], one fused loop — versus
  * an `array(dot(x,b₀), …, dot(x,b_{d-1}))` tree, which at d = 64
  * inlines 64 separate dot-product loops plus the array constructor
  * into the generated method (janino compile time alone was the
  * dominant cost of the rotated-PQ path). Row accumulation is forward
  * (j ascending), the same IEEE order as [[DotProduct]] and the
  * driver-side mirror, so results are bit-identical to both.
  */
case class MatVec(child: Expression, basis: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override def nullSafeEval(a: Any): Any =
    MatVec.compute(a.asInstanceOf[ArrayData], basis)

  // `compute`, not `apply`: the case class inherits TreeNode.apply(int),
  // and Scala suppresses the static forwarder for any name the class
  // already has — janino would then resolve only apply(int) and fail,
  // silently de-compiling the whole projection stage (interpreted
  // fallback). A clash-free name gets its forwarder, like L2Norm.normOf.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("basis", basis, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.MatVec.compute($a, $b)")
  }

  override protected def withNewChildInternal(c: Expression): MatVec =
    copy(child = c)
}

object MatVec {
  /** Called from generated code (via the static forwarder — see doGenCode). */
  def compute(x: ArrayData, basis: Array[Array[Double]]): ArrayData = {
    val out = new Array[Double](basis.length)
    var r = 0
    while (r < basis.length) {
      val row = basis(r)
      val n = math.min(x.numElements(), row.length)
      var s = 0.0
      var j = 0
      while (j < n) { s += x.getDouble(j) * row(j); j += 1 }
      out(r) = s
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-level entry points; inputs are cast to array<double> so both
  * array<float> (parquet embeddings) and literal arrays work.
  */
object vectors {
  private def d(c: Column): Column = c.cast("array<double>")
  private def bin(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    Shims.column(f(
      Shims.expression(d(a)), Shims.expression(d(b))))

  def dotProduct(a: Column, b: Column): Column = bin(DotProduct.apply)(a, b)
  def cosineSimilarity(a: Column, b: Column): Column = bin(CosineSimilarity.apply)(a, b)
  def l2Distance(a: Column, b: Column): Column = bin(L2Distance.apply)(a, b)
  def l2Norm(a: Column): Column =
    Shims.column(L2Norm(Shims.expression(d(a))))
}
