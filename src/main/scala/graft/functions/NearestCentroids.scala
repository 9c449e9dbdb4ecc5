package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Top-1/top-2 centroid assignment against a FIXED centroid matrix —
  * the IVF build's hot loop as ONE compact expression.
  *
  * The composed form (an `array()` of k dot-product expressions +
  * `array_min`/`array_position`/`transform` masking) builds a
  * k-wide expression tree: at k=128 centroids the generated code blows
  * past JIT/codegen method limits and the whole stage falls back to
  * interpreted eval — measured 19.8 s for a 50k-row assignment pass
  * that is ~2·10⁸ multiply-adds (sub-second when compiled). Here the
  * centroid matrix rides along as a REFERENCE OBJECT (`double[][]`,
  * one per expression, no literals in the tree) and both eval and
  * codegen call one static loop, so assignment stays flat no matter
  * how many leaves the index has — the property that matters at
  * 100 TB, where leaf counts grow with the corpus.
  *
  * Scoring is augmented-L2: |c|² − 2·(x·c₍₀..d₋₁₎ + aux·c_d), with
  * |c|² over the full augmented centroid — ARITHMETIC-IDENTICAL
  * (same IEEE op order) to the composed expression it replaces, and
  * ties resolve to the FIRST minimal index exactly like
  * `array_position(s, array_min(s))`, so models, assignments, and the
  * hash-checked recall gates are bit-for-bit unchanged.
  *
  * Returns array<int> of the best leaf, plus the second-best when
  * `spill ≥ 2` (and a second centroid exists).
  */
case class NearestCentroids(left: Expression, right: Expression,
    centroids: Array[Array[Double]], spill: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "centroid set must be non-empty")

  /** |c|² over the full augmented centroid — same as the composed
    * form's driver-side `c.map(x => x*x).sum` literal.
    */
  @transient private lazy val norms: Array[Double] =
    centroids.map(_.map(x => x * x).sum)

  private def vec: Expression = left
  private def aux: Expression = right

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(v: Any, a: Any): Any =
    NearestCentroids.assign(v.asInstanceOf[ArrayData],
      a.asInstanceOf[Double], centroids, norms, spill)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centroids, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, a) =>
      s"${ev.value} = graft.functions.NearestCentroids.assign(" +
        s"$v, $a, $centsRef, $normsRef, $spill);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): NearestCentroids = copy(left = l, right = r)
}

object NearestCentroids {
  /** Called from both interpreted eval and generated code. The
    * strict-< update keeps the FIRST index among equal minima for both
    * best and second-best — identical to argmin-then-masked-argmin.
    */
  def assign(v: ArrayData, aux: Double, cents: Array[Array[Double]],
      norms: Array[Double], spill: Int): ArrayData = {
    var best = -1
    var second = -1
    var bs = Double.PositiveInfinity
    var ss = Double.PositiveInfinity
    val vn = v.numElements()
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val d = math.min(cent.length - 1, vn)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += cent(j) * v.getDouble(j); j += 1 }
      val s = norms(c) - 2.0 * (dot + aux * cent(cent.length - 1))
      if (s < bs) { second = best; ss = bs; best = c; bs = s }
      else if (s < ss) { second = c; ss = s }
      c += 1
    }
    if (spill >= 2 && second >= 0)
      new GenericArrayData(Array[Any](best, second))
    else new GenericArrayData(Array[Any](best))
  }
}
