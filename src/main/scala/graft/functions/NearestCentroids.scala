package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Top-n centroid assignment against a FIXED centroid matrix —
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
  * `array_position(s, array_min(s))` (the bounded insertion uses
  * strict `<`, so an equal later score never displaces an earlier
  * one), so models, assignments, and the hash-checked recall gates
  * are bit-for-bit unchanged.
  *
  * Returns array<int> of the best min(take, k) centroid indices in
  * rank order (score ascending). `take=2` is the build's top-2 spill
  * assignment; larger `take` is the query-side router — the same
  * expression computes a batch of queries' nProbe probe lists
  * DISTRIBUTED over the query DataFrame, with no driver-side loop.
  */
case class NearestCentroids(left: Expression, right: Expression,
    centroids: Array[Array[Double]], take: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "centroid set must be non-empty")
  require(take >= 1, s"take must be >= 1, got $take")

  /** |c|² over the full augmented centroid — same as the composed
    * form's driver-side `c.map(x => x*x).sum` literal.
    */
  @transient private lazy val norms: Array[Double] =
    centroids.map(_.map(x => x * x).sum)

  // the deep hash walks the whole matrix — cache it, or every
  // analyzer/optimizer hash lookup over this expression is O(L·d)
  @transient private lazy val contentHash: Int =
    java.util.Objects.hash(Integer.valueOf(take),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        centroids.asInstanceOf[Array[AnyRef]])))

  private def vec: Expression = left
  private def aux: Expression = right

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(v: Any, a: Any): Any =
    NearestCentroids.assign(v.asInstanceOf[ArrayData],
      a.asInstanceOf[Double], centroids, norms, take)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centroids, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, a) =>
      s"${ev.value} = graft.functions.NearestCentroids.assign(" +
        s"$v, $a, $centsRef, $normsRef, $take);")
  }

  // the Array[Array[Double]] field compares by reference under the
  // synthesized case-class equals, which silently defeats expression
  // canonicalization / subexpression elimination (false negatives
  // only, but they cost plan quality) — compare contents instead
  override def equals(other: Any): Boolean = other match {
    case nc: NearestCentroids =>
      left == nc.left && right == nc.right && take == nc.take &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          nc.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Integer.valueOf(contentHash))

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): NearestCentroids = copy(left = l, right = r)
}

object NearestCentroids {
  /** Called from both interpreted eval and generated code. Bounded
    * insertion with strict `<` keeps the FIRST index among equal
    * scores at every rank — identical to argmin-then-masked-argmin
    * for take ≤ 2, and its natural top-n extension beyond.
    */
  def assign(v: ArrayData, aux: Double, cents: Array[Array[Double]],
      norms: Array[Double], take: Int): ArrayData = {
    val t = math.min(take, cents.length)
    val idx = new Array[Int](t)
    val sc = new Array[Double](t)
    var filled = 0
    val vn = v.numElements()
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      // the aux slot is the centroid coordinate BEYOND the vector's
      // dims (the MIPS augmentation); a centroid no longer than the
      // vector has no aux slot — every coordinate is data (matches
      // Model.topLeaves, which dots min(|c|, |q|) coordinates)
      val d = math.min(cent.length, vn)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += cent(j) * v.getDouble(j); j += 1 }
      val auxTerm = if (cent.length > vn) aux * cent(cent.length - 1) else 0.0
      val s = norms(c) - 2.0 * (dot + auxTerm)
      // NaN skipped: admitted while filling it would occupy an
      // unevictable slot (every comparison against NaN is false)
      if (java.lang.Double.isNaN(s)) {}
      else if (filled < t) {
        var p = filled
        while (p > 0 && s < sc(p - 1)) {
          sc(p) = sc(p - 1); idx(p) = idx(p - 1); p -= 1
        }
        sc(p) = s; idx(p) = c; filled += 1
      } else if (s < sc(t - 1)) {
        var p = t - 1
        while (p > 0 && s < sc(p - 1)) {
          sc(p) = sc(p - 1); idx(p) = idx(p - 1); p -= 1
        }
        sc(p) = s; idx(p) = c
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var i = 0
    while (i < filled) { out(i) = idx(i); i += 1 }
    new GenericArrayData(out)
  }
}
