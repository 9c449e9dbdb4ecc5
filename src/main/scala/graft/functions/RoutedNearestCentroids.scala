package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Two-level routed top-n probe as ONE expression — the executor-side
  * mirror of `IvfIndex.Model.topLeaves`' routed branch, so BATCH
  * query routing is sublinear in the leaf count exactly like the
  * driver-side single-query path: rank the ~√L super-centroids, walk
  * groups best-first to the oversampled candidate target (≥2 groups),
  * exact-rank only the walked leaves. Per query row that is
  * O(√L·d + candidates·d) instead of [[NearestCentroids]]' flat
  * O(L·d) — at 4M leaves the flat scan is ~2.6·10⁸ flops per row;
  * routed is ~10⁶.
  *
  * Selection order is IDENTICAL to the driver path: supers by
  * ascending (score, index) via repeated strict-< min-picks (first
  * index wins ties, same as the sort), candidates by ascending
  * (score, leaf id) via bounded insertion with an explicit id
  * tie-break (the walk emits leaves grouped by super, so first-seen
  * order is NOT id order — the tie-break restores the sort's
  * semantics). A spec asserts row-for-row equality with
  * `Model.topLeaves`.
  */
case class RoutedNearestCentroids(left: Expression, right: Expression,
    centroids: Array[Array[Double]], supers: Array[Array[Double]],
    groups: Array[Array[Int]], oversample: Int, take: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty && supers.nonEmpty, "empty router")
  require(take >= 1, s"take must be >= 1, got $take")

  @transient private lazy val centNorms: Array[Double] =
    centroids.map(_.map(x => x * x).sum)
  @transient private lazy val superNorms: Array[Double] =
    supers.map(_.map(x => x * x).sum)

  // the deep hash walks the whole matrix — cache it, or every
  // analyzer/optimizer hash lookup over this expression is O(L·d)
  @transient private lazy val contentHash: Int =
    java.util.Objects.hash(Integer.valueOf(take),
      Integer.valueOf(oversample),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        centroids.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        supers.asInstanceOf[Array[AnyRef]])))

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_routed_nearest_centroids"

  override def nullSafeEval(v: Any, a: Any): Any =
    RoutedNearestCentroids.route(v.asInstanceOf[ArrayData],
      a.asInstanceOf[Double], centroids, centNorms, supers, superNorms,
      groups, oversample, take)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centroids, "double[][]")
    val cnRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    val sRef = ctx.addReferenceObj("supers", supers, "double[][]")
    val snRef = ctx.addReferenceObj("superNorms", superNorms, "double[]")
    val gRef = ctx.addReferenceObj("groups", groups, "int[][]")
    nullSafeCodeGen(ctx, ev, (v, a) =>
      s"${ev.value} = graft.functions.RoutedNearestCentroids.route(" +
        s"$v, $a, $cRef, $cnRef, $sRef, $snRef, $gRef, $oversample, $take);")
  }

  override def equals(other: Any): Boolean = other match {
    case r: RoutedNearestCentroids =>
      left == r.left && right == r.right && take == r.take &&
        oversample == r.oversample &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          r.centroids.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(
          supers.asInstanceOf[Array[AnyRef]],
          r.supers.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(
          groups.asInstanceOf[Array[AnyRef]],
          r.groups.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Integer.valueOf(contentHash))

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): RoutedNearestCentroids = copy(left = l, right = r)
}

object RoutedNearestCentroids {

  private def score(v: ArrayData, aux: Double, cent: Array[Double],
      norm: Double): Double = {
    val vn = v.numElements()
    // aux slot only when the centroid extends past the vector's dims
    // (the MIPS augmentation) — see NearestCentroids.assign
    val d = math.min(cent.length, vn)
    var dot = 0.0
    var j = 0
    while (j < d) { dot += cent(j) * v.getDouble(j); j += 1 }
    val auxTerm = if (cent.length > vn) aux * cent(cent.length - 1) else 0.0
    norm - 2.0 * (dot + auxTerm)
  }

  /** Called from both interpreted eval and generated code. */
  def route(v: ArrayData, aux: Double, cents: Array[Array[Double]],
      centNorms: Array[Double], supers: Array[Array[Double]],
      superNorms: Array[Double], groups: Array[Array[Int]],
      oversample: Int, take: Int): ArrayData = {
    val target = math.max(take * oversample, 32)
    val g = supers.length
    val sScore = new Array[Double](g)
    var s = 0
    while (s < g) {
      val sc = score(v, aux, supers(s), superNorms(s))
      // NaN compares false against everything; map it to +Inf so a
      // partly-corrupt row still routes by its finite super scores
      sScore(s) = if (java.lang.Double.isNaN(sc)) Double.PositiveInfinity
        else sc
      s += 1
    }
    val used = new Array[Boolean](g)
    val t = math.min(take, cents.length)
    val idx = new Array[Int](t)
    val sc = new Array[Double](t)
    var filled = 0
    var count = 0
    var gi = 0
    while (gi < g && (count < target || gi < 2)) {
      // next super by ascending (score, index): strict < on an
      // ascending scan keeps the first index among ties, matching the
      // driver sort's tie-break. The best == -1 arm covers the
      // all-+Inf row (every score NaN-mapped): degrade to first
      // unused instead of indexing used(-1)
      var best = -1
      var bs = Double.PositiveInfinity
      s = 0
      while (s < g) {
        if (!used(s) && (best == -1 || sScore(s) < bs)) {
          bs = sScore(s); best = s
        }
        s += 1
      }
      used(best) = true
      val leaves = groups(best)
      var li = 0
      while (li < leaves.length) {
        val c = leaves(li)
        val cs = score(v, aux, cents(c), centNorms(c))
        // bounded insertion by (score, leaf id) — walked leaves are
        // NOT in id order, so ties need the explicit id comparison.
        // NaN scores are skipped: admitted once, a NaN slot would be
        // unevictable (every comparison against NaN is false)
        def before(i: Int): Boolean =
          cs < sc(i) || (cs == sc(i) && c < idx(i))
        if (java.lang.Double.isNaN(cs)) {}
        else if (filled < t) {
          var p = filled
          while (p > 0 && before(p - 1)) {
            sc(p) = sc(p - 1); idx(p) = idx(p - 1); p -= 1
          }
          sc(p) = cs; idx(p) = c; filled += 1
        } else if (before(t - 1)) {
          var p = t - 1
          while (p > 0 && before(p - 1)) {
            sc(p) = sc(p - 1); idx(p) = idx(p - 1); p -= 1
          }
          sc(p) = cs; idx(p) = c
        }
        li += 1
      }
      count += leaves.length
      gi += 1
    }
    val out = new Array[Any](filled)
    var i = 0
    while (i < filled) { out(i) = idx(i); i += 1 }
    new GenericArrayData(out)
  }
}
