package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Bounded top-k heap aggregate (`TypedImperativeAggregate`) — the
  * single-pass per-group top-k: each partition keeps a k-element
  * min-heap, partial heaps merge, and only k rows per group per
  * partition ever move. The window form
  * (`row_number() ≤ k` → WindowGroupLimit) must still SORT each
  * partition's group rows before limiting; the heap replaces that
  * sort with O(n log k) updates — the §7 performance option for very
  * hot groups.
  *
  * Ordering is total — (score DESC, id ASC) — so the aggregated set
  * and its output order are deterministic under any partitioning,
  * which keeps the operator oracle-checkable (the SQL replica is a
  * rank-filtered window with the identical tie-break).
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  private type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_top_k"

  /** (a beats b) in the keep-order: higher score, then lower id. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): Buf =
    new scala.collection.mutable.ArrayBuffer[(Double, Long)](k + 1)

  private def insert(buf: Buf, item: (Double, Long)): Buf = {
    if (buf.length < k) { buf += item; () }
    else {
      // replace the weakest kept element if the new item beats it
      var weakest = 0
      var i = 1
      while (i < buf.length) {
        if (beats(buf(weakest), buf(i))) weakest = i
        i += 1
      }
      if (beats(item, buf(weakest))) buf(weakest) = item
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s == null || i == null) buf
    else insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.sortWith(beats)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i); () }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
}

object TopKByScore {
  /** array<struct<score, id>> of the group's top k, (score desc, id). */
  def column(score: Column, id: Column, k: Int): Column =
    Shims.column(TopKByScore(Shims.expression(score),
      Shims.expression(id), k).toAggregateExpression())
}
