package graft.plans

import graft.operators.IvfIndex
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, In, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType}

/** SQL-transparent ANN leaf pruning (SURVEY §4-3): the reference's
  * Tree-AH contract skips all but `leaf_nodes_to_search_percent` of
  * the index at query time (/root/reference/common/config.py:36-37 —
  * a tree walk picks the leaves, the scan never touches the rest).
  * [[IvfIndex.search]] is that behavior as an API; this module is the
  * same behavior as a PLAN REWRITE, so plain SQL text over an index
  * table gets leaf skipping without calling any graft API:
  *
  *   SELECT vec_id FROM ann_idx
  *   WHERE graft_ann_probe('my_index', leaf_id, <query vec>, 4)
  *
  * `graft_ann_probe` is an [[Unevaluable]] marker predicate;
  * [[AnnLeafPruningRule]] replaces it at optimization time with
  * `leaf_id IN (<the nProbe closest leaves to the query>)` — computed
  * on the driver from the registered [[IvfIndex.Model]]'s centroids
  * (#leaves values, microseconds). The In-list lands in the same
  * Filter the user wrote, so when the index table is the
  * `partitionBy(leaf_id)` parquet layout [[IvfIndex.write]] produces,
  * FileSourceStrategy turns it into PARTITION PRUNING: unprobed
  * leaves are never listed, read, or decoded — the exact
  * skip-90%-of-leaves behavior of the reference's tree walk, at any
  * corpus size, driven from SQL text.
  */
object IndexCatalog {
  private val models =
    scala.collection.concurrent.TrieMap.empty[String, IvfIndex.Model]

  /** Register (or replace) `name`'s model; plan-time lookups by
    * [[AnnLeafPruningRule]] resolve against this catalog.
    */
  def register(name: String, model: IvfIndex.Model): Unit = {
    models.put(name, model); ()
  }

  /** Open a WRITTEN index from disk: load its model sidecar
    * ([[IvfIndex.load]]) and register it under `name` — the
    * serving-side "open the index" step, so a session that did not
    * build the index can still drive `graft_ann_probe` over it.
    */
  def open(spark: org.apache.spark.sql.SparkSession, name: String,
      path: String): IvfIndex.Model = {
    val model = IvfIndex.load(spark, path)
    register(name, model)
    model
  }

  def get(name: String): Option[IvfIndex.Model] = models.get(name)
  def drop(name: String): Unit = { models.remove(name); () }
}

/** Marker predicate `graft_ann_probe(index_name, leaf_id, query,
  * n_probe)`. Never executes: [[AnnLeafPruningRule]] must rewrite it
  * before physical planning (an unregistered index name is an error,
  * not a full scan — silently scanning 100 TB because a name was
  * misspelled is the failure mode this forbids).
  */
case class AnnProbe(indexName: Expression, leafId: Expression,
    query: Expression, nProbe: Expression)
    extends Expression with Unevaluable {
  override def children: Seq[Expression] =
    Seq(indexName, leafId, query, nProbe)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_ann_probe"
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): AnnProbe =
    copy(indexName = c(0), leafId = c(1), query = c(2), nProbe = c(3))
}

object AnnLeafPruningRule extends Rule[LogicalPlan] {

  private def evalInt(e: Expression): Int = e.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_ann_probe: n_probe must be an integer literal, got $other")
  }

  /** Literals in the leaf column's own type — partition pruning
    * matches `In(attr, Seq[Literal])`, so no casts are tolerable here.
    */
  private def leafLiterals(leaves: Seq[Int], dt: DataType): Seq[Literal] =
    dt match {
      case IntegerType => leaves.map(Literal(_))
      case LongType    => leaves.map(l => Literal(l.toLong))
      case other => throw new IllegalArgumentException(
        s"graft_ann_probe: leaf column must be int or bigint, got $other")
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case AnnProbe(name, leafId, query, nProbe)
          if name.foldable && query.foldable && nProbe.foldable &&
            leafId.resolved =>
        val nameStr = String.valueOf(name.eval())
        val model = IndexCatalog.get(nameStr).getOrElse(
          throw new IllegalStateException(
            s"graft_ann_probe: no index named '$nameStr' is registered " +
              "in graft.plans.IndexCatalog — refusing to fall back to a " +
              "full scan"))
        val qv = query.eval().asInstanceOf[ArrayData].toDoubleArray()
        val leaves = model.topLeaves(qv, evalInt(nProbe))
        In(leafId, leafLiterals(leaves, leafId.dataType))
    }
}

object AnnPruning {
  /** Column-API form of the marker predicate (same rewrite path). */
  def probe(indexName: String, leafId: Column, query: Seq[Double],
      nProbe: Int): Column =
    Shims.column(AnnProbe(Literal(indexName),
      Shims.expression(leafId),
      Literal.create(query, ArrayType(DoubleType)),
      Literal(nProbe)))
}
