package graft.plans

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions module: registers the graft expressions as
  * SQL functions, so the engine's surface is reachable from plain
  * `spark.sql(...)` text (and spark-sql / JDBC users), not only the
  * Column API:
  *
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  *
  * Activate via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; or call
  * [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def d(c: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(c,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))

  private[plans] val definitions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(d(args(0)), d(args(1)))),
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(d(args(0)), d(args(1)))),
    ("graft_l2",
      new ExpressionInfo(classOf[L2Distance].getName, "graft_l2"),
      (args: Seq[Expression]) => L2Distance(d(args(0)), d(args(1)))),
    ("graft_norm",
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (args: Seq[Expression]) => L2Norm(d(args(0)))),
    ("graft_polyhash",
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (args: Seq[Expression]) => PolyHash(args(0))),
    ("graft_bpe_count",
      new ExpressionInfo(classOf[BpeTokenCount].getName, "graft_bpe_count"),
      (args: Seq[Expression]) => BpeTokenCount(args(0))))

  /** Idempotent registration on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
