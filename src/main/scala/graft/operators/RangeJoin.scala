package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join without an equi key: points (a LONG position
  * column) joined to intervals [lo, hi).
  *
  * The scalable form bins the domain: each point hashes to exactly
  * one bin (floor(p / width)), each interval explodes to the bins it
  * overlaps, and the join becomes an equi-join on bin followed by the
  * exact range filter. No candidate pair is produced twice (a point
  * lives in one bin), so no distinct is needed. Shuffle volume is
  * |points| + Σ interval spans/width instead of |points| × |intervals|.
  *
  * For a small interval set, Catalyst's BroadcastNestedLoopJoin is
  * already optimal — binning is for the large×large case.
  */
object RangeJoin {

  /** @param points    DataFrame with `ptCol: LONG`
    * @param intervals DataFrame with `loCol`/`hiCol: LONG`, [lo, hi)
    * @param binWidth  domain bin size (≈ typical interval length)
    */
  def binned(points: DataFrame, intervals: DataFrame, ptCol: String,
      loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    val p = points.withColumn("__bin", floor(col(ptCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor((col(hiCol) - 1) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
