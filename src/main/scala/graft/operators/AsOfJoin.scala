package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row
  * (right.ts <= left.ts) within the same key — the point-in-time
  * lookup shape (trade×quote, purchase×last-click, feature snapshot).
  *
  * Implementation is the union trick, NOT a range join: tag both
  * sides, sort by (key, ts, side) with right sorting first on ties
  * (>= semantics), and carry the last non-null right payload forward
  * with last(ignoreNulls) over an unbounded-preceding frame. One
  * shuffle + one sort regardless of match fan-out — at 100 TB this
  * beats the naive `left.ts >= right.ts` theta join (which explodes
  * to candidate-pairs) and needs no custom physical operator.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its `carry` columns are attached)
    * @param on         equi-key columns (both sides)
    * @param tsCol      event-time column name (both sides)
    * @param carry      right-side payload columns to attach (renamed
    *                   `asof_<name>` in the output)
    */
  def apply(left: DataFrame, right: DataFrame, on: Seq[String],
      tsCol: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val keyAndTs = on :+ tsCol

    val rTagged = right.select(
      (keyAndTs.map(col) :+ lit(0).as("__side")) ++
        carry.map(c => col(c).as(s"asof_$c")) ++
        leftCols.filterNot(keyAndTs.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      (keyAndTs.map(col) :+ lit(1).as("__side")) ++
        carry.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"asof_$c")) ++
        leftCols.filterNot(keyAndTs.contains).map(col): _*)

    // carry columns join the sort as final tiebreak: multiple right
    // rows at the same (key, ts) would otherwise make last() pick an
    // arbitrary one per run (the greatest carry tuple wins,
    // deterministically; nulls-first keeps left rows unaffected)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(tsCol).asc +: col("__side").asc +:
        carry.map(c => col(s"asof_$c").asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rTagged.unionByName(lTagged)
      .select(col("*") +: carry.map(c =>
        last(col(s"asof_$c"), ignoreNulls = true).over(w)
          .as(s"__filled_$c")): _*)

    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col(s"__filled_$c").as(s"asof_$c")): _*)
  }
}
