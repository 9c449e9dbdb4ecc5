package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Interleaving the bits of two dimensions and range-partitioning +
  * sorting on the z-value makes every output file cover a small
  * rectangle in (a, b) space — parquet min/max stats then prune scans
  * filtered on EITHER dimension, not just the leading sort key. This
  * is the standard lakehouse layout trick for 100 TB tables queried
  * along multiple axes.
  */
object Layout {

  val Bits = 16

  /** Morton interleave of the low 16 bits of two LONG columns:
    * bit j of `a` → z bit 2j, bit j of `b` → z bit 2j+1. Composed
    * from codegen'd bit built-ins; exactly mirrored in oracle SQL.
    */
  def zValue(a: Column, b: Column): Column =
    (0 until Bits).map { j =>
      (shiftright(a, j).bitwiseAND(lit(1L)) * (1L << (2 * j))) +
        (shiftright(b, j).bitwiseAND(lit(1L)) * (1L << (2 * j + 1)))
    }.reduce(_ + _)

  /** Matching DuckDB fragment. */
  def zValueSql(a: String, b: String): String =
    (0 until Bits).map { j =>
      s"((($a >> $j) & 1) * ${1L << (2 * j)}) + " +
        s"((($b >> $j) & 1) * ${1L << (2 * j + 1)})"
    }.mkString(" + ")

  /** Write `df` z-ordered on (a, b) into `numFiles` range partitions.
    *
    * Both dimensions are min/max-normalized to the full 16-bit range
    * first — without that, a dimension with fewer significant bits
    * contributes nothing to the high interleaved bits and the layout
    * degenerates to a single-column sort on the wider dimension.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int): Unit = {
    val stats = df.agg(
      min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head()
    val (aMin, aMax) = (stats.getLong(0), stats.getLong(1))
    val (bMin, bMax) = (stats.getLong(2), stats.getLong(3))
    // (c-lo)*65535 overflows Long once the value range nears 1.4e14
    // (e.g. microsecond epochs) — widen to decimal(38,0) for the
    // multiply, floor the exact rational after the divide. Identical
    // to Long integer division on non-overflowing inputs.
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else floor((c.cast("long") - lo).cast("decimal(38,0)") * 65535L /
        (hi - lo)).cast("long")
    df.withColumn("__z",
        zValue(norm(col(a), aMin, aMax), norm(col(b), bMin, bMax)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetRowsPerFile`-row files. Streaming sinks and incremental
    * appends (MetadataStore, IndexMaintenance logs) accumulate
    * thousands of small files; at 100 TB the file-listing and
    * per-file open overhead dominates scans long before the data
    * does. The rewrite goes to a fresh directory first and swaps in
    * atomically-enough for a single writer (the same
    * write-then-replace discipline IvfIndex.write relies on);
    * readers of the old listing see the old files until the swap.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetRowsPerFile: Long): Long = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    val tmp = path.stripSuffix("/") + ".compact-tmp"
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    val dst = java.nio.file.Paths.get(path)
    val src = java.nio.file.Paths.get(tmp)
    // remove the old contents, then move the compacted files in
    java.nio.file.Files.walk(dst)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .filter(p => !p.equals(dst))
      .forEach(p => { java.nio.file.Files.delete(p); () })
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.move(p, dst.resolve(p.getFileName)); ()
    }
    java.nio.file.Files.delete(src)
    files.toLong
  }
}
