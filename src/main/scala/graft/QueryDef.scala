package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB
  * oracle query over the same parquet tables.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlChecked(name: String)(oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

/** Helpers that keep Spark results bit-identical to the DuckDB oracle.
  *
  * Double summation is order-dependent; Spark and DuckDB will add
  * partitions in different orders, so a plain sum(double) hash-diverges
  * in the last few bits. Casting each addend to an exact decimal first
  * makes the sum exact (and therefore order-independent); casting the
  * exact total back to double is then a single deterministic rounding,
  * identical in both engines. The oracle SQL mirrors the same casts.
  *
  * THE ROUNDING-TIE TRAP (round 14, found by the sf0.1 replica): the
  * two engines quantize a double to decimal differently on EXACT
  * ties. Spark's Cast goes through `Double.toString` then
  * `BigDecimal.setScale(s, HALF_UP)`; DuckDB's double→decimal cast
  * rounds the BINARY value half-to-even. A dyadic value whose exact
  * decimal expansion terminates at digit s+1 with a 5 (e.g.
  * 0.1494140625 at scale 9 — a real synthetic-embedding value, the
  * coarse-grid data where dyadic ties actually occur) quantizes to
  * different decimals (…63 vs …62) and the sums differ by exactly one
  * quantum. DuckDB's VARCHAR→decimal cast, however, rounds HALF_UP on
  * the digit string — the same path Spark takes — so the SQL twins
  * route through `cast(cast(x as varchar) as decimal…)`. Both engines
  * print shortest round-trip reprs, so the digit strings agree.
  */
object Exact {
  /** Order-independent double sum: exact decimal(18, scale) accumulate. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Larger headroom variant for wide doubles. */
  def dsumWide(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Matching DuckDB SQL fragment for dsum (varchar-routed — see the
    * rounding-tie note above).
    */
  def sqlDsum(expr: String, scale: Int): String =
    s"cast(sum(cast(cast($expr as varchar) as decimal(18,$scale))) as double)"

  def sqlDsumWide(expr: String, scale: Int): String =
    s"cast(sum(cast(cast($expr as varchar) as decimal(28,$scale))) as double)"
}
