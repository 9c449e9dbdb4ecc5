package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is a [[QueryDef]] registered in a module
  * under `graft.queries`; this object just flattens them into the
  * driver-facing maps.
  */
object SparkEntry {

  def all: Seq[QueryDef] = _root_.graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference lifecycle: embed corpus + query, sparse-dot
    * score, top-k, metadata join (SURVEY §3 E3).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("r_search_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
