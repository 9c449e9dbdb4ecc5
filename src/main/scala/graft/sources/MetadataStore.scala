package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed document/metadata table with last-write-wins upsert — the
  * Spark analog of the reference's Firestore collection
  * (/root/reference/vector_store/utils/firestore_ops.py:31-88):
  * document id is the join key to the vector index, writes carry
  * timestamps, reads resolve to the newest version.
  *
  * Storage model is append-only + resolve-on-read (window dedup); a
  * periodic compaction rewrites the table to one row per key. At
  * 100 TB this is the standard log-structured pattern: appends are
  * cheap and parallel, the LWW window shuffles once on the key, and
  * compaction amortizes it away.
  */
object MetadataStore {

  /** Append new versions (no read-modify-write needed). */
  def append(current: DataFrame, updates: DataFrame): DataFrame =
    current.unionByName(updates)

  /** Resolve to the latest version per key (LWW). */
  def resolve(log: DataFrame, key: String, version: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(version.desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Point lookup by id on the resolved view — the predicate reaches
    * the parquet scan (min/max row-group skipping) before the window.
    */
  def lookup(log: DataFrame, key: String, version: Column, id: Any): DataFrame =
    resolve(log.filter(col(key) === lit(id)), key, version)
}
