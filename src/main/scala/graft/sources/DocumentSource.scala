package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document ingestion source: whole-file reads of a directory of
  * markdown/text files → (filename, content) rows — the Spark analog
  * of load_md_files (/root/reference/vector_store/setup_vector_search.py:188-216):
  * same glob filter, same whole-file UTF-8 semantics, same
  * fail-on-empty contract, but distributed (each file is a split,
  * driver never materializes contents).
  */
object DocumentSource {

  final case class EmptyCorpusException(path: String)
      extends RuntimeException(s"no documents matched in $path")

  /** Read `*.md` whole-file documents from a directory. */
  def readMdDir(spark: SparkSession, path: String,
      glob: String = "*.md"): DataFrame = {
    val df = spark.read
      .option("wholetext", "true")
      .option("pathGlobFilter", glob)
      .text(path)
      .select(
        element_at(split(input_file_name(), "/"), -1).as("filename"),
        col("value").as("content"))
    // fail-fast on an empty corpus (setup_vector_search.py:208-209)
    if (df.isEmpty) throw EmptyCorpusException(path)
    df
  }
}
