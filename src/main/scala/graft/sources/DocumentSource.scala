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

  /** Read a JSONL corpus (the dominant training-data interchange
    * format — one JSON document per line) with a PINNED schema and
    * fail-fast parsing. The schema is required, never inferred: at
    * corpus scale inference is a full extra read, and a schema that
    * drifts with the data defeats the gate the reader is supposed to
    * be. One corrupt line anywhere fails the job loudly (FAILFAST) —
    * the commissioning-read contract; steady-state ingest should use
    * [[readJsonlQuarantined]].
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** CSV read with a pinned schema + FAILFAST — the CSV sibling of
    * [[readJsonl]] for the other common interchange format. RFC 4180
    * conventions: header row, quoted fields with doubled-quote
    * escaping (`escape = "` — Spark's default backslash escape is
    * NOT what other CSV producers emit), and `multiLine` so quoted
    * embedded newlines survive. Schema pinned, never inferred — CSV
    * inference is a full extra read AND type-guesses (a doc of all
    * digits would silently become a number).
    *
    * multiLine caveat at scale: a multiLine CSV file is NOT
    * line-splittable (a record boundary cannot be found mid-file), so
    * each FILE becomes one input partition — parallelism = file
    * count. Write many moderate files (the writer side of the gate
    * does), never one giant CSV.
    */
  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** JSONL read with corrupt-line QUARANTINE — the steady-state form
    * for web-scale feeds where a malformed line is routine, not
    * exceptional, and must neither kill the job (FAILFAST) nor
    * silently become a row of nulls (default PERMISSIVE): returns
    * (good, quarantined) where `good` carries exactly the pinned
    * schema and `quarantined` carries the raw offending line for the
    * dead-letter store. One read feeds both sides (the frame is
    * checkpoint-pinned — Spark refuses a filter on ONLY the corrupt
    * column of a streaming-parsed JSON relation, and re-reading
    * would race the feed).
    */
  def readJsonlQuarantined(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    val corruptCol = "_graft_corrupt"
    val withCorrupt = schema
      .add(org.apache.spark.sql.types.StructField(corruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    // the localCheckpoint pins the PARSED CORPUS to executor storage
    // for the life of the two frames — fine as a commissioning tool,
    // corpus-sized state at a 100 TB steady-state read. Continuous
    // ingest should use [[ingestJsonl]], which holds nothing.
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .localCheckpoint()
    (raw.filter(col(corruptCol).isNull).drop(corruptCol),
      raw.filter(col(corruptCol).isNotNull)
        .select(col(corruptCol).as("raw_line")))
  }

  /** STEADY-STATE JSONL ingest — [[readJsonlQuarantined]]'s semantics
    * with BOUNDED state (that form localCheckpoints the parsed corpus
    * so both sides can derive from one read; at 100 TB that is
    * corpus-sized executor storage per read): snapshot the matched
    * file list ONCE (both passes then read the same files even while
    * the feed appends — the race the checkpoint form guards against),
    * write the good frame straight to `goodTarget` parquet with
    * DROPMALFORMED (a streaming scan-and-write, nothing retained),
    * then derive the quarantine from a second pass that reads the
    * same files as TEXT and keeps only lines whose pinned-schema
    * `from_json` parse is corrupt. Two scans of the corpus, retained
    * state ∝ corrupt lines only. Returns (good re-opened from the
    * target — the persisted artifact, not a re-parse — and the
    * quarantined raw lines).
    */
  def ingestJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      goodTarget: String): (DataFrame, DataFrame) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // one consistent file-list snapshot; hidden files (_*, .*) are
    // skipped exactly as the datasource scan would skip them
    val matched =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p)
       else fs.globStatus(p))
        .filter(s => s.isFile && {
          val n = s.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
        .map(_.getPath.toString).toSeq
    if (matched.isEmpty) throw EmptyCorpusException(path)
    spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .json(matched: _*)
      .write.mode("overwrite").parquet(goodTarget)
    val corruptCol = "_graft_corrupt"
    val withCorrupt = schema
      .add(org.apache.spark.sql.types.StructField(corruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val quarantined = spark.read.textFile(matched: _*).toDF("raw_line")
      // the json DATASOURCE skips fully-empty lines (they are not
      // records); the text pass must skip them too or a trailing
      // newline would quarantine a phantom "" — whitespace-only
      // lines stay: the datasource parses and rejects those
      .filter(length(col("raw_line")) > 0)
      .withColumn("__p", from_json(col("raw_line"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)))
      .filter(col("__p").isNull ||
        col("__p").getField(corruptCol).isNotNull)
      .select("raw_line")
    (spark.read.parquet(goodTarget), quarantined)
  }
}
