package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Remaining surface odds and ends: exact nearest-rank percentiles,
  * grouping() flags, text normalization, filtered aggregation.
  */
object ExtraQueries {

  /** Nearest-rank percentiles (exact elements, no interpolation —
    * engine-independent by construction).
    */
  private val qPercentiles = QueryDef.sqlChecked("q_percentiles_exact")(
    "WITH r AS (SELECT o_orderpriority, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn, " +
      "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) " +
      "SELECT o_orderpriority, " +
      "max(CASE WHEN rn = cast(ceil(0.25 * n) as bigint) THEN o_totalprice END) AS p25, " +
      "max(CASE WHEN rn = cast(ceil(0.50 * n) as bigint) THEN o_totalprice END) AS p50, " +
      "max(CASE WHEN rn = cast(ceil(0.75 * n) as bigint) THEN o_totalprice END) AS p75 " +
      "FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"
  ) { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
    val r = Tables.orders(s, d).select(
      col("o_orderpriority"), col("o_totalprice"),
      row_number().over(w.orderBy("o_totalprice", "o_orderkey")).as("rn"),
      count(lit(1)).over(w).as("n"))
    def pick(q: Double) =
      max(when(col("rn") === ceil(lit(q) * col("n")).cast("bigint"),
        col("o_totalprice")))
    r.groupBy("o_orderpriority")
      .agg(pick(0.25).as("p25"), pick(0.50).as("p50"), pick(0.75).as("p75"))
      .orderBy("o_orderpriority")
  }

  /** grouping() flags distinguish rollup totals from data rows. */
  private val qGroupingFn = QueryDef.sqlChecked("q_grouping_fn")(
    "SELECT coalesce(l_returnflag, '-') AS rf, coalesce(l_linestatus, '-') AS ls, " +
      "cast(grouping(l_returnflag) as bigint) AS g_rf, " +
      "cast(grouping(l_linestatus) as bigint) AS g_ls, count(*) AS n " +
      "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
      "ORDER BY rf, ls, g_rf, g_ls"
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping(col("l_returnflag")).cast("bigint").as("g_rf"),
        grouping(col("l_linestatus")).cast("bigint").as("g_ls"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("-")).as("rf"),
        coalesce(col("l_linestatus"), lit("-")).as("ls"),
        col("g_rf"), col("g_ls"), col("n"))
      .orderBy("rf", "ls", "g_rf", "g_ls")
  }

  /** Text normalization chain: lower → strip non-alnum → collapse
    * whitespace → trim.
    */
  private val tNormalize = QueryDef.sqlChecked("t_normalize")(
    "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), " +
      "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text " +
      "FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " ")).as("norm_text"))
      .orderBy("doc_id")
  }

  /** Filtered aggregation (FILTER clause ≡ conditional agg). */
  private val qFilteredAgg = QueryDef.sqlChecked("q_filtered_agg")(
    "SELECT l_returnflag, count(*) AS n, " +
      "count(*) FILTER (WHERE l_quantity > 25) AS n_big, " +
      s"${sqlDsum("l_extendedprice", 2)} AS sum_all, " +
      "cast(sum(cast(l_extendedprice as decimal(18,2))) FILTER (WHERE l_discount > 0.05) as double) AS sum_discounted " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
  ) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        count(when(col("l_quantity") > 25, 1)).as("n_big"),
        dsum(col("l_extendedprice"), 2).as("sum_all"),
        sum(when(col("l_discount") > 0.05,
          col("l_extendedprice").cast("decimal(18,2)")))
          .cast("double").as("sum_discounted"))
      .orderBy("l_returnflag")
  }

  /** JSONL ROUND-TRIP, driver-gated — the training-data interchange
    * format as an oracle-checked source: the corpus writes out as
    * JSONL (one document per line), reads back through the pinned-
    * schema fail-fast reader ([[graft.sources.DocumentSource
    * .readJsonl]]), and the gate emits each document's md5 — a hash
    * match against the parquet-side oracle proves byte-exact content
    * survival through JSON escaping (newlines, quotes, unicode) in
    * BOTH directions. Schema is pinned, never inferred (inference is
    * a full extra read at corpus scale).
    */
  private val sJsonlRoundtrip = QueryDef.sqlChecked("s_jsonl_roundtrip")(
    "SELECT doc_id, md5(text) AS fp, cast(length(text) as bigint) " +
      "AS n_chars FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_jsonl_" + java.lang.Integer.toHexString(d.hashCode))
    if (java.nio.file.Files.exists(dir)) {
      java.nio.file.Files.walk(dir).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    }
    Tables.documents(s, d).select("doc_id", "text")
      .write.mode("overwrite").json(dir.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    graft.sources.DocumentSource.readJsonl(s, dir.toString, schema)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        length(col("text")).cast("bigint").as("n_chars"))
      .orderBy("doc_id")
  }

  /** CSV ROUND-TRIP, driver-gated — the other interchange format as
    * an oracle-checked source ([[graft.sources.DocumentSource
    * .readCsv]]): every document is DECORATED with a payload suffix
    * containing the three characters CSV must escape (a comma, a
    * double quote, an embedded newline — the synthetic corpus carries
    * none, so the gate plants them), written as RFC 4180 CSV
    * (header, quoted fields, doubled-quote escaping), read back
    * through the pinned-schema fail-fast reader, and hash-compared by
    * per-doc md5 — a match proves byte-exact survival of quoting,
    * escaping, and multi-line records in BOTH directions. The oracle
    * never touches the CSV; it recomputes the decorated md5 from
    * parquet, which is exactly the claim (round trip ≡ identity).
    */
  private val sCsvRoundtrip = QueryDef.sqlChecked("s_csv_roundtrip")(
    "SELECT doc_id, md5(text || ',\"' || chr(10) || 'end') AS fp, " +
      "cast(length(text) + 6 as bigint) AS n_chars " +
      "FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_csv_" + java.lang.Integer.toHexString(d.hashCode))
    if (java.nio.file.Files.exists(dir)) {
      java.nio.file.Files.walk(dir).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    }
    // moderate file count on purpose: multiLine CSV parallelism is
    // per-file (see readCsv) — one giant file would serialize the read
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(col("text"), lit(",\"\nend")).as("text"))
      .repartition(4)
      .write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dir.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    graft.sources.DocumentSource.readCsv(s, dir.toString, schema)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        length(col("text")).cast("bigint").as("n_chars"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(qPercentiles, qGroupingFn, tNormalize,
    qFilteredAgg, sJsonlRoundtrip, sCsvRoundtrip)
}
