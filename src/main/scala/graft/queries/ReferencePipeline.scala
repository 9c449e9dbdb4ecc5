package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.text
import graft.operators.IvfIndex
import graft.pipeline.SparseEmbed
import graft.sources.MetadataStore
import org.apache.spark.sql.functions._

/** Reference-parity pipeline operators (SURVEY §2.1/2.2/2.3 and §3):
  * datapoint projection with restricts + crowding, metadata store LWW
  * upsert, point lookup, the full embed→score→top-k→metadata-join
  * search lifecycle (E3), and IVF leaf-pruned ANN search.
  */
object ReferencePipeline {

  import text.{sql => tsql}

  /** P4 analog (setup_vector_search.py:41-77): id, categorical
    * restricts, numeric restricts, crowding tag — flattened to
    * columns so parquet stats make every restrict pushdown-able.
    */
  private val rDatapoint = QueryDef.sqlChecked("r_datapoint_projection")(
    "SELECT md5(text) AS datapoint_id, doc_id, 'text' AS file_type, " +
      "'documentation' AS content_type, cast(length(text) as bigint) AS content_length, " +
      s"${tsql.tokenCount("text")} AS embedding_tokens, source AS crowding_tag " +
      "FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d).select(
      md5(col("text")).as("datapoint_id"),
      col("doc_id"),
      lit("text").as("file_type"),
      lit("documentation").as("content_type"),
      length(col("text")).cast("bigint").as("content_length"),
      text.tokenCount(col("text")).as("embedding_tokens"),
      col("source").as("crowding_tag"))
      .orderBy("doc_id")
  }

  /** S2/S4 analog: append-only versions + last-write-wins resolve
    * (firestore_ops.py upsert semantics + STREAM_UPDATE dedup).
    */
  private val rMetadataLww = QueryDef.sqlChecked("r_metadata_lww")(
    "WITH log AS (SELECT doc_id, text, 1 AS version FROM documents " +
      "UNION ALL SELECT doc_id, text || ' updated-v2' AS text, 2 AS version " +
      "FROM documents WHERE doc_id % 10 = 0) " +
      "SELECT doc_id, version, cast(length(text) as bigint) AS content_length " +
      "FROM (SELECT doc_id, version, text, row_number() OVER " +
      "(PARTITION BY doc_id ORDER BY version DESC) AS rn FROM log) " +
      "WHERE rn = 1 ORDER BY doc_id"
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val v1 = docs.select(col("doc_id"), col("text"), lit(1).as("version"))
    val v2 = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" updated-v2")).as("text"),
        lit(2).as("version"))
    MetadataStore.resolve(MetadataStore.append(v1, v2), "doc_id", col("version"))
      .select(col("doc_id"), col("version"),
        length(col("text")).cast("bigint").as("content_length"))
      .orderBy("doc_id")
  }

  /** S5 analog: point lookup by id (predicate pushed to parquet). */
  private val rPointLookup = QueryDef.sqlChecked("r_point_lookup")(
    "SELECT doc_id, source, lang, cast(length(text) as bigint) AS content_length " +
      "FROM documents WHERE doc_id = 42"
  ) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") === 42)
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("bigint").as("content_length"))
  }

  val QueryText = "spark join stream table window group fast key"

  /** E3 end-to-end: embed query + corpus (sparse integer feature
    * hashing) → sparse dot score (a groupBy join, not a dense cross
    * product) → top-10 → join back to the metadata table (J2). Exact
    * oracle because every weight is an integer.
    */
  private val rSearchE2e = QueryDef.sqlChecked("r_search_e2e")(
    s"WITH ${SparseEmbed.sql.embedCte("docvec")}, " +
      "qtok AS (SELECT unnest(list_filter(string_split_regex(" +
      s"'$QueryText', '\\s+'), t -> t <> '')) AS t), " +
      s"qvec AS (SELECT ${tsql.polyHash("t")} % ${SparseEmbed.Dim} AS idx, " +
      s"cast(sum(((${tsql.polyHash("t")} >> 5) & 1) * 2 - 1) as bigint) AS qw " +
      "FROM qtok GROUP BY 1 HAVING sum(((" + tsql.polyHash("t") + " >> 5) & 1) * 2 - 1) <> 0) " +
      "SELECT s.doc_id, s.score, m.source, m.n_chars FROM " +
      "(SELECT d.doc_id, cast(sum(d.w * q.qw) as bigint) AS score " +
      "FROM docvec d JOIN qvec q ON d.idx = q.idx GROUP BY d.doc_id) s " +
      "JOIN documents m ON s.doc_id = m.doc_id " +
      "ORDER BY s.score DESC, s.doc_id LIMIT 10"
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val docvec = SparseEmbed.embed(docs, "doc_id", "text")
    val qvec = SparseEmbed.embed(
      Seq((0L, QueryText)).toDF("qid", "text"), "qid", "text")
      .select(col("idx"), col("w").as("qw"))
    val scores = docvec.join(broadcast(qvec), "idx")
      .groupBy("doc_id")
      .agg(sum(col("w") * col("qw")).as("score"))
    scores.join(docs.select("doc_id", "source", "n_chars"), "doc_id")
      .select("doc_id", "score", "source", "n_chars")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** IVF ANN search (Tree-AH analog): k-means leaves, probe top-4 of
    * 16 — rows-only check (k-means assignment isn't SQL-expressible);
    * recall vs exact kNN is asserted in IvfSpec.
    */
  private val vAnnIvf = QueryDef.rowsOnly("v_ann_ivf") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding", 16)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    IvfIndex.searchDf(indexed.filter(col("vec_id") =!= 0), model, query,
      nProbe = 4, k = 10, "vec_id", "embedding")
  }

  val defs: Seq[QueryDef] = Seq(rDatapoint, rMetadataLww, rPointLookup,
    rSearchE2e, vAnnIvf)
}
