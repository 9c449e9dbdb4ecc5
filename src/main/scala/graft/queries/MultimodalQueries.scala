package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.text
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing coverage: binary payload columns decoded via
  * batched executor-side passes, and frame sampling. The decode stub
  * is a deterministic byte-level computation, so both queries are
  * fully oracle-checked (documents are ASCII → byte ops ≡ char ops).
  */
object MultimodalQueries {

  import text.{sql => tsql}

  /** Batched decode over BINARY payloads (mapPartitions). */
  private val mDecode = QueryDef.sqlChecked("m_decode_features")(
    "SELECT doc_id, cast(length(text) as bigint) AS n_bytes, " +
      s"${tsql.polyHash("text")} AS checksum FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    val withPayload = Multimodal.withPayload(Tables.documents(s, d), "text")
    Multimodal.decodeFeatures(withPayload, "doc_id")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Frame sampling: 64-byte frames, every 4th kept. */
  private val mFrames = QueryDef.sqlChecked("m_frame_sample")(
    "SELECT doc_id, frame_no, cast(length(f) as bigint) AS n_chars, " +
      s"${tsql.polyHash("f")} AS checksum FROM (" +
      "SELECT doc_id, frame_no, substr(text, cast(frame_no * 64 + 1 as int), 64) AS f " +
      "FROM (SELECT doc_id, text, unnest(list_filter(" +
      "range(0, cast(ceil(length(text) / 64.0) as bigint)), i -> i % 4 = 0)) AS frame_no " +
      "FROM documents)) ORDER BY doc_id, frame_no"
  ) { (s, d) =>
    val withPayload = Multimodal.withPayload(Tables.documents(s, d), "text")
    val frames = Multimodal.sampleFrames(withPayload, "doc_id", 4)
    frames.select(col("doc_id"), col("frame_no"),
      decode(col("frame"), "UTF-8").as("f"))
      .select(col("doc_id"), col("frame_no"),
        length(col("f")).cast("bigint").as("n_chars"),
        text.polyHash(col("f")).as("checksum"))
      .orderBy("doc_id", "frame_no")
  }

  /** Batched resize (stride-2 byte downsample — the stubbed stand-in
    * for a media resample; plumbing real: binary in, smaller binary +
    * size metadata out, one partition pass). The oracle replays the
    * stride over characters (ASCII corpus → byte ops ≡ char ops) and
    * hashes the resized content.
    */
  private val mResize = QueryDef.sqlChecked("m_resize")(
    "SELECT doc_id, cast(length(text) as bigint) AS orig_bytes, " +
      "cast(ceil(length(text) / 2.0) as bigint) AS new_bytes, " +
      s"${tsql.polyHash("r")} AS checksum FROM (" +
      "SELECT doc_id, text, array_to_string(list_transform(" +
      "range(1, length(text) + 1, 2), i -> text[i]), '') AS r " +
      "FROM documents) ORDER BY doc_id"
  ) { (s, d) =>
    val withPayload = Multimodal.withPayload(Tables.documents(s, d), "text")
    Multimodal.resize(withPayload, "doc_id", 2)
      .select(col("id").as("doc_id"), col("orig_bytes"), col("new_bytes"),
        text.polyHash(decode(col("resized"), "UTF-8")).as("checksum"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(mDecode, mFrames, mResize)
}
