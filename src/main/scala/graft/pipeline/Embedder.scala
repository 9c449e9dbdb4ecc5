package graft.pipeline

import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic local embedders (zero-egress stand-ins for the
  * reference's Vertex AI model, common/utils/embeddings.py:120-130).
  *
  * Two forms:
  *
  *  1. [[FeatureHashEmbedder]] — a Dataset transform producing a dense
  *     normalized Array[Float]; runs batched inside mapPartitions,
  *     mirroring the reference's batch-of-10 RPC fan-out (X1–X3) with
  *     executor-side model state.
  *
  *  2. [[SparseEmbed]] — the same feature-hashing expressed as pure
  *     relational ops over (id, dim_idx, weight BIGINT) rows. Integer
  *     weights make every downstream score EXACT (no float
  *     accumulation), so embed→score→top-k is DuckDB-oracle-checkable
  *     end-to-end, and sparse dot scales as a groupBy join instead of
  *     a dense cross product.
  */
object SparseEmbed {
  val Dim = 32

  /** token → dimension index: polyHash mod dim. */
  def dimIdx(tok: Column, dim: Int = Dim): Column = text.polyHash(tok) % dim

  /** token → ±1 sign from hash bit 5. */
  def sign(tok: Column): Column =
    shiftright(text.polyHash(tok), 5).bitwiseAND(lit(1L)) * 2L - 1L

  /** (idCol, text) → (id, idx, w): sparse integer embedding rows. */
  def embed(df: DataFrame, id: String, textCol: String,
      dim: Int = Dim): DataFrame =
    df.select(col(id), explode(text.tokens(col(textCol))).as("t"))
      .select(col(id), dimIdx(col("t"), dim).as("idx"), sign(col("t")).as("s"))
      .groupBy(col(id), col("idx"))
      .agg(sum(col("s")).as("w"))
      .filter(col("w") =!= 0)

  /** Shingle-space embedding dimension (2¹⁰ hashed 3-gram buckets). */
  val ShingleDim = 1024
  private val ShingleB = 1000003L // token-hash combiner base
  private val ShingleP = 1000000007L

  /** (idCol, text) → (id, idx, w) over hashed word-3-gram space.
    *
    * Word-salad corpora share most of their VOCABULARY, so unigram
    * cosine runs ~0.65 between unrelated documents and no threshold
    * separates near-dups (measured at sf0.1: 2.3M background pairs in
    * cosine [0.75, 0.85)). Shingles carry word ORDER — background
    * drops under 0.3 while true near-dups stay ≈1 — the same reason
    * the Jaccard/MinHash path shingles. The shingle hash combines the
    * three token polyHashes arithmetically (h₁·B+h₂ mod p, ·B+h₃
    * mod p; every intermediate < 10¹⁵) instead of re-hashing the
    * concatenated string per character — ~10× less hash work per
    * shingle. idx and sign come from the complementary div/mod 1024
    * split of the shingle hash.
    */
  def embedShingles(df: DataFrame, id: String, textCol: String): DataFrame =
    shingleHashes(df, id, textCol)
      .select(col(id), (col("sh") % ShingleDim).as("idx"),
        (expr(s"sh div $ShingleDim") % 2L * 2L - 1L).as("s"))
      .groupBy(col(id), col("idx"))
      .agg(sum(col("s")).as("w"))
      .filter(col("w") =!= 0)

  /** (idCol, text) → (id, sh) hashed word-3-gram rows (multiset —
    * one row per shingle occurrence). Docs under 3 tokens vanish.
    */
  def shingleHashes(df: DataFrame, id: String, textCol: String): DataFrame = {
    val th = df.select(col(id),
      transform(text.tokens(col(textCol)), t => text.polyHash(t)).as("hs"))
    // lambda reads the bound `hs` column, not the tokens expression —
    // re-evaluating the hash transform per shingle would be O(tokens²)
    th.select(col(id), explode(when(size(col("hs")) >= 3,
      transform(sequence(lit(1), size(col("hs")) - 2),
        i => ((element_at(col("hs"), i) * ShingleB
          + element_at(col("hs"), i + 1)) % ShingleP * ShingleB
          + element_at(col("hs"), i + 2)) % ShingleP))
      .otherwise(array().cast("array<long>"))).as("sh"))
  }

  /** Matching DuckDB fragments. */
  object sql {
    import graft.functions.text.{sql => tsql}
    def embedCte(alias: String, idCol: String = "doc_id",
        dim: Int = Dim, from: String = "documents"): String =
      s"$alias AS (SELECT $idCol, idx, cast(sum(s) as bigint) AS w FROM (" +
        s"SELECT $idCol, ${tsql.polyHash("t")} % $dim AS idx, " +
        s"((${tsql.polyHash("t")} >> 5) & 1) * 2 - 1 AS s " +
        s"FROM (SELECT $idCol, unnest(${tsql.tokensOf("text")}) AS t FROM $from)) " +
        s"GROUP BY $idCol, idx HAVING sum(s) <> 0)"

    /** CTE pair replicating [[shingleHashes]]: `__sh` is (id, sh).
      * Mirrors the 1-indexed, end-exclusive window of
      * `shinglesOfTokens`.
      */
    def shingleHashCtes(idCol: String = "doc_id"): String =
      s"__th AS (SELECT $idCol, list_transform(${tsql.tokensOf("text")}, " +
        s"t -> ${tsql.polyHash("t")}) AS hs FROM documents), " +
        s"__sh AS (SELECT $idCol, unnest(CASE WHEN len(hs) >= 3 THEN " +
        s"list_transform(range(1, len(hs) - 1), " +
        s"i -> ((hs[i] * $ShingleB + hs[i+1]) % $ShingleP * $ShingleB " +
        s"+ hs[i+2]) % $ShingleP) ELSE [] END) AS sh FROM __th)"

    /** CTE chain replicating [[embedShingles]] on top of
      * [[shingleHashCtes]]: (id, idx, w).
      */
    def shingleEmbedCte(alias: String, idCol: String = "doc_id"): String =
      s"${shingleHashCtes(idCol)}, " +
        s"$alias AS (SELECT $idCol, sh % $ShingleDim AS idx, " +
        s"cast(sum((sh // $ShingleDim) % 2 * 2 - 1) as bigint) AS w " +
        s"FROM __sh GROUP BY $idCol, idx HAVING sum((sh // $ShingleDim) % 2 * 2 - 1) <> 0)"
  }
}

/** Per-item retry with bounded attempts and delay — the reference's
  * transient-failure policy (3 attempts / 1 s,
  * common/utils/embeddings.py:99-118, common/config.py:60-61). Coarse
  * task-level failures are still covered by spark.task.maxFailures;
  * this handles flaky per-batch model calls without failing the task.
  */
object Retry {
  def withRetries[T](maxAttempts: Int = 3, delayMs: Long = 1000L)(
      f: () => T): T = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      try return f()
      catch {
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt < maxAttempts && delayMs > 0) Thread.sleep(delayMs)
      }
    }
    throw lastErr
  }
}

/** Dense deterministic embedder with the reference's operational shape:
  * batched invocation (EMBEDDING_BATCH_SIZE=10, common/config.py:62),
  * per-batch "model call" with retry, executor-side lazy state — but a
  * pure function of the text, so golden tests are stable.
  */
class FeatureHashEmbedder(val dim: Int = 64, val batchSize: Int = 10,
    val maxAttempts: Int = 3, val retryDelayMs: Long = 0L)
    extends Serializable {

  /** Override point standing in for the remote model RPC (X3); tests
    * inject failures here to exercise the retry path.
    */
  protected def callModel(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedOne)

  /** Embed one batch with the reference's retry policy (X4). */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    Retry.withRetries(maxAttempts, retryDelayMs)(() => callModel(texts))

  def embedOne(s: String): Array[Float] = {
    val v = new Array[Float](dim)
    def addToken(tok: CharSequence): Unit = {
      var h = 0L
      var i = 0
      while (i < tok.length) { h = (h * 31 + tok.charAt(i)) % 1000000007L; i += 1 }
      val idx = (h % dim).toInt
      val sgn = if (((h >> 5) & 1L) == 1L) 1f else -1f
      v(idx) += sgn
    }
    val toks = s.split("\\s+").filter(_.nonEmpty)
    toks.foreach(addToken)
    // L2-normalize so dot product ≈ cosine (reference serves
    // DOT_PRODUCT_DISTANCE over unit-ish embedding-model vectors)
    var n = 0.0
    v.foreach(x => n += x.toDouble * x.toDouble)
    val inv = if (n == 0) 0f else (1.0 / math.sqrt(n)).toFloat
    v.map(_ * inv)
  }

  /** DataFrame transform: adds `embedding ARRAY<FLOAT>`. Runs inside
    * mapPartitions with `grouped(batchSize)` — the Spark analog of the
    * reference's thread-pool batch fan-out (embeddings.py:164-192),
    * with task parallelism replacing the pool (and removing its
    * ordering bug, SURVEY §2.6 X2).
    */
  def transform(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val embs = embedBatch(batch.map(_.getString(idx)))
        batch.zip(embs).map { case (r, e) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ e.toSeq)
        }
      }
    }(enc)
  }
}
