package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.text
import org.apache.spark.sql.functions._

/** Text-analysis operator coverage over `documents`: token counting
  * (whitespace + BPE-ish regex), validation, quality scoring,
  * language ID, content fingerprinting. All composed from codegen'd
  * built-ins; oracles replicate the identical computation in DuckDB.
  */
object TextAnalysis {

  import text.sql

  /** Token counting + the reference's ≤2042 validation predicate
    * (common/utils/embeddings.py:70-90).
    */
  private val tTokenCount = QueryDef.sqlChecked("t_token_count")(
    s"SELECT doc_id, ${sql.tokenCount("text")} AS n_tokens, " +
      s"${sql.bpeTokenCount("text")} AS n_bpe, " +
      s"${sql.tokenCount("text")} <= 2042 AS is_valid " +
      "FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      text.tokenCount(col("text")).as("n_tokens"),
      text.bpeTokenCount(col("text")).as("n_bpe"),
      text.isValid(col("text")).as("is_valid"))
      .orderBy("doc_id")
  }

  /** Composite quality score (stopword density / length / punct). */
  private val tQuality = QueryDef.sqlChecked("t_quality_score")(
    "SELECT doc_id, n_tokens, " +
      "CASE WHEN n_tokens = 0 OR n_chars = 0 THEN 0.0 ELSE " +
      "0.3 * least(cast(n_stop as double) / cast(n_tokens as double) * 5.0, 1.0) + " +
      "0.4 * least(cast(n_tokens as double) / 100.0, 1.0) + " +
      "0.3 * (1.0 - cast(n_punct as double) / cast(n_chars as double)) END AS quality " +
      s"FROM (SELECT doc_id, ${sql.tokenCount("text")} AS n_tokens, " +
      s"${sql.stopwordCount("text", text.EnStop)} AS n_stop, " +
      s"${sql.punctCount("text")} AS n_punct, " +
      "cast(length(text) as bigint) AS n_chars FROM documents) " +
      "ORDER BY doc_id"
  ) { (s, d) =>
    val base = Tables.documents(s, d).select(
      col("doc_id"),
      text.tokenCount(col("text")).as("n_tokens"),
      text.stopwordCount(col("text"), text.EnStop).as("n_stop"),
      text.punctCount(col("text")).as("n_punct"),
      length(col("text")).cast("bigint").as("n_chars"))
    base.select(
      col("doc_id"), col("n_tokens"),
      when(col("n_tokens") === 0 || col("n_chars") === 0, lit(0.0))
        .otherwise(
          lit(0.3) * least(col("n_stop").cast("double") / col("n_tokens").cast("double") * 5.0, lit(1.0)) +
            lit(0.4) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * (lit(1.0) - col("n_punct").cast("double") / col("n_chars").cast("double")))
        .as("quality"))
      .orderBy("doc_id")
  }

  /** Stopword-vote language ID (deterministic tiebreak). */
  private val tLangId = QueryDef.sqlChecked("t_lang_id")(
    "SELECT doc_id, c_en, c_de, c_es, c_fr, " +
      "CASE WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en' " +
      "WHEN c_de > 0 AND c_de >= c_es AND c_de >= c_fr THEN 'de' " +
      "WHEN c_es > 0 AND c_es >= c_fr THEN 'es' " +
      "WHEN c_fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred " +
      s"FROM (SELECT doc_id, ${sql.stopwordCount("text", text.EnStop)} AS c_en, " +
      s"${sql.stopwordCount("text", text.DeStop)} AS c_de, " +
      s"${sql.stopwordCount("text", text.EsStop)} AS c_es, " +
      s"${sql.stopwordCount("text", text.FrStop)} AS c_fr FROM documents) " +
      "ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      text.stopwordCount(col("text"), text.EnStop).as("c_en"),
      text.stopwordCount(col("text"), text.DeStop).as("c_de"),
      text.stopwordCount(col("text"), text.EsStop).as("c_es"),
      text.stopwordCount(col("text"), text.FrStop).as("c_fr"),
      text.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  }

  /** REAL merge-based BPE token counts over the committed offline
    * merge table — closes the semantic gap with the reference's
    * tiktoken validation (embeddings.py:52-60): counts come from
    * iterated pair merges, not a regex heuristic. The oracle encodes
    * every word with the IDENTICAL framing + fold-of-replaces (rules
    * inlined from the same fixture), so the counts hash-match. Also
    * re-states the 2042 cap (common/config.py:57) against BPE counts.
    *
    * The oracle is DOC-driven (list_transform + list_sum per row), not
    * unnest+GROUP BY: unnest drops documents whose token list is
    * empty, while the Spark side emits n_bpe_tokens=0 for them — a
    * blank document would silently break row parity under the grouped
    * form.
    */
  private val tBpeCount = QueryDef.sqlChecked("t_bpe_count")(
    "SELECT doc_id, n_bpe_tokens, " +
      s"n_bpe_tokens <= ${text.MaxTokens} AS bpe_valid FROM " +
      "(SELECT doc_id, coalesce(cast(list_sum(list_transform(" +
      s"${sql.tokensOf("text")}, t -> " +
      s"${graft.functions.BpeCodec.sqlEncodeLen("t")})) as bigint), " +
      "cast(0 as bigint)) AS n_bpe_tokens FROM documents) " +
      "ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      text.bpeMergeCount(col("text")).as("n_bpe_tokens"),
      (text.bpeMergeCount(col("text")) <= text.MaxTokens).as("bpe_valid"))
      .orderBy("doc_id")
  }

  /** Denylist / PII scrubbing — the redaction pass a training corpus
    * gets before the tokenizer sees it: mask every email-shaped span
    * and every word-bounded denylist term, and report per-document
    * match counts (the audit trail a compliance sweep keeps). Both
    * regexes stay in the Java∩RE2 common dialect (char classes,
    * bounded repeats, `\b`) so the oracle is the same pattern text;
    * replacement order is fixed (emails first) so overlapping rules
    * can't produce engine-dependent output. n_email counts on the
    * raw text; n_deny counts on the EMAIL-MASKED text — the same
    * input the deny replacement sees — so the audit count always
    * equals the number of `[TERM]` masks actually applied (a deny
    * word inside an email-shaped span is swallowed by `[EMAIL]`, and
    * is correctly not counted).
    * At scale this is one codegen'd projection — no shuffle,
    * no UDF — and the counts aggregate into the per-source audit
    * report for free.
    */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val DenyRe = "\\b(customer|supplier|spark)\\b"
  private val tRedact = QueryDef.sqlChecked("t_redact")(
    "WITH em AS (SELECT doc_id, text, " +
      s"regexp_replace(text, '$EmailRe', '[EMAIL]', 'g') AS masked FROM documents) " +
      s"SELECT doc_id, cast(len(regexp_extract_all(text, '$EmailRe')) as bigint) AS n_email, " +
      s"cast(len(regexp_extract_all(masked, '$DenyRe')) as bigint) AS n_deny, " +
      s"regexp_replace(masked, '$DenyRe', '[TERM]', 'g') AS redacted " +
      "FROM em ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("masked",
        regexp_replace(col("text"), lit(EmailRe), lit("[EMAIL]")))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("bigint").as("n_email"),
        size(regexp_extract_all(col("masked"), lit(DenyRe), lit(0)))
          .cast("bigint").as("n_deny"),
        regexp_replace(col("masked"), lit(DenyRe), lit("[TERM]")).as("redacted"))
      .orderBy("doc_id")
  }

  /** Content fingerprints: md5 + polynomial rolling hash. */
  private val tFingerprint = QueryDef.sqlChecked("t_fingerprint")(
    s"SELECT doc_id, md5(text) AS fp_md5, ${sql.polyHash("text")} AS fp_poly " +
      "FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      text.md5Fingerprint(col("text")).as("fp_md5"),
      text.polyHash(col("text")).as("fp_poly"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(tTokenCount, tQuality, tLangId, tBpeCount,
    tRedact, tFingerprint)
}
