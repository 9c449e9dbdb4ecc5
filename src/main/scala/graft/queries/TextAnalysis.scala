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

  /** GOPHER-STYLE REPETITION filters (Rae et al. 2021, "Scaling
    * Language Models", App. A quality heuristics — the standard
    * training-corpus repetition family): per document,
    *  - `dup_line_frac`   — duplicate lines / total non-empty lines,
    *  - `dup_line_chars`  — chars inside lines occurring >1× / chars
    *                        in all lines,
    *  - `top_bigram_frac` — chars covered by the most frequent word
    *                        2-gram / chars in all 2-gram instances
    *                        (tie → lexicographically first bigram),
    *  - `keep`            — the Gopher drop rule (dup_line_frac ≤
    *                        0.30 ∧ top_bigram_frac ≤ 0.20).
    * All built-ins (split / explode / window) — codegen'd, one
    * shuffle per grouping, output |docs| rows regardless of corpus
    * size. Oracle replicates the identical tokenization (whitespace
    * split, empties dropped), counts, and tie-breaks in DuckDB; the
    * fractions are single IEEE divisions of exact integer counts, so
    * the whole row hash-gates.
    */
  private val tRepetition = QueryDef.sqlChecked("t_repetition")(
    "WITH lines AS (SELECT doc_id, l AS line FROM (SELECT doc_id, " +
      "unnest(string_split(text, chr(10))) AS l FROM documents) " +
      "WHERE length(trim(l)) > 0), " +
      "lg AS (SELECT doc_id, line, count(*) AS c, length(line) AS len " +
      "FROM lines GROUP BY doc_id, line), " +
      "ld AS (SELECT doc_id, sum(c) AS n_lines, " +
      "sum(c) - count(*) AS dup_lines, " +
      "sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dup_chars, " +
      "sum(c * len) AS line_chars FROM lg GROUP BY doc_id), " +
      "words AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), w -> w <> '') AS ws FROM documents), " +
      "bigrams AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg " +
      "FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words)), " +
      "bg AS (SELECT doc_id, bg, count(*) AS c, length(bg) AS len " +
      "FROM bigrams GROUP BY doc_id, bg), " +
      "bt AS (SELECT doc_id, bg AS top_bigram, c * len AS top_chars " +
      "FROM (SELECT doc_id, bg, c, len, row_number() OVER (" +
      "PARTITION BY doc_id ORDER BY c DESC, bg) AS rn FROM bg) " +
      "WHERE rn = 1), " +
      "ba AS (SELECT doc_id, sum(c * len) AS bg_chars FROM bg " +
      "GROUP BY doc_id) " +
      "SELECT d.doc_id, " +
      "coalesce(ld.n_lines, 0) AS n_lines, " +
      "CASE WHEN coalesce(ld.n_lines, 0) = 0 THEN 0.0 ELSE " +
      "cast(ld.dup_lines as double) / ld.n_lines END AS dup_line_frac, " +
      "CASE WHEN coalesce(ld.line_chars, 0) = 0 THEN 0.0 ELSE " +
      "cast(ld.dup_chars as double) / ld.line_chars END AS dup_line_chars, " +
      "coalesce(bt.top_bigram, '') AS top_bigram, " +
      "CASE WHEN coalesce(ba.bg_chars, 0) = 0 THEN 0.0 ELSE " +
      "cast(bt.top_chars as double) / ba.bg_chars END AS top_bigram_frac, " +
      "(CASE WHEN coalesce(ld.n_lines, 0) = 0 THEN 0.0 ELSE " +
      "cast(ld.dup_lines as double) / ld.n_lines END) <= 0.30 AND " +
      "(CASE WHEN coalesce(ba.bg_chars, 0) = 0 THEN 0.0 ELSE " +
      "cast(bt.top_chars as double) / ba.bg_chars END) <= 0.20 AS keep " +
      "FROM documents d LEFT JOIN ld ON d.doc_id = ld.doc_id " +
      "LEFT JOIN bt ON d.doc_id = bt.doc_id " +
      "LEFT JOIN ba ON d.doc_id = ba.doc_id ORDER BY d.doc_id"
  ) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val lg = docs
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .groupBy("doc_id", "line")
      .agg(count(lit(1)).as("c"), length(col("line")).cast("long").as("len"))
    val ld = lg.groupBy("doc_id").agg(
      sum("c").as("n_lines"),
      (sum("c") - count(lit(1))).as("dup_lines"),
      sum(when(col("c") > 1, col("c") * col("len")).otherwise(0L))
        .as("dup_chars"),
      sum(col("c") * col("len")).as("line_chars"))
    val bgAll = docs
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), w => w =!= "").as("ws"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("ws")) - 1, lit(0))),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1)))).as("bg"))
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c"), length(col("bg")).cast("long").as("len"))
    val bt = bgAll
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("c").desc, col("bg"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("bg").as("top_bigram"),
        (col("c") * col("len")).as("top_chars"))
    val ba = bgAll.groupBy("doc_id")
      .agg(sum(col("c") * col("len")).as("bg_chars"))
    val dupLineFrac = when(coalesce(col("n_lines"), lit(0L)) === 0, 0.0)
      .otherwise(col("dup_lines").cast("double") / col("n_lines"))
    val topBgFrac = when(coalesce(col("bg_chars"), lit(0L)) === 0, 0.0)
      .otherwise(col("top_chars").cast("double") / col("bg_chars"))
    docs.select("doc_id")
      .join(ld, Seq("doc_id"), "left")
      .join(bt, Seq("doc_id"), "left")
      .join(ba, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        dupLineFrac.as("dup_line_frac"),
        when(coalesce(col("line_chars"), lit(0L)) === 0, 0.0)
          .otherwise(col("dup_chars").cast("double") / col("line_chars"))
          .as("dup_line_chars"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        topBgFrac.as("top_bigram_frac"),
        (dupLineFrac <= 0.30 && topBgFrac <= 0.20).as("keep"))
      .orderBy("doc_id")
  }

  /** The remaining GOPHER quality rules (Rae et al. 2021, App. A —
    * the non-repetition half; [[tRepetition]] carries the repetition
    * half): per document,
    *  - `mean_word_len`  — chars per word, rule 3 ≤ x ≤ 10,
    *  - `symbol_ratio`   — ('#' + '…'-as-'...') per word, rule < 0.1,
    *  - `bullet_frac`    — lines starting with a bullet, rule < 0.9,
    *  - `ellipsis_frac`  — lines ending in '...', rule < 0.3,
    *  - `alpha_frac`     — words containing ≥1 [A-Za-z], rule > 0.8,
    *  - `keep`           — the conjunction.
    * Same split machinery as [[tRepetition]] (whitespace words,
    * newline lines, empties dropped); every fraction is one IEEE
    * division of exact integer counts, so the row hash-gates.
    */
  private val tGopherRules = QueryDef.sqlChecked("t_gopher_rules")(
    "WITH words AS (SELECT doc_id, w FROM (SELECT doc_id, " +
      "unnest(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> x <> '')) AS w FROM documents)), " +
      "wa AS (SELECT doc_id, count(*) AS n_words, " +
      "sum(length(w)) AS word_chars, " +
      "sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) " +
      "AS n_alpha FROM words GROUP BY doc_id), " +
      "lines AS (SELECT doc_id, trim(l) AS line FROM (SELECT doc_id, " +
      "unnest(string_split(text, chr(10))) AS l FROM documents) " +
      "WHERE length(trim(l)) > 0), " +
      "la AS (SELECT doc_id, count(*) AS n_lines, " +
      "sum(CASE WHEN starts_with(line, '-') OR starts_with(line, '*') " +
      "OR starts_with(line, '•') THEN 1 ELSE 0 END) AS n_bullet, " +
      "sum(CASE WHEN ends_with(line, '...') THEN 1 ELSE 0 END) " +
      "AS n_ellipsis FROM lines GROUP BY doc_id), " +
      "sy AS (SELECT doc_id, " +
      "cast((length(text) - length(replace(text, '#', ''))) + " +
      "(length(text) - length(replace(text, '...', ''))) / 3 " +
      "as bigint) AS n_symbol FROM documents) " +
      "SELECT d.doc_id, " +
      "CASE WHEN coalesce(wa.n_words, 0) = 0 THEN 0.0 ELSE " +
      "cast(wa.word_chars as double) / wa.n_words END AS mean_word_len, " +
      "CASE WHEN coalesce(wa.n_words, 0) = 0 THEN 0.0 ELSE " +
      "cast(sy.n_symbol as double) / wa.n_words END AS symbol_ratio, " +
      "CASE WHEN coalesce(la.n_lines, 0) = 0 THEN 0.0 ELSE " +
      "cast(la.n_bullet as double) / la.n_lines END AS bullet_frac, " +
      "CASE WHEN coalesce(la.n_lines, 0) = 0 THEN 0.0 ELSE " +
      "cast(la.n_ellipsis as double) / la.n_lines END AS ellipsis_frac, " +
      "CASE WHEN coalesce(wa.n_words, 0) = 0 THEN 0.0 ELSE " +
      "cast(wa.n_alpha as double) / wa.n_words END AS alpha_frac, " +
      "(CASE WHEN coalesce(wa.n_words, 0) = 0 THEN 0.0 ELSE " +
      "cast(wa.word_chars as double) / wa.n_words END) BETWEEN 3.0 AND 10.0 " +
      "AND (CASE WHEN coalesce(wa.n_words, 0) = 0 THEN 0.0 ELSE " +
      "cast(sy.n_symbol as double) / wa.n_words END) < 0.1 " +
      "AND (CASE WHEN coalesce(la.n_lines, 0) = 0 THEN 0.0 ELSE " +
      "cast(la.n_bullet as double) / la.n_lines END) < 0.9 " +
      "AND (CASE WHEN coalesce(la.n_lines, 0) = 0 THEN 0.0 ELSE " +
      "cast(la.n_ellipsis as double) / la.n_lines END) < 0.3 " +
      "AND (CASE WHEN coalesce(wa.n_words, 0) = 0 THEN 0.0 ELSE " +
      "cast(wa.n_alpha as double) / wa.n_words END) > 0.8 AS keep " +
      "FROM documents d LEFT JOIN wa ON d.doc_id = wa.doc_id " +
      "LEFT JOIN la ON d.doc_id = la.doc_id " +
      "LEFT JOIN sy ON d.doc_id = sy.doc_id ORDER BY d.doc_id"
  ) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val wa = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), "\\s+"), w => w =!= ""))
          .as("w"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("word_chars"),
        sum(when(col("w").rlike("[A-Za-z]"), 1L).otherwise(0L))
          .as("n_alpha"))
    val la = docs
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("l"))
      .select(col("doc_id"), trim(col("l")).as("line"))
      .filter(length(col("line")) > 0)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("line").startsWith("-") ||
          col("line").startsWith("*") ||
          col("line").startsWith("•"), 1L).otherwise(0L)).as("n_bullet"),
        sum(when(col("line").endsWith("..."), 1L).otherwise(0L))
          .as("n_ellipsis"))
    val sy = docs.select(col("doc_id"),
      ((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
        (length(col("text")) -
          length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
        .cast("long").as("n_symbol"))
    def frac(n: org.apache.spark.sql.Column, d0: org.apache.spark.sql.Column) =
      when(coalesce(d0, lit(0L)) === 0, 0.0)
        .otherwise(n.cast("double") / d0)
    val meanWl = frac(col("word_chars"), col("n_words"))
    val symR = frac(col("n_symbol"), col("n_words"))
    val bulF = frac(col("n_bullet"), col("n_lines"))
    val ellF = frac(col("n_ellipsis"), col("n_lines"))
    val alpF = frac(col("n_alpha"), col("n_words"))
    docs.select("doc_id")
      .join(wa, Seq("doc_id"), "left")
      .join(la, Seq("doc_id"), "left")
      .join(sy, Seq("doc_id"), "left")
      .select(col("doc_id"),
        meanWl.as("mean_word_len"), symR.as("symbol_ratio"),
        bulF.as("bullet_frac"), ellF.as("ellipsis_frac"),
        alpF.as("alpha_frac"),
        (meanWl.between(3.0, 10.0) && symR < 0.1 && bulF < 0.9 &&
          ellF < 0.3 && alpF > 0.8).as("keep"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(tTokenCount, tQuality, tLangId, tBpeCount,
    tRedact, tFingerprint, tRepetition, tGopherRules)
}
