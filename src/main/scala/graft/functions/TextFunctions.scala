package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface:
  * tokenization + counting (reference parity: the token-validation
  * step at /root/reference/common/utils/embeddings.py:62-90), quality
  * scoring, language-ID heuristic, content fingerprinting.
  *
  * Everything is built from codegen'd `functions._` (split / filter /
  * aggregate higher-order functions) — no UDFs — and each helper has an
  * exact DuckDB SQL equivalent so oracle checks stay bit-identical.
  */
object text {

  /** Whitespace tokens, empties dropped (leading/trailing whitespace). */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** Whitespace token count (the reference's token_count analog). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("bigint")

  /** Pre-tokenizer split count: runs of letters, runs of digits, or
    * single other non-space chars — the cheap upper-stage heuristic.
    * For REAL merge-based BPE over the committed vocabulary see
    * [[bpeMergeCount]].
    */
  val BpePattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0))).cast("bigint")

  /** Merge-based BPE token count over the committed offline merge
    * table (graft/bpe_merges.txt) — see [[BpeCodec]] for the encoding
    * spec and its exact DuckDB twin.
    */
  def bpeMergeCount(c: Column): Column = BpeTokenCount.column(c)

  /** Validation predicate, reference cap 2042 (common/config.py:57). */
  val MaxTokens = 2042
  def isValid(c: Column): Column = tokenCount(c) <= MaxTokens

  /** How many tokens appear in `words`. */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c),
      t => array_contains(array(words.map(lit): _*), t))).cast("bigint")

  private[graft] val EnStop = Seq("the", "a", "is", "of", "and", "to", "in")
  private[graft] val DeStop = Seq("der", "die", "das", "und", "ist", "nicht")
  private[graft] val EsStop = Seq("el", "la", "los", "de", "y", "es")
  private[graft] val FrStop = Seq("le", "la", "les", "et", "est", "une")

  /** Stopword-vote language ID with deterministic en>de>es>fr tiebreak. */
  def langId(c: Column): Column = {
    val en = stopwordCount(c, EnStop)
    val de = stopwordCount(c, DeStop)
    val es = stopwordCount(c, EsStop)
    val fr = stopwordCount(c, FrStop)
    when(en > 0 && en >= de && en >= es && en >= fr, "en")
      .when(de > 0 && de >= es && de >= fr, "de")
      .when(es > 0 && es >= fr, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Characteristic character TRIGRAMS per language — the n-gram
    * language-ID heuristic's profiles (Cavnar & Trenkle 1994 n-gram
    * categorization, reduced to a committed high-signal set so the
    * whole classifier is SQL-replicable). Substring matches count —
    * 'the' inside 'then' votes — which is exactly what makes
    * trigram ID robust to tokenization.
    */
  private[graft] val EnTri = Seq("the", "and", "ing", "ion", " a ")
  private[graft] val DeTri = Seq("der", "ein", "sch", "und", "cht")
  private[graft] val EsTri = Seq("que", "los", "ión", "ado", " el")
  private[graft] val FrTri = Seq("les", "ent", "eau", "une", " et")

  /** Exact occurrence count of a fixed trigram inside the text —
    * (len − len(text with every copy removed)) / 3, all built-ins,
    * same arithmetic in DuckDB.
    */
  def trigramCount(c: Column, tri: String): Column =
    ((length(c) - length(regexp_replace(c,
      java.util.regex.Pattern.quote(tri), ""))) / 3).cast("bigint")

  /** Profile score = Σ occurrences of the profile's trigrams. */
  def trigramScore(c: Column, profile: Seq[String]): Column =
    profile.map(t => trigramCount(lower(c), t))
      .reduce(_ + _)

  /** n-gram (character-trigram) language ID — the Cavnar-Trenkle
    * heuristic over the committed profiles, deterministic en>de>es>fr
    * tiebreak like [[langId]]. Complements the stopword vote: the
    * trigram form needs no tokenization and survives punctuation-
    * glued words.
    */
  def langIdNgram(c: Column): Column = {
    val en = trigramScore(c, EnTri)
    val de = trigramScore(c, DeTri)
    val es = trigramScore(c, EsTri)
    val fr = trigramScore(c, FrTri)
    when(en > 0 && en >= de && en >= es && en >= fr, "en")
      .when(de > 0 && de >= es && de >= fr, "de")
      .when(es > 0 && es >= fr, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Punctuation-ish character count (anything outside [a-z0-9 ]). */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^a-z0-9 ]"), lit(0))).cast("bigint")

  /** Composite quality score in [0,1]: stopword density, length, and
    * punctuation cleanliness. Fixed IEEE op order — matches the oracle
    * SQL expression exactly, term by term. Empty / whitespace-only
    * text scores 0.0 (the unguarded ratios would be NULL in Spark but
    * NaN in DuckDB — engines would diverge).
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val stopRatio = stopwordCount(c, EnStop).cast("double") / nTok
    val punctRatio = punctCount(c).cast("double") / length(c).cast("double")
    when(tokenCount(c) === 0 || length(c) === 0, lit(0.0)).otherwise(
      lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.4) * least(nTok / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - punctRatio))
  }

  /** Content fingerprint: md5 hex of the UTF-8 text. */
  def md5Fingerprint(c: Column): Column = md5(c)

  /** md5 as a 16-byte BINARY — the SHUFFLE/STORE form of
    * [[md5Fingerprint]]: same 128 collision-free bits at half the
    * key bytes of the 32-char hex string (at 10¹³ span-dedup windows
    * that is ~160 TB of store/shuffle key traffic saved). unhex is
    * injective on md5 output, so grouping/joining on the binary key
    * makes decisions identical to the hex form the oracles replay.
    */
  def md5Binary(c: Column): Column = unhex(md5(c))

  /** Polynomial rolling hash over code points, mod 1e9+7 — a codegen
    * Catalyst expression (DuckDB oracle: list_reduce with a prepended
    * 0 seed over unicode(c)).
    */
  def polyHash(c: Column): Column = PolyHash.column(c)

  /** Word n-gram shingles ("a b c" strings), empty when < n tokens.
    *
    * IMPORTANT: `toks` must be a materialized array column (e.g. via a
    * prior select of [[tokens]]), NOT the tokens(...) expression — a
    * lambda referencing the expression tree re-runs the regex split
    * per element, turning shingling O(tokens²) per document.
    */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

  /** SQL fragments mirroring the helpers above (DuckDB dialect). */
  object sql {
    val tokens = "list_filter(string_split_regex(%s, '\\s+'), t -> t <> '')"
    def tokensOf(col: String): String = tokens.format(col)
    def tokenCount(col: String): String = s"len(${tokensOf(col)})"
    def bpeTokenCount(col: String): String =
      s"len(regexp_extract_all($col, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))"
    def stopwordCount(col: String, words: Seq[String]): String = {
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(${tokensOf(col)}, t -> list_contains($lst, t)))"
    }
    def punctCount(col: String): String =
      s"len(regexp_extract_all($col, '[^a-z0-9 ]'))"
    def polyHash(col: String): String =
      s"list_reduce(list_prepend(cast(0 as bigint), " +
        s"list_transform(list_filter(string_split_regex($col, ''), c -> c <> ''), " +
        s"c -> cast(unicode(c) as bigint))), (a, b) -> (a * 31 + b) % 1000000007)"
    /** 3-gram shingles over an already-bound token-list column —
      * 1-indexed, end-exclusive range ≡ the Spark `shinglesOfTokens`
      * (empty when < 3 tokens).
      */
    def shinglesOfTokens(tk: String): String =
      s"list_transform(range(1, greatest(len($tk) - 1, 1)), " +
        s"i -> $tk[i] || ' ' || $tk[i+1] || ' ' || $tk[i+2])"

    /** (id, shingle) rows subquery; tokens materialized once per doc. */
    def shingleRows(idCol: String, table: String = "documents"): String =
      s"SELECT $idCol, unnest(${shinglesOfTokens("tk")}) AS s " +
        s"FROM (SELECT $idCol, ${tokensOf("text")} AS tk FROM $table)"
  }
}
