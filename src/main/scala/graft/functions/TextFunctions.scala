package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * token counting, language ID (stop-word n-gram heuristic), quality
  * scoring, normalization and fingerprinting.
  *
  * All are pure `Column` expression builders over
  * `org.apache.spark.sql.functions` — codegen'd, whole-stage friendly, no
  * UDFs — and each has an exact ANSI-SQL twin runnable by DuckDB (see
  * SparkEntry.oracleSql) so results are byte-comparable across engines.
  * Divisions are int/int -> double single IEEE ops, so results are
  * bitwise deterministic.
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lowercased text. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  def charCount(c: Column): Column = length(c)

  /** Word n-grams over the normalized text, space-joined — the corpus
    * vocabulary/statistics primitive (top-k n-grams, n-gram LM counts).
    * Texts with fewer than `n` tokens yield an empty array. One pass
    * over the token array; the heavy lifting (explode + count) happens
    * in the caller's aggregation, which map-side combines.
    */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = split(normText(c), " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
  }

  /** BPE-style pretokenizer pattern (GPT-2 family), simplified to the
    * subset RE2 also supports (no lookahead): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs, whitespace
    * runs. Counting its matches approximates subword-tokenizer token
    * counts well enough for corpus budgeting without shipping a
    * vocabulary.
    */
  val BpeTokenPattern: String =
    "'(s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Approximate subword token count via the BPE pretokenizer regex. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeTokenPattern))

  /** Count of the characters of `chars` in `c`, by deletion: length(c)
    * minus the length with those characters translated away. One table-
    * lookup pass per char — the regexp_count([class]) formulation walked
    * the regex automaton per character, several times slower for plain
    * character classes. Exactly equal to regexp_count(c, "[chars]").
    */
  private def charClassCount(c: Column, chars: String): Column =
    length(c) - length(translate(c, chars, ""))

  private val AsciiLetters =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  /** ASCII-letter chars / total chars. */
  def alphaRatio(c: Column): Column =
    charClassCount(c, AsciiLetters).cast("double") / greatest(length(c), lit(1))

  /** Punctuation chars / total chars. */
  def punctRatio(c: Column): Column =
    charClassCount(c, ".,;:!?").cast("double") / greatest(length(c), lit(1))

  /** Digit chars / total chars. */
  def digitRatio(c: Column): Column =
    charClassCount(c, "0123456789").cast("double") / greatest(length(c), lit(1))

  private val enStops = Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was")
  private val deStops = Seq("der", "die", "und", "das", "nicht", "ist", "ein", "mit", "den", "von")
  private val frStops = Seq("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que")
  private val esStops = Seq("el", "la", "los", "las", "y", "es", "un", "una", "por", "con")

  private def tokens(c: Column): Column = split(normText(c), " ")

  private def stopHits(c: Column, stops: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(stops.map(lit): _*)))

  /** Stop-word tokens / total tokens (English list) — a standard quality
    * signal for web-scraped corpora.
    */
  def stopwordRatio(c: Column): Column =
    stopHits(c, enStops).cast("double") / greatest(tokenCount(c), lit(1))

  /** Composite quality score in [0,1]: alpha-heavy, punctuation-light,
    * stop-word-bearing text scores high.
    */
  def qualityScore(c: Column): Column =
    alphaRatio(c) * lit(0.5) + (lit(1.0) - punctRatio(c)) * lit(0.3) +
      least(stopwordRatio(c) * lit(4.0), lit(1.0)) * lit(0.2)

  /** n-gram stop-word-vote language ID over {en, de, fr, es}; "und" =
    * undetermined when no list scores above zero.
    */
  def langId(c: Column): Column = {
    val en = stopHits(c, enStops)
    val de = stopHits(c, deStops)
    val fr = stopHits(c, frStops)
    val es = stopHits(c, esStops)
    val top = greatest(en, de, fr, es)
    when(top === 0, lit("und"))
      .when(en === top, lit("en"))
      .when(de === top, lit("de"))
      .when(fr === top, lit("fr"))
      .otherwise(lit("es"))
  }

  /** 64-bit content fingerprint of normalized text (xxhash64 — engine
    * hash, compared structurally not cross-engine).
    */
  def fingerprint(c: Column): Column = xxhash64(normText(c))

  /** Character k-shingles of normalized text (the unit for MinHash /
    * Jaccard). Uses `sequence` + `transform` — pure codegen, no UDF.
    *
    * NOTE for hot paths: pass an already-materialized (projected)
    * normalized column via [[charShinglesPre]] instead of composing this
    * directly over raw text — a captured non-trivial expression inside a
    * higher-order-function lambda is re-evaluated per array ELEMENT, so
    * inlining `normText` here costs O(len) regexp evaluations per row.
    */
  def charShingles(c: Column, k: Int): Column = charShinglesPre(normText(c), k)

  /** Character k-shingles of an ALREADY-normalized text column. */
  def charShinglesPre(n: Column, k: Int): Column =
    when(length(n) < k, array(n)).otherwise(
      array_distinct(transform(
        sequence(lit(1), length(n) - lit(k - 1)),
        i => n.substr(i, lit(k)))))

  /** Word w-shingles (w consecutive tokens joined) of normalized text. */
  def wordShingles(c: Column, w: Int): Column = {
    val t = tokens(c)
    when(size(t) < w, array(concat_ws(" ", t))).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(t) - lit(w)),
        i => concat_ws(" ", slice(t, i + 1, lit(w))))))
  }
}
