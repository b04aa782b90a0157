package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline surface:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is a composition of built-in Catalyst expressions
  * (codegen'd, no UDFs) so filters/pruning optimize straight through —
  * the reference's ad-hoc Python lambdas (SURVEY.md §2.J) re-expressed as
  * native columns.
  *
  * Cross-engine notes (DuckDB oracle parity): ratios are exact integer
  * divisions done in double (bit-identical IEEE); token splitting matches
  * DuckDB `string_split_regex` because inputs are trimmed first (no
  * leading/trailing empty tokens).
  */
object TextFunctions {

  /** Whitespace tokens of lower-cased trimmed text. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Token count; empty/blank text → 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** Fraction of characters that are neither word chars nor whitespace. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[\\w\\s]", "")) / greatest(length(c), lit(1))

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    stopwordHits(c, stopwords) / greatest(tokenCount(c), lit(1))

  /** Number of tokens found in `stopwords`. Native codegen'd expression
    * (see [[graft.expressions.StopwordHits]]) — the HOF formulation
    * `size(filter(tokens, isin))` is pinned equal in
    * `ExpressionCodegenSpec`. */
  def stopwordHits(c: Column, stopwords: Seq[String]): Column =
    graft.expressions.StopwordHits.hits(tokens(c), stopwords)

  /** Mean token length in characters. The token-length sum is computed
    * as `length(text minus all whitespace)` — tokens are exactly the
    * whitespace-split pieces, so their concatenation is the text with
    * whitespace removed (lower applied first to mirror the tokenizer for
    * locale-sensitive case mappings). Pure codegen'd builtins; replaces
    * an interpreted aggregate/transform HOF pass per document. */
  def avgTokenLen(c: Column): Column =
    length(regexp_replace(lower(trim(c)), "\\s+", "")) /
      greatest(tokenCount(c), lit(1))

  /** English stopwords used by the default quality score / language ID. */
  val StopEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  val StopEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "los", "se")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val StopFr: Seq[String] = Seq("le", "la", "et", "les", "des", "un", "une", "est")

  /** Heuristic document quality score in 0..4: one point each for sane
    * length, low punctuation, some stopwords, and sane mean token length
    * (the reference's length/punct/stopword quality checks generalized). */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    (when(nTok.between(5, 5000), 1).otherwise(0)
      + when(punctRatio(c) < 0.3, 1).otherwise(0)
      + when(stopwordRatio(c, StopEn) > 0.05, 1).otherwise(0)
      + when(avgTokenLen(c).between(2.0, 15.0), 1).otherwise(0)).cast("int")
  }

  /** N-gram-heuristic language ID: stopword-hit counts per language,
    * first-match argmax (deterministic tie-break by list order en,es,de,fr;
    * no hits at all → "und" for undetermined). */
  def langId(c: Column): Column = {
    val hEn = stopwordHits(c, StopEn)
    val hEs = stopwordHits(c, StopEs)
    val hDe = stopwordHits(c, StopDe)
    val hFr = stopwordHits(c, StopFr)
    val best = greatest(hEn, hEs, hDe, hFr)
    when(best === 0, lit("und"))
      .when(hEn === best, lit("en"))
      .when(hEs === best, lit("es"))
      .when(hDe === best, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Order-insensitive bag-of-words fingerprint: md5 of the sorted distinct
    * token set — catches word-shuffled duplicates that exact text hashing
    * misses. */
  def bowFingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(c))), " "))

  /** Position-ordered token n-grams as space-joined strings, built by
    * zipping n shifted slices — n bulk array copies and a positional
    * merge — instead of a per-position `slice`/`element_at` chain. The
    * same rework measured 40% off the sf0.1 bigram explode stage
    * (Q83Explode, BASELINE.md round-13 chain table), and the n-gram
    * explode is the corpus's hottest expression. Shorter-than-n docs
    * produce an empty array (the slice length is clamped at 0 — a
    * negative length would be a runtime error, not an empty slice). */
  def ngramStrings(toks: Column, n: Int): Column = {
    require(n >= 1, "n must be >= 1")
    if (n == 1) toks
    else transform(
      arrays_zip((1 to n).map(j =>
        slice(toks, lit(j), greatest(size(toks) - (n - 1), lit(0)))): _*),
      s => concat_ws(" ", (0 until n).map(j => s.getField(j.toString)): _*))
  }

  /** Token n-gram shingles (distinct), the unit for Jaccard/minhash dedup.
    * Documents shorter than n tokens shingle to their full token string so
    * they can still match exact duplicates. */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(array_distinct(ngramStrings(toks, n)))
  }

  /** Polynomial rolling-hash document fingerprint:
    * h = Σ 31^i·byte(i) mod 1e9+7, folded left-to-right with per-step
    * modular reduction so every intermediate stays exact in both engines
    * (DuckDB errors on int64 overflow; Spark would silently wrap). */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, b) => pmod(acc * 31 + b, lit(1000000007L)))

  /** Approximate BPE-ish subword count: word tokens plus an extra unit per
    * 6 chars of a long token (crude proxy for byte-pair splits, as a
    * deterministic, dependency-free token counter). */
  def subwordCount(c: Column): Column =
    aggregate(
      transform(tokens(c), t => greatest(lit(1), ceil(length(t) / lit(6.0)).cast("int"))),
      lit(0), (acc, x) => acc + x)

  // --- PII redaction -------------------------------------------------
  //
  // Regex-class scrubbing of the three standard structured-PII shapes
  // (emails, NANP-style phone numbers, IPv4 addresses) — the
  // redaction pass every training-data pipeline runs before tokenizing.
  // The patterns are deliberately restricted to constructs with
  // IDENTICAL semantics in java.util.regex (Spark codegen) and RE2
  // (DuckDB oracle): character classes, bounded/greedy quantifiers and
  // ASCII \b word boundaries — no backreferences, no lookaround — so
  // one pattern string literal serves both engines and the oracle can
  // gate the actual rewritten text (q84 embeds THESE constants in its
  // DuckDB SQL; there is exactly one definition of each pattern).

  /** Email address. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NANP-ish phone: 3-3-4 digit groups joined by '-' or '.'. */
  val PhoneRe: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  /** Dotted-quad IPv4 (syntactic: octet range not enforced). */
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Occurrences of each PII class in the ORIGINAL text (counts are
    * independent per class — a digit run inside an email's local part
    * can legitimately count as both). Codegen'd builtins. */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))

  /** Redact all three PII classes to typed placeholder tokens. Order is
    * part of the contract — emails first (their local parts can contain
    * phone/IP-shaped digit runs, and the whole address must become ONE
    * `<EMAIL>`), then phones (3-3-4 digit runs would otherwise be eaten
    * partially by the looser IPv4 dotted-quad shape), then IPv4. Three
    * global `regexp_replace` passes, all codegen'd. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Canonicalize text for hashing/dedup: Unicode NFC (the custom
    * [[graft.expressions.NfcNormalize]] — composed vs decomposed
    * accents are byte-distinct and would defeat every hash-keyed
    * operator), control characters (C0 + DEL) to spaces, whitespace
    * runs collapsed to one space, ends trimmed. The two regex passes
    * are codegen'd builtins; both engines' `\s` is ASCII-only here
    * (java.regex default, RE2), which is the contract — Unicode spaces
    * are content, not separators, until NFC-level policy says
    * otherwise. */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.expressions.NfcNormalize.nfc(c),
        "[\\x00-\\x1F\\x7F]", " "),
      "\\s+", " "))
}
