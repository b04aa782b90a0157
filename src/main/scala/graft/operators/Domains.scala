package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Document-level URL/domain governance — the per-domain accounting and
  * policy pass of a web-corpus curation pipeline (reference behavior
  * class: the source-level summaries of
  * /root/reference/TrafficAnalysis.py, lifted to the
  * registrable-domain grain a crawl corpus is governed at).
  *
  * Three concerns, one operator:
  *   - aggregation: per registered domain — docs, hosts, tokens,
  *     duplicate share, quality mix;
  *   - blocklist semantics: a doc is blocked if its EXACT host is
  *     listed OR its registered domain is listed — the standard
  *     two-level screen (host pins a single bad mirror, domain kills
  *     every subdomain at once);
  *   - per-domain cap: how many docs survive an "at most k per
  *     domain" diversity cap ([[Split.capPerStratum]] — deterministic
  *     md5 order, so the kept set is engine/run-stable).
  *
  * Registered-domain extraction is suffix-list-driven: the last two
  * host labels, or three when the two-label suffix is a listed
  * multi-part public suffix ("co.uk"-class). The full public-suffix
  * list is a parameter (a few thousand literals at production size —
  * broadcast-friendly); callers pass the slice their corpus needs.
  *
  * Scale shape: host/domain derivation is a codegen'd projection; the
  * duplicate screen shuffles 16-byte digests, never text ([[Dedup]]'s
  * discipline); the report is ONE domain-keyed hash aggregate; the cap
  * runs through the bounded-heap [[graft.plans.GroupTopK]] physical
  * operator (≤ k rows per domain × partition shuffled — a hot domain
  * costs k·partitions, never its full doc count). Blocklists ride as
  * literal IN filters (pushed to the scan when the corpus is on disk).
  */
object Domains {

  /** Lowercased host of a URL (null for null/unparseable input) —
    * scheme-mandatory parse, one codegen'd regexp. */
  def host(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Registered (registrable) domain of a host: last two labels, or
    * last three when the two-label suffix is a listed multi-part
    * public suffix. A host at or below two labels is its own domain. */
  def registeredDomain(h: Column, multiPartTlds: Seq[String]): Column = {
    val parts = split(h, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(h.isNull, lit(null).cast("string"))
      .when(size(parts) <= 2, h)
      .when(
        if (multiPartTlds.isEmpty) lit(false)
        else last2.isin(multiPartTlds: _*), last3)
      .otherwise(last2)
  }

  /** Per-registered-domain governance report. Output, ordered by
    * domain: (domain, n_hosts, n_docs, n_tokens, dup_docs, dup_rate,
    * quality_docs, quality_share, blocked_docs, kept_after_cap).
    *
    *   - dup_docs: docs whose whitespace-canonical text (lower, trim,
    *     single-space token join) occurs ≥ 2 times CORPUS-WIDE — the
    *     cross-domain mirror signal, deliberately not per-domain;
    *   - quality_docs/share: docs passing the caller's `quality`
    *     predicate (null counts as failing);
    *   - blocked_docs: exact-host OR registered-domain blocklist hits;
    *   - kept_after_cap: non-blocked docs surviving the `capPerDomain`
    *     cap under [[Split.capPerStratum]]'s deterministic md5 order.
    */
  def governanceReport(
      df: DataFrame, id: Column, url: Column, text: Column,
      quality: Column,
      blockedHosts: Seq[String], blockedDomains: Seq[String],
      multiPartTlds: Seq[String], capPerDomain: Int): DataFrame = {
    require(capPerDomain >= 1, "capPerDomain must be >= 1")
    val h = host(url)
    val dom = registeredDomain(h, multiPartTlds)
    // Canonical-text digest: null and empty text collapse to the same
    // canonical form on every engine (coalesce BEFORE tokenize).
    val canon = md5(concat_ws(" ", tokens(coalesce(text, lit("")))))
    val nToks = when(
      length(trim(coalesce(text, lit("")))) === 0, lit(0))
      .otherwise(size(tokens(text)))
    val blockedH =
      if (blockedHosts.isEmpty) lit(false) else h.isin(blockedHosts: _*)
    val blockedD =
      if (blockedDomains.isEmpty) lit(false) else dom.isin(blockedDomains: _*)
    // coalesce each blocklist hit: `isin` over a NULL host/domain
    // (unparseable URL) yields null, and null || null = null would make
    // the cap's NOT-blocked filter silently drop those docs instead of
    // letting them through unblocked under the null domain.
    val base = df.select(id.as("__id"), h.as("__host"), dom.as("__dom"),
      canon.as("__canon"), nToks.cast("long").as("__nt"),
      coalesce(quality, lit(false)).as("__q"),
      (coalesce(blockedH, lit(false)) || coalesce(blockedD, lit(false)))
        .as("__blocked"))
    // Corpus-wide duplicate screen on digests only.
    val dupKeys = base.groupBy(col("__canon"))
      .agg(count(lit(1)).as("__kc"))
      .filter(col("__kc") >= 2)
      .select(col("__canon"))
    val flagged = base.join(dupKeys.withColumn("__dup", lit(true)),
        Seq("__canon"), "left")
      .withColumn("__dup", coalesce(col("__dup"), lit(false)))
    val report = flagged.groupBy(col("__dom").as("domain"))
      .agg(
        countDistinct(col("__host")).as("n_hosts"),
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).cast("long").as("n_tokens"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("dup_docs"),
        sum(when(col("__q"), 1L).otherwise(0L)).as("quality_docs"),
        sum(when(col("__blocked"), 1L).otherwise(0L)).as("blocked_docs"))
    val kept = Split.capPerStratum(
        base.filter(!col("__blocked")).select(col("__dom"), col("__id")),
        col("__dom"), col("__id"), capPerDomain)
      .groupBy(col("__dom").as("__kdom"))
      .agg(count(lit(1)).as("kept_after_cap"))
    // Null-SAFE join key: the null domain (unparseable URLs) is a real
    // report row, and an equi-join would never match it — its kept
    // count would silently read 0.
    report.join(kept, col("domain") <=> col("__kdom"), "left")
      .drop("__kdom")
      .select(col("domain"), col("n_hosts"), col("n_docs"), col("n_tokens"),
        col("dup_docs"),
        round(col("dup_docs").cast("double") / col("n_docs").cast("double"),
          4).as("dup_rate"),
        col("quality_docs"),
        round(col("quality_docs").cast("double") /
          col("n_docs").cast("double"), 4).as("quality_share"),
        col("blocked_docs"),
        coalesce(col("kept_after_cap"), lit(0L)).as("kept_after_cap"))
      .orderBy(asc_nulls_first("domain"))
  }
}
