package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Pins the corpus-reporting operators added for incremental pipelines:
  * snapshot diff (churn classification), tokenizer fertility, and
  * sequence-packing efficiency. Hand-computed micro-fixtures pin the
  * arithmetic and the null/empty contracts the oracles also encode.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // ---- snapshotDiff ----

  private lazy val oldSnap = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta"),
  ).toDF("doc_id", "text")

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val newSnap = Seq(
      (1L, "alpha"),          // unchanged -> no row
      (2L, "bravo EDITED"),   // changed
      (4L, "delta"),          // unchanged -> no row
      (9L, "echo"),           // added
    ).toDF("doc_id", "text")  // 3L absent -> removed
    val got = CorpusStats
      .snapshotDiff(oldSnap, newSnap, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (9L, "added")))
  }

  test("snapshotDiff: null text hashes as empty string, not as absence") {
    val newSnap = Seq(
      (1L, null.asInstanceOf[String]), // present but empty -> changed
      (2L, "bravo"), (3L, "charlie"), (4L, "delta"),
    ).toDF("doc_id", "text")
    val got = CorpusStats
      .snapshotDiff(oldSnap, newSnap, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "changed")))
    // null -> null is UNCHANGED (empty = empty), not churn.
    val both = oldSnap.withColumn("text",
      when(col("doc_id") === 1L, lit(null: String)).otherwise(col("text")))
    assert(CorpusStats.snapshotDiff(both, both, col("doc_id"), col("text"))
      .count() == 0L)
  }

  test("snapshotDiff carries both hashes for changed rows") {
    val newSnap = Seq((2L, "bravo EDITED")).toDF("doc_id", "text")
    val rows = CorpusStats
      .snapshotDiff(oldSnap.filter(col("doc_id") === 2L), newSnap,
        col("doc_id"), col("text"))
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(2) != null && r.getString(3) != null &&
      r.getString(2) != r.getString(3))
  }

  // ---- tokenizerFertility ----

  test("tokenizerFertility: hand-computed ratios per group") {
    val docs = Seq(
      ("en", "one two three"),   // 3 tokens, 13 chars
      ("en", "four five"),       // 2 tokens,  9 chars
      ("zh", "abcdefgh"),        // 1 token,   8 chars
    ).toDF("lang", "text")
    val got = CorpusStats
      .tokenizerFertility(docs, col("lang"), col("text"))
      .orderBy("group")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got == Seq(
      ("en", 2L, 5L, 22L, 4.4, 2.5),
      ("zh", 1L, 1L, 8L, 8.0, 1.0)))
  }

  test("tokenizerFertility: zero-token group yields null ratio, zero counts") {
    val docs = Seq(("x", ""), ("x", null.asInstanceOf[String]))
      .toDF("lang", "text")
    val r = CorpusStats.tokenizerFertility(docs, col("lang"), col("text"))
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.isNullAt(4))          // chars_per_token: no 0/0
    assert(r.getDouble(5) == 0.0)  // tokens_per_doc
  }

  // ---- benfordAudit ----

  test("benfordAudit: leading-digit arithmetic incl. sub-1 values, exclusions") {
    val vals = Seq(123.0, 0.045, 9000.0, 1.0, -5.0, 0.0)
      .map(Tuple1(_)).toDF("x")
    val got = CorpusStats.benfordAudit(vals, col("x"))
      .orderBy("digit").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // digits: 123->1, 0.045->4, 9000->9, 1.0->1; -5 and 0 excluded.
    // Unobserved digits still appear (n=0) — all nine rows, always.
    assert(got == Seq((1, 2L), (2, 0L), (3, 0L), (4, 1L), (5, 0L),
      (6, 0L), (7, 0L), (8, 0L), (9, 1L)))
  }

  test("benfordAudit: exact powers of ten stay digit 1 under the clamp " +
    "and the total N is preserved") {
    // A 1-ulp-low log10 at exact powers of ten can make the raw
    // quotient land on 10; the clamp must keep such rows in digit 9's
    // neighbour-free [1,9] range (here: digit 1) instead of dropping
    // them through the grid join.
    val vals = Seq(1.0, 10.0, 100.0, 1000.0, 10000.0, 100000.0, 1e6, 1e7)
      .map(Tuple1(_)).toDF("x")
    val rows = CorpusStats.benfordAudit(vals, col("x"))
      .orderBy("digit").collect()
    assert(rows.map(_.getLong(1)).sum == 8L, "no row may vanish")
    assert(rows.head.getInt(0) == 1 && rows.head.getLong(1) == 8L)
  }

  test("benfordAudit: zero-observation digits carry their N·exp chi2 part") {
    // The most non-Benford data possible: every value leads with 9.
    // Absent digits 1..8 must each contribute N·exp to the chi-square,
    // or the screen fails open exactly when it should fire hardest.
    val vals = Seq.fill(100)(900.0).map(Tuple1(_)).toDF("x")
    val rows = CorpusStats.benfordAudit(vals, col("x"))
      .orderBy("digit").collect()
    assert(rows.length == 9)
    val chi2 = rows.map(_.getDouble(4)).sum
    // Full statistic: N·(1-exp9)²/exp9 + Σ_{d=1..8} N·exp_d; with
    // exp9 ≈ 0.0458 that is ≈ 1983 + 95 ≈ 2078 — far above the χ²₈
    // 0.001 critical value (26.12). The pre-fix sum was only the
    // digit-9 term's ≈ 1988; assert the absent-digit mass is present.
    val exp = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val want = 100.0 * (1.0 - exp(8)) * (1.0 - exp(8)) / exp(8) +
      (0 until 8).map(i => 100.0 * exp(i)).sum
    assert(math.abs(chi2 - want) < 0.1)
    val d1 = rows.head
    assert(d1.getInt(0) == 1 && d1.getLong(1) == 0L &&
      d1.getDouble(2) == 0.0 && d1.getDouble(4) > 30.0)
  }

  test("benfordAudit: frequencies and chi-square parts are exact-count ratios") {
    val vals = (1 to 9).flatMap(d => Seq.fill(d)(d * 100.0))
      .map(Tuple1(_)).toDF("x") // digit d occurs d times, N=45
    val r = CorpusStats.benfordAudit(vals, col("x"))
      .filter(col("digit") === 1).collect().head
    assert(r.getLong(1) == 1L)
    assert(r.getDouble(2) == BigDecimal(1.0 / 45)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(3) == BigDecimal(math.log10(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---- packingEfficiency ----

  test("packingEfficiency: hand-computed chunk counts and waste at L=4") {
    val docs = Seq(
      ("a", "t1 t2 t3"),             // 3 tokens -> 1 pad chunk
      ("a", "t1 t2 t3 t4"),          // 4 tokens -> 1 pad chunk (exact fit)
      ("a", "t1 t2 t3 t4 t5"),       // 5 tokens -> 2 pad chunks
    ).toDF("source", "text")
    val r = CorpusStats
      .packingEfficiency(docs, col("source"), col("text"), seqLen = 4)
      .collect().head
    // totals: 12 tokens; pad = 4 chunks * 4 = 16 slots -> waste 0.25;
    // packed = ceil(12/4) = 3 chunks -> waste 0.
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 12L, 4L)))
    assert(r.getDouble(4) == 0.25)
    assert(r.getLong(5) == 3L)
    assert(r.getDouble(6) == 0.0)
  }

  // ---- termSpectrum ----

  test("termSpectrum: hand-computed unigram count-of-counts with overflow") {
    val docs = Seq(
      ("a a a b b c"), ("a d"),
    ).toDF("text")
    // counts: a=4, b=2, c=1, d=1 -> freq 1:2 terms, 2:1, overflow(4->3+1? )
    val got = CorpusStats.termSpectrum(docs, col("text"), n = 1, maxFreq = 3)
      .orderBy("freq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (4L, 1L)).map {
      case (f, n) => (math.min(f, 4L), n) })
  }

  test("termSpectrum: n-grams keep multiplicity; short docs contribute none") {
    val docs = Seq(
      ("x y x y x"),  // bigrams: "x y","y x","x y","y x" -> each twice
      ("solo"),       // 1 token < n=2 -> no events
    ).toDF("text")
    val got = CorpusStats.termSpectrum(docs, col("text"), n = 2, maxFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((2L, 2L)))
  }

  test("packingEfficiency: empty docs contribute zero chunks; empty group nulls waste") {
    val docs = Seq(("a", "t1 t2"), ("a", ""), ("b", ""))
      .toDF("source", "text")
    val got = CorpusStats
      .packingEfficiency(docs, col("source"), col("text"), seqLen = 4)
      .orderBy("group").collect()
    val a = got(0)
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((2L, 2L, 1L)))
    assert(a.getDouble(4) == 0.5)
    val b = got(1)
    assert((b.getLong(2), b.getLong(3)) == ((0L, 0L)))
    assert(b.isNullAt(4) && b.getLong(5) == 0L && b.isNullAt(6))
  }
}
