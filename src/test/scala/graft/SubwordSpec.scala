package graft

import org.apache.spark.sql.functions._

import graft.operators.Subword

/** Pins the subword tokenizer: hand-computed vocabulary counts and
  * greedy longest-match walks, the UNK/advance-one fallback, and the
  * empty-document contract. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "aa ab"),
    (2L, "aa b")).toDF("doc_id", "text")

  test("vocab: frequency-weighted substring counts, count-desc/piece-asc ids") {
    val v = Subword.vocab(docs, col("text"), vocabSize = 3, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    // occurrences: "aa"x2 -> a,a,aa each; "ab" -> a,ab,b; "b" -> b.
    // counts: a=5, aa=2, b=2, ab=1; top-3 with piece-asc tiebreak.
    assert(v == Seq(("a", 5L, 0), ("aa", 2L, 1), ("b", 2L, 2)))
  }

  test("encode: greedy longest match, hand-computed walks") {
    val got = Subword.trainEncode(docs, col("doc_id"), col("text"),
        vocabSize = 3, maxPieceLen = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSeq
    // "aa" -> [aa]=1 (longest beats a+a); "ab" -> a(0), b(2); "b" -> 2.
    assert(got == Seq(
      (1L, 2L, 3L, 1.5, "1>0>2"),
      (2L, 2L, 2L, 1.0, "1>2")))
  }

  test("encode: no-match positions emit UNK -1 and advance one char") {
    val df = Seq((1L, "xyx zz")).toDF("doc_id", "text")
    val got = Subword.encodeWithVocab(df, col("doc_id"), col("text"),
        vocab = Seq("x" -> 0), maxPieceLen = 2)
      .collect().head
    // "xyx" -> x(0), y(UNK), x(0); "zz" -> UNK, UNK.
    assert((got.getLong(1), got.getLong(2), got.getString(4)) ==
      ((2L, 5L, "0>-1>0>-1>-1")))
  }

  test("encode: empty and blank docs produce zero pieces, null fertility") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "a")).toDF("doc_id", "text")
    val got = Subword.encodeWithVocab(df, col("doc_id"), col("text"),
        vocab = Seq("a" -> 0), maxPieceLen = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.isNullAt(3), r.getString(4))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, true, ""),
      (2L, 0L, 0L, true, ""),
      (3L, 1L, 1L, false, "0")))
  }

  test("encode: a piece longer than the remaining word cannot match") {
    // "ba": at pos 2 the remaining text is "a"; substr would silently
    // truncate "ab"/"aa" probes to "a" — the length guard must keep a
    // 2-char piece from claiming a 1-char match and over-advancing.
    val df = Seq((1L, "ba")).toDF("doc_id", "text")
    val got = Subword.encodeWithVocab(df, col("doc_id"), col("text"),
        vocab = Seq("a" -> 0, "ba" -> 1, "ab" -> 2), maxPieceLen = 2)
      .collect().head
    assert(got.getString(4) == "1")
    val df2 = Seq((1L, "ca")).toDF("doc_id", "text")
    val got2 = Subword.encodeWithVocab(df2, col("doc_id"), col("text"),
        vocab = Seq("a" -> 0, "ab" -> 1), maxPieceLen = 2)
      .collect().head
    // c -> UNK, then "a" must match as the 1-char piece (not "ab").
    assert(got2.getString(4) == "-1>0")
  }
}
