package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ranking}
import graft.sources.Tables

/** CCNet-style perplexity banding ([[Ranking.perplexityBuckets]]):
  * band sizes are equal-frequency within each language, band order is
  * monotone in the LM score, and degenerate (<2-token) docs surface as
  * bucket 0 with NULL score instead of polluting the tail band. */
class PplBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("bands are equal-frequency and monotone in logprob per language") {
    val docs = Dedup.spread(Tables.documents(spark, sf))
    val got = Ranking.perplexityBuckets(
        docs, col("doc_id"), col("text"), col("lang"), nBuckets = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getInt(4)))
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val scored = rows.filter(_._4 > 0)
      // ntile: band sizes differ by at most one
      val sizes = scored.groupBy(_._4).view.mapValues(_.length).toMap
      if (scored.length >= 3) {
        assert(sizes.keySet == Set(1, 2, 3), s"$lang bands: $sizes")
        assert(sizes.values.max - sizes.values.min <= 1, s"$lang sizes: $sizes")
      }
      // monotone: every band-1 score >= every band-2 score >= band-3
      for (b <- 1 to 2) {
        val hi = scored.filter(_._4 == b).flatMap(_._3)
        val lo = scored.filter(_._4 == b + 1).flatMap(_._3)
        if (hi.nonEmpty && lo.nonEmpty)
          assert(hi.min >= lo.max, s"$lang band $b not above band ${b + 1}")
      }
    }
  }

  test("docs without bigram evidence get bucket 0 and NULL score, and do " +
      "not shift the scored docs' band boundaries") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma", "en"),
      (3L, "beta gamma delta alpha", "en"),
      (4L, "solo", "en"),              // 1 token: no bigram events
      (5L, "", "en"),                  // empty: no tokens at all
      (6L, "alpha beta", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Ranking.perplexityBuckets(
        docs, col("doc_id"), col("text"), col("lang"), nBuckets = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]), r.getInt(4)))).toMap
    assert(got(4L) == ((None, 0)), s"1-token doc: ${got(4L)}")
    assert(got(5L) == ((None, 0)), s"empty doc: ${got(5L)}")
    // 4 scored docs in 3 bands: sizes 2/1/1 — the degenerate docs must
    // not have occupied band slots.
    val bands = got.collect { case (_, (Some(_), b)) => b }.toSeq.sorted
    assert(bands == Seq(1, 1, 2, 3), s"bands: $bands")
  }
}
