package graft

import org.apache.spark.sql.functions._

import graft.queries.CorpusQueries
import graft.sources.Tables

/** q141 data card: internal consistency of the one-pass report — the
  * composition sections must reconcile with the corpus totals and with
  * each other (the properties a reader of the published card relies
  * on). */
class DataCardSpec extends SparkSpec {

  private lazy val card = CorpusQueries.q141DataCard(spark, sf)
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))

  private def section(s: String) = card.filter(_._1 == s)
  private def value(s: String, k: String) =
    card.find(r => r._1 == s && r._2 == k).get._3

  test("composition sections reconcile with corpus totals") {
    val nDocs = value("corpus", "n_docs")
    assert(section("lang").map(_._3).sum == nDocs)
    assert(section("source").map(_._3).sum == nDocs)
    val docs = Tables.documents(spark, sf)
    assert(nDocs == docs.count().toDouble)
    assert(value("corpus", "n_chars") ==
      docs.agg(sum(col("n_chars"))).collect()(0).getLong(0).toDouble)
  }

  test("token shares sum to ~1 and mean_tokens is totals-consistent") {
    val shares = section("lang_token_share").map(_._3)
    assert(shares.nonEmpty && math.abs(shares.sum - 1.0) < 1e-4,
      s"shares sum ${shares.sum}")
    val mean = value("corpus", "mean_tokens")
    val expect = BigDecimal(
        value("corpus", "n_tokens") / value("corpus", "n_docs"))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(mean == expect)
  }

  test("dup section: groups and surplus docs are consistent") {
    val g = value("dup", "exact_dup_groups")
    val d = value("dup", "exact_dup_docs")
    assert(g >= 0 && d >= g * 0 && (g == 0) == (d == 0),
      s"groups $g / dup docs $d")
    // every dup group of size s contributes s-1 surplus docs ≥ 1
    if (g > 0) assert(d >= g)
  }
}
