package graft

import org.apache.spark.sql.functions._

import graft.expressions.MisraGriesTopK
import graft.operators.{Dedup, Ranking}
import graft.sources.Tables

/** Misra–Gries summary + the exact frequent-terms composition: the
  * one-sided guarantee (every true heavy hitter survives the screen),
  * the capacity bound, the underestimate bound, and end-to-end equality
  * of [[Ranking.frequentTerms]] with the brute-force group-and-filter. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed stream: term t_i with weight ~ 1/(i+1). */
  private def skewedStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    (0 until n).map { _ =>
      val u = rnd.nextDouble() * total
      val idx = cum.indexWhere(_ >= u)
      s"t$idx"
    }
  }

  test("summary holds <= capacity counters and contains every term with " +
      "freq > N/(capacity+1), counts underestimating by <= N/(capacity+1)") {
    for (seed <- Seq(1L, 7L, 23L)) {
      val stream = skewedStream(20000, 500, seed)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val k = 10
      val got = stream.toDF("term").repartition(5)
        .agg(MisraGriesTopK.summary(col("term"), k).as("mg"))
        .collect()(0).getMap[String, Long](0)
      val n = stream.size.toLong
      val bound = n / (k + 1)
      assert(got.size <= k, s"capacity violated: ${got.size}")
      exact.foreach { case (t, f) =>
        if (f > bound)
          assert(got.contains(t), s"seed $seed: heavy hitter $t (freq $f > $bound) evicted")
      }
      got.foreach { case (t, est) =>
        val f = exact.getOrElse(t, 0L)
        assert(est <= f, s"seed $seed: $t overestimated ($est > $f)")
        assert(f - est <= bound, s"seed $seed: $t under by ${f - est} > $bound")
      }
    }
  }

  test("summary is exact when the vocabulary fits the capacity") {
    val stream = Seq("a", "b", "a", "c", "a", "b")
    val got = stream.toDF("term").repartition(3)
      .agg(MisraGriesTopK.summary(col("term"), 10).as("mg"))
      .collect()(0).getMap[String, Long](0)
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("null terms are ignored, not counted") {
    val got = Seq(Some("a"), None, Some("a"), None).toDF("term")
      .repartition(2)
      .agg(MisraGriesTopK.summary(col("term"), 4).as("mg"))
      .collect()(0).getMap[String, Long](0)
    assert(got == Map("a" -> 2L))
  }

  test("frequentTerms equals brute-force group-and-filter on the corpus") {
    val docs = Dedup.spread(Tables.documents(spark, sf))
    val k = 30
    val got = Ranking.frequentTerms(docs, col("text"), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val toks = docs.select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val total = toks.count()
    val brute = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(k + 1L) > lit(total))
      .select(col("term"), col("n"),
        round(col("n").cast("double") / lit(total).cast("double"), 6).as("share"))
      .orderBy(col("n").desc, col("term").asc)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "fixture should yield at least one heavy hitter")
    assert(got.toSeq == brute.toSeq)
  }
}
