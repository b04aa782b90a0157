package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Funnel}

/** Wave-18 operators: Markov stationary distribution, entropy/Hill
  * profile, quantile mapping table. */
class Wave18Spec extends SparkSpec {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("stationaryDistribution: 8 iterations equal an independent reimplementation") {
    // One user walking A A B A B B A A A B — pairs drive the matrix.
    val walk = Seq("A", "A", "B", "A", "B", "B", "A", "A", "A", "B")
    val events = walk.zipWithIndex.map { case (t, i) =>
      (1L, Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), t, i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.stationaryDistribution(events, col("user_id"),
        col("ts"), col("event_id"), col("event_type"), iterations = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // independent reimplementation on the SAME rounded-grid matrix
    val pairs = walk.zip(walk.tail).groupBy(identity).view
      .mapValues(_.size).toMap
    val states = pairs.keys.map(_._1).toSeq.distinct.sorted
    val rowN = states.map(s =>
      s -> pairs.collect { case ((f, _), n) if f == s => n }.sum).toMap
    val p = pairs.map { case ((f, t), n) =>
      (f, t) -> round4(n.toDouble / rowN(f)) }
    var dist = states.map(s => s -> 1.0 / states.size).toMap
    (1 to 8).foreach { _ =>
      dist = p.groupBy(_._1._2).map { case (to, cells) =>
        to -> cells.map { case ((f, _), pij) => dist(f) * pij }.sum
      }
    }
    dist.foreach { case (s, v) =>
      assert(got(s) == round4(v), s"state $s: ${got(s)} vs ${round4(v)}")
    }
    assert(got.keySet == dist.keySet)
  }

  test("stationaryDistribution: distributed fallback equals the " +
    "driver-side iteration") {
    // maxCollectStates = 1 forces the above-cap distributed loop on a
    // 2-state chain; both paths must produce identical rows.
    val walk = Seq("A", "B", "B", "A", "A", "B", "A")
    val events = walk.zipWithIndex.map { case (t, i) =>
      (1L, Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), t, i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    def run(cap: Int) = Funnel.stationaryDistribution(events,
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        iterations = 8, maxCollectStates = cap)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val driver = run(4096)
    val dist = run(1)
    assert(driver == dist, s"$driver vs $dist")
  }

  test("entropyProfile: even split, concentrated split, single unit") {
    val docs = Seq(
      ("even", "a", 5L), ("even", "b", 5L),
      ("skew", "a", 1L), ("skew", "b", 1L), ("skew", "c", 2L),
      ("one", "a", 9L)
    ).toDF("grp", "unit", "w")
    val got = CorpusStats.entropyProfile(docs, col("grp"), col("unit"),
        col("w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("even") == ((2L, 10L, round4(math.log(2)), 2.0)))
    val hSkew = -(0.25 * math.log(0.25)) * 2 - 0.5 * math.log(0.5)
    assert(got("skew") ==
      ((3L, 4L, round4(hSkew), round4(math.exp(hSkew)))))
    assert(got("one") == ((1L, 9L, 0.0, 1.0)))
  }

  test("quantileMap: interpolated quartiles per unit vs pooled") {
    val docs = ((1 to 4).map(i => ("X", i.toLong)) ++
      (11 to 14).map(i => ("Y", i.toLong))).toDF("unit", "v")
    val got = CorpusStats.quantileMap(docs, col("unit"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // pooled 1,2,3,4,11,12,13,14: q25=2.75, q50=7.5, q75=12.25
    assert(got(("X", 50)) == ((2.5, 7.5, -5.0)))
    assert(got(("Y", 50)) == ((12.5, 7.5, 5.0)))
    assert(got(("X", 25)) == ((1.75, 2.75, -1.0)))
    assert(got(("Y", 75)) == ((13.25, 12.25, 1.0)))
    assert(got.size == 6)
  }
}
