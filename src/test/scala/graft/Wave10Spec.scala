package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Ranking}

/** Wave-10 operators: term-level snapshot drift and the
  * approximate-percentile contract. */
class Wave10Spec extends SparkSpec {
  import spark.implicits._

  test("termDrift: planted new term tops the report with the exact smoothed value") {
    val oldDf = Seq((1L, "a a b")).toDF("id", "text")
    val newDf = Seq((1L, "a a b c c c")).toDF("id", "text")
    val rows = Ranking.termDrift(oldDf, newDf, col("text"), topN = 10)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.head._1 == "c" && rows.head._2 == 0L && rows.head._3 == 3L)
    // V=3, T_old=3, T_new=6: ln(4/9) - ln(1/6) = ln(8/3) = 0.9808 (4dp)
    assert(rows.head._4 == 0.9808)
    // ranking is by |drift| desc
    val drifts = rows.map(t => math.abs(t._4)).toSeq
    assert(drifts == drifts.sorted.reverse)
  }

  test("approxPercentileContract: exact interpolated values, envelope holds") {
    val df = (1 to 100).map(i => ("g1", i.toDouble)).toDF("g", "v")
    val rows = CorpusStats.approxPercentileContract(df, col("g"), col("v"),
        ps = Seq(0.5, 0.9), accuracy = 100)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == 2)
    val byP = rows.map(t => t._2 -> t).toMap
    // exact interpolated: (N-1)*p + 1 -> 50.5 and 90.1
    assert(byP(0.5)._4 == 50.5 && byP(0.9)._4 == 90.1)
    assert(rows.forall(_._5), s"envelope violated: ${rows.mkString(", ")}")
    assert(rows.forall(_._3 == 100L))
    intercept[IllegalArgumentException] {
      CorpusStats.approxPercentileContract(df, col("g"), col("v"),
        Seq(1.5), 100)
    }
  }
}
