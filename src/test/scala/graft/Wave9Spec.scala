package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Similarity, SkewJoin}

/** Wave-9 operators: join-key skew profile, RP sign-bucket index
  * audit, PII density report, sequence-budget planner. */
class Wave9Spec extends SparkSpec {
  import spark.implicits._

  test("skewProfile: exact shares, skew factors, ceil salt; ordered desc") {
    val df = (Seq.fill(8)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val rows = SkewJoin.skewProfile(df, col("k"), topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.head == (("a", 8L, 0.666667, 2.0, 2L)))
    // b/c tie at n=2 breaks by key asc; skew 0.5 still recommends salt 1
    assert(rows.toSeq.drop(1) == Seq(
      ("b", 2L, 0.166667, 0.5, 1L), ("c", 2L, 0.166667, 0.5, 1L)))
  }

  test("rpBucketAudit: census invariants; wrong-dim vectors skipped") {
    val vecs = (0L until 40L).map(i =>
        (i, Array.tabulate(8)(j => (((i + j) % 5).toFloat - 2f)))) :+
      (99L, Array(1f, 2f)) // wrong dimension -> skipped
    val df = vecs.toDF("id", "v")
    val r = Similarity.rpBucketAudit(df, col("id"), col("v"),
      inDim = 8, outDim = 4).collect()(0)
    val (nVec, nSkip, nBuck, maxSz) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nVec == 40L && nSkip == 1L)
    assert(nBuck >= 1L && nBuck <= 16L && maxSz <= nVec)
    val (mean, imb, cost) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(math.abs(mean - nVec.toDouble / nBuck) < 1e-4)
    assert(imb >= 1.0 && cost <= 1.0 + 1e-9)
    // probe cost is bounded below by the perfectly-level layout
    assert(cost >= 1.0 / nBuck - 1e-6)
  }

  test("piiDensity: exact per-stratum counts; null text matches nothing") {
    val df = Seq(
      ("s1", "mail me at a@b.com and c@d.org"),
      ("s1", "call 555-123-4567"),
      ("s1", null),
      ("s2", "server at 10.0.0.1 no mail")
    ).toDF("src", "text")
    val got = CorpusStats.piiDensity(df, col("src"), col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6))).toMap
    assert(got("s1") == ((3L, 2L, 2L, 1L, 0L, 1.0)))
    assert(got("s2") == ((1L, 1L, 0L, 0L, 1L, 1.0)))
  }

  test("sequenceBudget: ceil chunking, padding, efficiency; empty/null are zero") {
    val df = Seq(
      ("en", "a b c d e"),   // 5 tokens -> 2 seqs of 4, padding 3
      ("en", "x y z"),       // 3 tokens -> 1 seq, padding 1
      ("zz", ""), ("zz", null)
    ).toDF("lang", "text")
    val got = CorpusStats.sequenceBudget(df, col("lang"), col("text"),
        seqLen = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    assert(got("en")._1 == 2L && got("en")._2 == 8L && got("en")._3 == 3L)
    assert(got("en")._4 == 4L && math.abs(got("en")._5 - 0.666667) < 1e-9)
    assert(got("zz") == ((2L, 0L, 0L, 0L, Double.NaN))
      || (got("zz")._3 == 0L && got("zz")._5.isNaN))
  }
}
