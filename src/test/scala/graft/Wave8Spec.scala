package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Ranking, Split}

/** Wave-8 operators: deletion cascade (right-to-be-forgotten),
  * k-anonymity audit, DSIR importance weights, curriculum shards. */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  test("deletionCascade: reelected / erased / retained / singleton; untouched absent") {
    // Four exact-duplicate clusters (Jaccard 1.0 pairs) plus a deleted
    // singleton; texts across clusters share no shingles.
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (10L, "epsilon zeta eta theta"), (11L, "epsilon zeta eta theta"),
      (20L, "iota kappa lambda mu"), (21L, "iota kappa lambda mu"),
      (30L, "nu xi omicron pi"),
      (40L, "rho sigma tau upsilon"), (41L, "rho sigma tau upsilon")
    ).toDF("doc_id", "text")
    val deleted = Set(1L, 10L, 11L, 21L, 30L)
    val out = Dedup.deletionCascade(docs, col("doc_id"), col("text"),
        col("doc_id").isInCollection(deleted))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getString(5)))
      .toMap
    assert(out.keySet == Set(1L, 10L, 20L, 30L))
    assert(out(1L) == ((3L, 1L, 1L, 2L, "reelected")))
    assert(out(10L) == ((2L, 2L, 10L, -1L, "erased")))
    assert(out(20L) == ((2L, 1L, 20L, 20L, "retained")))
    assert(out(30L) == ((1L, 1L, 30L, -1L, "erased")))
  }

  test("kAnonymity: only groups under k surface; k guard") {
    val rows = Seq.fill(6)(("a", 1)) ++ Seq.fill(5)(("b", 1)) ++
      Seq.fill(4)(("c", 1)) ++ Seq(("d", 2))
    val df = rows.toDF("grp", "sub")
    val got = CorpusStats.kAnonymity(df,
        Seq("grp" -> col("grp"), "sub" -> col("sub")), k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("c", 1, 4L), ("d", 2, 1L)))
    intercept[IllegalArgumentException] {
      CorpusStats.kAnonymity(df, Seq("grp" -> col("grp")), k = 1)
    }
  }

  test("dsirWeights: target-like raw doc outranks off-target; target docs excluded") {
    val docs = Seq(
      (1L, "apple banana apple banana", true),   // target slice
      (2L, "apple banana cherry", true),
      (10L, "apple banana apple", false),        // raw, target-like
      (11L, "xyzzy qwerty xyzzy qwerty", false), // raw, off-target
      (12L, "apple xyzzy", false)
    ).toDF("doc_id", "text", "tgt")
    val out = Ranking.dsirWeights(docs, col("doc_id"), col("text"),
        col("tgt"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(10L, 11L, 12L))
    val z = out.toMap
    assert(z(10L) > z(12L) && z(12L) > z(11L))
    assert(z(10L) > 0 && z(11L) < 0)
    // ranking is by z desc
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.reverse.toSeq)
  }

  test("curriculumShards: balanced contiguous monotone bands; nulls land first") {
    val df = ((1 to 10).map(i => (i.toLong, Some(i.toDouble))) :+
        (99L, Option.empty[Double]))
      .toDF("id", "diff")
    val out = Split.curriculumShards(df, col("id"), col("diff"),
        nShards = 3, partitions = 2)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1), r.getInt(2)))
    assert(out.length == 11)
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1)
    // null difficulty sorts first => shard 0
    assert(out.find(_._1 == 99L).get._3 == 0)
    // monotone band boundaries over non-null difficulties
    val byShard = out.filterNot(t => t._2.isNaN).groupBy(_._3)
    val ordered = byShard.keys.toSeq.sorted
    ordered.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byShard(a).map(_._2).max <= byShard(b).map(_._2).min)
      case _ =>
    }
  }
}
