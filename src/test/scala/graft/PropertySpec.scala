package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.traffic.Normalize

/** Algebraic invariants (SURVEY.md §5.2.3) checked over generated data
  * (raw scalacheck Gens sampled with fixed seeds — the scalatest bridge
  * artifact is not in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("group-sum total is invariant under partitioning") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 1000L)))
    for (rows <- samples(gen, 5) if rows.nonEmpty) {
      val df = rows.toDF("k", "v")
      val direct = df.agg(sum("v")).collect().head.getLong(0)
      for (parts <- Seq(1, 3, 7)) {
        val viaGroups = df.repartition(parts).groupBy("k").agg(sum("v").as("s"))
          .agg(sum("s")).collect().head.getLong(0)
        assert(viaGroups == direct, s"parts=$parts")
      }
    }
  }

  test("unpivot then re-pivot is the identity on generated wide frames") {
    val gen = Gen.listOfN(8, Gen.zip(Gen.identifier.map(_.take(6)),
      Gen.choose(0L, 99L), Gen.choose(0L, 99L)))
    for (rows0 <- samples(gen, 5)) {
      val rows = rows0.distinctBy(_._1)
      if (rows.nonEmpty) {
        val wide = rows.toDF("key", "c1", "c2")
        val long = wide.unpivot(Array(col("key")),
          Array(col("c1"), col("c2")), "var", "val")
        val re = long.groupBy("key").pivot("var", Seq("c1", "c2")).sum("val")
        val a = wide.orderBy("key").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val b = re.orderBy("key").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        assert(a.toSeq == b.toSeq)
      }
    }
  }

  test("volume binning is total on non-negative inputs") {
    for (vols <- samples(Gen.listOfN(50, Gen.choose(0L, 100000L)), 5)
         if vols.nonEmpty) {
      val got = vols.toDF("v").select(Normalize.volumeBin(col("v"))).collect()
      assert(got.forall(!_.isNullAt(0)))
    }
  }

  test("probe-window jaccard and containment equal brute-force all-pairs on random corpora") {
    // Guards the pairsByProbeWindow pigeonhole bounds (probe width,
    // per-pair slack, size pruning) against the edges the sf fixtures
    // don't hit: 1-3-shingle docs, equal-size pairs, thresholds at and
    // away from the slack breakpoints. Vocab of 12 words & short docs
    // force heavy overlap, so qualifying pairs exist at every τ.
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    val doc = Gen.choose(3, 12).flatMap(len => Gen.listOfN(len, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(14, doc)
    for ((texts, i) <- samples(corpus, 6).zipWithIndex; tau <- Seq(0.5, 0.8, 0.95)) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("id", "text")
      val sh = docs.select(col("id"),
        graft.expressions.HashedShingles.shingles(col("text"), 2).as("hs"))
        .withColumn("n_sh", size(col("hs")))
      val brute = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
        .withColumn("inter", size(array_intersect(col("a.hs"), col("b.hs"))))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          (col("inter").cast("double") /
            (col("a.n_sh") + col("b.n_sh") - col("inter"))).as("jaccard"),
          (col("inter").cast("double") /
            least(col("a.n_sh"), col("b.n_sh"))).as("containment"))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val bruteJ = pairs(brute.filter(col("jaccard") >= tau)
        .select("id_a", "id_b", "jaccard"))
      val gotJ = pairs(graft.operators.Dedup.ngramJaccardPairs(
        docs, col("id"), col("text"), n = 2, threshold = tau))
      assert(gotJ == bruteJ, s"jaccard corpus=$i tau=$tau")
      val bruteC = pairs(brute.filter(col("containment") >= tau)
        .select("id_a", "id_b", "containment"))
      val gotC = pairs(graft.operators.Dedup.containmentPairs(
        docs, col("id"), col("text"), n = 2, threshold = tau))
      assert(gotC == bruteC, s"containment corpus=$i tau=$tau")
    }
  }

  test("reporting-family invariants on random corpora") {
    // snapshotDiff(x, x) is empty; spectrum masses re-sum to the vocab;
    // packing waste is bounded; funnel counts are monotone non-increasing.
    import graft.operators.{CorpusStats, Funnel}
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val doc = Gen.choose(1, 10).flatMap(len =>
      Gen.listOfN(len, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(12, doc)
    for ((texts, i) <- samples(corpus, 4).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      // diff of identical snapshots: zero churn
      assert(CorpusStats.snapshotDiff(docs, docs,
        col("doc_id"), col("text")).count() == 0L, s"sample=$i diff")
      // spectrum: Σ n_terms over classes == |distinct terms|
      val vocab = docs.select(explode(split(lower(col("text")), "\\s+")))
        .distinct().count()
      val specSum = CorpusStats.termSpectrum(docs, col("text"), n = 1,
        maxFreq = 3).agg(sum(col("n_terms"))).collect().head.getLong(0)
      assert(specSum == vocab, s"sample=$i spectrum $specSum != $vocab")
      // packing: 0 <= pad_waste < 1 and packed_chunks <= pad_chunks
      val pk = CorpusStats.packingEfficiency(docs, lit("all"), col("text"),
        seqLen = 4).collect().head
      assert(pk.getDouble(4) >= 0.0 && pk.getDouble(4) < 1.0, s"sample=$i")
      assert(pk.getLong(5) <= pk.getLong(3), s"sample=$i packed>pad")
    }
    // funnel monotonicity on a random event log
    val ev = Gen.listOfN(40, for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.choose(0L, 100000L)
      et <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u, new java.sql.Timestamp(t), et))
    for ((rows, i) <- samples(ev, 4).zipWithIndex) {
      val df = rows.toDF("user_id", "ts", "event_type")
      val counts = Funnel.conversionFunnel(df, col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click", "purchase"))
        .orderBy("step").collect().map(_.getLong(2)).toSeq
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"sample=$i funnel $counts not monotone")
    }
  }

  test("top-k is a prefix of the full descending sort") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 1000), Gen.choose(0L, 500L)))
    for (rows <- samples(gen, 5) if rows.nonEmpty) {
      val df = rows.toDF("id", "v")
      val full = df.orderBy(desc("v"), asc("id")).collect().map(_.toSeq)
      val topk = df.orderBy(desc("v"), asc("id")).limit(5).collect().map(_.toSeq)
      assert(full.take(5).toSeq == topk.toSeq)
    }
  }

  test("custom GroupTopK equals per-group sort-prefix on generated frames") {
    val gen = Gen.listOfN(60, Gen.zip(
      Gen.choose(0, 4), Gen.choose(0, 500), Gen.choose(0L, 50L)))
    for ((rows0, i) <- samples(gen, 5).zipWithIndex if rows0.nonEmpty) {
      // unique (g, id) keys give the required total order under (v, id)
      val rows = rows0.distinctBy(r => (r._1, r._2))
      val df = rows.toDF("g", "id", "v").repartition(3)
      for (k <- Seq(1, 3, 10)) {
        val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
          rs.sortBy(r => (-r._3, r._2)).take(k)
        }.toSet
        val got = graft.plans.GroupTopK.topK(df,
            Seq(col("g")), Seq(col("v").desc, col("id").asc), k)
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
        assert(got == expected, s"sample=$i k=$k")
      }
    }
  }
}
