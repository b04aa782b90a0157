package graft

import org.apache.spark.sql.functions._

import graft.expressions.{MinHashSig, SimHash64}
import graft.functions.TextFunctions

/** Pins that the custom expressions' codegen and interpreted paths agree
  * and that codegen actually engages (no fallback plan). */
class ExpressionCodegenSpec extends SparkSpec {
  import spark.implicits._

  // repartition breaks ConvertToLocalRelation, which would otherwise
  // evaluate the projection interpreted at optimization time and never
  // exercise doGenCode
  private lazy val docs = (0 until 200)
    .map(i => (i.toLong, s"token$i shared words appear here ${i % 7} times over"))
    .toDF("id", "text")
    .repartition(3)

  test("simhash64: codegen output equals direct kernel evaluation") {
    val viaPlan = docs
      .select(col("id"), SimHash64.simhash64(TextFunctions.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = docs.collect().map { r =>
      val toks = r.getString(1).toLowerCase.trim.split("\\s+")
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
      r.getLong(0) -> SimHash64.Kernel.simhash(arr)
    }.toMap
    assert(viaPlan == direct)
  }

  test("minhash_sig: codegen output equals direct kernel evaluation") {
    val viaPlan = docs
      .select(col("id"),
        MinHashSig.minhashSig(TextFunctions.shingles(col("text"), 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaPlan.values.forall(_.length == 16))
    // identical shingle sets -> identical signatures regardless of path
    val twice = docs.select(
      MinHashSig.minhashSig(TextFunctions.shingles(col("text"), 3), 16).as("a"),
      MinHashSig.minhashSig(TextFunctions.shingles(col("text"), 3), 16).as("b"))
      .collect()
    assert(twice.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("float_vec_dot matches the aggregate(zip_with) HOF on well-formed, " +
      "mismatched-length, and null-element rows") {
    val df = Seq(
      (1L, Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](4.0f, 5.0f, 6.0f)),
      (2L, Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](4.0f, 5.0f, 6.0f)),
      (3L, Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](4.0f, 5.0f, 6.0f)))
      .toDF("id", "a", "b")
      .repartition(2) // defeat ConvertToLocalRelation so codegen runs
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0.0 as double), (s, v) -> s + v)")
    val got = df.select(col("id"),
        graft.expressions.FloatVecDot.dot(col("a"), col("b")).as("native"),
        hof.as("hof"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(1L)._1 == got(1L)._2 && got(1L)._1.contains(32.0))
    assert(got(2L) == ((None, None)), s"mismatched lengths must null: $got")
    assert(got(3L) == ((None, None)), s"null element must null: $got")
  }

  test("sig_agree matches the size(filter(zip_with)) HOF formulation") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),   // 3 agree
      (2L, Seq(1L, 2L), Seq(1L, 2L, 3L)),               // length mismatch
      (3L, Seq(5L, 6L), Seq(5L, 6L)))                   // all agree
      .toDF("id", "a", "b")
      .repartition(2)
    val hof = expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))")
    val got = df.select(col("id"),
        graft.expressions.SigAgree.agree(col("a"), col("b")).as("native"),
        hof.as("hof"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(1L)._1.contains(3) && got(3L)._1.contains(2))
    assert(got(1L)._1 == got(1L)._2 && got(3L)._1 == got(3L)._2)
    assert(got(2L)._1 == None, s"mismatched lengths must null: $got")
  }

  test("hyperplane_bucket equals the nBits-pass HOF formulation bit for bit") {
    val vecs = (0 until 50)
      .map(i => (i.toLong, Array.tabulate(24)(d => ((i * 31 + d * 7) % 17 - 8) / 4.0f).toSeq))
      .toDF("id", "v")
      .repartition(3)
    for (nBits <- Seq(8, 16, 32)) {
      val got = vecs.select(col("id"),
          graft.expressions.HyperplaneBucket64.bucket(col("v"), nBits).as("native"),
          graft.functions.VectorFunctions.hyperplaneBucketHof(col("v"), nBits).as("hof"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)} nBits=$nBits")
      }
    }
  }

  test("l2_argmin_code equals the array_min(transform) HOF formulation, " +
      "including length-mismatch / null-element / null-sub edges") {
    val cands = array(
      struct(lit(0).as("cl"), typedLit(Seq(0.0, 0.0, 0.0)).as("c")),
      struct(lit(1).as("cl"), typedLit(Seq(1.0, 1.0, 1.0)).as("c")),
      struct(lit(2).as("cl"), typedLit(Seq(0.5, 0.5, 0.5)).as("c")))
    val df = Seq(
      (1L, Seq[java.lang.Double](0.4, 0.4, 0.4)),    // nearest cl=2
      (2L, Seq[java.lang.Double](0.9, 1.1, 1.0)),    // nearest cl=1
      (3L, Seq[java.lang.Double](0.25, 0.25, 0.25)), // exact d2 tie 0 vs 2 → 0
      (4L, Seq[java.lang.Double](0.1, 0.1)),         // length mismatch → null d2
      (5L, Seq[java.lang.Double](0.1, null, 0.1)),   // null element → null d2
      (6L, null: Seq[java.lang.Double]))             // null sub → null d2
      .toDF("id", "sub")
      .repartition(2) // defeat ConvertToLocalRelation so codegen runs
    val got = df.select(col("id"),
        graft.expressions.L2ArgminCode.argmin(cands, col("sub")).as("native"),
        graft.operators.Similarity.l2AssignHof(cands, col("sub")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"id=${r.getLong(0)}")
      assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}")
    }
    // the three null-d2 edges all resolve to the smallest cl, like the
    // struct-min with NULL-first field ordering
    assert(got.filter(_.getLong(0) >= 4).forall(_.getInt(1) == 0))
    // null / empty candidate arrays → NULL (array_min's contract)
    val edge = Seq(Tuple1(Seq(0.1, 0.2))).toDF("sub").repartition(2)
      .select(
        graft.expressions.L2ArgminCode.argmin(
          lit(null).cast("array<struct<cl:int,c:array<double>>>"),
          col("sub")).as("n"),
        graft.expressions.L2ArgminCode.argmin(
          array().cast("array<struct<cl:int,c:array<double>>>"),
          col("sub")).as("e"))
      .collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  test("pq_adc_score equals the slice/zip_with LUT-sum HOF chain, " +
      "including short-vector and null-element edges") {
    // m=4 subspaces, ksub=4 codewords, dsub=2 — small enough to read.
    val cbs: Seq[(Int, Int, Array[Double])] = for {
      j <- 0 until 4; c <- 0 until 4
      if !(j == 2 && c == 3) // dead codeword -> -inf fill in both paths
    } yield (j, c, Array(j * 0.5 + c * 0.25, c * 0.125 - j * 0.75))
    def fvec(xs: java.lang.Float*): Seq[java.lang.Float] = xs
    val df = Seq(
      (1L, fvec(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f), 0x1B2AL),
      (2L, fvec(0.5f, -1f, 2f, -2f, 3f, -3f, 4f, -4f), 0xFFFFL),
      (3L, fvec(1f, 2f, 3f, 4f, 5f, 6f), 0x0001L),       // short -> NULL
      (4L, fvec(1f, null, 3f, 4f, 5f, 6f, 7f, 8f), 0x0L) // null el -> NULL
    ).toDF("id", "qv", "codes")
      .repartition(2) // defeat ConvertToLocalRelation so codegen runs
    val m = 4; val ksub = 4; val dsub = 2
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    val cbData = (0 until m).map { j =>
      (0 until ksub).map { c =>
        cbs.find(p => p._1 == j && p._2 == c).map(_._3)
          .getOrElse(Array.fill(dsub)(Double.NegativeInfinity))
      }.toArray
    }.toArray
    val got = df.select(col("id"),
        graft.expressions.PqAdcScore.score(
          col("qv"), col("codes"), cbData, bits).as("native"),
        graft.operators.Similarity.adcLutSumHof(
          cbs, col("qv"), col("codes")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        // bit equality: the dead-codeword row legitimately produces NaN
        // (-inf terms of mixed sign) on BOTH paths; == would reject it
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"id=${r.getLong(0)}")
    }
    assert(got.count(r => !r.isNullAt(1)) == 2)
  }

  test("subword_greedy_encode equals the aggregate-HOF walk, including " +
      "empty words, no-match chars, and longest-match ties at word end") {
    val vocab = Seq("a" -> 0, "b" -> 1, "ab" -> 2, "abc" -> 3, "bc" -> 4,
      "cc" -> 5, "é" -> 6, "éa" -> 7)
    val words = Seq("", "a", "ab", "abc", "abcc", "ccc", "zzz", "azb",
      "abcabc", "éaé", "xabcx", "bcbc").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
      .repartition(2) // defeat ConvertToLocalRelation so codegen runs
    val got = words.select(col("id"),
        graft.expressions.SubwordGreedyEncode.encode(
          col("w"), vocab.toMap, 3).as("native"),
        graft.operators.Subword.encodeWordHof(col("w"), vocab, 3).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id=${r.getLong(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
    // null word -> null on both paths (transform lambda over a null
    // element; the HOF aggregate over sequence(1, null) is null)
    val nulls = Seq(Tuple1(Option.empty[String])).toDF("w").repartition(2)
      .select(
        graft.expressions.SubwordGreedyEncode.encode(
          col("w"), vocab.toMap, 3).as("native"),
        graft.operators.Subword.encodeWordHof(col("w"), vocab, 3).as("hof"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("subword_greedy_walk equals the aggregate-HOF walk over the " +
      "materialized position map, including null-map and empty words") {
    // pmap built from a real vocab via the join path's own aggregates
    // would be integration, not unit — construct maps directly.
    val pmapT = "map<int,struct<l:int,vid:int>>"
    val df = Seq(
      (1L, "abcab", Map(1 -> (3, 7), 4 -> (2, 2))),  // abc, ab
      (2L, "abcab", Map(2 -> (2, 9))),               // -1, bc, -1, -1
      (3L, "xyz", Map.empty[Int, (Int, Int)]),       // all UNK
      (4L, "", Map(1 -> (1, 0)))                     // empty word
    ).toDF("id", "w", "pm0")
      .withColumn("pm", col("pm0").cast(pmapT))
      .repartition(2) // defeat ConvertToLocalRelation so codegen runs
    val got = df.select(col("id"),
        graft.expressions.SubwordGreedyWalk.walk(col("w"), col("pm"))
          .as("native"),
        graft.operators.Subword.walkHof(col("w"), col("pm")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id=${r.getLong(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
    // null map (left-join miss) -> all-UNK on both paths; null word -> null
    val edge = Seq((1L, "ab")).toDF("id", "w").repartition(2)
      .withColumn("pm", lit(null).cast(pmapT))
      .select(
        graft.expressions.SubwordGreedyWalk.walk(col("w"), col("pm"))
          .as("native"),
        graft.operators.Subword.walkHof(col("w"), col("pm")).as("hof"),
        graft.expressions.SubwordGreedyWalk.walk(
          lit(null).cast("string"), col("pm")).as("nw"))
      .collect().head
    assert(edge.getSeq[Int](0) == Seq(-1, -1) &&
      edge.getSeq[Int](1) == Seq(-1, -1) && edge.isNullAt(2))
  }

  test("hashed_shingles equals the HOF shingle+xxhash64+sort chain") {
    val texts = Seq("", "   ", "one", "one two", "one two three",
      "a a a a a", "The QUICK  brown\tfox jumps", "x y z x y z x y",
      "único café naïve test case")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(2)
    for (n <- Seq(1, 3)) {
      val hof = array_sort(transform(
        TextFunctions.shingles(col("text"), n), s => xxhash64(s)))
      val got = df.select(col("id"),
          graft.expressions.HashedShingles.shingles(col("text"), n).as("native"),
          hof.as("hof"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)} n=$n")
      }
    }
  }

  test("shingles_in_hash_set: equal hash sets give equal expressions " +
      "(canonicalization) and rehydrate exactly the matching grams") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // Equality must be elementwise (Seq), not Array reference identity —
    // reference-based equals breaks expression canonicalization and
    // plan-cache matching for reused expressions.
    val child = Literal.create("one two three", org.apache.spark.sql.types.StringType)
    val e1 = graft.expressions.ShinglesInHashSet(child, 2, Seq(1L, 2L, 3L))
    val e2 = graft.expressions.ShinglesInHashSet(child, 2, Seq(1L, 2L, 3L))
    assert(e1 == e2 && e1.semanticEquals(e2) &&
      e1.canonicalized == e2.canonicalized)
    // round trip: winner hashes from the counting pass rehydrate their grams
    val texts = Seq("one two three", "two three four", "unrelated words here")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val winner = texts
      .select(explode(graft.expressions.HashedShingles.shingles(col("text"), 2)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") === 2).collect().map(_.getLong(0)) // "two three" in docs 0,1
    val grams = texts.select(explode(
        graft.expressions.HashedShingles.shinglesInSet(col("text"), 2, winner)).as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(grams == Seq("two three", "two three"))
  }

  test("minhash_sig_hashed: signature of hashed shingles is deterministic " +
      "and k-wide") {
    val sig = docs.select(
        graft.expressions.MinHashSig.minhashSigFromHashes(
          graft.expressions.HashedShingles.shingles(col("text"), 3), 16).as("a"),
        graft.expressions.MinHashSig.minhashSigFromHashes(
          graft.expressions.HashedShingles.shingles(col("text"), 3), 16).as("b"))
      .collect()
    assert(sig.forall(r => r.getSeq[Long](0).length == 16))
    assert(sig.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("stopword_hits equals the size(filter(tokens, isin)) HOF formulation") {
    val texts = Seq("", "the quick brown fox", "THE THE the of of and",
      "no stop words here?!", "el la de und der le et the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(2)
    val words = TextFunctions.StopEn
    val hof = size(filter(TextFunctions.tokens(col("text")),
      t => t.isin(words: _*)))
    val got = df.select(col("id"),
        graft.expressions.StopwordHits.hits(
          TextFunctions.tokens(col("text")), words).as("native"),
        hof.as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}")
    }
  }

  test("text_profile fields equal the legacy per-metric column compositions") {
    val texts = Seq("", "   ", "\t", "the quick brown fox jumps over it",
      "no stops !!??!! ###", "el la de que y en los se",
      "der und die das ist", "le la et les des", "la la la",
      "word " * 10 + "the of and", "x", "a_b_c d_e_f!!!",
      "único café naïve ÄÖÜ test the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(2)
    val t = col("text")
    val p = graft.expressions.TextProfile.profile(t)
    val rows = df.select(col("id"),
        p.getField("n_tokens"), TextFunctions.tokenCount(t),
        p.getField("punct_ratio"), TextFunctions.punctRatio(t),
        p.getField("stop_ratio"), TextFunctions.stopwordRatio(t, TextFunctions.StopEn),
        p.getField("avg_token_len"), TextFunctions.avgTokenLen(t),
        p.getField("quality"), TextFunctions.qualityScore(t),
        p.getField("lang"), TextFunctions.langId(t))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == r.getInt(2), s"n_tokens id=$id")
      assert(r.getDouble(3) == r.getDouble(4), s"punct id=$id")
      assert(r.getDouble(5) == r.getDouble(6), s"stop id=$id")
      assert(r.getDouble(7) == r.getDouble(8), s"avgLen id=$id")
      assert(r.getInt(9) == r.getInt(10), s"quality id=$id")
      assert(r.getString(11) == r.getString(12), s"lang id=$id")
    }
  }

  test("ngram_rep_packed equals the explode + two-hash-aggregation composition " +
      "on edge and repetition fixtures") {
    val texts = Seq(
      "", "   ", "\t", "x", "one",                    // <2 tokens → (1,1)
      "a b", "a a", "a a a a a",                      // tiny/degenerate grams
      "the cat sat on the mat the cat sat again",     // repeated 2-gram
      ("buy now " * 30).trim,                         // heavy repetition
      "every gram here is completely unique text ok", // all-distinct grams
      "único café único café naïve ÄÖÜ test",         // unicode pairs
      "A B a b A B")                                  // case-folding collisions
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(2)
    val toks = TextFunctions.tokens(col("text"))
    val grams = when(size(toks) < 2, array(array_join(toks, " ")))
      .otherwise(TextFunctions.ngramStrings(toks, 2))
    val legacy = df.select(col("id"), explode(grams).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_grams"), max(col("c")).as("top_count"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val native = df.select(col("id"),
        graft.expressions.NgramRepPacked.packed(col("text")).as("p"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1) >>> 32, r.getLong(1) & 0xffffffffL))
      .toMap
    assert(native == legacy)
    // null text → null packed (callers reproduce the explode-drop with
    // an isNotNull filter; the expression itself must not invent (1,1))
    val withNull = Seq((0L, "a b"), (1L, null))
      .toDF("id", "text").repartition(2)
      .select(col("id"), graft.expressions.NgramRepPacked.packed(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(withNull == Map(0L -> false, 1L -> true))
  }

  test("projection with the custom expressions stays in whole-stage codegen") {
    val df = docs.select(
      SimHash64.simhash64(TextFunctions.tokens(col("text"))).as("sh"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen'd operators in this format
    assert(plan.contains("*(1) Project [simhash64"), s"plan:\n$plan")
    val df2 = docs.select(
      graft.expressions.NgramRepPacked.packed(col("text")).as("p"))
    df2.collect()
    val plan2 = df2.queryExecution.executedPlan.toString
    assert(plan2.contains("*(1) Project [ngram_rep_packed"), s"plan:\n$plan2")
  }

  test("bloom_might_contain: codegen equals interpreted, no false negatives") {
    import graft.expressions.BloomMightContain
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 500L).foreach(i => bf.putLong(i * 37L))
    val bytes = BloomMightContain.serialize(bf)
    val ids = (0 until 1000).map(i => i.toLong * 37L) ++
      (0 until 1000).map(i => i.toLong * 37L + 1L)
    val df = ids.toDF("h").repartition(3)
    val got = df
      .select(col("h"), BloomMightContain.mightContain(col("h"), bytes).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // no false negatives: every inserted hash answers true
    (0L until 500L).foreach(i => assert(got(i * 37L), s"false negative at $i"))
    // interpreted path agrees with the codegen'd projection
    ids.foreach { h =>
      assert(got(h) == bf.mightContainLong(h), s"codegen/driver mismatch at $h")
    }
    // the bitset must not leak into plan strings
    val plan = df.select(BloomMightContain.mightContain(col("h"), bytes))
      .queryExecution.analyzed.toString
    assert(plan.contains("bytes>"), plan)
    assert(plan.length < 10000, s"plan string embeds the filter: ${plan.length}")
  }

  test("bloom_might_contain: content equality + analysis-time type check") {
    import graft.expressions.BloomMightContain
    import org.apache.spark.util.sketch.BloomFilter
    def mkBytes(): Array[Byte] = {
      val bf = BloomFilter.create(100, 0.01)
      (0L until 50L).foreach(bf.putLong)
      BloomMightContain.serialize(bf)
    }
    // Two filters built identically serialize to equal-content but
    // DISTINCT arrays: expression equality must compare contents, or
    // Catalyst canonicalization (subexpression elimination, exchange
    // reuse) never matches two semantically identical probes.
    val (b1, b2) = (mkBytes(), mkBytes())
    assert(!(b1 eq b2) && java.util.Arrays.equals(b1, b2))
    val child = org.apache.spark.sql.GraftBridge.expression(col("h"))
    val (e1, e2) = (graft.expressions.BloomMightContain(child, b1),
      graft.expressions.BloomMightContain(child, b2))
    assert(e1 == e2, "content-equal filters must compare equal")
    assert(e1.hashCode == e2.hashCode)
    // A non-long child must fail ANALYSIS, not die per-row at runtime.
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("s")
        .select(BloomMightContain.mightContain(col("s"), b1))
        .collect()
    }
    assert(bad.getMessage.toLowerCase.contains("long"), bad.getMessage)
  }

  test("nfc_normalize: codegen equals kernel; composed/decomposed agree; " +
    "canonicalize hand cases") {
    import graft.expressions.NfcNormalize
    // Decomposed e + COMBINING ACUTE (U+0301) must compose to U+00E9
    // through the generated code path (repartition defeats
    // local-relation folding).
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val df = Seq(
      (0L, decomposed), (1L, composed), (2L, "plain ascii"),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "text").repartition(2)
    val got = df.select(col("id"), NfcNormalize.nfc(col("text")).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(0L) == composed, s"composed: ${got(0L)}")
    assert(got(1L) == composed)
    assert(got(2L) == "plain ascii")
    assert(got(3L) == null)
    // canonicalize: control chars to spaces, runs collapsed, trimmed,
    // NFC applied — one hand-computed case covering all four.
    val c = Seq(Tuple1("  a b\t\u0000\tcafe\u0301   x  "))
      .toDF("t").repartition(2)
      .select(TextFunctions.canonicalize(col("t"))).collect().head.getString(0)
    assert(c == s"a b $composed x", s"got <$c>")
  }
}
