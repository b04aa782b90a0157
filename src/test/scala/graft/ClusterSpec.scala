package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cluster, CorpusStats}

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated groups on orthogonal axes, plus one exact dup (11
  // of 10) and one near-dup (12 of 10, tiny perturbation) inside group B.
  // Group A hugs e1, group B hugs e2 — any sane 2-means split recovers it.
  private def vec(axis: Int, eps: Float): Array[Float] = {
    val a = Array.fill(8)(0.0f)
    a(axis) = 1.0f
    a((axis + 4) % 8) = eps
    a
  }
  private lazy val emb = Seq(
    (0L, vec(0, 0.00f)), (1L, vec(0, 0.01f)), (2L, vec(0, 0.02f)),
    (10L, vec(2, 0.00f)), (11L, vec(2, 0.00f)), (12L, vec(2, 0.001f)),
    (13L, vec(2, 0.40f))).toDF("vec_id", "embedding")

  test("lloydKMeans recovers planted separation, deterministically") {
    val got = Cluster.lloydKMeans(emb, col("vec_id"), col("embedding"),
        k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // Group membership: all of 0-2 together, all of 10-13 together,
    // and apart from each other.
    assert(Set(got(0L), got(1L), got(2L)).size == 1)
    assert(Set(got(10L), got(11L), got(12L), got(13L)).size == 1)
    assert(got(0L) != got(10L))
    val again = Cluster.lloydKMeans(emb, col("vec_id"), col("embedding"),
        k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == again)
  }

  test("semanticDedup: within-cluster dups share a min-id root; keep flags") {
    val got = Cluster.semanticDedup(emb, col("vec_id"), col("embedding"),
        k = 2, iters = 2, threshold = 0.999)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // 10, 11 (exact dup), 12 (near-dup) collapse to root 10; 13 is far
    // (cos(10,13) = 1/sqrt(1.16) ≈ 0.93 < 0.999) and keeps itself.
    assert(got(10L) == (10L, true))
    assert(got(11L) == (10L, false))
    assert(got(12L) == (10L, false))
    assert(got(13L) == (13L, true))
    // Group A at threshold 0.999: 0 vs 1 differ by the eps component
    // (cos ≈ 0.99995) — still a dup; all three collapse to 0.
    assert(got(0L)._1 == 0L)
    assert(!got(1L)._2 && got(1L)._1 == 0L)
    assert(got.size == 7)
  }

  test("two-level with one cell IS flat k-means, relabeled 1:1") {
    // k1 = 1 collapses the coarse level to a single cell, so the fine
    // pass runs the flat schedule (same init rule, rounding, ties) over
    // the whole corpus: labels must match lloydKMeans(k = k2) exactly
    // (cell 0 ⇒ cluster = fl). This is the exactness gate that lets the
    // two-level path claim the SAME semantics as the oracle-checked
    // flat path, not merely similar clustering.
    val flat = Cluster.lloydKMeans(emb, col("vec_id"), col("embedding"),
        k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val two = Cluster.lloydKMeansTwoLevel(emb, col("vec_id"), col("embedding"),
        k1 = 1, k2 = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(flat == two)
    val dedupFlat = Cluster.semanticDedup(emb, col("vec_id"),
        col("embedding"), k = 2, iters = 2, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    val dedupTwo = Cluster.semanticDedupTwoLevel(emb, col("vec_id"),
        col("embedding"), k1 = 1, k2 = 2, iters = 2, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(dedupFlat == dedupTwo)
  }

  test("two-level refines within cells deterministically") {
    // k1 = 2 separates the axis groups (as the flat test proves);
    // k2 = 2 then splits within each cell. Cross-cell structure must
    // be preserved: no label is shared across the two axis groups.
    val got = Cluster.lloydKMeansTwoLevel(emb, col("vec_id"), col("embedding"),
        k1 = 2, k2 = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val groupA = Set(0L, 1L, 2L).map(got)
    val groupB = Set(10L, 11L, 12L, 13L).map(got)
    assert(groupA.intersect(groupB).isEmpty)
    val again = Cluster.lloydKMeansTwoLevel(emb, col("vec_id"), col("embedding"),
        k1 = 2, k2 = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == again)
    // Dedup over the two-level labels still collapses the planted dups
    // (10/11/12 hug the same axis — they stay co-celled, and SemDeDup
    // only ever claims within-cluster recall).
    val dd = Cluster.semanticDedupTwoLevel(emb, col("vec_id"),
        col("embedding"), k1 = 2, k2 = 2, iters = 2, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(dd(10L) == (10L, true))
    assert(dd(11L) == (10L, false))
  }

  test("vocabGrowth: novel counts and cumulative vocab in doc order") {
    val docs = Seq(
      (0L, "a b b c"),   // novel: a b c        → vocab 3
      (1L, "b c d"),     // novel: d            → vocab 4
      (2L, "a b c d"),   // novel: none         → vocab 4
      (3L, "e e e")      // novel: e            → vocab 5
    ).toDF("doc_id", "text")
    val got = CorpusStats.vocabGrowth(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 3L, 3L), (1L, 1L, 4L), (2L, 0L, 4L),
      (3L, 1L, 5L)))
  }

  test("ngramNovelty: first-occurrence shares per doc, short-doc whole-text shingle") {
    val docs = Seq(
      (0L, "a b c d"),       // shingles {abc, bcd} — both novel → 2/2
      (1L, "a b c e"),       // {abc, bce} — abc seen → 1/2
      (2L, "a b c d"),       // {abc, bcd} — none novel → 0/2
      (3L, "x y")            // < 3 tokens → single whole-text shingle, novel
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(docs, col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 2L, 2L, 1.0), (1L, 2L, 1L, 0.5),
      (2L, 2L, 0L, 0.0), (3L, 1L, 1L, 1.0)))
  }

  test("profileTable: per-column nulls, exact distincts, numeric-only min/max") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("x")),
      (Some(1L), None, Some("y")),
      (Some(3L), Some(-1.0), None),
      (None, Some(2.5), Some("x")))
      .toDF("k", "v", "s")
    val got = CorpusStats.profileTable(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, Some(1.0), Some(3.0)),
      ("s", 4L, 1L, 2L, None, None),
      ("v", 4L, 1L, 2L, Some(-1.0), Some(2.5))))
  }

  test("profileTable: dotted column names profile as columns, not field paths") {
    // Columns are addressed by attribute, so a legal name containing a
    // dot must not be parsed as a nested-field reference.
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(5L), "a"))
      .toDF("a.b", "c.d")
    val got = CorpusStats.profileTable(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got == Seq(
      ("a.b", 3L, 1L, 2L, Some(1.0), Some(5.0)),
      ("c.d", 3L, 0L, 2L, None, None)))
  }

  test("embeddingAudit flags null / bad-dim / NaN / zero-norm vectors") {
    val rows: Seq[(Long, Int, Option[Array[Float]])] = Seq(
      (0L, 0, Some(Array(3.0f, 4.0f))),            // norm 5
      (1L, 0, Some(Array(0.0f, 0.0f))),            // zero norm
      (2L, 0, Some(Array(1.0f, Float.NaN))),       // non-finite
      (3L, 0, Some(Array(1.0f, 2.0f, 2.0f))),      // bad dim, norm 3
      (4L, 0, None),                               // null vector
      (5L, 1, Some(Array(0.0f, 1.0f))))            // clean, other label
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = CorpusStats.embeddingAudit(df, col("label"), col("embedding"),
        expectedDim = 2)
      .orderBy("group").collect()
    val l0 = got(0)
    assert(l0.getInt(0) == 0 && l0.getLong(1) == 5)        // n
    assert(l0.getLong(2) == 1)                             // n_null
    assert(l0.getLong(3) == 1)                             // n_bad_dim
    assert(l0.getLong(4) == 1)                             // n_nonfinite
    assert(l0.getLong(5) == 1)                             // n_zero_norm
    // Norm stats cover only the valid population {5.0, 0.0, 3.0} — the
    // NaN row is excluded (it would otherwise poison all three).
    assert(l0.getDouble(6) == 0.0)                         // min_norm
    assert(l0.getDouble(7) == 5.0)                         // max_norm
    assert(l0.getDouble(8) == 2.666667)                    // mean_norm
    val l1 = got(1)
    assert(l1.getInt(0) == 1 && l1.getLong(1) == 1 && l1.getDouble(8) == 1.0)
  }
}
