package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact linear scan — one broadcast of the query
  *     vector, one pass, TakeOrderedAndProject top-k. This IS the right
  *     plan for single queries even at 100 TB (embarrassingly parallel,
  *     no shuffle of the corpus).
  *   - [[lshTopK]]: random-hyperplane bucketed scan for repeated/batch
  *     queries — corpus pre-bucketed once; a query probes only buckets
  *     within small Hamming distance of its own bucket, scanning a
  *     fraction of the corpus at some recall cost.
  */
object Similarity {

  /** Exact top-k by cosine against one query vector (a 1-row DataFrame
    * with column `qv`). Ordering uses the score rounded to 4 dp with id
    * tie-break so results are deterministic across engines and partition
    * orders. Output: (id, sim). */
  def bruteForceTopK(
      corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int): DataFrame =
    Dedup.spread(corpus).select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
      .crossJoin(broadcast(
        query.withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 4))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
      .select(col("id"), col("sim"))

  /** Batch exact top-k: every query row against the whole corpus (small
    * query set broadcast). Per-query top-k runs through the custom
    * [[graft.plans.GroupTopK]] operator — partial bounded heaps on the
    * map side, so the shuffle carries ≤k candidates per (query,
    * partition) instead of every |corpus|·|queries| scored row; the
    * row_number window that assigns `rank` only ever sees the ≤k
    * survivors per query. Output: (query_id, id, sim, rank). */
  def bruteForceTopKBatch(
      corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int): DataFrame = {
    val c = Dedup.spread(corpus).select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
    val q = queries.select(qid.cast("long").as("query_id"), qvec.as("qv"))
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 4))
    val top = graft.plans.GroupTopK.topK(scored,
      Seq(col("query_id")), Seq(col("sim").desc, col("id").asc), k)
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("id"), col("sim"), col("rank"))
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * `k` most-similar corpus vectors with a DIFFERENT label — the
    * near-the-margin negatives that actually move an embedding model,
    * versus random negatives a batch sampler would draw. `anchors` is
    * (query_id, qv, qlabel); same-id and same-label rows are excluded
    * before scoring. Output: (anchor_id, rank, neg_id, neg_label, sim),
    * deterministic by the 4-dp-rounded score with id tie-break.
    *
    * Scale shape: [[bruteForceTopKBatch]]'s — the anchor set broadcasts
    * (the batch being mined, parameter-sized), the corpus streams past
    * it once, the label predicate prunes before the dot product, and
    * the custom [[graft.plans.GroupTopK]] bounded heaps keep the
    * shuffle at ≤k rows per (anchor × partition). At billion-vector
    * scale, swap the exhaustive scan for an ANN shortlist
    * ([[projectedTopK]] / [[pqTopK]] with k' ≫ k, or [[ivfTopKBatch]]
    * over the durable posting lists for a whole anchor batch in one
    * partition-pruned plan) and apply the same label-filter + exact
    * rerank to the shortlist — the contract (exact top-k among
    * differently-labeled) then degrades to the index's recall, which
    * is why the exhaustive form stays the gate. */
  def hardNegatives(
      corpus: DataFrame, id: Column, vec: Column, label: Column,
      anchors: DataFrame, k: Int): DataFrame = {
    val c = Dedup.spread(corpus).select(id.cast("long").as("id"),
        vec.as("v"), label.as("neg_label"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
    val q = anchors
      .select(col("query_id").cast("long").as("anchor_id"), col("qv"),
        col("qlabel"))
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("anchor_id") &&
        col("neg_label") =!= col("qlabel"))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) /
          (col("nrm") * col("qnrm")), 4))
    val top = graft.plans.GroupTopK.topK(scored,
      Seq(col("anchor_id")), Seq(col("sim").desc, col("id").asc), k)
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(desc("sim"), asc("id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("anchor_id"), col("rank"), col("id").as("neg_id"),
        col("neg_label"), col("sim"))
  }

  /** [[hardNegatives]] through an ANN shortlist — the billion-vector
    * form that method's scaladoc names: score anchors against the
    * corpus in [[randomProjection]]'s outDim-double space, keep the
    * `shortlist` best candidates per anchor (bounded GroupTopK heaps),
    * then rerank ONLY the shortlist with exact full-dimension cosine
    * and emit the top `k`. Identical output contract to
    * [[hardNegatives]]: (anchor_id, rank, neg_id, neg_label, sim).
    *
    * Completeness gate (the [[projectedTopK]] / pqTopK discipline):
    * the self- and label-inequality filters run BEFORE the shortlist
    * heap, so `shortlist ≥ |corpus|` admits every eligible row and the
    * rerank degenerates to [[hardNegatives]] EXACTLY — that equality
    * is spec-gated; a fixed shortlist trades recall for the bandwidth
    * cut and is recall-floor-gated instead (q186).
    *
    * Scale shape: the scan side touches outDim doubles per row (the
    * inDim/outDim bandwidth cut — 96× on a 1536-dim production
    * embedding at outDim 16) plus the label byte; the anchor batch
    * (projected once, parameter-sized) broadcasts; the shortlist
    * shuffle is ≤ shortlist rows per (anchor × partition) through the
    * bounded heaps; the full-dimension rerank reads |anchors|·shortlist
    * corpus rows via a broadcast id semi-join — parameter-sized by
    * design (k' ≪ corpus; the corpus-sized shortlist exists only as
    * the test-scale exactness gate). Wrong-dimension corpus rows
    * project to null and sort after every real candidate in the
    * shortlist stage. */
  def hardNegativesShortlist(
      corpus: DataFrame, id: Column, vec: Column, label: Column,
      anchors: DataFrame, k: Int, inDim: Int, outDim: Int,
      shortlist: Int, seed: String = "rp"): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val c = Dedup.spread(corpus).select(id.cast("long").as("id"),
        vec.as("v"), label.as("neg_label"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
    val q = anchors
      .select(col("query_id").cast("long").as("anchor_id"), col("qv"),
        col("qlabel"))
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
      .withColumn("pq", projectedVec(col("qv"), inDim, outDim, seed))
    // pv/pq are array<double> — the HOF fold, not the float-only
    // native FloatVecDot expression (projectedTopK's convention).
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
    val scoredP = c
      .withColumn("pv", projectedVec(col("v"), inDim, outDim, seed))
      .crossJoin(broadcast(q.select(col("anchor_id").as("__aid"),
        col("pq"), col("qlabel").as("__ql"))))
      .filter(col("id") =!= col("__aid") && col("neg_label") =!= col("__ql"))
      .withColumn("psim", ddot(col("pv"), col("pq")) /
        (sqrt(ddot(col("pv"), col("pv"))) * sqrt(ddot(col("pq"), col("pq")))))
    val short = graft.plans.GroupTopK.topK(scoredP,
        Seq(col("__aid")), Seq(col("psim").desc, col("id").asc), shortlist)
      .select(col("__aid").as("anchor_id"), col("id"))
    // Self/label exclusions already ran BEFORE the shortlist heap (the
    // completeness-gate property), so the shared tail skips them.
    rerankShortlist(c,
      q.select(col("anchor_id"), col("qv"), col("qlabel"), col("qnrm")),
      short, k, shortlist, filterLabels = false)
  }

  /** [[hardNegatives]] mined through a DURABLE IVF index — the actual
    * 100 TB shape the scaladocs above name: the shortlist comes from
    * ONE [[ivfTopKBatch]] plan over [[loadIvfIndex]]'s handle (whole
    * anchor batch, partition-pruned to the probed stripes, bounded
    * heaps), then the [[hardNegativesShortlist]] tail — exact
    * full-dimension rerank with the label filter — runs on the
    * parameter-sized shortlist. Identical output contract:
    * (anchor_id, rank, neg_id, neg_label, sim).
    *
    * Label semantics differ from [[hardNegativesShortlist]] BY
    * CONSTRUCTION and deliberately: the durable index stores (id, v,
    * list) only — no label column to filter on before the heap (the
    * FAISS convention: payload lookup joins the shortlist by id) — so
    * the label filter runs on the SHORTLIST, and an anchor crowded by
    * same-label neighbors can surface fewer than k negatives at small
    * `shortlist`. Oversample (`shortlist` ≫ k) to compensate; with
    * `nProbe` = nLists and `shortlist` ≥ |corpus| every eligible pair
    * survives to the rerank and the output degenerates to
    * [[hardNegatives]] EXACTLY (the q195 completeness gate); a finite
    * shortlist is recall-floor-gated like q186.
    *
    * Scale shape: one partition-pruned index scan + broadcast
    * equi-join for the whole batch (never a job per anchor), a
    * ≤ shortlist-per-(anchor × partition) heap shuffle, and a rerank
    * that reads |anchors|·shortlist corpus rows via the same
    * product-gated broadcast semi-join as [[hardNegativesShortlist]].
    * The corpus frame supplies vectors AND labels only for shortlist
    * survivors. */
  def hardNegativesAnn(
      centroids: Array[Array[Float]], indexed: DataFrame,
      corpus: DataFrame, id: Column, vec: Column, label: Column,
      anchors: DataFrame, k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val short = ivfTopKBatch(centroids, indexed,
        anchors.select(col("query_id"), col("qv")),
        col("query_id"), col("qv"), k = shortlist, nProbe = nProbe)
      .select(col("query_id").as("anchor_id"), col("id"))
    val c = Dedup.spread(corpus).select(id.cast("long").as("id"),
        vec.as("v"), label.as("neg_label"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
    val q = anchors
      .select(col("query_id").cast("long").as("anchor_id"), col("qv"),
        col("qlabel"))
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
    // The index-served shortlist is label-blind, so the shared tail
    // applies the self/label exclusions at the rerank.
    rerankShortlist(c, q, short, k, shortlist, filterLabels = true)
  }

  /** The shared exact-rerank tail of [[hardNegativesShortlist]] and
    * [[hardNegativesAnn]] — ONE definition, so the "identical output
    * contract" the mining forms promise cannot drift apart: gate the
    * |anchors|×shortlist id frame's broadcast on the PRODUCT
    * (driver-safe by construction; the anchor count is one cheap job
    * on the parameter-sized anchor frame, making the gate honest
    * rather than assumed; oversized batches fall through to the
    * optimizer's stats decision — a forced hint there would bypass
    * autoBroadcastJoinThreshold and pressure the driver), join the
    * shortlist survivors back to the full-dimension corpus and the
    * broadcast anchor frame, optionally re-apply the self/label
    * exclusions (the ANN path must — its shortlist came from a
    * label-blind index; the projected path already filtered BEFORE its
    * heap), score with the exact 4-dp cosine, and emit the top-k per
    * anchor through the bounded GroupTopK heaps. Inputs: `c` =
    * (id, v, neg_label, nrm), `q` = (anchor_id, qv, qlabel, qnrm),
    * `short` = (anchor_id, id). */
  private def rerankShortlist(
      c: DataFrame, q: DataFrame, short: DataFrame,
      k: Int, shortlist: Int, filterLabels: Boolean): DataFrame = {
    val nAnchors = q.count()
    val shortSide =
      if (nAnchors * shortlist.toLong <= (1L << 20)) broadcast(short)
      else short
    val joined = c.join(shortSide, Seq("id"))
      .join(broadcast(q), Seq("anchor_id"))
    val eligible =
      if (filterLabels)
        joined.filter(col("id") =!= col("anchor_id") &&
          col("neg_label") =!= col("qlabel"))
      else joined
    val rescored = eligible.withColumn("sim", round(
      VectorFunctions.dot(col("v"), col("qv")) /
        (col("nrm") * col("qnrm")), 4))
    val top = graft.plans.GroupTopK.topK(rescored,
      Seq(col("anchor_id")), Seq(col("sim").desc, col("id").asc), k)
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(desc("sim"), asc("id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("anchor_id"), col("rank"), col("id").as("neg_id"),
        col("neg_label"), col("sim"))
  }

  /** Corpus bucketing for the LSH path: adds `bucket` (nBits-bit
    * hyperplane signature). For cross-session reuse, land it partitioned
    * by `bucket` exactly like [[writeIvfIndex]] lands posting lists —
    * the multi-probe filter ([[lshTopK]]'s Hamming ball) then prunes to
    * the probed bucket directories. */
  def bucketize(corpus: DataFrame, id: Column, vec: Column, nBits: Int): DataFrame =
    Dedup.spread(corpus).select(
      id.cast("long").as("id"), vec.as("v"),
      VectorFunctions.hyperplaneBucket(vec, nBits).as("bucket"))

  /** IVF index: k-means centroids trained on a bounded SAMPLE of the
    * corpus, every vector assigned to its nearest centroid (the
    * "inverted list" it lives in). [[writeIvfIndex]]/[[loadIvfIndex]]
    * are the durable form: posting lists land partitioned by `list`,
    * so at 100 TB each list is a partition-prunable stripe and probes
    * in later sessions never rescan the corpus.
    *
    * Sample fit is the scale design, not an approximation shortcut: the
    * centroid ESTIMATE converges with the sample (IVF quality needs
    * representative centroids, not centroids that saw every row — the
    * FAISS training convention), while the fit's per-iteration cost is
    * bounded by `fitSampleRows` instead of growing with the corpus. The
    * ASSIGNMENT pass still covers every vector — one broadcast-centroid
    * map pass, embarrassingly parallel. Corpora at or under
    * `fitSampleRows` fit on everything (sampling would only discard
    * signal). Returns (centroids, corpus+list).
    *
    * DETERMINISM: both the fit SAMPLE (the `fitSampleRows` smallest
    * (xxhash64(id), id) values — hash-ordered, unbiased, deterministic;
    * one TakeOrderedAndProject) and the fit itself ([[lloydFit]] —
    * the [[graft.operators.Cluster]] Lloyd discipline under IVF's
    * squared-L2 metric, sequential on the collected sample) are
    * independent of core count and partitioning — the init is
    * deterministic farthest-point (maximin), not a seeded sample.
    * Spark-ML KMeans is NOT: its k-means||
    * init and `.sample()`'s per-partition Bernoulli draws both change
    * with the partition layout even at a fixed seed, so the same build
    * on 8 vs 32 cores produced different centroids and flipped
    * partial-probe recall contracts across cluster shapes (the r16
    * q191 regression). The final corpus-wide assignment runs through
    * [[ivfAssign]] against the float-rounded centroids — the append
    * path's own definition, so a built row and an appended row can
    * never disagree on their list. `seed` is retained for source
    * compatibility; the deterministic schedule has no randomness to
    * seed (pinned in `IndexLifecycleSpec`: two sessions with different
    * shuffle-partition counts build bit-identical centroids and
    * assignments). */
  def ivfIndex(
      corpus: DataFrame, id: Column, vec: Column,
      nLists: Int, seed: Long = 42L,
      fitSampleRows: Long = 100000L): (Array[Array[Float]], DataFrame) = {
    val _ = seed // no randomness left to seed; see scaladoc
    val c = Dedup.spread(corpus).select(id.cast("long").as("id"), vec.as("v"))
    // The fit sample is the `fitSampleRows` smallest values of
    // (xxhash64(id), id) — one TakeOrderedAndProject (bounded
    // per-partition heaps), collected once. Ordering by the id's HASH
    // makes the bounded sample UNBIASED when ids correlate with ingest
    // time/source (the common production case — the fitSampleRows
    // oldest rows would train centroids that have never seen newer
    // data) while staying fully deterministic: the hash is a pure
    // function of the id, so the same corpus yields the same sample
    // under any partitioning (unlike `.sample()`'s per-partition
    // draws). fitSampleRows × d floats is the FAISS training-buffer
    // convention (training runs in memory on a bounded sample; only
    // assignment is distributed), and the collect is parameter-sized
    // by construction — size fitSampleRows to the driver (it bounds
    // BOTH the collect bytes and the sequential fit cost; see
    // [[lloydFit]]'s envelope). Driver-side re-sort by id makes the
    // init order explicit rather than plan-dependent.
    val bound = math.min(fitSampleRows, Int.MaxValue.toLong).toInt
    val sample = c.orderBy(xxhash64(col("id")), col("id")).limit(bound)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1).map(_._2)
    // Fail fast on a ragged corpus (one truncated embedding): the fit's
    // L2 kernels would otherwise silently score the common PREFIX — the
    // pqEncode width discipline, enforced at the one driver-side point
    // where every sampled width is in hand. (A ragged row OUTSIDE the
    // sample still assigns by prefix in ivfAssign — the upstream gate
    // is CorpusStats.embeddingAudit, as for zero norms in the PQ path.)
    sample.headOption.foreach { h =>
      val widths = sample.iterator.map(_.length).toSet
      require(widths.size == 1,
        s"ivfIndex: ragged embedding widths in the fit sample " +
          s"(${widths.toSeq.sorted.mkString(", ")}) — centroids would " +
          "silently train on the common prefix; fix the corpus " +
          s"(expected uniform width ${h.length})")
    }
    val centroids = lloydFit(sample, nLists, iters = 10)
    (centroids, ivfAssign(c, col("id"), col("v"), centroids))
  }

  /** Deterministic in-memory Lloyd fit for [[ivfIndex]] — the
    * [[graft.operators.Cluster.lloydKMeans]] schedule under IVF's
    * squared-L2 metric, run sequentially on the driver's bounded
    * sample (deterministic by construction: no partial aggregation, no
    * partitioning, no seed): init = FARTHEST-POINT (maximin) seeding —
    * start from the smallest-id vector, then repeatedly take the
    * sample vector farthest from its nearest chosen centroid
    * (smallest id on ties). Maximin is the deterministic stand-in for
    * k-means++'s spread (Gonzalez 1985 — public literature): k
    * smallest-id seeds can clump (ids carry no geometry), and clumped
    * seeds cost partial-probe recall — measured: smallest-id init put
    * q78's 3-of-8-probe recall at 0.4 on the sf0.1 fixture, under the
    * 0.5 contract floor; maximin holds the floor at every tested SF.
    * Then `iters` Lloyd rounds: assignment = plain-double L2 argmin
    * with lowest-index tie-break, recompute = component means rounded
    * to 6 dp (the [[graft.operators.Cluster]] rounding discipline —
    * and what keeps the persisted centroid table tidy). Clusters that
    * lose every member drop out (compacted); final list ids are
    * positions in the returned array. Centroids are float-rounded at
    * the end — the durable representation [[writeIvfIndex]] stores —
    * so the corpus assignment in [[ivfIndex]] scores against exactly
    * the bytes a fresh-session reload will. The fit's internal argmin
    * needs no cross-engine rounding (it never leaves the driver); the
    * ONE distributed assignment definition remains [[l2Assign]] via
    * [[ivfAssign]].
    *
    * ENVELOPE — the fit runs on the driver (that is what removes
    * partitioning from the answer), so `fitSampleRows` bounds driver
    * memory (sample·d doubles; ~50 MB at the 100k default × d=64,
    * ~1.2 GB at d=1536 — lower the bound for wide embeddings) and fit
    * cost (O(iters·sample·k·d) flops). The flops are DETERMINISTICALLY
    * PARALLEL (round 18): per-point work (distance updates, argmin
    * assignment) writes to disjoint per-point slots — schedule cannot
    * change a value — and every floating-point REDUCTION keeps the
    * sequential schedule's exact association (per-cluster sums
    * accumulate in sample order, parallelized ACROSS clusters; the
    * seeding argmax is a d-free sequential scan), so the parallel fit
    * is bit-identical to the single-threaded one (spec-gated) while
    * lifting the thousands-of-lists × wide-dim ceiling by the core
    * count. Size the sample by the FAISS training convention — roughly
    * 64–256 points per centroid — not by the corpus: 256·nLists points
    * train the same-quality centroids at any corpus size, and the
    * distributed [[ivfAssign]] pass is where the corpus actually gets
    * touched. A distributed fit stays off the table — partial
    * aggregation re-opens the r16 q191 class. */
  private def lloydFit(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Float]] =
    lloydFitImpl(sample, k, iters, parallel = true)

  /** `parallel = false` is the reference single-threaded schedule the
    * spec gates bit-equality against; both paths share every kernel —
    * the flag only chooses the driver loop. */
  private[graft] def lloydFitImpl(
      sample: Array[Array[Double]], k: Int, iters: Int,
      parallel: Boolean): Array[Array[Float]] = {
    require(sample.nonEmpty, "ivfIndex: no vectors to fit centroids on")
    val n = sample.length
    // Disjoint-slot parallel loop: each index writes only its own
    // state, so the ForkJoin schedule cannot affect any value.
    def foreachIdx(bound: Int)(f: Int => Unit): Unit =
      if (parallel)
        java.util.stream.IntStream.range(0, bound).parallel()
          .forEach(i => f(i))
      else { var i = 0; while (i < bound) { f(i); i += 1 } }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // Maximin seeding over the sample: O(k·|sample|·d) distance work in
    // the parallel per-point phase; the argmax (strict > : ties resolve
    // to the smallest index) is a d-free SEQUENTIAL scan of minD2, so
    // its tie-break order never depends on the schedule.
    val nSeeds = math.min(k, n)
    val seedIdx = new Array[Int](nSeeds)
    val minD2 = Array.fill(n)(Double.PositiveInfinity)
    seedIdx(0) = 0 // the smallest id (sample is id-sorted)
    var s = 1
    while (s < nSeeds) {
      val prev = sample(seedIdx(s - 1))
      foreachIdx(n) { i =>
        val d = d2(sample(i), prev)
        if (d < minD2(i)) minD2(i) = d
      }
      var best = -1; var bestD = -1.0; var i = 0
      while (i < n) {
        if (minD2(i) > bestD) { bestD = minD2(i); best = i }
        i += 1
      }
      seedIdx(s) = best
      s += 1
    }
    var cents: Array[Array[Double]] = seedIdx.map(i => sample(i).clone())
    val assign = new Array[Int](n)
    for (_ <- 1 to iters) {
      val d = cents.head.length
      val nC = cents.length
      // Phase 1 — assignment: pure per-point argmin (lowest index on
      // ties), the O(n·k·d) hot loop, embarrassingly parallel.
      foreachIdx(n) { p =>
        val x = sample(p)
        var best = 0; var bestD2 = Double.PositiveInfinity; var j = 0
        while (j < nC) {
          val cj = cents(j); var dd = 0.0; var i = 0
          val m = math.min(x.length, cj.length)
          while (i < m) { val t = x(i) - cj(i); dd += t * t; i += 1 }
          if (dd < bestD2) { bestD2 = dd; best = j }
          j += 1
        }
        assign(p) = best
      }
      // Phase 2 — recompute: each cluster sums ITS members in sample
      // order (the sequential schedule's exact float association),
      // parallelized across clusters — disjoint sums, fixed order.
      val sums = Array.fill(nC)(new Array[Double](d))
      val counts = new Array[Long](nC)
      foreachIdx(nC) { j =>
        val sj = sums(j); var p = 0
        while (p < n) {
          if (assign(p) == j) {
            val x = sample(p); var i = 0
            val m = math.min(x.length, d)
            while (i < m) { sj(i) += x(i); i += 1 }
            counts(j) += 1
          }
          p += 1
        }
      }
      cents = cents.indices.toArray.filter(counts(_) > 0L).map { j =>
        sums(j).map(s => BigDecimal(s / counts(j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    cents.map(_.map(_.toFloat))
  }

  /** Durable form of the IVF index — write once, probe across sessions.
    * The posting lists land as parquet PARTITIONED by `list` (each
    * inverted list is its own directory stripe), the centroids as a tiny
    * (list, centroid) table beside them. A reloaded probe's
    * `list IN (probes)` filter is then PARTITION PRUNING: the scan opens
    * only the `nProbe` probed directories and never touches the rest of
    * the corpus — the layout that makes IVF an index rather than a
    * filter (gated in `IndexLifecycleSpec`: probe ≡ same-session build
    * bit-equal, plan carries the partition filter). */
  /** Write-task fan-out for the cluster-before-write exchange (guide
    * §2.5: synthetic partitioning keys with too few distinct values):
    * `repartition(col)` hashes the stripe key into
    * spark.sql.shuffle.partitions buckets, and hash collisions hand one
    * task SEVERAL stripes — that task then opens its stripes' files
    * sequentially, so the straggler pays ~(stripes/tasks)× the per-file
    * writer cost (measured on the 254-stripe LSH write at sf0.1:
    * 3.9 s → 1.6 s by fanning to one task per stripe). One task per
    * stripe is the documented write discipline; this picks the
    * partition count to MATCH it: the stripe count, floored at the core
    * count (empty partitions cost ~nothing) and capped
    * (`graft.index.writeFanout.max`, default 4096) so a 65536-list
    * production index fans to a bounded task count of whole stripes.
    * Scale-adaptive by construction — derived from index geometry, not
    * a local-mode constant. */
  private def stripeFanout(
      spark: org.apache.spark.sql.SparkSession, nStripes: Long): Int = {
    val cap = spark.conf.getOption("graft.index.writeFanout.max")
      .flatMap(_.toIntOption).getOrElse(4096)
    math.max(spark.sparkContext.defaultParallelism,
      math.min(nStripes, cap.toLong).toInt)
  }

  /** Run INDEPENDENT index-artifact jobs concurrently (guide §2.6 —
    * actions are only sequential because the caller calls them
    * sequentially): the small-table writes beside a data write, or an
    * append's parameter-table loads beside its tombstone guard, each
    * pay a full job floor back to back when nothing orders them. Plain
    * `new Thread`s, NOT a pooled executor: Spark's job group /
    * description live in an InheritableThreadLocal, so threads created
    * HERE inherit the caller's group (Bench's watchdog can still
    * cancel these jobs) where a pool's pre-created threads would not.
    * First failure rethrown after all tasks settle — the completion-
    * marker discipline already treats ANY interruption between
    * clear-marker and write-marker as a must-rebuild, so concurrent
    * data writes do not widen a crash window. */
  private[operators] def inParallel(tasks: (() => Unit)*): Unit = {
    val errs = new Array[Throwable](tasks.size)
    // The active session is a ThreadLocal some analysis-time conf
    // lookups read — propagate the caller's into each worker thread.
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    val threads = tasks.zipWithIndex.map { case (t, i) =>
      new Thread(() => try {
        active.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
        t()
      } catch { case e: Throwable => errs(i) = e })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // Deterministic error precedence: the LOWEST-index failure is
    // thrown, so a caller's guard ordering (tombstone check before
    // live-id check) reads the same as the sequential form it replaced.
    errs.find(_ != null).foreach(e => throw e)
  }

  def writeIvfIndex(
      centroids: Array[Array[Float]], indexed: DataFrame,
      path: String): Unit = {
    val spark = indexed.sparkSession
    import spark.implicits._
    clearCompletionMarker(spark, path)
    // Cluster by the partition column before the partitioned write
    // (writeLshIndex's discipline): one task per stripe → one file per
    // stripe, instead of a file per (task × touched stripe). The two
    // data artifacts are independent — written concurrently
    // ([[inParallel]]); the tombstone seed and marker stay ordered
    // AFTER both (the crash discipline below).
    inParallel(
      () => indexed
        .repartition(stripeFanout(spark, centroids.length.toLong),
          col("list"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("list").parquet(s"$path/lists"),
      () => centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("list", "centroid")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/centroids"))
    // A fresh index has no deletions: stale tombstones from a previous
    // index at this path would silently hide rows of the NEW one. The
    // write SEEDS an empty tombstone table, so every load anti-joins
    // unconditionally — delete visibility can never depend on whether a
    // first delete happened to precede the load. Seeded AFTER the data
    // writes succeed: a crash mid-rebuild then leaves the OLD
    // tombstones over a broken data dir instead of freshly cleared
    // tombstones over the old data — which would silently resurrect
    // deleted rows. The remaining window (crash after the data writes
    // COMPLETE but before this seed: stale tombstones over a loadable
    // new index, silently hiding its rows) is closed by the completion
    // marker — cleared first above, re-created last below, required by
    // every later verb.
    seedEmptyTombstones(spark, path)
    writeCompletionMarker(spark, path)
  }

  /** Reload a [[writeIvfIndex]]-persisted index in (possibly) a fresh
    * session: (centroids ordered by list id, posting-list scan). The
    * centroid table is parameter-sized (`nLists` rows) — the only
    * driver-side collect. The posting-list frame is the partitioned
    * scan itself, not a cache: [[ivfTopK]]'s probe filter prunes to the
    * probed partitions, so steady-state probe cost is the probed lists'
    * bytes, independent of corpus size. */
  /** The write-completion marker: an empty file every `write*Index`
    * DELETES before its first artifact write and CREATES as its LAST
    * step (after the tombstone seed). Every later verb requires it
    * ([[requireIndexDir]]), which closes BOTH rebuild-crash windows at
    * once: a crash before the data writes finish leaves old tombstones
    * over broken data (loud anyway), and a crash AFTER the data writes
    * but before the tombstone seed leaves stale non-empty tombstones
    * over a complete, loadable new index — previously silent (rows of
    * the new index sharing ids with old tombstones were hidden on
    * every load), now a readable must-rebuild failure because the
    * marker was cleared first and never re-created. Compactions never
    * touch it ([[swapInPlace]] carries its own crash discipline). */
  private val CompletionMarker = "_GRAFT_INDEX_COMPLETE"

  private def markerPath(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/$CompletionMarker")

  /** First step of every index write: from here to
    * [[writeCompletionMarker]] the path is formally incomplete. */
  private def clearCompletionMarker(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val p = markerPath(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    ()
  }

  /** Last step of every index write — after the data artifacts AND the
    * tombstone seed, so its existence certifies the whole layout. */
  private def writeCompletionMarker(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val p = markerPath(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true)
      .close()
  }

  /** Readable failure for a wrong index path — a fresh-session user
    * otherwise gets a bare PATH_NOT_FOUND on an internal subdirectory —
    * and for an INCOMPLETE one (the [[CompletionMarker]] discipline):
    * missing directories mean the wrong path, a missing marker over
    * present directories means an interrupted write*Index (or an index
    * from before the marker format) — rebuild. */
  private def requireIndexDir(
      spark: org.apache.spark.sql.SparkSession,
      path: String, parts: Seq[String], kind: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val missing = parts.map(s => s"$path/$s").filterNot { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      p.getFileSystem(conf).exists(p)
    }
    require(missing.isEmpty,
      s"no $kind index at '$path': missing ${missing.mkString(", ")} — " +
        s"was write${kind}Index run against this filesystem?")
    require(markerPath(path).getFileSystem(conf).exists(markerPath(path)),
      s"$kind index at '$path' is INCOMPLETE: its directories exist " +
        s"but the completion marker does not — the write${kind}Index " +
        "run crashed before finishing (stale tombstones or partial " +
        "artifacts may sit over the data), or the index predates the " +
        s"marker format; rebuild with write${kind}Index")
  }

  def loadIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Array[Float]], DataFrame) = {
    requireIndexDir(spark, path, Seq("centroids", "lists"), "Ivf")
    (loadIvfCentroids(spark, path),
      withoutTombstones(spark, path, spark.read.parquet(s"$path/lists")))
  }

  /** ===== Deletion + compaction for the durable ANN indexes =====
    *
    * RTBF must reach the durable artifact, not just the corpus: a
    * vector deleted upstream ([[Dedup.deletionCascade]]'s class) would
    * otherwise keep being RETURNED by probes against a months-old
    * index, and its content-derived rows (the vector itself, its
    * codes, its bucket signature) would stay on disk indefinitely.
    * Two-phase, like every production vector store:
    *
    *   - [[deleteFromIvfIndex]]/[[deleteFromLshIndex]]/
    *     [[deleteFromPqIndex]] are the LOGICAL delete — ids append to a
    *     `tombstones` table beside the index, and every load path
    *     anti-joins it (broadcast: the tombstone set is bounded by
    *     delete-request volume between compactions — parameter-sized
    *     by the RTBF workload's nature, and reset by compaction).
    *     Immediate, cheap (one request-sized write), probe plans keep
    *     their partition pruning (the anti-join sits ABOVE the pruned
    *     scan and broadcasts, so the scan's distribution survives).
    *   - [[compactIvfIndex]]/[[compactLshIndex]]/[[compactPqIndex]] are
    *     the PHYSICAL erasure + layout reset: rewrite the data
    *     directory without the tombstoned rows (and without the
    *     append-accreted small files — each bucket/stripe comes back as
    *     one task's output), swap it in place, clear the tombstones.
    *     Run it when the tombstone set has grown past broadcast-cheap
    *     or the per-stripe file count degrades probe open times (the
    *     nightly-append accretion measured in `IndexAppendSweep`).
    *
    * Gates (`IndexLifecycleSpec`): post-delete probe ≡ probe against an
    * index REBUILT on the surviving corpus (same frozen centroids /
    * codebooks / nBits), compaction probe-bit-equal before/after with
    * the tombstone dir gone and per-stripe file counts reset.
    *
    * A tombstoned id stays deleted until compaction clears the
    * tombstones — re-ingesting it via an append path would land rows
    * every load anti-joins away, so the append verbs GUARD the edge
    * ([[requireNotTombstoned]]): appending a tombstoned id fails
    * readably, naming the compaction that makes it legal.
    *
    * Concurrency: delete-during-compaction is safe — compaction erases
    * only the tombstone FILES it snapshotted at start
    * ([[tombstoneFileSnapshot]]), so a tombstone appended mid-compaction
    * survives and keeps hiding its id. Two compactions of the SAME
    * index must not run concurrently (the swap-in-place rename window;
    * [[swapInPlace]] detects and names the interrupted state). */
  def deleteFromIvfIndex(
      ids: DataFrame, id: Column, path: String): Unit = {
    requireIndexDir(ids.sparkSession, path, Seq("centroids", "lists"), "Ivf")
    writeTombstones(ids, id, path)
  }

  /** [[deleteFromIvfIndex]]'s contract for the LSH lifecycle. */
  def deleteFromLshIndex(
      ids: DataFrame, id: Column, path: String): Unit = {
    requireIndexDir(ids.sparkSession, path, Seq("meta", "buckets"), "Lsh")
    writeTombstones(ids, id, path)
  }

  /** [[deleteFromIvfIndex]]'s contract for the PQ lifecycle. */
  def deleteFromPqIndex(
      ids: DataFrame, id: Column, path: String): Unit = {
    requireIndexDir(ids.sparkSession, path, Seq("codebooks", "codes"), "Pq")
    writeTombstones(ids, id, path)
  }

  /** Physical erasure + stripe compaction for a durable IVF index:
    * rewrite `lists` without tombstoned rows, one file per posting-list
    * stripe (the repartition-by-partition-column write discipline),
    * swap in place, clear tombstones. Probe-bit-equal before/after
    * (gated). */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    requireIndexDir(spark, path, Seq("centroids", "lists"), "Ivf")
    val snapshot = tombstoneFileSnapshot(spark, path)
    val survivors = withoutTombstones(
      spark, path, spark.read.parquet(s"$path/lists"))
    requireNonEmptySurvivors(survivors, path)
    swapInPlace(spark, s"$path/lists") { tmp =>
      survivors.repartition(
          stripeFanout(spark, loadIvfCentroids(spark, path).length.toLong),
          col("list"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("list").parquet(tmp)
    }
    clearSnapshottedTombstones(spark, path, snapshot)
  }

  /** [[compactIvfIndex]] for the LSH bucket stripes. */
  def compactLshIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    requireIndexDir(spark, path, Seq("meta", "buckets"), "Lsh")
    val snapshot = tombstoneFileSnapshot(spark, path)
    val survivors = withoutTombstones(
      spark, path, spark.read.parquet(s"$path/buckets"))
    requireNonEmptySurvivors(survivors, path)
    swapInPlace(spark, s"$path/buckets") { tmp =>
      survivors.repartition(
          stripeFanout(spark, 1L << loadLshNBits(spark, path)),
          col("bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("bucket").parquet(tmp)
    }
    clearSnapshottedTombstones(spark, path, snapshot)
  }

  /** [[compactIvfIndex]] for the PQ code table (unpartitioned — the ADC
    * scan's layout; compaction here is erasure + small-file merge). */
  def compactPqIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    requireIndexDir(spark, path, Seq("codebooks", "codes"), "Pq")
    val snapshot = tombstoneFileSnapshot(spark, path)
    val survivors = withoutTombstones(
      spark, path, spark.read.parquet(s"$path/codes"))
    requireNonEmptySurvivors(survivors, path)
    swapInPlace(spark, s"$path/codes") { tmp =>
      Dedup.spread(survivors)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    }
    clearSnapshottedTombstones(spark, path, snapshot)
  }

  /** A compaction whose survivor set is EMPTY would commit a data dir
    * with no parquet files (empty dynamic-partition writes emit
    * nothing) — the next load would fail schema inference with the
    * backup already deleted, bricking the index. Checked BEFORE any
    * mutation; `limit 1`-cheap. */
  private def requireNonEmptySurvivors(
      survivors: DataFrame, path: String): Unit =
    require(!survivors.isEmpty,
      s"compaction would EMPTY the index at '$path' — every row is " +
        "tombstoned, and an empty partitioned layout is unreadable. An " +
        "all-deleted index has nothing left to probe: delete the index " +
        "directory (or rebuild on a non-empty corpus) instead")

  /** Logical-delete write: request-sized, one file per delete batch. */
  private def writeTombstones(
      ids: DataFrame, id: Column, path: String): Unit =
    ids.select(id.cast("long").as("id")).distinct()
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/tombstones")

  /** Anti-join a data frame against the index's tombstones — THE one
    * definition every load path routes through, so a deleted id is
    * invisible to every probe form (single, batch, pruned) at once.
    * Broadcast by contract (see the deletion scaladoc). The exists
    * check only grandfathers indexes written before tombstone seeding;
    * current writers always seed, so loads always anti-join. Delete
    * VISIBILITY matches append visibility: a load (or a
    * [[graft.streaming.StreamingAnn.startRefreshing]] batch boundary)
    * after the delete sees it; a handle held from before is a
    * snapshot — its parquet file listings were frozen at load. */
  private def withoutTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String, df: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) df
    else df.join(tombstoneSide(spark, path), Seq("id"), "left_anti")
  }

  /** Hard cap (file bytes) on the FORCED tombstone broadcast. The hint
    * is deliberately forced, not left to autoBroadcastJoinThreshold:
    * the anti-join must broadcast to preserve the streamed side's
    * distribution (the exchange-free probe plans the durable layouts
    * exist for — plan-gated with the session threshold at −1), and
    * tombstones are request-sized between compactions BY CONTRACT. The
    * cap is the safety net past that contract: a months-un-compacted
    * delete stream degrades to the optimizer's stats decision (a
    * shuffled anti-join — slower, still correct) instead of failing
    * every load with driver/broadcast pressure. 32 MB of parquet longs
    * ≈ 4M deleted ids — far past the compaction knee and still an
    * order of magnitude inside driver headroom. */
  private[operators] val TombstoneBroadcastCapBytes: Long = 32L << 20

  /** The tombstone id frame as a JOIN SIDE, broadcast-gated on the
    * files' bytes (a driver-side listing — no job) against
    * [[TombstoneBroadcastCapBytes]]. Parquet bytes under-count the
    * in-memory relation, but by well under the order of magnitude the
    * gate is guarding against. Callers must have checked the directory
    * exists. */
  private def tombstoneSide(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tomb = spark.read.parquet(s"$path/tombstones").select(col("id"))
    val bytes = fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    if (bytes <= TombstoneBroadcastCapBytes) broadcast(tomb)
    else tomb
  }

  /** Fail an append that would re-ingest a TOMBSTONED id: the appended
    * rows would land in the data dir but every load anti-joins the
    * tombstones, so the id stays invisible to every probe until a
    * compaction clears it — a churn workflow (delete by mistake,
    * re-add) would lose the rows with no signal. One broadcast-sized
    * semi-join over the shard, paid per append; the error names the
    * compaction verb that makes the re-ingest legal. */
  private def requireNotTombstoned(
      shardIds: DataFrame, path: String, compactVerb: String): Unit = {
    val spark = shardIds.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val clash = shardIds.select(col("id"))
        .join(tombstoneSide(spark, path), Seq("id"), "left_semi")
        .limit(5).collect().map(_.getLong(0))
      require(clash.isEmpty,
        s"append would re-ingest tombstoned id(s) ${clash.mkString(", ")} " +
          s"at '$path' — a tombstoned id stays invisible to every probe " +
          s"until compaction clears the tombstones; run $compactVerb " +
          "first, then re-append")
    }
  }

  /** Past this many touched stripes the live-id guard scans the whole
    * id column instead of stripe-pruning: a 10⁴-entry `IN` literal
    * costs the plan more than the pruning saves, and a shard touching
    * that many stripes reads most of them anyway. */
  private val LiveGuardMaxStripes = 1024

  /** Fail an append whose shard contains an id ALREADY LIVE in the
    * index: `SaveMode.Append` is not atomic, so the realistic trigger
    * is a RETRIED partially-failed nightly append — re-running it
    * re-lands rows the first attempt already committed, after which
    * probes return the same id twice (two identical (sim, id) rows
    * enter the rerank and the GroupTopK heaps) with every gate green.
    * Tombstoned ids never reach this check ([[requireNotTombstoned]]
    * runs first and names the compaction), so any clash here is a
    * live duplicate. Cost: one semi-join of the existing rows' ID
    * COLUMN against the shard's ids — pruned to the stripes the shard
    * touches when the index is striped (`stripeFilter`, bounded by the
    * shard's list/bucket set), column-pruned to the id alone
    * otherwise. The error names the recovery: append exactly the
    * missing rows (anti-join the shard against the index's ids), or
    * delete + compact to replace. */
  private def requireNewIds(
      spark: org.apache.spark.sql.SparkSession, dataDir: String,
      stripeFilter: Option[Column], shardIds: DataFrame,
      verb: String): Unit = {
    val existing0 = spark.read.parquet(dataDir)
    val existing = stripeFilter.fold(existing0)(existing0.filter)
    val clash = existing.select(col("id"))
      .join(shardIds.select(col("id")), Seq("id"), "left_semi")
      .limit(5).collect().map(_.getLong(0))
    require(clash.isEmpty,
      s"$verb would duplicate LIVE id(s) ${clash.mkString(", ")}" +
        (if (clash.length == 5) ", …" else "") +
        s" already in the index at '$dataDir' — append ids must be NEW " +
        "(a retried partially-failed append is the usual cause; " +
        "SaveMode.Append is not atomic), else probes return the id " +
        "twice. Recover by appending only the missing rows (anti-join " +
        "the shard against the index's ids) or by deleting + " +
        "compacting the id first")
  }

  /** Written by every index write AND at the end of every compaction,
    * so the tombstone relation always EXISTS and is empty exactly when
    * there is nothing deleted: loads anti-join unconditionally, and
    * the first delete has the same visibility semantics as the
    * hundredth (without this, a handle loaded before the first delete
    * skipped the anti-join entirely). The Overwrite doubles as the
    * stale-tombstone reset. An empty parquet write emits one
    * schema-only file. */
  private def seedEmptyTombstones(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    spark.range(0).select(col("id"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/tombstones")

  /** The tombstone FILES present when a compaction starts — its
    * erasure scope. Compaction clears exactly this snapshot, never
    * "whatever is there at the end": a deleteFrom*Index tombstone
    * appended while the survivor rewrite runs lands as a NEW file the
    * snapshot doesn't cover, so it survives the compaction and keeps
    * hiding its id — instead of being silently discarded by a blanket
    * reset (the lost-delete race: the late delete's row would
    * resurrect in every later probe, an RTBF violation). A tombstone
    * appended between the snapshot and the survivor SCAN is both
    * applied and preserved — its id anti-joins rows already erased,
    * which is merely redundant. */
  private def tombstoneFileSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath).toSeq
  }

  /** Erase the snapshotted tombstone files (their ids are physically
    * gone from the rewritten data dir), preserving any file appended
    * since the snapshot. If no data file remains afterwards, an empty
    * seed is APPENDED (not overwritten — an overwrite would clobber a
    * delete racing this very step) so the relation stays readable and
    * loads keep anti-joining unconditionally. */
  private def clearSnapshottedTombstones(
      spark: org.apache.spark.sql.SparkSession, path: String,
      snapshot: Seq[org.apache.hadoop.fs.Path]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    snapshot.foreach(f => fs.delete(f, false))
    val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    if (!hasData)
      spark.range(0).select(col("id"))
        .coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$path/tombstones")
  }

  /** Rewrite a data directory in place via tmp-dir + two renames. The
    * new copy is FULLY written before the original moves, so no crash
    * window loses the index: interrupted before the first rename —
    * original intact, stray `<dir>__compact` cleaned on retry; between
    * the renames — original preserved at `<dir>__pre_compact` (the
    * require below names it on the next attempt; rename it back or
    * delete the partial state); after — only the stale pre-compact
    * copy remained and is deleted. */
  private def swapInPlace(
      spark: org.apache.spark.sql.SparkSession, dir: String)(
      writeTmp: String => Unit): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val cur = new org.apache.hadoop.fs.Path(dir)
    val fs = cur.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact")
    val old = new org.apache.hadoop.fs.Path(dir + "__pre_compact")
    require(!fs.exists(old),
      s"$old exists — a previous compaction was interrupted between " +
        s"renames; rename it back to $dir (if $dir is missing) or delete it")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    writeTmp(tmp.toString)
    require(fs.rename(cur, old), s"rename $cur -> $old failed")
    require(fs.rename(tmp, cur), s"rename $tmp -> $cur failed")
    fs.delete(old, true)
    ()
  }

  /** The parameter-sized artifact alone — what the APPEND path needs.
    * Constructing the posting-list frame just to discard it would pay
    * a recursive listing of every `list=` stripe (a cost that grows
    * with exactly the nightly file count appends create). */
  private def loadIvfCentroids(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Float]] =
    spark.read.parquet(s"$path/centroids")
      .select(col("list").cast("int"), col("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)

  /** Assign vectors to their nearest inverted list under FROZEN
    * centroids (squared-L2 argmin, 6-dp-rounded distance, lowest list
    * id on ties — the shared [[l2Assign]] definition): the growth half
    * of the IVF lifecycle. Production IVF grows exactly this way —
    * nightly vectors are assigned against the PERSISTED centroids (the
    * FAISS `add` path); re-training is a rebuild, not an append,
    * because new centroids re-shard every existing posting list. This
    * is THE assignment definition — [[ivfIndex]]'s build pass runs
    * through it against the same float-rounded centroids, so a built
    * row and an appended row are assigned bit-identically by
    * construction (no second code path to diverge from). Output:
    * (id, v, list) in [[writeIvfIndex]]'s layout. */
  def ivfAssign(
      vecs: DataFrame, id: Column, vec: Column,
      centroids: Array[Array[Float]]): DataFrame =
    Dedup.spread(vecs).select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("list", listAssignCol(col("v"), centroids))
      .select(col("id"), col("v"), col("list"))

  /** The inverted-list assignment EXPRESSION — [[ivfAssign]]'s body and
    * [[ivfPqEncode]]'s list half share it, so a composed-index row and
    * a plain-IVF row can never disagree on their list. Raw (non-unit)
    * vector, double L2 argmin against the float-rounded centroids. */
  private def listAssignCol(
      v: Column, centroids: Array[Array[Float]]): Column = {
    val cands = array(centroids.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("cl"), typedLit(cv.map(_.toDouble).toSeq).as("c"))
    }: _*)
    l2Assign(cands, transform(v, _.cast("double")))
  }

  /** Durable form of the hyperplane-LSH index — the fourth ANN
    * structure's lifecycle ([[writeIvfIndex]]/[[writePqIndex]]'s
    * discipline): the bucketed corpus lands PARTITIONED by `bucket`
    * (each signature bucket its own prunable stripe) with a 1-row meta
    * table pinning `nBits` so later sessions and appends band new
    * vectors identically (the hyperplanes are hash-seeded from the bit
    * index — deterministic by construction, nothing else to pin).
    * Partition count is a LAYOUT parameter: at 10¹¹ vectors every one
    * of the ≤2^nBits stripes is file-sized, so size nBits with the
    * corpus; locally small nBits keeps the directory fan-out sane. */
  def writeLshIndex(
      vecs: DataFrame, id: Column, vec: Column,
      nBits: Int, path: String): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // [1, 32] is HyperplaneBucket64's own domain — accepting more here
    // would pin a meta nBits every probe/append then throws on.
    require(nBits >= 1 && nBits <= 32,
      s"nBits must be in [1, 32] (HyperplaneBucket64's domain), got $nBits")
    clearCompletionMarker(spark, path)
    // The meta nBits IS the probe scheme, so consistency is STRUCTURAL:
    // this writer bands the raw vectors itself through [[bucketize]]
    // with the same nBits it pins (the pqEncode derived-width
    // discipline — one definition, nothing to cross-check). The
    // previous take-a-prebucketed-frame form could only check the
    // mismatch one way (a frame banded WIDER than meta had
    // max(bucket) ≥ 2^nBits; one banded NARROWER passed silently and
    // split the bucket space for every later append/probe).
    // Cluster by the partition column before the partitioned write:
    // without it every writer task opens a file in every stripe it
    // touches (tasks × stripes small files); with it each stripe is
    // written by one task — the layout discipline that matters at both
    // local scale (file count) and 100 TB (writer memory, one open
    // file per task).
    inParallel(
      () => bucketize(vecs, id, vec, nBits)
        .repartition(stripeFanout(spark, 1L << nBits), col("bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$path/buckets"),
      () => Seq(Tuple1(nBits)).toDF("n_bits")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/meta"))
    // Same stale-tombstone reset + empty-seed as writeIvfIndex, AFTER
    // the data writes: a failed rebuild keeps the old tombstones (RTBF-
    // safe) rather than un-deleting rows over surviving old data; the
    // marker (cleared first, created last) closes the seed-crash window.
    seedEmptyTombstones(spark, path)
    writeCompletionMarker(spark, path)
  }

  /** Reload a [[writeLshIndex]]-persisted index: (nBits, bucketed
    * scan). The scan is the partitioned layout itself — a
    * [[lshTopKPruned]] probe opens only the Hamming-ball stripes. */
  def loadLshIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, DataFrame) = {
    requireIndexDir(spark, path, Seq("meta", "buckets"), "Lsh")
    (loadLshNBits(spark, path),
      withoutTombstones(spark, path, spark.read.parquet(s"$path/buckets")))
  }

  /** Meta alone — the append path's need ([[loadIvfCentroids]]'s
    * rationale: never list every bucket stripe just to read one int). */
  private def loadLshNBits(
      spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty,
      s"LSH index at '$path' has an EMPTY meta table — the index write " +
        "was interrupted; rebuild with writeLshIndex")
    rows(0).getInt(0)
  }

  /** Fold new vectors INTO a durable LSH index: band with the
    * meta-pinned nBits through the SAME [[bucketize]] definition the
    * build used (hash-seeded hyperplanes — appended rows are
    * byte-identical to a build-time banding) and append files into the
    * bucket stripes. Pays the SHARD's banding + write; existing
    * stripes are never rewritten. Ids must be NEW — enforced by
    * [[requireNewIds]] ([[appendToIvfIndex]]'s contract). */
  def appendToLshIndex(
      newVecs: DataFrame, id: Column, vec: Column, path: String): Unit = {
    val spark = newVecs.sparkSession
    requireIndexDir(spark, path, Seq("meta", "buckets"), "Lsh")
    // Guard and meta load are independent bounded jobs — run
    // concurrently (the appendToIvfPqIndex discipline).
    var nBits0: Int = -1
    inParallel(
      () => requireNotTombstoned(newVecs.select(id.cast("long").as("id")),
        path, "compactLshIndex"),
      () => nBits0 = loadLshNBits(spark, path))
    val nBits = nBits0
    val banded = bucketize(newVecs, id, vec, nBits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Live-duplicate guard. The touched-bucket set is bounded by
      // min(|shard|, 2^nBits) — prune when it stays IN-literal-sized,
      // fall back to the column-pruned full id scan past that.
      val touched = banded.select(col("bucket")).distinct()
        .limit(LiveGuardMaxStripes + 1)
        .collect().map(_.getLong(0)).toSeq
      requireNewIds(spark, s"$path/buckets",
        if (touched.size <= LiveGuardMaxStripes)
          Some(col("bucket").isin(touched: _*))
        else None,
        banded, "appendToLshIndex")
      // Same cluster-before-write as the build path: without it a shard
      // written by T tasks opens up to T files per touched stripe, and
      // nightly appends compound exactly the small-file mode the build's
      // layout avoids. Fan-out = the shard's own touched-stripe count
      // when bounded (one task per touched stripe), else the full
      // bucket space.
      banded
        .repartition(stripeFanout(spark,
          if (touched.size <= LiveGuardMaxStripes) touched.size.toLong
          else 1L << nBits), col("bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("bucket").parquet(s"$path/buckets")
    } finally {
      banded.unpersist()
      ()
    }
  }

  /** |ball(·, radius)| over nBits bits = Σ_{h≤radius} C(nBits, h),
    * computed arithmetically (capped at `cap`) so [[lshTopKPruned]]'s
    * guard fires BEFORE any enumeration — C(64, 8) is ~4.4 billion
    * ids; materializing first would be the driver OOM the guard
    * exists to prevent. */
  private def hammingBallSize(nBits: Int, radius: Int, cap: Long): Long = {
    var total = 0L
    var c = 1L // C(nBits, 0)
    var h = 0
    while (h <= radius && total <= cap) {
      total += c
      c = c * (nBits - h) / (h + 1) // C(nBits, h+1)
      h += 1
    }
    total
  }

  /** All bucket signatures within Hamming distance `radius` of
    * `center` — the multi-probe ball, enumerated driver-side. Callers
    * must size-check via [[hammingBallSize]] BEFORE calling. */
  private def hammingBall(center: Long, nBits: Int, radius: Int): Seq[Long] =
    (0 to radius).flatMap { h =>
      (0 until nBits).combinations(h).map(
        _.foldLeft(center)((b, p) => b ^ (1L << p)))
    }

  /** Multi-probe LSH top-k as PARTITION PRUNING: [[lshTopK]]'s
    * `bit_count(bucket ⊕ qbucket) ≤ h` filter cannot prune a
    * partitioned layout (no scan layer evaluates bit_count over
    * directory names), so the Hamming ball is enumerated driver-side
    * (the query's own bucket is one bounded collect — the scalar-
    * subquery class) and applied as a static `bucket IN (…)` filter:
    * over a [[loadLshIndex]] scan the probe opens ONLY the ball's
    * stripes. Identical result set by construction — `bucket ∈
    * ball(qbucket, h)` ⇔ `hamming(bucket, qbucket) ≤ h` — gated
    * bit-equal against the filter form in `IndexLifecycleSpec`.
    * `maxProbeBuckets` bounds the enumeration (ball size grows
    * combinatorially with h); past it, use [[lshTopK]]'s scan+filter
    * form — at that radius most stripes are probed anyway. */
  def lshTopKPruned(
      bucketed: DataFrame, query: DataFrame, k: Int, nBits: Int,
      probeHamming: Int, maxProbeBuckets: Int = 4096): DataFrame = {
    val qb = query.withColumn("qbucket",
      VectorFunctions.hyperplaneBucket(col("qv"), nBits))
    // Single-query contract, like [[lshTopK]] (whose un-keyed top-k is
    // only meaningful for one query) — enforced here because the ball
    // is enumerated from ONE collected bucket; a silent .head on a
    // multi-row frame would prune to the first row's ball and drop the
    // others' candidates.
    val qbuckets = qb.select(col("qbucket")).collect()
    require(qbuckets.length == 1,
      s"lshTopKPruned probes ONE query vector (got ${qbuckets.length} " +
        "rows) — loop per query or use ivfTopKBatch-style batching")
    val center = qbuckets.head.getLong(0)
    // Size-check ARITHMETICALLY before enumerating: the guard must be
    // able to reject a ball it could never afford to materialize.
    val ballSize = hammingBallSize(nBits, probeHamming, maxProbeBuckets.toLong)
    require(ballSize <= maxProbeBuckets,
      s"Hamming ball has >= $ballSize buckets > maxProbeBuckets " +
        s"$maxProbeBuckets — use lshTopK's scan+filter form at this radius")
    val ball = hammingBall(center, nBits, probeHamming)
    bucketed.filter(col("bucket").isin(ball: _*))
      .crossJoin(broadcast(qb))
      .withColumn("sim", round(VectorFunctions.cosine(col("v"), col("qv")), 4))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
      .select(col("id"), col("sim"))
  }

  /** Batch IVF ANN top-k — the MANY-queries probe path. [[ivfTopK]]
    * scores centroids on the driver and runs one job per query vector;
    * fine for interactive lookups, wrong for a training-data batch
    * (mining negatives for a million anchors = a million jobs). Here
    * the whole batch probes in ONE plan: each query row picks its
    * `nProbe` nearest lists declaratively (cosine argmin against the
    * centroid literal — the same double arithmetic, descending-cosine /
    * ascending-list order as [[ivfTopK]]'s driver loop, so a 1-query
    * batch is bit-equal to the per-query form), the union of probed
    * list ids is collected (≤ nLists rows — the bounded driver-side
    * class) and applied as a STATIC `list IN (…)` filter so a durable
    * [[loadIvfIndex]] scan partition-prunes to the probed stripes, and
    * candidates come from one broadcast equi-join on `list` (the
    * parameter-sized query batch broadcasts; a corpus row joins once
    * per query probing its list, never more — each row lives in
    * exactly one list). Per-query top-k runs through the custom
    * [[graft.plans.GroupTopK]] bounded heaps, so the shuffle carries
    * ≤k rows per (query, partition). Self-pairs are excluded
    * ([[bruteForceTopKBatch]]'s contract): `nProbe = nLists` makes
    * every (query, corpus) pair score once, so the batch probe
    * degenerates to exact [[bruteForceTopKBatch]] BY CONSTRUCTION —
    * the q192 completeness gate. Output: (query_id, id, sim, rank). */
  def ivfTopKBatch(
      centroids: Array[Array[Float]], indexed: DataFrame,
      queries: DataFrame, qid: Column, qvec: Column,
      k: Int, nProbe: Int): DataFrame = {
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
    val cands = array(centroids.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("list"), typedLit(cv.map(_.toDouble).toSeq).as("c"))
    }: _*)
    val qd = transform(col("qv"), _.cast("double"))
    // (−cos, list) structs sorted ascending = cosine descending with
    // lowest-list tie-break — ivfTopK's stable sortBy(−cos) order.
    val scoredCands = transform(cands, ct => struct(
      (ddot(qd, ct.getField("c")) * lit(-1.0d) /
        (sqrt(ddot(qd, qd)) *
          sqrt(ddot(ct.getField("c"), ct.getField("c"))))).as("negcos"),
      ct.getField("list").as("list")))
    val probes = transform(
      slice(array_sort(scoredCands), 1, nProbe), s => s.getField("list"))
    val q = queries
      .select(qid.cast("long").as("query_id"), qvec.as("qv"))
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
      .withColumn("probe_list", explode(probes))
    val probedLists = q.select(col("probe_list")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val cand = indexed.filter(col("list").isin(probedLists: _*))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
      .join(broadcast(q), col("list") === col("probe_list"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) /
          (col("nrm") * col("qnrm")), 4))
    val top = graft.plans.GroupTopK.topK(cand,
      Seq(col("query_id")), Seq(col("sim").desc, col("id").asc), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("id"), col("sim"), col("rank"))
  }

  /** Fold new vectors INTO a durable IVF index — the nightly-growth
    * path: assign against the index's FROZEN centroids ([[ivfAssign]])
    * and land the rows as new files in the probed partition
    * directories (`SaveMode.Append` under `partitionBy(list)` only ADDS
    * files to the touched `list=` stripes — existing posting lists are
    * never rewritten, and the reloaded probe's partition pruning is
    * untouched). Pays the SHARD's assignment + write, never a re-shard
    * of the corpus. Ids must be NEW — enforced by [[requireNewIds]]
    * (tombstoned ids by [[requireNotTombstoned]] first), so a retried
    * partially-failed append fails readably instead of silently
    * double-landing rows; the error names the recovery. */
  def appendToIvfIndex(
      newVecs: DataFrame, id: Column, vec: Column, path: String): Unit = {
    val spark = newVecs.sparkSession
    requireIndexDir(spark, path, Seq("centroids", "lists"), "Ivf")
    // Guard and centroid load are independent bounded jobs — run
    // concurrently (the appendToIvfPqIndex discipline).
    var cents0: Array[Array[Float]] = null
    inParallel(
      () => requireNotTombstoned(newVecs.select(id.cast("long").as("id")),
        path, "compactIvfIndex"),
      () => cents0 = loadIvfCentroids(spark, path))
    val assigned = ivfAssign(newVecs, id, vec, cents0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Live-duplicate guard, pruned to the shard's own stripe set
      // (≤ nLists — parameter-bounded by construction).
      val touched = assigned.select(col("list")).distinct()
        .collect().map(_.getInt(0)).toSeq
      requireNewIds(spark, s"$path/lists",
        Some(col("list").isin(touched: _*)), assigned,
        "appendToIvfIndex")
      // Same cluster-before-write as the build path and appendToLshIndex:
      // one file per touched stripe per append, not one per (task ×
      // stripe) — nightly accretion is linear in nights, not tasks.
      assigned
        .repartition(stripeFanout(spark, touched.size.toLong), col("list"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("list").parquet(s"$path/lists")
    } finally {
      assigned.unpersist()
      ()
    }
  }

  /** Fold new vectors INTO a durable PQ index: encode against the
    * FROZEN codebooks ([[pqEncode]] — the same definition the build
    * used, so appended codes are byte-identical to a
    * build-time encode) and append to the code table. The codebooks are
    * the trained artifact; growing the corpus never retrains them
    * (retraining re-codes every existing row — a rebuild). */
  def appendToPqIndex(
      newVecs: DataFrame, id: Column, vec: Column, path: String): Unit = {
    val spark = newVecs.sparkSession
    requireIndexDir(spark, path, Seq("codebooks", "codes"), "Pq")
    // Both guards and the codebook load are independent bounded jobs —
    // run concurrently ([[inParallel]]; the lowest-index error wins, so
    // the tombstone guard still takes precedence over the live-id one).
    // Live-duplicate guard: the code table is unpartitioned (no probe
    // key to prune by), so the guard is a column-pruned scan of the
    // id longs alone — the same bandwidth class as the ADC probe scan.
    var cbs0: Seq[(Int, Int, Array[Double])] = null
    inParallel(
      () => requireNotTombstoned(newVecs.select(id.cast("long").as("id")),
        path, "compactPqIndex"),
      () => requireNewIds(spark, s"$path/codes", None,
        newVecs.select(id.cast("long").as("id")), "appendToPqIndex"),
      () => cbs0 = loadPqCodebooks(spark, path))
    pqEncode(newVecs, id, vec, cbs0)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/codes")
  }

  /** Durable form of the PQ index: the packed codes land as plain
    * parquet — which IS the optimal layout for the ADC scan (one long
    * per row, LUT scoring + TakeOrderedAndProject; there is no probe
    * key to prune by, the 32× compression is the whole bandwidth
    * story) — and the codebooks as a parameter-sized (j, cl, c) table
    * beside them. Doubles round-trip parquet bit-exact, so a reloaded
    * probe is bit-equal to the build-session probe (gated in
    * `IndexLifecycleSpec`). */
  def writePqIndex(
      codebooks: Seq[(Int, Int, Array[Double])], encoded: DataFrame,
      path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    clearCompletionMarker(spark, path)
    inParallel(
      () => encoded.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/codes"),
      () => codebooks.map { case (j, cl, c) => (j, cl, c.toSeq) }
        .toDF("j", "cl", "c")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/codebooks"))
    // Same stale-tombstone reset + empty-seed as writeIvfIndex, AFTER
    // the data writes (failed rebuild keeps the old tombstones); the
    // marker closes the seed-crash window.
    seedEmptyTombstones(spark, path)
    writeCompletionMarker(spark, path)
  }

  /** Reload a [[writePqIndex]]-persisted index in (possibly) a fresh
    * session: (codebooks in (j, cl) order, codes scan). The codebook
    * collect is m·ksub rows — the same bounded class as the build. */
  def loadPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[(Int, Int, Array[Double])], DataFrame) = {
    requireIndexDir(spark, path, Seq("codebooks", "codes"), "Pq")
    (loadPqCodebooks(spark, path),
      withoutTombstones(spark, path, spark.read.parquet(s"$path/codes")))
  }

  /** Codebooks alone — the append path's need ([[loadIvfCentroids]]'s
    * rationale: never list the code table just to discard it). */
  private def loadPqCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Int, Int, Array[Double])] =
    spark.read.parquet(s"$path/codebooks")
      .select(col("j").cast("int"), col("cl").cast("int"), col("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(p => (p._1, p._2)).toSeq

  /** ===== Composed IVF+PQ durable index (the FAISS IVFADC layout —
    * Jégou et al. 2011, public literature) =====
    *
    * The fifth durable family closes the last bytes-per-probe gap: a
    * plain-IVF probe reads FULL-DIMENSION float vectors of every row in
    * the probed stripes, so at 100 TB × d ≥ 768 the probed-stripe BYTES
    * are the cost even though the pruning is right. Here the
    * list-partitioned stripes store (id, codes) — ONE long per row, the
    * 32× PQ compression — so a probe is: partition-pruned stripe scan
    * of codes → ADC-score the probed rows against the driver-built LUT
    * ([[adcApproxCol]], the one decode definition) → exact rerank of
    * the rerankN survivors against full vectors fetched BY ID from the
    * corpus ([[exactRerank]], the only touch of the floats). Both
    * approximations have the composed completeness gate: `nProbe =
    * nLists` scans every code and `rerankN ≥ |corpus|` reranks every
    * row, so the probe degenerates to exact brute force BY CONSTRUCTION
    * (q196's oracle contract); finite settings trade recall for the
    * pruned + compressed scan.
    *
    * Artifacts under `path`: `lists/` — (id, codes) PARTITIONED by
    * `list`, clustered one file per stripe; `centroids/` — the frozen
    * IVF centroids ([[writeIvfIndex]]'s table); `codebooks/` — the
    * frozen PQ codebooks ([[writePqIndex]]'s table); `tombstones/` —
    * the logical-delete relation every load anti-joins. Growth encodes
    * against the FROZEN artifacts ([[ivfPqEncode]] — the same
    * expressions as the build, so appended rows are byte-identical);
    * retraining either half is a rebuild by definition (new centroids
    * re-shard every stripe, new codebooks re-code every row). */

  /** The composed family's unit-normalized centroid, as doubles — THE
    * one definition behind the residual convention: the residual
    * encode ([[ivfPqEncode]]), the single-query probe's per-list
    * offset ([[ivfPqTopK]]) and the batch probe's offset expression
    * ([[ivfPqShortlistBatch]]) all consume centroids through it, so
    * the decomposition `u = ĉ(list) + r` can never disagree between a
    * built row, an appended row and either probe form. Norm
    * accumulated left-to-right in double; a zero-norm (dead) centroid
    * maps to the ZERO vector — residual degrades to the raw unit
    * vector and the probe offset to 0, consistently on every side. */
  private def unitCentroid(c: Array[Float]): Array[Double] = {
    var n2 = 0.0; var i = 0
    while (i < c.length) { n2 += c(i).toDouble * c(i).toDouble; i += 1 }
    if (n2 == 0.0) Array.fill(c.length)(0.0)
    else { val n = math.sqrt(n2); c.map(_.toDouble / n) }
  }

  /** ⟨query, unit-centroid⟩ accumulated left-to-right in double — the
    * driver mirror of the batch probe's `ddot(qd, ĉ)` offset term
    * (per-element double products, left fold), so a 1-query batch's
    * ADC scores stay bit-equal to [[ivfPqTopK]]'s driver-LUT scores. */
  private def qDotCentroid(q: Array[Float], uc: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(q.length, uc.length)) {
      s += q(i).toDouble * uc(i); i += 1
    }
    s
  }

  /** The RESIDUAL `u − ĉ(list)` as an expression — the IVFADC encode
    * convention (Jégou et al. 2011; the FAISS `IndexIVFPQ` default):
    * PQ codes quantize the residual against the row's own inverted-
    * list centroid, not the raw unit vector, so the ksub codewords per
    * subspace only have to cover WITHIN-LIST variance — materially
    * better recall at the same one-long-per-row byte budget. The
    * centroid literal is nLists-bounded and routed through
    * [[unitCentroid]] (the one decomposition definition). */
  private def residualCol(
      u: Column, list: Column,
      centroids: Array[Array[Float]]): Column = {
    val ucLit = array(centroids.map(c =>
      typedLit(unitCentroid(c).toSeq)): _*)
    zip_with(u, element_at(ucLit, list + 1), (a, b) => a - b)
  }

  /** The composed family's trained PQ artifact: the codebooks PLUS the
    * quantization TARGET they were fit on — `"raw"` (codes quantize
    * the unit vector `u` itself) or `"residual"` (codes quantize
    * `u − ĉ(list)`, the IVFADC convention — FAISS's `by_residual`).
    * The encoding is part of the artifact, not a probe-time knob:
    * codes written under one convention are garbage under the other's
    * decode, so [[writeIvfPqIndex]] pins it in the index's meta table
    * and every later encode/probe reads it back — exactly the
    * [[writeLshIndex]] nBits discipline.
    *
    * Which convention wins was MEASURED, not assumed
    * (ResidualDiag/ResidualGainSweep, 20-query mean recall@10 at full
    * probe so ADC ordering is the only variable): for THIS engine's
    * cosine/inner-product ranking, raw wins or ties residual on BOTH
    * corpus shapes — clearly on isotropic embeddings (residuals are
    * LONGER than the unit vectors there: mean ‖r‖² = 1.55 vs ‖u‖² = 1,
    * quantization MSE 0.53 vs 0.37), and at parity on a clustered
    * mixture even though residual's average MSE is smaller (average
    * compression error is not ranking error among the TOP candidates,
    * where raw codewords sit densest). This reproduces the public
    * FAISS guidance that `by_residual` pays for L2, much less for IP —
    * so `"raw"` is the measured default, `"residual"` the fully
    * supported IVFADC convention (offset-corrected probes, gated end
    * to end), and `"auto"` the measured-MSE pick for callers who want
    * the compression-optimal codebooks. */
  case class IvfPqCodebooks(
      encoding: String, codebooks: Seq[(Int, Int, Array[Double])]) {
    require(encoding == "raw" || encoding == "residual",
      s"encoding must be 'raw' or 'residual', got '$encoding'")
  }

  /** One map pass assigning each vector's inverted list (frozen
    * centroids — [[listAssignCol]], [[ivfAssign]]'s exact expression,
    * on the RAW vector) and packing its PQ codes through
    * [[packedCodesCol]] ([[pqEncode]]'s exact packing expression) —
    * of the RESIDUAL `u − ĉ(list)` ([[residualCol]], the IVFADC
    * convention) or of `u` itself, per the artifact's pinned
    * `encoding`: no join between the two assignments, no shuffle.
    * Output: (id, codes, list) in [[writeIvfPqIndex]]'s layout.
    * Zero-norm vectors are excluded (the PQ-family contract). */
  def ivfPqEncode(
      vecs: DataFrame, id: Column, vec: Column,
      centroids: Array[Array[Float]],
      cbs: IvfPqCodebooks): DataFrame = {
    val base = unitNormalized(vecs, id, vec)
      .withColumn("list", listAssignCol(col("v"), centroids))
    val target =
      if (cbs.encoding == "residual")
        residualCol(col("u"), col("list"), centroids)
      else col("u")
    base.select(
      col("id"),
      packedCodesCol(target, cbs.codebooks).as("codes"),
      col("list"))
  }

  /** Fit the composed family's PQ codebooks under FROZEN IVF
    * centroids. `encoding` picks the quantization target:
    * `"raw"` (the DEFAULT — measured best-or-tied for this engine's
    * cosine/IP ranking on every corpus shape swept, see
    * [[IvfPqCodebooks]]) fits on `u` (flat PQ under the IVF layout),
    * `"residual"` on `u − ĉ(list)` (IVFADC — codewords cover
    * within-list variance only, the L2-metric convention), and
    * `"auto"` fits BOTH and keeps the convention with the smaller
    * measured mean quantization error on the fit data — the
    * per-subspace L2 error [[l2Assign]] minimizes, 6-dp-rounded
    * cross-row mean so the pick is stable across partition layouts;
    * ties go to `"raw"` (the offset-free probe). Note auto optimizes
    * COMPRESSION error, which tracks IP-ranking recall only loosely
    * (the measured reason raw is the default). All fits run
    * [[pqIndex]]'s deterministic Lloyd schedule (first-ksub-ids init,
    * 6-dp-rounded means, fixed order); the list assignment is
    * [[listAssignCol]] — [[ivfPqEncode]]'s exact expression, so the
    * fit sees precisely the target the encode will quantize. Auto
    * doubles the (parameter-bounded) fit cost, never the probe
    * cost. */
  def ivfPqFitCodebooks(
      corpus: DataFrame, id: Column, vec: Column,
      centroids: Array[Array[Float]],
      m: Int, ksub: Int, iters: Int,
      encoding: String = "raw",
      fitSampleRows: Long = PqFitSampleRowsDefault): IvfPqCodebooks = {
    require(Seq("auto", "raw", "residual").contains(encoding),
      s"encoding must be 'auto', 'raw' or 'residual', got '$encoding'")
    val base = fitSampleOf(
      unitNormalized(corpus, id, vec)
        .withColumn("list", listAssignCol(col("v"), centroids)),
      fitSampleRows)
    def rawUn = base.select(col("id"), col("u").as("w"))
    def resUn = base.select(col("id"),
      residualCol(col("u"), col("list"), centroids).as("w"))
    encoding match {
      case "raw" => IvfPqCodebooks("raw", fitCodebooks(rawUn, m, ksub, iters))
      case "residual" =>
        IvfPqCodebooks("residual", fitCodebooks(resUn, m, ksub, iters))
      case _ =>
        val (rawCbs, rawErr) = fitCodebooksWithErr(rawUn, m, ksub, iters)
        val (resCbs, resErr) = fitCodebooksWithErr(resUn, m, ksub, iters)
        if (resErr < rawErr) IvfPqCodebooks("residual", resCbs)
        else IvfPqCodebooks("raw", rawCbs)
    }
  }

  /** Durable form of the composed index — [[writeIvfIndex]]'s write
    * discipline (cluster-by-stripe, tombstones seeded AFTER the data
    * writes succeed), plus a 1-row `meta` table pinning the artifact's
    * `encoding` ([[writeLshIndex]]'s nBits discipline: the convention
    * is STRUCTURAL — codes written under one target are garbage under
    * the other's decode, so later sessions, appends and probes read it
    * back instead of guessing). `encoded` must be [[ivfPqEncode]]'s
    * output under the same frozen artifacts. */
  def writeIvfPqIndex(
      centroids: Array[Array[Float]],
      cbs: IvfPqCodebooks,
      encoded: DataFrame, path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    clearCompletionMarker(spark, path)
    // Four independent data artifacts, written concurrently
    // ([[inParallel]] — sequentially they paid four job floors back to
    // back); seed + marker stay ordered after all of them.
    inParallel(
      () => encoded
        .repartition(stripeFanout(spark, centroids.length.toLong),
          col("list"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("list").parquet(s"$path/lists"),
      () => centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("list", "centroid")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/centroids"),
      () => cbs.codebooks.map { case (j, cl, c) => (j, cl, c.toSeq) }
        .toDF("j", "cl", "c")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/codebooks"),
      () => Seq(Tuple1(cbs.encoding)).toDF("encoding")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/meta"))
    seedEmptyTombstones(spark, path)
    writeCompletionMarker(spark, path)
  }

  /** Meta alone — the append path's need ([[loadIvfCentroids]]'s
    * rationale). Indexes written before the encoding-pinning format
    * (or whose meta write was interrupted) fail readably toward a
    * rebuild: guessing the convention would silently mis-decode every
    * code. */
  private def loadIvfPqEncoding(
      spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty,
      s"IvfPq index at '$path' has an EMPTY meta table — the index " +
        "write was interrupted (or predates the encoding-pinned " +
        "format); rebuild with writeIvfPqIndex")
    rows(0).getString(0)
  }

  /** Reload a [[writeIvfPqIndex]]-persisted index in (possibly) a
    * fresh session: (centroids by list id, the [[IvfPqCodebooks]]
    * artifact — codebooks in (j, cl) order plus the meta-pinned
    * encoding — and the tombstone-filtered code scan). The parameter
    * tables are bounded driver collects; the code frame is the
    * partitioned scan itself — [[ivfPqTopK]]'s probe filter prunes it
    * to the probed stripes. */
  def loadIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession, path: String):
      (Array[Array[Float]], IvfPqCodebooks, DataFrame) = {
    requireIndexDir(spark, path,
      Seq("centroids", "codebooks", "lists", "meta"), "IvfPq")
    (loadIvfCentroids(spark, path),
      IvfPqCodebooks(loadIvfPqEncoding(spark, path),
        loadPqCodebooks(spark, path)),
      withoutTombstones(spark, path, spark.read.parquet(s"$path/lists")))
  }

  /** Fold new vectors INTO a durable composed index: encode against
    * the FROZEN persisted centroids AND codebooks — under the
    * meta-pinned encoding, in one pass ([[ivfPqEncode]]) — and append
    * files into the touched stripes — [[appendToIvfIndex]]'s growth
    * contract, including the tombstone re-ingest guard. */
  def appendToIvfPqIndex(
      newVecs: DataFrame, id: Column, vec: Column, path: String): Unit = {
    val spark = newVecs.sparkSession
    requireIndexDir(spark, path,
      Seq("centroids", "codebooks", "lists", "meta"), "IvfPq")
    // The tombstone guard and the three parameter-table loads are
    // independent bounded jobs — run concurrently ([[inParallel]]);
    // Thread.join orders the writes below after all four.
    var cents0: Array[Array[Float]] = null
    var enc0: String = null
    var cbs0: Seq[(Int, Int, Array[Double])] = null
    inParallel(
      () => requireNotTombstoned(newVecs.select(id.cast("long").as("id")),
        path, "compactIvfPqIndex"),
      () => cents0 = loadIvfCentroids(spark, path),
      () => enc0 = loadIvfPqEncoding(spark, path),
      () => cbs0 = loadPqCodebooks(spark, path))
    val encoded = ivfPqEncode(newVecs, id, vec,
        cents0, IvfPqCodebooks(enc0, cbs0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = encoded.select(col("list")).distinct()
        .collect().map(_.getInt(0)).toSeq
      requireNewIds(spark, s"$path/lists",
        Some(col("list").isin(touched: _*)), encoded,
        "appendToIvfPqIndex")
      encoded
        .repartition(stripeFanout(spark, touched.size.toLong), col("list"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("list").parquet(s"$path/lists")
    } finally {
      encoded.unpersist()
      ()
    }
  }

  /** [[deleteFromIvfIndex]]'s logical-delete contract for the composed
    * lifecycle. */
  def deleteFromIvfPqIndex(
      ids: DataFrame, id: Column, path: String): Unit = {
    requireIndexDir(ids.sparkSession, path,
      Seq("centroids", "codebooks", "lists", "meta"), "IvfPq")
    writeTombstones(ids, id, path)
  }

  /** [[compactIvfIndex]]'s physical erasure + stripe compaction for
    * the composed code stripes (snapshot-scoped tombstone clear). */
  def compactIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    requireIndexDir(spark, path,
      Seq("centroids", "codebooks", "lists", "meta"), "IvfPq")
    val snapshot = tombstoneFileSnapshot(spark, path)
    val survivors = withoutTombstones(
      spark, path, spark.read.parquet(s"$path/lists"))
    requireNonEmptySurvivors(survivors, path)
    swapInPlace(spark, s"$path/lists") { tmp =>
      survivors.repartition(
          stripeFanout(spark, loadIvfCentroids(spark, path).length.toLong),
          col("list"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("list").parquet(tmp)
    }
    clearSnapshottedTombstones(spark, path, snapshot)
  }

  /** Probe the composed index: driver-side centroid scoring picks the
    * `nProbe` lists ([[probeLists]] — [[ivfTopK]]'s order), the pruned
    * stripe scan ADC-scores ONLY codes (one long + an m-term LUT sum
    * per probed row — never the float vectors; plan-gated), and the
    * rerankN survivors rerank exactly against `corpus` by id. Under
    * the `"residual"` encoding the per-list offset ⟨q, ĉ(list)⟩ is
    * added back (nProbe-bounded driver map, [[qDotCentroid]] — the
    * batch expression's arithmetic): within one list it is a constant,
    * but the shortlist MERGES lists, so it must be added for cross-list
    * ADC scores to be comparable. Output: (id, sim) —
    * [[bruteForceTopK]]'s contract.
    *
    * EAGERNESS: at `rerankN ≤` [[RerankIsinMax]] the shortlist ids are
    * collected at CONSTRUCTION time (one bounded job) so the rerank
    * can reach the corpus scan as a pushed `id IN (…)` filter — the
    * returned frame is NOT fully lazy, and the shortlist is frozen as
    * of this call (an index mutated between construction and action
    * does not move it). Above the bound the frame is lazy end to end
    * (the join fetch form). Same contract as [[pqTopK]]. */
  def ivfPqTopK(
      centroids: Array[Array[Float]],
      cbs: IvfPqCodebooks, indexed: DataFrame,
      corpus: DataFrame, id: Column, vec: Column,
      queryVec: Array[Float], k: Int, nProbe: Int, rerankN: Int): DataFrame = {
    val probe = probeLists(centroids, queryVec, nProbe)
    val offCol =
      if (cbs.encoding == "residual") {
        val offs: Map[Int, Double] = probe.map(l =>
          l -> qDotCentroid(queryVec, unitCentroid(centroids(l)))).toMap
        Some(element_at(typedLit(offs), col("list")))
      } else None
    val shortlist = indexed.filter(col("list").isin(probe.toSeq: _*))
      .select(col("id"),
        adcApproxCol(cbs.codebooks, queryVec, offCol).as("approx"))
      .orderBy(desc("approx"), asc("id"))
      .limit(rerankN)
    exactRerank(shortlist, corpus, id, vec, queryVec, k, rerankN)
  }

  /** ===== Index health + compaction policy =====
    *
    * The compaction knee is MEASURED (IndexCompactionSweep: the
    * clustered writers accrete ~1 file per stripe per nightly append;
    * the probe's file-open penalty is noticeable by ~16 files/stripe
    * and 3.7× by ~780; tombstone loads degrade past the broadcast
    * cap) — these wrappers turn the measurement into policy: a report
    * frame an operator can chart, and a guard a nightly job calls
    * after its append instead of scheduling compactions by folklore.
    * Both are driver-side FILESYSTEM METADATA only — no Spark job, so
    * they are safe to call at any frequency. */

  private case class IndexHealthInfo(
      kind: String, nStripes: Int, nDataFiles: Int, maxFilesPerStripe: Int,
      nTombstoneFiles: Int, tombstoneBytes: Long)

  /** Detect the family at `path` and collect its layout counts. */
  private def pathIndexHealth(
      spark: org.apache.spark.sql.SparkSession,
      path: String): IndexHealthInfo = {
    val conf = spark.sessionState.newHadoopConf()
    def exists(sub: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      p.getFileSystem(conf).exists(p)
    }
    val (kind, dataDir, striped) =
      if (exists("centroids") && exists("codebooks") && exists("lists"))
        ("ivfpq", "lists", true)
      else if (exists("centroids") && exists("lists")) ("ivf", "lists", true)
      else if (exists("meta") && exists("buckets")) ("lsh", "buckets", true)
      else if (exists("codebooks") && exists("codes")) ("pq", "codes", false)
      else throw new IllegalArgumentException(
        s"no durable index at '$path': expected an IvfPq/Ivf/Lsh/Pq " +
          "layout (was a write*Index run against this filesystem?), " +
          "or a corpus-index TABLE PREFIX (writeCorpusIndex's layout — " +
          "indexHealth/compactIfNeeded dispatch there when " +
          "'<prefix>_meta' exists in the catalog)")
    val dp = new org.apache.hadoop.fs.Path(s"$path/$dataDir")
    val fs = dp.getFileSystem(conf)
    def dataFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(s => s.isFile &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    val (nStripes, nFiles, maxPerStripe) =
      if (striped) {
        val stripes = fs.listStatus(dp).filter(_.isDirectory)
        val counts = stripes.map(s => dataFiles(s.getPath))
        (stripes.length, counts.sum, if (counts.isEmpty) 0 else counts.max)
      } else {
        val n = dataFiles(dp)
        (1, n, n)
      }
    val tp = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val tfs =
      if (!tp.getFileSystem(conf).exists(tp)) Seq.empty
      else tp.getFileSystem(conf).listStatus(tp).filter(_.isFile).toSeq
    IndexHealthInfo(kind, nStripes, nFiles, maxPerStripe,
      tfs.count(s => !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")),
      tfs.map(_.getLen).sum)
  }

  /** `path` names a durable CORPUS index (table-prefix layout,
    * [[graft.operators.Dedup.writeCorpusIndex]]) rather than a
    * path-based ANN index: a plain SQL identifier whose `_meta` table
    * exists in the catalog. The dispatch test for the ONE-verb policy
    * surface — a nightly job calls [[indexHealth]]/[[compactIfNeeded]]
    * on whatever it appended to, vector stripes or text buckets. */
  private def isCorpusIndexPrefix(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean =
    path.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      spark.catalog.tableExists(s"${path}_meta")

  /** One-row health report for ANY durable index — the four path-based
    * ANN families: (kind, n_stripes, n_data_files,
    * max_files_per_stripe, n_tombstone_files, tombstone_bytes,
    * tombstone_broadcast_ok, needs_compaction) — or, when `path` is a
    * corpus-index table prefix, [[graft.operators.Dedup
    * .corpusIndexHealth]]'s frame (same knee thresholds, the bucketed-
    * table column names). `needs_compaction` applies the measured-knee
    * thresholds [[compactIfNeeded]] enforces; `tombstone_broadcast_ok`
    * is the [[TombstoneBroadcastCapBytes]] headroom — false means
    * loads have already degraded off the broadcast anti-join. */
  def indexHealth(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxFilesPerStripe: Int = DefaultMaxFilesPerStripe,
      maxTombstoneBytes: Long = DefaultMaxTombstoneBytes): DataFrame = {
    if (isCorpusIndexPrefix(spark, path))
      return Dedup.corpusIndexHealth(
        spark, path, maxFilesPerStripe, maxTombstoneBytes)
    val h = pathIndexHealth(spark, path)
    import spark.implicits._
    Seq((h.kind, h.nStripes, h.nDataFiles, h.maxFilesPerStripe,
        h.nTombstoneFiles, h.tombstoneBytes,
        h.tombstoneBytes <= TombstoneBroadcastCapBytes,
        needsCompaction(h, maxFilesPerStripe, maxTombstoneBytes)))
      .toDF("kind", "n_stripes", "n_data_files", "max_files_per_stripe",
        "n_tombstone_files", "tombstone_bytes", "tombstone_broadcast_ok",
        "needs_compaction")
  }

  /** Default knee: 64 files/stripe ≈ two months of nightly clustered
    * appends — past the ~16-files measurable-penalty point, an order
    * of magnitude before the measured 3.7× open-overhead regime
    * (IndexCompactionSweep), and cheap to rewrite monthly. The same
    * bound applies to tombstone FILE accretion (one file per delete
    * batch by construction). */
  val DefaultMaxFilesPerStripe: Int = 64

  /** Default tombstone-volume knee: a quarter of the broadcast cap —
    * compaction fires while every load is still broadcast-cheap, well
    * before [[TombstoneBroadcastCapBytes]] degrades the probe plans. */
  val DefaultMaxTombstoneBytes: Long = TombstoneBroadcastCapBytes / 4

  private def needsCompaction(
      h: IndexHealthInfo, maxFilesPerStripe: Int,
      maxTombstoneBytes: Long): Boolean =
    h.maxFilesPerStripe > maxFilesPerStripe ||
      h.nTombstoneFiles > maxFilesPerStripe ||
      h.tombstoneBytes > maxTombstoneBytes

  /** Compact `path` iff its health is past the knee, dispatching to
    * the family's compact verb — ANY family: the four path-based ANN
    * layouts, or a corpus-index table prefix (routed to
    * [[graft.operators.Dedup.compactCorpusIndexIfNeeded]] under the
    * same knee constants), so a nightly job has ONE verb regardless of
    * what it appended to. Returns true iff a compaction ran — the
    * nightly-append job's post-step (`appendTo*Index(...);
    * compactIfNeeded(...)`) that keeps the layout inside the measured
    * regime without scheduling corpus-sized rewrites that buy
    * nothing. */
  def compactIfNeeded(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxFilesPerStripe: Int = DefaultMaxFilesPerStripe,
      maxTombstoneBytes: Long = DefaultMaxTombstoneBytes): Boolean = {
    if (isCorpusIndexPrefix(spark, path))
      return Dedup.compactCorpusIndexIfNeeded(
        spark, path, maxFilesPerStripe, maxTombstoneBytes)
    val h = pathIndexHealth(spark, path)
    val due = needsCompaction(h, maxFilesPerStripe, maxTombstoneBytes)
    if (due) h.kind match {
      case "ivfpq" => compactIvfPqIndex(spark, path)
      case "ivf"   => compactIvfIndex(spark, path)
      case "lsh"   => compactLshIndex(spark, path)
      case "pq"    => compactPqIndex(spark, path)
    }
    due
  }

  /** Batch probe over the composed index — [[ivfTopKBatch]]'s
    * many-queries shape reading CODES instead of float vectors: the
    * whole anchor batch probes in ONE plan (per-query probe lists
    * picked declaratively with [[ivfTopKBatch]]'s exact centroid
    * arithmetic; the bounded union of probed list ids applied as a
    * static filter, so a [[loadIvfPqIndex]] scan partition-prunes to
    * the probed stripes AND reads one long per row — the two scale
    * levers composed), each (query, code) pair is ADC-scored by an
    * EXPRESSION whose float association mirrors [[adcApproxCol]]'s
    * driver LUT term for term (per-subspace left-fold dots, then the
    * same left-to-right subspace sum, 6-dp round — a 1-query batch is
    * bit-equal to [[ivfPqTopK]]'s shortlist stage by construction),
    * per-query rerankN shortlists come from the bounded GroupTopK
    * heaps, and ONE broadcast id semi-join fetches the survivors' full
    * vectors for the exact rerank. Self-pairs are excluded before the
    * heap ([[bruteForceTopKBatch]]'s contract), so `nProbe = nLists` ∧
    * `rerankN ≥ |corpus|` degenerates to exact [[bruteForceTopKBatch]]
    * BY CONSTRUCTION — the q197 completeness gate. Output:
    * (query_id, id, sim, rank). */
  def ivfPqTopKBatch(
      centroids: Array[Array[Float]],
      cbs: IvfPqCodebooks, indexed: DataFrame,
      corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column,
      k: Int, nProbe: Int, rerankN: Int): DataFrame = {
    require(rerankN >= k, "rerankN must be >= k")
    val short = ivfPqShortlistBatch(centroids, cbs, indexed,
      queries, qid, qvec, nProbe, rerankN)
    val q = queries
      .select(qid.cast("long").as("query_id"), qvec.as("qv"))
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
    // Exact rerank: fetch the survivors' full vectors by id, rescore
    // with the 4-dp cosine, top-k per query. Broadcast gating runs on
    // rerankN ALONE — the query batch is parameter-sized by contract
    // (it is force-broadcast in this very plan), so rerankN bounds the
    // per-query shortlist frame and no COUNT job fires on the
    // steady-state probe path (it used to — one extra Spark job per
    // batch probe purely to gate this hint). Past the bound the
    // optimizer/AQE decides from its own stats.
    val shortSide =
      if (rerankN <= RerankIsinMax) broadcast(short)
      else short
    val c = corpus.select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
    // COVERAGE CONTRACT: `corpus` must supply the full vector of every
    // id in the index — a corpus handle resolved BEFORE the index's
    // latest append silently drops the appended ids at this inner join
    // (shortlisted by ADC, no vector to rerank → under-k results, no
    // signal). The join stays INNER because the broadcast build side
    // must be the shortlist (Spark cannot broadcast the preserved side
    // of an outer join — a coverage-asserting left join would demote
    // this to a corpus-wide shuffle). Resident daemons re-resolve the
    // corpus each batch (StreamingAnn.startRefreshingPq), which
    // discharges the contract by construction.
    val rescored = c.join(shortSide, Seq("id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) /
          (col("nrm") * col("qnrm")), 4))
    val top = graft.plans.GroupTopK.topK(rescored,
      Seq(col("query_id")), Seq(col("sim").desc, col("id").asc), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("id"), col("sim"), col("rank"))
  }

  /** The ADC shortlist half of [[ivfPqTopKBatch]] — also the durable
    * mining path's candidate source ([[hardNegativesAnnPq]]): probe
    * lists picked declaratively ([[ivfTopKBatch]]'s expression
    * verbatim), static partition pruning, per-(query, code) ADC
    * expression mirroring [[adcApproxCol]]'s driver LUT term for term
    * (per-subspace left-fold dots, left-to-right subspace sum, 6-dp
    * round — the single-query bit-equality gate), self-pairs excluded
    * before the bounded GroupTopK heaps. Output: (query_id, id) —
    * `shortlistN` candidates per query by descending ADC score. */
  private def ivfPqShortlistBatch(
      centroids: Array[Array[Float]],
      cbs: IvfPqCodebooks, indexed: DataFrame,
      queries: DataFrame, qid: Column, qvec: Column,
      nProbe: Int, shortlistN: Int): DataFrame = {
    val codebooks = cbs.codebooks
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
    val cands = array(centroids.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("list"), typedLit(cv.map(_.toDouble).toSeq).as("c"))
    }: _*)
    val qd = transform(col("qv"), _.cast("double"))
    val scoredCands = transform(cands, ct => struct(
      (ddot(qd, ct.getField("c")) * lit(-1.0d) /
        (sqrt(ddot(qd, qd)) *
          sqrt(ddot(ct.getField("c"), ct.getField("c"))))).as("negcos"),
      ct.getField("list").as("list")))
    val probes = transform(
      slice(array_sort(scoredCands), 1, nProbe), s => s.getField("list"))
    val q = queries
      .select(qid.cast("long").as("query_id"), qvec.as("qv"))
      .withColumn("probe_list", explode(probes))
    val probedLists = q.select(col("probe_list")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // ADC per (query, code): scored with the RAW query vector exactly
    // like adcApproxCol's LUT (ranking-equivalent to unit-normalized —
    // qnrm is constant per query — and bit-mirroring is the contract),
    // decoded per subspace against the codebook literal. Under the
    // "residual" encoding the per-(query, probed-list) offset
    // ⟨q, ĉ(list)⟩ is added back before the round — term-for-term the
    // driver path's qDotCentroid + LUT sum (per-element double
    // products folded left-to-right, LUT sum first, offset added
    // last, 6-dp round).
    val m = codebooks.map(_._1).max + 1
    val ksub = codebooks.map(_._2).max + 1
    require((ksub & (ksub - 1)) == 0, "ksub must be a power of 2")
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    // Native codegen'd ADC sum ([[graft.expressions.PqAdcScore]] — the
    // [[graft.expressions.L2ArgminCode]] discipline): same per-subspace
    // left-fold dots and left-to-right subspace sum as the HOF chain it
    // replaces (retained as [[adcLutSumHof]], spec-gated equal), so the
    // batch≡single bit-mirror contract is unchanged.
    val lutSum = graft.expressions.PqAdcScore.score(
      col("qv"), col("codes"), adcCbData(codebooks), bits)
    val approx =
      if (cbs.encoding == "residual") {
        val ucArr = array(centroids.map(c =>
          typedLit(unitCentroid(c).toSeq)): _*)
        round(lutSum + ddot(transform(col("qv"), _.cast("double")),
          element_at(ucArr, col("probe_list") + 1)), 6)
      } else round(lutSum, 6)
    val cand = indexed.filter(col("list").isin(probedLists: _*))
      .join(broadcast(q), col("list") === col("probe_list"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("approx", approx)
    graft.plans.GroupTopK.topK(cand,
        Seq(col("query_id")), Seq(col("approx").desc, col("id").asc),
        shortlistN)
      .select(col("query_id"), col("id"))
  }

  /** [[hardNegatives]] mined through the COMPOSED durable index — the
    * minimum-bytes form of [[hardNegativesAnn]]'s 100 TB shape: the
    * whole anchor batch's shortlist comes from ONE
    * [[ivfPqShortlistBatch]] plan (partition-pruned CODE stripes — one
    * long per probed row instead of d floats — bounded heaps), then
    * the SHARED label-filtered exact rerank tail ([[rerankShortlist]],
    * the q186/q195 definition) runs on the parameter-sized shortlist.
    * Identical output contract: (anchor_id, rank, neg_id, neg_label,
    * sim). Label semantics are [[hardNegativesAnn]]'s by construction
    * (the index stores (id, codes, list) — label filtering happens on
    * the shortlist; oversample `shortlist` ≫ k). With `nProbe =
    * nLists` and `shortlist ≥ |corpus|` every eligible pair survives
    * to the rerank and the output degenerates to [[hardNegatives]]
    * EXACTLY (the q198 completeness gate); a finite shortlist is
    * recall-floor-gated like q186/q195 — the floor carries the ADC
    * leg's extra loss. */
  def hardNegativesAnnPq(
      centroids: Array[Array[Float]],
      cbs: IvfPqCodebooks, indexed: DataFrame,
      corpus: DataFrame, id: Column, vec: Column, label: Column,
      anchors: DataFrame, k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val short = ivfPqShortlistBatch(centroids, cbs, indexed,
        anchors.select(col("query_id"), col("qv")),
        col("query_id"), col("qv"), nProbe, shortlist)
      .select(col("query_id").as("anchor_id"), col("id"))
    val c = Dedup.spread(corpus).select(id.cast("long").as("id"),
        vec.as("v"), label.as("neg_label"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
    val q = anchors
      .select(col("query_id").cast("long").as("anchor_id"), col("qv"),
        col("qlabel"))
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
    // The code-served shortlist is label-blind, so the shared tail
    // applies the self/label exclusions at the rerank.
    rerankShortlist(c, q, short, k, shortlist, filterLabels = true)
  }

  /** The `nProbe` nearest inverted lists for a query — the driver-side
    * centroid scoring shared by [[ivfTopK]] and [[ivfPqTopK]] (nLists
    * is parameter-sized; descending cosine, ascending list on ties —
    * stable sortBy keeps the original index order for equal keys).
    *
    * The arithmetic MIRRORS the batch probes' declarative negcos
    * expression term for term ([[ivfTopKBatch]]/[[ivfPqShortlistBatch]]:
    * per-element double products folded left-to-right, `dot * -1.0`
    * divided by the product of left-to-right-accumulated norms), so a
    * 1-query batch selects the same probe lists as this driver loop
    * even on near-tie centroid scores — the probe-selection half of
    * the batch≡single bit-equality gate, by construction rather than
    * by fixture luck. */
  private def probeLists(
      centroids: Array[Array[Float]], queryVec: Array[Float],
      nProbe: Int): Array[Int] = {
    def negcos(c: Array[Float], q: Array[Float]): Double = {
      var dot = 0.0; var qq = 0.0; var cc = 0.0; var i = 0
      while (i < math.min(c.length, q.length)) {
        val qi = q(i).toDouble; val ci = c(i).toDouble
        dot += qi * ci; qq += qi * qi; cc += ci * ci; i += 1
      }
      (dot * -1.0) / (math.sqrt(qq) * math.sqrt(cc))
    }
    centroids.zipWithIndex
      .sortBy { case (cv, _) => negcos(cv, queryVec) }
      .take(nProbe).map(_._2)
  }

  /** IVF ANN top-k: score the query against every centroid on the driver
    * (nLists is small), then scan only the `nProbe` nearest posting
    * lists. Approximate; recall grows with nProbe. Output: (id, sim). */
  def ivfTopK(
      centroids: Array[Array[Float]], indexed: DataFrame,
      queryVec: Array[Float], k: Int, nProbe: Int): DataFrame = {
    val probe = probeLists(centroids, queryVec, nProbe)
    val spark = indexed.sparkSession
    import spark.implicits._
    val q = Seq(Tuple1(queryVec)).toDF("qv")
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
    indexed.filter(col("list").isin(probe.toSeq: _*))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
      .crossJoin(broadcast(q))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 4))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
      .select(col("id"), col("sim"))
  }

  /** ANN top-k via hyperplane LSH with multi-probe: scan only corpus rows
    * whose bucket is within `probeHamming` bits of the query's bucket.
    * Approximate — recall < 1; the scale path when the corpus is huge and
    * queries are many. Output: (id, sim). */
  def lshTopK(
      bucketed: DataFrame, query: DataFrame, k: Int,
      nBits: Int, probeHamming: Int = 1): DataFrame = {
    val qb = query.withColumn("qbucket",
      VectorFunctions.hyperplaneBucket(col("qv"), nBits))
    bucketed.crossJoin(broadcast(qb))
      .filter(bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= probeHamming)
      .withColumn("sim", round(VectorFunctions.cosine(col("v"), col("qv")), 4))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
      .select(col("id"), col("sim"))
  }

  /** 1-row recall summary of an approximate result against its exact
    * baseline, joined on `on`: (n_exact, n_approx, n_hit) where n_hit
    * counts exact rows the approximate result reproduced. All three
    * inputs are top-k / pair-set sized, so the three single-row
    * aggregates and their cross joins are trivially broadcast. This is
    * the declared-surface gate for the approximate ANN paths (q78/q79):
    * the driver sees recall as data, not just as a spec assertion. */
  def recallStats(exact: DataFrame, approx: DataFrame, on: Seq[String]): DataFrame = {
    val e = exact.select(on.map(col): _*)
    val a = approx.select(on.map(col): _*)
    val nE = e.agg(count(lit(1)).as("n_exact"))
    val nA = a.agg(count(lit(1)).as("n_approx"))
    val nH = e.join(a, on, "left_semi").agg(count(lit(1)).as("n_hit"))
    nE.crossJoin(nA).crossJoin(nH)
  }

  /** Product-quantization index (Jégou, Douze, Schmid, "Product
    * quantization for nearest neighbor search", IEEE TPAMI 2011 —
    * public literature; the FAISS IVFADC building block): unit-normalize
    * each vector, split it into `m` contiguous subvectors, train an
    * independent `ksub`-codeword codebook per subspace (deterministic
    * Lloyd: init = the `ksub` smallest-id subvectors, L2 argmin with
    * 6-dp rounding + codeword-index tie-break — the
    * [[graft.operators.Cluster]] determinism discipline), and encode
    * every vector as `m` codeword indices BIT-PACKED into one long
    * (`b = log2(ksub)` bits each; requires `m·b ≤ 64`).
    *
    * This is the memory leg the brute/LSH/IVF trio lacks: the scan-side
    * state per vector drops from d floats (256 B at d=64) to ONE long —
    * 32× — so a 100 TB embedding corpus becomes a ~3 TB code table that
    * scans at memory bandwidth, while the full vectors stay in cold
    * storage and are fetched only for the final rerank join.
    *
    * Scale shape: training collects A BOUNDED SAMPLE once
    * ([[fitSampleOf]] — the `fitSampleRows` smallest (xxhash64(id), id)
    * values, [[ivfIndex]]'s deterministic hash-ordered discipline;
    * defaults to [[PqFitSampleRowsDefault]]) and runs the Lloyd
    * schedule on the driver, exactly like [[ivfIndex]]'s centroid fit —
    * one Spark job per fit instead of one broadcast-join + shuffle per
    * iteration ([[fitCodebooksWithErr]]); encoding is one codegen'd
    * map pass against the codebook literal over EVERY vector
    * (assignment is never sampled). Driver memory: the sample —
    * fitSampleRows × d doubles, [[lloydFit]]'s envelope.
    *
    * Returns (codebooks as (subspace, codeword, centroid), encoded
    * (id, codes) with `codes` the packed long). Zero-norm vectors are
    * excluded (they have no cosine to any query; [[graft.operators
    * .CorpusStats.embeddingAudit]] is the upstream gate). */
  def pqIndex(
      corpus: DataFrame, id: Column, vec: Column,
      m: Int, ksub: Int, iters: Int,
      fitSampleRows: Long = PqFitSampleRowsDefault)
      : (Seq[(Int, Int, Array[Double])], DataFrame) = {
    val cbs = fitCodebooks(
      fitSampleOf(
        unitNormalized(corpus, id, vec).select(col("id"), col("u").as("w")),
        fitSampleRows),
      m, ksub, iters)
    // Encode through the SAME derived-ksub definition as pqTopK's
    // decode and appendToPqIndex's growth encode — all three derive
    // the packing width from the codebooks (max codeword + 1), so
    // they can never disagree on bit layout. If k-means loss killed
    // the TOP codewords down past a power-of-2 boundary, this throws
    // loudly at BUILD time (pqTopK would throw on such an index
    // anyway) instead of packing at a width the decoder won't use.
    (cbs, pqEncode(corpus, id, vec, cbs))
  }

  /** The deterministic PQ codebook fit over an arbitrary vector frame
    * (id, w) — [[pqIndex]]'s Lloyd schedule factored out so
    * [[ivfPqFitCodebooks]] can run it on RESIDUALS: init from the
    * first `ksub` ids' subvectors (deterministic, partition-invariant),
    * then `iters` rounds of L2 assignment and 6-dp-rounded per-(j, cl,
    * dim) means — driver-side on the bounded sample, see
    * [[fitCodebooksWithErr]]. */
  /** [[ivfIndex]]'s `fitSampleRows` default, shared by the PQ fits —
    * codebook ESTIMATES converge with a representative sample (the
    * FAISS training-buffer convention), so past this bound extra rows
    * buy per-iteration cost, not quality. Every local test corpus
    * sits far under it, so the default changes nothing at test scale
    * while bounding the fit at 100 TB. */
  val PqFitSampleRowsDefault: Long = 100000L

  /** The deterministic bounded fit sample — [[ivfIndex]]'s exact
    * discipline applied to the PQ fits: the `fitSampleRows` smallest
    * (xxhash64(id), id) values, one TakeOrderedAndProject —
    * hash-ordered so the bound is UNBIASED when ids correlate with
    * ingest time, partition-invariant because the hash is a pure
    * function of the id. The fit collects this frame
    * ([[fitCodebooksWithErr]]'s driver-side Lloyd), so the bound sizes
    * BOTH the per-fit scan and driver memory — exactly [[ivfIndex]]'s
    * own sample contract (the round-19 repartition re-spread fed the
    * since-removed distributed fit and would now only add an exchange
    * before the collect). `fitSampleRows ≤ 0` disables sampling; the
    * ENCODE pass always covers every vector either way. */
  private def fitSampleOf(un: DataFrame, fitSampleRows: Long): DataFrame =
    if (fitSampleRows <= 0) un
    else
      un.orderBy(xxhash64(col("id")), col("id"))
        .limit(math.min(fitSampleRows, Int.MaxValue.toLong).toInt)

  private def fitCodebooks(
      un: DataFrame, m: Int, ksub: Int,
      iters: Int): Seq[(Int, Int, Array[Double])] =
    fitCodebooksWithErr(un, m, ksub, iters, withErr = false)._1

  /** [[fitCodebooks]] plus (when `withErr`) the mean per-subspace
    * quantization error of the FINAL codebooks on the fit data — the
    * measured quantity [[ivfPqFitCodebooks]]'s auto mode compares
    * between the raw and residual conventions (the per-row ADC error
    * for inner-product ranking is ⟨q, target − target̂⟩, so the
    * smaller error norm is the better codebook set in expectation).
    *
    * DRIVER-SIDE fit (round 20) — [[lloydFit]]'s own doctrine applied
    * to the PQ codebooks: the fit input is sample-bounded BY DESIGN
    * ([[fitSampleOf]], the FAISS training-buffer convention), so the
    * fit collects it once and runs the deterministic Lloyd schedule on
    * the driver — the distributed form paid ~4 Spark jobs per fit plus
    * one broadcast-join + shuffle PER ITERATION to move m·ksub·dsub
    * parameter-sized aggregates (measured 1.4–2.2 s per composed fit
    * at sf0.1, R20Split6, ~90% scheduling floor), and its partial
    * aggregation made the means partition-layout-dependent (absorbed
    * by the 6-dp rounding — the r16 q191 risk class [[lloydFit]]
    * already banned for centroids). Driver memory envelope =
    * [[lloydFit]]'s: fitSampleRows × d doubles. `fitSampleRows ≤ 0`
    * (sampling disabled) collects the whole corpus — size the bound to
    * the driver exactly as for [[ivfIndex]].
    *
    * Semantics preserved operation for operation: per-row dsub =
    * ⌊width/m⌋ slices; init = the ksub smallest ids' subvectors, cl in
    * id order; assignment = (round6 d2, cl) argmin with
    * length-mismatch d2 sorting smallest ([[l2AssignHof]]'s struct-min,
    * [[graft.expressions.L2ArgminCode]]'s arithmetic); recompute =
    * per-(cl, dim) means over members (round(sum/count, 6) — the sum
    * now in id order, deterministic, where the distributed fit's
    * partial-agg order varied); clusters that lose every member drop
    * out. Subspaces are independent — the loop parallelizes across j
    * with disjoint state (the [[lloydFitImpl]] discipline), bit-equal
    * to the sequential schedule by construction. */
  private def fitCodebooksWithErr(
      un: DataFrame, m: Int, ksub: Int,
      iters: Int, withErr: Boolean = true)
      : (Seq[(Int, Int, Array[Double])], Double) = {
    require(ksub >= 2 && (ksub & (ksub - 1)) == 0, "ksub must be a power of 2")
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    require(m * bits <= 64, s"m*log2(ksub)=${m * bits} exceeds one long")

    // One bounded collect, id-sorted so every fold below has one
    // deterministic order (the ivfIndex sample discipline).
    val sample: Array[Array[Double]] = un.select(col("id"), col("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    if (sample.isEmpty) return (Seq.empty, 0.0)
    // Validated against the first (smallest-id) vector, as the old
    // init-row check did: dsub = ⌊d/m⌋ slices cover only m·dsub
    // components, so a non-divisible dim would silently drop the
    // trailing d % m dimensions from ADC scoring while the exact
    // rerank uses the full vector — recall would degrade with no error.
    val d0 = sample.head.length
    require(d0 % m == 0,
      s"vector dim $d0 is not divisible by m=$m (trailing ${d0 % m} " +
        "dims would be ignored by ADC scoring)")

    def round6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // Per-row slice width — the old fit's per-row dsub expression: a
    // ragged row yields short subvectors whose length-mismatched d2 is
    // null and sorts smallest (L2ArgminCode's contract).
    def subOf(w: Array[Double], j: Int): Array[Double] = {
      val dsub = w.length / m
      java.util.Arrays.copyOfRange(w, j * dsub, j * dsub + dsub)
    }
    def argmin(cands: IndexedSeq[(Int, Array[Double])],
        sub: Array[Double]): Int = {
      var bestCl = 0; var bestD2 = 0.0
      var bestNull = false; var found = false
      cands.foreach { case (cl, c) =>
        var d2 = 0.0
        val isNull = c.length != sub.length
        if (!isNull) {
          var i = 0
          while (i < sub.length) { val t = sub(i) - c(i); d2 += t * t; i += 1 }
          d2 = round6(d2)
        }
        val lt =
          if (!found) true
          else if (isNull && bestNull) cl < bestCl
          else if (isNull) true
          else if (bestNull) false
          else {
            val cc = java.lang.Double.compare(d2, bestD2)
            if (cc != 0) cc < 0 else cl < bestCl
          }
        if (lt) { bestCl = cl; bestD2 = d2; bestNull = isNull; found = true }
      }
      bestCl
    }

    // init: the ksub smallest ids' subvectors, cl in id order (the
    // sample is id-sorted, so positions 0..nInit-1 ARE those rows).
    val nInit = math.min(ksub, sample.length)
    var cbs: Array[IndexedSeq[(Int, Array[Double])]] =
      Array.tabulate(m)(j =>
        (0 until nInit).map(cl => cl -> subOf(sample(cl), j)))

    for (_ <- 1 to iters) {
      val next = new Array[IndexedSeq[(Int, Array[Double])]](m)
      java.util.stream.IntStream.range(0, m).parallel().forEach { j =>
        val cands = cbs(j)
        // per-(cl, dim) sums and counts, members folded in id order;
        // per-dim counts because a ragged row contributes only its own
        // dims (the posexplode grouping's semantics).
        val sums = collection.mutable.LinkedHashMap
          .empty[Int, collection.mutable.ArrayBuffer[Double]]
        val counts = collection.mutable.Map
          .empty[Int, collection.mutable.ArrayBuffer[Long]]
        sample.foreach { w =>
          val sub = subOf(w, j)
          val cl = argmin(cands, sub)
          val s = sums.getOrElseUpdate(cl,
            collection.mutable.ArrayBuffer.empty[Double])
          val n = counts.getOrElseUpdate(cl,
            collection.mutable.ArrayBuffer.empty[Long])
          var i = 0
          while (i < sub.length) {
            if (i >= s.length) { s += 0.0; n += 0L }
            s(i) += sub(i); n(i) += 1L
            i += 1
          }
        }
        next(j) = sums.keys.toIndexedSeq.sorted.map { cl =>
          val s = sums(cl); val n = counts(cl)
          cl -> Array.tabulate(s.length)(i => round6(s(i) / n(i)))
        }
      }
      cbs = next
    }
    val out: Seq[(Int, Int, Array[Double])] =
      (0 until m).flatMap(j => cbs(j).map { case (cl, c) => (j, cl, c) })
    val err =
      if (!withErr) 0.0
      else {
        // mean over all (row × subspace) pairs of the min per-candidate
        // round6(d2) — null (length-mismatch) distances skipped, rows
        // whose every candidate is null skipped, exactly like the old
        // array_min + avg; fold order: subspace-major, rows in id order.
        var sum = 0.0; var n = 0L
        var j = 0
        while (j < m) {
          val cands = cbs(j)
          sample.foreach { w =>
            val sub = subOf(w, j)
            var best = Double.NaN; var any = false
            cands.foreach { case (_, c) =>
              if (c.length == sub.length) {
                var d2 = 0.0; var i = 0
                while (i < sub.length) {
                  val t = sub(i) - c(i); d2 += t * t; i += 1
                }
                d2 = round6(d2)
                if (!any || d2 < best) { best = d2; any = true }
              }
            }
            if (any) { sum += best; n += 1L }
          }
          j += 1
        }
        if (n == 0) 0.0 else round6(sum / n)
      }
    (out, err)
  }

  /** L2 argmin against a candidate array<struct(cl, c)>: min over
    * (round(||sub-c||², 6), cl) structs — deterministic tie-break. The
    * ONE assignment definition shared by PQ training, PQ encode (build
    * and append) and IVF frozen-centroid assignment, so an appended
    * row is coded exactly as the original build would have coded it.
    * Native codegen'd expression ([[graft.expressions.L2ArgminCode]] —
    * the [[graft.expressions.FloatVecDot]] discipline): the HOF
    * composition below is CodegenFallback and allocates an
    * intermediate array per (row × candidate) — m·ksub = 256 per
    * encoded row at the composed family's geometry. Bit-equal by
    * construction and gated in `ExpressionCodegenSpec`. */
  private def l2Assign(cands: Column, sub: Column): Column =
    graft.expressions.L2ArgminCode.argmin(cands, sub)

  /** The pre-native HOF formulation of [[l2Assign]] — retained ONLY as
    * the equality oracle for [[graft.expressions.L2ArgminCode]]'s spec
    * (the [[graft.functions.VectorFunctions.hyperplaneBucketHof]]
    * convention). */
  private[graft] def l2AssignHof(cands: Column, sub: Column): Column =
    array_min(transform(cands, ct => struct(
      round(aggregate(zip_with(sub, ct.getField("c"),
        (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x),
        6).as("d2"),
      ct.getField("cl").as("cl")))).getField("cl")

  /** Encode vectors against FROZEN codebooks — the shared definition
    * behind [[pqIndex]]'s build-time encode and [[appendToPqIndex]]'s
    * growth path (the [[graft.operators.Dedup]] `shingleRel` sharing
    * discipline: append rows are byte-identical to what the original
    * build would have produced). Unit-normalize, per-subspace L2 argmin
    * against the codebook literal, bit-pack into one long; one
    * codegen'd map pass, no shuffle. `ksub` is derived as
    * max codeword + 1 exactly like [[pqTopK]] does — build encode,
    * append encode and ADC decode all share this one derivation, so
    * the packed bit width can never diverge between the durable
    * table's existing rows and an appended shard; an index whose TOP
    * codeword died in training fails the same power-of-2 require in
    * all three places. */
  def pqEncode(
      vecs: DataFrame, id: Column, vec: Column,
      codebooks: Seq[(Int, Int, Array[Double])]): DataFrame =
    unitNormalized(vecs, id, vec)
      .select(col("id"), packedCodesCol(col("u"), codebooks).as("codes"))

  /** Unit-normalize to (id, u), excluding zero-norm vectors (no cosine
    * to any query — the PQ-family contract; [[graft.operators
    * .CorpusStats.embeddingAudit]] is the upstream gate). The shared
    * head of [[pqEncode]] and [[ivfPqEncode]]. */
  private def unitNormalized(
      vecs: DataFrame, id: Column, vec: Column): DataFrame =
    Dedup.spread(vecs)
      .select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
      .filter(col("nrm") > 0)
      .select(col("id"), col("v"),
        transform(col("v"), x => x.cast("double") / col("nrm")).as("u"))

  /** The bit-packed PQ code EXPRESSION over a unit-normalized vector —
    * [[pqEncode]]'s body and [[ivfPqEncode]]'s code half share it
    * (with [[pqTopK]]'s decode, via the same max-codeword-derived ksub,
    * that is every producer and consumer of the bit layout on one
    * definition). */
  private def packedCodesCol(
      u: Column, codebooks: Seq[(Int, Int, Array[Double])]): Column = {
    val ksub = codebooks.map(_._2).max + 1
    require(ksub >= 2 && (ksub & (ksub - 1)) == 0, "ksub must be a power of 2")
    val m = codebooks.map(_._1).max + 1
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    val dsubCol = (size(u) / m).cast("int")
    val cbLit = array((0 until m).map { j =>
      array(codebooks.filter(_._1 == j).map { case (_, cl, c) =>
        struct(lit(cl).as("cl"), typedLit(c.toSeq).as("c"))
      }: _*)
    }: _*)
    (0 until m).map { j =>
      shiftleft(
        l2Assign(element_at(cbLit, j + 1),
          slice(u, lit(j) * dsubCol + 1, dsubCol)).cast("long"),
        j * bits)
    }.reduce(_ bitwiseOR _)
  }

  /** PQ asymmetric-distance top-k (ADC): score every packed code row
    * with a driver-built lookup table (lut[j][c] = ⟨query subvector,
    * codeword⟩ — m·ksub doubles, a literal), keep the `rerankN` best by
    * approximate inner product, then rerank ONLY those with the exact
    * cosine against the true vectors (`corpus` join) and return the
    * top k — (id, sim) in [[bruteForceTopK]]'s exact output contract.
    *
    * The scan touches one long + one m-term LUT sum per row (codegen'd
    * bit-extract + array lookups, no shuffle); the corpus's float
    * vectors are read only for the rerankN survivors. `rerankN ≥ |corpus|`
    * degenerates to exact brute force BY CONSTRUCTION (every row
    * survives to the exact rerank) — the q89 completeness gate; finite
    * rerankN trades recall for the 32× smaller scan.
    *
    * EAGERNESS: at `rerankN ≤` [[RerankIsinMax]] the shortlist ids are
    * collected at CONSTRUCTION time (one bounded job) so the rerank
    * reaches the corpus scan as a pushed `id IN (…)` filter — the
    * returned frame is not fully lazy, and the shortlist is frozen as
    * of this call. Above the bound the frame is lazy end to end (the
    * join fetch form). */
  def pqTopK(
      codebooks: Seq[(Int, Int, Array[Double])], encoded: DataFrame,
      corpus: DataFrame, id: Column, vec: Column,
      queryVec: Array[Float], k: Int, rerankN: Int): DataFrame = {
    val shortlist = encoded
      .select(col("id"), adcApproxCol(codebooks, queryVec).as("approx"))
      .orderBy(desc("approx"), asc("id"))
      .limit(rerankN)
    exactRerank(shortlist, corpus, id, vec, queryVec, k, rerankN)
  }

  /** The ADC scoring EXPRESSION over a packed `codes` column: the
    * query is pre-multiplied against every codeword on the driver
    * (lut[j][c] = ⟨query subvector, codeword⟩ — m·ksub doubles, a
    * literal), so scoring a row is m codegen'd bit-extracts + LUT adds.
    * THE one decode definition — [[pqTopK]] and [[ivfPqTopK]] route
    * through it, deriving ksub from the codebooks exactly like
    * [[packedCodesCol]]'s encode, so bit layouts cannot diverge.
    *
    * `offset` is the composed family's residual correction
    * ([[ivfPqTopK]]): codes there quantize `u − ĉ(list)`, so the LUT
    * sum estimates ⟨q, r⟩ and the per-list constant ⟨q, ĉ(list)⟩ is
    * added back BEFORE the 6-dp round — `⟨q, u⟩ ≈ ⟨q, ĉ⟩ + ⟨q, r̂⟩`.
    * `None` (the raw-PQ family) leaves the expression bit-identical
    * to the offset-free form. */
  private def adcApproxCol(
      codebooks: Seq[(Int, Int, Array[Double])],
      queryVec: Array[Float],
      offset: Option[Column] = None): Column = {
    val m = codebooks.map(_._1).max + 1
    val ksub = codebooks.map(_._2).max + 1
    require((ksub & (ksub - 1)) == 0, "ksub must be a power of 2")
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    val dsub = codebooks.head._3.length
    val lut: Seq[Seq[Double]] = (0 until m).map { j =>
      (0 until ksub).map { c =>
        codebooks.find(p => p._1 == j && p._2 == c) match {
          case Some((_, _, cw)) =>
            var s = 0.0; var i = 0
            while (i < dsub) { s += queryVec(j * dsub + i) * cw(i); i += 1 }
            s
          case None => Double.NegativeInfinity // codeword died in training:
          // unreachable at scoring time (encode never assigns it), the
          // -inf keeps an accidental hit from ever ranking.
        }
      }
    }
    val lutLit = typedLit(lut)
    val lutSum = (0 until m).map { j =>
      element_at(element_at(lutLit, j + 1),
        shiftright(col("codes"), j * bits)
          .bitwiseAND(lit((ksub - 1).toLong)).cast("int") + 1)
    }.reduce(_ + _)
    round(offset.fold(lutSum)(lutSum + _), 6)
  }

  /** The [m][ksub][dsub] codebook constant [[graft.expressions
    * .PqAdcScore]] scores against — dead codewords NegativeInfinity-
    * filled exactly like the literal array the HOF chain indexed (an
    * accidental hit can never rank). */
  private def adcCbData(
      codebooks: Seq[(Int, Int, Array[Double])]): Array[Array[Array[Double]]] = {
    val m = codebooks.map(_._1).max + 1
    val ksub = codebooks.map(_._2).max + 1
    val dsub = codebooks.head._3.length
    (0 until m).map { j =>
      (0 until ksub).map { c =>
        codebooks.find(p => p._1 == j && p._2 == c).map(_._3)
          .getOrElse(Array.fill(dsub)(Double.NegativeInfinity))
      }.toArray
    }.toArray
  }

  /** The pre-native HOF formulation of the batch ADC sum — retained
    * ONLY as the equality oracle for [[graft.expressions.PqAdcScore]]'s
    * spec (the [[l2AssignHof]] convention). */
  private[graft] def adcLutSumHof(
      codebooks: Seq[(Int, Int, Array[Double])],
      qv: Column, codes: Column): Column = {
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
    val m = codebooks.map(_._1).max + 1
    val ksub = codebooks.map(_._2).max + 1
    val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
    val dsub = codebooks.head._3.length
    val cbArr = array((0 until m).map { j =>
      array((0 until ksub).map { c =>
        typedLit(codebooks.find(p => p._1 == j && p._2 == c)
          .map(_._3.toSeq)
          .getOrElse(Seq.fill(dsub)(Double.NegativeInfinity)))
      }: _*)
    }: _*)
    (0 until m).map { j =>
      val cw = element_at(element_at(cbArr, j + 1),
        shiftright(codes, j * bits)
          .bitwiseAND(lit((ksub - 1).toLong)).cast("int") + 1)
      ddot(transform(slice(qv, j * dsub + 1, dsub), _.cast("double")), cw)
    }.reduce(_ + _)
  }

  /** Past this shortlist size the rerank keeps the join form: an
    * `id IN (…)` literal of 10⁵+ entries bloats the plan more than the
    * join costs. Under it, the ids collect (one rerankN-bounded job —
    * the scalar-subquery class) and reach the corpus SCAN as a pushed
    * filter: the rerank becomes a pruned point-fetch instead of a
    * corpus-streaming join — measured 0.47 → 0.32 s against a 529 MB
    * vector table even WITHOUT an id-clustered layout (no join build,
    * fewer decoded rows), and with row-group stats on `id` (sorted or
    * z-ordered corpus — the 100 TB landing convention) it prunes to
    * the touched row groups. */
  private val RerankIsinMax = 8192

  /** The exact-rerank TAIL shared by [[pqTopK]] and [[ivfPqTopK]]: the
    * shortlist's full-dimension vectors are fetched BY ID from the
    * corpus — as a pushed `id IN (…)` scan filter when the shortlist
    * is parameter-sized ([[RerankIsinMax]]), as a join above it — at
    * 100 TB this is the ONLY touch of the float vectors. Scored with
    * the exact 4-dp cosine against the query, top-k out in
    * [[bruteForceTopK]]'s (id, sim) contract. Both fetch forms read
    * the identical row set (the shortlist's ids), so results are
    * bit-equal by construction. */
  private def exactRerank(
      shortlist: DataFrame, corpus: DataFrame, id: Column, vec: Column,
      queryVec: Array[Float], k: Int, rerankN: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = Seq(Tuple1(queryVec)).toDF("qv")
      .withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))
    val vecs = corpus.select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.normSq(col("v"))))
    val fetched =
      if (rerankN <= RerankIsinMax) {
        val ids = shortlist.select(col("id")).collect().map(_.getLong(0))
        if (ids.isEmpty) vecs.filter(lit(false))
        else vecs.filter(col("id").isin(ids.toSeq: _*))
      } else shortlist.join(vecs, "id")
    fetched
      .crossJoin(broadcast(q))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 4))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
      .select(col("id"), col("sim"))
  }

  /** Per-group embedding centroids: mean vector over each `group`'s
    * rows, as `array<double>`.
    *
    * Scale shape: posexplode → (group, dim) hash aggregation — partial
    * aggregation reduces the shuffle to ≤ |groups|·d rows per input
    * partition regardless of corpus size — then |groups| tiny rows are
    * reassembled into arrays with a sort-by-dim collect. No driver
    * collect; the result is broadcast-sized by construction.
    *
    * Cross-engine floats: each component is a cross-row double sum whose
    * order is engine-dependent, so components are rounded to 6 dp here
    * (and identically in oracle SQL) — downstream cosines then consume
    * bit-identical centroids on either engine. */
  def groupCentroids(df: DataFrame, group: Column, vec: Column): DataFrame =
    df.select(group.as("group"), posexplode(vec).as(Seq("dim", "x")))
      .groupBy(col("group"), col("dim"))
      .agg(round(sum(col("x").cast("double")) / count(lit(1)), 6).as("m"))
      .groupBy(col("group"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Cosine of every row against its own group's centroid — the
    * embedding-space outlier/quality score of a curation pipeline (rows
    * far from their language/domain centroid are mislabeled or noise).
    * Output: (id, group, score), score rounded to 4 dp.
    *
    * One aggregation pass builds the centroids ([[groupCentroids]]),
    * which broadcast-join back on the group key: the corpus itself is
    * never shuffled. The dot/norm folds run in index order in double
    * (zip_with + sequential aggregate, same association as
    * [[VectorFunctions.cosine]]), mirrored in oracle SQL. */
  def centroidCosineScores(
      df: DataFrame, id: Column, group: Column, vec: Column): DataFrame = {
    val cents = groupCentroids(df, group, vec)
    val dotCol = {
      val prods = zip_with(col("v"), col("centroid"),
        (a, b) => a.cast("double") * b)
      aggregate(prods, lit(0.0d), (acc, x) => acc + x)
    }
    val vNormSq = aggregate(
      transform(col("v"), a => a.cast("double") * a.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val cNormSq = aggregate(
      transform(col("centroid"), b => b * b), lit(0.0d), (acc, x) => acc + x)
    df.select(id.as("id"), group.as("group"), vec.as("v"))
      .join(broadcast(cents), "group")
      .withColumn("score",
        round(dotCol / (sqrt(vNormSq) * sqrt(cNormSq)), 4))
      .select(col("id"), col("group"), col("score"))
  }

  /** Label-noise screen (confident-learning-lite): score every vector
    * against ALL label centroids and flag the rows whose best-matching
    * centroid is NOT their own label — the classic mislabeled-example
    * candidates of a labeled-embedding QA pass, with the
    * best-versus-own margin as the triage order. Complements
    * [[centroidCosineScores]] (distance from OWN centroid finds
    * outliers; cross-centroid argmax finds plausible RELABELS).
    *
    * Output: (id, label, best_label, own_score, best_score, margin)
    * for flagged rows only, margin = best − own rounded at 4 dp,
    * deterministic (argmax ties break on the smaller label; scores are
    * 4-dp-rounded before comparison so engines agree on the argmax
    * itself).
    *
    * Scale shape: the centroid table is one aggregation pass
    * (|labels|·dim rows), broadcast; every vector scores |labels|
    * centroids in one projection — a |labels|-row broadcast cross, the
    * corpus shuffles only for the per-id argmax aggregation, keyed on
    * (id, label), which AQE-coalesces to the id hash. At thousands of
    * labels, pre-reduce with an ANN shortlist over the centroid table;
    * at the 10–100-label regime this exhaustive form IS the scale
    * path. */
  def labelNoiseScreen(
      df: DataFrame, id: Column, label: Column, vec: Column): DataFrame = {
    val cents = groupCentroids(df, label, vec)
    val dotCol = {
      val prods = zip_with(col("v"), col("centroid"),
        (a, b) => a.cast("double") * b)
      aggregate(prods, lit(0.0d), (acc, x) => acc + x)
    }
    val vNormSq = aggregate(
      transform(col("v"), a => a.cast("double") * a.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val cNormSq = aggregate(
      transform(col("centroid"), b => b * b), lit(0.0d), (acc, x) => acc + x)
    Dedup.spread(df).select(id.as("id"), label.as("lbl"), vec.as("v"))
      .crossJoin(broadcast(cents))
      .withColumn("score",
        round(dotCol / (sqrt(vNormSq) * sqrt(cNormSq)), 4))
      .groupBy(col("id"), col("lbl"))
      .agg(
        min(struct((-col("score")).as("ns"), col("group").as("g")))
          .as("best"),
        max(when(col("group") === col("lbl"), col("score"))).as("own_score"))
      .select(col("id"), col("lbl").as("label"),
        col("best.g").as("best_label"),
        col("own_score"),
        (-col("best.ns")).as("best_score"))
      .filter(col("best_label") =!= col("label"))
      .withColumn("margin", round(col("best_score") - col("own_score"), 4))
      .orderBy(desc("margin"), asc("id"))
  }

  /** Truncated-dimension recall audit (the Matryoshka/MRL storage
    * decision table): for each prefix dimensionality `d` in `dims`,
    * exact cosine top-`k` using only the vectors' FIRST `d` components,
    * scored against the full-dimension top-`k` as ground truth —
    * "how much recall do we keep if we store only d dims per vector?".
    * The answer decides the dominant storage/bandwidth knob of an
    * embedding pipeline (a 64→16 truncation is a 4× cut on every scan
    * downstream). Output: (dim, recall), recall = |top_d ∩ top_full|
    * over the ACTUAL truth-list size (= k when the corpus has at least
    * k rows, fewer otherwise), rounded to 4 dp; the full dimension
    * itself appears as the recall=1 control row when included in
    * `dims` — including on a sub-k corpus, which a literal-k
    * denominator would misreport as recall < 1.
    *
    * Scale shape: one [[bruteForceTopK]] per probed dimension — each a
    * single corpus scan over a PREFIX slice (columnar float arrays:
    * the slice is allocation-bounded by d, and at production scale the
    * truncated column would be materialized once, [[randomProjection]]
    * discipline) into a TakeOrderedAndProject; the recall joins touch
    * k-row frames only. */
  def truncatedDimRecall(
      corpus: DataFrame, id: Column, vec: Column, query: DataFrame,
      dims: Seq[Int], k: Int): DataFrame = {
    require(dims.nonEmpty, "need at least one probe dimension")
    val fullTruth = bruteForceTopK(corpus, id, vec, query, k)
      .select(col("id"))
    // Denominator is the ACTUAL ground-truth list size, not the literal
    // k: a corpus with fewer than k rows yields truth lists shorter than
    // k, and dividing by k would report recall < 1 even for the
    // full-dimension control row. 1-row broadcast, q22's scalar shape.
    val truthN = fullTruth.agg(count(lit(1)).as("__truth_n"))
    dims.map { d =>
      val topD = bruteForceTopK(
        corpus.select(id.as("__tid"), slice(vec, 1, d).as("__tv")),
        col("__tid"), col("__tv"),
        query.select(slice(col("qv"), 1, d).as("qv")), k)
      topD.join(fullTruth, Seq("id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(truthN))
        .select(lit(d).as("dim"),
          round(col("hits").cast("double") / col("__truth_n").cast("double"),
            4).as("recall"))
    }.reduce(_ unionAll _).orderBy(asc("dim"))
  }

  /** The deterministic ±1 entry (outRow, inCol) of the random-projection
    * matrix: +1 iff the first hex digit of md5("`seed`_i_j") is even —
    * the library's engine-portable md5 discipline ([[Split]]'s split
    * tag / hash fraction), so an oracle (or another engine) rebuilds the
    * IDENTICAL matrix from the seed alone. */
  private[graft] def rpSign(seed: String, i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${seed}_${i}_${j}".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss dimensionality reduction with a dense ±1
    * sign matrix (Achlioptas 2003's database-friendly variant, signs
    * from [[rpSign]]): out[i] = round(Σ_j v[j]·s(i,j) / √outDim, 6).
    *
    * The matrix is an outDim·inDim LITERAL baked into the plan — the
    * projection is a pure codegen'd map over the corpus: zero shuffle,
    * zero join, no per-row hashing (signs are row-independent, so they
    * are computed ONCE on the driver, not n·k·d times on executors).
    * Each component folds products left-to-right in double via
    * zip_with + sequential aggregate — the same association order as
    * DuckDB's `list_reduce`, and 0.0+x ≡ x in IEEE, so the 6-dp round
    * is engine-reproducible, the [[groupCentroids]] discipline.
    *
    * At scale this is the write-once column that makes everything
    * downstream cheaper: materialize (id, pv) next to the corpus and
    * ANN shortlists ([[projectedTopK]]), clustering, and dedup probes
    * scan outDim doubles instead of inDim — a d/outDim bandwidth cut
    * on every subsequent pass. Output: (id, pv: array&lt;double&gt;). */
  def randomProjection(
      corpus: DataFrame, id: Column, vec: Column,
      inDim: Int, outDim: Int, seed: String = "rp"): DataFrame =
    Dedup.spread(corpus)
      .select(id.cast("long").as("id"), vec.as("v"))
      .select(col("id"), projectedVec(col("v"), inDim, outDim, seed)
        .as("pv"))

  /** The [[randomProjection]] column expression on its own — the same
    * seeded ±1 sign literal, fold order, 6-dp round, and wrong-dim →
    * null guard — so operators that need the projection NEXT TO other
    * columns ([[hardNegativesShortlist]] carries the label through)
    * project inline instead of paying a corpus-sized id join against
    * randomProjection's (id, pv) output. */
  private[graft] def projectedVec(
      v: Column, inDim: Int, outDim: Int, seed: String): Column = {
    require(inDim >= 1 && outDim >= 1, "dims must be positive")
    val scale = math.sqrt(outDim.toDouble)
    val rows = (0 until outDim).map { i =>
      typedLit((0 until inDim).map(j => rpSign(seed, i, j)))
    }
    val pv = array(rows.map { signs =>
      round(
        aggregate(
          zip_with(v, signs, (a, s) => a.cast("double") * s),
          lit(0.0d), (acc, x) => acc + x) / lit(scale), 6)
    }: _*)
    when(size(v) === inDim, pv)
  }

  /** Sign-bucket layout audit for the projected space: bucket every
    * vector by the SIGN PATTERN of its [[randomProjection]] coordinates
    * (bit i set ⟺ pv_i ≥ 0 — md5-seeded hyperplane LSH in the reduced
    * space, so unlike the Murmur3 [[bucketize]] path it is
    * oracle-expressible), then report the one-row index-health summary
    * every ANN deployment watches:
    *
    *   - n_vectors / n_skipped (wrong-dimension rows bucket nowhere),
    *   - n_buckets, max_size, mean_size (4 dp),
    *   - imbalance = max/mean (4 dp) — 1.0 is a perfectly level index,
    *   - probe_cost = Σ size² / N² (6 dp) — the expected fraction of
    *     the corpus a single-probe query scans when queries distribute
    *     like the corpus; the number that says whether the index
    *     actually prunes.
    *
    * Scale shape: one projection scan (the 16-fold literal map), one
    * hash aggregate on the bucket id, one bucket-cardinality-sized
    * summary aggregate. Σ size² accumulates as a long — exact in both
    * engines at any realistic bucket census (overflow needs a single
    * bucket past ~3 · 10⁹ vectors; shard the audit per partition
    * before that point). */
  def rpBucketAudit(
      corpus: DataFrame, id: Column, vec: Column,
      inDim: Int, outDim: Int, seed: String = "rp"): DataFrame = {
    require(outDim <= 62, "outDim must fit a long's sign-bit budget")
    val proj = randomProjection(corpus, id, vec, inDim, outDim, seed)
    // Statically unrolled sign-bit sum (outDim is a literal): each term
    // is a constant shift, the whole bucket id constant-folds into one
    // codegen'd projection — no HOF, no per-row lambda allocation.
    val bucketBits = (0 until outDim).map { i =>
      when(element_at(col("pv"), i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = proj.withColumn("bucket", bucketBits)
    val skipped = proj.agg(
      sum(when(col("pv").isNull, 1L).otherwise(0L)).as("n_skipped"))
    val sizes = bucketed.filter(col("pv").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("sz"))
    sizes.agg(
        sum(col("sz")).as("n_vectors"),
        count(lit(1)).as("n_buckets"),
        max(col("sz")).as("max_size"),
        sum(col("sz") * col("sz")).as("__sumsq"))
      .crossJoin(broadcast(skipped))
      .select(
        col("n_vectors"), col("n_skipped"), col("n_buckets"),
        col("max_size"),
        round(col("n_vectors").cast("double") /
          col("n_buckets").cast("double"), 4).as("mean_size"),
        round(col("max_size").cast("double") * col("n_buckets").cast("double") /
          col("n_vectors").cast("double"), 4).as("imbalance"),
        round(col("__sumsq").cast("double") /
          (col("n_vectors") * col("n_vectors")).cast("double"), 6)
          .as("probe_cost"))
  }

  /** ANN through the projected space: exact cosine in outDim doubles
    * picks a `shortlist`-sized candidate set (TakeOrderedAndProject —
    * never a global sort), then the candidates alone are re-scored with
    * EXACT full-dimension cosine and the top `k` survive. Same
    * completeness gate as [[pqTopK]]'s rerank: `shortlist ≥ |corpus|`
    * degenerates to exact brute force by construction.
    *
    * Scale shape: the scan side touches only the projected column (the
    * inDim/outDim bandwidth cut — with outDim = 16 on a 1536-dim
    * production embedding that is 96× less data per probe); the
    * full-dimension rerank reads `shortlist` rows via a broadcast
    * semi-join on id. Query projected once on the driver (1-row
    * collect), shipped as a literal. Output: (id, sim) — identical
    * contract to [[bruteForceTopK]]. */
  def projectedTopK(
      corpus: DataFrame, id: Column, vec: Column, query: DataFrame,
      inDim: Int, outDim: Int, shortlist: Int, k: Int,
      seed: String = "rp"): DataFrame =
    projectedTopKPrebuilt(corpus, id, vec,
      randomProjection(corpus, id, vec, inDim, outDim, seed),
      query, inDim, outDim, shortlist, k, seed)

  /** [[projectedTopK]] against an ALREADY-MATERIALIZED projected column
    * — the steady-state form the operator exists for: build the
    * (id, pv) frame once, land it as plain parquet beside the corpus
    * (no special layout needed — the probe IS a full scan of outDim
    * doubles, so columnar storage is already optimal; reload is
    * `spark.read.parquet`), probe many times. `projected` must be
    * [[randomProjection]]'s output under the same seed/dims. */
  def projectedTopKPrebuilt(
      corpus: DataFrame, id: Column, vec: Column, projected: DataFrame,
      query: DataFrame, inDim: Int, outDim: Int, shortlist: Int, k: Int,
      seed: String = "rp"): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val c = Dedup.spread(corpus)
      .select(id.cast("long").as("id"), vec.as("v"))
    val qp = randomProjection(
      query.select(lit(0L).as("qid"), col("qv").as("v")),
      col("qid"), col("v"), inDim, outDim, seed)
      .collect()(0).getSeq[Double](1)
    val pq = typedLit(qp)
    // pv/pq are array<double> — the HOF fold, not the float-only native
    // FloatVecDot expression.
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
    val cand = projected
      .withColumn("psim",
        ddot(col("pv"), pq) /
          (sqrt(ddot(col("pv"), col("pv"))) * sqrt(ddot(pq, pq))))
      .orderBy(desc("psim"), asc("id"))
      .limit(shortlist)
      .select(col("id"))
    c.join(broadcast(cand), "id")
      .crossJoin(broadcast(
        query.withColumn("qnrm", sqrt(VectorFunctions.normSq(col("qv"))))))
      .withColumn("sim", round(
        VectorFunctions.dot(col("v"), col("qv")) /
          (sqrt(VectorFunctions.normSq(col("v"))) * col("qnrm")), 4))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
      .select(col("id"), col("sim"))
  }
}
