package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Durable index lifecycle — "build once, probe for weeks" as gated
  * code, not prose (the round-14 verdict's last documented-but-prose
  * 100 TB swap point):
  *
  *   - MinHash corpus index: [[Dedup.writeCorpusIndex]] lands the band
  *     and verification relations as BUCKETED tables;
  *     [[Dedup.loadCorpusIndex]] in a FRESH session must probe
  *     bit-equal to the same-session build, and the probe's candidate
  *     join must be exchange-free on the bucketed corpus side (the
  *     whole point of the layout: the nightly shard pays only its own
  *     shuffle, never a re-shuffle of the 100 TB index).
  *   - Index APPEND (round-16): [[Dedup.appendToCorpusIndex]] folds a
  *     new shard into the durable tables via `insertInto` (writes
  *     through the catalog bucket spec). Gates: append→reload→probe
  *     bit-equal to a FROM-SCRATCH rebuild on the unioned corpus, the
  *     exchange-free plan still green on the appended table, and
  *     straddling pairs (probe × old corpus AND probe × appended
  *     shard) both present — growth without the corpus-sized rebuild.
  *   - IVF ANN index: [[Similarity.writeIvfIndex]] lands posting lists
  *     PARTITIONED by list id; a reloaded [[Similarity.ivfTopK]] probe
  *     must be bit-equal to the same-session probe and its scan must
  *     carry the `list IN (…)` PARTITION filter (pruning, not
  *     filtering: unprobed lists are never opened).
  *
  * "Fresh session" is `spark.newSession()` — separate session state
  * (separate temp views, confs, cached plans) over the shared
  * metastore, the same isolation a next-day probe job has.
  *
  * Every fixture below is order-independent (shared `lazy val`s, built
  * by whichever test runs first — a `-z` single-test run still works)
  * and lands under per-run names/paths, so concurrent suite runs never
  * collide on a shared warehouse or /tmp. */
class IndexLifecycleSpec extends SparkSpec {

  private val runId =
    java.util.UUID.randomUUID.toString.replace("-", "").take(8)
  private def tmpDir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$runId"

  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec => f }

  /** The MAXIMAL subtree whose only data source is `table` — i.e. the
    * whole join side fed by that table's scan, up to (but not
    * including) the operator that merges it with anything else. An
    * exchange in here means the bucketed layout was ignored; an
    * exchange above it belongs to the other (shard) side and is
    * expected. */
  private def subtreeWithTable(p: SparkPlan, table: String): Option[SparkPlan] = {
    val candidates = p.collect {
      case n if {
        val scans = scansOf(n)
        val named = scans.flatMap(_.tableIdentifier.map(_.table))
        scans.nonEmpty && scans.size == named.size && named.forall(_ == table)
      } => n
    }
    if (candidates.isEmpty) None
    else Some(candidates.maxBy(_.collect { case x => x }.size))
  }

  /** Asserts the probe plan reads BOTH bucketed index relations with
    * zero exchange — the layout guarantee the lifecycle exists for.
    * Broadcast and AQE off so the no-exchange plan is genuinely the
    * bucket co-location, not a small-side shortcut (BucketedJoinSpec's
    * discipline); persistNewRel=false keeps the probe plan lazy so the
    * join is visible (the default path eagerly pins its result). */
  private def assertExchangeFreeProbe(prefix: String): Unit = {
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val loaded = Dedup.loadCorpusIndex(fresh, prefix)
    val probe = Dedup.nearDupAgainstIndex(
      Tables.documents(fresh, sf).filter(col("source") === "src0"),
      col("doc_id"), col("text"), loaded, threshold = 0.8,
      persistNewRel = false)
    val plan = probe.queryExecution.executedPlan
    val bandedSide = subtreeWithTable(plan, s"${prefix}_banded")
    assert(bandedSide.isDefined, s"banded table scan not found in:\n$plan")
    val exchanges = bandedSide.get.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"bucketed corpus side still shuffles:\n${bandedSide.get}")
    // The verification side is bucketed by id — that join must also
    // read the corpus relation exchange-free.
    val relSide = subtreeWithTable(plan, s"${prefix}_rel")
    assert(relSide.isDefined, s"rel table scan not found in:\n$plan")
    assert(relSide.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"bucketed rel side still shuffles:\n${relSide.get}")
  }

  private def probePairs(
      s: org.apache.spark.sql.SparkSession,
      index: Dedup.CorpusIndex): Seq[Row] =
    Dedup.nearDupAgainstIndex(
        Tables.documents(s, sf).filter(col("source") === "src0"),
        col("doc_id"), col("text"), index, threshold = 0.8)
      .orderBy("new_id", "corpus_id").collect().toSeq

  /** Write-once fixture: index on everything-but-src0, landed as
    * bucketed tables; `same` is the same-session build's probe. */
  private lazy val writtenIndex: (String, Seq[Row]) = {
    val prefix = s"graft_idx_lc_$runId"
    val corpus = Tables.documents(spark, sf).filter(col("source") =!= "src0")
    val built = Dedup.corpusIndex(corpus, col("doc_id"), col("text"))
    val same = probePairs(spark, built)
    Dedup.writeCorpusIndex(built, prefix, buckets = 4)
    built.unpersist()
    (prefix, same)
  }

  test("MinHash index: fresh-session reload probe ≡ same-session build probe, bit-equal") {
    val (prefix, same) = writtenIndex
    val fresh = spark.newSession()
    val loaded = Dedup.loadCorpusIndex(fresh, prefix)
    assert((loaded.n, loaded.k, loaded.bands) === ((3, 60, 20)),
      "meta must pin the build's shingle/signature scheme")
    val reload = probePairs(fresh, loaded)
    assert(same.nonEmpty, "fixture must produce near-dup pairs")
    assert(reload === same, "reloaded probe must be bit-equal to the build probe")
  }

  test("MinHash index: reloaded probe join is exchange-free on the bucketed corpus side") {
    assertExchangeFreeProbe(writtenIndex._1)
  }

  test("loadCorpusIndex: a wrong prefix fails with a message naming it") {
    val e = intercept[IllegalArgumentException] {
      Dedup.loadCorpusIndex(spark.newSession(), s"graft_no_such_$runId")
    }
    assert(e.getMessage.contains(s"graft_no_such_$runId"))
    val bad = intercept[IllegalArgumentException] {
      Dedup.loadCorpusIndex(spark, "bad-prefix; DROP TABLE x")
    }
    assert(bad.getMessage.contains("identifier"))
  }

  /** Append fixture. Old corpus = everything except src0/src8/src12;
    * appended shard = src8 ∪ src12. The src0 probe has true pairs in
    * BOTH halves (src2/src10/src11 old, src8/src12 appended — verified
    * against the exhaustive oracle at this sf), so the gates exercise
    * genuine straddling, not just old-corpus recall. `rebuilt` is the
    * from-scratch index on the unioned corpus — the expensive path the
    * append replaces, and its probe is the equivalence target. */
  private lazy val appendedIndex: (String, Seq[Row]) = {
    val prefix = s"graft_idx_ap_$runId"
    val docs = Tables.documents(spark, sf)
    val shardSrc = Seq("src8", "src12")
    val corpus0 = docs.filter(col("source") =!= "src0" &&
      !col("source").isInCollection(shardSrc))
    val shard = docs.filter(col("source").isInCollection(shardSrc))
    val built = Dedup.corpusIndex(corpus0, col("doc_id"), col("text"))
    Dedup.writeCorpusIndex(built, prefix, buckets = 4)
    built.unpersist()
    Dedup.appendToCorpusIndex(shard, col("doc_id"), col("text"), prefix)
    val rebuilt = Dedup.corpusIndex(
      docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"))
    val rebuildProbe = probePairs(spark, rebuilt)
    rebuilt.unpersist()
    (prefix, rebuildProbe)
  }

  test("append: reload→probe ≡ from-scratch rebuild probe on the unioned corpus, straddling pairs found") {
    val (prefix, rebuildProbe) = appendedIndex
    val fresh = spark.newSession()
    val loaded = Dedup.loadCorpusIndex(fresh, prefix)
    val appended = probePairs(fresh, loaded)
    assert(appended === rebuildProbe,
      "appended-index probe must be bit-equal to a from-scratch rebuild's")
    // Straddle: the probe must surface pairs against the OLD corpus and
    // against the APPENDED shard — i.e. the append really extended the
    // index rather than replacing or missing it.
    val srcOf = Tables.documents(fresh, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hitSrcs = appended.map(r => srcOf(r.getLong(1))).toSet
    assert(hitSrcs.exists(Set("src8", "src12")),
      s"no pair against the appended shard (hit sources: $hitSrcs)")
    assert(hitSrcs.exists(s => s != "src8" && s != "src12"),
      s"no pair against the original corpus (hit sources: $hitSrcs)")
  }

  test("append: probe join still exchange-free on the appended bucketed tables") {
    // insertInto writes THROUGH the catalog bucket spec, so the scan's
    // hash-distribution guarantee must survive the extra file per
    // bucket (only the per-file sort guarantee is lost, which the
    // probe join never relied on).
    assertExchangeFreeProbe(appendedIndex._1)
  }

  test("append: a prefix with no index fails with a message naming it") {
    val shard = Tables.documents(spark, sf).filter(col("source") === "src8")
    val e = intercept[IllegalArgumentException] {
      Dedup.appendToCorpusIndex(
        shard, col("doc_id"), col("text"), s"graft_no_idx_$runId")
    }
    assert(e.getMessage.contains(s"graft_no_idx_$runId"))
  }

  test("IVF index: write → fresh-session reload → probe ≡ build probe; probe scan partition-prunes to the probed lists") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    val same = Similarity.ivfTopK(centroids, indexed, qv, k = 10, nProbe = 3)
      .collect().toSeq
    val path = tmpDir("ivf_lc")
    Similarity.writeIvfIndex(centroids, indexed, path)

    val fresh = spark.newSession()
    // AQE off so the executed plan is walkable for the scan assertion
    // (AdaptiveSparkPlanExec hides its stages from SparkPlan.collect).
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val (cents2, indexed2) = Similarity.loadIvfIndex(fresh, path)
    assert(cents2.length === centroids.length)
    assert(cents2.zip(centroids).forall { case (a, b) => a.sameElements(b) },
      "reloaded centroids must be bit-equal, in list order")
    val probe = Similarity.ivfTopK(cents2, indexed2, qv, k = 10, nProbe = 3)
    assert(probe.collect().toSeq === same,
      "reloaded probe must be bit-equal to the build probe")
    // Partition pruning: the posting-list scan must carry the probe's
    // `list IN (…)` as a PARTITION filter (unprobed lists never open).
    val scan = scansOf(probe.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains(s"graft_ivf_lc_$runId")))
    assert(scan.isDefined, "posting-list scan not found")
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "list")),
      s"probe filter did not reach the partition layer:\n${scan.get}")
  }

  test("IVF build is partition-invariant: different shuffle-partition counts and input layouts produce bit-identical centroids and assignments") {
    // The r16 regression class: Spark-ML KMeans centroids (k-means||
    // init + partial aggregation) change with the partition layout even
    // at a fixed seed, so the same build at SPARK_GRAFT_CPUS=8 vs 32
    // returned different centroids and flipped q191's partial-probe
    // recall. The deterministic Lloyd fit must not: two sessions with
    // different shuffle-partition counts, fed differently-partitioned
    // input, must build the SAME index — including through the
    // bounded-sample path (fitSampleRows < corpus), whose sample is the
    // smallest (xxhash64(id), id) values — hash-ordered, deterministic —
    // not a partitioning-sensitive Bernoulli draw.
    def build(parts: Int, shuffle: Int,
        fitRows: Long): (Array[Array[Float]], Seq[Row]) = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
      val e = Tables.embeddings(s, sf).filter(col("vec_id") =!= 0)
        .repartition(parts)
      val (c, idx) = Similarity.ivfIndex(e, col("vec_id"),
        col("embedding"), nLists = 8, fitSampleRows = fitRows)
      (c, idx.select(col("id"), col("list")).orderBy(col("id"))
        .collect().toSeq)
    }
    for (fitRows <- Seq(100000L, 50L)) {
      val (c1, a1) = build(parts = 3, shuffle = 5, fitRows)
      val (c2, a2) = build(parts = 17, shuffle = 32, fitRows)
      assert(c1.length === c2.length)
      assert(c1.zip(c2).forall { case (x, y) => x.sameElements(y) },
        s"centroids must be bit-identical across partition layouts (fitSampleRows=$fitRows)")
      assert(a1 === a2,
        s"assignments must be identical across partition layouts (fitSampleRows=$fitRows)")
    }
  }

  test("IVF/PQ load: a wrong path fails with a message naming it") {
    val missing = tmpDir("no_such_index")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.loadIvfIndex(spark, missing)
    }
    assert(e1.getMessage.contains(missing))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.loadPqIndex(spark, missing)
    }
    assert(e2.getMessage.contains(missing))
  }

  test("projected column: land as parquet → fresh-session reload → prebuilt probe ≡ build probe") {
    // The fourth named in-session structure. Plain parquet IS the
    // layout (the probe is a full scan of outDim doubles — nothing to
    // prune by); the gate is that the reloaded (id, pv) frame feeds
    // projectedTopKPrebuilt bit-equal to the build session's.
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val projected = Similarity.randomProjection(
      corpus, col("vec_id"), col("embedding"), inDim = 64, outDim = 16)
    val same = Similarity.projectedTopKPrebuilt(
        corpus, col("vec_id"), col("embedding"), projected, query,
        inDim = 64, outDim = 16, shortlist = 50, k = 10)
      .collect().toSeq
    val path = tmpDir("rp_lc")
    projected.write.mode("overwrite").parquet(path)

    val fresh = spark.newSession()
    val reloaded = fresh.read.parquet(path)
    val emb2 = Tables.embeddings(fresh, sf)
    val probe = Similarity.projectedTopKPrebuilt(
        emb2.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
        reloaded, emb2.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv")),
        inDim = 64, outDim = 16, shortlist = 50, k = 10)
      .collect().toSeq
    assert(probe === same,
      "reloaded projected-column probe must be bit-equal to the build probe")
  }

  test("PQ index: write → fresh-session reload → probe ≡ build probe, codebooks bit-equal") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val (cbs, encoded) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16, iters = 2)
    val same = Similarity.pqTopK(cbs, encoded, corpus,
      col("vec_id"), col("embedding"), qv, k = 10, rerankN = 100)
      .collect().toSeq
    val path = tmpDir("pq_lc")
    Similarity.writePqIndex(cbs, encoded, path)

    val fresh = spark.newSession()
    val (cbs2, encoded2) = Similarity.loadPqIndex(fresh, path)
    assert(cbs2.map(p => (p._1, p._2)) == cbs.sortBy(p => (p._1, p._2)).map(p => (p._1, p._2)))
    val byKey = cbs.map(p => (p._1, p._2) -> p._3).toMap
    assert(cbs2.forall { case (j, cl, c) => c.sameElements(byKey((j, cl))) },
      "codebook doubles must round-trip parquet bit-exact")
    val probe = Similarity.pqTopK(cbs2, encoded2,
      Tables.embeddings(fresh, sf).filter(col("vec_id") =!= 0),
      col("vec_id"), col("embedding"), qv, k = 10, rerankN = 100)
    assert(probe.collect().toSeq === same,
      "reloaded PQ probe must be bit-equal to the build probe")
  }

  test("IVF append: full probe over the appended index ≡ exact brute force on the union; partial probe ≡ frozen-centroid assignment of the union; scan still partition-prunes") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) =!= 3)
    val shard = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) === 3)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val (centroids, indexed) = Similarity.ivfIndex(
      old, col("vec_id"), col("embedding"), nLists = 8)
    val path = tmpDir("ivf_append")
    Similarity.writeIvfIndex(centroids, indexed, path)
    Similarity.appendToIvfIndex(shard, col("vec_id"), col("embedding"), path)

    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val (cents, lists) = Similarity.loadIvfIndex(fresh, path)
    // Growth really happened: the reloaded lists hold old AND shard ids.
    val ids = lists.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids.exists(_ % 5 == 3) && ids.exists(_ % 5 != 3),
      "appended lists must contain both the old corpus and the shard")
    // Full probe (every list) is assignment-invariant: it must
    // reproduce exact brute force over the UNION — gating that every
    // appended vector is in the index and scored bit-identically.
    val union2 = Tables.embeddings(fresh, sf).filter(col("vec_id") =!= 0)
    val q2 = Tables.embeddings(fresh, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(
      union2, col("vec_id"), col("embedding"), q2, k = 10).collect().toSeq
    val full = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 8)
      .collect().toSeq
    assert(full === exact,
      "full probe over the appended index must equal exact brute force on the union")
    // Partial probe: bit-equal to the same probe over the union
    // assigned with the SAME frozen centroids — one assignment
    // definition (ivfAssign) on both sides, so the gate pins that
    // append places each shard vector exactly where a bulk
    // frozen-centroid assignment would.
    val bulk = Similarity.ivfAssign(
      union2, col("vec_id"), col("embedding"), cents)
    val partialAppended = Similarity
      .ivfTopK(cents, lists, qv, k = 10, nProbe = 3).collect().toSeq
    val partialBulk = Similarity
      .ivfTopK(cents, bulk, qv, k = 10, nProbe = 3).collect().toSeq
    assert(partialAppended === partialBulk,
      "partial probe over appended lists must equal the frozen-centroid bulk assignment's")
    // The layout guarantee survives the append: the probe scan still
    // carries the `list IN (…)` partition filter over the (now
    // multi-file-per-stripe) posting directories.
    val probe = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 3)
    val scan = scansOf(probe.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(
        _.toString.contains(s"graft_ivf_append_$runId")))
    assert(scan.isDefined, "posting-list scan not found")
    assert(scan.get.partitionFilters.exists(
      _.references.exists(_.name == "list")),
      s"probe filter did not reach the partition layer:\n${scan.get}")
  }

  test("PQ append: reload probe ≡ frozen-codebook encode of the union, bit-equal") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) =!= 3)
    val shard = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) === 3)
    val union = emb.filter(col("vec_id") =!= 0)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val (cbs, encoded) = Similarity.pqIndex(
      old, col("vec_id"), col("embedding"), m = 16, ksub = 16, iters = 2)
    val path = tmpDir("pq_append")
    Similarity.writePqIndex(cbs, encoded, path)
    Similarity.appendToPqIndex(shard, col("vec_id"), col("embedding"), path)

    // Equivalence target: encode the WHOLE union against the same
    // frozen codebooks in one pass (what a bulk build-time encode
    // would have produced) and probe it — pqEncode is the ONE shared
    // encode definition, so appended codes must be byte-identical.
    val bulkProbe = Similarity.pqTopK(cbs,
        Similarity.pqEncode(union, col("vec_id"), col("embedding"), cbs),
        union, col("vec_id"), col("embedding"), qv, k = 10, rerankN = 100)
      .collect().toSeq

    val fresh = spark.newSession()
    val (cbs2, codes2) = Similarity.loadPqIndex(fresh, path)
    val union2 = Tables.embeddings(fresh, sf).filter(col("vec_id") =!= 0)
    val probe = Similarity.pqTopK(cbs2, codes2, union2,
      col("vec_id"), col("embedding"), qv, k = 10, rerankN = 100)
      .collect().toSeq
    assert(probe === bulkProbe,
      "appended PQ probe must equal the frozen-codebook bulk encode's probe")
    // Growth really happened: the code table holds old AND shard ids.
    val ids = codes2.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids.exists(_ % 5 == 3) && ids.exists(_ % 5 != 3),
      "appended code table must contain both the old corpus and the shard")
  }

  test("IVF batch probe: 1-query batch ≡ per-query ivfTopK; multi-query partial probe keeps the recall floor; reloaded scan partition-prunes") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    val path = tmpDir("ivf_batch")
    Similarity.writeIvfIndex(centroids, indexed, path)

    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val (cents, lists) = Similarity.loadIvfIndex(fresh, path)
    val emb2 = Tables.embeddings(fresh, sf)
    val q0 = emb2.filter(col("vec_id") === 0)
    val qv = q0.select(col("embedding")).collect().head
      .getSeq[Float](0).toArray
    // A batch of one must reproduce the per-query driver form exactly —
    // same probe-list selection (cosine order, list tie-break), same
    // candidate scoring. (Query 0 is not in the corpus, so the batch
    // form's self-exclusion is a no-op here.)
    val single = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 3)
      .collect().toSeq
    val batch1 = Similarity.ivfTopKBatch(cents, lists,
        q0, col("vec_id"), col("embedding"), k = 10, nProbe = 3)
      .orderBy(asc("rank")).select(col("id"), col("sim"))
      .collect().toSeq
    assert(batch1 === single,
      "a 1-query batch must be bit-equal to the per-query ivfTopK probe")
    // Multi-query composition gate: a batch of 5 must equal the 5
    // one-query batches run separately — batching changes the PLAN
    // (one join, shared probed-stripe filter), never any query's
    // answer. (Partial-probe recall QUALITY is fixture-dependent —
    // the absolute contract lives in q78/q192's oracle gates; what
    // the batch form must guarantee is non-contamination.)
    val queries = emb2.filter(col("vec_id") < 5)
    val batch5 = Similarity.ivfTopKBatch(cents, lists,
        queries, col("vec_id"), col("embedding"), k = 10, nProbe = 3)
      .orderBy(asc("query_id"), asc("rank")).collect().toSeq
    val singly = (0L until 5L).flatMap { qid =>
      Similarity.ivfTopKBatch(cents, lists,
          queries.filter(col("vec_id") === qid),
          col("vec_id"), col("embedding"), k = 10, nProbe = 3)
        .orderBy(asc("rank")).collect().toSeq
    }
    assert(batch5 === singly,
      "a 5-query batch must equal the 5 one-query batches run separately")
    // The static probed-lists filter must reach the partition layer of
    // the reloaded scan — the batch probe opens only probed stripes.
    val probe = Similarity.ivfTopKBatch(cents, lists,
      q0, col("vec_id"), col("embedding"), k = 10, nProbe = 3)
    val scan = scansOf(probe.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(
        _.toString.contains(s"graft_ivf_batch_$runId")))
    assert(scan.isDefined, "posting-list scan not found")
    assert(scan.get.partitionFilters.exists(
      _.references.exists(_.name == "list")),
      s"probed-lists filter did not reach the partition layer:\n${scan.get}")
  }

  test("corpus-index delete: probe ≡ rebuilt-on-survivors; bucketed side still exchange-free through the tombstone anti-join; compaction erases physically, probe unchanged") {
    val prefix = s"graft_idx_del_$runId"
    val docs = Tables.documents(spark, sf)
    val delSrc = Seq("src8", "src12")
    val built = Dedup.corpusIndex(
      docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"))
    Dedup.writeCorpusIndex(built, prefix, buckets = 4)
    built.unpersist()
    val delIds = docs.filter(col("source").isInCollection(delSrc))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // Non-vacuous: before the delete, the probe surfaces pairs against
    // the soon-to-be-deleted docs (the fixture straddles — q190's).
    val before = probePairs(spark, Dedup.loadCorpusIndex(spark, prefix))
    assert(before.exists(r => delIds(r.getLong(1))),
      "fixture must have probe pairs against the to-be-deleted docs")
    Dedup.deleteFromCorpusIndex(
      docs.filter(col("source").isInCollection(delSrc))
        .select(col("doc_id")),
      col("doc_id"), prefix)
    // Equivalence target: an index REBUILT on the surviving corpus.
    val rebuilt = Dedup.corpusIndex(
      docs.filter(col("source") =!= "src0" &&
        !col("source").isInCollection(delSrc)),
      col("doc_id"), col("text"))
    val want = probePairs(spark, rebuilt)
    rebuilt.unpersist()
    val fresh = spark.newSession()
    val got = probePairs(fresh, Dedup.loadCorpusIndex(fresh, prefix))
    assert(got === want,
      "post-delete probe must equal the rebuilt-on-survivors probe")
    assert(got !== before, "the delete must have changed the probe")
    // The logical delete must not cost the layout: the bucketed corpus
    // relations still reach the probe join with ZERO exchange — the
    // tombstone anti-join broadcasts above the pruned scan.
    val fresh2 = spark.newSession()
    fresh2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fresh2.conf.set("spark.sql.adaptive.enabled", "false")
    val probe = Dedup.nearDupAgainstIndex(
      Tables.documents(fresh2, sf).filter(col("source") === "src0"),
      col("doc_id"), col("text"), Dedup.loadCorpusIndex(fresh2, prefix),
      threshold = 0.8, persistNewRel = false)
    val plan = probe.queryExecution.executedPlan
    for (t <- Seq(s"${prefix}_banded", s"${prefix}_rel")) {
      // Offending = an exchange whose ONLY sources are the bucketed
      // table and its tombstones — i.e. the bucketed side shuffled
      // BEFORE merging with the shard (exchanges above that merge
      // belong to the shard side and are expected, the
      // subtreeWithTable discipline).
      val ok = Set(t, s"${prefix}_tombstones")
      val offending = plan.collect {
        case e: ShuffleExchangeExec if {
          val scans = scansOf(e)
          scans.exists(_.tableIdentifier.exists(_.table == t)) &&
            scans.forall(_.tableIdentifier.exists(i => ok(i.table)))
        } => e
      }
      assert(offending.isEmpty,
        s"bucketed side of $t shuffles through the tombstone anti-join:\n$plan")
    }
    // Physical erasure: compaction rewrites both tables without the
    // tombstoned rows, drops the tombstones, and the probe is bit-equal.
    Dedup.compactCorpusIndex(spark, prefix)
    // The bucket layout is derived from the catalog, never re-laid on a
    // default: this index was written with 4 buckets and must stay 4.
    val spec = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${prefix}_banded"))
      .bucketSpec
    assert(spec.map(_.numBuckets) === Some(4),
      s"compaction must preserve the existing bucket count, got $spec")
    // Compaction re-seeds an EMPTY tombstones table (loads always
    // anti-join; nothing left to hide).
    assert(spark.table(s"${prefix}_tombstones").isEmpty,
      "compaction must leave an empty tombstones table")
    val fresh3 = spark.newSession()
    val got2 = probePairs(fresh3, Dedup.loadCorpusIndex(fresh3, prefix))
    assert(got2 === want, "compacted probe must equal the tombstoned probe")
    val relIds = spark.table(s"${prefix}_rel").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(relIds.intersect(delIds).isEmpty,
      "compaction must physically remove the deleted docs' index rows")
  }

  test("IVF delete + compact: tombstoned vectors vanish from every probe form; compaction is probe-bit-equal, physically erases, and resets stripe file counts") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val survivors = corpus.filter(pmod(col("vec_id"), lit(5)) =!= 3)
    val deleted = corpus.filter(pmod(col("vec_id"), lit(5)) === 3)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    // Build on 8/10 of the corpus and fold the rest in as two nightly
    // appends, so the compaction below has REAL accretion to undo (the
    // clustered build/append writers already keep one file per stripe
    // per write — accretion is per-append now, which is the point).
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus.filter(pmod(col("vec_id"), lit(10)) < 8),
      col("vec_id"), col("embedding"), nLists = 8)
    val path = tmpDir("ivf_del")
    Similarity.writeIvfIndex(centroids, indexed, path)
    for (night <- Seq(8, 9))
      Similarity.appendToIvfIndex(
        corpus.filter(pmod(col("vec_id"), lit(10)) === night),
        col("vec_id"), col("embedding"), path)
    Similarity.deleteFromIvfIndex(
      deleted.select(col("vec_id")), col("vec_id"), path)

    val fresh = spark.newSession()
    val (cents, lists) = Similarity.loadIvfIndex(fresh, path)
    // Full probe ≡ exact brute force on the SURVIVORS (assignment-
    // invariant — gates that deleted ids are invisible and nothing
    // else moved).
    val s2 = Tables.embeddings(fresh, sf).filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) =!= 3)
    val q2 = Tables.embeddings(fresh, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(
      s2, col("vec_id"), col("embedding"), q2, k = 10).collect().toSeq
    val full = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 8)
      .collect().toSeq
    assert(full === exact,
      "post-delete full probe must equal brute force on the survivors")
    // Partial probe ≡ the same probe over a frozen-centroid assignment
    // of the survivors (delete is an index op; centroids never move).
    val bulk = Similarity.ivfAssign(s2, col("vec_id"), col("embedding"), cents)
    val partial = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 3)
      .collect().toSeq
    val partialBulk = Similarity.ivfTopK(cents, bulk, qv, k = 10, nProbe = 3)
      .collect().toSeq
    assert(partial === partialBulk,
      "post-delete partial probe must equal the survivors' frozen-centroid probe")
    // The batch form routes through the same load — spot the contract.
    val batch = Similarity.ivfTopKBatch(cents, lists,
        q2.withColumn("vec_id", lit(0L)), col("vec_id"), col("qv"),
        k = 10, nProbe = 8)
      .orderBy(asc("rank")).select(col("id"), col("sim")).collect().toSeq
    assert(batch === exact, "batch probe must see the same post-delete index")

    // Compaction: probe bit-equal, tombstones gone, deleted ids
    // physically out of the files, one file per surviving stripe.
    def stripeFiles(): Map[String, Int] = {
      val base = new java.io.File(s"$path/lists")
      base.listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    }
    val filesBefore = stripeFiles()
    Similarity.compactIvfIndex(fresh, path)
    // Compaction re-seeds an EMPTY tombstone relation (always present,
    // so loads anti-join unconditionally; nothing left to hide).
    assert(fresh.read.parquet(s"$path/tombstones").isEmpty,
      "compaction must leave an empty tombstone relation")
    val filesAfter = stripeFiles()
    assert(filesAfter.values.forall(_ == 1),
      s"each surviving stripe must come back as ONE file, got $filesAfter")
    assert(filesBefore.values.sum > filesAfter.values.sum,
      "compaction must reduce the total file count")
    val fresh4 = spark.newSession()
    val (cents4, lists4) = Similarity.loadIvfIndex(fresh4, path)
    assert(cents4.zip(cents).forall { case (a, b) => a.sameElements(b) })
    assert(Similarity.ivfTopK(cents4, lists4, qv, k = 10, nProbe = 3)
      .collect().toSeq === partial,
      "compacted probe must be bit-equal to the tombstoned probe")
    val delIds = deleted.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    val fileIds = fresh4.read.parquet(s"$path/lists").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(fileIds.intersect(delIds).isEmpty,
      "compaction must physically remove the deleted vectors")
  }

  test("LSH + PQ delete/compact: the same two-phase contract on the other structures") {
    val nBits = 8
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val deleted = corpus.filter(pmod(col("vec_id"), lit(5)) === 3)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qv = q.collect().head.getSeq[Float](0).toArray
    val s2 = corpus.filter(pmod(col("vec_id"), lit(5)) =!= 3)

    // LSH: full-ball probe over the tombstoned index ≡ the filter form
    // over the survivors; compact → bit-equal, physically erased.
    val lshPath = tmpDir("lsh_del")
    Similarity.writeLshIndex(
      corpus, col("vec_id"), col("embedding"), nBits, lshPath)
    Similarity.deleteFromLshIndex(
      deleted.select(col("vec_id")), col("vec_id"), lshPath)
    val (nb, buckets) = Similarity.loadLshIndex(spark, lshPath)
    val wantLsh = Similarity.lshTopK(
      Similarity.bucketize(s2, col("vec_id"), col("embedding"), nBits),
      q, k = 10, nBits = nBits, probeHamming = nBits).collect().toSeq
    assert(Similarity.lshTopK(buckets, q, k = 10, nBits = nb,
      probeHamming = nb).collect().toSeq === wantLsh,
      "post-delete LSH full-ball probe must equal the survivors'")
    Similarity.compactLshIndex(spark, lshPath)
    assert(spark.read.parquet(s"$lshPath/tombstones").isEmpty)
    val (nb2, buckets2) = Similarity.loadLshIndex(spark, lshPath)
    assert(nb2 === nBits)
    assert(Similarity.lshTopK(buckets2, q, k = 10, nBits = nb2,
      probeHamming = nb2).collect().toSeq === wantLsh)
    val lshIds = buckets2.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(lshIds.forall(_ % 5 != 3),
      "LSH compaction must physically remove the deleted vectors")

    // PQ: post-delete ADC probe ≡ the survivors' encode under the same
    // frozen codebooks; compact → bit-equal, physically erased.
    val (cbs, encoded) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16, iters = 2)
    val pqPath = tmpDir("pq_del")
    Similarity.writePqIndex(cbs, encoded, pqPath)
    Similarity.deleteFromPqIndex(
      deleted.select(col("vec_id")), col("vec_id"), pqPath)
    val (cbs2, codes2) = Similarity.loadPqIndex(spark, pqPath)
    val wantPq = Similarity.pqTopK(cbs,
        Similarity.pqEncode(s2, col("vec_id"), col("embedding"), cbs),
        s2, col("vec_id"), col("embedding"), qv, k = 10, rerankN = 100)
      .collect().toSeq
    assert(Similarity.pqTopK(cbs2, codes2, s2,
      col("vec_id"), col("embedding"), qv, k = 10, rerankN = 100)
      .collect().toSeq === wantPq,
      "post-delete PQ probe must equal the survivors' frozen-codebook probe")
    Similarity.compactPqIndex(spark, pqPath)
    assert(spark.read.parquet(s"$pqPath/tombstones").isEmpty)
    val (cbs3, codes3) = Similarity.loadPqIndex(spark, pqPath)
    assert(Similarity.pqTopK(cbs3, codes3, s2,
      col("vec_id"), col("embedding"), qv, k = 10, rerankN = 100)
      .collect().toSeq === wantPq)
    val pqIds = codes3.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(pqIds.forall(_ % 5 != 3),
      "PQ compaction must physically remove the deleted vectors")
  }

  test("compacting an all-tombstoned index refuses loudly and mutates nothing") {
    // An empty survivor set would commit a data dir with no parquet
    // files (empty dynamic-partition writes emit nothing) and brick
    // the index with the backup gone — the guard must fire BEFORE any
    // mutation, and the refused index must stay loadable.
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    val path = tmpDir("ivf_all_del")
    Similarity.writeIvfIndex(centroids, indexed, path)
    Similarity.deleteFromIvfIndex(
      corpus.select(col("vec_id")), col("vec_id"), path)
    val e = intercept[IllegalArgumentException] {
      Similarity.compactIvfIndex(spark, path)
    }
    assert(e.getMessage.contains("EMPTY the index"))
    val (cents, lists) = Similarity.loadIvfIndex(spark, path)
    assert(cents.nonEmpty, "refused compaction must leave centroids intact")
    assert(lists.isEmpty,
      "all rows are tombstoned — logically empty, physically intact")
  }

  test("LSH index: write → append → reload; pruned Hamming-ball probe ≡ filter form, scan partition-prunes to the ball") {
    val nBits = 8
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) =!= 3)
    val shard = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) === 3)
    val path = tmpDir("lsh_lc")
    Similarity.writeLshIndex(
      old, col("vec_id"), col("embedding"), nBits, path)
    Similarity.appendToLshIndex(shard, col("vec_id"), col("embedding"), path)

    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val (nb, loaded) = Similarity.loadLshIndex(fresh, path)
    assert(nb === nBits, "meta must pin the build's nBits")
    // Growth really happened: buckets hold old AND shard ids.
    val ids = loaded.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids.exists(_ % 5 == 3) && ids.exists(_ % 5 != 3),
      "appended buckets must contain both the old corpus and the shard")
    // The pruned (bucket IN ball) form is the SAME set as the
    // bit_count filter form, so the probes must be bit-equal.
    val q = Tables.embeddings(fresh, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val pruned = Similarity.lshTopKPruned(
      loaded, q, k = 10, nBits = nb, probeHamming = 2)
    val filterForm = Similarity.lshTopK(
      loaded, q, k = 10, nBits = nb, probeHamming = 2)
    assert(pruned.collect().toSeq === filterForm.collect().toSeq,
      "pruned Hamming-ball probe must equal the bit_count filter form")
    // And the ball must reach the partition layer — the probe opens
    // only the ball's stripes, never the whole bucketed corpus.
    val scan = scansOf(pruned.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(
        _.toString.contains(s"graft_lsh_lc_$runId")))
    assert(scan.isDefined, "bucketed scan not found")
    assert(scan.get.partitionFilters.exists(
      _.references.exists(_.name == "bucket")),
      s"Hamming ball did not reach the partition layer:\n${scan.get}")
    // A ball past the enumeration guard fails loudly toward the
    // scan+filter form instead of silently exploding the plan.
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopKPruned(loaded, q, k = 10, nBits = nb,
        probeHamming = 8, maxProbeBuckets = 10)
    }
    assert(e.getMessage.contains("maxProbeBuckets"))
    // A meta/banding divergence is now impossible by construction (the
    // writer bands the raw vectors itself with the nBits it pins); what
    // remains rejectable is an nBits outside HyperplaneBucket64's
    // domain — pinning it would make every later probe/append throw.
    val bad = intercept[IllegalArgumentException] {
      Similarity.writeLshIndex(
        old, col("vec_id"), col("embedding"), nBits = 33, tmpDir("lsh_bad"))
    }
    assert(bad.getMessage.contains("[1, 32]"))
  }

  test("IVF+PQ composed index: write → append → reload probe ≡ exact; pruned scan reads CODES not vectors; delete/compact lifecycle; re-ingest guarded") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val old = corpus.filter(pmod(col("vec_id"), lit(5)) =!= 3)
    val shard = corpus.filter(pmod(col("vec_id"), lit(5)) === 3)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qv = q.collect().head.getSeq[Float](0).toArray
    // Frozen artifacts fit on the BUILD corpus (q196's composition).
    val (centroids, _) = Similarity.ivfIndex(
      old, col("vec_id"), col("embedding"), nLists = 8)
    val cbs = Similarity.ivfPqFitCodebooks(
      old, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = 1)
    val path = tmpDir("ivfpq_lc")
    Similarity.writeIvfPqIndex(centroids, cbs,
      Similarity.ivfPqEncode(
        old, col("vec_id"), col("embedding"), centroids, cbs), path)
    Similarity.appendToIvfPqIndex(
      shard, col("vec_id"), col("embedding"), path)

    val fresh = spark.newSession()
    // AQE off so the executed plan is walkable for the scan assertion
    // (AdaptiveSparkPlanExec hides its stages from SparkPlan.collect).
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val emb2 = Tables.embeddings(fresh, sf)
    val corpus2 = emb2.filter(col("vec_id") =!= 0)
    val (cents, cbs2, codes) = Similarity.loadIvfPqIndex(fresh, path)
    assert(cents.zip(centroids).forall { case (a, b) => a.sameElements(b) },
      "reloaded centroids must be bit-equal")
    assert(cbs2.encoding == cbs.encoding,
      "reloaded artifact must carry the meta-pinned encoding")
    assert(cbs2.codebooks.size == cbs.codebooks.size &&
      cbs2.codebooks.zip(cbs.codebooks).forall {
        case ((j1, c1, a1), (j2, c2, a2)) =>
          j1 == j2 && c1 == c2 && a1.sameElements(a2) },
      "reloaded codebooks must be bit-equal")
    // Composed completeness gate: all lists + corpus-sized rerank ≡
    // exact brute force over the appended union.
    val exact = Similarity.bruteForceTopK(
      corpus2, col("vec_id"), col("embedding"), q, k = 10).collect().toSeq
    val full = Similarity.ivfPqTopK(cents, cbs2, codes, corpus2,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 8,
      rerankN = 1 << 20).collect().toSeq
    assert(full === exact,
      "all-lists + corpus-rerank composed probe must equal brute force")
    // The bytes-per-probe gate: the pruned stripe scan reads (id,
    // codes) ONLY — never a float vector column — and the probe filter
    // reaches the partition layer. Asserted on the JOIN-form probe
    // (rerankN past RerankIsinMax keeps the shortlist subtree in the
    // final plan); the parameter-sized form collects the shortlist
    // eagerly, so its code scan runs as its own bounded job and the
    // returned frame carries only the id-IN rerank.
    val joinForm = Similarity.ivfPqTopK(cents, cbs2, codes, corpus2,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 3,
      rerankN = 100000)
    val scan = scansOf(joinForm.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(
        _.toString.contains(s"graft_ivfpq_lc_$runId")))
    assert(scan.isDefined, "composed code scan not found")
    assert(scan.get.partitionFilters.exists(
      _.references.exists(_.name == "list")),
      s"probe filter did not reach the partition layer:\n${scan.get}")
    assert(scan.get.requiredSchema.fieldNames.toSet === Set("id", "codes"),
      s"the pruned scan must read codes, not vectors — got " +
        s"${scan.get.requiredSchema.fieldNames.mkString(", ")}")
    // The parameter-sized rerank fetches by a PUSHED id filter — and
    // both fetch forms are bit-equal (the same shortlist row set).
    val isinForm = Similarity.ivfPqTopK(cents, cbs2, codes, corpus2,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 3,
      rerankN = 50)
    // The pushed filter names the SOURCE column (vec_id here — the
    // "id" alias is the projection above the scan).
    val isinScan = scansOf(isinForm.queryExecution.executedPlan)
      .find(_.metadata.get("PushedFilters").exists(_.contains("In(vec_id")))
    assert(isinScan.isDefined,
      "the parameter-sized rerank must push the id list into the scan:\n" +
        isinForm.queryExecution.executedPlan)
    // Fetch-form equality (join ≡ isin at the SAME shortlist) is gated
    // in the batch-probe test: the batch rerank keeps the join form
    // while the single-query probe collects + pushes, and the two must
    // produce identical rows at rerankN = 50.
    // Delete: probe ≡ the same probe over an index built on the
    // SURVIVORS with the same frozen artifacts.
    val deleted = corpus2.filter(pmod(col("vec_id"), lit(10)) === 2)
    val survivors = corpus2.filter(pmod(col("vec_id"), lit(10)) =!= 2)
    Similarity.deleteFromIvfPqIndex(
      deleted.select(col("vec_id")), col("vec_id"), path)
    val fresh2 = spark.newSession()
    val (_, _, codes2) = Similarity.loadIvfPqIndex(fresh2, path)
    val wantSurv = Similarity.ivfPqTopK(cents, cbs2,
      Similarity.ivfPqEncode(
        survivors, col("vec_id"), col("embedding"), cents, cbs2),
      survivors, col("vec_id"), col("embedding"), qv,
      k = 10, nProbe = 8, rerankN = 1 << 20).collect().toSeq
    val gotSurv = Similarity.ivfPqTopK(cents, cbs2, codes2, survivors,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 8,
      rerankN = 1 << 20).collect().toSeq
    assert(gotSurv === wantSurv,
      "post-delete composed probe must equal the rebuilt-on-survivors probe")
    // Re-ingest guard names the composed compaction verb.
    val eR = intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqIndex(
        deleted, col("vec_id"), col("embedding"), path)
    }
    assert(eR.getMessage.contains("compactIvfPqIndex"))
    // Compact: probe bit-equal, tombstones reset, physical erasure,
    // one file per surviving stripe.
    Similarity.compactIvfPqIndex(fresh2, path)
    assert(fresh2.read.parquet(s"$path/tombstones").isEmpty)
    val fresh3 = spark.newSession()
    val (cents3, cbs3, codes3) = Similarity.loadIvfPqIndex(fresh3, path)
    assert(cents3.zip(cents).forall { case (a, b) => a.sameElements(b) })
    assert(Similarity.ivfPqTopK(cents3, cbs3, codes3, survivors,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 8,
      rerankN = 1 << 20).collect().toSeq === wantSurv,
      "compacted composed probe must be bit-equal to the tombstoned probe")
    val delIds = deleted.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    val fileIds = fresh3.read.parquet(s"$path/lists").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(fileIds.intersect(delIds).isEmpty,
      "compaction must physically remove the deleted codes")
    val stripeFiles = new java.io.File(s"$path/lists").listFiles()
      .filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
    assert(stripeFiles.values.forall(_ == 1),
      s"each surviving stripe must come back as ONE file, got $stripeFiles")
  }

  test("IVF+PQ batch probe: full probe + corpus rerank ≡ exhaustive batch KNN; 1-query finite-rerank batch ≡ single-query probe; pruned scan reads codes") {
    val emb = Tables.embeddings(spark, sf)
    val (centroids, _) = Similarity.ivfIndex(
      emb, col("vec_id"), col("embedding"), nLists = 8)
    val cbs = Similarity.ivfPqFitCodebooks(
      emb, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = 1)
    val path = tmpDir("ivfpq_batch")
    Similarity.writeIvfPqIndex(centroids, cbs,
      Similarity.ivfPqEncode(
        emb, col("vec_id"), col("embedding"), centroids, cbs), path)
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val emb2 = Tables.embeddings(fresh, sf)
    val (cents, cbs2, codes) = Similarity.loadIvfPqIndex(fresh, path)
    val n = emb2.count().toInt
    // Composed completeness: every list probed + every row reranked ≡
    // the exhaustive batch KNN, row for row (q197's oracle contract).
    val batch = Similarity.ivfPqTopKBatch(cents, cbs2, codes,
      emb2, col("vec_id"), col("embedding"),
      emb2.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
      k = 5, nProbe = 8, rerankN = n)
    val want = Similarity.bruteForceTopKBatch(
      emb2, col("vec_id"), col("embedding"),
      emb2.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      col("qid"), col("qv"), k = 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(asc("query_id"), asc("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(rows(batch) === rows(want),
      "full-probe corpus-rerank batch must equal exhaustive batch KNN")
    // ADC bit-mirror: at a FINITE rerank the shortlist membership is
    // decided by the batch ADC expression — a 1-query batch must pick
    // the same survivors (and thus the same final rows) as the
    // single-query driver-LUT probe.
    val qv = emb2.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val one = Similarity.ivfPqTopKBatch(cents, cbs2, codes,
        emb2.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
        emb2.filter(col("vec_id") === 0), col("vec_id"), col("embedding"),
        k = 10, nProbe = 3, rerankN = 50)
      .select(col("id"), col("sim")).orderBy(asc("rank"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val single = Similarity.ivfPqTopK(cents, cbs2,
        codes.filter(col("id") =!= 0),
        emb2.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
        qv, k = 10, nProbe = 3, rerankN = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(one === single,
      "1-query batch at finite rerank must equal the single-query probe")
    // The scale levers: probe filter at the partition layer, scan
    // schema is (id, codes) — one long per probed row.
    val scan = scansOf(batch.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(
        _.toString.contains(s"graft_ivfpq_batch_$runId")))
    assert(scan.isDefined, "composed code scan not found")
    assert(scan.get.partitionFilters.exists(
      _.references.exists(_.name == "list")),
      s"batch probe filter did not reach the partition layer:\n${scan.get}")
    assert(scan.get.requiredSchema.fieldNames.toSet === Set("id", "codes"),
      "the batch probe must read codes, not vectors")
  }

  test("re-ingesting a tombstoned id fails readably on every append path; compaction makes it legal and the rows visible again") {
    // The churn workflow (delete by mistake, re-add): before the guard,
    // the append landed rows that every load anti-joined away — the id
    // silently vanished until a compaction. Now the append names the
    // fix, and after compaction the re-ingest round-trips.
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val churn = corpus.filter(pmod(col("vec_id"), lit(5)) === 3)
    val churnIds = churn.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet

    // IVF: full delete → append(fails) → compact → append(ok) cycle.
    val ivfPath = tmpDir("ivf_reingest")
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    Similarity.writeIvfIndex(centroids, indexed, ivfPath)
    Similarity.deleteFromIvfIndex(
      churn.select(col("vec_id")), col("vec_id"), ivfPath)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(
        churn, col("vec_id"), col("embedding"), ivfPath)
    }
    assert(e1.getMessage.contains("compactIvfIndex"),
      s"the error must name the compaction verb, got: ${e1.getMessage}")
    // The refused append mutated nothing: the loaded index still hides
    // the churn ids and holds no duplicate rows.
    val (_, lists1) = Similarity.loadIvfIndex(spark.newSession(), ivfPath)
    val ids1 = lists1.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids1.intersect(churnIds).isEmpty,
      "refused append must not surface tombstoned ids")
    Similarity.compactIvfIndex(spark, ivfPath)
    Similarity.appendToIvfIndex(
      churn, col("vec_id"), col("embedding"), ivfPath)
    val (_, lists2) = Similarity.loadIvfIndex(spark.newSession(), ivfPath)
    val ids2 = lists2.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(churnIds.subsetOf(ids2),
      "post-compaction re-ingest must be visible on the next load")

    // LSH + PQ: the same guard fires with the family's verb named.
    val lshPath = tmpDir("lsh_reingest")
    Similarity.writeLshIndex(
      corpus, col("vec_id"), col("embedding"), nBits = 8, lshPath)
    Similarity.deleteFromLshIndex(
      churn.select(col("vec_id")), col("vec_id"), lshPath)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.appendToLshIndex(
        churn, col("vec_id"), col("embedding"), lshPath)
    }
    assert(e2.getMessage.contains("compactLshIndex"))
    val (cbs, encoded) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16, iters = 1)
    val pqPath = tmpDir("pq_reingest")
    Similarity.writePqIndex(cbs, encoded, pqPath)
    Similarity.deleteFromPqIndex(
      churn.select(col("vec_id")), col("vec_id"), pqPath)
    val e3 = intercept[IllegalArgumentException] {
      Similarity.appendToPqIndex(
        churn, col("vec_id"), col("embedding"), pqPath)
    }
    assert(e3.getMessage.contains("compactPqIndex"))

    // Corpus index: same cycle through the catalog-table family.
    val prefix = s"graft_idx_reingest_$runId"
    val docs = Tables.documents(spark, sf)
    val churnDocs = docs.filter(col("source") === "src8")
    val churnDocIds = churnDocs.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val built = Dedup.corpusIndex(
      docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"))
    Dedup.writeCorpusIndex(built, prefix, buckets = 4)
    built.unpersist()
    Dedup.deleteFromCorpusIndex(
      churnDocs.select(col("doc_id")), col("doc_id"), prefix)
    val e4 = intercept[IllegalArgumentException] {
      Dedup.appendToCorpusIndex(
        churnDocs, col("doc_id"), col("text"), prefix)
    }
    assert(e4.getMessage.contains("compactCorpusIndex"),
      s"the error must name the compaction verb, got: ${e4.getMessage}")
    Dedup.compactCorpusIndex(spark, prefix)
    Dedup.appendToCorpusIndex(churnDocs, col("doc_id"), col("text"), prefix)
    val reIds = Dedup.loadCorpusIndex(spark.newSession(), prefix)
      .rel.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(churnDocIds.subsetOf(reIds),
      "post-compaction re-ingest must be visible to a fresh load")
  }

  test("indexHealth + compactIfNeeded: the measured knee becomes policy — below it a no-op, past it the family's compact fires") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val path = tmpDir("ivf_health")
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus.filter(pmod(col("vec_id"), lit(10)) < 8),
      col("vec_id"), col("embedding"), nLists = 8)
    Similarity.writeIvfIndex(centroids, indexed, path)
    for (night <- Seq(8, 9))
      Similarity.appendToIvfIndex(
        corpus.filter(pmod(col("vec_id"), lit(10)) === night),
        col("vec_id"), col("embedding"), path)
    val h = Similarity.indexHealth(spark, path).collect().head
    assert(h.getAs[String]("kind") === "ivf")
    assert(h.getAs[Int]("max_files_per_stripe") >= 2,
      "two nightly appends must show as accreted stripe files")
    assert(h.getAs[Boolean]("tombstone_broadcast_ok"))
    assert(!h.getAs[Boolean]("needs_compaction"),
      "2 files/stripe is far below the measured 64-file knee")
    // Below the knee: a no-op — returns false, layout untouched.
    val filesBefore = new java.io.File(s"$path/lists").listFiles()
      .filter(_.isDirectory)
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(!Similarity.compactIfNeeded(spark, path))
    val filesAfterNoop = new java.io.File(s"$path/lists").listFiles()
      .filter(_.isDirectory)
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(filesAfterNoop === filesBefore, "below-knee call must not rewrite")
    // Past the knee (knob tightened to the accreted state): fires the
    // IVF compact, resets to one file per stripe, and the health row
    // goes green even at the tight knob.
    assert(Similarity.compactIfNeeded(spark, path, maxFilesPerStripe = 1))
    val h2 = Similarity.indexHealth(spark, path, maxFilesPerStripe = 1)
      .collect().head
    assert(h2.getAs[Int]("max_files_per_stripe") === 1)
    assert(!h2.getAs[Boolean]("needs_compaction"))
    // Tombstone-volume trigger: a delete stream trips the bytes knob.
    Similarity.deleteFromIvfIndex(
      corpus.filter(pmod(col("vec_id"), lit(10)) === 9)
        .select(col("vec_id")), col("vec_id"), path)
    assert(Similarity.compactIfNeeded(spark, path, maxTombstoneBytes = 1L))
    assert(spark.read.parquet(s"$path/tombstones").isEmpty,
      "the fired compaction must have erased the tombstones")
    // Family detection: a wrong path fails readably.
    val e = intercept[IllegalArgumentException] {
      Similarity.indexHealth(spark, tmpDir("nonexistent"))
    }
    assert(e.getMessage.contains("IvfPq/Ivf/Lsh/Pq"))

    // Corpus-table analogue.
    val prefix = s"graft_idx_health_$runId"
    val docs = Tables.documents(spark, sf)
    val built = Dedup.corpusIndex(
      docs.filter(col("source") =!= "src0" && col("source") =!= "src8"),
      col("doc_id"), col("text"))
    Dedup.writeCorpusIndex(built, prefix, buckets = 4)
    built.unpersist()
    Dedup.appendToCorpusIndex(
      docs.filter(col("source") === "src8"), col("doc_id"), col("text"),
      prefix)
    val ch = Dedup.corpusIndexHealth(spark, prefix).collect().head
    assert(ch.getAs[Int]("n_buckets") === 4)
    assert(ch.getAs[Int]("max_files_per_bucket") >= 2,
      "the append must show as accreted bucket files")
    assert(!ch.getAs[Boolean]("needs_compaction"))
    assert(!Dedup.compactCorpusIndexIfNeeded(spark, prefix))
    assert(Dedup.compactCorpusIndexIfNeeded(spark, prefix,
      maxFilesPerBucket = 1))
    val ch2 = Dedup.corpusIndexHealth(spark, prefix, maxFilesPerBucket = 1)
      .collect().head
    assert(ch2.getAs[Int]("max_files_per_bucket") === 1)
    assert(!ch2.getAs[Boolean]("needs_compaction"))
  }

  test("a delete issued AFTER a compaction still hides its id — the snapshot-scoped erase keeps the tombstone relation live") {
    // Compaction must erase exactly the tombstone files it snapshotted
    // (the lost-delete-race discipline): afterwards the relation is
    // empty but APPENDABLE and loads still anti-join it, so the delete
    // lifecycle keeps working across arbitrarily many compactions.
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val delA = corpus.filter(pmod(col("vec_id"), lit(10)) === 1)
    val delB = corpus.filter(pmod(col("vec_id"), lit(10)) === 2)
    val path = tmpDir("ivf_postcompact_del")
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    Similarity.writeIvfIndex(centroids, indexed, path)
    Similarity.deleteFromIvfIndex(
      delA.select(col("vec_id")), col("vec_id"), path)
    Similarity.compactIvfIndex(spark, path)
    Similarity.deleteFromIvfIndex(
      delB.select(col("vec_id")), col("vec_id"), path)
    val fresh = spark.newSession()
    val (_, lists) = Similarity.loadIvfIndex(fresh, path)
    val ids = lists.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids.forall(i => i % 10 != 1), "compacted-away ids stay gone")
    assert(ids.forall(i => i % 10 != 2),
      "a post-compaction delete must be visible on the next load")
    val tombIds = fresh.read.parquet(s"$path/tombstones")
      .collect().map(_.getLong(0)).toSet
    assert(tombIds.nonEmpty && tombIds.forall(_ % 10 == 2),
      "the tombstone relation must hold exactly the post-compaction batch")
  }

  test("re-appending a LIVE id fails readably on every append path; a disjoint append still lands") {
    // The retried-partial-append workflow: SaveMode.Append is not
    // atomic, so re-running an interrupted nightly append re-lands
    // rows the first attempt committed — before the guard, probes then
    // returned the id twice with every gate green. Each family's
    // append must reject the retry naming the recovery, mutate
    // NOTHING, and still accept a genuinely new shard afterwards.
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val old = corpus.filter(pmod(col("vec_id"), lit(5)) < 3)
    val shard = corpus.filter(pmod(col("vec_id"), lit(5)) === 3)
    val shard2 = corpus.filter(pmod(col("vec_id"), lit(5)) === 4)

    def expectDup(f: => Unit): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("duplicate LIVE id"),
        s"the error must name the live-duplicate contract, got: " +
          s"${e.getMessage}")
    }

    // IVF.
    val ivfPath = tmpDir("ivf_dup")
    val (centroids, indexed) = Similarity.ivfIndex(
      old, col("vec_id"), col("embedding"), nLists = 8)
    Similarity.writeIvfIndex(centroids, indexed, ivfPath)
    Similarity.appendToIvfIndex(
      shard, col("vec_id"), col("embedding"), ivfPath)
    val preRows = spark.read.parquet(s"$ivfPath/lists").count()
    expectDup(Similarity.appendToIvfIndex(
      shard, col("vec_id"), col("embedding"), ivfPath))
    assert(spark.read.parquet(s"$ivfPath/lists").count() === preRows,
      "the refused retry must not have landed rows")
    Similarity.appendToIvfIndex(
      shard2, col("vec_id"), col("embedding"), ivfPath)
    val ids = spark.read.parquet(s"$ivfPath/lists")
      .groupBy(col("id")).count().filter(col("count") > 1).count()
    assert(ids === 0, "no id may appear twice after the guarded appends")

    // Composed IVF+PQ.
    val pqPath = tmpDir("ivfpq_dup")
    val cbs = Similarity.ivfPqFitCodebooks(
      old, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = 1)
    Similarity.writeIvfPqIndex(centroids, cbs,
      Similarity.ivfPqEncode(
        old, col("vec_id"), col("embedding"), centroids, cbs), pqPath)
    Similarity.appendToIvfPqIndex(
      shard, col("vec_id"), col("embedding"), pqPath)
    expectDup(Similarity.appendToIvfPqIndex(
      shard, col("vec_id"), col("embedding"), pqPath))
    Similarity.appendToIvfPqIndex(
      shard2, col("vec_id"), col("embedding"), pqPath)

    // LSH.
    val lshPath = tmpDir("lsh_dup")
    Similarity.writeLshIndex(
      old, col("vec_id"), col("embedding"), nBits = 8, lshPath)
    Similarity.appendToLshIndex(
      shard, col("vec_id"), col("embedding"), lshPath)
    expectDup(Similarity.appendToLshIndex(
      shard, col("vec_id"), col("embedding"), lshPath))
    Similarity.appendToLshIndex(
      shard2, col("vec_id"), col("embedding"), lshPath)

    // Flat PQ (unpartitioned code table — the column-pruned guard).
    val flatPath = tmpDir("pqflat_dup")
    val (fcbs, fenc) = Similarity.pqIndex(
      old, col("vec_id"), col("embedding"), m = 16, ksub = 16, iters = 1)
    Similarity.writePqIndex(fcbs, fenc, flatPath)
    Similarity.appendToPqIndex(
      shard, col("vec_id"), col("embedding"), flatPath)
    expectDup(Similarity.appendToPqIndex(
      shard, col("vec_id"), col("embedding"), flatPath))
    Similarity.appendToPqIndex(
      shard2, col("vec_id"), col("embedding"), flatPath)

    // Corpus index (catalog-table family).
    val prefix = s"graft_idx_dup_$runId"
    val docs = Tables.documents(spark, sf)
    val built = Dedup.corpusIndex(
      docs.filter(col("source") =!= "src0" && col("source") =!= "src8"),
      col("doc_id"), col("text"))
    Dedup.writeCorpusIndex(built, prefix, buckets = 4)
    built.unpersist()
    val docShard = docs.filter(col("source") === "src8")
    Dedup.appendToCorpusIndex(docShard, col("doc_id"), col("text"), prefix)
    expectDup(Dedup.appendToCorpusIndex(
      docShard, col("doc_id"), col("text"), prefix))
    Dedup.appendToCorpusIndex(
      docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
      prefix)
  }

  test("an interrupted write*Index (completion marker missing) fails every later verb readably; a finished rebuild restores it") {
    // The marker is cleared first and created last, so a crash
    // anywhere inside the write leaves a path every verb refuses with
    // a must-rebuild message — including the previously-silent window
    // (data writes complete, tombstone seed not reached: stale
    // tombstones would hide new rows on every load).
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val path = tmpDir("ivf_marker")
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    Similarity.writeIvfIndex(centroids, indexed, path)
    // Loads work while the marker stands.
    Similarity.loadIvfIndex(spark.newSession(), path)
    // Simulate the crash window: marker gone, directories intact.
    assert(new java.io.File(s"$path/_GRAFT_INDEX_COMPLETE").delete())
    val eLoad = intercept[IllegalArgumentException] {
      Similarity.loadIvfIndex(spark.newSession(), path)
    }
    assert(eLoad.getMessage.contains("INCOMPLETE") &&
      eLoad.getMessage.contains("rebuild"),
      s"an incomplete index must fail toward a rebuild: ${eLoad.getMessage}")
    val eAppend = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(
        corpus, col("vec_id"), col("embedding"), path)
    }
    assert(eAppend.getMessage.contains("INCOMPLETE"))
    // A finished rebuild restores the marker and the index loads again.
    Similarity.writeIvfIndex(centroids, indexed, path)
    val (_, lists) = Similarity.loadIvfIndex(spark.newSession(), path)
    assert(lists.count() > 0)
  }

  test("ONE policy verb for every family: indexHealth + compactIfNeeded dispatch on a corpus-index table prefix") {
    // A nightly job appends to whatever index it owns — vector stripes
    // or text buckets — and calls the same guard; the corpus family
    // must route through the shared knee constants.
    val prefix = s"graft_idx_unified_$runId"
    val docs = Tables.documents(spark, sf)
    val built = Dedup.corpusIndex(
      docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"))
    Dedup.writeCorpusIndex(built, prefix, buckets = 4)
    built.unpersist()
    Dedup.appendToCorpusIndex(
      docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
      prefix)
    // The UNIFIED verbs, called with the PREFIX, reach the corpus
    // layout: the health frame is corpusIndexHealth's schema, and the
    // policy guard fires the corpus compaction at a tightened knob.
    val h = Similarity.indexHealth(spark, prefix).collect().head
    assert(h.getAs[Int]("n_buckets") === 4,
      "prefix dispatch must return the corpus-family health frame")
    assert(h.getAs[Int]("max_files_per_bucket") >= 2)
    assert(!Similarity.compactIfNeeded(spark, prefix),
      "below the knee the unified guard is a no-op on the corpus family")
    assert(Similarity.compactIfNeeded(spark, prefix,
      maxFilesPerStripe = 1),
      "past the knee the unified guard must fire compactCorpusIndex")
    val h2 = Similarity.indexHealth(spark, prefix, maxFilesPerStripe = 1)
      .collect().head
    assert(h2.getAs[Int]("max_files_per_bucket") === 1 &&
      !h2.getAs[Boolean]("needs_compaction"),
      "the fired corpus compaction must reset the bucket file counts")
  }

  test("composed encoding is measured, pinned and honored: auto picks by quantization error; a forced-residual index round-trips and its probes stay exact/bit-mirrored") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qv = q.collect().head.getSeq[Float](0).toArray
    val (centroids, _) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    // On the near-isotropic test embeddings residuals are LONGER than
    // the unit vectors (the centroids capture little direction), so
    // the measured-MSE auto mode must pick raw — agreeing with the
    // raw default the recall sweeps fixed (ResidualGainSweep).
    val auto = Similarity.ivfPqFitCodebooks(
      corpus, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = 1, encoding = "auto")
    assert(auto.encoding === "raw",
      "auto must pick raw on the isotropic test embeddings")
    val default = Similarity.ivfPqFitCodebooks(
      corpus, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = 1)
    assert(default.encoding === "raw",
      "the default convention is raw — the measured IP-ranking winner")
    // Forced residual: the IVFADC convention end to end. Completeness
    // is encoding-blind by construction (every row scanned + reranked
    // exactly), and the per-list offset must make cross-list ADC
    // scores comparable in BOTH probe forms identically.
    val res = Similarity.ivfPqFitCodebooks(
      corpus, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = 1, encoding = "residual")
    assert(res.encoding === "residual")
    val path = tmpDir("ivfpq_residual")
    Similarity.writeIvfPqIndex(centroids, res,
      Similarity.ivfPqEncode(
        corpus, col("vec_id"), col("embedding"), centroids, res), path)
    val fresh = spark.newSession()
    val (cents, cbs2, codes) = Similarity.loadIvfPqIndex(fresh, path)
    assert(cbs2.encoding === "residual",
      "the meta table must round-trip the residual convention")
    val corpus2 = Tables.embeddings(fresh, sf).filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(
      corpus2, col("vec_id"), col("embedding"), q, k = 10).collect().toSeq
    val full = Similarity.ivfPqTopK(cents, cbs2, codes, corpus2,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 8,
      rerankN = 1 << 20).collect().toSeq
    assert(full === exact,
      "residual composed completeness gate: full probe must equal exact")
    // Offset bit-mirror: a 1-query batch at FINITE rerank must pick the
    // same shortlist (thus the same rows) as the single-query
    // driver-LUT + offset-map probe.
    val one = Similarity.ivfPqTopKBatch(cents, cbs2, codes,
        corpus2, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") === 0), col("vec_id"), col("embedding"),
        k = 10, nProbe = 3, rerankN = 50)
      .select(col("id"), col("sim")).orderBy(asc("rank"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val single = Similarity.ivfPqTopK(cents, cbs2,
        codes.filter(col("id") =!= 0), corpus2,
        col("vec_id"), col("embedding"),
        qv, k = 10, nProbe = 3, rerankN = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(one === single,
      "residual 1-query batch must bit-mirror the single-query probe")
    // A residual-encoded shard appends under the pinned convention and
    // the appended index still degenerates to exact at full settings.
    val extra = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"))
    Similarity.appendToIvfPqIndex(
      extra, col("vec_id"), col("embedding"), path)
    val fresh2 = spark.newSession()
    val (c3, cb3, codes3) = Similarity.loadIvfPqIndex(fresh2, path)
    val union = corpus2.select(col("vec_id"), col("embedding"))
      .unionAll(extra)
    val exactU = Similarity.bruteForceTopK(
      union, col("vec_id"), col("embedding"), q, k = 10).collect().toSeq
    val fullU = Similarity.ivfPqTopK(c3, cb3, codes3, union,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 8,
      rerankN = 1 << 20).collect().toSeq
    assert(fullU === exactU,
      "post-append residual probe must still equal exact at full settings")
  }

  test("bounded PQ fit sample: above-corpus bound is bit-identical; a small sample still yields a complete index whose full-rerank probe is exact") {
    // ivfIndex's fitSampleRows discipline extended to the PQ fits: the
    // codebook ESTIMATE trains on the hash-ordered bounded sample (the
    // 100 TB per-iteration bound), the encode covers every vector.
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val n = corpus.count()
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qv = q.collect().head.getSeq[Float](0).toArray
    // Above the corpus size the sample is the whole corpus — codebooks
    // and codes bit-identical to the unsampled fit.
    val (cbsAll, encAll) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16,
      iters = 1, fitSampleRows = 0L)
    val (cbsBig, encBig) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16,
      iters = 1, fitSampleRows = n * 10)
    assert(cbsAll.size == cbsBig.size &&
      cbsAll.zip(cbsBig).forall { case ((j1, c1, a1), (j2, c2, a2)) =>
        j1 == j2 && c1 == c2 && a1.sameElements(a2) },
      "an above-corpus sample bound must not change the fit")
    assert(encAll.orderBy(col("id")).collect().toSeq ===
      encBig.orderBy(col("id")).collect().toSeq)
    // A small sample: fewer rows trained on, but every row ENCODED and
    // the completeness gate (corpus-sized rerank ≡ exact) is fit-blind.
    val (cbsS, encS) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16,
      iters = 1, fitSampleRows = 64L)
    assert(encS.count() === n, "the encode pass must cover every vector")
    val exact = Similarity.bruteForceTopK(
      corpus, col("vec_id"), col("embedding"), q, k = 10).collect().toSeq
    val full = Similarity.pqTopK(cbsS, encS, corpus,
      col("vec_id"), col("embedding"), qv, k = 10,
      rerankN = math.min(n, Int.MaxValue.toLong).toInt)
      .collect().toSeq
    assert(full === exact,
      "sample-fit PQ at corpus-sized rerank must still equal exact")
    // Same contract through the composed fit verb.
    val (centroids, _) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    val cbsC = Similarity.ivfPqFitCodebooks(
      corpus, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = 1, fitSampleRows = 64L)
    val encC = Similarity.ivfPqEncode(
      corpus, col("vec_id"), col("embedding"), centroids, cbsC)
    assert(encC.count() === n)
    val fullC = Similarity.ivfPqTopK(centroids, cbsC, encC, corpus,
      col("vec_id"), col("embedding"), qv, k = 10, nProbe = 8,
      rerankN = 1 << 20).collect().toSeq
    assert(fullC === exact,
      "sample-fit composed probe at full settings must equal exact")
  }
}
