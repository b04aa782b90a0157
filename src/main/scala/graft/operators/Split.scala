package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable dataset splitting — the reproducible
  * train/test/holdout assignment a training-data pipeline needs.
  *
  * `randomSplit` depends on partition layout and sampler state; this
  * assigns each row by the md5 of its id, so the SAME row lands in the
  * SAME split on any engine, any partitioning, any run — and the split
  * is stable under corpus growth (new rows don't reshuffle old ones).
  * md5 hex is identical across Spark, DuckDB, and virtually everything
  * else, which also makes the assignment SQL-expressible for oracles
  * and downstream non-Spark consumers.
  */
object Split {

  /** Two-hex-digit threshold below which a row is in the held-out split:
    * fraction ≈ frac with 1/256 granularity, clamped to [1/256, 255/256].
    * The upper clamp matters: frac ≥ 255.5/256 would otherwise round to
    * 256 and format as the THREE-char "100", which sorts below "11" and
    * silently keeps ~6.6% instead of ~100%. */
  private[operators] def hexThreshold(frac: Double): String = {
    require(frac > 0 && frac < 1, "frac must be in (0, 1)")
    f"${math.min(255, math.max(1, math.round(frac * 256).toInt))}%02x"
  }

  /** Split tag column: `heldOutName` for ~`frac` of rows (by id hash),
    * `restName` otherwise. */
  def tag(
      id: Column, frac: Double,
      heldOutName: String = "test", restName: String = "train"): Column =
    when(substring(md5(id.cast("string")), 1, 2) < hexThreshold(frac),
      lit(heldOutName)).otherwise(lit(restName))

  /** Convenience: (heldOut, rest) DataFrames by deterministic id hash. */
  def holdOut(df: DataFrame, id: Column, frac: Double): (DataFrame, DataFrame) = {
    val t = tag(id, frac)
    (df.filter(t === "test"), df.filter(t === "train"))
  }

  /** Threshold with the [0,1] edges admitted: 0 keeps nothing (no hex
    * pair sorts below "00"), 1 keeps everything ("zz" sorts above every
    * hex pair). */
  private[operators] def hexThresholdOrEdge(frac: Double): String =
    if (frac <= 0) "00" else if (frac >= 1) "zz" else hexThreshold(frac)

  /** Uniform-in-[0,1) hash fraction of an id: the first 8 md5 hex digits
    * as an integer over 2^32. Unlike the 2-hex-digit [[tag]] threshold
    * (1/256 granularity, fine for human-chosen fractions), this carries
    * 32 bits — enough to compare against DATA-DERIVED rates. Engine
    * -portable: DuckDB `('0x' || substr(md5(x), 1, 8))::BIGINT / 2^32`
    * produces the identical double. */
  def hashFraction(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Temperature-weighted corpus resampling — the mixing step that
    * up-weights rare strata (languages, sources) relative to their raw
    * frequency: stratum `s` with `c_s` rows gets expected share
    * `c_s^alpha / Σ c_t^alpha` of the `targetFrac · N` kept rows, i.e.
    * per-row keep rate `min(1, targetFrac · N · c_s^(alpha−1) / Σ c_t^alpha)`.
    * `alpha = 1` reproduces the input mix, `alpha → 0` approaches
    * uniform-over-strata; `alpha = 0.5` (the common "temperature" choice)
    * uses `sqrt`, which is IEEE-exact and therefore engine-portable.
    *
    * Scale shape: one partial+final count per stratum (tiny frame), the
    * corpus totals as a 1-row broadcast, rates broadcast-joined back, and
    * the keep decision is a pushable per-row hash filter — no shuffle of
    * the corpus itself, no sampler state, reproducible on any engine or
    * partitioning. Rates are doubles: the stratum-sum Σ c_t^alpha may
    * differ across engines in the last ulp (summation order), which flips
    * a row only if its 32-bit hash fraction lands within that ulp —
    * negligible, same class as the stddev/corr rounding rationale. */
  def temperatureSample(
      df: DataFrame, stratum: Column, id: Column,
      alpha: Double, targetFrac: Double): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac must be in (0, 1]")
    require(alpha >= 0, "alpha must be >= 0")
    val weight: Column => Column =
      if (alpha == 0.5) sqrt(_)
      else if (alpha == 1.0) identity
      else c => pow(c, lit(alpha))
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__cnt"))
    val totals = counts.agg(
      sum(col("__cnt")).as("__n"),
      sum(weight(col("__cnt").cast("double"))).as("__wsum"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("__stratum"),
        least(lit(1.0),
          lit(targetFrac) * col("__n") * weight(col("__cnt").cast("double")) /
            col("__wsum") / col("__cnt")).as("__rate"))
    df.join(broadcast(rates), stratum === col("__stratum"))
      .filter(hashFraction(id) < col("__rate"))
      .drop("__stratum", "__rate")
  }

  /** Deterministic global shuffle order — the "shuffle the corpus before
    * training" step, reproducible across engines and runs: rank every row
    * by the md5 of its id. Computed without a single-partition window via
    * [[ScalableWindow.runningTotal]] (range partition on the hash, local
    * cumsum, broadcast prefix offsets). Appends `as` = 1-based position. */
  def shuffleOrder(df: DataFrame, id: Column, as: String, partitions: Int): DataFrame =
    ScalableWindow.runningTotal(
      df.withColumn("__shuffle_key", md5(id.cast("string"))),
      col("__shuffle_key"), lit(1L), as, partitions)
      .drop("__shuffle_key")

  /** Cap every stratum at its `k` smallest-hash rows — the fixed-size
    * counterpart of rate-based sampling (e.g. "at most k docs per
    * domain"), deterministic by the same md5 order. Runs through the
    * custom bounded-heap [[graft.plans.GroupTopK]] physical operator:
    * ≤ k rows per (stratum × input partition) are shuffled, no full
    * per-group sort — semantically `row_number() over (partition by
    * stratum order by md5(id), id) <= k`. */
  def capPerStratum(df: DataFrame, stratum: Column, id: Column, k: Int): DataFrame = {
    val withKey = df.withColumn("__cap_key", md5(id.cast("string")))
    graft.plans.GroupTopK.topK(
      withKey, Seq(stratum), Seq(col("__cap_key").asc, id.asc), k)
      .drop("__cap_key")
  }

  /** Deterministic stratified sampling — the corpus-mixing primitive of
    * a training-data pipeline: each stratum (source, language, quality
    * band) keeps its own fraction of rows, selected by the md5 of the
    * row id. Same row kept on any engine / partitioning / run; stable
    * under corpus growth; SQL-expressible for oracles and non-Spark
    * consumers. Evaluated as a plain pushable filter — no sampler state,
    * no shuffle. `rates` maps stratum value → keep fraction in [0, 1];
    * unlisted strata use `defaultRate` (granularity 1/256, like [[tag]]). */
  def stratifiedSample(
      df: DataFrame, stratum: Column, id: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThresholdOrEdge(defaultRate))) {
      case (acc, (value, frac)) =>
        when(stratum === value, lit(hexThresholdOrEdge(frac))).otherwise(acc)
    }
    df.filter(substring(md5(id.cast("string")), 1, 2) < threshold)
  }

  /** Token-budget corpus selection — the curation step that fills a
    * training-token budget best-first: rank docs by quality (desc, id
    * tie-break) and keep the prefix whose cumulative token count stays
    * within `budgetFrac` of the corpus's total tokens. Output:
    * (doc_id, quality, n_tokens, cum_tokens) for the selected prefix.
    *
    * Scale shape: the per-doc scoring is one codegen'd projection; the
    * global ordered cumulative sum runs through
    * [[ScalableWindow.runningTotalBy]] on (quality desc, id asc)
    * natively (range partition + local cumsum + broadcast prefix
    * offsets — never a single-partition window, and no synthetic
    * composite key that could mis-order out-of-band ids); the corpus
    * token total is read back off the cumsum frame itself (its global
    * max — the frame is already checkpointed, so this is one cheap
    * aggregate, not a second scan+tokenize of the corpus); the budget
    * cut is then a plain filter under the 1-row broadcast scalar. */
  def tokenBudgetSelect(
      df: DataFrame, id: Column, text: Column,
      budgetFrac: Double, partitions: Int): DataFrame = {
    import graft.functions.TextFunctions
    val scored = df.select(id.cast("long").as("doc_id"),
      TextFunctions.qualityScore(text).as("quality"),
      TextFunctions.tokenCount(text).cast("long").as("n_tokens"))
    val withCum = ScalableWindow.runningTotalBy(
      scored, Seq(col("quality").desc, col("doc_id").asc),
      col("n_tokens"), "cum_tokens", partitions)
    // The LAST cumulative value is the corpus token total.
    val budget = withCum.agg(
      floor(max(col("cum_tokens")) * budgetFrac).cast("long").as("__budget"))
    withCum.crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("__budget"))
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Exact-size weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): keep the `k` rows with the largest key
    * `u^(1/w)` where `u` is the row's deterministic md5 fraction —
    * each draw lands with probability proportional to its weight, the
    * sample size is EXACTLY k, and no sampler state or RNG stream
    * exists (reruns, retries, and engines all agree). This is the
    * "pick 10 M docs, quality-weighted, exactly" selector the
    * rate-based mixers ([[temperatureSample]], [[matchTargetMix]])
    * cannot express: Bernoulli rates hit a size only in expectation.
    *
    * Zero-weight rows are excluded up front (their selection
    * probability is zero; keeping them would just make `pow(u, ∞)`
    * edge cases portable-by-luck). Keys are rounded to 6 dp with id
    * tie-break before ranking — the library's standard cross-engine
    * libm discipline (`pow` may differ in the last ulp between
    * engines; at 6 dp collisions resolve identically by id on both).
    *
    * Scale shape: one projection computes the key, the global top-k is
    * the two-phase [[ScalableWindow.runningTotalBy]] rank (range
    * partition + per-partition window — no single-partition window, no
    * driver-bound limit(k) for large k), and the cut is a plain filter.
    * Output: (doc_id, weight, key, rank). */
  def weightedSampleExact(
      df: DataFrame, id: Column, weight: Column, k: Long,
      partitions: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keyed = df.select(id.cast("long").as("doc_id"),
        weight.cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("key",
        round(pow(hashFraction(col("doc_id")), lit(1.0) / col("weight")), 6))
    ScalableWindow.runningTotalBy(keyed,
        Seq(col("key").desc, col("doc_id").asc), lit(1L), "rank",
        partitions)
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("weight"), col("key"), col("rank"))
  }

  /** Token-BALANCED shard assignment — [[assignShards]]'s hash form
    * balances ROW counts in expectation; training shards actually need
    * near-equal TOKEN totals, or the heaviest shard gates every epoch
    * step. Documents are ranked globally by (weight desc, id asc) and
    * dealt serpentine ("snake"/boustrophedon — rank positions
    * 1..2n fold as 0,1,…,n−1,n−1,…,1,0): each full pass gives every
    * shard one heavy and one light pick, so shard totals differ by at
    * most roughly the largest single weight (plain round-robin leaves
    * an every-pass bias toward the low shard ids). Deterministic on
    * any engine; ties break on id.
    *
    * Scale shape: the global rank is the two-phase
    * [[ScalableWindow.runningTotalBy]] (range partition + per-partition
    * window + exact offset add — no single-partition window); the fold
    * arithmetic is one codegen'd projection. Output: (doc_id, weight,
    * shard). */
  def balancedShards(
      df: DataFrame, id: Column, weight: Column, nShards: Int,
      partitions: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val ranked = ScalableWindow.runningTotalBy(
      df.select(id.cast("long").as("doc_id"),
        weight.cast("long").as("weight")),
      Seq(col("weight").desc, col("doc_id").asc),
      lit(1L), "__rank", partitions)
    val idx = (col("__rank") - 1) % (2 * nShards)
    ranked.select(col("doc_id"), col("weight"),
      when(idx < nShards, idx)
        .otherwise(lit(2 * nShards - 1) - idx)
        .cast("int").as("shard"))
  }

  /** Per-stratum percentile calibration of a raw score — the step that
    * makes quality scores COMPARABLE across sources before a global
    * cut: a classifier (or proxy metric) scores each domain on its own
    * scale, so "top 30% within its source" is the meaningful selector,
    * not a single global threshold that silently empties whole domains.
    * Emits each row's `percent_rank` of `score` within its stratum —
    * (rank−1)/(n−1), ties sharing the min rank, single rows scoring 0.
    *
    * The division is one IEEE op on two exact integers, so the output
    * is bit-identical cross-engine with NO rounding step. Scale shape:
    * one shuffle partitioned BY STRATUM (each stratum's rank computed
    * independently in parallel) — right for the many-sources corpus
    * this targets; a single stratum holding most of the corpus would
    * serialize there, at which point the two-phase
    * [[ScalableWindow.runningTotalBy]] cumcount over (stratum, score)
    * is the swap. Output: (doc_id, stratum, score, pct). */
  def percentileCalibrate(
      df: DataFrame, stratum: Column, id: Column, score: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"), stratum.as("stratum"),
        score.cast("double").as("score"))
      .withColumn("pct", percent_rank().over(
        Window.partitionBy(col("stratum")).orderBy(col("score"))))

  /** Resample the corpus toward an EXPLICIT target mixture — the
    * curation step where the mix is a design decision ("40% en, 20%
    * zh, …"), not a function of the observed counts (that derived form
    * is [[temperatureSample]]). Stratum `s` with `n_s` rows and target
    * share `t_s` gets per-row keep rate
    * `min(1, budgetFrac · N · t_s / n_s)` where `N` is the total row
    * count across TARGETED strata — so the kept sample approximates
    * `budgetFrac · N` rows distributed as the target mix, rates above 1
    * saturating honestly (an under-represented stratum cannot be
    * up-sampled by filtering; the saturated stratum keeps everything
    * and the realized mix shifts accordingly, which is the correct
    * observable signal that the corpus cannot meet the target). Strata
    * absent from `target` are dropped — a blocklist for free.
    *
    * Scale shape identical to [[temperatureSample]]: one partial+final
    * count per stratum, the target table and totals as parameter-sized
    * broadcasts, and the keep decision a pushable per-row
    * [[hashFraction]] filter — the corpus itself is never shuffled. */
  def matchTargetMix(
      df: DataFrame, stratum: Column, id: Column,
      target: Seq[(String, Double)], budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, "budgetFrac must be in (0, 1]")
    require(target.nonEmpty && target.forall(_._2 > 0),
      "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val targetDf = target.toDF("__stratum", "__target")
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__cnt"))
      .join(broadcast(targetDf), Seq("__stratum"))
    val total = counts.agg(sum(col("__cnt")).as("__n"))
    val rates = counts.crossJoin(broadcast(total))
      .select(col("__stratum"),
        least(lit(1.0),
          lit(budgetFrac) * col("__n").cast("double") * col("__target") /
            col("__cnt").cast("double")).as("__rate"))
    df.join(broadcast(rates), stratum === col("__stratum"))
      .filter(hashFraction(id) < col("__rate"))
      .drop("__stratum", "__rate")
  }

  /** Deterministic shard assignment — the output-layout step that fans
    * a corpus across `nShards` training workers/files: shard = the
    * row's 32-bit md5 prefix mod `nShards`. Same row → same shard on
    * any engine/partitioning/run, balanced in expectation, and
    * SQL-expressible for downstream non-Spark consumers. One codegen'd
    * projection — no shuffle (the physical write would partition by
    * this column; the assignment itself is free). */
  def assignShards(df: DataFrame, id: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard",
      (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
        .cast("long") % nShards).cast("int"))
  }

  /** Deterministic strided interleave — the merged training order over
    * heterogeneous strata (sources, corpora): rank every row within
    * its stratum by md5-of-id, then emit position
    * `rank·|strata| + stratumIndex` — so consecutive positions cycle
    * through the strata (round-robin while every stratum lasts, the
    * mixing order that avoids long single-source runs early in
    * training). Deterministic on any engine/partitioning; positions
    * are strictly increasing but not contiguous once short strata
    * exhaust — ORDER, not enumeration, is the contract.
    *
    * Scale shape: the per-stratum rank is one stratum-partitioned
    * window (parallel across strata — [[percentileCalibrate]]'s skew
    * note applies); the stratum index and count live on a
    * parameter-sized distinct frame (single-partition windows over
    * ≤ |strata| rows) broadcast back. Output: (doc_id, stratum, pos). */
  def interleaveOrder(
      df: DataFrame, stratum: Column, id: Column): DataFrame = {
    val strata = df.select(stratum.as("stratum")).distinct()
      .select(col("stratum"),
        (row_number().over(Window.orderBy(col("stratum"))) - 1).as("__sidx"),
        count(lit(1)).over(Window.partitionBy(lit(1))).as("__nstrata"))
    df.select(id.cast("long").as("doc_id"), stratum.as("stratum"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))) - 1)
      .join(broadcast(strata), Seq("stratum"))
      .select(col("doc_id"), col("stratum"),
        (col("__r") * col("__nstrata") + col("__sidx") + 1).as("pos"))
  }

  /** Epoch-capped mixture plan — the budgeting arithmetic behind a
    * modern pretraining mix: given a token budget `B`, a target share
    * per stratum, and a repetition ceiling (`maxEpochs` — data quality
    * degrades past a few epochs, so a small high-priority source cannot
    * be upsampled without bound), report per stratum how many tokens it
    * HAS, how many the target WANTS (`t_s · B`), the epochs that
    * implies, the realized token count under the cap
    * (`min(wanted, maxEpochs · have)`), and the unmet deficit — the
    * planner's worksheet for deciding whether to relax the cap, shift
    * the mix, or go get more data. This plans in TOKENS over strata
    * (the [[tokenBudgetSelect]] sibling at mixture granularity);
    * realized row selection is then [[matchTargetMix]] /
    * [[stratifiedSample]] territory.
    *
    * One tokenize+aggregate pass over the corpus (the stratum frame is
    * parameter-sized); every derived number is IEEE arithmetic on exact
    * integer token sums, epochs rounded to 4 dp, token quantities
    * floored to whole tokens — engine-portable. Strata absent from
    * `target` report a zero target (kept in the output: the planner
    * should SEE the data it is about to drop), and — symmetrically —
    * target strata absent from the CORPUS appear with n_tokens=0,
    * realized_tokens=0 and a full deficit (the join is full-outer):
    * "go get more data" is precisely the signal this worksheet exists
    * to surface, so a wanted-but-missing language must not vanish.
    * Output: (stratum, n_tokens, target_share, wanted_tokens, epochs,
    * realized_tokens, deficit_tokens). */
  def epochPlan(
      df: DataFrame, stratum: Column, text: Column,
      target: Seq[(String, Double)], budgetTokens: Long,
      maxEpochs: Double): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(target.forall(_._2 > 0), "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions
    val targetDf = target.toDF("stratum", "target_share")
    val wanted = floor(col("target_share") * lit(budgetTokens.toDouble))
      .cast("long")
    df.select(stratum.as("stratum"),
        TextFunctions.tokenCount(coalesce(text, lit(""))).cast("long")
          .as("__nt"))
      .groupBy(col("stratum")).agg(sum(col("__nt")).as("n_tokens"))
      // full-outer can't broadcast; both sides are stratum-count-sized
      // aggregate outputs, so the exchange moves ≤ |strata| rows.
      .join(targetDf, Seq("stratum"), "full")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("target_share", coalesce(col("target_share"), lit(0.0)))
      .select(col("stratum"), col("n_tokens"), col("target_share"),
        wanted.as("wanted_tokens"),
        when(col("n_tokens") > 0,
          round(wanted.cast("double") / col("n_tokens").cast("double"), 4))
          .as("epochs"),
        least(wanted,
          floor(lit(maxEpochs) * col("n_tokens").cast("double")).cast("long"))
          .as("realized_tokens"),
        greatest(lit(0L),
          wanted - floor(lit(maxEpochs) * col("n_tokens").cast("double"))
            .cast("long")).as("deficit_tokens"))
  }

  /** Leakage-safe split: near-duplicate documents must land in the SAME
    * split, or test contamination silently inflates eval scores. Every
    * doc's split key is its duplicate-cluster representative (min id via
    * [[Dedup.resolveClusters]]) when it has near-dups, its own id
    * otherwise; [[tag]] then assigns the split from the key — so an
    * entire dup cluster moves as one unit, deterministically.
    *
    * `pairs` is any verified near-dup pair set ((id_a, id_b) — e.g.
    * [[Dedup.minhashLshVerifiedPairs]]'s output); cluster resolution and
    * the back-join are bounded by the DUPLICATE volume, not the corpus.
    * Output: one row per input doc — (doc_id, split_key, split). */
  def leakageSafeTag(
      docs: DataFrame, id: Column, pairs: DataFrame,
      frac: Double): DataFrame = {
    val clusters = Dedup.resolveClusters(pairs)
    docs.select(id.cast("long").as("doc_id"))
      .join(clusters, col("doc_id") === col("id"), "left")
      .withColumn("split_key", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("split_key"),
        tag(col("split_key"), frac).as("split"))
  }

  /** Curriculum shard assignment: order the corpus by a difficulty
    * score and cut it into `nShards` contiguous, balanced bands — the
    * easy-to-hard data-ordering primitive (Bengio et al. 2009) whose
    * shards a trainer consumes in index order. Shard i receives ranks
    * [i·N/n, (i+1)·N/n) via integer arithmetic (`(rank−1)·n DIV N`),
    * so shard sizes differ by at most one and band boundaries are
    * MONOTONE BY CONSTRUCTION: every doc in shard i is ≤ every doc in
    * shard i+1 under (difficulty, id) order. Null difficulties
    * (unscorable docs — e.g. empty text the LM scorer never saw) sort
    * FIRST (nulls-first), landing in the easiest shard rather than
    * silently dropping.
    *
    * Global rank comes from [[ScalableWindow.runningTotalBy]] on
    * (difficulty asc nulls-first, id asc) — the two-phase range
    * partition + per-partition window + offset broadcast; no
    * single-partition global sort at any point. The shard arithmetic
    * uses DIV (integer division; both operands non-negative here so
    * truncation = floor) to dodge cross-engine double-quotient edges.
    *
    * Output: one row per doc — (doc_id, difficulty, shard). Callers
    * wanting the per-shard audit aggregate (n_docs, min/max
    * difficulty) on top; the monotone-boundary check is then
    * max(shard i) ≤ min(shard i+1) over the SAME rows. */
  def curriculumShards(
      df: DataFrame, id: Column, difficulty: Column,
      nShards: Int, partitions: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val ranked = ScalableWindow.runningTotalBy(
      df.select(id.cast("long").as("doc_id"),
        difficulty.cast("double").as("difficulty")),
      Seq(col("difficulty").asc_nulls_first, col("doc_id").asc),
      lit(1L), "__rank", partitions)
    val n = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .select(col("doc_id"), col("difficulty"),
        expr(s"CAST((__rank - 1) * $nShards DIV __n AS INT)").as("shard"))
  }
}
