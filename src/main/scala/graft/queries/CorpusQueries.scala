package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cluster, CorpusStats, Dedup, Ranking, Similarity, Split, Subword}
import graft.sources.Tables

/** Corpus curation surface: term weighting / retrieval scoring and the
  * mixing-side sampling primitives (temperature resampling, deterministic
  * global shuffle, per-stratum caps). Extends the training-data-pipeline
  * family of [[PipelineQueries]]; same oracle discipline (see the
  * [[CoreQueries]] float notes — scores round to 4 dp before ranking,
  * sampling decisions compare 32-bit md5 fractions against rates whose
  * every step is IEEE-exact except one documented stratum sum).
  */
object CorpusQueries {

  /** q67 — top-3 TF-IDF terms per document (smoothed idf), the classic
    * keyword/term-weighting pass over a corpus. */
  def q67TfIdf(spark: SparkSession, dir: String): DataFrame =
    Ranking.tfIdfTopTerms(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), col("text"), k = 3)
      .withColumnRenamed("__id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"), asc("rank"))

  /** Query bag for q68 — terms present in the synthetic vocabulary. */
  private val Bm25Terms = Seq("spark", "window", "hash")

  /** q68 — BM25 top-20 documents for a fixed query bag (retrieval-scored
    * curation / decontamination triage). */
  def q68Bm25(spark: SparkSession, dir: String): DataFrame =
    Ranking.bm25(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), col("text"), Bm25Terms, topN = 20)
      .withColumnRenamed("__id", "doc_id")
      .orderBy(desc("score"), asc("doc_id"))

  /** q69 — deterministic global shuffle order (1-based rank by md5 of the
    * id) via the two-phase scalable window — no single-partition sort. */
  def q69ShuffleOrder(spark: SparkSession, dir: String): DataFrame =
    Split.shuffleOrder(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), as = "shuffle_pos", partitions = 32)
      .select(col("doc_id"), col("shuffle_pos"))
      .orderBy(asc_nulls_first("doc_id"))

  /** q70 — temperature-weighted resampling by language (α = 0.5, target
    * half the corpus): rare languages keep proportionally more of their
    * rows than the head language. */
  def q70TemperatureSample(spark: SparkSession, dir: String): DataFrame =
    Split.temperatureSample(Dedup.spread(Tables.documents(spark, dir)),
        col("lang"), col("doc_id"), alpha = 0.5, targetFrac = 0.5)
      .select(col("doc_id"), col("lang"))
      .orderBy(asc_nulls_first("doc_id"))

  /** q71 — cap every source at its 10 smallest-hash docs through the
    * custom bounded-heap TopKPerGroup physical operator. */
  def q71StratumCap(spark: SparkSession, dir: String): DataFrame =
    Split.capPerStratum(Dedup.spread(Tables.documents(spark, dir)),
        col("source"), col("doc_id"), k = 10)
      .select(col("source"), col("doc_id"))
      .orderBy(asc_nulls_first("source"), asc("doc_id"))

  /** q72 — mean unigram log-probability per document (perplexity-proxy
    * quality score from the corpus's own unigram LM). */
  def q72UnigramLogProb(spark: SparkSession, dir: String): DataFrame =
    Ranking.unigramLogProb(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), col("text"))
      .withColumnRenamed("__id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"))

  /** q83 — mean bigram log-probability per document under a
    * Jelinek-Mercer interpolated corpus bigram LM (λ = 0.75): the
    * transition-aware perplexity proxy that catches word-salad docs
    * whose unigram stats look fine ([[Ranking.bigramLogProb]]). */
  def q83BigramLm(spark: SparkSession, dir: String): DataFrame =
    // No spread: bigramLogProb's own explicit (w1, w2) repartition is
    // the parallelizing exchange (Q83AB: 1.45 s vs 1.67 s with the
    // extra up-front text shuffle, sf0.1).
    Ranking.bigramLogProb(Tables.documents(spark, dir),
        col("doc_id"), col("text"))
      .withColumnRenamed("__id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"))

  /** q73 — out-of-vocabulary token rate vs the corpus's top-20 terms
    * (tokenizer-coverage / vocab-pruning diagnostic). */
  def q73OovRate(spark: SparkSession, dir: String): DataFrame =
    Ranking.oovRate(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), col("text"), vocabSize = 20)
      .withColumnRenamed("__id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"))

  /** q74 — cosine of every embedding against its own label's centroid
    * (embedding-space outlier / mislabel score). */
  def q74CentroidScores(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroidCosineScores(Dedup.spread(Tables.embeddings(spark, dir)),
        col("vec_id"), col("label"), col("embedding"))
      .withColumnRenamed("id", "vec_id")
      .withColumnRenamed("group", "label")
      .orderBy(asc("vec_id"))

  /** q75 — KL divergence of each source's unigram distribution from the
    * whole corpus (domain-shift / mixture diagnostic). */
  def q75SourceKl(spark: SparkSession, dir: String): DataFrame =
    Ranking.klDivergence(Dedup.spread(Tables.documents(spark, dir)),
        col("source"), col("text"))
      .withColumnRenamed("group", "source")
      .orderBy(asc_nulls_first("source"))

  /** q85 — vocabulary-growth curve (novel tokens per doc + cumulative
    * vocab size in doc order; Heaps-law diagnostic) via the
    * first-occurrence aggregate + two-phase cumsum — never a global
    * window over raw token occurrences. */
  def q85VocabGrowth(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.vocabGrowth(Tables.documents(spark, dir),
        col("doc_id"), col("text"))
      .orderBy(asc_nulls_first("doc_id"))

  /** q86 — per-label embedding-table audit: malformed-vector counts
    * (null / wrong dim / non-finite / zero norm) + L2-norm range, the
    * data-quality gate before indexing or training. */
  def q86EmbedAudit(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.embeddingAudit(Tables.embeddings(spark, dir),
        col("label"), col("embedding"), expectedDim = 64)
      .withColumnRenamed("group", "label")
      .orderBy(asc("label"))

  /** q90 — per-document 3-gram novelty ([[CorpusStats.ngramNovelty]]):
    * the share of each doc's distinct shingles whose global first
    * occurrence (by doc_id) is that doc — the phrase-level
    * dedup-pressure curve next to q85's token-level vocab growth. */
  def q90NgramNovelty(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.ngramNovelty(Tables.documents(spark, dir),
        col("doc_id"), col("text"), n = 3)
      .orderBy(asc_nulls_first("doc_id"))

  /** q91 — schema-driven table profile of `orders`
    * ([[CorpusStats.profileTable]]): per column, row/null/exact-distinct
    * counts + numeric min/max — the data-card pass a curation run emits
    * before anyone trains on a table. One scan, single aggregation
    * node (multi-distinct Expand). */
  def q91Profile(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.profileTable(Tables.orders(spark, dir))
      .orderBy(asc("col_name"))

  /** q93 — corpus snapshot diff ([[CorpusStats.snapshotDiff]]): old =
    * the documents table; new = the same corpus with every third doc
    * deleted, every fifth surviving doc revised (` rev2` appended), and
    * the sparse `doc_id % 97 = 0` slice re-ingested under shifted ids —
    * the deterministic churn fixture. Output rows only for the churn
    * (added / removed / changed), never the unchanged bulk. */
  /** The deterministic churn fixture shared by q93 (doc-level diff) and
    * q144 (card-level drift): every third doc deleted, every fifth
    * survivor revised (` rev2` appended), the sparse `doc_id % 97`
    * slice re-ingested under shifted ids. Carries (doc_id, text, lang,
    * source) so both the text-hash diff and the composition-aware card
    * run off ONE definition. */
  private def churnedDocs(d: DataFrame): DataFrame = {
    val revised = d.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"))
    val reingested = d.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"),
        col("lang"), col("source"))
    revised.unionByName(reingested)
  }

  def q93SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    CorpusStats.snapshotDiff(d, churnedDocs(d), col("doc_id"), col("text"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  /** q144 — data-card drift report: [[CorpusStats.dataCard]] computed
    * on the corpus and on its churned snapshot (q93's exact churn — one
    * shared definition), full-outer joined on (section, key) with the
    * per-metric delta — "what changed between crawls" at the
    * composition level, the companion to q93's doc-level diff. Both
    * cards measure chars as length(text) so the revised docs' growth is
    * visible (the table's n_chars column describes only the original
    * snapshot). */
  def q144CardDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    def card(df: DataFrame) = CorpusStats.dataCard(df, col("doc_id"),
      col("lang"), col("source"), length(col("text")), col("text"))
    card(d).withColumnRenamed("value", "old_value")
      .join(card(churnedDocs(d)).withColumnRenamed("value", "new_value"),
        Seq("section", "key"), "full_outer")
      .select(col("section"), col("key"), col("old_value"),
        col("new_value"),
        round(coalesce(col("new_value"), lit(0.0d))
          - coalesce(col("old_value"), lit(0.0d)), 6).as("delta"))
      .orderBy(asc_nulls_first("section"), asc_nulls_first("key"))
  }

  /** Subword geometry shared by q94's fertility and q121's encoder:
    * a 50-piece vocabulary of substrings up to 4 chars — small enough
    * that real multi-piece splits (and UNKs) appear in the fixture. */
  private val SubwordV = 50
  private val SubwordM = 4

  /** q94 — tokenizer fertility by language
    * ([[CorpusStats.tokenizerFertility]] + [[Subword.trainEncode]]):
    * tokens/doc and chars/token per lang, PLUS the real subword
    * fertility — pieces per word under q121's corpus-trained greedy
    * encoder (round 12: re-pointed from the count-only
    * `subwordCount` proxy to the actual encoder), the number that
    * converts a per-language doc budget into a SUBWORD-token budget. */
  def q94Fertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = CorpusStats.tokenizerFertility(docs, col("lang"), col("text"))
      .withColumnRenamed("group", "lang")
    // The JOIN-path encoder: output-identical to trainEncode (the
    // Wave21Spec literal ≡ join gate + q187's oracle) and measured
    // 3–6× faster at sf0.1/K=16 — the per-DISTINCT-word amortization
    // already wins at V=50, not only at production vocabulary sizes.
    val sub = Subword.trainEncodeJoin(docs, col("doc_id"), col("text"),
        SubwordV, SubwordM)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(sum(col("n_pieces")).as("__np"), sum(col("n_words")).as("__nw"))
      .select(col("lang"),
        when(col("__nw") > 0,
          round(col("__np").cast("double") / col("__nw").cast("double"), 4))
          .as("pieces_per_token"))
    base.join(sub, Seq("lang"))
      .orderBy(asc_nulls_first("lang"))
  }

  /** q121 — subword encoding ([[Subword.trainEncode]] at V = 50,
    * M = 4): the corpus-trained greedy longest-match wordpiece-style
    * encoder, every doc re-emitted as its subword-id sequence (UNK =
    * −1, kept visible) with its piece count and fertility — the
    * subword sibling of q107's word-level encode, and the operator
    * q94's fertility now measures. */
  def q121SubwordEncode(spark: SparkSession, dir: String): DataFrame =
    Subword.trainEncode(Tables.documents(spark, dir), col("doc_id"),
        col("text"), SubwordV, SubwordM)
      .orderBy(asc_nulls_first("doc_id"))

  /** q188 — tokenizer vocabulary-coverage audit: for a top-V
    * frequency vocabulary (V = 64, count desc / word asc — the q107
    * selection discipline), the per-language token count, covered
    * count, and OOV rate — the "how much of each language does this
    * vocabulary actually reach" report that decides V before anyone
    * trains an encoder (the q107/q121/q187 family's sizing input).
    * Exactness: counts are exact integers; oov_rate = round(1 − c/n, 4)
    * on an exact-int ratio — IEEE-identical both engines. Empty
    * tokens are filtered on BOTH sides (Spark's split("") and
    * DuckDB's string_split_regex('') each yield ['']).
    *
    * Scale shape: one tokenize+explode feeding a word-count aggregate
    * with a TakeOrderedAndProject top-V (never a global sort), the
    * V-row vocabulary broadcast back against the token stream, one
    * \|langs\|-row aggregate. Two passes over the token stream — the
    * q40 trade: the vocabulary must exist before coverage can be
    * counted, and V rows broadcast where a shuffled join would move
    * the corpus. */
  def q188VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    // Tokenization, coverage counts and the OOV projection are the
    // CorpusStats shared definitions — the identical arithmetic runs as
    // the streaming drift screen (StreamingVocabCoverage, stream ≡
    // batch gated), so this oracle row gates that path's math too.
    val tok = graft.operators.CorpusStats.langTokens(
      Tables.documents(spark, dir), col("lang"), col("text"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("w").asc)
      .limit(64)
      .select(col("w"))
    graft.operators.CorpusStats.oovRates(
      graft.operators.CorpusStats.vocabCoverageCounts(tok, vocab))
  }

  /** q187 — q121's subword encode through the VOCABULARY JOIN
    * ([[Subword.trainEncodeJoin]]): identical parameters, identical
    * output, zero driver collects — the vocabulary stays a broadcast
    * DataFrame and the greedy walk probes a per-word materialized
    * position map instead of the O(V) map literal. Same oracle SQL as
    * q121 (the outputs are spec-gated equal), so the join path's
    * correctness sits under the DuckDB gate independently of the
    * literal path's. */
  def q187SubwordEncodeJoin(spark: SparkSession, dir: String): DataFrame =
    Subword.trainEncodeJoin(Tables.documents(spark, dir), col("doc_id"),
        col("text"), SubwordV, SubwordM)
      .orderBy(asc_nulls_first("doc_id"))

  /** q95 — sequence-packing efficiency per source at L = 128
    * ([[CorpusStats.packingEfficiency]]): pad-per-doc vs
    * concat-and-chunk chunk counts and waste fractions. */
  def q95PackEfficiency(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.packingEfficiency(Tables.documents(spark, dir),
        col("source"), col("text"), seqLen = 128)
      .withColumnRenamed("group", "source")
      .orderBy(asc_nulls_first("source"))

  /** Explicit language mix for q96 — a design-decision target, distinct
    * from q70's count-derived temperature weights. */
  private val Q96Target = Seq(
    "en" -> 0.4, "zh" -> 0.2, "de" -> 0.2, "fr" -> 0.1, "es" -> 0.1)

  /** q96 — resample toward an explicit target language mix at half the
    * corpus ([[Split.matchTargetMix]]): under-represented languages
    * saturate at keep-everything, the rest thin to their share. */
  def q96TargetMix(spark: SparkSession, dir: String): DataFrame =
    Split.matchTargetMix(Dedup.spread(Tables.documents(spark, dir)),
        col("lang"), col("doc_id"), Q96Target, budgetFrac = 0.5)
      .select(col("doc_id"), col("lang"))
      .orderBy(asc_nulls_first("doc_id"))

  /** q97 — per-source percentile calibration of the stored size signal
    * ([[Split.percentileCalibrate]]): each doc's percent-rank of
    * `n_chars` within its source, the cross-domain-comparable form of a
    * per-domain raw score. Exact integer-ratio doubles — no rounding. */
  def q97CalibratedScore(spark: SparkSession, dir: String): DataFrame =
    Split.percentileCalibrate(Dedup.spread(Tables.documents(spark, dir)),
        col("source"), col("doc_id"), col("n_chars"))
      .withColumnRenamed("stratum", "source")
      .orderBy(asc_nulls_first("doc_id"))

  /** q99 — 3-gram frequency spectrum with hapax/doubleton/… classes and
    * a >10 overflow bucket ([[CorpusStats.termSpectrum]]); 3-grams give
    * the fixture a real Zipf tail where its 31-term unigram vocabulary
    * collapses to one overflow row. */
  def q99TermSpectrum(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.termSpectrum(Tables.documents(spark, dir),
        col("text"), n = 3, maxFreq = 10)
      .orderBy(asc("freq"))

  /** q107 — vocabulary encoding at V = 20 ([[Ranking.vocabEncode]]):
    * the corpus's top-20 vocabulary as dense ids, every doc re-emitted
    * as its id sequence (OOV = −1, kept visible) — the last-mile
    * text→ids step before tensors, sharing q73's exact vocabulary
    * selection. */
  def q107VocabEncode(spark: SparkSession, dir: String): DataFrame =
    // No spread: the per-row work here is one cheap regex tokenize —
    // locally, shuffling the full text column to parallelize it costs
    // more than it buys (A/B in Q107AB: 0.90 s spread vs 0.59 s not,
    // sf0.1) since the aggregation exchanges redistribute immediately
    // anyway; on a cluster spread is a no-op either way. Heavy-kernel
    // queries (shingling, subword walks) keep it.
    Ranking.vocabEncode(Tables.documents(spark, dir),
        col("doc_id"), col("text"), vocabSize = 20)
      .withColumnRenamed("__id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"))

  /** q108 — deterministic shard assignment across 8 training shards
    * ([[Split.assignShards]]): one codegen'd projection, no shuffle;
    * the physical write partitions by this column. */
  def q108Shards(spark: SparkSession, dir: String): DataFrame =
    Split.assignShards(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), nShards = 8)
      .select(col("doc_id"), col("shard"))
      .orderBy(asc_nulls_first("doc_id"))

  /** q123 — token-balanced shard assignment ([[Split.balancedShards]]
    * at 8 shards): global (weight desc, id) rank dealt serpentine, so
    * shard TOKEN totals equalize where q108's hash form only balances
    * row counts. The gated output is the per-shard rollup — the number
    * a training job actually schedules by. */
  def q123BalancedShards(spark: SparkSession, dir: String): DataFrame =
    Split.balancedShards(Tables.documents(spark, dir), col("doc_id"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"),
          lit(""))),
        nShards = 8, partitions = spark.sparkContext.defaultParallelism)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("total_tokens"))
      .orderBy(asc("shard"))

  /** q125 — exact-size weighted sample
    * ([[Split.weightedSampleExact]], k = 100 by stored size): the
    * Efraimidis–Spirakis top-k that rate-based mixers can't express —
    * EXACTLY k docs, selection probability ∝ n_chars, no RNG state,
    * identical on every engine/run. */
  def q125WeightedSample(spark: SparkSession, dir: String): DataFrame =
    Split.weightedSampleExact(Tables.documents(spark, dir), col("doc_id"),
        col("n_chars"), k = 100L,
        partitions = spark.sparkContext.defaultParallelism)
      .orderBy(asc("rank"))

  /** Merge count for q126 — enough steps that the learned order
    * diverges from raw pair frequency (later winners are counted AFTER
    * earlier merges rewrite the symbol stream), small enough that the
    * oracle's per-iteration CTE unroll stays readable. */
  private val BpeMerges = 6

  /** q126 — BPE merge training ([[Subword.bpeMerges]], 6 merges): the
    * iterative most-frequent-adjacent-pair learner (Sennrich et al.
    * 2016) whose merge ORDER q121's frequency-selected vocabulary
    * deliberately approximates away. Gated output is the learned merge
    * table itself — step, pair, merged symbol, and the pair's
    * frequency-weighted count at the moment it won. The oracle unrolls
    * the same six iterations as CTE triples (pair counts → winner →
    * list-fold rewrite), mirroring q87's unrolled-Lloyd discipline. */
  def q126BpeMerges(spark: SparkSession, dir: String): DataFrame =
    Subword.bpeMerges(Tables.documents(spark, dir), col("text"), BpeMerges)

  /** q130 — model-based quality scoring
    * ([[Ranking.hashedLinearScore]], 256 buckets, seed "q130", bias 0,
    * threshold 0.5): the hashed-feature linear-classifier filter shape
    * (fastText/LR quality heads) with a seeded deterministic weight
    * table as the declared model stand-in — the gate covers the
    * featurization, broadcast scoring, and thresholding plumbing a
    * trained model would ride through unchanged. */
  def q130QualityClassifier(spark: SparkSession, dir: String): DataFrame =
    Ranking.hashedLinearScore(Tables.documents(spark, dir), col("doc_id"),
        col("text"), nBuckets = 256, seed = "q130",
        bias = 0.0, threshold = 0.5)
      .withColumnRenamed("id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"))

  /** q131 — text canonicalization
    * ([[graft.functions.TextFunctions.canonicalize]]): NFC + control
    * strip + whitespace collapse + trim, the normalize-before-hash step
    * every dedup pipeline runs first. Gated by md5 of the canonical
    * form (DuckDB's `nfc_normalize` is byte-identical NFC, so the
    * hashes must agree) plus before/after lengths. */
  def q131Canonicalize(spark: SparkSession, dir: String): DataFrame = {
    val canon = graft.functions.TextFunctions.canonicalize(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("len_raw"),
        length(canon).cast("long").as("len_canon"),
        md5(canon).as("canon_md5"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  /** q133 — canonical exact dedup: q20's exact-duplicate grouping
    * keyed by the CANONICAL text hash (q131's normalize-before-hash,
    * the reason canonicalization exists — byte-distinct equal text
    * fragments raw exact dedup). Output per doc: its canonical dup
    * group (min doc id sharing the canonical md5) and the survivor
    * flag. One hash shuffle on the digest — never the text. */
  def q133CanonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canon = graft.functions.TextFunctions.canonicalize(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(canon).as("canon_md5"))
      .withColumn("canon_group",
        min(col("doc_id")).over(Window.partitionBy(col("canon_md5"))))
      .select(col("doc_id"), col("canon_md5"), col("canon_group"),
        (col("doc_id") === col("canon_group")).as("keep"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  /** q134 — approximate-distinct profiler contract
    * ([[CorpusStats.approxDistinct]], rsd = 0.02) on the q78/q89 gate
    * shape: the EXACT per-column distinct counts are oracle-verified
    * from the data, and `approx_ok` asserts the HLL sketch lands within
    * 10% of each (literal true in the oracle — an HLL regression makes
    * Spark emit false and flips the hash). HLL++ is deterministic for
    * fixed data, so this is a real measured property, with wide margin:
    * at rsd 0.02 the sketch is exact at fixture cardinalities
    * (sparse-mode), and 10% ≈ 5σ at scale. The operator exists for the
    * Expand-free one-pass profile of very wide tables; the exact
    * profiler (q91) stays the oracle-checkable contract. */
  def q134ApproxProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val exact = Dedup.spread(docs)
      .agg(countDistinct(col(cols.head)).as("__e_0"),
        cols.tail.zipWithIndex.map { case (n, i) =>
          countDistinct(col(n)).as(s"__e_${i + 1}")
        }: _*)
      .select(explode(array(cols.zipWithIndex.map { case (n, i) =>
        struct(lit(n).as("col_name"), col(s"__e_$i").as("n_exact"))
      }: _*)).as("p"))
      .select(col("p.*"))
    CorpusStats.approxDistinct(docs, cols, rsd = 0.02)
      .join(exact, "col_name")
      .select(col("col_name"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") <=
          col("n_exact").cast("double") * 0.1).as("approx_ok"))
      .orderBy(asc("col_name"))
  }

  /** q135 — corpus fertility under the LEARNED BPE merges
    * ([[Subword.bpeMerges]] at 6 merges + [[Subword.applyMerges]]):
    * the corpus-level compression number a tokenizer owner actually
    * tracks — occurrence-weighted pieces per word after applying the
    * trained merge schedule. The merge table is parameter-sized
    * (collected once — the Lloyd-centroid class); inference is one
    * codegen pass over the DISTINCT-word table, weighted by word
    * frequency, so the corpus is tokenized once and never re-scanned
    * per merge. The oracle replays the identical unrolled schedule
    * (q126's CTE chain) and measures the final symbol table. */
  def q135BpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = Subword.bpeMerges(docs, col("text"), BpeMerges)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = Dedup.spread(docs)
      .select(explode(graft.functions.TextFunctions.tokens(
        coalesce(col("text"), lit("")))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    words
      .select(col("n"),
        size(Subword.applyMerges(col("w"), merges)).as("np"))
      .agg(sum(col("n")).cast("long").as("n_words"),
        sum(col("n") * col("np")).cast("long").as("n_pieces"))
      .select(col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") /
          col("n_words").cast("double"), 4).as("pieces_per_word"))
  }

  /** q136 — salted skew join ([[graft.operators.SkewJoin
    * .saltedInnerJoin]], 8 salts): per-supplier revenue through the
    * manually salted lineitem ⋈ supplier join — the hot-key fallback
    * for when AQE's skew splitting can't engage (or one key exceeds a
    * task). The oracle is the PLAIN join: salting must be semantically
    * invisible (every original match pairs with exactly one replica),
    * so the gate is result equivalence, not a plan property
    * (SkewJoinSpec pins the plan side: the physical join keys on
    * (key, salt)). */
  def q136SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("skey"), col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("skey"), col("s_name"))
    graft.operators.SkewJoin.saltedInnerJoin(
        li, supp, "skey", col("l_orderkey"), salts = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(asc_nulls_first("s_name"))
  }

  /** q109 — deterministic strided interleave across sources
    * ([[Split.interleaveOrder]]): the merged training order that
    * round-robins sources instead of concatenating them. */
  def q109Interleave(spark: SparkSession, dir: String): DataFrame =
    Split.interleaveOrder(Dedup.spread(Tables.documents(spark, dir)),
        col("source"), col("doc_id"))
      .withColumnRenamed("stratum", "source")
      .orderBy(asc("pos"))

  /** q110 — top-20 collocations by PMI at support ≥ 5
    * ([[Ranking.collocations]]): multiword-expression candidates, the
    * phrase-mining report next to q40's raw n-gram counts. */
  def q110Collocations(spark: SparkSession, dir: String): DataFrame =
    Ranking.collocations(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), col("text"), minCount = 5L, k = 20)

  /** q111 — inverted-index build at maxPostings = 10
    * ([[Ranking.invertedIndex]]): term → df + impact-ordered capped
    * posting list, the per-term cap through the custom GroupTopK
    * physical operator. */
  def q111InvertedIndex(spark: SparkSession, dir: String): DataFrame =
    Ranking.invertedIndex(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), col("text"), maxPostings = 10)
      .orderBy(asc_nulls_first("term"))

  /** q114 — Benford leading-digit audit of order totals
    * ([[CorpusStats.benfordAudit]]): per digit, observed vs Benford
    * frequency and the χ² contribution — the fabricated/truncated-data
    * screen of a numeric data card. */
  def q114Benford(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.benfordAudit(Tables.orders(spark, dir),
        col("o_totalprice"))
      .orderBy(asc("digit"))

  /** Mixture-plan geometry for q100: a 100 k-token budget at a 2-epoch
    * repetition cap; `es` deliberately untargeted so the planner's
    * about-to-drop reporting is under the oracle's eye, and `ja`
    * deliberately targeted-but-ABSENT from the corpus so the
    * full-outer direction (n_tokens=0, full deficit — "go get more
    * data") is under it too. At sf0.01 the corpus (~27 k tokens)
    * cannot meet the budget — deficits appear; at sf0.1 (~272 k) the
    * same plan clears for present languages — both regimes gated. */
  private val Q100Target = Seq(
    "en" -> 0.4, "zh" -> 0.25, "de" -> 0.2, "fr" -> 0.1, "ja" -> 0.05)
  private val Q100Budget = 100000L
  private val Q100MaxEpochs = 2.0

  /** q100 — epoch-capped mixture plan over languages
    * ([[Split.epochPlan]]): tokens available vs wanted per stratum,
    * implied epochs, the realized count under the repetition cap, and
    * the unmet deficit. */
  def q100EpochPlan(spark: SparkSession, dir: String): DataFrame =
    Split.epochPlan(Dedup.spread(Tables.documents(spark, dir)),
        col("lang"), col("text"), Q100Target, Q100Budget, Q100MaxEpochs)
      .withColumnRenamed("stratum", "lang")
      .orderBy(asc_nulls_first("lang"))

  /** k-means geometry shared by q87's Spark side and its unrolled
    * oracle: k=8 lineages, 2 Lloyd recomputes, SemDeDup pair threshold
    * at the q23 near-dup bar. */
  private val SemK = 8
  private val SemIters = 2
  private val SemThreshold = 0.45

  /** q87 — SemDeDup: deterministic Lloyd k-means buckets bound the
    * quadratic search; within-cluster cosine ≥ 0.45 pairs resolve to
    * components, survivor = min id. */
  def q87SemanticDedup(spark: SparkSession, dir: String): DataFrame =
    Cluster.semanticDedup(Tables.embeddings(spark, dir),
        col("vec_id"), col("embedding"),
        k = SemK, iters = SemIters, threshold = SemThreshold)
      .withColumnRenamed("id", "vec_id")
      .orderBy(asc("vec_id"))

  /** q137 — CCNet-style per-language perplexity bands
    * ([[Ranking.perplexityBuckets]]): every doc scored by the corpus
    * bigram LM (q83's chain), then ntile(3) head/middle/tail bands
    * WITHIN each language — the curation primitive that samples
    * fluency bands at different rates instead of one global cut. */
  def q137PplBuckets(spark: SparkSession, dir: String): DataFrame =
    Ranking.perplexityBuckets(Dedup.spread(Tables.documents(spark, dir)),
        col("doc_id"), col("text"), col("lang"), nBuckets = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"))

  /** q138 — Z-order layout audit over orders
    * ([[graft.expressions.ZOrderKey]], 16-bit interleave of customer ×
    * order epoch-day): rows sorted by the Morton key, blocked into
    * 32-row "files", and each block's (customer, day) bounding box
    * emitted — the min/max stats a parquet writer would record, i.e.
    * the evidence that BOTH dimensions prune after the rewrite. The
    * gate is the full block report, so the key, the sort, and the
    * locality bookkeeping are all under the oracle's eye. */
  def q138ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.ZOrderKey.zorder
    val keyed = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("x"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("y"))
      .withColumn("zkey", zorder(col("x"), col("y"), bits = 16))
    // Global position WITHOUT a single-task window: range partition on
    // (zkey, orderkey) + local cumsum + broadcast prefix offsets — the
    // ScalableWindow discipline (same as q69's shuffle order).
    val blocked = graft.operators.ScalableWindow.runningTotalBy(
        keyed, Seq(col("zkey").asc, col("o_orderkey").asc), lit(1L), "rn",
        spark.sparkContext.defaultParallelism)
      // floor of the double division is integer-exact here (rn ≪ 2^53)
      .withColumn("block", floor((col("rn") - 1) / lit(32)).cast("long"))
    blocked.groupBy(col("block"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
        min(col("y")).as("min_day"), max(col("y")).as("max_day"),
        min(col("zkey")).as("zmin"), max(col("zkey")).as("zmax"))
      .orderBy(asc("block"))
  }

  /** q139 — exact heavy-hitter terms through the Misra–Gries screen
    * ([[Ranking.frequentTerms]], capacity 30): candidates from the
    * bounded-memory summary (no vocabulary-wide shuffle), exact counts
    * for candidates only, threshold n·31 > N. The fixture vocabulary
    * (31 terms) exceeds the capacity, so the screen's decrement path
    * genuinely engages. The oracle computes the
    * same set the brute-force way — the screen's one-sided guarantee
    * is exactly what makes the two equal. */
  def q139FrequentTerms(spark: SparkSession, dir: String): DataFrame =
    Ranking.frequentTerms(Dedup.spread(Tables.documents(spark, dir)),
      col("text"), capacity = 30)

  /** q141 — dataset data card: the one-query "datasheet for a dataset"
    * report (corpus totals, per-language and per-source composition,
    * language token shares, exact-duplication summary) as (section,
    * key, value) rows — the standing artifact a curation run publishes
    * next to its shards.
    *
    * Scale shape: ONE corpus scan builds the doc-level base frame
    * (id, lang, source, chars, tokens, text-md5 — narrow, token volume
    * never leaves the projection), pinned once and consumed by five
    * aggregates whose outputs are all ≤ |langs|+|sources|+constant
    * rows; the token-share denominator is the usual 1-row broadcast.
    * Every number is a double (counts are 2^53-exact) so the report is
    * one homogeneous, unionable, oracle-hashable surface. */
  def q141DataCard(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.dataCard(Tables.documents(spark, dir),
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      col("text"))

  /** q147 — DSIR importance weights ([[Ranking.dsirWeights]], Xie et
    * al. 2023): target = the `lang = 'en'` slice, raw pool = everything
    * else; top-50 raw documents by add-one-smoothed unigram
    * log-likelihood ratio — the "pull raw docs toward the target
    * domain" selection score. Per-term ln weights round to 4 dp (q72's
    * accepted libm grid) before the integer-weighted per-doc sum, so
    * the final 4-dp z is grid-stable across engines. */
  def q147DsirWeights(spark: SparkSession, dir: String): DataFrame =
    Ranking.dsirWeights(Tables.documents(spark, dir),
        col("doc_id"), col("text"), col("lang") === "en", topN = 50)
      .withColumnRenamed("__id", "doc_id")

  /** q148 — curriculum shard plan ([[Split.curriculumShards]] over the
    * q72 difficulty score): difficulty = NEGATED mean unigram
    * log-probability (rare-word docs are hard), 8 contiguous balanced
    * bands via the two-phase scalable rank — the easy-to-hard data
    * ordering a trainer consumes in shard order. Output is the
    * per-shard audit (n_docs, min/max difficulty): monotone band
    * boundaries are visible in the min/max columns, and the oracle
    * recomputes the identical rank → `(rank−1)·8 DIV n` assignment. */
  def q148CurriculumShards(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = Ranking.unigramLogProb(
        Dedup.spread(docs), col("doc_id"), col("text"))
      .select(col("__id").as("doc_id"), (-col("logprob")).as("difficulty"))
    val base = docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
    Split.curriculumShards(base, col("doc_id"), col("difficulty"),
        nShards = 8, partitions = 32)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("difficulty")).as("min_difficulty"),
        max(col("difficulty")).as("max_difficulty"))
      .orderBy(asc("shard"))
  }

  /** q152 — per-language sequence-budget plan
    * ([[CorpusStats.sequenceBudget]], context 128): sequences each
    * stratum yields under independent per-doc chunking, padding waste,
    * and the efficiency headroom that justifies running q39's packer.
    * Integer-exact except the one 6-dp rational. */
  def q152SequenceBudget(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.sequenceBudget(Tables.documents(spark, dir),
        col("lang"), col("text"), seqLen = 128)
      .withColumnRenamed("stratum", "lang")
      .orderBy(asc_nulls_first("lang"))

  /** q154 — term-level vocabulary drift ([[Ranking.termDrift]])
    * between the corpus and q93's churned snapshot (ONE churn
    * definition across q93/q144/q154): the top-30 union-vocabulary
    * terms by |add-one-smoothed ln share ratio| — the topic-shift
    * report the doc-level diff (q93) and composition-level card drift
    * (q144) cannot see. */
  def q154TermDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    Ranking.termDrift(d, churnedDocs(d), col("text"), topN = 30)
  }

  /** q163 — source-concentration Gini ([[graft.operators.CorpusStats
    * .sourceConcentration]]): per language, how unevenly character
    * mass spreads across sources (0 even → 1 concentrated) — the
    * diversity audit next to q96's target mix: hitting language
    * targets can still leave one source dominating each language. */
  def q163SourceGini(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.sourceConcentration(
        Tables.documents(spark, dir), col("lang"), col("source"),
        col("n_chars"))
      .orderBy(asc_nulls_first("grp"))

  /** q164 — PSI length-drift screen ([[graft.operators.CorpusStats
    * .psiDrift]]): per source, the population stability index of its
    * document-length distribution against the rest of the corpus over
    * a complete 10-bucket grid (add-half smoothed, so never-hit
    * buckets — exactly where drift lives — still contribute). Flag at
    * the literature's PSI > 0.2 "act" threshold. */
  def q164PsiDrift(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.psiDrift(Tables.documents(spark, dir),
        col("source"), col("n_chars"))
      .orderBy(asc_nulls_first("unit"))

  /** q167 — chi-square independence screen ([[graft.operators
    * .CorpusStats.chiSquareIndependence]]): is the language mix
    * independent of the source? One row: level counts, dof, N, and χ²
    * over the COMPLETE lang×source grid (empty cells contribute their
    * expectation — dropping them understates association). */
  def q167ChiSquare(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.chiSquareIndependence(
      Tables.documents(spark, dir), col("lang"), col("source"))

  /** q168 — Neyman sample allocation ([[graft.operators.CorpusStats
    * .neymanAllocation]]): the variance-minimizing row budget split
    * n_h ∝ N_h·σ_h across languages for a length-measurement goal —
    * the sampling-DESIGN step in front of q96's mix executor.
    * Single-row strata report σ = 0, never vanish; allocations cap at
    * stratum size. */
  def q168NeymanAlloc(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.neymanAllocation(
        Tables.documents(spark, dir), col("lang"), col("n_chars"),
        budget = 1000L)
      .orderBy(asc_nulls_first("stratum"))

  /** q172 — two-sample KS split audit ([[graft.operators.CorpusStats
    * .ksTwoSample]]): per language, the KS statistic between the two
    * doc-id-parity halves of the length distribution with the 5%
    * asymptotic flag — the distributional check after q82's
    * leakage-safety: the halves must not just be disjoint, they must
    * look alike. Parity via the truncation-safe ((id % 2) + 2) % 2. */
  def q172KsSplit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.ksTwoSample(Tables.documents(spark, dir),
        col("lang"), col("n_chars"),
        ((col("doc_id") % 2) + 2) % 2 === 0)
      .orderBy(asc_nulls_first("key"))

  /** q176 — entropy profile ([[graft.operators.CorpusStats
    * .entropyProfile]]): per language, Shannon entropy of character
    * mass across sources and exp(H) — the effective number of sources
    * (Hill number of order 1), the additive companion to q163's
    * Gini. */
  def q176EntropyProfile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.entropyProfile(
        Tables.documents(spark, dir), col("lang"), col("source"),
        col("n_chars"))
      .orderBy(asc_nulls_first("grp"))

  /** q177 — quantile mapping table ([[graft.operators.CorpusStats
    * .quantileMap]]): each source's quartiles of document length next
    * to the pooled corpus quartiles with the shift — the planning
    * read for quantile normalization, numeric companion to q164's
    * bucketed PSI. */
  def q177QuantileMap(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.quantileMap(
        Tables.documents(spark, dir), col("source"), col("n_chars"))
      .orderBy(asc_nulls_first("unit"), asc("pct"))

  /** q181 — per-domain governance report ([[graft.operators.Domains
    * .governanceReport]]): docs/hosts/tokens/dup-rate/quality-mix per
    * registered domain, two-level blocklist semantics (exact host +
    * registered-domain rollup, incl. a co.uk multi-part suffix), and
    * the "≤ 40 docs per domain" diversity cap through the bounded-heap
    * capPerStratum. The synthetic corpus carries no URL column, so the
    * query derives a deterministic 8-host URL from (doc_id mod 8) —
    * both engines build and then PARSE the same URL strings, so host
    * extraction, suffix rollup and blocklists are all under the gate. */
  def q181DomainGovernance(spark: SparkSession, dir: String): DataFrame = {
    val hosts = Seq(
      "www.alpha-press.com", "m.alpha-press.com",
      "news.daily.co.uk", "sport.daily.co.uk",
      "cdn.spamfarm.net", "mirror.spamfarm.net",
      "bad.actor.org", "good.actor.org")
    val docs = Tables.documents(spark, dir)
    // Double-mod on BOTH engines (the q103 lesson), though doc_id >= 0.
    val mod8 = ((col("doc_id") % 8) + 8) % 8
    val url = concat(lit("https://"),
      element_at(typedLit(hosts), (mod8 + 1).cast("int")),
      lit("/art/"), col("doc_id").cast("string"))
    graft.operators.Domains.governanceReport(
      docs.withColumn("__url", url),
      col("doc_id"), col("__url"), col("text"),
      quality = col("n_chars") >= 300,
      blockedHosts = Seq("bad.actor.org"),
      blockedDomains = Seq("spamfarm.net"),
      multiPartTlds = Seq("co.uk", "com.au"),
      capPerDomain = 40)
  }

  /** q182 — in-engine training of the quality classifier
    * ([[Ranking.trainHashedLogReg]]): 3 full-batch gradient steps of
    * hashed-feature logistic regression (64 buckets, lr 0.5, label
    * lang = 'en'), every intermediate on the shared 6-dp grid; the
    * gated output is the trained (bucket, w) table itself, the model
    * q130 scores with. Oracle unrolls the identical three iterations
    * as CTEs (the q126/q175 fixed-iteration discipline). */
  def q182TrainQualityLr(spark: SparkSession, dir: String): DataFrame =
    Ranking.trainHashedLogReg(Tables.documents(spark, dir),
      col("doc_id"), col("text"), label = col("lang") === "en",
      nBuckets = 64, iters = 3, lr = 0.5)._1

  /** q185 — held-out evaluation of the in-engine quality classifier
    * ([[Ranking.evalHashedLogReg]]): hash-split the corpus 80/20 (the
    * q60 convention), train the 64-bucket hashed LR for 3 steps on the
    * train slice (q182's training loop exactly), score the held-out
    * slice with the TRAINED weights at the train-calibrated cutoff
    * z > z̄_train (the decision point [[Ranking.evalHashedLogReg]]
    * documents — a raw z > 0 degenerates there), and report
    * the confusion matrix + accuracy/precision/recall/F1 as (metric,
    * value) rows. The oracle re-derives the whole chain — split,
    * 3-step unroll, held-out scoring, confusion arithmetic — so the
    * trained weights themselves sit under the hash gate end-to-end. */
  def q185EvalQualityLr(spark: SparkSession, dir: String): DataFrame =
    Ranking.evalHashedLogReg(Tables.documents(spark, dir),
        col("doc_id"), col("text"), label = col("lang") === "en",
        trainFrac = 0.8, nBuckets = 64, iters = 3, lr = 0.5)
      .orderBy(asc("metric"))

  /** q184 — fixed-size token chunking with stride
    * ([[Subword.chunkDocs]], 64-token windows every 48): the
    * RAG/pretraining windowing pass; gated on the md5 of every
    * window's CONTENT, so tokenize, start arithmetic, tail-window
    * shortening and the slice itself are all under the oracle. */
  def q184Chunking(spark: SparkSession, dir: String): DataFrame =
    Subword.chunkDocs(Tables.documents(spark, dir), col("doc_id"),
        col("text"), chunkTokens = 64, stride = 48)
      .withColumnRenamed("id", "doc_id")
      .orderBy(asc_nulls_first("doc_id"), asc("chunk_idx"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_domain_governance" -> q181DomainGovernance _,
    "q182_train_quality_lr"  -> q182TrainQualityLr _,
    "q184_chunking"          -> q184Chunking _,
    "q185_eval_quality_lr"   -> q185EvalQualityLr _,
    "q164_psi_drift"         -> q164PsiDrift _,
    "q167_chi_square"        -> q167ChiSquare _,
    "q168_neyman_alloc"      -> q168NeymanAlloc _,
    "q172_ks_split"          -> q172KsSplit _,
    "q176_entropy_profile"   -> q176EntropyProfile _,
    "q177_quantile_map"      -> q177QuantileMap _,
    "q163_source_gini"       -> q163SourceGini _,
    "q67_tfidf"              -> q67TfIdf _,
    "q68_bm25"               -> q68Bm25 _,
    "q69_shuffle_order"      -> q69ShuffleOrder _,
    "q70_temperature_sample" -> q70TemperatureSample _,
    "q71_stratum_cap"        -> q71StratumCap _,
    "q72_unigram_logprob"    -> q72UnigramLogProb _,
    "q83_bigram_lm"          -> q83BigramLm _,
    "q73_oov_rate"           -> q73OovRate _,
    "q74_centroid_scores"    -> q74CentroidScores _,
    "q75_source_kl"          -> q75SourceKl _,
    "q85_vocab_growth"       -> q85VocabGrowth _,
    "q86_embed_audit"        -> q86EmbedAudit _,
    "q87_semantic_dedup"     -> q87SemanticDedup _,
    "q90_ngram_novelty"      -> q90NgramNovelty _,
    "q91_profile"            -> q91Profile _,
    "q93_snapshot_diff"      -> q93SnapshotDiff _,
    "q94_fertility"          -> q94Fertility _,
    "q95_pack_efficiency"    -> q95PackEfficiency _,
    "q96_target_mix"         -> q96TargetMix _,
    "q97_calibrated_score"   -> q97CalibratedScore _,
    "q99_term_spectrum"      -> q99TermSpectrum _,
    "q100_epoch_plan"        -> q100EpochPlan _,
    "q107_vocab_encode"      -> q107VocabEncode _,
    "q108_shards"            -> q108Shards _,
    "q109_interleave"        -> q109Interleave _,
    "q110_collocations"      -> q110Collocations _,
    "q111_inverted_index"    -> q111InvertedIndex _,
    "q114_benford"           -> q114Benford _,
    "q121_subword_encode"    -> q121SubwordEncode _,
    "q187_subword_encode_join" -> q187SubwordEncodeJoin _,
    "q188_vocab_coverage"    -> q188VocabCoverage _,
    "q123_balanced_shards"   -> q123BalancedShards _,
    "q125_weighted_sample"   -> q125WeightedSample _,
    "q126_bpe_merges"        -> q126BpeMerges _,
    "q130_quality_classifier" -> q130QualityClassifier _,
    "q131_canonicalize"      -> q131Canonicalize _,
    "q133_canonical_dedup"   -> q133CanonicalDedup _,
    "q134_approx_profile"    -> q134ApproxProfile _,
    "q135_bpe_fertility"     -> q135BpeFertility _,
    "q136_salted_join"       -> q136SaltedJoin _,
    "q137_ppl_buckets"       -> q137PplBuckets _,
    "q138_zorder_layout"     -> q138ZorderLayout _,
    "q139_frequent_terms"    -> q139FrequentTerms _,
    "q141_data_card"         -> q141DataCard _,
    "q144_card_diff"         -> q144CardDiff _,
    "q147_dsir_weights"      -> q147DsirWeights _,
    "q148_curriculum_shards" -> q148CurriculumShards _,
    "q152_sequence_budget"   -> q152SequenceBudget _,
    "q154_term_drift"        -> q154TermDrift _,
  )

  /** Shared tokenization fragment (must mirror `TextFunctions.tokens`). */
  private val toksSql = "string_split_regex(lower(trim(text)), '\\s+')"

  /** q126's oracle: the BPE schedule unrolled, one CTE triple per
    * merge step (q87's unrolled-Lloyd discipline). `p_i` recounts
    * adjacent pairs over the step-(i−1) symbol table, `b_i` picks the
    * deterministic winner, `s_i` rewrites every word via the same
    * left-to-right list fold [[Subword]] runs (`list_reduce` with a
    * singleton-list lift so the accumulator type stays list). */
  /** The BPE training schedule's CTE prefix (`toks`/`words`/`s0` +
    * one (pair-count, winner, fold-rewrite) triple per step), shared by
    * the q126 and q135 oracles — the final symbol table is `s<n>`. */
  private def bpeIterCtes(nMerges: Int): String = {
    val iters = (1 to nMerges).map { i =>
      s""" p$i AS (
        |   SELECT p.a AS a, p.b AS b, CAST(sum(n) AS BIGINT) AS cnt
        |   FROM (SELECT n, unnest(list_transform(range(len(syms)-1),
        |       j -> {'a': syms[j+1], 'b': syms[j+2]})) AS p FROM s${i - 1})
        |   GROUP BY 1, 2),
        | b$i AS (SELECT a, b, cnt FROM p$i
        |   ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
        | s$i AS (
        |   SELECT w, n, list_reduce(list_transform(syms, s -> [s]),
        |     (acc, x) -> CASE WHEN acc[-1] = b$i.a AND x[1] = b$i.b
        |                 THEN list_concat(acc[1:-2], [b$i.a || b$i.b])
        |                 ELSE list_concat(acc, x) END) AS syms
        |   FROM s${i - 1}, b$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
      |  SELECT unnest($toksSql) AS w
      |  FROM documents WHERE text IS NOT NULL),
      | words AS (SELECT w, count(*) AS n FROM toks
      |   WHERE len(w) > 0 GROUP BY w),
      | s0 AS (SELECT w, n,
      |   list_transform(range(len(w)), i -> w[i+1:i+1]) AS syms
      |  FROM words),
      |$iters""".stripMargin
  }

  private def bpeOracleSql(nMerges: Int): String = {
    val steps = (1 to nMerges).map { i =>
      s"SELECT $i AS step, a AS l_sym, b AS r_sym, a||b AS merged, cnt FROM b$i"
    }.mkString("\nUNION ALL ")
    s"""${bpeIterCtes(nMerges)}
      |$steps
      |ORDER BY step""".stripMargin
  }

  private def bpeFertilityOracleSql(nMerges: Int): String =
    s"""${bpeIterCtes(nMerges)}
      |SELECT CAST(sum(n) AS BIGINT) AS n_words,
      |  CAST(sum(n * len(syms)) AS BIGINT) AS n_pieces,
      |  round(CAST(sum(n * len(syms)) AS DOUBLE)
      |    / CAST(sum(n) AS DOUBLE), 4) AS pieces_per_word
      | FROM s$nMerges""".stripMargin

  /** Shared CTE block mirroring [[Subword.vocab]]+[[Subword
    * .encodeWithVocab]] at V = 50, M = 4 (q94's fertility and q121's
    * encoder): the vocabulary count/top-V, a PRECOMPUTED longest-match
    * table per (distinct word, position), and the greedy walk as a
    * recursive CTE over it (each step appends the position's best piece
    * and jumps its length; no match → −1, advance 1 — exactly the Spark
    * aggregate-HOF walk). Expects a prior
    * `t AS (SELECT doc_id, …, text, $$toksSql AS toks FROM documents)`
    * and the statement to open WITH RECURSIVE. Yields `docids`
    * (doc_id, pieces INTEGER[]) — one row per doc, pieces in word
    * order. */
  private lazy val subwordEncodeOracleSql: String =
    s"""WITH RECURSIVE t AS (SELECT doc_id, text, $toksSql AS toks
      |   FROM documents),
      | $subwordCtes
      |SELECT t.doc_id,
      |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(toks) END
      |    AS BIGINT) AS n_words,
      |  CAST(coalesce(len(pieces), 0) AS BIGINT) AS n_pieces,
      |  CASE WHEN (CASE WHEN len(trim(text)) = 0 THEN 0
      |      ELSE len(toks) END) > 0 THEN
      |    round(CAST(len(pieces) AS DOUBLE)
      |      / CAST(CASE WHEN len(trim(text)) = 0 THEN 0
      |          ELSE len(toks) END AS DOUBLE), 4)
      |  END AS fertility,
      |  coalesce(array_to_string(list_transform(pieces,
      |    x -> CAST(x AS VARCHAR)), '>'), '') AS ids
      | FROM t LEFT JOIN docids USING (doc_id)
      | ORDER BY doc_id NULLS FIRST""".stripMargin

  private val subwordCtes: String =
    s"""words AS (SELECT doc_id,
      |   unnest(range(len(toks))) AS widx,
      |   unnest(toks) AS w FROM t),
      | subs AS (SELECT unnest(flatten(list_transform(range(len(w)),
      |     i -> list_transform(range(1, least(4, len(w) - i) + 1),
      |       l -> substr(w, CAST(i + 1 AS INTEGER),
      |         CAST(l AS INTEGER)))))) AS piece
      |   FROM words WHERE len(w) > 0),
      | vocab AS (SELECT piece, count(*) AS n,
      |     CAST(row_number() OVER (ORDER BY count(*) DESC, piece) - 1
      |       AS INTEGER) AS vid
      |   FROM subs GROUP BY piece ORDER BY n DESC, piece LIMIT 50),
      | dw AS (SELECT DISTINCT w FROM words),
      | wp AS (SELECT w, unnest(range(len(w))) AS pos FROM dw),
      | cand AS (SELECT wp.w, wp.pos, v.vid, len(v.piece) AS l
      |   FROM wp JOIN vocab v
      |     ON len(v.piece) <= len(wp.w) - wp.pos
      |    AND v.piece = substr(wp.w, CAST(wp.pos + 1 AS INTEGER),
      |      CAST(len(v.piece) AS INTEGER))),
      | best AS (SELECT w, pos, arg_max(vid, l) AS vid, max(l) AS step
      |   FROM cand GROUP BY 1, 2),
      | bfull AS (SELECT wp.w, wp.pos,
      |     coalesce(b.vid, -1) AS vid,
      |     coalesce(b.step, CAST(1 AS BIGINT)) AS step
      |   FROM wp LEFT JOIN best b USING (w, pos)),
      | enc AS (
      |   SELECT w, CAST(0 AS BIGINT) AS pos,
      |     CAST([] AS INTEGER[]) AS ids FROM dw
      |   UNION ALL
      |   SELECT e.w, e.pos + b.step, e.ids || [b.vid]
      |   FROM enc e JOIN bfull b ON b.w = e.w AND b.pos = e.pos
      |   WHERE e.pos < len(e.w)),
      | encf AS (SELECT w, ids FROM enc WHERE pos >= len(w)),
      | docpieces AS (SELECT wd.doc_id, wd.widx, ef.ids
      |   FROM words wd JOIN encf ef USING (w)),
      | docids AS (SELECT doc_id,
      |     flatten(list(ids ORDER BY widx)) AS pieces
      |   FROM docpieces GROUP BY doc_id)""".stripMargin
  /** DuckDB decimal-literal trap: `1.2` parses as DECIMAL, so naive
    * arithmetic would run in decimal, not IEEE double. Every fractional
    * constant below is CAST to DOUBLE so both engines perform the same
    * double ops on the same parsed values (integer±0.5/±1.0 sums are
    * exact in either representation, so casting after the add is safe). */
  private val hashFracSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) " +
      "/ CAST(4294967296.0 AS DOUBLE)"

  /** Assignment cosine for the q87 oracle — double-cast lists, in-order
    * list_sum folds, rounded to 6 dp: the SQL mirror of
    * `Cluster.cosVD` ∘ round. */
  private def cosSql(v: String, c: String): String =
    s"round(list_sum(list_transform(range(len($v)), i -> $v[i+1]*$c[i+1]))" +
      s" / (sqrt(list_sum(list_transform($v, x->x*x)))" +
      s" * sqrt(list_sum(list_transform($c, x->x*x)))), 6)"

  /** Unrolled Lloyd iterations for the q87 oracle: init = k smallest
    * vec_ids (cl = 0-based rank), then `iters` ×
    * (assign → recompute-rounded-centroids), then the final assignment
    * `af` — the same schedule `Cluster.fitCentroids` runs, so the CTE
    * chain is generated from (k, iters) instead of hand-unrolled. */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val assign = (name: String, cent: String) =>
      s"$name AS (SELECT vec_id, v, (min(struct_pack(" +
        s"nc := -${cosSql("v", "c")}, cl := cl))).cl AS cluster" +
        s" FROM e CROSS JOIN $cent GROUP BY vec_id, v)"
    val sb = new StringBuilder
    sb ++= "e AS (SELECT vec_id, list_transform(embedding," +
      " x -> CAST(x AS DOUBLE)) AS v FROM embeddings),\n"
    sb ++= "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1" +
      s" AS INTEGER) AS cl, v AS c FROM (SELECT * FROM e ORDER BY vec_id LIMIT $k)),\n"
    var cent = "c0"
    for (i <- 0 until iters) {
      sb ++= assign(s"a$i", cent) + ",\n"
      sb ++= s"c${i + 1} AS (SELECT cluster AS cl, list(m ORDER BY dim) AS c" +
        " FROM (SELECT cluster, dim, round(sum(x)/count(*), 6) AS m" +
        " FROM (SELECT cluster, unnest(range(1, len(v)+1)) AS dim," +
        s" unnest(v) AS x FROM a$i) GROUP BY 1, 2) GROUP BY cluster),\n"
      cent = s"c${i + 1}"
    }
    sb ++= assign("af", cent)
    sb.toString
  }

  /** The q83 bigram-LM CTE chain (Jelinek-Mercer λ=0.75), ending in
    * `lm` (doc_id, n_bigrams, logprob) — shared by the q83 and q137
    * oracles (the bpeIterCtes discipline: one definition, two gates). */
  private val bigramLmCtes: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      | g AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
      |     i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS u
      |   FROM t WHERE len(toks) >= 2),
      | tf AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2, count(*) AS tf
      |   FROM g GROUP BY 1, 2, 3),
      | cb AS (SELECT w1, w2, sum(tf) AS cb FROM tf GROUP BY 1, 2),
      | cl AS (SELECT w1, sum(cb) AS cl FROM cb GROUP BY 1),
      | cu AS (SELECT w2, sum(cb) AS cu FROM cb GROUP BY 1),
      | tot AS (SELECT sum(cu) AS t FROM cu),
      | scored AS (SELECT tf.doc_id, tf.tf,
      |   CAST(0.75 AS DOUBLE) * (CAST(cb.cb AS DOUBLE) / CAST(cl.cl AS DOUBLE))
      |   + CAST(0.25 AS DOUBLE) * (CAST(cu.cu AS DOUBLE) / CAST(tot.t AS DOUBLE))
      |     AS p
      |  FROM tf JOIN cb USING (w1, w2) JOIN cl USING (w1)
      |    JOIN cu USING (w2) CROSS JOIN tot),
      | lm AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
      |   round(sum(CAST(tf AS DOUBLE) * ln(p)) / CAST(sum(tf) AS DOUBLE), 4)
      |     AS logprob
      |  FROM scored GROUP BY doc_id)""".stripMargin

  /** q138's oracle key: the 16-bit Morton interleave unrolled to 32
    * disjoint-bit terms (summed — the bits never overlap, so `+` ≡ `|`),
    * with the same out-of-range→NULL contract as the native
    * [[graft.expressions.ZOrderKey]]. */
  private val zorderSql16: String = {
    val terms = (0 until 16).map { i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"CASE WHEN x < 0 OR y < 0 OR x >= 65536 OR y >= 65536 THEN NULL ELSE $terms END"
  }

  /** The q144 card builder: one data-card CTE chain (q141's arithmetic
    * with chars = len(text)) over `src`, all CTE names suffixed so two
    * cards coexist in one statement. Ends in `card$sfx`
    * (section, key, value). */
  private def cardCtes(src: String, sfx: String): String =
    s""" base$sfx AS (SELECT doc_id, lang, source, len(text) AS nch,
      |    len($toksSql) AS n_toks, md5(text) AS h FROM $src),
      | totals$sfx AS (SELECT count(*) AS nd, sum(n_toks) AS nt,
      |    sum(nch) AS nc FROM base$sfx),
      | dupg$sfx AS (SELECT h, count(*) AS cnt FROM base$sfx GROUP BY h
      |    HAVING count(*) > 1),
      | dups$sfx AS (SELECT coalesce(count(*), 0) AS g,
      |    coalesce(sum(cnt - 1), 0) AS d FROM dupg$sfx),
      | card$sfx AS (
      |  SELECT 'corpus' AS section, 'n_docs' AS key,
      |    CAST(nd AS DOUBLE) AS value FROM totals$sfx
      |  UNION ALL SELECT 'corpus', 'n_tokens', CAST(nt AS DOUBLE)
      |    FROM totals$sfx
      |  UNION ALL SELECT 'corpus', 'n_chars', CAST(nc AS DOUBLE)
      |    FROM totals$sfx
      |  UNION ALL SELECT 'corpus', 'mean_tokens',
      |    round(CAST(nt AS DOUBLE) / CAST(nd AS DOUBLE), 4) FROM totals$sfx
      |  UNION ALL SELECT 'lang', lang, CAST(count(*) AS DOUBLE)
      |    FROM base$sfx GROUP BY lang
      |  UNION ALL SELECT 'source', source, CAST(count(*) AS DOUBLE)
      |    FROM base$sfx GROUP BY source
      |  UNION ALL SELECT 'lang_token_share', lang,
      |    round(CAST(sum(n_toks) AS DOUBLE) / CAST(nt AS DOUBLE), 6)
      |    FROM base$sfx CROSS JOIN totals$sfx GROUP BY lang, nt
      |  UNION ALL SELECT 'dup', 'exact_dup_groups', CAST(g AS DOUBLE)
      |    FROM dups$sfx
      |  UNION ALL SELECT 'dup', 'exact_dup_docs', CAST(d AS DOUBLE)
      |    FROM dups$sfx)""".stripMargin

  /** The churn-snapshot CTE mirroring [[churnedDocs]] — ONE SQL
    * definition shared by the q144 and q154 oracles (NOT pre-stripped;
    * the interpolation sites run stripMargin exactly once — the
    * curationCtes contract). */
  private val churnCteSql: String =
    """churn AS (
      |   SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
      |       ELSE text END AS text, lang, source
      |     FROM documents WHERE doc_id % 3 <> 0
      |   UNION ALL
      |   SELECT doc_id + 1000000, text, lang, source FROM documents
      |     WHERE doc_id % 97 = 0)"""

  val oracle: Map[String, String] = Map(
    "q184_chunking" ->
      """WITH t AS (SELECT doc_id,
        |   string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(coalesce(text, ''))) > 0),
        | c AS (SELECT doc_id, toks, len(toks) AS n,
        |   unnest(range(CAST(floor(CAST(len(toks) - 1 AS DOUBLE)
        |     / CAST(48 AS DOUBLE)) AS BIGINT) + 1)) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  CAST(chunk_idx * 48 AS BIGINT) AS start_tok,
        |  CAST(least(64, n - chunk_idx * 48) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[CAST(chunk_idx * 48 + 1 AS BIGINT)
        |    : CAST(chunk_idx * 48
        |        + least(64, n - chunk_idx * 48) AS BIGINT)], ' '))
        |    AS chunk_md5
        | FROM c ORDER BY doc_id NULLS FIRST, chunk_idx""".stripMargin,
    "q181_domain_governance" ->
      """WITH hosts(i, h) AS (VALUES
        |   (0, 'www.alpha-press.com'), (1, 'm.alpha-press.com'),
        |   (2, 'news.daily.co.uk'), (3, 'sport.daily.co.uk'),
        |   (4, 'cdn.spamfarm.net'), (5, 'mirror.spamfarm.net'),
        |   (6, 'bad.actor.org'), (7, 'good.actor.org')),
        | d AS (SELECT doc_id, text, n_chars,
        |   'https://' || h.h || '/art/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents JOIN hosts h ON ((doc_id % 8) + 8) % 8 = h.i),
        | p AS (SELECT doc_id, text, n_chars,
        |   nullif(lower(regexp_extract(url,
        |     '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)), '') AS host
        |  FROM d),
        | rd AS (SELECT doc_id, text, n_chars, host,
        |   CASE WHEN host IS NULL THEN NULL
        |    WHEN len(string_split(host, '.')) <= 2 THEN host
        |    WHEN (string_split(host, '.')[-2] || '.'
        |        || string_split(host, '.')[-1]) IN ('co.uk', 'com.au')
        |      THEN string_split(host, '.')[-3] || '.'
        |        || string_split(host, '.')[-2] || '.'
        |        || string_split(host, '.')[-1]
        |    ELSE string_split(host, '.')[-2] || '.'
        |      || string_split(host, '.')[-1] END AS dom
        |  FROM p),
        | base AS (SELECT doc_id, host, dom,
        |   md5(array_to_string(string_split_regex(
        |     lower(trim(coalesce(text, ''))), '\s+'), ' ')) AS canon,
        |   CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0
        |     ELSE len(string_split_regex(lower(trim(text)), '\s+')) END
        |     AS nt,
        |   coalesce(n_chars >= 300, FALSE) AS q,
        |   (host IN ('bad.actor.org') OR dom IN ('spamfarm.net'))
        |     AS blocked
        |  FROM rd),
        | dup AS (SELECT canon FROM base GROUP BY canon
        |   HAVING count(*) >= 2),
        | fl AS (SELECT base.*, (dup.canon IS NOT NULL) AS isdup
        |   FROM base LEFT JOIN dup USING (canon)),
        | rep AS (SELECT dom AS domain,
        |   count(DISTINCT host) AS n_hosts, count(*) AS n_docs,
        |   CAST(sum(nt) AS BIGINT) AS n_tokens,
        |   CAST(sum(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT)
        |     AS dup_docs,
        |   CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT)
        |     AS quality_docs,
        |   CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
        |     AS blocked_docs
        |  FROM fl GROUP BY 1),
        | keptr AS (SELECT dom, row_number() OVER (PARTITION BY dom
        |     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM fl WHERE NOT blocked),
        | kept AS (SELECT dom AS domain, count(*) AS kept_after_cap
        |  FROM keptr WHERE rn <= 40 GROUP BY 1)
        |SELECT r.domain, n_hosts, n_docs, n_tokens, dup_docs,
        |  round(CAST(dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
        |    AS dup_rate,
        |  quality_docs,
        |  round(CAST(quality_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
        |    AS quality_share,
        |  blocked_docs, coalesce(kept_after_cap, 0) AS kept_after_cap
        | FROM rep r LEFT JOIN kept
        |   ON r.domain IS NOT DISTINCT FROM kept.domain
        | ORDER BY r.domain NULLS FIRST""".stripMargin,
    "q182_train_quality_lr" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term
        |   FROM documents),
        | tfb AS (SELECT doc_id,
        |   CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 64 AS b,
        |   count(*) AS tf
        |  FROM t GROUP BY 1, 2),
        | y AS (SELECT doc_id, CASE WHEN lang = 'en'
        |     THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
        |  FROM documents),
        | n AS (SELECT count(DISTINCT doc_id) AS n FROM tfb),
        | bs AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS b),
        | g1 AS (SELECT b, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * (CAST(0.5 AS DECIMAL(12,6)) - CAST(y.y AS DECIMAL(12,6))))
        |     AS DOUBLE) / n.n, 5) AS g
        |  FROM tfb JOIN y USING (doc_id) CROSS JOIN n GROUP BY b, n.n),
        | w1 AS (SELECT bs.b,
        |   round(0.0 - 0.5 * coalesce(g, 0.0), 6) AS w
        |  FROM bs LEFT JOIN g1 USING (b)),
        | z2 AS (SELECT doc_id, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * CAST(w1.w AS DECIMAL(12,6))) AS DOUBLE), 6) AS z
        |  FROM tfb JOIN w1 USING (b) GROUP BY doc_id),
        | p2 AS (SELECT doc_id,
        |   round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z2),
        | g2 AS (SELECT b, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * (CAST(p2.p AS DECIMAL(12,6)) - CAST(y.y AS DECIMAL(12,6))))
        |     AS DOUBLE) / n.n, 5) AS g
        |  FROM tfb JOIN p2 USING (doc_id) JOIN y USING (doc_id)
        |  CROSS JOIN n GROUP BY b, n.n),
        | w2 AS (SELECT w1.b,
        |   round(w1.w - 0.5 * coalesce(g2.g, 0.0), 6) AS w
        |  FROM w1 LEFT JOIN g2 USING (b)),
        | z3 AS (SELECT doc_id, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * CAST(w2.w AS DECIMAL(12,6))) AS DOUBLE), 6) AS z
        |  FROM tfb JOIN w2 USING (b) GROUP BY doc_id),
        | p3 AS (SELECT doc_id,
        |   round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z3),
        | g3 AS (SELECT b, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * (CAST(p3.p AS DECIMAL(12,6)) - CAST(y.y AS DECIMAL(12,6))))
        |     AS DOUBLE) / n.n, 5) AS g
        |  FROM tfb JOIN p3 USING (doc_id) JOIN y USING (doc_id)
        |  CROSS JOIN n GROUP BY b, n.n),
        | w3 AS (SELECT w2.b,
        |   round(w2.w - 0.5 * coalesce(g3.g, 0.0), 6) AS w
        |  FROM w2 LEFT JOIN g3 USING (b))
        |SELECT CAST(b AS INTEGER) AS bucket, w
        | FROM w3 ORDER BY bucket""".stripMargin,
    "q185_eval_quality_lr" ->
      s"""WITH base AS (SELECT doc_id, text, lang,
        |   (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) / 4294967296.0 < 0.8) AS is_train
        |  FROM documents),
        | tr AS (SELECT * FROM base WHERE is_train),
        | te AS (SELECT * FROM base WHERE NOT is_train),
        | t AS (SELECT doc_id, unnest($toksSql) AS term FROM tr),
        | tfb AS (SELECT doc_id,
        |   CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 64 AS b,
        |   count(*) AS tf
        |  FROM t GROUP BY 1, 2),
        | y AS (SELECT doc_id, CASE WHEN lang = 'en'
        |     THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
        |  FROM tr),
        | n AS (SELECT count(DISTINCT doc_id) AS n FROM tfb),
        | bs AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS b),
        | g1 AS (SELECT b, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * (CAST(0.5 AS DECIMAL(12,6)) - CAST(y.y AS DECIMAL(12,6))))
        |     AS DOUBLE) / n.n, 5) AS g
        |  FROM tfb JOIN y USING (doc_id) CROSS JOIN n GROUP BY b, n.n),
        | w1 AS (SELECT bs.b,
        |   round(0.0 - 0.5 * coalesce(g, 0.0), 6) AS w
        |  FROM bs LEFT JOIN g1 USING (b)),
        | z2 AS (SELECT doc_id, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * CAST(w1.w AS DECIMAL(12,6))) AS DOUBLE), 6) AS z
        |  FROM tfb JOIN w1 USING (b) GROUP BY doc_id),
        | p2 AS (SELECT doc_id,
        |   round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z2),
        | g2 AS (SELECT b, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * (CAST(p2.p AS DECIMAL(12,6)) - CAST(y.y AS DECIMAL(12,6))))
        |     AS DOUBLE) / n.n, 5) AS g
        |  FROM tfb JOIN p2 USING (doc_id) JOIN y USING (doc_id)
        |  CROSS JOIN n GROUP BY b, n.n),
        | w2 AS (SELECT w1.b,
        |   round(w1.w - 0.5 * coalesce(g2.g, 0.0), 6) AS w
        |  FROM w1 LEFT JOIN g2 USING (b)),
        | z3 AS (SELECT doc_id, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * CAST(w2.w AS DECIMAL(12,6))) AS DOUBLE), 6) AS z
        |  FROM tfb JOIN w2 USING (b) GROUP BY doc_id),
        | p3 AS (SELECT doc_id,
        |   round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z3),
        | g3 AS (SELECT b, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * (CAST(p3.p AS DECIMAL(12,6)) - CAST(y.y AS DECIMAL(12,6))))
        |     AS DOUBLE) / n.n, 5) AS g
        |  FROM tfb JOIN p3 USING (doc_id) JOIN y USING (doc_id)
        |  CROSS JOIN n GROUP BY b, n.n),
        | w3 AS (SELECT w2.b,
        |   round(w2.w - 0.5 * coalesce(g3.g, 0.0), 6) AS w
        |  FROM w2 LEFT JOIN g3 USING (b)),
        | ztr AS (SELECT doc_id, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * CAST(w3.w AS DECIMAL(12,6))) AS DOUBLE), 6) AS z
        |  FROM tfb JOIN w3 USING (b) GROUP BY doc_id),
        | cut AS (SELECT CAST(sum(CAST(z AS DECIMAL(20,6))) AS DOUBLE)
        |     / count(*) AS c FROM ztr),
        | tt AS (SELECT doc_id, unnest($toksSql) AS term FROM te),
        | ttfb AS (SELECT doc_id,
        |   CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 64 AS b,
        |   count(*) AS tf
        |  FROM tt GROUP BY 1, 2),
        | zt AS (SELECT doc_id, round(CAST(sum(CAST(tf AS DECIMAL(20,0))
        |     * CAST(w3.w AS DECIMAL(12,6))) AS DOUBLE), 6) AS z
        |  FROM ttfb JOIN w3 USING (b) GROUP BY doc_id),
        | sc AS (SELECT CASE WHEN te.lang = 'en' THEN 1 ELSE 0 END AS y,
        |   (coalesce(zt.z, 0.0) > cut.c) AS pred
        |  FROM te LEFT JOIN zt USING (doc_id) CROSS JOIN cut),
        | c AS (SELECT
        |   CAST(coalesce(sum(CASE WHEN pred AND y = 1 THEN 1 ELSE 0 END),
        |     0) AS BIGINT) AS tp,
        |   CAST(coalesce(sum(CASE WHEN pred AND y = 0 THEN 1 ELSE 0 END),
        |     0) AS BIGINT) AS fp,
        |   CAST(coalesce(sum(CASE WHEN NOT pred AND y = 0 THEN 1 ELSE 0
        |     END), 0) AS BIGINT) AS tn,
        |   CAST(coalesce(sum(CASE WHEN NOT pred AND y = 1 THEN 1 ELSE 0
        |     END), 0) AS BIGINT) AS fn,
        |   count(*) AS n_test FROM sc),
        | m AS (SELECT c.*, (SELECT count(*) FROM tr) AS n_train,
        |   CASE WHEN n_test > 0 THEN round(CAST(tp + tn AS DOUBLE)
        |     / CAST(n_test AS DOUBLE), 4) END AS acc,
        |   CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE)
        |     / CAST(tp + fp AS DOUBLE), 4) END AS prec,
        |   CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE)
        |     / CAST(tp + fn AS DOUBLE), 4) END AS rec
        |  FROM c),
        | m2 AS (SELECT m.*, CASE WHEN prec + rec > 0
        |   THEN round(2.0 * prec * rec / (prec + rec), 4) END AS f1
        |  FROM m)
        |SELECT metric, value FROM (
        |  SELECT 'accuracy' AS metric, acc AS value FROM m2
        |  UNION ALL SELECT 'f1', f1 FROM m2
        |  UNION ALL SELECT 'fn', CAST(fn AS DOUBLE) FROM m2
        |  UNION ALL SELECT 'fp', CAST(fp AS DOUBLE) FROM m2
        |  UNION ALL SELECT 'n_test', CAST(n_test AS DOUBLE) FROM m2
        |  UNION ALL SELECT 'n_train', CAST(n_train AS DOUBLE) FROM m2
        |  UNION ALL SELECT 'precision', prec FROM m2
        |  UNION ALL SELECT 'recall', rec FROM m2
        |  UNION ALL SELECT 'tn', CAST(tn AS DOUBLE) FROM m2
        |  UNION ALL SELECT 'tp', CAST(tp AS DOUBLE) FROM m2)
        |ORDER BY metric""".stripMargin,
    "q176_entropy_profile" ->
      """WITH m AS (SELECT lang AS grp, source AS unit,
        |   CAST(sum(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY 1, 2),
        | t AS (SELECT grp, CAST(sum(w) AS BIGINT) AS tw FROM m
        |  GROUP BY 1)
        |SELECT m.grp, count(*) AS n_units,
        |  CAST(sum(w) AS BIGINT) AS total_mass,
        |  round(sum(CASE WHEN w > 0 THEN
        |    -(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))
        |      * ln(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))
        |    ELSE 0.0 END), 4) AS entropy,
        |  round(exp(sum(CASE WHEN w > 0 THEN
        |    -(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))
        |      * ln(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))
        |    ELSE 0.0 END)), 4) AS effective_units
        | FROM m JOIN t ON m.grp = t.grp
        | WHERE tw > 0
        | GROUP BY m.grp ORDER BY m.grp NULLS FIRST""".stripMargin,
    "q177_quantile_map" ->
      """WITH b AS (SELECT source AS unit, CAST(n_chars AS DOUBLE) AS v
        |   FROM documents WHERE n_chars IS NOT NULL),
        | u AS (SELECT unit,
        |   round(quantile_cont(v, 0.25), 4) AS q1,
        |   round(quantile_cont(v, 0.5), 4) AS q2,
        |   round(quantile_cont(v, 0.75), 4) AS q3
        |  FROM b GROUP BY 1),
        | p AS (SELECT
        |   round(quantile_cont(v, 0.25), 4) AS q1,
        |   round(quantile_cont(v, 0.5), 4) AS q2,
        |   round(quantile_cont(v, 0.75), 4) AS q3
        |  FROM b)
        |SELECT unit, 25 AS pct, u.q1 AS unit_value, p.q1 AS pooled_value,
        |  round(u.q1 - p.q1, 4) AS shift FROM u CROSS JOIN p
        |UNION ALL
        |SELECT unit, 50, u.q2, p.q2, round(u.q2 - p.q2, 4)
        | FROM u CROSS JOIN p
        |UNION ALL
        |SELECT unit, 75, u.q3, p.q3, round(u.q3 - p.q3, 4)
        | FROM u CROSS JOIN p
        |ORDER BY unit NULLS FIRST, pct""".stripMargin,
    "q172_ks_split" ->
      """WITH base AS (SELECT lang AS key, n_chars AS v,
        |   CASE WHEN ((doc_id % 2) + 2) % 2 = 0 THEN 1 ELSE 0 END AS s1
        |  FROM documents WHERE n_chars IS NOT NULL),
        | pv AS (SELECT key, v, CAST(sum(s1) AS BIGINT) AS c1,
        |   CAST(sum(1 - s1) AS BIGINT) AS c2
        |  FROM base GROUP BY 1, 2),
        | cum AS (SELECT key, v, c1, c2,
        |   sum(c1) OVER (PARTITION BY key ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a1,
        |   sum(c2) OVER (PARTITION BY key ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a2
        |  FROM pv),
        | tot AS (SELECT key, CAST(sum(c1) AS BIGINT) AS n1,
        |   CAST(sum(c2) AS BIGINT) AS n2 FROM pv GROUP BY 1),
        | ks AS (SELECT c.key, n1, n2,
        |   round(max(abs(CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |     - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 4) AS ks
        |  FROM cum c JOIN tot t ON c.key = t.key
        |  WHERE n1 > 0 AND n2 > 0
        |  GROUP BY 1, 2, 3)
        |SELECT key, n1, n2, ks,
        |  ks > round(1.36 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 4) AS drifted
        | FROM ks ORDER BY key NULLS FIRST""".stripMargin,
    "q167_chi_square" ->
      """WITH cnt AS (SELECT lang AS ra, source AS cb, count(*) AS n
        |   FROM documents GROUP BY 1, 2),
        | r AS (SELECT ra, CAST(sum(n) AS BIGINT) AS r FROM cnt GROUP BY 1),
        | c AS (SELECT cb, CAST(sum(n) AS BIGINT) AS c FROM cnt GROUP BY 1),
        | t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cnt),
        | grid AS (SELECT ra, cb FROM (SELECT ra FROM r)
        |   CROSS JOIN (SELECT cb FROM c)),
        | f0 AS (SELECT
        |   CAST(coalesce(n, 0) AS DOUBLE) AS o,
        |   CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)
        |     AS e
        |  FROM grid LEFT JOIN cnt USING (ra, cb)
        |  JOIN r USING (ra) JOIN c USING (cb) CROSS JOIN t),
        | chi AS (SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2
        |   FROM f0),
        | nr AS (SELECT count(*) AS n_levels_a FROM r),
        | nc AS (SELECT count(*) AS n_levels_b FROM c)
        |SELECT CAST(n_levels_a AS BIGINT) AS n_levels_a,
        |  CAST(n_levels_b AS BIGINT) AS n_levels_b,
        |  CAST((n_levels_a - 1) * (n_levels_b - 1) AS BIGINT) AS dof,
        |  n_total, chi2
        | FROM chi CROSS JOIN nr CROSS JOIN nc CROSS JOIN t""".stripMargin,
    "q168_neyman_alloc" ->
      """WITH s AS (SELECT lang AS stratum, count(*) AS n_rows,
        |   coalesce(round(stddev_samp(CAST(n_chars AS DOUBLE)), 2), 0.0)
        |     AS sigma
        |  FROM documents GROUP BY 1),
        | w AS (SELECT stratum, n_rows, sigma,
        |   CAST(n_rows AS DOUBLE) * sigma AS wt FROM s),
        | t AS (SELECT sum(wt) AS tw FROM w)
        |SELECT stratum, CAST(n_rows AS BIGINT) AS n_rows, sigma,
        |  CASE WHEN tw > 0 THEN round(1000.0 * wt / tw, 4) END
        |    AS alloc_frac,
        |  CASE WHEN tw > 0 THEN
        |    least(CAST(round(1000.0 * wt / tw, 0) AS BIGINT),
        |      CAST(n_rows AS BIGINT)) END AS alloc_n
        | FROM w CROSS JOIN t ORDER BY stratum NULLS FIRST""".stripMargin,
    "q164_psi_drift" ->
      """WITH v AS (SELECT source AS unit, CAST(n_chars AS DOUBLE) AS v
        |   FROM documents WHERE n_chars IS NOT NULL),
        | mm AS (SELECT min(v) AS mn, max(v) AS mx FROM v),
        | b AS (SELECT unit, CAST(CASE WHEN mx = mn THEN 0
        |    ELSE least(9, floor((v - mn) * 10 / (mx - mn))) END AS INTEGER)
        |    AS bucket FROM v, mm),
        | cnt AS (SELECT unit, bucket, count(*) AS c FROM b GROUP BY 1, 2),
        | tot AS (SELECT bucket, count(*) AS t FROM b GROUP BY 1),
        | grid AS (SELECT unit, bucket FROM
        |   (SELECT DISTINCT unit FROM cnt)
        |   CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket)),
        | f0 AS (SELECT g.unit, g.bucket, coalesce(c, 0) AS c,
        |    coalesce(t, 0) AS t
        |   FROM grid g LEFT JOIN cnt USING (unit, bucket)
        |   LEFT JOIN tot USING (bucket)),
        | nu AS (SELECT unit, sum(c) AS n_unit FROM f0 GROUP BY 1),
        | na AS (SELECT sum(t) AS n_all FROM tot)
        |SELECT unit, CAST(max(n_unit) AS BIGINT) AS n_docs,
        |  round(sum(
        |    ((CAST(c AS DOUBLE) + 0.5) / (CAST(n_unit AS DOUBLE) + 5.0)
        |     - (CAST(t - c AS DOUBLE) + 0.5)
        |       / (CAST(n_all - n_unit AS DOUBLE) + 5.0))
        |    * ln(((CAST(c AS DOUBLE) + 0.5) / (CAST(n_unit AS DOUBLE) + 5.0))
        |      / ((CAST(t - c AS DOUBLE) + 0.5)
        |        / (CAST(n_all - n_unit AS DOUBLE) + 5.0)))), 4) AS psi,
        |  round(sum(
        |    ((CAST(c AS DOUBLE) + 0.5) / (CAST(n_unit AS DOUBLE) + 5.0)
        |     - (CAST(t - c AS DOUBLE) + 0.5)
        |       / (CAST(n_all - n_unit AS DOUBLE) + 5.0))
        |    * ln(((CAST(c AS DOUBLE) + 0.5) / (CAST(n_unit AS DOUBLE) + 5.0))
        |      / ((CAST(t - c AS DOUBLE) + 0.5)
        |        / (CAST(n_all - n_unit AS DOUBLE) + 5.0)))), 4) > 0.2
        |    AS drifted
        | FROM f0 JOIN nu USING (unit) CROSS JOIN na
        | GROUP BY unit ORDER BY unit NULLS FIRST""".stripMargin,
    "q163_source_gini" ->
      """WITH m AS (SELECT lang AS grp, source AS unit,
        |   sum(n_chars) AS w FROM documents GROUP BY 1, 2),
        | r AS (SELECT grp, w,
        |   CAST(row_number() OVER (PARTITION BY grp ORDER BY w, unit)
        |     AS BIGINT) AS i
        |  FROM m),
        | s AS (SELECT grp, count(*) AS n_units,
        |   CAST(sum(w) AS BIGINT) AS total_mass,
        |   CAST(sum(i * w) AS BIGINT) AS siw
        |  FROM r GROUP BY grp)
        |SELECT grp, CAST(n_units AS BIGINT) AS n_units, total_mass,
        |  CASE WHEN total_mass > 0 THEN
        |    round(2.0 * CAST(siw AS DOUBLE)
        |        / (CAST(n_units AS DOUBLE) * CAST(total_mass AS DOUBLE))
        |      - (CAST(n_units AS DOUBLE) + 1.0) / CAST(n_units AS DOUBLE),
        |      4)
        |  END AS gini
        | FROM s ORDER BY grp NULLS FIRST""".stripMargin,
    "q154_term_drift" ->
      s"""WITH $churnCteSql,
        | ta AS (SELECT unnest($toksSql) AS term, false AS isnew
        |   FROM documents),
        | tb AS (SELECT unnest($toksSql) AS term, true AS isnew
        |   FROM churn),
        | u AS (SELECT term, isnew FROM ta
        |   UNION ALL SELECT term, isnew FROM tb),
        | c AS (SELECT term,
        |   sum(CASE WHEN NOT isnew THEN 1 ELSE 0 END) AS n_old,
        |   sum(CASE WHEN isnew THEN 1 ELSE 0 END) AS n_new
        |  FROM u GROUP BY term),
        | t AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new,
        |   count(*) AS nv FROM c)
        |SELECT term, CAST(n_old AS BIGINT) AS n_old,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  round(ln(CAST(n_new + 1 AS DOUBLE) / CAST(t_new + nv AS DOUBLE))
        |    - ln(CAST(n_old + 1 AS DOUBLE) / CAST(t_old + nv AS DOUBLE)), 4)
        |    AS drift
        | FROM c CROSS JOIN t
        | ORDER BY abs(drift) DESC, term ASC LIMIT 30""".stripMargin,
    "q144_card_diff" ->
      s"""WITH $churnCteSql,
        |${cardCtes("documents", "_o")},
        |${cardCtes("churn", "_n")}
        |SELECT section, key, o.value AS old_value, n.value AS new_value,
        |  round(coalesce(n.value, 0) - coalesce(o.value, 0), 6) AS delta
        | FROM card_o o FULL JOIN card_n n USING (section, key)
        | ORDER BY section NULLS FIRST, key NULLS FIRST""".stripMargin,
    "q137_ppl_buckets" ->
      s"""$bigramLmCtes,
        | banded AS (SELECT d.doc_id, d.lang, lm.n_bigrams, lm.logprob,
        |     CAST(ntile(3) OVER (PARTITION BY d.lang
        |       ORDER BY lm.logprob DESC, d.doc_id) AS INTEGER) AS bucket
        |   FROM documents d JOIN lm USING (doc_id))
        |SELECT doc_id, lang, n_bigrams, logprob, bucket FROM banded
        |UNION ALL
        |SELECT d.doc_id, d.lang, CAST(NULL AS BIGINT) AS n_bigrams,
        |  CAST(NULL AS DOUBLE) AS logprob, CAST(0 AS INTEGER) AS bucket
        | FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM lm)
        |ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q138_zorder_layout" ->
      s"""WITH keyed AS (
        |  SELECT o_orderkey, o_custkey AS x,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS y
        |  FROM orders),
        | z AS (SELECT o_orderkey, x, y, $zorderSql16 AS zkey FROM keyed),
        | b AS (SELECT x, y, zkey,
        |    (row_number() OVER (ORDER BY zkey NULLS FIRST, o_orderkey) - 1)
        |      // 32 AS block FROM z)
        |SELECT block, count(*) AS n,
        |  min(x) AS min_cust, max(x) AS max_cust,
        |  min(y) AS min_day, max(y) AS max_day,
        |  min(zkey) AS zmin, max(zkey) AS zmax
        | FROM b GROUP BY block ORDER BY block""".stripMargin,
    "q141_data_card" ->
      s"""WITH base AS (SELECT doc_id, lang, source, n_chars,
        |    len($toksSql) AS n_toks, md5(text) AS h FROM documents),
        | totals AS (SELECT count(*) AS nd, sum(n_toks) AS nt,
        |    sum(n_chars) AS nc FROM base),
        | dupg AS (SELECT h, count(*) AS cnt FROM base GROUP BY h
        |    HAVING count(*) > 1),
        | dups AS (SELECT coalesce(count(*), 0) AS g,
        |    coalesce(sum(cnt - 1), 0) AS d FROM dupg)
        |SELECT 'corpus' AS section, 'n_docs' AS key,
        |   CAST(nd AS DOUBLE) AS value FROM totals
        |UNION ALL SELECT 'corpus', 'n_tokens', CAST(nt AS DOUBLE) FROM totals
        |UNION ALL SELECT 'corpus', 'n_chars', CAST(nc AS DOUBLE) FROM totals
        |UNION ALL SELECT 'corpus', 'mean_tokens',
        |   round(CAST(nt AS DOUBLE) / CAST(nd AS DOUBLE), 4) FROM totals
        |UNION ALL SELECT 'lang', lang, CAST(count(*) AS DOUBLE)
        |   FROM base GROUP BY lang
        |UNION ALL SELECT 'source', source, CAST(count(*) AS DOUBLE)
        |   FROM base GROUP BY source
        |UNION ALL SELECT 'lang_token_share', lang,
        |   round(CAST(sum(n_toks) AS DOUBLE) / CAST(nt AS DOUBLE), 6)
        |   FROM base CROSS JOIN totals GROUP BY lang, nt
        |UNION ALL SELECT 'dup', 'exact_dup_groups', CAST(g AS DOUBLE) FROM dups
        |UNION ALL SELECT 'dup', 'exact_dup_docs', CAST(d AS DOUBLE) FROM dups
        |ORDER BY section NULLS FIRST, key NULLS FIRST""".stripMargin,
    "q139_frequent_terms" ->
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
        | tok AS (SELECT unnest(toks) AS term FROM t),
        | cf AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
        | tot AS (SELECT count(*) AS total FROM tok)
        |SELECT term, n,
        |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
        | FROM cf CROSS JOIN tot WHERE n * 31 > total
        | ORDER BY n DESC, term""".stripMargin,
    "q67_tfidf" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        | tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        | dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        | n AS (SELECT count(*) AS n_docs FROM documents),
        | scored AS (SELECT doc_id, term,
        |     round(CAST(tf AS DOUBLE) *
        |       (ln(CAST(n_docs + 1.0 AS DOUBLE) / CAST(df + 1.0 AS DOUBLE))
        |        + CAST(1.0 AS DOUBLE)), 4) AS score
        |   FROM tfc JOIN dfc USING (term) CROSS JOIN n),
        | rk AS (SELECT doc_id, term, score,
        |     row_number() OVER (PARTITION BY doc_id
        |       ORDER BY score DESC, term) AS rank FROM scored)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score FROM rk
        | WHERE rank <= 3 ORDER BY doc_id NULLS FIRST, rank""".stripMargin,
    "q68_bm25" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | lens AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS dl FROM t),
        | corpus AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |     count(*) AS n_docs FROM lens),
        | tfc AS (SELECT doc_id, term, count(*) AS tf
        |   FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        |   WHERE term IN ('spark', 'window', 'hash') GROUP BY 1, 2),
        | dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        | parts AS (SELECT tfc.doc_id,
        |     ln(CAST(1.0 AS DOUBLE) +
        |        CAST(n_docs - df + 0.5 AS DOUBLE) / CAST(df + 0.5 AS DOUBLE)) *
        |       (CAST(tf AS DOUBLE) *
        |        (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
        |       (CAST(tf AS DOUBLE) +
        |         CAST(1.2 AS DOUBLE) *
        |           ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
        |            CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / avgdl))) AS part
        |   FROM tfc JOIN dfc USING (term) JOIN lens USING (doc_id)
        |   CROSS JOIN corpus)
        |SELECT doc_id, round(sum(part), 4) AS score FROM parts
        | GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q69_shuffle_order" ->
      """SELECT doc_id, row_number() OVER
        |   (ORDER BY md5(CAST(doc_id AS VARCHAR))) AS shuffle_pos
        | FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q70_temperature_sample" ->
      s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        | tot AS (SELECT sum(cnt) AS n,
        |     sum(sqrt(CAST(cnt AS DOUBLE))) AS wsum FROM c),
        | r AS (SELECT lang,
        |     least(CAST(1.0 AS DOUBLE),
        |       CAST(0.5 AS DOUBLE) * n * sqrt(CAST(cnt AS DOUBLE))
        |         / wsum / cnt) AS rate FROM c CROSS JOIN tot)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        | WHERE $hashFracSql < r.rate
        | ORDER BY d.doc_id NULLS FIRST""".stripMargin,
    "q71_stratum_cap" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        | WHERE rn <= 10 ORDER BY source NULLS FIRST, doc_id""".stripMargin,
    "q72_unigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        | tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        | cf AS (SELECT term, sum(tf) AS ctf FROM tfc GROUP BY 1),
        | tot AS (SELECT sum(ctf) AS total_tokens FROM cf)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(sum(CAST(tf AS DOUBLE) *
        |      ln(CAST(ctf AS DOUBLE) / CAST(total_tokens AS DOUBLE)))
        |    / CAST(sum(tf) AS DOUBLE), 4) AS logprob
        | FROM tfc JOIN cf USING (term) CROSS JOIN tot
        | GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q147_dsir_weights" ->
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt, $toksSql AS toks
        |   FROM documents),
        | tok AS (SELECT doc_id, tgt, unnest(toks) AS term FROM t),
        | tfc AS (SELECT doc_id, tgt, term, count(*) AS tf FROM tok
        |   GROUP BY 1, 2, 3),
        | v AS (SELECT term,
        |     sum(CASE WHEN tgt THEN tf ELSE 0 END) AS tt,
        |     sum(tf) AS tc
        |   FROM tfc GROUP BY 1),
        | tot AS (SELECT sum(tt) AS t_tgt, sum(tc) AS t_all,
        |     count(*) AS nv FROM v),
        | w AS (SELECT term,
        |     round(ln(CAST(tt + 1 AS DOUBLE) / CAST(t_tgt + nv AS DOUBLE))
        |       - ln(CAST(tc + 1 AS DOUBLE) / CAST(t_all + nv AS DOUBLE)), 4)
        |       AS w
        |   FROM v CROSS JOIN tot)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(sum(CAST(tf AS DOUBLE) * w), 4) AS z
        | FROM tfc JOIN w USING (term) WHERE NOT tgt
        | GROUP BY doc_id ORDER BY z DESC, doc_id ASC LIMIT 50""".stripMargin,
    "q148_curriculum_shards" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        | tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        | cf AS (SELECT term, sum(tf) AS ctf FROM tfc GROUP BY 1),
        | tot AS (SELECT sum(ctf) AS total_tokens FROM cf),
        | lp AS (SELECT doc_id,
        |   round(sum(CAST(tf AS DOUBLE) *
        |       ln(CAST(ctf AS DOUBLE) / CAST(total_tokens AS DOUBLE)))
        |     / CAST(sum(tf) AS DOUBLE), 4) AS logprob
        |  FROM tfc JOIN cf USING (term) CROSS JOIN tot GROUP BY doc_id),
        | d AS (SELECT dd.doc_id, -lp.logprob AS difficulty
        |   FROM documents dd LEFT JOIN lp USING (doc_id)),
        | r AS (SELECT doc_id, difficulty,
        |   row_number() OVER (ORDER BY difficulty ASC NULLS FIRST,
        |     doc_id ASC) AS rn,
        |   count(*) OVER () AS n FROM d),
        | s AS (SELECT doc_id, difficulty,
        |   CAST((rn - 1) * 8 // n AS INT) AS shard FROM r)
        |SELECT shard, count(*) AS n_docs,
        |  min(difficulty) AS min_difficulty,
        |  max(difficulty) AS max_difficulty
        | FROM s GROUP BY shard ORDER BY shard""".stripMargin,
    "q152_sequence_budget" ->
      s"""WITH d AS (SELECT lang,
        |   CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0
        |     ELSE len($toksSql) END AS tok
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS total_tokens,
        |  CAST(sum((tok + 127) // 128) AS BIGINT) AS total_seqs,
        |  CAST(sum((tok + 127) // 128) * 128 - sum(tok) AS BIGINT)
        |    AS padding_tokens,
        |  CASE WHEN sum((tok + 127) // 128) > 0 THEN
        |    round(CAST(sum(tok) AS DOUBLE)
        |      / CAST(sum((tok + 127) // 128) * 128 AS DOUBLE), 6)
        |  END AS efficiency
        | FROM d GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,
    "q83_bigram_lm" ->
      s"""$bigramLmCtes
        |SELECT doc_id, n_bigrams, logprob FROM lm
        | ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q73_oov_rate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        | tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        | cf AS (SELECT term, sum(tf) AS ctf FROM tfc GROUP BY 1),
        | vocab AS (SELECT term FROM cf ORDER BY ctf DESC, term LIMIT 20)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(tf) - sum(CASE WHEN term IN (SELECT term FROM vocab)
        |        THEN tf ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(tf) AS DOUBLE), 4) AS oov_rate
        | FROM tfc GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q74_centroid_scores" ->
      """WITH u AS (SELECT label,
        |    unnest(range(1, len(embedding) + 1)) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
        |  FROM embeddings),
        | c AS (SELECT label, dim, round(sum(x) / count(*), 6) AS m
        |  FROM u GROUP BY 1, 2),
        | cent AS (SELECT label, list(m ORDER BY dim) AS centroid
        |  FROM c GROUP BY label),
        | s AS (SELECT e.vec_id, e.label,
        |   list_sum(list_transform(range(len(e.embedding)),
        |     i -> CAST(e.embedding[i+1] AS DOUBLE) * centroid[i+1]))
        |   / (sqrt(list_sum(list_transform(range(len(e.embedding)),
        |       i -> CAST(e.embedding[i+1] AS DOUBLE)
        |              * CAST(e.embedding[i+1] AS DOUBLE))))
        |    * sqrt(list_sum(list_transform(range(len(centroid)),
        |       i -> centroid[i+1] * centroid[i+1])))) AS sc
        |  FROM embeddings e JOIN cent USING (label))
        |SELECT vec_id, label, round(sc, 4) AS score FROM s
        | ORDER BY vec_id""".stripMargin,
    "q75_source_kl" ->
      s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
        | tok AS (SELECT source, unnest(toks) AS term FROM t),
        | gf AS (SELECT source, term, count(*) AS gtf FROM tok GROUP BY 1, 2),
        | cf AS (SELECT term, sum(gtf) AS ctf FROM gf GROUP BY 1),
        | tot AS (SELECT sum(ctf) AS total_tokens FROM cf),
        | gt AS (SELECT source, sum(gtf) AS gtot FROM gf GROUP BY 1),
        | parts AS (SELECT gf.source, gtot,
        |   (CAST(gtf AS DOUBLE) / CAST(gtot AS DOUBLE)) *
        |     ln((CAST(gtf AS DOUBLE) / CAST(gtot AS DOUBLE)) /
        |        (CAST(ctf AS DOUBLE) / CAST(total_tokens AS DOUBLE))) AS part
        |  FROM gf JOIN cf USING (term) JOIN gt USING (source) CROSS JOIN tot)
        |SELECT source, CAST(max(gtot) AS BIGINT) AS n_tokens,
        |  round(sum(part), 4) AS kl
        | FROM parts GROUP BY source ORDER BY source NULLS FIRST""".stripMargin,
    "q85_vocab_growth" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
        | f AS (SELECT term, min(doc_id) AS doc_id FROM t GROUP BY 1),
        | nv AS (SELECT doc_id, count(*) AS novel FROM f GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(nv.novel, 0) AS BIGINT) AS novel_terms,
        |  CAST(sum(coalesce(nv.novel, 0)) OVER (ORDER BY d.doc_id)
        |    AS BIGINT) AS vocab_size
        | FROM documents d LEFT JOIN nv USING (doc_id)
        | ORDER BY d.doc_id NULLS FIRST""".stripMargin,
    "q91_profile" ->
      """WITH a AS (SELECT count(*) AS n,
        |  count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
        |    min(o_orderkey) AS mn1, max(o_orderkey) AS mx1,
        |  count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
        |    min(o_custkey) AS mn2, max(o_custkey) AS mx2,
        |  count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS nd3,
        |  count(o_totalprice) AS nn4, count(DISTINCT o_totalprice) AS nd4,
        |    min(o_totalprice) AS mn4, max(o_totalprice) AS mx4,
        |  count(o_orderdate) AS nn5, count(DISTINCT o_orderdate) AS nd5,
        |  count(o_orderpriority) AS nn6, count(DISTINCT o_orderpriority) AS nd6
        | FROM orders)
        |SELECT * FROM (
        | SELECT 'o_orderkey' AS col_name, n, n - nn1 AS n_null,
        |   nd1 AS n_distinct, CAST(mn1 AS DOUBLE) AS min_num,
        |   CAST(mx1 AS DOUBLE) AS max_num FROM a
        | UNION ALL SELECT 'o_custkey', n, n - nn2, nd2,
        |   CAST(mn2 AS DOUBLE), CAST(mx2 AS DOUBLE) FROM a
        | UNION ALL SELECT 'o_orderstatus', n, n - nn3, nd3,
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
        | UNION ALL SELECT 'o_totalprice', n, n - nn4, nd4, mn4, mx4 FROM a
        | UNION ALL SELECT 'o_orderdate', n, n - nn5, nd5,
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
        | UNION ALL SELECT 'o_orderpriority', n, n - nn6, nd6,
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a)
        |ORDER BY col_name""".stripMargin,
    "q90_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | sh AS (SELECT doc_id, CASE WHEN len(toks) < 3
        |     THEN [array_to_string(toks, ' ')]
        |     ELSE list_distinct(list_transform(range(len(toks) - 2),
        |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END
        |   AS s FROM t),
        | sz AS (SELECT doc_id, len(s) AS n_shingles FROM sh),
        | ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        | fo AS (SELECT g, min(doc_id) AS doc_id FROM ex GROUP BY g),
        | nv AS (SELECT doc_id, count(*) AS n_novel FROM fo GROUP BY doc_id)
        |SELECT sz.doc_id, CAST(sz.n_shingles AS BIGINT) AS n_shingles,
        |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(coalesce(nv.n_novel, 0) AS DOUBLE) / sz.n_shingles AS novelty
        | FROM sz LEFT JOIN nv ON nv.doc_id = sz.doc_id
        | ORDER BY sz.doc_id NULLS FIRST""".stripMargin,
    "q86_embed_audit" ->
      """WITH s0 AS (SELECT label, embedding AS v,
        |   CASE WHEN embedding IS NULL THEN NULL
        |     ELSE len(list_filter(embedding,
        |       x -> isnan(x) OR isinf(x))) > 0 END AS nonfinite
        |  FROM embeddings),
        | s AS (SELECT label, v, nonfinite,
        |   CASE WHEN v IS NULL OR nonfinite THEN NULL
        |     ELSE sqrt(coalesce(list_sum(list_transform(v,
        |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |       CAST(0.0 AS DOUBLE))) END AS nrm
        |  FROM s0)
        |SELECT label, count(*) AS n,
        |  count(CASE WHEN v IS NULL THEN 1 END) AS n_null,
        |  count(CASE WHEN v IS NOT NULL AND len(v) <> 64 THEN 1 END)
        |    AS n_bad_dim,
        |  count(CASE WHEN nonfinite THEN 1 END) AS n_nonfinite,
        |  count(CASE WHEN nrm = 0 THEN 1 END) AS n_zero_norm,
        |  round(min(nrm), 6) AS min_norm,
        |  round(max(nrm), 6) AS max_norm,
        |  round(sum(nrm) / count(nrm), 6) AS mean_norm
        | FROM s GROUP BY label ORDER BY label""".stripMargin,
    "q93_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, md5(coalesce(text, '')) AS old_md5
        |   FROM documents),
        | new AS (
        |   SELECT doc_id, md5(coalesce(CASE WHEN doc_id % 5 = 0
        |       THEN text || ' rev2' ELSE text END, '')) AS new_md5
        |     FROM documents WHERE doc_id % 3 <> 0
        |   UNION ALL
        |   SELECT doc_id + 1000000, md5(coalesce(text, ''))
        |     FROM documents WHERE doc_id % 97 = 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.old_md5 <> n.new_md5 THEN 'changed' END AS status,
        |  o.old_md5, n.new_md5
        | FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
        | WHERE (CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.old_md5 <> n.new_md5 THEN 'changed' END) IS NOT NULL
        | ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q94_fertility" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, lang, text, $toksSql AS toks
        |   FROM documents),
        | $subwordCtes,
        | s AS (SELECT lang,
        |   CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0
        |     ELSE len(toks) END AS nt,
        |   len(coalesce(text, '')) AS nc
        |  FROM t),
        | base AS (SELECT lang, count(*) AS n_docs,
        |   CAST(sum(nt) AS BIGINT) AS n_tokens,
        |   CAST(sum(nc) AS BIGINT) AS n_chars,
        |   CASE WHEN sum(nt) > 0 THEN
        |     round(CAST(sum(nc) AS DOUBLE) / CAST(sum(nt) AS DOUBLE), 4)
        |   END AS chars_per_token,
        |   round(CAST(sum(nt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
        |     AS tokens_per_doc
        |  FROM s GROUP BY lang),
        | subagg AS (SELECT lang,
        |   CAST(sum(len(pieces)) AS BIGINT) AS np,
        |   CAST(sum(CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0
        |     ELSE len(toks) END) AS BIGINT) AS nw
        |  FROM t JOIN docids USING (doc_id) GROUP BY lang)
        |SELECT base.lang, n_docs, n_tokens, n_chars, chars_per_token,
        |  tokens_per_doc,
        |  CASE WHEN nw > 0 THEN
        |    round(CAST(np AS DOUBLE) / CAST(nw AS DOUBLE), 4)
        |  END AS pieces_per_token
        | FROM base JOIN subagg ON base.lang = subagg.lang
        | ORDER BY base.lang NULLS FIRST""".stripMargin,
    "q125_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight
        |   FROM documents WHERE n_chars > 0),
        | kk AS (SELECT doc_id, weight,
        |   round(pow($hashFracSql,
        |     CAST(1.0 AS DOUBLE) / weight), 6) AS key
        |  FROM d),
        | r AS (SELECT doc_id, weight, key,
        |   row_number() OVER (ORDER BY key DESC, doc_id) AS rank FROM kk)
        |SELECT doc_id, weight, key, CAST(rank AS BIGINT) AS rank
        | FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    "q123_balanced_shards" ->
      s"""WITH d AS (SELECT doc_id,
        |   CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0
        |     ELSE len($toksSql) END AS w
        |  FROM documents),
        | r AS (SELECT doc_id, w,
        |   row_number() OVER (ORDER BY w DESC, doc_id) AS rn FROM d),
        | s AS (SELECT doc_id, w,
        |   CAST(CASE WHEN (rn - 1) % 16 < 8 THEN (rn - 1) % 16
        |        ELSE 15 - ((rn - 1) % 16) END AS INTEGER) AS shard
        |  FROM r)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS total_tokens
        | FROM s GROUP BY shard ORDER BY shard""".stripMargin,
    "q121_subword_encode" -> subwordEncodeOracleSql,
    "q188_vocab_coverage" ->
      s"""WITH t AS (SELECT lang, unnest($toksSql) AS w FROM documents),
        | tt AS (SELECT lang, w FROM t WHERE len(w) > 0),
        | v AS (SELECT w FROM (SELECT w, count(*) AS n FROM tt
        |   GROUP BY w ORDER BY n DESC, w LIMIT 64)),
        | j AS (SELECT tt.lang,
        |   CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END AS c
        |  FROM tt LEFT JOIN v ON tt.w = v.w)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(c) AS BIGINT) AS n_covered,
        |  round(CAST(1.0 AS DOUBLE) - CAST(sum(c) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 4) AS oov_rate
        | FROM j GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,
    // q187: the vocabulary-JOIN encode is output-identical to q121 by
    // the Wave21Spec literal-equals-join gate; the same oracle gates it
    // against DuckDB independently.
    "q187_subword_encode_join" -> subwordEncodeOracleSql,
    "q126_bpe_merges" -> bpeOracleSql(BpeMerges),
    "q135_bpe_fertility" -> bpeFertilityOracleSql(BpeMerges),
    "q136_salted_join" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | GROUP BY s_name ORDER BY s_name NULLS FIRST""".stripMargin,
    "q131_canonicalize" ->
      """WITH c AS (SELECT doc_id, CAST(len(text) AS BIGINT) AS len_raw,
        |   trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |     '[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g')) AS canon
        |  FROM documents)
        |SELECT doc_id, len_raw, CAST(len(canon) AS BIGINT) AS len_canon,
        |  md5(canon) AS canon_md5
        | FROM c ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q134_approx_profile" ->
      """WITH e AS (
        |  SELECT 'doc_id' AS col_name,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_exact
        |   FROM documents
        |  UNION ALL SELECT 'lang',
        |    CAST(count(DISTINCT lang) AS BIGINT) FROM documents
        |  UNION ALL SELECT 'n_chars',
        |    CAST(count(DISTINCT n_chars) AS BIGINT) FROM documents
        |  UNION ALL SELECT 'source',
        |    CAST(count(DISTINCT source) AS BIGINT) FROM documents)
        |SELECT col_name, n_exact, true AS approx_ok
        | FROM e ORDER BY col_name""".stripMargin,
    "q133_canonical_dedup" ->
      """WITH c AS (SELECT doc_id,
        |   md5(trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |     '[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g'))) AS canon_md5
        |  FROM documents),
        | g AS (SELECT doc_id, canon_md5,
        |   min(doc_id) OVER (PARTITION BY canon_md5) AS canon_group
        |  FROM c)
        |SELECT doc_id, canon_md5, canon_group,
        |  doc_id = canon_group AS keep
        | FROM g ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q130_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term
        |   FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        | fb AS (SELECT doc_id, tf.tf,
        |   CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 256 AS b
        |  FROM tf),
        | w AS (SELECT i AS b,
        |   round((CAST(('0x' || substr(md5('q130_' || i), 1, 8)) AS BIGINT)
        |       / CAST(4294967296.0 AS DOUBLE)
        |     - CAST(0.5 AS DOUBLE)) * CAST(2.0 AS DOUBLE), 6) AS w
        |  FROM range(256) t(i)),
        | zz AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |   round(sum(tf * w.w)
        |     + CAST(0.0 AS DOUBLE) * sum(tf), 6) AS z
        |  FROM fb JOIN w USING (b) GROUP BY doc_id),
        | s AS (SELECT d.doc_id, coalesce(zz.n_tokens, 0) AS n_tokens,
        |   coalesce(zz.z, CAST(0.0 AS DOUBLE)) AS z
        |  FROM documents d LEFT JOIN zz USING (doc_id))
        |SELECT doc_id, n_tokens, z,
        |  z >= CAST(0.0 AS DOUBLE) AS keep
        | FROM s ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q95_pack_efficiency" ->
      s"""WITH s AS (SELECT source,
        |   CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0
        |     ELSE len($toksSql) END AS nt
        |  FROM documents),
        | g AS (SELECT source, count(*) AS n_docs,
        |   CAST(sum(nt) AS BIGINT) AS n_tokens,
        |   CAST(sum(CAST(floor(CAST(nt + 127 AS DOUBLE)
        |     / CAST(128 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS pad_chunks
        |  FROM s GROUP BY source)
        |SELECT source, n_docs, n_tokens, pad_chunks,
        |  CASE WHEN pad_chunks > 0 THEN
        |    round(CAST(1.0 AS DOUBLE) - CAST(n_tokens AS DOUBLE)
        |      / (CAST(pad_chunks AS DOUBLE) * CAST(128 AS DOUBLE)), 4)
        |  END AS pad_waste,
        |  CAST(floor(CAST(n_tokens + 127 AS DOUBLE)
        |    / CAST(128 AS DOUBLE)) AS BIGINT) AS packed_chunks,
        |  CASE WHEN n_tokens + 127 >= 128 THEN
        |    round(CAST(1.0 AS DOUBLE) - CAST(n_tokens AS DOUBLE)
        |      / (CAST(floor(CAST(n_tokens + 127 AS DOUBLE)
        |           / CAST(128 AS DOUBLE)) AS DOUBLE)
        |         * CAST(128 AS DOUBLE)), 4)
        |  END AS packed_waste
        | FROM g ORDER BY source NULLS FIRST""".stripMargin,
    "q97_calibrated_score" ->
      """SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS score,
        |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars)
        |    AS pct
        | FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q99_term_spectrum" ->
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
        | g AS (SELECT unnest(list_transform(range(len(toks) - 2),
        |     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS term
        |   FROM t WHERE len(toks) >= 3),
        | cf AS (SELECT term, count(*) AS ctf FROM g GROUP BY term)
        |SELECT CAST(least(ctf, 11) AS BIGINT) AS freq,
        |  count(*) AS n_terms
        | FROM cf GROUP BY 1 ORDER BY freq""".stripMargin,
    "q114_benford" ->
      """WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
        |   WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
        | d AS (SELECT least(greatest(CAST(floor(x / power(CAST(10 AS DOUBLE),
        |     floor(log10(x)))) AS INTEGER), 1), 9) AS digit FROM v),
        | obs9 AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        | d9 AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
        | c AS (SELECT d9.digit, coalesce(n, 0) AS n
        |   FROM d9 LEFT JOIN obs9 USING (digit)),
        | tot AS (SELECT sum(n) AS t FROM c)
        |SELECT digit, n,
        |  CASE WHEN t > 0 THEN
        |    round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 4) END AS obs_freq,
        |  round(log10(CAST(1.0 AS DOUBLE)
        |    + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 4)
        |    AS benford_freq,
        |  round(CAST(t AS DOUBLE)
        |    * (CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
        |       - log10(CAST(1.0 AS DOUBLE)
        |           + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
        |    * (CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
        |       - log10(CAST(1.0 AS DOUBLE)
        |           + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
        |    / log10(CAST(1.0 AS DOUBLE)
        |        + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 4)
        |    AS chi2_part
        | FROM c CROSS JOIN tot ORDER BY digit""".stripMargin,
    "q111_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        | tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        | dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        | rk AS (SELECT term, doc_id, tf, row_number() OVER
        |     (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn FROM tfc),
        | cap AS (SELECT * FROM rk WHERE rn <= 10)
        |SELECT term, CAST(df AS BIGINT) AS df,
        |  CAST(count(*) AS BIGINT) AS n_postings,
        |  array_to_string(list(CAST(doc_id AS VARCHAR) || ':'
        |    || CAST(tf AS VARCHAR) ORDER BY tf DESC, doc_id), '>')
        |    AS postings
        | FROM cap JOIN dfc USING (term) GROUP BY term, df
        | ORDER BY term NULLS FIRST""".stripMargin,
    "q110_collocations" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | g AS (SELECT unnest(list_transform(range(len(toks) - 1),
        |     i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS u
        |   FROM t WHERE len(toks) >= 2),
        | cb AS (SELECT u.w1 AS w1, u.w2 AS w2, count(*) AS cb
        |   FROM g GROUP BY 1, 2),
        | cl AS (SELECT w1, sum(cb) AS cl FROM cb GROUP BY 1),
        | cu AS (SELECT w2, sum(cb) AS cu FROM cb GROUP BY 1),
        | tot AS (SELECT sum(cu) AS t FROM cu)
        |SELECT cb.w1, cb.w2, CAST(cb.cb AS BIGINT) AS n,
        |  round(ln((CAST(cb.cb AS DOUBLE) * CAST(tot.t AS DOUBLE))
        |    / (CAST(cl.cl AS DOUBLE) * CAST(cu.cu AS DOUBLE))), 4) AS pmi
        | FROM cb JOIN cl USING (w1) JOIN cu USING (w2) CROSS JOIN tot
        | WHERE cb.cb >= 5
        | ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    "q108_shards" ->
      """SELECT doc_id,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 8 AS INTEGER) AS shard
        | FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q109_interleave" ->
      """WITH s AS (SELECT DISTINCT source FROM documents),
        | idx AS (SELECT source,
        |     CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT)
        |       AS sidx,
        |     CAST(count(*) OVER () AS BIGINT) AS nstrata FROM s),
        | r AS (SELECT doc_id, source,
        |     CAST(row_number() OVER (PARTITION BY source
        |       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
        |       AS BIGINT) AS rk
        |   FROM documents)
        |SELECT r.doc_id, r.source, rk * nstrata + sidx + 1 AS pos
        | FROM r JOIN idx USING (source) ORDER BY pos""".stripMargin,
    "q107_vocab_encode" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | p AS (SELECT doc_id, unnest(toks) AS term,
        |     unnest(range(len(toks))) AS pos FROM t),
        | cf AS (SELECT term, count(*) AS ctf FROM p GROUP BY 1),
        | vocab AS (SELECT term,
        |     CAST(row_number() OVER (ORDER BY ctf DESC, term) - 1
        |       AS INTEGER) AS vid
        |   FROM cf ORDER BY ctf DESC, term LIMIT 20),
        | e AS (SELECT p.doc_id, p.pos, coalesce(v.vid, -1) AS vid
        |   FROM p LEFT JOIN vocab v USING (term))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  array_to_string(list(CAST(vid AS VARCHAR) ORDER BY pos), '>')
        |    AS ids
        | FROM e GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q100_epoch_plan" ->
      s"""WITH tgt(lang, target_share) AS (VALUES
        |   ('en', CAST(0.4 AS DOUBLE)), ('zh', CAST(0.25 AS DOUBLE)),
        |   ('de', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE)),
        |   ('ja', CAST(0.05 AS DOUBLE))),
        | s AS (SELECT lang,
        |   CASE WHEN len(trim(coalesce(text, ''))) = 0 THEN 0
        |     ELSE len($toksSql) END AS nt
        |  FROM documents),
        | g AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS n_tokens
        |  FROM s GROUP BY lang),
        | j AS (SELECT coalesce(g.lang, tgt.lang) AS lang,
        |   coalesce(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
        |   coalesce(target_share, CAST(0 AS DOUBLE)) AS target_share,
        |   CAST(floor(coalesce(target_share, CAST(0 AS DOUBLE))
        |     * CAST(100000 AS DOUBLE)) AS BIGINT) AS wanted,
        |   CAST(floor(CAST(2.0 AS DOUBLE)
        |     * CAST(coalesce(n_tokens, CAST(0 AS BIGINT)) AS DOUBLE))
        |     AS BIGINT) AS cap
        |  FROM g FULL JOIN tgt ON g.lang = tgt.lang)
        |SELECT lang, n_tokens, target_share,
        |  wanted AS wanted_tokens,
        |  CASE WHEN n_tokens > 0 THEN
        |    round(CAST(wanted AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
        |  END AS epochs,
        |  least(wanted, cap) AS realized_tokens,
        |  greatest(CAST(0 AS BIGINT), wanted - cap) AS deficit_tokens
        | FROM j ORDER BY lang NULLS FIRST""".stripMargin,
    "q96_target_mix" ->
      s"""WITH tgt(lang, target) AS (VALUES
        |   ('en', CAST(0.4 AS DOUBLE)), ('zh', CAST(0.2 AS DOUBLE)),
        |   ('de', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE)),
        |   ('es', CAST(0.1 AS DOUBLE))),
        | c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        | ct AS (SELECT c.lang, cnt, target FROM c JOIN tgt USING (lang)),
        | n AS (SELECT sum(cnt) AS n FROM ct),
        | r AS (SELECT lang, least(CAST(1.0 AS DOUBLE),
        |     CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE) * target
        |       / CAST(cnt AS DOUBLE)) AS rate
        |   FROM ct CROSS JOIN n)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        | WHERE $hashFracSql < r.rate
        | ORDER BY d.doc_id NULLS FIRST""".stripMargin,
    "q87_semantic_dedup" -> {
      val pairCos =
        "list_sum(list_transform(range(len(a.v)), i -> a.v[i+1]*b.v[i+1]))" +
          " / (sqrt(list_sum(list_transform(a.v, x->x*x)))" +
          " * sqrt(list_sum(list_transform(b.v, x->x*x))))"
      s"""WITH RECURSIVE ${kmeansCtes(SemK, SemIters)},
        | p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |   FROM af a JOIN af b
        |     ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |   WHERE $pairCos >= CAST($SemThreshold AS DOUBLE)),
        | edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |   UNION ALL SELECT id_b, id_a FROM p),
        | nodes AS (SELECT DISTINCT src AS id FROM edges),
        | reach AS (
        |   SELECT id, id AS r FROM nodes
        |   UNION
        |   SELECT reach.id, g.dst FROM reach JOIN edges g ON reach.r = g.src),
        | comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
        |SELECT af.vec_id, CAST(af.cluster AS INTEGER) AS cluster,
        |  CAST(coalesce(comp.root, af.vec_id) AS BIGINT) AS root,
        |  coalesce(comp.root, af.vec_id) = af.vec_id AS keep
        | FROM af LEFT JOIN comp ON comp.id = af.vec_id
        | ORDER BY af.vec_id""".stripMargin
    },
  )
}
