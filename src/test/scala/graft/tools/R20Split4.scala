package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Round-20 splitter for the corpus-index lifecycle (q189/q190/q194)
  * and the curation chain (q120/q129): which stage owns the seconds? */
object R20Split4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r20split4] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val which = if (args.isEmpty) Set("q190", "q120") else args.toSet

    if (which("q190")) for (pass <- 1 to 2) {
      println(s"[r20split4] ---- q190 pass $pass ----")
      val landing = graft.sources.Ingest.documentsBySourceLanding(spark, sfDir)
      val shardSrc = Seq("src8", "src12")
      val docs = spark.read.parquet(landing)
      val built = timed("corpusIndex build (eager persists?)") {
        Dedup.corpusIndex(
          docs.filter(col("source") =!= "src0" &&
            !col("source").isInCollection(shardSrc)),
          col("doc_id"), col("text"))
      }
      timed("writeCorpusIndex") {
        Dedup.writeCorpusIndex(built, "graft_r20_q190_idx")
      }
      built.unpersist()
      timed("appendToCorpusIndex") {
        Dedup.appendToCorpusIndex(
          docs.filter(col("source").isInCollection(shardSrc)),
          col("doc_id"), col("text"), "graft_r20_q190_idx")
      }
      val fresh = spark.newSession()
      val loaded = timed("loadCorpusIndex") {
        Dedup.loadCorpusIndex(fresh, "graft_r20_q190_idx")
      }
      val shard = fresh.read.parquet(landing).filter(col("source") === "src0")
      timed("nearDupAgainstIndex probe noop") {
        noop(Dedup.nearDupAgainstIndex(
            shard, col("doc_id"), col("text"), loaded, threshold = 0.8)
          .orderBy(asc("new_id"), asc("corpus_id")))
      }
      spark.catalog.clearCache()
    }

    if (which("q120")) for (pass <- 1 to 2) {
      println(s"[r20split4] ---- q120/q129 pass $pass ----")
      // Reproduce curationStages stage by stage.
      val docs = Tables.documents(spark, sfDir)
      val p = graft.expressions.TextProfile.profile(col("text"))
      val filtered = timed("filtered pin (TextProfile over corpus)") {
        graft.operators.Materialize.pin(
          Dedup.spread(docs).filter(col("source") =!= "src0")
            .withColumn("__p", p)
            .filter(col("__p.quality") >= 3 && col("__p.lang") === "en")
            .select(col("doc_id"), col("lang"), col("text"),
              col("__p.n_tokens").cast("long").as("n_tok")))
      }
      val deduped = timed("dedupCorpus construct (pairs+clusters)") {
        Dedup.dedupCorpus(filtered, col("doc_id"), col("text"),
          n = 3, threshold = 0.8, keepBy = Some(length(col("text"))))
      }
      timed("deduped noop") { noop(deduped) }
      val dirty = Dedup.crossCorpusOverlap(deduped, col("doc_id"),
          col("text"), docs.filter(col("source") === "src0"), col("text"),
          n = 3)
        .filter(col("overlap") >= 0.8)
        .select(col("id").as("__dirty_id"))
      val clean = deduped.join(
        dirty, col("doc_id") === col("__dirty_id"), "left_anti")
      timed("clean noop (adds decontam join)") { noop(clean) }
      val mixed = graft.operators.Split.matchTargetMix(clean, col("lang"),
        col("doc_id"),
        Seq("en" -> 0.4, "zh" -> 0.2, "de" -> 0.2, "fr" -> 0.1, "es" -> 0.1),
        budgetFrac = 0.5)
      timed("mixed noop (adds mix)") { noop(mixed) }
      val packed = graft.operators.ScalableWindow.runningTotal(
          mixed.select(col("doc_id"), col("lang"), col("n_tok")),
          col("doc_id"), col("n_tok"), "cum",
          partitions = spark.sparkContext.defaultParallelism)
        .withColumn("pack",
          floor((col("cum") - col("n_tok")) / 2048).cast("long"))
      timed("q120 tail noop (runningTotal+shards)") {
        noop(graft.operators.Split.assignShards(packed, col("doc_id"),
            nShards = 8)
          .select(col("doc_id"), col("lang"), col("n_tok"), col("pack"),
            col("shard"))
          .orderBy(asc_nulls_first("doc_id")))
      }
      // q129's funnel: six aggregates over the same frames.
      val tok = graft.functions.TextFunctions
        .tokenCount(coalesce(col("text"), lit(""))).cast("long")
      def agg(df: DataFrame, stage: Int, name: String, t: org.apache.spark.sql.Column): DataFrame =
        df.agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"),
            coalesce(sum(t), lit(0L)).as("n_tokens"))
          .select(lit(stage).as("stage"), lit(name).as("name"),
            col("n_docs"), col("n_tokens"))
      timed("q129 funnel noop (6 stage aggregates)") {
        noop(agg(docs, 0, "corpus", tok)
          .unionAll(agg(docs.filter(col("source") =!= "src0"),
            1, "held_out_removed", tok))
          .unionAll(agg(filtered, 2, "quality_filter", col("n_tok")))
          .unionAll(agg(deduped, 3, "near_dup", col("n_tok")))
          .unionAll(agg(clean, 4, "decontam", col("n_tok")))
          .unionAll(agg(mixed, 5, "target_mix", col("n_tok")))
          .orderBy(asc("stage")))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
