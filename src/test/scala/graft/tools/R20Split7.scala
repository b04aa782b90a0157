package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Split}
import graft.sources.Tables

/** Round-20 same-JVM A/B: does pinning `clean` help or hurt the q120 /
  * q129 shapes? Alternating construct+noop passes so drift cancels. */
object R20Split7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val target = Seq(
      "en" -> 0.4, "zh" -> 0.2, "de" -> 0.2, "fr" -> 0.1, "es" -> 0.1)

    def stages(pinClean: Boolean) = {
      val docs = Tables.documents(spark, sfDir)
      val p = graft.expressions.TextProfile.profile(col("text"))
      val filtered = graft.operators.Materialize.pin(
        Dedup.spread(docs).filter(col("source") =!= "src0")
          .withColumn("__p", p)
          .filter(col("__p.quality") >= 3 && col("__p.lang") === "en")
          .select(col("doc_id"), col("lang"), col("text"),
            col("__p.n_tokens").cast("long").as("n_tok")))
      val deduped = Dedup.dedupCorpus(filtered, col("doc_id"), col("text"),
        n = 3, threshold = 0.8, keepBy = Some(length(col("text"))))
      val dirty = Dedup.crossCorpusOverlap(deduped, col("doc_id"),
          col("text"), docs.filter(col("source") === "src0"), col("text"),
          n = 3)
        .filter(col("overlap") >= 0.8)
        .select(col("id").as("__dirty_id"))
      val clean0 = deduped.join(
        dirty, col("doc_id") === col("__dirty_id"), "left_anti")
      val clean =
        if (pinClean) graft.operators.Materialize.pin(clean0) else clean0
      val mixed = Split.matchTargetMix(clean, col("lang"), col("doc_id"),
        target, budgetFrac = 0.5)
      (docs, filtered, deduped, clean, mixed)
    }

    def q120(pinClean: Boolean): Unit = {
      val (_, _, _, _, mixed) = stages(pinClean)
      val packed = graft.operators.ScalableWindow.runningTotal(
          mixed.select(col("doc_id"), col("lang"), col("n_tok")),
          col("doc_id"), col("n_tok"), "cum",
          partitions = spark.sparkContext.defaultParallelism)
        .withColumn("pack",
          floor((col("cum") - col("n_tok")) / 2048).cast("long"))
      noop(Split.assignShards(packed, col("doc_id"), nShards = 8)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("pack"),
          col("shard"))
        .orderBy(asc_nulls_first("doc_id")))
    }
    def q129(pinClean: Boolean): Unit = {
      val (docs, filtered, deduped, clean, mixed) = stages(pinClean)
      val tok = graft.functions.TextFunctions
        .tokenCount(coalesce(col("text"), lit(""))).cast("long")
      def agg(df: DataFrame, stage: Int, name: String,
          tc: org.apache.spark.sql.Column): DataFrame =
        df.agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"),
            coalesce(sum(tc), lit(0L)).as("n_tokens"))
          .select(lit(stage).as("stage"), lit(name).as("name"),
            col("n_docs"), col("n_tokens"))
      noop(agg(docs, 0, "corpus", tok)
        .unionAll(agg(docs.filter(col("source") =!= "src0"),
          1, "held_out_removed", tok))
        .unionAll(agg(filtered, 2, "quality_filter", col("n_tok")))
        .unionAll(agg(deduped, 3, "near_dup", col("n_tok")))
        .unionAll(agg(clean, 4, "decontam", col("n_tok")))
        .unionAll(agg(mixed, 5, "target_mix", col("n_tok")))
        .orderBy(asc("stage")))
    }

    q120(false); q120(true); q129(false); q129(true) // warm both
    var a120 = List.empty[Double]; var b120 = List.empty[Double]
    var a129 = List.empty[Double]; var b129 = List.empty[Double]
    for (_ <- 1 to 3) {
      spark.catalog.clearCache(); a120 :+= t(q120(false))
      spark.catalog.clearCache(); b120 :+= t(q120(true))
      spark.catalog.clearCache(); a129 :+= t(q129(false))
      spark.catalog.clearCache(); b129 :+= t(q129(true))
    }
    def fmt(xs: List[Double]) =
      xs.map(x => f"$x%.3f").mkString(" ") + f" min=${xs.min}%.3f"
    println(s"[r20split7] q120 unpinned: ${fmt(a120)}")
    println(s"[r20split7] q120 pinned:   ${fmt(b120)}")
    println(s"[r20split7] q129 unpinned: ${fmt(a129)}")
    println(s"[r20split7] q129 pinned:   ${fmt(b129)}")
    spark.stop()
  }
}
