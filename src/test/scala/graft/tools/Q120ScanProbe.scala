package graft.tools

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Materialize, ScalableWindow, Split}
import graft.sources.Tables

/** Per-stage filesystem-read metering behind CurationPipelineSpec's
  * two-scan bound: prints the bytes each q120 stage adds, so a
  * redundant-scan regression names its stage.
  * Run: sbt "Test/runMain graft.tools.Q120ScanProbe [sfDir]" */
object Q120ScanProbe {
  private def bytes(): Long =
    Option(FileSystem.getGlobalStorageStatistics.get("file"))
      .flatMap(s => Option(s.getLong("bytesRead")))
      .fold(0L)(_.longValue())

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    docs.count()
    var last = bytes()
    def mark(name: String): Unit = {
      val b = bytes()
      println(f"== $name%-22s +${b - last}%8d bytes")
      last = b
    }
    val p = graft.expressions.TextProfile.profile(col("text"))
    val filtered = Materialize.pin(
      Dedup.spread(docs).filter(col("source") =!= "src0")
        .withColumn("__p", p)
        .filter(col("__p.quality") >= 3 && col("__p.lang") === "en")
        .select(col("doc_id"), col("lang"), col("text"),
          col("__p.n_tokens").cast("long").as("n_tok")))
    mark("filtered pin")
    val deduped = Dedup.dedupCorpus(filtered, col("doc_id"), col("text"),
      n = 3, threshold = 0.8, keepBy = Some(length(col("text"))))
    mark("dedup (lazy)")
    val dirty = Dedup.crossCorpusOverlap(deduped, col("doc_id"),
        col("text"), docs.filter(col("source") === "src0"), col("text"),
        n = 3)
      .filter(col("overlap") >= 0.8)
      .select(col("id").as("__dirty_id"))
    mark("decontam (lazy)")
    val clean = deduped.join(
      dirty, col("doc_id") === col("__dirty_id"), "left_anti")
    mark("clean (lazy)")
    val mixed = Split.matchTargetMix(clean, col("lang"), col("doc_id"),
      Seq("en" -> 0.4, "zh" -> 0.2, "de" -> 0.2, "fr" -> 0.1,
        "es" -> 0.1), budgetFrac = 0.5)
    mark("mix (lazy)")
    val packed = ScalableWindow.runningTotal(
        mixed.select(col("doc_id"), col("lang"), col("n_tok")),
        col("doc_id"), col("n_tok"), "cum",
        partitions = spark.sparkContext.defaultParallelism)
      .withColumn("pack",
        floor((col("cum") - col("n_tok")) / 2048).cast("long"))
    mark("pack (runningTotal)")
    val out = Split.assignShards(packed, col("doc_id"), nShards = 8)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("pack"),
        col("shard"))
      .orderBy(asc_nulls_first("doc_id"))
      .collect()
    mark("final collect")
    println(s"rows=${out.length}")
    spark.stop()
  }
}
