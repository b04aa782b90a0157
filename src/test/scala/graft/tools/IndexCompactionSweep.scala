package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Nightly-append ACCRETION and the compaction knee (round-17: the
  * measured evidence behind `compactCorpusIndex`/`compactIvfIndex`):
  * the durable index is built on corpus-minus-shard, then the shard is
  * folded in as N nightly slices — one `insertInto`/partition-append
  * per slice, so every touched bucket/stripe gains one file per night
  * (exactly the accretion the append scaladocs declare) — and the
  * probe is timed against the accreted layout, then again after
  * compaction rewrites each bucket/stripe to one task's output.
  *
  * Columns per structure: data-file count and probe seconds
  * (warmup + min-of-2, noop sink, fresh reload per pass so the file
  * LISTING — where accretion hurts first — is paid inside the timing)
  * before/after compaction, plus the one-time compact cost. Probe
  * bit-equality across compaction is spec-gated in
  * `IndexLifecycleSpec`; this tool measures WHEN the rewrite pays.
  *
  * Run: sbt "Test/runMain graft.tools.IndexCompactionSweep [K] [slices]"
  */
object IndexCompactionSweep {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(1)
    val slices = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = GraftSession.local()
    val dir =
      if (k == 1) "/root/testdata/sf0.1" else s"/tmp/graft_scale/v1_k$k"
    val replicaShift = 10000000L

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = {
      f // warmup
      def once(): Double = { spark.catalog.clearCache(); timed(f) }
      math.min(once(), once())
    }
    def parquetFiles(root: java.io.File): Int =
      if (!root.exists()) 0
      else if (root.isFile) { if (root.getName.endsWith(".parquet")) 1 else 0 }
      else root.listFiles().map(parquetFiles).sum

    println(s"K=$k, $slices nightly append slices")
    println("| structure | files accreted | probe s accreted | compact s | files compacted | probe s compacted |")
    println("|---|---|---|---|---|---|")

    // ---- MinHash corpus index (bucketed tables) ----
    locally {
      val prefix = s"graft_cmpsw_k${k}_$slices"
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("source"))
      val inShard = col("source").isInCollection(Seq("src8", "src12")) &&
        col("doc_id") < replicaShift
      val corpus = docs.filter(!inShard && col("source") =!= "src0")
      val probe = docs.filter(col("source") === "src0" &&
        col("doc_id") < replicaShift)
      val built = Dedup.corpusIndex(corpus, col("doc_id"), col("text"))
      Dedup.writeCorpusIndex(built, prefix)
      built.unpersist()
      (0 until slices).foreach { i =>
        Dedup.appendToCorpusIndex(
          docs.filter(inShard && pmod(col("doc_id"), lit(slices)) === i),
          col("doc_id"), col("text"), prefix)
      }
      def tableDir(name: String) = new java.io.File(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(name)).getPath)
      def files(): Int =
        parquetFiles(tableDir(s"${prefix}_banded")) +
          parquetFiles(tableDir(s"${prefix}_rel"))
      def runProbe(): Unit = {
        val fresh = spark.newSession()
        Dedup.nearDupAgainstIndex(
            Tables.documents(fresh, dir).filter(col("source") === "src0" &&
              col("doc_id") < replicaShift),
            col("doc_id"), col("text"),
            Dedup.loadCorpusIndex(fresh, prefix), threshold = 0.8,
            persistNewRel = false)
          .write.format("noop").mode("overwrite").save()
      }
      val fA = files()
      val pA = minOf2(runProbe())
      val tC = timed(Dedup.compactCorpusIndex(spark, prefix))
      val fC = files()
      val pC = minOf2(runProbe())
      println(f"| corpus (MinHash, bucketed tables) | $fA | $pA%.2f | $tC%.2f | $fC | $pC%.2f |")
    }

    // ---- IVF index (list-partitioned stripes) ----
    locally {
      val path = s"/tmp/graft_cmpsw_ivf_k${k}_$slices"
      val emb = Tables.embeddings(spark, dir)
      val old = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) =!= 3)
      val shard = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) === 3)
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).collect().head.getSeq[Float](0).toArray
      val (centroids, indexed) = Similarity.ivfIndex(
        old, col("vec_id"), col("embedding"), nLists = 8)
      Similarity.writeIvfIndex(centroids, indexed, path)
      (0 until slices).foreach { i =>
        Similarity.appendToIvfIndex(
          shard.filter(pmod(col("vec_id"), lit(slices)) === i),
          col("vec_id"), col("embedding"), path)
      }
      def files(): Int = parquetFiles(new java.io.File(s"$path/lists"))
      def runProbe(spark0: SparkSession): Unit = {
        val (cents, lists) = Similarity.loadIvfIndex(spark0, path)
        Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 3)
          .write.format("noop").mode("overwrite").save()
      }
      val fA = files()
      val pA = minOf2(runProbe(spark.newSession()))
      val tC = timed(Similarity.compactIvfIndex(spark, path))
      val fC = files()
      val pC = minOf2(runProbe(spark.newSession()))
      println(f"| IVF (list-partitioned stripes) | $fA | $pA%.2f | $tC%.2f | $fC | $pC%.2f |")
    }
    spark.stop()
  }
}
