package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.CorpusStats
import graft.sources.Tables

/** Scale sweep for q93's snapshot diff (`CorpusStats.snapshotDiff`).
  *
  * The operator's scale contract: both sides project to (id, md5)
  * before the single full-outer hash join, so the shuffle carries
  * 32-char hashes regardless of document size and the output is
  * bounded by the churn. Time should therefore grow ~linearly in the
  * corpus (the hash projection is the only full-data pass) with a
  * churn-proportional output term.
  *
  * Corpus: sf0.1 documents replicated K× with shifted ids; the "new"
  * snapshot applies the q93 churn pattern (delete %3, revise %5,
  * re-ingest the %97 slice under shifted ids) inside every replica, so
  * the churn volume grows exactly linearly with K. Both snapshots are
  * written to parquet so every timed run reads from disk like the
  * bench; warmup + min-of-2, noop sink.
  *
  * Run: sbt "Test/runMain graft.tools.Q93Sweep [K...]"  (default 1 4 16)
  */
object Q93Sweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))

    def replicate(k: Int): String = {
      val dir = s"/tmp/graftsweep/docs_diff_k$k"
      val old = (0 until k).map { r =>
        base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
      // churn pattern applied per replica via the LOCAL id (mod keeps
      // the same per-replica selection the q93 fixture uses)
      val churned = old
        .withColumn("__local", col("doc_id") % 10000000L)
        .filter(col("__local") % 3 =!= 0)
        .select(col("doc_id"),
          when(col("__local") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
      val reingested = old
        .withColumn("__local", col("doc_id") % 10000000L)
        .filter(col("__local") % 97 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      old.write.mode(SaveMode.Overwrite).parquet(s"$dir/old.parquet")
      churned.unionByName(reingested)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/new.parquet")
      dir
    }

    def timed(f: => Unit): Double = {
      f // warmup
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println("| K | docs | snapshotDiff s | churn rows |")
    println("|---|---|---|---|")
    for (k <- ks) {
      val dir = replicate(k)
      val oldS = spark.read.parquet(s"$dir/old.parquet")
      val newS = spark.read.parquet(s"$dir/new.parquet")
      val n = oldS.count()
      def diff() = CorpusStats.snapshotDiff(
        oldS, newS, col("doc_id"), col("text"))
      val t = timed(noop(diff()))
      val churn = diff().count()
      println(f"| $k | $n | $t%.2f | $churn |")
    }
    spark.stop()
  }
}
