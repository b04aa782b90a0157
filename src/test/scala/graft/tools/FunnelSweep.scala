package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Funnel
import graft.sources.Tables

/** Scale sweep for the event-sequence family (q101 funnel / q102
  * retention / q104 windowed funnel).
  *
  * Scale contract: every exchange hashes on the user — step frames and
  * cohort frames are ≤ |users| rows, the raw event table is never
  * shuffled (cohorts broadcast back; step joins stream the filtered
  * event scan past a user-keyed frame). Time should grow ~linearly in
  * the event volume with a fixed job floor.
  *
  * Corpus: sf0.1 events replicated K× with user ids shifted per
  * replica, so user count and event volume both scale K× with the
  * per-user event profile unchanged (funnel rates per user identical
  * in every replica — the honest replication for user-keyed
  * operators). Written to parquet; warmup + min-of-2, noop sink.
  *
  * Run: sbt "Test/runMain graft.tools.FunnelSweep [K...]"  (default 1 4 16)
  */
object FunnelSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    val base = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), col("ts"), col("event_type"))

    def replicate(k: Int): String = {
      val dir = s"/tmp/graftsweep/events_k$k"
      (0 until k).map { r =>
        base.select((col("user_id") + lit(r * 1000000L)).as("user_id"),
          col("ts"), col("event_type"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
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

    println("| K | events | funnel s | windowed s | retention s |")
    println("|---|---|---|---|---|")
    for (k <- ks) {
      val dir = replicate(k)
      val ev = spark.read.parquet(s"$dir/events.parquet")
      val n = ev.count()
      val steps = Seq("view", "click", "purchase")
      val tF = timed(noop(Funnel.conversionFunnel(
        ev, col("user_id"), col("ts"), col("event_type"), steps)))
      val tW = timed(noop(Funnel.conversionFunnel(
        ev, col("user_id"), col("ts"), col("event_type"), steps,
        maxGapMicros = Some(24L * 3600L * 1000000L))))
      val tR = timed(noop(Funnel.retentionCohorts(
        ev, col("user_id"), col("ts"))))
      println(f"| $k | $n | $tF%.2f | $tW%.2f | $tR%.2f |")
    }
    spark.stop()
  }
}
