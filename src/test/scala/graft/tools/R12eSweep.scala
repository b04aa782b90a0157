package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Funnel
import graft.sources.Tables

/** Scale sweep for the wave-11 event operators: q155 CUSUM drift
  * (key-partitioned windows over the daily-count frame — the window
  * input is |keys|·|days| rows, NOT event volume), q156 last-touch
  * attribution (the AsOf union-window: one shuffle on the user, one
  * in-partition sort), q157 session co-occurrence lift (sessionize
  * window + session-keyed self-join bounded by |types|² per session).
  *
  * [[FunnelSweep]]'s replication device: events replicated K× with
  * user ids shifted per replica — user count and event volume scale
  * together, per-user profiles unchanged (the honest replication for
  * user-keyed operators; q155's key frame stays |types|·|days| rows at
  * every K, so its time should be FLAT apart from the daily-count
  * aggregate's scan). Warmup + min-of-2 cold passes, noop sink.
  *
  * Run: sbt "Test/runMain graft.tools.R12eSweep [K...]" (default 1 4 16)
  */
object R12eSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))

    def replicate(k: Int): DataFrame = {
      val path = s"/tmp/graftsweep/r12e_events_k$k"
      (0 until k).map { r =>
        base.select((col("user_id") + lit(r * 1000000L)).as("user_id"),
          col("ts"), col("event_type"), col("value"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }

    def timed(f: => Unit): Double = {
      f
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    ks.foreach { k =>
      val ev = replicate(k)
      val n = ev.count()
      val t155 = timed(noop(Funnel.cusumDrift(
        ev, col("event_type"), col("ts"))))
      val t156 = timed(noop(Funnel.lastTouchAttribution(
        ev, col("user_id"), col("ts"), col("event_type"), col("value"),
        "click", "purchase", 24L * 3600L * 1000000L)))
      val t157 = timed(noop(Funnel.sessionCooccurrence(
        ev, col("user_id"), col("ts"), col("event_type"),
        30L * 60L * 1000000L, topN = 20)))
      println(f"K=$k%-3d events=$n%-8d q155=$t155%.2fs " +
        f"q156=$t156%.2fs q157=$t157%.2fs")
    }
    spark.stop()
  }
}
