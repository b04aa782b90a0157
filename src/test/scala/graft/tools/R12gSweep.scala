package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{CorpusStats, Funnel}
import graft.sources.Tables

/** Scale sweep for the wave-13 operators: q161 daily trend and q162
  * seasonal autocorrelation (both run their regression arithmetic on
  * the calendar-bounded |keys|·|days| daily frame — only the daily
  * count aggregate sees event volume, so both should be near-FLAT),
  * q163 source-concentration Gini (rank window and final aggregate on
  * the |langs|·|sources| mass frame — same story over documents).
  *
  * Replication keeps the key sets fixed (event types, langs, sources)
  * while multiplying volume — that isolates exactly the claim under
  * test: the statistics' cost is bounded by key cardinality and the
  * calendar, not by row count. Warmup + min-of-2 cold passes, noop
  * sink.
  *
  * Run: sbt "Test/runMain graft.tools.R12gSweep [K...]" (default 1 4 16)
  */
object R12gSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val events = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

    def replicate(df: DataFrame, k: Int, path: String): DataFrame = {
      val out = (0 until k).map(_ => df).reduce(_ unionByName _)
      out.write.mode(SaveMode.Overwrite).parquet(path)
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
      val ev = replicate(events, k, s"/tmp/graftsweep/r12g_events_k$k")
      val dc = replicate(docs, k, s"/tmp/graftsweep/r12g_docs_k$k")
      val n = ev.count(); val nd = dc.count()
      val t161 = timed(noop(Funnel.dailyTrend(
        ev, col("event_type"), col("ts"))))
      val t162 = timed(noop(Funnel.seasonalAutocorr(
        ev, col("event_type"), col("ts"), lagDays = 7)))
      val t163 = timed(noop(CorpusStats.sourceConcentration(
        dc, col("lang"), col("source"), col("n_chars"))))
      println(f"K=$k%-3d events=$n%-8d docs=$nd%-7d q161=$t161%.2fs " +
        f"q162=$t162%.2fs q163=$t163%.2fs")
    }
    spark.stop()
  }
}
