package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{CorpusStats, Funnel}
import graft.sources.Tables

/** Scale sweep for the wave-15 operators: q167 chi-square (one raw
  * aggregate; every later frame is level-cardinality), q168 Neyman
  * allocation (one raw aggregate + 1-row broadcast), q169 peak
  * concurrency (sessionize window + session boundaries through the
  * two-phase global cumsum — the one operator here whose post-
  * aggregate stage grows, linearly in SESSION count).
  *
  * Documents replicate with fixed langs/sources (the level frames
  * stay constant); events replicate with shifted user ids (sessions
  * scale with volume — the honest test for the global cumsum).
  *
  * Run: sbt "Test/runMain graft.tools.R12iSweep [K...]" (default 1 4 16)
  */
object R12iSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars"))
    val events = Tables.events(spark, sf).select(col("user_id"), col("ts"))

    def replicate(df: DataFrame, shifts: Map[String, Long], k: Int,
        path: String): DataFrame = {
      val out = (0 until k).map { r =>
        shifts.foldLeft(df) { case (d, (c, step)) =>
          d.withColumn(c, col(c) + lit(r * step)) }
      }.reduce(_ unionByName _)
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
      val dc = replicate(docs, Map.empty, k, s"/tmp/graftsweep/r12i_docs_k$k")
      val ev = replicate(events, Map("user_id" -> 1000000L), k,
        s"/tmp/graftsweep/r12i_events_k$k")
      val n = ev.count(); val nd = dc.count()
      val t167 = timed(noop(CorpusStats.chiSquareIndependence(
        dc, col("lang"), col("source"))))
      val t168 = timed(noop(CorpusStats.neymanAllocation(
        dc, col("lang"), col("n_chars"), budget = 1000L)))
      val t169 = timed(noop(Funnel.peakConcurrency(
        ev, col("user_id"), col("ts"), 30L * 60L * 1000000L)))
      println(f"K=$k%-3d events=$n%-8d docs=$nd%-7d q167=$t167%.2fs " +
        f"q168=$t168%.2fs q169=$t169%.2fs")
    }
    spark.stop()
  }
}
