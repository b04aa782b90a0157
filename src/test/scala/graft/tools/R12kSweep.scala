package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{CorpusStats, Funnel}
import graft.sources.Tables

/** Scale sweep for the wave-17 operators: q172 KS (per-value counts
  * with map-side partials; the window runs over the DISTINCT value
  * domain, bounded regardless of rows), q173 transition dwell (one
  * user lag window — the q49 shape — plus a |types|² aggregate),
  * q174 LTV curve (anchor aggregate + conversion join on one user
  * hashing + a ≤ maxDays-row window).
  *
  * Run: sbt "Test/runMain graft.tools.R12kSweep [K...]" (default 1 4 16)
  */
object R12kSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        col("event_id"))

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
      val dc = replicate(docs, Map("doc_id" -> 1000000L), k,
        s"/tmp/graftsweep/r12k_docs_k$k")
      val ev = replicate(events,
        Map("user_id" -> 1000000L, "event_id" -> 100000000L), k,
        s"/tmp/graftsweep/r12k_events_k$k")
      val n = ev.count(); val nd = dc.count()
      val t172 = timed(noop(CorpusStats.ksTwoSample(
        dc, col("lang"), col("n_chars"),
        ((col("doc_id") % 2) + 2) % 2 === 0)))
      val t173 = timed(noop(Funnel.transitionDwell(
        ev, col("user_id"), col("ts"), col("event_type"), col("event_id"))))
      val t174 = timed(noop(Funnel.ltvCurve(
        ev, col("user_id"), col("ts"), col("event_type"), col("value"),
        "purchase", maxDays = 30)))
      println(f"K=$k%-3d events=$n%-8d docs=$nd%-7d q172=$t172%.2fs " +
        f"q173=$t173%.2fs q174=$t174%.2fs")
    }
    spark.stop()
  }
}
