package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{CorpusStats, Funnel}
import graft.sources.Tables

/** Scale sweep for the wave-14 operators: q164 PSI drift (two scans of
  * raw rows — min/max then bucketing — and grid math on |units|·B
  * rows), q165 conversion-lag cohorts (two user-keyed min-aggregates +
  * a |users|-row join; users scale with volume here via shifted ids),
  * q166 fan-out profile (one key aggregate + a key-level percentile
  * summary; keys scale with volume via shifted ids).
  *
  * Run: sbt "Test/runMain graft.tools.R12hSweep [K...]" (default 1 4 16)
  */
object R12hSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"))
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))

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
      val dc = replicate(docs, Map.empty, k, s"/tmp/graftsweep/r12h_docs_k$k")
      val ev = replicate(events, Map("user_id" -> 1000000L), k,
        s"/tmp/graftsweep/r12h_events_k$k")
      val child = replicate(li, Map("l_orderkey" -> 1000000000L), k,
        s"/tmp/graftsweep/r12h_li_k$k")
      val n = ev.count(); val nd = dc.count(); val nl = child.count()
      val t164 = timed(noop(CorpusStats.psiDrift(
        dc, col("source"), col("n_chars"))))
      val t165 = timed(noop(Funnel.conversionLag(
        ev, col("user_id"), col("ts"), col("event_type"),
        "click", "purchase")))
      val t166 = timed(noop(CorpusStats.fanoutProfile(Seq(
        ("li->orders", child, col("l_orderkey"))))))
      println(f"K=$k%-3d events=$n%-8d docs=$nd%-7d li=$nl%-8d " +
        f"q164=$t164%.2fs q165=$t165%.2fs q166=$t166%.2fs")
    }
    spark.stop()
  }
}
