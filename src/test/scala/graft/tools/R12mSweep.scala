package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Funnel
import graft.sources.Tables

/** Scale sweep for the wave-19 operators — all one-or-two-aggregate
  * shapes over events (user-keyed with map-side partials; report
  * frames bounded by \|pcts\|, segment cardinality, or the bucket
  * axis). Events replicate with shifted user ids.
  *
  * Run: sbt "Test/runMain graft.tools.R12mSweep [K...]" (default 1 4 16)
  */
object R12mSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))

    def replicate(k: Int): DataFrame = {
      val path = s"/tmp/graftsweep/r12m_events_k$k"
      (0 until k).map { r =>
        events.withColumn("user_id", col("user_id") + lit(r * 1000000L))
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
      val t178 = timed(noop(Funnel.revenueConcentration(
        ev, col("user_id"), col("value"), col("event_type"), "purchase")))
      val t179 = timed(noop(Funnel.segmentedFunnel(
        ev, col("user_id"), col("ts"), col("event_type"),
        "view", "purchase", t1 => hour(t1))))
      val t180 = timed(noop(Funnel.userDiversityHistogram(
        ev, col("user_id"), col("event_type"))))
      println(f"K=$k%-3d events=$n%-8d q178=$t178%.2fs " +
        f"q179=$t179%.2fs q180=$t180%.2fs")
    }
    spark.stop()
  }
}
