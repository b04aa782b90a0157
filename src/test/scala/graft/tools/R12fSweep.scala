package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{CorpusStats, Funnel}
import graft.sources.Tables

/** Scale sweep for the wave-12 operators: q158 referential-integrity
  * audit (child collapses to its key profile before the membership
  * join — the shuffle carries key cardinality, not child rows), q159
  * change-interval compression (max_by hash aggregate + one shared
  * key window over the daily frame), q160 truncated-EWMA screen (its
  * join input is the |keys|·|days| daily frame — like q155, expected
  * FLAT apart from the daily-aggregate scan).
  *
  * Replication: q159 shifts user ids per replica (users and volume
  * scale together, per-user day series unchanged); q160 keeps the
  * type key fixed so the calendar bound is what's measured; q158
  * shifts both child and parent keys per replica, so key cardinality
  * and row count scale together and the audit stays orphan-free.
  * Warmup + min-of-2 cold passes, noop sink.
  *
  * Run: sbt "Test/runMain graft.tools.R12fSweep [K...]" (default 1 4 16)
  */
object R12fSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        col("event_id"))
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"))

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
      val ev = replicate(events,
        Map("user_id" -> 1000000L, "event_id" -> 100000000L), k,
        s"/tmp/graftsweep/r12f_events_k$k")
      val child = replicate(li, Map("l_orderkey" -> 1000000000L), k,
        s"/tmp/graftsweep/r12f_li_k$k")
      val parent = replicate(ord, Map("o_orderkey" -> 1000000000L), k,
        s"/tmp/graftsweep/r12f_ord_k$k")
      val n = ev.count()
      val t158 = timed(noop(CorpusStats.referentialAudit(Seq(
        ("li->orders", child, col("l_orderkey"), parent, col("o_orderkey"))))))
      val t159 = timed(noop(Funnel.changeIntervals(
        ev, col("user_id"), col("ts"),
        floor(col("value") / 100.0d).cast("long"), col("event_id"))))
      val t160 = timed(noop(Funnel.ewmaScreen(
        ev, col("event_type"), col("ts"))))
      println(f"K=$k%-3d events=$n%-8d q158=$t158%.2fs " +
        f"q159=$t159%.2fs q160=$t160%.2fs")
    }
    spark.stop()
  }
}
