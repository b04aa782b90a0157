package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Funnel
import graft.sources.Tables

/** Scale sweep for the wave-16 operators: q170 A/B z-test (two
  * type-filtered user-keyed aggregates + 1-row crosses) and q171
  * entry/exit matrix (sessionize window + min_by/max_by session
  * reduce — work scales with session count, output with |types|²).
  * Events replicate with shifted user ids (users/sessions scale with
  * volume). Warmup + min-of-2 cold passes, noop sink.
  *
  * Run: sbt "Test/runMain graft.tools.R12jSweep [K...]" (default 1 4 16)
  */
object R12jSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))

    def replicate(k: Int): DataFrame = {
      val path = s"/tmp/graftsweep/r12j_events_k$k"
      (0 until k).map { r =>
        events.withColumn("user_id", col("user_id") + lit(r * 1000000L))
          .withColumn("event_id", col("event_id") + lit(r * 100000000L))
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

    val cohort =
      when(((col("user_id") % 2) + 2) % 2 === 0, "A").otherwise("B")
    ks.foreach { k =>
      val ev = replicate(k)
      val n = ev.count()
      val t170 = timed(noop(Funnel.abTestProportions(
        ev, col("user_id"), col("ts"), col("event_type"), cohort,
        "A", "B", "view", "purchase")))
      val t171 = timed(noop(Funnel.entryExitMatrix(
        ev, col("user_id"), col("ts"), col("event_type"), col("event_id"),
        30L * 60L * 1000000L)))
      println(f"K=$k%-3d events=$n%-8d q170=$t170%.2fs q171=$t171%.2fs")
    }
    spark.stop()
  }
}
