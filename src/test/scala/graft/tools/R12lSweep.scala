package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{CorpusStats, Funnel}
import graft.sources.Tables

/** Scale sweep for the wave-18 operators: q175 stationary
  * distribution (matrix build = one lag window; the eight iterations
  * run on |types|-sized frames regardless of volume), q176 entropy
  * profile and q177 quantile map (one/two aggregates over raw rows,
  * level-cardinality frames after).
  *
  * Run: sbt "Test/runMain graft.tools.R12lSweep [K...]" (default 1 4 16)
  */
object R12lSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars"))

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
        s"/tmp/graftsweep/r12l_events_k$k")
      val dc = replicate(docs, Map.empty, k, s"/tmp/graftsweep/r12l_docs_k$k")
      val n = ev.count(); val nd = dc.count()
      val t175 = timed(noop(Funnel.stationaryDistribution(
        ev, col("user_id"), col("ts"), col("event_id"), col("event_type"),
        iterations = 8)))
      val t176 = timed(noop(CorpusStats.entropyProfile(
        dc, col("lang"), col("source"), col("n_chars"))))
      val t177 = timed(noop(CorpusStats.quantileMap(
        dc, col("source"), col("n_chars"))))
      println(f"K=$k%-3d events=$n%-8d docs=$nd%-7d q175=$t175%.2fs " +
        f"q176=$t176%.2fs q177=$t177%.2fs")
    }
    spark.stop()
  }
}
