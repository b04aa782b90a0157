package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.operators.Ranking
import graft.sources.Tables

/** A/B timing for trainHashedLogReg's loop layout (round-13 q182
  * constant): shuffling (per-iteration doc-keyed z groupBy + gradient
  * join on __id — the round-12 shape) vs per-doc arrays (one cached
  * (bucket, tf)-pairs row per doc; z as an aggregate HOF, gradient as
  * explode into a 64-key aggregate). Warmup, then min of two passes.
  * Run: sbt "Test/runMain graft.tools.TrainLrProbe [sfDir]" */
object TrainLrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    val nBuckets = 64

    // The round-12 loop shape, verbatim.
    def shuffling(): DataFrame = {
      val feats = docs
        .select(col("doc_id").as("__id"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("term"))
        .groupBy(col("__id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("__b",
          pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
            lit(nBuckets.toLong)))
        .groupBy(col("__id"), col("__b"))
        .agg(sum(col("tf")).cast("long").as("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val labels = docs.select(col("doc_id").as("__id"),
        when(coalesce(col("lang") === "en", lit(false)), lit(1.0d))
          .otherwise(lit(0.0d)).as("__y"))
      val n = feats.select(col("__id")).distinct().count()
      val w = Array.fill(nBuckets)(0.0d)
      def round6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (1 to 3).foreach { _ =>
        val wLit = typedLit(w.toSeq)
        val z = feats.groupBy(col("__id"))
          .agg(round(sum(col("tf").cast("decimal(20,0)") *
            element_at(wLit, (col("__b") + 1).cast("int"))
              .cast("decimal(12,6)")).cast("double"), 6).as("__z"))
        val p = z.join(labels, Seq("__id"))
          .select(col("__id"), col("__y"),
            round(lit(1.0d) / (lit(1.0d) + exp(-col("__z"))), 6).as("__p"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val gradRows = feats.join(p, Seq("__id"))
          .groupBy(col("__b"))
          .agg(round(sum(col("tf").cast("decimal(20,0)") *
            (col("__p").cast("decimal(12,6)") -
              col("__y").cast("decimal(12,6)"))).cast("double") /
            lit(n.toDouble), 5).as("__g"))
          .collect()
        val pc = least(greatest(col("__p"), lit(1e-9d)),
          lit(1.0d - 1e-9d))
        p.agg((-avg(col("__y") * log(pc) +
          (lit(1.0d) - col("__y")) * log(lit(1.0d) - pc))).as("loss"))
          .collect()
        p.unpersist(false)
        gradRows.foreach { r =>
          val b = r.getLong(0).toInt
          w(b) = round6(w(b) - 0.5 * r.getDouble(1))
        }
      }
      feats.unpersist(false)
      spark.range(nBuckets.toLong).select(
        col("id").cast("int").as("bucket"),
        element_at(typedLit(w.toSeq), (col("id") + 1).cast("int")).as("w"))
        .orderBy(asc("bucket"))
    }
    def arrays(): DataFrame =
      Ranking.trainHashedLogReg(docs, col("doc_id"), col("text"),
        col("lang") === "en", nBuckets = nBuckets, iters = 3, lr = 0.5)._1

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(mk: () => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); run(mk())
      (System.nanoTime() - t0) / 1e9
    }
    run(shuffling()); run(arrays()) // warm both shapes
    val sh = math.min(timed(() => shuffling()), timed(() => shuffling()))
    val ar = math.min(timed(() => arrays()), timed(() => arrays()))
    println(f"== trainHashedLogReg shuffling ${sh}%.3f s")
    println(f"== trainHashedLogReg arrays    ${ar}%.3f s")
    val a = arrays().collect().map(r => (r.getInt(0), r.getDouble(1)))
    val b = shuffling().collect().map(r => (r.getInt(0), r.getDouble(1)))
    println(s"== weights identical: ${a.sameElements(b)}")
    spark.stop()
  }
}
