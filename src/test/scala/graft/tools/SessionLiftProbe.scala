package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Funnel, Materialize}
import graft.sources.Tables

/** A/B timing for sessionCooccurrence's session-type frame (round-13
  * q157 constant): pinned (one sessionize pass, localCheckpoint) vs
  * lazy (three consumers each re-run the events-sized sessionize
  * window, relying on exchange reuse where the planner finds it).
  * Bench methodology: warmup, then min of two passes each.
  * Run: sbt "Test/runMain graft.tools.SessionLiftProbe [sfDir]" */
object SessionLiftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.events(spark, dir)
    val gap = 30L * 60L * 1000000L

    // Lazy variant: the operator body as shipped before the pin.
    def lazyVariant(): DataFrame = {
      val st = Funnel.sessionize(events, col("user_id"), col("ts"), gap,
          seqCol = "__seq")
        .select(concat_ws("#", col("user_id"), col("__seq")).as("__skey"),
          col("event_type").as("t"))
        .distinct()
      val totals = st.agg(countDistinct(col("__skey")).as("s_total"))
      val perType = st.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
      val pairs = st.as("a")
        .join(st.as("b"),
          col("a.__skey") === col("b.__skey") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(perType.select(col("t").as("type_a"),
          col("n_t").as("n_a"))), Seq("type_a"))
        .join(broadcast(perType.select(col("t").as("type_b"),
          col("n_t").as("n_b"))), Seq("type_b"))
        .crossJoin(broadcast(totals))
        .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          round(col("n_ab").cast("double") * col("s_total").cast("double")
            / (col("n_a") * col("n_b")).cast("double"), 4).as("lift"))
        .orderBy(col("n_ab").desc, col("type_a").asc, col("type_b").asc)
        .limit(20)
    }
    def pinnedVariant(): DataFrame =
      Funnel.sessionCooccurrence(events, col("user_id"), col("ts"),
        col("event_type"), gapMicros = gap, topN = 20)

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(mk: () => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); run(mk())
      (System.nanoTime() - t0) / 1e9
    }
    run(lazyVariant()); run(pinnedVariant()) // warm both shapes
    val lz = math.min(timed(() => lazyVariant()), timed(() => lazyVariant()))
    val pn = math.min(timed(() => pinnedVariant()),
      timed(() => pinnedVariant()))
    println(f"== sessionCooccurrence lazy   ${lz}%.3f s")
    println(f"== sessionCooccurrence pinned ${pn}%.3f s")
    spark.stop()
  }
}
