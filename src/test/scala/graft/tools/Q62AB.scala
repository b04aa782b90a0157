package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** In-JVM A/B for q62's repetition kernel (round-14: the two-sided
  * sweep showed q62 DIVERGING — Spark 7.8 s vs DuckDB 0.8 s at K=64,
  * both linear, constant factor ~9×). A: the shipped explode + two
  * hash-aggregation shape. B: a row-local sorted-run fold — sort each
  * doc's gram array, count the longest equal run in one `aggregate`
  * HOF; ZERO explode, ZERO aggregation, ZERO shuffle. Same exact
  * integers (no hashing at all in B — even the 2⁻⁶⁴ collision trade
  * disappears). Warm both, min-of-2 each, equality-checked on the
  * full sf0.1 corpus.
  *
  * Run: sbt "Test/runMain graft.tools.Q62AB"
  */
object Q62AB {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val toks = tokens(col("text"))
    val grams = when(size(toks) < 2, array(array_join(toks, " ")))
      .otherwise(TextFunctions.ngramStrings(toks, 2))

    // Both shapes get an EXPLICIT null-text filter so the A/B gate
    // compares the same population. Note the legacy shape A did NOT
    // drop null text on its own: size(null) = -1 takes the
    // `size(toks) < 2` branch and emits a [null] gram, i.e. a latent
    // (1,1) row per null doc — the filter aligns both shapes with the
    // oracle's unnest(NULL)-drops-rows semantics.
    def shapeA(): DataFrame =
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), explode(grams).as("g"))
        .groupBy(col("doc_id"), xxhash64(col("g")).as("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_grams"), max(col("c")).as("top_count"))
        .withColumn("rep_ratio",
          col("top_count").cast("double") / col("n_grams"))
        .orderBy(asc_nulls_first("doc_id"))

    def shapeB(): DataFrame = {
      val sorted = array_sort(grams)
      val top = aggregate(
        sorted,
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("best")),
        (acc, g) => {
          val run = when(acc.getField("prev") <=> g,
            acc.getField("run") + 1L).otherwise(lit(1L))
          struct(g.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(grams).cast("long").as("n_grams"), top.as("top_count"))
        .withColumn("rep_ratio",
          col("top_count").cast("double") / col("n_grams"))
        .orderBy(asc_nulls_first("doc_id"))
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

    val equal = shapeA().exceptAll(shapeB()).isEmpty &&
      shapeB().exceptAll(shapeA()).isEmpty
    println(s"equal results: $equal")
    val tA = timed(noop(shapeA()))
    val tB = timed(noop(shapeB()))
    println(f"| explode + 2 hash aggs (shipped) | $tA%.3f |")
    println(f"| sorted-run row-local fold | $tB%.3f |")
    spark.stop()
  }
}
