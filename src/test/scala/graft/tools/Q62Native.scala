package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.expressions.NgramRepPacked
import graft.functions.TextFunctions
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** q62 attempt 2 (round-15): native codegen kernel vs the shipped
  * explode + two hash aggregations. Round-14's `Q62AB` killed the
  * `aggregate` HOF fold (4.6× slower — struct-accumulator lambdas
  * don't codegen); this A/B tests the OTHER alternative class the
  * verdict named: a row-local open-addressed counting kernel in the
  * `TextProfile` mold ([[graft.expressions.NgramRepPacked]]), which
  * stays inside whole-stage codegen. Equality-gated (exceptAll both
  * ways), warm both, min-of-2 each, same JVM.
  *
  * Run: sbt "Test/runMain graft.tools.Q62Native [dir ...]"
  * (default dirs: sf0.1 + the K∈{16,64} replicated fixtures if present)
  */
object Q62Native {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale/v1_k16",
        "/tmp/graft_scale/v1_k64").filter(d =>
        new java.io.File(d + "/documents.parquet").exists())

    val toks = tokens(col("text"))
    val grams = when(size(toks) < 2, array(array_join(toks, " ")))
      .otherwise(TextFunctions.ngramStrings(toks, 2))

    def shipped(dir: String): DataFrame =
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

    def native(dir: String): DataFrame =
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
        .select(col("doc_id"), NgramRepPacked.packed(col("text")).as("__p"))
        .select(col("doc_id"),
          shiftright(col("__p"), 32).as("n_grams"),
          col("__p").bitwiseAND(lit(0xffffffffL)).as("top_count"))
        .withColumn("rep_ratio",
          col("top_count").cast("double") / col("n_grams"))
        .orderBy(asc_nulls_first("doc_id"))

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

    println("| dir | equal | shipped explode+2aggs (s) | native kernel (s) |")
    dirs.foreach { dir =>
      val equal = shipped(dir).exceptAll(native(dir)).isEmpty &&
        native(dir).exceptAll(shipped(dir)).isEmpty
      val tA = timed(noop(shipped(dir)))
      val tB = timed(noop(native(dir)))
      println(f"| $dir | $equal | $tA%.3f | $tB%.3f |")
    }
    spark.stop()
  }
}
