package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Round-15 stretch measurement: do the two converging report queries
  * (q90 n-gram novelty 2.3×, q181 domain governance 2.4× at sf0.1 —
  * both sub-1.1 s absolute) leave enough per-JOB overhead on the table
  * that ONE composed job emitting both reports lands under 2×?
  *
  * Method: both reports are JSON-packed to a common (report, row)
  * schema in BOTH arms — packing cost cancels — then timed as (a) two
  * separate noop-sink jobs, summed, and (b) one unioned noop-sink job.
  * Warm + min-of-2, graft.Bench's methodology.
  *
  * Run: sbt "Test/runMain graft.tools.Q90Q181Compose"
  */
object Q90Q181Compose {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"

    def packed(name: String): DataFrame = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.select(lit(name).as("report"),
        to_json(struct(df.columns.map(col).toSeq: _*)).as("row"))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      f
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val tSeparate = timed {
      noop(packed("q90_ngram_novelty")); noop(packed("q181_domain_governance"))
    }
    val tComposed = timed {
      noop(packed("q90_ngram_novelty")
        .unionByName(packed("q181_domain_governance")))
    }
    println(f"| two separate jobs (sum) | $tSeparate%.3f |")
    println(f"| one composed union job | $tComposed%.3f |")
    spark.stop()
  }
}
