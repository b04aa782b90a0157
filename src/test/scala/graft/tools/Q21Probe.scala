package graft.tools

import graft.{GraftSession, SparkEntry}

/** Round-15 disposition probe for the q21 regression flag (r14 pair
  * 0.749 s → r15 pair 1.196 s, narrowed fresh-JVM 1.384 s): q21's code
  * is git-unchanged this round and the whole dedup family co-drifted
  * (q20 +67%, q24 +59%, q64 +32%, all untouched), so the hypothesis is
  * host-variance, not a plan change. This is the in-JVM warm probe the
  * closeout discipline trusts over 1-query narrowed batches (which are
  * startup-dominated): warm once, then FIVE timed cold-cache passes,
  * report all five + min.
  *
  * Run: sbt "Test/runMain graft.tools.Q21Probe [query]"
  */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q21_neardup_jaccard")
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    def run(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val passes = (1 to 5).map(_ => run())
    println(f"| $name | ${passes.map(p => f"$p%.3f").mkString(", ")} | min ${passes.min}%.3f |")
    spark.stop()
  }
}
