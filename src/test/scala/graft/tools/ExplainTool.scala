package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints the formatted physical plan for one or all SparkEntry queries —
  * the plan-audit loop: check pushed filters, read schemas, broadcast vs
  * shuffle joins, and whole-stage-codegen spans.
  *
  * Usage: Test/runMain graft.tools.ExplainTool [queryName] [sfDir]
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val targets = name match {
      case Some(n) => Seq(n -> SparkEntry.queries(n))
      case None    => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    targets.foreach { case (n, fn) =>
      println(s"\n======== $n ========")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
