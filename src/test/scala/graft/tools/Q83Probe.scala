package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Ranking
import graft.sources.Tables
object Q83Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9
      }
      println(f"[probe] $tag ${ts.min}%.3f s (${ts.mkString(", ")})")
    }
    val docs = Tables.documents(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // materialized (current q83)
    time("q83 materialize=true") {
      noop(Ranking.bigramLogProb(docs, col("doc_id"), col("text"), 0.75, materialize = true).orderBy(asc_nulls_first("__id")))
    }
    time("q83 materialize=false") {
      noop(Ranking.bigramLogProb(docs, col("doc_id"), col("text"), 0.75, materialize = false).orderBy(asc_nulls_first("__id")))
    }
    val plan = Ranking.bigramLogProb(docs, col("doc_id"), col("text"), 0.75, materialize = false)
      .queryExecution.executedPlan.toString
    println("[probe] ReusedExchange in lazy plan: " + plan.contains("ReusedExchange"))
    val nEx = "(?m)^.*Exchange".r.findAllIn(plan).size
    println(s"[probe] exchange nodes: $nEx")
    spark.stop()
  }
}
