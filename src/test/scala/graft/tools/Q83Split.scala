package graft.tools
import org.apache.spark.sql.functions._
import graft.sources.Tables
object Q83Split {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    import graft.functions.TextFunctions.tokens
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9
      }
      println(f"[probe] $tag ${ts.min}%.3f s")
    }
    val df = Tables.documents(spark, dir)
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    val toks = tokens(col("text"))
    def docBg = df.select(col("doc_id").as("__id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("__id"), explode(
        transform(sequence(lit(0), size(col("toks")) - 2), i => struct(
          element_at(col("toks"), i + 1).as("w1"),
          element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .select(col("__id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    time("explode only")(noop(docBg))
    def tf0 = docBg.repartition(32, col("w1"), col("w2"))
      .groupBy(col("__id"), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
    time("repartition+agg")(noop(tf0))
    def pairCnt = tf0.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("cb"))
    time("+pairCnt")(noop(pairCnt))
    def pairP = {
      val pc = pairCnt
      val leftCnt = pc.groupBy(col("w1")).agg(sum(col("cb")).as("cl"))
      val rightCnt = pc.groupBy(col("w2")).agg(sum(col("cb")).as("cu"))
      val total = rightCnt.agg(sum(col("cu")).as("t"))
      pc.join(leftCnt, Seq("w1")).join(rightCnt, Seq("w2"))
        .crossJoin(broadcast(total))
        .select(col("w1"), col("w2"),
          (lit(0.75) * (col("cb").cast("double") / col("cl").cast("double"))
            + lit(0.25) * (col("cu").cast("double") / col("t").cast("double"))).as("p"))
    }
    time("+marginals(pairP)")(noop(pairP))
    def full = tf0.join(pairP, Seq("w1", "w2"))
      .withColumn("part", col("tf").cast("double") * log(col("p")))
      .groupBy(col("__id"))
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        round(sum(col("part")) / sum(col("tf")).cast("double"), 4).as("logprob"))
    time("full chain (no persist)")(noop(full))
    spark.stop()
  }
}
