package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
object Q83Full {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    import graft.functions.TextFunctions.tokens
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
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
      .select(col("__id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("__id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
      .repartition(32, col("w1"), col("w2"))
      .groupBy(col("__id"), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
    def chainJoin(tf0: org.apache.spark.sql.DataFrame) = {
      val pairCnt = tf0.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("cb"))
      val leftCnt = pairCnt.groupBy(col("w1")).agg(sum(col("cb")).as("cl"))
      val rightCnt = pairCnt.groupBy(col("w2")).agg(sum(col("cb")).as("cu"))
      val total = rightCnt.agg(sum(col("cu")).as("t"))
      val pairP = pairCnt.join(leftCnt, Seq("w1")).join(rightCnt, Seq("w2"))
        .crossJoin(broadcast(total))
        .select(col("w1"), col("w2"),
          (lit(0.75) * (col("cb").cast("double") / col("cl").cast("double"))
            + lit(0.25) * (col("cu").cast("double") / col("t").cast("double"))).as("p"))
      tf0.join(pairP, Seq("w1", "w2"))
        .withColumn("part", col("tf").cast("double") * log(col("p")))
        .groupBy(col("__id"))
        .agg(sum(col("tf")).cast("long").as("n_bigrams"),
          round(sum(col("part")) / sum(col("tf")).cast("double"), 4).as("logprob"))
    }
    def chainWin(tf0: org.apache.spark.sql.DataFrame) = {
      val pairCnt = tf0.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("cb"))
      val total = pairCnt.agg(sum(col("cb")).as("t"))
      val pairP = pairCnt
        .withColumn("cl", sum(col("cb")).over(Window.partitionBy(col("w1"))))
        .withColumn("cu", sum(col("cb")).over(Window.partitionBy(col("w2"))))
        .crossJoin(broadcast(total))
        .select(col("w1"), col("w2"),
          (lit(0.75) * (col("cb").cast("double") / col("cl").cast("double"))
            + lit(0.25) * (col("cu").cast("double") / col("t").cast("double"))).as("p"))
      tf0.join(pairP, Seq("w1", "w2"))
        .withColumn("part", col("tf").cast("double") * log(col("p")))
        .groupBy(col("__id"))
        .agg(sum(col("tf")).cast("long").as("n_bigrams"),
          round(sum(col("part")) / sum(col("tf")).cast("double"), 4).as("logprob"))
    }
    time("zip-explode + JOIN marginals")(noop(chainJoin(docBg)))
    time("zip-explode + WINDOW marginals")(noop(chainWin(docBg)))
    // equality check
    val a = chainJoin(docBg).orderBy("__id").collect().toSeq
    val b = chainWin(docBg).orderBy("__id").collect().toSeq
    println("[probe] equal results: " + (a == b))
    spark.stop()
  }
}
