package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Round-20: fitCodebooks job-by-job, and the fitSampleOf plan shape. */
object R20Split6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[r20split6] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") =!= 0)
    println("[r20split6] corpus rows = " + corpus.count())

    // the fit frame exactly as ivfPqFitCodebooks builds it (raw branch)
    val (centroids, _) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)

    for (pass <- 1 to 2) {
      println(s"[r20split6] ---- pass $pass ----")
      val un0 = corpus.select(col("vec_id").cast("long").as("id"),
          col("embedding").as("v"))
        .withColumn("nrm",
          sqrt(graft.functions.VectorFunctions.normSq(col("v"))))
        .filter(col("nrm") > 0)
        .select(col("id"),
          transform(col("v"), x => x.cast("double") / col("nrm")).as("u"))
        .select(col("id"), col("u").as("w"))
      val sampled = un0.orderBy(xxhash64(col("id")), col("id"))
        .limit(100000).repartition(col("id"))
      if (pass == 1) sampled.explain("formatted")
      t("fitSampleOf chain noop") {
        sampled.write.format("noop").mode("overwrite").save()
      }
      val unP = sampled.persist()
      t("unP count (materialize persist)") { unP.count() }
      val m = 16
      val dsubCol = (size(col("w")) / m).cast("int")
      val subs = unP.select(col("id"), posexplode(
          transform(sequence(lit(0), lit(m - 1)), j =>
            slice(col("w"), j * dsubCol + 1, dsubCol))).as(Seq("j", "sub")))
        .persist()
      t("init ids collect (from unP)") {
        unP.orderBy(col("id")).limit(16)
          .select(col("id"), size(col("w")).as("d")).collect()
      }
      t("subs materialize + initRows collect") {
        subs.filter(col("id").isin((0L to 16L): _*))
          .select(col("id"), col("j"), col("sub")).collect()
      }
      val cbs0 = Similarity.ivfPqFitCodebooks(corpus, col("vec_id"),
        col("embedding"), centroids, m = 16, ksub = 16, iters = 0)
      val candDf = cbs0.codebooks.map { case (j, cl, c) => (j, cl, c.toSeq) }
        .toDF("j", "cl", "c")
        .groupBy(col("j"))
        .agg(collect_list(struct(col("cl"), col("c"))).as("cands"))
      def iterOnce(): Unit =
        subs.join(broadcast(candDf), "j")
          .withColumn("cl", expr("1"))
          .select(col("j"), col("cl"),
            posexplode(col("sub")).as(Seq("dim", "x")))
          .groupBy(col("j"), col("cl"), col("dim"))
          .agg(round(sum(col("x")) / count(lit(1)), 6).as("c"))
          .collect()
      t("one fit iteration (join+groupBy+collect)") { iterOnce() }
      t("fit iteration again (warm)") { iterOnce() }
      subs.unpersist(); unP.unpersist()
      t("full ivfPqFitCodebooks iters=1") {
        Similarity.ivfPqFitCodebooks(corpus, col("vec_id"),
          col("embedding"), centroids, m = 16, ksub = 16, iters = 1)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
