package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Round-20 same-JVM A/B: (1) pinned vs inline recall-stats tail on a
  * q191-shaped gate; (2) native L2ArgminCode vs the HOF l2Assign on the
  * encode pass. Alternating passes in one JVM so host drift cancels. */
object R20Split5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- fixture: one durable IVF index, reused by both tails ----
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_r20s5_ivf"
    Similarity.writeIvfIndex(centroids, indexed, path)
    val (cents, lists) = Similarity.loadIvfIndex(spark, path)
    val qv = q.collect().head.getSeq[Float](0).toArray

    def tailInline(): DataFrame = {
      val exact = Similarity.bruteForceTopK(
        corpus, col("vec_id"), col("embedding"), q, k = 10)
      val full = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 8)
      val partial = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 3)
      val fullStats = Similarity.recallStats(exact, full, Seq("id", "sim"))
      val partStats = Similarity.recallStats(exact, partial, Seq("id"))
        .select(col("n_hit").as("n_hit_partial"))
      fullStats.crossJoin(partStats).select(col("n_exact"),
        (col("n_approx") === col("n_exact") &&
          col("n_hit") === col("n_exact")).as("full_probe_exact"),
        (col("n_hit_partial") >= col("n_exact") * 0.5).as("partial_recall_ok"))
    }
    def tailPinned(): DataFrame = {
      val exact = graft.operators.Materialize.pin(Similarity.bruteForceTopK(
        corpus, col("vec_id"), col("embedding"), q, k = 10))
      val full = graft.operators.Materialize.pin(
        Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 8))
      val partial = graft.operators.Materialize.pin(
        Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 3))
      val fullStats = Similarity.recallStats(exact, full, Seq("id", "sim"))
      val partStats = Similarity.recallStats(exact, partial, Seq("id"))
        .select(col("n_hit").as("n_hit_partial"))
      fullStats.crossJoin(partStats).select(col("n_exact"),
        (col("n_approx") === col("n_exact") &&
          col("n_hit") === col("n_exact")).as("full_probe_exact"),
        (col("n_hit_partial") >= col("n_exact") * 0.5).as("partial_recall_ok"))
    }

    // warm both
    noop(tailInline()); noop(tailPinned())
    var inl = List.empty[Double]; var pin = List.empty[Double]
    for (_ <- 1 to 4) {
      spark.catalog.clearCache()
      inl :+= t(noop(tailInline()))
      spark.catalog.clearCache()
      pin :+= t(noop(tailPinned()))
    }
    println(f"[r20split5] q191-tail inline: ${inl.map(x => f"$x%.3f").mkString(" ")} min=${inl.min}%.3f")
    println(f"[r20split5] q191-tail pinned: ${pin.map(x => f"$x%.3f").mkString(" ")} min=${pin.min}%.3f")

    // ---- (2) encode pass: native vs HOF l2Assign ----
    val cbs = Similarity.ivfPqFitCodebooks(corpus, col("vec_id"),
      col("embedding"), centroids, m = 16, ksub = 16, iters = 1)
    val encNative = Similarity.ivfPqEncode(
      corpus, col("vec_id"), col("embedding"), centroids, cbs)
    // HOF form: rebuild packedCodesCol/listAssign with the HOF l2Assign
    def hofAssign(cands: org.apache.spark.sql.Column,
        sub: org.apache.spark.sql.Column) =
      Similarity.l2AssignHof(cands, sub)
    val ksub = 16; val m = 16
    val bits = 4
    val cbLit = array((0 until m).map { j =>
      array(cbs.codebooks.filter(_._1 == j).map { case (_, cl, c) =>
        struct(lit(cl).as("cl"), typedLit(c.toSeq).as("c"))
      }: _*)
    }: _*)
    val centLit = array(centroids.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("cl"), typedLit(cv.map(_.toDouble).toSeq).as("c"))
    }: _*)
    val base = corpus.select(col("vec_id").cast("long").as("id"),
        col("embedding").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.normSq(col("v"))))
      .filter(col("nrm") > 0)
      .select(col("id"), col("v"),
        transform(col("v"), x => x.cast("double") / col("nrm")).as("u"))
    val dsubCol = (size(col("u")) / m).cast("int")
    val codesHof = (0 until m).map { j =>
      shiftleft(hofAssign(element_at(cbLit, j + 1),
        slice(col("u"), lit(j) * dsubCol + 1, dsubCol)).cast("long"), j * bits)
    }.reduce(_ bitwiseOR _)
    val listHof = hofAssign(centLit, transform(col("v"), _.cast("double")))
    val encHof = base.select(col("id"), codesHof.as("codes"), listHof.as("list"))

    noop(encNative); noop(encHof)
    var nat = List.empty[Double]; var hof = List.empty[Double]
    for (_ <- 1 to 4) {
      nat :+= t(noop(encNative))
      hof :+= t(noop(encHof))
    }
    println(f"[r20split5] encode native: ${nat.map(x => f"$x%.3f").mkString(" ")} min=${nat.min}%.3f")
    println(f"[r20split5] encode HOF:    ${hof.map(x => f"$x%.3f").mkString(" ")} min=${hof.min}%.3f")
    // sanity: identical codes
    val diff = encNative.as("a").join(encHof.as("b"), Seq("id"))
      .filter(col("a.codes") =!= col("b.codes") ||
        col("a.list") =!= col("b.list")).count()
    println(s"[r20split5] encode native-vs-HOF row diffs: $diff")
    spark.stop()
  }
}
