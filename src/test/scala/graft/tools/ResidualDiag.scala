package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** The decomposition behind BASELINE.md's raw-vs-residual conclusion:
  * per-row quantization error of raw-u PQ vs residual PQ at matched
  * m/ksub/iters, plus the residual-norm stats that explain the
  * direction (on the isotropic test embeddings mean ‖r‖² > ‖u‖² —
  * subtracting a centroid that captures little direction INFLATES the
  * quantization target), and the auto mode's resulting pick.
  * Run: sbt "Test/runMain graft.tools.ResidualDiag [sfDir]" */
object ResidualDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val (cents, _) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)

    // Unit vectors + list + residual, all in driver-free SQL.
    val ucRows = cents.map { c =>
      var n2 = 0.0; var i = 0
      while (i < c.length) { n2 += c(i).toDouble * c(i).toDouble; i += 1 }
      val n = math.sqrt(n2)
      if (n == 0.0) c.map(_ => 0.0).toSeq else c.map(_.toDouble / n).toSeq
    }
    val ucLit = array(ucRows.map(typedLit(_)): _*)
    val base = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.normSq(col("v"))))
      .filter(col("nrm") > 0)
      .withColumn("u", transform(col("v"), x => x.cast("double") / col("nrm")))
    // list assignment mirror: L2 argmin vs raw centroids (doubles)
    val candLit = array(cents.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("cl"), typedLit(cv.map(_.toDouble).toSeq).as("c"))
    }: _*)
    val vd = transform(col("v"), _.cast("double"))
    val listCol = array_min(transform(candLit, ct => struct(
      round(aggregate(zip_with(vd, ct.getField("c"),
        (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x),
        6).as("d2"),
      ct.getField("cl").as("cl")))).getField("cl")
    val withRes = base.withColumn("list", listCol)
      .withColumn("r", zip_with(col("u"),
        element_at(ucLit, col("list") + 1), (a, b) => a - b))
    withRes.persist()
    println("== norm stats ==")
    withRes.select(
      round(avg(aggregate(transform(col("u"), x => x * x),
        lit(0.0d), (a, x) => a + x)), 4).as("mean_u_norm2"),
      round(avg(aggregate(transform(col("r"), x => x * x),
        lit(0.0d), (a, x) => a + x)), 4).as("mean_r_norm2"))
      .show(false)
    println("== per-list residual norms ==")
    withRes.groupBy(col("list")).agg(count(lit(1)).as("n"),
      round(avg(aggregate(transform(col("r"), x => x * x),
        lit(0.0d), (a, x) => a + x)), 4).as("mean_r_norm2"))
      .orderBy(col("list")).show(false)

    // Quantization MSE: decode codes and compare.
    def mse(cbs: Seq[(Int, Int, Array[Double])],
        encoded: org.apache.spark.sql.DataFrame,
        target: org.apache.spark.sql.DataFrame,
        tcol: String): Double = {
      val m = cbs.map(_._1).max + 1
      val ksub = cbs.map(_._2).max + 1
      val bits = java.lang.Integer.numberOfTrailingZeros(ksub)
      val dsub = cbs.head._3.length
      val cbArr = array((0 until m).map { j =>
        array((0 until ksub).map { c =>
          typedLit(cbs.find(p => p._1 == j && p._2 == c).map(_._3.toSeq)
            .getOrElse(Seq.fill(dsub)(0.0)))
        }: _*)
      }: _*)
      val decoded = flatten(array((0 until m).map { j =>
        element_at(element_at(cbArr, j + 1),
          shiftright(col("codes"), j * bits)
            .bitwiseAND(lit((ksub - 1).toLong)).cast("int") + 1)
      }: _*))
      encoded.join(target, "id")
        .select(aggregate(zip_with(col(tcol), decoded,
          (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x)
          .as("e2"))
        .agg(avg(col("e2"))).collect().head.getDouble(0)
    }
    val (rawCbs, rawEnc) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16, iters = 1)
    val resCbs = Similarity.ivfPqFitCodebooks(
      corpus, col("vec_id"), col("embedding"), cents,
      m = 16, ksub = 16, iters = 1, encoding = "residual")
    val resEnc = Similarity.ivfPqEncode(
      corpus, col("vec_id"), col("embedding"), cents, resCbs)
    val auto = Similarity.ivfPqFitCodebooks(
      corpus, col("vec_id"), col("embedding"), cents,
      m = 16, ksub = 16, iters = 1, encoding = "auto")
    println(f"raw  MSE(u)  = ${mse(rawCbs, rawEnc, withRes.select(col("id"), col("u")), "u")}%.6f")
    println(f"res  MSE(r)  = ${mse(resCbs.codebooks, resEnc, withRes.select(col("id"), col("r")), "r")}%.6f")
    println(s"auto picks   = ${auto.encoding}")
    spark.stop()
  }
}
