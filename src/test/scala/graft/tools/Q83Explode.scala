package graft.tools
import org.apache.spark.sql.functions._
import graft.sources.Tables
object Q83Explode {
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
    def v1 = df.select(col("doc_id").as("__id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("__id"), explode(
        transform(sequence(lit(0), size(col("toks")) - 2), i => struct(
          element_at(col("toks"), i + 1).as("w1"),
          element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .select(col("__id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    time("v1 transform+sequence+struct")(noop(v1))
    def v2 = df.select(col("doc_id").as("__id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("__id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("__id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
    time("v2 zip+slice")(noop(v2))
    def v3 = df.select(col("doc_id").as("__id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("__id"), posexplode(col("toks")))
      .toDF("__id", "pos", "w1")
    time("v3 posexplode flat (no pairing)")(noop(v3))
    // tokenize cost alone
    time("v0 tokenize+size only")(noop(df.select(col("doc_id"), size(toks).as("n"))))
    spark.stop()
  }
}
