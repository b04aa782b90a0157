package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Subword
import graft.sources.Tables

/** Round-20: q121 split — vocabulary train vs greedy-encode walk. */
object R20Split8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[r20split8] $name%-42s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val docs = Tables.documents(spark, sfDir)
    for (pass <- 1 to 2) {
      println(s"[r20split8] ---- pass $pass ----")
      var v: Seq[(String, Int)] = null
      t("vocab train (V=50,M=4) collect") {
        v = Subword.vocab(docs, col("text"), 50, 4)
          .select(col("piece"), col("vid"))
          .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      }
      t("encodeWithVocab walk noop") {
        noop(Subword.encodeWithVocab(docs, col("doc_id"), col("text"), v, 4)
          .orderBy(asc_nulls_first("doc_id")))
      }
      t("encodeWithVocabJoin noop") {
        noop(Subword.encodeWithVocabJoin(docs, col("doc_id"), col("text"),
            Subword.vocab(docs, col("text"), 50, 4)
              .select(col("piece"), col("vid")), 4)
          .orderBy(asc_nulls_first("doc_id")))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
