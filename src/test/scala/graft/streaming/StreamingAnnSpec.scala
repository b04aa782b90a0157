package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.Tables

class StreamingAnnSpec extends SparkSpec {

  test("streaming ANN probe over a RELOADED durable IVF index: stream ≡ batch, zero streaming state") {
    // The production shape end to end: last week's build job wrote the
    // IVF index; the resident vector-ingest daemon holds only a
    // loadIvfIndex handle and probes each arriving embedding batch.
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") >= 10)
    val (centroids, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    val root = Files.createTempDirectory("streamann").toString
    Similarity.writeIvfIndex(centroids, indexed, s"$root/idx")

    val fresh = spark.newSession()
    val (cents, lists) = Similarity.loadIvfIndex(fresh, s"$root/idx")
    // Two "arriving" query batches (vectors the corpus excludes).
    val emb2 = Tables.embeddings(fresh, sf)
    val inDir = s"$root/in"
    emb2.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).write.parquet(inDir)
    val schema = fresh.read.parquet(inDir).schema
    def run(): Unit = {
      val q = StreamingAnn.start(fresh, inDir, schema,
        col("vec_id"), col("embedding"), cents, lists,
        k = 5, nProbe = 3,
        outDir = s"$root/out", checkpointDir = s"$root/ck")
      try {
        q.awaitTermination()
        assert(q.lastProgress == null ||
          q.lastProgress.stateOperators.isEmpty,
          "foreachBatch ANN probe must keep no streaming state")
      } finally q.stop()
    }
    run()
    emb2.filter(col("vec_id") >= 5 && col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .write.mode("append").parquet(inDir)
    run()

    val got = fresh.read.parquet(s"$root/out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val batch = Similarity.ivfTopKBatch(cents, lists,
        emb2.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        k = 5, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === batch, "stream output must equal the batch operator's")
    assert(got.map(_._1) === (0L until 10L).toSet,
      "every arriving query must get its neighbor rows")
    assert(got.forall(r => r._2 >= 10L),
      "neighbors come from the indexed corpus only")
  }
}
