package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Scale-stress harness (manual; not part of the suite): replicates the
  * sf0.1 documents table K× with shifted ids (each replica's text gets a
  * replica-tag token appended so replicas are NEAR-dups of each other,
  * not exact) and times the dedup operators — validates the
  * prefix-filtered join stays near-linear as the corpus grows.
  * Run: sbt "Test/runMain graft.tools.ScaleStress [K]"
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val big = (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionByName _).cache()
    val n = big.count()
    println(s"corpus: $n docs (${k}x)")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("jaccard pairs (exact)") {
      Dedup.ngramJaccardPairs(big, col("doc_id"), col("text"), 3, 0.8).count()
    }
    time("minhash LSH pairs") {
      Dedup.minhashLshPairs(big, col("doc_id"), col("text")).count()
    }
    time("minhash LSH + exact verify") {
      Dedup.minhashLshVerifiedPairs(big, col("doc_id"), col("text")).count()
    }
    time("containment pairs (capped)") {
      Dedup.containmentPairs(big, col("doc_id"), col("text"),
        n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
    }
    time("containment pairs (banded k=8)") {
      Dedup.containmentPairsLsh(big, col("doc_id"), col("text"),
        n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
    }
    // Hot-band skew: plant k*125 IDENTICAL docs — one (band, bh) key then
    // carries a quadratic pair load in every band. Salting spreads that
    // key's pair generation across tasks; output is identical.
    val hot = spark.range(9000000L, 9000000L + k * 125)
      .select(col("id").as("doc_id"),
        lit("mass duplicated boilerplate page body text repeated verbatim across the corpus")
          .as("text"))
    val withHot = big.unionByName(hot).cache()
    println(s"hot-band corpus: ${withHot.count()} docs (${k * 125} identical)")
    time("LSH verified, hot band") {
      Dedup.minhashLshVerifiedPairs(withHot, col("doc_id"), col("text")).count()
    }
    time("LSH verified, hot band, salt=16") {
      Dedup.minhashLshVerifiedPairs(withHot, col("doc_id"), col("text"),
        bandSalts = 16).count()
    }
    withHot.unpersist()
    time("dedup corpus e2e") {
      Dedup.dedupCorpus(big, col("doc_id"), col("text")).count()
    }
    time("dedup corpus e2e (LSH)") {
      Dedup.dedupCorpus(big, col("doc_id"), col("text"), useLsh = true).count()
    }
    // Embedding near-dup at K× corpus: replicas carry a tiny deterministic
    // per-replica perturbation on one dimension, so same-base replicas
    // stay cosine≈1 (planted pairs grow as K²) while different bases
    // don't collide.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val bigEmb = (0 until k).map { i =>
      emb.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === 0, x + lit(i.toFloat * 1e-4f)).otherwise(x))
          .as("embedding"))
    }.reduce(_ unionByName _).cache()
    println(s"embeddings: ${bigEmb.count()} vectors (${k}x, dim 64)")
    time("embedding pairs (brute n^2)") {
      Dedup.embeddingPairs(bigEmb, col("vec_id"), col("embedding"), 0.999).count()
    }
    time("embedding pairs (LSH-bucketed)") {
      Dedup.embeddingPairsLsh(bigEmb, col("vec_id"), col("embedding"), 0.999).count()
    }
    // ANN single-query stress: exact scan vs hyperplane-LSH probe vs IVF
    // probe on the K× corpus, with recall against the exact top-10.
    import spark.implicits._
    val qv = emb.filter(col("vec_id") === 7).head().getSeq[Float](1).toArray
    val qdf = Seq(Tuple1(qv)).toDF("qv")
    val exactTop = time("ANN exact top-10 scan") {
      graft.operators.Similarity
        .bruteForceTopK(bigEmb, col("vec_id"), col("embedding"), qdf, 10)
        .collect().map(_.getLong(0)).toSet
    }
    val bucketed = graft.operators.Similarity
      .bucketize(bigEmb, col("vec_id"), col("embedding"), 16).cache()
    bucketed.count()
    val lshTop = time("ANN lsh top-10 (probe<=1 bit)") {
      graft.operators.Similarity.lshTopK(bucketed, qdf, 10, 16)
        .collect().map(_.getLong(0)).toSet
    }
    val (cents, indexed0) = time("IVF index build (k-means 64 lists)") {
      graft.operators.Similarity.ivfIndex(bigEmb, col("vec_id"), col("embedding"), 64)
    }
    val indexed = indexed0.cache()
    indexed.count()
    val ivfTop = time("ANN ivf top-10 (nProbe=8)") {
      graft.operators.Similarity.ivfTopK(cents, indexed, qv, 10, 8)
        .collect().map(_.getLong(0)).toSet
    }
    println(f"ANN recall@10 vs exact: lsh=${(lshTop & exactTop).size / 10.0}%.2f " +
      f"ivf=${(ivfTop & exactTop).size / 10.0}%.2f")
    spark.stop()
  }
}
