package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table plumbing: binary payload + typed metadata") {
    val docs = Seq((1L, "abc", "en", "img", 3L), (2L, "wxyz", "en", "aud", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocuments(docs)
    val r = media.orderBy("media_id").collect()
    assert(r(0).getAs[Array[Byte]]("bytes").toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(r(1).getAs[String]("kind") == "aud")
    assert(media.schema("bytes").dataType.typeName == "binary")
  }

  test("decodeFeatures: deterministic stub features, exact checksum/bytes") {
    implicit val s = spark
    val docs = Seq((1L, "abc", "en", "img", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val feat = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(docs), 2)
      .collect().head
    assert(feat.n_bytes == 3L)
    assert(feat.checksum == ('a' + 'b' + 'c').toLong)
    assert(feat.feat.length == 8)
    assert(math.abs(feat.feat(0) - 'a' / 255.0f) < 1e-6)
  }

  test("resize stub: binary->binary with proportional payload, metadata updated") {
    implicit val s = spark
    val docs = Seq((1L, "x" * 1000, "en", "img", 1000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val resized = Multimodal.resize(Multimodal.mediaFromDocuments(docs), 64, 64)
      .collect().head
    assert(resized.bytes.length == 64 * 64 / 64)
    assert(resized.declared_len == resized.bytes.length.toLong)
  }

  test("frame sampling explodes one row per sampled frame, covering payload") {
    implicit val s = spark
    val docs = Seq((7L, "abcdefghij", "en", "vid", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(Multimodal.mediaFromDocuments(docs), 5)
      .collect().sortBy(_.frame_index)
    assert(frames.length == 5)
    assert(frames.map(_.media_id).distinct.toSeq == Seq(7L))
    assert(frames.map(f => new String(f.frame_bytes)).mkString == "abcdefghij")
  }

  test("decode runs distributed across requested parallelism") {
    implicit val s = spark
    val docs = (0 until 100).map(i => (i.toLong, s"text$i", "en", "img", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ds = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(docs), 4)
    assert(ds.rdd.getNumPartitions == 4)
    assert(ds.count() == 100)
  }
}
