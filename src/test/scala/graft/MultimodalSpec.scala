package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.scale.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, "abc"), (3L, "video payload bytes"))
    .toDF("doc_id", "text")

  test("fromDocuments builds payload bytes + typed metadata") {
    val mm = Multimodal.fromDocuments(docs)
    val r = mm.filter($"doc_id" === 1).select($"payload", $"meta.kind",
      $"meta.width", $"meta.n_frames").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") === "hello world")
    assert(r.getString(1) === "audio")   // 1 % 3 = 1 → index 2
    assert(r.getInt(2) === 17 && r.getInt(3) === 2)
  }

  test("decodeFeatures: stub channel stats equal md5 prefix bytes") {
    val out = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs))
    val r = out.filter($"doc_id" === 2).head()
    val md5 = MessageDigest.getInstance("MD5").digest("abc".getBytes("UTF-8"))
    assert(r.getAs[Int]("n_bytes") === 3)
    assert(r.getAs[Seq[Int]]("features") === md5.take(4).map(_ & 0xff).toSeq)
  }

  test("sampleFrames emits stride-spaced frames for video rows only") {
    val mm = Multimodal.fromDocuments(docs)
    val frames = Multimodal.sampleFrames(mm, stride = 2)
    // only doc 3 is video (3 % 3 = 0 → "image"? index = 0+1 = 1 → image).
    // kinds: doc % 3 = 0→image, 1→audio, 2→video ⇒ doc 2 is video, n_frames=3
    val rows = frames.collect()
    assert(rows.forall(_.getLong(0) == 2L))
    assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(0, 2))
  }

  test("resizeFeatures truncates the feature width") {
    val out = Multimodal.resizeFeatures(
      Multimodal.decodeFeatures(Multimodal.fromDocuments(docs), nChannels = 4), 2)
    assert(out.select(size($"features")).as[Int].collect().forall(_ == 2))
  }

  test("repartitionBySize preserves rows") {
    val mm = Multimodal.fromDocuments(docs)
    assert(Multimodal.repartitionBySize(mm, 2).count() === 3)
  }
}
