package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"),
    (1L, "a" * 700),           // exercises width wrap-around (% 640)
    (2L, "")
  ).toDF("doc_id", "text")

  test("binary payload plumbing: opaque bytes + typed metadata") {
    val media = Multimodal.withPayload(docs)
    val r = media.where(col("doc_id") === 0).head()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "hello world")
    assert(r.getAs[String]("media_type") === "image/fake-0")
  }

  test("resize stub: deterministic strided thumbnail with target dims") {
    val media = Multimodal.withPayload(docs)
    val out = Multimodal.resizeStub(media, 32, 32).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(0L).width === 32 && out(0L).height === 32)
    // deterministic: same input → same thumbnail bytes
    val again = Multimodal.resizeStub(media, 32, 32).collect()
      .map(r => r.doc_id -> r.thumbnail.toSeq).toMap
    assert(out.view.mapValues(_.thumbnail.toSeq).toMap === again)
    // content-dependent, smaller than or equal to the payload
    assert(out(1L).thumbnail.length <= 700)
  }

  test("frame sampling keeps every 2nd of 8-char frames with checksums") {
    val frames = Multimodal.frameSample(docs, frameChars = 8, every = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")))
    // doc 1 has 700 chars → 88 frames → 44 sampled (even indices)
    assert(frames.count(_._1 == 1L) === 44)
    assert(frames.filter(_._1 == 1L).forall(_._2 % 2 == 0))
    assert(!frames.exists(_._1 == 2L))   // empty doc yields no frames
  }

  test("mapPartitions decode path agrees with the expression path") {
    val media = Multimodal.withPayload(docs)
    val viaPartitions = Multimodal.decodeFeatures(media)
      .collect().map(f => (f.doc_id, f.n_bytes, f.width, f.height, f.checksum)).toSet
    val viaExpr = Multimodal.decodeFeaturesExpr(media)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes").toInt,
        r.getAs[Long]("width").toInt, r.getAs[Long]("height").toInt,
        r.getAs[String]("checksum"))).toSet
    assert(viaPartitions === viaExpr)
    val wide = viaExpr.find(_._1 == 1L).get
    assert(wide._2 === 700)
    assert(wide._3 === 60)     // 700 % 640
  }
}
