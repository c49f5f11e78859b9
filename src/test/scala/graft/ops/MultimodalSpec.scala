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
