package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Sketches

class SketchExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def countsDf(pairs: (String, Long)*) =
    pairs.toSeq.toDF("tok", "cnt")

  private def sketchOf(df: org.apache.spark.sql.DataFrame, d: Int, w: Int): Array[Long] =
    df.agg(SketchExpressions.count_min_sketch_agg(col("tok"), col("cnt"), d, w).as("sk"))
      .head().getAs[scala.collection.Seq[Long]]("sk").toArray

  test("sketch matches an in-memory fold of the same bucket function") {
    val pairs = Seq("alpha" -> 5L, "beta" -> 3L, "gamma" -> 7L, "delta" -> 1L)
    val (d, w) = (3, 8)
    val got = sketchOf(countsDf(pairs: _*), d, w)
    val exp = new Array[Long](d * w)
    val md = MessageDigest.getInstance("MD5")
    for ((t, c) <- pairs; j <- 0 until d)
      exp(j * w + SketchExpressions.bucket(t, j, w, md)) += c
    assert(got.toSeq === exp.toSeq)
  }

  test("partition-independent: 1-partition and 7-partition sketches agree") {
    val pairs = (1 to 100).map(i => (s"tok$i", i.toLong))
    val df = countsDf(pairs: _*)
    assert(sketchOf(df.repartition(7), 4, 16).toSeq ===
      sketchOf(df.coalesce(1), 4, 16).toSeq)
  }

  test("estimate never undercounts; exact when the sketch is wide") {
    val pairs = (1 to 50).map(i => (s"token_$i", (i * 13 % 29 + 1).toLong))
    val df = countsDf(pairs: _*)
    for ((d, w) <- Seq((4, 8), (4, 4096))) {
      val sk = df.agg(
        SketchExpressions.count_min_sketch_agg(col("tok"), col("cnt"), d, w).as("sk"))
      val rows = df.crossJoin(broadcast(sk))
        .select(col("tok"), col("cnt"),
          SketchExpressions.cms_estimate(col("sk"), col("tok"), d, w).as("est"))
        .collect()
      rows.foreach { r =>
        assert(r.getAs[Long]("est") >= r.getAs[Long]("cnt"), s"undercount at $r")
      }
      if (w == 4096) // 50 tokens in 4096 buckets × 4 rows: no full-row collision
        rows.foreach(r => assert(r.getAs[Long]("est") === r.getAs[Long]("cnt")))
    }
  }

  test("w=1 degenerates to the grand total in every row") {
    val df = countsDf("a" -> 2L, "b" -> 3L, "c" -> 5L)
    val sk = df.agg(
      SketchExpressions.count_min_sketch_agg(col("tok"), col("cnt"), 2, 1).as("sk"))
    val est = df.crossJoin(broadcast(sk))
      .select(SketchExpressions.cms_estimate(col("sk"), col("tok"), 2, 1).as("est"))
      .collect().map(_.getLong(0))
    assert(est.toSeq === Seq(10L, 10L, 10L))
  }

  test("cmsFrequency on real documents: top-k exact counts, no undercount") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Sketches.cmsFrequency(docs, d = 4, w = 32, k = 10).collect()
    assert(rows.length === 10)
    rows.foreach(r => assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("cnt")))
    // top-k is ranked by exact count desc
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse)
  }
}
