package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("nearest_cell: argmax cosine with lowest-cell ties; zero vectors well-defined") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0)) // cell 2 duplicates cell 0
    val vecs = Seq(
      (0L, Array(5.0f, 0.1f)),   // → cell 0 (ties 0 vs 2 → lowest)
      (1L, Array(0.1f, 9.0f)),   // → cell 1
      (2L, Array(0.0f, 0.0f)))   // zero vector: all cos 0 → cell 0
      .toDF("id", "v")
    val got = vecs.select(col("id"),
        VectorExpressions.nearest_cell(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 0))
  }

  test("nearest_cell agrees with per-centroid cosine_similarity argmax on random vectors") {
    val rnd = new scala.util.Random(5)
    val cents = Seq.fill(7)(Seq.fill(16)(rnd.nextDouble() - 0.5))
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f))).toDF("id", "v")
    val viaExpr = vecs.select(col("id"),
        VectorExpressions.nearest_cell(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference: score each centroid with the codegen'd cosine, argmax
    val scoredCols = cents.zipWithIndex.map { case (c, i) =>
      VectorExpressions.cosine_similarity(col("v"), typedLit(c)).as(s"c$i")
    }
    val viaCosine = vecs.select(col("id") +: scoredCols: _*)
      .collect().map { r =>
        val scores = cents.indices.map(i => r.getDouble(i + 1))
        r.getLong(0) -> scores.indexOf(scores.max)
      }.toMap
    assert(viaExpr === viaCosine)
  }
}
