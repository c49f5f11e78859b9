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

  test("nearest_cell and srp_bucket codegen compiles and matches interpreted eval (no silent fallback)") {
    // CODEGEN_ONLY surfaces janino errors instead of quietly falling
    // back to the interpreted path — without it a broken doGenCode
    // would pass every behavioral test while silently destroying the
    // perf it exists for
    val rnd = new scala.util.Random(10)
    val cents = Seq.fill(5)(Seq.fill(8)(rnd.nextDouble() - 0.5))
    val planes = (0 until 6).map(p => (0 until 8).map(d =>
      graft.ops.Similarity.planeComponent(p, d)))
    val vecs = (0L until 100L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("id", "v")
    def run(): Map[Long, (Int, Int)] = vecs.select(col("id"),
        VectorExpressions.nearest_cell(col("v"), cents).as("cell"),
        VectorExpressions.srp_bucket(col("v"), 8, 6, planes).as("bucket"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val viaCodegen = try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      run()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val viaInterp = try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      run()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(viaCodegen === viaInterp)
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
