package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q18 near-dup pipeline to
  * localize 10x-scale variance. Not part of the engine surface. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("dedup-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def candPlain(bands: DataFrame): DataFrame = {
      val a = bands.alias("a"); val b = bands.alias("b")
      a.join(b,
          col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }

    def pipeline(repart: Boolean, hint: String): DataFrame = {
      val sigs = ops.Dedup.minHashSignatures(docs, "text", 8, 2)
      val bands = ops.Dedup.lshBands(sigs, 8, 2)
      val pairs = if (repart) ops.Dedup.candidatePairs(bands) else candPlain(bands)
      val sh = docs.select(col("doc_id"),
        graft.functions.TextExpressions.shingle_hashes(
          ops.TextStats.tokens(col("text")), 2).as("sh"))
      val shh = if (hint.isEmpty) sh else sh.hint(hint)
      pairs
        .join(shh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(shh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          graft.functions.TextExpressions.array_jaccard(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= 0.35)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
    }

    val variants = Seq(
      "repart+stats" -> (() => pipeline(true, "")),
      "plain+stats" -> (() => pipeline(false, "")),
      "repart+bcast" -> (() => pipeline(true, "broadcast")),
      "plain+bcast" -> (() => pipeline(false, "broadcast")))

    // warmup round, then interleaved measurement rounds
    variants.foreach(_._2().write.format("noop").mode("overwrite").save())
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to 4).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        times(name) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (name, _) =>
      println(f"$name: ${times(name).reverse.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
