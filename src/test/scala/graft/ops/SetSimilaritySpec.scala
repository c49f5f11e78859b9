package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Exact all-pairs reference: inverted-index join with NO prefix or
    * length filtering — the thing the prefix filter must not deviate
    * from. Same hash space as the operator. */
  private def bruteForce(docs: DataFrame, pct: Int, shingleSize: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val e = docs.select(col("doc_id").as("id"),
        graft.functions.TextExpressions.shingle_hashes(
          TextStats.tokens(col("text")), shingleSize).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("id"), size(col("hs")).cast("long").as("n"),
        explode(col("hs")).as("g"))
    val pairs = e.alias("a")
      .join(e.alias("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("da"), col("b.id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
      .withColumn("u", col("na") + col("nb") - col("i"))
      .where(col("i") * 100 >= col("u") * pct)
    pairs.select("da", "db", "i", "u")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        1000000L * r.getLong(2) / r.getLong(3)))
      .toSet
  }

  private def result(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("planted near-dups found with exact similarity; boundary pair is inclusive") {
    val docs = Seq(
      (0L, "a b c d e f g h i j k"),   // 9 3-shingles
      (1L, "a b c d e f g h i j k"),   // exact dup of 0 → jac 1.0
      (2L, "a b c d e f g h i j z"),   // near dup: 8 shared of 10 union
      (3L, "p q r s t u v w x y"),     // disjoint from 0-2
      (4L, "p q r s t u v w x z"),     // near dup of 3
      (5L, "one two"),                 // < 3 tokens → no shingles, absent
      (6L, "")                          // empty, absent
    ).toDF("doc_id", "text")
    val out = result(SetSimilarity.setSimilarityJoin(docs, thresholdPct = 70))
    val exp = bruteForce(docs, 70, 3)
    assert(out === exp)
    // the exact pair is there at full similarity
    assert(out.exists { case (a, b, i, u, ppm) =>
      a == 0L && b == 1L && i == u && ppm == 1000000L })
    // docs without shingles never appear
    assert(!out.exists { case (a, b, _, _, _) => a >= 5L || b >= 5L })
    // boundary inclusivity: pick a threshold equal to an existing pair's
    // exact similarity — pair (0,2): inter 8, union 10 → exactly 80%
    val at80 = result(SetSimilarity.setSimilarityJoin(docs, thresholdPct = 80))
    assert(at80.exists { case (a, b, _, _, ppm) =>
      a == 0L && b == 2L && ppm == 800000L })
    assert(at80 === bruteForce(docs, 80, 3))
  }

  test("prefix filter loses nothing on a skewed random corpus (vs brute force)") {
    // seeded corpus over a small vocabulary → heavy shingle sharing,
    // many length-incompatible and prefix-pruned pairs
    val rnd = new scala.util.Random(42)
    val vocab = Vector("k", "v", "t", "s", "r", "w", "q", "b", "f", "g")
    val rows = (0L until 60L).map { i =>
      val n = 4 + rnd.nextInt(20)
      val base = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, base)
    } ++ Seq((60L, "k v t s r w q b"), (61L, "k v t s r w q b"))
    val docs = rows.toDF("doc_id", "text")
    for (pct <- Seq(50, 75, 90)) {
      assert(result(SetSimilarity.setSimilarityJoin(docs, thresholdPct = pct))
        === bruteForce(docs, pct, 3), s"mismatch at pct=$pct")
    }
  }

  test("threshold 100 returns exactly the identical-set pairs") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e"),
      (2L, "a b c d f")
    ).toDF("doc_id", "text")
    val out = result(SetSimilarity.setSimilarityJoin(docs, thresholdPct = 100))
    assert(out === Set((0L, 1L, 3L, 3L, 1000000L)))
  }

  /** Directed brute-force containment reference: full inverted-index
    * join, both directions, no prefix/size pruning. Tuple layout
    * mirrors containmentJoin's output columns. */
  private def bruteForceContainment(docs: DataFrame, pct: Int,
                                    shingleSize: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val e = docs.select(col("doc_id").as("id"),
        graft.functions.TextExpressions.shingle_hashes(
          TextStats.tokens(col("text")), shingleSize).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("id"), size(col("hs")).cast("long").as("n"),
        explode(col("hs")).as("g"))
    e.alias("a")
      .join(e.alias("b"),
        col("a.g") === col("b.g") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("din"), col("b.id").as("dout"),
        col("a.n").as("nin"), col("b.n").as("nout"))
      .agg(count(lit(1)).as("i"))
      .where(col("i") * 100 >= col("nin") * pct)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(2),
        r.getLong(3), 1000000L * r.getLong(4) / r.getLong(2)))
      .toSet
  }

  private def containmentResult(df: DataFrame)
      : Set[(Long, Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("containment: quote inside a longer doc found in ONE direction only") {
    val docs = Seq(
      (0L, "a b c d e"),                          // 3 shingles, all in 1
      (1L, "x y a b c d e p q r s t u v w"),      // long container
      (2L, "m n o m n o m n o")                   // unrelated
    ).toDF("doc_id", "text")
    val out = containmentResult(SetSimilarity.containmentJoin(docs, thresholdPct = 80))
    // 0's 3 shingles all appear in 1 → containment 100% of doc 0;
    // the reverse direction is 3/13 and must be absent
    assert(out.exists { case (d, c, i, nd, _, ppm) =>
      d == 0L && c == 1L && i == 3L && nd == 3L && ppm == 1000000L })
    assert(!out.exists { case (d, c, _, _, _, _) => d == 1L && c == 0L })
    assert(out === bruteForceContainment(docs, 80, 3))
  }

  test("containment: identical docs contain each other (both directions)") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e"),
      (7L, "a b c d e")
    ).toDF("doc_id", "text")
    val out = containmentResult(SetSimilarity.containmentJoin(docs, thresholdPct = 100))
    assert(out === Set(
      (0L, 1L, 3L, 3L, 3L, 1000000L), (1L, 0L, 3L, 3L, 3L, 1000000L),
      (0L, 7L, 3L, 3L, 3L, 1000000L), (7L, 0L, 3L, 3L, 3L, 1000000L),
      (1L, 7L, 3L, 3L, 3L, 1000000L), (7L, 1L, 3L, 3L, 3L, 1000000L)))
  }

  test("containment: shingle-free docs (short/empty) absent from both roles") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e f g"),
      (2L, "one two"),   // < 3 tokens → no shingles
      (3L, "")
    ).toDF("doc_id", "text")
    val out = containmentResult(SetSimilarity.containmentJoin(docs, thresholdPct = 80))
    assert(!out.exists { case (d, c, _, _, _, _) =>
      d >= 2L || c >= 2L })
    // the real pair survives: 0's 3 shingles all inside 1's 5
    assert(out.exists { case (d, c, _, _, _, ppm) =>
      d == 0L && c == 1L && ppm == 1000000L })
  }

  test("containment prefix+size pruning loses nothing on a skewed corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("k", "v", "t", "s", "r", "w", "q", "b", "f", "g")
    val rows = (0L until 50L).map { i =>
      val n = 4 + rnd.nextInt(20)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((50L, "k v t s r"), (51L, "k v t s r w q b f g k v t s r"))
    val docs = rows.toDF("doc_id", "text")
    for (pct <- Seq(55, 80, 100)) {
      assert(containmentResult(SetSimilarity.containmentJoin(docs, thresholdPct = pct))
        === bruteForceContainment(docs, pct, 3), s"mismatch at pct=$pct")
    }
  }
}
