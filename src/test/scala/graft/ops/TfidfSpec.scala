package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  // N=3, tot_tokens=9, avgdl=3; df: a→2, b→1, c→2, d→1
  private lazy val docs = Seq(
    (0L, "a a b"),
    (1L, "a c"),
    (2L, "c c c d")
  ).toDF("doc_id", "text")

  private def tfidf(tf: Long, df: Long, n: Long = 3): Double =
    BigDecimal(tf * (math.log((n + 1.0) / (df + 1.0)) + 1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tfidf and rank match the hand formula; ties break on term") {
    val out = Tfidf.topTerms(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(6))).toMap

    // doc 0: a(tf2,df2) ranks above b(tf1,df1)
    assert(out((0L, "a")) === ((2L, 2L, tfidf(2, 2), 1L)))
    assert(out((0L, "b")) === ((1L, 1L, tfidf(1, 1), 2L)))
    // doc 1: a and c tie exactly (tf1, df2) → term asc breaks it
    assert(out((1L, "a"))._4 === 1L)
    assert(out((1L, "c"))._4 === 2L)
    // doc 2: rare d(tf1,df1) vs common c(tf3,df2): tf dominates here
    assert(out((2L, "c"))._4 === 1L)
    assert(out((2L, "d"))._4 === 2L)
  }

  test("bm25 favors the rarer term at equal tf and is positive for rare terms") {
    val out = Tfidf.topTerms(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // doc 0: b (df1) must outscore a's per-occurrence value — compare
    // directly: idf component is larger for rarer terms
    assert(out((0L, "b")) > 0)
    assert(out((2L, "d")) > 0)
    // equal tf within one doc (same length normalization): rarer wins
    assert(out((1L, "a")) === out((1L, "c")))  // same df → same score
  }

  test("k truncates per document") {
    val one = Tfidf.topTerms(docs, k = 1)
    assert(one.count() === 3)
    assert(one.where(col("rnk") > 1).count() === 0)
  }
}
