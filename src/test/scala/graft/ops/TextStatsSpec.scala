package graft.ops

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("standalone column helpers agree with the fused statsFor pass") {
    import org.apache.spark.sql.functions.{col, round}
    // the standalone per-column API (qualityScore / langIdHeuristic /
    // meanTokenLen) must compute the same values as the token_stats
    // expression statsFor fuses them into — drift here means a library
    // user's ad-hoc score disagrees with the verified q15 output
    val docs = Seq(
      (0L, ("the cat and the dog is " * 10) + "sleeping quietly."),
      (1L, "le chat et la vie est belle"),
      (2L, "der hund und die katze ist hier"),
      (3L, "zzz qqq"),     // no markers → und
      (4L, ""),             // empty: 0 tokens, quality from zero lengths
      (5L, "el y la es " * 40)
    ).toDF("doc_id", "text")
    val fused = TextStats.statsFor(docs)
      .select("doc_id", "quality_score", "lang_pred", "mean_token_len")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getString(2), r.getDouble(3)))).toMap
    val standalone = docs.select(col("doc_id"),
        TextStats.qualityScore(col("text")).as("q"),
        TextStats.langIdHeuristic(col("text")).as("l"),
        round(TextStats.meanTokenLen(col("text")), 4).as("m"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getString(2), r.getDouble(3)))).toMap
    assert(standalone === fused)
    assert(fused(1L)._2 === "fr" && fused(2L)._2 === "de" &&
      fused(3L)._2 === "und" && fused(5L)._2 === "es")
  }

  test("vocabulary: counts, doc frequency, tie-broken top-k") {
    val docs = Seq(
      (0L, "b a a"),
      (1L, "a b c"),
      (2L, "c c c z")
    ).toDF("doc_id", "text")
    val top = TextStats.vocabulary(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: 3 occurrences in 2 docs; c: 4 in 2; b: 2 in 2; z: 1 in 1.
    // order: count desc, then term asc — k=3 drops z
    assert(top.toSeq === Seq(("c", 4L, 2L), ("a", 3L, 2L), ("b", 2L, 2L)))
  }

  test("vocabulary: empty docs contribute nothing; k bounds the output") {
    val docs = Seq((0L, ""), (1L, "  "), (2L, "only term")).toDF("doc_id", "text")
    val top = TextStats.vocabulary(docs, k = 10).collect()
    assert(top.map(_.getString(0)).toSet === Set("only", "term"))
  }

  test("cooccurrence counts docs per pair; vocab pruning excludes rare terms") {
    val docs = Seq(
      (1L, "alpha beta alpha"),     // repeats collapse: one (alpha,beta) doc
      (2L, "alpha beta gamma"),
      (3L, "beta gamma"),
      (4L, "alpha rare")            // "rare": 1 occurrence — outside top-3
    ).toDF("doc_id", "text")
    val got = TextStats.cooccurrence(docs, vocabK = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("alpha", "beta") -> 2L, ("alpha", "gamma") -> 1L, ("beta", "gamma") -> 2L))
  }

  test("cooccurrence top-pairs cut is deterministic") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // three pairs, all count 1 — topPairs=2 keeps the lexicographic first
    val got = TextStats.cooccurrence(docs, vocabK = 3, topPairs = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("a", "c")))
  }

  test("diversityBySource: hand-computed vocabulary and TTR per source") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b", "s1"),     // tokens 4, distinct {a,b}, bigrams {a b, b a}
      (1L, "a c", "s1"),         // adds c and {a c}
      (2L, "x", "s2"),           // single token → no bigrams
      (3L, "", "s3")             // empty doc → zeros
    ).toDF("doc_id", "text", "source")
    val got = TextStats.diversityBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // s1: 2 docs, 6 tokens, distinct {a,b,c}=3, bigrams {a b, b a, a c}=3
    assert(got("s1") === ((2L, 6L, 3L, 3L, 0.5)))
    assert(got("s2") === ((1L, 1L, 1L, 0L, 1.0)))
    assert(got("s3") === ((1L, 0L, 0L, 0L, 0.0)))
  }
}
