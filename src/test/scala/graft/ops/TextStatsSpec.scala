package graft.ops

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

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
}
