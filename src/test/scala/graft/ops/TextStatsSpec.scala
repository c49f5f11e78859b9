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
}
