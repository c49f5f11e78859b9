package graft.ops

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("sliding windows cover every token with the configured overlap") {
    val docs = Seq(
      (1L, "a b c d e f g"),   // 7 tokens, chunk 3 stride 2 → 3 chunks
      (2L, ""),                // empty → no chunks
      (3L, "x y")              // shorter than one chunk → single short chunk
    ).toDF("doc_id", "text")
    val out = Chunker.slidingWindows(docs, chunkTokens = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out === Map(
      (1L, 0L) -> ((3L, "a b c")),
      (1L, 1L) -> ((3L, "c d e")),
      (1L, 2L) -> ((3L, "e f g")),
      (3L, 0L) -> ((2L, "x y"))))
  }

  test("exact multiple of stride does not emit an empty trailing chunk") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")  // 4 tokens
    val out = Chunker.slidingWindows(docs, chunkTokens = 2, stride = 2)
      .collect().map(r => (r.getLong(1), r.getString(3)))
    assert(out.toSet === Set((0L, "a b"), (1L, "c d")))
  }
}
