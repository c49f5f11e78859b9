package graft.ops

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("unigram scores match hand-computed micro-nats; empty docs absent") {
    // corpus: total 5 tokens; counts a=2, b=2, c=1
    // nlp(a) = nlp(b) = round(ln(5/2)·1e6) = 916291
    // nlp(c) = round(ln(5)·1e6)            = 1609438
    val docs = Seq((0L, "a a b"), (1L, "b c"), (2L, "")).toDF("doc_id", "text")
    val out = LangModel.unigramScore(docs).orderBy("doc_id").collect()
    assert(out.length === 2) // doc 2 has no tokens
    val d0 = out(0)
    assert(d0.getAs[Long]("n_tokens") === 3L)
    assert(d0.getAs[Long]("avg_nlp_micros") === 916291L) // (2·916291 + 916291) div 3
    val d1 = out(1)
    assert(d1.getAs[Long]("n_tokens") === 2L)
    assert(d1.getAs[Long]("avg_nlp_micros") === 1262864L) // (916291 + 1609438) div 2
  }

  test("rarer vocabulary scores strictly higher than common vocabulary") {
    val docs = (0L to 9L).map(i => (i, "common words here"))
      .:+((10L, "zxq unique tokens"))
      .toDF("doc_id", "text")
    val out = LangModel.unigramScore(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_nlp_micros")).toMap
    assert(out(10L) > out(0L))
    // the ten identical docs all score identically
    assert((0L to 9L).map(out).toSet.size === 1)
  }
}
