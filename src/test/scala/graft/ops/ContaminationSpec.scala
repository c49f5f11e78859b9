package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 100 has bigrams {a b, b c, c d}
  private lazy val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    (0L, "a b c d"),          // identical → contamination 1.0
    (1L, "x y z w q"),        // disjoint → 0.0
    (2L, "a b c x y"),        // bigrams {a b, b c, c x, x y}: 2/4 hit
    (3L, "a")                 // no bigrams → excluded
  ).toDF("doc_id", "text")

  test("contamination score is the contaminated-shingle fraction") {
    val out = Contamination.score(corpus, bench, shingleSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) === ((3L, 3L, 1.0)))
    assert(out(1L) === ((4L, 0L, 0.0)))
    assert(out(2L) === ((4L, 2L, 0.5)))
  }

  test("empty benchmark yields zero contamination everywhere") {
    val out = Contamination.score(corpus, bench.where(lit(false)), shingleSize = 2)
    assert(out.where(col("n_contaminated") =!= 0).count() === 0)
    assert(out.count() === 3)
  }

  test("bloom-gated decontamination equals the exact hit-list") {
    val got = Contamination.bloomDecontaminate(corpus, bench, shingleSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 2L -> 2L)) // only true hits, true counts
  }

  test("bloom-gated decontamination survives an aggressive fpp (verify join stays exact)") {
    // fpp = 0.5 floods the candidate set with false positives; the
    // verify join must still produce exactly the true hit-list
    val got = Contamination.bloomDecontaminate(corpus, bench,
        shingleSize = 2, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 2L -> 2L))
  }

  test("sourceOverlap counts shared shingles and Jaccard per source pair") {
    import spark.implicits._
    // srcA: {a b, b c}; srcB: {b c, c d}; srcC: {x y} (no overlap)
    val docs = Seq(
      (0L, "a b c", "srcA"),
      (1L, "b c d", "srcB"),
      (2L, "x y", "srcC")).toDF("doc_id", "text", "source")
    val out = Contamination.sourceOverlap(docs, shingleSize = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // only the overlapping pair appears; sizes are distinct-hash counts
    assert(out.keySet === Set(("srcA", "srcB")))
    val (na, nb, shared, j) = out(("srcA", "srcB"))
    assert(na === 2L && nb === 2L && shared === 1L)   // shared = {b c}
    assert(math.abs(j - 1.0 / 3) < 1e-6)
    // duplicate docs within a source must not inflate the distinct sets
    val dup = docs.unionByName(Seq((3L, "a b c", "srcA"))
      .toDF("doc_id", "text", "source"))
    val out2 = Contamination.sourceOverlap(dup, shingleSize = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(out2(("srcA", "srcB")) === 1L)
  }
}
