package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spam spam spam spam spam spam spam ham"),   // one token dominates
    // all-distinct prose, long enough that even uniform bigrams sit
    // under the 0.07 bigram-mass threshold (1/18 ≈ 0.056)
    (1L, "the quick brown fox jumps over a lazy dog while two old cats watch from their warm sunny porch"),
    (2L, "ab cd ab cd ab cd ab cd"),                  // one bigram dominates
    (3L, "solo"),                                     // single token: no bigrams
    (4L, "")                                          // empty: excluded entirely
  ).toDF("doc_id", "text")

  private lazy val stats = QualityFilters.repetitionStats(docs).cache()

  private def row(id: Long) = stats.where(col("doc_id") === id).head()

  test("top-token fraction flags the dominated doc; distinct prose passes") {
    val spam = row(0)
    assert(spam.getAs[Double]("top_token_frac") === 7.0 / 8)
    assert(!spam.getAs[Boolean]("repetition_pass"))
    val prose = row(1)
    assert(prose.getAs[Double]("top_token_frac") === math.rint(1.0 / 19 * 1e4) / 1e4)
    assert(prose.getAs[Boolean]("repetition_pass"))
  }

  test("top-bigram fraction catches phrase repetition the unigram view misses") {
    val r = row(2)
    // tokens alternate ab/cd (each 1/2 — fails token gate too), and the
    // bigram 'ab cd' owns 4 of 7 bigrams
    assert(r.getAs[Double]("top_bigram_frac") === math.rint(4.0 / 7 * 1e4) / 1e4)
    assert(!r.getAs[Boolean]("repetition_pass"))
  }

  test("single-token doc: null bigram frac, entropy 0, fails on token mass") {
    val r = row(3)
    assert(r.isNullAt(r.fieldIndex("top_bigram_frac")))
    assert(r.getAs[Double]("token_entropy") === 0.0)
    assert(!r.getAs[Boolean]("repetition_pass"))   // top_token_frac = 1.0
  }

  test("relative quality gate keeps per-language upper half, not an absolute bar") {
    // en docs: longer prose scores 0.7+ (length band + stopwords), the
    // short fragments score lower; the gate must keep the top of EACH
    // language even though all 'und' scores sit below the en median
    val corpus = Seq(
      (0L, "the " + Seq.fill(40)("word of the day is this and that").mkString(" ")),
      (1L, "the cat is on the mat"),
      (2L, "und " + Seq.fill(40)("zzz qqq xxx").mkString(" ")),
      (3L, "zzz")
    ).toDF("doc_id", "text")
    val kept = QualityFilters.relativeQualityGate(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang_pred"), r.getAs[Double]("quality_score"))).toMap
    // every language keeps at least its best doc
    assert(kept.contains(0L))
    assert(kept.keySet.intersect(Set(2L, 3L)).nonEmpty)
    // kept rows satisfy their own language's cutoff by construction
    val all = TextStats.statsFor(corpus)
      .select("doc_id", "lang_pred", "quality_score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    all.groupBy(_._2).foreach { case (lang, rows) =>
      val kepts = rows.filter(r => kept.contains(r._1)).map(_._3)
      val dropped = rows.filterNot(r => kept.contains(r._1)).map(_._3)
      if (kepts.nonEmpty && dropped.nonEmpty)
        assert(kepts.min >= dropped.max, s"lang $lang gate not monotone")
    }
  }

  test("entropy of a uniform token distribution is ln(n); empty docs are excluded") {
    // doc 1: 19 distinct tokens once each -> H = ln(19)
    assert(math.abs(row(1).getAs[Double]("token_entropy") - math.log(19.0)) < 1e-3)
    assert(stats.where(col("doc_id") === 4).count() === 0)
  }

  test("curriculumBuckets: order-statistic cutoffs partition the corpus exactly") {
    import spark.implicits._
    // 100 docs with lengths 1..100 (text of i chars) → deciles of 10
    val docs = (1 to 100).map(i => (i.toLong, "x" * i)).toDF("doc_id", "text")
    val out = QualityFilters.curriculumBuckets(docs, nBuckets = 10)
      .orderBy("bucket").collect()
    assert(out.length === 10)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_docs") === 10L, s"bucket ${i + 1}")
      assert(r.getAs[Long]("min_chars") === i * 10 + 1L)
      assert(r.getAs[Long]("max_chars") === i * 10 + 10L)
    }
    // buckets are exhaustive and disjoint by construction
    assert(out.map(_.getAs[Long]("n_docs")).sum === 100L)
    // heavily tied lengths: every doc the same length → one bucket
    val tied = (1 to 50).map(i => (i.toLong, "y" * 20)).toDF("doc_id", "text")
    val one = QualityFilters.curriculumBuckets(tied, nBuckets = 10).collect()
    assert(one.length === 1 && one.head.getAs[Long]("n_docs") === 50L)
  }
}
