package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring: each document gets the
  * average negative log-probability of its tokens under the corpus's own
  * unigram distribution — the classic cheap "perplexity" quality signal
  * for training-data pipelines (fluent/in-distribution text scores low,
  * gibberish and off-distribution text scores high).
  *
  * Scale shape (one corpus scan, Tfidf-style):
  *  - explode(tokens) → one (doc_id, tok) aggregation = term frequencies;
  *    the corpus-wide token counts AND the corpus total both derive from
  *    that single shuffled relation, so ReuseExchange serves them from
  *    one materialization;
  *  - token counts are vocabulary-sized → broadcast back to the tf
  *    relation; the corpus total rides a 1-row broadcast cross join;
  *  - per-doc reduce reuses the (doc_id, tok) partitioning — map-side
  *    partial aggregation, no extra wide shuffle.
  *
  * Cross-engine determinism: floating-point sums are order-dependent, so
  * the per-token score is fixed to integer micro-nats FIRST —
  * round((ln(total) − ln(cnt)) · 1e6) — and all aggregation is exact
  * BIGINT arithmetic; the per-doc average is an integer `div`. A last-ulp
  * ln() difference between engines would need to land exactly on a
  * 0.5-micro-nat boundary to flip a value.
  */
object LangModel {

  /** Output: (doc_id, n_tokens, avg_nlp_micros) — avg_nlp_micros is the
    * mean per-token negative log-probability in micro-nats (floor of the
    * exact integer ratio). Empty documents have no tokens and are absent,
    * as in every other token-derived relation here. */
  def unigramScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("tok"))
      .where(col("tok").isNotNull)
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // both corpus statistics fold the SAME tf exchange (see Tfidf: the
    // always-true guard keeps the counts subtree canonically identical
    // so ReuseExchange fires instead of re-scanning the corpus)
    val counts = tf.where(col("tf") > 0).groupBy("tok")
      .agg(sum("tf").cast("long").as("cnt"))
    val total = tf.agg(sum("tf").cast("long").as("total_tokens"))
    tf.join(broadcast(counts), "tok")
      .crossJoin(broadcast(total))
      .withColumn("nlp_micros",
        round((log(col("total_tokens").cast("double")) -
          log(col("cnt").cast("double"))) * 1e6).cast("long"))
      .groupBy(col(idCol))
      .agg(sum("tf").cast("long").as("n_tokens"),
        sum(col("nlp_micros") * col("tf")).cast("long").as("sum_micros"))
      .select(col(idCol), col("n_tokens"),
        expr("sum_micros div n_tokens").as("avg_nlp_micros"))
  }

  /** Bigram LM counting — the training side of an n-gram language model:
    * the k most frequent bigrams with their count, their left-context
    * count, and the conditional log-probability
    * ln P(w2|w1) = ln c(w1,w2) − ln Σ_w2' c(w1,w2') in integer
    * micro-nats (same determinism contract as [[unigramScore]]). Ranked
    * by count desc, then (w1, w2) — a total order, so top-k is
    * engine-stable.
    *
    * Scale shape: bigram extraction is a scan-local generate (no
    * distinct — LM counts need the multiset, unlike Jaccard shingles);
    * one digest-keyed shuffle aggregates (w1, w2); the denominator
    * Σ_w2' c(w1,w2') re-aggregates that already-reduced relation (rows ∝
    * distinct bigrams, not corpus tokens) and broadcasts back; top-k is
    * a bounded TakeOrdered, never a global sort. */
  def bigramCounts(docs: DataFrame, k: Int = 50,
                   textCol: String = "text"): DataFrame = {
    val bg = docs
      .select(TextStats.tokens(col(textCol)).as("ts"))
      .where(size(col("ts")) >= 2)   // sequence(0, -1) would run backwards
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
      .where(col("w1").isNotNull && col("w2").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val left = bg.groupBy("w1").agg(sum("c2").cast("long").as("c1"))
    bg.join(broadcast(left), "w1")
      .select(col("w1"), col("w2"), col("c2").cast("long").as("c2"), col("c1"),
        round((log(col("c2").cast("double")) - log(col("c1").cast("double"))) * 1e6)
          .cast("long").as("logp_micros"))
      .orderBy(col("c2").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
