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
}
