package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", §A1.1; same family as the C4 heuristics): a
  * document whose probability mass concentrates in few tokens or a
  * repeated phrase is boilerplate/spam, not prose, and gets filtered
  * before training.
  *
  * Signals per document:
  *  - `top_token_frac`  — most frequent token's share of all tokens;
  *  - `top_bigram_frac` — most frequent word bigram's share of all
  *    bigrams (null when the doc has < 2 tokens);
  *  - `token_entropy`   — Shannon entropy (nats) of the token
  *    distribution: H = ln(N) − Σ c·ln(c) / N;
  *  - `repetition_pass` — both fraction thresholds hold.
  *
  * Scale: two partial-aggregating shuffles keyed by (doc_id, term) —
  * digest-uniform in doc_id, bounded per-key cardinality — then a
  * per-doc join; no per-row state, no collect. */
object QualityFilters {

  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      maxTokenFrac: Double = 0.14,
                      maxBigramFrac: Double = 0.07): DataFrame = {
    val base = docs
      .select(col("doc_id"), TextStats.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
    val uni = base.select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("max_tok"), sum("c").as("n_toks"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc"))
    val bi = base.where(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))
          .as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("max_bigram"), sum("c").as("n_bigrams"))
    uni.join(bi, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        round(col("max_tok") / col("n_toks"), 4).as("top_token_frac"),
        round(col("max_bigram") / col("n_bigrams"), 4).as("top_bigram_frac"),
        round(log(col("n_toks").cast("double")) - col("clogc") / col("n_toks"), 4)
          .as("token_entropy"),
        (col("max_tok") / col("n_toks") <= maxTokenFrac &&
          coalesce(col("max_bigram") / col("n_bigrams") <= maxBigramFrac, lit(true)))
          .as("repetition_pass"))
  }
}
