package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixerSpec extends SparkSpec {
  import spark.implicits._

  private def asSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

  test("two-phase bucket selection is bit-identical to the naive window") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (budget <- Seq(0L, 100L, 800L, 1000000L)) {
      val fast = asSet(Mixer.tokenBudgetMix(docs, budget))
      val naive = asSet(Mixer.tokenBudgetMixNaive(docs, budget))
      assert(fast === naive, s"budget $budget")
    }
  }

  test("per-source token totals respect the budget; huge budget keeps everything") {
    val docs = Seq(
      (0L, "a", "w x y z"), (1L, "a", "p q r"), (2L, "a", "m n"),
      (3L, "b", "one two three four five six"),
      (4L, "b", ""),                       // zero tokens — free to keep
      (5L, "c", "solo")
    ).toDF("doc_id", "source", "text")
    val kept = Mixer.tokenBudgetMix(docs, budget = 5L)
    val bySource = kept.groupBy("source").agg(sum("n_tokens").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.values.foreach(s => assert(s <= 5L))
    assert(asSet(kept) === asSet(Mixer.tokenBudgetMixNaive(docs, 5L)))
    assert(Mixer.tokenBudgetMix(docs, budget = 1000L).count() === 6)
  }
}
