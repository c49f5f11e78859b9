package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window token chunking: split each document into fixed-size
  * token windows with a stride (overlap = chunkTokens − stride) — the
  * sample-preparation step that turns a curated corpus into training
  * rows.
  *
  * Chunk starts sit at 0, stride, 2·stride, …; the last window is
  * included (possibly short) so every token lands in ≥1 chunk:
  * n_chunks = ⌈max(n − chunkTokens, 0) / stride⌉ + 1 for non-empty
  * docs, 0 for empty ones.
  *
  * Scale: pure per-row generation — tokenize, build the window index
  * array, explode, slice. No shuffle at all; the operator is a
  * scan-local Generate whose fan-out (≈ n/stride rows per doc) is the
  * intended output size. Built entirely from Spark HOFs
  * (sequence/transform/slice/array_join), no custom expression needed —
  * the per-row cost is linear in document length. */
object Chunker {

  def slidingWindows(docs: DataFrame, textCol: String = "text",
                     chunkTokens: Int = 50, stride: Int = 40): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    require(stride <= chunkTokens,
      s"stride ($stride) > chunkTokens ($chunkTokens) would leave tokens " +
        "uncovered and emit empty trailing windows")
    val toks: Column = TextStats.tokens(col(textCol))
    val n = size(toks)
    val nChunks = (ceil(greatest(n - chunkTokens, lit(0)).cast("double") / stride) + 1)
      .cast("int")
    docs
      .select(col("doc_id"), toks.as("toks"),
        when(n > 0, sequence(lit(0), nChunks - 1)).otherwise(array()).as("idx"))
      .select(col("doc_id"), col("toks"), explode(col("idx")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("chunk_id") * stride + 1, lit(chunkTokens)).as("w"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("w")).cast("long").as("n_tokens"),
        array_join(col("w"), " ").as("chunk_text"))
  }
}
