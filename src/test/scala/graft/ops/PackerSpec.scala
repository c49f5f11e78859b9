package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackerSpec extends SparkSpec {
  import spark.implicits._

  test("single group: bins follow the exclusive running token count") {
    // 10 docs x 100 tokens each, capacity 256: offsets 0,100,...,900 ->
    // bins 0,0,0,1,1,1,2,2,3,3
    val docs = (0L until 10L)
      .map(i => (i, Seq.fill(100)("w").mkString(" "))).toDF("doc_id", "text")
    val packed = Packer.packSequences(docs, capacityTokens = 256, numGroups = 1)
      .orderBy("doc_id").collect()
    assert(packed.map(_.getAs[Long]("bin_offset")).toSeq === (0L until 10L).map(_ * 100))
    assert(packed.map(_.getAs[Long]("bin_id")).toSeq ===
      Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 3L, 3L))
    assert(packed.forall(_.getAs[Long]("n_tokens") == 100L))
  }

  test("groups partition the corpus deterministically and pack independently") {
    val docs = (0L until 50L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val p1 = Packer.packSequences(docs, capacityTokens = 6, numGroups = 4)
    val p2 = Packer.packSequences(docs, capacityTokens = 6, numGroups = 4)
    assert(p1.collect().toSet === p2.collect().toSet)        // deterministic
    assert(p1.select("doc_id").distinct().count() === 50)    // total function
    // within every group, offsets are the cumsum of n_tokens in id order
    p1.orderBy("pack_group", "doc_id").collect()
      .groupBy(_.getAs[Long]("pack_group")).foreach { case (_, rows) =>
        var expect = 0L
        rows.foreach { r =>
          assert(r.getAs[Long]("bin_offset") === expect)
          expect += r.getAs[Long]("n_tokens")
        }
      }
  }
}
