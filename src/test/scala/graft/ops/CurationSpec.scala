package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation drops exact dups, near-dups, and low-quality docs") {
    val good = "the data engine reads the table and runs the query " * 5
    val docs = Seq(
      (0L, good),                                   // keeper
      (1L, good),                                   // exact dup → dropped
      (2L, good + "with one extra tail phrase ok"), // near-dup → dropped
      (3L, "short"),                                // low quality → dropped
      (4L, "another perfectly reasonable document about the engine " +
           "and the storage layer of the big table system " * 4)
    ).toDF("doc_id", "text")
    val out = Curation.curate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(0L, 4L))
  }
}
