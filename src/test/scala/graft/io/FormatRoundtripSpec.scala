package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ORC and JSON-lines roundtrips against the parquet source of truth:
  * same rows, same values, and (for ORC) scan-level predicate pushdown
  * preserved. */
class FormatRoundtripSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet

  test("orc write/read roundtrip preserves rows and values") {
    val dir = Files.createTempDirectory("orc").toString + "/docs"
    Io.writeOrc(docs, dir)
    val back = Io.readOrc(spark, dir)
    assert(asSet(back) === asSet(docs))
  }

  test("orc scan pushes filters like parquet") {
    val dir = Files.createTempDirectory("orc").toString + "/docs"
    Io.writeOrc(docs, dir)
    val q = Io.readOrc(spark, dir).where(col("lang") === "en").select("doc_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("lang"), scan)
    assert(q.count() === docs.where(col("lang") === "en").count())
  }

  test("jsonl write/read roundtrip with explicit schema (no inference pass)") {
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    Io.writeJsonl(docs, dir)
    val back = Io.readJsonl(spark, dir, docs.schema)
    assert(back.schema === docs.schema)
    assert(asSet(back) === asSet(docs))
  }
}
