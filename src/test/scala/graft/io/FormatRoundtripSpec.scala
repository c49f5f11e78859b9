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

  test("readParquetMerged reconciles schema versions; old files read new columns as null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString + "/t"
    // v1 files: (id, a); v2 adds column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(dir)
    Seq((3L, "z", 30L)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)
    val back = Io.readParquetMerged(spark, dir)
    assert(back.columns.sorted === Array("a", "b", "id"))
    val got = back.select("id", "b").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> None, 2L -> None, 3L -> Some(30L)))
  }

  test("readJsonlQuarantined routes malformed lines to the corrupt column, keeps clean rows") {
    val dir = Files.createTempDirectory("quar").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      ("""{"doc_id": 1, "text": "ok"}""" + "\n" +
       """{"doc_id": 2 "text": "missing comma"}""" + "\n" +
       """{"doc_id": 3, "text": "fine"}""" + "\n" +
       "truncated garbage not json").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val back = Io.readJsonlQuarantined(spark, s"$dir/part.jsonl", schema).cache()
    val clean = back.where(col("corrupt_record").isNull)
    val quarantine = back.where(col("corrupt_record").isNotNull)
    assert(clean.count() === 2)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    // both bad lines survive with their raw text for provenance
    assert(quarantine.count() === 2)
    val raw = quarantine.select("corrupt_record").collect().map(_.getString(0))
    assert(raw.exists(_.contains("missing comma")))
    assert(raw.exists(_.contains("truncated garbage")))
  }
}
