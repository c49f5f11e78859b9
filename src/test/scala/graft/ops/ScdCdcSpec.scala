package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdCdcSpec extends SparkSpec {
  import spark.implicits._

  private val d = java.sql.Date.valueOf(_: String)

  private def dim(rows: (Int, String, String, String, Boolean)*) =
    rows.toDF("k", "seg", "from_s", "to_s", "is_current")
      .select(col("k"), col("seg"),
        to_date(col("from_s")).as("effective_from"),
        to_date(col("to_s")).as("effective_to"),
        col("is_current"))

  test("scd2Merge versions changed keys, passes through unchanged and closed rows") {
    val current = dim(
      (1, "A", "1992-01-01", null, true),          // will change → close + insert
      (2, "B", "1992-01-01", null, true),          // no-op update → untouched
      (3, "C", "1992-01-01", null, true),          // absent from batch → untouched
      (1, "Z", "1990-01-01", "1992-01-01", false)) // closed history → untouched
    val updates = Seq((1, "A2"), (2, "B"), (9, "NEW")).toDF("k", "seg")
    val out = Scd.scd2Merge(current, updates, "k", Seq("seg"),
      lit("1995-06-01").cast("date"))
      .select("k", "seg", "effective_from", "effective_to", "is_current")
      .as[(Int, String, java.sql.Date, java.sql.Date, Boolean)]
      .collect().toSet
    assert(out === Set(
      (1, "Z", d("1990-01-01"), d("1992-01-01"), false),   // history kept
      (1, "A", d("1992-01-01"), d("1995-06-01"), false),   // closed now
      (1, "A2", d("1995-06-01"), null, true),              // new version
      (2, "B", d("1992-01-01"), null, true),               // no-op kept open
      (3, "C", d("1992-01-01"), null, true),               // untouched
      (9, "NEW", d("1995-06-01"), null, true)))            // brand-new key
  }

  test("scd2Merge null-safe change detection: null→value and value→null both version") {
    val current = dim(
      (1, null, "1992-01-01", null, true),
      (2, "X", "1992-01-01", null, true))
    val updates = Seq((1, Some("V")), (2, None)).map { case (k, s) => (k, s.orNull) }
      .toDF("k", "seg")
    val out = Scd.scd2Merge(current, updates, "k", Seq("seg"),
      lit("1995-06-01").cast("date"))
    assert(out.where(col("is_current")).count() === 2)
    assert(out.where(!col("is_current")).count() === 2)
    // both open rows carry the batch values
    val open = out.where(col("is_current"))
      .select("k", "seg").as[(Int, Option[String])].collect().toSet
    assert(open === Set((1, Some("V")), (2, None)))
  }

  test("applyChangelog keeps the latest upsert per key and drops deleted keys") {
    val log = Seq(
      (1, 10L, "U", "v1"), (1, 20L, "U", "v2"),  // key 1 → v2
      (2, 10L, "U", "v1"), (2, 30L, "D", ""),    // key 2 → deleted
      (3, 5L, "D", ""), (3, 7L, "U", "back"),    // key 3 → re-inserted after delete
      (4, 9L, "U", "only")                       // key 4 → single upsert
    ).toDF("k", "seq", "op", "payload")
    val out = Cdc.applyChangelog(log, Seq("k"), col("seq"), col("op"))
      .select("k", "payload").as[(Int, String)].collect().toSet
    assert(out === Set((1, "v2"), (3, "back"), (4, "only")))
  }

  test("applyChangelog same-sequence delete+upsert resolves deterministically (op desc → upsert wins)") {
    val log = Seq((1, 10L, "D", ""), (1, 10L, "U", "tie"))
      .toDF("k", "seq", "op", "payload")
    val out = Cdc.applyChangelog(log, Seq("k"), col("seq"), col("op"))
      .select("k", "payload").as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "tie")))
  }
}
