package graft.ops

import java.nio.file.Files

import graft.SparkSpec

class UrlIndexSpec extends SparkSpec {
  import spark.implicits._

  test("cross-dump gate matches through normalization; min-id collapse; idempotent append; exclude-shards replay") {
    val dir = Files.createTempDirectory("graft-url-index").toString
    val dump1 = Seq((1L, "HTTP://A.com/p"), (2L, "http://b.com/q"))
      .toDF("doc_id", "url")
    UrlIndex.build(dump1, dir, "dump1")
    val dump2 = Seq(
      (10L, "http://a.com/p#frag"), // dump1 fetched it (normalized match)
      (11L, "http://c.com/r"),      // fresh
      (12L, "HTTP://C.com/r"),      // same page as 11 → min id 11 kept
      (13L, "http://d.com/s")       // fresh
    ).toDF("doc_id", "url")
    val fresh = UrlIndex.dedupAgainst(dump2, dir)
    assert(fresh.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(11L, 13L))
    // survivors join the index; a REPLAYED append of the same shard id
    // leaves the index byte-identical (the retry contract)
    UrlIndex.append(fresh, dir, "dump2")
    val before = UrlIndex.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    UrlIndex.append(fresh, dir, "dump2")
    val after = UrlIndex.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(after === before)
    assert(before.map(_._1).toSet === Set("http://a.com/p", "http://b.com/q",
      "http://c.com/r", "http://d.com/s"))
    // dump 3 is gated by BOTH earlier dumps...
    val dump3 = Seq((20L, "http://c.com/r"), (21L, "http://e.com/t"))
      .toDF("doc_id", "url")
    assert(UrlIndex.dedupAgainst(dump3, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(21L))
    // ...and excludeShards re-creates the pre-dump2 state (backfill)
    assert(UrlIndex.dedupAgainst(dump3, dir, excludeShards = Seq("dump2"))
      .select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(20L, 21L))
  }

  test("dedupAgainst executes the normalize + anti-join subtree exactly once") {
    // r17 verdict #2: the groupBy(min) + left_semi formulation
    // referenced the anti-join output twice — one anti-join execution
    // per dump is the contract (at one-scan-per-dump economics the
    // re-execution doubled the gate's corpus cost). Guard: exactly one
    // anti join and one index scan in the executed plan.
    val dir = Files.createTempDirectory("graft-url-index-plan").toString
    UrlIndex.build(Seq((1L, "http://a.com/p")).toDF("doc_id", "url"),
      dir, "dump1")
    val dump2 = Seq((10L, "http://a.com/p"), (11L, "http://c.com/r"),
      (12L, "http://c.com/r")).toDF("doc_id", "url")
    val fresh = UrlIndex.dedupAgainst(dump2, dir)
    fresh.write.format("noop").mode("overwrite").save()
    val plan = fresh.queryExecution.executedPlan.toString
    val antiJoins = "LeftAnti".r.findAllIn(plan).size
    assert(antiJoins == 1, s"expected 1 anti join, got $antiJoins:\n$plan")
    val idxScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("url-index"))
    assert(idxScans == 1, s"expected 1 index scan, got $idxScans:\n$plan")
  }
}
