package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 10000L).toDF("id")

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(ids, col("id"), 250000L)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(7), col("id"), 250000L)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("hashSample rate is accurate and monotone in ppm") {
    val quarter = Sampling.hashSample(ids, col("id"), 250000L)
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(quarter.size - 2500) < 200, s"got ${quarter.size}")
    // a lower rate with the same salt selects a subset (same hash order)
    val tenth = Sampling.hashSample(ids, col("id"), 100000L)
      .collect().map(_.getLong(0)).toSet
    assert(tenth.subsetOf(quarter))
    assert(Sampling.hashSample(ids, col("id"), 0L).count() === 0)
    assert(Sampling.hashSample(ids, col("id"), 1000000L).count() === 10000)
  }

  test("different salts draw independent samples") {
    val a = Sampling.hashSample(ids, col("id"), 300000L, salt = "a")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, col("id"), 300000L, salt = "b")
      .collect().map(_.getLong(0)).toSet
    val overlap = (a & b).size.toDouble / 10000
    // independent 30% draws overlap ~9%; allow wide tolerance
    assert(overlap > 0.04 && overlap < 0.16, s"overlap $overlap")
  }

  test("stratifiedSample applies per-stratum and default rates") {
    val rows = (0L until 6000L).map(i =>
      (i, Seq("keep", "half", "other")((i % 3).toInt))).toDF("id", "grp")
    val sampled = Sampling.stratifiedSample(rows, col("grp"), col("id"),
        Map("keep" -> 1000000L, "half" -> 500000L), defaultPpm = 0L)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled("keep") === 2000L)
    assert(math.abs(sampled("half") - 1000L) < 120, s"got ${sampled.get("half")}")
    assert(!sampled.contains("other"))
  }

  test("capPerKey keeps at most N per key, deterministically, as a row subset") {
    val df = (0L until 90L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
      .union(Seq((1000L, "rare")).toDF("id", "key"))
    val capped = Sampling.capPerKey(df, col("key"), col("id"), maxPerKey = 5)
    val byKey = capped.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey === Map("k0" -> 5L, "k1" -> 5L, "k2" -> 5L, "rare" -> 1L))
    // deterministic draw, and a strict subset of the input rows
    val again = Sampling.capPerKey(df, col("key"), col("id"), maxPerKey = 5)
    assert(capped.collect().toSet === again.collect().toSet)
    assert(capped.join(df, Seq("id", "key"), "left_anti").isEmpty)
    // the draw is hash-ordered, not id-ordered: not simply the lowest ids
    val k0 = capped.where(col("key") === "k0").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(k0 !== (0L until 15L by 3).take(5).toSet)
  }

  test("shuffleShards: partition of the corpus, dense per-shard positions, deterministic, salt-sensitive") {
    val df = (0L until 500L).toDF("doc_id")
    val sh = Sampling.shuffleShards(df, col("doc_id"), numShards = 8).cache()
    // every row lands in exactly one shard, schema intact
    assert(sh.count() === 500)
    assert(sh.select("doc_id").distinct().count() === 500)
    // positions are 1..count(shard), dense, within each shard
    val byShard = sh.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(byShard.length === 8)  // 500 hashed rows touch all 8 shards
    byShard.foreach { r =>
      assert(r.getAs[Long]("lo") === 1L && r.getAs[Long]("hi") === r.getAs[Long]("n"))
    }
    // reruns identical; a different salt is a genuinely different order
    val again = Sampling.shuffleShards(df, col("doc_id"), 8)
    assert(sh.collect().toSet === again.collect().toSet)
    val other = Sampling.shuffleShards(df, col("doc_id"), 8, salt = "epoch2")
    assert(sh.collect().toSet !== other.collect().toSet)
    // the order is not the id order within any shard
    val firstShard = sh.where(col("shard") === 0).orderBy("pos")
      .select("doc_id").collect().map(_.getLong(0))
    assert(!firstShard.sameElements(firstShard.sorted))
  }

  test("splitByHash: disjoint, exhaustive, deterministic, append-stable") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val s = Sampling.splitByHash(df, col("id"), 800000L, 100000L)
    // every row gets exactly one split; rates land near 80/10/10
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1500 && counts("val") > 100 && counts("test") > 100)
    // membership is a pure function of the id: a grown corpus preserves
    // every old assignment (nothing migrates between splits)
    val grown = Sampling.splitByHash((0L until 4000L).toDF("id"), col("id"),
      800000L, 100000L)
    val before = s.as[(Long, String)].collect().toMap
    val after = grown.as[(Long, String)].collect().toMap
    assert(before.forall { case (id, sp) => after(id) == sp })
    // split boundary arithmetic matches hashBucket directly
    val b = df.select(col("id"),
      Sampling.hashBucket(col("id"), "split").as("b"))
      .as[(Long, Long)].collect().toMap
    before.foreach { case (id, sp) =>
      val expect = if (b(id) < 800000) "train"
        else if (b(id) < 900000) "val" else "test"
      assert(sp === expect, s"id $id bucket ${b(id)}")
    }
  }

  test("weightedSample matches the A-ES key computed independently from hashBucket") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, 1L + i % 37)).toDF("id", "w")
    val picked = Sampling.weightedSample(df, col("w"), col("id"), 25)
      .as[(Long, Long)].collect().map(_._1).toSet
    // recompute the priority locally from the same hash buckets
    val buckets = df.select(col("id"),
      Sampling.hashBucket(col("id"), "wsamp").as("b"))
      .as[(Long, Long)].collect().toMap
    val expected = (0L until 500L).map { i =>
      val w = 1L + i % 37
      val uPpm = buckets(i) + 1
      val nlnu = math.round((math.log(1e6) - math.log(uPpm.toDouble)) * 1e6)
      (nlnu * 1000000L / w, i)
    }.sorted.take(25).map(_._2).toSet
    assert(picked === expected)
  }

  test("weightedSample favors heavy rows and excludes non-positive weights") {
    import spark.implicits._
    val df = ((0L until 200L).map(i => (i, 1L)) ++
      Seq((200L, 1000000000L), (201L, 0L), (202L, -5L))).toDF("id", "w")
    val picked = Sampling.weightedSample(df, col("w"), col("id"), 5)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(picked.contains(200L))      // ~1e9:1 odds: always sampled
    assert(!picked.contains(201L) && !picked.contains(202L))
  }

  test("weightedSamplePerStratum: bounded per stratum, rank-contiguous, partition-invariant") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"s${i % 3}", 1L + i % 11))
      .toDF("id", "st", "w")
    val out = Sampling.weightedSamplePerStratum(
      df.repartition(7), col("st"), col("w"), col("id"), 10)
    val rows = out.select("id", "st", "sample_rank")
      .as[(Long, String, Int)].collect()
    val perStratum = rows.groupBy(_._2)
    assert(perStratum.keySet === Set("s0", "s1", "s2"))
    perStratum.values.foreach { g =>
      assert(g.length === 10)
      assert(g.map(_._3).sorted.toSeq === (1 to 10))
    }
    // identical draw under a different partitioning
    val again = Sampling.weightedSamplePerStratum(
      df.repartition(2), col("st"), col("w"), col("id"), 10)
      .select("id", "st", "sample_rank")
      .as[(Long, String, Int)].collect()
    assert(rows.toSet === again.toSet)
  }
}
