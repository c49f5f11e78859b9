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

  test("materializeTokenShards: straddling docs split at token level, hand-computed") {
    // one group; doc token streams in doc_id order:
    //   doc 0 -> [10, 11, 12], doc 1 -> [20, 21], doc 2 -> [30, 31, 32, 33]
    // concatenated: 10 11 12 20 | 21 30 31 32 | 33   at capacity 4:
    //   seq 0 = [10,11,12,20]  (doc 1 STRADDLES the boundary)
    //   seq 1 = [21,30,31,32]  (doc 2 straddles too)
    //   seq 2 = [33]           (partial remainder)
    val enc = Seq(
      (0L, Seq(10, 11, 12), 3L),
      (1L, Seq(20, 21), 2L),
      (2L, Seq(30, 31, 32, 33), 4L)
    ).toDF("doc_id", "token_ids", "n_tokens")
    val shards = Packer.materializeTokenShards(enc, capacityTokens = 4,
        numGroups = 1).orderBy("seq_id").collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getSeq[Int](2), r.getAs[Long]("n_tokens")))
    assert(shards.toSeq === Seq(
      (0L, Seq(10, 11, 12, 20), 4L),
      (1L, Seq(21, 30, 31, 32), 4L),
      (2L, Seq(33), 1L)))
    // dropRemainder keeps only full sequences
    val full = Packer.materializeTokenShards(enc, capacityTokens = 4,
      numGroups = 1, dropRemainder = true)
    assert(full.count() === 2 &&
      full.where(col("n_tokens") =!= 4L).count() === 0)
    // multi-group: every token lands exactly once, seq fill is exact
    val enc2 = (0L until 40L)
      .map(i => (i, (0 until 7).map(j => (i * 7 + j).toInt), 7L))
      .toDF("doc_id", "token_ids", "n_tokens")
    val s2 = Packer.materializeTokenShards(enc2, capacityTokens = 16,
      numGroups = 4)
    assert(s2.agg(sum("n_tokens")).head().getLong(0) === 280L)
    // within each group, all sequences except the last are full and
    // seq_ids are contiguous from 0
    s2.orderBy("pack_group", "seq_id").collect()
      .groupBy(_.getAs[Long]("pack_group")).foreach { case (_, rows) =>
        assert(rows.map(_.getAs[Long]("seq_id")).toSeq ===
          (0L until rows.length.toLong))
        rows.init.foreach(r => assert(r.getAs[Long]("n_tokens") === 16L))
      }
  }

  test("doc_spans: per-sequence document boundaries, hand-computed; straddles split across sequences") {
    // same fixture as the straddle test: concatenated stream
    //   10 11 12 20 | 21 30 31 32 | 33   at capacity 4, so
    //   seq 0: doc 0 -> [0,2], doc 1 -> [3,3]
    //   seq 1: doc 1 -> [0,0], doc 2 -> [1,3]
    //   seq 2: doc 2 -> [0,0]
    val enc = Seq(
      (0L, Seq(10, 11, 12), 3L),
      (1L, Seq(20, 21), 2L),
      (2L, Seq(30, 31, 32, 33), 4L)
    ).toDF("doc_id", "token_ids", "n_tokens")
    val out = Packer.materializeTokenShards(enc, capacityTokens = 4,
        numGroups = 1, docSpans = true)
      .orderBy("seq_id").collect()
      .map(r => r.getAs[Long]("seq_id") ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("doc_spans"))
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))))
    assert(out.toSeq === Seq(
      0L -> Seq((0L, 0L, 2L), (1L, 3L, 3L)),
      1L -> Seq((1L, 0L, 0L), (2L, 1L, 3L)),
      2L -> Seq((2L, 0L, 0L))))
    // spans tile each sequence exactly: starts ascend, consecutive
    // spans abut, and the union covers [0, n_tokens)
    val multi = (0L until 40L)
      .map(i => (i, (0 until 7).map(j => (i * 7 + j).toInt), 7L))
      .toDF("doc_id", "token_ids", "n_tokens")
    Packer.materializeTokenShards(multi, capacityTokens = 16,
        numGroups = 4, docSpans = true).collect().foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val spans = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("doc_spans"))
        .map(s => (s.getLong(1), s.getLong(2)))
      assert(spans.head._1 === 0L)
      assert(spans.last._2 === n - 1)
      spans.sliding(2).foreach {
        case Seq((_, e), (s2, _)) => assert(s2 === e + 1)
        case _ =>
      }
    }
    // default output schema is unchanged (no doc_spans column)
    assert(!Packer.materializeTokenShards(enc, capacityTokens = 4,
      numGroups = 1).columns.contains("doc_spans"))
  }

  test("token shard store: round-trips the shuffled sequences; manifest from read-back; params refusal") {
    val enc = (0L until 40L)
      .map(i => (i, (0 until 7).map(j => (i * 7 + j).toInt), 7L))
      .toDF("doc_id", "token_ids", "n_tokens")
    val dir = java.nio.file.Files.createTempDirectory("graft-shardstore").toString
    Packer.writeTokenShardStore(enc, dir, capacityTokens = 16,
      numGroups = 4, numShards = 3, seed = "e0")
    // read-back equals the in-memory pipeline, row for row
    val expect = Packer.shuffleSequences(
        Packer.materializeTokenShards(enc, capacityTokens = 16,
          numGroups = 4, dropRemainder = true, docSpans = true),
        numShards = 3, seed = "e0")
      .select("shard", "shard_pos", "pack_group", "seq_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    def readRows() = Packer.readTokenShardStore(spark, dir)
      .select("shard", "shard_pos", "pack_group", "seq_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(readRows() === expect)
    // the manifest totals match the files it describes
    val manifest = spark.read.parquet(s"$dir/manifest").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    expect.groupBy(_._1).foreach { case (sh, rows) =>
      assert(manifest(sh) === ((rows.size.toLong, rows.toSeq.map(_._5).sum)),
        s"manifest disagrees for shard $sh")
    }
    // every persisted sequence is exactly capacity (dropRemainder)
    assert(readRows().forall(_._5 == 16L))
    // replay: a second write is an overwrite, not an accretion
    Packer.writeTokenShardStore(enc, dir, capacityTokens = 16,
      numGroups = 4, numShards = 3, seed = "e0")
    assert(readRows() === expect)
    // sizing refusals
    val e1 = intercept[IllegalArgumentException] {
      Packer.readTokenShardStore(spark, dir, expectCapacity = 32)
    }
    assert(e1.getMessage.contains("refusing"))
    val e2 = intercept[IllegalArgumentException] {
      Packer.readTokenShardStore(spark, dir, expectShards = 8)
    }
    assert(e2.getMessage.contains("refusing"))
    assert(Packer.readTokenShardStore(spark, dir, expectCapacity = 16,
      expectShards = 3).count() === expect.size.toLong)
  }

  test("shuffleSequences: a deterministic permutation — dense positions, seed-keyed order, no sequence lost") {
    val enc = (0L until 40L)
      .map(i => (i, (0 until 7).map(j => (i * 7 + j).toInt), 7L))
      .toDF("doc_id", "token_ids", "n_tokens")
    val seqs = Packer.materializeTokenShards(enc, capacityTokens = 16,
      numGroups = 4)
    val shuffled = Packer.shuffleSequences(seqs, numShards = 3, seed = "s1")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("shard", "shard_pos", "pack_group", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = rows(shuffled)
    // same multiset of sequences, none lost or duplicated
    assert(out.map(t => (t._3, t._4)).sorted.toSeq ===
      seqs.select("pack_group", "seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // positions dense 0..n-1 within every shard
    out.groupBy(_._1).foreach { case (sh, ts) =>
      assert(ts.map(_._2).sorted.toSeq === (0L until ts.length.toLong),
        s"shard $sh positions not dense")
    }
    // deterministic: a second run is identical
    assert(rows(Packer.shuffleSequences(seqs, numShards = 3,
      seed = "s1")).sorted.toSeq === out.sorted.toSeq)
    // a different seed is a different epoch order (arrangement moves)
    val other = rows(Packer.shuffleSequences(seqs, numShards = 3, seed = "s2"))
    assert(other.sorted.toSeq !== out.sorted.toSeq)
    // and NOT the input order: within some shard, consecutive
    // positions come from non-consecutive (pack_group, seq_id)
    val monotone = out.groupBy(_._1).forall { case (_, ts) =>
      val inOrder = ts.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      inOrder == inOrder.sorted
    }
    assert(!monotone, "shuffle left every shard in pack order")
  }
}
