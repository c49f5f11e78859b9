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

  /** Docs with varied lengths so group tails straddle boundaries:
    * doc i carries (i % 9 + 3) tokens, ids unique per doc. */
  private def lifecycleEnc(ids: Seq[Long]) = ids
    .map(i => (i, (0 until (i % 9 + 3).toInt).map(j => (i * 100 + j).toInt),
      (i % 9 + 3)))
    .toDF("doc_id", "token_ids", "n_tokens")

  /** Full read-back rows EXCLUDING batch (ingest provenance — the one
    * column append ≡ rebuild legitimately differs on). */
  private def storeRows(dir: String) =
    Packer.readTokenShardStore(spark, dir)
      .select("shard", "shard_pos", "skey", "pack_group", "seq_id",
        "n_tokens", "token_ids", "doc_spans")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        r.getSeq[Int](6).mkString(","),
        r.getSeq[org.apache.spark.sql.Row](7)
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).mkString(";")))
      .toSet

  test("shard store append ≡ rebuild: continued packing, identical read-back, replay-idempotent") {
    val all = (0L until 40L)
    val dirApp = java.nio.file.Files.createTempDirectory("graft-ss-app").toString
    val dirReb = java.nio.file.Files.createTempDirectory("graft-ss-reb").toString
    // rebuild over the combined corpus = the ground truth
    Packer.writeTokenShardStore(lifecycleEnc(all), dirReb,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0")
    // base over the first 25 docs, then two chained monotone appends
    Packer.writeTokenShardStore(lifecycleEnc(all.take(25)), dirApp,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0")
    Packer.appendToTokenShardStore(lifecycleEnc(all.slice(25, 33)), dirApp, "b1")
    Packer.appendToTokenShardStore(lifecycleEnc(all.drop(33)), dirApp, "b2",
      prevBatch = "b1")
    assert(storeRows(dirApp) === storeRows(dirReb),
      "appended store must read back as if the combined corpus was written once")
    // existing batch directories were NOT rewritten by the appends:
    // base still holds exactly the full sequences of the first write
    val baseSeqs = spark.read
      .parquet(s"$dirApp/shards/batch=base").count()
    val expectBase = Packer.materializeTokenShards(lifecycleEnc(all.take(25)),
      capacityTokens = 16, numGroups = 4, dropRemainder = true).count()
    assert(baseSeqs === expectBase)
    // replay: re-running append b2 (same prevBatch) overwrites itself
    Packer.appendToTokenShardStore(lifecycleEnc(all.drop(33)), dirApp, "b2",
      prevBatch = "b1")
    assert(storeRows(dirApp) === storeRows(dirReb))
    // the PER-BATCH manifests (each derived from its own batch's
    // files — O(batch) per append) sum to the files' totals
    val manifest = spark.read.parquet(s"$dirApp/manifest")
      .groupBy("shard")
      .agg(sum("n_sequences").as("n"), sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    storeRows(dirApp).groupBy(_._1).foreach { case (sh, rows) =>
      assert(manifest(sh) === ((rows.size.toLong, rows.toSeq.map(_._6).sum)))
    }
    // the lineage guard: appending from a carry that b2 already
    // continued from would re-place b2's completed tail — refused
    val eStale = intercept[IllegalArgumentException] {
      Packer.appendToTokenShardStore(lifecycleEnc(Seq(99L)), dirApp, "b3",
        prevBatch = "base")
    }
    assert(eStale.getMessage.contains("lineage tip"))
    // ... and a "replay" of the tip under a DIFFERENT lineage is not a
    // replay — refused by the batch's _PREV record
    val eReplay = intercept[IllegalArgumentException] {
      Packer.appendToTokenShardStore(lifecycleEnc(all.drop(33)), dirApp, "b2",
        prevBatch = "base")
    }
    assert(eReplay.getMessage.contains("originally written from"))
  }

  test("shard store append refusals: non-monotone ids, padded store, bad batch tokens") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ss-ref").toString
    Packer.writeTokenShardStore(lifecycleEnc(0L until 25L), dir,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0")
    // an increment interleaving EXISTING doc ids would change already-
    // published sequences in a rebuild — refused, with a count
    val e1 = intercept[IllegalArgumentException] {
      Packer.appendToTokenShardStore(lifecycleEnc(Seq(10L, 99L)), dir, "b1")
    }
    assert(e1.getMessage.contains("ascending doc_id"))
    // batch token hygiene: 'base' reserved; must be letter-led (hive
    // type inference must read the partition as a string)
    for (bad <- Seq("base", "1x", "", "a b"))
      intercept[IllegalArgumentException] {
        Packer.appendToTokenShardStore(lifecycleEnc(Seq(99L)), dir, bad)
      }
    // unknown carry lineage
    val e2 = intercept[IllegalArgumentException] {
      Packer.appendToTokenShardStore(lifecycleEnc(Seq(99L)), dir, "b1",
        prevBatch = "nope")
    }
    assert(e2.getMessage.contains("carry"))
    // a padded (dropRemainder = false) store is not appendable
    val dirPad = java.nio.file.Files.createTempDirectory("graft-ss-pad").toString
    Packer.writeTokenShardStore(lifecycleEnc(0L until 25L), dirPad,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0",
      dropRemainder = false)
    val e3 = intercept[IllegalArgumentException] {
      Packer.appendToTokenShardStore(lifecycleEnc(Seq(99L)), dirPad, "b1")
    }
    assert(e3.getMessage.contains("dropRemainder"))
  }

  test("shard store reshuffle: new epoch order, identical contents, still appendable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ss-rs0").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ss-rs1").toString
    // MULTI-batch source: the reshuffle must compact the batches AND
    // carry forward only the lineage TIP's carry (copying historical
    // carries verbatim would let a default prevBatch="base" append on
    // the new store resume from a stale tail — the corruption the
    // lineage guard exists for)
    Packer.writeTokenShardStore(lifecycleEnc(0L until 25L), dir,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0")
    Packer.appendToTokenShardStore(lifecycleEnc(25L until 30L), dir, "b1")
    Packer.reshuffleTokenShardStore(spark, dir, out, newSeed = "e1")
    def contents(d: String) = storeRows(d)
      .map(t => (t._4, t._5, t._7, t._8)) // (group, seq, tokens, spans)
    // same sequences, bit for bit — only the arrangement moved
    assert(contents(out) === contents(dir))
    assert(storeRows(out).map(t => (t._1, t._2, t._4, t._5)) !==
      storeRows(dir).map(t => (t._1, t._2, t._4, t._5)),
      "a new seed must produce a different epoch arrangement")
    // deterministic: the same newSeed reproduces the epoch exactly
    val out2 = java.nio.file.Files.createTempDirectory("graft-ss-rs2").toString
    Packer.reshuffleTokenShardStore(spark, dir, out2, newSeed = "e1")
    assert(storeRows(out2) === storeRows(out))
    // the epoch equals a from-scratch write under the new seed (the
    // reshuffle is a re-key, never a re-pack)
    val scratch = java.nio.file.Files.createTempDirectory("graft-ss-rs3").toString
    Packer.writeTokenShardStore(lifecycleEnc(0L until 30L), scratch,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e1")
    assert(storeRows(out) === storeRows(scratch))
    // carry traveled: the reshuffled store accepts appends and still
    // reads back as the rebuild over the combined corpus
    Packer.appendToTokenShardStore(lifecycleEnc(30L until 40L), out, "b1")
    val rebuild = java.nio.file.Files.createTempDirectory("graft-ss-rs4").toString
    Packer.writeTokenShardStore(lifecycleEnc(0L until 40L), rebuild,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e1")
    assert(storeRows(out) === storeRows(rebuild))
    // in-place refusal
    val e = intercept[IllegalArgumentException] {
      Packer.reshuffleTokenShardStore(spark, dir, dir, "e2")
    }
    assert(e.getMessage.contains("outDir"))
  }

  test("shard store mixture: per-store keep rates, one epoch order, refusals") {
    val dA = java.nio.file.Files.createTempDirectory("graft-ss-mx-a").toString
    val dB = java.nio.file.Files.createTempDirectory("graft-ss-mx-b").toString
    Packer.writeTokenShardStore(lifecycleEnc(0L until 30L), dA,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0")
    Packer.writeTokenShardStore(lifecycleEnc(30L until 60L), dB,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0")
    val nA = Packer.readTokenShardStore(spark, dA).count()
    val nB = Packer.readTokenShardStore(spark, dB).count()
    def mix(wa: Long, wb: Long) = Packer.readTokenShardStoreMix(spark,
      Seq(dA -> wa, dB -> wb), numShards = 3, seed = "m")
    // boundary weights: 1M keeps everything, 0 keeps nothing
    assert(mix(1000000L, 0L).where(col("store") === 1).count() === 0)
    assert(mix(1000000L, 1000000L).count() === nA + nB)
    // a fractional weight keeps a strict, deterministic subset
    val half = mix(500000L, 1000000L)
    val keptA = half.where(col("store") === 0).count()
    assert(keptA > 0 && keptA < nA, s"keep rate degenerate: $keptA of $nA")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("store", "shard", "shard_pos", "pack_group", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows(mix(500000L, 1000000L)) === rows(half))
    // positions dense 0..n-1 within every shard (one total epoch order)
    rows(half).groupBy(_._2).foreach { case (sh, ts) =>
      assert(ts.map(_._3).toSeq.sorted === (0L until ts.size.toLong),
        s"shard $sh positions not dense")
    }
    // kept store-0 rows are a subset of store A's sequences
    val aSeqs = Packer.readTokenShardStore(spark, dA)
      .select("pack_group", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(half).filter(_._1 == 0).map(t => (t._4, t._5)).subsetOf(aSeqs))
    // refusals: mixed capacities; out-of-range weight
    val dC = java.nio.file.Files.createTempDirectory("graft-ss-mx-c").toString
    Packer.writeTokenShardStore(lifecycleEnc(0L until 10L), dC,
      capacityTokens = 8, numGroups = 2, numShards = 2, seed = "e0")
    val e1 = intercept[IllegalArgumentException] {
      Packer.readTokenShardStoreMix(spark, Seq(dA -> 500000L, dC -> 500000L))
    }
    assert(e1.getMessage.contains("capacities"))
    val e2 = intercept[IllegalArgumentException] {
      Packer.readTokenShardStoreMix(spark, Seq(dA -> 100000001L))
    }
    assert(e2.getMessage.contains("sizing bug"))

    // ---- oversampling: weight > 1M replicates full passes ----
    def omix(wa: Long) = Packer.readTokenShardStoreMix(spark,
      Seq(dA -> wa, dB -> 500000L), numShards = 3, seed = "m")
    // exactly 2 full passes: every store-A sequence appears twice
    val two = omix(2000000L)
    assert(two.where(col("store") === 0).count() === 2 * nA)
    assert(two.where(col("store") === 0).select("pass").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))
    // 2.4 passes: 2 full + a strict fractional third
    val frac = omix(2400000L)
    val p2 = frac.where(col("store") === 0 && col("pass") === 2).count()
    assert(p2 > 0 && p2 < nA, s"fractional pass degenerate: $p2 of $nA")
    assert(frac.where(col("store") === 0 && col("pass") < 2).count() === 2 * nA)
    // replicas decorrelate: pass 0 and pass 1 order the same sequences
    // differently (the pass index salts the epoch key)
    def epochOrder(p: Long) = two.where(col("store") === 0 && col("pass") === p)
      .orderBy("shard", "shard_pos")
      .select("pack_group", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(epochOrder(0L).toSet === epochOrder(1L).toSet)
    assert(epochOrder(0L) !== epochOrder(1L),
      "replica passes must land at independent epoch positions")
    // ≤1M weights unchanged by the oversampling extension: pass is
    // all-zero and the (store, shard, shard_pos) placement matches the
    // pre-extension arrangement asserted above
    assert(half.where(col("pass") =!= 0L).count() === 0)
    // positions stay dense with replicas present (one total epoch order)
    val byShard = two.select("shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    byShard.foreach { case (sh, ts) =>
      assert(ts.map(_._2).sorted.toSeq === (0L until ts.size.toLong),
        s"shard $sh positions not dense under oversampling")
    }
    // deterministic
    assert(frac.collect().map(_.toString).sorted.toSeq ===
      omix(2400000L).collect().map(_.toString).sorted.toSeq)
  }

  test("attention inputs: cu_seqlens and position_ids from doc_spans") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ss-ai").toString
    Packer.writeTokenShardStore(lifecycleEnc(0L until 30L), dir,
      capacityTokens = 16, numGroups = 4, numShards = 3, seed = "e0")
    val ai = Packer.attentionInputs(Packer.readTokenShardStore(spark, dir))
      .select("n_tokens", "doc_spans", "cu_seqlens", "position_ids")
      .collect()
    assert(ai.nonEmpty)
    ai.foreach { r =>
      val n = r.getLong(0)
      val spans = r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getLong(1), s.getLong(2))) // (start, end incl.)
      val cu = r.getSeq[Long](2)
      val pos = r.getSeq[Long](3)
      // cu_seqlens = span starts + terminator; 0-led, strictly
      // increasing, n_tokens-terminated — the varlen convention
      assert(cu === spans.map(_._1) :+ n)
      assert(cu.head === 0L && cu.last === n)
      assert(cu.sliding(2).forall(w => w(0) < w(1)))
      // position_ids: one per token, restarting 0,1,2,… at every doc
      assert(pos.size === n)
      assert(pos === spans.flatMap { case (s, e) => 0L to (e - s) })
      cu.dropRight(1).foreach(b => assert(pos(b.toInt) === 0L,
        s"position must restart at boundary $b"))
    }
    // refusal: a spans-less relation cannot produce attention inputs
    val e = intercept[IllegalArgumentException] {
      Packer.attentionInputs(
        Packer.readTokenShardStore(spark, dir).drop("doc_spans"))
    }
    assert(e.getMessage.contains("doc_spans"))
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
