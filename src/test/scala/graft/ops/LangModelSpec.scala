package graft.ops

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("unigram scores match hand-computed micro-nats; empty docs absent") {
    // corpus: total 5 tokens; counts a=2, b=2, c=1
    // nlp(a) = nlp(b) = round(ln(5/2)·1e6) = 916291
    // nlp(c) = round(ln(5)·1e6)            = 1609438
    val docs = Seq((0L, "a a b"), (1L, "b c"), (2L, "")).toDF("doc_id", "text")
    val out = LangModel.unigramScore(docs).orderBy("doc_id").collect()
    assert(out.length === 2) // doc 2 has no tokens
    val d0 = out(0)
    assert(d0.getAs[Long]("n_tokens") === 3L)
    assert(d0.getAs[Long]("avg_nlp_micros") === 916291L) // (2·916291 + 916291) div 3
    val d1 = out(1)
    assert(d1.getAs[Long]("n_tokens") === 2L)
    assert(d1.getAs[Long]("avg_nlp_micros") === 1262864L) // (916291 + 1609438) div 2
  }

  test("rarer vocabulary scores strictly higher than common vocabulary") {
    val docs = (0L to 9L).map(i => (i, "common words here"))
      .:+((10L, "zxq unique tokens"))
      .toDF("doc_id", "text")
    val out = LangModel.unigramScore(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_nlp_micros")).toMap
    assert(out(10L) > out(0L))
    // the ten identical docs all score identically
    assert((0L to 9L).map(out).toSet.size === 1)
  }

  test("bigram counts: multiset counting, conditional prob denominators, stable top-k") {
    // bigrams: (a b)×3 [doc0 twice via "a b a b", doc1 once], (b a)×1, (a c)×1
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "a c"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val out = LangModel.bigramCounts(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("c2"), r.getAs[Long]("c1"), r.getAs[Long]("logp_micros"))).toMap
    // left-context counts: c1(a) = c(a,b) + c(a,c) = 4, c1(b) = 1
    assert(out(("a", "b")) === ((3L, 4L, math.round(math.log(3.0 / 4.0) * 1e6))))
    assert(out(("b", "a")) === ((1L, 1L, 0L)))
    assert(out(("a", "c"))._2 === 4L)
    // single-token and empty docs contribute nothing
    assert(out.size === 3)
    // k caps the output in (count desc, w1, w2) order
    val top1 = LangModel.bigramCounts(docs, k = 1).collect()
    assert(top1.length === 1 && top1.head.getString(0) === "a" &&
      top1.head.getString(1) === "b")
  }

  test("naiveBayes: separable planted classes are recovered") {
    val docs = Seq(
      (1L, "apple banana apple", "fruit"),
      (2L, "banana apple banana", "fruit"),
      (3L, "bolt gear bolt", "metal"),
      (4L, "gear bolt gear", "metal"),
      // mislabeled doc: one fruit token, metal label. Trained counts:
      // fruit {apple 3, banana 3, T 6}, metal {bolt 3, gear 3, apple 1,
      // T 7}, V=4 → score(fruit) = ln(2/5)+ln(4/10) = ln .16 beats
      // score(metal) = ln(3/5)+ln(2/11) = ln .109 despite metal's
      // larger prior — the classifier follows the tokens
      (5L, "apple", "metal")
    ).toDF("doc_id", "text", "source")
    val out = LangModel.naiveBayes(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred")).toMap
    assert(out(1L) === "fruit" && out(2L) === "fruit")
    assert(out(3L) === "metal" && out(4L) === "metal")
    assert(out(5L) === "fruit")
  }

  test("naiveBayes: token-free doc gets the max-prior class; ties break to name") {
    val docs = Seq(
      (1L, "x", "a"), (2L, "y", "a"), (3L, "z", "b"),
      (4L, "", "b")   // no tokens: prior-only score; P(a) > P(b)... equal? a=2,b=2
    ).toDF("doc_id", "text", "source")
    // priors: a 2/4, b 2/4 — equal, so the empty doc must tie-break to "a"
    val out = LangModel.naiveBayes(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred")).toMap
    assert(out(4L) === "a")
  }

  test("naiveBayes: vocabK bounds the feature set") {
    val docs = Seq(
      (1L, "common common rare1", "a"),
      (2L, "common common rare2", "b")
    ).toDF("doc_id", "text", "source")
    // with only the top-1 token ("common") as a feature, both classes are
    // symmetric: every doc falls back to prior (equal) → class "a"
    val out = LangModel.naiveBayes(docs, vocabK = 1).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred")).toMap
    assert(out(1L) === "a" && out(2L) === "a")
  }

  test("collapseExact paths are row-identical to the direct formulations") {
    // dup-heavy corpus: 6 copies of one text (split across labels — the
    // collapsed class totals weight per-(stream, label)), 2 of another,
    // a unique doc, an empty doc, and a cross-label exact pair
    val rows =
      (1L to 4L).map(i => (i, "alpha beta alpha", "a")) ++
      (5L to 6L).map(i => (i, "alpha beta alpha", "b")) ++
      Seq((7L, "gamma delta", "a"), (8L, "gamma delta", "b"),
        (9L, "epsilon zeta eta", "b"), (10L, "", "a"))
    val docs = rows.toDF("doc_id", "text", "source")
    val uniDirect = LangModel.unigramScore(docs).orderBy("doc_id").collect()
    val uniColl = LangModel.unigramScore(docs, collapseExact = true)
      .orderBy("doc_id").collect()
    assert(uniDirect.toSeq === uniColl.toSeq)
    val nbDirect = LangModel.naiveBayes(docs).orderBy("doc_id").collect()
    val nbColl = LangModel.naiveBayes(docs, collapseExact = true)
      .orderBy("doc_id").collect()
    assert(nbDirect.toSeq === nbColl.toSeq)
    // vocabK cut must agree too (weighted vs raw counts rank identically)
    val nbD1 = LangModel.naiveBayes(docs, vocabK = 2).orderBy("doc_id").collect()
    val nbC1 = LangModel.naiveBayes(docs, vocabK = 2, collapseExact = true)
      .orderBy("doc_id").collect()
    assert(nbD1.toSeq === nbC1.toSeq)
  }

  test("bigramInterpolatedScore: hand-computed micro-nats, short docs (0, null), repeated text scores lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),  // bigrams: (a,b)x2, (a,c)x1
      (4L, "a"),                              // < 2 tokens
      (5L, "")                                // featureless
    ).toDF("doc_id", "text")
    val got = LangModel.bigramInterpolatedScore(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    // counts: c2(a,b)=2, c2(a,c)=1, c1l(a)=3; uni: a=4, b=2, c=1, T=7
    def nlp(c2: Long, c1l: Long, c1r: Long): Long =
      math.round(math.log(0.7 * (c2.toDouble / c1l)
        + (1.0 - 0.7) * (c1r.toDouble / 7)) * -1e6)
    assert(got(1L) === ((1L, Some(nlp(2, 3, 2)))))
    assert(got(3L) === ((1L, Some(nlp(1, 3, 1)))))
    assert(got(4L) === ((0L, None)))
    assert(got(5L) === ((0L, None)))
    // the twice-seen bigram is more likely -> lower negative log
    assert(got(1L)._2.get < got(3L)._2.get)
  }

  test("bpe pair counts weight pairs by corpus word frequency") {
    import spark.implicits._
    // "abab" twice and "ab" once: ab=2·2+1=5, ba=2·1=2, bb=0;
    // "Z9z" lowers/splits to single letters — dropped entirely
    val docs = Seq(
      (1L, "abab ab"), (2L, "abab Z9z")).toDF("doc_id", "text")
    val got = LangModel.bpePairCounts(docs)
      .as[(String, Long)].collect().toMap
    assert(got === Map("ab" -> 5L, "ba" -> 2L))
  }

  test("bpe top-k cut is deterministic under count ties") {
    import spark.implicits._
    val docs = Seq((1L, "xy yz zx")).toDF("doc_id", "text")
    // all three pairs count 1 — k=2 must keep the lexicographically first
    val got = LangModel.bpePairCounts(docs, k = 2)
      .as[(String, Long)].collect().map(_._1).toSet
    assert(got === Set("xy", "yz"))
  }

  test("bpeTrain learns hand-computable merges; adjacent occurrences merge like greedy BPE") {
    import spark.implicits._
    // vocab: "abab" ×3, "ab" ×2, "cd" ×1 (one doc per occurrence)
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("ab") :+ "cd")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = LangModel.bpeTrain(docs, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    // pairs over chars: (a,b) = 2*3 + 1*2 = 8; (b,a) = 3. First merge: a+b.
    assert(m(0) === ((1, "a", "b", "ab", 8L)))
    // after merging, "abab" = [ab, ab] — BOTH adjacent pairs must have
    // merged in one round (the replace-twice rule); now (ab,ab) = 3
    assert(m(1) === ((2, "ab", "ab", "abab", 3L)))
    // remaining pairs: only (c,d) = 1
    assert(m(2) === ((3, "c", "d", "cd", 1L)))
  }

  test("bpeTokenCounts: corpus lengths under the trained merges, short words 1:1") {
    import spark.implicits._
    // train: "abab" dominates → merges (a,b), (ab,ab), then (c,d)
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("ab") :+ "cd")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = LangModel.bpeTokenCounts(docs, nMerges = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "abab" → [abab] = 1 token; "ab" → [ab] = 1; "cd" → [cd] = 1
    assert(got === (0L to 5L).map(_ -> ((1L, 1L))).toMap)
    // a doc mixing trained words, an unseen word, and a 1-char word
    val eval = Seq((9L, "abab zz x cd")).toDF("doc_id", "text")
    val both = LangModel.bpeTokenCounts(docs.unionByName(eval), nMerges = 3)
      .where(org.apache.spark.sql.functions.col("doc_id") === 9L).collect().head
    // words: abab(1) zz(2: unseen pair stays 2 chars... zz IS in vocab now)
    // recount: corpus now includes the eval doc, zz appears once → vocab
    // word "zz" gets char-split [z, z]; merges unchanged by one doc;
    // x (<2 chars) counts 1:1; cd → 1
    assert(both.getLong(1) === 4L)                  // n_words
    assert(both.getLong(2) === (1L + 2L + 1L + 1L)) // n_bpe_tokens
  }

  test("bpe self-adjacent merge segments runs canonically (greedy left-to-right)") {
    import spark.implicits._
    // vocab: "ooooo" (run of 5) and "oooooo" (run of 6), each once.
    // Merge 1 must be (o,o). Canonical greedy BPE pairs left-to-right:
    //   ooooo  → [oo, oo, o]  = 3 tokens
    //   oooooo → [oo, oo, oo] = 3 tokens
    // (the old boundary-consuming replace×2 gave [oo, a.. o, oo] / 4.)
    val docs = Seq((1L, "ooooo"), (2L, "oooooo")).toDF("doc_id", "text")
    val m = LangModel.bpeTrain(docs, nMerges = 1).collect()
    assert(m.head.getString(3) === "oo")
    val counts = LangModel.bpeTokenCounts(docs, nMerges = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L))
  }

  test("bpeTrain stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // one 2-char word: merge 1 = (a,b); then every word is one symbol
    val m = LangModel.bpeTrain(docs, nMerges = 5).collect()
    assert(m.length === 1)
    assert(m.head.getString(3) === "ab")
  }

  test("bpeEncode: hand-computable token-id sequences under model-derived ids") {
    import spark.implicits._
    // merges (see the bpeTrain test): 1=(a,b)→ab, 2=(ab,ab)→abab,
    // 3=(c,d)→cd. Ids: 'a'..'z' = 0..25, then ab=26, abab=27, cd=28.
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("ab") :+ "cd")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = LangModel.bpeEncode(docs, nMerges = 3).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    assert(got === Map(
      0L -> ((Seq(27), 1L)), 1L -> ((Seq(27), 1L)), 2L -> ((Seq(27), 1L)),
      3L -> ((Seq(26), 1L)), 4L -> ((Seq(26), 1L)), 5L -> ((Seq(28), 1L))))
    // multi-word sequence order: words in doc order, symbols in word
    // order ("ab cd ab" → [26, 28, 26])
    val multi = docs.unionByName(Seq((9L, "ab cd ab")).toDF("doc_id", "text"))
    val seq9 = LangModel.bpeEncode(multi, nMerges = 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(seq9(9L) === Seq(26, 28, 26))
  }

  test("bpe model save/load: WithModel paths byte-equal to inline; param mismatch refused") {
    import spark.implicits._
    // the adversarial corpus (runs, mid-train re-ranking, ties,
    // exhaustion) — if model-apply segmentation diverged from the
    // training loop's anywhere, it would be here
    val docs = Seq(
      (1L, "ooooo oooooo"),
      (2L, "xab xab xab xab cd cd cd"),
      (3L, "pq qr rp"),
      (4L, "the the thee"),
      (5L, "ab")
    ).toDF("doc_id", "text")
    val model = LangModel.trainBpeModel(docs, nMerges = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-model").toString
    LangModel.saveBpeModel(spark, model, dir)
    val loaded = LangModel.loadBpeModel(spark, dir)
    assert(loaded === model)
    def enc(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    assert(enc(LangModel.bpeEncodeWithModel(docs, loaded)) ===
      enc(LangModel.bpeEncode(docs, nMerges = 8)),
      "loaded-model encode must be byte-equal to the inline training path")
    def cnt(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cnt(LangModel.bpeTokenCountsWithModel(docs, loaded)) ===
      cnt(LangModel.bpeTokenCounts(docs, nMerges = 8)))
    // a tokenizer trained with a different merge count must refuse
    val e = intercept[IllegalArgumentException] {
      LangModel.loadBpeModel(spark, dir, expectMerges = 3)
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("bpe model load: corrupted merges (merged != left+right) and reordered columns refused/survived") {
    import spark.implicits._
    val docs = Seq((1L, "abab abab ab cd")).toDF("doc_id", "text")
    val model = LangModel.trainBpeModel(docs, nMerges = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-corrupt").toString
    LangModel.saveBpeModel(spark, model, dir)
    // a column-REORDERED merges table must still load correctly
    // (by-name access), not permute (left, right, merged) silently
    val reordered = spark.read.parquet(s"$dir/merges")
      .select("merged", "pair_count", "rank", "right", "left")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bpe-reord").toString
    reordered.write.mode("overwrite").parquet(s"$dir2/merges")
    spark.read.parquet(s"$dir/params").write.mode("overwrite")
      .parquet(s"$dir2/params")
    assert(LangModel.loadBpeModel(spark, dir2) === model)
    // a merges table whose merged column disagrees with left+right is
    // a corrupted artifact — must refuse, not tokenize differently
    val corrupt = spark.read.parquet(s"$dir/merges")
      .withColumn("merged", org.apache.spark.sql.functions.lit("zz"))
    val dir3 = java.nio.file.Files.createTempDirectory("graft-bpe-bad").toString
    corrupt.write.mode("overwrite").parquet(s"$dir3/merges")
    spark.read.parquet(s"$dir/params").write.mode("overwrite")
      .parquet(s"$dir3/params")
    val e2 = intercept[IllegalArgumentException] {
      LangModel.loadBpeModel(spark, dir3)
    }
    assert(e2.getMessage.contains("inconsistent"))
  }

  test("model apply on an UNSEEN corpus: greedy segmentation + 1-char fallback, hand-computed") {
    import spark.implicits._
    val train = (Seq.fill(3)("abab") ++ Seq.fill(2)("ab") :+ "cd")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val model = LangModel.trainBpeModel(train, nMerges = 3)
    // "abab"→[abab]=27; "zz" (unseen, no merge applies)→[z,z]=[25,25];
    // "x" (1-char)→[x]=23; "cd"→[cd]=28
    val eval = Seq((9L, "abab zz x cd")).toDF("doc_id", "text")
    val got = LangModel.bpeEncodeWithModel(eval, model).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2)))
    assert(got.toSeq === Seq((9L, Seq(27, 25, 25, 23, 28), 5L)))
    // run-adjacency under model apply chains left-to-right like the
    // training replace: merge (o,o) on "ooooo" → [oo, oo, o]
    val runs = Seq((1L, "ooooo oooooo")).toDF("doc_id", "text")
    val runModel = LangModel.trainBpeModel(runs, nMerges = 1)
    val g2 = LangModel.bpeTokenCountsWithModel(
      Seq((7L, "ooooo")).toDF("doc_id", "text"), runModel).collect().head
    assert(g2.getLong(2) === 3L)
  }

  test("bpe driver path is byte-equal to the distributed per-round loop") {
    import spark.implicits._
    // adversarial shapes: self-adjacent runs (greedy chaining), merge
    // chains that re-rank mid-train (a merge creating a pair that
    // outranks pre-existing ones — the case that rules out batching),
    // count ties (lex tie-break), and words that fully exhaust
    val docs = Seq(
      (1L, "ooooo oooooo"),              // runs of the same symbol
      (2L, "xab xab xab xab cd cd cd"),  // (a,b) then (x,ab) outranks (c,d)
      (3L, "pq qr rp"),                  // three-way count tie
      (4L, "the the thee"),              // shared prefixes
      (5L, "ab")                         // exhausts after one merge
    ).toDF("doc_id", "text")
    for (n <- Seq(1, 3, 8, 64)) {
      val drv = LangModel.bpeLoop(docs, n, "text", None, Long.MaxValue)
      val dst = LangModel.bpeLoop(docs, n, "text", None, 0L)
      assert(drv._2.collect().map(_.toSeq).toSeq ===
        dst._2.collect().map(_.toSeq).toSeq, s"merge table, nMerges=$n")
      assert(drv._1.collect().map(_.toSeq).toSet ===
        dst._1.collect().map(_.toSeq).toSet, s"segmented vocab, nMerges=$n")
    }
  }

  test("bpe recount strategy is byte-equal to incremental on the adversarial corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ooooo oooooo"),
      (2L, "xab xab xab xab cd cd cd"),
      (3L, "pq qr rp"),
      (4L, "the the thee"),
      (5L, "ab")
    ).toDF("doc_id", "text")
    for (n <- Seq(1, 8, 64)) {
      val inc = LangModel.bpeLoop(docs, n, "text", None, 0L)
      val rec = LangModel.bpeLoop(docs, n, "text", None, 0L,
        strategy = LangModel.BpeRecount)
      assert(inc._2.collect().map(_.toSeq).toSeq ===
        rec._2.collect().map(_.toSeq).toSeq, s"merge table, nMerges=$n")
      assert(inc._1.collect().map(_.toSeq).toSet ===
        rec._1.collect().map(_.toSeq).toSet, s"segmented vocab, nMerges=$n")
    }
    intercept[IllegalArgumentException] {
      LangModel.bpeTrain(docs, 2, strategy = "both-at-once")
    }
  }

  test("bpe driver path matches distributed on randomized corpora (seeded fuzz)") {
    import spark.implicits._
    // random low-alphabet words maximize pair collisions, ties, runs,
    // and mid-train re-ranking — the regimes where the incremental
    // maintenance (lazy heap, stale occurrence entries, delta updates)
    // could drift from the per-round recount
    val rnd = new scala.util.Random(101)
    val alpha = "abc"
    for (trial <- 1 to 3) {
      val words = Seq.fill(40)(
        Seq.fill(2 + rnd.nextInt(6))(alpha(rnd.nextInt(alpha.length))).mkString)
      val docs = Seq.fill(60)(words(rnd.nextInt(words.size)))
        .zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val n = 1 + rnd.nextInt(12)
      val drv = LangModel.bpeLoop(docs, n, "text", None, Long.MaxValue)
      val dst = LangModel.bpeLoop(docs, n, "text", None, 0L)
      assert(drv._2.collect().map(_.toSeq).toSeq ===
        dst._2.collect().map(_.toSeq).toSeq, s"trial $trial merges, n=$n")
      assert(drv._1.collect().map(_.toSeq).toSet ===
        dst._1.collect().map(_.toSeq).toSet, s"trial $trial vocab, n=$n")
    }
  }

  test("bpe 100-merge train runs in O(1) Spark jobs, not one per merge") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val m = LangModel.bpeTrain(docs, nMerges = 100).collect()
      // listener events are posted asynchronously; a short settle is
      // enough for the handful of job-start events being counted
      Thread.sleep(500)
      // merges may exhaust below 100 on a small corpus; ranks must be
      // 1..k and the job count bounded by the driver-path constant
      // (vocab materialize + count + collect + result-side jobs), far
      // below the per-merge formulation's 100+
      assert(m.nonEmpty && m.length <= 100)
      assert(m.map(_.getInt(0)).toSeq === (1 to m.length))
      assert(jobs <= 10, s"expected O(1) jobs for 100 merges, got $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bpe distributed 128-merge schedule: byte-equal to driver, bounded jobs per merge") {
    import spark.implicits._
    // a corpus rich enough to sustain 128 merges: 80 distinct words of
    // length 5-9 over 6 letters, duplicated with varied counts
    val rnd = new scala.util.Random(7)
    val alpha = "abcdef"
    val words = Seq.fill(80)(
      Seq.fill(5 + rnd.nextInt(5))(alpha(rnd.nextInt(alpha.length))).mkString)
    val docs = (0 until 200).map(i => (i.toLong, words(rnd.nextInt(words.size))))
      .toDF("doc_id", "text")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val dst = try {
      val out = LangModel.bpeLoop(docs, 128, "text", None, 0L)
      val m = out._2.collect().map(_.toSeq).toSeq
      val v = out._1.collect().map(_.toSeq).toSet
      Thread.sleep(500)
      (m, v)
    } finally spark.sparkContext.removeSparkListener(listener)
    val drv = LangModel.bpeLoop(docs, 128, "text", None, Long.MaxValue)
    assert(dst._1 === drv._2.collect().map(_.toSeq).toSeq, "merge table")
    assert(dst._2 === drv._1.collect().map(_.toSeq).toSet, "segmented vocab")
    assert(dst._1.size >= 100, "corpus must actually sustain a long schedule")
    // the old formulation was one full-vocab explode+shuffle+sort per
    // merge and hard-refused past 64; the incremental schedule runs a
    // CONSTANT number of jobs per merge — top-1 + pc fold + vocab map,
    // where AQE submits each exchange stage as its own job (~6
    // observed) — so the schedule scales linearly in nMerges with a
    // small constant, never superlinearly
    assert(jobs <= 8 * dst._1.size + 30,
      s"expected bounded jobs per merge, got $jobs for ${dst._1.size} merges")
  }

  test("crossUnigramScore: hand-computed held-out micro-nats and OOV accounting") {
    import spark.implicits._
    // train: tokens {a:3, b:1}, total 4
    val train = Seq((1L, "a a b"), (2L, "a")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b"),      // both in vocab
      (11L, "a zz"),     // one OOV token
      (12L, "qq qq")     // fully OOV → null average
    ).toDF("doc_id", "text")
    val got = LangModel.crossUnigramScore(train, eval).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    val nlpA = math.round((math.log(4.0) - math.log(3.0)) * 1e6)
    val nlpB = math.round((math.log(4.0) - math.log(1.0)) * 1e6)
    assert(got(10L) === ((2L, 0L, Some((nlpA + nlpB) / 2))))
    assert(got(11L) === ((2L, 1L, Some(nlpA))))
    assert(got(12L) === ((2L, 2L, None)))
  }

  test("perplexityBuckets: value-threshold terciles; ties share a bucket; null scores surface as na") {
    import org.apache.spark.sql.functions.col
    // 9 scored docs, distinct scores 10..90 → cutoffs at ranks
    // ceil(9/3)=3 (value 30) and ceil(18/3)=6 (value 60)
    val scored = (1L to 9L).map(i => (i, Some(i * 10L)))
      .:+((10L, Option.empty[Long]))
      .toDF("doc_id", "avg_nlp_micros")
    val got = LangModel.perplexityBuckets(scored)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 3L).forall(got(_) == "head"))
    assert((4L to 6L).forall(got(_) == "middle"))
    assert((7L to 9L).forall(got(_) == "tail"))
    assert(got(10L) === "na")
    // ties share a bucket (value thresholds, not row counts): six docs
    // at score 5 and three at 99 → the 5s are ALL head (cut1 = 5 at
    // cum 6 ≥ 3), and because that one value already reaches the
    // second rank too (cum 6 ≥ 6 ⇒ cut2 = 5), middle is EMPTY and the
    // 99s are tail — a mass-dominant value never straddles a boundary
    val tied = ((1L to 6L).map((_, 5L)) ++ (7L to 9L).map((_, 99L)))
      .toDF("doc_id", "avg_nlp_micros")
    val got2 = LangModel.perplexityBuckets(tied)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 6L).forall(got2(_) == "head"))
    assert((7L to 9L).forall(got2(_) == "tail"))
    // all-null population: everything na, no crash on empty histogram
    val nulls = Seq((1L, Option.empty[Long])).toDF("doc_id", "avg_nlp_micros")
    assert(LangModel.perplexityBuckets(nulls)
      .collect().map(_.getString(2)).toSeq === Seq("na"))
    // the plan contains no global row-level sort: the only window runs
    // over the distinct-score histogram
    val plan = LangModel.perplexityBuckets(scored.where(col("doc_id") < 5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"))
    // per-partition cutoffs (the CCNet per-language rule): two groups
    // with disjoint score ranges each split into their OWN terciles —
    // globally the 'b' group would be all tail
    val grouped = ((1L to 9L).map(i => (i, "a", i * 10L)) ++
      (11L to 19L).map(i => (i, "b", 1000L + i * 10L)))
      .toDF("doc_id", "lang", "avg_nlp_micros")
    val gb = LangModel.perplexityBuckets(grouped,
      partitionCols = Seq("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert((1L to 3L).forall(gb(_) == "head") &&
      (17L to 19L).forall(gb(_) == "tail"))
    assert((11L to 13L).forall(gb(_) == "head"))
  }

  test("crossUnigramScore collapsed eval is output-identical to direct") {
    import spark.implicits._
    val train = Seq((1L, "a a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b"), (11L, "a b"),          // exact dups — one stream
      (12L, "A, b!"),                       // same stream after normalize
      (13L, "a zz"),                        // partial OOV
      (14L, "qq qq"),                       // fully OOV
      (15L, "")                             // token-free — absent both ways
    ).toDF("doc_id", "text")
    val direct = LangModel.crossUnigramScore(train, eval)
      .orderBy("doc_id").collect().map(_.toSeq)
    val collapsed = LangModel.crossUnigramScore(train, eval, collapseExact = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(direct.toSeq === collapsed.toSeq)
    assert(direct.length === 5)   // 15 absent
  }
}
