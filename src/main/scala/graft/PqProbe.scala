package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}

/** Dev measurement surface: IVF-PQ recall vs (ks, nprobe) on the
  * synthetic embeddings fixture — the near-uniform worst case for any
  * ANN structure (cf. the SRP occupancy sweeps in SCALE.md). Pins the
  * honest floor PqSpec asserts and records the knob curve. */
object PqProbe {

  /** `PqProbe scale /tmp/graft-vecs1000000` — index-build and serve
    * economics of IVF-PQ vs the float IVF index on a distinct-vector
    * replica (`ScaleUp vecs <n>`): build wall, on-disk bytes of the
    * probed relation, and per-batch serve wall at equal nprobe. The
    * number that matters at 100 TB is the bytes ratio: the IVF-PQ
    * corpus holds m ints/row vs d floats/row, and serve reads
    * nprobe/nlist of THOSE bytes. */
  private def scaleProbe(spark: org.apache.spark.sql.SparkSession,
                         dir: String): Unit = {
    import org.apache.spark.sql.DataFrame
    val em = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = em.count()
    val q = em.where(col("vec_id") < 20)
    def wall[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def bytes(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }
    def drain(df: DataFrame): Long = df.count()
    val ivfDir = java.nio.file.Files.createTempDirectory("scale-ivf").toString
    val pqDir = java.nio.file.Files.createTempDirectory("scale-ivfpq").toString
    val (_, tIvf) = wall(ops.Similarity.buildIvfIndex(em, ivfDir, corpusSize = n))
    val (_, tPq) = wall(ops.Pq.buildIvfPqIndex(em, pqDir, m = 8, ks = 256,
      corpusSize = n))
    println(f"n=$n build: ivf=$tIvf%.1fs ivfpq=$tPq%.1fs  " +
      f"corpusBytes: ivf=${bytes(s"$ivfDir/corpus")} pq=${bytes(s"$pqDir/corpus")}")
    for (round <- 1 to 3) {
      val (_, sIvf) = wall(drain(
        ops.Similarity.ivfTopKIndexed(q, ivfDir, k = 5, nprobe = 8)))
      val (_, sPq) = wall(drain(
        ops.Pq.ivfPqTopKIndexed(q, pqDir, k = 5, nprobe = 8)))
      val (_, sRef) = wall(drain(
        ops.Pq.ivfPqTopKRefined(q, pqDir, k = 5, source = em, nprobe = 8,
          refine = 8)))
      val (_, sPt) = wall(drain(
        ops.Pq.ivfPqTopKRefinedPoint(q, pqDir, k = 5, source = em,
          nprobe = 8, refine = 8)))
      println(f"serve round $round: ivf=$sIvf%.2fs ivfpq=$sPq%.2fs " +
        f"ivfpq+refine=$sRef%.2fs ivfpq+refine-point=$sPt%.2fs")
    }
    // the REQUEST/RESPONSE shape: one query, collected to a literal
    // relation (a serving caller has its vector in hand — deriving it
    // from the corpus would cost a corpus scan, the LshServeProbe
    // point lesson)
    import spark.implicits._
    val q1row = em.where(col("vec_id") === 0)
      .select("vec_id", "embedding").collect()(0)
    val q1 = Seq((q1row.getLong(0), q1row.getSeq[Float](1)))
      .toDF("vec_id", "embedding")
    for (round <- 1 to 3) {
      val (_, b1) = wall(drain(
        ops.Pq.ivfPqTopKRefined(q1, pqDir, k = 5, source = em, nprobe = 8,
          refine = 8)))
      val (_, p1) = wall(drain(
        ops.Pq.ivfPqTopKRefinedPoint(q1, pqDir, k = 5, source = em,
          nprobe = 8, refine = 8)))
      println(f"one-query round $round: refine-batch=$b1%.2fs " +
        f"refine-point=$p1%.2fs")
    }
  }

  /** `PqProbe residual` — raw vs residual (IVFADC) encoding at equal
    * (m, ks, nlist, nprobe), on BOTH regimes: the uniform sf fixture
    * (no cell structure — residuals cannot help, the honest null
    * result) and a deterministic clustered corpus (the real embedding
    * regime, where encoding the within-cell displacement is the
    * standard recall lever). */
  private def residualProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val uniform = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 16 well-separated centers in 64 dims, deterministic sinusoidal
    // displacement — same construction as the PqSpec fixture, scaled
    val clustered = (0L until 4096L).map { i =>
      val c = (i % 16).toInt
      (i, Array.tabulate(64) { d =>
        val center = if (d / 4 == c) 1.0 else 0.0
        (center + 0.2 * math.sin(i * 13.0 + d * 7.0)).toFloat
      })
    }.toDF("vec_id", "embedding")
    for ((name, corpus) <- Seq(("uniform", uniform), ("clustered", clustered))) {
      val q = corpus.where(col("vec_id") < 20)
      val truth = Similarity.bruteForceTopK(q, corpus, k = 5)
      for (residual <- Seq(false, true)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"pqres-$name-$residual").toString
        Pq.buildIvfPqIndex(corpus, dir, m = 8, ks = 16, nlist = 8,
          residual = residual)
        for (nprobe <- Seq(1, 2, 4, 8)) {
          val approx = Pq.ivfPqTopKIndexed(q, dir, k = 5, nprobe = nprobe)
          val r = Similarity.annRecall(truth, approx)
            .agg(avg("recall_ppm")).head().getDouble(0)
          println(f"$name%-9s residual=$residual%-5s m=8 ks=16 nlist=8 " +
            f"nprobe=$nprobe recall_ppm=$r%.0f")
        }
      }
    }
  }

  /** `PqProbe opq` — the residualProbe matrix extended with the OPQ
    * rotation dimension: (residual) × (opq) at equal sizing on three
    * regimes — uniform (the honest null), axis-aligned clustered
    * (structure PQ's subspaces already see), and MIXED clustered (the
    * same clusters rotated 45° across subspace boundaries — the
    * correlated-embedding regime OPQ exists for). */
  private def opqProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val uniform = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def clusteredRaw(i: Long): Array[Double] = {
      val c = (i % 16).toInt
      Array.tabulate(64) { d =>
        val center = if (d / 4 == c) 1.0 else 0.0
        center + 0.2 * math.sin(i * 13.0 + d * 7.0)
      }
    }
    val clustered = (0L until 4096L)
      .map(i => (i, clusteredRaw(i).map(_.toFloat))).toDF("vec_id", "embedding")
    // 45° mixing between dims (d, d+32): every 8-dim PQ subspace now
    // straddles two cluster blocks
    val mixed = (0L until 4096L).map { i =>
      val x = clusteredRaw(i)
      val y = Array.tabulate(64) { d =>
        if (d < 32) (x(d) - x(d + 32)) / math.sqrt(2.0)
        else (x(d - 32) + x(d)) / math.sqrt(2.0)
      }
      (i, y.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    for ((name, corpus) <- Seq(("uniform", uniform),
                               ("clustered", clustered), ("mixed", mixed))) {
      val q = corpus.where(col("vec_id") < 20)
      val truth = Similarity.bruteForceTopK(q, corpus, k = 5)
      for (residual <- Seq(false, true); opq <- Seq(false, true)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"pqopq-$name-$residual-$opq").toString
        val t0 = System.nanoTime()
        Pq.buildIvfPqIndex(corpus, dir, m = 8, ks = 16, nlist = 8,
          residual = residual, opq = opq)
        val tBuild = (System.nanoTime() - t0) / 1e9
        for (nprobe <- Seq(1, 2, 4, 8)) {
          val approx = Pq.ivfPqTopKIndexed(q, dir, k = 5, nprobe = nprobe)
          val r = Similarity.annRecall(truth, approx)
            .agg(avg("recall_ppm")).head().getDouble(0)
          println(f"$name%-9s residual=$residual%-5s opq=$opq%-5s " +
            f"m=8 ks=16 nlist=8 nprobe=$nprobe recall_ppm=$r%.0f " +
            f"build=$tBuild%.1fs")
        }
      }
    }
  }

  /** `PqProbe half` — the fp16-refine accuracy/bytes matrix on the
    * opqProbe fixtures: at equal nprobe and refine, how much of the
    * source-refine recall does re-ranking from the index's OWN
    * binary16 vectors keep (expected: all of it — a half carries 11
    * significant bits where the ADC codes carry 4), and what do the
    * stored refine vectors cost at rest vs the full-precision source
    * relation. */
  private def halfProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    def bytes(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }
    val uniform = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def clusteredRaw(i: Long): Array[Double] = {
      val c = (i % 16).toInt
      Array.tabulate(64) { d =>
        val center = if (d / 4 == c) 1.0 else 0.0
        center + 0.2 * math.sin(i * 13.0 + d * 7.0)
      }
    }
    val clustered = (0L until 4096L)
      .map(i => (i, clusteredRaw(i).map(_.toFloat))).toDF("vec_id", "embedding")
    val mixed = (0L until 4096L).map { i =>
      val x = clusteredRaw(i)
      val y = Array.tabulate(64) { d =>
        if (d < 32) (x(d) - x(d + 32)) / math.sqrt(2.0)
        else (x(d - 32) + x(d)) / math.sqrt(2.0)
      }
      (i, y.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    for ((name, corpus) <- Seq(("uniform", uniform),
                               ("clustered", clustered), ("mixed", mixed))) {
      val q = corpus.where(col("vec_id") < 20)
      val truth = Similarity.bruteForceTopK(q, corpus, k = 5)
      val dir = java.nio.file.Files
        .createTempDirectory(s"pqhalf-$name").toString
      val dirNo = java.nio.file.Files
        .createTempDirectory(s"pqnohalf-$name").toString
      Pq.buildIvfPqIndex(corpus, dir, m = 8, ks = 16, nlist = 8,
        residual = true, refineHalf = true)
      Pq.buildIvfPqIndex(corpus, dirNo, m = 8, ks = 16, nlist = 8,
        residual = true)
      def recall(df: org.apache.spark.sql.DataFrame): Double =
        Similarity.annRecall(truth, df)
          .agg(avg("recall_ppm")).head().getDouble(0)
      for (nprobe <- Seq(1, 2, 4)) {
        val adc = recall(Pq.ivfPqTopKIndexed(q, dir, k = 5, nprobe = nprobe))
        val src = recall(Pq.ivfPqTopKRefined(q, dir, k = 5, source = corpus,
          nprobe = nprobe, refine = 4))
        val half = recall(Pq.ivfPqTopKRefinedHalf(q, dir, k = 5,
          nprobe = nprobe, refine = 4))
        println(f"$name%-9s nprobe=$nprobe adc_ppm=$adc%.0f " +
          f"refine_src_ppm=$src%.0f refine_half_ppm=$half%.0f")
      }
      println(f"$name%-9s bytes: corpus+vec16=${bytes(s"$dir/corpus")} " +
        f"codes-only=${bytes(s"$dirNo/corpus")}")
    }
  }

  /** `PqProbe point /tmp/graft-vecs1000000 [nlist]` — the two-phase
    * point ADC serve vs the batch plan, one query in hand, on BOTH
    * layouts at a nlist where cells are row-group-sized (the regime
    * the r13 addendum-3 scoping note deferred: at nlist=8 a local scan
    * of the whole corpus is ~0.3 s and nothing can win; at nlist ≥
    * hundreds a point probe's nprobe cells are a sliver the pushed
    * filter can skip to). */
  private def pointProbe(spark: org.apache.spark.sql.SparkSession,
                         dir: String, nlist: Int, m: Int = 8,
                         skipHive: Boolean = false): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val em = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = em.count()
    def wall[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def drain(df: DataFrame): Long = df.count()
    val hiveDir = java.nio.file.Files.createTempDirectory("ptadc-hive").toString
    val ptDir = java.nio.file.Files.createTempDirectory("ptadc-point").toString
    def fileCount(p: String): Int = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var c = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) c += 1 }
      c
    }
    def dirBytes(p: String): Long =
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
        .getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    val (_, tH) = if (skipHive) ((), 0.0)
      else wall(Pq.buildIvfPqIndex(em, hiveDir, m = m, ks = 256,
        nlist = nlist, corpusSize = n))
    val (_, tP) = wall(Pq.buildIvfPqIndex(em, ptDir, m = m, ks = 256,
      nlist = nlist, corpusSize = n, pointLayout = true))
    if (skipHive) {
      println(f"n=$n nlist=$nlist m=$m build: point=$tP%.1fs " +
        f"(files=${fileCount(s"$ptDir/corpus")}, " +
        f"bytes=${dirBytes(s"$ptDir/corpus")})")
      val q1row = em.where(col("vec_id") === 0)
        .select("vec_id", "embedding").collect()(0)
      val q1 = Seq((q1row.getLong(0), q1row.getSeq[Float](1)))
        .toDF("vec_id", "embedding")
      for (round <- 1 to 3) {
        val (_, bP) = wall(drain(Pq.ivfPqTopKIndexed(q1, ptDir, k = 5, nprobe = 8)))
        val (_, pP) = wall(drain(Pq.ivfPqTopKPoint(q1, ptDir, k = 5, nprobe = 8)))
        println(f"1-query round $round: pointLayout batch=$bP%.2fs point=$pP%.2fs")
      }
      // the product-router siblings at the same cell count (q140's
      // serve pair) — kPerHalf = √nlist, pointLayout both
      val kph = math.max(2, math.round(math.sqrt(nlist.toDouble)).toInt)
      val imiDir = java.nio.file.Files.createTempDirectory("ptadc-imipq").toString
      val (_, tI) = wall(Pq.buildImiPqIndex(em, imiDir, m = m, ks = 256,
        kPerHalf = kph, pointLayout = true))
      println(f"imipq K=$kph (${kph * kph} cells) build: point=$tI%.1fs")
      for (round <- 1 to 3) {
        val (_, bI) = wall(drain(Pq.imiPqTopK(q1, imiDir, k = 5, nprobe = 8)))
        val (_, pI) = wall(drain(Pq.imiPqTopKPoint(q1, imiDir, k = 5, nprobe = 8)))
        println(f"1-query round $round: imipq batch=$bI%.2fs point=$pI%.2fs")
      }
      return
    }
    println(f"n=$n nlist=$nlist m=$m build: hive=$tH%.1fs (files=${fileCount(s"$hiveDir/corpus")}) " +
      f"point=$tP%.1fs (files=${fileCount(s"$ptDir/corpus")})")
    val q1row = em.where(col("vec_id") === 0)
      .select("vec_id", "embedding").collect()(0)
    val q1 = Seq((q1row.getLong(0), q1row.getSeq[Float](1)))
      .toDF("vec_id", "embedding")
    for (round <- 1 to 3) {
      val (_, bH) = wall(drain(Pq.ivfPqTopKIndexed(q1, hiveDir, k = 5, nprobe = 8)))
      val (_, pH) = wall(drain(Pq.ivfPqTopKPoint(q1, hiveDir, k = 5, nprobe = 8)))
      val (_, bP) = wall(drain(Pq.ivfPqTopKIndexed(q1, ptDir, k = 5, nprobe = 8)))
      val (_, pP) = wall(drain(Pq.ivfPqTopKPoint(q1, ptDir, k = 5, nprobe = 8)))
      println(f"1-query round $round: hive batch=$bH%.2fs point=$pH%.2fs | " +
        f"pointLayout batch=$bP%.2fs point=$pP%.2fs")
    }
  }

  /** `PqProbe imi /tmp/graft-vecs1000000` — the huge-nlist assignment
    * question (NOTES_r14: "at nlist ~ 10⁵ consider a coarse-quantizer
    * tree (IMI) if the scan shows up; record the measurement first").
    * Flat coarse quantization costs O(nlist·d) per corpus row; the
    * inverted multi-index (Babenko & Lempitsky, CVPR'12) splits the
    * vector into two halves with √nlist centroids each — the same K²
    * cell count at O(√nlist·d) per row. This probe times the corpus
    * ASSIGNMENT SCAN (the build-time cost every index over a 100 TB
    * corpus pays once per row) flat vs IMI-shaped at growing nlist.
    * Centroid VALUES don't change the FLOPs, so the probe slices
    * corpus vectors as centroids; each config runs twice, both walls
    * printed (second run is the warm number). */
  private def imiProbe(spark: org.apache.spark.sql.SparkSession,
                       dir: String): Unit = {
    import graft.functions.VectorExpressions.nearest_cell
    val em = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = em.count() // also warms the page cache for run 1
    val d = em.select(size(col("embedding"))).head().getInt(0)
    val h = d / 2
    val pool = em.orderBy("vec_id").limit(16384).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    def wall(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(s"corpus n=$n d=$d")
    for (k <- Seq(16, 32, 64, 128)) {
      val nlist = k * k
      val flat = em.select(nearest_cell(col("embedding"),
        pool.take(nlist)).as("cell"))
      val c1 = pool.take(k).map(_.take(h))
      val c2 = pool.take(k).map(_.drop(h))
      val imi = em.select(
        (nearest_cell(expr(s"slice(embedding, 1, $h)"), c1).cast("long") * k +
         nearest_cell(expr(s"slice(embedding, ${h + 1}, ${d - h})"), c2))
          .as("cell"))
      def drain(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum("cell")).head().getLong(0)
      val f1 = wall(drain(flat)); val f2 = wall(drain(flat))
      val i1 = wall(drain(imi)); val i2 = wall(drain(imi))
      println(f"nlist=$nlist%6d (K=$k%3d): flat=$f1%6.2f/$f2%6.2f s  " +
        f"imi=$i1%5.2f/$i2%5.2f s  speedup=${f2 / i2}%5.1fx")
    }
    // ---- index-level economics: flat IVF vs IMI at EQUAL cell count
    // (1024), then IMI alone where flat is impractical (16384). Build
    // wall includes training + assignment + write; file counts show
    // the layout story (flat partitionBy fans out tasks×cells files,
    // IMI's cell-keyed repartition bounds at one per cell). Recall@5
    // at equal probed-cell FRACTION. ----
    import graft.ops.Similarity
    def files(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var c = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) c += 1 }
      c
    }
    val q = em.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, em, k = 5)
      .localCheckpoint()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecall(truth, approx)
        .agg(avg("recall_ppm")).head().getDouble(0)
    val flatDir = java.nio.file.Files.createTempDirectory("imi-flat").toString
    val tFlatB = wall { Similarity.buildIvfIndex(em, flatDir, nlist = 1024); 0L }
    println(f"flat nlist=1024: build=$tFlatB%.1f s files=${files(s"$flatDir/corpus")}")
    val imiDir = java.nio.file.Files.createTempDirectory("imi-imi").toString
    val tImiB = wall { Similarity.buildImiIndex(em, imiDir, kPerHalf = 32); 0L }
    println(f"imi  K=32 (1024 cells): build=$tImiB%.1f s files=${files(s"$imiDir/corpus")}")
    for (np <- Seq(8, 32)) {
      val (rF, tF) = {
        val t0 = System.nanoTime()
        val r = recall(Similarity.ivfTopKIndexed(q, flatDir, k = 5, nprobe = np))
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (rI, tI) = {
        val t0 = System.nanoTime()
        val r = recall(Similarity.imiTopKIndexed(q, imiDir, k = 5, nprobe = np))
        (r, (System.nanoTime() - t0) / 1e9)
      }
      println(f"  nprobe=$np%3d: flat recall_ppm=$rF%.0f serve=$tF%.2f s   " +
        f"imi recall_ppm=$rI%.0f serve=$tI%.2f s")
    }
    val imi128 = java.nio.file.Files.createTempDirectory("imi-128").toString
    val tB128 = wall { Similarity.buildImiIndex(em, imi128, kPerHalf = 128); 0L }
    println(f"imi  K=128 (16384 cells): build=$tB128%.1f s " +
      f"files=${files(s"$imi128/corpus")} (flat at this nlist: assignment " +
      "alone ~42 s + 500k-file fan-out — not built)")
    for (np <- Seq(128)) { // same probed fraction as nprobe=8 at 1024
      val t0 = System.nanoTime()
      val r = recall(Similarity.imiTopKIndexed(q, imi128, k = 5, nprobe = np))
      println(f"  nprobe=$np: imi recall_ppm=$r%.0f " +
        f"serve=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }

  /** `PqProbe kmeans /tmp/graft-vecs1000000` — the r15 #1 measurement:
    * the distributed TRAINER wall, flat vs per-half (product), at the
    * huge-nlist regime the whole-corpus trainer exists for. Two
    * questions: (1) per-iteration corpus-scan cost at equal cell
    * count — flat trainCentroidsDistributed pays O(nlist·d)/row where
    * trainImiCentroidsDistributed pays O(2·√nlist·d/2)/row, so the
    * gap should match the r14 assignment-scan matrix (~121× at
    * nlist=16,384); (2) the recall consequence — corpus-trained
    * halves vs the bounded 4096-row sample-trained halves at
    * kPerHalf=128, where per-cell sample support is ~0.25 rows and
    * sample quality is what degrades first (SCALE.md r14 addendum 3
    * showed √nlist centroids train BETTER from the same sample; this
    * measures what whole-corpus training buys on top). */
  private def kmeansProbe(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Unit = {
    import graft.ops.Similarity
    val em = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = em.count() // warms the page cache
    println(s"corpus n=$n")
    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // (1) one-iteration trainer wall at equal cell count
    for (k <- Seq(64, 128)) {
      val tImi = wall(Similarity.trainImiCentroidsDistributed(
        em, kPerHalf = k, maxIter = 1))
      println(f"kPerHalf=$k%4d (${k * k}%6d cells): imi-trainer 1 iter = $tImi%6.2f s")
    }
    val tFlat = wall(Similarity.trainCentroidsDistributed(
      em, nlist = 16384, maxIter = 1))
    println(f"flat nlist=16384: flat-trainer 1 iter = $tFlat%6.2f s")
    // (2) recall: sample-trained vs corpus-trained halves, kPerHalf=128
    val q = em.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, em, k = 5).localCheckpoint()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecall(truth, approx)
        .agg(avg("recall_ppm")).head().getDouble(0)
    val sampleDir = java.nio.file.Files.createTempDirectory("km-sample").toString
    val tS = wall(Similarity.buildImiIndex(em, sampleDir, kPerHalf = 128))
    val tTrain = {
      val t0 = System.nanoTime()
      val cent = Similarity.trainImiCentroidsDistributed(em, kPerHalf = 128,
        maxIter = 5)
      val t = (System.nanoTime() - t0) / 1e9
      val corpusDir = java.nio.file.Files.createTempDirectory("km-corpus").toString
      val tC = wall(Similarity.buildImiIndex(em, corpusDir, kPerHalf = 128,
        trainedCent = Some(cent)))
      println(f"build: sample-trained=$tS%.1f s  corpus-trained: " +
        f"train(5 iter)=$t%.1f s + build=$tC%.1f s")
      for (np <- Seq(8, 32, 128)) {
        val rS = recall(Similarity.imiTopKIndexed(q, sampleDir, k = 5, nprobe = np))
        val rC = recall(Similarity.imiTopKIndexed(q, corpusDir, k = 5, nprobe = np))
        println(f"  nprobe=$np%3d: sample-trained recall_ppm=$rS%.0f  " +
          f"corpus-trained recall_ppm=$rC%.0f")
      }
      t
    }
    val _ = tTrain
  }

  /** `PqProbe imiappend <vecsDir> [kPerHalf] [shardRows]` — IMI append
    * THROUGHPUT at large corpus scale (r15 verdict #6): build the
    * exact IMI index over the corpus minus the last `shardRows` ids,
    * then append those rows as one frozen-centroid shard. The append
    * is the streaming-ingest hot loop — each appended row pays the
    * O(kPerHalf·d) per-half assignment plus its share of the
    * cell-keyed exchange — so the number that matters is rows/s, and
    * the claim under test is that it is INDEPENDENT of the base
    * index's size (the append never touches existing shards). */
  private def imiAppendProbe(spark: org.apache.spark.sql.SparkSession,
                             dir: String, kPerHalf: Int,
                             shardRows: Long): Unit = {
    import graft.ops.Similarity
    val em = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = em.count()
    val cut = n - shardRows
    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val idx = java.nio.file.Files.createTempDirectory("imi-append").toString
    val tB = wall(Similarity.buildImiIndex(em.where(col("vec_id") < cut),
      idx, kPerHalf = kPerHalf))
    println(f"base build: n=${cut} kPerHalf=$kPerHalf " +
      f"(${kPerHalf * kPerHalf} cells) wall=$tB%.1f s " +
      f"(${cut / tB}%.0f rows/s)")
    val tA = wall(Similarity.appendToImiIndex(
      em.where(col("vec_id") >= cut), idx, "b1"))
    println(f"append: rows=$shardRows wall=$tA%.1f s " +
      f"(${shardRows / tA}%.0f rows/s)")
    // replay (same shard id) must cost the same, not accumulate
    val tR = wall(Similarity.appendToImiIndex(
      em.where(col("vec_id") >= cut), idx, "b1"))
    println(f"replay: wall=$tR%.1f s")
  }

  /** `PqProbe imipq /tmp/graft-vecs1000000` — the Multi-D-ADC build
    * question: with the LAYOUT held equal (both builds pointLayout,
    * 64 cell-sorted files — so the hive fan-out is out of the
    * picture), how much of the PQ-index build does the coarse routing
    * cost at 4096 cells, and what does IMI routing do to it? Serve +
    * recall at equal probed fraction completes the picture. */
  private def imiPqProbe(spark: org.apache.spark.sql.SparkSession,
                         dir: String): Unit = {
    import graft.ops.{Pq, Similarity}
    val em = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = em.count()
    println(s"corpus n=$n")
    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val q = em.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, em, k = 5).localCheckpoint()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecall(truth, approx)
        .agg(avg("recall_ppm")).head().getDouble(0)
    val fdir = java.nio.file.Files.createTempDirectory("imipq-flat").toString
    val tF = wall(Pq.buildIvfPqIndex(em, fdir, m = 8, ks = 256, nlist = 4096,
      pointLayout = true))
    println(f"flat  IVF-PQ nlist=4096 (pointLayout): build=$tF%.1f s")
    val idir = java.nio.file.Files.createTempDirectory("imipq-imi").toString
    val tI = wall(Pq.buildImiPqIndex(em, idir, m = 8, ks = 256, kPerHalf = 64,
      pointLayout = true))
    println(f"imi   IVF-PQ K=64 (4096 cells, pointLayout): build=$tI%.1f s")
    for (np <- Seq(32, 128)) {
      val t0 = System.nanoTime()
      val rF = recall(Pq.ivfPqTopKIndexed(q, fdir, k = 5, nprobe = np))
      val tFS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rI = recall(Pq.imiPqTopK(q, idir, k = 5, nprobe = np))
      val tIS = (System.nanoTime() - t1) / 1e9
      println(f"  nprobe=$np%3d: flat recall_ppm=$rF%.0f serve=$tFS%.2f s   " +
        f"imi recall_ppm=$rI%.0f serve=$tIS%.2f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("pqprobe")
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("scale")) {
      scaleProbe(spark, args(1)); spark.stop(); return
    }
    if (args.headOption.contains("imi")) {
      imiProbe(spark, args(1)); spark.stop(); return
    }
    if (args.headOption.contains("imipq")) {
      imiPqProbe(spark, args(1)); spark.stop(); return
    }
    if (args.headOption.contains("kmeans")) {
      kmeansProbe(spark, args(1)); spark.stop(); return
    }
    if (args.headOption.contains("imiappend")) {
      imiAppendProbe(spark, args(1),
        args.lift(2).map(_.toInt).getOrElse(64),
        args.lift(3).map(_.toLong).getOrElse(1000000L))
      spark.stop(); return
    }
    if (args.headOption.contains("residual")) {
      residualProbe(spark); spark.stop(); return
    }
    if (args.headOption.contains("opq")) {
      opqProbe(spark); spark.stop(); return
    }
    if (args.headOption.contains("half")) {
      halfProbe(spark); spark.stop(); return
    }
    if (args.headOption.contains("point")) {
      // "skiphive" is a flag, not a positional — strip it first
      val pos = args.filterNot(_ == "skiphive")
      pointProbe(spark, pos(1),
        pos.lift(2).map(_.toInt).getOrElse(1024),
        pos.lift(3).map(_.toInt).getOrElse(8),
        skipHive = args.contains("skiphive"))
      spark.stop(); return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = em.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, em, k = 5)
    for (ks <- Seq(8, 16); nlist <- Seq(8); nprobe <- Seq(2, 4, 8)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"pq-$ks-$nprobe").toString
      val t0 = System.nanoTime()
      Pq.buildIvfPqIndex(em, dir, m = 8, ks = ks, nlist = nlist)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val approx = Pq.ivfPqTopKIndexed(q, dir, k = 5, nprobe = nprobe)
      val r = Similarity.annRecall(truth, approx)
        .agg(avg("recall_ppm")).head().getDouble(0)
      val tServe = (System.nanoTime() - t1) / 1e9
      println(f"ks=$ks nlist=$nlist nprobe=$nprobe recall_ppm=$r%.0f " +
        f"build=$tBuild%.2fs serve=$tServe%.2fs")
    }
    val flat = Pq.topK(q, em, k = 5, m = 8, ks = 16)
    val rf = Similarity.annRecall(truth, flat)
      .agg(avg("recall_ppm")).head().getDouble(0)
    println(f"flat m=8 ks=16 recall_ppm=$rf%.0f")
    val flat2 = Pq.topK(q, em, k = 5, m = 16, ks = 16)
    val rf2 = Similarity.annRecall(truth, flat2)
      .agg(avg("recall_ppm")).head().getDouble(0)
    println(f"flat m=16 ks=16 recall_ppm=$rf2%.0f")
    for (refine <- Seq(2, 4, 8, 16)) {
      val ref = Pq.topKRefined(q, em, k = 5, m = 8, ks = 16, refine = refine)
      val rr = Similarity.annRecall(truth, ref)
        .agg(avg("recall_ppm")).head().getDouble(0)
      println(f"refined m=8 ks=16 refine=$refine recall_ppm=$rr%.0f")
    }
    spark.stop()
  }
}
