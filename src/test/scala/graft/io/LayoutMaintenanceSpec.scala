package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compact collapses a many-small-file table to size-targeted files, data intact") {
    val out = Files.createTempDirectory("compact").resolve("t").toString
    val df = (0L until 20000L).map(i => (i, s"payload-$i")).toDF("id", "p")
    // simulate micro-batch accretion: 64 tiny files
    df.repartition(64).write.parquet(out)
    val before = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before === 64)

    val sizeOnDisk = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target ~quarter of the table per file → expect ~4 files
    val n = Io.compact(spark, out, targetBytes = sizeOnDisk / 4)
    val after = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after === n && after < 8 && after >= 2, s"got $after files")

    // nothing lost, nothing duplicated, no temp/old dirs left behind
    val back = spark.read.parquet(out)
    assert(back.count() === 20000)
    assert(back.agg(sum("id")).head().getLong(0) ===
      df.agg(sum("id")).head().getLong(0))
    assert(!new java.io.File(out + "__compact_tmp").exists())
    assert(!new java.io.File(out + "__compact_old").exists())
  }

  test("compact of an already-compact table is a no-op-sized rewrite") {
    val out = Files.createTempDirectory("compact1").resolve("t").toString
    (0L until 100L).toDF("id").coalesce(1).write.parquet(out)
    assert(Io.compact(spark, out, targetBytes = 1L << 30) === 1L)
    assert(spark.read.parquet(out).count() === 100)
  }

  test("compact preserves a hive-partitioned layout and its prunability") {
    val out = Files.createTempDirectory("compactp").resolve("t").toString
    val df = (0L until 9000L).map(i => (i, (i % 3).toString, s"p-$i"))
      .toDF("id", "part", "p")
    // accrete small files inside each partition
    df.repartition(16).write.partitionBy("part").parquet(out)
    val n = Io.compact(spark, out, targetBytes = 1L << 30)
    assert(n >= 1)
    // partition directories survive the rewrite
    val partDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("part=")).sorted
    assert(partDirs === Array("part=0", "part=1", "part=2"))
    // data intact, schema intact (partition col readable), pruning works
    val back = spark.read.parquet(out)
    assert(back.count() === 9000)
    assert(back.where(col("part") === "1").count() === 3000)
    val plan = back.where(col("part") === "1").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
  }

  test("compact repairs a crashed swap: stranded __compact_old restores first") {
    val out = Files.createTempDirectory("compactr").resolve("t").toString
    val df = (0L until 500L).toDF("id")
    df.coalesce(2).write.parquet(out)
    // simulate a crash between the two renames: table gone, copy parked
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(out),
      new org.apache.hadoop.fs.Path(out + "__compact_old")))
    assert(!new java.io.File(out).exists())
    // next compact() restores the park, then compacts normally
    Io.compact(spark, out, targetBytes = 1L << 30)
    assert(spark.read.parquet(out).count() === 500)
    assert(!new java.io.File(out + "__compact_old").exists())
    assert(!new java.io.File(out + "__compact_tmp").exists())
  }

  test("writeZOrdered preserves NULL-keyed rows (null-safe rank joins)") {
    val out = Files.createTempDirectory("zordern").resolve("t").toString
    val df = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "a"), (2L, null, "b"), (null, 30L, "c"), (null, null, "d"))
      .toDF("x", "y", "p")
    Io.writeZOrdered(df, out, numFiles = 2, "x", "y")
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    assert(back.select("p").as[String].collect().sorted === Array("a", "b", "c", "d"))
  }

  test("writeZOrdered keeps BOTH dimensions' per-file ranges narrow") {
    val out = Files.createTempDirectory("zorder").resolve("t").toString
    // a 100×100 grid, arrival order scrambled
    val df = (0 until 10000).map { i =>
      val x = (i * 7919) % 100; val y = ((i * 104729) / 100) % 100
      (x.toLong, y.toLong, i.toLong)
    }.toDF("x", "y", "payload")
    Io.writeZOrdered(df, out, numFiles = 16, "x", "y")

    val back = spark.read.parquet(out)
    assert(back.count() === 10000)
    assert(back.columns.sorted === Array("payload", "x", "y"))

    // per-file spans: a z-ordered 100×100 grid in 16 files keeps each
    // file's x and y spans well under the full domain (a single-key
    // sort leaves the other dimension spanning ~the whole range in
    // every file)
    val spans = back.groupBy(input_file_name())
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect().map(r => (r.getAs[Long]("sx"), r.getAs[Long]("sy")))
    assert(spans.length === 16)
    val meanSx = spans.map(_._1).sum.toDouble / spans.length
    val meanSy = spans.map(_._2).sum.toDouble / spans.length
    assert(meanSx < 60, s"mean x-span $meanSx")
    assert(meanSy < 60, s"mean y-span $meanSy")

    // and a small 2-D box touches a minority of files
    val touched = back.where(col("x").between(10, 20) && col("y").between(10, 20))
      .select(input_file_name()).distinct().count()
    assert(touched <= 4, s"box touched $touched of 16 files")
  }

  test("zRankCodes: exact global ranks, no single-partition window, high cardinality") {
    // 10k distinct skewed values — the cardinality regime where the old
    // Window.orderBy formulation serialized the whole dictionary through
    // one task. Codes must still be the EXACT dense-rank quantization.
    val df = (0 until 30000).map { i =>
      (math.pow(i % 10000, 1.7).toLong, i.toLong)
    }.toDF("x", "payload")
    val (codes, total, cached) = Io.zRankCodes(df, "x")
    try {
      assert(total === 10000)
      val got = codes.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(got.length === 10000)
      // monotone, full-range, and exactly the percent_rank quantization
      assert(got.head._2 === 0 && got.last._2 === 65535)
      got.zipWithIndex.foreach { case ((v, code), rank) =>
        val want = (rank.toDouble / (total - 1).toDouble * 65535).toInt
        assert(code === want, s"value $v: code $code, want $want (rank $rank)")
      }
      // structural guard: every window in the plan is partitioned — the
      // plan must never route the dictionary through one task. A
      // partitioned Window line prints THREE top-level bracket groups
      // (functions, partition spec, order spec); a global one only two.
      val windowLines = codes.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("Window [")).toSeq
      assert(windowLines.nonEmpty)
      windowLines.foreach { ln =>
        assert("\\], \\[".r.findAllIn(ln).size >= 2,
          s"unpartitioned Window in zRankCodes plan: $ln")
      }
    } finally cached.unpersist(blocking = false)
  }

  test("zRankCodes scales range buckets with key cardinality") {
    // 10k distinct values with a 100-value bucket target stands in for
    // a billion-value key at the production 1M target: the rank sort
    // must fan out past the old fixed 64 partitions, the per-bucket
    // driver collect stays ≤ bucket-count rows, and the codes remain
    // the exact dense-rank quantization regardless of bucket count
    val df = (0 until 10000).map(i => (i.toLong * 7, i.toLong))
      .toDF("x", "payload")
    val (codes, total, cached) = Io.zRankCodes(df, "x", targetPerBucket = 100L)
    try {
      assert(total === 10000)
      assert(cached.rdd.getNumPartitions === 100,
        s"expected ceil(10000/100)=100 range buckets, got ${cached.rdd.getNumPartitions}")
      val got = codes.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(got.head._2 === 0 && got.last._2 === 65535)
      got.zipWithIndex.foreach { case ((v, code), rank) =>
        val want = (rank.toDouble / (total - 1).toDouble * 65535).toInt
        assert(code === want, s"value $v: code $code, want $want (rank $rank)")
      }
      // tiny dictionaries keep the 64-bucket floor (yesterday's
      // default) — the range partitioner itself may emit fewer when
      // the dictionary has fewer distinct values than buckets
      val small = (0 until 50).map(i => (i.toLong, i.toLong)).toDF("x", "p")
      val (_, nSmall, cachedSmall) = Io.zRankCodes(small, "x")
      try {
        assert(nSmall === 50)
        assert(cachedSmall.rdd.getNumPartitions <= 64)
      } finally cachedSmall.unpersist(blocking = false)
    } finally cached.unpersist(blocking = false)
  }
}
