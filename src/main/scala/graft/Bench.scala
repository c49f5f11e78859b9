package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line.
  * Uses the noop sink so every operator in the plan actually executes
  * (a bare count() would let Catalyst prune projections). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf (builder-time only): the suite's two timed passes
      // run ALL queries in pass 1 before ANY repeats in pass 2 — at the
      // 100-entry default every pass-2 stage has been evicted and
      // recompiles. Sizing lives in GraftSession.CodegenCacheEntries.
      .config("spark.sql.codegen.cache.maxEntries", GraftSession.CodegenCacheEntries)
      .getOrCreate()
    GraftSession.tune(spark)
    // ERROR, not WARN: stray WARN lines interleaving with the final
    // metric line have already cost one round of bench history
    // (BENCH_r01 "parsed": null)
    spark.sparkContext.setLogLevel("ERROR")
    // headline = every query that scales with the sf dir (etl_* read the
    // reference's fixed-size raw fixtures; they are verified, not benched)
    // SPARK_GRAFT_BENCH_ONLY (dev loop only; unset for driver runs):
    // comma-separated query-name substrings to bench in isolation
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq).getOrElse(Nil)
    val allHeadline = SparkEntry.queries.filterNot(_._1.startsWith("etl_"))
    val headline = allHeadline
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
    // warmup: JIT + codegen + parquet-footer caches (scan, broadcast
    // join, agg paths), so the alphabetically first query doesn't absorb
    // session startup in its measurement. The SECOND run of the same
    // query is timed as `probe_sec`: a fixed stock-Spark plan (scan +
    // broadcast join + agg) whose time moves with host speed but not
    // with any graft operator — BENCH_r{N} comparisons across rounds
    // divide by it to separate host drift from plan regressions
    // (rounds 5-7 burned days on exactly that ambiguity).
    def stockProbe(): Unit = {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
      li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)), sum(round(col("l_quantity")).cast("long")))
        .write.format("noop").mode("overwrite").save()
    }
    // Second probe family, MEMORY-shaped where the stock probe is
    // scan-shaped: a multi-distinct aggregate whose Expand multiplies
    // every input row by (distinct-aggs + 1) before the hash
    // aggregate — sensitive to the block-manager/old-gen state the
    // scan probe cannot see (the r11 q48 adjudication: q48's
    // Expand-heavy plan wobbled 0.72–1.52× while the scan probe read
    // calm). Fixed plan, no graft operator.
    def memProbe(): Unit = {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey"), countDistinct("l_suppkey"),
          countDistinct("l_orderkey"), countDistinct("l_quantity"))
        .write.format("noop").mode("overwrite").save()
    }
    stockProbe() // warmup (untimed: absorbs session startup + codegen)
    memProbe()
    def timedProbe(): Double = {
      val t0 = System.nanoTime(); stockProbe(); (System.nanoTime() - t0) / 1e9
    }
    def timedMemProbe(): Double = {
      val t0 = System.nanoTime(); memProbe(); (System.nanoTime() - t0) / 1e9
    }
    val probeSec = timedProbe()
    val memProbeSec = timedMemProbe()
    // All interleaved probes of the whole run as (query-index, sec):
    // a single start-of-run probe is blind to a host window opening
    // mid-suite (the r10 phantom-regression adjudication) — probes run
    // at each pass start, every `ProbeEvery` queries, and at pass end.
    // Their VALUES are noisy (measured 2× within-run wobble on a quiet
    // host — each probe sits in whatever GC/cache state the preceding
    // queries left), so they are not a normalization source; what IS
    // robust is comparing the probe at the same timeline position
    // across two runs — a host window shows up as a contiguous stretch
    // of elevated position-matched ratios, which benchdiff uses to
    // adjudicate host-vs-code without re-running the suite. Both
    // families emit at the same positions; benchdiff reads both.
    val ProbeEvery = 25
    val probes = scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, probeSec))
    val memProbes = scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, memProbeSec))
    // SPARK_GRAFT_BENCH_SHUFFLE=<seed>: run the suite in a seeded-
    // shuffled order instead of alphabetical. Positional interference
    // (one query's block/old-gen residue inflating its alphabetical
    // successors) follows the ORDER; a code regression follows the
    // QUERY — comparing a shuffled run against an alphabetical one
    // separates the two without isolated reruns. The seed rides in
    // the JSON so benchdiff refuses to position-match probe timelines
    // from differently-ordered runs (per-query comparisons are
    // order-independent and stay valid).
    val shuffleSeed = sys.env.get("SPARK_GRAFT_BENCH_SHUFFLE").map(_.toLong)
    val ordered = {
      val base = headline.toSeq.sortBy(_._1)
      shuffleSeed match {
        case Some(seed) => new scala.util.Random(seed).shuffle(base)
        case None       => base
      }
    }
    // SPARK_GRAFT_BENCH_PRE=N (dev loop only, requires ONLY): before each
    // timed pass, run the N queries alphabetically preceding the first
    // selected query — untimed, through the identical execute/cleanup
    // path — so in-suite state effects (block-manager pressure, old-gen
    // fill, codegen-cache churn) reproduce locally. The r7 q89 defect
    // (38 s in the driver's 107-query suite, 5.65 s isolated) was
    // invisible to every isolated measurement; this mode is the repro.
    val preamble: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
      val n = sys.env.get("SPARK_GRAFT_BENCH_PRE").map(_.toInt).getOrElse(0)
      if (n <= 0 || ordered.isEmpty) Nil
      else allHeadline.toSeq.sortBy(_._1)
        .takeWhile(_._1 != ordered.head._1).takeRight(n)
    }
    // Two timed passes per query; report the per-query minimum. Pass 1
    // absorbs JIT compilation and whole-stage-codegen class generation
    // for each query's own operator mix (LSH generators, ANN aggregates,
    // window paths); the minimum also rejects external-load noise on a
    // shared host. Reported numbers are steady-state throughput — the
    // quantity that matters on a long-lived cluster — not single-JVM
    // cold-start, matching the methodology of SCALE.md / BASELINE.md.
    // A failed attempt records None, never its elapsed time — an
    // analysis-time failure measures near zero and would silently
    // deflate the min-of-passes and the total.
    def runOne(name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val t = (System.nanoTime() - t0) / 1e9
      // between queries (untimed): drop the finished query's
      // localCheckpoint blocks — iterative operators (PageRank, CC, BPE)
      // persist their loop carriers, and 100+ queries of accumulated
      // blocks shrink execution memory for everything measured after
      // them (the round-3 q89 measurement-context gap). Then let the
      // ContextCleaner reap broadcast blocks.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      (ok, t)
    }
    def timedPass(): Seq[(String, Option[Double])] = {
      preamble.foreach { case (n, fn) => runOne(n, fn) }
      def probeAt(pos: Int): Unit = {
        probes += ((pos, timedProbe()))
        memProbes += ((pos, timedMemProbe()))
      }
      probeAt(0)
      val raw = ordered.zipWithIndex.map { case ((name, fn), i) =>
        if (i > 0 && i % ProbeEvery == 0) probeAt(i)
        val (ok, t) = runOne(name, fn)
        name -> (if (ok) Some(t) else None)
      }
      probeAt(ordered.size)
      raw
    }
    val pass1 = timedPass().toMap
    val results = timedPass().map { case (name, t2) =>
      // min over the passes that succeeded; None only if both failed
      name -> (t2.toSeq ++ pass1(name).toSeq).minOption
    }
    val timed = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = timed.map(_._2).sum
    // The driver captures a bounded 2000-byte tail of the sbt log;
    // BENCH_r02's "parsed": null was the full-name, full-precision
    // line (~1.9 KB) overflowing that window and losing its head. The
    // parsed line uses the qNN prefix and TWO-decimal seconds — at 123
    // queries + two probe timelines the 3-decimal form measured 1950
    // bytes (50 under the window; one more query or failed entry would
    // clip). 2 dp is lossless for benchdiff's purposes: flags require
    // > 0.2 s absolute movement, where 0.01 s rounding is ≤ 2.5%. The
    // full-name, full-precision record goes to a file instead.
    def fmt(v: Double) = f"$v%.2f"
    val qsShort = timed.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // probes ride in BOTH lines (~170 bytes/family: [[pos,sec],...]) —
    // the driver keeps only the short line, and benchdiff's host-window
    // adjudication needs the probe timelines from the driver's files
    val psShort = probes.map { case (p, s) => s"[$p,${fmt(s)}]" }
      .mkString("[", ",", "]")
    val mpShort = memProbes.map { case (p, s) => s"[$p,${fmt(s)}]" }
      .mkString("[", ",", "]")
    val seedField = shuffleSeed.map(s => s""","shuffle_seed":$s""").getOrElse("")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":2,"probe_sec":${fmt(probeSec)},"mem_probe_sec":${fmt(memProbeSec)},"probes":$psShort,"mem_probes":$mpShort$seedField,"queries":$qsShort,"failed":$fs,"sf":"$sfDir"}"""
    val qsFull = timed.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val psFull = probes.map { case (p, s) => s"[$p,$s]" }
      .mkString("[", ",", "]")
    val mpFull = memProbes.map { case (p, s) => s"[$p,$s]" }
      .mkString("[", ",", "]")
    val jsonFull =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":2,"probe_sec":$probeSec,"mem_probe_sec":$memProbeSec,"probes":$psFull,"mem_probes":$mpFull$seedField,"queries":$qsFull,"failed":$fs,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (jsonFull + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] full-json write failed: $e") }
    // stop FIRST, print LAST: nothing (shutdown logs, sbt chatter) may
    // follow the metric line on stdout — the driver parses it verbatim
    spark.stop()
    println(json)
  }
}
