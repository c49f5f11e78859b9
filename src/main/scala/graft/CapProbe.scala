package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev probe for the round-10 cap boundaries: measures the ANN/semantic
  * operators PAST the old constant caps on distinct-vector replicas
  * (`ScaleUp vecs <n>`), in both the capped (old-constant) and
  * derived-cap (raised maxTrain) regimes. Results land in SCALE.md.
  *
  * Modes:
  *  - `semdedup <n>...` — semDedup wall at each /tmp/graft-vecs<n>,
  *    default maxTrain (old cap 256) vs maxTrain=16384 (cap 1024).
  *    Past ~65k distinct vectors the default regime's per-cell pair
  *    term grows ∝ n²/256 while the derived cap resumes ~n·targetCell.
  *  - `srp <n> <planes>...` — cosineNearDuplicatesLsh pair-search wall
  *    at one replica for each explicit plane count: an
  *    occupancy-regime sweep. occupancy = n/2^p, so each plane NOT
  *    granted by a cap doubles per-bucket occupancy and the pair term;
  *    measuring p, p-2, p-4 at fixed n reproduces what a capped p
  *    does at 4x and 16x the corpus.
  *  - `ivf <dir> <nprobe>...` — ivfTopK recall (mean recall_ppm via
  *    annRecall vs brute force, 100 queries) + wall per nprobe on an
  *    embeddings dir (e.g. the docs100 replica) — the recall-vs-nprobe
  *    curve the auto-sized nlist asks callers to pick from.
  */
object CapProbe {
  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("cap-probe")
    def vecs(n: Long) = spark.read.parquet(s"/tmp/graft-vecs$n/embeddings.parquet")
    args.headOption.getOrElse("semdedup") match {
      case "viral" =>
        // the r17 verdict's weak item, measured: a planted viral domain
        // (`viralRows` URLs in ONE domain) over a long tail of small
        // domains; capPerKeyNaive serializes the viral domain through
        // one task's sort, the two-phase capPerKey splits it across
        // 1024 hash buckets. Reports wall time and the MAX single-task
        // duration/row-count of each run (the boundedness claim).
        // the naive form's reduce-side concentration is cap × mapTasks
        // rows in ONE task (the map-side partial WindowGroupLimit keeps
        // `cap` viral rows per map task; every survivor hashes to the
        // SAME reduce task) — so the probe models a large cluster's map
        // fan-in with `inputParts` input partitions. The two-phase form
        // spreads the viral domain over 1024 hash buckets and lets AQE
        // balance by bytes.
        val viralRows = if (args.length > 1) args(1).toLong else 20000000L
        val tailDomains = if (args.length > 2) args(2).toLong else 100000L
        val inputParts = if (args.length > 3) args(3).toInt else 512
        val cap = 1000
        val viral = spark.range(viralRows)
          .selectExpr("id", "'viral.example.org' AS domain")
        val smalls = spark.range(tailDomains * 5)
          .selectExpr(s"id + ${viralRows}L AS id",
            s"concat('host', id % $tailDomains, '.example.org') AS domain")
        val urls = viral.union(smalls)
          .repartition(inputParts).localCheckpoint(true)
        val sc = spark.sparkContext
        @volatile var maxTaskMs = 0L
        @volatile var maxTaskRows = 0L
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            if (t.taskInfo != null && t.taskMetrics != null) {
              maxTaskMs = math.max(maxTaskMs, t.taskInfo.duration)
              maxTaskRows = math.max(maxTaskRows,
                t.taskMetrics.shuffleReadMetrics.recordsRead)
            }
          }
        }
        sc.addSparkListener(listener)
        for ((name, fn) <- Seq(
            "naive" -> (() => graft.ops.Sampling.capPerKeyNaive(
              urls, org.apache.spark.sql.functions.col("domain"),
              org.apache.spark.sql.functions.col("id"), cap)),
            "two-phase" -> (() => graft.ops.Sampling.capPerKey(
              urls, org.apache.spark.sql.functions.col("domain"),
              org.apache.spark.sql.functions.col("id"), cap)))) {
          maxTaskMs = 0L; maxTaskRows = 0L
          sc.setJobDescription(s"capPerKey viral: $name")
          val (cnt, w) = time {
            fn().write.format("noop").mode("overwrite").save()
          }
          Thread.sleep(500) // let the listener bus drain task-end events
          println(f"viral $name viralRows=$viralRows tail=$tailDomains " +
            f"wall=$w%.1fs maxTaskMs=$maxTaskMs maxTaskShuffleRows=$maxTaskRows")
          val _ = cnt
        }
        sc.removeSparkListener(listener)
      case "semdedup" =>
        val sizes = if (args.length > 1) args.drop(1).map(_.toLong) else Array(65536L, 262144L)
        for (n <- sizes; mt <- Seq(4096, 16384)) {
          val nlist = Similarity.semDedupNlist(n, maxTrain = mt)
          val (cnt, w) = time {
            Similarity.semDedup(vecs(n), maxTrain = mt).count()
          }
          println(f"semdedup n=$n maxTrain=$mt nlist=$nlist kept=$cnt wall=$w%.1fs")
        }
      case "srp" =>
        val n = args(1).toLong
        val v = vecs(n)
        for (p <- args.drop(2).map(_.toInt)) {
          val occ = n.toDouble / (1 << p)
          val (cnt, w) = time {
            Similarity.cosineNearDuplicatesLsh(v, threshold = 0.4, planes = p).count()
          }
          println(f"srp n=$n planes=$p occupancy=$occ%.0f pairs=$cnt wall=$w%.1fs")
        }
      case "recall" =>
        // single-probe vs the new multi-probe default at the auto-scaled
        // plane count, on the cluster-free (uniform) corpus where
        // single-probe recall collapses — extends the r9 recall table
        val n = args(1).toLong
        val v = vecs(n)
        val q = v.where(col("vec_id") < 100)
        val p = Similarity.srpPlanesFor(n, targetBucket = 4096)
        val truth = Similarity.bruteForceTopK(q, v, k = 10).cache()
        truth.count()
        def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
          Similarity.annRecall(truth, approx)
            .agg(avg("recall_ppm")).head.getDouble(0) / 10000.0
        val (r1, w1) = time {
          meanRecall(Similarity.lshTopK(q, v, k = 10, planes = p))
        }
        println(f"recall n=$n planes=$p single-probe recall=$r1%.1f%% wall=$w1%.1fs")
        val (rm, wm) = time {
          meanRecall(Similarity.lshTopK(q, v, k = 10))  // auto: multi-probe
        }
        println(f"recall n=$n planes=$p multi-probe(default) recall=$rm%.1f%% wall=$wm%.1fs")
      case "ivf" =>
        val emb = spark.read.parquet(s"${args(1)}/embeddings.parquet")
        val q = emb.where(col("vec_id") < 100)
        val nlist = Similarity.ivfNlistFor(emb.count())
        val (truth, tw) = time {
          Similarity.bruteForceTopK(q, emb, k = 10).cache()
        }
        truth.count()
        println(f"ivf truth (brute force) wall=$tw%.1fs nlist=$nlist")
        for (np <- args.drop(2).map(_.toInt)) {
          val (rec, w) = time {
            val approx = Similarity.ivfTopK(q, emb, k = 10, nprobe = np)
            Similarity.annRecall(truth, approx)
              .agg(avg("recall_ppm")).head.getDouble(0)
          }
          println(f"ivf nprobe=$np mean_recall_ppm=$rec%.0f wall=$w%.1fs")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
