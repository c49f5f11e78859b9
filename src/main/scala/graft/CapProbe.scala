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
