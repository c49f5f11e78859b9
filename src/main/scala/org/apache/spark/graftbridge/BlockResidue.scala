package org.apache.spark.graftbridge

import org.apache.spark.SparkContext
import org.apache.spark.storage.{BlockId, BroadcastBlockId, RDDBlockId}

/** Bridge into Spark's private[spark] block-manager surface, for
  * graft.Bench's cross-query residue accounting only — never on a
  * query path. Lives under org.apache.spark so the private[spark]
  * members resolve (the [[org.apache.spark.sql.graftbridge
  * .ColumnBridge]] convention).
  *
  * Why it exists: the bench suite runs 124+ queries × 2 passes in one
  * JVM; each query's broadcast joins leave broadcast blocks whose
  * cleanup is ASYNC (ContextCleaner reaps them only after the driver
  * GCs the Broadcast handle and the reap queue drains). Residue that
  * accumulates across a pass shrinks the storage pool every later
  * query sees — the positional-interference mechanism BASELINE.md's
  * round-12 adjudication documents. Bench reports it per pass end and
  * hard-drops broadcast blocks between queries. */
object BlockResidue {

  /** (broadcast blocks, broadcast bytes, rdd blocks, rdd bytes,
    * other blocks, other bytes) currently in the local block manager —
    * the residue a pass leaves behind. */
  def residue(sc: SparkContext): (Int, Long, Int, Long, Int, Long) = {
    val bm = sc.env.blockManager
    var bc = 0; var bcB = 0L; var rdd = 0; var rddB = 0L; var oth = 0; var othB = 0L
    bm.getMatchingBlockIds(_ => true).foreach { id =>
      val size = bm.getStatus(id).map(s => s.memSize + s.diskSize).getOrElse(0L)
      id match {
        case _: BroadcastBlockId => bc += 1; bcB += size
        case _: RDDBlockId       => rdd += 1; rddB += size
        case _                   => oth += 1; othB += size
      }
    }
    (bc, bcB, rdd, rddB, oth, othB)
  }

  /** Drop EVERY broadcast's blocks, synchronously. Only legal between
    * queries (no job may be mid-flight — a stage still reading one of
    * these broadcasts would lose it); Bench calls it after a query's
    * action has returned and before the next starts. Idempotent.
    *
    * The safety invariant this relies on — no operator holds a
    * broadcast handle across queries (every broadcast is a per-plan
    * exchange of a finished query) — is enforced two ways rather than
    * assumed: (a) the drop refuses to run while any job is active
    * (the invariant's only failure mode that can corrupt a RESULT is
    * a mid-flight stage losing its broadcast); (b) a failed
    * removeBroadcast degrades to a stderr warning instead of aborting
    * the pass — a future memoized/cached DataFrame re-used across
    * queries would then surface as a logged re-broadcast, never a
    * hard bench failure. */
  def dropAllBroadcastBlocks(sc: SparkContext): Int = {
    // active jobs ⇒ a stage may be mid-read of one of these blocks.
    // statusTracker is LISTENER-BUS async: a job whose action already
    // returned can linger "active" for a few ms until the bus drains
    // (measured: 11 of 133 between-query calls saw one) — so WAIT for
    // the tracker to read idle before concluding anything, and only
    // skip if something is genuinely still running after the grace
    // window (a caller violating the between-queries contract).
    var waited = 0
    while (sc.statusTracker.getActiveJobIds().nonEmpty && waited < 500) {
      Thread.sleep(10); waited += 10
    }
    if (sc.statusTracker.getActiveJobIds().nonEmpty) {
      System.err.println("[BlockResidue] active job(s) still running " +
        s"after ${waited}ms -- skipping the broadcast-block drop this round")
      return 0
    }
    val bm = sc.env.blockManager
    val ids = bm.getMatchingBlockIds {
      case _: BroadcastBlockId => true
      case _ => false
    }.collect { case b: BroadcastBlockId => b.broadcastId }.distinct
    var dropped = 0
    ids.foreach { id =>
      try {
        bm.master.removeBroadcast(id, removeFromMaster = true, blocking = true)
        dropped += 1
      } catch {
        // NonFatal only: an InterruptedException (bench shutdown mid
        // blocking RPC) must propagate with the interrupt flag intact,
        // and VM errors must never degrade to a warning
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[BlockResidue] removeBroadcast($id) " +
            s"failed (degrading to a warning): $e")
      }
    }
    dropped
  }
}
