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
    * action has returned and before the next starts. Idempotent. */
  def dropAllBroadcastBlocks(sc: SparkContext): Int = {
    val bm = sc.env.blockManager
    val ids = bm.getMatchingBlockIds {
      case _: BroadcastBlockId => true
      case _ => false
    }.collect { case b: BroadcastBlockId => b.broadcastId }.distinct
    ids.foreach(id =>
      bm.master.removeBroadcast(id, removeFromMaster = true, blocking = true))
    ids.size
  }
}
