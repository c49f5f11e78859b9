package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe: phase-by-phase timing of q89 (partRank), replicating
  * Graph.pageRank's body. Not part of the engine surface. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graph-probe")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    for (round <- 1 to 2) {
      println(s"=== pass $round ===")
      val edges = timed("ck(edges)") {
        graft.ops.Graph.coPurchaseEdges(li).select("src", "dst").localCheckpoint(true)
      }
      val outdeg = timed("ck(outdeg)") {
        edges.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
      }
      val nodes = timed("ck(nodes)") {
        edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct().localCheckpoint(true)
      }
      timed("dangling isEmpty") {
        val d = nodes.join(outdeg, nodes("node") === outdeg("src"), "left_anti")
        println(s"  (dangling empty: ${d.isEmpty})")
      }
      var ranks: DataFrame = nodes.select(col("node"), lit(1000000L).as("rank"))
      var keep: List[DataFrame] = Nil
      for (i <- 1 to 5) {
        ranks = graft.ops.Graph.iterate(edges, outdeg, nodes, ranks, 0L).persist()
        keep = ranks :: keep
        keep.drop(2).foreach(_.unpersist(blocking = false))
        keep = keep.take(2)
      }
      timed("consume loop (noop write)") {
        ranks.write.format("noop").mode("overwrite").save()
      }
      timed("consume again (persisted)") {
        ranks.write.format("noop").mode("overwrite").save()
      }
      // the per-round broadcast REBUILD share (the untried q89 lever):
      // what one round's build side costs to compute and collect —
      // ranks ⋈ outdeg is node-sized, so if this is small relative to
      // a round (consume loop / 5), a persisted broadcast variable
      // cannot buy anything
      timed("one round's broadcast build (node join + collect)") {
        val n = ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
          .select(ranks("node"), expr("rank div outdeg").as("c"))
          .collect().length
        println(s"  (build side rows: $n)")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
