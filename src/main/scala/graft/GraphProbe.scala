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
      val nodesDeg = timed("ck(nodesDeg)") {
        val nodes0 = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        nodes0.join(outdeg, nodes0("node") === outdeg("src"), "left")
          .select(col("node"), col("outdeg")).localCheckpoint(true)
      }
      timed("dangling isEmpty") {
        val d = nodesDeg.where(col("outdeg").isNull)
        println(s"  (dangling empty: ${d.isEmpty})")
      }
      var ranks: DataFrame = nodesDeg
        .select(col("node"), col("outdeg"), lit(1000000L).as("rank"))
      var keep: List[DataFrame] = Nil
      for (i <- 1 to 5) {
        ranks = graft.ops.Graph.iterate(edges, nodesDeg, ranks, 0L).persist()
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
      timed("one round's broadcast build (carrier projection + collect)") {
        val n = ranks.where(col("outdeg").isNotNull)
          .select(col("node"), expr("rank div outdeg").as("c"))
          .collect().length
        println(s"  (build side rows: $n)")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
