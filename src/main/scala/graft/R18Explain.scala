package graft

import org.apache.spark.sql.functions._

/** Dev capture (round 18): the per-round PageRank `iterate` physical
  * plan — the structural unit the carrier change touches (the final
  * q89 plan is checkpoint-truncated, so the loop shape is invisible
  * there). Synthetic inputs mirror PlanRegressionSpec. */
object R18Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("r18-explain")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val raw = (und ++ und.map(_.swap)).toDF("src", "dst").localCheckpoint(true)
    val outdeg = raw.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val nodes0 = raw.select(col("src").as("node")).distinct()
    val nodesDeg = nodes0
      .join(outdeg, nodes0("node") === outdeg("src"), "left")
      .select(col("node"), col("outdeg")).localCheckpoint(true)
    val ranks = nodesDeg
      .select(col("node"), col("outdeg"), lit(1000000L).as("rank"))
      .localCheckpoint(true)
    val round = graft.ops.Graph.iterate(raw, nodesDeg, ranks, 0L)
    // format: same as plans/r18 files — formatted explain of one round
    println("========== q89 pageRank one iterate round (after) ==========")
    println(round.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
