package graft

/** Dev scratchpad: flagship-entry smoke (the skill contract — expect 5
  * region rows); repurpose locally for plan inspection as needed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // driver vs distributed equivalence, 8 merges
    val drv = graft.ops.LangModel.bpeLoop(docs, 8, "text", None, Long.MaxValue)
    val dst = graft.ops.LangModel.bpeLoop(docs, 8, "text", None, 0L)
    val md = drv._2.collect().map(_.toSeq).toList
    val ms = dst._2.collect().map(_.toSeq).toList
    println("MERGES_EQ=" + (md == ms))
    md.zip(ms).foreach { case (a, b) => if (a != b) println(s"DIFF $a vs $b") }
    md.foreach(println)
    val vd = drv._1.collect().map(_.toSeq).toSet
    val vs = dst._1.collect().map(_.toSeq).toSet
    println("VOCAB_EQ=" + (vd == vs) + " size=" + vd.size)
    (vd -- vs).take(3).foreach(r => println("ONLY_DRV " + r))
    (vs -- vd).take(3).foreach(r => println("ONLY_DST " + r))
    // 100-merge driver train timing + job count
    val sc = spark.sparkContext
    var jobs = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    })
    val t0 = System.nanoTime()
    val m100 = graft.ops.LangModel.bpeTrain(docs, nMerges = 100)
    println("m100_rows=" + m100.count())
    println("m100_sec=" + (System.nanoTime() - t0) / 1e9 + " jobs=" + jobs)
    spark.stop()
  }
}
