package graft

import java.nio.file.{Files, Paths}

import graft.etl.CapstoneEtl

/** Dev benchmark: time the full reference ETL (build → write 13 tables →
  * quality gates) over the reference's own raw data (3.1M-row April-2016
  * I94 extract + all dimension inputs). Prints one JSON line. */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("etl-bench")
    val in = graft.etl.RefFixtures.stage()
    val out = Files.createTempDirectory("etl-bench-out").toString
    val t0 = System.nanoTime()
    CapstoneEtl.run(spark, in.toString, out)
    val secs = (System.nanoTime() - t0) / 1e9
    val factRows = spark.read.parquet(s"$out/fact_immigration.parquet").count()
    println(s"""{"metric":"etl_pipeline","value":$secs,"unit":"sec","fact_rows":$factRows,"tables":13,"rows_per_sec":${(factRows / secs).toLong}}""")
    spark.stop()
  }
}
