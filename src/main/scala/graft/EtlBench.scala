package graft

import java.nio.file.{Files, Paths}

import graft.etl.CapstoneEtl

/** Dev benchmark: time the full reference ETL (build → write 13 tables →
  * quality gates) over the reference's own raw data (3.1M-row April-2016
  * I94 extract + all dimension inputs). Prints one JSON line. */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("etl-bench")
    val in = Files.createTempDirectory("etl-bench-in")
    Seq("internal_country_codes.txt", "country_codes.csv",
        "unmatched_countries_updated.csv", "airlines.csv",
        "port_of_entry.txt", "us-cities-demographics.csv", "sas_data")
      .foreach { f =>
        Files.createSymbolicLink(in.resolve(f),
          Paths.get(s"/root/reference/dags/data/raw-data/$f"))
      }
    Files.write(in.resolve("GlobalLandTemperaturesByCountry.csv"),
      Seq("dt,AverageTemperature,AverageTemperatureUncertainty,Country",
          "1950-01-01,10.5,0.3,Afghanistan",
          "1950-02-01,11.0,0.2,Albania").mkString("\n").getBytes)
    val out = Files.createTempDirectory("etl-bench-out").toString
    val t0 = System.nanoTime()
    CapstoneEtl.run(spark, in.toString, out)
    val secs = (System.nanoTime() - t0) / 1e9
    val factRows = spark.read.parquet(s"$out/fact_immigration.parquet").count()
    println(s"""{"metric":"etl_pipeline","value":$secs,"unit":"sec","fact_rows":$factRows,"tables":13,"rows_per_sec":${(factRows / secs).toLong}}""")
    spark.stop()
  }
}
