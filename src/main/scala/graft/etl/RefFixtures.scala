package graft.etl

import java.nio.file.{Files, Path, Paths}

/** Stages an input directory shaped like the reference's raw-data dir:
  * symlinks to the real (read-only) files plus a generated temperature
  * CSV, since that source is stripped from the reference repo
  * (FIXTURES.md A10). Shared by the ETL bench and the golden specs. */
object RefFixtures {

  val RawDir = "/root/reference/dags/data/raw-data"

  val RequiredInputs: Seq[String] = Seq(
    "internal_country_codes.txt", "country_codes.csv",
    "unmatched_countries_updated.csv", "airlines.csv",
    "port_of_entry.txt", "us-cities-demographics.csv", "sas_data")

  val DefaultTemperatureRows: Seq[String] = Seq(
    "dt,AverageTemperature,AverageTemperatureUncertainty,Country",
    "1950-01-01,10.5,0.3,Afghanistan",
    "1950-02-01,11.0,0.2,Albania")

  /** Create a temp input dir; returns its path. */
  def stage(temperatureRows: Seq[String] = DefaultTemperatureRows): Path = {
    val dir = Files.createTempDirectory("etl-input")
    RequiredInputs.foreach { f =>
      Files.createSymbolicLink(dir.resolve(f), Paths.get(s"$RawDir/$f"))
    }
    Files.write(dir.resolve("GlobalLandTemperaturesByCountry.csv"),
      temperatureRows.mkString("\n").getBytes)
    dir
  }
}
