package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Io

/** The typed facade must bind to the real ETL outputs — not to a schema
  * someone wished the pipeline had. */
class TypedTablesSpec extends SparkSpec {
  import TypedTables._
  import spark.implicits._

  private lazy val inputDir = RefFixtures.stage().toString

  test("fact_immigration binds as Dataset[FactImmigration] and supports typed ops") {
    val df = CapstoneEtl.factImmigration(
      Io.readParquet(spark, s"$inputDir/sas_data"))
    val ds = df.as[FactImmigration]
    // typed filter + map on the April 2016 extract
    val arrivals = ds.filter(_.arrival_date_key.isDefined)
      .map(_.arrival_date_key.get.toString.take(7))
    assert(arrivals.distinct().collect().forall(_.startsWith("2016")))
    // a boolean field deserializes as a primitive (non-nullable contract)
    assert(ds.head(100).forall(r => r.match_flag || !r.match_flag))
  }

  test("dim_countries and dim_date bind typed; encoder schema names match output") {
    val stg = CapstoneEtl.stagingCountries(
      CapstoneEtl.stagingIntCountries(
        Io.readText(spark, s"$inputDir/internal_country_codes.txt")),
      CapstoneEtl.unmatchedCountries(
        Io.readCsvUntyped(spark, s"$inputDir/unmatched_countries_updated.csv")),
      CapstoneEtl.stagingCountryCodes(
        Io.readCsv(spark, s"$inputDir/country_codes.csv", CapstoneEtl.countryCodesSchema)))
    val dc = CapstoneEtl.dimCountries(stg).as[DimCountry]
    assert(dc.count() === 236)
    assert(dc.schema.fieldNames.toSeq ===
      dimCountryEnc.schema.fieldNames.toSeq)

    val dd = CapstoneEtl.dimDate(CapstoneEtl.factImmigration(
      Io.readParquet(spark, s"$inputDir/sas_data"))).as[DimDate]
    // typed aggregation: ISO weeks stay in [1, 53]
    val weeks = dd.map(_.week).distinct().collect()
    assert(weeks.forall(w => w >= 1 && w <= 53))
  }

  test("a wished-for column is an analysis error, not a silent null") {
    implicit val enc = org.apache.spark.sql.Encoders.product[WrongPortSchema]
    val df = CapstoneEtl.dimPortOfEntry(
      Io.readText(spark, s"$inputDir/port_of_entry.txt"))
    val e = intercept[org.apache.spark.sql.AnalysisException](
      df.as[WrongPortSchema])
    assert(e.getMessage.toLowerCase.contains("no_such_column"))
  }
}

/** Deliberately wrong contract for the analysis-error test (top-level:
  * product encoders need a TypeTag, which local classes lack). */
final case class WrongPortSchema(port_of_entry_key: String, no_such_column: String)
