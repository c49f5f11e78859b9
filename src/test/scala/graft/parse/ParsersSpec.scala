package graft.parse

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Parser expressions against literal lines lifted from the reference's
  * raw files (SURVEY.md §2.11, §5). */
class ParsersSpec extends SparkSpec {

  private def parseOne(line: String, code: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                       name: org.apache.spark.sql.Column => org.apache.spark.sql.Column): (String, String) = {
    import spark.implicits._
    val df = Seq(line).toDF("value")
      .select(code(col("value")).as("c"), name(col("value")).as("n"))
    val r = df.head()
    (r.getString(0), r.getString(1))
  }

  test("country line: real formats from internal_country_codes.txt") {
    // dags/data/raw-data/internal_country_codes.txt:1 and the MEXICO quirk line
    assert(parseOne("582 =  'MEXICO Air Sea, and Not Reed (I-94, no land arrivals)'",
      Parsers.parseCountryCode, Parsers.parseCountryName) ===
      ("582", "MEXICO Air Sea, and Not Reed (I-94, no land arrivals)"))
    assert(parseOne("236 =  'AFGHANISTAN'",
      Parsers.parseCountryCode, Parsers.parseCountryName) === ("236", "AFGHANISTAN"))
  }

  test("country line: non-matching input yields empty strings, not a crash") {
    assert(parseOne("garbage with no equals",
      Parsers.parseCountryCode, Parsers.parseCountryName) === ("", ""))
  }

  test("port line: tab-separated quoted pair with trailing space in name") {
    // dags/data/raw-data/port_of_entry.txt:1 shape
    assert(parseOne("'ALC'\t=\t'ALCAN, AK '",
      Parsers.parsePortCode, Parsers.parsePortName) === ("ALC", "ALCAN, AK"))
  }

  test("iso code: first code of 'AL / ALB'; null-safe") {
    import spark.implicits._
    val out = Seq(Some("AL / ALB"), Some("US / USA"), None).toDF("iso")
      .select(Parsers.parseIsoCode(col("iso")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("AL"), Some("US"), None))
  }

  test("gdp: leading number of '20.65 Billion'; null stays null") {
    import spark.implicits._
    val out = Seq(Some("20.65 Billion"), Some("977 Million"), None).toDF("g")
      .select(Parsers.parseGdpUsd(col("g")).as("v"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("20.65"), Some("977"), None))
  }

  test("sas date: known epoch offsets and null/NaN tolerance") {
    import spark.implicits._
    // 20566.0 → 2016-04-22 (immigration_data_sample.csv:2)
    val out = Seq(Some(20566.0), Some(0.0), None, Some(Double.NaN)).toDF("d")
      .select(Parsers.sasDate(col("d")).as("dt"))
      .collect().map(r => Option(r.getDate(0)).map(_.toString))
    assert(out.toSeq === Seq(Some("2016-04-22"), Some("1960-01-01"), None, None))
  }

  test("whole reference files parse without empty outputs") {
    val ic = spark.read.text("/root/reference/dags/data/raw-data/internal_country_codes.txt")
      .select(Parsers.parseCountryCode(col("value")).as("c"),
              Parsers.parseCountryName(col("value")).as("n"))
    assert(ic.count() === 236)
    assert(ic.where(col("c") === "" || col("n") === "").count() === 0)
    val po = spark.read.text("/root/reference/dags/data/raw-data/port_of_entry.txt")
      .select(Parsers.parsePortCode(col("value")).as("c"),
              Parsers.parsePortName(col("value")).as("n"))
    assert(po.count() === 591)
    assert(po.where(col("c") === "").count() === 0)
  }

  test("property: generated 'code = NAME' lines round-trip") {
    import spark.implicits._
    val gen = for {
      code <- Gen.choose(1, 999)
      name <- Gen.nonEmptyListOf(Gen.alphaUpperChar).map(_.mkString)
    } yield (code, name)
    val samples = Gen.listOfN(50, gen).sample.get
    val lines = samples.map { case (c, n) => s"$c =  '$n'" }
    val parsed = lines.toDF("value")
      .select(Parsers.parseCountryCode(col("value")).as("c"),
              Parsers.parseCountryName(col("value")).as("n"))
      .collect().map(r => (r.getString(0).toInt, r.getString(1)))
    assert(parsed.toSeq === samples)
  }

  test("property: sas date total on any int offset") {
    import spark.implicits._
    val offsets = Gen.listOfN(60, Gen.choose(-30000, 30000)).sample.get.distinct
    val got = offsets.map(_.toDouble).toDF("d")
      .select(col("d"), Parsers.sasDate(col("d")).as("dt"))
      .collect().map(r => r.getDouble(0).toInt -> r.getDate(1).toLocalDate)
    got.foreach { case (d, dt) =>
      assert(dt === java.time.LocalDate.of(1960, 1, 1).plusDays(d))
    }
  }
}
