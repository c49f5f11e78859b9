package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden end-to-end test of the ETL over the reference's own raw
  * fixtures (SURVEY.md §5). The temperature CSV is stripped from the
  * reference repo, so a schema-faithful fixture is generated here
  * (FIXTURES.md A10).
  */
class CapstoneEtlSpec extends SparkSpec {

  // temperature fixture: mixed-case countries, nulls, an unknown country
  private lazy val inputDir: String = RefFixtures.stage(Seq(
    "dt,AverageTemperature,AverageTemperatureUncertainty,Country",
    "1950-01-01,10.5,0.3,afghanistan",     // case-insensitive match
    "1950-02-01,11.25,0.2,Afghanistan",
    "1950-03-01,,0.2,Afghanistan",          // null temp → filtered
    "1950-01-01,20.125,0.4,Albania",
    "1950-01-01,15.0,0.1,Atlantis")         // unmatched → filtered
  ).toString

  private lazy val out = CapstoneEtl.build(spark, inputDir).tables

  test("dim_countries: 236 rows, unmatched correction + INITCAP fallback applied") {
    val dc = out("dim_countries").cache()
    assert(dc.count() === 236)
    // row 518 corrected via actual_country_name (unmatched_countries_updated.csv:2)
    val antigua = dc.where(col("country_key") === 518).head()
    assert(antigua.getAs[String]("country_name") === "Antigua and Barbuda")
    // row 582 has no actual name → INITCAP of the internal name
    val mexico = dc.where(col("country_key") === 582).head()
    assert(mexico.getAs[String]("country_name") ===
      "Mexico Air Sea, And Not Reed (i-94, No Land Arrivals)")
    // a directly-matched row keeps ISO metadata
    val afg = dc.where(col("country_name") === "Afghanistan").head()
    assert(afg.getAs[String]("country_iso_code") === "AF")
    assert(afg.getAs[Int]("country_code") === 93)
  }

  test("fact_temperature: null temps and unmatched countries filtered, casts applied") {
    val ft = out("fact_temperature").cache()
    assert(ft.count() === 3)
    val schema = ft.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("average_temperature") === "double")
    assert(schema("date_key") === "date")
    assert(ft.where(col("average_temperature").isNull).count() === 0)
    val afgJan = ft.where(col("date_key") === "1950-01-01" && col("country_key") === 236)
    // country 236 is AFGHANISTAN internally; matched case-insensitively
    assert(afgJan.head().getAs[Double]("average_temperature") === 10.5)
  }

  test("dim_port_of_entry: 591 rows, names trimmed") {
    val po = out("dim_port_of_entry").cache()
    assert(po.count() === 591)
    assert(po.where(col("port_of_entry_key") === "ALC").head()
      .getAs[String]("port_of_entry_name") === "ALCAN, AK")
    assert(po.where(col("port_of_entry_name").rlike(" $")).count() === 0)
  }

  test("literal dims: travel modes (1,2,9) and visa categories (1,2,3)") {
    assert(out("dim_travel_modes").collect().map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "Air"), (2, "Sea"), (9, "Not reported")))
    assert(out("dim_visa_categories").collect().map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "Business"), (2, "Pleasure"), (3, "Student")))
  }

  test("dim_airlines: header-only CSV rename") {
    val da = out("dim_airlines")
    assert(da.columns.toSeq === Seq("airline_key", "airline_name"))
    assert(da.count() === 1652)
  }

  test("demographics: dim_states keeps reference's non-distinct quirk; facts dedup") {
    val states = out("dim_states").cache()
    assert(states.count() === 2891)            // one row per demographics row
    assert(states.select("state_key").distinct().count() < 2891)
    val pop = out("fact_us_population").cache()
    // distinct over city-level attrs: 596 unique (state, city) profiles
    assert(pop.count() === pop.dropDuplicates("state_key", "city").count())
    val race = out("fact_us_race")
    assert(race.columns.toSet === Set("id", "state_key", "city", "count"))
  }

  test("fact_immigration: non-ANSI cast semantics on the real April-2016 extract") {
    val fi = out("fact_immigration").cache()
    assert(fi.count() === 3096313)
    // admnum ≈ 5.6e10 overflows int32 silently (never null for sample rows)
    val r = fi.where(col("id") === 4084316).head()   // cicid 4084316.0 exists in sample
    assert(!r.isNullAt(r.fieldIndex("admission_number")))
    // insnum free text → null int
    assert(fi.where(col("ins_num").isNotNull).count() <
           fi.where(col("ins_num").isNull).count())
    // match_flag is BOOLEAN
    assert(fi.schema("match_flag").dataType.typeName === "boolean")
    // arrival dates land in April 2016
    val d = fi.where(col("arrival_date_key").isNotNull)
      .agg(min("arrival_date_key"), max("arrival_date_key")).head()
    assert(d.getDate(0).toString.startsWith("2016-0"))
  }

  test("dim_date: deduplicating union, unique keys, ISO week fields") {
    val dd = out("dim_date").cache()
    assert(dd.count() === dd.select("date_key").distinct().count())
    val jan1 = dd.where(col("date") === "2016-01-01")
    if (jan1.count() > 0) {
      val r = jan1.head()
      assert(r.getAs[Int]("week") === 53)     // ISO week of 2016-01-01
      assert(r.getAs[Int]("quarter") === 1)
    }
    val apr22 = dd.where(col("date") === "2016-04-22").head()
    assert(apr22.getAs[Int]("year") === 2016)
    assert(apr22.getAs[Int]("month") === 4)
    assert(apr22.getAs[Int]("day") === 22)
  }

  test("dim_date week-of-year is ISO on year-boundary dates (SURVEY §7.4 risk 7)") {
    // expected values pinned against DuckDB weekofyear() — the oracle
    // engine — for the Dec 29 .. Jan 4 boundary band, including a
    // 53-week year (2015, 2020); data_preparation.py:470 extract(week)
    val boundary = Seq(
      ("2014-12-29", 1), ("2015-12-28", 53), ("2015-12-31", 53),
      ("2016-01-01", 53), ("2016-01-03", 53), ("2016-01-04", 1),
      ("2016-12-31", 52), ("2020-12-31", 53), ("2021-01-01", 53),
      ("2021-01-04", 1))
    import spark.implicits._
    val got = boundary.map(_._1).toDF("d")
      .select(col("d"), weekofyear(to_date(col("d"))).as("w"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    boundary.foreach { case (d, w) =>
      assert(got(d) === w, s"ISO week of $d")
    }
  }
}
