package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Io

/** Declared queries + DuckDB oracles for every output table of the
  * reference's transformation layer (data_preparation.py:110-502) — the
  * parity core. Each table is hash-match verified: DuckDB reads the SAME
  * raw inputs (text/CSV/parquet under the reference's raw-data dir, plus
  * the repo's deterministic temperature fixture for the stripped source)
  * and mirrors the transformation, including the reference's non-ANSI
  * cast semantics (SURVEY.md §1.4).
  *
  * uuid() columns (fact_temperature/fact_us_population/fact_us_race ids)
  * are non-deterministic and dropped in the declared queries per
  * SURVEY.md §7.4; fact_immigration's id is cicid-derived and kept.
  */
object EtlQueries {

  val RefRaw = "/root/reference/dags/data/raw-data"

  /** Deterministic replacement for the reference's stripped
    * GlobalLandTemperaturesByCountry.csv (README.md:33,
    * .MISSING_LARGE_BLOBS) — schema per data_preparation.py:209-213,
    * checked into the repo so Spark and DuckDB read the identical file. */
  val TemperatureFixture = "/root/repo/fixtures/GlobalLandTemperaturesByCountry.csv"

  // ---- Spark side -------------------------------------------------------

  private def stagingCountriesDf(s: SparkSession): DataFrame =
    CapstoneEtl.stagingCountries(
      CapstoneEtl.stagingIntCountries(
        Io.readText(s, s"$RefRaw/internal_country_codes.txt")),
      CapstoneEtl.unmatchedCountries(
        Io.readCsvUntyped(s, s"$RefRaw/unmatched_countries_updated.csv")),
      CapstoneEtl.stagingCountryCodes(
        Io.readCsv(s, s"$RefRaw/country_codes.csv", CapstoneEtl.countryCodesSchema)))

  private def stagingTemperatureDf(s: SparkSession): DataFrame =
    CapstoneEtl.stagingTemperature(
      Io.readCsvUntyped(s, TemperatureFixture), stagingCountriesDf(s))

  private def stagingDemographicsDf(s: SparkSession): DataFrame =
    CapstoneEtl.stagingDemographics(
      Io.readCsv(s, s"$RefRaw/us-cities-demographics.csv",
        CapstoneEtl.demographicsSchema, sep = ";"))

  /** The declared ETL query surface — one entry per output table of
    * CapstoneEtl.build (13 tables: 4 facts, 7 dims, 2 stagings). All
    * ignore the sf dir: they read the reference's own fixed raw inputs. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_dim_countries" -> ((s, _) =>
      CapstoneEtl.dimCountries(stagingCountriesDf(s))),
    "etl_dim_port_of_entry" -> ((s, _) =>
      CapstoneEtl.dimPortOfEntry(
        Io.readText(s, s"$RefRaw/port_of_entry.txt"))),
    "etl_dim_airlines" -> ((s, _) =>
      CapstoneEtl.dimAirlines(Io.readCsvUntyped(s, s"$RefRaw/airlines.csv"))),
    "etl_dim_travel_modes" -> ((s, _) => CapstoneEtl.dimTravelModes(s)),
    "etl_dim_visa_categories" -> ((s, _) => CapstoneEtl.dimVisaCategories(s)),
    "etl_staging_temperature" -> ((s, _) => stagingTemperatureDf(s)),
    "etl_fact_temperature" -> ((s, _) =>
      CapstoneEtl.factTemperature(stagingTemperatureDf(s)).drop("id")),
    "etl_staging_us_cities_demographics" -> ((s, _) => stagingDemographicsDf(s)),
    "etl_fact_us_population" -> ((s, _) =>
      CapstoneEtl.factUsPopulation(stagingDemographicsDf(s)).drop("id")),
    "etl_fact_us_race" -> ((s, _) =>
      CapstoneEtl.factUsRace(stagingDemographicsDf(s)).drop("id")),
    "etl_dim_states" -> ((s, _) => CapstoneEtl.dimStates(stagingDemographicsDf(s))),
    "etl_fact_immigration" -> ((s, _) =>
      CapstoneEtl.factImmigration(Io.readParquet(s, s"$RefRaw/sas_data"))),
    "etl_dim_date" -> ((s, _) =>
      CapstoneEtl.dimDate(CapstoneEtl.factImmigration(
        Io.readParquet(s, s"$RefRaw/sas_data")))))

  // ---- DuckDB side ------------------------------------------------------
  //
  // Cast mirrors of Spark's non-ANSI semantics (pinned empirically,
  // CapstoneEtlSpec + CastProbe run 2026-08-12):
  //  * double→int: truncates toward zero, saturates at ±Int.Max, NaN→0;
  //    DuckDB CAST rounds and errors on overflow → explicit CASE.
  //  * string→int: trims, truncates decimals ('12.5'→12), NULL on free
  //    text/overflow; DuckDB TRY_CAST rounds → regex-guarded mirror.
  //  * initcap: DuckDB has none → word-wise lower+upper-first mirror.

  /** Spark non-ANSI CAST(double AS INT). */
  private def d2i(x: String): String =
    s"(CASE WHEN $x IS NULL THEN NULL WHEN isnan($x) THEN 0" +
      s" WHEN $x >= 2147483648 THEN 2147483647" +
      s" WHEN $x <= -2147483649 THEN -2147483648" +
      s" ELSE CAST(trunc($x) AS INTEGER) END)"

  /** Spark non-ANSI CAST(string AS INT). */
  private def s2i(x: String): String =
    s"(CASE WHEN regexp_matches(trim($x), '^[+-]?[0-9]+$$')" +
      s" THEN TRY_CAST(trim($x) AS INTEGER)" +
      s" WHEN regexp_matches(trim($x), '^[+-]?[0-9]+\\.[0-9]*$$')" +
      s" THEN TRY_CAST(trunc(CAST(trim($x) AS DOUBLE)) AS INTEGER)" +
      s" ELSE NULL END)"

  /** Parsers.sasDate: days-since-1960 double → DATE, null/NaN → null. */
  private def sasdate(x: String): String =
    s"(CASE WHEN $x IS NULL OR isnan($x) THEN NULL" +
      s" ELSE DATE '1960-01-01' + CAST(trunc($x) AS INTEGER) END)"

  /** Spark initcap(): lowercase all, capitalize first letter of each
    * space-delimited word. */
  private def initcap(x: String): String =
    s"array_to_string(list_transform(string_split(lower($x), ' '), " +
      s"w -> CASE WHEN length(w) = 0 THEN w ELSE upper(w[1]) || w[2:] END), ' ')"

  /** One row per raw text line (spark.read.text twin; the curated SAS
    * extracts have no empty interior lines and no trailing newline). */
  private def lines(path: String): String =
    s"""(SELECT unnest(string_split(content, chr(10))) AS value
         FROM read_text('$path'))"""

  /** Shared CTE chain (no leading WITH) rebuilding staging_countries
    * (data_preparation.py:110-184): parse internal codes, apply the
    * manual corrections with initcap fallback, left-join ISO metadata on
    * case-insensitive name. */
  private val DuckCountriesCtes = s"""ic AS (
        SELECT
          trim(regexp_extract(trim(value), '^([0-9]+) (\\s*=\\s*) ('')(.+)('')$$', 1)) AS int_country_code,
          trim(regexp_extract(trim(value), '^([0-9]+) (\\s*=\\s*) ('')(.+)('')$$', 4)) AS int_country_name
        FROM ${lines(s"$RefRaw/internal_country_codes.txt")}),
      uc AS (
        SELECT int_country_code,
          coalesce(actual_country_name, ${initcap("int_country_name")}) AS int_country_name
        FROM read_csv('$RefRaw/unmatched_countries_updated.csv', header=true, all_varchar=true)),
      corrected AS (
        SELECT ic.int_country_code,
          coalesce(uc.int_country_name, ic.int_country_name) AS int_country_name
        FROM ic LEFT JOIN uc ON ic.int_country_code = uc.int_country_code),
      cc AS (
        -- Spark reads this CSV with an explicit IntegerType for
        -- COUNTRY CODE (permissive: '1-684'-style phone codes → null);
        -- mirror with an integral-regex guard over an all-varchar read.
        SELECT "COUNTRY" AS country_name,
          (CASE WHEN regexp_matches(trim("COUNTRY CODE"), '^[+-]?[0-9]+$$')
                THEN TRY_CAST(trim("COUNTRY CODE") AS INTEGER) ELSE NULL END) AS country_code,
          regexp_extract(trim("ISO CODES"), '^([A-Z]+) (\\s*/\\s*) ([A-Z]+)$$', 1) AS country_iso_code
        FROM read_csv('$RefRaw/country_codes.csv', header=true, all_varchar=true)),
      staging_countries AS (
        SELECT c.int_country_code, c.int_country_name,
          cc.country_code, cc.country_iso_code,
          coalesce(cc.country_name, c.int_country_name) AS country_name
        FROM corrected c
        LEFT JOIN cc ON upper(c.int_country_name) = upper(cc.country_name))"""

  /** Staging temperature CTE chain: fixture CSV left-joined to
    * staging_countries on upper(name), null-rejecting filter
    * (data_preparation.py:200-219). */
  private val DuckTemperatureCtes = s"""$DuckCountriesCtes,
      stg_temp AS (
        SELECT t.dt AS date, t.AverageTemperature AS average_temperature,
          t.AverageTemperatureUncertainty AS average_temperature_uncertainty,
          s.country_name, s.int_country_code, s.country_code
        FROM read_csv('$TemperatureFixture', header=true, all_varchar=true) t
        LEFT JOIN staging_countries s ON upper(t.Country) = upper(s.country_name)
        WHERE s.country_name IS NOT NULL AND t.AverageTemperature IS NOT NULL)"""

  /** Renamed demographics CTE (data_preparation.py:331-361), explicit
    * schema, ';' separator. */
  private val DuckDemographicsCte = s"""stg_demo AS (
        SELECT "City" AS city, "State" AS state_name, "Median Age" AS median_age,
          "Male Population" AS male_population, "Female Population" AS female_population,
          "Total Population" AS total_population, "Number of Veterans" AS number_of_veterans,
          "Foreign-born" AS foreign_born, "Average Household Size" AS avg_household_size,
          "State Code" AS state_code, "Race" AS race, "Count" AS count
        FROM read_csv('$RefRaw/us-cities-demographics.csv', header=true, delim=';',
          columns={'City':'VARCHAR','State':'VARCHAR','Median Age':'DOUBLE',
                   'Male Population':'INTEGER','Female Population':'INTEGER',
                   'Total Population':'INTEGER','Number of Veterans':'INTEGER',
                   'Foreign-born':'INTEGER','Average Household Size':'DOUBLE',
                   'State Code':'VARCHAR','Race':'VARCHAR','Count':'INTEGER'}))"""

  /** The 19-column fact_immigration projection (data_preparation.py:427-453)
    * with every non-ANSI cast mirrored. */
  private val DuckFactImmigrationSelect = s"""SELECT
        ${d2i("cicid")} AS id,
        ${d2i("i94cit")} AS country_citizen_key,
        ${d2i("i94res")} AS country_resident_key,
        i94port AS port_of_entry_key,
        ${sasdate("arrdate")} AS arrival_date_key,
        ${d2i("i94mode")} AS travel_mode_key,
        i94addr AS state_key,
        ${sasdate("depdate")} AS departure_date_key,
        ${d2i("i94bir")} AS age,
        ${d2i("i94visa")} AS visa_category_key,
        matflag IS NOT NULL AS match_flag,
        gender,
        ${s2i("insnum")} AS ins_num,
        airline AS airline_key,
        ${d2i("admnum")} AS admission_number,
        fltno AS flight_number,
        visatype AS visa_type,
        ${d2i("i94yr")} AS year,
        ${d2i("i94mon")} AS month
      FROM read_parquet('$RefRaw/sas_data/*.parquet')"""

  def oracleSql: Map[String, String] = Map(
    "etl_dim_countries" -> s"""
      WITH $DuckCountriesCtes
      SELECT TRY_CAST(int_country_code AS INTEGER) AS country_key,
        country_code, country_iso_code, country_name
      FROM staging_countries""",
    "etl_dim_port_of_entry" -> s"""
      SELECT
        trim(regexp_extract(trim(value), '^('')(.+)('')(\\s*)(=)(\\s*)('')(.+)('')$$', 2)) AS port_of_entry_key,
        trim(regexp_extract(trim(value), '^('')(.+)('')(\\s*)(=)(\\s*)('')(.+)('')$$', 8)) AS port_of_entry_name
      FROM ${lines(s"$RefRaw/port_of_entry.txt")}""",
    "etl_dim_airlines" -> s"""
      SELECT "Code" AS airline_key, "Airline" AS airline_name
      FROM read_csv('$RefRaw/airlines.csv', header=true, all_varchar=true)""",
    "etl_dim_travel_modes" ->
      """SELECT * FROM (VALUES (1, 'Air'), (2, 'Sea'), (9, 'Not reported'))
           AS t(travel_mode_key, travel_mode_name)""",
    "etl_dim_visa_categories" ->
      """SELECT * FROM (VALUES (1, 'Business'), (2, 'Pleasure'), (3, 'Student'))
           AS t(visa_category_key, visa_category_name)""",
    "etl_staging_temperature" -> s"""
      WITH $DuckTemperatureCtes
      SELECT * FROM stg_temp""",
    "etl_fact_temperature" -> s"""
      WITH $DuckTemperatureCtes
      SELECT CAST(date AS DATE) AS date_key,
        TRY_CAST(int_country_code AS INTEGER) AS country_key,
        CAST(average_temperature AS DOUBLE) AS average_temperature,
        CAST(average_temperature_uncertainty AS DOUBLE) AS average_temperature_uncertainty
      FROM stg_temp""",
    "etl_staging_us_cities_demographics" -> s"""
      WITH $DuckDemographicsCte
      SELECT * FROM stg_demo""",
    "etl_fact_us_population" -> s"""
      WITH $DuckDemographicsCte
      SELECT DISTINCT state_code AS state_key, city, median_age,
        male_population, female_population, total_population,
        number_of_veterans, foreign_born
      FROM stg_demo""",
    "etl_fact_us_race" -> s"""
      WITH $DuckDemographicsCte
      SELECT DISTINCT state_code AS state_key, city, count
      FROM stg_demo""",
    "etl_dim_states" -> s"""
      WITH $DuckDemographicsCte
      SELECT state_code AS state_key, state_name FROM stg_demo""",
    "etl_fact_immigration" -> DuckFactImmigrationSelect,
    "etl_dim_date" -> s"""
      WITH f AS (
        SELECT ${sasdate("arrdate")} AS arr, ${sasdate("depdate")} AS dep
        FROM read_parquet('$RefRaw/sas_data/*.parquet')),
      d AS (
        SELECT arr AS date FROM f WHERE arr IS NOT NULL
        UNION
        SELECT dep FROM f WHERE dep IS NOT NULL)
      SELECT date AS date_key, date, year(date) AS year,
        quarter(date) AS quarter, month(date) AS month,
        day(date) AS day, weekofyear(date) AS week
      FROM d""")
}
