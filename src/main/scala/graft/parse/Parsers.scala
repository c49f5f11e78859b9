package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType}

/** Native-expression replacements for the reference's six Python UDFs
  * (reference: dags/scripts/spark/data_preparation.py:20-87). Each is a
  * pure `Column` expression — fully visible to Catalyst, codegen'd, no
  * serialization boundary — instead of an opaque row-at-a-time UDF.
  *
  * Null/no-match semantics: `regexp_extract` returns "" on no match where
  * the Python UDFs would throw; on the curated SAS extracts every line
  * matches, so outputs are identical (SURVEY.md §2.11). We normalize "" to
  * null via `nullif`-style guards where the reference could yield null.
  */
object Parsers {

  /** SAS dictionary country line `999 =  'NAME'` → (code, name), trimmed.
    * Reference: parseCountriesUDF, data_preparation.py:20-31. The regex
    * keeps the reference's literal-space quirk (space before/after the
    * `\s*=\s*` group). */
  private val CountryLinePat = "^([0-9]+) (\\s*=\\s*) (')(.+)(')$"

  def parseCountryCode(line: Column): Column =
    trim(regexp_extract(trim(line), CountryLinePat, 1))

  def parseCountryName(line: Column): Column =
    trim(regexp_extract(trim(line), CountryLinePat, 4))

  /** `AL / ALB` → `AL`. Reference: parseISOCodesUDF, data_preparation.py:33-41. */
  private val IsoPat = "^([A-Z]+) (\\s*/\\s*) ([A-Z]+)$"

  def parseIsoCode(s: Column): Column =
    when(s.isNull, lit(null)).otherwise(regexp_extract(trim(s), IsoPat, 1))

  /** Leading number of `20.65 Billion` → `20.65`; null-safe.
    * Reference: parseGdpUsdUDF, data_preparation.py:43-54. */
  def parseGdpUsd(s: Column): Column =
    when(s.isNull, lit(null))
      .otherwise(regexp_extract(trim(s), "^([0-9\\.]+)", 1))

  /** Port-of-entry line `'ALC'\t=\t'ALCAN, AK '` → (code, name), trimmed.
    * Reference: parsePortOfEntryUDF, data_preparation.py:56-67. */
  private val PortPat = "^(')(.+)(')(\\s*)(=)(\\s*)(')(.+)(')$"

  def parsePortCode(line: Column): Column =
    trim(regexp_extract(trim(line), PortPat, 2))

  def parsePortName(line: Column): Column =
    trim(regexp_extract(trim(line), PortPat, 8))

  /** SAS date: days since 1960-01-01 (double/any) → DateType; null/NaN →
    * null (the UDF's try/except → None). Reference: convert_sas_date,
    * data_preparation.py:69-77. The NaN guard is load-bearing: Spark's
    * non-ANSI cast sends NaN→0 where Python's int(NaN) raises→None. */
  def sasDate(days: Column): Column = {
    val d = days.cast(DoubleType)
    date_add(to_date(lit("1960-01-01")),
      when(isnan(d), lit(null)).otherwise(d).cast(IntegerType)).cast(DateType)
  }

  /** Random UUID per row. Reference: gen_uuid, data_preparation.py:87.
    * Built-in non-deterministic expression (excluded from value oracles). */
  def genUuid(): Column = uuid()
}
