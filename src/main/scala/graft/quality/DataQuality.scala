package graft.quality

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** In-engine data-quality gate (SURVEY.md §2.13 Q1).
  *
  * Same contract as the reference's DataQualityOperator
  * (plugins/operators/data_quality.py:21-38): for each {table, column} —
  * fail if the column contains any NULL; fail if the table is empty.
  *
  * Scale note: both predicates for a table are computed in ONE aggregation
  * pass (`count(*)` + `count(col)`), not two full scans like the
  * reference's two SQL round-trips.
  */
object DataQuality {

  final case class CheckResult(table: String, column: String,
                               rows: Long, nulls: Long) {
    def passed: Boolean = rows > 0 && nulls == 0
  }

  /** Single-pass row/null counts for one column. */
  def measure(df: DataFrame, table: String, column: String): CheckResult = {
    val Row(rows: Long, nonNull: Long) =
      df.agg(count(lit(1)), count(col(column))).head()
    CheckResult(table, column, rows, rows - nonNull)
  }

  /** Throwing form — mirrors the reference's ValueError-on-violation
    * (data_quality.py:29,38). */
  def check(df: DataFrame, table: String, column: String): CheckResult = {
    val r = measure(df, table, column)
    if (r.rows == 0)
      throw new IllegalStateException(
        s"Data quality check failed. ${r.table} returned no results")
    if (r.nulls > 0)
      throw new IllegalStateException(
        s"Data quality check failed. ${r.table} column ${r.column} " +
          s"contains ${r.nulls} null values")
    r
  }

  /** Run the full matrix (reference: dags/dag_immigration.py:337-348). */
  def checkAll(checks: Seq[(DataFrame, String, String)]): Seq[CheckResult] =
    checks.map { case (df, t, c) => check(df, t, c) }

  /** Engine extras beyond the reference's two gates. */

  /** Fail if `column` has duplicate values (PK-style uniqueness — the
    * check Redshift declares but never enforces). One aggregation pass. */
  def checkUnique(df: DataFrame, table: String, column: String): Unit = {
    val Row(rows: Long, distinct: Long) =
      df.agg(count(col(column)), countDistinct(col(column))).head()
    if (rows != distinct)
      throw new IllegalStateException(
        s"Data quality check failed. $table column $column has " +
          s"${rows - distinct} duplicate values")
  }

  /** Fail if any non-null fact key lacks a match in the dimension
    * (referential integrity); left-anti join, dim side broadcastable. */
  def checkForeignKey(fact: DataFrame, factCol: String,
                      dim: DataFrame, dimCol: String,
                      factName: String, dimName: String): Unit = {
    val orphans = fact.where(col(factCol).isNotNull)
      .join(dim, fact(factCol) === dim(dimCol), "left_anti")
      .count()
    if (orphans > 0)
      throw new IllegalStateException(
        s"Data quality check failed. $factName.$factCol has $orphans " +
          s"values missing from $dimName.$dimCol")
  }
}
