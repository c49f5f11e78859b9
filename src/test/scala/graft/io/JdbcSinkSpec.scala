package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Io.writeJdbc against an embedded Derby target (the JDBC driver that
  * ships with Spark's jars): REPLACE-semantics overwrite, round-trip
  * fidelity, and idempotent reruns — the contract of the reference's 11
  * S3ToRedshiftOperator loads (dag_immigration.py:191-331). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftwh;create=true"

  test("jdbc overwrite: round-trips rows and replaces on rerun") {
    val v1 = Seq((1, "Air"), (2, "Sea"), (9, "Not reported"))
      .toDF("travel_mode_key", "travel_mode_name")
    Io.writeJdbc(v1, url, "dim_travel_modes")
    val back1 = Io.readJdbc(spark, url, "dim_travel_modes")
    assert(back1.count() === 3)
    assert(back1.orderBy("travel_mode_key")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "Air"), (2, "Sea"), (9, "Not reported")))

    // REPLACE: a rerun with different content fully supersedes the table
    val v2 = Seq((1, "Air"), (2, "Sea")).toDF("travel_mode_key", "travel_mode_name")
    Io.writeJdbc(v2, url, "dim_travel_modes")
    val back2 = Io.readJdbc(spark, url, "dim_travel_modes")
    assert(back2.count() === 2)
  }

  test("jdbc overwrite: null-bearing and typed columns survive the trip") {
    val df = Seq(
      (1, Some(2.5), Some("x")),
      (2, None, None)
    ).toDF("id", "score", "label")
    Io.writeJdbc(df, url, "typed_trip")
    val back = Io.readJdbc(spark, url, "typed_trip")
      .orderBy("id").collect()
    assert(back(0).getInt(0) === 1 && back(0).getDouble(1) === 2.5 && back(0).getString(2) === "x")
    assert(back(1).isNullAt(1) && back(1).isNullAt(2))
  }
}
