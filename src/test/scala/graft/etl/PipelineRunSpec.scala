package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Full pipeline run: writes all outputs (fact partitioned by year/month),
  * then the in-engine quality gates must pass over what was written. */
class PipelineRunSpec extends SparkSpec {

  test("run(): writes 13 tables, partitions the fact, passes quality gates") {
    val in = RefFixtures.stage()
    val out = Files.createTempDirectory("etl-run-out").toString

    CapstoneEtl.run(spark, in.toString, out)   // throws if a quality gate fails

    // partitioned layout: year=2016/month=4 directories exist
    val factDir = new java.io.File(s"$out/fact_immigration.parquet")
    val parts = factDir.listFiles().map(_.getName).filter(_.startsWith("year="))
    assert(parts.toSeq === Seq("year=2016"))
    val fact = spark.read.parquet(s"$out/fact_immigration.parquet")
    assert(fact.count() === 3096313)
    // partition pruning: a month filter reads only that partition
    val pruned = fact.where(col("year") === 2016 && col("month") === 4)
    assert(pruned.count() === fact.count())
    // all 13 outputs exist
    val written = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(Seq("dim_countries", "dim_airlines", "dim_date", "fact_temperature",
      "fact_us_population", "fact_us_race", "dim_states",
      "staging_us_cities_demographics", "staging_temperature",
      "dim_travel_modes", "dim_visa_categories", "dim_port_of_entry")
      .forall(t => written.contains(s"$t.parquet")))
  }
}
