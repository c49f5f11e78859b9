package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize a ~10× replica of the sf0.1 testdata (≈6M-row
  * lineitem) under /tmp/graft-sf1, with fact-side keys remapped per copy
  * so join cardinalities scale like real data (dims stay 1×, like a real
  * star schema). Used to measure how each query class scales one decade
  * before trusting it for three more. */
object ScaleUp {

  val Copies = 10
  val SrcDir = "/root/testdata/sf0.1"
  val OutDir = "/tmp/graft-sf1"

  private def replicate(spark: SparkSession, table: String,
                        strides: Map[String, Long]): DataFrame = {
    val base = spark.read.parquet(s"$SrcDir/$table.parquet")
    (0 until Copies).map { i =>
      strides.foldLeft(base) { case (df, (c, stride)) =>
        df.withColumn(c, col(c) + lit(i * stride))
      }
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scale-up")
    val ok = 100000000L   // order-key stride
    val ck = 10000000L    // cust-key stride
    val plans = Seq(
      "lineitem" -> Map("l_orderkey" -> ok),
      "orders" -> Map("o_orderkey" -> ok, "o_custkey" -> ck),
      "customer" -> Map("c_custkey" -> ck),
      "events" -> Map("event_id" -> 10000000L, "user_id" -> 100000L),
      "documents" -> Map("doc_id" -> 1000000L),
      "embeddings" -> Map("vec_id" -> 1000000L),
      // dims stay 1× (star-schema realism)
      "region" -> Map.empty[String, Long],
      "nation" -> Map.empty[String, Long],
      "supplier" -> Map.empty[String, Long],
      "part" -> Map.empty[String, Long])
    plans.foreach { case (t, strides) =>
      val df = if (strides.isEmpty) spark.read.parquet(s"$SrcDir/$t.parquet")
               else replicate(spark, t, strides)
      df.write.mode("overwrite").parquet(s"$OutDir/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$OutDir/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
