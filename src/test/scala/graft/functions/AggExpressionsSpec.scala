package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_by_score ranks (score desc, id asc) with ties and truncates to k") {
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.5), (1L, 13L, 0.99),
      (2L, 20L, 0.1))
      .toDF("query_id", "neighbor_id", "cos_sim")
    val out = rows.groupBy("query_id")
      .agg(AggExpressions.top_k_by_score(col("cos_sim"), col("neighbor_id"), 3).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("nb"))
      .select($"query_id", $"nb.rnk", $"nb.id", $"nb.score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      (1L, 1L, 13L, 0.99), (1L, 2L, 10L, 0.9), (1L, 3L, 11L, 0.9),
      (2L, 1L, 20L, 0.1)))
  }

  test("partial-merge path: many partitions reduce to the same global top-k") {
    // force the merge path: 64 input partitions, every row a distinct id;
    // the exact global top-5 must survive partial aggregation
    val n = 5000
    val df = spark.range(n).repartition(64)
      .select(lit(1L).as("query_id"), col("id").as("neighbor_id"),
        (col("id") % 997).cast("double").as("cos_sim"))
    val got = df.groupBy("query_id")
      .agg(AggExpressions.top_k_by_score(col("cos_sim"), col("neighbor_id"), 5).as("topk"))
      .select(explode(col("topk")).as("nb"))
      .select($"nb.rnk", $"nb.id", $"nb.score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expect = (0L until n).map(i => (i, (i % 997).toDouble))
      .sortBy { case (id, s) => (-s, id) }.take(5)
      .zipWithIndex.map { case ((id, s), r) => (r + 1L, id, s) }
    assert(got === expect)
  }

  test("heap buffer fuzz: add+merge ≡ sort-take on random inputs with ties") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      // small score alphabet forces plenty of ties
      val items = Seq.fill(n)((rnd.nextInt(5).toDouble, rnd.nextInt(1000).toLong))
      // split across 3 "partitions", merge like partial aggregation does
      val parts = items.grouped(math.max(1, n / 3 + 1)).map { chunk =>
        val b = new AggExpressions.TopKBuffer(k)
        chunk.foreach { case (s, i) => b.add(s, i) }
        b
      }.toSeq
      val merged = parts.headOption.getOrElse(new AggExpressions.TopKBuffer(k))
      parts.drop(1).foreach(merged.mergeFrom)
      val got = merged.sorted.toSeq
      val expect = items.distinct.sortBy { case (s, i) => (-s, i) }.take(k)
      // note: duplicate (score,id) inputs may both occupy heap slots, so
      // compare as ranked sequences of the deduped expectation only when
      // inputs are unique; otherwise verify the ranking property directly
      if (items.distinct.size == items.size) assert(got === expect)
      else {
        assert(got.size <= k)
        assert(got === got.sortBy { case (s, i) => (-s, i) })
        got.headOption.foreach { case (s, _) =>
          assert(s === items.map(_._1).max) }
      }
    }
  }

  test("plan does partial aggregation before the exchange") {
    val df = spark.range(100)
      .select((col("id") % 7).as("query_id"), col("id").as("neighbor_id"),
        rand(7).as("cos_sim"))
      .groupBy("query_id")
      .agg(AggExpressions.top_k_by_score(col("cos_sim"), col("neighbor_id"), 3).as("topk"))
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice — partial map-side, final after
    // the exchange — the property that bounds the shuffle to k per group
    assert("ObjectHashAggregate".r.findAllIn(plan).size === 2, plan)
    assert(plan.contains("Exchange"), plan)
  }

  test("vector_sum_long sums element-wise across partitions; null rows skipped") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L, 3L))),
      (1L, Some(Seq(10L, -2L, 7L))),
      (1L, None),
      (2L, Some(Seq(5L, 5L, 5L)))
    ).toDF("g", "v").repartition(8)
    val out = df.groupBy("g")
      .agg(AggExpressions.vector_sum_long(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) === Seq(11L, 0L, 10L))
    assert(out(2L) === Seq(5L, 5L, 5L))
    // int arrays coerce at analysis time (implicit cast)
    val ints = Seq((1, Seq(1, 2))).toDF("g", "v")
      .groupBy("g").agg(AggExpressions.vector_sum_long(col("v")).as("s"))
    assert(ints.head().getSeq[Long](1) === Seq(1L, 2L))
    // all-null group evaluates to null, not a zero vector
    val allNull = Seq((9L, Option.empty[Seq[Long]])).toDF("g", "v")
      .groupBy("g").agg(AggExpressions.vector_sum_long(col("v")).as("s"))
    assert(allNull.head().isNullAt(1))
  }

  test("vector_sum_long partial aggregation: exchange carries vectors, not scalars") {
    val df = spark.range(1000).repartition(16)
      .select((col("id") % 3).as("g"),
        array(col("id"), col("id") * 2, lit(1L)).as("v"))
      .groupBy("g").agg(AggExpressions.vector_sum_long(col("v")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size === 2, plan)
    val out = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // per-group closed forms over 0..999
    val ids = (0L until 1000L)
    for (g <- 0L until 3L) {
      val mem = ids.filter(_ % 3 == g)
      assert(out(g) === Seq(mem.sum, mem.sum * 2, mem.size.toLong))
    }
  }

  test("vector_sum_long width mismatch within a group fails fast") {
    val df = Seq((1L, Seq(1L, 2L)), (1L, Seq(1L, 2L, 3L))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(AggExpressions.vector_sum_long(col("v"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("width mismatch")))
  }
}
