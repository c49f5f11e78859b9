package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference: same integer recurrence, plain Scala. */
  private def refRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = out.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) => r(s) / out(s) }.sum
      }.toMap
      r = in.map { case (n, s) => n -> (150000L + s * 85L / 100L) }
    }
    r
  }

  test("integer PageRank matches the in-memory recurrence on a planted graph") {
    // two triangles bridged by one edge pair + a pendant vertex, symmetric
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (6L, 7L))
    val edges = und ++ und.map(_.swap)
    val got = Graph.pageRank(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got === refRank(edges, 5))
    // hubs (deg-3 bridge nodes) outrank the pendant leaf
    assert(got(4L) > got(7L) && got(3L) > got(7L))
  }

  test("co-purchase edges are symmetric, distinct, and self-loop-free") {
    val li = Seq((100L, 1L), (100L, 2L), (100L, 2L), // dup lineitem collapses
      (101L, 2L), (101L, 3L), (102L, 9L))            // singleton order → no edge
      .toDF("l_orderkey", "l_partkey")
    val got = Graph.coPurchaseEdges(li).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("partRank covers exactly the co-purchased parts") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val nodes = Graph.coPurchaseEdges(li).select("src").distinct().count()
    val ranked = Graph.partRank(li)
    assert(ranked.count() === nodes)
    assert(ranked.where($"rank_micro" < 150000L).count() === 0) // damping floor
  }
}
