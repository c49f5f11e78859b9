package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edges.
  *
  * Companion to the connected-components pass in [[Dedup]]: where CC
  * answers "which rows are the same thing", PageRank answers "which
  * nodes matter" — the authority-weighting signal corpus-curation
  * pipelines use to prioritize link-rich sources (the harmonic-
  * centrality idea behind CommonCrawl-style crawl ranking).
  *
  * Determinism across engines: ranks live in integer MICRO-units and
  * every per-edge contribution is floor-divided BEFORE summation, so
  * each iteration is a sum of longs — order-free, bit-identical on any
  * engine (a float PageRank differs in ulps per summation order and can
  * never hash-match an oracle).
  */
object Graph {

  /** Damped PageRank (d = 0.85) with `iters` fixed iterations over a
    * directed edge list; rank unit = 1e6 micro. Requires every node to
    * have at least one outgoing edge (symmetric graphs satisfy this
    * trivially) — dangling mass is not redistributed.
    *
    * Scale shape: edges are hash-partitioned on src ONCE and
    * checkpointed; each iteration is one join edges⋈ranks on src (ranks
    * broadcast while small — node count ≪ edge count — or co-partitioned
    * with the edges' exchange when not) followed by one aggregate on
    * dst. localCheckpoint truncates the ranks lineage per iteration —
    * the CC lesson: without it, iteration t replans iterations 1..t-1.
    * On a cluster, swap for a reliable checkpoint dir. */
  def pageRank(edges0: DataFrame, iters: Int = 5): DataFrame = {
    // checkpoint the RAW edges first: outdeg, the degree-annotated edge
    // relation, and the rank init all derive from it — without this the
    // upstream edge build (a join + distinct) replays once per consumer
    val edges = edges0.localCheckpoint()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // no explicit repartition: ranks broadcast (node count ≪ edge count),
    // so e's partitioning is irrelevant to the join and the dst aggregate
    // shuffles regardless; at bucket-the-graph scale, bucket by src here
    val e = edges.join(outdeg, Seq("src")).localCheckpoint()
    var ranks = outdeg.select(col("src").as("node"), lit(1000000L).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("in_sum"))
        .select(col("node"),
          (lit(150000L) + expr("(in_sum * 85) div 100")).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank").as("rank_micro"))
  }

  /** Co-purchase graph: distinct symmetric part–part edges for parts
    * appearing in the same order. The pair self-join keys on the order
    * id over one repartitioned relation (single reused exchange); the
    * distinct collapses multi-order repeats before PageRank sees them. */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
      .repartition(col("okey"))
    li.alias("a")
      .join(li.alias("b"),
        col("a.okey") === col("b.okey") && col("a.part") =!= col("b.part"))
      .select(col("a.part").as("src"), col("b.part").as("dst"))
      .distinct()
  }

  /** PageRank over the co-purchase graph: (part_id, rank_micro). */
  def partRank(lineitem: DataFrame, iters: Int = 5): DataFrame =
    pageRank(coPurchaseEdges(lineitem), iters)
      .select(col("node").as("part_id"), col("rank_micro"))
}
