package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact damped PageRank — the iterative graph fixed-point
  * beyond [[ConnectedComponents]]' closure. In the curation pipeline
  * it runs over the near-dup graph, where high-centrality documents
  * are template/boilerplate HUBS (many near-copies link through them)
  * — the triage signal for which cluster survivor to keep and which
  * shapes to review before a dedup cut.
  *
  * Determinism (the oracle contract): masses are int64 micro units.
  * Each node starts at 10⁶; a round sends every node
  * `((pr · 850000) div 10⁶) div outdeg` along each out-edge (ONE fixed
  * division order, all values non-negative so truncation = floor in
  * any engine) and every node restarts from the exact teleport
  * constant 150000 plus its integer in-mass. Floors leak a few micro
  * units of mass per hop — fine for a RANKING, and the price of
  * bit-exact replay in any engine.
  *
  * Scale shape: out-degrees and per-round in-mass are map-side
  * combined node-keyed shuffles over the EDGE set (near-dup graphs
  * are vanishingly sparse relative to the corpus); the rank vector is
  * node-keyed and `localCheckpoint`ed each round, with exactly two
  * live rank tables at any time — the Bpe/LR iterative discipline, so
  * lineage stays flat and no round ever replays a predecessor.
  */
object PageRank {

  /** `edges(src, dst)` directed (duplicate both directions for an
    * undirected graph), `nodes(node)` the full vertex set (isolated
    * vertices hold the teleport mass). Returns `(node, pr_micro)`.
    */
  def pagerank(edges: DataFrame, nodes: DataFrame,
      iters: Int): DataFrame = {
    require(iters > 0, "iters must be positive")
    val e = edges.select(col("src"), col("dst")).distinct()
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg): small relative to the corpus; checkpointed
    // once so the per-round join reads blocks, not the detector plan
    val ew = e.join(out, Seq("src")).localCheckpoint(eager = true)
    val base = nodes.select(col("node"))
    var p = base.select(col("node"), lit(1000000L).as("pr"))
      .localCheckpoint(eager = true)
    try {
      for (_ <- 1 to iters) {
        val contrib = ew
          .join(p, ew("src") === p("node"))
          .select(col("dst").as("node"),
            expr("((pr * 850000) div 1000000) div outdeg").as("share"))
          .groupBy(col("node")).agg(sum(col("share")).as("inmass"))
        val next = base
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("inmass"), lit(0L))).as("pr"))
        val prev = p
        p = next.localCheckpoint(eager = true)
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .releaseLocalCheckpoint(prev)
      }
      p
    } finally org.apache.spark.sql.graftbridge.CheckpointBridge
      .releaseLocalCheckpoint(ew)
  }
}
