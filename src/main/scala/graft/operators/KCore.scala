package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling — the cohesion member of the graph family next to
  * [[ConnectedComponents]] (who is connected), [[PageRank]] (who the
  * hubs are), and [[Triangles]] (how clique-like a neighborhood is).
  * The k-core is the maximal subgraph where every node keeps ≥ k
  * neighbors INSIDE the subgraph; on a near-dup graph it separates
  * densely mutual template families (which survive a high-k peel)
  * from pendant/star periphery (which a 2-core already strips) — the
  * shape signal for how aggressively a cluster can be collapsed.
  *
  * Algorithm (Matula–Beck peeling, simultaneous-rounds form): each
  * round computes degrees over the SURVIVING edge set and drops every
  * node with degree < k together with its edges; the survivor set is
  * monotone decreasing, and once a round removes nothing the set is
  * exactly the k-core. Rounds are bounded like [[PageRank]]'s: the
  * recurrence runs a FIXED `rounds` count so any engine replaying the
  * same rounds gets bit-identical output (the oracle contract);
  * KCoreSpec asserts the bound reaches the fixpoint on its graphs,
  * and at the fixpoint every reported degree is ≥ k by construction.
  *
  * Scale shape: a round is one map-side-combined degree count plus
  * two semi-joins on 8-byte node keys, all over the EDGE set (near-dup
  * graphs are vanishingly sparse relative to the corpus). The edge
  * set is `localCheckpoint`ed each round with exactly two live tables
  * at any time — the Bpe/LR/PageRank iterative discipline, so lineage
  * stays flat and no round ever replays a predecessor. Peel depth of
  * real sparse graphs is small (the degeneracy ordering is shallow);
  * a bounded round count is the standard distributed formulation.
  */
object KCore {

  /** `pairs(aCol, bCol)` — canonical undirected edges (each unordered
    * pair once, as [[graft.pipeline.Dedup]]'s pair generators emit).
    * Returns `(node, core_deg)` for every node still holding an edge
    * after `rounds` simultaneous peel rounds at threshold `k`; at the
    * fixpoint this is exactly the k-core membership with each node's
    * within-core degree.
    */
  def core(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(rounds > 0, "rounds must be positive")
    val und = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val e0 = und
      .unionByName(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var e = e0.localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val alive = e.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("src"))
      val next = e
        .join(alive, Seq("src"), "left_semi")
        .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
      val prev = e
      e = next.localCheckpoint(eager = true)
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .releaseLocalCheckpoint(prev)
    }
    e.groupBy("src").agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
  }
}
