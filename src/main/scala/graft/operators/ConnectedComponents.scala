package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns near-duplicate PAIRS (minhash / simhash / n-gram-Jaccard
  * output) into dedup DECISIONS: every document gets the id of its
  * duplicate-cluster representative (the minimum doc id reachable
  * through any chain of near-dup edges), and exactly one doc per
  * cluster is flagged `keep`.
  *
  * Reference framing: pedsnetdcc has no graph step (its dedup is
  * per-table DISTINCT); this is part of the beyond-reference
  * LLM-curation surface, where transitive closure over near-dup pairs
  * is the standard corpus-dedup semantics (a≈b, b≈c ⇒ {a,b,c} is one
  * cluster even when a,c don't pair directly).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * published O(log n)-round formulation, NOT naive label propagation
  * whose round count is the graph diameter (a 100 M-node duplicate
  * chain would need 100 M rounds; star contraction needs ~log n):
  *
  *  - large-star: every node links its LARGER neighbors to the
  *    minimum of its closed neighborhood;
  *  - small-star: every node links its smaller-or-equal neighbors to
  *    that minimum.
  *
  * Each round is two shuffle aggregations + two shuffle joins on the
  * node id — all equi-joins, AQE-coalesced, no broadcast assumption
  * (edge sets at corpus scale are fact-sized). Lineage is truncated
  * every round with an eager `localCheckpoint` (iterative plans
  * otherwise stack exponentially in the optimizer), and the
  * convergence probe is a single tiny aggregate per round — the only
  * driver-side values ever collected are (count, checksum).
  */
object ConnectedComponents {

  /** (count, order-independent XOR-of-xxhash checksum) of a canonical
    * edge set — equal sets hash equal, XOR never overflows, and the
    * edge sets are distinct-rowed so no pair self-cancels; two
    * DIFFERENT consecutive edge sets colliding on both count and a
    * 64-bit XOR is negligible.
    */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Large-star round: for each node u (over the symmetrized edge
    * view), link every neighbor v > u to m = min({u} ∪ N(u)). Emitted
    * edges always point high→low, so the output is canonical.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(least(col("u"), min(col("v"))).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star round: edges arrive canonical (u > v); for each u,
    * link u and every smaller neighbor to m = min(N(u)).
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    val linked = e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionAll(mins.select(col("u"), col("m").as("v")))
    linked.filter(col("u") =!= col("v")).distinct()
  }

  /** Component id (minimum reachable node) for every node of `edges`.
    *
    * @param edges DataFrame with two integral columns `u`, `v`
    *              (undirected; self-loops and duplicates tolerated)
    * @return (node: long, component: long) — one row per distinct
    *         node appearing in the input; `component` is the minimum
    *         node id in its connected component
    */
  def components(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // checkpoint the canonical edge set FIRST: the incoming lineage is
    // typically an expensive near-dup candidate join, and both the node
    // list and the iteration start from it — one materialization, not two
    val canonical = edges
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    val nodes = canonical.select(col("u").as("node"))
      .unionAll(canonical.select(col("v").as("node")))
      .distinct()

    var e = canonical
    var sig = checksum(e)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSig = checksum(next)
      converged = nextSig == sig
      e = next
      sig = nextSig
      round += 1
    }
    // star contraction halves component diameter per round, so 50
    // rounds cover any real graph — but if a caller lowers maxRounds,
    // a non-star edge set here would silently assign WRONG components
    // to every downstream dedup decision. Fail loudly instead.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds; " +
          "raise maxRounds (star contraction needs O(log n) rounds)")
    // at the fixpoint e is a union of stars: (member, root) with one
    // row per non-root member; roots appear only on the right side
    nodes.join(e.withColumnRenamed("u", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("v"), col("node")).as("component"))
  }

  /** Dedup decision per node: its cluster representative (minimum
    * reachable id) and `keep` = 1 for the representative itself.
    */
  def dedupDecisions(edges: DataFrame, maxRounds: Int = 50): DataFrame =
    components(edges, maxRounds)
      .select(col("node"), col("component"),
        (col("node") === col("component")).cast("int").as("keep"))

  /** Incremental merge: fold a batch of NEW edges into a stored
    * component assignment without re-clustering the whole corpus. The
    * stored (node, component) rows are already star edges, so the
    * combined input is |assignment| + |new edges| rows — at ingest
    * scale that is yesterday's compact mapping plus today's pair
    * detections, never the historical pair set. Equivalent to running
    * [[components]] over the full edge history (ComponentsSpec proves
    * it), because a star edge preserves exactly the reachability the
    * closure needs.
    */
  def merge(assignment: DataFrame, newEdges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val comp = components(
      assignment.select(col("node").as("u"), col("component").as("v"))
        .unionAll(newEdges.select(col("u"), col("v"))),
      maxRounds)
    // singleton clusters are self-loops the closure drops — keep them
    val allNodes = assignment.select(col("node"))
      .unionAll(newEdges.select(col("u").cast("long").as("node")))
      .unionAll(newEdges.select(col("v").cast("long").as("node")))
      .distinct()
    allNodes.join(comp, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
  }
}
