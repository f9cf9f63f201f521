package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting — the local-density companion to
  * [[ConnectedComponents]] (which finds WHO is connected) and
  * [[PageRank]] (which finds the hubs): triangles measure how CLIQUE-
  * LIKE a near-dup neighborhood is. In the curation pipeline a
  * high-triangle cluster is a mutual-near-copy template family (every
  * member resembles every other — safe to collapse to one survivor),
  * while a zero-triangle star is one hub document with many unrelated
  * partial overlaps — the shape that deserves review before a cut.
  *
  * Algorithm (Suri–Vassilvitskii's compact-forward orientation): each
  * undirected edge is directed from its (degree, id)-smaller endpoint
  * to the larger, making the graph a DAG in a total order. Every
  * triangle {x<y<z} then holds exactly the oriented edges x→y, x→z,
  * y→z, so joining wedges (x→y)·(y→z) against closing edges (x→z)
  * counts each triangle ONCE — and the wedge count is bounded by
  * Σ outdeg², which the low-degree-first orientation minimizes: hubs
  * receive edges instead of fanning them out, which is what kills the
  * "curse of the last reducer" at 100 TB.
  *
  * Scale shape: three equi-joins over the EDGE set (near-dup graphs
  * are vanishingly sparse relative to the corpus) on 8-byte keys; the
  * per-node roll-up is a map-side-combined groupBy. Pure integer
  * arithmetic end-to-end — any engine replaying the same joins gets
  * the same counts.
  */
object Triangles {

  /** `pairs(aCol, bCol)` — canonical undirected edges (each unordered
    * pair once, `aCol < bCol`, as [[graft.pipeline.Dedup]]'s pair
    * generators emit). Returns one row per non-isolated node:
    * `(node, degree, tri_count)`.
    */
  def perNode(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val deg = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = e.join(du, Seq("u")).join(dv, Seq("v"))
      .select(when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
    val o1 = o.select(col("src").as("a"), col("dst").as("b"))
    val o2 = o.select(col("src").as("b"), col("dst").as("c"))
    val o3 = o.select(col("src").as("a"), col("dst").as("c"))
    val tri = o1.join(o2, Seq("b")).join(o3, Seq("a", "c"))
    val tcnt = tri.select(col("a").as("n"))
      .unionByName(tri.select(col("b").as("n")))
      .unionByName(tri.select(col("c").as("n")))
      .groupBy("n").agg(count(lit(1)).as("t"))
    deg.join(tcnt, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("tri_count"))
  }
}
