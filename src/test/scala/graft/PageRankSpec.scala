package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Exact-recurrence checks for the integer PageRank operator. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def star() = {
    // undirected star 1—2, 1—3, duplicated both directions
    val pairs = Seq((1L, 2L), (1L, 3L))
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("two rounds of the star graph match the hand computation") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val out = PageRank.pagerank(star(), nodes, iters = 2)
      .as[(Long, Long)].collect().toMap
    // round 1: hub gets 150000 + 2·850000, leaves 150000 + 425000
    // round 2: hub 150000 + 2·488750, leaves 150000 + 786250
    assert(out == Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L),
      out.toString)
  }

  test("hubs dominate, isolated nodes hold exactly the teleport mass") {
    val nodes = (1L to 5L).toDF("node") // 4, 5 isolated
    val out = PageRank.pagerank(star(), nodes, iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) > out(2L) && out(2L) == out(3L), out.toString)
    assert(out(4L) == 150000L && out(5L) == 150000L, out.toString)
    // no cache blocks may survive the run (iterative discipline)
    assert(spark.sharedState.cacheManager.isEmpty,
      "pagerank left persisted intermediates behind")
  }

  test("triangles: one triangle plus a pendant edge, hand-counted") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val out = graft.operators.Triangles.perNode(pairs, "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(out == Map(1L -> (2L, 1L), 2L -> (2L, 1L), 3L -> (3L, 1L),
      4L -> (1L, 0L)), out.toString)
  }

  test("triangles: a 4-clique counts C(3,2)=3 per node, once per triangle") {
    val nodes = (1L to 4L)
    val pairs = (for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)).toDF("doc_a", "doc_b")
    val out = graft.operators.Triangles.perNode(pairs, "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect()
    assert(out.forall { case (_, d, t) => d == 3L && t == 3L },
      out.toSeq.toString)
  }

  test("adjustedRand: identical, chance-level, and the classic hand example") {
    import graft.operators.RandIndex
    def part(xs: (Long, Long)*) = xs.toDF("id", "cl")
    def ari(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      RandIndex.adjustedRand(a, "id", "cl", b, "id", "cl")
        .select($"ari_micro").as[Long].head()
    val two = part(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    assert(ari(two, two) == 1000000L)
    // all-singletons vs all-singletons: den2 = 0 -> identical by convention
    val singles = part(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    assert(ari(singles, singles) == 1000000L)
    // one big cluster vs all singletons: exactly chance level
    val one = part(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L)
    assert(ari(one, singles) == 0L)
    // [0,0,1,1] vs [0,0,1,2]: ARI = 8/14 = 0.571428...
    val split = part(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L)
    assert(ari(two, split) == 571428L)
  }

  test("kcore: triangle + pendant chain peels to the hand result") {
    import graft.operators.KCore
    // triangle {1,2,3}, chain 3—4—5: the 2-core is exactly the
    // triangle (4 and 5 peel in two rounds); the 3-core is empty
    // (each triangle node has in-core degree 2 < 3)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val two = KCore.core(pairs, "doc_a", "doc_b", k = 2, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), two.toString)
    val three = KCore.core(pairs, "doc_a", "doc_b", k = 3, rounds = 6)
      .count()
    assert(three == 0L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "kcore left persisted intermediates behind")
  }

  test("kcore matches brute-force peeling to fixpoint on a pseudo-random graph") {
    import graft.operators.KCore
    // same deterministic graph family as the triangle property below
    val nodes = (0L until 14L)
    val edges = (for {
      a <- nodes; b <- nodes
      if a < b && (a * 29 + b * 13) % 4 == 0
    } yield (a, b)).toSeq
    def brute(k: Int): Map[Long, Long] = {
      var es = edges
      var changed = true
      while (changed) {
        val deg = es.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
        val alive = deg.filter(_._2 >= k).keySet
        val next = es.filter(e => alive(e._1) && alive(e._2))
        changed = next.size != es.size
        es = next
      }
      es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size.toLong }
    }
    val df = edges.toDF("doc_a", "doc_b")
    for (k <- 2 to 4) {
      val got = KCore.core(df, "doc_a", "doc_b", k = k, rounds = 8)
        .as[(Long, Long)].collect().toMap
      assert(got == brute(k), s"k=$k: got $got want ${brute(k)}")
      // the round bound reaches the fixpoint: two more rounds change nothing
      val more = KCore.core(df, "doc_a", "doc_b", k = k, rounds = 10)
        .as[(Long, Long)].collect().toMap
      assert(more == got, s"k=$k not at fixpoint after 8 rounds")
    }
  }

  test("triangles match the brute-force closed-wedge count on a pseudo-random graph") {
    // deterministic pseudo-random graph on 12 nodes: edge {a,b} iff
    // (a*31 + b*17) % 3 == 0 — dense enough to hold many triangles
    val nodes = (0L until 12L)
    val edges = for {
      a <- nodes; b <- nodes
      if a < b && (a * 31 + b * 17) % 3 == 0
    } yield (a, b)
    val es = edges.toSet
    def adj(x: Long, y: Long) =
      es.contains((math.min(x, y), math.max(x, y)))
    val expect = nodes.map { n =>
      n -> (for {
        x <- nodes; y <- nodes
        if x < y && x != n && y != n && adj(n, x) && adj(n, y) && adj(x, y)
      } yield 1).size.toLong
    }.toMap
    val out = graft.operators.Triangles
      .perNode(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .as[(Long, Long, Long)].collect()
    out.foreach { case (n, _, t) =>
      assert(t == expect(n), s"node $n: got $t want ${expect(n)}")
    }
  }
}
