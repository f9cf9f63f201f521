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
}
