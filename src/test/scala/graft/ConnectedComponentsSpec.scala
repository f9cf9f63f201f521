package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum — the diameter case star contraction wins") {
    // a 12-node path: naive propagation needs 11 rounds, star needs ~log
    val chain = (1L to 11L).map(i => (i, i + 1))
    val c = comps(chain)
    assert(c == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep distinct minima") {
    val c = comps(Seq((5L, 7L), (7L, 6L), (20L, 30L), (40L, 40L), (50L, 41L)))
    assert(c(5L) == 5L && c(6L) == 5L && c(7L) == 5L)
    assert(c(20L) == 20L && c(30L) == 20L)
    assert(c(41L) == 41L && c(50L) == 41L)
    // pure self-loop contributes no node
    assert(!c.contains(40L) || c(40L) == 40L)
  }

  test("non-convergence within maxRounds fails loudly, never returns wrong components") {
    // a 12-node path cannot contract to stars in one round
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("u", "v")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.components(chain, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("duplicate, reversed, and self edges are tolerated") {
    val c = comps(Seq((3L, 1L), (1L, 3L), (3L, 3L), (1L, 3L), (2L, 3L)))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dedupDecisions keeps exactly one representative per cluster") {
    val d = ConnectedComponents.dedupDecisions(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v"))
      .as[(Long, Long, Int)].collect().toSeq
    assert(d.filter(_._3 == 1).map(_._1).toSet == Set(1L, 10L))
    assert(d.filter(_._3 == 0).map(_._1).toSet == Set(2L, 3L, 11L))
  }

  test("a high-degree star converges without round blowup") {
    val star = (2L to 200L).map(i => (i, 1L))
    val c = comps(star)
    assert(c.size == 199 + 1 && c.values.forall(_ == 1L))
  }

  test("incremental merge equals batch clustering over the full history") {
    val day1 = Seq((2L, 3L), (5L, 6L), (9L, 9L))
    val day2 = Seq((3L, 5L), (7L, 8L)) // bridges {2,3} with {5,6}; new pair
    val stored = ConnectedComponents.components(day1.toDF("u", "v"))
      .unionAll(Seq((9L, 9L)).toDF("node", "component")) // a singleton doc
    val merged = ConnectedComponents.merge(stored, day2.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    val batch = ConnectedComponents.components((day1 ++ day2).toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(merged - 9L == batch) // batch drops the pure self-loop node
    assert(merged(9L) == 9L) // the stored singleton survives the merge
    assert(merged(2L) == 2L && merged(6L) == 2L && merged(5L) == 2L)
    assert(merged(7L) == 7L && merged(8L) == 7L)
  }
}
