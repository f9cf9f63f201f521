package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.ConnectedComponents

/** Property check: star-contraction components equal a brute-force
  * driver-side union-find on random graphs — many shapes (sparse,
  * dense, multi-edge, reversed, self-looped) beyond the handful of
  * hand-built cases in ConnectedComponentsSpec.
  */
class ConnectedComponentsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      if (u != v) {
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
    }
    // nodes touching only self-loops never enter the distributed
    // output either, so restrict to nodes with a real edge
    val nodes = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2))
    nodes.distinct.map(n => n -> find(n)).toMap
  }

  private val edgeGen: Gen[(Long, Long)] = for {
    u <- Gen.choose(0L, 30L)
    v <- Gen.choose(0L, 30L)
  } yield (u, v)

  test("components equal brute-force union-find on random graphs") {
    val prop = Prop.forAll(Gen.listOfN(25, edgeGen)) { edges =>
      val expected = unionFind(edges)
      val got = ConnectedComponents.components(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
