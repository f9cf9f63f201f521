package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.pipeline.Retrieval

/** Brute-force equivalence properties for the positional retrieval
  * operators on random corpora: the distributed plans must reproduce
  * the obvious sequential algorithms exactly.
  */
class RetrievalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "pad", "pad", "pad")
  private val doc: Gen[String] =
    Gen.chooseNum(4, 16).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("snippets equal the brute-force best window on random corpora") {
    val W = 4
    val qTerms = Set("alpha", "beta")
    check(Prop.forAll(Gen.listOfN(6, doc)) { texts =>
      val corpus = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val ranked = corpus.select(lit(7L).as("query_id"),
        lit(1L).as("rank"), col("doc_id"))
      val qs = Seq((7L, "alpha beta")).toDF("qid", "qtext")
      val got = Retrieval.snippets(corpus, "doc_id", "text", ranked,
          qs, "qid", "qtext", topDocs = 10, windowTokens = W)
        .select("doc_id", "start_pos", "n_matched")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split("\\s+").toSeq
        val pos = toks.zipWithIndex.collect {
          case (tk, j) if qTerms(tk) => (j + 1).toLong }
        if (pos.isEmpty) None
        else {
          val best = pos.map(p =>
              (p, pos.count(m => m >= p && m < p + W).toLong))
            .maxBy { case (p, n) => (n, -p) }
          Some(i.toLong -> (best._1, best._2))
        }
      }.toMap
      got == want
    })
  }

  test("proximity min pair distance equals the brute force on random corpora") {
    val qTerms = Map("alpha" -> 0, "beta" -> 1)
    check(Prop.forAll(Gen.listOfN(6, doc)) { texts =>
      val corpus = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val qs = Seq((7L, "alpha beta")).toDF("qid", "qtext")
      val got = Retrieval.proximityRerank(corpus, "doc_id", "text",
          qs, "qid", "qtext", k = 10, k0 = 4)
        .select("doc_id", "min_pair_dist")
        .as[(Long, Long)].collect().toMap
      got.forall { case (d, dist) =>
        val toks = texts(d.toInt).split("\\s+").toSeq
        val marks = toks.zipWithIndex.collect {
          case (tk, j) if qTerms.contains(tk) => ((j + 1).toLong, tk) }
        val pairs = for {
          (pa, ta) <- marks; (pb, tb) <- marks if ta != tb
        } yield math.abs(pa - pb)
        val want = if (pairs.isEmpty) 0L else pairs.min
        dist == want
      }
    })
  }

  test("spell suggestion is optimal among bigram-sharing candidates") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) {
        (i, j) => if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def bigrams(s: String): Set[String] =
      (0 until s.length - 1).map(i => s.substring(i, i + 2)).toSet
    val tokenGen: Gen[String] = Gen.oneOf(
      "filter", "filler", "falter", "group", "croup", "join", "coin",
      "joint", "spark", "spare", "share")
    check(Prop.forAll(
      Gen.listOfN(12, tokenGen), Gen.oneOf(
        "flter", "gruop", "jion", "spurk", "shrae", "filtre")) {
      (toks, probe) =>
        val corpus = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
        val probes = Seq(probe).toDF("probe")
        val got = Retrieval.spellSuggest(corpus, "doc_id", "text",
            probes, "probe", minCount = 1, maxDist = 2)
          .select("suggestion", "dist")
          .as[(String, Long)].collect().headOption
        val vocab = toks.distinct.filter(_.length >= 3)
        val cands = vocab
          .filter(c => bigrams(c).intersect(bigrams(probe)).nonEmpty)
          .map(c => (lev(probe, c).toLong, c))
          .filter { case (d, _) => d > 0 && d <= 2 }
        val want = if (cands.isEmpty) None
          else Some(cands.min.swap)
        got == want
    })
  }
}
