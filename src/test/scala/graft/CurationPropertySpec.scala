package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.pipeline.Curation

/** Property checks for the curation operators' global invariants on
  * random corpora.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("segmentDedup: total kept equals the number of distinct segments") {
    val prop = Prop.forAll(Gen.listOfN(8, doc)) { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Curation.segmentDedup(corpus, "doc_id", "text", segWords = 3)
        .as[(Long, Long, Long, Long)].collect()
      val totalKept = out.map(_._3).sum
      // exactly one owner per distinct segment across the whole corpus
      val distinctSegs = texts.flatMap { t =>
        t.split("\\s+").grouped(3).map(_.mkString(" ")).toSeq.distinct
      }.distinct.size
      totalKept == distinctSegs &&
        out.forall(r => r._2 == r._3 + r._4) // n_segs = kept + dropped
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("segmentScrub: reconstruction equals the brute-force first-occurrence filter") {
    val prop = Prop.forAll(Gen.listOfN(8, doc)) { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Curation.segmentScrub(corpus, "doc_id", "text", segWords = 3)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      // brute force: walk the corpus in (doc, pos) order, keep a
      // segment occurrence only the first time its text is seen
      val seen = scala.collection.mutable.Set[String]()
      val expected = texts.zipWithIndex.map { case (t, i) =>
        val segs = t.split("\\s+").grouped(3).map(_.mkString(" ")).toSeq
        val kept = segs.filter(seen.add)
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        (i.toLong, segs.size.toLong, kept.size.toLong, fp)
      }
      expected.forall(e => out(e._1) == e)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("scrubText: no digit survives the cascade; counts are consistent") {
    val piece: Gen[String] = Gen.oneOf(
      Gen.chooseNum(0, 999999999L).map(_.toString),
      word,
      Gen.const("a@b.co"),
      Gen.const("+1 (555) 123-4567"))
    val line: Gen[String] =
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(10, line)) { lines =>
      val df = lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val out = Curation.scrubText(df, "text")
        .select("text", "clean", "n_email", "n_phone", "n_id")
        .as[(String, String, Long, Long, Long)].collect()
      out.forall { case (orig, clean, ne, np, ni) =>
        !clean.exists(_.isDigit) &&
          // any original digit must be accounted for by some rule
          (!orig.exists(_.isDigit) || ne + np + ni > 0)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }
}
