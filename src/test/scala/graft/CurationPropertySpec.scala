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

  test("mixtureInterleave: permutation, exact token accounting, prefix mix") {
    val gen = for {
      nDoms <- Gen.chooseNum(2, 4)
      doms = (0 until nDoms).map(d => s"d$d")
      ws <- Gen.listOfN(nDoms, Gen.chooseNum(1000L, 1000000L))
      n <- Gen.chooseNum(8, 24)
      assign <- Gen.listOfN(n, Gen.oneOf(doms))
      texts <- Gen.listOfN(n, doc)
    } yield (doms.zip(ws), assign.zip(texts))
    val prop = Prop.forAll(gen) { case (ws, rows) =>
      val docs = rows.zipWithIndex
        .map { case ((d, t), i) => (i.toLong, t, d) }
        .toDF("doc_id", "text", "dom")
      val w = ws.toDF("dom", "weight_micro")
      val out = Curation.mixtureInterleave(docs, "doc_id", "text",
          "dom", w, shardToks = 16L)
        .orderBy("vtime", "dom", "doc_id")
        .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
      // a permutation of the corpus
      val perm = out.map(_._1).toSet == rows.indices.map(_.toLong).toSet
      // exact token accounting: chunk placement decodes to the
      // cumulative start offsets in interleave order
      var run = 0L
      val accounting = out.forall { r =>
        val ok = r._5 * 16L + r._6 == run; run += r._3; ok
      }
      // stride guarantee: each prefix holds each domain's target share
      // within 2 documents — WHILE every domain still has supply (a
      // finite corpus's tail necessarily drifts toward the surplus
      // domains once a domain runs out)
      val total = ws.map(_._2).sum.toDouble
      val domTotals = out.groupBy(_._2).view.mapValues(_.size).toMap
      val mix = out.indices.forall { k =>
        val pre = out.take(k + 1)
        val exhausted = ws.exists { case (d, _) =>
          pre.count(_._2 == d) >= domTotals.getOrElse(d, 0) }
        exhausted || ws.forall { case (d, wd) =>
          math.abs(pre.count(_._2 == d) - (k + 1) * wd / total) <= 2.0
        }
      }
      perm && accounting && mix
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("mixtureAppend: chained appends keep history frozen and invariants exact") {
    val gen = for {
      nDoms <- Gen.chooseNum(2, 3)
      doms = (0 until nDoms).map(d => s"d$d")
      ws <- Gen.listOfN(nDoms, Gen.chooseNum(1000L, 1000000L))
      n <- Gen.chooseNum(9, 18)
      assign <- Gen.listOfN(n, Gen.oneOf(doms))
      texts <- Gen.listOfN(n, doc)
    } yield (doms.zip(ws), assign.zip(texts))
    val prop = Prop.forAll(gen) { case (ws, rows) =>
      val all = rows.zipWithIndex
        .map { case ((d, t), i) => (i.toLong, t, d) }
      val w = ws.toDF("dom", "weight_micro")
      def df(s: Seq[(Long, String, String)]) =
        s.toDF("doc_id", "text", "dom")
      val (b0, rest) = all.splitAt(all.size / 3)
      val (d1, d2) = rest.splitAt(rest.size / 2)
      val base = Curation.mixtureInterleave(df(b0), "doc_id", "text",
        "dom", w, shardToks = 16L)
      val a1 = Curation.mixtureAppend(base, df(d1), "doc_id", "text",
        "dom", w, shardToks = 16L)
      val a2 = Curation.mixtureAppend(a1, df(d2), "doc_id", "text",
        "dom", w, shardToks = 16L)
      val baseRows = base
        .as[(Long, String, Long, Long, Long, Long)].collect().toSet
      val a1Rows = a1
        .as[(Long, String, Long, Long, Long, Long)].collect().toSet
      val a2Rows = a2
        .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
      // history is FROZEN: every prior row survives byte-identical
      val frozen = baseRows.subsetOf(a1Rows) &&
        a1Rows.subsetOf(a2Rows.toSet)
      // permutation of the full corpus, no duplicates
      val perm = a2Rows.map(_._1).sorted == all.map(_._1).sorted
      // exact token accounting still holds over the APPENDED manifest
      // in (vtime, dom, id)-within-batch order = chunk offset order
      val ordered = a2Rows.sortBy(r => (r._5 * 16L + r._6))
      var run = 0L
      val accounting = ordered.forall { r =>
        val ok = r._5 * 16L + r._6 == run; run += r._3; ok
      }
      // dense-i invariant after appends: replaying vtime from each
      // domain's row count reproduces the maximum assigned vtime
      val wMap = ws.toMap
      val dense = a2Rows.groupBy(_._2).forall { case (d, rs) =>
        rs.map(_._4).max == rs.size.toLong * 1000000000L / wMap(d)
      }
      frozen && perm && accounting && dense
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("contrastiveCrops: bounds, in-document slices, exact overlap") {
    val prop = Prop.forAll(Gen.listOfN(10, doc)) { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Curation.contrastiveCrops(corpus, "doc_id", "text",
        minToks = 4).collect()
      val toksOf = texts.map(_.split("\\s+").toSeq)
      val expected = toksOf.zipWithIndex.count(_._1.size >= 4)
      out.length == expected && out.forall { r =>
        val toks = toksOf(r.getLong(0).toInt)
        val n = r.getLong(1)
        val slices = Seq(
          (r.getLong(2), r.getLong(3), r.getString(7)),
          (r.getLong(4), r.getLong(5), r.getString(8)))
        n == toks.size && slices.forall { case (s, l, crop) =>
          l >= math.max(1L, n * 40 / 100) && l <= n * 70 / 100 &&
            s >= 1 && s + l - 1 <= n &&
            crop == toks.slice(s.toInt - 1, (s + l).toInt - 1).mkString(" ")
        } && r.getLong(6) == math.max(0L,
          math.min(r.getLong(2) + r.getLong(3), r.getLong(4) + r.getLong(5))
            - math.max(r.getLong(2), r.getLong(4)))
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }
}
