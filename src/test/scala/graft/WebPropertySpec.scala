package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.pipeline.Web

/** Property checks for the crawl front end's parsers on random
  * inputs: extraction round-trips arbitrary content words, WARC
  * framing survives arbitrary text at both store temperatures,
  * canonicalization is idempotent, and the RFC 9309 matcher agrees
  * with an independent regex-translation reference.
  */
class WebPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 60): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(result.passed, result.status.toString)
  }

  // content words: plain, entity-lookalike, accents, digits — never
  // whitespace or markup (the fixture contract p193 relies on)
  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "café", "x9", "a.b", "amp;", "&amp",
    "q-r_s", "zz", "éléphant")
  private val text: Gen[String] = Gen.chooseNum(5, 40)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("extraction round-trips random content through the full page") {
    check(Prop.forAll(text, Gen.chooseNum(0L, 999999L)) { (t, id) =>
      val got = Web.extractPage(id, Web.htmlPage(id, t), minWords = 5)
      got.text == t + "\narchived & verified copy of record " + id +
        s" from crawl segment ${id % 10}." &&
        got.n_blocks == 4 && got.n_kept == 2 &&
        got.n_words == t.split(" ").length + 11
    })
  }

  test("WARC framing round-trips random text, gzip and plain alike") {
    check(Prop.forAll(text, Gen.chooseNum(0L, 99999L),
        Gen.oneOf(true, false)) { (t, id, gz) =>
      val recs = Web.parseWarc(Web.captureBytes(id, t, gz))
      recs.size == 3 &&
        recs.map(_.headers("warc-type")) ==
          Seq("warcinfo", "request", "response") &&
        recs.forall(r =>
          r.headers("content-length").toInt == r.content.length) &&
        new String(recs(2).content, UTF_8).contains(t)
    }, n = 40)
  }

  test("canonicalizeUrl is idempotent and drops every tracking param") {
    val seg: Gen[String] = Gen.oneOf("a", "B", "doc", ".", "..", "x1")
    val param: Gen[String] = Gen.oneOf(
      "a=1", "b=2", "utm_source=z", "utm_x=1", "gclid=g", "ref=7", "z")
    val url: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https")
      host <- Gen.oneOf("Host.Example", "h.example", "CORPUS.example")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.listOfN(3, seg)
      params <- Gen.chooseNum(0, 4).flatMap(Gen.listOfN(_, param))
      frag <- Gen.oneOf("", "#f", "#frag/x")
    } yield scheme + "://" + host + port + "/" + segs.mkString("/") +
      (if (params.isEmpty) "" else "?" + params.mkString("&")) + frag
    check(Prop.forAll(url) { u =>
      val c = Web.canonicalizeUrl(u)
      Web.canonicalizeUrl(c) == c &&
        !c.contains("utm_") && !c.contains("gclid") &&
        !c.contains("#") && c.contains("://")
    })
  }

  /** Independent reference for the RFC 9309 pattern language: escape
    * everything, `*` → `.*`, terminal `$` → anchor, prefix-match
    * otherwise.
    */
  private def refMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val core = if (anchored) pattern.dropRight(1) else pattern
    val rx = core.map {
      case '*' => ".*"
      case c => java.util.regex.Pattern.quote(c.toString)
    }.mkString
    val full = if (anchored) rx + "$" else rx + ".*"
    path.matches(full)
  }

  test("robots pattern DP agrees with the regex-translation reference") {
    val patChar: Gen[String] = Gen.oneOf("/", "a", "b", "*", ".")
    val pat: Gen[String] = for {
      n <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(n, patChar)
      anchor <- Gen.oneOf("", "$")
    } yield "/" + cs.mkString + anchor
    val path: Gen[String] = Gen.chooseNum(0, 7)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "/", ".")))
      .map(cs => "/" + cs.mkString)
    check(Prop.forAll(pat, path) { (p, s) =>
      Web.robotsPatternMatches(p, s) == refMatch(p, s)
    }, n = 200)
  }
}
