package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.pipeline.Web

/** Web-archive ingest: WARC framing round-trips byte-exactly (plain
  * and gzipped), the HTTP split and HTML block extraction recover
  * exactly the planted content, and malformed streams fail loudly
  * instead of resynchronizing over corruption.
  */
class WebSpec extends SparkSpec {

  import spark.implicits._

  test("WARC capture round-trips: 3 records, framing exact, gzip transparent") {
    for (gz <- Seq(false, true)) {
      val bytes = Web.captureBytes(42L, "alpha beta gamma", gzip = gz)
      val recs = Web.parseWarc(bytes)
      assert(recs.size == 3)
      assert(recs.map(_.headers("warc-type")) ==
        Seq("warcinfo", "request", "response"))
      assert(recs(1).headers("warc-target-uri") ==
        "http://corpus.example/doc/42")
      // framed length is the content's own length, both paths equal
      assert(recs.forall(r =>
        r.headers("content-length").toInt == r.content.length))
    }
    // gzip and plain encodings carry IDENTICAL record content
    val plain = Web.parseWarc(Web.captureBytes(7L, "x y z", gzip = false))
    val zipped = Web.parseWarc(Web.captureBytes(7L, "x y z", gzip = true))
    assert(plain.zip(zipped).forall { case (a, b) =>
      a.content.sameElements(b.content) && a.headers == b.headers
    })
  }

  test("malformed WARC streams fail loudly") {
    val good = Web.captureBytes(1L, "a b c", gzip = false)
    intercept[IllegalArgumentException] { // bad version line
      Web.parseWarc("WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        .getBytes(UTF_8))
    }
    intercept[IllegalArgumentException] { // truncated content
      Web.parseWarc(java.util.Arrays.copyOf(good, good.length - 10))
    }
  }

  test("httpBody splits the message at the first blank line") {
    val msg = "HTTP/1.1 200 OK\r\nA: b\r\n\r\nbody\r\nmore".getBytes(UTF_8)
    assert(new String(Web.httpBody(msg), UTF_8) == "body\r\nmore")
  }

  test("htmlBlocks: prune, segment, entities, link attribution") {
    val blocks = Web.htmlBlocks(
      "<html><head><title>T</title><script>var a='<p>';</script></head>" +
        "<body><NAV><a href=\"/\">skip me</a><nav>nested</nav>still pruned</NAV>" +
        "<p>one &amp; two &#65; &#x42; &unknown; three</p>" +
        "<div><a href=\"#\">click</a> here   \n now</div>" +
        "<STYLE>p{}</STYLE>tail words</body></html>")
    assert(blocks.map(_.text) == Seq(
      "one & two A B &unknown; three",
      "click here now",
      "tail words"))
    // "click" starts inside <a>, "here"/"now" outside
    assert(blocks(1).words == 3 && blocks(1).linkWords == 1)
    assert(blocks(0).linkWords == 0)
  }

  test("extractPage keeps content, drops boilerplate, decodes entities") {
    val text = "spark shuffle join scan filter agg sort window"
    val got = Web.extractPage(9L, Web.htmlPage(9L, text), minWords = 5)
    assert(got.n_blocks == 4) // h1, p1, p2, share div survive the prune
    assert(got.n_kept == 2)   // h1 too short, share div link-dense
    assert(got.text == text +
      "\narchived & verified copy of record 9 from crawl segment 9.")
    assert(got.n_words == 8 + 11)
  }

  test("canonicalizeUrl: RFC 3986 normalizations + tracking strip") {
    assert(Web.canonicalizeUrl(
      "HTTP://Corpus.Example:80/a/./b/../doc/5?utm_source=x&ref=0#frag") ==
      "http://corpus.example/a/doc/5?ref=0")
    assert(Web.canonicalizeUrl("https://CORPUS.example:443/%64oc/5") ==
      "https://corpus.example/doc/5")
    // non-default port kept, params sorted by name, escape uppercased
    assert(Web.canonicalizeUrl("http://h:8080/p?b=2&a=1") ==
      "http://h:8080/p?a=1&b=2")
    assert(Web.canonicalizeUrl("http://h/p%2fq") == "http://h/p%2Fq")
    // bare authority, trailing slash, dot-only path
    assert(Web.canonicalizeUrl("http://H.example") == "http://h.example/")
    assert(Web.canonicalizeUrl("http://h/a/b/") == "http://h/a/b/")
    assert(Web.canonicalizeUrl("http://h/..") == "http://h/")
  }

  test("encodeWet re-archives extracted text as conversion records") {
    val docs = Seq((4L, "a b c d e f g h i j")).toDS()
    val wet = Web.encodeWet(Web.extractCaptures(Web.encodeCaptures(docs)))
      .collect().head
    val recs = Web.parseWarc(wet.warc)
    assert(recs.size == 1)
    assert(recs.head.headers("warc-type") == "conversion")
    assert(recs.head.headers("warc-refers-to") ==
      "<urn:uuid:00000000-0000-4000-8000-000000000018>") // 4*4+2
    assert(new String(recs.head.content, UTF_8) ==
      "a b c d e f g h i j\n" +
        "archived & verified copy of record 4 from crawl segment 4.")
  }

  test("declared charset decodes identically; wire bytes differ by the accents") {
    val docs = Seq((1L, "x y z w v u t s r q"),
      (2L, "x y z w v u t s r q")).toDS()
    val caps = Web.encodeCharsetCaptures(docs).collect().sortBy(_.doc_id)
    val r1 = Web.parseWarc(caps(0).warc).head // odd: latin-1
    val r2 = Web.parseWarc(caps(1).warc).head // even: utf-8
    assert(Web.httpCharset(r1.content).name == "ISO-8859-1")
    assert(Web.httpCharset(r2.content).name == "UTF-8")
    val t1 = Web.extractPage(1L, new String(Web.httpBody(r1.content),
      Web.httpCharset(r1.content)), 5).text
    val t2 = Web.extractPage(2L, new String(Web.httpBody(r2.content),
      Web.httpCharset(r2.content)), 5).text
    assert(t1.startsWith("x y z w v u t s r q résumé café\n"))
    // same page text, ids of equal digit count: the utf-8 body is
    // exactly 3 bytes longer — one per planted é
    assert(Web.httpBody(r2.content).length ==
      Web.httpBody(r1.content).length + 3)
    // decoding latin-1 as utf-8 would NOT reproduce the same text
    assert(new String(Web.httpBody(r1.content), UTF_8) !=
      new String(Web.httpBody(r1.content),
        java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(t1.replace("record 1", "record 4")
      .replace("segment 1", "segment 4") ==
      t2.replace("record 2", "record 4").replace("segment 2", "segment 4"))
  }

  test("robots.txt: RFC 9309 groups, wildcards, anchors, tie-break") {
    val txt =
      """User-agent: graftbot
        |User-agent: graftbot-image
        |Disallow: /private/
        |Allow: /private/ok/
        |Disallow: /*.json$
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    // longest-match: the allow carve-out beats the shorter disallow
    assert(Web.robotsDecision(txt, "graftbot", "/private/ok/x") ==
      (true, "/private/ok/"))
    assert(Web.robotsDecision(txt, "GraftBot", "/private/secret") ==
      (false, "/private/"))
    // wildcard + $ anchor: only a true suffix hit blocks
    assert(Web.robotsDecision(txt, "graftbot", "/a/b.json") ==
      (false, "/*.json$"))
    assert(Web.robotsDecision(txt, "graftbot", "/a/b.jsonx")._1)
    // second agent alias shares the group; unknown agents fall to *
    assert(!Web.robotsDecision(txt, "graftbot-image", "/private/x")._1)
    assert(Web.robotsDecision(txt, "otherbot", "/anything") == (false, "/"))
    // no matching rule and no robots at all both default to allowed
    assert(Web.robotsDecision(txt, "graftbot", "/public") == (true, ""))
    assert(Web.robotsDecision("", "graftbot", "/x") == (true, ""))
    // equal-length allow/disallow tie goes to allow
    val tie = "User-agent: a\nAllow: /p/\nDisallow: /p/\n"
    assert(Web.robotsDecision(tie, "a", "/p/x") == (true, "/p/"))
  }

  test("streaming web-admission gate equals the batch verdicts on the same captures") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (10L, "the of and to in is it that a the of and quick brown fox"),
      (11L, "zz qq vv ww xx yy aa bb cc dd"))
    val caps = rows.map { case (id, text) =>
      (id, Web.captureBytes(id, text, gzip = id % 2 == 0))
    }
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = graft.streaming.StreamingJobs.webAdmissionGate(
      mem.toDF().toDF("doc_id", "warc"))
    val q = stream.writeStream.format("memory").queryName("webgate_s")
      .outputMode("append").start()
    try {
      mem.addData(caps: _*)
      q.processAllAvailable()
      val streamed = spark.table("webgate_s")
        .select("doc_id", "lang_pred", "score_micro", "admitted")
        .as[(Long, String, Long, Long)].collect().toSeq.sorted
      val batch = Web.admissionVerdicts(
          Web.extractCaptures(caps.toDF("doc_id", "warc")
            .as[Web.WebCapture]).toDF())
        .as[(Long, String, Long, Long)].collect().toSeq.sorted
      assert(streamed == batch)
      assert(streamed.map(_._1) == Seq(10L, 11L))
    } finally q.stop()
  }

  test("extractCaptures runs the full chain distributed") {
    val docs = Seq((2L, "a b c d e f g h i j"), (3L, "k l m n o p q r s t"))
      .toDS()
    val got = Web.extractCaptures(Web.encodeCaptures(docs))
      .collect().sortBy(_.doc_id)
    assert(got.map(_.doc_id).toSeq == Seq(2L, 3L))
    assert(got.forall(w => w.n_blocks == 4 && w.n_kept == 2 &&
      w.n_words == 10 + 11))
    assert(got(0).text.startsWith("a b c d e f g h i j\narchived & "))
  }
}
