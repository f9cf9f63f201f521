package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.Web

/** Web-archive ingest cards — the crawl-corpus front end (WARC →
  * HTTP → HTML → text → admission) the reference never needed but a
  * 100 TB training-data engine starts from; see [[graft.pipeline.Web]].
  *
  * Same oracle portability contract as [[PipelineQueries]]: the
  * fixture pages are pure concatenations of literals, `doc_id`, and
  * the source text, so every emitted value — record digests, framed
  * lengths, block censuses, extracted-text digests, admission
  * verdicts — is replayable in closed form by DuckDB from the source
  * tables alone. A pass therefore certifies the REAL byte paths
  * (CRLF/Content-Length framing, per-record gzip members, HTTP
  * split, tag/entity parsing) end to end.
  */
object WebQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  private def captures(s: SparkSession, dir: String) = {
    import s.implicits._
    Web.encodeCaptures(t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)])
  }

  /** WARC record census (p192): every document becomes a real
    * 3-record WARC capture (warcinfo + request + response; even
    * doc_ids as concatenated per-record gzip members, odd plain),
    * then the walker re-frames every record and emits its type,
    * target, content length, and payload md5. A single framing bug —
    * header order, CRLF placement, Content-Length off-by-one, a
    * mis-inflated member — hash-mismatches.
    *
    * Scale shape: encode and walk are per-row; payload bytes never
    * enter an exchange, five small columns per record do.
    */
  def p192WarcRecords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Web.warcRecords(captures(s, dir)).toDF()
      .select(col("doc_id"), col("rec_idx").cast("long").as("rec_idx"),
        col("warc_type"), col("target_uri"), col("content_length"),
        col("payload_md5"))
  }

  /** HTML main-text extraction (p193): the response record's HTTP
    * body is parsed as markup — head/nav/footer/form subtrees and
    * script/style content pruned structurally, the rest segmented at
    * block tags, entities decoded, and each block scored by word
    * count and link density (keep: ≥5 words AND ≤1/3 link words, the
    * jusText-style rule). The card pins the block census and the md5
    * of the recovered text, which must equal the source text plus
    * the one non-boilerplate archival paragraph — so the extractor
    * provably drops every planted boilerplate block and not one
    * content word.
    */
  def p193HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Web.extractCaptures(captures(s, dir)).toDF()
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        col("n_words"), md5(col("text")).as("text_md5"))
  }

  /** Crawl admission composite (p194): the full front end in one
    * plan — WARC walk → HTTP body → HTML extraction → language ID +
    * quality score over the EXTRACTED text → admission verdict
    * (predicted English AND composite score ≥ 0.5). One pass over
    * the capture corpus, all scoring codegen'd column math; the
    * oracle replays language and score off the closed-form extracted
    * text, so the verdict is certified against the real byte path,
    * not against the convenient source column.
    */
  def p194WebAdmission(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Web.admissionVerdicts(Web.extractCaptures(captures(s, dir)).toDF())
  }

  /** Crawl-frontier URL dedup (p195): three deterministic messy
    * variants of each document's URL — mixed-case scheme/host with an
    * explicit default port, dot-segments, a fragment, and a tracking
    * param on one; already-canonical on another; an alternate scheme
    * with a percent-escaped path on the third — are canonicalized
    * ([[Web.canonicalizeUrl]]: RFC 3986 §6 normalizations + tracking
    * strip) and grouped on the canonical key. The messy and canonical
    * variants of the same page MUST collide (n_variants = 2) and the
    * alternate-scheme one must not: one wrong normalization step
    * splits or merges a group and hash-mismatches.
    *
    * Scale shape: canonicalization is per-row string math; the only
    * exchange is the grouped count on the canonical key — the same
    * one-shuffle plan dedups a 100 TB frontier.
    */
  def p195UrlFrontier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urls = t(s, dir, "documents").select(
      col("doc_id"),
      array(
        concat(lit("HTTP://Corpus.Example:80/a/./b/../doc/"), col("doc_id"),
          lit("?utm_source=x&ref="), pmod(col("doc_id"), lit(5)),
          lit("#frag")),
        concat(lit("http://corpus.example/a/doc/"), col("doc_id"),
          lit("?ref="), pmod(col("doc_id"), lit(5))),
        concat(lit("https://CORPUS.example:443/%64oc/"), col("doc_id")))
        .as("variants"))
      .select(col("doc_id"), explode(col("variants")).as("url"))
      .as[(Long, String)]
    urls.map { case (id, u) => (id, Web.canonicalizeUrl(u)) }
      .toDF("doc_id", "canonical")
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_variants"), min("doc_id").as("first_doc"))
  }

  /** The crawl policy every p196 fetch is checked against — one
    * prefix rule, one longer allow carve-out, one wildcard+anchor
    * rule, and a catch-all group for foreign agents.
    */
  private[queries] val robotsTxt =
    """# graft crawl policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /*.json$
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  /** robots.txt fetch gating (p196): every document's fetch path —
    * four deterministic shapes: plain, under a disallowed prefix,
    * under the longer allow carve-out inside it, and hitting a
    * wildcard `$`-anchored rule — is decided by the real RFC 9309
    * evaluator ([[Web.robotsDecision]]: group selection, `*`/`$`
    * pattern match, longest-rule-wins with allow on ties). The card
    * emits the verdict AND the deciding rule, so a subtly wrong
    * matcher (prefix vs anchored, tie broken the wrong way) is a
    * hash mismatch, not a silent policy drift.
    *
    * Scale shape: per-row policy math against a broadcast-small
    * parsed policy; zero exchange.
    */
  def p196RobotsGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val paths = t(s, dir, "documents").select(
      col("doc_id"),
      concat(
        when(pmod(col("doc_id"), lit(4)) === 1, lit("/private/doc/"))
          .when(pmod(col("doc_id"), lit(4)) === 2, lit("/private/ok/"))
          .otherwise(lit("/doc/")),
        col("doc_id"),
        when(pmod(col("doc_id"), lit(4)) === 3, lit(".json"))
          .otherwise(lit(""))).as("path"))
      .as[(Long, String)]
    paths.map { case (id, path) =>
      val (allowed, rule) = Web.robotsDecision(robotsTxt, "graftbot", path)
      (id, path, if (allowed) 1L else 0L, rule)
    }.toDF("doc_id", "path", "allowed", "rule")
  }

  /** WET derivative round-trip (p197): the full archive loop — WARC
    * captures in, main text extracted, re-archived as WARC
    * `conversion` records (Common Crawl's WET product, with
    * `WARC-Refers-To` naming the response record each text came
    * from), and the DERIVATIVE walked back by the same strict parser.
    * The card pins the conversion record's type, back-reference,
    * framed length, and payload md5 — which must equal the
    * closed-form extracted text, so writer and reader certify each
    * other.
    */
  def p197WetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Web.encodeWet(Web.extractCaptures(captures(s, dir)))
      .flatMap { c =>
        Web.parseWarc(c.warc).map { r =>
          (c.doc_id, r.headers.getOrElse("warc-type", ""),
            r.headers.getOrElse("warc-refers-to", ""),
            r.content.length.toLong, Web.md5Hex(r.content))
        }
      }
      .toDF("doc_id", "warc_type", "refers_to", "content_length",
        "payload_md5")
  }

  /** Declared-charset decode (p198): odd doc_ids are served as
    * ISO-8859-1 (one byte per é), even as UTF-8 (two) — same decoded
    * content, genuinely different wire bytes, and the HTTP head is
    * the only place the truth lives. The card emits the charset the
    * head declared, the body's byte count (differs by parity), and
    * the md5 of the extracted text (identical across parities) — a
    * reader that assumes UTF-8 mojibakes every odd document into a
    * hash mismatch.
    */
  def p198CharsetDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Web.encodeCharsetCaptures(t(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)])
      .map { c =>
        val r = Web.parseWarc(c.warc).head
        val body = Web.httpBody(r.content)
        val cs = Web.httpCharset(r.content)
        val text = Web.extractPage(c.doc_id,
          new String(body, cs), minWords = 5).text
        (c.doc_id, cs.name().toLowerCase, body.length.toLong, text)
      }
      .toDF("doc_id", "charset", "body_bytes", "text")
      .select(col("doc_id"), col("charset"), col("body_bytes"),
        md5(col("text")).as("text_md5"))
  }

  /** Politeness scheduling (p199): the frontier's per-host fetch
    * plan — URLs grouped by host, FIFO by doc_id within a host, each
    * fetch getting the slot `(order − 1) × crawl_delay`. The window
    * partitions by HOST (never a single global partition), the
    * 100 TB frontier shape: a thousand executors each schedule their
    * hosts independently.
    */
  def p199FetchSchedule(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host")).orderBy(col("doc_id"))
    t(s, dir, "documents").select(
        col("doc_id"),
        concat(lit("h"), pmod(col("doc_id"), lit(7)), lit(".example"))
          .as("host"))
      .withColumn("fetch_order", row_number().over(w).cast("long"))
      .withColumn("slot_ms", ((col("fetch_order") - 1) * 1000).cast("long"))
  }

  /** End-to-end crawl pipeline (p200): the whole front end as ONE
    * plan — every document's fetch path is decided by the REAL RFC
    * 9309 evaluator against the p196 policy (the verdict drives the
    * branch; nothing is hard-coded off the fixture parity), robots-
    * denied documents surface as `blocked` without ever being
    * fetched, and the allowed ones flow through capture → WARC walk →
    * HTTP split → HTML extraction → admission scoring to `admitted`
    * or `rejected`. The oracle composes the p196 and p194 closed
    * forms, so one wrong robots verdict, one mis-extracted byte, or
    * one drifted score flips an outcome and hash-mismatches.
    *
    * Scale shape: two scans of the frontier (blocked branch, fetched
    * branch) unioned — per-row maps throughout, zero exchanges; at
    * 100 TB the fetch fleet never even requests a blocked URL.
    */
  def p200CrawlPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withPath = t(s, dir, "documents").select(
      col("doc_id"),
      concat(
        when(pmod(col("doc_id"), lit(4)) === 1, lit("/private/doc/"))
          .when(pmod(col("doc_id"), lit(4)) === 2, lit("/private/ok/"))
          .otherwise(lit("/doc/")),
        col("doc_id"),
        when(pmod(col("doc_id"), lit(4)) === 3, lit(".json"))
          .otherwise(lit(""))).as("path"),
      col("text"))
      .as[(Long, String, String)]
    val decided = withPath.map { case (id, path, text) =>
      (id, Web.robotsDecision(robotsTxt, "graftbot", path)._1, text)
    }
    val blocked = decided.filter(!_._2)
      .map(r => (r._1, 0L, "blocked"))
      .toDF("doc_id", "fetched", "outcome")
    val fetched = Web.admissionVerdicts(
        Web.extractCaptures(Web.encodeCaptures(
          decided.filter(_._2).map(r => (r._1, r._3)))).toDF())
      .select(col("doc_id"), lit(1L).as("fetched"),
        when(col("admitted") === 1, "admitted").otherwise("rejected")
          .as("outcome"))
    blocked.unionByName(fetched)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p192_warc_records" -> p192WarcRecords _,
    "p193_html_extract" -> p193HtmlExtract _,
    "p194_web_admission" -> p194WebAdmission _,
    "p195_url_frontier" -> p195UrlFrontier _,
    "p196_robots_gate" -> p196RobotsGate _,
    "p200_crawl_pipeline" -> p200CrawlPipeline _,
    "p197_wet_roundtrip" -> p197WetRoundtrip _,
    "p198_charset_decode" -> p198CharsetDecode _,
    "p199_fetch_schedule" -> p199FetchSchedule _)

  // ------------------------------------------------------- oracle SQL

  private val oCrlf = "chr(13) || chr(10)"

  /** The fixture page, rebuilt by concatenation — must stay
    * byte-identical to [[Web.htmlPage]].
    */
  private val oHtml =
    """'<!DOCTYPE html><html><head><title>Doc ' || doc_id ||
      |    '</title><style>body{margin:0}</style><script>var x=1;</script>' ||
      |    '</head><body>' ||
      |    '<nav><a href="/">home</a> <a href="/about">about</a> ' ||
      |    '<a href="/doc/' || (doc_id + 1) || '">next</a></nav>' ||
      |    '<h1>Document ' || doc_id || '</h1>' ||
      |    '<p>' || text || '</p>' ||
      |    '<p>archived &amp; verified copy of record ' || doc_id ||
      |    ' from crawl segment ' || (doc_id % 10) || '.</p>' ||
      |    '<div class="share"><a href="#">share</a> <a href="#">tweet</a></div>' ||
      |    '<footer>&copy; 2026 corpus example &middot; all rights reserved</footer>' ||
      |    '</body></html>'""".stripMargin

  /** The extracted main text: source paragraph + the archival
    * paragraph with its `&amp;` decoded — [[Web.extractPage]]'s
    * output in closed form.
    */
  private[queries] val oExtracted =
    """text || chr(10) || 'archived & verified copy of record ' || doc_id ||
      |    ' from crawl segment ' || (doc_id % 10) || '.'""".stripMargin

  /** The p194 admission oracle — the shadowing CTE re-binds
    * `documents` to the EXTRACTED text, so the reused p08/p09
    * fragments score the real byte path's output; `main.`
    * disambiguates the base view (DuckDB rejects a self-referential
    * CTE name otherwise). Shared with the p200 composite.
    */
  private lazy val oAdmission: String =
    s"""WITH documents AS (
       |  SELECT doc_id, $oExtracted AS text FROM main.documents),
       |l AS (SELECT * FROM (${PipelineOracles2.oracle0("p08_lang_id")})),
       |q AS (${PipelineOracles2.oracle0("p09_quality")})
       |SELECT l.doc_id, l.lang_pred,
       |  CAST(FLOOR(q.score * 1e6) AS BIGINT) AS score_micro,
       |  CAST(CASE WHEN l.lang_pred = 'en' AND q.score >= 0.5
       |       THEN 1 ELSE 0 END AS BIGINT) AS admitted
       |FROM l JOIN q ON l.doc_id = q.doc_id""".stripMargin

  def oracle: Map[String, String] = Map(
    "p192_warc_records" ->
      s"""WITH h AS (
         |  SELECT doc_id, $oHtml AS html
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    'software: graft-web/1.0' || $oCrlf ||
         |      'format: WARC file version 1.0' || $oCrlf AS wi,
         |    'GET /doc/' || doc_id || ' HTTP/1.1' || $oCrlf ||
         |      'Host: corpus.example' || $oCrlf ||
         |      'User-Agent: graft-web/1.0' || $oCrlf ||
         |      'Accept: text/html' || $oCrlf || $oCrlf AS rq,
         |    'HTTP/1.1 200 OK' || $oCrlf ||
         |      'Content-Type: text/html; charset=utf-8' || $oCrlf ||
         |      'Content-Length: ' || length(html) || $oCrlf || $oCrlf ||
         |      html AS rs,
         |    'http://corpus.example/doc/' || doc_id AS uri
         |  FROM h)
         |SELECT doc_id, CAST(0 AS BIGINT) AS rec_idx,
         |  'warcinfo' AS warc_type, '' AS target_uri,
         |  CAST(length(wi) AS BIGINT) AS content_length,
         |  md5(wi) AS payload_md5 FROM c
         |UNION ALL
         |SELECT doc_id, CAST(1 AS BIGINT), 'request', uri,
         |  CAST(length(rq) AS BIGINT), md5(rq) FROM c
         |UNION ALL
         |SELECT doc_id, CAST(2 AS BIGINT), 'response', uri,
         |  CAST(length(rs) AS BIGINT), md5(rs) FROM c""".stripMargin,
    "p193_html_extract" ->
      s"""SELECT doc_id, CAST(4 AS BIGINT) AS n_blocks,
         |  CAST(2 AS BIGINT) AS n_kept,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) + 11 AS BIGINT)
         |    AS n_words,
         |  md5($oExtracted) AS text_md5
         |FROM documents""".stripMargin,
    "p194_web_admission" -> oAdmission,
    "p195_url_frontier" ->
      """SELECT 'http://corpus.example/a/doc/' || doc_id || '?ref='
        |    || (doc_id % 5) AS canonical,
        |  CAST(2 AS BIGINT) AS n_variants, doc_id AS first_doc
        |FROM documents
        |UNION ALL
        |SELECT 'https://corpus.example/doc/' || doc_id,
        |  CAST(1 AS BIGINT), doc_id
        |FROM documents""".stripMargin,
    "p196_robots_gate" ->
      """SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 1 THEN '/private/doc/' || doc_id
        |    WHEN 2 THEN '/private/ok/' || doc_id
        |    WHEN 3 THEN '/doc/' || doc_id || '.json'
        |    ELSE '/doc/' || doc_id END AS path,
        |  CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 0 ELSE 1 END
        |       AS BIGINT) AS allowed,
        |  CASE doc_id % 4
        |    WHEN 1 THEN '/private/'
        |    WHEN 2 THEN '/private/ok/'
        |    WHEN 3 THEN '/*.json$'
        |    ELSE '' END AS rule
        |FROM documents""".stripMargin,
    "p197_wet_roundtrip" ->
      s"""SELECT doc_id, 'conversion' AS warc_type,
         |  '<urn:uuid:00000000-0000-4000-8000-'
         |    || printf('%012d', doc_id * 4 + 2) || '>' AS refers_to,
         |  CAST(length($oExtracted) AS BIGINT) AS content_length,
         |  md5($oExtracted) AS payload_md5
         |FROM documents""".stripMargin,
    "p198_charset_decode" ->
      // the latin-1 body is one byte per CHARACTER, the UTF-8 body
      // one byte per UTF-8 code unit — length() vs octet_length()
      s"""WITH documents AS (
         |  SELECT doc_id, text || ' résumé café' AS text
         |  FROM main.documents),
         |h AS (SELECT doc_id, $oHtml AS html, md5($oExtracted) AS text_md5
         |      FROM documents)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 1 THEN 'iso-8859-1'
         |       ELSE 'utf-8' END AS charset,
         |  CAST(CASE WHEN doc_id % 2 = 1 THEN length(html)
         |       ELSE octet_length(encode(html)) END AS BIGINT)
         |    AS body_bytes,
         |  text_md5
         |FROM h""".stripMargin,
    "p199_fetch_schedule" ->
      """SELECT doc_id,
        |  'h' || (doc_id % 7) || '.example' AS host,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % 7
        |       ORDER BY doc_id) AS BIGINT) AS fetch_order,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY doc_id % 7
        |       ORDER BY doc_id) - 1) * 1000 AS BIGINT) AS slot_ms
        |FROM documents""".stripMargin,
    "p200_crawl_pipeline" ->
      // composes the p196 robots closed form (doc_id % 4 in (1,3) is
      // blocked) with the p194 admission closed form for the rest
      s"""WITH adm AS ($oAdmission)
         |SELECT doc_id,
         |  CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 0 ELSE 1 END
         |       AS BIGINT) AS fetched,
         |  CASE WHEN doc_id % 4 IN (1, 3) THEN 'blocked'
         |       WHEN admitted = 1 THEN 'admitted'
         |       ELSE 'rejected' END AS outcome
         |FROM adm""".stripMargin)
}
