package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{ConnectedComponents, Sessionize}
import graft.pipeline.{Bpe, Curation, Dedup, DedupStore, Ingest, Multimodal, Retrieval, Similarity, TextFunctions => TF}

/** Beyond-reference data-pipeline queries (dedup, similarity search,
  * text analysis, multimodal, event sessionization) over the driver's
  * `documents` / `embeddings` / `events` tables, each hash-checked
  * against a DuckDB oracle.
  *
  * Portability rules that make the oracles exact:
  *  - all hashing goes through [[TF.hash60]] (md5-hex-derived 60-bit
  *    ints — reproducible in any engine; no xxhash/murmur);
  *  - similarity doubles are computed with identical-op-order HOFs and
  *    emitted as `floor(x*1e6)` bigints;
  *  - LSH candidate generation is deterministic (hash-derived seeds /
  *    hyperplanes), and its oracles are *exhaustive* SQL — so the check
  *    also proves the LSH found every qualifying pair at this SF.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  // ------------------------------------------------------------ SQL helpers

  /** DuckDB rendering of [[TF.hash60]]. */
  private def oHash(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  private val oToks = """string_split_regex(trim(text), '\s+')"""

  /** [[oToks]] over an arbitrary text expression. */
  private def oToksOf(e: String): String =
    s"""string_split_regex(trim($e), '\\s+')"""

  /** In-plan absolute planted-query stride — the oracle twin of
    * [[graft.pipeline.Retrieval.plantedSample]]: ceil(count(rel) /
    * budget), so the planted evaluation-query count is ≈`budget` at
    * ANY scale factor instead of a fixed corpus fraction.
    */
  private def oQStride(rel: String, budget: Int = 128): String =
    s"(SELECT GREATEST(CAST(1 AS BIGINT), (COUNT(*) + ${budget - 1})" +
      s" // $budget) FROM $rel)"

  /** Shared CTE chain of the p172/p174 oracles — the append fixture:
    * full-corpus temperature weights, base manifest over
    * doc_id % 3 != 0 (`stb`), resumed per-domain counters, and the
    * delta placement after the base token mass (`std`) —
    * Curation.mixtureAppend's arithmetic in flat-window form.
    */
  private lazy val oAppendManifestCtes: String =
    s"""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
           |  FROM documents GROUP BY 1),
           |d AS (SELECT list_sum(list_sort(list(sqrt(CAST(n_docs
           |    AS DOUBLE))))) AS denom FROM c),
           |w AS (SELECT source, CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE))
           |    / denom * 1e6) AS BIGINT) AS weight_micro FROM c, d),
           |nb AS (SELECT doc_id, source,
           |    CAST(len($oToks) AS BIGINT) AS n_toks,
           |    ${oHash("'mix' || CAST(doc_id AS VARCHAR)")} AS h
           |  FROM documents WHERE doc_id % 3 != 0),
           |kb AS (SELECT doc_id, nb.source, n_toks,
           |    CAST((ROW_NUMBER() OVER (PARTITION BY nb.source
           |        ORDER BY h, doc_id) * 1000000000) // weight_micro
           |      AS BIGINT) AS vtime
           |  FROM nb JOIN w ON nb.source = w.source),
           |stb AS (SELECT *, CAST(SUM(n_toks) OVER (ORDER BY vtime,
           |      source, doc_id ROWS UNBOUNDED PRECEDING) - n_toks
           |    AS BIGINT) AS start_tok FROM kb),
           |i0 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS base_i
           |  FROM nb GROUP BY source),
           |t0 AS (SELECT CAST(COALESCE(SUM(n_toks), 0) AS BIGINT)
           |    AS tok0 FROM nb),
           |nd AS (SELECT doc_id, source,
           |    CAST(len($oToks) AS BIGINT) AS n_toks,
           |    ${oHash("'mix' || CAST(doc_id AS VARCHAR)")} AS h
           |  FROM documents WHERE doc_id % 3 = 0),
           |kd AS (SELECT doc_id, nd.source, n_toks,
           |    CAST(((ROW_NUMBER() OVER (PARTITION BY nd.source
           |          ORDER BY h, doc_id) + COALESCE(base_i, 0))
           |        * 1000000000) // weight_micro
           |      AS BIGINT) AS vtime
           |  FROM nd JOIN w ON nd.source = w.source
           |  LEFT JOIN i0 ON nd.source = i0.source),
           |std AS (SELECT kd.*, CAST(SUM(n_toks) OVER (ORDER BY vtime,
           |      source, doc_id ROWS UNBOUNDED PRECEDING) - n_toks
           |      + tok0 AS BIGINT) AS start_tok
           |  FROM kd, t0)"""
      .stripMargin

  /** Shared CTE chain of the p163/p165 oracles: p50 temperature
    * weights → per-domain hash-ordered sequence → stride virtual
    * times → flat global token prefix sum (the single-window form the
    * two-level scans regroup associatively). Exposes `w (source,
    * weight_micro)` and `st (doc_id, source, n_toks, vtime,
    * start_tok)`.
    */
  private lazy val oMixInterleaveCtes: String =
    s"""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1),
       |d AS (SELECT list_sum(list_sort(list(sqrt(CAST(n_docs
       |    AS DOUBLE))))) AS denom FROM c),
       |w AS (SELECT source, CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE))
       |    / denom * 1e6) AS BIGINT) AS weight_micro FROM c, d),
       |n AS (SELECT doc_id, source,
       |    CAST(len($oToks) AS BIGINT) AS n_toks,
       |    ${oHash("'mix' || CAST(doc_id AS VARCHAR)")} AS h
       |  FROM documents),
       |k AS (SELECT doc_id, n.source, n_toks,
       |    CAST((ROW_NUMBER() OVER (PARTITION BY n.source
       |        ORDER BY h, doc_id) * 1000000000) // weight_micro
       |      AS BIGINT) AS vtime
       |  FROM n JOIN w ON n.source = w.source),
       |st AS (SELECT *, CAST(SUM(n_toks) OVER (ORDER BY vtime,
       |      source, doc_id ROWS UNBOUNDED PRECEDING) - n_toks
       |    AS BIGINT) AS start_tok FROM k)""".stripMargin

  /** DuckDB rendering of [[TF.shingles]] over an in-scope `toks`. */
  private def oShingles(k: Int): String = {
    val cat = (0 until k).map(j => if (j == 0) "toks[i]" else s"toks[i+$j]")
      .mkString(" || ' ' || ")
    s"""CASE WHEN len(toks) >= $k
       |  THEN list_distinct(list_transform(
       |         generate_series(1, len(toks) - ${k - 1}), i -> $cat))
       |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin
  }

  /** CTE pair (`qm`, `q`) rendering [[scoredDocs]]'s floored-micro p09
    * quality score — shared by the canonical-selection and
    * importance-sampling oracles.
    */
  private lazy val oScoreCtes: String = {
    val enSet = TF.stopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""qm AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_toks,
       |    list_sum(list_transform(toks, t -> length(t)))
       |      / CAST(len(toks) AS DOUBLE) AS mean_len,
       |    (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
       |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
       |    len(list_filter(toks, t -> lower(t) IN ($enSet)))
       |      / CAST(len(toks) AS DOUBLE) AS stop_ratio
       |  FROM (SELECT doc_id, text, $oToks AS toks FROM documents)),
       |q AS (
       |  SELECT doc_id,
       |    CAST(FLOOR((least(n_toks / 100.0, 1.0) * 0.4
       |      + least(mean_len / 10.0, 1.0) * 0.2
       |      + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2
       |      + least(stop_ratio * 5.0, 1.0) * 0.2) * 1e6) AS BIGINT)
       |      AS score_micro
       |  FROM qm)""".stripMargin
  }

  /** Iteration-by-iteration replay of [[Bpe.train]]: each round's CTEs
    * recount pairs from the previous round's re-segmented vocab, pick
    * the (count DESC, pair ASC) argmax, and apply the greedy
    * non-overlapping merge — consecutive match positions form islands
    * (only possible when lhs = rhs) and every other island position is
    * active, which is exactly the left-to-right scan.
    *
    * Every CTE is `AS MATERIALIZED`: DuckDB inlines plain CTEs, and
    * with each round referencing the previous round's vocab twice the
    * inlined plan doubles per round (n = 16 already exhausts file
    * handles re-scanning the parquet). Materialized, the replay is
    * linear — n = 100 runs in ~6 s at sf0.01. Rounds past pair
    * exhaustion yield an empty `win`, which the UNION ALL skips —
    * mirroring the trainer's early stop.
    */
  private def oBpeTrain(n: Int): String =
    oBpeCtes(n) + "\n" + (1 to n).map(k =>
      s"SELECT CAST($k AS BIGINT) AS it, l AS lhs, r AS rhs, " +
        s"pc AS pair_count FROM win$k").mkString("\nUNION ALL\n")

  /** [[oBpeTrain]] with the WordPiece winner rule (likelihood-ratio
    * argmax) — the p118 trajectory replay.
    */
  private def oWordPieceTrain(n: Int): String =
    oBpeCtes(n, wordPiece = true) + "\n" + (1 to n).map(k =>
      s"SELECT CAST($k AS BIGINT) AS it, l AS lhs, r AS rhs, " +
        s"pc AS pair_count, score AS score_q12 FROM win$k")
      .mkString("\nUNION ALL\n")

  /** The shared replay chain (w0..wN): each round counts pairs, picks
    * the winner, and re-segments. `m$$k` LEFT-joins the (≤1-row)
    * winner so rounds past pair exhaustion carry the word table
    * through UNCHANGED (`mt` is 0 under a NULL winner) — the train
    * replay reads the `win$$k`s, the encode replay reads the final
    * `w$$N` segmentation.
    */
  private def oBpeCtes(n: Int, wordPiece: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH w0 AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    list_transform(generate_series(1, length(word)),
         |      i -> substr(word, i, 1)) AS syms
         |  FROM (SELECT unnest($oToks) AS word FROM documents)
         |  WHERE length(word) > 0
         |  GROUP BY word)""".stripMargin)
    for (k <- 1 to n) {
      val p = k - 1
      // winner rule: BPE takes the raw pair-count argmax; WordPiece
      // normalizes by the symbol counts (likelihood ratio, exact
      // integer quotient) — the only difference between the replays
      val winner =
        if (wordPiece)
          s"""sc$k AS MATERIALIZED (
             |  SELECT sym, CAST(SUM(cnt) AS BIGINT) AS sc FROM (
             |    SELECT cnt, unnest(syms) AS sym FROM w$p)
             |  GROUP BY sym),
             |win$k AS MATERIALIZED (
             |  SELECT l, r, pc,
             |    (pc * 1000000000000) // (a.sc * b.sc) AS score
             |  FROM c$k JOIN sc$k a ON l = a.sym JOIN sc$k b ON r = b.sym
             |  ORDER BY score DESC, l, r LIMIT 1),""".stripMargin
        else
          s"""win$k AS MATERIALIZED (
             |  SELECT l, r, pc FROM c$k ORDER BY pc DESC, l, r LIMIT 1),"""
            .stripMargin
      sb.append(
        s""",
           |c$k AS MATERIALIZED (
           |  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS pc FROM (
           |    SELECT cnt, syms[pos] AS l, syms[pos + 1] AS r FROM (
           |      SELECT cnt, syms,
           |        unnest(generate_series(1, len(syms) - 1)) AS pos
           |      FROM w$p WHERE len(syms) >= 2))
           |  GROUP BY l, r),
           |$winner
           |m$k AS MATERIALIZED (
           |  SELECT word, cnt, syms, pos,
           |    CASE WHEN pos < len(syms) AND syms[pos] = win.l
           |         AND syms[pos + 1] = win.r THEN 1 ELSE 0 END AS mt
           |  FROM (SELECT word, cnt, syms,
           |          unnest(generate_series(1, len(syms))) AS pos
           |        FROM w$p) b LEFT JOIN win$k win ON 1 = 1),
           |g$k AS MATERIALIZED (
           |  SELECT word, cnt, syms, pos,
           |    CASE WHEN mt = 1 AND (pos - MIN(pos) OVER (PARTITION BY word, grp))
           |         % 2 = 0 THEN 1 ELSE 0 END AS act
           |  FROM (SELECT *, CASE WHEN mt = 1 THEN pos - ROW_NUMBER()
           |          OVER (PARTITION BY word, mt ORDER BY pos) END AS grp
           |        FROM m$k)),
           |w$k AS MATERIALIZED (
           |  SELECT word, cnt,
           |    list(CASE WHEN act = 1 THEN syms[pos] || syms[pos + 1]
           |         ELSE syms[pos] END ORDER BY pos) AS syms
           |  FROM (SELECT *, LAG(act, 1, 0) OVER (PARTITION BY word ORDER BY pos)
           |          AS pa FROM g$k)
           |  WHERE pa = 0 GROUP BY word, cnt)""".stripMargin)
    }
    sb.toString
  }

  /** The encode replay: the same CTE chain, final segmentation joined
    * back to every word position of every document.
    */
  private def oBpeEncode(n: Int, wordPiece: Boolean = false): String =
    s"""${oBpeCtes(n, wordPiece)}
       |SELECT d.doc_id, CAST(d.pos - 1 AS BIGINT) AS pos,
       |  CAST(len(w.syms) AS BIGINT) AS n_tokens,
       |  array_to_string(w.syms, ' ') AS tokens
       |FROM (SELECT doc_id, toks[pos] AS word, pos
       |      FROM (SELECT doc_id, toks,
       |              unnest(generate_series(1, len(toks))) AS pos
       |            FROM (SELECT doc_id, $oToks AS toks FROM documents))
       |      WHERE length(toks[pos]) > 0) d
       |JOIN w$n w ON w.word = d.word""".stripMargin

  /** p138 replay: exhaustive-pair near-dup edges, out-degrees, and
    * `iters` MATERIALIZED rounds of the integer PageRank recurrence —
    * the same `((pr·850000) div 10⁶) div outdeg` share order and
    * 150000 teleport as [[graft.operators.PageRank]].
    */
  private def oPagerank(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      val p = k - 1
      s"""pr$k AS MATERIALIZED (
         |  SELECT n.node, CAST(150000 + COALESCE(SUM(s.share), 0)
         |      AS BIGINT) AS pr
         |  FROM gn n LEFT JOIN (
         |    SELECT e.dst, ((p.pr * 850000) // 1000000) // d.outdeg
         |        AS share
         |    FROM ge e JOIN gd d ON e.src = d.src
         |    JOIN pr$p p ON e.src = p.node) s ON s.dst = n.node
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH gp AS MATERIALIZED (SELECT doc_a, doc_b FROM
       |  (${oJaccardPairs(4, 0.4)})),
       |ge AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM gp
       |  UNION SELECT doc_b AS src, doc_a AS dst FROM gp),
       |gd AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM ge
       |  GROUP BY src),
       |gn AS (SELECT doc_id AS node FROM documents),
       |pr0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS pr
       |  FROM gn),
       |$rounds
       |SELECT node AS doc_id, pr AS pr_micro FROM pr$iters"""
      .stripMargin
  }

  /** Expanded-BM25 replay for p144: the [[oBm25Ctes]] postings/stat
    * tables, the p116 PMI chain, the per-term top-1 collocate window
    * over the top-100 table, MAX-merged integer weights, and the
    * weighted score — final select is the ranked top-10.
    */
  private lazy val oBm25PmiExpanded: String = {
    val k1 = 1.2; val b = 0.75
    val avgdl = "(CAST(st.sdl AS DOUBLE) / CAST(st.nd AS DOUBLE))"
    val idf = "ln(1.0 + (CAST(st.nd AS DOUBLE) - CAST(f.df AS DOUBLE)" +
      " + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))"
    val norm = s"(CAST(p.tf AS DOUBLE) * ${k1 + 1}" +
      s" / (CAST(p.tf AS DOUBLE) + $k1 * (${1 - b}" +
      s" + $b * (CAST(d.dl AS DOUBLE) / $avgdl))))"
    s"""WITH base AS (SELECT doc_id, $oToks AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
       |         CAST(SUM(dl) AS BIGINT) AS sdl FROM dl),
       |post AS (
       |  SELECT tok, doc_id, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
       |  GROUP BY tok, doc_id),
       |qt AS (
       |  SELECT doc_id AS query_id, toks[i] AS tok
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, least(len(toks), 4))) AS i
       |        FROM base WHERE doc_id % ${oQStride("base")} = 0)
       |  GROUP BY 1, 2),
       |occ AS (
       |  SELECT toks[i] AS cur,
       |    CASE WHEN i > 1 THEN toks[i - 1] END AS prev
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks))) AS i FROM base)),
       |uni AS (SELECT cur AS tok, COUNT(*) AS cu FROM occ GROUP BY cur),
       |tot AS (SELECT SUM(cu) AS t FROM uni),
       |bg AS (SELECT prev, cur, COUNT(*) AS cxy FROM occ
       |       WHERE prev IS NOT NULL GROUP BY prev, cur
       |       HAVING COUNT(*) >= 5),
       |bt AS (SELECT COUNT(*) AS bt FROM occ WHERE prev IS NOT NULL),
       |pmisc AS (
       |  SELECT b.prev AS tok_a, b.cur AS tok_b,
       |    CAST(FLOOR(ln(
       |      (CAST(b.cxy AS DOUBLE) / CAST(bt.bt AS DOUBLE))
       |      / ((CAST(ux.cu AS DOUBLE) / CAST(tot.t AS DOUBLE))
       |         * (CAST(uy.cu AS DOUBLE) / CAST(tot.t AS DOUBLE))))
       |      * 1000000.0) AS BIGINT) AS pmi_micro
       |  FROM bg b JOIN uni ux ON b.prev = ux.tok
       |  JOIN uni uy ON b.cur = uy.tok CROSS JOIN tot CROSS JOIN bt),
       |coll AS (
       |  SELECT tok_a, tok_b, pmi_micro,
       |    ROW_NUMBER() OVER (ORDER BY pmi_micro DESC, tok_a, tok_b)
       |      AS rank
       |  FROM pmisc),
       |top1 AS (
       |  SELECT tok_a, tok_b FROM (
       |    SELECT tok_a, tok_b,
       |      ROW_NUMBER() OVER (PARTITION BY tok_a
       |        ORDER BY pmi_micro DESC, tok_b ASC) AS r
       |    FROM coll WHERE rank <= 100)
       |  WHERE r = 1),
       |wq AS (
       |  SELECT query_id, tok, MAX(w) AS w FROM (
       |    SELECT query_id, tok, 2 AS w FROM qt
       |    UNION ALL
       |    SELECT q.query_id, t.tok_b AS tok, 1 AS w
       |    FROM qt q JOIN top1 t ON q.tok = t.tok_a)
       |  GROUP BY query_id, tok),
       |dfq AS (
       |  SELECT p.tok, COUNT(*) AS df FROM post p
       |  WHERE p.tok IN (SELECT DISTINCT tok FROM wq)
       |  GROUP BY p.tok),
       |sc AS (
       |  SELECT q.query_id, p.doc_id, COUNT(*) AS n_terms,
       |    CAST(SUM(CAST(FLOOR($idf * $norm * 1000000.0) AS BIGINT)
       |             * q.w) AS BIGINT) AS score_micro
       |  FROM post p
       |  JOIN wq q ON p.tok = q.tok
       |  JOIN dfq f ON p.tok = f.tok
       |  JOIN dl d ON p.doc_id = d.doc_id
       |  CROSS JOIN st
       |  GROUP BY q.query_id, p.doc_id),
       |rk AS (
       |  SELECT query_id, doc_id, n_terms, score_micro,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS rank
       |  FROM sc)
       |SELECT query_id, doc_id, rank FROM rk WHERE rank <= 10"""
      .stripMargin
  }

  /** χ² feature-selection replay for p143: the funnel-label CTEs (as
    * [[oNbClassifier]]), distinct token presences, exact int64
    * contingency cells, and the single fixed-order double ratio.
    */
  private lazy val oChiSquare: String =
    s"""WITH g AS (${oGopherRules(minWords = 20, minStop = 1)}),
       |c AS (${oC4Lines(minLineWords = 3, requirePunct = false,
              minSentences = 0)}),
       |q AS (${oracle0("p09_quality")}),
       |lab AS (
       |  SELECT d.doc_id,
       |    CAST(CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END
       |         * g.keep * c.page_keep AS BIGINT) AS cls
       |  FROM documents d
       |  JOIN g ON d.doc_id = g.doc_id
       |  JOIN c ON d.doc_id = c.doc_id
       |  JOIN q ON d.doc_id = q.doc_id),
       |pres AS (SELECT DISTINCT doc_id, tok FROM
       |  (SELECT doc_id, unnest($oToks) AS tok FROM documents)),
       |lt AS (SELECT p.tok, lab.cls
       |       FROM pres p JOIN lab ON p.doc_id = lab.doc_id),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |               CAST(SUM(cls) AS BIGINT) AS npos FROM lab),
       |cells AS (SELECT tok, CAST(SUM(cls) AS BIGINT) AS n11,
       |                 CAST(COUNT(*) - SUM(cls) AS BIGINT) AS n10
       |          FROM lt GROUP BY tok),
       |sc AS (SELECT tok, n11, n10, npos - n11 AS n01,
       |              n - npos - n10 AS n00, n, npos FROM cells, tot),
       |x AS (SELECT tok, n11, n10,
       |  CASE WHEN (CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)
       |             * CAST(npos AS DOUBLE) * CAST(n - npos AS DOUBLE)) = 0
       |       THEN CAST(0 AS BIGINT)
       |       ELSE CAST(FLOOR(CAST(n AS DOUBLE)
       |         * CAST(n11 * n00 - n10 * n01 AS DOUBLE)
       |         * CAST(n11 * n00 - n10 * n01 AS DOUBLE)
       |         / (CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)
       |            * CAST(npos AS DOUBLE) * CAST(n - npos AS DOUBLE))
       |         * 1e6) AS BIGINT) END AS chi2_micro
       |  FROM sc),
       |r AS (SELECT *, ROW_NUMBER() OVER
       |        (ORDER BY chi2_micro DESC, tok ASC) AS rank FROM x)
       |SELECT CAST(rank AS BIGINT) AS rank, tok AS token, n11, n10,
       |  chi2_micro
       |FROM r WHERE rank <= 50""".stripMargin

  /** ARI replay for p142: both exhaustive near-dup pair scans (4-gram
    * Jaccard and SimHash), both recursive min-id closures, singleton
    * fill-in over the full corpus, and the exact pair-count sums with
    * the single double division at the end.
    */
  private lazy val oDetectorAgreement: String =
    s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
       |je AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |jreach(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM je)
       |  UNION
       |  SELECT r.u, e.v FROM jreach r JOIN je e ON r.v = e.u),
       |ja AS (SELECT u AS doc_id, MIN(v) AS cl FROM jreach GROUP BY u),
       |sims AS (
       |  SELECT doc_id, $oSimhash AS sim
       |  FROM (SELECT doc_id,
       |          list_transform($oToks, t -> ${oHash("t")}) AS hl
       |        FROM documents)),
       |sp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sim, b.sim)) <= 2),
       |se AS (SELECT doc_a AS u, doc_b AS v FROM sp
       |       UNION SELECT doc_b, doc_a FROM sp),
       |sreach(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM se)
       |  UNION
       |  SELECT r.u, e.v FROM sreach r JOIN se e ON r.v = e.u),
       |sa2 AS (SELECT u AS doc_id, MIN(v) AS cl FROM sreach GROUP BY u),
       |pa AS (SELECT d.doc_id, COALESCE(ja.cl, d.doc_id) AS ca
       |       FROM documents d LEFT JOIN ja ON d.doc_id = ja.doc_id),
       |pb AS (SELECT d.doc_id, COALESCE(sa2.cl, d.doc_id) AS cb
       |       FROM documents d LEFT JOIN sa2 ON d.doc_id = sa2.doc_id),
       |cells AS (SELECT ca, cb, CAST(COUNT(*) AS BIGINT) AS nij
       |          FROM pa JOIN pb ON pa.doc_id = pb.doc_id GROUP BY ca, cb),
       |t1 AS (SELECT CAST(SUM((nij * (nij - 1)) // 2) AS BIGINT) AS sij,
       |              CAST(SUM(nij) AS BIGINT) AS n FROM cells),
       |t2 AS (SELECT CAST(SUM((ai * (ai - 1)) // 2) AS BIGINT) AS sa FROM
       |  (SELECT CAST(SUM(nij) AS BIGINT) AS ai FROM cells GROUP BY ca)),
       |t3 AS (SELECT CAST(SUM((bj * (bj - 1)) // 2) AS BIGINT) AS sb FROM
       |  (SELECT CAST(SUM(nij) AS BIGINT) AS bj FROM cells GROUP BY cb)),
       |f AS (SELECT n, sij, sa, sb, (n * (n - 1)) // 2 AS cn2
       |      FROM t1, t2, t3)
       |SELECT n, sij AS sum_nij_c2, sa AS sum_a_c2, sb AS sum_b_c2,
       |  CASE WHEN (cn2 * (sa + sb) - 2 * sa * sb) = 0
       |       THEN CAST(1000000 AS BIGINT)
       |       ELSE CAST(FLOOR(
       |         CAST(2 * cn2 * sij - 2 * sa * sb AS DOUBLE)
       |           / CAST(cn2 * (sa + sb) - 2 * sa * sb AS DOUBLE) * 1e6)
       |         AS BIGINT) END AS ari_micro
       |FROM f""".stripMargin

  /** Triangle replay over the p138 edge set: exhaustive pairs, the
    * (degree, id) compact-forward orientation, wedge-close joins, and
    * the per-node roll-up — the p141 oracle.
    */
  private lazy val oTriangles: String =
    s"""WITH gp AS MATERIALIZED (SELECT doc_a, doc_b FROM
       |  (${oJaccardPairs(4, 0.4)})),
       |deg AS MATERIALIZED (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM
       |  (SELECT doc_a AS n FROM gp UNION ALL SELECT doc_b AS n FROM gp)
       |  GROUP BY n),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND gp.doc_a < gp.doc_b)
       |              THEN gp.doc_a ELSE gp.doc_b END AS src,
       |         CASE WHEN da.d < db.d OR (da.d = db.d AND gp.doc_a < gp.doc_b)
       |              THEN gp.doc_b ELSE gp.doc_a END AS dst
       |  FROM gp JOIN deg da ON gp.doc_a = da.n
       |          JOIN deg db ON gp.doc_b = db.n),
       |tri AS MATERIALIZED (
       |  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
       |  FROM o o1 JOIN o o2 ON o1.dst = o2.src
       |  JOIN o o3 ON o3.src = o1.src AND o3.dst = o2.dst),
       |tc AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS t FROM
       |  (SELECT a AS n FROM tri UNION ALL SELECT b AS n FROM tri
       |   UNION ALL SELECT c AS n FROM tri) GROUP BY n)
       |SELECT deg.n AS doc_id, deg.d AS degree,
       |  COALESCE(tc.t, CAST(0 AS BIGINT)) AS tri_count
       |FROM deg LEFT JOIN tc ON deg.n = tc.n""".stripMargin

  /** k-core replay over the p138 edge set: exhaustive pairs, then for
    * each k the full sequence of simultaneous peel rounds as
    * materialized CTEs (degree count, survivor filter, edge
    * restriction) — the p154 oracle.
    */
  private def oKCore(ks: Seq[Int], rounds: Int): String = {
    def peel(tag: String, k: Int): String =
      (1 to rounds).map { r =>
        val prev = if (r == 1) "ge0" else s"${tag}e${r - 1}"
        s"""${tag}a$r AS MATERIALIZED (SELECT src FROM $prev
           |  GROUP BY src HAVING COUNT(*) >= $k),
           |${tag}e$r AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM $prev e
           |  JOIN ${tag}a$r s ON e.src = s.src
           |  JOIN ${tag}a$r d ON e.dst = d.src)""".stripMargin
      }.mkString(",\n")
    val peels = ks.map(k => peel(s"k$k", k)).mkString(",\n")
    val selects = ks.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k, src AS doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS core_deg
         |FROM k${k}e$rounds GROUP BY src""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH gp AS MATERIALIZED (SELECT doc_a, doc_b FROM
       |  (${oJaccardPairs(4, 0.4)})),
       |ge0 AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM gp
       |  UNION SELECT doc_b AS src, doc_a AS dst FROM gp),
       |$peels
       |$selects""".stripMargin
  }

  /** p156 replay: the exhaustive near-dup pair scan and recursive
    * closure (the p151 decision CTEs), then the ENTIRE BM25 scoring
    * chain built twice — once from the full corpus, once from the
    * min-id-cut survivor set — against the one shared planted-prefix
    * query table, each chain ending in its scorecard row.
    */
  private lazy val oDedupRetrievalImpact: String = {
    val k1 = 1.2; val b = 0.75
    val avgdl = "(CAST(st.sdl AS DOUBLE) / CAST(st.nd AS DOUBLE))"
    val idf = "ln(1.0 + (CAST(st.nd AS DOUBLE) - CAST(f.df AS DOUBLE)" +
      " + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))"
    val norm = s"(CAST(p.tf AS DOUBLE) * ${k1 + 1}" +
      s" / (CAST(p.tf AS DOUBLE) + $k1 * (${1 - b}" +
      s" + $b * (CAST(d.dl AS DOUBLE) / $avgdl))))"
    def chain(px: String, baseRel: String): String =
      s"""${px}dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl
         |  FROM $baseRel),
         |${px}st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         |  CAST(SUM(dl) AS BIGINT) AS sdl FROM ${px}dl),
         |${px}post AS (
         |  SELECT tok, doc_id, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM $baseRel)
         |  GROUP BY tok, doc_id),
         |${px}dfq AS (
         |  SELECT p.tok, COUNT(*) AS df FROM ${px}post p
         |  WHERE p.tok IN (SELECT DISTINCT tok FROM qt)
         |  GROUP BY p.tok),
         |${px}sc AS (
         |  SELECT q.query_id, p.doc_id,
         |    CAST(SUM(CAST(FLOOR($idf * $norm * 1000000.0) AS BIGINT))
         |      AS BIGINT) AS score_micro
         |  FROM ${px}post p
         |  JOIN qt q ON p.tok = q.tok
         |  JOIN ${px}dfq f ON p.tok = f.tok
         |  JOIN ${px}dl d ON p.doc_id = d.doc_id
         |  CROSS JOIN ${px}st st
         |  GROUP BY q.query_id, p.doc_id),
         |${px}rk10 AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY score_micro DESC, doc_id) AS rank
         |    FROM ${px}sc)
         |  WHERE rank <= 10)""".stripMargin
    s"""WITH RECURSIVE alldocs AS MATERIALIZED (
       |  SELECT doc_id, $oToks AS toks FROM documents),
       |${oPairCtes(4, 0.4, toksRel = "alldocs")},
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |dec AS (SELECT u AS doc_id,
       |    CASE WHEN u = MIN(v) THEN 1 ELSE 0 END AS keep
       |  FROM reach GROUP BY u),
       |qt AS (
       |  SELECT doc_id AS query_id, toks[i] AS tok
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, least(len(toks), 4))) AS i
       |        FROM alldocs WHERE doc_id % ${oQStride("alldocs")} = 0)
       |  GROUP BY 1, 2),
       |fbase AS (SELECT * FROM alldocs),
       |dbase AS (
       |  SELECT a.* FROM alldocs a
       |  LEFT JOIN dec ON a.doc_id = dec.doc_id
       |  WHERE COALESCE(dec.keep, 1) = 1),
       |${chain("f", "fbase")},
       |${chain("d", "dbase")}
       |${oScorecardRow("frk10", "full")}
       |UNION ALL
       |${oScorecardRow("drk10", "dedup_minid")}""".stripMargin
  }

  /** Bounded near-dup pair CTE chain — the oracle-side cost-diet twin
    * of the engine's own inverted-index candidate generation. Emits
    * CTEs `sh`, `ndposts`, `ndsz`, `ndcand`, and
    * `pairs(doc_a, doc_b[, j])`.
    *
    * EXACT, not approximate: for any threshold > 0 a qualifying pair
    * shares at least one k-shingle, so the shingle-equality self-join
    * finds every such pair; and because [[oShingles]] emits
    * `list_distinct` lists, the per-pair match count IS the
    * intersection size, giving J = inter / (|A| + |B| - inter)
    * exactly. Equivalence with the old exhaustive O(N²) scan is
    * pinned by `tools/oracle_equiv.py` (byte-identical result sets at
    * sf0.01 and an sf0.1 slice); cost drops from O(N²) string-list
    * intersections (~7 s at sf0.01, >5 min at sf0.1, replayed per CTE
    * reference by DuckDB's inlining) to O(Σ f_g²) grouped integer
    * counting behind a MATERIALIZED barrier (~0.05 s / ~0.8 s).
    *
    * `toksRel` is the relation exposing (doc_id, toks) — override when
    * an embedding oracle already has a token CTE (e.g. `alldocs`).
    */
  private def oPairCtes(k: Int, threshold: Double,
      withJ: Boolean = false,
      toksRel: String = ""): String = {
    val toks =
      if (toksRel.nonEmpty) toksRel
      else s"(SELECT doc_id, $oToks AS toks FROM documents)"
    val j = "c.inter / CAST(sa.n + sb.n - c.inter AS DOUBLE)"
    val jcol = if (withJ) s",\n    $j AS j" else ""
    s"""sh AS MATERIALIZED (
       |  SELECT doc_id, ${oShingles(k)} AS sh
       |  FROM $toks),
       |ndposts AS (SELECT doc_id, unnest(sh) AS g FROM sh),
       |ndsz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM sh),
       |ndcand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM ndposts a JOIN ndposts b
       |    ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS MATERIALIZED (
       |  SELECT c.doc_a, c.doc_b$jcol
       |  FROM ndcand c JOIN ndsz sa ON c.doc_a = sa.doc_id
       |  JOIN ndsz sb ON c.doc_b = sb.doc_id
       |  WHERE $j >= $threshold)""".stripMargin
  }

  /** Pair-Jaccard oracle shared by the dedup queries — the
    * [[oPairCtes]] inverted-index formulation (exact; see there). */
  private def oJaccardPairs(k: Int, threshold: Double): String =
    s"""WITH ${oPairCtes(k, threshold, withJ = true)}
       |SELECT doc_a, doc_b, CAST(FLOOR(j * 1e6) AS BIGINT) AS jaccard_micro
       |FROM pairs""".stripMargin

  // ---------------------------------------------------------------- dedup

  /** Exact dedup: hash-groupBy on normalized text. */
  def p01ExactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "doc_id", "text")

  /** MinHash + LSH near-dup pairs (12 hashes, 6 bands × 2 rows,
    * verified Jaccard ≥ 0.5). The oracle is the exhaustive pair scan,
    * so a pass certifies LSH recall at this SF.
    */
  def p02MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 3, numHashes = 12, bands = 6, threshold = 0.5)

  /** SimHash near-dup pairs (64-bit simhash, 4-segment LSH,
    * Hamming ≤ 2 — exact by pigeonhole).
    *
    * Bucket cardinality is the quadratic-blowup lever: 16-bit segments
    * give 65k possible (seg, segval) values, so bucket occupancy — and
    * with it the self-join's candidate count — stays proportional to
    * real near-dup density. (A 16-bit hash in 4-bit segments would put
    * ~1/16 of the corpus in every bucket: O(N²/16) candidates.)
    * The underlying token hash is 60-bit, so bits 60–63 are constant;
    * segment 3 still spans 4k effective values.
    */
  def p03Simhash(s: SparkSession, dir: String): DataFrame =
    DedupStore.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
      bits = 64, segments = 4, maxHamming = 2)

  /** 4-gram-Jaccard pairs via inverted shingle index, with BOTH scale
    * levers engaged: 60-bit hashed posting keys (8-byte shuffle) and
    * stopword-shingle pruning at 10% of the corpus — a posting list
    * longer than that contributes O(f²) candidate rows by itself (the
    * inverted-index skew killer), while true near-dups at J ≥ 0.4
    * still share plenty of sub-threshold shingles. The oracle is the
    * exhaustive pair scan, so a pass certifies that pruning lost no
    * qualifying pair at this SF.
    */
  def p04NgramJaccard(s: SparkSession, dir: String): DataFrame =
    DedupStore.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))

  // ------------------------------------------------------------ similarity

  /** Brute-force cosine top-5 for a 20-query batch. */
  def p05CosineTopK(s: SparkSession, dir: String): DataFrame =
    p05CosineTopKOn(t(s, dir, "embeddings"))
  private def p05CosineTopKOn(emb: DataFrame): DataFrame =
    Similarity.topK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", k = 5)

  /** Hard-negative mining for contrastive training: the top-5
    * most-similar candidates per query that sit BELOW the near-dup
    * ceiling (cosine < 0.8) — similar enough to be hard, distinct
    * enough not to be a positive leaking into the negatives. The
    * ceiling filters map-side before ranking, so it shrinks the top-k
    * exchange rather than adding a pass.
    */
  def p51HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.topK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", k = 5, simCeiling = Some(0.8))
  }

  /** Trained-quantizer IVF, end to end: two Lloyd iterations refine the
    * seed centroids ([[Similarity.kmeansTrain]]), the fixed-point means
    * rebuild as float centroid vectors
    * ([[Similarity.centroidsFromMeans]]), and the multi-probe IVF scan
    * runs against the TRAINED cells ([[Similarity.ivfTopKWith]]) — the
    * production ANN composition (train → index → query) as one plan
    * chain, oracle-replayed iteration by iteration.
    */
  def p52IvfTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val means = graft.pipeline.TrainedIndexStore.kmeansMeans(emb,
      "vec_id", "embedding", centroidFilter = col("vec_id") % 25 === 0,
      iters = 2)
    Similarity.ivfTopKWith(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", Similarity.centroidsFromMeans(means), k = 3, nprobe = 2)
  }

  /** Hyperplane-LSH approximate top-3 (4 planes → 16 buckets). */
  def p06AnnLsh(s: SparkSession, dir: String): DataFrame =
    p06AnnLshOn(t(s, dir, "embeddings"))
  private def p06AnnLshOn(emb: DataFrame): DataFrame =
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", dim = 64, planes = 4, k = 3)

  /** Multi-probe hyperplane LSH top-k (p93): p06's index, but each
    * query also probes the `probes`=2 buckets reached by flipping its
    * smallest-margin planes (Lv et al. 2007) — recall climbs toward
    * multi-table LSH while the corpus keeps ONE bucket assignment.
    * The oracle replays the margin sort and the perturbed-bucket
    * join, so a pass certifies the probe-set construction end to end.
    */
  def p93LshMultiProbe(s: SparkSession, dir: String): DataFrame =
    p93LshMultiProbeOn(t(s, dir, "embeddings"))
  private def p93LshMultiProbeOn(emb: DataFrame): DataFrame =
    Similarity.lshMultiProbeTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", dim = 64, planes = 4, probes = 2, k = 3)

  /** Embedding-cosine near-dup pairs: all pairs with cosine ≥ 0.4.
    * Brute force at this SF; the LSH-bucketed path (p06) is the scale
    * variant.
    */
  def p07EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // single-file input → 1 split; spread the N² scoring across cores
    val a = e.repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        Similarity.l2norm(col("embedding")).as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      Similarity.l2norm(col("embedding")).as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim", Similarity.dotOverNorms(col("ea"), col("eb"), col("na"), col("nb")))
      .filter(col("sim") >= 0.4)
      .select(col("vec_a"), col("vec_b"),
        floor(col("sim") * 1e6).cast("long").as("sim_micro"))
  }

  // ---------------------------------------------------------- text analysis

  /** Language ID by stopword-count argmax. */
  def p08LangId(s: SparkSession, dir: String): DataFrame = {
    val toks = TF.tokens(col("text"))
    t(s, dir, "documents").select(
      Seq(col("doc_id"), TF.langId(toks).as("lang_pred")) ++
        TF.stopwords.map { case (lang, ws) =>
          TF.stopwordHits(toks, ws).cast("long").as(s"hits_$lang")
        }: _*)
  }

  /** Quality scoring: token stats, punctuation/stopword ratios,
    * composite score.
    */
  def p09Quality(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("mean_len",
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
          .cast("double") / col("n_toks").cast("double"))
      .withColumn("punct_ratio",
        TF.punctCount(col("text")).cast("double") / length(col("text")).cast("double"))
      .withColumn("stop_ratio",
        TF.stopwordHits(col("toks"), TF.stopwords.head._2).cast("double") /
          col("n_toks").cast("double"))
    d.select(
      col("doc_id"),
      col("n_toks").cast("long").as("n_toks"),
      col("mean_len"),
      col("punct_ratio"),
      col("stop_ratio"),
      TF.qualityScore(col("n_toks"), col("mean_len"), col("punct_ratio"),
        col("stop_ratio")).as("score"))
  }

  /** Token counting: whitespace and BPE-ish sub-word tokenization. */
  def p10Tokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      size(TF.tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(TF.bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars"))

  /** Document fingerprinting: md5-prefix of normalized text + minimum
    * shingle hash (Rabin-style min fingerprint).
    */
  def p11Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val toks = TF.tokens(col("text"))
    t(s, dir, "documents").select(
      col("doc_id"),
      TF.fingerprint(toks).as("fp"),
      coalesce(array_min(TF.shingleHashes(TF.shingles(toks, 3))), lit(TF.P))
        .as("min_shingle_hash"))
  }

  /** Gopher-style rule-set quality filter (Rae et al. 2021, §A1.1 —
    * the boolean-gate complement of p09's composite score): word-count
    * bounds, mean-word-length bounds, symbol-to-word ratio, bullet /
    * ellipsis line fractions, alphabetic-word fraction, and required
    * stopword presence. Every rule is an INTEGER cross-multiplied
    * comparison (no ratio doubles), so the oracle reproduces each flag
    * exactly. Zero-exchange single-scan projection at any scale (the
    * higher-order array ops run as expressions, no join, no shuffle).
    */
  def p61GopherRules(s: SparkSession, dir: String): DataFrame =
    Curation.gopherGates(t(s, dir, "documents"), "doc_id", "text")

  /** C4-style line-and-page cleaning (Raffel et al. 2020, §2.2 — the
    * line-level complement of p61's page-level Gopher gates), the
    * shared [[Curation.c4PageGates]] projection: a line survives with
    * at least five words AND terminal punctuation; a page survives
    * with no "{", no "lorem ipsum", at least three sentence marks and
    * a surviving line. The same expressions run in the per-source
    * funnel (p66) and the streaming ingest twin.
    */
  def p64C4Lines(s: SparkSession, dir: String): DataFrame =
    Curation.c4PageGates(t(s, dir, "documents"), "doc_id", "text")

  /** Exact dedup under the keep-longest policy
    * ([[Dedup.exactKeepLongest]]): the survivor of each duplicate
    * group is the doc with the most raw characters (ties to the
    * smaller id) instead of the smallest id — the policy real curation
    * pipelines use when near-identical scrapes differ in formatting.
    * Same 16-byte-key shuffle as p01; the policy lives in the
    * aggregate, not an extra pass.
    */
  def p67KeepLongest(s: SparkSession, dir: String): DataFrame =
    Dedup.exactKeepLongest(t(s, dir, "documents"), "doc_id", "text")

  /** The p09 composite quality score floored to integer micro-units —
    * the deterministic ranking key the canonical-selection and
    * importance-sampling ops order by. The double itself is portable
    * (p09 hash-matches it), so its floor is too.
    */
  private def scoredDocs(docs: DataFrame): DataFrame = {
    val toks = TF.tokens(col("text"))
    docs
      .withColumn("n_toks", size(toks))
      .withColumn("mean_len",
        aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") /
          col("n_toks").cast("double"))
      .withColumn("punct_ratio",
        TF.punctCount(col("text")).cast("double") /
          length(col("text")).cast("double"))
      .withColumn("stop_ratio",
        TF.stopwordHits(toks, TF.stopwords.head._2).cast("double") /
          col("n_toks").cast("double"))
      .withColumn("score_micro",
        floor(TF.qualityScore(col("n_toks"), col("mean_len"),
          col("punct_ratio"), col("stop_ratio")) * 1e6).cast("long"))
  }

  /** CCNet-style unigram-LM perplexity scoring
    * ([[Curation.unigramLogLoss]]): a 500-token add-one-smoothed
    * unigram model fit on the corpus itself, every document scored by
    * total and mean negative log-likelihood in integer micro-nats —
    * the "perplexity filter" stage of a web-curation pipeline. The
    * oracle refits the model from scratch, so a pass certifies the
    * vocabulary cut, the smoothing arithmetic, and the OOV fallback.
    */
  def p68UnigramLm(s: SparkSession, dir: String): DataFrame =
    Curation.unigramLogLoss(t(s, dir, "documents"), "doc_id", "text",
      vocabSize = 500)

  /** Learned quality classifier (p81): weak-label every document by
    * the three-gate funnel, fit a multinomial Naive Bayes model on the
    * labeled corpus in closed form (one token-count shuffle — the
    * distributed stand-in for CCNet's fastText classifier), and score
    * the corpus back, reporting the gate label next to the model
    * verdict — the training-set confusion table a curation run reads
    * before trusting the model on unlabeled data. The oracle refits
    * the whole model from scratch (labels, vocabulary cut, add-one
    * LLRs, OOV fallback, class prior), so a pass certifies the
    * arithmetic end to end in integer micro-nats.
    */
  def p81NbClassifier(s: SparkSession, dir: String): DataFrame =
    // wordSalad gate profile: the published thresholds admit zero
    // documents of the punctuation-free synthetic corpus, which would
    // train the model on all-negative labels (see GateProfile)
    Curation.nbClassifier(t(s, dir, "documents"), "doc_id", "text",
      vocabSize = 500, profile = Curation.GateProfile.wordSalad)

  /** Classifier-vs-gates audit (p84): per source, where the learned
    * NB model and the heuristic funnel DISAGREE — `n_rescued` (gates
    * reject, model keeps) and `n_rejected` (gates keep, model
    * rejects) next to both keep counts. This is the table a curation
    * team reads before swapping rule gates for the model. The source
    * column rides the classifier's own scoring key (functionally
    * dependent on the doc id), so the rollup adds one
    * source-cardinality exchange and no join.
    */
  def p84ClassifierAudit(s: SparkSession, dir: String): DataFrame =
    classifierAuditRollup(Curation.nbClassifier(t(s, dir, "documents"),
      "doc_id", "text", vocabSize = 500, carry = Seq("source"),
      profile = Curation.GateProfile.wordSalad))

  private def classifierAuditRollup(scored: DataFrame): DataFrame =
    scored.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("cls")).as("n_gate_keep"),
        sum(col("pred")).as("n_model_keep"),
        sum(when(col("cls") === 0 && col("pred") === 1, 1L).otherwise(0L))
          .as("n_rescued"),
        sum(when(col("cls") === 1 && col("pred") === 0, 1L).otherwise(0L))
          .as("n_rejected"))
      .orderBy("source")

  /** Interpolated bigram-LM perplexity (p82): the KenLM-shaped step
    * past p68 — every document scored by the Jelinek-Mercer mix of
    * the raw bigram MLE and the add-one unigram (λ=0.5) in integer
    * micro-nats, position 1 by the unigram alone. The oracle refits
    * both count tables and replays the interpolation arithmetic, so a
    * pass certifies the zero-exchange predecessor extraction, the
    * unpruned context totals, and the per-position cost mix.
    */
  def p82BigramLm(s: SparkSession, dir: String): DataFrame =
    Curation.bigramLogLoss(t(s, dir, "documents"), "doc_id", "text",
      vocabSize = 500)

  /** Kneser-Ney bigram perplexity (p89): the refinement past p82's
    * Jelinek-Mercer mix — absolute discounting (D=0.75) with
    * continuation counts, the smoothing KenLM itself defaults to
    * (Kneser & Ney 1995; Chen & Goodman 1998 §2.7). The oracle refits
    * the bigram/context/continuation tables and replays the discount
    * arithmetic, so a pass certifies the distinct-successor and
    * distinct-predecessor statistics and the back-off routing at
    * position-1/unseen-context tokens — the parts KN adds over p82.
    */
  def p89KnBigram(s: SparkSession, dir: String): DataFrame =
    Curation.knBigramLogLoss(t(s, dir, "documents"), "doc_id", "text",
      vocabSize = 500)

  /** DSIR data selection (p90): hashed unigram+bigram features (512
    * buckets), importance model fit target-vs-raw where the target is
    * the funnel-pass subset (wordSalad profile — see p81's note on why
    * published thresholds admit zero synthetic docs), deterministic
    * Gumbel top-100 resample. The oracle refits the bucket counts and
    * replays the log-ratio + Gumbel-key arithmetic, so a pass
    * certifies the feature hashing, the add-one model, and the
    * without-replacement selection order (Xie et al. 2023).
    */
  def p90Dsir(s: SparkSession, dir: String): DataFrame =
    Curation.dsir(t(s, dir, "documents"), "doc_id", "text",
      buckets = 512, k = 100, profile = Curation.GateProfile.wordSalad)

  /** Normalized exact dedup (p91): [[Dedup.exactNormalized]] — CCNet
    * canonicalization (lowercase, digit-fold, punctuation strip,
    * whitespace collapse) before the 16-byte-digest groupBy, with
    * `n_raw_distinct` certifying which groups normalization (not byte
    * identity) collapsed.
    */
  def p91NormDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exactNormalized(t(s, dir, "documents"), "doc_id", "text")

  /** DoReMi-lite domain mixture weights (p92): per-source Kneser-Ney
    * per-token loss, excess over the best-compressed source, weights
    * = token-share × exp(excess) normalized in exact integer
    * arithmetic. The oracle refits the KN model per source and
    * replays the excess/weight chain, so a pass certifies the
    * domain-grouped scoring and the deterministic normalization.
    */
  def p92DomainMix(s: SparkSession, dir: String): DataFrame =
    Curation.domainMixWeights(t(s, dir, "documents"), "doc_id", "text",
      "source", vocabSize = 500)

  /** Curriculum training order (p94): global easy-to-hard numbering
    * by self-trained KN perplexity with hash-draw tiebreaks, banded
    * into 4 equal phases by integer rank arithmetic. The oracle
    * replays the KN scoring, the total order, and the band division,
    * so a pass certifies the two-phase global numbering against a
    * window-function reference.
    */
  def p94Curriculum(s: SparkSession, dir: String): DataFrame =
    Curation.curriculumOrder(t(s, dir, "documents"), "doc_id", "text",
      vocabSize = 500, nPhases = 4)

  /** Near-dup cluster canonical selection: the p37 clusters, but the
    * survivor is the HIGHEST-QUALITY member (p09 score, ties to the
    * smaller id) rather than the minimum id — keep-best, the policy a
    * curation pipeline actually wants when scrapes of the same page
    * differ in boilerplate. One row per cluster with its size. The
    * score lives in the same window shuffle that ranks the cluster —
    * no extra pass over the corpus.
    */
  def p69ClusterBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val comp = DedupStore.dedupDecisions(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    comp.select(col("node").as("doc_id"), col("component").as("cluster_id"))
      .join(scoredDocs(docs).select(col("doc_id"), col("score_micro")),
        Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("best_doc_id"),
        col("score_micro").as("best_score_micro"), col("cluster_size"))
  }

  /** Quality-weighted importance sampling
    * ([[Curation.importanceSample]]): each document accepted with
    * probability score/max(score) by a seedless portable-hash draw —
    * deterministic resampling toward quality. The top-scoring doc is
    * always accepted (draw < 1e6 by construction); a zero score is
    * never accepted.
    */
  def p70ImportanceSample(s: SparkSession, dir: String): DataFrame =
    Curation.importanceSample(
      scoredDocs(t(s, dir, "documents"))
        .select(col("doc_id"), col("source"), col("score_micro")),
      "doc_id", "score_micro")

  /** Full BPE merge-loop training ([[Bpe.train]], up to 100 merges):
    * p62 gave one round's pair statistic; this runs the actual trainer
    * — count → argmax → greedy re-segment, iterated — and emits the
    * learned merge table. The oracle replays every iteration (pair
    * counts from the re-segmented vocab, the (count DESC, pair) argmax,
    * and the greedy non-overlapping merge via an islands window), so a
    * pass certifies the whole training trajectory to pair EXHAUSTION
    * (the sf corpus vocabulary runs dry at 89 merges; both sides stop
    * there) — deep enough that any per-round lineage compounding would
    * have blown the plan long before the end.
    */
  def p71BpeTrain(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TokenizerStore
      .bpe(t(s, dir, "documents"), dir, "text", nMerges = 100)._1

  /** Tokenize the corpus with the p71-trained merge table
    * ([[graft.pipeline.TokenizerStore]] + [[Bpe.encodeWith]] — the
    * tokenizer lifecycle's other half): train to exhaustion, then
    * tokenize every document through the trainer's OWN final
    * segmentation as the broadcast dictionary — the trained artifact
    * comes from the session's model registry, so training runs
    * exactly once per corpus no matter how many encode consumers run
    * (production tokenizer economics), and encode costs one
    * broadcast-joined corpus scan. The oracle replays the
    * SAME training chain and joins the final segmentation back to
    * every word position — train and encode certified together, per
    * (doc, position).
    */
  def p75BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (_, vocab) = graft.pipeline.TokenizerStore
      .bpe(docs, dir, "text", nMerges = 100)
    Bpe.encodeWith(docs, "doc_id", "text", vocab)
  }

  /** Per-source quality funnel (the dataset-card view of the three
    * quality gates): for each source, how many documents survive the
    * composite score (p09, ≥ 0.5), the Gopher rule set (p61), the C4
    * page gates (p64), and all three together. ONE pass — every gate
    * is a per-row expression over the same scan, so the only exchange
    * is the source-count rollup (source-cardinality rows).
    */
  def p66QualityFunnel(s: SparkSession, dir: String): DataFrame = {
    // The per-row stage is the SHARED Curation.funnelFlags projection
    // (the streaming ingest funnel runs it verbatim); the only
    // exchange in the whole query is this source-cardinality rollup.
    val full = Curation.funnelFlags(t(s, dir, "documents"), "doc_id",
      "text", carry = Seq("source"))
    full.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("score_keep")).as("n_score"),
        sum(col("keep")).as("n_gopher"),
        sum(col("page_keep")).as("n_c4"),
        sum(col("score_keep") * col("keep") * col("page_keep")).as("n_all"))
      .orderBy("source")
  }

  /** BPE merge-step pair counting (tokenizer prep): the corpus-wide
    * frequency of adjacent sub-word token pairs — the statistic a BPE
    * trainer computes each merge round — with a deterministic top-k.
    * One shuffle (partial map-side counts) + TakeOrderedAndProject;
    * the pair key is a short string, never the document.
    */
  def p62BpePairs(s: SparkSession, dir: String): DataFrame = {
    val toks = TF.bpeTokens(col("text"))
    // zip_with over two slices, NOT element_at(toks, i) inside a
    // transform lambda: non-lambda subexpressions of a HOF body are
    // re-evaluated per element, which would re-run the tokenizer regex
    // O(tokens) times per document (measured 50x slower at sf0.1).
    val pairs = when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    t(s, dir, "documents")
      .select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pair"))
      .limit(20)
  }

  // ------------------------------------------------------------ multimodal

  /** Multimodal feature extraction over a MIXED corpus: even doc_ids
    * are real PNG payloads — dimensions and mean luma come from the
    * actual `ImageIO` raster ([[Multimodal.extractFeatures]]'s
    * magic-sniffed decode path) and the oracle replays them in closed
    * form from the doc attributes — odd doc_ids are opaque text
    * payloads through the documented stub, certifying byte metadata
    * (n_bytes, md5) and the stub dims. Payload-dependent columns
    * (bytes, checksum, luma) are nulled on the side where no engine
    * could reproduce them (PNG bytes are encoder-specific; stub luma
    * is a byte-sum no SQL replays cheaply).
    */
  def p12Multimodal(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mixedMediaFromDocuments(s, t(s, dir, "documents"))
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("mime"),
        when(col("mime") === "text/plain", col("n_bytes")).as("n_bytes"),
        when(col("mime") === "text/plain", col("checksum")).as("checksum"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        when(col("mime") === "image/png",
          floor(col("mean_luma") * lit(1e6)).cast("long")).as("luma_micro"))
  }

  /** REAL image decode ([[Multimodal.encodePng]]/[[Multimodal.decodePng]]
    * — `javax.imageio`, not the stub): per document a solid-color PNG
    * with doc-derived dimensions/color is encoded through the actual
    * PNG codec, and the query output is what `ImageIO.read` decodes
    * back from those bytes. The oracle recomputes the dimensions/pixel
    * from the doc attributes, so a pass proves encode∘decode identity —
    * both codec calls genuinely ran. (Payload BYTES are never hashed:
    * PNG filter choices differ across encoders.)
    */
  def p57PngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "documents").select(
        col("doc_id"),
        (lit(1) + pmod(col("doc_id"), lit(16))).cast("int"),
        (lit(1) + pmod(length(col("text")), lit(16))).cast("int"),
        (pmod(col("doc_id"), lit(256)) * 65793).cast("int"))
      .as[(Long, Int, Int, Int)]
    Multimodal.decodePng(Multimodal.encodePng(src)).toDF()
  }

  /** Mixed-format REAL image decode ([[Multimodal.encodeImage]] /
    * [[Multimodal.decodePng]]): even doc_ids encode through the actual
    * PNG writer, odd doc_ids through the actual JPEG writer, and one
    * format-sniffing `ImageIO.read` pass decodes both. Dimensions are
    * pinned exactly for both formats; the top-left pixel is pinned
    * exactly for PNG (lossless) and as a ±8-per-channel band for JPEG
    * (lossy — solid-gray blocks quantize to within a few counts), so
    * the oracle replays `px_ok = 1` for every row in closed form.
    */
  def p72JpegDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    def src(parity: Int) =
      docs.filter(pmod(col("doc_id"), lit(2)) === parity).select(
          col("doc_id"),
          (lit(1) + pmod(col("doc_id"), lit(16))).cast("int"),
          (lit(1) + pmod(length(col("text")), lit(16))).cast("int"),
          (pmod(col("doc_id"), lit(256)) * 65793).cast("int"))
        .as[(Long, Int, Int, Int)]
    val mixed = Multimodal.encodeImage(src(0), "png")
      .union(Multimodal.encodeImage(src(1), "jpg"))
    val gray = pmod(col("media_id"), lit(256))
    val r = floor(col("px00") / 65536) % 256
    val g = floor(col("px00") / 256) % 256
    val b = col("px00") % 256
    Multimodal.decodePng(mixed).toDF()
      .select(col("media_id"),
        when(pmod(col("media_id"), lit(2)) === 0, "image/png")
          .otherwise("image/jpeg").as("mime"),
        col("width"), col("height"),
        when(pmod(col("media_id"), lit(2)) === 0,
            (col("px00") === gray * 65793).cast("long"))
          .otherwise((abs(r - gray) <= 8 && abs(g - gray) <= 8 &&
            abs(b - gray) <= 8).cast("long"))
          .as("px_ok"))
  }

  /** Perceptual image near-dup: 64-bit dHash over each REALLY decoded
    * raster ([[Multimodal.dHash]]), paired through the segment-LSH
    * banded Hamming join ([[Dedup.hammingPairs]] — 4 segments,
    * radius 3, exact by pigeonhole). The planted near-dups are actual
    * lossy re-encodes: doc pair (2k, 2k+1) renders the SAME 9×8
    * pattern, even ids through the real PNG writer and odd ids
    * through the real JPEG writer, so the only way the pair lands
    * within radius 3 is the decoder genuinely recovering the raster
    * from both codecs. Distinct patterns sit ~32 bits apart (chained
    * 4-level draw, [[Multimodal.patternLevels]]), so the oracle is the
    * closed-form plant list — and any false pair, missed plant, or
    * stubbed decode breaks the compare. The `hamming` column is
    * dropped: a lossy codec's exact flip count is encoder-specific,
    * never portable.
    *
    * Scale shape: payloads never shuffle — the hash pass is a
    * zero-exchange partition map emitting 16-byte rows, candidates
    * are an equi-join on (segment, value), and the verify is one
    * codegen `bit_count` per candidate.
    */
  def p77ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    def src(parity: Int) = docs
      .filter(pmod(col("doc_id"), lit(2)) === parity)
      .select(col("doc_id"), floor(col("doc_id") / 2).cast("long"))
      .as[(Long, Long)]
    val corpus = Multimodal.encodePattern(src(0), "png")
      .union(Multimodal.encodePattern(src(1), "jpg"))
    val hashes = Multimodal.dHash(
      corpus.map(e => Multimodal.MediaRow(e.media_id, e.png, "image/*"))).toDF()
    Dedup.hammingPairs(hashes, "media_id", "dhash",
        bits = 64, segments = 4, maxHamming = 3)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Deterministic 32-cluster mixture fixture, derived IN-PLAN from
    * `vec_id` alone: component d = center(cluster, d) + noise(vec, d)
    * with centers ±1000 and noise ±10 from the portable hash —
    * integer-valued floats, so the oracle rebuilds the identical
    * vectors from the same closed form. This is the cluster structure
    * the parquet fixture lacks (its i.i.d. embeddings cap IVF recall
    * at the probed mass — documented on p56/p73).
    */
  private def clusteredEmbeddings(s: SparkSession, dir: String): DataFrame =
    // repartition BELOW the fixture projection: the synthetic vector
    // is ~130 hash60 (md5) calls per row, and the source parquet is
    // one file — without the exchange the whole fixture computes in a
    // single scan task while 31 cores idle
    t(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        ((TF.hash60(concat(lit("cc"),
            pmod(col("vec_id"), lit(32)).cast("string"),
            lit("_"), d.cast("string"))) % 2001 - 1000)
          + (TF.hash60(concat(lit("cn"), col("vec_id").cast("string"),
            lit("_"), d.cast("string"))) % 21 - 10))
          .cast("float")).as("embedding"))

  /** Hierarchically clustered embedding fixture for p122: 8 coarse
    * clusters (centers ±1000) × 4 within-cluster offset PROTOTYPES
    * (±100) + per-vector jitter (±5), all from the portable hash —
    * the two-level structure real embedding spaces have and residual
    * coding exists to exploit: a vector's true neighbors share its
    * (cluster, prototype) pair, invisible to a raw-vector codebook
    * (every same-cell candidate codes to the same entry) but exactly
    * what the residual codebook resolves.
    */
  private def hierEmbeddings(s: SparkSession, dir: String): DataFrame =
    // same single-scan-task guard as [[clusteredEmbeddings]]: 192
    // md5-backed hash60 calls per row must spread across cores
    t(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        ((TF.hash60(concat(lit("hc"),
            pmod(col("vec_id"), lit(8)).cast("string"),
            lit("_"), d.cast("string"))) % 2001 - 1000)
          + (TF.hash60(concat(lit("hp"),
            pmod(floor(col("vec_id") / 8).cast("long"), lit(4))
              .cast("string"),
            lit("_"), d.cast("string"))) % 201 - 100)
          + (TF.hash60(concat(lit("hj"), col("vec_id").cast("string"),
            lit("_"), d.cast("string"))) % 11 - 5))
          .cast("float")).as("embedding"))

  /** IVF recall at a PRODUCTION operating point, on clustered data —
    * the row the i.i.d. corpus cannot demonstrate (p56/p73 document
    * why: uniform embeddings make IVF recall track probed mass, so
    * the tuned row tops out at ~72% @ nprobe 8). Over the 32-cluster
    * fixture ([[clusteredEmbeddings]]) with nlist=32 (one seed member
    * per cluster, `vec_id < 32`) and nprobe=1 and 2, recall@3 reaches
    * 100% — cluster separation (±1000 centers) dominates the ±10
    * noise, so a query's true neighbors share its cell. The scorecard
    * row names the full config; truth is the exact scan over the same
    * fixture, and the oracle replays fixture construction, cell
    * assignment, probe sets, both rankings, and the recall division.
    */
  def p79ClusteredRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = clusteredEmbeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "cand_id")
    def row(nprobe: Int): DataFrame =
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          centroidFilter = col("vec_id") < 32, k = 3, nprobe = nprobe)
        .select("query_id", "cand_id")
        .join(exact, Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(exact.agg(count(lit(1)).as("n_truth")))
        .select(lit(s"ivf_clustered_nlist32_nprobe$nprobe").as("method"),
          col("n_hits"), col("n_truth"),
          floor((col("n_hits") * lit(1e6)) / col("n_truth")).cast("long")
            .as("recall_micro"))
    row(1).unionByName(row(2))
  }

  /** Exact-substring dedup at ARBITRARY boundaries
    * ([[Curation.exactSubstringScrub]], the Lee et al. 2022
    * semantics): every maximal token span whose 8-token windows all
    * occur at least twice corpus-wide is cut — beyond p65's fixed
    * segmentation, which can only remove aligned 10-word segments.
    * The oracle replays gram hashing, the duplicated-window set, the
    * gaps-and-islands span merge, AND the md5 of every scrubbed
    * reconstruction — a pass certifies the exact cut boundaries on
    * every document.
    */
  def p78ExactSubstrings(s: SparkSession, dir: String): DataFrame =
    Curation.exactSubstringScrub(t(s, dir, "documents"), "doc_id", "text",
      L = 8)

  /** Audio near-dup by energy contour
    * ([[Multimodal.audioFingerprint]] + [[Dedup.hammingPairs]]): doc
    * pair (2k, 2k+1) renders the SAME amplitude-contour recording
    * through the real RIFF/WAVE codec, the odd twin at 2× gain —
    * every payload byte differs, but the contour fingerprint is
    * scale-invariant, so the planted pair lands at Hamming 0 while
    * distinct contours sit far outside the radius (the p77 chained
    * draw). Finding exactly the plant list requires genuinely parsing
    * both WAVs and recovering identical contours from differently
    * scaled PCM. Same banded equi-join shape as p77 — 16-byte hash
    * rows shuffle, payloads never do.
    */
  def p80AudioNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    def src(parity: Int) = docs
      .filter(pmod(col("doc_id"), lit(2)) === parity)
      .select(col("doc_id"), floor(col("doc_id") / 2).cast("long"))
      .as[(Long, Long)]
    val corpus = Multimodal.encodeWavPattern(src(0), scale = 1)
      .union(Multimodal.encodeWavPattern(src(1), scale = 2))
    val hashes = Multimodal.audioFingerprint(corpus).toDF()
    Dedup.hammingPairs(hashes, "media_id", "afp",
        bits = 64, segments = 4, maxHamming = 3)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Resize planning over REAL decoded dimensions
    * ([[Multimodal.resizePlanPng]]): the p57 PNGs decoded by the actual
    * codec, scale factors to a 224×224 box from the decoded — not
    * derived — width/height. The oracle recomputes the expected
    * dimensions from the doc attributes, so a pass certifies decode +
    * the fixed-point scale arithmetic together.
    */
  def p59ResizePng(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "documents").select(
        col("doc_id"),
        (lit(1) + pmod(col("doc_id"), lit(16))).cast("int"),
        (lit(1) + pmod(length(col("text")), lit(16))).cast("int"),
        (pmod(col("doc_id"), lit(256)) * 65793).cast("int"))
      .as[(Long, Int, Int, Int)]
    Multimodal.resizePlanPng(Multimodal.encodePng(src),
      targetW = 224, targetH = 224).toDF()
  }

  /** REAL audio decode ([[Multimodal.encodeWav]]/[[Multimodal.decodeWav]]
    * — the JDK's RIFF/WAVE codec, not the stub): per document a 16-bit
    * mono PCM tone with doc-derived rate/length/amplitude is written
    * through `AudioSystem`, and the query output is what the decoder
    * parses back (header fields + peak sample). Same oracle contract
    * as p57: encode∘decode identity on doc-derived properties.
    */
  def p60WavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "documents").select(
        col("doc_id"),
        (lit(8000) + pmod(col("doc_id"), lit(8)) * 1000).cast("int"),
        (lit(100) + pmod(length(col("text")), lit(400))).cast("int"),
        (pmod(col("doc_id"), lit(1000)) * 30).cast("int"))
      .as[(Long, Int, Int, Int)]
    Multimodal.decodeWav(Multimodal.encodeWav(src)).toDF()
  }

  /** Audio feature extraction over REAL decoded PCM
    * ([[Multimodal.audioFeatures]]): doc-derived square waves are
    * written through the actual RIFF/WAVE encoder, decoded back, and
    * peak / energy / zero-crossing counts are computed from the
    * decoded 16-bit samples — exact integer math, so the oracle
    * replays the closed forms (peak = amplitude, energy = n·a²,
    * crossings = (n−1) div period) from the doc attributes. A pass
    * certifies the decode actually ran sample-by-sample.
    */
  def p63AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "documents").select(
        col("doc_id"),
        (lit(8000) + pmod(col("doc_id"), lit(8)) * 1000).cast("int"),
        (lit(100) + pmod(length(col("text")), lit(400))).cast("int"),
        (lit(1) + pmod(col("doc_id"), lit(1000)) * 30).cast("int"),
        (lit(1) + pmod(col("doc_id"), lit(7))).cast("int"))
      .as[(Long, Int, Int, Int, Int)]
    Multimodal.audioFeatures(Multimodal.encodeWavSquare(src)).toDF()
  }

  // ------------------------------------------------------------ events

  /** Gap-based sessionization (30-min timeout) of the event stream. */
  def p13Sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    Sessionize.sessions(e, Seq("user_id"), "ts_us",
        gap = 1800L * 1000 * 1000, tiebreak = Seq("event_id"))
      .select(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"), col("n_events"))
  }

  /** Tumbling 1-hour windowed aggregation per event type — the same
    * plan Structured Streaming runs incrementally (see
    * graft.streaming).
    */
  def p14WindowAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Semi-structured property extraction from the events JSON blob. */
  def p15JsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
        .cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  /** Deterministic hash-based train/validation/test split — the
    * reproducible alternative to randomSplit for training corpora: the
    * assignment depends only on the id, never on partitioning or seed
    * state, so re-runs and engines agree row-for-row.
    */
  def p16HashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = TF.hash60(concat(lit("split"), col("doc_id").cast("string"))) % 100
    t(s, dir, "documents")
      .select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "valid")
          .otherwise("test").as("split"))
  }

  /** TF-IDF top-3 terms per document (inverted-index shape: explode →
    * per-(doc,term) tf → per-term df → score). Scores emitted as
    * floor-micro ints; ties broken by term.
    */
  def p17Tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val n = docs.select(count(lit(1)).as("n_docs"))
    val terms = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score_micro",
        floor(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")) * 1e6)
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("score_micro"))
  }

  /** IVF approximate top-3: every 25th vector serves as a centroid,
    * vectors join their nearest-centroid cell, queries probe only
    * their own cell.
    */
  /** Repetition filters (the Gopher quality-signal family): duplicate
    * trigram fraction (pure per-doc Column math, shuffle-free) and
    * top-word fraction (explode → two partial-aggregated shuffles).
    * The final doc_id join is between two doc-count-sized sides.
    */
  def p20Repetition(s: SparkSession, dir: String): DataFrame = {
    val toksed = t(s, dir, "documents")
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
    val base = toksed.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_words"),
      TF.dupShingleFraction(col("toks"), 3).as("dup_3gram_frac"))
    val topWord = toksed
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_word_frac"))
    base.join(topWord, Seq("doc_id"))
  }

  def p19Ivf(s: SparkSession, dir: String): DataFrame =
    p19IvfOn(t(s, dir, "embeddings"))
  private def p19IvfOn(emb: DataFrame): DataFrame =
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", centroidFilter = col("vec_id") % 25 === 0, k = 3)

  /** IVF centroid training: one Lloyd iteration over the p19 seed
    * centroids — fixed-point per-dimension means, exact in any engine.
    */
  def p21Kmeans(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansUpdate(t(s, dir, "embeddings"), "vec_id", "embedding",
      centroidFilter = col("vec_id") % 25 === 0)

  /** Full k-means training loop: three Lloyd iterations from the p19
    * seed centroids, driver-held centroid state between steps. Served
    * from [[graft.pipeline.TrainedIndexStore]] — the session trains
    * this quantizer once and every consumer (this card, the streaming
    * assigner, any scorecard row) reuses the frozen means.
    */
  val kmeansIters = 3
  def p22KmeansTrain(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TrainedIndexStore.kmeansMeans(t(s, dir, "embeddings"),
      "vec_id", "embedding", centroidFilter = col("vec_id") % 25 === 0,
      iters = kmeansIters)

  /** Shuffle-shard export assignment across 8 shards. */
  def p31ShardExport(s: SparkSession, dir: String): DataFrame =
    Curation.shardAssignments(t(s, dir, "documents"), "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))

  /** Concat-and-chunk packing into 2048-token chunks per source. */
  def p32SeqPack(s: SparkSession, dir: String): DataFrame =
    Curation.packAssignments(t(s, dir, "documents"), "source", "doc_id",
        "text", chunkToks = 2048L)
      .select(col("doc_id"), col("source"), col("n_toks"),
        col("chunk_idx"), col("chunk_off"))

  /** Random-projection reduction 64 → 16 dims, exploded to
    * per-component fixed-point rows for the oracle compare.
    */
  def p36RandomProjection(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(Similarity.randomProjection(col("embedding"), 64, 16)))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        col("col").as("proj_fixed"))

  /** Rare-token ratio with a corpus-relative df threshold (|D| div 5 —
    * the same fraction at every SF, resolved INSIDE the plan from a
    * single-row broadcast, so the query is one job with no driver-side
    * count pre-pass; the oracle computes the identical threshold as a
    * subquery).
    */
  def p33RareTokens(s: SparkSession, dir: String): DataFrame =
    Curation.rareTokenRatioRel(t(s, dir, "documents"), "doc_id", "text",
        dfDiv = 5)
      .select(col("doc").as("doc_id"), col("n_toks"), col("n_rare"),
        col("rare_micro"))

  /** Winnowing fingerprints over word 3-shingles, window 4. */
  def p34Winnow(s: SparkSession, dir: String): DataFrame =
    Curation.winnow(t(s, dir, "documents"), "doc_id", "text", k = 3, w = 4)
      .select(col("doc").as("doc_id"), col("fp"))

  /** Sketch-join near-dup pairs: >= 3 shared winnow fingerprints —
    * finds the planted near-dups from ~|doc|/w sketch rows.
    */
  def p35WinnowPairs(s: SparkSession, dir: String): DataFrame =
    Curation.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 3, w = 4, minShared = 3)

  /** Near-dup CLUSTERS: the p04 pair set closed under transitivity by
    * alternating large-star/small-star connected components — every
    * doc in a qualifying pair gets its cluster representative (minimum
    * reachable id) and a keep flag, the actual dedup decision a
    * curation pipeline acts on. The oracle recomputes the closure with
    * a recursive CTE over the exhaustive pair scan, so the check
    * certifies BOTH pair recall and the clustering itself.
    */
  def p37DupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    DedupStore.dedupDecisions(docs, "doc_id", "text",
        k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
      .select(col("node").as("doc_id"), col("component").as("cluster_id"),
        col("keep"))
  }

  /** Identifier/PII scrubbing over rendered event log lines: the digit
    * rule redacts user ids and fixed-point amounts to `<ID>`; the
    * email and phone rules run first in the cascade (structurally
    * exercised — the synthetic corpus has no hits; CurationSpec covers
    * them on literal rows). Pure codegen projection, zero exchanges.
    */
  def p38PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val lines = t(s, dir, "events").select(
      col("event_id"),
      concat(col("event_type"), lit(" user="),
        col("user_id").cast("string"), lit(" amount="),
        floor(col("value") * 100).cast("string")).as("line"))
    Curation.scrubText(lines, "line")
      .select(col("event_id"), col("clean"),
        col("n_email"), col("n_phone"), col("n_id"))
  }

  /** Luhn-validated card scrub (p95): synthesize one 16-digit
    * payment-shaped number per event (deterministic from the ids, so
    * ~10% pass the checksum by construction) and scrub ONLY the
    * Luhn-valid ones — amounts and ids survive. The oracle replays
    * candidate extraction, the checksum, and the literal-replace
    * fold, certifying the scrubbed text by md5.
    */
  def p95CardScrub(s: SparkSession, dir: String): DataFrame = {
    val lines = t(s, dir, "events").select(
      col("event_id"),
      concat(lit("pay "),
        lpad(((col("user_id") % 100000L) * 2654435761L +
          col("event_id") % 1000000L).cast("string"), 16, "0"),
        lit(" amount "), floor(col("value") * 100).cast("string"),
        lit(" ref "), col("event_type")).as("line"))
    Curation.cardScrub(lines, "event_id", "line")
  }

  /** C4-style global segment dedup over 10-word windows: a segment
    * survives only in the minimum-id document containing it; per-doc
    * kept/dropped counts.
    */
  def p39LineDedup(s: SparkSession, dir: String): DataFrame =
    Curation.segmentDedup(t(s, dir, "documents"), "doc_id", "text",
        segWords = 10)
      .select(col("doc").as("doc_id"), col("n_segs"), col("n_kept"),
        col("n_dropped"))

  /** C4 segment REMOVAL with document reconstruction
    * ([[Curation.segmentScrub]] — p39 counts what the rule would drop;
    * this rebuilds the corpus with the duplicated occurrences actually
    * gone, first occurrence in (doc, position) order winning). The
    * oracle replays the global window and re-derives the md5 of every
    * rebuilt document, so the reconstruction itself is certified.
    */
  def p65SegmentScrub(s: SparkSession, dir: String): DataFrame =
    Curation.segmentScrub(t(s, dir, "documents"), "doc_id", "text",
        segWords = 10)
      .select(col("doc").as("doc_id"), col("n_segs"), col("n_kept"),
        col("clean_fp"))

  /** Incremental component merge ([[ConnectedComponents.merge]]): a
    * near-dup pair set split into two deterministic batches — the
    * first clustered from scratch, the second folded into the stored
    * (node, component) assignment. The oracle replays the closure over
    * the FULL pair history with a recursive CTE, so a pass certifies
    * that star-edge folding loses no reachability (the property that
    * makes ingest-time merge equal a full re-cluster at corpus scale,
    * folding |assignment| + |new pairs| rows instead of the history).
    * Merge semantics are edge-agnostic, so the edge source is the
    * cheapest oracle-replayable detector (the p35 winnow sketch join —
    * p37 already closes the ngram pair set); the cache bracket
    * materializes the pair set once for both batch filters.
    */
  def p46MergeClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Curation.winnowPairs(t(s, dir, "documents"), "doc_id",
        "text", k = 3, w = 4, minShared = 3)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    graft.core.Caching.withCached(pairs) {
      val batch1 = pairs.filter((col("u") + col("v")) % 2 === 0)
      val batch2 = pairs.filter((col("u") + col("v")) % 2 =!= 0)
      val assignment = graft.operators.ConnectedComponents.components(batch1)
      graft.operators.ConnectedComponents.merge(assignment, batch2)
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    }
  }

  /** Bloom-prefiltered idempotent ingest ([[Ingest.bloomFresh]]): a
    * deterministic batch built from the corpus itself — one slice
    * re-submitted verbatim (must all be rejected) and one slice with a
    * token appended (must all land) — admitted through the
    * sketch-then-verify path. The oracle is the plain content-hash
    * anti-join, so a pass certifies the bloom path is bit-identical to
    * exact ingest: the sketch only prefilters, never decides.
    */
  def p47BloomIngest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val dup = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val fresh = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000L)
      .withColumn("text", concat(col("text"), lit(" zzfresh")))
    Ingest.bloomFresh(docs, dup.unionByName(fresh), "text",
        expectedItems = 1000000L, fpp = 0.01)
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** Product-quantization codes over the embedding corpus
    * ([[Similarity.pqCodes]]): 64 dims cut into 4 subspaces, an 8-entry
    * codebook per subspace seeded from the first 8 vectors. The oracle
    * replays the per-subspace squared-L2 argmin with the same
    * index-order sums, so a pass certifies the zero-shuffle codegen
    * assignment — the compression step that lets ANN scans move m-byte
    * codes instead of raw vectors at corpus scale.
    */
  def p48PqCodes(s: SparkSession, dir: String): DataFrame =
    Similarity.pqCodes(t(s, dir, "embeddings"), "vec_id", "embedding",
        m = 4, dim = 64, centroidFilter = col("vec_id") < 8)
      .withColumn("subspace", col("subspace").cast("long"))

  /** Trained-PQ codes, end to end ([[Similarity.pqTrainedCodes]]): two
    * per-subspace Lloyd iterations refine the p48 seed codebook —
    * ADC error, hence PQ recall, is decided by exactly this
    * refinement — and the final zero-exchange argmin assigns codes
    * from the TRAINED per-subspace entries. The oracle replays the
    * subspace iterations element-for-element (assignment, fixed-point
    * means, float rebuild) the way p52's does for the IVF quantizer.
    */
  def p55PqTrained(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTrainedCodes(t(s, dir, "embeddings"), "vec_id",
        "embedding", m = 4, dim = 64, centroidFilter = col("vec_id") < 8,
        iters = 2)
      .withColumn("subspace", col("subspace").cast("long"))

  /** Trained-ADC top-k ([[Similarity.pqTopKTrained]]): the full PQ
    * production chain — per-subspace Lloyd training, trained-code
    * assignment, ADC scan against the TRAINED entries — as one query,
    * p52's train→index→query composition for the ADC family. The
    * oracle replays training AND the four-term asymmetric distance.
    */
  def p58PqTrainedTopK(s: SparkSession, dir: String): DataFrame =
    p58PqTrainedTopKOn(t(s, dir, "embeddings"))
  private def p58PqTrainedTopKOn(emb: DataFrame): DataFrame =
    Similarity.pqTopKTrained(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", m = 4, dim = 64,
      centroidFilter = col("vec_id") < 8, iters = 2, k = 5)

  /** ADC top-k over the p48 codes ([[Similarity.pqTopK]]): the p05
    * query set scanned against code-compressed corpus rows, ranked by
    * asymmetric distance. The oracle replays code assignment AND the
    * ordered four-term distance sum, so a pass certifies the whole
    * compressed scan — codes, codebook lookup, and ranking — not just
    * the assignment step.
    */
  def p49PqTopK(s: SparkSession, dir: String): DataFrame =
    p49PqTopKOn(t(s, dir, "embeddings"))
  private def p49PqTopKOn(emb: DataFrame): DataFrame =
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", m = 4, dim = 64, centroidFilter = col("vec_id") < 8,
      k = 5)

  /** Overlapping token-window chunking ([[Curation.chunks]]): 32-token
    * windows every 24 tokens (25% overlap) — the RAG / context-window
    * prep step. Zero-exchange per-row explode; the oracle replays the
    * same window arithmetic over the same token lists.
    */
  def p53Chunks(s: SparkSession, dir: String): DataFrame =
    Curation.chunks(t(s, dir, "documents"), "doc_id", "text",
      window = 32, stride = 24)

  /** Corpus snapshot diff ([[Ingest.snapshotDiff]]): two deterministic
    * snapshots carved from the corpus — docs %7==0 absent from the old,
    * docs %5==0 absent from the new, docs %11==0 edited in the new —
    * classified added/removed/modified/unchanged by id + content
    * fingerprint. The exchange carries 16-byte digests, never text.
    */
  def p54SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
    val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")))
    Ingest.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
  }

  /** Semantic dedup over the embedding corpus: IVF cells from the p19
    * seed centroids, within-cell cosine pairs at the p07 threshold,
    * transitive closure, one keeper per semantic cluster. The oracle
    * replays the whole chain (assignment, pair scan, recursive
    * closure), so the cell-restricted semantics are certified exactly.
    */
  def p40SemanticDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
      centroidFilter = col("vec_id") % 25 === 0, threshold = 0.4)

  /** Per-source token-length quantiles (p25/p50/p75) by the exact
    * nearest-rank rule — the dataset-card distribution stat next to
    * p28's means. Nearest-rank keeps the result integer-exact and
    * portable (no interpolation, no engine-specific percentile
    * estimator): the value at sorted rank ceil(q·n/100) is unique even
    * under row_number tie-splitting, because tied rows share the value.
    */
  def p43LengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"), size(TF.tokens(col("text"))).cast("long").as("n"))
    val part = Window.partitionBy("source")
    val ranked = d
      .withColumn("rn", row_number().over(part.orderBy(col("n"))))
      .withColumn("cnt", count(lit(1)).over(part))
    val qs = s.range(1).select(explode(array(lit(25L), lit(50L), lit(75L))).as("q"))
    ranked.crossJoin(broadcast(qs))
      .filter(col("rn") ===
        floor((col("cnt") * col("q") + lit(99)) / lit(100.0)).cast("long"))
      .select(col("source"), col("q"), col("n").as("value"))
  }

  /** Cross-source duplicate-overlap matrix: for each ordered source
    * pair (A, B), how many of A's documents have a near-dup mirror in
    * B (≥ 3 shared winnow fingerprints, the p35 sketch identity) — the
    * dataset-card view that tells a curation pipeline which sources
    * mirror each other and which direction to dedup. The pair basis is
    * the sketch equi-join, so the matrix costs the p35 join plus two
    * broadcast source lookups.
    */
  def p45SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Curation.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 3)
    val src = docs.select(col("doc_id"), col("source"))
    val sym = pairs.select(col("doc_a").as("d"), col("doc_b").as("o"))
      .unionAll(pairs.select(col("doc_b").as("d"), col("doc_a").as("o")))
    // src is one row per DOCUMENT — corpus-sized, so no broadcast hint:
    // the pair side is far smaller than the corpus, and AQE picks the
    // right strategy per actual sizes at any SF
    sym
      .join(src.toDF("d", "src_a"), "d")
      .join(src.toDF("o", "src_b"), "o")
      .filter(col("src_a") =!= col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(countDistinct(col("d")).as("n_mirrored"))
  }

  /** Static mixture re-weighting: the per-source sampling weight that
    * equalizes token share across sources (weight = target/actual,
    * fixed-point) — the data-mixing recipe step that turns p28's
    * dataset-card counts into sampling probabilities. Sources above
    * their equal share get weight < 1 (downsample), below it > 1
    * (upsample/repeat).
    */
  def p44MixWeights(s: SparkSession, dir: String): DataFrame = {
    val perSource = t(s, dir, "documents")
      .select(col("source"), size(TF.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("toks"))
    val totals = perSource.agg(
      sum(col("toks")).as("total"), count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("toks"),
        floor(col("total") * lit(1e6) / (col("n_sources") * col("toks")))
          .cast("long").as("weight_micro"))
  }

  /** Temperature-weighted mixture sampling at α = 0.5 (the
    * square-root-scaled source probabilities of T5 / multilingual
    * pretraining: p_s = n_s^α / Σ n_t^α — α = 1 is proportional, α→0
    * approaches p44's equal share; 0.5 is the standard middle).
    * sqrt is correctly rounded in IEEE-754 (unlike pow, which is why
    * the declared query pins α at the sqrt case), and the denominator
    * is an index-order fold over the VALUE-SORTED per-source terms —
    * a deterministic double in any engine, where a bare SUM(double)
    * is summation-order-dependent in both Spark and DuckDB.
    */
  def p50TempMix(s: SparkSession, dir: String): DataFrame = {
    val perSource = t(s, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val denom = perSource.agg(
      aggregate(sort_array(collect_list(sqrt(col("n_docs")))),
        lit(0.0), (acc, x) => acc + x).as("denom"))
    perSource.crossJoin(broadcast(denom))
      .select(col("source"), col("n_docs"),
        floor(sqrt(col("n_docs")) / col("denom") * lit(1e6))
          .cast("long").as("p_micro"))
  }

  /** Vocabulary building (the tokenizer-training prep step): global
    * token counts, top 50 by (count desc, token asc). The top-k is a
    * sort-limit, which Spark plans as TakeOrderedAndProject — per-
    * partition heaps then one driver merge of 50-row heads, never a
    * global sort — so the pattern holds at any vocabulary size; the
    * dense rank is applied to the 50 survivors only.
    */
  def p41Vocab(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(50)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("tok").asc))
        .cast("long"))
  }

  /** Out-of-vocabulary rate per document against a top-10 vocabulary
    * (smaller than p41's so the rate is non-trivial on the 31-token
    * synthetic corpus): the tokenizer-coverage check a corpus runs
    * before committing to a vocab. The vocab broadcasts; the token
    * stream never shuffles until the per-doc rollup.
    */
  def p42OovRate(s: SparkSession, dir: String): DataFrame = {
    val vocab = broadcast(t(s, dir, "documents")
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(10)
      .select(col("tok")))
    t(s, dir, "documents")
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .join(vocab.withColumn("in_vocab", lit(1L)), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_toks"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        floor(sum(when(col("in_vocab").isNull, 1L).otherwise(0L)) * lit(1e6) /
          count(lit(1))).cast("long").as("oov_micro"))
  }

  /** Frame sampling over the MIXED corpus: real PNG payloads decode
    * to their single still frame, fingerprinted from the DECODED
    * properties (w×h:px00); text payloads expand through the stub
    * (every 2nd fake frame, at most 4) — the row-expanding
    * batched-decode shape either way.
    */
  def p29FrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.mixedMediaFromDocuments(s, t(s, dir, "documents")),
      every = 2, maxFrames = 4).toDF()

  /** Resize planning to a 224x224 box over the MIXED corpus: real
    * `ImageIO` header dimensions for the PNG payloads, stub dims for
    * the opaque ones.
    */
  def p30ResizePlan(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(
      Multimodal.mixedMediaFromDocuments(s, t(s, dir, "documents")),
      targetW = 224, targetH = 224).toDF()

  /** Directional containment pairs at 0.5 over word 4-shingles, skew
    * cap engaged; the oracle is the exhaustive scan, certifying the
    * cap lost no qualifying pair at this SF. k=4 matches p04 — 3-gram
    * postings are an order of magnitude denser and blow up the
    * candidate join at larger SFs for no recall gain here.
    */
  def p27Containment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 4, threshold = 0.5, maxShingleFreqFrac = Some(0.1))

  /** Per-source dataset-card stats: doc/token counts, fixed-point mean
    * tokens, language spread.
    */
  def p28CorpusStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), col("lang"),
        size(TF.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("sum_toks"),
        floor(sum(col("n_toks")) * lit(1e6) / count(lit(1))).cast("long")
          .as("mean_toks_micro"),
        countDistinct(col("lang")).as("n_langs"))

  /** Multi-probe IVF: the p19 layout with each query probing its two
    * nearest cells — recall widens, the corpus index is untouched.
    */
  def p26IvfNprobe(s: SparkSession, dir: String): DataFrame =
    p26IvfNprobeOn(t(s, dir, "embeddings"))
  private def p26IvfNprobeOn(emb: DataFrame): DataFrame =
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", centroidFilter = col("vec_id") % 25 === 0, k = 3,
      nprobe = 2)

  /** The TUNED IVF operating point for the recall scorecard: the same
    * index as p26 (one cell per 25 vectors), probing 8 cells instead
    * of 2. Probe count is THE recall/cost knob of an IVF index —
    * scan work grows linearly with probes while the index itself is
    * unchanged — so the scorecard (p56) carries this row next to the
    * fast configurations to document an achievable high-recall
    * operating point, not just the cheap ones.
    */
  def p73IvfTuned(s: SparkSession, dir: String): DataFrame =
    p73IvfTunedOn(t(s, dir, "embeddings"))
  private def p73IvfTunedOn(emb: DataFrame): DataFrame =
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", centroidFilter = col("vec_id") % 25 === 0, k = 3,
      nprobe = 8)

  /** IVF-PQ compressed probe search ([[Similarity.ivfPqTopK]] — the
    * FAISS-IVFPQ composition, the index shape of production
    * billion-vector ANN): coarse cells from the p26 quantizer (one
    * per 25 vectors), PQ codes from the p49 codebook (m=4 over dim
    * 64), queries probe 4 of 20 cells, ADC top-5 inside probed cells
    * only. The oracle replays coarse assignment, code assignment,
    * probe set, and ADC ranking end to end.
    */
  def p74IvfPq(s: SparkSession, dir: String): DataFrame =
    p74IvfPqOn(t(s, dir, "embeddings"))
  private def p74IvfPqOn(emb: DataFrame): DataFrame =
    Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", coarseFilter = col("vec_id") % 25 === 0,
      pqFilter = col("vec_id") < 8, m = 4, dim = 64, k = 5, nprobe = 4)

  /** IVF-PQ with exact refine (p83 — FAISS's IVFPQ+refine): the p74
    * compressed ADC pass widened to a top-20 shortlist, then ONLY
    * those Q·20 candidates re-scored against their full vectors by
    * exact cosine for the final top-5. `adc_rank` rides next to the
    * exact rank, so the reordering the refine stage exists to fix is
    * visible in the output. The oracle replays ADC shortlist AND
    * exact re-rank end to end.
    */
  def p83IvfPqRefine(s: SparkSession, dir: String): DataFrame =
    p83IvfPqRefineOn(t(s, dir, "embeddings"))
  private def p83IvfPqRefineOn(emb: DataFrame): DataFrame =
    Similarity.ivfPqRefineTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", coarseFilter = col("vec_id") % 25 === 0,
      pqFilter = col("vec_id") < 8, m = 4, dim = 64, k = 5, nprobe = 4,
      rerank = 20)

  /** SentencePiece-style unigram tokenizer (p87): seed a substring
    * vocabulary (all single chars + top multi-char substrings), then
    * two hard-EM rounds — Viterbi segmentation of every distinct word
    * as a zero-exchange Catalyst HOF projection (the whole DP runs in
    * expressions, no UDF), piece re-counting, add-one re-costing. The
    * oracle replays the ENTIRE train: seed counts, vocabulary cut,
    * micro-nat cost tables, both Viterbi passes (recursive-CTE DP +
    * smallest-split backtrace), and the EM reweighting between them.
    */
  def p87UnigramTokenizer(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Unigram.train(t(s, dir, "documents"), "text",
        vocabSize = 60, maxLen = 4, iters = 2)
      .select(col("word"), col("freq"),
        size(col("pieces")).cast("long").as("n_pieces"),
        array_join(col("pieces"), " ").as("segmentation"),
        col("cost_micro"))

  /** Unigram-tokenizer corpus encode (p88 — the unigram sibling of
    * p75's BPE encode): the trained segmentation table joins back to
    * every corpus word position as a broadcast dictionary, so the
    * corpus is touched once and the tokenization itself adds zero
    * exchanges. The oracle replays the full train AND the positional
    * join.
    */
  def p88UnigramEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val seg = graft.pipeline.Unigram.train(docs, "text", vocabSize = 60,
      maxLen = 4, iters = 2)
    docs.select(col("doc_id"),
        posexplode(graft.pipeline.TextFunctions.tokens(col("text")))
          .as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(broadcast(seg.select(col("word"), col("pieces"))), Seq("word"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        size(col("pieces")).cast("long").as("n_tokens"),
        array_join(col("pieces"), " ").as("tokens"))
  }

  /** Shard export manifest (p86): per shard, doc/token counts and a
    * content checksum covering membership AND order — the record a
    * training job validates before reading a shard. The checksum is a
    * commutative sum of bounded per-doc `hash60(fp:pos)` terms, so it
    * verifies ordering without any engine materializing a shard's
    * fingerprint list (an ordered string-agg would collect billions
    * of rows per shard at corpus scale). The oracle recomputes shard
    * assignment, positions, fingerprints, and the modular sum.
    */
  def p86ShardManifest(s: SparkSession, dir: String): DataFrame =
    Curation.shardManifest(t(s, dir, "documents"), "doc_id", "text",
      nShards = 8)

  /** IVF index maintenance (p85): per-cell occupancy with a
    * deterministic seed-split proposal for every cell more than 30%
    * over mean occupancy (integer cross-multiplied — no rounded
    * ratios). The re-balance report a production ANN index runs as
    * vectors accumulate; the oracle replays assignment, occupancy,
    * the flag arithmetic, and the two sub-cell counts of each
    * proposed split.
    */
  def p85IvfOccupancy(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfOccupancy(t(s, dir, "embeddings"), "vec_id",
      "embedding", centroidFilter = col("vec_id") % 25 === 0,
      factorPct = 130L)

  /** IVF split execution (p96): act on p85's occupancy proposals —
    * every cell flagged at the 130% factor is replaced by the two
    * fixed-point mean centroids of its deterministic seed split. The
    * oracle replays assignment, flagging, the sub-split, and the
    * exact mean arithmetic, so a pass certifies the executed split
    * equals the audited proposal.
    */
  def p96IvfSplit(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfSplitExecute(t(s, dir, "embeddings"), "vec_id",
      "embedding", centroidFilter = col("vec_id") % 25 === 0,
      factorPct = 130L)

  /** Funnel time-to-convert quantiles (p103): exact nearest-rank
    * p25/p50/p75 of each stage transition's latency over converted
    * users, sharing p101's greedy chain
    * ([[graft.operators.Sessionize.funnelTiming]]).
    */
  def p103FunnelTiming(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.funnelTiming(Tables.events(s, dir),
      Seq("signup", "view", "click", "purchase"))

  /** Weekly retention cohorts (p102): users cohorted by first-event
    * epoch week, exact integer retention at each week offset
    * ([[graft.operators.Sessionize.retentionCohorts]]). The oracle
    * replays the bucketing, cohort min, and rate arithmetic.
    */
  def p102Retention(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.retentionCohorts(Tables.events(s, dir))

  /** Event conversion funnel (p101): signup → view → click → purchase
    * in strict event-time order with earliest-completion semantics
    * ([[graft.operators.Sessionize.funnel]]); one row per stage with
    * the reached-user count and exact integer conversion rates. The
    * oracle replays the stage-wise min-after-previous chain.
    */
  def p101Funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.funnel(Tables.events(s, dir),
      Seq("signup", "view", "click", "purchase"))

  /** Memorization risk per document (p105): duplicated-8-gram-window
    * fraction corpus-wide ([[Curation.memorizationRisk]]) — the
    * doc-level report over p78's gram machinery. The oracle replays
    * gram hashing, the corpus-wide occurrence counts, and the exact
    * fraction.
    */
  def p105MemorizationRisk(s: SparkSession, dir: String): DataFrame =
    Curation.memorizationRisk(t(s, dir, "documents"), "doc_id", "text",
      L = 8)

  /** Cross-corpus novelty (p111): every 10th document plays an
    * incoming batch scored against the REST of the corpus as the
    * reference ([[Curation.noveltyScore]]) — fraction of 8-token
    * windows not already present, the window-level admission signal.
    * The oracle replays gram hashing, the reference distinct set, and
    * the fraction.
    */
  def p111Novelty(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Curation.noveltyScore(docs.filter(col("doc_id") % 10 === 7),
      docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", L = 8)
  }

  /** BM25 top-10 retrieval (p112): every 40th document's first four
    * tokens play a query batch against the full corpus through the
    * distributed inverted index ([[Retrieval.bm25TopK]]) — the
    * sparse-lexical sibling of the p05 dense top-k. The oracle refits
    * the index (postings, df over query terms, corpus stats) and
    * replays idf, length normalization, the per-term micro floors,
    * and the ranking window.
    */
  def p112Bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "query_id", "qtext", k = 10)
  }

  /** Classifier ROC-AUC (p113): exact Mann-Whitney AUC of the p81
    * Naive-Bayes scorer's margin against its own funnel training
    * labels ([[Curation.rocAuc]]) — the one-row separation
    * certificate a curation run reads before the classifier's
    * threshold gates a corpus. The oracle refits the classifier and
    * replays the U-statistic accumulation over score groups.
    */
  def p113Auc(s: SparkSession, dir: String): DataFrame =
    Curation.rocAuc(
      Curation.nbClassifier(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 500, profile = Curation.GateProfile.wordSalad),
      "llr_micro", "cls")

  /** CCNet perplexity partition (p114): per-language head/middle/tail
    * terciles by self-trained Kneser-Ney perplexity
    * ([[Curation.perplexityBuckets]]) — the Wenzek et al. 2020 bucket
    * assignment as a dataset-card rollup. The oracle replays the KN
    * scoring and the rank-based ntile.
    */
  def p114PplBuckets(s: SparkSession, dir: String): DataFrame =
    Curation.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text",
      "lang", vocabSize = 500)

  /** Per-domain caps (p115): RefinedWeb-style source balancing — keep
    * the top 15 documents per source by (p09 quality DESC, id),
    * reported as the per-source kept/dropped doc and token mass
    * ([[Curation.domainCap]]). The oracle replays the score, the
    * per-source ranking window, and the rollup.
    */
  def p115DomainCap(s: SparkSession, dir: String): DataFrame =
    Curation.domainCap(scoredDocs(t(s, dir, "documents")), "doc_id",
      "text", "source", cap = 15, col("score_micro"))

  /** PMI collocations (p116): top-100 adjacent-pair collocations by
    * pointwise mutual information at pair count ≥ 5
    * ([[Curation.pmiCollocations]]) — corpus phrase mining over the
    * p82 bigram machinery. The oracle replays the count tables and
    * the fixed-order PMI floor.
    */
  def p116Pmi(s: SparkSession, dir: String): DataFrame =
    Curation.pmiCollocations(t(s, dir, "documents"), "doc_id", "text",
      minCount = 5L, topK = 100)

  /** Logistic-regression quality classifier (p117): twelve rounds of
    * exact-integer full-batch gradient descent over 64 hashed binary
    * unigram features, funnel weak labels, unit learning rate
    * ([[Curation.logisticRegression]]) — the gradient-trained sibling
    * of p81, reaching ~0.89 label agreement vs the 0.64 base rate at
    * both sf0.001 and sf0.01 (hyperparameters picked by replaying the
    * exact integer trajectory offline). The oracle replays the whole
    * trajectory (residuals, gradients, floor-division weight updates)
    * iteration by iteration.
    */
  def p117LrClassifier(s: SparkSession, dir: String): DataFrame =
    Curation.logisticRegression(t(s, dir, "documents"), "doc_id",
      "text", buckets = 64, iters = 12, lrDen = 1,
      profile = Curation.GateProfile.wordSalad)

  /** WordPiece merge training (p118): the BERT tokenizer's
    * likelihood-ratio merge rule run to pair exhaustion over the same
    * machinery as the p71 BPE trainer ([[Bpe.trainWordPiece]]) —
    * completing the tokenizer-family set (BPE p71/p75, unigram
    * p87/p88, WordPiece here). The oracle replays the whole
    * trajectory with the normalized winner rule, so a pass certifies
    * every merge decision AND its exact-integer score.
    */
  def p118Wordpiece(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TokenizerStore
      .wordPiece(t(s, dir, "documents"), dir, "text", nMerges = 100)._1

  /** Hybrid retrieval (p119): the p112 BM25 top-10 fused with the
    * dense cosine top-10 over the SAME query ids (doc_id ↔ vec_id) by
    * reciprocal-rank fusion at k₀ = 60 ([[Retrieval.rrfFuse]]) — the
    * modern sparse+dense serving stack as one plan. The oracle
    * replays both retrievers AND the exact-integer fusion.
    */
  def p119HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val sparse = p112Bm25(s, dir)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity.topK(emb,
        Retrieval.plantedSample(emb, "vec_id"), "vec_id", "embedding",
        k = 10)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
    Retrieval.rrfFuse(sparse, dense, k0 = 60, topK = 10)
  }

  /** Pseudo-relevance-feedback retrieval (p120): the p112 queries run
    * twice through [[Retrieval.bm25Prf]] — pass 1's top-3 documents
    * donate their 5 highest-tf non-query terms, pass 2 retrieves with
    * the expanded queries. The oracle replays both passes and the
    * exact-integer expansion choice.
    */
  def p120Prf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    Retrieval.bm25Prf(docs, "doc_id", "text", queries, "query_id",
      "qtext", fbDocs = 3, fbTerms = 5, k = 10)
  }

  /** Residual IVF-PQ recall (p122): FAISS's actual IVFPQ encoding —
    * codes quantize the residual v − c(v), ADC compares query
    * residuals — measured against the raw-vector-coded [[p74IvfPq]]
    * composition on the CLUSTERED fixture, where the difference is
    * visible: a raw codebook wastes its entries re-describing cluster
    * centers, the residual codebook resolves within-cluster
    * neighbors ([[Similarity.ivfResidualPqTopK]]). Same config both
    * rows: nlist=8 coarse centroids (vec_id<8), codebook rows
    * (0, 8, 16, 24), m=4, k=10, nprobe=1. The oracle replays the
    * fixture, BOTH
    * pipelines (cells, residuals, codes, probes, ADC), the exact
    * truth, and the recall divisions.
    */
  def p122ResidualPq(s: SparkSession, dir: String): DataFrame = {
    // the synthetic fixture costs ~190 md5 calls per row and is
    // scanned ~4x by EACH of the four pipelines below (corpus side,
    // probe side, centroid collect, codebook collect) — materialize
    // it once for the duration of the card (measured 15s -> ~4s at
    // sf0.1). Bench fingerprints the lazy twin (p122ResidualPqPlan).
    val emb0 = hierEmbeddings(s, dir)
    graft.core.Caching.withCached(emb0)(p122ResidualPqPlan(s, emb0))
  }

  /** Lazy plan of [[p122ResidualPq]] over a prepared fixture frame. */
  private[graft] def p122ResidualPqPlan(s: SparkSession,
      emb: DataFrame): DataFrame = {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "cand_id")
    // codebook rows: cluster 0's four prototype representatives
    // (0, 8, 16, 24) — residualized they span the prototype set
    val pqRows = col("vec_id") < 32 && col("vec_id") % 8 === 0
    def row(method: String, ann: DataFrame): DataFrame =
      ann.select("query_id", "cand_id")
        .join(exact, Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(exact.agg(count(lit(1)).as("n_truth")))
        .select(lit(method).as("method"), col("n_hits"), col("n_truth"),
          floor((col("n_hits") * lit(1e6)) / col("n_truth")).cast("long")
            .as("recall_micro"))
    row("ivfpq_raw_hier",
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        coarseFilter = col("vec_id") < 8, pqFilter = pqRows,
        m = 4, dim = 64, k = 10, nprobe = 1))
      .unionByName(row("ivfpq_residual_hier",
        Similarity.ivfResidualPqTopK(emb, queries, "vec_id", "embedding",
          coarseFilter = col("vec_id") < 8, pqFilter = pqRows,
          m = 4, dim = 64, k = 10, nprobe = 1)))
      .unionByName(row("ivfpq_residual_refine_hier",
        Similarity.ivfResidualPqRefineTopK(emb, queries, "vec_id",
          "embedding", coarseFilter = col("vec_id") < 8,
          pqFilter = pqRows, m = 4, dim = 64, k = 10, nprobe = 1,
          rerank = 30)))
  }

  /** Entropy quality signals (p121): per-document character- and
    * token-level Shannon entropy in micro-floored integer nats
    * ([[Curation.entropyStats]]) — the gibberish/boilerplate band
    * filter. The oracle replays both distributions and the per-term
    * floors.
    */
  def p121Entropy(s: SparkSession, dir: String): DataFrame =
    Curation.entropyStats(t(s, dir, "documents"), "doc_id", "text")

  /** Count-min calibration (p127): a 4×64 count-min sketch over the
    * token stream, audited against exact counts for the top-30 tokens
    * ([[Curation.countMinCalibration]]) — fixed-memory heavy-hitter
    * counting with its collision overshoot made visible (est ≥ exact
    * is a hard invariant both sides check). The oracle rebuilds the
    * sketch from the same seeded hashes and replays the min-probe.
    */
  def p127CountMin(s: SparkSession, dir: String): DataFrame =
    Curation.countMinCalibration(t(s, dir, "documents"), "doc_id",
      "text", d = 4, w = 64, topK = 30)

  /** Query-likelihood retrieval (p129): the p112 queries ranked by
    * Dirichlet-smoothed language-model likelihood (μ=100, matched to
    * the ~60-token documents) — the LM member of the classic ranking
    * pair beside BM25 ([[Retrieval.qlTopK]]). The oracle refits the
    * collection statistics and replays the three floored score
    * components per candidate.
    */
  def p129Ql(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    Retrieval.qlTopK(docs, "doc_id", "text", queries, "query_id",
      "qtext", k = 10, mu = 100.0)
  }

  /** Retrieval-quality scorecard (p130): nDCG@10 / MRR / hit count of
    * all four rankers — BM25 (p112), query-likelihood (p129), PRF
    * (p120), RRF fusion (p119) — against the planted-prefix relevance
    * set ([[Retrieval.rankingScorecard]]): each query IS the first 4
    * tokens of its source document, so the known-relevant answer for
    * query q is document q itself. One row per method; a ranking
    * regression in any of the four pipelines moves its row. The
    * oracle replays all four rankers and the exact integer metric
    * arithmetic (nDCG discounts are driver-computed literals shared
    * with the Spark plan).
    */
  /** All five production rankings over the standard prefix-query
    * batch, built with ONE index and ONE candidate-hit
    * materialization (naively composing the five standalone queries
    * rebuilds the same index four times and the bm25 ranking twice —
    * that made p130 the slowest bench query before the sharing).
    * Only bm25f (weighted index) and prf pass 2 (expanded terms) need
    * further corpus passes; prf pass 1 at fbDocs=3 is exactly a
    * rank-filter of the shared bm25 top-10. Values are IDENTICAL to
    * the standalone p112/p132/p129/p120/p119 queries' — same
    * arithmetic, fewer rebuilds. Shared by the p130 scorecard and the
    * p136 significance test.
    */
  private def sharedRankings(s: SparkSession,
      dir: String): Seq[(String, DataFrame)] = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    val index = Retrieval.bm25Index(docs, "doc_id", "text")
    val qT = Retrieval.queryTerms(queries, "query_id", "qtext")
    val hits = index.postings.join(
      broadcast(qT.select("tok").distinct()), Seq("tok"))
    val shared = graft.core.Caching.withCachedMulti(hits)(Seq(
      Retrieval.rankTopK(Retrieval.bm25ScoresFromHits(index, hits, qT,
        Retrieval.Bm25Params()), 10),
      Retrieval.qlRankFromHits(index, hits, qT, k = 10, mu = 100.0)))
    val bm = shared(0)
    val ql = shared(1)
    val prf = Retrieval.prfFromPass1(index, qT,
      bm.filter(col("rank") <= 3).select(col("query_id"), col("doc_id")),
      fbTerms = 5, k = 10, Retrieval.Bm25Params())
    val emb = t(s, dir, "embeddings")
    val dense = Similarity.topK(emb,
        Retrieval.plantedSample(emb, "vec_id"), "vec_id", "embedding",
        k = 10)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
    val rrf = Retrieval.rrfFuse(
      bm.select(col("query_id"), col("doc_id"), col("rank")), dense,
      k0 = 60, topK = 10)
    Seq("bm25" -> bm, "bm25f" -> p132Bm25f(s, dir), "ql" -> ql,
      "prf" -> prf, "rrf" -> rrf)
  }

  def p130RetrievalScorecard(s: SparkSession, dir: String): DataFrame =
    sharedRankings(s, dir)
      .map { case (m, df) =>
        Retrieval.rankingScorecard(df, m, topK = 10) }
      .reduce(_.unionByName(_))

  /** Ranking significance (p136): the paired sign-flip randomization
    * test ([[Retrieval.pairedSignificance]], 200 portable-hash
    * permutations) of bm25f — the p130 card's best ranker — against
    * each of bm25/ql/prf/rrf on per-query nDCG@10. The card that says
    * whether the fielded upgrade's win is statistically real or a
    * 13-query accident; every permutation replays in the oracle. One
    * row per comparison.
    */
  /** Classifier agreement (p139): Cohen's kappa between the NB (p81)
    * and LR (p117) quality classifiers over the same corpus
    * ([[Curation.classifierAgreement]]) — the chance-corrected
    * swap-safety check, one exact-integer row. The oracle refits BOTH
    * classifiers and replays the portable floor-division kappa.
    */
  def p139ClassifierAgreement(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nb = Curation.nbClassifier(docs, "doc_id", "text",
      vocabSize = 500, profile = Curation.GateProfile.wordSalad)
    val lr = Curation.logisticRegression(docs, "doc_id", "text",
      buckets = 64, iters = 12, lrDen = 1,
      profile = Curation.GateProfile.wordSalad)
    Curation.classifierAgreement(nb, "pred", lr, "pred", "doc_id")
  }

  /** Near-dup hub centrality (p138): integer-exact damped PageRank
    * ([[graft.operators.PageRank]], 8 rounds) over the p04 near-dup
    * graph (4-gram Jaccard ≥ 0.4, both directions) — high-centrality
    * documents are template/boilerplate hubs, the triage signal for
    * survivor choice before a dedup cut; isolated docs hold exactly
    * the 150000 teleport mass. The oracle replays the exhaustive pair
    * scan and all 8 materialized rounds of the integer recurrence.
    */
  def p138PagerankHubs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupStore.ngramJaccardPairs(docs, "doc_id", "text", k = 4,
        threshold = 0.4, maxShingleFreqFrac = Some(0.1))
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs
        .select(col("doc_b").as("src"), col("doc_a").as("dst")))
    graft.operators.PageRank.pagerank(edges,
        docs.select(col("doc_id").as("node")), iters = 8)
      .select(col("node").as("doc_id"), col("pr").as("pr_micro"))
  }

  /** Epoch schedule (p153): the data-constrained scaling card
    * ([[Curation.epochSchedule]]) — a 4× corpus budget split
    * uniformly across sources, per-source epochs demanded, tokens
    * deliverable under the 4-epoch repetition ceiling, and the
    * deficit to re-allocate. Exact integers; the oracle replays the
    * in-plan totals and every division.
    */
  def p153EpochSchedule(s: SparkSession, dir: String): DataFrame =
    Curation.epochSchedule(t(s, dir, "documents"), "source", "text",
      budgetNumer = 4L, budgetDenom = 1L, capEpochs = 4L)

  /** Near-dup cohesion cores (p154): k-core peeling
    * ([[graft.operators.KCore]], 6 simultaneous rounds — fixpoint on
    * this graph, asserted by KCoreSpec) of the p04/p138 near-dup
    * graph at k = 2 and 3. A node surviving the 3-core sits in a
    * densely MUTUAL template family (≥3 in-core near-copies — safe to
    * collapse aggressively); a node the 2-core already strips is
    * pendant/star periphery that deserves review before a cut — the
    * cohesion cut-depth card next to p141's triangle view. One row
    * per (k, surviving doc): (k, doc_id, core_deg). The pair
    * detector's checkpointed output feeds both peels, so the
    * exhaustive-scan replay cost is paid once; the oracle replays
    * every peel round as a materialized CTE.
    */
  def p154KCore(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupStore.ngramJaccardPairs(docs, "doc_id", "text", k = 4,
        threshold = 0.4, maxShingleFreqFrac = Some(0.1))
      .select(col("doc_a"), col("doc_b"))
    Seq(2L, 3L).map { kk =>
      graft.operators.KCore.core(pairs, "doc_a", "doc_b",
          k = kk.toInt, rounds = 6)
        .select(lit(kk).as("k"), col("node").as("doc_id"),
          col("core_deg"))
    }.reduce(_.unionByName(_))
  }

  /** Exact PR-AUC (p155): average precision of the NB quality
    * classifier's LLR ranking against the funnel labels
    * ([[Curation.averagePrecision]]) — the class-imbalance-honest
    * twin of p113's ROC-AUC, read against the prevalence baseline
    * that rides the same row. Same scored frame as p113, so the two
    * cards disagree exactly when negatives dominate — the regime a
    * crawl-quality gate lives in. The oracle refits the classifier
    * and replays the descending score-group accumulation with the
    * identical floor-then-sum integer terms.
    */
  def p155PrAuc(s: SparkSession, dir: String): DataFrame =
    Curation.averagePrecision(
      Curation.nbClassifier(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 500, profile = Curation.GateProfile.wordSalad),
      "llr_micro", "cls")

  /** Dedup → retrieval impact (p156): the p130 ranking card computed
    * TWICE — once over the full corpus, once after the min-id
    * near-dup cut (p04 pairs closed by CC, the p151 decision set) —
    * against the SAME planted-prefix query set. The before/after card
    * answers the question every curation team argues about: does
    * deduplicating the corpus help or hurt retrieval quality? (Near
    * copies crowd the top-k, so cutting them usually lifts MRR — and
    * a query whose own source doc was dropped shows the cost side.)
    * Both variants rebuild the BM25 index from scratch (corpus stats
    * nd/avgdl/df legitimately shift under the cut — that shift IS the
    * measured effect); queries come from the FULL corpus so the
    * denominator is comparable. The oracle replays the closure, both
    * index builds, and both scorecards.
    */
  def p156DedupRetrievalImpact(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    val dropped = DedupStore.dedupDecisions(docs, "doc_id", "text",
        k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
      .filter(col("keep") === 0).select(col("node").as("doc_id"))
    val deduped = docs.join(dropped, Seq("doc_id"), "left_anti")
    def card(tag: String, corpus: DataFrame) =
      Retrieval.rankingScorecard(
        Retrieval.bm25TopK(corpus, "doc_id", "text",
          queries, "query_id", "qtext", k = 10),
        tag, topK = 10)
    card("full", docs).unionByName(card("dedup_minid", deduped))
  }

  /** Classifier operating points (p157): precision / recall / F1 of
    * the NB quality classifier at five LLR thresholds
    * ([[Curation.classifierOperatingPoints]]) — the card that turns
    * p113/p155's threshold-free rankings into the cut a production
    * gate actually deploys. Exact confusion integers, F1 in its
    * direct `2tp div (2tp+fp+fn)` form. The oracle refits the
    * classifier and replays every threshold's counts.
    */
  def p157OperatingPoints(s: SparkSession, dir: String): DataFrame =
    Curation.classifierOperatingPoints(
      Curation.nbClassifier(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 500, profile = Curation.GateProfile.wordSalad),
      "llr_micro", "cls",
      // the corpus LLR mass spans ~[-0.8M, 13.6M] (median ~4M): these
      // five cuts trace the whole precision/recall tradeoff curve
      thresholds = Seq(0L, 2000000L, 4000000L, 6000000L, 10000000L))

  /** Within-doc repetition signals (p158): the Gopher §A1.2 half of
    * the quality battery ([[Curation.repetitionSignals]]) — per
    * document, the top-2-gram character fraction and the
    * duplicated-3-gram character COVERAGE fraction, the signals that
    * catch boilerplate/loop documents the word-count gates pass.
    * (Gopher audits dup n-grams up to n = 10; the short synthetic
    * documents hold ZERO duplicated 5-grams, so n = 3 is the largest
    * n this corpus actually exercises — the operator takes any n.)
    * The oracle replays the positional grams, the (count DESC, gram)
    * argmax, and the distinct-position coverage sum.
    */
  def p158Repetition(s: SparkSession, dir: String): DataFrame =
    Curation.repetitionSignals(t(s, dir, "documents"), "doc_id", "text",
      topN = 2, dupN = 3)

  /** Split repair (p159): the FIX for the leakage p152 audits — every
    * near-dup cluster is routed whole to the split of its cluster
    * head (the min-id member, which IS the component id), so no
    * cluster can straddle train/valid/test after the move
    * (PipelineSpec asserts the zero-straddle invariant). Output is
    * the migration matrix: (from_split, to_split, n_docs) over the
    * clustered docs — off-diagonal rows are the docs that MUST move
    * to close the leak, the cost a data lead signs off on. Scale
    * shape: beyond the detector + closure this is two broadcast-sized
    * joins against the split projection, keyed on node/component.
    */
  def p159SplitRepair(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val split = docs.select(col("doc_id"),
      (TF.hash60(concat(lit("split"), col("doc_id").cast("string")))
        % 100).as("h"))
      .select(col("doc_id"),
        when(col("h") < 80, "train").when(col("h") < 90, "valid")
          .otherwise("test").as("split"))
    val cc = DedupStore.dedupDecisions(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    cc.join(split.select(col("doc_id").as("node"),
        col("split").as("from_split")), Seq("node"))
      .join(split.select(col("doc_id").as("component"),
        col("split").as("to_split")), Seq("component"))
      .groupBy("from_split", "to_split")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Global shard manifest (p160): the whole corpus in one
    * deterministic hash-shuffled order, cut into 4096-token training
    * shards by the two-level distributed prefix sum
    * ([[Curation.globalShardManifest]]) — the step that turns a curated
    * corpus into the ordered shard files a trainer streams. The
    * oracle replays the flat `SUM OVER (ORDER BY h, doc_id)`
    * placement, which the bucketed scan regroups associatively.
    */
  def p160ShardManifest(s: SparkSession, dir: String): DataFrame =
    Curation.globalShardManifest(t(s, dir, "documents"), "doc_id",
      "text", shardToks = 4096L)

  /** BM25 hard negatives (p161): the p112 query batch mined for
    * contrastive training pairs ([[Retrieval.bm25HardNegatives]]) —
    * top-5 lexical matches per query with the planted positive
    * (query_id = source doc) anti-joined away BEFORE the ranking
    * window, so each query yields five true negatives. The oracle
    * replays the full BM25 chain, the positive removal, and the
    * re-ranking.
    */
  def p161HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    Retrieval.bm25HardNegatives(docs, "doc_id", "text",
      queries, "query_id", "qtext",
      positives = queries.select(col("query_id"),
        col("query_id").as("doc_id")),
      k = 5)
  }

  /** Mixture-interleave manifest (p163): the corpus laid out by
    * stride-scheduled virtual time ([[Curation.mixtureInterleave]])
    * under the p50 temperature weights (α = 0.5, T5-style), cut into
    * 4096-token shards — the last mile between mixture weights and
    * shard files: every prefix of the order holds the target domain
    * mix within O(1) documents, so the trainer sees the mixture at
    * every read-ahead scale. The oracle replays the weight formula,
    * the flat per-domain ROW_NUMBER, the integer virtual times, and
    * the flat global token window, all equal to the two-level scans
    * by associativity.
    */
  def p163MixInterleave(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = p50TempMix(s, dir)
      .select(col("source"), col("p_micro").as("weight_micro"))
    Curation.mixtureInterleave(docs, "doc_id", "text", "source", w,
      shardToks = 4096L)
  }

  /** Learning-to-rank head (p173): the trained consumer that closes
    * the retrieval loop — the pipeline's own artifacts (planted
    * positives = the self-retrieval fixture, hard negatives = every
    * other BM25 top-10 candidate, p161's recipe) train a pointwise
    * logistic combination of the engine's ranking features (BM25,
    * proximity, phrase containment; [[graft.pipeline.Ltr]], the p117
    * integer-GD discipline), and the card scores base BM25 vs the
    * trained re-ranker on the p130 MRR/nDCG scorecard. On this corpus
    * the learner discovers the phrase-containment signal (large
    * positive w3) and roughly 2.5×'s the planted-relevance MRR —
    * proof the mined training data actually trains something that
    * moves the eval harness. The oracle replays feature extraction,
    * all twelve GD rounds (materialized weight CTEs), the re-rank,
    * and both scorecard rows.
    */
  def p173LtrRerank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    val feats = graft.pipeline.Ltr.rankFeatures(docs, "doc_id", "text",
      queries, "query_id", "qtext", k = 10)
    graft.core.Caching.withCached(feats) {
      val w = graft.pipeline.Ltr.ltrWeights(feats, iters = 12,
        lrNum = 50L)
      Retrieval.rankingScorecard(
          feats.select(col("query_id"), col("rank"), col("doc_id")),
          "bm25", topK = 10)
        .unionByName(Retrieval.rankingScorecard(
          graft.pipeline.Ltr.rerank(feats, w), "ltr_trained",
          topK = 10))
    }
  }

  /** Incremental manifest append (p172): two thirds of the corpus
    * build a p163 mixture manifest; the remaining third arrives as an
    * admitted delta batch and is APPENDED ([[Curation.mixtureAppend]])
    * — per-domain stride sequences resume from the persisted counts,
    * delta tokens are laid after the persisted token mass, and not
    * one existing row is recomputed (the batch twin of the streaming
    * stride scheduler's state continuity; StreamingSpec pins the
    * equivalence, this query pins the arithmetic). The output is the
    * full post-append manifest; the oracle replays the base build,
    * the resumed counters, and the delta placement, so any
    * perturbation of an existing row or misplacement of a delta row
    * hash-mismatches.
    */
  def p172ManifestAppend(s: SparkSession, dir: String): DataFrame =
    appendFixture(s, dir)._2

  /** The shared p172/p174 append fixture: base manifest over
    * doc_id % 3 != 0, the remaining third appended
    * ([[Curation.mixtureAppend]]). Returns (delta docs, the full
    * post-append manifest).
    */
  private def appendFixture(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val docs = t(s, dir, "documents")
    val w = p50TempMix(s, dir)
      .select(col("source"), col("p_micro").as("weight_micro"))
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val existing = Curation.mixtureInterleave(base, "doc_id", "text",
      "source", w, shardToks = 4096L)
    (delta, Curation.mixtureAppend(existing, delta, "doc_id", "text",
      "source", w, shardToks = 4096L))
  }

  /** Document chunking (p176): the RAG-ingestion / long-document
    * splitting primitive ([[Curation.chunkDocuments]] — 32-token
    * windows every 24 tokens, 25% overlap) with full provenance.
    * Zero-exchange projection; the oracle replays the window-start
    * rule, the slices, and the tail-length arithmetic.
    */
  def p176DocChunks(s: SparkSession, dir: String): DataFrame =
    Curation.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
      chunkToks = 32, strideToks = 24)

  /** LSH band-bucket skew audit (p179): the no-silent-caps card next
    * to p02 — per band, the bucket-population shape and exactly how
    * many candidate rows [[Dedup.LshBucketCap]]'s star-edge guard
    * would replace at the default cap. The oracle replays signatures,
    * band keys, and both pair sums, so the guard's accounting is
    * certified, not just logged. `n_oversized` = 0 at these SFs — the
    * binding case is exercised by the planted-cluster property tests.
    */
  def p179LshBucketAudit(s: SparkSession, dir: String): DataFrame =
    Dedup.lshBucketAudit(t(s, dir, "documents"), "doc_id", "text",
      k = 3, numHashes = 12, bands = 6)

  /** Serving-index export (p178): the IVF-PQ hand-off the ANN module
    * header promises made REAL ([[Similarity.exportServingIndex]]) —
    * coarse centroids, PQ codebook, and the compressed corpus
    * (cell + m codes per vector, the p74 config) written as parquet
    * artifacts, read back, and certified: per artifact, row count
    * and an order-free integer checksum with floats entering as
    * exact micro floors. The oracle recomputes centroid membership,
    * cell assignment, and every PQ code from the source table, so a
    * missing vector, a perturbed float, or a swapped code in the
    * exported artifacts hash-mismatches — the certificate a serving
    * node validates before loading the index.
    */
  /** The p177 long-document fixture: every document is prefixed with
    * its partner document's tokens (partner of doc `i` is doc
    * `(i+1) % N`), each token followed by six inert filler tokens.
    * The result is the regime Dai & Callan's MaxP claim is about,
    * built deterministically:
    *
    *  - at the DOCUMENT level, bag-of-words BM25 cannot tell scattered
    *    from contiguous: for the query planted from doc `m`, the doc
    *    that carries `m`'s text as interleaved padding matches every
    *    query term at the SAME term frequency — a FALSE POSITIVE
    *    competing head-on with the true document;
    *  - at the CHUNK level the padding is fragmented (a 32-token
    *    window holds at most five of the scattered tokens), while the
    *    true document's relevant span is contiguous inside one chunk —
    *    MaxP recovers the ranking the whole-document scores lost.
    *
    * Shape: one document-sized equi-join (partner id is modular
    * arithmetic over the in-plan corpus count) + per-row projections;
    * mirrored literally in the oracle.
    */
  private[graft] def longDocFixture(base: DataFrame): DataFrame = {
    val n = broadcast(base.agg(count(lit(1)).as("__n_docs")))
    val pad = array_join(
      transform(TF.tokens(col("text")),
        x => concat(x, lit(" xfillerx xfillerx xfillerx xfillerx" +
          " xfillerx xfillerx"))),
      " ")
    val partner = base.crossJoin(n)
      .select(
        pmod(col("doc_id") - 1 + col("__n_docs"), col("__n_docs"))
          .as("__target"),
        pad.as("__pad"))
    base.join(partner, col("doc_id") === col("__target"))
      .select(col("doc_id"),
        concat(col("__pad"), lit(" "), col("text")).as("text"))
  }

  /** Incremental serving-index append (p181): the exported IVF-PQ
    * artifacts absorb a DELTA batch in place
    * ([[Similarity.appendServingIndex]]) — new vectors (a rotated,
    * id-shifted tenth of the corpus, deterministic and
    * oracle-replayable) are coded against the FROZEN centroids and
    * codebook read back from the directory, and only O(Δ) new code
    * rows land in `codes/`; committed bytes are never rewritten and
    * nothing retrains. The card is [[Similarity.certifyServingIndex]]
    * over the EXTENDED directory: the oracle recomputes all three
    * artifact checksums from the source table plus the replayed delta,
    * so a lost delta row, a drifted code, or a disturbed base byte
    * hash-mismatches. The spec additionally pins that appending equals
    * a full re-export over (corpus ∪ delta) with the frozen quantizer,
    * and that the served top-k from the extended artifacts equals the
    * in-memory index over the union.
    */
  def p181IndexAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val tmp = scratchDir(s, dir, "serving_append")
    Similarity.exportServingIndex(emb, "vec_id", "embedding",
      coarseFilter = col("vec_id") % 25 === 0,
      pqFilter = col("vec_id") < 8, m = 4, dim = 64, tmp)
    val mx = broadcast(emb.agg((max(col("vec_id")) + 1L).as("__base")))
    val delta = emb.crossJoin(mx)
      .select((col("vec_id") + col("__base")).as("vec_id"),
        Similarity.rotateVec(col("embedding"), 64, "p181").as("embedding"))
      .filter(col("vec_id") % 10 === 3)
    Similarity.appendServingIndex(s, tmp, delta, "vec_id", "embedding",
      m = 4, dim = 64)
    Similarity.certifyServingIndex(s, tmp)
  }

  /** Dedup AT INGEST against frozen index artifacts (p182): the
    * near-dup lifecycle's serving story, the dedup twin of p178's
    * ANN hand-off — [[Dedup.exportDedupIndex]] freezes the admitted
    * corpus's LSH band table and minhash signatures as parquet
    * artifacts (signatures, ~10⁻³ of corpus bytes — never the text),
    * and an arriving batch is answered FROM THE ARTIFACTS ALONE:
    * band-key equi-join for candidates, signature-agreement count
    * for the verdict. The delta is deterministic and
    * oracle-replayable: ids shifted past the in-plan max; of the
    * original ids ≡ 1, 4, 7 (mod 10) — exact copies ('copy', full
    * 12/12 agreement), first-half truncations ('trunc', partial
    * agreement), and synthetic novel text ('novel', n_agree ~ 0).
    * The oracle replays the signatures, the band join WITH the
    * export-side bucket cap, the agreement count, and the best-match
    * argmax, so candidate generation and verdicts are certified end
    * to end. CLI twin `stream-ingest-dedup` answers arriving
    * micro-batches against the same artifacts.
    */
  def p182IngestDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tmp = scratchDir(s, dir, "dedup_index")
    Dedup.exportDedupIndex(docs, "doc_id", "text", k = 3,
      numHashes = 12, bands = 6, tmp)
    val mx = broadcast(docs.agg((max(col("doc_id")) + 1L).as("__base")))
    val toks = TF.tokens(col("text"))
    val half = floor((size(toks) + lit(1)) / lit(2)).cast("int")
    val idStr = col("doc_id").cast("string")
    val deltaText = when(col("doc_id") % 10 === 1, col("text"))
      .when(col("doc_id") % 10 === 4,
        array_join(slice(toks, lit(1), half), " "))
      .otherwise(concat(lit("zqa"), idStr, lit(" zqb"), idStr,
        lit(" zqc"), idStr, lit(" zqd"), idStr))
    val kind = when(col("doc_id") % 10 === 1, lit("copy"))
      .when(col("doc_id") % 10 === 4, lit("trunc"))
      .otherwise(lit("novel"))
    val delta = docs.crossJoin(mx)
      .filter(col("doc_id") % 10 === 1 || col("doc_id") % 10 === 4 ||
        col("doc_id") % 10 === 7)
      .select((col("doc_id") + col("__base")).as("doc_id"),
        col("doc_id").as("orig"), kind.as("kind"),
        deltaText.as("text"))
    val verdict = Dedup.ingestDedupCheck(s, tmp, delta, "doc_id",
      "text", k = 3, numHashes = 12, bands = 6, minAgree = 8)
    verdict.join(delta.select(col("doc_id"), col("orig"), col("kind")),
        "doc_id")
      .select(col("doc_id"), col("orig"), col("kind"), col("n_agree"),
        col("match_doc"), col("is_dup"))
  }

  /** Serving-index DELETE lifecycle (p183): tombstone → serve-around
    * → compact — how a frozen ANN index honors a takedown without
    * rewriting committed bytes, then reclaims them. Export (the p178
    * artifacts), tombstone a deterministic slice (vec_id ≡ 2 mod 9,
    * excluding centroid/codebook rows so the frozen quantizer is
    * untouched), certify the EXTENDED directory (pre phase: the codes
    * checksum is UNCHANGED — a logical delete rewrites nothing — and
    * the tombstone relation itself is certified), then
    * [[Similarity.compactServingIndex]] and certify again (post
    * phase: codes shrink by exactly the tombstoned rows, the
    * tombstone relation is gone). The oracle recomputes both phases
    * from the source table — cell assignments and PQ codes for the
    * full corpus (pre) and the surviving corpus (post) — so a
    * compact that loses a live row, resurrects a deleted one, or
    * perturbs a surviving code hash-mismatches. The spec pins that
    * serving from the tombstoned directory equals the in-memory
    * index over the surviving corpus bit for bit, and that
    * compaction leaves served answers unchanged.
    */
  def p183IndexDelete(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val tmp = scratchDir(s, dir, "serving_delete")
    Similarity.exportServingIndex(emb, "vec_id", "embedding",
      coarseFilter = col("vec_id") % 25 === 0,
      pqFilter = col("vec_id") < 8, m = 4, dim = 64, tmp)
    Similarity.tombstoneServingIndex(s, tmp,
      emb.filter(col("vec_id") % 9 === 2 && col("vec_id") % 25 =!= 0 &&
        col("vec_id") >= 8).select(col("vec_id")), "vec_id")
    val pre = Similarity.certifyServingIndex(s, tmp)
      .withColumn("phase", lit("pre")).localCheckpoint()
    Similarity.compactServingIndex(s, tmp)
    val post = Similarity.certifyServingIndex(s, tmp)
      .withColumn("phase", lit("post"))
    pre.unionByName(post)
      .select(col("phase"), col("artifact"), col("n_rows"),
        col("checksum"))
  }

  /** Incremental dedup-index append (p184): the near-dup gate's
    * index absorbs a day's admits in place — base index exported over
    * doc_id % 3 ≠ 0, the % 3 = 0 batch appended via
    * [[Dedup.appendDedupIndex]] (O(Δ) new files in `bands/` and
    * `sigs/`, committed bytes never rewritten, append deliberately
    * uncapped with [[Dedup.compactDedupIndex]] as the LSM re-cap),
    * then the EXTENDED directory certified:
    * [[Dedup.certifyDedupIndex]] emits per-artifact row counts and
    * order-free integer checksums, and the oracle recomputes both
    * relations from the source corpus — base band rows capped by
    * base-only bucket counts (exactly what the export wrote), delta
    * band rows uncapped (exactly what the append wrote), signatures
    * for every admitted doc. A lost delta row, a drifted signature,
    * or a base row disturbed by the append hash-mismatches. The spec
    * pins that the appended index catches duplicates of DELTA
    * documents, that append equals a fresh full export on an
    * uncongested corpus, and that compaction collapses a planted
    * oversized bucket to its representative.
    */
  def p184DedupAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tmp = scratchDir(s, dir, "dedup_append")
    Dedup.exportDedupIndex(docs.filter(col("doc_id") % 3 =!= 0),
      "doc_id", "text", k = 3, numHashes = 12, bands = 6, tmp)
    Dedup.appendDedupIndex(s, tmp, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", k = 3, numHashes = 12, bands = 6)
    Dedup.certifyDedupIndex(s, tmp)
  }

  /** Decontamination at ingest (p185): the deployment shape of p25 —
    * the benchmark's k-gram hash postings frozen once per eval
    * release ([[Curation.exportEvalIndex]]: 8-byte hashes, never eval
    * text) and every arriving batch gated against the artifact
    * ([[Curation.ingestContaminationCheck]]): per document the
    * worst-hit benchmark doc, its shared-k-gram count, and the
    * verdict at minShared — clean docs included with n_shared = 0, so
    * the output is a complete admission record. The eval postings
    * broadcast (benchmark sets are small by construction); the only
    * exchanges are hit-row aggregations. The oracle replays the
    * posting join, the per-pair counts, and the worst-hit argmax.
    * CLI twin `stream-decontaminate` gates arriving micro-batches
    * from the same artifact.
    */
  def p185IngestDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tmp = scratchDir(s, dir, "eval_index")
    Curation.exportEvalIndex(docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", k = 3, tmp)
    Curation.ingestContaminationCheck(s, tmp,
      docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
      k = 3, minShared = 2)
  }

  /** Serving-index CRUD lifecycle composite (p186): export → append
    * → delete → compact on ONE directory, certified after every
    * phase — the interaction coverage the standalone cards can't
    * give (p181 appends to a fresh export; p183 deletes from one;
    * here the tombstoned rows are removed from a directory that ALSO
    * holds appended delta files, and compaction must preserve the
    * delta while reclaiming the doomed base rows). Phases:
    * 1_export (the p178 artifacts), 2_append (the p181 delta, coded
    * against the frozen quantizer), 3_delete (tombstones over base
    * ids — codes checksum must equal phase 2's: a logical delete
    * rewrites nothing), 4_compact (codes = base ∪ delta minus the
    * doomed rows; tombstones gone). The oracle recomputes every
    * phase from the source table and the replayed delta.
    */
  def p186IndexLifecycle(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val tmp = scratchDir(s, dir, "serving_lifecycle")
    Similarity.exportServingIndex(emb, "vec_id", "embedding",
      coarseFilter = col("vec_id") % 25 === 0,
      pqFilter = col("vec_id") < 8, m = 4, dim = 64, tmp)
    val c1 = Similarity.certifyServingIndex(s, tmp)
      .withColumn("phase", lit("1_export")).localCheckpoint()
    val mx = broadcast(emb.agg((max(col("vec_id")) + 1L).as("__base")))
    val delta = emb.crossJoin(mx)
      .select((col("vec_id") + col("__base")).as("vec_id"),
        Similarity.rotateVec(col("embedding"), 64, "p186")
          .as("embedding"))
      .filter(col("vec_id") % 10 === 3)
    Similarity.appendServingIndex(s, tmp, delta, "vec_id", "embedding",
      m = 4, dim = 64)
    val c2 = Similarity.certifyServingIndex(s, tmp)
      .withColumn("phase", lit("2_append")).localCheckpoint()
    Similarity.tombstoneServingIndex(s, tmp,
      emb.filter(col("vec_id") % 9 === 2 && col("vec_id") % 25 =!= 0 &&
        col("vec_id") >= 8).select(col("vec_id")), "vec_id")
    val c3 = Similarity.certifyServingIndex(s, tmp)
      .withColumn("phase", lit("3_delete")).localCheckpoint()
    Similarity.compactServingIndex(s, tmp)
    val c4 = Similarity.certifyServingIndex(s, tmp)
      .withColumn("phase", lit("4_compact"))
    c1.unionByName(c2).unionByName(c3).unionByName(c4)
      .select(col("phase"), col("artifact"), col("n_rows"),
        col("checksum"))
  }

  /** Ingest ADMISSION PIPELINE (p187): the three gates a
    * training-data pipeline runs on every arriving batch, composed
    * into ONE admission record — near-dup against the frozen dedup
    * index (p182's gate), benchmark contamination against the frozen
    * eval postings (p185's gate), and the quality funnel (the
    * p61/p64/p09 gate expressions under the p81/p84 corpus profile)
    * — with one verdict per document under reject precedence
    * dup > contaminated > low-quality > admit. The base corpus
    * (doc_id % 7 ≠ 2) builds both frozen artifacts; the arrival
    * batch (doc_id % 7 = 2) flows through all three gates off its
    * own single scan (each gate broadcasts its frozen side). The
    * oracle replays every gate — capped band join, posting join,
    * all three quality gates — and the verdict precedence, so the
    * one-stop admission table is certified end to end.
    */
  def p187AdmissionPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val base = docs.filter(col("doc_id") % 7 =!= 2)
    val arrivals = docs.filter(col("doc_id") % 7 === 2)
    val dTmp = scratchDir(s, dir, "adm_dedup")
    val eTmp = scratchDir(s, dir, "adm_eval")
    Dedup.exportDedupIndex(base, "doc_id", "text", k = 3,
      numHashes = 12, bands = 6, dTmp)
    Curation.exportEvalIndex(base.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", k = 3, eTmp)
    val dup = Dedup.ingestDedupCheck(s, dTmp, arrivals, "doc_id",
      "text", k = 3, numHashes = 12, bands = 6, minAgree = 8)
      .select(col("doc_id"), col("n_agree"), col("is_dup"))
    val cont = Curation.ingestContaminationCheck(s, eTmp, arrivals,
      "doc_id", "text", k = 3, minShared = 2)
      .select(col("doc_id"), col("n_shared"), col("is_contaminated"))
    val qual = Curation.funnelLabels(arrivals, "doc_id", "text",
      profile = Curation.GateProfile.wordSalad)
      .select(col("doc_id"), col("cls"))
    dup.join(cont, "doc_id").join(qual, "doc_id")
      .select(col("doc_id"), col("n_agree"), col("n_shared"),
        col("cls").as("quality_keep"),
        when(col("is_dup") === 1, "reject_dup")
          .when(col("is_contaminated") === 1, "reject_contaminated")
          .when(col("cls") === 0, "reject_quality")
          .otherwise("admit").as("verdict"))
  }

  /** Image ingest gate from frozen artifacts (p188): the MULTIMODAL
    * member of the ingest-gate family — the admitted corpus's
    * perceptual dHashes frozen as a banded Hamming index
    * ([[Dedup.exportHammingIndex]]: 64-bit hashes + segment bands,
    * never payload bytes), and an arriving image batch gated against
    * it ([[Dedup.ingestHammingCheck]]). The fixture is p77's
    * real-codec plant flipped into an ingest story: the ADMITTED side
    * is every even doc's 9×8 pattern through the REAL PNG writer; the
    * ARRIVING side is the odd docs' re-encodes of the SAME patterns
    * through the REAL JPEG writer — an arrival is flagged iff the
    * decoder genuinely recovers the raster from both codecs, and its
    * match is exactly its partner (distinct patterns sit ~32 bits
    * apart). The oracle is therefore the closed-form partner list:
    * odd doc n matches even doc n−1 when it exists — a stubbed
    * decode, a broken band join, or a hash drift breaks the compare.
    */
  def p188ImageIngestGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    def src(parity: Int) = docs
      .filter(pmod(col("doc_id"), lit(2)) === parity)
      .select(col("doc_id"), floor(col("doc_id") / 2).cast("long"))
      .as[(Long, Long)]
    val admitted = Multimodal.encodePattern(src(0), "png")
    val arrivals = Multimodal.encodePattern(src(1), "jpg")
    val tmp = scratchDir(s, dir, "image_index")
    val aH = Multimodal.dHash(admitted.map(e =>
      Multimodal.MediaRow(e.media_id, e.png, "image/*"))).toDF()
    Dedup.exportHammingIndex(aH, "media_id", "dhash", bits = 64,
      segments = 4, tmp)
    val bH = Multimodal.dHash(arrivals.map(e =>
      Multimodal.MediaRow(e.media_id, e.png, "image/*"))).toDF()
    Dedup.ingestHammingCheck(s, tmp, bH, "media_id", "dhash",
      bits = 64, segments = 4, maxHamming = 3)
  }

  def p178IndexExport(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val tmp = scratchDir(s, dir, "serving_index")
    Similarity.exportServingIndex(emb, "vec_id", "embedding",
      coarseFilter = col("vec_id") % 25 === 0,
      pqFilter = col("vec_id") < 8, m = 4, dim = 64, tmp)
    Similarity.certifyServingIndex(s, tmp)
  }

  /** Drifted sibling of [[clusteredEmbeddings]] for the p189 card:
    * the same 32-cluster two-level closed form with a DIFFERENT
    * center salt per stage — an arriving distribution the frozen
    * quantizer was never trained on (centers land elsewhere in the
    * ±1000 cube). A quarter of the corpus per stage
    * (`vec_id % 4 = stage`), ids shifted past the base mass, cluster
    * and noise derived from the SHIFTED id so the oracle rebuilds
    * identical vectors from the id alone.
    */
  private def driftedEmbeddings(s: SparkSession, dir: String,
      stage: Int): DataFrame =
    t(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .filter(pmod(col("vec_id"), lit(4)) === stage)
      .select((col("vec_id") + lit(stage * 1000000L)).as("vec_id"))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(64)), d =>
          ((TF.hash60(concat(lit(s"dc$stage"),
              pmod(col("vec_id"), lit(32)).cast("string"),
              lit("_"), d.cast("string"))) % 2001 - 1000)
            + (TF.hash60(concat(lit(s"dn$stage"),
              col("vec_id").cast("string"),
              lit("_"), d.cast("string"))) % 21 - 10))
            .cast("float")).as("embedding"))

  /** Quantizer-drift card (p189): the operational signal a FROZEN
    * serving index uses to schedule re-training — the question
    * p178/p181/p183/p186 leave open. [[Similarity.appendServingIndex]]
    * deliberately never re-trains (stored codes stay valid), so as
    * appended mass drifts away from the training distribution its
    * codes degrade. The card measures that degradation from the
    * SERVED artifacts at growing delta fractions: export over the
    * clustered fixture, then two appends of drift-shifted quarters
    * ([[driftedEmbeddings]] — same structure, different centers), and
    * per (stage, mass) one row with
    *
    *  - `recon_err`: mean squared reconstruction error of the mass's
    *    stored codes against its true vectors (per-vector floor, so
    *    the distributed sum is order-free integer math) — FAISS's
    *    re-train criterion, stable at any SF;
    *  - `recall_micro`: served ADC recall@3 against the exact
    *    ranking over the union (the asked-for view; raw-PQ code ties
    *    resolve by id, which is exactly the discrimination loss the
    *    drifted mass suffers first);
    *  - `retrain_recommended`: 1 when the mass's reconstruction
    *    error exceeds 4× the export-time base error — drifted
    *    appends trip it, base mass never does.
    *
    * Scale shape: the artifacts serve every measurement (centroids/
    * codebook fold into literals; codes scan cell-pruned); exact
    * truth is one broadcast-join scan per mass; nothing all-pairs.
    */
  def p189QuantizerDrift(s: SparkSession, dir: String): DataFrame = {
    // the closed-form fixtures are ~130 md5 calls per row and feed
    // every export/append/measurement below — materialize each once
    val base = clusteredEmbeddings(s, dir).localCheckpoint(true)
    val tmp = scratchDir(s, dir, "quantizer_drift")
    // 32 codebook entries — one per base cluster — so the trained
    // quantizer is TIGHT on its training distribution (base recon
    // error ~ the ±10 jitter mass) and the drifted mass's stale-code
    // error stands out by orders of magnitude; with 8 entries the
    // base error is itself center-sized and drift disappears into it
    Similarity.exportServingIndex(base, "vec_id", "embedding",
      coarseFilter = col("vec_id") < 32, pqFilter = col("vec_id") < 32,
      m = 4, dim = 64, tmp)
    val d1 = driftedEmbeddings(s, dir, 1).localCheckpoint(true)
    val d2 = driftedEmbeddings(s, dir, 2).localCheckpoint(true)
    def measure(stage: String, mass: String, union: DataFrame,
        massDf: DataFrame, queries: DataFrame): DataFrame = {
      val served = Similarity.ivfPqTopKFromArtifacts(s, tmp, queries,
          "vec_id", "embedding", m = 4, dim = 64, k = 3, nprobe = 2)
        .select(col("query_id"), col("cand_id"))
      val exact = Similarity.topK(union, queries, "vec_id",
          "embedding", 3)
        .select(col("query_id"), col("cand_id"))
      val recall = served.join(exact, Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(exact.agg(count(lit(1)).as("n_truth")))
      val err = Similarity.reconstructionError(s, tmp, massDf,
        "vec_id", "embedding", m = 4, dim = 64)
      recall.crossJoin(err)
        .select(lit(stage).as("stage"), lit(mass).as("mass"),
          col("n_vecs"), col("recon_err"), col("n_hits"),
          col("n_truth"),
          floor(col("n_hits") * lit(1e6) / col("n_truth"))
            .cast("long").as("recall_micro"))
    }
    val baseQ = base.filter(col("vec_id") < 16)
    val deltaQ = d1.filter(col("vec_id") < 1000064L)
    val s0 = measure("0_export", "base", base, base, baseQ)
      .localCheckpoint()
    Similarity.appendServingIndex(s, tmp, d1, "vec_id", "embedding",
      m = 4, dim = 64)
    val u1 = base.unionByName(d1)
    val s1b = measure("1_append25", "base", u1, base, baseQ)
      .localCheckpoint()
    val s1d = measure("1_append25", "delta", u1, d1, deltaQ)
      .localCheckpoint()
    Similarity.appendServingIndex(s, tmp, d2, "vec_id", "embedding",
      m = 4, dim = 64)
    val u2 = u1.unionByName(d2)
    val s2b = measure("2_append50", "base", u2, base, baseQ)
    val s2d = measure("2_append50", "delta", u2, d1.unionByName(d2),
      deltaQ)
    val rows = s0.unionByName(s1b).unionByName(s1d).unionByName(s2b)
      .unionByName(s2d)
    val ref = broadcast(s0.select(col("recon_err").as("__ref")))
    rows.crossJoin(ref)
      .select(col("stage"), col("mass"), col("n_vecs"),
        col("recon_err"), col("n_hits"), col("n_truth"),
        col("recall_micro"),
        (col("recon_err") > col("__ref") * lit(4L)).cast("long")
          .as("retrain_recommended"))
  }

  /** Passage retrieval card (p177): the MaxP evidence-aggregation
    * pattern (Dai & Callan 2019) over p176's chunks — documents
    * ranked by their BEST chunk's BM25 score versus whole-document
    * BM25, both scored on the planted self-retrieval relevance
    * through the p130 scorecard. The chunk index scores 32-token
    * passages, so a short query's match isn't diluted by document
    * length — the reason RAG stacks retrieve passages and aggregate
    * to documents.
    *
    * The corpus is the LONG-DOCUMENT fixture Dai & Callan's claim is
    * actually about ([[longDocFixture]]): each document carries its
    * partner's tokens scattered through inert filler before its own
    * contiguous text, so whole-document bag-of-words BM25 faces a
    * built-in false positive per query (scattered matches score like
    * contiguous ones) while the chunk index sees the padding
    * fragmented across windows. Queries are the first EIGHT tokens of
    * the unpadded text (not the 4-token [[Retrieval.plantedQueries]]
    * standard): an 8-term span is distinctive enough for
    * self-retrieval to be feasible at 5000 documents, and its
    * interleaved echo spans 50 positions — wider than one 32-token
    * window — so no distractor chunk can contain the whole span.
    * Measured: chunk_maxp beats doc_bm25 on every scorecard metric at
    * BOTH SFs (MRR ~18× / hits 61 vs 7 of 125 at sf0.01; MRR ~3.6× /
    * hits 14 vs 5 at sf0.1) — the separation the r12 short-document
    * card honestly couldn't show. Chunk ids pack
    * (doc, seq) as doc_id·10⁴ + seq
    * with an in-plan overflow guard (a 10⁴-chunk document is a
    * ~240k-token outlier a pipeline should reject loudly). The
    * oracle replays the padding, chunking, BOTH index builds, the
    * MaxP rollup, and both scorecard rows.
    */
  def p177PassageRetrieval(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
    val docs = longDocFixture(base)
    val queries = Retrieval.plantedSample(base, "doc_id")
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TF.tokens(col("text")), 1, 8)).as("qtext"))
    val chunks = Curation.chunkDocuments(docs, "doc_id", "text",
      chunkToks = 32, strideToks = 24)
      .select(
        when(col("chunk_seq") >= 10000L,
          raise_error(concat(lit("p177: document "),
            col("doc_id").cast("string"),
            lit(" exceeds 10^4 chunks — widen the chunk-id packing"))))
          .otherwise(col("doc_id") * 10000L + col("chunk_seq"))
          .as("chunk_id"),
        col("chunk_text"))
    val docRank = Retrieval.bm25TopK(docs, "doc_id", "text", queries,
      "query_id", "qtext", k = 10)
    // the passage pool is WIDER than the final doc ranking (30 chunks
    // -> top-10 docs): overlapping windows mean one document can
    // occupy several top slots, and a 10-chunk pool can crowd the
    // relevant document out entirely before the MaxP rollup dedupes
    val chunkRank = Retrieval.bm25TopK(chunks, "chunk_id", "chunk_text",
      queries, "query_id", "qtext", k = 30)
    val maxp = chunkRank
      .select(col("query_id"),
        call_function("div", col("doc_id"), lit(10000L)).as("doc_id"),
        col("score_micro"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("score_micro")).as("best_micro"))
      .withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("best_micro").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"))
    Retrieval.rankingScorecard(docRank, "doc_bm25", topK = 10)
      .unionByName(
        Retrieval.rankingScorecard(maxp, "chunk_maxp", topK = 10))
  }

  /** Release diff card (p175): the change log between two corpus
    * releases ([[Curation.releaseDiff]] — per (source, status ∈
    * added/removed/modified/unchanged), doc counts and token mass
    * both sides). Release 2 is derived deterministically from the
    * corpus: every doc_id % 7 == 2 removed, % 7 == 3 gets its text
    * amended, and % 7 == 4 additionally ships a NEW document (id
    * offset past the in-plan max id, so new ids never collide with
    * real ones at any corpus size). One full-outer id join + rollup;
    * "modified" keys on the
    * content fingerprint, so a whitespace-only change doesn't count.
    * The oracle replays release construction, the fingerprint
    * comparison, and the rollup.
    */
  /** Release sign-off composite (p180): the ONE long-format table a
    * release manager reads before committing a corpus release — every
    * row is (section, item, metric, value):
    *
    *  - `dedup_impact`: p107's cluster-size buckets (what min-id
    *    canonicalization removes),
    *  - `threshold_sweep`: qualifying pair counts at the p125
    *    thresholds (how sensitive the cut is),
    *  - `source_dup`: p151's per-source dup triage,
    *  - `retrieval`: p156's full-vs-deduped BM25 scorecard (what the
    *    cut costs/buys downstream),
    *  - `release_diff`: p175's version change log.
    *
    * The sharing discipline (p130's): the expensive near-dup PAIR set
    * and its transitive-closure DECISIONS materialize exactly ONCE
    * and feed the first four sections — standalone, those queries
    * each rebuild both. Values are bit-identical to the standalone
    * cards; the oracle certifies that by replaying each section
    * through the standalone oracles, melted to the same long format.
    */
  def p180ReleaseSignoff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def melt(df: DataFrame, section: String,
        item: org.apache.spark.sql.Column,
        metrics: Seq[String]): DataFrame =
      df.select(lit(section).as("section"),
          item.cast("string").as("item"),
          explode(map(metrics.flatMap(m =>
            Seq(lit(m), col(m).cast("long"))): _*)).as(Seq("metric", "value")))
    val pairs0 = DedupStore.ngramJaccardPairs(docs, "doc_id", "text", k = 4,
      threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    val parts = graft.core.Caching.withCachedMulti(pairs0) {
      val dec0 = DedupStore.dedupDecisions(docs, "doc_id", "text",
        k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
      graft.core.Caching.withCachedMulti(dec0) {
        val toks = docs.select(col("doc_id"),
          size(TF.tokens(col("text"))).cast("long").as("n_toks"))
        // p107's bucket rollup, off the shared decisions
        val impact = dec0.join(toks, col("node") === col("doc_id"))
          .groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"),
            sum(when(col("keep") === 0, col("n_toks")).otherwise(0L))
              .as("toks_removed"))
          .withColumn("bucket",
            when(col("cluster_size") === 2, "2")
              .when(col("cluster_size") <= 4, "3-4")
              .when(col("cluster_size") <= 8, "5-8")
              .otherwise("9+"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("cluster_size")).as("n_docs"),
            sum(col("cluster_size") - 1).as("n_docs_removed"),
            sum(col("toks_removed")).as("toks_removed"))
        // pair counts at the p125 thresholds, off the shared pairs
        val sweep = Seq(40, 90, 96, 98).map { tPct =>
          pairs0.filter(col("jaccard_micro") >= tPct * 10000L)
            .agg(count(lit(1)).as("n_pairs"))
            .select(lit(tPct.toLong).as("threshold_pct"), col("n_pairs"))
        }.reduce(_.unionByName(_))
        // p151's per-source triage, off the shared decisions
        val bySource = docs.select(col("doc_id"), col("source"),
            size(TF.tokens(col("text"))).cast("long").as("n_toks"))
          .join(dec0.select(col("node").as("doc_id"), col("keep")),
            Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep").isNotNull, 1L).otherwise(0L))
              .as("n_clustered"),
            sum(when(col("keep") === 0, 1L).otherwise(0L)).as("n_dropped"),
            sum(when(col("keep") === 0, col("n_toks")).otherwise(0L))
              .as("toks_dropped"))
          .withColumn("dup_rate_micro", call_function("div",
            col("n_clustered") * lit(1000000L), col("n_docs")))
        // p156's retrieval impact, drop set off the shared decisions
        val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
        val dropped = dec0.filter(col("keep") === 0)
          .select(col("node").as("doc_id"))
        val deduped = docs.join(dropped, Seq("doc_id"), "left_anti")
        def card(tag: String, corpus: DataFrame) =
          Retrieval.rankingScorecard(
            Retrieval.bm25TopK(corpus, "doc_id", "text",
              queries, "query_id", "qtext", k = 10),
            tag, topK = 10)
        val retrieval = card("full", docs)
          .unionByName(card("dedup_minid", deduped))
        Seq(
          melt(impact, "dedup_impact", col("bucket"),
            Seq("n_clusters", "n_docs", "n_docs_removed", "toks_removed")),
          melt(sweep, "threshold_sweep", col("threshold_pct"),
            Seq("n_pairs")),
          melt(bySource, "source_dup", col("source"),
            Seq("n_docs", "n_clustered", "n_dropped", "toks_dropped",
              "dup_rate_micro")),
          melt(retrieval, "retrieval", col("method"),
            Seq("n_queries", "n_hits", "mrr_micro", "ndcg_micro")))
      }
    }
    val releaseDiff = melt(p175ReleaseDiff(s, dir), "release_diff",
      concat(col("source"), lit("|"), col("status")),
      Seq("n_docs", "n_toks_old", "n_toks_new"))
    (parts :+ releaseDiff).reduce(_.unionByName(_))
  }

  def p175ReleaseDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // new-document ids sit PAST the in-plan max(doc_id) (single-row
    // broadcast): a fixed +10^6 offset would collide with real ids at
    // corpora of a million documents, duplicating full-outer join keys
    val mx = broadcast(docs.agg(max(col("doc_id")).as("__max_id")))
    val rel2 = docs.filter(col("doc_id") % 7 =!= 2)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" release2 amendment")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 7 === 4).crossJoin(mx)
        .select(col("doc_id") + col("__max_id") + lit(1L), col("source"),
          concat(col("text"), lit(" brand new document")).as("text"))
        .toDF("doc_id", "source", "text"))
    Curation.releaseDiff(docs, rel2, "doc_id", "text", "source")
  }

  /** Incremental shard-file release (p174): the end of the
    * incremental-release chain (bloom admission p47 → manifest append
    * p172 → THIS): the base corpus is materialized as ordered shard
    * files, the appended delta extends the directory through
    * [[graft.pipeline.Shards.writeAppend]] — dynamic partition
    * overwrite rewrites ONLY the chunks at or past the delta's first
    * chunk, so an appended release costs O(Δ + one boundary chunk),
    * never a corpus rewrite — and the whole directory is read back
    * and certified exactly as p171 certifies a full write (per-shard
    * counts, the order-covering checksum, the physical-order
    * inversion audit pinned at 0). The oracle replays the append
    * manifest and the checksum rollup from the source parquet, so a
    * stale boundary chunk, a lost base row, or a misplaced delta row
    * hash-mismatches.
    */
  def p174ShardAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (delta, appended) = appendFixture(s, dir)
    val tmp = scratchDir(s, dir, "shard_append")
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    // the committed base release...
    graft.pipeline.Shards.write(base, "doc_id", "text",
      appended.join(base.select("doc_id"), Seq("doc_id"), "left_semi"),
      tmp)
    // ...extended in place by the delta batch
    graft.pipeline.Shards.writeAppend(docs, "doc_id", "text", appended,
      appended.join(delta.select("doc_id"), Seq("doc_id"), "left_semi"),
      tmp)
    graft.pipeline.Shards.certify(s, tmp)
  }

  /** Shard mixture audit (p165): the QA card over the p163 manifest —
    * per (shard, domain): document and token counts, the shard's
    * observed domain share, the target share from the same p50
    * weights, and the absolute deviation, all in integer micro. The
    * card that PROVES the stride interleave delivers the mixture at
    * shard granularity (not just in a spec): deviations stay O(1/shard
    * size) on every full shard. One rollup exchange over the manifest;
    * the oracle replays manifest + rollup + the integer share
    * arithmetic.
    */
  def p165ShardMix(s: SparkSession, dir: String): DataFrame = {
    val manifest = p163MixInterleave(s, dir)
    val w = p50TempMix(s, dir)
      .select(col("source"), col("p_micro").as("w"))
    val totalW = w.agg(sum(col("w")).as("tw"))
    val shardTotals = manifest.groupBy("chunk_idx")
      .agg(count(lit(1)).as("shard_docs"))
    // shardTotals is shard-count-sized (corpus tokens / shardToks) —
    // unbounded at 100 TB, so it joins co-keyed on chunk_idx with an
    // explicit merge hint (never broadcast, whatever the planner's
    // size estimate says at test SF); the domain-sized weight frames
    // do broadcast
    manifest.groupBy(col("chunk_idx"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"))
      .join(shardTotals.hint("merge"), Seq("chunk_idx"))
      .join(broadcast(w), Seq("source"))
      .crossJoin(broadcast(totalW))
      .select(col("chunk_idx"), col("source"), col("n_docs"),
        col("n_toks"),
        expr("n_docs * 1000000 div shard_docs").as("share_micro"),
        expr("w * 1000000 div tw").as("target_micro"),
        abs(expr("n_docs * 1000000 div shard_docs")
          - expr("w * 1000000 div tw")).as("abs_dev_micro"))
  }

  /** kNN label probe (p169): the standard embedding-quality
    * evaluation — leave-self-out 10-NN cosine classification over the
    * labeled embeddings, majority vote (ties to the smaller label),
    * per-class accuracy in integer micro. The first consumer of the
    * embeddings table's `label` column: a collapsing embedding space
    * shows up here as falling probe accuracy long before any
    * downstream model does.
    *
    * Scale shape: the probe is an EVALUATION CARD, so it needs
    * neither exhaustive truth nor a corpus-fraction query set — the
    * query side is an absolute ~256-row budget
    * ([[Retrieval.plantedSample]], stride in-plan from the corpus
    * count) and neighbors come through the IVF cell index
    * ([[Similarity.ivfTopKWith]], ~32 budget-strided seed centroids,
    * nprobe 2): assignment is N·C broadcast work and probing
    * shuffles on cell ids, so probe cost grows linearly with the
    * corpus where the old broadcast brute-force scan grew as N²/20
    * and its query broadcast grew with N (the p108 downgrade class).
    * The oracle replays assignment, probing, scoring, voting, and
    * the tie rule.
    */
  def p169KnnProbe(s: SparkSession, dir: String): DataFrame =
    knnProbeOver(t(s, dir, "embeddings"))

  /** The 10-NN vote-and-score chain shared by p169 (raw vectors) and
    * p170 (quantized vectors swapped in upstream).
    */
  private def knnProbeOver(emb: DataFrame): DataFrame = {
    val queries = Retrieval.plantedSample(emb, "vec_id", budget = 256)
    val cents = Retrieval.plantedSample(emb, "vec_id", budget = 32)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val nn = Similarity.ivfTopKWith(emb, queries, "vec_id", "embedding",
      cents, k = 10, nprobe = 2)
    val pred = nn
      .join(emb.select(col("vec_id").as("cand_id"),
        col("label").as("nl")), Seq("cand_id"))
      .groupBy(col("query_id"), col("nl"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("votes"), (-col("nl")).as("negl"))).as("m"))
      .select(col("query_id"), (-col("m.negl")).as("pred"))
    pred
      .join(emb.select(col("vec_id").as("query_id"),
        col("label").as("true_label")), Seq("query_id"))
      .groupBy(col("true_label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("pred") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("true_label"), col("n_queries"), col("n_correct"),
        expr("n_correct * 1000000 div n_queries").as("accuracy_micro"))
  }

  /** Quantization probe (p170): the p169 kNN label probe run on RAW
    * float vectors and on their int8 quantizations side by side — the
    * evaluation every compressed vector store needs: how much probe
    * accuracy does 4× memory/IO compression cost? Cosine is computed
    * DIRECTLY on the integer vectors (the per-vector scale cancels in
    * cosine, and |q| ≤ 127 is float-exact in both engines, so no
    * dequantization doubles enter the comparison). One row per
    * (method, class). The oracle replays quantization (floor —
    * engine-portable, unlike round), both scoring chains, and the
    * vote rule.
    */
  def p170QuantizationProbe(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val int8 = emb.select(col("vec_id"),
      transform(
        Similarity.quantize(col("embedding"),
          Similarity.quantScale(col("embedding"))),
        x => x.cast("float")).as("embedding"),
      col("label"))
    knnProbeOver(emb).select(lit("raw").as("method"), col("*"))
      .unionByName(
        knnProbeOver(int8).select(lit("int8").as("method"), col("*")))
  }

  /** k-anonymity audit (p168): the re-identification-risk card a
    * privacy review runs BESIDE the PII scrubs (p38/p95 remove direct
    * identifiers; this measures the QUASI-identifier — Sweeney's
    * k-anonymity over each user's behavioral signature, the sorted
    * set of event types they emit). For every anonymity level k:
    * how many distinct signatures and users sit in classes of exactly
    * k users — the k=1 row is the population a linkage attack
    * re-identifies outright. Two map-side-combined exchanges (user
    * rollup, signature rollup) plus a k-sized rollup; signatures move
    * as strings of type names, never raw events. The oracle replays
    * the sorted-distinct signature and both rollups.
    */
  def p168KAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(concat_ws("|",
        sort_array(collect_set(col("event_type")))).as("sig"))
      .groupBy(col("sig")).agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_signatures"),
        sum(col("k")).as("n_users"))

  /** JSONL round-trip (p167): export the documents table as
    * newline-delimited JSON ([[graft.pipeline.Jsonl]] — the corpus
    * interchange format every public release ships in), read it back
    * with an explicit schema, and aggregate per source — certifying
    * that text (with whatever quotes/newlines/unicode it carries)
    * survives JSON escaping bit-exactly, the same way q27 certifies
    * the CSV surface. The oracle aggregates the original parquet, so
    * any escaping loss hash-mismatches; zero malformed rows is
    * asserted in-plan (a corrupt line would change n_docs).
    */
  /** Scratch export dir keyed on a hash of the FULL corpus path plus
    * the Spark application id: two corpora sharing the same digits
    * (or two concurrent runs on the same SF) must not overwrite each
    * other's export mid-read. Driver-side path derivation only — no
    * query result ever sees it.
    */
  private val scratchNonce = new java.util.concurrent.atomic.AtomicLong()

  /** Per-INVOCATION scratch path: (tag, corpus dir, application) name
    * the workload; the nonce isolates concurrent or repeated
    * invocations of the same query inside one application (parallel
    * test/bench runs would otherwise interleave overwrite-while-read
    * on a shared /tmp path).
    */
  private def scratchDir(s: SparkSession, dir: String,
      tag: String): String = {
    val dirKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString
    s"/tmp/graft_${tag}_${dirKey}_" + s.sparkContext.applicationId +
      s"_n${scratchNonce.getAndIncrement()}"
  }

  /** Shard-file materialization (p171): the corpus WRITTEN as actual
    * training shards in p160's manifest order
    * ([[graft.pipeline.Shards.write]] — one JSONL directory per
    * 4096-token chunk, rows physically sorted by manifested offset),
    * then read back and certified: per shard, doc/token counts and
    * the order-covering checksum Σ hash60(fingerprint:chunk_off)
    * mod 2²⁸ recomputed FROM THE FILES, plus the physical-order
    * inversion count (structurally zero for a faithful write,
    * asserted by the oracle's literal). The oracle recomputes every
    * quantity from the source parquet, so any loss of membership,
    * content, offset, or row order in the written shards
    * hash-mismatches — the last mile between p160's manifest and the
    * files a trainer streams, certified the way p167 certifies the
    * flat JSONL surface.
    */
  def p171ShardFiles(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val man = Curation.globalShardManifest(docs, "doc_id", "text",
      shardToks = 4096L)
    val tmp = scratchDir(s, dir, "shard_files")
    graft.pipeline.Shards.write(docs, "doc_id", "text", man, tmp)
    graft.pipeline.Shards.certify(s, tmp)
  }

  def p167JsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(s, dir, "jsonl_roundtrip")
    graft.pipeline.Jsonl.write(
      t(s, dir, "documents").select(col("doc_id"), col("text"),
        col("lang"), col("source")), tmp)
    graft.pipeline.Jsonl.read(s, tmp,
        "doc_id LONG, text STRING, lang STRING, source STRING")
      .filter(col("_corrupt").isNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(size(TF.tokens(col("text"))).cast("long")).as("n_toks"))
  }

  /** Epoch decorrelation audit (p166): shared ordered-adjacent pairs
    * between the three epoch-salted shuffle orders
    * ([[Curation.epochDecorrelation]]) — proof the per-epoch reshuffle
    * actually decorrelates local data order (expected ~1 shared pair
    * by the birthday bound; a spike means every epoch replays the same
    * gradient neighborhoods). The oracle replays flat ROW_NUMBER +
    * LEAD per epoch and the pair intersections.
    */
  def p166EpochDecorrelation(s: SparkSession, dir: String): DataFrame =
    Curation.epochDecorrelation(t(s, dir, "documents"), "doc_id",
      epochs = 3)

  /** Contrastive crop pairs (p164): two deterministic pseudo-random
    * token crops per document ([[Curation.contrastiveCrops]],
    * Contriever's independent cropping) — the (anchor, positive)
    * training pairs beside p161's hard negatives, with the interval
    * overlap as the pair-difficulty signal. Zero-exchange per-row
    * projection; the oracle replays the hash draws, both slices, and
    * the interval arithmetic.
    */
  def p164CropPairs(s: SparkSession, dir: String): DataFrame =
    Curation.contrastiveCrops(t(s, dir, "documents"), "doc_id", "text",
      minToks = 8)

  /** Distinct-n diversity card (p162): per source, the distinct-1/2/3
    * positional n-gram ratios ([[Curation.distinctNgramCard]]) — the
    * Li et al. 2016 diversity metric as a per-source card; the
    * template-mill signal that survives when each individual document
    * looks fine. The oracle replays the gram explode and both counts
    * per order.
    */
  def p162DistinctN(s: SparkSession, dir: String): DataFrame =
    Curation.distinctNgramCard(t(s, dir, "documents"), "source",
      "text", ns = Seq(1, 2, 3))

  /** Source dup rates (p151): which sources are template mills —
    * per source, how many docs sit in a near-dup cluster (p04 pairs
    * closed by CC) and how many a min-id cut would drop, with the
    * dup token mass. The triage card that points the crawler team at
    * the polluted feed instead of the whole corpus. Exact integers;
    * the oracle replays the closure and the per-source rollup.
    */
  def p151SourceDupRates(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cc = DedupStore.dedupDecisions(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    docs.select(col("doc_id"), col("source"),
        size(TF.tokens(col("text"))).cast("long").as("n_toks"))
      .join(cc.select(col("node").as("doc_id"), col("keep")),
        Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep").isNotNull, 1L).otherwise(0L))
          .as("n_clustered"),
        sum(when(col("keep") === 0, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("keep") === 0, col("n_toks")).otherwise(0L))
          .as("toks_dropped"))
      .withColumn("dup_rate_micro", call_function("div",
        col("n_clustered") * lit(1000000L), col("n_docs")))
  }

  /** Split leakage (p152): the dedup-before-split audit — near-dup
    * clusters (p04 pairs closed by CC) crossed with the p16
    * train/valid/test hash split; a cluster straddling two splits
    * leaks training text into evaluation. Reports, per split pair,
    * the straddling pair count, plus the cluster-level summary row
    * (`splits = 'ANY'`). The check every pretraining pipeline runs
    * AFTER splitting and BEFORE training. Exact integers; the oracle
    * replays the closure, the split hash, and both rollups.
    */
  def p152SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupStore.ngramJaccardPairs(docs, "doc_id", "text", k = 4,
        threshold = 0.4, maxShingleFreqFrac = Some(0.1))
      .select(col("doc_a"), col("doc_b"))
    val split = docs.select(col("doc_id"),
      (TF.hash60(concat(lit("split"), col("doc_id").cast("string")))
        % 100).as("h"))
      .select(col("doc_id"),
        when(col("h") < 80, "train").when(col("h") < 90, "valid")
          .otherwise("test").as("split"))
    val sp = pairs
      .join(split.select(col("doc_id").as("doc_a"),
        col("split").as("sa")), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"),
        col("split").as("sb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("s1"),
        greatest(col("sa"), col("sb")).as("s2"))
    val byPair = sp.groupBy("s1", "s2")
      .agg(count(lit(1)).as("n"))
      .select(concat(col("s1"), lit("|"), col("s2")).as("bucket"),
        col("n"))
    val cc = DedupStore.dedupDecisions(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    val summary = cc.join(split.select(col("doc_id").as("node"),
        col("split")), Seq("node"))
      .groupBy("component")
      .agg(countDistinct(col("split")).as("n_splits"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L))
          .as("n_straddling"))
    byPair.unionByName(summary.select(explode(array(
        struct(lit("clusters_total").as("bucket"),
          col("n_clusters").as("n")),
        struct(lit("clusters_straddling").as("bucket"),
          col("n_straddling").as("n")))).as("r"))
      .select(col("r.bucket"), col("r.n")))
  }

  /** Rate spikes (p150): robust event-rate anomaly detection over the
    * ingest telemetry ([[graft.operators.Sessionize.rateSpikes]]) —
    * hourly counts per event type flagged beyond median + 3·MAD of
    * that type's history, both medians exact inverted-CDF order
    * statistics. The monitor that catches a scraper gone hot or a
    * retry storm before it poisons the corpus. The oracle replays the
    * hourly counts, both medians, and the flag.
    */
  def p150RateSpikes(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.rateSpikes(Tables.events(s, dir), "ts",
      "event_type")

  /** Survivor policies (p149): close the p04 near-dup pairs into
    * clusters and compare the three survivor rules side by side
    * ([[Dedup.survivorPolicyCard]]) — min-id (reproducible default),
    * keep-longest (text-preserving), keep-best-quality
    * (training-value) — reporting dropped docs, token mass removed,
    * survivor quality mass, and how many clusters change survivor vs
    * min-id. The decision card before committing a dedup cut. The
    * oracle replays the closure, the three per-cluster argmaxes, and
    * every rollup.
    */
  def p149SurvivorPolicies(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupStore.ngramJaccardPairs(docs, "doc_id", "text", k = 4,
      threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    Dedup.survivorPolicyCard(scoredDocs(docs), "doc_id", "n_toks",
      "score_micro", pairs)
  }

  /** HDR quantiles (p148): the quantile member of the audited-sketch
    * triad ([[Curation.hdrQuantileCalibration]], p=3 → ≤12.5%
    * relative error) — doc-length p50/p90/p99 from HdrHistogram-style
    * log buckets beside the exact inverted-CDF percentiles, with
    * `est ≥ exact` a hard invariant. Fully integer (comparison-chain
    * log2, exact shifts); the oracle replays buckets, cumulative
    * sums, and thresholds.
    */
  def p148HdrQuantiles(s: SparkSession, dir: String): DataFrame =
    Curation.hdrQuantileCalibration(t(s, dir, "documents"), "doc_id",
      "text")

  /** Vocabulary growth (p147): the Heaps-law card — types, token
    * occurrences, and type/token ratio over hash-nested random
    * subcorpora at 1..16 sixteenths ([[Curation.vocabGrowth]]) — the
    * curve that sizes a tokenizer vocabulary and flags saturated
    * template corpora. The oracle replays the bucket hash, the
    * per-token min bucket, and every checkpoint sum.
    */
  def p147VocabGrowth(s: SparkSession, dir: String): DataFrame =
    Curation.vocabGrowth(t(s, dir, "documents"), "doc_id", "text")

  /** Bootstrap CI (p146): Efron percentile confidence interval for
    * BM25's MRR on the planted relevance
    * ([[Retrieval.bootstrapMrrCi]], 200 portable-hash resamples) —
    * the error bar that says how much to trust a 13-query scorecard
    * number, companion to the p136 significance test. The oracle
    * replays every resample draw and both order statistics.
    */
  def p146BootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", queries,
      "query_id", "qtext", k = 10)
    Retrieval.bootstrapMrrCi(ranked, queries.select(col("query_id")),
      "bm25", nBoot = 200, salt = "boot")
  }

  /** Packing efficiency (p145): per-source chunk bill of
    * concat-and-chunk packing vs naive pad-per-doc at 2048 tokens
    * ([[Curation.packingEfficiency]]) — the audit card that turns the
    * p32 packing choice into a number (saved chunks = saved GPU
    * hours). Exact integer ceilings and the portable floor-division.
    */
  def p145PackingEfficiency(s: SparkSession, dir: String): DataFrame =
    Curation.packingEfficiency(t(s, dir, "documents"), "source", "text",
      chunkToks = 2048L)

  /** PMI query expansion (p144): BM25 with each query term's top-PMI
    * right-collocate added at half weight
    * ([[Retrieval.bm25PmiExpandedTopK]], expansion source = the p116
    * top-100 collocation table), graded beside flat BM25 on the
    * planted-prefix relevance set — the scorecard answer to "does
    * automatic thesaurus expansion help or hurt on this corpus". One
    * row per method. On the synthetic corpus the card shows the
    * CLASSIC query-drift failure (the reason IR moved from thesaurus
    * expansion to weighted PRF): min-count-5 PMI favors RARE pairs,
    * so expansion terms carry far higher idf than the common prefix
    * terms they ride along with, and documents holding the collocate
    * leapfrog the source doc (MRR 0.136 → 0 at sf0.01, source docs
    * landing at ranks 17–216) — a regression in either direction
    * moves the card, which is the point. The oracle replays the PMI
    * table, the top-1 collocate window, the weighted score, and both
    * scorecards.
    */
  def p144PmiExpansion(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    val coll = Curation.pmiCollocations(docs, "doc_id", "text",
      minCount = 5L, topK = 100)
    val base = Retrieval.bm25TopK(docs, "doc_id", "text", queries,
      "query_id", "qtext", k = 10)
    val expd = Retrieval.bm25PmiExpandedTopK(docs, "doc_id", "text",
      queries, "query_id", "qtext", coll, k = 10)
    Retrieval.rankingScorecard(base, "bm25", 10)
      .unionByName(Retrieval.rankingScorecard(expd, "bm25_pmi", 10))
  }

  /** Feature selection (p143): per-token χ² association between token
    * presence and the funnel label ([[Curation.chiSquareFeatures]],
    * wordSalad profile as p81/p117/p139), top-50 — which surface
    * features the weak labels key on, and the order a trimmed-vocab
    * classifier should admit tokens in. Pure rational arithmetic (no
    * libm): cells and both χ² factors exact int64, one fixed-order
    * IEEE double ratio at the end. The oracle replays the funnel, the
    * presence counts, and the same op order.
    */
  def p143ChiSquare(s: SparkSession, dir: String): DataFrame =
    Curation.chiSquareFeatures(t(s, dir, "documents"), "doc_id", "text",
      topK = 50, profile = Curation.GateProfile.wordSalad)

  /** Detector agreement (p142): Adjusted Rand Index
    * ([[graft.operators.RandIndex]]) between the two text near-dup
    * detectors' dedup partitions — 4-gram-Jaccard connected
    * components (p37) vs SimHash components (p03 pairs closed the
    * same way), with every unclustered doc a singleton. The
    * partition-level answer to "would swapping detectors change the
    * dedup decisions", chance-corrected; ARI 10⁶ = identical
    * partitions, 0 = chance. The oracle replays both exhaustive pair
    * scans, both recursive closures, and the exact pair-count sums.
    */
  def p142DetectorAgreement(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ids = docs.select(col("doc_id"))
    def partition(pairs: DataFrame): DataFrame = {
      val cc = graft.operators.ConnectedComponents.components(
        pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      ids.join(cc, ids("doc_id") === cc("node"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster"))
    }
    val pa = partition(DedupStore.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1)))
    val pb = partition(DedupStore.simhashPairs(docs, "doc_id", "text",
      bits = 64, segments = 4, maxHamming = 2))
    graft.operators.RandIndex.adjustedRand(pa, "doc_id", "cluster",
      pb, "doc_id", "cluster")
  }

  /** Near-dup clique structure (p141): degree-ordered triangle
    * counting ([[graft.operators.Triangles]]) over the p04/p138
    * near-dup graph — a high-triangle neighborhood is a mutual-copy
    * template family (every member resembles every other: safe to
    * collapse to one survivor), a zero-triangle star is one hub doc
    * with many unrelated partial overlaps (the shape to review before
    * a cut). One row per non-isolated doc: (doc_id, degree,
    * tri_count). The oracle replays the exhaustive pair scan, the
    * (degree, id) orientation, and the wedge-close joins.
    */
  def p141Triangles(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupStore.ngramJaccardPairs(docs, "doc_id", "text", k = 4,
      threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    graft.operators.Triangles.perNode(pairs, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("degree"), col("tri_count"))
  }

  /** Clustering quality (p140): the elbow card — exact-integer
    * inertia, mean simplified silhouette, and occupied-cell count for
    * three k-means fits of the embedding corpus at k ≈ n/50, n/25,
    * n/10 ([[Similarity.clusterQualityCard]], 2 Lloyd rounds each) —
    * the card a curator reads before committing a semantic-dedup or
    * domain-clustering k. The oracle refits all three k-means chains
    * and replays the integer metrics bit-for-bit.
    */
  def p140ClusterQuality(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterQualityCard(t(s, dir, "embeddings"), "vec_id",
      "embedding", moduli = Seq(50, 25, 10), iters = 2)

  /** WordPiece encode (p137): tokenize the corpus with the p118
    * WordPiece-trained merge table — completing the train+encode
    * matrix across all three tokenizer families (BPE p71/p75, unigram
    * p87/p88, WordPiece p118/p137). Encoding is the same broadcast
    * dictionary join as BPE's ([[Bpe.encodeWith]]), against the
    * [[graft.pipeline.TokenizerStore]]-registered artifact (trained
    * once per session, never per consumer); the oracle replays
    * the training trajectory with the likelihood-ratio winner and
    * joins the final segmentation back to every word position.
    */
  def p137WordpieceEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (_, vocab) = graft.pipeline.TokenizerStore
      .wordPiece(docs, dir, "text", nMerges = 100)
    Bpe.encodeWith(docs, "doc_id", "text", vocab)
  }

  def p136Significance(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val qIds = Retrieval.plantedSample(docs, "doc_id")
      .select(col("doc_id").as("query_id"))
    val ranked = sharedRankings(s, dir).toMap
    val base = Retrieval.perQueryNdcg(ranked("bm25f"), qIds, topK = 10)
      .select(col("query_id"), col("m").as("m_a"))
    Seq("bm25", "ql", "prf", "rrf").map { meth =>
      val other = Retrieval.perQueryNdcg(ranked(meth), qIds, topK = 10)
        .select(col("query_id"), col("m").as("m_b"))
      Retrieval.pairedSignificance(base.join(other, Seq("query_id")),
        s"bm25f_vs_$meth", nPerms = 200, salt = "sig")
    }.reduce(_.unionByName(_))
  }

  /** Search snippets (p133): for each query's BM25 top-3 documents,
    * the 8-token window holding the most query-term occurrences
    * ([[Retrieval.snippets]]) — the display stage of the search
    * stack, and the purely positional consumer of the token sequence
    * (start positions, a range-frame window count, an integer
    * argmax). The oracle replays the candidate prune, the positional
    * match join, the window count, and the tie-broken argmax.
    */
  def p133Snippets(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", queries,
      "query_id", "qtext", k = 10)
    Retrieval.snippets(docs, "doc_id", "text", ranked, queries,
      "query_id", "qtext", topDocs = 3, windowTokens = 8)
  }

  /** Proximity-boosted retrieval (p134): the p112 BM25 top-10
    * re-ranked with the pairwise term-proximity factor
    * ([[Retrieval.proximityRerank]]) — `10⁶ div (minPairDist + 4)`
    * for the closest pair of DISTINCT matched query terms, added to
    * the bm25 score; adjacent phrase-like occurrences float to the
    * top without requiring a verbatim phrase (the soft sibling of
    * p131's exact-phrase boost). The oracle replays the positional
    * pair scan and the integer combination.
    */
  def p134Proximity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    Retrieval.proximityRerank(docs, "doc_id", "text", queries,
      "query_id", "qtext", k = 10, k0 = 4)
  }

  /** Spell suggestion (p135): deterministic misspellings (second
    * character deleted from every 5th-by-hash frequent token) repaired
    * against the corpus vocabulary by exact Levenshtein over
    * char-bigram-index candidates ([[Retrieval.spellSuggest]]) — the
    * "did you mean" stage. The oracle rebuilds the probes, the bigram
    * index, and the tie-broken argmin with its own levenshtein.
    */
  def p135SpellSuggest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val probes = docs.select(explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 20 && length(col("tok")) >= 4 &&
        TF.hash60(col("tok")) % 5 === 0)
      .select(concat(substring(col("tok"), 1, 1),
        expr("substring(tok, 3)")).as("probe"))
      .distinct()
    Retrieval.spellSuggest(docs, "doc_id", "text", probes, "probe",
      minCount = 5, maxDist = 2)
  }

  /** Fielded BM25F retrieval (p132): the p112 queries ranked with the
    * simple-BM25F weighted-field index ([[Retrieval.bm25fIndex]]) —
    * title = the first 8 tokens at weight 3, body = the rest at
    * weight 1. The prefix queries live in the title region, so
    * up-weighting it sharpens the source-doc ranking (visible in the
    * p130 card's bm25f row). The oracle rebuilds the weighted
    * postings/lengths and replays the shared scoring formula.
    */
  def p132Bm25f(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = TF.tokens(col("text"))
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    Retrieval.bm25fTopK(docs, "doc_id",
      Seq((slice(toks, 1, 8), 3L),
        (slice(toks, lit(9), size(toks)), 1L)),
      queries, "query_id", "qtext", k = 10)
  }

  /** Phrase-boosted retrieval (p131): the p112 BM25 candidates
    * re-ranked with exact-phrase containment first
    * ([[Retrieval.phraseRerank]]) — each query is a verbatim 4-token
    * prefix of its source document, so the source doc (and any doc
    * quoting the same 4-gram) carries `phrase_hit = 1` and jumps the
    * bag-of-words ranking. The oracle replays the BM25 chain, the
    * 4-gram hash containment, and the re-rank window.
    */
  def p131PhraseRerank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
    Retrieval.phraseRerank(docs, "doc_id", "text", queries, "query_id",
      "qtext", k = 10)
  }

  /** HyperLogLog calibration (p128): per-source 64-register HLL over
    * the 3-gram hash stream beside the exact distinct count
    * ([[Curation.hllCalibration]]) — constant-memory cardinality with
    * its error audited in place. The harmonic mean is an EXACT
    * integer sum (2⁵⁵-scaled), ρ comes from a comparison chain (no
    * floating log₂), so the oracle rebuilds the identical registers
    * and estimate.
    */
  def p128Hll(s: SparkSession, dir: String): DataFrame =
    Curation.hllCalibration(t(s, dir, "documents"), "doc_id", "text",
      "source", k = 3)

  /** Domain drift (p126): per-source KL divergence of the smoothed
    * unigram distribution from the corpus-wide mixture in integer
    * nano-nats ([[Curation.domainDrift]]) — the card that ranks
    * domains by vocabulary distinctiveness, the signal behind domain
    * weighting and snapshot drift monitors. The oracle replays the
    * count tables, the shared smoothing, and the per-term nano
    * floors.
    */
  def p126DomainDrift(s: SparkSession, dir: String): DataFrame =
    Curation.domainDrift(t(s, dir, "documents"), "doc_id", "text",
      "source")

  /** Dedup threshold sweep (p125): the tuning card a curation run
    * reads BEFORE committing a near-dup threshold — for J ∈ {0.40,
    * 0.90, 0.96, 0.98} (the planted pairs cluster above 0.88, so the
    * high band is where this corpus's curve bends), the surviving
    * pair count, cluster count, and
    * doc/token mass min-id canonicalization would remove. The
    * expensive work happens ONCE: the exact-scored pair set at the
    * loosest threshold (p04's proven-prune configuration) feeds every
    * row; per threshold only a filter + star-contraction closure over
    * the (tiny) qualifying edge set runs. The oracle replays the
    * exhaustive pair scan and FOUR recursive-CTE closures.
    */
  def p125DedupSweep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupStore.ngramJaccardPairs(docs, "doc_id", "text", k = 4,
      threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    val toks = docs.select(col("doc_id"),
      size(TF.tokens(col("text"))).cast("long").as("n_toks"))
    def row(tPct: Int): DataFrame = {
      val keep = pairs.filter(col("jaccard_micro") >= tPct * 10000L)
      val dec = ConnectedComponents.dedupDecisions(
        keep.select(col("doc_a").as("u"), col("doc_b").as("v")))
      dec.join(toks, col("node") === col("doc_id"))
        .agg(count(lit(1)).as("n_docs_in_clusters"),
          sum(col("keep")).as("n_clusters"),
          sum(when(col("keep") === 0, 1L).otherwise(0L))
            .as("n_docs_removed"),
          sum(when(col("keep") === 0, col("n_toks")).otherwise(0L))
            .as("toks_removed"))
        .crossJoin(broadcast(keep.agg(count(lit(1)).as("n_pairs"))))
        .select(lit(tPct.toLong).as("threshold_pct"), col("n_pairs"),
          col("n_clusters"), col("n_docs_in_clusters"),
          col("n_docs_removed"), col("toks_removed"))
    }
    Seq(40, 90, 96, 98).map(row).reduce(_.unionByName(_))
  }

  /** Classifier calibration (p124): the reliability diagram for the
    * p117 logistic-regression scorer — fixed 0.4-logit margin buckets,
    * the predicted probability at each bucket center vs the empirical
    * positive rate inside it ([[Curation.calibrationReport]]). The
    * check before classifier margins become SAMPLING WEIGHTS rather
    * than an argmax. The oracle refits the classifier trajectory and
    * replays the bucketing, the single sigmoid per bucket, and the
    * exact rates.
    */
  def p124Calibration(s: SparkSession, dir: String): DataFrame =
    Curation.calibrationReport(
      Curation.logisticRegression(t(s, dir, "documents"), "doc_id",
        "text", buckets = 64, iters = 12, lrDen = 1,
        profile = Curation.GateProfile.wordSalad),
      "z_micro", "cls", bucketMicro = 400000L)

  /** Document feature store (p123): ONE wide row per document joining
    * every per-doc quality signal the engine computes — composite
    * score, predicted language, repetition fractions, char/token
    * entropy, KN perplexity, memorization risk — the materialized
    * feature table a curation run writes once and every downstream
    * policy (gates, caps, mixtures, curricula) reads instead of
    * re-deriving its own signals. Each branch keeps its own optimal
    * plan (broadcast model tables, gram-hash shuffles, zero-exchange
    * projections); the assembly is doc-id equi-joins that AQE
    * co-plans. The oracle composes the component replays as CTEs, so
    * a pass re-certifies every signal AND the join.
    */
  def p123DocFeatures(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(scoredDocs(docs).select(col("doc_id"),
        col("n_toks").cast("long").as("n_toks"), col("score_micro")),
        Seq("doc_id"))
      .join(p08LangId(s, dir).select(col("doc_id"), col("lang_pred")),
        Seq("doc_id"))
      .join(p20Repetition(s, dir).select(col("doc_id"),
        col("dup_3gram_frac"), col("top_word_frac")), Seq("doc_id"))
      .join(Curation.entropyStats(docs, "doc_id", "text")
        .select(col("doc_id"), col("chars_entropy_micro"),
          col("toks_entropy_micro")), Seq("doc_id"))
      .join(Curation.knBigramLogLoss(docs, "doc_id", "text",
          vocabSize = 500)
        .select(col("doc_id"), col("avg_nll_micro")), Seq("doc_id"))
      .join(Curation.memorizationRisk(docs, "doc_id", "text", L = 8)
        .select(col("doc_id"),
          col("dup_frac_micro").as("mem_risk_micro")), Seq("doc_id"))
  }

  /** Iterated DoReMi (p110): the p92 update applied once more —
    * round-1 weights become capped acceptance rates, the corpus
    * resamples deterministically, the KN reference refits, and
    * round-2 weights land next to round 1
    * ([[Curation.domainMixIterate]]). The oracle replays BOTH refits
    * and the resample in one statement via the prefixed CTE chain.
    */
  def p110DomainMixIter(s: SparkSession, dir: String): DataFrame =
    Curation.domainMixIterate(t(s, dir, "documents"), "doc_id", "text",
      "source", vocabSize = 500)

  /** Zipf fit (p109): least-squares slope/intercept/R² of
    * ln(freq) vs ln(rank) over the top-500 vocabulary — the
    * dataset-card statistic that flags synthetic or templated corpora
    * (natural language sits near slope −1; this 31-token fixture will
    * not, which is exactly the point of reporting it). Determinism:
    * the log points are floored to MILLI-nat integers first, all
    * sums are exact int64 (bounds chosen so n·Σxy stays < 2⁶³), and
    * the slope/intercept/R² divisions are single IEEE double ops on
    * identical integers — no cross-row double accumulation anywhere.
    */
  def p109ZipfFit(s: SparkSession, dir: String): DataFrame =
    Curation.zipfFit(t(s, dir, "documents"), "text", topK = 500)

  /** LSH recall sweep (p108): banded-candidate recall vs the
    * exhaustive Jaccard truth at thresholds 30–70%
    * ([[Dedup.lshRecallSweep]]) — the measured curve behind the
    * 1−(1−J^r)^b theory that picks (bands, rows) before a production
    * dedup. The oracle replays signatures, banding, truth, and the
    * per-threshold division.
    */
  def p108LshRecallSweep(s: SparkSession, dir: String): DataFrame =
    // calibration runs on an ABSOLUTE-budget sample (≈256 docs at any
    // SF): the truth side is a brute-force pair scan, so a fixed
    // fraction would grow quadratically with the corpus while the
    // bounded sample keeps truth cost constant; content-keyed
    // (independent-MinHash) striding keeps near-dup pairs together at
    // rate ∝ J/m — the pairs whose recall the sweep exists to measure
    Dedup.lshRecallSweep(
      Dedup.boundedCalibrationSample(t(s, dir, "documents"), "doc_id",
        "text", k = 3, budgetDocs = 256),
      "doc_id", "text", k = 3, numHashes = 12, bands = 6,
      thresholdsPct = Seq(30, 40, 50, 60, 70))

  /** Dedup impact card (p107): the dataset-card rollup of the p37
    * clustering — per cluster-size bucket (2, 3-4, 5-8, 9+), how many
    * clusters exist, how many documents they hold, how many docs and
    * how many TOKENS min-id canonicalization removes. The number a
    * curation run reports before committing the dedup ("X% of tokens
    * were near-duplicate mass"). Rides the p37 pair join + the
    * logarithmic star contraction; the token counts join on the
    * cluster members only.
    */
  def p107DedupImpact(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val dec = DedupStore.dedupDecisions(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    val toks = docs.select(col("doc_id"),
      size(TF.tokens(col("text"))).cast("long").as("n_toks"))
    val per = dec.join(toks, col("node") === col("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        sum(when(col("keep") === 0, col("n_toks")).otherwise(0L))
          .as("toks_removed"))
    per.withColumn("bucket",
        when(col("cluster_size") === 2, "2")
          .when(col("cluster_size") <= 4, "3-4")
          .when(col("cluster_size") <= 8, "5-8")
          .otherwise("9+"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("cluster_size") - 1).as("n_docs_removed"),
        sum(col("toks_removed")).as("toks_removed"))
  }

  /** Embedding-free near-dup at scale (p106): the IVF probe path
    * over p100's derived vectors — every 10th document plays the
    * incoming batch, probes 3 of the hashed-vector corpus cells, and
    * emits corpus neighbors at cosine ≥ 0.5. The full text→vector→
    * cell-bounded-pair chain with no embedding model and no
    * all-pairs scan; the streaming twin runs the identical plan per
    * micro-batch with per-ROW vector construction.
    */
  def p106TextNearDup(s: SparkSession, dir: String): DataFrame = {
    val TFx = graft.pipeline.TextFunctions
    val vecs = Similarity.hashedDocVectors(t(s, dir, "documents"),
        "doc_id", TFx.shingles(TFx.tokens(col("text")), 3), dim = 128)
      .filter(Similarity.l2norm(col("embedding")) > 0)
    Similarity.ivfProbePairs(vecs.filter(col("doc_id") % 10 === 7), vecs,
      "doc_id", "embedding", centroidFilter = col("doc_id") % 25 === 0,
      nprobe = 3, thresholdMicro = 500000L)
  }

  /** b-bit minhash calibration (p104): p02's index and verify, but
    * each pair also carries the Jaccard ESTIMATE from 2-bit truncated
    * minhashes and its absolute error vs the exact value
    * ([[Dedup.bbitMinhashEstimate]]) — 30× sketch compression audited
    * in place. The oracle replays the signatures, the banded
    * candidates, the truncated match count, and the collision-floor
    * correction.
    */
  def p104BbitMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.bbitMinhashEstimate(t(s, dir, "documents"), "doc_id", "text",
      k = 3, numHashes = 12, bands = 6, b = 2, threshold = 0.5)

  /** Embedding-free near-dup (p100): feature-hashed 128-dim document
    * vectors over word 3-SHINGLES ([[Similarity.hashedDocVectors]] —
    * exact integer signed counts; unigram features would be useless
    * on this 31-token shared vocabulary, where median pairwise
    * token-set Jaccard is 0.63) scored pairwise by cosine at ≥ 0.5 —
    * semantic-ish dedup over the documents table with NO embedding
    * model, the p07 twin on derived vectors. The threshold cleanly
    * separates the planted near-dups (all ≥ 0.9) from the background
    * (p99 ≈ 0.21). Zero-norm (shorter than one shingle) docs are
    * excluded before any division. Brute force at this SF; the
    * vectors are an ordinary embedding column, so the banded/LSH/IVF
    * family is the scale path.
    */
  def p100HashedNearDup(s: SparkSession, dir: String): DataFrame = {
    val TFx = graft.pipeline.TextFunctions
    val v = Similarity.hashedDocVectors(t(s, dir, "documents"), "doc_id",
      TFx.shingles(TFx.tokens(col("text")), 3), dim = 128)
    val a = v.repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id").as("doc_a"), col("embedding").as("ea"),
        Similarity.l2norm(col("embedding")).as("na"))
      .filter(col("na") > 0)
    val b = v.select(col("doc_id").as("doc_b"), col("embedding").as("eb"),
        Similarity.l2norm(col("embedding")).as("nb"))
      .filter(col("nb") > 0)
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("sim", Similarity.dotOverNorms(col("ea"), col("eb"),
        col("na"), col("nb")))
      .filter(col("sim") >= 0.5)
      .select(col("doc_a"), col("doc_b"),
        floor(col("sim") * 1e6).cast("long").as("sim_micro"))
  }

  /** Tokenizer fertility scorecard (p99): chars-per-token by
    * (tokenizer, language) for the whitespace splitter, the BPE-ish
    * regex pre-tokenizer, and the TRAINED unigram tokenizer (p87's
    * vocab via the p88 dictionary join) — the standard fertility
    * audit run before committing a tokenizer to a corpus mix (a
    * tokenizer that fragments one language inflates its effective
    * cost). Exact integer arithmetic: `chars·1e6 div tokens`. The
    * oracle replays the full unigram train for its row family.
    */
  def p99TokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def base(name: String,
        tokCount: org.apache.spark.sql.Column): DataFrame =
      docs.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(tokCount.cast("long")).as("n_tokens"))
        .select(lit(name).as("tokenizer"), col("lang"), col("n_docs"),
          col("n_chars"), col("n_tokens"),
          expr("(n_chars * 1000000) div n_tokens").as("fertility_micro"))
    val ws = base("whitespace",
      size(graft.pipeline.TextFunctions.tokens(col("text"))))
    val bp = base("bpe_pre",
      size(graft.pipeline.TextFunctions.bpeTokens(col("text"))))
    val seg = graft.pipeline.Unigram.train(docs, "text", vocabSize = 60,
      maxLen = 4, iters = 2)
    val uniTok = docs
      .select(col("lang"),
        explode(graft.pipeline.TextFunctions.tokens(col("text")))
          .as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(seg.select(col("word"),
        size(col("pieces")).cast("long").as("np"))), Seq("word"))
      .groupBy(col("lang")).agg(sum(col("np")).as("n_tokens"))
    val uni = docs.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .join(uniTok, Seq("lang"))
      .select(lit("unigram").as("tokenizer"), col("lang"), col("n_docs"),
        col("n_chars"), col("n_tokens"),
        expr("(n_chars * 1000000) div n_tokens").as("fertility_micro"))
    ws.unionByName(bp).unionByName(uni)
  }

  /** Tokenized-shard offset index (p98): the Megatron-style `.idx`
    * beside p86's manifest — per document its shard, in-shard
    * position, and exact token offset under end-to-end layout with
    * one EOS per doc. Same deterministic shard order as p31/p86, so
    * a pass certifies index ≡ manifest layout.
    */
  def p98ShardOffsets(s: SparkSession, dir: String): DataFrame =
    Curation.shardOffsets(t(s, dir, "documents"), "doc_id", "text",
      nShards = 8)

  /** Rotated PQ (p97): p49's full compressed scan over vectors
    * re-expressed through the deterministic signed permutation
    * ([[Similarity.rotateVec]]) — each subspace quantizes a
    * hash-random subset of the original dims instead of a contiguous
    * block, the zero-cost member of the OPQ rotation family. The
    * oracle applies the identical literal permutation and replays the
    * same ADC chain; the scorecard row measures recall against the
    * UNROTATED exact truth (valid because the transform is exactly
    * orthogonal). On the i.i.d. synthetic fixture the row lands at
    * PARITY with p49 by construction — uniform coordinates have no
    * energy concentration to redistribute (same cap as p73's recall
    * note); the operator earns its keep on learned embeddings.
    */
  def p97RotPq(s: SparkSession, dir: String): DataFrame =
    p97RotPqOn(t(s, dir, "embeddings"))
  private def p97RotPqOn(emb: DataFrame): DataFrame = {
    val rot = emb.select(col("vec_id"),
      Similarity.rotateVec(col("embedding"), 64, "q97").as("embedding"))
    Similarity.pqTopK(rot, rot.filter(col("vec_id") < 20), "vec_id",
      "embedding", m = 4, dim = 64, centroidFilter = col("vec_id") < 8,
      k = 5)
  }

  /** Ingest-time embedding near-dup, batch view
    * ([[Similarity.ivfProbePairs]] — the vector analogue of
    * stream-neardup-verified): every 10th vector plays the incoming
    * batch (vec_id % 10 = 7), probes 3 of the 20 corpus cells, and
    * every corpus neighbor at cosine ≥ 0.2 emits. The streaming twin
    * ([[graft.streaming.StreamingJobs.embeddingNearDup]]) runs the
    * SAME plan per micro-batch — the incoming side is stateless by
    * construction (plan-time-folded centroid scores, no groupBy).
    */
  def p76EmbedIngest(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfProbePairs(emb.filter(col("vec_id") % 10 === 7), emb,
      "vec_id", "embedding", centroidFilter = col("vec_id") % 25 === 0,
      nprobe = 3, thresholdMicro = 200000L)
  }

  /** Stratified sample: exactly 10 docs per source in portable-hash
    * order — the seedless draw any engine reproduces row-for-row.
    */
  def p23StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(t(s, dir, "documents"), "source", "doc_id",
        quota = 10)
      .select(col("doc_id"), col("source"), col("rank"))

  /** Token-budget mix: each source sampled down to a 700-token budget
    * by the exact cumulative-window rule.
    */
  def p24TokenBudget(s: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetMix(t(s, dir, "documents"), "source", "doc_id",
        "text", budget = 700L)
      .select(col("doc_id"), col("source"), col("n_toks"), col("cum_toks"))

  /** Benchmark decontamination: every 20th doc plays the eval set;
    * report train docs sharing >= 2 distinct word 3-shingles with any
    * benchmark doc.
    */
  def p25Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Curation.contaminationPairs(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", k = 3, minShared = 2)
  }

  /** Int8 embedding quantization: per-vector symmetric scale +
    * quantized-vector checksums (sum/min/max — scalars so the oracle
    * compare avoids array-rendering differences).
    */
  def p18Quantize(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .withColumn("scale", Similarity.quantScale(col("embedding")))
      .withColumn("q", Similarity.quantize(col("embedding"), col("scale")))
    e.select(
      col("vec_id"),
      floor(col("scale") * 1e6).cast("long").as("scale_micro"),
      aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
      array_min(col("q")).as("q_min"),
      array_max(col("q")).as("q_max"))
  }

  // ---------------------------------------------------------------- wiring

  /** Lazy pre-checkpoint plan builders for the checkpoint-backed
    * detectors. [[graft.core.Caching.withCached]] returns an opaque
    * LogicalRDD, so fingerprinting the public query's frame reads as
    * `{shuffles:0, broadcasts:0}` — exactly no signal for the most
    * expensive plans. Bench consults this map instead: same inputs,
    * same parameters as the declared query, but the lazy `*Plan`
    * split-out, so the BENCH artifact carries real exchange counts.
    * (PlansSpec pins the same shapes in CI; this mirrors them into the
    * per-round artifact.) Building p40/p46's plans runs their closure
    * jobs eagerly — acceptable because Bench fingerprints after the
    * per-query clock stops.
    *
    * Reading the counts: the lazy tree is UNCACHED, so a shared
    * intermediate (the shingle frame, the inverted index, the exact
    * top-k) appears once per consumer and its exchanges are counted
    * per appearance — the executed query materializes each exactly
    * once via its cache bracket. The fingerprint is a plan-shape
    * regression signal, not an executed-exchange count.
    */
  def benchPlans: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p173_ltr_rerank" -> ((s, dir) => {
      // lazy twin: the feature plan + scorecard with fixed weights
      // (the public query checkpoints the feature frame and trains
      // eagerly; plan SHAPE is what the fingerprint needs)
      val docs = t(s, dir, "documents")
      val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
      val feats = graft.pipeline.Ltr.rankFeatures(docs, "doc_id",
        "text", queries, "query_id", "qtext", k = 10)
      Retrieval.rankingScorecard(
        graft.pipeline.Ltr.rerank(feats, (0L, 0L, 0L, 0L)), "ltr",
        topK = 10)
    }),
    "p02_minhash_lsh" -> ((s, dir) => {
      val docs = Dedup.minhashDocs(t(s, dir, "documents"), "doc_id",
        "text", k = 3, numHashes = 12)
      Dedup.minhashPlan(docs, bands = 6, rows = 2, threshold = 0.5)
    }),
    "p122_residual_pq" -> ((s, dir) =>
      p122ResidualPqPlan(s, hierEmbeddings(s, dir))),
    "p04_ngram_jaccard" -> ((s, dir) => {
      val docs = Dedup.shingled(t(s, dir, "documents"), "doc_id", "text", k = 4)
      val inv = Dedup.invIndex(docs, None, maxShingleFreqFrac = Some(0.1))
      Dedup.ngramJaccardPlan(docs, inv, threshold = 0.4)
    }),
    "p27_containment" -> ((s, dir) => {
      val docs = Dedup.shingled(t(s, dir, "documents"), "doc_id", "text", k = 4)
      val inv = Dedup.invIndex(docs, None, maxShingleFreqFrac = Some(0.1))
      Dedup.containmentPlan(docs, inv, threshold = 0.5)
    }),
    "p40_semantic_dedup" -> ((s, dir) => {
      val cells = Similarity.semanticCells(t(s, dir, "embeddings"),
        "vec_id", "embedding", centroidFilter = col("vec_id") % 25 === 0)
      Similarity.semanticDedupPlan(cells, threshold = 0.4)
    }),
    "p46_merge_clusters" -> ((s, dir) => {
      val pairs = Curation.winnowPairs(t(s, dir, "documents"), "doc_id",
          "text", k = 3, w = 4, minShared = 3)
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
      val assignment = ConnectedComponents.components(
        pairs.filter((col("u") + col("v")) % 2 === 0))
      ConnectedComponents.merge(assignment,
        pairs.filter((col("u") + col("v")) % 2 =!= 0))
    }),
    "p56_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      annRecallPlan(emb,
        p05CosineTopKOn(emb).select("query_id", "cand_id", "rank"))
    }),
    "p68_unigram_lm" -> ((s, dir) =>
      Curation.unigramLogLossPlan(
        Curation.tokenOccurrences(t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", vocabSize = 500)),
    "p81_nb_classifier" -> ((s, dir) => {
      val labels = Curation.funnelLabels(t(s, dir, "documents"), "doc_id",
        "text", profile = Curation.GateProfile.wordSalad)
      Curation.nbClassifierPlan(
        labels.select(col("doc_id"), col("cls"),
          explode(graft.pipeline.TextFunctions.tokens(col("text")))
            .as("tok")),
        "doc_id", vocabSize = 500)
    }),
    "p82_bigram_lm" -> ((s, dir) =>
      Curation.bigramLogLossPlan(
        Curation.bigramOccurrences(t(s, dir, "documents"), "doc_id",
          "text"),
        "doc_id", vocabSize = 500, minBigramCount = 1L)),
    "p89_kn_bigram" -> ((s, dir) =>
      Curation.knBigramLogLossPlan(
        Curation.bigramOccurrences(t(s, dir, "documents"), "doc_id",
          "text"),
        "doc_id", vocabSize = 500, minBigramCount = 1L)),
    "p92_domain_mix" -> ((s, dir) =>
      Curation.domainMixWeightsPlan(
        Curation.bigramOccurrences(t(s, dir, "documents"), "doc_id",
          "text", carry = Seq("source")),
        t(s, dir, "documents").groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs")),
        "source", vocabSize = 500)),
    "p90_dsir" -> ((s, dir) => {
      val labels = Curation.funnelLabels(t(s, dir, "documents"), "doc_id",
        "text", profile = Curation.GateProfile.wordSalad)
      Curation.dsirPlan(
        labels.select(col("doc_id"), col("cls"),
          explode(Curation.dsirBuckets(col("text"), 512)).as("bucket")),
        "doc_id", buckets = 512, k = 100)
    }),
    "p84_classifier_audit" -> ((s, dir) => {
      val labels = Curation.funnelLabels(t(s, dir, "documents"), "doc_id",
        "text", carry = Seq("source"),
        profile = Curation.GateProfile.wordSalad)
      classifierAuditRollup(Curation.nbClassifierPlan(
        labels.select(col("doc_id"), col("source"), col("cls"),
          explode(graft.pipeline.TextFunctions.tokens(col("text")))
            .as("tok")),
        "doc_id", vocabSize = 500, carry = Seq("source")))
    }),
    "p112_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
      val index = Retrieval.bm25Index(docs, "doc_id", "text")
      val qT = Retrieval.queryTerms(queries, "query_id", "qtext")
      val hits = index.postings.join(
        broadcast(qT.select("tok").distinct()), Seq("tok"))
      Retrieval.rankTopK(
        Retrieval.bm25ScoresFromHits(index, hits, qT,
          Retrieval.Bm25Params()), k = 10)
    }),
    "p177_passage_retrieval" -> ((s, dir) => {
      // lazy twin of the chunk-index MaxP side (the public query's two
      // bm25TopK calls checkpoint their hit frames)
      val base = t(s, dir, "documents")
      val docs = longDocFixture(base)
      val queries = Retrieval.plantedSample(base, "doc_id")
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TF.tokens(col("text")), 1, 8)).as("qtext"))
      val chunks = Curation.chunkDocuments(docs, "doc_id", "text",
          chunkToks = 32, strideToks = 24)
        .select((col("doc_id") * 10000L + col("chunk_seq"))
          .as("chunk_id"), col("chunk_text"))
      val index = Retrieval.bm25Index(chunks, "chunk_id", "chunk_text")
      val qT = Retrieval.queryTerms(queries, "query_id", "qtext")
      val hits = index.postings.join(
        broadcast(qT.select("tok").distinct()), Seq("tok"))
      val ranked = Retrieval.rankTopK(
        Retrieval.bm25ScoresFromHits(index, hits, qT,
          Retrieval.Bm25Params()), k = 10)
      Retrieval.rankingScorecard(ranked
        .select(col("query_id"), col("rank"),
          call_function("div", col("doc_id"), lit(10000L)).as("doc_id")),
        "chunk_maxp_lazy", topK = 10)
    }),
    "p132_bm25f" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = TF.tokens(col("text"))
      val queries = Retrieval.plantedQueries(docs, "doc_id", "text")
      val index = Retrieval.bm25fIndex(docs, "doc_id",
        Seq((slice(toks, 1, 8), 3L), (slice(toks, lit(9), size(toks)), 1L)))
      val qT = Retrieval.queryTerms(queries, "query_id", "qtext")
      val hits = index.postings.join(
        broadcast(qT.select("tok").distinct()), Seq("tok"))
      Retrieval.rankTopK(
        Retrieval.bm25ScoresFromHits(index, hits, qT,
          Retrieval.Bm25Params()), k = 10)
    }),
    "p113_auc" -> ((s, dir) => {
      val labels = Curation.funnelLabels(t(s, dir, "documents"), "doc_id",
        "text", profile = Curation.GateProfile.wordSalad)
      Curation.rocAuc(Curation.nbClassifierPlan(
        labels.select(col("doc_id"), col("cls"),
          explode(graft.pipeline.TextFunctions.tokens(col("text")))
            .as("tok")),
        "doc_id", vocabSize = 500), "llr_micro", "cls")
    }),
    "p155_pr_auc" -> ((s, dir) => {
      val labels = Curation.funnelLabels(t(s, dir, "documents"), "doc_id",
        "text", profile = Curation.GateProfile.wordSalad)
      Curation.averagePrecision(Curation.nbClassifierPlan(
        labels.select(col("doc_id"), col("cls"),
          explode(graft.pipeline.TextFunctions.tokens(col("text")))
            .as("tok")),
        "doc_id", vocabSize = 500), "llr_micro", "cls")
    }),
    "p114_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.perplexityBucketsPlan(
        Curation.knBigramLogLossPlan(
          Curation.bigramOccurrences(docs, "doc_id", "text"),
          "doc_id", vocabSize = 500, minBigramCount = 1L),
        docs.select(col("doc_id"), col("lang")), "doc_id", "lang")
    }),
    "p116_pmi" -> ((s, dir) =>
      Curation.pmiCollocationsPlan(
        Curation.bigramOccurrences(t(s, dir, "documents"), "doc_id",
          "text"),
        minCount = 5L, topK = 100)),
    "p117_lr_classifier" -> ((s, dir) => {
      val labels = Curation.funnelLabels(t(s, dir, "documents"), "doc_id",
        "text", profile = Curation.GateProfile.wordSalad)
      Curation.logisticRegressionPlan(
        labels.select(col("doc_id"), col("cls"),
          explode(array_distinct(transform(
            graft.pipeline.TextFunctions.tokens(col("text")),
            tk => graft.pipeline.TextFunctions.hash60(tk) % 64)))
            .as("bucket")),
        "doc_id", iters = 12, lrDen = 1)
    }),
    "p124_calibration" -> ((s, dir) => {
      val labels = Curation.funnelLabels(t(s, dir, "documents"), "doc_id",
        "text", profile = Curation.GateProfile.wordSalad)
      Curation.calibrationReport(
        Curation.logisticRegressionPlan(
          labels.select(col("doc_id"), col("cls"),
            explode(array_distinct(transform(
              graft.pipeline.TextFunctions.tokens(col("text")),
              tk => graft.pipeline.TextFunctions.hash60(tk) % 64)))
              .as("bucket")),
          "doc_id", iters = 12, lrDen = 1),
        "z_micro", "cls", bucketMicro = 400000L)
    }))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_exact_dedup" -> p01ExactDedup _,
    "p02_minhash_lsh" -> p02MinhashLsh _,
    "p03_simhash" -> p03Simhash _,
    "p04_ngram_jaccard" -> p04NgramJaccard _,
    "p05_cosine_topk" -> p05CosineTopK _,
    "p06_ann_lsh" -> p06AnnLsh _,
    "p07_embed_near_dup" -> p07EmbedNearDup _,
    "p08_lang_id" -> p08LangId _,
    "p09_quality" -> p09Quality _,
    "p10_tokens" -> p10Tokens _,
    "p11_fingerprint" -> p11Fingerprint _,
    "p12_multimodal" -> p12Multimodal _,
    "p13_sessionize" -> p13Sessionize _,
    "p14_window_agg" -> p14WindowAgg _,
    "p15_json_props" -> p15JsonProps _,
    "p16_hash_split" -> p16HashSplit _,
    "p17_tfidf" -> p17Tfidf _,
    "p18_quantize" -> p18Quantize _,
    "p19_ivf" -> p19Ivf _,
    "p20_repetition" -> p20Repetition _,
    "p21_kmeans" -> p21Kmeans _,
    "p22_kmeans_train" -> p22KmeansTrain _,
    "p23_stratified_sample" -> p23StratifiedSample _,
    "p24_token_budget" -> p24TokenBudget _,
    "p25_decontaminate" -> p25Decontaminate _,
    "p26_ivf_nprobe" -> p26IvfNprobe _,
    "p27_containment" -> p27Containment _,
    "p28_corpus_stats" -> p28CorpusStats _,
    "p29_frame_sample" -> p29FrameSample _,
    "p30_resize_plan" -> p30ResizePlan _,
    "p31_shard_export" -> p31ShardExport _,
    "p32_seq_pack" -> p32SeqPack _,
    "p33_rare_tokens" -> p33RareTokens _,
    "p34_winnow" -> p34Winnow _,
    "p35_winnow_pairs" -> p35WinnowPairs _,
    "p36_random_projection" -> p36RandomProjection _,
    "p37_dup_clusters" -> p37DupClusters _,
    "p46_merge_clusters" -> p46MergeClusters _,
    "p47_bloom_ingest" -> p47BloomIngest _,
    "p48_pq_codes" -> p48PqCodes _,
    "p49_pq_topk" -> p49PqTopK _,
    "p55_pq_trained" -> p55PqTrained _,
    "p56_ann_recall" -> p56AnnRecall _,
    "p58_pq_trained_topk" -> p58PqTrainedTopK _,
    "p59_resize_png" -> p59ResizePng _,
    "p60_wav_decode" -> p60WavDecode _,
    "p61_gopher_rules" -> p61GopherRules _,
    "p62_bpe_pairs" -> p62BpePairs _,
    "p64_c4_lines" -> p64C4Lines _,
    "p65_segment_scrub" -> p65SegmentScrub _,
    "p66_quality_funnel" -> p66QualityFunnel _,
    "p67_keep_longest" -> p67KeepLongest _,
    "p68_unigram_lm" -> p68UnigramLm _,
    "p69_cluster_best" -> p69ClusterBest _,
    "p70_importance_sample" -> p70ImportanceSample _,
    "p71_bpe_train" -> p71BpeTrain _,
    "p63_audio_features" -> p63AudioFeatures _,
    "p57_png_decode" -> p57PngDecode _,
    "p72_jpeg_decode" -> p72JpegDecode _,
    "p73_ivf_tuned" -> p73IvfTuned _,
    "p74_ivfpq" -> p74IvfPq _,
    "p75_bpe_encode" -> p75BpeEncode _,
    "p76_embed_ingest" -> p76EmbedIngest _,
    "p77_image_neardup" -> p77ImageNearDup _,
    "p78_exact_substrings" -> p78ExactSubstrings _,
    "p79_clustered_recall" -> p79ClusteredRecall _,
    "p80_audio_neardup" -> p80AudioNearDup _,
    "p81_nb_classifier" -> p81NbClassifier _,
    "p82_bigram_lm" -> p82BigramLm _,
    "p83_ivfpq_refine" -> p83IvfPqRefine _,
    "p84_classifier_audit" -> p84ClassifierAudit _,
    "p85_ivf_occupancy" -> p85IvfOccupancy _,
    "p86_shard_manifest" -> p86ShardManifest _,
    "p87_unigram_tokenizer" -> p87UnigramTokenizer _,
    "p88_unigram_encode" -> p88UnigramEncode _,
    "p89_kn_bigram" -> p89KnBigram _,
    "p90_dsir" -> p90Dsir _,
    "p91_norm_dedup" -> p91NormDedup _,
    "p92_domain_mix" -> p92DomainMix _,
    "p93_lsh_multiprobe" -> p93LshMultiProbe _,
    "p94_curriculum" -> p94Curriculum _,
    "p95_card_scrub" -> p95CardScrub _,
    "p96_ivf_split" -> p96IvfSplit _,
    "p97_rot_pq" -> p97RotPq _,
    "p98_shard_offsets" -> p98ShardOffsets _,
    "p99_tokenizer_fertility" -> p99TokenizerFertility _,
    "p100_hashed_neardup" -> p100HashedNearDup _,
    "p101_funnel" -> p101Funnel _,
    "p102_retention" -> p102Retention _,
    "p103_funnel_timing" -> p103FunnelTiming _,
    "p104_bbit_minhash" -> p104BbitMinhash _,
    "p105_memorization_risk" -> p105MemorizationRisk _,
    "p106_text_neardup" -> p106TextNearDup _,
    "p107_dedup_impact" -> p107DedupImpact _,
    "p108_lsh_recall_sweep" -> p108LshRecallSweep _,
    "p109_zipf_fit" -> p109ZipfFit _,
    "p110_domain_mix_iter" -> p110DomainMixIter _,
    "p111_novelty" -> p111Novelty _,
    "p112_bm25" -> p112Bm25 _,
    "p113_auc" -> p113Auc _,
    "p114_ppl_buckets" -> p114PplBuckets _,
    "p115_domain_cap" -> p115DomainCap _,
    "p116_pmi" -> p116Pmi _,
    "p117_lr_classifier" -> p117LrClassifier _,
    "p118_wordpiece" -> p118Wordpiece _,
    "p119_hybrid_rrf" -> p119HybridRrf _,
    "p120_prf" -> p120Prf _,
    "p121_entropy" -> p121Entropy _,
    "p122_residual_pq" -> p122ResidualPq _,
    "p123_doc_features" -> p123DocFeatures _,
    "p124_calibration" -> p124Calibration _,
    "p125_dedup_sweep" -> p125DedupSweep _,
    "p126_domain_drift" -> p126DomainDrift _,
    "p127_countmin" -> p127CountMin _,
    "p128_hll" -> p128Hll _,
    "p129_ql" -> p129Ql _,
    "p130_retrieval_scorecard" -> p130RetrievalScorecard _,
    "p131_phrase_rerank" -> p131PhraseRerank _,
    "p132_bm25f" -> p132Bm25f _,
    "p133_snippets" -> p133Snippets _,
    "p134_proximity" -> p134Proximity _,
    "p135_spell" -> p135SpellSuggest _,
    "p136_significance" -> p136Significance _,
    "p137_wordpiece_encode" -> p137WordpieceEncode _,
    "p138_pagerank_hubs" -> p138PagerankHubs _,
    "p139_classifier_agreement" -> p139ClassifierAgreement _,
    "p140_cluster_quality" -> p140ClusterQuality _,
    "p141_triangles" -> p141Triangles _,
    "p142_detector_agreement" -> p142DetectorAgreement _,
    "p143_chi_square" -> p143ChiSquare _,
    "p144_pmi_expansion" -> p144PmiExpansion _,
    "p145_packing_efficiency" -> p145PackingEfficiency _,
    "p146_bootstrap_ci" -> p146BootstrapCi _,
    "p147_vocab_growth" -> p147VocabGrowth _,
    "p148_hdr_quantiles" -> p148HdrQuantiles _,
    "p149_survivor_policies" -> p149SurvivorPolicies _,
    "p150_rate_spikes" -> p150RateSpikes _,
    "p151_source_dup_rates" -> p151SourceDupRates _,
    "p152_split_leakage" -> p152SplitLeakage _,
    "p153_epoch_schedule" -> p153EpochSchedule _,
    "p154_kcore" -> p154KCore _,
    "p155_pr_auc" -> p155PrAuc _,
    "p156_dedup_retrieval" -> p156DedupRetrievalImpact _,
    "p157_operating_points" -> p157OperatingPoints _,
    "p158_repetition" -> p158Repetition _,
    "p159_split_repair" -> p159SplitRepair _,
    "p160_shard_manifest" -> p160ShardManifest _,
    "p161_hard_negatives" -> p161HardNegatives _,
    "p162_distinct_n" -> p162DistinctN _,
    "p163_mix_interleave" -> p163MixInterleave _,
    "p172_manifest_append" -> p172ManifestAppend _,
    "p173_ltr_rerank" -> p173LtrRerank _,
    "p174_shard_append" -> p174ShardAppend _,
    "p175_release_diff" -> p175ReleaseDiff _,
    "p176_doc_chunks" -> p176DocChunks _,
    "p177_passage_retrieval" -> p177PassageRetrieval _,
    "p178_index_export" -> p178IndexExport _,
    "p179_lsh_bucket_audit" -> p179LshBucketAudit _,
    "p180_release_signoff" -> p180ReleaseSignoff _,
    "p181_index_append" -> p181IndexAppend _,
    "p182_ingest_dedup" -> p182IngestDedup _,
    "p183_index_delete" -> p183IndexDelete _,
    "p184_dedup_append" -> p184DedupAppend _,
    "p185_ingest_decontaminate" -> p185IngestDecontaminate _,
    "p186_index_lifecycle" -> p186IndexLifecycle _,
    "p187_admission_pipeline" -> p187AdmissionPipeline _,
    "p188_image_ingest_gate" -> p188ImageIngestGate _,
    "p189_quantizer_drift" -> p189QuantizerDrift _,
    "p164_crop_pairs" -> p164CropPairs _,
    "p165_shard_mix" -> p165ShardMix _,
    "p166_epoch_decorrelation" -> p166EpochDecorrelation _,
    "p167_jsonl_roundtrip" -> p167JsonlRoundtrip _,
    "p171_shard_files" -> p171ShardFiles _,
    "p168_k_anonymity" -> p168KAnonymity _,
    "p169_knn_probe" -> p169KnnProbe _,
    "p170_quantization_probe" -> p170QuantizationProbe _,
    "p50_temp_mix" -> p50TempMix _,
    "p51_hard_negatives" -> p51HardNegatives _,
    "p52_ivf_trained" -> p52IvfTrained _,
    "p53_chunks" -> p53Chunks _,
    "p54_snapshot_diff" -> p54SnapshotDiff _,
    "p38_pii_scrub" -> p38PiiScrub _,
    "p39_line_dedup" -> p39LineDedup _,
    "p40_semantic_dedup" -> p40SemanticDedup _,
    "p41_vocab" -> p41Vocab _,
    "p42_oov_rate" -> p42OovRate _,
    "p43_length_quantiles" -> p43LengthQuantiles _,
    "p44_mix_weights" -> p44MixWeights _,
    "p45_source_overlap" -> p45SourceOverlap _
  )

  // ------------------------------------------------------------ oracle SQL

  /** DuckDB cosine between two in-scope DOUBLE-list expressions, same
    * op order as [[Similarity.cosine]].
    */
  private def oCos(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |    * sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin

  /** The IVF-PQ ADC replay shared by p74 and p83: coarse assignment,
    * per-subspace code assignment (m=4 over dim 64, codebook vec_id<8,
    * coarse centroids vec_id%25=0), probe set (nprobe=4, queries
    * vec_id<20) and the asymmetric distance of every in-probe
    * candidate — the CTE chain ends at `ad(query_id, cand_id, adist)`.
    */
  private lazy val oIvfPqAd: String = {
    def oDotAt(a: String, b: String, s: Int): String =
      s"""list_sum(list_transform(generate_series(1, 16),
         |        i -> CAST($a[${s * 16} + i] AS DOUBLE)
         |             * CAST($b[${s * 16} + i] AS DOUBLE)))""".stripMargin
    def oD2At(a: String, b: String, s: Int): String =
      s"""(${oDotAt(a, a, s)}
         |     - 2 * ${oDotAt(a, b, s)}
         |     + ${oDotAt(b, b, s)})""".stripMargin
    val terms = (0 until 4)
      .map(s => oD2At("q.qv", s"e$s.ce", s)).mkString("\n    + ")
    s"""WITH ccents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
       |  WHERE vec_id % 25 = 0),
       |assign AS (
       |  SELECT e.vec_id, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
       |  FROM embeddings e, ccents),
       |cells AS (SELECT vec_id, cent_id FROM assign WHERE rn = 1),
       |probes AS (SELECT vec_id, cent_id FROM assign
       |           WHERE rn <= 4 AND vec_id < 20),
       |pcents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
       |  WHERE vec_id < 8),
       |subs AS (SELECT unnest(generate_series(0, 3)) AS s),
       |scored AS (
       |  SELECT e.vec_id, subs.s, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, subs.s ORDER BY
       |      (list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(e.embedding[subs.s*16 + i] AS DOUBLE)))
       |       - 2 * list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))
       |       + list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(c.ce[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))) ASC,
       |      c.cent_id ASC) AS rn
       |  FROM embeddings e, pcents c, subs),
       |codesw AS (
       |  SELECT vec_id,
       |    MAX(CASE WHEN s = 0 THEN cent_id END) AS c0,
       |    MAX(CASE WHEN s = 1 THEN cent_id END) AS c1,
       |    MAX(CASE WHEN s = 2 THEN cent_id END) AS c2,
       |    MAX(CASE WHEN s = 3 THEN cent_id END) AS c3
       |  FROM scored WHERE rn = 1 GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |      WHERE vec_id < 20),
       |ad AS (
       |  SELECT q.query_id, w.vec_id AS cand_id,
       |    ($terms) AS adist
       |  FROM q
       |  JOIN probes pr ON pr.vec_id = q.query_id
       |  JOIN cells cc ON cc.cent_id = pr.cent_id
       |  JOIN codesw w ON w.vec_id = cc.vec_id
       |  JOIN pcents e0 ON e0.cent_id = w.c0
       |  JOIN pcents e1 ON e1.cent_id = w.c1
       |  JOIN pcents e2 ON e2.cent_id = w.c2
       |  JOIN pcents e3 ON e3.cent_id = w.c3
       |  WHERE q.query_id != w.vec_id)""".stripMargin
  }

  /** The p83 refine replay: ADC top-20 shortlist from [[oIvfPqAd]],
    * exact-cosine re-rank to top-5 (shared with the p56 scorecard's
    * refine row).
    */
  private lazy val oIvfPqRefineSql: String =
    s"""$oIvfPqAd,
       |sl AS (
       |  SELECT query_id, cand_id, rn AS adc_rank
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY adist ASC, cand_id ASC) AS rn FROM ad)
       |  WHERE rn <= 20),
       |rer AS (
       |  SELECT sl.query_id, sl.cand_id, sl.adc_rank,
       |    ${oCos("qe.embedding", "ce.embedding")} AS sim
       |  FROM sl
       |  JOIN embeddings qe ON qe.vec_id = sl.query_id
       |  JOIN embeddings ce ON ce.vec_id = sl.cand_id)
       |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id,
       |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro,
       |  CAST(adc_rank AS BIGINT) AS adc_rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, cand_id ASC) AS rn FROM rer)
       |WHERE rn <= 5""".stripMargin

  /** The p87 unigram-tokenizer replay: one Viterbi round = the pc
    * matrix (per-word (start, len) cost slots in matrix order), a
    * recursive-CTE DP carrying the cost vector as a list, and the
    * smallest-split-point backtrace — chained twice with the EM
    * recount/recost between rounds.
    */
  private def oUnigramTokenizer(vocabSize: Int, maxLen: Int): String =
    s"""${oUnigramCtes(vocabSize, maxLen)}
       |SELECT word, freq, CAST(len(pieces) AS BIGINT) AS n_pieces,
       |  array_to_string(pieces, ' ') AS segmentation,
       |  CAST(total AS BIGINT) AS cost_micro
       |FROM seg1""".stripMargin

  /** p88: the trained segmentation applied back to every corpus word
    * position (the unigram sibling of [[oBpeEncode]]).
    */
  private def oUnigramEncode(vocabSize: Int, maxLen: Int): String =
    s"""${oUnigramCtes(vocabSize, maxLen)}
       |SELECT d.doc_id, CAST(d.pos - 1 AS BIGINT) AS pos,
       |  CAST(len(w.pieces) AS BIGINT) AS n_tokens,
       |  array_to_string(w.pieces, ' ') AS tokens
       |FROM (SELECT doc_id, toks[pos] AS word, pos
       |      FROM (SELECT doc_id, toks,
       |              unnest(generate_series(1, len(toks))) AS pos
       |            FROM (SELECT doc_id, $oToks AS toks FROM documents))
       |      WHERE length(toks[pos]) > 0) d
       |JOIN seg1 w ON w.word = d.word""".stripMargin

  /** The shared p87/p88 replay chain, ending at
    * `seg1(word, freq, pieces, total)`.
    */
  private def oUnigramCtes(vocabSize: Int, maxLen: Int): String = {
    def rnd(n: Int, cost: String): String =
      s"""mat$n AS (
         |  SELECT w.word, w.freq,
         |    list(CASE WHEN s.start + l.len - 1 <= length(w.word)
         |         THEN c.cost END
         |         ORDER BY s.start, l.len) AS pc
         |  FROM wrd w
         |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS start) s
         |  CROSS JOIN (SELECT unnest(generate_series(1, $maxLen)) AS len) l
         |  LEFT JOIN $cost c ON c.piece = substr(w.word, s.start, l.len)
         |  WHERE s.start <= length(w.word)
         |  GROUP BY w.word, w.freq),
         |dp$n AS (
         |  SELECT m.word, m.freq, m.pc, 0 AS i, [CAST(0 AS BIGINT)] AS costs
         |  FROM mat$n m
         |  UNION ALL
         |  SELECT word, freq, pc, i + 1,
         |    list_append(costs, (
         |      SELECT MIN(costs[j + 1] + pc[j * $maxLen + (i + 1 - j)])
         |      FROM (SELECT unnest(generate_series(
         |              CASE WHEN i + 1 - $maxLen > 0
         |              THEN i + 1 - $maxLen ELSE 0 END,
         |              i)) AS j)
         |      WHERE pc[j * $maxLen + (i + 1 - j)] IS NOT NULL))
         |  FROM dp$n WHERE i < length(word)),
         |dpf$n AS (SELECT word, freq, pc, costs FROM dp$n
         |          WHERE i = length(word)),
         |bt$n AS (
         |  SELECT word, freq, pc, costs, length(word) AS pos,
         |    CAST([] AS VARCHAR[]) AS pieces
         |  FROM dpf$n
         |  UNION ALL
         |  SELECT word, freq, pc, costs, jstar,
         |    list_prepend(substr(word, jstar + 1, pos - jstar), pieces)
         |  FROM (
         |    SELECT word, freq, pc, costs, pos, pieces, (
         |      SELECT MIN(j)
         |      FROM (SELECT unnest(generate_series(
         |              CASE WHEN pos - $maxLen > 0
         |              THEN pos - $maxLen ELSE 0 END,
         |              pos - 1)) AS j)
         |      WHERE pc[j * $maxLen + (pos - j)] IS NOT NULL
         |        AND costs[j + 1] + pc[j * $maxLen + (pos - j)]
         |            = costs[pos + 1]) AS jstar
         |    FROM bt$n WHERE pos > 0) s),
         |seg$n AS (
         |  SELECT word, freq, pieces, costs[length(word) + 1] AS total
         |  FROM bt$n WHERE pos = 0)""".stripMargin
    s"""WITH RECURSIVE
       |wrd AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($oToks) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w),
       |grid AS (
       |  SELECT substr(w.word, s.start, l.len) AS piece, w.freq
       |  FROM wrd w
       |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS start) s
       |  CROSS JOIN (SELECT unnest(generate_series(1, $maxLen)) AS len) l
       |  WHERE s.start + l.len - 1 <= length(w.word)),
       |sp AS (SELECT piece, SUM(freq) AS c FROM grid GROUP BY piece),
       |sing AS (SELECT piece, c FROM sp WHERE length(piece) = 1),
       |mult AS (SELECT piece, c,
       |           ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS rn
       |         FROM sp WHERE length(piece) > 1),
       |voc AS (SELECT piece, c FROM sing
       |        UNION ALL
       |        SELECT piece, c FROM mult
       |        WHERE rn <= $vocabSize - (SELECT COUNT(*) FROM sing)),
       |cost0 AS (
       |  SELECT piece, CAST(FLOOR(-ln((c + 1)
       |    / CAST((SELECT SUM(c) FROM voc) + (SELECT COUNT(*) FROM voc)
       |           AS DOUBLE)) * 1e6) AS BIGINT) AS cost
       |  FROM voc),
       |${rnd(0, "cost0")},
       |cnt1 AS (
       |  SELECT p AS piece, SUM(freq) AS c
       |  FROM (SELECT unnest(pieces) AS p, freq FROM seg0) GROUP BY p),
       |cost1 AS (
       |  SELECT v.piece, CAST(FLOOR(-ln((COALESCE(c1.c, 0) + 1)
       |    / CAST((SELECT COALESCE(SUM(c), 0) FROM cnt1)
       |           + (SELECT COUNT(*) FROM voc) AS DOUBLE)) * 1e6)
       |    AS BIGINT) AS cost
       |  FROM voc v LEFT JOIN cnt1 c1 ON v.piece = c1.piece),
       |${rnd(1, "cost1")}""".stripMargin
  }

  /** The p21 Lloyd step chained `iters` times: each round assigns by
    * cosine (ties to the smaller centroid id), takes fixed-point
    * per-dimension means, and rebuilds the next round's centroid lists
    * as `CAST(mean_fixed / 1e6 AS FLOAT)` — the same two IEEE ops
    * [[Similarity.kmeansTrain]] performs driver-side.
    */
  private def oKmeansTrain(iters: Int): String = {
    val sb = new StringBuilder(
      """WITH cents0 AS (
        |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
        |  WHERE vec_id % 25 = 0)""".stripMargin)
    for (it <- 0 until iters) {
      sb ++= s""",
         |assign$it AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents$it),
         |means$it AS (
         |  SELECT cent_id, i - 1 AS dim, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(FLOOR(SUM(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6)) / COUNT(*)) AS BIGINT) AS mean_fixed
         |  FROM (SELECT * FROM assign$it WHERE rn = 1)
         |  CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) s
         |  GROUP BY 1, 2)""".stripMargin
      if (it < iters - 1) sb ++= s""",
         |cents${it + 1} AS (
         |  SELECT cent_id,
         |    list(CAST(CAST(mean_fixed AS DOUBLE) / 1000000.0 AS FLOAT) ORDER BY dim) AS ce
         |  FROM means$it GROUP BY cent_id)""".stripMargin
    }
    sb ++= s"""
       |SELECT cent_id, CAST(dim AS BIGINT) AS dim, n, mean_fixed
       |FROM means${iters - 1}""".stripMargin
    sb.toString
  }

  /** Per-modulus k-means quality replay: the [[oKmeansTrain]] chain
    * (CTEs suffixed per modulus so all fits share one WITH), final
    * centroid assignment ranked to best + runner-up cell, per-vector
    * micro distances, the simplified-silhouette floor-division, then
    * one card row per modulus — the p140 oracle.
    */
  private def oClusterQuality(moduli: Seq[Int], iters: Int): String = {
    def fd(x: String, m: String) =
      s"(($x) - ((($x) % ($m)) + ($m)) % ($m)) // ($m)"
    val blocks = moduli.map { m =>
      val sb = new StringBuilder(
        s"""c${m}_cents0 AS (
           |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
           |  WHERE vec_id % $m = 0)""".stripMargin)
      for (it <- 0 until iters) {
        sb ++= s""",
           |c${m}_assign$it AS (
           |  SELECT e.vec_id, e.embedding, cent_id,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
           |  FROM embeddings e, c${m}_cents$it),
           |c${m}_means$it AS (
           |  SELECT cent_id, i - 1 AS dim, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(FLOOR(SUM(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6)) / COUNT(*)) AS BIGINT) AS mean_fixed
           |  FROM (SELECT * FROM c${m}_assign$it WHERE rn = 1)
           |  CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) s
           |  GROUP BY 1, 2),
           |c${m}_cents${it + 1} AS (
           |  SELECT cent_id,
           |    list(CAST(CAST(mean_fixed AS DOUBLE) / 1000000.0 AS FLOAT) ORDER BY dim) AS ce
           |  FROM c${m}_means$it GROUP BY cent_id)""".stripMargin
      }
      sb ++= s""",
         |c${m}_rank AS (
         |  SELECT e.vec_id, cent_id,
         |    1000000 - CAST(FLOOR(${oCos("e.embedding", "ce")} * 1e6) AS BIGINT) AS d,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, c${m}_cents$iters),
         |c${m}_ab AS (
         |  SELECT vec_id,
         |    MAX(CASE WHEN rn = 1 THEN d END) AS a,
         |    MAX(CASE WHEN rn = 1 THEN cent_id END) AS cell,
         |    MAX(CASE WHEN rn = 2 THEN d END) AS b
         |  FROM c${m}_rank WHERE rn <= 2 GROUP BY vec_id),
         |c${m}_s AS (
         |  SELECT vec_id, a, cell,
         |    CASE WHEN GREATEST(a, b) = 0 THEN 0
         |         ELSE ${fd("(b - a) * 1000000", "GREATEST(a, b)")} END AS s
         |  FROM c${m}_ab),
         |c${m}_card AS (
         |  SELECT CAST($m AS BIGINT) AS modulus,
         |    CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(COUNT(DISTINCT cell) AS BIGINT) AS n_cells,
         |    CAST(SUM(a) AS BIGINT) AS inertia_micro,
         |    CAST(${fd("CAST(SUM(s) AS BIGINT)", "COUNT(*)")} AS BIGINT) AS silhouette_micro
         |  FROM c${m}_s)""".stripMargin
      sb.toString
    }
    s"""WITH ${blocks.mkString(",\n")}
       |${moduli.map(m => s"SELECT * FROM c${m}_card")
          .mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** [[oKmeansTrain]]'s iteration chain, continued into a full IVF
    * replay over the TRAINED centroids: rebuild the final float
    * centroid lists, re-assign the corpus, probe `nprobe` cells per
    * query, rank top `k` — the p52 oracle.
    */
  private def oIvfTrained(iters: Int, nprobe: Int, k: Int): String = {
    val sb = new StringBuilder(
      """WITH cents0 AS (
        |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
        |  WHERE vec_id % 25 = 0)""".stripMargin)
    for (it <- 0 until iters) {
      sb ++= s""",
         |assign$it AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents$it),
         |means$it AS (
         |  SELECT cent_id, i - 1 AS dim, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(FLOOR(SUM(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6)) / COUNT(*)) AS BIGINT) AS mean_fixed
         |  FROM (SELECT * FROM assign$it WHERE rn = 1)
         |  CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) s
         |  GROUP BY 1, 2),
         |cents${it + 1} AS (
         |  SELECT cent_id,
         |    list(CAST(CAST(mean_fixed AS DOUBLE) / 1000000.0 AS FLOAT) ORDER BY dim) AS ce
         |  FROM means$it GROUP BY cent_id)""".stripMargin
    }
    sb ++= s""",
       |assignT AS (
       |  SELECT e.vec_id, e.embedding, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
       |  FROM embeddings e, cents$iters),
       |cells AS (SELECT vec_id, embedding, cent_id FROM assignT WHERE rn = 1),
       |probes AS (SELECT vec_id, embedding, cent_id FROM assignT
       |           WHERE rn <= $nprobe AND vec_id < 20),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    ${oCos("q.embedding", "c.embedding")} AS sim
       |  FROM probes q JOIN cells c
       |    ON q.cent_id = c.cent_id AND q.vec_id != c.vec_id),
       |ranked AS (
       |  SELECT query_id, cand_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, cand_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
       |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= $k""".stripMargin
    sb.toString
  }

  /** Per-subspace trained-PQ replay: cb0 is the seed codebook's
    * 16-element sub-slices; each iteration re-ranks every (vector,
    * subspace) against the current entries with the same ordered
    * three-term d² ([[Similarity]]'s `dist2` op order), aggregates
    * fixed-point member means, and rebuilds entries as
    * `(mean_fixed/1e6)::FLOAT` — the two IEEE ops the Spark driver
    * performs. Final select = code assignment against cb`iters`.
    */
  private def oPqTrainedCtes(iters: Int): String = {
    def d2(ce: String): String =
      s"""(list_sum(list_transform(generate_series(1, 16),
         |    i -> CAST(e.embedding[c.s*16 + i] AS DOUBLE)
         |         * CAST(e.embedding[c.s*16 + i] AS DOUBLE)))
         | - 2 * list_sum(list_transform(generate_series(1, 16),
         |    i -> CAST(e.embedding[c.s*16 + i] AS DOUBLE)
         |         * CAST($ce[i] AS DOUBLE)))
         | + list_sum(list_transform(generate_series(1, 16),
         |    i -> CAST($ce[i] AS DOUBLE) * CAST($ce[i] AS DOUBLE))))""".stripMargin
    val sb = new StringBuilder(
      """WITH cb0 AS (
        |  SELECT subs.s, vec_id AS cid,
        |    list_transform(generate_series(1, 16),
        |      i -> embedding[subs.s*16 + i]) AS ce
        |  FROM embeddings, (SELECT UNNEST(generate_series(0, 3)) AS s) subs
        |  WHERE vec_id < 8)""".stripMargin)
    for (it <- 0 until iters) {
      sb ++= s""",
         |assign$it AS (
         |  SELECT e.vec_id, e.embedding, c.s, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.s
         |      ORDER BY ${d2("c.ce")} ASC, c.cid ASC) AS rn
         |  FROM embeddings e, cb$it c),
         |means$it AS (
         |  SELECT s, cid, CAST(s*16 + i - 1 AS BIGINT) AS dim,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(FLOOR(SUM(FLOOR(CAST(embedding[s*16 + i] AS DOUBLE) * 1e6))
         |      / COUNT(*)) AS BIGINT) AS mean_fixed
         |  FROM (SELECT * FROM assign$it WHERE rn = 1)
         |  CROSS JOIN (SELECT UNNEST(generate_series(1, 16)) AS i) gi
         |  GROUP BY 1, 2, 3),
         |cb${it + 1} AS (
         |  SELECT s, cid,
         |    list(CAST(CAST(mean_fixed AS DOUBLE) / 1000000.0 AS FLOAT)
         |      ORDER BY dim) AS ce
         |  FROM means$it GROUP BY s, cid)""".stripMargin
    }
    sb ++= s""",
       |assignT AS (
       |  SELECT e.vec_id, c.s, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.s
       |      ORDER BY ${d2("c.ce")} ASC, c.cid ASC) AS rn
       |  FROM embeddings e, cb$iters c)""".stripMargin
    sb.toString
  }

  private def oPqTrained(iters: Int): String =
    oPqTrainedCtes(iters) + """
      |SELECT vec_id, CAST(s AS BIGINT) AS subspace, cid AS code
      |FROM assignT WHERE rn = 1""".stripMargin

  /** Trained-ADC replay: the [[oPqTrainedCtes]] chain through the
    * trained codebook, then the p49 scan shape with each subspace's
    * entry joined from cb`iters` (local 1..16 indexing on the entry,
    * global offsets on the query) — same ordered four-term sum.
    */
  private def oPqTrainedTopK(iters: Int, k: Int): String = {
    def d2At(s: Int): String =
      s"""(list_sum(list_transform(generate_series(1, 16),
         |    i -> CAST(q.qv[${s * 16} + i] AS DOUBLE)
         |         * CAST(q.qv[${s * 16} + i] AS DOUBLE)))
         | - 2 * list_sum(list_transform(generate_series(1, 16),
         |    i -> CAST(q.qv[${s * 16} + i] AS DOUBLE)
         |         * CAST(e$s.ce[i] AS DOUBLE)))
         | + list_sum(list_transform(generate_series(1, 16),
         |    i -> CAST(e$s.ce[i] AS DOUBLE) * CAST(e$s.ce[i] AS DOUBLE))))""".stripMargin
    val terms = (0 until 4).map(d2At).mkString("\n    + ")
    val joins = (0 until 4)
      .map(s => s"JOIN cb$iters e$s ON e$s.s = $s AND e$s.cid = w.c$s")
      .mkString("\n  ")
    oPqTrainedCtes(iters) + s""",
      |codesw AS (
      |  SELECT vec_id,
      |    MAX(CASE WHEN s = 0 THEN cid END) AS c0,
      |    MAX(CASE WHEN s = 1 THEN cid END) AS c1,
      |    MAX(CASE WHEN s = 2 THEN cid END) AS c2,
      |    MAX(CASE WHEN s = 3 THEN cid END) AS c3
      |  FROM assignT WHERE rn = 1 GROUP BY vec_id),
      |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |      WHERE vec_id < 20),
      |ad AS (
      |  SELECT q.query_id, w.vec_id AS cand_id,
      |    ($terms) AS adist
      |  FROM codesw w
      |  $joins
      |  CROSS JOIN q
      |  WHERE q.query_id != w.vec_id)
      |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank,
      |  CAST(FLOOR(adist * 1e6) AS BIGINT) AS adist_micro
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY adist ASC, cand_id ASC) AS rn FROM ad)
      |WHERE rn <= $k""".stripMargin
  }

  /** DuckDB 64-bit simhash over an in-scope `toks`, same semantics as
    * the native kernel behind [[Dedup.simhashPairs]]. The token hash is
    * the 60-bit hash60, so bits 60–63 can never win a vote — emitting
    * only the first 60 terms is exact and avoids the 1<<63 literal.
    */
  private def oSimhash: String = {
    val bits = (0 until 60).map { i =>
      s"""(CASE WHEN list_sum(list_transform(hl,
         |   h -> CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END)) > 0
         | THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)""".stripMargin
    }
    bits.mkString(" + ")
  }

  /** DuckDB hyperplane-LSH bucket, same hash-derived weights as
    * [[Similarity.lshBucket]] (4 planes over 64 dims).
    */
  /** MinHash signature replay shared by p104 and p108: the
    * [[TF.minhashSeeds]] family applied to 60-bit shingle hashes mod
    * P, empty-shingle docs getting the P sentinel — ending at
    * `sg(doc_id, sh, sig)`. Mirrors the native minhash kernel.
    * `sampleBudget` replays
    * [[graft.pipeline.Dedup.boundedCalibrationSample]]: keep docs
    * whose independent MinHash (permutation 13) lands on bucket 0 of
    * a corpus-count-derived modulus.
    */
  private def oMinhashSigCtes(k: Int = 3, numHashes: Int = 12,
      sampleBudget: Option[Int] = None): String = {
    val P = 2147483647L
    val sigs = TF.minhashSeeds(numHashes).map { case (a, bb) =>
      s"COALESCE(list_min(list_transform(bh, h -> ($a * h + $bb) % $P)), $P)"
    }.mkString(",\n      ")
    val hhCtes = sampleBudget match {
      case None =>
        s"""hh AS (SELECT doc_id, sh,
           |  list_transform(sh, s -> ${oHash("s")} % $P) AS bh
           |  FROM shs)""".stripMargin
      case Some(budget) =>
        val (sa, sb) = TF.minhashSeeds(13).last
        s"""hh0 AS (SELECT doc_id, sh,
           |  list_transform(sh, s -> ${oHash("s")} % $P) AS bh
           |  FROM shs),
           |hh AS (
           |  SELECT hh0.doc_id, hh0.sh, hh0.bh FROM hh0,
           |    (SELECT GREATEST(CAST(1 AS BIGINT),
           |       (COUNT(*) + ${budget - 1}) // $budget) AS m
           |     FROM documents) sm
           |  WHERE COALESCE(list_min(list_transform(bh,
           |      h -> ($sa * h + $sb) % $P)), $P) % sm.m = 0)"""
          .stripMargin
    }
    s"""WITH t AS (SELECT doc_id, $oToks AS toks FROM documents),
       |shs AS (SELECT doc_id, ${oShingles(k)} AS sh FROM t),
       |$hhCtes,
       |sg AS (SELECT doc_id, sh, [
       |      $sigs] AS sig FROM hh)""".stripMargin
  }

  /** The 6-band × 2-row LSH band-equality predicate over `a.sig` /
    * `b.sig` (mirrors [[graft.pipeline.Dedup.bandKeyArray]]).
    */
  private def oBandEq(bands: Int = 6, rows: Int = 2): String =
    (0 until bands).map { bd =>
      val lo = bd * rows + 1
      val hi = (bd + 1) * rows
      s"a.sig[$lo:$hi] = b.sig[$lo:$hi]"
    }.mkString("\n     OR ")

  /** DuckDB rendering of cosine over `dim`-wide float lists —
    * index-order double accumulation like the codegen kernels.
    */
  private def oCosN(a: String, b: String, dim: Int): String =
    s"""(list_sum(list_transform(generate_series(1, $dim), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(generate_series(1, $dim), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |    * sqrt(list_sum(list_transform(generate_series(1, $dim), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin

  /** The feature-hashed doc-vector replay shared by p100 and p106:
    * word 3-shingle features, signed hashing into 128 buckets, the
    * map pivot to a dense vector, ending at `nz(doc_id, embedding)`
    * with zero-norm docs excluded. Mirrors
    * [[Similarity.hashedDocVectors]].
    */
  private def oHashedVecCtes(): String =
    s"""WITH t AS (SELECT doc_id, $oToks AS toks FROM documents),
       |occ AS (
       |  SELECT doc_id, unnest(${oShingles(3)}) AS tok FROM t),
       |bk AS (
       |  SELECT doc_id, ${oHash("tok")} % 128 AS bucket,
       |    CASE WHEN ${oHash("'fs' || tok")} % 2 = 0 THEN 1 ELSE -1 END
       |      AS sgn
       |  FROM occ WHERE length(tok) > 0),
       |sv AS (
       |  SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS v
       |  FROM bk GROUP BY 1, 2),
       |vec AS (SELECT doc_id, map(list(bucket), list(v)) AS m
       |        FROM sv GROUP BY 1),
       |emb AS (
       |  SELECT doc_id, list_transform(generate_series(0, 127),
       |    j -> CAST(COALESCE(m[j][1], 0) AS FLOAT)) AS embedding
       |  FROM vec),
       |nz AS (
       |  SELECT doc_id, embedding FROM emb
       |  WHERE sqrt(list_sum(list_transform(generate_series(1, 128),
       |    i -> CAST(embedding[i] AS DOUBLE)
       |         * CAST(embedding[i] AS DOUBLE)))) > 0)""".stripMargin

  /** DuckDB rendering of one hyperplane dot ⟨vec, w_p⟩ — the same
    * md5-derived weights as [[Similarity.planeWeights]]; `list_sum`
    * folds left-to-right like the codegen dot kernel.
    */
  private def oPlaneDot(vec: String, p: Int): String =
    s"""list_sum(list_transform(generate_series(1, 64),
       |  i -> CAST($vec[i] AS DOUBLE) *
       |       (${oHash(s"'hp${p}_' || CAST(i AS VARCHAR)")} % 2001 - 1000)))""".stripMargin

  /** The p49 PQ/ADC replay, parameterized over the vector source so
    * the rotated twin (p97) reuses it verbatim: `lead` is an optional
    * extra leading CTE (e.g. the rotated-embedding projection) and
    * `src` the relation providing (vec_id, embedding).
    */
  private def oPqTopKSql(lead: String, src: String): String = {
    // fixed-offset index-order dot over subspace s (a literal here,
    // unlike p48's correlated subs.s)
    def oDotAt(a: String, b: String, s: Int): String =
      s"""list_sum(list_transform(generate_series(1, 16),
         |        i -> CAST($a[${s * 16} + i] AS DOUBLE)
         |             * CAST($b[${s * 16} + i] AS DOUBLE)))""".stripMargin
    def oD2At(a: String, b: String, s: Int): String =
      s"""(${oDotAt(a, a, s)}
         |     - 2 * ${oDotAt(a, b, s)}
         |     + ${oDotAt(b, b, s)})""".stripMargin
    val terms = (0 until 4)
      .map(s => oD2At("q.qv", s"e$s.ce", s)).mkString("\n    + ")
    s"""WITH ${lead}cents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM $src
       |  WHERE vec_id < 8),
       |subs AS (SELECT unnest(generate_series(0, 3)) AS s),
       |scored AS (
       |  SELECT e.vec_id, subs.s, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, subs.s ORDER BY
       |      (list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(e.embedding[subs.s*16 + i] AS DOUBLE)))
       |       - 2 * list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))
       |       + list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(c.ce[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))) ASC,
       |      c.cent_id ASC) AS rn
       |  FROM $src e, cents c, subs),
       |codesw AS (
       |  SELECT vec_id,
       |    MAX(CASE WHEN s = 0 THEN cent_id END) AS c0,
       |    MAX(CASE WHEN s = 1 THEN cent_id END) AS c1,
       |    MAX(CASE WHEN s = 2 THEN cent_id END) AS c2,
       |    MAX(CASE WHEN s = 3 THEN cent_id END) AS c3
       |  FROM scored WHERE rn = 1 GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM $src
       |      WHERE vec_id < 20),
       |ad AS (
       |  SELECT q.query_id, w.vec_id AS cand_id,
       |    ($terms) AS adist
       |  FROM codesw w
       |  JOIN cents e0 ON e0.cent_id = w.c0
       |  JOIN cents e1 ON e1.cent_id = w.c1
       |  JOIN cents e2 ON e2.cent_id = w.c2
       |  JOIN cents e3 ON e3.cent_id = w.c3
       |  CROSS JOIN q
       |  WHERE q.query_id != w.vec_id)
       |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank,
       |  CAST(FLOOR(adist * 1e6) AS BIGINT) AS adist_micro
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adist ASC, cand_id ASC) AS rn FROM ad)
       |WHERE rn <= 5""".stripMargin
  }

  /** DuckDB rendering of [[Similarity.rotateVec]]: the signed
    * permutation embedded as literal lists, computed by the SAME
    * [[Similarity.signedPerm]] at SQL-generation time.
    */
  private def oRotate(vec: String, salt: String): String = {
    val (perm, signs) = graft.pipeline.Similarity.signedPerm(64, salt)
    s"""list_transform(generate_series(1, 64),
       |      j -> CAST($vec[([${perm.mkString(", ")}])[j]]
       |           * (([${signs.mkString(", ")}])[j]) AS FLOAT))""".stripMargin
  }

  private def oBucket(vec: String): String =
    (0 until 4).map { p =>
      s"""(CASE WHEN ${oPlaneDot(vec, p)}
         |  > 0 THEN ${1L << p} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  private val oLangCase: String = {
    val langs = TF.stopwords.map(_._1)
    val conds = langs.init.zipWithIndex.map { case (lang, i) =>
      val later = langs.drop(i + 1)
      val cond = later.map(o => s"hits_$lang >= hits_$o").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${conds.mkString(" ")} ELSE '${langs.last}' END"
  }

  private def oHits(lang: String, words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> lower(t) IN ($set)))"
  }

  /** Recall@k scorecard for the ANN family against exact truth — the
    * quality gate the approximate methods otherwise lack: a config
    * change that silently costs recall flips this row red while every
    * per-method row stays green (each method's own oracle replays the
    * method, so it can't see a recall regression). Truth is the exact
    * scan restricted to each method's own k. Counts are integers and
    * the one division is a single identical-order FLOOR, so the row
    * hashes portably. At 100 TB the same query runs over a sampled
    * query set — truth is O(|corpus|·|Q|), which is why |Q| is the
    * knob, not the corpus.
    *
    * Operating points (sf0.01): the fast configs sit at 10-33% recall
    * and the TUNED row (p73, nprobe 8 of 20 cells) reaches ~72% —
    * which is near the ceiling this corpus allows at that probe mass:
    * the synthetic embeddings are i.i.d.-random, so cells carry no
    * real cluster structure and IVF recall tracks the probed fraction
    * of the corpus (8/20 cells ≈ 40% mass → 72% only because a
    * query's own top cells are correlated with its neighbors'). On
    * embeddings with genuine cluster structure the same nprobe curve
    * rises far faster; the scorecard's job is to expose exactly this
    * curve per corpus — [[p79ClusteredRecall]] demonstrates it: the
    * in-plan 32-cluster fixture reaches 100% recall@3 at nprobe 1. The IVF-PQ row (p74) lands at 14% recall@5
    * touching 4/20 cells — above the full-corpus untrained PQ scan's
    * 10%, the compression+probe composition paying for itself. The
    * refine row (p83) nearly triples that at the SAME probe budget
    * (sf0.001: 11% → 30% recall@5) by exact-cosine re-ranking the
    * ADC top-20 — quantization error, not probe coverage, is what it
    * buys back.
    */
  def p56AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val exact = p05CosineTopKOn(emb).select("query_id", "cand_id", "rank")
    graft.core.Caching.withCached(exact)(annRecallPlan(emb, exact))
  }

  /** Lazy plan for [[p56AnnRecall]] over a prepared exact-truth frame
    * (split out so Bench can fingerprint it — the public query's
    * cache bracket returns an opaque LogicalRDD).
    *
    * Every method row builds on the SAME `emb` frame: Spark's
    * exchange reuse compares canonicalized plans, and two independent
    * `spark.read`s of one path never canonicalize equal (each carries
    * its own FileIndex instance) — with per-row reads the ten rows
    * shared nothing (fingerprint: 124 exchanges, 0 reused). Off one
    * shared read, identical corpus-side subtrees (the three IVF rows'
    * cell index, the PQ rows' code scans) dedupe at runtime.
    */
  private def annRecallPlan(emb: DataFrame,
      exact: DataFrame): DataFrame = {
    val methods: Seq[(String, DataFrame, Int)] = Seq(
      ("p06_ann_lsh", p06AnnLshOn(emb), 3),
      ("p19_ivf", p19IvfOn(emb), 3),
      ("p26_ivf_nprobe", p26IvfNprobeOn(emb), 3),
      ("p49_pq_topk", p49PqTopKOn(emb), 5),
      ("p58_pq_trained_topk", p58PqTrainedTopKOn(emb), 5),
      ("p73_ivf_tuned", p73IvfTunedOn(emb), 3),
      ("p74_ivfpq", p74IvfPqOn(emb), 5),
      ("p83_ivfpq_refine", p83IvfPqRefineOn(emb), 5),
      ("p93_lsh_multiprobe", p93LshMultiProbeOn(emb), 3),
      ("p97_rot_pq", p97RotPqOn(emb), 5))
    methods.map { case (name, df, km) =>
      val truth = exact.filter(col("rank") <= km)
        .select("query_id", "cand_id")
      df.select("query_id", "cand_id")
        .join(truth, Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(lit(name).as("method"), col("n_hits"), col("n_truth"),
          floor((col("n_hits") * lit(1e6)) / col("n_truth")).cast("long")
            .as("recall_micro"))
    }.reduce(_ unionByName _)
  }

  /** The p56 oracle: each method's own oracle SQL (verbatim, as a
    * derived table) joined against the exact scan's — recall certified
    * end to end by the same replayed queries.
    */
  private def oAnnRecall: String = {
    val ex = oracle0("p05_cosine_topk")
    def row(name: String, sql: String, km: Int): String =
      s"""  SELECT '$name' AS method,
         |    CAST((SELECT COUNT(*) FROM ($sql) a
         |          JOIN ex e ON a.query_id = e.query_id
         |           AND a.cand_id = e.cand_id AND e.rank <= $km)
         |      AS BIGINT) AS n_hits,
         |    CAST((SELECT COUNT(*) FROM ex WHERE rank <= $km)
         |      AS BIGINT) AS n_truth""".stripMargin
    s"""WITH ex AS (SELECT * FROM ($ex))
       |SELECT method, n_hits, n_truth,
       |  CAST(FLOOR((n_hits * 1e6) / n_truth) AS BIGINT) AS recall_micro
       |FROM (
       |${(Seq(("p06_ann_lsh", 3), ("p19_ivf", 3), ("p26_ivf_nprobe", 3),
              ("p49_pq_topk", 5), ("p58_pq_trained_topk", 5),
              ("p73_ivf_tuned", 3), ("p74_ivfpq", 5),
              ("p93_lsh_multiprobe", 3), ("p97_rot_pq", 5))
            .map { case (n, km) => row(n, oracle0(n), km) } :+
          row("p83_ivfpq_refine", oIvfPqRefineSql, 5))
            .mkString("\nUNION ALL\n")}
       |)""".stripMargin
  }

  /** The p79 oracle: fixture construction, cell assignment, probe
    * sets, the exact ranking, and the recall division — all replayed
    * from the closed form.
    */
  private def oClusteredRecall: String = {
    val ceDef = s"""SELECT vec_id,
       |  list_transform(generate_series(1, 64), d ->
       |    CAST((${oHash("'cc' || CAST(vec_id % 32 AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000
       |        + ${oHash("'cn' || CAST(vec_id AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 21 - 10) AS FLOAT)) AS embedding
       |FROM embeddings""".stripMargin
    def ivf(nprobe: Int) =
      s"""SELECT query_id, cand_id FROM (
         |  SELECT query_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ${oCos("q.embedding", "c.embedding")} AS sim
         |    FROM (SELECT vec_id, embedding, cent_id FROM assign
         |          WHERE rn <= $nprobe AND vec_id < 20) q
         |    JOIN cells c ON q.cent_id = c.cent_id AND q.vec_id != c.vec_id))
         |WHERE rank <= 3""".stripMargin
    def row(nprobe: Int) =
      s"""  SELECT 'ivf_clustered_nlist32_nprobe$nprobe' AS method,
         |    CAST((SELECT COUNT(*) FROM (${ivf(nprobe)}) a
         |          JOIN ex USING (query_id, cand_id)) AS BIGINT) AS n_hits,
         |    CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_truth""".stripMargin
    s"""WITH ce AS ($ceDef),
       |cents AS (SELECT vec_id AS cent_id, embedding AS ce2 FROM ce
       |          WHERE vec_id < 32),
       |assign AS (
       |  SELECT e.vec_id, e.embedding, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oCos("e.embedding", "ce2")} DESC, cent_id ASC) AS rn
       |  FROM ce e, cents),
       |cells AS (SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
       |ex AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${oCos("q.embedding", "c.embedding")} DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM ce q JOIN ce c ON q.vec_id < 20 AND q.vec_id != c.vec_id)
       |  WHERE rank <= 3)
       |SELECT method, n_hits, n_truth,
       |  CAST(FLOOR((n_hits * 1e6) / n_truth) AS BIGINT) AS recall_micro
       |FROM (
       |${row(1)}
       |  UNION ALL
       |${row(2)}
       |)""".stripMargin
  }

  /** The p121 replay — split out so the p123 feature-store oracle
    * can reuse it as a CTE.
    */
  private lazy val oEntropy: String = {

        def branch(explodeSql: String, out: String) =
          s"""SELECT doc_id, MAX(n) AS n_$out,
             |  SUM(CAST(FLOOR(-((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             |    * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
             |    * 1000000.0) AS BIGINT)) AS ${out}_entropy_micro
             |FROM (
             |  SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n
             |  FROM (SELECT doc_id, sym, COUNT(*) AS c
             |        FROM (SELECT doc_id, unnest($explodeSql) AS sym
             |              FROM documents)
             |        GROUP BY doc_id, sym))
             |GROUP BY doc_id""".stripMargin
        val charsExplode = "list_transform(generate_series(1, " +
          "length(text)), i -> substr(text, i, 1))"
        s"""WITH ch AS (${branch(charsExplode, "chars")}),
           |tk AS (${branch(oToks, "toks")})
           |SELECT ch.doc_id, CAST(ch.n_chars AS BIGINT) AS n_chars,
           |  CAST(ch.chars_entropy_micro AS BIGINT)
           |    AS chars_entropy_micro,
           |  CAST(tk.n_toks AS BIGINT) AS n_toks,
           |  CAST(tk.toks_entropy_micro AS BIGINT)
           |    AS toks_entropy_micro
           |FROM ch JOIN tk ON ch.doc_id = tk.doc_id""".stripMargin
        }

  /** The p122 replay: hierarchical fixture, coarse assignment,
    * residuals, BOTH codebooks (raw vectors / residuals of the same
    * rows), both per-subspace code assignments, nprobe=1 probe sets,
    * both ADC rankings, the exact truth, and the recall divisions.
    */
  private def oResidualPq: String = {
    def oDotAt(a: String, b: String, s: Int): String =
      s"""list_sum(list_transform(generate_series(1, 16),
         |        i -> CAST($a[${s * 16} + i] AS DOUBLE)
         |             * CAST($b[${s * 16} + i] AS DOUBLE)))""".stripMargin
    def oD2At(a: String, b: String, s: Int): String =
      s"""(${oDotAt(a, a, s)}
         |     - 2 * ${oDotAt(a, b, s)}
         |     + ${oDotAt(b, b, s)})""".stripMargin
    def codesCtes(prefix: String, vecs: String, vcol: String,
        bookTable: String, bcol: String): String =
      s"""${prefix}scored AS (
         |  SELECT v.vec_id, subs.s, b.code_id,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id, subs.s ORDER BY
         |      (list_sum(list_transform(generate_series(1, 16),
         |         i -> CAST(v.$vcol[subs.s*16 + i] AS DOUBLE)
         |              * CAST(v.$vcol[subs.s*16 + i] AS DOUBLE)))
         |       - 2 * list_sum(list_transform(generate_series(1, 16),
         |         i -> CAST(v.$vcol[subs.s*16 + i] AS DOUBLE)
         |              * CAST(b.$bcol[subs.s*16 + i] AS DOUBLE)))
         |       + list_sum(list_transform(generate_series(1, 16),
         |         i -> CAST(b.$bcol[subs.s*16 + i] AS DOUBLE)
         |              * CAST(b.$bcol[subs.s*16 + i] AS DOUBLE)))) ASC,
         |      b.code_id ASC) AS rn
         |  FROM $vecs v, $bookTable b, subs),
         |${prefix}codes AS (
         |  SELECT vec_id,
         |    MAX(CASE WHEN s = 0 THEN code_id END) AS c0,
         |    MAX(CASE WHEN s = 1 THEN code_id END) AS c1,
         |    MAX(CASE WHEN s = 2 THEN code_id END) AS c2,
         |    MAX(CASE WHEN s = 3 THEN code_id END) AS c3
         |  FROM ${prefix}scored WHERE rn = 1 GROUP BY vec_id)"""
        .stripMargin
    def adCtes(prefix: String, qTable: String, qcol: String,
        codes: String, bookTable: String, bcol: String): String = {
      val terms = (0 until 4)
        .map(s => oD2At(s"q.$qcol", s"e$s.$bcol", s)).mkString("\n    + ")
      val joins = (0 until 4)
        .map(s => s"JOIN $bookTable e$s ON e$s.code_id = w.c$s")
        .mkString("\n  ")
      s"""${prefix}ad AS (
         |  SELECT q.query_id, w.vec_id AS cand_id,
         |    ($terms) AS adist
         |  FROM $qTable q
         |  JOIN cells cc ON cc.cent_id = q.cent_id
         |  JOIN $codes w ON w.vec_id = cc.vec_id
         |  $joins
         |  WHERE q.query_id != w.vec_id),
         |${prefix}top AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY adist ASC, cand_id ASC) AS rank
         |    FROM ${prefix}ad)
         |  WHERE rank <= 10)""".stripMargin
    }
    def recallRow(method: String, top: String): String =
      s"""  SELECT '$method' AS method,
         |    CAST((SELECT COUNT(*) FROM $top a
         |          JOIN ex USING (query_id, cand_id)) AS BIGINT)
         |      AS n_hits,
         |    CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_truth"""
        .stripMargin
    s"""WITH ce AS (
       |  SELECT vec_id,
       |    list_transform(generate_series(1, 64), d ->
       |      CAST((${oHash("'hc' || CAST(vec_id % 8 AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000
       |          + ${oHash("'hp' || CAST((vec_id // 8) % 4 AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 201 - 100
       |          + ${oHash("'hj' || CAST(vec_id AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 11 - 5) AS FLOAT))
       |      AS embedding
       |  FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM ce
       |          WHERE vec_id < 8),
       |assign AS (
       |  SELECT e.vec_id, e.embedding, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oCos("e.embedding", "cv")} DESC, cent_id ASC)
       |      AS rn
       |  FROM ce e, cents),
       |cells AS (SELECT vec_id, embedding, cent_id FROM assign
       |          WHERE rn = 1),
       |rcells AS (
       |  SELECT c.vec_id, c.cent_id,
       |    list_transform(generate_series(1, 64), i ->
       |      CAST(c.embedding[i] AS DOUBLE) - CAST(ct.cv[i] AS DOUBLE))
       |      AS rv
       |  FROM cells c JOIN cents ct ON c.cent_id = ct.cent_id),
       |subs AS (SELECT unnest(generate_series(0, 3)) AS s),
       |pbook AS (SELECT vec_id AS code_id, embedding AS bv FROM ce
       |          WHERE vec_id < 32 AND vec_id % 8 = 0),
       |rbook AS (SELECT vec_id AS code_id, rv AS bv FROM rcells
       |          WHERE vec_id < 32 AND vec_id % 8 = 0),
       |${codesCtes("p_", "cells", "embedding", "pbook", "bv")},
       |${codesCtes("r_", "rcells", "rv", "rbook", "bv")},
       |qraw AS (SELECT vec_id AS query_id, cent_id, embedding AS qv
       |         FROM cells WHERE vec_id < 20),
       |qres AS (SELECT vec_id AS query_id, cent_id, rv AS qv
       |         FROM rcells WHERE vec_id < 20),
       |${adCtes("p_", "qraw", "qv", "p_codes", "pbook", "bv")},
       |${adCtes("r_", "qres", "qv", "r_codes", "rbook", "bv")},
       |rr_sl AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id, ROW_NUMBER() OVER (
       |      PARTITION BY query_id
       |      ORDER BY adist ASC, cand_id ASC) AS rank
       |    FROM r_ad)
       |  WHERE rank <= 30),
       |rr_top AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT s.query_id, s.cand_id, ROW_NUMBER() OVER (
       |      PARTITION BY s.query_id
       |      ORDER BY ${oCos("q.embedding", "c.embedding")} DESC,
       |               s.cand_id ASC) AS rank
       |    FROM rr_sl s
       |    JOIN ce q ON s.query_id = q.vec_id
       |    JOIN ce c ON s.cand_id = c.vec_id)
       |  WHERE rank <= 10),
       |ex AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${oCos("q.embedding", "c.embedding")} DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM ce q JOIN ce c ON q.vec_id < 20 AND q.vec_id != c.vec_id)
       |  WHERE rank <= 10)
       |SELECT method, n_hits, n_truth,
       |  CAST(FLOOR((n_hits * 1e6) / n_truth) AS BIGINT) AS recall_micro
       |FROM (
       |${recallRow("ivfpq_raw_hier", "p_top")}
       |  UNION ALL
       |${recallRow("ivfpq_residual_hier", "r_top")}
       |  UNION ALL
       |${recallRow("ivfpq_residual_refine_hier", "rr_top")}
       |)""".stripMargin
  }

  /** The p66 oracle: the three gate oracles composed verbatim as
    * derived tables (the p56 pattern) — a funnel pass certifies every
    * gate's own replay AND the rollup.
    */
  private def oQualityFunnel: String =
    s"""WITH g AS (${oracle0("p61_gopher_rules")}),
       |c AS (${oracle0("p64_c4_lines")}),
       |q AS (${oracle0("p09_quality")}),
       |d AS (SELECT doc_id, source FROM documents)
       |SELECT d.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_score,
       |  CAST(SUM(g.keep) AS BIGINT) AS n_gopher,
       |  CAST(SUM(c.page_keep) AS BIGINT) AS n_c4,
       |  CAST(SUM(CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END
       |           * g.keep * c.page_keep) AS BIGINT) AS n_all
       |FROM d
       |JOIN g ON d.doc_id = g.doc_id
       |JOIN c ON d.doc_id = c.doc_id
       |JOIN q ON d.doc_id = q.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** The p61 Gopher oracle, parameterized on the [[Curation.GateProfile]]
    * thresholds (the published defaults ARE the p61 entry).
    */
  private def oGopherRules(minWords: Int = 50, minStop: Int = 2): String = {
    val stopCases = TF.gopherStopwords.map(w =>
      s"CASE WHEN list_contains(lw, '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, text, $oToks AS toks,
       |    string_split(text, chr(10)) AS lines
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_toks,
       |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
       |    CAST(len(list_filter(lines, l -> rtrim(l) LIKE '%...')) AS BIGINT) AS n_ell,
       |    CAST(len(list_filter(lines, l ->
       |      substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT) AS n_bul,
       |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    ($stopCases) AS n_stop
       |  FROM (SELECT doc_id, text, toks, lines,
       |          list_transform(toks, t -> lower(t)) AS lw FROM base)),
       |f AS (
       |  SELECT doc_id, n_toks,
       |    CASE WHEN n_toks >= $minWords AND n_toks <= 100000 THEN 1 ELSE 0 END AS r_words,
       |    CASE WHEN sum_len >= n_toks * 3 AND sum_len <= n_toks * 10 THEN 1 ELSE 0 END AS r_mean_len,
       |    CASE WHEN n_hash * 10 <= n_toks THEN 1 ELSE 0 END AS r_hash,
       |    CASE WHEN n_ell * 10 <= n_lines * 3 THEN 1 ELSE 0 END AS r_ellipsis,
       |    CASE WHEN n_bul * 10 <= n_lines * 9 THEN 1 ELSE 0 END AS r_bullet,
       |    CASE WHEN n_alpha * 5 >= n_toks * 4 THEN 1 ELSE 0 END AS r_alpha,
       |    CASE WHEN n_stop >= $minStop THEN 1 ELSE 0 END AS r_stop
       |  FROM m)
       |SELECT doc_id, n_toks,
       |  CAST(r_words AS BIGINT) AS r_words,
       |  CAST(r_mean_len AS BIGINT) AS r_mean_len,
       |  CAST(r_hash AS BIGINT) AS r_hash,
       |  CAST(r_ellipsis AS BIGINT) AS r_ellipsis,
       |  CAST(r_bullet AS BIGINT) AS r_bullet,
       |  CAST(r_alpha AS BIGINT) AS r_alpha,
       |  CAST(r_stop AS BIGINT) AS r_stop,
       |  CAST(r_words * r_mean_len * r_hash * r_ellipsis * r_bullet
       |       * r_alpha * r_stop AS BIGINT) AS keep
       |FROM f""".stripMargin
  }

  /** The p64 C4 oracle, parameterized on the [[Curation.GateProfile]]
    * thresholds (the published defaults ARE the p64 entry).
    */
  private def oC4Lines(minLineWords: Int = 5, requirePunct: Boolean = true,
      minSentences: Int = 3): String = {
    val punctCond =
      if (requirePunct)
        """AND substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')"""
      else ""
    s"""WITH base AS (
       |  SELECT doc_id, text, string_split(text, chr(10)) AS lines,
       |    list_filter(string_split(text, chr(10)),
       |      l -> len(string_split_regex(trim(l), '\\s+')) >= $minLineWords
       |           $punctCond) AS kept
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(kept) AS BIGINT) AS n_kept,
       |    CAST(len(list_filter(lines, l ->
       |      substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"'))) AS BIGINT) AS n_punct_lines,
       |    CAST(length(text) - length(regexp_replace(text, '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
       |    CAST(CASE WHEN text LIKE '%{%' THEN 1 ELSE 0 END AS BIGINT) AS has_brace,
       |    CAST(CASE WHEN lower(text) LIKE '%lorem ipsum%' THEN 1 ELSE 0 END AS BIGINT) AS has_lorem,
       |    substr(md5(coalesce(array_to_string(kept, chr(10)), '')), 1, 16) AS clean_fp
       |  FROM base)
       |SELECT doc_id, n_lines, n_kept, n_punct_lines, n_sentences,
       |  has_brace, has_lorem,
       |  CAST(CASE WHEN has_brace = 0 AND has_lorem = 0
       |    AND n_sentences >= $minSentences AND n_kept >= 1
       |    THEN 1 ELSE 0 END AS BIGINT) AS page_keep,
       |  clean_fp
       |FROM m""".stripMargin
  }

  /** NB classifier refit from scratch: funnel labels via the p61/p64/
    * p09 oracle CTEs at the wordSalad gate profile (the corpus is
    * punctuation-free synthetic text — published thresholds would
    * label every document negative; see [[Curation.GateProfile]]),
    * one-pass class-conditional counts, the same
    * top-500 vocabulary cut / add-one smoothing / micro-nat floors as
    * [[Curation.nbCostTables]], prior from doc labels.
    */
  private def oNbClassifier: String =
    s"""WITH g AS (${oGopherRules(minWords = 20, minStop = 1)}),
       |c AS (${oC4Lines(minLineWords = 3, requirePunct = false,
                minSentences = 0)}),
       |q AS (${oracle0("p09_quality")}),
       |lab AS (
       |  SELECT d.doc_id,
       |    CAST(CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END
       |         * g.keep * c.page_keep AS BIGINT) AS cls
       |  FROM documents d
       |  JOIN g ON d.doc_id = g.doc_id
       |  JOIN c ON d.doc_id = c.doc_id
       |  JOIN q ON d.doc_id = q.doc_id),
       |toks AS (SELECT doc_id, unnest($oToks) AS tok FROM documents),
       |lt AS (
       |  SELECT t.doc_id, t.tok, lab.cls
       |  FROM toks t JOIN lab ON t.doc_id = lab.doc_id),
       |cnt AS (
       |  SELECT tok, SUM(cls) AS c1, COUNT(*) - SUM(cls) AS c0,
       |    COUNT(*) AS cc
       |  FROM lt GROUP BY tok),
       |tot AS (SELECT SUM(c1) AS t1, SUM(c0) AS t0 FROM cnt),
       |vocab AS (SELECT tok, c1, c0 FROM cnt ORDER BY cc DESC, tok LIMIT 500),
       |costs AS (
       |  SELECT tok,
       |    CAST(FLOOR((ln((c1 + 1) / CAST(t1 + 501 AS DOUBLE))
       |              - ln((c0 + 1) / CAST(t0 + 501 AS DOUBLE))) * 1e6)
       |      AS BIGINT) AS llr
       |  FROM vocab, tot),
       |ov AS (
       |  SELECT CAST(FLOOR((ln(1 / CAST(t1 + 501 AS DOUBLE))
       |                   - ln(1 / CAST(t0 + 501 AS DOUBLE))) * 1e6)
       |    AS BIGINT) AS oov_llr
       |  FROM tot),
       |pri AS (
       |  SELECT CAST(FLOOR(ln((SUM(cls) + 1)
       |    / CAST(COUNT(*) - SUM(cls) + 1 AS DOUBLE)) * 1e6) AS BIGINT)
       |    AS prior_llr
       |  FROM lab)
       |SELECT lt.doc_id, lt.cls,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(pri.prior_llr + SUM(COALESCE(costs.llr, ov.oov_llr))
       |    AS BIGINT) AS llr_micro,
       |  CAST(CASE WHEN pri.prior_llr
       |         + SUM(COALESCE(costs.llr, ov.oov_llr)) > 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM lt CROSS JOIN ov CROSS JOIN pri
       |LEFT JOIN costs ON lt.tok = costs.tok
       |GROUP BY lt.doc_id, lt.cls, pri.prior_llr""".stripMargin

  /** Bigram LM refit from scratch: positional predecessor extraction,
    * bigram/context/unigram count tables, and the same λ=0.5
    * interpolation + micro-nat floors as [[Curation.bigramLogLoss]].
    */
  private def oBigramLm: String =
    s"""WITH base AS (SELECT doc_id, $oToks AS toks FROM documents),
       |occ AS (
       |  SELECT doc_id, toks[i] AS cur,
       |    CASE WHEN i > 1 THEN toks[i - 1] END AS prev
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks))) AS i
       |        FROM base)),
       |bg AS (
       |  SELECT prev, cur, COUNT(*) AS cbi FROM occ
       |  WHERE prev IS NOT NULL GROUP BY prev, cur),
       |ctx AS (SELECT prev, SUM(cbi) AS cctx FROM bg GROUP BY prev),
       |uni AS (SELECT cur, COUNT(*) AS cu FROM occ GROUP BY cur),
       |tot AS (SELECT SUM(cu) AS t FROM uni),
       |vocab AS (SELECT cur, cu FROM uni ORDER BY cu DESC, cur LIMIT 500)
       |SELECT o.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN o.prev IS NULL THEN
       |      FLOOR(-ln((COALESCE(v.cu, 0) + 1) / CAST(t + 501 AS DOUBLE)) * 1e6)
       |    ELSE
       |      FLOOR(-ln(0.5 * COALESCE(CAST(bg.cbi AS DOUBLE)
       |                             / CAST(ctx.cctx AS DOUBLE), 0.0)
       |        + 0.5 * ((COALESCE(v.cu, 0) + 1) / CAST(t + 501 AS DOUBLE)))
       |        * 1e6)
       |    END) AS BIGINT) AS nll_micro,
       |  CAST(SUM(CASE WHEN o.prev IS NULL THEN
       |      FLOOR(-ln((COALESCE(v.cu, 0) + 1) / CAST(t + 501 AS DOUBLE)) * 1e6)
       |    ELSE
       |      FLOOR(-ln(0.5 * COALESCE(CAST(bg.cbi AS DOUBLE)
       |                             / CAST(ctx.cctx AS DOUBLE), 0.0)
       |        + 0.5 * ((COALESCE(v.cu, 0) + 1) / CAST(t + 501 AS DOUBLE)))
       |        * 1e6)
       |    END) AS BIGINT) // COUNT(*) AS avg_nll_micro
       |FROM occ o
       |LEFT JOIN vocab v ON o.cur = v.cur
       |LEFT JOIN bg ON o.prev = bg.prev AND o.cur = bg.cur
       |LEFT JOIN ctx ON o.prev = ctx.prev
       |CROSS JOIN tot
       |GROUP BY o.doc_id""".stripMargin

  /** Kneser-Ney refit from scratch: the p82 count tables plus the
    * distinct-successor (n1fwd), distinct-predecessor (n1p), and
    * bigram-type-total (nbi) statistics, then the D=0.75 absolute
    * discount replayed per position with continuation back-off at
    * position 1 / unseen contexts. Mirrors [[Curation.knScore]].
    */
  private def oKnBigram: String = {
    val pcont = "(COALESCE(ct.n1p, 0) + 1) / CAST(nbi + 501 AS DOUBLE)"
    val pkn = "GREATEST(COALESCE(bg.cbi, 0) - 0.75, 0)" +
      " / CAST(ctx.cctx AS DOUBLE)" +
      s" + 0.75 * ctx.n1fwd / CAST(ctx.cctx AS DOUBLE) * ($pcont)"
    s"""WITH base AS (SELECT doc_id, $oToks AS toks FROM documents),
       |occ AS (
       |  SELECT doc_id, toks[i] AS cur,
       |    CASE WHEN i > 1 THEN toks[i - 1] END AS prev
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks))) AS i
       |        FROM base)),
       |bg AS (
       |  SELECT prev, cur, COUNT(*) AS cbi FROM occ
       |  WHERE prev IS NOT NULL GROUP BY prev, cur),
       |ctx AS (
       |  SELECT prev, SUM(cbi) AS cctx, COUNT(*) AS n1fwd
       |  FROM bg GROUP BY prev),
       |uni AS (SELECT cur, COUNT(*) AS cu FROM occ GROUP BY cur),
       |vocab AS (SELECT cur, cu FROM uni ORDER BY cu DESC, cur LIMIT 500),
       |ct AS (
       |  SELECT v.cur, COALESCE(p.n1p, 0) AS n1p
       |  FROM vocab v LEFT JOIN (
       |    SELECT cur, COUNT(*) AS n1p FROM bg GROUP BY cur) p
       |  ON v.cur = p.cur),
       |nb AS (SELECT COUNT(*) AS nbi FROM bg)
       |SELECT o.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN o.prev IS NULL OR ctx.cctx IS NULL THEN
       |      FLOOR(-ln($pcont) * 1e6)
       |    ELSE FLOOR(-ln($pkn) * 1e6) END) AS BIGINT) AS nll_micro,
       |  CAST(SUM(CASE WHEN o.prev IS NULL OR ctx.cctx IS NULL THEN
       |      FLOOR(-ln($pcont) * 1e6)
       |    ELSE FLOOR(-ln($pkn) * 1e6) END) AS BIGINT) // COUNT(*)
       |    AS avg_nll_micro
       |FROM occ o
       |LEFT JOIN ct ON o.cur = ct.cur
       |LEFT JOIN bg ON o.prev = bg.prev AND o.cur = bg.cur
       |LEFT JOIN ctx ON o.prev = ctx.prev
       |CROSS JOIN nb
       |GROUP BY o.doc_id""".stripMargin
  }

  /** DSIR refit from scratch: the funnel label CTEs (wordSalad
    * thresholds, as oNbClassifier), hashed unigram+bigram buckets,
    * target-vs-raw add-one log-ratios, per-doc weight sums, and the
    * deterministic Gumbel top-k key replayed bit-for-bit. Mirrors
    * [[Curation.dsirPlan]].
    */
  private def oDsir: String = {
    val draw = oHash("'dsir' || CAST(doc_id AS VARCHAR)") + " % 1000000"
    s"""WITH g AS (${oGopherRules(minWords = 20, minStop = 1)}),
       |c AS (${oC4Lines(minLineWords = 3, requirePunct = false,
                minSentences = 0)}),
       |q AS (${oracle0("p09_quality")}),
       |lab AS (
       |  SELECT d.doc_id,
       |    CAST(CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END
       |         * g.keep * c.page_keep AS BIGINT) AS cls
       |  FROM documents d
       |  JOIN g ON d.doc_id = g.doc_id
       |  JOIN c ON d.doc_id = c.doc_id
       |  JOIN q ON d.doc_id = q.doc_id),
       |base AS (SELECT doc_id, $oToks AS toks FROM documents),
       |feats AS (
       |  SELECT doc_id, ${oHash("tok")} % 512 AS bucket
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
       |  UNION ALL
       |  SELECT doc_id, ${oHash("toks[i] || ' ' || toks[i + 1]")} % 512
       |    AS bucket
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM base)),
       |lf AS (
       |  SELECT f.doc_id, f.bucket, lab.cls
       |  FROM feats f JOIN lab ON f.doc_id = lab.doc_id),
       |cnt AS (
       |  SELECT bucket, SUM(cls) AS ct, COUNT(*) AS cr
       |  FROM lf GROUP BY bucket),
       |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
       |llr AS (
       |  SELECT bucket,
       |    CAST(FLOOR((ln((ct + 1) / CAST(tt + 512 AS DOUBLE))
       |              - ln((cr + 1) / CAST(tr + 512 AS DOUBLE))) * 1e6)
       |      AS BIGINT) AS llr_micro
       |  FROM cnt, tot),
       |sc AS (
       |  SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |    CAST(SUM(COALESCE(l.llr_micro, 0)) AS BIGINT) AS logw_micro
       |  FROM feats f LEFT JOIN llr l ON f.bucket = l.bucket
       |  GROUP BY f.doc_id),
       |keyed AS (
       |  SELECT doc_id, n_feats, logw_micro,
       |    logw_micro + CAST(FLOOR(-ln(-ln((($draw) + 0.5) / 1e6)) * 1e6)
       |      AS BIGINT) AS key_micro
       |  FROM sc)
       |SELECT CAST(ROW_NUMBER()
       |    OVER (ORDER BY key_micro DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, n_feats, logw_micro, key_micro
       |FROM keyed ORDER BY key_micro DESC, doc_id LIMIT 100""".stripMargin
  }

  /** DoReMi-lite refit: the KN tables of oKnBigram, scoring grouped
    * by SOURCE, then the excess-loss weight chain — integer floors
    * before the cross-domain normalization, `//` exact after.
    * Mirrors [[Curation.domainMixWeightsPlan]].
    */
  /** The p92 refit as a PREFIXED CTE chain over an arbitrary source
    * relation (must expose doc_id, source, text), ending at
    * `${p}res(source, n_docs, n_tokens, avg_nll_micro, excess_micro,
    * weight_micro)` — so the iterated query (p110) can run the whole
    * chain twice in one statement.
    */
  private def oDomainMixCtes(p: String, src: String): String = {
    val pcont = s"(COALESCE(${p}ct.n1p, 0) + 1) / CAST(nbi + 501 AS DOUBLE)"
    val pkn = s"GREATEST(COALESCE(${p}bg.cbi, 0) - 0.75, 0)" +
      s" / CAST(${p}ctx.cctx AS DOUBLE)" +
      s" + 0.75 * ${p}ctx.n1fwd / CAST(${p}ctx.cctx AS DOUBLE) * ($pcont)"
    val cost = s"""CASE WHEN o.prev IS NULL OR ${p}ctx.cctx IS NULL THEN
       |      FLOOR(-ln($pcont) * 1e6)
       |    ELSE FLOOR(-ln($pkn) * 1e6) END""".stripMargin
    s"""${p}base AS MATERIALIZED (
       |  SELECT doc_id, source, $oToks AS toks FROM $src),
       |${p}occ AS MATERIALIZED (
       |  SELECT doc_id, source, toks[i] AS cur,
       |    CASE WHEN i > 1 THEN toks[i - 1] END AS prev
       |  FROM (SELECT doc_id, source, toks,
       |          unnest(generate_series(1, len(toks))) AS i
       |        FROM ${p}base)),
       |${p}bg AS MATERIALIZED (
       |  SELECT prev, cur, COUNT(*) AS cbi FROM ${p}occ
       |  WHERE prev IS NOT NULL GROUP BY prev, cur),
       |${p}ctx AS (
       |  SELECT prev, SUM(cbi) AS cctx, COUNT(*) AS n1fwd
       |  FROM ${p}bg GROUP BY prev),
       |${p}uni AS (SELECT cur, COUNT(*) AS cu FROM ${p}occ GROUP BY cur),
       |${p}vocab AS (SELECT cur, cu FROM ${p}uni
       |              ORDER BY cu DESC, cur LIMIT 500),
       |${p}ct AS (
       |  SELECT v.cur, COALESCE(q.n1p, 0) AS n1p
       |  FROM ${p}vocab v LEFT JOIN (
       |    SELECT cur, COUNT(*) AS n1p FROM ${p}bg GROUP BY cur) q
       |  ON v.cur = q.cur),
       |${p}nb AS (SELECT COUNT(*) AS nbi FROM ${p}bg),
       |${p}sc AS (
       |  SELECT o.source,
       |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM($cost) AS BIGINT) // COUNT(*) AS avg_nll_micro
       |  FROM ${p}occ o
       |  LEFT JOIN ${p}ct ON o.cur = ${p}ct.cur
       |  LEFT JOIN ${p}bg ON o.prev = ${p}bg.prev AND o.cur = ${p}bg.cur
       |  LEFT JOIN ${p}ctx ON o.prev = ${p}ctx.prev
       |  CROSS JOIN ${p}nb
       |  GROUP BY o.source),
       |${p}nd AS (SELECT source, COUNT(*) AS n_docs FROM $src
       |       GROUP BY source),
       |${p}mn AS (SELECT MIN(avg_nll_micro) AS mn FROM ${p}sc),
       |${p}tt AS (SELECT SUM(n_tokens) AS ntot FROM ${p}sc),
       |${p}w AS (
       |  SELECT source, n_tokens, avg_nll_micro,
       |    avg_nll_micro - mn AS excess_micro,
       |    CAST(FLOOR((n_tokens / CAST(ntot AS DOUBLE))
       |      * exp((avg_nll_micro - mn) / 1e6) * 1e6) AS BIGINT) AS w_int
       |  FROM ${p}sc, ${p}mn, ${p}tt),
       |${p}sw AS (SELECT SUM(w_int) AS s FROM ${p}w),
       |${p}res AS (
       |  SELECT w.source, nd.n_docs, w.n_tokens, w.avg_nll_micro,
       |    w.excess_micro,
       |    CAST((w_int * 1000000) // s AS BIGINT) AS weight_micro
       |  FROM ${p}w w JOIN ${p}nd nd ON w.source = nd.source, ${p}sw)"""
      .stripMargin
  }

  private def oDomainMix: String =
    s"""WITH ${oDomainMixCtes("", "documents")}
       |SELECT * FROM res""".stripMargin

  /** BM25 refit from scratch: postings/doclen/stats, query terms from
    * every budget-strided document's first `qTerms` tokens
    * ([[oQStride]] — absolute |Q| at any SF), df over the
    * query-pruned postings, and the exact micro-floored per-term
    * contributions of [[Retrieval.bm25Scores]] — same operation order
    * as the Spark expressions, so the floors agree bit-for-bit.
    */
  private def oBm25(k1: Double, b: Double, qTerms: Int,
      topK: Int): String =
    s"""${oBm25Ctes(k1, b, qTerms)}
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  CAST(n_terms AS BIGINT) AS n_terms, score_micro
       |FROM rk WHERE rank <= $topK""".stripMargin

  /** The [[oBm25]] chain up to the ranked candidates (`rk`) — shared
    * with the p119 fusion oracle.
    */
  /** `baseCteBody` overrides the CTE the index builds on: it must
    * yield (doc_id, toks, qtoks) where `toks` are the INDEXED tokens
    * (p177's long-doc fixture pads them) and `qtoks` what the planted
    * queries tokenize (always the unpadded span). The default reads
    * the raw table, with `qtoks` = `toks`.
    */
  private def oBm25Ctes(k1: Double, b: Double,
      qTerms: Int, baseCteBody: Option[String] = None): String = {
    val avgdl = "(CAST(st.sdl AS DOUBLE) / CAST(st.nd AS DOUBLE))"
    val idf = "ln(1.0 + (CAST(st.nd AS DOUBLE) - CAST(f.df AS DOUBLE)" +
      " + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))"
    val norm = s"(CAST(p.tf AS DOUBLE) * ${k1 + 1}" +
      s" / (CAST(p.tf AS DOUBLE) + $k1 * (${1 - b}" +
      s" + $b * (CAST(d.dl AS DOUBLE) / $avgdl))))"
    val baseBody = baseCteBody.getOrElse(
      s"SELECT doc_id, $oToks AS toks, $oToks AS qtoks FROM documents")
    s"""WITH base AS ($baseBody),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl
       |       FROM base),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
       |         CAST(SUM(dl) AS BIGINT) AS sdl FROM dl),
       |post AS (
       |  SELECT tok, doc_id, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
       |  GROUP BY tok, doc_id),
       |qt AS (
       |  SELECT doc_id AS query_id, qtoks[i] AS tok
       |  FROM (SELECT doc_id, qtoks,
       |          unnest(generate_series(1, least(len(qtoks), $qTerms)))
       |            AS i
       |        FROM base WHERE doc_id % ${oQStride("base")} = 0)
       |  GROUP BY 1, 2),
       |dfq AS (
       |  SELECT p.tok, COUNT(*) AS df FROM post p
       |  WHERE p.tok IN (SELECT DISTINCT tok FROM qt)
       |  GROUP BY p.tok),
       |sc AS (
       |  SELECT q.query_id, p.doc_id, COUNT(*) AS n_terms,
       |    CAST(SUM(CAST(FLOOR($idf * $norm * 1000000.0) AS BIGINT))
       |      AS BIGINT) AS score_micro
       |  FROM post p
       |  JOIN qt q ON p.tok = q.tok
       |  JOIN dfq f ON p.tok = f.tok
       |  JOIN dl d ON p.doc_id = d.doc_id
       |  CROSS JOIN st
       |  GROUP BY q.query_id, p.doc_id),
       |rk AS (
       |  SELECT query_id, doc_id, n_terms, score_micro,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS rank
       |  FROM sc)""".stripMargin
  }

  /** Logistic-regression trajectory replay: the funnel-label CTEs (as
    * oNbClassifier), distinct hashed feature presences, and `iters`
    * generated rounds of (gradient, floor-division weight update,
    * margin, floored sigmoid residual) — mirroring
    * [[Curation.logisticRegressionPlan]] round for round. All
    * cross-row arithmetic is int64; the `(g - ((g % m) + m) % m) // m`
    * dance makes the division exact so truncating and flooring
    * engines agree.
    */
  private def oLrClassifier(buckets: Int, iters: Int,
      lrDen: Int): String = {
    def sigma(z: String) =
      s"1.0 / (1.0 + exp(-(CAST($z AS DOUBLE) / 1000000.0)))"
    def fdiv(g: String) =
      s"(($g - ((($g) % nd.m) + nd.m) % nd.m) // nd.m)"
    val sb = new StringBuilder
    sb.append(s"""WITH g AS (${oGopherRules(minWords = 20, minStop = 1)}),
      |c AS (${oC4Lines(minLineWords = 3, requirePunct = false,
               minSentences = 0)}),
      |q AS (${oracle0("p09_quality")}),
      |lab AS MATERIALIZED (
      |  SELECT d.doc_id,
      |    CAST(CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END
      |         * g.keep * c.page_keep AS BIGINT) AS cls
      |  FROM documents d
      |  JOIN g ON d.doc_id = g.doc_id
      |  JOIN c ON d.doc_id = c.doc_id
      |  JOIN q ON d.doc_id = q.doc_id),
      |feats AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, ${oHash("tok")} % $buckets AS bucket
      |  FROM (SELECT doc_id, unnest($oToks) AS tok FROM documents)),
      |nd AS MATERIALIZED (SELECT COUNT(*) * $lrDen AS m FROM lab),
      |r0 AS MATERIALIZED (SELECT doc_id, 500000 - cls * 1000000 AS r
      |  FROM lab)""")
    for (t <- 1 to iters) {
      sb.append(s""",
        |g$t AS MATERIALIZED (
        |  SELECT f.bucket, SUM(r.r) AS g
        |  FROM feats f JOIN r${t - 1} r ON f.doc_id = r.doc_id
        |  GROUP BY f.bucket),""")
      if (t == 1)
        sb.append(s"""
          |w1 AS MATERIALIZED (
          |  SELECT bucket, -${fdiv("g")} AS w FROM g1, nd)""")
      else
        sb.append(s"""
          |w$t AS MATERIALIZED (
          |  SELECT w.bucket, w.w - ${fdiv("g.g")} AS w
          |  FROM w${t - 1} w JOIN g$t g ON w.bucket = g.bucket, nd)""")
      if (t < iters)
        sb.append(s""",
          |z$t AS MATERIALIZED (
          |  SELECT f.doc_id, SUM(w.w) AS z
          |  FROM feats f JOIN w$t w ON f.bucket = w.bucket
          |  GROUP BY f.doc_id),
          |r$t AS MATERIALIZED (
          |  SELECT l.doc_id,
          |    CAST(FLOOR((${sigma("z.z")} - l.cls) * 1000000)
          |      AS BIGINT) AS r
          |  FROM lab l JOIN z$t z ON l.doc_id = z.doc_id)""")
    }
    sb.append(s"""
      |SELECT l.doc_id, l.cls, CAST(COUNT(*) AS BIGINT) AS n_feats,
      |  CAST(SUM(w.w) AS BIGINT) AS z_micro,
      |  CAST(CASE WHEN SUM(w.w) > 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS pred
      |FROM feats f
      |JOIN w$iters w ON f.bucket = w.bucket
      |JOIN lab l ON f.doc_id = l.doc_id
      |GROUP BY l.doc_id, l.cls""")
    sb.toString.stripMargin
  }

  private def oSourceDupRates: String =
    s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
           |edges AS (
           |  SELECT doc_a AS u, doc_b AS v FROM pairs
           |  UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |dec AS (SELECT u AS doc_id,
           |    CASE WHEN u = MIN(v) THEN 1 ELSE 0 END AS keep
           |  FROM reach GROUP BY u),
           |nt AS (SELECT doc_id, source,
           |    CAST(len($oToks) AS BIGINT) AS n_toks FROM documents)
           |SELECT nt.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN dec.doc_id IS NOT NULL THEN 1 ELSE 0
           |    END) AS BIGINT) AS n_clustered,
           |  CAST(SUM(CASE WHEN dec.keep = 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dropped,
           |  CAST(SUM(CASE WHEN dec.keep = 0 THEN nt.n_toks ELSE 0
           |    END) AS BIGINT) AS toks_dropped,
           |  (CAST(SUM(CASE WHEN dec.doc_id IS NOT NULL THEN 1 ELSE 0
           |    END) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT)
           |    AS dup_rate_micro
           |FROM nt LEFT JOIN dec ON nt.doc_id = dec.doc_id
           |GROUP BY nt.source""".stripMargin

  private def oReleaseDiffCard: String =
    s"""WITH oldr AS (
           |  SELECT doc_id, source,
           |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp,
           |    CAST(len($oToks) AS BIGINT) AS nt
           |  FROM documents),
           |r2 AS (
           |  SELECT doc_id, source,
           |    CASE WHEN doc_id % 7 = 3
           |         THEN text || ' release2 amendment' ELSE text END
           |      AS text
           |  FROM documents WHERE doc_id % 7 != 2
           |  UNION ALL
           |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
           |    source,
           |    text || ' brand new document' AS text
           |  FROM documents WHERE doc_id % 7 = 4),
           |newr AS (
           |  SELECT doc_id, source,
           |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp,
           |    CAST(len($oToks) AS BIGINT) AS nt
           |  FROM r2),
           |j AS (
           |  SELECT COALESCE(n.source, o.source) AS source,
           |    CASE WHEN o.fp IS NULL THEN 'added'
           |         WHEN n.fp IS NULL THEN 'removed'
           |         WHEN o.fp != n.fp THEN 'modified'
           |         ELSE 'unchanged' END AS status,
           |    COALESCE(o.nt, 0) AS nt_o, COALESCE(n.nt, 0) AS nt_n
           |  FROM oldr o FULL OUTER JOIN newr n ON o.doc_id = n.doc_id)
           |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(nt_o) AS BIGINT) AS n_toks_old,
           |  CAST(SUM(nt_n) AS BIGINT) AS n_toks_new,
           |  CAST(SUM(nt_n) - SUM(nt_o) AS BIGINT) AS tok_delta
           |FROM j GROUP BY source, status""".stripMargin

  /** The serving-index certification replay, parameterized on the
    * relation feeding the CODES side (`rel` must expose
    * (vec_id, embedding)): p178 certifies the base export
    * (rel = embeddings); p181 certifies the APPENDED directory
    * (rel = base ∪ delta) against the same frozen centroid/codebook
    * rows. `pre` prepends extra CTEs (the delta construction).
    */
  private def oServingCertify(rel: String, pre: String = ""): String = {
    def vecRow(tag: String, pred: String, idc: String) =
      s"""SELECT '$tag' AS artifact,
         |  CAST(COUNT(DISTINCT $idc) AS BIGINT) AS n_rows,
         |  CAST(SUM(${oHash(
            s"CAST($idc AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)" +
              " || ':' || CAST(CAST(FLOOR(CAST(embedding[i] AS DOUBLE)" +
              " * 1e6) AS BIGINT) AS VARCHAR)")}
         |    % 268435456) AS BIGINT) AS checksum
         |FROM embeddings,
         |  (SELECT unnest(generate_series(1, 64)) AS i)
         |WHERE $pred""".stripMargin
    s"""WITH $pre ccents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
       |  WHERE vec_id % 25 = 0),
       |asg AS (
       |  SELECT e.vec_id, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oCos("e.embedding", "ce")} DESC,
       |        cent_id ASC) AS rn
       |  FROM $rel e, ccents),
       |cells AS (SELECT vec_id, cent_id FROM asg WHERE rn = 1),
       |pcents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
       |  WHERE vec_id < 8),
       |subs AS (SELECT unnest(generate_series(0, 3)) AS s),
       |pq AS (
       |  SELECT e.vec_id, subs.s, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, subs.s ORDER BY
       |      (list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(e.embedding[subs.s*16 + i] AS DOUBLE)))
       |       - 2 * list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))
       |       + list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(c.ce[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))) ASC,
       |      c.cent_id ASC) AS rn
       |  FROM $rel e, pcents c, subs),
       |codes AS (
       |  SELECT p.vec_id, cl.cent_id, p.s AS subspace,
       |    p.cent_id AS code
       |  FROM pq p JOIN cells cl ON p.vec_id = cl.vec_id
       |  WHERE p.rn = 1)
       |${vecRow("centroids", "vec_id % 25 = 0", "vec_id")}
       |UNION ALL
       |${vecRow("codebook", "vec_id < 8", "vec_id")}
       |UNION ALL
       |SELECT 'codes' AS artifact,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(${oHash(
            "CAST(vec_id AS VARCHAR) || ':' || CAST(cent_id AS VARCHAR)" +
              " || ':' || CAST(subspace AS VARCHAR) || ':' ||" +
              " CAST(code AS VARCHAR)")}
       |    % 268435456) AS BIGINT) AS checksum
       |FROM codes""".stripMargin
  }

  /** The p180 oracle: each section is the STANDALONE card's oracle,
    * embedded verbatim as a derived table and melted to the composite's
    * (section, item, metric, value) long format — so the composite is
    * certified to be exactly the standalone cards, reshaped.
    */
  private def oReleaseSignoff: String = {
    def melt(section: String, itemSql: String, inner: String,
        metrics: Seq[String]): String =
      metrics.map { m =>
        s"""SELECT '$section' AS section,
           |  CAST($itemSql AS VARCHAR) AS item, '$m' AS metric,
           |  CAST($m AS BIGINT) AS value FROM ($inner)""".stripMargin
      }.mkString("\nUNION ALL\n")
    val sweep = Seq(40, 90, 96, 98).map { t =>
      s"""SELECT 'threshold_sweep' AS section,
         |  CAST($t AS VARCHAR) AS item, 'n_pairs' AS metric,
         |  CAST(COUNT(*) AS BIGINT) AS value
         |  FROM (${oJaccardPairs(k = 4, threshold = 0.4)})
         |  WHERE jaccard_micro >= ${t}0000""".stripMargin
    }.mkString("\nUNION ALL\n")
    Seq(
      melt("dedup_impact", "bucket", oracle0("p107_dedup_impact"),
        Seq("n_clusters", "n_docs", "n_docs_removed", "toks_removed")),
      sweep,
      melt("source_dup", "source", oSourceDupRates,
        Seq("n_docs", "n_clustered", "n_dropped", "toks_dropped",
          "dup_rate_micro")),
      melt("retrieval", "method", oDedupRetrievalImpact,
        Seq("n_queries", "n_hits", "mrr_micro", "ndcg_micro")),
      melt("release_diff", "source || '|' || status",
        oReleaseDiffCard,
        Seq("n_docs", "n_toks_old", "n_toks_new"))
    ).mkString("\nUNION ALL\n")
  }

  /** The p189 oracle: closed-form base + drifted fixtures, the frozen
    * quantizer (base rows < 32 / < 8), coarse assignment and PQ codes
    * over the FULL final mass (codes are append-invariant — the
    * frozen quantizer never re-codes, so one codes table serves every
    * stage restricted by id range), per-vector floored reconstruction
    * errors, and per (stage, mass) the served ADC top-3 against the
    * exact cosine ranking over that stage's union — all in the
    * integer/double op order the engine uses (the oIvfPqAd
    * conventions, green on p74/p178/p181).
    */
  private lazy val oQuantizerDrift: String = {
    def oDotAt(a: String, b: String, s: Int): String =
      s"""list_sum(list_transform(generate_series(1, 16),
         |      i -> CAST($a[${s * 16} + i] AS DOUBLE)
         |           * CAST($b[${s * 16} + i] AS DOUBLE)))""".stripMargin
    def oD2At(a: String, b: String, s: Int): String =
      s"""(${oDotAt(a, a, s)}
         |   - 2 * ${oDotAt(a, b, s)}
         |   + ${oDotAt(b, b, s)})""".stripMargin
    val baseDef =
      s"""SELECT vec_id,
         |  list_transform(generate_series(1, 64), d ->
         |    CAST((${oHash("'cc' || CAST(vec_id % 32 AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000
         |        + ${oHash("'cn' || CAST(vec_id AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 21 - 10) AS FLOAT)) AS embedding
         |FROM embeddings""".stripMargin
    def driftDef(stage: Int) =
      s"""SELECT vec_id,
         |  list_transform(generate_series(1, 64), d ->
         |    CAST((${oHash(s"'dc$stage' || CAST(vec_id % 32 AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001 - 1000
         |        + ${oHash(s"'dn$stage' || CAST(vec_id AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 21 - 10) AS FLOAT)) AS embedding
         |FROM (SELECT vec_id + ${stage * 1000000L} AS vec_id
         |      FROM embeddings WHERE vec_id % 4 = $stage)""".stripMargin
    val adTerms = (0 until 4)
      .map(s => oD2At("q.embedding", s"e$s.ce", s)).mkString("\n  + ")
    // one (stage, mass) scorecard row: served ADC top-3 vs exact
    // cosine top-3 over the stage's union, plus the mass's recon stats
    def rowSql(stage: String, mass: String, unionPred: String,
        massPred: String, qPred: String): String = {
      val served =
        s"""SELECT query_id, cand_id FROM (
           |  SELECT q.vec_id AS query_id, w.vec_id AS cand_id,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |      ($adTerms) ASC, w.vec_id ASC) AS rn
           |  FROM (SELECT vec_id, embedding FROM u2 WHERE $qPred) q
           |  JOIN (SELECT qid, cent_id FROM (
           |          SELECT q2.vec_id AS qid, c.cent_id,
           |            ROW_NUMBER() OVER (PARTITION BY q2.vec_id
           |              ORDER BY ${oCos("q2.embedding", "c.ce")} DESC,
           |                c.cent_id ASC) AS prn
           |          FROM (SELECT vec_id, embedding FROM u2
           |                WHERE $qPred) q2, ccents c)
           |        WHERE prn <= 2) pr ON pr.qid = q.vec_id
           |  JOIN asg cc ON cc.cent_id = pr.cent_id
           |    AND ${unionPred.replace("vec_id", "cc.vec_id")}
           |  JOIN codesw w ON w.vec_id = cc.vec_id
           |  JOIN pcents e0 ON e0.cent_id = w.c0
           |  JOIN pcents e1 ON e1.cent_id = w.c1
           |  JOIN pcents e2 ON e2.cent_id = w.c2
           |  JOIN pcents e3 ON e3.cent_id = w.c3
           |  WHERE q.vec_id != w.vec_id) WHERE rn <= 3""".stripMargin
      val exact =
        s"""SELECT query_id, cand_id FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${oCos("q.embedding", "c.embedding")} DESC,
           |        c.vec_id ASC) AS rn
           |  FROM (SELECT vec_id, embedding FROM u2 WHERE $qPred) q
           |  JOIN u2 c ON ${unionPred.replace("vec_id", "c.vec_id")}
           |    AND c.vec_id != q.vec_id) WHERE rn <= 3""".stripMargin
      s"""SELECT '$stage' AS stage, '$mass' AS mass,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM recon
         |   WHERE $massPred) AS n_vecs,
         |  (SELECT CAST(SUM(e) // COUNT(*) AS BIGINT) FROM recon
         |   WHERE $massPred) AS recon_err,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ($served) a
         |   JOIN ($exact) e ON a.query_id = e.query_id
         |    AND a.cand_id = e.cand_id) AS n_hits,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ($exact)) AS n_truth"""
        .stripMargin
    }
    val reconTerms = (0 until 4)
      .map(s => oD2At("v.embedding", s"e$s.ce", s)).mkString("\n  + ")
    val rows = Seq(
      ("0_export", "base", "vec_id < 1000000", "vec_id < 1000000",
        "vec_id < 16"),
      ("1_append25", "base", "vec_id < 2000000", "vec_id < 1000000",
        "vec_id < 16"),
      ("1_append25", "delta", "vec_id < 2000000",
        "vec_id >= 1000000 AND vec_id < 2000000",
        "vec_id >= 1000000 AND vec_id < 1000064"),
      ("2_append50", "base", "vec_id < 3000000", "vec_id < 1000000",
        "vec_id < 16"),
      ("2_append50", "delta", "vec_id < 3000000",
        "vec_id >= 1000000",
        "vec_id >= 1000000 AND vec_id < 1000064"))
      .map { case (st, ms, up, mp, qp) => rowSql(st, ms, up, mp, qp) }
      .mkString("\nUNION ALL\n")
    s"""WITH base AS MATERIALIZED ($baseDef),
       |d1 AS MATERIALIZED (${driftDef(1)}),
       |d2 AS MATERIALIZED (${driftDef(2)}),
       |u2 AS MATERIALIZED (
       |  SELECT * FROM base UNION ALL SELECT * FROM d1
       |  UNION ALL SELECT * FROM d2),
       |ccents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM base
       |  WHERE vec_id < 32),
       |pcents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM base
       |  WHERE vec_id < 32),
       |subs AS (SELECT unnest(generate_series(0, 3)) AS s),
       |asg AS MATERIALIZED (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT e.vec_id, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${oCos("e.embedding", "c.ce")} DESC,
       |          c.cent_id ASC) AS rn
       |    FROM u2 e, ccents c) WHERE rn = 1),
       |pqscored AS (
       |  SELECT e.vec_id, subs.s, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, subs.s ORDER BY
       |      (list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(e.embedding[subs.s*16 + i] AS DOUBLE)))
       |       - 2 * list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(e.embedding[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))
       |       + list_sum(list_transform(generate_series(1, 16),
       |         i -> CAST(c.ce[subs.s*16 + i] AS DOUBLE)
       |              * CAST(c.ce[subs.s*16 + i] AS DOUBLE)))) ASC,
       |      c.cent_id ASC) AS rn
       |  FROM u2 e, pcents c, subs),
       |codesw AS MATERIALIZED (
       |  SELECT vec_id,
       |    MAX(CASE WHEN s = 0 THEN cent_id END) AS c0,
       |    MAX(CASE WHEN s = 1 THEN cent_id END) AS c1,
       |    MAX(CASE WHEN s = 2 THEN cent_id END) AS c2,
       |    MAX(CASE WHEN s = 3 THEN cent_id END) AS c3
       |  FROM pqscored WHERE rn = 1 GROUP BY vec_id),
       |recon AS MATERIALIZED (
       |  SELECT v.vec_id, CAST(FLOOR($reconTerms) AS BIGINT) AS e
       |  FROM u2 v
       |  JOIN codesw w ON w.vec_id = v.vec_id
       |  JOIN pcents e0 ON e0.cent_id = w.c0
       |  JOIN pcents e1 ON e1.cent_id = w.c1
       |  JOIN pcents e2 ON e2.cent_id = w.c2
       |  JOIN pcents e3 ON e3.cent_id = w.c3),
       |refr AS (SELECT SUM(e) // COUNT(*) AS r FROM recon
       |         WHERE vec_id < 1000000)
       |SELECT stage, mass, n_vecs, recon_err, n_hits, n_truth,
       |  CAST(FLOOR(n_hits * 1e6 / n_truth) AS BIGINT) AS recall_micro,
       |  CAST(CASE WHEN recon_err > 4 * refr.r THEN 1 ELSE 0 END
       |    AS BIGINT) AS retrain_recommended
       |FROM ($rows) CROSS JOIN refr""".stripMargin
  }

  def oracle: Map[String, String] =
    oracle0 + ("p56_ann_recall" -> oAnnRecall) +
      ("p189_quantizer_drift" -> oQuantizerDrift) +
      ("p180_release_signoff" -> oReleaseSignoff) +
      ("p66_quality_funnel" -> oQualityFunnel) +
      ("p79_clustered_recall" -> oClusteredRecall) +
      ("p81_nb_classifier" -> oNbClassifier) +
      ("p87_unigram_tokenizer" ->
        oUnigramTokenizer(vocabSize = 60, maxLen = 4)) +
      ("p88_unigram_encode" ->
        oUnigramEncode(vocabSize = 60, maxLen = 4)) +
      ("p99_tokenizer_fertility" ->
        s"""${oUnigramCtes(vocabSize = 60, maxLen = 4)},
           |ws AS (
           |  SELECT 'whitespace' AS tokenizer, lang, COUNT(*) AS n_docs,
           |    SUM(length(text)) AS n_chars,
           |    SUM(len($oToks)) AS n_tokens
           |  FROM documents GROUP BY lang),
           |bp AS (
           |  SELECT 'bpe_pre' AS tokenizer, lang, COUNT(*) AS n_docs,
           |    SUM(length(text)) AS n_chars,
           |    SUM(len(regexp_extract_all(lower(text),
           |      '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS n_tokens
           |  FROM documents GROUP BY lang),
           |uw AS (
           |  SELECT d.lang, SUM(len(w.pieces)) AS n_tokens
           |  FROM (SELECT lang, toks[pos] AS word
           |        FROM (SELECT lang, toks,
           |                unnest(generate_series(1, len(toks))) AS pos
           |              FROM (SELECT lang, $oToks AS toks FROM documents))
           |        WHERE length(toks[pos]) > 0) d
           |  JOIN seg1 w ON w.word = d.word
           |  GROUP BY d.lang),
           |un AS (
           |  SELECT 'unigram' AS tokenizer, b.lang, b.n_docs, b.n_chars,
           |    uw.n_tokens
           |  FROM (SELECT lang, COUNT(*) AS n_docs,
           |          SUM(length(text)) AS n_chars
           |        FROM documents GROUP BY lang) b
           |  JOIN uw ON b.lang = uw.lang)
           |SELECT tokenizer, lang, CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(n_chars AS BIGINT) AS n_chars,
           |  CAST(n_tokens AS BIGINT) AS n_tokens,
           |  (CAST(n_chars AS BIGINT) * 1000000)
           |    // CAST(n_tokens AS BIGINT) AS fertility_micro
           |FROM (SELECT * FROM ws UNION ALL SELECT * FROM bp
           |      UNION ALL SELECT * FROM un)""".stripMargin) +
      ("p82_bigram_lm" -> oBigramLm) +
      ("p89_kn_bigram" -> oKnBigram) +
      ("p90_dsir" -> oDsir) +
      ("p92_domain_mix" -> oDomainMix) +
      ("p110_domain_mix_iter" ->
        s"""WITH ${oDomainMixCtes("a_", "documents")},
           |rates AS (
           |  SELECT r.source, r.weight_micro AS w1_micro,
           |    r.excess_micro AS excess1_micro,
           |    LEAST(1000000, (r.weight_micro * 1000000)
           |      // ((r.n_tokens * 1000000) // t.ntot)) AS rate_micro
           |  FROM a_res r,
           |    (SELECT CAST(SUM(n_tokens) AS BIGINT) AS ntot
           |     FROM a_res) t),
           |kept AS MATERIALIZED (
           |  SELECT d.doc_id, d.source, d.text
           |  FROM documents d JOIN rates r ON d.source = r.source
           |  WHERE ${oHash("'dr2' || CAST(doc_id AS VARCHAR)")} % 1000000
           |    < r.rate_micro),
           |${oDomainMixCtes("b_", "kept")}
           |SELECT r.source, r.w1_micro, r.excess1_micro, r.rate_micro,
           |  CAST(COALESCE(b.n_docs, 0) AS BIGINT) AS n_docs_kept,
           |  b.weight_micro AS w2_micro,
           |  b.excess_micro AS excess2_micro
           |FROM rates r LEFT JOIN b_res b ON r.source = b.source"""
          .stripMargin) +
      ("p95_card_scrub" ->
        s"""WITH lines AS (
           |  SELECT event_id,
           |    'pay ' || lpad(CAST((user_id % 100000) * 2654435761
           |        + event_id % 1000000 AS VARCHAR), 16, '0')
           |      || ' amount '
           |      || CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR)
           |      || ' ref ' || event_type AS line
           |  FROM events),
           |c AS (
           |  SELECT event_id, line,
           |    regexp_extract_all(line, '[0-9][0-9 -]*[0-9]') AS cands
           |  FROM lines),
           |pos AS (
           |  SELECT event_id, cands,
           |    unnest(generate_series(1, len(cands))) AS i
           |  FROM c),
           |d AS (
           |  SELECT event_id, i, cands[i] AS cand,
           |    regexp_replace(cands[i], '[^0-9]', '', 'g') AS ds
           |  FROM pos),
           |lv AS (
           |  SELECT event_id, i, cand,
           |    (len(ds) BETWEEN 13 AND 19) AND
           |    list_sum(list_transform(generate_series(1, len(ds)), j ->
           |      CASE WHEN (len(ds) - j) % 2 = 1
           |        THEN CASE WHEN 2 * CAST(ds[j] AS BIGINT) > 9
           |                  THEN 2 * CAST(ds[j] AS BIGINT) - 9
           |                  ELSE 2 * CAST(ds[j] AS BIGINT) END
           |        ELSE CAST(ds[j] AS BIGINT) END)) % 10 = 0 AS ok
           |  FROM d),
           |vv AS (
           |  SELECT event_id AS vid, list(cand ORDER BY i) AS valids,
           |    COUNT(*) AS nv
           |  FROM lv WHERE ok GROUP BY event_id)
           |SELECT c.event_id,
           |  CAST(len(c.cands) AS BIGINT) AS n_digit_runs,
           |  CAST(COALESCE(vv.nv, 0) AS BIGINT) AS n_luhn_valid,
           |  substr(md5(list_reduce(
           |    list_concat([c.line], COALESCE(vv.valids, [])),
           |    (acc, x) -> replace(acc, x, '<CARD>'))), 1, 16) AS clean_fp
           |FROM c LEFT JOIN vv ON c.event_id = vv.vid""".stripMargin) +
      ("p94_curriculum" ->
        s"""WITH kn AS (SELECT * FROM ($oKnBigram)),
           |keyed AS (
           |  SELECT doc_id, n_tokens, avg_nll_micro,
           |    ${oHash("'curr' || CAST(doc_id AS VARCHAR)")} % 1000000
           |      AS draw
           |  FROM kn),
           |sq AS (
           |  SELECT doc_id, n_tokens, avg_nll_micro,
           |    ROW_NUMBER() OVER (ORDER BY avg_nll_micro, draw, doc_id)
           |      - 1 AS seq
           |  FROM keyed),
           |n AS (SELECT COUNT(*) AS n FROM sq)
           |SELECT doc_id, (seq * 4) // n AS phase, CAST(seq AS BIGINT)
           |  AS seq, n_tokens, avg_nll_micro
           |FROM sq, n""".stripMargin) +
      ("p84_classifier_audit" ->
        s"""WITH nb AS (${oNbClassifier})
           |SELECT d.source,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(nb.cls) AS BIGINT) AS n_gate_keep,
           |  CAST(SUM(nb.pred) AS BIGINT) AS n_model_keep,
           |  CAST(SUM(CASE WHEN nb.cls = 0 AND nb.pred = 1
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_rescued,
           |  CAST(SUM(CASE WHEN nb.cls = 1 AND nb.pred = 0
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
           |FROM nb JOIN documents d ON nb.doc_id = d.doc_id
           |GROUP BY d.source ORDER BY d.source""".stripMargin) +
      ("p112_bm25" -> oBm25(k1 = 1.2, b = 0.75,
        qTerms = 4, topK = 10)) +
      ("p113_auc" ->
        s"""WITH nb AS (${oNbClassifier}),
           |bys AS (
           |  SELECT llr_micro AS s, SUM(cls) AS np,
           |    COUNT(*) - SUM(cls) AS nn
           |  FROM nb GROUP BY llr_micro),
           |cm AS (
           |  SELECT s, np, nn,
           |    SUM(nn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) - nn AS cum_nn
           |  FROM bys),
           |ag AS (
           |  SELECT SUM(np) AS n_pos, SUM(nn) AS n_neg,
           |    SUM(np * (cum_nn * 2 + nn)) AS u2
           |  FROM cm)
           |SELECT CAST(n_pos AS BIGINT) AS n_pos,
           |  CAST(n_neg AS BIGINT) AS n_neg, CAST(u2 AS BIGINT) AS u2,
           |  CAST((u2 * 1000000) // (2 * n_pos * n_neg) AS BIGINT)
           |    AS auc_micro
           |FROM ag""".stripMargin) +
      ("p114_ppl_buckets" ->
        s"""WITH kn AS (SELECT * FROM ($oKnBigram)),
           |j AS (
           |  SELECT kn.doc_id, kn.n_tokens, kn.avg_nll_micro, d.lang,
           |    NTILE(3) OVER (PARTITION BY d.lang
           |      ORDER BY kn.avg_nll_micro, kn.doc_id) AS nt
           |  FROM kn JOIN documents d ON kn.doc_id = d.doc_id)
           |SELECT lang,
           |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
           |    ELSE 'tail' END AS bucket,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(MIN(avg_nll_micro) AS BIGINT) AS min_nll_micro,
           |  CAST(MAX(avg_nll_micro) AS BIGINT) AS max_nll_micro
           |FROM j GROUP BY lang, bucket""".stripMargin) +
      ("p115_domain_cap" ->
        s"""WITH $oScoreCtes,
           |nt AS (
           |  SELECT doc_id, source, CAST(len($oToks) AS BIGINT)
           |    AS n_toks
           |  FROM documents),
           |r AS (
           |  SELECT n.source, n.n_toks, q.score_micro,
           |    ROW_NUMBER() OVER (PARTITION BY n.source
           |      ORDER BY q.score_micro DESC, n.doc_id) AS rank
           |  FROM nt n JOIN q ON n.doc_id = q.doc_id)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN rank <= 15 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_kept,
           |  CAST(SUM(n_toks) AS BIGINT) AS toks_total,
           |  CAST(SUM(CASE WHEN rank <= 15 THEN n_toks ELSE 0 END)
           |    AS BIGINT) AS toks_kept
           |FROM r GROUP BY source""".stripMargin) +
      ("p116_pmi" ->
        s"""WITH base AS (SELECT doc_id, $oToks AS toks FROM documents),
           |occ AS (
           |  SELECT doc_id, toks[i] AS cur,
           |    CASE WHEN i > 1 THEN toks[i - 1] END AS prev
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(1, len(toks))) AS i
           |        FROM base)),
           |uni AS (SELECT cur AS tok, COUNT(*) AS cu FROM occ
           |        GROUP BY cur),
           |tot AS (SELECT SUM(cu) AS t FROM uni),
           |bg AS (
           |  SELECT prev, cur, COUNT(*) AS cxy FROM occ
           |  WHERE prev IS NOT NULL GROUP BY prev, cur
           |  HAVING COUNT(*) >= 5),
           |bt AS (SELECT COUNT(*) AS bt FROM occ
           |       WHERE prev IS NOT NULL),
           |sc AS (
           |  SELECT b.prev AS tok_a, b.cur AS tok_b, b.cxy AS n_pair,
           |    CAST(FLOOR(ln(
           |      (CAST(b.cxy AS DOUBLE) / CAST(bt.bt AS DOUBLE))
           |      / ((CAST(ux.cu AS DOUBLE) / CAST(tot.t AS DOUBLE))
           |         * (CAST(uy.cu AS DOUBLE) / CAST(tot.t AS DOUBLE))))
           |      * 1000000.0) AS BIGINT) AS pmi_micro
           |  FROM bg b
           |  JOIN uni ux ON b.prev = ux.tok
           |  JOIN uni uy ON b.cur = uy.tok
           |  CROSS JOIN tot CROSS JOIN bt),
           |rk AS (
           |  SELECT sc.*, ROW_NUMBER() OVER (ORDER BY pmi_micro DESC,
           |    tok_a, tok_b) AS rank
           |  FROM sc)
           |SELECT CAST(rank AS BIGINT) AS rank, tok_a, tok_b, n_pair,
           |  pmi_micro
           |FROM rk WHERE rank <= 100""".stripMargin) +
      ("p117_lr_classifier" ->
        oLrClassifier(buckets = 64, iters = 12, lrDen = 1)) +
      ("p124_calibration" ->
        s"""WITH lr AS (${oLrClassifier(buckets = 64, iters = 12,
              lrDen = 1)})
           |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(cls) AS BIGINT) AS n_pos,
           |  CAST(FLOOR(1000000.0 / (1.0 + exp(-(CAST(bucket + 200000
           |    AS DOUBLE) / 1000000.0)))) AS BIGINT) AS pred_pos_micro,
           |  CAST((SUM(cls) * 1000000) // COUNT(*) AS BIGINT)
           |    AS emp_pos_micro
           |FROM (SELECT cls, z_micro
           |        - ((z_micro % 400000) + 400000) % 400000 AS bucket
           |      FROM lr)
           |GROUP BY bucket""".stripMargin) +
      ("p118_wordpiece" -> oWordPieceTrain(100)) +
      ("p122_residual_pq" -> oResidualPq) +
      ("p129_ql" -> oQlTopK) +
      ("p128_hll" -> {
        val m = 64
        val alpha = 0.7213 / (1 + 1.079 / m)
        val numer = alpha * (m.toDouble * m) * math.pow(2.0, 55)
        val bitlen = (0 until 54).map(b =>
          s"CASE WHEN rest >= ${1L << b} THEN ${b + 1} ELSE 0 END")
          .mkString("GREATEST(", ",\n    ", ")")
        s"""WITH grams AS (
           |  SELECT source AS src, ${oHash("sh")} AS h FROM (
           |    SELECT source, unnest(sh) AS sh FROM (
           |      SELECT source, ${oShingles(3)} AS sh
           |      FROM (SELECT source, $oToks AS toks FROM documents)))),
           |rho AS (
           |  SELECT src, h % 64 AS j,
           |    55 - $bitlen AS rho
           |  FROM (SELECT src, h, h // 64 AS rest FROM grams)),
           |regs AS (SELECT src, j, MAX(rho) AS mj FROM rho
           |         GROUP BY src, j),
           |sums AS (
           |  SELECT src, 64 - COUNT(*) AS v_zero,
           |    SUM(1::BIGINT << CAST(55 - mj AS INT))
           |      + (64 - COUNT(*)) * (1::BIGINT << 55) AS s
           |  FROM regs GROUP BY src),
           |ex AS (
           |  SELECT src, COUNT(*) AS n_grams,
           |    COUNT(DISTINCT h) AS exact_distinct
           |  FROM grams GROUP BY src),
           |est AS (
           |  SELECT s.src, ex.n_grams, ex.exact_distinct, s.v_zero,
           |    CASE WHEN CAST(FLOOR($numer / CAST(s.s AS DOUBLE))
           |        AS BIGINT) <= ${(2.5 * m).toLong} AND s.v_zero > 0
           |      THEN CAST(FLOOR(64.0 * ln(64.0
           |        / CAST(s.v_zero AS DOUBLE))) AS BIGINT)
           |      ELSE CAST(FLOOR($numer / CAST(s.s AS DOUBLE))
           |        AS BIGINT) END AS est
           |  FROM sums s JOIN ex ON s.src = ex.src)
           |SELECT src AS source, CAST(n_grams AS BIGINT) AS n_grams,
           |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
           |  CAST(v_zero AS BIGINT) AS v_zero, est,
           |  (abs(est - exact_distinct) * 1000000) // exact_distinct
           |    AS err_micro
           |FROM est""".stripMargin
      }) +
      ("p127_countmin" ->
        s"""WITH occ AS (SELECT unnest($oToks) AS tok FROM documents),
           |rs AS (SELECT unnest(generate_series(0, 3)) AS r),
           |cells AS (
           |  SELECT r, ${oHash(
                  "'cm' || CAST(r AS VARCHAR) || '_' || tok")} % 64 AS b,
           |    COUNT(*) AS c
           |  FROM occ, rs GROUP BY 1, 2),
           |top AS (
           |  SELECT tok, COUNT(*) AS exact FROM occ GROUP BY tok
           |  ORDER BY exact DESC, tok LIMIT 30),
           |probes AS (
           |  SELECT tok, exact, r, ${oHash(
                  "'cm' || CAST(r AS VARCHAR) || '_' || tok")} % 64 AS b
           |  FROM top, rs),
           |est AS (
           |  SELECT p.tok, p.exact, MIN(c.c) AS est
           |  FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
           |  GROUP BY p.tok, p.exact)
           |SELECT ROW_NUMBER() OVER (ORDER BY exact DESC, tok) AS rank,
           |  tok, CAST(exact AS BIGINT) AS exact,
           |  CAST(est AS BIGINT) AS est,
           |  CAST(est - exact AS BIGINT) AS overshoot
           |FROM est""".stripMargin) +
      ("p126_domain_drift" ->
        s"""WITH occ AS (
           |  SELECT source AS src, unnest($oToks) AS tok
           |  FROM documents),
           |sc AS (
           |  SELECT src, tok, COUNT(*) AS cs FROM occ GROUP BY src, tok),
           |cc AS (SELECT tok, COUNT(*) AS cv FROM occ GROUP BY tok),
           |v AS (SELECT COUNT(*) AS v, SUM(cv) AS tc FROM cc),
           |st AS (
           |  SELECT sc.src, sc.tok, sc.cs, cc.cv,
           |    SUM(sc.cs) OVER (PARTITION BY sc.src) AS ts
           |  FROM sc JOIN cc ON sc.tok = cc.tok)
           |SELECT src AS source, CAST(MAX(ts) AS BIGINT) AS n_toks,
           |  CAST(COUNT(*) AS BIGINT) AS n_types,
           |  CAST(SUM(CAST(FLOOR(
           |    (CAST(cs + 1 AS DOUBLE) / CAST(ts + v.v AS DOUBLE))
           |    * ln((CAST(cs + 1 AS DOUBLE) / CAST(ts + v.v AS DOUBLE))
           |         / (CAST(cv + 1 AS DOUBLE) / CAST(tc + v.v AS DOUBLE)))
           |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS kl_nano
           |FROM st, v
           |GROUP BY src""".stripMargin) +
      ("p125_dedup_sweep" -> {
        def tcte(t: Int) =
          s"""e$t(u, v) AS (
             |  SELECT doc_a, doc_b FROM allp WHERE j >= ${t / 100.0}
             |  UNION SELECT doc_b, doc_a FROM allp WHERE j >= ${t / 100.0}),
             |r$t(u, v) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM e$t)
             |  UNION
             |  SELECT r.u, e2.v FROM r$t r JOIN e$t e2 ON r.v = e2.u),
             |c$t AS (SELECT u AS doc_id, MIN(v) AS cluster_id
             |        FROM r$t GROUP BY u),
             |s$t AS (
             |  SELECT CAST($t AS BIGINT) AS threshold_pct,
             |    (SELECT COUNT(*) FROM allp WHERE j >= ${t / 100.0})
             |      AS n_pairs,
             |    SUM(CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END)
             |      AS n_clusters,
             |    COUNT(*) AS n_docs_in_clusters,
             |    SUM(CASE WHEN c.doc_id != c.cluster_id THEN 1 ELSE 0 END)
             |      AS n_docs_removed,
             |    SUM(CASE WHEN c.doc_id != c.cluster_id THEN tk.n_toks
             |        ELSE 0 END) AS toks_removed
             |  FROM c$t c JOIN tk ON c.doc_id = tk.doc_id)""".stripMargin
        s"""WITH RECURSIVE ${oPairCtes(4, 0.4, withJ = true)},
           |allp AS (SELECT doc_a, doc_b, j FROM pairs),
           |tk AS (SELECT doc_id, CAST(len($oToks) AS BIGINT) AS n_toks
           |       FROM documents),
           |${Seq(40, 90, 96, 98).map(tcte).mkString(",\n")}
           |SELECT threshold_pct, CAST(n_pairs AS BIGINT) AS n_pairs,
           |  CAST(n_clusters AS BIGINT) AS n_clusters,
           |  CAST(n_docs_in_clusters AS BIGINT) AS n_docs_in_clusters,
           |  CAST(n_docs_removed AS BIGINT) AS n_docs_removed,
           |  CAST(toks_removed AS BIGINT) AS toks_removed
           |FROM (SELECT * FROM s40 UNION ALL SELECT * FROM s90
           |      UNION ALL SELECT * FROM s96 UNION ALL SELECT * FROM s98)
           |""".stripMargin
      }) +
      ("p123_doc_features" ->
        s"""WITH $oScoreCtes,
           |l AS (SELECT * FROM (${oracle0("p08_lang_id")})),
           |r AS (SELECT * FROM (${oracle0("p20_repetition")})),
           |e AS (SELECT * FROM ($oEntropy)),
           |kn AS (SELECT * FROM ($oKnBigram)),
           |mr AS (SELECT * FROM (${oracle0("p105_memorization_risk")}))
           |SELECT d.doc_id, d.lang, d.source, qm.n_toks, q.score_micro,
           |  l.lang_pred, r.dup_3gram_frac, r.top_word_frac,
           |  e.chars_entropy_micro, e.toks_entropy_micro,
           |  kn.avg_nll_micro,
           |  mr.dup_frac_micro AS mem_risk_micro
           |FROM documents d
           |JOIN qm ON d.doc_id = qm.doc_id
           |JOIN q ON d.doc_id = q.doc_id
           |JOIN l ON d.doc_id = l.doc_id
           |JOIN r ON d.doc_id = r.doc_id
           |JOIN e ON d.doc_id = e.doc_id
           |JOIN kn ON d.doc_id = kn.doc_id
           |JOIN mr ON d.doc_id = mr.doc_id""".stripMargin) +
      ("p120_prf" -> oPrf) +
      ("p121_entropy" -> oEntropy) +
      ("p119_hybrid_rrf" -> oRrf) +
      ("p130_retrieval_scorecard" ->
        s"""WITH bmr AS (SELECT * FROM (${oBm25(k1 = 1.2, b = 0.75,
              qTerms = 4, topK = 10)})),
           |qlr AS (SELECT * FROM ($oQlTopK)),
           |pfr AS (SELECT * FROM ($oPrf)),
           |rfr AS (SELECT * FROM ($oRrf)),
           |bff AS (SELECT * FROM ($oBm25f))
           |${oScorecardRow("bmr", "bm25")}
           |UNION ALL
           |${oScorecardRow("bff", "bm25f")}
           |UNION ALL
           |${oScorecardRow("qlr", "ql")}
           |UNION ALL
           |${oScorecardRow("pfr", "prf")}
           |UNION ALL
           |${oScorecardRow("rfr", "rrf")}""".stripMargin) +
      ("p132_bm25f" -> oBm25f) +
      ("p138_pagerank_hubs" -> oPagerank(8)) +
      ("p140_cluster_quality" -> oClusterQuality(Seq(50, 25, 10), 2)) +
      ("p141_triangles" -> oTriangles) +
      ("p154_kcore" -> oKCore(Seq(2, 3), 6)) +
      ("p156_dedup_retrieval" -> oDedupRetrievalImpact) +
      ("p157_operating_points" ->
        s"""WITH nb AS (${oNbClassifier}),
           |taus AS (SELECT CAST(tau AS BIGINT) AS tau FROM (VALUES
           |  (0), (2000000), (4000000), (6000000), (10000000)) v(tau)),
           |cf AS (
           |  SELECT t.tau,
           |    CAST(SUM(CASE WHEN nb.llr_micro >= t.tau AND nb.cls = 1
           |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(SUM(CASE WHEN nb.llr_micro >= t.tau AND nb.cls = 0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(SUM(CASE WHEN nb.llr_micro < t.tau AND nb.cls = 1
           |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |    CAST(SUM(CASE WHEN nb.llr_micro < t.tau AND nb.cls = 0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
           |  FROM nb CROSS JOIN taus t GROUP BY t.tau)
           |SELECT tau, tp, fp, fn, tn,
           |  CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST((tp * 1000000) // (tp + fp) AS BIGINT)
           |  END AS precision_micro,
           |  CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST((tp * 1000000) // (tp + fn) AS BIGINT)
           |  END AS recall_micro,
           |  CASE WHEN tp * 2 + fp + fn = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST((tp * 2000000) // (tp * 2 + fp + fn) AS BIGINT)
           |  END AS f1_micro
           |FROM cf""".stripMargin) +
      ("p158_repetition" ->
        s"""WITH base AS (SELECT doc_id, $oToks AS toks FROM documents),
           |bs AS (SELECT doc_id, toks,
           |    CAST(len(toks) AS BIGINT) AS n_toks,
           |    CAST(COALESCE(list_sum(list_transform(toks,
           |      t -> length(t))), 0) AS BIGINT) AS n_chars
           |  FROM base),
           |g2 AS (
           |  SELECT doc_id, CAST(i AS BIGINT) AS p,
           |    array_to_string(toks[i:i+1], ' ') AS g,
           |    CAST(list_sum(list_transform(toks[i:i+1],
           |      t -> length(t))) AS BIGINT) AS gc
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(1, len(toks) - 1)) AS i
           |        FROM bs WHERE n_toks >= 2)),
           |c2 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt,
           |    MAX(gc) AS gc
           |  FROM g2 GROUP BY doc_id, g),
           |t2 AS (SELECT doc_id, cnt AS top_cnt, cnt * gc AS top_chars
           |  FROM (SELECT doc_id, g, cnt, gc, ROW_NUMBER() OVER (
           |      PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn
           |    FROM c2)
           |  WHERE rn = 1),
           |g5 AS (
           |  SELECT doc_id, CAST(i AS BIGINT) AS p,
           |    array_to_string(toks[i:i+2], ' ') AS g
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(1, len(toks) - 2)) AS i
           |        FROM bs WHERE n_toks >= 3)),
           |c5 AS (SELECT doc_id, g FROM g5
           |  GROUP BY doc_id, g HAVING COUNT(*) >= 2),
           |d5 AS (SELECT DISTINCT doc_id, cp FROM (
           |  SELECT g5.doc_id,
           |    unnest(generate_series(g5.p, g5.p + 2)) AS cp
           |  FROM g5 JOIN c5 ON g5.doc_id = c5.doc_id AND g5.g = c5.g)),
           |pl AS (SELECT doc_id, CAST(i AS BIGINT) AS cp,
           |    CAST(length(toks[i]) AS BIGINT) AS len
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(1, len(toks))) AS i
           |        FROM bs)),
           |dc AS (SELECT d5.doc_id, CAST(SUM(pl.len) AS BIGINT)
           |    AS dup_chars
           |  FROM d5 JOIN pl ON d5.doc_id = pl.doc_id AND d5.cp = pl.cp
           |  GROUP BY d5.doc_id)
           |SELECT bs.doc_id, bs.n_toks, bs.n_chars,
           |  COALESCE(t2.top_cnt, CAST(0 AS BIGINT)) AS top_cnt,
           |  CASE WHEN bs.n_chars = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST((COALESCE(t2.top_chars, 0) * 1000000)
           |      // bs.n_chars AS BIGINT)
           |  END AS top2_frac_micro,
           |  CASE WHEN bs.n_chars = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST((COALESCE(dc.dup_chars, 0) * 1000000)
           |      // bs.n_chars AS BIGINT)
           |  END AS dup3_frac_micro
           |FROM bs LEFT JOIN t2 ON bs.doc_id = t2.doc_id
           |LEFT JOIN dc ON bs.doc_id = dc.doc_id""".stripMargin) +
      ("p155_pr_auc" ->
        s"""WITH nb AS (${oNbClassifier}),
           |bys AS (
           |  SELECT llr_micro AS s, SUM(cls) AS tp,
           |    COUNT(*) - SUM(cls) AS fp
           |  FROM nb GROUP BY llr_micro),
           |cm AS (
           |  SELECT s, tp, fp,
           |    SUM(tp) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) AS cum_tp,
           |    SUM(tp + fp) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) AS cum
           |  FROM bys),
           |tot AS (SELECT CAST(SUM(tp) AS BIGINT) AS n_pos,
           |  CAST(SUM(fp) AS BIGINT) AS n_neg FROM bys),
           |terms AS (
           |  SELECT CAST((cm.tp * cm.cum_tp * 1000000)
           |      // (cm.cum * tot.n_pos) AS BIGINT) AS term_micro
           |  FROM cm, tot)
           |SELECT tot.n_pos, tot.n_neg,
           |  CAST((SELECT SUM(term_micro) FROM terms) AS BIGINT)
           |    AS ap_micro,
           |  CAST((tot.n_pos * 1000000) // (tot.n_pos + tot.n_neg)
           |    AS BIGINT) AS prevalence_micro
           |FROM tot""".stripMargin) +
      ("p142_detector_agreement" -> oDetectorAgreement) +
      ("p143_chi_square" -> oChiSquare) +
      ("p153_epoch_schedule" ->
        s"""WITH per AS (SELECT source,
           |    CAST(SUM(len($oToks)) AS BIGINT) AS avail_toks
           |  FROM documents GROUP BY source),
           |tot AS (SELECT CAST(SUM(avail_toks) AS BIGINT) AS total,
           |    CAST(COUNT(*) AS BIGINT) AS ns FROM per),
           |x AS (SELECT source, avail_toks,
           |    (tot.total * 4) // (tot.ns * 1) AS target_toks
           |  FROM per, tot),
           |y AS (SELECT source, avail_toks, target_toks,
           |    (target_toks * 1000000) // avail_toks AS epochs_micro,
           |    LEAST(target_toks, 4 * avail_toks) AS effective_toks
           |  FROM x)
           |SELECT source, avail_toks, target_toks, epochs_micro,
           |  effective_toks,
           |  target_toks - effective_toks AS deficit_toks,
           |  CASE WHEN epochs_micro > 4000000 THEN CAST(1 AS BIGINT)
           |       ELSE CAST(0 AS BIGINT) END AS over_cap
           |FROM y""".stripMargin) +
      ("p151_source_dup_rates" -> oSourceDupRates) +
      ("p152_split_leakage" ->
        s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
           |edges AS (
           |  SELECT doc_a AS u, doc_b AS v FROM pairs
           |  UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |dec AS (SELECT u AS doc_id, MIN(v) AS comp
           |        FROM reach GROUP BY u),
           |sp AS (SELECT doc_id,
           |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid'
           |         ELSE 'test' END AS split
           |  FROM (SELECT doc_id,
           |    ${oHash("'split' || CAST(doc_id AS VARCHAR)")} % 100
           |      AS h FROM documents)),
           |pr AS (SELECT LEAST(a.split, b.split) AS s1,
           |    GREATEST(a.split, b.split) AS s2
           |  FROM pairs p JOIN sp a ON p.doc_a = a.doc_id
           |  JOIN sp b ON p.doc_b = b.doc_id),
           |bp AS (SELECT s1 || '|' || s2 AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS n FROM pr GROUP BY s1, s2),
           |cl AS (SELECT dec.comp, COUNT(DISTINCT sp.split) AS ns
           |  FROM dec JOIN sp ON dec.doc_id = sp.doc_id
           |  GROUP BY dec.comp),
           |sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
           |    CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_straddling FROM cl)
           |SELECT bucket, n FROM bp
           |UNION ALL SELECT 'clusters_total', n_clusters FROM sm
           |UNION ALL SELECT 'clusters_straddling', n_straddling
           |FROM sm""".stripMargin) +
      ("p159_split_repair" ->
        s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
           |edges AS (
           |  SELECT doc_a AS u, doc_b AS v FROM pairs
           |  UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |dec AS (SELECT u AS doc_id, MIN(v) AS comp
           |        FROM reach GROUP BY u),
           |sp AS (SELECT doc_id,
           |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid'
           |         ELSE 'test' END AS split
           |  FROM (SELECT doc_id,
           |    ${oHash("'split' || CAST(doc_id AS VARCHAR)")} % 100
           |      AS h FROM documents))
           |SELECT f.split AS from_split, t.split AS to_split,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs
           |FROM dec
           |JOIN sp f ON dec.doc_id = f.doc_id
           |JOIN sp t ON dec.comp = t.doc_id
           |GROUP BY f.split, t.split""".stripMargin) +
      ("p171_shard_files" ->
        // p160's manifest replay + per-shard rollup with the p86-style
        // positional checksum; order_inversions is the literal 0 the
        // Spark side must reproduce from the PHYSICAL file order
        s"""WITH n AS (SELECT doc_id, text,
           |    CAST(len($oToks) AS BIGINT) AS n_toks,
           |    ${oHash("'shard' || CAST(doc_id AS VARCHAR)")} AS h
           |  FROM documents),
           |c AS (SELECT doc_id, text, n_toks,
           |    CAST(SUM(n_toks) OVER (ORDER BY h, doc_id
           |      ROWS UNBOUNDED PRECEDING) - n_toks AS BIGINT)
           |      AS start_tok
           |  FROM n),
           |m AS (SELECT doc_id, n_toks,
           |    CAST(start_tok // 4096 AS BIGINT) AS chunk_idx,
           |    CAST(start_tok % 4096 AS BIGINT) AS chunk_off,
           |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp
           |  FROM c)
           |SELECT chunk_idx, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_toks) AS BIGINT) AS n_toks,
           |  CAST(SUM(${oHash("fp || ':' || CAST(chunk_off AS VARCHAR)")}
           |           % 268435456) AS BIGINT) AS shard_sum,
           |  CAST(0 AS BIGINT) AS order_inversions
           |FROM m GROUP BY chunk_idx""".stripMargin) +
      ("p160_shard_manifest" ->
        s"""WITH n AS (SELECT doc_id,
           |    CAST(len($oToks) AS BIGINT) AS n_toks,
           |    ${oHash("'shard' || CAST(doc_id AS VARCHAR)")} AS h
           |  FROM documents),
           |c AS (SELECT doc_id, n_toks,
           |    CAST(SUM(n_toks) OVER (ORDER BY h, doc_id
           |      ROWS UNBOUNDED PRECEDING) - n_toks AS BIGINT)
           |      AS start_tok
           |  FROM n)
           |SELECT doc_id, n_toks,
           |  CAST(start_tok // 4096 AS BIGINT) AS chunk_idx,
           |  CAST(start_tok % 4096 AS BIGINT) AS chunk_off
           |FROM c""".stripMargin) +
      ("p161_hard_negatives" ->
        s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
           |neg AS (
           |  SELECT query_id, doc_id, n_terms, score_micro,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY score_micro DESC, doc_id) AS rank
           |  FROM sc WHERE doc_id <> query_id)
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
           |  CAST(n_terms AS BIGINT) AS n_terms, score_micro
           |FROM neg WHERE rank <= 5""".stripMargin) +
      ("p170_quantization_probe" -> {
        // the p169 chain, parameterized over (tag, relation, vector
        // col): budget-strided queries probe nprobe=2 IVF cells over
        // budget-strided seed centroids — the oracle twin of
        // Similarity.ivfTopKWith's assignment and tie rules
        def chain(tag: String, rel: String, vcol: String) =
          s"""ct$tag AS (SELECT vec_id AS cent_id, $vcol AS ce
             |  FROM $rel WHERE vec_id % ${oQStride(rel, 32)} = 0),
             |as$tag AS (SELECT e.vec_id, e.$vcol AS v,
             |    CAST(e.label AS BIGINT) AS lab, cent_id,
             |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |      ORDER BY ${oCos(s"e.$vcol", "ce")} DESC,
             |        cent_id ASC) AS crn
             |  FROM $rel e, ct$tag),
             |cl$tag AS (SELECT vec_id, v, lab, cent_id
             |  FROM as$tag WHERE crn = 1),
             |q$tag AS (SELECT vec_id AS query_id, v AS qv, lab
             |    AS true_label, cent_id
             |  FROM as$tag
             |  WHERE crn <= 2 AND vec_id % ${oQStride(rel, 256)} = 0),
             |sc$tag AS (SELECT query_id, c.vec_id AS cand_id,
             |    c.lab AS nl, ${oCos("qv", "c.v")} AS sim
             |  FROM q$tag q JOIN cl$tag c ON q.cent_id = c.cent_id
             |    AND c.vec_id != q.query_id),
             |r$tag AS (SELECT query_id, nl,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY sim DESC, cand_id) AS rank
             |  FROM sc$tag),
             |v$tag AS (SELECT query_id, nl, COUNT(*) AS votes
             |  FROM r$tag WHERE rank <= 10 GROUP BY 1, 2),
             |p$tag AS (SELECT query_id, nl AS pred,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY votes DESC, nl ASC) AS vr
             |  FROM v$tag),
             |ql$tag AS (SELECT DISTINCT query_id, true_label
             |  FROM q$tag),
             |j$tag AS (SELECT ql$tag.true_label, p$tag.pred
             |  FROM p$tag JOIN ql$tag USING (query_id) WHERE vr = 1)"""
            .stripMargin
        def sel(tag: String, method: String) =
          s"""SELECT '$method' AS method, true_label,
             |  CAST(COUNT(*) AS BIGINT) AS n_queries,
             |  CAST(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_correct,
             |  CAST((SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
             |    * 1000000) // COUNT(*) AS BIGINT) AS accuracy_micro
             |FROM j$tag GROUP BY true_label""".stripMargin
        s"""WITH sq AS (SELECT vec_id, label,
           |    127.0 / list_max(list_transform(embedding,
           |      y -> abs(CAST(y AS DOUBLE)))) AS s, embedding
           |  FROM embeddings),
           |e8 AS (SELECT vec_id, label,
           |    list_transform(embedding,
           |      x -> FLOOR(CAST(x AS DOUBLE) * s)) AS emb8
           |  FROM sq),
           |${chain("a", "embeddings", "embedding")},
           |${chain("b", "e8", "emb8")}
           |${sel("a", "raw")} UNION ALL ${sel("b", "int8")}"""
          .stripMargin
      }) +
      ("p169_knn_probe" ->
        // the IVF probe chain: budget-strided queries over nprobe=2
        // cells on budget-strided seed centroids (the p170 `chain`
        // shape over the raw relation only)
        s"""WITH ct AS (SELECT vec_id AS cent_id, embedding AS ce
           |  FROM embeddings
           |  WHERE vec_id % ${oQStride("embeddings", 32)} = 0),
           |asg AS (SELECT e.vec_id, e.embedding AS v,
           |    CAST(e.label AS BIGINT) AS lab, cent_id,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${oCos("e.embedding", "ce")} DESC,
           |        cent_id ASC) AS crn
           |  FROM embeddings e, ct),
           |cl AS (SELECT vec_id, v, lab, cent_id
           |  FROM asg WHERE crn = 1),
           |q AS (SELECT vec_id AS query_id, v AS qv,
           |    lab AS true_label, cent_id
           |  FROM asg
           |  WHERE crn <= 2
           |    AND vec_id % ${oQStride("embeddings", 256)} = 0),
           |sc AS (SELECT query_id, c.vec_id AS cand_id, c.lab AS nl,
           |    ${oCos("qv", "c.v")} AS sim
           |  FROM q JOIN cl c ON q.cent_id = c.cent_id
           |    AND c.vec_id != q.query_id),
           |r AS (SELECT query_id, nl,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, cand_id) AS rank
           |  FROM sc),
           |v AS (SELECT query_id, nl, COUNT(*) AS votes
           |  FROM r WHERE rank <= 10 GROUP BY 1, 2),
           |p AS (SELECT query_id, nl AS pred,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY votes DESC, nl ASC) AS vr
           |  FROM v),
           |ql AS (SELECT DISTINCT query_id, true_label FROM q),
           |j AS (SELECT ql.true_label, p.pred
           |  FROM p JOIN ql USING (query_id) WHERE vr = 1)
           |SELECT true_label, CAST(COUNT(*) AS BIGINT) AS n_queries,
           |  CAST(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_correct,
           |  CAST((SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
           |    * 1000000) // COUNT(*) AS BIGINT) AS accuracy_micro
           |FROM j GROUP BY 1""".stripMargin) +
      ("p168_k_anonymity" ->
        """WITH u AS (
          |  SELECT user_id,
          |    array_to_string(list_sort(list(DISTINCT event_type)), '|')
          |      AS sig
          |  FROM events GROUP BY user_id),
          |c AS (SELECT sig, CAST(COUNT(*) AS BIGINT) AS k
          |  FROM u GROUP BY sig)
          |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_signatures,
          |  CAST(SUM(k) AS BIGINT) AS n_users
          |FROM c GROUP BY k""".stripMargin) +
      ("p167_jsonl_roundtrip" ->
        s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           |  CAST(SUM(len($oToks)) AS BIGINT) AS n_toks
           |FROM documents GROUP BY source""".stripMargin) +
      ("p166_epoch_decorrelation" -> {
        def rankCte(e: Int) =
          s"""r$e AS (SELECT doc_id,
             |    ROW_NUMBER() OVER (ORDER BY
             |      ${oHash(s"'epoch$e|' || CAST(doc_id AS VARCHAR)")},
             |      doc_id) AS r
             |  FROM documents),
             |p$e AS (SELECT doc_id AS pred,
             |    LEAD(doc_id) OVER (ORDER BY r) AS succ
             |  FROM r$e QUALIFY succ IS NOT NULL)""".stripMargin
        def row(a: Int, b: Int) =
          s"""SELECT CAST($a AS BIGINT) AS epoch_a,
             |  CAST($b AS BIGINT) AS epoch_b,
             |  (SELECT CAST(COUNT(*) - 1 AS BIGINT) FROM documents)
             |    AS n_pairs,
             |  (SELECT CAST(COUNT(*) AS BIGINT)
             |   FROM p$a JOIN p$b USING (pred, succ))
             |    AS repeated_adjacent""".stripMargin
        s"""WITH ${rankCte(1)},
           |${rankCte(2)},
           |${rankCte(3)}
           |${row(1, 2)} UNION ALL ${row(1, 3)} UNION ALL ${row(2, 3)}"""
          .stripMargin
      }) +
      ("p164_crop_pairs" ->
        s"""WITH d AS (SELECT doc_id, $oToks AS toks,
           |    CAST(len($oToks) AS BIGINT) AS n FROM documents),
           |f AS (SELECT * FROM d WHERE n >= 8),
           |c AS (SELECT doc_id, toks, n,
           |    GREATEST(1, CAST((n * (40 +
           |      ${oHash("'cropla' || CAST(doc_id AS VARCHAR)")} % 31))
           |      // 100 AS BIGINT)) AS a_len,
           |    GREATEST(1, CAST((n * (40 +
           |      ${oHash("'croplb' || CAST(doc_id AS VARCHAR)")} % 31))
           |      // 100 AS BIGINT)) AS b_len
           |  FROM f),
           |p AS (SELECT doc_id, toks, n, a_len, b_len,
           |    1 + ${oHash("'cropsa' || CAST(doc_id AS VARCHAR)")}
           |      % (n - a_len + 1) AS a_start,
           |    1 + ${oHash("'cropsb' || CAST(doc_id AS VARCHAR)")}
           |      % (n - b_len + 1) AS b_start
           |  FROM c)
           |SELECT doc_id, n AS n_toks, a_start, a_len, b_start, b_len,
           |  GREATEST(0, LEAST(a_start + a_len, b_start + b_len)
           |    - GREATEST(a_start, b_start)) AS overlap_toks,
           |  array_to_string(toks[a_start:a_start + a_len - 1], ' ')
           |    AS crop_a,
           |  array_to_string(toks[b_start:b_start + b_len - 1], ' ')
           |    AS crop_b
           |FROM p""".stripMargin) +
      ("p163_mix_interleave" ->
        s"""$oMixInterleaveCtes
           |SELECT doc_id, source, n_toks, vtime,
           |  CAST(start_tok // 4096 AS BIGINT) AS chunk_idx,
           |  CAST(start_tok % 4096 AS BIGINT) AS chunk_off
           |FROM st""".stripMargin) +
      ("p173_ltr_rerank" -> oLtrRerank(iters = 12, lrNum = 50L)) +
      ("p178_index_export" -> oServingCertify("embeddings")) +
      ("p181_index_append" -> oServingCertify("allv", pre = s"""
         |dmx AS (SELECT MAX(vec_id) + 1 AS base FROM embeddings),
         |delta AS (
         |  SELECT e.vec_id + dmx.base AS vec_id,
         |    ${oRotate("e.embedding", "p181")} AS embedding
         |  FROM embeddings e, dmx
         |  WHERE (e.vec_id + dmx.base) % 10 = 3),
         |allv AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id, embedding FROM delta),
         |""".stripMargin)) +
      ("p183_index_delete" -> {
        val doomed =
          "vec_id % 9 = 2 AND vec_id % 25 != 0 AND vec_id >= 8"
        s"""SELECT 'pre' AS phase, artifact, n_rows, checksum FROM (
           |${oServingCertify("embeddings")}
           |UNION ALL
           |SELECT 'tombstones' AS artifact,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(${oHash("CAST(vec_id AS VARCHAR)")} % 268435456)
           |    AS BIGINT) AS checksum
           |FROM embeddings WHERE $doomed)
           |UNION ALL
           |SELECT 'post' AS phase, artifact, n_rows, checksum FROM (
           |${oServingCertify(
             s"(SELECT vec_id, embedding FROM embeddings" +
               s" WHERE NOT ($doomed))")})""".stripMargin
      }) +
      ("p188_image_ingest_gate" ->
        s"""SELECT a.doc_id AS media_id, e.doc_id AS match_id,
           |  CAST(e.doc_id IS NOT NULL AS BIGINT) AS is_dup
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) a
           |LEFT JOIN (SELECT doc_id FROM documents
           |           WHERE doc_id % 2 = 0) e
           |  ON e.doc_id = a.doc_id - 1""".stripMargin) +
      ("p187_admission_pipeline" -> {
        s"""${oMinhashSigCtes(3, 12)},
           |bds AS (SELECT unnest(generate_series(0, 5)) AS bd),
           |bl AS (SELECT doc_id, bd,
           |    list_slice(sig, bd*2 + 1, bd*2 + 2) AS sl
           |  FROM sg, bds),
           |basebl AS (SELECT * FROM bl WHERE doc_id % 7 != 2),
           |bsz AS (SELECT bd, sl, COUNT(*) AS n, MIN(doc_id) AS bmin
           |  FROM basebl GROUP BY 1, 2),
           |fb AS (SELECT basebl.doc_id, basebl.bd, basebl.sl
           |  FROM basebl JOIN bsz
           |    ON basebl.bd = bsz.bd AND basebl.sl = bsz.sl
           |  WHERE bsz.n <= 1024 OR basebl.doc_id = bsz.bmin),
           |abl AS (SELECT * FROM bl WHERE doc_id % 7 = 2),
           |candd AS (SELECT DISTINCT abl.doc_id AS new_doc,
           |    fb.doc_id AS idx_doc
           |  FROM abl JOIN fb ON abl.bd = fb.bd AND abl.sl = fb.sl),
           |agrd AS (SELECT cd.new_doc, cd.idx_doc,
           |    CAST(list_sum(list_transform(generate_series(1, 12),
           |      i -> CASE WHEN ns.sig[i] = xs.sig[i]
           |           THEN 1 ELSE 0 END)) AS BIGINT) AS n_agree
           |  FROM candd cd
           |  JOIN sg ns ON ns.doc_id = cd.new_doc
           |  JOIN sg xs ON xs.doc_id = cd.idx_doc),
           |bestd AS (SELECT new_doc, n_agree,
           |    ROW_NUMBER() OVER (PARTITION BY new_doc
           |      ORDER BY n_agree DESC, idx_doc ASC) AS rn FROM agrd),
           |ch AS (SELECT DISTINCT doc_id, ${oHash("s")} AS h
           |  FROM (SELECT doc_id, unnest(${oShingles(3)}) AS s
           |        FROM t)),
           |bp AS (SELECT doc_id AS bench_doc, h FROM ch
           |  WHERE doc_id % 7 != 2 AND doc_id % 20 = 0),
           |tp AS (SELECT doc_id, h FROM ch WHERE doc_id % 7 = 2),
           |cpairs AS (SELECT tp.doc_id, bench_doc,
           |    CAST(COUNT(*) AS BIGINT) AS n_shared
           |  FROM tp JOIN bp USING (h) GROUP BY 1, 2),
           |bestc AS (SELECT doc_id, n_shared,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id
           |      ORDER BY n_shared DESC, bench_doc ASC) AS rn
           |  FROM cpairs),
           |g AS (${oGopherRules(minWords = 20, minStop = 1)}),
           |c AS (${oC4Lines(minLineWords = 3, requirePunct = false,
                    minSentences = 0)}),
           |q AS (${oracle0("p09_quality")}),
           |lab AS (
           |  SELECT d.doc_id,
           |    CAST(CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END
           |         * g.keep * c.page_keep AS BIGINT) AS cls
           |  FROM documents d
           |  JOIN g ON d.doc_id = g.doc_id
           |  JOIN c ON d.doc_id = c.doc_id
           |  JOIN q ON d.doc_id = q.doc_id),
           |arr AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 2)
           |SELECT arr.doc_id,
           |  COALESCE(bd.n_agree, 0) AS n_agree,
           |  COALESCE(bc.n_shared, 0) AS n_shared,
           |  lab.cls AS quality_keep,
           |  CASE WHEN COALESCE(bd.n_agree, 0) >= 8 THEN 'reject_dup'
           |       WHEN COALESCE(bc.n_shared, 0) >= 2
           |         THEN 'reject_contaminated'
           |       WHEN lab.cls = 0 THEN 'reject_quality'
           |       ELSE 'admit' END AS verdict
           |FROM arr
           |LEFT JOIN (SELECT * FROM bestd WHERE rn = 1) bd
           |  ON bd.new_doc = arr.doc_id
           |LEFT JOIN (SELECT * FROM bestc WHERE rn = 1) bc
           |  ON bc.doc_id = arr.doc_id
           |JOIN lab ON lab.doc_id = arr.doc_id""".stripMargin
      }) +
      ("p186_index_lifecycle" -> {
        val doomed =
          "vec_id % 9 = 2 AND vec_id % 25 != 0 AND vec_id >= 8"
        val deltaCtes = s"""
           |dmx AS (SELECT MAX(vec_id) + 1 AS base FROM embeddings),
           |delta AS (
           |  SELECT e.vec_id + dmx.base AS vec_id,
           |    ${oRotate("e.embedding", "p186")} AS embedding
           |  FROM embeddings e, dmx
           |  WHERE (e.vec_id + dmx.base) % 10 = 3),
           |allv AS (SELECT vec_id, embedding FROM embeddings
           |  UNION ALL SELECT vec_id, embedding FROM delta),
           |""".stripMargin
        val liveCtes = deltaCtes + s"""live AS (
           |  SELECT vec_id, embedding FROM allv
           |  WHERE vec_id NOT IN
           |    (SELECT vec_id FROM embeddings WHERE $doomed)),
           |""".stripMargin
        val tombRow = s"""SELECT 'tombstones' AS artifact,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(${oHash("CAST(vec_id AS VARCHAR)")} % 268435456)
           |    AS BIGINT) AS checksum
           |FROM embeddings WHERE $doomed""".stripMargin
        s"""SELECT '1_export' AS phase, artifact, n_rows, checksum
           |FROM (${oServingCertify("embeddings")})
           |UNION ALL
           |SELECT '2_append' AS phase, artifact, n_rows, checksum
           |FROM (${oServingCertify("allv", pre = deltaCtes)})
           |UNION ALL
           |SELECT '3_delete' AS phase, artifact, n_rows, checksum
           |FROM (${oServingCertify("allv", pre = deltaCtes)}
           |      UNION ALL
           |      $tombRow)
           |UNION ALL
           |SELECT '4_compact' AS phase, artifact, n_rows, checksum
           |FROM (${oServingCertify("live", pre = liveCtes)})"""
          .stripMargin
      }) +
      ("p185_ingest_decontaminate" ->
        s"""WITH sh AS (
           |  SELECT DISTINCT doc_id, ${oHash("s")} AS h
           |  FROM (SELECT doc_id, unnest(${oShingles(3)}) AS s
           |        FROM (SELECT doc_id, $oToks AS toks
           |              FROM documents))),
           |b AS (SELECT doc_id AS bench_doc, h FROM sh
           |  WHERE doc_id % 20 = 0),
           |tr AS (SELECT doc_id AS train_doc, h FROM sh
           |  WHERE doc_id % 20 != 0),
           |pairs AS (
           |  SELECT train_doc, bench_doc,
           |    CAST(COUNT(*) AS BIGINT) AS n_shared
           |  FROM tr JOIN b USING (h) GROUP BY 1, 2),
           |best AS (
           |  SELECT train_doc, n_shared, bench_doc,
           |    ROW_NUMBER() OVER (PARTITION BY train_doc
           |      ORDER BY n_shared DESC, bench_doc ASC) AS rn
           |  FROM pairs)
           |SELECT a.doc_id, COALESCE(x.n_shared, 0) AS n_shared,
           |  x.bench_doc AS match_bench,
           |  CAST(COALESCE(x.n_shared, 0) >= 2 AS BIGINT)
           |    AS is_contaminated
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 != 0) a
           |LEFT JOIN (SELECT * FROM best WHERE rn = 1) x
           |  ON x.train_doc = a.doc_id""".stripMargin) +
      ("p184_dedup_append" -> {
        s"""${oMinhashSigCtes(3, 12)},
           |bds AS (SELECT unnest(generate_series(0, 5)) AS bd),
           |bl AS (SELECT doc_id, bd,
           |    CAST(bd AS VARCHAR) || '_'
           |      || CAST(sig[bd*2 + 1] AS VARCHAR) || '_'
           |      || CAST(sig[bd*2 + 2] AS VARCHAR) AS key
           |  FROM sg, bds),
           |basebl AS (SELECT * FROM bl WHERE doc_id % 3 != 0),
           |bsz AS (SELECT key, COUNT(*) AS n, MIN(doc_id) AS bmin
           |  FROM basebl GROUP BY 1),
           |fb AS (
           |  SELECT b.key, b.doc_id FROM basebl b
           |  JOIN bsz ON b.key = bsz.key
           |  WHERE bsz.n <= 1024 OR b.doc_id = bsz.bmin
           |  UNION ALL
           |  SELECT key, doc_id FROM bl WHERE doc_id % 3 = 0)
           |SELECT 'bands' AS artifact,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(${oHash(
                 "key || ':' || CAST(doc_id AS VARCHAR)")}
           |    % 268435456) AS BIGINT) AS checksum
           |FROM fb
           |UNION ALL
           |SELECT 'sigs' AS artifact,
           |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_rows,
           |  CAST(SUM(${oHash(
                 "CAST(doc_id AS VARCHAR) || ':' ||" +
                   " CAST(i - 1 AS VARCHAR) || ':' ||" +
                   " CAST(sig[i] AS VARCHAR)")}
           |    % 268435456) AS BIGINT) AS checksum
           |FROM sg, (SELECT unnest(generate_series(1, 12)) AS i)"""
          .stripMargin
      }) +
      ("p182_ingest_dedup" -> {
        val P = 2147483647L
        val dsigs = TF.minhashSeeds(12).map { case (a, b) =>
          s"COALESCE(list_min(list_transform(dbh, h -> ($a * h + $b) % $P)), $P)"
        }.mkString(",\n      ")
        val idv = "CAST(t.doc_id AS VARCHAR)"
        val novel = s"'zqa' || $idv || ' zqb' || $idv || ' zqc' ||" +
          s" $idv || ' zqd' || $idv"
        s"""${oMinhashSigCtes(3, 12)},
           |bds AS (SELECT unnest(generate_series(0, 5)) AS bd),
           |bl AS (SELECT doc_id, bd,
           |    list_slice(sig, bd*2 + 1, bd*2 + 2) AS sl
           |  FROM sg, bds),
           |bsz AS (SELECT bd, sl, COUNT(*) AS n, MIN(doc_id) AS bmin
           |  FROM bl GROUP BY 1, 2),
           |fb AS (SELECT bl.doc_id, bl.bd, bl.sl FROM bl
           |  JOIN bsz ON bl.bd = bsz.bd AND bl.sl = bsz.sl
           |  WHERE bsz.n <= 1024 OR bl.doc_id = bsz.bmin),
           |dmx AS (SELECT MAX(doc_id) + 1 AS base FROM documents),
           |dd AS (SELECT t.doc_id + dmx.base AS doc_id,
           |    t.doc_id AS orig,
           |    CASE WHEN t.doc_id % 10 = 1 THEN 'copy'
           |         WHEN t.doc_id % 10 = 4 THEN 'trunc'
           |         ELSE 'novel' END AS kind,
           |    CASE WHEN t.doc_id % 10 = 1 THEN d.text
           |         WHEN t.doc_id % 10 = 4 THEN array_to_string(
           |           list_slice(t.toks, 1, (len(t.toks) + 1) // 2),
           |           ' ')
           |         ELSE $novel END AS dtext
           |  FROM t JOIN documents d ON t.doc_id = d.doc_id, dmx
           |  WHERE t.doc_id % 10 IN (1, 4, 7)),
           |ddt AS (SELECT doc_id, orig, kind,
           |    ${oToksOf("dtext")} AS toks FROM dd),
           |dshs AS (SELECT doc_id, orig, kind, ${oShingles(3)} AS sh
           |  FROM ddt),
           |dhh AS (SELECT doc_id, orig, kind,
           |    list_transform(sh, s0 -> ${oHash("s0")} % $P) AS dbh
           |  FROM dshs),
           |dsg AS (SELECT doc_id, orig, kind, [
           |      $dsigs] AS sig FROM dhh),
           |dbl AS (SELECT doc_id, bd,
           |    list_slice(sig, bd*2 + 1, bd*2 + 2) AS sl
           |  FROM dsg, bds),
           |cand AS (SELECT DISTINCT dbl.doc_id AS new_doc,
           |    fb.doc_id AS idx_doc
           |  FROM dbl JOIN fb ON dbl.bd = fb.bd AND dbl.sl = fb.sl),
           |agr AS (SELECT c.new_doc, c.idx_doc,
           |    CAST(list_sum(list_transform(generate_series(1, 12),
           |      i -> CASE WHEN ns.sig[i] = xs.sig[i]
           |           THEN 1 ELSE 0 END)) AS BIGINT) AS n_agree
           |  FROM cand c
           |  JOIN dsg ns ON ns.doc_id = c.new_doc
           |  JOIN sg xs ON xs.doc_id = c.idx_doc),
           |best AS (SELECT new_doc, n_agree, idx_doc,
           |    ROW_NUMBER() OVER (PARTITION BY new_doc
           |      ORDER BY n_agree DESC, idx_doc ASC) AS rn FROM agr)
           |SELECT d.doc_id, d.orig, d.kind,
           |  COALESCE(b.n_agree, 0) AS n_agree, b.idx_doc AS match_doc,
           |  CAST(COALESCE(b.n_agree, 0) >= 8 AS BIGINT) AS is_dup
           |FROM dsg d
           |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
           |  ON b.new_doc = d.doc_id""".stripMargin
      }) +
      ("p177_passage_retrieval" -> {
        val cavgdl = "(CAST(cst.sdl AS DOUBLE) / CAST(cst.nd AS DOUBLE))"
        val cidf = "ln(1.0 + (CAST(cst.nd AS DOUBLE) - CAST(f.df" +
          " AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))"
        val cnorm = s"(CAST(p.tf AS DOUBLE) * 2.2" +
          s" / (CAST(p.tf AS DOUBLE) + 1.2 * (0.25" +
          s" + 0.75 * (CAST(d.dl AS DOUBLE) / $cavgdl))))"
        s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 8,
              baseCteBody = Some(s"""
           |  SELECT d.doc_id,
           |    ${oToksOf("pp.pad || ' ' || d.text")}
           |      AS toks,
           |    $oToks AS qtoks
           |  FROM documents d
           |  JOIN (
           |    SELECT ((doc_id - 1 + nn.n) % nn.n) AS target,
           |      array_to_string(list_transform($oToks,
           |        x -> x || ' xfillerx xfillerx xfillerx xfillerx' ||
           |             ' xfillerx xfillerx'), ' ') AS pad
           |    FROM documents,
           |      (SELECT COUNT(*) AS n FROM documents) nn
           |  ) pp ON pp.target = d.doc_id""".stripMargin))},
           |cw AS (SELECT doc_id, toks,
           |    CASE WHEN len(toks) <= 32 THEN 1
           |         ELSE (len(toks) - 32 + 23) // 24 + 1 END AS nw
           |  FROM base WHERE len(toks) > 0),
           |ctk AS (SELECT doc_id * 10000 + seq AS cid,
           |    toks[seq * 24 + 1 : seq * 24 + 32] AS ct
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(0, nw - 1)) AS seq
           |        FROM cw)),
           |cdl AS (SELECT cid, CAST(len(ct) AS BIGINT) AS dl FROM ctk),
           |cst AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
           |    CAST(SUM(dl) AS BIGINT) AS sdl FROM cdl),
           |cpost AS (
           |  SELECT tok, cid, COUNT(*) AS tf
           |  FROM (SELECT cid, unnest(ct) AS tok FROM ctk)
           |  GROUP BY tok, cid),
           |cdfq AS (
           |  SELECT p.tok, COUNT(*) AS df FROM cpost p
           |  WHERE p.tok IN (SELECT DISTINCT tok FROM qt)
           |  GROUP BY p.tok),
           |csc AS (
           |  SELECT q.query_id, p.cid,
           |    CAST(SUM(CAST(FLOOR($cidf * $cnorm * 1000000.0)
           |      AS BIGINT)) AS BIGINT) AS score_micro
           |  FROM cpost p
           |  JOIN qt q ON p.tok = q.tok
           |  JOIN cdfq f ON p.tok = f.tok
           |  JOIN cdl d ON p.cid = d.cid
           |  CROSS JOIN cst
           |  GROUP BY q.query_id, p.cid),
           |crk AS (
           |  SELECT query_id, cid, score_micro,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY score_micro DESC, cid) AS rank
           |  FROM csc),
           |mp AS (SELECT query_id, cid // 10000 AS doc_id,
           |    MAX(score_micro) AS ms
           |  FROM crk WHERE rank <= 30 GROUP BY 1, 2),
           |mrk AS (SELECT query_id, doc_id,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY ms DESC, doc_id) AS rank
           |  FROM mp)
           |${oScorecardRow(
              "(SELECT query_id, doc_id, rank FROM rk WHERE rank <= 10)",
              "doc_bm25")}
           |UNION ALL
           |${oScorecardRow(
              "(SELECT query_id, doc_id, rank FROM mrk WHERE rank <= 10)",
              "chunk_maxp")}""".stripMargin
      }) +
      ("p176_doc_chunks" ->
        s"""WITH d AS (SELECT doc_id, $oToks AS toks FROM documents),
           |n AS (SELECT doc_id, toks,
           |    CAST(len(toks) AS BIGINT) AS n FROM d),
           |w AS (SELECT doc_id, toks, n,
           |    CASE WHEN n <= 32 THEN 1
           |         ELSE (n - 32 + 23) // 24 + 1 END AS nw
           |  FROM n WHERE n > 0),
           |x AS (SELECT doc_id, toks, n,
           |    unnest(generate_series(0, nw - 1)) AS chunk_seq
           |  FROM w)
           |SELECT doc_id, CAST(chunk_seq AS BIGINT) AS chunk_seq,
           |  CAST(chunk_seq * 24 AS BIGINT) AS start_tok,
           |  CAST(LEAST(32, n - chunk_seq * 24) AS BIGINT)
           |    AS n_chunk_toks,
           |  array_to_string(toks[chunk_seq * 24 + 1 :
           |    chunk_seq * 24 + 32], ' ') AS chunk_text
           |FROM x""".stripMargin) +
      ("p175_release_diff" -> oReleaseDiffCard) +
      ("p174_shard_append" ->
        // the p172 append manifest + the p171 checksum rollup: the
        // incrementally-extended shard directory must certify exactly
        // as a full write of the appended manifest would
        s"""$oAppendManifestCtes,
           |um AS (
           |  SELECT doc_id, n_toks,
           |    CAST(start_tok // 4096 AS BIGINT) AS chunk_idx,
           |    CAST(start_tok % 4096 AS BIGINT) AS chunk_off
           |  FROM stb
           |  UNION ALL
           |  SELECT doc_id, n_toks,
           |    CAST(start_tok // 4096 AS BIGINT) AS chunk_idx,
           |    CAST(start_tok % 4096 AS BIGINT) AS chunk_off
           |  FROM std),
           |mf AS (
           |  SELECT um.chunk_idx, um.chunk_off, um.n_toks,
           |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp
           |  FROM um JOIN documents d ON um.doc_id = d.doc_id)
           |SELECT chunk_idx, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_toks) AS BIGINT) AS n_toks,
           |  CAST(SUM(${oHash("fp || ':' || CAST(chunk_off AS VARCHAR)")}
           |           % 268435456) AS BIGINT) AS shard_sum,
           |  CAST(0 AS BIGINT) AS order_inversions
           |FROM mf GROUP BY chunk_idx""".stripMargin) +
      ("p172_manifest_append" ->
        s"""$oAppendManifestCtes
           |SELECT doc_id, source, n_toks, vtime,
           |  CAST(start_tok // 4096 AS BIGINT) AS chunk_idx,
           |  CAST(start_tok % 4096 AS BIGINT) AS chunk_off
           |FROM stb
           |UNION ALL
           |SELECT doc_id, source, n_toks, vtime,
           |  CAST(start_tok // 4096 AS BIGINT) AS chunk_idx,
           |  CAST(start_tok % 4096 AS BIGINT) AS chunk_off
           |FROM std""".stripMargin) +
      ("p165_shard_mix" ->
        s"""$oMixInterleaveCtes,
           |m AS (SELECT doc_id, source, n_toks,
           |    CAST(start_tok // 4096 AS BIGINT) AS chunk_idx FROM st),
           |sh AS (SELECT chunk_idx, CAST(COUNT(*) AS BIGINT)
           |    AS shard_docs FROM m GROUP BY 1),
           |tw AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS tw FROM w),
           |g AS (SELECT chunk_idx, source,
           |    CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(n_toks) AS BIGINT) AS n_toks
           |  FROM m GROUP BY 1, 2)
           |SELECT g.chunk_idx, g.source, n_docs, n_toks,
           |  CAST(n_docs * 1000000 // shard_docs AS BIGINT)
           |    AS share_micro,
           |  CAST(weight_micro * 1000000 // tw AS BIGINT)
           |    AS target_micro,
           |  CAST(ABS(n_docs * 1000000 // shard_docs
           |    - weight_micro * 1000000 // tw) AS BIGINT)
           |    AS abs_dev_micro
           |FROM g JOIN sh USING (chunk_idx)
           |JOIN w ON g.source = w.source, tw""".stripMargin) +
      ("p162_distinct_n" ->
        s"""WITH base AS (SELECT source, $oToks AS toks FROM documents),
           |g AS (
           |  SELECT source, 1 AS n, toks[i] AS g
           |  FROM (SELECT source, toks,
           |          unnest(generate_series(1, len(toks))) AS i
           |        FROM base WHERE len(toks) >= 1)
           |  UNION ALL
           |  SELECT source, 2 AS n, array_to_string(toks[i:i+1], ' ')
           |  FROM (SELECT source, toks,
           |          unnest(generate_series(1, len(toks) - 1)) AS i
           |        FROM base WHERE len(toks) >= 2)
           |  UNION ALL
           |  SELECT source, 3 AS n, array_to_string(toks[i:i+2], ' ')
           |  FROM (SELECT source, toks,
           |          unnest(generate_series(1, len(toks) - 2)) AS i
           |        FROM base WHERE len(toks) >= 3)),
           |c AS (SELECT source, n, g, COUNT(*) AS cnt
           |  FROM g GROUP BY source, n, g)
           |SELECT source, CAST(n AS BIGINT) AS n,
           |  CAST(COUNT(*) AS BIGINT) AS distinct_grams,
           |  CAST(SUM(cnt) AS BIGINT) AS total_grams,
           |  CASE WHEN SUM(cnt) = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST((COUNT(*) * 1000000) // SUM(cnt) AS BIGINT)
           |  END AS distinct_frac_micro
           |FROM c GROUP BY source, n""".stripMargin) +
      ("p150_rate_spikes" ->
        """WITH hourly AS (
          |  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT)
          |      AS ws_us,
          |    event_type, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |m1 AS (SELECT event_type, n AS median_n FROM (
          |    SELECT event_type, n, ws_us,
          |      ROW_NUMBER() OVER (PARTITION BY event_type
          |        ORDER BY n, ws_us) AS rn,
          |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
          |    FROM hourly) WHERE rn = (cnt + 1) // 2),
          |dev AS (SELECT h.event_type, h.ws_us, h.n, m1.median_n,
          |    ABS(h.n - m1.median_n) AS ad
          |  FROM hourly h JOIN m1 USING (event_type)),
          |m2 AS (SELECT event_type, ad AS mad_n FROM (
          |    SELECT event_type, ad, ws_us,
          |      ROW_NUMBER() OVER (PARTITION BY event_type
          |        ORDER BY ad, ws_us) AS rn,
          |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
          |    FROM dev) WHERE rn = (cnt + 1) // 2)
          |SELECT d.event_type, d.ws_us, d.n, d.median_n, m2.mad_n,
          |  CASE WHEN d.n > d.median_n + 3 * m2.mad_n
          |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
          |  END AS spike
          |FROM dev d JOIN m2 USING (event_type)""".stripMargin) +
      ("p149_survivor_policies" ->
        s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
           |edges AS (
           |  SELECT doc_a AS u, doc_b AS v FROM pairs
           |  UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |dec AS (SELECT u AS doc_id, MIN(v) AS comp
           |        FROM reach GROUP BY u),
           |$oScoreCtes,
           |m AS (SELECT dec.doc_id, dec.comp, qm.n_toks, q.score_micro
           |      FROM dec JOIN qm ON dec.doc_id = qm.doc_id
           |               JOIN q ON dec.doc_id = q.doc_id),
           |mw AS (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY comp ORDER BY doc_id)
           |      AS r_min,
           |    ROW_NUMBER() OVER (PARTITION BY comp
           |      ORDER BY n_toks DESC, doc_id) AS r_long,
           |    ROW_NUMBER() OVER (PARTITION BY comp
           |      ORDER BY score_micro DESC, doc_id) AS r_qual
           |  FROM m),
           |per AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz,
           |    CAST(SUM(n_toks) AS BIGINT) AS toks_all,
           |    MIN(doc_id) AS s_min,
           |    MAX(CASE WHEN r_min = 1 THEN n_toks END) AS t_min,
           |    MAX(CASE WHEN r_min = 1 THEN score_micro END) AS q_min,
           |    MAX(CASE WHEN r_long = 1 THEN doc_id END) AS s_long,
           |    MAX(CASE WHEN r_long = 1 THEN n_toks END) AS t_long,
           |    MAX(CASE WHEN r_long = 1 THEN score_micro END) AS q_long,
           |    MAX(CASE WHEN r_qual = 1 THEN doc_id END) AS s_qual,
           |    MAX(CASE WHEN r_qual = 1 THEN n_toks END) AS t_qual,
           |    MAX(CASE WHEN r_qual = 1 THEN score_micro END) AS q_qual
           |  FROM mw GROUP BY comp)
           |SELECT 'min_id' AS policy,
           |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
           |  CAST(SUM(sz - 1) AS BIGINT) AS n_dropped,
           |  CAST(SUM(toks_all - t_min) AS BIGINT) AS toks_removed,
           |  CAST(SUM(q_min) AS BIGINT) AS quality_kept_micro,
           |  CAST(0 AS BIGINT) AS changed_vs_min_id FROM per
           |UNION ALL
           |SELECT 'keep_longest', CAST(COUNT(*) AS BIGINT),
           |  CAST(SUM(sz - 1) AS BIGINT),
           |  CAST(SUM(toks_all - t_long) AS BIGINT),
           |  CAST(SUM(q_long) AS BIGINT),
           |  CAST(SUM(CASE WHEN s_long <> s_min THEN 1 ELSE 0 END)
           |    AS BIGINT) FROM per
           |UNION ALL
           |SELECT 'keep_best_quality', CAST(COUNT(*) AS BIGINT),
           |  CAST(SUM(sz - 1) AS BIGINT),
           |  CAST(SUM(toks_all - t_qual) AS BIGINT),
           |  CAST(SUM(q_qual) AS BIGINT),
           |  CAST(SUM(CASE WHEN s_qual <> s_min THEN 1 ELSE 0 END)
           |    AS BIGINT) FROM per""".stripMargin) +
      ("p148_hdr_quantiles" -> {
        val p = 3
        val eChain = (0 until 40).map(b =>
          s"CASE WHEN v >= ${1L << b} THEN $b ELSE 0 END")
          .mkString("GREATEST(", ", ", ")")
        s"""WITH vals AS (SELECT CAST(len($oToks) AS BIGINT) AS v
           |  FROM documents),
           |ve AS (SELECT v, $eChain AS e FROM vals),
           |vb AS (SELECT v,
           |    CASE WHEN v < 8 THEN v
           |         ELSE (e - $p) * 8
           |              + v // (CAST(1 AS BIGINT) << (e - $p)) END
           |      AS bid,
           |    CASE WHEN v < 8 THEN v
           |         ELSE (v // (CAST(1 AS BIGINT) << (e - $p)) + 1)
           |              * (CAST(1 AS BIGINT) << (e - $p)) - 1 END
           |      AS ub
           |  FROM ve),
           |bk AS (SELECT bid, ub, CAST(COUNT(*) AS BIGINT) AS c
           |       FROM vb GROUP BY bid, ub),
           |bc AS (SELECT bid, ub, c,
           |    CAST(SUM(c) OVER (ORDER BY bid ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cum FROM bk),
           |xc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
           |       FROM vals GROUP BY v),
           |xcc AS (SELECT v,
           |    CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cum FROM xc),
           |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
           |cp AS (SELECT unnest([50, 90, 99]) AS pct),
           |th AS (SELECT pct, (CAST(pct AS BIGINT) * nn.n + 99) // 100
           |         AS t, nn.n FROM cp, nn),
           |ex AS (SELECT th.pct, th.n,
           |    MIN(CASE WHEN xcc.cum >= th.t THEN xcc.v END) AS exact
           |  FROM th, xcc GROUP BY th.pct, th.n),
           |es AS (SELECT th.pct,
           |    MIN(CASE WHEN bc.cum >= th.t THEN bc.ub END) AS est
           |  FROM th, bc GROUP BY th.pct)
           |SELECT CAST(ex.pct AS BIGINT) AS pct, ex.n AS n_values,
           |  ex.exact, es.est, es.est - ex.exact AS overshoot,
           |  CASE WHEN ex.exact = 0 THEN CAST(0 AS BIGINT)
           |       ELSE ((es.est - ex.exact) * 1000000) // ex.exact
           |  END AS rel_err_micro
           |FROM ex JOIN es ON ex.pct = es.pct""".stripMargin
      }) +
      ("p147_vocab_growth" ->
        s"""WITH d AS (SELECT doc_id, $oToks AS toks,
           |    ${oHash("'vg' || CAST(doc_id AS VARCHAR)")} % 16 AS b
           |  FROM documents),
           |occ AS (SELECT b, unnest(toks) AS tok FROM d),
           |tm AS (SELECT tok, MIN(b) AS mb FROM occ GROUP BY tok),
           |da AS (SELECT b, COUNT(*) AS nd, SUM(len(toks)) AS occ
           |       FROM d GROUP BY b),
           |cp AS (SELECT unnest([1, 2, 4, 8, 16]) AS c),
           |ds AS (SELECT cp.c,
           |    CAST(COALESCE(SUM(CASE WHEN da.b < cp.c THEN da.nd END),
           |      0) AS BIGINT) AS n_docs,
           |    CAST(COALESCE(SUM(CASE WHEN da.b < cp.c THEN da.occ END),
           |      0) AS BIGINT) AS n_occurrences
           |  FROM cp LEFT JOIN da ON 1=1 GROUP BY cp.c),
           |vs AS (SELECT cp.c,
           |    CAST(COALESCE(SUM(CASE WHEN tm.mb < cp.c THEN 1 END),
           |      0) AS BIGINT) AS vocab
           |  FROM cp LEFT JOIN tm ON 1=1 GROUP BY cp.c)
           |SELECT CAST(ds.c AS BIGINT) AS sixteenths, n_docs,
           |  n_occurrences, vs.vocab,
           |  CASE WHEN n_occurrences = 0 THEN CAST(0 AS BIGINT)
           |       ELSE (vs.vocab * 1000000) // n_occurrences
           |  END AS ttr_micro
           |FROM ds JOIN vs ON ds.c = vs.c""".stripMargin) +
      ("p146_bootstrap_ci" ->
        s"""WITH rb AS (SELECT * FROM (${oBm25(k1 = 1.2, b = 0.75,
              qTerms = 4, topK = 10)})),
           |qs AS (SELECT doc_id AS query_id FROM documents
           |       WHERE doc_id % ${oQStride("documents")} = 0),
           |rr AS (SELECT q.query_id, COALESCE(h.rr0, 0) AS rr
           |  FROM qs q LEFT JOIN
           |    (SELECT query_id, 1000000 // rank AS rr0 FROM rb
           |     WHERE doc_id = query_id) h
           |  ON q.query_id = h.query_id),
           |ix AS (SELECT query_id, rr,
           |    ROW_NUMBER() OVER (ORDER BY query_id) - 1 AS idx FROM rr),
           |nqt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq FROM ix),
           |grid AS (
           |  SELECT b, j, nqt.nq,
           |    ${oHash("'boot' || CAST(b AS VARCHAR) || '_' ||" +
                " CAST(j AS VARCHAR)")} % nqt.nq AS idx
           |  FROM (SELECT unnest(generate_series(1, 200)) AS b),
           |       (SELECT unnest(generate_series(0,
           |          (SELECT nq FROM nqt) - 1)) AS j), nqt),
           |boot AS (
           |  SELECT g.b, CAST(SUM(ix.rr) AS BIGINT) // g.nq AS mrr
           |  FROM grid g JOIN ix ON g.idx = ix.idx
           |  GROUP BY g.b, g.nq),
           |rn AS (SELECT b, mrr,
           |    ROW_NUMBER() OVER (ORDER BY mrr ASC, b ASC) AS rn
           |  FROM boot),
           |ci AS (SELECT
           |    MAX(CASE WHEN rn = 10 THEN mrr END) AS ci_lo_micro,
           |    MAX(CASE WHEN rn = 190 THEN mrr END) AS ci_hi_micro
           |  FROM rn),
           |ob AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           |    CAST(SUM(rr) AS BIGINT) // COUNT(*) AS mrr_micro
           |  FROM rr)
           |SELECT 'bm25' AS method, n_queries,
           |  CAST(200 AS BIGINT) AS n_boot, mrr_micro,
           |  ci_lo_micro, ci_hi_micro
           |FROM ob, ci""".stripMargin) +
      ("p145_packing_efficiency" ->
        s"""WITH tk AS (SELECT source,
           |    CAST(len($oToks) AS BIGINT) AS n_toks FROM documents),
           |ag AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(n_toks) AS BIGINT) AS total_toks,
           |    CAST(SUM((n_toks + 2047) // 2048) AS BIGINT)
           |      AS naive_chunks
           |  FROM tk GROUP BY source),
           |pk AS (SELECT *, (total_toks + 2047) // 2048
           |         AS packed_chunks FROM ag)
           |SELECT source, n_docs, total_toks, packed_chunks,
           |  packed_chunks * 2048 - total_toks AS packed_pad_toks,
           |  naive_chunks,
           |  naive_chunks * 2048 - total_toks AS naive_pad_toks,
           |  CASE WHEN naive_chunks = 0 THEN CAST(0 AS BIGINT)
           |       ELSE ((naive_chunks - packed_chunks) * 1000000)
           |            // naive_chunks END AS saved_chunks_pct_micro
           |FROM pk""".stripMargin) +
      ("p144_pmi_expansion" ->
        s"""WITH rb AS (SELECT * FROM (${oBm25(k1 = 1.2, b = 0.75,
              qTerms = 4, topK = 10)})),
           |rx AS (SELECT * FROM ($oBm25PmiExpanded))
           |${oScorecardRow("rb", "bm25")}
           |UNION ALL
           |${oScorecardRow("rx", "bm25_pmi")}""".stripMargin) +
      ("p139_classifier_agreement" -> {
        def fd(x: String, m: String) =
          s"(($x) - ((($x) % ($m)) + ($m)) % ($m)) // ($m)"
        s"""WITH nb AS (${oNbClassifier}),
           |lr AS (${oLrClassifier(buckets = 64, iters = 12,
              lrDen = 1)}),
           |jj AS (SELECT nb.pred AS pa, lr.pred AS pb
           |       FROM nb JOIN lr ON nb.doc_id = lr.doc_id),
           |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CASE WHEN pa = pb THEN 1 ELSE 0 END) AS BIGINT)
           |    AS agree,
           |  CAST(SUM(pa) AS BIGINT) AS pos_a,
           |  CAST(SUM(pb) AS BIGINT) AS pos_b FROM jj),
           |r AS (SELECT n, agree, pos_a, pos_b,
           |  ${fd("agree * 1000000", "n")} AS po_micro,
           |  ${fd("(pos_a * pos_b + (n - pos_a) * (n - pos_b))" +
                " * 1000000", "n * n")} AS pe_micro
           |  FROM ag)
           |SELECT n, agree, pos_a, pos_b, po_micro, pe_micro,
           |  CASE WHEN pe_micro = 1000000 THEN 1000000
           |       ELSE ${fd("(po_micro - pe_micro) * 1000000",
                "1000000 - pe_micro")} END AS kappa_micro
           |FROM r""".stripMargin
      }) +
      ("p136_significance" ->
        s"""WITH qids AS (SELECT doc_id AS query_id FROM documents
           |  WHERE doc_id % ${oQStride("documents")} = 0),
           |rbm AS (SELECT * FROM (${oBm25(k1 = 1.2, b = 0.75,
              qTerms = 4, topK = 10)})),
           |rbf AS (SELECT * FROM ($oBm25f)),
           |rql AS (SELECT * FROM ($oQlTopK)),
           |rpf AS (SELECT * FROM ($oPrf)),
           |rrfx AS (SELECT * FROM ($oRrf)),
           |${oSigMetric("rbf", "xf")},
           |${oSigMetric("rbm", "xb")},
           |${oSigMetric("rql", "xq")},
           |${oSigMetric("rpf", "xp")},
           |${oSigMetric("rrfx", "xr")},
           |${oSigBlock("bm25f_vs_bm25", "xb")},
           |${oSigBlock("bm25f_vs_ql", "xq")},
           |${oSigBlock("bm25f_vs_prf", "xp")},
           |${oSigBlock("bm25f_vs_rrf", "xr")}
           |SELECT * FROM sxb UNION ALL SELECT * FROM sxq
           |UNION ALL SELECT * FROM sxp
           |UNION ALL SELECT * FROM sxr""".stripMargin) +
      ("p135_spell" ->
        s"""WITH vt AS (
           |  SELECT tok, COUNT(*) AS cnt
           |  FROM (SELECT unnest($oToks) AS tok FROM documents)
           |  GROUP BY tok),
           |vocab AS (SELECT tok FROM vt
           |          WHERE cnt >= 5 AND length(tok) >= 3),
           |probes AS (
           |  SELECT DISTINCT substr(tok, 1, 1) || substr(tok, 3)
           |    AS probe
           |  FROM vt WHERE cnt >= 20 AND length(tok) >= 4
           |    AND ${oHash("tok")} % 5 = 0),
           |vb AS (
           |  SELECT tok AS cand,
           |    unnest(list_distinct(list_transform(
           |      generate_series(1, length(tok) - 1),
           |      i -> substr(tok, i, 2)))) AS bg
           |  FROM vocab),
           |pb AS (
           |  SELECT probe,
           |    unnest(list_distinct(list_transform(
           |      generate_series(1, length(probe) - 1),
           |      i -> substr(probe, i, 2)))) AS bg
           |  FROM probes),
           |cnd AS (SELECT DISTINCT probe, cand
           |        FROM pb JOIN vb ON pb.bg = vb.bg),
           |scd AS (
           |  SELECT probe, cand,
           |    CAST(levenshtein(probe, cand) AS BIGINT) AS dist
           |  FROM cnd
           |  WHERE levenshtein(probe, cand) <= 2
           |    AND levenshtein(probe, cand) > 0),
           |fin AS (
           |  SELECT probe, cand, dist,
           |    COUNT(*) OVER (PARTITION BY probe) AS n_cands,
           |    ROW_NUMBER() OVER (PARTITION BY probe
           |      ORDER BY dist, cand) AS rn
           |  FROM scd)
           |SELECT probe, cand AS suggestion, dist,
           |  CAST(n_cands AS BIGINT) AS n_cands
           |FROM fin WHERE rn = 1""".stripMargin) +
      ("p134_proximity" ->
        s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
           |xcand AS (SELECT query_id, doc_id, score_micro FROM rk
           |          WHERE rank <= 10),
           |xpos AS (
           |  SELECT b.doc_id, b.i AS pos, b.toks[b.i] AS tok
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(1, len(toks))) AS i
           |        FROM base) b
           |  JOIN (SELECT DISTINCT doc_id FROM xcand) cd
           |    ON b.doc_id = cd.doc_id),
           |xm AS (
           |  SELECT c.query_id, c.doc_id, p.pos, p.tok
           |  FROM xcand c
           |  JOIN xpos p ON p.doc_id = c.doc_id
           |  JOIN qt q ON q.query_id = c.query_id AND q.tok = p.tok),
           |xd AS (
           |  SELECT a.query_id, a.doc_id,
           |    MIN(ABS(a.pos - b.pos)) AS min_pair_dist
           |  FROM xm a JOIN xm b ON a.query_id = b.query_id
           |    AND a.doc_id = b.doc_id AND a.tok != b.tok
           |  GROUP BY a.query_id, a.doc_id),
           |xf AS (
           |  SELECT c.query_id, c.doc_id, c.score_micro,
           |    CAST(COALESCE(d.min_pair_dist, 0) AS BIGINT)
           |      AS min_pair_dist,
           |    CAST(CASE WHEN d.min_pair_dist IS NULL THEN 0
           |         ELSE 1000000 // (d.min_pair_dist + 4) END
           |      AS BIGINT) AS prox_micro
           |  FROM xcand c LEFT JOIN xd d
           |    ON c.query_id = d.query_id AND c.doc_id = d.doc_id),
           |xr AS (
           |  SELECT xf.*,
           |    score_micro + prox_micro AS combined_micro,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY score_micro + prox_micro DESC, doc_id)
           |      AS rank
           |  FROM xf)
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
           |  min_pair_dist, prox_micro, score_micro, combined_micro
           |FROM xr""".stripMargin) +
      ("p133_snippets" ->
        s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
           |scand AS (SELECT query_id, doc_id FROM rk WHERE rank <= 3),
           |stoks AS (
           |  SELECT b.doc_id, b.toks FROM base b
           |  JOIN (SELECT DISTINCT doc_id FROM scand) cd
           |    ON b.doc_id = cd.doc_id),
           |spos AS (
           |  SELECT doc_id, i AS pos, toks[i] AS tok
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(1, len(toks))) AS i
           |        FROM stoks)),
           |sm AS (
           |  SELECT c.query_id, c.doc_id, p.pos
           |  FROM scand c
           |  JOIN spos p ON p.doc_id = c.doc_id
           |  JOIN qt q ON q.query_id = c.query_id AND q.tok = p.tok),
           |sw AS (
           |  SELECT query_id, doc_id, pos,
           |    COUNT(*) OVER (PARTITION BY query_id, doc_id
           |      ORDER BY pos
           |      RANGE BETWEEN CURRENT ROW AND 7 FOLLOWING)
           |      AS n_matched
           |  FROM sm),
           |sb AS (
           |  SELECT query_id, doc_id, pos AS start_pos, n_matched,
           |    ROW_NUMBER() OVER (PARTITION BY query_id, doc_id
           |      ORDER BY n_matched DESC, pos) AS rn
           |  FROM sw)
           |SELECT s.query_id, s.doc_id,
           |  CAST(s.start_pos AS BIGINT) AS start_pos,
           |  CAST(s.n_matched AS BIGINT) AS n_matched,
           |  array_to_string(t.toks[s.start_pos:s.start_pos + 7], ' ')
           |    AS snippet
           |FROM sb s JOIN stoks t ON s.doc_id = t.doc_id
           |WHERE s.rn = 1""".stripMargin) +
      ("p131_phrase_rerank" ->
        s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
           |cand AS (SELECT query_id, doc_id, score_micro FROM rk
           |         WHERE rank <= 10),
           |phq AS (SELECT doc_id AS query_id,
           |    ${oHash("array_to_string(toks[1:4], ' ')")}
           |      % 2147483647 AS ph
           |  FROM base WHERE doc_id % ${oQStride("base")} = 0),
           |gr AS (
           |  SELECT b.doc_id,
           |    unnest(list_transform(${oShingles(4)},
           |      s -> ${oHash("s")} % 2147483647)) AS g
           |  FROM base b
           |  JOIN (SELECT DISTINCT doc_id FROM cand) cd
           |    ON b.doc_id = cd.doc_id),
           |hits AS (
           |  SELECT DISTINCT c.query_id, c.doc_id
           |  FROM cand c
           |  JOIN phq ON c.query_id = phq.query_id
           |  JOIN gr ON gr.doc_id = c.doc_id AND gr.g = phq.ph),
           |fin AS (
           |  SELECT c.query_id, c.doc_id, c.score_micro,
           |    CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END
           |      AS phrase_hit
           |  FROM cand c LEFT JOIN hits h
           |    ON c.query_id = h.query_id AND c.doc_id = h.doc_id),
           |rr AS (
           |  SELECT fin.*, ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY phrase_hit DESC, score_micro DESC, doc_id)
           |    AS rank
           |  FROM fin)
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
           |  CAST(phrase_hit AS BIGINT) AS phrase_hit, score_micro
           |FROM rr""".stripMargin)

  /** Dirichlet query-likelihood replay (p129; reused by the p130
    * scorecard): the [[oBm25Ctes]] postings chain plus the three
    * floored score components of [[Retrieval.qlTopK]].
    */
  private def oQlTopK: String = {
    val muP = "(100.0 * (CAST(c.cf AS DOUBLE)" +
      " / CAST(st.sdl AS DOUBLE)))"
    s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
       |cfq AS (
       |  SELECT p.tok, SUM(p.tf) AS cf FROM post p
       |  WHERE p.tok IN (SELECT DISTINCT tok FROM qt)
       |  GROUP BY p.tok),
       |qs AS (
       |  SELECT q.query_id, COUNT(*) AS nq,
       |    CAST(SUM(CAST(FLOOR(ln($muP) * 1000000.0) AS BIGINT))
       |      AS BIGINT) AS aq
       |  FROM qt q JOIN cfq c ON q.tok = c.tok CROSS JOIN st
       |  GROUP BY q.query_id),
       |qsc AS (
       |  SELECT q.query_id, p.doc_id, COUNT(*) AS n_terms,
       |    CAST(SUM(CAST(FLOOR(ln((CAST(p.tf AS DOUBLE) + $muP)
       |      / $muP) * 1000000.0) AS BIGINT)) AS BIGINT) AS dsum
       |  FROM post p
       |  JOIN qt q ON p.tok = q.tok
       |  JOIN cfq c ON p.tok = c.tok
       |  CROSS JOIN st
       |  GROUP BY q.query_id, p.doc_id),
       |qfin AS (
       |  SELECT s.query_id, s.doc_id, s.n_terms,
       |    s.dsum + qs.aq - qs.nq * CAST(FLOOR(
       |      ln(CAST(d.dl AS DOUBLE) + 100.0) * 1000000.0)
       |      AS BIGINT) AS score_micro
       |  FROM qsc s
       |  JOIN dl d ON s.doc_id = d.doc_id
       |  JOIN qs ON s.query_id = qs.query_id),
       |qrk AS (
       |  SELECT query_id, doc_id, n_terms, score_micro,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS rank
       |  FROM qfin)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  CAST(n_terms AS BIGINT) AS n_terms, score_micro
       |FROM qrk WHERE rank <= 10""".stripMargin
  }

  /** Two-pass PRF replay (p120; reused by the p130 scorecard):
    * pass-1 top-3 feedback docs donate their 5 best non-query terms,
    * pass 2 rescores with the expanded term set.
    */
  private def oPrf: String = {
    val idf2 = "ln(1.0 + (CAST(st.nd AS DOUBLE) - CAST(f.df" +
      " AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))"
    val norm2 = "(CAST(p.tf AS DOUBLE) * 2.2 / (CAST(p.tf AS" +
      " DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)" +
      " / (CAST(st.sdl AS DOUBLE) / CAST(st.nd AS DOUBLE))))))"
    s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
       |fbdocs AS (SELECT query_id, doc_id FROM rk WHERE rank <= 3),
       |fbt AS (
       |  SELECT fd.query_id, p.tok, SUM(p.tf) AS fbscore
       |  FROM fbdocs fd JOIN post p ON fd.doc_id = p.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM qt
       |    WHERE qt.query_id = fd.query_id AND qt.tok = p.tok)
       |  GROUP BY fd.query_id, p.tok),
       |expn AS (
       |  SELECT query_id, tok FROM (
       |    SELECT query_id, tok, ROW_NUMBER() OVER (
       |      PARTITION BY query_id
       |      ORDER BY fbscore DESC, tok) AS r
       |    FROM fbt)
       |  WHERE r <= 5),
       |qt2 AS (SELECT query_id, tok FROM qt
       |        UNION SELECT query_id, tok FROM expn),
       |dfq2 AS (
       |  SELECT p.tok, COUNT(*) AS df FROM post p
       |  WHERE p.tok IN (SELECT DISTINCT tok FROM qt2)
       |  GROUP BY p.tok),
       |sc2 AS (
       |  SELECT q.query_id, p.doc_id, COUNT(*) AS n_terms,
       |    CAST(SUM(CAST(FLOOR($idf2 * $norm2 * 1000000.0)
       |      AS BIGINT)) AS BIGINT) AS score_micro
       |  FROM post p
       |  JOIN qt2 q ON p.tok = q.tok
       |  JOIN dfq2 f ON p.tok = f.tok
       |  JOIN dl d ON p.doc_id = d.doc_id
       |  CROSS JOIN st
       |  GROUP BY q.query_id, p.doc_id),
       |rkx AS (
       |  SELECT query_id, doc_id, n_terms, score_micro,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS rank
       |  FROM sc2)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  CAST(n_terms AS BIGINT) AS n_terms, score_micro
       |FROM rkx WHERE rank <= 10""".stripMargin
  }

  /** Sparse+dense RRF fusion replay (p119; reused by the p130
    * scorecard): BM25 top-10 and brute-force cosine top-10 fused by
    * exact-integer reciprocal ranks.
    */
  private def oRrf: String =
    s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
       |bm AS (SELECT query_id, doc_id, rank FROM rk
       |       WHERE rank <= 10),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe
       |       FROM embeddings WHERE vec_id % ${oQStride("embeddings")} = 0),
       |cscored AS (
       |  SELECT query_id, e.vec_id AS cand_id,
       |    ${oCos("qe", "e.embedding")} AS sim
       |  FROM embeddings e, qv WHERE e.vec_id != query_id),
       |dn AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT query_id, cand_id AS doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, cand_id ASC) AS rank
       |    FROM cscored)
       |  WHERE rank <= 10),
       |f AS (
       |  SELECT COALESCE(b.query_id, d.query_id) AS query_id,
       |    COALESCE(b.doc_id, d.doc_id) AS doc_id,
       |    COALESCE(b.rank, 0) AS rank_sparse,
       |    COALESCE(d.rank, 0) AS rank_dense,
       |    (CASE WHEN b.rank IS NULL THEN 0
       |          ELSE 1000000 // (60 + b.rank) END)
       |    + (CASE WHEN d.rank IS NULL THEN 0
       |            ELSE 1000000 // (60 + d.rank) END) AS rrf_micro
       |  FROM bm b FULL OUTER JOIN dn d
       |    ON b.query_id = d.query_id AND b.doc_id = d.doc_id),
       |rk2 AS (
       |  SELECT f.*, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_micro DESC, doc_id) AS rank
       |  FROM f)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  CAST(rank_sparse AS BIGINT) AS rank_sparse,
       |  CAST(rank_dense AS BIGINT) AS rank_dense,
       |  CAST(rrf_micro AS BIGINT) AS rrf_micro
       |FROM rk2 WHERE rank <= 10""".stripMargin

  /** Simple-BM25F replay (p132; reused by the p130 scorecard):
    * weighted-field postings and lengths (title = toks[1:8] at weight
    * 3, body = toks[9:] at weight 1), then the shared BM25 scoring
    * formula (k1 = 1.2, b = 0.75) over the combined exact-integer
    * tf/dl — mirroring [[Retrieval.bm25fIndex]].
    */
  private def oBm25f: String = {
    val avgdl = "(CAST(st.sdl AS DOUBLE) / CAST(st.nd AS DOUBLE))"
    val idf = "ln(1.0 + (CAST(st.nd AS DOUBLE) - CAST(f.df AS DOUBLE)" +
      " + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))"
    val norm = s"(CAST(p.tf AS DOUBLE) * 2.2" +
      s" / (CAST(p.tf AS DOUBLE) + 1.2 * (0.25" +
      s" + 0.75 * (CAST(d.dl AS DOUBLE) / $avgdl))))"
    s"""WITH fb AS (SELECT doc_id, $oToks AS toks FROM documents),
       |ff AS (SELECT doc_id, toks[1:8] AS tt, toks[9:] AS bt, toks
       |       FROM fb),
       |fdl AS (SELECT doc_id,
       |    CAST(3 * len(tt) + len(bt) AS BIGINT) AS dl FROM ff),
       |fst AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
       |    CAST(SUM(dl) AS BIGINT) AS sdl FROM fdl),
       |fpost AS (
       |  SELECT tok, doc_id, CAST(SUM(w) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(tt) AS tok, 3 AS w FROM ff
       |    UNION ALL
       |    SELECT doc_id, unnest(bt) AS tok, 1 AS w FROM ff)
       |  GROUP BY tok, doc_id),
       |fqt AS (
       |  SELECT doc_id AS query_id, toks[i] AS tok
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, least(len(toks), 4))) AS i
       |        FROM fb WHERE doc_id % ${oQStride("fb")} = 0)
       |  GROUP BY 1, 2),
       |fdf AS (
       |  SELECT p.tok, COUNT(*) AS df FROM fpost p
       |  WHERE p.tok IN (SELECT DISTINCT tok FROM fqt)
       |  GROUP BY p.tok),
       |fsc AS (
       |  SELECT q.query_id, p.doc_id, COUNT(*) AS n_terms,
       |    CAST(SUM(CAST(FLOOR($idf * $norm * 1000000.0) AS BIGINT))
       |      AS BIGINT) AS score_micro
       |  FROM fpost p
       |  JOIN fqt q ON p.tok = q.tok
       |  JOIN fdf f ON p.tok = f.tok
       |  JOIN fdl d ON p.doc_id = d.doc_id
       |  CROSS JOIN fst st
       |  GROUP BY q.query_id, p.doc_id),
       |frk AS (
       |  SELECT query_id, doc_id, n_terms, score_micro,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS rank
       |  FROM fsc)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  CAST(n_terms AS BIGINT) AS n_terms, score_micro
       |FROM frk WHERE rank <= 10""".stripMargin
  }

  /** Learning-to-rank replay (p173): the feature chain (BM25
    * candidates + proximity + phrase containment, lifted from the
    * p134/p131 oracles), twelve MATERIALIZED GD weight rounds
    * mirroring [[graft.pipeline.Ltr.ltrWeights]] floor for floor
    * (the exact `(x − ((x mod m)+m) mod m) // m` dance — DuckDB `//`
    * and Spark `div` only agree after the subtraction makes the
    * numerator exactly divisible), the trained re-rank, and both
    * scorecard rows.
    */
  private def oLtrRerank(iters: Int, lrNum: Long): String = {
    def fd(x: String, m: String) =
      s"(($x - ((($x) % ($m)) + ($m)) % ($m)) // ($m))"
    def zExpr(w: String) =
      s"${fd(s"$w.w1 * x1", "1000000")} + ${fd(s"$w.w2 * x2", "1000000")}" +
        s" + ${fd(s"$w.w3 * x3", "1000000")} + $w.b"
    val rounds = (1 to iters).map { t =>
      val pw = s"w${t - 1}"
      s"""g$t AS MATERIALIZED (
         |  SELECT CAST(SUM(${fd("r * x1", "1000000")}) AS BIGINT) AS g1,
         |    CAST(SUM(${fd("r * x2", "1000000")}) AS BIGINT) AS g2,
         |    CAST(SUM(${fd("r * x3", "1000000")}) AS BIGINT) AS g3,
         |    CAST(SUM(r) AS BIGINT) AS gb
         |  FROM (SELECT x1, x2, x3,
         |      CAST(FLOOR((1.0 / (1.0 + exp(-(CAST(${zExpr(pw)}
         |          AS DOUBLE) / 1000000.0))) - y) * 1e6) AS BIGINT)
         |        AS r
         |    FROM ft, $pw)),
         |w$t AS MATERIALIZED (
         |  SELECT CAST($pw.w1 - ${fd(s"g1 * $lrNum", "nn.n")} AS BIGINT)
         |      AS w1,
         |    CAST($pw.w2 - ${fd(s"g2 * $lrNum", "nn.n")} AS BIGINT) AS w2,
         |    CAST($pw.w3 - ${fd(s"g3 * $lrNum", "nn.n")} AS BIGINT) AS w3,
         |    CAST($pw.b - ${fd(s"gb * $lrNum", "nn.n")} AS BIGINT) AS b
         |  FROM $pw, g$t, nn)""".stripMargin
    }.mkString(",\n")
    s"""${oBm25Ctes(k1 = 1.2, b = 0.75, qTerms = 4)},
       |ltc AS (SELECT query_id, doc_id, rank, score_micro FROM rk
       |        WHERE rank <= 10),
       |ltp AS (
       |  SELECT b.doc_id, b.i AS pos, b.toks[b.i] AS tok
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks))) AS i
       |        FROM base) b
       |  JOIN (SELECT DISTINCT doc_id FROM ltc) cd
       |    ON b.doc_id = cd.doc_id),
       |ltm AS (
       |  SELECT c.query_id, c.doc_id, p.pos, p.tok
       |  FROM ltc c
       |  JOIN ltp p ON p.doc_id = c.doc_id
       |  JOIN qt q ON q.query_id = c.query_id AND q.tok = p.tok),
       |ltd AS (
       |  SELECT a.query_id, a.doc_id,
       |    MIN(ABS(a.pos - b.pos)) AS min_pair_dist
       |  FROM ltm a JOIN ltm b ON a.query_id = b.query_id
       |    AND a.doc_id = b.doc_id AND a.tok != b.tok
       |  GROUP BY a.query_id, a.doc_id),
       |ltq AS (SELECT doc_id AS query_id,
       |    ${oHash("array_to_string(toks[1:4], ' ')")}
       |      % 2147483647 AS ph
       |  FROM base WHERE doc_id % ${oQStride("base")} = 0),
       |ltg AS (
       |  SELECT b.doc_id,
       |    unnest(list_transform(${oShingles(4)},
       |      s -> ${oHash("s")} % 2147483647)) AS g
       |  FROM base b
       |  JOIN (SELECT DISTINCT doc_id FROM ltc) cd
       |    ON b.doc_id = cd.doc_id),
       |lth AS (
       |  SELECT DISTINCT c.query_id, c.doc_id
       |  FROM ltc c
       |  JOIN ltq ON c.query_id = ltq.query_id
       |  JOIN ltg ON ltg.doc_id = c.doc_id AND ltg.g = ltq.ph),
       |ft AS MATERIALIZED (
       |  SELECT c.query_id, c.doc_id, c.rank,
       |    CAST(c.score_micro // 10 AS BIGINT) AS x1,
       |    CAST(CASE WHEN d.min_pair_dist IS NULL THEN 0
       |         ELSE 1000000 // (d.min_pair_dist + 4) END
       |      AS BIGINT) AS x2,
       |    CAST(CASE WHEN h.doc_id IS NOT NULL THEN 1000000 ELSE 0 END
       |      AS BIGINT) AS x3,
       |    CAST(CASE WHEN c.query_id = c.doc_id THEN 1 ELSE 0 END
       |      AS BIGINT) AS y
       |  FROM ltc c
       |  LEFT JOIN ltd d ON c.query_id = d.query_id
       |    AND c.doc_id = d.doc_id
       |  LEFT JOIN lth h ON c.query_id = h.query_id
       |    AND c.doc_id = h.doc_id),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ft),
       |w0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
       |       CAST(0 AS BIGINT) AS w3, CAST(0 AS BIGINT) AS b),
       |$rounds,
       |ltrr AS (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ${zExpr(s"w$iters")} DESC, doc_id) AS rank
       |  FROM ft, w$iters)
       |${oScorecardRow("ltc", "bm25")}
       |UNION ALL
       |${oScorecardRow("ltrr", "ltr_trained")}""".stripMargin
  }

  /** The shared nDCG discount CASE over an in-scope `rank` — the
    * [[Retrieval.dcgMicroTable]] literals, identical to the ones the
    * Spark plans fold in.
    */
  private def oDcgCase: String = graft.pipeline.Retrieval
    .dcgMicroTable(10)
    .map { case (r, v) => s"WHEN $r THEN $v" }.mkString(" ")

  /** Per-query nDCG metric CTE `m$sfx(query_id, m)` over a ranked
    * relation (p136) — planted relevance, 0 for misses.
    */
  private def oSigMetric(rel: String, sfx: String): String =
    s"""m$sfx AS (
       |  SELECT q.query_id, CAST(COALESCE(h.m0, 0) AS BIGINT) AS m
       |  FROM qids q LEFT JOIN (
       |    SELECT query_id, CASE rank $oDcgCase ELSE 0 END AS m0
       |    FROM $rel WHERE doc_id = query_id) h
       |    ON q.query_id = h.query_id)""".stripMargin

  /** One sign-flip test block (p136): diffs of `mxf` (the bm25f base)
    * vs `m$sfx`, 200 hash-drawn permutations, two-sided p — ending at
    * `s$sfx(method, t_obs_micro, n_perms, n_ge, p_micro)`.
    */
  private def oSigBlock(label: String, sfx: String): String = {
    val coin = oHash(
      "'sig' || CAST(perm AS VARCHAR) || '_' || CAST(query_id AS VARCHAR)")
    s"""d$sfx AS (SELECT a.query_id, a.m - b.m AS d
       |  FROM mxf a JOIN m$sfx b ON a.query_id = b.query_id),
       |p$sfx AS (
       |  SELECT perm, CAST(SUM(CASE WHEN $coin % 2 = 0
       |      THEN -d ELSE d END) AS BIGINT) AS t
       |  FROM d$sfx, (SELECT unnest(generate_series(1, 200)) AS perm)
       |  GROUP BY perm),
       |o$sfx AS (SELECT CAST(SUM(d) AS BIGINT) AS t_obs FROM d$sfx),
       |s$sfx AS (
       |  SELECT '$label' AS method, o.t_obs AS t_obs_micro,
       |    CAST(COUNT(*) AS BIGINT) AS n_perms,
       |    CAST(SUM(CASE WHEN ABS(t) >= ABS(o.t_obs)
       |        THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       |    CAST((SUM(CASE WHEN ABS(t) >= ABS(o.t_obs)
       |        THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
       |      AS p_micro
       |  FROM p$sfx, o$sfx o GROUP BY o.t_obs)""".stripMargin
  }

  /** One p130 scorecard row over a ranked relation `rel(query_id,
    * rank, doc_id, ...)`: planted relevance (doc_id = query_id),
    * exact-integer MRR and nDCG@10 — the discount literals come from
    * [[Retrieval.dcgMicroTable]], the SAME driver-computed constants
    * the Spark plan folds in, so no cross-engine libm floor risk.
    */
  private def oScorecardRow(rel: String, method: String): String = {
    val dcgCase = oDcgCase
    s"""SELECT '$method' AS method,
       |  CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
       |  CAST(SUM(CASE WHEN doc_id = query_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hits,
       |  CAST(CAST(SUM(CASE WHEN doc_id = query_id
       |      THEN 1000000 // rank ELSE 0 END) AS BIGINT)
       |    // COUNT(DISTINCT query_id) AS BIGINT) AS mrr_micro,
       |  CAST(CAST(SUM(CASE WHEN doc_id = query_id
       |      THEN CASE rank $dcgCase ELSE 0 END ELSE 0 END)
       |      AS BIGINT)
       |    // COUNT(DISTINCT query_id) AS BIGINT) AS ndcg_micro
       |FROM $rel""".stripMargin
  }

  private lazy val oracle0: Map[String, String] = Map(
    "p01_exact_dedup" ->
      s"""SELECT substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp,
         |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin,
    "p91_norm_dedup" ->
      s"""WITH n AS (
         |  SELECT doc_id,
         |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS raw_fp,
         |    substr(md5(array_to_string(string_split_regex(trim(
         |      regexp_replace(regexp_replace(lower(text), '[0-9]', '0', 'g'),
         |        '[^a-z0-9\\s]', ' ', 'g')), '\\s+'), ' ')), 1, 16) AS fp
         |  FROM documents)
         |SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
         |  COUNT(DISTINCT raw_fp) AS n_raw_distinct
         |FROM n GROUP BY fp""".stripMargin,
    "p02_minhash_lsh" -> oJaccardPairs(k = 3, threshold = 0.5),
    "p179_lsh_bucket_audit" ->
      s"""${oMinhashSigCtes()},
         |bk AS (
         |  SELECT b.band, sg.sig[b.band * 2 + 1 : b.band * 2 + 2] AS key
         |  FROM sg, (SELECT unnest(generate_series(0, 5)) AS band) b),
         |bc AS (SELECT band, key, COUNT(*) AS n FROM bk GROUP BY band, key)
         |SELECT CAST(band AS BIGINT) AS band,
         |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(MAX(n) AS BIGINT) AS max_bucket,
         |  CAST(SUM(CASE WHEN n > 1024 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oversized,
         |  CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS pairs_exact,
         |  CAST(SUM(CASE WHEN n > 1024 THEN n - 1 ELSE n * (n - 1) // 2 END)
         |    AS BIGINT) AS pairs_capped
         |FROM bc GROUP BY band""".stripMargin,
    "p03_simhash" ->
      s"""WITH sims AS (
         |  SELECT doc_id, $oSimhash AS sim
         |  FROM (SELECT doc_id,
         |          list_transform($oToks, t -> ${oHash("t")}) AS hl
         |        FROM documents))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
         |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 2""".stripMargin,
    "p04_ngram_jaccard" -> oJaccardPairs(k = 4, threshold = 0.4),
    "p05_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 20),
         |scored AS (
         |  SELECT query_id, e.vec_id AS cand_id,
         |    ${oCos("qv", "e.embedding")} AS sim
         |  FROM embeddings e, q WHERE e.vec_id != query_id),
         |ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
         |FROM ranked WHERE rank <= 5""".stripMargin,
    "p06_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${oBucket("embedding")} AS bucket
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${oCos("q.embedding", "c.embedding")} AS sim
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
         |  WHERE q.vec_id < 20),
         |ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
         |FROM ranked WHERE rank <= 3""".stripMargin,
    "p93_lsh_multiprobe" -> {
      val ds = (0 until 4)
        .map(p => s"${oPlaneDot("embedding", p)} AS d$p")
        .mkString(",\n    ")
      val bucket = (0 until 4)
        .map(p => s"(CASE WHEN d$p > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      val margins = (0 until 4)
        .map(p => s"{'m': abs(d$p), 'p': $p}").mkString(", ")
      s"""WITH d AS (
         |  SELECT vec_id, embedding,
         |    $ds
         |  FROM embeddings),
         |b AS (
         |  SELECT vec_id, embedding, $bucket AS bucket,
         |    [$margins] AS margins
         |  FROM d),
         |qp AS (
         |  SELECT vec_id, embedding,
         |    unnest(list_concat([bucket],
         |      list_transform(list_sort(margins)[1:2],
         |        s -> xor(bucket, ([1, 2, 4, 8])[s.p + 1])))) AS bucket
         |  FROM b WHERE vec_id < 20),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${oCos("q.embedding", "c.embedding")} AS sim
         |  FROM qp q JOIN b c ON q.bucket = c.bucket
         |   AND q.vec_id != c.vec_id),
         |ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
         |FROM ranked WHERE rank <= 3""".stripMargin
    },
    "p07_embed_near_dup" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  CAST(FLOOR(${oCos("a.embedding", "b.embedding")} * 1e6) AS BIGINT) AS sim_micro
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${oCos("a.embedding", "b.embedding")} >= 0.4""".stripMargin,
    "p08_lang_id" -> {
      val hitCols = TF.stopwords
        .map { case (lang, ws) =>
          s"CAST(${oHits(lang, ws)} AS BIGINT) AS hits_$lang"
        }
        .mkString(",\n  ")
      s"""SELECT doc_id, $oLangCase AS lang_pred,
         |  hits_${TF.stopwords.map(_._1).mkString(", hits_")}
         |FROM (SELECT doc_id, $hitCols
         |      FROM (SELECT doc_id, $oToks AS toks FROM documents))""".stripMargin
    },
    "p09_quality" -> {
      val enSet = TF.stopwords.head._2.map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, text, $oToks AS toks FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_toks,
         |    list_sum(list_transform(toks, t -> length(t)))
         |      / CAST(len(toks) AS DOUBLE) AS mean_len,
         |    (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
         |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
         |    len(list_filter(toks, t -> lower(t) IN ($enSet)))
         |      / CAST(len(toks) AS DOUBLE) AS stop_ratio
         |  FROM base)
         |SELECT doc_id, n_toks, mean_len, punct_ratio, stop_ratio,
         |  least(n_toks / 100.0, 1.0) * 0.4
         |  + least(mean_len / 10.0, 1.0) * 0.2
         |  + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2
         |  + least(stop_ratio * 5.0, 1.0) * 0.2 AS score
         |FROM m""".stripMargin
    },
    "p10_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len($oToks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars
         |FROM documents""".stripMargin,
    "p11_fingerprint" ->
      s"""WITH s AS (
         |  SELECT doc_id, ${oShingles(3)} AS sh
         |  FROM (SELECT doc_id, $oToks AS toks FROM documents)),
         |f AS (
         |  SELECT doc_id,
         |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp
         |  FROM documents)
         |SELECT f.doc_id, f.fp,
         |  COALESCE(list_aggregate(list_transform(s.sh,
         |    x -> ${oHash("x")} % ${TF.P}), 'min'), ${TF.P}) AS min_shingle_hash
         |FROM f JOIN s ON f.doc_id = s.doc_id""".stripMargin,
    "p12_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'text/plain' END AS mime,
        |  CASE WHEN doc_id % 2 = 1
        |    THEN CAST(octet_length(encode(text)) AS BIGINT) END AS n_bytes,
        |  CASE WHEN doc_id % 2 = 1 THEN md5(text) END AS checksum,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 16
        |       ELSE 64 + (ascii(substr(text, 1, 1)) % 192) END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + length(text) % 16
        |       ELSE 64 + (ascii(substr(text, 2, 1)) % 192) END AS BIGINT) AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN
        |    CAST(FLOOR((doc_id % 256) / 255.0 * 1000000) AS BIGINT) END AS luma_micro
        |FROM documents""".stripMargin,
    "p60_wav_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(100 + length(text) % 400 AS BIGINT) AS n_frames,
        |  CAST((doc_id % 1000) * 30 AS BIGINT) AS peak
        |FROM documents""".stripMargin,
    "p61_gopher_rules" -> oGopherRules(),
    "p64_c4_lines" -> oC4Lines(),
    "p62_bpe_pairs" ->
      s"""WITH toks AS (
         |  SELECT regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS tk
         |  FROM documents),
         |pairs AS (
         |  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
         |    i -> tk[i] || ' ' || tk[i + 1])) AS pair
         |  FROM toks)
         |SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM pairs GROUP BY pair
         |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "p63_audio_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(100 + length(text) % 400 AS BIGINT) AS n_frames,
        |  CAST(1 + (doc_id % 1000) * 30 AS BIGINT) AS peak,
        |  CAST((100 + length(text) % 400)
        |    * (1 + (doc_id % 1000) * 30) * (1 + (doc_id % 1000) * 30) AS BIGINT) AS energy,
        |  CAST((100 + length(text) % 400 - 1) // (1 + doc_id % 7) AS BIGINT) AS n_crossings
        |FROM documents""".stripMargin,
    "p57_png_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(1 + doc_id % 16 AS BIGINT) AS width,
        |  CAST(1 + length(text) % 16 AS BIGINT) AS height,
        |  CAST((doc_id % 256) * 65793 AS BIGINT) AS px00
        |FROM documents""".stripMargin,
    "p103_funnel_timing" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM ev e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE event_type = 'view' AND ts_us > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM ev e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE event_type = 'click' AND ts_us > t2 GROUP BY 1),
        |t4 AS (SELECT e.user_id, MIN(ts_us) AS t4 FROM ev e
        |       JOIN t3 ON e.user_id = t3.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t3 GROUP BY 1),
        |dd AS (
        |  SELECT 2 AS stage, 'view' AS event_type, t2.t2 - t1.t1 AS delta_us
        |  FROM t2 JOIN t1 ON t2.user_id = t1.user_id
        |  UNION ALL
        |  SELECT 3, 'click', t3.t3 - t2.t2
        |  FROM t3 JOIN t2 ON t3.user_id = t2.user_id
        |  UNION ALL
        |  SELECT 4, 'purchase', t4.t4 - t3.t3
        |  FROM t4 JOIN t3 ON t4.user_id = t3.user_id),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY stage
        |      ORDER BY delta_us) AS rn,
        |    COUNT(*) OVER (PARTITION BY stage) AS cnt
        |  FROM dd)
        |SELECT CAST(stage AS BIGINT) AS stage, event_type, q, delta_us
        |FROM r CROSS JOIN
        |  (SELECT CAST(UNNEST([25, 50, 75]) AS BIGINT) AS q) s
        |WHERE rn = CAST(FLOOR((cnt * q + 99) / 100.0) AS BIGINT)""".stripMargin,
    "p102_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |cohort AS (SELECT user_id, MIN(week) AS cohort_week
        |           FROM uw GROUP BY 1),
        |sizes AS (SELECT cohort_week, COUNT(*) AS n_cohort
        |          FROM cohort GROUP BY 1),
        |act AS (
        |  SELECT c.cohort_week, uw.week - c.cohort_week AS k,
        |    COUNT(*) AS n_active
        |  FROM uw JOIN cohort c ON uw.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT a.cohort_week, a.k, a.n_active, s.n_cohort,
        |  (a.n_active * 1000000) // s.n_cohort AS retention_micro
        |FROM act a JOIN sizes s ON a.cohort_week = s.cohort_week""".stripMargin,
    "p101_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM ev e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE event_type = 'view' AND ts_us > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM ev e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE event_type = 'click' AND ts_us > t2 GROUP BY 1),
        |t4 AS (SELECT e.user_id, MIN(ts_us) AS t4 FROM ev e
        |       JOIN t3 ON e.user_id = t3.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t3 GROUP BY 1),
        |c AS (SELECT (SELECT COUNT(*) FROM t1) AS n1,
        |             (SELECT COUNT(*) FROM t2) AS n2,
        |             (SELECT COUNT(*) FROM t3) AS n3,
        |             (SELECT COUNT(*) FROM t4) AS n4)
        |SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS event_type,
        |  n1 AS n_users,
        |  (n1 * 1000000) // n1 AS pct_of_start_micro,
        |  (n1 * 1000000) // n1 AS pct_of_prev_micro FROM c
        |UNION ALL SELECT 2, 'view', n2, (n2 * 1000000) // n1,
        |  (n2 * 1000000) // n1 FROM c
        |UNION ALL SELECT 3, 'click', n3, (n3 * 1000000) // n1,
        |  (n3 * 1000000) // n2 FROM c
        |UNION ALL SELECT 4, 'purchase', n4, (n4 * 1000000) // n1,
        |  (n4 * 1000000) // n3 FROM c""".stripMargin,
    "p13_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (
        |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |                             ORDER BY ts_us, event_id) AS prev
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
        |                     THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM l)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  MIN(ts_us) AS session_start, MAX(ts_us) AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "p14_window_agg" ->
      """SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS ws_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "p15_json_props" ->
      """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10 AS k_mod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    "p16_hash_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${oHash("'split' || CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
         |       WHEN ${oHash("'split' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,
    "p17_tfidf" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest($oToks) AS term FROM documents),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
         |dfreq AS (
         |  SELECT term, COUNT(*) AS df
         |  FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tf.term,
         |    CAST(FLOOR(CAST(tf AS DOUBLE)
         |      * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e6) AS BIGINT)
         |      AS score_micro
         |  FROM tf JOIN dfreq ON tf.term = dfreq.term, n),
         |ranked AS (
         |  SELECT doc_id, term, score_micro,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |                       ORDER BY score_micro DESC, term ASC) AS rank
         |  FROM scored)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score_micro
         |FROM ranked WHERE rank <= 3""".stripMargin,
    "p18_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    127.0 / list_aggregate(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE))), 'max') AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |    list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale) AS BIGINT)) AS qv
        |  FROM s)
        |SELECT vec_id,
        |  CAST(FLOOR(scale * 1e6) AS BIGINT) AS scale_micro,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
        |  CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max
        |FROM q""".stripMargin,
    "p19_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents),
         |cells AS (
         |  SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${oCos("q.embedding", "c.embedding")} AS sim
         |  FROM cells q JOIN cells c
         |    ON q.cent_id = c.cent_id AND q.vec_id != c.vec_id
         |  WHERE q.vec_id < 20),
         |ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
         |FROM ranked WHERE rank <= 3""".stripMargin,
    "p20_repetition" ->
      s"""WITH words AS (
         |  SELECT doc_id, UNNEST($oToks) AS w FROM documents),
         |wc AS (
         |  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
         |topf AS (
         |  SELECT doc_id,
         |    CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_word_frac
         |  FROM wc GROUP BY 1),
         |tri AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         |    CASE WHEN len(toks) >= 3 THEN
         |      1.0 - CAST(len(${oShingles(3)}) AS DOUBLE) / (len(toks) - 2)
         |    ELSE 0.0 END AS dup_3gram_frac
         |  FROM (SELECT doc_id, $oToks AS toks FROM documents))
         |SELECT t.doc_id, t.n_words, t.dup_3gram_frac, f.top_word_frac
         |FROM tri t JOIN topf f USING (doc_id)""".stripMargin,
    "p21_kmeans" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents),
         |cells AS (
         |  SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
         |expl AS (
         |  SELECT cent_id, i - 1 AS dim,
         |    FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6) AS fx
         |  FROM cells
         |  CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) s)
         |SELECT cent_id, CAST(dim AS BIGINT) AS dim,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(FLOOR(SUM(fx) / COUNT(*)) AS BIGINT) AS mean_fixed
         |FROM expl GROUP BY 1, 2""".stripMargin,
    "p22_kmeans_train" -> oKmeansTrain(kmeansIters),
    "p52_ivf_trained" -> oIvfTrained(iters = 2, nprobe = 2, k = 3),
    "p23_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |    ${oHash("'sample' || CAST(doc_id AS VARCHAR)")} AS hh
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id)
         |      AS rank
         |  FROM h)
         |SELECT doc_id, source, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 10""".stripMargin,
    "p24_token_budget" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, len($oToks) AS n_toks,
         |    ${oHash("'mix' || CAST(doc_id AS VARCHAR)")} AS hh
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_toks,
         |    SUM(n_toks) OVER (PARTITION BY source ORDER BY hh, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h)
         |SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(cum AS BIGINT) AS cum_toks
         |FROM c WHERE cum <= 700""".stripMargin,
    "p45_source_overlap" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS toks FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(generate_series(1, len(toks) - 2),
         |      i -> ${oHash("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")})
         |    END AS h
         |  FROM toks),
         |fps AS (
         |  SELECT doc_id,
         |    CASE WHEN len(h) < 4 THEN list_distinct(h)
         |    ELSE list_distinct(list_transform(generate_series(1, len(h) - 3),
         |      j -> list_min(h[j:j+3])))
         |    END AS fps
         |  FROM h),
         |e AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |sym AS (
         |  SELECT doc_a AS d, doc_b AS o FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |src AS (SELECT doc_id, source FROM documents)
         |SELECT sa.source AS src_a, sb.source AS src_b,
         |  CAST(COUNT(DISTINCT sym.d) AS BIGINT) AS n_mirrored
         |FROM sym
         |JOIN src sa ON sym.d = sa.doc_id
         |JOIN src sb ON sym.o = sb.doc_id
         |WHERE sa.source != sb.source
         |GROUP BY 1, 2""".stripMargin,
    "p44_mix_weights" ->
      s"""WITH ps AS (
         |  SELECT source, CAST(SUM(len($oToks)) AS BIGINT) AS toks
         |  FROM documents GROUP BY source),
         |t AS (
         |  SELECT CAST(SUM(toks) AS BIGINT) AS total,
         |         CAST(COUNT(*) AS BIGINT) AS n_sources
         |  FROM ps)
         |SELECT source, toks,
         |  CAST(FLOOR(total * 1000000.0 / (n_sources * toks)) AS BIGINT)
         |    AS weight_micro
         |FROM ps, t""".stripMargin,
    "p43_length_quantiles" ->
      s"""WITH d AS (
         |  SELECT source, CAST(len($oToks) AS BIGINT) AS n FROM documents),
         |r AS (
         |  SELECT source, n,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS cnt
         |  FROM d)
         |SELECT source, q, n AS value
         |FROM r CROSS JOIN
         |  (SELECT CAST(UNNEST([25, 50, 75]) AS BIGINT) AS q) s
         |WHERE rn = CAST(FLOOR((cnt * q + 99) / 100.0) AS BIGINT)""".stripMargin,
    "p41_vocab" ->
      s"""WITH c AS (SELECT unnest($oToks) AS tok FROM documents),
         |n AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY tok),
         |r AS (SELECT tok, n,
         |  ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS rank FROM n)
         |SELECT tok, n, CAST(rank AS BIGINT) AS rank FROM r
         |WHERE rank <= 50""".stripMargin,
    "p42_oov_rate" ->
      s"""WITH c AS (SELECT doc_id, unnest($oToks) AS tok FROM documents),
         |n AS (SELECT tok, COUNT(*) AS n FROM c GROUP BY tok),
         |v AS (SELECT tok FROM n ORDER BY n DESC, tok ASC LIMIT 10)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(FLOOR(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    * 1000000.0 / COUNT(*)) AS BIGINT) AS oov_micro
         |FROM c LEFT JOIN v ON c.tok = v.tok GROUP BY doc_id""".stripMargin,
    "p40_semantic_dedup" ->
      s"""WITH RECURSIVE cents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents),
         |cells AS (
         |  SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS ua, b.vec_id AS vb
         |  FROM cells a JOIN cells b
         |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
         |  WHERE ${oCos("a.embedding", "b.embedding")} >= 0.4),
         |edges AS (
         |  SELECT ua AS u, vb AS v FROM pairs
         |  UNION SELECT vb, ua FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
         |comp AS (SELECT u, MIN(v) AS cmp FROM reach GROUP BY u)
         |SELECT a.vec_id, a.cent_id AS cell,
         |  COALESCE(c.cmp, a.vec_id) AS cluster_id,
         |  CAST(COALESCE(c.cmp, a.vec_id) = a.vec_id AS INT) AS keep
         |FROM cells a LEFT JOIN comp c ON a.vec_id = c.u""".stripMargin,
    "p37_dup_clusters" ->
      s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         |SELECT u AS doc_id, MIN(v) AS cluster_id,
         |  CAST(u = MIN(v) AS INT) AS keep
         |FROM reach GROUP BY u""".stripMargin,
    "p107_dedup_impact" ->
      s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |dec AS (
         |  SELECT u AS doc_id, MIN(v) AS component,
         |    CASE WHEN u = MIN(v) THEN 1 ELSE 0 END AS keep
         |  FROM reach GROUP BY u),
         |tk AS (SELECT doc_id, CAST(len($oToks) AS BIGINT) AS n_toks
         |       FROM documents),
         |per AS (
         |  SELECT d.component, COUNT(*) AS cluster_size,
         |    SUM(CASE WHEN d.keep = 0 THEN tk.n_toks ELSE 0 END)
         |      AS toks_removed
         |  FROM dec d JOIN tk ON d.doc_id = tk.doc_id
         |  GROUP BY d.component)
         |SELECT CASE WHEN cluster_size = 2 THEN '2'
         |            WHEN cluster_size <= 4 THEN '3-4'
         |            WHEN cluster_size <= 8 THEN '5-8'
         |            ELSE '9+' END AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
         |  CAST(SUM(cluster_size - 1) AS BIGINT) AS n_docs_removed,
         |  CAST(SUM(toks_removed) AS BIGINT) AS toks_removed
         |FROM per GROUP BY 1""".stripMargin,
    "p46_merge_clusters" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, $oToks AS toks FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(generate_series(1, len(toks) - 2),
         |      i -> ${oHash("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")})
         |    END AS h
         |  FROM toks),
         |fps AS (
         |  SELECT doc_id,
         |    CASE WHEN len(h) < 4 THEN list_distinct(h)
         |    ELSE list_distinct(list_transform(generate_series(1, len(h) - 3),
         |      j -> list_min(h[j:j+3])))
         |    END AS fps
         |  FROM h),
         |e AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u)
         |SELECT u AS doc_id, MIN(v) AS cluster_id
         |FROM reach GROUP BY u""".stripMargin,
    "p47_bloom_ingest" ->
      s"""WITH corpus AS (
         |  SELECT substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp
         |  FROM documents),
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id, text, source, n_chars
         |  FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text || ' zzfresh', source, n_chars
         |  FROM documents WHERE doc_id % 7 = 0),
         |bfp AS (
         |  SELECT doc_id, source, n_chars,
         |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp
         |  FROM batch)
         |SELECT doc_id, source, n_chars FROM bfp b
         |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)"""
        .stripMargin,
    "p48_pq_codes" -> {
      def oDotSub(a: String, b: String): String =
        s"""list_sum(list_transform(generate_series(1, 16),
           |      i -> CAST($a[subs.s*16 + i] AS DOUBLE)
           |           * CAST($b[subs.s*16 + i] AS DOUBLE)))""".stripMargin
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id < 8),
         |subs AS (SELECT unnest(generate_series(0, 3)) AS s),
         |scored AS (
         |  SELECT e.vec_id, subs.s, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, subs.s ORDER BY
         |      (${oDotSub("e.embedding", "e.embedding")}
         |       - 2 * ${oDotSub("e.embedding", "c.ce")}
         |       + ${oDotSub("c.ce", "c.ce")}) ASC,
         |      c.cent_id ASC) AS rn
         |  FROM embeddings e, cents c, subs)
         |SELECT vec_id, CAST(s AS BIGINT) AS subspace, cent_id AS code
         |FROM scored WHERE rn = 1""".stripMargin
    },
    "p55_pq_trained" -> oPqTrained(iters = 2),
    "p58_pq_trained_topk" -> oPqTrainedTopK(iters = 2, k = 5),
    "p49_pq_topk" -> oPqTopKSql("", "embeddings"),
    "p97_rot_pq" -> oPqTopKSql(
      s"""rotemb AS (
         |  SELECT vec_id, ${oRotate("embedding", "q97")} AS embedding
         |  FROM embeddings),
         |""".stripMargin, "rotemb"),
    "p111_novelty" ->
      s"""WITH t AS (SELECT doc_id, $oToks AS tk FROM documents),
         |g0 AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) < 8 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(generate_series(1, len(tk) - 7),
         |      i -> ${oHash("array_to_string(tk[i:i+7], ' ')")})
         |    END AS gs
         |  FROM t),
         |ing AS (SELECT doc_id, unnest(gs) AS gh FROM g0
         |        WHERE doc_id % 10 = 7),
         |ref AS (SELECT DISTINCT unnest(gs) AS gh FROM g0
         |        WHERE doc_id % 10 != 7),
         |per AS (
         |  SELECT i.doc_id, COUNT(*) AS n_windows,
         |    SUM(CASE WHEN r.gh IS NOT NULL THEN 1 ELSE 0 END) AS n_seen
         |  FROM ing i LEFT JOIN ref r ON i.gh = r.gh
         |  GROUP BY i.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(per.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(COALESCE(per.n_seen, 0) AS BIGINT) AS n_seen,
         |  CAST(COALESCE(((per.n_windows - per.n_seen) * 1000000)
         |    // per.n_windows, 1000000) AS BIGINT) AS novelty_micro
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
         |LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,
    "p105_memorization_risk" ->
      s"""WITH t AS (SELECT doc_id, $oToks AS tk FROM documents),
         |g0 AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) < 8 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(generate_series(1, len(tk) - 7),
         |      i -> ${oHash("array_to_string(tk[i:i+7], ' ')")})
         |    END AS gs
         |  FROM t),
         |g AS (SELECT doc_id, unnest(gs) AS gh FROM g0),
         |occ AS (SELECT gh, COUNT(*) AS occ FROM g GROUP BY gh),
         |per AS (
         |  SELECT g.doc_id, COUNT(*) AS n_windows,
         |    SUM(CASE WHEN occ.occ >= 2 THEN 1 ELSE 0 END) AS n_dup
         |  FROM g JOIN occ ON g.gh = occ.gh GROUP BY g.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(per.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(COALESCE((per.n_dup * 1000000) // per.n_windows, 0)
         |    AS BIGINT) AS dup_frac_micro
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,
    "p104_bbit_minhash" ->
      s"""${oMinhashSigCtes()},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |  WHERE ${oBandEq()}),
         |m AS (
         |  SELECT c.doc_a, c.doc_b, a.sh AS sh_a, b.sh AS sh_b,
         |    CAST(list_sum(list_transform(generate_series(1, 12),
         |      i -> CASE WHEN a.sig[i] % 4 = b.sig[i] % 4
         |           THEN 1 ELSE 0 END)) AS BIGINT) AS n_match
         |  FROM cand c
         |  JOIN sg a ON a.doc_id = c.doc_a
         |  JOIN sg b ON b.doc_id = c.doc_b),
         |j AS (
         |  SELECT *, len(list_intersect(sh_a, sh_b))
         |    / CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE)
         |    AS jac FROM m)
         |SELECT doc_a, doc_b, n_match,
         |  (GREATEST(n_match * 4 - 12, 0) * 1000000) // 36 AS est_micro,
         |  CAST(FLOOR(jac * 1e6) AS BIGINT) AS exact_micro,
         |  ABS((GREATEST(n_match * 4 - 12, 0) * 1000000) // 36
         |    - CAST(FLOOR(jac * 1e6) AS BIGINT)) AS abs_err_micro
         |FROM j WHERE jac >= 0.5""".stripMargin,
    "p109_zipf_fit" ->
      s"""WITH c AS (
         |  SELECT tok, COUNT(*) AS n
         |  FROM (SELECT unnest($oToks) AS tok FROM documents)
         |  GROUP BY tok),
         |r AS (
         |  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank
         |  FROM c),
         |p AS (
         |  SELECT CAST(FLOOR(ln(CAST(rank AS DOUBLE)) * 1e3) AS BIGINT)
         |      AS x,
         |    CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1e3) AS BIGINT) AS y
         |  FROM r WHERE rank <= 500),
         |s AS (
         |  SELECT COUNT(*) AS np, SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
         |  FROM p)
         |SELECT CAST(np AS BIGINT) AS n_points,
         |  CAST(FLOOR(CAST(np * sxy - sx * sy AS DOUBLE)
         |    / CAST(np * sxx - sx * sx AS DOUBLE) * 1e6) AS BIGINT)
         |    AS slope_micro,
         |  CAST(FLOOR((CAST(sy AS DOUBLE) / 1000.0 / np
         |    - CAST(np * sxy - sx * sy AS DOUBLE)
         |      / CAST(np * sxx - sx * sx AS DOUBLE)
         |      * (CAST(sx AS DOUBLE) / 1000.0 / np)) * 1e6) AS BIGINT)
         |    AS intercept_micro,
         |  CAST(FLOOR(CAST(np * sxy - sx * sy AS DOUBLE)
         |    * CAST(np * sxy - sx * sy AS DOUBLE)
         |    / (CAST(np * sxx - sx * sx AS DOUBLE)
         |       * CAST(np * syy - sy * sy AS DOUBLE)) * 1e6) AS BIGINT)
         |    AS r2_micro
         |FROM s""".stripMargin,
    "p108_lsh_recall_sweep" ->
      s"""${oMinhashSigCtes(sampleBudget = Some(256))},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |  WHERE ${oBandEq()}),
         |hd AS (SELECT doc_id, list_distinct(bh) AS hs FROM hh),
         |truth AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(FLOOR(len(list_intersect(a.hs, b.hs))
         |      / CAST(len(list_distinct(list_concat(a.hs, b.hs)))
         |             AS DOUBLE) * 1e6) AS BIGINT) AS jm
         |  FROM hd a JOIN hd b ON a.doc_id < b.doc_id
         |  WHERE len(list_distinct(list_concat(a.hs, b.hs))) > 0),
         |th AS (SELECT CAST(UNNEST([30, 40, 50, 60, 70]) AS BIGINT) AS t)
         |SELECT t AS threshold_pct,
         |  CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_caught,
         |  CAST((SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000) // COUNT(*) AS BIGINT) AS recall_micro,
         |  CAST(FLOOR((1.0 - pow(1.0
         |    - pow(CAST(t AS DOUBLE) / 100.0, 2.0), 6.0)) * 1000000.0)
         |    AS BIGINT) AS theory_floor_micro
         |FROM truth tr
         |CROSS JOIN th
         |LEFT JOIN cand c ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b
         |WHERE tr.jm >= t * 10000
         |GROUP BY t""".stripMargin,
    "p100_hashed_neardup" ->
      s"""${oHashedVecCtes()}
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(FLOOR(${oCosN("a.embedding", "b.embedding", 128)} * 1e6)
         |    AS BIGINT) AS sim_micro
         |FROM nz a JOIN nz b ON a.doc_id < b.doc_id
         |WHERE ${oCosN("a.embedding", "b.embedding", 128)} >= 0.5""".stripMargin,
    "p106_text_neardup" ->
      s"""${oHashedVecCtes()},
         |cents AS (
         |  SELECT doc_id AS cent_id, embedding AS ce FROM nz
         |  WHERE doc_id % 25 = 0),
         |assign AS (
         |  SELECT e.doc_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.doc_id
         |      ORDER BY ${oCosN("e.embedding", "ce", 128)} DESC,
         |        cent_id ASC) AS rn
         |  FROM nz e, cents),
         |cells AS (SELECT doc_id, cent_id FROM assign WHERE rn = 1),
         |probes AS (SELECT doc_id, cent_id FROM assign
         |           WHERE rn <= 3 AND doc_id % 10 = 7)
         |SELECT pr.doc_id AS query_id, cl.doc_id AS cand_id,
         |  CAST(FLOOR(${oCosN("q.embedding", "c.embedding", 128)} * 1e6)
         |    AS BIGINT) AS sim_micro
         |FROM probes pr
         |JOIN nz q ON q.doc_id = pr.doc_id
         |JOIN cells cl ON cl.cent_id = pr.cent_id
         |JOIN nz c ON c.doc_id = cl.doc_id
         |WHERE pr.doc_id != cl.doc_id
         |  AND FLOOR(${oCosN("q.embedding", "c.embedding", 128)} * 1e6)
         |    >= 500000""".stripMargin,
    "p76_embed_ingest" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents),
         |cells AS (SELECT vec_id, cent_id FROM assign WHERE rn = 1),
         |probes AS (SELECT vec_id, cent_id FROM assign
         |           WHERE rn <= 3 AND vec_id % 10 = 7)
         |SELECT pr.vec_id AS query_id, cl.vec_id AS cand_id,
         |  CAST(FLOOR(${oCos("q.embedding", "c.embedding")} * 1e6) AS BIGINT) AS sim_micro
         |FROM probes pr
         |JOIN embeddings q ON q.vec_id = pr.vec_id
         |JOIN cells cl ON cl.cent_id = pr.cent_id
         |JOIN embeddings c ON c.vec_id = cl.vec_id
         |WHERE pr.vec_id != cl.vec_id
         |  AND FLOOR(${oCos("q.embedding", "c.embedding")} * 1e6) >= 200000""".stripMargin,
    "p74_ivfpq" ->
      s"""$oIvfPqAd
         |SELECT query_id, cand_id, CAST(rn AS BIGINT) AS rank,
         |  CAST(FLOOR(adist * 1e6) AS BIGINT) AS adist_micro
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY adist ASC, cand_id ASC) AS rn FROM ad)
         |WHERE rn <= 5""".stripMargin,
    "p83_ivfpq_refine" -> oIvfPqRefineSql,
    "p85_ivf_occupancy" ->
      s"""WITH ccents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, ccents),
         |cells AS (SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
         |counts AS (
         |  SELECT cent_id, COUNT(*) AS n_members,
         |    MIN(vec_id) AS seed_a, MAX(vec_id) AS seed_b
         |  FROM cells GROUP BY cent_id),
         |tot AS (SELECT SUM(n_members) AS total, COUNT(*) AS n_cells
         |        FROM counts),
         |flags AS (
         |  SELECT c.*, CASE WHEN c.n_members * t.n_cells * 100
         |                        > 130 * t.total
         |              THEN 1 ELSE 0 END AS oversized
         |  FROM counts c, tot t),
         |sub AS (
         |  SELECT m.cent_id,
         |    SUM(CASE WHEN ${oCos("m.embedding", "a.embedding")}
         |               >= ${oCos("m.embedding", "b.embedding")}
         |        THEN 1 ELSE 0 END) AS n_a,
         |    SUM(CASE WHEN ${oCos("m.embedding", "a.embedding")}
         |               >= ${oCos("m.embedding", "b.embedding")}
         |        THEN 0 ELSE 1 END) AS n_b
         |  FROM cells m
         |  JOIN flags f ON m.cent_id = f.cent_id AND f.oversized = 1
         |  JOIN embeddings a ON a.vec_id = f.seed_a
         |  JOIN embeddings b ON b.vec_id = f.seed_b
         |  GROUP BY m.cent_id)
         |SELECT f.cent_id,
         |  CAST(f.n_members AS BIGINT) AS n_members,
         |  CAST(f.oversized AS BIGINT) AS oversized,
         |  CASE WHEN f.oversized = 1 THEN f.seed_a END AS seed_a,
         |  CASE WHEN f.oversized = 1 THEN f.seed_b END AS seed_b,
         |  CAST(s.n_a AS BIGINT) AS n_a, CAST(s.n_b AS BIGINT) AS n_b
         |FROM flags f LEFT JOIN sub s ON f.cent_id = s.cent_id""".stripMargin,
    "p96_ivf_split" ->
      s"""WITH ccents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, ccents),
         |cells AS (SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
         |counts AS (
         |  SELECT cent_id, COUNT(*) AS n_members,
         |    MIN(vec_id) AS seed_a, MAX(vec_id) AS seed_b
         |  FROM cells GROUP BY cent_id),
         |tot AS (SELECT SUM(n_members) AS total, COUNT(*) AS n_cells
         |        FROM counts),
         |flags AS (
         |  SELECT c.*, CASE WHEN c.n_members * t.n_cells * 100
         |                        > 130 * t.total
         |              THEN 1 ELSE 0 END AS oversized
         |  FROM counts c, tot t),
         |sv AS (
         |  SELECT f.cent_id, a.embedding AS va, b.embedding AS vb
         |  FROM flags f
         |  JOIN embeddings a ON a.vec_id = f.seed_a
         |  JOIN embeddings b ON b.vec_id = f.seed_b
         |  WHERE f.oversized = 1),
         |mem AS (
         |  SELECT m.cent_id, m.embedding,
         |    CASE WHEN ${oCos("m.embedding", "sv.va")}
         |           >= ${oCos("m.embedding", "sv.vb")}
         |    THEN 'a' ELSE 'b' END AS sub
         |  FROM cells m JOIN sv ON m.cent_id = sv.cent_id),
         |expl AS (
         |  SELECT cent_id, sub, i - 1 AS dim,
         |    FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6) AS fx
         |  FROM mem
         |  CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) s)
         |SELECT cent_id, sub, CAST(dim AS BIGINT) AS dim,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(FLOOR(SUM(fx) / COUNT(*)) AS BIGINT) AS mean_fixed
         |FROM expl GROUP BY 1, 2, 3""".stripMargin,
    "p50_temp_mix" ->
      s"""WITH c AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1),
         |d AS (
         |  SELECT list_sum(list_sort(list(sqrt(CAST(n_docs AS DOUBLE)))))
         |    AS denom FROM c)
         |SELECT source, n_docs,
         |  CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) / denom * 1e6) AS BIGINT)
         |    AS p_micro
         |FROM c, d""".stripMargin,
    "p51_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 20),
         |scored AS (
         |  SELECT query_id, e.vec_id AS cand_id,
         |    ${oCos("qv", "e.embedding")} AS sim
         |  FROM embeddings e, q WHERE e.vec_id != query_id),
         |ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM scored WHERE sim < 0.8)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
         |FROM ranked WHERE rank <= 5""".stripMargin,
    "p53_chunks" ->
      s"""WITH d AS (SELECT doc_id, $oToks AS toks FROM documents),
         |st AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, greatest(len(toks), 1), 24)) AS start
         |  FROM d),
         |c AS (
         |  SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_id,
         |    toks[start + 1 : start + 32] AS chunk
         |  FROM st)
         |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_tokens,
         |  ${oHash("array_to_string(chunk, ' ')")} AS chunk_hash
         |FROM c""".stripMargin,
    "p54_snapshot_diff" ->
      s"""WITH o AS (
         |  SELECT doc_id,
         |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS ofp
         |  FROM documents WHERE doc_id % 7 != 0),
         |n0 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0 THEN text || ' edited' ELSE text END
         |      AS text
         |  FROM documents WHERE doc_id % 5 != 0),
         |n AS (
         |  SELECT doc_id,
         |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS nfp
         |  FROM n0)
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN ofp = nfp THEN 'unchanged'
         |       ELSE 'modified' END AS status
         |FROM o FULL OUTER JOIN n USING (doc_id)""".stripMargin,
    "p38_pii_scrub" ->
      s"""WITH lines AS (
         |  SELECT event_id,
         |    event_type || ' user=' || CAST(user_id AS VARCHAR) ||
         |    ' amount=' || CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR)
         |      AS line
         |  FROM events),
         |s1 AS (
         |  SELECT event_id,
         |    CAST(len(regexp_extract_all(line,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
         |      AS n_email,
         |    regexp_replace(line,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |      '<EMAIL>', 'g') AS t1
         |  FROM lines),
         |s2 AS (
         |  SELECT event_id, n_email,
         |    CAST(len(regexp_extract_all(t1,
         |      '\\+?[0-9][0-9()\\- ]{6,}[0-9]')) AS BIGINT) AS n_phone,
         |    regexp_replace(t1, '\\+?[0-9][0-9()\\- ]{6,}[0-9]',
         |      '<PHONE>', 'g') AS t2
         |  FROM s1)
         |SELECT event_id,
         |  regexp_replace(t2, '[0-9]+', '<ID>', 'g') AS clean,
         |  n_email, n_phone,
         |  CAST(len(regexp_extract_all(t2, '[0-9]+')) AS BIGINT) AS n_id
         |FROM s2""".stripMargin,
    "p39_line_dedup" ->
      s"""WITH segs AS (
         |  SELECT DISTINCT doc_id, ${oHash("seg")} AS h
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(1, CAST(CEIL(len(toks) / 10.0) AS BIGINT)),
         |      i -> array_to_string(list_slice(toks, (i-1)*10+1, i*10), ' '))) AS seg
         |    FROM (SELECT doc_id, $oToks AS toks FROM documents))),
         |owners AS (SELECT h, MIN(doc_id) AS owner FROM segs GROUP BY h)
         |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
         |  CAST(SUM(CASE WHEN s.doc_id = o.owner THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(COUNT(*) AS BIGINT) -
         |  CAST(SUM(CASE WHEN s.doc_id = o.owner THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dropped
         |FROM segs s JOIN owners o USING (h) GROUP BY s.doc_id""".stripMargin,
    "p71_bpe_train" -> oBpeTrain(100),
    "p75_bpe_encode" -> oBpeEncode(100),
    "p137_wordpiece_encode" -> oBpeEncode(100, wordPiece = true),
    // the plant list in closed form: (2k, 2k+1) share a pattern, and
    // the operator side can only reproduce it by decoding both codecs
    "p77_image_neardup" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 2 = 0""".stripMargin,
    // same plant-list contract as p77: (2k, 2k+1) share a contour,
    // recoverable only by decoding both differently-scaled WAVs
    "p80_audio_neardup" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 2 = 0""".stripMargin,
    "p78_exact_substrings" ->
      s"""WITH t AS (SELECT doc_id, $oToks AS tk FROM documents),
         |g0 AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) < 8 THEN CAST([] AS STRUCT(gpos BIGINT, gh BIGINT)[])
         |    ELSE list_transform(generate_series(1, len(tk) - 7),
         |      i -> {'gpos': CAST(i - 1 AS BIGINT),
         |            'gh': ${oHash("array_to_string(tk[i:i+7], ' ')")}})
         |    END AS gs
         |  FROM t),
         |g AS (SELECT doc_id, u.gpos AS gpos, u.gh AS gh FROM (
         |  SELECT doc_id, unnest(gs) AS u FROM g0)),
         |dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
         |d AS (SELECT g.doc_id, g.gpos FROM g JOIN dup USING (gh)),
         |isl AS (SELECT doc_id, gpos,
         |  gpos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY gpos) AS grp FROM d),
         |spans AS (SELECT doc_id, MIN(gpos) AS s, MAX(gpos) + 7 AS e
         |  FROM isl GROUP BY doc_id, grp),
         |agg AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s + 1) AS dup_tokens
         |  FROM spans GROUP BY doc_id),
         |tok AS (SELECT doc_id, u.i AS i, u.tok AS tok FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)),
         |    i -> {'i': CAST(i - 1 AS BIGINT), 'tok': tk[i]})) AS u
         |  FROM t)),
         |kept AS (
         |  SELECT tok.doc_id, string_agg(tok.tok, ' ' ORDER BY tok.i) AS clean
         |  FROM tok
         |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
         |    WHERE sp.doc_id = tok.doc_id AND tok.i BETWEEN sp.s AND sp.e)
         |  GROUP BY tok.doc_id)
         |SELECT t.doc_id,
         |  CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  substr(md5(COALESCE(k.clean, '')), 1, 16) AS clean_fp
         |FROM t LEFT JOIN agg a USING (doc_id) LEFT JOIN kept k USING (doc_id)""".stripMargin,
    "p72_jpeg_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
        |  CAST(1 + doc_id % 16 AS BIGINT) AS width,
        |  CAST(1 + length(text) % 16 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS px_ok
        |FROM documents""".stripMargin,
    "p68_unigram_lm" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($oToks) AS tok FROM documents),
         |cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
         |tot AS (SELECT SUM(c) AS t FROM cnt),
         |vocab AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 500),
         |cost AS (
         |  SELECT tok,
         |    CAST(FLOOR(-ln((c + 1) / CAST(t + 501 AS DOUBLE)) * 1e6)
         |      AS BIGINT) AS cost
         |  FROM vocab, tot),
         |oov AS (
         |  SELECT CAST(FLOOR(-ln(1 / CAST(t + 501 AS DOUBLE)) * 1e6)
         |    AS BIGINT) AS oov_cost
         |  FROM tot)
         |SELECT t2.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(COALESCE(cost.cost, oov.oov_cost)) AS BIGINT) AS nll_micro,
         |  CAST(SUM(COALESCE(cost.cost, oov.oov_cost)) AS BIGINT) // COUNT(*)
         |    AS avg_nll_micro
         |FROM toks t2 CROSS JOIN oov LEFT JOIN cost ON t2.tok = cost.tok
         |GROUP BY t2.doc_id""".stripMargin,
    "p69_cluster_best" ->
      s"""WITH RECURSIVE ${oPairCtes(4, 0.4)},
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |clus AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
         |$oScoreCtes,
         |r2 AS (
         |  SELECT cluster_id, c2.doc_id, score_micro,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY score_micro DESC, c2.doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY cluster_id) AS n
         |  FROM clus c2 JOIN q ON c2.doc_id = q.doc_id)
         |SELECT cluster_id, doc_id AS best_doc_id,
         |  score_micro AS best_score_micro, CAST(n AS BIGINT) AS cluster_size
         |FROM r2 WHERE rn = 1""".stripMargin,
    "p70_importance_sample" ->
      s"""WITH $oScoreCtes,
         |mx AS (SELECT MAX(score_micro) AS mx FROM q)
         |SELECT q.doc_id, d.source, q.score_micro,
         |  ${oHash("'imp' || CAST(q.doc_id AS VARCHAR)")} % 1000000 AS draw,
         |  CAST((${oHash("'imp' || CAST(q.doc_id AS VARCHAR)")} % 1000000)
         |       * mx.mx < q.score_micro * 1000000 AS INT) AS accept
         |FROM q JOIN documents d ON q.doc_id = d.doc_id CROSS JOIN mx""".stripMargin,
    "p67_keep_longest" ->
      s"""WITH base AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
         |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp
         |  FROM documents),
         |r AS (
         |  SELECT fp, doc_id, len,
         |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY len DESC, doc_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY fp) AS n
         |  FROM base)
         |SELECT fp, doc_id AS keep_id, len AS keep_len,
         |  CAST(n AS BIGINT) AS n_copies
         |FROM r WHERE rn = 1""".stripMargin,
    "p65_segment_scrub" ->
      s"""WITH base AS (SELECT doc_id, $oToks AS toks FROM documents),
         |exp AS (
         |  SELECT doc_id AS doc,
         |    unnest(generate_series(1, CAST(CEIL(len(toks) / 10.0) AS BIGINT))) AS pos,
         |    toks
         |  FROM base),
         |segs AS (
         |  SELECT doc, pos,
         |    array_to_string(list_slice(toks, (pos-1)*10+1, pos*10), ' ') AS seg
         |  FROM exp),
         |flag AS (
         |  SELECT doc, pos, seg,
         |    CASE WHEN ROW_NUMBER() OVER (
         |      PARTITION BY ${oHash("seg")} ORDER BY doc, pos) = 1
         |    THEN 1 ELSE 0 END AS kept
         |  FROM segs)
         |SELECT doc AS doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_segs,
         |  CAST(SUM(kept) AS BIGINT) AS n_kept,
         |  substr(md5(COALESCE(
         |    string_agg(CASE WHEN kept = 1 THEN seg END, ' ' ORDER BY pos),
         |    '')), 1, 16) AS clean_fp
         |FROM flag GROUP BY doc""".stripMargin,
    "p36_random_projection" -> (0 until 16).map { p =>
      s"""SELECT vec_id, CAST($p AS BIGINT) AS dim,
         |  CAST(FLOOR(list_sum(list_transform(generate_series(1, 64),
         |    i -> CAST(embedding[i] AS DOUBLE) *
         |         (${oHash(s"'hp${p}_' || CAST(i AS VARCHAR)")} % 2001 - 1000)))
         |    * 1000000.0) AS BIGINT) AS proj_fixed
         |FROM embeddings""".stripMargin
    }.mkString("\nUNION ALL\n"),
    "p35_winnow_pairs" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS toks FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(generate_series(1, len(toks) - 2),
         |      i -> ${oHash("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")})
         |    END AS h
         |  FROM toks),
         |fps AS (
         |  SELECT doc_id,
         |    CASE WHEN len(h) < 4 THEN list_distinct(h)
         |    ELSE list_distinct(list_transform(generate_series(1, len(h) - 3),
         |      j -> list_min(h[j:j+3])))
         |    END AS fps
         |  FROM h),
         |e AS (SELECT doc_id, unnest(fps) AS fp FROM fps)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin,
    "p33_rare_tokens" ->
      s"""WITH occ AS (
         |  SELECT doc_id, unnest($oToks) AS tok FROM documents),
         |dfreq AS (
         |  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY tok),
         |j AS (SELECT doc_id, df FROM occ JOIN dfreq USING (tok)),
         |thr AS (SELECT COUNT(*) // 5 AS t FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |  CAST(SUM(CASE WHEN df <= (SELECT t FROM thr) THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  CAST(FLOOR(CAST(SUM(CASE WHEN df <= (SELECT t FROM thr) THEN 1 ELSE 0 END) AS DOUBLE)
         |    * 1000000.0 / COUNT(*)) AS BIGINT) AS rare_micro
         |FROM j GROUP BY doc_id""".stripMargin,
    "p34_winnow" ->
      s"""WITH toks AS (SELECT doc_id, $oToks AS toks FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(generate_series(1, len(toks) - 2),
         |      i -> ${oHash("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")})
         |    END AS h
         |  FROM toks),
         |fps AS (
         |  SELECT doc_id,
         |    CASE WHEN len(h) < 4 THEN list_distinct(h)
         |    ELSE list_distinct(list_transform(generate_series(1, len(h) - 3),
         |      j -> list_min(h[j:j+3])))
         |    END AS fps
         |  FROM h)
         |SELECT doc_id, unnest(fps) AS fp FROM fps""".stripMargin,
    "p31_shard_export" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${oHash("'shard' || CAST(doc_id AS VARCHAR)")} AS hh
         |  FROM documents)
         |SELECT doc_id, CAST(hh % 8 AS BIGINT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
         |    AS BIGINT) AS pos
         |FROM h""".stripMargin,
    "p98_shard_offsets" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${oHash("'shard' || CAST(doc_id AS VARCHAR)")} AS hh,
         |    CAST(len($oToks) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT CAST(hh % 8 AS BIGINT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
         |    AS BIGINT) AS pos,
         |  doc_id, n_tokens,
         |  CAST(SUM(n_tokens + 1) OVER (PARTITION BY hh % 8
         |      ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING)
         |    - (n_tokens + 1) AS BIGINT) AS token_offset
         |FROM h""".stripMargin,
    "p86_shard_manifest" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${oHash("'shard' || CAST(doc_id AS VARCHAR)")} AS hh,
         |    substr(md5(array_to_string($oToks, ' ')), 1, 16) AS fp,
         |    CAST(len($oToks) AS BIGINT) AS n_toks
         |  FROM documents),
         |sp AS (
         |  SELECT hh % 8 AS shard, fp, n_toks,
         |    ROW_NUMBER() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
         |      AS pos
         |  FROM h)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(${oHash("fp || ':' || CAST(pos AS VARCHAR)")}
         |           % 268435456) AS BIGINT) AS manifest_sum
         |FROM sp GROUP BY shard""".stripMargin,
    "p32_seq_pack" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, len($oToks) AS n_toks,
         |    ${oHash("'pack' || CAST(doc_id AS VARCHAR)")} AS hh
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_toks,
         |    SUM(n_toks) OVER (PARTITION BY source ORDER BY hh, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks
         |      AS start_tok
         |  FROM h)
         |SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(FLOOR(CAST(start_tok AS DOUBLE) / 2048) AS BIGINT) AS chunk_idx,
         |  CAST(start_tok % 2048 AS BIGINT) AS chunk_off
         |FROM c""".stripMargin,
    "p29_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id AS media_id, text,
         |    octet_length(encode(text)) // 40 + 1 AS nf
         |  FROM documents WHERE doc_id % 2 = 1)
         |SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
         |  md5(text || '#' || CAST(i AS VARCHAR)) AS frame_checksum
         |FROM f CROSS JOIN (SELECT UNNEST(generate_series(0, 6, 2)) AS i) s
         |WHERE i < nf
         |UNION ALL
         |SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS frame_idx,
         |  md5(CAST(1 + doc_id % 16 AS VARCHAR) || 'x' ||
         |      CAST(1 + length(text) % 16 AS VARCHAR) || ':' ||
         |      CAST((doc_id % 256) * 65793 AS VARCHAR)) AS frame_checksum
         |FROM documents WHERE doc_id % 2 = 0""".stripMargin,
    "p59_resize_png" ->
      s"""WITH d AS (
         |  SELECT doc_id AS media_id,
         |    1 + doc_id % 16 AS w,
         |    1 + length(text) % 16 AS h
         |  FROM documents)
         |SELECT media_id,
         |  CAST(224 AS INTEGER) AS target_w, CAST(224 AS INTEGER) AS target_h,
         |  CAST(FLOOR(224 * 1000000.0 / w) AS BIGINT) AS scale_x_micro,
         |  CAST(FLOOR(224 * 1000000.0 / h) AS BIGINT) AS scale_y_micro
         |FROM d""".stripMargin,
    "p30_resize_plan" ->
      s"""WITH d AS (
         |  SELECT doc_id AS media_id,
         |    CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 16
         |         ELSE 64 + (ascii(substr(text, 1, 1)) % 192) END AS w,
         |    CASE WHEN doc_id % 2 = 0 THEN 1 + length(text) % 16
         |         ELSE 64 + (ascii(substr(text, 2, 1)) % 192) END AS h
         |  FROM documents)
         |SELECT media_id,
         |  CAST(224 AS INTEGER) AS target_w, CAST(224 AS INTEGER) AS target_h,
         |  CAST(FLOOR(224 * 1000000.0 / w) AS BIGINT) AS scale_x_micro,
         |  CAST(FLOOR(224 * 1000000.0 / h) AS BIGINT) AS scale_y_micro
         |FROM d""".stripMargin,
    "p27_containment" ->
      s"""WITH sh AS MATERIALIZED (
         |  SELECT doc_id, ${oShingles(4)} AS sh
         |  FROM (SELECT doc_id, $oToks AS toks FROM documents)),
         |ndposts AS (SELECT doc_id, unnest(sh) AS g FROM sh),
         |ndsz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM sh),
         |pairs AS (
         |  SELECT c.doc_a AS da, c.doc_b AS db, c.inter,
         |    sa.n AS na, sb.n AS nb
         |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |          CAST(COUNT(*) AS BIGINT) AS inter
         |        FROM ndposts a JOIN ndposts b
         |          ON a.g = b.g AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2) c
         |  JOIN ndsz sa ON c.doc_a = sa.doc_id
         |  JOIN ndsz sb ON c.doc_b = sb.doc_id),
         |dirn AS (
         |  SELECT da AS contained, db AS container,
         |    inter / CAST(na AS DOUBLE) AS c
         |  FROM pairs WHERE na > 0
         |  UNION ALL
         |  SELECT db, da, inter / CAST(nb AS DOUBLE) FROM pairs WHERE nb > 0)
         |SELECT contained, container,
         |  CAST(FLOOR(c * 1e6) AS BIGINT) AS containment_micro
         |FROM dirn WHERE c >= 0.5""".stripMargin,
    "p28_corpus_stats" ->
      s"""WITH d AS (
         |  SELECT source, lang, len($oToks) AS n_toks FROM documents)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
         |  CAST(FLOOR(CAST(SUM(n_toks) AS DOUBLE) * 1000000.0 / COUNT(*)) AS BIGINT)
         |    AS mean_toks_micro,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM d GROUP BY source""".stripMargin,
    "p26_ivf_nprobe" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents),
         |cells AS (
         |  SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id, embedding, cent_id FROM assign
         |  WHERE rn <= 2 AND vec_id < 20),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${oCos("q.embedding", "c.embedding")} AS sim
         |  FROM probes q JOIN cells c
         |    ON q.cent_id = c.cent_id AND q.vec_id != c.vec_id),
         |ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
         |FROM ranked WHERE rank <= 3""".stripMargin,
    "p73_ivf_tuned" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCos("e.embedding", "ce")} DESC, cent_id ASC) AS rn
         |  FROM embeddings e, cents),
         |cells AS (
         |  SELECT vec_id, embedding, cent_id FROM assign WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id, embedding, cent_id FROM assign
         |  WHERE rn <= 8 AND vec_id < 20),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${oCos("q.embedding", "c.embedding")} AS sim
         |  FROM probes q JOIN cells c
         |    ON q.cent_id = c.cent_id AND q.vec_id != c.vec_id),
         |ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, cand_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  CAST(FLOOR(sim * 1e6) AS BIGINT) AS sim_micro
         |FROM ranked WHERE rank <= 3""".stripMargin,
    "p25_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, ${oHash("s")} AS h
         |  FROM (SELECT doc_id, unnest(${oShingles(3)}) AS s
         |        FROM (SELECT doc_id, $oToks AS toks FROM documents))),
         |b AS (SELECT doc_id AS bench_doc, h FROM sh WHERE doc_id % 20 = 0),
         |tr AS (SELECT doc_id AS train_doc, h FROM sh WHERE doc_id % 20 != 0)
         |SELECT train_doc, bench_doc, CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM tr JOIN b USING (h)
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin
  )
}
