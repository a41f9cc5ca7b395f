package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** DuckDB oracle SQL for the [[TextStats]] + [[TextDedup]] query surface
  * — the third file of the former TextQueries split (r8 ask #6). Shared
  * CTE chains (span dedup, simhash, minhash+LSH, incremental classify,
  * quality score) are written once and consumed by every oracle that
  * needs them, mirroring how the Spark side shares operator bodies.
  */
object TextOracles {

import TextStats._

  private val NORM =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
  // empty-token filter mirrors TextFunctions.tokens (review r16);
  // whitespace class is the shared explicit WsRe set (hostile sweep
  // r18 — RE2's `\s` omits U+000B, Java's includes it)
  private val TOKS =
    s"list_filter(string_split_regex(trim(text), '$WsRe+'), x -> x <> '')"
  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
  private def hitSql(ws: Seq[String]) =
    s"len(list_filter($TOKS, x -> x IN (${inList(ws)})))"

  private val TOKHASH =
    s"""tok AS (SELECT doc_id, unnest($TOKS) AS t FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS hv FROM tok)""".stripMargin

  /** Shared CTE chain for the span-dedup oracles, ending in the per-doc
    * swept aggregate `a(doc_id, n_tokens, n_removed, clean_text)`. Two
    * final SELECTs consume it: q_span_dedup (full clean_text) and
    * q_span_dedup_rowhash (md5 localizer). */
  private val SpanDedupSqlBody =
    s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
       |tok AS (
       |  SELECT doc_id, i AS pos, ts[i] AS tk
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i)),
       |g AS (
       |  SELECT doc_id, i AS pos,
       |    ('0x' || substr(md5(array_to_string(ts[i:i+4], ' ')), 1, 15))::BIGINT AS gh
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 4)) AS i)),
       |dup AS (
       |  SELECT gh, min(doc_id) AS owner FROM g
       |  GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
       |rs AS (
       |  SELECT g.doc_id, g.pos AS s FROM g JOIN dup USING (gh)
       |  WHERE g.doc_id != dup.owner),
       |cov AS (
       |  SELECT tok.doc_id, tok.pos, tok.tk,
       |    max(rs.s + 4) OVER (PARTITION BY tok.doc_id ORDER BY tok.pos) AS cover_end
       |  FROM tok LEFT JOIN rs ON tok.doc_id = rs.doc_id AND tok.pos = rs.s),
       |a AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN cover_end IS NOT NULL AND cover_end >= pos THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    coalesce(string_agg(
       |      CASE WHEN cover_end IS NULL OR cover_end < pos THEN tk END,
       |      ' ' ORDER BY pos), '') AS clean_text
       |  FROM cov GROUP BY doc_id)""".stripMargin

  /** DuckDB twin of the SimHash vote fold, ending in an
    * `sh(doc_id, simhash)` CTE — ONE generator for BOTH widths (review
    * r14: the wide variant had grown as a near-verbatim copy; a tie-rule
    * or md5-slice fix applied to one copy would silently desynchronize
    * the other oracle from its Spark twin): `hexChars` md5 hex digits
    * decode to the per-token hash (8 ↔ hash32, 15 ↔ hash60), `bits`
    * vote sums, positive-vote bit assembly. */
  private def simhashCtes(hexChars: Int, bits: Int): String =
    s"""tok AS (SELECT doc_id, unnest($TOKS) AS t FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, $hexChars))::BIGINT AS hv FROM tok),
       |v AS (
       |  SELECT doc_id,
       |    ${(0 until bits).map(j =>
          s"sum(CASE WHEN (hv >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(",\n    ")}
       |  FROM h GROUP BY doc_id),
       |sh AS (
       |  SELECT doc_id,
       |    ${(0 until bits).map(j => s"(CASE WHEN b$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
          .mkString(" + ")} AS simhash
       |  FROM v)""".stripMargin

  /** 32-bit form, shared by q_simhash / q_simhash_neardup /
    * q_neardup_degree / the editdist candidate CTE. */
  private val SimhashCtes = simhashCtes(8, 32)

  /** Wide 60-bit form (hash60 decode), shared by q_simhash_wide /
    * q_simhash_wide_neardup. */
  private val SimhashWideCtes = simhashCtes(15, 60)

  /** DuckDB twin of TextFunctions.qualityScoreOf — ONE copy, shared by
    * the q_text_quality and q_dedup_best oracles (the Scala side both
    * mirror is also a single definition). */
  private val QualitySql: String =
    s"""least(len($TOKS) / 50.0, 1.0) * 0.4
       |      + least(coalesce(${hitSql(EnStop)} * 1.0 / nullif(len($TOKS), 0), 0.0) * 5.0, 1.0) * 0.3
       |      + coalesce(length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) * 1.0 / nullif(length(text), 0), 0.0) * 0.3""".stripMargin

  /** DuckDB twin of Dedup.canonicalGroups over the verified MinHash dup
    * pairs (consumes the [[MinhashCtes]] `j`/`cand` CTEs; shared by
    * q_dedup_groups and q_dedup_best): dup pairs → undirected edges →
    * recursive transitive closure → per-node min label `labelAlias`. */
  private def ccSql(labelAlias: String): String =
    s"""p AS (
       |  SELECT j.a, j.b FROM j JOIN cand ON j.a = cand.a AND j.b = cand.b
       |  WHERE jaccard >= 0.8),
       |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
       |reach(id, r) AS (
       |  SELECT a, a FROM e
       |  UNION
       |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
       |lbl AS (SELECT id, min(r) AS $labelAlias FROM reach GROUP BY id)""".stripMargin

  /** Decontamination oracle — shared verbatim by q_decontaminate and
    * q_decontam_bloom (the bloom path is an exact-equivalent physical
    * rewrite, not a different query). */
  private val DecontamSql: String =
    s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id,
       |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 4)) AS i)),
       |b AS (SELECT DISTINCT s FROM g WHERE doc_id < 10),
       |c AS (
       |  SELECT g.doc_id, count(*) AS n_hits
       |  FROM g JOIN b USING (s) WHERE g.doc_id >= 10 GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(c.n_hits, 0) AS n_contaminated_ngrams,
       |  CAST(coalesce(c.n_hits, 0) = 0 AS INTEGER) AS keep
       |FROM documents d LEFT JOIN c USING (doc_id)
       |WHERE d.doc_id >= 10 ORDER BY d.doc_id""".stripMargin

  /** Shared CTE chain of the MinHash+LSH dedup oracle (docs → token hash
    * → signatures → bands → candidates → exact-Jaccard `j`); consumed by
    * q_dedup_minhash (pair list) and q_dedup_groups (connected
    * components over the same pairs). */
  private val MinhashCtes: String =
    s"""docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
       |tok AS (SELECT doc_id, unnest($TOKS) AS t FROM docs),
       |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS hv FROM tok),
       |sig AS (
       |  SELECT doc_id,
       |    ${(0 until 8).map(i => s"min(${Dedup.minhashSqlExpr(i)}) AS mh$i").mkString(",\n    ")}
       |  FROM h GROUP BY doc_id),
       |bands AS (
       |  ${(0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(mh${2*b}::VARCHAR || '_' || mh${2*b+1}::VARCHAR) AS bkey FROM sig")
          .mkString("\n  UNION ALL\n  ")}),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |sh AS (SELECT DISTINCT doc_id, unnest($TOKS) AS s FROM docs),
       |$JaccardNIJ""".stripMargin

  /** Shared n/i/j CTE body — word-set sizes, pairwise intersections and
    * the exact Jaccard ratio off a preceding `sh(doc_id, s)` CTE. ONE
    * copy (review r13 leg 3: a third verbatim copy had grown with the
    * sweep oracle — the pair recipe lives once or the sweep's pair set
    * silently drifts from the one it claims to share). */
  // a def, not a val: the consuming CTE strings above initialize first
  // (a forward val reference would interpolate null at object init)
  private def JaccardNIJ: String =
    """n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |i AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
      |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT a, b, c * 1.0 / (na.n + nb.n - c) AS jaccard
      |  FROM i JOIN n na ON na.doc_id = a JOIN n nb ON nb.doc_id = b)""".stripMargin

  private def jaccardSql(shingleCte: String, threshold: Double): String =
    s"""WITH $shingleCte,
       |$JaccardNIJ
       |SELECT a, b, floor((jaccard) * 1e4 + 0.5) / 1e4 AS jaccard
       |FROM j WHERE jaccard >= $threshold ORDER BY a, b""".stripMargin

  /** DuckDB twin of the incremental (batch-vs-corpus) classification —
    * ONE copy, shared by q_dedup_incremental and its index-probing twin
    * q_dedup_indexed (identical output by construction; the shared
    * oracle is the losslessness proof for the bucketed index). */
  private val IncrementalSql: String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
       |tok AS (SELECT doc_id, unnest($TOKS) AS t FROM docs),
       |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS hv FROM tok),
       |sig AS (
       |  SELECT doc_id,
       |    ${(0 until 8).map(i => s"min(${Dedup.minhashSqlExpr(i)}) AS mh$i").mkString(",\n    ")}
       |  FROM h GROUP BY doc_id),
       |bands AS (
       |  ${(0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(mh${2 * b}::VARCHAR || '_' || mh${2 * b + 1}::VARCHAR) AS bkey FROM sig")
          .mkString("\n  UNION ALL\n  ")}),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < 60 AND y.doc_id >= 60),
       |sh AS (SELECT DISTINCT doc_id, unnest($TOKS) AS s FROM docs),
       |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |i AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
       |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < 60 AND y.doc_id >= 60
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT a, b, c * 1.0 / (na.n + nb.n - c) AS jaccard
       |  FROM i JOIN n na ON na.doc_id = a JOIN n nb ON nb.doc_id = b),
       |nr AS (
       |  SELECT j.b AS doc_id, min(j.a) AS near_id
       |  FROM j JOIN cand ON j.a = cand.a AND j.b = cand.b
       |  WHERE jaccard >= 0.8 GROUP BY 1),
       |fp AS (SELECT doc_id, md5($NORM) AS fp FROM docs),
       |ex AS (
       |  SELECT b.doc_id, min(a.doc_id) AS exact_id
       |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < 60 AND b.doc_id >= 60
       |  GROUP BY 1)
       |SELECT d.doc_id,
       |  CASE WHEN ex.exact_id IS NOT NULL THEN 'exact_dup'
       |       WHEN nr.near_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'new' END AS status,
       |  coalesce(ex.exact_id, nr.near_id) AS match_id
       |FROM documents d LEFT JOIN ex USING (doc_id) LEFT JOIN nr USING (doc_id)
       |WHERE d.doc_id >= 60 AND d.doc_id < 120 ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // one tokenize pass onto the vocabulary grid; every output an
    // exact integer or one division of exact integers
    "q_vocab_drift" ->
      s"""WITH tok AS (
         |  SELECT ((doc_id % 2) + 2) % 2 AS b, unnest($TOKS) AS t
         |  FROM documents),
         |tk AS (SELECT b, t FROM tok WHERE t != ''),
         |grid AS (
         |  SELECT t,
         |    CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM tk GROUP BY t),
         |g AS (
         |  SELECT
         |    CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_a,
         |    CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_b,
         |    CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS v_shared,
         |    CAST(sum(CASE WHEN cb > 0 AND ca = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS new_types,
         |    CAST(sum(CASE WHEN ca > 0 AND cb = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS lost_types,
         |    CAST(sum(cb) AS BIGINT) AS tokens_b,
         |    CAST(sum(CASE WHEN ca = 0 THEN cb ELSE 0 END) AS BIGINT)
         |      AS oov_mass
         |  FROM grid)
         |SELECT v_a, v_b, v_shared, new_types, lost_types,
         |  CASE WHEN v_a + v_b - v_shared > 0 THEN
         |    floor((CAST(v_shared AS DOUBLE)
         |      / CAST(v_a + v_b - v_shared AS DOUBLE)) * 1e6 + 0.5) / 1e6
         |  END AS jaccard,
         |  CASE WHEN tokens_b > 0 THEN
         |    floor((CAST(oov_mass AS DOUBLE) / CAST(tokens_b AS DOUBLE))
         |      * 1e6 + 0.5) / 1e6
         |  END AS oov_rate
         |FROM g""".stripMargin,
    // top-K vocab by the same (count desc, token) cut, ANTI JOIN for
    // the per-doc OOV count, one exact rational per doc
    "q_vocab_coverage" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS tk FROM documents),
         |v AS (
         |  SELECT tk FROM (
         |    SELECT tk, count(*) AS c FROM tok GROUP BY tk
         |    ORDER BY c DESC, tk LIMIT ${TextStats.VocabK})),
         |o AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN v.tk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_oov
         |  FROM tok LEFT JOIN v ON tok.tk = v.tk GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_oov,
         |  floor((CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         |    * 1e4 + 0.5) / 1e4 AS oov_rate
         |FROM o ORDER BY doc_id""".stripMargin,
    // distinct 5-grams per doc, min-doc_id first owner, LEFT JOIN keeps
    // shingle-less docs at n_grams 0 / NULL novelty
    "q_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |g AS (
         |  SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS sh
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 4)) AS i)),
         |pd AS (SELECT DISTINCT doc_id, sh FROM g),
         |ow AS (SELECT sh, min(doc_id) AS owner FROM pd GROUP BY sh),
         |a AS (
         |  SELECT pd.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN ow.owner = pd.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_novel
         |  FROM pd JOIN ow USING (sh) GROUP BY pd.doc_id)
         |SELECT d.doc_id,
         |  coalesce(a.n_grams, CAST(0 AS BIGINT)) AS n_grams,
         |  coalesce(a.n_novel, CAST(0 AS BIGINT)) AS n_novel,
         |  CASE WHEN a.n_grams > 0 THEN
         |    floor((CAST(a.n_novel AS DOUBLE) / CAST(a.n_grams AS DOUBLE))
         |      * 1e4 + 0.5) / 1e4 END AS novelty
         |FROM documents d LEFT JOIN a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // occurrence-weighted in-word character bigrams, (count desc, pair)
    // top-k — the single-round BPE merge statistic
    "q_bpe_pairs" ->
      s"""WITH tok AS (SELECT unnest($TOKS) AS w FROM documents),
         |w2 AS (SELECT w FROM tok WHERE length(w) >= 2),
         |p AS (
         |  SELECT substr(w, i, 2) AS pair, w
         |  FROM w2, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i)),
         |g AS (
         |  SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences,
         |    CAST(count(DISTINCT w) AS BIGINT) AS n_word_types
         |  FROM p GROUP BY pair)
         |SELECT pair, n_occurrences, n_word_types
         |FROM g ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,
    // phrase id = running stopword count (mirrored window), word score
    // = exact integer degree/freq rational, ordered on the ROUNDED score
    "q_rake_keywords" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |tok AS (
         |  SELECT doc_id, i AS pos, ts[i] AS tk
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i)),
         |s AS (
         |  SELECT doc_id, pos, tk,
         |    CASE WHEN tk IN (${TextStats.RakeStopwords.map(w => s"'$w'").mkString(", ")})
         |      THEN 1 ELSE 0 END AS is_stop
         |  FROM tok),
         |ph AS (
         |  SELECT doc_id, pos, tk, is_stop,
         |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase
         |  FROM s),
         |nst AS (SELECT * FROM ph WHERE is_stop = 0),
         |pl AS (
         |  SELECT doc_id, phrase, CAST(count(*) AS BIGINT) AS plen
         |  FROM nst GROUP BY doc_id, phrase),
         |g AS (
         |  SELECT tk AS word, CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(plen) AS BIGINT) AS degree
         |  FROM nst JOIN pl USING (doc_id, phrase) GROUP BY tk)
         |SELECT word, freq, degree,
         |  floor((CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS score
         |FROM g ORDER BY score DESC, freq DESC, word LIMIT 20""".stripMargin,
    "q_text_stats" ->
      s"""SELECT doc_id, source,
         |  len($TOKS) AS n_tokens,
         |  length(text) AS len_chars,
         |  floor((length(regexp_replace(text, '$WsRe', '', 'g')) * 1.0 / nullif(len($TOKS), 0)) * 1e4 + 0.5) / 1e4 AS avg_tok_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    ${hitSql(EnStop)} * 1.0 / len($TOKS) AS stop_ratio,
         |    $QualitySql AS quality
         |  FROM documents)
         |SELECT doc_id,
         |  floor((stop_ratio) * 1e4 + 0.5) / 1e4 AS stop_ratio,
         |  floor((quality) * 1e4 + 0.5) / 1e4 AS quality,
         |  CASE WHEN quality >= 0.75 THEN 'high' WHEN quality >= 0.5 THEN 'mid' ELSE 'low' END AS bucket
         |FROM q ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      s"""WITH s AS (
         |  SELECT doc_id, lang AS declared,
         |    ${hitSql(EnStop)} * 1.0 / len($TOKS) AS s_en,
         |    ${hitSql(DeStop)} * 1.0 / len($TOKS) AS s_de,
         |    ${hitSql(EsStop)} * 1.0 / len($TOKS) AS s_es,
         |    ${hitSql(FrStop)} * 1.0 / len($TOKS) AS s_fr
         |  FROM documents)
         |SELECT doc_id, declared,
         |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
         |       WHEN s_fr > 0 THEN 'fr'
         |       ELSE 'und' END AS predicted,
         |  CAST(declared = (CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
         |       WHEN s_fr > 0 THEN 'fr'
         |       ELSE 'und' END) AS INTEGER) AS agree
         |FROM s ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      s"""SELECT doc_id, md5($NORM) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT md5($NORM) AS fp, min(doc_id) AS canonical_id, count(*) AS cnt
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    // span dedup: same 60-bit gram identity, min-id owner, coverage
    // sweep as running max over removal starts, ordered string_agg
    // rebuild (string_agg skips the NULLed removed tokens). The final
    // SELECT is driven from the documents table (LEFT JOIN onto the
    // swept aggregate, the q_crossdoc_ngram shape) so a doc whose text
    // yields no unnested positions can never silently vanish from the
    // oracle side, and the integer sums are cast to BIGINT explicitly —
    // DuckDB's sum() is HUGEINT, which some client paths (pandas)
    // surface as float64/decimal and hash differently from Spark's
    // LongType even when cell comparison says equal.
    "q_span_dedup" ->
      s"""$SpanDedupSqlBody
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // per-row hash localizer for q_span_dedup: identical values but
    // clean_text replaced by its md5, so if the corpus-level hash gate
    // ever trips again the failure localizes to specific rows (and
    // discriminates value drift from string-canonicalization drift)
    "q_span_dedup_rowhash" ->
      s"""$SpanDedupSqlBody
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  md5(coalesce(a.clean_text, '')) AS clean_md5
         |FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "q_dedup_jaccard" -> jaccardSql(
      s"""sh AS (
         |  SELECT DISTINCT doc_id, unnest($TOKS) AS s
         |  FROM documents WHERE doc_id < 100)""".stripMargin, 0.8),
    // ONE exact pair set at the sweep floor, filtered per threshold;
    // the raw jaccard doubles are identical engine-to-engine so the
    // unrounded comparisons are parity-safe (the q_dedup_jaccard
    // precedent); spine LEFT JOINs keep zero-pair thresholds
    "q_dedup_sweep" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, unnest($TOKS) AS s
         |  FROM documents WHERE doc_id < 100),
         |$JaccardNIJ,
         |p AS (SELECT a, b, jaccard FROM j
         |  WHERE jaccard >= ${TextDedup.SweepThresholds.min}),
         |spine AS (
         |  SELECT CAST(unnest([${TextDedup.SweepThresholds.mkString(", ")}])
         |    AS DOUBLE) AS threshold),
         |q AS (SELECT threshold, a, b FROM spine JOIN p
         |  ON jaccard >= threshold),
         |np AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM q GROUP BY threshold),
         |docs AS (SELECT DISTINCT threshold, unnest([a, b]) AS d FROM q),
         |nd AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM docs GROUP BY threshold),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus
         |  FROM documents WHERE doc_id < 100)
         |SELECT spine.threshold,
         |  CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
         |  floor((CAST(coalesce(n_docs, 0) AS DOUBLE)
         |    / CAST(n_corpus AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS dup_frac
         |FROM spine LEFT JOIN np USING (threshold)
         |  LEFT JOIN nd USING (threshold) CROSS JOIN tot
         |ORDER BY threshold""".stripMargin,
    // directed containment, deliberately ALL-PAIRS: the Spark side
    // prosecutes the prefix-filtered join, so a green hash here proves
    // the rare-shingle prefix proposes every qualifying pair (threshold
    // applied to the unrounded ratio, as in the operator)
    "q_containment" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents WHERE doc_id < 500),
         |sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i)),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |i AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id != y.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, floor((c * 1.0 / na.n) * 1e4 + 0.5) / 1e4 AS containment
         |FROM i JOIN n na ON na.doc_id = a
         |WHERE c * 1.0 / na.n >= 0.1 ORDER BY a, b""".stripMargin,
    "q_chunking" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents WHERE doc_id < 50),
         |g AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS BIGINT) AS chunk_idx,
         |    CAST(least($ChunkLen, len(ts) - s + 1) AS BIGINT) AS n_tokens,
         |    md5(array_to_string(ts[s : least(s + ${ChunkLen - 1}, len(ts))], ' ')) AS chunk_fp
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts), $ChunkStride)) AS s)
         |  WHERE s = 1 OR s + ${ChunkLen - ChunkStride} <= len(ts))
         |SELECT doc_id, chunk_idx, n_tokens, chunk_fp
         |FROM g ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_decontaminate" -> DecontamSql,
    // bloom prefilter + exact verify has no false negatives and the join
    // removes false positives — results are EXACTLY the plain
    // decontamination's, so both queries share one oracle
    "q_decontam_bloom" -> DecontamSql,
    "q_repetition" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |g2 AS (
         |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS s
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i)),
         |c2 AS (SELECT doc_id, s, count(*) AS c FROM g2 GROUP BY 1, 2),
         |a2 AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS f2 FROM c2 GROUP BY 1),
         |g5 AS (
         |  SELECT doc_id,
         |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 4)) AS i)),
         |c5 AS (SELECT doc_id, s, count(*) AS c FROM g5 GROUP BY 1, 2),
         |a5 AS (
         |  SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1.0 / sum(c) AS f5
         |  FROM c5 GROUP BY 1)
         |SELECT d.doc_id,
         |  floor((coalesce(f2, 0)) * 1e4 + 0.5) / 1e4 AS top2_frac,
         |  floor((coalesce(f5, 0)) * 1e4 + 0.5) / 1e4 AS dup5_frac,
         |  CAST(coalesce(f2, 0) < 0.2 AND coalesce(f5, 0) < 0.15 AS INTEGER) AS keep
         |FROM documents d LEFT JOIN a2 USING (doc_id) LEFT JOIN a5 USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q_crossdoc_ngram" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 4)) AS i)),
         |nd AS (SELECT s, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1),
         |a AS (
         |  SELECT g.doc_id,
         |    sum(CASE WHEN nd.nd >= 2 THEN length(g.s) ELSE 0 END) * 1.0
         |      / sum(length(g.s)) AS f
         |  FROM g JOIN nd USING (s) GROUP BY 1)
         |SELECT d.doc_id,
         |  floor((coalesce(f, 0)) * 1e4 + 0.5) / 1e4 AS dup_char_frac,
         |  CAST(coalesce(f, 0) < 0.30 AS INTEGER) AS keep
         |FROM documents d LEFT JOIN a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q_dedup_best" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |${ccSql("label")},
         |q AS (
         |  SELECT doc_id, $QualitySql AS quality
         |  FROM documents WHERE doc_id < 100),
         |g AS (
         |  SELECT q.doc_id, coalesce(lbl.label, q.doc_id) AS group_id, q.quality
         |  FROM q LEFT JOIN lbl ON q.doc_id = lbl.id),
         |r AS (
         |  SELECT doc_id, group_id, quality,
         |    row_number() OVER (PARTITION BY group_id ORDER BY quality DESC, doc_id) AS rk
         |  FROM g)
         |SELECT doc_id, group_id,
         |  floor((quality) * 1e4 + 0.5) / 1e4 AS quality,
         |  CAST(rk = 1 AS INTEGER) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_pii_redact" ->
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |      '$EmailRe', '[EMAIL]', 'g'), '$UrlRe', '[URL]', 'g'),
         |      '$PhoneRe', '[PHONE]', 'g'), '$Ipv4Re', '[IP]', 'g') AS redacted
         |  FROM documents)
         |SELECT doc_id, redacted,
         |  CAST(greatest(0,
         |    len(regexp_extract_all(redacted, '\\[(EMAIL|URL|PHONE|IP)\\]'))
         |    - len(regexp_extract_all(text, '\\[(EMAIL|URL|PHONE|IP)\\]'))) AS BIGINT) AS n_redactions
         |FROM r ORDER BY doc_id""".stripMargin,
    // same fixed-order BM25 arithmetic; k1/b enter as CAST(literal AS
    // DOUBLE) so DuckDB's DECIMAL parse cannot pre-fold (1.2+1.0) to a
    // different double than Spark's IEEE sum
    "q_bm25" -> {
      val terms = BmQuery.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM t),
         |stats AS (SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
         |tok AS (SELECT doc_id, unnest($TOKS) AS tm FROM documents),
         |tf AS (
         |  SELECT doc_id, tm, count(*) AS tf FROM tok
         |  WHERE tm IN ($terms) GROUP BY doc_id, tm),
         |dfreq AS (SELECT tm, count(*) AS df FROM tf GROUP BY tm),
         |sc AS (
         |  SELECT tf.doc_id,
         |    ln((CAST(s.nd AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
         |        / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
         |      * ((CAST(tf.tf AS DOUBLE) * (CAST($BmK1 AS DOUBLE) + 1.0))
         |        / (CAST(tf.tf AS DOUBLE) + CAST($BmK1 AS DOUBLE)
         |          * (1.0 - CAST($BmB AS DOUBLE) + CAST($BmB AS DOUBLE)
         |            * (CAST(dl.dl AS DOUBLE)
         |              / (CAST(s.sumdl AS DOUBLE) / CAST(s.nd AS DOUBLE)))))) AS c
         |  FROM tf JOIN dfreq d ON tf.tm = d.tm
         |    JOIN dl ON tf.doc_id = dl.doc_id
         |    CROSS JOIN stats s)
         |SELECT doc_id, count(*) AS n_terms_matched,
         |  floor((sum(c)) * 1e4 + 0.5) / 1e4 AS bm25
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // (df DESC, tf DESC, term) ends in a unique key so the LIMIT set is
    // deterministic; postings pre-ranked so the string carries exactly
    // the first IndexPostings sorted doc ids
    "q_inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS t FROM documents),
         |pd AS (SELECT t, doc_id, count(*) AS tf_doc FROM tok GROUP BY t, doc_id),
         |r AS (
         |  SELECT t, doc_id, tf_doc,
         |    row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
         |  FROM pd),
         |agg AS (
         |  SELECT t, count(*) AS df, CAST(sum(tf_doc) AS BIGINT) AS tf,
         |    string_agg(CASE WHEN rn <= $IndexPostings
         |      THEN CAST(doc_id AS VARCHAR) END, ',' ORDER BY doc_id) AS postings
         |  FROM r GROUP BY t)
         |SELECT t AS term, df, tf, postings FROM agg
         |ORDER BY df DESC, tf DESC, t LIMIT $IndexTopTerms""".stripMargin,
    // same md5 bucket/sign hashes (integer arithmetic throughout);
    // DuckDB % on the non-negative hash matches Spark pmod-free % here
    "q_feature_hash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($TOKS) AS t FROM documents WHERE doc_id < 20)
         |SELECT doc_id,
         |  CAST(('0x' || substr(md5(t || '|fh'), 1, 8))::BIGINT % $FeatureHashDim AS INT) AS bucket,
         |  CAST(sum(('0x' || substr(md5(t || '|fhsign'), 1, 8))::BIGINT % 2 * 2 - 1) AS BIGINT) AS feature_value,
         |  count(*) AS n_tokens
         |FROM tok GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin,
    // tf/dl shares the TOKS token frame; the entropy term mirrors the
    // Spark fixed order (one division to p, then p·ln p)
    "q_token_entropy" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS t FROM documents),
         |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
         |dl AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl,
         |    count(*) AS n_distinct
         |  FROM tf GROUP BY doc_id),
         |p AS (
         |  SELECT tf.doc_id, dl.dl, dl.n_distinct,
         |    CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE) AS p
         |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id)
         |SELECT doc_id, max(dl) AS n_tokens, max(n_distinct) AS n_distinct,
         |  floor((-sum(p * ln(p))) * 1e4 + 0.5) / 1e4 AS entropy,
         |  floor((CAST(max(n_distinct) AS DOUBLE) / CAST(max(dl) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS ttr
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigram pairs as parallel unnest of the list and its own tail —
    // positionally identical to the Spark slice+arrays_zip; the mixed
    // probability is spelled in the same fixed IEEE order, with both
    // interpolation weights as shared literal constants
    "q_bigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |pr AS (
         |  SELECT doc_id, unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
         |  FROM t WHERE len(ts) >= 2),
         |cb AS (SELECT w1, w2, count(*) AS cb FROM pr GROUP BY w1, w2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM pr GROUP BY w1),
         |tok AS (SELECT unnest($TOKS) AS t FROM documents),
         |uni AS (SELECT t, count(*) AS cu FROM tok GROUP BY t),
         |tot AS (SELECT count(*) AS n FROM tok),
         |s AS (
         |  SELECT pr.doc_id,
         |    -ln($BigramLambda * (CAST(cb.cb AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
         |      + $BigramMu * (CAST(uni.cu AS DOUBLE) / CAST(tot.n AS DOUBLE))) AS lp
         |  FROM pr JOIN cb ON pr.w1 = cb.w1 AND pr.w2 = cb.w2
         |    JOIN c1 ON pr.w1 = c1.w1
         |    JOIN uni ON pr.w2 = uni.t
         |    CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  floor((sum(lp) / count(*)) * 1e4 + 0.5) / 1e4 AS avg_neg_logprob
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_unigram_logprob" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS t FROM documents),
         |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
         |tot AS (SELECT count(*) AS n FROM tok),
         |s AS (
         |  SELECT tok.doc_id, -ln(freq.c * 1.0 / tot.n) AS lp
         |  FROM tok JOIN freq USING (t) CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_tokens,
         |  floor((sum(lp) / count(*)) * 1e4 + 0.5) / 1e4 AS avg_neg_logprob
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // gram built positionally (ts[i..i+n-1]) exactly like the Spark
    // slice+concat_ws shape; the LIMIT set is deterministic because the
    // (df DESC, tf DESC, gram) ordering ends in a unique key
    "q_top_ngrams" -> {
      val gramExpr = (0 until TopNgramN).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |g AS (
         |  SELECT doc_id, $gramExpr AS gram
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - ${TopNgramN - 1})) AS i)),
         |a AS (
         |  SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM g GROUP BY 1)
         |SELECT gram, df, tf FROM a
         |ORDER BY df DESC, tf DESC, gram LIMIT $TopNgramK""".stripMargin
    },
    // per-doc signals from the shared fragments (TOKS / QualitySql /
    // NORM / EmailRe); mean quality via the integer-micro idiom so the
    // aggregate is order-free; HUGEINT sums cast per invariant 1
    "q_dataset_card" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    CAST(len($TOKS) AS BIGINT) AS n_toks,
         |    CAST(floor(($QualitySql) * 1e6 + 0.5) AS BIGINT) AS q_micro,
         |    md5($NORM) AS fp,
         |    CAST(regexp_matches(text, '$EmailRe') OR
         |         regexp_matches(text, 'https?://') AS BIGINT) AS has_pii
         |  FROM documents),
         |dupfp AS (SELECT fp FROM base GROUP BY fp HAVING count(*) >= 2),
         |f AS (
         |  SELECT base.*,
         |    CASE WHEN fp IN (SELECT fp FROM dupfp) THEN 1 ELSE 0 END AS is_dup
         |  FROM base),
         |per AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |    floor((CAST(sum(q_micro) AS BIGINT) / 1e6 / count(*)) * 1e4 + 0.5) / 1e4 AS mean_quality,
         |    CAST(sum(is_dup) AS BIGINT) AS dup_docs,
         |    CAST(sum(has_pii) AS BIGINT) AS pii_docs
         |  FROM f GROUP BY lang),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per)
         |SELECT lang, n_docs, n_tokens, mean_quality, dup_docs, pii_docs,
         |  floor((n_tokens / CAST(tot AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS token_share
         |FROM per, tot ORDER BY lang""".stripMargin,
    // grid ranks on the frequency-of-frequency frame: a count-c group
    // contributes the exact integer c·(2·t·cumBefore + t·(t+1)) to
    // 2·Σ rank·x — the q_gini formula with no token-grain ranking
    // exact integer sums over the term-frequency table; D and the
    // shares are one mirrored division each
    "q_lexical_diversity" ->
      s"""WITH tf AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($TOKS) AS t FROM documents) GROUP BY t),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS hapax_types,
         |    CAST(sum(c * (c - 1)) AS BIGINT) AS coinc
         |  FROM tf)
         |SELECT n_tokens, n_types, hapax_types,
         |  floor((CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         |    * 1e6 + 0.5) / 1e6 AS ttr,
         |  floor((CAST(hapax_types AS DOUBLE) / CAST(n_types AS DOUBLE))
         |    * 1e6 + 0.5) / 1e6 AS hapax_share,
         |  CASE WHEN n_tokens > 1 THEN
         |    floor((CAST(coinc AS DOUBLE)
         |      / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)))
         |      * 1e9 + 0.5) / 1e9 END AS simpson_d
         |FROM a""".stripMargin,
    "q_token_gini" ->
      s"""WITH tf AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($TOKS) AS t FROM documents) GROUP BY t),
         |fof AS (
         |  SELECT c, CAST(count(*) AS BIGINT) AS t_count
         |  FROM tf GROUP BY c),
         |g AS (
         |  SELECT c, t_count,
         |    CAST(coalesce(sum(t_count) OVER (ORDER BY c
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum
         |  FROM fof),
         |a AS (
         |  SELECT CAST(sum(t_count) AS BIGINT) AS n_types,
         |    CAST(sum(c * t_count) AS BIGINT) AS n_tokens,
         |    CAST(sum(c * (2 * t_count * cum + t_count * (t_count + 1)))
         |      AS BIGINT) AS two_srx
         |  FROM g)
         |SELECT n_types, n_tokens,
         |  floor((CAST(two_srx - (n_types + 1) * n_tokens AS DOUBLE)
         |    / CAST(n_types * n_tokens AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS gini
         |FROM a""".stripMargin,
    // pure integer regexp-match counts (identical Java/RE2 semantics
    // for these classes) into one mirrored fixed-order expression;
    // band labels the ROUNDED score
    "q_readability" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    CAST(len($TOKS) AS BIGINT) AS n_words,
         |    greatest(CAST(1 AS BIGINT),
         |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
         |      AS n_sentences,
         |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
         |      AS n_syllables
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n_words, n_sentences, n_syllables,
         |    floor((CAST('206.835' AS DOUBLE)
         |      - CAST('1.015' AS DOUBLE)
         |        * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         |      - CAST('84.6' AS DOUBLE)
         |        * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
         |      * 1e2 + 0.5) / 1e2 AS flesch
         |  FROM c)
         |SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
         |  CASE WHEN flesch >= 60.0 THEN 'easy'
         |    WHEN flesch >= 30.0 THEN 'standard'
         |    ELSE 'difficult' END AS band
         |FROM f ORDER BY doc_id""".stripMargin,
    // per-row micro-rounded ln's, six exact integer OLS sums, the
    // linreg fixed-order slope/r² (micro units cancel in the ratios)
    "q_zipf_fit" ->
      s"""WITH tf AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($TOKS) AS t FROM documents)
         |  GROUP BY t ORDER BY cnt DESC, t LIMIT ${TextStats.ZipfTopK}),
         |r AS (
         |  SELECT CAST(floor(ln(CAST(row_number() OVER
         |        (ORDER BY cnt DESC, t) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
         |      AS x,
         |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
         |  FROM tf),
         |g AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM r),
         |d AS (
         |  SELECT n,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covnum,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
         |  FROM g)
         |SELECT n AS n_types,
         |  CASE WHEN varx > 0.0 THEN
         |    floor((-(covnum / varx)) * 1e4 + 0.5) / 1e4 END AS alpha,
         |  CASE WHEN varx > 0.0 AND vary > 0.0 THEN
         |    floor(((covnum * covnum) / (varx * vary)) * 1e4 + 0.5) / 1e4
         |  END AS r2
         |FROM d""".stripMargin,
    // fixed quarter-width quality bands (min(3, floor(q·4)) via the
    // micro-long), dataset-card micro idioms for the mean and share
    "q_curriculum" ->
      s"""WITH base AS (
         |  SELECT CAST(len($TOKS) AS BIGINT) AS n_toks,
         |    CAST(floor(($QualitySql) * 1e6 + 0.5) AS BIGINT) AS q_micro
         |  FROM documents),
         |b AS (
         |  SELECT least(CAST(3 AS BIGINT),
         |      CAST(floor(CAST(q_micro AS DOUBLE) / 250000.0) AS BIGINT))
         |      AS band,
         |    n_toks, q_micro
         |  FROM base),
         |per AS (
         |  SELECT band, count(*) AS n_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |    floor((CAST(sum(q_micro) AS BIGINT) / 1e6 / count(*))
         |      * 1e4 + 0.5) / 1e4 AS mean_quality
         |  FROM b GROUP BY band),
         |w AS (
         |  SELECT band, n_docs, n_tokens, mean_quality,
         |    CAST(sum(n_tokens) OVER () AS BIGINT) AS tot
         |  FROM per)
         |SELECT band, n_docs, n_tokens, mean_quality,
         |  floor((n_tokens / CAST(tot AS DOUBLE)) * 1e4 + 0.5) / 1e4
         |    AS token_share
         |FROM w ORDER BY band""".stripMargin,
    // the simhash brute-force pair twin (q_simhash_neardup's oracle)
    // with unordered source attribution
    "q_source_overlap" ->
      s"""WITH $SimhashCtes,
         |pr AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3)
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b,
         |  count(*) AS n_pairs
         |FROM pr
         |JOIN documents da ON da.doc_id = pr.a
         |JOIN documents db ON db.doc_id = pr.b
         |GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin,
    // bigram/unigram counts from the same positional gram build as
    // q_top_ngrams; the PMI ratio is written in the IDENTICAL operation
    // order as the Spark side (left-assoc double products over exact
    // integer counts, one division, one ln) so only sub-ulp libm noise
    // remains under the 1e-4 rounding. w1/w2 recovered per gram via
    // min() — constant within a gram group because tokens contain no
    // spaces, so gram -> (w1, w2) is injective.
    "q_pmi_bigrams" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS ts FROM documents),
         |g AS (
         |  SELECT ts[i] || ' ' || ts[i+1] AS gram, ts[i] AS w1, ts[i+1] AS w2
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i)),
         |cb AS (
         |  SELECT gram, min(w1) AS w1, min(w2) AS w2,
         |    CAST(count(*) AS BIGINT) AS c_ab
         |  FROM g GROUP BY gram),
         |top AS (SELECT * FROM cb ORDER BY c_ab DESC, gram LIMIT $PmiK),
         |tok AS (SELECT unnest($TOKS) AS t FROM documents),
         |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
         |nu AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM tok),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM g)
         |SELECT top.gram, top.c_ab, ua.c AS c_a, ub.c AS c_b,
         |  ${rndSql("ln((CAST(top.c_ab AS DOUBLE) * CAST(nu.nu AS DOUBLE) * CAST(nu.nu AS DOUBLE)) / " +
            "(CAST(nb.nb AS DOUBLE) * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)))", 4)} AS pmi
         |FROM top
         |JOIN uni ua ON ua.t = top.w1
         |JOIN uni ub ON ub.t = top.w2
         |CROSS JOIN nu CROSS JOIN nb
         |ORDER BY c_ab DESC, gram""".stripMargin,
    // the subword regex is the SAME Scala constant on both sides; greedy
    // {1,N} alternation over disjoint classes resolves identically in
    // Java regex and RE2
    "q_token_estimate" ->
      s"""WITH e AS (
         |  SELECT doc_id, len($TOKS) AS n_ws_tokens,
         |    CAST(len(regexp_extract_all(text, '$SubwordRe')) AS BIGINT) AS n_subword_est
         |  FROM documents)
         |SELECT doc_id, n_ws_tokens, n_subword_est,
         |  ${rndSql("n_subword_est * 1.0 / nullif(n_ws_tokens, 0)", 4)} AS fertility
         |FROM e ORDER BY doc_id""".stripMargin,
    // the cascade SQL is GENERATED from the same FunnelRules seq as the
    // Spark plan — a threshold can only change in both engines at once
    "q_filter_funnel" -> {
      val cumSql = (1 to FunnelRules.size).map(i =>
        FunnelRules.take(i).map(_._3).mkString(" AND "))
      // coalesce mirrors the Spark side's zeros-on-empty declaration
      // (degenerate sweep r19: sum over ZERO rows is NULL on both
      // engines, and only Spark had the guard)
      val sums = cumSql.zipWithIndex.map { case (c, i) =>
        s"CAST(coalesce(sum(CASE WHEN $c THEN 1 ELSE 0 END), 0) AS BIGINT) AS s${i + 1}" }
      val rows = FunnelRules.zipWithIndex.map { case ((name, _, _), i) =>
        s"SELECT ${i + 1} AS stage, '$name' AS rule, s$i AS n_in, " +
          s"s$i - s${i + 1} AS n_dropped, s${i + 1} AS n_out FROM c" }
      s"""WITH f AS (
         |  SELECT n_chars, lang, len($TOKS) AS n_toks,
         |    ${rndSql(s"length(regexp_replace(text, '$WsRe', '', 'g')) * 1.0 / nullif(len($TOKS), 0)", 4)} AS avg_tok
         |  FROM documents),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS s0,
         |  ${sums.mkString(",\n  ")} FROM f)
         |${rows.mkString("\nUNION ALL ")}
         |ORDER BY stage""".stripMargin
    },
    "q_dedup_incremental" -> IncrementalSql,
    // identical-by-construction output (shared classify core over the
    // bucketed index artifacts) — the indexed twin shares the oracle,
    // which is exactly what proves the index write/read is lossless
    "q_dedup_indexed" -> IncrementalSql,
    "q_ngram_sim" -> jaccardSql(
      s"""t AS (SELECT doc_id, $TOKS AS ts FROM documents WHERE doc_id < 100),
         |sh AS (
         |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] AS s
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i))""".stripMargin, 0.05),
    "q_minhash_sig" ->
      s"""WITH $TOKHASH
         |SELECT doc_id,
         |  ${(0 until 8).map(i => s"min(${Dedup.minhashSqlExpr(i)}) AS mh$i").mkString(",\n  ")}
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $MinhashCtes
         |SELECT j.a, j.b, floor((jaccard) * 1e4 + 0.5) / 1e4 AS jaccard
         |FROM j JOIN cand ON j.a = cand.a AND j.b = cand.b
         |WHERE jaccard >= 0.8 ORDER BY j.a, j.b""".stripMargin,
    "q_dedup_groups" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |${ccSql("canonical_id")}
         |SELECT d.doc_id, coalesce(lbl.canonical_id, d.doc_id) AS canonical_id
         |FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.id
         |WHERE d.doc_id < 100 ORDER BY d.doc_id""".stripMargin,
    // group-aware split: the q_dedup_groups canonical labels fed through
    // the q_hash_split md5-bucket arithmetic, keyed on canonical_id
    "q_group_split" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |${ccSql("canonical_id")},
         |c AS (
         |  SELECT d.doc_id, coalesce(lbl.canonical_id, d.doc_id) AS canonical_id
         |  FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.id
         |  WHERE d.doc_id < 100)
         |SELECT doc_id, canonical_id,
         |  CASE WHEN ('0x' || substr(md5(CAST(canonical_id AS VARCHAR) || '|gsplit'), 1, 8))::BIGINT % 100 < 80 THEN 'train'
         |       WHEN ('0x' || substr(md5(CAST(canonical_id AS VARCHAR) || '|gsplit'), 1, 8))::BIGINT % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_content_filter" ->
      ("""WITH f AS (
        |  SELECT doc_id,
        |    CAST(regexp_matches(text, '""" + EmailRe + """') AS INT) AS has_email,
        |    CAST(regexp_matches(text, 'https?://') AS INT) AS has_url,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / nullif(length(text), 0) AS dr
        |  FROM documents)
        |SELECT doc_id, has_email, has_url,
        |  floor((dr) * 1e4 + 0.5) / 1e4 AS digit_ratio,
        |  CAST(has_email = 0 AND has_url = 0 AND dr < 0.3 AS INT) AS keep
        |FROM f ORDER BY doc_id""").stripMargin,
    "q_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS t FROM documents),
         |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dlen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
         |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.t,
         |    (tf.tf * 1.0 / dlen.dl) * ln((nd.n_docs + 1.0) / (dfreq.df + 1.0)) AS tfidf
         |  FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (t) CROSS JOIN nd
         |  WHERE tf.doc_id < 20),
         |r AS (
         |  SELECT doc_id, t, tfidf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, t) AS rank
         |  FROM scored)
         |SELECT doc_id, t AS term, floor((tfidf) * 1e6 + 0.5) / 1e6 AS tfidf, rank
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_simhash" ->
      s"""WITH $SimhashCtes
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,
    "q_simhash_wide" ->
      s"""WITH $SimhashWideCtes
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,
    // brute-force all-pairs twin of the wide 4x15-bit banded shape —
    // equal by the same pigeonhole recall guarantee
    "q_simhash_wide_neardup" ->
      s"""WITH $SimhashWideCtes
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS dist
         |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY a, b""".stripMargin,
    // brute-force twin of the 3x20-bit rebanding at its guaranteed
    // radius (Hamming <= 2); the signature CTE is shared VERBATIM with
    // the 4x15 twin — only the radius moves, because the rebanding
    // changes candidate generation, never the signature
    "q_simhash_wide20_neardup" ->
      s"""WITH $SimhashWideCtes
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS dist
         |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 2
         |ORDER BY a, b""".stripMargin,
    "q_simhash_neardup" ->
      // brute-force all-pairs twin of the banded Spark shape — equal by
      // the pigeonhole recall guarantee (see qSimhashNeardup)
      s"""WITH $SimhashCtes
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS dist
         |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY a, b""".stripMargin,
    // degree rollup over the same brute-force pair twin; the LEFT JOIN
    // keeps zero-degree docs so the 0-row is the clean-corpus count
    "q_neardup_degree" ->
      s"""WITH $SimhashCtes,
         |pairs AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3),
         |ends AS (
         |  SELECT a AS doc_id FROM pairs
         |  UNION ALL SELECT b AS doc_id FROM pairs),
         |deg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
         |  FROM ends GROUP BY doc_id),
         |d AS (
         |  SELECT coalesce(deg.degree, CAST(0 AS BIGINT)) AS degree
         |  FROM documents LEFT JOIN deg USING (doc_id))
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
         |FROM d GROUP BY degree ORDER BY degree""".stripMargin,
    // candidate CTE = the q_simhash_neardup brute-force twin; the verify
    // stage recomputes UNBOUNDED levenshtein (DuckDB has no threshold
    // variant) — equality with Spark's threshold-bounded DP is exactly
    // what the gate proves. Same length-difference prefilter (a
    // levenshtein lower bound, so it never changes the answer).
    "q_editdist_neardup" ->
      s"""WITH $SimhashCtes,
         |cand AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3),
         |p AS (SELECT doc_id, substring(text, 1, ${TextDedup.EdPrefix}) AS p FROM documents)
         |SELECT c.a, c.b, CAST(levenshtein(pa.p, pb.p) AS INT) AS lev
         |FROM cand c JOIN p pa ON pa.doc_id = c.a JOIN p pb ON pb.doc_id = c.b
         |WHERE abs(length(pa.p) - length(pb.p)) <= ${TextDedup.EdMax}
         |  AND levenshtein(pa.p, pb.p) <= ${TextDedup.EdMax}
         |ORDER BY a, b""".stripMargin,
    "q_multimodal_meta" ->
      // encode(), not CAST(text AS BLOB): DuckDB's cast ERRORS on any
      // non-ASCII character ("must be escaped with hex codes") while
      // encode() is the UTF-8 byte view Spark's octet_length measures
      // (hostile sweep r18: the unicode fixture doc broke the oracle)
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(floor((octet_length(encode(text)) + 255) / 256) AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
