package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard02 {
  val defs: Map[String, String] = Map(

    // Exact-integer resampling decision replayed in HUGEINT arithmetic.
    "q68_temperature_sample" ->
      """WITH r AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |m AS (SELECT min(n_docs) AS n_min FROM r),
        |u AS (
        |  SELECT lang,
        |         CAST(concat('0x', substr(md5('samp#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS u
        |  FROM documents
        |), k AS (
        |  SELECT u.lang, r.n_docs,
        |         CASE WHEN CAST(u.u AS HUGEINT) * u.u * r.n_docs
        |                 < CAST(m.n_min AS HUGEINT) * 79228162514264337593543950336
        |              THEN 1 ELSE 0 END AS keep
        |  FROM u JOIN r USING (lang), m
        |)
        |SELECT lang, CAST(min(n_docs) AS BIGINT) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_kept
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q69_event_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events
        |), t1 AS (
        |  SELECT user_id, min(ts) AS t FROM ev WHERE event_type = 'view' GROUP BY user_id
        |), t2 AS (
        |  SELECT ev.user_id, min(ev.ts) AS t FROM ev JOIN t1 USING (user_id)
        |  WHERE ev.event_type = 'click' AND ev.ts > t1.t GROUP BY ev.user_id
        |), t3 AS (
        |  SELECT ev.user_id, min(ev.ts) AS t FROM ev JOIN t2 USING (user_id)
        |  WHERE ev.event_type = 'purchase' AND ev.ts > t2.t GROUP BY ev.user_id
        |)
        |SELECT * FROM (
        |  SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM t1
        |  UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM t2
        |  UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM t3
        |) ORDER BY step""".stripMargin,

    // Reachability via recursive CTE = independent ground truth for the
    // large-star/small-star label propagation (min reachable node id).
    // Members capped at the 20 smallest ids (mirrors the Spark side's
    // bounded sample; n_docs stays exact) — aggregates skip the NULLs the
    // CASE emits past the cap.
    "q66_dup_clusters" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |lblr AS (
         |  SELECT u, l, row_number() OVER (PARTITION BY l ORDER BY u) AS rk FROM lbl
         |)
         |SELECT l AS cluster_id, count(*) AS n_docs,
         |       string_agg(CASE WHEN rk <= 20 THEN CAST(u AS VARCHAR) END, ',' ORDER BY u) AS members
         |FROM lblr GROUP BY l ORDER BY cluster_id""".stripMargin,

    // Cross-doc repeated-3-gram fraction (distinct shingles per doc, shared
    // iff present in >1 doc).
    "q71_crossdoc_ngrams" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |sh0 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(ws) >= 3
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]) for i in range(0, len(ws)-2)]
        |         ELSE [text] END) AS s
        |  FROM w
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM sh0
        |), nd AS (SELECT sk, count(*) AS nd FROM sh GROUP BY sk)
        |SELECT sh.doc_id, count(*) AS n_grams_uniq,
        |       CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |       round(CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS shared_ratio
        |FROM sh JOIN nd USING (sk)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    // Corpus-unigram-LM scoring: per-word natural-log prob quantized to
    // exact 1e-6 integers (DuckDB ln = Spark log), summed exactly per doc.
    "q72_unigram_logprob" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0
        |), dw AS (SELECT doc_id, w, count(*) AS n FROM words GROUP BY doc_id, w),
        |wc AS (SELECT w, CAST(sum(n) AS BIGINT) AS cnt FROM dw GROUP BY w),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM wc),
        |sc AS (
        |  SELECT dw.doc_id, dw.n,
        |         CAST(round(ln(CAST(wc.cnt AS DOUBLE) / t.total) * 1000000) AS BIGINT) AS lp
        |  FROM dw JOIN wc USING (w), t
        |)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
        |       round(CAST(sum(n * lp) AS DOUBLE) / sum(n) / 1000000.0, 6) AS mean_logprob
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Deterministic per-group top-K sample by md5 order.
    "q73_group_sample" ->
      """WITH u AS (
        |  SELECT lang, doc_id,
        |         CAST(concat('0x', substr(md5('gs#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS u
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS BIGINT) AS rk
        |  FROM u
        |)
        |SELECT lang, rk, doc_id FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    // Exact-then-near composition: MinHash/LSH over the distinct texts'
    // min-id keepers only (mirrors Dedup.nearDupOnUniques).
    "q70_neardup_uniques" ->
      s"""WITH u_docs AS (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text),
         |${minhashChain("u_docs")}
         |SELECT doc_a, doc_b, n_bands FROM cand ORDER BY doc_a, doc_b""".stripMargin,

    // Exact 5-gram decontamination: train docs sharing a hashed word
    // 5-gram with any eval (src0) doc; <5-word docs contribute the whole
    // text (mirrors WordShingles' fallback).
    "q74_exact_decontam" ->
      """WITH w AS (SELECT doc_id, text, source, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, source, unnest(
        |    CASE WHEN len(ws) >= 5
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5])
        |               for i in range(0, len(ws)-4)]
        |         ELSE [text] END) AS s
        |  FROM w
        |), hg AS (
        |  SELECT doc_id, source,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM g
        |), eg AS (SELECT DISTINCT sk FROM hg WHERE source = 'src0'),
        |tg AS (SELECT DISTINCT doc_id, sk FROM hg WHERE source <> 'src0')
        |SELECT tg.doc_id, count(*) AS n_shared_grams
        |FROM tg JOIN eg USING (sk)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // MinHash Jaccard estimate: fraction of the 8 signature positions
    // agreeing, for every LSH candidate pair.
    "q75_jaccard_estimate" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(nm AS BIGINT) AS n_match,
         |       round(CAST(nm AS DOUBLE) / 8.0, 6) AS est_jaccard
         |FROM nm ORDER BY doc_a, doc_b""".stripMargin,

    // Heaps'-law vocabulary growth: a word belongs to the bucket of its
    // first-occurrence doc; integer `//` mirrors Spark `div` exactly.
    "q76_vocab_growth" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0
        |), fw AS (SELECT w, min(doc_id) AS first_doc FROM words GROUP BY w),
        |b AS (
        |  SELECT first_doc // 100 AS bucket, count(*) AS n_new_words
        |  FROM fw GROUP BY 1
        |)
        |SELECT bucket, n_new_words,
        |       CAST(sum(n_new_words) OVER (ORDER BY bucket
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
        |FROM b ORDER BY bucket""".stripMargin,

    // Corpus-bigram-LM scoring: bigrams and their context word hash to
    // 48-bit keys; ln-probs quantized to exact 1e-6 integers (q72 rule).
    "q77_bigram_logprob" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |bg0 AS (
        |  SELECT doc_id, unnest([concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]) AS s
        |  FROM w WHERE len(ws) >= 2
        |), bg AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk,
        |         CAST(concat('0x', substr(md5(split_part(s, ' ', 1)), 1, 12)) AS BIGINT) AS wk
        |  FROM bg0
        |), dbg AS (SELECT doc_id, sk, wk, count(*) AS n FROM bg GROUP BY 1, 2, 3),
        |bc AS (SELECT sk, wk, CAST(sum(n) AS BIGINT) AS cb FROM dbg GROUP BY 1, 2),
        |ctx AS (SELECT wk, CAST(sum(cb) AS BIGINT) AS cw FROM bc GROUP BY 1),
        |lp AS (
        |  SELECT bc.sk, bc.wk,
        |         CAST(round(ln(CAST(bc.cb AS DOUBLE) / ctx.cw) * 1000000) AS BIGINT) AS lp
        |  FROM bc JOIN ctx USING (wk)
        |)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |       round(CAST(sum(n * lp.lp) AS DOUBLE) / sum(n) / 1000000.0, 6) AS mean_logprob
        |FROM dbg JOIN lp USING (sk, wk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Cross-source near-dup matrix: candidate pairs rolled up by the
    // unordered pair of their docs' sources.
    "q78_crosssource_dups" ->
      s"""$minhashCte
         |SELECT least(da.source, db.source) AS source_x,
         |       greatest(da.source, db.source) AS source_y,
         |       count(*) AS n_pairs
         |FROM cand
         |JOIN documents da ON cand.doc_a = da.doc_id
         |JOIN documents db ON cand.doc_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Dup-cluster size distribution over the same recursive-CTE ground
    // truth as q66: components per size, docs removable at that size.
    "q79_cluster_sizes" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |sizes AS (SELECT l, count(*) AS sz FROM lbl GROUP BY l)
         |SELECT sz AS cluster_size, count(*) AS n_clusters,
         |       CAST(sum(sz - 1) AS BIGINT) AS n_removable
         |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin,

    // Semantic decontamination: q67's hyperplane-LSH chain, restricted to
    // eval (label 0) × train (label <> 0) band matches, then exact-cosine
    // verified and rolled up per train vector.
    "q80_semantic_decontam" ->
      s"""$normCte,
         |pl AS (
         |  SELECT p, [CASE WHEN (CAST(concat('0x', substr(md5('hp-' || CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1)) AS INT) % 2) = 0
         |                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
         |             for d in range(0, 64)] AS c
         |  FROM (SELECT unnest(range(0, 32)) AS p)
         |), bits AS (
         |  SELECT n.vec_id, pl.p,
         |         CASE WHEN list_sum(list_transform(range(1, len(n.e)+1), i -> n.e[i]*pl.c[i])) >= 0
         |              THEN 1 ELSE 0 END AS bit
         |  FROM n, pl
         |), sig AS (
         |  SELECT vec_id, CAST(sum(bit * (1::BIGINT << p)) AS BIGINT) AS sig FROM bits GROUP BY vec_id
         |), bands AS (
         |  SELECT vec_id, b, (sig >> (b*8)) & 255 AS bv
         |  FROM sig, (SELECT unnest(range(0, 4)) AS b)
         |), cand AS (
         |  SELECT DISTINCT e.vec_id AS eval_id, t.vec_id AS train_id
         |  FROM bands e
         |  JOIN bands t ON e.b = t.b AND e.bv = t.bv
         |  JOIN embeddings le ON le.vec_id = e.vec_id AND le.label = 0
         |  JOIN embeddings lt ON lt.vec_id = t.vec_id AND lt.label <> 0
         |), ver AS (
         |  SELECT c.train_id,
         |         round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])) / (a.nrm*b.nrm), 6) AS sim
         |  FROM cand c JOIN n a ON a.vec_id = c.eval_id JOIN n b ON b.vec_id = c.train_id
         |)
         |SELECT train_id AS vec_id, count(*) AS n_eval_matches, max(sim) AS max_sim
         |FROM ver WHERE sim >= 0.4
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Quality-threshold survival curve over the shared quality CTE; the
    // decile-DESC running sum counts docs surviving a cut at that decile.
    "q81_quality_survival" ->
      s"""WITH $qualityCte,
         |d AS (SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS decile FROM qs),
         |g AS (SELECT decile, count(*) AS n_docs FROM d GROUP BY 1)
         |SELECT decile, n_docs,
         |       CAST(sum(n_docs) OVER (ORDER BY decile DESC
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_surviving
         |FROM g ORDER BY decile""".stripMargin,

    "q41_asof_join" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id, event_type, value
        |  FROM events
        |), l AS (
        |  SELECT user_id, ts, 1 AS side, event_id AS err_id,
        |         NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value
        |  FROM ev WHERE event_type = 'error'
        |), r AS (
        |  SELECT user_id, ts, 0 AS side, NULL::BIGINT AS err_id, event_id AS p_id, value AS p_value
        |  FROM ev WHERE event_type = 'purchase'
        |), u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |c AS (
        |  SELECT user_id, ts, side, err_id,
        |         last_value(CASE WHEN side = 0
        |                         THEN struct_pack(p_id := p_id, p_value := p_value) END
        |                    IGNORE NULLS) OVER w AS carry
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, p_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, epoch_us(ts) AS ts_us, err_id,
        |       carry.p_id AS asof_p_id, carry.p_value AS asof_p_value
        |FROM c WHERE side = 1 ORDER BY user_id, ts_us, err_id""".stripMargin,

    "q42_range_join" ->
      s"""WITH $sessionChain,
         |sess AS (
         |  SELECT user_id, sess_idx,
         |         CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us
         |  FROM g GROUP BY user_id, sess_idx
         |), err AS (
         |  SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us, event_id
         |  FROM events WHERE event_type = 'error'
         |)
         |SELECT err.user_id, err.event_id, sess.sess_idx
         |FROM err JOIN sess
         |  ON err.user_id = sess.user_id AND err.us BETWEEN sess.start_us AND sess.end_us
         |ORDER BY err.user_id, err.event_id""".stripMargin,

    // JSONL round-trip: the oracle aggregates the parquet original — any
    // lossy JSON escaping in the Spark sink/scan breaks the hash.
    "q82_jsonl_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
        |       count(DISTINCT doc_id) AS n_ids
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // One Lloyd iteration over the shared IVF assignment: exact quantized
    // component sums (q61 pattern) → order-invariant means.
    "q83_kmeans_step" ->
      s"""$ivfAssignCte,
         |x AS (
         |  SELECT bucket, unnest(list_transform(range(1, len(e)+1),
         |                                       i -> struct_pack(pos := i - 1, val := e[i]))) AS u
         |  FROM asg
         |), s AS (
         |  SELECT bucket AS cent_id, u.pos AS pos,
         |         sum(CAST(round(u.val * 1000000) AS BIGINT)) AS sq,
         |         count(*) AS n
         |  FROM x GROUP BY 1, 2
         |)
         |SELECT cent_id, CAST(pos AS BIGINT) AS pos, n AS n_members,
         |       round(CAST(sq AS DOUBLE) / (n * 1000000.0), 6) AS mean_val
         |FROM s ORDER BY cent_id, pos""".stripMargin,

    // kNN majority vote: rank cosine neighbors, count labels among top-k,
    // argmax votes with smaller-label tie-break.
    "q84_knn_classify" ->
      s"""$normCte,
         |q AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn FROM n WHERE vec_id < 25),
         |s AS (
         |  SELECT q.query_id, n.vec_id AS cand_id, le.label AS cand_label,
         |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.e[i])) / (q.qn * n.nrm), 6) AS sim
         |  FROM q CROSS JOIN n JOIN embeddings le ON le.vec_id = n.vec_id
         |  WHERE n.vec_id <> q.query_id
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rk
         |  FROM s
         |), vt AS (
         |  SELECT query_id, cand_label, count(*) AS n_votes, max(sim) AS top_sim
         |  FROM r WHERE rk <= 10 GROUP BY 1, 2
         |), b AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, cand_label) AS vr
         |  FROM vt
         |)
         |SELECT query_id, CAST(cand_label AS BIGINT) AS pred_label, n_votes, top_sim
         |FROM b WHERE vr = 1 ORDER BY query_id""".stripMargin,

    // Median/MAD outlier flags; the threshold uses the ROUNDED mad, same
    // as the Spark side, so the > comparison sees identical doubles.
    "q85_mad_outliers" ->
      """WITH med AS (
        |  SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM documents GROUP BY 1
        |), dev AS (
        |  SELECT d.lang, abs(CAST(d.n_chars AS DOUBLE) - m.med) AS adev, m.med AS med
        |  FROM documents d JOIN med m ON m.lang = d.lang
        |), st AS (
        |  SELECT lang, count(*) AS n_rows, round(min(med), 6) AS median_val,
        |         round(quantile_cont(adev, 0.5), 6) AS mad
        |  FROM dev GROUP BY 1
        |)
        |SELECT s.lang, s.n_rows, s.median_val, s.mad,
        |       CAST(sum(CASE WHEN dev.adev > s.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN st s ON s.lang = dev.lang
        |GROUP BY 1, 2, 3, 4 ORDER BY s.lang""".stripMargin,

    // Add-one log-odds with Fightin'-Words variance; each ln quantized to
    // a 1e-6 integer BEFORE the delta subtraction (q72 discipline).
    "q86_logodds_terms" ->
      """WITH wr AS (
        |  SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents
        |), wf AS (SELECT grp, w FROM wr WHERE length(w) > 0),
        |wc AS (SELECT grp, w, count(*) AS y FROM wf GROUP BY 1, 2),
        |wt AS (SELECT w, CAST(sum(y) AS BIGINT) AS yw FROM wc GROUP BY 1),
        |gt AS (SELECT grp, CAST(sum(y) AS BIGINT) AS ng FROM wc GROUP BY 1),
        |na AS (SELECT CAST(sum(y) AS BIGINT) AS nn, count(DISTINCT w) AS vv FROM wc),
        |sc AS (
        |  SELECT wc.grp, wc.w, wc.y,
        |         CAST(round(ln(CAST(wc.y + 1 AS DOUBLE)
        |                       / CAST(gt.ng + na.vv - wc.y - 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |       - CAST(round(ln(CAST(wt.yw - wc.y + 1 AS DOUBLE)
        |                       / CAST(na.nn - gt.ng + na.vv - (wt.yw - wc.y) - 1 AS DOUBLE)) * 1000000) AS BIGINT) AS dq,
        |         1.0 / CAST(wc.y + 1 AS DOUBLE) + 1.0 / CAST(wt.yw - wc.y + 1 AS DOUBLE) AS s2
        |  FROM wc JOIN wt USING (w) JOIN gt USING (grp) CROSS JOIN na
        |), z AS (
        |  SELECT grp, w, y, round(CAST(dq AS DOUBLE) / 1000000.0 / sqrt(s2), 6) AS z FROM sc
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY grp ORDER BY z DESC, w) AS BIGINT) AS rk
        |  FROM z
        |)
        |SELECT grp AS source, rk, w AS term, y AS n_occurrences, z
        |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // Source-pair Jaccard over hashed 3-gram sets (q74's gram + 48-bit
    // key construction at n=3).
    "q87_source_jaccard" ->
      """WITH w AS (
        |  SELECT source, text, string_split(text, ' ') AS ws FROM documents WHERE text IS NOT NULL
        |), g AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(ws) >= 3
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]) for i in range(0, len(ws)-2)]
        |         ELSE [text] END) AS s
        |  FROM w
        |), hg AS (
        |  SELECT DISTINCT source, CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS g FROM g
        |), sz AS (SELECT source, count(*) AS sz FROM hg GROUP BY 1),
        |i AS (
        |  SELECT x.source AS source_x, y.source AS source_y, count(*) AS n_shared_grams
        |  FROM hg x JOIN hg y ON x.g = y.g AND x.source < y.source
        |  GROUP BY 1, 2
        |)
        |SELECT source_x, source_y, n_shared_grams,
        |       round(CAST(n_shared_grams AS DOUBLE) / (sx.sz + sy.sz - n_shared_grams), 6) AS jaccard
        |FROM i JOIN sz sx ON sx.source = source_x JOIN sz sy ON sy.source = source_y
        |ORDER BY source_x, source_y""".stripMargin,

    // A-ES weighted sample: ln(u)/w keys quantized to 1e-6 integers; the
    // md5 uniform and quality weight are both engine-portable.
    "q89_weighted_sample" ->
      s"""WITH $qualityCte,
         |k AS (
         |  SELECT lang, doc_id, quality,
         |         CAST(round(ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
         |                       / 281474976710656.0)
         |                    / quality * 1000000) AS BIGINT) AS skey
         |  FROM qs
         |), r AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id) AS BIGINT) AS rk
         |  FROM k
         |)
         |SELECT lang, rk, doc_id, quality, skey FROM r WHERE rk <= 5
         |ORDER BY lang, rk""".stripMargin,

    // Word-distribution entropy: per-term y·ln(y) quantized to 1e-6
    // integers, summed exactly; H = ln(n) − Σ/1e6/n.
    "q90_source_entropy" ->
      """WITH wr AS (
        |  SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents
        |), wc AS (
        |  SELECT grp, w, count(*) AS y FROM wr WHERE length(w) > 0 GROUP BY 1, 2
        |), s AS (
        |  SELECT grp, CAST(sum(y) AS BIGINT) AS n_tokens, count(*) AS n_vocab,
        |         CAST(sum(CAST(round(CAST(y AS DOUBLE) * ln(CAST(y AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS st
        |  FROM wc GROUP BY 1
        |)
        |SELECT grp AS source, n_tokens, n_vocab,
        |       round(ln(CAST(n_tokens AS DOUBLE)) - CAST(st AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE), 6) AS entropy_nats
        |FROM s ORDER BY source""".stripMargin,

    // Char-shingle decontamination: eval windows at every position,
    // train windows every 16th (spans >= 47 chars always detected);
    // substr past the end yields the prefix in both engines.
    "q91_char_decontam" ->
      """WITH eg AS (
        |  SELECT DISTINCT CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM (
        |    SELECT unnest([substr(text, i, 32)
        |                   for i in range(1, greatest(length(text) - 31, 1) + 1)]) AS s
        |    FROM documents WHERE text IS NOT NULL AND source = 'src0')
        |), tg AS (
        |  SELECT DISTINCT doc_id, CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM (
        |    SELECT doc_id,
        |           unnest([substr(text, i, 32)
        |                   for i in range(1, greatest(length(text) - 31, 1) + 1, 16)]) AS s
        |    FROM documents WHERE text IS NOT NULL AND source <> 'src0')
        |)
        |SELECT tg.doc_id, count(*) AS n_shared_windows
        |FROM tg JOIN eg USING (sk)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Dedup × quality: per quality decile, docs and cluster-loser counts
    // (losers via the recursive-CTE reachability chain, q32's rule).
    "q92_dedup_quality" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLosersChain,
         |$qualityCte,
         |dd AS (
         |  SELECT d.doc_id, least(CAST(floor(qs.quality * 10) AS BIGINT), 9) AS decile,
         |         CASE WHEN EXISTS (SELECT 1 FROM losers l WHERE l.doc_b = d.doc_id)
         |              THEN 1 ELSE 0 END AS lost
         |  FROM documents d JOIN qs ON qs.doc_id = d.doc_id
         |)
         |SELECT decile, count(*) AS n_docs,
         |       CAST(sum(lost) AS BIGINT) AS n_removed,
         |       round(CAST(sum(lost) AS DOUBLE) / count(*), 6) AS removal_rate
         |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin,

    // Zipf slope: quantized ln(rank)/ln(freq), HUGEINT regression algebra
    // (mirrors Spark's decimal38), one rounded double division.
    "q93_zipf_slope" ->
      """WITH wr AS (
        |  SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents
        |), wc AS (
        |  SELECT grp, w, count(*) AS y FROM wr WHERE length(w) > 0 GROUP BY 1, 2
        |), r AS (
        |  SELECT grp, y, row_number() OVER (PARTITION BY grp ORDER BY y DESC, w) AS rk
        |  FROM wc
        |), t AS (
        |  SELECT grp,
        |         CAST(round(ln(CAST(rk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |         CAST(round(ln(CAST(y AS DOUBLE)) * 1000000) AS BIGINT) AS yl
        |  FROM r WHERE rk <= 500
        |), s AS (
        |  SELECT grp, CAST(count(*) AS HUGEINT) AS n,
        |         sum(CAST(x AS HUGEINT)) AS sx,
        |         sum(CAST(yl AS HUGEINT)) AS sy,
        |         sum(CAST(x AS HUGEINT) * CAST(yl AS HUGEINT)) AS sxy,
        |         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        |  FROM t GROUP BY 1
        |)
        |SELECT grp AS source, CAST(n AS BIGINT) AS n_terms,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
        |FROM s ORDER BY source""".stripMargin,

    // IVF bucket-balance profile over the shared assignment CTE.
    // Mixture apply: keep iff u·G·ntok_s < Ntok·2^48 in exact HUGEINT
    // algebra (the q68 cross-multiply discipline on q99's weight).
    // Exact φ-heavy-hitters: the CMS prefilter is internal to the Spark
    // side (never undercounts → candidate superset → exact recount), so
    // the oracle is the plain exact formulation. Integer threshold
    // (N + 999) // 1000 = ⌈N/1000⌉ — no double 0.001 rounding hazard.
    "q105_heavy_hitters" ->
      """WITH w AS (SELECT text, string_split(text, ' ') AS ws
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT unnest(
        |    CASE WHEN len(ws) >= 2
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
        |         ELSE [text] END) AS gram
        |  FROM w
        |), t AS (SELECT count(*) AS total, (count(*) + 999) // 1000 AS thr FROM g)
        |SELECT gram, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(count(*) AS DOUBLE) / (SELECT total FROM t), 6) AS share
        |FROM g GROUP BY gram HAVING count(*) >= (SELECT thr FROM t)
        |ORDER BY gram""".stripMargin,

    "q106_shard_assignment" ->
      """WITH s AS (
        |  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 64 AS shard,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS pieces,
        |         n_chars
        |  FROM documents
        |), p AS (
        |  SELECT shard, count(*) AS n_docs, sum(pieces) AS n_tokens,
        |         sum(n_chars) AS n_chars_total
        |  FROM s GROUP BY shard
        |)
        |SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_chars_total AS BIGINT) AS n_chars_total,
        |       round(CAST(n_tokens AS DOUBLE) * 64 / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS load_ratio
        |FROM p ORDER BY shard""".stripMargin,

    // est (q75 chain) LEFT JOIN exact (q23 chain, inter=0 pairs KEPT as
    // exact 0) → per-n_match calibration buckets.
    "q107_lsh_calibration" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |), bg AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(ws) >= 2
         |           THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
         |           ELSE [text] END) AS sh
         |    FROM w)
         |), sizes AS (SELECT doc_id, count(*) AS sz FROM bg GROUP BY doc_id),
         |inter AS (
         |  SELECT n.doc_a, n.doc_b, count(*) AS i
         |  FROM nm n
         |  JOIN bg a ON a.doc_id = n.doc_a
         |  JOIN bg b ON b.doc_id = n.doc_b AND b.sh = a.sh
         |  GROUP BY 1, 2
         |), pj AS (
         |  SELECT n.nm,
         |         CASE WHEN i.i IS NULL THEN 0.0
         |              ELSE round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) END AS exact_j
         |  FROM nm n
         |  LEFT JOIN inter i ON i.doc_a = n.doc_a AND i.doc_b = n.doc_b
         |  JOIN sizes sa ON sa.doc_id = n.doc_a
         |  JOIN sizes sb ON sb.doc_id = n.doc_b
         |)
         |SELECT CAST(nm AS BIGINT) AS n_match,
         |       round(CAST(nm AS DOUBLE) / 8.0, 6) AS est_jaccard,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(CASE WHEN exact_j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |       min(exact_j) AS min_jaccard,
         |       max(exact_j) AS max_jaccard,
         |       round(CAST(sum(CASE WHEN exact_j >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS "precision"
         |FROM pj GROUP BY nm ORDER BY n_match""".stripMargin,

    "q108_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_pieces,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |       round(CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE)
        |             / sum(len(string_split(text, ' '))), 6) AS fertility,
        |       round(CAST(sum(n_chars) AS DOUBLE)
        |             / sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))), 6) AS chars_per_piece
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q116_kmeans_fit" -> kmeansSql(k = 8, iters = 3),

    "q122_bpe_merges" -> bpeSql(numMerges = 8),

    "q123_bpe_apply" -> bpeApplySql(numMerges = 8),

    "q117_cluster_purity" -> kmeansPuritySql(k = 8, iters = 3),

    // Round-trip through the ORC zone is lossless, so the oracle is the
    // same aggregation over the parquet original (q57/q82 discipline).
    "q120_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       count(DISTINCT doc_id) AS n_ids
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Bootstrap weights replay the SAME integer thresholds the Spark side
    // uses (interpolated from Stats.PoissonCum48, not retyped).
    "q121_bootstrap_ci" -> {
      val cases = graft.ops.Stats.PoissonCum48.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("\n         ")
      s"""WITH r AS (
         |  SELECT lang, doc_id,
         |         CAST(round(CAST(n_chars AS DOUBLE) * 1000000) AS BIGINT) AS v6,
         |         unnest(range(0, 32)) AS b
         |  FROM documents
         |), wts AS (
         |  SELECT lang, b, v6,
         |         CASE $cases ELSE 9 END AS w
         |  FROM (SELECT *,
         |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#b' || CAST(b AS VARCHAR)), 1, 12)) AS BIGINT) AS u
         |        FROM r)
         |), m AS (
         |  SELECT lang, b,
         |         (CAST(sum(w * v6) AS DOUBLE) / CAST(sum(w) AS BIGINT)) / 1000000.0 AS mean_b
         |  FROM wts GROUP BY 1, 2 HAVING sum(w) > 0
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_reps,
         |       round(quantile_cont(mean_b, 0.025), 6) AS ci_lo,
         |       round(quantile_cont(mean_b, 0.975), 6) AS ci_hi
         |FROM m GROUP BY 1 ORDER BY lang""".stripMargin
    },

    // Quality-keeper per cluster: rank members by (quality desc, id), the
    // rank-1 row is the keeper; min-id losers come from the label itself.
    "q126_keeper_policy" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |$qualityCte,
         |mem AS (
         |  SELECT lbl.u, lbl.l, q.quality,
         |         row_number() OVER (PARTITION BY lbl.l ORDER BY q.quality DESC, lbl.u) AS rn
         |  FROM lbl JOIN qs q ON q.doc_id = lbl.u
         |)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN m.u IS NOT NULL AND m.u <> m.l THEN 0 ELSE 1 END) AS BIGINT) AS n_kept_minid,
         |       CAST(sum(CASE WHEN m.u IS NOT NULL AND m.rn > 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_kept_quality
         |FROM documents d LEFT JOIN mem m ON m.u = d.doc_id
         |GROUP BY 1 ORDER BY source""".stripMargin,

    "q127_dup_degree" ->
      s"""$minhashCte,
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT doc_a AS node FROM cand
         |    UNION ALL
         |    SELECT doc_b AS node FROM cand)
         |  GROUP BY node
         |)
         |SELECT deg AS degree, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin,

    "q125_blocking_overlap" ->
      s"""$minhashCte,
         |lshp AS (SELECT doc_a, doc_b FROM cand),
         |k AS (
         |  SELECT doc_id AS id,
         |         substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |                                    ' +', ' ', 'g')), 1, 24) AS key
         |  FROM documents WHERE text IS NOT NULL
         |), r AS (
         |  SELECT id, key, substr(key, 1, 6) AS blk,
         |         row_number() OVER (PARTITION BY substr(key, 1, 6) ORDER BY key, id) AS rn
         |  FROM k
         |), snmp AS (
         |  SELECT DISTINCT least(a.id, b.id) AS doc_a, greatest(a.id, b.id) AS doc_b
         |  FROM r a JOIN r b ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
         |), agree AS (SELECT doc_a, doc_b FROM lshp INTERSECT SELECT doc_a, doc_b FROM snmp),
         |c AS (
         |  SELECT (SELECT count(*) FROM lshp) AS n_lsh,
         |         (SELECT count(*) FROM snmp) AS n_snm,
         |         (SELECT count(*) FROM agree) AS n_both
         |)
         |SELECT CAST(n_lsh AS BIGINT) AS n_lsh, CAST(n_snm AS BIGINT) AS n_snm,
         |       CAST(n_both AS BIGINT) AS n_both,
         |       round(CAST(n_both AS DOUBLE) / (n_lsh + n_snm - n_both), 6) AS pair_jaccard
         |FROM c""".stripMargin,

    "q124_sorted_neighborhood" ->
      """WITH k AS (
        |  SELECT doc_id AS id,
        |         substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                    ' +', ' ', 'g')), 1, 24) AS key
        |  FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT id, key, substr(key, 1, 6) AS blk,
        |         row_number() OVER (PARTITION BY substr(key, 1, 6) ORDER BY key, id) AS rn
        |  FROM k
        |)
        |SELECT a.id AS doc_a, b.id AS doc_b,
        |       CAST(CASE WHEN a.key = b.key THEN 1 ELSE 0 END AS BIGINT) AS same_key
        |FROM r a JOIN r b
        |  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Forward fill via IGNORE NULLS last_value; the grid starts at each
    // user's own first hour so the fill never sees a leading null.
    "q128_gap_fill" ->
      s"""WITH hr AS (
         |  SELECT user_id, date_trunc('hour', date_trunc('microseconds', ts)) AS h,
         |         CAST(sum(${centsSql("value")}) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2
         |), b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hr GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b
         |), j AS (
         |  SELECT g.user_id, g.h, hr.v
         |  FROM grid g LEFT JOIN hr ON hr.user_id = g.user_id AND hr.h = g.h
         |), f AS (
         |  SELECT user_id, h, v,
         |         last_value(v IGNORE NULLS) OVER (
         |           PARTITION BY user_id ORDER BY h
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
         |  FROM j
         |)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours,
         |       CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
         |       CAST(sum(fv) AS BIGINT) AS sum_filled_cents,
         |       round(CAST(1.0 AS DOUBLE) - CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS gap_rate
         |FROM f GROUP BY 1 ORDER BY user_id""".stripMargin,

    // Top-10 ties broken by orderkey; revenue in exact cents so the rank
    // order is engine-identical.
    "q129_shipping_priority" ->
      s"""SELECT l.l_orderkey,
         |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
         |       o.o_orderpriority,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < DATE '1998-07-01'
         |  AND l.l_shipdate > DATE '1998-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_cents DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q118_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), t AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |  FROM e
        |), c AS (
        |  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |), f AS (
        |  SELECT prev_type, event_type, n,
        |         CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from
        |  FROM c
        |)
        |SELECT prev_type, event_type, n,
        |       (CAST((2 * n * 1000000 + n_from) // (2 * n_from) AS DOUBLE) / 1000000.0) AS p
        |FROM f ORDER BY prev_type, event_type""".stripMargin,

    // expected/contrib derive from the UNROUNDED e; `expected` rounds only
    // at the projection (mirrors the Spark column order of operations).
    "q119_lang_source_indep" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2
        |), t AS (
        |  SELECT lang, source, o,
        |         CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS rl,
        |         CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS cl,
        |         CAST(sum(o) OVER () AS BIGINT) AS nn
        |  FROM cells
        |)
        |SELECT lang, source, o AS observed,
        |       round(CAST(rl AS DOUBLE) * cl / nn, 6) AS expected,
        |       round((o - CAST(rl AS DOUBLE) * cl / nn) * (o - CAST(rl AS DOUBLE) * cl / nn)
        |             / (CAST(rl AS DOUBLE) * cl / nn), 6) AS contrib
        |FROM t ORDER BY lang, source""".stripMargin,

    "q113_winsorized_stats" ->
      """WITH p AS (
        |  SELECT lang, quantile_cont(n_chars, 0.05) AS plo, quantile_cont(n_chars, 0.95) AS phi
        |  FROM documents GROUP BY lang
        |), v AS (
        |  SELECT d.lang, p.plo, p.phi, CAST(d.n_chars AS DOUBLE) AS v,
        |         CAST(round(least(greatest(CAST(d.n_chars AS DOUBLE), p.plo), p.phi) * 1000000) AS BIGINT) AS wq
        |  FROM documents d JOIN p USING (lang)
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |       round(min(plo), 6) AS p_lo,
        |       round(min(phi), 6) AS p_hi,
        |       round(CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE) / (count(*) * 1000000.0), 6) AS raw_mean,
        |       round(CAST(sum(wq) AS DOUBLE) / (count(*) * 1000000.0), 6) AS winsorized_mean
        |FROM v GROUP BY lang ORDER BY lang""".stripMargin,

    "q114_source_concentration" ->
      """WITH per AS (
        |  SELECT source,
        |         CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS ntok
        |  FROM documents GROUP BY source
        |), t AS (SELECT CAST(sum(ntok) AS BIGINT) AS total, count(*) AS n_sources FROM per),
        |q AS (
        |  SELECT t.n_sources, t.total,
        |         CAST(round((CAST(ntok AS DOUBLE) / t.total) * (CAST(ntok AS DOUBLE) / t.total)
        |                    * 1000000000000.0) AS BIGINT) AS q
        |  FROM per, t
        |)
        |SELECT CAST(n_sources AS BIGINT) AS n_sources, total AS total_tokens,
        |       round(CAST(sum(q) AS DOUBLE) / 1000000000000.0, 6) AS hhi,
        |       round(1000000000000.0 / CAST(sum(q) AS DOUBLE), 6) AS effective_sources
        |FROM q GROUP BY n_sources, total""".stripMargin,

    "q115_token_budget" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT source, tok,
        |         sum(tok) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN cum <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN cum <= 5000 THEN tok ELSE 0 END) AS BIGINT) AS tokens_kept,
        |       round(CAST(sum(CASE WHEN cum <= 5000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS keep_rate
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q104_mixture_apply" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         coalesce(CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT), 0) AS tok
        |  FROM documents
        |), b AS (SELECT source, CAST(sum(tok) AS BIGINT) AS ntok FROM d GROUP BY 1),
        |t AS (
        |  SELECT source, ntok,
        |         CAST(sum(ntok) OVER () AS BIGINT) AS ntok_all,
        |         CAST(count(*) OVER () AS BIGINT) AS n_sources
        |  FROM b
        |), k AS (
        |  SELECT d.source,
        |         CASE WHEN CAST(CAST(concat('0x', substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS HUGEINT)
        |                   * t.n_sources * t.ntok
        |                 < CAST(t.ntok_all AS HUGEINT) * 281474976710656
        |              THEN 1 ELSE 0 END AS keep
        |  FROM d JOIN t USING (source)
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(keep) AS BIGINT) AS n_kept,
        |       round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS keep_rate
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // JSON extraction: TRY_CAST chain ≡ Spark PERMISSIVE from_json
    // (null / malformed / wrong-typed k all land as NULL).
    "q103_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |         TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
        |       CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k,
        |       round(CAST(sum(coalesce(k, 0)) AS DOUBLE)
        |             / CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE), 6) AS mean_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // PII audit: RE2 mirrors of the Java patterns (common subset — no
    // lookaround/backrefs); counts claimed in the same redaction order.
    "q102_pii_audit" ->
      """WITH d AS (
        |  SELECT source, text,
        |         regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM documents WHERE text IS NOT NULL
        |), d2 AS (
        |  SELECT source, text, t1,
        |         regexp_replace(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS t2
        |  FROM d
        |), d3 AS (
        |  SELECT source, text, t1, t2,
        |         regexp_replace(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t3
        |  FROM d2
        |), c AS (
        |  SELECT source,
        |         CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS ne,
        |         CAST(len(regexp_extract_all(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS ns,
        |         CAST(len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS ni,
        |         CAST(len(regexp_extract_all(t3, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS np
        |  FROM d3
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(ne) AS BIGINT) AS n_emails,
        |       CAST(sum(ns) AS BIGINT) AS n_ssns,
        |       CAST(sum(ni) AS BIGINT) AS n_ips,
        |       CAST(sum(np) AS BIGINT) AS n_phones,
        |       CAST(sum(CASE WHEN ne + ns + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Source JSD: identical expression order (p, q, m, term), identical
    // 1e-9 quantization of each per-word term before summation.
    "q101_source_jsd" ->
      jsdSql("SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents",
        "source"),

    // q101's JSD machinery on a time axis: each month's event-type mix vs
    // the rest of the stream.
    "q111_temporal_jsd" ->
      jsdSql("SELECT strftime(ts, '%Y-%m') AS grp, unnest(string_split(event_type, ' ')) AS w FROM events",
        "month"),

    "q109_snapshot_diff" ->
      """WITH oldsnap AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 13 = 5 THEN text || ' v0' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 3
        |), newsnap AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id % 17 <> 2
        |), d AS (
        |  SELECT coalesce(n.source, o.source) AS source,
        |         CASE WHEN o.doc_id IS NULL THEN 'added'
        |              WHEN n.doc_id IS NULL THEN 'removed'
        |              WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
        |              ELSE 'unchanged' END AS change_status
        |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
        |)
        |SELECT source, change_status, CAST(count(*) AS BIGINT) AS n_docs
        |FROM d GROUP BY 1, 2 ORDER BY source, change_status""".stripMargin,

    "q110_normalized_dedup" ->
      """WITH n AS (
        |  SELECT source,
        |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                 ' +', ' ', 'g'))) AS nh
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT nh) AS BIGINT) AS n_normalized,
        |       round(CAST(1.0 AS DOUBLE) - CAST(count(DISTINCT nh) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM n GROUP BY 1 ORDER BY source""".stripMargin,

    // Per-doc char-window multiplicities (md5 48-bit keys, q91 hashing),
    // rolled to per-source exact integers + one rounded division.
    "q112_intra_doc_repetition" ->
      """WITH wins AS (
        |  SELECT source, doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM (
        |    SELECT source, doc_id,
        |           unnest([substr(text, i, 20)
        |                   for i in range(1, greatest(length(text) - 19, 1) + 1)]) AS s
        |    FROM documents WHERE text IS NOT NULL)
        |), perwin AS (
        |  SELECT source, doc_id, sk, count(*) AS m FROM wins GROUP BY 1, 2, 3
        |), perdoc AS (
        |  SELECT source, doc_id, sum(m) AS nw, count(*) AS nd, max(m) AS mx
        |  FROM perwin GROUP BY 1, 2
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nw) AS BIGINT) AS n_windows,
        |       CAST(sum(nd) AS BIGINT) AS n_distinct_windows,
        |       CAST(sum(CASE WHEN mx >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_repetitive,
        |       round(CAST(1.0 AS DOUBLE) - CAST(sum(nd) AS DOUBLE) / CAST(sum(nw) AS DOUBLE), 6) AS dup_window_share
        |FROM perdoc GROUP BY 1 ORDER BY source""".stripMargin,


    // Mixture weights: uniform target over the observed sources; the
    // window-free SQL form of the bounded-relation window.
    "q99_mixture_weights" ->
      """WITH b AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(coalesce(CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT), 0)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |)
        |SELECT source, n_docs, n_tokens,
        |       round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS token_share,
        |       round((CAST(1.0 AS DOUBLE) / count(*) OVER ())
        |             / (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()), 6) AS weight
        |FROM b ORDER BY source""".stripMargin,

    // Dup-rate curve over the q75 estimate chain.
    "q100_dup_curve" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |), d AS (
         |  SELECT least(CAST(floor(round(CAST(nm AS DOUBLE) / 8.0, 6) * 10) AS BIGINT), 9) AS decile
         |  FROM nm
         |), g AS (SELECT decile, count(*) AS n_pairs FROM d GROUP BY 1)
         |SELECT decile, n_pairs,
         |       CAST(sum(n_pairs) OVER (ORDER BY decile DESC
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_at_or_above
         |FROM g ORDER BY decile""".stripMargin,

    // Char chunking: same start sequence (1, 1+96, … ≤ max(len−32, 1)),
    // substr clamps the tail in both engines; chunk_id = (off−1)/96.
    "q97_doc_chunks" ->
      """WITH st AS (
        |  SELECT doc_id, text,
        |         unnest([i for i in range(1, greatest(length(text) - 32, 1) + 1, 96)]) AS off
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT doc_id,
        |       CAST((off - 1) // 96 AS BIGINT) AS chunk_id,
        |       CAST(off AS BIGINT) AS off,
        |       CAST(length(substr(text, off, 128)) AS BIGINT) AS chunk_len,
        |       md5(substr(text, off, 128)) AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    // Embedding covariance: identical 1e-6 quantization, HUGEINT-exact
    // sums, identical double closed form (q61 discipline).
    "q98_embed_covariance" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |x1 AS (SELECT e, unnest(range(0, len(e))) AS i FROM v),
        |x2 AS (SELECT i, CAST(round(e[i+1] * 1000000) AS BIGINT) AS xq,
        |              unnest(range(i, len(e))) AS j, e
        |       FROM x1),
        |x AS (SELECT i, j, xq,
        |             CAST(round(e[j+1] * 1000000) AS BIGINT) AS yq
        |      FROM x2),
        |s AS (
        |  SELECT i, j, count(*) AS n_vecs,
        |         sum(CAST(xq AS HUGEINT)) AS sx,
        |         sum(CAST(yq AS HUGEINT)) AS sy,
        |         sum(CAST(xq AS HUGEINT) * CAST(yq AS HUGEINT)) AS sxy
        |  FROM x GROUP BY 1, 2
        |)
        |, nd AS (SELECT i, j, n_vecs,
        |              CAST(n_vecs AS HUGEINT) * sxy - sx * sy AS num,
        |              CAST(n_vecs AS HUGEINT) * n_vecs * 1000000 AS den
        |       FROM s)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(n_vecs AS BIGINT) AS n_vecs,
        |       CAST(CASE WHEN num >= 0 THEN (2 * num + den) // (2 * den)
        |                 ELSE -((2 * (-num) + den) // (2 * den)) END AS BIGINT) AS cov_e6
        |FROM nd ORDER BY i, j""".stripMargin,

    // Bloom decontamination: the oracle replays the EXACT semantics (the
    // bloom is a prefilter whose false positives the confirm join kills,
    // so it is invisible in the result); same shingle chain as q74.
    "q96_bloom_decontam" ->
      """WITH w AS (SELECT doc_id, text, source, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, source, unnest(
        |    CASE WHEN len(ws) >= 5
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5])
        |               for i in range(0, len(ws)-4)]
        |         ELSE [text] END) AS s
        |  FROM w
        |), hg AS (
        |  SELECT doc_id, source,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM g
        |), eg AS (SELECT DISTINCT sk FROM hg WHERE source = 'src0'),
        |tg AS (SELECT DISTINCT doc_id, sk FROM hg WHERE source <> 'src0'),
        |hits AS (
        |  SELECT tg.doc_id, count(*) AS nsg
        |  FROM tg JOIN eg USING (sk) GROUP BY 1
        |)
        |SELECT d.source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN h.nsg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |       CAST(sum(coalesce(h.nsg, 0)) AS BIGINT) AS total_shared_grams,
        |       round(CAST(sum(CASE WHEN h.nsg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS contam_rate
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.source <> 'src0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Gopher-rule battery: every rule an integer cross-multiplied
    // comparison; list_filter/list_distinct mirror Spark's filter/
    // array_distinct on the empties-kept single-space split.
    "q95_gopher_rules" ->
      """WITH d AS (
        |  SELECT source, text, string_split(text, ' ') AS w,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS sum_chars,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |         CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
        |                x -> len(list_filter(string_split(text, ' '), y -> y = x)))) AS BIGINT) AS max_rep,
        |         CAST((length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' the ', ''))) // 5
        |            + (length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' a ', ''))) // 3
        |            + (length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' of ', ''))) // 4 AS BIGINT) AS n_stop
        |  FROM documents WHERE text IS NOT NULL
        |), f AS (
        |  SELECT source,
        |         (n_words BETWEEN 10 AND 100000) AS r_wordcount,
        |         (sum_chars >= n_words * 3 AND sum_chars <= n_words * 10) AS r_meanlen,
        |         (n_alpha * 5 >= n_words * 4) AS r_alpha,
        |         (n_stop >= 2) AS r_stopwords,
        |         (max_rep * 5 <= n_words) AS r_repetition,
        |         (n_distinct * 10 >= n_words * 3) AS r_distinct
        |  FROM d
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CAST(r_wordcount AS BIGINT)) AS BIGINT) AS n_wordcount,
        |       CAST(sum(CAST(r_meanlen AS BIGINT)) AS BIGINT) AS n_meanlen,
        |       CAST(sum(CAST(r_alpha AS BIGINT)) AS BIGINT) AS n_alpha,
        |       CAST(sum(CAST(r_stopwords AS BIGINT)) AS BIGINT) AS n_stopwords,
        |       CAST(sum(CAST(r_repetition AS BIGINT)) AS BIGINT) AS n_repetition,
        |       CAST(sum(CAST(r_distinct AS BIGINT)) AS BIGINT) AS n_distinct,
        |       CAST(sum(CAST(r_wordcount AND r_meanlen AND r_alpha AND r_stopwords
        |                AND r_repetition AND r_distinct AS BIGINT)) AS BIGINT) AS n_pass_all,
        |       round(CAST(sum(CAST(r_wordcount AND r_meanlen AND r_alpha AND r_stopwords
        |                      AND r_repetition AND r_distinct AS BIGINT)) AS DOUBLE) / count(*), 6) AS pass_rate
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q94_ivf_profile" ->
      s"""$ivfAssignCte,
         |c8 AS (SELECT bucket, count(*) AS n_vecs FROM asg GROUP BY 1)
         |SELECT bucket, n_vecs,
         |       round(CAST(n_vecs AS DOUBLE) / sum(n_vecs) OVER (), 6) AS frac
         |FROM c8 ORDER BY bucket""".stripMargin,
  )
}
