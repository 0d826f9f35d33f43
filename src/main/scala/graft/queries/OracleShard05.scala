package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard05 {
  val defs: Map[String, String] = Map(

    "q257_rank_panel" ->
      """WITH rev AS (
        |  SELECT n.n_name AS nation,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |       JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  GROUP BY 1
        |)
        |SELECT nation, rev,
        |  CAST(dense_rank() OVER (ORDER BY rev DESC) AS BIGINT) AS drank,
        |  CAST(ntile(4) OVER (ORDER BY rev DESC, nation) AS BIGINT) AS quartile,
        |  CAST(round(cume_dist() OVER (ORDER BY rev) * 1000000) AS BIGINT) AS cume_ppm
        |FROM rev ORDER BY nation""".stripMargin,

    "q258_multigrain_dups" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT 'doc' AS granularity, md5(text) AS h FROM docs),
        |l AS (SELECT 'sentence' AS granularity, md5(s) AS h FROM (
        |        SELECT unnest(string_split_regex(text, '\. ')) AS s FROM docs)
        |      WHERE length(s) > 0),
        |g AS (SELECT '5gram' AS granularity, md5(s) AS h FROM (
        |        SELECT unnest(CASE WHEN len(ws) >= 5
        |                 THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5])
        |                       for i in range(0, len(ws)-4)]
        |                 ELSE [text] END) AS s
        |        FROM (SELECT text, string_split(text, ' ') AS ws FROM docs))),
        |u AS (SELECT * FROM d UNION ALL SELECT * FROM l UNION ALL SELECT * FROM g)
        |SELECT granularity, CAST(count(*) AS BIGINT) AS n_units,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
        |  CAST((count(*) - count(DISTINCT h)) * 1000000 // count(*) AS BIGINT) AS dup_ppm
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q259_pair_explain" ->
      s"""$minhashCte,
         |top AS (SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b LIMIT 10),
         |toks AS (SELECT DISTINCT doc_id, w FROM (
         |           SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |           FROM documents WHERE text IS NOT NULL)
         |         WHERE length(w) > 0),
         |nt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
         |inter AS (
         |  SELECT t.doc_a, t.doc_b, CAST(count(*) AS BIGINT) AS inter
         |  FROM top t JOIN toks ta ON ta.doc_id = t.doc_a
         |       JOIN toks tb ON tb.doc_id = t.doc_b AND tb.w = ta.w
         |  GROUP BY 1, 2
         |)
         |SELECT t.doc_a, t.doc_b, na.n AS n_a, nb.n AS n_b,
         |  coalesce(i.inter, 0) AS inter,
         |  CAST(na.n - coalesce(i.inter, 0) AS BIGINT) AS only_a,
         |  CAST(nb.n - coalesce(i.inter, 0) AS BIGINT) AS only_b,
         |  round(CAST(coalesce(i.inter, 0) AS DOUBLE)
         |        / (na.n + nb.n - coalesce(i.inter, 0)), 6) AS jaccard
         |FROM top t JOIN nt na ON na.doc_id = t.doc_a JOIN nt nb ON nb.doc_id = t.doc_b
         |     LEFT JOIN inter i ON i.doc_a = t.doc_a AND i.doc_b = t.doc_b
         |ORDER BY t.doc_a, t.doc_b""".stripMargin,

    "q260_daily_conversion" ->
      """WITH b AS (SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
        |                  CAST(max(date_trunc('day', ts)) AS DATE) AS d1 FROM events),
        |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
        |e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |               AS views,
        |             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |               AS purchases
        |      FROM events GROUP BY 1)
        |SELECT strftime(spine.day, '%Y-%m-%d') AS day, coalesce(e.views, 0) AS views,
        |  coalesce(e.purchases, 0) AS purchases,
        |  CAST(CASE WHEN coalesce(e.views, 0) > 0
        |       THEN coalesce(e.purchases, 0) * 1000000 // e.views ELSE 0 END AS BIGINT)
        |    AS conv_ppm
        |FROM spine LEFT JOIN e ON e.day = spine.day ORDER BY 1""".stripMargin,

    "q261_kwic" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS pos FROM t),
        |m AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |             array_to_string(list_slice(ws, greatest(pos-3, 1), least(pos+3, len(ws))), ' ')
        |               AS context
        |      FROM p WHERE ws[pos] = 'spark')
        |SELECT * FROM m ORDER BY doc_id, pos LIMIT 20""".stripMargin,

    "q262_merkle_rollup" ->
      """WITH d AS (SELECT source, doc_id % 16 AS shard, doc_id, md5(text) AS h
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT source, shard, md5(string_agg(h, '' ORDER BY doc_id)) AS h
        |       FROM d GROUP BY 1, 2),
        |so AS (SELECT source, md5(string_agg(h, '' ORDER BY shard)) AS h FROM sh GROUP BY 1),
        |rt AS (SELECT md5(string_agg(h, '' ORDER BY source)) AS h FROM so)
        |SELECT 'shard' AS level, concat(source, '/', CAST(shard AS VARCHAR)) AS key, h FROM sh
        |UNION ALL SELECT 'source', source, h FROM so
        |UNION ALL SELECT 'root', '*', h FROM rt
        |ORDER BY level, key""".stripMargin,

    "q263_forecast_backtest" ->
      """WITH m AS (
        |  SELECT n.n_name AS nation,
        |         CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate)) - 23941 AS BIGINT) AS mi,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |       JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  GROUP BY 1, 2
        |), bt AS (
        |  SELECT a.nation, a.rev, f.rev AS fc,
        |         CAST(abs(a.rev - f.rev) * 1000000 // a.rev AS BIGINT) AS ape_ppm
        |  FROM m a JOIN m f ON f.nation = a.nation AND f.mi = a.mi - 12
        |)
        |SELECT nation, CAST(count(*) AS BIGINT) AS n_months,
        |  CAST(sum(ape_ppm) // count(*) AS BIGINT) AS mape_ppm,
        |  CAST(sum(fc - rev) * 1000000 // sum(rev) AS BIGINT) AS bias_ppm
        |FROM bt GROUP BY 1 ORDER BY 1""".stripMargin,

    "q264_modularity" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |e AS (SELECT doc_a AS u, doc_b AS v FROM cand),
         |cin AS (SELECT la.l, CAST(count(*) AS BIGINT) AS in_c
         |        FROM e JOIN lbl la ON la.u = e.u JOIN lbl lb ON lb.u = e.v
         |        WHERE la.l = lb.l GROUP BY 1),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1),
         |cdeg AS (SELECT lbl.l, CAST(sum(deg.d) AS BIGINT) AS deg_c
         |         FROM deg JOIN lbl ON lbl.u = deg.u GROUP BY 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
         |agg AS (SELECT CAST(sum(coalesce(cin.in_c, 0)) AS BIGINT) AS sin,
         |               CAST(sum(cdeg.deg_c * cdeg.deg_c) AS BIGINT) AS sdeg2,
         |               CAST(count(*) AS BIGINT) AS n_comm
         |        FROM cdeg LEFT JOIN cin ON cin.l = cdeg.l)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM lbl) AS n_nodes,
         |       mm.m AS n_edges, agg.n_comm AS n_communities,
         |       CAST((4 * mm.m * agg.sin - agg.sdeg2) * 1000000 // (4 * mm.m * mm.m) AS BIGINT)
         |         AS modularity_ppm
         |FROM mm, agg""".stripMargin,

    "q265_dispersion" ->
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS n_events,
        |  CAST((count(*) * sum(x*x) - sum(x)*sum(x)) * 1000000 // ((count(*) - 1) * sum(x))
        |       AS BIGINT) AS vmr_ppm
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q266_hll_union" ->
      s"""WITH pt AS (SELECT DISTINCT event_type, user_id FROM events),
         |hp AS (SELECT event_type,
         |         CAST(concat('0x', substr(md5(concat('hll#', CAST(user_id AS VARCHAR))), 1, 12))
         |              AS BIGINT) AS h
         |       FROM pt),
         |rp AS (SELECT event_type, h // 549755813888 AS b,
         |         CASE WHEN h % 549755813888 = 0 THEN 40
         |              ELSE 40 - length(bin(h % 549755813888)) END AS rho
         |       FROM hp),
         |perg AS (SELECT event_type, b, max(rho) AS mr FROM rp GROUP BY 1, 2),
         |merged AS (SELECT b, max(mr) AS mr FROM perg GROUP BY 1),
         |du AS (SELECT DISTINCT user_id FROM events),
         |hd AS (SELECT CAST(concat('0x', substr(md5(concat('hll#', CAST(user_id AS VARCHAR))), 1, 12))
         |              AS BIGINT) AS h FROM du),
         |rd AS (SELECT h // 549755813888 AS b,
         |         CASE WHEN h % 549755813888 = 0 THEN 40
         |              ELSE 40 - length(bin(h % 549755813888)) END AS rho
         |       FROM hd),
         |direct AS (SELECT b, max(rho) AS mr FROM rd GROUP BY 1),
         |mis AS (SELECT CAST(sum(CASE WHEN m1.mr IS NOT DISTINCT FROM m2.mr THEN 0 ELSE 1 END)
         |               AS BIGINT) AS merge_mismatches
         |        FROM merged m1 FULL OUTER JOIN direct m2 ON m1.b = m2.b),
         |msum AS (SELECT CAST(count(*) AS BIGINT) AS n_present,
         |                CAST(sum(CAST(1 AS BIGINT) << CAST(40 - mr AS INT)) AS BIGINT) AS sp
         |         FROM merged),
         |exact AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_union FROM events),
         |est AS (SELECT round($hllAlphaM2Scaled /
         |          CAST(msum.sp + (512 - msum.n_present) * 1099511627776 AS DOUBLE), 3) AS raw_est,
         |          msum.n_present
         |        FROM msum)
         |SELECT exact.exact_union, est.n_present, mis.merge_mismatches, est.raw_est,
         |  round(CASE WHEN est.n_present < 512 AND est.raw_est < 1280.0
         |        THEN 512.0 * ln(512.0 / CAST(512 - est.n_present AS DOUBLE))
         |        ELSE est.raw_est END, 3) AS corrected_est
         |FROM exact, est, mis""".stripMargin,

    "q267_lateness_histogram" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         max(epoch_us(ts)) OVER (
        |           PARTITION BY user_id
        |           ORDER BY CAST(concat('0x', substr(md5(concat('arr#', CAST(event_id AS VARCHAR))), 1, 12)) AS BIGINT),
        |                    event_id
        |           ROWS UNBOUNDED PRECEDING) AS mx
        |  FROM events
        |), l AS (SELECT (mx - us) // 1000000 AS late_s FROM e)
        |SELECT CAST(length(bin(late_s)) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(late_s) AS BIGINT) AS min_s, CAST(max(late_s) AS BIGINT) AS max_s
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    "q268_multistage_sample" ->
      """WITH s1 AS (
        |  SELECT DISTINCT source FROM documents
        |  WHERE CAST(concat('0x', substr(md5(concat('ms1#', source)), 1, 12)) AS BIGINT) * 5
        |        < 281474976710656
        |), s2 AS (
        |  SELECT d.source, d.doc_id, d.n_chars
        |  FROM documents d JOIN s1 ON s1.source = d.source
        |  WHERE CAST(concat('0x', substr(md5(concat('ms2#', CAST(d.doc_id AS VARCHAR))), 1, 12))
        |             AS BIGINT) * 2 < 281474976710656
        |), est AS (
        |  SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_sources,
        |         CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) * 10 AS BIGINT) AS est_total_chars
        |  FROM s2
        |), tru AS (SELECT CAST(sum(n_chars) AS BIGINT) AS true_total_chars FROM documents)
        |SELECT est.n_sources, est.n_docs, est.est_total_chars, tru.true_total_chars,
        |  CAST((est.est_total_chars - tru.true_total_chars) * 1000000 // tru.true_total_chars
        |       AS BIGINT) AS err_ppm
        |FROM est, tru""".stripMargin,

    "q269_threshold_sweep" ->
      s"""$minhashCte, bg AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(ws) >= 2
         |           THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
         |           ELSE [text] END) AS sh
         |    FROM w)
         |), sizes AS (SELECT doc_id, count(*) AS sz FROM bg GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
         |  FROM cand c
         |  JOIN bg a ON a.doc_id = c.doc_a
         |  JOIN bg b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT inter.i, CAST(sa.sz AS BIGINT) AS sa, CAST(sb.sz AS BIGINT) AS sb
         |  FROM inter JOIN sizes sa ON sa.doc_id = inter.doc_a
         |       JOIN sizes sb ON sb.doc_id = inter.doc_b
         |), t AS (SELECT unnest([500, 700, 800, 900]) AS threshold_milli)
         |SELECT CAST(t.threshold_milli AS BIGINT) AS threshold_milli,
         |  CAST(coalesce(sum(CASE WHEN p.i * 1000 >= t.threshold_milli * (p.sa + p.sb - p.i)
         |                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(sum(CASE WHEN p.i * 1000 >= t.threshold_milli * (p.sa + p.sb - p.i)
         |                    THEN least(p.sa, p.sb) ELSE 0 END), 0) AS BIGINT)
         |    AS redundant_shingles
         |FROM t LEFT JOIN pairs p ON true
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q270_dup_direction" ->
      s"""$minhashCte,
         |ds AS (SELECT doc_id, source FROM documents),
         |px AS (SELECT c.doc_a, c.doc_b, sa.source AS src_a, sb.source AS src_b
         |       FROM cand c JOIN ds sa ON sa.doc_id = c.doc_a
         |            JOIN ds sb ON sb.doc_id = c.doc_b
         |       WHERE sa.source <> sb.source)
         |SELECT least(src_a, src_b) AS src_1, greatest(src_a, src_b) AS src_2,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN src_a = least(src_a, src_b) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS keeper_in_1
         |FROM px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q271_boxplot_stats" ->
      """WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS x, doc_id AS k FROM documents),
        |r AS (SELECT lang, x, row_number() OVER (PARTITION BY lang ORDER BY x, k) AS rn,
        |        count(*) OVER (PARTITION BY lang) AS n FROM c),
        |q AS (SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
        |        CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
        |        CAST(min(CASE WHEN rn = greatest(1, n // 4) THEN x END) AS BIGINT) AS q1,
        |        CAST(min(CASE WHEN rn = (n + 1) // 2 THEN x END) AS BIGINT) AS median,
        |        CAST(min(CASE WHEN rn = (3 * n) // 4 THEN x END) AS BIGINT) AS q3
        |      FROM r GROUP BY 1),
        |o AS (SELECT c.lang, CAST(count(*) AS BIGINT) AS n_outliers
        |      FROM c JOIN q ON q.lang = c.lang
        |      WHERE 2 * c.x < 2 * q.q1 - 3 * (q.q3 - q.q1)
        |         OR 2 * c.x > 2 * q.q3 + 3 * (q.q3 - q.q1)
        |      GROUP BY 1)
        |SELECT q.lang, q.n_docs, q.min_x, q.q1, q.median, q.q3, q.max_x,
        |       coalesce(o.n_outliers, 0) AS n_outliers
        |FROM q LEFT JOIN o ON o.lang = q.lang ORDER BY q.lang""".stripMargin,

    "q272_sql_extensions" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_poly,
        |  CAST(greatest(len(string_split(text, ' ')) - 2, 1) AS BIGINT) AS n_shingles
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id LIMIT 50""".stripMargin,

    // The two-pass sketch is exact by construction (pass 2 filters the
    // candidate superset with the true threshold), so the oracle is the
    // plain full-vocabulary GROUP BY … HAVING it avoids at scale.
    "q273_heavy_hitters" ->
      """WITH words AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |    WHERE text IS NOT NULL)
        |  WHERE length(w) > 0
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM words)
        |SELECT w AS token, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) * 1000000 // max(t.n_total) AS BIGINT) AS freq_ppm
        |FROM words, t GROUP BY w
        |HAVING count(*) * 100 > max(t.n_total)
        |ORDER BY n DESC, token""".stripMargin,

    // Quantized side is pure integer arithmetic (int8 codes, exact integer
    // sqrt of the squared norm, signed floor division in micro units), so
    // the only float math is the exact-cosine ranking already proven
    // portable by q24.
    "q274_quantized_recall" ->
      s"""$normCte,
         |qz AS (
         |  SELECT vec_id AS vid, e,
         |         list_max(list_transform(e, x -> abs(x))) AS mx
         |  FROM n
         |), qc AS (
         |  SELECT vid,
         |         CASE WHEN mx = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
         |              ELSE list_transform(e, x -> CAST(round(x * 127 / mx) AS BIGINT)) END AS q
         |  FROM qz
         |), qn AS (
         |  SELECT vid, q, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn2
         |  FROM qc
         |), qi AS (
         |  SELECT vid, q, qn2,
         |         CAST(floor(sqrt(CAST(qn2 AS DOUBLE))) AS BIGINT) AS t
         |  FROM qn
         |), qf AS (
         |  SELECT vid, q,
         |         CASE WHEN (t + 1) * (t + 1) <= qn2 THEN t + 1
         |              WHEN t * t > qn2 THEN t - 1 ELSE t END AS s
         |  FROM qi
         |), b AS (
         |  SELECT n.vec_id AS vid, n.e, n.nrm, qf.q, qf.s
         |  FROM n JOIN qf ON qf.vid = n.vec_id
         |), qs AS (
         |  SELECT vid AS query_id, e AS qv, nrm AS qnrm, q AS qq, s AS qss
         |  FROM b WHERE vid < 5
         |), sc AS (
         |  SELECT qs.query_id, b.vid,
         |         round(list_sum(list_transform(range(1, len(qs.qv)+1), i -> qs.qv[i]*b.e[i]))
         |               / (qs.qnrm * b.nrm), 6) AS sim,
         |         CAST(list_sum(list_transform(range(1, len(qs.qq)+1), i -> qs.qq[i]*b.q[i])) AS BIGINT) AS qdot,
         |         qs.qss * b.s AS den
         |  FROM b, qs WHERE b.vid <> qs.query_id
         |), r AS (
         |  SELECT query_id, vid, sim,
         |         CASE WHEN den = 0 THEN 0
         |              WHEN qdot >= 0 THEN (qdot * 1000000) // den
         |              ELSE -((-qdot * 1000000) // den) END AS qsim_u
         |  FROM sc
         |), rk AS (
         |  SELECT query_id, vid,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vid) AS BIGINT) AS erk,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY qsim_u DESC, vid) AS BIGINT) AS qrk
         |  FROM r
         |)
         |SELECT query_id,
         |       CAST(sum(CASE WHEN erk <= 10 AND qrk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
         |       CAST(sum(CASE WHEN erk <= 10 AND qrk <= 10 THEN 1 ELSE 0 END) * 100 // 10 AS BIGINT) AS recall_pct,
         |       CAST(sum(CASE WHEN erk <= 10 THEN abs(qrk - erk) ELSE 0 END) * 1000 // 10 AS BIGINT)
         |         AS mean_disp_milli
         |FROM rk WHERE erk <= 10 OR qrk <= 10
         |GROUP BY query_id ORDER BY query_id""".stripMargin,

    "q275_token_allocation" ->
      """WITH srcs AS (
        |  SELECT source,
        |         CAST(sum(coalesce(CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT), 0)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), g AS (
        |  SELECT source, n_tokens,
        |         CAST(count(*) OVER () AS BIGINT) AS sn,
        |         CAST(sum(n_tokens) OVER () // 2 AS BIGINT) AS budget,
        |         CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS rn,
        |         CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM srcs
        |), g2 AS (
        |  SELECT *,
        |         coalesce(min(CASE WHEN NOT (n_tokens * (sn - rn + 1) <= budget - cum + n_tokens)
        |                      THEN rn END) OVER () - 1, sn) AS p
        |  FROM g
        |), g3 AS (
        |  SELECT *,
        |         coalesce(max(CASE WHEN rn = p THEN cum END) OVER (), 0) AS cum_p
        |  FROM g2
        |), g4 AS (
        |  SELECT *,
        |         CASE WHEN p = sn THEN 0 ELSE (budget - cum_p) // (sn - p) END AS lam,
        |         CASE WHEN p = sn THEN 0 ELSE (budget - cum_p) % (sn - p) END AS rem
        |  FROM g3
        |)
        |SELECT source, n_tokens,
        |       CAST(CASE WHEN rn <= p THEN n_tokens
        |            ELSE lam + CASE WHEN rn - p <= rem THEN 1 ELSE 0 END END AS BIGINT) AS alloc_tokens,
        |       CAST(CASE WHEN rn <= p THEN 1 ELSE 0 END AS BIGINT) AS capped,
        |       CAST((CASE WHEN rn <= p THEN n_tokens
        |             ELSE lam + CASE WHEN rn - p <= rem THEN 1 ELSE 0 END END) * 1000000 // n_tokens AS BIGINT)
        |         AS epochs_ppm
        |FROM g4 ORDER BY source""".stripMargin,

    // struct-max tie-break mirrored as ORDER BY w DESC, shard DESC
    "q276_rendezvous_shards" ->
      """WITH w AS (
        |  SELECT d.doc_id, d.n_chars, s.shard,
        |         CAST(concat('0x', substr(md5(concat('hrw#', CAST(s.shard AS VARCHAR),
        |           '#', CAST(d.doc_id AS VARCHAR))), 1, 12)) AS BIGINT) AS w
        |  FROM documents d, (SELECT unnest(generate_series(0, 7)) AS shard) s
        |), a8 AS (
        |  SELECT doc_id, n_chars, shard,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, shard DESC) AS rk
        |  FROM w
        |), a7 AS (
        |  SELECT doc_id, shard,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, shard DESC) AS rk
        |  FROM w WHERE shard < 7
        |)
        |SELECT CAST(a8.shard AS BIGINT) AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(a8.n_chars) AS BIGINT) AS n_chars,
        |       CAST(sum(CASE WHEN a8.shard <> a7.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_if_drop7
        |FROM a8 JOIN a7 ON a7.doc_id = a8.doc_id AND a7.rk = 1
        |WHERE a8.rk = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q277_join_card_audit" ->
      """WITH pk AS (
        |  SELECT CAST(l_partkey % 16 AS BIGINT) AS bucket, l_partkey,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2
        |), b AS (
        |  SELECT bucket, CAST(sum(c) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS ndv,
        |         CAST(sum(c * c) AS BIGINT) AS exact_selfjoin
        |  FROM pk GROUP BY 1
        |)
        |SELECT bucket, n_rows, ndv,
        |       CAST((n_rows * n_rows) // ndv AS BIGINT) AS est_selfjoin,
        |       exact_selfjoin,
        |       CAST((((n_rows * n_rows) // ndv) - exact_selfjoin) * 1000000 // exact_selfjoin AS BIGINT)
        |         AS err_ppm
        |FROM b ORDER BY bucket""".stripMargin,

    "q278_partition_packing" ->
      """WITH keys AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1
        |), r AS (
        |  SELECT o_custkey, c,
        |         CAST(row_number() OVER (ORDER BY c DESC, o_custkey) AS BIGINT) AS rn,
        |         CAST(sum(c) OVER () AS BIGINT) AS total
        |  FROM keys
        |), snake AS (
        |  SELECT c, total,
        |         CASE WHEN ((rn - 1) // 8) % 2 = 0 THEN (rn - 1) % 8
        |              ELSE 7 - ((rn - 1) % 8) END AS p
        |  FROM r
        |), sa AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS snake_keys,
        |         CAST(sum(c) AS BIGINT) AS snake_rows, CAST(max(total) AS BIGINT) AS total
        |  FROM snake GROUP BY 1
        |), ha AS (
        |  SELECT CAST(concat('0x', substr(md5(concat('pp#', CAST(o_custkey AS VARCHAR))), 1, 12)) AS BIGINT) % 8 AS p,
        |         CAST(sum(c) AS BIGINT) AS hash_rows
        |  FROM keys GROUP BY 1
        |)
        |SELECT sa.p, sa.snake_keys, sa.snake_rows, ha.hash_rows,
        |       CAST(sa.snake_rows * 8 * 1000000 // sa.total AS BIGINT) AS snake_load_ppm,
        |       CAST(ha.hash_rows * 8 * 1000000 // sa.total AS BIGINT) AS hash_load_ppm
        |FROM sa JOIN ha ON ha.p = sa.p ORDER BY sa.p""".stripMargin,

    "q279_embed_dim_profile" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |x1 AS (SELECT e, unnest(range(0, len(e))) AS i FROM v),
        |x AS (SELECT i AS dim, CAST(round(e[i+1] * 1000000) AS BIGINT) AS xq FROM x1),
        |s AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(xq AS HUGEINT)) AS sx,
        |         sum(CAST(xq AS HUGEINT) * CAST(xq AS HUGEINT)) AS sx2,
        |         CAST(sum(CASE WHEN xq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |         min(xq) AS min_q, max(xq) AS max_q
        |  FROM x GROUP BY 1
        |)
        |SELECT CAST(dim AS BIGINT) AS dim, n,
        |       CAST(sx // n AS BIGINT) AS mean_micro,
        |       CAST((n * sx2 - sx * sx) // (n * (n - 1)) AS BIGINT) AS var_micro2,
        |       CAST(n_zero * 1000000 // n AS BIGINT) AS zero_ppm,
        |       CAST(CASE WHEN min_q = max_q THEN 1 ELSE 0 END AS BIGINT) AS dead
        |FROM s ORDER BY dim""".stripMargin,

    "q280_join_hotkeys" ->
      """WITH k AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c,
        |         CAST(count(*) AS BIGINT) * CAST(count(*) AS BIGINT) AS out_rows
        |  FROM lineitem GROUP BY 1
        |), r AS (
        |  SELECT l_partkey, c, out_rows,
        |         CAST(sum(out_rows) OVER () AS BIGINT) AS total_out,
        |         CAST(row_number() OVER (ORDER BY out_rows DESC, l_partkey) AS BIGINT) AS rk
        |  FROM k
        |)
        |SELECT rk, l_partkey AS partkey, c AS n_rows, out_rows,
        |       CAST(out_rows * 1000000 // total_out AS BIGINT) AS share_ppm
        |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,

    "q281_l_diversity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(min(l) AS BIGINT) AS min_l,
        |       CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_diversity,
        |       CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |       CAST(sum(n) AS BIGINT) AS total_rows
        |FROM g""".stripMargin,

    "q282_column_entropy" ->
      """WITH vals AS (
        |  SELECT 'o_orderpriority' AS col_name, o_orderpriority AS val FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT 'order_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders
        |), vc AS (
        |  SELECT col_name, val, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2
        |), t AS (
        |  SELECT col_name, c,
        |         CAST(sum(c) OVER (PARTITION BY col_name) AS BIGINT) AS n
        |  FROM vc
        |), e AS (
        |  SELECT col_name, CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS ndv,
        |         CAST(sum(CAST(round((CAST(c AS DOUBLE) / n)
        |           * ln(CAST(n AS DOUBLE) / c) * 1000000000) AS BIGINT)) AS BIGINT) AS entropy_nano
        |  FROM t GROUP BY 1
        |)
        |SELECT col_name, n, ndv, entropy_nano,
        |       CASE WHEN ndv = 1 THEN 0.0
        |            ELSE round(CAST(entropy_nano AS DOUBLE) / 1000000000.0
        |                       / ln(CAST(ndv AS DOUBLE)), 6) END AS entropy_norm
        |FROM e ORDER BY col_name""".stripMargin,

    "q283_assortativity" ->
      s"""$minhashCte,
         |e2 AS (SELECT doc_a AS u, doc_b AS v FROM cand
         |       UNION ALL
         |       SELECT doc_b AS u, doc_a AS v FROM cand),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e2 GROUP BY 1),
         |j AS (SELECT da.d AS du, db.d AS dv
         |      FROM e2 JOIN deg da ON da.u = e2.u JOIN deg db ON db.u = e2.v),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS m2,
         |             sum(CAST(du AS HUGEINT)) AS sx,
         |             sum(CAST(du AS HUGEINT) * CAST(du AS HUGEINT)) AS sx2,
         |             sum(CAST(du AS HUGEINT) * CAST(dv AS HUGEINT)) AS sxy
         |      FROM j)
         |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
         |       CAST(CASE WHEN m2 * sx2 - sx * sx = 0 THEN 0
         |            ELSE (m2 * sxy - sx * sx) * 1000000 // (m2 * sx2 - sx * sx) END AS BIGINT)
         |         AS assortativity_ppm
         |FROM s""".stripMargin,

    "q284_km_survival" ->
      """WITH hz AS (SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS hz FROM events),
        |pu AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
        |  FROM events GROUP BY 1
        |), fp AS (
        |  SELECT user_id, min(ts) AS p_raw FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1
        |), users AS (
        |  SELECT coalesce(
        |           CASE WHEN fp.p_raw >= pu.s_ts
        |                THEN CAST(date_diff('day', CAST(date_trunc('day', pu.s_ts) AS DATE),
        |                          CAST(date_trunc('day', fp.p_raw) AS DATE)) AS BIGINT) END,
        |           CAST(date_diff('day', CAST(date_trunc('day', pu.s_ts) AS DATE), hz.hz) AS BIGINT))
        |           AS day,
        |         (CASE WHEN fp.p_raw >= pu.s_ts THEN 1 ELSE 0 END) AS is_event
        |  FROM pu LEFT JOIN fp ON fp.user_id = pu.user_id, hz
        |  WHERE pu.s_ts IS NOT NULL
        |), byday AS (
        |  SELECT day,
        |         CAST(sum(is_event) AS BIGINT) AS d_events,
        |         CAST(sum(1 - is_event) AS BIGINT) AS n_censored
        |  FROM users GROUP BY 1
        |), km AS (
        |  SELECT day, d_events, n_censored,
        |         CAST(sum(d_events + n_censored) OVER (ORDER BY day DESC
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |  FROM byday
        |), t AS (
        |  SELECT day, d_events, n_censored, n_risk,
        |         CASE WHEN n_risk > d_events THEN CAST(round(
        |           ln(CAST(n_risk - d_events AS DOUBLE) / n_risk) * 1000000000) AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS t9
        |  FROM km
        |)
        |SELECT day, n_risk, d_events, n_censored,
        |       CAST(sum(t9) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |         AS ln_surv_nano
        |FROM t WHERE d_events > 0 ORDER BY day""".stripMargin,

    "q285_decontam_sweep" -> decontamSweepSql,

    "q286_latest_state" ->
      """WITH l AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk,
        |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
        |  FROM events
        |), f AS (
        |  SELECT event_type AS final_state, CAST(count(*) AS BIGINT) AS n_users,
        |         CAST(sum(n_ops) AS BIGINT) AS n_ops_folded
        |  FROM l WHERE rk = 1 GROUP BY 1
        |)
        |SELECT final_state, n_users, n_ops_folded,
        |       CAST(n_users * 1000000 // sum(n_users) OVER () AS BIGINT) AS share_ppm
        |FROM f ORDER BY final_state""".stripMargin,

    "q287_transition_entropy" ->
      """WITH seq AS (
        |  SELECT event_type AS i,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS j
        |  FROM events
        |), tr AS (
        |  SELECT i, j, CAST(count(*) AS BIGINT) AS c
        |  FROM seq WHERE j IS NOT NULL GROUP BY 1, 2
        |), t AS (
        |  SELECT i, c, CAST(sum(c) OVER (PARTITION BY i) AS BIGINT) AS ci
        |  FROM tr
        |)
        |SELECT i AS state, CAST(max(ci) AS BIGINT) AS n_out,
        |       CAST(count(*) AS BIGINT) AS n_next_states,
        |       CAST(sum(CAST(round((CAST(c AS DOUBLE) / ci)
        |         * ln(CAST(ci AS DOUBLE) / c) * 1000000000) AS BIGINT)) AS BIGINT) AS h_cond_nano
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q288_disjunctive_revenue" ->
      s"""SELECT p.p_brand,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         |       AND l.l_quantity BETWEEN 1 AND 11)
         |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         |       AND l.l_quantity BETWEEN 10 AND 20)
         |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 20 AND 30)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q289_mannwhitney" ->
      """WITH j AS (
        |  SELECT c.c_mktsegment AS g, CAST(round((o.o_totalprice) * 100) AS BIGINT) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        |), vg AS (
        |  SELECT v, CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM j GROUP BY 1
        |), w AS (
        |  SELECT n1v, cnt,
        |         CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM vg
        |), s AS (
        |  SELECT CAST(sum(n1v * (2 * cb + cnt + 1)) AS BIGINT) AS r1x2,
        |         CAST(sum(n1v) AS BIGINT) AS n1,
        |         CAST(sum(cnt) AS BIGINT) AS n,
        |         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
        |  FROM w
        |), f AS (
        |  SELECT n1, n - n1 AS n2, r1x2 - n1 * (n1 + 1) AS u1_x2, n, ties FROM s
        |)
        |SELECT n1, n2, u1_x2,
        |       CAST(round((CAST(u1_x2 - n1*n2 AS DOUBLE) / 2)
        |         / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
        |         * ((n + 1) - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))
        |         * 1000000000) AS BIGINT) AS z_nano
        |FROM f""".stripMargin,

    "q290_cramers_v" ->
      """WITH d AS (SELECT lang, source FROM documents),
        |cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o FROM d GROUP BY 1, 2),
        |nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM d GROUP BY 1),
        |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
        |t AS (
        |  SELECT CAST(round(CAST(cells.o AS DOUBLE) * cells.o
        |           / (CAST(nl.n_l AS DOUBLE) * ns.n_s) * 1000000000) AS BIGINT) AS t9
        |  FROM cells JOIN nl USING (lang) JOIN ns USING (source)
        |), s AS (SELECT CAST(sum(t9) AS BIGINT) AS s9 FROM t),
        |m AS (SELECT CAST((SELECT count(*) FROM nl) AS BIGINT) AS n_langs,
        |             CAST((SELECT count(*) FROM ns) AS BIGINT) AS n_sources,
        |             CAST((SELECT count(*) FROM d) AS BIGINT) AS n_total),
        |f AS (
        |  SELECT m.n_langs, m.n_sources, m.n_total,
        |         CAST(m.n_total * (s.s9 - 1000000000) AS BIGINT) AS chi2_nano
        |  FROM s, m
        |)
        |SELECT n_langs, n_sources, n_total, chi2_nano,
        |       CAST(round(sqrt(greatest(CAST(chi2_nano AS DOUBLE), CAST(0 AS DOUBLE))
        |         / 1000000000.0 / (CAST(n_total AS DOUBLE) * least(n_langs - 1, n_sources - 1)))
        |         * 1000000) AS BIGINT) AS cramers_v_ppm
        |FROM f""".stripMargin,

    "q291_conformal_coverage" ->
      """WITH o AS (
        |  SELECT c.c_mktsegment AS segment, o.o_orderkey,
        |         CAST(round((o.o_totalprice) * 100) AS BIGINT) AS v,
        |         CAST(concat('0x', substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) % 4 AS fold
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |), pred AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_train,
        |         CAST(sum(v) // count(*) AS BIGINT) AS pred_cents
        |  FROM o WHERE fold < 2 GROUP BY 1
        |), cal AS (
        |  SELECT o.segment, o.o_orderkey, abs(o.v - p.pred_cents) AS resid
        |  FROM o JOIN pred p USING (segment) WHERE o.fold = 2
        |), nc AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_cal,
        |         CAST(least((9 * (count(*) + 1) + 9) // 10, count(*)) AS BIGINT) AS k
        |  FROM cal GROUP BY 1
        |), qh AS (
        |  SELECT segment, n_cal, resid AS qhat_cents
        |  FROM (SELECT cal.segment, cal.resid, nc.n_cal, nc.k,
        |               row_number() OVER (PARTITION BY cal.segment
        |                 ORDER BY cal.resid, cal.o_orderkey) AS r
        |        FROM cal JOIN nc USING (segment))
        |  WHERE r = k
        |)
        |SELECT o.segment, CAST(max(p.n_train) AS BIGINT) AS n_train,
        |       CAST(max(qh.n_cal) AS BIGINT) AS n_cal,
        |       CAST(count(*) AS BIGINT) AS n_test,
        |       CAST(max(p.pred_cents) AS BIGINT) AS pred_cents,
        |       CAST(max(qh.qhat_cents) AS BIGINT) AS qhat_cents,
        |       CAST(sum(CASE WHEN abs(o.v - p.pred_cents) <= qh.qhat_cents
        |                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS coverage_ppm
        |FROM o JOIN pred p USING (segment) JOIN qh USING (segment)
        |WHERE o.fold = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q292_adamic_adar" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |), pw AS (
        |  SELECT a.b AS u, c.b AS v, CAST(count(*) AS BIGINT) AS w
        |  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b GROUP BY 1, 2
        |), r AS (
        |  SELECT u, v, w, row_number() OVER (ORDER BY w, u, v) AS rk,
        |         CAST(count(*) OVER () AS BIGINT) AS np
        |  FROM pw
        |), m AS (
        |  SELECT CAST(sum(CASE WHEN rk = (np + 1) // 2 THEN w END)
        |           + sum(CASE WHEN rk = (np + 2) // 2 THEN w END) AS BIGINT) AS m2
        |  FROM r
        |), edges AS (SELECT u, v FROM pw, m WHERE w * 2 > m.m2),
        |ed AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
        |th AS (
        |  SELECT e1.u AS a, e2.v AS b, e1.v AS wnode
        |  FROM ed e1 JOIN ed e2 ON e1.v = e2.u AND e1.u < e2.v
        |  WHERE NOT EXISTS (SELECT 1 FROM edges x WHERE x.u = e1.u AND x.v = e2.v)
        |)
        |SELECT th.a AS brand_a, th.b AS brand_b, CAST(count(*) AS BIGINT) AS n_common,
        |       CAST(sum(CAST(round(1000000000 / ln(CAST(deg.deg AS DOUBLE))) AS BIGINT)) AS BIGINT)
        |         AS aa_nano
        |FROM th JOIN deg ON deg.node = th.wnode
        |GROUP BY 1, 2
        |ORDER BY aa_nano DESC, brand_a, brand_b
        |LIMIT 25""".stripMargin,

    "q293_calibration_bins" ->
      s"""WITH $qualityCte,
         |nn AS (SELECT doc_id, text, quality FROM qs WHERE text IS NOT NULL),
         |dups AS (SELECT text, CAST(count(*) AS BIGINT) AS n_copies
         |         FROM nn GROUP BY 1),
         |j AS (
         |  SELECT least(CAST(floor(nn.quality * 10) AS BIGINT), 9) AS decile,
         |         CAST(round(nn.quality * 1000000) AS BIGINT) AS q_ppm,
         |         CASE WHEN d.n_copies > 1 THEN 1 ELSE 0 END AS is_dup
         |  FROM nn JOIN dups d USING (text)
         |), g AS (
         |  SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(is_dup) AS BIGINT) AS n_dups,
         |         CAST(sum(q_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
         |         CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_rate_ppm
         |  FROM j GROUP BY 1
         |)
         |SELECT decile, n_docs, n_dups, mean_pred_ppm, dup_rate_ppm,
         |       abs(mean_pred_ppm - dup_rate_ppm) AS gap_ppm
         |FROM g ORDER BY decile""".stripMargin,

    "q294_ndcg_eval" ->
      s"""$ivfAssignCte,
         |q AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |es AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.e[i])) / (q.qn * n.nrm), 6) AS sim
         |  FROM q, n WHERE n.vec_id <> q.query_id
         |), er AS (
         |  SELECT query_id, neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk_exact
         |  FROM es
         |), ex AS (SELECT query_id, neighbor_id, rk_exact FROM er WHERE rk_exact <= 10),
         |qb AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn, bucket FROM asg WHERE vec_id < 5),
         |as2 AS (
         |  SELECT qb.query_id, asg.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, len(qb.qv)+1), i -> qb.qv[i]*asg.e[i])) / (qb.qn * asg.nrm), 6) AS sim
         |  FROM qb JOIN asg USING (bucket) WHERE asg.vec_id <> qb.query_id
         |), ar AS (
         |  SELECT query_id, neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS p
         |  FROM as2
         |), ap AS (SELECT query_id, neighbor_id, p FROM ar WHERE p <= 10),
         |d AS (
         |  SELECT ap.query_id,
         |         CAST(sum(CASE WHEN ex.rk_exact IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |         CAST(sum(CAST(round(coalesce(11 - ex.rk_exact, 0) * 1000000000
         |             / ln(CAST(ap.p + 1 AS DOUBLE))) AS BIGINT)) AS BIGINT) AS dcg_nano
         |  FROM ap LEFT JOIN ex USING (query_id, neighbor_id) GROUP BY 1
         |), i AS (
         |  SELECT query_id,
         |         CAST(sum(CAST(round((11 - rk_exact) * 1000000000
         |             / ln(CAST(rk_exact + 1 AS DOUBLE))) AS BIGINT)) AS BIGINT) AS idcg_nano
         |  FROM ex GROUP BY 1
         |)
         |SELECT d.query_id, d.n_hits, d.dcg_nano, i.idcg_nano,
         |       CAST(d.dcg_nano * 1000000 // i.idcg_nano AS BIGINT) AS ndcg_ppm
         |FROM d JOIN i USING (query_id) ORDER BY d.query_id""".stripMargin,

    "q295_hapax_share" ->
      """WITH w AS (
        |  SELECT source, w FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0
        |), wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_types,
        |         CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |  FROM wc GROUP BY 1
        |)
        |SELECT source, n_types, n_tokens, n_hapax,
        |       CAST(n_hapax * 1000000 // n_types AS BIGINT) AS hapax_ppm
        |FROM g ORDER BY source""".stripMargin,

    "q296_wasserstein" ->
      """WITH j AS (
        |  SELECT c.c_mktsegment AS g, CAST(round((o.o_totalprice) * 100) AS BIGINT) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
        |), vg AS (
        |  SELECT v, CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN g <> 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM j GROUP BY 1
        |), cum AS (
        |  SELECT v,
        |         CAST(sum(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
        |         CAST(sum(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb,
        |         lead(v) OVER (ORDER BY v) - v AS dv
        |  FROM vg
        |), tot AS (
        |  SELECT CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |         CAST(sum(CASE WHEN g <> 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM j
        |), s AS (
        |  SELECT tot.na, tot.nb, CAST(count(*) AS BIGINT) AS n_grid,
        |         sum(abs(cum.ca * tot.nb - cum.cb * tot.na) * cum.dv) AS s
        |  FROM cum, tot WHERE cum.dv IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT na, nb, n_grid, CAST(s // (na * nb) AS BIGINT) AS w1_cents FROM s""".stripMargin,

    "q297_fellegi_sunter" ->
      s"""$minhashCte,
         |dd AS (SELECT doc_id, md5(text) AS th, lang, source, n_chars
         |       FROM documents WHERE text IS NOT NULL),
         |pf AS (
         |  SELECT CASE WHEN a.th = b.th THEN 1 ELSE 0 END AS is_match,
         |         CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS f_same_lang,
         |         CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS f_same_source,
         |         CASE WHEN abs(a.n_chars - b.n_chars) * 10 <= greatest(a.n_chars, b.n_chars)
         |              THEN 1 ELSE 0 END AS f_len_close
         |  FROM cand
         |  JOIN dd a ON a.doc_id = cand.doc_a
         |  JOIN dd b ON b.doc_id = cand.doc_b
         |), u AS (
         |  SELECT 'same_lang' AS feature, is_match, f_same_lang AS f FROM pf
         |  UNION ALL SELECT 'same_source', is_match, f_same_source FROM pf
         |  UNION ALL SELECT 'len_close', is_match, f_len_close FROM pf
         |), g AS (
         |  SELECT feature, CAST(sum(is_match) AS BIGINT) AS n_match,
         |         CAST(sum(1 - is_match) AS BIGINT) AS n_nonmatch,
         |         CAST(sum(f * is_match) AS BIGINT) AS nf_match,
         |         CAST(sum(f * (1 - is_match)) AS BIGINT) AS nf_nonmatch
         |  FROM u GROUP BY 1
         |), z AS (
         |  SELECT feature, n_match, n_nonmatch, nf_match, nf_nonmatch,
         |         CAST((nf_match + 1) * 1000000 // (n_match + 2) AS BIGINT) AS m_ppm,
         |         CAST((nf_nonmatch + 1) * 1000000 // (n_nonmatch + 2) AS BIGINT) AS u_ppm
         |  FROM g
         |)
         |SELECT feature, n_match, n_nonmatch, nf_match, nf_nonmatch, m_ppm, u_ppm,
         |       CAST(round(ln(CAST(m_ppm AS DOUBLE) / u_ppm) * 1000000000) AS BIGINT) AS w_nano
         |FROM z ORDER BY feature""".stripMargin,

    "q298_burstiness" ->
      """WITH w AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0
        |), tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
        |g AS (
        |  SELECT w, CAST(sum(c) AS BIGINT) AS cf, CAST(count(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1
        |)
        |SELECT w AS term, cf, df, CAST(cf * 1000000 // df AS BIGINT) AS burstiness_ppm
        |FROM g WHERE df >= 5
        |ORDER BY burstiness_ppm DESC, term
        |LIMIT 25""".stripMargin,

    "q299_twopass_quantiles" ->
      """WITH v AS (SELECT CAST(round((o_totalprice) * 100) AS BIGINT) AS v FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |p AS (SELECT CAST(unnest([50, 95, 99]) AS BIGINT) AS p),
        |k AS (SELECT p.p, CAST((p.p * n.n + 99) // 100 AS BIGINT) AS k FROM p, n),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v)
        |SELECT k.p AS pct, k.k, r.v AS value_cents
        |FROM k JOIN r ON r.rk = k.k
        |ORDER BY pct""".stripMargin,

    "q300_pipeline_card" ->
      s"""WITH RECURSIVE $qualityCte,
         |qb AS (SELECT qs.doc_id, qs.text, qs.n_words, qs.quality, d.source
         |       FROM qs JOIN documents d USING (doc_id)),
         |s14 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS d1,
         |         CAST(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         |         CAST(sum(CASE WHEN text IS NOT NULL AND source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS d3,
         |         CAST(sum(CASE WHEN text IS NOT NULL AND source <> 'src0' AND quality >= 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
         |         CAST(sum(coalesce(n_words, 0)) AS BIGINT) AS t1,
         |         CAST(sum(CASE WHEN text IS NOT NULL THEN n_words ELSE 0 END) AS BIGINT) AS t2,
         |         CAST(sum(CASE WHEN text IS NOT NULL AND source <> 'src0' THEN n_words ELSE 0 END) AS BIGINT) AS t3,
         |         CAST(sum(CASE WHEN text IS NOT NULL AND source <> 'src0' AND quality >= 0.45 THEN n_words ELSE 0 END) AS BIGINT) AS t4
         |  FROM qb
         |),
         |t4s AS (SELECT doc_id, text, n_words FROM qb
         |        WHERE text IS NOT NULL AND source <> 'src0' AND quality >= 0.45),
         |k5 AS (SELECT text, min(doc_id) AS keep_id FROM t4s GROUP BY 1),
         |t5 AS (SELECT t4s.doc_id, t4s.text, t4s.n_words
         |       FROM t4s JOIN k5 ON k5.text = t4s.text AND k5.keep_id = t4s.doc_id),
         |${minhashChain("t5")},
         |$ccLosersChain,
         |t6 AS (SELECT * FROM t5 WHERE doc_id NOT IN (SELECT doc_b FROM losers)),
         |w5 AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM t6),
         |g5 AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(ws) >= 5
         |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5])
         |               for i in range(0, len(ws)-4)]
         |         ELSE [text] END) AS s
         |  FROM w5
         |), ev5 AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM qb
         |  WHERE source = 'src0' AND text IS NOT NULL
         |), ge5 AS (
         |  SELECT unnest(
         |    CASE WHEN len(ws) >= 5
         |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5])
         |               for i in range(0, len(ws)-4)]
         |         ELSE [text] END) AS s
         |  FROM ev5
         |), eg5 AS (SELECT DISTINCT CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk FROM ge5),
         |tg5 AS (SELECT DISTINCT doc_id, CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk FROM g5),
         |bad AS (SELECT DISTINCT tg5.doc_id FROM tg5 JOIN eg5 USING (sk)),
         |t7 AS (SELECT * FROM t6 WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
         |u AS (
         |  SELECT 1 AS stage_id, 'raw' AS stage, d1 AS n_docs, t1 AS n_tokens FROM s14
         |  UNION ALL SELECT 2, 'nonnull', d2, t2 FROM s14
         |  UNION ALL SELECT 3, 'train_split', d3, t3 FROM s14
         |  UNION ALL SELECT 4, 'quality', d4, t4 FROM s14
         |  UNION ALL SELECT 5, 'exact_dedup', CAST(count(*) AS BIGINT),
         |            CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM t5
         |  UNION ALL SELECT 6, 'near_dedup', CAST(count(*) AS BIGINT),
         |            CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM t6
         |  UNION ALL SELECT 7, 'decontam', CAST(count(*) AS BIGINT),
         |            CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM t7
         |)
         |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage, n_docs, n_tokens,
         |       CAST(n_docs * 1000000 // (SELECT d1 FROM s14) AS BIGINT) AS survival_ppm
         |FROM u ORDER BY stage_id""".stripMargin,

    "q301_part_leaders" ->
      """WITH li AS (
        |  SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_name LIKE '%widget%'
        |), ps AS (
        |  SELECT l_partkey, l_suppkey, CAST(sum(q) AS BIGINT) AS q_ps
        |  FROM li GROUP BY 1, 2
        |), lead AS (
        |  SELECT l_partkey, l_suppkey, q_ps
        |  FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
        |          ORDER BY q_ps DESC, l_suppkey) AS rk FROM ps)
        |  WHERE rk = 1
        |), g AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_led,
        |         CAST(sum(q_ps) AS BIGINT) AS led_qty
        |  FROM lead GROUP BY 1
        |)
        |SELECT s.s_name, g.n_led, g.led_qty
        |FROM g JOIN supplier s ON s.s_suppkey = g.l_suppkey
        |ORDER BY n_led DESC, s_name
        |LIMIT 20""".stripMargin,

    "q302_part_supplier_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 20""".stripMargin,

    "q303_keeper_hops" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |d0 AS (
         |  SELECT u, CAST(CASE WHEN u = l THEN 0 ELSE 1000000 END AS BIGINT) AS d FROM lbl
         |), n1 AS (
         |  SELECT und.v AS u, CAST(min(d0.d) + 1 AS BIGINT) AS nd
         |  FROM und JOIN d0 ON d0.u = und.u GROUP BY 1
         |), d1 AS (
         |  SELECT d0.u, CAST(least(d0.d, coalesce(n1.nd, 1000000)) AS BIGINT) AS d
         |  FROM d0 LEFT JOIN n1 USING (u)
         |), n2 AS (
         |  SELECT und.v AS u, CAST(min(d1.d) + 1 AS BIGINT) AS nd
         |  FROM und JOIN d1 ON d1.u = und.u GROUP BY 1
         |), d2 AS (
         |  SELECT d1.u, CAST(least(d1.d, coalesce(n2.nd, 1000000)) AS BIGINT) AS d
         |  FROM d1 LEFT JOIN n2 USING (u)
         |), n3 AS (
         |  SELECT und.v AS u, CAST(min(d2.d) + 1 AS BIGINT) AS nd
         |  FROM und JOIN d2 ON d2.u = und.u GROUP BY 1
         |), d3 AS (
         |  SELECT d2.u, CAST(least(d2.d, coalesce(n3.nd, 1000000)) AS BIGINT) AS d
         |  FROM d2 LEFT JOIN n3 USING (u)
         |)
         |SELECT CAST(CASE WHEN d >= 1000000 THEN -1 ELSE d END AS BIGINT) AS hop,
         |       CAST(count(*) AS BIGINT) AS n_nodes
         |FROM d3 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q304_heldout_nll" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |meta AS (
        |  SELECT doc_id, source,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 2 AS fold
        |  FROM w
        |), bg0 AS (
        |  SELECT doc_id, unnest([concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]) AS s
        |  FROM w WHERE len(ws) >= 2
        |), bg AS (
        |  SELECT bg0.doc_id, meta.source, meta.fold,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk,
        |         CAST(concat('0x', substr(md5(split_part(s, ' ', 1)), 1, 12)) AS BIGINT) AS wk
        |  FROM bg0 JOIN meta USING (doc_id)
        |), tr AS (SELECT * FROM bg WHERE fold = 0),
        |te AS (SELECT * FROM bg WHERE fold = 1),
        |bc AS (SELECT sk, CAST(count(*) AS BIGINT) AS cb FROM tr GROUP BY 1),
        |ctx AS (SELECT wk, CAST(count(*) AS BIGINT) AS cw FROM tr GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ctx),
        |t AS (
        |  SELECT te.source,
        |         CAST(round(ln(CAST(coalesce(bc.cb, 0) + 1 AS DOUBLE)
        |           / (coalesce(ctx.cw, 0) + v.v)) * 1000000000) AS BIGINT) AS t9,
        |         CASE WHEN ctx.cw IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM te LEFT JOIN bc USING (sk) LEFT JOIN ctx USING (wk), v
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST((-CAST(sum(t9) AS HUGEINT)) // count(*) AS BIGINT) AS avg_nll_nano,
        |       CAST(sum(oov) * 1000000 // count(*) AS BIGINT) AS oov_ppm
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q305_weighted_jaccard" ->
      s"""$minhashCte,
         |ww AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE text IS NOT NULL)
         |  WHERE length(w) > 0
         |), tf AS (SELECT doc_id, w AS wd, CAST(count(*) AS BIGINT) AS c FROM ww GROUP BY 1, 2),
         |inter AS (
         |  SELECT cand.doc_a, cand.doc_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS smin
         |  FROM cand
         |  JOIN tf a ON a.doc_id = cand.doc_a
         |  JOIN tf b ON b.doc_id = cand.doc_b AND b.wd = a.wd
         |  GROUP BY 1, 2
         |), tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM tf GROUP BY 1)
         |SELECT cand.doc_a, cand.doc_b,
         |       CAST(coalesce(inter.smin, 0) AS BIGINT) AS smin,
         |       CAST(ta.tot + tb.tot - coalesce(inter.smin, 0) AS BIGINT) AS smax,
         |       CAST(coalesce(inter.smin, 0) * 1000000
         |            // (ta.tot + tb.tot - coalesce(inter.smin, 0)) AS BIGINT) AS wjaccard_ppm
         |FROM cand
         |LEFT JOIN inter ON inter.doc_a = cand.doc_a AND inter.doc_b = cand.doc_b
         |JOIN tot ta ON ta.doc_id = cand.doc_a
         |JOIN tot tb ON tb.doc_id = cand.doc_b
         |ORDER BY cand.doc_a, cand.doc_b""".stripMargin,

    "q306_did_revenue" ->
      """WITH j AS (
        |  SELECT c.c_mktsegment AS g,
        |         (o.o_orderdate >= DATE '1998-01-01') AS post,
        |         CAST(round((o.o_totalprice) * 100) AS BIGINT) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        |), m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN g = 'BUILDING' AND NOT post THEN v ELSE 0 END)
        |      // sum(CASE WHEN g = 'BUILDING' AND NOT post THEN 1 ELSE 0 END) AS BIGINT)
        |      AS treat_pre_cents,
        |    CAST(sum(CASE WHEN g = 'BUILDING' AND post THEN v ELSE 0 END)
        |      // sum(CASE WHEN g = 'BUILDING' AND post THEN 1 ELSE 0 END) AS BIGINT)
        |      AS treat_post_cents,
        |    CAST(sum(CASE WHEN g = 'MACHINERY' AND NOT post THEN v ELSE 0 END)
        |      // sum(CASE WHEN g = 'MACHINERY' AND NOT post THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ctrl_pre_cents,
        |    CAST(sum(CASE WHEN g = 'MACHINERY' AND post THEN v ELSE 0 END)
        |      // sum(CASE WHEN g = 'MACHINERY' AND post THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ctrl_post_cents
        |  FROM j
        |)
        |SELECT treat_pre_cents, treat_post_cents, ctrl_pre_cents, ctrl_post_cents,
        |       CAST((treat_post_cents - treat_pre_cents)
        |            - (ctrl_post_cents - ctrl_pre_cents) AS BIGINT) AS did_cents
        |FROM m""".stripMargin,

    "q307_rbo_eval" ->
      s"""$ivfAssignCte,
         |q AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |es AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.e[i])) / (q.qn * n.nrm), 6) AS sim
         |  FROM q, n WHERE n.vec_id <> q.query_id
         |), er AS (
         |  SELECT query_id, neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk_exact
         |  FROM es
         |), ex AS (SELECT query_id, neighbor_id, rk_exact FROM er WHERE rk_exact <= 10),
         |qb AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn, bucket FROM asg WHERE vec_id < 5),
         |as2 AS (
         |  SELECT qb.query_id, asg.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, len(qb.qv)+1), i -> qb.qv[i]*asg.e[i])) / (qb.qn * asg.nrm), 6) AS sim
         |  FROM qb JOIN asg USING (bucket) WHERE asg.vec_id <> qb.query_id
         |), ar AS (
         |  SELECT query_id, neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS p
         |  FROM as2
         |), ap AS (SELECT query_id, neighbor_id, p FROM ar WHERE p <= 10),
         |mm AS (
         |  SELECT ap.query_id, greatest(ex.rk_exact, ap.p) AS dmin
         |  FROM ap JOIN ex USING (query_id, neighbor_id)
         |), dd AS (
         |  SELECT CAST(d AS BIGINT) AS d, CAST(p9 AS BIGINT) AS p9, CAST(p10d AS BIGINT) AS p10d
         |  FROM (VALUES (1, 1, 10), (2, 9, 100), (3, 81, 1000), (4, 729, 10000),
         |        (5, 6561, 100000), (6, 59049, 1000000), (7, 531441, 10000000),
         |        (8, 4782969, 100000000), (9, 43046721, 1000000000),
         |        (10, 387420489, 10000000000)) AS t(d, p9, p10d)
         |), ov AS (
         |  SELECT mm.query_id, dd.d, CAST(count(*) AS BIGINT) AS a
         |  FROM mm JOIN dd ON dd.d >= mm.dmin GROUP BY 1, 2
         |), grid AS (SELECT DISTINCT query_id FROM ex),
         |g2 AS (
         |  SELECT grid.query_id, dd.d, dd.p9, dd.p10d, coalesce(ov.a, 0) AS a
         |  FROM grid CROSS JOIN dd
         |  LEFT JOIN ov ON ov.query_id = grid.query_id AND ov.d = dd.d
         |)
         |SELECT query_id,
         |       CAST(sum((a * p9 * 1000000000) // (d * p10d)) AS BIGINT) AS rbo_nano
         |FROM g2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q308_hill_tail_index" ->
      """WITH top AS (
        |  SELECT CAST(round((o_totalprice) * 100) AS BIGINT) AS v
        |  FROM orders ORDER BY v DESC LIMIT 100
        |), xk AS (SELECT CAST(min(v) AS BIGINT) AS xk FROM top),
        |t AS (
        |  SELECT CAST(round(ln(CAST(top.v AS DOUBLE) / xk.xk) * 1000000000) AS BIGINT) AS t9,
        |         xk.xk
        |  FROM top, xk
        |), g AS (
        |  SELECT xk, CAST(count(*) AS BIGINT) AS k, CAST(sum(t9) AS BIGINT) AS s9
        |  FROM t GROUP BY 1
        |)
        |SELECT k, xk AS xk_cents, CAST(s9 // (k - 1) AS BIGINT) AS hill_nano,
        |       CAST(CASE WHEN s9 // (k - 1) > 0
        |                 THEN 1000000000000000 // (s9 // (k - 1)) END AS BIGINT) AS alpha_ppm
        |FROM g""".stripMargin,

    "q309_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
        |         CAST(round((o_totalprice) * 100) AS BIGINT) AS v
        |  FROM orders
        |), f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1),
        |sz AS (SELECT m0, CAST(count(*) AS BIGINT) AS n_cust FROM f GROUP BY 1),
        |rev AS (
        |  SELECT f.m0, o.m - f.m0 AS age, CAST(sum(o.v) AS BIGINT) AS rev_cents
        |  FROM o JOIN f USING (o_custkey) GROUP BY 1, 2
        |), c AS (
        |  SELECT m0, age, rev_cents,
        |         CAST(sum(rev_cents) OVER (PARTITION BY m0 ORDER BY age
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |  FROM rev
        |)
        |SELECT c.m0 AS cohort_month, c.age, sz.n_cust, c.rev_cents, c.cum_cents,
        |       CAST(c.cum_cents // sz.n_cust AS BIGINT) AS ltv_cents
        |FROM c JOIN sz USING (m0)
        |ORDER BY cohort_month, age""".stripMargin,

    "q310_jaro_winkler" ->
      """WITH b AS (SELECT p_partkey AS k, p_brand, p_type, p_name FROM part),
        |j AS (
        |  SELECT a.k AS part_a, c.k AS part_b, a.p_brand AS brand,
        |         round(jaro_winkler_similarity(a.p_name, c.p_name), 6) AS jw_r6
        |  FROM b a JOIN b c ON a.p_brand = c.p_brand AND a.p_type = c.p_type
        |                    AND a.k < c.k AND a.p_name <> c.p_name
        |)
        |SELECT part_a, part_b, brand, jw_r6 FROM j WHERE jw_r6 >= 0.88
        |ORDER BY jw_r6 DESC, part_a, part_b LIMIT 25""".stripMargin,

    "q311_postings_size" ->
      s"""$postingsCte,
        |b AS (SELECT w, chunk, CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
        |                            WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
        |                            ELSE 5 END AS vb FROM g)
        |SELECT w AS term, CAST(count(*) AS BIGINT) AS df,
        |       CAST(count(DISTINCT chunk) AS BIGINT) AS n_chunks,
        |       CAST(sum(vb) AS BIGINT) AS vbyte_bytes,
        |       CAST(sum(vb) * 1000000 // count(*) AS BIGINT) AS bytes_per_posting_ppm
        |FROM b GROUP BY 1 ORDER BY vbyte_bytes DESC, term LIMIT 20""".stripMargin,

    "q312_bitmap_containers" ->
      s"""$postingsCte,
        |ch AS (SELECT w, chunk, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(run_start) AS BIGINT) AS n_runs
        |       FROM g GROUP BY 1, 2),
        |cost AS (
        |  SELECT n, n*2 AS array_bytes,
        |         CASE WHEN n*2 <= n_runs*4+2 AND n*2 <= 8192 THEN 'array'
        |              WHEN n_runs*4+2 <= 8192 THEN 'run' ELSE 'bitmap' END AS container,
        |         least(n*2, n_runs*4+2, 8192) AS bytes
        |  FROM ch
        |)
        |SELECT container, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(n) AS BIGINT) AS n_postings,
        |       CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |       CAST(sum(array_bytes) AS BIGINT) AS array_cost_bytes,
        |       CAST((sum(array_bytes) - sum(bytes)) * 1000000 // sum(array_bytes) AS BIGINT)
        |         AS saving_ppm
        |FROM cost GROUP BY 1 ORDER BY container""".stripMargin,

    "q313_hard_negatives" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
        |n AS (SELECT vec_id, label, e,
        |             sqrt(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*e[i]))) AS nrm
        |      FROM v),
        |q AS (SELECT vec_id AS query_id, label AS q_label, e AS qv, nrm AS qn
        |      FROM n WHERE vec_id < 8),
        |s AS (
        |  SELECT q.query_id, q.q_label, n.vec_id AS cand_id, n.label AS cand_label,
        |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.e[i])) / (q.qn * n.nrm), 6) AS sim
        |  FROM q, n WHERE n.vec_id <> q.query_id
        |), p AS (
        |  SELECT query_id, cand_id, sim, cand_label = q_label AS is_pos,
        |         row_number() OVER (PARTITION BY query_id, cand_label = q_label
        |                            ORDER BY sim DESC, cand_id) AS rk
        |  FROM s
        |)
        |SELECT q.query_id, CAST(q.q_label AS BIGINT) AS label,
        |       pos.cand_id AS pos_id, pos.sim AS pos_sim,
        |       neg.cand_id AS neg_id, neg.sim AS neg_sim,
        |       round(pos.sim - neg.sim, 6) AS margin
        |FROM q
        |LEFT JOIN (SELECT * FROM p WHERE is_pos AND rk = 1) pos ON pos.query_id = q.query_id
        |LEFT JOIN (SELECT * FROM p WHERE NOT is_pos AND rk = 1) neg ON neg.query_id = q.query_id
        |ORDER BY q.query_id""".stripMargin,

    "q314_cuped" ->
      """WITH o AS (SELECT o_custkey, o_orderdate < TIMESTAMP '1998-01-01' AS pre,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |cust AS (SELECT o_custkey,
        |                CAST(sum(CASE WHEN pre THEN v ELSE 0 END) AS BIGINT) AS x,
        |                CAST(sum(CASE WHEN NOT pre THEN v ELSE 0 END) AS BIGINT) AS y
        |         FROM o GROUP BY 1),
        |g AS (SELECT x, y,
        |             CAST(concat('0x', substr(md5('cuped#' || CAST(o_custkey AS VARCHAR)), 1, 12)) AS BIGINT) % 2 AS grp
        |      FROM cust),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n_t,
        |             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n_c,
        |             CAST(sum(CASE WHEN grp = 1 THEN x ELSE 0 END) AS HUGEINT) AS sx_t,
        |             CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS HUGEINT) AS sx_c,
        |             CAST(sum(CASE WHEN grp = 1 THEN y ELSE 0 END) AS HUGEINT) AS sy_t,
        |             CAST(sum(CASE WHEN grp = 0 THEN y ELSE 0 END) AS HUGEINT) AS sy_c
        |      FROM g),
        |d AS (SELECT *, n*sxy - sx*sy AS cov, n*sxx - sx*sx AS varx,
        |             n*syy - sy*sy AS vary FROM m),
        |t AS (SELECT *, cov * 1000000 // varx AS theta_ppm, sx // n AS mx FROM d),
        |a AS (SELECT *,
        |             sy_t // n_t - theta_ppm * (sx_t // n_t - mx) // 1000000 AS adj_t,
        |             sy_c // n_c - theta_ppm * (sx_c // n_c - mx) // 1000000 AS adj_c
        |      FROM t)
        |SELECT CAST(n_t AS BIGINT) AS n_treat, CAST(n_c AS BIGINT) AS n_ctrl,
        |       CAST(theta_ppm AS BIGINT) AS theta_ppm,
        |       CAST(sy_t // n_t AS BIGINT) AS mean_treat_cents,
        |       CAST(sy_c // n_c AS BIGINT) AS mean_ctrl_cents,
        |       CAST(sy_t // n_t - sy_c // n_c AS BIGINT) AS raw_lift_cents,
        |       CAST(adj_t - adj_c AS BIGINT) AS adj_lift_cents,
        |       CAST((cov // 1000000000000) * (cov // 1000000000000) * 1000000
        |            // ((varx // 1000000000000) * (vary // 1000000000000)) AS BIGINT)
        |         AS var_reduction_ppm
        |FROM a""".stripMargin,

    "q315_isotonic_calibration" ->
      s"""WITH $qualityCte,
        |nn AS (SELECT doc_id, text, quality FROM qs WHERE text IS NOT NULL),
        |dups AS (SELECT text, CAST(count(*) AS BIGINT) AS n_copies FROM nn GROUP BY 1),
        |jj AS (
        |  SELECT least(CAST(floor(nn.quality * 10) AS BIGINT), 9) AS decile,
        |         CASE WHEN d.n_copies > 1 THEN 1 ELSE 0 END AS is_dup
        |  FROM nn JOIN dups d USING (text)
        |),
        |bins AS (SELECT decile, CAST(count(*) AS BIGINT) AS w,
        |                CAST(sum(is_dup) AS BIGINT) AS sdup FROM jj GROUP BY 1),
        |pre AS (SELECT decile, w, sdup,
        |               CAST(sum(w) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        |               CAST(sum(sdup) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
        |        FROM bins),
        |iv AS (SELECT l.decile AS j, r.decile AS k,
        |              (r.cs - (l.cs - l.sdup)) * 1000000 // (r.cw - (l.cw - l.w)) AS avg_ppm
        |       FROM pre l, pre r WHERE l.decile <= r.decile),
        |tri AS (SELECT j, avg_ppm, unnest(range(j, k + 1)) AS i FROM iv),
        |mn AS (SELECT i, j, min(avg_ppm) AS mn FROM tri GROUP BY 1, 2),
        |iso AS (SELECT i, CAST(max(mn) AS BIGINT) AS iso_rate_ppm FROM mn GROUP BY 1)
        |SELECT b.decile, b.w AS n_docs,
        |       CAST(b.sdup * 1000000 // b.w AS BIGINT) AS raw_rate_ppm,
        |       iso.iso_rate_ppm
        |FROM bins b JOIN iso ON iso.i = b.decile ORDER BY b.decile""".stripMargin,

    "q316_jl_distortion" ->
      """WITH signs AS (
        |  SELECT i, j, CASE WHEN CAST(concat('0x', substr(md5('jl#' || CAST(i AS VARCHAR) || '#' || CAST(j AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 0
        |               THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT x // 16 AS i, x % 16 AS j FROM range(1024) t(x))
        |),
        |comps AS (
        |  SELECT vec_id, u.i,
        |         CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS x6
        |  FROM embeddings, (SELECT unnest(range(0, 64)) AS i) u
        |),
        |proj AS (SELECT vec_id, j, CAST(sum(x6 * sgn) AS BIGINT) AS p
        |         FROM comps JOIN signs USING (i) GROUP BY 1, 2),
        |pq AS (SELECT vec_id AS query_id, j, p AS q6 FROM proj WHERE vec_id < 8),
        |pr AS (SELECT pq.query_id, proj.vec_id AS cand_id,
        |              CAST(sum(pq.q6 * proj.p) AS BIGINT) AS dotp,
        |              CAST(sum(pq.q6 * pq.q6) AS BIGINT) AS nq2,
        |              CAST(sum(proj.p * proj.p) AS BIGINT) AS nc2
        |       FROM proj JOIN pq USING (j) WHERE proj.vec_id <> pq.query_id
        |       GROUP BY 1, 2),
        |cp AS (SELECT query_id, cand_id,
        |              round(CAST(dotp AS DOUBLE) /
        |                    (sqrt(CAST(nq2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE))), 6) AS cos_proj
        |       FROM pr),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e,
        |             sqrt(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*e[i]))) AS nrm
        |      FROM v),
        |q AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn FROM n WHERE vec_id < 8),
        |ex AS (
        |  SELECT q.query_id, n.vec_id AS cand_id,
        |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.e[i])) / (q.qn * n.nrm), 6) AS cos_exact
        |  FROM q, n WHERE n.vec_id <> q.query_id
        |),
        |e AS (SELECT cp.query_id,
        |             abs(CAST(round((cp.cos_proj - ex.cos_exact) * 1000000) AS BIGINT)) AS err_ppm
        |      FROM cp JOIN ex ON ex.query_id = cp.query_id AND ex.cand_id = cp.cand_id)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_cands,
        |       CAST(sum(err_ppm) // count(*) AS BIGINT) AS mean_err_ppm,
        |       CAST(max(err_ppm) AS BIGINT) AS max_err_ppm
        |FROM e GROUP BY 1 ORDER BY query_id""".stripMargin,

    "q317_corpus_diversity" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |hh AS (SELECT doc_id,
        |              CAST(concat('0x', substr(md5('div#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
        |       FROM base),
        |bk AS (SELECT doc_id, h, h % 256 AS bucket FROM hh),
        |lo AS (SELECT bucket, doc_id AS doc_a FROM (
        |         SELECT bucket, doc_id,
        |                row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rk
        |         FROM bk) WHERE rk = 1),
        |hi AS (SELECT bucket, doc_id AS doc_b FROM (
        |         SELECT bucket, doc_id,
        |                row_number() OVER (PARTITION BY bucket ORDER BY h DESC, doc_id DESC) AS rk
        |         FROM bk) WHERE rk = 1),
        |pairs AS (SELECT lo.bucket, doc_a, doc_b FROM lo JOIN hi USING (bucket)
        |          WHERE doc_a <> doc_b),
        |w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM base),
        |g AS (SELECT DISTINCT doc_id, s FROM (
        |        SELECT doc_id, unnest(
        |          CASE WHEN len(ws) >= 3
        |               THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]) for i in range(0, len(ws)-2)]
        |               ELSE [text] END) AS s
        |        FROM w)),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY 1),
        |inter AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS inter
        |          FROM pairs p JOIN g ga ON ga.doc_id = p.doc_a
        |                       JOIN g gb ON gb.doc_id = p.doc_b AND gb.s = ga.s
        |          GROUP BY 1, 2),
        |jj AS (SELECT coalesce(i.inter, 0) * 1000000
        |                // (sa.sz + sb.sz - coalesce(i.inter, 0)) AS jac_ppm
        |       FROM pairs p
        |       LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        |       JOIN sizes sa ON sa.doc_id = p.doc_a
        |       JOIN sizes sb ON sb.doc_id = p.doc_b)
        |SELECT CAST(CASE WHEN jac_ppm = 0 THEN 0
        |                 WHEN jac_ppm < 1000 THEN 1 WHEN jac_ppm < 10000 THEN 2
        |                 WHEN jac_ppm < 100000 THEN 3 ELSE 4 END AS BIGINT) AS band,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(jac_ppm) // count(*) AS BIGINT) AS mean_jac_ppm
        |FROM jj GROUP BY 1 ORDER BY band""".stripMargin,

    "q318_negative_sampling" ->
      """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w
        |               FROM documents WHERE text IS NOT NULL),
        |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM words
        |        WHERE length(w) > 0 GROUP BY 1),
        |vocab AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 256),
        |wt AS (SELECT w, c, CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS wt
        |       FROM vocab),
        |rg AS (SELECT w, c, wt,
        |              CAST(coalesce(sum(wt) OVER (ORDER BY c DESC, w
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS lo
        |       FROM wt),
        |tt AS (SELECT CAST(sum(wt) AS BIGINT) AS t FROM wt),
        |dr AS (SELECT x AS draw,
        |              CAST(concat('0x', substr(md5('ns#' || CAST(x AS VARCHAR)), 1, 12)) AS BIGINT) % tt.t AS u
        |       FROM range(1000) r(x), tt),
        |hits AS (SELECT rg.w, rg.wt, CAST(count(*) AS BIGINT) AS drawn
        |         FROM dr JOIN rg ON dr.u >= rg.lo AND dr.u < rg.lo + rg.wt
        |         GROUP BY 1, 2)
        |SELECT h.w AS token,
        |       CAST(h.wt * 1000000 // tt.t AS BIGINT) AS expected_ppm,
        |       h.drawn,
        |       CAST(h.drawn * 1000 AS BIGINT) AS drawn_ppm,
        |       CAST(abs(h.drawn * 1000 - h.wt * 1000000 // tt.t) AS BIGINT) AS gap_ppm
        |FROM hits h, tt ORDER BY drawn DESC, token LIMIT 20""".stripMargin,

    "q319_index_formats" ->
      s"""$postingsCte,
        |vb AS (SELECT 'vbyte' AS format,
        |              CAST(sum(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
        |                            WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
        |                            ELSE 5 END) AS BIGINT) AS total_bytes,
        |              CAST(count(*) AS BIGINT) AS n_postings
        |       FROM g),
        |efc AS (SELECT w, chunk, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1, 2),
        |ef AS (SELECT 'elias_fano' AS format,
        |              CAST(sum((n * (length(bin(65536 // n)) - 1 + 2) + 7) // 8) AS BIGINT)
        |                AS total_bytes,
        |              CAST(sum(n) AS BIGINT) AS n_postings
        |       FROM efc),
        |rc AS (SELECT w, chunk, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(run_start) AS BIGINT) AS n_runs FROM g GROUP BY 1, 2),
        |ro AS (SELECT 'roaring' AS format,
        |              CAST(sum(least(n*2, n_runs*4+2, 8192)) AS BIGINT) AS total_bytes,
        |              CAST(sum(n) AS BIGINT) AS n_postings
        |       FROM rc),
        |u AS (SELECT * FROM vb UNION ALL SELECT * FROM ef UNION ALL SELECT * FROM ro)
        |SELECT format, total_bytes, n_postings,
        |       CAST(total_bytes * 1000000 // n_postings AS BIGINT) AS bytes_per_posting_ppm
        |FROM u ORDER BY format""".stripMargin,

    "q320_damerau_linkage" ->
      """WITH b AS (SELECT p_partkey AS k, p_brand, p_type, p_name FROM part)
        |SELECT a.k AS part_a, c.k AS part_b, a.p_brand AS brand,
        |       CAST(levenshtein(a.p_name, c.p_name) AS BIGINT) AS lev,
        |       CAST(damerau_levenshtein(a.p_name, c.p_name) AS BIGINT) AS dl
        |FROM b a JOIN b c ON a.p_brand = c.p_brand AND a.p_type = c.p_type AND a.k < c.k
        |WHERE damerau_levenshtein(a.p_name, c.p_name) < levenshtein(a.p_name, c.p_name)
        |ORDER BY dl, part_a, part_b LIMIT 25""".stripMargin,
  )
}
