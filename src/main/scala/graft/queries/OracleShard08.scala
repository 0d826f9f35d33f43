package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard08 {
  val defs: Map[String, String] = Map(

    "q449_shingle_sensitivity" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |  FROM documents WHERE text IS NOT NULL
        |), gr AS (
        |  SELECT CAST(2 AS BIGINT) AS n, doc_id,
        |         unnest(list_distinct(list_transform(range(1, len(ws) - 0),
        |           i -> array_to_string(list_slice(ws, i, i + 1), ' ')))) AS gram
        |  FROM base WHERE len(ws) >= 2
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), doc_id,
        |         unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |           i -> array_to_string(list_slice(ws, i, i + 2), ' '))))
        |  FROM base WHERE len(ws) >= 3
        |  UNION ALL
        |  SELECT CAST(5 AS BIGINT), doc_id,
        |         unnest(list_distinct(list_transform(range(1, len(ws) - 3),
        |           i -> array_to_string(list_slice(ws, i, i + 4), ' '))))
        |  FROM base WHERE len(ws) >= 5
        |), shared AS (SELECT n, gram, count(*) AS cd FROM gr GROUP BY 1, 2),
        |st AS (
        |  SELECT n, CAST(count(*) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_grams
        |  FROM shared GROUP BY 1
        |), tc AS (
        |  SELECT gr.n, CAST(count(DISTINCT gr.doc_id) AS BIGINT) AS n_docs_touched
        |  FROM gr JOIN shared ON gr.n = shared.n AND gr.gram = shared.gram
        |  WHERE shared.cd > 1 GROUP BY 1
        |)
        |SELECT st.n, st.n_grams, st.n_shared_grams,
        |       CAST(coalesce(tc.n_docs_touched, 0) AS BIGINT) AS n_docs_touched
        |FROM st LEFT JOIN tc ON st.n = tc.n ORDER BY st.n""".stripMargin,

    "q450_user_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |), u AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS nu,
        |         CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
        |              AS BIGINT) AS sl
        |  FROM c GROUP BY 1
        |), h AS (
        |  SELECT user_id,
        |         CAST(round(ln(CAST(nu AS DOUBLE)) * 1000000) AS BIGINT) - sl // nu AS h_micro
        |  FROM u
        |)
        |SELECT h_micro // 100000 AS bucket, CAST(count(*) AS BIGINT) AS n_users
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    "q451_qte_deciles" ->
      """WITH base AS (
        |  SELECT CAST(concat('0x', substr(md5('qte#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 2 AS arm,
        |         n_chars, doc_id
        |  FROM documents WHERE text IS NOT NULL
        |), rk AS (
        |  SELECT arm, n_chars,
        |         CAST(row_number() OVER (PARTITION BY arm ORDER BY n_chars, doc_id)
        |              AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY arm) AS BIGINT) AS na
        |  FROM base
        |), pick AS (
        |  SELECT d.d, rk.arm, rk.n_chars
        |  FROM rk JOIN (SELECT unnest(range(1, 10)) AS d) d
        |    ON rk.rn = greatest(1, d.d * rk.na // 10)
        |)
        |SELECT CAST(d AS BIGINT) AS decile,
        |       CAST(max(CASE WHEN arm = 0 THEN n_chars END) AS BIGINT) AS v_ctrl,
        |       CAST(max(CASE WHEN arm = 1 THEN n_chars END) AS BIGINT) AS v_treat,
        |       CAST(max(CASE WHEN arm = 1 THEN n_chars END)
        |            - max(CASE WHEN arm = 0 THEN n_chars END) AS BIGINT) AS qte
        |FROM pick GROUP BY 1 ORDER BY 1""".stripMargin,

    "q452_text_embed_corr" ->
      """WITH emb AS (
        |  SELECT vec_id AS doc_id,
        |         CAST(list_sum(list_transform(embedding,
        |                v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
        |                     * CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)))
        |              // 1000000 AS BIGINT) AS y
        |  FROM embeddings
        |), j AS (
        |  SELECT d.n_chars AS x, emb.y
        |  FROM documents d JOIN emb ON d.doc_id = emb.doc_id
        |  WHERE d.text IS NOT NULL
        |), a AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |  FROM j
        |), d2 AS (
        |  SELECT n, n * sxy - sx * sy AS num,
        |         (n * sxx - sx * sx) * (n * syy - sy * sy) AS dd
        |  FROM a
        |), s0 AS (SELECT *, CAST(floor(sqrt(CAST(dd AS DOUBLE))) AS HUGEINT) AS t0 FROM d2),
        |s1 AS (SELECT *, (t0 + dd // t0) // 2 AS t1 FROM s0),
        |s2 AS (SELECT *, (t1 + dd // t1) // 2 AS t2 FROM s1),
        |f AS (
        |  SELECT n, num,
        |         CASE WHEN (t2 + 1) * (t2 + 1) <= dd THEN t2 + 1
        |              WHEN t2 * t2 > dd THEN t2 - 1 ELSE t2 END AS rt
        |  FROM s2
        |)
        |SELECT CAST(n AS BIGINT) AS n_docs,
        |       CAST(CASE WHEN num >= 0 THEN (1000 * num) // rt
        |                 ELSE -((1000 * (-num)) // rt) END AS BIGINT) AS pearson_milli
        |FROM f""".stripMargin,

    "q453_block_bootstrap" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |              // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), rr AS (
        |  SELECT y, CAST(row_number() OVER (ORDER BY mi) AS BIGINT) AS rn FROM rev
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rr),
        |grid AS (
        |  SELECT r.r, j.j,
        |         1 + CAST(concat('0x', substr(md5('bb#' || r.r || '#' || j.j), 1, 12))
        |                  AS BIGINT) % (n - 3) AS start
        |  FROM (SELECT unnest(range(0, 50)) AS r) r,
        |       (SELECT unnest(range(0, 20)) AS j) j, nn
        |  WHERE j.j < n // 4
        |), reps AS (
        |  SELECT g.r, CAST(count(*) AS BIGINT) AS len, CAST(sum(rr.y) AS BIGINT) AS ssum
        |  FROM grid g CROSS JOIN (SELECT unnest(range(0, 4)) AS o) o
        |  JOIN rr ON rr.rn = g.start + o.o
        |  GROUP BY 1
        |), m AS (SELECT r, ssum // len AS m FROM reps),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(m) AS BIGINT) AS sm,
        |         CAST(sum(CAST(m AS HUGEINT) * m) AS BIGINT) AS smm
        |  FROM m
        |), v AS (SELECT b, sm, (CAST(b AS HUGEINT) * smm - CAST(sm AS HUGEINT) * sm)
        |                       // (CAST(b AS HUGEINT) * b) AS v2
        |         FROM a),
        |s0 AS (SELECT *, CAST(floor(sqrt(CAST(v2 AS DOUBLE))) AS HUGEINT) AS t0 FROM v),
        |s1 AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + v2 // t0) // 2 ELSE 0 END AS t1 FROM s0)
        |SELECT b AS n_replicates, CAST(sm // b AS BIGINT) AS boot_mean_kusd,
        |       CAST(CASE WHEN (t1 + 1) * (t1 + 1) <= v2 THEN t1 + 1
        |                 WHEN t1 * t1 > v2 THEN t1 - 1 ELSE t1 END AS BIGINT) AS boot_se_kusd
        |FROM s1""".stripMargin,

    "q454_chunk_stitch" ->
      """WITH b AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |  FROM documents WHERE text IS NOT NULL
        |), a AS (
        |  SELECT doc_id,
        |         array_to_string(list_slice(ws, 1, 3), ' ') AS pre,
        |         array_to_string(list_slice(ws, len(ws) - 2, len(ws)), ' ') AS suf
        |  FROM b WHERE len(ws) >= 3
        |)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.suf AS affix
        |FROM a x JOIN a y ON x.suf = y.pre AND x.doc_id <> y.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q455_float_drift_audit" ->
      """SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents,
        |       abs(sum(o_totalprice) * 100
        |           - CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE))
        |         < greatest(CAST(1.0 AS DOUBLE), count(*) * CAST(0.001 AS DOUBLE))
        |         AS drift_within_bound
        |FROM orders JOIN customer ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q456_bm25_k1_sweep" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0
        |), lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM words GROUP BY 1),
        |tot AS (SELECT CAST(sum(len) AS HUGEINT) AS big_l, CAST(count(*) AS HUGEINT) AS big_n
        |        FROM lens),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM words
        |       WHERE w IN ('vector', 'stream', 'filter') GROUP BY 1, 2),
        |idf AS (
        |  SELECT w, CAST(round(ln(1.0 + (CAST(big_n - df AS DOUBLE) + 0.5)
        |                              / (CAST(df AS DOUBLE) + 0.5)) * 1000000)
        |                 AS HUGEINT) AS idf_micro
        |  FROM (SELECT w, CAST(count(*) AS HUGEINT) AS df FROM tf GROUP BY 1), tot
        |), base AS (
        |  SELECT tf.doc_id, tf.tf, idf.idf_micro, lens.len, tot.big_l, tot.big_n
        |  FROM tf JOIN idf USING (w) JOIN lens USING (doc_id), tot
        |), cfg AS (
        |  SELECT * FROM (VALUES (CAST(800 AS BIGINT), CAST(36 AS HUGEINT), CAST(20 AS HUGEINT), CAST(4 AS HUGEINT), CAST(12 AS HUGEINT)),
        |                        (1200, 44, 20, 6, 18),
        |                        (2000, 12, 4, 2, 6)) v(k1_milli, num, ctf, cl, clen)
        |), sc AS (
        |  SELECT cfg.k1_milli, base.doc_id,
        |         (2 * (base.idf_micro * cfg.num * base.tf * base.big_l)
        |          + (cfg.ctf * base.tf * base.big_l + cfg.cl * base.big_l
        |             + cfg.clen * base.len * base.big_n))
        |         // (2 * (cfg.ctf * base.tf * base.big_l + cfg.cl * base.big_l
        |                  + cfg.clen * base.len * base.big_n)) AS c
        |  FROM base CROSS JOIN cfg
        |), agg AS (
        |  SELECT k1_milli, doc_id, CAST(sum(c) AS BIGINT) AS bm25_micro
        |  FROM sc GROUP BY 1, 2
        |), rk AS (
        |  SELECT k1_milli, doc_id, bm25_micro,
        |         CAST(row_number() OVER (PARTITION BY k1_milli
        |           ORDER BY bm25_micro DESC, doc_id) AS BIGINT) AS rk
        |  FROM agg
        |)
        |SELECT k1_milli, rk, doc_id, bm25_micro
        |FROM rk WHERE rk <= 5 ORDER BY k1_milli, rk""".stripMargin,

    "q457_entropy_coding_bound" ->
      """WITH ch AS (
        |  SELECT source, text[i] AS ch
        |  FROM (SELECT source, text, unnest(range(1, len(text) + 1)) AS i
        |        FROM documents WHERE text IS NOT NULL)
        |), c AS (SELECT source, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
        |a AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_chars_total,
        |         CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |         CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
        |              AS HUGEINT) AS sl
        |  FROM c GROUP BY 1
        |), h AS (
        |  SELECT source, n_chars_total, n_distinct_chars,
        |         CAST(CAST(round(ln(CAST(n_chars_total AS DOUBLE)) * 1000000) AS BIGINT)
        |              - sl // n_chars_total AS BIGINT) AS h_char_micro
        |  FROM a
        |)
        |SELECT source, n_chars_total, n_distinct_chars, h_char_micro,
        |       CAST(h_char_micro * 1000000000 // 693147181 AS BIGINT) AS bits_per_char_micro,
        |       CAST(CAST(n_chars_total AS HUGEINT)
        |            * (h_char_micro * 1000000000 // 693147181) // 8000000 AS BIGINT) AS est_bytes
        |FROM h ORDER BY source""".stripMargin,

    "q458_icc_design_effect" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS ng,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) // 1000) AS BIGINT) AS sg,
        |         CAST(sum((CAST(round(o_totalprice * 100) AS BIGINT) // 1000)
        |                  * (CAST(round(o_totalprice * 100) AS BIGINT) // 1000)) AS BIGINT) AS ssg
        |  FROM orders GROUP BY 1
        |), u AS (
        |  SELECT o_custkey, ng, sg, ssg,
        |         CAST(CAST(sg AS HUGEINT) * sg // ng AS BIGINT) AS ug
        |  FROM per
        |), a AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS k, CAST(sum(ng) AS HUGEINT) AS n,
        |         CAST(sum(sg) AS HUGEINT) AS st, CAST(sum(ssg) AS HUGEINT) AS sst,
        |         CAST(sum(ug) AS HUGEINT) AS su, CAST(sum(ng * ng) AS HUGEINT) AS sn2
        |  FROM u
        |), d AS (
        |  SELECT k, n, su - st * st // n AS ssb, sst - su AS ssw, sn2 FROM a
        |)
        |SELECT CAST(k AS BIGINT) AS k_clusters, CAST(n AS BIGINT) AS n_obs,
        |       CAST(1000 * ((n - k) * ssb - (k - 1) * ssw)
        |            // ((n - k) * ssb + (n - sn2 // n - k + 1) * ssw) AS BIGINT) AS icc_milli,
        |       CAST(1000 + (n // k - 1)
        |            * (1000 * ((n - k) * ssb - (k - 1) * ssw)
        |               // ((n - k) * ssb + (n - sn2 // n - k + 1) * ssw)) AS BIGINT) AS deff_milli
        |FROM d""".stripMargin,

    "q459_median_ci" ->
      """WITH v AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, o_orderkey,
        |         CAST(row_number() OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
        |                                 o_orderkey) AS BIGINT) AS rn
        |  FROM orders
        |), st0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |st1 AS (SELECT n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS t0 FROM st0),
        |st2 AS (SELECT n, CASE WHEN (t0 + 1) * (t0 + 1) <= n THEN t0 + 1
        |                       WHEN t0 * t0 > n THEN t0 - 1 ELSE t0 END AS s FROM st1),
        |st AS (SELECT n, greatest(1, (n - 196 * s // 100) // 2) AS lo_rank,
        |              least(n, (n + 196 * s // 100) // 2 + 1) AS hi_rank,
        |              (n + 1) // 2 AS med_rank
        |       FROM st2)
        |SELECT n AS n_orders,
        |       CAST(max(CASE WHEN rn = med_rank THEN v END) AS BIGINT) AS median_cents,
        |       CAST(max(CASE WHEN rn = lo_rank THEN v END) AS BIGINT) AS lo_cents,
        |       CAST(max(CASE WHEN rn = hi_rank THEN v END) AS BIGINT) AS hi_cents
        |FROM v, st
        |WHERE rn = lo_rank OR rn = hi_rank OR rn = med_rank
        |GROUP BY n""".stripMargin,

    "q460_ljung_box" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |              // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), st AS (SELECT CAST(count(*) AS BIGINT) AS nm, CAST(sum(y) AS BIGINT) AS sy2 FROM rev),
        |z AS (
        |  SELECT nm, nm * y - sy2 AS z,
        |         lag(nm * y - sy2, 1) OVER (ORDER BY mi) AS z1,
        |         lag(nm * y - sy2, 2) OVER (ORDER BY mi) AS z2,
        |         lag(nm * y - sy2, 3) OVER (ORDER BY mi) AS z3,
        |         lag(nm * y - sy2, 4) OVER (ORDER BY mi) AS z4,
        |         lag(nm * y - sy2, 5) OVER (ORDER BY mi) AS z5,
        |         lag(nm * y - sy2, 6) OVER (ORDER BY mi) AS z6
        |  FROM rev, st
        |), c AS (
        |  SELECT max(nm) AS n,
        |         sum(CAST(z AS HUGEINT) * z) AS c0,
        |         sum(CAST(z AS HUGEINT) * z1) AS c1, sum(CAST(z AS HUGEINT) * z2) AS c2,
        |         sum(CAST(z AS HUGEINT) * z3) AS c3, sum(CAST(z AS HUGEINT) * z4) AS c4,
        |         sum(CAST(z AS HUGEINT) * z5) AS c5, sum(CAST(z AS HUGEINT) * z6) AS c6
        |  FROM z
        |)
        |SELECT CAST(n AS BIGINT) AS n_months,
        |       CAST(n * (n + 2) * ((c1 * c1 * 1000000) // (c0 * c0 * (n - 1))
        |         + (c2 * c2 * 1000000) // (c0 * c0 * (n - 2))
        |         + (c3 * c3 * 1000000) // (c0 * c0 * (n - 3))
        |         + (c4 * c4 * 1000000) // (c0 * c0 * (n - 4))
        |         + (c5 * c5 * 1000000) // (c0 * c0 * (n - 5))
        |         + (c6 * c6 * 1000000) // (c0 * c0 * (n - 6))) AS BIGINT) AS q_micro,
        |       n * (n + 2) * ((c1 * c1 * 1000000) // (c0 * c0 * (n - 1))
        |         + (c2 * c2 * 1000000) // (c0 * c0 * (n - 2))
        |         + (c3 * c3 * 1000000) // (c0 * c0 * (n - 3))
        |         + (c4 * c4 * 1000000) // (c0 * c0 * (n - 4))
        |         + (c5 * c5 * 1000000) // (c0 * c0 * (n - 5))
        |         + (c6 * c6 * 1000000) // (c0 * c0 * (n - 6))) > 12591587 AS reject_white_noise
        |FROM c""".stripMargin,

    "q461_hash_ring" ->
      """WITH vn AS (
        |  SELECT nd.node, v.vn,
        |         CAST(concat('0x', substr(md5('ring#' || nd.node || '#' || v.vn), 1, 12))
        |              AS BIGINT) AS vpos
        |  FROM (SELECT unnest(range(0, 4)) AS node) nd,
        |       (SELECT unnest(range(0, 8)) AS vn) v
        |), keys AS (
        |  SELECT p_partkey,
        |         CAST(concat('0x', substr(md5('key#' || CAST(p_partkey AS VARCHAR)), 1, 12))
        |              AS BIGINT) AS kpos
        |  FROM part
        |), asg AS (
        |  SELECT k.p_partkey,
        |         coalesce(
        |           min(CASE WHEN vn.vpos >= k.kpos THEN struct_pack(vpos := vn.vpos, node := vn.node) END),
        |           min(struct_pack(vpos := vn.vpos, node := vn.node))).node AS node
        |  FROM keys k CROSS JOIN vn GROUP BY 1, k.kpos
        |), cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_keys FROM asg GROUP BY 1)
        |SELECT CAST(node AS BIGINT) AS node, n_keys,
        |       CAST(n_keys * 1000000 // sum(n_keys) OVER () AS BIGINT) AS share_ppm
        |FROM cnt ORDER BY node""".stripMargin,

    "q462_error_budget" ->
      """WITH ev AS (
        |  SELECT (epoch_us(date_trunc('microseconds', ts))
        |          - (SELECT min(epoch_us(date_trunc('microseconds', ts))) FROM events))
        |         // 3600000000 AS hi, event_type
        |  FROM events
        |), h AS (
        |  SELECT hi, CAST(count(*) AS BIGINT) AS tot,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err
        |  FROM ev WHERE hi < 48 GROUP BY 1
        |), grid AS (
        |  SELECT g.hi, CAST(coalesce(h.tot, 0) AS BIGINT) AS tot,
        |         CAST(coalesce(h.err, 0) AS BIGINT) AS err
        |  FROM (SELECT unnest(range(0, 48)) AS hi) g LEFT JOIN h USING (hi)
        |), r AS (
        |  SELECT hi, tot, err,
        |         CAST(sum(tot) OVER w6 AS BIGINT) AS tot6,
        |         CAST(sum(err) OVER w6 AS BIGINT) AS err6
        |  FROM grid
        |  WINDOW w6 AS (ORDER BY hi ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        |)
        |SELECT CAST(hi AS BIGINT) AS hour_index, tot, err,
        |       CAST(CASE WHEN tot6 > 0 THEN err6 * 100000 // tot6 ELSE 0 END AS BIGINT)
        |         AS burn_milli_6h,
        |       CASE WHEN tot6 > 0 THEN err6 * 100000 // tot6 ELSE 0 END > 10000 AS page
        |FROM r ORDER BY hour_index""".stripMargin,

    "q463_range_vs_rows" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE year(o_orderdate) = 1995
        |), w AS (
        |  SELECT d, o_orderkey, v,
        |         CAST(sum(v) OVER (ORDER BY d, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rows,
        |         CAST(sum(v) OVER (ORDER BY d
        |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_range
        |  FROM o
        |)
        |SELECT CAST(month(d) AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN cum_rows <> cum_range THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_diverging,
        |       CAST(max(abs(cum_rows - cum_range)) AS BIGINT) AS max_gap_cents
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q464_anova_interaction" ->
      """WITH cells AS (
        |  SELECT dayofweek(o_orderdate) AS wd, o_orderpriority AS pr,
        |         CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2, 3
        |), cc AS (
        |  SELECT wd, pr, CAST(count(*) AS BIGINT) AS nc, CAST(sum(y) AS BIGINT) AS sc,
        |         CAST(sum(y * y) AS BIGINT) AS ssc
        |  FROM cells GROUP BY 1, 2
        |), ba AS (
        |  SELECT CAST(sum(CAST(sa AS HUGEINT) * sa // na) AS HUGEINT) AS ua,
        |         CAST(count(*) AS HUGEINT) AS a
        |  FROM (SELECT wd, CAST(sum(nc) AS BIGINT) AS na, CAST(sum(sc) AS BIGINT) AS sa
        |        FROM cc GROUP BY 1)
        |), bb AS (
        |  SELECT CAST(sum(CAST(sb AS HUGEINT) * sb // nb) AS HUGEINT) AS ub,
        |         CAST(count(*) AS HUGEINT) AS b
        |  FROM (SELECT pr, CAST(sum(nc) AS BIGINT) AS nb, CAST(sum(sc) AS BIGINT) AS sb
        |        FROM cc GROUP BY 1)
        |), tt AS (
        |  SELECT CAST(sum(nc) AS HUGEINT) AS n, CAST(sum(sc) AS HUGEINT) AS st,
        |         CAST(sum(ssc) AS HUGEINT) AS sst,
        |         CAST(sum(CAST(sc AS HUGEINT) * sc // nc) AS HUGEINT) AS uc
        |  FROM cc
        |)
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |       CAST(n AS BIGINT) AS n_days_cells,
        |       CAST(uc - ua - ub + st * st // n AS BIGINT) AS ss_interaction,
        |       CAST(sst - uc AS BIGINT) AS ss_within,
        |       CAST(1000 * (n - a * b) * (uc - ua - ub + st * st // n)
        |            // ((a - 1) * (b - 1) * (sst - uc)) AS BIGINT) AS f_int_milli
        |FROM tt, ba, bb""".stripMargin,

    "q465_stratified_ate" ->
      """WITH b AS (
        |  SELECT lang,
        |         CAST(concat('0x', substr(md5('qte#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 2 AS arm,
        |         n_chars
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT lang,
        |       CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |       CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |       CAST(1000 * (CAST(sum(CASE WHEN arm = 1 THEN n_chars ELSE 0 END) AS HUGEINT)
        |                      * sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
        |                    - CAST(sum(CASE WHEN arm = 0 THEN n_chars ELSE 0 END) AS HUGEINT)
        |                      * sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END))
        |            // (CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT)
        |                * sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)) AS BIGINT) AS ate_milli
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q466_l_moments" ->
      """WITH v AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
        |         CAST(row_number() OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
        |                                 o_orderkey) AS BIGINT) AS i
        |  FROM orders
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |a AS (
        |  SELECT max(n) AS n, CAST(sum(x) AS HUGEINT) AS sx,
        |         sum(CAST(i * 2 - n - 1 AS HUGEINT) * x) AS l2n,
        |         sum(CAST(((CAST(i AS HUGEINT) - 1) * (i - 2)) // 2
        |                  - 2 * (CAST(i AS HUGEINT) - 1) * (n - i)
        |                  + ((CAST(n AS HUGEINT) - i) * (n - i - 1)) // 2 AS HUGEINT) * x) AS l3n
        |  FROM v, nn
        |)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |       CAST(sx // n AS BIGINT) AS l1_mean_cents,
        |       CAST(l2n // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) AS l2_cents,
        |       CAST(1000 * l3n * n * (n - 1)
        |            // (CAST(n AS HUGEINT) * (n - 1) * (n - 2) // 2 * l2n) AS BIGINT)
        |         AS t3_milli
        |FROM a""".stripMargin,

    "q467_twap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(date_trunc('microseconds', ts)) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |), d AS (
        |  SELECT event_type, v,
        |         lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id) - us AS dt
        |  FROM e
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
        |       CAST(sum(dt) AS BIGINT) AS span_us,
        |       CAST(sum(CAST(v AS HUGEINT) * dt) // CAST(sum(dt) AS HUGEINT) AS BIGINT)
        |         AS twap_cents
        |FROM d WHERE dt IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "q468_lsh_overlap" ->
      s"""$minhashCte,
        |words2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |wh AS (SELECT doc_id, CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) AS hh
        |       FROM words2),
        |bits AS (SELECT doc_id, hh, unnest(range(0, 32)) AS j FROM wh),
        |sb AS (
        |  SELECT doc_id, j,
        |         sum(CASE WHEN CAST(floor(hh / power(2, j)) AS BIGINT) % 2 = 1
        |                  THEN 1 ELSE -1 END) AS s
        |  FROM bits GROUP BY doc_id, j
        |), ssh AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0 THEN CAST(floor(power(2, j)) AS BIGINT) ELSE 0 END)
        |              AS BIGINT) AS simhash
        |  FROM sb GROUP BY doc_id
        |), bv AS (
        |  SELECT doc_id, simhash, b,
        |         CAST(floor(simhash / power(2, 8 * b)) AS BIGINT) % 256 AS band_val
        |  FROM (SELECT doc_id, simhash, unnest(range(0, 4)) AS b FROM ssh)
        |), sp AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bv x JOIN bv y ON x.b = y.b AND x.band_val = y.band_val
        |    AND x.doc_id < y.doc_id
        |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        |), mp AS (SELECT doc_a, doc_b FROM cand)
        |SELECT CAST((SELECT count(*) FROM mp) AS BIGINT) AS n_minhash,
        |       CAST((SELECT count(*) FROM sp) AS BIGINT) AS n_simhash,
        |       CAST((SELECT count(*) FROM mp JOIN sp USING (doc_a, doc_b)) AS BIGINT) AS n_both,
        |       CAST((SELECT count(*) FROM mp) AS BIGINT)
        |         - CAST((SELECT count(*) FROM mp JOIN sp USING (doc_a, doc_b)) AS BIGINT)
        |         AS n_only_minhash,
        |       CAST((SELECT count(*) FROM sp) AS BIGINT)
        |         - CAST((SELECT count(*) FROM mp JOIN sp USING (doc_a, doc_b)) AS BIGINT)
        |         AS n_only_simhash""".stripMargin,

    "q469_range_partitioner_sim" ->
      """WITH v AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders),
        |samp AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v, o_orderkey) AS BIGINT) AS rn
        |  FROM v
        |  WHERE CAST(concat('0x', substr(md5('rps#' || CAST(o_orderkey AS VARCHAR)), 1, 12))
        |             AS BIGINT) % 20 = 0
        |), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM samp),
        |tg AS (SELECT i, (i * m + 31) // 32 AS trn
        |       FROM (SELECT unnest(range(1, 32)) AS i), m),
        |splits AS (SELECT tg.i, samp.v AS s FROM tg JOIN samp ON samp.rn = tg.trn),
        |asg AS (
        |  SELECT v.o_orderkey,
        |         CAST(sum(CASE WHEN v.v > splits.s THEN 1 ELSE 0 END) AS BIGINT) AS pid
        |  FROM v CROSS JOIN splits GROUP BY 1
        |), cnt AS (SELECT pid, CAST(count(*) AS BIGINT) AS n_rows FROM asg GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v)
        |SELECT pid, n_rows, CAST(n_rows * 32000000 // n AS BIGINT) AS fill_ppm
        |FROM cnt, t ORDER BY pid""".stripMargin,

    "q470_pit_features" ->
      """WITH feat AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_pre,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_pre,
        |         CAST(min(datediff('day', o_orderdate, TIMESTAMP '1999-01-01')) AS BIGINT)
        |           AS recency_days
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1
        |), lab AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |    AND o_orderdate < TIMESTAMP '2000-01-01'
        |)
        |SELECT CAST(CASE WHEN lab.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS label,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(CAST(sum(n_pre) AS BIGINT) // count(*) AS BIGINT) AS avg_n_pre,
        |       CAST(CAST(sum(rev_pre) AS BIGINT) // count(*) AS BIGINT) AS avg_rev_pre_cents,
        |       CAST(CAST(sum(recency_days) AS BIGINT) // count(*) AS BIGINT) AS avg_recency_days
        |FROM feat LEFT JOIN lab USING (o_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q471_nb_moments" ->
      """WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k FROM events GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(k) AS HUGEINT) AS sk,
        |             CAST(sum(k * k) AS HUGEINT) AS skk
        |      FROM k)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |       CAST(1000 * sk // n AS BIGINT) AS mean_milli,
        |       CAST(1000 * (n * skk - sk * sk) // (n * n) AS BIGINT) AS var_milli,
        |       CAST(1000 * sk * n // (n * skk - sk * sk) AS BIGINT) AS p_milli,
        |       CAST(1000 * sk * sk // (n * skk - sk * sk - sk * n) AS BIGINT) AS r_milli
        |FROM a""".stripMargin,

    "q472_pii_mask_apply" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN props <> regexp_replace(props, '[0-9]', '#', 'g')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       CAST(sum(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')))
        |            AS BIGINT) AS chars_masked
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q473_fleiss_kappa" ->
      """WITH r AS (
        |  SELECT lang,
        |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
        |         CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END AS b,
        |         CASE WHEN len(list_distinct(list_filter(string_split(text, ' '),
        |                      x -> len(x) > 0))) >= 28 THEN 1 ELSE 0 END AS c
        |  FROM documents WHERE text IS NOT NULL
        |), x AS (SELECT lang, a + b + c AS x FROM r),
        |g AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS xs,
        |             CAST(sum((x * (x - 1) + (3 - x) * (2 - x)) // 2) AS HUGEINT) AS ap
        |      FROM x GROUP BY 1)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs,
        |       CAST(xs * 1000000 // (3 * n) AS BIGINT) AS p_pos_ppm,
        |       CAST(CASE WHEN (3 * n) * (3 * n) - xs * xs
        |                      - (3 * n - xs) * (3 * n - xs) = 0 THEN 0
        |            ELSE (3 * n * ap - xs * xs - (3 * n - xs) * (3 * n - xs)) * 1000000
        |                 // ((3 * n) * (3 * n) - xs * xs - (3 * n - xs) * (3 * n - xs))
        |            END AS BIGINT) AS kappa_fleiss_ppm
        |FROM g ORDER BY lang""".stripMargin,

    "q474_brown_forsythe" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS g, CAST(round(o_totalprice * 100) AS BIGINT) AS y,
        |         o_orderkey
        |  FROM orders
        |), rk AS (
        |  SELECT g, y,
        |         CAST(row_number() OVER (PARTITION BY g ORDER BY y, o_orderkey) AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS ng
        |  FROM o
        |), med AS (SELECT g, y AS med FROM rk WHERE rn = (ng + 1) // 2),
        |z AS (SELECT o.g, abs(o.y - med.med) // 1000 AS z FROM o JOIN med USING (g)),
        |grp AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(z) AS BIGINT) AS sz,
        |         CAST(sum(z * z) AS BIGINT) AS szz
        |  FROM z GROUP BY 1
        |), u AS (SELECT g, n, sz, szz, CAST(CAST(sz AS HUGEINT) * sz // n AS BIGINT) AS u
        |         FROM grp),
        |a AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS k, CAST(sum(n) AS HUGEINT) AS nn,
        |         CAST(sum(sz) AS HUGEINT) AS st, CAST(sum(szz) AS HUGEINT) AS sst,
        |         CAST(sum(u) AS HUGEINT) AS su
        |  FROM u
        |)
        |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n_orders,
        |       CAST(su - st * st // nn AS BIGINT) AS ssb,
        |       CAST(sst - su AS BIGINT) AS ssw,
        |       CAST(1000 * (nn - k) * (su - st * st // nn)
        |            // ((k - 1) * (sst - su)) AS BIGINT) AS f_milli
        |FROM a""".stripMargin,

    "q475_rolling_origin" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT mi, y, lag(y, 1) OVER (ORDER BY mi) AS y1,
        |         lag(y, 12) OVER (ORDER BY mi) AS y12
        |  FROM rev
        |)
        |SELECT CAST(mi AS BIGINT) AS target_month, y AS actual_cents,
        |       CAST(abs(y - y1) AS BIGINT) AS naive_err_cents,
        |       CAST(abs(y - y12) AS BIGINT) AS snaive_err_cents,
        |       CAST(CASE WHEN abs(y - y12) < abs(y - y1) THEN 1 ELSE 0 END AS BIGINT)
        |         AS seasonal_wins
        |FROM l WHERE mi BETWEEN 18 AND 23 ORDER BY target_month""".stripMargin,

    "q476_capture_recapture" ->
      """WITH c AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |), f AS (
        |  SELECT o_custkey,
        |         CASE WHEN CAST(concat('0x', substr(md5('capA#' || CAST(o_custkey AS VARCHAR)), 1, 12))
        |                        AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END AS ina,
        |         CASE WHEN CAST(concat('0x', substr(md5('capB#' || CAST(o_custkey AS VARCHAR)), 1, 12))
        |                        AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END AS inb
        |  FROM c
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_true, CAST(sum(ina) AS BIGINT) AS n1,
        |         CAST(sum(inb) AS BIGINT) AS n2, CAST(sum(ina * inb) AS BIGINT) AS m
        |  FROM f
        |)
        |SELECT n_true, n1, n2, m,
        |       CAST(CASE WHEN m > 0 THEN CAST(n1 AS HUGEINT) * n2 // m ELSE NULL END AS BIGINT) AS est_lp,
        |       CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS est_chapman,
        |       CAST(abs(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) // (m + 1) - 1 - n_true) * 1000000 // n_true
        |            AS BIGINT) AS chapman_err_ppm
        |FROM a""".stripMargin,

    "q477_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |              // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), d AS (
        |  SELECT day, y, lag(y, 1) OVER (ORDER BY day) AS yp FROM daily
        |), sg AS (
        |  SELECT day, CASE WHEN y > yp THEN 1 ELSE 0 END AS s FROM d WHERE yp IS NOT NULL
        |), sg2 AS (
        |  SELECT s, lag(s, 1) OVER (ORDER BY day) AS sp FROM sg
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS n1,
        |         CAST(sum(1 - s) AS BIGINT) AS n2,
        |         CAST(sum(CASE WHEN sp IS NOT NULL AND s <> sp THEN 1 ELSE 0 END) + 1
        |              AS BIGINT) AS runs
        |  FROM sg2
        |), b AS (
        |  SELECT n, n1, n2, runs, runs * n - 2 * n1 * n2 - n AS aa,
        |         CAST(1000000 * CAST(runs * n - 2 * n1 * n2 - n AS HUGEINT)
        |              * (runs * n - 2 * n1 * n2 - n) * (n - 1)
        |              // (CAST(2 AS HUGEINT) * n1 * n2 * (2 * n1 * n2 - n)) AS BIGINT) AS x2
        |  FROM a
        |), c AS (
        |  SELECT *, CAST(floor(sqrt(CAST(x2 AS DOUBLE))) AS BIGINT) AS t0 FROM b
        |)
        |SELECT n AS n_days, n1 AS n_up, n2 AS n_down, runs,
        |       CAST(CASE WHEN aa >= 0 THEN 1 ELSE -1 END
        |            * (CASE WHEN (t0 + 1) * (t0 + 1) <= x2 THEN t0 + 1
        |                    WHEN t0 * t0 > x2 THEN t0 - 1 ELSE t0 END) AS BIGINT) AS z_milli
        |FROM c""".stripMargin,

    "q478_broadcast_planner" ->
      """WITH stats AS (
        |  SELECT 'customer' AS t, CAST(count(*) AS BIGINT) AS rows_,
        |         CAST(count(*) * 64 AS BIGINT) AS bytes_ FROM customer
        |  UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT),
        |         CAST(count(*) * 56 AS BIGINT) FROM orders
        |  UNION ALL SELECT 'lineitem', CAST(count(*) AS BIGINT),
        |         CAST(count(*) * 88 AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'part', CAST(count(*) AS BIGINT),
        |         CAST(count(*) * 72 AS BIGINT) FROM part
        |  UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT),
        |         CAST(count(*) * 48 AS BIGINT) FROM supplier
        |), joins AS (
        |  SELECT * FROM (VALUES ('orders_customer', 'orders', 'customer'),
        |                        ('lineitem_orders', 'lineitem', 'orders'),
        |                        ('lineitem_part', 'lineitem', 'part'),
        |                        ('lineitem_supplier', 'lineitem', 'supplier'),
        |                        ('part_supplier', 'part', 'supplier'))
        |         v(join_name, probe, build)
        |)
        |SELECT join_name, p.rows_ AS probe_rows, b.rows_ AS build_rows,
        |       b.bytes_ AS build_bytes,
        |       CASE WHEN b.bytes_ < 10485760 THEN 'broadcast_hash'
        |            ELSE 'sort_merge' END AS strategy
        |FROM joins JOIN stats b ON b.t = joins.build
        |JOIN stats p ON p.t = joins.probe
        |ORDER BY join_name""".stripMargin,

    "q479_ipf_raking" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2
        |), t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS nl,
        |         CAST(count(DISTINCT source) AS BIGINT) AS ns
        |  FROM cells
        |), g1 AS (
        |  SELECT cells.lang, cells.source, cells.n, nn, nl, ns,
        |         CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS rs
        |  FROM cells, t
        |), g2 AS (SELECT *, (1000000 * (nn // nl)) // rs AS w1 FROM g1),
        |g3 AS (SELECT *, CAST(sum(n * w1) OVER (PARTITION BY source) AS BIGINT) AS cs1
        |       FROM g2),
        |g4 AS (SELECT *, w1 * ((1000000 * (nn // ns) * 1000000) // cs1) // 1000000 AS w2
        |       FROM g3)
        |SELECT lang, source, n AS n_docs, CAST(w2 AS BIGINT) AS w_ppm
        |FROM g4 ORDER BY lang, source""".stripMargin,

    "q480_sprt" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e
        |  FROM events GROUP BY 1
        |), l AS (
        |  SELECT day, e * CAST(round(ln(CAST(2.0 AS DOUBLE)) * 1000000) AS BIGINT)
        |           + (n - e) * CAST(round(ln(CAST(0.98 AS DOUBLE) / 0.99) * 1000000)
        |                            AS BIGINT) AS llr
        |  FROM daily
        |), c AS (
        |  SELECT day, CAST(sum(llr) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
        |  FROM l
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(max(cum) AS BIGINT) AS max_cum_micro,
        |       CAST(min(cum) AS BIGINT) AS min_cum_micro,
        |       CAST(coalesce(min(CASE WHEN cum >= 2944439 THEN rn END), 0) AS BIGINT)
        |         AS cross_h1_day,
        |       CAST(coalesce(min(CASE WHEN cum <= -2944439 THEN rn END), 0) AS BIGINT)
        |         AS cross_h0_day,
        |       CASE WHEN coalesce(min(CASE WHEN cum >= 2944439 THEN rn END), 0) > 0
        |             AND (coalesce(min(CASE WHEN cum <= -2944439 THEN rn END), 0) = 0
        |                  OR min(CASE WHEN cum >= 2944439 THEN rn END)
        |                     < min(CASE WHEN cum <= -2944439 THEN rn END))
        |            THEN 'accept_h1'
        |            WHEN coalesce(min(CASE WHEN cum <= -2944439 THEN rn END), 0) > 0
        |            THEN 'accept_h0'
        |            ELSE 'continue' END AS decision
        |FROM c""".stripMargin,

    "q481_dirichlet_lm" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0
        |), lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM words GROUP BY 1),
        |ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM words),
        |terms AS (SELECT unnest(['vector', 'stream', 'filter']) AS w),
        |cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf
        |       FROM words JOIN terms USING (w) GROUP BY 1),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |       FROM words JOIN terms USING (w) GROUP BY 1, 2),
        |sc AS (
        |  SELECT lens.doc_id,
        |         CAST(round(ln((CAST(coalesce(tf.tf, 0) AS DOUBLE) * ct
        |                        + CAST(2000 AS DOUBLE) * cf.cf)
        |                       / ((CAST(lens.len AS DOUBLE) + CAST(2000 AS DOUBLE))
        |                          * cf.cf)) * 1000000) AS BIGINT) AS sc
        |  FROM lens CROSS JOIN cf CROSS JOIN ctt
        |  LEFT JOIN tf ON tf.doc_id = lens.doc_id AND tf.w = cf.w
        |), agg AS (SELECT doc_id, CAST(sum(sc) AS BIGINT) AS score_micro
        |           FROM sc GROUP BY 1),
        |rk AS (SELECT doc_id, score_micro,
        |              CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
        |                   AS BIGINT) AS rk
        |       FROM agg)
        |SELECT rk, doc_id, score_micro FROM rk WHERE rk <= 10 ORDER BY rk""".stripMargin,

    "q482_weak_labels" ->
      s"""$minhashCte,
        |dup_ids AS (SELECT doc_a AS doc_id FROM cand
        |            UNION SELECT doc_b AS doc_id FROM cand),
        |r AS (
        |  SELECT d.lang,
        |         CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END
        |         + CASE WHEN len(string_split(d.text, ' ')) >= 55 THEN 1 ELSE 0 END
        |         + CASE WHEN len(list_distinct(list_filter(string_split(d.text, ' '),
        |                        x -> len(x) > 0))) >= 28 THEN 1 ELSE 0 END AS x,
        |         CASE WHEN dup_ids.doc_id IS NOT NULL THEN 1 ELSE 0 END AS gold
        |  FROM documents d LEFT JOIN dup_ids ON d.doc_id = dup_ids.doc_id
        |  WHERE d.text IS NOT NULL
        |), p AS (SELECT lang, CASE WHEN x >= 2 THEN 1 ELSE 0 END AS pred, gold FROM r)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(pred) AS BIGINT) AS n_pred_pos,
        |       CAST(sum(gold) AS BIGINT) AS n_gold_pos,
        |       CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        |       CAST(CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT)
        |            * 1000000 // count(*) AS BIGINT) AS acc_ppm
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q483_holm_correction" ->
      """WITH per AS (
        |  SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS ns,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) // 100000) AS BIGINT) AS ss,
        |         CAST(sum((CAST(round(o_totalprice * 100) AS BIGINT) // 100000)
        |                  * (CAST(round(o_totalprice * 100) AS BIGINT) // 100000))
        |              AS BIGINT) AS sss
        |  FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(ns) AS HUGEINT) AS nn, CAST(sum(ss) AS HUGEINT) AS st,
        |         CAST(sum(sss) AS HUGEINT) AS sst
        |  FROM per
        |), z AS (
        |  SELECT segment,
        |         CAST(1000 * (CAST(ss AS HUGEINT) * nn - st * ns)
        |              * (CAST(ss AS HUGEINT) * nn - st * ns)
        |              // (CAST(ns AS HUGEINT) * nn * (nn * sst - st * st)) AS BIGINT)
        |           AS z2_milli
        |  FROM per, t
        |), rk AS (
        |  SELECT segment, z2_milli,
        |         CAST(row_number() OVER (ORDER BY z2_milli DESC, segment) AS BIGINT) AS rnk
        |  FROM z
        |), cr AS (
        |  SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(6635 AS BIGINT)),
        |                        (2, 6239), (3, 5731), (4, 5024), (5, 3841))
        |         v(rnk, crit_milli)
        |), j AS (
        |  SELECT rk.rnk, rk.segment, rk.z2_milli, cr.crit_milli,
        |         CASE WHEN rk.z2_milli >= cr.crit_milli THEN 1 ELSE 0 END AS pass
        |  FROM rk JOIN cr USING (rnk)
        |), f AS (
        |  SELECT *, CAST(sum(1 - pass) OVER (ORDER BY rnk
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nf
        |  FROM j
        |)
        |SELECT rnk, segment, z2_milli, crit_milli,
        |       CAST(CASE WHEN nf = 0 THEN 1 ELSE 0 END AS BIGINT) AS rejected
        |FROM f ORDER BY rnk""".stripMargin,

    "q484_eb_shrinkage" ->
      """WITH per AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sy,
        |         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)
        |                  * CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS syy
        |  FROM part GROUP BY 1
        |), u AS (SELECT *, CAST(CAST(sy AS HUGEINT) * sy // n AS BIGINT) AS u FROM per),
        |t AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS k, CAST(sum(n) AS HUGEINT) AS nn,
        |         CAST(sum(sy) AS HUGEINT) AS st, CAST(sum(syy) AS HUGEINT) AS sst,
        |         CAST(sum(u) AS HUGEINT) AS su
        |  FROM u
        |), kp AS (
        |  SELECT CAST((k - 1) * (sst - su)
        |              // ((nn - k) * (su - st * st // nn)) AS BIGINT) AS kap, nn, st
        |  FROM t
        |)
        |SELECT p_brand, n, CAST(sy // n AS BIGINT) AS raw_mean_cents,
        |       CAST((CAST(sy AS HUGEINT) * nn + CAST(kap AS HUGEINT) * st)
        |            // (nn * (n + kap)) AS BIGINT) AS shrunk_mean_cents
        |FROM per, kp ORDER BY p_brand""".stripMargin,

    "q485_pearson_residuals" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2
        |), t AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
        |m AS (
        |  SELECT cells.lang, cells.source, cells.o, nn,
        |         CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS rsum,
        |         CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS csum
        |  FROM cells, t
        |), d AS (
        |  SELECT *, o * nn - rsum * csum AS dev,
        |         CAST(1000000 * CAST(o * nn - rsum * csum AS HUGEINT)
        |              * (o * nn - rsum * csum)
        |              // (CAST(nn AS HUGEINT) * nn * rsum * csum) AS BIGINT) AS q2
        |  FROM m
        |), s0 AS (SELECT *, CAST(floor(sqrt(CAST(q2 AS DOUBLE))) AS BIGINT) AS t0 FROM d)
        |SELECT lang, source, o,
        |       CAST(CASE WHEN dev >= 0 THEN 1 ELSE -1 END
        |            * (CASE WHEN (t0 + 1) * (t0 + 1) <= q2 THEN t0 + 1
        |                    WHEN t0 * t0 > q2 THEN t0 - 1 ELSE t0 END) AS BIGINT)
        |         AS resid_milli,
        |       CAST(CASE WHEN abs(CASE WHEN dev >= 0 THEN 1 ELSE -1 END
        |                          * (CASE WHEN (t0 + 1) * (t0 + 1) <= q2 THEN t0 + 1
        |                                  WHEN t0 * t0 > q2 THEN t0 - 1 ELSE t0 END)) > 2000
        |                 THEN 1 ELSE 0 END AS BIGINT) AS outlier_cell
        |FROM s0 ORDER BY lang, source""".stripMargin,

    "q486_coupon_collector" ->
      """WITH o AS (
        |  SELECT doc_id, source,
        |         CAST(concat('0x', substr(md5('cc#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |              AS BIGINT) AS h
        |  FROM documents WHERE text IS NOT NULL
        |), p AS (
        |  SELECT source,
        |         CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |              AS BIGINT) AS fr
        |  FROM o
        |), ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS ns FROM o),
        |f AS (SELECT pos FROM p WHERE fr = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |       CAST(max(pos) AS BIGINT) AS cover_position,
        |       CAST(list_sum(list_transform(range(1, ns + 1), i -> 1000000 // i))
        |            AS BIGINT) AS harmonic_micro,
        |       CAST(ns * CAST(list_sum(list_transform(range(1, ns + 1),
        |                      i -> 1000000 // i)) AS BIGINT) // 1000 AS BIGINT)
        |         AS expected_draws_milli
        |FROM f, ns GROUP BY ns""".stripMargin,

    "q487_durbin_watson" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |              // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1 HAVING mi >= 0 AND mi < 24
        |), e AS (
        |  SELECT mi, 2 * y - CAST(sum(y) OVER (PARTITION BY mi % 12) AS BIGINT) AS e
        |  FROM rev
        |), l AS (SELECT mi, e, lag(e, 1) OVER (ORDER BY mi) AS ep FROM e)
        |SELECT CAST(count(*) AS BIGINT) AS n_months,
        |       CAST(1000 * sum(CASE WHEN ep IS NOT NULL
        |                            THEN CAST(e - ep AS HUGEINT) * (e - ep)
        |                            ELSE 0 END)
        |            // sum(CAST(e AS HUGEINT) * e) AS BIGINT) AS dw_milli
        |FROM l""".stripMargin,

    "q488_bh_fdr" ->
      """WITH per AS (
        |  SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS ns,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) // 100000) AS BIGINT) AS ss,
        |         CAST(sum((CAST(round(o_totalprice * 100) AS BIGINT) // 100000)
        |                  * (CAST(round(o_totalprice * 100) AS BIGINT) // 100000))
        |              AS BIGINT) AS sss
        |  FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(ns) AS HUGEINT) AS nn, CAST(sum(ss) AS HUGEINT) AS st,
        |         CAST(sum(sss) AS HUGEINT) AS sst
        |  FROM per
        |), z AS (
        |  SELECT segment,
        |         CAST(1000 * (CAST(ss AS HUGEINT) * nn - st * ns)
        |              * (CAST(ss AS HUGEINT) * nn - st * ns)
        |              // (CAST(ns AS HUGEINT) * nn * (nn * sst - st * st)) AS BIGINT)
        |           AS z2_milli
        |  FROM per, t
        |), rk AS (
        |  SELECT segment, z2_milli,
        |         CAST(row_number() OVER (ORDER BY z2_milli DESC, segment) AS BIGINT) AS rnk
        |  FROM z
        |), cr AS (
        |  SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(6635 AS BIGINT)),
        |                        (2, 5412), (3, 4709), (4, 4218), (5, 3841))
        |         v(rnk, crit_milli)
        |), j AS (
        |  SELECT rk.rnk, rk.segment, rk.z2_milli, cr.crit_milli,
        |         CASE WHEN rk.z2_milli >= cr.crit_milli THEN 1 ELSE 0 END AS pass
        |  FROM rk JOIN cr USING (rnk)
        |), mx AS (SELECT coalesce(max(CASE WHEN pass = 1 THEN rnk END), 0) AS mp FROM j)
        |SELECT rnk, segment, z2_milli, crit_milli,
        |       CAST(CASE WHEN rnk <= mp THEN 1 ELSE 0 END AS BIGINT) AS rejected
        |FROM j, mx ORDER BY rnk""".stripMargin,

    "q489_mcnemar" ->
      """WITH r AS (
        |  SELECT lang,
        |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
        |         CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END AS b
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |       CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |       CAST(CASE WHEN sum(CASE WHEN a <> b THEN 1 ELSE 0 END) = 0 THEN 0
        |            ELSE 1000 * (sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |                         - sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END))
        |                 * (sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |                    - sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END))
        |                 // sum(CASE WHEN a <> b THEN 1 ELSE 0 END) END AS BIGINT)
        |         AS chi2_milli,
        |       CAST(CASE WHEN sum(CASE WHEN a <> b THEN 1 ELSE 0 END) = 0 THEN 0
        |            ELSE 1000 * (abs(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |                             - sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)) - 1)
        |                 * (abs(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |                        - sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)) - 1)
        |                 // sum(CASE WHEN a <> b THEN 1 ELSE 0 END) END AS BIGINT)
        |         AS chi2_cc_milli
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q490_poisson_gof" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
        |), grid AS (
        |  SELECT u.user_id, d.day, CAST(coalesce(c.k, 0) AS BIGINT) AS k
        |  FROM (SELECT DISTINCT user_id FROM ev) u
        |  CROSS JOIN (SELECT DISTINCT day FROM ev) d
        |  LEFT JOIN (SELECT user_id, day, count(*) AS k FROM ev GROUP BY 1, 2) c
        |    ON c.user_id = u.user_id AND c.day = d.day
        |), ob AS (
        |  SELECT least(k, 10) AS kb, CAST(count(*) AS BIGINT) AS o
        |  FROM grid GROUP BY 1
        |), t AS (SELECT CAST(sum(o) AS BIGINT) AS nn, CAST(sum(kb * o) AS BIGINT) AS sk
        |         FROM ob),
        |fact AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(1 AS BIGINT)), (1, 1),
        |                 (2, 2), (3, 6), (4, 24), (5, 120), (6, 720), (7, 5040),
        |                 (8, 40320), (9, 362880)) v(kb, f)),
        |bins AS (
        |  SELECT b.kb, CAST(coalesce(ob.o, 0) AS BIGINT) AS o, fact.f, t.nn, t.sk
        |  FROM (SELECT unnest(range(0, 11)) AS kb) b
        |  LEFT JOIN ob ON ob.kb = b.kb
        |  LEFT JOIN fact ON fact.kb = b.kb
        |  CROSS JOIN t
        |), em AS (
        |  SELECT kb, o, nn,
        |         CAST(round(CASE WHEN kb <= 9 THEN nn * exp(-(CAST(sk AS DOUBLE) / nn))
        |                              * pow(CAST(sk AS DOUBLE) / nn, kb) / f * 1000
        |                         ELSE 0.0 END) AS BIGINT) AS e_milli
        |  FROM bins
        |), tl AS (SELECT CAST(max(nn) * 1000 - sum(e_milli) AS BIGINT) AS te FROM em),
        |f2 AS (
        |  SELECT kb, o, CASE WHEN kb = 10 THEN te ELSE e_milli END AS e2
        |  FROM em, tl
        |)
        |SELECT CAST(kb AS BIGINT) AS k_bin, o, CAST(e2 AS BIGINT) AS e_milli,
        |       CAST((o * 1000 - e2) * (o * 1000 - e2) // e2 AS BIGINT) AS contrib_milli
        |FROM f2 WHERE e2 > 0 ORDER BY k_bin""".stripMargin,

    "q491_cochran_q" ->
      """WITH r AS (
        |  SELECT lang,
        |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
        |         CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END AS b,
        |         CASE WHEN len(list_distinct(list_filter(string_split(text, ' '),
        |                      x -> len(x) > 0))) >= 28 THEN 1 ELSE 0 END AS c
        |  FROM documents WHERE text IS NOT NULL
        |), g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(a) AS HUGEINT) AS ca, CAST(sum(b) AS HUGEINT) AS cb,
        |         CAST(sum(c) AS HUGEINT) AS cc2,
        |         CAST(sum(a + b + c) AS HUGEINT) AS sr,
        |         CAST(sum((a + b + c) * (a + b + c)) AS HUGEINT) AS srr
        |  FROM r GROUP BY 1
        |)
        |SELECT lang, n_docs,
        |       CAST(CASE WHEN 3 * sr - srr = 0 THEN 0
        |            ELSE 1000 * 2 * (3 * (ca * ca + cb * cb + cc2 * cc2) - sr * sr)
        |                 // (3 * sr - srr) END AS BIGINT) AS q_milli
        |FROM g ORDER BY lang""".stripMargin,

    "q492_sign_test" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CASE WHEN year(o_orderdate) = 1997
        |                       THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |                       ELSE 0 END) AS BIGINT) AS r97,
        |         CAST(sum(CASE WHEN year(o_orderdate) = 1998
        |                       THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |                       ELSE 0 END) AS BIGINT) AS r98
        |  FROM orders WHERE year(o_orderdate) IN (1997, 1998) GROUP BY 1
        |  HAVING r97 > 0 AND r98 > 0 AND r97 <> r98
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN r98 > r97 THEN 1 ELSE 0 END) AS BIGINT) AS s
        |  FROM per
        |), b AS (
        |  SELECT n, s, 2 * s - n AS aa, 1000000 * (2 * s - n) * (2 * s - n) // n AS x2
        |  FROM a
        |), c AS (SELECT *, CAST(floor(sqrt(CAST(x2 AS DOUBLE))) AS BIGINT) AS t0 FROM b)
        |SELECT n AS n_pairs, s AS n_up,
        |       CAST(CASE WHEN aa >= 0 THEN 1 ELSE -1 END
        |            * (CASE WHEN (t0 + 1) * (t0 + 1) <= x2 THEN t0 + 1
        |                    WHEN t0 * t0 > x2 THEN t0 - 1 ELSE t0 END) AS BIGINT) AS z_milli
        |FROM c""".stripMargin,

    "q493_bootstrap_ab_ci" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5('qte#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 2 AS arm,
        |         n_chars
        |  FROM documents WHERE text IS NOT NULL
        |), reps AS (
        |  SELECT r.r, base.arm, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(n_chars) AS BIGINT) AS sx
        |  FROM base CROSS JOIN (SELECT unnest(range(0, 50)) AS r) r
        |  WHERE CAST(concat('0x', substr(md5('bs#' || r.r || '#' || CAST(base.doc_id AS VARCHAR)), 1, 12))
        |             AS BIGINT) % 2 = 0
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT r, CAST(1000 * max(CASE WHEN arm = 1 THEN sx END)
        |                 // max(CASE WHEN arm = 1 THEN n END)
        |                 - 1000 * max(CASE WHEN arm = 0 THEN sx END)
        |                 // max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS diff_milli
        |  FROM reps GROUP BY 1
        |), rk AS (
        |  SELECT diff_milli,
        |         CAST(row_number() OVER (ORDER BY diff_milli, r) AS BIGINT) AS rk
        |  FROM d
        |), full_ AS (
        |  SELECT CAST(1000 * max(CASE WHEN arm = 1 THEN sx END)
        |              // max(CASE WHEN arm = 1 THEN n END)
        |              - 1000 * max(CASE WHEN arm = 0 THEN sx END)
        |              // max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS diff_full_milli
        |  FROM (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS sx
        |        FROM base GROUP BY 1)
        |)
        |SELECT CAST((SELECT count(*) FROM rk) AS BIGINT) AS n_reps,
        |       diff_full_milli,
        |       (SELECT diff_milli FROM rk WHERE rk = 2) AS lo_milli,
        |       (SELECT diff_milli FROM rk WHERE rk = 49) AS hi_milli,
        |       CAST(CASE WHEN (SELECT diff_milli FROM rk WHERE rk = 2) <= 0
        |                  AND (SELECT diff_milli FROM rk WHERE rk = 49) >= 0
        |                 THEN 1 ELSE 0 END AS BIGINT) AS covers_zero
        |FROM full_""".stripMargin,

    "q494_kruskal_wallis" ->
      """WITH j AS (SELECT o_orderpriority AS g,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders),
        |vs AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1),
        |vc AS (SELECT v, cnt,
        |              CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |                AS BIGINT) AS cb
        |       FROM vs),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |               CAST(sum(cnt*cnt*cnt - cnt) AS BIGINT) AS ties
        |        FROM vs),
        |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n_gv FROM j GROUP BY 1, 2),
        |tg AS (SELECT g, CAST(sum(n_gv * (2*cb + cnt + 1)) AS BIGINT) AS t2,
        |              CAST(sum(n_gv) AS BIGINT) AS n_g
        |       FROM gv JOIN vc USING (v) GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |             sum(CAST(t2 AS HUGEINT) * t2 // n_g) AS s4
        |      FROM tg),
        |h AS (SELECT n_groups, n,
        |             CAST(3 * s4 * 1000000 // (CAST(n AS HUGEINT) * (n + 1))
        |                  - 3 * (n + 1) * 1000000 AS BIGINT) AS h_micro,
        |             ties
        |      FROM s, tot)
        |SELECT n_groups, n, h_micro,
        |       CAST(CAST(h_micro AS HUGEINT) * (CAST(n AS HUGEINT)*n*n - n)
        |            // (CAST(n AS HUGEINT)*n*n - n - ties) AS BIGINT) AS h_adj_micro
        |FROM h""".stripMargin,

    "q495_unseen_mass" ->
      """WITH g4 AS (
        |  SELECT source, substr(text, CAST(i AS INT), 4) AS g
        |  FROM documents CROSS JOIN unnest(range(1, length(text) - 2)) AS u(i)
        |  WHERE text IS NOT NULL AND length(text) >= 4
        |), cnt AS (
        |  SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM g4 GROUP BY 1, 2
        |), agg AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS v_types,
        |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM cnt GROUP BY 1
        |)
        |SELECT source, n_tokens, v_types, n1, n2,
        |       CAST(1000000 - n1 * 1000000 // n_tokens AS BIGINT) AS coverage_ppm,
        |       CAST(v_types + CASE WHEN n2 > 0 THEN n1 * n1 // (2 * n2)
        |                           ELSE n1 * (n1 - 1) // 2 END AS BIGINT) AS chao1_types
        |FROM agg ORDER BY source""".stripMargin,

    "q496_lexical_richness" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL
        |), m AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS m
        |  FROM w WHERE length(w) > 0 GROUP BY 1, 2
        |), agg AS (
        |  SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS v_types,
        |         sum(CAST(m AS HUGEINT) * m) AS m2,
        |         sum(CAST(m AS HUGEINT) * (m - 1)) AS rep
        |  FROM m GROUP BY 1
        |)
        |SELECT source, n_tokens, v_types,
        |       CAST(10000000 * (m2 - n_tokens)
        |            // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT) AS yules_k_milli,
        |       CAST(1000000 * rep
        |            // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT) AS simpson_ppm
        |FROM agg ORDER BY source""".stripMargin,

    "q497_lru_stack_distance" ->
      """WITH sq AS (
        |  SELECT user_id, event_type,
        |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |           AS BIGINT) AS seq
        |  FROM events
        |), pv AS (
        |  SELECT user_id, event_type, seq,
        |         lag(seq) OVER (PARTITION BY user_id, event_type ORDER BY seq) AS pseq
        |  FROM sq
        |), dep AS (
        |  SELECT p.user_id, p.seq,
        |         CAST(count(DISTINCT m.event_type) + 1 AS BIGINT) AS depth
        |  FROM pv p LEFT JOIN sq m
        |    ON m.user_id = p.user_id AND m.seq > p.pseq AND m.seq < p.seq
        |  WHERE p.pseq IS NOT NULL
        |  GROUP BY 1, 2
        |), hist AS (
        |  SELECT depth, CAST(count(*) AS BIGINT) AS n FROM dep GROUP BY 1
        |  UNION ALL
        |  SELECT CAST(0 AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n
        |  FROM pv WHERE pseq IS NULL
        |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM hist),
        |c AS (
        |  SELECT depth, n,
        |         CAST(sum(CASE WHEN depth > 0 THEN n ELSE 0 END) OVER (
        |           ORDER BY depth ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_hits
        |  FROM hist
        |)
        |SELECT depth, n AS n_accesses,
        |       CAST(CASE WHEN depth > 0 THEN cum_hits * 1000000 // n_total
        |                 ELSE 0 END AS BIGINT) AS hit_ratio_ppm
        |FROM c, tot ORDER BY depth""".stripMargin,

    "q498_kmv_distinct" ->
      """WITH h AS (
        |  SELECT CAST(concat('0x', substr(md5('kmv#' || CAST(o_orderkey AS VARCHAR)), 1, 12))
        |           AS BIGINT) AS h
        |  FROM (SELECT DISTINCT o_orderkey FROM orders)
        |), topk AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |hk AS (SELECT CAST(max(h) AS BIGINT) AS hk, CAST(count(*) AS BIGINT) AS k
        |       FROM topk),
        |ex AS (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS exact_distinct
        |       FROM orders),
        |est AS (SELECT k, exact_distinct,
        |               CAST((k - 1) * 281474976710656 // hk AS BIGINT) AS est
        |        FROM hk, ex)
        |SELECT k, exact_distinct, est AS kmv_estimate,
        |       CAST(abs(est - exact_distinct) * 1000000 // exact_distinct AS BIGINT) AS err_ppm
        |FROM est""".stripMargin,

    // k-center mirror: the same 3 greedy rounds as chained CTEs, each
    // round one distance pass against the single new centroid + least().
    "q499_kcenter_seeding" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id, CAST(i AS BIGINT) AS pos,
        |             CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
        |      FROM v CROSS JOIN unnest(range(0, len(e))) AS u(i)),
        |s0 AS (SELECT min(vec_id) AS vid FROM v),
        |d1 AS (SELECT a.vec_id, CAST(sum((a.qv - c.qv) * (a.qv - c.qv)) AS BIGINT) AS mind
        |       FROM q a JOIN q c ON c.vec_id = (SELECT vid FROM s0) AND c.pos = a.pos
        |       GROUP BY 1),
        |p1 AS (SELECT vec_id, mind FROM d1 WHERE vec_id <> (SELECT vid FROM s0)
        |       ORDER BY mind DESC, vec_id LIMIT 1),
        |e2 AS (SELECT a.vec_id, CAST(sum((a.qv - c.qv) * (a.qv - c.qv)) AS BIGINT) AS d2
        |       FROM q a JOIN q c ON c.vec_id = (SELECT vec_id FROM p1) AND c.pos = a.pos
        |       GROUP BY 1),
        |m2 AS (SELECT d1.vec_id, least(d1.mind, e2.d2) AS mind
        |       FROM d1 JOIN e2 USING (vec_id)),
        |p2 AS (SELECT vec_id, mind FROM m2
        |       WHERE vec_id NOT IN ((SELECT vid FROM s0), (SELECT vec_id FROM p1))
        |       ORDER BY mind DESC, vec_id LIMIT 1),
        |e3 AS (SELECT a.vec_id, CAST(sum((a.qv - c.qv) * (a.qv - c.qv)) AS BIGINT) AS d2
        |       FROM q a JOIN q c ON c.vec_id = (SELECT vec_id FROM p2) AND c.pos = a.pos
        |       GROUP BY 1),
        |m3 AS (SELECT m2.vec_id, least(m2.mind, e3.d2) AS mind
        |       FROM m2 JOIN e3 USING (vec_id)),
        |p3 AS (SELECT vec_id, mind FROM m3
        |       WHERE vec_id NOT IN ((SELECT vid FROM s0), (SELECT vec_id FROM p1),
        |                            (SELECT vec_id FROM p2))
        |       ORDER BY mind DESC, vec_id LIMIT 1)
        |SELECT CAST(0 AS BIGINT) AS sel_order,
        |       CAST((SELECT vid FROM s0) AS BIGINT) AS vec_id,
        |       CAST(0 AS BIGINT) AS mind2_q
        |UNION ALL SELECT CAST(1 AS BIGINT), vec_id, mind FROM p1
        |UNION ALL SELECT CAST(2 AS BIGINT), vec_id, mind FROM p2
        |UNION ALL SELECT CAST(3 AS BIGINT), vec_id, mind FROM p3
        |ORDER BY sel_order""".stripMargin,

    "q500_winnowing" ->
      """WITH g AS (
        |  SELECT source, doc_id, CAST(i AS BIGINT) AS i,
        |         CAST(concat('0x', substr(md5(substr(text, CAST(i AS INT), 5)), 1, 12))
        |           AS BIGINT) AS h
        |  FROM documents CROSS JOIN unnest(range(1, length(text) - 3)) AS u(i)
        |  WHERE text IS NOT NULL AND length(text) >= 5
        |), w AS (
        |  SELECT source, doc_id,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m
        |  FROM g
        |), fp AS (
        |  SELECT source, doc_id, m, CAST(count(*) AS BIGINT) AS n_windows
        |  FROM w GROUP BY 1, 2, 3
        |), sh AS (
        |  SELECT source,
        |         CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_fp
        |  FROM (SELECT source, m, count(DISTINCT doc_id) AS nd FROM fp GROUP BY 1, 2)
        |  GROUP BY 1
        |), agg AS (
        |  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |         CAST(sum(n_windows) AS BIGINT) AS n_windows,
        |         CAST(count(*) AS BIGINT) AS n_fingerprints
        |  FROM fp GROUP BY 1
        |)
        |SELECT agg.source, n_docs, n_windows, n_fingerprints, n_shared_fp,
        |       CAST(n_fingerprints * 1000000 // n_windows AS BIGINT) AS density_ppm
        |FROM agg JOIN sh USING (source) ORDER BY agg.source""".stripMargin,

    "q501_hits_trade" ->
      """WITH cn AS (
        |  SELECT o.o_orderkey, c.c_nationkey AS cnat,
        |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |), sn AS (
        |  SELECT DISTINCT l.l_orderkey, s.s_nationkey AS snat
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |), e AS (
        |  SELECT snat, cnat, CAST(sum(cents) AS BIGINT) AS w
        |  FROM cn JOIN sn ON o_orderkey = l_orderkey GROUP BY 1, 2
        |), h1r AS (SELECT snat, sum(CAST(w AS HUGEINT) * 1000000) AS h FROM e GROUP BY 1),
        |h1 AS (SELECT snat, CAST((2 * h * 1000000 + mx) // (2 * mx) AS BIGINT) AS h
        |       FROM h1r, (SELECT max(h) AS mx FROM h1r)),
        |a1r AS (SELECT cnat, sum(CAST(e.w AS HUGEINT) * h1.h) AS a
        |        FROM e JOIN h1 USING (snat) GROUP BY 1),
        |a1 AS (SELECT cnat, CAST((2 * a * 1000000 + mx) // (2 * mx) AS BIGINT) AS a
        |       FROM a1r, (SELECT max(a) AS mx FROM a1r)),
        |h2r AS (SELECT snat, sum(CAST(e.w AS HUGEINT) * a1.a) AS h
        |        FROM e JOIN a1 USING (cnat) GROUP BY 1),
        |h2 AS (SELECT snat, CAST((2 * h * 1000000 + mx) // (2 * mx) AS BIGINT) AS h
        |       FROM h2r, (SELECT max(h) AS mx FROM h2r))
        |SELECT CAST(coalesce(h2.snat, a1.cnat) AS BIGINT) AS nationkey,
        |       CAST(coalesce(h2.h, 0) AS BIGINT) AS hub_u,
        |       CAST(coalesce(a1.a, 0) AS BIGINT) AS auth_u
        |FROM h2 FULL OUTER JOIN a1 ON h2.snat = a1.cnat
        |ORDER BY nationkey""".stripMargin,

    "q502_price_elasticity" ->
      """WITH b AS (
        |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS dc,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1
        |), t AS (
        |  SELECT CAST(round(ln(CAST(1 AS DOUBLE) - CAST(dc AS DOUBLE) / 100)
        |           * 1000000) AS BIGINT) AS x,
        |         CAST(round(ln(CAST(qty AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM b
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx,
        |         sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM t
        |)
        |SELECT n AS n_levels,
        |       CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
        |            // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
        |         AS BIGINT) AS elasticity_micro,
        |       CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
        |            * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
        |            // ((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
        |               * (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy))
        |         AS BIGINT) AS r2_ppm
        |FROM s""".stripMargin,

    // try_* boundaries replayed with explicit CASE guards: ep·10¹²
    // overflows int64 exactly when ep > 9 223 372.
    "q503_try_arithmetic" ->
      """WITH l AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS ep,
        |         CAST(round(l_discount * 100) AS BIGINT) AS dc
        |  FROM lineitem
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN dc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_by_zero,
        |       CAST(sum(CASE WHEN ep > 9223372 THEN 1 ELSE 0 END) AS BIGINT) AS n_mul_overflow,
        |       CAST(sum(CASE WHEN ep > 9223372 THEN NULL
        |                     ELSE CAST(ep AS HUGEINT) * 1000000000000 END)
        |            // 1000000000000 AS BIGINT) AS sum_safe_cents,
        |       CAST(sum(CASE WHEN dc > 0 THEN ep // dc END) AS BIGINT) AS sum_ratio
        |FROM l""".stripMargin,

    "q504_kneser_ney" ->
      """WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT ws[i+1] AS v, ws[i+2] AS w
        |       FROM d CROSS JOIN unnest(range(0, len(ws) - 1)) AS u(i)),
        |bc AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
        |cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv,
        |              CAST(count(*) AS BIGINT) AS nv FROM bc GROUP BY 1),
        |nw AS (SELECT w, CAST(count(*) AS BIGINT) AS nw FROM bc GROUP BY 1),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n11 FROM bc)
        |SELECT bc.v, bc.w, c AS c_vw,
        |       CAST((4 * c - 3) * 1000000 // (4 * cv)
        |            + (3 * nv * 1000000 // (4 * cv)) * (nw * 1000000 // n11)
        |              // 1000000 AS BIGINT) AS kn_micro
        |FROM bc JOIN cv USING (v) JOIN nw USING (w) CROSS JOIN n1
        |ORDER BY kn_micro DESC, bc.v, bc.w LIMIT 20""".stripMargin,

    "q505_participation_ratio" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT CAST(i AS BIGINT) AS pos,
        |             CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
        |      FROM v CROSS JOIN unnest(range(0, len(e))) AS u(i)),
        |s AS (SELECT pos, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(qv) AS BIGINT) AS sx,
        |             sum(CAST(qv AS HUGEINT) * qv) AS sxx
        |      FROM q GROUP BY 1),
        |vr AS (SELECT n,
        |              CAST((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
        |                   // 1000000 AS BIGINT) AS vr
        |       FROM s),
        |agg AS (SELECT CAST(max(n) AS BIGINT) AS n_vecs,
        |               CAST(count(*) AS BIGINT) AS dim,
        |               CAST(sum(vr) AS BIGINT) AS sv,
        |               sum(CAST(vr AS HUGEINT) * vr) AS svv,
        |               CAST(max(vr) AS BIGINT) AS v_max_r,
        |               CAST(min(vr) AS BIGINT) AS v_min_r
        |        FROM vr)
        |SELECT n_vecs, dim,
        |       CAST(1000 * CAST(sv AS HUGEINT) * sv // svv AS BIGINT) AS pr_milli,
        |       v_max_r, v_min_r
        |FROM agg""".stripMargin,

    "q506_speculative_tasks" ->
      """WITH t AS (
        |  SELECT o_orderpriority AS stage, o_orderkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS d
        |  FROM orders
        |), r AS (
        |  SELECT stage, d,
        |         CAST(row_number() OVER (PARTITION BY stage ORDER BY d, o_orderkey)
        |           AS BIGINT) AS rk,
        |         CAST(count(*) OVER (PARTITION BY stage) AS BIGINT) AS n
        |  FROM t
        |), st AS (
        |  SELECT stage, CAST(max(n) AS BIGINT) AS n_tasks,
        |         CAST(max(CASE WHEN rk = (99 * n + 99) // 100 THEN d END) AS BIGINT) AS p99_ms,
        |         CAST(max(CASE WHEN rk = (n + 1) // 2 THEN d END) AS BIGINT) AS median_ms,
        |         CAST(max(d) AS BIGINT) AS makespan_ms
        |  FROM r GROUP BY 1
        |), sp AS (
        |  SELECT r.stage, CAST(max(least(r.d, st.p99_ms + st.median_ms)) AS BIGINT) AS spec_makespan_ms
        |  FROM r JOIN st USING (stage) GROUP BY 1
        |)
        |SELECT st.stage, n_tasks, p99_ms, median_ms, makespan_ms, spec_makespan_ms,
        |       CAST((makespan_ms - spec_makespan_ms) * 1000000 // makespan_ms
        |         AS BIGINT) AS saving_ppm
        |FROM st JOIN sp USING (stage) ORDER BY st.stage""".stripMargin,

    "q507_rouge_overlap" ->
      s"""$minhashCte,
         |base AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |  WHERE text IS NOT NULL AND doc_id IN (
         |    SELECT doc_a FROM cand UNION SELECT doc_b FROM cand)
         |), uni AS (
         |  SELECT DISTINCT doc_id, g FROM (
         |    SELECT doc_id, unnest(ws) AS g FROM base)
         |  WHERE length(g) > 0
         |), bi AS (
         |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] AS g
         |  FROM base CROSS JOIN unnest(range(0, len(ws) - 1)) AS u(i)
         |  WHERE len(ws) >= 2
         |), ru AS (
         |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_uni_common
         |  FROM cand c JOIN uni a ON a.doc_id = c.doc_a
         |              JOIN uni b ON b.doc_id = c.doc_b AND b.g = a.g
         |  GROUP BY 1, 2
         |), rb AS (
         |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_bi_common
         |  FROM cand c JOIN bi a ON a.doc_id = c.doc_a
         |              JOIN bi b ON b.doc_id = c.doc_b AND b.g = a.g
         |  GROUP BY 1, 2
         |), nu AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY 1),
         |nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY 1)
         |SELECT c.doc_a, c.doc_b,
         |       CAST(coalesce(ru.n_uni_common, 0) AS BIGINT) AS n_uni_common,
         |       CAST(coalesce(ru.n_uni_common * 1000000 // nu.n, 0) AS BIGINT) AS r1_ppm,
         |       CAST(coalesce(rb.n_bi_common, 0) AS BIGINT) AS n_bi_common,
         |       CAST(coalesce(rb.n_bi_common * 1000000 // nb.n, 0) AS BIGINT) AS r2_ppm
         |FROM cand c
         |LEFT JOIN ru ON ru.doc_a = c.doc_a AND ru.doc_b = c.doc_b
         |LEFT JOIN rb ON rb.doc_a = c.doc_a AND rb.doc_b = c.doc_b
         |LEFT JOIN nu ON nu.doc_id = c.doc_a
         |LEFT JOIN nb ON nb.doc_id = c.doc_a
         |ORDER BY c.doc_a, c.doc_b""".stripMargin,

    "q508_bartlett_test" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS ng,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sx,
        |         sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
        |             * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx
        |  FROM orders GROUP BY 1
        |), t AS (
        |  SELECT ng,
        |         CAST(ng AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS a,
        |         CAST(round(ln(CAST(CAST(ng AS HUGEINT) * sxx
        |                            - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |                       / (CAST(ng AS DOUBLE) * (ng - 1))) * 1000000)
        |           AS BIGINT) AS lnv,
        |         CAST(1000000000 // (ng - 1) AS BIGINT) AS recip
        |  FROM g
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k_groups, CAST(sum(ng) AS BIGINT) AS n,
        |         CAST(sum((ng - 1) * lnv) AS BIGINT) AS sl,
        |         CAST(sum(a // ng // 1000) AS BIGINT) AS p,
        |         CAST(sum(recip) AS BIGINT) AS sr
        |  FROM t
        |)
        |SELECT k_groups, n,
        |       CAST((n - k_groups)
        |            * CAST(round(ln(CAST(p AS DOUBLE) * 1000 / (n - k_groups)) * 1000000)
        |                AS BIGINT) - sl AS BIGINT) AS t_micro,
        |       CAST(1000000000 + (sr - 1000000000 // (n - k_groups))
        |            // (3 * (k_groups - 1)) AS BIGINT) AS c_nano,
        |       CAST(CAST((n - k_groups)
        |            * CAST(round(ln(CAST(p AS DOUBLE) * 1000 / (n - k_groups)) * 1000000)
        |                AS BIGINT) - sl AS HUGEINT) * 1000000000
        |            // (1000000000 + (sr - 1000000000 // (n - k_groups))
        |               // (3 * (k_groups - 1))) AS BIGINT) AS t_adj_micro
        |FROM s""".stripMargin,

    "q509_somers_gamma" ->
      """WITH o AS (
        |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS v, o_orderkey
        |  FROM orders
        |), t AS (
        |  SELECT x, CAST(ntile(4) OVER (ORDER BY v, o_orderkey) AS BIGINT) AS y
        |  FROM o
        |), cells AS (
        |  SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1, 2
        |), p AS (
        |  SELECT CAST(sum(CASE WHEN a.y < b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c_pairs,
        |         CAST(sum(CASE WHEN a.y > b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d_pairs,
        |         CAST(sum(CASE WHEN a.y = b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS t_y
        |  FROM cells a JOIN cells b ON a.x < b.x
        |)
        |SELECT c_pairs, d_pairs, t_y,
        |       CAST((c_pairs - d_pairs) * 1000000 // (c_pairs + d_pairs) AS BIGINT) AS gamma_ppm,
        |       CAST((c_pairs - d_pairs) * 1000000 // (c_pairs + d_pairs + t_y)
        |         AS BIGINT) AS somers_d_ppm
        |FROM p""".stripMargin,

    "q510_theils_u" ->
      """WITH d AS (SELECT lang, source FROM documents),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM d),
        |hl AS (SELECT CAST(sum(CAST(round(-(CAST(c AS DOUBLE)/nt)
        |              * ln(CAST(c AS DOUBLE)/nt) * 1e9) AS BIGINT)) AS BIGINT) AS h
        |       FROM (SELECT count(*) AS c FROM d GROUP BY lang), nt),
        |hs AS (SELECT CAST(sum(CAST(round(-(CAST(c AS DOUBLE)/nt)
        |              * ln(CAST(c AS DOUBLE)/nt) * 1e9) AS BIGINT)) AS BIGINT) AS h
        |       FROM (SELECT count(*) AS c FROM d GROUP BY source), nt),
        |hj AS (SELECT CAST(sum(CAST(round(-(CAST(c AS DOUBLE)/nt)
        |              * ln(CAST(c AS DOUBLE)/nt) * 1e9) AS BIGINT)) AS BIGINT) AS h
        |       FROM (SELECT count(*) AS c FROM d GROUP BY lang, source), nt)
        |SELECT hl.h AS h_lang_nano, hs.h AS h_source_nano, hj.h AS h_joint_nano,
        |       CAST((hl.h + hs.h - hj.h) * 1000000 // hl.h AS BIGINT)
        |         AS u_lang_given_source_ppm,
        |       CAST((hl.h + hs.h - hj.h) * 1000000 // hs.h AS BIGINT)
        |         AS u_source_given_lang_ppm
        |FROM hl, hs, hj""".stripMargin,

    "q511_gram_schmidt" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |           WHERE vec_id <= 1),
        |q AS (SELECT vec_id, CAST(i AS BIGINT) AS pos,
        |             CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
        |      FROM v CROSS JOIN unnest(range(0, len(e))) AS u(i)),
        |j AS (SELECT a.pos, a.qv AS q0, b.qv AS q1
        |      FROM q a JOIN q b ON a.pos = b.pos AND a.vec_id = 0 AND b.vec_id = 1),
        |dots AS (SELECT sum(CAST(q1 AS HUGEINT) * q0) AS dot01,
        |                sum(CAST(q0 AS HUGEINT) * q0) AS n0,
        |                sum(CAST(q1 AS HUGEINT) * q1) AS n1 FROM j),
        |c AS (SELECT dot01, n0, n1, dot01 * 1000000 // n0 AS c_micro FROM dots),
        |r AS (SELECT c.dot01, c.n0, c.n1, c.c_micro,
        |             q1 * 1000000 - CAST(c.c_micro AS BIGINT) * q0 AS r, q0
        |      FROM j, c),
        |agg AS (SELECT dot01, n0, n1, c_micro,
        |               sum(CAST(r AS HUGEINT) * r) AS rn2,
        |               sum(CAST(r AS HUGEINT) * q0) AS rdot0
        |        FROM r GROUP BY 1, 2, 3, 4)
        |SELECT CAST(dot01 AS BIGINT) AS dot01_q, CAST(n0 AS BIGINT) AS norm0_q,
        |       CAST(n1 AS BIGINT) AS norm1_q, CAST(c_micro AS BIGINT) AS c_micro,
        |       CAST(rn2 // 1000000000000 AS BIGINT) AS resid_norm2_q,
        |       CAST(rdot0 // 1000000 AS BIGINT) AS resid_dot0_micro,
        |       CAST(CASE WHEN dot01 >= 0 THEN dot01 * dot01 * 1000000 // (n0 * n1)
        |                 ELSE -(dot01 * dot01 * 1000000 // (n0 * n1)) END
        |         AS BIGINT) AS cos2_signed_ppm
        |FROM agg""".stripMargin,

    "q512_moods_median" ->
      """WITH j AS (SELECT o_orderpriority AS g,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |vs AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1),
        |vc AS (SELECT v, cnt,
        |              CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |                AS BIGINT) AS cb
        |       FROM vs),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
        |med AS (SELECT v AS med, n FROM vc, nn
        |        WHERE cb < (n + 1) // 2 AND cb + cnt >= (n + 1) // 2),
        |cells AS (SELECT g, CASE WHEN v > med THEN 1 ELSE 0 END AS above, med, n,
        |                 CAST(count(*) AS BIGINT) AS o
        |          FROM j, med GROUP BY 1, 2, 3, 4),
        |ng AS (SELECT g, CAST(sum(o) AS BIGINT) AS n_g FROM cells GROUP BY 1),
        |ca AS (SELECT above, CAST(sum(o) AS BIGINT) AS n_a FROM cells GROUP BY 1),
        |s AS (SELECT med, n,
        |             CAST(sum(CAST(round(CAST(o AS DOUBLE) * o
        |               / (CAST(n_g AS DOUBLE) * n_a) * 1000000000) AS BIGINT))
        |               AS BIGINT) AS s9
        |      FROM cells JOIN ng USING (g) JOIN ca USING (above) GROUP BY 1, 2)
        |SELECT n AS n_orders, med AS median_cents,
        |       CAST(n * (s9 - 1000000000) AS BIGINT) AS chi2_nano
        |FROM s""".stripMargin,
  )
}
