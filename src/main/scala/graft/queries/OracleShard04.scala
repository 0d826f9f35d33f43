package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard04 {
  val defs: Map[String, String] = Map(

    "q193_supplier_diversity" ->
      """SELECT p_brand, p_size - (p_size % 10) AS size_band,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY n_suppliers DESC, p_brand, size_band""".stripMargin,

    "q194_share_within_type" ->
      s"""WITH g AS (
         |  SELECT p_type, p_brand,
         |         CAST(sum(${centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS rev_cents
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2
         |), w AS (
         |  SELECT p_type, p_brand, rev_cents,
         |         CAST(sum(rev_cents) OVER (PARTITION BY p_type) AS BIGINT) AS type_cents,
         |         CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
         |  FROM g
         |)
         |SELECT p_type, p_brand, rev_cents,
         |       round(CAST(rev_cents AS DOUBLE) / type_cents, 6) AS share_in_type,
         |       round(CAST(type_cents AS DOUBLE) / total_cents, 6) AS type_share
         |FROM w ORDER BY p_type, p_brand""".stripMargin,

    "q195_survival_curve" ->
      """WITH u AS (
        |  SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS fd,
        |         max(strftime(ts, '%Y-%m-%d')) AS ld
        |  FROM events GROUP BY 1
        |), st AS (SELECT fd AS day, CAST(count(*) AS BIGINT) AS ns FROM u GROUP BY 1),
        |en AS (SELECT ld AS day, CAST(count(*) AS BIGINT) AS ne FROM u GROUP BY 1),
        |g AS (
        |  SELECT coalesce(st.day, en.day) AS day,
        |         coalesce(ns, 0) AS ns, coalesce(ne, 0) AS ne
        |  FROM st FULL OUTER JOIN en ON st.day = en.day
        |), c AS (
        |  SELECT day, ns, ne,
        |         CAST(sum(ns) OVER w AS BIGINT) AS cs,
        |         CAST(sum(ne) OVER w AS BIGINT) AS ce
        |  FROM g
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), t AS (
        |  SELECT day, ne, cs - ce + ne AS n_at_risk,
        |         CASE WHEN ne < cs - ce + ne THEN
        |           CAST(round(ln(CAST(cs - ce + ne - ne AS DOUBLE) / (cs - ce + ne)) * 1e9)
        |                AS BIGINT) END AS term
        |  FROM c
        |), l AS (
        |  SELECT day, n_at_risk, ne, term,
        |         CAST(sum(term) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lognano
        |  FROM t
        |)
        |SELECT day, n_at_risk, ne AS n_churned,
        |       CASE WHEN term IS NOT NULL THEN CAST(lognano AS DOUBLE) / 1e9 END
        |         AS km_log_survival
        |FROM l ORDER BY day""".stripMargin,

    "q196_cv_folds" ->
      """WITH f AS (
        |  SELECT CAST(concat('0x', substr(md5('cv#' || CAST(o_orderkey AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 5 AS fold,
        |         o_orderpriority
        |  FROM orders
        |), g AS (
        |  SELECT fold, o_orderpriority, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2
        |)
        |SELECT fold, o_orderpriority, n,
        |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY fold), 6) AS fold_share,
        |       round(CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS DOUBLE) /
        |             sum(n) OVER (), 6) AS global_share
        |FROM g ORDER BY fold, o_orderpriority""".stripMargin,

    "q197_target_encode" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_orderpriority,
         |         CAST(${centsSql("o_totalprice")} AS BIGINT) AS cents
         |  FROM orders
         |), cat AS (
         |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS nc,
         |         CAST(sum(cents) AS BIGINT) AS sc
         |  FROM o GROUP BY 1
         |)
         |SELECT o_orderkey, o.o_orderpriority, cents,
         |       CASE WHEN nc > 1 THEN
         |         CAST((2 * (sc - cents) * 10000 + (nc - 1)) // (2 * (nc - 1)) AS DOUBLE)
         |           / 1000000.0 END AS loo_mean
         |FROM o JOIN cat ON o.o_orderpriority = cat.o_orderpriority
         |WHERE o_orderkey <= 20 ORDER BY o_orderkey""".stripMargin,

    "q198_top_paths" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type,
         |         epoch_us(date_trunc('microseconds', ts)) AS us
         |  FROM events
         |), f AS (
         |  SELECT user_id, event_id, event_type, us,
         |         CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1
         |              WHEN lag(us) OVER w IS NULL THEN 1
         |              ELSE 0 END AS is_new
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |), g AS (
         |  SELECT user_id, event_id, event_type, us,
         |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |              AS BIGINT) AS sess_idx,
         |         lpad(CAST(us AS VARCHAR), 16, '0') || '#' ||
         |           lpad(CAST(event_id AS VARCHAR), 8, '0') || '#' || event_type AS k
         |  FROM f
         |), p AS (
         |  SELECT list_aggregate(
         |           list_transform(list_sort(list(k))[1:4], x -> split_part(x, '#', 3)),
         |           'string_agg', '>') AS path
         |  FROM g GROUP BY user_id, sess_idx
         |)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    "q199_partition_balance" ->
      """WITH f AS (
        |  SELECT CAST(concat('0x', substr(md5('pb#' || CAST(o_orderkey AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 32 AS shard
        |  FROM orders
        |), g AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
        |t AS (SELECT shard, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM g)
        |SELECT shard, n,
        |       CAST((2 * n * 1000000 + total) // (2 * total) AS DOUBLE) / 1000000.0 AS share
        |FROM t ORDER BY shard""".stripMargin,

    "q200_funnel_latency" ->
      """WITH ft AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup'
        |                  THEN epoch_us(date_trunc('microseconds', ts)) END) AS t1,
        |         min(CASE WHEN event_type = 'click'
        |                  THEN epoch_us(date_trunc('microseconds', ts)) END) AS t2,
        |         min(CASE WHEN event_type = 'purchase'
        |                  THEN epoch_us(date_trunc('microseconds', ts)) END) AS t3
        |  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
        |  GROUP BY 1
        |), u AS (
        |  SELECT 'signup' AS stage_from, 'click' AS stage_to, t2 - t1 AS delta_us
        |  FROM ft WHERE t1 IS NOT NULL AND t2 >= t1
        |  UNION ALL
        |  SELECT 'click' AS stage_from, 'purchase' AS stage_to, t3 - t2 AS delta_us
        |  FROM ft WHERE t2 IS NOT NULL AND t3 >= t2
        |)
        |SELECT stage_from, stage_to, CAST(count(*) AS BIGINT) AS n_users,
        |       round(median(delta_us) / 3600000000.0, 6) AS median_hours
        |FROM u GROUP BY 1, 2 ORDER BY stage_from, stage_to""".stripMargin,

    "q201_repetition_factors" ->
      """WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |m AS (SELECT lang, n_docs, CAST(max(n_docs) OVER () AS BIGINT) AS n_max FROM g)
        |SELECT lang, n_docs,
        |       CAST((2 * n_max * 1000000 + n_docs) // (2 * n_docs) AS DOUBLE) / 1000000.0
        |         AS repeat_factor,
        |       CAST((n_max + n_docs - 1) // n_docs AS BIGINT) AS epochs
        |FROM m ORDER BY lang""".stripMargin,

    "q202_join_coverage" ->
      """SELECT CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_matched,
        |       CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_only,
        |       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vec_only
        |FROM (SELECT doc_id FROM documents) d
        |FULL OUTER JOIN (SELECT vec_id FROM embeddings) e ON doc_id = vec_id""".stripMargin,

    "q203_char_classes" ->
      """WITH a AS (
        |  SELECT source, CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |         CAST(sum(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')))
        |              AS BIGINT) AS n_alpha,
        |         CAST(sum(length(text) - length(regexp_replace(text, ' ', '', 'g')))
        |              AS BIGINT) AS n_space
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1
        |)
        |SELECT source, n_chars,
        |       CAST((2 * n_alpha * 1000000 + n_chars) // (2 * n_chars) AS DOUBLE) / 1000000.0
        |         AS alpha_frac,
        |       CAST((2 * n_space * 1000000 + n_chars) // (2 * n_chars) AS DOUBLE) / 1000000.0
        |         AS space_frac,
        |       CAST((2 * (n_chars - n_alpha - n_space) * 1000000 + n_chars) // (2 * n_chars)
        |            AS DOUBLE) / 1000000.0 AS other_frac
        |FROM a ORDER BY source""".stripMargin,

    "q204_activity_gini" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |r AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i FROM pu
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_users, CAST(sum(x) AS BIGINT) AS total_events,
        |         sum(CAST(i AS HUGEINT) * x) AS siw
        |  FROM r
        |)
        |SELECT n_users, total_events,
        |       CAST((2 * (2 * siw - CAST(n_users + 1 AS HUGEINT) * total_events) * 1000000
        |             + CAST(n_users AS HUGEINT) * total_events)
        |            // (2 * CAST(n_users AS HUGEINT) * total_events)
        |            AS DOUBLE) / 1000000.0 AS gini
        |FROM a""".stripMargin,

    // Spearman on deterministic permutation ranks: rho = (12·Σrxry −
    // 3n(n+1)²)/(n³−n), all HUGEINT; the CASE keeps the `//` numerator
    // non-negative so floor ≡ truncate.
    "q205_spearman_activity" ->
      s"""WITH pc AS (
         |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS x,
         |         CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS y
         |  FROM orders GROUP BY 1
         |), r AS (
         |  SELECT CAST(row_number() OVER (ORDER BY x, o_custkey) AS HUGEINT) AS rx,
         |         CAST(row_number() OVER (ORDER BY y, o_custkey) AS HUGEINT) AS ry
         |  FROM pc
         |), a AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(rx * ry) AS sxy FROM r
         |)
         |SELECT CAST(n AS BIGINT) AS n,
         |       CAST((CASE WHEN 12 * sxy - 3 * n * (n + 1) * (n + 1) >= 0
         |             THEN (2 * (12 * sxy - 3 * n * (n + 1) * (n + 1)) * 1000000
         |                   + (n * n * n - n)) // (2 * (n * n * n - n))
         |             ELSE -((2 * -(12 * sxy - 3 * n * (n + 1) * (n + 1)) * 1000000
         |                   + (n * n * n - n)) // (2 * (n * n * n - n))) END)
         |            AS DOUBLE) / 1000000.0 AS spearman_rho
         |FROM a""".stripMargin,

    "q206_ks_price_drift" ->
      s"""WITH src AS (
         |  SELECT ${centsSql("o_totalprice")} AS v,
         |         CAST(year(o_orderdate) AS VARCHAR) AS yr
         |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
         |), pv AS (
         |  SELECT v, CAST(sum(CASE WHEN yr = '1995' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |         CAST(sum(CASE WHEN yr = '1996' THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM src GROUP BY 1
         |), cum AS (
         |  SELECT CAST(sum(ca) OVER w AS HUGEINT) AS cuma,
         |         CAST(sum(cb) OVER w AS HUGEINT) AS cumb,
         |         CAST(sum(ca) OVER () AS HUGEINT) AS na,
         |         CAST(sum(cb) OVER () AS HUGEINT) AS nb
         |  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |), a AS (
         |  SELECT max(na) AS na, max(nb) AS nb, max(abs(cuma * nb - cumb * na)) AS d FROM cum
         |)
         |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |       CAST((2 * d * 1000000 + na * nb) // (2 * na * nb) AS DOUBLE) / 1000000.0 AS ks
         |FROM a""".stripMargin,

    // Rank-sum AUC: AUC = (2·Σr₊ − P(P+1)) / (2PN) on (score, doc_id)
    // permutation ranks — numerator always ≥ 0. Positives = q21's
    // MinHash candidate members.
    "q207_dup_length_auc" ->
      s"""$minhashCte,
        |members AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_a AS doc_id FROM cand UNION ALL SELECT doc_b AS doc_id FROM cand)
        |), s AS (
        |  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS score,
        |         CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END AS label
        |  FROM documents d LEFT JOIN members m ON d.doc_id = m.doc_id
        |  WHERE d.text IS NOT NULL
        |), r AS (
        |  SELECT label, CAST(row_number() OVER (ORDER BY score, doc_id) AS HUGEINT) AS rk FROM s
        |), a AS (
        |  SELECT CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS p,
        |         CAST(sum(CASE WHEN label = 1 THEN 0 ELSE 1 END) AS HUGEINT) AS nn,
        |         CAST(sum(CASE WHEN label = 1 THEN rk ELSE 0 END) AS HUGEINT) AS rs
        |  FROM r
        |)
        |SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        |       CAST((2 * (2 * rs - p * (p + 1)) * 1000000 + 2 * p * nn)
        |            // (2 * (2 * p * nn)) AS DOUBLE) / 1000000.0 AS auc
        |FROM a""".stripMargin,

    // PSI with add-one smoothing; p, q are exact double ratios of
    // integers, each (p−q)·ln(p/q) term nano-quantized (q72 discipline).
    // DuckDB dayofweek is 0-based Sunday; Spark's is 1-based.
    "q208_psi_event_drift" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CASE WHEN dayofweek(date_trunc('microseconds', ts)) IN (0, 6)
        |              THEN 'wkend' ELSE 'wkday' END AS cohort
        |  FROM events
        |), pc AS (
        |  SELECT event_type AS category,
        |         CAST(sum(CASE WHEN cohort = 'wkday' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN cohort = 'wkend' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM e GROUP BY 1
        |), t AS (
        |  SELECT category, n_a, n_b,
        |         CAST(sum(n_a) OVER () + count(*) OVER () AS BIGINT) AS ta,
        |         CAST(sum(n_b) OVER () + count(*) OVER () AS BIGINT) AS tb
        |  FROM pc
        |), qx AS (
        |  SELECT category, n_a, n_b,
        |         CAST(n_a + 1 AS DOUBLE) / CAST(ta AS DOUBLE) AS p,
        |         CAST(n_b + 1 AS DOUBLE) / CAST(tb AS DOUBLE) AS q
        |  FROM t
        |)
        |SELECT category, n_a, n_b,
        |       round(CAST(round((p - q) * ln(p / q) * 1000000000) AS BIGINT)
        |             / 1000000000.0, 6) AS psi_term
        |FROM qx ORDER BY category""".stripMargin,

    // BM25 (Lucene idf): per-term contribution = idf_micro · 44·tf·L /
    // (20·tf·L + 6·L + 18·len·N), half-away micro BEFORE the per-doc sum.
    "q209_bm25_topk" ->
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
        |), c AS (
        |  SELECT tf.doc_id,
        |         (2 * (idf.idf_micro * 44 * tf.tf * tot.big_l)
        |          + (20 * tf.tf * tot.big_l + 6 * tot.big_l + 18 * lens.len * tot.big_n))
        |         // (2 * (20 * tf.tf * tot.big_l + 6 * tot.big_l + 18 * lens.len * tot.big_n))
        |           AS c
        |  FROM tf JOIN idf USING (w) JOIN lens USING (doc_id), tot
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |       round(CAST(sum(c) AS DOUBLE) / 1000000.0, 6) AS bm25
        |FROM c GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    // Containment: q23's exact-verification chain with asymmetric
    // normalizers instead of the union size.
    "q210_containment" ->
      s"""$minhashCte, bg AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(ws) >= 2
         |           THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
         |           ELSE [text] END) AS sh
         |    FROM w)
         |), sizes AS (SELECT doc_id, count(*) AS sz FROM bg GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS i
         |  FROM cand c
         |  JOIN bg a ON a.doc_id = c.doc_a
         |  JOIN bg b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b,
         |       round(CAST(i AS DOUBLE) / sa.sz, 6) AS contain_a,
         |       round(CAST(i AS DOUBLE) / sb.sz, 6) AS contain_b
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q211_curriculum_order" ->
      """WITH s AS (
        |  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS score
        |  FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id)
        |              AS BIGINT) AS rk
        |  FROM s
        |)
        |SELECT CAST(row_number() OVER (ORDER BY rk, source) AS BIGINT) AS pos,
        |       doc_id, source, rk
        |FROM r ORDER BY pos LIMIT 50""".stripMargin,

    "q212_padding_waste" ->
      """WITH lens AS (
        |  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0))
        |                      AS BIGINT) AS len
        |  FROM documents WHERE text IS NOT NULL
        |), arrival AS (
        |  SELECT len, (CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1) // 32 AS bucket
        |  FROM lens
        |), bysort AS (
        |  SELECT len, (CAST(row_number() OVER (ORDER BY len, doc_id) AS BIGINT) - 1) // 32
        |           AS bucket
        |  FROM lens
        |), ba AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(max(len) AS BIGINT) AS mx,
        |         CAST(sum(len) AS BIGINT) AS useful
        |  FROM arrival GROUP BY 1
        |), bs AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(max(len) AS BIGINT) AS mx,
        |         CAST(sum(len) AS BIGINT) AS useful
        |  FROM bysort GROUP BY 1
        |), u AS (
        |  SELECT 'arrival' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
        |         CAST(sum(n * mx) AS BIGINT) AS padded_tokens,
        |         CAST(sum(useful) AS BIGINT) AS useful_tokens
        |  FROM ba
        |  UNION ALL
        |  SELECT 'length_sorted' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
        |         CAST(sum(n * mx) AS BIGINT) AS padded_tokens,
        |         CAST(sum(useful) AS BIGINT) AS useful_tokens
        |  FROM bs
        |)
        |SELECT strategy, n_batches, padded_tokens, useful_tokens,
        |       CAST((2 * (padded_tokens - useful_tokens) * 1000000 + padded_tokens)
        |            // (2 * padded_tokens) AS DOUBLE) / 1000000.0 AS waste_frac
        |FROM u ORDER BY strategy""".stripMargin,

    // Pareto frontier: dominated iff a strictly-cheaper row has size ≥
    // mine, or a same-price row has size > mine.
    "q213_pareto_frontier" ->
      """WITH p AS (
        |  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |         CAST(p_size AS BIGINT) AS psize
        |  FROM part
        |), w AS (
        |  SELECT *,
        |         max(psize) OVER (ORDER BY price_c
        |                          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_cheaper,
        |         max(psize) OVER (PARTITION BY price_c) AS mx_same
        |  FROM p
        |)
        |SELECT p_partkey, price_c, psize FROM w
        |WHERE NOT (coalesce(mx_cheaper >= psize, FALSE) OR mx_same > psize)
        |ORDER BY price_c, p_partkey""".stripMargin,

    "q214_cusum_changepoint" ->
      """WITH d AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(rev) AS BIGINT) AS tot FROM d),
        |c AS (
        |  SELECT day, rev,
        |         CAST(sum(rev * nd - tot) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS cusum
        |  FROM d, t
        |), m AS (SELECT max(abs(cusum)) AS mx FROM c)
        |SELECT day, rev, cusum,
        |       CAST(CASE WHEN abs(cusum) = m.mx THEN 1 ELSE 0 END AS BIGINT) AS is_peak
        |FROM c, m ORDER BY day""".stripMargin,

    "q215_phrase_match" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |), bg AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(ws) >= 2
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
        |         ELSE [array_to_string(ws, ' ')] END) AS sh
        |  FROM w
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM bg WHERE sh = 'hash join'
        |GROUP BY 1 ORDER BY n_hits DESC, doc_id LIMIT 20""".stripMargin,

    // PPJoin prefix filter: rarest-first bigram order, prefix length
    // |d| − ⌈9|d|/10⌉ + 1, length filter in the join, integer
    // cross-multiplied τ filter.
    "q216_prefix_filter_join" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |), t AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(
        |      CASE WHEN len(ws) >= 2
        |           THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
        |           ELSE [array_to_string(ws, ' ')] END) AS sh
        |    FROM w)
        |), d AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY 1),
        |r AS (
        |  SELECT t.doc_id, t.sh,
        |         CAST(count(*) OVER (PARTITION BY t.doc_id) AS BIGINT) AS n,
        |         CAST(row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.sh)
        |              AS BIGINT) AS rn
        |  FROM t JOIN d USING (sh)
        |), p AS (
        |  SELECT doc_id, sh, n FROM r WHERE rn <= n - ((9*n + 9) // 10) + 1
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |                  a.n AS sz_a, b.n AS sz_b
        |  FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |                    AND 9 * a.n <= 10 * b.n AND 9 * b.n <= 10 * a.n
        |), i AS (
        |  SELECT c.doc_a, c.doc_b, c.sz_a, c.sz_b, CAST(count(*) AS BIGINT) AS inter
        |  FROM cand c
        |  JOIN t a ON a.doc_id = c.doc_a
        |  JOIN t b ON b.doc_id = c.doc_b AND b.sh = a.sh
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT doc_a, doc_b,
        |       round(CAST(inter AS DOUBLE) / (sz_a + sz_b - inter), 6) AS jaccard
        |FROM i WHERE inter * 19 >= (sz_a + sz_b) * 9
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q217_incr_agg_maintain" ->
      """SELECT o_custkey,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "q218_source_vocab_overlap" ->
      """WITH tf AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0 GROUP BY 1, 2
        |), top AS (
        |  SELECT source, w FROM (
        |    SELECT source, w,
        |           row_number() OVER (PARTITION BY source ORDER BY tf DESC, w) AS rn
        |    FROM tf)
        |  WHERE rn <= 20
        |), sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM top GROUP BY 1),
        |o AS (
        |  SELECT a.source AS source_a, b.source AS source_b, CAST(count(*) AS BIGINT) AS overlap
        |  FROM top a JOIN top b ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT source_a, source_b, overlap,
        |       round(CAST(overlap AS DOUBLE) / (sa.sz + sb.sz - overlap), 6) AS jaccard
        |FROM o JOIN sz sa ON sa.source = source_a JOIN sz sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,

    "q219_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT) AS band,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2, 3
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |       CAST(sum(n) AS BIGINT) AS total_rows,
        |       CAST((2 * sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000 + sum(n))
        |            // (2 * sum(n)) AS DOUBLE) / 1000000.0 AS risk_frac
        |FROM g""".stripMargin,

    "q220_mmr_rerank" -> mmrSql(5),

    // Hybrid RRF: q209's BM25 chain (corpus stats include doc 0; doc 0
    // excluded from the RANKING) fused with the dense cosine ranking.
    "q221_hybrid_retrieval" ->
      s"""$normCte,
         |words AS (
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
         |), c AS (
         |  SELECT tf.doc_id,
         |         (2 * (idf.idf_micro * 44 * tf.tf * tot.big_l)
         |          + (20 * tf.tf * tot.big_l + 6 * tot.big_l + 18 * lens.len * tot.big_n))
         |         // (2 * (20 * tf.tf * tot.big_l + 6 * tot.big_l + 18 * lens.len * tot.big_n))
         |           AS c
         |  FROM tf JOIN idf USING (w) JOIN lens USING (doc_id), tot
         |), bm AS (
         |  SELECT doc_id, round(CAST(sum(c) AS DOUBLE) / 1000000.0, 6) AS bm25
         |  FROM c WHERE doc_id <> 0 GROUP BY 1
         |), rs AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
         |           AS r_sparse
         |  FROM bm
         |), q AS (SELECT e AS qv, nrm AS qn FROM n WHERE vec_id = 0),
         |ds AS (
         |  SELECT n.vec_id AS doc_id,
         |         round(list_sum(list_transform(range(1, len(n.e)+1), i -> n.e[i]*q.qv[i]))
         |               / (n.nrm * q.qn), 6) AS sim
         |  FROM n, q WHERE n.vec_id <> 0
         |), rd AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
         |           AS r_dense
         |  FROM ds
         |)
         |SELECT coalesce(rs.doc_id, rd.doc_id) AS doc_id,
         |       CAST(coalesce(r_sparse, 0) AS BIGINT) AS r_sparse,
         |       CAST(coalesce(r_dense, 0) AS BIGINT) AS r_dense,
         |       CAST(coalesce(CAST(round(1000000000.0 / (60 + r_sparse)) AS BIGINT), 0)
         |          + coalesce(CAST(round(1000000000.0 / (60 + r_dense)) AS BIGINT), 0)
         |            AS BIGINT) AS rrf_u
         |FROM rs FULL OUTER JOIN rd ON rs.doc_id = rd.doc_id
         |ORDER BY rrf_u DESC, doc_id LIMIT 10""".stripMargin,

    "q222_dq_expectations" ->
      """SELECT * FROM (
        |  SELECT 'fk_custkey_missing' AS "check", CAST(count(*) AS BIGINT) AS n_violations
        |  FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'null_orderdate', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_orderdate IS NULL
        |  UNION ALL
        |  SELECT 'nonpositive_totalprice', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_totalprice <= 0
        |  UNION ALL
        |  SELECT 'dup_orderkey', CAST(coalesce(sum(n), 0) AS BIGINT) FROM (
        |    SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
        |) ORDER BY "check"""".stripMargin,

    "q223_seasonal_index" ->
      """WITH d AS (
        |  SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), b AS (
        |  SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS rev
        |  FROM d GROUP BY 1
        |), t AS (SELECT CAST(sum(n) AS HUGEINT) AS tn, CAST(sum(rev) AS HUGEINT) AS tr FROM b)
        |SELECT dow, n, rev,
        |       CAST((2 * CAST(rev AS HUGEINT) * tn * 1000000 + tr * n)
        |            // (2 * tr * n) AS BIGINT) AS index_ppm
        |FROM b, t ORDER BY dow""".stripMargin,

    "q224_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |         CAST(round(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem
        |), g AS (
        |  SELECT l_returnflag, price_c, CAST(sum(qty) AS BIGINT) AS w FROM li GROUP BY 1, 2
        |), c AS (
        |  SELECT l_returnflag, price_c,
        |         CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
        |         CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw
        |  FROM g
        |)
        |SELECT l_returnflag, CAST(min(price_c) AS BIGINT) AS median_price_c,
        |       CAST(max(totw) AS BIGINT) AS total_qty
        |FROM c WHERE cumw * 2 >= totw GROUP BY 1 ORDER BY 1""".stripMargin,

    // Two synchronous LPA rounds, self-vote included, min-label ties.
    "q225_label_propagation" ->
      s"""$minhashCte,
         |und AS (SELECT doc_a AS u, doc_b AS v FROM cand
         |        UNION ALL SELECT doc_b, doc_a FROM cand),
         |l0 AS (SELECT doc_id AS u, lang AS lbl FROM documents),
         |v1 AS (SELECT und.u, s.lbl FROM und JOIN l0 s ON s.u = und.v
         |       UNION ALL SELECT u, lbl FROM l0),
         |c1 AS (SELECT u, lbl, count(*) AS c FROM v1 GROUP BY 1, 2),
         |l1 AS (SELECT u, lbl FROM (
         |         SELECT u, lbl, row_number() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn
         |         FROM c1) WHERE rn = 1),
         |v2 AS (SELECT und.u, s.lbl FROM und JOIN l1 s ON s.u = und.v
         |       UNION ALL SELECT u, lbl FROM l1),
         |c2 AS (SELECT u, lbl, count(*) AS c FROM v2 GROUP BY 1, 2),
         |l2 AS (SELECT u, lbl FROM (
         |         SELECT u, lbl, row_number() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn
         |         FROM c2) WHERE rn = 1)
         |SELECT l2.u AS doc_id, l0.lbl AS lang_before, l2.lbl AS lang_after
         |FROM l2 JOIN l0 ON l0.u = l2.u
         |WHERE l2.lbl <> l0.lbl ORDER BY doc_id""".stripMargin,

    "q226_edit_blocking" ->
      """WITH b AS (SELECT p_partkey AS k, p_brand, length(p_name) AS ln, p_name FROM part)
        |SELECT a.k AS part_a, c.k AS part_b, a.p_brand AS brand,
        |       CAST(levenshtein(a.p_name, c.p_name) AS BIGINT) AS dist
        |FROM b a JOIN b c ON a.p_brand = c.p_brand AND a.ln = c.ln AND a.k < c.k
        |ORDER BY dist, part_a, part_b LIMIT 25""".stripMargin,

    "q227_compaction_plan" ->
      """WITH f AS (
        |  SELECT source, doc_id % 16 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2
        |), o AS (
        |  SELECT *, CAST(sum(bytes) OVER (ORDER BY bytes DESC, source, shard
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM f
        |)
        |SELECT CAST((cum - bytes) // 16384 AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |       CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |       CAST(max(bytes) AS BIGINT) AS max_file_bytes,
        |       CAST(sum(bytes) * 1000000 // 16384 AS BIGINT) AS fill_ppm
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q228_benford_audit" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |     d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
        |     n AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |     t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM n),
        |     e AS (SELECT * FROM (VALUES (1,301030),(2,176091),(3,124939),(4,96910),(5,79181),
        |                                 (6,66947),(7,57992),(8,51153),(9,45757)) AS v(digit, benford_ppm))
        |SELECT CAST(e.digit AS BIGINT) AS digit, CAST(coalesce(n.n, 0) AS BIGINT) AS n,
        |       CAST(coalesce(n.n, 0) * 1000000 // t.tot AS BIGINT) AS actual_ppm,
        |       CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
        |       CAST(coalesce(n.n, 0) * 1000000 // t.tot - e.benford_ppm AS BIGINT) AS delta_ppm
        |FROM e LEFT JOIN n ON n.digit = e.digit CROSS JOIN t ORDER BY digit""".stripMargin,

    "q229_assoc_rules" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |            FROM lineitem JOIN part ON p_partkey = l_partkey),
        |     ni AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY 1),
        |     nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS total FROM ob),
        |     pr AS (SELECT a.b AS ante, c.b AS cons, CAST(count(*) AS BIGINT) AS n_ab
        |            FROM ob a JOIN ob c ON a.o = c.o AND a.b <> c.b GROUP BY 1, 2)
        |SELECT pr.ante, pr.cons, pr.n_ab,
        |       CAST(pr.n_ab * 1000000 // na.n AS BIGINT) AS conf_ppm,
        |       CAST(pr.n_ab * nn.total * 1000000 // (na.n * nc.n) AS BIGINT) AS lift_ppm
        |FROM pr JOIN ni na ON na.b = pr.ante JOIN ni nc ON nc.b = pr.cons CROSS JOIN nn
        |WHERE pr.n_ab >= 20
        |ORDER BY lift_ppm DESC, ante, cons LIMIT 25""".stripMargin,

    "q230_markov_stationary" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS e,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events
        |), tr AS (
        |  SELECT e AS i, nxt AS j, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), tot AS (SELECT i, CAST(sum(n) AS BIGINT) AS ni FROM tr GROUP BY 1),
        |p1 AS (SELECT tr.j AS state, CAST(sum(200000 * tr.n // tot.ni) AS BIGINT) AS pi
        |       FROM tr JOIN tot ON tot.i = tr.i GROUP BY 1),
        |p2 AS (SELECT tr.j AS state, CAST(sum(p1.pi * tr.n // tot.ni) AS BIGINT) AS pi
        |       FROM tr JOIN tot ON tot.i = tr.i JOIN p1 ON p1.state = tr.i GROUP BY 1),
        |p3 AS (SELECT tr.j AS state, CAST(sum(p2.pi * tr.n // tot.ni) AS BIGINT) AS pi
        |       FROM tr JOIN tot ON tot.i = tr.i JOIN p2 ON p2.state = tr.i GROUP BY 1)
        |SELECT p3.state, tot.ni AS n_out, p3.pi AS pi_ppm
        |FROM p3 JOIN tot ON tot.i = p3.state ORDER BY 1""".stripMargin,

    "q231_zorder_layout" ->
      """WITH zed AS (
        |  SELECT CAST(o_custkey % 16 AS BIGINT) AS x,
        |         CAST(((year(o_orderdate) * 12 + month(o_orderdate)) - 23941) % 16 AS BIGINT) AS y
        |  FROM orders
        |), m AS (
        |  SELECT x, y,
        |         (x & 1) + 2 * (y & 1) + 4 * ((x >> 1) & 1) + 8 * ((y >> 1) & 1)
        |         + 16 * ((x >> 2) & 1) + 32 * ((y >> 2) & 1)
        |         + 64 * ((x >> 3) & 1) + 128 * ((y >> 3) & 1) AS z
        |  FROM zed
        |), a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN z BETWEEN 0 AND 63 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN x BETWEEN 0 AND 7 AND y BETWEEN 0 AND 7 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(sum(CASE WHEN z BETWEEN 16 AND 31 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN x BETWEEN 4 AND 7 AND y BETWEEN 0 AND 3 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        |    CAST(sum(CASE WHEN z BETWEEN 13 AND 198 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        |    CAST(sum(CASE WHEN x BETWEEN 3 AND 10 AND y BETWEEN 2 AND 9 THEN 1 ELSE 0 END) AS BIGINT) AS h3
        |  FROM m
        |)
        |SELECT box_id, scanned, hits, CAST(hits * 1000000 // scanned AS BIGINT) AS precision_ppm
        |FROM (
        |  SELECT CAST(1 AS BIGINT) AS box_id, s1 AS scanned, h1 AS hits FROM a
        |  UNION ALL SELECT 2, s2, h2 FROM a
        |  UNION ALL SELECT 3, s3, h3 FROM a
        |) ORDER BY box_id""".stripMargin,

    "q232_welch_ttest" ->
      """WITH g AS (
        |  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS HUGEINT) AS s,
        |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
        |                  * CAST(round(c_acctbal * 100) AS BIGINT)) AS HUGEINT) AS ss
        |  FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING') GROUP BY 1
        |), a AS (SELECT * FROM g WHERE seg = 'AUTOMOBILE'),
        |   b AS (SELECT * FROM g WHERE seg = 'BUILDING')
        |SELECT a.n AS n_a, b.n AS n_b,
        |  round(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) / 100.0, 6) AS mean_a,
        |  round(CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) / 100.0, 6) AS mean_b,
        |  round((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) /
        |        sqrt((CAST(a.n AS DOUBLE) * CAST(a.ss AS DOUBLE) - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE))
        |             / (CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)) +
        |             (CAST(b.n AS DOUBLE) * CAST(b.ss AS DOUBLE) - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))
        |             / (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE) - 1.0))), 6) AS t_stat
        |FROM a, b""".stripMargin,

    "q233_readability" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS words,
        |    CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT) AS syll,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sents
        |  FROM documents
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS words, CAST(sum(syll) AS BIGINT) AS syllables,
        |  CAST(sum(sents) AS BIGINT) AS sentences,
        |  CAST(206835 - 1015 * sum(words) // sum(sents) - 84600 * sum(syll) // sum(words) AS BIGINT)
        |    AS flesch_milli
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q234_fd_profile" ->
      """WITH
        |g1 AS (SELECT CAST(p_brand AS VARCHAR) a, CAST(p_type AS VARCHAR) b,
        |              CAST(count(*) AS BIGINT) n FROM part GROUP BY 1, 2),
        |s1 AS (SELECT a, CAST(sum(n) AS BIGINT) tot, CAST(max(n) AS BIGINT) mx,
        |              CAST(count(*) AS BIGINT) nb FROM g1 GROUP BY 1),
        |r1 AS (SELECT 'part: p_brand -> p_type' AS fd, CAST(count(*) AS BIGINT) n_groups,
        |              CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) violating_groups,
        |              CAST(sum(mx) * 1000000 // sum(tot) AS BIGINT) support_ppm FROM s1),
        |g2 AS (SELECT CAST(l_partkey AS VARCHAR) a, CAST(l_suppkey AS VARCHAR) b,
        |              CAST(count(*) AS BIGINT) n FROM lineitem GROUP BY 1, 2),
        |s2 AS (SELECT a, CAST(sum(n) AS BIGINT) tot, CAST(max(n) AS BIGINT) mx,
        |              CAST(count(*) AS BIGINT) nb FROM g2 GROUP BY 1),
        |r2 AS (SELECT 'lineitem: l_partkey -> l_suppkey' AS fd, CAST(count(*) AS BIGINT),
        |              CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |              CAST(sum(mx) * 1000000 // sum(tot) AS BIGINT) FROM s2),
        |g3 AS (SELECT CAST(c_nationkey AS VARCHAR) a, CAST(c_mktsegment AS VARCHAR) b,
        |              CAST(count(*) AS BIGINT) n FROM customer GROUP BY 1, 2),
        |s3 AS (SELECT a, CAST(sum(n) AS BIGINT) tot, CAST(max(n) AS BIGINT) mx,
        |              CAST(count(*) AS BIGINT) nb FROM g3 GROUP BY 1),
        |r3 AS (SELECT 'customer: c_nationkey -> c_mktsegment' AS fd, CAST(count(*) AS BIGINT),
        |              CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |              CAST(sum(mx) * 1000000 // sum(tot) AS BIGINT) FROM s3)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |ORDER BY fd""".stripMargin,

    "q235_theilsen_slope" ->
      """WITH raw AS (SELECT p_brand, CAST(p_size AS BIGINT) x,
        |                    CAST(round(p_retailprice * 100) AS BIGINT) y FROM part),
        |p AS (
        |  SELECT p_brand, x,
        |         CAST(CAST(sum(CAST(y AS HUGEINT)) // count(*) AS BIGINT) AS BIGINT) AS y
        |  FROM raw GROUP BY 1, 2
        |),
        |pairs AS (
        |  SELECT a.p_brand,
        |    CASE WHEN (b.y - a.y) >= 0
        |         THEN (2 * (b.y - a.y) * 1000 + (b.x - a.x)) // (2 * (b.x - a.x))
        |         ELSE -((2 * (a.y - b.y) * 1000 + (b.x - a.x)) // (2 * (b.x - a.x))) END
        |      AS slope_milli
        |  FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.x < b.x
        |), r AS (
        |  SELECT p_brand, slope_milli,
        |         row_number() OVER (PARTITION BY p_brand ORDER BY slope_milli) AS rn,
        |         count(*) OVER (PARTITION BY p_brand) AS n
        |  FROM pairs
        |)
        |SELECT p_brand, CAST(max(n) AS BIGINT) AS n_pairs,
        |       CAST(min(slope_milli) AS BIGINT) AS median_slope_milli
        |FROM r WHERE rn = (n + 1) // 2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q236_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem GROUP BY 1
        |), t AS (SELECT CAST(sum(value_c) AS HUGEINT) AS tot FROM pv)
        |SELECT pv.l_partkey AS partkey, p.p_brand AS brand, pv.value_c
        |FROM pv JOIN part p ON p.p_partkey = pv.l_partkey CROSS JOIN t
        |WHERE CAST(pv.value_c AS HUGEINT) * 2000 > t.tot
        |ORDER BY pv.value_c DESC, partkey LIMIT 25""".stripMargin,

    "q237_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sc,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem GROUP BY 1, 2
        |), u AS (
        |  SELECT pk, sk, sc // sq AS unit_c,
        |         min(sc // sq) OVER (PARTITION BY pk) AS min_unit_c
        |  FROM ps WHERE sq > 0
        |)
        |SELECT u.pk AS partkey, u.sk AS suppkey, s.s_name, n.n_name AS nation,
        |       CAST(u.unit_c AS BIGINT) AS unit_c
        |FROM u JOIN supplier s ON s.s_suppkey = u.sk
        |       JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE u.unit_c = u.min_unit_c
        |ORDER BY unit_c, partkey, suppkey LIMIT 25""".stripMargin,

    "q238_outlier_ensemble" ->
      """WITH c AS (
        |  SELECT c.c_mktsegment AS seg,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x,
        |         c.c_custkey AS k
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1, 3
        |),
        |r AS (SELECT seg, x, k, row_number() OVER (PARTITION BY seg ORDER BY x, k) AS rn,
        |        count(*) OVER (PARTITION BY seg) AS n FROM c),
        |med AS (SELECT seg, x AS med FROM r WHERE rn = (n + 1) // 2),
        |q1 AS (SELECT seg, x AS q1 FROM r WHERE rn = greatest(1, n // 4)),
        |q3 AS (SELECT seg, x AS q3 FROM r WHERE rn = (3 * n) // 4),
        |dev AS (SELECT c.seg, c.x, c.k, abs(c.x - med.med) AS d
        |        FROM c JOIN med ON med.seg = c.seg),
        |rd AS (SELECT seg, d, row_number() OVER (PARTITION BY seg ORDER BY d, k) AS rn,
        |              count(*) OVER (PARTITION BY seg) AS n FROM dev),
        |mad AS (SELECT seg, d AS mad FROM rd WHERE rn = (n + 1) // 2),
        |mom AS (SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
        |               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss FROM c GROUP BY 1),
        |f AS (
        |  SELECT c.seg,
        |    CASE WHEN 2 * c.x < 2 * q1.q1 - 3 * (q3.q3 - q1.q1)
        |           OR 2 * c.x > 2 * q3.q3 + 3 * (q3.q3 - q1.q1) THEN 1 ELSE 0 END AS f_iqr,
        |    CASE WHEN abs(c.x - med.med) * 10000 > 44478 * mad.mad THEN 1 ELSE 0 END AS f_mad,
        |    CASE WHEN 4 * (CAST(c.x AS HUGEINT) * mom.n - mom.s)
        |             * (CAST(c.x AS HUGEINT) * mom.n - mom.s) * (mom.n - 1)
        |         > 25 * mom.n * (mom.n * mom.ss - mom.s * mom.s) THEN 1 ELSE 0 END AS f_z
        |  FROM c JOIN med ON med.seg = c.seg JOIN q1 ON q1.seg = c.seg
        |       JOIN q3 ON q3.seg = c.seg JOIN mad ON mad.seg = c.seg
        |       JOIN mom ON mom.seg = c.seg
        |)
        |SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(f_iqr) AS BIGINT) AS out_iqr,
        |  CAST(sum(f_mad) AS BIGINT) AS out_mad, CAST(sum(f_z) AS BIGINT) AS out_z,
        |  CAST(sum(CASE WHEN f_iqr + f_mad + f_z >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS out_ensemble
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q239_abc_classification" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1
        |), o AS (
        |  SELECT l_partkey, rev,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS cum,
        |    CAST(sum(rev) OVER () AS BIGINT) AS tot
        |  FROM pv
        |)
        |SELECT CASE WHEN cum * 10 <= tot * 7 THEN 'A'
        |            WHEN cum * 10 <= tot * 9 THEN 'B' ELSE 'C' END AS cls,
        |  CAST(count(*) AS BIGINT) AS n_parts, CAST(sum(rev) AS BIGINT) AS revenue_c,
        |  CAST(CAST(sum(rev) AS HUGEINT) * 1000000 // max(tot) AS BIGINT) AS share_ppm
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q240_rolling_revenue" ->
      """WITH m AS (
        |  SELECT n.n_name AS nation,
        |         CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate)) - 23941 AS BIGINT) AS mi,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |       JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  GROUP BY 1, 2
        |)
        |SELECT nation, mi, rev,
        |  CAST(sum(rev) OVER (PARTITION BY nation ORDER BY mi
        |                      RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS rolling3_rev
        |FROM m ORDER BY nation, mi""".stripMargin,

    "q241_delay_priority" ->
      """SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) // 30 AS BIGINT)
        |         AS delay_bucket,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
        |       AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
        |       AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q242_kcore" ->
      s"""$minhashCte,
         |e0 AS (SELECT doc_a AS u, doc_b AS v FROM cand),
         |b0 AS (SELECT u FROM e0 UNION ALL SELECT v FROM e0),
         |d1 AS (SELECT u, count(*) AS c FROM b0 GROUP BY 1),
         |n1 AS (SELECT u FROM d1 WHERE c >= 2),
         |e1 AS (SELECT e0.u, e0.v FROM e0 JOIN n1 a ON a.u = e0.u JOIN n1 b ON b.u = e0.v),
         |b1 AS (SELECT u FROM e1 UNION ALL SELECT v FROM e1),
         |d2 AS (SELECT u, count(*) AS c FROM b1 GROUP BY 1),
         |n2 AS (SELECT u FROM d2 WHERE c >= 2),
         |e2 AS (SELECT e1.u, e1.v FROM e1 JOIN n2 a ON a.u = e1.u JOIN n2 b ON b.u = e1.v),
         |b2 AS (SELECT u FROM e2 UNION ALL SELECT v FROM e2),
         |d3 AS (SELECT u, count(*) AS c FROM b2 GROUP BY 1),
         |n3 AS (SELECT u FROM d3 WHERE c >= 2),
         |e3 AS (SELECT e2.u, e2.v FROM e2 JOIN n3 a ON a.u = e2.u JOIN n3 b ON b.u = e2.v)
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS round,
         |         (SELECT CAST(count(*) AS BIGINT) FROM d1) AS nodes,
         |         (SELECT CAST(count(*) AS BIGINT) FROM e0) AS edges
         |  UNION ALL SELECT 1, (SELECT count(*) FROM n1), (SELECT count(*) FROM e1)
         |  UNION ALL SELECT 2, (SELECT count(*) FROM n2), (SELECT count(*) FROM e2)
         |  UNION ALL SELECT 3, (SELECT count(*) FROM n3), (SELECT count(*) FROM e3)
         |) ORDER BY round""".stripMargin,

    "q243_dataset_card" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(n_chars) * 1000000 // count(*) AS BIGINT) AS mean_chars_ppm,
        |  CAST((count(*) - count(DISTINCT md5(text))) * 1000000 // count(*) AS BIGINT) AS dup_ppm,
        |  CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
        |    AS long_ppm
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q244_removal_effect" -> removalEffectSql,

    "q245_revenue_autocorr" ->
      """WITH d AS (
        |  SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT day, rev, lag(rev) OVER (ORDER BY day) AS prev FROM d
        |), p AS (SELECT rev, prev FROM l WHERE prev IS NOT NULL),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(rev) AS HUGEINT) AS sx, CAST(sum(prev) AS HUGEINT) AS sy,
        |         CAST(sum(CAST(rev AS HUGEINT) * prev) AS HUGEINT) AS sxy,
        |         CAST(sum(CAST(rev AS HUGEINT) * rev) AS HUGEINT) AS sxx,
        |         CAST(sum(CAST(prev AS HUGEINT) * prev) AS HUGEINT) AS syy
        |  FROM p
        |)
        |SELECT n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    AS acf1
        |FROM m""".stripMargin,

    "q246_simpsons_flip" ->
      """WITH b AS (
        |  SELECT p_brand, CAST(count(*) AS HUGEINT) n,
        |         CAST(sum(CAST(p_size AS BIGINT)) AS HUGEINT) sx,
        |         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS HUGEINT) sy,
        |         CAST(sum(CAST(p_size AS HUGEINT) * CAST(round(p_retailprice * 100) AS BIGINT))
        |              AS HUGEINT) sxy
        |  FROM part GROUP BY 1
        |), g AS (
        |  SELECT p_brand, CASE WHEN n * sxy - sx * sy > 0 THEN 1
        |                       WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS sgn
        |  FROM b
        |), o AS (
        |  SELECT CASE WHEN n * sxy - sx * sy > 0 THEN 1
        |              WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS osgn
        |  FROM (SELECT CAST(count(*) AS HUGEINT) n,
        |               CAST(sum(CAST(p_size AS BIGINT)) AS HUGEINT) sx,
        |               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS HUGEINT) sy,
        |               CAST(sum(CAST(p_size AS HUGEINT)
        |                        * CAST(round(p_retailprice * 100) AS BIGINT)) AS HUGEINT) sxy
        |        FROM part)
        |)
        |SELECT CAST(o.osgn AS BIGINT) AS overall_sign,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN g.sgn = o.osgn THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        |  CAST(sum(CASE WHEN g.sgn = -o.osgn THEN 1 ELSE 0 END) AS BIGINT) AS n_flipped
        |FROM g CROSS JOIN o GROUP BY 1""".stripMargin,

    "q247_order_journey" ->
      """WITH j AS (
        |  SELECT o_custkey,
        |    first_value(o_orderdate) OVER w AS first_dt,
        |    last_value(o_orderdate) OVER w AS last_dt,
        |    nth_value(CAST(round(o_totalprice * 100) AS BIGINT), 2) OVER w AS second_total_c,
        |    count(*) OVER (PARTITION BY o_custkey) AS n_orders,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT o_custkey AS custkey,
        |       CAST(date_diff('day', first_dt, last_dt) AS BIGINT) AS span_days,
        |       coalesce(second_total_c, 0) AS second_total_c,
        |       CAST(n_orders AS BIGINT) AS n_orders
        |FROM j WHERE rn = 1 ORDER BY custkey LIMIT 50""".stripMargin,

    "q248_weighted_pagerank" -> weightedPagerankSql,

    "q249_mutual_information" ->
      """WITH j AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |           FROM documents GROUP BY 1, 2),
        |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM j GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM j GROUP BY 1),
        |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
        |terms AS (
        |  SELECT nt.n, CAST(round((CAST(j.c AS DOUBLE) / nt.n)
        |        * ln((CAST(j.c AS DOUBLE) * nt.n) / (CAST(nl.cl AS DOUBLE) * ns.cs))
        |        * 1000000000) AS BIGINT) AS t9
        |  FROM j JOIN nl ON nl.lang = j.lang JOIN ns ON ns.source = j.source CROSS JOIN nt
        |)
        |SELECT CAST(max(n) AS BIGINT) AS n_docs,
        |       CAST(sum(t9) AS BIGINT) AS mi_nano,
        |       round(CAST(sum(t9) AS DOUBLE) / 1000000000, 6) AS mi_nats
        |FROM terms""".stripMargin,

    "q250_item_similarity" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |            FROM lineitem JOIN part ON p_partkey = l_partkey),
        |ni AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY 1),
        |pr AS (SELECT a.b AS ba, c.b AS bb, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b GROUP BY 1, 2)
        |SELECT pr.ba, pr.bb, pr.n_ab,
        |       round(CAST(pr.n_ab AS DOUBLE)
        |             / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)), 6) AS cosine
        |FROM pr JOIN ni na ON na.b = pr.ba JOIN ni nb ON nb.b = pr.bb
        |ORDER BY cosine DESC, ba, bb LIMIT 25""".stripMargin,

    "q251_ipw_reweight" ->
      """WITH d AS (
        |  SELECT lang,
        |         CAST(concat('0x', substr(md5(concat('ipw#', CAST(doc_id AS VARCHAR))), 1, 12))
        |              AS BIGINT) AS u
        |  FROM documents
        |), s AS (
        |  SELECT lang, count(*) AS n_samp FROM d
        |  WHERE lang = 'en' OR u * 4 < 281474976710656 GROUP BY 1
        |), f AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_full FROM documents GROUP BY 1)
        |SELECT f.lang, f.n_full, CAST(coalesce(s.n_samp, 0) AS BIGINT) AS n_sample,
        |  CAST(coalesce(s.n_samp, 0) * (CASE WHEN f.lang = 'en' THEN 1 ELSE 4 END) AS BIGINT)
        |    AS ipw_est,
        |  CAST((coalesce(s.n_samp, 0) * (CASE WHEN f.lang = 'en' THEN 1 ELSE 4 END) - f.n_full)
        |       * 1000000 // f.n_full AS BIGINT) AS err_ppm
        |FROM f LEFT JOIN s ON s.lang = f.lang ORDER BY f.lang""".stripMargin,

    "q252_top_brands_agg" ->
      """WITH rev AS (
        |  SELECT n.n_name AS nation, p.p_brand AS brand,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |       JOIN customer c ON c.c_custkey = o.o_custkey
        |       JOIN nation n ON n.n_nationkey = c.c_nationkey
        |       JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY nation ORDER BY rev DESC, brand) AS rn
        |  FROM rev
        |)
        |SELECT nation,
        |  max(CASE WHEN rn = 1 THEN brand END) AS top1,
        |  max(CASE WHEN rn = 2 THEN brand END) AS top2,
        |  max(CASE WHEN rn = 3 THEN brand END) AS top3,
        |  CAST(sum(CASE WHEN rn <= 3 THEN rev ELSE 0 END) AS BIGINT) AS top3_rev_c
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q253_session_handoff" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
        |), n AS (
        |  SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1
        |                 WHEN lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), sx AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                              ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM n
        |), ses AS (
        |  SELECT user_id, sess,
        |    min(struct_pack(us := us, eid := event_id, et := event_type)) AS fst,
        |    max(struct_pack(us := us, eid := event_id, et := event_type)) AS lst
        |  FROM sx GROUP BY 1, 2
        |), h AS (
        |  SELECT user_id, sess, fst.et AS first_et, lst.et AS last_et,
        |         lag(lst.et) OVER (PARTITION BY user_id ORDER BY sess) AS prev_last
        |  FROM ses
        |)
        |SELECT prev_last AS from_type, first_et AS to_type, CAST(count(*) AS BIGINT) AS n
        |FROM h WHERE prev_last IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q254_kendall_tau" ->
      """WITH p AS (SELECT p_partkey k, p_brand, CAST(p_size AS BIGINT) x,
        |                  CAST(round(p_retailprice * 100) AS BIGINT) y FROM part),
        |pairs AS (
        |  SELECT a.p_brand,
        |    CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END AS con,
        |    CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END AS dis,
        |    CASE WHEN b.x = a.x THEN 1 ELSE 0 END AS tx,
        |    CASE WHEN b.y = a.y THEN 1 ELSE 0 END AS ty
        |  FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.k < b.k
        |)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(con) AS BIGINT) AS concordant, CAST(sum(dis) AS BIGINT) AS discordant,
        |  round((CAST(sum(con) AS DOUBLE) - sum(dis)) /
        |        sqrt((CAST(count(*) AS DOUBLE) - sum(tx)) * (CAST(count(*) AS DOUBLE) - sum(ty))), 6)
        |    AS tau_b
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q255_rare_coalesce" ->
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
        |m AS (SELECT c.source, CASE WHEN c.n * 100 >= t.tot * 15 THEN c.lang ELSE 'other' END
        |        AS lang2, c.n
        |      FROM c JOIN t ON t.source = c.source)
        |SELECT source, lang2 AS lang, CAST(sum(n) AS BIGINT) AS n
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q256_ess_weights" ->
      """WITH d AS (
        |  SELECT lang,
        |         CAST(concat('0x', substr(md5(concat('ipw#', CAST(doc_id AS VARCHAR))), 1, 12))
        |              AS BIGINT) AS u
        |  FROM documents
        |), s AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 4 END AS w FROM d
        |  WHERE lang = 'en' OR u * 4 < 281474976710656
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_sample,
        |  CAST(sum(w) AS BIGINT) AS sum_w,
        |  CAST(sum(w) * sum(w) * 1000 // sum(w * w) AS BIGINT) AS ess_milli,
        |  CAST(count(*) * sum(w * w) * 1000000 // (sum(w) * sum(w)) AS BIGINT) AS deff_ppm
        |FROM s""".stripMargin,
  )
}
