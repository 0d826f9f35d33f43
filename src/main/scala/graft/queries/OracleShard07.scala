package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard07 {
  val defs: Map[String, String] = Map(

    "q385_neyman_allocation" ->
      """WITH st AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS nh,
        |         CAST(sum(n_chars) AS BIGINT) AS sx,
        |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1
        |), v AS (
        |  SELECT lang, nh,
        |         CAST(floor(sqrt(CAST((nh * sxx - sx * sx) // (nh * nh) AS DOUBLE)))
        |              AS BIGINT) AS sh
        |  FROM st
        |), t AS (SELECT CAST(sum(nh * sh) AS BIGINT) AS tw FROM v),
        |b AS (SELECT lang, nh, sh, nh * sh * 1000 // t.tw AS alloc_floor,
        |             nh * sh * 1000 % t.tw AS rem FROM v, t),
        |sf AS (SELECT CAST(sum(alloc_floor) AS BIGINT) AS sf FROM b),
        |r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, lang) AS rrk FROM b)
        |SELECT lang, nh, sh,
        |       CAST(alloc_floor + CASE WHEN rrk <= 1000 - sf.sf THEN 1 ELSE 0 END AS BIGINT)
        |         AS alloc
        |FROM r, sf ORDER BY lang""".stripMargin,

    "q386_fulfillment_latency" ->
      """WITH l AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
        |              AS BIGINT) AS lag_d
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |)
        |SELECT priority, CAST(count(*) AS BIGINT) AS n,
        |       round(quantile_cont(CAST(lag_d AS DOUBLE), 0.5), 6) AS p50_days,
        |       round(quantile_cont(CAST(lag_d AS DOUBLE), 0.9), 6) AS p90_days,
        |       CAST(sum(CASE WHEN lag_d <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_7d,
        |       CAST(sum(CASE WHEN lag_d <= 7 THEN 1 ELSE 0 END) * 1000000 // count(*)
        |            AS BIGINT) AS sla7_ppm
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    "q387_linear_interpolation" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |           AS ed,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1
        |), bn AS (SELECT min(ed) AS lo, max(ed) AS hi FROM daily),
        |sp AS (SELECT unnest(range(bn.lo, bn.hi + 1)) AS ed FROM bn),
        |j AS (SELECT sp.ed, d.v FROM sp LEFT JOIN daily d USING (ed)),
        |w AS (
        |  SELECT ed, v,
        |         last_value(v IGNORE NULLS) OVER wp AS pv,
        |         last_value(CASE WHEN v IS NOT NULL THEN ed END IGNORE NULLS) OVER wp AS pe,
        |         first_value(v IGNORE NULLS) OVER wn AS nv,
        |         first_value(CASE WHEN v IS NOT NULL THEN ed END IGNORE NULLS) OVER wn AS ne
        |  FROM j
        |  WINDOW wp AS (ORDER BY ed ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (ORDER BY ed ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |), f AS (
        |  SELECT CASE WHEN v IS NOT NULL THEN 'observed' ELSE 'interpolated' END AS kind,
        |         CASE WHEN v IS NOT NULL THEN v
        |              WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
        |              ELSE pv + (nv - pv) * (ed - pe) // (ne - pe) END AS fill
        |  FROM w
        |)
        |SELECT kind, CAST(count(*) AS BIGINT) AS n_days, CAST(sum(fill) AS BIGINT) AS sum_cents
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q388_array_setops" ->
      """WITH s AS (
        |  SELECT source, list_sort(list(DISTINCT lang)) AS langs
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1
        |)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(len(list_distinct(list_concat(a.langs, b.langs))) AS BIGINT) AS n_union,
        |       CAST(len(list_filter(a.langs, x -> list_contains(b.langs, x))) AS BIGINT)
        |         AS n_intersect,
        |       CAST(len(list_filter(a.langs, x -> NOT list_contains(b.langs, x))) AS BIGINT)
        |         AS n_only_a
        |FROM s a JOIN s b ON a.source < b.source
        |ORDER BY src_a, src_b""".stripMargin,

    "q389_parse_reconcile" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment, c_custkey,
        |         regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS parsed
        |  FROM customer
        |), f AS (
        |  SELECT segment,
        |         CASE WHEN length(parsed) > 0 THEN 1 ELSE 0 END AS ok_parse,
        |         CASE WHEN length(parsed) > 0 AND CAST(parsed AS BIGINT) = c_custkey
        |              THEN 1 ELSE 0 END AS ok_match
        |  FROM c
        |)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(ok_parse) AS BIGINT) AS n_parsed,
        |       CAST(sum(ok_match) AS BIGINT) AS n_matched,
        |       CAST(sum(ok_match) * 1000000 // count(*) AS BIGINT) AS match_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q390_bounce_rate" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), x AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), g AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x
        |), se AS (
        |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events FROM g GROUP BY 1, 2
        |), fe AS (
        |  SELECT user_id, sid, event_type AS entry_type FROM (
        |    SELECT user_id, sid, event_type,
        |           row_number() OVER (PARTITION BY user_id, sid
        |             ORDER BY us, event_id, event_type) AS rn
        |    FROM g) WHERE rn = 1
        |)
        |SELECT fe.entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
        |       CAST(sum(CASE WHEN se.n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
        |       CAST(sum(CASE WHEN se.n_events = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
        |            AS BIGINT) AS bounce_ppm
        |FROM se JOIN fe USING (user_id, sid)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q391_subquery_predicates" ->
      """SELECT o_orderpriority AS priority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CASE WHEN EXISTS (
        |             SELECT 1 FROM lineitem
        |             WHERE l_orderkey = o_orderkey
        |               AND date_diff('day', CAST(o_orderdate AS DATE),
        |                             CAST(l_shipdate AS DATE)) > 90)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_slow_shipped,
        |       CAST(sum(CASE WHEN NOT EXISTS (
        |             SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
        |       CAST(sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) >
        |             (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
        |                     // count(*) FROM orders)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q392_histogram_2d" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
        |         CAST(round(l_quantity, 0) AS BIGINT) AS q
        |  FROM lineitem
        |), mm AS (SELECT min(p) AS plo, max(p) AS phi, min(q) AS qlo, max(q) AS qhi FROM v),
        |g AS (
        |  SELECT (p - plo) * 8 // (phi - plo + 1) AS price_bin,
        |         (q - qlo) * 8 // (qhi - qlo + 1) AS qty_bin,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM v, mm GROUP BY 1, 2
        |)
        |SELECT price_bin, qty_bin, n,
        |       CAST(sum(n) OVER (PARTITION BY price_bin) AS BIGINT) AS row_total,
        |       CAST(sum(n) OVER (PARTITION BY qty_bin) AS BIGINT) AS col_total
        |FROM g ORDER BY price_bin, qty_bin""".stripMargin,

    "q393_dedup_savings" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLosersChain,
         |d AS (SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS nb
         |      FROM documents WHERE text IS NOT NULL)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN l.doc_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_removable,
         |       CAST(sum(nb) AS BIGINT) AS bytes_total,
         |       CAST(sum(CASE WHEN l.doc_b IS NOT NULL THEN nb ELSE 0 END) AS BIGINT)
         |         AS bytes_removable,
         |       CAST(sum(CASE WHEN l.doc_b IS NOT NULL THEN nb ELSE 0 END) * 1000000
         |            // sum(nb) AS BIGINT) AS save_ppm
         |FROM d LEFT JOIN losers l ON d.doc_id = l.doc_b
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q394_two_hop_reach" ->
      s"""WITH ${minhashChain("documents")},
         |und AS (SELECT doc_a AS u, doc_b AS v FROM cand
         |        UNION SELECT doc_b, doc_a FROM cand),
         |th AS (SELECT u, v FROM und
         |       UNION SELECT x.u, y.v FROM und x JOIN und y ON x.v = y.u),
         |t2 AS (SELECT DISTINCT u, v FROM th WHERE u <> v),
         |r AS (SELECT u, CAST(count(*) AS BIGINT) AS reach2 FROM t2 GROUP BY 1)
         |SELECT reach2, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q395_top_movers" ->
      """WITH bm AS (
        |  SELECT p_brand, year(l_shipdate) * 12 + month(l_shipdate) - 1 AS mi,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY 1, 2
        |), d AS (
        |  SELECT p_brand, mi, rev_c,
        |         lag(rev_c) OVER w AS prev, lag(mi) OVER w AS prev_mi
        |  FROM bm WINDOW w AS (PARTITION BY p_brand ORDER BY mi)
        |), dd AS (
        |  SELECT p_brand, CAST(mi AS BIGINT) AS mi, rev_c,
        |         CAST(rev_c - prev AS BIGINT) AS delta_c
        |  FROM d WHERE prev IS NOT NULL AND prev_mi = mi - 1
        |), u AS (
        |  SELECT 'riser' AS direction, * FROM
        |    (SELECT * FROM dd ORDER BY delta_c DESC, p_brand, mi LIMIT 5)
        |  UNION ALL
        |  SELECT 'faller', * FROM
        |    (SELECT * FROM dd ORDER BY delta_c ASC, p_brand, mi LIMIT 5)
        |)
        |SELECT direction, p_brand, mi, rev_c, delta_c
        |FROM u ORDER BY direction, delta_c, p_brand, mi""".stripMargin,

    "q396_time_to_error" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), x AS (
        |  SELECT event_type,
        |         min(CASE WHEN event_type = 'error' THEN us END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) - us
        |           AS lead_us
        |  FROM e
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(lead_us) AS BIGINT) AS n_followed_by_error,
        |       round(quantile_cont(CAST(lead_us AS DOUBLE), 0.5) / 1000000, 6)
        |         AS median_lead_s,
        |       CAST(count(lead_us) * 1000000 // count(*) AS BIGINT) AS followed_ppm
        |FROM x WHERE event_type <> 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q397_manifest_pruning" ->
      """WITH f AS (
        |  SELECT o_orderkey // 4096 AS blk,
        |         (year(o_orderdate) * 12 + month(o_orderdate)) % 4 AS man,
        |         min(CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |                  AS BIGINT)) AS fmn,
        |         max(CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |                  AS BIGINT)) AS fmx,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2
        |), m AS (
        |  SELECT man, min(fmn) AS mmn, max(fmx) AS mmx FROM f GROUP BY 1
        |), mh AS (
        |  SELECT man, CASE WHEN mmn < 9952 AND mmx >= 9862 THEN 1 ELSE 0 END AS manifest_hit
        |  FROM m
        |), fh AS (
        |  SELECT f.man, f.c, mh.manifest_hit,
        |         CASE WHEN mh.manifest_hit = 1 AND f.fmn < 9952 AND f.fmx >= 9862
        |              THEN 1 ELSE 0 END AS file_hit
        |  FROM f JOIN mh USING (man)
        |)
        |SELECT CAST(count(DISTINCT man) AS BIGINT) AS n_manifests,
        |       CAST(sum(manifest_hit) AS BIGINT) AS file_checks,
        |       CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(file_hit) AS BIGINT) AS files_scanned,
        |       CAST(sum(CASE WHEN file_hit = 1 THEN c ELSE 0 END) AS BIGINT) AS rows_scanned,
        |       CAST((count(*) - sum(file_hit)) * 1000000 // count(*) AS BIGINT)
        |         AS files_skipped_ppm
        |FROM fh""".stripMargin,

    "q398_effect_size" ->
      """WITH g AS (
        |  SELECT c_mktsegment,
        |         CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
        |              AS HUGEINT) AS s,
        |         CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
        |              * CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS ss
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        |  GROUP BY 1
        |), p AS (
        |  SELECT max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN n END) AS n1,
        |         max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN s END) AS s1,
        |         max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN ss END) AS ss1,
        |         max(CASE WHEN c_mktsegment = 'BUILDING' THEN n END) AS n2,
        |         max(CASE WHEN c_mktsegment = 'BUILDING' THEN s END) AS s2,
        |         max(CASE WHEN c_mktsegment = 'BUILDING' THEN ss END) AS ss2
        |  FROM g
        |)
        |SELECT CAST(n1 AS BIGINT) AS n_auto, CAST(n2 AS BIGINT) AS n_build,
        |       CAST(s1 // n1 AS BIGINT) AS mean_auto_c,
        |       CAST(s2 // n2 AS BIGINT) AS mean_build_c,
        |       round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |              - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |             / sqrt(((CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |               + (CAST(n2 * ss2 - s2 * s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |               / CAST(n1 + n2 - 2 AS DOUBLE)), 6) AS cohens_d
        |FROM p""".stripMargin,

    "q399_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS total_cents
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,

    "q400_source_scorecard" ->
      s"""WITH $qualityCte,
         |q AS (
         |  SELECT qs.doc_id, d.source, qs.text, qs.quality
         |  FROM qs JOIN documents d ON qs.doc_id = d.doc_id
         |  WHERE qs.text IS NOT NULL
         |), tx AS (
         |  SELECT text, CAST(count(DISTINCT source) AS BIGINT) AS ns FROM q GROUP BY 1
         |), a AS (
         |  SELECT q.source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT q.text) AS BIGINT) AS uniq_texts,
         |         CAST(sum(CASE WHEN tx.ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS xsource_docs,
         |         CAST(sum(CASE WHEN q.quality >= 0.45 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS quality_pass,
         |         CAST(sum(CAST(round(q.quality * 1000) AS BIGINT)) AS BIGINT) AS qsum_milli
         |  FROM q JOIN tx ON q.text = tx.text GROUP BY 1
         |)
         |SELECT source, n_docs, uniq_texts,
         |       CAST((n_docs - uniq_texts) * 1000000 // n_docs AS BIGINT) AS dup_ppm,
         |       CAST(xsource_docs * 1000000 // n_docs AS BIGINT) AS xsource_ppm,
         |       CAST(quality_pass * 1000000 // n_docs AS BIGINT) AS quality_pass_ppm,
         |       CAST(qsum_milli // n_docs AS BIGINT) AS mean_quality_milli
         |FROM a ORDER BY source""".stripMargin,

    "q401_null_safe_join" ->
      """WITH g AS (SELECT text, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1)
        |SELECT CAST(sum(CASE WHEN text IS NOT NULL THEN c * (c - 1) // 2 ELSE 0 END)
        |            AS BIGINT) AS standard_pairs,
        |       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS nullsafe_pairs,
        |       CAST(sum(CASE WHEN text IS NULL THEN c ELSE 0 END) AS BIGINT) AS null_docs,
        |       CAST(sum(c * (c - 1) // 2)
        |            - sum(CASE WHEN text IS NOT NULL THEN c * (c - 1) // 2 ELSE 0 END)
        |            AS BIGINT) AS pairs_missed_by_eq
        |FROM g""".stripMargin,

    "q402_log2_histogram" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders)
        |SELECT CAST(length(bin(v)) - 1 AS BIGINT) AS log2_bin,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(v) AS BIGINT) AS min_cents, CAST(max(v) AS BIGINT) AS max_cents
        |FROM v WHERE v > 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q403_expanding_slope" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |           AS ed,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1
        |), d0 AS (SELECT min(ed) AS d0 FROM daily),
        |h AS (SELECT CAST(unnest([90, 180, 365, 100000]) AS BIGINT) AS horizon_days),
        |x AS (SELECT h.horizon_days, CAST(daily.ed - d0.d0 AS HUGEINT) AS x,
        |             CAST(daily.v AS HUGEINT) AS y
        |      FROM daily, d0, h WHERE daily.ed - d0.d0 < h.horizon_days),
        |a AS (
        |  SELECT horizon_days, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM x GROUP BY 1
        |)
        |SELECT horizon_days, CAST(n AS BIGINT) AS n_days,
        |       CAST((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS BIGINT)
        |         AS slope_milli_cents_per_day
        |FROM a ORDER BY horizon_days""".stripMargin,

    "q404_schema_evolution" ->
      """WITH u AS (
        |  SELECT o_orderkey, CAST(NULL AS VARCHAR) AS priority,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents, 'v1' AS gen
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority,
        |         CAST(round(o_totalprice * 100) AS BIGINT), 'v2'
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |)
        |SELECT gen, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN priority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS null_priority,
        |       CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q405_bowley_skewness" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |ks AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS i),
        |kk AS (SELECT i, (i * n.n) // 4 AS k FROM ks, n),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
        |b AS (SELECT kk.i, r.v FROM kk JOIN r ON r.rk = kk.k),
        |q AS (SELECT max(CASE WHEN i = 1 THEN v END) AS q1,
        |             max(CASE WHEN i = 2 THEN v END) AS q2,
        |             max(CASE WHEN i = 3 THEN v END) AS q3
        |      FROM b)
        |SELECT CAST(q1 AS BIGINT) AS q1_cents, CAST(q2 AS BIGINT) AS q2_cents,
        |       CAST(q3 AS BIGINT) AS q3_cents,
        |       CAST((q3 + q1 - 2 * q2) * 1000000 // (q3 - q1) AS BIGINT) AS bowley_ppm
        |FROM q""".stripMargin,

    "q406_ri_audit" ->
      """WITH e1 AS (
        |  SELECT 'lineitem_orders' AS fk_edge,
        |         CAST(count(*) AS BIGINT) AS n_refs,
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_orphans
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL
        |), e2 AS (
        |  SELECT 'lineitem_part', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
        |    ON l.l_partkey = p.p_partkey
        |  WHERE l.l_partkey IS NOT NULL
        |), e3 AS (
        |  SELECT 'lineitem_supplier', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
        |    ON l.l_suppkey = s.s_suppkey
        |  WHERE l.l_suppkey IS NOT NULL
        |), e4 AS (
        |  SELECT 'orders_customer', CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey
        |  WHERE o.o_custkey IS NOT NULL
        |), u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |         UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)
        |SELECT fk_edge, n_refs, n_orphans,
        |       CAST(n_orphans * 1000000 // n_refs AS BIGINT) AS orphan_ppm
        |FROM u ORDER BY fk_edge""".stripMargin,

    "q407_rolling_corridor" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |           AS ed,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1
        |), w AS (
        |  SELECT ed, v, count(*) OVER win AS n7,
        |         max(v) OVER win AS hi, min(v) OVER win AS lo
        |  FROM daily
        |  WINDOW win AS (ORDER BY ed ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |), f AS (SELECT * FROM w WHERE n7 = 7)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS breakouts_up,
        |       CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS breakouts_down,
        |       CAST(sum(hi - lo) AS BIGINT) AS corridor_width_sum_c,
        |       CAST(sum(hi - lo) // count(*) AS BIGINT) AS mean_width_c
        |FROM f""".stripMargin,

    "q408_variant_explode" ->
      """WITH j AS (SELECT l_orderkey, CAST(round(l_quantity, 0) AS BIGINT) AS q FROM lineitem),
        |pc AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1)
        |SELECT CAST((SELECT count(*) FROM j) AS BIGINT) AS n_values,
        |       CAST((SELECT count(*) FROM pc) AS BIGINT) AS n_orders,
        |       CAST((SELECT sum(q) FROM j) AS BIGINT) AS total_qty,
        |       CAST((SELECT max(c) FROM pc) AS BIGINT) AS max_lines_per_order""".stripMargin,

    "q409_crosstab_api" ->
      """SELECT o_orderpriority AS priority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS status_F,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS status_O,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS status_P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q410_systematic_sample" ->
      """WITH r AS (
        |  SELECT lang,
        |         row_number() OVER (ORDER BY
        |           CAST(concat('0x', substr(md5('sys#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |                AS BIGINT), doc_id) AS rk
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN rk % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |       CAST(sum(CASE WHEN rk % 20 = 0 THEN 1 ELSE 0 END) * 1000000 // count(*)
        |            AS BIGINT) AS rate_ppm
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q411_tfidf_cosine" ->
      """WITH s AS (
        |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents
        |    WHERE text IS NOT NULL
        |      AND CAST(concat('0x', substr(md5('tc#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |               AS BIGINT) % 25 = 0)
        |  WHERE length(w) > 0 GROUP BY 1, 2
        |), df_ AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM s GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM s),
        |wt AS (
        |  SELECT s.doc_id, s.w,
        |         s.tf * CAST(round(ln(CAST(nd.n AS DOUBLE) / df_.df) * 1000) AS BIGINT)
        |           AS wgt
        |  FROM s JOIN df_ USING (w), nd
        |), nrm AS (
        |  SELECT doc_id, nrm FROM (
        |    SELECT doc_id, n2, t,
        |           CASE WHEN (t + 1) * (t + 1) <= n2 THEN t + 1
        |                WHEN t * t > n2 THEN t - 1 ELSE t END AS nrm
        |    FROM (SELECT doc_id, CAST(sum(wgt * wgt) AS BIGINT) AS n2,
        |                 CAST(floor(sqrt(CAST(sum(wgt * wgt) AS DOUBLE))) AS BIGINT) AS t
        |          FROM wt GROUP BY 1))
        |  WHERE nrm > 0
        |), d AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(sum(a.wgt * b.wgt) AS BIGINT) AS dot
        |  FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT d.da, d.db, CAST(d.dot * 1000000 // (x.nrm * y.nrm) AS BIGINT) AS cos_u
        |FROM d JOIN nrm x ON d.da = x.doc_id JOIN nrm y ON d.db = y.doc_id
        |ORDER BY cos_u DESC, da, db LIMIT 10""".stripMargin,

    "q412_topk_concentration" ->
      """WITH cy AS (
        |  SELECT year(o_orderdate) AS yr, o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1, 2
        |), r AS (
        |  SELECT yr, rev_c,
        |         row_number() OVER (PARTITION BY yr ORDER BY rev_c DESC, o_custkey) AS rk
        |  FROM cy
        |)
        |SELECT CAST(yr AS BIGINT) AS yr, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(rev_c) AS BIGINT) AS total_c,
        |       CAST(sum(CASE WHEN rk <= 20 THEN rev_c ELSE 0 END) AS BIGINT) AS top20_c,
        |       CAST(sum(CASE WHEN rk <= 20 THEN rev_c ELSE 0 END) * 1000000 // sum(rev_c)
        |            AS BIGINT) AS cr20_ppm
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q413_regularity" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(date_trunc('microseconds', ts)) // 86400000000 AS day
        |  FROM events
        |), u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS active_days,
        |         CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days
        |  FROM ud GROUP BY 1
        |)
        |SELECT least(active_days * 10 // span_days, 10) AS reg_decile,
        |       CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(active_days) AS BIGINT) AS total_active_days
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q414_brand_loyalty" ->
      """WITH cb AS (
        |  SELECT o_custkey, p_brand, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), a AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_buyers,
        |         CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat
        |  FROM cb GROUP BY 1
        |)
        |SELECT p_brand, n_buyers, n_repeat,
        |       CAST(n_repeat * 1000000 // n_buyers AS BIGINT) AS loyalty_ppm
        |FROM a ORDER BY loyalty_ppm DESC, p_brand LIMIT 10""".stripMargin,

    "q415_srm_check" ->
      """WITH u AS (
        |  SELECT DISTINCT
        |         CAST(concat('0x', substr(md5('cuped#' || CAST(o_custkey AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 2 AS arm,
        |         o_custkey
        |  FROM orders
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_units,
        |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat
        |  FROM u
        |)
        |SELECT n_units, n_treat, CAST(n_units - n_treat AS BIGINT) AS n_ctrl,
        |       CAST((2 * n_treat - n_units) * (2 * n_treat - n_units) * 1000000 // n_units
        |            AS BIGINT) AS chi2_micro,
        |       (2 * n_treat - n_units) * (2 * n_treat - n_units) * 1000000 // n_units
        |         > 3841459 AS srm_suspect
        |FROM a""".stripMargin,

    "q416_quartile_migration" ->
      """WITH y96 AS (
        |  SELECT o_custkey,
        |         CAST(ntile(4) OVER (ORDER BY sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |              DESC, o_custkey) AS BIGINT) AS q_1996
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
        |), y97 AS (
        |  SELECT o_custkey,
        |         CAST(ntile(4) OVER (ORDER BY sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |              DESC, o_custkey) AS BIGINT) AS q_1997
        |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
        |)
        |SELECT q_1996, q_1997, CAST(count(*) AS BIGINT) AS n_customers
        |FROM y96 JOIN y97 USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q417_term_trend_slopes" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |mx AS (SELECT max(doc_id) + 1 AS mxd FROM d),
        |w AS (
        |  SELECT d.doc_id * 12 // mx.mxd AS b, unnest(string_split(d.text, ' ')) AS w
        |  FROM d, mx
        |), ww AS (SELECT b, w FROM w WHERE length(w) > 0),
        |top AS (SELECT w FROM (SELECT w, count(*) AS c FROM ww GROUP BY 1
        |        ORDER BY c DESC, w LIMIT 5)),
        |grid AS (
        |  SELECT g.b, g.w, CAST(g.cw * 1000000 // t.ct AS BIGINT) AS share_ppm
        |  FROM (SELECT b, w, CAST(count(*) AS BIGINT) AS cw FROM ww GROUP BY 1, 2) g
        |  JOIN (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM ww GROUP BY 1) t USING (b)
        |  JOIN top USING (w)
        |), a AS (
        |  SELECT w, CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(CAST(b AS HUGEINT)) AS HUGEINT) AS sx,
        |         CAST(sum(CAST(share_ppm AS HUGEINT)) AS HUGEINT) AS sy,
        |         CAST(sum(CAST(b AS HUGEINT) * share_ppm) AS HUGEINT) AS sxy,
        |         CAST(sum(CAST(b AS HUGEINT) * b) AS HUGEINT) AS sxx
        |  FROM grid GROUP BY 1
        |)
        |SELECT w AS term, CAST(n AS BIGINT) AS n_buckets,
        |       CAST((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS BIGINT)
        |         AS slope_milli_ppm_per_bucket
        |FROM a ORDER BY term""".stripMargin,

    "q418_purchase_sequences" ->
      """WITH ob AS (
        |  SELECT DISTINCT o_custkey, o_orderkey, o_orderdate, p_brand
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |), so AS (
        |  SELECT o_custkey, o_orderkey,
        |         lead(o_orderkey) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS next_ok
        |  FROM (SELECT DISTINCT o_custkey, o_orderkey, o_orderdate FROM ob)
        |), sq AS (SELECT o_orderkey, next_ok FROM so WHERE next_ok IS NOT NULL)
        |SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |       CAST(count(*) AS BIGINT) AS n_seq
        |FROM sq JOIN ob a ON sq.o_orderkey = a.o_orderkey
        |JOIN ob b ON sq.next_ok = b.o_orderkey
        |GROUP BY 1, 2 ORDER BY n_seq DESC, brand_a, brand_b LIMIT 10""".stripMargin,

    "q419_jackknife_ratio" ->
      """WITH cu AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), cs AS (
        |  SELECT c_mktsegment AS segment, x, y
        |  FROM cu JOIN customer ON c_custkey = o_custkey
        |), t AS (
        |  SELECT segment, CAST(sum(x) AS BIGINT) AS sx2,
        |         CAST(sum(y) AS BIGINT) AS sy2
        |  FROM cs GROUP BY 1
        |), r AS (
        |  SELECT cs.segment, sx2, sy2, (sx2 - x) // (sy2 - y) AS r
        |  FROM cs JOIN t USING (segment) WHERE sy2 > y
        |)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(sx2 * 1000 // sy2 AS BIGINT) AS ratio_milli,
        |       CAST((count(*) - 1)
        |            * (count(*) * sum(CAST(r AS HUGEINT) * r)
        |               - sum(CAST(r AS HUGEINT)) * sum(CAST(r AS HUGEINT)))
        |            // (CAST(count(*) AS HUGEINT) * count(*) * count(*))
        |            AS BIGINT) AS jk_var_cents2
        |FROM r GROUP BY segment, sx2, sy2 ORDER BY segment""".stripMargin,

    "q420_cohens_kappa" ->
      """WITH lab AS (
        |  SELECT lang,
        |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
        |         CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END AS b
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT lang, CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(a * b) AS HUGEINT) AS n11,
        |         CAST(sum((1 - a) * (1 - b)) AS HUGEINT) AS n00,
        |         CAST(sum(a) AS HUGEINT) AS ra, CAST(sum(b) AS HUGEINT) AS rb
        |  FROM lab GROUP BY 1
        |)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs,
        |       CAST(n11 AS BIGINT) AS n_both_pos, CAST(n00 AS BIGINT) AS n_both_neg,
        |       CAST(CASE WHEN n * n = ra * rb + (n - ra) * (n - rb) THEN 0
        |                 ELSE (n * (n11 + n00) - (ra * rb + (n - ra) * (n - rb))) * 1000000
        |                      // (n * n - (ra * rb + (n - ra) * (n - rb))) END
        |            AS BIGINT) AS kappa_ppm
        |FROM c ORDER BY lang""".stripMargin,

    "q421_t_closeness" ->
      """WITH o AS (SELECT o_orderpriority AS qi,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |mm AS (SELECT min(cents) AS gmin, max(cents) AS gmax FROM o),
        |bd AS (SELECT qi, (cents - gmin) * 10 // (gmax - gmin + 1) AS band FROM o, mm),
        |bands AS (SELECT unnest(range(0, 10)) AS band),
        |gc AS (SELECT band, CAST(coalesce(c, 0) AS BIGINT) AS cg
        |       FROM bands LEFT JOIN (SELECT band, count(*) AS c FROM bd GROUP BY 1)
        |       USING (band)),
        |grid AS (
        |  SELECT q.qi, b.band, CAST(coalesce(a.c, 0) AS BIGINT) AS ca, gc.cg
        |  FROM (SELECT DISTINCT qi FROM bd) q
        |  CROSS JOIN bands b
        |  LEFT JOIN (SELECT qi, band, count(*) AS c FROM bd GROUP BY 1, 2) a
        |    ON a.qi = q.qi AND a.band = b.band
        |  JOIN gc ON gc.band = b.band
        |), cum AS (
        |  SELECT qi, band, cg,
        |         sum(ca) OVER (PARTITION BY qi ORDER BY band
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
        |         sum(cg) OVER (PARTITION BY qi ORDER BY band
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g,
        |         sum(ca) OVER (PARTITION BY qi) AS na,
        |         sum(cg) OVER (PARTITION BY qi) AS ng
        |  FROM grid
        |)
        |SELECT qi, CAST(max(na) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN band < 9
        |                     THEN abs(CAST(cum_a AS HUGEINT) * ng - CAST(cum_g AS HUGEINT) * na)
        |                     ELSE 0 END) * 1000000
        |            // (CAST(max(na) AS HUGEINT) * max(ng) * 9) AS BIGINT) AS t_ppm
        |FROM cum GROUP BY qi ORDER BY qi""".stripMargin,

    "q422_pps_sample" ->
      """WITH w AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) > 0
        |), c AS (
        |  SELECT l_partkey, w,
        |         CAST(sum(w) OVER (ORDER BY l_partkey
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS cum
        |  FROM w
        |), t AS (SELECT max(cum) AS tw FROM c),
        |p AS (SELECT k, (2 * k + 1) * tw // 40 AS pt
        |      FROM (SELECT unnest(range(0, 20)) AS k), t)
        |SELECT CAST(k AS BIGINT) AS k, l_partkey AS p_partkey, w AS w_cents
        |FROM c JOIN p ON cum - w <= pt AND pt < cum
        |ORDER BY k""".stripMargin,

    "q423_matryoshka_recall" ->
      """WITH b AS (
        |  SELECT vec_id AS vid,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
        |  FROM embeddings
        |), qs AS (SELECT vid AS query_id, q AS qq FROM b WHERE vid < 8),
        |sc AS (
        |  SELECT query_id, vid,
        |         list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * q[i])) AS dot_full,
        |         list_sum(list_transform(range(1, 17), i -> qq[i] * q[i])) AS dot_pre
        |  FROM b, qs WHERE vid <> query_id
        |), rk AS (
        |  SELECT query_id, vid,
        |         row_number() OVER (PARTITION BY query_id ORDER BY dot_full DESC, vid) AS frk,
        |         row_number() OVER (PARTITION BY query_id ORDER BY dot_pre DESC, vid) AS prk
        |  FROM sc
        |)
        |SELECT query_id,
        |       CAST(sum(CASE WHEN frk <= 10 AND prk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |       CAST(sum(CASE WHEN frk <= 10 AND prk <= 10 THEN 1 ELSE 0 END) * 100 // 10 AS BIGINT) AS recall_pct
        |FROM rk WHERE frk <= 10 OR prk <= 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q424_rake_keywords" ->
      """WITH raw AS (SELECT doc_id, string_split(text, ' ') AS ws
        |             FROM documents WHERE text IS NOT NULL),
        |wd0 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
        |                i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        |        FROM raw),
        |wd AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM wd0 WHERE len(u.w) > 0),
        |stop AS (SELECT w FROM (SELECT w, count(*) AS c FROM wd GROUP BY 1
        |                        ORDER BY c DESC, w LIMIT 5)),
        |rn AS (SELECT doc_id, pos, wd.w,
        |              CASE WHEN stop.w IS NOT NULL THEN 1 ELSE 0 END AS is_stop,
        |              sum(CASE WHEN stop.w IS NOT NULL THEN 1 ELSE 0 END)
        |                OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |       FROM wd LEFT JOIN stop ON wd.w = stop.w),
        |mem AS (SELECT doc_id, run, pos, w FROM rn WHERE is_stop = 0),
        |pl AS (SELECT doc_id, run, CAST(count(*) AS BIGINT) AS plen
        |       FROM mem GROUP BY 1, 2),
        |sc AS (SELECT w, CAST(sum(plen) AS BIGINT) * 1000 // count(*) AS score_milli
        |       FROM mem JOIN pl USING (doc_id, run) GROUP BY w),
        |ph AS (SELECT m.doc_id, m.run,
        |              string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
        |              CAST(sum(sc.score_milli) AS BIGINT) AS score_milli
        |       FROM mem m JOIN sc ON m.w = sc.w GROUP BY 1, 2)
        |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occur,
        |       CAST(max(score_milli) AS BIGINT) AS score_milli
        |FROM ph GROUP BY 1 ORDER BY score_milli DESC, phrase LIMIT 10""".stripMargin,

    "q425_aqe_coalesce_sim" ->
      """WITH b AS (SELECT o_orderkey % 128 AS bucket, CAST(count(*) AS BIGINT) AS sz
        |           FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(sz) AS BIGINT) AS total FROM b),
        |g AS (SELECT bucket, sz, (total + 15) // 16 AS target,
        |             CAST(coalesce(sum(sz) OVER (ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |               AS prefix
        |      FROM b, t)
        |SELECT prefix // target AS grp, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(sum(sz) AS BIGINT) AS n_rows,
        |       CAST(CAST(sum(sz) AS BIGINT) * 1000000 // max(target) AS BIGINT) AS fill_ppm
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q426_holt_linear" ->
      """WITH RECURSIVE rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1 HAVING mi >= 0 AND mi < 24
        |), hw(mi, l, b) AS (
        |  SELECT CAST(0 AS BIGINT), rev_c, CAST(0 AS BIGINT) FROM rev WHERE mi = 0
        |  UNION ALL
        |  SELECT r.mi,
        |         (300 * r.rev_c + 700 * (hw.l + hw.b)) // 1000,
        |         (200 * (((300 * r.rev_c + 700 * (hw.l + hw.b)) // 1000) - hw.l)
        |          + 800 * hw.b) // 1000
        |  FROM hw JOIN rev r ON r.mi = hw.mi + 1
        |)
        |SELECT mi AS month_index, l AS level_cents, b AS trend_cents,
        |       l + b AS forecast_next_cents
        |FROM hw ORDER BY mi""".stripMargin,

    "q427_wilson_interval" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM orders GROUP BY 1
        |), d AS (
        |  SELECT priority, n, k,
        |         CAST(38416000000000000 AS HUGEINT)
        |           * (10000 * CAST(k AS HUGEINT) * (n - k) + 9604 * n) * n AS dp
        |  FROM c
        |), r AS (
        |  SELECT priority, n, k, dp,
        |         CAST(floor(sqrt(CAST(dp AS DOUBLE))) AS HUGEINT) AS t0
        |  FROM d
        |), nw AS (
        |  SELECT priority, n, k, dp, (t0 + dp // t0) // 2 AS t1 FROM r
        |), nw2 AS (
        |  SELECT priority, n, k, dp, (t1 + dp // t1) // 2 AS t2 FROM nw
        |), f AS (
        |  SELECT priority, n, k,
        |         CASE WHEN (t2 + 1) * (t2 + 1) <= dp THEN t2 + 1
        |              WHEN t2 * t2 > dp THEN t2 - 1 ELSE t2 END AS rt
        |  FROM nw2
        |)
        |SELECT priority, n, k,
        |       CAST(k * 1000000 // n AS BIGINT) AS phat_ppm,
        |       CAST(((CAST(20000 AS HUGEINT) * k + 38416) * 1000000 * n - 2 * rt)
        |            // (2 * CAST(n AS HUGEINT) * (10000 * n + 38416)) AS BIGINT) AS lo_ppm,
        |       CAST(((CAST(20000 AS HUGEINT) * k + 38416) * 1000000 * n + 2 * rt)
        |            // (2 * CAST(n AS HUGEINT) * (10000 * n + 38416)) AS BIGINT) AS hi_ppm
        |FROM f ORDER BY priority""".stripMargin,

    "q428_quality_knapsack" ->
      """WITH src AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS bytes,
        |         CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS value
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1
        |), rr AS (
        |  SELECT source, bytes, value, value * 1000000 // bytes AS ratio_ppm
        |  FROM src
        |), t AS (SELECT CAST(sum(bytes) AS BIGINT) AS tb FROM src),
        |cx AS (
        |  SELECT source, bytes, value, ratio_ppm, tb,
        |         CAST(coalesce(sum(bytes) OVER (ORDER BY ratio_ppm DESC, source
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |           AS prefix
        |  FROM rr, t
        |)
        |SELECT source, bytes, value, CAST(ratio_ppm AS BIGINT) AS ratio_ppm,
        |       CAST(CASE WHEN prefix < tb // 3 THEN 1 ELSE 0 END AS BIGINT) AS selected
        |FROM cx ORDER BY ratio_ppm DESC, source""".stripMargin,

    "q429_entropy_rate" ->
      """WITH raw AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
        |             FROM documents WHERE text IS NOT NULL),
        |wd0 AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(ws) + 1),
        |                i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        |        FROM raw),
        |wd AS (SELECT doc_id, lang, u.pos AS pos, u.w AS w FROM wd0 WHERE len(u.w) > 0),
        |bg AS (SELECT lang, w,
        |              lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |       FROM wd),
        |pc AS (SELECT lang, w, w2, CAST(count(*) AS BIGINT) AS c
        |       FROM bg WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
        |sp AS (SELECT lang, CAST(sum(c) AS BIGINT) AS np,
        |              CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
        |                   AS HUGEINT) AS sp
        |       FROM pc GROUP BY 1),
        |cc AS (SELECT lang, w, CAST(sum(c) AS BIGINT) AS cctx FROM pc GROUP BY 1, 2),
        |scx AS (SELECT lang,
        |               CAST(sum(cctx * CAST(round(ln(CAST(cctx AS DOUBLE)) * 1000000) AS BIGINT))
        |                    AS HUGEINT) AS sc
        |        FROM cc GROUP BY 1)
        |SELECT sp.lang, np AS n_bigrams,
        |       CAST(CAST(round(ln(CAST(np AS DOUBLE)) * 1000000) AS BIGINT)
        |            - sp.sp // np AS BIGINT) AS h_pair_micro,
        |       CAST(CAST(round(ln(CAST(np AS DOUBLE)) * 1000000) AS BIGINT)
        |            - scx.sc // np AS BIGINT) AS h_ctx_micro,
        |       CAST((scx.sc - sp.sp) // np AS BIGINT) AS h_cond_micro
        |FROM sp JOIN scx USING (lang) ORDER BY lang""".stripMargin,

    "q430_vocab_coverage" ->
      """WITH vc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |        FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0 GROUP BY 1
        |), t AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM vc),
        |rk AS (
        |  SELECT CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rk,
        |         CAST(sum(c) OVER (ORDER BY c DESC, w
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM vc
        |)
        |SELECT rk AS k, cum AS covered_tokens,
        |       CAST(cum * 1000000 // nt AS BIGINT) AS coverage_ppm
        |FROM rk, t WHERE rk IN (1, 2, 5, 10, 20) ORDER BY k""".stripMargin,

    "q431_token_bucket" ->
      """WITH RECURSIVE ev AS (
        |  SELECT (epoch_us(date_trunc('microseconds', ts))
        |          - (SELECT min(epoch_us(date_trunc('microseconds', ts))) FROM events))
        |         // 3600000000 AS hi
        |  FROM events
        |), h AS (SELECT hi, CAST(count(*) AS BIGINT) AS arr
        |         FROM ev WHERE hi < 24 GROUP BY 1),
        |grid AS (SELECT g.hi, CAST(coalesce(h.arr, 0) AS BIGINT) AS arr
        |         FROM (SELECT unnest(range(0, 24)) AS hi) g LEFT JOIN h USING (hi)),
        |tt AS (SELECT CAST((sum(arr) + 23) // 24 AS BIGINT) AS r FROM grid),
        |g2 AS (SELECT hi, arr, r, CAST(2 * r AS BIGINT) AS cap FROM grid, tt),
        |tb(hi, arr, served, dropped, b) AS (
        |  SELECT g.hi, g.arr, least(g.arr, g.cap), g.arr - least(g.arr, g.cap),
        |         g.cap - least(g.arr, g.cap)
        |  FROM g2 g WHERE g.hi = 0
        |  UNION ALL
        |  SELECT g.hi, g.arr,
        |         least(g.arr, least(g.cap, tb.b + g.r)),
        |         g.arr - least(g.arr, least(g.cap, tb.b + g.r)),
        |         least(g.cap, tb.b + g.r) - least(g.arr, least(g.cap, tb.b + g.r))
        |  FROM tb JOIN g2 g ON g.hi = tb.hi + 1
        |)
        |SELECT CAST(hi AS BIGINT) AS hour_index, arr AS arrivals,
        |       CAST(served AS BIGINT) AS served, CAST(dropped AS BIGINT) AS dropped,
        |       CAST(b AS BIGINT) AS bucket_end
        |FROM tb ORDER BY hi""".stripMargin,

    "q432_stupid_backoff" ->
      """WITH raw AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
        |             FROM documents WHERE text IS NOT NULL),
        |wd0 AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(ws) + 1),
        |                i -> struct_pack(pos := i - 1, w := ws[i]))) AS u
        |        FROM raw),
        |wd AS (SELECT doc_id, lang, u.pos AS pos, u.w AS w FROM wd0 WHERE len(u.w) > 0),
        |bg AS (SELECT lang, w,
        |              lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |       FROM wd),
        |tb AS (SELECT w AS t1, w2 AS t2, CAST(count(*) AS BIGINT) AS cb
        |       FROM bg WHERE lang = 'en' AND w2 IS NOT NULL GROUP BY 1, 2),
        |tu AS (SELECT w AS t, CAST(count(*) AS BIGINT) AS cu
        |       FROM wd WHERE lang = 'en' GROUP BY 1),
        |ntr AS (SELECT CAST(sum(cu) AS BIGINT) AS ntr FROM tu),
        |tst AS (SELECT lang, w, w2, CAST(count(*) AS BIGINT) AS c
        |        FROM bg WHERE lang <> 'en' AND w2 IS NOT NULL GROUP BY 1, 2, 3),
        |j AS (SELECT tst.lang, tst.c, tb.cb, u1.cu AS cctx, u2.cu AS cu2, ntr.ntr
        |      FROM tst LEFT JOIN tb ON tst.w = tb.t1 AND tst.w2 = tb.t2
        |      LEFT JOIN tu u1 ON tst.w = u1.t
        |      LEFT JOIN tu u2 ON tst.w2 = u2.t, ntr),
        |sc AS (SELECT lang, c, cb, cu2,
        |       CASE WHEN cb IS NOT NULL
        |              THEN CAST(round(ln(CAST(cb AS DOUBLE) / cctx) * 1000000) AS BIGINT)
        |            WHEN cu2 IS NOT NULL
        |              THEN CAST(round(ln(CAST(0.4 AS DOUBLE) * cu2 / ntr) * 1000000) AS BIGINT)
        |            ELSE CAST(round(ln(CAST(0.4 AS DOUBLE) / ntr) * 1000000) AS BIGINT)
        |       END AS score
        |       FROM j)
        |SELECT lang, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |       CAST(sum(CASE WHEN cb IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_backoff,
        |       CAST(sum(CASE WHEN cb IS NULL AND cu2 IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST(sum(CAST(c AS HUGEINT) * score) // sum(c) AS BIGINT) AS mean_score_micro
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    "q433_bbit_minhash" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm,
         |         (CASE WHEN a.m0 % 2 = b.m0 % 2 THEN 1 ELSE 0 END + CASE WHEN a.m1 % 2 = b.m1 % 2 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 % 2 = b.m2 % 2 THEN 1 ELSE 0 END + CASE WHEN a.m3 % 2 = b.m3 % 2 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 % 2 = b.m4 % 2 THEN 1 ELSE 0 END + CASE WHEN a.m5 % 2 = b.m5 % 2 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 % 2 = b.m6 % 2 THEN 1 ELSE 0 END + CASE WHEN a.m7 % 2 = b.m7 % 2 THEN 1 ELSE 0 END) AS nb
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(nm AS BIGINT) AS n_match, CAST(nb AS BIGINT) AS n_bit,
         |       CAST(nm * 125000 AS BIGINT) AS est_full_ppm,
         |       CAST((nb * 2 - 8) * 125000 AS BIGINT) AS est_1bit_ppm,
         |       CAST(abs((nb * 2 - 8) * 125000 - nm * 125000) AS BIGINT) AS err_ppm
         |FROM nm ORDER BY doc_a, doc_b""".stripMargin,

    "q434_cluster_balanced_sample" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |dc AS (
         |  SELECT d.doc_id, coalesce(lbl.l, d.doc_id) AS cl
         |  FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.u
         |  WHERE d.text IS NOT NULL
         |), szs AS (SELECT cl, CAST(count(*) AS BIGINT) AS sz FROM dc GROUP BY 1),
         |kp AS (
         |  SELECT dc.doc_id, szs.sz,
         |         CASE WHEN CAST(CAST(concat('0x', substr(md5('cbs#' || CAST(dc.doc_id AS VARCHAR)), 1, 12))
         |                          AS BIGINT) AS HUGEINT) * szs.sz < 281474976710656
         |              THEN 1 ELSE 0 END AS keep
         |  FROM dc JOIN szs USING (cl)
         |)
         |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(keep) AS BIGINT) AS n_kept,
         |       CAST(CAST(sum(keep) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS kept_ppm
         |FROM kp GROUP BY 1 ORDER BY 1""".stripMargin,

    "q435_recency_weights" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1
        |), mx AS (SELECT max(mi) AS mxm FROM rev)
        |SELECT mi AS month_index, rev_cents, CAST(mxm - mi AS BIGINT) AS age,
        |       CAST(round(exp(-CAST(mxm - mi AS DOUBLE) / 6.0) * 1000000) AS BIGINT) AS w_ppm,
        |       CAST(rev_cents * CAST(round(exp(-CAST(mxm - mi AS DOUBLE) / 6.0) * 1000000) AS BIGINT)
        |            // 1000000 AS BIGINT) AS w_rev_cents
        |FROM rev, mx ORDER BY month_index""".stripMargin,

    "q436_abc_xyz" ->
      """WITH pm AS (
        |  SELECT l_partkey, (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2 HAVING mi >= 0 AND mi < 24
        |), per AS (
        |  SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq,
        |         CAST(sum(q * q) AS BIGINT) AS sqq, CAST(sum(rev) AS BIGINT) AS rev
        |  FROM pm GROUP BY 1 HAVING sum(q) > 0
        |), t AS (SELECT CAST(sum(rev) AS BIGINT) AS trev FROM per),
        |cx AS (
        |  SELECT per.*, trev,
        |         CAST(coalesce(sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
        |  FROM per, t
        |), cls AS (
        |  SELECT l_partkey, sq, sqq, rev,
        |         CASE WHEN CAST(prefix AS HUGEINT) * 100 < CAST(trev AS HUGEINT) * 80 THEN 'A'
        |              WHEN CAST(prefix AS HUGEINT) * 100 < CAST(trev AS HUGEINT) * 95 THEN 'B'
        |              ELSE 'C' END AS abc_class,
        |         24 * sqq - sq * sq AS vv
        |  FROM cx
        |), s0 AS (
        |  SELECT *, CAST(floor(sqrt(CAST(vv AS DOUBLE))) AS BIGINT) AS t0 FROM cls
        |), s1 AS (
        |  SELECT *, CASE WHEN t0 > 0 THEN (t0 + vv // t0) // 2 ELSE 0 END AS t1 FROM s0
        |), s2 AS (
        |  SELECT *, CASE WHEN (t1 + 1) * (t1 + 1) <= vv THEN t1 + 1
        |                 WHEN t1 * t1 > vv THEN t1 - 1 ELSE t1 END AS rt
        |  FROM s1
        |), xyz AS (
        |  SELECT abc_class, rev,
        |         CASE WHEN rt * 1000 // sq < 3000 THEN 'X'
        |              WHEN rt * 1000 // sq < 4500 THEN 'Y' ELSE 'Z' END AS xyz_class
        |  FROM s2
        |)
        |SELECT abc_class, xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(rev) AS BIGINT) AS rev_cents
        |FROM xyz GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q437_funnel_exclusion" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), x AS (
        |  SELECT event_type,
        |         min(CASE WHEN event_type = 'purchase' THEN us END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_pur,
        |         min(CASE WHEN event_type = 'error' THEN us END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_err
        |  FROM e
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_views,
        |       CAST(count(next_pur) AS BIGINT) AS n_converted,
        |       CAST(sum(CASE WHEN next_pur IS NOT NULL AND next_err IS NOT NULL
        |                      AND next_err <= next_pur THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_excluded,
        |       CAST((count(next_pur)
        |             - sum(CASE WHEN next_pur IS NOT NULL AND next_err IS NOT NULL
        |                         AND next_err <= next_pur THEN 1 ELSE 0 END))
        |            * 1000000 // count(*) AS BIGINT) AS clean_rate_ppm
        |FROM x WHERE event_type = 'view'""".stripMargin,

    "q438_ar2_yule_walker" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |              // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), st AS (SELECT CAST(count(*) AS BIGINT) AS nm, CAST(sum(y) AS BIGINT) AS sy2 FROM rev),
        |z AS (
        |  SELECT nm, nm * y - sy2 AS z,
        |         lag(nm * y - sy2, 1) OVER (ORDER BY mi) AS z1,
        |         lag(nm * y - sy2, 2) OVER (ORDER BY mi) AS z2
        |  FROM rev, st
        |), c AS (
        |  SELECT max(nm) AS n_months,
        |         sum(CAST(z AS HUGEINT) * z) AS c0,
        |         sum(CAST(z AS HUGEINT) * z1) AS c1,
        |         sum(CAST(z AS HUGEINT) * z2) AS c2
        |  FROM z
        |)
        |SELECT CAST(n_months AS BIGINT) AS n_months,
        |       CAST(1000 * c1 // c0 AS BIGINT) AS r1_milli,
        |       CAST(1000 * c2 // c0 AS BIGINT) AS r2_milli,
        |       CAST(1000 * c1 * (c0 - c2) // (c0 * c0 - c1 * c1) AS BIGINT) AS phi1_milli,
        |       CAST((1000 * (c2 * c0 - c1 * c1)) // (c0 * c0 - c1 * c1) AS BIGINT) AS phi2_milli
        |FROM c""".stripMargin,

    "q439_mase_eval" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT mi, y, lag(y, 1) OVER (ORDER BY mi) AS y1,
        |         lag(y, 12) OVER (ORDER BY mi) AS y12
        |  FROM rev
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_months,
        |       CAST(sum(abs(y - y1)) // count(y1) AS BIGINT) AS mae_naive_cents,
        |       CAST(sum(abs(y - y12)) // count(y12) AS BIGINT) AS mae_seasonal_cents,
        |       CAST(CAST(sum(abs(y - y12)) AS HUGEINT) * count(y1) * 1000
        |            // (CAST(count(y12) AS HUGEINT) * sum(abs(y - y1))) AS BIGINT) AS mase_milli
        |FROM l""".stripMargin,

    "q440_text_tiling" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |  FROM documents WHERE text IS NOT NULL
        |), b2 AS (SELECT doc_id, lang, ws, len(ws) // 20 AS nb FROM base),
        |ks AS (SELECT doc_id, lang, ws, unnest(range(1, nb)) AS k
        |       FROM b2 WHERE nb >= 2),
        |j AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_slice(ws, (k - 1) * 20 + 1, k * 20)) AS ld,
        |         list_distinct(list_slice(ws, k * 20 + 1, (k + 1) * 20)) AS rd
        |  FROM ks
        |), jj AS (
        |  SELECT doc_id, lang,
        |         CAST(len(list_intersect(ld, rd)) AS BIGINT) AS inter,
        |         CAST(len(ld) + len(rd) - len(list_intersect(ld, rd)) AS BIGINT) AS uni
        |  FROM j
        |)
        |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_bounds,
        |       CAST(min(inter * 1000000 // uni) AS BIGINT) AS min_j_ppm,
        |       CAST(sum(inter * 1000000 // uni) // count(*) AS BIGINT) AS mean_j_ppm
        |FROM jj GROUP BY 1 ORDER BY 1""".stripMargin,

    "q441_youden_threshold" ->
      s"""$minhashCte,
        |dup_ids AS (SELECT doc_a AS doc_id FROM cand
        |            UNION SELECT doc_b AS doc_id FROM cand),
        |lab AS (
        |  SELECT d.doc_id, d.n_chars,
        |         CASE WHEN dup_ids.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup
        |  FROM documents d LEFT JOIN dup_ids ON d.doc_id = dup_ids.doc_id
        |  WHERE d.text IS NOT NULL
        |), mm AS (SELECT min(n_chars) AS gmin, max(n_chars) AS gmax FROM lab),
        |thr AS (SELECT i, gmin + i * (gmax - gmin + 1) // 10 AS thr
        |        FROM (SELECT unnest(range(1, 10)) AS i), mm),
        |agg AS (
        |  SELECT i, thr,
        |         CAST(sum(CASE WHEN dup = 1 AND n_chars <= thr THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |         CAST(sum(CASE WHEN dup = 0 AND n_chars <= thr THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |         CAST(sum(dup) AS BIGINT) AS p,
        |         CAST(sum(1 - dup) AS BIGINT) AS n
        |  FROM lab, thr GROUP BY 1, 2
        |), r AS (
        |  SELECT i, thr, tp * 1000000 // p AS tpr_ppm, fp * 1000000 // n AS fpr_ppm,
        |         tp * 1000000 // p - fp * 1000000 // n AS j_ppm
        |  FROM agg
        |)
        |SELECT CAST(i AS BIGINT) AS i, CAST(thr AS BIGINT) AS thr,
        |       CAST(tpr_ppm AS BIGINT) AS tpr_ppm, CAST(fpr_ppm AS BIGINT) AS fpr_ppm,
        |       CAST(j_ppm AS BIGINT) AS j_ppm,
        |       CAST(CASE WHEN row_number() OVER (ORDER BY j_ppm DESC, i) = 1
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_best
        |FROM r ORDER BY i""".stripMargin,

    "q442_anisotropy" ->
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
        |), nd AS (SELECT i, j, n_vecs,
        |              CAST(n_vecs AS HUGEINT) * sxy - sx * sy AS num,
        |              CAST(n_vecs AS HUGEINT) * n_vecs * 1000000 AS den
        |       FROM s),
        |ce AS (
        |  SELECT i, j,
        |         CAST(CASE WHEN num >= 0 THEN (2 * num + den) // (2 * den)
        |                   ELSE -((2 * (-num) + den) // (2 * den)) END AS BIGINT) AS cov_e6
        |  FROM nd
        |)
        |SELECT CAST(max(j) + 1 AS BIGINT) AS d,
        |       CAST(sum(CASE WHEN i = j THEN abs(cov_e6) ELSE 0 END) AS BIGINT) AS diag_mass,
        |       CAST(sum(CASE WHEN i <> j THEN abs(cov_e6) * 2 ELSE 0 END) AS BIGINT) AS off_mass,
        |       CAST(max(CASE WHEN i <> j THEN abs(cov_e6) ELSE 0 END) AS BIGINT) AS max_offdiag,
        |       CAST(sum(CASE WHEN i <> j THEN abs(cov_e6) * 2 ELSE 0 END) * 1000000
        |            // sum(CASE WHEN i = j THEN abs(cov_e6) ELSE 0 END) AS BIGINT) AS off_ratio_ppm
        |FROM ce""".stripMargin,

    "q443_smd_balance" ->
      """WITH base AS (
        |  SELECT CAST(concat('0x', substr(md5('smd#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 2 AS arm,
        |         CAST(n_chars AS BIGINT) AS x1,
        |         CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS x2
        |  FROM documents WHERE text IS NOT NULL
        |), cv AS (
        |  SELECT arm, 'n_chars' AS covariate, x1 AS x FROM base
        |  UNION ALL SELECT arm, 'n_words' AS covariate, x2 AS x FROM base
        |), a AS (
        |  SELECT covariate,
        |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
        |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
        |         CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS HUGEINT) AS sa,
        |         CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS HUGEINT) AS sb,
        |         CAST(sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS HUGEINT) AS saa,
        |         CAST(sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS HUGEINT) AS sbb
        |  FROM cv GROUP BY 1
        |), d AS (
        |  SELECT covariate, na, nb, sa * nb - sb * na AS dd,
        |         nb * nb * (na * saa - sa * sa) + na * na * (nb * sbb - sb * sb) AS vv
        |  FROM a
        |), q AS (SELECT covariate, na, nb, 2 * dd * dd * 1000000 // vv AS q2 FROM d),
        |s0 AS (SELECT *, CAST(floor(sqrt(CAST(q2 AS DOUBLE))) AS HUGEINT) AS t0 FROM q),
        |s1 AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + q2 // t0) // 2 ELSE 0 END AS t1 FROM s0)
        |SELECT covariate, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |       CAST(CASE WHEN (t1 + 1) * (t1 + 1) <= q2 THEN t1 + 1
        |                 WHEN t1 * t1 > q2 THEN t1 - 1 ELSE t1 END AS BIGINT) AS smd_milli
        |FROM s1 ORDER BY covariate""".stripMargin,

    "q444_collation_census" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_binary,
        |       CAST(count(DISTINCT lower(text)) AS BIGINT) AS n_distinct_lcase,
        |       CAST(count(DISTINCT text) - count(DISTINCT lower(text)) AS BIGINT)
        |         AS case_only_variants
        |FROM documents WHERE text IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "q445_sales_opportunity" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS abal
        |  FROM customer
        |), pa AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pos, CAST(sum(abal) AS BIGINT) AS sum_pos
        |  FROM cust WHERE abal > 0
        |)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(sum(abal) AS BIGINT) AS total_bal_cents
        |FROM cust, pa
        |WHERE CAST(abal AS HUGEINT) * n_pos > sum_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q446_information_value" ->
      s"""$minhashCte,
        |dup_ids AS (SELECT doc_a AS doc_id FROM cand
        |            UNION SELECT doc_b AS doc_id FROM cand),
        |lab AS (
        |  SELECT d.doc_id, d.n_chars,
        |         CASE WHEN dup_ids.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup
        |  FROM documents d LEFT JOIN dup_ids ON d.doc_id = dup_ids.doc_id
        |  WHERE d.text IS NOT NULL
        |), mm AS (SELECT min(n_chars) AS gmin, max(n_chars) AS gmax FROM lab),
        |binned AS (SELECT (n_chars - gmin) * 5 // (gmax - gmin + 1) AS bin, dup
        |           FROM lab, mm),
        |bb AS (SELECT bin, CAST(sum(dup) AS BIGINT) AS g,
        |              CAST(sum(1 - dup) AS BIGINT) AS b
        |       FROM binned GROUP BY 1),
        |t AS (SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt FROM bb),
        |wv AS (SELECT bin, g, b, gt, bt,
        |      CASE WHEN g > 0 AND b > 0
        |           THEN CAST(round(ln(CAST(g AS DOUBLE) * bt / (CAST(b AS DOUBLE) * gt))
        |                     * 1000000) AS BIGINT) ELSE 0 END AS woe_micro
        |      FROM bb, t)
        |SELECT CAST(bin AS BIGINT) AS bin, g AS n_dup, b AS n_nondup, woe_micro,
        |       CAST(CASE WHEN g > 0 AND b > 0 THEN
        |         (CAST(g AS HUGEINT) * bt - CAST(b AS HUGEINT) * gt) * (woe_micro * 1000)
        |         // (CAST(gt AS HUGEINT) * bt) ELSE 0 END AS BIGINT) AS iv_contrib_nano
        |FROM wv ORDER BY bin""".stripMargin,

    "q447_normalization_gain" ->
      """WITH n AS (
        |  SELECT source, text,
        |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                 ' +', ' ', 'g'))) AS nh
        |  FROM documents WHERE text IS NOT NULL
        |), w AS (
        |  SELECT source,
        |         count(*) OVER (PARTITION BY text) AS c_raw,
        |         count(*) OVER (PARTITION BY nh) AS c_norm
        |  FROM n
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN c_raw > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_raw,
        |       CAST(sum(CASE WHEN c_norm > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_norm,
        |       CAST(sum(CASE WHEN c_norm > 1 THEN 1 ELSE 0 END)
        |            - sum(CASE WHEN c_raw > 1 THEN 1 ELSE 0 END) AS BIGINT) AS gain
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q448_anova_weekday" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |              // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), d2 AS (SELECT dayofweek(day) AS wd, y FROM daily),
        |g AS (SELECT wd, CAST(count(*) AS BIGINT) AS ng, CAST(sum(y) AS BIGINT) AS sg,
        |             CAST(sum(y * y) AS BIGINT) AS ssg FROM d2 GROUP BY 1),
        |u AS (SELECT wd, ng, sg, ssg,
        |             CAST(CAST(sg AS HUGEINT) * sg // ng AS BIGINT) AS ug FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |             CAST(sum(sg) AS BIGINT) AS st, CAST(sum(ssg) AS BIGINT) AS sst,
        |             CAST(sum(ug) AS BIGINT) AS su FROM u)
        |SELECT k, n,
        |       CAST(su - CAST(st AS HUGEINT) * st // n AS BIGINT) AS ssb,
        |       CAST(sst - su AS BIGINT) AS ssw,
        |       CAST(1000 * (n - k) * (su - CAST(st AS HUGEINT) * st // n)
        |            // ((k - 1) * (CAST(sst AS HUGEINT) - su)) AS BIGINT) AS f_milli
        |FROM a""".stripMargin,
  )
}
