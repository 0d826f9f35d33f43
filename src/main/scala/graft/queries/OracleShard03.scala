package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard03 {
  val defs: Map[String, String] = Map(

    // Weekly retention cohorts: Monday-start weeks in both engines; the
    // offset is exact day arithmetic on week-truncated dates.
    "q88_retention_cohorts" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |         CAST(date_trunc('week', date_trunc('microseconds', ts)) AS DATE) AS week
        |  FROM events
        |), f AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', f.cohort, uw.week) // 7 AS BIGINT) AS week_offset,
        |       count(*) AS n_active
        |FROM uw JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    // Sorted-neighborhood pairs verified with exact Levenshtein on the
    // normalized 64-char prefix (DuckDB levenshtein ≡ Java levenshtein
    // on ASCII).
    "q130_linkage_verify" ->
      """WITH k AS (
        |  SELECT doc_id AS id,
        |         substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                    ' +', ' ', 'g')), 1, 24) AS key,
        |         substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                    ' +', ' ', 'g')), 1, 64) AS nk
        |  FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT id, key, nk, substr(key, 1, 6) AS blk,
        |         row_number() OVER (PARTITION BY substr(key, 1, 6) ORDER BY key, id) AS rn
        |  FROM k
        |), p AS (
        |  SELECT a.id AS doc_a, b.id AS doc_b, a.nk AS na, b.nk AS nb
        |  FROM r a JOIN r b ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
        |)
        |SELECT doc_a, doc_b,
        |       CAST(levenshtein(na, nb) AS BIGINT) AS edit_dist,
        |       CASE WHEN greatest(length(na), length(nb)) = 0 THEN CAST(1.0 AS DOUBLE)
        |            ELSE round(CAST(1.0 AS DOUBLE)
        |                       - CAST(levenshtein(na, nb) AS DOUBLE)
        |                         / greatest(length(na), length(nb)), 6) END AS prefix_sim,
        |       CAST(CASE WHEN levenshtein(na, nb) <= 8 THEN 1 ELSE 0 END AS BIGINT) AS is_match
        |FROM p ORDER BY doc_a, doc_b""".stripMargin,

    // Integer PageRank, 3 rounds replayed as chained CTEs (MATERIALIZED —
    // inlined CTEs re-evaluate the chain exponentially). `//` on BIGINTs
    // mirrors Spark's DIV on positive values.
    "q131_pagerank" ->
      s"""$minhashCte,
         |e AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM cand
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM cand),
         |d AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
         |r0 AS MATERIALIZED (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM d),
         |r1 AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |         CAST(150000 + (850 * CAST(sum(r0.r // d.deg) AS BIGINT)) // 1000 AS BIGINT) AS r
         |  FROM e JOIN r0 ON r0.node = e.src JOIN d ON d.src = e.src
         |  GROUP BY e.dst),
         |r2 AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |         CAST(150000 + (850 * CAST(sum(r1.r // d.deg) AS BIGINT)) // 1000 AS BIGINT) AS r
         |  FROM e JOIN r1 ON r1.node = e.src JOIN d ON d.src = e.src
         |  GROUP BY e.dst),
         |r3 AS (
         |  SELECT e.dst AS node,
         |         CAST(150000 + (850 * CAST(sum(r2.r // d.deg) AS BIGINT)) // 1000 AS BIGINT) AS r
         |  FROM e JOIN r2 ON r2.node = e.src JOIN d ON d.src = e.src
         |  GROUP BY e.dst)
         |SELECT node, r AS rank_micros FROM r3 ORDER BY rank_micros DESC, node""".stripMargin,

    // Order-invariant table fingerprints: canonical row string → 60-bit
    // md5 lane → xor + modular sum + count.
    "q132_table_fingerprint" -> {
      def fp(canonical: String, from: String): String =
        s"""SELECT CAST(concat('0x', substr(md5(concat_ws('|', $canonical)), 1, 15)) AS BIGINT) AS fp
           |  FROM $from""".stripMargin
      def agg(name: String): String =
        s"""SELECT '$name' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(bit_xor(fp) AS BIGINT) AS xor_fp,
           |       CAST(sum(fp % 1000000007) AS BIGINT) AS sum_fp
           |FROM fp_$name""".stripMargin
      s"""WITH fp_customer AS (
         |  ${fp(
              "CAST(c_custkey AS VARCHAR), c_name, CAST(c_nationkey AS VARCHAR), " +
                s"CAST(${centsSql("c_acctbal")} AS VARCHAR), c_mktsegment",
              "customer")}
         |), fp_nation AS (
         |  ${fp("CAST(n_nationkey AS VARCHAR), n_name, CAST(n_regionkey AS VARCHAR)", "nation")}
         |), fp_orders AS (
         |  ${fp(
              "CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus, " +
                s"CAST(${centsSql("o_totalprice")} AS VARCHAR), " +
                "strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority",
              "orders")}
         |), fp_region AS (
         |  ${fp("CAST(r_regionkey AS VARCHAR), r_name", "region")}
         |), fp_supplier AS (
         |  ${fp(
              "CAST(s_suppkey AS VARCHAR), s_name, CAST(s_nationkey AS VARCHAR), " +
                s"CAST(${centsSql("s_acctbal")} AS VARCHAR)",
              "supplier")}
         |)
         |SELECT * FROM (
         |  ${agg("customer")}
         |  UNION ALL
         |  ${agg("nation")}
         |  UNION ALL
         |  ${agg("orders")}
         |  UNION ALL
         |  ${agg("region")}
         |  UNION ALL
         |  ${agg("supplier")}
         |) ORDER BY table_name""".stripMargin
    },

    // TPC-H Q5 shape: regional supplier volume, customer and supplier in
    // the same nation, exact-cents revenue.
    "q133_regional_revenue" ->
      s"""SELECT n.n_name AS nation,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents,
         |       CAST(count(*) AS BIGINT) AS n_lineitems
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  AND o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1998-01-01'
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
         |GROUP BY 1 ORDER BY revenue_cents DESC, nation""".stripMargin,

    // Triangle census under the degree-ordered orientation; each
    // triangle found exactly once as a wedge closed by an oriented edge.
    "q134_triangle_stats" ->
      s"""$minhashCte,
         |e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM cand),
         |dg AS MATERIALIZED (
         |  SELECT node, CAST(count(*) AS BIGINT) AS dg FROM (
         |    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
         |  GROUP BY node),
         |oe AS MATERIALIZED (
         |  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b)
         |              THEN e.a ELSE e.b END AS src,
         |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b)
         |              THEN e.b ELSE e.a END AS dst,
         |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b)
         |              THEN db.dg ELSE da.dg END AS ddst
         |  FROM e JOIN dg da ON da.node = e.a JOIN dg db ON db.node = e.b),
         |wg AS MATERIALIZED (
         |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w2
         |  FROM oe e1 JOIN oe e2 ON e1.src = e2.src
         |   AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))),
         |tri AS (SELECT u, v, w2 FROM wg JOIN oe ON oe.src = wg.v AND oe.dst = wg.w2),
         |pn AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |    SELECT u AS node FROM tri
         |    UNION ALL SELECT v AS node FROM tri
         |    UNION ALL SELECT w2 AS node FROM tri)
         |  GROUP BY node)
         |SELECT dg.node AS node, dg.dg AS degree,
         |       CAST(coalesce(pn.n_tri, 0) AS BIGINT) AS n_triangles,
         |       CASE WHEN dg.dg > 1
         |            THEN round(CAST(coalesce(pn.n_tri, 0) * 2 AS DOUBLE)
         |                       / (dg.dg * (dg.dg - 1)), 6)
         |            ELSE CAST(0.0 AS DOUBLE) END AS clustering
         |FROM dg LEFT JOIN pn ON pn.node = dg.node
         |ORDER BY dg.node""".stripMargin,

    // Boilerplate prefix census over the normalized 32-char prefix.
    "q135_prefix_boilerplate" ->
      """WITH p AS (
        |  SELECT substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                    ' +', ' ', 'g')), 1, 32) AS prefix,
        |         doc_id, source
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM p GROUP BY prefix HAVING count(*) >= 2
        |ORDER BY n_docs DESC, prefix""".stripMargin,

    // Multinomial NB replay: integer-quantized log-probs, zero-count
    // term factored out exactly as the Spark side does, argmax by
    // (-score, label).
    "q136_nb_attribution" ->
      """WITH base AS (
        |  SELECT doc_id, source AS actual, text FROM documents WHERE text IS NOT NULL
        |), words AS (
        |  SELECT doc_id, actual, w FROM (
        |    SELECT doc_id, actual, unnest(string_split(text, ' ')) AS w FROM base)
        |  WHERE length(w) > 0
        |), dw AS (SELECT doc_id, actual, w, CAST(count(*) AS BIGINT) AS n
        |          FROM words GROUP BY 1, 2, 3),
        |lw AS (SELECT actual AS lbl, w, CAST(count(*) AS BIGINT) AS c
        |       FROM words GROUP BY 1, 2),
        |lt AS (SELECT lbl, CAST(sum(c) AS BIGINT) AS t FROM lw GROUP BY 1),
        |vc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM lw),
        |nd AS (SELECT actual AS lbl, CAST(count(*) AS BIGINT) AS nd FROM base GROUP BY 1),
        |ntot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM base),
        |consts AS (
        |  SELECT lt.lbl,
        |         CAST(round(ln(CAST(1.0 AS DOUBLE) / (lt.t + vc.v)) * 1000000) AS BIGINT) AS lp0,
        |         CAST(round(ln(CAST(nd.nd AS DOUBLE) / ntot.ntot) * 1000000) AS BIGINT) AS prior,
        |         lt.t, vc.v
        |  FROM lt JOIN nd USING (lbl), vc, ntot
        |), lp AS (
        |  SELECT lw.lbl, lw.w,
        |         CAST(round(ln(CAST(lw.c + 1 AS DOUBLE) / (co.t + co.v)) * 1000000) AS BIGINT)
        |           - co.lp0 AS adj
        |  FROM lw JOIN consts co ON co.lbl = lw.lbl
        |), adjsum AS (
        |  SELECT dw.doc_id, dw.actual, lp.lbl, CAST(sum(dw.n * lp.adj) AS BIGINT) AS s_adj
        |  FROM dw JOIN lp ON lp.w = dw.w
        |  GROUP BY 1, 2, 3
        |), nw AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words FROM dw GROUP BY 1),
        |scored AS (
        |  SELECT nw.doc_id, co.lbl,
        |         nw.n_words * co.lp0 + coalesce(a.s_adj, 0) + co.prior AS score
        |  FROM nw CROSS JOIN consts co
        |  LEFT JOIN adjsum a ON a.doc_id = nw.doc_id AND a.lbl = co.lbl
        |), best AS (
        |  SELECT doc_id, lbl AS pred FROM (
        |    SELECT doc_id, lbl,
        |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lbl) AS rk
        |    FROM scored) WHERE rk = 1
        |)
        |SELECT b.actual AS actual_label, best.pred AS pred_label,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM base b JOIN best ON best.doc_id = b.doc_id
        |GROUP BY 1, 2 ORDER BY actual_label, pred_label""".stripMargin,

    // Rolling 7-day distinct actives via the 7-way fan-out (no range
    // self-join), capped at the corpus max day.
    "q137_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         CAST(date_trunc('day', date_trunc('microseconds', ts)) AS DATE) AS d
        |  FROM events
        |), mx AS (SELECT max(d) AS dmax FROM ud),
        |fan AS (
        |  SELECT user_id, d + CAST(off AS INTEGER) AS wday
        |  FROM ud, unnest(range(0, 7)) AS t(off)
        |)
        |SELECT strftime(fan.wday, '%Y-%m-%d') AS window_end,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d
        |FROM fan, mx WHERE fan.wday <= mx.dmax
        |GROUP BY 1 ORDER BY window_end""".stripMargin,

    // Stride-16 30-char window hashes; DuckDB range() excludes its stop,
    // so stop = len-28 matches Spark's inclusive sequence(1, len-29).
    "q138_substring_dups" ->
      """WITH wins AS (
        |  SELECT DISTINCT doc_id,
        |         CAST(concat('0x', substr(md5(substr(text, CAST(pos AS INTEGER), 30)), 1, 12)) AS BIGINT) AS h
        |  FROM documents, unnest(range(1, length(text) - 28, 16)) AS t(pos)
        |  WHERE text IS NOT NULL AND length(text) >= 30
        |), hc AS (SELECT h, CAST(count(*) AS BIGINT) AS nd FROM wins GROUP BY h)
        |SELECT w2.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |       CAST(sum(CASE WHEN hc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |       round(CAST(sum(CASE WHEN hc.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac
        |FROM wins w2 JOIN hc ON hc.h = w2.h
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Grouped OLS from exact HUGEINT sums (q54 discipline).
    "q139_brand_ols" -> {
      val x = centsSql("l_quantity")
      val y = centsSql("l_extendedprice")
      s"""WITH a AS (
         |  SELECT p_brand,
         |         CAST(count(*) AS HUGEINT) AS n,
         |         sum(CAST($x AS HUGEINT)) AS sx,
         |         sum(CAST($y AS HUGEINT)) AS sy,
         |         sum(CAST($x AS HUGEINT) * CAST($y AS HUGEINT)) AS sxy,
         |         sum(CAST($x AS HUGEINT) * CAST($x AS HUGEINT)) AS sxx
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY p_brand
         |)
         |SELECT p_brand, CAST(n AS BIGINT) AS n_rows,
         |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |             CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
         |       round(CAST(sy * sxx - sx * sxy AS DOUBLE) /
         |             CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept_cents
         |FROM a ORDER BY p_brand""".stripMargin
    },

    // Islands of consecutive equal event_type per user; the next run's
    // start closes each interval.
    "q140_scd2_runs" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type
        |  FROM events
        |), flagged AS (
        |  SELECT *,
        |         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM ev
        |), runs AS (
        |  SELECT *,
        |         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
        |  FROM flagged
        |), agg AS (
        |  SELECT user_id, grp, event_type,
        |         min(ts) AS from_ts, CAST(count(*) AS BIGINT) AS n_events
        |  FROM runs GROUP BY 1, 2, 3
        |)
        |SELECT user_id, grp AS run_seq, event_type,
        |       strftime(from_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |       coalesce(strftime(lead(from_ts) OVER (PARTITION BY user_id ORDER BY grp),
        |                         '%Y-%m-%d %H:%M:%S.%f'), 'current') AS valid_to,
        |       n_events
        |FROM agg ORDER BY user_id, run_seq""".stripMargin,

    // TPC-H Q7 shape: nation joined under two roles, cross-nation rows
    // only, yearly exact-cents volume.
    "q141_nation_trade" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |       CAST(sum(${centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS volume_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1999-01-01'
         |  AND s_nationkey <> c_nationkey
         |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,

    // RRF of the LSH and sorted-neighborhood generators; pure-integer
    // kernel 1e9 // (60+rank), ranks per generator, top-3 fused.
    "q142_rank_fusion" ->
      s"""$minhashCte,
         |l0 AS (
         |  SELECT doc_a AS d, doc_b AS nb, n_bands AS sc FROM cand
         |  UNION ALL
         |  SELECT doc_b AS d, doc_a AS nb, n_bands AS sc FROM cand),
         |lr AS (
         |  SELECT d, nb,
         |         CAST(row_number() OVER (PARTITION BY d ORDER BY sc DESC, nb) AS BIGINT) AS rk
         |  FROM l0),
         |k AS (
         |  SELECT doc_id AS id,
         |         substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |                                    ' +', ' ', 'g')), 1, 24) AS key
         |  FROM documents WHERE text IS NOT NULL
         |), r AS (
         |  SELECT id, key, substr(key, 1, 6) AS blk,
         |         row_number() OVER (PARTITION BY substr(key, 1, 6) ORDER BY key, id) AS rn
         |  FROM k
         |), s0 AS (
         |  SELECT a.id AS d, b.id AS nb,
         |         CASE WHEN a.key = b.key THEN 1 ELSE 0 END AS sc
         |  FROM r a JOIN r b ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
         |  UNION ALL
         |  SELECT b.id AS d, a.id AS nb,
         |         CASE WHEN a.key = b.key THEN 1 ELSE 0 END AS sc
         |  FROM r a JOIN r b ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
         |), sr AS (
         |  SELECT d, nb,
         |         CAST(row_number() OVER (PARTITION BY d ORDER BY sc DESC, nb) AS BIGINT) AS rk
         |  FROM s0),
         |u AS (
         |  SELECT d, nb, 1000000000 // (60 + rk) AS contrib FROM lr
         |  UNION ALL
         |  SELECT d, nb, 1000000000 // (60 + rk) AS contrib FROM sr),
         |f AS (
         |  SELECT d, nb, CAST(sum(contrib) AS BIGINT) AS rrf_score,
         |         CAST(count(*) AS BIGINT) AS n_gens
         |  FROM u GROUP BY 1, 2),
         |tk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY d ORDER BY rrf_score DESC, nb) AS BIGINT) AS rank
         |  FROM f)
         |SELECT d AS doc_id, rank, nb AS neighbor, rrf_score, n_gens
         |FROM tk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // TPC-H Q4 shape: per-priority share of orders with a lineitem
    // shipped >60 days after the order date.
    "q143_late_orders" ->
      """WITH late AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
        |  FROM orders WHERE EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |  GROUP BY 1
        |), tot AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1
        |)
        |SELECT t.o_orderpriority, t.n_orders,
        |       CAST(coalesce(l.n_late, 0) AS BIGINT) AS n_late,
        |       round(CAST(coalesce(l.n_late, 0) AS DOUBLE) / t.n_orders, 6) AS late_frac
        |FROM tot t LEFT JOIN late l USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,

    // Audience overlap: Jaccard between event types' distinct user sets.
    "q144_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        |c AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1)
        |SELECT x.t AS type_a, y.t AS type_b, ca.n AS n_a, cb.n AS n_b,
        |       CAST(count(*) AS BIGINT) AS n_both,
        |       round(CAST(count(*) AS DOUBLE) / (ca.n + cb.n - count(*)), 6) AS jaccard
        |FROM ut x JOIN ut y ON x.u = y.u AND x.t < y.t
        |JOIN c ca ON ca.t = x.t JOIN c cb ON cb.t = y.t
        |GROUP BY 1, 2, ca.n, cb.n
        |ORDER BY type_a, type_b""".stripMargin,

    // Session-duration percentiles over the q36 session relation.
    "q145_session_percentiles" ->
      s"""WITH $sessionChain,
         |sess AS (
         |  SELECT user_id, sess_idx, CAST(count(*) AS BIGINT) AS n_events,
         |         CAST(max(us) - min(us) AS BIGINT) AS duration_us
         |  FROM g GROUP BY 1, 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         |       round(quantile_cont(duration_us, 0.5), 6) AS p50_us,
         |       round(quantile_cont(duration_us, 0.9), 6) AS p90_us,
         |       round(quantile_cont(duration_us, 0.99), 6) AS p99_us,
         |       round(quantile_cont(n_events, 0.5), 6) AS p50_events,
         |       CAST(max(duration_us) AS BIGINT) AS max_us
         |FROM sess""".stripMargin,

    // LSH generator eval vs exact-dup ground truth; true-pair mass from
    // group sizes, TP via md5(text) equality on candidates.
    "q146_lsh_eval" ->
      s"""$minhashCte,
         |sig AS (SELECT doc_id, md5(text) AS tmd5 FROM documents WHERE text IS NOT NULL),
         |tg AS (
         |  SELECT CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS n_true_pairs
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM sig GROUP BY tmd5)),
         |cc AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         |         CAST(sum(CASE WHEN sa.tmd5 = sb.tmd5 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp
         |  FROM cand
         |  JOIN sig sa ON sa.doc_id = cand.doc_a
         |  JOIN sig sb ON sb.doc_id = cand.doc_b)
         |SELECT n_candidates, n_true_pairs, n_tp,
         |       CASE WHEN n_candidates = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE round(CAST(n_tp AS DOUBLE) / n_candidates, 6) END AS prec,
         |       CASE WHEN n_true_pairs = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE round(CAST(n_tp AS DOUBLE) / n_true_pairs, 6) END AS rec,
         |       CASE WHEN n_tp = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE round(CAST(2.0 AS DOUBLE)
         |                       * (CAST(n_tp AS DOUBLE) / n_candidates)
         |                       * (CAST(n_tp AS DOUBLE) / n_true_pairs)
         |                       / ((CAST(n_tp AS DOUBLE) / n_candidates)
         |                          + (CAST(n_tp AS DOUBLE) / n_true_pairs)), 6) END AS f1
         |FROM cc, tg""".stripMargin,

    // RFM codes by comparison against one broadcast exact-quartile row.
    "q147_rfm_segments" -> {
      def c3(v: String, q1: String, q2: String, q3: String): String =
        s"1 + CASE WHEN $v > $q1 THEN 1 ELSE 0 END" +
          s" + CASE WHEN $v > $q2 THEN 1 ELSE 0 END" +
          s" + CASE WHEN $v > $q3 THEN 1 ELSE 0 END"
      s"""WITH ref AS (SELECT CAST(max(o_orderdate) AS DATE) AS refd FROM orders),
         |rfm AS (
         |  SELECT o_custkey,
         |         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), ref.refd) AS BIGINT) AS rec,
         |         CAST(count(*) AS BIGINT) AS freq,
         |         CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS mon
         |  FROM orders, ref GROUP BY o_custkey, ref.refd
         |), qs AS (
         |  SELECT quantile_cont(rec, 0.25) AS r1, quantile_cont(rec, 0.5) AS r2,
         |         quantile_cont(rec, 0.75) AS r3,
         |         quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.5) AS f2,
         |         quantile_cont(freq, 0.75) AS f3,
         |         quantile_cont(mon, 0.25) AS m1, quantile_cont(mon, 0.5) AS m2,
         |         quantile_cont(mon, 0.75) AS m3
         |  FROM rfm
         |)
         |SELECT concat_ws('/', ${c3("rec", "r1", "r2", "r3")},
         |                 ${c3("freq", "f1", "f2", "f3")},
         |                 ${c3("mon", "m1", "m2", "m3")}) AS segment,
         |       CAST(count(*) AS BIGINT) AS n_customers,
         |       CAST(sum(mon) AS BIGINT) AS mon_cents
         |FROM rfm, qs GROUP BY 1 ORDER BY segment""".stripMargin
    },

    // Nearest-in-time replay: backward carry (≤, last IGNORE NULLS over
    // preceding) + forward carry (>, first IGNORE NULLS over following),
    // ties in |gap| to the earlier (past) row.
    "q148_nearest_event" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id, event_type
        |  FROM events
        |), l AS (
        |  SELECT user_id, ts, 1 AS side, event_id AS lid, NULL::BIGINT AS rid
        |  FROM ev WHERE event_type = 'error'
        |), r AS (
        |  SELECT user_id, ts, 0 AS side, NULL::BIGINT AS lid, event_id AS rid
        |  FROM ev WHERE event_type = 'purchase'
        |), u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |c AS (
        |  SELECT user_id, ts, side, lid,
        |         last_value(CASE WHEN side = 0 THEN struct_pack(rid := rid, t := ts) END
        |                    IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, side, rid
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b,
        |         first_value(CASE WHEN side = 0 THEN struct_pack(rid := rid, t := ts) END
        |                     IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, side, rid
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
        |  FROM u
        |), p AS (
        |  SELECT user_id, lid, epoch_us(ts) AS ts_us,
        |         b.rid AS b_rid, epoch_us(ts) - epoch_us(b.t) AS db,
        |         f.rid AS f_rid, epoch_us(f.t) - epoch_us(ts) AS df
        |  FROM c WHERE side = 1
        |)
        |SELECT user_id, lid AS event_id, ts_us,
        |       CAST(CASE WHEN b_rid IS NULL AND f_rid IS NULL THEN NULL
        |                 WHEN f_rid IS NULL OR (b_rid IS NOT NULL AND db <= df) THEN b_rid
        |                 ELSE f_rid END AS BIGINT) AS nearest_event_id,
        |       CAST(CASE WHEN b_rid IS NULL AND f_rid IS NULL THEN NULL
        |                 WHEN f_rid IS NULL OR (b_rid IS NOT NULL AND db <= df) THEN db
        |                 ELSE df END AS BIGINT) AS gap_us,
        |       CASE WHEN b_rid IS NULL AND f_rid IS NULL THEN 'none'
        |            WHEN f_rid IS NULL OR (b_rid IS NOT NULL AND db <= df) THEN 'past'
        |            ELSE 'future' END AS direction
        |FROM p ORDER BY user_id, event_id""".stripMargin,

    // Day-of-week × hour heatmap; DuckDB dayofweek is 0-based Sunday,
    // Spark's is 1-based.
    "q149_hourly_heatmap" ->
      s"""SELECT CAST(dayofweek(date_trunc('microseconds', ts)) + 1 AS BIGINT) AS dow,
         |       CAST(hour(date_trunc('microseconds', ts)) AS BIGINT) AS hod,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |       CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents
         |FROM events GROUP BY 1, 2 ORDER BY dow, hod""".stripMargin,

    // TPC-H Q13 shape: order-count distribution including the zero
    // bucket via the left join.
    "q150_order_count_dist" ->
      """SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1)
        |GROUP BY 1 ORDER BY n_orders""".stripMargin,

    // Top-20 3-step event-type paths; (n desc, t1, t2, t3) is a total
    // order so the cut is deterministic.
    "q151_event_trigrams" ->
      """WITH s AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS t3
        |  FROM (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type
        |        FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
        |FROM s WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,

    // int8 quantization replay: floor(x+0.5) rounding and 1e-12 error
    // quanta are pure IEEE ops — bit-identical across engines; the mean
    // uses the half-away integer division at pico scale.
    "q152_quant_error" ->
      """WITH vv AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings
        |), el AS (SELECT vec_id, label, unnest(e) AS v FROM vv),
        |sc AS (SELECT vec_id, max(abs(v)) AS scale FROM el GROUP BY 1),
        |qx AS (
        |  SELECT el.vec_id, el.label, el.v, sc.scale,
        |         CASE WHEN sc.scale = 0 THEN 0
        |              ELSE CAST(floor(el.v / sc.scale * 127 + 0.5) AS BIGINT) END AS q
        |  FROM el JOIN sc USING (vec_id)
        |), ex AS (
        |  SELECT vec_id, label, q,
        |         CAST(floor((v - (q * scale) / 127) * (v - (q * scale) / 127)
        |                    * 1000000000000 + 0.5) AS BIGINT) AS e2u
        |  FROM qx
        |), pv AS (
        |  SELECT vec_id, label, CAST(sum(e2u) AS BIGINT) AS se2,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN abs(q) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS sat
        |  FROM ex GROUP BY 1, 2
        |)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(CAST((2 * sum(se2) + sum(n)) // (2 * sum(n)) AS BIGINT) AS DOUBLE)
        |         / 1000000000000.0 AS mean_sq_err,
        |       CAST(sum(sat) AS BIGINT) AS n_saturated
        |FROM pv GROUP BY label ORDER BY label""".stripMargin,

    // Deletion cascade: deterministic 1% customer sample propagated by
    // key containment.
    "q153_delete_cascade" ->
      """WITH delc AS (
        |  SELECT c_custkey FROM customer
        |  WHERE CAST(concat('0x', substr(md5('del#' || CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT) % 100 = 0
        |), odel AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM delc)),
        |ldel AS (SELECT 1 AS x FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM odel)),
        |a AS (
        |  SELECT 'customer' AS table_name,
        |         (SELECT count(*) FROM customer) AS n_before,
        |         (SELECT count(*) FROM delc) AS n_deleted
        |  UNION ALL
        |  SELECT 'lineitem', (SELECT count(*) FROM lineitem), (SELECT count(*) FROM ldel)
        |  UNION ALL
        |  SELECT 'orders', (SELECT count(*) FROM orders), (SELECT count(*) FROM odel)
        |)
        |SELECT table_name, CAST(n_before AS BIGINT) AS n_before,
        |       CAST(n_deleted AS BIGINT) AS n_deleted,
        |       CAST(n_before - n_deleted AS BIGINT) AS n_after
        |FROM a ORDER BY table_name""".stripMargin,

    "q154_forecast_revenue" ->
      s"""SELECT CAST(sum(${centsSql("l_extendedprice * l_discount")}) AS BIGINT) AS revenue_cents,
         |       CAST(count(*) AS BIGINT) AS n_lineitems
         |FROM lineitem
         |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q155_returned_items" ->
      s"""SELECT c.c_custkey, c.c_name, n.n_name AS nation,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents,
         |       CAST(count(*) AS BIGINT) AS n_returns
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  AND o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1997-07-01'
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_cents DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q156_promo_share" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS month,
         |       CAST(sum(CASE WHEN p.p_type = 'PROMO'
         |                     THEN ${centsSql("l.l_extendedprice * (1 - l.l_discount)")}
         |                     ELSE 0 END) AS BIGINT) AS promo_cents,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS total_cents,
         |       round(CAST(sum(CASE WHEN p.p_type = 'PROMO'
         |                     THEN ${centsSql("l.l_extendedprice * (1 - l.l_discount)")}
         |                     ELSE 0 END) AS DOUBLE)
         |             / sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}), 6) AS promo_share
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q157_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |         CAST(sum(${centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
         |  GROUP BY 1
         |)
         |SELECT s.s_suppkey, s.s_name, rev.revenue_cents
         |FROM rev
         |JOIN supplier s ON rev.l_suppkey = s.s_suppkey
         |WHERE rev.revenue_cents = (SELECT max(revenue_cents) FROM rev)
         |ORDER BY s.s_suppkey""".stripMargin,

    "q158_big_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS qty_sum
         |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
         |)
         |SELECT c.c_custkey, c.c_name, o.o_orderkey,
         |       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
         |       ${centsSql("o.o_totalprice")} AS totalprice_cents, big.qty_sum
         |FROM orders o
         |JOIN big ON o.o_orderkey = big.l_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |ORDER BY big.qty_sum DESC, o.o_orderkey
         |LIMIT 50""".stripMargin,

    "q159_band_revenue" ->
      s"""SELECT CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents,
         |       CAST(count(*) AS BIGINT) AS n_lineitems
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p.p_type = 'PROMO' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 15)
         |   OR (p.p_type = 'STANDARD' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 25)
         |   OR (p.p_type = 'LARGE' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 35)""".stripMargin,

    "q160_market_share" ->
      s"""SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         |       CAST(sum(CASE WHEN s.s_nationkey = 2
         |                     THEN ${centsSql("l.l_extendedprice * (1 - l.l_discount)")}
         |                     ELSE 0 END) AS BIGINT) AS nation_cents,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS total_cents,
         |       round(CAST(sum(CASE WHEN s.s_nationkey = 2
         |                     THEN ${centsSql("l.l_extendedprice * (1 - l.l_discount)")}
         |                     ELSE 0 END) AS DOUBLE)
         |             / sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}), 6) AS mkt_share
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_regionkey = 1
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q161_lapsed_wealth" ->
      s"""WITH tot AS (
         |  SELECT CAST(sum(${centsSql("c_acctbal")}) AS BIGINT) AS sum_cents,
         |         count(*) AS n_cust
         |  FROM customer
         |)
         |SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
         |       CAST(count(*) AS BIGINT) AS n_lapsed,
         |       CAST(sum(${centsSql("c.c_acctbal")}) AS BIGINT) AS acctbal_cents
         |FROM customer c, tot
         |WHERE ${centsSql("c.c_acctbal")} * tot.n_cust > tot.sum_cents
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= '1999-01-01')
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q162_hll_distinct" ->
      s"""WITH p AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT event_type,
         |             CAST(concat('0x', substr(md5('hll#' || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
         |      FROM p),
         |r AS (SELECT event_type, h // 549755813888 AS b,
         |             CASE WHEN h % 549755813888 = 0 THEN 40
         |                  ELSE 40 - length(bin(h % 549755813888)) END AS rho
         |      FROM h),
         |m AS (SELECT event_type, b, max(rho) AS mr FROM r GROUP BY 1, 2),
         |sagg AS (SELECT event_type, count(*) AS n_present,
         |                CAST(sum(CAST(1 AS BIGINT) << CAST(40 - mr AS INT)) AS BIGINT) AS sp
         |         FROM m GROUP BY 1),
         |e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_distinct FROM p GROUP BY 1)
         |SELECT e.event_type, e.exact_distinct,
         |       round($hllAlphaM2Scaled /
         |             CAST(sagg.sp + (512 - sagg.n_present) * 1099511627776 AS DOUBLE), 3) AS hll_estimate,
         |       CAST(512 - sagg.n_present AS BIGINT) AS n_empty
         |FROM e JOIN sagg USING (event_type)
         |ORDER BY event_type""".stripMargin,

    "q163_power_pca" -> powerIterationSql(iters = 4),

    "q164_purchase_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), t AS (
        |  SELECT event_type, us,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type,
        |         lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        |  FROM e
        |), c AS (
        |  SELECT CASE WHEN prev_us >= us - 604800000000 THEN prev_type ELSE 'none' END AS touch,
        |         CAST(count(*) AS BIGINT) AS n_purchases
        |  FROM t WHERE event_type = 'purchase' GROUP BY 1
        |)
        |SELECT touch, n_purchases,
        |       round(CAST(n_purchases AS DOUBLE) / sum(n_purchases) OVER (), 6) AS share
        |FROM c ORDER BY touch""".stripMargin,

    "q165_partition_pruning" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q166_abtest_lift" ->
      """WITH p AS (
        |  SELECT CAST(concat('0x', substr(md5('ab#' || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) % 2 AS grp,
        |         CAST(round(value * 1000000) AS HUGEINT) AS vq
        |  FROM events WHERE event_type = 'purchase'
        |), a AS (
        |  SELECT CAST(count(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS n_a,
        |         CAST(count(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS n_b,
        |         sum(CASE WHEN grp = 0 THEN vq ELSE 0 END) AS sva,
        |         sum(CASE WHEN grp = 1 THEN vq ELSE 0 END) AS svb,
        |         sum(CASE WHEN grp = 0 THEN vq * vq ELSE 0 END) AS sv2a,
        |         sum(CASE WHEN grp = 1 THEN vq * vq ELSE 0 END) AS sv2b
        |  FROM p
        |), m AS (
        |  SELECT n_a, n_b,
        |         CAST((2 * sva + n_a) // (2 * n_a) AS DOUBLE) / 1000000.0 AS mean_a,
        |         CAST((2 * svb + n_b) // (2 * n_b) AS DOUBLE) / 1000000.0 AS mean_b,
        |         CAST((n_a * sv2a - sva * sva) AS DOUBLE) / n_a / n_a / 1000000000000.0 AS var_a,
        |         CAST((n_b * sv2b - svb * svb) AS DOUBLE) / n_b / n_b / 1000000000000.0 AS var_b
        |  FROM a
        |)
        |SELECT n_a, n_b, mean_a, mean_b, mean_a - mean_b AS lift,
        |       round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS z_score
        |FROM m""".stripMargin,

    "q167_vocab_pruning" ->
      """WITH w AS (
        |  SELECT t AS w FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE length(t) > 0
        |), c AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
        |g AS (SELECT unnest([2, 5, 10, 25, 100]) AS threshold),
        |k AS (
        |  SELECT g.threshold, CAST(count(*) AS BIGINT) AS vocab_size,
        |         CAST(sum(c.c) AS BIGINT) AS kept_tokens
        |  FROM c JOIN g ON c.c >= g.threshold GROUP BY 1
        |)
        |SELECT CAST(k.threshold AS BIGINT) AS threshold, k.vocab_size, k.kept_tokens,
        |       round(CAST(k.kept_tokens AS DOUBLE) / tot.total, 6) AS kept_share
        |FROM k, tot ORDER BY threshold""".stripMargin,

    "q168_split_leakage" ->
      """WITH d AS (
        |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                 ' +', ' ', 'g'))) AS nh,
        |         CASE WHEN CAST(concat('0x', substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 10 <= 7 THEN 'train'
        |              WHEN CAST(concat('0x', substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 10 = 8 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents WHERE text IS NOT NULL
        |), t AS (SELECT DISTINCT nh, 1 AS hit FROM d WHERE split = 'train')
        |SELECT d.split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(coalesce(t.hit, 0)) AS BIGINT) AS n_leaked,
        |       round(CAST(sum(coalesce(t.hit, 0)) AS DOUBLE) / count(*), 6) AS leak_rate
        |FROM d LEFT JOIN t USING (nh)
        |WHERE d.split <> 'train'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q169_quota_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substr(md5('quota#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS _r
        |  FROM documents
        |), k AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY _r, doc_id) AS rn
        |  FROM r
        |)
        |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
        |FROM k
        |WHERE rn <= CASE WHEN lang = 'en' THEN 50 ELSE 20 END
        |ORDER BY lang, rn""".stripMargin,

    "q170_new_vs_returning" ->
      """WITH um AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
        |f AS (
        |  SELECT day, min(day) OVER (PARTITION BY user_id) AS first_day FROM um
        |), g AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS n_active,
        |         CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM f GROUP BY 1
        |)
        |SELECT day, n_active, n_new,
        |       CAST(n_active - n_new AS BIGINT) AS n_returning,
        |       round(CAST(n_new AS DOUBLE) / n_active, 6) AS new_share
        |FROM g ORDER BY day""".stripMargin,

    "q171_time_to_convert" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us,
        |         strftime(ts, '%Y-%m-%d') AS day
        |  FROM events WHERE event_type IN ('signup', 'purchase')
        |), u AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN us END) AS sus,
        |         min(CASE WHEN event_type = 'signup' THEN day END) AS cohort,
        |         min(CASE WHEN event_type = 'purchase' THEN us END) AS pus
        |  FROM e GROUP BY 1
        |), d AS (
        |  SELECT cohort,
        |         CASE WHEN pus >= sus THEN pus - sus END AS delta_us
        |  FROM u WHERE sus IS NOT NULL
        |), g AS (
        |  SELECT cohort, CAST(count(*) AS BIGINT) AS n_signups,
        |         CAST(count(delta_us) AS BIGINT) AS n_converted,
        |         round(median(delta_us) / 3600000000.0, 6) AS median_hours
        |  FROM d GROUP BY 1
        |)
        |SELECT cohort, n_signups, n_converted,
        |       round(CAST(n_converted AS DOUBLE) / n_signups, 6) AS conversion_rate,
        |       median_hours
        |FROM g ORDER BY cohort""".stripMargin,

    "q172_reciprocal_best" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |),
         |u AS (
         |  SELECT doc_a AS d, doc_b AS p, nm FROM nm
         |  UNION ALL
         |  SELECT doc_b AS d, doc_a AS p, nm FROM nm
         |),
         |best AS (
         |  SELECT d, p, nm FROM (
         |    SELECT d, p, nm, row_number() OVER (PARTITION BY d ORDER BY nm DESC, p) AS rn FROM u)
         |  WHERE rn = 1
         |)
         |SELECT x.d AS doc_a, x.p AS doc_b, CAST(x.nm AS BIGINT) AS n_match,
         |       round(CAST(x.nm AS DOUBLE) / 8.0, 6) AS est_jaccard
         |FROM best x JOIN best y ON x.p = y.d AND y.p = x.d AND x.d < y.d
         |ORDER BY doc_a""".stripMargin,

    "q173_ewma_error_rate" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
        |  FROM events GROUP BY 1
        |), k AS (
        |  SELECT strftime(d, '%Y-%m-%d') AS day,
        |         datediff('day', DATE '2024-01-01', d) AS k, n_events, n_errors
        |  FROM daily
        |), w AS (
        |  SELECT day, n_events, n_errors,
        |         CAST(sum(n_events << CAST(k AS INT)) OVER (ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cwn,
        |         CAST(sum(n_errors << CAST(k AS INT)) OVER (ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cwe
        |  FROM k
        |)
        |SELECT day, n_events, n_errors,
        |       round(CAST(n_errors AS DOUBLE) / n_events, 6) AS rate,
        |       round(CAST(cwe AS DOUBLE) / cwn, 6) AS ewma_rate
        |FROM w ORDER BY day""".stripMargin,

    "q174_decile_lift" ->
      s"""WITH spend AS (
         |  SELECT o_custkey, CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS spend_cents
         |  FROM orders GROUP BY 1
         |), cuts AS (
         |  SELECT quantile_cont(spend_cents,
         |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
         |  FROM spend
         |), dec AS (
         |  SELECT s.spend_cents,
         |         10 - (CASE WHEN c[1] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[2] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[3] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[4] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[5] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[6] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[7] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[8] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END
         |             + CASE WHEN c[9] <= CAST(s.spend_cents AS DOUBLE) THEN 1 ELSE 0 END) AS decile
         |  FROM spend s, cuts
         |), g AS (
         |  SELECT CAST(decile AS BIGINT) AS decile,
         |         CAST(count(*) AS BIGINT) AS n_customers,
         |         CAST(sum(spend_cents) AS BIGINT) AS spend_cents
         |  FROM dec GROUP BY 1
         |)
         |SELECT decile, n_customers, spend_cents,
         |       round(CAST(spend_cents AS DOUBLE) / sum(spend_cents) OVER (), 6) AS spend_share,
         |       round(CAST(sum(spend_cents) OVER (ORDER BY decile
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |             / sum(spend_cents) OVER (), 6) AS cum_share
         |FROM g ORDER BY decile""".stripMargin,

    "q175_copurchase_pairs" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM d x JOIN d y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b
        |LIMIT 50""".stripMargin,

    "q176_part_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(sum(${centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS profit_cents
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q177_small_qty_revenue" ->
      s"""WITH pq AS (
         |  SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS sq,
         |         CAST(count(*) AS BIGINT) AS nq
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS total_cents,
         |       CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) // 7 AS avg_yearly_cents
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
         |JOIN pq USING (l_partkey)
         |WHERE CAST(l_quantity AS BIGINT) * nq * 5 < sq""".stripMargin,

    "q178_sole_late_supplier" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey,
        |         CAST(max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS sl
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), po AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
        |         CAST(sum(sl) AS BIGINT) AS n_late,
        |         max(CASE WHEN sl = 1 THEN l_suppkey END) AS late_supp
        |  FROM ps GROUP BY 1
        |)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS n_orders
        |FROM po JOIN supplier ON late_supp = s_suppkey
        |WHERE n_supp > 1 AND n_late = 1
        |GROUP BY 1 ORDER BY n_orders DESC, s_name LIMIT 20""".stripMargin,

    "q179_concurrency_curve" ->
      s"""WITH $sessionChain, sess AS (
         |  SELECT user_id, sess_idx, min(us) AS start_us, max(us) AS end_us
         |  FROM g GROUP BY 1, 2
         |), d AS (
         |  SELECT start_us AS us, CAST(1 AS BIGINT) AS delta, user_id, sess_idx FROM sess
         |  UNION ALL
         |  SELECT end_us AS us, CAST(-1 AS BIGINT) AS delta, user_id, sess_idx FROM sess
         |), r AS (
         |  SELECT us, delta,
         |         CAST(sum(delta) OVER (ORDER BY us, delta DESC, user_id, sess_idx
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
         |  FROM d
         |)
         |SELECT strftime(make_timestamp(us), '%Y-%m-%d') AS day,
         |       CAST(count(*) AS BIGINT) AS n_sessions,
         |       CAST(max(conc) AS BIGINT) AS max_concurrent
         |FROM r WHERE delta = 1
         |GROUP BY 1 ORDER BY day""".stripMargin,

    "q180_langid_confusion" ->
      """WITH p AS (SELECT lang, ' ' || text || ' ' AS pt FROM documents),
        |sc AS (
        |  SELECT lang,
        |         CAST((length(pt) - length(replace(pt, ' the ', ''))) / 5 AS BIGINT) AS s_en,
        |         CAST((length(pt) - length(replace(pt, ' le ', ''))) / 4 AS BIGINT) AS s_fr,
        |         CAST((length(pt) - length(replace(pt, ' der ', ''))) / 5 AS BIGINT) AS s_de,
        |         CAST((length(pt) - length(replace(pt, ' el ', ''))) / 4 AS BIGINT) AS s_es
        |  FROM p
        |), c AS (
        |  SELECT lang,
        |         CASE WHEN s_en IS NULL THEN NULL
        |              WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
        |              WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
        |              WHEN s_de >= s_es THEN 'de'
        |              ELSE 'es' END AS pred
        |  FROM sc
        |), g AS (
        |  SELECT lang, pred, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2
        |)
        |SELECT lang, pred, n,
        |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang), 6) AS recall
        |FROM g ORDER BY lang, pred""".stripMargin,

    "q181_split_gain" -> {
      def ent(pos: String, n: String): String =
        s"CASE WHEN ($pos) <= 0 OR ($pos) >= ($n) THEN 0.0 ELSE " +
          s"-((CAST($pos AS DOUBLE)/($n))*ln(CAST($pos AS DOUBLE)/($n)) + " +
          s"(CAST(($n) - ($pos) AS DOUBLE)/($n))*ln(CAST(($n) - ($pos) AS DOUBLE)/($n))) END"
      s"""WITH g AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS npos,
         |         CAST(sum(CASE WHEN n_chars < t THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         |         CAST(sum(CASE WHEN n_chars < t AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nlpos
         |  FROM documents
         |  CROSS JOIN (SELECT CAST(unnest([500, 1000, 1500, 2000, 2500, 3000, 3500, 4000]) AS BIGINT) AS t) u
         |  GROUP BY t
         |)
         |SELECT t, n, npos, nl, nlpos,
         |       round(${ent("npos", "n")} -
         |             (CAST(nl AS DOUBLE) * (${ent("nlpos", "nl")}) +
         |              CAST(n - nl AS DOUBLE) * (${ent("npos - nlpos", "n - nl")})) / n,
         |             6) AS gain
         |FROM g ORDER BY t""".stripMargin
    },

    "q182_silhouette" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |x AS (
        |  SELECT vec_id, u.pos AS pos, CAST(round(u.val * 1000) AS BIGINT) AS qv
        |  FROM (SELECT vec_id,
        |               unnest(list_transform(range(1, len(e)+1),
        |                                     i -> struct_pack(pos := i, val := e[i]))) AS u
        |        FROM v)
        |), c AS (SELECT vec_id AS cent_id, pos, qv AS cv FROM x WHERE vec_id < 8),
        |d AS (
        |  SELECT x.vec_id, c.cent_id,
        |         CAST(sum((x.qv - c.cv) * (x.qv - c.cv)) AS BIGINT) AS d2
        |  FROM x JOIN c USING (pos) GROUP BY 1, 2
        |), r AS (
        |  SELECT vec_id, cent_id, d2,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
        |  FROM d
        |), p AS (
        |  SELECT vec_id,
        |         min(CASE WHEN rn = 1 THEN cent_id END) AS cluster_id,
        |         min(CASE WHEN rn = 1 THEN d2 END) AS a,
        |         min(CASE WHEN rn = 2 THEN d2 END) AS b
        |  FROM r GROUP BY 1
        |), s AS (
        |  SELECT cluster_id,
        |         CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
        |              ELSE ((b - a) * 1000000) // greatest(a, b) END AS sm
        |  FROM p
        |), g AS (
        |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
        |         CAST(sum(sm) AS BIGINT) AS ssum
        |  FROM s GROUP BY 1
        |)
        |SELECT cluster_id, n_members,
        |       CAST((2 * ssum + n_members) // (2 * n_members) AS DOUBLE) / 1000000.0
        |         AS mean_silhouette
        |FROM g ORDER BY cluster_id""".stripMargin,

    "q183_order_gap_stats" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate,
        |         lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders
        |), gp AS (
        |  SELECT o_custkey,
        |         CAST(date_diff('day', CAST(prev AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT)
        |           AS gap_days
        |  FROM o WHERE prev IS NOT NULL
        |), g AS (
        |  SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_gaps,
        |         CAST(sum(gap_days) AS BIGINT) AS gsum,
        |         round(quantile_cont(gap_days, 0.5), 6) AS median_gap
        |  FROM gp JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1
        |)
        |SELECT segment, n_gaps,
        |       CAST((2 * gsum * 1000000 + n_gaps) // (2 * n_gaps) AS DOUBLE) / 1000000.0
        |         AS mean_gap,
        |       median_gap
        |FROM g ORDER BY segment""".stripMargin,

    "q184_ngram_novelty" ->
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
        |), fo AS (SELECT sk, min(doc_id) AS fd FROM sh GROUP BY sk),
        |pd AS (
        |  SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS ng,
        |         CAST(sum(CASE WHEN fo.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS nn
        |  FROM sh JOIN fo USING (sk) GROUP BY 1
        |)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(pd.ng) AS BIGINT) AS n_grams,
        |       CAST(sum(pd.nn) AS BIGINT) AS n_novel,
        |       round(CAST(sum(pd.nn) AS DOUBLE) / sum(pd.ng), 6) AS novelty
        |FROM pd JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY d.source""".stripMargin,

    "q185_yoy_growth" ->
      s"""WITH rev AS (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
         |         CAST(sum(${centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS rev_cents
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2
         |), lg AS (
         |  SELECT nation, yr, rev_cents,
         |         lag(rev_cents) OVER (PARTITION BY nation ORDER BY yr) AS prev_cents
         |  FROM rev
         |)
         |SELECT nation, yr, rev_cents, prev_cents,
         |       CASE WHEN prev_cents IS NULL THEN NULL
         |            ELSE CAST(CASE WHEN rev_cents < prev_cents
         |                 THEN -(((prev_cents - rev_cents) * 2000000 + prev_cents) // (2 * prev_cents))
         |                 ELSE ((rev_cents - prev_cents) * 2000000 + prev_cents) // (2 * prev_cents)
         |                 END AS DOUBLE) / 1000000.0 END AS growth
         |FROM lg ORDER BY nation, yr""".stripMargin,

    "q186_char_trigram_entropy" ->
      """WITH tg AS (
        |  SELECT lang, substr(text, CAST(i AS INT), 3) AS g
        |  FROM documents CROSS JOIN unnest(range(1, length(text) - 1)) AS u(i)
        |  WHERE text IS NOT NULL AND length(text) >= 3
        |), cnt AS (
        |  SELECT lang, g, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY 1, 2
        |), wt AS (
        |  SELECT lang, c, CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS tot
        |  FROM cnt
        |), tn AS (
        |  SELECT lang, tot,
        |         CAST(round(-(CAST(c AS DOUBLE)/tot)*ln(CAST(c AS DOUBLE)/tot)*1e9) AS BIGINT) AS tn
        |  FROM wt
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(max(tot) AS BIGINT) AS n_trigrams,
        |       CAST(CAST(sum(tn) AS BIGINT) AS DOUBLE) / 1e9 AS entropy_nats
        |FROM tn GROUP BY lang ORDER BY lang""".stripMargin,

    "q187_interarrival_burstiness" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), lg AS (
        |  SELECT event_type, us,
        |         lag(us) OVER (PARTITION BY event_type ORDER BY us, event_id) AS prev
        |  FROM e
        |), gp AS (
        |  SELECT event_type, us - prev AS gap FROM lg WHERE prev IS NOT NULL
        |), a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |         CAST(sum(gap) AS BIGINT) AS sx,
        |         sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sxx
        |  FROM gp GROUP BY 1
        |)
        |SELECT event_type, n_gaps,
        |       CAST((2 * sx + n_gaps) // (2 * n_gaps) AS BIGINT) AS mean_gap_us,
        |       CASE WHEN n_gaps > 1 THEN
        |         round(sqrt(CAST(CAST(n_gaps AS HUGEINT) * sxx -
        |                         CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) /
        |                    CAST(n_gaps * (n_gaps - 1) AS DOUBLE)) *
        |               CAST(n_gaps AS DOUBLE) / CAST(sx AS DOUBLE), 6)
        |       END AS cv
        |FROM a ORDER BY event_type""".stripMargin,

    "q188_daily_anomaly" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1
        |), st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n_events) AS BIGINT) AS sx,
        |         CAST(sum(n_events * n_events) AS BIGINT) AS sxx
        |  FROM daily
        |), z AS (
        |  SELECT day, n_events,
        |         CAST(nd * n_events - sx AS DOUBLE) / nd /
        |           sqrt(CAST(nd * sxx - sx * sx AS DOUBLE) / (nd * (nd - 1))) AS z
        |  FROM daily CROSS JOIN st
        |)
        |SELECT day, n_events, round(z, 6) AS z, abs(z) > 2.0 AS is_anomaly
        |FROM z ORDER BY day""".stripMargin,

    "q189_changelog_apply" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_type, us,
        |         row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn,
        |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_updates,
        |         CAST(min(us) OVER (PARTITION BY user_id) AS BIGINT) AS first_us
        |  FROM e
        |)
        |SELECT user_id, event_type AS last_type, us AS last_us, first_us, n_updates
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q190_centroid_drift" ->
      """WITH v AS (SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS e
        |           FROM embeddings),
        |x AS (
        |  SELECT label, u.pos AS pos, CAST(round(u.val * 1000000) AS BIGINT) AS qv
        |  FROM (SELECT label,
        |               unnest(list_transform(range(1, len(e)+1),
        |                                     i -> struct_pack(pos := i, val := e[i]))) AS u
        |        FROM v)
        |), m AS (
        |  SELECT label, pos, CAST(sum(qv) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS n
        |  FROM x GROUP BY 1, 2
        |), mm AS (
        |  SELECT label, pos,
        |         CASE WHEN sq < 0 THEN -((2 * (-sq) + n) // (2 * n))
        |              ELSE (2 * sq + n) // (2 * n) END AS mm
        |  FROM m
        |), d AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |         CAST(sum((a.mm - b.mm) * (a.mm - b.mm)) AS BIGINT) AS d2
        |  FROM mm a JOIN mm b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY 1, 2
        |)
        |SELECT label_a, label_b, round(sqrt(CAST(d2 AS DOUBLE)) / 1000000.0, 6) AS l2_dist
        |FROM d ORDER BY label_a, label_b""".stripMargin,

    "q191_dim_variance" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |x AS (
        |  SELECT CAST(u.pos - 1 AS BIGINT) AS dim,
        |         CAST(round(u.val * 1000000) AS BIGINT) AS qv
        |  FROM (SELECT unnest(list_transform(range(1, len(e)+1),
        |                                     i -> struct_pack(pos := i, val := e[i]))) AS u
        |        FROM v)
        |), a AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(qv) AS BIGINT) AS sx,
        |         sum(CAST(qv AS HUGEINT) * CAST(qv AS HUGEINT)) AS sxx
        |  FROM x GROUP BY 1
        |)
        |SELECT dim,
        |       round(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
        |                  AS DOUBLE) /
        |             (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 1e12, 6) AS variance
        |FROM a ORDER BY variance DESC, dim LIMIT 10""".stripMargin,

    "q192_pricing_summary" ->
      s"""WITH a AS (
         |  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |         CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
         |         CAST(sum(${centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_cents,
         |         CAST(sum(${centsSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}) AS BIGINT) AS sum_charge_cents,
         |         CAST(sum(CAST(round(l_discount * 1000000) AS BIGINT)) AS BIGINT) AS sd
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |  GROUP BY 1, 2
         |)
         |SELECT l_returnflag, l_linestatus, n_rows, sum_qty, sum_base_cents,
         |       sum_disc_cents, sum_charge_cents,
         |       CAST((2 * sum_qty * 1000000 + n_rows) // (2 * n_rows) AS DOUBLE) / 1000000.0 AS avg_qty,
         |       CAST((2 * sum_base_cents * 10000 + n_rows) // (2 * n_rows) AS DOUBLE) / 1000000.0 AS avg_price,
         |       CAST((2 * sd + n_rows) // (2 * n_rows) AS DOUBLE) / 1000000.0 AS avg_disc
         |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
