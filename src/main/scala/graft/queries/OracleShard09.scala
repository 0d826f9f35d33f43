package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard09 {
  val defs: Map[String, String] = Map(

    "q513_variance_ratio" ->
      """WITH day AS (
        |  SELECT o_orderdate AS d,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
        |  FROM orders GROUP BY 1
        |), df AS (
        |  SELECT r - lag(r, 1) OVER (ORDER BY d) AS d1,
        |         r - lag(r, 2) OVER (ORDER BY d) AS d2,
        |         r - lag(r, 4) OVER (ORDER BY d) AS d4,
        |         r - lag(r, 8) OVER (ORDER BY d) AS d8
        |  FROM day
        |), b AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1, CAST(sum(d1) AS BIGINT) AS s1,
        |         sum(CAST(d1 AS HUGEINT) * d1) AS ss1
        |  FROM df WHERE d1 IS NOT NULL
        |), g2 AS (SELECT CAST(count(*) AS BIGINT) AS nq, CAST(sum(d2) AS BIGINT) AS sq,
        |                 sum(CAST(d2 AS HUGEINT) * d2) AS ssq
        |          FROM df WHERE d2 IS NOT NULL),
        |g4 AS (SELECT CAST(count(*) AS BIGINT) AS nq, CAST(sum(d4) AS BIGINT) AS sq,
        |              sum(CAST(d4 AS HUGEINT) * d4) AS ssq
        |       FROM df WHERE d4 IS NOT NULL),
        |g8 AS (SELECT CAST(count(*) AS BIGINT) AS nq, CAST(sum(d8) AS BIGINT) AS sq,
        |              sum(CAST(d8 AS HUGEINT) * d8) AS ssq
        |       FROM df WHERE d8 IS NOT NULL)
        |SELECT CAST(2 AS BIGINT) AS q, nq AS n_diffs,
        |       CAST((CAST(nq AS HUGEINT) * ssq - CAST(sq AS HUGEINT) * sq)
        |            * n1 * n1 * 1000000
        |            // (2 * (CAST(n1 AS HUGEINT) * ss1 - CAST(s1 AS HUGEINT) * s1)
        |               * nq * nq) AS BIGINT) AS vr_ppm
        |FROM g2, b
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), nq,
        |       CAST((CAST(nq AS HUGEINT) * ssq - CAST(sq AS HUGEINT) * sq)
        |            * n1 * n1 * 1000000
        |            // (4 * (CAST(n1 AS HUGEINT) * ss1 - CAST(s1 AS HUGEINT) * s1)
        |               * nq * nq) AS BIGINT)
        |FROM g4, b
        |UNION ALL
        |SELECT CAST(8 AS BIGINT), nq,
        |       CAST((CAST(nq AS HUGEINT) * ssq - CAST(sq AS HUGEINT) * sq)
        |            * n1 * n1 * 1000000
        |            // (8 * (CAST(n1 AS HUGEINT) * ss1 - CAST(s1 AS HUGEINT) * s1)
        |               * nq * nq) AS BIGINT)
        |FROM g8, b
        |ORDER BY q""".stripMargin,

    "q514_dp_noise" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1),
        |e AS (SELECT unnest([100, 1000, 10000]) AS eps_milli),
        |u AS (SELECT source, n, CAST(eps_milli AS BIGINT) AS eps_milli,
        |             CAST(concat('0x', substr(md5('dp#' || source || '#' || eps_milli), 1, 12))
        |               AS BIGINT) AS u48
        |      FROM s CROSS JOIN e),
        |t AS (SELECT source, n, eps_milli, u48,
        |             CAST(round(ln(CAST(greatest(281474976710656
        |                 - abs(2 * u48 - 281474976710656), 1) AS DOUBLE)
        |               / 281474976710656) * 1000000) AS BIGINT) AS lnm
        |      FROM u),
        |o AS (SELECT source, eps_milli, n,
        |             CAST(-(CASE WHEN u48 >= 140737488355328 THEN 1 ELSE -1 END)
        |                  * lnm // eps_milli AS BIGINT) AS noise_milli
        |      FROM t)
        |SELECT source, eps_milli, n, noise_milli,
        |       CAST(n * 1000 + noise_milli AS BIGINT) AS noisy_milli,
        |       CAST(abs(noise_milli) AS BIGINT) AS abs_err_milli
        |FROM o ORDER BY source, eps_milli""".stripMargin,

    "q515_burrows_delta" ->
      """WITH wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0 GROUP BY 1, 2
        |), ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ntok FROM wc GROUP BY 1),
        |top AS (SELECT w FROM (SELECT w, CAST(sum(c) AS BIGINT) AS ct
        |                       FROM wc GROUP BY 1)
        |        ORDER BY ct DESC, w LIMIT 20),
        |grid AS (SELECT ns.source, top.w,
        |                CAST(coalesce(wc.c, 0) * 1000000 // ns.ntok AS BIGINT) AS f
        |         FROM ns CROSS JOIN top
        |         LEFT JOIN wc ON wc.source = ns.source AND wc.w = top.w),
        |st AS (SELECT w, CAST(count(*) AS BIGINT) AS sct, CAST(sum(f) AS BIGINT) AS sf,
        |              CAST(sum(f * f) AS BIGINT) AS sff FROM grid GROUP BY 1),
        |sq AS (SELECT w, sct, sf, sct * sff - sf * sf AS vn,
        |              CAST(floor(sqrt(CAST(sct * sff - sf * sf AS DOUBLE))) AS BIGINT) AS t0
        |       FROM st),
        |nw AS (SELECT w, sct, sf, vn,
        |              CASE WHEN t0 > 0 THEN (t0 + vn // t0) // 2 ELSE 0 END AS t1
        |       FROM sq),
        |sd AS (SELECT w, sct, sf,
        |              CASE WHEN (t1 + 1) * (t1 + 1) <= vn THEN t1 + 1
        |                   WHEN t1 * t1 > vn THEN t1 - 1 ELSE t1 END AS sd
        |       FROM nw),
        |z AS (SELECT g.source, g.w,
        |             CASE WHEN sd.sd > 0 THEN (sd.sct * g.f - sd.sf) * 1000 // sd.sd
        |                  ELSE 0 END AS z_milli
        |      FROM grid g JOIN sd ON g.w = sd.w),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |             CAST(sum(abs(a.z_milli - b.z_milli)) AS BIGINT) AS sabs
        |      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT source_a, source_b, CAST(sabs // 20 AS BIGINT) AS delta_milli
        |FROM p ORDER BY delta_milli, source_a, source_b LIMIT 5""".stripMargin,

    "q516_topic_coherence" ->
      """WITH dw AS (
        |  SELECT doc_id, source, w FROM (
        |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0
        |), tc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |          FROM dw GROUP BY 1, 2),
        |topw AS (SELECT source, w, rk FROM (
        |           SELECT source, w,
        |                  CAST(row_number() OVER (PARTITION BY source
        |                    ORDER BY c DESC, w) AS BIGINT) AS rk
        |           FROM tc) WHERE rk <= 5),
        |dwt AS (SELECT DISTINCT doc_id, w FROM dw
        |        WHERE w IN (SELECT DISTINCT w FROM topw)),
        |dfw AS (SELECT w, CAST(count(*) AS BIGINT) AS dfw FROM dwt GROUP BY 1),
        |co AS (SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS cod
        |       FROM dwt a JOIN dwt b ON a.doc_id = b.doc_id AND a.w <> b.w
        |       GROUP BY 1, 2),
        |pr AS (SELECT a.source, a.w AS wa, b.w AS wb
        |       FROM topw a JOIN topw b ON a.source = b.source AND a.rk < b.rk),
        |t AS (SELECT pr.source,
        |             CAST(round(ln(CAST(coalesce(co.cod, 0) + 1 AS DOUBLE)
        |               / dfw.dfw) * 1000000) AS BIGINT) AS t6
        |      FROM pr LEFT JOIN co ON co.wa = pr.wa AND co.wb = pr.wb
        |              JOIN dfw ON dfw.w = pr.wb)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(t6) AS BIGINT) AS coherence_micro
        |FROM t GROUP BY 1 ORDER BY source""".stripMargin,

    "q517_grubbs_test" ->
      """WITH x AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS x
        |           FROM customer),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |              sum(CAST(x AS HUGEINT) * x) AS sxx FROM x),
        |o AS (SELECT c_custkey, x.x, n, sx, sxx, abs(n * x.x - sx) AS num
        |      FROM x, st ORDER BY num DESC, c_custkey LIMIT 1),
        |g AS (SELECT n AS n_customers, c_custkey AS outlier_custkey,
        |             x AS outlier_cents,
        |             CAST(CAST(num AS HUGEINT) * num * 1000000 * (n - 1)
        |                  // (CAST(n AS HUGEINT)
        |                     * (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx))
        |               AS BIGINT) AS g2
        |      FROM o),
        |t AS (SELECT n_customers, outlier_custkey, outlier_cents, g2,
        |             CAST(floor(sqrt(CAST(g2 AS DOUBLE))) AS BIGINT) AS t0 FROM g),
        |t2 AS (SELECT n_customers, outlier_custkey, outlier_cents, g2,
        |              CASE WHEN t0 > 0 THEN (t0 + g2 // t0) // 2 ELSE 0 END AS t1
        |       FROM t)
        |SELECT n_customers, outlier_custkey, outlier_cents,
        |       CAST(CASE WHEN (t1 + 1) * (t1 + 1) <= g2 THEN t1 + 1
        |                 WHEN t1 * t1 > g2 THEN t1 - 1 ELSE t1 END AS BIGINT) AS g_milli
        |FROM t2""".stripMargin,

    "q518_logrank_test" ->
      """WITH seg AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS g1
        |  FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
        |), life AS (
        |  SELECT o.o_custkey, seg.g1,
        |         datediff('day', min(o.o_orderdate), max(o.o_orderdate)) AS t
        |  FROM orders o JOIN seg ON o.o_custkey = seg.c_custkey
        |  GROUP BY 1, 2
        |), et AS (
        |  SELECT t, CAST(sum(g1) AS BIGINT) AS d1, CAST(count(*) AS BIGINT) AS d
        |  FROM life GROUP BY 1
        |), risk AS (
        |  SELECT d1, d,
        |         CAST(sum(d1) OVER (ORDER BY t
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1t,
        |         CAST(sum(d) OVER (ORDER BY t
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS nt
        |  FROM et
        |), ev AS (
        |  SELECT d1, d, CAST(d * n1t * 1000000 // nt AS BIGINT) AS e1_micro,
        |         CAST(CASE WHEN nt > 1
        |                   THEN CAST(d AS HUGEINT) * n1t * (nt - n1t) * (nt - d)
        |                        * 1000000
        |                        // (CAST(nt AS HUGEINT) * nt * (nt - 1))
        |                   ELSE 0 END AS BIGINT) AS v_micro
        |  FROM risk
        |), s AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS o1, CAST(sum(d - d1) AS BIGINT) AS o2,
        |         CAST(sum(e1_micro) AS BIGINT) AS e1_micro_total,
        |         CAST(sum(v_micro) AS BIGINT) AS v_micro_total
        |  FROM ev
        |)
        |SELECT o1, o2, e1_micro_total, v_micro_total,
        |       CAST((CAST(o1 AS HUGEINT) * 1000000 - e1_micro_total)
        |            * (CAST(o1 AS HUGEINT) * 1000000 - e1_micro_total)
        |            // (CAST(v_micro_total AS HUGEINT) * 1000000) AS BIGINT) AS chi2_micro
        |FROM s""".stripMargin,

    "q519_jonckheere" -> {
      val ns = (1 to 5).map(g =>
        s"CAST(sum(CASE WHEN g = $g THEN 1 ELSE 0 END) AS BIGINT) AS n$g")
        .mkString(",\n        |       ")
      val cbs = (1 to 5).map(g =>
        s"CAST(coalesce(sum(n$g) OVER wb, 0) AS BIGINT) AS cb$g")
        .mkString(",\n        |       ")
      val pairTerms = (for (g <- 1 to 4; h <- (g + 1) to 5)
        yield s"n$h * (2 * cb$g + n$g)").mkString(" + ")
      val ts = (1 to 5).map(g => s"CAST(sum(n$g) AS BIGINT) AS t$g")
        .mkString(", ")
      val maxTerms = (for (g <- 1 to 4; h <- (g + 1) to 5)
        yield s"t$g * t$h").mkString(" + ")
      s"""WITH j AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders),
        |vg AS (SELECT v,
        |       $ns
        |       FROM j GROUP BY 1),
        |cum AS (SELECT v, n1, n2, n3, n4, n5,
        |       $cbs
        |        FROM vg
        |        WINDOW wb AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s AS (SELECT CAST(sum($pairTerms) AS BIGINT) AS jt2, $ts FROM cum)
        |SELECT jt2, CAST(($maxTerms) * 2 AS BIGINT) AS jt2_max,
        |       CAST(jt2 * 1000000 // (($maxTerms) * 2) AS BIGINT) AS jt_ppm
        |FROM s""".stripMargin
    },

    "q520_temperature_sweep" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
        |           FROM documents GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM documents),
        |tt AS (SELECT CAST(t AS BIGINT) AS t FROM (SELECT unnest([1, 2, 4]) AS t)),
        |w AS (SELECT tt.t,
        |             CAST(round(exp(CAST(CAST(round(ln(CAST(ns AS DOUBLE) / nt)
        |                 * 1000000) AS BIGINT) // tt.t AS DOUBLE) / 1000000)
        |               * 1000000) AS BIGINT) AS w
        |      FROM s, nt, tt),
        |a AS (SELECT t, CAST(count(*) AS BIGINT) AS n_sources,
        |             CAST(sum(w) AS BIGINT) AS sw, CAST(sum(w * w) AS BIGINT) AS sww,
        |             CAST(max(w) AS BIGINT) AS wmax
        |      FROM w GROUP BY 1)
        |SELECT t, n_sources,
        |       CAST(1000 * CAST(sw AS HUGEINT) * sw // sww AS BIGINT) AS n_eff_milli,
        |       CAST(wmax * 1000000 // sw AS BIGINT) AS top_share_ppm
        |FROM a ORDER BY t""".stripMargin,

    "q521_friedman_w" ->
      """WITH mp AS (SELECT date_trunc('month', o_orderdate) AS m,
        |                  CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                    AS BIGINT) AS rev
        |            FROM orders GROUP BY 1, 2),
        |grid AS (SELECT mm.m, gg.g, coalesce(mp.rev, 0) AS rev
        |         FROM (SELECT DISTINCT m FROM mp) mm
        |         CROSS JOIN (SELECT CAST(g AS BIGINT) AS g
        |                     FROM (SELECT unnest(range(1, 6)) AS g)) gg
        |         LEFT JOIN mp ON mp.m = mm.m AND mp.g = gg.g),
        |rk AS (SELECT m, g,
        |              CAST(row_number() OVER (PARTITION BY m
        |                ORDER BY rev DESC, g) AS BIGINT) AS r
        |       FROM grid),
        |rg AS (SELECT g, CAST(sum(r) AS BIGINT) AS rg, CAST(count(*) AS BIGINT) AS n
        |       FROM rk GROUP BY 1),
        |s AS (SELECT CAST(max(n) AS BIGINT) AS n_blocks,
        |             CAST(sum(rg * rg) AS BIGINT) AS srr FROM rg)
        |SELECT n_blocks,
        |       CAST(12 * srr * 1000000 // (n_blocks * 5 * 6)
        |            - 3 * n_blocks * 6 * 1000000 AS BIGINT) AS chi2_micro,
        |       CAST((12 * srr * 1000000 // (n_blocks * 5 * 6)
        |             - 3 * n_blocks * 6 * 1000000) // (n_blocks * 4)
        |         AS BIGINT) AS w_ppm
        |FROM s""".stripMargin,

    "q522_tail_dependence" ->
      """WITH qty AS (SELECT l_orderkey,
        |                    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS y
        |             FROM lineitem GROUP BY 1),
        |xy AS (SELECT o.o_orderkey AS k,
        |              CAST(round(o.o_totalprice * 100) AS BIGINT) AS x, qty.y
        |       FROM orders o JOIN qty ON o.o_orderkey = qty.l_orderkey),
        |r AS (SELECT k, CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS rx,
        |             CAST(row_number() OVER (ORDER BY y, k) AS BIGINT) AS ry
        |      FROM xy),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
        |qq AS (SELECT CAST(q_mille AS BIGINT) AS q_mille
        |       FROM (SELECT unnest([900, 950, 990]) AS q_mille)),
        |a AS (SELECT qq.q_mille, nn.n AS n_orders,
        |             CAST(sum(CASE WHEN r.rx > nn.n * qq.q_mille // 1000
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed_x,
        |             CAST(sum(CASE WHEN r.rx > nn.n * qq.q_mille // 1000
        |                            AND r.ry > nn.n * qq.q_mille // 1000
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_joint
        |      FROM r, nn, qq GROUP BY 1, 2)
        |SELECT q_mille, n_orders, n_exceed_x, n_joint,
        |       CAST(n_joint * 1000000 // n_exceed_x AS BIGINT) AS lambda_ppm
        |FROM a ORDER BY q_mille""".stripMargin,

    "q523_weighted_kappa" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars,
        |         CAST(len(list_filter(string_split(text, ' '),
        |           x -> length(x) > 0)) AS BIGINT) AS nw
        |  FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT doc_id,
        |         CAST(ntile(5) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS ra,
        |         CAST(ntile(5) OVER (ORDER BY nw, doc_id) AS BIGINT) AS rb
        |  FROM base
        |), conf AS (SELECT ra, rb, CAST(count(*) AS BIGINT) AS o FROM r GROUP BY 1, 2),
        |num AS (SELECT CAST(sum(abs(ra - rb) * o) AS BIGINT) AS wo,
        |               CAST(sum(o) AS BIGINT) AS n FROM conf),
        |ri AS (SELECT ra, CAST(count(*) AS BIGINT) AS r_i FROM r GROUP BY 1),
        |cj AS (SELECT rb, CAST(count(*) AS BIGINT) AS c_j FROM r GROUP BY 1),
        |den AS (SELECT CAST(sum(abs(ra - rb) * r_i * c_j) AS BIGINT) AS wrc
        |        FROM ri, cj)
        |SELECT n AS n_docs, wo AS weighted_disagreement,
        |       CAST(1000000 - CAST(n AS HUGEINT) * wo * 1000000 // wrc AS BIGINT)
        |         AS kappa_w_ppm
        |FROM num, den""".stripMargin,

    "q524_wilcoxon_signed_rank" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CASE WHEN year(o_orderdate) = 1997
        |               THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS r97,
        |         CAST(sum(CASE WHEN year(o_orderdate) = 1998
        |               THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS r98
        |  FROM orders WHERE year(o_orderdate) IN (1997, 1998)
        |  GROUP BY 1
        |), d AS (SELECT r98 - r97 AS d FROM per
        |         WHERE r97 > 0 AND r98 > 0 AND r97 <> r98),
        |vg AS (SELECT abs(d) AS a, CAST(count(*) AS BIGINT) AS cnt,
        |              CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |       FROM d GROUP BY 1),
        |vc AS (SELECT a, cnt, pos,
        |              CAST(coalesce(sum(cnt) OVER (ORDER BY a
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |                AS BIGINT) AS cb
        |       FROM vg),
        |s AS (SELECT CAST(sum(pos * (2 * cb + cnt + 1)) AS BIGINT) AS w2,
        |             CAST(sum(cnt) AS BIGINT) AS n,
        |             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
        |      FROM vc),
        |f AS (SELECT n AS n_pairs, w2 AS w2_plus, 2 * w2 - n * (n + 1) AS num4,
        |             2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - ties AS var48
        |      FROM s),
        |z AS (SELECT n_pairs, w2_plus, num4,
        |             CAST(3 * CAST(num4 AS HUGEINT) * num4 * 1000000 // var48
        |               AS BIGINT) AS z2
        |      FROM f),
        |t AS (SELECT n_pairs, w2_plus, num4, z2,
        |             CAST(floor(sqrt(CAST(z2 AS DOUBLE))) AS BIGINT) AS t0 FROM z),
        |t2 AS (SELECT n_pairs, w2_plus, num4, z2,
        |              CASE WHEN t0 > 0 THEN (t0 + z2 // t0) // 2 ELSE 0 END AS t1
        |       FROM t)
        |SELECT n_pairs, w2_plus,
        |       CAST((CASE WHEN num4 >= 0 THEN 1 ELSE -1 END)
        |            * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2 THEN t1 + 1
        |                    WHEN t1 * t1 > z2 THEN t1 - 1 ELSE t1 END)
        |         AS BIGINT) AS z_milli
        |FROM t2""".stripMargin,

    "q525_page_trend" ->
      """WITH mp AS (SELECT date_trunc('month', o_orderdate) AS m,
        |                  CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                    AS BIGINT) AS rev
        |            FROM orders GROUP BY 1, 2),
        |grid AS (SELECT mm.m, gg.g, coalesce(mp.rev, 0) AS rev
        |         FROM (SELECT DISTINCT m FROM mp) mm
        |         CROSS JOIN (SELECT CAST(g AS BIGINT) AS g
        |                     FROM (SELECT unnest(range(1, 6)) AS g)) gg
        |         LEFT JOIN mp ON mp.m = mm.m AND mp.g = gg.g),
        |rk AS (SELECT m, g,
        |              CAST(row_number() OVER (PARTITION BY m
        |                ORDER BY rev DESC, g) AS BIGINT) AS r
        |       FROM grid),
        |rg AS (SELECT g, CAST(sum(r) AS BIGINT) AS rg, CAST(count(*) AS BIGINT) AS n
        |       FROM rk GROUP BY 1),
        |s AS (SELECT CAST(max(n) AS BIGINT) AS n_blocks,
        |             CAST(sum(g * rg) AS BIGINT) AS l_stat FROM rg),
        |q AS (SELECT n_blocks, l_stat, n_blocks * 1000000 AS nq FROM s),
        |t AS (SELECT n_blocks, l_stat, nq,
        |             CAST(floor(sqrt(CAST(nq AS DOUBLE))) AS BIGINT) AS t0 FROM q),
        |t2 AS (SELECT n_blocks, l_stat, nq,
        |              CASE WHEN t0 > 0 THEN (t0 + nq // t0) // 2 ELSE 0 END AS t1
        |       FROM t)
        |SELECT n_blocks, l_stat,
        |       CAST((l_stat - 45 * n_blocks) * 1000000
        |            // (5 * (CASE WHEN (t1 + 1) * (t1 + 1) <= nq THEN t1 + 1
        |                          WHEN t1 * t1 > nq THEN t1 - 1 ELSE t1 END))
        |         AS BIGINT) AS z_milli
        |FROM t2""".stripMargin,

    "q526_cochran_armitage" ->
      """WITH ret AS (
        |  SELECT l_orderkey,
        |         CAST(max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS rf
        |  FROM lineitem GROUP BY 1
        |), g AS (
        |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
        |         CAST(count(*) AS BIGINT) AS ng, CAST(sum(rf) AS BIGINT) AS rg
        |  FROM orders o JOIN ret ON o.o_orderkey = ret.l_orderkey
        |  GROUP BY 1
        |), s AS (
        |  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(rg) AS BIGINT) AS r,
        |         CAST(sum(w * rg) AS BIGINT) AS swr,
        |         CAST(sum(w * ng) AS BIGINT) AS swn,
        |         CAST(sum(w * w * ng) AS BIGINT) AS swwn
        |  FROM g
        |), f AS (
        |  SELECT n AS n_orders, r AS n_returned,
        |         CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn AS tnum,
        |         CAST(r AS HUGEINT) * (n - r)
        |           * (CAST(n AS HUGEINT) * swwn - CAST(swn AS HUGEINT) * swn)
        |           AS tden
        |  FROM s
        |), z AS (SELECT n_orders, n_returned, tnum,
        |                CAST(tnum * tnum * n_orders * 1000000 // tden AS BIGINT) AS z2
        |         FROM f),
        |t AS (SELECT n_orders, n_returned, tnum, z2,
        |             CAST(floor(sqrt(CAST(z2 AS DOUBLE))) AS BIGINT) AS t0 FROM z),
        |t2 AS (SELECT n_orders, n_returned, tnum, z2,
        |              CASE WHEN t0 > 0 THEN (t0 + z2 // t0) // 2 ELSE 0 END AS t1
        |       FROM t)
        |SELECT n_orders, n_returned,
        |       CAST((CASE WHEN tnum >= 0 THEN 1 ELSE -1 END)
        |            * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2 THEN t1 + 1
        |                    WHEN t1 * t1 > z2 THEN t1 - 1 ELSE t1 END)
        |         AS BIGINT) AS z_milli
        |FROM t2""".stripMargin,

    "q527_jarque_bera" ->
      """WITH x AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 10000 AS x
        |           FROM orders),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s1,
        |             sum(CAST(x AS HUGEINT) * x) AS s2,
        |             sum(CAST(x AS HUGEINT) * x * x) AS s3,
        |             sum(CAST(x AS HUGEINT) * x * x * x) AS s4
        |      FROM x),
        |m AS (SELECT n,
        |             CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS m2,
        |             CAST(n AS HUGEINT) * n * s3
        |               - 3 * CAST(n AS HUGEINT) * s1 * s2
        |               + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS m3,
        |             CAST(n AS HUGEINT) * n * n * s4
        |               - 4 * CAST(n AS HUGEINT) * n * s1 * s3
        |               + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
        |               - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1 AS m4
        |      FROM s),
        |k AS (SELECT n AS n_orders,
        |             CAST(round(CAST(m3 AS DOUBLE)
        |               / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))) * 1000)
        |               AS BIGINT) AS skew_milli,
        |             CAST(round((CAST(m4 AS DOUBLE)
        |               / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3) * 1000)
        |               AS BIGINT) AS kurt_excess_milli
        |      FROM m)
        |SELECT n_orders, skew_milli, kurt_excess_milli,
        |       CAST((4 * n_orders * skew_milli * skew_milli
        |             + n_orders * kurt_excess_milli * kurt_excess_milli)
        |            // 24000 AS BIGINT) AS jb_milli
        |FROM k""".stripMargin,

    "q528_best_of_n" ->
      """WITH vg AS (
        |  SELECT n_chars AS q, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1
        |), c AS (
        |  SELECT q, cnt,
        |         CAST(coalesce(sum(cnt) OVER (ORDER BY q
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS fp
        |  FROM vg
        |), c2 AS (SELECT q, cnt, fp, fp + cnt AS f,
        |                 CAST(sum(cnt) OVER () AS BIGINT) AS nn FROM c),
        |c3 AS (SELECT q, cnt, nn,
        |              10000 * CAST(f AS HUGEINT) // nn AS g,
        |              10000 * CAST(fp AS HUGEINT) // nn AS gp
        |       FROM c2),
        |a AS (
        |  SELECT CAST(max(nn) AS BIGINT) AS nn,
        |         CAST(sum(q * cnt) AS BIGINT) AS e1n,
        |         sum(q * (CAST(g AS HUGEINT) * g - CAST(gp AS HUGEINT) * gp)) AS e2n,
        |         sum(q * (CAST(g AS HUGEINT) * g * g * g
        |                  - CAST(gp AS HUGEINT) * gp * gp * gp)) AS e4n,
        |         sum(q * (CAST(g AS HUGEINT) * g * g * g * g * g * g * g
        |                  - CAST(gp AS HUGEINT) * gp * gp * gp * gp * gp * gp * gp))
        |           AS e8n
        |  FROM c3
        |)
        |SELECT CAST(1 AS BIGINT) AS n_draws,
        |       CAST(1000 * CAST(e1n AS HUGEINT) // nn AS BIGINT) AS e_max_milli
        |FROM a
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |       CAST(1000 * e2n // CAST(100000000 AS HUGEINT) AS BIGINT) FROM a
        |UNION ALL
        |SELECT CAST(4 AS BIGINT),
        |       CAST(1000 * e4n // CAST(10000000000000000 AS HUGEINT) AS BIGINT)
        |FROM a
        |UNION ALL
        |SELECT CAST(8 AS BIGINT),
        |       CAST(1000 * (e8n // CAST(100000000000000000000 AS HUGEINT))
        |            // 1000000000000 AS BIGINT)
        |FROM a
        |ORDER BY n_draws""".stripMargin,

    "q529_queueing_delay" ->
      """WITH e AS (SELECT event_type, event_id,
        |                  epoch_us(date_trunc('microseconds', ts)) AS us
        |           FROM events),
        |r AS (SELECT event_type, us,
        |             CAST(row_number() OVER (PARTITION BY event_type
        |               ORDER BY us, event_id) AS BIGINT) AS i
        |      FROM e),
        |svc AS (SELECT event_type,
        |               CAST(((max(us) - min(us)) * 4 // 5) // count(*) AS BIGINT) AS svc
        |        FROM r GROUP BY 1),
        |c AS (SELECT r.event_type, r.i, svc.svc, r.i * svc.svc - r.us AS c
        |      FROM r JOIN svc USING (event_type)),
        |d AS (SELECT event_type, svc,
        |             greatest(0, c - coalesce(min(c) OVER (PARTITION BY event_type
        |               ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               c)) AS wdelay
        |      FROM c)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(max(svc) AS BIGINT) AS svc_us,
        |       CAST(sum(wdelay) // count(*) AS BIGINT) AS mean_delay_us,
        |       CAST(max(wdelay) AS BIGINT) AS max_delay_us,
        |       CAST(sum(CASE WHEN wdelay > 0 THEN 1 ELSE 0 END) * 1000000
        |            // count(*) AS BIGINT) AS wait_share_ppm
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q530_histogram_error" ->
      """WITH x AS (SELECT o_orderkey AS k,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders),
        |mm AS (SELECT CAST(min(x) AS BIGINT) AS mn,
        |              CAST(max(x) - min(x) + 1 AS BIGINT) AS span,
        |              CAST(count(*) AS BIGINT) AS n FROM x),
        |rg AS (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
        |       FROM (VALUES (10, 35), (20, 60), (50, 55), (80, 99), (0, 50))
        |            AS t(a, b)),
        |xr AS (SELECT x.x, mm.mn, mm.span, mm.n,
        |              (x.x - mm.mn) * 16 // mm.span AS wb,
        |              CAST(row_number() OVER (ORDER BY x.x, x.k) AS BIGINT) AS rk
        |       FROM x, mm),
        |xr2 AS (SELECT x, mn, span, n, wb, (rk - 1) * 16 // n AS db FROM xr),
        |exact AS (SELECT rg.a, rg.b,
        |                 CAST(sum(CASE WHEN xr2.x >= xr2.mn + xr2.span * rg.a // 100
        |                                AND xr2.x < xr2.mn + xr2.span * rg.b // 100
        |                               THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
        |          FROM xr2, rg GROUP BY 1, 2),
        |wbuck AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
        |                 mn + span * wb // 16 AS lo,
        |                 mn + span * (wb + 1) // 16 AS hi
        |          FROM xr2 GROUP BY wb, mn, span),
        |dbuck AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
        |                 CAST(min(x) AS BIGINT) AS lo,
        |                 CAST(max(x) + 1 AS BIGINT) AS hi
        |          FROM xr2 GROUP BY db),
        |ew AS (SELECT rg.a, rg.b,
        |              CAST(sum(wbuck.cnt * greatest(0,
        |                least(wbuck.hi, mm.mn + mm.span * rg.b // 100)
        |                - greatest(wbuck.lo, mm.mn + mm.span * rg.a // 100))
        |                // greatest(wbuck.hi - wbuck.lo, 1)) AS BIGINT) AS est_width
        |       FROM wbuck, rg, mm GROUP BY 1, 2),
        |ed AS (SELECT rg.a, rg.b,
        |              CAST(sum(dbuck.cnt * greatest(0,
        |                least(dbuck.hi, mm.mn + mm.span * rg.b // 100)
        |                - greatest(dbuck.lo, mm.mn + mm.span * rg.a // 100))
        |                // greatest(dbuck.hi - dbuck.lo, 1)) AS BIGINT) AS est_depth
        |       FROM dbuck, rg, mm GROUP BY 1, 2)
        |SELECT exact.a AS range_lo_pct, exact.b AS range_hi_pct, n_exact,
        |       est_width, est_depth,
        |       CAST(abs(est_width - n_exact) * 1000000
        |            // greatest(n_exact, 1) AS BIGINT) AS err_width_ppm,
        |       CAST(abs(est_depth - n_exact) * 1000000
        |            // greatest(n_exact, 1) AS BIGINT) AS err_depth_ppm
        |FROM exact JOIN ew ON exact.a = ew.a AND exact.b = ew.b
        |           JOIN ed ON exact.a = ed.a AND exact.b = ed.b
        |ORDER BY 1, 2""".stripMargin,

    "q531_learned_index" ->
      """WITH xr AS (SELECT x, CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS y
        |            FROM (SELECT o_orderkey AS k,
        |                         CAST(round(o_totalprice * 100) AS BIGINT) AS x
        |                  FROM orders)),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |              CAST(sum(y) AS BIGINT) AS sy,
        |              sum(CAST(x AS HUGEINT) * y) AS sxy,
        |              sum(CAST(x AS HUGEINT) * x) AS sxx
        |       FROM xr),
        |co AS (SELECT n, sx, sy,
        |              CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS bnum,
        |              CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS d
        |       FROM st),
        |e AS (SELECT co.n, co.bnum, co.d,
        |             abs(CAST(co.n AS HUGEINT) * co.d * xr.y
        |                 - (co.d * co.sy + co.n * co.bnum * xr.x
        |                    - co.bnum * co.sx)) AS e
        |      FROM xr, co),
        |a AS (SELECT n, bnum, d, max(e) AS emax, sum(e) AS esum
        |      FROM e GROUP BY 1, 2, 3)
        |SELECT CAST(n AS BIGINT) AS n_keys,
        |       CAST(bnum * 1000000000 // d AS BIGINT) AS slope_ppb,
        |       CAST(emax // (CAST(n AS HUGEINT) * d) AS BIGINT) AS eps_rows,
        |       CAST(1000 * (esum // (CAST(n AS HUGEINT) * d)) // n AS BIGINT)
        |         AS mean_abs_err_milli
        |FROM a""".stripMargin,

    "q532_cache_ttl" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |                  epoch_us(date_trunc('microseconds', ts)) AS us
        |           FROM events),
        |g AS (SELECT us - lag(us) OVER (PARTITION BY user_id, event_type
        |        ORDER BY us, event_id) AS gap FROM e),
        |t AS (SELECT CAST(ttl_s AS BIGINT) AS ttl_s
        |      FROM (SELECT unnest([60, 600, 3600]) AS ttl_s)),
        |a AS (SELECT t.ttl_s, CAST(count(*) AS BIGINT) AS n_requests,
        |             CAST(sum(CASE WHEN g.gap IS NOT NULL THEN 1 ELSE 0 END)
        |               AS BIGINT) AS n_repeats,
        |             CAST(sum(CASE WHEN g.gap <= t.ttl_s * 1000000
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        |      FROM g, t GROUP BY 1)
        |SELECT ttl_s, n_requests, n_repeats, n_hits,
        |       CAST(n_hits * 1000000 // n_requests AS BIGINT) AS hit_ppm
        |FROM a ORDER BY ttl_s""".stripMargin,

    "q533_median_of_means" ->
      """WITH b AS (SELECT CAST(concat('0x',
        |             substr(md5('mom#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |             AS BIGINT) % 16 AS bkt, n_chars
        |           FROM documents WHERE text IS NOT NULL),
        |m AS (SELECT bkt, CAST(count(*) AS BIGINT) AS nb,
        |             CAST(sum(n_chars) AS BIGINT) AS sb FROM b GROUP BY 1),
        |m2 AS (SELECT 1000 * sb // nb AS m_milli, nb, sb,
        |              CAST(row_number() OVER (ORDER BY 1000 * sb // nb, nb)
        |                AS BIGINT) AS rk
        |       FROM m),
        |a AS (SELECT CAST(sum(sb) AS BIGINT) AS stot, CAST(sum(nb) AS BIGINT) AS ntot,
        |             CAST(sum(CASE WHEN rk = 8 THEN m_milli ELSE 0 END) AS BIGINT) AS m8,
        |             CAST(sum(CASE WHEN rk = 9 THEN m_milli ELSE 0 END) AS BIGINT) AS m9,
        |             CAST(sum(m_milli) AS BIGINT) AS msum,
        |             CAST(max(m_milli) AS BIGINT) AS mmax,
        |             CAST(min(m_milli) AS BIGINT) AS mmin
        |      FROM m2)
        |SELECT ntot AS n_docs, CAST(1000 * stot // ntot AS BIGINT) AS mean_milli,
        |       CAST((m8 + m9) // 2 AS BIGINT) AS mom_milli,
        |       CAST((msum - mmax - mmin) // 14 AS BIGINT) AS trimmed_milli
        |FROM a""".stripMargin,

    "q534_join_order_costs" ->
      """WITH st AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS no,
        |         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS doc,
        |         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS nc,
        |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS nl,
        |         (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS dlo
        |), act AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |          JOIN customer c ON o.o_custkey = c.c_custkey) AS a_co,
        |         (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |          JOIN lineitem l ON o.o_orderkey = l.l_orderkey) AS a_ol,
        |         (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |          JOIN customer c ON o.o_custkey = c.c_custkey
        |          JOIN lineitem l ON o.o_orderkey = l.l_orderkey) AS a_col
        |)
        |SELECT '1_co_then_l' AS plan,
        |       CAST(CAST(nc AS HUGEINT) * no // greatest(nc, doc)
        |            + (CAST(nc AS HUGEINT) * no // greatest(nc, doc)) * nl
        |              // greatest(no, dlo) AS BIGINT) AS est_cost,
        |       CAST(a_co + a_col AS BIGINT) AS actual_cost
        |FROM st, act
        |UNION ALL
        |SELECT '2_ol_then_c',
        |       CAST(CAST(no AS HUGEINT) * nl // greatest(no, dlo)
        |            + (CAST(no AS HUGEINT) * nl // greatest(no, dlo)) * nc
        |              // greatest(doc, nc) AS BIGINT),
        |       CAST(a_ol + a_col AS BIGINT)
        |FROM st, act
        |UNION ALL
        |SELECT '3_cl_cross_then_o',
        |       CAST(CAST(nc AS HUGEINT) * nl
        |            + (CAST(nc AS HUGEINT) * nl) * no // greatest(no, dlo)
        |         AS BIGINT),
        |       CAST(CAST(nc AS HUGEINT) * nl + a_col AS BIGINT)
        |FROM st, act
        |ORDER BY plan""".stripMargin,

    "q535_load_shedding" ->
      """WITH arr AS (
        |  SELECT epoch_us(date_trunc('microseconds', ts)) // 1000000 AS sec,
        |         event_type,
        |         CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2
        |              WHEN 'click' THEN 3 WHEN 'view' THEN 4 ELSE 5 END AS p,
        |         CAST(count(*) AS BIGINT) AS arr
        |  FROM events GROUP BY 1, 2, 3
        |), cap AS (SELECT CAST(sum(arr) // count(DISTINCT sec) + 1 AS BIGINT) AS cap
        |           FROM arr),
        |k AS (SELECT a.event_type, a.p, a.arr,
        |             greatest(0, least(a.arr, cap.cap
        |               - coalesce(sum(a.arr) OVER (PARTITION BY a.sec ORDER BY a.p
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
        |               AS kept
        |      FROM arr a, cap)
        |SELECT event_type, CAST(p AS BIGINT) AS priority_rank,
        |       CAST(sum(arr) AS BIGINT) AS n_arrivals,
        |       CAST(sum(kept) AS BIGINT) AS n_kept,
        |       CAST((sum(arr) - sum(kept)) * 1000000 // sum(arr) AS BIGINT)
        |         AS shed_ppm
        |FROM k GROUP BY 1, 2 ORDER BY priority_rank""".stripMargin,

    "q536_shapley_attribution" ->
      """WITH u AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
        |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS g,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT c, v, g, CAST(sum(conv) * 1000000 // count(*) AS BIGINT) AS r
        |  FROM u GROUP BY 1, 2, 3
        |), w AS (
        |  SELECT
        |    CAST(sum(CASE WHEN c=0 AND v=0 AND g=0 THEN r ELSE 0 END) AS BIGINT) AS r000,
        |    CAST(sum(CASE WHEN c=0 AND v=0 AND g=1 THEN r ELSE 0 END) AS BIGINT) AS r001,
        |    CAST(sum(CASE WHEN c=0 AND v=1 AND g=0 THEN r ELSE 0 END) AS BIGINT) AS r010,
        |    CAST(sum(CASE WHEN c=0 AND v=1 AND g=1 THEN r ELSE 0 END) AS BIGINT) AS r011,
        |    CAST(sum(CASE WHEN c=1 AND v=0 AND g=0 THEN r ELSE 0 END) AS BIGINT) AS r100,
        |    CAST(sum(CASE WHEN c=1 AND v=0 AND g=1 THEN r ELSE 0 END) AS BIGINT) AS r101,
        |    CAST(sum(CASE WHEN c=1 AND v=1 AND g=0 THEN r ELSE 0 END) AS BIGINT) AS r110,
        |    CAST(sum(CASE WHEN c=1 AND v=1 AND g=1 THEN r ELSE 0 END) AS BIGINT) AS r111
        |  FROM r
        |)
        |SELECT 'click' AS channel,
        |       CAST(2*(r100 - r000) + (r110 - r010) + (r101 - r001)
        |            + 2*(r111 - r011) AS BIGINT) AS phi6_ppm,
        |       CAST((2*(r100 - r000) + (r110 - r010) + (r101 - r001)
        |             + 2*(r111 - r011)) // 6 AS BIGINT) AS phi_ppm
        |FROM w
        |UNION ALL
        |SELECT 'signup',
        |       CAST(2*(r001 - r000) + (r101 - r100) + (r011 - r010)
        |            + 2*(r111 - r110) AS BIGINT),
        |       CAST((2*(r001 - r000) + (r101 - r100) + (r011 - r010)
        |             + 2*(r111 - r110)) // 6 AS BIGINT)
        |FROM w
        |UNION ALL
        |SELECT 'view',
        |       CAST(2*(r010 - r000) + (r110 - r100) + (r011 - r001)
        |            + 2*(r111 - r101) AS BIGINT),
        |       CAST((2*(r010 - r000) + (r110 - r100) + (r011 - r001)
        |             + 2*(r111 - r101)) // 6 AS BIGINT)
        |FROM w
        |ORDER BY channel""".stripMargin,

    "q537_forecast_reconciliation" ->
      """WITH mr AS (
        |  SELECT r.r_name, date_trunc('month', o.o_orderdate) AS m,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2
        |), mx AS (SELECT max(m) AS mx FROM mr),
        |bu AS (SELECT r_name, rev AS bu_cents FROM mr CROSS JOIN mx WHERE m = mx),
        |tot AS (SELECT CAST(sum(bu_cents) AS BIGINT) AS tot_last FROM bu),
        |rt AS (SELECT CAST(sum(rev) AS BIGINT) AS rev_tot FROM mr),
        |share AS (SELECT mr.r_name,
        |                 CAST(CAST(sum(rev) AS HUGEINT) * 1000000 // max(rt.rev_tot)
        |                   AS BIGINT) AS share_ppm
        |          FROM mr CROSS JOIN rt GROUP BY 1)
        |SELECT bu.r_name, bu.bu_cents,
        |       CAST(tot.tot_last * share.share_ppm // 1000000 AS BIGINT) AS td_cents,
        |       CAST(abs(bu.bu_cents - tot.tot_last * share.share_ppm // 1000000)
        |            * 1000000 // greatest(bu.bu_cents, 1) AS BIGINT) AS gap_ppm
        |FROM bu JOIN share ON bu.r_name = share.r_name CROSS JOIN tot
        |ORDER BY bu.r_name""".stripMargin,

    "q538_epoch_shuffle" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id,
        |             CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS r0,
        |             CAST(row_number() OVER (ORDER BY CAST(concat('0x',
        |               substr(md5('ep#1#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |               AS BIGINT), doc_id) AS BIGINT) AS r1,
        |             CAST(row_number() OVER (ORDER BY CAST(concat('0x',
        |               substr(md5('ep#2#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |               AS BIGINT), doc_id) AS BIGINT) AS r2
        |      FROM base),
        |a AS (SELECT 'epoch1_vs_epoch2' AS pair, CAST(count(*) AS BIGINT) AS n_docs,
        |             sum(CAST(r1 - r2 AS HUGEINT) * (r1 - r2)) AS sd2 FROM r
        |      UNION ALL
        |      SELECT 'corpus_vs_epoch1', CAST(count(*) AS BIGINT),
        |             sum(CAST(r0 - r1 AS HUGEINT) * (r0 - r1)) FROM r)
        |SELECT pair, n_docs,
        |       CAST(1000000 - 6 * sd2 * 1000000
        |            // (CAST(n_docs AS HUGEINT)
        |               * (CAST(n_docs AS HUGEINT) * n_docs - 1)) AS BIGINT) AS rho_ppm
        |FROM a ORDER BY pair""".stripMargin,

    "q539_cramer_von_mises" ->
      """WITH seg AS (SELECT c_custkey,
        |                    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ga
        |             FROM customer
        |             WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |j AS (SELECT seg.ga, CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        |      FROM orders o JOIN seg ON o.o_custkey = seg.c_custkey),
        |vg AS (SELECT v, CAST(sum(ga) AS BIGINT) AS na,
        |              CAST(sum(1 - ga) AS BIGINT) AS nb FROM j GROUP BY 1),
        |cum AS (SELECT v, na, nb,
        |               CAST(coalesce(sum(na + nb) OVER wb, 0) AS BIGINT) AS cb,
        |               CAST(coalesce(sum(na) OVER wb, 0) AS BIGINT) AS ca,
        |               CAST(coalesce(sum(nb) OVER wb, 0) AS BIGINT) AS cb2
        |        FROM vg
        |        WINDOW wb AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |c2 AS (SELECT na, nb, ca, cb2, 2 * cb + na + nb + 1 AS cblk FROM cum),
        |s AS (SELECT CAST(sum(na) AS BIGINT) AS n, CAST(sum(nb) AS BIGINT) AS m,
        |             sum(CASE WHEN na > 0 THEN
        |                   3 * na * CAST((cblk - 2 * ca) AS HUGEINT) * (cblk - 2 * ca)
        |                   - 6 * CAST((cblk - 2 * ca) AS HUGEINT) * na * (na + 1)
        |                   + 2 * CAST(na AS HUGEINT) * (na + 1) * (2 * na + 1)
        |                 ELSE 0 END) AS sa12,
        |             sum(CASE WHEN nb > 0 THEN
        |                   3 * nb * CAST((cblk - 2 * cb2) AS HUGEINT) * (cblk - 2 * cb2)
        |                   - 6 * CAST((cblk - 2 * cb2) AS HUGEINT) * nb * (nb + 1)
        |                   + 2 * CAST(nb AS HUGEINT) * (nb + 1) * (2 * nb + 1)
        |                 ELSE 0 END) AS sb12
        |      FROM c2)
        |SELECT n AS n_building, m AS n_machinery,
        |       CAST((6 * (CAST(n AS HUGEINT) * sa12 + CAST(m AS HUGEINT) * sb12)
        |             - 12 * CAST(n AS HUGEINT) * m
        |               * (4 * CAST(n AS HUGEINT) * m - 1)) * 1000000
        |            // (72 * CAST(n AS HUGEINT) * m * (n + m)) AS BIGINT) AS t_micro
        |FROM s""".stripMargin,

    "q540_enrichment_test" ->
      s"""$minhashCte,
         |d AS (SELECT doc_id, n_chars FROM documents WHERE text IS NOT NULL),
         |vgm AS (SELECT n_chars AS q, CAST(count(*) AS BIGINT) AS cnt
         |        FROM d GROUP BY 1),
         |vcm AS (SELECT q, cnt,
         |               CAST(coalesce(sum(cnt) OVER (ORDER BY q
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                 AS BIGINT) AS cb
         |        FROM vgm),
         |nn0 AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM d),
         |med AS (SELECT q AS med FROM vcm, nn0
         |        WHERE cb < (nn + 1) // 2 AND cb + cnt >= (nn + 1) // 2),
         |dup AS (SELECT DISTINCT doc_id FROM (
         |          SELECT doc_a AS doc_id FROM cand
         |          UNION ALL SELECT doc_b FROM cand)),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS nn,
         |               CAST(sum(CASE WHEN d.n_chars >= med.med THEN 1 ELSE 0 END)
         |                 AS BIGINT) AS kk,
         |               CAST(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |                 AS BIGINT) AS nd,
         |               CAST(sum(CASE WHEN d.n_chars >= med.med
         |                              AND dup.doc_id IS NOT NULL
         |                             THEN 1 ELSE 0 END) AS BIGINT) AS k
         |        FROM d CROSS JOIN med LEFT JOIN dup ON d.doc_id = dup.doc_id),
         |f AS (SELECT nn, kk, nd, k,
         |             CAST(k * nn * 1000000 // greatest(nd * kk, 1) AS BIGINT)
         |               AS fold_ppm,
         |             CAST((CAST(k AS HUGEINT) * nn - CAST(nd AS HUGEINT) * kk)
         |                  * (CAST(k AS HUGEINT) * nn - CAST(nd AS HUGEINT) * kk)
         |                  * (nn - 1) * 1000000
         |                  // greatest(CAST(nd AS HUGEINT) * kk * (nn - kk)
         |                     * (nn - nd), 1) AS BIGINT) AS z2
         |      FROM agg),
         |t AS (SELECT nn, kk, nd, k, fold_ppm, z2,
         |             CAST(floor(sqrt(CAST(z2 AS DOUBLE))) AS BIGINT) AS t0 FROM f),
         |t2 AS (SELECT nn, kk, nd, k, fold_ppm, z2,
         |              CASE WHEN t0 > 0 THEN (t0 + z2 // t0) // 2 ELSE 0 END AS t1
         |       FROM t)
         |SELECT nn AS n_docs, kk AS n_long, nd AS n_dup, k AS n_overlap, fold_ppm,
         |       CAST((CASE WHEN fold_ppm >= 1000000 THEN 1 ELSE -1 END)
         |            * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2 THEN t1 + 1
         |                    WHEN t1 * t1 > z2 THEN t1 - 1 ELSE t1 END)
         |         AS BIGINT) AS z_milli
         |FROM t2""".stripMargin,

    "q541_bradley_terry" ->
      """WITH mr AS (
        |  SELECT r.r_name, date_trunc('month', o.o_orderdate) AS m,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2
        |), grid AS (
        |  SELECT mm.m, rr.r_name, coalesce(mr.rev, 0) AS rev
        |  FROM (SELECT DISTINCT m FROM mr) mm
        |  CROSS JOIN (SELECT DISTINCT r_name FROM mr) rr
        |  LEFT JOIN mr ON mr.m = mm.m AND mr.r_name = rr.r_name
        |), duels AS (
        |  SELECT a.r_name AS ra, b.r_name AS rb,
        |         CAST(sum(CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END) AS BIGINT) AS w,
        |         CAST(count(*) AS BIGINT) AS ngames
        |  FROM grid a JOIN grid b ON a.m = b.m AND a.r_name <> b.r_name
        |  GROUP BY 1, 2
        |), wins AS (SELECT ra, CAST(sum(w) AS BIGINT) AS wi FROM duels GROUP BY 1),
        |p0 AS (SELECT ra AS r_name, CAST(1000000 AS BIGINT) AS p FROM wins),
        |den1 AS (SELECT d.ra,
        |                CAST(sum(d.ngames * 1000000 // (pa.p + pb.p)) AS BIGINT) AS den
        |         FROM duels d JOIN p0 pa ON d.ra = pa.r_name
        |                      JOIN p0 pb ON d.rb = pb.r_name
        |         GROUP BY 1),
        |raw1 AS (SELECT w.ra AS r_name,
        |                CAST(w.wi * 1000000 * 1000000 // greatest(d.den, 1)
        |                  AS BIGINT) AS praw
        |         FROM wins w JOIN den1 d ON w.ra = d.ra),
        |n1 AS (SELECT CAST(sum(praw) AS BIGINT) AS ptot,
        |              CAST(count(*) AS BIGINT) AS k FROM raw1),
        |p1 AS (SELECT r_name,
        |              CAST(CAST(praw AS HUGEINT) * k * 1000000 // ptot AS BIGINT) AS p
        |       FROM raw1, n1),
        |den2 AS (SELECT d.ra,
        |                CAST(sum(d.ngames * 1000000 // (pa.p + pb.p)) AS BIGINT) AS den
        |         FROM duels d JOIN p1 pa ON d.ra = pa.r_name
        |                      JOIN p1 pb ON d.rb = pb.r_name
        |         GROUP BY 1),
        |raw2 AS (SELECT w.ra AS r_name,
        |                CAST(w.wi * 1000000 * 1000000 // greatest(d.den, 1)
        |                  AS BIGINT) AS praw
        |         FROM wins w JOIN den2 d ON w.ra = d.ra),
        |n2 AS (SELECT CAST(sum(praw) AS BIGINT) AS ptot,
        |              CAST(count(*) AS BIGINT) AS k FROM raw2),
        |p2 AS (SELECT r_name,
        |              CAST(CAST(praw AS HUGEINT) * k * 1000000 // ptot AS BIGINT) AS p
        |       FROM raw2, n2)
        |SELECT w.ra AS r_name, w.wi AS n_wins, p2.p AS bt_score_micro
        |FROM wins w JOIN p2 ON w.ra = p2.r_name ORDER BY r_name""".stripMargin,

    "q542_power_mde" ->
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(n_chars) AS BIGINT) AS sx,
        |                  sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
        |           FROM documents WHERE text IS NOT NULL),
        |v AS (SELECT n, sx,
        |             CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vnum
        |      FROM s),
        |na AS (SELECT CAST(narm AS BIGINT) AS narm0
        |       FROM (SELECT unnest([1000, 10000, 0]) AS narm)),
        |g AS (SELECT v.n, v.sx, v.vnum,
        |             CASE WHEN narm0 = 0 THEN v.n ELSE narm0 END AS narm
        |      FROM v, na),
        |m AS (SELECT n, sx, narm,
        |             CAST(2 * 2802 * 2802 * vnum
        |                  // (CAST(n AS HUGEINT) * (n - 1) * narm) AS BIGINT) AS mde2
        |      FROM g),
        |t AS (SELECT n, sx, narm, mde2,
        |             CAST(floor(sqrt(CAST(mde2 AS DOUBLE))) AS BIGINT) AS t0 FROM m),
        |t2 AS (SELECT n, sx, narm, mde2,
        |              CASE WHEN t0 > 0 THEN (t0 + mde2 // t0) // 2 ELSE 0 END AS t1
        |       FROM t),
        |f AS (SELECT n, sx, narm AS n_per_arm,
        |             CASE WHEN (t1 + 1) * (t1 + 1) <= mde2 THEN t1 + 1
        |                  WHEN t1 * t1 > mde2 THEN t1 - 1 ELSE t1 END AS mde_milli
        |      FROM t2)
        |SELECT n_per_arm, CAST(mde_milli AS BIGINT) AS mde_milli,
        |       CAST(mde_milli * 1000 * n // sx AS BIGINT) AS mde_rel_ppm
        |FROM f ORDER BY n_per_arm""".stripMargin,

    "q543_davies_bouldin" ->
      s"""$ivfAssignCte,
         |qv AS (SELECT vec_id, bucket, CAST(i AS BIGINT) AS pos,
         |              CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
         |       FROM asg CROSS JOIN unnest(range(0, len(e))) AS u(i)),
         |cent AS (SELECT bucket, pos, CAST(sum(qv) // count(*) AS BIGINT) AS cq
         |         FROM qv GROUP BY 1, 2),
         |md AS (SELECT q.vec_id, q.bucket,
         |              CAST(sum((q.qv - c.cq) * (q.qv - c.cq)) AS BIGINT) AS d2
         |       FROM qv q JOIN cent c ON q.bucket = c.bucket AND q.pos = c.pos
         |       GROUP BY 1, 2),
         |md2 AS (SELECT bucket, d2,
         |               CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT) AS t0 FROM md),
         |md3 AS (SELECT bucket, d2,
         |               CASE WHEN t0 > 0 THEN (t0 + d2 // t0) // 2 ELSE 0 END AS t1
         |        FROM md2),
         |md4 AS (SELECT bucket,
         |               CASE WHEN (t1 + 1) * (t1 + 1) <= d2 THEN t1 + 1
         |                    WHEN t1 * t1 > d2 THEN t1 - 1 ELSE t1 END AS dist
         |        FROM md3),
         |si AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_members,
         |              CAST(sum(dist) // count(*) AS BIGINT) AS s_q
         |       FROM md4 GROUP BY 1),
         |cdp AS (SELECT a.bucket AS bi, b.bucket AS bj,
         |               CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS c2
         |        FROM cent a JOIN cent b ON a.pos = b.pos AND a.bucket <> b.bucket
         |        GROUP BY 1, 2),
         |cd2 AS (SELECT bi, bj, c2,
         |               CAST(floor(sqrt(CAST(c2 AS DOUBLE))) AS BIGINT) AS t0
         |        FROM cdp),
         |cd3 AS (SELECT bi, bj, c2,
         |               CASE WHEN t0 > 0 THEN (t0 + c2 // t0) // 2 ELSE 0 END AS t1
         |        FROM cd2),
         |cd4 AS (SELECT bi, bj,
         |               CASE WHEN (t1 + 1) * (t1 + 1) <= c2 THEN t1 + 1
         |                    WHEN t1 * t1 > c2 THEN t1 - 1 ELSE t1 END AS dc
         |        FROM cd3),
         |r AS (SELECT cd.bi,
         |             CAST(max((si1.s_q + si2.s_q) * 1000 // greatest(cd.dc, 1))
         |               AS BIGINT) AS r_milli
         |      FROM cd4 cd JOIN si si1 ON cd.bi = si1.bucket
         |                  JOIN si si2 ON cd.bj = si2.bucket
         |      GROUP BY 1),
         |db AS (SELECT CAST(sum(r_milli) // count(*) AS BIGINT) AS db_milli FROM r)
         |SELECT CAST(si.bucket AS BIGINT) AS bucket, si.n_members, si.s_q,
         |       r.r_milli, db.db_milli
         |FROM si JOIN r ON si.bucket = r.bi CROSS JOIN db
         |ORDER BY bucket""".stripMargin,

    "q544_cliffs_delta" ->
      """WITH seg AS (SELECT c_custkey,
        |                    CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END AS ga
        |             FROM customer
        |             WHERE c_mktsegment IN ('FURNITURE', 'HOUSEHOLD')),
        |j AS (SELECT seg.ga, CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        |      FROM orders o JOIN seg ON o.o_custkey = seg.c_custkey),
        |vg AS (SELECT v, CAST(sum(ga) AS BIGINT) AS na,
        |              CAST(sum(1 - ga) AS BIGINT) AS nb FROM j GROUP BY 1),
        |cum AS (SELECT na, nb,
        |               CAST(coalesce(sum(nb) OVER wb, 0) AS BIGINT) AS cb,
        |               CAST(coalesce(sum(na) OVER wb, 0) AS BIGINT) AS ca
        |        FROM vg
        |        WINDOW wb AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s AS (SELECT CAST(sum(na) AS BIGINT) AS n, CAST(sum(nb) AS BIGINT) AS m,
        |             CAST(sum(na * cb) AS BIGINT) AS ugt,
        |             CAST(sum(nb * ca) AS BIGINT) AS ult,
        |             CAST(sum(na * nb) AS BIGINT) AS ties FROM cum)
        |SELECT n AS n_furniture, m AS n_household,
        |       CAST((ugt - ult) * 1000000 // (n * m) AS BIGINT) AS delta_ppm,
        |       CAST((2 * ugt + ties) * 1000000 // (2 * n * m) AS BIGINT) AS vda_ppm
        |FROM s""".stripMargin,

    "q545_kuiper_test" ->
      """WITH j AS (SELECT CASE WHEN EXTRACT(year FROM o_orderdate) = 1993
        |                       THEN 1 ELSE 0 END AS ga,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE EXTRACT(year FROM o_orderdate) IN (1993, 1994)),
        |vg AS (SELECT v, CAST(sum(ga) AS BIGINT) AS na,
        |              CAST(sum(1 - ga) AS BIGINT) AS nb FROM j GROUP BY 1),
        |cum AS (SELECT CAST(sum(na) OVER wu AS BIGINT) AS ca,
        |               CAST(sum(nb) OVER wu AS BIGINT) AS cb,
        |               CAST(sum(na) OVER wf AS BIGINT) AS n,
        |               CAST(sum(nb) OVER wf AS BIGINT) AS m
        |        FROM vg
        |        WINDOW wu AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |               wf AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
        |s AS (SELECT max(n) AS n, max(m) AS m,
        |             max(ca * m - cb * n) AS dp, max(cb * n - ca * m) AS dm FROM cum)
        |SELECT n AS n_1993, m AS n_1994,
        |       CAST(dp * 1000000 // (n * m) AS BIGINT) AS dplus_ppm,
        |       CAST(dm * 1000000 // (n * m) AS BIGINT) AS dminus_ppm,
        |       CAST((dp + dm) * 1000000 // (n * m) AS BIGINT) AS v_ppm
        |FROM s""".stripMargin,

    "q546_anderson_darling" ->
      """WITH seg AS (SELECT c_custkey,
        |                    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS ga
        |             FROM customer
        |             WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')),
        |j AS (SELECT seg.ga, CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        |      FROM orders o JOIN seg ON o.o_custkey = seg.c_custkey),
        |vg AS (SELECT v, CAST(sum(ga) AS BIGINT) AS na,
        |              CAST(sum(1 - ga) AS BIGINT) AS nb FROM j GROUP BY 1),
        |cum AS (SELECT na, nb,
        |               CAST(coalesce(sum(na) OVER wb, 0) AS BIGINT) AS ca,
        |               CAST(coalesce(sum(na + nb) OVER wb, 0) AS BIGINT) AS cp,
        |               CAST(sum(na) OVER wf AS BIGINT) AS n,
        |               CAST(sum(nb) OVER wf AS BIGINT) AS m
        |        FROM vg
        |        WINDOW wb AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               wf AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
        |t AS (SELECT n, m, n + m AS bign, na + nb AS l,
        |             2 * ca + na AS ma2, 2 * (cp - ca) + nb AS mb2,
        |             2 * cp + na + nb AS b2 FROM cum),
        |t1 AS (SELECT n, m, bign, l, ma2, mb2, b2,
        |              b2 * (2 * bign - b2) - bign * l AS dd FROM t),
        |t2 AS (SELECT n, m, bign,
        |              CASE WHEN dd > 0 THEN CAST(1000000 AS HUGEINT) * l
        |                     * CAST((bign * ma2 - n * b2) AS HUGEINT)
        |                     * (bign * ma2 - n * b2)
        |                     // (CAST(bign AS HUGEINT) * dd) ELSE 0 END AS ta,
        |              CASE WHEN dd > 0 THEN CAST(1000000 AS HUGEINT) * l
        |                     * CAST((bign * mb2 - m * b2) AS HUGEINT)
        |                     * (bign * mb2 - m * b2)
        |                     // (CAST(bign AS HUGEINT) * dd) ELSE 0 END AS tb
        |       FROM t1),
        |s AS (SELECT max(n) AS n, max(m) AS m, max(bign) AS bign,
        |             sum(ta) AS sa, sum(tb) AS sb FROM t2)
        |SELECT n AS n_automobile, m AS n_machinery,
        |       CAST((CAST(bign - 1 AS HUGEINT) * (sa // n + sb // m)) // bign
        |            AS BIGINT) AS a2_micro
        |FROM s""".stripMargin,

    "q547_mann_kendall" ->
      """WITH mo AS (SELECT strftime(o_orderdate, '%Y-%m') AS t,
        |                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |            FROM orders GROUP BY 1),
        |p AS (SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
        |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |      FROM mo a JOIN mo b ON a.t < b.t),
        |ties AS (SELECT CAST(sum(c) AS BIGINT) AS nm,
        |                CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tcorr
        |         FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM mo GROUP BY v)),
        |k AS (SELECT s_stat, nm,
        |             nm * (nm - 1) * (2 * nm + 5) - tcorr AS var18,
        |             18000000 * greatest(abs(s_stat) - 1, 0)
        |               * greatest(abs(s_stat) - 1, 0)
        |               // (nm * (nm - 1) * (2 * nm + 5) - tcorr) AS kk
        |      FROM p CROSS JOIN ties),
        |r0 AS (SELECT *, CAST(floor(sqrt(CAST(kk AS DOUBLE))) AS BIGINT) AS t0 FROM k),
        |r1 AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + kk // t0) // 2 ELSE 0 END AS t1 FROM r0),
        |r2 AS (SELECT *, CASE WHEN (t1 + 1) * (t1 + 1) <= kk THEN t1 + 1
        |                      WHEN t1 * t1 > kk THEN t1 - 1 ELSE t1 END AS rt FROM r1)
        |SELECT nm AS n_months, s_stat, var18,
        |       CAST(CASE WHEN s_stat < 0 THEN -rt ELSE rt END AS BIGINT) AS z_milli
        |FROM r2""".stripMargin,

    "q548_conover_scale" ->
      """WITH seg AS (SELECT c_custkey,
        |                    CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END AS ga
        |             FROM customer
        |             WHERE c_mktsegment IN ('FURNITURE', 'BUILDING')),
        |rw AS (SELECT seg.ga, CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        |       FROM orders o JOIN seg ON o.o_custkey = seg.c_custkey),
        |gs AS (SELECT ga, CAST(count(*) AS BIGINT) AS ng,
        |              CAST(sum(v) AS BIGINT) AS sg FROM rw GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS bign,
        |               CAST(min(CASE WHEN ga = 1 THEN ng END) AS BIGINT) AS n,
        |               CAST(min(CASE WHEN ga = 0 THEN ng END) AS BIGINT) AS m
        |        FROM gs),
        |dv AS (SELECT r.ga, t.bign, t.n, t.m,
        |              (t.bign - g.ng) * abs(g.ng * r.v - g.sg) AS d
        |       FROM rw r JOIN gs g ON r.ga = g.ga CROSS JOIN tot t),
        |vg AS (SELECT d, bign, n, m, CAST(sum(ga) AS BIGINT) AS na,
        |              CAST(sum(1 - ga) AS BIGINT) AS nb
        |       FROM dv GROUP BY 1, 2, 3, 4),
        |cum AS (SELECT bign, n, m, na, na + nb AS l,
        |               CAST(coalesce(sum(na + nb) OVER wb, 0) AS BIGINT) AS cp
        |        FROM vg
        |        WINDOW wb AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |scr AS (SELECT bign, n, m, na, l,
        |               CAST(2 * cp + l + 1 AS HUGEINT) * (2 * cp + l + 1)
        |                 // (4 * bign) AS scv
        |        FROM cum),
        |s AS (SELECT max(bign) AS bign, max(n) AS n, max(m) AS m,
        |             sum(na * scv) AS t4a, sum(l * scv) AS m1,
        |             sum(CAST(l AS HUGEINT) * scv * scv) AS m2 FROM scr)
        |SELECT n AS n_furniture, m AS n_building,
        |       CAST(t4a AS BIGINT) AS t4_scaled,
        |       CAST((1000 * CAST(bign - 1 AS HUGEINT)
        |             * (bign * t4a - n * m1) * (bign * t4a - n * m1))
        |            // (CAST(n AS HUGEINT) * m * (bign * m2 - m1 * m1))
        |            AS BIGINT) AS zsq_milli
        |FROM s""".stripMargin,

    "q549_calinski_harabasz" ->
      s"""$ivfAssignCte,
         |qv AS (SELECT vec_id, bucket, CAST(i AS BIGINT) AS pos,
         |              CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
         |       FROM asg CROSS JOIN unnest(range(0, len(e))) AS u(i)),
         |cent AS (SELECT bucket, pos, CAST(sum(qv) // count(*) AS BIGINT) AS cq,
         |                CAST(count(*) AS BIGINT) AS nb
         |         FROM qv GROUP BY 1, 2),
         |gl AS (SELECT pos, CAST(sum(qv) // count(*) AS BIGINT) AS gq
         |         FROM qv GROUP BY 1),
         |w AS (SELECT sum(CAST((q.qv - c.cq) AS HUGEINT) * (q.qv - c.cq)) AS wss
         |      FROM qv q JOIN cent c USING (bucket, pos)),
         |b AS (SELECT sum(CAST(c.nb AS HUGEINT) * (c.cq - g.gq) * (c.cq - g.gq)) AS bss
         |      FROM cent c JOIN gl g USING (pos)),
         |nk AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS nv,
         |              CAST(count(DISTINCT bucket) AS BIGINT) AS k FROM qv)
         |SELECT nv AS n_vectors, k AS k_clusters,
         |       CAST(wss AS BIGINT) AS w_ssq, CAST(bss AS BIGINT) AS b_ssq,
         |       CAST((1000 * bss * (nv - k)) // (wss * (k - 1)) AS BIGINT) AS ch_milli
         |FROM w CROSS JOIN b CROSS JOIN nk""".stripMargin,

    "q550_dunn_index" ->
      s"""$ivfAssignCte,
         |qv AS (SELECT vec_id, bucket, CAST(i AS BIGINT) AS pos,
         |              CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
         |       FROM asg CROSS JOIN unnest(range(0, len(e))) AS u(i)),
         |cent AS (SELECT bucket, pos, CAST(sum(qv) // count(*) AS BIGINT) AS cq
         |         FROM qv GROUP BY 1, 2),
         |maxr AS (SELECT max(r2) AS max_r2 FROM (
         |           SELECT q.vec_id, CAST(sum((q.qv - c.cq) * (q.qv - c.cq)) AS BIGINT) AS r2
         |           FROM qv q JOIN cent c USING (bucket, pos) GROUP BY 1)),
         |minc AS (SELECT min(c2) AS min_c2, CAST(count(*) AS BIGINT) AS n_pairs FROM (
         |           SELECT a.bucket, b.bucket,
         |                  CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS c2
         |           FROM cent a JOIN cent b ON a.pos = b.pos AND a.bucket < b.bucket
         |           GROUP BY 1, 2))
         |SELECT n_pairs, min_c2, max_r2,
         |       CAST(1000 * min_c2 // (4 * max_r2) AS BIGINT) AS dunn_milli
         |FROM minc CROSS JOIN maxr""".stripMargin,

    "q551_adjusted_rand" ->
      s"""$ivfAssignCte,
         |cont AS (SELECT e2.label, asg.bucket, CAST(count(*) AS BIGINT) AS nij
         |         FROM asg JOIN embeddings e2 ON asg.vec_id = e2.vec_id
         |         GROUP BY 1, 2),
         |p AS (SELECT sum(CAST(nij AS HUGEINT) * (nij - 1)) AS pp,
         |             CAST(sum(nij) AS BIGINT) AS n FROM cont),
         |pa AS (SELECT sum(CAST(ai AS HUGEINT) * (ai - 1)) AS aa,
         |             CAST(count(*) AS BIGINT) AS n_labels
         |      FROM (SELECT label, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY 1)),
         |pb AS (SELECT sum(CAST(bj AS HUGEINT) * (bj - 1)) AS bb,
         |             CAST(count(*) AS BIGINT) AS k_buckets
         |      FROM (SELECT bucket, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY 1))
         |SELECT n AS n_vectors, n_labels, k_buckets,
         |       CAST(round(1000000
         |              * (2 * CAST(n AS DOUBLE) * (n - 1) * pp - 2 * CAST(aa AS DOUBLE) * bb)
         |            / (CAST(n AS DOUBLE) * (n - 1) * (aa + bb) - 2 * CAST(aa AS DOUBLE) * bb))
         |            AS BIGINT) AS ari_ppm
         |FROM p CROSS JOIN pa CROSS JOIN pb""".stripMargin,

    "q552_fowlkes_mallows" ->
      s"""$ivfAssignCte,
         |cont AS (SELECT e2.label, asg.bucket, CAST(count(*) AS BIGINT) AS nij
         |         FROM asg JOIN embeddings e2 ON asg.vec_id = e2.vec_id
         |         GROUP BY 1, 2),
         |p AS (SELECT sum(CAST(nij AS HUGEINT) * (nij - 1)) AS pp FROM cont),
         |pa AS (SELECT sum(CAST(ai AS HUGEINT) * (ai - 1)) AS aa
         |      FROM (SELECT label, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY 1)),
         |pb AS (SELECT sum(CAST(bj AS HUGEINT) * (bj - 1)) AS bb
         |      FROM (SELECT bucket, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY 1)),
         |f AS (SELECT pp, aa, bb,
         |             (1000000 * pp // bb) * (1000000 * pp // aa) AS x
         |      FROM p CROSS JOIN pa CROSS JOIN pb),
         |r0 AS (SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS HUGEINT) AS t0 FROM f),
         |r1 AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + x // t0) // 2 ELSE 0 END AS t1 FROM r0),
         |r2 AS (SELECT *, CASE WHEN (t1 + 1) * (t1 + 1) <= x THEN t1 + 1
         |                      WHEN t1 * t1 > x THEN t1 - 1 ELSE t1 END AS rt FROM r1)
         |SELECT CAST(pp AS BIGINT) AS pair_tp2,
         |       CAST(1000000 * pp // bb AS BIGINT) AS prec_ppm,
         |       CAST(1000000 * pp // aa AS BIGINT) AS rec_ppm,
         |       CAST(rt AS BIGINT) AS fm_ppm
         |FROM r2""".stripMargin,

    "q553_map_eval" ->
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
         |h AS (SELECT ap.query_id, ap.p,
         |             CASE WHEN ex.rk_exact IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM ap LEFT JOIN ex USING (query_id, neighbor_id)),
         |cc AS (SELECT query_id, p, hit,
         |             CAST(sum(hit) OVER (PARTITION BY query_id ORDER BY p
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ch
         |      FROM h)
         |SELECT query_id, CAST(sum(hit) AS BIGINT) AS n_hits,
         |       CAST(sum(CASE WHEN hit = 1 THEN ch * 1000000 // p ELSE 0 END) AS BIGINT) AS psum_micro,
         |       CAST(sum(CASE WHEN hit = 1 THEN ch * 1000000 // p ELSE 0 END) // 10 AS BIGINT) AS ap_micro
         |FROM cc GROUP BY 1 ORDER BY query_id""".stripMargin,

    "q554_nucleus_cutoff" ->
      """WITH w AS (SELECT lang, w FROM (
        |             SELECT lang, unnest(string_split(text, ' ')) AS w
        |             FROM documents WHERE text IS NOT NULL)
        |           WHERE length(w) > 0),
        |wf AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1, 2),
        |c AS (SELECT lang, w, cnt,
        |             CAST(coalesce(sum(cnt) OVER (PARTITION BY lang
        |               ORDER BY cnt DESC, w
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb,
        |             CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS total
        |      FROM wf),
        |k AS (SELECT lang, cnt, total,
        |             CASE WHEN 10 * cumb < 9 * total THEN 1 ELSE 0 END AS keep FROM c)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_vocab,
        |       CAST(max(total) AS BIGINT) AS total_tokens,
        |       CAST(sum(keep) AS BIGINT) AS nucleus_k,
        |       CAST(sum(keep * cnt) * 1000000 // max(total) AS BIGINT) AS nucleus_mass_ppm
        |FROM k GROUP BY 1 ORDER BY lang""".stripMargin,

    "q555_speculative_accept" ->
      """WITH w AS (SELECT ga, w FROM (
        |             SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ga,
        |                    unnest(string_split(text, ' ')) AS w
        |             FROM documents
        |             WHERE text IS NOT NULL AND source IN ('src0', 'src1'))
        |           WHERE length(w) > 0),
        |wc AS (SELECT w, CAST(sum(ga) AS BIGINT) AS ca,
        |              CAST(sum(1 - ga) AS BIGINT) AS cb FROM w GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM wc),
        |s AS (SELECT na, nb, CAST(sum(least(ca * nb, cb * na)) AS BIGINT) AS overlap
        |      FROM wc CROSS JOIN t GROUP BY 1, 2),
        |f AS (SELECT na, nb, overlap * 1000000 // (na * nb) AS a FROM s)
        |SELECT na AS draft_tokens, nb AS target_tokens, CAST(a AS BIGINT) AS accept_ppm,
        |       CAST(1000 + a // 1000 + CAST(a AS HUGEINT) * a // 1000000000
        |            + CAST(a AS HUGEINT) * a * a // 1000000000000000
        |            + CAST(a AS HUGEINT) * a * a * a // 1000000000000000000000
        |            AS BIGINT) AS exp_len_milli
        |FROM f""".stripMargin,

    "q556_doremi_step" ->
      """WITH w2 AS (SELECT source, w FROM (
        |              SELECT source, unnest(string_split(text, ' ')) AS w
        |              FROM documents WHERE text IS NOT NULL)
        |            WHERE length(w) > 0),
        |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM w2 GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM wc),
        |sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM w2 GROUP BY 1, 2),
        |lp AS (SELECT sw.source, sw.n,
        |              CAST(round(ln(CAST(wc.cnt AS DOUBLE) / t.total) * 1000000) AS BIGINT) AS lp
        |       FROM sw JOIN wc USING (w), t),
        |nl AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
        |              CAST(-sum(n * lp) AS BIGINT) AS snll FROM lp GROUP BY 1),
        |n2 AS (SELECT source, n_tokens, snll // n_tokens AS nll_micro FROM nl),
        |n3 AS (SELECT source, n_tokens, nll_micro,
        |              nll_micro - min(nll_micro) OVER () AS excess_micro FROM n2),
        |n4 AS (SELECT *, CAST(round(exp(CAST(excess_micro // 10 AS DOUBLE) / 1000000.0)
        |                            * 1000000) AS BIGINT) AS fac FROM n3)
        |SELECT source, n_tokens, CAST(nll_micro AS BIGINT) AS nll_micro,
        |       CAST(excess_micro AS BIGINT) AS excess_micro,
        |       CAST(fac * 1000000 // sum(fac) OVER () AS BIGINT) AS new_w_ppm
        |FROM n4 ORDER BY source""".stripMargin,

    "q557_err_eval" ->
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
         |h AS (SELECT ap.query_id, ap.p,
         |             least(greatest(coalesce(11 - ex.rk_exact, 0), 0), 4) AS g
         |      FROM ap LEFT JOIN ex USING (query_id, neighbor_id)),
         |h2 AS (SELECT query_id, p, CAST(pow(2, g) AS BIGINT) - 1 AS r16 FROM h),
         |h3 AS (SELECT query_id, p, r16,
         |              CAST(coalesce(product(16 - r16) OVER (PARTITION BY query_id
         |                ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1)
         |                AS BIGINT) AS surv
         |       FROM h2)
         |SELECT query_id, CAST(count(*) AS BIGINT) AS n_ranked,
         |       CAST(sum(1000000 * r16 * surv * CAST(pow(16, 10 - p) AS BIGINT)
         |            // (p * 1099511627776)) AS BIGINT) AS err_micro
         |FROM h3 GROUP BY 1 ORDER BY query_id""".stripMargin,

    "q558_continuous_batching" ->
      """WITH req AS (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1024),
        |r2 AS (SELECT o_orderkey * 7 % 96 + 32 AS glen,
        |              row_number() OVER (ORDER BY o_orderkey) AS rn FROM req),
        |b AS (SELECT (rn - 1) // 32 AS batch, CAST(max(glen) AS BIGINT) AS bmax,
        |             CAST(sum(glen) AS BIGINT) AS bsum FROM r2 GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_batches,
        |             CAST(sum(bmax) AS BIGINT) AS static_cost,
        |             CAST(sum(bsum) AS BIGINT) AS total_tokens FROM b)
        |SELECT n_batches, static_cost, total_tokens,
        |       CAST((total_tokens + 31) // 32 AS BIGINT) AS packed_cost,
        |       CAST(1000 * static_cost // ((total_tokens + 31) // 32) AS BIGINT) AS speedup_milli
        |FROM s""".stripMargin,

    "q559_pettitt_changepoint" ->
      """WITH mo AS (SELECT strftime(o_orderdate, '%Y-%m') AS t,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |           FROM orders GROUP BY 1),
        |vg AS (SELECT v, CAST(count(*) AS BIGINT) AS l FROM mo GROUP BY 1),
        |vr AS (SELECT v, 2 * CAST(coalesce(sum(l) OVER (ORDER BY v
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |            + l + 1 AS r2 FROM vg),
        |u AS (SELECT mo.t, row_number() OVER (ORDER BY mo.t) AS tn,
        |             count(*) OVER () AS nm,
        |             sum(vr.r2) OVER (ORDER BY mo.t
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
        |      FROM mo JOIN vr USING (v)),
        |u2 AS (SELECT t, tn, CAST(nm AS BIGINT) AS nm,
        |              CAST(cr - tn * (nm + 1) AS BIGINT) AS uu FROM u WHERE tn < nm),
        |m AS (SELECT *, max(abs(uu)) OVER () AS mx FROM u2),
        |f AS (SELECT CAST(max(nm) AS BIGINT) AS nm, CAST(max(mx) AS BIGINT) AS k_stat,
        |             min(t) AS cp_month FROM m WHERE abs(uu) = mx)
        |SELECT nm AS n_months, k_stat, cp_month,
        |       CAST(6000 * k_stat * k_stat // (nm * nm * nm + nm * nm) AS BIGINT)
        |         AS exponent_milli
        |FROM f""".stripMargin,

    "q560_kpss_level" ->
      """WITH mo AS (SELECT strftime(o_orderdate, '%Y-%m') AS t,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000
        |                    AS BIGINT) AS v
        |           FROM orders GROUP BY 1),
        |w1 AS (SELECT t, v, CAST(count(*) OVER () AS BIGINT) AS nm,
        |              CAST(sum(v) OVER () AS BIGINT) AS sv FROM mo),
        |w2 AS (SELECT t, nm, nm * v - sv AS e FROM w1),
        |w3 AS (SELECT nm, e,
        |              CAST(sum(e) OVER (ORDER BY t
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS st,
        |              lag(e, 1) OVER (ORDER BY t) AS e1,
        |              lag(e, 2) OVER (ORDER BY t) AS e2,
        |              lag(e, 3) OVER (ORDER BY t) AS e3,
        |              lag(e, 4) OVER (ORDER BY t) AS e4
        |       FROM w2),
        |a AS (SELECT max(nm) AS nm, sum(CAST(st AS HUGEINT) * st) AS ssq,
        |             CAST(sum(e * e) AS BIGINT) AS g0,
        |             CAST(sum(e * coalesce(e1, 0)) AS BIGINT) AS g1,
        |             CAST(sum(e * coalesce(e2, 0)) AS BIGINT) AS g2,
        |             CAST(sum(e * coalesce(e3, 0)) AS BIGINT) AS g3,
        |             CAST(sum(e * coalesce(e4, 0)) AS BIGINT) AS g4 FROM w3)
        |SELECT nm AS n_months, g0,
        |       CAST(5 * g0 + 2 * (4 * g1 + 3 * g2 + 2 * g3 + g4) AS BIGINT) AS lrv5,
        |       CAST((5000000 * ssq)
        |            // (nm * CAST(5 * g0 + 2 * (4 * g1 + 3 * g2 + 2 * g3 + g4) AS HUGEINT))
        |            AS BIGINT) AS kpss_micro
        |FROM a""".stripMargin,

    "q561_variogram" ->
      """WITH day AS (SELECT o_orderdate AS d,
        |                    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000
        |                      AS BIGINT) AS v
        |             FROM orders GROUP BY 1),
        |l AS (SELECT v, lag(v, 1) OVER w AS v1, lag(v, 2) OVER w AS v2,
        |             lag(v, 4) OVER w AS v4, lag(v, 8) OVER w AS v8
        |      FROM day WINDOW w AS (ORDER BY d))
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum((v - v1) * (v - v1)) // (2 * count(v1)) AS BIGINT) AS gamma1_q,
        |       CAST(sum((v - v2) * (v - v2)) // (2 * count(v2)) AS BIGINT) AS gamma2_q,
        |       CAST(sum((v - v4) * (v - v4)) // (2 * count(v4)) AS BIGINT) AS gamma4_q,
        |       CAST(sum((v - v8) * (v - v8)) // (2 * count(v8)) AS BIGINT) AS gamma8_q
        |FROM l""".stripMargin,

    "q562_allan_variance" ->
      """WITH day AS (SELECT o_orderdate AS d,
        |                    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000
        |                      AS BIGINT) AS v
        |             FROM orders GROUP BY 1),
        |r AS (SELECT v, row_number() OVER (ORDER BY d) AS rn FROM day),
        |bm1 AS (SELECT (rn - 1) // 1 AS b, CAST(sum(v) AS BIGINT) AS bs, count(*) AS c
        |        FROM r GROUP BY 1),
        |f1 AS (SELECT bs, lag(bs) OVER (ORDER BY b) AS prev FROM bm1 WHERE c = 1),
        |bm2 AS (SELECT (rn - 1) // 2 AS b, CAST(sum(v) AS BIGINT) AS bs, count(*) AS c
        |        FROM r GROUP BY 1),
        |f2 AS (SELECT bs, lag(bs) OVER (ORDER BY b) AS prev FROM bm2 WHERE c = 2),
        |bm4 AS (SELECT (rn - 1) // 4 AS b, CAST(sum(v) AS BIGINT) AS bs, count(*) AS c
        |        FROM r GROUP BY 1),
        |f4 AS (SELECT bs, lag(bs) OVER (ORDER BY b) AS prev FROM bm4 WHERE c = 4)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS m, CAST(count(prev) AS BIGINT) AS npairs,
        |         CAST(sum((bs - prev) * (bs - prev)) // (2 * count(prev) * 1 * 1)
        |           AS BIGINT) AS avar_q FROM f1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), CAST(count(prev) AS BIGINT),
        |         CAST(sum((bs - prev) * (bs - prev)) // (2 * count(prev) * 2 * 2)
        |           AS BIGINT) FROM f2
        |  UNION ALL
        |  SELECT CAST(4 AS BIGINT), CAST(count(prev) AS BIGINT),
        |         CAST(sum((bs - prev) * (bs - prev)) // (2 * count(prev) * 4 * 4)
        |           AS BIGINT) FROM f4)
        |ORDER BY m""".stripMargin,

    "q563_hurst_rs" ->
      """WITH day AS (SELECT o_orderdate AS d,
        |             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS BIGINT) AS v
        |      FROM orders GROUP BY 1),
        |r AS (SELECT v, row_number() OVER (ORDER BY d) AS rn FROM day),
        |a16 AS (SELECT v, rn, (rn - 1) // 16 AS b FROM r),
        |c16 AS (SELECT b, v, rn, count(*) OVER (PARTITION BY b) AS c,
        |              CAST(sum(v) OVER (PARTITION BY b) AS BIGINT) AS bs FROM a16),
        |e16 AS (SELECT b, 16 * v - bs AS e,
        |              sum(16 * v - bs) OVER (PARTITION BY b ORDER BY rn
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
        |       FROM c16 WHERE c = 16),
        |g16 AS (SELECT b, CAST(max(cd) - min(cd) AS BIGINT) AS rw,
        |              CAST(sum(e * e) AS BIGINT) AS se2 FROM e16 GROUP BY 1),
        |k16 AS (SELECT CAST(1000000 AS HUGEINT) * rw * rw * 16 // se2 AS k
        |       FROM g16 WHERE se2 > 0),
        |i16 AS (SELECT k, CAST(floor(sqrt(CAST(k AS DOUBLE))) AS HUGEINT) AS t0 FROM k16),
        |j16 AS (SELECT k, CASE WHEN t0 > 0 THEN (t0 + k // t0) // 2 ELSE 0 END AS t1 FROM i16),
        |x16 AS (SELECT CASE WHEN (t1 + 1) * (t1 + 1) <= k THEN t1 + 1
        |              WHEN t1 * t1 > k THEN t1 - 1 ELSE t1 END AS rs FROM j16),
        |s16 AS (SELECT CAST(16 AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n_blocks,
        |              CAST(sum(rs) // count(*) AS BIGINT) AS mean_rs_milli FROM x16),
        |a64 AS (SELECT v, rn, (rn - 1) // 64 AS b FROM r),
        |c64 AS (SELECT b, v, rn, count(*) OVER (PARTITION BY b) AS c,
        |              CAST(sum(v) OVER (PARTITION BY b) AS BIGINT) AS bs FROM a64),
        |e64 AS (SELECT b, 64 * v - bs AS e,
        |              sum(64 * v - bs) OVER (PARTITION BY b ORDER BY rn
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
        |       FROM c64 WHERE c = 64),
        |g64 AS (SELECT b, CAST(max(cd) - min(cd) AS BIGINT) AS rw,
        |              CAST(sum(e * e) AS BIGINT) AS se2 FROM e64 GROUP BY 1),
        |k64 AS (SELECT CAST(1000000 AS HUGEINT) * rw * rw * 64 // se2 AS k
        |       FROM g64 WHERE se2 > 0),
        |i64 AS (SELECT k, CAST(floor(sqrt(CAST(k AS DOUBLE))) AS HUGEINT) AS t0 FROM k64),
        |j64 AS (SELECT k, CASE WHEN t0 > 0 THEN (t0 + k // t0) // 2 ELSE 0 END AS t1 FROM i64),
        |x64 AS (SELECT CASE WHEN (t1 + 1) * (t1 + 1) <= k THEN t1 + 1
        |              WHEN t1 * t1 > k THEN t1 - 1 ELSE t1 END AS rs FROM j64),
        |s64 AS (SELECT CAST(64 AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n_blocks,
        |              CAST(sum(rs) // count(*) AS BIGINT) AS mean_rs_milli FROM x64),
        |a256 AS (SELECT v, rn, (rn - 1) // 256 AS b FROM r),
        |c256 AS (SELECT b, v, rn, count(*) OVER (PARTITION BY b) AS c,
        |              CAST(sum(v) OVER (PARTITION BY b) AS BIGINT) AS bs FROM a256),
        |e256 AS (SELECT b, 256 * v - bs AS e,
        |              sum(256 * v - bs) OVER (PARTITION BY b ORDER BY rn
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
        |       FROM c256 WHERE c = 256),
        |g256 AS (SELECT b, CAST(max(cd) - min(cd) AS BIGINT) AS rw,
        |              CAST(sum(e * e) AS BIGINT) AS se2 FROM e256 GROUP BY 1),
        |k256 AS (SELECT CAST(1000000 AS HUGEINT) * rw * rw * 256 // se2 AS k
        |       FROM g256 WHERE se2 > 0),
        |i256 AS (SELECT k, CAST(floor(sqrt(CAST(k AS DOUBLE))) AS HUGEINT) AS t0 FROM k256),
        |j256 AS (SELECT k, CASE WHEN t0 > 0 THEN (t0 + k // t0) // 2 ELSE 0 END AS t1 FROM i256),
        |x256 AS (SELECT CASE WHEN (t1 + 1) * (t1 + 1) <= k THEN t1 + 1
        |              WHEN t1 * t1 > k THEN t1 - 1 ELSE t1 END AS rs FROM j256),
        |s256 AS (SELECT CAST(256 AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n_blocks,
        |              CAST(sum(rs) // count(*) AS BIGINT) AS mean_rs_milli FROM x256),
        |uni AS (SELECT * FROM s16 UNION ALL SELECT * FROM s64
        |        UNION ALL SELECT * FROM s256),
        |f AS (SELECT *,
        |             max(CASE WHEN w = 16 THEN CAST(round(ln(CAST(mean_rs_milli AS DOUBLE))
        |               * 1000000) AS BIGINT) END) OVER () AS l16,
        |             max(CASE WHEN w = 256 THEN CAST(round(ln(CAST(mean_rs_milli AS DOUBLE))
        |               * 1000000) AS BIGINT) END) OVER () AS l256
        |      FROM uni)
        |SELECT w, n_blocks, mean_rs_milli,
        |       CAST(1000 * (l256 - l16) // 2772589 AS BIGINT) AS hurst_milli
        |FROM f ORDER BY w""".stripMargin,

    "q564_newsvendor" ->
      """WITH dd AS (SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS dem
        |           FROM orders GROUP BY 1),
        |vg AS (SELECT dem, CAST(count(*) AS BIGINT) AS cnt FROM dd GROUP BY 1),
        |c AS (SELECT dem, cnt,
        |             CAST(sum(cnt) OVER (ORDER BY dem
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |             CAST(sum(cnt) OVER () AS BIGINT) AS tot,
        |             CAST(sum(dem * cnt) OVER () AS BIGINT) AS tdem
        |      FROM vg),
        |qs AS (SELECT min(dem) AS qstar, max(tot) AS n_days,
        |              max(tdem // tot) AS qmean FROM c WHERE 4 * cum >= 3 * tot)
        |SELECT max(qs.n_days) AS n_days, max(qs.qstar) AS qstar, max(qs.qmean) AS qmean,
        |       CAST(sum(cnt * (greatest(qstar - dem, 0)
        |            + 3 * greatest(dem - qstar, 0))) AS BIGINT) AS cost_qstar_num,
        |       CAST(sum(cnt * (greatest(qmean - dem, 0)
        |            + 3 * greatest(dem - qmean, 0))) AS BIGINT) AS cost_qmean_num
        |FROM vg CROSS JOIN qs""".stripMargin,

    "q565_eoq_plan" ->
      """WITH pb AS (SELECT p_partkey, p_brand,
        |                  CAST(round(p_retailprice * 100) AS BIGINT) AS pc FROM part),
        |d AS (SELECT p_brand,
        |             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS dunits,
        |             CAST(count(*) AS BIGINT) AS nl, CAST(sum(pc) AS BIGINT) AS spc
        |      FROM lineitem JOIN pb ON l_partkey = p_partkey GROUP BY 1),
        |h AS (SELECT p_brand, dunits, spc // (5 * nl) AS h,
        |             2 * dunits * 10000 * (spc // (5 * nl)) AS rad FROM d),
        |r0 AS (SELECT *, CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) AS t0 FROM h),
        |r1 AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + rad // t0) // 2 ELSE 0 END AS t1 FROM r0),
        |r2 AS (SELECT *, CASE WHEN (t1 + 1) * (t1 + 1) <= rad THEN t1 + 1
        |                      WHEN t1 * t1 > rad THEN t1 - 1 ELSE t1 END AS rt FROM r1)
        |SELECT p_brand AS brand, dunits, CAST(h AS BIGINT) AS h_cents,
        |       CAST(rt // h AS BIGINT) AS eoq_units,
        |       CAST(CASE WHEN rt // h > 0 THEN dunits // (rt // h) ELSE 0 END AS BIGINT)
        |         AS orders_per_cycle
        |FROM r2 ORDER BY brand""".stripMargin,

    "q566_randomized_response" ->
      """WITH c AS (SELECT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS truth,
        |                  CAST(concat('0x', substr(md5('rr#' || CAST(c_custkey AS VARCHAR)),
        |                    1, 12)) AS BIGINT) AS u
        |           FROM customer),
        |y AS (SELECT truth, CASE WHEN u % 2 = 0 THEN truth ELSE (u // 2) % 2 END AS yes FROM c),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_respondents,
        |             CAST(sum(yes) AS BIGINT) AS ny, CAST(sum(truth) AS BIGINT) AS nt FROM y)
        |SELECT n_respondents,
        |       CAST(ny * 1000000 // n_respondents AS BIGINT) AS yes_ppm,
        |       CAST((4 * ny - n_respondents) * 1000000 // (2 * n_respondents) AS BIGINT) AS est_ppm,
        |       CAST(nt * 1000000 // n_respondents AS BIGINT) AS true_ppm,
        |       CAST((4 * ny - n_respondents) * 1000000 // (2 * n_respondents)
        |            - nt * 1000000 // n_respondents AS BIGINT) AS err_ppm
        |FROM s""".stripMargin,

    "q567_cmh_test" ->
      """WITH cust AS (SELECT c_custkey, r_name,
        |                    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ex
        |             FROM customer JOIN nation ON c_nationkey = n_nationkey
        |                           JOIN region ON n_regionkey = r_regionkey),
        |tab AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n, CAST(sum(ex) AS BIGINT) AS r1,
        |               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |               CAST(sum(ex * CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a
        |        FROM orders JOIN cust ON o_custkey = c_custkey GROUP BY 1),
        |q AS (SELECT r_name,
        |             1000000 * (a * n - r1 * c1) // n AS d_micro,
        |             CAST(1000000 AS HUGEINT) * r1 * (n - r1) * c1 * (n - c1)
        |               // (CAST(n AS HUGEINT) * n * (n - 1)) AS v_micro,
        |             1000000 * (a * (n - r1 - c1 + a)) // n AS ad_micro,
        |             1000000 * ((r1 - a) * (c1 - a)) // n AS bc_micro
        |      FROM tab),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_strata, CAST(sum(d_micro) AS BIGINT) AS sd,
        |             CAST(sum(v_micro) AS BIGINT) AS sv, CAST(sum(ad_micro) AS BIGINT) AS mhn,
        |             CAST(sum(bc_micro) AS BIGINT) AS mhd FROM q)
        |SELECT n_strata, sd AS sum_dev_micro, sv AS sum_var_micro,
        |       CAST((1000 * CAST(sd AS HUGEINT) * sd) // (1000000 * CAST(sv AS HUGEINT))
        |         AS BIGINT) AS chi2_milli,
        |       CAST(1000 * mhn // mhd AS BIGINT) AS or_milli
        |FROM s""".stripMargin,

    "q568_hodges_lehmann" ->
      """WITH mo AS (SELECT r_name, strftime(o_orderdate, '%Y-%m') AS t,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |           FROM orders JOIN customer ON o_custkey = c_custkey
        |                       JOIN nation ON c_nationkey = n_nationkey
        |                       JOIN region ON n_regionkey = r_regionkey
        |           WHERE r_name IN ('EUROPE', 'ASIA') GROUP BY 1, 2),
        |e AS (SELECT t AS te, v AS ve FROM mo WHERE r_name = 'EUROPE'),
        |a AS (SELECT t AS ta, v AS va FROM mo WHERE r_name = 'ASIA'),
        |diffs AS (SELECT ve - va AS dd, te, ta,
        |                 CAST(row_number() OVER (ORDER BY ve - va, te, ta) AS BIGINT) AS rk
        |          FROM e CROSS JOIN a),
        |w AS (SELECT *, CAST(count(*) OVER () AS BIGINT) AS np FROM diffs),
        |f AS (SELECT np, dd, CASE WHEN np % 2 = 1 THEN 2 ELSE 1 END AS mult FROM w
        |      WHERE rk = (np + 1) // 2 OR rk = (np + 2) // 2)
        |SELECT max(np) AS n_pairs, CAST(sum(dd * mult) AS BIGINT) AS hl2_cents,
        |       CAST(sum(dd * mult) // 2 AS BIGINT) AS hl_cents
        |FROM f""".stripMargin,

    "q569_katz_centrality" ->
      """WITH cn AS (SELECT o_orderkey, c_nationkey AS cnat
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |sn AS (SELECT DISTINCT l_orderkey, s_nationkey AS snat
        |       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
        |edges AS (SELECT DISTINCT snat, cnat FROM cn JOIN sn ON o_orderkey = l_orderkey),
        |nat AS (SELECT n_nationkey AS node, n_name FROM nation),
        |x0 AS (SELECT node, n_name, CAST(1000 AS BIGINT) AS xv FROM nat),
        |x1 AS (SELECT nat.node, nat.n_name,
        |             1000 + CAST(coalesce(s.i, 0) // 4 AS BIGINT) AS xv
        |      FROM nat LEFT JOIN (SELECT cnat, CAST(sum(x0.xv) AS BIGINT) AS i
        |                          FROM edges JOIN x0 ON snat = x0.node
        |                          GROUP BY 1) s ON nat.node = s.cnat),
        |x2 AS (SELECT nat.node, nat.n_name,
        |             1000 + CAST(coalesce(s.i, 0) // 4 AS BIGINT) AS xv
        |      FROM nat LEFT JOIN (SELECT cnat, CAST(sum(x1.xv) AS BIGINT) AS i
        |                          FROM edges JOIN x1 ON snat = x1.node
        |                          GROUP BY 1) s ON nat.node = s.cnat),
        |x3 AS (SELECT nat.node, nat.n_name,
        |             1000 + CAST(coalesce(s.i, 0) // 4 AS BIGINT) AS xv
        |      FROM nat LEFT JOIN (SELECT cnat, CAST(sum(x2.xv) AS BIGINT) AS i
        |                          FROM edges JOIN x2 ON snat = x2.node
        |                          GROUP BY 1) s ON nat.node = s.cnat),
        |x4 AS (SELECT nat.node, nat.n_name,
        |             1000 + CAST(coalesce(s.i, 0) // 4 AS BIGINT) AS xv
        |      FROM nat LEFT JOIN (SELECT cnat, CAST(sum(x3.xv) AS BIGINT) AS i
        |                          FROM edges JOIN x3 ON snat = x3.node
        |                          GROUP BY 1) s ON nat.node = s.cnat)
        |SELECT n_name AS nation, xv AS katz_milli FROM x4 ORDER BY nation""".stripMargin,

    "q570_resource_allocation" ->
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
        |       CAST(sum(1000000 // deg.deg) AS BIGINT) AS ra_micro
        |FROM th JOIN deg ON deg.node = th.wnode
        |GROUP BY 1, 2
        |ORDER BY ra_micro DESC, brand_a, brand_b
        |LIMIT 25""".stripMargin,

    "q571_elias_fano" ->
      """WITH post AS (SELECT DISTINCT p_brand AS brand, l_orderkey AS k
        |              FROM lineitem JOIN part ON p_partkey = l_partkey),
        |g AS (SELECT brand, k,
        |             k - coalesce(lag(k) OVER (PARTITION BY brand ORDER BY k), 0) AS gap
        |      FROM post),
        |f AS (SELECT brand, gap, k FROM g WHERE gap > 0),
        |a AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_postings,
        |             CAST(max(k) AS BIGINT) AS universe,
        |             CAST(sum(length(bin(gap))) AS BIGINT) AS delta_bits FROM f GROUP BY 1)
        |SELECT brand, n_postings, universe, delta_bits,
        |       CAST(n_postings * (2 + length(bin(universe // n_postings)) - 1) AS BIGINT)
        |         AS ef_bits,
        |       CAST(n_postings * (2 + length(bin(universe // n_postings)) - 1) * 1000000
        |            // delta_bits AS BIGINT) AS ef_vs_delta_ppm
        |FROM a ORDER BY brand""".stripMargin,

    "q572_weighted_logrank" ->
      """WITH seg AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS g1
        |  FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
        |), life AS (
        |  SELECT o.o_custkey, seg.g1,
        |         datediff('day', min(o.o_orderdate), max(o.o_orderdate)) AS t
        |  FROM orders o JOIN seg ON o.o_custkey = seg.c_custkey
        |  GROUP BY 1, 2
        |), et AS (
        |  SELECT t, CAST(sum(g1) AS BIGINT) AS d1, CAST(count(*) AS BIGINT) AS d
        |  FROM life GROUP BY 1
        |), risk AS (
        |  SELECT t, d1, d,
        |         CAST(sum(d1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
        |           AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1t,
        |         CAST(sum(d) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
        |           AND UNBOUNDED FOLLOWING) AS BIGINT) AS nt
        |  FROM et
        |), r0 AS (SELECT *, CAST(floor(sqrt(CAST(nt AS DOUBLE))) AS BIGINT) AS t0 FROM risk),
        |r1 AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + nt // t0) // 2 ELSE 0 END AS t1 FROM r0),
        |r2 AS (SELECT *, CASE WHEN (t1 + 1) * (t1 + 1) <= nt THEN t1 + 1
        |                      WHEN t1 * t1 > nt THEN t1 - 1 ELSE t1 END AS sq FROM r1),
        |q AS (SELECT d1, d, n1t, nt, sq,
        |             d1 * 1000000 - d * n1t * 1000000 // nt AS dev_micro,
        |             CASE WHEN nt > 1 THEN CAST(d AS HUGEINT) * n1t * (nt - n1t)
        |                    * (nt - d) * 1000000
        |                    // (CAST(nt AS HUGEINT) * nt * (nt - 1))
        |                  ELSE 0 END AS v_micro
        |      FROM r2)
        |SELECT CAST(count(*) AS BIGINT) AS n_times,
        |       CAST((sum(CAST(1 AS HUGEINT) * dev_micro) * sum(CAST(1 AS HUGEINT) * dev_micro))
        |            // (1000000 * sum(CAST(1 AS HUGEINT) * v_micro)) AS BIGINT) AS logrank_chi2_micro,
        |       CAST((sum(CAST(nt AS HUGEINT) * dev_micro) * sum(CAST(nt AS HUGEINT) * dev_micro))
        |            // (1000000 * sum(CAST(nt AS HUGEINT) * nt * v_micro)) AS BIGINT) AS gehan_chi2_micro,
        |       CAST((sum(CAST(sq AS HUGEINT) * dev_micro) * sum(CAST(sq AS HUGEINT) * dev_micro))
        |            // (1000000 * sum(CAST(nt AS HUGEINT) * v_micro)) AS BIGINT) AS tw_chi2_micro
        |FROM q""".stripMargin,

    "q573_inequality_panel" ->
      """WITH sp AS (SELECT o_custkey,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |           FROM orders GROUP BY 1),
        |sp2 AS (SELECT x, CAST(round(ln(CAST(x AS DOUBLE)) * 1000000) AS BIGINT) AS lx
        |        FROM sp WHERE x > 0),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS st,
        |               sum(CAST(x AS HUGEINT) * lx) AS sxl,
        |               CAST(sum(lx) AS BIGINT) AS sl FROM sp2),
        |hv AS (SELECT sum(abs(CAST(t.n AS HUGEINT) * x - t.st)) AS sad
        |       FROM sp2 CROSS JOIN tot t),
        |f AS (SELECT n, st, sxl, sl, sad,
        |             CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS lnn,
        |             CAST(round(ln(CAST(st AS DOUBLE)) * 1000000) AS BIGINT) AS lns,
        |             CAST(round(exp(CAST(sl // n AS DOUBLE) / 1000000.0)) AS BIGINT) AS geo
        |      FROM tot CROSS JOIN hv)
        |SELECT n AS n_customers, st AS total_cents,
        |       CAST((sxl + CAST(lnn - lns AS HUGEINT) * st) // st AS BIGINT) AS theil_micro,
        |       geo AS geomean_cents,
        |       CAST(1000000 - CAST(geo AS HUGEINT) * n * 1000000 // st AS BIGINT) AS atkinson1_ppm,
        |       CAST(CAST(1000000 AS HUGEINT) * sad // (2 * n * st) AS BIGINT) AS hoover_ppm
        |FROM f""".stripMargin,

    "q574_siegel_tukey" ->
      (twoSegRankCte + """,
        |st AS (SELECT ga, CASE WHEN 2 * i - 1 = nn THEN nn
        |                       WHEN i <= nn - i + 1 THEN
        |                         CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END
        |                       ELSE CASE WHEN (nn - i + 1) % 2 = 1 THEN 2 * (nn - i + 1)
        |                                 ELSE 2 * (nn - i + 1) - 1 END END AS st
        |       FROM rk),
        |ag AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a, CAST(sum(1 - ga) AS BIGINT) AS n_b,
        |              sum(CASE WHEN ga = 1 THEN st ELSE 0 END) AS w_a
        |       FROM st),
        |g AS (SELECT n_a, n_b, w_a, n_a + n_b AS nn FROM ag)
        |SELECT n_a, n_b, CAST(w_a AS BIGINT) AS w_a,
        |       CAST(round(3000 * (2 * CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 1))
        |            * (2 * CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 1))
        |            / (CAST(n_a AS DOUBLE) * n_b * (nn + 1))) AS BIGINT) AS zsq_milli
        |FROM g""".stripMargin),

    "q575_ansari_bradley" ->
      (twoSegRankCte + """,
        |ab AS (SELECT ga, least(i, nn - i + 1) AS ab FROM rk),
        |ag AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a, CAST(sum(1 - ga) AS BIGINT) AS n_b,
        |              sum(CASE WHEN ga = 1 THEN ab ELSE 0 END) AS a_sum
        |       FROM ab),
        |g AS (SELECT n_a, n_b, a_sum, n_a + n_b AS nn FROM ag)
        |SELECT n_a, n_b, CAST(a_sum AS BIGINT) AS a_sum,
        |       CASE WHEN nn % 2 = 0 THEN CAST(round(
        |         3000 * (nn - 1)
        |         * (4 * CAST(a_sum AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 2))
        |         * (4 * CAST(a_sum AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 2))
        |         / (CAST(n_a AS DOUBLE) * n_b * (nn + 2) * (nn - 2))) AS BIGINT)
        |       ELSE CAST(round(3000
        |         * (4 * CAST(nn AS DOUBLE) * a_sum - CAST(n_a AS DOUBLE) * (nn + 1) * (nn + 1))
        |         * (4 * CAST(nn AS DOUBLE) * a_sum - CAST(n_a AS DOUBLE) * (nn + 1) * (nn + 1))
        |         / (CAST(n_a AS DOUBLE) * n_b * (nn + 1) * (CAST(nn AS DOUBLE) * nn + 3))) AS BIGINT) END AS zsq_milli
        |FROM g""".stripMargin),

    "q576_lepage" ->
      (twoSegRankCte + """,
        |ag AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a, CAST(sum(1 - ga) AS BIGINT) AS n_b,
        |              sum(CASE WHEN ga = 1 THEN i ELSE 0 END) AS w_a,
        |              sum(CASE WHEN ga = 1 THEN least(i, nn - i + 1) ELSE 0 END) AS a_sum
        |       FROM rk),
        |g AS (SELECT n_a, n_b, w_a, a_sum, n_a + n_b AS nn FROM ag),
        |z AS (SELECT n_a, n_b,
        |             CAST(round(3000 * (2 * CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 1))
        |                  * (2 * CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 1))
        |                  / (CAST(n_a AS DOUBLE) * n_b * (nn + 1))) AS BIGINT) AS zw2,
        |             CASE WHEN nn % 2 = 0 THEN CAST(round(
        |               3000 * (nn - 1)
        |               * (4 * CAST(a_sum AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 2))
        |               * (4 * CAST(a_sum AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 2))
        |               / (CAST(n_a AS DOUBLE) * n_b * (nn + 2) * (nn - 2))) AS BIGINT)
        |             ELSE CAST(round(3000
        |               * (4 * CAST(nn AS DOUBLE) * a_sum - CAST(n_a AS DOUBLE) * (nn + 1) * (nn + 1))
        |               * (4 * CAST(nn AS DOUBLE) * a_sum - CAST(n_a AS DOUBLE) * (nn + 1) * (nn + 1))
        |               / (CAST(n_a AS DOUBLE) * n_b * (nn + 1) * (CAST(nn AS DOUBLE) * nn + 3))) AS BIGINT) END AS zab2
        |      FROM g)
        |SELECT n_a, n_b, zw2 AS wilcoxon_zsq_milli, zab2 AS ab_zsq_milli,
        |       zw2 + zab2 AS lepage_milli
        |FROM z""".stripMargin),
  )
}
