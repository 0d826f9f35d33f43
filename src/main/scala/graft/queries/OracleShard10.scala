package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard10 {
  val defs: Map[String, String] = Map(

    "q577_cucconi" ->
      (twoSegRankCte + """,
        |ag AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a, CAST(sum(1 - ga) AS BIGINT) AS n_b,
        |              sum(CASE WHEN ga = 1 THEN CAST(i AS HUGEINT) * i ELSE 0 END) AS sr2,
        |              sum(CASE WHEN ga = 1 THEN CAST(nn - i + 1 AS HUGEINT) * (nn - i + 1) ELSE 0 END) AS sc2
        |       FROM rk),
        |g AS (SELECT n_a, n_b, sr2, sc2, n_a + n_b AS nn FROM ag),
        |m AS (SELECT n_a, n_b, nn,
        |             6 * sr2 - CAST(n_a AS HUGEINT) * (nn + 1) * (2 * nn + 1) AS nu,
        |             6 * sc2 - CAST(n_a AS HUGEINT) * (nn + 1) * (2 * nn + 1) AS nv,
        |             CAST(2 * nn + 1 AS HUGEINT) * (8 * nn + 11) AS bb,
        |             CAST(n_a AS DOUBLE) * n_b * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0 AS dd
        |      FROM g),
        |d AS (SELECT n_a, n_b, nu, nv,
        |             CAST(nu AS DOUBLE) * nu / dd AS u2,
        |             CAST(nv AS DOUBLE) * nv / dd AS v2,
        |             CAST(nu AS DOUBLE) * nv / dd AS uv,
        |             (2 * (CAST(nn AS DOUBLE) * nn - 4) - CAST(bb AS DOUBLE)) / CAST(bb AS DOUBLE) AS rho
        |      FROM m)
        |SELECT n_a, n_b, CAST(nu AS BIGINT) AS nu, CAST(nv AS BIGINT) AS nv,
        |       CAST(round((u2 + v2 - 2 * rho * uv) / (2 * (1 - rho * rho)) * 1000) AS BIGINT) AS cucconi_milli
        |FROM d""".stripMargin),

    "q578_quade_test" ->
      """WITH vals AS (SELECT c_nationkey AS blk, o_orderpriority AS trt,
        |                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |              FROM orders JOIN customer ON o_custkey = c_custkey
        |              GROUP BY 1, 2),
        |r AS (SELECT blk, trt, v,
        |             CAST(row_number() OVER (PARTITION BY blk ORDER BY v, trt) AS BIGINT) AS rr,
        |             max(v) OVER (PARTITION BY blk) - min(v) OVER (PARTITION BY blk) AS rng,
        |             CAST(count(*) OVER (PARTITION BY blk) AS BIGINT) AS kk
        |      FROM vals),
        |qd AS (SELECT blk, CAST(row_number() OVER (ORDER BY rng, blk) AS BIGINT) AS q
        |       FROM (SELECT DISTINCT blk, rng FROM r)),
        |sij AS (SELECT trt, r.blk, q * (2 * rr - (kk + 1)) AS s2, kk
        |        FROM r JOIN qd ON r.blk = qd.blk),
        |t AS (SELECT trt, CAST(sum(s2) AS HUGEINT) AS tj FROM sij GROUP BY 1),
        |aa AS (SELECT sum(CAST(s2 AS HUGEINT) * s2) AS aa,
        |              CAST(count(DISTINCT blk) AS BIGINT) AS b,
        |              CAST(max(kk) AS BIGINT) AS k FROM sij),
        |bb AS (SELECT sum(tj * tj) AS bb FROM t)
        |SELECT b AS n_blocks, k AS n_treatments,
        |       CAST(1000 * CAST(b - 1 AS HUGEINT) * bb // (b * aa - bb) AS BIGINT) AS f_milli
        |FROM aa CROSS JOIN bb""".stripMargin,

    "q579_hellinger_sources" ->
      (sourceLangGridCte + """,
        |x AS (SELECT source, CAST(CAST(1000000000000 AS HUGEINT) * c1 * c2
        |                          // (CAST(n1 AS HUGEINT) * ng) AS BIGINT) AS x FROM grid),
        |t0 AS (SELECT source, x, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS t0 FROM x),
        |t1 AS (SELECT source, x, CASE WHEN t0 > 0 THEN (t0 + x // t0) // 2 ELSE 0 END AS t1 FROM t0),
        |sq AS (SELECT source, CASE WHEN (t1 + 1) * (t1 + 1) <= x THEN t1 + 1
        |                           WHEN t1 * t1 > x THEN t1 - 1 ELSE t1 END AS sq FROM t1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |       CAST(sum(sq) AS BIGINT) AS bc_micro,
        |       1000000 - CAST(sum(sq) AS BIGINT) AS h2_micro
        |FROM sq GROUP BY 1 ORDER BY 1""".stripMargin),

    "q580_tv_distance" ->
      (sourceLangGridCte + """
        |SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |       CAST(max(n1) AS BIGINT) AS n_docs,
        |       CAST(1000000 * sum(abs(CAST(c1 AS HUGEINT) * ng - CAST(c2 AS HUGEINT) * n1))
        |            // (2 * CAST(max(n1) AS HUGEINT) * max(ng)) AS BIGINT) AS tv_micro
        |FROM grid GROUP BY 1 ORDER BY 1""".stripMargin),

    "q581_chi2_divergence" ->
      (sourceLangGridCte + """,
        |dd AS (SELECT source, CAST(c1 AS HUGEINT) * ng - CAST(c2 AS HUGEINT) * n1 AS dd,
        |              n1, ng, c2 FROM grid),
        |term AS (SELECT source,
        |                CAST((1000000 * dd // (CAST(n1 AS HUGEINT) * n1)) * dd
        |                     // (CAST(ng AS HUGEINT) * c2) AS BIGINT) AS term
        |         FROM dd)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |       CAST(sum(term) AS BIGINT) AS chi2_micro
        |FROM term GROUP BY 1 ORDER BY 1""".stripMargin),

    "q582_good_turing" ->
      """WITH ws AS (SELECT string_split(text, ' ') AS ws
        |            FROM documents WHERE text IS NOT NULL),
        |bg AS (SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b
        |       FROM ws WHERE len(ws) >= 2),
        |wc AS (SELECT b, CAST(count(*) AS BIGINT) AS r FROM bg GROUP BY 1),
        |nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY 1),
        |ld AS (SELECT r, n_r, lead(r) OVER (ORDER BY r) AS next_r,
        |              lead(n_r) OVER (ORDER BY r) AS next_n,
        |              row_number() OVER (ORDER BY r) AS rk FROM nr)
        |SELECT r, n_r,
        |       CASE WHEN next_r = r + 1 THEN 1000 * (r + 1) * next_n // n_r
        |            ELSE 0 END AS rstar_milli
        |FROM ld WHERE rk <= 10 ORDER BY r""".stripMargin,

    "q583_gk_gamma" ->
      """WITH sp AS (SELECT o_custkey,
        |                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
        |            FROM orders GROUP BY 1),
        |qt AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS ab, spend
        |       FROM customer JOIN sp ON c_custkey = o_custkey),
        |nt AS (SELECT ntile(4) OVER (ORDER BY ab, c_custkey) AS qa,
        |              ntile(4) OVER (ORDER BY spend, c_custkey) AS qs FROM qt),
        |cells AS (SELECT qa, qs, CAST(count(*) AS BIGINT) AS n FROM nt GROUP BY 1, 2),
        |p AS (SELECT sum(CASE WHEN b.qa > a.qa AND b.qs > a.qs
        |                      THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS c_pairs,
        |             sum(CASE WHEN b.qa > a.qa AND b.qs < a.qs
        |                      THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS d_pairs
        |      FROM cells a CROSS JOIN cells b)
        |SELECT CAST(c_pairs AS BIGINT) AS concordant, CAST(d_pairs AS BIGINT) AS discordant,
        |       CAST(1000 * (c_pairs - d_pairs) // (c_pairs + d_pairs) AS BIGINT) AS gamma_milli
        |FROM p""".stripMargin,

    "q584_nelson_aalen" ->
      """WITH life AS (SELECT o_custkey,
        |                     CAST(datediff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS t
        |              FROM orders GROUP BY 1),
        |et AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM life GROUP BY 1),
        |r AS (SELECT t, d, CAST(sum(d) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
        |                        AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk FROM et),
        |h AS (SELECT t, d, n_risk, 1000000 * d // n_risk AS term FROM r)
        |SELECT t, d, n_risk,
        |       CAST(sum(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS BIGINT) AS na_micro
        |FROM h ORDER BY t""".stripMargin,

    "q585_chow_test" ->
      (dailySsrPrefix + """,
        |sa AS (SELECT CASE WHEN x < datediff('day', DATE '1995-01-01', DATE '1998-04-01')
        |                   THEN 1 ELSE 2 END AS g, * FROM days),
        |m1 AS (""".stripMargin + ssrSelect("sa", "g") + """),
        |m0 AS (""".stripMargin + ssrSelect("days", "0") + """),
        |seg AS (SELECT CAST(min(CASE WHEN g = 1 THEN n END) AS BIGINT) AS n_pre,
        |               CAST(min(CASE WHEN g = 2 THEN n END) AS BIGINT) AS n_post,
        |               min(CASE WHEN g = 1 THEN ssr END) AS ssr1,
        |               min(CASE WHEN g = 2 THEN ssr END) AS ssr2
        |        FROM m1)
        |SELECT m0.n AS n_days, n_pre, n_post, m0.ssr AS ssr_pooled,
        |       CAST(1000 * CAST(m0.ssr - ssr1 - ssr2 AS HUGEINT) * (m0.n - 4)
        |            // (2 * CAST(ssr1 + ssr2 AS HUGEINT)) AS BIGINT) AS f_milli
        |FROM seg CROSS JOIN m0""".stripMargin),

    "q586_goldfeld_quandt" ->
      (dailySsrPrefix + """,
        |tr AS (SELECT CAST(ntile(3) OVER (ORDER BY x) AS BIGINT) AS g, *
        |       FROM days),
        |trf AS (SELECT * FROM tr WHERE g <> 2),
        |m1 AS (""".stripMargin + ssrSelect("trf", "g") + """)
        |SELECT CAST(min(CASE WHEN g = 1 THEN n END) AS BIGINT) AS n_low,
        |       CAST(min(CASE WHEN g = 3 THEN n END) AS BIGINT) AS n_high,
        |       min(CASE WHEN g = 1 THEN ssr END) AS ssr_low,
        |       min(CASE WHEN g = 3 THEN ssr END) AS ssr_high,
        |       CAST(1000 * CAST(min(CASE WHEN g = 3 THEN ssr END) AS HUGEINT)
        |            * (min(CASE WHEN g = 1 THEN n END) - 2)
        |            // (CAST(min(CASE WHEN g = 1 THEN ssr END) AS HUGEINT)
        |               * (min(CASE WHEN g = 3 THEN n END) - 2)) AS BIGINT) AS gq_milli
        |FROM m1""".stripMargin),

    "q587_brier_decomposition" ->
      """WITH o AS (SELECT c_mktsegment AS sg,
        |                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS yy,
        |                  o_orderdate < DATE '1998-01-01' AS is_train
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |p AS (SELECT sg, 1000000 * CAST(sum(yy) AS BIGINT) // count(*) AS p_ppm
        |      FROM o WHERE is_train GROUP BY 1),
        |k AS (SELECT o.sg, CAST(count(*) AS BIGINT) AS nk, CAST(sum(yy) AS BIGINT) AS uk,
        |             1000000 * CAST(sum(yy) AS BIGINT) // count(*) AS o_ppm,
        |             min(p_ppm) AS p_ppm
        |      FROM o JOIN p ON o.sg = p.sg WHERE NOT is_train GROUP BY o.sg),
        |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(uk) AS BIGINT) AS u,
        |               1000000 * CAST(sum(uk) AS BIGINT) // CAST(sum(nk) AS BIGINT) AS obar
        |        FROM k)
        |SELECT n AS n_test,
        |       CAST(sum(nk * CAST(p_ppm - o_ppm AS HUGEINT) * (p_ppm - o_ppm))
        |            // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS rel_micro,
        |       CAST(sum(nk * CAST(o_ppm - obar AS HUGEINT) * (o_ppm - obar))
        |            // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS res_micro,
        |       obar * (1000000 - obar) // 1000000 AS unc_micro
        |FROM k CROSS JOIN tot GROUP BY n, obar""".stripMargin,

    "q588_lorenz_deciles" ->
      """WITH sp AS (SELECT o_custkey,
        |                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |            FROM orders GROUP BY 1),
        |d AS (SELECT v, ntile(10) OVER (ORDER BY v, o_custkey) AS dec_ FROM sp),
        |g AS (SELECT CAST(dec_ AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n_cust,
        |             CAST(sum(v) AS BIGINT) AS sv FROM d GROUP BY 1),
        |c AS (SELECT decile, n_cust,
        |             CAST(sum(sv) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |                  AND CURRENT ROW) AS BIGINT) AS cum,
        |             CAST(sum(sv) OVER () AS BIGINT) AS tot FROM g)
        |SELECT decile, n_cust,
        |       CAST(1000000 * CAST(cum AS HUGEINT) // tot AS BIGINT) AS cum_share_ppm
        |FROM c ORDER BY decile""".stripMargin,

    "q589_clv_discounted" ->
      """WITH o AS (SELECT c_mktsegment AS segment, c_custkey,
        |                  CAST(year(o_orderdate) - 1995 AS BIGINT) AS yk,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |d AS (SELECT segment, c_custkey, v,
        |             v * (CASE yk WHEN 0 THEN 1000 WHEN 1 THEN 900 WHEN 2 THEN 810
        |                          WHEN 3 THEN 729 WHEN 4 THEN 656 WHEN 5 THEN 590
        |                          ELSE 531 END) // 1000 AS dv
        |      FROM o),
        |g AS (SELECT segment, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
        |             CAST(sum(v) AS BIGINT) AS nominal_cents,
        |             CAST(sum(dv) AS BIGINT) AS clv_cents
        |      FROM d GROUP BY 1)
        |SELECT segment, n_customers, nominal_cents, clv_cents,
        |       CAST(1000000 * CAST(nominal_cents - clv_cents AS HUGEINT)
        |            // nominal_cents AS BIGINT) AS discount_loss_ppm
        |FROM g ORDER BY 1""".stripMargin,

    "q590_eccentricity" ->
      ("WITH " + nationEdgesCte + """,
        |nodes AS (SELECT DISTINCT a AS n FROM ed),
        |d0 AS (SELECT n AS src, n AS dst, CAST(0 AS BIGINT) AS d FROM nodes
        |       UNION ALL SELECT a AS src, b AS dst, CAST(1 AS BIGINT) AS d FROM ed)""".stripMargin +
        (1 to 4).map { k =>
          s""",
             |r$k AS (SELECT src, dst, CAST(min(d) AS BIGINT) AS d FROM (
             |         SELECT src, dst, d FROM ${if (k == 1) "d0" else s"r${k - 1}"}
             |         UNION ALL
             |         SELECT p.src, ed.b AS dst, p.d + 1 AS d
             |         FROM ${if (k == 1) "d0" else s"r${k - 1}"} p JOIN ed ON p.dst = ed.a)
             |       GROUP BY 1, 2)""".stripMargin
        }.mkString + """,
        |agg AS (SELECT src, CAST(count(*) AS BIGINT) AS n_reached,
        |               CAST(max(d) AS BIGINT) AS ecc
        |        FROM r4 GROUP BY 1)
        |SELECT n_name AS nation, n_reached, ecc
        |FROM agg JOIN nation ON src = n_nationkey ORDER BY 1""".stripMargin),

    "q591_lsm_write_amp" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |                  CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS bytes
        |           FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |l AS (SELECT source, n_docs, bytes,
        |             CAST(CASE WHEN bytes <= 4194304 THEN 1
        |                       WHEN bytes <= 41943040 THEN 2
        |                       WHEN bytes <= 419430400 THEN 3
        |                       WHEN bytes <= 4194304000 THEN 4
        |                       WHEN bytes <= 41943040000 THEN 5
        |                       WHEN bytes <= 419430400000 THEN 6 ELSE 7 END AS BIGINT) AS levels
        |      FROM g)
        |SELECT source, n_docs, bytes, levels,
        |       CAST(1 + 10 * (levels - 1) AS BIGINT) AS write_amp,
        |       levels AS read_amp
        |FROM l ORDER BY source""".stripMargin,

    "q592_mcc" ->
      """WITH o AS (SELECT c_mktsegment AS sg,
        |                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS yy,
        |                  o_orderdate < DATE '1998-01-01' AS is_train
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |p AS (SELECT sg, CAST(sum(yy) AS BIGINT) AS uk, CAST(count(*) AS BIGINT) AS nk
        |      FROM o WHERE is_train GROUP BY 1),
        |gl AS (SELECT CAST(sum(yy) AS BIGINT) AS ug, CAST(count(*) AS BIGINT) AS ng
        |       FROM o WHERE is_train),
        |pred AS (SELECT sg, CAST(CASE WHEN uk * ng > ug * nk THEN 1 ELSE 0 END AS BIGINT) AS ph
        |         FROM p CROSS JOIN gl),
        |cm AS (SELECT CAST(sum(CASE WHEN ph = 1 AND yy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |              CAST(sum(CASE WHEN ph = 1 AND yy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |              CAST(sum(CASE WHEN ph = 0 AND yy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |              CAST(sum(CASE WHEN ph = 0 AND yy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |       FROM o JOIN pred ON o.sg = pred.sg WHERE NOT is_train),
        |d2c AS (SELECT tp, fp, tn, fn,
        |               CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn) AS d2
        |        FROM cm),
        |t0c AS (SELECT *, CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS HUGEINT) AS t0 FROM d2c),
        |t1c AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + d2 // t0) // 2
        |                       ELSE CAST(0 AS HUGEINT) END AS t1 FROM t0c),
        |sqc AS (SELECT tp, fp, tn, fn, d2,
        |               CASE WHEN (t1 + 1) * (t1 + 1) <= d2 THEN t1 + 1
        |                    WHEN t1 * t1 > d2 THEN t1 - 1 ELSE t1 END AS sq FROM t1c)
        |SELECT tp, fp, tn, fn,
        |       CAST(1000 * (CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn)
        |            // sq AS BIGINT) AS mcc_milli
        |FROM sqc""".stripMargin,

    "q593_average_precision" ->
      """WITH sp AS (SELECT o_custkey,
        |                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
        |            FROM orders GROUP BY 1),
        |sc AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS ab, spend
        |       FROM customer JOIN sp ON c_custkey = o_custkey),
        |r AS (SELECT c_custkey, ab,
        |             CASE WHEN ntile(4) OVER (ORDER BY spend, c_custkey) = 4
        |                  THEN 1 ELSE 0 END AS rel FROM sc),
        |k AS (SELECT CAST(row_number() OVER (ORDER BY ab DESC, c_custkey) AS BIGINT) AS k,
        |             rel FROM r),
        |t AS (SELECT k, rel, CAST(sum(rel) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND CURRENT ROW) AS BIGINT) AS tp FROM k)
        |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rel) AS BIGINT) AS n_pos,
        |       CAST(sum(CASE WHEN rel = 1 THEN 1000000 * tp // k ELSE 0 END)
        |            // sum(rel) AS BIGINT) AS ap_micro
        |FROM t""".stripMargin,

    "q594_theil_sen" ->
      """WITH m AS (SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
        |                       AS BIGINT) AS mo,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |           FROM orders GROUP BY 1),
        |p AS (SELECT CAST(1000000 * CAST(b.rev - a.rev AS HUGEINT)
        |                  // (b.mo - a.mo) AS BIGINT) AS sl,
        |             a.mo AS mo, b.mo AS mo2
        |      FROM m a JOIN m b ON a.mo < b.mo),
        |r AS (SELECT sl, row_number() OVER (ORDER BY sl, mo, mo2) AS rk,
        |             count(*) OVER () AS np FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST((CAST(sum(CASE WHEN rk = (np + 1) // 2 THEN sl END) AS BIGINT)
        |           + CAST(sum(CASE WHEN rk = (np + 2) // 2 THEN sl END) AS BIGINT))
        |            // 2 AS BIGINT) AS theil_sen_micro
        |FROM r""".stripMargin,

    "q595_distinct_n" ->
      """WITH w AS (SELECT source, doc_id, string_split(text, ' ') AS ws
        |           FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |u AS (SELECT source, unnest(ws) AS w FROM w),
        |uni AS (SELECT source, CAST(count(*) AS BIGINT) AS n_uni,
        |               CAST(count(DISTINCT w) AS BIGINT) AS d_uni FROM u GROUP BY 1),
        |bg AS (SELECT source, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b
        |       FROM w WHERE len(ws) >= 2),
        |bi AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bi,
        |              CAST(count(DISTINCT b) AS BIGINT) AS d_bi FROM bg GROUP BY 1)
        |SELECT uni.source, n_uni, d_uni, 1000000 * d_uni // n_uni AS distinct1_ppm,
        |       n_bi, d_bi, 1000000 * d_bi // n_bi AS distinct2_ppm
        |FROM uni JOIN bi ON uni.source = bi.source ORDER BY 1""".stripMargin,

    "q596_span_corruption" ->
      """WITH d AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |           FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |x AS (SELECT source, nt, (nt * 15 + 50) // 100 AS nm FROM d),
        |y AS (SELECT source, nt, nm,
        |             CASE WHEN nm = 0 THEN 0 ELSE greatest(1, (nm + 1) // 3) END AS ns
        |      FROM x),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(nt) AS BIGINT) AS raw_tokens,
        |             CAST(sum(nt - nm + ns) AS BIGINT) AS encoder_tokens,
        |             CAST(sum(nm + ns + 1) AS BIGINT) AS decoder_tokens
        |      FROM y GROUP BY 1)
        |SELECT source, n_docs, raw_tokens, encoder_tokens, decoder_tokens,
        |       1000000 * (encoder_tokens + decoder_tokens - raw_tokens)
        |         // raw_tokens AS overhead_ppm
        |FROM g ORDER BY 1""".stripMargin,

    "q597_life_table" ->
      """WITH life AS (SELECT o_custkey,
        |                     CAST(datediff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS t
        |              FROM orders GROUP BY 1),
        |b AS (SELECT t // 30 AS band, CAST(count(*) AS BIGINT) AS d FROM life GROUP BY 1),
        |r AS (SELECT band, d,
        |             CAST(sum(d) OVER (ORDER BY band ROWS BETWEEN CURRENT ROW
        |                  AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
        |             CAST(sum(d) OVER () AS BIGINT) AS total FROM b)
        |SELECT band, d, n_risk, 1000000 * d // n_risk AS qx_micro,
        |       1000000 * n_risk // total AS lx_ppm
        |FROM r ORDER BY band""".stripMargin,

    "q598_shard_rebalance" ->
      """WITH h AS (SELECT CAST(concat('0x', substr(md5('shard#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |                       AS BIGINT) % 16 AS shard
        |           FROM documents),
        |c AS (SELECT shard, CAST(count(*) AS BIGINT) AS cnt FROM h GROUP BY 1),
        |r AS (SELECT shard, cnt, CAST(sum(cnt) OVER () AS BIGINT) AS n,
        |             CAST(row_number() OVER (ORDER BY cnt DESC, shard) AS BIGINT) AS rk
        |      FROM c),
        |x AS (SELECT *, CASE WHEN rk <= n % 16 THEN n // 16 + 1 ELSE n // 16 END AS cap
        |      FROM r)
        |SELECT CAST(max(n) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_shards,
        |       CAST(max(cnt) AS BIGINT) AS max_shard, CAST(min(cnt) AS BIGINT) AS min_shard,
        |       CAST(sum(greatest(cnt - cap, 0)) AS BIGINT) AS moves,
        |       CAST(1000000 * CAST(sum(greatest(cnt - cap, 0)) AS BIGINT)
        |            // max(n) AS BIGINT) AS moves_ppm
        |FROM x""".stripMargin,

    "q599_split_gini" ->
      ("""WITH o AS (SELECT c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nat,
        |                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS yy
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(yy) AS BIGINT) AS u FROM o)""".stripMargin +
        Seq("mktsegment" -> "seg", "nation" -> "nat").zipWithIndex.map { case ((fname, fcol), i) =>
          s""",
             |f$i AS (SELECT $fcol AS v, CAST(count(*) AS BIGINT) AS nv,
             |               CAST(sum(yy) AS BIGINT) AS uv FROM o GROUP BY 1),
             |t$i AS (SELECT CAST(2000000 * CAST(uv AS HUGEINT) * (nv - uv)
             |                    // (CAST(nv AS HUGEINT) * n) AS BIGINT) AS term, n, u
             |        FROM f$i CROSS JOIN tot),
             |g$i AS (SELECT '$fname' AS feature, CAST(count(*) AS BIGINT) AS n_values,
             |               CAST(max(2000000 * CAST(u AS HUGEINT) * (n - u)
             |                    // (CAST(n AS HUGEINT) * n)) AS BIGINT) AS root_gini_micro,
             |               CAST(sum(term) AS BIGINT) AS split_gini_micro
             |        FROM t$i)""".stripMargin
        }.mkString + """,
        |uu AS (SELECT * FROM g0 UNION ALL SELECT * FROM g1)
        |SELECT feature, n_values, root_gini_micro, split_gini_micro,
        |       root_gini_micro - split_gini_micro AS gain_micro
        |FROM uu ORDER BY feature""".stripMargin),

    "q600_silhouette" ->
      s"""$ivfAssignCte,
         |qv AS (SELECT vec_id, bucket, CAST(i AS BIGINT) AS pos,
         |              CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
         |       FROM asg CROSS JOIN unnest(range(0, len(e))) AS u(i)),
         |cent AS (SELECT bucket AS cb, pos, CAST(sum(qv) // count(*) AS BIGINT) AS cq
         |         FROM qv GROUP BY 1, 2),
         |d2 AS (SELECT q.vec_id, q.bucket, c.cb,
         |              CAST(sum((q.qv - c.cq) * (q.qv - c.cq)) AS BIGINT) AS d2
         |       FROM qv q JOIN cent c ON q.pos = c.pos GROUP BY 1, 2, 3),
         |ab AS (SELECT vec_id, bucket,
         |              min(CASE WHEN cb = bucket THEN d2 END) AS a2,
         |              min(CASE WHEN cb <> bucket THEN d2 END) AS b2
         |       FROM d2 GROUP BY 1, 2),
         |sm AS (SELECT bucket, 1000000 * (b2 - a2) // greatest(a2, b2) AS sm
         |       FROM ab WHERE greatest(a2, b2) > 0)
         |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_vectors,
         |       CAST(sum(sm) // count(*) AS BIGINT) AS mean_sil_micro
         |FROM sm GROUP BY 1 ORDER BY 1""".stripMargin,

    "q601_label_propagation" ->
      ("WITH " + nationEdgesCte + """,
        |nodes AS (SELECT DISTINCT a AS n FROM ed),
        |l0 AS (SELECT n, n AS lbl FROM nodes)""".stripMargin +
        (1 to 4).map { k =>
          s""",
             |v$k AS (SELECT n, lbl, count(*) AS c FROM (
             |         SELECT ed.a AS n, p.lbl FROM ed JOIN l${k - 1} p ON ed.b = p.n
             |         UNION ALL SELECT n, lbl FROM l${k - 1}) GROUP BY 1, 2),
             |l$k AS (SELECT n, lbl FROM (
             |         SELECT n, lbl, row_number() OVER (PARTITION BY n
             |           ORDER BY c DESC, lbl) AS rk FROM v$k) WHERE rk = 1)""".stripMargin
        }.mkString + """
        |SELECT CAST(lbl AS BIGINT) AS community, CAST(count(*) AS BIGINT) AS size
        |FROM l4 GROUP BY 1 ORDER BY 1""".stripMargin),

    "q602_region_mixing" ->
      """WITH w0 AS MATERIALIZED (
        |  SELECT s_nationkey AS sn, c_nationkey AS cn,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |w AS (SELECT ns.n_regionkey AS ri, nc.n_regionkey AS rj,
        |             CAST(sum(w0.w) AS BIGINT) AS w
        |      FROM w0
        |      JOIN nation ns ON w0.sn = ns.n_nationkey
        |      JOIN nation nc ON w0.cn = nc.n_nationkey
        |      GROUP BY 1, 2),
        |rs AS (SELECT ri, CAST(sum(w) AS BIGINT) AS rw FROM w GROUP BY 1),
        |cs AS (SELECT rj, CAST(sum(w) AS BIGINT) AS cw FROM w GROUP BY 1),
        |sp AS (SELECT sum(CAST(rw AS HUGEINT) * cw) AS sprod
        |       FROM rs JOIN cs ON ri = rj),
        |tt AS (SELECT sum(CAST(w AS HUGEINT)) AS tw,
        |              CAST(sum(CASE WHEN ri = rj THEN w ELSE 0 END) AS BIGINT) AS diag
        |       FROM w)
        |SELECT CAST(tw AS BIGINT) AS total_cents, diag AS intra_cents,
        |       CAST(1000 * (tw * CAST(diag AS HUGEINT) - sprod)
        |            // (tw * tw - sprod) AS BIGINT) AS assort_milli
        |FROM tt CROSS JOIN sp""".stripMargin,

    "q603_percolation_sweep" ->
      ("WITH RECURSIVE " + nationTradeCte + """,
        |ranked AS (SELECT a, b, CAST(row_number() OVER (ORDER BY w, a, b) AS BIGINT) AS rk,
        |                  CAST(count(*) OVER () AS BIGINT) AS np FROM rev),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nations FROM nation)""".stripMargin +
        (1 to 3).map { k =>
          s""",
             |e$k AS (SELECT a, b FROM ranked WHERE rk > $k * np // 4),
             |u$k AS (SELECT a AS u, b AS v FROM e$k UNION SELECT b, a FROM e$k),
             |reach$k(u, l) AS (
             |  SELECT u, u FROM (SELECT DISTINCT u FROM u$k)
             |  UNION
             |  SELECT u$k.u, reach$k.l FROM u$k JOIN reach$k ON u$k.v = reach$k.u),
             |lbl$k AS (SELECT u, min(l) AS l FROM reach$k GROUP BY u),
             |sz$k AS (SELECT l, CAST(count(*) AS BIGINT) AS sz FROM lbl$k GROUP BY 1),
             |g$k AS (SELECT CAST($k AS BIGINT) AS quartile,
             |               (SELECT CAST(count(*) AS BIGINT) FROM e$k) AS n_edges,
             |               CAST(count(*) AS BIGINT) AS n_components,
             |               CAST(sum(sz) AS BIGINT) AS n_connected,
             |               CAST(max(sz) AS BIGINT) AS giant_size,
             |               CAST(1000000 * max(sz) // (SELECT n_nations FROM nn) AS BIGINT) AS giant_frac_ppm
             |        FROM sz$k)""".stripMargin
        }.mkString + """
        |SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3
        |ORDER BY quartile""".stripMargin),

    "q604_borda_brands" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT c_mktsegment AS seg, p_brand AS brand,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT brand, CAST(row_number() OVER (PARTITION BY seg
        |             ORDER BY rev DESC, brand) AS BIGINT) AS rk FROM rev),
        |p AS (SELECT brand, greatest(11 - rk, 0) AS pts, rk FROM r)
        |SELECT brand, CAST(sum(pts) AS BIGINT) AS borda_points,
        |       CAST(sum(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_ballots
        |FROM p GROUP BY 1 HAVING sum(pts) > 0
        |ORDER BY borda_points DESC, brand""".stripMargin,

    "q605_mauve_proxy" ->
      (s"""$ivfAssignCte,
         |lb AS (SELECT vec_id AS vid2, CAST(label AS BIGINT) AS label
         |       FROM embeddings WHERE label IS NOT NULL),
         |ag AS (SELECT lb.label, asg.bucket FROM asg JOIN lb ON asg.vec_id = lb.vid2),
         |c0 AS (SELECT label, bucket, CAST(count(*) AS BIGINT) AS craw FROM ag GROUP BY 1, 2),
         |nl AS (SELECT label, CAST(sum(craw) AS BIGINT) AS n FROM c0 GROUP BY 1),
         |g AS (SELECT bucket, CAST(sum(craw) AS BIGINT) AS gc FROM c0 GROUP BY 1),
         |ng AS (SELECT CAST(sum(craw) AS BIGINT) AS ntot FROM c0),
         |grid AS (SELECT nl.label, g.bucket, coalesce(c0.craw, 0) AS c, nl.n, g.gc, ng.ntot
         |         FROM nl CROSS JOIN g CROSS JOIN ng
         |         LEFT JOIN c0 ON c0.label = nl.label AND c0.bucket = g.bucket),
         |t AS (SELECT label, n,
         |             CASE WHEN c = 0 THEN 0
         |                  ELSE c * CAST(round(ln(CAST(2 * c * ntot AS DOUBLE)
         |                         / (c * ntot + gc * n)) * 1000000) AS BIGINT) // n END AS t1,
         |             gc * CAST(round(ln(CAST(2 * gc * n AS DOUBLE)
         |                  / (c * ntot + gc * n)) * 1000000) AS BIGINT) // ntot AS t2
         |      FROM grid)
         |SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
         |       CAST((sum(t1) + sum(t2)) // 2 AS BIGINT) AS jsd_micro
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),

    "q606_hopkins" ->
      """WITH qv AS MATERIALIZED (
        |  SELECT vec_id, CAST(i AS BIGINT) AS pos,
        |         CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS qv
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |        WHERE embedding IS NOT NULL)
        |  CROSS JOIN unnest(range(0, len(e))) AS u(i)),
        |ids AS (SELECT vec_id AS sid FROM (
        |          SELECT vec_id, row_number() OVER (ORDER BY
        |            CAST(concat('0x', substr(md5('hop#' || CAST(vec_id AS VARCHAR)), 1, 12))
        |                 AS BIGINT), vec_id) AS rk
        |          FROM (SELECT DISTINCT vec_id FROM qv)) WHERE rk <= 64),
        |sq AS (SELECT sid, pos, qv AS sq FROM qv JOIN ids ON vec_id = sid),
        |w1 AS (SELECT sid, q.vec_id AS oid, CAST(sum((sq - q.qv) * (sq - q.qv)) AS BIGINT) AS d2
        |       FROM sq JOIN qv q USING (pos) WHERE q.vec_id <> sid GROUP BY 1, 2),
        |w2 AS (SELECT sid, min(d2) AS nn2 FROM w1 GROUP BY 1),
        |w AS (SELECT CAST(sum(nn2) AS BIGINT) AS sum_w, CAST(count(*) AS BIGINT) AS m FROM w2),
        |dims AS (SELECT pos, CAST(min(qv) AS BIGINT) AS lo, CAST(max(qv) AS BIGINT) AS hi
        |         FROM qv GROUP BY 1),
        |refs AS (SELECT r, pos,
        |                lo + CAST(concat('0x', substr(md5('hopu#' || CAST(r AS VARCHAR)
        |                     || '#' || CAST(pos AS VARCHAR)), 1, 12)) AS BIGINT)
        |                   % (hi - lo + 1) AS uq
        |         FROM (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS r) CROSS JOIN dims),
        |u1 AS (SELECT r, vec_id, CAST(sum((uq - qv) * (uq - qv)) AS BIGINT) AS d2
        |       FROM refs JOIN qv USING (pos) GROUP BY 1, 2),
        |u2 AS (SELECT r, min(d2) AS nn2 FROM u1 GROUP BY 1),
        |uu AS (SELECT CAST(sum(nn2) AS BIGINT) AS sum_u FROM u2)
        |SELECT m, sum_u, sum_w,
        |       CAST(1000000 * CAST(sum_u AS HUGEINT)
        |            // (CAST(sum_u AS HUGEINT) + sum_w) AS BIGINT) AS hopkins_micro
        |FROM w CROSS JOIN uu""".stripMargin,

    "q607_backlog_aging" ->
      """WITH o AS (SELECT o_orderstatus AS status,
        |                  CAST(datediff('day', o_orderdate,
        |                       (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS age,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders WHERE o_orderstatus <> 'F')
        |SELECT status, least(age // 180, 5) AS band,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(v) AS BIGINT) AS value_cents
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q608_autoscaling" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |r AS (SELECT cnt, CAST(row_number() OVER (ORDER BY cnt, h) AS BIGINT) AS rk,
        |             CAST(count(*) OVER () AS BIGINT) AS nh FROM h),
        |a AS (SELECT CAST(max(nh) AS BIGINT) AS n_hours,
        |             CAST(sum(cnt) // count(*) AS BIGINT) AS mean_per_hour,
        |             CAST(max(CASE WHEN rk = (19 * nh + 19) // 20 THEN cnt END) AS BIGINT)
        |               AS p95_per_hour
        |      FROM r)
        |SELECT n_hours, mean_per_hour, p95_per_hour,
        |       (p95_per_hour + 999) // 1000 AS replicas,
        |       1000000 * p95_per_hour // mean_per_hour AS burst_ratio_ppm
        |FROM a""".stripMargin,

    "q609_cdc_chunking" ->
      """WITH base AS (SELECT source, doc_id, text, CAST(length(text) AS BIGINT) AS len
        |              FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |pos AS (SELECT source, unnest([substr(text, i, 8) for i in range(1, len(text) - 6)]) AS w
        |        FROM base WHERE len >= 8),
        |cuts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_positions,
        |                CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(w), 1, 12)) AS BIGINT)
        |                              % 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts
        |         FROM pos GROUP BY 1),
        |b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(len) AS BIGINT) AS n_chars FROM base GROUP BY 1)
        |SELECT b.source, n_docs, n_chars, n_cuts,
        |       n_chars // (n_cuts + n_docs) AS mean_chunk_len,
        |       1000000 * n_cuts // n_positions AS cut_rate_ppm
        |FROM b JOIN cuts ON b.source = cuts.source ORDER BY 1""".stripMargin,

    "q610_cross_source_dups" ->
      (s"""WITH ${minhashChain("documents")},
         |src AS (SELECT doc_id, source FROM documents),
         |m AS (SELECT least(a.source, b.source) AS source_a,
         |             greatest(a.source, b.source) AS source_b
         |      FROM cand JOIN src a ON cand.doc_a = a.doc_id
         |                JOIN src b ON cand.doc_b = b.doc_id)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q611_index_advisor" ->
      """WITH m AS MATERIALIZED (
        |  SELECT o_orderkey, 'o_custkey' AS colname, CAST(o_custkey AS VARCHAR) AS val FROM orders
        |  UNION ALL SELECT o_orderkey, 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
        |  UNION ALL SELECT o_orderkey, 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT o_orderkey, 'o_orderstatus', o_orderstatus FROM orders),
        |c AS (SELECT colname, val,
        |             CASE WHEN val = lag(val) OVER (PARTITION BY colname ORDER BY o_orderkey)
        |                  THEN 0 ELSE 1 END AS chg
        |      FROM m),
        |g AS (SELECT colname, CAST(count(*) AS BIGINT) AS n_rows,
        |             CAST(count(DISTINCT val) AS BIGINT) AS ndv,
        |             CAST(sum(chg) AS BIGINT) AS runs FROM c GROUP BY 1),
        |a AS (SELECT *, n_rows // runs AS avg_run_len FROM g)
        |SELECT colname, n_rows, ndv, runs, avg_run_len,
        |       CASE WHEN ndv <= 16 AND avg_run_len >= 4 THEN 'rle'
        |            WHEN ndv <= 1024 THEN 'dict'
        |            WHEN ndv * 10 >= n_rows THEN 'minmax'
        |            ELSE 'bloom' END AS advice
        |FROM a ORDER BY colname""".stripMargin,

    "q612_benford_second" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 2, 1) AS BIGINT) AS d2
        |      FROM v WHERE v >= 10),
        |g AS (SELECT d2, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT d2, n_obs, CAST(sum(n_obs) OVER () AS BIGINT) AS n FROM g),
        |e AS (SELECT *, CASE d2 WHEN 0 THEN 119679 WHEN 1 THEN 113890
        |                        WHEN 2 THEN 108821 WHEN 3 THEN 104330
        |                        WHEN 4 THEN 100308 WHEN 5 THEN 96677
        |                        WHEN 6 THEN 93375 WHEN 7 THEN 90352
        |                        WHEN 8 THEN 87570 ELSE 84997 END AS ex FROM t)
        |SELECT d2 AS digit, n_obs, 1000000 * n_obs // n AS obs_ppm,
        |       CAST(ex AS BIGINT) AS exp_ppm,
        |       1000000 * n_obs // n - ex AS dev_ppm
        |FROM e ORDER BY digit""".stripMargin,

    "q613_winners_curse" ->
      """WITH h AS (SELECT o_custkey,
        |                  CAST(sum(CASE WHEN o_orderdate < DATE '1998-07-01'
        |                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |                           ELSE 0 END) AS BIGINT) AS s1,
        |                  CAST(sum(CASE WHEN o_orderdate >= DATE '1998-07-01'
        |                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |                           ELSE 0 END) AS BIGINT) AS s2
        |           FROM orders GROUP BY 1),
        |f AS (SELECT * FROM h WHERE s1 > 0),
        |t AS (SELECT s1, s2, ntile(10) OVER (ORDER BY s1, o_custkey) AS dec_ FROM f),
        |a AS (SELECT CAST(sum(CASE WHEN dec_ = 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
        |             CAST(sum(CASE WHEN dec_ = 10 THEN s1 ELSE 0 END) AS BIGINT) AS top_h1,
        |             CAST(sum(CASE WHEN dec_ = 10 THEN s2 ELSE 0 END) AS BIGINT) AS top_h2,
        |             CAST(sum(s1) AS BIGINT) AS all_h1, CAST(sum(s2) AS BIGINT) AS all_h2
        |      FROM t)
        |SELECT n_top, top_h1, top_h2,
        |       CAST(1000000 * CAST(top_h2 AS HUGEINT) // top_h1 AS BIGINT) AS top_ratio_ppm,
        |       CAST(1000000 * CAST(all_h2 AS HUGEINT) // all_h1 AS BIGINT) AS all_ratio_ppm,
        |       CAST(1000000 * CAST(all_h2 AS HUGEINT) // all_h1
        |            - 1000000 * CAST(top_h2 AS HUGEINT) // top_h1 AS BIGINT)
        |         AS regression_gap_ppm
        |FROM a""".stripMargin,

    "q614_sq_sweep" ->
      """WITH qv AS (SELECT CAST(i AS BIGINT) AS pos,
        |                  CAST(round(e[CAST(i AS INT) + 1] * 1000000) AS BIGINT) AS x
        |            FROM (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |                  WHERE embedding IS NOT NULL)
        |            CROSS JOIN unnest(range(0, len(e))) AS u(i)),
        |dims AS (SELECT pos, CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi
        |         FROM qv GROUP BY 1),
        |j AS (SELECT x, lo, hi - lo AS span, unnest([4, 6, 8]) AS b
        |      FROM qv JOIN dims USING (pos)),
        |q AS (SELECT CAST(b AS BIGINT) AS b, x, lo, span,
        |             CAST(CASE b WHEN 4 THEN 15 WHEN 6 THEN 63 ELSE 255 END AS BIGINT) AS lv
        |      FROM j),
        |c AS (SELECT b, x, lo, span, lv,
        |             CASE WHEN span = 0 THEN 0
        |                  ELSE ((x - lo) * lv + span // 2) // span END AS code FROM q),
        |r AS (SELECT b, x, lo + (code * span + lv // 2) // lv AS recon FROM c),
        |g AS (SELECT b, CAST(count(*) AS BIGINT) AS n_vals,
        |             sum(CAST((x - recon) AS HUGEINT) * (x - recon)) AS se
        |      FROM r GROUP BY 1)
        |SELECT b AS bits, n_vals, CAST(se // n_vals AS BIGINT) AS mse_per_val,
        |       1000000 * b // 32 AS size_vs_f32_ppm
        |FROM g ORDER BY bits""".stripMargin,

    "q615_dobrushin" ->
      """WITH tr AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT event_type AS cur,
        |           lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
        |    FROM events) WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |states AS (SELECT DISTINCT cur AS st FROM tr),
        |rws AS (SELECT cur, CAST(sum(c) AS BIGINT) AS n FROM tr GROUP BY 1),
        |grid AS (SELECT rws.cur, states.st, coalesce(tr.c, 0) AS c, rws.n
        |         FROM rws CROSS JOIN states
        |         LEFT JOIN tr ON tr.cur = rws.cur AND tr.nxt = states.st),
        |pair AS (SELECT x.cur AS state_a, y.cur AS state_b,
        |                CAST(max(x.n) AS BIGINT) AS n1, CAST(max(y.n) AS BIGINT) AS n2,
        |                sum(abs(CAST(x.c AS HUGEINT) * y.n - CAST(y.c AS HUGEINT) * x.n)) AS sad
        |         FROM grid x JOIN grid y ON x.st = y.st AND x.cur < y.cur
        |         GROUP BY 1, 2),
        |tv AS (SELECT state_a, state_b,
        |              CAST(1000000 * sad // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS tv_ppm
        |       FROM pair),
        |top AS (SELECT * FROM tv ORDER BY tv_ppm DESC, state_a, state_b LIMIT 1),
        |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_transitions,
        |              CAST(count(DISTINCT cur) AS BIGINT) AS n_states FROM tr)
        |SELECT n_states, n_transitions, state_a, state_b, tv_ppm AS dobrushin_ppm
        |FROM top CROSS JOIN nt""".stripMargin,

    "q616_char_entropy" ->
      """WITH ch0 AS (SELECT source, unnest([substr(text, i, 1) for i in range(1, len(text) + 1)]) AS ch
        |             FROM documents
        |             WHERE text IS NOT NULL AND source IS NOT NULL AND len(text) > 0),
        |g AS (SELECT source, ch, CAST(count(*) AS BIGINT) AS c FROM ch0 GROUP BY 1, 2),
        |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |             CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS scl
        |      FROM g GROUP BY 1)
        |SELECT source, n AS n_chars, n_distinct_chars,
        |       CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) - scl // n AS entropy_micro
        |FROM a ORDER BY 1""".stripMargin,

    "q617_price_endings" ->
      """WITH e AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending FROM orders),
        |g AS (SELECT ending, CAST(count(*) AS BIGINT) AS n_obs FROM e GROUP BY 1),
        |t AS (SELECT ending, n_obs, CAST(sum(n_obs) OVER () AS BIGINT) AS n,
        |             row_number() OVER (ORDER BY n_obs DESC, ending) AS rk FROM g)
        |SELECT ending, n_obs, 1000000 * n_obs // n AS obs_ppm,
        |       1000000 * n_obs // n - 10000 AS dev_ppm
        |FROM t WHERE rk <= 10 ORDER BY n_obs DESC, ending""".stripMargin,

    "q618_ks_two_sample" ->
      """WITH sp AS (SELECT o_custkey,
        |                   CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS g1,
        |                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |            FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |bv AS (SELECT v, CAST(sum(g1) AS BIGINT) AS d1,
        |              CAST(sum(1 - g1) AS BIGINT) AS d2 FROM sp GROUP BY 1),
        |cw AS (SELECT v,
        |              CAST(sum(d1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW) AS BIGINT) AS c1,
        |              CAST(sum(d2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW) AS BIGINT) AS c2,
        |              CAST(sum(d1) OVER () AS BIGINT) AS n1,
        |              CAST(sum(d2) OVER () AS BIGINT) AS n2
        |       FROM bv),
        |a AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
        |             CAST(max(1000000 * abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
        |                      // (CAST(n1 AS HUGEINT) * n2)) AS BIGINT) AS d_ppm
        |      FROM cw),
        |x0 AS (SELECT *, CAST(1000000 * CAST(n1 AS HUGEINT) * n2 // (n1 + n2) AS BIGINT) AS x FROM a),
        |t0c AS (SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS t0 FROM x0),
        |t1c AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + x // t0) // 2 ELSE 0 END AS t1 FROM t0c),
        |sqc AS (SELECT n1, n2, d_ppm,
        |               CASE WHEN (t1 + 1) * (t1 + 1) <= x THEN t1 + 1
        |                    WHEN t1 * t1 > x THEN t1 - 1 ELSE t1 END AS sq FROM t1c)
        |SELECT n1, n2, d_ppm, d_ppm * sq // 1000000 AS ks_lambda_milli
        |FROM sqc""".stripMargin,

    "q619_footrule" ->
      """WITH b AS (SELECT p_brand AS brand,
        |                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
        |                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |           FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |r AS (SELECT brand,
        |             CAST(row_number() OVER (ORDER BY rev DESC, brand) AS BIGINT) AS r1,
        |             CAST(row_number() OVER (ORDER BY qty DESC, brand) AS BIGINT) AS r2
        |      FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_brands,
        |       CAST(sum(abs(r1 - r2)) AS BIGINT) AS footrule_sum,
        |       CAST(1000000 * CAST(sum(abs(r1 - r2)) AS BIGINT)
        |            // (count(*) * count(*) // 2) AS BIGINT) AS footrule_ppm
        |FROM r""".stripMargin,

    "q620_german_tank" ->
      """WITH s AS (SELECT o_orderkey,
        |                  row_number() OVER (ORDER BY
        |                    CAST(concat('0x', substr(md5('tank#' || CAST(o_orderkey AS VARCHAR)), 1, 12))
        |                         AS BIGINT), o_orderkey) AS rk
        |           FROM orders),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(o_orderkey) AS BIGINT) AS max_seen
        |      FROM s WHERE rk <= 200),
        |t AS (SELECT CAST(max(o_orderkey) AS BIGINT) AS true_max FROM orders)
        |SELECT k, max_seen, max_seen + max_seen // k - 1 AS estimate, true_max,
        |       1000000 * (max_seen + max_seen // k - 1 - true_max) // true_max AS err_ppm
        |FROM k CROSS JOIN t""".stripMargin,

    "q621_chao1" ->
      """WITH ws AS (SELECT source, string_split(text, ' ') AS ws
        |            FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |bg0 AS (SELECT source, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b
        |        FROM ws WHERE len(ws) >= 2),
        |bg AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c FROM bg0 GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS s_obs,
        |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        |       CAST(count(*) + sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |            * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
        |            // (2 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)) AS BIGINT) AS chao1
        |FROM bg GROUP BY 1 ORDER BY 1""".stripMargin,

    "q622_birthday_audit" ->
      """WITH c AS (SELECT CAST(concat('0x', substr(md5('bday#' || CAST(doc_id AS VARCHAR)), 1, 12))
        |                       AS BIGINT) % 4096 AS bucket, CAST(count(*) AS BIGINT) AS c
        |           FROM documents GROUP BY 1),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS obs_pairs FROM c)
        |SELECT n, CAST(4096 AS BIGINT) AS m, obs_pairs,
        |       n * (n - 1) // 2 // 4096 AS exp_pairs,
        |       CAST(1000000 * CAST(obs_pairs AS HUGEINT) * 4096
        |            // (CAST(n AS HUGEINT) * (n - 1) // 2) AS BIGINT) AS ratio_ppm
        |FROM a""".stripMargin,

    "q623_fanout_tail" ->
      """WITH p AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(CASE WHEN value > 15.0 THEN 1 ELSE 0 END) AS BIGINT) AS slow
        |           FROM events GROUP BY 1),
        |l AS (SELECT *,
        |             CASE WHEN slow = n THEN CAST(-27631021 AS BIGINT)
        |                  ELSE CAST(round(ln(CAST(n - slow AS DOUBLE) / n) * 1000000) AS BIGINT)
        |             END AS l,
        |             1000000 * slow // n AS p_ppm
        |      FROM p),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_types, CAST(sum(l) AS BIGINT) AS lsum,
        |             CAST(max(p_ppm) AS BIGINT) AS max_single_ppm FROM l),
        |e AS (SELECT *, CAST(round(exp(CAST(lsum AS DOUBLE) / 1000000.0) * 1000000)
        |                     AS BIGINT) AS surv_ppm FROM a)
        |SELECT n_types, max_single_ppm, 1000000 - surv_ppm AS any_slow_ppm,
        |       1000 * (1000000 - surv_ppm) // max_single_ppm AS amplification_milli
        |FROM e""".stripMargin,

    "q624_roc_deciles" ->
      """WITH sp AS (SELECT o_custkey,
        |                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
        |            FROM orders GROUP BY 1),
        |sc AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS ab, spend
        |       FROM customer JOIN sp ON c_custkey = o_custkey),
        |r AS (SELECT CASE WHEN ntile(4) OVER (ORDER BY spend, c_custkey) = 4
        |                  THEN 1 ELSE 0 END AS rel,
        |             ntile(10) OVER (ORDER BY ab DESC, c_custkey) AS dec_ FROM sc),
        |d AS (SELECT CAST(dec_ AS BIGINT) AS decile, CAST(sum(rel) AS BIGINT) AS pos,
        |             CAST(sum(1 - rel) AS BIGINT) AS neg FROM r GROUP BY 1),
        |c AS (SELECT decile,
        |             CAST(sum(pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |                  AND CURRENT ROW) AS BIGINT) AS tp,
        |             CAST(sum(neg) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |                  AND CURRENT ROW) AS BIGINT) AS fp,
        |             CAST(sum(pos) OVER () AS BIGINT) AS p,
        |             CAST(sum(neg) OVER () AS BIGINT) AS ng
        |      FROM d)
        |SELECT decile, 1000000 * tp // p AS tpr_ppm, 1000000 * fp // ng AS fpr_ppm,
        |       1000000 * tp // (tp + fp) AS precision_ppm
        |FROM c ORDER BY decile""".stripMargin,

    "q625_scc_directed" ->
      """WITH RECURSIVE d0 AS MATERIALIZED (
        |  SELECT s_nationkey AS a, c_nationkey AS b,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (
        |  SELECT a, b FROM (SELECT * FROM d0 WHERE a <> b) d
        |  CROSS JOIN (SELECT sum(CAST(w AS HUGEINT)) AS tw,
        |                     CAST(count(*) AS BIGINT) AS np
        |              FROM d0 WHERE a <> b) t
        |  WHERE CAST(w AS HUGEINT) * np > tw),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a),
        |mutual AS (SELECT r1.a, r1.b FROM reach r1
        |           JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
        |nodes AS (SELECT a AS node FROM reach UNION SELECT b FROM reach),
        |lbl AS (SELECT n.node, least(min(m.b), min(n.node)) AS scc
        |        FROM nodes n LEFT JOIN mutual m ON m.a = n.node GROUP BY n.node)
        |SELECT CAST(scc AS BIGINT) AS scc_id, CAST(count(*) AS BIGINT) AS size
        |FROM lbl GROUP BY 1 ORDER BY 1""".stripMargin,

    "q626_absorption_reach" ->
      ("""WITH tr AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT event_type AS cur,
        |           lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
        |    FROM events) WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |rws AS (SELECT cur, CAST(sum(c) AS BIGINT) AS n FROM tr GROUP BY 1),
        |direct AS (SELECT rws.cur, rws.n, coalesce(p.c, 0) AS cp
        |           FROM rws LEFT JOIN (SELECT cur, c FROM tr WHERE nxt = 'purchase') p
        |           ON rws.cur = p.cur),
        |cont AS (SELECT cur, nxt, c FROM tr WHERE nxt <> 'purchase'),
        |r1 AS (SELECT cur AS st, 1000000 * cp // n AS rp FROM direct)""".stripMargin +
        (2 to 4).map { k =>
          s""",
             |r$k AS (SELECT d.cur AS st, (1000000 * d.cp + coalesce(s.srp, 0)) // d.n AS rp
             |       FROM direct d LEFT JOIN (
             |         SELECT cont.cur, CAST(sum(cont.c * r${k - 1}.rp) AS BIGINT) AS srp
             |         FROM cont JOIN r${k - 1} ON cont.nxt = r${k - 1}.st GROUP BY 1) s
             |       ON d.cur = s.cur)""".stripMargin
        }.mkString + """
        |SELECT d.cur AS state, d.n AS n_out, r1.rp AS reach1_ppm, r4.rp AS reach4_ppm
        |FROM direct d JOIN r1 ON d.cur = r1.st JOIN r4 ON d.cur = r4.st
        |WHERE d.cur <> 'purchase' ORDER BY 1""".stripMargin),

    "q627_gorilla_ts" ->
      """WITH t AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
        |d AS (SELECT event_type, user_id, event_id,
        |             t - lag(t) OVER (PARTITION BY user_id ORDER BY event_id) AS d
        |      FROM t),
        |dd AS (SELECT event_type,
        |              d - lag(d) OVER (PARTITION BY user_id ORDER BY event_id) AS dod
        |       FROM d),
        |b AS (SELECT event_type, dod,
        |             CASE WHEN dod = 0 THEN 1 WHEN abs(dod) <= 64 THEN 9
        |                  WHEN abs(dod) <= 256 THEN 12 WHEN abs(dod) <= 2048 THEN 16
        |                  ELSE 36 END AS bits
        |      FROM dd WHERE dod IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(1000000 * sum(CASE WHEN dod = 0 THEN 1 ELSE 0 END) // count(*)
        |            AS BIGINT) AS zero_dod_ppm,
        |       CAST(1000 * sum(bits) // count(*) AS BIGINT) AS bits_per_ts_milli,
        |       CAST(1000000 * sum(bits) // (64 * count(*)) AS BIGINT) AS vs_raw_ppm
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q628_ltv_payback" ->
      """WITH first_ AS (SELECT o_custkey AS ck, date_trunc('quarter', min(o_orderdate)) AS cohort
        |                FROM orders GROUP BY 1),
        |mrev AS (SELECT cohort,
        |                CAST((year(o_orderdate) - year(cohort)) * 12
        |                     + month(o_orderdate) - month(cohort) AS BIGINT) AS mi,
        |                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |         FROM orders JOIN first_ ON o_custkey = ck GROUP BY 1, 2),
        |nc AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers FROM first_ GROUP BY 1),
        |c AS (SELECT cohort, mi, rev,
        |             CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY mi
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |             CAST(first_value(rev) OVER (PARTITION BY cohort ORDER BY mi) AS BIGINT) AS m0
        |      FROM mrev),
        |g AS (SELECT cohort, CAST(max(m0) AS BIGINT) AS m0_cents,
        |             min(CASE WHEN cum >= 2 * m0 THEN mi END) AS payback
        |      FROM c GROUP BY 1)
        |SELECT strftime(g.cohort, '%Y-%m') AS cohort, n_customers, m0_cents,
        |       CAST(coalesce(payback, -1) AS BIGINT) AS payback_month
        |FROM g JOIN nc ON g.cohort = nc.cohort ORDER BY 1""".stripMargin,

    "q629_hedging_audit" ->
      """WITH r AS (SELECT event_type, value,
        |                  CAST(row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value, event_id) AS BIGINT) AS rk,
        |                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |           FROM events)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |       max(CASE WHEN rk = (n + 1) // 2 THEN value END) AS p50,
        |       max(CASE WHEN rk = (9 * n + 9) // 10 THEN value END) AS p90,
        |       max(CASE WHEN rk = (99 * n + 99) // 100 THEN value END) AS p99,
        |       max(CASE WHEN rk = (9 * n + 9) // 10 THEN value END) AS hedged_p99,
        |       CAST(1000000 * (max(n) - (max(n) + 1) // 2) // max(n) AS BIGINT) AS extra_load_ppm
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q630_bin_width_rules" ->
      """WITH sp AS (SELECT o_custkey,
        |                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |            FROM orders GROUP BY 1),
        |r AS (SELECT v, CAST(row_number() OVER (ORDER BY v, o_custkey) AS BIGINT) AS rk,
        |             CAST(count(*) OVER () AS BIGINT) AS n FROM sp),
        |a AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(min(v) AS BIGINT) AS mn,
        |             CAST(max(v) AS BIGINT) AS mx,
        |             CAST(max(CASE WHEN rk = (n + 3) // 4 THEN v END) AS BIGINT) AS q1,
        |             CAST(max(CASE WHEN rk = (3 * n + 3) // 4 THEN v END) AS BIGINT) AS q3,
        |             sum(CAST(v AS HUGEINT)) AS sx, sum(CAST(v AS HUGEINT) * v) AS sxx
        |      FROM r),
        |b AS (SELECT *, q3 - q1 AS iqr,
        |             CAST((n * sxx - sx * sx) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS vr
        |      FROM a),
        |s0c AS (SELECT *, CAST(floor(sqrt(CAST(vr AS DOUBLE))) AS BIGINT) AS s0 FROM b),
        |s1c AS (SELECT *, CASE WHEN s0 > 0 THEN (s0 + vr // s0) // 2 ELSE 0 END AS s1 FROM s0c),
        |sg AS (SELECT *, CASE WHEN (s1 + 1) * (s1 + 1) <= vr THEN s1 + 1
        |                      WHEN s1 * s1 > vr THEN s1 - 1 ELSE s1 END AS sig FROM s1c),
        |c0c AS (SELECT *, CAST(round(pow(CAST(n AS DOUBLE), 0.3333333333333333)) AS BIGINT) AS c0
        |        FROM sg),
        |cbc AS (SELECT *, CASE WHEN (c0 + 1) * (c0 + 1) * (c0 + 1) <= n THEN c0 + 1
        |                       WHEN c0 * c0 * c0 > n THEN c0 - 1 ELSE c0 END AS cb FROM c0c)
        |SELECT n, iqr AS iqr_cents, sig AS sigma_cents,
        |       (mx - mn) * cb // (2 * iqr) AS bins_fd,
        |       (mx - mn) * cb * 1000 // (3490 * sig) AS bins_scott,
        |       CAST(length(bin(n)) AS BIGINT) AS bins_sturges
        |FROM cbc""".stripMargin,

    "q631_hazard_ratio" ->
      """WITH seg AS (SELECT c_custkey,
        |                    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS g1
        |             FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
        |life AS (SELECT o.o_custkey, seg.g1,
        |                datediff('day', min(o.o_orderdate), max(o.o_orderdate)) AS t
        |         FROM orders o JOIN seg ON o.o_custkey = seg.c_custkey GROUP BY 1, 2),
        |et AS (SELECT t, CAST(sum(g1) AS BIGINT) AS d1, CAST(count(*) AS BIGINT) AS d
        |       FROM life GROUP BY 1),
        |r AS (SELECT t, d1, d,
        |             CAST(sum(d1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
        |                  AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1t,
        |             CAST(sum(d) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
        |                  AND UNBOUNDED FOLLOWING) AS BIGINT) AS nt
        |      FROM et)
        |SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |       CAST(sum(1000000 * d * n1t // nt) AS BIGINT) AS e1_micro,
        |       CAST(sum(d - d1) AS BIGINT) AS o2,
        |       CAST(sum(1000000 * d * (nt - n1t) // nt) AS BIGINT) AS e2_micro,
        |       CAST(1000 * CAST(sum(d1) AS HUGEINT)
        |            * sum(1000000 * d * (nt - n1t) // nt)
        |            // (CAST(sum(d - d1) AS HUGEINT) * sum(1000000 * d * n1t // nt))
        |            AS BIGINT) AS hr_milli
        |FROM r""".stripMargin,

    "q632_stuart_maxwell" ->
      """WITH ma AS (SELECT o_custkey AS ck_a, st AS st_a FROM (
        |    SELECT o_custkey, o_orderstatus AS st, count(*) AS c,
        |           row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY count(*) DESC, o_orderstatus) AS rk
        |    FROM orders WHERE o_orderdate < DATE '1998-07-01' GROUP BY 1, 2)
        |    WHERE rk = 1),
        |mb AS (SELECT o_custkey AS ck_b, st AS st_b FROM (
        |    SELECT o_custkey, o_orderstatus AS st, count(*) AS c,
        |           row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY count(*) DESC, o_orderstatus) AS rk
        |    FROM orders WHERE o_orderdate >= DATE '1998-07-01' GROUP BY 1, 2)
        |    WHERE rk = 1),
        |p AS (SELECT st_a, st_b, CAST(count(*) AS BIGINT) AS nij
        |      FROM ma JOIN mb ON ck_a = ck_b GROUP BY 1, 2),
        |m AS (SELECT CAST(sum(nij) AS BIGINT) AS np,
        |             CAST(sum(CASE WHEN st_a = 'F' THEN nij ELSE 0 END) AS BIGINT) AS r1,
        |             CAST(sum(CASE WHEN st_a = 'O' THEN nij ELSE 0 END) AS BIGINT) AS r2,
        |             CAST(sum(CASE WHEN st_b = 'F' THEN nij ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN st_b = 'O' THEN nij ELSE 0 END) AS BIGINT) AS c2,
        |             CAST(sum(CASE WHEN st_a = 'F' AND st_b = 'F' THEN nij ELSE 0 END) AS BIGINT) AS n11,
        |             CAST(sum(CASE WHEN st_a = 'O' AND st_b = 'O' THEN nij ELSE 0 END) AS BIGINT) AS n22,
        |             CAST(sum(CASE WHEN st_a = 'F' AND st_b = 'O' THEN nij ELSE 0 END) AS BIGINT) AS n12,
        |             CAST(sum(CASE WHEN st_a = 'O' AND st_b = 'F' THEN nij ELSE 0 END) AS BIGINT) AS n21
        |      FROM p)
        |SELECT np AS n_pairs, r1 - c1 AS d1, r2 - c2 AS d2,
        |       CAST(1000 * ((r2 + c2 - 2 * n22) * CAST(r1 - c1 AS HUGEINT) * (r1 - c1)
        |            + 2 * (n12 + n21) * CAST(r1 - c1 AS HUGEINT) * (r2 - c2)
        |            + (r1 + c1 - 2 * n11) * CAST(r2 - c2 AS HUGEINT) * (r2 - c2))
        |            // ((r1 + c1 - 2 * n11) * CAST(r2 + c2 - 2 * n22 AS HUGEINT)
        |               - CAST(n12 + n21 AS HUGEINT) * (n12 + n21)) AS BIGINT) AS chi2_milli
        |FROM m""".stripMargin,

    "q633_grace_hash_plan" ->
      """WITH rows_ AS (
        |  SELECT 'lineitem' AS tbl, CAST(count(*) * 120 AS BIGINT) AS bytes FROM lineitem
        |  UNION ALL SELECT 'orders', CAST(count(*) * 100 AS BIGINT) FROM orders
        |  UNION ALL SELECT 'customer', CAST(count(*) * 180 AS BIGINT) FROM customer
        |  UNION ALL SELECT 'documents', CAST(count(*) * 300 AS BIGINT) FROM documents),
        |j AS (SELECT tbl, bytes,
        |             CAST(unnest([67108864, 268435456, 1073741824]) AS BIGINT) AS mem
        |      FROM rows_),
        |p AS (SELECT tbl, bytes, mem,
        |             CAST(CASE WHEN bytes <= mem THEN 1
        |                  ELSE (bytes * 6 // 5 + mem - 1) // mem END AS BIGINT) AS partitions,
        |             CAST(CASE WHEN bytes <= mem THEN 0
        |                  WHEN bytes <= mem * 256 THEN 1
        |                  WHEN bytes <= mem * 65536 THEN 2 ELSE 3 END AS BIGINT) AS depth
        |      FROM j)
        |SELECT tbl, bytes, mem, partitions, depth, 2 * depth + 1 AS io_multiplier
        |FROM p ORDER BY tbl, mem""".stripMargin,

    "q634_theilsen_sampled" ->
      """WITH pt AS (SELECT p_brand, CAST(p_size AS BIGINT) AS x,
        |                   CAST(round(p_retailprice * 100) AS BIGINT) AS y,
        |                   row_number() OVER (PARTITION BY p_brand
        |                     ORDER BY md5('ts634#' || CAST(p_partkey AS VARCHAR)), p_partkey) AS srn
        |            FROM part),
        |s AS (SELECT p_brand, x, y FROM pt WHERE srn <= 64),
        |pr AS (SELECT a.p_brand,
        |              CASE WHEN (b.x - a.x) <= 0 THEN NULL
        |                   WHEN (b.y - a.y) >= 0
        |                   THEN (2 * (b.y - a.y) * 1000 + (b.x - a.x)) // (2 * (b.x - a.x))
        |                   ELSE -((2 * (a.y - b.y) * 1000 + (b.x - a.x)) // (2 * (b.x - a.x))) END AS slope_milli
        |       FROM s a JOIN s b ON a.p_brand = b.p_brand AND a.x < b.x),
        |r AS (SELECT p_brand, slope_milli,
        |             row_number() OVER (PARTITION BY p_brand ORDER BY slope_milli) AS rn,
        |             count(*) OVER (PARTITION BY p_brand) AS n
        |      FROM pr)
        |SELECT p_brand, CAST(max(n) AS BIGINT) AS n_pairs,
        |       CAST(min(slope_milli) AS BIGINT) AS median_slope_milli
        |FROM r WHERE rn = (n + 1) // 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q635_time_travel" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |                  year(o_orderdate) AS yy, month(o_orderdate) AS mm
        |           FROM orders WHERE year(o_orderdate) = 1995),
        |v2 AS (SELECT 'v2' AS snap, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(v) AS BIGINT) AS cents
        |       FROM o WHERE mm IN (1, 2) GROUP BY 2),
        |hd AS (SELECT 'head' AS snap, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(v) AS BIGINT) AS cents
        |       FROM o WHERE mm = 3 GROUP BY 2)
        |SELECT * FROM v2 UNION ALL SELECT * FROM hd
        |ORDER BY snap, o_orderpriority""".stripMargin,

    "q637_txlog_merge" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |                  month(o_orderdate) AS mm
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3),
        |st AS (SELECT o_orderpriority,
        |              CASE WHEN mm = 2 THEN 2 * v ELSE v END AS v
        |       FROM o)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,

    "q638_txlog_skipping" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q639_txlog_optimize" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q640_txlog_cdf" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |                  month(o_orderdate) AS mm
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) IN (2, 3))
        |SELECT CAST(mm AS BIGINT) AS commit_v, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q641_txlog_filter_pushdown" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q642_txlog_zorder_2d" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995
        |             AND date_diff('day', DATE '1995-01-01', o_orderdate)
        |                 BETWEEN 31 AND 58
        |             AND o_custkey % 1024 BETWEEN 100 AND 300)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q643_txlog_restore" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q644_txlog_sql" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |                  month(o_orderdate) AS mm
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3),
        |v2 AS (SELECT 'v2' AS snap, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(v) AS BIGINT) AS cents
        |       FROM o WHERE mm <= 2 GROUP BY 2),
        |cdf AS (SELECT 'cdf' AS snap, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(v) AS BIGINT) AS cents
        |        FROM o WHERE mm = 3 GROUP BY 2)
        |SELECT * FROM v2 UNION ALL SELECT * FROM cdf
        |ORDER BY snap, o_orderpriority""".stripMargin,

    "q645_txlog_string_skipping" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q646_txlog_compact" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q647_txlog_cdf_merge" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |                  month(o_orderdate) AS mm
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3)
        |SELECT * FROM (
        |  SELECT 'update_preimage' AS change_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(v) AS BIGINT) AS cents FROM o WHERE mm = 2
        |  UNION ALL
        |  SELECT 'update_postimage', CAST(count(*) AS BIGINT),
        |         CAST(sum(v * 2) AS BIGINT) FROM o WHERE mm = 2
        |  UNION ALL
        |  SELECT 'insert', CAST(count(*) AS BIGINT),
        |         CAST(sum(v) AS BIGINT) FROM o WHERE mm = 3
        |) ORDER BY change_type""".stripMargin,

    "q648_txlog_partitioned" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q649_txlog_delete" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3
        |             AND date_diff('day', DATE '1995-01-01', o_orderdate)
        |                 NOT BETWEEN 31 AND 58)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q650_txlog_update" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) *
        |                  CASE WHEN date_diff('day', DATE '1995-01-01', o_orderdate)
        |                            BETWEEN 31 AND 58 THEN 3 ELSE 1 END AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q651_txlog_date_skipping" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE o_orderdate BETWEEN DATE '1995-02-01' AND DATE '1995-02-28')
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q652_txlog_widening" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents,
        |       CAST(sum(o_orderkey) AS BIGINT) AS keysum
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q636_media_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN 54
        |                 ELSE 44 + (doc_id % 50) * 4 END AS BIGINT) AS n_bytes,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 500 + 1
        |                 ELSE 8000 + (doc_id % 8) * 1000 END AS INTEGER) AS width,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 3) % 500 + 1
        |                 ELSE 2 END AS INTEGER) AS height,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN 1
        |                 ELSE doc_id % 50 END AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q653_txlog_bloom" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id IN (7, 103, 211, 339, 491)
        |ORDER BY doc_id""".stripMargin,

    "q654_txlog_clone" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q655_txlog_constraints" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q656_txlog_dv" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |  AND o_orderkey % 10 >= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q657_txlog_mor_update" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN o_orderkey % 10 < 3
        |                     THEN 2 * CAST(round(o_totalprice * 100) AS BIGINT)
        |                     ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
        |            AS BIGINT) AS cents
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q658_txlog_rowcount" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows
        |FROM documents WHERE doc_id % 7 <> 0""".stripMargin,

    "q659_txlog_compact_zorder" ->
      """WITH o AS (SELECT o_orderpriority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 6
        |             AND date_diff('day', DATE '1995-01-01', o_orderdate)
        |                 BETWEEN 31 AND 58
        |             AND o_custkey % 1024 BETWEEN 100 AND 300)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q660_txlog_rename" ->
      """SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |  AND o_orderpriority >= '3'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q661_txlog_partition_evolution" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |  AND o_orderpriority >= '3'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q662_txlog_partition_rename" ->
      """SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |  AND o_orderpriority >= '3'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q663_graft_format_read" ->
      """WITH base AS (
        |  SELECT o_orderkey, CAST(month(o_orderdate) AS BIGINT) AS mm,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders
        |  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 6
        |)
        |SELECT mm, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents, 'head' AS era
        |FROM base WHERE o_orderkey % 10 <> 7 GROUP BY mm
        |UNION ALL
        |SELECT mm, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents, 'v2' AS era
        |FROM base GROUP BY mm
        |ORDER BY era, mm""".stripMargin,

    "q664_graft_sql_dml" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders
        |  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 2
        |), state AS ( -- DELETE on the original value, then UPDATE
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderstatus = 'F' THEN v + 7 ELSE v END AS v
        |  FROM base WHERE v >= 5000000
        |), src AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS v
        |  FROM orders
        |  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 3
        |    AND o_orderkey % 5 = 0
        |), merged AS ( -- MERGE: source overrides matched keys, inserts rest
        |  SELECT * FROM state
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        |  UNION ALL SELECT * FROM src
        |)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,

    "q665_graft_sql_insert" ->
      """WITH b AS (
        |  SELECT o_orderkey, CAST(month(o_orderdate) AS BIGINT) AS mm,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE year(o_orderdate) = 1995
        |), state AS ( -- months 1+3 as loaded/appended; 4 via the static
        |              -- spec insert; 2 replaced by the tripled subset
        |  SELECT o_orderkey, mm, v FROM b WHERE mm IN (1, 3, 4)
        |  UNION ALL
        |  SELECT o_orderkey, mm, v * 3 AS v FROM b
        |  WHERE mm = 2 AND o_orderkey % 3 = 0
        |)
        |SELECT mm, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(v) AS BIGINT) AS cents
        |FROM state GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
