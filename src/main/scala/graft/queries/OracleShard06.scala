package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard06 {
  val defs: Map[String, String] = Map(

    "q321_cluster_sharding" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
        |$ccLabelChain,
        |base AS (SELECT d.doc_id, coalesce(lbl.l, d.doc_id) AS cluster
        |         FROM documents d LEFT JOIN lbl ON lbl.u = d.doc_id),
        |asg AS (SELECT doc_id, cluster,
        |               CAST(concat('0x', substr(md5('shard#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 8 AS shard_doc,
        |               CAST(concat('0x', substr(md5('shard#' || CAST(cluster AS VARCHAR)), 1, 12)) AS BIGINT) % 8 AS shard_cl
        |        FROM base),
        |ca AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz,
        |              CAST(count(DISTINCT shard_doc) AS BIGINT) AS ns FROM asg GROUP BY 1),
        |cb AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz,
        |              CAST(count(DISTINCT shard_cl) AS BIGINT) AS ns FROM asg GROUP BY 1),
        |sa AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
        |              CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
        |              CAST(sum(CASE WHEN sz > 1 AND ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_split
        |       FROM ca),
        |sb AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
        |              CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
        |              CAST(sum(CASE WHEN sz > 1 AND ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_split
        |       FROM cb),
        |la AS (SELECT CAST(max(n) AS BIGINT) AS max_n, CAST(sum(n) AS BIGINT) AS t
        |       FROM (SELECT count(*) AS n FROM asg GROUP BY shard_doc)),
        |lb AS (SELECT CAST(max(n) AS BIGINT) AS max_n, CAST(sum(n) AS BIGINT) AS t
        |       FROM (SELECT count(*) AS n FROM asg GROUP BY shard_cl)),
        |u AS (
        |  SELECT 'by_doc' AS policy, sa.n_clusters, sa.n_multi, sa.n_split,
        |         CAST(CASE WHEN sa.n_multi > 0 THEN sa.n_split * 1000000 // sa.n_multi
        |              ELSE 0 END AS BIGINT) AS split_ppm,
        |         CAST(la.max_n * 8 * 1000000 // la.t AS BIGINT) AS max_shard_ppm
        |  FROM sa, la
        |  UNION ALL
        |  SELECT 'by_cluster', sb.n_clusters, sb.n_multi, sb.n_split,
        |         CAST(CASE WHEN sb.n_multi > 0 THEN sb.n_split * 1000000 // sb.n_multi
        |              ELSE 0 END AS BIGINT),
        |         CAST(lb.max_n * 8 * 1000000 // lb.t AS BIGINT)
        |  FROM sb, lb)
        |SELECT * FROM u ORDER BY policy""".stripMargin,

    "q322_mrr_eval" ->
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
        |), ex AS (SELECT query_id, neighbor_id FROM er WHERE rk_exact <= 10),
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
        |             CAST(row_number() OVER (PARTITION BY ap.query_id ORDER BY ap.p) AS BIGINT) AS rhit
        |      FROM ap JOIN ex USING (query_id, neighbor_id)),
        |agg AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
        |               CAST(min(p) AS BIGINT) AS first_hit_rank,
        |               CAST(sum(rhit * 1000000000 // p) AS BIGINT) AS sum_prec_nano
        |        FROM h GROUP BY 1)
        |SELECT q.query_id, coalesce(agg.n_hits, 0) AS n_hits, agg.first_hit_rank,
        |       CASE WHEN agg.first_hit_rank IS NOT NULL
        |            THEN CAST(1000000000 // agg.first_hit_rank AS BIGINT) END AS mrr_nano,
        |       CAST(coalesce(agg.sum_prec_nano // 10, 0) AS BIGINT) AS ap_nano
        |FROM (SELECT DISTINCT query_id FROM ex) q
        |LEFT JOIN agg USING (query_id) ORDER BY q.query_id""".stripMargin,

    "q323_trending_terms" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |bd AS (SELECT max(doc_id) AS mx FROM base),
        |words AS (SELECT b.doc_id * 2 <= bd.mx AS first_half,
        |                 unnest(string_split(b.text, ' ')) AS w
        |          FROM base b, bd),
        |cnt AS (SELECT w,
        |               CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |               CAST(sum(CASE WHEN NOT first_half THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |        FROM words WHERE length(w) > 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb,
        |               CAST(count(*) AS BIGINT) AS v FROM cnt),
        |sc AS (SELECT w, ca, cb,
        |              CAST(CAST(cb + 1 AS HUGEINT) * (ta + v) * 1000000
        |                   // (CAST(ca + 1 AS HUGEINT) * (tb + v)) AS BIGINT) AS score_ppm
        |       FROM cnt, tot),
        |u AS (
        |  SELECT 'rising' AS direction, * FROM
        |    (SELECT * FROM sc ORDER BY score_ppm DESC, w LIMIT 10)
        |  UNION ALL
        |  SELECT 'falling', * FROM
        |    (SELECT * FROM sc ORDER BY score_ppm ASC, w LIMIT 10))
        |SELECT direction, w AS term, ca, cb, score_ppm
        |FROM u ORDER BY direction, score_ppm, term""".stripMargin,

    "q324_event_debounce" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), f AS (
        |  SELECT event_type,
        |         CASE WHEN lag(us) OVER w IS NULL THEN TRUE
        |              WHEN us - lag(us) OVER w >= 5000000 THEN TRUE
        |              ELSE FALSE END AS kept
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY us, event_id)
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
        |         AS keep_ppm
        |FROM f GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q325_pareto_layers" ->
      """WITH p0 AS (
        |  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |         CAST(p_size AS BIGINT) AS psize
        |  FROM part
        |), w1 AS (
        |  SELECT *, max(psize) OVER (ORDER BY price_c
        |              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mxc,
        |         max(psize) OVER (PARTITION BY price_c) AS mxs
        |  FROM p0
        |), f1 AS (SELECT p_partkey, price_c, psize,
        |                 NOT (coalesce(mxc >= psize, FALSE) OR mxs > psize) AS onf FROM w1),
        |p1 AS (SELECT p_partkey, price_c, psize FROM f1 WHERE NOT onf),
        |w2 AS (
        |  SELECT *, max(psize) OVER (ORDER BY price_c
        |              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mxc,
        |         max(psize) OVER (PARTITION BY price_c) AS mxs
        |  FROM p1
        |), f2 AS (SELECT p_partkey, price_c, psize,
        |                 NOT (coalesce(mxc >= psize, FALSE) OR mxs > psize) AS onf FROM w2),
        |p2 AS (SELECT p_partkey, price_c, psize FROM f2 WHERE NOT onf),
        |w3 AS (
        |  SELECT *, max(psize) OVER (ORDER BY price_c
        |              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mxc,
        |         max(psize) OVER (PARTITION BY price_c) AS mxs
        |  FROM p2
        |), f3 AS (SELECT p_partkey, price_c, psize,
        |                 NOT (coalesce(mxc >= psize, FALSE) OR mxs > psize) AS onf FROM w3),
        |u AS (
        |  SELECT 1 AS layer, price_c, psize FROM f1 WHERE onf
        |  UNION ALL SELECT 2, price_c, psize FROM f2 WHERE onf
        |  UNION ALL SELECT 3, price_c, psize FROM f3 WHERE onf)
        |SELECT CAST(layer AS BIGINT) AS layer, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(min(price_c) AS BIGINT) AS min_price_c,
        |       CAST(max(psize) AS BIGINT) AS max_size
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q326_encoding_planner" ->
      """WITH m AS (
        |  SELECT l_orderkey, l_linenumber, 'returnflag' AS col_name, l_returnflag AS v FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'linestatus', l_linestatus FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'quantity',
        |                   CAST(CAST(round(l_quantity, 0) AS BIGINT) AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
        |), g AS (SELECT *, l_orderkey // 4096 AS rg FROM m),
        |r AS (
        |  SELECT col_name, v,
        |         CASE WHEN lag(v) OVER (PARTITION BY col_name, rg
        |                ORDER BY l_orderkey, l_linenumber, v) IS DISTINCT FROM v
        |              THEN 1 ELSE 0 END AS run_start
        |  FROM g
        |), agg AS (
        |  SELECT col_name, CAST(count(*) AS BIGINT) AS n_values,
        |         CAST(sum(run_start) AS BIGINT) AS n_runs,
        |         CAST(sum(length(v)) AS BIGINT) AS plain_bytes
        |  FROM r GROUP BY 1
        |), d AS (
        |  SELECT col_name, CAST(count(*) AS BIGINT) AS ndv,
        |         CAST(sum(length(v)) AS BIGINT) AS dict_char_bytes
        |  FROM (SELECT DISTINCT col_name, v FROM m) GROUP BY 1
        |), j AS (
        |  SELECT *, CAST(CASE WHEN ndv <= 2 THEN 1 WHEN ndv <= 4 THEN 2
        |                      WHEN ndv <= 16 THEN 4 WHEN ndv <= 256 THEN 8
        |                      WHEN ndv <= 65536 THEN 16 ELSE 32 END AS BIGINT) AS bit_width
        |  FROM agg JOIN d USING (col_name)
        |), k AS (
        |  SELECT *, CAST(dict_char_bytes + (n_values * bit_width + 7) // 8 AS BIGINT) AS dict_bytes,
        |         CAST(dict_char_bytes + n_runs * (4 + (bit_width + 7) // 8) AS BIGINT) AS rle_bytes
        |  FROM j
        |)
        |SELECT col_name, n_values, ndv, n_runs, bit_width, plain_bytes, dict_bytes, rle_bytes,
        |       CASE WHEN rle_bytes <= dict_bytes AND rle_bytes <= plain_bytes THEN 'rle'
        |            WHEN dict_bytes <= plain_bytes THEN 'dict' ELSE 'plain' END AS chosen
        |FROM k ORDER BY col_name""".stripMargin,

    "q327_front_coding" ->
      ("""WITH t AS (
        |  SELECT DISTINCT c_custkey // 4096 AS rg, c_name AS term FROM customer
        |), l AS (
        |  SELECT rg, term, lag(term) OVER (PARTITION BY rg ORDER BY term) AS prev
        |  FROM t
        |), x AS (
        |  SELECT rg, term,
        |         CASE WHEN prev IS NULL THEN 0 ELSE greatest(""" +
        (1 to 16).map(l =>
          s"CASE WHEN substring(term, 1, $l) = substring(prev, 1, $l) THEN $l ELSE 0 END")
          .mkString(", ") +
        """) END AS lcp
        |  FROM l
        |), a AS (
        |  SELECT rg, CAST(count(*) AS BIGINT) AS n_terms,
        |         CAST(sum(length(term)) AS BIGINT) AS raw_bytes,
        |         CAST(sum(lcp) AS BIGINT) AS saved_bytes
        |  FROM x GROUP BY 1
        |)
        |SELECT CAST(rg AS BIGINT) AS rg, n_terms, raw_bytes, saved_bytes,
        |       CAST(raw_bytes - saved_bytes + n_terms AS BIGINT) AS front_bytes,
        |       CAST((saved_bytes - n_terms) * 1000000 // raw_bytes AS BIGINT) AS savings_ppm
        |FROM a ORDER BY rg""").stripMargin,

    "q328_red_specialists" ->
      """WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        |per AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CASE WHEN r.p_partkey IS NOT NULL
        |                       THEN CAST(round(l_quantity, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS red_qty,
        |         CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem LEFT JOIN red r ON l_partkey = r.p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1
        |)
        |SELECT s_name, n_name AS nation, red_qty, total_qty,
        |       CAST(red_qty * 1000000 // total_qty AS BIGINT) AS red_share_ppm
        |FROM per JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY red_share_ppm DESC, s_name LIMIT 10""".stripMargin,

    "q329_bloom_sizing" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_keys
        |           FROM documents GROUP BY 1),
        |t AS (SELECT * FROM (VALUES (CAST(10000 AS BIGINT), CAST(9585058 AS BIGINT), CAST(7 AS BIGINT)),
        |                            (1000, 14377588, 10),
        |                            (100, 19170117, 13))
        |      AS t(fpp_ppm, bits_per_key_ppm, k_hashes)),
        |x AS (SELECT source, n_keys, fpp_ppm, bits_per_key_ppm, k_hashes,
        |             CAST((n_keys * bits_per_key_ppm + 999999) // 1000000 AS BIGINT) AS m_bits
        |      FROM s, t)
        |SELECT source, n_keys, fpp_ppm, bits_per_key_ppm, k_hashes, m_bits,
        |       CAST((m_bits + 7) // 8 AS BIGINT) AS m_bytes
        |FROM x ORDER BY source, fpp_ppm""".stripMargin,

    "q330_zonemap_power" ->
      """WITH o AS (
        |  SELECT o_orderkey // 4096 AS blk,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS od,
        |         o_custkey AS ck, o_orderkey AS ok
        |  FROM orders
        |), m AS (
        |  SELECT blk, 'o_orderdate' AS col_name, od AS v FROM o
        |  UNION ALL SELECT blk, 'o_custkey', ck FROM o
        |  UNION ALL SELECT blk, 'o_orderkey', ok FROM o
        |), b AS (
        |  SELECT col_name, blk, min(v) AS mn, max(v) AS mx FROM m GROUP BY 1, 2
        |), a AS (
        |  SELECT col_name, CAST(count(*) AS BIGINT) AS n_blocks,
        |         CAST(sum(mx - mn) AS BIGINT) AS sum_width,
        |         CAST(max(mx) - min(mn) AS BIGINT) AS global_width
        |  FROM b GROUP BY 1
        |)
        |SELECT col_name, n_blocks, global_width,
        |       CAST(sum_width * 1000000 // (n_blocks * global_width) AS BIGINT) AS avg_width_ppm,
        |       CAST(1000000 - sum_width * 1000000 // (n_blocks * global_width) AS BIGINT)
        |         AS pruning_power_ppm
        |FROM a ORDER BY col_name""".stripMargin,

    "q331_shuffle_planner" ->
      """WITH m AS (
        |  SELECT 68 + length(l_returnflag) + length(l_linestatus) AS rb, key_name, key_val
        |  FROM lineitem, LATERAL (VALUES ('l_orderkey', l_orderkey),
        |                                 ('l_partkey', l_partkey),
        |                                 ('l_suppkey', l_suppkey)) AS k(key_name, key_val)
        |), pk AS (
        |  SELECT key_name, key_val, CAST(count(*) AS BIGINT) AS c, CAST(sum(rb) AS BIGINT) AS b
        |  FROM m GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY key_name
        |              ORDER BY c DESC, key_val DESC) AS rn
        |  FROM pk
        |), a AS (
        |  SELECT key_name, CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(sum(c) AS BIGINT) AS n_rows, CAST(sum(b) AS BIGINT) AS est_bytes
        |  FROM pk GROUP BY 1
        |)
        |SELECT a.key_name, a.n_keys, a.n_rows, a.est_bytes,
        |       CAST((a.est_bytes + 67108863) // 67108864 AS BIGINT) AS parts_64mib,
        |       r.key_val AS hot_key, r.c AS hot_rows,
        |       CAST(r.c * 1000000 // a.n_rows AS BIGINT) AS hot_ppm,
        |       r.c * ((a.est_bytes + 67108863) // 67108864) > a.n_rows AS skew_flag
        |FROM a JOIN rk r ON a.key_name = r.key_name AND r.rn = 1
        |ORDER BY a.key_name""".stripMargin,

    "q332_pq_codebook" ->
      """WITH x AS (
        |  SELECT vec_id, unnest(list_transform(range(1, len(embedding)+1),
        |           i -> struct_pack(pos := i - 1, val := embedding[i]))) AS u
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id, u.pos // 8 AS sub, u.pos AS pos,
        |         CAST(round(CAST(u.val AS DOUBLE) * 1000000) AS BIGINT) AS qv
        |  FROM x
        |), c AS (SELECT vec_id AS cid, sub, pos, qv AS qc FROM q WHERE vec_id < 16),
        |d AS (
        |  SELECT q.vec_id, q.sub, c.cid,
        |         CAST(sum((q.qv - c.qc) * (q.qv - c.qc)) AS BIGINT) AS d2
        |  FROM q JOIN c ON q.sub = c.sub AND q.pos = c.pos
        |  GROUP BY 1, 2, 3
        |), b AS (
        |  SELECT vec_id, sub, cid, d2,
        |         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
        |  FROM d
        |)
        |, cd AS (SELECT sub, CAST(count(DISTINCT cid) AS BIGINT) AS codes_defined
        |         FROM c GROUP BY 1)
        |SELECT CAST(b.sub AS BIGINT) AS subspace, CAST(count(*) AS BIGINT) AS n_vectors,
        |       any_value(cd.codes_defined) AS codes_defined,
        |       CAST(count(DISTINCT cid) AS BIGINT) AS codes_used,
        |       CAST(CAST(sum(d2) AS DECIMAL(38,0)) AS VARCHAR) AS sum_sqerr_q,
        |       CAST(sum(d2) // count(*) AS BIGINT) AS avg_sqerr_q
        |FROM b JOIN cd ON b.sub = cd.sub WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q333_histogram_quantiles" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |mm AS (SELECT CAST(min(v) AS BIGINT) AS gmin, CAST(max(v) AS BIGINT) AS gmax,
        |              CAST(count(*) AS BIGINT) AS n FROM v),
        |mg AS (SELECT (v - gmin) * 64 // (gmax - gmin + 1) AS bin,
        |              CAST(count(*) AS BIGINT) AS c
        |       FROM v, mm GROUP BY 1),
        |mc AS (SELECT bin, c, CAST(coalesce(sum(c) OVER (ORDER BY bin
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |       FROM mg),
        |ks AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p),
        |kk AS (SELECT p, (p * n + 99) // 100 AS k, gmin, gmax FROM ks, mm),
        |est AS (SELECT kk.p, kk.k, mc.bin, mc.cb, mc.c, kk.gmin, kk.gmax,
        |               kk.gmin + (mc.bin * (kk.gmax - kk.gmin + 1)) // 64
        |                 + ((kk.k - mc.cb) * ((kk.gmax - kk.gmin + 1) // 64)) // mc.c
        |                 AS est_cents
        |        FROM kk JOIN mc ON mc.cb < kk.k AND mc.cb + mc.c >= kk.k),
        |vb AS (SELECT v.v, (v.v - mm.gmin) * 64 // (mm.gmax - mm.gmin + 1) AS vbin
        |       FROM v, mm),
        |ex AS (SELECT e.p, vb.v,
        |              row_number() OVER (PARTITION BY e.p ORDER BY vb.v) AS r,
        |              e.k - e.cb AS off
        |       FROM vb JOIN est e ON vb.vbin = e.bin)
        |SELECT e.p AS pct, e.k, e.est_cents, x.v AS exact_cents,
        |       CAST(abs(e.est_cents - x.v) * 1000000 // (e.gmax - e.gmin + 1) AS BIGINT)
        |         AS err_domain_ppm
        |FROM est e JOIN (SELECT p, v FROM ex WHERE r = off) x ON e.p = x.p
        |ORDER BY pct""".stripMargin,

    "q334_join_estimate" ->
      """WITH
        |lo AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
        |oo AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1),
        |lp AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
        |pp AS (SELECT p_partkey AS k, CAST(count(*) AS BIGINT) AS c FROM part GROUP BY 1),
        |lsu AS (SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
        |ss AS (SELECT s_suppkey AS k, CAST(count(*) AS BIGINT) AS c FROM supplier GROUP BY 1),
        |p1 AS (SELECT 'lineitem_orders' AS join_name, l.n_left, l.ndv_left,
        |              r.n_right, r.ndv_right, j.actual_rows
        |       FROM (SELECT CAST(sum(c) AS BIGINT) AS n_left, CAST(count(*) AS BIGINT) AS ndv_left FROM lo) l,
        |            (SELECT CAST(sum(c) AS BIGINT) AS n_right, CAST(count(*) AS BIGINT) AS ndv_right FROM oo) r,
        |            (SELECT CAST(sum(lo.c * oo.c) AS BIGINT) AS actual_rows FROM lo JOIN oo USING (k)) j),
        |p2 AS (SELECT 'lineitem_part', l.n_left, l.ndv_left, r.n_right, r.ndv_right, j.actual_rows
        |       FROM (SELECT CAST(sum(c) AS BIGINT) AS n_left, CAST(count(*) AS BIGINT) AS ndv_left FROM lp) l,
        |            (SELECT CAST(sum(c) AS BIGINT) AS n_right, CAST(count(*) AS BIGINT) AS ndv_right FROM pp) r,
        |            (SELECT CAST(sum(lp.c * pp.c) AS BIGINT) AS actual_rows FROM lp JOIN pp USING (k)) j),
        |p3 AS (SELECT 'lineitem_supplier', l.n_left, l.ndv_left, r.n_right, r.ndv_right, j.actual_rows
        |       FROM (SELECT CAST(sum(c) AS BIGINT) AS n_left, CAST(count(*) AS BIGINT) AS ndv_left FROM lsu) l,
        |            (SELECT CAST(sum(c) AS BIGINT) AS n_right, CAST(count(*) AS BIGINT) AS ndv_right FROM ss) r,
        |            (SELECT CAST(sum(lsu.c * ss.c) AS BIGINT) AS actual_rows FROM lsu JOIN ss USING (k)) j),
        |u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3),
        |e AS (SELECT *, CAST(CAST(n_left AS HUGEINT) * n_right
        |                     // greatest(ndv_left, ndv_right) AS BIGINT) AS est_rows
        |      FROM u)
        |SELECT join_name, n_left, n_right, ndv_left, ndv_right, est_rows, actual_rows,
        |       CAST(est_rows * 1000000 // actual_rows AS BIGINT) AS est_over_actual_ppm
        |FROM e ORDER BY join_name""".stripMargin,

    "q335_frame_schedule" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) % 16 AS BIGINT) AS n_frames
        |  FROM documents WHERE text IS NOT NULL
        |), f AS (
        |  SELECT doc_id, n_frames,
        |         CASE WHEN n_frames > 0 THEN range(0, n_frames, 4)
        |              ELSE CAST([] AS BIGINT[]) END AS fr
        |  FROM m
        |)
        |SELECT doc_id, n_frames, CAST(len(fr) AS BIGINT) AS n_sampled,
        |       coalesce(array_to_string(fr, ','), '') AS frames
        |FROM f ORDER BY doc_id""".stripMargin,

    "q336_resize_plan" ->
      """WITH m AS (
        |  SELECT CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents WHERE text IS NOT NULL
        |), d AS (
        |  SELECT nb % 512 AS w, (nb * 7) % 512 AS h FROM m
        |), b AS (
        |  SELECT CASE WHEN w * 1000 // greatest(h, 1) < 800 THEN 'portrait'
        |              WHEN w * 1000 // greatest(h, 1) < 1250 THEN 'square'
        |              ELSE 'landscape' END AS bucket,
        |         CAST(w * h AS BIGINT) AS px_before,
        |         CAST(greatest(w // 2, 1) * greatest(h // 2, 1) AS BIGINT) AS px_after
        |  FROM d
        |), a AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_images,
        |         CAST(sum(px_before) AS BIGINT) AS sum_px_before,
        |         CAST(sum(px_after) AS BIGINT) AS sum_px_after
        |  FROM b GROUP BY 1
        |)
        |SELECT bucket, n_images, CAST((n_images + 31) // 32 AS BIGINT) AS n_batches,
        |       CAST((n_images + 31) // 32 * 32 - n_images AS BIGINT) AS pad_waste,
        |       sum_px_before, sum_px_after,
        |       CAST(sum_px_after * 1000000 // greatest(sum_px_before, 1) AS BIGINT)
        |         AS px_ratio_ppm
        |FROM a ORDER BY bucket""".stripMargin,

    "q337_audio_chunks" ->
      """WITH m AS (
        |  SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT source, nb * 1000 // 32 AS dur_ms,
        |         CASE WHEN nb * 1000 // 32 <= 0 THEN 0
        |              WHEN nb * 1000 // 32 <= 30000 THEN 1
        |              ELSE 1 + (nb * 1000 // 32 - 30000 + 28999) // 29000 END AS n_chunks
        |  FROM m
        |), a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(dur_ms) AS BIGINT) AS total_dur_ms,
        |         CAST(sum(n_chunks) AS BIGINT) AS total_chunks
        |  FROM c GROUP BY 1
        |)
        |SELECT source, n_docs, total_dur_ms, total_chunks,
        |       CAST(total_dur_ms // greatest(total_chunks, 1) AS BIGINT) AS avg_chunk_ms
        |FROM a ORDER BY source""".stripMargin,

    "q338_golden_record" ->
      s"""WITH RECURSIVE b AS (
         |  SELECT p_partkey AS k, p_brand, p_type, p_name,
         |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
         |         CAST(p_size AS BIGINT) AS psize
         |  FROM part
         |), cand AS (
         |  SELECT a.k AS doc_a, c.k AS doc_b
         |  FROM b a JOIN b c ON a.p_brand = c.p_brand AND a.p_type = c.p_type
         |                    AND a.k < c.k
         |  WHERE round(jaro_winkler_similarity(a.p_name, c.p_name), 6) >= 0.88
         |), $ccLabelChain
         |SELECT l.l AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(count(DISTINCT b.p_name) AS BIGINT) AS n_names,
         |       CAST(min(b.price_c) AS BIGINT) AS min_price_c,
         |       CAST(max(b.psize) AS BIGINT) AS max_size
         |FROM lbl l JOIN b ON l.u = b.k
         |GROUP BY 1 ORDER BY n_members DESC, cluster_id LIMIT 25""".stripMargin,

    "q339_attribution_models" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), p AS (SELECT user_id, event_id AS p_id, us AS p_us
        |         FROM ev WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS t_id, event_type AS touch, us AS t_us
        |      FROM ev WHERE event_type <> 'purchase'),
        |j AS (
        |  SELECT p.p_id, t.t_id, t.touch, t.t_us
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000
        |), pp AS (
        |  SELECT p_id, n_touches, f_touch, l_touch FROM (
        |    SELECT p_id,
        |           CAST(count(*) OVER w0 AS BIGINT) AS n_touches,
        |           first_value(touch) OVER wf AS f_touch,
        |           last_value(touch) OVER wf AS l_touch,
        |           row_number() OVER wf AS rn
        |    FROM j
        |    WINDOW w0 AS (PARTITION BY p_id),
        |           wf AS (PARTITION BY p_id ORDER BY t_us, t_id, touch
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |  ) WHERE rn = 1
        |), fa AS (SELECT f_touch AS touch, CAST(count(*) AS BIGINT) AS first_purchases
        |          FROM pp GROUP BY 1),
        |la AS (SELECT l_touch AS touch, CAST(count(*) AS BIGINT) AS last_purchases
        |       FROM pp GROUP BY 1),
        |ln AS (SELECT j.touch, CAST(sum(1000000 // pp.n_touches) AS BIGINT) AS linear_u
        |       FROM j JOIN pp USING (p_id) GROUP BY 1)
        |SELECT coalesce(fa.touch, la.touch, ln.touch) AS touch,
        |       coalesce(first_purchases, 0) AS first_purchases,
        |       coalesce(last_purchases, 0) AS last_purchases,
        |       coalesce(linear_u, 0) AS linear_u
        |FROM fa FULL OUTER JOIN la ON fa.touch = la.touch
        |FULL OUTER JOIN ln ON coalesce(fa.touch, la.touch) = ln.touch
        |ORDER BY touch""".stripMargin,

    "q340_runtime_filter_plan" ->
      """WITH bld AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        |), c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_probe,
        |         CAST(sum(CASE WHEN b.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        |  FROM lineitem LEFT JOIN bld b ON l_orderkey = b.o_orderkey
        |), nb AS (SELECT CAST(count(*) AS BIGINT) AS n_build FROM bld),
        |tiers AS (SELECT * FROM (VALUES (CAST(10000 AS BIGINT), CAST(9585058 AS BIGINT)),
        |                                (1000, 14377588), (100, 19170117))
        |          AS t(fpp_ppm, bits_per_key_ppm)),
        |x AS (
        |  SELECT fpp_ppm, n_probe, n_match, n_build,
        |         ((n_build * bits_per_key_ppm + 999999) // 1000000 + 7) // 8 AS bloom_bytes,
        |         n_match + (n_probe - n_match) * fpp_ppm // 1000000 AS expected_scanned
        |  FROM c, nb, tiers
        |)
        |SELECT fpp_ppm, n_probe, n_match, n_build,
        |       CAST(bloom_bytes AS BIGINT) AS bloom_bytes,
        |       CAST(expected_scanned AS BIGINT) AS expected_scanned,
        |       CAST((n_probe - expected_scanned) * 1000000 // n_probe AS BIGINT) AS saved_ppm
        |FROM x ORDER BY fpp_ppm""".stripMargin,

    "q341_optimize_planner" ->
      """WITH o AS (
        |  SELECT o_orderkey // 4096 AS blk,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
        |  FROM orders
        |), b AS (
        |  SELECT blk, min(d) AS mn, max(d) AS mx, CAST(count(*) AS BIGINT) AS c
        |  FROM o GROUP BY 1
        |), preds AS (
        |  SELECT * FROM (VALUES ('month', CAST(9862 AS BIGINT), CAST(9893 AS BIGINT)),
        |                        ('quarter', 9862, 9952),
        |                        ('year', 9862, 10227)) AS t(pred, lo, hi)
        |), now_ AS (
        |  SELECT pred, CAST(count(*) AS BIGINT) AS blocks_now,
        |         CAST(sum(c) AS BIGINT) AS rows_now
        |  FROM preds JOIN b ON b.mn < preds.hi AND b.mx >= preds.lo GROUP BY 1
        |), dd AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1),
        |dc AS (
        |  SELECT d, c, CAST(coalesce(sum(c) OVER (ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM dd
        |), srt AS (
        |  SELECT pred, CAST(sum(c) AS BIGINT) AS matched_rows,
        |         CAST(min(cb + 1) AS BIGINT) AS first_rk,
        |         CAST(max(cb + c) AS BIGINT) AS last_rk
        |  FROM preds JOIN dc ON dc.d >= preds.lo AND dc.d < preds.hi GROUP BY 1
        |), s2 AS (
        |  SELECT pred, matched_rows,
        |         (last_rk - 1) // 4096 - (first_rk - 1) // 4096 + 1 AS blocks_sorted
        |  FROM srt
        |)
        |SELECT n.pred, s.matched_rows, n.rows_now, n.blocks_now,
        |       CAST(s.blocks_sorted AS BIGINT) AS blocks_sorted,
        |       CAST((n.blocks_now - s.blocks_sorted) * 1000000 // n.blocks_now AS BIGINT)
        |         AS io_saved_ppm
        |FROM now_ n JOIN s2 s USING (pred) ORDER BY pred""".stripMargin,

    "q342_sort_spill_plan" ->
      """WITH t AS (
        |  SELECT CAST(sum(68 + length(l_returnflag) + length(l_linestatus)) AS BIGINT) AS total_bytes,
        |         CAST(count(*) AS BIGINT) AS n_rows
        |  FROM lineitem
        |), m AS (SELECT CAST(unnest([16777216, 67108864, 268435456]) AS BIGINT) AS mem_bytes),
        |x AS (SELECT mem_bytes, n_rows, total_bytes,
        |             (total_bytes + 31) // 32 AS part_bytes FROM t, m),
        |y AS (SELECT *, greatest((part_bytes + mem_bytes - 1) // mem_bytes, 1) AS segments FROM x),
        |z AS (SELECT *, CAST(CASE WHEN segments <= 1 THEN 0 WHEN segments <= 16 THEN 1
        |                          WHEN segments <= 256 THEN 2 ELSE 3 END AS BIGINT) AS merge_passes
        |      FROM y)
        |SELECT mem_bytes, n_rows, total_bytes, CAST(part_bytes AS BIGINT) AS part_bytes,
        |       CAST(segments AS BIGINT) AS segments, merge_passes,
        |       CAST(CASE WHEN segments <= 1 THEN 0
        |                 ELSE total_bytes * merge_passes END AS BIGINT) AS spilled_bytes
        |FROM z ORDER BY mem_bytes""".stripMargin,

    "q343_incremental_clusters" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |sizes AS (SELECT l, count(*) AS sz FROM lbl GROUP BY l)
         |SELECT CAST(sz AS BIGINT) AS cluster_size,
         |       CAST(count(*) AS BIGINT) AS n_clusters,
         |       CAST(sum(sz - 1) AS BIGINT) AS n_removable
         |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin,

    "q344_retention_reclaim" ->
      """WITH bm AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
        |         CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(sum(32 + length(o_orderstatus) + length(o_orderpriority)) AS BIGINT)
        |           AS bytes
        |  FROM orders GROUP BY 1
        |), lt AS (SELECT max(mi) AS latest_mi FROM bm),
        |t AS (SELECT CAST(unnest([1, 3, 12]) AS BIGINT) AS retention_months),
        |x AS (SELECT t.retention_months, bm.bytes, lt.latest_mi - bm.mi AS age
        |      FROM bm, lt, t)
        |SELECT retention_months, CAST(count(*) AS BIGINT) AS n_months_total,
        |       CAST(sum(CASE WHEN age >= retention_months THEN 1 ELSE 0 END) AS BIGINT)
        |         AS months_freed,
        |       CAST(sum(CASE WHEN age >= retention_months THEN bytes ELSE 0 END) AS BIGINT)
        |         AS bytes_freed,
        |       CAST(sum(CASE WHEN age < retention_months THEN bytes ELSE 0 END) AS BIGINT)
        |         AS bytes_kept,
        |       CAST(sum(CASE WHEN age >= retention_months THEN bytes ELSE 0 END) * 1000000
        |            // sum(bytes) AS BIGINT) AS freed_ppm
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "q345_equidepth_histogram" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |ks AS (SELECT CAST(unnest([1, 2, 3, 4, 5, 6, 7]) AS BIGINT) AS i),
        |kk AS (SELECT i, (i * n.n) // 8 AS k, n.n AS n FROM ks, n),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
        |b AS (SELECT kk.i, kk.k, kk.n, r.v AS boundary_cents
        |      FROM kk JOIN r ON r.rk = kk.k),
        |le AS (SELECT b.i, CAST(count(*) AS BIGINT) AS rows_le
        |       FROM b JOIN v ON v.v <= b.boundary_cents GROUP BY 1)
        |SELECT b.i AS cut, CAST(b.k AS BIGINT) AS ideal_rank, b.boundary_cents,
        |       le.rows_le,
        |       CAST((le.rows_le - b.k) * 1000000 // b.n AS BIGINT) AS tie_skew_ppm
        |FROM b JOIN le USING (i) ORDER BY cut""".stripMargin,

    "q346_selectivity_audit" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |mm AS (SELECT CAST(min(v) AS BIGINT) AS gmin, CAST(max(v) AS BIGINT) AS gmax,
        |              CAST(count(*) AS BIGINT) AS n FROM v),
        |h AS (SELECT (v - gmin) * 64 // (gmax - gmin + 1) AS bin,
        |             CAST(count(*) AS BIGINT) AS c
        |      FROM v, mm GROUP BY 1),
        |p AS (SELECT CAST(unnest([25, 50, 90]) AS BIGINT) AS pct),
        |px AS (SELECT pct, gmin + (gmax - gmin) * pct // 100 AS x, gmin, gmax, n
        |       FROM p, mm),
        |e0 AS (
        |  SELECT px.pct, px.x, px.n, h.c,
        |         px.gmin + (h.bin * (px.gmax - px.gmin + 1)) // 64 AS bin_lo,
        |         px.gmin + ((h.bin + 1) * (px.gmax - px.gmin + 1)) // 64 AS bin_hi
        |  FROM px, h
        |), e AS (
        |  SELECT pct, x, n,
        |         CAST(sum(CASE WHEN bin_lo > x THEN c
        |                       WHEN bin_hi > x THEN c * (bin_hi - x) // (bin_hi - bin_lo)
        |                       ELSE 0 END) AS BIGINT) AS est_rows
        |  FROM e0 GROUP BY 1, 2, 3
        |), a AS (
        |  SELECT px.pct, CAST(count(*) AS BIGINT) AS actual_rows
        |  FROM v JOIN px ON v.v > px.x GROUP BY 1
        |)
        |SELECT e.pct, e.x AS threshold_cents, e.est_rows, a.actual_rows,
        |       CAST((e.est_rows - a.actual_rows) * 1000000 // e.n AS BIGINT) AS err_ppm
        |FROM e JOIN a USING (pct) ORDER BY e.pct""".stripMargin,

    "q347_distinct_rollup" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_texts,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY ROLLUP(lang, source)
        |ORDER BY 1, 2""".stripMargin,

    "q348_multi_distinct" ->
      """SELECT source,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_texts,
        |       CAST(count(DISTINCT (coalesce(lang, '<null>'), text)) AS BIGINT) AS n_lang_texts,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q349_pivot_measures" ->
      """SELECT source,
        |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en_n,
        |       CAST(sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END) AS BIGINT) AS en_chars,
        |       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr_n,
        |       CAST(sum(CASE WHEN lang = 'fr' THEN n_chars ELSE 0 END) AS BIGINT) AS fr_chars,
        |       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh_n,
        |       CAST(sum(CASE WHEN lang = 'zh' THEN n_chars ELSE 0 END) AS BIGINT) AS zh_chars
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q350_percentile_disc_cont" ->
      """WITH v AS (SELECT o_orderpriority AS priority,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders)
        |SELECT priority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(quantile_disc(v, 0.5) AS BIGINT) AS p50_disc_cents,
        |       round(quantile_cont(CAST(v AS DOUBLE), 0.5), 6) AS p50_cont,
        |       CAST(count(*) % 2 AS BIGINT) AS odd_count
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,

    "q351_top_ties" ->
      """WITH p AS (
        |  SELECT p_brand, p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |         CAST(rank() OVER (PARTITION BY p_brand ORDER BY round(p_retailprice * 100) DESC)
        |              AS BIGINT) AS rk
        |  FROM part
        |)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(max(rk) AS BIGINT) AS max_rank,
        |       CAST(min(price_c) AS BIGINT) AS cutoff_cents,
        |       CAST(sum(price_c) AS BIGINT) AS sum_cents
        |FROM p WHERE rk <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q352_group_mode" ->
      """WITH q AS (
        |  SELECT l_returnflag, CAST(round(l_quantity, 0) AS BIGINT) AS q,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2
        |), r AS (
        |  SELECT l_returnflag, q, c,
        |         CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, q ASC) AS rn
        |  FROM q
        |)
        |SELECT l_returnflag, q AS mode_qty, c AS mode_count, n_rows,
        |       CAST(c * 1000000 // n_rows AS BIGINT) AS mode_share_ppm
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q353_activity_islands" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(date_trunc('microseconds', ts)) // 86400000000 AS day
        |  FROM events
        |), g AS (
        |  SELECT user_id, day,
        |         day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d
        |), i AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len FROM g GROUP BY 1, 2
        |)
        |SELECT len AS island_days, CAST(count(*) AS BIGINT) AS n_islands,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,

    "q354_hierarchy_share" ->
      """WITH rev AS (
        |  SELECT r_name AS region, n_name AS nation,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2
        |)
        |SELECT region, nation, rev_c,
        |       CAST(rev_c * 1000000 // CAST(sum(rev_c) OVER (PARTITION BY region) AS BIGINT)
        |            AS BIGINT) AS of_region_ppm,
        |       CAST(rev_c * 1000000 // CAST(sum(rev_c) OVER () AS BIGINT) AS BIGINT)
        |         AS of_total_ppm
        |FROM rev ORDER BY region, nation""".stripMargin,

    "q355_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(date_trunc('microseconds', ts)) // 86400000000 AS day
        |  FROM events
        |), b AS (SELECT max(day) AS mxd FROM ud),
        |t AS (SELECT b.mxd - 4 + x.i AS d FROM b, (SELECT unnest(range(0, 5)) AS i) x),
        |da AS (SELECT t.d, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS dau
        |       FROM t JOIN ud ON ud.day = t.d GROUP BY 1),
        |wa AS (SELECT t.d, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
        |       FROM t JOIN ud ON ud.day > t.d - 7 AND ud.day <= t.d GROUP BY 1),
        |ma AS (SELECT t.d, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS mau
        |       FROM t JOIN ud ON ud.day > t.d - 28 AND ud.day <= t.d GROUP BY 1)
        |SELECT da.d AS day, dau, wau, mau,
        |       CAST(dau * 1000000 // mau AS BIGINT) AS stickiness_ppm
        |FROM da JOIN wa USING (d) JOIN ma USING (d) ORDER BY day""".stripMargin,

    "q356_listagg_ordered" ->
      """WITH p AS (
        |  SELECT p_brand, p_name,
        |         row_number() OVER (PARTITION BY p_brand
        |           ORDER BY round(p_retailprice * 100), p_name, p_partkey) AS rk
        |  FROM part
        |)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |       string_agg(p_name, ',' ORDER BY rk) AS cheapest3
        |FROM p WHERE rk <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q357_unpivot_api" ->
      """WITH m AS (
        |  SELECT 'extendedprice' AS metric,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
        |  UNION ALL SELECT 'discounted',
        |         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'tax_amount',
        |         CAST(round(l_extendedprice * l_tax * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'quantity',
        |         CAST(round(l_quantity, 0) AS BIGINT) FROM lineitem
        |)
        |SELECT metric, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS total
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q358_lateral_topk" ->
      """SELECT r.r_name AS region, t.s_name, t.bal_c
        |FROM region r,
        |LATERAL (
        |  SELECT s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY bal_c DESC, s.s_name LIMIT 2
        |) t
        |ORDER BY region, t.bal_c DESC, t.s_name""".stripMargin,

    "q359_recursive_projection" ->
      """WITH RECURSIVE rev AS (
        |  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders
        |  WHERE (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 < 24
        |  GROUP BY 1
        |), bal(mi, b) AS (
        |  SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT CAST(r.mi AS BIGINT), bal.b - bal.b // 10 + r.rev_c
        |  FROM bal JOIN rev r ON r.mi = bal.mi + 1
        |)
        |SELECT mi AS month_index, CAST(b AS BIGINT) AS balance_cents
        |FROM bal WHERE mi >= 0 ORDER BY mi""".stripMargin,

    "q360_variant_json" ->
      """WITH j AS (
        |  SELECT '{"p":"' || o_orderpriority || '","t":' ||
        |         CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) ||
        |         ',"k":' || CAST(o_orderkey AS VARCHAR) || '}' AS js
        |  FROM orders
        |)
        |SELECT js ->> '$.p' AS priority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(js ->> '$.t' AS BIGINT)) AS BIGINT) AS total_cents,
        |       CAST(max(CAST(js ->> '$.k' AS BIGINT)) AS BIGINT) AS max_key
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q361_sql_udf" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
        |       CAST(sum(CASE WHEN len(string_split(text, ' ')) BETWEEN 3 AND 500
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q362_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS st,
        |         epoch_us(date_trunc('microseconds', ts)) + 30000000 AS en
        |  FROM events
        |), m AS (
        |  SELECT user_id, st, en,
        |         max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_en
        |  FROM iv
        |), f AS (
        |  SELECT user_id, st, en,
        |         CASE WHEN max_en IS NULL OR st > max_en THEN 1 ELSE 0 END AS new_island
        |  FROM m
        |), g AS (
        |  SELECT user_id, st, en,
        |         sum(new_island) OVER (PARTITION BY user_id ORDER BY st, en
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f
        |), isl AS (
        |  SELECT user_id, island, min(st) AS ist, max(en) AS ien
        |  FROM g GROUP BY 1, 2
        |), cv AS (
        |  SELECT user_id, CAST(sum((ien - ist) // 1000000) AS BIGINT) AS covered_s,
        |         CAST(count(*) AS BIGINT) AS n_islands
        |  FROM isl GROUP BY 1
        |)
        |SELECT covered_s // 60 AS covered_min, CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(n_islands) AS BIGINT) AS total_islands
        |FROM cv GROUP BY 1 ORDER BY 1""".stripMargin,

    "q363_quantile_normalize" ->
      """WITH rk AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS r
        |  FROM documents WHERE text IS NOT NULL
        |), ref AS (
        |  SELECT r, CAST(sum(n_chars) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS c
        |  FROM rk GROUP BY 1
        |), rf AS (SELECT r, sv * 1000 // c AS ref_milli FROM ref),
        |a AS (
        |  SELECT rk.source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(rk.n_chars) AS BIGINT) AS sum_raw,
        |         CAST(sum(rf.ref_milli) AS BIGINT) AS sum_norm_milli
        |  FROM rk JOIN rf USING (r) GROUP BY 1
        |)
        |SELECT source, n_docs, sum_raw, sum_norm_milli,
        |       CAST(sum_norm_milli // n_docs - sum_raw * 1000 // n_docs AS BIGINT)
        |         AS shift_milli
        |FROM a ORDER BY source""".stripMargin,

    "q364_von_neumann" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT v, v - lag(v) OVER (ORDER BY d) AS dv FROM daily
        |), agg AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sv,
        |         CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv,
        |         CAST(sum(CASE WHEN dv IS NOT NULL
        |                       THEN CAST(dv AS HUGEINT) * dv ELSE 0 END) AS HUGEINT) AS sdd,
        |         CAST(count(dv) AS HUGEINT) AS nd
        |  FROM l
        |)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |       CAST(sdd // nd AS BIGINT) AS mssd_c2,
        |       CAST((n * svv - sv * sv) // (n * n) AS BIGINT) AS var_c2,
        |       CAST((sdd // nd) * 1000000 // ((n * svv - sv * sv) // (n * n)) AS BIGINT)
        |         AS vn_ratio_ppm
        |FROM agg""".stripMargin,

    "q365_array_hof" ->
      """WITH w AS (
        |  SELECT lang, list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
        |  FROM documents WHERE text IS NOT NULL
        |), d AS (
        |  SELECT lang, CAST(len(ws) AS BIGINT) AS n_words,
        |         CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT)
        |           AS char_sum,
        |         CAST(len(list_filter(ws, x -> length(x) > 5)) AS BIGINT) AS n_long,
        |         CAST(CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END AS BIGINT)
        |           AS has_the
        |  FROM w
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_words) AS BIGINT) AS total_words,
        |       CAST(sum(char_sum) AS BIGINT) AS total_chars,
        |       CAST(sum(n_long) AS BIGINT) AS total_long_words,
        |       CAST(sum(has_the) AS BIGINT) AS docs_with_the
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q366_imputation" ->
      """WITH v AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |         CAST(concat('0x', substr(md5('imp#' || CAST(o_orderkey AS VARCHAR)), 1, 12))
        |              AS BIGINT) % 5 = 0 AS masked
        |  FROM orders
        |), obs AS (SELECT v FROM v WHERE NOT masked),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_obs, CAST(sum(v) AS BIGINT) AS s_obs
        |       FROM obs),
        |med AS (
        |  SELECT v AS median_c FROM (
        |    SELECT v, row_number() OVER (ORDER BY v) AS r FROM obs), st
        |  WHERE r = (st.n_obs + 1) // 2
        |), md AS (
        |  SELECT v AS mode_c FROM (
        |    SELECT v, count(*) AS c, row_number() OVER (ORDER BY count(*) DESC, v ASC) AS rn
        |    FROM obs GROUP BY v)
        |  WHERE rn = 1
        |), tr AS (
        |  SELECT CAST(sum(v) AS BIGINT) AS true_sum,
        |         CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
        |  FROM v
        |), s AS (
        |  SELECT 'mean' AS strategy, st.s_obs + tr.n_masked * (st.s_obs // st.n_obs) AS imputed_sum,
        |         tr.true_sum, tr.n_masked
        |  FROM st, tr
        |  UNION ALL SELECT 'median', st.s_obs + tr.n_masked * med.median_c, tr.true_sum, tr.n_masked
        |  FROM st, tr, med
        |  UNION ALL SELECT 'mode', st.s_obs + tr.n_masked * md.mode_c, tr.true_sum, tr.n_masked
        |  FROM st, tr, md
        |)
        |SELECT strategy, CAST(imputed_sum AS BIGINT) AS imputed_sum, true_sum, n_masked,
        |       CAST((imputed_sum - true_sum) * 1000000 // true_sum AS BIGINT) AS err_ppm
        |FROM s ORDER BY strategy""".stripMargin,

    "q367_conversion_windows" ->
      """WITH u AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup'
        |                  THEN epoch_us(date_trunc('microseconds', ts)) END) AS sus,
        |         min(CASE WHEN event_type = 'purchase'
        |                  THEN epoch_us(date_trunc('microseconds', ts)) END) AS pus
        |  FROM events WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY 1
        |), d AS (
        |  SELECT CASE WHEN pus >= sus THEN pus - sus END AS delta_us
        |  FROM u WHERE sus IS NOT NULL
        |), h AS (
        |  SELECT * FROM (VALUES ('h01', CAST(3600000000 AS BIGINT)),
        |                        ('h24', 86400000000),
        |                        ('d7', 604800000000)) AS t(horizon, span_us)
        |)
        |SELECT horizon, CAST(count(*) AS BIGINT) AS n_signups,
        |       CAST(sum(CASE WHEN delta_us <= span_us THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_converted,
        |       CAST(sum(CASE WHEN delta_us <= span_us THEN 1 ELSE 0 END) * 1000000
        |            // count(*) AS BIGINT) AS conversion_ppm
        |FROM d, h GROUP BY 1 ORDER BY 1""".stripMargin,

    "q368_lsh_cost_model" ->
      s"""WITH ${minhashChain("documents")},
         |pb AS (SELECT b, bsig, CAST(count(*) AS BIGINT) AS c FROM bs GROUP BY 1, 2),
         |agg AS (SELECT b, CAST(count(*) AS BIGINT) AS n_buckets,
         |               CAST(max(c) AS BIGINT) AS max_bucket,
         |               CAST(sum(c * (c - 1) // 2) AS BIGINT) AS gen_pairs
         |        FROM pb GROUP BY 1),
         |dp AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct FROM cand),
         |tg AS (SELECT CAST(sum(gen_pairs) AS BIGINT) AS total_gen FROM agg)
         |SELECT CAST(agg.b AS BIGINT) AS band, n_buckets, max_bucket, gen_pairs,
         |       dp.n_distinct,
         |       CAST(tg.total_gen * 1000000 // greatest(dp.n_distinct, 1) AS BIGINT)
         |         AS dup_factor_ppm
         |FROM agg, dp, tg ORDER BY band""".stripMargin,

    "q369_storage_tiering" ->
      """WITH ls AS (
        |  SELECT l_partkey,
        |         max(CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |                  AS BIGINT)) AS last_day,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1
        |), mx AS (SELECT max(last_day) AS mxd FROM ls),
        |t AS (SELECT CASE WHEN mxd - last_day <= 30 THEN 'hot'
        |                  WHEN mxd - last_day <= 365 THEN 'warm' ELSE 'cold' END AS tier,
        |             rev_c
        |      FROM ls, mx),
        |a AS (SELECT tier, CAST(count(*) AS BIGINT) AS n_parts,
        |             CAST(sum(rev_c) AS BIGINT) AS rev_c FROM t GROUP BY 1)
        |SELECT tier, n_parts, rev_c,
        |       CAST(rev_c * 1000000 // CAST(sum(rev_c) OVER () AS BIGINT) AS BIGINT)
        |         AS rev_share_ppm
        |FROM a ORDER BY tier""".stripMargin,

    "q370_rolling_median" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1
        |), r AS (
        |  SELECT d, v,
        |         list_sort(list(v) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |           AS lv,
        |         row_number() OVER (ORDER BY d) AS rn
        |  FROM daily
        |)
        |SELECT strftime(d, '%Y-%m-%d') AS day, v AS revenue_c,
        |       CAST(lv[4] AS BIGINT) AS rolling_median_c
        |FROM r WHERE rn >= 7 ORDER BY day LIMIT 60""".stripMargin,

    "q371_seasonal_decomposition" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |           AS ed,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1
        |), t AS (
        |  SELECT ed, (ed + 4) % 7 AS dow, v,
        |         count(*) OVER w AS n7,
        |         CAST(sum(v) OVER w AS BIGINT) * 1000 // 7 AS trend_milli
        |  FROM daily
        |  WINDOW w AS (ORDER BY ed ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), det AS (
        |  SELECT dow, v * 1000 - trend_milli AS det_milli
        |  FROM t WHERE n7 = 7
        |), se AS (
        |  SELECT dow, CAST(sum(det_milli) // count(*) AS BIGINT) AS s_milli
        |  FROM det GROUP BY 1
        |)
        |SELECT d.dow, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(max(se.s_milli) AS BIGINT) AS seasonal_milli,
        |       CAST(sum(abs(d.det_milli - se.s_milli)) // count(*) AS BIGINT)
        |         AS mean_abs_resid_milli
        |FROM det d JOIN se USING (dow) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q372_cms_audit" ->
      """WITH cc AS (
        |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1
        |), h AS (
        |  SELECT k, n,
        |         CAST(concat('0x', substr(md5('cms0#' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % 256 AS h0,
        |         CAST(concat('0x', substr(md5('cms1#' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % 256 AS h1,
        |         CAST(concat('0x', substr(md5('cms2#' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % 256 AS h2,
        |         CAST(concat('0x', substr(md5('cms3#' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % 256 AS h3
        |  FROM cc
        |), m AS (
        |  SELECT 0 AS dd, h0 AS bucket, n FROM h
        |  UNION ALL SELECT 1, h1, n FROM h
        |  UNION ALL SELECT 2, h2, n FROM h
        |  UNION ALL SELECT 3, h3, n FROM h
        |), cnts AS (
        |  SELECT dd, bucket, CAST(sum(n) AS BIGINT) AS cnt FROM m GROUP BY 1, 2
        |), top AS (
        |  SELECT * FROM h ORDER BY n DESC, k LIMIT 20
        |), tm AS (
        |  SELECT k, n, 0 AS dd, h0 AS bucket FROM top
        |  UNION ALL SELECT k, n, 1, h1 FROM top
        |  UNION ALL SELECT k, n, 2, h2 FROM top
        |  UNION ALL SELECT k, n, 3, h3 FROM top
        |), e AS (
        |  SELECT tm.k, tm.n, CAST(min(c.cnt) AS BIGINT) AS est
        |  FROM tm JOIN cnts c ON tm.dd = c.dd AND tm.bucket = c.bucket
        |  GROUP BY 1, 2
        |)
        |SELECT k AS custkey, n AS exact, est,
        |       CAST((est - n) * 1000000 // n AS BIGINT) AS over_ppm
        |FROM e ORDER BY exact DESC, custkey""".stripMargin,

    "q373_postings_intersect" ->
      """WITH p AS (SELECT DISTINCT doc_id, w FROM (
        |        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents WHERE text IS NOT NULL) WHERE length(w) > 0),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM p),
        |top AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1
        |        ORDER BY df DESC, w LIMIT 5),
        |tp AS (SELECT p.w, p.doc_id FROM p JOIN top USING (w)),
        |a AS (SELECT x.w AS wa, y.w AS wb, CAST(count(*) AS BIGINT) AS actual
        |      FROM tp x JOIN tp y ON x.doc_id = y.doc_id AND x.w < y.w GROUP BY 1, 2)
        |SELECT wa, wb, ta.df AS df_a, tb.df AS df_b,
        |       CAST(ta.df * tb.df // nd.nd AS BIGINT) AS est, a.actual,
        |       CAST((ta.df * tb.df // nd.nd) * 1000000 // a.actual AS BIGINT) AS est_ppm
        |FROM a JOIN top ta ON a.wa = ta.w JOIN top tb ON a.wb = tb.w, nd
        |ORDER BY wa, wb""".stripMargin,

    "q374_typed_udaf" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment, CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer
        |), a AS (
        |  SELECT segment, CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
        |         CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS ss
        |  FROM c GROUP BY 1
        |)
        |SELECT segment, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum_c,
        |       CAST((n * ss - s * s) // (n * n) AS BIGINT) AS variance_c2
        |FROM a ORDER BY segment""".stripMargin,

    "q375_map_type" ->
      """WITH g AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |       string_agg(lang, ',' ORDER BY lang) AS langs,
        |       CAST(sum(c) AS BIGINT) AS total_docs,
        |       CAST(coalesce(max(CASE WHEN lang = 'en' THEN c END), 0) AS BIGINT) AS en_docs
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q376_replica_repair" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |         CASE WHEN CAST(concat('0x', substr(md5('rep#' || CAST(o_orderkey AS VARCHAR)), 1, 12))
        |                   AS BIGINT) % 1000 = 0 THEN 1 ELSE 0 END AS drift,
        |         o_orderkey // 4096 AS blk
        |  FROM orders
        |), b AS (
        |  SELECT blk, CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(sum(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR) || '#'
        |              || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT)) AS BIGINT) AS dig_a,
        |         CAST(sum(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR) || '#'
        |              || CAST(v + drift AS VARCHAR)), 1, 12)) AS BIGINT)) AS BIGINT) AS dig_b,
        |         CAST(sum(drift) AS BIGINT) AS n_drifted
        |  FROM o GROUP BY 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |       CAST(sum(CASE WHEN dig_a <> dig_b THEN 1 ELSE 0 END) AS BIGINT) AS blocks_differ,
        |       CAST(sum(CASE WHEN dig_a <> dig_b THEN n_rows ELSE 0 END) AS BIGINT) AS rows_to_sync,
        |       CAST(sum(n_drifted) AS BIGINT) AS rows_actually_drifted,
        |       CAST(sum(n_rows) AS BIGINT) AS total_rows,
        |       CAST((sum(n_rows) - sum(CASE WHEN dig_a <> dig_b THEN n_rows ELSE 0 END))
        |            * 1000000 // sum(n_rows) AS BIGINT) AS sync_saving_ppm
        |FROM b""".stripMargin,

    "q377_block_bloom" ->
      """WITH o AS (SELECT o_orderkey // 4096 AS blk, o_custkey FROM orders),
        |p AS (SELECT DISTINCT o_custkey AS probe FROM o ORDER BY 1 LIMIT 5),
        |h AS (SELECT p.probe, CAST(count(DISTINCT o.blk) AS BIGINT) AS present_blocks
        |      FROM o JOIN p ON o.o_custkey = p.probe GROUP BY 1),
        |nb AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks FROM o),
        |t AS (SELECT CAST(unnest([10000, 1000, 100]) AS BIGINT) AS fpp_ppm),
        |x AS (SELECT probe, n_blocks, present_blocks, fpp_ppm,
        |             present_blocks * 1000 + (n_blocks - present_blocks) * fpp_ppm // 1000
        |               AS erm
        |      FROM h, nb, t)
        |SELECT probe, n_blocks, present_blocks, fpp_ppm,
        |       CAST(erm AS BIGINT) AS expected_read_milli,
        |       CAST((n_blocks * 1000 - erm) * 1000 // n_blocks AS BIGINT) AS skip_ppm
        |FROM x ORDER BY probe, fpp_ppm""".stripMargin,

    "q378_bitmask_rollup" ->
      """WITH b AS (
        |  SELECT user_id,
        |         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |              WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
        |              WHEN 'error' THEN 16 ELSE 32 END AS b
        |  FROM events
        |), m AS (SELECT user_id, CAST(bit_or(b) AS BIGINT) AS mask FROM b GROUP BY 1)
        |SELECT mask, CAST(bit_count(mask) AS BIGINT) AS n_types,
        |       (mask & 4) > 0 AS has_purchase,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q379_pipe_syntax" ->
      """SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS total_cents
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q380_corr_matrix" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |         sum(CAST(CAST(round(l_quantity, 0) AS BIGINT) AS HUGEINT)) AS sq,
        |         sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS sp,
        |         sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT)) AS sd,
        |         sum(CAST(CAST(round(l_quantity, 0) AS BIGINT) AS HUGEINT)
        |             * CAST(round(l_quantity, 0) AS BIGINT)) AS sqq,
        |         sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
        |             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS spp,
        |         sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT)
        |             * CAST(round(l_discount * 100) AS BIGINT)) AS sdd,
        |         sum(CAST(CAST(round(l_quantity, 0) AS BIGINT) AS HUGEINT)
        |             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sqp,
        |         sum(CAST(CAST(round(l_quantity, 0) AS BIGINT) AS HUGEINT)
        |             * CAST(round(l_discount * 100) AS BIGINT)) AS sqd,
        |         sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
        |             * CAST(round(l_discount * 100) AS BIGINT)) AS spd
        |  FROM lineitem
        |), u AS (
        |  SELECT 'qty_price' AS pair,
        |         round(CAST(n * sqp - sq * sp AS DOUBLE) /
        |               (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) *
        |                sqrt(CAST(n * spp - sp * sp AS DOUBLE))), 6) AS corr FROM a
        |  UNION ALL
        |  SELECT 'qty_disc',
        |         round(CAST(n * sqd - sq * sd AS DOUBLE) /
        |               (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) *
        |                sqrt(CAST(n * sdd - sd * sd AS DOUBLE))), 6) FROM a
        |  UNION ALL
        |  SELECT 'price_disc',
        |         round(CAST(n * spd - sp * sd AS DOUBLE) /
        |               (sqrt(CAST(n * spp - sp * sp AS DOUBLE)) *
        |                sqrt(CAST(n * sdd - sd * sd AS DOUBLE))), 6) FROM a
        |)
        |SELECT pair, corr FROM u ORDER BY pair""".stripMargin,

    "q381_predicate_aggs" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders
        |)
        |SELECT priority,
        |       CAST(count(*) FILTER (WHERE c > 15000000) AS BIGINT) AS n_high_value,
        |       bool_and(c > 100000) AS all_above_1k,
        |       bool_or(c > 50000000) AS any_above_500k,
        |       CAST(min(c) AS BIGINT) AS min_cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q382_recommendations" ->
      """WITH bk AS (
        |  SELECT DISTINCT o_custkey AS cust, p_brand AS b
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |), ni AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM bk GROUP BY 1),
        |pr AS (SELECT a.b AS ba, c.b AS bb, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM bk a JOIN bk c ON a.cust = c.cust AND a.b < c.b GROUP BY 1, 2),
        |sims AS (
        |  SELECT ba, bb,
        |         CAST(n_ab * 1000000
        |              // CAST(floor(sqrt(CAST(na.n AS DOUBLE) * nb.n)) AS BIGINT)
        |              AS BIGINT) AS sim_u
        |  FROM pr JOIN ni na ON pr.ba = na.b JOIN ni nb ON pr.bb = nb.b
        |), sb AS (SELECT ba, bb, sim_u FROM sims
        |          UNION ALL SELECT bb, ba, sim_u FROM sims),
        |sc AS (SELECT bk.cust, sb.bb AS rec, CAST(sum(sb.sim_u) AS BIGINT) AS score_u
        |       FROM bk JOIN sb ON bk.b = sb.ba GROUP BY 1, 2),
        |sc2 AS (SELECT sc.* FROM sc LEFT JOIN bk ON sc.cust = bk.cust AND sc.rec = bk.b
        |        WHERE bk.b IS NULL),
        |rk AS (SELECT cust, rec,
        |              row_number() OVER (PARTITION BY cust ORDER BY score_u DESC, rec) AS rk
        |       FROM sc2)
        |SELECT rec AS brand, CAST(count(*) AS BIGINT) AS n_recommended,
        |       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_top_pick
        |FROM rk WHERE rk <= 3 GROUP BY 1
        |ORDER BY n_recommended DESC, brand""".stripMargin,

    "q383_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |           AS ed,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1
        |), t AS (
        |  SELECT ed, (ed + 4) % 7 AS dow, v, count(*) OVER w AS n7,
        |         CAST(sum(v) OVER w AS BIGINT) * 1000 // 7 AS trend_milli
        |  FROM daily
        |  WINDOW w AS (ORDER BY ed ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), det AS (
        |  SELECT ed, dow, v * 1000 - trend_milli AS det_milli FROM t WHERE n7 = 7
        |), se AS (
        |  SELECT dow, CAST(sum(det_milli) // count(*) AS BIGINT) AS s_milli
        |  FROM det GROUP BY 1
        |), r AS (
        |  SELECT d.ed, abs(d.det_milli - se.s_milli) AS r FROM det d JOIN se USING (dow)
        |), med AS (
        |  SELECT r AS mad_milli FROM (
        |    SELECT r, row_number() OVER (ORDER BY r) AS rn, count(*) OVER () AS n FROM r)
        |  WHERE rn = (n + 1) // 2
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(max(med.mad_milli) AS BIGINT) AS mad_milli,
        |       CAST(sum(CASE WHEN r.r > med.mad_milli * 3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_anomalies,
        |       CAST(max(CASE WHEN r.r > med.mad_milli * 3 THEN r.ed END) AS BIGINT)
        |         AS last_anomaly_ed
        |FROM r, med""".stripMargin,

    "q384_reciprocity" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), x AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        |  FROM e
        |), tr AS (
        |  SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS c
        |  FROM x WHERE nxt IS NOT NULL AND nxt <> event_type GROUP BY 1, 2
        |), mu AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_reciprocal_edges,
        |         CAST(coalesce(sum(least(a.c, b.c)), 0) AS BIGINT) AS n_mutual_min
        |  FROM tr a JOIN tr b ON a.src = b.dst AND a.dst = b.src
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges, CAST(sum(c) AS BIGINT) AS n_transitions
        |  FROM tr
        |)
        |SELECT tot.n_edges, tot.n_transitions, mu.n_reciprocal_edges, mu.n_mutual_min,
        |       CAST(mu.n_reciprocal_edges * 1000000 // tot.n_edges AS BIGINT)
        |         AS edge_reciprocity_ppm,
        |       CAST(mu.n_mutual_min * 1000000 // tot.n_transitions AS BIGINT)
        |         AS weighted_reciprocity_ppm
        |FROM tot, mu""".stripMargin,
  )
}
