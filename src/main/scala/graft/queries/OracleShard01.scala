package graft
package queries

import graft.functions.EsmTokenizer
import OracleShared._

/** DuckDB-oracle shard (insertion-order slice) — moved verbatim
  * out of the former OracleSql monolith (round-7 split).
  */
private[graft] object OracleShard01 {
  val defs: Map[String, String] = Map(
    "q01_stats_summary" ->
      """SELECT count(*) AS n_rows, count(DISTINCT lang) AS n_classes,
        |       CAST(min(length(text)) AS BIGINT) AS min_len,
        |       CAST(max(length(text)) AS BIGINT) AS max_len,
        |       round(median(length(text)), 6) AS median_len
        |FROM documents""".stripMargin,

    "q02_value_counts" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang",

    "q03_group_size_stats" ->
      """SELECT CAST(min(n) AS BIGINT) AS min_size, CAST(max(n) AS BIGINT) AS max_size,
        |       round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS avg_size
        |FROM (SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey)""".stripMargin,

    "q04_size_histogram" ->
      """SELECT grp_size, count(*) AS n_groups
        |FROM (SELECT l_orderkey, count(*) AS grp_size FROM lineitem GROUP BY l_orderkey)
        |GROUP BY grp_size ORDER BY grp_size""".stripMargin,

    "q05_len_freq" ->
      """SELECT CAST(length(text) AS BIGINT) AS len, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY len NULLS FIRST""".stripMargin,

    "q06_label_encode" ->
      """SELECT p_type, CAST(dense_rank() OVER (ORDER BY p_type) - 1 AS BIGINT) AS class_encoded
        |FROM (SELECT DISTINCT p_type FROM part WHERE p_type IS NOT NULL) ORDER BY p_type""".stripMargin,

    "q07_encode_apply" ->
      """WITH m AS (
        |  SELECT p_type, CAST(dense_rank() OVER (ORDER BY p_type) - 1 AS BIGINT) AS class_encoded
        |  FROM (SELECT DISTINCT p_type FROM part WHERE p_type IS NOT NULL))
        |SELECT p.p_partkey, m.class_encoded
        |FROM part p JOIN m USING (p_type) ORDER BY p_partkey""".stripMargin,

    "q08_split_assign" ->
      s"""$splitCte
         |SELECT o_orderkey, o_custkey, split FROM sp ORDER BY o_orderkey""".stripMargin,

    "q09_split_counts" ->
      s"""$splitCte
         |SELECT split, count(*) AS n FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "q10_class_weights" ->
      s"""$splitCte, counts AS (
         |  SELECT o_custkey, count(*) AS n_c FROM sp WHERE split = 'train' GROUP BY o_custkey
         |)
         |SELECT o_custkey,
         |       round(CAST((SELECT min(n_c) FROM counts) AS DOUBLE) / n_c, 6) AS weight
         |FROM counts ORDER BY o_custkey""".stripMargin,

    "q11_join_brand_revenue" ->
      s"""SELECT p.p_brand, count(*) AS n_items,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    "q12_join_nation_revenue" ->
      s"""SELECT r.r_name, n.n_name, count(*) AS n_orders,
         |       CAST(sum(${centsSql("o.o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""".stripMargin,

    "q13_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q14_union_accounts" ->
      """SELECT 'c' AS side, c_custkey AS acct_key, c_acctbal AS bal FROM customer
        |UNION ALL
        |SELECT 's' AS side, s_suppkey AS acct_key, s_acctbal AS bal FROM supplier
        |ORDER BY side, acct_key""".stripMargin,

    "q15_filter_events" ->
      s"""SELECT event_type, count(*) AS n, CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents
         |FROM events
         |WHERE props IS NOT NULL AND value IS NOT NULL AND value >= 10.0
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_event_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
         |       event_type, count(*) AS n, CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents
         |FROM events GROUP BY 1, event_type ORDER BY hour_bucket, event_type""".stripMargin,

    "q17_user_running" ->
      s"""SELECT user_id, event_id, CAST(row_number() OVER w AS BIGINT) AS rn,
         |       CAST(sum(${centsSql("value")}) OVER w AS BIGINT) AS cum_cents
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id)
         |ORDER BY user_id, rn""".stripMargin,

    "q18_tokenize" ->
      s"""WITH t AS (
         |  SELECT p_partkey, substr(upper(p_name), 1, 30) AS body FROM part
         |), ids AS (
         |  SELECT p_partkey,
         |         list_transform(string_split(body, ''), c -> $tokenIdCase) AS bids,
         |         length(body) AS blen
         |  FROM t
         |)
         |SELECT p_partkey,
         |       array_to_string(
         |         list_concat(list_concat(list_concat([0], bids), [2]),
         |                     [1 for i in range(0, 30 - blen)]), ',') AS token_str
         |FROM ids ORDER BY p_partkey""".stripMargin,

    "q19_tokenize_stats" ->
      s"""WITH chars AS (
         |  SELECT p_partkey, unnest(string_split(substr(upper(p_name), 1, 30), '')) AS c FROM part
         |), ids AS (
         |  SELECT p_partkey, $tokenIdCase AS id FROM chars
         |), sums AS (
         |  SELECT p_partkey, CAST(sum(id) AS BIGINT) AS body_sum, count(*) AS n_body
         |  FROM ids GROUP BY p_partkey
         |)
         |SELECT p_partkey, n_body + 2 AS n_tok,
         |       body_sum + 2 + (32 - (n_body + 2)) AS token_sum
         |FROM sums ORDER BY p_partkey""".stripMargin,

    "q20_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_dups
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY 1 ORDER BY content_hash""".stripMargin,

    "q21_dedup_minhash" ->
      s"""$minhashCte
         |SELECT doc_a, doc_b, n_bands FROM cand ORDER BY doc_a, doc_b""".stripMargin,

    "q22_dedup_simhash" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |wh AS (SELECT doc_id, CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) AS h FROM words),
        |bits AS (SELECT doc_id, h, unnest(range(0, 32)) AS j FROM wh),
        |sb AS (
        |  SELECT doc_id, j,
        |         sum(CASE WHEN CAST(floor(h / power(2, j)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM bits GROUP BY doc_id, j
        |), sh AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0 THEN CAST(floor(power(2, j)) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM sb GROUP BY doc_id
        |), bv AS (
        |  SELECT doc_id, simhash, b, CAST(floor(simhash / power(2, 8*b)) AS BIGINT) % 256 AS band_val
        |  FROM (SELECT doc_id, simhash, unnest(range(0, 4)) AS b FROM sh)
        |)
        |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        |FROM bv x JOIN bv y ON x.b = y.b AND x.band_val = y.band_val AND x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q23_ngram_jaccard" ->
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
         |       round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q24_embed_topk" ->
      s"""$normCte,
         |q AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |s AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.e[i])) / (q.qn * n.nrm), 6) AS sim
         |  FROM q, n WHERE n.vec_id <> q.query_id
         |), r AS (
         |  SELECT query_id, neighbor_id, sim,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, sim, rk FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,

    "q25_embed_ivf" ->
      s"""$ivfAssignCte,
         |q AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn, bucket FROM asg WHERE vec_id < 5),
         |s AS (
         |  SELECT q.query_id, asg.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*asg.e[i])) / (q.qn * asg.nrm), 6) AS sim
         |  FROM q JOIN asg USING (bucket) WHERE asg.vec_id <> q.query_id
         |), r AS (
         |  SELECT query_id, neighbor_id, sim,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, sim, rk FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "q50_embed_multiprobe" ->
      s"""$ivfAssignCte,
         |qc AS (
         |  SELECT vec_id AS query_id, e AS qv, nrm AS qn, cent_id AS bucket,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS prb
         |  FROM a WHERE vec_id < 5
         |), q AS (SELECT query_id, qv, qn, bucket FROM qc WHERE prb <= 2),
         |s AS (
         |  SELECT q.query_id, asg.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*asg.e[i])) / (q.qn * asg.nrm), 6) AS sim
         |  FROM q JOIN asg USING (bucket) WHERE asg.vec_id <> q.query_id
         |), r AS (
         |  SELECT query_id, neighbor_id, sim,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, sim, rk FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "q26_lang_profile" ->
      """SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
        |       round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*), 6) AS avg_words
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q27_quality_score" ->
      s"""WITH $qualityCte
         |SELECT doc_id, n_words, n_stop, n_punct, quality FROM qs ORDER BY doc_id""".stripMargin,

    "q28_langid" ->
      """WITH p AS (SELECT doc_id, ' ' || text || ' ' AS pt FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |         CAST((length(pt) - length(replace(pt, ' the ', ''))) / 5 AS BIGINT) AS s_en,
        |         CAST((length(pt) - length(replace(pt, ' le ', ''))) / 4 AS BIGINT) AS s_fr,
        |         CAST((length(pt) - length(replace(pt, ' der ', ''))) / 5 AS BIGINT) AS s_de,
        |         CAST((length(pt) - length(replace(pt, ' el ', ''))) / 4 AS BIGINT) AS s_es
        |  FROM p
        |)
        |SELECT doc_id, s_en, s_fr, s_de, s_es,
        |       CASE WHEN s_en IS NULL THEN NULL
        |            WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
        |            WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
        |            WHEN s_de >= s_es THEN 'de'
        |            ELSE 'es' END AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q29_token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |       CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS bpe_est,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q30_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp_md5,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS fp_poly
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q31_multimodal_meta" ->
      """WITH b AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents)
        |SELECT doc_id, nb AS n_bytes,
        |       nb % 512 AS width, (nb * 7) % 512 AS height, nb % 16 AS n_frames
        |FROM b ORDER BY doc_id""".stripMargin,

    "q32_dedup_apply" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLosersChain
         |SELECT lang, count(*) AS n_kept
         |FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_b = d.doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q33_len_quantiles" ->
      """SELECT lang,
        |       round(quantile_cont(n_chars, 0.25), 6) AS p25,
        |       round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |       round(quantile_cont(n_chars, 0.75), 6) AS p75
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q34_pivot_lang_counts" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val cols = langs
        .map(l => s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS n_$l")
        .mkString(",\n       ")
      s"""SELECT source,
         |       $cols
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    },

    "q35_event_rollup" ->
      s"""SELECT coalesce(event_type, 'ALL') AS event_type, count(*) AS n,
         |       CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents
         |FROM events GROUP BY ROLLUP(event_type)
         |ORDER BY event_type""".stripMargin,

    "q36_sessionize" ->
      s"""WITH $sessionChain
         |SELECT user_id, sess_idx, count(*) AS n_events,
         |       CAST(min(us) AS BIGINT) AS start_us,
         |       CAST(max(us) AS BIGINT) AS end_us,
         |       CAST(max(us) - min(us) AS BIGINT) AS duration_us,
         |       CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents
         |FROM g GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin,

    "q37_sliding_window" ->
      s"""WITH slid AS (
         |  SELECT date_trunc('hour', ts) AS ws, value FROM events
         |  UNION ALL
         |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
         |)
         |SELECT strftime(ws, '%Y-%m-%d %H:00:00') AS win_start, count(*) AS n,
         |       CAST(sum(${centsSql("value")}) AS BIGINT) AS value_cents
         |FROM slid GROUP BY ws ORDER BY win_start""".stripMargin,

    "q38_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
        |       TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q39_embed_neardup" ->
      s"""$ivfAssignCte
         |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |       round(list_sum(list_transform(range(1, len(x.e)+1), i -> x.e[i]*y.e[i])) / (x.nrm * y.nrm), 6) AS sim
         |FROM asg x JOIN asg y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE round(list_sum(list_transform(range(1, len(x.e)+1), i -> x.e[i]*y.e[i])) / (x.nrm * y.nrm), 6) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    // Random-hyperplane LSH: planes replayed from the same md5-parity ±1
    // coefficients the Scala side ships as literals.
    "q67_embed_lsh" ->
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
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.vec_id < y.vec_id
         |)
         |SELECT c.vec_a, c.vec_b,
         |       round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])) / (a.nrm*b.nrm), 6) AS sim
         |FROM cand c JOIN n a ON a.vec_id = c.vec_a JOIN n b ON b.vec_id = c.vec_b
         |WHERE round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])) / (a.nrm*b.nrm), 6) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q43_tfidf_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, t AS term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE length(t) > 0
        |), tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |dft AS (
        |  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms)
        |  GROUP BY term
        |), nd AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         round(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / dft.df), 6) AS score
        |  FROM tf JOIN dft USING (term), nd
        |), ranked AS (
        |  SELECT doc_id, term, score,
        |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, term, score, rk FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "q47_topk_per_group" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    "q48_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 400000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q46_deterministic_sample" ->
      """WITH u AS (
        |  SELECT lang,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS uv
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_total,
        |       CAST(sum(CASE WHEN uv * 10 < 844424930131968 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM u GROUP BY lang ORDER BY lang""".stripMargin,

    "q45_pmi_cooccurrence" ->
      """WITH dw0 AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0
        |), dw AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY w) AS rk FROM dw0)
        |  WHERE rk <= 64
        |), ca AS (SELECT w, count(*) AS c FROM dw GROUP BY w),
        |pairs AS (
        |  SELECT a.w AS w_a, b.w AS w_b, count(*) AS c_ab
        |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2
        |), nd AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT w_a, w_b, c_ab,
        |       round(ln(CAST(c_ab * nd.n_docs AS DOUBLE) / (ca1.c * ca2.c)), 6) AS pmi
        |FROM pairs
        |JOIN ca ca1 ON ca1.w = pairs.w_a
        |JOIN ca ca2 ON ca2.w = pairs.w_b
        |CROSS JOIN nd
        |WHERE c_ab * 20 >= nd.n_docs
        |ORDER BY pmi DESC, w_a, w_b LIMIT 50""".stripMargin,

    "q44_table_profile" -> {
      val c = centsSql("o_totalprice")
      s"""WITH a AS (
         |  SELECT o_orderstatus, count(*) AS n,
         |         count(DISTINCT o_custkey) AS n_customers,
         |         min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
         |         round(CAST(sum($c) AS DOUBLE) / count(*) / 100.0, 6) AS avg_price,
         |         round(median(o_totalprice), 6) AS median_price,
         |         sum(CAST($c AS HUGEINT)) AS sx,
         |         sum(CAST($c AS HUGEINT) * CAST($c AS HUGEINT)) AS sxx
         |  FROM orders GROUP BY o_orderstatus
         |)
         |SELECT o_orderstatus, n, n_customers, min_price, max_price, avg_price, median_price,
         |       CASE WHEN n > 1 THEN
         |         round(sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
         |                    / CAST(n * (n - 1) AS DOUBLE)) / 100.0, 6)
         |       END AS stddev_price
         |FROM a ORDER BY o_orderstatus""".stripMargin
    },

    "q40_curation_funnel" ->
      s"""WITH RECURSIVE $qualityCte,
         |qf AS (SELECT doc_id, lang, text FROM qs WHERE quality >= 0.45),
         |${minhashChain("qf")},
         |$ccLosersChain,
         |fin AS (
         |  SELECT lang, count(*) AS n_final FROM qf
         |  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_b = qf.doc_id)
         |  GROUP BY lang
         |),
         |qc AS (SELECT lang, count(*) AS n_quality FROM qf GROUP BY lang),
         |ic AS (SELECT lang, count(*) AS n_input FROM documents GROUP BY lang)
         |SELECT ic.lang, ic.n_input,
         |       COALESCE(qc.n_quality, 0) AS n_quality,
         |       COALESCE(fin.n_final, 0) AS n_final
         |FROM ic
         |LEFT JOIN qc ON qc.lang = ic.lang
         |LEFT JOIN fin ON fin.lang = ic.lang
         |ORDER BY ic.lang""".stripMargin,

    "q49_skew_join" ->
      s"""SELECT s.s_nationkey, count(*) AS n_items,
         |       CAST(sum(${centsSql("l.l_extendedprice")}) AS BIGINT) AS revenue_cents
         |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q51_set_ops" ->
      """SELECT 'both' AS side, nk FROM
        |  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS side, nk FROM
        |  (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'supp_only' AS side, nk FROM
        |  (SELECT s_nationkey AS nk FROM supplier EXCEPT SELECT c_nationkey FROM customer)
        |ORDER BY side, nk""".stripMargin,

    "q52_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |       coalesce(o_orderpriority, 'ALL') AS priority,
         |       count(*) AS n,
         |       CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "q53_window_analytics" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |)
        |SELECT user_id, event_id,
        |       us - lag(us, 1) OVER w AS gap_us,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pr
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q54_corr_exact" -> {
      val x = centsSql("l_quantity")
      val y = centsSql("l_extendedprice")
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |         CAST(count(*) AS HUGEINT) AS n,
         |         sum(CAST($x AS HUGEINT)) AS sx,
         |         sum(CAST($y AS HUGEINT)) AS sy,
         |         sum(CAST($x AS HUGEINT) * CAST($y AS HUGEINT)) AS sxy,
         |         sum(CAST($x AS HUGEINT) * CAST($x AS HUGEINT)) AS sxx,
         |         sum(CAST($y AS HUGEINT) * CAST($y AS HUGEINT)) AS syy
         |  FROM lineitem GROUP BY l_returnflag
         |)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
         |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |             (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         |              sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_qty_price
         |FROM a ORDER BY l_returnflag""".stripMargin
    },

    // WHERE text IS NOT NULL mirrors the Spark side (shingle explode of a
    // null text emits no rows); without it the CASE's ELSE [text] branch
    // would unnest a NULL shingle row for null-text docs.
    "q55_repetition" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(ws) >= 3
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]) for i in range(0, len(ws)-2)]
        |         ELSE [text] END) AS s
        |  FROM w
        |)
        |SELECT doc_id, count(*) AS n_grams, count(DISTINCT s) AS n_uniq,
        |       round(1.0 - CAST(count(DISTINCT s) AS DOUBLE) / count(*), 6) AS dup_ratio
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q56_word_stats" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0
        |)
        |SELECT doc_id, count(*) AS n_words, count(DISTINCT w) AS n_uniq_words,
        |       round(CAST(count(DISTINCT w) AS DOUBLE) / count(*), 6) AS uniq_ratio,
        |       round(CAST(sum(length(w)) AS DOUBLE) / count(*), 6) AS mean_word_len
        |FROM words GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q57_csv_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
        |       count(DISTINCT doc_id) AS n_ids
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q58_approx_quantiles" ->
      """SELECT lang,
        |       round(quantile_cont(n_chars, 0.25), 6) AS p25_exact,
        |       round(quantile_cont(n_chars, 0.75), 6) AS p75_exact,
        |       TRUE AS approx_in_iqr
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q59_full_outer" ->
      s"""WITH c AS (
         |  SELECT c_nationkey AS nationkey, count(*) AS n_cust,
         |         CAST(sum(${centsSql("c_acctbal")}) AS BIGINT) AS cust_cents
         |  FROM customer GROUP BY 1
         |), su AS (
         |  SELECT s_nationkey AS nationkey, count(*) AS n_supp,
         |         CAST(sum(${centsSql("s_acctbal")}) AS BIGINT) AS supp_cents
         |  FROM supplier GROUP BY 1
         |)
         |SELECT coalesce(c.nationkey, su.nationkey) AS nationkey,
         |       coalesce(c.n_cust, 0) AS n_cust,
         |       coalesce(c.cust_cents, 0) AS cust_cents,
         |       coalesce(su.n_supp, 0) AS n_supp,
         |       coalesce(su.supp_cents, 0) AS supp_cents
         |FROM c FULL OUTER JOIN su ON c.nationkey = su.nationkey
         |ORDER BY nationkey""".stripMargin,

    "q60_line_dedup" ->
      """WITH ld AS (
        |  SELECT DISTINCT doc_id, line FROM (
        |    SELECT doc_id, unnest(string_split(text, '. ')) AS line FROM documents)
        |  WHERE length(line) > 0
        |), dup AS (
        |  SELECT line FROM ld GROUP BY line HAVING count(DISTINCT doc_id) > 1
        |), per_doc AS (
        |  SELECT doc_id, count(*) AS n_lines FROM ld GROUP BY doc_id
        |), dup_per_doc AS (
        |  SELECT doc_id, count(*) AS n_dup FROM ld
        |  WHERE line IN (SELECT line FROM dup)
        |  GROUP BY doc_id
        |)
        |SELECT p.doc_id, p.n_lines,
        |       coalesce(d.n_dup, 0) AS n_dup_lines,
        |       round(CAST(coalesce(d.n_dup, 0) AS DOUBLE) / p.n_lines, 6) AS dup_line_ratio
        |FROM per_doc p LEFT JOIN dup_per_doc d ON d.doc_id = p.doc_id
        |ORDER BY p.doc_id""".stripMargin,

    "q61_embed_centroids" ->
      """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |x AS (
        |  SELECT label,
        |         unnest(list_transform(range(1, len(e)+1),
        |                               i -> struct_pack(pos := i, val := e[i]))) AS u
        |  FROM v
        |), s AS (
        |  SELECT label, u.pos AS pos,
        |         sum(CAST(round(u.val * 1000000) AS BIGINT)) AS sq,
        |         count(*) AS n
        |  FROM x GROUP BY label, pos
        |)
        |SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
        |       round(sqrt(CAST(sum(CAST(sq AS HUGEINT) * CAST(sq AS HUGEINT)) AS DOUBLE))
        |             / (max(n) * 1000000.0), 6) AS mean_norm
        |FROM s GROUP BY label ORDER BY label""".stripMargin,

    "q62_monthly_revenue" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
         |       count(*) AS n_orders,
         |       CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents,
         |       count(DISTINCT o_custkey) AS n_customers
         |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin,

    "q63_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,

    "q64_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, toks,
        |         sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT lang, CAST(floor((greatest(cum, 1) - 1) / 2048) AS BIGINT) AS pack_id,
        |       count(*) AS n_docs,
        |       CAST(sum(toks) AS BIGINT) AS pack_tokens,
        |       min(doc_id) AS first_doc
        |FROM c GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin,

    "q65_contamination" ->
      s"""$minhashCte
         |SELECT e.doc_id, count(DISTINCT t.doc_id) AS n_train_matches
         |FROM bs e
         |JOIN documents de ON de.doc_id = e.doc_id AND de.source = 'src0'
         |JOIN bs t ON t.b = e.b AND t.bsig = e.bsig
         |JOIN documents dt ON dt.doc_id = t.doc_id AND dt.source <> 'src0'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
