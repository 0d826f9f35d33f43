package graft
package queries

import graft.functions.EsmTokenizer

/** SQL CTE fragments shared by many oracle shards (moved verbatim from
  * the OracleSql monolith's helper block).
  */
private[graft] object OracleShared {

  /** Shared stratified-split CTE (mirrors `StratifiedSplit.withSplit` on
    * orders with class = o_custkey, file order = o_orderkey).
    */
  private[graft] val splitCte: String =
    """WITH s AS (
      |  SELECT o_orderkey, o_custkey,
      |         count(*) OVER (PARTITION BY o_custkey) AS cnt,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rnf,
      |         row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY md5(concat_ws('#', CAST(o_custkey AS VARCHAR), CAST(o_orderkey AS VARCHAR))), o_orderkey) AS rns
      |  FROM orders
      |), sp AS (
      |  SELECT o_orderkey, o_custkey,
      |         CASE WHEN cnt = 1 THEN 'test'
      |              WHEN cnt = 2 THEN (CASE WHEN rnf = 1 THEN 'dev' ELSE 'test' END)
      |              WHEN cnt = 3 THEN (CASE WHEN rnf = 1 THEN 'train' WHEN rnf = 2 THEN 'dev' ELSE 'test' END)
      |              WHEN rns <= CAST(floor(cnt * CAST(0.33 AS DOUBLE)) AS BIGINT) THEN 'test'
      |              WHEN rns <= CAST(floor(cnt * CAST(0.33 AS DOUBLE)) AS BIGINT)
      |                         + CAST(floor((cnt - CAST(floor(cnt * CAST(0.33 AS DOUBLE)) AS BIGINT)) * CAST(0.33 AS DOUBLE)) AS BIGINT) THEN 'dev'
      |              ELSE 'train' END AS split
      |  FROM s
      |)""".stripMargin

  /** CASE mapping a character to its ESM-2 token id (generated from the same
    * vocab table the Scala UDF uses — single source of truth).
    */
  private[graft] val tokenIdCase: String = {
    val whens = EsmTokenizer.CharVocab.toSeq.sortBy(_._2)
      .map { case (c, id) => s"WHEN '$c' THEN $id" }
      .mkString(" ")
    s"CASE c $whens ELSE ${EsmTokenizer.UnkId} END"
  }

  /** Shared MinHash/LSH candidate-pair CTE chain (mirrors
    * `Dedup.minhashCandidates`: word 3-gram shingles, one md5 per shingle,
    * Kirsch-Mitzenmacher hash family (h1 + k*h2) mod 2^48, 2 bands × 4).
    * `src` is any relation providing (doc_id, text).
    */
  private[graft] def minhashChain(src: String): String = {
    val mins = (0 until 8)
      .map(k => s"min((h1 + $k*h2) % 281474976710656) AS m$k")
      .mkString(",\n         ")
    def bandSig(b: Int): String = {
      val parts = (0 until 4).map(i => s"CAST(m${b * 4 + i} AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS b, md5(concat_ws('-', $parts)) AS bsig FROM mh"
    }
    s"""w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM $src
       |       WHERE text IS NOT NULL),
       |sh AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(ws) >= 3
       |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]) for i in range(0, len(ws)-2)]
       |         ELSE [text] END) AS s
       |  FROM w
       |), h AS (
       |  SELECT doc_id,
       |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS h1,
       |         CAST(concat('0x', substr(md5(s), 13, 12)) AS BIGINT) AS h2
       |  FROM sh
       |), mh AS (
       |  SELECT doc_id,
       |         $mins
       |  FROM h GROUP BY doc_id
       |), bs AS (
       |  ${bandSig(0)}
       |  UNION ALL
       |  ${bandSig(1)}
       |), cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_bands
       |  FROM bs x JOIN bs y ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |)""".stripMargin
  }

  private[graft] val minhashCte: String = s"WITH ${minhashChain("documents")}"

  /** Jensen–Shannon divergence of each group's token distribution vs the
    * rest of the corpus (mirrors `CorpusStats.jsDivergence`): per-term
    * contributions quantized to 1e-9 integers (single ln + round per
    * term — the only libm calls, bit-identical across engines), summed
    * exactly. `wrSelect` supplies the (grp, w) token relation; `outCol`
    * names the group column in the output.
    */
  private[graft] def jsdSql(wrSelect: String, outCol: String): String =
    s"""WITH wr AS (
       |  $wrSelect
       |), sw AS (
       |  SELECT grp, w, CAST(count(*) AS BIGINT) AS c
       |  FROM wr WHERE length(w) > 0 GROUP BY 1, 2
       |), cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM sw GROUP BY 1),
       |gt AS (
       |  SELECT grp, CAST(sum(c) AS BIGINT) AS np,
       |         CAST(sum(sum(c)) OVER () AS BIGINT) AS nn
       |  FROM sw GROUP BY 1
       |), grid AS (
       |  SELECT cw.w, cw.cw, gt.grp, gt.np, gt.nn, coalesce(sw.c, 0) AS cq
       |  FROM cw CROSS JOIN gt
       |  LEFT JOIN sw ON sw.grp = gt.grp AND sw.w = cw.w
       |), terms AS (
       |  SELECT grp, np,
       |         CASE WHEN cq > 0 THEN CAST(round(
       |           (CAST(cq AS DOUBLE) / CAST(np AS DOUBLE))
       |           * ln((CAST(cq AS DOUBLE) / CAST(np AS DOUBLE))
       |                / (0.5 * ((CAST(cq AS DOUBLE) / CAST(np AS DOUBLE))
       |                        + (CASE WHEN nn > np THEN CAST(cw - cq AS DOUBLE) / CAST(nn - np AS DOUBLE) ELSE 0.0 END))))
       |           * 1000000000) AS BIGINT) ELSE 0 END AS tp,
       |         CASE WHEN cw > cq THEN CAST(round(
       |           (CASE WHEN nn > np THEN CAST(cw - cq AS DOUBLE) / CAST(nn - np AS DOUBLE) ELSE 0.0 END)
       |           * ln((CASE WHEN nn > np THEN CAST(cw - cq AS DOUBLE) / CAST(nn - np AS DOUBLE) ELSE 0.0 END)
       |                / (0.5 * ((CAST(cq AS DOUBLE) / CAST(np AS DOUBLE))
       |                        + (CASE WHEN nn > np THEN CAST(cw - cq AS DOUBLE) / CAST(nn - np AS DOUBLE) ELSE 0.0 END))))
       |           * 1000000000) AS BIGINT) ELSE 0 END AS tq
       |  FROM grid
       |)
       |SELECT grp AS $outCol, max(np) AS n_tokens,
       |       round(CAST(sum(tp) + sum(tq) AS DOUBLE) * 0.5 / 1000000000.0, 6) AS jsd_nats
       |FROM terms GROUP BY grp ORDER BY $outCol""".stripMargin

  /** Reachability labels over the candidate graph `cand` (mirrors
    * `ConnectedComponents.labels`): recursive-CTE transitive closure =
    * independent ground truth for the large-star/small-star propagation.
    * `lbl` is (u, l = min reachable node id). Chain after `minhashChain`
    * under a `WITH RECURSIVE` prefix.
    */
  private[graft] val ccLabelChain: String =
    """und AS (
      |  SELECT doc_a AS u, doc_b AS v FROM cand
      |  UNION
      |  SELECT doc_b AS u, doc_a AS v FROM cand
      |), reach(u, l) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
      |  UNION
      |  SELECT und.u, reach.l FROM und JOIN reach ON und.v = reach.u
      |), lbl AS (SELECT u, min(l) AS l FROM reach GROUP BY u)""".stripMargin

  /** Cluster-based loser set (mirrors `Dedup.clusterLosers`): every
    * component member except the min-id keeper.
    */
  private[graft] val ccLosersChain: String =
    s"""$ccLabelChain,
       |losers AS (SELECT u AS doc_b FROM lbl WHERE u <> l)""".stripMargin

  /** Quality-feature CTE (mirrors `TextFunctions.withQualityColumns`). */
  private[graft] val qualityCte: String =
    """qd AS (
      |  SELECT doc_id, lang, text,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |         CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
      |         + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT)
      |         + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) / 4 AS BIGINT) AS n_stop,
      |         CAST(length(text) - length(replace(replace(text, '.', ''), ',', '')) AS BIGINT) AS n_punct
      |  FROM documents
      |), qs AS (
      |  SELECT doc_id, lang, text, n_words, n_stop, n_punct,
      |         round(0.5 * least(CAST(n_words AS DOUBLE) / 200.0, 1.0)
      |             + 0.3 * least(CAST(n_stop AS DOUBLE) * 5.0 / CAST(greatest(n_words, 1) AS DOUBLE), 1.0)
      |             + 0.2 * (1.0 / (1.0 + CAST(n_punct AS DOUBLE))), 6) AS quality
      |  FROM qd
      |)""".stripMargin

  /** Shared embedding-norm CTE (mirrors `Similarity.withNorm`). */
  private[graft] val normCte: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS (SELECT vec_id, e,
      |             sqrt(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*e[i]))) AS nrm
      |      FROM v)""".stripMargin

  /** Shared IVF bucket-assignment CTE chain (mirrors
    * `Similarity.assignBuckets` with 8 centroids).
    */
  private[graft] val ivfAssignCte: String =
    s"""$normCte,
       |c AS (SELECT vec_id AS cent_id, e AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |a AS (
       |  SELECT n.vec_id, n.e, n.nrm, c.cent_id,
       |         round(list_sum(list_transform(range(1, len(n.e)+1), i -> n.e[i]*c.cv[i])) / (n.nrm * c.cn), 6) AS csim
       |  FROM n, c
       |), asg AS (
       |  SELECT vec_id, e, nrm, cent_id AS bucket FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS arn FROM a)
       |  WHERE arn = 1
       |)""".stripMargin

  private[graft] def centsSql(x: String): String = s"CAST(round(($x) * 100) AS BIGINT)"

  /** α₅₁₂·m²·2⁴⁰ for the q162 HLL estimate — α from the HLL paper's
    * m≥128 formula; the two power-of-two multiplies are exact, and the
    * SAME double literal feeds both the Spark query and the oracle SQL
    * below so both engines divide the identical numerator by the
    * identical integer register sum.
    */
  private[graft] val hllAlphaM2Scaled: Double =
    0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 1099511627776.0

  /** `iters` chained power-iteration rounds over the exact scaled
    * covariance A = n·Sxy − Sx·Sy (mirrors
    * `EmbeddingStats.powerIteration`): HUGEINT matrix-vector products,
    * renormalized by max|w| with the half-away integer rounding — no
    * doubles until the final loading readout. MATERIALIZED is load-
    * bearing: inlined, the chain re-evaluates exponentially.
    */
  private[graft] def powerIterationSql(iters: Int): String = {
    val sb = new StringBuilder(
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |x1 AS (SELECT e, unnest(range(0, len(e))) AS i FROM v),
        |x2 AS (SELECT i, CAST(round(e[i+1] * 1000000) AS BIGINT) AS xq,
        |              unnest(range(i, len(e))) AS j, e
        |       FROM x1),
        |x AS (SELECT i, j, xq,
        |             CAST(round(e[j+1] * 1000000) AS BIGINT) AS yq
        |      FROM x2),
        |s AS MATERIALIZED (
        |  SELECT i, j, count(*) AS n_vecs,
        |         sum(CAST(xq AS HUGEINT)) AS sx,
        |         sum(CAST(yq AS HUGEINT)) AS sy,
        |         sum(CAST(xq AS HUGEINT) * CAST(yq AS HUGEINT)) AS sxy
        |  FROM x GROUP BY 1, 2
        |),
        |a AS MATERIALIZED (
        |  SELECT i, j, n_vecs * sxy - sx * sy AS av FROM s
        |  UNION ALL
        |  SELECT j, i, n_vecs * sxy - sx * sy AS av FROM s WHERE i <> j
        |),
        |v0 AS (SELECT unnest(range(0, 64)) AS d, CAST(1000000 AS HUGEINT) AS vq)""".stripMargin)
    (1 to iters).foreach { t =>
      sb.append(s""",
        |w$t AS MATERIALIZED (
        |  SELECT a.i AS d, sum(a.av * p.vq) AS w
        |  FROM a JOIN v${t - 1} p ON a.j = p.d GROUP BY 1
        |),
        |m$t AS (SELECT max(abs(w)) AS wm FROM w$t),
        |v$t AS MATERIALIZED (
        |  SELECT d, CASE WHEN w < 0
        |                 THEN -((2 * (-w) * 1000000 + wm) // (2 * wm))
        |                 ELSE (2 * w * 1000000 + wm) // (2 * wm) END AS vq
        |  FROM w$t, m$t
        |)""".stripMargin)
    }
    sb.append(s"""
      |SELECT CAST(d AS BIGINT) AS dim, CAST(vq AS BIGINT) AS v_q,
      |       CAST(vq AS DOUBLE) / 1000000.0 AS loading
      |FROM v$iters ORDER BY dim""".stripMargin)
    sb.toString
  }

  /** `iters` chained Lloyd iterations (mirrors `Similarity.kmeansFit`):
    * c0 = seed centroids (vec_id < k), each round assigns by rounded
    * cosine (ties → smaller centroid id) and rebuilds centroids from
    * 1e-6-quantized component means; the final SELECT re-assigns against
    * the last centroids and reports member counts + mean cosine. Every
    * arithmetic step replays the Spark side bit-for-bit (sequential
    * list_sum dot products, round-then-sum quantization).
    */
  private[graft] def kmeansChain(k: Int, iters: Int): String = {
    val sb = new StringBuilder(normCte)
    sb.append(s",\nc0 AS (SELECT vec_id AS cent_id, e AS cv, nrm AS cn FROM n WHERE vec_id < $k)")
    def assignCte(t: String, from: String): String =
      s"""a$t AS (
         |  SELECT n.vec_id, n.e, c.cent_id,
         |         round(list_sum(list_transform(range(1, len(n.e)+1), i -> n.e[i]*c.cv[i])) / (n.nrm * c.cn), 6) AS csim
         |  FROM n, $from c
         |), asg$t AS (
         |  SELECT vec_id, e, cent_id AS bucket, csim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS arn FROM a$t)
         |  WHERE arn = 1
         |)""".stripMargin
    for (t <- 1 to iters) {
      sb.append(",\n").append(assignCte(t.toString, s"c${t - 1}"))
      sb.append(s""",
         |m$t AS (
         |  SELECT bucket, pos, ${meanMicrosSql("sq", "nm")} AS m
         |  FROM (
         |    SELECT bucket, u.pos AS pos,
         |           CAST(sum(CAST(round(u.val * 1000000) AS BIGINT)) AS BIGINT) AS sq,
         |           count(*) AS nm
         |    FROM (SELECT bucket,
         |                 unnest(list_transform(range(1, len(e)+1), i -> struct_pack(pos := i - 1, val := e[i]))) AS u
         |          FROM asg$t)
         |    GROUP BY 1, 2)
         |), cl$t AS (SELECT bucket AS cent_id, list(m ORDER BY pos) AS cv FROM m$t GROUP BY 1),
         |c$t AS (SELECT cent_id, cv,
         |               sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i]))) AS cn
         |        FROM cl$t)""".stripMargin)
    }
    sb.append(",\n").append(assignCte("f", s"c$iters"))
    sb.toString
  }

  private[graft] def kmeansSql(k: Int, iters: Int): String =
    kmeansChain(k, iters) + s"""
       |SELECT cent_id, n_members, ${meanMicrosSql("ss", "n_members")} AS mean_cosine
       |FROM (
       |  SELECT bucket AS cent_id, CAST(count(*) AS BIGINT) AS n_members,
       |         CAST(sum(CAST(round(csim * 1000000) AS BIGINT)) AS BIGINT) AS ss
       |  FROM asgf GROUP BY 1)
       |ORDER BY cent_id""".stripMargin

  /** Final-assignment label purity (mirrors the q117 rollup): majority
    * label per fitted cluster with count-then-smaller-label tie-break;
    * purity via the same integer half-away division.
    */
  private[graft] def kmeansPuritySql(k: Int, iters: Int): String =
    kmeansChain(k, iters) + s""",
       |lc AS (
       |  SELECT a.bucket, e.label, count(*) AS c
       |  FROM asgf a JOIN embeddings e ON e.vec_id = a.vec_id
       |  GROUP BY 1, 2
       |), mj AS (
       |  SELECT bucket, label, CAST(c AS BIGINT) AS c,
       |         row_number() OVER (PARTITION BY bucket ORDER BY c DESC, label) AS rn,
       |         CAST(sum(c) OVER (PARTITION BY bucket) AS BIGINT) AS n_members
       |  FROM lc
       |)
       |SELECT bucket AS cent_id, n_members,
       |       CAST(label AS BIGINT) AS majority_label, c AS n_majority,
       |       (CAST((2 * c * 1000000 + n_members) // (2 * n_members) AS DOUBLE) / 1000000.0) AS purity
       |FROM mj WHERE rn = 1 ORDER BY cent_id""".stripMargin

  /** `numMerges` chained BPE iterations (mirrors `CorpusStats.bpeTrain`):
    * v0 = char-spaced weighted vocab; each step counts adjacent symbol
    * pairs weighted by word count, picks the argmax (count desc, pair asc
    * — a total order), and applies the merge with plain left-to-right
    * `replace` (same non-overlapping semantics as the Spark side).
    */
  private[graft] def bpeSql(numMerges: Int): String = {
    val sb = new StringBuilder(
      s"""WITH v0 AS MATERIALIZED (
         |  SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0
         |  GROUP BY 1, 2
         |)""".stripMargin)
    for (t <- 1 to numMerges) {
      sb.append(s""",
         |p$t AS MATERIALIZED (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, ss[i+1] || ' ' || ss[i+2] AS pair
         |    FROM (SELECT cnt, string_split(sym, ' ') AS ss FROM v${t - 1}),
         |         LATERAL unnest(range(0, len(ss) - 1)) AS t(i)
         |    WHERE len(ss) >= 2)
         |  GROUP BY 1
         |), b$t AS MATERIALIZED (
         |  SELECT $t AS step, pair, replace(pair, ' ', '') AS merged, c
         |  FROM p$t ORDER BY c DESC, pair LIMIT 1
         |), v$t AS MATERIALIZED (
         |  SELECT w, trim(replace(' ' || sym || ' ',
         |                         ' ' || (SELECT pair FROM b$t) || ' ',
         |                         ' ' || (SELECT merged FROM b$t) || ' ')) AS sym,
         |         cnt
         |  FROM v${t - 1}
         |)""".stripMargin)
    }
    val unions = (1 to numMerges)
      .map(t => s"SELECT step, pair, merged, c AS weighted_count FROM b$t")
      .mkString("\nUNION ALL\n")
    sb.append(s"""
       |SELECT CAST(step AS BIGINT) AS step, pair, merged, weighted_count FROM (
       |$unions)
       |ORDER BY step""".stripMargin)
    sb.toString
  }

  /** Apply-side oracle: join the final segmentation v{numMerges} back to
    * the corpus word stream (mirrors `CorpusStats.bpeSegmentation`).
    */
  private[graft] def bpeApplySql(numMerges: Int): String =
    bpeSql(numMerges).split("\nSELECT CAST\\(step")(0) + s""",
       |dw AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL
       |), seg AS (
       |  SELECT dw.source,
       |         CAST(len(string_split(v.sym, ' ')) AS BIGINT) AS nsym,
       |         CAST(length(dw.w) AS BIGINT) AS nch
       |  FROM dw JOIN v$numMerges v ON v.w = dw.w
       |  WHERE length(dw.w) > 0
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(nsym) AS BIGINT) AS n_symbols,
       |       CAST(sum(nch) AS BIGINT) AS n_chars_total,
       |       round(CAST(sum(nch) AS DOUBLE) / sum(nsym), 6) AS chars_per_symbol
       |FROM seg GROUP BY 1 ORDER BY source""".stripMargin

  /** Integer half-away-from-zero mean of 1e-6-quantized sums (mirrors
    * `Similarity.meanMicros`): no round() call, so no Spark-BigDecimal vs
    * DuckDB-binary-double boundary divergence. `//` on non-negative
    * operands == SQL `div`.
    */
  private[graft] def meanMicrosSql(s: String, n: String): String =
    s"(CAST(CASE WHEN $s < 0 THEN -((2 * (-$s) + $n) // (2 * $n)) " +
      s"ELSE (2 * $s + $n) // (2 * $n) END AS DOUBLE) / 1000000.0)"

  /** Gap-based session CTE chain (mirrors `EventWindows.sessionize`, 30-min
    * gap): per-user boundary flags → running session index.
    */
  private[graft] val sessionChain: String =
    """e AS (
      |  SELECT user_id, event_id, value,
      |         epoch_us(date_trunc('microseconds', ts)) AS us
      |  FROM events
      |), f AS (
      |  SELECT user_id, event_id, value, us,
      |         CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1
      |              WHEN lag(us) OVER w IS NULL THEN 1
      |              ELSE 0 END AS is_new
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), g AS (
      |  SELECT user_id, event_id, value, us,
      |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS sess_idx
      |  FROM f
      |)""".stripMargin


  /** Two-sample per-customer spend with global deterministic ranks — the
    * shared prefix of the q574–q577 rank-test oracles (SparkEntry
    * `twoSegSpend` mirror, MACHINERY vs FURNITURE).
    */
  private[graft] def twoSegRankCte: String =
    """WITH seg AS (SELECT c_custkey,
      |                    CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS ga
      |             FROM customer WHERE c_mktsegment IN ('MACHINERY', 'FURNITURE')),
      |sp AS (SELECT o_custkey, ga,
      |              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      |       FROM orders JOIN seg ON o_custkey = c_custkey GROUP BY 1, 2),
      |rk AS (SELECT ga, CAST(row_number() OVER (ORDER BY v, o_custkey) AS BIGINT) AS i,
      |              CAST(count(*) OVER () AS BIGINT) AS nn FROM sp)""".stripMargin

  /** Undirected nation-pair trade revenue — the SparkEntry
    * `nationTradeRev` mirror (aggregate BEFORE the <> filter: an
    * inequality between dimension columns bends DuckDB's join order into
    * a supplier×customer inequality join).
    */
  private[graft] def nationTradeCte: String =
    """rev0 AS MATERIALIZED (
      |  SELECT s_nationkey AS sn, c_nationkey AS cn,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w0
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |rev AS MATERIALIZED (
      |  SELECT least(sn, cn) AS a, greatest(sn, cn) AS b,
      |         CAST(sum(w0) AS BIGINT) AS w
      |  FROM rev0 WHERE sn <> cn GROUP BY 1, 2)""".stripMargin

  /** Above-mean doubled edge set over [[nationTradeCte]] — the
    * `nationTradeEdges` mirror shared by q590/q601.
    */
  private[graft] def nationEdgesCte: String =
    nationTradeCte + """,
      |tot AS (SELECT sum(CAST(w AS HUGEINT)) AS tw, CAST(count(*) AS BIGINT) AS np FROM rev),
      |e0 AS (SELECT a, b FROM rev CROSS JOIN tot WHERE CAST(w AS HUGEINT) * np > tw),
      |ed AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0)""".stripMargin

  /** Daily mean order value (x = days since 1995-01-01, y = integer-mean
    * cents) — the SparkEntry `dailyMeanSpend` mirror under q585/q586.
    */
  private[graft] def dailySsrPrefix: String =
    """WITH days AS (SELECT CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
      |                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // count(*) AS BIGINT) AS y
      |              FROM orders GROUP BY o_orderdate)""".stripMargin

  /** Per-group OLS SSR (whole cents²) over (g, x, y) rows — the `olsSsrMilli`
    * closed-form mirror (A·C − B²)/(C·n), HUGEINT-exact.
    */
  private[graft] def ssrSelect(src: String, gExpr: String): String =
    s"""SELECT $gExpr AS g, CAST(count(*) AS BIGINT) AS n,
       |       CAST(((count(*) * sum(CAST(y AS HUGEINT) * y) - CAST(sum(y) AS HUGEINT) * sum(y))
       |              * (count(*) * sum(CAST(x AS HUGEINT) * x) - CAST(sum(x) AS HUGEINT) * sum(x))
       |            - (count(*) * sum(CAST(x AS HUGEINT) * y) - CAST(sum(x) AS HUGEINT) * sum(y))
       |              * (count(*) * sum(CAST(x AS HUGEINT) * y) - CAST(sum(x) AS HUGEINT) * sum(y)))
       |            // ((count(*) * sum(CAST(x AS HUGEINT) * x) - CAST(sum(x) AS HUGEINT) * sum(x))
       |               * count(*)) AS BIGINT) AS ssr
       |FROM $src GROUP BY 1""".stripMargin

  /** Complete (source × global-lang) count grid with 0-filled absences —
    * the SparkEntry `sourceLangGrid` mirror under the q579–q581
    * divergence panel.
    */
  private[graft] def sourceLangGridCte: String =
    """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c1raw
      |           FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
      |           GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(c1raw) AS BIGINT) AS n1 FROM c GROUP BY 1),
      |g AS (SELECT lang, CAST(sum(c1raw) AS BIGINT) AS c2 FROM c GROUP BY 1),
      |ngv AS (SELECT CAST(sum(c1raw) AS BIGINT) AS ng FROM c),
      |grid AS (SELECT ns.source, g.lang, coalesce(c.c1raw, 0) AS c1, ns.n1, g.c2, ngv.ng
      |         FROM ns CROSS JOIN g CROSS JOIN ngv
      |         LEFT JOIN c ON c.source = ns.source AND c.lang = g.lang)""".stripMargin

  /** Chunked postings mirror (`operators/Indexing.postingsChunks`): distinct
    * (term, doc) postings on the 2^16-doc roaring-container grid with
    * chunk-local delta gaps and run starts.
    */
  private[graft] def postingsCte: String =
    """WITH p AS (SELECT DISTINCT w, doc_id FROM (
      |       SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |       FROM documents WHERE text IS NOT NULL)
      |     WHERE length(w) > 0),
      |c AS (SELECT w, doc_id // 65536 AS chunk, doc_id % 65536 AS local FROM p),
      |g AS (SELECT w, chunk, local,
      |             local - coalesce(lag(local) OVER (PARTITION BY w, chunk ORDER BY local), -1) AS gap,
      |             CASE WHEN lag(local) OVER (PARTITION BY w, chunk ORDER BY local) IS NULL
      |                    OR local - lag(local) OVER (PARTITION BY w, chunk ORDER BY local) <> 1
      |                  THEN 1 ELSE 0 END AS run_start
      |      FROM c)""".stripMargin

  /** Decontamination width sweep: one generated CTE chain per shingle
    * width (the WordShingles list-comprehension mirror), each counting
    * contaminated train docs against the src0 eval side.
    */
  private[graft] def decontamSweepSql: String = {
    val sizes = Seq(3, 5, 8, 13)
    def shingleExpr(n: Int): String = {
      val parts = (1 to n).map(k => s"ws[i+$k]").mkString(", ")
      s"CASE WHEN len(ws) >= $n THEN [concat_ws(' ', $parts) for i in range(0, len(ws)-${n - 1})]" +
        " ELSE [text] END"
    }
    val sb = new StringBuilder(
      """WITH base AS (SELECT doc_id, text, source, string_split(text, ' ') AS ws
        |              FROM documents WHERE text IS NOT NULL),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM base WHERE source <> 'src0')"""
        .stripMargin)
    for (n <- sizes) {
      sb.append(s""",
         |ev$n AS (SELECT DISTINCT CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS h
         |         FROM (SELECT unnest(${shingleExpr(n)}) AS s FROM base WHERE source = 'src0')),
         |tr$n AS (SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS h
         |         FROM (SELECT doc_id, unnest(${shingleExpr(n)}) AS s FROM base
         |               WHERE source <> 'src0')),
         |c$n AS (SELECT CAST($n AS BIGINT) AS n,
         |               CAST(count(DISTINCT tr$n.doc_id) AS BIGINT) AS n_contaminated
         |        FROM tr$n JOIN ev$n ON ev$n.h = tr$n.h)""".stripMargin)
    }
    val union = sizes.map(n => s"SELECT * FROM c$n").mkString("\nUNION ALL ")
    sb.append(s""",
       |u AS ($union)
       |SELECT u.n, u.n_contaminated, nt.n_train,
       |       CAST(u.n_contaminated * 1000000 // nt.n_train AS BIGINT) AS contam_ppm
       |FROM u, nt ORDER BY u.n""".stripMargin)
    sb.toString
  }

  /** Damped weighted PageRank mirror: three unrolled integer steps over
    * the co-purchase edge list, teleport and transfer per-term floored —
    * the same loop structure as the Spark side.
    */
  private[graft] def weightedPagerankSql: String = {
    val base =
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |            FROM lineitem JOIN part ON p_partkey = l_partkey),
        |pr0 AS (SELECT a.b AS u, c.b AS v, CAST(count(*) AS BIGINT) AS w
        |        FROM ob a JOIN ob c ON a.o = c.o AND a.b <> c.b GROUP BY 1, 2),
        |wt AS (SELECT u, CAST(sum(w) AS BIGINT) AS wu FROM pr0 GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM wt)""".stripMargin
    val sb = new StringBuilder(base)
    for (t <- 1 to 3) {
      val (src, join) =
        if (t == 1) ("CAST(1000000 // nn.n AS BIGINT)", ", nn")
        else ("p.pr", s" JOIN p${t - 1} p ON p.state = pr0.u, nn")
      sb.append(s""",
         |p$t AS (
         |  SELECT pr0.v AS state,
         |         CAST((15 * 1000000) // (100 * max(nn.n))
         |              + sum((85 * $src * pr0.w) // (100 * wt.wu)) AS BIGINT) AS pr
         |  FROM pr0 JOIN wt ON wt.u = pr0.u$join
         |  GROUP BY 1)""".stripMargin)
    }
    sb.append("\nSELECT state AS brand, pr AS pr_ppm FROM p3 ORDER BY pr_ppm DESC, brand LIMIT 25")
    sb.toString
  }

  /** Markov removal-effect mirror: for each variant (none + 4 removable
    * channels) three integer backward-induction steps toward 'purchase',
    * every h-value a per-term floor-divided ppm — generated with the same
    * unrolled loop as the Spark side so both engines share the structure.
    */
  private[graft] def removalEffectSql: String = {
    val base =
      """WITH seq AS (
        |  SELECT user_id, event_type AS e,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events
        |), tr AS (
        |  SELECT e AS i, nxt AS j, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), tot AS (SELECT i, CAST(sum(n) AS BIGINT) AS ni FROM tr GROUP BY 1)""".stripMargin
    val variants = Seq("none", "click", "error", "signup", "view")
    val sb = new StringBuilder(base)
    for ((rm, vi) <- variants.zipWithIndex) {
      val cond = if (rm == "none") "1 = 1" else s"tr.i <> '$rm' AND tr.j <> '$rm'"
      for (t <- 1 to 3) {
        val (value, join) =
          if (t == 1) ("CASE WHEN tr.j = 'purchase' THEN 1000000 ELSE 0 END", "")
          else ("CASE WHEN tr.j = 'purchase' THEN 1000000 ELSE coalesce(p.hv, 0) END",
            s" LEFT JOIN h${vi}_${t - 1} p ON p.state = tr.j")
        sb.append(s""",
           |h${vi}_$t AS (
           |  SELECT tr.i AS state, CAST(sum(($value) * tr.n // tot.ni) AS BIGINT) AS hv
           |  FROM tr JOIN tot ON tot.i = tr.i$join
           |  WHERE $cond GROUP BY 1)""".stripMargin)
      }
    }
    val rows = variants.zipWithIndex.map { case (rm, vi) =>
      s"SELECT '$rm' AS removed, CAST(coalesce((SELECT hv FROM h${vi}_3 WHERE state = 'view'), 0) AS BIGINT) AS reach3_ppm"
    }
    sb.append(",\nv AS (" + rows.mkString("\nUNION ALL ") + ")\n")
    sb.append("SELECT removed, reach3_ppm, " +
      "CAST((SELECT reach3_ppm FROM v WHERE removed = 'none') - reach3_ppm AS BIGINT) AS effect_ppm " +
      "FROM v ORDER BY removed")
    sb.toString
  }

  /** Chained-CTE MMR greedy mirror (k steps, λ = 7/10): step t maximizes
    * `7·rel_u − 3·max_pen_u` over candidates outside the selected set,
    * min-id tie-break — the same pure-integer score as
    * `Similarity.mmrRerank`.
    */
  private[graft] def mmrSql(k: Int): String = {
    val sb = new StringBuilder(
      s"""$normCte,
         |q AS (SELECT e AS qv, nrm AS qn FROM n WHERE vec_id = 0),
         |rel AS (
         |  SELECT n.vec_id,
         |         CAST(round(list_sum(list_transform(range(1, len(n.e)+1), i -> n.e[i]*q.qv[i]))
         |                    / (n.nrm * q.qn) * 1000000) AS BIGINT) AS rel_u,
         |         n.e, n.nrm
         |  FROM n, q WHERE n.vec_id <> 0
         |),
         |s1 AS (SELECT vec_id, rel_u, 7*rel_u AS score_u FROM rel
         |       ORDER BY score_u DESC, vec_id LIMIT 1)""".stripMargin)
    for (t <- 2 to k) {
      val sel = (1 until t).map(i => s"SELECT vec_id FROM s$i").mkString(" UNION ALL ")
      sb.append(s""",
         |p$t AS (
         |  SELECT r.vec_id, r.rel_u,
         |         max(CAST(round(list_sum(list_transform(range(1, len(r.e)+1), i -> r.e[i]*s.e[i]))
         |                        / (r.nrm * s.nrm) * 1000000) AS BIGINT)) AS pen_u
         |  FROM rel r
         |  CROSS JOIN (SELECT e, nrm FROM rel WHERE vec_id IN ($sel)) s
         |  WHERE r.vec_id NOT IN ($sel)
         |  GROUP BY 1, 2
         |),
         |s$t AS (SELECT vec_id, rel_u, 7*rel_u - 3*pen_u AS score_u FROM p$t
         |        ORDER BY score_u DESC, vec_id LIMIT 1)""".stripMargin)
    }
    val out = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS pos, vec_id, rel_u/1000000.0 AS rel, " +
        s"CAST(score_u AS BIGINT) AS score_u FROM s$i")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY pos")
    sb.append(out).toString
  }
}
