package graft

import graft.functions.EsmTokenizer

/** DuckDB oracle SQL for every SQL-expressible `SparkEntry.queries` entry.
  *
  * Contract (SURVEY.md §5.1): the driver runs these against the same parquet
  * tables at sf0.01 and hash-compares with the Spark output, columns sorted
  * by name. Discipline for bitwise agreement:
  *   - integer outputs everywhere possible (`CAST(... AS BIGINT)` mirrors
  *     Spark `.cast("long")`); money sums as integer cents (associative);
  *   - doubles only where derived from exact integers or identical
  *     elementwise double ops, always `round(_, 6)`;
  *   - md5-based pseudo-randomness (portable across engines);
  *   - `0.33` forced to DOUBLE (DuckDB would otherwise use exact DECIMAL
  *     arithmetic while numpy/Spark use IEEE doubles — different floors);
  *   - every query ends in a total-order ORDER BY.
  */
object OracleSql {

  /** Shared stratified-split CTE (mirrors `StratifiedSplit.withSplit` on
    * orders with class = o_custkey, file order = o_orderkey).
    */
  private val splitCte: String =
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
  private val tokenIdCase: String = {
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
  private def minhashChain(src: String): String = {
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

  private val minhashCte: String = s"WITH ${minhashChain("documents")}"

  /** Jensen–Shannon divergence of each group's token distribution vs the
    * rest of the corpus (mirrors `CorpusStats.jsDivergence`): per-term
    * contributions quantized to 1e-9 integers (single ln + round per
    * term — the only libm calls, bit-identical across engines), summed
    * exactly. `wrSelect` supplies the (grp, w) token relation; `outCol`
    * names the group column in the output.
    */
  private def jsdSql(wrSelect: String, outCol: String): String =
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
  private val ccLabelChain: String =
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
  private val ccLosersChain: String =
    s"""$ccLabelChain,
       |losers AS (SELECT u AS doc_b FROM lbl WHERE u <> l)""".stripMargin

  /** Quality-feature CTE (mirrors `TextFunctions.withQualityColumns`). */
  private val qualityCte: String =
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
  private val normCte: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS (SELECT vec_id, e,
      |             sqrt(list_sum(list_transform(range(1, len(e)+1), i -> e[i]*e[i]))) AS nrm
      |      FROM v)""".stripMargin

  /** Shared IVF bucket-assignment CTE chain (mirrors
    * `Similarity.assignBuckets` with 8 centroids).
    */
  private val ivfAssignCte: String =
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

  private def centsSql(x: String): String = s"CAST(round(($x) * 100) AS BIGINT)"

  /** α₅₁₂·m²·2⁴⁰ for the q162 HLL estimate — α from the HLL paper's
    * m≥128 formula; the two power-of-two multiplies are exact, and the
    * SAME double literal feeds both the Spark query and the oracle SQL
    * below so both engines divide the identical numerator by the
    * identical integer register sum.
    */
  val hllAlphaM2Scaled: Double =
    0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 1099511627776.0

  /** `iters` chained power-iteration rounds over the exact scaled
    * covariance A = n·Sxy − Sx·Sy (mirrors
    * `EmbeddingStats.powerIteration`): HUGEINT matrix-vector products,
    * renormalized by max|w| with the half-away integer rounding — no
    * doubles until the final loading readout. MATERIALIZED is load-
    * bearing: inlined, the chain re-evaluates exponentially.
    */
  private def powerIterationSql(iters: Int): String = {
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
  private def kmeansChain(k: Int, iters: Int): String = {
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

  private def kmeansSql(k: Int, iters: Int): String =
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
  private def kmeansPuritySql(k: Int, iters: Int): String =
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
  private def bpeSql(numMerges: Int): String = {
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
  private def bpeApplySql(numMerges: Int): String =
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
  private def meanMicrosSql(s: String, n: String): String =
    s"(CAST(CASE WHEN $s < 0 THEN -((2 * (-$s) + $n) // (2 * $n)) " +
      s"ELSE (2 * $s + $n) // (2 * $n) END AS DOUBLE) / 1000000.0)"

  /** Gap-based session CTE chain (mirrors `EventWindows.sessionize`, 30-min
    * gap): per-user boundary flags → running session index.
    */
  private val sessionChain: String =
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

  val sql: Map[String, String] = Map(
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

    // Exact-integer resampling decision replayed in HUGEINT arithmetic.
    "q68_temperature_sample" ->
      """WITH r AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |m AS (SELECT min(n_docs) AS n_min FROM r),
        |u AS (
        |  SELECT lang,
        |         CAST(concat('0x', substr(md5('samp#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS u
        |  FROM documents
        |), k AS (
        |  SELECT u.lang, r.n_docs,
        |         CASE WHEN CAST(u.u AS HUGEINT) * u.u * r.n_docs
        |                 < CAST(m.n_min AS HUGEINT) * 79228162514264337593543950336
        |              THEN 1 ELSE 0 END AS keep
        |  FROM u JOIN r USING (lang), m
        |)
        |SELECT lang, CAST(min(n_docs) AS BIGINT) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_kept
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q69_event_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events
        |), t1 AS (
        |  SELECT user_id, min(ts) AS t FROM ev WHERE event_type = 'view' GROUP BY user_id
        |), t2 AS (
        |  SELECT ev.user_id, min(ev.ts) AS t FROM ev JOIN t1 USING (user_id)
        |  WHERE ev.event_type = 'click' AND ev.ts > t1.t GROUP BY ev.user_id
        |), t3 AS (
        |  SELECT ev.user_id, min(ev.ts) AS t FROM ev JOIN t2 USING (user_id)
        |  WHERE ev.event_type = 'purchase' AND ev.ts > t2.t GROUP BY ev.user_id
        |)
        |SELECT * FROM (
        |  SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM t1
        |  UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM t2
        |  UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM t3
        |) ORDER BY step""".stripMargin,

    // Reachability via recursive CTE = independent ground truth for the
    // large-star/small-star label propagation (min reachable node id).
    // Members capped at the 20 smallest ids (mirrors the Spark side's
    // bounded sample; n_docs stays exact) — aggregates skip the NULLs the
    // CASE emits past the cap.
    "q66_dup_clusters" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |lblr AS (
         |  SELECT u, l, row_number() OVER (PARTITION BY l ORDER BY u) AS rk FROM lbl
         |)
         |SELECT l AS cluster_id, count(*) AS n_docs,
         |       string_agg(CASE WHEN rk <= 20 THEN CAST(u AS VARCHAR) END, ',' ORDER BY u) AS members
         |FROM lblr GROUP BY l ORDER BY cluster_id""".stripMargin,

    // Cross-doc repeated-3-gram fraction (distinct shingles per doc, shared
    // iff present in >1 doc).
    "q71_crossdoc_ngrams" ->
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
        |), nd AS (SELECT sk, count(*) AS nd FROM sh GROUP BY sk)
        |SELECT sh.doc_id, count(*) AS n_grams_uniq,
        |       CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |       round(CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS shared_ratio
        |FROM sh JOIN nd USING (sk)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    // Corpus-unigram-LM scoring: per-word natural-log prob quantized to
    // exact 1e-6 integers (DuckDB ln = Spark log), summed exactly per doc.
    "q72_unigram_logprob" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0
        |), dw AS (SELECT doc_id, w, count(*) AS n FROM words GROUP BY doc_id, w),
        |wc AS (SELECT w, CAST(sum(n) AS BIGINT) AS cnt FROM dw GROUP BY w),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM wc),
        |sc AS (
        |  SELECT dw.doc_id, dw.n,
        |         CAST(round(ln(CAST(wc.cnt AS DOUBLE) / t.total) * 1000000) AS BIGINT) AS lp
        |  FROM dw JOIN wc USING (w), t
        |)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
        |       round(CAST(sum(n * lp) AS DOUBLE) / sum(n) / 1000000.0, 6) AS mean_logprob
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Deterministic per-group top-K sample by md5 order.
    "q73_group_sample" ->
      """WITH u AS (
        |  SELECT lang, doc_id,
        |         CAST(concat('0x', substr(md5('gs#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS u
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS BIGINT) AS rk
        |  FROM u
        |)
        |SELECT lang, rk, doc_id FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    // Exact-then-near composition: MinHash/LSH over the distinct texts'
    // min-id keepers only (mirrors Dedup.nearDupOnUniques).
    "q70_neardup_uniques" ->
      s"""WITH u_docs AS (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text),
         |${minhashChain("u_docs")}
         |SELECT doc_a, doc_b, n_bands FROM cand ORDER BY doc_a, doc_b""".stripMargin,

    // Exact 5-gram decontamination: train docs sharing a hashed word
    // 5-gram with any eval (src0) doc; <5-word docs contribute the whole
    // text (mirrors WordShingles' fallback).
    "q74_exact_decontam" ->
      """WITH w AS (SELECT doc_id, text, source, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, source, unnest(
        |    CASE WHEN len(ws) >= 5
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5])
        |               for i in range(0, len(ws)-4)]
        |         ELSE [text] END) AS s
        |  FROM w
        |), hg AS (
        |  SELECT doc_id, source,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM g
        |), eg AS (SELECT DISTINCT sk FROM hg WHERE source = 'src0'),
        |tg AS (SELECT DISTINCT doc_id, sk FROM hg WHERE source <> 'src0')
        |SELECT tg.doc_id, count(*) AS n_shared_grams
        |FROM tg JOIN eg USING (sk)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // MinHash Jaccard estimate: fraction of the 8 signature positions
    // agreeing, for every LSH candidate pair.
    "q75_jaccard_estimate" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(nm AS BIGINT) AS n_match,
         |       round(CAST(nm AS DOUBLE) / 8.0, 6) AS est_jaccard
         |FROM nm ORDER BY doc_a, doc_b""".stripMargin,

    // Heaps'-law vocabulary growth: a word belongs to the bucket of its
    // first-occurrence doc; integer `//` mirrors Spark `div` exactly.
    "q76_vocab_growth" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0
        |), fw AS (SELECT w, min(doc_id) AS first_doc FROM words GROUP BY w),
        |b AS (
        |  SELECT first_doc // 100 AS bucket, count(*) AS n_new_words
        |  FROM fw GROUP BY 1
        |)
        |SELECT bucket, n_new_words,
        |       CAST(sum(n_new_words) OVER (ORDER BY bucket
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
        |FROM b ORDER BY bucket""".stripMargin,

    // Corpus-bigram-LM scoring: bigrams and their context word hash to
    // 48-bit keys; ln-probs quantized to exact 1e-6 integers (q72 rule).
    "q77_bigram_logprob" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |bg0 AS (
        |  SELECT doc_id, unnest([concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]) AS s
        |  FROM w WHERE len(ws) >= 2
        |), bg AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk,
        |         CAST(concat('0x', substr(md5(split_part(s, ' ', 1)), 1, 12)) AS BIGINT) AS wk
        |  FROM bg0
        |), dbg AS (SELECT doc_id, sk, wk, count(*) AS n FROM bg GROUP BY 1, 2, 3),
        |bc AS (SELECT sk, wk, CAST(sum(n) AS BIGINT) AS cb FROM dbg GROUP BY 1, 2),
        |ctx AS (SELECT wk, CAST(sum(cb) AS BIGINT) AS cw FROM bc GROUP BY 1),
        |lp AS (
        |  SELECT bc.sk, bc.wk,
        |         CAST(round(ln(CAST(bc.cb AS DOUBLE) / ctx.cw) * 1000000) AS BIGINT) AS lp
        |  FROM bc JOIN ctx USING (wk)
        |)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |       round(CAST(sum(n * lp.lp) AS DOUBLE) / sum(n) / 1000000.0, 6) AS mean_logprob
        |FROM dbg JOIN lp USING (sk, wk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Cross-source near-dup matrix: candidate pairs rolled up by the
    // unordered pair of their docs' sources.
    "q78_crosssource_dups" ->
      s"""$minhashCte
         |SELECT least(da.source, db.source) AS source_x,
         |       greatest(da.source, db.source) AS source_y,
         |       count(*) AS n_pairs
         |FROM cand
         |JOIN documents da ON cand.doc_a = da.doc_id
         |JOIN documents db ON cand.doc_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Dup-cluster size distribution over the same recursive-CTE ground
    // truth as q66: components per size, docs removable at that size.
    "q79_cluster_sizes" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |sizes AS (SELECT l, count(*) AS sz FROM lbl GROUP BY l)
         |SELECT sz AS cluster_size, count(*) AS n_clusters,
         |       CAST(sum(sz - 1) AS BIGINT) AS n_removable
         |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin,

    // Semantic decontamination: q67's hyperplane-LSH chain, restricted to
    // eval (label 0) × train (label <> 0) band matches, then exact-cosine
    // verified and rolled up per train vector.
    "q80_semantic_decontam" ->
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
         |  SELECT DISTINCT e.vec_id AS eval_id, t.vec_id AS train_id
         |  FROM bands e
         |  JOIN bands t ON e.b = t.b AND e.bv = t.bv
         |  JOIN embeddings le ON le.vec_id = e.vec_id AND le.label = 0
         |  JOIN embeddings lt ON lt.vec_id = t.vec_id AND lt.label <> 0
         |), ver AS (
         |  SELECT c.train_id,
         |         round(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])) / (a.nrm*b.nrm), 6) AS sim
         |  FROM cand c JOIN n a ON a.vec_id = c.eval_id JOIN n b ON b.vec_id = c.train_id
         |)
         |SELECT train_id AS vec_id, count(*) AS n_eval_matches, max(sim) AS max_sim
         |FROM ver WHERE sim >= 0.4
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Quality-threshold survival curve over the shared quality CTE; the
    // decile-DESC running sum counts docs surviving a cut at that decile.
    "q81_quality_survival" ->
      s"""WITH $qualityCte,
         |d AS (SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS decile FROM qs),
         |g AS (SELECT decile, count(*) AS n_docs FROM d GROUP BY 1)
         |SELECT decile, n_docs,
         |       CAST(sum(n_docs) OVER (ORDER BY decile DESC
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_surviving
         |FROM g ORDER BY decile""".stripMargin,

    "q41_asof_join" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id, event_type, value
        |  FROM events
        |), l AS (
        |  SELECT user_id, ts, 1 AS side, event_id AS err_id,
        |         NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value
        |  FROM ev WHERE event_type = 'error'
        |), r AS (
        |  SELECT user_id, ts, 0 AS side, NULL::BIGINT AS err_id, event_id AS p_id, value AS p_value
        |  FROM ev WHERE event_type = 'purchase'
        |), u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |c AS (
        |  SELECT user_id, ts, side, err_id,
        |         last_value(CASE WHEN side = 0
        |                         THEN struct_pack(p_id := p_id, p_value := p_value) END
        |                    IGNORE NULLS) OVER w AS carry
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, p_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, epoch_us(ts) AS ts_us, err_id,
        |       carry.p_id AS asof_p_id, carry.p_value AS asof_p_value
        |FROM c WHERE side = 1 ORDER BY user_id, ts_us, err_id""".stripMargin,

    "q42_range_join" ->
      s"""WITH $sessionChain,
         |sess AS (
         |  SELECT user_id, sess_idx,
         |         CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us
         |  FROM g GROUP BY user_id, sess_idx
         |), err AS (
         |  SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us, event_id
         |  FROM events WHERE event_type = 'error'
         |)
         |SELECT err.user_id, err.event_id, sess.sess_idx
         |FROM err JOIN sess
         |  ON err.user_id = sess.user_id AND err.us BETWEEN sess.start_us AND sess.end_us
         |ORDER BY err.user_id, err.event_id""".stripMargin,

    // JSONL round-trip: the oracle aggregates the parquet original — any
    // lossy JSON escaping in the Spark sink/scan breaks the hash.
    "q82_jsonl_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
        |       count(DISTINCT doc_id) AS n_ids
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // One Lloyd iteration over the shared IVF assignment: exact quantized
    // component sums (q61 pattern) → order-invariant means.
    "q83_kmeans_step" ->
      s"""$ivfAssignCte,
         |x AS (
         |  SELECT bucket, unnest(list_transform(range(1, len(e)+1),
         |                                       i -> struct_pack(pos := i - 1, val := e[i]))) AS u
         |  FROM asg
         |), s AS (
         |  SELECT bucket AS cent_id, u.pos AS pos,
         |         sum(CAST(round(u.val * 1000000) AS BIGINT)) AS sq,
         |         count(*) AS n
         |  FROM x GROUP BY 1, 2
         |)
         |SELECT cent_id, CAST(pos AS BIGINT) AS pos, n AS n_members,
         |       round(CAST(sq AS DOUBLE) / (n * 1000000.0), 6) AS mean_val
         |FROM s ORDER BY cent_id, pos""".stripMargin,

    // kNN majority vote: rank cosine neighbors, count labels among top-k,
    // argmax votes with smaller-label tie-break.
    "q84_knn_classify" ->
      s"""$normCte,
         |q AS (SELECT vec_id AS query_id, e AS qv, nrm AS qn FROM n WHERE vec_id < 25),
         |s AS (
         |  SELECT q.query_id, n.vec_id AS cand_id, le.label AS cand_label,
         |         round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.e[i])) / (q.qn * n.nrm), 6) AS sim
         |  FROM q CROSS JOIN n JOIN embeddings le ON le.vec_id = n.vec_id
         |  WHERE n.vec_id <> q.query_id
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rk
         |  FROM s
         |), vt AS (
         |  SELECT query_id, cand_label, count(*) AS n_votes, max(sim) AS top_sim
         |  FROM r WHERE rk <= 10 GROUP BY 1, 2
         |), b AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, cand_label) AS vr
         |  FROM vt
         |)
         |SELECT query_id, CAST(cand_label AS BIGINT) AS pred_label, n_votes, top_sim
         |FROM b WHERE vr = 1 ORDER BY query_id""".stripMargin,

    // Median/MAD outlier flags; the threshold uses the ROUNDED mad, same
    // as the Spark side, so the > comparison sees identical doubles.
    "q85_mad_outliers" ->
      """WITH med AS (
        |  SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM documents GROUP BY 1
        |), dev AS (
        |  SELECT d.lang, abs(CAST(d.n_chars AS DOUBLE) - m.med) AS adev, m.med AS med
        |  FROM documents d JOIN med m ON m.lang = d.lang
        |), st AS (
        |  SELECT lang, count(*) AS n_rows, round(min(med), 6) AS median_val,
        |         round(quantile_cont(adev, 0.5), 6) AS mad
        |  FROM dev GROUP BY 1
        |)
        |SELECT s.lang, s.n_rows, s.median_val, s.mad,
        |       CAST(sum(CASE WHEN dev.adev > s.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN st s ON s.lang = dev.lang
        |GROUP BY 1, 2, 3, 4 ORDER BY s.lang""".stripMargin,

    // Add-one log-odds with Fightin'-Words variance; each ln quantized to
    // a 1e-6 integer BEFORE the delta subtraction (q72 discipline).
    "q86_logodds_terms" ->
      """WITH wr AS (
        |  SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents
        |), wf AS (SELECT grp, w FROM wr WHERE length(w) > 0),
        |wc AS (SELECT grp, w, count(*) AS y FROM wf GROUP BY 1, 2),
        |wt AS (SELECT w, CAST(sum(y) AS BIGINT) AS yw FROM wc GROUP BY 1),
        |gt AS (SELECT grp, CAST(sum(y) AS BIGINT) AS ng FROM wc GROUP BY 1),
        |na AS (SELECT CAST(sum(y) AS BIGINT) AS nn, count(DISTINCT w) AS vv FROM wc),
        |sc AS (
        |  SELECT wc.grp, wc.w, wc.y,
        |         CAST(round(ln(CAST(wc.y + 1 AS DOUBLE)
        |                       / CAST(gt.ng + na.vv - wc.y - 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |       - CAST(round(ln(CAST(wt.yw - wc.y + 1 AS DOUBLE)
        |                       / CAST(na.nn - gt.ng + na.vv - (wt.yw - wc.y) - 1 AS DOUBLE)) * 1000000) AS BIGINT) AS dq,
        |         1.0 / CAST(wc.y + 1 AS DOUBLE) + 1.0 / CAST(wt.yw - wc.y + 1 AS DOUBLE) AS s2
        |  FROM wc JOIN wt USING (w) JOIN gt USING (grp) CROSS JOIN na
        |), z AS (
        |  SELECT grp, w, y, round(CAST(dq AS DOUBLE) / 1000000.0 / sqrt(s2), 6) AS z FROM sc
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY grp ORDER BY z DESC, w) AS BIGINT) AS rk
        |  FROM z
        |)
        |SELECT grp AS source, rk, w AS term, y AS n_occurrences, z
        |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // Source-pair Jaccard over hashed 3-gram sets (q74's gram + 48-bit
    // key construction at n=3).
    "q87_source_jaccard" ->
      """WITH w AS (
        |  SELECT source, text, string_split(text, ' ') AS ws FROM documents WHERE text IS NOT NULL
        |), g AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(ws) >= 3
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3]) for i in range(0, len(ws)-2)]
        |         ELSE [text] END) AS s
        |  FROM w
        |), hg AS (
        |  SELECT DISTINCT source, CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS g FROM g
        |), sz AS (SELECT source, count(*) AS sz FROM hg GROUP BY 1),
        |i AS (
        |  SELECT x.source AS source_x, y.source AS source_y, count(*) AS n_shared_grams
        |  FROM hg x JOIN hg y ON x.g = y.g AND x.source < y.source
        |  GROUP BY 1, 2
        |)
        |SELECT source_x, source_y, n_shared_grams,
        |       round(CAST(n_shared_grams AS DOUBLE) / (sx.sz + sy.sz - n_shared_grams), 6) AS jaccard
        |FROM i JOIN sz sx ON sx.source = source_x JOIN sz sy ON sy.source = source_y
        |ORDER BY source_x, source_y""".stripMargin,

    // A-ES weighted sample: ln(u)/w keys quantized to 1e-6 integers; the
    // md5 uniform and quality weight are both engine-portable.
    "q89_weighted_sample" ->
      s"""WITH $qualityCte,
         |k AS (
         |  SELECT lang, doc_id, quality,
         |         CAST(round(ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
         |                       / 281474976710656.0)
         |                    / quality * 1000000) AS BIGINT) AS skey
         |  FROM qs
         |), r AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id) AS BIGINT) AS rk
         |  FROM k
         |)
         |SELECT lang, rk, doc_id, quality, skey FROM r WHERE rk <= 5
         |ORDER BY lang, rk""".stripMargin,

    // Word-distribution entropy: per-term y·ln(y) quantized to 1e-6
    // integers, summed exactly; H = ln(n) − Σ/1e6/n.
    "q90_source_entropy" ->
      """WITH wr AS (
        |  SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents
        |), wc AS (
        |  SELECT grp, w, count(*) AS y FROM wr WHERE length(w) > 0 GROUP BY 1, 2
        |), s AS (
        |  SELECT grp, CAST(sum(y) AS BIGINT) AS n_tokens, count(*) AS n_vocab,
        |         CAST(sum(CAST(round(CAST(y AS DOUBLE) * ln(CAST(y AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS st
        |  FROM wc GROUP BY 1
        |)
        |SELECT grp AS source, n_tokens, n_vocab,
        |       round(ln(CAST(n_tokens AS DOUBLE)) - CAST(st AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE), 6) AS entropy_nats
        |FROM s ORDER BY source""".stripMargin,

    // Char-shingle decontamination: eval windows at every position,
    // train windows every 16th (spans >= 47 chars always detected);
    // substr past the end yields the prefix in both engines.
    "q91_char_decontam" ->
      """WITH eg AS (
        |  SELECT DISTINCT CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM (
        |    SELECT unnest([substr(text, i, 32)
        |                   for i in range(1, greatest(length(text) - 31, 1) + 1)]) AS s
        |    FROM documents WHERE text IS NOT NULL AND source = 'src0')
        |), tg AS (
        |  SELECT DISTINCT doc_id, CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM (
        |    SELECT doc_id,
        |           unnest([substr(text, i, 32)
        |                   for i in range(1, greatest(length(text) - 31, 1) + 1, 16)]) AS s
        |    FROM documents WHERE text IS NOT NULL AND source <> 'src0')
        |)
        |SELECT tg.doc_id, count(*) AS n_shared_windows
        |FROM tg JOIN eg USING (sk)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Dedup × quality: per quality decile, docs and cluster-loser counts
    // (losers via the recursive-CTE reachability chain, q32's rule).
    "q92_dedup_quality" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLosersChain,
         |$qualityCte,
         |dd AS (
         |  SELECT d.doc_id, least(CAST(floor(qs.quality * 10) AS BIGINT), 9) AS decile,
         |         CASE WHEN EXISTS (SELECT 1 FROM losers l WHERE l.doc_b = d.doc_id)
         |              THEN 1 ELSE 0 END AS lost
         |  FROM documents d JOIN qs ON qs.doc_id = d.doc_id
         |)
         |SELECT decile, count(*) AS n_docs,
         |       CAST(sum(lost) AS BIGINT) AS n_removed,
         |       round(CAST(sum(lost) AS DOUBLE) / count(*), 6) AS removal_rate
         |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin,

    // Zipf slope: quantized ln(rank)/ln(freq), HUGEINT regression algebra
    // (mirrors Spark's decimal38), one rounded double division.
    "q93_zipf_slope" ->
      """WITH wr AS (
        |  SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents
        |), wc AS (
        |  SELECT grp, w, count(*) AS y FROM wr WHERE length(w) > 0 GROUP BY 1, 2
        |), r AS (
        |  SELECT grp, y, row_number() OVER (PARTITION BY grp ORDER BY y DESC, w) AS rk
        |  FROM wc
        |), t AS (
        |  SELECT grp,
        |         CAST(round(ln(CAST(rk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |         CAST(round(ln(CAST(y AS DOUBLE)) * 1000000) AS BIGINT) AS yl
        |  FROM r WHERE rk <= 500
        |), s AS (
        |  SELECT grp, CAST(count(*) AS HUGEINT) AS n,
        |         sum(CAST(x AS HUGEINT)) AS sx,
        |         sum(CAST(yl AS HUGEINT)) AS sy,
        |         sum(CAST(x AS HUGEINT) * CAST(yl AS HUGEINT)) AS sxy,
        |         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        |  FROM t GROUP BY 1
        |)
        |SELECT grp AS source, CAST(n AS BIGINT) AS n_terms,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
        |FROM s ORDER BY source""".stripMargin,

    // IVF bucket-balance profile over the shared assignment CTE.
    // Mixture apply: keep iff u·G·ntok_s < Ntok·2^48 in exact HUGEINT
    // algebra (the q68 cross-multiply discipline on q99's weight).
    // Exact φ-heavy-hitters: the CMS prefilter is internal to the Spark
    // side (never undercounts → candidate superset → exact recount), so
    // the oracle is the plain exact formulation. Integer threshold
    // (N + 999) // 1000 = ⌈N/1000⌉ — no double 0.001 rounding hazard.
    "q105_heavy_hitters" ->
      """WITH w AS (SELECT text, string_split(text, ' ') AS ws
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT unnest(
        |    CASE WHEN len(ws) >= 2
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
        |         ELSE [text] END) AS gram
        |  FROM w
        |), t AS (SELECT count(*) AS total, (count(*) + 999) // 1000 AS thr FROM g)
        |SELECT gram, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(count(*) AS DOUBLE) / (SELECT total FROM t), 6) AS share
        |FROM g GROUP BY gram HAVING count(*) >= (SELECT thr FROM t)
        |ORDER BY gram""".stripMargin,

    "q106_shard_assignment" ->
      """WITH s AS (
        |  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 64 AS shard,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS pieces,
        |         n_chars
        |  FROM documents
        |), p AS (
        |  SELECT shard, count(*) AS n_docs, sum(pieces) AS n_tokens,
        |         sum(n_chars) AS n_chars_total
        |  FROM s GROUP BY shard
        |)
        |SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_chars_total AS BIGINT) AS n_chars_total,
        |       round(CAST(n_tokens AS DOUBLE) * 64 / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS load_ratio
        |FROM p ORDER BY shard""".stripMargin,

    // est (q75 chain) LEFT JOIN exact (q23 chain, inter=0 pairs KEPT as
    // exact 0) → per-n_match calibration buckets.
    "q107_lsh_calibration" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |), bg AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(ws) >= 2
         |           THEN [concat_ws(' ', ws[i+1], ws[i+2]) for i in range(0, len(ws)-1)]
         |           ELSE [text] END) AS sh
         |    FROM w)
         |), sizes AS (SELECT doc_id, count(*) AS sz FROM bg GROUP BY doc_id),
         |inter AS (
         |  SELECT n.doc_a, n.doc_b, count(*) AS i
         |  FROM nm n
         |  JOIN bg a ON a.doc_id = n.doc_a
         |  JOIN bg b ON b.doc_id = n.doc_b AND b.sh = a.sh
         |  GROUP BY 1, 2
         |), pj AS (
         |  SELECT n.nm,
         |         CASE WHEN i.i IS NULL THEN 0.0
         |              ELSE round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) END AS exact_j
         |  FROM nm n
         |  LEFT JOIN inter i ON i.doc_a = n.doc_a AND i.doc_b = n.doc_b
         |  JOIN sizes sa ON sa.doc_id = n.doc_a
         |  JOIN sizes sb ON sb.doc_id = n.doc_b
         |)
         |SELECT CAST(nm AS BIGINT) AS n_match,
         |       round(CAST(nm AS DOUBLE) / 8.0, 6) AS est_jaccard,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(CASE WHEN exact_j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |       min(exact_j) AS min_jaccard,
         |       max(exact_j) AS max_jaccard,
         |       round(CAST(sum(CASE WHEN exact_j >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS "precision"
         |FROM pj GROUP BY nm ORDER BY n_match""".stripMargin,

    "q108_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_pieces,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |       round(CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE)
        |             / sum(len(string_split(text, ' '))), 6) AS fertility,
        |       round(CAST(sum(n_chars) AS DOUBLE)
        |             / sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))), 6) AS chars_per_piece
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q116_kmeans_fit" -> kmeansSql(k = 8, iters = 3),

    "q122_bpe_merges" -> bpeSql(numMerges = 8),

    "q123_bpe_apply" -> bpeApplySql(numMerges = 8),

    "q117_cluster_purity" -> kmeansPuritySql(k = 8, iters = 3),

    // Round-trip through the ORC zone is lossless, so the oracle is the
    // same aggregation over the parquet original (q57/q82 discipline).
    "q120_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       count(DISTINCT doc_id) AS n_ids
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Bootstrap weights replay the SAME integer thresholds the Spark side
    // uses (interpolated from Stats.PoissonCum48, not retyped).
    "q121_bootstrap_ci" -> {
      val cases = graft.ops.Stats.PoissonCum48.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("\n         ")
      s"""WITH r AS (
         |  SELECT lang, doc_id,
         |         CAST(round(CAST(n_chars AS DOUBLE) * 1000000) AS BIGINT) AS v6,
         |         unnest(range(0, 32)) AS b
         |  FROM documents
         |), wts AS (
         |  SELECT lang, b, v6,
         |         CASE $cases ELSE 9 END AS w
         |  FROM (SELECT *,
         |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#b' || CAST(b AS VARCHAR)), 1, 12)) AS BIGINT) AS u
         |        FROM r)
         |), m AS (
         |  SELECT lang, b,
         |         (CAST(sum(w * v6) AS DOUBLE) / CAST(sum(w) AS BIGINT)) / 1000000.0 AS mean_b
         |  FROM wts GROUP BY 1, 2 HAVING sum(w) > 0
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_reps,
         |       round(quantile_cont(mean_b, 0.025), 6) AS ci_lo,
         |       round(quantile_cont(mean_b, 0.975), 6) AS ci_hi
         |FROM m GROUP BY 1 ORDER BY lang""".stripMargin
    },

    // Quality-keeper per cluster: rank members by (quality desc, id), the
    // rank-1 row is the keeper; min-id losers come from the label itself.
    "q126_keeper_policy" ->
      s"""WITH RECURSIVE ${minhashChain("documents")},
         |$ccLabelChain,
         |$qualityCte,
         |mem AS (
         |  SELECT lbl.u, lbl.l, q.quality,
         |         row_number() OVER (PARTITION BY lbl.l ORDER BY q.quality DESC, lbl.u) AS rn
         |  FROM lbl JOIN qs q ON q.doc_id = lbl.u
         |)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN m.u IS NOT NULL AND m.u <> m.l THEN 0 ELSE 1 END) AS BIGINT) AS n_kept_minid,
         |       CAST(sum(CASE WHEN m.u IS NOT NULL AND m.rn > 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_kept_quality
         |FROM documents d LEFT JOIN mem m ON m.u = d.doc_id
         |GROUP BY 1 ORDER BY source""".stripMargin,

    "q127_dup_degree" ->
      s"""$minhashCte,
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT doc_a AS node FROM cand
         |    UNION ALL
         |    SELECT doc_b AS node FROM cand)
         |  GROUP BY node
         |)
         |SELECT deg AS degree, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin,

    "q125_blocking_overlap" ->
      s"""$minhashCte,
         |lshp AS (SELECT doc_a, doc_b FROM cand),
         |k AS (
         |  SELECT doc_id AS id,
         |         substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |                                    ' +', ' ', 'g')), 1, 24) AS key
         |  FROM documents WHERE text IS NOT NULL
         |), r AS (
         |  SELECT id, key, substr(key, 1, 6) AS blk,
         |         row_number() OVER (PARTITION BY substr(key, 1, 6) ORDER BY key, id) AS rn
         |  FROM k
         |), snmp AS (
         |  SELECT DISTINCT least(a.id, b.id) AS doc_a, greatest(a.id, b.id) AS doc_b
         |  FROM r a JOIN r b ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
         |), agree AS (SELECT doc_a, doc_b FROM lshp INTERSECT SELECT doc_a, doc_b FROM snmp),
         |c AS (
         |  SELECT (SELECT count(*) FROM lshp) AS n_lsh,
         |         (SELECT count(*) FROM snmp) AS n_snm,
         |         (SELECT count(*) FROM agree) AS n_both
         |)
         |SELECT CAST(n_lsh AS BIGINT) AS n_lsh, CAST(n_snm AS BIGINT) AS n_snm,
         |       CAST(n_both AS BIGINT) AS n_both,
         |       round(CAST(n_both AS DOUBLE) / (n_lsh + n_snm - n_both), 6) AS pair_jaccard
         |FROM c""".stripMargin,

    "q124_sorted_neighborhood" ->
      """WITH k AS (
        |  SELECT doc_id AS id,
        |         substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                    ' +', ' ', 'g')), 1, 24) AS key
        |  FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT id, key, substr(key, 1, 6) AS blk,
        |         row_number() OVER (PARTITION BY substr(key, 1, 6) ORDER BY key, id) AS rn
        |  FROM k
        |)
        |SELECT a.id AS doc_a, b.id AS doc_b,
        |       CAST(CASE WHEN a.key = b.key THEN 1 ELSE 0 END AS BIGINT) AS same_key
        |FROM r a JOIN r b
        |  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Forward fill via IGNORE NULLS last_value; the grid starts at each
    // user's own first hour so the fill never sees a leading null.
    "q128_gap_fill" ->
      s"""WITH hr AS (
         |  SELECT user_id, date_trunc('hour', date_trunc('microseconds', ts)) AS h,
         |         CAST(sum(${centsSql("value")}) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2
         |), b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hr GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b
         |), j AS (
         |  SELECT g.user_id, g.h, hr.v
         |  FROM grid g LEFT JOIN hr ON hr.user_id = g.user_id AND hr.h = g.h
         |), f AS (
         |  SELECT user_id, h, v,
         |         last_value(v IGNORE NULLS) OVER (
         |           PARTITION BY user_id ORDER BY h
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
         |  FROM j
         |)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours,
         |       CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
         |       CAST(sum(fv) AS BIGINT) AS sum_filled_cents,
         |       round(CAST(1.0 AS DOUBLE) - CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS gap_rate
         |FROM f GROUP BY 1 ORDER BY user_id""".stripMargin,

    // Top-10 ties broken by orderkey; revenue in exact cents so the rank
    // order is engine-identical.
    "q129_shipping_priority" ->
      s"""SELECT l.l_orderkey,
         |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
         |       o.o_orderpriority,
         |       CAST(sum(${centsSql("l.l_extendedprice * (1 - l.l_discount)")}) AS BIGINT) AS revenue_cents
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < DATE '1998-07-01'
         |  AND l.l_shipdate > DATE '1998-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_cents DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q118_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events
        |), t AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |  FROM e
        |), c AS (
        |  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |), f AS (
        |  SELECT prev_type, event_type, n,
        |         CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from
        |  FROM c
        |)
        |SELECT prev_type, event_type, n,
        |       (CAST((2 * n * 1000000 + n_from) // (2 * n_from) AS DOUBLE) / 1000000.0) AS p
        |FROM f ORDER BY prev_type, event_type""".stripMargin,

    // expected/contrib derive from the UNROUNDED e; `expected` rounds only
    // at the projection (mirrors the Spark column order of operations).
    "q119_lang_source_indep" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2
        |), t AS (
        |  SELECT lang, source, o,
        |         CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS rl,
        |         CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS cl,
        |         CAST(sum(o) OVER () AS BIGINT) AS nn
        |  FROM cells
        |)
        |SELECT lang, source, o AS observed,
        |       round(CAST(rl AS DOUBLE) * cl / nn, 6) AS expected,
        |       round((o - CAST(rl AS DOUBLE) * cl / nn) * (o - CAST(rl AS DOUBLE) * cl / nn)
        |             / (CAST(rl AS DOUBLE) * cl / nn), 6) AS contrib
        |FROM t ORDER BY lang, source""".stripMargin,

    "q113_winsorized_stats" ->
      """WITH p AS (
        |  SELECT lang, quantile_cont(n_chars, 0.05) AS plo, quantile_cont(n_chars, 0.95) AS phi
        |  FROM documents GROUP BY lang
        |), v AS (
        |  SELECT d.lang, p.plo, p.phi, CAST(d.n_chars AS DOUBLE) AS v,
        |         CAST(round(least(greatest(CAST(d.n_chars AS DOUBLE), p.plo), p.phi) * 1000000) AS BIGINT) AS wq
        |  FROM documents d JOIN p USING (lang)
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |       round(min(plo), 6) AS p_lo,
        |       round(min(phi), 6) AS p_hi,
        |       round(CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE) / (count(*) * 1000000.0), 6) AS raw_mean,
        |       round(CAST(sum(wq) AS DOUBLE) / (count(*) * 1000000.0), 6) AS winsorized_mean
        |FROM v GROUP BY lang ORDER BY lang""".stripMargin,

    "q114_source_concentration" ->
      """WITH per AS (
        |  SELECT source,
        |         CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS ntok
        |  FROM documents GROUP BY source
        |), t AS (SELECT CAST(sum(ntok) AS BIGINT) AS total, count(*) AS n_sources FROM per),
        |q AS (
        |  SELECT t.n_sources, t.total,
        |         CAST(round((CAST(ntok AS DOUBLE) / t.total) * (CAST(ntok AS DOUBLE) / t.total)
        |                    * 1000000000000.0) AS BIGINT) AS q
        |  FROM per, t
        |)
        |SELECT CAST(n_sources AS BIGINT) AS n_sources, total AS total_tokens,
        |       round(CAST(sum(q) AS DOUBLE) / 1000000000000.0, 6) AS hhi,
        |       round(1000000000000.0 / CAST(sum(q) AS DOUBLE), 6) AS effective_sources
        |FROM q GROUP BY n_sources, total""".stripMargin,

    "q115_token_budget" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT source, tok,
        |         sum(tok) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN cum <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN cum <= 5000 THEN tok ELSE 0 END) AS BIGINT) AS tokens_kept,
        |       round(CAST(sum(CASE WHEN cum <= 5000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS keep_rate
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q104_mixture_apply" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         coalesce(CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT), 0) AS tok
        |  FROM documents
        |), b AS (SELECT source, CAST(sum(tok) AS BIGINT) AS ntok FROM d GROUP BY 1),
        |t AS (
        |  SELECT source, ntok,
        |         CAST(sum(ntok) OVER () AS BIGINT) AS ntok_all,
        |         CAST(count(*) OVER () AS BIGINT) AS n_sources
        |  FROM b
        |), k AS (
        |  SELECT d.source,
        |         CASE WHEN CAST(CAST(concat('0x', substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS HUGEINT)
        |                   * t.n_sources * t.ntok
        |                 < CAST(t.ntok_all AS HUGEINT) * 281474976710656
        |              THEN 1 ELSE 0 END AS keep
        |  FROM d JOIN t USING (source)
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(keep) AS BIGINT) AS n_kept,
        |       round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS keep_rate
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // JSON extraction: TRY_CAST chain ≡ Spark PERMISSIVE from_json
    // (null / malformed / wrong-typed k all land as NULL).
    "q103_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |         TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
        |       CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k,
        |       round(CAST(sum(coalesce(k, 0)) AS DOUBLE)
        |             / CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE), 6) AS mean_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // PII audit: RE2 mirrors of the Java patterns (common subset — no
    // lookaround/backrefs); counts claimed in the same redaction order.
    "q102_pii_audit" ->
      """WITH d AS (
        |  SELECT source, text,
        |         regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM documents WHERE text IS NOT NULL
        |), d2 AS (
        |  SELECT source, text, t1,
        |         regexp_replace(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS t2
        |  FROM d
        |), d3 AS (
        |  SELECT source, text, t1, t2,
        |         regexp_replace(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t3
        |  FROM d2
        |), c AS (
        |  SELECT source,
        |         CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS ne,
        |         CAST(len(regexp_extract_all(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS ns,
        |         CAST(len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS ni,
        |         CAST(len(regexp_extract_all(t3, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS np
        |  FROM d3
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(ne) AS BIGINT) AS n_emails,
        |       CAST(sum(ns) AS BIGINT) AS n_ssns,
        |       CAST(sum(ni) AS BIGINT) AS n_ips,
        |       CAST(sum(np) AS BIGINT) AS n_phones,
        |       CAST(sum(CASE WHEN ne + ns + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Source JSD: identical expression order (p, q, m, term), identical
    // 1e-9 quantization of each per-word term before summation.
    "q101_source_jsd" ->
      jsdSql("SELECT source AS grp, unnest(string_split(text, ' ')) AS w FROM documents",
        "source"),

    // q101's JSD machinery on a time axis: each month's event-type mix vs
    // the rest of the stream.
    "q111_temporal_jsd" ->
      jsdSql("SELECT strftime(ts, '%Y-%m') AS grp, unnest(string_split(event_type, ' ')) AS w FROM events",
        "month"),

    "q109_snapshot_diff" ->
      """WITH oldsnap AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 13 = 5 THEN text || ' v0' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 3
        |), newsnap AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id % 17 <> 2
        |), d AS (
        |  SELECT coalesce(n.source, o.source) AS source,
        |         CASE WHEN o.doc_id IS NULL THEN 'added'
        |              WHEN n.doc_id IS NULL THEN 'removed'
        |              WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
        |              ELSE 'unchanged' END AS change_status
        |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
        |)
        |SELECT source, change_status, CAST(count(*) AS BIGINT) AS n_docs
        |FROM d GROUP BY 1, 2 ORDER BY source, change_status""".stripMargin,

    "q110_normalized_dedup" ->
      """WITH n AS (
        |  SELECT source,
        |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                 ' +', ' ', 'g'))) AS nh
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT nh) AS BIGINT) AS n_normalized,
        |       round(CAST(1.0 AS DOUBLE) - CAST(count(DISTINCT nh) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM n GROUP BY 1 ORDER BY source""".stripMargin,

    // Per-doc char-window multiplicities (md5 48-bit keys, q91 hashing),
    // rolled to per-source exact integers + one rounded division.
    "q112_intra_doc_repetition" ->
      """WITH wins AS (
        |  SELECT source, doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM (
        |    SELECT source, doc_id,
        |           unnest([substr(text, i, 20)
        |                   for i in range(1, greatest(length(text) - 19, 1) + 1)]) AS s
        |    FROM documents WHERE text IS NOT NULL)
        |), perwin AS (
        |  SELECT source, doc_id, sk, count(*) AS m FROM wins GROUP BY 1, 2, 3
        |), perdoc AS (
        |  SELECT source, doc_id, sum(m) AS nw, count(*) AS nd, max(m) AS mx
        |  FROM perwin GROUP BY 1, 2
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nw) AS BIGINT) AS n_windows,
        |       CAST(sum(nd) AS BIGINT) AS n_distinct_windows,
        |       CAST(sum(CASE WHEN mx >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_repetitive,
        |       round(CAST(1.0 AS DOUBLE) - CAST(sum(nd) AS DOUBLE) / CAST(sum(nw) AS DOUBLE), 6) AS dup_window_share
        |FROM perdoc GROUP BY 1 ORDER BY source""".stripMargin,


    // Mixture weights: uniform target over the observed sources; the
    // window-free SQL form of the bounded-relation window.
    "q99_mixture_weights" ->
      """WITH b AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(coalesce(CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT), 0)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |)
        |SELECT source, n_docs, n_tokens,
        |       round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS token_share,
        |       round((CAST(1.0 AS DOUBLE) / count(*) OVER ())
        |             / (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()), 6) AS weight
        |FROM b ORDER BY source""".stripMargin,

    // Dup-rate curve over the q75 estimate chain.
    "q100_dup_curve" ->
      s"""$minhashCte,
         |nm AS (
         |  SELECT c.doc_a, c.doc_b,
         |         (CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END + CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END + CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END + CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END
         |        + CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END + CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS nm
         |  FROM cand c JOIN mh a ON c.doc_a = a.doc_id JOIN mh b ON c.doc_b = b.doc_id
         |), d AS (
         |  SELECT least(CAST(floor(round(CAST(nm AS DOUBLE) / 8.0, 6) * 10) AS BIGINT), 9) AS decile
         |  FROM nm
         |), g AS (SELECT decile, count(*) AS n_pairs FROM d GROUP BY 1)
         |SELECT decile, n_pairs,
         |       CAST(sum(n_pairs) OVER (ORDER BY decile DESC
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_at_or_above
         |FROM g ORDER BY decile""".stripMargin,

    // Char chunking: same start sequence (1, 1+96, … ≤ max(len−32, 1)),
    // substr clamps the tail in both engines; chunk_id = (off−1)/96.
    "q97_doc_chunks" ->
      """WITH st AS (
        |  SELECT doc_id, text,
        |         unnest([i for i in range(1, greatest(length(text) - 32, 1) + 1, 96)]) AS off
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT doc_id,
        |       CAST((off - 1) // 96 AS BIGINT) AS chunk_id,
        |       CAST(off AS BIGINT) AS off,
        |       CAST(length(substr(text, off, 128)) AS BIGINT) AS chunk_len,
        |       md5(substr(text, off, 128)) AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    // Embedding covariance: identical 1e-6 quantization, HUGEINT-exact
    // sums, identical double closed form (q61 discipline).
    "q98_embed_covariance" ->
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
        |)
        |, nd AS (SELECT i, j, n_vecs,
        |              CAST(n_vecs AS HUGEINT) * sxy - sx * sy AS num,
        |              CAST(n_vecs AS HUGEINT) * n_vecs * 1000000 AS den
        |       FROM s)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(n_vecs AS BIGINT) AS n_vecs,
        |       CAST(CASE WHEN num >= 0 THEN (2 * num + den) // (2 * den)
        |                 ELSE -((2 * (-num) + den) // (2 * den)) END AS BIGINT) AS cov_e6
        |FROM nd ORDER BY i, j""".stripMargin,

    // Bloom decontamination: the oracle replays the EXACT semantics (the
    // bloom is a prefilter whose false positives the confirm join kills,
    // so it is invisible in the result); same shingle chain as q74.
    "q96_bloom_decontam" ->
      """WITH w AS (SELECT doc_id, text, source, string_split(text, ' ') AS ws FROM documents
        |           WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, source, unnest(
        |    CASE WHEN len(ws) >= 5
        |         THEN [concat_ws(' ', ws[i+1], ws[i+2], ws[i+3], ws[i+4], ws[i+5])
        |               for i in range(0, len(ws)-4)]
        |         ELSE [text] END) AS s
        |  FROM w
        |), hg AS (
        |  SELECT doc_id, source,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS sk
        |  FROM g
        |), eg AS (SELECT DISTINCT sk FROM hg WHERE source = 'src0'),
        |tg AS (SELECT DISTINCT doc_id, sk FROM hg WHERE source <> 'src0'),
        |hits AS (
        |  SELECT tg.doc_id, count(*) AS nsg
        |  FROM tg JOIN eg USING (sk) GROUP BY 1
        |)
        |SELECT d.source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN h.nsg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |       CAST(sum(coalesce(h.nsg, 0)) AS BIGINT) AS total_shared_grams,
        |       round(CAST(sum(CASE WHEN h.nsg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS contam_rate
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.source <> 'src0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Gopher-rule battery: every rule an integer cross-multiplied
    // comparison; list_filter/list_distinct mirror Spark's filter/
    // array_distinct on the empties-kept single-space split.
    "q95_gopher_rules" ->
      """WITH d AS (
        |  SELECT source, text, string_split(text, ' ') AS w,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS sum_chars,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |         CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
        |                x -> len(list_filter(string_split(text, ' '), y -> y = x)))) AS BIGINT) AS max_rep,
        |         CAST((length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' the ', ''))) // 5
        |            + (length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' a ', ''))) // 3
        |            + (length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' of ', ''))) // 4 AS BIGINT) AS n_stop
        |  FROM documents WHERE text IS NOT NULL
        |), f AS (
        |  SELECT source,
        |         (n_words BETWEEN 10 AND 100000) AS r_wordcount,
        |         (sum_chars >= n_words * 3 AND sum_chars <= n_words * 10) AS r_meanlen,
        |         (n_alpha * 5 >= n_words * 4) AS r_alpha,
        |         (n_stop >= 2) AS r_stopwords,
        |         (max_rep * 5 <= n_words) AS r_repetition,
        |         (n_distinct * 10 >= n_words * 3) AS r_distinct
        |  FROM d
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CAST(r_wordcount AS BIGINT)) AS BIGINT) AS n_wordcount,
        |       CAST(sum(CAST(r_meanlen AS BIGINT)) AS BIGINT) AS n_meanlen,
        |       CAST(sum(CAST(r_alpha AS BIGINT)) AS BIGINT) AS n_alpha,
        |       CAST(sum(CAST(r_stopwords AS BIGINT)) AS BIGINT) AS n_stopwords,
        |       CAST(sum(CAST(r_repetition AS BIGINT)) AS BIGINT) AS n_repetition,
        |       CAST(sum(CAST(r_distinct AS BIGINT)) AS BIGINT) AS n_distinct,
        |       CAST(sum(CAST(r_wordcount AND r_meanlen AND r_alpha AND r_stopwords
        |                AND r_repetition AND r_distinct AS BIGINT)) AS BIGINT) AS n_pass_all,
        |       round(CAST(sum(CAST(r_wordcount AND r_meanlen AND r_alpha AND r_stopwords
        |                      AND r_repetition AND r_distinct AS BIGINT)) AS DOUBLE) / count(*), 6) AS pass_rate
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q94_ivf_profile" ->
      s"""$ivfAssignCte,
         |c8 AS (SELECT bucket, count(*) AS n_vecs FROM asg GROUP BY 1)
         |SELECT bucket, n_vecs,
         |       round(CAST(n_vecs AS DOUBLE) / sum(n_vecs) OVER (), 6) AS frac
         |FROM c8 ORDER BY bucket""".stripMargin,

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
        |         CAST(sum(i * x) AS BIGINT) AS siw
        |  FROM r
        |)
        |SELECT n_users, total_events,
        |       CAST((2 * (2 * siw - (n_users + 1) * total_events) * 1000000
        |             + n_users * total_events) // (2 * n_users * total_events)
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
      """WITH p AS (SELECT p_brand, CAST(p_size AS BIGINT) x,
        |                  CAST(round(p_retailprice * 100) AS BIGINT) y FROM part),
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
        |       CAST(sum(d2) AS BIGINT) AS sum_sqerr_q,
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
        |         sum(CAST(((i - 1) * (i - 2)) // 2 - 2 * (i - 1) * (n - i)
        |                  + ((n - i) * (n - i - 1)) // 2 AS HUGEINT) * x) AS l3n
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
        |       CAST(CASE WHEN m > 0 THEN n1 * n2 // m ELSE NULL END AS BIGINT) AS est_lp,
        |       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS est_chapman,
        |       CAST(abs((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_true) * 1000000 // n_true
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
        |), c2 AS (SELECT q, cnt, fp, fp + cnt AS f FROM c),
        |a AS (
        |  SELECT CAST(max(f) AS BIGINT) AS nn,
        |         CAST(sum(q * cnt) AS BIGINT) AS e1n,
        |         sum(q * (CAST(f AS HUGEINT) * f - CAST(fp AS HUGEINT) * fp)) AS e2n,
        |         sum(q * (CAST(f AS HUGEINT) * f * f * f
        |                  - CAST(fp AS HUGEINT) * fp * fp * fp)) AS e4n,
        |         sum(q * (CAST(f AS HUGEINT) * f * f * f * f * f * f * f
        |                  - CAST(fp AS HUGEINT) * fp * fp * fp * fp * fp * fp * fp))
        |           AS e8n
        |  FROM c2
        |)
        |SELECT CAST(1 AS BIGINT) AS n_draws,
        |       CAST(1000 * CAST(e1n AS HUGEINT) // nn AS BIGINT) AS e_max_milli
        |FROM a
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |       CAST(1000 * e2n // (CAST(nn AS HUGEINT) * nn) AS BIGINT) FROM a
        |UNION ALL
        |SELECT CAST(4 AS BIGINT),
        |       CAST(1000 * e4n // (CAST(nn AS HUGEINT) * nn * nn * nn) AS BIGINT)
        |FROM a
        |UNION ALL
        |SELECT CAST(8 AS BIGINT),
        |       CAST(1000 * e8n // (CAST(nn AS HUGEINT) * nn * nn * nn * nn * nn
        |                           * nn * nn) AS BIGINT)
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
         |p AS (SELECT CAST(sum(nij * (nij - 1)) AS BIGINT) AS pp,
         |             CAST(sum(nij) AS BIGINT) AS n FROM cont),
         |pa AS (SELECT CAST(sum(ai * (ai - 1)) AS BIGINT) AS aa,
         |             CAST(count(*) AS BIGINT) AS n_labels
         |      FROM (SELECT label, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY 1)),
         |pb AS (SELECT CAST(sum(bj * (bj - 1)) AS BIGINT) AS bb,
         |             CAST(count(*) AS BIGINT) AS k_buckets
         |      FROM (SELECT bucket, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY 1))
         |SELECT n AS n_vectors, n_labels, k_buckets,
         |       CAST(CAST(1000000 AS HUGEINT)
         |              * (2 * CAST(n * (n - 1) AS HUGEINT) * pp - 2 * CAST(aa AS HUGEINT) * bb)
         |            // (CAST(n * (n - 1) AS HUGEINT) * (aa + bb) - 2 * CAST(aa AS HUGEINT) * bb)
         |            AS BIGINT) AS ari_ppm
         |FROM p CROSS JOIN pa CROSS JOIN pb""".stripMargin,

    "q552_fowlkes_mallows" ->
      s"""$ivfAssignCte,
         |cont AS (SELECT e2.label, asg.bucket, CAST(count(*) AS BIGINT) AS nij
         |         FROM asg JOIN embeddings e2 ON asg.vec_id = e2.vec_id
         |         GROUP BY 1, 2),
         |p AS (SELECT CAST(sum(nij * (nij - 1)) AS BIGINT) AS pp FROM cont),
         |pa AS (SELECT CAST(sum(ai * (ai - 1)) AS BIGINT) AS aa
         |      FROM (SELECT label, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY 1)),
         |pb AS (SELECT CAST(sum(bj * (bj - 1)) AS BIGINT) AS bb
         |      FROM (SELECT bucket, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY 1)),
         |f AS (SELECT pp, aa, bb,
         |             CAST(1000000 AS HUGEINT) * pp * (1000000 * pp)
         |               // (CAST(aa AS HUGEINT) * bb) AS fmsq
         |      FROM p CROSS JOIN pa CROSS JOIN pb),
         |r0 AS (SELECT *, CAST(floor(sqrt(CAST(fmsq AS DOUBLE))) AS HUGEINT) AS t0 FROM f),
         |r1 AS (SELECT *, CASE WHEN t0 > 0 THEN (t0 + fmsq // t0) // 2 ELSE 0 END AS t1 FROM r0),
         |r2 AS (SELECT *, CASE WHEN (t1 + 1) * (t1 + 1) <= fmsq THEN t1 + 1
         |                      WHEN t1 * t1 > fmsq THEN t1 - 1 ELSE t1 END AS rt FROM r1)
         |SELECT pp AS pair_tp2,
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
        |              CAST(sum(CASE WHEN ga = 1 THEN st ELSE 0 END) AS BIGINT) AS w_a
        |       FROM st)
        |SELECT n_a, n_b, w_a,
        |       CAST(3000 * CAST(2 * w_a - n_a * (n_a + n_b + 1) AS HUGEINT)
        |            * (2 * w_a - n_a * (n_a + n_b + 1))
        |            // (CAST(n_a AS HUGEINT) * n_b * (n_a + n_b + 1)) AS BIGINT) AS zsq_milli
        |FROM ag""".stripMargin),

    "q575_ansari_bradley" ->
      (twoSegRankCte + """,
        |ab AS (SELECT ga, least(i, nn - i + 1) AS ab FROM rk),
        |ag AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a, CAST(sum(1 - ga) AS BIGINT) AS n_b,
        |              CAST(sum(CASE WHEN ga = 1 THEN ab ELSE 0 END) AS BIGINT) AS a_sum
        |       FROM ab),
        |g AS (SELECT n_a, n_b, a_sum, n_a + n_b AS nn FROM ag)
        |SELECT n_a, n_b, a_sum,
        |       CASE WHEN nn % 2 = 0 THEN CAST(
        |         3000 * CAST(nn - 1 AS HUGEINT)
        |         * (4 * a_sum - n_a * (nn + 2)) * (4 * a_sum - n_a * (nn + 2))
        |         // (CAST(n_a AS HUGEINT) * n_b * (nn + 2) * (nn - 2)) AS BIGINT)
        |       ELSE CAST(3000
        |         * CAST(4 * nn * a_sum - n_a * (nn + 1) * (nn + 1) AS HUGEINT)
        |         * (4 * nn * a_sum - n_a * (nn + 1) * (nn + 1))
        |         // (CAST(n_a AS HUGEINT) * n_b * (nn + 1) * (nn * nn + 3)) AS BIGINT) END AS zsq_milli
        |FROM g""".stripMargin),

    "q576_lepage" ->
      (twoSegRankCte + """,
        |ag AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a, CAST(sum(1 - ga) AS BIGINT) AS n_b,
        |              CAST(sum(CASE WHEN ga = 1 THEN i ELSE 0 END) AS BIGINT) AS w_a,
        |              CAST(sum(CASE WHEN ga = 1 THEN least(i, nn - i + 1) ELSE 0 END) AS BIGINT) AS a_sum
        |       FROM rk),
        |g AS (SELECT n_a, n_b, w_a, a_sum, n_a + n_b AS nn FROM ag),
        |z AS (SELECT n_a, n_b,
        |             CAST(3000 * CAST(2 * w_a - n_a * (nn + 1) AS HUGEINT)
        |                  * (2 * w_a - n_a * (nn + 1))
        |                  // (CAST(n_a AS HUGEINT) * n_b * (nn + 1)) AS BIGINT) AS zw2,
        |             CASE WHEN nn % 2 = 0 THEN CAST(
        |               3000 * CAST(nn - 1 AS HUGEINT)
        |               * (4 * a_sum - n_a * (nn + 2)) * (4 * a_sum - n_a * (nn + 2))
        |               // (CAST(n_a AS HUGEINT) * n_b * (nn + 2) * (nn - 2)) AS BIGINT)
        |             ELSE CAST(3000
        |               * CAST(4 * nn * a_sum - n_a * (nn + 1) * (nn + 1) AS HUGEINT)
        |               * (4 * nn * a_sum - n_a * (nn + 1) * (nn + 1))
        |               // (CAST(n_a AS HUGEINT) * n_b * (nn + 1) * (nn * nn + 3)) AS BIGINT) END AS zab2
        |      FROM g)
        |SELECT n_a, n_b, zw2 AS wilcoxon_zsq_milli, zab2 AS ab_zsq_milli,
        |       zw2 + zab2 AS lepage_milli
        |FROM z""".stripMargin),

    "q577_cucconi" ->
      (twoSegRankCte + """,
        |ag AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a, CAST(sum(1 - ga) AS BIGINT) AS n_b,
        |              CAST(sum(CASE WHEN ga = 1 THEN i * i ELSE 0 END) AS BIGINT) AS sr2,
        |              CAST(sum(CASE WHEN ga = 1 THEN (nn - i + 1) * (nn - i + 1) ELSE 0 END) AS BIGINT) AS sc2
        |       FROM rk),
        |g AS (SELECT n_a, n_b, sr2, sc2, n_a + n_b AS nn FROM ag),
        |m AS (SELECT n_a, n_b, nn,
        |             6 * sr2 - n_a * (nn + 1) * (2 * nn + 1) AS nu,
        |             6 * sc2 - n_a * (nn + 1) * (2 * nn + 1) AS nv,
        |             (2 * nn + 1) * (8 * nn + 11) AS bb,
        |             CAST(n_a AS DOUBLE) * n_b * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0 AS dd
        |      FROM g),
        |d AS (SELECT n_a, n_b, nu, nv,
        |             CAST(nu AS DOUBLE) * nu / dd AS u2,
        |             CAST(nv AS DOUBLE) * nv / dd AS v2,
        |             CAST(nu AS DOUBLE) * nv / dd AS uv,
        |             CAST(2 * (nn * nn - 4) - bb AS DOUBLE) / bb AS rho
        |      FROM m)
        |SELECT n_a, n_b, nu, nv,
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
        |term AS (SELECT source,
        |                CAST(1000000 * CAST(c1 * ng - c2 * n1 AS HUGEINT)
        |                     * (c1 * ng - c2 * n1)
        |                     // (CAST(n1 AS HUGEINT) * n1 * ng * c2) AS BIGINT) AS term
        |         FROM grid)
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
        |p AS (SELECT 1000000 * (b.rev - a.rev) // (b.mo - a.mo) AS sl,
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
        |             CAST(max(1000000 * abs(c1 * n2 - c2 * n1) // (n1 * n2)) AS BIGINT) AS d_ppm
        |      FROM cw),
        |x0 AS (SELECT *, 1000000 * n1 * n2 // (n1 + n2) AS x FROM a),
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
        |             CAST(round(ln(CAST(n - slow AS DOUBLE) / n) * 1000000) AS BIGINT) AS l,
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
        |FROM p ORDER BY tbl, mem""".stripMargin
  )

  /** Two-sample per-customer spend with global deterministic ranks — the
    * shared prefix of the q574–q577 rank-test oracles (SparkEntry
    * `twoSegSpend` mirror, MACHINERY vs FURNITURE).
    */
  private def twoSegRankCte: String =
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
  private def nationTradeCte: String =
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
  private def nationEdgesCte: String =
    nationTradeCte + """,
      |tot AS (SELECT sum(CAST(w AS HUGEINT)) AS tw, CAST(count(*) AS BIGINT) AS np FROM rev),
      |e0 AS (SELECT a, b FROM rev CROSS JOIN tot WHERE CAST(w AS HUGEINT) * np > tw),
      |ed AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0)""".stripMargin

  /** Daily mean order value (x = days since 1995-01-01, y = integer-mean
    * cents) — the SparkEntry `dailyMeanSpend` mirror under q585/q586.
    */
  private def dailySsrPrefix: String =
    """WITH days AS (SELECT CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
      |                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // count(*) AS BIGINT) AS y
      |              FROM orders GROUP BY o_orderdate)""".stripMargin

  /** Per-group OLS SSR (whole cents²) over (g, x, y) rows — the `olsSsrMilli`
    * closed-form mirror (A·C − B²)/(C·n), HUGEINT-exact.
    */
  private def ssrSelect(src: String, gExpr: String): String =
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
  private def sourceLangGridCte: String =
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
  private def postingsCte: String =
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
  private def decontamSweepSql: String = {
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
  private def weightedPagerankSql: String = {
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
  private def removalEffectSql: String = {
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
  private def mmrSql(k: Int): String = {
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
