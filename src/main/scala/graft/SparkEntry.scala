package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{EsmTokenizer, TextFunctions}
import graft.operators.{AsOfJoin, Cooccurrence, CorpusStats, Curation, Dedup, EventWindows, GraphMetrics, Indexing, Multimodal, NaiveBayes, RangeJoin, Similarity, SnapshotDiff}
import graft.plans.JaroWinkler
import graft.ops.{ClassWeights, LabelEncode, Stats, StratifiedSplit}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One entry per operator row in SURVEY.md §2 (parity) and §2.9
  * (north-star). Every query is a pure function of the sf directory, built
  * from the graft library, ending in a total-order `orderBy`; `OracleSql`
  * holds the matching DuckDB SQL for every query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_stats_summary")(spark, "/root/testdata/sf0.001")

  // ---- shared fragments -------------------------------------------------

  /** Stratified split over orders: class = o_custkey (sizes 1..25 at sf0.01
    * — exercises all four SP1 branches), file order = o_orderkey (unique;
    * lineitem lacks a unique natural key in this synthetic data, which would
    * make row_number tie-breaks engine-dependent).
    */
  private def splitDf(s: SparkSession, dir: String): DataFrame =
    StratifiedSplit.withSplit(Tables.orders(s, dir), "o_custkey", "o_orderkey")

  /** ESM-2 tokenization of part names (FIXTURES.md §A), max_length=32. */
  private def tokensDf(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      EsmTokenizer.tokenizeCol(upper(col("p_name")), 32).as("tokens"))

  private def centsOf(x: Column): Column = EventWindows.cents(x)

  /** Per-customer total spend (cents) restricted to two market segments,
    * `ga` = 1 for segment `a` — the shared two-sample relation under the
    * q574–q577 rank dispersion/location tests. One hash aggregation,
    * bounded by |customer|; the tests' global rank windows run over THIS
    * relation, never over raw orders (RankStats discipline).
    */
  private def twoSegSpend(s: SparkSession, dir: String, a: String, b: String): DataFrame = {
    val seg = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin(a, b))
      .select(col("c_custkey"), (col("c_mktsegment") === a).cast("long").as("ga"))
    Tables.orders(s, dir)
      .join(seg, col("o_custkey") === col("c_custkey"))
      .groupBy("o_custkey", "ga")
      .agg(sum(centsOf(col("o_totalprice"))).as("v"))
  }

  /** Complete (source × global-lang) count grid: `c1` = docs of lang in
    * source (0-filled where absent — divergences need the union support),
    * `n1` = source total, `c2` = global lang count, `ng` = corpus total.
    * Shared by the q579–q581 divergence panel; langs and sources are both
    * bounded dictionaries, so the grid is tiny and broadcast-built.
    */
  private def sourceLangGrid(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.documents(s, dir)
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .groupBy("source", "lang").agg(count(lit(1)).as("c1raw"))
      .localCheckpoint(false)
    val ns = c.groupBy("source").agg(sum(col("c1raw")).as("n1"))
    val g = c.groupBy("lang").agg(sum(col("c1raw")).as("c2"))
    val ngv = c.agg(sum(col("c1raw")).as("ng"))
    ns.crossJoin(broadcast(g)).crossJoin(broadcast(ngv))
      .join(c, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"),
        coalesce(col("c1raw"), lit(0L)).as("c1"),
        col("n1"), col("c2"), col("ng"))
  }

  /** Daily mean order value: one row per order day with x = days since
    * 1992-01-01 and y = integer-mean cents (sum div count — the MEAN, not
    * the total, so magnitudes stay SF-invariant and the q585/q586 SSR
    * decimals never overflow). Shared regression base for the
    * structural-break tests.
    */
  private def dailyMeanSpend(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderdate"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))" +
        " div count(1)").as("y"))
      .select(datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
        .cast("long").as("x"), col("y"))

  /** Per-group OLS sum-of-squared-residuals (whole cents², keeping the
    * SF-grown magnitudes inside BIGINT) from (g, x, y) rows:
    * SSR = (A·C − B²̃)/(C·n) with A = nΣy²−(Σy)², C = nΣx²−(Σx)²,
    * B = (nΣxy−ΣxΣy)² — the closed form that never materializes per-row
    * residuals; every sum decimal(38,0), numerator ≥ 0 by Cauchy–Schwarz
    * so div == //. Shared by q585 (Chow) and q586 (Goldfeld–Quandt).
    */
  private def olsSsrMilli(rows: DataFrame, g: Column): DataFrame =
    rows.groupBy(g.as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec38)).as("sx"),
        sum(col("y").cast(dec38)).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(col("g"), col("n"),
        expr("CAST(((n * syy - sy * sy) * (n * sxx - sx * sx)" +
          " - (n * sxy - sx * sy) * (n * sxy - sx * sy))" +
          " div ((n * sxx - sx * sx) * n) AS BIGINT)").as("ssr"))

  /** Undirected nation-pair trade revenue (a < b, cents): ONE
    * lineitem⋈orders pass with broadcast supplier/customer dims — the
    * shared graph base under q590/q601/q603. Output bounded by |nation|².
    */
  private def nationTradeRev(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .select(least(col("s_nationkey"), col("c_nationkey")).as("a"),
        greatest(col("s_nationkey"), col("c_nationkey")).as("b"),
        centsOf(col("l_extendedprice")).as("w"))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))

  /** Above-mean edge set of [[nationTradeRev]], doubled to both
    * directions — the thinned undirected adjacency q590/q601 walk.
    */
  private def nationTradeEdges(s: SparkSession, dir: String): DataFrame = {
    val rev = nationTradeRev(s, dir).localCheckpoint(false)
    val tot = rev.agg(sum(col("w").cast(dec38)).as("tw"),
      count(lit(1)).as("np"))
    val e0 = rev.crossJoin(broadcast(tot))
      .filter(expr("CAST(w AS DECIMAL(38,0)) * np > tw"))
      .select("a", "b").localCheckpoint(false)
    e0.union(e0.select(col("b").as("a"), col("a").as("b")))
  }

  /** Wilcoxon rank-sum z² in milli from (n_a, n_b, nn, w_a) — the exact
    * rational 3000·(2W − n_a(N+1))² / (n_a·n_b·(N+1)); numerator is a
    * square so Spark `div` and DuckDB `//` agree. Shared by q574/q576.
    */
  private val wilcoxonZsqMilli: String =
    "CAST(3000 * CAST(2 * w_a - n_a * (nn + 1) AS DECIMAL(38,0))" +
      " * (2 * w_a - n_a * (nn + 1))" +
      " div (CAST(n_a AS DECIMAL(38,0)) * n_b * (nn + 1)) AS BIGINT)"

  /** Ansari–Bradley z² in milli from (n_a, n_b, nn, a_sum) — exact
    * even/odd moment branches (scipy's closed forms made integral by the
    * doubled-numerator trick). Shared by q575/q576.
    */
  private val abZsqMilli: String =
    "CASE WHEN nn % 2 = 0 THEN CAST(" +
      "3000 * CAST(nn - 1 AS DECIMAL(38,0))" +
      " * (4 * a_sum - n_a * (nn + 2)) * (4 * a_sum - n_a * (nn + 2))" +
      " div (CAST(n_a AS DECIMAL(38,0)) * n_b * (nn + 2) * (nn - 2)) AS BIGINT)" +
      " ELSE CAST(3000" +
      " * CAST(4 * nn * a_sum - n_a * (nn + 1) * (nn + 1) AS DECIMAL(38,0))" +
      " * (4 * nn * a_sum - n_a * (nn + 1) * (nn + 1))" +
      " div (CAST(n_a AS DECIMAL(38,0)) * n_b * (nn + 1) * (nn * nn + 3)) AS BIGINT) END"

  private def hllAlphaM2Scaled: Double = OracleSql.hllAlphaM2Scaled

  /** Exact-integer accumulator type (≡ DuckDB HUGEINT) for the
    * order-independent stddev/corr/norm algebra.
    */
  private val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  // ---- the inventory ----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // A1/A2/A5/A6 — munge_data summary (notebook cell-10/11)
    "q01_stats_summary" -> ((s, dir) => Stats.summary(Tables.documents(s, dir), "lang", "text")),

    // A3/A7 — value_counts desc with tie-break
    "q02_value_counts" -> ((s, dir) => Stats.valueCounts(Tables.documents(s, dir), "lang")),

    // A4 — agg-of-agg group-size stats
    "q03_group_size_stats" -> ((s, dir) => Stats.groupSizeStats(Tables.lineitem(s, dir), "l_partkey")),

    // A8 — histogram of group sizes
    "q04_size_histogram" -> ((s, dir) => Stats.groupSizeHistogram(Tables.lineitem(s, dir), "l_orderkey")),

    // A9/F1 — length-frequency distribution
    "q05_len_freq" -> ((s, dir) => Stats.lengthFrequencies(Tables.documents(s, dir), "text")),

    // E1/E2 — lexicographic dense label codes (sklearn LabelEncoder semantics)
    "q06_label_encode" -> ((s, dir) =>
      LabelEncode.mapping(Tables.part(s, dir), "p_type").orderBy("p_type")),

    // E1/E3 + implied broadcast join — codes applied to the fact table
    "q07_encode_apply" -> ((s, dir) =>
      LabelEncode.encode(Tables.part(s, dir), "p_type")
        .select(col("p_partkey"), col("class_encoded"))
        .orderBy("p_partkey")),

    // SP1-SP3/P6 — per-row stratified split assignment
    "q08_split_assign" -> ((s, dir) =>
      splitDf(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("split"))
        .orderBy("o_orderkey")),

    // SP2 — split cardinalities via the closed form over class sizes (no
    // permutation materialized; the row-level oracle proves equivalence)
    "q09_split_counts" -> ((s, dir) => {
      val totals = StratifiedSplit.splitSizes(Tables.orders(s, dir), "o_custkey")
        .agg(sum("n_train").as("tr"), sum("n_dev").as("de"), sum("n_test").as("te"))
      totals.select(explode(array(
          struct(lit("dev").as("split"), col("de").as("n")),
          struct(lit("test").as("split"), col("te").as("n")),
          struct(lit("train").as("split"), col("tr").as("n")))).as("r"))
        .select(col("r.split").as("split"), col("r.n").as("n"))
        .orderBy("split")
    }),

    // A10 — class weights from the closed-form per-class train counts
    "q10_class_weights" -> ((s, dir) =>
      ClassWeights.weightsFromCounts(
        StratifiedSplit.splitSizes(Tables.orders(s, dir), "o_custkey")
          .filter(col("n_train") > 0)
          .select(col("o_custkey"), col("n_train")),
        "o_custkey", "n_train")),

    // implied join 1 — fact ⋈ small dim, broadcast hash join
    "q11_join_brand_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy("p_brand")),

    // implied join 2 — multi-way star join (dims broadcast)
    "q12_join_nation_revenue" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"), sum(centsOf(col("o_totalprice"))).as("total_cents"))
        .orderBy("r_name", "n_name")),

    // sort + limit (deterministic top-k)
    "q13_topk_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // S2 — UNION ALL via unionByName
    "q14_union_accounts" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(lit("c").as("side"), col("c_custkey").as("acct_key"), col("c_acctbal").as("bal"))
        .unionByName(Tables.supplier(s, dir)
          .select(lit("s").as("side"), col("s_suppkey").as("acct_key"), col("s_acctbal").as("bal")))
        .orderBy("side", "acct_key")),

    // P1 + value predicates
    "q15_filter_events" -> ((s, dir) => EventWindows.filteredTypeStats(Tables.events(s, dir), 10.0)),

    // batch time-windowing (tumbling 1h)
    "q16_event_hourly" -> ((s, dir) => EventWindows.hourly(Tables.events(s, dir))),

    // analytic windows — running totals per user
    "q17_user_running" -> ((s, dir) => EventWindows.userRunningTotals(Tables.events(s, dir))),

    // F2/F3 — ESM-2 tokens, emitted as the canonical comma-joined string so
    // the driver can hash-compare (raw array columns crash its pandas sort)
    // and DuckDB can reconstruct the exact value per row
    "q18_tokenize" -> ((s, dir) =>
      tokensDf(s, dir)
        .select(
          col("p_partkey"),
          concat_ws(",", col("tokens").cast("array<string>")).as("token_str"))
        .orderBy("p_partkey")),

    // F2 derived facts, oracle-checkable (length/sum invariants of the UDF output)
    "q19_tokenize_stats" -> ((s, dir) =>
      tokensDf(s, dir)
        .select(
          col("p_partkey"),
          size(filter(col("tokens"), t => t =!= EsmTokenizer.PadId)).cast("long").as("n_tok"),
          aggregate(col("tokens"), lit(0L), (a, t) => a + t.cast("long")).as("token_sum"))
        .orderBy("p_partkey")),

    // dedup: exact content-hash
    "q20_dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir), "doc_id", "text")),

    // dedup: MinHash + LSH banding
    "q21_dedup_minhash" -> ((s, dir) => Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")),

    // dedup: SimHash + banded Hamming search
    "q22_dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text")),

    // dedup: n-gram Jaccard via inverted shingle index
    "q23_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text")),

    // similarity: exact cosine top-k (baseline)
    "q24_embed_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), "vec_id", "embedding", nQueries = 5, k = 10)),

    // similarity: IVF-bucketed ANN (scale path)
    "q25_embed_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCentroids = 8, nQueries = 5, k = 5)),

    // similarity: multi-probe IVF (each query probes its 2 nearest
    // centroids' buckets — the recall/skew lever over plain IVF)
    "q50_embed_multiprobe" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCentroids = 8, nQueries = 5, k = 5, multiProbe = 2)),

    // dedup: embedding-cosine near-dup via IVF buckets
    "q39_embed_neardup" -> ((s, dir) =>
      Similarity.embedNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCentroids = 8, threshold = 0.4)),

    // text analysis: per-language profile
    // random-hyperplane cosine LSH — centroid-free embedding near-dup
    // (complements IVF-bucketed q39; signature is a pure codegen'd map)
    "q67_embed_lsh" -> ((s, dir) =>
      Similarity.cosineLshPairs(Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64)),

    "q26_lang_profile" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).as("total_chars"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"),
          round(sum(TextFunctions.wordCount(col("text"))).cast("double") / count(lit(1)), 6).as("avg_words"))
        .orderBy("lang")),

    // text analysis: quality scoring
    "q27_quality_score" -> ((s, dir) =>
      TextFunctions.withQualityColumns(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("n_stop"), col("n_punct"), col("quality"))
        .orderBy("doc_id")),

    // text analysis: TF-IDF top-3 terms per document. df derives from the
    // tf relation (rows of tf ARE the distinct (doc, term) pairs), so the
    // corpus is exploded once and the (doc_id, term) exchange is reused —
    // a separate distinct-then-count pipeline would scan the corpus twice.
    "q43_tfidf_terms" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val terms = docs
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("term"))
        .filter(length(col("term")) > 0)
      val tf  = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tf.join(dft, "term")
        .crossJoin(broadcast(n))
        .withColumn("score", round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rk"))
        .orderBy("doc_id", "rk")
    }),

    // per-group top-k: 3 priciest orders per priority class
    "q47_topk_per_group" -> ((s, dir) => {
      val w = Window
        .partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderpriority", "rk")
    }),

    // semi join: customers with at least one high-value order
    "q48_semi_join" -> ((s, dir) => {
      val highValue = Tables.orders(s, dir).filter(col("o_totalprice") >= 400000.0)
      Tables.customer(s, dir)
        .join(highValue, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // reproducible sampling: md5-uniform keep-30% (never rand() — the same
    // rows are selected on any cluster, any partitioning, any engine)
    "q46_deterministic_sample" -> ((s, dir) => {
      val u = Dedup.md5Long(col("doc_id").cast("string"), 12)
      Tables.documents(s, dir)
        .withColumn("_u", u)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(col("_u") * 10 < lit(3L * Dedup.MinhashMod), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("lang")
    }),

    // text analysis: PMI word co-occurrence (top pairs above scale-invariant support)
    "q45_pmi_cooccurrence" -> ((s, dir) =>
      Cooccurrence.pmiPairs(Tables.documents(s, dir), "doc_id", "text")),

    // data profiling: describe-style numeric summary per group. stddev is
    // computed from EXACT integer sums (decimal38 ≡ DuckDB HUGEINT) so even
    // the variance hash-matches — float stddev aggregates are
    // aggregation-order-dependent and could never oracle.
    "q44_table_profile" -> ((s, dir) => {
      val cents = centsOf(col("o_totalprice"))
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_customers"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          round(sum(cents).cast("double") / count(lit(1)) / 100.0, 6).as("avg_price"),
          round(expr("percentile(o_totalprice, 0.5D)"), 6).as("median_price"),
          sum(cents.cast(dec38)).as("_sx"),
          sum((cents * cents).cast(dec38)).as("_sxx"))
        .withColumn("_num",
          col("n").cast(dec38) * col("_sxx") - col("_sx") * col("_sx"))
        .withColumn("_den", (col("n") * (col("n") - 1)).cast(dec38))
        // n=1 guard: 0/0 would be NaN in Spark but NULL in DuckDB — make
        // the single-row-group result explicitly NULL in both engines
        .withColumn("stddev_price",
          when(col("n") > 1,
            round(sqrt(col("_num").cast("double") / col("_den").cast("double")) / 100.0, 6)))
        .drop("_sx", "_sxx", "_num", "_den")
        .orderBy("o_orderstatus")
    }),

    // composition: quality filter → near-dup removal → per-lang funnel counts
    "q40_curation_funnel" -> ((s, dir) =>
      Curation.funnel(Tables.documents(s, dir), "doc_id", "text", "lang", qualityThreshold = 0.45)),

    // range join: error events located in their containing session interval
    "q42_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      val sess = EventWindows.sessionize(ev, 30)
        .select(col("user_id"), col("sess_idx"), col("start_us"), col("end_us"))
      RangeJoin.pointInInterval(errors, sess, "user_id", "us", "start_us", "end_us",
          bucketWidth = 3600000000L) // 1h buckets
        .select(col("user_id"), col("event_id"), col("sess_idx"))
        .orderBy("user_id", "event_id")
    }),

    // as-of join: each error event matched to the user's most recent prior purchase
    "q41_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("err_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"), col("value").as("p_value"))
      AsOfJoin.asOf(errors, purchases, "user_id", "ts", "p_id", Seq("p_value"))
        .select(
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("err_id"),
          col("asof_p_id"),
          col("asof_p_value"))
        .orderBy("user_id", "ts_us", "err_id")
    }),

    // text analysis: heuristic language ID
    "q28_langid" -> ((s, dir) => {
      val scores = TextFunctions.langScores(col("text"))
      val named  = scores.map { case (l, c) => c.as(s"s_$l") }
      Tables.documents(s, dir)
        .select(col("doc_id") +: named: _*)
        .withColumn("pred_lang",
          TextFunctions.predictedLang(col("s_en"), col("s_fr"), col("s_de"), col("s_es")))
        .orderBy("doc_id")
    }),

    // text analysis: token counting (whitespace, BPE-ish estimate, regex pieces)
    "q29_token_count" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          TextFunctions.wordCount(col("text")).as("ws_tokens"),
          TextFunctions.bpeEstimate(col("text")).as("bpe_est"),
          TextFunctions.regexPieces(col("text")).as("n_pieces"))
        .orderBy("doc_id")),

    // text analysis: document fingerprinting (md5-normalized + rolling hash)
    "q30_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          TextFunctions.md5Fingerprint(col("text")).as("fp_md5"),
          TextFunctions.polyFingerprint(col("text")).as("fp_poly"))
        .orderBy("doc_id")),

    // gap-based sessionization (30-min gap) via window functions
    "q36_sessionize" -> ((s, dir) => EventWindows.sessionize(Tables.events(s, dir), 30)),

    // dedup applied — CLUSTER-based: connected components over the LSH
    // candidate pairs, keep one doc (min id) per component, anti-join the
    // rest (pair-wise doc_b dropping gets transitive chains wrong — see
    // Dedup.clusterLosers). Oracle: recursive-CTE reachability + NOT EXISTS.
    "q32_dedup_apply" -> ((s, dir) =>
      Dedup.survivorsByCluster(Tables.documents(s, dir), "doc_id", "text", "lang")),

    // grouped exact quantiles (interpolating percentile per language)
    "q33_len_quantiles" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          round(expr("percentile(n_chars, 0.25D)"), 6).as("p25"),
          round(expr("percentile(n_chars, 0.5D)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.75D)"), 6).as("p75"))
        .orderBy("lang")),

    // pivot (wide conditional aggregation over the fixed language set)
    "q34_pivot_lang_counts" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val piv = Tables.documents(s, dir)
        .groupBy("source")
        .pivot("lang", langs)
        .count()
      piv.select(
        col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
        .orderBy("source")
    }),

    // rollup (grouping sets: per-type totals + grand total)
    "q35_event_rollup" -> ((s, dir) =>
      Tables.events(s, dir)
        .rollup("event_type")
        .agg(count(lit(1)).as("n"), sum(centsOf(col("value"))).as("value_cents"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"), col("n"), col("value_cents"))
        .orderBy("event_type")),

    // sliding 2h windows with 1h slide (each event lands in two buckets)
    "q37_sliding_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"), sum(centsOf(col("value"))).as("value_cents"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("win_start"),
          col("n"),
          col("value_cents"))
        .orderBy("win_start")),

    // HLL sketch distinct (the scale option for A2). Oracled: the exact
    // column hash-matches DuckDB, and the sketch is verified *against the
    // oracle's exact count* via the `approx_ok` bound (|approx−exact| ≤ 5%
    // of exact, integer arithmetic) — the oracle asserts TRUE, so a drifted
    // sketch breaks the hash. The raw estimate itself is engine-specific
    // and deliberately not emitted.
    "q38_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("_approx"))
        .select(
          col("event_type"),
          col("n_users_exact"),
          (abs(col("_approx") - col("n_users_exact")) * 20 <= col("n_users_exact")).as("approx_ok"))
        .orderBy("event_type")),

    // salted skew join: lineitem (big, salted on a per-row column) ⋈
    // supplier replicated saltFactor×. The oracle runs the UNSALTED SQL —
    // proving salting is result-invariant, which is its entire contract.
    "q49_skew_join" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
      val small = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.operators.SkewJoin.saltedJoin(big, small, "l_suppkey", saltFactor = 8, bigDistinctCol = "l_orderkey")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"), sum(centsOf(col("l_extendedprice"))).as("revenue_cents"))
        .orderBy("s_nationkey")
    }),

    // set ops: INTERSECT / EXCEPT (distinct semantics in both engines)
    "q51_set_ops" -> ((s, dir) => {
      val c  = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.intersect(su).select(lit("both").as("side"), col("nk"))
        .unionByName(c.except(su).select(lit("cust_only").as("side"), col("nk")))
        .unionByName(su.except(c).select(lit("supp_only").as("side"), col("nk")))
        .orderBy("side", "nk")
    }),

    // grouping sets: full CUBE over (status, priority) — q35 covers ROLLUP
    "q52_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(centsOf(col("o_totalprice"))).as("total_cents"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"),
          col("total_cents"))
        .orderBy("status", "priority")),

    // analytic windows beyond running totals: lag gaps, ntile quartiles,
    // percent_rank — all over the same deterministic (ts, event_id) order
    "q53_window_analytics" -> ((s, dir) => {
      val w  = Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      Tables.events(s, dir)
        .select(
          col("user_id"),
          col("event_id"),
          (us - lag(us, 1).over(w)).as("gap_us"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy("user_id", "event_id")
    }),

    // exact Pearson correlation from integer-cents sums (decimal38 ≡ DuckDB
    // HUGEINT): float `corr` aggregates are aggregation-order-dependent and
    // could never hash-match; this closed form is partition-count-invariant
    "q54_corr_exact" -> ((s, dir) => {
      val x   = centsOf(col("l_quantity"))
      val y   = centsOf(col("l_extendedprice"))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast(dec38).as("n"),
          sum(x.cast(dec38)).as("sx"),
          sum(y.cast(dec38)).as("sy"),
          sum((x * y).cast(dec38)).as("sxy"),
          sum((x * x).cast(dec38)).as("sxx"),
          sum((y * y).cast(dec38)).as("syy"))
        .select(
          col("l_returnflag"),
          col("n").cast("long").as("n_rows"),
          round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
            6).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // text quality: repetition ratio (duplicate word-3-gram fraction — the
    // Gopher-style repetition signal used to drop boilerplate/spam docs)
    "q55_repetition" -> ((s, dir) =>
      Dedup.shingleRows(Tables.documents(s, dir), "doc_id", "text", 3)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), countDistinct(col("s")).as("n_uniq"))
        .select(
          col("doc_id"),
          col("n_grams"),
          col("n_uniq"),
          round(lit(1.0) - col("n_uniq").cast("double") / col("n_grams"), 6).as("dup_ratio"))
        .orderBy("doc_id")),

    // text quality: per-doc word statistics (unique-word ratio + mean word
    // length — the lexical-diversity signals of an LLM-data quality filter)
    "q56_word_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_words"),
          countDistinct(col("w")).as("n_uniq_words"),
          sum(length(col("w"))).cast("long").as("n_letters"))
        .select(
          col("doc_id"),
          col("n_words"),
          col("n_uniq_words"),
          round(col("n_uniq_words").cast("double") / col("n_words"), 6).as("uniq_ratio"),
          round(col("n_letters").cast("double") / col("n_words"), 6).as("mean_word_len"))
        .orderBy("doc_id")),

    // S1/S3 oracle exercise: round-trip documents through the CSV zone
    // sink/scan, then aggregate the read-back frame. The oracle computes
    // the same aggregate from the parquet original — any lossy CSV
    // round-trip (quoting, escaping, type parse) breaks the hash.
    "q57_csv_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // unique per invocation + deleted at JVM exit — see Zones.tempDir
      val tmp = graft.io.Zones.tempDir(s"graft_csv_zone_${new java.io.File(dir).getName}")
      graft.io.Zones.writeCsv(docs, tmp)
      graft.io.Zones.readCsv(s, docs.schema, header = true, Seq(tmp))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(length(col("text"))).cast("long").as("sum_text_len"),
          countDistinct(col("doc_id")).as("n_ids"))
        .orderBy("lang")
    }),

    // approx quantile sketch (the scale option for q33's exact grouped
    // percentiles), verified against the oracle's exact quantiles: the
    // approx p50 must land within the exact [p25, p75] — the oracle asserts
    // TRUE, so a broken sketch breaks the hash (same pattern as q38)
    "q58_approx_quantiles" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          round(expr("percentile(n_chars, 0.25D)"), 6).as("p25_exact"),
          round(expr("percentile(n_chars, 0.75D)"), 6).as("p75_exact"),
          expr("approx_percentile(n_chars, 0.5D, 1000)").as("_p50_approx"))
        .select(
          col("lang"),
          col("p25_exact"),
          col("p75_exact"),
          (col("_p50_approx") >= col("p25_exact") && col("_p50_approx") <= col("p75_exact"))
            .as("approx_in_iqr"))
        .orderBy("lang")),

    // full outer join: per-nation customer and supplier account totals,
    // nations present on either side survive (completes the join-type
    // inventory: inner/broadcast q11-q12, semi q48, anti q32, asof q41,
    // range q42, salted q49)
    "q59_full_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum(centsOf(col("c_acctbal"))).as("cust_cents"))
      val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"), sum(centsOf(col("s_acctbal"))).as("supp_cents"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select(
          col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("cust_cents"), lit(0L)).as("cust_cents"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("supp_cents"), lit(0L)).as("supp_cents"))
        .orderBy("nationkey")
    }),

    // line-level dedup (C4/CCNet-style): sentences occurring in more than
    // one document are boilerplate candidates; per-doc duplicated-line
    // fraction drives removal. Scale shape: explode → distinct → per-line
    // counts via groupBy + equi-join back, NOT a `count(*) over (partition
    // by line)` window — a window sends every occurrence of one line to a
    // single partition and its exchange is invisible to AQE skew
    // splitting; the #1 boilerplate line of a C4-scale corpus is exactly
    // the pathological key. A hot JOIN key AQE can split, and the
    // distinct's exchange is reused by both branches (no re-explode).
    "q60_line_dedup" -> ((s, dir) => {
      val lines = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("line"))
        .filter(length(col("line")) > 0)
        .distinct()
      val counts = lines.groupBy("line").agg(count(lit(1)).as("nd"))
      lines.join(counts, "line")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_lines"))
        .select(
          col("doc_id"),
          col("n_lines"),
          col("n_dup_lines"),
          round(col("n_dup_lines").cast("double") / col("n_lines"), 6).as("dup_line_ratio"))
        .orderBy("doc_id")
    }),

    // embedding analytics: per-label mean-vector (centroid) L2 norm — the
    // mean-pooling aggregate of a class-prototype pipeline. Elements are
    // quantized to 1e-6 integers and summed exactly (decimal38 ≡ HUGEINT),
    // so the result is aggregation-order-independent: norm = sqrt(Σ_pos
    // sq²)/(n·1e6), where sq is the exact per-dimension quantized sum.
    // A float mean would differ between engines by summation order.
    "q61_embed_centroids" -> ((s, dir) => {
      val qsum = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(
          sum(round(col("v").cast("double") * 1000000, 0).cast("long")).as("sq"),
          count(lit(1)).as("n"))
      qsum
        .groupBy("label")
        .agg(
          max(col("n")).as("n_vecs"), // constant within the label
          sum(col("sq").cast(dec38) * col("sq").cast(dec38)).as("ssq"))
        .select(
          col("label"),
          col("n_vecs"),
          round(sqrt(col("ssq").cast("double")) / (col("n_vecs") * 1000000.0), 6).as("mean_norm"))
        .orderBy("label")
    }),

    // calendar aggregation (date-function family): monthly order volume
    // and revenue — the classic OLAP rollup over a date dimension
    "q62_monthly_revenue" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(centsOf(col("o_totalprice"))).as("revenue_cents"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("order_month")),

    // explicit GROUPING SETS via the SQL entry path (spark.sql over a temp
    // view — the surface a SQL-first user of the library drives; rollup is
    // q35, cube q52, this is the non-hierarchical set list)
    "q63_grouping_sets" -> ((s, dir) => {
      // unique view name: a shared "orders_v" would be last-writer-wins
      // across concurrent invocations with different sf dirs
      val view = s"orders_v_${java.util.UUID.randomUUID().toString.take(8)}"
      Tables.orders(s, dir).createOrReplaceTempView(view)
      s.sql(
        s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
           |       coalesce(o_orderpriority, 'ALL') AS priority,
           |       count(*) AS n
           |FROM $view
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
           |ORDER BY status, priority""".stripMargin)
    }),

    // sequence packing (concat-and-chunk): assemble docs into fixed
    // token-budget training packs — per language, docs in deterministic id
    // order accumulate their token estimate, and a doc lands in pack
    // floor((cumsum-1)/budget). Whole-doc assignment (docs may straddle a
    // boundary in byte terms; the budget bounds the pack's *starting*
    // offset), one cumsum window — no sequential driver loop.
    "q64_sequence_packing" -> ((s, dir) => {
      val budget = 2048L
      val w = Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), TextFunctions.bpeEstimate(col("text")).as("toks"))
        .withColumn("cum", sum(col("toks")).over(w))
        // greatest(cum,1): a zero-token prefix would otherwise float the
        // leading docs into a nonsensical pack −1
        .withColumn("pack_id", floor((greatest(col("cum"), lit(1L)) - 1) / budget))
        .groupBy("lang", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("toks")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("lang", "pack_id")
    }),

    // contamination detection: eval-set docs (source src0) sharing an LSH
    // band with ANY training doc — the benchmark-decontamination check an
    // LLM-data pipeline runs before training. Scale shape: signature the
    // (small) eval set, equi-join it against the training signature store
    // (see Dedup.incrementalCandidates) — never signatures×corpus re-scans.
    "q65_contamination" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.contamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        d.filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
        "doc_id", "text")
    }),

    // temperature-flattened language resampling (multilingual corpus
    // balancing, α = 0.5): keep doc with p_lang = sqrt(n_min / n_lang),
    // decided by the EXACT integer comparison u²·n_lang < n_min·2^96 over
    // the 48-bit md5 uniform u — no doubles, no pow(), engine-independent,
    // and scale-invariant (doubling the corpus doubles both sides' counts).
    // Rates are a tiny per-lang aggregate → broadcast; the corpus is
    // touched once (scan → broadcast join → final per-lang agg).
    "q68_temperature_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val rates = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val nMin = rates.agg(min(col("n_docs")).as("n_min"))
      val u = Dedup.md5Long(concat(lit("samp#"), col("doc_id").cast("string")), 12).cast(dec38)
      d.select(col("doc_id"), col("lang"))
        .join(broadcast(rates), "lang")
        .crossJoin(broadcast(nMin))
        .withColumn(
          "keep",
          u * u * col("n_docs").cast(dec38) <
            col("n_min").cast(dec38) * lit("79228162514264337593543950336").cast(dec38))
        .groupBy("lang")
        .agg(
          min(col("n_docs")).as("n_docs"), // constant within the group
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // ordered view→click→purchase funnel; see EventWindows.funnel scale note
    "q69_event_funnel" -> ((s, dir) =>
      EventWindows.funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))),

    // dup CLUSTERS from near-dup pairs: alternating large-star/small-star
    // connected components (O(log) rounds, no adjacency-list collect) —
    // pair-wise dropping over-deletes transitive chains; curation keeps
    // one doc per cluster. Oracle: DuckDB recursive CTE reachability.
    "q66_dup_clusters" -> ((s, dir) =>
      graft.operators.ConnectedComponents.clusters(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
          .select("doc_a", "doc_b"),
        "doc_a", "doc_b")),

    // cross-doc n-gram repetition (Lee et al., "Deduplicating Training Data
    // Makes Language Models Better"): fraction of a doc's distinct 3-grams
    // that also appear in ANOTHER doc — the repeated-substring signal,
    // complementing q55 (within-doc) and q60 (line-level). Same skew-safe
    // shape as q60: shingle → distinct → groupBy + equi-join back (a hot
    // boilerplate shingle is an AQE-splittable JOIN key, not a window key).
    "q71_crossdoc_ngrams" -> ((s, dir) => {
      // shingles become 48-bit md5 hashes AT THE EXPLODE, so every
      // downstream exchange (distinct, count, join) shuffles 8-byte keys
      // instead of ~25-byte shingle strings; the oracle replays the same
      // hash, so a (vanishingly rare, 2^-48) collision stays consistent
      val sh = Dedup.shingleRows(Tables.documents(s, dir), "doc_id", "text", 3)
        .select(col("doc_id"), Dedup.md5Long(col("s"), 12).as("sk"))
        .distinct()
      val nd = sh.groupBy("sk").agg(count(lit(1)).as("nd"))
      sh.join(nd, "sk")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_grams_uniq"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
        .select(
          col("doc_id"),
          col("n_grams_uniq"),
          col("n_shared"),
          round(col("n_shared").cast("double") / col("n_grams_uniq"), 6).as("shared_ratio"))
        .orderBy("doc_id")
    }),

    // corpus-unigram-LM document scoring — the perplexity-filter shape
    // (CCNet/Gopher quality signal) with the LM trained on the corpus
    // itself. Scale shape mirrors q43: per-(doc, word) counts are the base
    // relation, word totals DERIVE from it (one corpus explode, exchange
    // reused), the grand total is a 1-row broadcast, and the vocab join is
    // a plain equi-join whose Zipf hot keys ("the") AQE can split. Per-word
    // log-probs are quantized to exact 1e-6 integers (q61 pattern) so the
    // per-doc sum is aggregation-order-invariant and hash-matches.
    "q72_unigram_logprob" -> ((s, dir) => {
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
      val dw = words.groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      val wc = dw.groupBy("w").agg(sum(col("n")).as("cnt"))
      val tot = wc.agg(sum(col("cnt")).as("total"))
      dw.join(wc, "w")
        .crossJoin(broadcast(tot))
        .withColumn("lp",
          round(log(col("cnt").cast("double") / col("total")) * 1000000, 0).cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_words"), sum(col("n") * col("lp")).as("_slp"))
        .select(
          col("doc_id"),
          col("n_words"),
          round(col("_slp").cast("double") / col("n_words") / 1000000.0, 6).as("mean_logprob"))
        .orderBy("doc_id")
    }),

    // per-group deterministic fixed-size sample (the "K docs per language"
    // curation cap): md5-uniform order + row_number ≤ K. Scale: Spark
    // rewrites the rank filter to WindowGroupLimit — each map task keeps
    // only its local top-K per group BEFORE the shuffle, so a 10^8-doc
    // language shuffles K rows per task, not 10^8 (plan-asserted in
    // PlanGuardSpec).
    "q73_group_sample" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(col("_u"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("_u", Dedup.md5Long(concat(lit("gs#"), col("doc_id").cast("string")), 12))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    }),

    // exact-then-near composition (the production default — see the Dedup
    // class doc): collapse exact duplicates to their min-id keeper, then
    // MinHash/LSH over DISTINCT texts only — the order that keeps band
    // buckets bounded by distinct content on a dup-heavy corpus
    "q70_neardup_uniques" -> ((s, dir) =>
      Dedup.nearDupOnUniques(Tables.documents(s, dir), "doc_id", "text")),

    // exact n-gram decontamination (GPT-3-style benchmark overlap): train
    // docs sharing an exact word 5-gram with any eval (src0) doc — the
    // zero-false-negative complement of q65's LSH contamination pass
    "q74_exact_decontam" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.exactNgramContamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        d.filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
        "doc_id", "text", 5)
    }),

    // MinHash Jaccard ESTIMATE per candidate pair — signature-position
    // agreement, computed inside the banding self-join itself (one
    // signature pass; see Dedup.jaccardEstimates scale note)
    "q75_jaccard_estimate" -> ((s, dir) =>
      Dedup.jaccardEstimates(Tables.documents(s, dir), "doc_id", "text")),

    // vocabulary growth (Heaps' law): new words + cumulative vocab per
    // doc-id bucket — the source-saturation curve; cumulative window runs
    // on the bounded bucket relation only
    "q76_vocab_growth" -> ((s, dir) =>
      CorpusStats.vocabGrowth(Tables.documents(s, dir), "doc_id", "text")),

    // corpus-bigram-LM scoring: mean log P(w_i | w_{i-1}) per doc — the
    // conditional-probability upgrade of q72's unigram filter
    "q77_bigram_logprob" -> ((s, dir) =>
      CorpusStats.bigramLogProb(Tables.documents(s, dir), "doc_id", "text")),

    // cross-source duplication matrix: near-dup candidate pairs rolled up
    // by unordered source pair — which feeds duplicate which (the overlap
    // diagnostic a data-mixing team reads before weighting sources)
    "q78_crosssource_dups" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val src = d.select(col("doc_id"), col("source"))
      Dedup.minhashCandidates(d, "doc_id", "text")
        .select("doc_a", "doc_b")
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("source_x"), greatest(col("sa"), col("sb")).as("source_y"))
        .groupBy("source_x", "source_y")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_x", "source_y")
    }),

    // dup-cluster size distribution: components per size + docs removable
    // at that size — the "what will dedup save" histogram; bounded output
    // (a mega-cluster is ONE row here)
    "q79_cluster_sizes" -> ((s, dir) =>
      graft.operators.ConnectedComponents.sizeDistribution(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text"),
        "doc_a", "doc_b")),

    // semantic decontamination: train vectors within cosine 0.4 of any
    // eval (label 0) vector via random-hyperplane LSH bands — catches the
    // paraphrased benchmark leakage q74's exact n-grams can't see
    "q80_semantic_decontam" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.semanticContamination(
        e.filter(col("label") === 0).select(col("vec_id"), col("embedding")),
        e.filter(col("label") =!= 0).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dim = 64)
    }),

    // quality-threshold survival curve: docs per quality decile + docs
    // surviving a cut at that decile — the filter-calibration readout;
    // the cumulative window runs on the ≤11-row decile relation only
    "q81_quality_survival" -> ((s, dir) => {
      val deciles = TextFunctions.withQualityColumns(Tables.documents(s, dir), "text")
        .select(least(floor(col("quality") * 10), lit(9L)).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"))
      val fromAbove = Window
        .orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deciles
        .withColumn("n_surviving", sum(col("n_docs")).over(fromAbove))
        .orderBy("decile")
    }),

    // S1/S3 beyond-reference format: round-trip documents through the
    // JSONL zone sink/scan (the LLM-corpus interchange staple) and
    // aggregate the read-back frame — JSON escaping of quotes/newlines/
    // unicode is what's being proven lossless; the oracle reads parquet
    "q82_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tmp = graft.io.Zones.tempDir(s"graft_jsonl_zone_${new java.io.File(dir).getName}")
      graft.io.Zones.writeJsonl(docs, tmp)
      graft.io.Zones.readJsonl(s, docs.schema, Seq(tmp))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(length(col("text"))).cast("long").as("sum_text_len"),
          countDistinct(col("doc_id")).as("n_ids"))
        .orderBy("source")
    }),

    // one k-means (Lloyd) iteration: IVF assignment + exact quantized
    // component means = refined centroids (the index-build step the q25
    // IVF search assumes; iterate by feeding the output back)
    "q83_kmeans_step" -> ((s, dir) =>
      Similarity.lloydStep(Tables.embeddings(s, dir), "vec_id", "embedding", nCentroids = 8)),

    // kNN majority-vote label prediction over embeddings — the
    // label-propagation primitive (annotate the pool from its nearest
    // labeled examples); ties → smaller label
    "q84_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(Tables.embeddings(s, dir), "vec_id", "embedding", "label",
        nQueries = 25, k = 10)),

    // robust per-lang length outliers: median/MAD flags (mean/stddev
    // would let outliers drag their own threshold)
    "q85_mad_outliers" -> ((s, dir) =>
      Stats.madOutliers(Tables.documents(s, dir), "lang", "n_chars")),

    // distinctive terms per source: add-one log-odds ratio with the
    // Fightin'-Words variance, top-5 by z — "what does this source talk
    // about that the rest don't"
    "q86_logodds_terms" -> ((s, dir) =>
      CorpusStats.logOddsTerms(Tables.documents(s, dir), "text", "source")),

    // source-pair content-overlap matrix: exact Jaccard of hashed 3-gram
    // sets — the corpus-level complement of q78's doc-level dup pairs
    "q87_source_jaccard" -> ((s, dir) =>
      CorpusStats.sourceNgramJaccard(Tables.documents(s, dir), "doc_id", "text", "source")),

    // weekly retention cohorts over events: users by first-event Monday ×
    // week offset — the triangular retention matrix
    "q88_retention_cohorts" -> ((s, dir) =>
      EventWindows.retentionCohorts(Tables.events(s, dir))),

    // deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES): key =
    // ln(u)/w with md5-uniform u and quality weight w; top-5 keys per
    // lang = a quality-biased sample reproducible across engines/runs
    // (the md5 twin of weighted reservoir sampling; key quantized to a
    // 1e-6 integer, q72 ln discipline). Map-side WindowGroupLimit keeps
    // the rank filter off the shuffle.
    "q89_weighted_sample" -> ((s, dir) =>
      ops.Sampling.weightedTopKPerGroup(
        TextFunctions.withQualityColumns(Tables.documents(s, dir), "text")
          .select(col("doc_id"), col("lang"), col("quality")),
        "doc_id", "quality", "lang", k = 5)
        .select(col("lang"), col("rk"), col("doc_id"), col("quality"), col("skey"))
        .orderBy("lang", "rk")),

    // per-source word-distribution Shannon entropy — the diversity
    // readout separating templated/boilerplate sources from genuine text
    "q90_source_entropy" -> ((s, dir) =>
      CorpusStats.wordEntropy(Tables.documents(s, dir), "text", "source")),

    // character-level exact decontamination: train docs sharing any
    // 32-char sliding window with the eval set (source src0) — catches
    // leakage that word 5-grams (q74) miss when only tokenization differs
    "q91_char_decontam" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.charShingleContamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        d.filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
        "doc_id", "text")
    }),

    // dedup × quality interplay: which quality deciles do the near-dup
    // LOSERS concentrate in — the readout that tells a curation team
    // whether dedup is eating boilerplate (low deciles) or real content
    "q92_dedup_quality" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val losers = Dedup.clusterLosers(
        Dedup.minhashCandidates(d, "doc_id", "text").select("doc_a", "doc_b"))
        .select(col("node").as("doc_id"), lit(1L).as("lost"))
      TextFunctions.withQualityColumns(d, "text")
        .select(col("doc_id"), least(floor(col("quality") * 10), lit(9L)).as("decile"))
        .join(losers, Seq("doc_id"), "left")
        .groupBy("decile")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(col("lost"), lit(0L))).as("n_removed"))
        .select(
          col("decile"),
          col("n_docs"),
          col("n_removed"),
          round(col("n_removed").cast("double") / col("n_docs"), 6).as("removal_rate"))
        .orderBy("decile")
    }),

    // Zipf exponent per source: ln-freq vs ln-rank regression slope over
    // the top-500 words — natural text ≈ −1; templated sources deviate
    "q93_zipf_slope" -> ((s, dir) =>
      CorpusStats.zipfSlope(Tables.documents(s, dir), "text", "source")),

    // IVF index-balance profile: per-bucket population and share — the
    // "is my ANN index balanced or does one Voronoi cell eat the corpus"
    // readout before paying for a multi-probe search plan. The share
    // window runs on the ≤nCentroids-row bucket relation only.
    "q94_ivf_profile" -> ((s, dir) => {
      val counts = Similarity.assignBuckets(Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_vecs"))
      counts
        .withColumn("frac", round(col("n_vecs").cast("double") /
          sum(col("n_vecs")).over(Window.partitionBy()), 6))
        .orderBy("bucket")
    }),

    // Gopher-rule quality battery: per-source pass rates of the six
    // MassiveText-style filters — the threshold-calibration readout a
    // curation team inspects before committing a keep/drop rule; pure
    // per-row map (no shuffle before the bounded per-source agg)
    "q95_gopher_rules" -> ((s, dir) => {
      val flagged = TextFunctions.gopherFlags(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
      val allPass = col("r_wordcount") && col("r_meanlen") && col("r_alpha") &&
        col("r_stopwords") && col("r_repetition") && col("r_distinct")
      flagged
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("r_wordcount").cast("long")).as("n_wordcount"),
          sum(col("r_meanlen").cast("long")).as("n_meanlen"),
          sum(col("r_alpha").cast("long")).as("n_alpha"),
          sum(col("r_stopwords").cast("long")).as("n_stopwords"),
          sum(col("r_repetition").cast("long")).as("n_repetition"),
          sum(col("r_distinct").cast("long")).as("n_distinct"),
          sum(allPass.cast("long")).as("n_pass_all"))
        .withColumn("pass_rate", round(col("n_pass_all").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // bloom-prefiltered decontamination, rolled up per source: the eval
    // n-gram set ships as ONE broadcast bitset and the corpus side is
    // pruned map-side before any shuffle; the exact confirm join makes
    // the bloom invisible in the result (oracled against plain exact SQL)
    "q96_bloom_decontam" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val train = d.filter(col("source") =!= "src0")
      val hits = Dedup.bloomDecontamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        train.select(col("doc_id"), col("text")),
        "doc_id", "text", n = 5)
      train.select(col("doc_id"), col("source"))
        .join(hits, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_shared_grams").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
          sum(coalesce(col("n_shared_grams"), lit(0L))).as("total_shared_grams"))
        .withColumn("contam_rate",
          round(col("n_contaminated").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // overlapping char-window chunking (context-window / RAG passage
    // prep): gapless 128-char windows every 96 chars, tail clamped —
    // chunk ids derive from offsets, so the whole operator is one
    // shuffle-free posexplode map
    "q97_doc_chunks" -> ((s, dir) =>
      graft.operators.Chunking.charChunks(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id", "chunk_id")),

    // exact embedding covariance (upper triangle): the PCA/whitening/
    // anisotropy input — quantized integer sums (partition-invariant),
    // pair terms generated map-side from each vector's suffix, one
    // exchange of ≤ d(d+1)/2 partial rows
    "q98_embed_covariance" -> ((s, dir) =>
      graft.operators.EmbeddingStats.covarianceUpperTriangle(
        Tables.embeddings(s, dir), "embedding")),

    // source-mixture reweighting: per-source token shares vs a uniform
    // target mixture → sampling weight (the DoReMi-style "how hard do I
    // up/down-sample each source" readout); global shares via a window
    // over the bounded per-source relation only
    "q99_mixture_weights" -> ((s, dir) => {
      val bySource = Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(TextFunctions.bpeEstimate(col("text")), lit(0L))).as("n_tokens"))
      val everything = Window.partitionBy()
      bySource
        .withColumn("token_share",
          round(col("n_tokens").cast("double") / sum(col("n_tokens")).over(everything), 6))
        .withColumn("weight",
          round((lit(1.0) / count(lit(1)).over(everything))
            / (col("n_tokens").cast("double") / sum(col("n_tokens")).over(everything)), 6))
        .orderBy("source")
    }),

    // dup-rate curve: LSH candidate pairs bucketed by estimated Jaccard
    // decile, with the from-above cumulative = pairs actioned at each
    // threshold — the dedup threshold-calibration readout (q81's survival
    // curve, for pairs); cumulative window on the ≤11-row relation only
    "q100_dup_curve" -> ((s, dir) => {
      val deciles = Dedup.jaccardEstimates(Tables.documents(s, dir), "doc_id", "text")
        .select(least(floor(col("est_jaccard") * 10), lit(9L)).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_pairs"))
      val fromAbove = Window
        .orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deciles
        .withColumn("n_pairs_at_or_above", sum(col("n_pairs")).over(fromAbove))
        .orderBy("decile")
    }),

    // per-source Jensen–Shannon divergence from the rest of the corpus:
    // the redundancy readout behind mixture decisions (q90's entropy
    // says how diverse a source is; this says how much it adds)
    "q101_source_jsd" -> ((s, dir) =>
      CorpusStats.jsDivergence(Tables.documents(s, dir), "text", "source")),

    // PII audit rollup: per-source detector hit counts + docs-with-PII —
    // the compliance readout (zero on this synthetic corpus, which the
    // oracle verifies structurally; the detectors themselves are
    // spec-tested on crafted fixtures in PiiScrubSpec)
    "q102_pii_audit" -> ((s, dir) =>
      graft.operators.PiiScrub.withPiiColumns(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("n_emails"),
          sum(col("n_ssn")).as("n_ssns"),
          sum(col("n_ip")).as("n_ips"),
          sum(col("n_phone")).as("n_phones"),
          sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("n_docs_with_pii"))
        .orderBy("source")),

    // semi-structured extraction: typed from_json over the events props
    // payload (PERMISSIVE: malformed/missing → null, counted as
    // unparsed) → per-type stats on the extracted field — the
    // schema-on-read staple for instrumented-event lakes
    "q103_json_extract" -> ((s, dir) => {
      val kSchema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")
      Tables.events(s, dir)
        .withColumn("k", from_json(col("props"), kSchema).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_parsed"),
          sum(coalesce(col("k"), lit(0L))).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .withColumn("mean_k",
          round(col("sum_k").cast("double") / col("n_parsed").cast("double"), 6))
        .orderBy("event_type")
    }),

    // mixture-weight APPLY: deterministic per-doc keep test u·G·ntok_s <
    // Ntok·2^48 — i.e. keep with probability min(w_s, 1) for q99's
    // uniform-target weight w_s, entirely in exact integer algebra
    // (q68's cross-multiply discipline; no doubles, no rand()); the
    // per-source relation is bounded and broadcast
    "q104_mixture_apply" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("_tok", coalesce(TextFunctions.bpeEstimate(col("text")), lit(0L)))
      val bySource = d.groupBy("source").agg(sum(col("_tok")).as("ntok"))
      val everything = Window.partitionBy()
      val totals = bySource
        .withColumn("ntok_all", sum(col("ntok")).over(everything))
        .withColumn("n_sources", count(lit(1)).over(everything))
      val u = Dedup.md5Long(concat(lit("mix#"), col("doc_id").cast("string")), 12).cast(dec38)
      d.select(col("doc_id"), col("source"))
        .join(broadcast(totals), "source")
        .withColumn(
          "keep",
          u * col("n_sources").cast(dec38) * col("ntok").cast(dec38) <
            col("ntok_all").cast(dec38) * lit(Dedup.MinhashMod).cast(dec38))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("keep_rate", round(col("n_kept").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // heavy-hitter bigrams: exact φ=1/1000 heavy hitters via a count-min
    // sketch prefilter — the bounded-key sketch pass replaces the full
    // vocabulary shuffle; exact recount only on sketch survivors
    "q105_heavy_hitters" -> ((s, dir) =>
      CorpusStats.heavyHitters(Tables.documents(s, dir), "text")),

    // deterministic training-shard assignment: md5(doc_id) % 64 → per-shard
    // doc/token/char loads + load ratio vs the mean — the output-bucketing
    // balance readout; the global window runs on the 64-row relation only
    "q106_shard_assignment" -> ((s, dir) => {
      val everything = Window.partitionBy()
      Tables.documents(s, dir)
        .select(
          pmod(Dedup.md5Long(col("doc_id").cast("string"), 12), lit(64L)).as("shard"),
          TextFunctions.regexPieces(col("text")).as("_pieces"),
          col("n_chars"))
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("_pieces")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars_total"))
        .withColumn(
          "load_ratio",
          round(col("n_tokens").cast("double") * 64 / sum(col("n_tokens")).over(everything), 6))
        .orderBy("shard")
    }),

    // LSH calibration: MinHash estimate vs exact Jaccard per
    // signature-agreement bucket — banding precision readout (≤9 rows out)
    "q107_lsh_calibration" -> ((s, dir) =>
      Dedup.lshCalibration(Tables.documents(s, dir), "doc_id", "text")),

    // tokenizer fertility per language: regex-pieces per whitespace word and
    // chars per piece — the "how expensive is this language to tokenize"
    // readout that sizes a token budget per source
    "q108_fertility" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.regexPieces(col("text"))).as("n_pieces"),
          sum(TextFunctions.wordCount(col("text"))).as("n_words"),
          sum(col("n_chars")).as("n_chars_total"))
        .select(
          col("lang"),
          col("n_docs"),
          col("n_pieces"),
          col("n_words"),
          round(col("n_pieces").cast("double") / col("n_words"), 6).as("fertility"),
          round(col("n_chars_total").cast("double") / col("n_pieces"), 6).as("chars_per_piece"))
        .orderBy("lang")),

    // snapshot diff (CDC over a versioned lake): two simulated corpus
    // versions — old lacks doc_id%11==3 (those are "added"), new lacks
    // doc_id%17==2 ("removed"), old's doc_id%13==5 texts differ
    // ("changed") — hash-diffed per source; only digests shuffle
    "q109_snapshot_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val oldSnap = d.filter(pmod(col("doc_id"), lit(11)) =!= 3)
        .select(
          col("doc_id"), col("source"),
          when(pmod(col("doc_id"), lit(13)) === 5, concat(col("text"), lit(" v0")))
            .otherwise(col("text")).as("text"))
      val newSnap = d.filter(pmod(col("doc_id"), lit(17)) =!= 2)
        .select(col("doc_id"), col("source"), col("text"))
      SnapshotDiff.summary(oldSnap, newSnap, "doc_id", "source", Seq("text"))
    }),

    // normalization-then-exact dedup (CCNet first pass): case/punct/space
    // insensitive dup rate per source at exact-dedup cost
    "q110_normalized_dedup" -> ((s, dir) =>
      Dedup.normalizedExact(Tables.documents(s, dir), "doc_id", "text", "source")),

    // temporal distribution drift: JS divergence of each month's event-type
    // mix vs the rest of the stream — the "did my pipeline's input shift
    // this month" monitor (q101 machinery on a time axis)
    "q111_temporal_jsd" -> ((s, dir) =>
      CorpusStats.jsDivergence(
        Tables.events(s, dir)
          .select(date_format(col("ts"), "yyyy-MM").as("month"), col("event_type")),
        "event_type", "month")),

    // intra-document repetition: per-source share of self-repeated 20-char
    // windows + docs with any window recurring ≥3× (Gopher repetition
    // signal at char granularity; doc id in the agg key → skew-proof)
    "q112_intra_doc_repetition" -> ((s, dir) =>
      Dedup.intraDocRepetition(Tables.documents(s, dir), "doc_id", "text", "source")),

    // robust per-language length stats: winsorized vs raw mean — the gap
    // IS the outlier signal (clipped values quantize to 1e-6 ints before
    // the sum, so the aggregation is order-invariant)
    "q113_winsorized_stats" -> ((s, dir) =>
      Stats.winsorizedStats(Tables.documents(s, dir), "n_chars", "lang")),

    // corpus concentration: Herfindahl index of per-source token shares +
    // effective source count (1/HHI) — the one-number "is my mixture
    // dominated by a single source" diagnostic; all heavy lifting is one
    // per-source agg, the index itself runs on the bounded relation
    "q114_source_concentration" -> ((s, dir) => {
      val per = Tables.documents(s, dir)
        .groupBy("source")
        .agg(sum(TextFunctions.regexPieces(col("text"))).as("ntok"))
      val tot = per.agg(sum(col("ntok")).as("total"), count(lit(1)).as("n_sources"))
      val share = col("ntok").cast("double") / col("total")
      per.crossJoin(broadcast(tot))
        .select(
          col("n_sources"),
          col("total"),
          round(share * share * lit(1000000000000.0), 0).cast("long").as("q"))
        .groupBy("n_sources", "total")
        .agg(sum(col("q")).as("qq"))
        .select(
          col("n_sources"),
          col("total").as("total_tokens"),
          round(col("qq").cast("double") / 1000000000000.0, 6).as("hhi"),
          round(lit(1000000000000.0) / col("qq").cast("double"), 6).as("effective_sources"))
    }),

    // token-budget truncation: keep each source's docs in doc_id order
    // until a 5k-token budget — how much of the planned mixture the budget
    // actually realizes; the cumulative window partitions by source
    "q115_token_budget" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), TextFunctions.regexPieces(col("text")).as("tok"))
        .withColumn("cum", sum(col("tok")).over(w))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("cum") <= 5000L, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("cum") <= 5000L, col("tok")).otherwise(0L)).as("tokens_kept"))
        .withColumn("keep_rate", round(col("n_kept").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // full k-means fit: 3 driver-looped Lloyd iterations from the
    // deterministic seeds, then per-cluster size + mean member cosine —
    // the clustering-quality readout (q83 is one iteration of this)
    "q116_kmeans_fit" -> ((s, dir) =>
      Similarity.kmeansFit(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCentroids = 8, iters = 3)),

    // label purity of the fitted clusters: does unsupervised structure
    // recover the labels — the semantic-balance readout before using
    // clusters as sampling strata; purity uses the same integer
    // half-away division as the k-means means (no round() boundary)
    "q117_cluster_purity" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.kmeansAssignments(e, "vec_id", "embedding", nCentroids = 8, iters = 3)
        .join(e.select(col("vec_id").as("vid"), col("label")), "vid")
        .groupBy("bucket", "label")
        .agg(count(lit(1)).as("c"))
        .groupBy(col("bucket").as("cent_id"))
        .agg(
          sum(col("c")).as("n_members"),
          max(struct(col("c"), (-col("label")).as("neg"), col("label").as("lbl"))).as("best"))
        .select(
          col("cent_id"),
          col("n_members"),
          col("best.lbl").cast("long").as("majority_label"),
          col("best.c").as("n_majority"),
          (expr("(2 * best.c * 1000000 + n_members) div (2 * n_members)").cast("double")
            / 1000000.0).as("purity"))
        .orderBy("cent_id")
    }),

    // per-user event transition matrix (first-order Markov readout): how
    // users move between event types, with transition probabilities by the
    // integer half-away division (no round() boundary); the lag window
    // partitions by user — distributed by construction
    "q118_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("n_from", sum(col("n")).over(Window.partitionBy("prev_type")))
        .select(
          col("prev_type"),
          col("event_type"),
          col("n"),
          (expr("(2 * n * 1000000 + n_from) div (2 * n_from)").cast("double") / 1000000.0)
            .as("p"))
        .orderBy("prev_type", "event_type")
    }),

    // lang × source independence: chi-square cell contributions — which
    // (language, source) cells are over/under-represented vs independence;
    // the corpus-balance QA a mixing team runs before reweighting
    "q119_lang_source_indep" -> ((s, dir) => {
      val cells = Tables.documents(s, dir).groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rowT = Window.partitionBy("lang")
      val colT = Window.partitionBy("source")
      val all = Window.partitionBy()
      cells
        .withColumn("rl", sum(col("o")).over(rowT))
        .withColumn("cl", sum(col("o")).over(colT))
        .withColumn("nn", sum(col("o")).over(all))
        .withColumn("e", col("rl").cast("double") * col("cl") / col("nn"))
        .select(
          col("lang"),
          col("source"),
          col("o").as("observed"),
          round(col("e"), 6).as("expected"),
          round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 6).as("contrib"))
        .orderBy("lang", "source")
    }),

    // ORC zone round-trip: write documents to an ORC zone, read back with
    // the explicit schema, aggregate — oracled against the parquet
    // original (q57/q82 discipline for the third columnar zone format)
    "q120_orc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tmp = graft.io.Zones.tempDir(s"graft_orc_zone_${new java.io.File(dir).getName}")
      graft.io.Zones.writeOrc(docs, tmp)
      graft.io.Zones.readOrc(s, docs.schema, Seq(tmp))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          countDistinct(col("doc_id")).as("n_ids"))
        .orderBy("lang")
    }),

    // Poisson-bootstrap CI for the per-language mean length: deterministic
    // md5-uniform weights against exact integer Poisson(1) thresholds —
    // the uncertainty readout behind any corpus-metric comparison
    "q121_bootstrap_ci" -> ((s, dir) =>
      Stats.bootstrapMeanCI(Tables.documents(s, dir), "n_chars", "doc_id", "lang")),

    // BPE merge training (tokenizer-TRAIN side of the q18/q29 appliers):
    // 8 merges learned from the weighted vocab relation — the corpus
    // collapses to |vocab| rows once, each merge iterates on that
    "q122_bpe_merges" -> ((s, dir) =>
      CorpusStats.bpeTrain(Tables.documents(s, dir), "text", numMerges = 8)),

    // apply the learned merges back to the corpus: per-source symbol
    // counts + chars-per-symbol compression — the train→apply loop closed
    "q123_bpe_apply" -> ((s, dir) =>
      CorpusStats.bpeSegmentation(Tables.documents(s, dir), "text", "source", numMerges = 8)),

    // sorted-neighborhood blocking (record-linkage family): pairs within a
    // rank window of the normalized sort key, per block — catches
    // same-prefix near-dups LSH scores low; complementary candidate source
    "q124_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, dir), "doc_id", "text")),

    // blocking-family agreement: LSH vs sorted-neighborhood candidate
    // sets — pair counts, intersection, and pair-set Jaccard; the "do my
    // candidate generators see the same dups" audit (1-row output, three
    // bounded aggregates cross-joined)
    "q125_blocking_overlap" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val lsh = Dedup.minhashCandidates(d, "doc_id", "text").select("doc_a", "doc_b")
      val snm = Dedup.sortedNeighborhoodPairs(d, "doc_id", "text")
        .select(
          least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .distinct()
      val both = lsh.intersect(snm)
      lsh.agg(count(lit(1)).as("n_lsh"))
        .crossJoin(snm.agg(count(lit(1)).as("n_snm")))
        .crossJoin(both.agg(count(lit(1)).as("n_both")))
        .select(
          col("n_lsh"),
          col("n_snm"),
          col("n_both"),
          round(
            col("n_both").cast("double") / (col("n_lsh") + col("n_snm") - col("n_both")),
            6).as("pair_jaccard"))
    }),

    // keeper-policy comparison: min-id vs highest-quality keeper per dup
    // cluster — how the survivorship policy shifts the per-source mix
    "q126_keeper_policy" -> ((s, dir) =>
      Curation.keeperPolicyComparison(Tables.documents(s, dir), "doc_id", "text", "source")),

    // dup-graph degree distribution: how hub-y the candidate-pair graph is
    // (the "will CC see mega-components" diagnostic, read before the apply)
    "q127_dup_degree" -> ((s, dir) => {
      val pairs = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
      pairs.select(col("doc_a").as("node"))
        .unionByName(pairs.select(col("doc_b").as("node")))
        .groupBy("node")
        .agg(count(lit(1)).as("deg"))
        .groupBy(col("deg").as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // time-series gap-fill: per-user hourly series densified onto the full
    // hour grid with forward-fill — the resample step downstream
    // time-series consumers assume; everything partitions by user
    "q128_gap_fill" -> ((s, dir) =>
      EventWindows.gapFillHourly(Tables.events(s, dir))),

    // classic shipping-priority query (TPC-H Q3 shape): unshipped revenue
    // of BUILDING-segment orders placed before / shipped after the cutoff
    // — selective date + segment predicates push to all three scans, the
    // customer dim broadcasts, top-10 by exact cents revenue
    "q129_shipping_priority" -> ((s, dir) => {
      val cutoff = "1998-07-01"
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit(cutoff))
        .join(
          Tables.orders(s, dir).filter(col("o_orderdate") < lit(cutoff)),
          col("l_orderkey") === col("o_orderkey"))
        .join(
          broadcast(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(
          col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .agg(sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }),

    // record-linkage verification: exact Levenshtein on normalized
    // 64-char prefixes of sorted-neighborhood candidate pairs — the
    // precision stage after q124's recall stage; DP runs on a bounded
    // key, texts gated to candidate docs by a semi join
    "q130_linkage_verify" -> ((s, dir) =>
      Dedup.editDistanceVerify(Tables.documents(s, dir), "doc_id", "text")),

    // integer PageRank over the dup-candidate graph: which docs sit at
    // the center of the duplicate mesh (boilerplate sources rank high).
    // 3 synchronous rounds, all arithmetic in exact 1e-6 integer units
    // — one equi-join + one hash agg per round, candidates generated
    // once and checkpointed
    "q131_pagerank" -> ((s, dir) =>
      GraphMetrics.pageRankInt(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text"))),

    // order-invariant table fingerprints (anti-entropy / replica
    // validation): canonical row string → 60-bit md5 lane → XOR +
    // modular-sum + count per table; one scan and a 1-row aggregate
    // per table, comparison ships 5 rows not 100 TB
    "q132_table_fingerprint" -> ((s, dir) => {
      import graft.ops.Fingerprint
      val iso = (c: Column) => date_format(c, "yyyy-MM-dd")
      Fingerprint.ofAll(Seq(
        ("customer", Tables.customer(s, dir), Seq(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          centsOf(col("c_acctbal")), col("c_mktsegment"))),
        ("nation", Tables.nation(s, dir), Seq(
          col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        ("orders", Tables.orders(s, dir), Seq(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          centsOf(col("o_totalprice")), iso(col("o_orderdate")), col("o_orderpriority"))),
        ("region", Tables.region(s, dir), Seq(col("r_regionkey"), col("r_name"))),
        ("supplier", Tables.supplier(s, dir), Seq(
          col("s_suppkey"), col("s_name"), col("s_nationkey"), centsOf(col("s_acctbal"))))))
    }),

    // regional supplier volume (TPC-H Q5 shape): 6-way join where the
    // customer and supplier must share a nation — the selective region
    // filter prunes through two broadcast dims before the fact joins;
    // revenue in exact cents
    "q133_regional_revenue" -> ((s, dir) => {
      val asiaNations = Tables.nation(s, dir)
        .join(
          broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      Tables.lineitem(s, dir)
        .join(
          Tables.orders(s, dir)
            .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1998-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(
          Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("revenue_cents").desc, col("nation"))
    }),

    // dup-graph triangle census: per-node triangle count + local
    // clustering coefficient under the degree-ordered orientation
    // (out-degree O(√m), hub-safe) — "are my candidate clusters
    // cliques (real dup families) or hub-and-spoke false positives"
    "q134_triangle_stats" -> ((s, dir) =>
      GraphMetrics.triangleStats(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text"))),

    // boilerplate-prefix census: normalized 32-char prefixes shared by
    // ≥2 docs — the "which template headers dominate my corpus" readout
    // (pairs live in q124/q130; this is the group-level census). One
    // scan, one hash agg
    "q135_prefix_boilerplate" -> ((s, dir) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(substring(norm, 1, 32).as("prefix"), col("doc_id"), col("source"))
        .groupBy("prefix")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("min_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("prefix"))
    }),

    // Naive-Bayes source attribution: corpus classified by its own
    // add-one-smoothed multinomial model, read out as the actual ×
    // predicted confusion matrix — integer-quantized log-probs, the
    // zero-count term factored out so the score join touches only
    // observed (token, label) pairs
    "q136_nb_attribution" -> ((s, dir) =>
      NaiveBayes.sourceAttribution(Tables.documents(s, dir), "doc_id", "text", "source")),

    // rolling 7-day distinct active users, map-side amplified: each
    // (user, day) fans out to the 7 window-end days it supports, then
    // ONE distinct-count agg — no range self-join, no window over an
    // unbounded frame; the day-bound is a 1-row broadcast
    "q137_rolling_active" -> ((s, dir) => {
      val day = to_date(col("ts"))
      val ud = Tables.events(s, dir).select(col("user_id"), day.as("d")).distinct()
      val maxDay = ud.agg(max(col("d")).as("dmax"))
      ud.select(col("user_id"), explode(sequence(lit(0), lit(6))).as("off"), col("d"))
        .select(col("user_id"), expr("date_add(d, off)").as("wday"))
        .crossJoin(broadcast(maxDay))
        .filter(col("wday") <= col("dmax"))
        .groupBy(date_format(col("wday"), "yyyy-MM-dd").as("window_end"))
        .agg(countDistinct(col("user_id")).as("n_active_7d"))
        .orderBy("window_end")
    }),

    // cross-doc substring duplication (Lee et al. substring-dedup
    // signal): stride-16 30-char windows hashed to 48-bit lanes; a
    // doc's dup_frac = share of its distinct windows seen in ≥2 docs.
    // The (doc, hash) relation is materialized ONCE (localCheckpoint —
    // the signature-store discipline: 16 bytes/window ≪ re-exploding
    // the corpus for the count side, and plan-asserted single-scan);
    // the hot-hash join back is equi and AQE-splittable
    "q138_substring_dups" -> ((s, dir) => {
      val wins = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 30)
        .select(
          col("doc_id"),
          explode(sequence(lit(1), length(col("text")) - 29, lit(16))).as("pos"),
          col("text"))
        .select(col("doc_id"), Dedup.md5Long(expr("substring(text, pos, 30)"), 12).as("h"))
        .distinct()
        .localCheckpoint()
      val hc = wins.groupBy("h").agg(count(lit(1)).as("nd"))
      wins.join(hc, "h")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_windows"),
          sum(when(col("nd") >= 2, lit(1L)).otherwise(lit(0L))).as("n_shared"))
        .select(
          col("doc_id"), col("n_windows"), col("n_shared"),
          round(col("n_shared").cast("double") / col("n_windows"), 6).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // grouped OLS (price ~ quantity per brand): closed-form slope /
    // intercept from exact decimal-38 sums (q54 discipline — partition-
    // count-invariant), part dim broadcast into the fact scan
    "q139_brand_ols" -> ((s, dir) => {
      val x = centsOf(col("l_quantity"))
      val y = centsOf(col("l_extendedprice"))
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      Tables.lineitem(s, dir)
        .join(
          broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).cast(dec38).as("n"),
          sum(x.cast(dec38)).as("sx"),
          sum(y.cast(dec38)).as("sy"),
          sum((x * y).cast(dec38)).as("sxy"),
          sum((x * x).cast(dec38)).as("sxx"))
        .select(
          col("p_brand"),
          col("n").cast("long").as("n_rows"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            den.cast("double"), 6).as("slope"),
          round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
            den.cast("double"), 6).as("intercept_cents"))
        .orderBy("p_brand")
    }),

    // SCD-2 run intervals (islands of consecutive equal event_type per
    // user): lag-change flag → running-sum run id → per-run bounds, the
    // next run's start closing each interval — the dimension-history
    // build a lakehouse CDC stage produces. All windows partition by
    // user; the post-agg lead runs on bounded run rows
    "q140_scd2_runs" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy("user_id").orderBy(col("grp"))
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), lit(1L))
            .otherwise(lit(0L)))
        .withColumn("grp",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "grp", "event_type")
        .agg(min(col("ts")).as("from_ts"), count(lit(1)).as("n_events"))
        .withColumn("to_ts", lead(col("from_ts"), 1).over(wRun))
        .select(
          col("user_id"),
          col("grp").as("run_seq"),
          col("event_type"),
          date_format(col("from_ts"), fmt).as("valid_from"),
          coalesce(date_format(col("to_ts"), fmt), lit("current")).as("valid_to"),
          col("n_events"))
        .orderBy("user_id", "run_seq")
    }),

    // bilateral trade volume (TPC-H Q7 shape): the two-role dimension
    // join — nation joined twice under different roles, both broadcast;
    // cross-nation lineitems only, yearly exact-cents volume
    "q141_nation_trade" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1999-01-01")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .groupBy(
          col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("volume_cents"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    }),

    // reciprocal-rank fusion of the two blocking families: per doc,
    // LSH neighbors (by band agreement) and sorted-neighborhood
    // neighbors (by key equality) each ranked, fused with the pure-
    // integer RRF kernel 1e9 DIV (60+rank) — no float accumulation —
    // and the top-3 fused neighbors kept per doc (WindowGroupLimit:
    // map-side top-K before the shuffle). The production "combine my
    // candidate generators" step of record linkage
    "q142_rank_fusion" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      def sym(pairs: DataFrame, score: Column): DataFrame = {
        val p = pairs.select(col("doc_a"), col("doc_b"), score.as("sc"))
        p.select(col("doc_a").as("d"), col("doc_b").as("nb"), col("sc"))
          .unionByName(p.select(col("doc_b").as("d"), col("doc_a").as("nb"), col("sc")))
      }
      val wRank = Window.partitionBy("d").orderBy(col("sc").desc, col("nb"))
      val lsh = sym(Dedup.minhashCandidates(d, "doc_id", "text"), col("n_bands"))
        .withColumn("rk", row_number().over(wRank).cast("long"))
      val snm = sym(
        Dedup.sortedNeighborhoodPairs(d, "doc_id", "text"), col("same_key"))
        .withColumn("rk", row_number().over(wRank).cast("long"))
      val wTop = Window.partitionBy("d").orderBy(col("rrf_score").desc, col("nb"))
      lsh.unionByName(snm)
        .select(col("d"), col("nb"), expr("1000000000 DIV (60 + rk)").as("contrib"))
        .groupBy("d", "nb")
        .agg(sum(col("contrib")).as("rrf_score"), count(lit(1)).as("n_gens"))
        .withColumn("rank", row_number().over(wTop).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("d").as("doc_id"), col("rank"), col("nb").as("neighbor"),
          col("rrf_score"), col("n_gens"))
        .orderBy("doc_id", "rank")
    }),

    // late-order service report (TPC-H Q4 shape): orders with at least
    // one lineitem shipped >60 days after order date — the EXISTS
    // classic as a semi join (equi key + range residual), per-priority
    // late share
    "q143_late_orders" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val late = o.join(
        Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_late"))
      o.groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
        .join(late, Seq("o_orderpriority"), "left")
        .select(
          col("o_orderpriority"),
          col("n_orders"),
          coalesce(col("n_late"), lit(0L)).as("n_late"),
          round(coalesce(col("n_late"), lit(0L)).cast("double") / col("n_orders"), 6)
            .as("late_frac"))
        .orderBy("o_orderpriority")
    }),

    // audience-overlap matrix: Jaccard between event types' user sets.
    // Self-join on user of the distinct (type, user) relation — per-user
    // amplification bounded by the type-set size, type totals broadcast
    "q144_audience_overlap" -> ((s, dir) => {
      val ut = Tables.events(s, dir)
        .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
      val cnts = ut.groupBy("t").agg(count(lit(1)).as("n"))
      ut.as("x").join(ut.as("y"), col("x.u") === col("y.u") && col("x.t") < col("y.t"))
        .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
        .join(broadcast(cnts.select(col("t").as("type_a"), col("n").as("n_a"))), "type_a")
        .join(broadcast(cnts.select(col("t").as("type_b"), col("n").as("n_b"))), "type_b")
        .select(
          col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
          round(col("n_both").cast("double") / (col("n_a") + col("n_b") - col("n_both")), 6)
            .as("jaccard"))
        .orderBy("type_a", "type_b")
    }),

    // session-duration distribution: exact interpolating percentiles
    // over the 30-min-gap sessions (one bounded agg over the session
    // relation q36 builds)
    "q145_session_percentiles" -> ((s, dir) =>
      EventWindows.sessionize(Tables.events(s, dir), 30)
        .agg(
          count(lit(1)).as("n_sessions"),
          round(expr("percentile(duration_us, 0.5D)"), 6).as("p50_us"),
          round(expr("percentile(duration_us, 0.9D)"), 6).as("p90_us"),
          round(expr("percentile(duration_us, 0.99D)"), 6).as("p99_us"),
          round(expr("percentile(n_events, 0.5D)"), 6).as("p50_events"),
          max(col("duration_us")).as("max_us"))),

    // generator evaluation: LSH candidate pairs scored against exact-
    // duplicate ground truth (same-text pairs). True-pair mass comes
    // from group sizes (C(n,2) per text group — never materialized);
    // TP via an md5(text) equality check on the bounded candidate set
    "q146_lsh_eval" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
      val sig = d.select(col("doc_id"), md5(col("text")).as("tmd5"))
      val truth = sig.groupBy("tmd5").agg(count(lit(1)).as("n"))
        .agg(sum(expr("(n * (n - 1)) DIV 2")).as("n_true_pairs"))
      val cand = Dedup.minhashCandidates(d, "doc_id", "text")
        .join(sig.select(col("doc_id").as("doc_a"), col("tmd5").as("ma")), Seq("doc_a"))
        .join(sig.select(col("doc_id").as("doc_b"), col("tmd5").as("mb")), Seq("doc_b"))
        .agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("ma") === col("mb"), lit(1L)).otherwise(lit(0L))).as("n_tp"))
      val p = col("n_tp").cast("double") / col("n_candidates")
      val r = col("n_tp").cast("double") / col("n_true_pairs")
      cand.crossJoin(broadcast(truth))
        .select(
          col("n_candidates"), col("n_true_pairs"), col("n_tp"),
          when(col("n_candidates") === 0, lit(0.0)).otherwise(round(p, 6)).as("prec"),
          when(col("n_true_pairs") === 0, lit(0.0)).otherwise(round(r, 6)).as("rec"),
          when(col("n_tp") === 0, lit(0.0))
            .otherwise(round(lit(2.0) * p * r / (p + r), 6)).as("f1"))
    }),

    // RFM segmentation, scale-safe: quartile BOUNDARIES are one exact-
    // percentile row broadcast against the per-customer aggregates —
    // no global ntile window; codes by comparison, 4^3 segments max
    "q147_rfm_segments" -> ((s, dir) => {
      val rfm = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(
          max(col("o_orderdate")).as("last_dt"),
          count(lit(1)).as("freq"),
          sum(centsOf(col("o_totalprice"))).as("mon"))
        .crossJoin(broadcast(
          Tables.orders(s, dir).agg(max(col("o_orderdate")).as("ref_dt"))))
        .select(
          col("o_custkey"),
          datediff(col("ref_dt"), col("last_dt")).cast("long").as("rec"),
          col("freq"), col("mon"))
      val qs = rfm.agg(
        expr("percentile(rec, 0.25D)").as("r1"), expr("percentile(rec, 0.5D)").as("r2"),
        expr("percentile(rec, 0.75D)").as("r3"),
        expr("percentile(freq, 0.25D)").as("f1"), expr("percentile(freq, 0.5D)").as("f2"),
        expr("percentile(freq, 0.75D)").as("f3"),
        expr("percentile(mon, 0.25D)").as("m1"), expr("percentile(mon, 0.5D)").as("m2"),
        expr("percentile(mon, 0.75D)").as("m3"))
      def code(v: Column, q1: Column, q2: Column, q3: Column): Column =
        lit(1L) + (v > q1).cast("long") + (v > q2).cast("long") + (v > q3).cast("long")
      rfm.crossJoin(broadcast(qs))
        .select(
          concat_ws("/",
            code(col("rec"), col("r1"), col("r2"), col("r3")),
            code(col("freq"), col("f1"), col("f2"), col("f3")),
            code(col("mon"), col("m1"), col("m2"), col("m3"))).as("segment"),
          col("mon"))
        .groupBy("segment")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("mon")).as("mon_cents"))
        .orderBy("segment")
    }),

    // nearest-in-time join: each error event matched to the CLOSEST
    // purchase of the same user, past or future — one shuffle, two
    // window carries over the unioned relation, ties to the earlier row
    "q148_nearest_event" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      AsOfJoin.nearest(
        ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id")),
        "user_id", "ts", "event_id", "event_id")
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("nearest_event_id"), col("gap_us"), col("direction"))
        .orderBy("user_id", "event_id")
    }),

    // calendar heatmap: day-of-week × hour-of-day activity grid (n,
    // distinct users, exact cents) — one scan, one agg, 168 rows
    "q149_hourly_heatmap" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          dayofweek(col("ts")).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hod"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(centsOf(col("value"))).as("value_cents"))
        .orderBy("dow", "hod")),

    // customer order-count distribution INCLUDING zeros (TPC-H Q13
    // shape): the left join is what distinguishes this from q03/q04 —
    // never-ordered customers appear as the n_orders=0 bucket
    "q150_order_count_dist" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders")),

    // behavioral trigrams: top-20 3-step event-type paths across users
    // — two leads over the per-user order, one hash agg; the sequence-
    // mining readout one step past q118's transition matrix
    "q151_event_trigrams" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("t1"))
        .withColumn("t2", lead(col("t1"), 1).over(w))
        .withColumn("t3", lead(col("t1"), 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy("t1", "t2", "t3")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
    }),

    // int8 embedding quantization error profile: per-vector absmax
    // scale, symmetric round-half-up quantization (floor(x+0.5) — pure
    // IEEE ops, bit-identical across engines), reconstruction error
    // quantized to exact 1e-12 integers, mean via the half-away integer
    // division (meanMicros discipline at pico scale)
    "q152_quant_error" -> ((s, dir) => {
      val el = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "vf")))
        .select(col("vec_id"), col("label"), col("vf").cast("double").as("v"))
      val sc = el.groupBy("vec_id").agg(max(abs(col("v"))).as("scale"))
      el.join(sc, "vec_id")
        .withColumn("q",
          when(col("scale") === 0, lit(0L))
            .otherwise(floor(col("v") / col("scale") * 127 + 0.5)))
        .withColumn("err", col("v") - col("q") * col("scale") / lit(127))
        .withColumn("e2u", floor(col("err") * col("err") * 1e12 + 0.5))
        .groupBy("vec_id", "label")
        .agg(
          sum(col("e2u")).as("se2"), count(lit(1)).as("n"),
          sum(when(abs(col("q")) === 127, lit(1L)).otherwise(lit(0L))).as("sat"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(col("se2")).as("s2"), sum(col("n")).as("nn"),
          sum(col("sat")).as("n_saturated"))
        .select(
          col("label"), col("n_vecs"),
          (expr("(2 * s2 + nn) div (2 * nn)").cast("double") / 1.0e12).as("mean_sq_err"),
          col("n_saturated"))
        .orderBy("label")
    }),

    // right-to-be-forgotten cascade audit: a deterministic 1% of
    // customers deleted, the deletion propagated through orders and
    // lineitems by semi joins — per-table before/deleted/after counts,
    // the compliance readout of a lakehouse delete job
    "q153_delete_cascade" -> ((s, dir) => {
      val delc = Tables.customer(s, dir)
        .filter(Dedup.md5Long(concat(lit("del#"), col("c_custkey").cast("string")), 12) % 100 === 0)
        .select("c_custkey")
      val oDel = Tables.orders(s, dir)
        .join(delc, col("o_custkey") === col("c_custkey"), "left_semi")
      val lDel = Tables.lineitem(s, dir)
        .join(oDel.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
      def audit(name: String, full: DataFrame, deleted: DataFrame): DataFrame =
        full.agg(count(lit(1)).as("n_before"))
          .crossJoin(deleted.agg(count(lit(1)).as("n_deleted")))
          .select(
            lit(name).as("table_name"), col("n_before"), col("n_deleted"),
            (col("n_before") - col("n_deleted")).as("n_after"))
      audit("customer", Tables.customer(s, dir), delc)
        .unionByName(audit("orders", Tables.orders(s, dir), oDel))
        .unionByName(audit("lineitem", Tables.lineitem(s, dir), lDel))
        .orderBy("table_name")
    }),

    // forecast-revenue-change (TPC-H Q6 shape): the pure-pushdown
    // aggregate — every predicate (date range, discount band, quantity
    // cap) reaches the parquet scan, no join, no shuffle beyond the
    // 1-row final agg; the canonical "scan 100 TB, move nothing" query
    "q154_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01" &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
        .agg(
          sum(centsOf(col("l_extendedprice") * col("l_discount"))).as("revenue_cents"),
          count(lit(1)).as("n_lineitems"))),

    // returned-item report (TPC-H Q10 shape): customers ranked by
    // revenue they returned in a half-year — the order-date filter
    // prunes the fact join, the nation dim broadcasts, ties broken by
    // the unique custkey so the top-20 is a total order
    "q155_returned_items" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .join(
          Tables.orders(s, dir)
            .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1997-07-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
        .agg(
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
          count(lit(1)).as("n_returns"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)),

    // promotion-revenue share (TPC-H Q14 shape): monthly fraction of
    // revenue from PROMO parts — the part dim broadcasts into the fact
    // scan, both legs of the ratio accumulate as exact cents in ONE
    // pass (conditional sum, not two scans), share a single division
    "q156_promo_share" -> ((s, dir) => {
      val cents = centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))
      Tables.lineitem(s, dir)
        .join(
          broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(
          sum(when(col("p_type") === "PROMO", cents).otherwise(lit(0L))).as("promo_cents"),
          sum(cents).as("total_cents"))
        .select(
          col("month"), col("promo_cents"), col("total_cents"),
          round(col("promo_cents").cast("double") / col("total_cents"), 6).as("promo_share"))
        .orderBy("month")
    }),

    // top supplier(s) by quarter revenue (TPC-H Q15 shape): the
    // per-supplier revenue relation is aggregated once, its max is a
    // 1-row broadcast bound, and only the argmax rows join back to the
    // supplier dim — no window over the whole relation, ties kept
    "q157_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      val mx = rev.agg(max(col("revenue_cents")).as("mrev"))
      rev.crossJoin(broadcast(mx))
        .filter(col("revenue_cents") === col("mrev"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
        .orderBy("s_suppkey")
    }),

    // large-volume orders (TPC-H Q18 shape): the fact table aggregates
    // FIRST (sum of integral quantities — exact in doubles, cast to
    // long), the >150 filter prunes before any dimension joins, so the
    // order/customer joins see only the few hundred big orders
    "q158_big_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("qty_sum"))
        .filter(col("qty_sum") > 150)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          centsOf(col("o_totalprice")).as("totalprice_cents"), col("qty_sum"))
        .orderBy(col("qty_sum").desc, col("o_orderkey"))
        .limit(50)
    }),

    // discounted-revenue OR-bands (TPC-H Q19 shape): three disjunctive
    // (type, quantity-band, size-band) predicates — the part dim
    // broadcasts, the OR collapses into one scan-side filter, and the
    // answer is a 1-row exact-cents aggregate
    "q159_band_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(
          broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_type") === "PROMO" && col("l_quantity").between(1, 11) && col("p_size").between(1, 15)) ||
            (col("p_type") === "STANDARD" && col("l_quantity").between(10, 20) && col("p_size").between(1, 25)) ||
            (col("p_type") === "LARGE" && col("l_quantity").between(20, 30) && col("p_size").between(1, 35)))
        .agg(
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
          count(lit(1)).as("n_lineitems"))),

    // national market share (TPC-H Q8 shape): within AMERICA's customer
    // market, the yearly share supplied by NATION_2's suppliers — both
    // legs of the ratio accumulate in ONE pass over the joined fact
    // (conditional cents sum), dims broadcast, share a single division
    "q160_market_share" -> ((s, dir) => {
      val amerNations = Tables.nation(s, dir)
        .join(
          broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cents = centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(amerNations), col("c_nationkey") === col("n_nationkey"))
        .join(
          Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("s_nationkey") === 2, cents).otherwise(lit(0L))).as("nation_cents"),
          sum(cents).as("total_cents"))
        .select(
          col("o_year"), col("nation_cents"), col("total_cents"),
          round(col("nation_cents").cast("double") / col("total_cents"), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // lapsed wealthy customers (TPC-H Q22 shape): above-average balance
    // (integer cross-multiplied compare against a 1-row global bound —
    // no doubles) with no order since 1999 (anti join) — per-nation
    // count + balance, the "who stopped buying" readout
    "q161_lapsed_wealth" -> ((s, dir) => {
      val cents = centsOf(col("c_acctbal"))
      val tot = Tables.customer(s, dir)
        .agg(sum(cents).as("sum_cents"), count(lit(1)).as("n_cust"))
      Tables.customer(s, dir)
        .crossJoin(broadcast(tot))
        .filter(cents * col("n_cust") > col("sum_cents"))
        .join(
          Tables.orders(s, dir).filter(col("o_orderdate") >= "1999-01-01"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_lapsed"), sum(cents).as("acctbal_cents"))
        .orderBy("nationkey")
    }),

    // deterministic HyperLogLog (p=9, m=512): md5-derived registers, the
    // estimate assembled from an EXACT integer register sum (Σ 2^(40-M)
    // as a long — no floating accumulation), so the sketch value itself
    // is oracle-able cross-engine, not just a bound like q38. Both the
    // sketch and the exact count derive from ONE distinct-pairs relation
    "q162_hll_distinct" -> ((s, dir) => {
      val pairs = Tables.events(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
      val exact = pairs.groupBy("event_type").agg(count(lit(1)).as("exact_distinct"))
      val regs = pairs
        .select(
          col("event_type"),
          Dedup.md5Long(concat(lit("hll#"), col("user_id").cast("string")), 12).as("h"))
        .select(
          col("event_type"),
          expr("h div 549755813888").as("b"),
          when(col("h") % 549755813888L === 0, lit(40))
            .otherwise(lit(40) - length(bin(col("h") % 549755813888L))).as("rho"))
        .groupBy("event_type", "b")
        .agg(max(col("rho")).as("mr"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_present"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - mr AS INT))")).as("sp"))
      exact.join(regs, "event_type")
        .select(
          col("event_type"), col("exact_distinct"),
          round(
            lit(hllAlphaM2Scaled) /
              (col("sp") + (lit(512L) - col("n_present")) * lit(1099511627776L)).cast("double"),
            3).as("hll_estimate"),
          (lit(512L) - col("n_present")).as("n_empty"))
        .orderBy("event_type")
    }),

    // top principal direction: power iteration over the exact scaled
    // covariance n·Sxy − Sx·Sy — one distributed pass builds the d²
    // sums, the d²-bounded iteration replays in pure integers (see
    // EmbeddingStats.powerIteration)
    "q163_power_pca" -> ((s, dir) =>
      graft.operators.EmbeddingStats.powerIteration(s, Tables.embeddings(s, dir), "embedding")),

    // last-touch purchase attribution: each purchase credited to the
    // user's immediately-preceding event within 7 days (lag over the
    // per-user timeline — partitioned window, no self-join), read out
    // as credited-touch counts and shares
    "q164_purchase_attribution" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          when(col("prev_us") >= col("us") - 604800000000L, col("prev_type"))
            .otherwise(lit("none")).as("touch"))
        .groupBy("touch")
        .agg(count(lit(1)).as("n_purchases"))
        .select(
          col("touch"), col("n_purchases"),
          round(
            col("n_purchases").cast("double") /
              sum(col("n_purchases")).over(Window.partitionBy()), 6).as("share"))
        .orderBy("touch")
    }),

    // hive-partitioned write + pruned read: documents laid out by lang,
    // the lang='en' read resolved by PARTITION pruning (directory
    // listing, zero non-en bytes read — the plan guard asserts the
    // PartitionFilters entry)
    "q165_partition_pruning" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tmp = graft.io.Zones.tempDir(s"graft_part_zone_${new java.io.File(dir).getName}")
      docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("source")
    }),

    // A/B lift with a z-score: users hash-split 50/50, purchase values
    // micro-quantized into exact decimal sums (n, Σv, Σv² per arm in ONE
    // conditional-aggregate pass — no second scan, no join), the means
    // via the integer half-away formula, variance/z as compositions of
    // identical double ops on exact integers
    "q166_abtest_lift" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
      val grp = Dedup.md5Long(concat(lit("ab#"), col("user_id").cast("string")), 12) % 2
      val vq = round(col("value") * 1e6).cast(dec)
      def mm(sv: String, n: String): Column =
        expr(s"(2 * $sv + $n) div (2 * $n)").cast("double") / 1000000.0
      def vr(n: String, sv: String, sv2: String): Column =
        expr(s"CAST(($n * $sv2 - $sv * $sv) AS DOUBLE)")
          ./(col(n)).cast("double")./(col(n)) / 1.0e12
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(grp.as("grp"), vq.as("vq"))
        .agg(
          count(when(col("grp") === 0, lit(1))).as("n_a"),
          count(when(col("grp") === 1, lit(1))).as("n_b"),
          sum(when(col("grp") === 0, col("vq")).otherwise(lit(0).cast(dec))).as("sva"),
          sum(when(col("grp") === 1, col("vq")).otherwise(lit(0).cast(dec))).as("svb"),
          sum(when(col("grp") === 0, col("vq") * col("vq")).otherwise(lit(0).cast(dec))).as("sv2a"),
          sum(when(col("grp") === 1, col("vq") * col("vq")).otherwise(lit(0).cast(dec))).as("sv2b"))
        .select(
          col("n_a"), col("n_b"),
          mm("sva", "n_a").as("mean_a"), mm("svb", "n_b").as("mean_b"),
          vr("n_a", "sva", "sv2a").as("var_a"), vr("n_b", "svb", "sv2b").as("var_b"))
        .select(
          col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
          (col("mean_a") - col("mean_b")).as("lift"),
          round(
            (col("mean_a") - col("mean_b")) /
              sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")), 6).as("z_score"))
    }),

    // vocabulary-pruning curve: for each min-count threshold, the
    // surviving vocab size and kept-token share — ONE token-count
    // relation fanned out map-side to the threshold grid (no per-
    // threshold rescans), the corpus total a 1-row broadcast bound
    "q167_vocab_pruning" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w")
        .agg(count(lit(1)).as("c"))
      val tot = counts.agg(sum(col("c")).cast("long").as("total"))
      counts
        .select(col("c"), explode(array(lit(2), lit(5), lit(10), lit(25), lit(100))).as("threshold"))
        .filter(col("c") >= col("threshold"))
        .groupBy(col("threshold").cast("long").as("threshold"))
        .agg(count(lit(1)).as("vocab_size"), sum(col("c")).cast("long").as("kept_tokens"))
        .crossJoin(broadcast(tot))
        .select(
          col("threshold"), col("vocab_size"), col("kept_tokens"),
          round(col("kept_tokens").cast("double") / col("total"), 6).as("kept_share"))
        .orderBy("threshold")
    }),

    // train/val/test split-leakage audit: docs hash-split 80/10/10, a
    // val/test doc "leaks" if its normalized-text hash also appears in
    // train — the distinct train-hash relation equi-joins back (AQE-
    // splittable), the eval-hygiene readout run before any benchmark
    "q168_split_leakage" -> ((s, dir) => {
      val nh = md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      val bucket = Dedup.md5Long(concat(lit("split#"), col("doc_id").cast("string")), 12) % 10
      val d = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(
          nh.as("nh"),
          when(bucket <= 7, lit("train")).when(bucket === 8, lit("val"))
            .otherwise(lit("test")).as("split"))
      val trainH = d.filter(col("split") === "train")
        .select("nh").distinct().withColumn("hit", lit(1))
      d.filter(col("split") =!= "train")
        .join(trainH, Seq("nh"), "left")
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_leaked"))
        .select(
          col("split"), col("n_docs"), col("n_leaked"),
          round(col("n_leaked").cast("double") / col("n_docs"), 6).as("leak_rate"))
        .orderBy("split")
    }),

    // per-stratum quota sampling: each language fills its own quota (50
    // en / 20 otherwise) by deterministic md5 rank — per-stratum window,
    // no global sort; the reproducible "cap every slice" sampler behind
    // balanced eval sets
    "q169_quota_sample" -> ((s, dir) => {
      val quota = when(col("lang") === "en", lit(50)).otherwise(lit(20))
      val w = Window.partitionBy("lang").orderBy(col("_r"), col("doc_id"))
      Tables.documents(s, dir)
        .select(
          col("doc_id"), col("lang"),
          Dedup.md5Long(concat(lit("quota#"), col("doc_id").cast("string")), 12).as("_r"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= quota)
        .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
        .orderBy("lang", "rn")
    }),

    // daily new-vs-returning actives: ONE distinct (user, day)
    // relation; each user's first day comes from a per-user window
    // (no self-join), then the day rollup splits actives into new and
    // returning — the growth-accounting readout
    "q170_new_vs_returning" -> ((s, dir) => {
      val um = Tables.events(s, dir)
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .distinct()
      um.withColumn("first_day", min(col("day")).over(Window.partitionBy("user_id")))
        .groupBy("day")
        .agg(
          count(lit(1)).as("n_active"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"))
        .select(
          col("day"), col("n_active"), col("n_new"),
          (col("n_active") - col("n_new")).as("n_returning"),
          round(col("n_new").cast("double") / col("n_active"), 6).as("new_share"))
        .orderBy("day")
    }),

    // signup→purchase conversion funnel by cohort day: per-user
    // signup/first-purchase times in ONE conditional-aggregate pass,
    // conversion rate + exact interpolating median hours-to-convert per
    // cohort (micros stay integers until the final division)
    "q171_time_to_convert" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").isin("signup", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("sus"),
          // day string of the EARLIEST signup (string min ≡ chronological
          // min — no timezone-dependent epoch→month reconstruction)
          min(when(col("event_type") === "signup", date_format(col("ts"), "yyyy-MM-dd"))).as("cohort"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("pus"))
        .filter(col("sus").isNotNull)
        .select(
          col("cohort"),
          when(col("pus") >= col("sus"), col("pus") - col("sus")).as("delta_us"))
        .groupBy("cohort")
        .agg(
          count(lit(1)).as("n_signups"),
          count(col("delta_us")).as("n_converted"),
          round(expr("percentile(delta_us, 0.5D)") / 3.6e9, 6).as("median_hours"))
        .select(
          col("cohort"), col("n_signups"), col("n_converted"),
          round(col("n_converted").cast("double") / col("n_signups"), 6).as("conversion_rate"),
          col("median_hours"))
        .orderBy("cohort")),

    // reciprocal best matches: the record-linkage "mutual best hit" —
    // each doc's best MinHash partner via a per-doc window over the
    // banded candidate estimates (never all pairs), kept only when the
    // choice is mutual; the high-precision end of the dedup family
    "q172_reciprocal_best" -> ((s, dir) => {
      val est = Dedup.jaccardEstimates(Tables.documents(s, dir), "doc_id", "text")
      val u = est.select(col("doc_a").as("d"), col("doc_b").as("p"), col("n_match"))
        .unionByName(est.select(col("doc_b").as("d"), col("doc_a").as("p"), col("n_match")))
      val w = Window.partitionBy("d").orderBy(col("n_match").desc, col("p"))
      val best = u.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("d"), col("p"), col("n_match"))
      best.as("x")
        .join(best.as("y"), col("x.p") === col("y.d") && col("y.p") === col("x.d") && col("x.d") < col("y.d"))
        .select(
          col("x.d").as("doc_a"), col("x.p").as("doc_b"), col("x.n_match"),
          round(col("x.n_match").cast("double") / 8.0, 6).as("est_jaccard"))
        .orderBy("doc_a")
    }),

    // EWMA-smoothed daily error rate, α=1/2: weights are exact powers
    // of two (x·2^k stays integral), so the whole smoothing runs on
    // integer cumulative sums — the 2^D normalizer cancels in the rate
    // ratio and the only double is the final division. One scan, one
    // 30-row windowed readout
    "q173_ewma_error_rate" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          datediff(col("d"), to_date(lit("2024-01-01"))).as("k"),
          col("n_events"), col("n_errors"))
      val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("wn", expr("shiftleft(n_events, CAST(k AS INT))"))
        .withColumn("we", expr("shiftleft(n_errors, CAST(k AS INT))"))
        .withColumn("cwn", sum(col("wn")).over(w))
        .withColumn("cwe", sum(col("we")).over(w))
        .select(
          col("day"), col("n_events"), col("n_errors"),
          round(col("n_errors").cast("double") / col("n_events"), 6).as("rate"),
          round(col("cwe").cast("double") / col("cwn"), 6).as("ewma_rate"))
        .orderBy("day")
    }),

    // customer spend-decile lift table — the SCALABLE decile: no global
    // ntile window (that's a single-partition sort over every customer);
    // instead the nine exact interpolating percentile cuts come from a
    // distributed aggregate (1-row broadcast bound) and each customer
    // map-side counts the cuts at or below its spend. Quantile-bucket
    // semantics: ties land together, sizes near-n/10. Decile 1 = top
    // spenders; windows beyond the per-customer agg touch only 10 rows
    "q174_decile_lift" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(centsOf(col("o_totalprice"))).as("spend_cents"))
      val cuts = spend.agg(expr(
        "percentile(spend_cents, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))").as("cuts"))
      val below = (1 to 9)
        .map(i => when(element_at(col("cuts"), i) <= col("spend_cents").cast("double"), 1L)
          .otherwise(0L))
        .reduce(_ + _)
      val byDecile = spend
        .crossJoin(broadcast(cuts))
        .select(col("spend_cents"), (lit(10L) - below).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum(col("spend_cents")).as("spend_cents"))
      byDecile
        .withColumn("total", sum(col("spend_cents")).over(Window.partitionBy()))
        .withColumn(
          "cum",
          sum(col("spend_cents")).over(
            Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(
          col("decile"), col("n_customers"), col("spend_cents"),
          round(col("spend_cents").cast("double") / col("total"), 6).as("spend_share"),
          round(col("cum").cast("double") / col("total"), 6).as("cum_share"))
        .orderBy("decile")
    }),

    // market-basket co-purchase pairs: distinct parts per order, pair
    // generation bounded by the per-order line cap (never corpus-
    // quadratic), one equi self-join with exchange reuse, top-50 by a
    // total order
    "q175_copurchase_pairs" -> ((s, dir) =>
      // bounded per-order part sets (≤ 7 lines/order) → map-side ordered-
      // pair generation from collect_set arrays: one shuffle on orderkey,
      // pairs aggregated map-side (the q45/q248 rewrite)
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(col("ps")).as("part_a"), col("ps"))
        .select(col("part_a"), explode(col("ps")).as("part_b"))
        .filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(50)),

    // TPC-H Q9-shaped part-family profit by nation and order year: the
    // one shuffle join is lineitem ⋈ orders on orderkey; part (pre-
    // filtered on the name family), supplier and nation all broadcast.
    // Profit stays in integer cents until the sink
    "q176_part_profit" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(
          broadcast(Tables.part(s, dir).filter(col("p_name").contains("widget"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("profit_cents"))
        .orderBy(col("nation"), col("o_year").desc)),

    // TPC-H Q17-shaped small-quantity revenue: the correlated per-part
    // average becomes one per-part aggregate joined back to the fact
    // (AQE broadcasts it when small). The 20%-of-average predicate is
    // the integer cross-multiplication 5·qty·n < Σqty — no division, no
    // rounding, exact in both engines; yearly average via integer div
    "q177_small_qty_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val pq = li.groupBy("l_partkey")
        .agg(sum(col("l_quantity")).cast("long").as("sq"), count(lit(1)).as("nq"))
      li.join(
          broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(pq, "l_partkey")
        .filter(col("l_quantity").cast("long") * col("nq") * 5 < col("sq"))
        .agg(count(lit(1)).as("n_lines"), sum(centsOf(col("l_extendedprice"))).as("total_cents"))
        .select(
          col("n_lines"), col("total_cents"),
          expr("total_cents div 7").as("avg_yearly_cents"))
    }),

    // TPC-H Q21-shaped sole-late supplier: orders with several suppliers
    // where exactly ONE shipped late (>60 days after order date). The
    // classic EXISTS / NOT EXISTS self-join pair collapses into two
    // stacked aggregates over ONE lineitem scan — per-(order, supplier)
    // lateness, then a per-order rollup that extracts the unique late
    // supplier inline (when n_late = 1 the max over flagged suppliers IS
    // that supplier) — so no self-join remains at all
    "q178_sole_late_supplier" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
            .otherwise(0L)).as("sl"))
        .groupBy("l_orderkey")
        .agg(
          count(lit(1)).as("n_supp"),
          sum(col("sl")).as("n_late"),
          max(when(col("sl") === 1, col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .join(broadcast(Tables.supplier(s, dir)), col("late_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("s_name"))
        .limit(20)),

    // session concurrency curve: sweep-line over session [start, end]
    // intervals — +1/-1 deltas, one running sum over a TOTAL order
    // (us, starts-before-ends, user, sess) so ties can't diverge, then a
    // per-day max. The global window is one ~n_sessions-row pass here; at
    // 100 TB the same sweep runs as a range-partitioned prefix sum
    // (per-partition presums broadcast, rank-offset added map-side)
    "q179_concurrency_curve" -> ((s, dir) => {
      val sess = EventWindows.sessionize(Tables.events(s, dir), 30)
      val deltas = sess.select(
          col("start_us").as("us"), lit(1L).as("delta"), col("user_id"), col("sess_idx"))
        .unionByName(sess.select(
          col("end_us").as("us"), lit(-1L).as("delta"), col("user_id"), col("sess_idx")))
      val w = Window
        .orderBy(col("us"), col("delta").desc, col("user_id"), col("sess_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("conc", sum(col("delta")).over(w))
        .filter(col("delta") === 1)
        .groupBy(date_format(timestamp_micros(col("us")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_sessions"), max(col("conc")).as("max_concurrent"))
        .orderBy("day")
    }),

    // language-ID confusion matrix: q28's marker heuristic evaluated
    // against the labeled lang column — one scan, one (true, pred) agg,
    // row-normalized by a per-true-lang window over the tiny matrix
    "q180_langid_confusion" -> ((s, dir) => {
      val Seq(("en", en), ("fr", fr), ("de", de), ("es", es)) =
        TextFunctions.langScores(col("text"))
      Tables.documents(s, dir)
        .select(col("lang"), TextFunctions.predictedLang(en, fr, de, es).as("pred"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .withColumn("nt", sum(col("n")).over(Window.partitionBy("lang")))
        .select(
          col("lang"), col("pred"), col("n"),
          round(col("n").cast("double") / col("nt"), 6).as("recall"))
        .orderBy("lang", "pred")
    }),

    // decision-stump split finding: information gain of "n_chars < t"
    // against the is-English label for a fixed threshold grid. The grid
    // explodes map-side (8× row fan-out, no extra scan), counts are one
    // hash agg, the entropy algebra is the IDENTICAL expression text fed
    // to both engines (integer-ratio divisions then ln — bit-parity)
    "q181_split_gain" -> ((s, dir) => {
      val ent = (pos: String, n: String) =>
        s"CASE WHEN ($pos) <= 0 OR ($pos) >= ($n) THEN 0.0 ELSE " +
          s"-((CAST($pos AS DOUBLE)/($n))*ln(CAST($pos AS DOUBLE)/($n)) + " +
          s"(CAST(($n) - ($pos) AS DOUBLE)/($n))*ln(CAST(($n) - ($pos) AS DOUBLE)/($n))) END"
      Tables.documents(s, dir)
        .select(
          explode(array((500 to 4000 by 500).map(t => lit(t.toLong)): _*)).as("t"),
          col("n_chars"),
          (col("lang") === "en").cast("long").as("y"))
        .groupBy("t")
        .agg(
          count(lit(1)).as("n"),
          sum(col("y")).as("npos"),
          sum(when(col("n_chars") < col("t"), 1L).otherwise(0L)).as("nl"),
          sum(when(col("n_chars") < col("t"), col("y")).otherwise(0L)).as("nlpos"))
        .select(
          col("t"), col("n"), col("npos"), col("nl"), col("nlpos"),
          round(
            expr(ent("npos", "n")) -
              (col("nl").cast("double") * expr(ent("nlpos", "nl")) +
                (col("n") - col("nl")).cast("double") *
                  expr(ent("npos - nlpos", "n - nl"))) / col("n"),
            6).as("gain"))
        .orderBy("t")
    }),

    // centroid silhouette: cluster-quality score against the seed
    // centroids (vec_id < 8). Components quantize to 1e-3 integers so
    // every squared distance is an exact long; a = own-centroid d², b =
    // best other; s = (b−a)/max(a,b) becomes integer micro-units via
    // `div`, per-cluster mean by the half-away integer formula. One
    // corpus explode, centroids broadcast, k·n bounded distance rows
    "q182_silhouette" -> ((s, dir) => {
      val q = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(
          col("vec_id"), col("pos"),
          round(col("v").cast("double") * 1000, 0).cast("long").as("qv"))
      val cent = q.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("pos"), col("qv").as("cv"))
      val dist = q.join(broadcast(cent), Seq("pos"))
        .groupBy("vec_id", "cent_id")
        .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv"))).as("d2"))
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cent_id"))
      dist.withColumn("rn", row_number().over(w))
        .groupBy("vec_id")
        .agg(
          min(when(col("rn") === 1, col("cent_id"))).as("cluster_id"),
          min(when(col("rn") === 1, col("d2"))).as("a"),
          min(when(col("rn") === 2, col("d2"))).as("b"))
        .select(
          col("cluster_id"),
          when(greatest(col("a"), col("b")) === 0, lit(0L))
            .otherwise(expr("((b - a) * 1000000) div greatest(a, b)")).as("sm"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"), sum(col("sm")).as("ssum"))
        .select(
          col("cluster_id"), col("n_members"),
          (expr("(2 * ssum + n_members) div (2 * n_members)").cast("double") / 1000000.0)
            .as("mean_silhouette"))
        .orderBy("cluster_id")
    }),

    // inter-order gap distribution: per-customer lag window (orderdate,
    // orderkey total order), day gaps rolled up per market segment —
    // exact interpolating median plus the integer-formula mean
    "q183_order_gap_stats" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(
          col("o_custkey"),
          datediff(col("o_orderdate"), col("prev")).cast("long").as("gap_days"))
        .join(
          broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(
          count(lit(1)).as("n_gaps"),
          sum(col("gap_days")).as("gsum"),
          round(expr("percentile(gap_days, 0.5D)"), 6).as("median_gap"))
        .select(
          col("segment"), col("n_gaps"),
          (expr("(2 * gsum * 1000000 + n_gaps) div (2 * n_gaps)").cast("double") / 1000000.0)
            .as("mean_gap"),
          col("median_gap"))
        .orderBy("segment")
    }),

    // n-gram novelty by source: the share of a source's distinct 3-gram
    // occurrences whose FIRST corpus appearance (min doc_id) is in that
    // doc — "how much genuinely new text does each source contribute".
    // Shingles hash to 8-byte keys at the explode (q71 discipline); first
    // owners come from one gram-keyed agg joined back with exchange reuse
    "q184_ngram_novelty" -> ((s, dir) => {
      val sh = Dedup.shingleRows(Tables.documents(s, dir), "doc_id", "text", 3)
        .select(col("doc_id"), Dedup.md5Long(col("s"), 12).as("sk"))
        .distinct()
      val first = sh.groupBy("sk").agg(min(col("doc_id")).as("fd"))
      sh.join(first, "sk")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("ng"),
          sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("nn"))
        .join(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ng")).as("n_grams"),
          sum(col("nn")).as("n_novel"))
        .select(
          col("source"), col("n_docs"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
        .orderBy("source")
    }),

    // year-over-year revenue growth per customer nation: one fact join
    // (dims broadcast), yearly rollup, then a lag window over the tiny
    // (nation, year) grid. Growth rounds half-away by pure integer
    // arithmetic — the CASE keeps `div` numerators non-negative so Spark
    // `div` (truncate) and DuckDB `//` agree
    "q185_yoy_growth" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
      val w = Window.partitionBy("nation").orderBy("yr")
      rev.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
        .withColumn(
          "growth",
          when(col("prev_cents").isNull, lit(null).cast("double"))
            .otherwise(expr(
              "CAST(CASE WHEN rev_cents < prev_cents " +
                "THEN -(((prev_cents - rev_cents) * 2000000 + prev_cents) div (2 * prev_cents)) " +
                "ELSE ((rev_cents - prev_cents) * 2000000 + prev_cents) div (2 * prev_cents) " +
                "END AS DOUBLE) / 1000000.0")))
        .orderBy("nation", "yr")
    }),

    // character-trigram entropy per language: corpus "randomness" in the
    // Shannon sense. Trigrams explode map-side from a position sequence;
    // each −p·ln p term quantizes to 1e-9 integers BEFORE the sum so the
    // entropy aggregate is order-invariant (a raw double sum over
    // thousands of types could never hash-match)
    "q186_char_trigram_entropy" -> ((s, dir) => {
      val cnt = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 3)
        .select(
          col("lang"),
          explode(expr("sequence(1, length(text) - 2)")).as("i"),
          col("text"))
        .select(col("lang"), expr("substring(text, i, 3)").as("g"))
        .groupBy("lang", "g")
        .agg(count(lit(1)).as("c"))
      cnt
        .withColumn("tot", sum(col("c")).over(Window.partitionBy("lang")))
        .select(
          col("lang"), col("c"), col("tot"),
          expr("CAST(round(-(CAST(c AS DOUBLE)/tot)*ln(CAST(c AS DOUBLE)/tot)*1e9) AS BIGINT)")
            .as("tn"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_distinct"), max(col("tot")).as("n_trigrams"),
          sum(col("tn")).as("snano"))
        .select(
          col("lang"), col("n_distinct"), col("n_trigrams"),
          (col("snano").cast("double") / 1.0e9).as("entropy_nats"))
        .orderBy("lang")
    }),

    // inter-arrival burstiness per event type: coefficient of variation
    // of consecutive-event gaps. Gap sums telescope (≤ the stream's time
    // span, long-safe); the square sum goes through decimal38 ≡ HUGEINT
    // so the variance is exact; mean gap by the half-away integer formula
    "q187_interarrival_burstiness" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), (col("us") - col("prev")).as("gap"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("sx"),
          sum(col("gap").cast(dec38) * col("gap").cast(dec38)).as("_sxx"))
        .withColumn("mean_gap_us", expr("(2 * sx + n_gaps) div (2 * n_gaps)"))
        .withColumn(
          "cv",
          when(col("n_gaps") > 1,
            round(
              sqrt((col("n_gaps").cast(dec38) * col("_sxx") -
                col("sx").cast(dec38) * col("sx").cast(dec38)).cast("double") /
                (col("n_gaps") * (col("n_gaps") - 1)).cast("double")) *
                col("n_gaps").cast("double") / col("sx").cast("double"),
              6)))
        .select(col("event_type"), col("n_gaps"), col("mean_gap_us"), col("cv"))
        .orderBy("event_type")
    }),

    // daily-volume anomaly flags: z-score of each day's event count
    // against the exact global mean/stddev (integer sums cross-joined as
    // one broadcast row — no second scan, no window). The flag compares
    // the UNROUNDED z so the boolean can't disagree with the readout
    "q188_daily_anomaly" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"))
      val stats = daily.agg(
        count(lit(1)).as("nd"),
        sum(col("n_events")).as("sx"),
        sum(col("n_events") * col("n_events")).as("sxx"))
      daily.crossJoin(broadcast(stats))
        .withColumn(
          "z",
          expr("CAST(nd * n_events - sx AS DOUBLE) / nd / " +
            "sqrt(CAST(nd * sxx - sx * sx AS DOUBLE) / (nd * (nd - 1)))"))
        .select(
          col("day"), col("n_events"),
          round(col("z"), 6).as("z"),
          (abs(col("z")) > 2.0).as("is_anomaly"))
        .orderBy("day")
    }),

    // CDC changelog apply: last-write-wins state materialization — the
    // lakehouse MERGE/upsert read path. One per-key window over the
    // (ts, event_id) total order keeps the latest row; n_updates and the
    // first-write time come along in the same pass (no second scan)
    "q189_changelog_apply" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
      Tables.events(s, dir)
        .select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_updates", count(lit(1)).over(Window.partitionBy("user_id")))
        .withColumn("first_us", min(col("us")).over(Window.partitionBy("user_id")))
        .filter(col("rn") === 1)
        .select(
          col("user_id"), col("event_type").as("last_type"), col("us").as("last_us"),
          col("first_us"), col("n_updates"))
        .orderBy("user_id")
    }),

    // embedding drift between class centroids: per-label means via the
    // half-away integer formula (micro-exact), then pairwise L2 over the
    // bounded label × label grid — the domain-shift readout. sqrt on an
    // exact integer is the only libm call (bit-parity)
    "q190_centroid_drift" -> ((s, dir) => {
      val mm = Tables.embeddings(s, dir)
        .select(col("label").cast("long").as("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(
          sum(round(col("v").cast("double") * 1000000, 0).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .select(
          col("label"), col("pos"),
          expr("CASE WHEN sq < 0 THEN -((2 * (-sq) + n) div (2 * n)) " +
            "ELSE (2 * sq + n) div (2 * n) END").as("mm"))
      mm.as("a")
        .join(mm.as("b"), col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
        .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
        .agg(sum((col("a.mm") - col("b.mm")) * (col("a.mm") - col("b.mm"))).as("d2"))
        .select(
          col("label_a"), col("label_b"),
          round(sqrt(col("d2").cast("double")) / 1000000.0, 6).as("l2_dist"))
        .orderBy("label_a", "label_b")
    }),

    // per-dimension variance ranking: the feature-selection readout over
    // the embedding matrix — exact decimal38 sums of micro-quantized
    // components (order-invariant), top-10 dims by a total order
    "q191_dim_variance" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(
          col("pos").cast("long").as("dim"),
          round(col("v").cast("double") * 1000000, 0).cast("long").as("qv"))
        .groupBy("dim")
        .agg(
          count(lit(1)).as("n"),
          sum(col("qv")).as("sx"),
          sum(col("qv").cast(dec38) * col("qv").cast(dec38)).as("_sxx"))
        .select(
          col("dim"),
          round(
            (col("n").cast(dec38) * col("_sxx") -
              col("sx").cast(dec38) * col("sx").cast(dec38)).cast("double") /
              (col("n").cast("double") * (col("n") - 1).cast("double")) / 1.0e12,
            6).as("variance"))
        .orderBy(col("variance").desc, col("dim"))
        .limit(10)),

    // TPC-H Q1 pricing summary: THE scan-dominated report — one pushed
    // date filter, one hash agg over (returnflag, linestatus). Money and
    // discounts quantize to integer units before summing; every average
    // uses the half-away integer formula, so the whole report is
    // aggregation-order-invariant
    "q192_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(centsOf(col("l_extendedprice"))).as("sum_base_cents"),
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_cents"),
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")))).as("sum_charge_cents"),
          sum(round(col("l_discount") * 1000000, 0).cast("long")).as("_sd"))
        .select(
          col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          col("sum_qty"), col("sum_base_cents"), col("sum_disc_cents"),
          col("sum_charge_cents"),
          (expr("(2 * sum_qty * 1000000 + n_rows) div (2 * n_rows)").cast("double") / 1000000.0)
            .as("avg_qty"),
          (expr("(2 * sum_base_cents * 10000 + n_rows) div (2 * n_rows)").cast("double") / 1000000.0)
            .as("avg_price"),
          (expr("(2 * _sd + n_rows) div (2 * n_rows)").cast("double") / 1000000.0)
            .as("avg_disc"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q16-shaped supplier diversity: distinct suppliers per brand ×
    // size band, EXCLUDING the negative-balance suppliers via NOT IN —
    // which Catalyst plans as a broadcast anti join (null-safe). The
    // distinct agg shuffles once on the group key
    "q193_supplier_diversity" -> ((s, dir) => {
      val bad = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_key"))
      Tables.lineitem(s, dir)
        .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), (col("p_size") - pmod(col("p_size"), lit(10))).as("size_band"))
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_suppliers").desc, col("p_brand"), col("size_band"))
    }),

    // nested ratio-to-report: each brand's revenue share WITHIN its part
    // type, and each type's share of total — two window levels over the
    // tiny (type, brand) grid after one fact join + rollup
    "q194_share_within_type" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_brand"))
        .agg(sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
        .withColumn("type_cents", sum(col("rev_cents")).over(Window.partitionBy("p_type")))
        .withColumn("total_cents", sum(col("rev_cents")).over(Window.partitionBy()))
        .select(
          col("p_type"), col("p_brand"), col("rev_cents"),
          round(col("rev_cents").cast("double") / col("type_cents"), 6).as("share_in_type"),
          round(col("type_cents").cast("double") / col("total_cents"), 6).as("type_share"))
        .orderBy("p_type", "p_brand")),

    // Kaplan–Meier churn curve (log domain): per-user [first, last] day
    // intervals become per-day start/end counts; the risk set is a
    // sweep-line cumulative difference (never a user × day fan-out) and
    // the KM product turns into a cumulative sum of 1e-9-quantized
    // ln(1 − d/n) terms — order-invariant, exp-free. The day a cohort
    // fully churns yields a NULL term (survival reached zero)
    "q195_survival_curve" -> ((s, dir) => {
      val u = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          min(date_format(col("ts"), "yyyy-MM-dd")).as("fd"),
          max(date_format(col("ts"), "yyyy-MM-dd")).as("ld"))
      val starts = u.groupBy(col("fd").as("day")).agg(count(lit(1)).as("ns"))
      val ends = u.groupBy(col("ld").as("day")).agg(count(lit(1)).as("ne"))
      val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      starts.join(ends, Seq("day"), "full_outer")
        .select(
          col("day"),
          coalesce(col("ns"), lit(0L)).as("ns"),
          coalesce(col("ne"), lit(0L)).as("ne"))
        .withColumn("cs", sum(col("ns")).over(w))
        .withColumn("ce", sum(col("ne")).over(w))
        .withColumn("n_at_risk", col("cs") - col("ce") + col("ne"))
        .withColumn(
          "term",
          when(col("ne") < col("n_at_risk"),
            expr("CAST(round(ln(CAST(n_at_risk - ne AS DOUBLE) / n_at_risk) * 1e9) AS BIGINT)")))
        .withColumn("lognano", sum(col("term")).over(w))
        .select(
          col("day"), col("n_at_risk"), col("ne").as("n_churned"),
          when(col("term").isNotNull, col("lognano").cast("double") / 1.0e9)
            .as("km_log_survival"))
        .orderBy("day")
    }),

    // deterministic k-fold cross-validation assignment: fold =
    // md5(key) mod 5 — reproducible across engines and runs — with the
    // per-fold class mix vs the global mix (the balance audit that
    // justifies hashing over stratification at this key cardinality)
    "q196_cv_folds" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          pmod(Dedup.md5Long(concat(lit("cv#"), col("o_orderkey").cast("string")), 12), lit(5L))
            .as("fold"),
          col("o_orderpriority"))
        .groupBy("fold", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .withColumn("fold_total", sum(col("n")).over(Window.partitionBy("fold")))
        .withColumn("class_total", sum(col("n")).over(Window.partitionBy("o_orderpriority")))
        .withColumn("grand", sum(col("n")).over(Window.partitionBy()))
        .select(
          col("fold"), col("o_orderpriority"), col("n"),
          round(col("n").cast("double") / col("fold_total"), 6).as("fold_share"),
          round(col("class_total").cast("double") / col("grand"), 6).as("global_share"))
        .orderBy("fold", "o_orderpriority")),

    // leave-one-out target encoding: category mean of the label with the
    // row's own value excluded — (Σ_c − x)/(n_c − 1) per row, exact via
    // the half-away integer formula in micro-dollars. Category stats are
    // one tiny aggregate broadcast back onto the fact; the 20-row sample
    // keeps the oracle output bounded
    "q197_target_encode" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), centsOf(col("o_totalprice")).as("cents"))
      val cat = o.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("nc"), sum(col("cents")).as("sc"))
      o.filter(col("o_orderkey") <= 20)
        .join(broadcast(cat), "o_orderpriority")
        .select(
          col("o_orderkey"), col("o_orderpriority"), col("cents"),
          when(col("nc") > 1,
            expr("CAST((2 * (sc - cents) * 10000 + (nc - 1)) div (2 * (nc - 1)) AS DOUBLE)" +
              " / 1000000.0")).as("loo_mean"))
        .orderBy("o_orderkey")
    }),

    // top session paths: the funnel-DISCOVERY readout — first four event
    // types of each session in arrival order, counted. Events sort
    // inside each session by a zero-padded (us, event_id) string key so
    // the collect is deterministic and the per-session array stays
    // bounded (slice before concat)
    "q198_top_paths" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn(
          "is_new",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
            .when(lag(col("us"), 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("sess_idx", sum(col("is_new")).over(w))
        .withColumn(
          "k",
          concat(
            lpad(col("us").cast("string"), 16, "0"), lit("#"),
            lpad(col("event_id").cast("string"), 8, "0"), lit("#"),
            col("event_type")))
        .groupBy("user_id", "sess_idx")
        .agg(collect_list(col("k")).as("ks"))
        .select(
          expr("concat_ws('>', transform(slice(array_sort(ks), 1, 4), " +
            "x -> substring_index(x, '#', -1)))").as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    }),

    // shard-balance audit: would this key hash evenly across 32 shards?
    // md5-mod assignment (portable, q106 discipline), per-shard counts,
    // share via the half-away integer formula — the pre-flight check
    // before bucketing a 100 TB table on a candidate key
    "q199_partition_balance" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          pmod(Dedup.md5Long(concat(lit("pb#"), col("o_orderkey").cast("string")), 12), lit(32L))
            .as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(Window.partitionBy()))
        .select(
          col("shard"), col("n"),
          (expr("(2 * n * 1000000 + total) div (2 * total)").cast("double") / 1000000.0)
            .as("share"))
        .orderBy("shard")),

    // funnel stage latency: median hours between first signup→click and
    // click→purchase per user — ONE conditional-aggregate pass collects
    // all three first-times, the two transitions union from it (exact
    // interpolating median on integer µs deltas)
    "q200_funnel_latency" -> ((s, dir) => {
      val ft = Tables.events(s, dir)
        .filter(col("event_type").isin("signup", "click", "purchase"))
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("t1"),
          min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t2"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t3"))
      val sc = ft.filter(col("t1").isNotNull && col("t2") >= col("t1"))
        .select(lit("signup").as("stage_from"), lit("click").as("stage_to"),
          (col("t2") - col("t1")).as("delta_us"))
      val cp = ft.filter(col("t2").isNotNull && col("t3") >= col("t2"))
        .select(lit("click").as("stage_from"), lit("purchase").as("stage_to"),
          (col("t3") - col("t2")).as("delta_us"))
      sc.unionByName(cp)
        .groupBy("stage_from", "stage_to")
        .agg(
          count(lit(1)).as("n_users"),
          round(expr("percentile(delta_us, 0.5D)") / 3.6e9, 6).as("median_hours"))
        .orderBy("stage_from", "stage_to")
    }),

    // data-constrained repetition factors: how many epochs of each
    // language close the gap to the largest — the up-sampling plan
    // (exact micro factor + ceil-div epochs, both pure integer)
    "q201_repetition_factors" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("n_max", max(col("n_docs")).over(Window.partitionBy()))
        .select(
          col("lang"), col("n_docs"),
          (expr("(2 * n_max * 1000000 + n_docs) div (2 * n_docs)").cast("double") / 1000000.0)
            .as("repeat_factor"),
          expr("(n_max + n_docs - 1) div n_docs").as("epochs"))
        .orderBy("lang")),

    // corpus ↔ embedding coverage audit: which documents lack a vector
    // and which vectors lack a document — one full-outer join collapsed
    // to a single three-counter row (the referential pre-check before
    // any embedding-driven curation)
    "q202_join_coverage" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"))
        .join(
          Tables.embeddings(s, dir).select(col("vec_id")),
          col("doc_id") === col("vec_id"), "full_outer")
        .agg(
          sum(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1L).otherwise(0L))
            .as("n_matched"),
          sum(when(col("vec_id").isNull, 1L).otherwise(0L)).as("n_doc_only"),
          sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("n_vec_only"))),

    // character-class composition per source: letter/space/other shares
    // from regex strip-counts (global-flag semantics on both engines),
    // fractions by the half-away integer formula
    "q203_char_classes" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum((length(col("text")) -
            length(regexp_replace(col("text"), "[a-z]", ""))).cast("long")).as("n_alpha"),
          sum((length(col("text")) -
            length(regexp_replace(col("text"), " ", ""))).cast("long")).as("n_space"))
        .select(
          col("source"), col("n_chars"),
          (expr("(2 * n_alpha * 1000000 + n_chars) div (2 * n_chars)").cast("double") / 1000000.0)
            .as("alpha_frac"),
          (expr("(2 * n_space * 1000000 + n_chars) div (2 * n_chars)").cast("double") / 1000000.0)
            .as("space_frac"),
          (expr("(2 * (n_chars - n_alpha - n_space) * 1000000 + n_chars) div (2 * n_chars)")
            .cast("double") / 1000000.0).as("other_frac"))
        .orderBy("source")),

    // activity concentration (Gini): rank-weighted integer sums over the
    // per-user event counts — G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx), every
    // term exact, final ratio via the half-away micro formula. The
    // global rank window is one ~n_users-row pass; at 100 TB the same
    // rank comes from a range-partitioned sort
    "q204_activity_gini" -> ((s, dir) => {
      val pu = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("x"))
      val w = Window.orderBy(col("x"), col("user_id"))
      pu.withColumn("i", row_number().over(w).cast("long"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("x")).as("total_events"),
          sum(col("i") * col("x")).as("siw"))
        .select(
          col("n_users"), col("total_events"),
          (expr("(2 * (2 * siw - (n_users + 1) * total_events) * 1000000 " +
            "+ n_users * total_events) div (2 * n_users * total_events)")
            .cast("double") / 1000000.0).as("gini"))
    }),

    // Spearman rank correlation between per-customer order count and
    // total spend: deterministic permutation ranks reduce rho to a pure
    // rational (see RankStats) — no sqrt, no double sums. The rank
    // windows run over the BOUNDED per-customer relation
    "q205_spearman_activity" -> ((s, dir) =>
      ops.RankStats.spearman(
        Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(
            count(lit(1)).as("x"),
            sum(centsOf(col("o_totalprice"))).as("y")),
        "o_custkey", "x", "y")),

    // two-sample KS drift: 1995-vs-1996 order-price distributions —
    // cross-multiplied cumulative counts stay integral until one final
    // division; the cumulative window runs over DISTINCT price values
    "q206_ks_price_drift" -> ((s, dir) =>
      operators.Drift.ksStatistic(
        Tables.orders(s, dir)
          .select(
            centsOf(col("o_totalprice")).as("price_cents"),
            year(col("o_orderdate")).cast("string").as("yr")),
        "price_cents", "yr", "1995", "1996")),

    // rank-sum AUC of document length predicting NEAR-dup membership
    // ("are near-duplicates shorter?") — labels are q21's MinHash
    // candidate members via a left semi-shaped join (exact-dup labels
    // would be degenerate: this corpus has none); the rank window runs
    // once over the per-doc relation
    "q207_dup_length_auc" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      val members = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("label", lit(1))
      ops.RankStats.auc(
        docs.select(col("doc_id"), length(col("text")).cast("long").as("score"))
          .join(members, Seq("doc_id"), "left")
          .select(col("doc_id"), col("score"), coalesce(col("label"), lit(0)).as("label")),
        "doc_id", "score", "label")
    }),

    // PSI drift of the event-type mix, weekday vs weekend cohorts —
    // per-category contributions (Laplace-smoothed, nano-quantized ln
    // terms) so the reviewer sees WHICH event type moved
    "q208_psi_event_drift" -> ((s, dir) =>
      operators.Drift.psi(
        Tables.events(s, dir)
          .select(col("event_type"),
            when(dayofweek(col("ts")).isin(1, 7), "wkend").otherwise("wkday").as("cohort")),
        "event_type", "cohort", "wkday", "wkend")),

    // BM25 keyword retrieval (Lucene idf variant): top-10 docs for a
    // 3-term query — per-term integer micro contributions summed per doc
    // (see Retrieval for the rational-form derivation)
    "q209_bm25_topk" -> ((s, dir) =>
      operators.Retrieval.bm25TopK(
        Tables.documents(s, dir), "doc_id", "text",
        Seq("vector", "stream", "filter"), k = 10)),

    // asymmetric shingle containment over LSH candidates — the
    // quote/subset signal Jaccard under-scores (containment 1 = A fully
    // inside B); both directions per pair
    "q210_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text")),

    // curriculum interleave: quality-ranked round-robin across sources —
    // position k·s+r holds source s's r-th best doc, so a sequential
    // trainer sees sources evenly at every quality level; first 50
    // positions. Per-source rank windows are bounded; the global
    // position is a range-partitioned sort at scale
    "q211_curriculum_order" -> ((s, dir) => {
      val scored = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("score"))
      val wSrc = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id"))
      val wPos = Window.orderBy(col("rk"), col("source"))
      scored
        .withColumn("rk", row_number().over(wSrc).cast("long"))
        .withColumn("pos", row_number().over(wPos).cast("long"))
        .select(col("pos"), col("doc_id"), col("source"), col("rk"))
        .orderBy("pos")
        .limit(50)
    }),

    // padding waste of length-sorted vs arrival-order batching (batch =
    // 32 docs, padded to the batch max): the one number that justifies
    // length bucketing in a training loader. Both bucketings derive from
    // ONE token-length relation; integer waste sums, micro fraction
    "q212_padding_waste" -> ((s, dir) => {
      val lens = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(filter(split(col("text"), " ", -1), w => length(w) > 0))
            .cast("long").as("len"))
      def waste(ordered: DataFrame, strategy: String): DataFrame = ordered
        .withColumn("bucket", expr("(rn - 1) div 32"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), max(col("len")).as("mx"), sum(col("len")).as("useful"))
        .agg(
          count(lit(1)).as("n_batches"),
          sum(col("n") * col("mx")).as("padded_tokens"),
          sum(col("useful")).as("useful_tokens"))
        .select(
          lit(strategy).as("strategy"), col("n_batches"), col("padded_tokens"),
          col("useful_tokens"),
          (expr("(2 * (padded_tokens - useful_tokens) * 1000000 + padded_tokens) " +
            "div (2 * padded_tokens)").cast("double") / 1000000.0).as("waste_frac"))
      val arrival = lens.withColumn("rn",
        row_number().over(Window.orderBy(col("doc_id"))).cast("long"))
      val sorted = lens.withColumn("rn",
        row_number().over(Window.orderBy(col("len"), col("doc_id"))).cast("long"))
      waste(arrival, "arrival").unionByName(waste(sorted, "length_sorted"))
        .orderBy("strategy")
    }),

    // Pareto frontier (skyline): parts no other part beats on both price
    // (min) and size (max). Two window passes — a range frame over
    // strictly-cheaper rows and a same-price partition max — instead of
    // the O(n²) dominance anti-join; the global order-by-price window is
    // a range-partitioned sort at scale
    "q213_pareto_frontier" -> ((s, dir) => {
      val p = Tables.part(s, dir).select(
        col("p_partkey"),
        centsOf(col("p_retailprice")).as("price_c"),
        col("p_size").cast("long").as("psize"))
      val wCheaper = Window.orderBy("price_c").rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy("price_c")
      p.withColumn("mx_cheaper", max(col("psize")).over(wCheaper))
        .withColumn("mx_same", max(col("psize")).over(wSame))
        .filter(!(coalesce(col("mx_cheaper") >= col("psize"), lit(false))
          || col("mx_same") > col("psize")))
        .select("p_partkey", "price_c", "psize")
        .orderBy("price_c", "p_partkey")
    }),

    // CUSUM change-point scan over daily revenue: S_t = Σ(x_i·N − T)
    // stays in exact integers (deviations scaled by the day count, no
    // mean division); the peak |S_t| marks the level-shift day. The
    // cumulative window runs on the DAILY relation (≤ a few k rows at
    // any corpus scale); decimal(38) needed beyond ~sf100
    "q214_cusum_changepoint" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
      val tot = daily.agg(
        count(lit(1)).as("nd"), sum(col("rev")).as("tot"))
      val c = daily.crossJoin(broadcast(tot))
        .withColumn("cusum",
          sum(col("rev") * col("nd") - col("tot"))
            .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      val mx = c.agg(max(abs(col("cusum"))).as("mx"))
      c.crossJoin(broadcast(mx))
        .select(col("day"), col("rev"), col("cusum"),
          when(abs(col("cusum")) === col("mx"), 1L).otherwise(0L).as("is_peak"))
        .orderBy("day")
    }),

    // positional phrase search: exact adjacent-bigram hit counts via the
    // codegen shingle expression — explode + equality filter, no
    // interpreted array lambdas; docs with zero hits drop out before the
    // aggregation
    "q215_phrase_match" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(graft.plans.WordShingles(col("text"), 2)).as("sh"))
        .filter(col("sh") === "hash join")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .orderBy(col("n_hits").desc, col("doc_id"))
        .limit(20)),

    // prefix-filtered similarity join (PPJoin family): exact-recall
    // Jaccard ≥ 0.6 candidates from a rarest-token prefix equi-join —
    // the LSH-free alternative when probabilistic misses are not
    // acceptable (e.g. legal decontamination)
    "q216_prefix_filter_join" -> ((s, dir) =>
      Dedup.prefixFilterPairs(Tables.documents(s, dir), "doc_id", "text")),

    // incremental aggregate maintenance: a stored per-customer MV (orders
    // before the cutover) merged with the delta partition's aggregate via
    // coalesce-sum full outer — only the delta is rescanned; oracled
    // against the full recompute, proving the merge is lossless
    "q217_incr_agg_maintain" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderdate"),
        centsOf(col("o_totalprice")).as("cents"))
      def agg(part: DataFrame): DataFrame = part.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"))
      val cut = lit("1998-01-01").cast("timestamp")
      val base = agg(o.filter(col("o_orderdate") < cut))
        .select(col("o_custkey"), col("n").as("bn"), col("rev").as("br"))
      val delta = agg(o.filter(col("o_orderdate") >= cut))
        .select(col("o_custkey"), col("n").as("dn"), col("rev").as("dr"))
      base.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
          (coalesce(col("br"), lit(0L)) + coalesce(col("dr"), lit(0L))).as("revenue_cents"))
        .orderBy("o_custkey")
    }),

    // pairwise source vocabulary overlap: top-20 terms per source by
    // frequency (word tie-break), Jaccard across the source grid — the
    // corpus-mixing diversity readout (near-identical vocabularies mean
    // the mixture adds volume, not coverage). S² pairs over a tiny
    // per-source top-k relation
    "q218_source_vocab_overlap" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w")
        .agg(count(lit(1)).as("tf"))
      val top = tf
        .withColumn("rn",
          row_number().over(Window.partitionBy("source").orderBy(col("tf").desc, col("w"))))
        .filter(col("rn") <= 20)
        .select("source", "w")
      val sizes = top.groupBy("source").agg(count(lit(1)).as("sz"))
      top.as("a").join(top.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("overlap"))
        .join(sizes.select(col("source").as("source_a"), col("sz").as("sa")), "source_a")
        .join(sizes.select(col("source").as("source_b"), col("sz").as("sb")), "source_b")
        .select(col("source_a"), col("source_b"), col("overlap"),
          round(col("overlap").cast("double") / (col("sa") + col("sb") - col("overlap")), 6)
            .as("jaccard"))
        .orderBy("source_a", "source_b")
    }),

    // k-anonymity audit over quasi-identifiers (nation, segment,
    // 1000-unit balance band): how many QI groups have < k members and
    // how many rows they expose — the privacy gate before releasing a
    // curated slice. One hash agg + one 1-row rollup
    "q219_k_anonymity" -> ((s, dir) => {
      val g = Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(centsOf(col("c_acctbal")) / 100000.0).cast("long").as("band"))
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("n"))
      g.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("rows_at_risk"),
        sum(col("n")).as("total_rows"))
        .select(col("n_groups"), col("n_violating"), col("rows_at_risk"), col("total_rows"),
          (expr("(2 * rows_at_risk * 1000000 + total_rows) div (2 * total_rows)")
            .cast("double") / 1000000.0).as("risk_frac"))
    }),

    // MMR diversified top-5: greedy relevance-vs-redundancy re-rank over
    // the embedding corpus (λ = 0.7), integer micro scores end-to-end
    "q220_mmr_rerank" -> ((s, dir) =>
      Similarity.mmrRerank(Tables.embeddings(s, dir), "vec_id", "embedding")),

    // hybrid retrieval: BM25 keyword ranking fused with dense cosine
    // ranking (query = doc 0's embedding) by reciprocal-rank fusion —
    // the two-tower readout every modern retrieval stack ships; each
    // ranking is bounded, fusion is a full outer join on doc_id
    "q221_hybrid_retrieval" -> ((s, dir) => {
      val sparse = operators.Retrieval
        .bm25Scores(Tables.documents(s, dir), "doc_id", "text",
          Seq("vector", "stream", "filter"))
        .filter(col("doc_id") =!= 0L)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      val dense = Similarity
        .bruteForceTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          nQueries = 1, k = Int.MaxValue)
        .select(col("neighbor_id").as("doc_id"), col("rk").as("rank"))
      operators.Retrieval.rrfFuse(sparse, dense, k = 10)
    }),

    // data-quality expectation suite: the contract checks a lakehouse
    // gate runs before promoting a partition — FK integrity (anti join),
    // null guard, range guard, key uniqueness — each one aggregate over
    // the same scan family, reported as (check, n_violations) rows
    "q222_dq_expectations" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val fk = o.join(c.select(col("c_custkey")), col("o_custkey") === col("c_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_custkey_missing").as("check"), col("n_violations"))
      val nullDate = o.filter(col("o_orderdate").isNull)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("null_orderdate").as("check"), col("n_violations"))
      val range = o.filter(col("o_totalprice") <= 0.0)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("nonpositive_totalprice").as("check"), col("n_violations"))
      val dupKey = o.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_violations"))
        .select(lit("dup_orderkey").as("check"), col("n_violations"))
      fk.unionByName(nullDate).unionByName(range).unionByName(dupKey)
        .orderBy("check")
    }),

    // day-of-week seasonal index of revenue: dow mean vs overall mean as
    // one exact half-away ppm division (index 1e6 = flat) — the
    // seasonality readout behind the q188 anomaly z-scores. 0 = Sunday
    // (DuckDB dayofweek convention; Spark's dayofweek() is 1-based)
    "q223_seasonal_index" -> ((s, dir) => {
      val d = Tables.orders(s, dir)
        .select((dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          centsOf(col("o_totalprice")).as("cents"))
      val byDow = d.groupBy("dow")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"))
      val tot = byDow.agg(sum(col("n")).as("tn"), sum(col("rev")).as("tr"))
      // products reach rev·tn·1e6 ≈ 10²³ at sf0.1 — decimal(38,0), not long
      byDow.crossJoin(broadcast(tot))
        .select(col("dow"), col("n"), col("rev"),
          expr("""CAST((2 * CAST(rev AS DECIMAL(38,0)) * tn * 1000000 + CAST(tr AS DECIMAL(38,0)) * n)
                 div (2 * CAST(tr AS DECIMAL(38,0)) * n) AS BIGINT)""").as("index_ppm"))
        .orderBy("dow")
    }),

    // weighted median price per return flag: the 50%-of-quantity price
    // point — a cumulative-weight window over the price order, median =
    // first price where 2·cumw ≥ total weight (exact integers, no
    // interpolation ambiguity)
    "q224_weighted_median" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          centsOf(col("l_extendedprice")).as("price_c"),
          round(col("l_quantity"), 0).cast("long").as("qty"))
        .groupBy("l_returnflag", "price_c")
        .agg(sum(col("qty")).as("w"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("l_returnflag")
      li.withColumn("cumw", sum(col("w")).over(wCum))
        .withColumn("totw", sum(col("w")).over(wTot))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy("l_returnflag")
        .agg(min(col("price_c")).as("median_price_c"), max(col("totw")).as("total_qty"))
        .orderBy("l_returnflag")
    }),

    // label propagation over the near-dup graph: two synchronous rounds
    // of neighbor-majority lang voting (self-vote included, ties to the
    // lexicographically smallest label) — the semi-supervised "fill in
    // missing metadata from duplicates" pass; each round is one edge
    // join + one (node, label) count + one rank
    "q225_label_propagation" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = Dedup.minhashCandidates(d, "doc_id", "text").select("doc_a", "doc_b")
      val und = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val init = d.select(col("doc_id").as("u"), col("lang").as("lbl"))
      def step(labels: DataFrame): DataFrame = {
        val votes = und
          .join(labels.select(col("u").as("v"), col("lbl")), "v")
          .select(col("u"), col("lbl"))
          .unionByName(labels.select(col("u"), col("lbl"))) // self-vote
          .groupBy("u", "lbl")
          .agg(count(lit(1)).as("c"))
        votes
          .withColumn("rn",
            row_number().over(Window.partitionBy("u").orderBy(col("c").desc, col("lbl"))))
          .filter(col("rn") === 1)
          .select(col("u"), col("lbl"))
      }
      val r2 = step(step(init))
      // report only nodes whose label CHANGED — the interesting output
      r2.join(init.select(col("u"), col("lbl").as("lbl0")), "u")
        .filter(col("lbl") =!= col("lbl0"))
        .select(col("u").as("doc_id"), col("lbl0").as("lang_before"),
          col("lbl").as("lang_after"))
        .orderBy("doc_id")
    }),

    // record-linkage by edit distance: block on (brand, name length) so the
    // candidate set is Σblock² not n², then exact Levenshtein (codegen'd
    // built-in) on survivors only — the classic cheap-key blocking +
    // expensive-verify shape; 25 closest pairs, total-order tie-break
    "q226_edit_blocking" -> ((s, dir) => {
      val b = Tables.part(s, dir).select(
        col("p_partkey").as("k"), col("p_brand"),
        length(col("p_name")).as("ln"), col("p_name"))
      val lhs = b.select(col("k").as("part_a"), col("p_brand").as("brand"),
        col("ln"), col("p_name").as("name_a"))
      val rhs = b.select(col("k").as("part_b"), col("p_brand").as("brand_b"),
        col("ln").as("ln_b"), col("p_name").as("name_b"))
      lhs.join(rhs, col("brand") === col("brand_b") && col("ln") === col("ln_b")
          && col("part_a") < col("part_b"))
        .select(col("part_a"), col("part_b"), col("brand"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .orderBy(col("dist"), col("part_a"), col("part_b")).limit(25)
    }),

    // small-file compaction planner: the file manifest is (source, shard)
    // sizes — 3 orders of magnitude smaller than the data — so the
    // global-order cumulative window runs on the manifest only; files pack
    // greedily into 16 KiB target bins by descending size (a file joins the
    // bin its cumulative START falls in — pure integer floor division)
    "q227_compaction_plan" -> ((s, dir) => {
      val files = Tables.documents(s, dir)
        .groupBy(col("source"), (col("doc_id") % 16).as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
      val w = Window.orderBy(col("bytes").desc, col("source"), col("shard"))
        .rowsBetween(Window.unboundedPreceding, 0)
      files.withColumn("cum", sum(col("bytes")).over(w))
        .withColumn("bin", expr("(cum - bytes) div 16384"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_files"), sum(col("n_docs")).as("n_docs"),
          sum(col("bytes")).as("total_bytes"), max(col("bytes")).as("max_file_bytes"))
        .withColumn("fill_ppm", expr("total_bytes * 1000000 div 16384"))
        .select("bin", "n_files", "n_docs", "total_bytes", "max_file_bytes", "fill_ppm")
        .orderBy("bin")
    }),

    // Benford first-digit audit on order totals: leading digit read from
    // the exact cents integer (no float log10), observed share vs the
    // Benford expectation as ppm constants inlined identically in the
    // oracle; LEFT join keeps absent digits as zero rows
    "q228_benford_audit" -> ((s, dir) => {
      import s.implicits._
      val benford = Seq(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
        4L -> 96910L, 5L -> 79181L, 6L -> 66947L, 7L -> 57992L,
        8L -> 51153L, 9L -> 45757L).toDF("digit", "benford_ppm")
      val n = Tables.orders(s, dir)
        .select(substring(centsOf(col("o_totalprice")).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = n.agg(sum(col("n")).as("tot"))
      broadcast(benford).join(n, Seq("digit"), "left").na.fill(0L, Seq("n"))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div tot").as("actual_ppm"),
          col("benford_ppm"),
          expr("n * 1000000 div tot - benford_ppm").as("delta_ppm"))
        .orderBy("digit")
    }),

    // association rules over per-order brand baskets: one shuffle on the
    // basket key for the pair counts, per-item counts broadcast back, and
    // support/confidence/lift in exact ppm integers; min-support 20 prunes
    // the rule set before the top-25-by-lift readout
    "q229_assoc_rules" -> ((s, dir) => {
      val ob = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct()
        // multiple consumers (per-brand counts, totals, both sides of the
        // pair self-join) — materialize the distinct basket relation once
        .localCheckpoint(false)
      val ni = ob.groupBy("b").agg(count(lit(1)).as("n"))
      val nn = ob.agg(countDistinct(col("o")).as("total"))
      val pr = ob.as("a").join(ob.as("c"), col("a.o") === col("c.o") && col("a.b") =!= col("c.b"))
        .groupBy(col("a.b").as("ante"), col("c.b").as("cons"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 20)
      pr.join(broadcast(ni.select(col("b").as("ante"), col("n").as("n_a"))), "ante")
        .join(broadcast(ni.select(col("b").as("cons"), col("n").as("n_c"))), "cons")
        .crossJoin(broadcast(nn))
        .select(col("ante"), col("cons"), col("n_ab"),
          expr("n_ab * 1000000 div n_a").as("conf_ppm"),
          expr("n_ab * total * 1000000 div (n_a * n_c)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("ante"), col("cons")).limit(25)
    }),

    // stationary distribution of the q118 transition matrix: three exact
    // integer power-iteration steps from the uniform ppm vector — the
    // 25-row matrix is localCheckpoint'd once so the iteration never
    // re-runs the event window; per-term floor division (π_i·n_ij div n_i)
    // keeps both engines bit-identical with no float accumulation
    "q230_markov_stationary" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trt = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type").as("e"))
        .withColumn("nxt", lead(col("e"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("e").as("i"), col("nxt").as("j"))
        .agg(count(lit(1)).as("n"))
        .withColumn("ni", sum(col("n")).over(Window.partitionBy("i")))
        .localCheckpoint()
      val p0 = trt.select(col("i").as("state")).distinct()
        .withColumn("pi", lit(200000L))
      def step(p: DataFrame): DataFrame =
        trt.join(p.withColumnRenamed("state", "i"), "i")
          .groupBy(col("j").as("state"))
          .agg(sum(expr("pi * n div ni")).as("pi"))
      val p3 = step(step(step(p0)))
      p3.join(trt.select(col("i").as("state"), col("ni").as("n_out")).distinct(), "state")
        .select(col("state"), col("n_out"), col("pi").as("pi_ppm"))
        .orderBy("state")
    }),

    // z-order (Morton) layout audit: interleave 4-bit (custkey bucket,
    // month bucket) into an 8-bit z-value per order, then measure range-scan
    // precision for three query boxes against the corner-z bounds (spread()
    // is monotone, so corner bounds are valid but loose for unaligned
    // boxes) — one conditional-aggregation pass, no join, unpivoted by stack
    "q231_zorder_layout" -> ((s, dir) => {
      val zed = Tables.orders(s, dir).select(
        (col("o_custkey") % 16).cast("long").as("x"),
        (((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) - lit(1995 * 12 + 1)) % 16)
          .cast("long").as("y"))
        .withColumn("z", expr(
          "(x & 1) + 2 * (y & 1) + 4 * (shiftright(x, 1) & 1) + 8 * (shiftright(y, 1) & 1)" +
            " + 16 * (shiftright(x, 2) & 1) + 32 * (shiftright(y, 2) & 1)" +
            " + 64 * (shiftright(x, 3) & 1) + 128 * (shiftright(y, 3) & 1)"))
      zed.agg(
          sum(when(col("z").between(0, 63), 1L).otherwise(0L)).as("s1"),
          sum(when(col("x").between(0, 7) && col("y").between(0, 7), 1L).otherwise(0L)).as("h1"),
          sum(when(col("z").between(16, 31), 1L).otherwise(0L)).as("s2"),
          sum(when(col("x").between(4, 7) && col("y").between(0, 3), 1L).otherwise(0L)).as("h2"),
          sum(when(col("z").between(13, 198), 1L).otherwise(0L)).as("s3"),
          sum(when(col("x").between(3, 10) && col("y").between(2, 9), 1L).otherwise(0L)).as("h3"))
        .selectExpr("stack(3, 1L, s1, h1, 2L, s2, h2, 3L, s3, h3) AS (box_id, scanned, hits)")
        .withColumn("precision_ppm", expr("hits * 1000000 div scanned"))
        .orderBy("box_id")
    }),

    // Welch's two-sample t on account balances (AUTOMOBILE vs BUILDING):
    // count / sum / sum-of-squares in exact cents integers, the t statistic
    // assembled in one double expression written identically in the oracle
    // (same IEEE operation order), rounded at the end only
    "q232_welch_ttest" -> ((s, dir) => {
      val cents = centsOf(col("c_acctbal"))
      val g = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"),
          sum(cents.cast(dec38)).as("s"),
          sum((cents * cents).cast(dec38)).as("ss"))
      val a = g.filter(col("seg") === "AUTOMOBILE")
        .select(col("n").as("n_a"), col("s").as("s_a"), col("ss").as("ss_a"))
      val b = g.filter(col("seg") === "BUILDING")
        .select(col("n").as("n_b"), col("s").as("s_b"), col("ss").as("ss_b"))
      a.crossJoin(broadcast(b)).selectExpr(
        "n_a", "n_b",
        "round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0, 6) AS mean_a",
        "round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0, 6) AS mean_b",
        "round((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / " +
          "sqrt((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))" +
          " / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) + " +
          "(CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))" +
          " / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))), 6) AS t_stat")
    }),

    // Flesch-style readability per language: word / vowel-group / sentence
    // counts via codegen'd regexp_count (identical regex semantics in
    // DuckDB's regexp_extract_all), score in exact milli units with corpus
    // totals — sentence count floors at 1 so fragment-only docs don't
    // divide by zero
    "q233_readability" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          regexp_count(col("text"), lit("[A-Za-z0-9]+")).cast("long").as("words"),
          regexp_count(col("text"), lit("[aeiouAEIOU]+")).cast("long").as("syll"),
          greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L)).as("sents"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("words"),
          sum(col("syll")).as("syllables"), sum(col("sents")).as("sentences"))
        .withColumn("flesch_milli",
          expr("206835 - 1015 * words div sentences - 84600 * syllables div words"))
        .orderBy("lang")),

    // functional-dependency profiling (the discovery side of data-quality
    // rules): for three candidate FDs A→B, group (A,B) counts roll up to
    // per-A (total, max, #distinct B), and the FD's support is the exact
    // fraction of rows kept under majority repair — each FD is one narrow
    // two-level aggregation, unioned at 3 rows
    "q234_fd_profile" -> ((s, dir) => {
      def fd(df: DataFrame, name: String, a: Column, b: Column): DataFrame =
        df.select(a.cast("string").as("a"), b.cast("string").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n"))
          .groupBy("a").agg(sum(col("n")).as("tot"), max(col("n")).as("mx"),
            count(lit(1)).as("nb"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("nb") > 1, 1L).otherwise(0L)).as("violating_groups"),
            expr("sum(mx) * 1000000 div sum(tot)").as("support_ppm"))
          .select(lit(name).as("fd"), col("n_groups"), col("violating_groups"),
            col("support_ppm"))
      fd(Tables.part(s, dir), "part: p_brand -> p_type", col("p_brand"), col("p_type"))
        .unionByName(fd(Tables.lineitem(s, dir), "lineitem: l_partkey -> l_suppkey",
          col("l_partkey"), col("l_suppkey")))
        .unionByName(fd(Tables.customer(s, dir), "customer: c_nationkey -> c_mktsegment",
          col("c_nationkey"), col("c_mktsegment")))
        .orderBy("fd")
    }),

    // Theil-Sen robust slope of retail price vs size per brand: all
    // distinct-size pairs generated map-side against the broadcast dim
    // (no shuffle for pair generation), slope as a half-away-rounded
    // milli integer (sign split keeps floor semantics engine-identical),
    // lower median by rank — outlier-resistant vs the q139 OLS
    "q235_theilsen_slope" -> ((s, dir) => {
      val p = Tables.part(s, dir).select(col("p_brand"),
        col("p_size").cast("long").as("x"), centsOf(col("p_retailprice")).as("y"))
      // the single-file dim arrives as ONE partition — spread the probe
      // side so the O(n²/brand) pair generation uses every core
      val pairs = p.repartition(col("p_brand"), col("x")).as("a")
        .join(broadcast(p.as("b")),
          col("a.p_brand") === col("b.p_brand") && col("a.x") < col("b.x"))
        .select(col("a.p_brand").as("p_brand"),
          // outer x-guard: predicate pushdown may evaluate this expression
          // alongside (not after) the a.x < b.x join residual — under ANSI
          // an unguarded div would throw on the x-equal rows it never keeps
          expr("CASE WHEN (b.x - a.x) <= 0 THEN NULL" +
            " WHEN (b.y - a.y) >= 0" +
            " THEN (2 * (b.y - a.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))" +
            " ELSE -((2 * (a.y - b.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))) END")
            .as("slope_milli"))
      // per-brand pair counts in CLOSED FORM from the (brand, size)
      // histogram — n = (T² − Σc²)/2 — so the multi-million-row pair
      // relation is generated once (for the median window), not twice;
      // the count-over-partition variant additionally sorted it twice
      val nc = p.groupBy(col("p_brand"), col("x")).agg(count(lit(1)).as("c"))
        .groupBy("p_brand")
        .agg(expr("(sum(c) * sum(c) - sum(c * c)) div 2").as("n"))
      // two-pass exact median (the q299 histogram trick): pass 1 bins the
      // pair relation (hash agg, map-side combine — no sort), the cumsum
      // locates each brand's median bin, pass 2 regenerates the pairs but
      // sorts ONLY the median bin's rows (~1/bins of the relation). Pair
      // generation is a map-side broadcast join, so generating twice is
      // far cheaper than one full per-brand sort of the 8M-row relation.
      val hist = pairs
        .groupBy(col("p_brand"), expr("slope_milli div 256").as("bin"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cb", coalesce(sum(col("c")).over(
          Window.partitionBy("p_brand").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tb = hist.join(broadcast(nc), "p_brand")
        .filter(col("cb") < expr("(n + 1) div 2") &&
          col("cb") + col("c") >= expr("(n + 1) div 2"))
        .select(col("p_brand"), col("bin"), (expr("(n + 1) div 2") - col("cb")).as("off"),
          col("n"))
      pairs
        .join(broadcast(tb),
          pairs("p_brand") === tb("p_brand") && expr("slope_milli div 256") === tb("bin"))
        .drop(tb("p_brand"))
        .withColumn("rn", row_number().over(Window.partitionBy("p_brand").orderBy("slope_milli")))
        .filter(col("rn") === col("off"))
        .groupBy("p_brand")
        .agg(max(col("n")).as("n_pairs"), min(col("slope_milli")).as("median_slope_milli"))
        .orderBy("p_brand")
    }),

    // TPC-H Q11 shape — "important stock": per-part lineitem value vs a
    // scalar grand-total threshold (value > tot/2000), the HAVING-against-
    // subquery pattern; one fact aggregation + bounded 1-row cross join
    "q236_important_parts" -> ((s, dir) => {
      val pv = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("value_c"))
      val t = pv.agg(sum(col("value_c").cast(dec38)).as("tot"))
      pv.join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
          col("p_partkey") === col("l_partkey"))
        .crossJoin(broadcast(t))
        .filter(expr("CAST(value_c AS DECIMAL(38,0)) * 2000 > tot"))
        .select(col("l_partkey").as("partkey"), col("p_brand").as("brand"), col("value_c"))
        .orderBy(col("value_c").desc, col("partkey")).limit(25)
    }),

    // TPC-H Q2 shape — min-cost supplier: per-(part, supplier) exact unit
    // cost (floor cents), the per-part minimum via a keyed window (the
    // correlated-subquery pattern as a partitioned min), winners joined to
    // the broadcast supplier→nation dims
    "q237_min_cost_supplier" -> ((s, dir) => {
      val ps = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("sc"),
          sum(round(col("l_quantity"), 0).cast("long")).as("sq"))
        .filter(col("sq") > 0)
        .withColumn("unit_c", expr("sc div sq"))
        .withColumn("min_unit_c", min(col("unit_c")).over(Window.partitionBy("pk")))
        .filter(col("unit_c") === col("min_unit_c"))
      ps.join(broadcast(Tables.supplier(s, dir)
            .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
          col("s_suppkey") === col("sk"))
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("pk").as("partkey"), col("sk").as("suppkey"), col("s_name"),
          col("n_name").as("nation"), col("unit_c"))
        .orderBy(col("unit_c"), col("partkey"), col("suppkey")).limit(25)
    }),

    // robust-outlier ensemble on per-customer total spend per segment
    // (heavy-tailed, unlike the uniform balances): three detectors vote —
    // Tukey-fence IQR, 3·1.4826·MAD, and a 2.5σ z-test from exact decimal
    // moments (the σ comparison squared into integers, no sqrt) — a row is
    // an ensemble outlier on ≥2 votes; two ranked window passes (values,
    // then deviations) + broadcast 5-row stats
    "q238_outlier_ensemble" -> ((s, dir) => {
      val c = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_mktsegment")),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("c_custkey").as("k"))
        .agg(sum(centsOf(col("o_totalprice"))).as("x"))
        .select(col("seg"), col("x"), col("k"))
      val wv = Window.partitionBy("seg").orderBy(col("x"), col("k"))
      val ranked = c.withColumn("rn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("seg")))
      val med = ranked.filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("seg"), col("x").as("med"))
      val q1 = ranked.filter(col("rn") === expr("greatest(1, n div 4)"))
        .select(col("seg"), col("x").as("q1"))
      val q3 = ranked.filter(col("rn") === expr("(3 * n) div 4"))
        .select(col("seg"), col("x").as("q3"))
      val dev = c.join(broadcast(med), "seg").withColumn("d", abs(col("x") - col("med")))
      val wd = Window.partitionBy("seg").orderBy(col("d"), col("k"))
      val mad = dev.withColumn("rn", row_number().over(wd))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("seg")))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("seg"), col("d").as("mad"))
      val mom = c.groupBy("seg").agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec38)).as("s"), sum((col("x") * col("x")).cast(dec38)).as("ss"))
      c.join(broadcast(med), "seg").join(broadcast(q1), "seg").join(broadcast(q3), "seg")
        .join(broadcast(mad), "seg").join(broadcast(mom), "seg")
        .select(col("seg"),
          expr("CASE WHEN 2 * x < 2 * q1 - 3 * (q3 - q1) OR 2 * x > 2 * q3 + 3 * (q3 - q1)" +
            " THEN 1L ELSE 0L END").as("f_iqr"),
          expr("CASE WHEN abs(x - med) * 10000 > 44478 * mad THEN 1L ELSE 0L END").as("f_mad"),
          expr("CASE WHEN 4 * (CAST(x AS DECIMAL(38,0)) * n - s)" +
            " * (CAST(x AS DECIMAL(38,0)) * n - s) * (n - 1)" +
            " > 25 * n * (n * ss - s * s) THEN 1L ELSE 0L END").as("f_z"))
        .withColumn("f_ens", when(col("f_iqr") + col("f_mad") + col("f_z") >= 2, 1L).otherwise(0L))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), sum(col("f_iqr")).as("out_iqr"),
          sum(col("f_mad")).as("out_mad"), sum(col("f_z")).as("out_z"),
          sum(col("f_ens")).as("out_ensemble"))
        .orderBy("seg")
    }),

    // ABC (Pareto) revenue classification: rank parts by revenue, cumulative
    // share against the grand total (exact integer comparisons at the 70/90
    // boundaries), per-class rollup — the window runs on the per-part
    // aggregate (|parts| rows), never the fact table
    "q239_abc_classification" -> ((s, dir) => {
      val pv = Tables.lineitem(s, dir).groupBy(col("l_partkey"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("rev"))
      val wc = Window.orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      pv.withColumn("cum", sum(col("rev")).over(wc))
        .withColumn("tot", sum(col("rev")).over(Window.partitionBy()))
        .withColumn("cls", expr("CASE WHEN cum * 10 <= tot * 7 THEN 'A'" +
          " WHEN cum * 10 <= tot * 9 THEN 'B' ELSE 'C' END"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("revenue_c"),
          expr("CAST(CAST(sum(rev) AS DECIMAL(38,0)) * 1000000 div max(tot) AS BIGINT)")
            .as("share_ppm"))
        .orderBy("cls")
    }),

    // rolling 3-month revenue per nation with a bounded RANGE frame over
    // the month index — the time-range window frame (not ROWS: missing
    // months must not widen the lookback); runs on the (nation, month)
    // aggregate
    "q240_rolling_revenue" -> ((s, dir) => {
      val m = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name").as("nation"),
          ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) - lit(1995 * 12 + 1))
            .cast("long").as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
      m.withColumn("rolling3_rev", sum(col("rev")).over(
          Window.partitionBy("nation").orderBy("mi").rangeBetween(-2, 0)))
        .orderBy("nation", "mi")
    }),

    // TPC-H Q12 shape — shipping-delay buckets × priority class: 30-day
    // delay bucket via `div` (truncation toward zero — exactly DuckDB's
    // integer `//`, including negative early-ship deltas), high/low
    // priority counted in one conditional-aggregation pass over the join
    "q241_delay_priority" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .withColumn("d", datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
        .groupBy(expr("d div 30").as("delay_bucket"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy("delay_bucket")),

    // 2-core decomposition of the near-dup graph by iterative peeling
    // (3 unrolled rounds): drop nodes with degree < 2, restrict edges to
    // survivors, repeat — the LSH candidate edges are localCheckpoint'd
    // once so no peel re-runs the signature join; per-round (nodes, edges)
    // readout shows convergence
    "q242_kcore" -> ((s, dir) => {
      val e0 = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_a").as("u"), col("doc_b").as("v")).localCheckpoint()
      def degs(e: DataFrame): DataFrame =
        e.select(col("u")).unionByName(e.select(col("v").as("u")))
          .groupBy("u").agg(count(lit(1)).as("c"))
      def peel(e: DataFrame): DataFrame = {
        val keep = degs(e).filter(col("c") >= 2).select("u")
        e.join(keep.withColumnRenamed("u", "ku"), col("u") === col("ku")).drop("ku")
          .join(keep.withColumnRenamed("u", "kv"), col("v") === col("kv")).drop("kv")
      }
      val e1 = peel(e0).localCheckpoint()
      val e2 = peel(e1).localCheckpoint()
      val e3 = peel(e2).localCheckpoint()
      def row(r: Long, nodes: DataFrame, edges: DataFrame): DataFrame =
        nodes.agg(count(lit(1)).as("nodes"))
          .crossJoin(edges.agg(count(lit(1)).as("edges")))
          .select(lit(r).as("round"), col("nodes"), col("edges"))
      row(0L, degs(e0), e0)
        .unionByName(row(1L, degs(e0).filter(col("c") >= 2), e1))
        .unionByName(row(2L, degs(e1).filter(col("c") >= 2), e2))
        .unionByName(row(3L, degs(e2).filter(col("c") >= 2), e3))
        .orderBy("round")
    }),

    // the dataset card in one pass: per source — docs, languages, whitespace
    // tokens, mean length, exact-dup rate, long-doc share, all exact ppm
    // integers; this is the datasheet rollup a curation run publishes
    "q243_dataset_card" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(size(split(col("text"), " ", -1)).cast("long")).as("ws_tokens"),
          expr("sum(n_chars) * 1000000 div count(1)").as("mean_chars_ppm"),
          ((count(lit(1)) - countDistinct(md5(col("text").cast("binary")))) * 1000000L)
            .as("_dup_scaled"),
          (sum(when(col("n_chars") >= 200, 1L).otherwise(0L)) * 1000000L).as("_long_scaled"))
        .select(col("source"), col("n_docs"), col("n_langs"), col("ws_tokens"),
          col("mean_chars_ppm"),
          expr("_dup_scaled div n_docs").as("dup_ppm"),
          expr("_long_scaled div n_docs").as("long_ppm"))
        .orderBy("source")),

    // Markov removal-effect attribution: conversion reach = probability of
    // hitting 'purchase' within 3 transitions from 'view', computed by
    // integer backward induction over the localCheckpoint'd transition
    // matrix (per-term floor division, no float accumulation); each
    // channel's effect = base reach minus reach with that channel's edges
    // deleted — the fair-credit alternative to last-touch (q164)
    "q244_removal_effect" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trt = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type").as("e"))
        .withColumn("nxt", lead(col("e"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("e").as("i"), col("nxt").as("j"))
        .agg(count(lit(1)).as("n"))
        .withColumn("ni", sum(col("n")).over(Window.partitionBy("i")))
        .localCheckpoint()
      def reach(removed: Option[String]): DataFrame = {
        val tr2 = removed.map(r => trt.filter(col("i") =!= r && col("j") =!= r)).getOrElse(trt)
        var h: Option[DataFrame] = None
        for (_ <- 1 to 3) {
          val joined = h match {
            case None => tr2.withColumn("hv", lit(0L))
            case Some(hp) =>
              tr2.join(broadcast(hp.select(col("state").as("j"), col("hv"))), Seq("j"), "left")
                .na.fill(0L, Seq("hv"))
          }
          h = Some(joined
            .withColumn("v", when(col("j") === "purchase", lit(1000000L)).otherwise(col("hv")))
            .groupBy(col("i").as("state"))
            .agg(sum(expr("v * n div ni")).as("hv")))
        }
        h.get.filter(col("state") === "view")
          .agg(coalesce(sum(col("hv")), lit(0L)).as("reach3_ppm"))
          .withColumn("removed", lit(removed.getOrElse("none")))
      }
      val v = Seq(None, Some("click"), Some("error"), Some("signup"), Some("view"))
        .map(reach).reduce(_ unionByName _)
      val base = v.filter(col("removed") === "none").select(col("reach3_ppm").as("base"))
      v.crossJoin(broadcast(base))
        .select(col("removed"), col("reach3_ppm"),
          (col("base") - col("reach3_ppm")).as("effect_ppm"))
        .orderBy("removed")
    }),

    // lag-1 autocorrelation of the daily revenue series: the lag window
    // runs on the 2.4k-row daily aggregate, moments accumulate in exact
    // decimal, and the Pearson ratio is one double expression written
    // identically in the oracle
    "q245_revenue_autocorr" -> ((s, dir) => {
      val d = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
          .cast("long").as("day"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
      val p = d.withColumn("prev", lag(col("rev"), 1).over(Window.orderBy("day")))
        .filter(col("prev").isNotNull)
      p.agg(count(lit(1)).as("n"),
          sum(col("rev").cast(dec38)).as("sx"), sum(col("prev").cast(dec38)).as("sy"),
          sum((col("rev").cast(dec38) * col("prev"))).as("sxy"),
          sum((col("rev").cast(dec38) * col("rev"))).as("sxx"),
          sum((col("prev").cast(dec38) * col("prev"))).as("syy"))
        .selectExpr("n",
          "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
            "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
            "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf1")
    }),

    // Simpson's-paradox audit: the sign of cov(size, price) overall vs
    // within each brand — counts of agreeing and flipped groups; all sign
    // tests on exact decimal covariance numerators, no division anywhere
    "q246_simpsons_flip" -> ((s, dir) => {
      val src = Tables.part(s, dir).select(col("p_brand"),
        col("p_size").cast("long").as("x"), centsOf(col("p_retailprice")).as("y"))
      def mom(df: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
        df.agg(count(lit(1)).cast(dec38).as("n"),
          sum(col("x").cast(dec38)).as("sx"), sum(col("y").cast(dec38)).as("sy"),
          sum(col("x").cast(dec38) * col("y")).as("sxy"))
      val g = mom(src.groupBy("p_brand"))
        .withColumn("sgn", expr("CASE WHEN n * sxy - sx * sy > 0 THEN 1L" +
          " WHEN n * sxy - sx * sy < 0 THEN -1L ELSE 0L END"))
      val o = mom(src.groupBy())
        .select(expr("CASE WHEN n * sxy - sx * sy > 0 THEN 1L" +
          " WHEN n * sxy - sx * sy < 0 THEN -1L ELSE 0L END").as("osgn"))
      g.crossJoin(broadcast(o))
        .groupBy(col("osgn").as("overall_sign"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("sgn") === col("osgn"), 1L).otherwise(0L)).as("n_agree"),
          sum(when(col("sgn") === -col("osgn"), 1L).otherwise(0L)).as("n_flipped"))
    }),

    // customer order journey via the full-frame window trio: first_value /
    // last_value / nth_value over each customer's date-ordered orders
    // (explicit unbounded-following frame — the default frame would make
    // last_value the current row); one row per customer, rn=1 readout
    "q247_order_journey" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          centsOf(col("o_totalprice")).as("total_c"))
        .withColumn("first_dt", first(col("o_orderdate")).over(w))
        .withColumn("last_dt", last(col("o_orderdate")).over(w))
        .withColumn("second_total_c", nth_value(col("total_c"), 2).over(w))
        .withColumn("n_orders", count(lit(1)).over(Window.partitionBy("o_custkey")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))))
        .filter(col("rn") === 1)
        .select(col("o_custkey").as("custkey"),
          datediff(col("last_dt"), col("first_dt")).cast("long").as("span_days"),
          coalesce(col("second_total_c"), lit(0L)).as("second_total_c"),
          col("n_orders"))
        .orderBy("custkey").limit(50)
    }),

    // damped weighted PageRank over the brand co-purchase graph: edge
    // weights = co-basket counts, three integer power-iteration steps
    // (teleport and transfer both per-term floor divisions, d = 85/100),
    // the 600-row weighted edge list localCheckpoint'd once — the
    // commerce-graph twin of q131's unweighted dup-graph PageRank
    "q248_weighted_pagerank" -> ((s, dir) => {
      // per-order brand sets are bounded (≤ 7 lines/order), so edge
      // generation goes map-side from collect_set arrays (the q45 PMI
      // rewrite): ONE shuffle on orderkey replaces the distinct + self-
      // join + pair-shuffle chain — same (u,v,w) relation, same oracle
      val ob = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_orderkey").as("o"))
        .agg(collect_set(col("p_brand")).as("bs"))
      val pr0 = ob
        .select(explode(col("bs")).as("u"), col("bs"))
        .select(col("u"), explode(col("bs")).as("v"))
        .filter(col("u") =!= col("v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).as("w"))
      val wt = pr0.groupBy("u").agg(sum(col("w")).as("wu"))
      val base = pr0.join(wt, "u").localCheckpoint()
      val nAgg = wt.agg(count(lit(1)).as("nn"))
      var p: DataFrame = null
      for (_ <- 1 to 3) {
        val withPr =
          if (p == null) base.crossJoin(broadcast(nAgg)).withColumn("pin", expr("1000000 div nn"))
          else base.join(broadcast(p.select(col("state").as("u"), col("pr").as("pin"))), "u")
            .crossJoin(broadcast(nAgg))
        p = withPr.groupBy(col("v").as("state"))
          .agg((expr("(15 * 1000000) div (100 * max(nn))")
            + sum(expr("(85 * pin * w) div (100 * wu)"))).as("pr"))
      }
      p.select(col("state").as("brand"), col("pr").as("pr_ppm"))
        .orderBy(col("pr_ppm").desc, col("brand")).limit(25)
    }),

    // mutual information between language and source: each cell's
    // p·ln(p/(pq)) contribution quantized to 1e-9 nats (single ln + round
    // per cell — the q101 JSD discipline), summed exactly; near-zero MI
    // here is itself the finding (lang ⟂ source in this corpus)
    "q249_mutual_information" -> ((s, dir) => {
      val j = Tables.documents(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("c"))
      val nl = j.groupBy("lang").agg(sum(col("c")).as("cl"))
      val ns = j.groupBy("source").agg(sum(col("c")).as("cs"))
      val nt = j.agg(sum(col("c")).as("n"))
      j.join(broadcast(nl), "lang").join(broadcast(ns), "source")
        .crossJoin(broadcast(nt))
        .select(col("n"), expr(
          "CAST(round((CAST(c AS DOUBLE) / n)" +
            " * ln((CAST(c AS DOUBLE) * n) / (CAST(cl AS DOUBLE) * cs)) * 1000000000) AS BIGINT)")
          .as("t9"))
        .groupBy()
        .agg(max(col("n")).as("n_docs"), sum(col("t9")).as("mi_nano"),
          round(sum(col("t9")).cast("double") / 1000000000, 6).as("mi_nats"))
    }),

    // item-item cosine similarity from co-purchase counts — the
    // collaborative-filtering neighbor score n_ab/√(n_a·n_b) (vs q229's
    // lift: cosine is symmetric and popularity-normalized); one basket
    // shuffle, per-item counts broadcast, single rounded double per pair
    "q250_item_similarity" -> ((s, dir) => {
      val ob = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct()
        // multiple consumers (per-brand counts, totals, both sides of the
        // pair self-join) — materialize the distinct basket relation once
        .localCheckpoint(false)
      val ni = ob.groupBy("b").agg(count(lit(1)).as("n"))
      val pr = ob.as("a").join(ob.as("c"), col("a.o") === col("c.o") && col("a.b") < col("c.b"))
        .groupBy(col("a.b").as("ba"), col("c.b").as("bb"))
        .agg(count(lit(1)).as("n_ab"))
      pr.join(broadcast(ni.select(col("b").as("ba"), col("n").as("na"))), "ba")
        .join(broadcast(ni.select(col("b").as("bb"), col("n").as("nb"))), "bb")
        .select(col("ba"), col("bb"), col("n_ab"),
          round(col("n_ab").cast("double")
            / sqrt(col("na").cast("double") * col("nb").cast("double")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("ba"), col("bb")).limit(25)
    }),

    // inverse-propensity reweighting after a biased downsample: English
    // kept at 100%, other languages md5-thinned to 25%, then each
    // language's count re-inflated by its inverse keep-rate — the exact
    // ppm error readout proves the estimator recenters (sampling error
    // only, no bias); the downsample test is pure integer on 48-bit
    // md5 uniforms
    "q251_ipw_reweight" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val d = docs.select(col("lang"),
        Dedup.md5Long(concat(lit("ipw#"), col("doc_id").cast("string")), 12).as("u"))
      val samp = d.filter(col("lang") === "en" || col("u") * 4 < 281474976710656L)
        .groupBy("lang").agg(count(lit(1)).as("n_samp"))
      val full = docs.groupBy("lang").agg(count(lit(1)).as("n_full"))
      full.join(samp, Seq("lang"), "left").na.fill(0L, Seq("n_samp"))
        .select(col("lang"), col("n_full"), col("n_samp").as("n_sample"),
          expr("n_samp * (CASE WHEN lang = 'en' THEN 1 ELSE 4 END)").as("ipw_est"),
          expr("(n_samp * (CASE WHEN lang = 'en' THEN 1 ELSE 4 END) - n_full) * 1000000" +
            " div n_full").as("err_ppm"))
        .orderBy("lang")
    }),

    // ordered aggregation without array-order hazards: top-3 brands per
    // nation pivoted through rank-gated conditional MAXes (rn is unique
    // per nation, so each MAX sees exactly one non-null) — the star join
    // broadcasts every dim, lineitem ⋈ orders is the only shuffle
    "q252_top_brands_agg" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("n_name").as("nation"), col("p_brand").as("brand"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("rev"))
      rev.withColumn("rn",
          row_number().over(Window.partitionBy("nation").orderBy(col("rev").desc, col("brand"))))
        .groupBy("nation")
        .agg(max(when(col("rn") === 1, col("brand"))).as("top1"),
          max(when(col("rn") === 2, col("brand"))).as("top2"),
          max(when(col("rn") === 3, col("brand"))).as("top3"),
          sum(when(col("rn") <= 3, col("rev")).otherwise(0L)).as("top3_rev_c"))
        .orderBy("nation")
    }),

    // cross-session handoff matrix: how a user's NEXT session opens given
    // how the previous one closed — q36's gap sessionization inline, each
    // session's first/last event by min/max over (ts, event_id, type)
    // structs (total order), then one lag over the per-user session
    // sequence; all windows partition by user
    "q253_session_handoff" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val sx = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("is_new",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
            .when(lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("sess", sum(col("is_new")).over(w))
      val ses = sx.groupBy("user_id", "sess")
        .agg(
          min(struct(col("us"), col("event_id").as("eid"), col("event_type").as("et"))).as("fst"),
          max(struct(col("us"), col("event_id").as("eid"), col("event_type").as("et"))).as("lst"))
      ses.select(col("user_id"), col("sess"),
          col("fst.et").as("first_et"), col("lst.et").as("last_et"))
        .withColumn("prev_last",
          lag(col("last_et"), 1).over(Window.partitionBy("user_id").orderBy("sess")))
        .filter(col("prev_last").isNotNull)
        .groupBy(col("prev_last").as("from_type"), col("first_et").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // Kendall tau-b concordance of size vs price per brand: all key-ordered
    // pairs generated against the broadcast dim, concordant/discordant/tie
    // counts as exact integers, tau-b's tie-corrected denominator the only
    // double (one sqrt, rounded) — the pair-counting complement to q205's
    // Spearman and q235's Theil-Sen
    "q254_kendall_tau" -> ((s, dir) => {
      val p = Tables.part(s, dir).select(col("p_partkey").as("k"), col("p_brand"),
        col("p_size").cast("long").as("x"), centsOf(col("p_retailprice")).as("y"))
      p.as("a").join(broadcast(p.as("b")),
          col("a.p_brand") === col("b.p_brand") && col("a.k") < col("b.k"))
        .select(col("a.p_brand").as("p_brand"),
          expr("CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1L ELSE 0L END").as("con"),
          expr("CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1L ELSE 0L END").as("dis"),
          expr("CASE WHEN b.x = a.x THEN 1L ELSE 0L END").as("tx"),
          expr("CASE WHEN b.y = a.y THEN 1L ELSE 0L END").as("ty"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_pairs"), sum(col("con")).as("concordant"),
          sum(col("dis")).as("discordant"), sum(col("tx")).as("_tx"), sum(col("ty")).as("_ty"))
        .select(col("p_brand"), col("n_pairs"), col("concordant"), col("discordant"),
          expr("round((CAST(concordant AS DOUBLE) - discordant) / " +
            "sqrt((CAST(n_pairs AS DOUBLE) - _tx) * (CAST(n_pairs AS DOUBLE) - _ty)), 6)")
            .as("tau_b"))
        .orderBy("p_brand")
    }),

    // rare-category coalescing: languages under 15% of their source fold
    // into 'other' before the per-(source, lang) readout — the cardinality
    // cap that keeps report dimensions bounded; share test exact integer,
    // one narrow re-aggregation
    "q255_rare_coalesce" -> ((s, dir) => {
      val c = Tables.documents(s, dir).groupBy("source", "lang")
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy("source")))
      c.withColumn("lang2",
          when(col("n") * 100 >= col("tot") * 15, col("lang")).otherwise(lit("other")))
        .groupBy(col("source"), col("lang2").as("lang"))
        .agg(sum(col("n")).as("n"))
        .orderBy("source", "lang")
    }),

    // effective sample size of q251's IPW weights: ESS = (Σw)²/Σw² and the
    // Kish design effect n·Σw²/(Σw)², both exact integer rationals — the
    // "how much did weighting cost" readout for any reweighted estimate
    "q256_ess_weights" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("lang"),
        Dedup.md5Long(concat(lit("ipw#"), col("doc_id").cast("string")), 12).as("u"))
      d.filter(col("lang") === "en" || col("u") * 4 < 281474976710656L)
        .select(expr("CASE WHEN lang = 'en' THEN 1L ELSE 4L END").as("w"))
        .agg(count(lit(1)).as("n_sample"), sum(col("w")).as("sum_w"),
          sum(col("w") * col("w")).as("_sw2"))
        .select(col("n_sample"), col("sum_w"),
          expr("sum_w * sum_w * 1000 div _sw2").as("ess_milli"),
          expr("n_sample * _sw2 * 1000000 div (sum_w * sum_w)").as("deff_ppm"))
    }),

    // the remaining analytic-rank surface in one 25-row panel:
    // dense_rank / ntile / cume_dist over nation revenue (cume_dist
    // quantized to ppm — a count ratio, exact in both engines)
    "q257_rank_panel" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
      rev.select(col("nation"), col("rev"),
          dense_rank().over(Window.orderBy(col("rev").desc)).cast("long").as("drank"),
          ntile(4).over(Window.orderBy(col("rev").desc, col("nation"))).cast("long").as("quartile"),
          round(cume_dist().over(Window.orderBy(col("rev"))) * 1000000, 0).cast("long")
            .as("cume_ppm"))
        .orderBy("nation")
    }),

    // dedup census at three granularities in one report — whole doc,
    // '. '-split sentence (q60's unit), and 5-word shingle: unit counts,
    // distinct counts, and dup ppm per granularity; each granularity is a
    // skinny (granularity, md5) relation, unioned before ONE distinct-agg
    "q258_multigrain_dups" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      val d = docs.select(lit("doc").as("granularity"),
        md5(col("text").cast("binary")).as("h"))
      val l = docs.select(explode(split(col("text"), "\\. ")).as("sent"))
        .filter(length(col("sent")) > 0)
        .select(lit("sentence").as("granularity"), md5(col("sent").cast("binary")).as("h"))
      val g = docs.select(explode(graft.plans.WordShingles(col("text"), 5)).as("s5"))
        .select(lit("5gram").as("granularity"), md5(col("s5").cast("binary")).as("h"))
      d.unionByName(l).unionByName(g)
        .groupBy("granularity")
        .agg(count(lit(1)).as("n_units"), countDistinct(col("h")).as("n_distinct"))
        .withColumn("dup_ppm", expr("(n_units - n_distinct) * 1000000 div n_units"))
        .orderBy("granularity")
    }),

    // near-dup pair explanations: the top-10 LSH candidate pairs broken
    // down into shared / only-A / only-B word counts + exact Jaccard —
    // the reviewer-facing "why were these flagged" readout; token overlap
    // via two equi-joins on the skinny (doc, word) relation, no arrays
    "q259_pair_explain" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
        .select(col("doc_a"), col("doc_b"))
        .orderBy("doc_a", "doc_b").limit(10).localCheckpoint()
      val toks = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0).distinct()
      val nt = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(toks.select(col("doc_id").as("doc_a"), col("w")), "doc_a")
        .join(toks.select(col("doc_id").as("doc_b"), col("w").as("w2")), "doc_b")
        .filter(col("w") === col("w2"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      // the 10-row cand side broadcasts itself; nt is |docs|-sized, never hinted
      cand
        .join(nt.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
        .join(nt.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
        .join(inter, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("inter"))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("inter"),
          (col("n_a") - col("inter")).as("only_a"), (col("n_b") - col("inter")).as("only_b"),
          round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6)
            .as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // daily conversion series on a generated calendar spine: days with no
    // events still appear as zero rows (the reporting-correctness property
    // a bare GROUP BY silently loses); the spine explodes from the 1-row
    // bounds aggregate and left-joins the daily conditional counts
    "q260_daily_conversion" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(to_date(col("ts")).as("day"), col("event_type"))
      val e = ev.groupBy("day").agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"))
      val spine = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      spine.join(e, Seq("day"), "left").na.fill(0L, Seq("views", "purchases"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("views"), col("purchases"),
          expr("CASE WHEN views > 0 THEN purchases * 1000000 div views ELSE 0L END")
            .as("conv_ppm"))
        .orderBy("day")
    }),

    // keyword-in-context (KWIC): every occurrence of the term with its
    // ±3-word window — posexplode keeps the array column alongside the
    // position so the context slice is one codegen expression, no
    // re-tokenization; 1-based positions match the oracle
    "q261_kwic" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        .select(col("doc_id"), col("ws"), posexplode(col("ws")).as(Seq("p0", "w")))
        .filter(col("w") === "spark")
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
          expr("array_join(slice(ws, greatest(p0 + 1 - 3, 1)," +
            " least(p0 + 1 + 3, size(ws)) - greatest(p0 + 1 - 3, 1) + 1), ' ')").as("context"))
        .orderBy("doc_id", "pos").limit(20)),

    // Merkle-style integrity rollup: per-shard hash = md5 of the doc
    // hashes in doc_id order, per-source = md5 of shard hashes, root =
    // md5 of source hashes — three levels in one output, so any replica
    // divergence localizes to a shard without re-reading the corpus;
    // ordered concatenation via array_sort(collect_list(struct)) (the
    // deterministic string_agg ORDER BY equivalent)
    "q262_merkle_rollup" -> ((s, dir) => {
      def rollup(df: DataFrame, keyCols: Seq[String], ord: String): DataFrame =
        df.groupBy(keyCols.map(col): _*)
          .agg(collect_list(struct(col(ord), col("h"))).as("hs"))
          .withColumn("h", md5(expr("array_join(transform(array_sort(hs), x -> x.h), '')")
            .cast("binary")))
          .drop("hs")
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), (col("doc_id") % 16).as("shard"), col("doc_id"),
          md5(col("text").cast("binary")).as("h"))
      val sh = rollup(d, Seq("source", "shard"), "doc_id")
      val so = rollup(sh, Seq("source"), "shard")
      val rt = so.select(lit(0L).as("one"), col("source").as("k"), col("h"))
      val root = rollup(rt.select(col("one"), col("k"), col("h")), Seq("one"), "k")
        .select(lit("root").as("level"), lit("*").as("key"), col("h"))
      sh.select(lit("shard").as("level"),
          concat(col("source"), lit("/"), col("shard").cast("string")).as("key"), col("h"))
        .unionByName(so.select(lit("source").as("level"), col("source").as("key"), col("h")))
        .unionByName(root)
        .orderBy("level", "key")
    }),

    // seasonal-naive forecast backtest: forecast(m) = revenue(m−12) per
    // nation (joined on the month index, not lag — missing months must
    // not shift the season), MAPE and bias as exact ppm integers — the
    // honest evaluation loop behind any q154-style forecast
    "q263_forecast_backtest" -> ((s, dir) => {
      val m = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name").as("nation"),
          ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) - lit(1995 * 12 + 1))
            .cast("long").as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
      val bt = m.as("a")
        .join(m.as("f").select(col("nation"), (col("mi") + 12).as("mi"), col("rev").as("fc")),
          Seq("nation", "mi"))
        .select(col("nation"), col("rev"), col("fc"),
          expr("abs(rev - fc) * 1000000 div rev").as("ape_ppm"))
      bt.groupBy("nation")
        .agg(count(lit(1)).as("n_months"),
          expr("sum(ape_ppm) div count(1)").as("mape_ppm"),
          expr("sum(fc - rev) * 1000000 div sum(rev)").as("bias_ppm"))
        .orderBy("nation")
    }),

    // Newman modularity of the near-dup graph under its connected-component
    // partition: Q = (4m·Σin_c − Σdeg_c²) / 4m² as one exact integer ppm —
    // since components contain every edge, Q = 1 − Σ(deg_c/2m)², i.e. how
    // concentrated the dup mass is in few components (the mega-cluster
    // early warning in one number)
    "q264_modularity" -> ((s, dir) => {
      val cand = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      val lbl = graft.operators.ConnectedComponents.labels(cand, "doc_a", "doc_b")
        .select(col("node").as("u"), col("cluster_id").as("l"))
      val und = cand.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(cand.select(col("doc_b").as("u"), col("doc_a").as("v"))).distinct()
      val cin = cand
        .join(lbl.select(col("u").as("doc_a"), col("l").as("la")), "doc_a")
        .join(lbl.select(col("u").as("doc_b"), col("l").as("lb")), "doc_b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("l")).agg(count(lit(1)).as("in_c"))
      val cdeg = und.groupBy("u").agg(count(lit(1)).as("d"))
        .join(lbl, "u")
        .groupBy("l").agg(sum(col("d")).as("deg_c"))
      val agg = cdeg.join(cin, Seq("l"), "left").na.fill(0L, Seq("in_c"))
        .agg(sum(col("in_c")).as("sin"), sum(col("deg_c") * col("deg_c")).as("sdeg2"),
          count(lit(1)).as("n_comm"))
      val mm = cand.agg(count(lit(1)).as("m"))
      val nn = lbl.agg(count(lit(1)).as("n_nodes"))
      nn.crossJoin(broadcast(mm)).crossJoin(broadcast(agg))
        .select(col("n_nodes"), col("m").as("n_edges"), col("n_comm").as("n_communities"),
          expr("(4 * m * sin - sdeg2) * 1000000 div (4 * m * m)").as("modularity_ppm"))
    }),

    // Poisson dispersion (variance-to-mean ratio) of daily event counts
    // per type: VMR = (nΣx² − S²)/((n−1)·S) as one exact ppm integer —
    // over/under-dispersion flags burstiness or throttling that a mean
    // alone hides
    "q265_dispersion" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("n_events"),
          expr("(count(1) * sum(x*x) - sum(x)*sum(x)) * 1000000" +
            " div ((count(1) - 1) * sum(x))").as("vmr_ppm"))
        .orderBy("event_type")),

    // HLL mergeability: per-type register vectors max-merge into the union
    // sketch, asserted IDENTICAL (zero mismatches) to the sketch built
    // directly on the union — the property that makes sketch stores
    // shardable; the union estimate also gets the linear-counting
    // small-range correction (one ln, rounded) that q162's raw readout
    // omits
    "q266_hll_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def regs(df: DataFrame): DataFrame = df
        .select(Dedup.md5Long(concat(lit("hll#"), col("user_id").cast("string")), 12).as("h"))
        .select(expr("h div 549755813888").as("b"),
          when(col("h") % 549755813888L === 0, lit(40))
            .otherwise(lit(40) - length(bin(col("h") % 549755813888L))).as("rho"))
        .groupBy("b").agg(max(col("rho")).as("mr"))
      val perType = ev.select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"),
          Dedup.md5Long(concat(lit("hll#"), col("user_id").cast("string")), 12).as("h"))
        .select(col("event_type"), expr("h div 549755813888").as("b"),
          when(col("h") % 549755813888L === 0, lit(40))
            .otherwise(lit(40) - length(bin(col("h") % 549755813888L))).as("rho"))
        .groupBy("event_type", "b").agg(max(col("rho")).as("mr"))
      val merged = perType.groupBy("b").agg(max(col("mr")).as("mr"))
      val direct = regs(ev.select(col("user_id")).distinct())
      val mismatches = merged.withColumnRenamed("mr", "m1")
        .join(direct.withColumnRenamed("mr", "m2"), Seq("b"), "full_outer")
        .agg(sum(when(col("m1") <=> col("m2"), 0L).otherwise(1L)).as("merge_mismatches"))
      val msum = merged.agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - mr AS INT))")).as("sp"))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_union"))
      exact.crossJoin(broadcast(msum)).crossJoin(broadcast(mismatches))
        .withColumn("raw_est",
          round(lit(hllAlphaM2Scaled)
            / (col("sp") + (lit(512L) - col("n_present")) * lit(1099511627776L)).cast("double"), 3))
        .select(col("exact_union"), col("n_present"), col("merge_mismatches"),
          col("raw_est"),
          round(expr("CASE WHEN n_present < 512 AND raw_est < 1280.0" +
            " THEN 512.0 * ln(512.0 / CAST(512 - n_present AS DOUBLE)) ELSE raw_est END"), 3)
            .as("corrected_est"))
    }),

    // watermark-lateness histogram under simulated shuffled ingestion:
    // arrival order = md5 of the event id (the events file is ts-sorted,
    // so real arrival carries no disorder to measure), lateness = running
    // per-user max event-time minus event-time, bucketed by bit length
    // (log2 seconds) — the readout that sizes a streaming watermark
    "q267_lateness_histogram" -> ((s, dir) => {
      val arr = Dedup.md5Long(concat(lit("arr#"), col("event_id").cast("string")), 12)
      val w = Window.partitionBy("user_id").orderBy(arr, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("mx", max(col("us")).over(w))
        .select(expr("(mx - us) div 1000000").as("late_s"))
        .groupBy(length(bin(col("late_s"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("late_s")).as("min_s"), max(col("late_s")).as("max_s"))
        .orderBy("bucket")
    }),

    // two-stage cluster sample with design-based expansion: stage 1 keeps
    // ~20% of sources by md5, stage 2 keeps 50% of their docs; the
    // Horvitz-Thompson total (×10) is compared to the truth as exact ppm
    // error — multistage completes the sampling family (uniform, group,
    // weighted, quota, temperature, IPW)
    "q268_multistage_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val s1 = docs.select(col("source")).distinct()
        .filter(Dedup.md5Long(concat(lit("ms1#"), col("source")), 12) * 5 < 281474976710656L)
      val s2 = docs.join(broadcast(s1), "source")
        .filter(Dedup.md5Long(concat(lit("ms2#"), col("doc_id").cast("string")), 12) * 2
          < 281474976710656L)
      val nSrc = s1.agg(count(lit(1)).as("n_sources"))
      val est = s2.agg(count(lit(1)).as("n_docs"),
        (sum(col("n_chars")) * 10).as("est_total_chars"))
      val tru = docs.agg(sum(col("n_chars")).as("true_total_chars"))
      nSrc.crossJoin(broadcast(est)).crossJoin(broadcast(tru))
        .select(col("n_sources"), col("n_docs"), col("est_total_chars"),
          col("true_total_chars"),
          expr("(est_total_chars - true_total_chars) * 1000000 div true_total_chars")
            .as("err_ppm"))
    }),

    // dedup-threshold sensitivity: the q23 exact-Jaccard pairs swept over
    // four candidate thresholds in one conditional-aggregation pass
    // (integer comparisons i·1000 ≥ t·(|A|+|B|−i), no recomputation per
    // threshold) — pair counts and the redundant-shingle bound that decide
    // where to set the near-dup cutoff
    "q269_threshold_sweep" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text").select("doc_a", "doc_b")
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
      val sets = docs.select(col("doc_id"), col("text").as("_text"))
        .join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), array_distinct(graft.plans.WordShingles(col("_text"), 2)).as("bg"))
      val pairs = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("bg").as("bg_a")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("bg").as("bg_b")), "doc_b")
        .select(size(array_intersect(col("bg_a"), col("bg_b"))).cast("long").as("i"),
          size(col("bg_a")).cast("long").as("sa"), size(col("bg_b")).cast("long").as("sb"))
      def hit(t: Int): Column = col("i") * 1000 >= lit(t) * (col("sa") + col("sb") - col("i"))
      pairs.agg(
          sum(when(hit(500), 1L).otherwise(0L)).as("p500"),
          sum(when(hit(500), least(col("sa"), col("sb"))).otherwise(0L)).as("r500"),
          sum(when(hit(700), 1L).otherwise(0L)).as("p700"),
          sum(when(hit(700), least(col("sa"), col("sb"))).otherwise(0L)).as("r700"),
          sum(when(hit(800), 1L).otherwise(0L)).as("p800"),
          sum(when(hit(800), least(col("sa"), col("sb"))).otherwise(0L)).as("r800"),
          sum(when(hit(900), 1L).otherwise(0L)).as("p900"),
          sum(when(hit(900), least(col("sa"), col("sb"))).otherwise(0L)).as("r900"))
        .selectExpr("stack(4, 500L, p500, r500, 700L, p700, r700," +
          " 800L, p800, r800, 900L, p900, r900)" +
          " AS (threshold_milli, n_pairs, redundant_shingles)")
        .na.fill(0L, Seq("n_pairs", "redundant_shingles"))
        .orderBy("threshold_milli")
    }),

    // cross-source dup directionality: for LSH pairs spanning two sources,
    // who keeps the doc under the min-id policy — the per-source-pair
    // give/take balance that shows which feeds lose content to dedup
    "q270_dup_direction" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ds = docs.select(col("doc_id"), col("source"))
      Dedup.minhashCandidates(docs, "doc_id", "text")
        .select(col("doc_a"), col("doc_b"))
        .join(ds.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
        .join(ds.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
        .filter(col("src_a") =!= col("src_b"))
        .groupBy(least(col("src_a"), col("src_b")).as("src_1"),
          greatest(col("src_a"), col("src_b")).as("src_2"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("src_a") === least(col("src_a"), col("src_b")), 1L).otherwise(0L))
            .as("keeper_in_1"))
        .orderBy("src_1", "src_2")
    }),

    // box-plot panel of doc length per language: min/Q1/median/Q3/max by
    // rank positions plus the Tukey-fence outlier count — one ranked
    // window pass with rank-gated conditional MINs, fences joined back
    // as a 5-row broadcast
    "q271_boxplot_stats" -> ((s, dir) => {
      val c = Tables.documents(s, dir)
        .select(col("lang"), col("n_chars").as("x"), col("doc_id").as("k"))
      val r = c.withColumn("rn",
          row_number().over(Window.partitionBy("lang").orderBy(col("x"), col("k"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      val q = r.groupBy("lang").agg(
        max(col("n")).as("n_docs"), min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(when(col("rn") === expr("greatest(1, n div 4)"), col("x"))).as("q1"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("x"))).as("median"),
        min(when(col("rn") === expr("(3 * n) div 4"), col("x"))).as("q3"))
      val outliers = c.join(broadcast(q.select(col("lang"), col("q1"), col("q3"))), "lang")
        .filter(expr("2 * x < 2 * q1 - 3 * (q3 - q1) OR 2 * x > 2 * q3 + 3 * (q3 - q1)"))
        .groupBy("lang").agg(count(lit(1)).as("n_outliers"))
      q.join(outliers, Seq("lang"), "left").na.fill(0L, Seq("n_outliers"))
        .select(col("lang"), col("n_docs"), col("min_x"), col("q1"), col("median"),
          col("q3"), col("max_x"), col("n_outliers"))
        .orderBy("lang")
    }),

    // the SparkSessionExtensions SQL surface exercised through the driver
    // contract: GraftExtensions registers the custom codegen expressions,
    // then PLAIN SQL calls graft_rolling_hash / graft_word_shingles over a
    // temp view — proving a SQL-only user reaches the same Catalyst
    // expressions the DataFrame API uses (oracled against the list_reduce
    // polynomial mirror)
    "q272_sql_extensions" -> ((s, dir) => {
      graft.plans.GraftExtensions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("g_docs")
      s.sql("""SELECT doc_id,
              |       graft_rolling_hash(text) AS fp_poly,
              |       CAST(size(graft_word_shingles(text, 3)) AS BIGINT) AS n_shingles
              |FROM g_docs WHERE text IS NOT NULL
              |ORDER BY doc_id LIMIT 50""".stripMargin)
    }),

    // two-pass exact heavy hitters (Misra-Gries sketch pass → exact count
    // of the bounded candidate set): tokens with >1% corpus frequency —
    // the full-vocabulary shuffle never happens; pass 2 shuffles candidate
    // tokens only. Oracled against plain GROUP BY … HAVING (the sketch's
    // false positives are provably filtered by the exact pass)
    "q273_heavy_hitters" -> ((s, dir) =>
      graft.operators.HeavyHitters.heavyHitters(
        graft.operators.HeavyHitters.tokenStream(Tables.documents(s, dir), "text"),
        "token", 100)),

    // int8 scalar-quantization recall audit: per-vector max-abs quantized
    // codes, integer dot products, recall@10 of the quantized ranking vs
    // the exact float cosine top-10 plus mean |Δsim| — the evaluation
    // loop that decides whether a 4×-smaller index is safe to ship
    "q274_quantized_recall" -> ((s, dir) =>
      graft.operators.Similarity.quantizedRecall(
        Tables.embeddings(s, dir), "vec_id", "embedding", 5, 10)),

    // token-budget waterfilling: allocate a global budget B = total/2
    // across sources, uniform target share, each source capped at 1 epoch
    // (its own tokens); capped prefix found by sorted cumsum, the level
    // λ = (B − cum_p) div (S − p) with the remainder distributed +1 to the
    // first r uncapped sources — the DoReMi-style mixture solver as exact
    // integer window arithmetic on the bounded source dictionary
    "q275_token_allocation" -> ((s, dir) => {
      val srcs = Tables.documents(s, dir)
        .groupBy("source")
        .agg(sum(coalesce(TextFunctions.bpeEstimate(col("text")), lit(0L))).as("n_tokens"))
      val everything = Window.partitionBy()
      val ord = Window.orderBy("n_tokens", "source")
      val run = ord.rowsBetween(Window.unboundedPreceding, 0)
      // bounded dictionary-only global window (the label-encode pattern)
      val g = srcs
        .withColumn("sn", count(lit(1)).over(everything))
        .withColumn("budget", expr("sum(n_tokens) over () div 2"))
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("cum", sum(col("n_tokens")).over(run))
        .withColumn("capped_here",
          col("n_tokens") * (col("sn") - col("rn") + 1) <= col("budget") - col("cum") + col("n_tokens"))
        .withColumn("p",
          coalesce(min(when(!col("capped_here"), col("rn"))).over(everything) - 1, col("sn")))
        .withColumn("cum_p",
          coalesce(max(when(col("rn") === col("p"), col("cum"))).over(everything), lit(0L)))
      g.withColumn("lam",
          when(col("p") === col("sn"), lit(0L))
            .otherwise(expr("(budget - cum_p) div (sn - p)")))
        .withColumn("rem",
          when(col("p") === col("sn"), lit(0L))
            .otherwise(expr("(budget - cum_p) % (sn - p)")))
        .withColumn("alloc_tokens",
          when(col("rn") <= col("p"), col("n_tokens"))
            .otherwise(col("lam") + when(col("rn") - col("p") <= col("rem"), 1L).otherwise(0L)))
        .select(col("source"), col("n_tokens"), col("alloc_tokens"),
          when(col("rn") <= col("p"), 1L).otherwise(0L).as("capped"),
          expr("alloc_tokens * 1000000 div n_tokens").as("epochs_ppm"))
        .orderBy("source")
    }),

    // rendezvous (highest-random-weight) sharding: each doc goes to the
    // shard with the max md5 weight — the consistent-placement scheme
    // where removing a shard moves ONLY that shard's docs (asserted by
    // the n_moved_if_drop7 column: nonzero only on shard 7, spec-proven).
    // Argmax is one max(struct) per doc — no window, no shuffle beyond
    // the 8-way fan-out groupBy
    "q276_rendezvous_shards" -> ((s, dir) => {
      val w = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          explode(sequence(lit(0), lit(7))).as("shard"))
        .withColumn("w", Dedup.md5Long(
          concat(lit("hrw#"), col("shard").cast("string"), lit("#"),
            col("doc_id").cast("string")), 12))
      w.groupBy("doc_id")
        .agg(max(col("n_chars")).as("nc"),
          max(struct(col("w"), col("shard"))).as("m8"),
          max(when(col("shard") < 7, struct(col("w"), col("shard")))).as("m7"))
        .select(col("nc"), col("m8.shard").cast("long").as("shard"),
          (col("m8.shard") =!= col("m7.shard")).as("moved"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
          sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved_if_drop7"))
        .orderBy("shard")
    }),

    // optimizer-stats cardinality audit: 16-bucket histogram on the fact
    // join key with per-bucket (rows, ndv); the planner's uniformity
    // estimate for a self-equi-join (rows²/ndv) vs the exact Σc² — the
    // readout that says where histogram stats mislead the join planner
    // (err > 0 ⇔ the bucket is flatter than assumed, < 0 ⇔ skewed)
    "q277_join_card_audit" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy((col("l_partkey") % 16).cast("long").as("bucket"), col("l_partkey"))
        .agg(count(lit(1)).as("c"))
        .groupBy("bucket")
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("ndv"),
          sum(col("c") * col("c")).as("exact_selfjoin"))
        .withColumn("est_selfjoin", expr("(n_rows * n_rows) div ndv"))
        .withColumn("err_ppm",
          expr("(est_selfjoin - exact_selfjoin) * 1000000 div exact_selfjoin"))
        .orderBy("bucket")),

    // skew-aware partition packing: group-key loads snake-assigned
    // (boustrophedon over the count-ranked keys — the greedy LPT
    // approximation in closed form) vs plain hash assignment, per-partition
    // load in ppm of ideal — the readout that justifies explicit key
    // packing over hashPartitioning for skewed aggregations. The ranked
    // window runs on the bounded key dictionary (an agg output), never
    // the fact table
    "q278_partition_packing" -> ((s, dir) => {
      val nParts = 8
      val keys = Tables.orders(s, dir)
        .groupBy("o_custkey").agg(count(lit(1)).as("c"))
      val everything = Window.partitionBy()
      val snake = keys
        .withColumn("rn", row_number()
          .over(Window.orderBy(col("c").desc, col("o_custkey"))).cast("long"))
        .withColumn("total", sum(col("c")).over(everything))
        .withColumn("p", expr(
          s"CASE WHEN ((rn - 1) div $nParts) % 2 = 0 THEN (rn - 1) % $nParts" +
            s" ELSE $nParts - 1 - ((rn - 1) % $nParts) END"))
      val hashed = keys
        .withColumn("p", Dedup.md5Long(
          concat(lit("pp#"), col("o_custkey").cast("string")), 12) % nParts)
        .groupBy("p").agg(sum(col("c")).as("hash_rows"))
      snake.groupBy("p")
        .agg(count(lit(1)).as("snake_keys"), sum(col("c")).as("snake_rows"),
          max(col("total")).as("total"))
        .join(hashed, "p")
        .select(col("p"), col("snake_keys"), col("snake_rows"), col("hash_rows"),
          expr(s"snake_rows * $nParts * 1000000 div total").as("snake_load_ppm"),
          expr(s"hash_rows * $nParts * 1000000 div total").as("hash_load_ppm"))
        .orderBy("p")
    }),

    // embedding-dimension health profile (feature-store QA): per-dim n,
    // mean/variance from exact 1e-6-quantized integer sums (q98's
    // covariance discipline — decimal38 accumulators, partition-count-
    // invariant), zero fraction, and the dead-dim flag (min = max) that
    // catches a collapsed encoder dimension before it poisons ANN recall
    "q279_embed_dim_profile" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .filter(col("embedding").isNotNull)
        .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
        .select(col("dim").cast("long").as("dim"),
          round(col("x") * 1e6).cast("long").as("xq"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          sum(col("xq").cast(dec38)).as("sx"),
          sum((col("xq") * col("xq")).cast(dec38)).as("sx2"),
          sum(when(col("xq") === 0L, 1L).otherwise(0L)).as("n_zero"),
          min(col("xq")).as("min_q"), max(col("xq")).as("max_q"))
        .select(col("dim"), col("n"),
          expr("CAST(sx div n AS BIGINT)").as("mean_micro"),
          expr("CAST((n * sx2 - sx * sx) div (n * (n - 1)) AS BIGINT)").as("var_micro2"),
          expr("n_zero * 1000000 div n").as("zero_ppm"),
          when(col("min_q") === col("max_q"), 1L).otherwise(0L).as("dead"))
        .orderBy("dim")),

    // join hot-key audit: the 20 keys contributing most self-join output
    // (c² rows each) plus their share of the total — the per-key view
    // behind q277's bucket histogram; the keys this surfaces are exactly
    // the ones AQE skew-split or salting must handle
    "q280_join_hotkeys" -> ((s, dir) => {
      val k = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        .select(col("l_partkey"), col("c"), (col("c") * col("c")).as("out_rows"))
      val everything = Window.partitionBy()
      k.withColumn("total_out", sum(col("out_rows")).over(everything))
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("out_rows").desc, col("l_partkey"))).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("rk"), col("l_partkey").as("partkey"), col("c").as("n_rows"),
          col("out_rows"), expr("out_rows * 1000000 div total_out").as("share_ppm"))
        .orderBy("rk")
    }),

    // l-diversity audit (the k-anonymity follow-up, q219's quasi-identifier
    // grid): per (nation, segment) group the count of DISTINCT sensitive
    // values (order priority) — groups with l < 3 are attribute-disclosure
    // risks even when k-anonymous; one distinct-agg + threshold rollup
    "q281_l_diversity" -> ((s, dir) => {
      val g = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_nationkey", "c_mktsegment")),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderpriority")).as("l"))
      g.agg(count(lit(1)).as("n_groups"),
          min(col("l")).as("min_l"),
          sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_low_diversity"),
          sum(when(col("l") < 3, col("n")).otherwise(0L)).as("rows_at_risk"),
          sum(col("n")).as("total_rows"))
    }),

    // per-column categorical entropy profile: one unpivot scan (stack →
    // (column, value) rows), Shannon entropy per column with each
    // p·ln(1/p) term quantized to 1e-9 nats (the q249 MI discipline) and
    // normalized by ln(ndv) — the DQ readout that flags near-constant
    // and near-uniform columns before they mislead a partitioning choice
    "q282_column_entropy" -> ((s, dir) => {
      val vals = Tables.orders(s, dir).select(expr(
        "stack(3, 'o_orderpriority', o_orderpriority," +
          " 'o_orderstatus', o_orderstatus," +
          " 'order_year', CAST(year(o_orderdate) AS STRING)) AS (col_name, val)"))
      val vc = vals.groupBy("col_name", "val").agg(count(lit(1)).as("c"))
      val wCol = Window.partitionBy("col_name")
      vc.withColumn("n", sum(col("c")).over(wCol))
        .select(col("col_name"), col("c"), col("n"),
          expr("CAST(round((CAST(c AS DOUBLE) / n)" +
            " * ln(CAST(n AS DOUBLE) / c) * 1000000000) AS BIGINT)").as("t9"))
        .groupBy("col_name")
        .agg(max(col("n")).as("n"), count(lit(1)).as("ndv"),
          sum(col("t9")).as("entropy_nano"))
        .withColumn("entropy_norm",
          when(col("ndv") === 1L, 0d).otherwise(
            round(col("entropy_nano").cast("double") / 1e9
              / log(col("ndv").cast("double")), 6)))
        .orderBy("col_name")
    }),

    // degree assortativity of the near-dup graph: Pearson r of (deg_u,
    // deg_v) over both edge directions, exact integer sums end-to-end
    // (marginals are symmetric, so one denominator serves both sides) —
    // positive r says hubs link hubs (one boilerplate mega-family),
    // negative says hubs absorb leaves (template + many variants)
    "q283_assortativity" -> ((s, dir) => {
      val cand = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      val und = cand.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(cand.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("d"))
      und
        .join(deg, "u").withColumnRenamed("d", "du")
        .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
        .agg(count(lit(1)).as("m2"),
          sum(col("du").cast(dec38)).as("sx"),
          sum((col("du") * col("du")).cast(dec38)).as("sx2"),
          sum((col("du") * col("dv")).cast(dec38)).as("sxy"))
        .select(expr("m2 div 2").as("n_edges"),
          expr("CASE WHEN m2 * sx2 - sx * sx = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE CAST((m2 * sxy - sx * sx) * 1000000" +
            " div (m2 * sx2 - sx * sx) AS BIGINT) END").as("assortativity_ppm"))
    }),

    // Kaplan-Meier signup→purchase survival: per-user first signup, first
    // purchase AFTER it (event day offset), censoring at the corpus
    // horizon; per-day n_at_risk from one suffix-sum window over the
    // bounded day grid, ln-survival as a running sum of 1e-9-quantized
    // ln((n−d)/n) terms — log-domain throughout, no exp, no float product
    "q284_km_survival" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val horizon = ev.agg(max(to_date(col("ts"))).as("hz"))
      val perUser = ev
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("s_ts"))
        .filter(col("s_ts").isNotNull)
      val firstPurchase = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("p_raw"))
      val users = perUser
        .join(firstPurchase, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          when(col("p_raw") >= col("s_ts"),
            datediff(to_date(col("p_raw")), to_date(col("s_ts"))))
            .cast("long").as("event_day"),
          datediff(col("hz"), to_date(col("s_ts"))).cast("long").as("censor_day"))
        .select(coalesce(col("event_day"), col("censor_day")).as("day"),
          col("event_day").isNotNull.as("is_event"))
      val byDay = users.groupBy("day")
        .agg(sum(when(col("is_event"), 1L).otherwise(0L)).as("d_events"),
          sum(when(!col("is_event"), 1L).otherwise(0L)).as("n_censored"))
      val ord = Window.orderBy("day")
      val suffix = Window.orderBy(col("day").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      // bounded day grid (≤ corpus span in days) — global windows are fine
      byDay
        .withColumn("n_risk", sum(col("d_events") + col("n_censored")).over(suffix))
        .withColumn("t9", expr(
          "CASE WHEN n_risk > d_events THEN CAST(round(" +
            "ln(CAST(n_risk - d_events AS DOUBLE) / n_risk) * 1000000000) AS BIGINT)" +
            " ELSE 0 END"))
        .withColumn("ln_surv_nano",
          sum(col("t9")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("d_events") > 0)
        .select(col("day"), col("n_risk"), col("d_events"), col("n_censored"),
          col("ln_surv_nano"))
        .orderBy("day")
    }),

    // decontamination n-gram-size sweep: exact-overlap contaminated train
    // docs at shingle widths {3,5,8,13} — the calibration readout that
    // picks the decontam width (small n over-flags common phrases, large
    // n misses paraphrase edits); the width dimension rides the SAME
    // union-explode pass, and absent widths still emit a zero row (left
    // join from the literal width relation)
    "q285_decontam_sweep" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
      val ev = d.filter(col("source") === "src0").select(col("doc_id"), col("text"))
      val tr = d.filter(col("source") =!= "src0").select(col("doc_id"), col("text"))
      val sizes = Seq(3, 5, 8, 13)
      def hashes(df: DataFrame): DataFrame = sizes.map { n =>
        df.select(lit(n.toLong).as("n"), col("doc_id"),
            explode(array_distinct(graft.plans.WordShingles(col("text"), n))).as("s"))
          .select(col("n"), col("doc_id"), Dedup.md5Long(col("s"), 12).as("h"))
      }.reduce(_ unionByName _)
      val evH = hashes(ev).select("n", "h").distinct()
      val hits = hashes(tr)
        .join(evH, Seq("n", "h"), "left_semi")
        .groupBy("n").agg(countDistinct(col("doc_id")).as("n_contaminated"))
      val nTrain = tr.agg(count(lit(1)).as("n_train"))
      s.sql("SELECT CAST(n AS BIGINT) AS n FROM VALUES (3),(5),(8),(13) AS t(n)")
        .join(hits, Seq("n"), "left")
        .na.fill(0L, Seq("n_contaminated"))
        .crossJoin(broadcast(nTrain))
        .select(col("n"), col("n_contaminated"), col("n_train"),
          expr("n_contaminated * 1000000 div n_train").as("contam_ppm"))
        .orderBy("n")
    }),

    // CDC latest-wins compaction (the MERGE/upsert replay): per key the
    // last op by (ts, event_id) via ONE max(struct) agg — no window, no
    // sort — then the final-state census with ops-folded counts; the
    // compaction ratio n_ops_folded/n_users is the log-to-snapshot
    // shrink a lakehouse MERGE achieves
    "q286_latest_state" -> ((s, dir) => {
      val last = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"),
          count(lit(1)).as("n_ops"))
      last.groupBy(col("m.event_type").as("final_state"))
        .agg(count(lit(1)).as("n_users"), sum(col("n_ops")).as("n_ops_folded"))
        .withColumn("share_ppm", expr("n_users * 1000000 div sum(n_users) over ()"))
        .orderBy("final_state")
    }),

    // per-state conditional entropy of the next event (the Markov-family
    // closing readout over q230/q244's transition relation): H(next|state)
    // from exact counts, each (c/ci)·ln(ci/c) term quantized to 1e-9 nats
    // — high-entropy states are where a next-event predictor is blind
    "q287_transition_entropy" -> ((s, dir) => {
      val seqd = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("i"),
          lead(col("event_type"), 1).over(
            Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))).as("j"))
        .filter(col("j").isNotNull)
      val tr = seqd.groupBy("i", "j").agg(count(lit(1)).as("c"))
      val wState = Window.partitionBy("i")
      tr.withColumn("ci", sum(col("c")).over(wState))
        .select(col("i"), col("ci"),
          expr("CAST(round((CAST(c AS DOUBLE) / ci)" +
            " * ln(CAST(ci AS DOUBLE) / c) * 1000000000) AS BIGINT)").as("t9"))
        .groupBy(col("i").as("state"))
        .agg(max(col("ci")).as("n_out"), count(lit(1)).as("n_next_states"),
          sum(col("t9")).as("h_cond_nano"))
        .orderBy("state")
    }),

    // TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    // (brand, size-range, quantity-band) conjunctions evaluated in ONE
    // lineitem scan + ONE broadcast hash join — never a UNION of three
    // scans. The hull of the disjunction (brand IN set, p_size ≤ 15,
    // l_quantity ∈ [1,30]) is applied pre-join so it reaches the parquet
    // scans as pushed filters; the exact OR runs post-join in codegen.
    "q288_disjunctive_revenue" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
          col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, dir).filter(col("l_quantity").between(1, 30))
      val q = col("l_quantity")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size") <= 5 && q.between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size") <= 10 && q.between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size") <= 15 && q.between(20, 30)))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy("p_brand")
    }),

    // Mann-Whitney U rank-sum test (BUILDING vs MACHINERY order totals):
    // ranks assigned on the VALUE-COMPRESSED relation — one row per
    // distinct cent value, so ties collapse BEFORE the global rank
    // window and the window input is |distinct values|, not |orders|.
    // Doubled-rank integers (2·avg_rank ∈ ℤ) keep the ½-steps exact;
    // z from the tie-corrected normal approximation, quantized to 1e-9.
    "q289_mannwhitney" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment").as("g"))
      val j = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("g"), centsOf(col("o_totalprice")).as("v"))
      val vg = j.groupBy("v")
        .agg(sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("n1v"),
          count(lit(1)).as("cnt"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      vg.withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .agg(
          sum(col("n1v") * (lit(2L) * col("cb") + col("cnt") + lit(1L))).as("r1x2"),
          sum(col("n1v")).as("n1"),
          sum(col("cnt")).as("n"),
          sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
        .select(col("n1"), (col("n") - col("n1")).as("n2"),
          (col("r1x2") - col("n1") * (col("n1") + lit(1L))).as("u1_x2"),
          col("n"), col("ties"))
        .select(col("n1"), col("n2"), col("u1_x2"),
          expr("CAST(round((CAST(u1_x2 - n1*n2 AS DOUBLE) / 2)" +
            " / sqrt(CAST(n1 AS DOUBLE) * n2 / 12" +
            " * ((n + 1) - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))" +
            " * 1000000000) AS BIGINT)").as("z_nano"))
    }),

    // χ² independence (lang × source) + Cramér's V via the zero-cell-free
    // identity χ² = N·(Σ_observed O²/(n_l·n_s) − 1) — absent cells never
    // materialize (at 100 TB the r×c grid is mostly empty; the observed
    // relation is the only thing shuffled). Each cell's term is quantized
    // to 1e-9 BEFORE the sum so the total is partition-order-independent;
    // both marginal relations broadcast.
    "q290_cramers_v" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("lang", "source")
      val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val nl = d.groupBy("lang").agg(count(lit(1)).as("n_l"))
      val ns = d.groupBy("source").agg(count(lit(1)).as("n_s"))
      val s9 = cells
        .join(broadcast(nl), "lang")
        .join(broadcast(ns), "source")
        .select(expr("CAST(round(CAST(o AS DOUBLE) * o / (CAST(n_l AS DOUBLE) * n_s)" +
          " * 1000000000) AS BIGINT)").as("t9"))
        .agg(sum(col("t9")).as("s9"))
      s9.crossJoin(broadcast(nl.agg(count(lit(1)).as("n_langs"))))
        .crossJoin(broadcast(ns.agg(count(lit(1)).as("n_sources"))))
        .crossJoin(broadcast(d.agg(count(lit(1)).as("n_total"))))
        .select(col("n_langs"), col("n_sources"), col("n_total"),
          expr("n_total * (s9 - 1000000000)").as("chi2_nano"))
        .select(col("n_langs"), col("n_sources"), col("n_total"), col("chi2_nano"),
          expr("CAST(round(sqrt(greatest(CAST(chi2_nano AS DOUBLE), CAST(0 AS DOUBLE))" +
            " / 1000000000.0 / (CAST(n_total AS DOUBLE) * least(n_langs - 1, n_sources - 1)))" +
            " * 1000000) AS BIGINT)").as("cramers_v_ppm"))
    }),

    // Mondrian split-conformal prediction intervals: md5-deterministic
    // train/cal/test folds (2:1:1), per-segment mean predictor, the
    // calibration quantile as the ⌈0.9·(n_cal+1)⌉-th ORDER STATISTIC
    // (pure integer k — no double quantile math), coverage replayed on
    // the held-out fold. The guarantee under exchangeability is
    // coverage ≥ 900000 ppm; everything below the residual sort is
    // integer-exact. The only per-segment sort is over the cal fold
    // (¼ of the data), partitioned by segment.
    "q291_conformal_coverage" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val o = Tables.orders(s, dir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("segment"), col("o_orderkey"), centsOf(col("o_totalprice")).as("v"),
          (Dedup.md5Long(col("o_orderkey").cast("string"), 12) % 4).as("fold"))
        // five consumers (train agg, calibration ×2, test pass) — without
        // materializing, each replays the fact join + md5 folds: 7.5 s →
        // ~1 s at sf0.1
        .localCheckpoint(false)
      val pred = o.filter(col("fold") < 2).groupBy("segment")
        .agg(count(lit(1)).as("n_train"),
          expr("sum(v) div count(1)").as("pred_cents"))
      val cal = o.filter(col("fold") === 2)
        .join(broadcast(pred.select("segment", "pred_cents")), "segment")
        .withColumn("resid", abs(col("v") - col("pred_cents")))
      val nCal = cal.groupBy("segment").agg(count(lit(1)).as("n_cal"))
        .withColumn("k", expr("least((9 * (n_cal + 1) + 9) div 10, n_cal)"))
      val rk = Window.partitionBy("segment").orderBy(col("resid"), col("o_orderkey"))
      val qhat = cal.withColumn("r", row_number().over(rk))
        .join(broadcast(nCal), "segment")
        .filter(col("r") === col("k"))
        .select(col("segment"), col("n_cal"), col("resid").as("qhat_cents"))
      o.filter(col("fold") === 3)
        .join(broadcast(pred), "segment")
        .join(broadcast(qhat), "segment")
        .groupBy("segment")
        .agg(max(col("n_train")).as("n_train"), max(col("n_cal")).as("n_cal"),
          count(lit(1)).as("n_test"),
          max(col("pred_cents")).as("pred_cents"),
          max(col("qhat_cents")).as("qhat_cents"),
          expr("CAST(sum(CASE WHEN abs(v - pred_cents) <= qhat_cents THEN 1 ELSE 0 END)" +
            " * 1000000 div count(1) AS BIGINT)").as("coverage_ppm"))
        .orderBy("segment")
    }),

    // Adamic-Adar link prediction on the brand co-purchase graph:
    // per-order brand sets are BOUNDED (≤ lines/order), so pair weights
    // come from one map-side explode — never corpus-quadratic. Edges =
    // pairs strictly above the median weight (2w > m2, the doubled
    // median from two conditional order-stat sums — integer-exact both
    // engines); scores only for two-hop NON-edges, each common
    // neighbor contributing round(1e9/ln(deg)) pre-quantized so the
    // sum is partition-order-independent.
    "q292_adamic_adar" -> ((s, dir) => {
      val ob = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("p_brand")).as("bs"))
        .select(explode(col("bs")).as("u"), col("bs"))
        .select(col("u"), explode(col("bs")).as("v"))
        .filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("w"))
        // the corpus pass feeds the median AND the edge filter — without
        // materializing the ≤ brands² pair relation, every downstream
        // consumer (median, edges×3, degrees, two-hop×2) replays the
        // lineitem scan+aggregation: measured 14 s → ~1 s at sf0.1
        .localCheckpoint(false)
      // doubled median of the (bounded, ≤ brands²) pair-weight relation
      val m2 = ob
        .withColumn("rk", row_number().over(Window.orderBy(col("w"), col("u"), col("v"))))
        .withColumn("np", count(lit(1)).over(Window.partitionBy()))
        .agg((sum(when(col("rk") === expr("(np + 1) div 2"), col("w"))) +
          sum(when(col("rk") === expr("(np + 2) div 2"), col("w")))).as("m2"))
      val edges = ob.crossJoin(broadcast(m2)).filter(col("w") * 2 > col("m2"))
        .select("u", "v").localCheckpoint(false)
      val ed = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val deg = ed.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      val twoHop = ed.select(col("u").as("a"), col("v").as("wnode"))
        .join(ed.select(col("u").as("wnode"), col("v").as("b")), "wnode")
        .filter(col("a") < col("b"))
        .join(edges.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"), "left_anti")
      twoHop
        .join(broadcast(deg), col("wnode") === col("node"))
        .groupBy(col("a").as("brand_a"), col("b").as("brand_b"))
        .agg(count(lit(1)).as("n_common"),
          sum(expr("CAST(round(1000000000 / ln(CAST(deg AS DOUBLE))) AS BIGINT)")).as("aa_nano"))
        .orderBy(col("aa_nano").desc, col("brand_a"), col("brand_b"))
        .limit(25)
    }),

    // Quality-score calibration against exact-dup incidence: the
    // reliability-diagram readout a curation team uses before trusting
    // a quality filter as a dup predictor. Bins reuse q92's decile rule;
    // per-doc predictions quantized to ppm BEFORE the bin means so
    // every output column is an exact integer (no cross-partition
    // double sums). One corpus scan + one text-count join.
    "q293_calibration_bins" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
      val dups = d.groupBy("text").agg(count(lit(1)).as("n_copies"))
      TextFunctions.withQualityColumns(d, "text")
        .select(col("doc_id"), col("text"),
          expr("CAST(round(quality * 1000000) AS BIGINT)").as("q_ppm"),
          least(floor(col("quality") * 10), lit(9L)).as("decile"))
        .join(dups, Seq("text"))
        .withColumn("is_dup", when(col("n_copies") > 1, 1L).otherwise(0L))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_dup")).as("n_dups"),
          expr("sum(q_ppm) div count(1)").as("mean_pred_ppm"),
          expr("CAST(sum(is_dup) * 1000000 div count(1) AS BIGINT)").as("dup_rate_ppm"))
        .withColumn("gap_ppm", abs(col("mean_pred_ppm") - col("dup_rate_ppm")))
        .orderBy("decile")
    }),

    // nDCG@10 of the IVF index against exact brute-force relevance — the
    // rank-aware retrieval readout that complements q146/q274's recall:
    // relevance of a retrieved neighbor = 11 − exact_rank (0 if outside
    // the exact top-10), discounted by 1/ln(pos+1), each term quantized
    // to 1e-9 pre-sum. Both rankings ride the existing bounded shapes
    // (query broadcast / bucketed probe); the eval join is |Q|·k rows.
    "q294_ndcg_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("rk_exact"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
          nCentroids = 8, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("p"))
      val dcg = approx.join(exact, Seq("query_id", "neighbor_id"), "left")
        .withColumn("rel", coalesce(lit(11L) - col("rk_exact"), lit(0L)))
        .groupBy("query_id")
        .agg(sum(when(col("rk_exact").isNotNull, 1L).otherwise(0L)).as("n_hits"),
          sum(expr("CAST(round(rel * 1000000000" +
            " / ln(CAST(p + 1 AS DOUBLE))) AS BIGINT)")).as("dcg_nano"))
      val idcg = exact.groupBy("query_id")
        .agg(sum(expr("CAST(round((11 - rk_exact) * 1000000000" +
          " / ln(CAST(rk_exact + 1 AS DOUBLE))) AS BIGINT)")).as("idcg_nano"))
      dcg.join(idcg, Seq("query_id"))
        .select(col("query_id"), col("n_hits"), col("dcg_nano"), col("idcg_nano"),
          expr("dcg_nano * 1000000 div idcg_nano").as("ndcg_ppm"))
        .orderBy("query_id")
    }),

    // Hapax-legomena share per source: the vocabulary-tail readout that
    // separates natural text (hapax-rich) from templated/boilerplate
    // sources (hapax-poor) — a quick corpus-health screen next to q93's
    // Zipf slope. Two hash aggregations with map-side combine; the
    // (source, word) key space is the only shuffle.
    "q295_hapax_share" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(TextFunctions.words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"),
          sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_types"), col("n_tokens"), col("n_hapax"),
          expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
        .orderBy("source")),

    // Wasserstein-1 (earth-mover) distance between two segments' order-
    // total distributions: W₁ = ∫|F_A−F_B| over the VALUE-COMPRESSED
    // cent grid — per-value counts first (one hash agg), then the CDF
    // window over distinct values only (the q205/q289 global-grid
    // shape). The integrand |ca·nb − cb·na|·dv is exact integer algebra
    // accumulated in decimal(38) (long would overflow at ~1e9 rows per
    // side × wide value ranges); one division at the end.
    "q296_wasserstein" -> ((s, dir) => {
      val segs = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(col("c_custkey"), col("c_mktsegment").as("g"))
      val j = Tables.orders(s, dir).join(segs, col("o_custkey") === col("c_custkey"))
        .select(col("g"), centsOf(col("o_totalprice")).as("v"))
      val vg = j.groupBy("v").agg(
        sum(when(col("g") === "AUTOMOBILE", 1L).otherwise(0L)).as("a"),
        sum(when(col("g") =!= "AUTOMOBILE", 1L).otherwise(0L)).as("b"))
      val ord = Window.orderBy("v")
      val cum = vg
        .withColumn("ca", sum(col("a")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cb", sum(col("b")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("dv", lead(col("v"), 1).over(ord) - col("v"))
      cum.filter(col("dv").isNotNull)
        .crossJoin(broadcast(j.agg(
          sum(when(col("g") === "AUTOMOBILE", 1L).otherwise(0L)).as("na"),
          sum(when(col("g") =!= "AUTOMOBILE", 1L).otherwise(0L)).as("nb"))))
        .select(col("na"), col("nb"),
          (abs(col("ca") * col("nb") - col("cb") * col("na")).cast(dec38) *
            col("dv").cast(dec38)).as("t"))
        .groupBy("na", "nb")
        .agg(count(lit(1)).as("n_grid"), sum(col("t")).as("s"))
        .select(col("na"), col("nb"), col("n_grid"),
          expr("CAST(s div (na * nb) AS BIGINT)").as("w1_cents"))
    }),

    // Fellegi-Sunter record-linkage weights over the LSH candidate
    // pairs: match label = exact content hash, three blocking features
    // (same lang / same source / length within 10%), Laplace-smoothed
    // m = P(f|match) and u = P(f|non-match) as exact ppm integers, the
    // agreement weight ln(m/u) quantized last. The candidate relation
    // is the bounded Σbucket² LSH output — never all pairs; doc
    // attributes arrive by two equi-joins on doc_id.
    "q297_fellegi_sunter" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), md5(col("text")).as("th"), col("lang"),
          col("source"), col("n_chars"))
      val cand = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_a", "doc_b")
      val pairs = cand
        .join(d.select(col("doc_id").as("doc_a"), col("th").as("th_a"),
          col("lang").as("lang_a"), col("source").as("src_a"), col("n_chars").as("len_a")),
          Seq("doc_a"))
        .join(d.select(col("doc_id").as("doc_b"), col("th").as("th_b"),
          col("lang").as("lang_b"), col("source").as("src_b"), col("n_chars").as("len_b")),
          Seq("doc_b"))
        .select(
          when(col("th_a") === col("th_b"), 1L).otherwise(0L).as("is_match"),
          when(col("lang_a") === col("lang_b"), 1L).otherwise(0L).as("f_same_lang"),
          when(col("src_a") === col("src_b"), 1L).otherwise(0L).as("f_same_source"),
          when(abs(col("len_a") - col("len_b")) * 10 <=
            greatest(col("len_a"), col("len_b")), 1L).otherwise(0L).as("f_len_close"))
      pairs.selectExpr("is_match",
          "stack(3, 'same_lang', f_same_lang, 'same_source', f_same_source," +
            " 'len_close', f_len_close) AS (feature, f)")
        .groupBy("feature")
        .agg(sum(col("is_match")).as("n_match"),
          sum(lit(1L) - col("is_match")).as("n_nonmatch"),
          sum(col("f") * col("is_match")).as("nf_match"),
          sum(col("f") * (lit(1L) - col("is_match"))).as("nf_nonmatch"))
        .select(col("feature"), col("n_match"), col("n_nonmatch"),
          col("nf_match"), col("nf_nonmatch"),
          expr("(nf_match + 1) * 1000000 div (n_match + 2)").as("m_ppm"),
          expr("(nf_nonmatch + 1) * 1000000 div (n_nonmatch + 2)").as("u_ppm"))
        .withColumn("w_nano",
          expr("CAST(round(ln(CAST(m_ppm AS DOUBLE) / u_ppm) * 1000000000) AS BIGINT)"))
        .orderBy("feature")
    }),

    // Term burstiness (Church-Gale): collection frequency over document
    // frequency — terms that pile up inside few documents (cf/df high)
    // are topical/templated; evenly-sprinkled terms are function words.
    // One corpus explode, two hash aggregations with map-side combine.
    "q298_burstiness" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("w")
        .agg(sum(col("c")).as("cf"), count(lit(1)).as("df"))
        .filter(col("df") >= 5)
        .select(col("w").as("term"), col("cf"), col("df"),
          expr("cf * 1000000 div df").as("burstiness_ppm"))
        .orderBy(col("burstiness_ppm").desc, col("term"))
        .limit(25)),

    // Two-pass EXACT percentiles without a global sort — the pattern
    // that makes exact p50/p95/p99 feasible at 100 TB: pass 1 is a
    // bounded histogram (v div 65536) with map-side combine, the cum-
    // sum locates each target order statistic's bin, pass 2 sorts ONLY
    // the rows of the hit bins (a ~1/bins fraction). Result provably
    // equals the k-th order statistic, k = ⌈p·n/100⌉ — oracled against
    // DuckDB's direct global-sort rank.
    "q299_twopass_quantiles" -> ((s, dir) => {
      val v = Tables.orders(s, dir).select(centsOf(col("o_totalprice")).as("v"))
      val n = v.agg(count(lit(1)).as("n"))
      val hist = v.groupBy(expr("v div 65536").as("bin")).agg(count(lit(1)).as("c"))
        .withColumn("cb", coalesce(sum(col("c")).over(
          Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val ks = s.sql("SELECT CAST(p AS BIGINT) AS p FROM VALUES (50),(95),(99) AS t(p)")
        .crossJoin(broadcast(n))
        .select(col("p"), expr("(p * n + 99) div 100").as("k"))
      val tb = ks.join(broadcast(hist),
          col("cb") < col("k") && col("cb") + col("c") >= col("k"))
        .select(col("p"), col("k"), col("bin"), (col("k") - col("cb")).as("off"))
      v.join(broadcast(tb), expr("v div 65536") === col("bin"))
        .withColumn("r", row_number().over(Window.partitionBy("p").orderBy("v")).cast("long"))
        .filter(col("r") === col("off"))
        .select(col("p").as("pct"), col("k"), col("v").as("value_cents"))
        .orderBy("pct")
    }),

    // The flagship composition: a 7-stage pretraining-data pipeline card
    // — raw → non-null → train split (eval source held out) → quality
    // filter → exact dedup (min-id keeper per text) → cluster near-dedup
    // (LSH + connected components) → 5-gram decontamination vs the eval
    // split — each stage reporting surviving docs, tokens, and ppm of
    // raw. Stages 1-4 fold into ONE conditional aggregation over a
    // single corpus scan; 5-7 reuse the verified dedup/decontam
    // operators unchanged. This is the query a data-curation team runs
    // nightly; every constituent is individually oracled elsewhere
    // (q27/q20/q66/q32/q74), this composes them.
    "q300_pipeline_card" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val base = TextFunctions.withQualityColumns(d, "text")
        .select(col("doc_id"), col("text"), col("source"), col("n_words"), col("quality"))
      val s2c = col("text").isNotNull
      val s3c = s2c && col("source") =!= "src0"
      val s4c = s3c && col("quality") >= 0.45
      val s14 = base.agg(
        count(lit(1)).as("d1"),
        sum(when(s2c, 1L).otherwise(0L)).as("d2"),
        sum(when(s3c, 1L).otherwise(0L)).as("d3"),
        sum(when(s4c, 1L).otherwise(0L)).as("d4"),
        sum(coalesce(col("n_words"), lit(0L))).as("t1"),
        sum(when(s2c, col("n_words")).otherwise(0L)).as("t2"),
        sum(when(s3c, col("n_words")).otherwise(0L)).as("t3"),
        sum(when(s4c, col("n_words")).otherwise(0L)).as("t4"))
      val s4df = base.filter(s4c)
      val keep = s4df.groupBy("text").agg(min(col("doc_id")).as("keep_id"))
      // lazy localCheckpoints: s5/s6 each feed 3 consumers (an aggregate,
      // the LSH/decontam generator, the next stage's anti-join) — without
      // them the quality+dedup lineage re-executes per consumer
      val s5df = s4df.join(keep, Seq("text")).filter(col("doc_id") === col("keep_id"))
        .select("doc_id", "text", "n_words")
        .localCheckpoint(false)
      val losers = Dedup.clusterLosers(
        Dedup.minhashCandidates(s5df, "doc_id", "text").select("doc_a", "doc_b"))
        .select(col("node").as("doc_id"))
      val s6df = s5df.join(losers, Seq("doc_id"), "left_anti")
        .localCheckpoint(false)
      val contam = Dedup.exactNgramContamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        s6df.select(col("doc_id"), col("text")), "doc_id", "text", 5)
        .select("doc_id")
      val s7df = s6df.join(contam, Seq("doc_id"), "left_anti")
      def late(df: DataFrame, id: Int, name: String): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_words")), lit(0L)).as("n_tokens"))
          .select(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      val early = s14.selectExpr(
        "stack(4, CAST(1 AS BIGINT), 'raw', d1, t1," +
          " CAST(2 AS BIGINT), 'nonnull', d2, t2," +
          " CAST(3 AS BIGINT), 'train_split', d3, t3," +
          " CAST(4 AS BIGINT), 'quality', d4, t4) AS (stage_id, stage, n_docs, n_tokens)")
      early
        .unionByName(late(s5df, 5, "exact_dedup"))
        .unionByName(late(s6df, 6, "near_dedup"))
        .unionByName(late(s7df, 7, "decontam"))
        .crossJoin(broadcast(s14.select(col("d1").as("n_raw"))))
        .select(col("stage_id"), col("stage"), col("n_docs"), col("n_tokens"),
          expr("n_docs * 1000000 div n_raw").as("survival_ppm"))
        .orderBy("stage_id")
    }),

    // TPC-H Q20/Q15-family supply-leadership census: per widget part,
    // the LEADING supplier by shipped quantity (argmax as one
    // max(struct) hash agg — ties to the smaller suppkey, never a
    // window over the fact), then per supplier how many parts they
    // lead. One fact aggregation; part and supplier dims broadcast.
    "q301_part_leaders" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").contains("widget")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
      val ps = li.groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("q_ps"))
      ps.groupBy("l_partkey")
        .agg(max(struct(col("q_ps"), (-col("l_suppkey")).as("neg"),
          col("l_suppkey").as("sk"))).as("m"))
        .groupBy(col("m.sk").as("l_suppkey"))
        .agg(count(lit(1)).as("n_led"), sum(col("m.q_ps")).as("led_qty"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("n_led"), col("led_qty"))
        .orderBy(col("n_led").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q16-shaped supplier diversity per part family: distinct
    // suppliers per (brand, type, size) with a "complaints" anti-join
    // (negative-balance suppliers excluded) — the count-distinct +
    // NOT-IN pattern. The exclusion runs as a broadcast semi join
    // BEFORE the distinct aggregation, so excluded suppliers never
    // enter the shuffle.
    "q302_part_supplier_cnt" -> ((s, dir) => {
      val ok = Tables.supplier(s, dir).filter(col("s_acctbal") >= 0).select("s_suppkey")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(ok), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
        .limit(20)
    }),

    // Hops-from-keeper histogram over the dup graph: multi-source BFS
    // seeded at every component's min-id keeper (the doc dedup KEEPS),
    // three synchronous relaxation rounds (LSH clique-ish components
    // converge in 1-2; sentinel 1e6 = unreached → hop −1). Each round
    // is one equi-join + one min-aggregation — the same two-shuffle
    // shape as a CC round, statically unrolled so both engines share
    // the exact three-step structure.
    "q303_keeper_hops" -> ((s, dir) => {
      val cand = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_a", "doc_b")
      val und = cand.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(cand.select(col("doc_b").as("u"), col("doc_a").as("v")))
      var dist = graft.operators.ConnectedComponents.labels(cand, "doc_a", "doc_b")
        .select(col("node").as("u"),
          when(col("node") === col("cluster_id"), 0L).otherwise(1000000L).as("d"))
      for (_ <- 1 to 3) {
        val nd = und.join(dist, "u")
          .groupBy(col("v")).agg((min(col("d")) + lit(1L)).as("nd"))
        dist = dist.join(nd.withColumnRenamed("v", "u"), Seq("u"), "left")
          .select(col("u"), least(col("d"), coalesce(col("nd"), lit(1000000L))).as("d"))
      }
      dist.groupBy(expr("CASE WHEN d >= 1000000 THEN -1 ELSE d END").as("hop"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("hop")
    }),

    // HELD-OUT bigram-LM evaluation — the honest version of q77's
    // self-scoring: md5 folds split the corpus, the LM (add-one over
    // the train context vocab) trains on fold 0 and scores fold 1's
    // bigrams, reported per source as mean NLL + context-OOV rate. The
    // shingle hash relation is built once (localCheckpoint) and both
    // folds are slices of it; unseen bigrams/contexts survive as
    // coalesce(0) — never dropped rows.
    "q304_heldout_nll" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
      val meta = d.select(col("doc_id"), col("source"),
        (Dedup.md5Long(col("doc_id").cast("string"), 12) % 2).as("fold"))
      val bg = Dedup.shingleRows(d.filter(size(split(col("text"), " ", -1)) >= 2),
          "doc_id", "text", 2)
        .select(col("doc_id"), Dedup.md5Long(col("s"), 12).as("sk"),
          Dedup.md5Long(substring_index(col("s"), " ", 1), 12).as("wk"))
        .join(meta, "doc_id")
        .localCheckpoint(false)
      val tr = bg.filter(col("fold") === 0)
      val te = bg.filter(col("fold") === 1)
      val bc = tr.groupBy("sk").agg(count(lit(1)).as("cb"))
      val ctx = tr.groupBy("wk").agg(count(lit(1)).as("cw"))
      val v = ctx.agg(count(lit(1)).as("v"))
      te.join(bc, Seq("sk"), "left")
        .join(ctx, Seq("wk"), "left")
        .crossJoin(broadcast(v))
        .select(col("source"),
          expr("CAST(round(ln(CAST(coalesce(cb, 0) + 1 AS DOUBLE)" +
            " / (coalesce(cw, 0) + v)) * 1000000000) AS BIGINT)").as("t9"),
          col("cw").isNull.cast("long").as("oov"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("(-sum(t9)) div count(1)").as("avg_nll_nano"),
          expr("CAST(sum(oov) * 1000000 div count(1) AS BIGINT)").as("oov_ppm"))
        .orderBy("source")
    }),

    // Weighted (multiset) Jaccard over the LSH candidate pairs — the
    // tf-aware refinement of q23's set Jaccard: Σmin(tf_a,tf_b)/Σmax.
    // Only the INTERSECTION is ever joined (per-pair common words);
    // Σmax falls out of the identity Σmax = tot_a + tot_b − Σmin, so
    // the disjoint tails never shuffle. Everything is exact integers.
    "q305_weighted_jaccard" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val cand = Dedup.minhashCandidates(d, "doc_id", "text").select("doc_a", "doc_b")
      val tf = d.filter(col("text").isNotNull)
        .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val inter = cand
        .join(tf.select(col("doc_id").as("doc_a"), col("w"), col("c").as("ca")), Seq("doc_a"))
        .join(tf.select(col("doc_id").as("doc_b"), col("w"), col("c").as("cb2")),
          Seq("doc_b", "w"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(least(col("ca"), col("cb2"))).as("smin"))
      val tot = tf.groupBy("doc_id").agg(sum(col("c")).as("tot"))
      cand
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("smin"))
        .join(tot.select(col("doc_id").as("doc_a"), col("tot").as("tot_a")), Seq("doc_a"))
        .join(tot.select(col("doc_id").as("doc_b"), col("tot").as("tot_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("smin"),
          (col("tot_a") + col("tot_b") - col("smin")).as("smax"))
        .withColumn("wjaccard_ppm", expr("smin * 1000000 div smax"))
        .orderBy("doc_a", "doc_b")
    }),

    // Difference-in-differences on order value: BUILDING (treated) vs
    // MACHINERY (control), intervention at 1998-01-01 — the causal
    // panel readout next to q166's A/B lift and q251's IPW. ONE
    // conditional aggregation over one scan; means as exact integer
    // cents (sum div n per cell).
    "q306_did_revenue" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_custkey"), col("c_mktsegment").as("g")),
          col("o_custkey") === col("c_custkey"))
        .select(col("g"), (col("o_orderdate") >= lit("1998-01-01")).as("post"),
          centsOf(col("o_totalprice")).as("v"))
        .agg(
          expr("sum(CASE WHEN g = 'BUILDING' AND NOT post THEN v ELSE 0 END)" +
            " div sum(CASE WHEN g = 'BUILDING' AND NOT post THEN 1 ELSE 0 END)")
            .as("treat_pre_cents"),
          expr("sum(CASE WHEN g = 'BUILDING' AND post THEN v ELSE 0 END)" +
            " div sum(CASE WHEN g = 'BUILDING' AND post THEN 1 ELSE 0 END)")
            .as("treat_post_cents"),
          expr("sum(CASE WHEN g = 'MACHINERY' AND NOT post THEN v ELSE 0 END)" +
            " div sum(CASE WHEN g = 'MACHINERY' AND NOT post THEN 1 ELSE 0 END)")
            .as("ctrl_pre_cents"),
          expr("sum(CASE WHEN g = 'MACHINERY' AND post THEN v ELSE 0 END)" +
            " div sum(CASE WHEN g = 'MACHINERY' AND post THEN 1 ELSE 0 END)")
            .as("ctrl_post_cents"))
        .withColumn("did_cents",
          expr("(treat_post_cents - treat_pre_cents) - (ctrl_post_cents - ctrl_pre_cents)"))),

    // Rank-biased overlap (p = 0.9, truncated at depth 10) between the
    // IVF and brute-force neighbor lists — the top-weighted rank
    // agreement metric complementing q294's nDCG: each depth d
    // contributes (1−p)p^(d−1)·|overlap@d|/d, computed as the PURE
    // RATIONAL A_d·9^(d−1)·1e9 div (d·10^d) — no pow(), no doubles.
    // Overlap@d falls out of one matched-pair relation exploded to the
    // depths it supports (d ≥ max(rank_a, rank_b)).
    "q307_rbo_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("rk_exact"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
          nCentroids = 8, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("p"))
      val m = approx.join(exact, Seq("query_id", "neighbor_id"))
        .select(col("query_id"), greatest(col("rk_exact"), col("p")).as("dmin"))
      val overlaps = m
        .select(col("query_id"), explode(expr("sequence(dmin, CAST(10 AS BIGINT))")).as("d"))
        .groupBy("query_id", "d").agg(count(lit(1)).as("a"))
      val grid = exact.select("query_id").distinct()
        .select(col("query_id"), explode(expr("sequence(CAST(1 AS BIGINT), CAST(10 AS BIGINT))")).as("d"))
      val pows = s.sql(
        "SELECT CAST(d AS BIGINT) AS d, CAST(p9 AS BIGINT) AS p9, CAST(p10d AS BIGINT) AS p10d FROM VALUES " +
          (1 to 10).map(d =>
            s"($d, ${math.pow(9, d - 1).toLong}L, ${math.pow(10, d).toLong}L)").mkString(", ") +
          " AS t(d, p9, p10d)")
      grid.join(overlaps, Seq("query_id", "d"), "left")
        .na.fill(0L, Seq("a"))
        .join(broadcast(pows), Seq("d"))
        .select(col("query_id"), expr("(a * p9 * 1000000000) div (d * p10d)").as("t"))
        .groupBy("query_id")
        .agg(sum(col("t")).as("rbo_nano"))
        .orderBy("query_id")
    }),

    // Hill estimator of the order-value tail index: mean ln(x_i/x_k)
    // over the global top-k=100 (a BOUNDED relation — at any corpus
    // size the sort is a top-k TakeOrdered, never a full sort), each
    // term ln-quantized to 1e-9; α = 1/hill in ppm via one integer
    // division. Heavy-tail calibration next to q93's Zipf slope.
    "q308_hill_tail_index" -> ((s, dir) => {
      val top = Tables.orders(s, dir)
        .select(centsOf(col("o_totalprice")).as("v"))
        .orderBy(col("v").desc)
        .limit(100)
      val xk = top.agg(min(col("v")).as("xk"))
      top.crossJoin(broadcast(xk))
        .select(expr("CAST(round(ln(CAST(v AS DOUBLE) / xk) * 1000000000) AS BIGINT)").as("t9"),
          col("xk"))
        .groupBy("xk")
        .agg(count(lit(1)).as("k"), sum(col("t9")).as("s9"))
        .select(col("k"), col("xk").as("xk_cents"),
          expr("s9 div (k - 1)").as("hill_nano"),
          expr("CASE WHEN s9 div (k - 1) > 0" +
            " THEN 1000000000000000 div (s9 div (k - 1)) ELSE NULL END").as("alpha_ppm"))
    }),

    // Cohort lifetime-value curve: customers cohorted by first-order
    // month (linearized y·12+m), per (cohort, age) revenue, cumulative
    // LTV per cohort member as exact integer cents. The window runs
    // over the bounded (cohort × age) grid — the fact table only feeds
    // two hash aggregations.
    "q309_cohort_ltv" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"),
        centsOf(col("o_totalprice")).as("v"))
      val first = o.groupBy("o_custkey").agg(min(col("m")).as("m0"))
      val sizes = first.groupBy("m0").agg(count(lit(1)).as("n_cust"))
      val rev = o.join(first, "o_custkey")
        .groupBy(col("m0"), (col("m") - col("m0")).as("age"))
        .agg(sum(col("v")).as("rev_cents"))
      rev
        .withColumn("cum_cents", sum(col("rev_cents")).over(
          Window.partitionBy("m0").orderBy("age")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .join(broadcast(sizes), "m0")
        .select(col("m0").as("cohort_month"), col("age"), col("n_cust"),
          col("rev_cents"), col("cum_cents"),
          expr("cum_cents div n_cust").as("ltv_cents"))
        .orderBy("cohort_month", "age")
    }),

    // record linkage by Jaro-Winkler: the same cheap-block/expensive-verify
    // shape as q226, but scored with the native codegen JaroWinkler
    // expression (bit-identical to the oracle's jaro_winkler_similarity —
    // operation order pinned in plans/JaroWinkler.scala, so round(6) never
    // sits on a rounding boundary); blocks are (brand, type) — Σblock²
    // candidates, never n² — and identical names are excluded so the
    // readout is the near-miss tier edit distance misses
    "q310_jaro_winkler" -> ((s, dir) => {
      val b = Tables.part(s, dir).select(
        col("p_partkey").as("k"), col("p_brand"), col("p_type"), col("p_name"))
      val lhs = b.select(col("k").as("part_a"), col("p_brand").as("brand"),
        col("p_type").as("ptype"), col("p_name").as("name_a"))
      val rhs = b.select(col("k").as("part_b"), col("p_brand").as("brand_b"),
        col("p_type").as("ptype_b"), col("p_name").as("name_b"))
      lhs.join(rhs, col("brand") === col("brand_b") && col("ptype") === col("ptype_b")
          && col("part_a") < col("part_b") && col("name_a") =!= col("name_b"))
        .select(col("part_a"), col("part_b"), col("brand"),
          round(JaroWinkler(col("name_a"), col("name_b")), 6).as("jw_r6"))
        .filter(col("jw_r6") >= 0.88)
        .orderBy(col("jw_r6").desc, col("part_a"), col("part_b")).limit(25)
    }),

    // inverted-index size planning: distinct postings split into 2^16-doc
    // chunks (operators/Indexing.scala — no window partition ever exceeds
    // 65,536 rows regardless of term frequency), chunk-local delta gaps,
    // LEB128 varint width by threshold CASE; per-term compressed size +
    // bytes/posting, top-20 heaviest terms
    "q311_postings_size" -> ((s, dir) =>
      Indexing.postingsChunks(Tables.documents(s, dir), "doc_id", "text")
        .withColumn("vb", Indexing.vbyteBytes("gap"))
        .groupBy(col("w").as("term"))
        .agg(count(lit(1)).as("df"),
          countDistinct(col("chunk")).as("n_chunks"),
          sum(col("vb")).as("vbyte_bytes"))
        .withColumn("bytes_per_posting_ppm", expr("vbyte_bytes * 1000000 div df"))
        .orderBy(col("vbyte_bytes").desc, col("term")).limit(20)),

    // roaring-container choice census over the same chunk grid: per
    // (term, chunk) the cost model picks array (2B/posting) vs run
    // (2+4B/run) vs bitmap (fixed 8192B); the census totals each
    // container's postings and bytes with the saving vs all-array
    "q312_bitmap_containers" -> ((s, dir) =>
      Indexing.containerCensus(Tables.documents(s, dir), "doc_id", "text")),

    // hard-example mining for contrastive training: per query the best
    // same-label positive and best different-label negative from ONE
    // corpus scan (two conditional struct-argmax aggregations — nothing
    // sorts |corpus|·|queries| rows), margin < 0 flags label noise
    "q313_hard_negatives" -> ((s, dir) =>
      Similarity.hardExamples(Tables.embeddings(s, dir), "vec_id", "embedding",
        "label", nQueries = 8)),

    // CUPED variance reduction: pre-period customer revenue as the control
    // covariate for the post-period A/B readout (deterministic md5 arms) —
    // θ from pooled exact integer moments (decimal38 covariance numerators,
    // the q54 discipline), adjusted means via floored integer steps both
    // engines replay bit-for-bit, ρ² on 1e-12-scaled numerators. ONE scan
    // of orders → one customer aggregate → one 1-row moment aggregate.
    "q314_cuped" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        (col("o_orderdate") < lit("1998-01-01")).as("pre"),
        centsOf(col("o_totalprice")).as("v"))
      val cust = o.groupBy("o_custkey")
        .agg(sum(when(col("pre"), col("v")).otherwise(0L)).as("x"),
          sum(when(!col("pre"), col("v")).otherwise(0L)).as("y"))
        .withColumn("grp",
          Dedup.md5Long(concat(lit("cuped#"), col("o_custkey").cast("string")), 12) % 2)
      val xd = col("x").cast(dec38)
      val yd = col("y").cast(dec38)
      cust.agg(
        count(lit(1)).cast(dec38).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * yd).as("sxy"), sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"),
        count(when(col("grp") === 1, lit(1))).cast(dec38).as("n_t"),
        count(when(col("grp") === 0, lit(1))).cast(dec38).as("n_c"),
        sum(when(col("grp") === 1, xd).otherwise(lit(0).cast(dec38))).as("sx_t"),
        sum(when(col("grp") === 0, xd).otherwise(lit(0).cast(dec38))).as("sx_c"),
        sum(when(col("grp") === 1, yd).otherwise(lit(0).cast(dec38))).as("sy_t"),
        sum(when(col("grp") === 0, yd).otherwise(lit(0).cast(dec38))).as("sy_c"))
        .withColumn("cov", expr("n * sxy - sx * sy"))
        .withColumn("varx", expr("n * sxx - sx * sx"))
        .withColumn("vary", expr("n * syy - sy * sy"))
        .withColumn("theta_ppm", expr("cov * 1000000 div varx"))
        .withColumn("mx", expr("sx div n"))
        .withColumn("adj_t",
          expr("sy_t div n_t - theta_ppm * (sx_t div n_t - mx) div 1000000"))
        .withColumn("adj_c",
          expr("sy_c div n_c - theta_ppm * (sx_c div n_c - mx) div 1000000"))
        .select(
          col("n_t").cast("long").as("n_treat"),
          col("n_c").cast("long").as("n_ctrl"),
          col("theta_ppm").cast("long").as("theta_ppm"),
          expr("CAST(sy_t div n_t AS BIGINT)").as("mean_treat_cents"),
          expr("CAST(sy_c div n_c AS BIGINT)").as("mean_ctrl_cents"),
          expr("CAST(sy_t div n_t - sy_c div n_c AS BIGINT)").as("raw_lift_cents"),
          expr("CAST(adj_t - adj_c AS BIGINT)").as("adj_lift_cents"),
          // Spark `div` yields LONG — re-widen to decimal before squaring
          // (the 1e-12-scaled numerators multiply to ~10^28)
          expr("CAST(CAST(cov div 1000000000000 AS DECIMAL(38,0))" +
            " * CAST(cov div 1000000000000 AS DECIMAL(38,0)) * 1000000" +
            " div (CAST(varx div 1000000000000 AS DECIMAL(38,0))" +
            " * CAST(vary div 1000000000000 AS DECIMAL(38,0))) AS BIGINT)")
            .as("var_reduction_ppm"))
    }),

    // isotonic (PAV) calibration of the q293 quality-vs-dup-rate curve via
    // the minimax identity iso(i) = max_{j≤i} min_{k≥i} avg(y[j..k]):
    // everything after the one corpus aggregation runs on the ≤10-row
    // decile grid (prefix sums → ≤55 intervals → ≤1000 triples), and the
    // interval averages are floored ppm integers — floor commutes with
    // min/max, so the result is EXACTLY the floor of the true PAV fit
    "q315_isotonic_calibration" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
      val dups = d.groupBy("text").agg(count(lit(1)).as("n_copies"))
      val bins = TextFunctions.withQualityColumns(d, "text")
        .select(col("text"), least(floor(col("quality") * 10), lit(9L)).as("decile"))
        .join(dups, Seq("text"))
        .withColumn("is_dup", when(col("n_copies") > 1, 1L).otherwise(0L))
        .groupBy("decile").agg(count(lit(1)).as("w"), sum(col("is_dup")).as("sdup"))
      val win = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      val pre = bins
        .withColumn("cw", sum(col("w")).over(win))
        .withColumn("cs", sum(col("sdup")).over(win))
      val lj = pre.select(col("decile").as("j"),
        (col("cw") - col("w")).as("w0"), (col("cs") - col("sdup")).as("s0"))
      val rk = pre.select(col("decile").as("k"), col("cw").as("w1"), col("cs").as("s1"))
      val iv = lj.crossJoin(rk).filter(col("j") <= col("k"))
        .select(col("j"), col("k"),
          expr("(s1 - s0) * 1000000 div (w1 - w0)").as("avg_ppm"))
      val iso = iv
        .select(col("j"), col("avg_ppm"), explode(expr("sequence(j, k)")).as("i"))
        .groupBy("i", "j").agg(min(col("avg_ppm")).as("mn"))
        .groupBy("i").agg(max(col("mn")).as("iso_rate_ppm"))
      bins.join(iso, col("decile") === col("i"))
        .select(col("decile"), col("w").as("n_docs"),
          expr("sdup * 1000000 div w").as("raw_rate_ppm"),
          col("iso_rate_ppm"))
        .orderBy("decile")
    }),

    // Johnson-Lindenstrauss distortion audit: 64→16 random ±1 projection
    // (signs from md5 parity — portable, no RNG), projections as EXACT
    // integer sums over 1e-6-quantized components (commutative — no float
    // association order anywhere before the final rounded division); per
    // query the cosine error of the projected space vs the exact cosine,
    // the readout that calibrates how small a sketch the ANN tier can use
    "q316_jl_distortion" -> ((s, dir) => {
      val signs = s.range(64L * 16L).select(
        expr("id div 16").as("i"), expr("id % 16").as("j"))
        .withColumn("sgn",
          when(Dedup.md5Long(concat(lit("jl#"), col("i"), lit("#"), col("j")), 12) % 2 === 0,
            1L).otherwise(-1L))
      val comps = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), col("i").cast("long").as("i"),
          expr("CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("x6"))
      val proj = comps.join(broadcast(signs), Seq("i"))
        .groupBy("vec_id", "j").agg(sum(col("x6") * col("sgn")).as("p"))
      val pq = proj.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("j"), col("p").as("q6"))
      val pairs = proj.join(pq, Seq("j"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id").as("cand_id"))
        .agg(sum(col("q6") * col("p")).as("dotp"),
          sum(col("q6") * col("q6")).as("nq2"), sum(col("p") * col("p")).as("nc2"))
        .withColumn("cos_proj",
          round(col("dotp").cast("double") / (sqrt(col("nq2").cast("double")) *
            sqrt(col("nc2").cast("double"))), 6))
      val emb = Similarity.withNorm(Tables.embeddings(s, dir), "embedding")
      val qv = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("emb_d").as("qv"), col("nrm").as("qn"))
      val exact = emb.join(broadcast(qv), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"),
          Similarity.cosine(col("qv"), col("qn"), col("emb_d"), col("nrm")).as("cos_exact"))
      pairs.join(exact, Seq("query_id", "cand_id"))
        .withColumn("err_ppm",
          expr("abs(CAST(round((cos_proj - cos_exact) * 1000000) AS BIGINT))"))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_cands"),
          expr("sum(err_ppm) div count(1)").as("mean_err_ppm"),
          max(col("err_ppm")).as("max_err_ppm"))
        .orderBy("query_id")
    }),

    // corpus diversity panel (Self-BLEU-style): 256 deterministic doc pairs
    // (min-h vs max-h per md5 bucket — two aggregates, no global sort, no
    // all-pairs), exact 3-gram Jaccard per pair, banded histogram — the
    // generated-data diversity readout dedup can't see (it only flags the
    // near-1 tail; this measures the whole distribution)
    "q317_corpus_diversity" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
      val pairs = base
        .select(col("doc_id"),
          Dedup.md5Long(concat(lit("div#"), col("doc_id").cast("string")), 12).as("h"))
        .withColumn("bucket", col("h") % 256)
        .groupBy("bucket")
        .agg(min(struct(col("h"), col("doc_id"))).as("lo"),
          max(struct(col("h"), col("doc_id"))).as("hi"))
        .select(col("bucket"), col("lo.doc_id").as("doc_a"), col("hi.doc_id").as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
      val grams = Dedup.shingleRows(base, "doc_id", "text", 3).distinct()
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = pairs
        .join(grams.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
        .join(grams.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      pairs
        .join(inter, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("inter"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
        .withColumn("jac_ppm", expr("inter * 1000000 div (sza + szb - inter)"))
        // log-decade bands: a diverse corpus piles up near zero, so linear
        // 0.1-wide bands would collapse to one row
        .withColumn("band", expr("CASE WHEN jac_ppm = 0 THEN 0" +
          " WHEN jac_ppm < 1000 THEN 1 WHEN jac_ppm < 10000 THEN 2" +
          " WHEN jac_ppm < 100000 THEN 3 ELSE 4 END").cast("long"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(jac_ppm) div count(1)").as("mean_jac_ppm"))
        .orderBy("band")
    }),

    // word2vec-style negative-sampling table: sqrt-smoothed unigram weights
    // (sqrt IS correctly-rounded IEEE — pow(c, 0.75) is not portable across
    // libms) over the bounded top-256 vocab, cumulative ranges from one
    // dictionary-only window, then 1000 deterministic md5 draws resolved by
    // range containment against the broadcast table — the sampling-table
    // build + goodness-of-fit check a training loader runs before an epoch
    "q318_negative_sampling" -> ((s, dir) => {
      val vocab = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(256)
        .withColumn("wt", floor(sqrt(col("c").cast("double")) * 1000).cast("long"))
      val win = Window.orderBy(col("c").desc, col("w"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranges = vocab.withColumn("lo", coalesce(sum(col("wt")).over(win), lit(0L)))
      val tot = ranges.agg(sum(col("wt")).as("t"))
      val draws = s.range(1000).select(col("id").as("draw"))
        .crossJoin(broadcast(tot))
        .withColumn("u",
          Dedup.md5Long(concat(lit("ns#"), col("draw").cast("string")), 12) % col("t"))
      draws
        .join(broadcast(ranges),
          col("u") >= col("lo") && col("u") < col("lo") + col("wt"))
        .groupBy("w", "wt").agg(count(lit(1)).as("drawn"))
        .crossJoin(broadcast(tot))
        .select(col("w").as("token"),
          expr("wt * 1000000 div t").as("expected_ppm"),
          col("drawn"),
          (col("drawn") * 1000).as("drawn_ppm"))
        .withColumn("gap_ppm", abs(col("drawn_ppm") - col("expected_ppm")))
        .orderBy(col("drawn").desc, col("token")).limit(20)
    }),

    // index-format bake-off over the same chunked postings: varint deltas
    // (q311) vs an Elias-Fano cost model (l = floor(log2(65536 div n)) low
    // bits per posting + 2 upper bits, via the exact bin-length trick) vs
    // the roaring container census (q312) — the one-page answer to "which
    // postings encoding do we ship"
    "q319_index_formats" -> ((s, dir) => {
      val chunks = Indexing.postingsChunks(Tables.documents(s, dir), "doc_id", "text")
        .localCheckpoint(false)
      val vb = chunks.withColumn("vbb", Indexing.vbyteBytes("gap"))
        .agg(sum(col("vbb")).as("total_bytes"), count(lit(1)).as("n_postings"))
        .select(lit("vbyte").as("format"), col("total_bytes"), col("n_postings"))
      val ef = chunks.groupBy("w", "chunk").agg(count(lit(1)).as("n"))
        .withColumn("l", (length(expr("bin(65536 div n)")) - 1).cast("long"))
        .withColumn("bytes", expr("(n * (l + 2) + 7) div 8"))
        .agg(sum(col("bytes")).as("total_bytes"), sum(col("n")).as("n_postings"))
        .select(lit("elias_fano").as("format"), col("total_bytes"), col("n_postings"))
      val roaring = chunks
        .groupBy("w", "chunk")
        .agg(count(lit(1)).as("n"), sum(col("run_start")).as("n_runs"))
        .withColumn("bytes", least(col("n") * 2, col("n_runs") * 4 + 2, lit(8192L)))
        .agg(sum(col("bytes")).as("total_bytes"), sum(col("n")).as("n_postings"))
        .select(lit("roaring").as("format"), col("total_bytes"), col("n_postings"))
      vb.unionAll(ef).unionAll(roaring)
        .withColumn("bytes_per_posting_ppm", expr("total_bytes * 1000000 div n_postings"))
        .orderBy("format")
    }),

    // transposition-aware linkage: pairs where UNRESTRICTED Damerau-
    // Levenshtein (native codegen expression, Lowrance-Wagner — pure
    // integer DP, exact by construction) beats plain Levenshtein — the
    // swapped-token near-misses an edit-distance-only matcher under-ranks;
    // same (brand, type) blocking as q226/q310
    "q320_damerau_linkage" -> ((s, dir) => {
      val b = Tables.part(s, dir).select(
        col("p_partkey").as("k"), col("p_brand"), col("p_type"), col("p_name"))
      val lhs = b.select(col("k").as("part_a"), col("p_brand").as("brand"),
        col("p_type").as("ptype"), col("p_name").as("name_a"))
      val rhs = b.select(col("k").as("part_b"), col("p_brand").as("brand_b"),
        col("p_type").as("ptype_b"), col("p_name").as("name_b"))
      // both distances are symmetric metrics, so they live on the NAME
      // DICTIONARY (≤ vocab² unordered pairs — 2k rows here), not on the
      // 1.3M blocked part pairs: the DP runs once per name pair, the pair
      // relation joins the tiny strict-win table (also the 100 TB shape —
      // the dictionary is bounded while the pair fact grows quadratically
      // with block size). Measured 7.2 s → ~0.6 s at sf0.1.
      val names = b.select(col("p_name").as("na")).distinct()
      val strictWins = names
        .join(broadcast(names.select(col("na").as("nb"))), col("na") < col("nb"))
        .select(col("na"), col("nb"),
          levenshtein(col("na"), col("nb")).cast("long").as("lev"),
          graft.plans.DamerauLevenshtein(col("na"), col("nb")).as("dl"))
        .filter(col("dl") < col("lev"))
      lhs.join(rhs, col("brand") === col("brand_b") && col("ptype") === col("ptype_b")
          && col("part_a") < col("part_b"))
        .withColumn("na", least(col("name_a"), col("name_b")))
        .withColumn("nb", greatest(col("name_a"), col("name_b")))
        .join(broadcast(strictWins), Seq("na", "nb"))
        .select(col("part_a"), col("part_b"), col("brand"), col("lev"), col("dl"))
        .orderBy(col("dl"), col("part_a"), col("part_b")).limit(25)
    }),

    // cluster-coherent sharding audit: if training shards are assigned by
    // doc id, a near-dup cluster straddles shards (duplicate gradient
    // steps land in different workers' epochs — the dedup guarantee
    // silently weakens); assigning by CLUSTER id keeps components whole
    // with near-identical balance. One row per policy, split rate + the
    // max-shard load in ppm of ideal.
    "q321_cluster_sharding" -> ((s, dir) => {
      val lbl = graft.operators.ConnectedComponents.labels(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text"),
        "doc_a", "doc_b")
      val asg = Tables.documents(s, dir).select(col("doc_id"))
        .join(lbl, col("doc_id") === col("node"), "left")
        .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster"))
        .withColumn("shard_doc",
          Dedup.md5Long(concat(lit("shard#"), col("doc_id").cast("string")), 12) % 8)
        .withColumn("shard_cl",
          Dedup.md5Long(concat(lit("shard#"), col("cluster").cast("string")), 12) % 8)
        .localCheckpoint(false)
      def policy(name: String, shardCol: String): DataFrame = {
        val byCl = asg.groupBy("cluster")
          .agg(count(lit(1)).as("sz"), countDistinct(col(shardCol)).as("ns"))
        val stats = byCl.agg(
          count(lit(1)).as("n_clusters"),
          sum(when(col("sz") > 1, 1L).otherwise(0L)).as("n_multi"),
          sum(when(col("sz") > 1 && col("ns") > 1, 1L).otherwise(0L)).as("n_split"))
        val load = asg.groupBy(shardCol).agg(count(lit(1)).as("n"))
          .agg(max(col("n")).as("max_n"), sum(col("n")).as("t"))
        stats.crossJoin(load)
          .select(lit(name).as("policy"), col("n_clusters"), col("n_multi"),
            col("n_split"),
            expr("CASE WHEN n_multi > 0 THEN n_split * 1000000 div n_multi ELSE 0 END")
              .as("split_ppm"),
            expr("max_n * 8 * 1000000 div t").as("max_shard_ppm"))
      }
      policy("by_doc", "shard_doc").unionAll(policy("by_cluster", "shard_cl"))
        .orderBy("policy")
    }),

    // MRR + MAP@10 of the IVF index against brute-force relevance — the
    // remaining classic retrieval metrics next to q294's nDCG and q307's
    // RBO: reciprocal first-hit rank and mean precision-at-hit, both as
    // exact integer rationals on the bounded |Q|·k hit relation
    "q322_mrr_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
          nCentroids = 8, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("p"))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
        .withColumn("rhit", row_number().over(
          Window.partitionBy("query_id").orderBy("p")).cast("long"))
      val agg = hits.groupBy("query_id").agg(
        count(lit(1)).as("n_hits"),
        min(col("p")).as("first_hit_rank"),
        sum(expr("rhit * 1000000000 div p")).as("sum_prec_nano"))
      exact.select("query_id").distinct()
        .join(agg, Seq("query_id"), "left")
        .na.fill(0L, Seq("n_hits"))
        .select(col("query_id"), col("n_hits"),
          col("first_hit_rank"),
          expr("CASE WHEN first_hit_rank IS NOT NULL" +
            " THEN 1000000000 div first_hit_rank END").as("mrr_nano"),
          expr("CASE WHEN sum_prec_nano IS NOT NULL" +
            " THEN sum_prec_nano div 10 ELSE 0 END").as("ap_nano"))
        .orderBy("query_id")
    }),

    // trending terms between ingestion-order halves (heavy-change
    // detection): per-term Laplace-smoothed share ratio second-half vs
    // first-half in exact ppm (decimal38 cross-products — the counts
    // alone overflow long beyond ~sf10), top-10 risers + fallers — the
    // corpus-drift monitor next to q111's temporal JSD
    "q323_trending_terms" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
      val bound = base.agg(max(col("doc_id")).as("mx"))
      val counts = base.crossJoin(broadcast(bound))
        .select((col("doc_id") * 2 <= col("mx")).as("first_half"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(
          sum(when(col("first_half"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("first_half"), 1L).otherwise(0L)).as("cb"))
        .localCheckpoint(false)
      val tot = counts.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"),
        count(lit(1)).as("v"))
      val scored = counts.crossJoin(broadcast(tot))
        .withColumn("score_ppm",
          expr("CAST((cb + 1) AS DECIMAL(38,0)) * (ta + v) * 1000000" +
            " div (CAST((ca + 1) AS DECIMAL(38,0)) * (tb + v))"))
      scored.orderBy(col("score_ppm").desc, col("w")).limit(10)
        .withColumn("direction", lit("rising"))
        .unionAll(scored.orderBy(col("score_ppm").asc, col("w")).limit(10)
          .withColumn("direction", lit("falling")))
        .select(col("direction"), col("w").as("term"), col("ca"), col("cb"),
          col("score_ppm"))
        .orderBy("direction", "score_ppm", "term")
    }),

    // event debouncing: suppress same-(user, type) events closer than 5 s
    // to their predecessor — the stream-cleaning rule that kills double
    // clicks and retry storms before aggregation; per-type keep rate.
    // Same per-key lag window shape as q36's sessionize (skew-bounded by
    // the (user, type) key)
    "q324_event_debounce" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("kept", col("prev").isNull || col("us") - col("prev") >= 5000000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("keep_ppm", expr("n_kept * 1000000 div n_events"))
        .orderBy("event_type")
    }),

    // Pareto onion peeling: q213's frontier removed and recomputed 3
    // times (bounded unrolled loop, each layer the same two-window
    // dominance test — never the O(n²) anti-join); per-layer census.
    // Layer depth is the "how many rounds of best-offers exist" readout
    "q325_pareto_layers" -> ((s, dir) => {
      def frontier(p: DataFrame): DataFrame = {
        val wCheaper = Window.orderBy("price_c").rangeBetween(Window.unboundedPreceding, -1)
        val wSame = Window.partitionBy("price_c")
        p.withColumn("mx_cheaper", max(col("psize")).over(wCheaper))
          .withColumn("mx_same", max(col("psize")).over(wSame))
          .withColumn("on_front",
            !(coalesce(col("mx_cheaper") >= col("psize"), lit(false))
              || col("mx_same") > col("psize")))
      }
      var rest = Tables.part(s, dir).select(col("p_partkey"),
        centsOf(col("p_retailprice")).as("price_c"),
        col("p_size").cast("long").as("psize"))
      var out: DataFrame = null
      for (layer <- 1 to 3) {
        val f = frontier(rest).localCheckpoint(false)
        val front = f.filter(col("on_front"))
          .select(lit(layer.toLong).as("layer"), col("p_partkey"),
            col("price_c"), col("psize"))
        out = if (out == null) front else out.unionAll(front)
        rest = f.filter(!col("on_front")).select("p_partkey", "price_c", "psize")
      }
      out.groupBy("layer")
        .agg(count(lit(1)).as("n_parts"), min(col("price_c")).as("min_price_c"),
          max(col("psize")).as("max_size"))
        .orderBy("layer")
    }),

    // storage-encoding planner: per column of lineitem in storage order
    // ((l_orderkey, l_linenumber) within ~4k-order row groups — the
    // parquet-page view), value runs, ndv, and exact byte estimates for
    // plain vs dictionary vs RLE; the planner picks the cheapest. The melt
    // is map-side (stack), windows are bounded by the row-group grid (no
    // global sort), and the dictionary pass runs on the tiny distinct sets
    "q326_encoding_planner" -> ((s, dir) => {
      val melted = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        expr("stack(4," +
          " 'returnflag', l_returnflag," +
          " 'linestatus', l_linestatus," +
          " 'quantity', CAST(CAST(round(l_quantity, 0) AS BIGINT) AS STRING)," +
          " 'suppkey', CAST(l_suppkey AS STRING)) AS (col_name, v)"))
        .withColumn("rg", expr("l_orderkey div 4096"))
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic lineitem
      // — v as the final tie-break makes the storage order total per column
      // (equal triples are interchangeable for run counting)
      val w = Window.partitionBy("col_name", "rg")
        .orderBy("l_orderkey", "l_linenumber", "v")
      val runs = melted
        .withColumn("run_start",
          coalesce(lag(col("v"), 1).over(w) =!= col("v"), lit(true)))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_values"),
          sum(when(col("run_start"), 1L).otherwise(0L)).as("n_runs"),
          sum(length(col("v")).cast("long")).as("plain_bytes"))
      val dict = melted.select("col_name", "v").distinct()
        .groupBy("col_name")
        .agg(count(lit(1)).as("ndv"),
          sum(length(col("v")).cast("long")).as("dict_char_bytes"))
      runs.join(dict, Seq("col_name"))
        .withColumn("bit_width", expr(
          "CAST(CASE WHEN ndv <= 2 THEN 1 WHEN ndv <= 4 THEN 2" +
            " WHEN ndv <= 16 THEN 4 WHEN ndv <= 256 THEN 8" +
            " WHEN ndv <= 65536 THEN 16 ELSE 32 END AS BIGINT)"))
        .withColumn("dict_bytes",
          expr("dict_char_bytes + (n_values * bit_width + 7) div 8"))
        .withColumn("rle_bytes",
          expr("dict_char_bytes + n_runs * (4 + (bit_width + 7) div 8)"))
        .withColumn("chosen", expr(
          "CASE WHEN rle_bytes <= dict_bytes AND rle_bytes <= plain_bytes" +
            " THEN 'rle' WHEN dict_bytes <= plain_bytes THEN 'dict'" +
            " ELSE 'plain' END"))
        .select("col_name", "n_values", "ndv", "n_runs", "bit_width",
          "plain_bytes", "dict_bytes", "rle_bytes", "chosen")
        .orderBy("col_name")
    }),

    // front-coded dictionary audit: the customer-name dictionary built per
    // 4096-key row group (parquet-style block-local dictionaries — every
    // window partition is bounded, no global sort), LCP vs the previous
    // sorted term via a 16-way unrolled prefix compare (pure codegen CASE
    // chain, no UDF), per-block raw vs front-coded bytes (1-byte shared-
    // prefix length per entry). Zero-padded id-style names are the classic
    // front-coding win; savings_ppm quantifies it exactly
    "q327_front_coding" -> ((s, dir) => {
      val terms = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name").as("term"))
        .withColumn("rg", expr("c_custkey div 4096"))
        .select("rg", "term").distinct()
      val w = Window.partitionBy("rg").orderBy("term")
      val lcpExpr = (1 to 16).map(l =>
        s"CASE WHEN substring(term, 1, $l) = substring(prev, 1, $l)" +
          s" THEN ${l}L ELSE 0L END").mkString("greatest(", ", ", ")")
      terms.withColumn("prev", lag(col("term"), 1).over(w))
        .withColumn("lcp",
          when(col("prev").isNull, 0L).otherwise(expr(lcpExpr)))
        .groupBy("rg")
        .agg(count(lit(1)).as("n_terms"),
          sum(length(col("term")).cast("long")).as("raw_bytes"),
          sum(col("lcp")).as("saved_bytes"))
        .withColumn("front_bytes", expr("raw_bytes - saved_bytes + n_terms"))
        .withColumn("savings_ppm",
          expr("(saved_bytes - n_terms) * 1000000 div raw_bytes"))
        .orderBy("rg")
    }),

    // TPC-H Q20 shape on this schema (no partsupp): suppliers whose 1997
    // shipments of red-named parts dominate their total 1997 volume —
    // filtered part dictionary broadcast-joined as a flag (the semi-join
    // side), ONE conditional aggregate per supplier, bounded dim joins for
    // the readout; top-10 red-specialists by exact ppm share
    "q328_red_specialists" -> ((s, dir) => {
      val red = Tables.part(s, dir)
        .filter(col("p_name").startsWith("red"))
        .select(col("p_partkey").as("l_partkey"), lit(true).as("is_red"))
      val qty = expr("CAST(round(l_quantity, 0) AS BIGINT)")
      val per = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01")
          && col("l_shipdate") < lit("1998-01-01"))
        .join(broadcast(red), Seq("l_partkey"), "left")
        .groupBy("l_suppkey")
        .agg(sum(when(col("is_red"), qty).otherwise(0L)).as("red_qty"),
          sum(qty).as("total_qty"))
        .withColumn("red_share_ppm", expr("red_qty * 1000000 div total_qty"))
      per.join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name").as("nation"),
          col("red_qty"), col("total_qty"), col("red_share_ppm"))
        .orderBy(col("red_share_ppm").desc, col("s_name")).limit(10)
    }),

    // Bloom-filter sizing planner for per-source membership filters: the
    // optimal bits/key is the CONSTANT ln(1/p)/ln²2 per fpp tier —
    // precomputed as scaled-ppm integer literals so both engines do pure
    // integer arithmetic (no runtime ln/pow), k = round(ln(1/p)/ln 2).
    // One tiny groupBy over the source dictionary, map-side tier fan-out
    "q329_bloom_sizing" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source").agg(count(lit(1)).as("n_keys"))
        .select(col("source"), col("n_keys"),
          expr("stack(3," +
            " 10000L,  9585058L,  7L," +
            "  1000L, 14377588L, 10L," +
            "   100L, 19170117L, 13L) AS (fpp_ppm, bits_per_key_ppm, k_hashes)"))
        .withColumn("m_bits", expr("(n_keys * bits_per_key_ppm + 999999) div 1000000"))
        .withColumn("m_bytes", expr("(m_bits + 7) div 8"))
        .orderBy("source", "fpp_ppm")),

    // zone-map pruning-power audit: per candidate layout column of orders,
    // 4096-key blocks in storage order carry [min, max]; pruning power =
    // 1 − avg block width / global width (ppm) — the fraction of the
    // domain a point predicate skips via min-max stats alone. Dates become
    // epoch-day integers; two tiny groupBys, no windows. o_orderkey (the
    // layout key — contiguous block ranges) is the built-in positive
    // control (~1.0); this synthetic data stores dates and custkeys in
    // random order, so the audit must report BOTH as unclustered (~0)
    "q330_zonemap_power" -> ((s, dir) => {
      val melted = Tables.orders(s, dir).select(
        expr("o_orderkey div 4096").as("blk"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("od"),
        col("o_custkey").as("ck"), col("o_orderkey").as("ok"))
        .select(col("blk"),
          expr("stack(3, 'o_orderdate', od, 'o_custkey', ck," +
            " 'o_orderkey', ok) AS (col_name, v)"))
      melted.groupBy("col_name", "blk")
        .agg(min("v").as("mn"), max("v").as("mx"))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("mx") - col("mn")).as("sum_width"),
          min(col("mn")).as("gmin"), max(col("mx")).as("gmax"))
        .withColumn("global_width", expr("gmax - gmin"))
        .withColumn("avg_width_ppm",
          expr("sum_width * 1000000 div (n_blocks * global_width)"))
        .withColumn("pruning_power_ppm", expr("1000000 - avg_width_ppm"))
        .select("col_name", "n_blocks", "global_width", "avg_width_ppm",
          "pruning_power_ppm")
        .orderBy("col_name")
    }),

    // shuffle-partition planner: per candidate join key of lineitem, the
    // estimated shuffled bytes (fixed-width column model + measured string
    // lengths), the 64 MiB-target partition count, and the hottest key —
    // the skew flag is exactly the AQE skew criterion (hot key bigger than
    // the average partition). Two aggregations over map-side melted
    // (key, value) pairs; the hot key falls out of one struct-argmax
    "q331_shuffle_planner" -> ((s, dir) => {
      val melted = Tables.lineitem(s, dir).select(
        expr("68L + length(l_returnflag) + length(l_linestatus)").as("rb"),
        expr("stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey," +
          " 'l_suppkey', l_suppkey) AS (key_name, key_val)"))
      melted.groupBy("key_name", "key_val")
        .agg(count(lit(1)).as("c"), sum(col("rb")).as("b"))
        .groupBy("key_name")
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          sum(col("b")).as("est_bytes"),
          max(struct(col("c"), col("key_val"))).as("top"))
        .select(col("key_name"), col("n_keys"), col("n_rows"),
          col("est_bytes"),
          expr("(est_bytes + 67108863) div 67108864").as("parts_64mib"),
          col("top.key_val").as("hot_key"), col("top.c").as("hot_rows"),
          expr("top.c * 1000000 div n_rows").as("hot_ppm"),
          expr("top.c * ((est_bytes + 67108863) div 67108864) > n_rows")
            .as("skew_flag"))
        .orderBy("key_name")
    }),

    // product-quantization codebook audit (the IVF-PQ compression
    // decision): 64-dim vectors → 8 subspaces × 16 codes, exact integer
    // squared-error assignment against the broadcast codebook, per-subspace
    // utilization + distortion (operators/Similarity.pqCodebookAudit)
    "q332_pq_codebook" -> ((s, dir) =>
      Similarity.pqCodebookAudit(Tables.embeddings(s, dir), "vec_id",
        "embedding", subDim = 8, nCodes = 16)),

    // mergeable-histogram quantile estimator audit: per-month 64-bin
    // global-grid histograms merge by pure addition (the distributed
    // sketch shape — merged ≡ direct is spec-asserted), the merged
    // histogram answers p50/p90/p99 by in-bin linear interpolation, and
    // the audit reports the exact error vs the true order statistic
    // (q299's two-pass trick) in ppm of the domain. The only full-data
    // sort is the one-bin second pass; everything else is bounded
    "q333_histogram_quantiles" -> ((s, dir) => {
      val v = Tables.orders(s, dir).select(
        centsOf(col("o_totalprice")).as("v"),
        expr("date_trunc('month', o_orderdate)").as("mon"))
      val mm = v.agg(min(col("v")).as("gmin"), max(col("v")).as("gmax"),
        count(lit(1)).as("n"))
      val binned = v.crossJoin(broadcast(mm))
        .withColumn("bin", expr("(v - gmin) * 64 div (gmax - gmin + 1)"))
      // per-month histograms, merged by addition on the shared global grid
      val merged = binned.groupBy("mon", "bin").agg(count(lit(1)).as("c"))
        .groupBy("bin").agg(sum(col("c")).as("c"))
        .withColumn("cb", coalesce(sum(col("c")).over(
          Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val ks = s.sql("SELECT CAST(p AS BIGINT) AS p FROM VALUES (50),(90),(99) AS t(p)")
        .crossJoin(broadcast(mm))
        .select(col("p"), expr("(p * n + 99) div 100").as("k"),
          col("gmin"), col("gmax"))
      val est = ks.join(broadcast(merged),
          col("cb") < col("k") && col("cb") + col("c") >= col("k"))
        .withColumn("est_cents", expr(
          "gmin + (bin * (gmax - gmin + 1)) div 64" +
            " + ((k - cb) * ((gmax - gmin + 1) div 64)) div c"))
        .select(col("p"), col("k"), col("est_cents"), col("gmax"), col("gmin"),
          col("bin"), col("cb"))
      // exact order statistic: restrict the full sort to the target bin
      val exact = Tables.orders(s, dir).select(centsOf(col("o_totalprice")).as("v"))
        .crossJoin(broadcast(mm))
        .withColumn("vbin", expr("(v - gmin) * 64 div (gmax - gmin + 1)"))
        .join(broadcast(est.select(col("p"), col("bin"), (col("k") - col("cb")).as("off"))),
          col("vbin") === col("bin"))
        .withColumn("r", row_number().over(
          Window.partitionBy("p").orderBy("v")).cast("long"))
        .filter(col("r") === col("off"))
        .select(col("p"), col("v").as("exact_cents"))
      est.join(exact, Seq("p"))
        .select(col("p").as("pct"), col("k"), col("est_cents"),
          col("exact_cents"),
          expr("abs(est_cents - exact_cents) * 1000000 div (gmax - gmin + 1)")
            .as("err_domain_ppm"))
        .orderBy("pct")
    }),

    // join-cardinality planner audit, two-relation edition (q277 is the
    // self-join one): for each candidate lineitem join, the textbook
    // uniform estimate |L|·|R| / max(ndv_L, ndv_R) vs the EXACT join size
    // Σ c_L(k)·c_R(k) — computed from per-key count relations (never by
    // materializing the join). est/actual ratio in ppm is the planner's
    // error the optimizer would act on
    "q334_join_estimate" -> ((s, dir) => {
      def side(df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      def audit(name: String, l: DataFrame, lk: String,
          r: DataFrame, rk: String): DataFrame = {
        val ls = side(l, lk).withColumnRenamed("c", "ls_c").localCheckpoint(false)
        val rs = side(r, rk).withColumnRenamed("c", "rs_c").localCheckpoint(false)
        val actual = ls.join(rs, Seq("k"))
          .agg(sum(expr("ls_c * rs_c")).as("actual_rows"))
        val stats = ls.agg(sum(col("ls_c")).as("n_left"),
            count(lit(1)).as("ndv_left"))
          .crossJoin(rs.agg(sum(col("rs_c")).as("n_right"),
            count(lit(1)).as("ndv_right")))
        stats.crossJoin(actual)
          .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
            col("ndv_left"), col("ndv_right"),
            // decimal38 cross-product: |L|·|R| overflows long at ~sf30
            expr("CAST(CAST(n_left AS DECIMAL(38,0)) * n_right" +
              " div greatest(ndv_left, ndv_right) AS BIGINT)").as("est_rows"),
            col("actual_rows"))
      }
      val li = Tables.lineitem(s, dir)
      val a1 = audit("lineitem_orders", li, "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")
      val a2 = audit("lineitem_part", li, "l_partkey",
        Tables.part(s, dir), "p_partkey")
      val a3 = audit("lineitem_supplier", li, "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey")
      a1.unionAll(a2).unionAll(a3)
        .withColumn("est_over_actual_ppm",
          expr("est_rows * 1000000 div actual_rows"))
        .orderBy("join_name")
    }),

    // multimodal frame-sampling schedule: the REAL plumbing end-to-end —
    // binary media column → typed mapPartitions decode (Multimodal
    // .extractMeta, the codec-batch shape) → every-4th-frame schedule
    // (Multimodal.sampleFrames, pure array arithmetic). The oracle replays
    // the deterministic stub from byte length; a real codec changes ONE
    // function and this query's shape is unchanged
    "q335_frame_schedule" -> ((s, dir) => {
      val media = Multimodal.withMediaColumn(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
      val meta = Multimodal.extractMeta(media, "doc_id")
      Multimodal.sampleFrames(meta, stride = 4)
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
          size(col("sampled_frames")).cast("long").as("n_sampled"),
          array_join(col("sampled_frames"), ",").as("frames"))
        .orderBy("doc_id")
    }),

    // multimodal resize batching: aspect-ratio buckets (the vision-model
    // preprocessing grid), per-bucket GPU batches of 32 with padding
    // waste, and the pixel budget before/after one resizeStub halving —
    // the "what does a resize pass save" readout. Decode via the same
    // typed mapPartitions path; everything downstream is a bounded groupBy
    "q336_resize_plan" -> ((s, dir) => {
      val media = Multimodal.withMediaColumn(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
      val meta = Multimodal.extractMeta(media, "doc_id")
        .withColumn("bucket", expr(
          "CASE WHEN width * 1000 div greatest(height, 1) < 800 THEN 'portrait'" +
            " WHEN width * 1000 div greatest(height, 1) < 1250 THEN 'square'" +
            " ELSE 'landscape' END"))
        .withColumn("px_before", expr("CAST(width AS BIGINT) * height"))
      Multimodal.resizeStub(meta, factor = 1)
        .withColumn("px_after", expr("CAST(width AS BIGINT) * height"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_images"),
          sum(col("px_before")).as("sum_px_before"),
          sum(col("px_after")).as("sum_px_after"))
        .withColumn("n_batches", expr("(n_images + 31) div 32"))
        .withColumn("pad_waste", expr("n_batches * 32 - n_images"))
        .withColumn("px_ratio_ppm",
          expr("sum_px_after * 1000000 div greatest(sum_px_before, 1)"))
        .select("bucket", "n_images", "n_batches", "pad_waste",
          "sum_px_before", "sum_px_after", "px_ratio_ppm")
        .orderBy("bucket")
    }),

    // multimodal audio chunking plan: byte length → duration (32 B/ms
    // stub codec), 30 s windows with 1 s overlap (29 s stride — the
    // Whisper-style segmentation), per-source chunk budget. The chunk
    // count is closed-form integer arithmetic — the planner never
    // materializes per-chunk rows until a downstream stage asks
    "q337_audio_chunks" -> ((s, dir) => {
      val media = Multimodal.withMediaColumn(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
      Multimodal.extractMeta(media, "doc_id")
        .join(Tables.documents(s, dir).select("doc_id", "source"), Seq("doc_id"))
        .withColumn("dur_ms", expr("n_bytes * 1000 div 32"))
        .withColumn("n_chunks", expr(
          "CASE WHEN dur_ms <= 0 THEN 0 WHEN dur_ms <= 30000 THEN 1" +
            " ELSE 1 + (dur_ms - 30000 + 28999) div 29000 END"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("dur_ms")).as("total_dur_ms"),
          sum(col("n_chunks")).as("total_chunks"))
        .withColumn("avg_chunk_ms",
          expr("total_dur_ms div greatest(total_chunks, 1)"))
        .orderBy("source")
    }),

    // golden-record entity resolution, end-to-end: (brand, type) blocking
    // → name-similarity edges (Jaro-Winkler ≥ 0.88 computed ONCE on the
    // bounded name dictionary, q320's trick; same-name pairs link via
    // JW = 1) → connected components → one canonical record per cluster
    // (min-id keeper carrying min price / max size / name variety). The
    // q226/q297/q310 linkage pieces composed the way an MDM pipeline
    // actually runs them; oracled against the recursive-CTE closure
    "q338_golden_record" -> ((s, dir) => {
      val b = Tables.part(s, dir).select(col("p_partkey").as("k"),
        col("p_brand"), col("p_type"), col("p_name"),
        centsOf(col("p_retailprice")).as("price_c"),
        col("p_size").cast("long").as("psize"))
      val names = b.select(col("p_name").as("na")).distinct()
      val simNames = names
        .join(broadcast(names.select(col("na").as("nb"))), col("na") <= col("nb"))
        .filter(round(JaroWinkler(col("na"), col("nb")), 6) >= 0.88)
        .select("na", "nb")
      val edges = b.select(col("k").as("doc_a"), col("p_brand").as("brand"),
          col("p_type").as("ptype"), col("p_name").as("name_a"))
        .join(b.select(col("k").as("doc_b"), col("p_brand").as("brand_b"),
          col("p_type").as("ptype_b"), col("p_name").as("name_b")),
          col("brand") === col("brand_b") && col("ptype") === col("ptype_b")
            && col("doc_a") < col("doc_b"))
        .withColumn("na", least(col("name_a"), col("name_b")))
        .withColumn("nb", greatest(col("name_a"), col("name_b")))
        .join(broadcast(simNames), Seq("na", "nb"))
        .select("doc_a", "doc_b")
      graft.operators.ConnectedComponents.labels(edges, "doc_a", "doc_b")
        .join(b, col("node") === col("k"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("p_name")).as("n_names"),
          min(col("price_c")).as("min_price_c"),
          max(col("psize")).as("max_size"))
        .orderBy(col("n_members").desc, col("cluster_id")).limit(25)
    }),

    // attribution model comparison: for each purchase, the 7-day
    // lookback touch set per user — first-touch and last-touch credit a
    // single type (struct-argmin/argmax, no window), linear credit
    // splits 1e6 micro-credits by floor division. The three models side
    // by side is the readout marketing actually argues over (q164 is
    // last-prev-event only; q244 is the Markov counterfactual)
    "q339_attribution_models" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id").as("t_id"),
          col("event_type").as("touch"), col("us").as("t_us"))
      val joined = purchases.join(touches, Seq("user_id"))
        .filter(col("t_us") < col("p_us")
          && col("t_us") >= col("p_us") - 604800000000L)
        .localCheckpoint(false)
      val perPurchase = joined.groupBy("p_id")
        .agg(count(lit(1)).as("n_touches"),
          min(struct(col("t_us"), col("t_id"), col("touch"))).as("f"),
          max(struct(col("t_us"), col("t_id"), col("touch"))).as("l"))
        .localCheckpoint(false)
      val firstAgg = perPurchase.groupBy(col("f.touch").as("touch"))
        .agg(count(lit(1)).as("first_purchases"))
      val lastAgg = perPurchase.groupBy(col("l.touch").as("touch"))
        .agg(count(lit(1)).as("last_purchases"))
      val linAgg = joined.join(perPurchase.select("p_id", "n_touches"), Seq("p_id"))
        .groupBy("touch")
        .agg(sum(expr("1000000 div n_touches")).as("linear_u"))
      firstAgg.join(lastAgg, Seq("touch"), "full_outer")
        .join(linAgg, Seq("touch"), "full_outer")
        .na.fill(0L, Seq("first_purchases", "last_purchases", "linear_u"))
        .orderBy("touch")
    }),

    // runtime-filter (bloom semi-join) planning: the 1997-H1 orders build
    // side against the lineitem probe — exact match/non-match counts from
    // ONE conditional aggregate, then per-fpp-tier expected scan size and
    // filter bytes (q329's scaled-ppm constants). This is the number AQE's
    // runtime row-filter decision needs before shuffling the probe side
    "q340_runtime_filter_plan" -> ((s, dir) => {
      val build = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01")
          && col("o_orderdate") < lit("1997-07-01"))
        .select(col("o_orderkey").as("l_orderkey"), lit(true).as("hit"))
      val counts = Tables.lineitem(s, dir)
        .join(broadcast(build), Seq("l_orderkey"), "left")
        .agg(count(lit(1)).as("n_probe"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_match"))
      val nb = build.agg(count(lit(1)).as("n_build"))
      counts.crossJoin(broadcast(nb))
        .select(col("n_probe"), col("n_match"), col("n_build"),
          expr("stack(3, 10000L, 9585058L, 1000L, 14377588L, 100L, 19170117L)" +
            " AS (fpp_ppm, bits_per_key_ppm)"))
        .withColumn("bloom_bytes",
          expr("((n_build * bits_per_key_ppm + 999999) div 1000000 + 7) div 8"))
        .withColumn("expected_scanned",
          expr("n_match + (n_probe - n_match) * fpp_ppm div 1000000"))
        .withColumn("saved_ppm",
          expr("(n_probe - expected_scanned) * 1000000 div n_probe"))
        .select("fpp_ppm", "n_probe", "n_match", "n_build", "bloom_bytes",
          "expected_scanned", "saved_ppm")
        .orderBy("fpp_ppm")
    }),

    // OPTIMIZE planner (the table-rewrite decision): for three date
    // predicates, blocks scanned under the CURRENT layout (zone-map
    // overlap on q330's 4096-key grid) vs under a rewrite SORTED by
    // o_orderdate — where matching rows are rank-contiguous, so the
    // sorted block count is closed-form from the date histogram's prefix
    // sums (the global window runs on the bounded date dictionary only).
    // io_saved_ppm is the number that justifies (or kills) the rewrite
    "q341_optimize_planner" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        expr("o_orderkey div 4096").as("blk"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("d"))
        .localCheckpoint(false)
      val blocks = o.groupBy("blk").agg(min(col("d")).as("mn"),
        max(col("d")).as("mx"), count(lit(1)).as("c"))
      // [lo, hi) in epoch days: 1997-01-01=9862, +month, +quarter, +year —
      // integer literals on BOTH engines, no date-math divergence possible
      val preds = s.sql("SELECT * FROM VALUES" +
        " ('month', CAST(9862 AS BIGINT), CAST(9893 AS BIGINT))," +
        " ('quarter', 9862, 9952), ('year', 9862, 10227) AS t(pred, lo, hi)")
      val now = preds
        .join(broadcast(blocks), col("mn") < col("hi") && col("mx") >= col("lo"))
        .groupBy("pred")
        .agg(count(lit(1)).as("blocks_now"), sum(col("c")).as("rows_now"))
      val dd = o.groupBy("d").agg(count(lit(1)).as("c"))
        .withColumn("cb", coalesce(sum(col("c")).over(
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val srt = preds
        .join(broadcast(dd), col("d") >= col("lo") && col("d") < col("hi"))
        .groupBy("pred")
        .agg(sum(col("c")).as("matched_rows"),
          min(col("cb") + 1).as("first_rk"), max(col("cb") + col("c")).as("last_rk"))
        .withColumn("blocks_sorted",
          expr("(last_rk - 1) div 4096 - (first_rk - 1) div 4096 + 1"))
      now.join(srt, Seq("pred"))
        .select(col("pred"), col("matched_rows"), col("rows_now"),
          col("blocks_now"), col("blocks_sorted"),
          expr("(blocks_now - blocks_sorted) * 1000000 div blocks_now")
            .as("io_saved_ppm"))
        .orderBy("pred")
    }),

    // external-sort spill planner: the lineitem global sort under three
    // executor memory budgets — per-partition bytes from q331's byte
    // model, spill segment count, merge passes at fan-in 16, and the total
    // re-written bytes. ONE aggregate + a map-side budget fan-out; the
    // readout sizes spark.sql.shuffle.partitions before the job runs
    "q342_sort_spill_plan" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .agg(sum(expr("68L + length(l_returnflag) + length(l_linestatus)"))
          .as("total_bytes"), count(lit(1)).as("n_rows"))
        .select(col("total_bytes"), col("n_rows"),
          expr("stack(3, 16777216L, 67108864L, 268435456L) AS (mem_bytes)"))
        .withColumn("part_bytes", expr("(total_bytes + 31) div 32"))
        .withColumn("segments",
          expr("greatest((part_bytes + mem_bytes - 1) div mem_bytes, 1L)"))
        .withColumn("merge_passes", expr(
          "CAST(CASE WHEN segments <= 1 THEN 0 WHEN segments <= 16 THEN 1" +
            " WHEN segments <= 256 THEN 2 ELSE 3 END AS BIGINT)"))
        .withColumn("spilled_bytes", expr(
          "CASE WHEN segments <= 1 THEN 0L ELSE total_bytes * merge_passes END"))
        .select("mem_bytes", "n_rows", "total_bytes", "part_bytes",
          "segments", "merge_passes", "spilled_bytes")
        .orderBy("mem_bytes")),

    // incremental dup-cluster maintenance: yesterday's labels (docs below
    // the id midpoint) merged with today's candidate batch via
    // ConnectedComponents.incrementalLabels — the old side enters as
    // contracted stars, so the merge converges in a round or two. The
    // oracle is the FULL-recompute recursive CTE (q79's chain): the
    // incremental path must hash-match it exactly
    "q343_incremental_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
        .select("doc_a", "doc_b").localCheckpoint(false)
      val mid = docs.agg(expr("max(doc_id) div 2").as("mid"))
      val cm = cand.crossJoin(broadcast(mid))
      val oldE = cm.filter(col("doc_a") < col("mid") && col("doc_b") < col("mid"))
        .select("doc_a", "doc_b")
      val newE = cm.filter(!(col("doc_a") < col("mid") && col("doc_b") < col("mid")))
        .select("doc_a", "doc_b")
      graft.operators.ConnectedComponents.incrementalLabels(
          graft.operators.ConnectedComponents.labels(oldE, "doc_a", "doc_b"),
          newE, "doc_a", "doc_b")
        .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          ((col("cluster_size") - 1) * col("n_clusters")).as("n_removable"))
        .orderBy("cluster_size")
    }),

    // snapshot-retention reclaim planner: monthly order snapshots under
    // retention windows of 1 / 3 / 12 months — months to expire, exact
    // bytes freed vs kept (q331's byte model), freed share in ppm. ONE
    // month-grain aggregate + a 1-row latest-month bound + map-side tier
    // fan-out: the storage-lifecycle readout before a VACUUM
    "q344_retention_reclaim" -> ((s, dir) => {
      val byMon = Tables.orders(s, dir).select(
        expr("year(o_orderdate) * 12 + month(o_orderdate)").as("mi"),
        expr("32L + length(o_orderstatus) + length(o_orderpriority)").as("rb"))
        .groupBy("mi").agg(count(lit(1)).as("n_rows"), sum(col("rb")).as("bytes"))
      val latest = byMon.agg(max(col("mi")).as("latest_mi"))
      byMon.crossJoin(broadcast(latest))
        .withColumn("age", expr("latest_mi - mi"))
        .select(col("age"), col("n_rows"), col("bytes"),
          expr("stack(3, 1L, 3L, 12L) AS (retention_months)"))
        .groupBy("retention_months")
        .agg(count(lit(1)).as("n_months_total"),
          sum(when(col("age") >= col("retention_months"), 1L).otherwise(0L))
            .as("months_freed"),
          sum(when(col("age") >= col("retention_months"), col("bytes"))
            .otherwise(0L)).as("bytes_freed"),
          sum(when(col("age") < col("retention_months"), col("bytes"))
            .otherwise(0L)).as("bytes_kept"))
        .withColumn("freed_ppm",
          expr("bytes_freed * 1000000 div (bytes_freed + bytes_kept)"))
        .orderBy("retention_months")
    }),

    // equi-DEPTH histogram build (the CBO stats pass q333's equi-width
    // grid can't give): 7 octile boundaries located by the q299 two-pass
    // trick — bounded-bin pass 1, single-bin sort pass 2 — then the exact
    // ≤-boundary row count per cut; tie_skew_ppm measures how far value
    // ties push the realized bucket edge off the ideal rank (the thing
    // equi-depth stats consumers must tolerate)
    "q345_equidepth_histogram" -> ((s, dir) => {
      val v = Tables.orders(s, dir).select(centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val n1 = v.agg(count(lit(1)).as("n"))
      val hist = v.groupBy(expr("v div 65536").as("bin")).agg(count(lit(1)).as("c"))
        .withColumn("cb", coalesce(sum(col("c")).over(
          Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val ks = s.sql(
        "SELECT CAST(i AS BIGINT) AS i FROM VALUES (1),(2),(3),(4),(5),(6),(7) AS t(i)")
        .crossJoin(broadcast(n1))
        .select(col("i"), expr("(i * n) div 8").as("k"), col("n"))
      val tb = ks.join(broadcast(hist),
          col("cb") < col("k") && col("cb") + col("c") >= col("k"))
        .select(col("i"), col("k"), col("n"), col("bin"),
          (col("k") - col("cb")).as("off"))
      val bounds = v.join(broadcast(tb), expr("v div 65536") === col("bin"))
        .withColumn("r",
          row_number().over(Window.partitionBy("i").orderBy("v")).cast("long"))
        .filter(col("r") === col("off"))
        .select(col("i"), col("k"), col("n"), col("v").as("boundary_cents"))
        .localCheckpoint(false)
      val rowsLe = v.join(broadcast(bounds.select("i", "boundary_cents")),
          col("v") <= col("boundary_cents"))
        .groupBy("i").agg(count(lit(1)).as("rows_le"))
      bounds.join(rowsLe, Seq("i"))
        .select(col("i").as("cut"), col("k").as("ideal_rank"),
          col("boundary_cents"), col("rows_le"),
          expr("(rows_le - k) * 1000000 div n").as("tie_skew_ppm"))
        .orderBy("cut")
    }),

    // CBO range-selectivity audit: `price > X` estimated from the 64-bin
    // equi-width histogram (full bins above X + uniform in-bin
    // interpolation — the textbook formula every optimizer uses) against
    // the exact count, for thresholds at 25 / 50 / 90% of the domain.
    // err_ppm is SIGNED: the direction the optimizer would mis-plan
    "q346_selectivity_audit" -> ((s, dir) => {
      val v = Tables.orders(s, dir).select(centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val mm = v.agg(min(col("v")).as("gmin"), max(col("v")).as("gmax"),
        count(lit(1)).as("n"))
      val hist = v.crossJoin(broadcast(mm))
        .groupBy(expr("(v - gmin) * 64 div (gmax - gmin + 1)").as("bin"))
        .agg(count(lit(1)).as("c"))
      val preds = mm.select(col("gmin"), col("gmax"), col("n"),
          expr("stack(3, 25L, 50L, 90L) AS (pct)"))
        .withColumn("x", expr("gmin + (gmax - gmin) * pct div 100"))
      val est = preds.join(broadcast(hist), lit(true))
        .withColumn("bin_lo", expr("gmin + (bin * (gmax - gmin + 1)) div 64"))
        .withColumn("bin_hi", expr("gmin + ((bin + 1) * (gmax - gmin + 1)) div 64"))
        .withColumn("contrib", expr(
          "CASE WHEN bin_lo > x THEN c" +
            " WHEN bin_hi > x THEN c * (bin_hi - x) div (bin_hi - bin_lo)" +
            " ELSE 0L END"))
        .groupBy("pct", "x", "n")
        .agg(sum(col("contrib")).as("est_rows"))
      val actual = v.join(broadcast(preds.select("pct", "x")), col("v") > col("x"))
        .groupBy("pct").agg(count(lit(1)).as("actual_rows"))
      est.join(actual, Seq("pct"))
        .select(col("pct"), col("x").as("threshold_cents"),
          col("est_rows"), col("actual_rows"),
          expr("(est_rows - actual_rows) * 1000000 div n").as("err_ppm"))
        .orderBy("pct")
    }),

    // exact count(DISTINCT) under ROLLUP — the Expand-operator path q52's
    // plain cube aggregates never exercise: each input row fans out per
    // grouping set, the distinct de-dups inside each set. Per (lang,
    // source) grid cell, subtotal, and grand total: distinct texts + rows
    "q347_distinct_rollup" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .rollup("lang", "source")
        .agg(countDistinct(col("text")).as("n_texts"), count(lit(1)).as("n_docs"))
        .select(
          coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_texts"), col("n_docs"))
        .orderBy("lang", "source")),

    // several count(DISTINCT ...) over DIFFERENT columns in one aggregate
    // — the multi-Expand plan (one fan-out per distinct column set) that
    // single-distinct queries never hit. Per source: distinct langs,
    // distinct texts, distinct (lang, text) combos, plus a plain sum
    "q348_multi_distinct" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("source")
        .agg(countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("text")).as("n_texts"),
          // coalesce pins the NULL convention: Spark's multi-col distinct
          // drops null-bearing tuples while DuckDB's row-struct counts
          // them — with the sentinel both engines count identically
          countDistinct(coalesce(col("lang"), lit("<null>")), col("text"))
            .as("n_lang_texts"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("source")),

    // pivot with TWO measures per pivot value (count + char sum) — the
    // PivotFirst path where each (source, lang) cell carries a struct of
    // aggregates, widened to typed columns; q34 pivots a single count
    "q349_pivot_measures" -> ((s, dir) => {
      val langs = Seq("en", "fr", "zh")
      val piv = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("source")
        .pivot("lang", langs)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      piv.select(
        col("source") +: langs.flatMap(l => Seq(
          coalesce(col(s"${l}_n"), lit(0L)).as(s"${l}_n"),
          coalesce(col(s"${l}_chars"), lit(0L)).as(s"${l}_chars"))): _*)
        .orderBy("source")
    }),

    // PERCENTILE_DISC vs PERCENTILE_CONT side by side — the two ANSI
    // median definitions differ exactly when a group has even count, and
    // pipelines silently mixing them corrupt threshold logic. disc is an
    // exact order statistic (integer cents, no rounding); cont
    // interpolates (rounded to 6dp for the cross-engine hash)
    "q350_percentile_disc_cont" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), centsOf(col("o_totalprice")).as("v"))
        .createOrReplaceTempView("q350_v")
      s.sql(
        """SELECT o_orderpriority AS priority,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p50_disc_cents,
          |       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY v), 6) AS p50_cont,
          |       CAST(count(*) % 2 AS BIGINT) AS odd_count
          |FROM q350_v GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // top-3 WITH TIES per brand (rank ≤ 3, ties included — the ANSI
    // FETCH FIRST ... WITH TIES semantics row_number-based top-k silently
    // truncates): parts sharing the 3rd-highest price all surface
    "q351_top_ties" -> ((s, dir) => {
      val w = Window.partitionBy("p_brand").orderBy(col("price_c").desc)
      Tables.part(s, dir)
        .select(col("p_brand"), col("p_partkey"),
          centsOf(col("p_retailprice")).as("price_c"))
        .withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_rows"),
          max(col("rk")).as("max_rank"),
          min(col("price_c")).as("cutoff_cents"),
          sum(col("price_c")).as("sum_cents"))
        .orderBy("p_brand")
    }),

    // deterministic grouped MODE: the modal ship-quantity per return flag
    // via struct-argmax (max count, ties to the SMALLEST value) — the
    // built-in mode() leaves ties engine-dependent, so pipelines that
    // need reproducible modal imputation use exactly this shape
    "q352_group_mode" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          expr("CAST(round(l_quantity, 0) AS BIGINT)").as("q"))
        .groupBy("l_returnflag", "q")
        .agg(count(lit(1)).as("c"))
        .groupBy("l_returnflag")
        .agg(max(struct(col("c"), (-col("q")).as("nq"), col("q"))).as("b"),
          sum(col("c")).as("n_rows"))
        .select(col("l_returnflag"), col("b.q").as("mode_qty"),
          col("b.c").as("mode_count"), col("n_rows"),
          expr("b.c * 1000000 div n_rows").as("mode_share_ppm"))
        .orderBy("l_returnflag")),

    // gaps-and-islands: runs of CONSECUTIVE active days per user via the
    // day − dense_rank constant-group trick (one window per user, no
    // self-join) — the classic streak analysis; corpus-wide island-length
    // histogram plus the longest streak
    "q353_activity_islands" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"),
          expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days.withColumn("grp", col("day") - dense_rank().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy(col("len").as("island_days"))
        .agg(count(lit(1)).as("n_islands"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("island_days")
    }),

    // hierarchical percent-of-parent: nation revenue as a share of its
    // region AND of the grand total, exact ppm from integer cents — the
    // two-level drill-down readout (q194 is single-level). Region sums
    // come from one window over the 25-row nation aggregate; no second
    // fact scan
    "q354_hierarchy_share" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
      rev
        .withColumn("region_c", sum(col("rev_c")).over(Window.partitionBy("region")))
        .withColumn("total_c", sum(col("rev_c")).over(Window.partitionBy()))
        .select(col("region"), col("nation"), col("rev_c"),
          expr("rev_c * 1000000 div region_c").as("of_region_ppm"),
          expr("rev_c * 1000000 div total_c").as("of_total_ppm"))
        .orderBy("region", "nation")
    }),

    // DAU / WAU / MAU stickiness: each (user, day) fans out map-side to
    // every 7-day and 28-day window END it supports (q137's shape — never
    // a distinct-over-range window, which can't skew-split), ONE
    // distinct-count aggregate per grain, stickiness = DAU/MAU in ppm.
    // Last 5 full days for a bounded, stable readout
    "q355_stickiness" -> ((s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"),
          expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
        .distinct()
        .localCheckpoint(false)
      val bound = ud.agg(max(col("day")).as("mxd"))
      def actives(span: Int, name: String): DataFrame = ud
        .select(col("user_id"),
          explode(expr(s"sequence(day, day + ${span - 1})")).as("d"))
        .crossJoin(broadcast(bound))
        .filter(col("d") > col("mxd") - 5 && col("d") <= col("mxd"))
        .groupBy(col("d")).agg(countDistinct(col("user_id")).as(name))
      actives(1, "dau")
        .join(actives(7, "wau"), Seq("d"))
        .join(actives(28, "mau"), Seq("d"))
        .select(col("d").as("day"), col("dau"), col("wau"), col("mau"),
          expr("dau * 1000000 div mau").as("stickiness_ppm"))
        .orderBy("day")
    }),

    // ordered LISTAGG (ANSI listagg WITHIN GROUP — new in Spark 4): the
    // three cheapest part names per brand as one comma-joined column,
    // bounded by a rank pre-filter so no group aggregates more than 3
    // strings (the q66 roll-up-cap discipline)
    "q356_listagg_ordered" -> ((s, dir) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("price_c"), col("p_name"), col("p_partkey"))
      Tables.part(s, dir)
        .select(col("p_brand"), col("p_name"),
          centsOf(col("p_retailprice")).as("price_c"), col("p_partkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .createOrReplaceTempView("q356_v")
      s.sql(
        """SELECT p_brand,
          |       CAST(count(*) AS BIGINT) AS n,
          |       listagg(p_name, ',') WITHIN GROUP (ORDER BY rk) AS cheapest3
          |FROM q356_v GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // the official unpivot/melt API (Spark 3.4+) — the typed inverse of
    // pivot, where every earlier melt in this repo used stack():
    // lineitem's four money-ish measures to (metric, value) rows, cents
    // summed per metric
    "q357_unpivot_api" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          centsOf(col("l_extendedprice")).as("extendedprice"),
          centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("discounted"),
          centsOf(col("l_extendedprice") * col("l_tax")).as("tax_amount"),
          expr("CAST(round(l_quantity, 0) AS BIGINT)").as("quantity"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("extendedprice"), col("discounted"), col("tax_amount"),
            col("quantity")),
          "metric", "v")
        .groupBy("metric")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
        .orderBy("metric")),

    // LATERAL correlated subquery (SQL surface — the per-row dependent
    // join Catalyst plans via DomainJoin rewrite): each region's two
    // highest-balance suppliers, correlated through the nation bridge
    "q358_lateral_topk" -> ((s, dir) => {
      Tables.supplier(s, dir).createOrReplaceTempView("q358_s")
      Tables.nation(s, dir).createOrReplaceTempView("q358_n")
      Tables.region(s, dir).createOrReplaceTempView("q358_r")
      s.sql(
        """SELECT r.r_name AS region, t.s_name, t.bal_c
          |FROM q358_r r,
          |LATERAL (
          |  SELECT s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_c
          |  FROM q358_s s JOIN q358_n n ON s.s_nationkey = n.n_nationkey
          |  WHERE n.n_regionkey = r.r_regionkey
          |  ORDER BY bal_c DESC, s.s_name LIMIT 2
          |) t
          |ORDER BY region, t.bal_c DESC, t.s_name""".stripMargin)
    }),

    // WITH RECURSIVE in SPARK SQL (new in Spark 4.x): a LINEAR recursion —
    // month-over-month cash projection where each level carries exactly
    // one row (balance = prior − 10% drawdown + that month's revenue
    // cents) and the recursion terminates when the month join empties.
    // Spark's recursive CTEs require UNION ALL (no fixpoint dedup), so
    // graph closures stay on ConnectedComponents.labels — this is the
    // class of recursion the SQL surface is FOR, and the DuckDB oracle
    // replays it statement-for-statement
    "q359_recursive_projection" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
        // 24-month horizon: each recursion level is a sequential Spark
        // job, so the projection length IS the latency knob
        .filter(col("mi") < 24)
        // each recursion level re-executes the view's plan — materialize
        // the monthly relation once or the fact scan runs per level
        // (measured 23.7 s → ~2 s at sf0.1)
        .localCheckpoint(false)
        .createOrReplaceTempView("q359_rev")
      s.sql(
        """WITH RECURSIVE bal(mi, b) AS (
          |  SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
          |  UNION ALL
          |  SELECT r.mi, bal.b - bal.b div 10 + r.rev_c
          |  FROM bal JOIN q359_rev r ON r.mi = bal.mi + 1
          |)
          |SELECT mi AS month_index, b AS balance_cents
          |FROM bal WHERE mi >= 0 ORDER BY mi""".stripMargin)
    }),

    // VARIANT round-trip (Spark 4's semi-structured type): a JSON payload
    // built per order, parsed to VARIANT, fields pulled back out with
    // typed variant_get — the schema-on-read path for event payloads that
    // don't fit a fixed schema. The oracle replays the identical JSON via
    // DuckDB's json_extract; totals prove the round-trip is lossless
    "q360_variant_json" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(concat(lit("{\"p\":\""), col("o_orderpriority"),
          lit("\",\"t\":"), centsOf(col("o_totalprice")).cast("string"),
          lit(",\"k\":"), col("o_orderkey").cast("string"), lit("}")).as("js"))
        .createOrReplaceTempView("q360_js")
      s.sql(
        """SELECT variant_get(parse_json(js), '$.p', 'string') AS priority,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(variant_get(parse_json(js), '$.t', 'long')) AS BIGINT)
          |         AS total_cents,
          |       CAST(max(variant_get(parse_json(js), '$.k', 'long')) AS BIGINT)
          |         AS max_key
          |FROM q360_js GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // SQL-language UDFs (CREATE FUNCTION ... RETURN, Spark 4): the Gopher
    // word-count rule as a named SQL function applied per document — the
    // governed-UDF path where logic ships as SQL, stays in Catalyst (fully
    // inlined and codegen'd — never a black-box lambda), and any engine
    // can replay it
    "q361_sql_udf" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), col("text"))
        .createOrReplaceTempView("q361_d")
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION q361_wc(t STRING)" +
        " RETURNS BIGINT RETURN CAST(size(split(t, ' ', -1)) AS BIGINT)")
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION q361_ok(t STRING)" +
        " RETURNS BOOLEAN RETURN q361_wc(t) BETWEEN 3 AND 500")
      s.sql(
        """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(q361_wc(text)) AS BIGINT) AS total_words,
          |       CAST(sum(CASE WHEN q361_ok(text) THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_pass
          |FROM q361_d GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // interval-union "watch time": each event opens a 30 s attention
    // window; overlaps must not double-count, so per user the islands
    // merge via the running-max-end trick (new island when this start
    // exceeds every prior end) — one window pass, no self-join. Per-user
    // covered seconds roll up to a bounded histogram
    "q362_interval_union" -> ((s, dir) => {
      val iv = Tables.events(s, dir).select(col("user_id"),
        unix_micros(col("ts")).as("st"))
        .withColumn("en", col("st") + 30000000L)
      val w = Window.partitionBy("user_id").orderBy("st", "en")
      val covered = iv
        .withColumn("max_en", max(col("en")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when(col("max_en").isNull || col("st") > col("max_en"), 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
        .groupBy("user_id")
        .agg(sum(expr("(ien - ist) div 1000000")).as("covered_s"),
          count(lit(1)).as("n_islands"))
      covered.groupBy(expr("covered_s div 60").as("covered_min"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("n_islands")).as("total_islands"))
        .orderBy("covered_min")
    }),

    // quantile normalization (the microarray/batch-correction transform):
    // every source's length distribution is mapped onto the common
    // reference curve — value at rank r becomes the cross-source mean of
    // rank-r values. Ranks come from one per-source window; the reference
    // curve is a bounded per-rank aggregate. Readout: per source, the
    // mean shift the normalization applies (exact integer sums)
    "q363_quantile_normalize" -> ((s, dir) => {
      val ranked = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), col("n_chars"))
        .withColumn("r", row_number().over(
          Window.partitionBy("source").orderBy("n_chars")))
      val ref = ranked.groupBy("r")
        .agg(sum(col("n_chars")).as("sv"), count(lit(1)).as("c"))
        .withColumn("ref_milli", expr("sv * 1000 div c"))
      ranked.join(broadcast(ref.select("r", "ref_milli")), Seq("r"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_raw"),
          sum(col("ref_milli")).as("sum_norm_milli"))
        .withColumn("shift_milli",
          expr("sum_norm_milli div n_docs - sum_raw * 1000 div n_docs"))
        .orderBy("source")
    }),

    // von Neumann ratio (mean squared successive difference / variance)
    // on the daily revenue series — the classic randomness-vs-trend test
    // next to q245's lag-1 autocorrelation: VN ≈ 2 means white noise,
    // VN < 2 positive drift. Exact decimal38 numerators, one bounded
    // daily aggregate + one lag window over it
    "q364_von_neumann" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("d"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
      val w = Window.orderBy("d")
      daily
        .withColumn("dv", col("v") - lag(col("v"), 1).over(w))
        .agg(count(lit(1)).cast(dec38).as("n"),
          sum(col("v").cast(dec38)).as("sv"),
          sum((col("v").cast(dec38)) * col("v").cast(dec38)).as("svv"),
          sum(when(col("dv").isNotNull,
            col("dv").cast(dec38) * col("dv").cast(dec38))
            .otherwise(lit(0).cast(dec38))).as("sdd"),
          count(col("dv")).cast(dec38).as("nd"))
        .select(
          col("n").cast("long").as("n_days"),
          expr("CAST(sdd div nd AS BIGINT)").as("mssd_c2"),
          expr("CAST((n * svv - sv * sv) div (n * n) AS BIGINT)").as("var_c2"),
          // re-widen the floored mssd to decimal before ×1e6: cents² are
          // ~1e17, so the product overflows long by 5 orders of magnitude
          expr("CAST(CAST(sdd div nd AS DECIMAL(38,0)) * 1000000" +
            " div CAST((n * svv - sv * sv) div (n * n) AS DECIMAL(38,0))" +
            " AS BIGINT)").as("vn_ratio_ppm"))
    }),

    // higher-order array functions as the per-row compute surface
    // (filter / transform / aggregate / exists over the split-word array
    // — no explode, no UDF): per language, integer word-length sums from
    // one HOF chain. HOFs are interpreted (not codegen) — fine for
    // per-row bounded arrays, wrong for hot shuffle paths; the explode
    // formulations elsewhere are the hot-path shape
    "q365_array_hof" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          expr("filter(split(text, ' '), w -> length(w) > 0)").as("ws"))
        .select(col("lang"),
          expr("size(ws)").cast("long").as("n_words"),
          expr("aggregate(transform(ws, w -> CAST(length(w) AS BIGINT))," +
            " 0L, (a, x) -> a + x)").as("char_sum"),
          expr("size(filter(ws, w -> length(w) > 5))").cast("long").as("n_long"),
          expr("CAST(exists(ws, w -> w = 'the') AS INT)").cast("long").as("has_the"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"),
          sum(col("char_sum")).as("total_chars"),
          sum(col("n_long")).as("total_long_words"),
          sum(col("has_the")).as("docs_with_the"))
        .orderBy("lang")),

    // null-imputation strategy comparison: a deterministic md5 mask nulls
    // ~20% of order totals, then mean / median / mode imputation are
    // compared against the TRUE sum — the data-prep decision (which
    // strategy distorts least) as one exact-ppm table. Median via the
    // q299 two-pass trick on observed values; mode on the cents
    // dictionary; mean floored — every path integer-exact
    "q366_imputation" -> ((s, dir) => {
      val v = Tables.orders(s, dir).select(col("o_orderkey"),
          centsOf(col("o_totalprice")).as("v"),
          (Dedup.md5Long(concat(lit("imp#"), col("o_orderkey").cast("string")), 12) % 5 === 0)
            .as("masked"))
        .localCheckpoint(false)
      val obs = v.filter(!col("masked"))
      val stats = obs.agg(count(lit(1)).as("n_obs"), sum(col("v")).as("s_obs"))
        .withColumn("mean_c", expr("s_obs div n_obs"))
      // exact median of observed: bounded 65536-wide bins + one-bin sort
      val hist = obs.groupBy(expr("v div 65536").as("bin")).agg(count(lit(1)).as("c"))
        .withColumn("cb", coalesce(sum(col("c")).over(
          Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val kk = stats.select(expr("(n_obs + 1) div 2").as("k"))
      val tb = kk.join(broadcast(hist), col("cb") < col("k") && col("cb") + col("c") >= col("k"))
        .select(col("k"), col("bin"), (col("k") - col("cb")).as("off"))
      val median = obs.join(broadcast(tb), expr("v div 65536") === col("bin"))
        .withColumn("r", row_number().over(Window.orderBy("v")).cast("long"))
        .filter(col("r") === col("off"))
        .select(col("v").as("median_c"))
      val mode = obs.groupBy("v").agg(count(lit(1)).as("c"))
        .agg(max(struct(col("c"), (-col("v")).as("nv"), col("v"))).as("b"))
        .select(col("b.v").as("mode_c"))
      val truth = v.agg(sum(col("v")).as("true_sum"), count(lit(1)).as("n_all"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
      truth.crossJoin(broadcast(stats)).crossJoin(broadcast(median))
        .crossJoin(broadcast(mode))
        .select(expr("stack(3," +
          " 'mean', s_obs + n_masked * mean_c," +
          " 'median', s_obs + n_masked * median_c," +
          " 'mode', s_obs + n_masked * mode_c) AS (strategy, imputed_sum)"),
          col("true_sum"), col("n_masked"))
        .withColumn("err_ppm",
          expr("(imputed_sum - true_sum) * 1000000 div true_sum"))
        .orderBy("strategy")
    }),

    // multi-window conversion: signup→purchase rates at 1 h / 24 h / 7 d
    // horizons from ONE per-user pair aggregate (first signup, first
    // purchase after it) — the funnel-latency table marketing reads next
    // to q171's median; exact ppm per horizon
    "q367_conversion_windows" -> ((s, dir) => {
      val u = Tables.events(s, dir)
        .filter(col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", unix_micros(col("ts"))))
          .as("sus"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
            .as("pus"))
        .filter(col("sus").isNotNull)
        .withColumn("delta_us",
          when(col("pus") >= col("sus"), col("pus") - col("sus")))
      u.select(col("delta_us"),
          expr("stack(3, 'h01', 3600000000L, 'h24', 86400000000L," +
            " 'd7', 604800000000L) AS (horizon, span_us)"))
        .groupBy("horizon")
        .agg(count(lit(1)).as("n_signups"),
          sum(when(col("delta_us") <= col("span_us"), 1L).otherwise(0L))
            .as("n_converted"))
        .withColumn("conversion_ppm",
          expr("n_converted * 1000000 div n_signups"))
        .orderBy("horizon")
    }),

    // LSH cost model: per band, the bucket-size census and the exact
    // Σ c·(c−1)/2 candidate-pair budget — the number the dedup planner
    // commits to BEFORE running the join — against the distinct candidate
    // count (multi-band overlap makes generated > distinct; the dup
    // factor in ppm is the banding overhead). Reuses the production
    // bandSignatures layout, so the model can never drift from q21
    "q368_lsh_cost_model" -> ((s, dir) => {
      val bands = Dedup.bandSignatures(
        Tables.documents(s, dir), "doc_id", "text").localCheckpoint(false)
      val perBand = bands.groupBy("b", "bsig").agg(count(lit(1)).as("c"))
        .groupBy("b")
        .agg(count(lit(1)).as("n_buckets"), max(col("c")).as("max_bucket"),
          sum(expr("c * (c - 1) div 2")).as("gen_pairs"))
      val distinctPairs = Dedup.minhashCandidates(
          Tables.documents(s, dir), "doc_id", "text")
        .agg(count(lit(1)).as("n_distinct"))
      perBand.crossJoin(broadcast(distinctPairs))
        .withColumn("total_gen",
          sum(col("gen_pairs")).over(Window.partitionBy()))
        .select(col("b").cast("long").as("band"), col("n_buckets"), col("max_bucket"),
          col("gen_pairs"), col("n_distinct"),
          expr("total_gen * 1000000 div greatest(n_distinct, 1)")
            .as("dup_factor_ppm"))
        .orderBy("band")
    }),

    // storage-tiering planner: parts classified hot / warm / cold by days
    // since their last shipment (vs the corpus max date — no wall clock),
    // with revenue share per tier — the data-temperature readout behind
    // tiered-storage placement. One fact aggregate + a 1-row max-date
    // bound
    "q369_storage_tiering" -> ((s, dir) => {
      val lastShip = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(max(datediff(col("l_shipdate"), lit("1970-01-01")).cast("long"))
          .as("last_day"),
          sum(centsOf(col("l_extendedprice"))).as("rev_c"))
      val mx = lastShip.agg(max(col("last_day")).as("mxd"))
      lastShip.crossJoin(broadcast(mx))
        .withColumn("tier", expr(
          "CASE WHEN mxd - last_day <= 30 THEN 'hot'" +
            " WHEN mxd - last_day <= 365 THEN 'warm' ELSE 'cold' END"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n_parts"), sum(col("rev_c")).as("rev_c"))
        .withColumn("rev_share_ppm", expr(
          "rev_c * 1000000 div sum(rev_c) OVER ()"))
        .orderBy("tier")
    }),

    // exact rolling 7-day median of daily revenue: collect_list over a
    // 7-ROW window (bounded by construction), sort, middle element — an
    // exact integer order statistic per day, emitted only where the
    // window is full so both engines agree on the odd-count middle
    "q370_rolling_median" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("d"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
      val w = Window.orderBy("d").rowsBetween(-6, 0)
      daily
        .withColumn("med",
          element_at(sort_array(collect_list(col("v")).over(w)), 4))
        .withColumn("rn", row_number().over(Window.orderBy("d")).cast("long"))
        .filter(col("rn") >= 7)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("v").as("revenue_c"), col("med").as("rolling_median_c"))
        .orderBy("day").limit(60)
    }),

    // additive seasonal decomposition of daily revenue: trend = centered
    // 7-day mean (full windows only), weekly seasonal = per-DOW mean of
    // the detrended series, residual = the rest — classic STL-lite in
    // exact milli-cents. DOW comes from epoch-day % 7 (1970-01-01 was a
    // Thursday) — pure integer, immune to the Sunday=0-vs-1 calendar
    // disagreements between engines. Windows run on the bounded date
    // dictionary only
    "q371_seasonal_decomposition" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("ed"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .withColumn("dow", expr("(ed + 4) % 7"))
      val w7 = Window.orderBy("ed").rowsBetween(-3, 3)
      val det = daily
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("trend_milli",
          when(col("n7") === 7, expr("sum(v) OVER (ORDER BY ed" +
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1000 div 7")))
        .filter(col("trend_milli").isNotNull)
        .withColumn("det_milli", col("v") * 1000 - col("trend_milli"))
        .localCheckpoint(false)
      val seasonal = det.groupBy("dow")
        .agg(expr("sum(det_milli) div count(1)").as("s_milli"))
      det.join(broadcast(seasonal), Seq("dow"))
        .withColumn("resid_milli", col("det_milli") - col("s_milli"))
        .groupBy("dow")
        .agg(count(lit(1)).as("n_days"), max(col("s_milli")).as("seasonal_milli"),
          expr("sum(abs(resid_milli)) div count(1)").as("mean_abs_resid_milli"))
        .orderBy("dow")
    }),

    // count-min sketch audit: depth-4 × width-256 counters over per-
    // customer order counts (md5-derived row hashes — portable), the
    // min-of-counters estimate vs the exact count for the top-20 keys.
    // over_ppm is CMS's signature one-sided error; the counters relation
    // (4×256 rows) broadcasts, so the audit adds no shuffle beyond the
    // base aggregate
    "q372_cms_audit" -> ((s, dir) => {
      val cc = Tables.orders(s, dir).groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n")).localCheckpoint(false)
      def hh(d: Int) =
        Dedup.md5Long(concat(lit(s"cms$d#"), col("k").cast("string")), 12) % 256
      val withH = cc
        .withColumn("h0", hh(0)).withColumn("h1", hh(1))
        .withColumn("h2", hh(2)).withColumn("h3", hh(3))
      val counters = withH.select(col("n"),
          expr("stack(4, 0L, h0, 1L, h1, 2L, h2, 3L, h3) AS (dd, bucket)"))
        .groupBy("dd", "bucket").agg(sum(col("n")).as("cnt"))
      val top = withH
        .orderBy(col("n").desc, col("k")).limit(20)
      top.select(col("k"), col("n"),
          expr("stack(4, 0L, h0, 1L, h1, 2L, h2, 3L, h3) AS (dd, bucket)"))
        .join(broadcast(counters), Seq("dd", "bucket"))
        .groupBy("k", "n").agg(min(col("cnt")).as("est"))
        .select(col("k").as("custkey"), col("n").as("exact"), col("est"),
          expr("(est - n) * 1000000 div n").as("over_ppm"))
        .orderBy(col("exact").desc, col("custkey"))
    }),

    // AND-query postings intersection planner: for the top-5 document-
    // frequency terms, every pair's estimated intersection under the
    // planner's independence assumption (df_a·df_b / N) vs the EXACT
    // intersection from one postings self-join on the bounded top-term
    // set — the q277/q334 estimate-audit family applied to the inverted
    // index
    "q373_postings_intersect" -> ((s, dir) => {
      val postings = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0).distinct()
        .localCheckpoint(false)
      val nDocs = postings.agg(countDistinct(col("doc_id")).as("nd"))
      val top = postings.groupBy("w").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("w")).limit(5)
      val tp = postings.join(broadcast(top), Seq("w"))
      val actual = tp.select(col("w").as("wa"), col("doc_id"))
        .join(tp.select(col("w").as("wb"), col("doc_id")), Seq("doc_id"))
        .filter(col("wa") < col("wb"))
        .groupBy("wa", "wb").agg(count(lit(1)).as("actual"))
      actual
        .join(broadcast(top.select(col("w").as("wa"), col("df").as("df_a"))), Seq("wa"))
        .join(broadcast(top.select(col("w").as("wb"), col("df").as("df_b"))), Seq("wb"))
        .crossJoin(broadcast(nDocs))
        .select(col("wa"), col("wb"), col("df_a"), col("df_b"),
          expr("df_a * df_b div nd").as("est"), col("actual"),
          expr("(df_a * df_b div nd) * 1000000 div actual").as("est_ppm"))
        .orderBy("wa", "wb")
    }),

    // custom typed Aggregator (functions/VarianceAgg.scala — the tier
    // between built-in aggregates and codegen expressions): exact
    // population variance of customer balances per market segment from a
    // flat (n, Σx, Σx²) long buffer with map-side combine; BigInt finish
    // so n·Σx² never overflows. The oracle replays the same integer
    // algebra in HUGEINT
    "q374_typed_udaf" -> ((s, dir) => {
      val varCents = udaf(graft.functions.VarianceAgg)
      Tables.customer(s, dir)
        .select(col("c_mktsegment").as("segment"),
          centsOf(col("c_acctbal")).as("bal_c"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("bal_c")).as("sum_c"),
          varCents(col("bal_c")).as("variance_c2"))
        .orderBy("segment")
    }),

    // MAP-typed columns end to end: per-source lang→count maps built with
    // map_from_entries, carried through a shuffle, then read back via
    // map_keys / element_at — the semi-structured column shape feature
    // tables use; the readout proves the round-trip is lossless
    "q375_map_type" -> ((s, dir) => {
      val m = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(map_from_entries(sort_array(collect_list(struct(col("lang"), col("c")))))
          .as("m"))
      m.select(col("source"),
          size(col("m")).cast("long").as("n_langs"),
          array_join(map_keys(col("m")), ",").as("langs"),
          expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("total_docs"),
          coalesce(element_at(col("m"), "en"), lit(0L)).as("en_docs"))
        .orderBy("source")
    }),

    // anti-entropy replica repair: replica B drifts deterministically
    // (orders whose md5 lands in 1/1000 gain one cent), per-4096-key
    // block digests (order-invariant sums of row hashes — the q132/q262
    // discipline) localize the damage, and the readout is the repair
    // plan: blocks to diff, rows to resync, and the transfer saving vs a
    // full copy. ONE scan computes both replicas' digests (the drift is
    // a pure column expression)
    "q376_replica_repair" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        centsOf(col("o_totalprice")).as("v"))
        .withColumn("drift",
          (Dedup.md5Long(concat(lit("rep#"), col("o_orderkey").cast("string")), 12)
            % 1000 === 0).cast("long"))
        .withColumn("blk", expr("o_orderkey div 4096"))
      val blocks = o.groupBy("blk").agg(
        count(lit(1)).as("n_rows"),
        sum(Dedup.md5Long(concat(col("o_orderkey").cast("string"), lit("#"),
          col("v").cast("string")), 12)).as("dig_a"),
        sum(Dedup.md5Long(concat(col("o_orderkey").cast("string"), lit("#"),
          (col("v") + col("drift")).cast("string")), 12)).as("dig_b"),
        sum(col("drift")).as("n_drifted"))
      blocks.agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("dig_a") =!= col("dig_b"), 1L).otherwise(0L))
          .as("blocks_differ"),
        sum(when(col("dig_a") =!= col("dig_b"), col("n_rows")).otherwise(0L))
          .as("rows_to_sync"),
        sum(col("n_drifted")).as("rows_actually_drifted"),
        sum(col("n_rows")).as("total_rows"))
        .withColumn("sync_saving_ppm",
          expr("(total_rows - rows_to_sync) * 1000000 div total_rows"))
    }),

    // block-level bloom data skipping for point lookups on an UNSORTED
    // column (where q330 shows zone maps skip nothing): per 4096-key
    // block, whether the probe custkey is present (exact), plus the
    // expected blocks read under a per-block bloom at each q329 fpp tier
    // — present_blocks + (absent_blocks · fpp). The readout is the
    // skipping-index decision zone maps can't make on random layouts
    "q377_block_bloom" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        expr("o_orderkey div 4096").as("blk"), col("o_custkey"))
      val probes = o.select(col("o_custkey")).distinct()
        .orderBy(col("o_custkey")).limit(5)
        .select(col("o_custkey").as("probe"))
      val hits = o.join(broadcast(probes), col("o_custkey") === col("probe"))
        .select("probe", "blk").distinct()
        .groupBy("probe").agg(count(lit(1)).as("present_blocks"))
      val nb = o.select("blk").distinct().agg(count(lit(1)).as("n_blocks"))
      hits.crossJoin(broadcast(nb))
        .select(col("probe"), col("n_blocks"), col("present_blocks"),
          expr("stack(3, 10000L, 1000L, 100L) AS (fpp_ppm)"))
        .withColumn("expected_read_milli", expr(
          "present_blocks * 1000 + (n_blocks - present_blocks) * fpp_ppm div 1000"))
        .withColumn("skip_ppm", expr(
          "(n_blocks * 1000 - expected_read_milli) * 1000 div n_blocks"))
        .orderBy("probe", "fpp_ppm")
    }),

    // bitmask rollups: each user's event types folded into ONE long via
    // bit_or (view=1, click=2, purchase=4, signup=8, error=16), then the
    // segment census by exact mask — the flags-column pattern that keeps
    // a 5-way behavioral segmentation in a single aggregate column
    "q378_bitmask_rollup" -> ((s, dir) => {
      val bit = expr(
        "CASE event_type WHEN 'view' THEN 1L WHEN 'click' THEN 2L" +
          " WHEN 'purchase' THEN 4L WHEN 'signup' THEN 8L" +
          " WHEN 'error' THEN 16L ELSE 32L END")
      Tables.events(s, dir)
        .select(col("user_id"), bit.as("b"))
        .groupBy("user_id").agg(bit_or(col("b")).as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("n_users"))
        .withColumn("has_purchase", expr("CAST((mask & 4) > 0 AS BOOLEAN)"))
        .withColumn("n_types", expr("bit_count(mask)").cast("long"))
        .select("mask", "n_types", "has_purchase", "n_users")
        .orderBy("mask")
    }),

    // SQL pipe syntax (|>, new in Spark 4) — the linear dataflow dialect:
    // scan |> filter |> extend |> aggregate |> order, reading top-to-
    // bottom the way the DataFrame API does. Same revenue-by-priority
    // shape as classic SQL; the point is the surface parity
    "q379_pipe_syntax" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("q379_o")
      s.sql(
        """FROM q379_o
          ||> WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          ||> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          ||> AGGREGATE CAST(count(*) AS BIGINT) AS n, sum(cents) AS total_cents
          |   GROUP BY o_orderpriority
          ||> SELECT o_orderpriority AS priority, n, total_cents
          ||> ORDER BY priority""".stripMargin)
    }),

    // pairwise Pearson correlation MATRIX of lineitem's three measures
    // from ONE scan — q54's discipline generalized: all moments for all
    // three pairs accumulate exactly (decimal38, partition-invariant) in
    // a single aggregation; only the bounded 3-row readout divides as
    // doubles (identical integer inputs ⇒ identical IEEE result), rounded
    // to 6dp like every corr in this library
    "q380_corr_matrix" -> ((s, dir) => {
      val q = expr("CAST(round(l_quantity, 0) AS BIGINT)").cast(dec38)
      val p = centsOf(col("l_extendedprice")).cast(dec38)
      val d = expr("CAST(round(l_discount * 100) AS BIGINT)").cast(dec38)
      Tables.lineitem(s, dir).agg(
        count(lit(1)).cast(dec38).as("n"),
        sum(q).as("sq"), sum(p).as("sp"), sum(d).as("sd"),
        sum(q * q).as("sqq"), sum(p * p).as("spp"), sum(d * d).as("sdd"),
        sum(q * p).as("sqp"), sum(q * d).as("sqd"), sum(p * d).as("spd"))
        .createOrReplaceTempView("q380_m")
      def corr(name: String, sxy: String, sx: String, sy: String,
          sxx: String, syy: String) =
        s"SELECT '$name' AS pair," +
          s" round(CAST(n * $sxy - $sx * $sy AS DOUBLE) /" +
          s" (sqrt(CAST(n * $sxx - $sx * $sx AS DOUBLE)) *" +
          s" sqrt(CAST(n * $syy - $sy * $sy AS DOUBLE))), 6) AS corr" +
          " FROM q380_m"
      s.sql(Seq(
        corr("qty_price", "sqp", "sq", "sp", "sqq", "spp"),
        corr("qty_disc", "sqd", "sq", "sd", "sqq", "sdd"),
        corr("price_disc", "spd", "sp", "sd", "spp", "sdd"))
        .mkString("", " UNION ALL ", " ORDER BY pair"))
    }),

    // count_if / bool_and / bool_or / any_value over groups — the
    // predicate-aggregate surface: per order priority, how many orders
    // are high-value, whether EVERY order cleared a floor, whether ANY
    // hit the ceiling
    "q381_predicate_aggs" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("priority"),
          centsOf(col("o_totalprice")).as("c"))
        .createOrReplaceTempView("q381_o")
      s.sql(
        """SELECT priority,
          |       CAST(count_if(c > 15000000) AS BIGINT) AS n_high_value,
          |       bool_and(c > 100000) AS all_above_1k,
          |       bool_or(c > 50000000) AS any_above_500k,
          |       CAST(min(c) AS BIGINT) AS min_cents
          |FROM q381_o GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // item-item collaborative recommendations end to end: q250's cosine
    // similarities scored against every customer's brand basket
    // (score(u, b) = Σ sims to owned brands, owned excluded by an
    // anti-join), top-3 per customer by struct-argmax over the bounded
    // brand set, rolled up to the per-brand recommendation census. The
    // sims relation is ≤ brands² and broadcasts; the only big join keys
    // on the customer basket
    "q382_recommendations" -> ((s, dir) => {
      val baskets = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("b")).distinct()
        .localCheckpoint(false)
      val ni = baskets.groupBy("b").agg(count(lit(1)).as("n"))
      val pr = baskets.as("a").join(baskets.as("c"),
          col("a.cust") === col("c.cust") && col("a.b") < col("c.b"))
        .groupBy(col("a.b").as("ba"), col("c.b").as("bb"))
        .agg(count(lit(1)).as("n_ab"))
      val sims = pr
        .join(broadcast(ni.select(col("b").as("ba"), col("n").as("na"))), Seq("ba"))
        .join(broadcast(ni.select(col("b").as("bb"), col("n").as("nb"))), Seq("bb"))
        .select(col("ba"), col("bb"),
          // floor() before the cast: DuckDB CAST(double AS BIGINT) rounds
          // where Spark truncates — floor makes both exact
          expr("n_ab * 1000000 div CAST(floor(sqrt(CAST(na AS DOUBLE) * nb)) AS BIGINT)")
            .as("sim_u"))
      val simsBoth = sims.unionByName(sims.select(col("bb").as("ba"),
        col("ba").as("bb"), col("sim_u"))).localCheckpoint(false)
      val scores = baskets.join(broadcast(simsBoth), col("b") === col("ba"))
        .groupBy(col("cust"), col("bb").as("rec"))
        .agg(sum(col("sim_u")).as("score_u"))
        .join(baskets.select(col("cust"), col("b").as("rec")),
          Seq("cust", "rec"), "left_anti")
      scores
        .withColumn("rk", row_number().over(
          Window.partitionBy("cust").orderBy(col("score_u").desc, col("rec"))))
        .filter(col("rk") <= 3)
        .groupBy(col("rec").as("brand"))
        .agg(count(lit(1)).as("n_recommended"),
          sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_top_pick"))
        .orderBy(col("n_recommended").desc, col("brand"))
    }),

    // seasonal-adjusted anomaly days: q371's residual series scored by
    // 3×MAD control limits (median via sorted-array middle on the
    // bounded residual relation — exact order stat, no approx) — flags
    // revenue days that are anomalous AFTER the weekly pattern is
    // removed, which q188's raw z-score conflates with weekends
    "q383_seasonal_anomaly" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("ed"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .withColumn("dow", expr("(ed + 4) % 7"))
      val w7 = Window.orderBy("ed").rowsBetween(-3, 3)
      val det = daily
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("trend_milli",
          when(col("n7") === 7, expr("sum(v) OVER (ORDER BY ed" +
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1000 div 7")))
        .filter(col("trend_milli").isNotNull)
        .withColumn("det_milli", col("v") * 1000 - col("trend_milli"))
        .localCheckpoint(false)
      val seasonal = det.groupBy("dow")
        .agg(expr("sum(det_milli) div count(1)").as("s_milli"))
      val resid = det.join(broadcast(seasonal), Seq("dow"))
        .withColumn("r", abs(col("det_milli") - col("s_milli")))
        .localCheckpoint(false)
      // exact median |residual| on the bounded daily relation
      val med = resid.agg(
        expr("element_at(sort_array(collect_list(r)), CAST((count(1) + 1) div 2 AS INT))")
          .as("mad_milli"))
      resid.crossJoin(broadcast(med))
        .agg(
          count(lit(1)).as("n_days"),
          max(col("mad_milli")).as("mad_milli"),
          sum(when(col("r") > col("mad_milli") * 3, 1L).otherwise(0L))
            .as("n_anomalies"),
          max(when(col("r") > col("mad_milli") * 3, col("ed"))).as("last_anomaly_ed"))
    }),

    // reciprocity of the event-transition graph: of all directed
    // (from → to) transition pairs observed, how many have the reverse
    // also observed — the directed-graph symmetry readout next to q287's
    // entropy; one self-join on the bounded 25-pair transition dictionary
    "q384_reciprocity" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull && col("nxt") =!= col("event_type"))
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val mutual = trans.as("x").join(trans.as("y"),
          col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
        .select(col("x.src"), col("x.dst"), col("x.c"),
          least(col("x.c"), col("y.c")).as("m"))
      trans.agg(count(lit(1)).as("n_edges"), sum(col("c")).as("n_transitions"))
        .crossJoin(broadcast(mutual.agg(
          count(lit(1)).as("n_reciprocal_edges"),
          coalesce(sum(col("m")), lit(0L)).as("n_mutual_min"))))
        .withColumn("edge_reciprocity_ppm",
          expr("n_reciprocal_edges * 1000000 div n_edges"))
        .withColumn("weighted_reciprocity_ppm",
          expr("n_mutual_min * 1000000 div n_transitions"))
    }),

    // Neyman allocation for stratified sampling: a 1000-doc budget split
    // across languages ∝ N_h·S_h (stratum size × stddev of doc length) —
    // the optimal-variance design q169's proportional quota ignores.
    // S_h via exact integer moments + the floor-sqrt trick (no float
    // accumulation); integer allocation by largest remainder so the
    // budget is conserved EXACTLY (spec-style identity in the oracle)
    "q385_neyman_allocation" -> ((s, dir) => {
      val st = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("lang")
        .agg(count(lit(1)).as("nh"),
          sum(col("n_chars")).as("sx"),
          sum(expr("n_chars * n_chars")).as("sxx"))
        .withColumn("var_q", expr("(nh * sxx - sx * sx) div (nh * nh)"))
        .withColumn("sh", expr("CAST(floor(sqrt(CAST(var_q AS DOUBLE))) AS BIGINT)"))
        .withColumn("wh", expr("nh * sh"))
      val tot = st.agg(sum(col("wh")).as("tw"))
      val base = st.crossJoin(broadcast(tot))
        .withColumn("alloc_floor", expr("nh * sh * 1000 div tw"))
        .withColumn("rem", expr("nh * sh * 1000 % tw"))
      val spread = base
        .withColumn("rrk", row_number().over(
          Window.orderBy(col("rem").desc, col("lang"))).cast("long"))
        .crossJoin(broadcast(base.agg(sum(col("alloc_floor")).as("sf"))))
        .withColumn("alloc",
          expr("alloc_floor + CASE WHEN rrk <= 1000 - sf THEN 1 ELSE 0 END"))
      spread.select(col("lang"), col("nh"), col("sh"), col("alloc"))
        .orderBy("lang")
    }),

    // fulfillment-latency SLA table: order→ship lag in days per priority
    // — exact median and p90 (interpolating percentile over the bounded
    // per-priority lag sets) plus the 7-day SLA pass rate in ppm; the
    // operational readout behind the q241/q143 lateness queries
    "q386_fulfillment_latency" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate",
          "o_orderpriority"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_d"))
        .groupBy("priority")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(lag_d, 0.5D)"), 6).as("p50_days"),
          round(expr("percentile(lag_d, 0.9D)"), 6).as("p90_days"),
          sum(when(col("lag_d") <= 7, 1L).otherwise(0L)).as("n_within_7d"))
        .withColumn("sla7_ppm", expr("n_within_7d * 1000000 div n"))
        .orderBy("priority")),

    // linear-interpolation gap fill: the full day spine between the first
    // and last order date, missing days filled by EXACT integer linear
    // interpolation between the bracketing observed days (last_value/
    // first_value IGNORE NULLS — the other fill rule next to q128's
    // forward fill). Readout: per fill kind, days + revenue mass
    "q387_linear_interpolation" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("ed"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
      val bounds = daily.agg(min(col("ed")).as("lo"), max(col("ed")).as("hi"))
      val spine = bounds.select(explode(expr("sequence(lo, hi)")).as("ed"))
      val wPrev = Window.orderBy("ed").rowsBetween(Window.unboundedPreceding, 0)
      val wNext = Window.orderBy("ed").rowsBetween(0, Window.unboundedFollowing)
      spine.join(daily, Seq("ed"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pe", last(when(col("v").isNotNull, col("ed")), ignoreNulls = true)
          .over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("ne", first(when(col("v").isNotNull, col("ed")), ignoreNulls = true)
          .over(wNext))
        .withColumn("fill", expr(
          "CASE WHEN v IS NOT NULL THEN v" +
            " WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv" +
            " ELSE pv + (nv - pv) * (ed - pe) div (ne - pe) END"))
        .withColumn("kind", expr(
          "CASE WHEN v IS NOT NULL THEN 'observed' ELSE 'interpolated' END"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_days"), sum(col("fill")).as("sum_cents"))
        .orderBy("kind")
    }),

    // array set algebra (array_union / array_intersect / array_except on
    // sorted per-source language sets): every source pair's coverage
    // overlap from the 20-row dictionary — the array-function surface at
    // bounded cost (never the row-exploded set ops of q51)
    "q388_array_setops" -> ((s, dir) => {
      val sets = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("source")
        .agg(sort_array(collect_set(col("lang"))).as("langs"))
      sets.as("a").join(sets.as("b"), col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          size(expr("array_union(a.langs, b.langs)")).cast("long").as("n_union"),
          size(expr("array_intersect(a.langs, b.langs)")).cast("long")
            .as("n_intersect"),
          size(expr("array_except(a.langs, b.langs)")).cast("long").as("n_only_a"))
        .orderBy("src_a", "src_b")
    }),

    // key-reconciliation parse audit: the numeric id embedded in c_name
    // ('Customer#000000001') re-extracted with a regexp group and checked
    // against c_custkey — the ETL sanity pass that catches truncated or
    // reformatted keys; per-segment parse and match rates in ppm
    "q389_parse_reconcile" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_mktsegment").as("segment"), col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).as("parsed"))
        .withColumn("ok_parse", (length(col("parsed")) > 0).cast("long"))
        .withColumn("ok_match",
          when(col("ok_parse") === 1L,
            (col("parsed").cast("long") === col("c_custkey")).cast("long"))
            .otherwise(0L))
        .groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("ok_parse")).as("n_parsed"),
          sum(col("ok_match")).as("n_matched"))
        .withColumn("match_ppm", expr("n_matched * 1000000 div n"))
        .orderBy("segment")),

    // session bounce rate: 30-minute-gap sessions per user (the q36 lag
    // rule inline), one-event sessions are bounces, attributed to the
    // session's ENTRY event type — the landing-quality readout per
    // entry point
    "q390_bounce_rate" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val sess = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"),
          min(struct(col("us"), col("event_id"), col("event_type"))).as("f"))
        .groupBy(col("f.event_type").as("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
        .withColumn("bounce_ppm", expr("n_bounce * 1000000 div n_sessions"))
        .orderBy("entry_type")
    }),

    // correlated-subquery predicates in one query — EXISTS, NOT EXISTS,
    // and a scalar subquery comparison, the three shapes Catalyst's
    // RewritePredicateSubquery turns into semi/anti/cross joins (TPC-H
    // Q4's pattern family); per priority: orders with a late line, with
    // no lines at all, and above the global average value
    "q391_subquery_predicates" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("q391_o")
      Tables.lineitem(s, dir).createOrReplaceTempView("q391_l")
      s.sql(
        """SELECT o_orderpriority AS priority,
          |       CAST(count(*) AS BIGINT) AS n_orders,
          |       CAST(sum(CASE WHEN EXISTS (
          |             SELECT 1 FROM q391_l
          |             WHERE l_orderkey = o_orderkey AND datediff(l_shipdate, o_orderdate) > 90)
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_slow_shipped,
          |       CAST(sum(CASE WHEN NOT EXISTS (
          |             SELECT 1 FROM q391_l WHERE l_orderkey = o_orderkey)
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
          |       CAST(sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) >
          |             (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) div count(1)
          |              FROM q391_o)
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
          |FROM q391_o GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // 2-D histogram (8×8 price × quantity grid) with marginals — the
    // heatmap backing store: both axes on exact integer grids from 1-row
    // min/max bounds, cell counts plus row/column totals for the
    // conditional-distribution readout
    "q392_histogram_2d" -> ((s, dir) => {
      val v = Tables.lineitem(s, dir).select(
        centsOf(col("l_extendedprice")).as("p"),
        expr("CAST(round(l_quantity, 0) AS BIGINT)").as("q"))
        .localCheckpoint(false)
      val mm = v.agg(min(col("p")).as("plo"), max(col("p")).as("phi"),
        min(col("q")).as("qlo"), max(col("q")).as("qhi"))
      v.crossJoin(broadcast(mm))
        .groupBy(
          expr("(p - plo) * 8 div (phi - plo + 1)").as("price_bin"),
          expr("(q - qlo) * 8 div (qhi - qlo + 1)").as("qty_bin"))
        .agg(count(lit(1)).as("n"))
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy("price_bin")))
        .withColumn("col_total",
          sum(col("n")).over(Window.partitionBy("qty_bin")))
        .orderBy("price_bin", "qty_bin")
    }),

    // dedup storage-ROI report: cluster losers (min-id keeper rule) priced
    // in bytes per source — the "what does near-dedup actually save"
    // readout a storage owner signs off on; losers from the verified
    // clusterLosers operator, byte mass from octet lengths, save share in
    // exact ppm
    "q393_dedup_savings" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          octet_length(col("text")).cast("long").as("nb"))
        .localCheckpoint(false)
      val losers = Dedup.clusterLosers(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
          .select("doc_a", "doc_b"))
        .withColumn("is_loser", lit(true))
      d.join(losers, col("doc_id") === col("node"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_loser"), 1L).otherwise(0L)).as("n_removable"),
          sum(col("nb")).as("bytes_total"),
          sum(when(col("is_loser"), col("nb")).otherwise(0L)).as("bytes_removable"))
        .withColumn("save_ppm",
          expr("bytes_removable * 1000000 div bytes_total"))
        .orderBy("source")
    }),

    // exact 2-hop reach on the dup graph: per node, the distinct set of
    // nodes within two hops (one self-join on the bounded candidate edge
    // set + distinct) — the neighborhood-growth readout between q127's
    // degree and q303's full BFS; histogram over reach sizes
    "q394_two_hop_reach" -> ((s, dir) => {
      val e = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_a", "doc_b")
      val und = e.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(e.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .distinct().localCheckpoint(false)
      val twoHop = und
        .unionByName(und.as("x").join(und.as("y"), col("x.v") === col("y.u"))
          .select(col("x.u").as("u"), col("y.v").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      twoHop.groupBy("u").agg(count(lit(1)).as("reach2"))
        .groupBy(col("reach2")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("reach2")
    }),

    // top movers: the five biggest month-over-month brand revenue risers
    // and fallers (lag window over the bounded brand×month aggregate,
    // exact cent deltas) — the BI movers panel next to q323's corpus
    // trending terms
    "q395_top_movers" -> ((s, dir) => {
      val bm = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"),
          expr("year(l_shipdate) * 12 + month(l_shipdate) - 1").as("mi"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("rev_c"))
      val w = Window.partitionBy("p_brand").orderBy("mi")
      val delta = bm
        .withColumn("prev", lag(col("rev_c"), 1).over(w))
        .withColumn("prev_mi", lag(col("mi"), 1).over(w))
        .filter(col("prev").isNotNull && col("prev_mi") === col("mi") - 1)
        .withColumn("delta_c", col("rev_c") - col("prev"))
        .localCheckpoint(false)
      val up = delta.orderBy(col("delta_c").desc, col("p_brand"), col("mi"))
        .limit(5).withColumn("direction", lit("riser"))
      val down = delta.orderBy(col("delta_c").asc, col("p_brand"), col("mi"))
        .limit(5).withColumn("direction", lit("faller"))
      up.unionByName(down)
        .select(col("direction"), col("p_brand"), col("mi").cast("long").as("mi"),
          col("rev_c"), col("delta_c"))
        .orderBy("direction", "delta_c", "p_brand", "mi")
    }),

    // time-to-next-error: for every event, the µs until the SAME user's
    // next 'error' via one reverse conditional-min window (no self-join);
    // per event type, how often an error follows at all and the exact
    // median lead time — the reliability readout behind alert tuning
    "q396_time_to_error" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("next_err",
          min(when(col("event_type") === "error", col("us"))).over(w))
        .filter(col("event_type") =!= "error")
        .select(col("event_type"),
          (col("next_err") - col("us")).as("lead_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("lead_us")).as("n_followed_by_error"),
          round(expr("percentile(lead_us, 0.5D) / 1000000"), 6)
            .as("median_lead_s"))
        .withColumn("followed_ppm",
          expr("n_followed_by_error * 1000000 div n_events"))
        .orderBy("event_type")
    }),

    // two-level manifest pruning (the Iceberg/Delta metadata shape): month
    // MANIFESTS carry [min, max] order-date stats over their 4096-key FILE
    // blocks; a quarter predicate prunes whole manifests first, then files
    // inside surviving manifests. The readout counts both levels — the
    // metadata-read savings a flat file list (q341) can't express
    "q397_manifest_pruning" -> ((s, dir) => {
      val files = Tables.orders(s, dir)
        .groupBy(expr("o_orderkey div 4096").as("blk"),
          expr("(year(o_orderdate) * 12 + month(o_orderdate)) % 4").as("man"))
        .agg(min(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
          .as("fmn"),
          max(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
            .as("fmx"),
          count(lit(1)).as("c"))
        .localCheckpoint(false)
      val manifests = files.groupBy("man")
        .agg(min(col("fmn")).as("mmn"), max(col("fmx")).as("mmx"),
          count(lit(1)).as("n_files"))
      // predicate: 1997 Q1 in epoch days [9862, 9952)
      val mHit = manifests
        .withColumn("manifest_hit",
          (col("mmn") < 9952L && col("mmx") >= 9862L).cast("long"))
      val fHit = files.join(mHit.select("man", "manifest_hit"), Seq("man"))
        .withColumn("file_hit",
          when(col("manifest_hit") === 1L,
            (col("fmn") < 9952L && col("fmx") >= 9862L).cast("long"))
            .otherwise(0L))
      fHit.agg(
        countDistinct(col("man")).as("n_manifests"),
        sum(col("manifest_hit")).as("file_checks"),
        count(lit(1)).as("n_files"),
        sum(col("file_hit")).as("files_scanned"),
        sum(when(col("file_hit") === 1L, col("c")).otherwise(0L))
          .as("rows_scanned"))
        .withColumn("files_skipped_ppm",
          expr("(n_files - files_scanned) * 1000000 div n_files"))
    }),

    // Cohen's d effect size between the AUTOMOBILE and BUILDING segments'
    // order values — the practical-significance companion to q232's
    // Welch t-test: exact decimal38 moments per segment, pooled SD and d
    // as one rounded double division at the very end
    "q398_effect_size" -> ((s, dir) => {
      val agg = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).cast(dec38).as("n"),
          sum(centsOf(col("o_totalprice")).cast(dec38)).as("s"),
          sum((centsOf(col("o_totalprice")).cast(dec38)
            * centsOf(col("o_totalprice")).cast(dec38))).as("ss"))
      agg.agg(
        max(when(col("c_mktsegment") === "AUTOMOBILE", col("n"))).as("n1"),
        max(when(col("c_mktsegment") === "AUTOMOBILE", col("s"))).as("s1"),
        max(when(col("c_mktsegment") === "AUTOMOBILE", col("ss"))).as("ss1"),
        max(when(col("c_mktsegment") === "BUILDING", col("n"))).as("n2"),
        max(when(col("c_mktsegment") === "BUILDING", col("s"))).as("s2"),
        max(when(col("c_mktsegment") === "BUILDING", col("ss"))).as("ss2"))
        .select(
          col("n1").cast("long").as("n_auto"),
          col("n2").cast("long").as("n_build"),
          expr("CAST(s1 div n1 AS BIGINT)").as("mean_auto_c"),
          expr("CAST(s2 div n2 AS BIGINT)").as("mean_build_c"),
          round(expr(
            "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
              " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))" +
              " / sqrt(((CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / CAST(n1 AS DOUBLE))" +
              " + (CAST(n2 * ss2 - s2 * s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))" +
              " / CAST(n1 + n2 - 2 AS DOUBLE))"), 6).as("cohens_d"))
    }),

    // GROUP BY ALL / ORDER BY ALL — the whole-projection grouping
    // shorthand (Spark 3.4+, DuckDB-native): every non-aggregate output
    // column groups, every output column orders, no positional lists to
    // drift out of sync with the SELECT
    "q399_group_by_all" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("q399_o")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |         AS total_cents
          |FROM q399_o GROUP BY ALL ORDER BY ALL""".stripMargin)
    }),

    // q400 — the per-source data-quality SCORECARD: the one row per
    // source a curation owner reads before admitting it to the mixture —
    // exact-dup rate, cross-source text leakage, quality-gate pass rate
    // (q300's 0.45 rule), and the mean quality in milli (per-row
    // quantized so the mean is order-invariant). One quality scan + one
    // text-group join; every constituent is individually oracled
    // elsewhere (q20/q78/q81/q27), this composes them into the readout
    "q400_source_scorecard" -> ((s, dir) => {
      val q = TextFunctions.withQualityColumns(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
        .select(col("doc_id"), col("source"), col("text"), col("quality"))
        .localCheckpoint(false)
      val tx = q.groupBy("text").agg(countDistinct(col("source")).as("ns"))
      q.join(tx, Seq("text"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("uniq_texts"),
          sum(when(col("ns") > 1, 1L).otherwise(0L)).as("xsource_docs"),
          sum(when(col("quality") >= 0.45, 1L).otherwise(0L)).as("quality_pass"),
          sum(round(col("quality") * 1000, 0).cast("long")).as("qsum_milli"))
        .select(col("source"), col("n_docs"), col("uniq_texts"),
          expr("(n_docs - uniq_texts) * 1000000 div n_docs").as("dup_ppm"),
          expr("xsource_docs * 1000000 div n_docs").as("xsource_ppm"),
          expr("quality_pass * 1000000 div n_docs").as("quality_pass_ppm"),
          expr("qsum_milli div n_docs").as("mean_quality_milli"))
        .orderBy("source")
    }),

    // null-safe equality (<=>): the dup-pair count over a NULLABLE key —
    // standard equality silently drops the null-text group, null-safe
    // equality pairs it; the delta IS the rows a pipeline loses by using
    // the wrong operator. Counted from the text histogram (never a
    // self-join): standard pairs Σc(c−1)/2 over non-null, null-safe adds
    // the null group's pairs
    "q401_null_safe_join" -> ((s, dir) => {
      val g = Tables.documents(s, dir)
        .groupBy("text").agg(count(lit(1)).as("c"))
      g.agg(
        sum(when(col("text").isNotNull, expr("c * (c - 1) div 2"))
          .otherwise(0L)).as("standard_pairs"),
        sum(expr("c * (c - 1) div 2")).as("nullsafe_pairs"),
        sum(when(col("text").isNull, col("c")).otherwise(0L)).as("null_docs"))
        .withColumn("pairs_missed_by_eq",
          expr("nullsafe_pairs - standard_pairs"))
    }),

    // exact log2 histogram of order values: floor(log2) from the BINARY
    // STRING length (length(bin(v)) − 1 — pure integer, no float log) —
    // the size-class histogram for long-tailed money amounts
    "q402_log2_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(centsOf(col("o_totalprice")).as("v"))
        .filter(col("v") > 0)
        .groupBy((length(expr("bin(v)")) - 1).cast("long").as("log2_bin"))
        .agg(count(lit(1)).as("n"),
          min(col("v")).as("min_cents"), max(col("v")).as("max_cents"))
        .orderBy("log2_bin")),

    // expanding-window regression: the daily-revenue-vs-day OLS slope
    // after 90 / 180 / 365 days and on the full series — all four
    // checkpoints from ONE scan via conditional exact moments (decimal38,
    // the q139 discipline); slope drift across checkpoints is the
    // "did the trend hold" readout
    "q403_expanding_slope" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("ed"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
      val start = daily.agg(min(col("ed")).as("d0"))
      daily.crossJoin(broadcast(start))
        .withColumn("x", (col("ed") - col("d0")).cast(dec38))
        .withColumn("y", col("v").cast(dec38))
        .select(col("x"), col("y"),
          expr("stack(4, 90L, 180L, 365L, 100000L) AS (horizon_days)"))
        .filter(col("x") < col("horizon_days"))
        .groupBy("horizon_days")
        .agg(count(lit(1)).cast(dec38).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("horizon_days"), col("n").cast("long").as("n_days"),
          expr("CAST((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)" +
            " AS BIGINT)").as("slope_milli_cents_per_day"))
        .orderBy("horizon_days")
    }),

    // schema evolution via unionByName(allowMissingColumns): the old
    // generation (1995-96 orders, no priority column) unioned with the
    // new — missing columns null-fill by NAME, not position, so a
    // reordered schema can't silently corrupt. The readout proves the
    // fill: per generation, rows and null-priority counts
    "q404_schema_evolution" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
      val oldGen = base.filter(col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), centsOf(col("o_totalprice")).as("cents"),
          lit("v1").as("gen"))
      val newGen = base.filter(col("o_orderdate") >= lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
          centsOf(col("o_totalprice")).as("cents"), lit("v2").as("gen"))
      oldGen.unionByName(newGen, allowMissingColumns = true)
        .groupBy("gen")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("priority").isNull, 1L).otherwise(0L)).as("null_priority"),
          sum(col("cents")).as("total_cents"))
        .orderBy("gen")
    }),

    // Bowley (quartile) skewness of order values: (Q3 + Q1 − 2·Q2) /
    // (Q3 − Q1) from EXACT order statistics (the q299 two-pass trick at
    // three cuts) in signed ppm — the robust-skewness companion to the
    // moment-based stats, immune to the long tail it measures
    "q405_bowley_skewness" -> ((s, dir) => {
      val v = Tables.orders(s, dir).select(centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val n1 = v.agg(count(lit(1)).as("n"))
      val hist = v.groupBy(expr("v div 65536").as("bin")).agg(count(lit(1)).as("c"))
        .withColumn("cb", coalesce(sum(col("c")).over(
          Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val ks = s.sql("SELECT CAST(i AS BIGINT) AS i FROM VALUES (1),(2),(3) AS t(i)")
        .crossJoin(broadcast(n1))
        .select(col("i"), expr("(i * n) div 4").as("k"))
      val qs = ks.join(broadcast(hist),
          col("cb") < col("k") && col("cb") + col("c") >= col("k"))
        .select(col("i"), col("k"), col("bin"), (col("k") - col("cb")).as("off"))
      val quart = v.join(broadcast(qs), expr("v div 65536") === col("bin"))
        .withColumn("r",
          row_number().over(Window.partitionBy("i").orderBy("v")).cast("long"))
        .filter(col("r") === col("off"))
        .groupBy()
        .agg(max(when(col("i") === 1, col("v"))).as("q1"),
          max(when(col("i") === 2, col("v"))).as("q2"),
          max(when(col("i") === 3, col("v"))).as("q3"))
      quart.select(col("q1").as("q1_cents"), col("q2").as("q2_cents"),
        col("q3").as("q3_cents"),
        expr("(q3 + q1 - 2 * q2) * 1000000 div (q3 - q1)").as("bowley_ppm"))
    }),

    // referential-integrity audit: orphan counts for all four FK edges of
    // the star (lineitem→orders/part/supplier, orders→customer) via
    // left-anti joins on the distinct key sets — the nightly RI check a
    // lakehouse runs before trusting joins; orphan share in ppm per edge
    "q406_ri_audit" -> ((s, dir) => {
      def edge(name: String, fact: DataFrame, fk: String,
          dim: DataFrame, pk: String): DataFrame = {
        val keys = fact.select(col(fk).as("k")).filter(col("k").isNotNull)
          .localCheckpoint(false)
        val orphans = keys.join(dim.select(col(pk).as("k")).distinct(),
          Seq("k"), "left_anti")
        keys.agg(count(lit(1)).as("n_refs"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("fk_edge"), col("n_refs"), col("n_orphans"),
            expr("n_orphans * 1000000 div n_refs").as("orphan_ppm"))
      }
      val li = Tables.lineitem(s, dir)
      edge("lineitem_orders", li, "l_orderkey", Tables.orders(s, dir), "o_orderkey")
        .unionAll(edge("lineitem_part", li, "l_partkey",
          Tables.part(s, dir), "p_partkey"))
        .unionAll(edge("lineitem_supplier", li, "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey"))
        .unionAll(edge("orders_customer", Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey"))
        .orderBy("fk_edge")
    }),

    // rolling 7-day high/low corridor (Donchian channel) on daily
    // revenue: windowed min/max over the prior 7 full days, breakout =
    // today strictly outside yesterday's corridor — the volatility
    // readout; exact integers end to end, bounded date-dictionary windows
    "q407_rolling_corridor" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("ed"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
      val w = Window.orderBy("ed").rowsBetween(-7, -1)
      daily
        .withColumn("n7", count(lit(1)).over(w))
        .withColumn("hi", max(col("v")).over(w))
        .withColumn("lo", min(col("v")).over(w))
        .filter(col("n7") === 7)
        .agg(
          count(lit(1)).as("n_days"),
          sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("breakouts_up"),
          sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("breakouts_down"),
          sum(expr("(hi - lo)")).as("corridor_width_sum_c"))
        .withColumn("mean_width_c", expr("corridor_width_sum_c div n_days"))
    }),

    // variant_explode (the Spark-4 semi-structured TVF): a JSON ARRAY of
    // per-order line quantities built from the fact table, parsed to
    // VARIANT and exploded back laterally — the list-payload
    // schema-on-read path q360's scalar fields don't cover; conservation
    // proved against the flat aggregate
    "q408_variant_explode" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(concat(lit("["),
          array_join(sort_array(collect_list(
            expr("CAST(round(l_quantity, 0) AS BIGINT)"))), ","),
          lit("]")).as("js"))
        .createOrReplaceTempView("q408_js")
      s.sql(
        """SELECT CAST(count(*) AS BIGINT) AS n_values,
          |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
          |       CAST(sum(CAST(value AS BIGINT)) AS BIGINT) AS total_qty,
          |       CAST(max(pos) + 1 AS BIGINT) AS max_lines_per_order
          |FROM q408_js, LATERAL variant_explode(parse_json(js))""".stripMargin)
    }),

    // DataFrame.stat.crosstab — the contingency-table API (priority ×
    // status), re-sorted and null-filled into a deterministic readout;
    // the API twin of the q290/q119 independence audits
    "q409_crosstab_api" -> ((s, dir) => {
      val ct = Tables.orders(s, dir)
        .stat.crosstab("o_orderpriority", "o_orderstatus")
      // statuses PINNED (like q349 pins langs): a dataset missing one
      // value still emits the zero-filled column, so the schema — and the
      // oracle comparison — never silently narrows
      val statuses = Seq("F", "O", "P")
      val have = ct.columns.toSet
      ct.select(col("o_orderpriority_o_orderstatus").as("priority") +:
          statuses.map(c =>
            (if (have(c)) coalesce(col(s"`$c`"), lit(0L)) else lit(0L))
              .as(s"status_$c")): _*)
        .orderBy("priority")
    }),

    // systematic 1-in-20 sampling on the md5 rank order: row_number over
    // the md5 permutation, keep rank % 20 == 0 — EXACT sample size by
    // construction (vs q46's Bernoulli threshold whose size is binomial);
    // per-lang census proves both properties. The global permutation
    // window runs once; at 100 TB the same rank comes from a
    // zipWithIndex-style assignment — documented trade, not hidden
    "q410_systematic_sample" -> ((s, dir) => {
      val ranked = Tables.documents(s, dir).filter(col("text").isNotNull)
        .withColumn("h", Dedup.md5Long(concat(lit("sys#"),
          col("doc_id").cast("string")), 12))
        .withColumn("rk", row_number().over(Window.orderBy("h", "doc_id")))
      ranked.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") % 20 === 0, 1L).otherwise(0L)).as("n_sampled"))
        .withColumn("rate_ppm", expr("n_sampled * 1000000 div n_docs"))
        .orderBy("lang")
    }),

    // TF-IDF cosine doc pairs over a deterministic 1-in-25 md5 sample
    // (the bounded query-batch shape — a full doc×doc cosine is Σdf²-
    // quadratic and belongs behind LSH like q39): per-(doc, term) weights
    // w = tf · idf_micro (idf micro-quantized once), pair dot products
    // via the term join on the SAMPLE only, norms exact integer; top-10
    // most similar pairs
    "q411_tfidf_cosine" -> ((s, dir) => {
      val sample = Tables.documents(s, dir).filter(col("text").isNotNull)
        .filter(Dedup.md5Long(concat(lit("tc#"), col("doc_id").cast("string")), 12)
          % 25 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val df_ = sample.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
      val nd = sample.agg(countDistinct(col("doc_id")).as("n"))
      val wt = sample.join(broadcast(df_), Seq("w"))
        .crossJoin(broadcast(nd))
        .withColumn("wgt", expr(
          "tf * CAST(round(ln(CAST(n AS DOUBLE) / df) * 1000) AS BIGINT)"))
        .localCheckpoint(false)
      val norms = wt.groupBy("doc_id")
        .agg(sum(expr("wgt * wgt")).as("n2"))
        .withColumn("t", expr("CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)"))
        .withColumn("nrm", expr(
          "CASE WHEN (t + 1) * (t + 1) <= n2 THEN t + 1" +
            " WHEN t * t > n2 THEN t - 1 ELSE t END"))
        // a doc whose every term has df = n has zero tf-idf mass — exclude
        // rather than divide by zero (DuckDB // 0 errors; Spark nulls)
        .filter(col("nrm") > 0)
        .select("doc_id", "nrm")
      val dots = wt.select(col("doc_id").as("da"), col("w"), col("wgt").as("wa"))
        .join(wt.select(col("doc_id").as("db"), col("w"), col("wgt").as("wb")),
          Seq("w"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(sum(expr("wa * wb")).as("dot"))
      dots
        .join(broadcast(norms.select(col("doc_id").as("da"), col("nrm").as("na"))),
          Seq("da"))
        .join(broadcast(norms.select(col("doc_id").as("db"), col("nrm").as("nb"))),
          Seq("db"))
        .select(col("da"), col("db"),
          expr("dot * 1000000 div (na * nb)").as("cos_u"))
        .orderBy(col("cos_u").desc, col("da"), col("db")).limit(10)
    }),

    // revenue concentration over time: the top-20 customers' share of
    // each year's revenue (CR20 by year) — the concentration TREND the
    // one-shot HHI (q114) and Gini (q204) can't show; per-year rank
    // windows over the bounded customer-year aggregate
    "q412_topk_concentration" -> ((s, dir) => {
      val cy = Tables.orders(s, dir)
        .groupBy(expr("year(o_orderdate)").as("yr"), col("o_custkey"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
      val w = Window.partitionBy("yr").orderBy(col("rev_c").desc, col("o_custkey"))
      cy.withColumn("rk", row_number().over(w))
        .groupBy("yr")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev_c")).as("total_c"),
          sum(when(col("rk") <= 20, col("rev_c")).otherwise(0L)).as("top20_c"))
        .withColumn("cr20_ppm", expr("top20_c * 1000000 div total_c"))
        .select(col("yr").cast("long").as("yr"), col("n_customers"),
          col("total_c"), col("top20_c"), col("cr20_ppm"))
        .orderBy("yr")
    }),

    // activity regularity: per user, active days as a share of their
    // first→last-day span (the engagement-regularity metric between
    // q137's actives and q353's streaks), bucketed to a decile histogram
    "q413_regularity" -> ((s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"),
          expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
        .distinct()
      ud.groupBy("user_id")
        .agg(count(lit(1)).as("active_days"),
          (max(col("day")) - min(col("day")) + 1).as("span_days"))
        .withColumn("reg_decile",
          least(expr("active_days * 10 div span_days"), lit(10L)))
        .groupBy("reg_decile")
        .agg(count(lit(1)).as("n_users"),
          sum(col("active_days")).as("total_active_days"))
        .orderBy("reg_decile")
    }),

    // brand loyalty: of the customers who ever bought a brand, the share
    // that came back for it in a LATER order — repeat-purchase rate per
    // brand from one (customer, brand) aggregate with distinct order
    // counts; top-10 most loyal brands
    "q414_brand_loyalty" -> ((s, dir) => {
      val cb = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"), col("p_brand"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      cb.groupBy("p_brand")
        .agg(count(lit(1)).as("n_buyers"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"))
        .withColumn("loyalty_ppm", expr("n_repeat * 1000000 div n_buyers"))
        .orderBy(col("loyalty_ppm").desc, col("p_brand")).limit(10)
    }),

    // sample-ratio-mismatch (SRM) check on the q314 md5 experiment arms:
    // observed 50/50 split vs expected, the chi-square statistic in micro
    // (integer numerators ×1e6 over the expected count) — the A/B health
    // gate that must pass before any lift readout is trusted
    "q415_srm_check" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select((Dedup.md5Long(concat(lit("cuped#"),
          col("o_custkey").cast("string")), 12) % 2).as("arm"),
          col("o_custkey"))
        .distinct()
        .groupBy()
        .agg(count(lit(1)).as("n_units"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"))
        .withColumn("n_ctrl", expr("n_units - n_treat"))
        .withColumn("delta", expr("2 * n_treat - n_units"))
        // chi2 = (o1-e)²/e + (o2-e)²/e with e = n/2 ⇒ delta² / n, ×1e6
        .withColumn("chi2_micro", expr("delta * delta * 1000000 div n_units"))
        .withColumn("srm_suspect", expr("chi2_micro > 3841459"))
        .select("n_units", "n_treat", "n_ctrl", "chi2_micro", "srm_suspect")),

    // customer revenue-quartile MIGRATION matrix 1996→1997: ntile(4) per
    // year (deterministic custkey tie-break), inner join on customers
    // active both years, cell counts — the segment-mobility readout
    // behind churn/upsell planning
    "q416_quartile_migration" -> ((s, dir) => {
      def quartiles(yr: Int) = Tables.orders(s, dir)
        .filter(expr(s"year(o_orderdate) = $yr"))
        .groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
        .withColumn("q", ntile(4).over(
          Window.orderBy(col("rev_c").desc, col("o_custkey"))).cast("long"))
        .select(col("o_custkey"), col("q"))
      quartiles(1996).withColumnRenamed("q", "q_1996")
        .join(quartiles(1997).withColumnRenamed("q", "q_1997"), Seq("o_custkey"))
        .groupBy("q_1996", "q_1997")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("q_1996", "q_1997")
    }),

    // per-term share trend: for the top-5 corpus terms, the OLS slope of
    // their monthly share (ppm per month index) over the ingestion
    // timeline — the continuous-time refinement of q323's two-halves
    // ratio; exact integer moments on the bounded term×month grid
    "q417_term_trend_slopes" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
        .localCheckpoint(false)
      val mx = docs.agg((max(col("doc_id")) + 1).as("mxd"))
      val words = docs.crossJoin(broadcast(mx))
        .select(expr("doc_id * 12 div mxd").as("b"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val top = words.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(5).select("w")
      val grid = words.groupBy("b", "w").agg(count(lit(1)).as("cw"))
        .join(words.groupBy("b").agg(count(lit(1)).as("ct")), Seq("b"))
        .join(broadcast(top), Seq("w"))
        .withColumn("share_ppm", expr("cw * 1000000 div ct"))
      grid.groupBy("w")
        .agg(count(lit(1)).cast(dec38).as("n"),
          sum(col("b").cast(dec38)).as("sx"),
          sum(col("share_ppm").cast(dec38)).as("sy"),
          sum((col("b") * col("share_ppm")).cast(dec38)).as("sxy"),
          sum((col("b") * col("b")).cast(dec38)).as("sxx"))
        .select(col("w").as("term"), col("n").cast("long").as("n_buckets"),
          expr("CAST((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)" +
            " AS BIGINT)").as("slope_milli_ppm_per_bucket"))
        .orderBy("term")
    }),

    // sequential purchase patterns: each customer's orders in date order,
    // the (brand-set of order k) × (brand-set of order k+1) transition
    // pairs — the top-10 A-then-B sequences with lift over independence;
    // bounded brand dictionary keeps everything small after the one
    // order-sequence window
    "q418_purchase_sequences" -> ((s, dir) => {
      val ob = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("p_brand")).distinct()
        .localCheckpoint(false)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val seq_ = ob.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .distinct()
        .withColumn("next_ok", lead(col("o_orderkey"), 1).over(w))
        .filter(col("next_ok").isNotNull)
      seq_.join(ob.select(col("o_orderkey"), col("p_brand").as("brand_a")),
          Seq("o_orderkey"))
        .join(ob.select(col("o_orderkey").as("next_ok"),
          col("p_brand").as("brand_b")), Seq("next_ok"))
        .groupBy("brand_a", "brand_b")
        .agg(count(lit(1)).as("n_seq"))
        .orderBy(col("n_seq").desc, col("brand_a"), col("brand_b")).limit(10)
    }),

    // cluster-jackknife SE of a ratio metric (revenue per order; the
    // CUSTOMER is the resampling unit — the AB-test readout where orders
    // within a customer are correlated, so per-order variance understates
    // uncertainty): leave-one-customer-out ratios r_i = (Sx−x_i) div
    // (Sy−y_i) in exact cents, variance from the n·Σr²−(Σr)² integer
    // identity — no per-replicate recompute, no doubles. One fact agg to
    // customer grain, one broadcast dim join, one bounded segment-totals
    // join; nothing windows over facts
    "q419_jackknife_ratio" -> ((s, dir) => {
      val cust = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"),
          count(lit(1)).as("y"))
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("c_custkey") === col("o_custkey"))
        .select("segment", "x", "y")
        .localCheckpoint(false)
      val tot = cust.groupBy("segment")
        .agg(sum(col("x")).as("sx2"), sum(col("y")).as("sy2"))
      cust.join(broadcast(tot), Seq("segment"))
        .filter(col("sy2") > col("y"))
        .withColumn("r", expr("(sx2 - x) div (sy2 - y)"))
        .groupBy("segment", "sx2", "sy2")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("r").cast(dec38)).as("sr"),
          sum((col("r") * col("r")).cast(dec38)).as("srr"))
        .select(col("segment"), col("n_cust"),
          expr("CAST(sx2 * 1000 div sy2 AS BIGINT)").as("ratio_milli"),
          expr("CAST((n_cust - 1) * (n_cust * srr - sr * sr)" +
            " div (CAST(n_cust AS DECIMAL(38,0)) * n_cust * n_cust) AS BIGINT)")
            .as("jk_var_cents2"))
        .orderBy("segment")
    }),

    // inter-rater agreement (Cohen's κ) between two deterministic quality
    // raters — the rater-calibration readout before trusting any single
    // heuristic filter: κ_ppm = (n·po − pe)·1e6 div (n² − pe) with
    // pe = ra·rb + (n−ra)(n−rb), all exact integer counts per lang (one
    // scan, one hash agg; decimal guards the n² products at corpus scale)
    "q420_cohens_kappa" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(expr("a * b")).as("n11"),
          sum(expr("(1 - a) * (1 - b)")).as("n00"),
          sum(col("a")).as("ra"), sum(col("b")).as("rb"))
        .withColumn("pe_num",
          expr("CAST(ra AS DECIMAL(38,0)) * rb" +
            " + CAST(n - ra AS DECIMAL(38,0)) * (n - rb)"))
        .select(col("lang"), col("n").as("n_docs"),
          col("n11").as("n_both_pos"), col("n00").as("n_both_neg"),
          expr("CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * n = pe_num THEN 0" +
            " ELSE (CAST(n AS DECIMAL(38,0)) * (n11 + n00) - pe_num) * 1000000" +
            " div (CAST(n AS DECIMAL(38,0)) * n - pe_num) END AS BIGINT)")
            .as("kappa_ppm"))
        .orderBy("lang")),

    // t-closeness audit (privacy, beyond q219/q281): per QI group the
    // earth-mover distance between its ordered sensitive-attribute
    // distribution (price band) and the global one — EMD over an ordered
    // attribute is the mean |ΔCDF|, here as exact cross-multiplied
    // integer cumulative counts (no per-group share doubles). Bands are
    // equi-width on cents (q333's convention — no global sort); the
    // cum window runs over the 10-row-per-group zero-filled grid only
    "q421_t_closeness" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("qi"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .localCheckpoint(false)
      val mm = o.agg(min("cents").as("gmin"), max("cents").as("gmax"))
      val banded = o.crossJoin(broadcast(mm))
        .select(col("qi"), expr("(cents - gmin) * 10 div (gmax - gmin + 1)").as("band"))
        .localCheckpoint(false)
      val bands = s.range(10).select(col("id").as("band"))
      val gc = bands.join(banded.groupBy("band").agg(count(lit(1)).as("cg")),
          Seq("band"), "left").na.fill(0L, Seq("cg"))
      val grid = banded.select("qi").distinct().crossJoin(broadcast(bands))
        .join(banded.groupBy("qi", "band").agg(count(lit(1)).as("ca")),
          Seq("qi", "band"), "left").na.fill(0L, Seq("ca"))
        .join(broadcast(gc), Seq("band"))
      val wb = Window.partitionBy("qi").orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wq = Window.partitionBy("qi")
      grid
        .withColumn("cum_a", sum(col("ca")).over(wb))
        .withColumn("cum_g", sum(col("cg")).over(wb))
        .withColumn("na", sum(col("ca")).over(wq))
        .withColumn("ng", max(col("cum_g")).over(wq))
        .withColumn("d", when(col("band") < 9,
          abs(col("cum_a").cast(dec38) * col("ng")
            - col("cum_g").cast(dec38) * col("na"))).otherwise(lit(0).cast(dec38)))
        .groupBy("qi")
        .agg(max(col("na")).as("n_rows"), max(col("ng")).as("ngt"),
          sum(col("d")).as("dsum"))
        .select(col("qi"), col("n_rows"),
          expr("CAST(dsum * 1000000 div (CAST(n_rows AS DECIMAL(38,0)) * ngt * 9)" +
            " AS BIGINT)").as("t_ppm"))
        .orderBy("qi")
    }),

    // systematic PPS sample (probability ∝ revenue): cumulative-weight
    // intervals over the part dictionary, 20 equally spaced inclusion
    // points (2k+1)·W div 40 — the survey-sampling workhorse for corpus
    // mixing where big sources MUST be hit deterministically. The cum
    // window is the inherent sequential structure (q410's trade: at
    // 100 TB the same prefix sums come from a two-pass per-partition
    // offset scheme); the 20-point probe side broadcasts
    "q422_pps_sample" -> ((s, dir) => {
      val w = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("w"))
        .filter(col("w") > 0)
        .withColumn("cum", sum(col("w")).over(Window.orderBy("l_partkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint(false)
      val tot = w.agg(max("cum").as("tw"))
      val pts = s.range(20).select(col("id").as("k")).crossJoin(broadcast(tot))
        .select(col("k"), expr("(2 * k + 1) * tw div 40").as("pt"))
      w.join(broadcast(pts),
          col("cum") - col("w") <= col("pt") && col("pt") < col("cum"))
        .select(col("k"), col("l_partkey").as("p_partkey"), col("w").as("w_cents"))
        .orderBy("k")
    }),

    // Matryoshka truncation recall: does top-k survive keeping only the
    // FIRST 16 of 64 dims (MRL-style prefix truncation — the cheapest
    // index compression there is)? Rankings by exact integer dot products
    // of the 1e-6-quantized vectors (full vs prefix), both ranks from the
    // SAME per-(query, candidate) row — one corpus pass, bounded query
    // broadcast (q24's batch shape); at index scale the window rank
    // becomes a per-query top-k aggregation
    "q423_matryoshka_recall" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir)
        .select(col("vec_id").as("vid"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1000000d).cast("long")).as("q"))
        .localCheckpoint(false)
      val queries = base.filter(col("vid") < 8)
        .select(col("vid").as("query_id"), col("q").as("qq"))
      val scored = base.join(broadcast(queries), col("vid") =!= col("query_id"))
        .withColumn("dot_full",
          aggregate(zip_with(col("qq"), col("q"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x))
        .withColumn("dot_pre",
          aggregate(zip_with(slice(col("qq"), 1, 16), slice(col("q"), 1, 16),
            (a, b) => a * b), lit(0L), (acc, x) => acc + x))
      val fk = row_number().over(
        Window.partitionBy("query_id").orderBy(col("dot_full").desc, col("vid")))
      val pk = row_number().over(
        Window.partitionBy("query_id").orderBy(col("dot_pre").desc, col("vid")))
      scored.withColumn("frk", fk.cast("long")).withColumn("prk", pk.cast("long"))
        .filter(col("frk") <= 10 || col("prk") <= 10)
        .groupBy("query_id")
        .agg(sum(when(col("frk") <= 10 && col("prk") <= 10, 1L).otherwise(0L))
          .as("n_overlap"))
        .select(col("query_id"), col("n_overlap"),
          expr("n_overlap * 100 div 10").as("recall_pct"))
        .orderBy("query_id")
    }),

    // RAKE keyword extraction: candidate phrases = maximal runs of
    // non-stopwords (stopword set = corpus top-5 by frequency, the
    // data-driven stand-in for a stoplist), word score = deg/freq over
    // phrase instances, phrase score = Σ member scores — the classic
    // unsupervised keyword op. Runs come from a per-doc cumulative
    // stopword count (windows bounded by doc length); word stats live on
    // the vocab-bounded dictionary and broadcast back
    "q424_rake_keywords" -> ((s, dir) => {
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), posexplode(split(col("text"), " ", -1)).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val stop = words.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(5).select(col("w").as("sw"))
      val members = words
        .join(broadcast(stop), col("w") === col("sw"), "left")
        .withColumn("is_stop", col("sw").isNotNull.cast("long"))
        .withColumn("run", sum(col("is_stop")).over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("is_stop") === 0)
        .select("doc_id", "run", "pos", "w")
        .localCheckpoint(false)
      val plen = members.groupBy("doc_id", "run").agg(count(lit(1)).as("plen"))
      val wscore = members.join(plen, Seq("doc_id", "run"))
        .groupBy("w")
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .select(col("w"), expr("deg * 1000 div freq").as("score_milli"))
      members.join(broadcast(wscore), Seq("w"))
        .groupBy("doc_id", "run")
        .agg(
          array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ").as("phrase"),
          sum(col("score_milli")).as("score_milli"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_occur"), max(col("score_milli")).as("score_milli"))
        .orderBy(col("score_milli").desc, col("phrase")).limit(10)
    }),

    // AQE-style shuffle-partition coalescing, simulated exactly: 128
    // hash buckets of the fact table, target = ceil(total/16), group =
    // exclusive-prefix div target (adjacent buckets merge until the
    // target fills — Spark's own coalescing rule); the readout is the
    // fill factor per coalesced partition, the "are my reducers
    // balanced" planning twin of q199/q331. All windows on the bounded
    // 128-row bucket relation
    "q425_aqe_coalesce_sim" -> ((s, dir) => {
      val buckets = Tables.orders(s, dir)
        .groupBy(expr("o_orderkey % 128").as("bucket"))
        .agg(count(lit(1)).as("sz"))
      val tot = buckets.agg(sum("sz").as("total"))
      val cumx = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      buckets.crossJoin(broadcast(tot))
        .withColumn("target", expr("(total + 15) div 16"))
        .withColumn("prefix", coalesce(sum(col("sz")).over(cumx), lit(0L)))
        .withColumn("grp", expr("prefix div target"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_buckets"), sum(col("sz")).as("n_rows"),
          max(col("target")).as("t"))
        .select(col("grp"), col("n_buckets"), col("n_rows"),
          expr("n_rows * 1000000 div t").as("fill_ppm"))
        .orderBy("grp")
    }),

    // Holt double-exponential smoothing (level + trend) over the monthly
    // revenue series, α=0.3 β=0.2 in exact integer milli arithmetic via
    // WITH RECURSIVE (q359's materialize-then-recurse shape — each level
    // is a sequential job, so the 24-month horizon IS the latency knob);
    // forecast_next = l + b, the one-step-ahead readout
    "q426_holt_linear" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
        .filter(col("mi") >= 0 && col("mi") < 24)
        .localCheckpoint(false)
        .createOrReplaceTempView("q426_rev")
      s.sql(
        """WITH RECURSIVE hw(mi, l, b) AS (
          |  SELECT CAST(0 AS BIGINT), r.rev_c, CAST(0 AS BIGINT)
          |  FROM q426_rev r WHERE r.mi = 0
          |  UNION ALL
          |  SELECT r.mi,
          |         (300 * r.rev_c + 700 * (hw.l + hw.b)) div 1000,
          |         (200 * (((300 * r.rev_c + 700 * (hw.l + hw.b)) div 1000) - hw.l)
          |          + 800 * hw.b) div 1000
          |  FROM hw JOIN q426_rev r ON r.mi = hw.mi + 1
          |)
          |SELECT mi AS month_index, l AS level_cents, b AS trend_cents,
          |       l + b AS forecast_next_cents
          |FROM hw ORDER BY mi""".stripMargin)
    }),

    // Wilson score interval (95%) for a per-group binomial rate — the
    // honest small-n confidence readout a plain ±z·sqrt(pq/n) gets wrong
    // near 0/1: all arithmetic exact integer with z²=38416/1e4; the one
    // radical is an integer sqrt via floor(√double) + ±1 fix-ups (the
    // quantizedRecall isqrt trick), and the single floor-div inside the
    // radical is identical on both engines, so the interval is
    // bit-replayable. One scan, one hash agg, per-row closed form
    "q427_wilson_interval" -> ((s, dir) =>
      // the radical keeps n INSIDE (dp = z²·1e12·inner·n — a pure
      // product, no division) because Spark's `div` always narrows its
      // quotient to long: isqrt(dp) runs as a floor(√double) seed plus
      // two integer Newton steps and ±1 fix-ups — every step identical
      // integer arithmetic on both engines, so the interval bit-matches
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("k"))
        .withColumn("dp", expr(
          "CAST(38416000000000000 AS DECIMAL(38,0))" +
            " * (10000 * k * (n - k) + 9604 * n) * n"))
        .withColumn("t0",
          floor(sqrt(col("dp").cast("double"))).cast("decimal(38,0)"))
        .withColumn("t1", expr("(t0 + dp div t0) div 2"))
        .withColumn("t2", expr("(t1 + dp div t1) div 2"))
        .withColumn("rt", expr(
          "CASE WHEN CAST(t2 + 1 AS DECIMAL(38,0)) * (t2 + 1) <= dp THEN t2 + 1" +
            " WHEN CAST(t2 AS DECIMAL(38,0)) * t2 > dp THEN t2 - 1 ELSE t2 END"))
        .select(col("priority"), col("n"), col("k"),
          expr("k * 1000000 div n").as("phat_ppm"),
          expr("(CAST(20000 AS DECIMAL(38,0)) * k + 38416) * 1000000 * n" +
            " - 2 * rt").cast(dec38).as("lo_num"),
          expr("(CAST(20000 AS DECIMAL(38,0)) * k + 38416) * 1000000 * n" +
            " + 2 * rt").cast(dec38).as("hi_num"),
          expr("2 * n * (10000 * n + 38416)").as("den"))
        .select(col("priority"), col("n"), col("k"), col("phat_ppm"),
          expr("lo_num div den").as("lo_ppm"),
          expr("hi_num div den").as("hi_ppm"))
        .orderBy("priority")),

    // greedy budgeted corpus selection (the 0/1 knapsack heuristic):
    // sources ranked by quality-per-byte (docs ≥300 chars per byte,
    // ppm), selected whole while the running byte total stays under the
    // B = total/3 budget — the "which sources make the training cut"
    // decision readout on the bounded source dictionary
    "q428_quality_knapsack" -> ((s, dir) => {
      val src = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("source")
        .agg(sum(col("n_chars")).as("bytes"),
          sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("value"))
        .withColumn("ratio_ppm", expr("value * 1000000 div bytes"))
      val tot = src.agg(sum("bytes").as("tb"))
      val cumx = Window.orderBy(col("ratio_ppm").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, -1)
      src.crossJoin(broadcast(tot))
        .withColumn("prefix", coalesce(sum(col("bytes")).over(cumx), lit(0L)))
        .select(col("source"), col("bytes"), col("value"), col("ratio_ppm"),
          when(col("prefix") < expr("tb div 3"), 1L).otherwise(0L).as("selected"))
        .orderBy(col("ratio_ppm").desc, col("source"))
    }),

    // word-bigram entropy RATE per lang: H(W₂|W₁) = H(pair) − H(context),
    // both from exact counts with the single-ln micro-nat quantization
    // (q72's convention) — the "how predictable is this corpus" readout
    // that separates boilerplate-heavy from diverse text. The conditional
    // term is computed as (Σctx − Σpair) div N directly, not as a
    // difference of two floored divisions
    "q429_entropy_rate" -> ((s, dir) => {
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ", -1)).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
      val big = words
        .withColumn("w2", lead(col("w"), 1).over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("w2").isNotNull)
        .groupBy("lang", "w", "w2").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val lnq: Column => Column = x =>
        round(log(x.cast("double")) * 1000000, 0).cast("long")
      val sp = big.groupBy("lang")
        .agg(sum(col("c")).as("np"),
          sum((col("c") * lnq(col("c"))).cast(dec38)).as("sp"))
      val sc = big.groupBy("lang", "w").agg(sum(col("c")).as("cctx"))
        .groupBy("lang")
        .agg(sum((col("cctx") * lnq(col("cctx"))).cast(dec38)).as("sc"))
      sp.join(sc, Seq("lang"))
        .withColumn("lnn", lnq(col("np")))
        .select(col("lang"), col("np").as("n_bigrams"),
          expr("lnn - sp div np").as("h_pair_micro"),
          expr("lnn - sc div np").as("h_ctx_micro"),
          expr("(sc - sp) div np").as("h_cond_micro"))
        .orderBy("lang")
    }),

    // vocabulary coverage curve: share of all tokens covered by the
    // top-k most frequent words, k ∈ {1,2,5,10,20} — the tokenizer /
    // stoplist sizing readout (q76's Heaps growth answers "how fast does
    // vocab grow"; this answers "how little vocab buys how much mass").
    // Rank + cumulative windows run on the bounded vocab dictionary only
    "q430_vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      val vc = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c"))
      val ord = Window.orderBy(col("c").desc, col("w"))
      val tot = vc.agg(sum("c").as("nt"))
      val ks = Seq(1L, 2L, 5L, 10L, 20L).toDF("k")
      vc.withColumn("rk", row_number().over(ord).cast("long"))
        .withColumn("cum", sum(col("c")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(ks), col("rk") === col("k"))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("cum").as("covered_tokens"),
          expr("cum * 1000000 div nt").as("coverage_ppm"))
        .orderBy("k")
    }),

    // token-bucket rate-limiter simulation over the hourly event arrival
    // series (capacity 2r, refill r = ceil(total/48) per hour): the
    // ingest-throttling capacity-planning readout — how much would a
    // limiter at the mean rate drop during bursts? Sequential by nature:
    // WITH RECURSIVE over the 24-hour zero-filled grid (q359's
    // materialize-then-recurse shape; the horizon is the latency knob)
    "q431_token_bucket" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mn = ev.agg(min(unix_micros(col("ts"))).as("t0"))
      val hours = ev.crossJoin(broadcast(mn))
        .select(expr("(unix_micros(ts) - t0) div 3600000000").as("hi"))
        .filter(col("hi") < 24)
        .groupBy("hi").agg(count(lit(1)).as("arr"))
      val grid = s.range(24).select(col("id").as("hi"))
        .join(hours, Seq("hi"), "left").na.fill(0L, Seq("arr"))
      val tot = grid.agg(expr("(sum(arr) + 23) div 24").as("r"))
      grid.crossJoin(broadcast(tot))
        .select(col("hi"), col("arr"), col("r"), (col("r") * 2).as("cap"))
        .localCheckpoint(false)
        .createOrReplaceTempView("q431_grid")
      s.sql(
        """WITH RECURSIVE tb(hi, arr, served, dropped, b) AS (
          |  SELECT g.hi, g.arr, least(g.arr, g.cap), g.arr - least(g.arr, g.cap),
          |         g.cap - least(g.arr, g.cap)
          |  FROM q431_grid g WHERE g.hi = 0
          |  UNION ALL
          |  SELECT g.hi, g.arr,
          |         least(g.arr, least(g.cap, tb.b + g.r)),
          |         g.arr - least(g.arr, least(g.cap, tb.b + g.r)),
          |         least(g.cap, tb.b + g.r) - least(g.arr, least(g.cap, tb.b + g.r))
          |  FROM tb JOIN q431_grid g ON g.hi = tb.hi + 1
          |)
          |SELECT hi AS hour_index, arr AS arrivals, served, dropped,
          |       b AS bucket_end
          |FROM tb ORDER BY hi""".stripMargin)
    }),

    // Stupid Backoff bigram scoring (Brants et al.) — the CCNet-style
    // cross-lingual quality score: train counts from the 'en' slice,
    // score every other lang's bigrams as ln(c₁₂/cctx) when seen, else
    // α·unigram backoff (α = 0.4), else the OOV floor — each branch ONE
    // quantized ln. The per-lang mean is occurrence-weighted exact
    // integer arithmetic; all count dictionaries are vocab-bounded
    "q432_stupid_backoff" -> ((s, dir) => {
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ", -1)).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val big = words
        .withColumn("w2", lead(col("w"), 1).over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("w2").isNotNull)
      val tb = big.filter(col("lang") === "en")
        .groupBy(col("w").as("t1"), col("w2").as("t2"))
        .agg(count(lit(1)).as("cb"))
      val tu = words.filter(col("lang") === "en")
        .groupBy(col("w").as("t")).agg(count(lit(1)).as("cu"))
      val nTrain = tu.agg(sum("cu").as("ntr"))
      big.filter(col("lang") =!= "en")
        .groupBy("lang", "w", "w2").agg(count(lit(1)).as("c"))
        .join(broadcast(tb), col("w") === col("t1") && col("w2") === col("t2"), "left")
        .join(broadcast(tu.select(col("t").as("t1c"), col("cu").as("cctx"))),
          col("w") === col("t1c"), "left")
        .join(broadcast(tu.select(col("t").as("t2u"), col("cu").as("cu2"))),
          col("w2") === col("t2u"), "left")
        .crossJoin(broadcast(nTrain))
        .withColumn("score", expr(
          "CASE WHEN cb IS NOT NULL THEN" +
            " CAST(round(ln(CAST(cb AS DOUBLE) / cctx) * 1000000) AS BIGINT)" +
            " WHEN cu2 IS NOT NULL THEN" +
            " CAST(round(ln(CAST(0.4 AS DOUBLE) * cu2 / ntr) * 1000000) AS BIGINT)" +
            " ELSE CAST(round(ln(CAST(0.4 AS DOUBLE) / ntr) * 1000000) AS BIGINT) END"))
        .groupBy("lang")
        .agg(sum(col("c")).as("n_bigrams"),
          sum(when(col("cb").isNull, col("c")).otherwise(0L)).as("n_backoff"),
          sum(when(col("cb").isNull && col("cu2").isNull, col("c")).otherwise(0L))
            .as("n_oov"),
          sum((col("c") * col("score")).cast(dec38)).as("ssum"))
        .select(col("lang"), col("n_bigrams"), col("n_backoff"), col("n_oov"),
          expr("ssum div n_bigrams").as("mean_score_micro"))
        .orderBy("lang")
    }),

    // b-bit (b=1) minhash estimate vs the full-width estimate on the
    // same LSH candidate pairs (operators/Dedup.bbitEstimates) — the
    // signature-compression error readout
    "q433_bbit_minhash" -> ((s, dir) =>
      Dedup.bbitEstimates(Tables.documents(s, dir), "doc_id", "text")),

    // cluster-balanced sampling: keep each doc with probability
    // 1/|its near-dup cluster| (md5-uniform u·sz < 2^48, exact integers)
    // so every cluster contributes ~1 expected survivor — the soft
    // alternative to hard keeper dedup (q32) that preserves intra-cluster
    // variety; singletons (docs in no candidate pair) are their own
    // cluster. Readout: kept rate per cluster size — the flattening proof
    "q434_cluster_balanced_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val lbl = graft.operators.ConnectedComponents.labels(
        Dedup.minhashCandidates(docs, "doc_id", "text"), "doc_a", "doc_b")
      val withCl = docs.filter(col("text").isNotNull).select(col("doc_id"))
        .join(lbl.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cl", coalesce(col("cluster_id"), col("doc_id")))
        .localCheckpoint(false)
      val sz = withCl.groupBy("cl").agg(count(lit(1)).as("sz"))
      withCl.join(sz, Seq("cl"))
        .withColumn("u", Dedup.md5Long(concat(lit("cbs#"),
          col("doc_id").cast("string")), 12))
        .withColumn("keep",
          when(col("u").cast(dec38) * col("sz") < lit(Dedup.MinhashMod).cast(dec38),
            1L).otherwise(0L))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
        .withColumn("kept_ppm", expr("n_kept * 1000000 div n_docs"))
        .orderBy("cluster_size")
    }),

    // recency-decay weighting: monthly revenue × exp(-age/6) freshness
    // weight (one libm exp per month, micro-quantized — the ln
    // convention's twin), the "how much does my corpus/revenue skew
    // stale" readout behind freshness-weighted training mixes; the decay
    // arithmetic runs on the bounded month dictionary
    "q435_recency_weights" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_cents"))
      val mx = rev.agg(max("mi").as("mxm"))
      rev.crossJoin(broadcast(mx))
        .withColumn("age", (col("mxm") - col("mi")).cast("long"))
        .withColumn("w_ppm", expr(
          "CAST(round(exp(-CAST(age AS DOUBLE) / 6.0) * 1000000) AS BIGINT)"))
        .select(col("mi").cast("long").as("month_index"), col("rev_cents"), col("age"),
          col("w_ppm"),
          expr("rev_cents * w_ppm div 1000000").as("w_rev_cents"))
        .orderBy("month_index")
    }),

    // ABC–XYZ inventory classification: ABC from cumulative revenue share
    // (80/95 cuts, exact cross-multiplied integers — q239's axis), XYZ
    // from the demand coefficient of variation over the fixed 24-month
    // horizon (zero months count), cv = √(24·Σq²−S²)/S via the q427
    // isqrt (seed + Newton + fix-ups) — the 9-cell planning matrix
    "q436_abc_xyz" -> ((s, dir) => {
      val pm = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_partkey"),
          expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1").as("mi"))
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"),
          sum(centsOf(col("l_extendedprice"))).as("rev"))
        .filter(col("mi") >= 0 && col("mi") < 24)
      val per = pm.groupBy("l_partkey")
        .agg(sum(col("q")).as("sq"), sum(expr("q * q")).as("sqq"),
          sum(col("rev")).as("rev"))
        .filter(col("sq") > 0)
        .localCheckpoint(false)
      val tot = per.agg(sum("rev").as("trev"))
      val cumx = Window.orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      per.crossJoin(broadcast(tot))
        .withColumn("prefix", coalesce(sum(col("rev")).over(cumx), lit(0L)))
        .withColumn("abc_class", expr(
          "CASE WHEN prefix * 100 < trev * 80 THEN 'A'" +
            " WHEN prefix * 100 < trev * 95 THEN 'B' ELSE 'C' END"))
        .withColumn("vv", expr("24 * sqq - sq * sq"))
        .withColumn("t0", floor(sqrt(col("vv").cast("double"))).cast("long"))
        .withColumn("t1", expr("CASE WHEN t0 > 0 THEN (t0 + vv div t0) div 2 ELSE 0 END"))
        .withColumn("rt", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= vv THEN t1 + 1" +
            " WHEN t1 * t1 > vv THEN t1 - 1 ELSE t1 END"))
        .withColumn("cv_milli", expr("rt * 1000 div sq"))
        .withColumn("xyz_class", expr(
          "CASE WHEN cv_milli < 3000 THEN 'X'" +
            " WHEN cv_milli < 4500 THEN 'Y' ELSE 'Z' END"))
        .groupBy("abc_class", "xyz_class")
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("rev_cents"))
        .orderBy("abc_class", "xyz_class")
    }),

    // funnel with an EXCLUSION step: view → purchase conversions that
    // must NOT cross an error event — the "clean conversion" readout
    // plain funnels (q69) overcount. Both next-purchase and next-error
    // come from one reverse conditional-min window pass (q396's shape);
    // a same-microsecond error counts as intervening (strict <)
    "q437_funnel_exclusion" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("next_pur",
          min(when(col("event_type") === "purchase", col("us"))).over(w))
        .withColumn("next_err",
          min(when(col("event_type") === "error", col("us"))).over(w))
        .filter(col("event_type") === "view")
        .select(
          count(lit(1)).as("n_views"),
          count(col("next_pur")).as("n_converted"),
          sum(when(col("next_pur").isNotNull &&
            col("next_err").isNotNull && col("next_err") <= col("next_pur"), 1L)
            .otherwise(0L)).as("n_excluded"))
        .select(col("n_views"), col("n_converted"), col("n_excluded"),
          expr("(n_converted - n_excluded) * 1000000 div n_views")
            .as("clean_rate_ppm"))
    }),

    // AR(2) fit by Yule–Walker on the monthly revenue series: lagged
    // autocovariances as EXACT integers (z = N·y − S removes the mean
    // without rationals; y in k$ keeps C₀² inside decimal38), then
    // φ₁ = C₁(C₀−C₂)/(C₀²−C₁²), φ₂ = (C₂C₀−C₁²)/(C₀²−C₁²) in milli —
    // the forecast-model fit whose inputs q245/q263 already audit
    "q438_ar2_yule_walker" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000" +
          " AS BIGINT)").as("y"))
        .localCheckpoint(false)
      val st = rev.agg(count(lit(1)).as("nm"), sum("y").as("sy2"))
      val z = rev.crossJoin(broadcast(st))
        .withColumn("z", expr("nm * y - sy2"))
        .withColumn("z1", lag(col("z"), 1).over(Window.orderBy("mi")))
        .withColumn("z2", lag(col("z"), 2).over(Window.orderBy("mi")))
      z.agg(max(col("nm")).as("n_months"),
          sum((col("z") * col("z")).cast(dec38)).as("c0"),
          sum((col("z") * col("z1")).cast(dec38)).as("c1"),
          sum((col("z") * col("z2")).cast(dec38)).as("c2"))
        .select(col("n_months"),
          expr("1000 * c1 div c0").as("r1_milli"),
          expr("1000 * c2 div c0").as("r2_milli"),
          expr("1000 * c1 * (c0 - c2) div (c0 * c0 - c1 * c1)").as("phi1_milli"),
          expr("(1000 * (c2 * c0 - c1 * c1)) div (c0 * c0 - c1 * c1)")
            .as("phi2_milli"))
    }),

    // MASE forecast evaluation on monthly revenue: seasonal-naive (lag
    // 12) MAE over naive (lag 1) MAE — the scale-free "is seasonality
    // worth modeling" gate run before q154/q263 commit to a forecaster;
    // exact integer cents throughout, lags on the bounded month dict
    "q439_mase_eval" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("y"))
      val w = Window.orderBy("mi")
      rev.withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("y12", lag(col("y"), 12).over(w))
        .agg(count(lit(1)).as("n_months"),
          count(col("y1")).as("n1"), count(col("y12")).as("n12"),
          sum(abs(col("y") - col("y1"))).as("e1"),
          sum(abs(col("y") - col("y12"))).as("e12"))
        .select(col("n_months"),
          expr("e1 div n1").as("mae_naive_cents"),
          expr("e12 div n12").as("mae_seasonal_cents"),
          expr("CAST(e12 AS DECIMAL(38,0)) * n1 * 1000 div" +
            " (CAST(n12 AS DECIMAL(38,0)) * e1)").as("mase_milli"))
    }),

    // TextTiling-style topic-shift scores: per doc, adjacent 20-word
    // blocks compared by distinct-word Jaccard at each boundary — low
    // boundary cohesion flags multi-topic/stitched documents (the chunker
    // quality signal q97's fixed-width chunks don't see). Block algebra
    // is per-row array work (slice/distinct/intersect — no shuffle);
    // the per-lang roll-up is one hash agg
    "q440_text_tiling" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          filter(split(col("text"), " ", -1), x => length(x) > 0).as("ws"))
        .withColumn("nb", expr("CAST(size(ws) AS BIGINT) div 20"))
        .filter(col("nb") >= 2)
      base
        .select(col("doc_id"), col("lang"), col("ws"),
          explode(sequence(lit(1L), col("nb") - 1)).as("k"))
        .withColumn("ld", array_distinct(slice(col("ws"),
          ((col("k") - 1) * 20 + 1).cast("int"), lit(20))))
        .withColumn("rd", array_distinct(slice(col("ws"),
          (col("k") * 20 + 1).cast("int"), lit(20))))
        .withColumn("inter", size(array_intersect(col("ld"), col("rd"))).cast("long"))
        .withColumn("uni",
          size(col("ld")).cast("long") + size(col("rd")) - col("inter"))
        .withColumn("j_ppm", expr("inter * 1000000 div uni"))
        .groupBy("lang")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_bounds"),
          min(col("j_ppm")).as("min_j_ppm"),
          expr("CAST(sum(j_ppm) div count(1) AS BIGINT)").as("mean_j_ppm"))
        .orderBy("lang")
    }),

    // Youden-J threshold selection: the near-dup label (doc appears in a
    // MinHash/LSH candidate pair) against an n_chars ≤ t classifier
    // swept over the 9 equi-width cut points — TPR/FPR as exact
    // cross-multiplied ppm, the argmax flagged by a window over the
    // 9-row sweep. The "calibrate-the-cheap-filter-against-the-
    // expensive-label" readout behind every proxy-based curation rule
    "q441_youden_threshold" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      val dupIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("dup1", lit(1L))
      val lab = docs.select(col("doc_id"), col("n_chars"))
        .join(dupIds, Seq("doc_id"), "left")
        .withColumn("dup", coalesce(col("dup1"), lit(0L)))
        .select(col("doc_id"), col("n_chars"), col("dup"))
        .localCheckpoint(false)
      val mm = lab.agg(min("n_chars").as("gmin"), max("n_chars").as("gmax"))
      val thr = s.range(1, 10).select(col("id").as("i"))
        .crossJoin(broadcast(mm))
        .select(col("i"), expr("gmin + i * (gmax - gmin + 1) div 10").as("thr"))
      lab.crossJoin(broadcast(thr))
        .groupBy("i", "thr")
        .agg(sum(when(col("dup") === 1 && col("n_chars") <= col("thr"), 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("dup") === 0 && col("n_chars") <= col("thr"), 1L)
            .otherwise(0L)).as("fp"),
          sum(col("dup")).as("p"),
          sum(lit(1L) - col("dup")).as("n"))
        .select(col("i"), col("thr"),
          expr("tp * 1000000 div p").as("tpr_ppm"),
          expr("fp * 1000000 div n").as("fpr_ppm"),
          expr("tp * 1000000 div p - fp * 1000000 div n").as("j_ppm"))
        .withColumn("is_best",
          (row_number().over(Window.orderBy(col("j_ppm").desc, col("i"))) === 1)
            .cast("long"))
        .orderBy("i")
    }),

    // embedding-space anisotropy: off-diagonal vs diagonal covariance
    // mass from the q98 exact second-moment relation — the "do I need
    // whitening before cosine retrieval" one-row readout (Ethayarajh-
    // style anisotropy, here as an exact integer ratio over cov_e6)
    "q442_anisotropy" -> ((s, dir) => {
      val cov = graft.operators.EmbeddingStats.covarianceUpperTriangle(
        Tables.embeddings(s, dir), "embedding")
      cov.agg((max(col("j")) + 1).as("d"),
          sum(when(col("i") === col("j"), abs(col("cov_e6"))).otherwise(0L))
            .as("diag_mass"),
          sum(when(col("i") =!= col("j"), abs(col("cov_e6")) * 2).otherwise(0L))
            .as("off_mass"),
          max(when(col("i") =!= col("j"), abs(col("cov_e6"))).otherwise(0L))
            .as("max_offdiag"))
        .select(col("d"), col("diag_mass"), col("off_mass"), col("max_offdiag"),
          expr("off_mass * 1000000 div diag_mass").as("off_ratio_ppm"))
    }),

    // covariate balance (standardized mean difference) across the q415
    // md5 experiment arms: smd² = 2·D²/(n_B²·VA + n_A²·VB) with
    // D = S_A·n_B − S_B·n_A and V the n-scaled central second moments —
    // all exact decimal products, one isqrt (q427's chain) per covariate.
    // The randomization-health twin of the SRM gate: arms can pass SRM
    // yet arrive imbalanced on length/width covariates
    "q443_smd_balance" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select((Dedup.md5Long(concat(lit("smd#"),
          col("doc_id").cast("string")), 12) % 2).as("arm"),
          col("n_chars").as("x1"),
          size(filter(split(col("text"), " ", -1), x => length(x) > 0))
            .cast("long").as("x2"))
      val cov = base.select(col("arm"), lit("n_chars").as("covariate"), col("x1").as("x"))
        .unionByName(base.select(col("arm"), lit("n_words").as("covariate"),
          col("x2").as("x")))
      cov.groupBy("covariate")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sa"),
          sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sb"),
          sum(when(col("arm") === 0, col("x") * col("x")).otherwise(0L)).as("saa"),
          sum(when(col("arm") === 1, col("x") * col("x")).otherwise(0L)).as("sbb"))
        .withColumn("dd", expr("CAST(sa AS DECIMAL(38,0)) * nb" +
          " - CAST(sb AS DECIMAL(38,0)) * na"))
        .withColumn("vv", expr(
          "CAST(nb AS DECIMAL(38,0)) * nb * (CAST(na AS DECIMAL(38,0)) * saa - CAST(sa AS DECIMAL(38,0)) * sa)" +
            " + CAST(na AS DECIMAL(38,0)) * na * (CAST(nb AS DECIMAL(38,0)) * sbb - CAST(sb AS DECIMAL(38,0)) * sb)"))
        .withColumn("q2", expr("2 * dd * dd * 1000000 div vv"))
        .withColumn("t0", floor(sqrt(col("q2").cast("double"))).cast("long"))
        .withColumn("t1", expr("CASE WHEN t0 > 0 THEN (t0 + q2 div t0) div 2 ELSE 0 END"))
        .withColumn("smd_milli", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= q2 THEN t1 + 1" +
            " WHEN t1 * t1 > q2 THEN t1 - 1 ELSE t1 END"))
        .select(col("covariate"), col("na"), col("nb"), col("smd_milli"))
        .orderBy("covariate")
    }),

    // collation-aware distinct census (Spark 4 collations): per lang,
    // distinct texts under binary equality vs UTF8_LCASE — the case-only
    // variant count that decides whether dedup should fold case before
    // hashing; the oracle replays LCASE as lower() (equivalent on this
    // corpus's ASCII+CJK text, which has no locale-special casing)
    "q444_collation_census" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_distinct_binary"),
          countDistinct(expr("collate(text, 'UTF8_LCASE')"))
            .as("n_distinct_lcase"))
        .withColumn("case_only_variants",
          expr("n_distinct_binary - n_distinct_lcase"))
        .orderBy("lang")),

    // TPC-H Q22-shaped sales opportunity: customers with above-average
    // POSITIVE balance and no order since 2000 (this synthetic data has
    // every customer ordering at least once, so the lapse cutoff is the
    // non-degenerate form of Q22's no-orders test), per market segment —
    // the classic anti-join + 1-row scalar-bound composition in exact
    // cents (the cross-multiplied abal·n_pos > sum_pos test avoids the
    // average's division entirely)
    "q445_sales_opportunity" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          centsOf(col("c_acctbal")).as("abal"))
      val posAvg = cust.filter(col("abal") > 0)
        .agg(count(lit(1)).as("n_pos"), sum(col("abal")).as("sum_pos"))
      cust.crossJoin(broadcast(posAvg))
        .filter(col("abal").cast(dec38) * col("n_pos") > col("sum_pos").cast(dec38))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("segment")
        .agg(count(lit(1)).as("n_cust"), sum(col("abal")).as("total_bal_cents"))
        .orderBy("segment")
    }),

    // information value (WoE/IV) of the n_chars feature against the
    // near-dup label — the credit-scoring-style "how predictive is this
    // cheap feature" readout that complements q441's threshold pick:
    // 5 equi-width bins, per-bin weight of evidence as a single
    // quantized ln, IV contributions as exact cross-multiplied
    // integers over the bounded bin relation
    "q446_information_value" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      val dupIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("dup1", lit(1L))
      val lab = docs.select(col("doc_id"), col("n_chars"))
        .join(dupIds, Seq("doc_id"), "left")
        .withColumn("dup", coalesce(col("dup1"), lit(0L)))
        .localCheckpoint(false)
      val mm = lab.agg(min("n_chars").as("gmin"), max("n_chars").as("gmax"))
      val binned = lab.crossJoin(broadcast(mm))
        .select(expr("(n_chars - gmin) * 5 div (gmax - gmin + 1)").as("bin"),
          col("dup"))
        .groupBy("bin")
        .agg(sum(col("dup")).as("g"), sum(lit(1L) - col("dup")).as("b"))
      val tot = binned.agg(sum("g").as("gt"), sum("b").as("bt"))
      binned.crossJoin(broadcast(tot))
        .withColumn("woe_micro", expr(
          "CASE WHEN g > 0 AND b > 0 THEN CAST(round(ln(" +
            "CAST(g AS DOUBLE) * bt / (CAST(b AS DOUBLE) * gt)) * 1000000)" +
            " AS BIGINT) ELSE 0 END"))
        .withColumn("iv_contrib_nano", expr(
          "CASE WHEN g > 0 AND b > 0 THEN" +
            " CAST((CAST(g AS DECIMAL(38,0)) * bt - CAST(b AS DECIMAL(38,0)) * gt)" +
            " * (woe_micro * 1000) div (CAST(gt AS DECIMAL(38,0)) * bt) AS BIGINT)" +
            " ELSE 0 END"))
        .select(col("bin"), col("g").as("n_dup"), col("b").as("n_nondup"),
          col("woe_micro"), col("iv_contrib_nano"))
        .orderBy("bin")
    }),

    // normalization gain for dedup: docs that become duplicates only
    // AFTER q110's normalization (lowercase, strip non-alnum, collapse
    // spaces) — the "how much does cheap text normalization buy my exact
    // dedup" per-source delta, from two group-count window passes over
    // one scan
    "q447_normalization_gain" -> ((s, dir) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), col("text"), md5(norm).as("nh"))
        .withColumn("c_raw", count(lit(1)).over(Window.partitionBy("text")))
        .withColumn("c_norm", count(lit(1)).over(Window.partitionBy("nh")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("c_raw") > 1, 1L).otherwise(0L)).as("dup_raw"),
          sum(when(col("c_norm") > 1, 1L).otherwise(0L)).as("dup_norm"))
        .withColumn("gain", expr("dup_norm - dup_raw"))
        .orderBy("source")
    }),

    // one-way ANOVA across weekdays (daily revenue in k$): F from
    // per-group exact sums with the single floor-div U_g = S_g² div n_g
    // convention applied identically on both engines — the "does
    // weekday structure exist at all" gate upstream of q223's seasonal
    // index; everything past the daily aggregation runs on ≤7 rows
    "q448_anova_weekday" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("day"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))" +
          " div 100000 AS BIGINT)").as("y"))
        .select(expr("CAST(dayofweek(day) AS BIGINT)").as("wd"), col("y"))
      val g = daily.groupBy("wd")
        .agg(count(lit(1)).as("ng"), sum(col("y")).as("sg"),
          sum(expr("y * y")).as("ssg"))
        .withColumn("ug", expr("CAST(sg AS DECIMAL(38,0)) * sg div ng"))
      g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(col("sg")).as("st"), sum(col("ssg")).as("sst"),
          sum(col("ug").cast(dec38)).as("su"))
        .select(col("k"), col("n"),
          expr("su - CAST(st AS DECIMAL(38,0)) * st div n").as("ssb"),
          expr("CAST(sst AS DECIMAL(38,0)) - su").as("ssw"))
        .select(col("k"), col("n"),
          col("ssb").cast("long").as("ssb"), col("ssw").cast("long").as("ssw"),
          expr("1000 * (n - k) * ssb div ((k - 1) * ssw)").as("f_milli"))
    }),

    // shingle-size sensitivity: how the shared-gram surface shrinks as
    // word n-grams grow (n ∈ {2,3,5}) — the dedup-tuning sweep that
    // decides the shingle width before committing a signature store
    // (wider grams → fewer false candidate pairs, more missed near-dups).
    // Per-doc distinct grams are built map-side from the word array; the
    // only shuffles are the per-(n, gram) hash agg and the doc roll-up
    "q449_shingle_sensitivity" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          filter(split(col("text"), " ", -1), x => length(x) > 0).as("ws"))
        .localCheckpoint(false)
      def gramRows(n: Int) = base
        .filter(size(col("ws")) >= n)
        .select(lit(n.toLong).as("n"), col("doc_id"),
          explode(array_distinct(transform(
            sequence(lit(1), size(col("ws")) - n + 1),
            i => concat_ws(" ", slice(col("ws"), i, lit(n)))))).as("gram"))
      val gr = gramRows(2).union(gramRows(3)).union(gramRows(5))
        .localCheckpoint(false)
      val shared = gr.groupBy("n", "gram").agg(count(lit(1)).as("cd"))
      val stats = shared.groupBy("n")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("cd") > 1, 1L).otherwise(0L)).as("n_shared_grams"))
      val touched = gr.join(shared.filter(col("cd") > 1).select("n", "gram"),
          Seq("n", "gram"))
        .groupBy("n").agg(countDistinct(col("doc_id")).as("n_docs_touched"))
      stats.join(touched, Seq("n"), "left")
        .na.fill(0L, Seq("n_docs_touched"))
        .orderBy("n")
    }),

    // per-user behavioral entropy: event-type distribution entropy per
    // user (single-ln micro-nats, q429's convention), histogrammed in
    // 0.1-nat buckets — the "bots repeat one action, humans mix"
    // segmentation readout; all libm work happens on the per-(user,
    // type) count relation
    "q450_user_entropy" -> ((s, dir) => {
      val lnq: Column => Column = x =>
        round(log(x.cast("double")) * 1000000, 0).cast("long")
      Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("nu"), sum(col("c") * lnq(col("c"))).as("sl"))
        .select(col("user_id"),
          (lnq(col("nu")) - expr("sl div nu")).as("h_micro"))
        .groupBy(expr("h_micro div 100000").as("bucket"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("bucket")
    }),

    // quantile treatment effect: per-decile order-statistic difference
    // of n_chars between the md5 experiment arms — where in the
    // distribution the arms differ, which the mean-based q314/q443
    // readouts can't localize. Order stats picked exactly at rank
    // (d·n) div 10 via per-arm rank windows (at 100 TB the same ranks
    // come from approx-quantile + verify); the decile join is bounded
    "q451_qte_deciles" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select((Dedup.md5Long(concat(lit("qte#"),
          col("doc_id").cast("string")), 12) % 2).as("arm"),
          col("n_chars"), col("doc_id"))
      val wa = Window.partitionBy("arm").orderBy(col("n_chars"), col("doc_id"))
      val ranked = base
        .withColumn("rn", row_number().over(wa).cast("long"))
        .withColumn("na", count(lit(1)).over(Window.partitionBy("arm")))
        .localCheckpoint(false)
      val ds = ranked
        .join(broadcast((1L to 9L).toDF("d")),
          col("rn") === expr("greatest(1, d * na div 10)"))
        .groupBy("d")
        .agg(max(when(col("arm") === 0, col("n_chars"))).as("v_ctrl"),
          max(when(col("arm") === 1, col("n_chars"))).as("v_treat"))
      ds.select(col("d").as("decile"), col("v_ctrl"), col("v_treat"),
          (col("v_treat") - col("v_ctrl")).as("qte"))
        .orderBy("decile")
    }),

    // cross-modal sanity: Pearson correlation (milli, exact integer
    // sums + isqrt) between a doc's n_chars and its embedding's
    // quantized squared norm — a cheap "are these embeddings actually
    // of these documents" alignment check before any retrieval build
    // trusts the id join
    "q452_text_embed_corr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("doc_id"),
          expr("aggregate(transform(embedding," +
            " v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))," +
            " CAST(0 AS BIGINT), (acc, q) -> acc + q * q) div 1000000").as("y"))
      val j = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars").as("x"))
        .join(emb, Seq("doc_id"))
      j.agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec38)).as("sx"), sum(col("y").cast(dec38)).as("sy"),
          sum((col("x") * col("y")).cast(dec38)).as("sxy"),
          sum((col("x") * col("x")).cast(dec38)).as("sxx"),
          sum((col("y").cast(dec38) * col("y"))).as("syy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("dd", expr("(n * sxx - sx * sx) * (n * syy - sy * sy)"))
        .withColumn("t0", floor(sqrt(col("dd").cast("double"))).cast(dec38))
        .withColumn("t1", expr("(t0 + dd div t0) div 2"))
        .withColumn("t2", expr("(t1 + dd div t1) div 2"))
        .withColumn("rt", expr(
          "CASE WHEN CAST(t2 + 1 AS DECIMAL(38,0)) * (t2 + 1) <= dd THEN t2 + 1" +
            " WHEN CAST(t2 AS DECIMAL(38,0)) * t2 > dd THEN t2 - 1 ELSE t2 END"))
        .select(col("n").as("n_docs"),
          expr("CASE WHEN num >= 0 THEN (1000 * num) div rt" +
            " ELSE -((1000 * (-num)) div rt) END").as("pearson_milli"))
    }),

    // moving-block bootstrap SE of mean monthly revenue — the honest
    // uncertainty for an AUTOCORRELATED series (q121's iid bootstrap
    // understates it): 50 deterministic md5 replicates × contiguous
    // 4-month blocks, replicate means in exact k$, SE via the
    // B·Σm²−(Σm)² identity + isqrt; the block/replicate grid is bounded
    // and joins the month dictionary by index
    "q453_block_bootstrap" -> ((s, dir) => {
      import s.implicits._
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        // k$ units keep every variance term far inside long range (the
        // q438 trade): cents-scale v2 would wrap the div's long quotient
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))" +
          " div 100000 AS BIGINT)").as("y"))
        .withColumn("rn", row_number().over(Window.orderBy("mi")).cast("long"))
        .localCheckpoint(false)
      val nrow = rev.agg(count(lit(1)).as("n"))
      val grid = s.range(50).select(col("id").as("r"))
        .crossJoin(s.range(20).select(col("id").as("j")))
        .crossJoin(broadcast(nrow))
        .filter(col("j") < expr("n div 4"))
        .withColumn("start", expr("1 + CAST(conv(substring(md5(" +
          "concat('bb#', r, '#', j)), 1, 12), 16, 10) AS BIGINT) % (n - 3)"))
      val reps = grid
        .crossJoin(broadcast((0L to 3L).toDF("o")))
        .withColumn("rn", col("start") + col("o"))
        .join(rev.select("rn", "y"), Seq("rn"))
        .groupBy("r")
        .agg(count(lit(1)).as("len"), sum(col("y")).as("ssum"))
        .select(col("r"), expr("ssum div len").as("m"))
      reps.agg(count(lit(1)).as("b"),
          sum(col("m").cast(dec38)).as("sm"),
          sum((col("m").cast(dec38) * col("m"))).as("smm"))
        .withColumn("v2", expr("(b * smm - sm * sm) div (CAST(b AS DECIMAL(38,0)) * b)"))
        .withColumn("t0", floor(sqrt(col("v2").cast("double"))).cast("long"))
        .withColumn("t1", expr("CASE WHEN t0 > 0 THEN (t0 + v2 div t0) div 2 ELSE 0 END"))
        .select(col("b").as("n_replicates"),
          expr("sm div b").cast("long").as("boot_mean_kusd"),
          expr("CASE WHEN (t1 + 1) * (t1 + 1) <= v2 THEN t1 + 1" +
            " WHEN t1 * t1 > v2 THEN t1 - 1 ELSE t1 END").as("boot_se_kusd"))
    }),

    // chunk-stitch detection: doc A's trailing 3 words == doc B's
    // leading 3 words — the boundary-overlap artifact a fixed-width
    // chunker (q97) leaves behind, invisible to whole-doc dedup. Affixes
    // are map-side per-row slices; the only shuffle is the
    // suffix = prefix equi-join
    "q454_chunk_stitch" -> ((s, dir) => {
      val affix = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          filter(split(col("text"), " ", -1), x => length(x) > 0).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(col("ws"), 1, 3)).as("pre"),
          concat_ws(" ", expr("slice(ws, size(ws) - 2, 3)")).as("suf"))
        .localCheckpoint(false)
      affix.as("a").join(affix.as("b"),
          col("a.suf") === col("b.pre") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.suf").as("affix"))
        .orderBy("doc_a", "doc_b")
    }),

    // float-drift audit: the numerics-honesty check behind the
    // everything-in-integer-cents discipline — each engine sums the raw
    // doubles ITS OWN way (order-dependent, not comparable) and asserts
    // the drift against the exact cents sum stays under a cent per
    // thousand rows; only the exact sum and the bound verdict cross
    // engines (q38's bound-check pattern)
    "q455_float_drift_audit" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("c_custkey") === col("o_custkey"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_orders"),
          sum(centsOf(col("o_totalprice"))).as("revenue_cents"),
          sum(col("o_totalprice")).as("_dsum"))
        .select(col("segment"), col("n_orders"), col("revenue_cents"),
          (abs(col("_dsum") * 100 - col("revenue_cents")) <
            greatest(lit(1.0), col("n_orders") * lit(0.001))).as("drift_within_bound"))
        .orderBy("segment")),

    // BM25 k1 sensitivity sweep: the q209 scorer at k1 ∈ {0.8, 1.2, 2.0}
    // (b = 3/4), each as exact integer rationals with per-config
    // coefficients (num, tf·L, L, len·N) derived from k1 = p/q — the
    // term-saturation tuning readout: does the ranking CARE about k1 on
    // this corpus? Shared tf/idf/lens relations computed once
    "q456_bm25_k1_sweep" -> ((s, dir) => {
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val lens = words.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val totals = lens.agg(sum(col("len")).as("big_l"), count(lit(1)).as("big_n"))
      val tf = words.filter(col("w").isin("vector", "stream", "filter"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val idf = tf.groupBy("w").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(totals))
        .select(col("w"), round(log(lit(1.0) +
          ((col("big_n") - col("df")).cast("double") + 0.5) /
            (col("df").cast("double") + 0.5)) * 1000000, 0).cast("long")
          .as("idf_micro"))
      val base = tf.join(broadcast(idf), "w").join(lens, "doc_id")
        .crossJoin(broadcast(totals))
        .localCheckpoint(false)
      // k1 = p/q, b = 3/4 ⇒ score term = idf·4(p+q)·tf·L over
      // 4qL·tf + pL + 3p·len·N (q209's 44/20/6/18 is the (6,5) row)
      def config(k1Milli: Long, num: Long, ctf: Long, cl: Long, clen: Long) = base
        .withColumn("_num", col("idf_micro").cast(dec38) * num * col("tf")
          * col("big_l"))
        .withColumn("_den", lit(ctf).cast(dec38) * col("tf") * col("big_l")
          + lit(cl).cast(dec38) * col("big_l")
          + lit(clen).cast(dec38) * col("len") * col("big_n"))
        .withColumn("_c", expr("(2 * _num + _den) div (2 * _den)"))
        .groupBy("doc_id").agg(sum(col("_c")).as("bm25_micro"))
        .withColumn("k1_milli", lit(k1Milli))
      val all = config(800L, 36, 20, 4, 12)
        .union(config(1200L, 44, 20, 6, 18))
        .union(config(2000L, 12, 4, 2, 6))
      all.withColumn("rk", row_number().over(Window.partitionBy("k1_milli")
          .orderBy(col("bm25_micro").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("k1_milli"), col("rk"), col("doc_id"), col("bm25_micro"))
        .orderBy("k1_milli", "rk")
    }),

    // zero-order entropy coding bound per source: char-frequency entropy
    // → bits/char → the best any dictionary-free entropy coder could do
    // on this source (the storage-planning twin of q326's encoding
    // planner, from first principles); one char explosion, single-ln
    // micro-nat terms on the bounded (source, char) relation
    "q457_entropy_coding_bound" -> ((s, dir) => {
      val lnq: Column => Column = x =>
        round(log(x.cast("double")) * 1000000, 0).cast("long")
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(sequence(lit(1), length(col("text")))).as("i"),
          col("text"))
        .select(col("source"), expr("substring(text, i, 1)").as("ch"))
        .groupBy("source", "ch").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_chars_total"),
          count(lit(1)).as("n_distinct_chars"),
          sum((col("c") * lnq(col("c"))).cast(dec38)).as("sl"))
        .withColumn("h_char_micro", expr(
          "CAST(CAST(round(ln(CAST(n_chars_total AS DOUBLE)) * 1000000) AS BIGINT)" +
            " - sl div n_chars_total AS BIGINT)"))
        .select(col("source"), col("n_chars_total"), col("n_distinct_chars"),
          col("h_char_micro"),
          expr("h_char_micro * 1000000000 div 693147181").as("bits_per_char_micro"),
          expr("CAST(n_chars_total AS DECIMAL(38,0))" +
            " * (h_char_micro * 1000000000 div 693147181) div 8000000")
            .as("est_bytes"))
        .orderBy("source")
    }),

    // intraclass correlation + design effect: how much do orders within
    // a customer resemble each other, and how much does that inflate the
    // variance of cluster sampling — DEFF = 1 + (m̄−1)·ICC, the survey
    // statistic that justifies q419's cluster jackknife. One-way ANOVA
    // components as exact integers with the q448 floor-div convention;
    // the (k−1)(m₀−1) term collapses to N − Σn² div N − k + 1 exactly
    "q458_icc_design_effect" -> ((s, dir) => {
      val per = Tables.orders(s, dir)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 1000").as("y"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("ng"), sum(col("y")).as("sg"),
          sum(expr("y * y")).as("ssg"))
        .withColumn("ug", expr("CAST(sg AS DECIMAL(38,0)) * sg div ng"))
      per.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(col("sg").cast(dec38)).as("st"), sum(col("ssg").cast(dec38)).as("sst"),
          sum(col("ug").cast(dec38)).as("su"),
          sum((col("ng") * col("ng")).cast(dec38)).as("sn2"))
        .withColumn("ssb", expr("su - st * st div n"))
        .withColumn("ssw", expr("sst - su"))
        .withColumn("icc_milli", expr(
          "1000 * ((n - k) * CAST(ssb AS DECIMAL(38,0)) - (k - 1) * ssw)" +
            " div ((n - k) * CAST(ssb AS DECIMAL(38,0))" +
            " + (n - sn2 div n - k + 1) * ssw)"))
        .select(col("k").as("k_clusters"), col("n").as("n_obs"),
          col("icc_milli"),
          expr("1000 + (n div k - 1) * icc_milli").as("deff_milli"))
    }),

    // nonparametric median CI: the order-statistic interval at ranks
    // (n ± 1.96√n)/2 — distribution-free, exact integer ranks with the
    // isqrt(n) radical (seed + fix-ups; n < 2⁵² so the double seed is
    // already exact), order stats picked by one rank window. The
    // "how sure is my median" readout q33/q58's point estimates lack
    "q459_median_ci" -> ((s, dir) => {
      val v = Tables.orders(s, dir)
        .select(centsOf(col("o_totalprice")).as("v"), col("o_orderkey"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("v"), col("o_orderkey"))).cast("long"))
        .localCheckpoint(false)
      val st = v.agg(count(lit(1)).as("n"))
        .withColumn("t0", floor(sqrt(col("n").cast("double"))).cast("long"))
        .withColumn("s", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= n THEN t0 + 1" +
            " WHEN t0 * t0 > n THEN t0 - 1 ELSE t0 END"))
        .withColumn("rad", expr("196 * s div 100"))
        .select(col("n"),
          expr("greatest(1, (n - rad) div 2)").as("lo_rank"),
          expr("least(n, (n + rad) div 2 + 1)").as("hi_rank"),
          expr("(n + 1) div 2").as("med_rank"))
      v.crossJoin(broadcast(st))
        .filter(col("rn") === col("lo_rank") || col("rn") === col("hi_rank") ||
          col("rn") === col("med_rank"))
        .groupBy("n")
        .agg(max(when(col("rn") === col("med_rank"), col("v"))).as("median_cents"),
          max(when(col("rn") === col("lo_rank"), col("v"))).as("lo_cents"),
          max(when(col("rn") === col("hi_rank"), col("v"))).as("hi_cents"))
        .select(col("n").as("n_orders"), col("median_cents"),
          col("lo_cents"), col("hi_cents"))
    }),

    // Ljung–Box portmanteau test on monthly revenue (lags 1..6): is the
    // series white noise at all, the gate before q438 fits an AR(2) —
    // Q = n(n+2)·Σ r_k²/(n−k) from the same exact N·y−S autocovariances,
    // each term one floor-div (C_k²·1e6 div (C_0²·(n−k))), identical on
    // both engines; the verdict compares against χ²₆ at 95%
    "q460_ljung_box" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000" +
          " AS BIGINT)").as("y"))
        .localCheckpoint(false)
      val st = rev.agg(count(lit(1)).as("nm"), sum("y").as("sy2"))
      val w = Window.orderBy("mi")
      val z = rev.crossJoin(broadcast(st))
        .withColumn("z", expr("nm * y - sy2"))
      val withLags = (1 to 6).foldLeft(z) { (df, k) =>
        df.withColumn(s"z$k", lag(col("z"), k).over(w))
      }
      val agg = withLags.agg(
        max(col("nm")).as("n"),
        sum((col("z") * col("z")).cast(dec38)).as("c0") +:
          (1 to 6).map(k =>
            sum((col("z") * col(s"z$k")).cast(dec38)).as(s"c$k")): _*)
      val terms = (1 to 6).map(k =>
        s"(c$k * c$k * 1000000) div (c0 * c0 * (n - $k))").mkString(" + ")
      agg.select(col("n").as("n_months"),
          expr(s"n * (n + 2) * ($terms)").as("q_micro"))
        .withColumn("reject_white_noise", col("q_micro") > 12591587L)
    }),

    // consistent-hashing ring placement: 4 nodes × 8 md5 vnodes, every
    // part key assigned to the first vnode clockwise (wraparound = the
    // global min) — the alternative to q276's rendezvous hashing, with
    // the balance readout that shows WHY vnodes exist (raw ring arcs are
    // uneven; 8 vnodes/node tighten the spread). The 32-row vnode table
    // broadcasts; assignment is a bounded min-struct aggregation per key
    "q461_hash_ring" -> ((s, dir) => {
      import s.implicits._
      val vnodes = (for (nd <- 0 to 3; vn <- 0 to 7) yield (nd.toLong, vn.toLong))
        .toDF("node", "vn")
        .withColumn("vpos", Dedup.md5Long(concat(lit("ring#"), col("node"),
          lit("#"), col("vn")), 12))
      val keys = Tables.part(s, dir)
        .select(col("p_partkey"),
          Dedup.md5Long(concat(lit("key#"), col("p_partkey").cast("string")), 12)
            .as("kpos"))
      keys.crossJoin(broadcast(vnodes))
        .groupBy("p_partkey")
        .agg(
          min(when(col("vpos") >= col("kpos"),
            struct(col("vpos"), col("node")))).as("nxt"),
          min(struct(col("vpos"), col("node"))).as("wrap"))
        .select(col("p_partkey"),
          coalesce(col("nxt.node"), col("wrap.node")).as("node"))
        .groupBy("node")
        .agg(count(lit(1)).as("n_keys"))
        .withColumn("share_ppm", expr(
          "n_keys * 1000000 div sum(n_keys) OVER ()"))
        .orderBy("node")
    }),

    // SRE error budget / burn rate: rolling 6-hour error share against a
    // 1% SLO over the 48-hour zero-filled grid — burn 1000 milli = the
    // budget burning exactly at allowance, the multi-window paging rule
    // (the q431 limiter's observability twin); windows on the bounded
    // hour dictionary only
    "q462_error_budget" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mn = ev.agg(min(unix_micros(col("ts"))).as("t0"))
      val hours = ev.crossJoin(broadcast(mn))
        .select(expr("(unix_micros(ts) - t0) div 3600000000").as("hi"),
          col("event_type"))
        .filter(col("hi") < 48)
        .groupBy("hi")
        .agg(count(lit(1)).as("tot"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      val grid = s.range(48).select(col("id").as("hi"))
        .join(hours, Seq("hi"), "left").na.fill(0L, Seq("tot", "err"))
      val w6 = Window.orderBy("hi").rowsBetween(-5, 0)
      grid
        .withColumn("tot6", sum(col("tot")).over(w6))
        .withColumn("err6", sum(col("err")).over(w6))
        .select(col("hi").as("hour_index"), col("tot"), col("err"),
          expr("CASE WHEN tot6 > 0 THEN err6 * 100000 div tot6 ELSE 0 END")
            .as("burn_milli_6h"))
        .withColumn("page", col("burn_milli_6h") > 10000L)
        .orderBy("hour_index")
    }),

    // RANGE vs ROWS running frames, made visible: the cumulative revenue
    // of 1995's orders under the default RANGE frame (date peers share
    // the cum value) vs a ROWS frame with a key tiebreak — per month, how
    // many rows diverge and by how much. The frame-semantics pitfall
    // every windowed metric silently steps on with tied order keys
    "q463_range_vs_rows" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(expr("year(o_orderdate) = 1995"))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"),
          centsOf(col("o_totalprice")).as("v"))
      val rowsW = Window.orderBy(col("d"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rangeW = Window.orderBy(col("d"))
      o.withColumn("cum_rows", sum(col("v")).over(rowsW))
        .withColumn("cum_range", sum(col("v")).over(rangeW))
        .groupBy(expr("CAST(month(d) AS BIGINT)").as("m"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("cum_rows") =!= col("cum_range"), 1L).otherwise(0L))
            .as("n_diverging"),
          max(abs(col("cum_rows") - col("cum_range"))).as("max_gap_cents"))
        .orderBy("m")
    }),

    // two-factor ANOVA with interaction (weekday × order priority, daily
    // order counts as the response): does the weekday effect DEPEND on
    // priority — the q448 one-way test can't ask that. All four sums of
    // squares from the shared U = S² div n floor convention
    // (cells/rows/cols/total), interaction by inclusion–exclusion; the
    // cell grid is 7×5 — everything past the first agg is bounded
    "q464_anova_interaction" -> ((s, dir) => {
      val cells = Tables.orders(s, dir)
        .groupBy(expr("CAST(dayofweek(o_orderdate) AS BIGINT)").as("wd"),
          col("o_orderpriority").as("pr"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy("wd", "pr")
        .agg(count(lit(1)).as("nc"), sum(col("y")).as("sc"),
          sum(expr("y * y")).as("ssc"))
        .localCheckpoint(false)
      val byA = cells.groupBy("wd").agg(sum("nc").as("na"), sum("sc").as("sa"))
        .agg(sum(expr("CAST(sa AS DECIMAL(38,0)) * sa div na")).as("ua"),
          count(lit(1)).as("a"))
      val byB = cells.groupBy("pr").agg(sum("nc").as("nb"), sum("sc").as("sb"))
        .agg(sum(expr("CAST(sb AS DECIMAL(38,0)) * sb div nb")).as("ub"),
          count(lit(1)).as("b"))
      cells.agg(sum("nc").as("n"), sum("sc").as("st"), sum("ssc").as("sst"),
          sum(expr("CAST(sc AS DECIMAL(38,0)) * sc div nc")).as("uc"),
          count(lit(1)).as("ncells"))
        .crossJoin(broadcast(byA)).crossJoin(broadcast(byB))
        .withColumn("ut", expr("CAST(st AS DECIMAL(38,0)) * st div n"))
        .select(col("a"), col("b"), col("n").as("n_days_cells"),
          expr("CAST(uc - ua - ub + ut AS BIGINT)").as("ss_interaction"),
          expr("CAST(CAST(sst AS DECIMAL(38,0)) - uc AS BIGINT)").as("ss_within"),
          expr("CAST(1000 * (n - a * b) * (uc - ua - ub + ut)" +
            " div (CAST((a - 1) * (b - 1) AS DECIMAL(38,0))" +
            " * (CAST(sst AS DECIMAL(38,0)) - uc)) AS BIGINT)").as("f_int_milli"))
    }),

    // stratified average treatment effect: per-lang arm contrast of
    // n_chars (md5 arms), each stratum's ATE an exact cross-multiplied
    // milli ratio — the Cochran-style adjustment that stops a lang-mix
    // imbalance from masquerading as a treatment effect (q443 checks
    // balance; this estimates THROUGH imbalance)
    "q465_stratified_ate" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (Dedup.md5Long(concat(lit("qte#"), col("doc_id").cast("string")), 12) % 2)
            .as("arm"),
          col("n_chars"))
        .groupBy("lang")
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("arm") === 1, col("n_chars")).otherwise(0L)).as("st"),
          sum(when(col("arm") === 0, col("n_chars")).otherwise(0L)).as("sc"))
        .withColumn("ate_milli", expr(
          "CAST(1000 * (CAST(st AS DECIMAL(38,0)) * nc - CAST(sc AS DECIMAL(38,0)) * nt)" +
            " div (CAST(nt AS DECIMAL(38,0)) * nc) AS BIGINT)"))
        .select(col("lang"), col("nt"), col("nc"), col("ate_milli"))
        .orderBy("lang")),

    // L-moments of the order-total distribution: L-scale (half the Gini
    // mean difference) and the L-skewness ratio τ₃ — the robust shape
    // measures that exist for ANY distribution with a mean (unlike
    // classical skewness) and come straight from rank-weighted sums:
    // λ₂ ∝ Σ(2i−n−1)x₍ᵢ₎, λ₃ ∝ Σ[C(i−1,2) − 2(i−1)(n−i) + C(n−i,2)]x₍ᵢ₎,
    // τ₃ exact via cross-multiplied integers. One global rank window
    // (the documented at-scale trade), then pure integer reduction
    "q466_l_moments" -> ((s, dir) => {
      val v = Tables.orders(s, dir)
        .select(centsOf(col("o_totalprice")).as("x"), col("o_orderkey"))
        .withColumn("i", row_number().over(
          Window.orderBy(col("x"), col("o_orderkey"))).cast("long"))
      v.crossJoin(broadcast(v.agg(count(lit(1)).as("n"))))
        .agg(max(col("n")).as("n"),
          sum(col("x").cast(dec38)).as("sx"),
          sum(expr("CAST(i * 2 - n - 1 AS DECIMAL(38,0)) * x")).as("l2n"),
          sum(expr("CAST(((i - 1) * (i - 2)) div 2 - 2 * (i - 1) * (n - i)" +
            " + ((n - i) * (n - i - 1)) div 2 AS DECIMAL(38,0)) * x")).as("l3n"))
        .select(col("n").as("n_orders"),
          expr("CAST(sx div n AS BIGINT)").as("l1_mean_cents"),
          expr("CAST(l2n div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)")
            .as("l2_cents"),
          expr("CAST(1000 * l3n * n * (n - 1)" +
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1) * (n - 2) div 2 * l2n)" +
            " AS BIGINT)").as("t3_milli"))
    }),

    // time-weighted average value per event type (TWAP): each reading
    // weighted by its holding interval to the next same-type event —
    // the irregular-sampling average a plain mean gets wrong when
    // readings cluster; Σ v·Δt div ΣΔt in exact cents×µs, intervals
    // from one lead window per type
    "q467_twap" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"), centsOf(col("value")).as("v"))
        .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dt").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("span_us"),
          sum((col("v") * col("dt")).cast(dec38)).as("vw"))
        .select(col("event_type"), col("n_intervals"), col("span_us"),
          expr("CAST(vw div span_us AS BIGINT)").as("twap_cents"))
        .orderBy("event_type")
    }),

    // LSH family comparison: which near-dup candidates MinHash (word
    // 3-gram Jaccard geometry) and SimHash (Hamming geometry) each see
    // on the same corpus — the overlap census that picks the family (or
    // says "run both") before a signature store is built. Two existing
    // operator outputs, one full-outer pair join
    "q468_lsh_overlap" -> ((s, dir) => {
      val mh = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).withColumn("m", lit(1L))
      val sh = Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).withColumn("h", lit(1L))
      mh.join(sh, Seq("doc_a", "doc_b"), "full_outer")
        .agg(sum(coalesce(col("m"), lit(0L))).as("n_minhash"),
          sum(coalesce(col("h"), lit(0L))).as("n_simhash"),
          sum(when(col("m").isNotNull && col("h").isNotNull, 1L).otherwise(0L))
            .as("n_both"))
        .select(col("n_minhash"), col("n_simhash"), col("n_both"),
          (col("n_minhash") - col("n_both")).as("n_only_minhash"),
          (col("n_simhash") - col("n_both")).as("n_only_simhash"))
    }),

    // RangePartitioner simulation: split points from a deterministic
    // 1-in-20 md5 sample (rank picks at ⌈i·m/32⌉, exactly Spark's
    // sampled range partitioning), then the EXACT balance of the full
    // relation under those 31 splits — the "how wrong is the sample"
    // readout behind every sorted write; the split dictionary broadcasts,
    // the flag-sum assignment is map-side
    "q469_range_partitioner_sim" -> ((s, dir) => {
      import s.implicits._
      val v = Tables.orders(s, dir)
        .select(col("o_orderkey"), centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val samp = v.filter(Dedup.md5Long(concat(lit("rps#"),
          col("o_orderkey").cast("string")), 12) % 20 === 0)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("v"), col("o_orderkey"))).cast("long"))
        .localCheckpoint(false)
      val m = samp.agg(count(lit(1)).as("m"))
      val splits = (1L to 31L).toDF("i").crossJoin(broadcast(m))
        .join(samp, col("rn") === expr("(i * m + 31) div 32"))
        .select(col("i"), col("v").as("s"))
      val tot = v.agg(count(lit(1)).as("n"))
      v.crossJoin(broadcast(splits))
        .groupBy("o_orderkey")
        .agg(sum(when(col("v") > col("s"), 1L).otherwise(0L)).as("pid"))
        .groupBy("pid").agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(tot))
        .select(col("pid"), col("n_rows"),
          expr("n_rows * 32000000 div n").as("fill_ppm"))
        .orderBy("pid")
    }),

    // point-in-time-correct feature assembly: features strictly BEFORE
    // the 1999-01-01 cutoff, the label strictly AFTER (any order in
    // 1999) — the leakage discipline every churn/LTV table needs, read
    // out as per-label feature means so a leak (post-cutoff data in a
    // feature) would show up as an implausible separation
    "q470_pit_features" -> ((s, dir) => {
      val cutoff = lit("1999-01-01").cast("timestamp")
      val horizon = lit("2000-01-01").cast("timestamp")
      val o = Tables.orders(s, dir)
      val feat = o.filter(col("o_orderdate") < cutoff)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_pre"),
          sum(centsOf(col("o_totalprice"))).as("rev_pre"),
          min(expr("CAST(datediff(TIMESTAMP '1999-01-01', o_orderdate) AS BIGINT)"))
            .as("recency_days"))
      val lab = o.filter(col("o_orderdate") >= cutoff && col("o_orderdate") < horizon)
        .select(col("o_custkey")).distinct().withColumn("label", lit(1L))
      feat.join(lab, Seq("o_custkey"), "left")
        .withColumn("label", coalesce(col("label"), lit(0L)))
        .groupBy("label")
        .agg(count(lit(1)).as("n_customers"),
          expr("CAST(sum(n_pre) div count(1) AS BIGINT)").as("avg_n_pre"),
          expr("CAST(sum(rev_pre) div count(1) AS BIGINT)").as("avg_rev_pre_cents"),
          expr("CAST(sum(recency_days) div count(1) AS BIGINT)")
            .as("avg_recency_days"))
        .orderBy("label")
    }),

    // negative-binomial moment fit of per-user event counts: p = m/v and
    // r = m²/(v−m) as exact cross-multiplied milli ratios — the
    // overdispersion diagnosis (r < 0 ⇒ not NB, counts are
    // under-dispersed) behind bot-vs-human activity modeling; one user
    // aggregation, then closed form on the 1-row moment relation
    "q471_nb_moments" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
          sum(expr("k * k")).as("skk"))
        .select(col("n").as("n_users"),
          expr("1000 * sk div n").as("mean_milli"),
          expr("CAST(1000 * (CAST(n AS DECIMAL(38,0)) * skk - CAST(sk AS DECIMAL(38,0)) * sk)" +
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("var_milli"),
          expr("CAST(1000 * CAST(sk AS DECIMAL(38,0)) * n" +
            " div (CAST(n AS DECIMAL(38,0)) * skk - CAST(sk AS DECIMAL(38,0)) * sk)" +
            " AS BIGINT)").as("p_milli"),
          expr("CAST(1000 * CAST(sk AS DECIMAL(38,0)) * sk" +
            " div (CAST(n AS DECIMAL(38,0)) * skk - CAST(sk AS DECIMAL(38,0)) * sk" +
            " - CAST(sk AS DECIMAL(38,0)) * n) AS BIGINT)").as("r_milli"))),

    // PII masking APPLY (q102 audits, this redacts): digits in the event
    // props payload replaced with '#', per-type census of changed rows
    // and masked characters — the pure-transform shape of a redaction
    // pass (one scan, two regexp evaluations, no shuffle before the
    // roll-up)
    "q472_pii_mask_apply" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), col("props"),
          regexp_replace(col("props"), "[0-9]", "#").as("masked"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("props") =!= col("masked"), 1L).otherwise(0L))
            .as("n_changed"),
          sum((length(col("props")) -
            length(regexp_replace(col("props"), "[0-9]", ""))).cast("long"))
            .as("chars_masked"))
        .orderBy("event_type")),

    // Fleiss' κ for THREE deterministic raters (length, word-count, and
    // vocab-richness rules): multi-rater agreement beyond q420's
    // pairwise Cohen — per item the agreeing-pair count C(x,2)+C(3−x,2),
    // κ_ppm = (3N·A − X² − (3N−X)²)·1e6 div ((3N)² − X² − (3N−X)²),
    // all exact integers per lang
    "q473_fleiss_kappa" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"),
          (size(array_distinct(filter(split(col("text"), " ", -1),
            x => length(x) > 0))) >= 28).cast("long").as("c"))
        .withColumn("x", expr("a + b + c"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("xs"),
          sum(expr("(x * (x - 1) + (3 - x) * (2 - x)) div 2")).as("ap"))
        .select(col("lang"), col("n").as("n_docs"),
          expr("xs * 1000000 div (3 * n)").as("p_pos_ppm"),
          expr("CAST(CASE WHEN CAST(3 * n AS DECIMAL(38,0)) * (3 * n)" +
            " - CAST(xs AS DECIMAL(38,0)) * xs" +
            " - CAST(3 * n - xs AS DECIMAL(38,0)) * (3 * n - xs) = 0 THEN 0" +
            " ELSE (CAST(3 * n AS DECIMAL(38,0)) * ap" +
            " - CAST(xs AS DECIMAL(38,0)) * xs" +
            " - CAST(3 * n - xs AS DECIMAL(38,0)) * (3 * n - xs)) * 1000000" +
            " div (CAST(3 * n AS DECIMAL(38,0)) * (3 * n)" +
            " - CAST(xs AS DECIMAL(38,0)) * xs" +
            " - CAST(3 * n - xs AS DECIMAL(38,0)) * (3 * n - xs)) END AS BIGINT)")
            .as("kappa_fleiss_ppm"))
        .orderBy("lang")),

    // Brown–Forsythe test (variance homogeneity across priorities):
    // ANOVA on |y − group median| — the robust Levene variant whose
    // verdict gates every pooled-variance test upstream (q232/q448
    // assume it); group medians are exact lower-median order stats, the
    // F ratio reuses the q448 floor-div convention on the deviations
    "q474_brown_forsythe" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("y"),
          col("o_orderkey"))
      val wg = Window.partitionBy("g").orderBy(col("y"), col("o_orderkey"))
      val ranked = o.withColumn("rn", row_number().over(wg).cast("long"))
        .withColumn("ng", count(lit(1)).over(Window.partitionBy("g")))
        .localCheckpoint(false)
      val med = ranked.filter(col("rn") === expr("(ng + 1) div 2"))
        .select(col("g"), col("y").as("med"))
      // deviations in tens-of-dollars units (div 1000): at cents scale
      // the S² div n terms overflow long past sf0.05 (the q458 trade)
      val z = ranked.join(broadcast(med), Seq("g"))
        .select(col("g"), expr("abs(y - med) div 1000").as("z"))
      val grp = z.groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
          sum(expr("z * z")).as("szz"))
        .withColumn("u", expr("CAST(sz AS DECIMAL(38,0)) * sz div n"))
      grp.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
          sum(col("sz").cast(dec38)).as("st"), sum(col("szz").cast(dec38)).as("sst"),
          sum(col("u").cast(dec38)).as("su"))
        .select(col("k"), col("nn").as("n_orders"),
          expr("CAST(su - st * st div nn AS BIGINT)").as("ssb"),
          expr("CAST(sst - su AS BIGINT)").as("ssw"),
          expr("CAST(1000 * (nn - k) * (su - st * st div nn)" +
            " div (CAST(k - 1 AS DECIMAL(38,0)) * (sst - su)) AS BIGINT)")
            .as("f_milli"))
    }),

    // rolling-origin forecast evaluation: six consecutive origins, each
    // forecasting its next month with naive (lag 1) and seasonal-naive
    // (lag 12) — the per-origin error table behind q439's aggregate MASE
    // (one bad month can hide in an aggregate; this shows WHICH)
    "q475_rolling_origin" -> ((s, dir) => {
      val w = Window.orderBy("mi")
      Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("y"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("y12", lag(col("y"), 12).over(w))
        .filter(col("mi") >= 18 && col("mi") <= 23)
        .select(col("mi").cast("long").as("target_month"), col("y").as("actual_cents"),
          abs(col("y") - col("y1")).as("naive_err_cents"),
          abs(col("y") - col("y12")).as("snaive_err_cents"),
          (abs(col("y") - col("y12")) < abs(col("y") - col("y1")))
            .cast("long").as("seasonal_wins"))
        .orderBy("target_month")
    }),

    // capture–recapture population estimation: two independent md5
    // "sightings" of the ordering-customer population, Lincoln–Petersen
    // n₁n₂/m and the bias-corrected Chapman estimator vs the TRUE count
    // — the mark-recapture sanity check for dedup-rate estimation from
    // samples; everything from three semi-join-free hash aggregations
    "q476_capture_recapture" -> ((s, dir) => {
      val cust = Tables.orders(s, dir).select(col("o_custkey")).distinct()
        .withColumn("ina",
          (Dedup.md5Long(concat(lit("capA#"), col("o_custkey").cast("string")), 12)
            % 5 === 0).cast("long"))
        .withColumn("inb",
          (Dedup.md5Long(concat(lit("capB#"), col("o_custkey").cast("string")), 12)
            % 5 === 0).cast("long"))
      cust.agg(count(lit(1)).as("n_true"),
          sum(col("ina")).as("n1"), sum(col("inb")).as("n2"),
          sum(col("ina") * col("inb")).as("m"))
        .select(col("n_true"), col("n1"), col("n2"), col("m"),
          expr("CASE WHEN m > 0 THEN n1 * n2 div m ELSE NULL END").as("est_lp"),
          expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("est_chapman"))
        .withColumn("chapman_err_ppm",
          expr("abs(est_chapman - n_true) * 1000000 div n_true"))
    }),

    // Wald–Wolfowitz runs test on daily revenue direction: are up/down
    // days random, the sign-based serial check beside q364's von
    // Neumann ratio and q460's Ljung–Box — R runs vs E[R] = 2n₁n₂/n + 1,
    // z from the exact cross-multiplied variance with one isqrt; the
    // sign chain is two lag windows on the day dictionary
    "q477_runs_test" -> ((s, dir) => {
      val w = Window.orderBy("day")
      val signs = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000" +
          " AS BIGINT)").as("y"))
        .withColumn("yp", lag(col("y"), 1).over(w))
        .filter(col("yp").isNotNull)
        .withColumn("s", (col("y") > col("yp")).cast("long"))
        .withColumn("sp", lag(col("s"), 1).over(w))
      signs.agg(count(lit(1)).as("n"),
          sum(col("s")).as("n1"),
          sum(lit(1L) - col("s")).as("n2"),
          (sum(when(col("sp").isNotNull && col("s") =!= col("sp"), 1L)
            .otherwise(0L)) + 1).as("runs"))
        .withColumn("aa", expr("runs * n - 2 * n1 * n2 - n"))
        .withColumn("x2", expr(
          "CAST(1000000 * CAST(aa AS DECIMAL(38,0)) * aa * (n - 1)" +
            " div (CAST(2 AS DECIMAL(38,0)) * n1 * n2 * (2 * n1 * n2 - n))" +
            " AS BIGINT)"))
        .withColumn("t0", floor(sqrt(col("x2").cast("double"))).cast("long"))
        .withColumn("rt", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= x2 THEN t0 + 1" +
            " WHEN t0 * t0 > x2 THEN t0 - 1 ELSE t0 END"))
        .select(col("n").as("n_days"), col("n1").as("n_up"), col("n2").as("n_down"),
          col("runs"),
          expr("CASE WHEN aa >= 0 THEN rt ELSE -rt END").as("z_milli"))
    }),

    // broadcast-join planner audit: per-table row counts × declared row
    // widths → which side of each core FK join clears the 10 MB
    // autoBroadcastJoinThreshold — the cost-based strategy table Spark
    // itself consults, externalized (q334's estimate audit for
    // cardinality; this one for strategy). Nine 1-row counts, a 5-row
    // join-spec dictionary, zero data movement
    "q478_broadcast_planner" -> ((s, dir) => {
      import s.implicits._
      def cnt(name: String, df: DataFrame, width: Long) =
        df.agg(count(lit(1)).as("rows")).select(lit(name).as("t"), col("rows"),
          (col("rows") * width).as("bytes"))
      val stats = cnt("customer", Tables.customer(s, dir), 64L)
        .union(cnt("orders", Tables.orders(s, dir), 56L))
        .union(cnt("lineitem", Tables.lineitem(s, dir), 88L))
        .union(cnt("part", Tables.part(s, dir), 72L))
        .union(cnt("supplier", Tables.supplier(s, dir), 48L))
        .localCheckpoint(false)
      val joins = Seq(
        ("orders_customer", "orders", "customer"),
        ("lineitem_orders", "lineitem", "orders"),
        ("lineitem_part", "lineitem", "part"),
        ("lineitem_supplier", "lineitem", "supplier"),
        ("part_supplier", "part", "supplier"))
        .toDF("join_name", "probe", "build")
      joins
        .join(broadcast(stats.select(col("t").as("build"),
          col("rows").as("build_rows"), col("bytes").as("build_bytes"))), Seq("build"))
        .join(broadcast(stats.select(col("t").as("probe"),
          col("rows").as("probe_rows"))), Seq("probe"))
        .select(col("join_name"), col("probe_rows"), col("build_rows"),
          col("build_bytes"),
          when(col("build_bytes") < 10485760L, lit("broadcast_hash"))
            .otherwise(lit("sort_merge")).as("strategy"))
        .orderBy("join_name")
    }),

    // iterative proportional fitting (raking), two passes: reweight the
    // lang×source cell grid toward uniform margins — the survey/corpus
    // rebalancing step behind "equal lang share AND equal source share"
    // mixing targets that one-axis temperature sampling (q68) can't hit.
    // Row factors then column factors, each an exact ppm integer div;
    // everything runs on the bounded 5×20 grid
    "q479_ipf_raking" -> ((s, dir) => {
      val cells = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val tot = cells.agg(sum(col("n")).as("nn"),
        countDistinct(col("lang")).as("nl"),
        countDistinct(col("source")).as("ns"))
      val g = cells.crossJoin(broadcast(tot))
        .withColumn("rs", sum(col("n")).over(Window.partitionBy("lang")))
        .withColumn("w1", expr("(1000000 * (nn div nl)) div rs"))
        .withColumn("cs1", sum(col("n") * col("w1"))
          .over(Window.partitionBy("source")))
        .withColumn("w2", expr(
          "w1 * ((1000000 * (nn div ns) * 1000000) div cs1) div 1000000"))
      g.select(col("lang"), col("source"), col("n").as("n_docs"),
          col("w2").as("w_ppm"))
        .orderBy("lang", "source")
    }),

    // sequential probability ratio test (SPRT) on the daily error rate:
    // H0 p=1%, H1 p=2%, α=β=5% — the cumulative log-likelihood walk
    // with ±ln 19 boundaries, read out as the first crossing day and
    // verdict. The always-valid monitoring rule fixed-horizon tests
    // (q415/q232) can't give; ln constants are single libm calls, the
    // walk is one cumsum window on the day dictionary
    "q480_sprt" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(expr("CAST(date_trunc('DAY', ts) AS DATE)").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
        .withColumn("llr", expr(
          "e * CAST(round(ln(2.0D) * 1000000) AS BIGINT)" +
            " + (n - e) * CAST(round(ln(CAST(0.98 AS DOUBLE) / 0.99) * 1000000)" +
            " AS BIGINT)"))
        .withColumn("cum", sum(col("llr")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
        .localCheckpoint(false)
      val a = 2944439L // round(ln(19)·1e6)
      daily.agg(count(lit(1)).as("n_days"),
          max(col("cum")).as("max_cum_micro"),
          min(col("cum")).as("min_cum_micro"),
          min(when(col("cum") >= a, col("rn"))).as("cross_h1_day"),
          min(when(col("cum") <= -a, col("rn"))).as("cross_h0_day"))
        .select(col("n_days"), col("max_cum_micro"), col("min_cum_micro"),
          coalesce(col("cross_h1_day"), lit(0L)).as("cross_h1_day"),
          coalesce(col("cross_h0_day"), lit(0L)).as("cross_h0_day"),
          expr("CASE WHEN coalesce(cross_h1_day, 0) > 0" +
            " AND (coalesce(cross_h0_day, 0) = 0 OR cross_h1_day < cross_h0_day)" +
            " THEN 'accept_h1'" +
            " WHEN coalesce(cross_h0_day, 0) > 0 THEN 'accept_h0'" +
            " ELSE 'continue' END").as("decision"))
    }),

    // Dirichlet-smoothed query-likelihood retrieval (μ = 2000): the LM
    // alternative to q209's BM25 — score = Σ ln((tf·|C| + μ·cf) /
    // ((len+μ)·cf)), one quantized ln per (doc, term), absent terms
    // included (their doc-length penalty is the model's point). The
    // 3-term × collection-frequency dictionary broadcasts; top-10
    "q481_dirichlet_lm" -> ((s, dir) => {
      import s.implicits._
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val lens = words.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val ctot = words.agg(count(lit(1)).as("ct"))
      val terms = Seq("vector", "stream", "filter").toDF("w")
      val cf = words.join(broadcast(terms), Seq("w"))
        .groupBy("w").agg(count(lit(1)).as("cf"))
      val tf = words.join(broadcast(terms), Seq("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      lens.crossJoin(broadcast(cf)).crossJoin(broadcast(ctot))
        .join(tf, Seq("doc_id", "w"), "left").na.fill(0L, Seq("tf"))
        .withColumn("sc", expr(
          "CAST(round(ln((CAST(tf AS DOUBLE) * ct + 2000.0D * cf)" +
            " / ((CAST(len AS DOUBLE) + 2000.0D) * cf)) * 1000000) AS BIGINT)"))
        .groupBy("doc_id").agg(sum(col("sc")).as("score_micro"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("rk"), col("doc_id"), col("score_micro"))
        .orderBy("rk")
    }),

    // weak-supervision label model: majority vote of the three q473
    // raters against the near-dup "gold" label — the Snorkel-style
    // question "do my cheap labeling functions, combined, actually
    // track the expensive label", per lang with exact ppm accuracy
    "q482_weak_labels" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      val dupIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("gold1", lit(1L))
      docs.select(col("doc_id"), col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"),
          (size(array_distinct(filter(split(col("text"), " ", -1),
            x => length(x) > 0))) >= 28).cast("long").as("c"))
        .withColumn("pred", (expr("a + b + c") >= 2).cast("long"))
        .join(dupIds, Seq("doc_id"), "left")
        .withColumn("gold", coalesce(col("gold1"), lit(0L)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pred")).as("n_pred_pos"),
          sum(col("gold")).as("n_gold_pos"),
          sum(when(col("pred") === col("gold"), 1L).otherwise(0L)).as("n_agree"))
        .withColumn("acc_ppm", expr("n_agree * 1000000 div n_docs"))
        .orderBy("lang")
    }),

    // Holm–Bonferroni multiple-testing correction over the five
    // segment-mean contrasts: z² per segment from exact cross-multiplied
    // sums (k$ units), ranked most-significant-first against the
    // step-down χ²₁ critical ladder (α=5%), rejections stop at the
    // first failure — the family-wise control a per-segment q232 lacks
    "q483_holm_correction" -> ((s, dir) => {
      import s.implicits._
      val per = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("c_custkey") === col("o_custkey"))
        .select(col("segment"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100000").as("y"))
        .groupBy("segment")
        .agg(count(lit(1)).as("ns"), sum(col("y")).as("ss"),
          sum(expr("y * y")).as("sss"))
        .localCheckpoint(false)
      val tot = per.agg(sum(col("ns")).as("nn"), sum(col("ss")).as("st"),
        sum(col("sss")).as("sst"))
      val crit = Seq(1L -> 6635L, 2L -> 6239L, 3L -> 5731L, 4L -> 5024L,
        5L -> 3841L).toDF("rnk", "crit_milli")
      val z2 = per.crossJoin(broadcast(tot))
        .withColumn("z2_milli", expr(
          "CAST(1000 * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " div (CAST(ns AS DECIMAL(38,0)) * nn" +
            " * (CAST(nn AS DECIMAL(38,0)) * sst - CAST(st AS DECIMAL(38,0)) * st))" +
            " AS BIGINT)"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("z2_milli").desc, col("segment"))).cast("long"))
        .join(broadcast(crit), Seq("rnk"))
        .withColumn("pass", (col("z2_milli") >= col("crit_milli")).cast("long"))
      z2.withColumn("n_fail_before",
          sum(lit(1L) - col("pass")).over(Window.orderBy("rnk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("rnk"), col("segment"), col("z2_milli"), col("crit_milli"),
          when(col("n_fail_before") === 0, 1L).otherwise(0L).as("rejected"))
        .orderBy("rnk")
    }),

    // empirical-Bayes shrinkage of per-brand mean prices toward the
    // grand mean: weight n/(n+κ) with κ = within-variance over
    // between-variance from the exact ANOVA components (floor-div at
    // the defined points) — the hierarchical-model fix for small-n
    // group means that q252's raw per-brand aggregates over-trust
    "q484_eb_shrinkage" -> ((s, dir) => {
      val per = Tables.part(s, dir)
        .select(col("p_brand"), centsOf(col("p_retailprice")).as("y"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(expr("y * y")).as("syy"))
        .withColumn("u", expr("CAST(sy AS DECIMAL(38,0)) * sy div n"))
        .localCheckpoint(false)
      val tot = per.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(col("sy").cast(dec38)).as("st"), sum(col("syy").cast(dec38)).as("sst"),
        sum(col("u").cast(dec38)).as("su"))
      per.crossJoin(broadcast(tot))
        // κ = MSW/MSB = ((k−1)·SSW)/((N−k)·SSB), SSW/SSB the q448 sums
        .withColumn("kap", expr(
          "CAST((k - 1) * (sst - su) div" +
            " ((nn - k) * (su - st * st div nn)) AS BIGINT)"))
        .select(col("p_brand"), col("n"),
          expr("sy div n").as("raw_mean_cents"),
          // (n·m_g + κ·m)/(n+κ) = (sy·N + κ·S_tot) / (N·(n+κ))
          expr("CAST((CAST(sy AS DECIMAL(38,0)) * nn + CAST(kap AS DECIMAL(38,0)) * st)" +
            " div (CAST(nn AS DECIMAL(38,0)) * (n + kap)) AS BIGINT)")
            .as("shrunk_mean_cents"))
        .orderBy("p_brand")
    }),

    // standardized Pearson residuals of the lang×source contingency
    // table: which CELLS drive the q119 independence verdict —
    // r = (o−e)/√e as sign·isqrt(1e6·(oN−rc)² div (N·rc)) in milli,
    // flagged at |r| > 2; margins via two windows on the bounded grid
    "q485_pearson_residuals" -> ((s, dir) => {
      val cells = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val tot = cells.agg(sum(col("o")).as("nn"))
      cells.crossJoin(broadcast(tot))
        .withColumn("rsum", sum(col("o")).over(Window.partitionBy("lang")))
        .withColumn("csum", sum(col("o")).over(Window.partitionBy("source")))
        .withColumn("dev", expr("o * nn - rsum * csum"))
        .withColumn("q2", expr(
          "CAST(1000000 * CAST(dev AS DECIMAL(38,0)) * dev" +
            " div (CAST(nn AS DECIMAL(38,0)) * nn * rsum * csum) AS BIGINT)"))
        .withColumn("t0", floor(sqrt(col("q2").cast("double"))).cast("long"))
        .withColumn("rt", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= q2 THEN t0 + 1" +
            " WHEN t0 * t0 > q2 THEN t0 - 1 ELSE t0 END"))
        .select(col("lang"), col("source"), col("o"),
          expr("CASE WHEN dev >= 0 THEN rt ELSE -rt END").as("resid_milli"))
        .withColumn("outlier_cell", (abs(col("resid_milli")) > 2000L).cast("long"))
        .orderBy("lang", "source")
    }),

    // coupon-collector coverage: walking the corpus in deterministic
    // md5 order, at which position has every SOURCE been seen — the
    // "how much do I must sample to cover all sources" readout, with
    // the n·H_n expectation (harmonic sum as shared integer micro
    // terms) beside the observed value
    "q486_coupon_collector" -> ((s, dir) => {
      val ordered = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          Dedup.md5Long(concat(lit("cc#"), col("doc_id").cast("string")), 12).as("h"))
        .withColumn("pos", row_number().over(
          Window.orderBy(col("h"), col("doc_id"))).cast("long"))
        .withColumn("first_of_src", (row_number().over(
          Window.partitionBy("source").orderBy(col("h"), col("doc_id"))) === 1)
          .cast("long"))
      val ns = ordered.agg(countDistinct(col("source")).as("ns"))
      ordered.filter(col("first_of_src") === 1)
        .agg(count(lit(1)).as("n_sources"), max(col("pos")).as("cover_position"))
        .crossJoin(broadcast(ns))
        .select(col("n_sources"), col("cover_position"),
          expr("aggregate(sequence(CAST(1 AS BIGINT), ns), CAST(0 AS BIGINT)," +
            " (acc, i) -> acc + 1000000 div i)").as("harmonic_micro"),
          expr("CAST(ns * aggregate(sequence(CAST(1 AS BIGINT), ns), CAST(0 AS BIGINT)," +
            " (acc, i) -> acc + 1000000 div i) div 1000 AS BIGINT)")
            .as("expected_draws_milli"))
    }),

    // Durbin–Watson statistic on seasonally-adjusted monthly revenue
    // (24-month window, residual e = 2y − same-calendar-month sum so
    // every residual shares one exact scale): DW = Σ(Δe)²/Σe² in milli
    // — the serial-correlation-of-residuals check after removing the
    // seasonal mean, complementing q460/q477 on the raw series
    "q487_durbin_watson" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000" +
          " AS BIGINT)").as("y"))
        .filter(col("mi") >= 0 && col("mi") < 24)
        .withColumn("moy", expr("mi % 12"))
        .withColumn("sm", sum(col("y")).over(Window.partitionBy("moy")))
        .withColumn("e", expr("2 * y - sm"))
        .withColumn("ep", lag(col("e"), 1).over(Window.orderBy("mi")))
      rev.agg(count(lit(1)).as("n_months"),
          sum(expr("CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep) ELSE 0 END")
            .cast(dec38)).as("sd"),
          sum(expr("e * e").cast(dec38)).as("se"))
        .select(col("n_months"),
          expr("CAST(1000 * sd div se AS BIGINT)").as("dw_milli"))
    }),

    // Benjamini–Hochberg FDR (step-UP) over the same five segment
    // contrasts as q483's Holm (step-down): reject every rank ≤ the
    // LARGEST rank whose z² clears its α·r/k ladder value — the two
    // procedures bracket multiplicity control (FWER vs FDR) on one
    // exact-integer statistic set
    "q488_bh_fdr" -> ((s, dir) => {
      import s.implicits._
      val per = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("c_custkey") === col("o_custkey"))
        .select(col("segment"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100000").as("y"))
        .groupBy("segment")
        .agg(count(lit(1)).as("ns"), sum(col("y")).as("ss"),
          sum(expr("y * y")).as("sss"))
        .localCheckpoint(false)
      val tot = per.agg(sum(col("ns")).as("nn"), sum(col("ss")).as("st"),
        sum(col("sss")).as("sst"))
      val crit = Seq(1L -> 6635L, 2L -> 5412L, 3L -> 4709L, 4L -> 4218L,
        5L -> 3841L).toDF("rnk", "crit_milli")
      val z2 = per.crossJoin(broadcast(tot))
        .withColumn("z2_milli", expr(
          "CAST(1000 * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " div (CAST(ns AS DECIMAL(38,0)) * nn" +
            " * (CAST(nn AS DECIMAL(38,0)) * sst - CAST(st AS DECIMAL(38,0)) * st))" +
            " AS BIGINT)"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("z2_milli").desc, col("segment"))).cast("long"))
        .join(broadcast(crit), Seq("rnk"))
        .withColumn("pass", (col("z2_milli") >= col("crit_milli")).cast("long"))
      z2.withColumn("max_pass_rank",
          max(when(col("pass") === 1, col("rnk"))).over(
            Window.partitionBy()))
        .select(col("rnk"), col("segment"), col("z2_milli"), col("crit_milli"),
          when(col("rnk") <= coalesce(col("max_pass_rank"), lit(0L)), 1L)
            .otherwise(0L).as("rejected"))
        .orderBy("rnk")
    }),

    // McNemar's paired test between the two q420 raters: only the
    // DISCORDANT cells carry information about which rater is stricter
    // — χ² = (n01−n10)²/(n01+n10) plus the continuity-corrected form,
    // exact milli per lang; the paired complement to Cohen's κ
    // (agreement) on the same rater pair
    "q489_mcnemar" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)).as("n10"),
          sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L)).as("n01"))
        .select(col("lang"), col("n_docs"), col("n10"), col("n01"),
          expr("CASE WHEN n01 + n10 = 0 THEN 0" +
            " ELSE 1000 * (n01 - n10) * (n01 - n10) div (n01 + n10) END")
            .as("chi2_milli"),
          expr("CASE WHEN n01 + n10 = 0 THEN 0" +
            " ELSE 1000 * (abs(n01 - n10) - 1) * (abs(n01 - n10) - 1)" +
            " div (n01 + n10) END").as("chi2_cc_milli"))
        .orderBy("lang")),

    // Poisson goodness-of-fit of per-(user, day) event counts (zero
    // days included via the user×day grid): expected bin masses from
    // ONE quantized pmf evaluation per k (exp·pow/k!, k ≤ 9 + tail
    // complement — so the e's sum exactly to N), χ² contributions as
    // exact integers after that quantization — the "is activity really
    // Poisson or is it bursty" verdict behind q471's NB fit
    "q490_poisson_gof" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id"), expr("CAST(date_trunc('DAY', ts) AS DATE)").as("day"))
        .localCheckpoint(false)
      val users = ev.select("user_id").distinct()
      val days = ev.select("day").distinct()
      val grid = users.crossJoin(days)
        .join(ev.groupBy("user_id", "day").agg(count(lit(1)).as("k")),
          Seq("user_id", "day"), "left").na.fill(0L, Seq("k"))
        .withColumn("kb", least(col("k"), lit(10L)))
        .groupBy("kb").agg(count(lit(1)).as("o"))
        .localCheckpoint(false)
      val tot = grid.agg(sum(col("o")).as("nn"),
        sum(col("kb") * col("o")).as("sk"))
      val fact = Seq(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 6L, 4L -> 24L,
        5L -> 120L, 6L -> 720L, 7L -> 5040L, 8L -> 40320L, 9L -> 362880L)
        .toDF("kb", "f")
      val bins = s.range(11).select(col("id").as("kb"))
        .join(grid, Seq("kb"), "left").na.fill(0L, Seq("o"))
        .join(fact, Seq("kb"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("e_milli", expr(
          "CAST(round(CASE WHEN kb <= 9 THEN nn * exp(-(CAST(sk AS DOUBLE) / nn))" +
            " * pow(CAST(sk AS DOUBLE) / nn, kb) / f * 1000 ELSE 0.0D END)" +
            " AS BIGINT)"))
        .localCheckpoint(false)
      val tailE = bins.agg((max(col("nn")) * 1000 - sum(col("e_milli"))).as("te"))
      bins.crossJoin(broadcast(tailE))
        .withColumn("e2", when(col("kb") === 10, col("te")).otherwise(col("e_milli")))
        .filter(col("e2") > 0)
        .select(col("kb").as("k_bin"), col("o"), col("e2").as("e_milli"),
          expr("(o * 1000 - e2) * (o * 1000 - e2) div e2").as("contrib_milli"))
        .orderBy("k_bin")
    }),

    // Cochran's Q across the THREE q473 raters: do the raters have the
    // same marginal positive rate — the k-rater generalization of
    // McNemar, Q = (k−1)(kΣC²−T²)/(kΣR−ΣR²) in exact integers per lang
    // (κ says "do they agree per item"; Q says "are they equally
    // strict" — both needed before pooling rater votes)
    "q491_cochran_q" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"),
          (size(array_distinct(filter(split(col("text"), " ", -1),
            x => length(x) > 0))) >= 28).cast("long").as("c"))
        .withColumn("r", expr("a + b + c"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("a")).as("ca"), sum(col("b")).as("cb"), sum(col("c")).as("cc2"),
          sum(col("r")).as("sr"), sum(expr("r * r")).as("srr"))
        .select(col("lang"), col("n_docs"),
          expr("CASE WHEN 3 * sr - srr = 0 THEN 0" +
            " ELSE CAST(1000 * 2 * (3 * (CAST(ca AS DECIMAL(38,0)) * ca" +
            " + CAST(cb AS DECIMAL(38,0)) * cb + CAST(cc2 AS DECIMAL(38,0)) * cc2)" +
            " - CAST(sr AS DECIMAL(38,0)) * sr)" +
            " div (CAST(3 AS DECIMAL(38,0)) * sr - srr) AS BIGINT) END")
            .as("q_milli"))
        .orderBy("lang")),

    // paired sign test: did per-customer revenue rise from 1997 to 1998
    // — medians-free, distribution-free, just the sign of each paired
    // difference (ties dropped), z = (2S−n)/√n via the exact isqrt; the
    // paired counterpart to q289's independent-samples Mann–Whitney
    "q492_sign_test" -> ((s, dir) => {
      val per = Tables.orders(s, dir)
        .filter(expr("year(o_orderdate) IN (1997, 1998)"))
        .groupBy("o_custkey")
        .agg(sum(when(expr("year(o_orderdate) = 1997"),
          centsOf(col("o_totalprice"))).otherwise(0L)).as("r97"),
          sum(when(expr("year(o_orderdate) = 1998"),
            centsOf(col("o_totalprice"))).otherwise(0L)).as("r98"))
        .filter(col("r97") > 0 && col("r98") > 0 && col("r97") =!= col("r98"))
      per.agg(count(lit(1)).as("n"),
          sum(when(col("r98") > col("r97"), 1L).otherwise(0L)).as("s"))
        .withColumn("aa", expr("2 * s - n"))
        .withColumn("x2", expr("1000000 * aa * aa div n"))
        .withColumn("t0", floor(sqrt(col("x2").cast("double"))).cast("long"))
        .withColumn("rt", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= x2 THEN t0 + 1" +
            " WHEN t0 * t0 > x2 THEN t0 - 1 ELSE t0 END"))
        .select(col("n").as("n_pairs"), col("s").as("n_up"),
          expr("CASE WHEN aa >= 0 THEN rt ELSE -rt END").as("z_milli"))
    }),

    // deterministic half-sample bootstrap CI for the A/B mean difference
    // (md5 arms × 50 md5 half-samples): replicate arm-mean differences
    // in exact milli, the 2.5%/97.5% order statistics as the interval —
    // q453's block bootstrap handles autocorrelation; this one handles
    // the two-sample design (does the CI cover zero?)
    "q493_bootstrap_ab_ci" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          (Dedup.md5Long(concat(lit("qte#"), col("doc_id").cast("string")), 12) % 2)
            .as("arm"),
          col("n_chars"))
        .localCheckpoint(false)
      val reps = base.crossJoin(broadcast((0L until 50L).toDF("r")))
        .filter(Dedup.md5Long(concat(lit("bs#"), col("r"), lit("#"),
          col("doc_id")), 12) % 2 === 0)
        .groupBy("r", "arm")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"))
        .groupBy("r")
        .agg(expr("CAST(1000 * max(CASE WHEN arm = 1 THEN sx END)" +
          " div max(CASE WHEN arm = 1 THEN n END)" +
          " - 1000 * max(CASE WHEN arm = 0 THEN sx END)" +
          " div max(CASE WHEN arm = 0 THEN n END) AS BIGINT)").as("diff_milli"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("diff_milli"), col("r"))).cast("long"))
        .localCheckpoint(false)
      val full = base.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"))
        .agg(expr("CAST(1000 * max(CASE WHEN arm = 1 THEN sx END)" +
          " div max(CASE WHEN arm = 1 THEN n END)" +
          " - 1000 * max(CASE WHEN arm = 0 THEN sx END)" +
          " div max(CASE WHEN arm = 0 THEN n END) AS BIGINT)").as("diff_full_milli"))
      reps.agg(count(lit(1)).as("n_reps"),
          max(when(col("rk") === 2, col("diff_milli"))).as("lo_milli"),
          max(when(col("rk") === 49, col("diff_milli"))).as("hi_milli"))
        .crossJoin(broadcast(full))
        .select(col("n_reps"), col("diff_full_milli"), col("lo_milli"),
          col("hi_milli"),
          (col("lo_milli") <= 0L && col("hi_milli") >= 0L).cast("long")
            .as("covers_zero"))
    }),

    // Kruskal–Wallis H across the five order priorities (does at least
    // one priority's price distribution differ): rank sums via the same
    // value-grouped cumulative-count identity as q289 (never a per-row
    // rank — the window runs over the bounded distinct-value relation),
    // tie-corrected, every step exact integer/decimal arithmetic — the
    // k-group generalization of q289's two-sample Mann–Whitney
    "q494_kruskal_wallis" -> ((s, dir) => {
      val j = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("v"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val vstats = j.groupBy("v").agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .localCheckpoint(false)
      val tot = vstats.agg(sum(col("cnt")).as("n"),
        sum(expr("cnt * cnt * cnt - cnt")).as("ties"))
      val tg = j.groupBy("g", "v").agg(count(lit(1)).as("n_gv"))
        .join(vstats, "v")
        .groupBy("g")
        .agg(sum(expr("n_gv * (2 * cb + cnt + 1)")).as("t2"),
          sum(col("n_gv")).as("n_g"))
      tg.agg(count(lit(1)).as("n_groups"),
          sum(expr("CAST(t2 AS DECIMAL(38,0)) * t2 div n_g")).as("s4"))
        .crossJoin(broadcast(tot))
        .withColumn("h_micro", expr(
          "3 * CAST(s4 AS DECIMAL(38,0)) * 1000000 div (n * (n + 1))" +
            " - 3 * (n + 1) * 1000000"))
        .select(col("n_groups"), col("n"), col("h_micro"),
          expr("CAST(h_micro AS DECIMAL(38,0))" +
            " * (CAST(n AS DECIMAL(38,0)) * n * n - n)" +
            " div (CAST(n AS DECIMAL(38,0)) * n * n - n - ties)")
            .as("h_adj_micro"))
    }),

    // Good–Turing unseen mass + Chao1 richness per source over char
    // 4-grams: coverage = 1 − N1/N is the probability the NEXT token is
    // a known type (the "is this source mined out" readout) and Chao1 =
    // V + N1²/(2·N2) lower-bounds the total type count — the pair that
    // decides whether a source repays further crawling. Exact integers;
    // the only shuffle is the (source, gram) count
    "q495_unseen_mass" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 4)
        .select(col("source"),
          explode(expr("sequence(1, length(text) - 3)")).as("i"), col("text"))
        .select(col("source"), expr("substring(text, i, 4)").as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("v_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
        .select(col("source"), col("n_tokens"), col("v_types"), col("n1"),
          col("n2"),
          expr("1000000 - n1 * 1000000 div n_tokens").as("coverage_ppm"),
          expr("v_types + CASE WHEN n2 > 0 THEN n1 * n1 div (2 * n2)" +
            " ELSE n1 * (n1 - 1) div 2 END").as("chao1_types"))
        .orderBy("source")),

    // lexical-richness panel per source: Yule's K = 10⁴·(Σm²−N)/N² and
    // the Simpson repeat rate Σm(m−1)/(N(N−1)) — both length-invariant
    // repetitiveness characteristics (q295's hapax share measures the
    // tail; these measure the head's concentration). All integer-exact
    "q496_lexical_richness" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("m"))
        .groupBy("source")
        .agg(sum(col("m")).as("n_tokens"), count(lit(1)).as("v_types"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("m2"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * (m - 1)")).as("rep"))
        .select(col("source"), col("n_tokens"), col("v_types"),
          expr("CAST(10000000 * (m2 - n_tokens)" +
            " div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
            .as("yules_k_milli"),
          expr("CAST(1000000 * rep" +
            " div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)) AS BIGINT)")
            .as("simpson_ppm"))
        .orderBy("source")),

    // LRU stack-distance profile over per-user event_type access
    // streams: depth d = 1 + |distinct other items touched since this
    // item's previous access| is the Mattson stack distance — ONE pass
    // yields the hit ratio of EVERY cache size at once (hits(C) =
    // Σ_{0<d≤C} n_d). The between-accesses distinct count is a per-user
    // equi-join bounded by the re-reference gap (≤ the item vocabulary
    // on average), ordering pinned to event_id (engine-portable total
    // order — never the nanos-vs-micros timestamp)
    "q497_lru_stack_distance" -> ((s, dir) => {
      val seqd = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("seq", row_number().over(
          Window.partitionBy("user_id").orderBy("event_id")).cast("long"))
        .localCheckpoint(false)
      val prev = seqd.withColumn("pseq", lag(col("seq"), 1).over(
        Window.partitionBy("user_id", "event_type").orderBy("seq")))
      val mid = seqd.select(col("user_id").as("u2"), col("seq").as("s2"),
        col("event_type").as("t2"))
      val depth = prev.filter(col("pseq").isNotNull)
        .join(mid, col("user_id") === col("u2") &&
          col("s2") > col("pseq") && col("s2") < col("seq"), "left")
        .groupBy(col("user_id"), col("seq"))
        .agg((countDistinct(col("t2")) + lit(1L)).as("depth"))
      val hist = depth.groupBy("depth").agg(count(lit(1)).as("n"))
        .unionAll(prev.filter(col("pseq").isNull)
          .agg(count(lit(1)).as("n")).select(lit(0L).as("depth"), col("n")))
      hist.crossJoin(broadcast(hist.agg(sum(col("n")).as("n_total"))))
        .withColumn("cum_hits",
          sum(when(col("depth") > 0, col("n")).otherwise(0L)).over(
            Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("depth"), col("n").as("n_accesses"),
          expr("CASE WHEN depth > 0 THEN cum_hits * 1000000 div n_total" +
            " ELSE 0 END").as("hit_ratio_ppm"))
        .orderBy("depth")
    }),

    // K-minimum-values distinct-count sketch, exactly replayed: the k-th
    // smallest 48-bit md5 of the key estimates |D| ≈ (k−1)·2⁴⁸/h_(k)
    // (uniform order statistics), compared against the exact distinct on
    // the same column — the mergeable-sketch alternative to q162's HLL
    // whose ESTIMATE (not just its bound) is engine-portable integers;
    // top-k is a TakeOrderedAndProject, never a global sort
    "q498_kmv_distinct" -> ((s, dir) => {
      val hk = Tables.orders(s, dir).select(col("o_orderkey")).distinct()
        .select(Dedup.md5Long(
          concat(lit("kmv#"), col("o_orderkey").cast("string")), 12).as("h"))
        .orderBy("h").limit(256)
        .agg(max(col("h")).as("hk"), count(lit(1)).as("k"))
      hk.crossJoin(broadcast(Tables.orders(s, dir)
          .agg(countDistinct(col("o_orderkey")).as("exact_distinct"))))
        .withColumn("est", expr("(k - 1) * 281474976710656 div hk"))
        .select(col("k"), col("exact_distinct"), col("est").as("kmv_estimate"),
          expr("abs(est - exact_distinct) * 1000000 div exact_distinct")
            .as("err_ppm"))
    }),

    // greedy k-center (farthest-point) seeding over embeddings — the
    // kmeans++-family initializer that maximizes coverage: 3 rounds of
    // "pick the vector farthest from everything chosen", distances as
    // 1e-6-quantized integer squared euclidean (q83 discipline), the
    // running min-distance relation updated incrementally (one join per
    // round against the ONE new centroid, never re-scanning the chosen
    // set). Driver state is 4 (id, dist) rows — the bounded iterative-ML
    // license kmeansFit documents; ties → lowest vec_id
    "q499_kcenter_seeding" -> ((s, dir) => {
      import s.implicits._
      val q = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      def distTo(id: Long) = q.join(
          broadcast(q.filter(col("vec_id") === id)
            .select(col("pos").as("cpos"), col("qv").as("qc"))),
          col("pos") === col("cpos"))
        .groupBy("vec_id")
        .agg(sum(expr("(qv - qc) * (qv - qc)")).as("mind"))
      val seed = q.agg(min(col("vec_id"))).collect()(0).getLong(0)
      var picks = Vector((0L, seed, 0L))
      var mind = distTo(seed).localCheckpoint(false)
      (1 to 3).foreach { r =>
        val p = mind.filter(!col("vec_id").isin(picks.map(_._2): _*))
          .orderBy(col("mind").desc, col("vec_id")).limit(1).collect()(0)
        picks = picks :+ ((r.toLong, p.getLong(0), p.getLong(1)))
        if (r < 3)
          mind = mind.join(distTo(p.getLong(0)).withColumnRenamed("mind", "d2"),
              "vec_id")
            .select(col("vec_id"), least(col("mind"), col("d2")).as("mind"))
            .localCheckpoint(false)
      }
      picks.toDF("sel_order", "vec_id", "mind2_q").orderBy("sel_order")
    }),

    // winnowing fingerprints (the MOSS plagiarism-detector selection):
    // per doc, the minimum 48-bit 5-gram hash of every width-4 window —
    // guarantees any ≥8-char match shares a fingerprint while storing
    // ~2/(w+1) of the grams. Readout per source: windows, distinct
    // fingerprints kept (the density the guarantee costs), and
    // fingerprints shared across ≥2 docs (the dup signal). Leading
    // partial frames included — pinned, identical frame semantics in
    // both engines; all per-doc windows, never a global sort
    "q500_winnowing" -> ((s, dir) => {
      val fp = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 5)
        .select(col("source"), col("doc_id"),
          explode(expr("sequence(1, length(text) - 4)")).as("i"), col("text"))
        .select(col("source"), col("doc_id"), col("i"),
          Dedup.md5Long(expr("substring(text, i, 5)"), 12).as("h"))
        .withColumn("m", min(col("h")).over(Window.partitionBy("doc_id")
          .orderBy("i").rowsBetween(-3, 0)))
        .groupBy("source", "doc_id", "m")
        .agg(count(lit(1)).as("n_windows"))
        .localCheckpoint(false)
      val shared = fp.groupBy("source", "m")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .groupBy("source")
        .agg(sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_fp"))
      fp.groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_windows")).as("n_windows"),
          count(lit(1)).as("n_fingerprints"))
        .join(shared, "source")
        .withColumn("density_ppm",
          expr("n_fingerprints * 1000000 div n_windows"))
        .orderBy("source")
    }),

    // HITS hubs & authorities on the supplier-nation → customer-nation
    // trade graph (edge weight = cents revenue): hubs = nations whose
    // suppliers ship to authoritative buyers, authorities = nations
    // whose customers buy from hub sellers — the mutually-recursive pair
    // PageRank's single score conflates. Two normalized iterations in
    // exact integer algebra (max-normalized, half-away rounding — the
    // q163 power-iteration discipline); the edge relation is ≤ n²
    // nation pairs, every score join broadcasts
    "q501_hits_trade" -> ((s, dir) => {
      val cn = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").as("cnat"),
          centsOf(col("o_totalprice")).as("cents"))
      val sn = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("s_nationkey").as("snat"))
        .distinct()
      val edges = cn.join(sn, col("o_orderkey") === col("l_orderkey"))
        .groupBy("snat", "cnat").agg(sum(col("cents")).as("w"))
        .localCheckpoint(false)
      def normed(raw: DataFrame, key: String, v: String): DataFrame =
        raw.crossJoin(broadcast(raw.agg(max(col(v)).as("mx"))))
          .select(col(key), expr(
            s"CAST((2 * CAST($v AS DECIMAL(38,0)) * 1000000 + mx)" +
              s" div (2 * mx) AS BIGINT)").as(v))
      val h1 = normed(edges.groupBy("snat")
        .agg(sum(expr("CAST(w AS DECIMAL(38,0)) * 1000000")).as("h")), "snat", "h")
      val a1 = normed(edges.join(broadcast(h1), "snat")
        .groupBy("cnat").agg(sum(expr("CAST(w AS DECIMAL(38,0)) * h")).as("a")),
        "cnat", "a")
      val h2 = normed(edges.join(broadcast(a1), "cnat")
        .groupBy("snat").agg(sum(expr("CAST(w AS DECIMAL(38,0)) * a")).as("h")),
        "snat", "h")
      h2.join(a1, col("snat") === col("cnat"), "full_outer")
        .select(coalesce(col("snat"), col("cnat")).cast("long").as("nationkey"),
          coalesce(col("h"), lit(0L)).as("hub_u"),
          coalesce(col("a"), lit(0L)).as("auth_u"))
        .orderBy("nationkey")
    }),

    // price elasticity of demand from the discount-level demand curve:
    // OLS of ln(total quantity) on ln(price factor 1−d) across the 11
    // discrete discount levels — the "how much does a 1% price cut lift
    // volume" readout. Quantized-log micro-nats (q72 convention), the
    // regression over 11 bounded rows in exact integer algebra, slope
    // and R² as integer-scaled divisions (never a final double)
    "q502_price_elasticity" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
        .select(
          expr("CAST(round(ln(1.0D - CAST(dc AS DOUBLE) / 100) * 1000000)" +
            " AS BIGINT)").as("x"),
          expr("CAST(round(ln(CAST(qty AS DOUBLE)) * 1000000) AS BIGINT)")
            .as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
        .select(col("n").as("n_levels"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
            " * 1000000 div (CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)").as("elasticity_micro"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
            " * (CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
            " * 1000000 div ((CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx)" +
            " * (CAST(n AS DECIMAL(38,0)) * syy" +
            " - CAST(sy AS DECIMAL(38,0)) * sy)) AS BIGINT)").as("r2_ppm"))),

    // ANSI-safety census with the try_* family (Spark 4 runs ANSI mode
    // by default — plain div-by-zero and overflow THROW): try_divide's
    // NULL on the zero-discount rows and try_multiply's NULL past the
    // int64 boundary (ep·10¹² overflows exactly when ep > 9 223 372),
    // counted and summed; the oracle replays the same boundaries with
    // explicit CASE guards — proving the nulls land where int64 says
    // they must, not where the engine feels like it
    "q503_try_arithmetic" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(centsOf(col("l_extendedprice")).as("ep"),
          expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(expr("try_divide(ep, dc)"))).as("n_div_by_zero"),
          (count(lit(1)) - count(expr("try_multiply(ep, 1000000000000L)")))
            .as("n_mul_overflow"),
          // Σ(ep·10¹²)/10¹² telescopes back to the exact cents sum of the
          // non-overflowing rows — a long, never a >2⁵³ integer (those
          // lose exactness crossing DuckDB's HUGEINT→float64 bridge)
          expr("CAST(sum(CAST(try_multiply(ep, 1000000000000L) AS DECIMAL(38,0)))" +
            " div 1000000000000 AS BIGINT)").as("sum_safe_cents"),
          sum(when(col("dc") > 0, expr("ep div dc"))).as("sum_ratio"))),

    // interpolated Kneser–Ney bigram smoothing (D = 3/4 kept exact as a
    // ×4 rational): max(c−D,0)/c(v) + λ(v)·P_cont(w), the continuation-
    // probability backoff that beats Stupid Backoff (q432) and
    // Dirichlet (q481) on re-used contexts — each factor quantized to
    // micro BEFORE combining (pinned), top-20 smoothed bigrams. One
    // corpus explode feeds bigram counts; contexts/continuations derive
    // from the bigram-type relation, never a second scan
    "q504_kneser_ney" -> ((s, dir) => {
      val bc = Dedup.shingleRows(
          Tables.documents(s, dir)
            .filter(col("text").isNotNull &&
              size(split(col("text"), " ", -1)) >= 2),
          "doc_id", "text", 2)
        .select(substring_index(col("s"), " ", 1).as("v"),
          substring_index(col("s"), " ", -1).as("w"))
        .groupBy("v", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val cv = bc.groupBy("v").agg(sum(col("c")).as("cv"),
        count(lit(1)).as("nv"))
      val nw = bc.groupBy("w").agg(count(lit(1)).as("nw"))
      bc.join(cv, "v").join(nw, "w")
        .crossJoin(broadcast(bc.agg(count(lit(1)).as("n11"))))
        .select(col("v"), col("w"), col("c").as("c_vw"),
          expr("(4 * c - 3) * 1000000 div (4 * cv)" +
            " + (3 * nv * 1000000 div (4 * cv)) * (nw * 1000000 div n11)" +
            " div 1000000").as("kn_micro"))
        .orderBy(col("kn_micro").desc, col("v"), col("w")).limit(20)
    }),

    // participation ratio (effective rank) of the embedding cloud from
    // per-dimension variances: PR = (Σv)²/Σv² — 64 means "isotropic",
    // ~1 means "one direction owns the cloud" (the global readout behind
    // q191's per-dim variance table and q442's anisotropy). Variances as
    // exact n·Σx²−(Σx)² integers on the 1e-6 grid, rescaled once (div
    // 1e6, pinned) so the squares stay inside decimal38/HUGEINT
    "q505_participation_ratio" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
        .select(col("pos"), round(col("x") * 1000000, 0).cast("long").as("qv"))
        .groupBy("pos")
        .agg(count(lit(1)).as("n"),
          sum(col("qv")).as("sx"),
          sum(expr("CAST(qv AS DECIMAL(38,0)) * qv")).as("sxx"))
        .select(col("n"),
          expr("(CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx) div 1000000").as("vr"))
        .agg(max(col("n")).as("n_vecs"), count(lit(1)).as("dim"),
          sum(col("vr")).as("sv"),
          sum(expr("CAST(vr AS DECIMAL(38,0)) * vr")).as("svv"),
          max(col("vr")).as("v_max_r"), min(col("vr")).as("v_min_r"))
        .select(col("n_vecs"), col("dim"),
          expr("CAST(1000 * CAST(sv AS DECIMAL(38,0)) * sv div svv AS BIGINT)")
            .as("pr_milli"),
          col("v_max_r"), col("v_min_r"))),

    // speculative-execution model per priority "stage": task duration =
    // order dollars, stragglers past the exact P99 order statistic get a
    // speculative copy that finishes at P99 + median — makespan before
    // vs after, the "is speculation worth the duplicate work" readout.
    // Order statistics as row_number ranks tie-broken by key (engine-
    // portable), windows partitioned by the 5 bounded stages
    "q506_speculative_tasks" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("stage"), col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").as("d"))
        .withColumn("rk", row_number().over(Window.partitionBy("stage")
          .orderBy(col("d"), col("o_orderkey"))).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("stage")))
        .localCheckpoint(false)
      val stats = t
        .groupBy("stage")
        .agg(max(col("n")).as("n_tasks"),
          max(when(col("rk") === expr("(99 * n + 99) div 100"), col("d")))
            .as("p99_ms"),
          max(when(col("rk") === expr("(n + 1) div 2"), col("d")))
            .as("median_ms"),
          max(col("d")).as("makespan_ms"))
      t.join(stats, "stage")
        .groupBy("stage")
        .agg(max(col("n_tasks")).as("n_tasks"), max(col("p99_ms")).as("p99_ms"),
          max(col("median_ms")).as("median_ms"),
          max(col("makespan_ms")).as("makespan_ms"),
          max(least(col("d"), col("p99_ms") + col("median_ms")))
            .as("spec_makespan_ms"))
        .withColumn("saving_ppm", expr(
          "(makespan_ms - spec_makespan_ms) * 1000000 div makespan_ms"))
        .orderBy("stage")
    }),

    // ROUGE-1/ROUGE-2 set recall over the q21 near-dup candidate pairs
    // (reference = doc_a): the "HOW similar, in n-gram terms" drill-down
    // the binary candidate flag hides — MinHash says maybe, ROUGE says
    // how much. The corpus never explodes: candidate doc ids semi-gate
    // the unigram/bigram set build, every join an equi-join on bounded
    // pair rows
    "q507_rouge_overlap" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val cand = Dedup.minhashCandidates(d, "doc_id", "text")
        .select("doc_a", "doc_b").localCheckpoint(false)
      val ids = cand.select(col("doc_a").as("doc_id"))
        .unionAll(cand.select(col("doc_b").as("doc_id"))).distinct()
      val base = d.join(ids, Seq("doc_id"), "left_semi")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        .localCheckpoint(false)
      val uni = base.select(col("doc_id"), explode(col("ws")).as("g"))
        .filter(length(col("g")) > 0).distinct().localCheckpoint(false)
      val bi = base.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1)," +
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("g")).distinct().localCheckpoint(false)
      def recall(sets: DataFrame, cnt: String, ppm: String): DataFrame = {
        val na = sets.groupBy("doc_id").agg(count(lit(1)).as("n_ref"))
        cand
          .join(sets.select(col("doc_id").as("doc_a"), col("g")), "doc_a")
          .join(sets.select(col("doc_id"), col("g").as("g2")),
            col("doc_b") === col("doc_id") && col("g") === col("g2"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as(cnt))
          .join(na.select(col("doc_id").as("doc_a"), col("n_ref")), "doc_a")
          .select(col("doc_a"), col("doc_b"), col(cnt),
            expr(s"$cnt * 1000000 div n_ref").as(ppm))
      }
      cand
        .join(recall(uni, "n_uni_common", "r1_ppm"), Seq("doc_a", "doc_b"),
          "left")
        .join(recall(bi, "n_bi_common", "r2_ppm"), Seq("doc_a", "doc_b"),
          "left")
        .select(col("doc_a"), col("doc_b"),
          coalesce(col("n_uni_common"), lit(0L)).as("n_uni_common"),
          coalesce(col("r1_ppm"), lit(0L)).as("r1_ppm"),
          coalesce(col("n_bi_common"), lit(0L)).as("n_bi_common"),
          coalesce(col("r2_ppm"), lit(0L)).as("r2_ppm"))
        .orderBy("doc_a", "doc_b")
    }),

    // Bartlett's variance-homogeneity test across the five priorities —
    // the parametric sharp-nosed sibling of q474's Brown–Forsythe (which
    // stays valid under non-normality; run both, believe Bartlett only
    // when q474 agrees): (N−k)·ln Sp² − Σ(nᵢ−1)·ln Sᵢ², corrected by
    // C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)). Variance ratios exact
    // integer; ONE ln per group (micro-nats) + one for the pooled term;
    // the correction in nano-reciprocals — all engine-portable
    "q508_bartlett_test" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("x"))
        .groupBy("g")
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .select(col("ng"),
          expr("CAST(ng AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx").as("a"),
          expr("CAST(round(ln(CAST(CAST(ng AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)" +
            " / (CAST(ng AS DOUBLE) * (ng - 1))) * 1000000) AS BIGINT)")
            .as("lnv"),
          expr("1000000000 div (ng - 1)").as("recip"))
        .agg(count(lit(1)).as("k_groups"), sum(col("ng")).as("n"),
          sum(expr("(ng - 1) * lnv")).as("sl"),
          // a div ng ≈ (nᵢ−1)Sᵢ² in cents² reaches 6e18 per group at sf0.1 —
          // the 5-group sum overflows long; keep the pooled term in
          // kilo-cents² (pinned, ×1000 restored inside the ln)
          sum(expr("a div ng div 1000")).as("p"),
          sum(col("recip")).as("sr"))
        .select(col("k_groups"), col("n"),
          expr("(n - k_groups) * CAST(round(ln(CAST(p AS DOUBLE) * 1000" +
            " / (n - k_groups)) * 1000000) AS BIGINT) - sl").as("t_micro"),
          expr("1000000000 + (sr - 1000000000 div (n - k_groups))" +
            " div (3 * (k_groups - 1))").as("c_nano"))
        .withColumn("t_adj_micro",
          expr("CAST(CAST(t_micro AS DECIMAL(38,0)) * 1000000000" +
            " div c_nano AS BIGINT)"))),

    // Somers' D and Goodman–Kruskal gamma between order priority (its
    // leading digit is the ordinal) and the price quartile: ordinal
    // association from concordant/discordant pair counts — computed on
    // the 5×4 CONTINGENCY CELLS (a 20×20 bounded pair join), never the
    // N² row pairs; gamma ignores ties, Somers' D charges the
    // y-tied pairs to the denominator (the asymmetric "does priority
    // predict price band" readout)
    "q509_somers_gamma" -> ((s, dir) => {
      val cells = Tables.orders(s, dir)
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("x"),
          centsOf(col("o_totalprice")).as("v"), col("o_orderkey"))
        .withColumn("y", ntile(4).over(
          Window.orderBy(col("v"), col("o_orderkey"))).cast("long"))
        .groupBy("x", "y").agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      cells.select(col("x").as("xa"), col("y").as("ya"), col("n").as("na"))
        .join(cells.select(col("x").as("xb"), col("y").as("yb"),
          col("n").as("nb")), col("xa") < col("xb"))
        .agg(
          sum(when(col("ya") < col("yb"), col("na") * col("nb")).otherwise(0L))
            .as("c_pairs"),
          sum(when(col("ya") > col("yb"), col("na") * col("nb")).otherwise(0L))
            .as("d_pairs"),
          sum(when(col("ya") === col("yb"), col("na") * col("nb")).otherwise(0L))
            .as("t_y"))
        .select(col("c_pairs"), col("d_pairs"), col("t_y"),
          expr("(c_pairs - d_pairs) * 1000000 div (c_pairs + d_pairs)")
            .as("gamma_ppm"),
          expr("(c_pairs - d_pairs) * 1000000 div (c_pairs + d_pairs + t_y)")
            .as("somers_d_ppm"))
    }),

    // Theil's uncertainty coefficient U(lang|source) and U(source|lang):
    // the NORMALIZED asymmetric cousins of q249's mutual information —
    // "what fraction of lang's entropy does knowing source remove".
    // Entropies summed from per-term 1e-9-quantized contributions (q90
    // discipline: one ln per observed cell, partition-order invariant)
    "q510_theils_u" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("lang", "source")
        .localCheckpoint(false)
      val nTot = broadcast(d.agg(count(lit(1)).as("nt")))
      def ent(cols: Column*): DataFrame =
        d.groupBy(cols: _*).agg(count(lit(1)).as("c"))
          .crossJoin(nTot)
          .select(expr("CAST(round(-(CAST(c AS DOUBLE)/nt)" +
            " * ln(CAST(c AS DOUBLE)/nt) * 1e9) AS BIGINT)").as("t9"))
          .agg(sum(col("t9")).as("h"))
      ent(col("lang")).select(col("h").as("h_lang_nano"))
        .crossJoin(broadcast(ent(col("source")).select(col("h").as("h_source_nano"))))
        .crossJoin(broadcast(ent(col("lang"), col("source"))
          .select(col("h").as("h_joint_nano"))))
        .select(col("h_lang_nano"), col("h_source_nano"), col("h_joint_nano"),
          expr("(h_lang_nano + h_source_nano - h_joint_nano) * 1000000" +
            " div h_lang_nano").as("u_lang_given_source_ppm"),
          expr("(h_lang_nano + h_source_nano - h_joint_nano) * 1000000" +
            " div h_source_nano").as("u_source_given_lang_ppm"))
    }),

    // Gram–Schmidt orthogonalization of vector 1 against vector 0 in
    // exact quantized arithmetic: projection coefficient ⟨v1,v0⟩/⟨v0,v0⟩
    // in micro, residual components on the 1e-12 grid — the readout
    // proves ⟨r,v0⟩ collapses to rounding noise (|·| ≤ ‖v0‖₁/2 from the
    // coefficient truncation alone) without a single double. The 2-vector
    // primitive behind QR/whitening; everything joins on the 64 dims
    "q511_gram_schmidt" -> ((s, dir) => {
      val q = Tables.embeddings(s, dir).filter(col("vec_id") <= 1)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
      val v0 = q.filter(col("vec_id") === 0)
        .select(col("pos"), col("qv").as("q0"))
      val v1 = q.filter(col("vec_id") === 1)
        .select(col("pos"), col("qv").as("q1"))
      val dots = v0.join(v1, "pos")
        .agg(sum(expr("CAST(q1 AS DECIMAL(38,0)) * q0")).as("dot01"),
          sum(expr("CAST(q0 AS DECIMAL(38,0)) * q0")).as("n0"),
          sum(expr("CAST(q1 AS DECIMAL(38,0)) * q1")).as("n1"))
        .withColumn("c_micro", expr("dot01 * 1000000 div n0"))
      v0.join(v1, "pos").crossJoin(broadcast(dots))
        .select(col("dot01"), col("n0"), col("n1"), col("c_micro"),
          expr("q1 * 1000000 - c_micro * q0").as("r"), col("q0"))
        .groupBy("dot01", "n0", "n1", "c_micro")
        .agg(
          sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("rn2"),
          sum(expr("CAST(r AS DECIMAL(38,0)) * q0")).as("rdot0"))
        .select(col("dot01").cast("long").as("dot01_q"),
          col("n0").cast("long").as("norm0_q"),
          col("n1").cast("long").as("norm1_q"), col("c_micro"),
          expr("CAST(rn2 div 1000000000000 AS BIGINT)").as("resid_norm2_q"),
          expr("CAST(rdot0 div 1000000 AS BIGINT)").as("resid_dot0_micro"),
          expr("CAST(CASE WHEN dot01 >= 0 THEN dot01 * dot01 * 1000000" +
            " div (n0 * n1) ELSE -(dot01 * dot01 * 1000000 div (n0 * n1))" +
            " END AS BIGINT)").as("cos2_signed_ppm"))
    }),

    // Mood's median test across the five priorities: does any priority's
    // price distribution sit above/below the GLOBAL median more than its
    // share — the coarsest, most outlier-proof of the k-group location
    // tests (q494 ranks everything; this only asks "above or not"). The
    // median is the exact (N+1)/2 order statistic from the value-grouped
    // cumulative relation (q289 discipline); χ² via the zero-cell-free
    // O²/E identity (q290 discipline)
    "q512_moods_median" -> ((s, dir) => {
      val j = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val med = j.groupBy("v").agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .crossJoin(broadcast(j.agg(count(lit(1)).as("n"))))
        .filter(col("cb") < expr("(n + 1) div 2") &&
          expr("cb + cnt") >= expr("(n + 1) div 2"))
        .select(col("v").as("med"), col("n"))
      val cells = j.crossJoin(broadcast(med))
        .select(col("g"), (col("v") > col("med")).cast("long").as("above"),
          col("med"), col("n"))
        .groupBy("g", "above", "med", "n").agg(count(lit(1)).as("o"))
        .localCheckpoint(false)
      val ng = cells.groupBy("g").agg(sum(col("o")).as("n_g"))
      val ca = cells.groupBy("above").agg(sum(col("o")).as("n_a"))
      cells.join(broadcast(ng), "g").join(broadcast(ca), "above")
        .select(col("med"), col("n"),
          expr("CAST(round(CAST(o AS DOUBLE) * o / (CAST(n_g AS DOUBLE) * n_a)" +
            " * 1000000000) AS BIGINT)").as("t9"))
        .groupBy("med", "n").agg(sum(col("t9")).as("s9"))
        .select(col("n").as("n_orders"), col("med").as("median_cents"),
          expr("n * (s9 - 1000000000)").as("chi2_nano"))
    }),

    // Lo–MacKinlay variance-ratio test on daily revenue: VR(q) =
    // Var(q-day change)/(q·Var(1-day change)) — 1 under a random walk,
    // >1 under momentum, <1 under mean reversion. Exact integer variance
    // numerators on the bounded per-day relation (one window pass
    // supplies all three lags), ratio as one decimal division per q
    "q513_variance_ratio" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(centsOf(col("o_totalprice"))).as("r"))
      val w = Window.orderBy("d")
      val diffs = day
        .select(col("d"), col("r"),
          (col("r") - lag(col("r"), 1).over(w)).as("d1"),
          (col("r") - lag(col("r"), 2).over(w)).as("d2"),
          (col("r") - lag(col("r"), 4).over(w)).as("d4"),
          (col("r") - lag(col("r"), 8).over(w)).as("d8"))
        .localCheckpoint(false)
      val base = broadcast(diffs.filter(col("d1").isNotNull)
        .agg(count(lit(1)).as("n1"), sum(col("d1")).as("s1"),
          sum(expr("CAST(d1 AS DECIMAL(38,0)) * d1")).as("ss1")))
      def vr(qq: Int): DataFrame = diffs.filter(col(s"d$qq").isNotNull)
        .agg(count(lit(1)).as("nq"), sum(col(s"d$qq")).as("sq"),
          sum(expr(s"CAST(d$qq AS DECIMAL(38,0)) * d$qq")).as("ssq"))
        .crossJoin(base)
        .select(lit(qq.toLong).as("q"), col("nq").as("n_diffs"),
          expr(s"CAST((CAST(nq AS DECIMAL(38,0)) * ssq" +
            s" - CAST(sq AS DECIMAL(38,0)) * sq)" +
            s" * n1 * n1 * 1000000" +
            s" div ($qq * (CAST(n1 AS DECIMAL(38,0)) * ss1" +
            s" - CAST(s1 AS DECIMAL(38,0)) * s1)" +
            s" * nq * nq) AS BIGINT)").as("vr_ppm"))
      vr(2).unionAll(vr(4)).unionAll(vr(8)).orderBy("q")
    }),

    // ε-differential-privacy Laplace mechanism on per-source counts,
    // deterministically replayed: uniform u from the 48-bit md5 grid,
    // noise = −(1/ε)·sgn(u−½)·ln(1−2|u−½|) in exact micro-nat algebra
    // (the inverse-CDF identity; one ln per cell, zero-argument guarded),
    // swept over ε ∈ {0.1, 1, 10} — the "how much utility does each
    // privacy budget cost" readout completing the q219/q281/q421
    // anonymity suite
    "q514_dp_noise" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(Seq(100L, 1000L, 10000L).toDF("eps_milli")))
        .withColumn("u48", Dedup.md5Long(concat(lit("dp#"), col("source"),
          lit("#"), col("eps_milli")), 12))
        .withColumn("lnm", expr(
          "CAST(round(ln(CAST(greatest(281474976710656 - abs(2 * u48" +
            " - 281474976710656), 1) AS DOUBLE) / 281474976710656e0)" +
            " * 1000000) AS BIGINT)"))
        .withColumn("noise_milli", expr(
          "-(CASE WHEN u48 >= 140737488355328 THEN 1 ELSE -1 END)" +
            " * lnm div eps_milli"))
        .select(col("source"), col("eps_milli"), col("n"), col("noise_milli"),
          expr("n * 1000 + noise_milli").as("noisy_milli"),
          abs(col("noise_milli")).as("abs_err_milli"))
        .orderBy("source", "eps_milli")
    }),

    // Burrows' Delta stylometry between sources: z-scores of the top-20
    // corpus words' per-source frequencies (ppm), Δ(a,b) = mean |z_a−z_b|
    // — the authorship-attribution distance; close pairs are "same
    // boilerplate generator" candidates BEFORE any doc-level dedup
    // fires. The zero cells materialize (a source MISSING a common word
    // is signal); z via the cross-multiplied integer form with an exact
    // isqrt, every relation bounded by sources × 20 words
    "q515_burrows_delta" -> ((s, dir) => {
      val wc = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val ns = wc.groupBy("source").agg(sum(col("c")).as("ntok"))
      val top = wc.groupBy("w").agg(sum(col("c")).as("ct"))
        .orderBy(col("ct").desc, col("w")).limit(20).select("w")
      val grid = ns.crossJoin(broadcast(top))
        .join(wc, Seq("source", "w"), "left")
        .select(col("source"), col("w"),
          expr("coalesce(c, 0) * 1000000 div ntok").as("f"))
        .localCheckpoint(false)
      val st = grid.groupBy("w")
        .agg(count(lit(1)).as("sct"), sum(col("f")).as("sf"),
          sum(expr("f * f")).as("sff"))
        .withColumn("vn", expr("sct * sff - sf * sf"))
        .withColumn("t0", floor(sqrt(col("vn").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + vn div t0) div 2 ELSE 0 END"))
        .withColumn("sd", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= vn THEN t1 + 1" +
            " WHEN t1 * t1 > vn THEN t1 - 1 ELSE t1 END"))
      val z = grid.join(broadcast(st.select("w", "sct", "sf", "sd")), "w")
        .select(col("source"), col("w"),
          expr("CASE WHEN sd > 0 THEN (sct * f - sf) * 1000 div sd" +
            " ELSE 0 END").as("z_milli"))
      z.select(col("source").as("source_a"), col("w"), col("z_milli").as("za"))
        .join(z.select(col("source").as("source_b"), col("w"),
          col("z_milli").as("zb")), "w")
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(sum(abs(col("za") - col("zb"))).as("sabs"))
        .select(col("source_a"), col("source_b"),
          expr("sabs div 20").as("delta_milli"))
        .orderBy(col("delta_milli"), col("source_a"), col("source_b"))
        .limit(5)
    }),

    // UMass topic coherence of each source's top-5 terms: Σ_{i<j}
    // ln((D(wᵢ,wⱼ)+1)/D(wⱼ)) over rank-ordered pairs — the standard "is
    // this word cluster actually a topic" score (near 0 = the terms
    // co-occur; very negative = the "topic" is an artifact). Doc
    // co-occurrence counted only for the ≤|vocab| top words (semi-gated
    // distinct postings), pairs bounded at 10 per source
    "q516_topic_coherence" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val topw = docs.groupBy("source", "w").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(Window.partitionBy("source")
          .orderBy(col("c").desc, col("w"))).cast("long"))
        .filter(col("rk") <= 5).select("source", "w", "rk")
        .localCheckpoint(false)
      val dwt = docs.select("doc_id", "w").distinct()
        .join(topw.select("w").distinct(), Seq("w"), "left_semi")
        .localCheckpoint(false)
      val df = dwt.groupBy("w").agg(count(lit(1)).as("dfw"))
      val co = dwt.select(col("doc_id"), col("w").as("wa"))
        .join(dwt.select(col("doc_id"), col("w").as("wb")), "doc_id")
        .filter(col("wa") =!= col("wb"))
        .groupBy("wa", "wb").agg(count(lit(1)).as("cod"))
      topw.select(col("source"), col("w").as("wa"), col("rk").as("ra"))
        .join(topw.select(col("source"), col("w").as("wb"), col("rk").as("rb")),
          "source")
        .filter(col("ra") < col("rb"))
        .join(co, Seq("wa", "wb"), "left")
        .join(broadcast(df.select(col("w").as("wb"), col("dfw"))), "wb")
        .select(col("source"),
          expr("CAST(round(ln(CAST(coalesce(cod, 0) + 1 AS DOUBLE) / dfw)" +
            " * 1000000) AS BIGINT)").as("t6"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_pairs"), sum(col("t6")).as("coherence_micro"))
        .orderBy("source")
    }),

    // Grubbs' max-normed-residual outlier test on customer balances:
    // G = max|x−x̄|/s — "is the single most extreme balance more extreme
    // than n draws should produce" (the per-point verdict q85's MAD
    // flags and q238's ensemble only rank). Cross-multiplied integer
    // form: G² in milli² as one decimal division, G via the isqrt
    // discipline; the argmax row is a TakeOrdered, never a sort
    "q517_grubbs_test" -> ((s, dir) => {
      val x = Tables.customer(s, dir)
        .select(col("c_custkey"), centsOf(col("c_acctbal")).as("x"))
        .localCheckpoint(false)
      val stats = x.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      val out = x.crossJoin(broadcast(stats))
        .select(col("c_custkey"), col("x"), col("n"), col("sx"), col("sxx"),
          abs(expr("n * x - sx")).as("num"))
        .orderBy(col("num").desc, col("c_custkey")).limit(1)
      out.select(col("n").as("n_customers"),
          col("c_custkey").as("outlier_custkey"), col("x").as("outlier_cents"),
          expr("CAST(num AS DECIMAL(38,0)) * num * 1000000 * (n - 1)" +
            " div (CAST(n AS DECIMAL(38,0))" +
            " * (CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx))").as("g2"))
        .withColumn("t0", floor(sqrt(col("g2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + g2 div t0) div 2 ELSE 0 END"))
        .withColumn("g_milli", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= g2 THEN t1 + 1" +
            " WHEN t1 * t1 > g2 THEN t1 - 1 ELSE t1 END"))
        .select("n_customers", "outlier_custkey", "outlier_cents", "g_milli")
    }),

    // two-sample log-rank test (AUTOMOBILE vs HOUSEHOLD customer
    // "lifetimes" = first-to-last-order spans): at each distinct event
    // time, observed group-1 deaths vs the risk-set expectation
    // d·n₁/n, hypergeometric variance summed the same way — THE
    // survival-curve comparison test behind q284's single-group KM
    // curve. Risk sets as reverse-cumulative windows on the bounded
    // distinct-time relation; E and V quantized to micro before summing
    "q518_logrank_test" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(col("c_custkey"),
          (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("g1"))
      val life = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey", "g1")
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate"))).as("t"))
      val et = life.groupBy("t")
        .agg(sum(col("g1")).as("d1"), count(lit(1)).as("d"))
        .localCheckpoint(false)
      val after = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val risk = et
        .withColumn("n1t", sum(col("d1")).over(after))
        .withColumn("nt", sum(col("d")).over(after))
      risk
        .select(col("d1"), col("d"), col("n1t"), col("nt"),
          expr("d * n1t * 1000000 div nt").as("e1_micro"),
          expr("CASE WHEN nt > 1 THEN CAST(d AS DECIMAL(38,0)) * n1t" +
            " * (nt - n1t) * (nt - d) * 1000000" +
            " div (CAST(nt AS DECIMAL(38,0)) * nt * (nt - 1))" +
            " ELSE 0 END").as("v_micro"))
        .agg(sum(col("d1")).as("o1"), sum(expr("d - d1")).as("o2"),
          sum(col("e1_micro")).as("e1_micro_total"),
          sum(col("v_micro")).as("v_micro_total"))
        .select(col("o1"), col("o2"), col("e1_micro_total"),
          col("v_micro_total"),
          expr("CAST((CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_micro_total)" +
            " * (CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_micro_total)" +
            " div (v_micro_total * 1000000) AS BIGINT)").as("chi2_micro"))
    }),

    // Jonckheere–Terpstra ordered-alternative test: do prices trend
    // MONOTONICALLY with the priority ordinal (1-URGENT … 5-LOW) — the
    // sharper cousin of q494's any-difference H when the alternative is
    // ordered. 2·JT = Σ_{g<h} Σ_v n_hv·(2·cb_g(v) + n_gv) computed in
    // ONE window pass over the distinct-value relation with the five
    // priority counts as pinned columns; normalized against the exact
    // pair total (500000 ppm ≡ no trend)
    "q519_jonckheere" -> ((s, dir) => {
      val vg = Tables.orders(s, dir)
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
          centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
          (2 to 5).map(g =>
            sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n$g")): _*)
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val cum = vg.select(col("v") +: (1 to 5).flatMap(g => Seq(
        col(s"n$g"),
        coalesce(sum(col(s"n$g")).over(before), lit(0L)).as(s"cb$g"))): _*)
      val pairTerms = (for (g <- 1 to 4; h <- (g + 1) to 5)
        yield s"n$h * (2 * cb$g + n$g)").mkString(" + ")
      cum.agg(sum(expr(pairTerms)).as("jt2"),
          (1 to 5).map(g => sum(col(s"n$g")).as(s"t$g")): _*)
        .select(col("jt2"),
          expr((for (g <- 1 to 4; h <- (g + 1) to 5)
            yield s"t$g * t$h").mkString("(", " + ", ") * 2")).as("jt2_max"))
        .select(col("jt2"), col("jt2_max"),
          expr("jt2 * 1000000 div jt2_max").as("jt_ppm"))
    }),

    // temperature-flattened mixture sweep: source sampling shares
    // ∝ (n_s/N)^(1/T) for T ∈ {1, 2, 4} — the "how much does each
    // temperature actually flatten the mix" readout behind q68's single-
    // temperature resampler and q99's weights. One ln + one exp per
    // (source, T), both quantized at the call (micro-nat convention);
    // the effective-source-count is the integer participation ratio of
    // the quantized weights — no further libm calls
    "q520_temperature_sweep" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("ns"))
        .crossJoin(broadcast(Tables.documents(s, dir)
          .agg(count(lit(1)).as("nt"))))
        .crossJoin(broadcast(Seq(1L, 2L, 4L).toDF("t")))
        .select(col("t"),
          expr("CAST(round(exp(CAST(CAST(round(ln(CAST(ns AS DOUBLE) / nt)" +
            " * 1000000) AS BIGINT) div t AS DOUBLE) / 1000000) * 1000000)" +
            " AS BIGINT)").as("w"))
        .groupBy("t")
        .agg(count(lit(1)).as("n_sources"), sum(col("w")).as("sw"),
          sum(expr("w * w")).as("sww"), max(col("w")).as("wmax"))
        .select(col("t"), col("n_sources"),
          expr("1000 * CAST(sw AS DECIMAL(38,0)) * sw div sww")
            .as("n_eff_milli"),
          expr("wmax * 1000000 div sw").as("top_share_ppm"))
        .orderBy("t")
    }),

    // Friedman test + Kendall's W across the five priorities, blocked by
    // month: within every month the priorities are RANKED by revenue
    // (blocking removes the month-to-month level shifts q448's raw ANOVA
    // absorbs into noise), χ²_F from the rank sums, W = χ²/(n(k−1)) the
    // agreement strength. The month×priority grid zero-fills absent
    // cells (pinned); ranks are per-block row_numbers tie-broken by the
    // priority ordinal
    "q521_friedman_w" -> ((s, dir) => {
      import s.implicits._
      val mp = Tables.orders(s, dir)
        .select(expr("date_trunc('month', o_orderdate)").as("m"),
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
          centsOf(col("o_totalprice")).as("c"))
        .groupBy("m", "g").agg(sum(col("c")).as("rev"))
      val grid = mp.select("m").distinct()
        .crossJoin(broadcast((1L to 5L).toDF("g")))
        .join(mp, Seq("m", "g"), "left")
        .select(col("m"), col("g"), coalesce(col("rev"), lit(0L)).as("rev"))
      val rk = grid.withColumn("r", row_number().over(Window.partitionBy("m")
        .orderBy(col("rev").desc, col("g"))).cast("long"))
      rk.groupBy("g").agg(sum(col("r")).as("rg"),
          count(lit(1)).as("n"))
        .agg(max(col("n")).as("n_blocks"),
          sum(expr("rg * rg")).as("srr"))
        .select(col("n_blocks"),
          expr("12 * srr * 1000000 div (n_blocks * 5 * 6)" +
            " - 3 * n_blocks * 6 * 1000000").as("chi2_micro"))
        .withColumn("w_ppm", expr("chi2_micro div (n_blocks * 4)"))
    }),

    // upper-tail dependence λ_U(q) = P(quantity exceeds its q-quantile |
    // price exceeds its q-quantile) at q ∈ {0.90, 0.95, 0.99} — do the
    // two order dimensions go extreme TOGETHER (λ→share of exceeders)
    // or independently (λ→1−q)? Pure rank arithmetic: both margins
    // ranked once, exceedance = rank > ⌊N·q⌋, no quantile VALUES ever
    // extracted — the copula-style readout q54's global corr can't see
    "q522_tail_dependence" -> ((s, dir) => {
      import s.implicits._
      val qty = Tables.lineitem(s, dir).groupBy("l_orderkey")
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("y"))
      val xy = Tables.orders(s, dir)
        .join(qty, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey").as("k"), centsOf(col("o_totalprice")).as("x"),
          col("y"))
        .withColumn("rx", row_number().over(
          Window.orderBy(col("x"), col("k"))).cast("long"))
        .withColumn("ry", row_number().over(
          Window.orderBy(col("y"), col("k"))).cast("long"))
        .crossJoin(broadcast(Seq(900L, 950L, 990L).toDF("q_mille")))
        .localCheckpoint(false)
      xy.withColumn("n", count(lit(1)).over(
          Window.partitionBy("q_mille")))
        .withColumn("kq", expr("n * q_mille div 1000"))
        .groupBy("q_mille")
        .agg(max(col("n")).as("n_orders"),
          sum(when(col("rx") > col("kq"), 1L).otherwise(0L)).as("n_exceed_x"),
          sum(when(col("rx") > col("kq") && col("ry") > col("kq"), 1L)
            .otherwise(0L)).as("n_joint"))
        .withColumn("lambda_ppm",
          expr("n_joint * 1000000 div n_exceed_x"))
        .orderBy("q_mille")
    }),

    // linearly-weighted Cohen's kappa between the two automated quality
    // "raters" (n_chars quintile vs word-count quintile): off-by-one
    // disagreements cost 1/4, opposite-corner ones cost 1 — the ordinal
    // agreement q420's unweighted kappa throws away. κ_w = 1 −
    // N·Σw·O / Σᵢⱼ w·rᵢ·cⱼ in exact integers on the bounded 5×5
    // confusion + margins
    "q523_weighted_kappa" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          size(filter(split(col("text"), " ", -1), x => length(x) > 0))
            .cast("long").as("nw"))
        .withColumn("ra", ntile(5).over(
          Window.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
        .withColumn("rb", ntile(5).over(
          Window.orderBy(col("nw"), col("doc_id"))).cast("long"))
        .localCheckpoint(false)
      val conf = base.groupBy("ra", "rb").agg(count(lit(1)).as("o"))
      val num = conf.agg(sum(expr("abs(ra - rb) * o")).as("wo"),
        sum(col("o")).as("n"))
      val ri = base.groupBy("ra").agg(count(lit(1)).as("r_i"))
      val cj = base.groupBy("rb").agg(count(lit(1)).as("c_j"))
      val den = ri.crossJoin(broadcast(cj))
        .agg(sum(expr("abs(ra - rb) * r_i * c_j")).as("wrc"))
      num.crossJoin(broadcast(den))
        .select(col("n").as("n_docs"), col("wo").as("weighted_disagreement"),
          expr("1000000 - CAST(n AS DECIMAL(38,0)) * wo * 1000000 div wrc")
            .as("kappa_w_ppm"))
    }),

    // Wilcoxon signed-rank test on paired 1997→1998 customer revenue —
    // q492's sign test upgraded with magnitude ranks (same pairs, more
    // power): |d| ranked via the value-grouped doubled-rank identity,
    // W⁺ from the positive-sign counts per tied block, tie-corrected
    // variance, z via the isqrt discipline on the cross-multiplied form
    // 3·num²/var48 — every step exact integers
    "q524_wilcoxon_signed_rank" -> ((s, dir) => {
      val per = Tables.orders(s, dir)
        .filter(expr("year(o_orderdate) IN (1997, 1998)"))
        .groupBy("o_custkey")
        .agg(sum(when(expr("year(o_orderdate) = 1997"),
          centsOf(col("o_totalprice"))).otherwise(0L)).as("r97"),
          sum(when(expr("year(o_orderdate) = 1998"),
            centsOf(col("o_totalprice"))).otherwise(0L)).as("r98"))
        .filter(col("r97") > 0 && col("r98") > 0 && col("r97") =!= col("r98"))
        .select((col("r98") - col("r97")).as("d"))
      val before = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, -1)
      per.select(abs(col("d")).as("a"), (col("d") > 0).cast("long").as("p"))
        .groupBy("a")
        .agg(count(lit(1)).as("cnt"), sum(col("p")).as("pos"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .agg(sum(expr("pos * (2 * cb + cnt + 1)")).as("w2"),
          sum(col("cnt")).as("n"),
          sum(expr("cnt * cnt * cnt - cnt")).as("ties"))
        .select(col("n").as("n_pairs"), col("w2").as("w2_plus"),
          expr("2 * w2 - n * (n + 1)").as("num4"),
          expr("2 * CAST(n AS DECIMAL(38,0)) * (n + 1) * (2 * n + 1) - ties")
            .as("var48"))
        .withColumn("z2", expr(
          "3 * CAST(num4 AS DECIMAL(38,0)) * num4 * 1000000 div var48"))
        .withColumn("t0", floor(sqrt(col("z2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + z2 div t0) div 2 ELSE 0 END"))
        .select(col("n_pairs"), col("w2_plus"),
          expr("(CASE WHEN num4 >= 0 THEN 1 ELSE -1 END)" +
            " * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2 THEN t1 + 1" +
            " WHEN t1 * t1 > z2 THEN t1 - 1 ELSE t1 END)").as("z_milli"))
    }),

    // Page's L trend test on the q521 month-blocked priority ranks: is
    // revenue rank MONOTONE in the priority ordinal across blocks (the
    // ordered alternative Friedman's any-difference χ² dilutes)? For
    // k=5 the variance collapses to exactly 25n, so z = (L−45n)/(5√n)
    // — integer algebra + one isqrt on n·10⁶
    "q525_page_trend" -> ((s, dir) => {
      import s.implicits._
      val mp = Tables.orders(s, dir)
        .select(expr("date_trunc('month', o_orderdate)").as("m"),
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
          centsOf(col("o_totalprice")).as("c"))
        .groupBy("m", "g").agg(sum(col("c")).as("rev"))
      val rk = mp.select("m").distinct()
        .crossJoin(broadcast((1L to 5L).toDF("g")))
        .join(mp, Seq("m", "g"), "left")
        .select(col("m"), col("g"), coalesce(col("rev"), lit(0L)).as("rev"))
        .withColumn("r", row_number().over(Window.partitionBy("m")
          .orderBy(col("rev").desc, col("g"))).cast("long"))
      rk.groupBy("g").agg(sum(col("r")).as("rg"), count(lit(1)).as("n"))
        .agg(max(col("n")).as("n_blocks"), sum(expr("g * rg")).as("l_stat"))
        .withColumn("nq", expr("n_blocks * 1000000"))
        .withColumn("t0", floor(sqrt(col("nq").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + nq div t0) div 2 ELSE 0 END"))
        .withColumn("rtn", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= nq THEN t1 + 1" +
            " WHEN t1 * t1 > nq THEN t1 - 1 ELSE t1 END"))
        .select(col("n_blocks"), col("l_stat"),
          expr("(l_stat - 45 * n_blocks) * 1000000 div (5 * rtn)")
            .as("z_milli"))
    }),

    // Cochran–Armitage trend-in-proportions: does the RETURN RATE trend
    // monotonically with priority (scores 1..5) — the binary-outcome
    // sibling of q519's rank trend, sharper than q119-style independence
    // when the alternative is ordered. Exact integer cross-multiplied
    // z², one isqrt; the per-order return flag is one max() over the
    // lineitem join, aggregated once
    "q526_cochran_armitage" -> ((s, dir) => {
      val ret = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("rf"))
      val g = Tables.orders(s, dir)
        .join(ret, col("o_orderkey") === col("l_orderkey"))
        .groupBy(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("w"))
        .agg(count(lit(1)).as("ng"), sum(col("rf")).as("rg"))
      g.agg(sum(col("ng")).as("n"), sum(col("rg")).as("r"),
          sum(expr("w * rg")).as("swr"), sum(expr("w * ng")).as("swn"),
          sum(expr("w * w * ng")).as("swwn"))
        .select(col("n").as("n_orders"), col("r").as("n_returned"),
          expr("CAST(n AS DECIMAL(38,0)) * swr - CAST(r AS DECIMAL(38,0)) * swn")
            .as("tnum"),
          expr("CAST(r AS DECIMAL(38,0)) * (n - r)" +
            " * (CAST(n AS DECIMAL(38,0)) * swwn" +
            " - CAST(swn AS DECIMAL(38,0)) * swn)").as("tden"))
        .withColumn("z2", expr(
          "CAST(tnum AS DECIMAL(38,0)) * tnum * n_orders * 1000000 div tden"))
        .withColumn("t0", floor(sqrt(col("z2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + z2 div t0) div 2 ELSE 0 END"))
        .select(col("n_orders"), col("n_returned"),
          expr("(CASE WHEN tnum >= 0 THEN 1 ELSE -1 END)" +
            " * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2 THEN t1 + 1" +
            " WHEN t1 * t1 > z2 THEN t1 - 1 ELSE t1 END)").as("z_milli"))
    }),

    // Jarque–Bera normality test on order prices: skewness + excess
    // kurtosis from the EXACT central-moment identities (M2/M3/M4 as
    // pure integer polynomials in the power sums — prices rescaled to
    // hundreds-of-dollars so n³·Σx⁴ stays inside decimal38), the two shape
    // stats quantized to milli through one sqrt-only double formula
    // each, and JB reassembled from the quantized pair in integers
    "q527_jarque_bera" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT) div 10000")
          .as("x"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).as("s3"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).as("s4"))
        .select(col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * s2" +
            " - CAST(s1 AS DECIMAL(38,0)) * s1").as("m2"),
          expr("CAST(n AS DECIMAL(38,0)) * n * s3" +
            " - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2" +
            " + 2 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1").as("m3"),
          expr("CAST(n AS DECIMAL(38,0)) * n * n * s4" +
            " - 4 * CAST(n AS DECIMAL(38,0)) * n * s1 * s3" +
            " + 6 * CAST(n AS DECIMAL(38,0)) * s1 * s1 * s2" +
            " - 3 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1 * s1").as("m4"))
        .select(col("n").as("n_orders"),
          expr("CAST(round(CAST(m3 AS DOUBLE)" +
            " / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))) * 1000)" +
            " AS BIGINT)").as("skew_milli"),
          expr("CAST(round((CAST(m4 AS DOUBLE)" +
            " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3) * 1000)" +
            " AS BIGINT)").as("kurt_excess_milli"))
        .withColumn("jb_milli", expr(
          "(4 * n_orders * skew_milli * skew_milli" +
            " + n_orders * kurt_excess_milli * kurt_excess_milli)" +
            " div 24000"))),

    // best-of-n selection value: the expected MAX quality (n_chars) of
    // n md5-uniform draws, n ∈ {1,2,4,8} — how much quality does each
    // doubling of the candidate pool buy (the data-curation twin of
    // RLHF's best-of-n readout). CLOSED FORM from the empirical CDF:
    // E[max] = Σ_q q·(F_qⁿ − F_{q−}ⁿ)/Nⁿ — exact integer powers on the
    // bounded distinct-quality relation, no sampling at all
    "q528_best_of_n" -> ((s, dir) => {
      val before = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("n_chars").as("q"))
        .groupBy("q").agg(count(lit(1)).as("cnt"))
        .withColumn("fp", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .withColumn("f", expr("fp + cnt"))
        .agg(max(col("f")).as("nn"),
          sum(expr("q * cnt")).as("e1n"),
          sum(expr("q * (CAST(f AS DECIMAL(38,0)) * f" +
            " - CAST(fp AS DECIMAL(38,0)) * fp)")).as("e2n"),
          sum(expr("q * (CAST(f AS DECIMAL(38,0)) * f * f * f" +
            " - CAST(fp AS DECIMAL(38,0)) * fp * fp * fp)")).as("e4n"),
          sum(expr("q * (CAST(f AS DECIMAL(38,0)) * f * f * f * f * f * f * f" +
            " - CAST(fp AS DECIMAL(38,0)) * fp * fp * fp * fp * fp * fp * fp)"))
            .as("e8n"))
        .selectExpr(
          "stack(4," +
            " 1L, CAST(1000 * CAST(e1n AS DECIMAL(38,0)) div nn AS BIGINT)," +
            " 2L, CAST(1000 * e2n div (CAST(nn AS DECIMAL(38,0)) * nn) AS BIGINT)," +
            " 4L, CAST(1000 * e4n div (CAST(nn AS DECIMAL(38,0)) * nn * nn * nn)" +
            " AS BIGINT)," +
            " 8L, CAST(1000 * e8n div (CAST(nn AS DECIMAL(38,0)) * nn * nn * nn" +
            " * nn * nn * nn * nn) AS BIGINT)) AS (n_draws, e_max_milli)")
        .orderBy("n_draws")
    }),

    // exact M/D/1-style queueing delay per event type WITHOUT a
    // sequential scan: Lindley's recursion W_i = max(0, W_{i−1}+s−gap)
    // unrolls to W_i = max(0, c_i − min_{j<i} c_j) with c_j = j·s − t_j
    // — ONE running-min window computes every event's queueing delay.
    // Service time s is pinned at 80% of the type's mean interarrival
    // (utilization 0.8), so the readout is "how bursty is this stream
    // relative to its own rate" — all exact integer microseconds
    "q529_queueing_delay" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("i", row_number().over(w).cast("long"))
      val svc = e.groupBy("event_type")
        .agg(expr("((max(us) - min(us)) * 4 div 5) div count(1)").as("svc"))
      val runMin = Window.partitionBy("event_type").orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.join(broadcast(svc), "event_type")
        .withColumn("c", expr("i * svc - us"))
        .withColumn("cmin", min(col("c")).over(runMin))
        .withColumn("wdelay", greatest(lit(0L),
          expr("c - coalesce(cmin, c)")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), max(col("svc")).as("svc_us"),
          expr("sum(wdelay) div count(1)").as("mean_delay_us"),
          max(col("wdelay")).as("max_delay_us"),
          expr("sum(CASE WHEN wdelay > 0 THEN 1 ELSE 0 END) * 1000000" +
            " div count(1)").as("wait_share_ppm"))
        .orderBy("event_type")
    }),

    // optimizer-stats quality audit: 16-bucket equi-WIDTH vs equi-DEPTH
    // histograms on order price, scored by their range-cardinality
    // estimates against the exact counts on five pinned ranges — the
    // "which histogram should the planner keep" readout behind q345's
    // construction. Uniform-within-bucket interpolation pinned as
    // integer division; every relation after the scan is ≤ 16 rows
    "q530_histogram_error" -> ((s, dir) => {
      import s.implicits._
      val x = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), centsOf(col("o_totalprice")).as("x"))
        .localCheckpoint(false)
      val mm = broadcast(x.agg(min(col("x")).as("mn"),
        (max(col("x")) - min(col("x")) + 1).as("span"), count(lit(1)).as("n")))
      val ranges = broadcast(Seq((10L, 35L), (20L, 60L), (50L, 55L),
        (80L, 99L), (0L, 50L)).toDF("a", "b"))
      val xr = x.crossJoin(mm)
        .select(col("x"), col("mn"), col("span"), col("n"),
          expr("(x - mn) * 16 div span").as("wb"),
          row_number().over(Window.orderBy(col("x"), col("k"))).cast("long")
            .as("rk"))
        .withColumn("db", expr("(rk - 1) * 16 div n"))
        .localCheckpoint(false)
      val exact = xr.crossJoin(ranges)
        .groupBy("a", "b")
        .agg(sum(when(col("x") >= expr("mn + span * a div 100") &&
          col("x") < expr("mn + span * b div 100"), 1L).otherwise(0L))
          .as("n_exact"))
      val wbuck = xr.groupBy("wb", "mn", "span").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"), expr("mn + span * wb div 16").as("lo"),
          expr("mn + span * (wb + 1) div 16").as("hi"))
      val dbuck = xr.groupBy("db").agg(count(lit(1)).as("cnt"),
        min(col("x")).as("lo"), (max(col("x")) + 1).as("hi"))
      def est(buck: DataFrame, name: String): DataFrame = buck
        .crossJoin(ranges).crossJoin(mm)
        .select(col("a"), col("b"), col("cnt"), col("lo"), col("hi"),
          expr("greatest(0, least(hi, mn + span * b div 100)" +
            " - greatest(lo, mn + span * a div 100))").as("ov"))
        .groupBy("a", "b")
        .agg(sum(expr("cnt * ov div greatest(hi - lo, 1)")).as(name))
      exact.join(est(wbuck, "est_width"), Seq("a", "b"))
        .join(est(dbuck, "est_depth"), Seq("a", "b"))
        .select(col("a").as("range_lo_pct"), col("b").as("range_hi_pct"),
          col("n_exact"), col("est_width"), col("est_depth"),
          expr("abs(est_width - n_exact) * 1000000" +
            " div greatest(n_exact, 1)").as("err_width_ppm"),
          expr("abs(est_depth - n_exact) * 1000000" +
            " div greatest(n_exact, 1)").as("err_depth_ppm"))
        .orderBy("range_lo_pct", "range_hi_pct")
    }),

    // learned-index error bound: OLS of rank on key (price cents) in
    // exact cross-multiplied integers — ε = max |true rank − linear
    // prediction| is the binary-search window a learned index needs
    // (the recursive-model-index readout); mean |error| says how tight
    // the typical probe is. No division until the final scaled readouts
    "q531_learned_index" -> ((s, dir) => {
      val xr = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), centsOf(col("o_totalprice")).as("x"))
        .withColumn("y", row_number().over(
          Window.orderBy(col("x"), col("k"))).cast("long"))
        .localCheckpoint(false)
      val st = broadcast(xr.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .select(col("n"), col("sx"), col("sy"),
          expr("CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy").as("bnum"),
          expr("CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx").as("d")))
      xr.crossJoin(st)
        .select(col("n"), col("bnum"), col("d"),
          expr("abs(CAST(n AS DECIMAL(38,0)) * d * y" +
            " - (d * sy + n * bnum * x - bnum * sx))").as("e"))
        .groupBy("n", "bnum", "d")
        .agg(max(col("e")).as("emax"), sum(col("e")).as("esum"))
        .select(col("n").as("n_keys"),
          expr("CAST(bnum * 1000000000 div d AS BIGINT)").as("slope_ppb"),
          expr("CAST(emax div (CAST(n AS DECIMAL(38,0)) * d) AS BIGINT)")
            .as("eps_rows"),
          expr("CAST(1000 * (esum div (CAST(n AS DECIMAL(38,0)) * d))" +
            " div n AS BIGINT)").as("mean_abs_err_milli"))
    }),

    // result-cache TTL tuning: a (user, event_type) re-request within
    // TTL is a cache hit — hit ratios for TTL ∈ {60 s, 10 min, 1 h}
    // from ONE lag pass over the per-user streams (the "what TTL buys
    // what hit rate" readout behind q324's debounce and q497's LRU
    // depth profile)
    "q532_cache_ttl" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .crossJoin(broadcast(Seq(60L, 600L, 3600L).toDF("ttl_s")))
        .groupBy("ttl_s")
        .agg(count(lit(1)).as("n_requests"),
          sum(when(col("gap").isNotNull, 1L).otherwise(0L)).as("n_repeats"),
          sum(when(col("gap") <= col("ttl_s") * 1000000L, 1L).otherwise(0L))
            .as("n_hits"))
        .withColumn("hit_ppm", expr("n_hits * 1000000 div n_requests"))
        .orderBy("ttl_s")
    }),

    // median-of-means robust mean of doc lengths: 16 md5 buckets, the
    // bucket-mean median (doubled-order-stat convention) and the
    // min/max-trimmed bucket mean vs the plain mean — the estimator
    // heavy-tail pipelines use when a single shard of garbage must not
    // move the metric; everything after the one scan is 16 rows
    "q533_median_of_means" -> ((s, dir) => {
      val b = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy((Dedup.md5Long(concat(lit("mom#"),
          col("doc_id").cast("string")), 12) % 16).as("bkt"))
        .agg(count(lit(1)).as("nb"), sum(col("n_chars")).as("sb"))
        .select(expr("1000 * sb div nb").as("m_milli"), col("nb"), col("sb"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("m_milli"), col("nb"))).cast("long"))
      b.agg(sum(col("sb")).as("stot"), sum(col("nb")).as("ntot"),
          sum(when(col("rk") === 8, col("m_milli")).otherwise(0L)).as("m8"),
          sum(when(col("rk") === 9, col("m_milli")).otherwise(0L)).as("m9"),
          sum(col("m_milli")).as("msum"),
          max(col("m_milli")).as("mmax"), min(col("m_milli")).as("mmin"))
        .select(col("ntot").as("n_docs"),
          expr("1000 * stot div ntot").as("mean_milli"),
          expr("(m8 + m9) div 2").as("mom_milli"),
          expr("(msum - mmax - mmin) div 14").as("trimmed_milli"))
    }),

    // join-order cost enumeration audit: the three left-deep orders of
    // customer ⋈ orders ⋈ lineitem costed with the textbook estimate
    // |R⋈S| = |R|·|S|/max(d_R, d_S) from base-table distinct counts —
    // including the customer×lineitem cartesian the greedy optimizer
    // must avoid — with ESTIMATED cost (Σ intermediate sizes) laid
    // beside the ACTUAL sizes. The readout a cost-based optimizer's
    // regression test wants: does the estimate still rank plans right?
    "q534_join_order_costs" -> ((s, dir) => {
      import s.implicits._
      val st = Tables.orders(s, dir).agg(count(lit(1)).as("no"),
          countDistinct(col("o_custkey")).as("doc"))
        .crossJoin(broadcast(Tables.customer(s, dir)
          .agg(count(lit(1)).as("nc"))))
        .crossJoin(broadcast(Tables.lineitem(s, dir)
          .agg(count(lit(1)).as("nl"),
            countDistinct(col("l_orderkey")).as("dlo"))))
      val aco = Tables.orders(s, dir).join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey")).agg(count(lit(1)).as("a_co"))
      val aol = Tables.orders(s, dir).join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey")).agg(count(lit(1)).as("a_ol"))
      val afull = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("a_col"))
      st.crossJoin(broadcast(aco)).crossJoin(broadcast(aol))
        .crossJoin(broadcast(afull))
        .selectExpr(
          "stack(3," +
            " '1_co_then_l'," +
            "   CAST(CAST(nc AS DECIMAL(38,0)) * no div greatest(nc, doc)" +
            "   + (CAST(nc AS DECIMAL(38,0)) * no div greatest(nc, doc))" +
            "     * nl div greatest(no, dlo) AS BIGINT)," +
            "   CAST(a_co + a_col AS BIGINT)," +
            " '2_ol_then_c'," +
            "   CAST(CAST(no AS DECIMAL(38,0)) * nl div greatest(no, dlo)" +
            "   + (CAST(no AS DECIMAL(38,0)) * nl div greatest(no, dlo))" +
            "     * nc div greatest(doc, nc) AS BIGINT)," +
            "   CAST(a_ol + a_col AS BIGINT)," +
            " '3_cl_cross_then_o'," +
            "   CAST(CAST(nc AS DECIMAL(38,0)) * nl" +
            "   + (CAST(nc AS DECIMAL(38,0)) * nl) * no div greatest(no, dlo)" +
            "     AS BIGINT)," +
            "   CAST(CAST(nc AS DECIMAL(38,0)) * nl + a_col AS BIGINT)" +
            ") AS (plan, est_cost, actual_cost)")
        .orderBy("plan")
    }),

    // priority load-shedding model: per second of arrivals, keep events
    // in pinned business-priority order (purchase > signup > click >
    // view > error) until the capacity — set at mean+1 events/sec —
    // is spent; everything lower sheds. ONE 5-row window per second
    // (cumulative of higher priorities), the per-type shed rates are
    // the capacity-planning readout behind q431's token bucket
    "q535_load_shedding" -> ((s, dir) => {
      val pri = expr("CASE event_type WHEN 'purchase' THEN 1" +
        " WHEN 'signup' THEN 2 WHEN 'click' THEN 3 WHEN 'view' THEN 4" +
        " ELSE 5 END")
      val arr = Tables.events(s, dir)
        .select(col("ts"), col("event_type"), pri.as("p"))
        .select(expr("unix_micros(ts) div 1000000").as("sec"),
          col("event_type"), col("p"))
        .groupBy("sec", "event_type", "p").agg(count(lit(1)).as("arr"))
        .localCheckpoint(false)
      val cap = broadcast(arr.agg(
        expr("sum(arr) div count(DISTINCT sec) + 1").as("cap")))
      val cum = Window.partitionBy("sec").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
      arr.crossJoin(cap)
        .withColumn("cb", coalesce(sum(col("arr")).over(cum), lit(0L)))
        .withColumn("kept",
          greatest(lit(0L), least(col("arr"), col("cap") - col("cb"))))
        .groupBy("event_type", "p")
        .agg(sum(col("arr")).as("n_arrivals"), sum(col("kept")).as("n_kept"))
        .select(col("event_type"), col("p").cast("long").as("priority_rank"),
          col("n_arrivals"), col("n_kept"),
          expr("(n_arrivals - n_kept) * 1000000 div n_arrivals")
            .as("shed_ppm"))
        .orderBy("p")
    }),

    // exact Shapley attribution over the three non-purchase channels
    // (click/view/signup exposure → purchase conversion): coalition
    // value v(S) = conversion rate of users exposed to EXACTLY S, the
    // 3-player Shapley sum with ×6 integer weights (2,1,1,2) — the
    // principled split q339's last-touch/linear heuristics approximate;
    // everything reduces to the 8-row exposure-set relation
    "q536_shapley_attribution" -> ((s, dir) => {
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
          max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
          max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("g"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val rates = u.groupBy("c", "v", "g")
        .agg(expr("sum(conv) * 1000000 div count(1)").as("r"))
      val rateCols = (for (c <- 0 to 1; v <- 0 to 1; g <- 0 to 1) yield
        sum(when(col("c") === c && col("v") === v && col("g") === g,
          col("r")).otherwise(0L)).as(s"r$c$v$g")).toSeq
      val wide = rates.agg(rateCols.head, rateCols.tail: _*)
      wide.selectExpr(
          "stack(3," +
            " 'click', 2*(r100 - r000) + (r110 - r010) + (r101 - r001)" +
            " + 2*(r111 - r011)," +
            " 'view', 2*(r010 - r000) + (r110 - r100) + (r011 - r001)" +
            " + 2*(r111 - r101)," +
            " 'signup', 2*(r001 - r000) + (r101 - r100) + (r011 - r010)" +
            " + 2*(r111 - r110)" +
            ") AS (channel, phi6_ppm)")
        .select(col("channel"), col("phi6_ppm"),
          expr("phi6_ppm div 6").as("phi_ppm"))
        .orderBy("channel")
    }),

    // hierarchical forecast reconciliation: naive last-month forecasts
    // per region (bottom-up) vs the total forecast split by trailing
    // 12-month revenue shares (top-down) — the coherence gap between
    // the two is the reconciliation error a grouped-time-series system
    // must resolve before publishing. Exact cents; every relation after
    // the star join is ≤ n_regions rows
    "q537_forecast_reconciliation" -> ((s, dir) => {
      val mr = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), expr("date_trunc('month', o_orderdate)").as("m"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
        .localCheckpoint(false)
      val last = broadcast(mr.agg(max(col("m")).as("mx")))
      val bu = mr.crossJoin(last).filter(col("m") === col("mx"))
        .select(col("r_name"), col("rev").as("bu_cents"))
      val tot = broadcast(bu.agg(sum(col("bu_cents")).as("tot_last")))
      val share = mr.groupBy("r_name").agg(sum(col("rev")).as("rev_all"))
        .crossJoin(broadcast(mr.agg(sum(col("rev")).as("rev_tot"))))
        .select(col("r_name"),
          expr("rev_all * 1000000 div rev_tot").as("share_ppm"))
      bu.join(share, "r_name").crossJoin(tot)
        .select(col("r_name"), col("bu_cents"),
          expr("tot_last * share_ppm div 1000000").as("td_cents"))
        .withColumn("gap_ppm", expr(
          "abs(bu_cents - td_cents) * 1000000 div greatest(bu_cents, 1)"))
        .orderBy("r_name")
    }),

    // training-epoch shuffle quality: Spearman ρ between the md5 orders
    // of consecutive epochs, and between epoch 1 and raw corpus order —
    // a correct shuffle shows |ρ| ≈ 0 both ways (residual correlation
    // means curriculum leakage across epochs). Exact: ρ = 1 −
    // 6Σd²/(n(n²−1)) in integer ppm from the two rank windows
    "q538_epoch_shuffle" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"))
        .withColumn("r0", row_number().over(
          Window.orderBy("doc_id")).cast("long"))
        .withColumn("r1", row_number().over(Window.orderBy(
          Dedup.md5Long(concat(lit("ep#1#"), col("doc_id").cast("string")), 12),
          col("doc_id"))).cast("long"))
        .withColumn("r2", row_number().over(Window.orderBy(
          Dedup.md5Long(concat(lit("ep#2#"), col("doc_id").cast("string")), 12),
          col("doc_id"))).cast("long"))
        .localCheckpoint(false)
      def rho(a: String, b: String, label: String): DataFrame = base
        .agg(count(lit(1)).as("n"),
          sum(expr(s"CAST(($a - $b) AS DECIMAL(38,0)) * ($a - $b)")).as("sd2"))
        .select(lit(label).as("pair"), col("n").as("n_docs"),
          expr("CAST(1000000 - 6 * sd2 * 1000000" +
            " div (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1))" +
            " AS BIGINT)").as("rho_ppm"))
      rho("r1", "r2", "epoch1_vs_epoch2")
        .unionAll(rho("r0", "r1", "corpus_vs_epoch1"))
        .orderBy("pair")
    }),

    // two-sample Cramér–von Mises on BUILDING vs MACHINERY order prices:
    // the whole-CDF distance (sensitive everywhere, where q289's
    // Mann–Whitney sees only location) — T = (6U − nm(4nm−1))/(6nmN)
    // with U from midrank deviations, the per-tied-block square sums in
    // CLOSED FORM (Σ(c−2k)² expands to three integer series), so one
    // value-grouped pass with two per-group cumulatives computes it
    // exactly
    "q539_cramer_von_mises" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING")
          .cast("long").as("ga"))
      val vg = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val cum = vg
        .withColumn("cb", coalesce(sum(expr("na + nb")).over(before), lit(0L)))
        .withColumn("ca", coalesce(sum(col("na")).over(before), lit(0L)))
        .withColumn("cb2", coalesce(sum(col("nb")).over(before), lit(0L)))
        .withColumn("cblk", expr("2 * cb + na + nb + 1"))
      def s12(nc: String, cc: String): Column = sum(expr(
        s"CASE WHEN $nc > 0 THEN 3 * $nc" +
          s" * CAST((cblk - 2 * $cc) AS DECIMAL(38,0)) * (cblk - 2 * $cc)" +
          s" - 6 * CAST((cblk - 2 * $cc) AS DECIMAL(38,0)) * $nc * ($nc + 1)" +
          s" + 2 * CAST($nc AS DECIMAL(38,0)) * ($nc + 1) * (2 * $nc + 1)" +
          s" ELSE 0 END"))
      cum.agg(sum(col("na")).as("n"), sum(col("nb")).as("m"),
          s12("na", "ca").as("sa12"), s12("nb", "cb2").as("sb12"))
        .select(col("n").as("n_building"), col("m").as("n_machinery"),
          expr("CAST((6 * (CAST(n AS DECIMAL(38,0)) * sa12" +
            " + CAST(m AS DECIMAL(38,0)) * sb12)" +
            " - 12 * CAST(n AS DECIMAL(38,0)) * m" +
            " * (4 * CAST(n AS DECIMAL(38,0)) * m - 1)) * 1000000" +
            " div (72 * CAST(n AS DECIMAL(38,0)) * m * (n + m)) AS BIGINT)")
            .as("t_micro"))
    }),

    // hypergeometric enrichment: are near-dup docs (q21 candidate
    // members) OVER-represented among long docs (≥ the exact median
    // n_chars) — fold change + the mean/variance z against drawing
    // without replacement, the GSEA-style readout that says whether
    // duplication concentrates in a quality stratum. Exact integer
    // cross-multiplied z², one isqrt
    "q540_enrichment_test" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars")).localCheckpoint(false)
      val before = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
      val med = d.select(col("n_chars").as("q")).groupBy("q")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .crossJoin(broadcast(d.agg(count(lit(1)).as("nn"))))
        .filter(col("cb") < expr("(nn + 1) div 2") &&
          expr("cb + cnt") >= expr("(nn + 1) div 2"))
        .select(col("q").as("med"))
      val cand = Dedup.minhashCandidates(
          Tables.documents(s, dir), "doc_id", "text")
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      d.crossJoin(broadcast(med))
        .join(cand.withColumn("dup", lit(1L)), Seq("doc_id"), "left")
        .agg(count(lit(1)).as("nn"),
          sum(when(col("n_chars") >= col("med"), 1L).otherwise(0L)).as("kk"),
          sum(coalesce(col("dup"), lit(0L))).as("nd"),
          sum(when(col("n_chars") >= col("med"), coalesce(col("dup"), lit(0L)))
            .otherwise(0L)).as("k"))
        .select(col("nn").as("n_docs"), col("kk").as("n_long"),
          col("nd").as("n_dup"), col("k").as("n_overlap"),
          expr("k * nn * 1000000 div greatest(nd * kk, 1)").as("fold_ppm"),
          expr("CAST((CAST(k AS DECIMAL(38,0)) * nn" +
            " - CAST(nd AS DECIMAL(38,0)) * kk)" +
            " * (CAST(k AS DECIMAL(38,0)) * nn - CAST(nd AS DECIMAL(38,0)) * kk)" +
            " * (nn - 1) * 1000000" +
            " div greatest(CAST(nd AS DECIMAL(38,0)) * kk * (nn - kk)" +
            " * (nn - nd), 1) AS BIGINT)").as("z2_micro"))
        .withColumn("t0", floor(sqrt(col("z2_micro").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + z2_micro div t0) div 2 ELSE 0 END"))
        .select(col("n_docs"), col("n_long"), col("n_dup"), col("n_overlap"),
          col("fold_ppm"),
          expr("(CASE WHEN fold_ppm >= 1000000 THEN 1 ELSE -1 END)" +
            " * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2_micro THEN t1 + 1" +
            " WHEN t1 * t1 > z2_micro THEN t1 - 1 ELSE t1 END)").as("z_milli"))
    }),

    // Bradley–Terry preference strengths from monthly region-revenue
    // duels — the pairwise-comparison model behind every RLHF reward
    // fit, here ranking regions from ~960 month-level head-to-heads:
    // two minorization–maximization updates from the uniform start,
    // every division a pinned integer quotient on the bounded 5×5
    // win matrix, scores renormalized to Σ = k·10⁶ each round
    "q541_bradley_terry" -> ((s, dir) => {
      val mr = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), expr("date_trunc('month', o_orderdate)").as("m"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
        .localCheckpoint(false)
      val grid = mr.select("m").distinct()
        .crossJoin(broadcast(mr.select("r_name").distinct()))
        .join(mr, Seq("m", "r_name"), "left")
        .select(col("m"), col("r_name"), coalesce(col("rev"), lit(0L)).as("rev"))
      val duels = grid.select(col("m"), col("r_name").as("ra"), col("rev").as("va"))
        .join(grid.select(col("m"), col("r_name").as("rb"), col("rev").as("vb")),
          "m")
        .filter(col("ra") =!= col("rb"))
        .groupBy("ra", "rb")
        .agg(sum(when(col("va") > col("vb"), 1L).otherwise(0L)).as("w"),
          count(lit(1)).as("ngames"))
        .localCheckpoint(false)
      val wins = duels.groupBy("ra").agg(sum(col("w")).as("wi"))
      def mmStep(pi: DataFrame): DataFrame = {
        val den = duels
          .join(pi.select(col("r_name").as("ra"), col("p").as("pa")), "ra")
          .join(pi.select(col("r_name").as("rb"), col("p").as("pb")), "rb")
          .groupBy("ra")
          .agg(sum(expr("ngames * 1000000 div (pa + pb)")).as("den"))
        val raw = wins.join(den, "ra")
          .select(col("ra").as("r_name"),
            expr("wi * 1000000 * 1000000 div greatest(den, 1)").as("praw"))
        raw.crossJoin(broadcast(raw.agg(sum(col("praw")).as("ptot"),
            count(lit(1)).as("k"))))
          .select(col("r_name"),
            expr("CAST(praw AS DECIMAL(38,0)) * k * 1000000 div ptot").as("p"))
      }
      val p0 = wins.select(col("ra").as("r_name"), lit(1000000L).as("p"))
      val p2 = mmStep(mmStep(p0))
      wins.select(col("ra").as("r_name"), col("wi").as("n_wins"))
        .join(p2, "r_name")
        .select(col("r_name"), col("n_wins"), col("p").as("bt_score_micro"))
        .orderBy("r_name")
    }),

    // A/B power analysis: the minimum detectable effect on doc length
    // at n ∈ {1000, 10000, full} per arm — MDE = (z_{α/2}+z_β)·σ·√(2/n)
    // with the z-sum pinned at 2.802 milli-units (α=5%, power 80%),
    // σ² the exact sample variance of the corpus; one isqrt per n.
    // The "is this experiment even worth running" readout
    "q542_power_mde" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
          sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("sxx"))
        .select(col("n"), col("sx"),
          expr("CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx").as("vnum"))
        .crossJoin(broadcast(Seq(1000L, 10000L, 0L).toDF("narm")))
        .select(col("n"), col("sx"), col("vnum"),
          when(col("narm") === 0L, col("n")).otherwise(col("narm")).as("narm"))
        .withColumn("mde2", expr(
          "CAST(2 * 2802 * 2802 * vnum" +
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1) * narm) AS BIGINT)"))
        .withColumn("t0", floor(sqrt(col("mde2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + mde2 div t0) div 2 ELSE 0 END"))
        .select(col("narm").as("n_per_arm"), col("n"), col("sx"),
          expr("CASE WHEN (t1 + 1) * (t1 + 1) <= mde2 THEN t1 + 1" +
            " WHEN t1 * t1 > mde2 THEN t1 - 1 ELSE t1 END").as("mde_milli"))
        .select(col("n_per_arm"), col("mde_milli"),
          expr("mde_milli * 1000 * n div sx").as("mde_rel_ppm"))
        .orderBy("n_per_arm")
    }),

    // Davies–Bouldin clustering validity over the 8 IVF buckets: the
    // worst-pair ratio (sᵢ+sⱼ)/d(cᵢ,cⱼ) per cluster and its mean — low
    // = compact, well-separated (the companion to q182's silhouette
    // that needs only k² centroid distances, not row pairs). Centroids
    // as pinned truncated integer means on the 1e-6 grid; every
    // distance an exact integer isqrt
    "q543_davies_bouldin" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"),
          posexplode(col("emb_d").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("bucket"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val cent = asg.groupBy("bucket", "pos")
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("nb"))
        .select(col("bucket"), col("pos"), expr("sq div nb").as("cq"))
        .localCheckpoint(false)
      def isqrtCols(df: DataFrame, in: String, out: String): DataFrame = df
        .withColumn("_t0", floor(sqrt(col(in).cast("double"))).cast("long"))
        .withColumn("_t1", expr(
          s"CASE WHEN _t0 > 0 THEN (_t0 + $in div _t0) div 2 ELSE 0 END"))
        .withColumn(out, expr(
          s"CASE WHEN (_t1 + 1) * (_t1 + 1) <= $in THEN _t1 + 1" +
            s" WHEN _t1 * _t1 > $in THEN _t1 - 1 ELSE _t1 END"))
        .drop("_t0", "_t1")
      val si = isqrtCols(
          asg.join(cent, Seq("bucket", "pos"))
            .groupBy("vec_id", "bucket")
            .agg(sum(expr("(qv - cq) * (qv - cq)")).as("d2")), "d2", "dist")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_members"),
          expr("sum(dist) div count(1)").as("s_q"))
        .localCheckpoint(false)
      val cd = isqrtCols(
          cent.select(col("bucket").as("bi"), col("pos"), col("cq").as("ci"))
            .join(cent.select(col("bucket").as("bj"), col("pos"),
              col("cq").as("cj")), "pos")
            .filter(col("bi") =!= col("bj"))
            .groupBy("bi", "bj")
            .agg(sum(expr("(ci - cj) * (ci - cj)")).as("c2")), "c2", "dc")
      val r = cd
        .join(si.select(col("bucket").as("bi"), col("s_q").as("si")), "bi")
        .join(si.select(col("bucket").as("bj"), col("s_q").as("sj")), "bj")
        .groupBy("bi")
        .agg(max(expr("(si + sj) * 1000 div greatest(dc, 1)")).as("r_milli"))
      si.select(col("bucket"), col("n_members"), col("s_q"))
        .join(r.select(col("bi").as("bucket"), col("r_milli")), "bucket")
        .crossJoin(broadcast(r.agg(
          expr("sum(r_milli) div count(1)").as("db_milli"))))
        .orderBy("bucket")
    }),

    // Cliff's delta + Vargha–Delaney A between two customer segments'
    // order prices — the EFFECT-SIZE readout the q289 Mann–Whitney p-value
    // doesn't give: δ = (P(a>b) − P(a<b)) and A = P(a>b) + P(a=b)/2, both
    // exact integer ppm from the same value-grouped cumulative scaffold
    // (U_gt = Σ na·cumB<, U_lt = Σ nb·cumA<, ties = Σ na·nb — one window,
    // no pair materialization, Σbucket never squared)
    "q544_cliffs_delta" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("FURNITURE", "HOUSEHOLD"))
        .select(col("c_custkey"), (col("c_mktsegment") === "FURNITURE")
          .cast("long").as("ga"))
      val vg = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      vg.withColumn("cb", coalesce(sum(col("nb")).over(before), lit(0L)))
        .withColumn("ca", coalesce(sum(col("na")).over(before), lit(0L)))
        .agg(sum(col("na")).as("n"), sum(col("nb")).as("m"),
          sum(expr("na * cb")).as("ugt"),
          sum(expr("nb * ca")).as("ult"),
          sum(expr("na * nb")).as("ties"))
        .select(col("n").as("n_furniture"), col("m").as("n_household"),
          expr("(ugt - ult) * 1000000 div (n * m)").as("delta_ppm"),
          expr("(2 * ugt + ties) * 1000000 div (2 * n * m)").as("vda_ppm"))
    }),

    // two-sample Kuiper test on order prices, 1993 vs 1994: V = D⁺ + D⁻
    // — the cyclic-sensitive cousin of q206's KS (equal sensitivity in
    // both tails, detects scale+location shifts KS's single sup misses).
    // CDFs stay cross-multiplied integers (ca·m − cb·n), the full-frame
    // window supplies n,m without a crossJoin
    "q545_kuiper_test" -> ((s, dir) => {
      val vg = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(1993, 1994))
        .select((year(col("o_orderdate")) === 1993).cast("long").as("ga"),
          centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val upto = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val full = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      vg.withColumn("ca", sum(col("na")).over(upto))
        .withColumn("cb", sum(col("nb")).over(upto))
        .withColumn("n", sum(col("na")).over(full))
        .withColumn("m", sum(col("nb")).over(full))
        .agg(max(col("n")).as("n"), max(col("m")).as("m"),
          max(expr("ca * m - cb * n")).as("dp"),
          max(expr("cb * n - ca * m")).as("dm"))
        .select(col("n").as("n_1993"), col("m").as("n_1994"),
          expr("dp * 1000000 div (n * m)").as("dplus_ppm"),
          expr("dm * 1000000 div (n * m)").as("dminus_ppm"),
          expr("(dp + dm) * 1000000 div (n * m)").as("v_ppm"))
    }),

    // two-sample Anderson–Darling (Scholz–Stephens midrank/tie form) on
    // AUTOMOBILE vs MACHINERY order prices — the tail-weighted whole-CDF
    // test (CvM q539 weights uniformly; AD's 1/(F(1−F)) weight catches
    // tail divergence). Doubled midranks keep every term integer:
    // per distinct value, term_g = 10⁶·l·(N·Mg2 − n_g·B2)² div (N·D'),
    // D' = B2(2N−B2) − N·l; A²_micro = (N−1)(Sa/n + Sb/m) div N. The
    // 10⁶ numerator rides DECIMAL(38,0); each quotient ≤ ~4·10⁶·l·N so
    // the long-narrowing div is safe through sf1
    "q546_anderson_darling" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))
        .select(col("c_custkey"), (col("c_mktsegment") === "AUTOMOBILE")
          .cast("long").as("ga"))
      val vg = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val full = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      vg.withColumn("ca", coalesce(sum(col("na")).over(before), lit(0L)))
        .withColumn("cp", coalesce(sum(expr("na + nb")).over(before), lit(0L)))
        .withColumn("n", sum(col("na")).over(full))
        .withColumn("m", sum(col("nb")).over(full))
        .withColumn("bign", expr("n + m"))
        .withColumn("l", expr("na + nb"))
        .withColumn("ma2", expr("2 * ca + na"))
        .withColumn("mb2", expr("2 * (cp - ca) + nb"))
        .withColumn("b2", expr("2 * cp + l"))
        .withColumn("dd", expr("b2 * (2 * bign - b2) - bign * l"))
        .withColumn("ta", expr(
          "CASE WHEN dd > 0 THEN CAST(1000000 AS DECIMAL(38,0)) * l" +
            " * CAST((bign * ma2 - n * b2) AS DECIMAL(38,0))" +
            " * (bign * ma2 - n * b2)" +
            " div (CAST(bign AS DECIMAL(38,0)) * dd) ELSE 0 END"))
        .withColumn("tb", expr(
          "CASE WHEN dd > 0 THEN CAST(1000000 AS DECIMAL(38,0)) * l" +
            " * CAST((bign * mb2 - m * b2) AS DECIMAL(38,0))" +
            " * (bign * mb2 - m * b2)" +
            " div (CAST(bign AS DECIMAL(38,0)) * dd) ELSE 0 END"))
        .agg(max(col("n")).as("n"), max(col("m")).as("m"),
          max(col("bign")).as("bign"),
          sum(col("ta").cast(dec38)).as("sa"),
          sum(col("tb").cast(dec38)).as("sb"))
        .select(col("n").as("n_automobile"), col("m").as("n_machinery"),
          expr("CAST((CAST(bign - 1 AS DECIMAL(38,0))" +
            " * (sa div n + sb div m)) div bign AS BIGINT)").as("a2_micro"))
    }),

    // Mann–Kendall trend test on the monthly-revenue series: S counts
    // later-month revenue wins minus losses over all month pairs (the
    // nonparametric twin of q235's Theil–Sen slope), tie-corrected
    // 18·Var exact, continuity-corrected z via the isqrt chain. The
    // month dictionary is bounded (~84 rows) so the pair join broadcasts
    "q547_mann_kendall" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .localCheckpoint(false)
      val pairs = mo.select(col("t").as("t1"), col("v").as("v1"))
        .join(broadcast(mo.select(col("t").as("t2"), col("v").as("v2"))),
          col("t1") < col("t2"))
        .agg(sum(signum(col("v2") - col("v1")).cast("long")).as("s_stat"))
      val ties = mo.groupBy("v").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("nm"),
          sum(expr("c * (c - 1) * (2 * c + 5)")).as("tcorr"))
      pairs.crossJoin(broadcast(ties))
        .withColumn("var18", expr("nm * (nm - 1) * (2 * nm + 5) - tcorr"))
        .withColumn("k", expr(
          "18000000 * greatest(abs(s_stat) - 1, 0) * greatest(abs(s_stat) - 1, 0)" +
            " div var18"))
        .withColumn("t0", floor(sqrt(col("k").cast("double"))).cast("long"))
        .withColumn("t1", expr("CASE WHEN t0 > 0 THEN (t0 + k div t0) div 2 ELSE 0 END"))
        .withColumn("rt", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= k THEN t1 + 1" +
            " WHEN t1 * t1 > k THEN t1 - 1 ELSE t1 END"))
        .select(col("nm").as("n_months"), col("s_stat"), col("var18"),
          expr("CASE WHEN s_stat < 0 THEN -rt ELSE rt END").as("z_milli"))
    }),

    // Conover squared-ranks test: do FURNITURE and BUILDING order prices
    // have equal DISPERSION? Deviations from each segment's mean enter
    // on a common integer scale (d = n_other·|n_g·v − S_g|), pooled
    // doubled midranks give integer scores (2R)² quantized by div 4N,
    // and the exact conditional moments give a cross-multiplied z² —
    // the variance-sensitive complement of the q289/q544 location tests
    "q548_conover_scale" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("FURNITURE", "BUILDING"))
        .select(col("c_custkey"), (col("c_mktsegment") === "FURNITURE")
          .cast("long").as("ga"))
      val rows = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val gs = rows.groupBy("ga")
        .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"))
      val tot = gs.agg(sum(col("ng")).as("bign"),
        min(when(col("ga") === 1, col("ng"))).as("n"),
        min(when(col("ga") === 0, col("ng"))).as("m"))
      val dv = rows.join(broadcast(gs), "ga")
        .crossJoin(broadcast(tot))
        .select(col("ga"), col("bign"), col("n"), col("m"),
          expr("(bign - ng) * abs(ng * v - sg)").as("d"))
      val vg = dv.groupBy("d", "bign", "n", "m")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
      vg.withColumn("cp", coalesce(sum(expr("na + nb")).over(before), lit(0L)))
        .withColumn("l", expr("na + nb"))
        .withColumn("r2", expr("2 * cp + l + 1"))
        .withColumn("sc", expr(
          "CAST(r2 AS DECIMAL(38,0)) * r2 div (4 * bign)"))
        .agg(max(col("bign")).as("bign"), max(col("n")).as("n"),
          max(col("m")).as("m"),
          sum(expr("na * sc").cast(dec38)).as("t4a"),
          sum(expr("l * sc").cast(dec38)).as("m1"),
          sum(expr("CAST(l AS DECIMAL(38,0)) * sc * sc")).as("m2"))
        .select(col("n").as("n_furniture"), col("m").as("n_building"),
          col("t4a").cast("long").as("t4_scaled"),
          expr("CAST((1000 * CAST(bign - 1 AS DECIMAL(38,0))" +
            " * (bign * t4a - n * m1) * (bign * t4a - n * m1))" +
            " div (CAST(n AS DECIMAL(38,0)) * m * (bign * m2 - m1 * m1))" +
            " AS BIGINT)").as("zsq_milli"))
    }),

    // Calinski–Harabasz (variance-ratio) index over the IVF bucket
    // assignment — q543's Davies–Bouldin asks "are clusters compact vs
    // their nearest rival"; CH asks the global ANOVA question
    // (between-SS / within-SS, df-adjusted). Coordinates quantize to
    // 1e-6 longs, centroids are integer means (div), so W/B are exact
    // integer sums both engines reproduce bit-for-bit
    "q549_calinski_harabasz" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"),
          posexplode(col("emb_d").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("bucket"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val cent = asg.groupBy("bucket", "pos")
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("nb"))
        .select(col("bucket"), col("pos"), expr("sq div nb").as("cq"),
          col("nb"))
        .localCheckpoint(false)
      val glob = asg.groupBy("pos")
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("cnt"))
        .select(col("pos"), expr("sq div cnt").as("gq"))
      val w = asg.join(cent.select("bucket", "pos", "cq"), Seq("bucket", "pos"))
        .agg(sum(expr("(qv - cq) * (qv - cq)").cast(dec38)).as("wss"))
      val b = cent.join(glob, "pos")
        .agg(sum(expr("nb * (cq - gq) * (cq - gq)").cast(dec38)).as("bss"))
      val nk = asg.agg(countDistinct(col("vec_id")).as("nv"),
        countDistinct(col("bucket")).as("k"))
      w.crossJoin(broadcast(b)).crossJoin(broadcast(nk))
        .select(col("nv").as("n_vectors"), col("k").as("k_clusters"),
          col("wss").cast("long").as("w_ssq"),
          col("bss").cast("long").as("b_ssq"),
          expr("(1000 * bss * (nv - k)) div (wss * (k - 1))").as("ch_milli"))
    }),

    // Dunn index (centroid form) over the same IVF assignment: worst-case
    // separation — min inter-centroid distance² over max cluster
    // diameter² (4·max radius²) — the pessimist's counterpart to q549's
    // average-case ratio; all-squared so no roots are needed at all
    "q550_dunn_index" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"),
          posexplode(col("emb_d").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("bucket"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val cent = asg.groupBy("bucket", "pos")
        .agg(expr("sum(qv) div count(1)").as("cq"))
        .localCheckpoint(false)
      val maxr = asg.join(cent, Seq("bucket", "pos"))
        .groupBy("vec_id", "bucket")
        .agg(sum(expr("(qv - cq) * (qv - cq)")).as("r2"))
        .agg(max(col("r2")).as("max_r2"))
      val minc = cent.select(col("bucket").as("bi"), col("pos"), col("cq").as("ci"))
        .join(cent.select(col("bucket").as("bj"), col("pos"), col("cq").as("cj")), "pos")
        .filter(col("bi") < col("bj"))
        .groupBy("bi", "bj")
        .agg(sum(expr("(ci - cj) * (ci - cj)")).as("c2"))
        .agg(min(col("c2")).as("min_c2"), count(lit(1)).as("n_pairs"))
      minc.crossJoin(broadcast(maxr))
        .select(col("n_pairs"), col("min_c2"), col("max_r2"),
          expr("1000 * min_c2 div (4 * max_r2)").as("dunn_milli"))
    }),

    // adjusted Rand index: does the UNSUPERVISED IVF bucketing recover
    // the embeddings' true `label` partition? Pair-counting on the
    // bounded label×bucket contingency, chance-corrected in one exact
    // integer formula (doubled pair counts P/A/B, ×2T common
    // denominator — no division until the final ppm)
    "q551_adjusted_rand" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"))
      val cont = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"))
        .join(asg, "vec_id")
        .groupBy("label", "bucket").agg(count(lit(1)).as("nij"))
        .localCheckpoint(false)
      val p = cont.agg(sum(expr("nij * (nij - 1)")).as("pp"),
        sum(col("nij")).as("n"))
      val a = cont.groupBy("label").agg(sum(col("nij")).as("ai"))
        .agg(sum(expr("ai * (ai - 1)")).as("aa"), count(lit(1)).as("n_labels"))
      val b = cont.groupBy("bucket").agg(sum(col("nij")).as("bj"))
        .agg(sum(expr("bj * (bj - 1)")).as("bb"), count(lit(1)).as("k_buckets"))
      p.crossJoin(broadcast(a)).crossJoin(broadcast(b))
        .withColumn("t", expr("n * (n - 1)"))
        .select(col("n").as("n_vectors"), col("n_labels"), col("k_buckets"),
          expr("CAST(1000000 AS DECIMAL(38,0)) * (2 * t * pp - 2 * aa * bb)" +
            " div (CAST(t AS DECIMAL(38,0)) * (aa + bb) - 2 * aa * bb)")
            .as("ari_ppm"))
    }),

    // Fowlkes–Mallows index from the same label×bucket contingency: the
    // geometric mean of pair precision and pair recall — reported with
    // both components so the ARI's chance correction (q551) can be read
    // against the raw pair-confusion trade-off; one isqrt, else integers
    "q552_fowlkes_mallows" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"))
      val cont = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"))
        .join(asg, "vec_id")
        .groupBy("label", "bucket").agg(count(lit(1)).as("nij"))
        .localCheckpoint(false)
      val p = cont.agg(sum(expr("nij * (nij - 1)")).as("pp"))
      val a = cont.groupBy("label").agg(sum(col("nij")).as("ai"))
        .agg(sum(expr("ai * (ai - 1)")).as("aa"))
      val b = cont.groupBy("bucket").agg(sum(col("nij")).as("bj"))
        .agg(sum(expr("bj * (bj - 1)")).as("bb"))
      p.crossJoin(broadcast(a)).crossJoin(broadcast(b))
        .withColumn("fmsq", expr(
          "CAST(1000000 AS DECIMAL(38,0)) * pp * (1000000 * pp)" +
            " div (CAST(aa AS DECIMAL(38,0)) * bb)"))
        .withColumn("t0", floor(sqrt(col("fmsq").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + fmsq div t0) div 2 ELSE 0 END"))
        .withColumn("rt", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= fmsq THEN t1 + 1" +
            " WHEN t1 * t1 > fmsq THEN t1 - 1 ELSE t1 END"))
        .select(col("pp").as("pair_tp2"),
          expr("1000000 * pp div bb").as("prec_ppm"),
          expr("1000000 * pp div aa").as("rec_ppm"),
          col("rt").as("fm_ppm"))
    }),

    // mean-average-precision eval of the IVF retrieval against the exact
    // top-10 (the order-sensitive companion to q294's nDCG and q322's
    // MRR): per query, precision accumulates at each hit position —
    // cumulative-hit window, per-term micro floor-div, R = 10
    "q553_map_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("rk_exact"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
          nCentroids = 8, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("p"))
      val wcum = Window.partitionBy("query_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
      approx.join(exact, Seq("query_id", "neighbor_id"), "left")
        .withColumn("hit", when(col("rk_exact").isNotNull, 1L).otherwise(0L))
        .withColumn("ch", sum(col("hit")).over(wcum))
        .groupBy("query_id")
        .agg(sum(col("hit")).as("n_hits"),
          sum(when(col("hit") === 1, expr("ch * 1000000 div p"))
            .otherwise(0L)).as("psum_micro"))
        .withColumn("ap_micro", expr("psum_micro div 10"))
        .orderBy("query_id")
    }),

    // top-p (nucleus) truncation of each language's unigram distribution:
    // the smallest count-descending vocab prefix holding ≥90% of token
    // mass — the sampling-time cutoff readout (how many types survive
    // top-p per language). Strict-integer keep test 10·cum< < 9·total,
    // per-lang window, no doubles anywhere
    "q554_nucleus_cutoff" -> ((s, dir) => {
      val wc = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      val byFreq = Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("w"))
      val full = Window.partitionBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      wc.withColumn("cumb", coalesce(sum(col("cnt"))
          .over(byFreq.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("total", sum(col("cnt")).over(full))
        .withColumn("keep", when(expr("10 * cumb < 9 * total"), 1L).otherwise(0L))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_vocab"), max(col("total")).as("total_tokens"),
          sum(col("keep")).as("nucleus_k"),
          expr("sum(keep * cnt)").as("kept"))
        .select(col("lang"), col("n_vocab"), col("total_tokens"),
          col("nucleus_k"),
          expr("kept * 1000000 div total_tokens").as("nucleus_mass_ppm"))
        .orderBy("lang")
    }),

    // speculative-decoding acceptance rate between a draft LM (src0's
    // unigram distribution) and the target LM (src1's): α = Σ_w
    // min(p_draft, p_target) — exactly 1 − TV distance — cross-multiplied
    // to integers (min(ca·Nb, cb·Na)/(Na·Nb)); plus the expected accepted
    // run length for k=4 drafts, Σ_{i=0..4} αⁱ in pinned ppm powers
    "q555_speculative_accept" -> ((s, dir) => {
      val wc = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("source").isin("src0", "src1"))
        .select((col("source") === "src0").cast("long").as("ga"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w")
        .agg(sum(col("ga")).as("ca"), sum(lit(1L) - col("ga")).as("cb"))
      val full = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      wc.withColumn("na", sum(col("ca")).over(full))
        .withColumn("nb", sum(col("cb")).over(full))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(expr("least(ca * nb, cb * na)")).as("overlap"))
        .withColumn("a", expr("overlap * 1000000 div (na * nb)"))
        .select(col("na").as("draft_tokens"), col("nb").as("target_tokens"),
          col("a").as("accept_ppm"),
          expr("1000 + a div 1000" +
            " + CAST(a AS DECIMAL(38,0)) * a div 1000000000" +
            " + CAST(a AS DECIMAL(38,0)) * a * a div 1000000000000000" +
            " + CAST(a AS DECIMAL(38,0)) * a * a * a div 1000000000000000000000")
            .as("exp_len_milli"))
    }),

    // one DoReMi-style domain-reweighting step: each source's mean NLL
    // under the corpus unigram LM (q72's micro-nat convention), excess
    // over the best source, multiplicative-weights update
    // w ∝ exp(η·excess) with η = 0.1 — ONE pinned libm exp per source
    // (20 rows), integer algebra before and after; the normalized
    // new_w_ppm is the next epoch's sampling mixture
    "q556_doremi_step" -> ((s, dir) => {
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
      val wc = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      val tot = wc.agg(sum(col("cnt")).as("total"))
      val sw = words.groupBy("source", "w").agg(count(lit(1)).as("n"))
        .join(wc, "w").crossJoin(broadcast(tot))
        .withColumn("lp", round(log(col("cnt").cast("double") / col("total"))
          * 1000000, 0).cast("long"))
        .groupBy("source")
        .agg(sum(col("n")).as("n_tokens"),
          expr("-sum(n * lp)").as("snll"))
        .withColumn("nll_micro", expr("snll div n_tokens"))
      val full = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      sw.withColumn("best", min(col("nll_micro")).over(full))
        .withColumn("excess_micro", expr("nll_micro - best"))
        .withColumn("fac", expr(
          "CAST(round(exp(CAST(excess_micro div 10 AS DOUBLE) / 1000000.0)" +
            " * 1000000) AS BIGINT)"))
        .withColumn("fsum", sum(col("fac")).over(full))
        .select(col("source"), col("n_tokens"), col("nll_micro"),
          col("excess_micro"),
          expr("fac * 1000000 div fsum").as("new_w_ppm"))
        .orderBy("source")
    }),

    // expected reciprocal rank of the IVF retrieval against exact top-10
    // (q294/q553's scaffold, cascade-model readout): dyadic relevance
    // R = (2^g − 1)/16 with g = min(11−rk_exact, 4) makes every survival
    // product an integer ≤ 16⁹ — exact in both engines (the DuckDB
    // product() double is integer-exact below 2⁵³)
    "q557_err_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("rk_exact"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
          nCentroids = 8, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("p"))
      val wprev = Window.partitionBy("query_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
      approx.join(exact, Seq("query_id", "neighbor_id"), "left")
        .withColumn("g", least(greatest(coalesce(lit(11L) - col("rk_exact"),
          lit(0L)), lit(0L)), lit(4L)))
        .withColumn("r16", expr("CAST(pow(2, g) AS BIGINT) - 1"))
        .withColumn("surv", coalesce(expr(
          "aggregate(collect_list(16 - r16) OVER (PARTITION BY query_id" +
            " ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)," +
            " 1L, (acc, x) -> acc * x)"), lit(1L)))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_ranked"),
          sum(expr("1000000 * r16 * surv" +
            " * CAST(pow(16, 10 - p) AS BIGINT)" +
            " div (p * 1099511627776)")).as("err_micro"))
        .orderBy("query_id")
    }),

    // continuous vs static batching of LLM generation: 1024 requests with
    // deterministic generation lengths, static batches of 32 pay the
    // batch MAX while token-level (continuous) batching pays total/32 —
    // the padding-waste (q212) story at serving time, exact integers
    "q558_continuous_batching" -> ((s, dir) => {
      val req = Tables.orders(s, dir)
        .select(col("o_orderkey"))
        .orderBy("o_orderkey").limit(1024)
        .withColumn("glen", expr("o_orderkey * 7 % 96 + 32"))
        .withColumn("rn", row_number().over(Window.orderBy("o_orderkey")))
        .withColumn("batch", expr("(rn - 1) div 32"))
      req.groupBy("batch").agg(max(col("glen")).as("bmax"),
          sum(col("glen")).as("bsum"))
        .agg(count(lit(1)).as("n_batches"), sum(col("bmax")).as("static_cost"),
          sum(col("bsum")).as("total_tokens"))
        .select(col("n_batches"),
          col("static_cost"), col("total_tokens"),
          expr("(total_tokens + 31) div 32").as("packed_cost"),
          expr("1000 * static_cost div ((total_tokens + 31) div 32)")
            .as("speedup_milli"))
    }),

    // Pettitt change-point test on the monthly-revenue series: the
    // rank-based CUSUM U_t = Σ_{i≤t}(2R̄_i) − t(N+1) peaks at the most
    // likely break month (q214's CUSUM assumes a known mean; Pettitt is
    // distribution-free). Midranks come from the value-grouped window,
    // the time cumulative from a second window — no pair join at all,
    // and the significance exponent 6K²/(n³+n²) stays integer milli
    "q559_pettitt_changepoint" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .localCheckpoint(false)
      val byV = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val vg = mo.groupBy("v").agg(count(lit(1)).as("l"))
        .withColumn("cumb", coalesce(sum(col("l")).over(byV), lit(0L)))
        .select(col("v"), expr("2 * cumb + l + 1").as("r2"))
      val byT = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
      val full = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      mo.join(vg, "v")
        .withColumn("tn", row_number().over(Window.orderBy("t")))
        .withColumn("nm", sum(lit(1L)).over(full))
        .withColumn("u", sum(col("r2")).over(byT) - col("tn") * (col("nm") + 1))
        .filter(col("tn") < col("nm"))
        .withColumn("mx", max(abs(col("u"))).over(full))
        .filter(abs(col("u")) === col("mx"))
        .agg(max(col("nm")).as("nm"), max(col("mx")).as("k_stat"),
          min(col("t")).as("cp_month"))
        .select(col("nm").as("n_months"), col("k_stat"), col("cp_month"),
          expr("6000 * k_stat * k_stat div (nm * nm * nm + nm * nm)")
            .as("exponent_milli"))
    }),

    // KPSS level-stationarity statistic on monthly revenue (k$ units):
    // the null here is STATIONARY — the complement of q487's
    // Durbin–Watson / unit-root view. Residuals scale by ×n to stay
    // integer (e = n·x − Σx), the Bartlett q=4 long-run variance is a
    // 5×-scaled integer sum of lag products, and the n-powers cancel to
    // KPSS_micro = 5·10⁶·ΣS² div (n·lrv5) exactly
    "q560_kpss_level" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
        .localCheckpoint(false)
      val byT = Window.orderBy("t")
      val full = byT.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      mo.withColumn("nm", sum(lit(1L)).over(full))
        .withColumn("sv", sum(col("v")).over(full))
        .withColumn("e", expr("nm * v - sv"))
        .withColumn("st", sum(col("e")).over(
          byT.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("e1", lag(col("e"), 1).over(byT))
        .withColumn("e2", lag(col("e"), 2).over(byT))
        .withColumn("e3", lag(col("e"), 3).over(byT))
        .withColumn("e4", lag(col("e"), 4).over(byT))
        .agg(max(col("nm")).as("nm"),
          sum(expr("CAST(st AS DECIMAL(38,0)) * st")).as("ssq"),
          sum(expr("e * e")).as("g0"),
          sum(expr("e * coalesce(e1, 0)")).as("g1"),
          sum(expr("e * coalesce(e2, 0)")).as("g2"),
          sum(expr("e * coalesce(e3, 0)")).as("g3"),
          sum(expr("e * coalesce(e4, 0)")).as("g4"))
        .withColumn("lrv5", expr("5 * g0 + 2 * (4 * g1 + 3 * g2 + 2 * g3 + g4)"))
        .select(col("nm").as("n_months"), col("g0"), col("lrv5"),
          expr("CAST((5000000 * ssq) div (nm * CAST(lrv5 AS DECIMAL(38,0)))" +
            " AS BIGINT)").as("kpss_micro"))
    }),

    // semivariogram of daily revenue at row-order lags 1/2/4/8 — the
    // spatial-statistics readout of temporal structure (γ(h) rising with
    // h = persistence; flat = white noise). One ordered window pass,
    // four lag columns, quantized k$ units; pinned to OBSERVED-day
    // row lags so gaps don't create nulls beyond the series head
    "q561_variogram" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
      val byD = Window.orderBy("d")
      day.withColumn("v1", lag(col("v"), 1).over(byD))
        .withColumn("v2", lag(col("v"), 2).over(byD))
        .withColumn("v4", lag(col("v"), 4).over(byD))
        .withColumn("v8", lag(col("v"), 8).over(byD))
        .agg(count(lit(1)).as("n_days"),
          count(col("v1")).as("n1"),
          sum(expr("(v - v1) * (v - v1)")).as("s1"),
          count(col("v2")).as("n2"),
          sum(expr("(v - v2) * (v - v2)")).as("s2"),
          count(col("v4")).as("n4"),
          sum(expr("(v - v4) * (v - v4)")).as("s4"),
          count(col("v8")).as("n8"),
          sum(expr("(v - v8) * (v - v8)")).as("s8"))
        .select(col("n_days"),
          expr("s1 div (2 * n1)").as("gamma1_q"),
          expr("s2 div (2 * n2)").as("gamma2_q"),
          expr("s4 div (2 * n4)").as("gamma4_q"),
          expr("s8 div (2 * n8)").as("gamma8_q"))
    }),

    // Allan variance of daily revenue at block sizes m = 1/2/4: the
    // clock-stability metric repurposed for pipeline-throughput drift
    // (white noise → AVAR halves per doubling; drift → it grows).
    // Block sums keep means exact (ȳ diffs ×m), full blocks only
    "q562_allan_variance" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
        .withColumn("rn", row_number().over(Window.orderBy("d")))
        .localCheckpoint(false)
      def avar(m: Int): DataFrame = {
        val byB = Window.orderBy("b")
        day.withColumn("b", expr(s"(rn - 1) div $m"))
          .groupBy("b")
          .agg(sum(col("v")).as("bs"), count(lit(1)).as("c"))
          .filter(col("c") === m)
          .withColumn("prev", lag(col("bs"), 1).over(byB))
          .agg(count(col("prev")).as("npairs"),
            sum(expr("(bs - prev) * (bs - prev)")).as("sd2"))
          .select(lit(m.toLong).as("m"), col("npairs"),
            expr(s"sd2 div (2 * npairs * $m * $m)").as("avar_q"))
      }
      avar(1).union(avar(2)).union(avar(4)).orderBy("m")
    }),

    // Hurst exponent via rescaled range: R/S per full block at window
    // sizes 16/64/256 (all-integer: range of ×w cumulative deviations,
    // one isqrt per block), then H from the log-log endpoints — the
    // long-memory readout (H≈0.5 random walk increments, H>0.5
    // persistent). One ln per window size, q72's micro-nat convention
    "q563_hurst_rs" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
        .withColumn("rn", row_number().over(Window.orderBy("d")))
        .localCheckpoint(false)
      def rsRows(w: Int): DataFrame = {
        val inB = Window.partitionBy("b").orderBy("rn")
          .rowsBetween(Window.unboundedPreceding, 0)
        val overB = Window.partitionBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        day.withColumn("b", expr(s"(rn - 1) div $w"))
          .withColumn("c", sum(lit(1L)).over(overB))
          .filter(col("c") === w)
          .withColumn("bs", sum(col("v")).over(overB))
          .withColumn("e", expr(s"$w * v - bs"))
          .withColumn("cd", sum(col("e")).over(inB))
          .groupBy("b")
          .agg((max(col("cd")) - min(col("cd"))).as("rw"),
            sum(expr("e * e")).as("se2"))
          .filter(col("se2") > 0)
          .withColumn("k", expr(
            s"CAST(1000000 AS DECIMAL(38,0)) * rw * rw * $w div se2"))
          .withColumn("t0", floor(sqrt(col("k").cast("double"))).cast("long"))
          .withColumn("t1", expr(
            "CASE WHEN t0 > 0 THEN (t0 + k div t0) div 2 ELSE 0 END"))
          .withColumn("rs", expr(
            "CASE WHEN (t1 + 1) * (t1 + 1) <= k THEN t1 + 1" +
              " WHEN t1 * t1 > k THEN t1 - 1 ELSE t1 END"))
          .agg(count(lit(1)).as("n_blocks"), sum(col("rs")).as("srs"))
          .select(lit(w.toLong).as("w"), col("n_blocks"),
            expr("srs div n_blocks").as("mean_rs_milli"))
      }
      val rs = rsRows(16).union(rsRows(64)).union(rsRows(256))
      val full = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      rs.withColumn("l16", max(when(col("w") === 16,
          round(log(col("mean_rs_milli").cast("double")) * 1000000, 0)
            .cast("long"))).over(full))
        .withColumn("l256", max(when(col("w") === 256,
          round(log(col("mean_rs_milli").cast("double")) * 1000000, 0)
            .cast("long"))).over(full))
        .select(col("w"), col("n_blocks"), col("mean_rs_milli"),
          expr("1000 * (l256 - l16) div 2772589").as("hurst_milli"))
        .orderBy("w")
    }),

    // newsvendor stocking decision from the empirical daily-order-count
    // distribution: Q* = the cu/(cu+co) = 3/4 critical fractile
    // (value-grouped CDF, strict-integer 4·cum ≥ 3·N test) vs the naive
    // mean-demand stock, with both EXACT expected-cost numerators (×N
    // units: Σ cnt·[co·(Q−d)⁺ + cu·(d−Q)⁺]) — the inventory twin of
    // q350's quantile machinery
    "q564_newsvendor" -> ((s, dir) => {
      val vg = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(count(lit(1)).as("dem"))
        .groupBy("dem").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val upto = Window.orderBy("dem").rowsBetween(Window.unboundedPreceding, 0)
      val qs = vg.withColumn("cum", sum(col("cnt")).over(upto))
        .withColumn("tot", sum(col("cnt")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("tdem", sum(expr("dem * cnt")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(expr("4 * cum >= 3 * tot"))
        .agg(min(col("dem")).as("qstar"), max(col("tot")).as("n_days"),
          max(expr("tdem div tot")).as("qmean"))
      vg.crossJoin(broadcast(qs))
        .agg(max(col("n_days")).as("n_days"), max(col("qstar")).as("qstar"),
          max(col("qmean")).as("qmean"),
          sum(expr("cnt * (greatest(qstar - dem, 0)" +
            " + 3 * greatest(dem - qstar, 0))")).as("cost_qstar_num"),
          sum(expr("cnt * (greatest(qmean - dem, 0)" +
            " + 3 * greatest(dem - qmean, 0))")).as("cost_qmean_num"))
    }),

    // EOQ (economic order quantity) per brand: √(2DS/h) with the radical
    // kept a PURE product — isqrt(2·D·S·h) div h — q427's chain, so the
    // classic closed form stays exact integers; D = annual demand units,
    // S = 10000¢ fixed ordering cost, h = 20% of the brand's mean retail
    // price in cents (floor). The replenishment-planning readout
    "q565_eoq_plan" -> ((s, dir) => {
      val pb = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"),
          centsOf(col("p_retailprice")).as("pc"))
      val d = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"))
        .join(pb, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("dunits"),
          count(lit(1)).as("nl"), sum(col("pc")).as("spc"))
        .withColumn("h", expr("spc div (5 * nl)"))
        .withColumn("rad", expr("2 * dunits * 10000 * h"))
        .withColumn("t0", floor(sqrt(col("rad").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + rad div t0) div 2 ELSE 0 END"))
        .withColumn("rt", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= rad THEN t1 + 1" +
            " WHEN t1 * t1 > rad THEN t1 - 1 ELSE t1 END"))
      d.select(col("p_brand").as("brand"), col("dunits"), col("h").as("h_cents"),
          expr("rt div h").as("eoq_units"),
          expr("CASE WHEN rt div h > 0 THEN dunits div (rt div h)" +
            " ELSE 0 END").as("orders_per_cycle"))
        .orderBy("brand")
    }),

    // forced-response randomized survey (Warner-style privacy mechanism):
    // each customer answers honestly with p=1/2 else answers a forced
    // md5 coin — the aggregate UNBIASES to p̂ = (4·yes − n)/(2n) without
    // any row revealing its true bit (acctbal < 0). Both coins are md5
    // parities (portable), the estimate and truth compare in exact ppm —
    // the mechanism-level counterpart of q514's DP noise
    "q566_randomized_response" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          (col("c_acctbal") < 0).cast("long").as("truth"),
          Dedup.md5Long(concat(lit("rr#"), col("c_custkey").cast("string")), 12)
            .as("u"))
        .select(col("truth"),
          when(col("u") % 2 === 0, col("truth"))
            .otherwise(expr("(u div 2) % 2")).as("yes"))
        .agg(count(lit(1)).as("n_respondents"),
          sum(col("yes")).as("ny"), sum(col("truth")).as("nt"))
        .select(col("n_respondents"),
          expr("ny * 1000000 div n_respondents").as("yes_ppm"),
          expr("(4 * ny - n_respondents) * 1000000 div (2 * n_respondents)")
            .as("est_ppm"),
          expr("nt * 1000000 div n_respondents").as("true_ppm"),
          expr("(4 * ny - n_respondents) * 1000000 div (2 * n_respondents)" +
            " - nt * 1000000 div n_respondents").as("err_ppm"))
    }),

    // Cochran–Mantel–Haenszel test: BUILDING-segment exposure vs
    // order-status-F outcome, STRATIFIED by the customer's region — the
    // confounder-adjusted 2×2 that q290's pooled Cramér's V can't give
    // (q246 shows why pooling flips). Per-stratum deviation/variance
    // quantize to micro once (single div each), plus the Mantel–Haenszel
    // common odds ratio from the same five 2×2 tables
    "q567_cmh_test" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .join(Tables.nation(s, dir),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("ex"))
      val tab = Tables.orders(s, dir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n"), sum(col("ex")).as("r1"),
          sum((col("o_orderstatus") === "F").cast("long")).as("c1"),
          sum(expr("ex * CAST(o_orderstatus = 'F' AS LONG)")).as("a"))
        .select(col("r_name"), col("n"), col("r1"), col("c1"), col("a"),
          expr("1000000 * (a * n - r1 * c1) div n").as("d_micro"),
          expr("CAST(1000000 AS DECIMAL(38,0)) * r1 * (n - r1) * c1 * (n - c1)" +
            " div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))").as("v_micro"),
          expr("1000000 * (a * (n - r1 - c1 + a)) div n").as("ad_micro"),
          expr("1000000 * ((r1 - a) * (c1 - a)) div n").as("bc_micro"))
      tab.agg(count(lit(1)).as("n_strata"),
          sum(col("d_micro")).as("sd"), sum(col("v_micro")).as("sv"),
          sum(col("ad_micro")).as("mhn"), sum(col("bc_micro")).as("mhd"))
        .select(col("n_strata"), col("sd").as("sum_dev_micro"),
          col("sv").as("sum_var_micro"),
          expr("CAST((1000 * CAST(sd AS DECIMAL(38,0)) * sd)" +
            " div (1000000 * CAST(sv AS DECIMAL(38,0))) AS BIGINT)")
            .as("chi2_milli"),
          expr("1000 * mhn div mhd").as("or_milli"))
    }),

    // Hodges–Lehmann shift estimate between EUROPE and ASIA monthly
    // revenues: the median of ALL pairwise differences — the robust
    // "how much more does Europe sell per month" number whose breakdown
    // point q289-style rank tests only imply. Bounded 84×84 month-pair
    // grid, doubled-order-stat median so ties stay exact
    "q568_hodges_lehmann" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("EUROPE", "ASIA"))
        .groupBy(col("r_name"),
          date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .localCheckpoint(false)
      val e = mo.filter(col("r_name") === "EUROPE")
        .select(col("t").as("te"), col("v").as("ve"))
      val a = mo.filter(col("r_name") === "ASIA")
        .select(col("t").as("ta"), col("v").as("va"))
      val diffs = e.crossJoin(broadcast(a))
        .select((col("ve") - col("va")).as("dd"), col("te"), col("ta"))
        .withColumn("rk", row_number()
          .over(Window.orderBy("dd", "te", "ta")).cast("long"))
      diffs.withColumn("np", count(lit(1)).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("rk") === expr("(np + 1) div 2") ||
          col("rk") === expr("(np + 2) div 2"))
        .withColumn("mult", when(expr("np % 2 = 1"), 2L).otherwise(1L))
        .agg(max(col("np")).as("n_pairs"),
          sum(expr("dd * mult")).as("hl2_cents"))
        .select(col("n_pairs"), col("hl2_cents"),
          expr("hl2_cents div 2").as("hl_cents"))
    }),

    // truncated Katz centrality (4 attenuated steps, α = 1/4) on the
    // directed supplier→customer nation trade graph (q501's edges): how
    // much 1/2/3/4-hop trade flows INTO each nation, geometric damping —
    // the path-counting view beside q501's mutually-recursive HITS. The
    // 25-node dictionary iterates as four bounded broadcast joins;
    // floor-div damping is pinned identically in both engines
    "q569_katz_centrality" -> ((s, dir) => {
      val cn = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").as("cnat"))
      val sn = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("s_nationkey").as("snat"))
        .distinct()
      val edges = cn.join(sn, col("o_orderkey") === col("l_orderkey"))
        .select("snat", "cnat").distinct().localCheckpoint(false)
      val nations = Tables.nation(s, dir)
        .select(col("n_nationkey").as("node"), col("n_name"))
      def step(x: DataFrame): DataFrame = {
        val sin = edges.join(x, col("snat") === col("node"))
          .groupBy(col("cnat")).agg(sum(col("xv")).as("insum"))
        nations.join(broadcast(sin), col("node") === col("cnat"), "left")
          .select(col("node"), col("n_name"),
            expr("1000 + coalesce(insum, 0) div 4").as("xv"))
      }
      val x0 = nations.withColumn("xv", lit(1000L))
      val x4 = step(step(step(step(x0))))
      x4.select(col("n_name").as("nation"), col("xv").as("katz_milli"))
        .orderBy("nation")
    }),

    // resource-allocation link-prediction index on q292's brand
    // co-occurrence graph: RA = Σ_z 1/deg(z) over common neighbors of
    // non-adjacent pairs — the pure-integer cousin of Adamic–Adar
    // (1e6 div deg, no logarithm) that punishes hub intermediaries
    // harder; same median-thresholded edge set, same bounded two-hop
    "q570_resource_allocation" -> ((s, dir) => {
      val ob = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("p_brand")).as("bs"))
        .select(explode(col("bs")).as("u"), col("bs"))
        .select(col("u"), explode(col("bs")).as("v"))
        .filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("w"))
        .localCheckpoint(false)
      val m2 = ob
        .withColumn("rk", row_number().over(Window.orderBy(col("w"), col("u"), col("v"))))
        .withColumn("np", count(lit(1)).over(Window.partitionBy()))
        .agg((sum(when(col("rk") === expr("(np + 1) div 2"), col("w"))) +
          sum(when(col("rk") === expr("(np + 2) div 2"), col("w")))).as("m2"))
      val edges = ob.crossJoin(broadcast(m2)).filter(col("w") * 2 > col("m2"))
        .select("u", "v").localCheckpoint(false)
      val ed = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val deg = ed.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      val twoHop = ed.select(col("u").as("a"), col("v").as("wnode"))
        .join(ed.select(col("u").as("wnode"), col("v").as("b")), "wnode")
        .filter(col("a") < col("b"))
        .join(edges.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"), "left_anti")
      twoHop
        .join(broadcast(deg), col("wnode") === col("node"))
        .groupBy(col("a").as("brand_a"), col("b").as("brand_b"))
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000 div deg")).as("ra_micro"))
        .orderBy(col("ra_micro").desc, col("brand_a"), col("brand_b"))
        .limit(25)
    }),

    // Elias–Fano posting-list size audit: per brand, the EF space bound
    // n·(2 + ⌊log₂(U/n)⌋) vs the measured delta-gap bits Σ|bin(gap)| of
    // its sorted orderkey postings — which brands' postings compress and
    // by how much (q311/q373's postings, storage-planning view). log₂
    // comes from binary-string LENGTH so both engines stay exact
    "q571_elias_fano" -> ((s, dir) => {
      val post = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"), col("l_orderkey").as("k"))
        .distinct()
      val byK = Window.partitionBy("brand").orderBy("k")
      post.withColumn("gap", col("k") - coalesce(lag(col("k"), 1).over(byK),
          lit(0L)))
        .filter(col("gap") > 0)
        .groupBy("brand")
        .agg(count(lit(1)).as("n_postings"), max(col("k")).as("universe"),
          sum(length(bin(col("gap"))).cast("long")).as("delta_bits"))
        .withColumn("ef_bits", expr(
          "n_postings * (2 + length(bin(universe div n_postings)) - 1)"))
        .select(col("brand"), col("n_postings"), col("universe"),
          col("delta_bits"), col("ef_bits"),
          expr("ef_bits * 1000000 div delta_bits").as("ef_vs_delta_ppm"))
        .orderBy("brand")
    }),

    // weighted log-rank family on q518's AUTOMOBILE-vs-HOUSEHOLD customer
    // lifetimes: Gehan–Breslow (w = n at risk, early-difference
    // sensitive) and Tarone–Ware (w = isqrt(n), the compromise) beside
    // the plain log-rank — one risk-set pass computes all three χ²,
    // per-stratum micro quantization, one isqrt per event time
    "q572_weighted_logrank" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(col("c_custkey"),
          (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("g1"))
      val life = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey", "g1")
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate"))).as("t"))
      val et = life.groupBy("t")
        .agg(sum(col("g1")).as("d1"), count(lit(1)).as("d"))
        .localCheckpoint(false)
      val after = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val risk = et
        .withColumn("n1t", sum(col("d1")).over(after))
        .withColumn("nt", sum(col("d")).over(after))
        .withColumn("t0", floor(sqrt(col("nt").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + nt div t0) div 2 ELSE 0 END"))
        .withColumn("sq", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= nt THEN t1 + 1" +
            " WHEN t1 * t1 > nt THEN t1 - 1 ELSE t1 END"))
        .select(col("d1"), col("d"), col("n1t"), col("nt"), col("sq"),
          expr("d1 * 1000000 - d * n1t * 1000000 div nt").as("dev_micro"),
          expr("CASE WHEN nt > 1 THEN CAST(d AS DECIMAL(38,0)) * n1t" +
            " * (nt - n1t) * (nt - d) * 1000000" +
            " div (CAST(nt AS DECIMAL(38,0)) * nt * (nt - 1))" +
            " ELSE 0 END").as("v_micro"))
      def chi2(wNum: String, wVar: String, out: String): Column = expr(
        s"CAST((sum(CAST($wNum AS DECIMAL(38,0)) * dev_micro)" +
          s" * sum(CAST($wNum AS DECIMAL(38,0)) * dev_micro))" +
          s" div (1000000 * sum(CAST($wVar AS DECIMAL(38,0)) * v_micro))" +
          s" AS BIGINT)").as(out)
      risk.agg(count(lit(1)).as("n_times"),
        chi2("1", "1", "logrank_chi2_micro"),
        chi2("nt", "nt * nt", "gehan_chi2_micro"),
        chi2("sq", "nt", "tw_chi2_micro"))
    }),

    // inequality panel over per-customer total spend: Theil T (micro-nat
    // entropy form, one pinned ln per customer), Hoover/Robin-Hood index
    // (exact integer Σ|n·x − S| / 2nS), and Atkinson(ε=1) via the
    // geometric mean (mean micro-nat, ONE exp) — the decomposable
    // complements of q204's Gini on the same concentration question
    "q573_inequality_panel" -> ((s, dir) => {
      val sp = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("x"))
        .filter(col("x") > 0)
        .withColumn("lx", round(log(col("x").cast("double")) * 1000000, 0)
          .cast("long"))
        .localCheckpoint(false)
      val tot = sp.agg(count(lit(1)).as("n"), sum(col("x")).as("st"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * lx")).as("sxl"),
        sum(col("lx")).as("sl"))
      val hoover = sp.crossJoin(broadcast(tot.select(col("n"), col("st"))))
        .agg(sum(expr("abs(CAST(n AS DECIMAL(38,0)) * x - st)")).as("sad"))
      tot.crossJoin(broadcast(hoover))
        .withColumn("lnn", round(log(col("n").cast("double")) * 1000000, 0)
          .cast("long"))
        .withColumn("lns", round(log(col("st").cast("double")) * 1000000, 0)
          .cast("long"))
        .withColumn("geo", expr(
          "CAST(round(exp(CAST(sl div n AS DOUBLE) / 1000000.0)) AS BIGINT)"))
        .select(col("n").as("n_customers"), col("st").as("total_cents"),
          expr("(sxl + CAST(lnn - lns AS DECIMAL(38,0)) * st) div st")
            .as("theil_micro"),
          col("geo").as("geomean_cents"),
          expr("1000000 - CAST(geo AS DECIMAL(38,0)) * n * 1000000 div st")
            .as("atkinson1_ppm"),
          expr("CAST(1000000 AS DECIMAL(38,0)) * sad div (2 * n * st)")
            .as("hoover_ppm"))
    }),

    // Siegel–Tukey dispersion test on per-customer spend, MACHINERY vs
    // FURNITURE: alternating-extreme ranks (lowest→1, two highest→2,3,
    // next two lowest→4,5 …) turn a rank-sum difference into a SPREAD
    // difference; Wilcoxon moments on the ST ranks give the exact-rational
    // z². Deterministic custkey tie-break; an odd N's middle value takes
    // rank N (the conventional discard-free assignment)
    "q574_siegel_tukey" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .withColumn("st", expr(
          "CASE WHEN 2 * i - 1 = nn THEN nn" +
            " WHEN i <= nn - i + 1 THEN" +
            " CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END" +
            " ELSE CASE WHEN (nn - i + 1) % 2 = 1 THEN 2 * (nn - i + 1)" +
            " ELSE 2 * (nn - i + 1) - 1 END END"))
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("st")).otherwise(0L)).as("w_a"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .select(col("n_a"), col("n_b"), col("w_a"),
          expr(wilcoxonZsqMilli).as("zsq_milli"))
    }),

    // Ansari–Bradley scale test on the same two-sample spend: center-out
    // scores min(i, N+1−i) concentrate small scores at the extremes, so a
    // low group score-sum reads as WIDER dispersion; exact even/odd
    // moments (the N-parity branch scipy uses), all-integer z²
    "q575_ansari_bradley" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .withColumn("ab", least(col("i"), col("nn") - col("i") + 1))
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("ab")).otherwise(0L)).as("a_sum"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .select(col("n_a"), col("n_b"), col("a_sum"),
          expr(abZsqMilli).as("zsq_milli"))
    }),

    // Lepage location-AND-scale test: the sum of the Wilcoxon z² (plain
    // ranks, location) and the Ansari–Bradley z² (center-out ranks,
    // scale) — the standard omnibus for "did the distribution move OR
    // widen". Both components from ONE rank window over the bounded
    // per-customer relation; each exact-rational in milli
    "q576_lepage" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .withColumn("ab", least(col("i"), col("nn") - col("i") + 1))
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("i")).otherwise(0L)).as("w_a"),
          sum(when(col("ga") === 1, col("ab")).otherwise(0L)).as("a_sum"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .withColumn("zw2", expr(wilcoxonZsqMilli))
        .withColumn("zab2", expr(abZsqMilli))
        .select(col("n_a"), col("n_b"),
          col("zw2").as("wilcoxon_zsq_milli"), col("zab2").as("ab_zsq_milli"),
          (col("zw2") + col("zab2")).as("lepage_milli"))
    }),

    // Cucconi location-scale test: squared ranks (U) and squared CONTRARY
    // ranks (V) of group a, combined through their exact correlation
    // ρ = (2(N²−4) − b)/b, b = (2N+1)(8N+11). Rank sums NU/NV are exact
    // longs; only the final quadratic form runs in doubles — in the SAME
    // literal op order as the oracle (q61 discipline), C ≥ 0 so the
    // half-away milli rounding agrees
    "q577_cucconi" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("i") * col("i")).otherwise(0L))
            .as("sr2"),
          sum(when(col("ga") === 1, (col("nn") - col("i") + 1)
            * (col("nn") - col("i") + 1)).otherwise(0L)).as("sc2"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .withColumn("nu", expr("6 * sr2 - n_a * (nn + 1) * (2 * nn + 1)"))
        .withColumn("nv", expr("6 * sc2 - n_a * (nn + 1) * (2 * nn + 1)"))
        .withColumn("bb", expr("(2 * nn + 1) * (8 * nn + 11)"))
        .withColumn("dd", expr("CAST(n_a AS DOUBLE) * n_b * (nn + 1)" +
          " * (2 * nn + 1) * (8 * nn + 11) / 5.0"))
        .withColumn("u2", expr("CAST(nu AS DOUBLE) * nu / dd"))
        .withColumn("v2", expr("CAST(nv AS DOUBLE) * nv / dd"))
        .withColumn("uv", expr("CAST(nu AS DOUBLE) * nv / dd"))
        .withColumn("rho", expr("CAST(2 * (nn * nn - 4) - bb AS DOUBLE) / bb"))
        .select(col("n_a"), col("n_b"), col("nu"), col("nv"),
          expr("CAST(round((u2 + v2 - 2 * rho * uv)" +
            " / (2 * (1 - rho * rho)) * 1000) AS BIGINT)").as("cucconi_milli"))
    }),

    // Quade test (blocked ranks, block-importance weighted): blocks =
    // nations, treatments = order priorities, value = total spend cents.
    // Within-block ranks × the block's RANGE rank give S_ij; doubling
    // (2S = Q(2r − k − 1)) keeps every term integral, and
    // F = (b−1)·ΣT²_j / (b·ΣS²_ij − ΣT²_j) is exact (numerator and
    // denominator both ≥ 0 by Cauchy–Schwarz, so div == //)
    "q578_quade_test" -> ((s, dir) => {
      val vals = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("blk"), col("o_orderpriority").as("trt"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .localCheckpoint(false)
      val inBlk = Window.partitionBy("blk")
      val r = vals
        .withColumn("rr", row_number()
          .over(Window.partitionBy("blk").orderBy("v", "trt")).cast("long"))
        .withColumn("rng", max(col("v")).over(inBlk) - min(col("v")).over(inBlk))
        .withColumn("kk", count(lit(1)).over(inBlk))
      val qw = r.select("blk", "rng").distinct()
        .withColumn("q", row_number().over(Window.orderBy("rng", "blk"))
          .cast("long"))
      val sij = r.join(broadcast(qw.select("blk", "q")), "blk")
        .withColumn("s2", col("q") * (lit(2L) * col("rr") - (col("kk") + 1)))
        .localCheckpoint(false)
      val a2 = sij.agg(sum(expr("s2 * s2").cast(dec38)).as("aa"),
        countDistinct(col("blk")).as("b"), max(col("kk")).as("k"))
      val b2 = sij.groupBy("trt").agg(sum(col("s2")).as("tj"))
        .agg(sum(expr("tj * tj").cast(dec38)).as("bb"))
      a2.crossJoin(broadcast(b2))
        .select(col("b").as("n_blocks"), col("k").as("n_treatments"),
          expr("CAST(1000 * CAST(b - 1 AS DECIMAL(38,0)) * bb" +
            " div (b * aa - bb) AS BIGINT)").as("f_milli"))
    }),

    // Hellinger affinity of each source's lang mix vs the corpus mix:
    // BC = Σ√(p·q) per source, H² = 1 − BC. Per-lang terms quantize to
    // micro via exact isqrt of 1e12·c1·c2 div (n1·ng) — double sqrt seed,
    // one Newton step, ±1 adjust (the q572 chain) — so both engines
    // replay the SAME per-term integers and their sum bit-matches
    "q579_hellinger_sources" -> ((s, dir) =>
      sourceLangGrid(s, dir)
        .withColumn("x", expr("CAST(CAST(1000000000000 AS DECIMAL(38,0))" +
          " * c1 * c2 div (CAST(n1 AS DECIMAL(38,0)) * ng) AS BIGINT)"))
        .withColumn("t0", floor(sqrt(col("x").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + x div t0) div 2 ELSE 0 END"))
        .withColumn("sq", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= x THEN t1 + 1" +
            " WHEN t1 * t1 > x THEN t1 - 1 ELSE t1 END"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_langs"), sum(col("sq")).as("bc_micro"))
        .withColumn("h2_micro", lit(1000000L) - col("bc_micro"))
        .orderBy("source")),

    // total-variation distance of each source's lang mix vs the corpus
    // mix: TV = ½ Σ|p − q| — the common-denominator form
    // Σ|c1·ng − c2·n1| / (2·n1·ng) makes it ONE exact rational per
    // source (no per-term rounding at all, unlike the χ²/Hellinger
    // neighbors); numerator ≥ 0 so div == //
    "q580_tv_distance" -> ((s, dir) =>
      sourceLangGrid(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_langs"), max(col("n1")).as("n_docs"),
          sum(abs(col("c1") * col("ng") - col("c2") * col("n1")).cast(dec38))
            .as("sad"),
          max(col("ng")).as("ng"))
        .select(col("source"), col("n_langs"), col("n_docs"),
          expr("CAST(1000000 * sad div (2 * CAST(n_docs AS DECIMAL(38,0)) * ng)" +
            " AS BIGINT)").as("tv_micro"))
        .orderBy("source")),

    // Pearson χ² divergence of each source's lang mix from the corpus
    // mix: Σ (p−q)²/q = Σ (c1·ng − c2·n1)² / (n1²·ng·c2), per-lang
    // micro-quantized then summed (per-stratum quantization, the q572
    // discipline — deterministic on both engines; q is the GLOBAL mix so
    // every denominator is nonzero by construction)
    "q581_chi2_divergence" -> ((s, dir) =>
      sourceLangGrid(s, dir)
        .withColumn("term", expr(
          "CAST(1000000 * CAST(c1 * ng - c2 * n1 AS DECIMAL(38,0))" +
            " * (c1 * ng - c2 * n1)" +
            " div (CAST(n1 AS DECIMAL(38,0)) * n1 * ng * c2) AS BIGINT)"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_langs"), sum(col("term")).as("chi2_micro"))
        .orderBy("source")),

    // Good–Turing frequency-of-frequencies over word BIGRAMS (the unigram
    // vocab here is saturated — every word repeats; bigrams carry the
    // long tail GT exists for): N_r = #distinct bigrams seen exactly r
    // times, smoothed count r* = (r+1)·N_{r+1}/N_r for the 10 rarest
    // observed r (rank head, not r ≤ 10 — robust to a shifted tail; a
    // non-consecutive successor reads 0, the honest "no estimate").
    // Bigrams pair via a per-doc lead window (partitioned, scalable); the
    // GT lead runs over the BOUNDED distinct-r relation
    "q582_good_turing" -> ((s, dir) => {
      val nr = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("nw", lead(col("w"), 1)
          .over(Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("nw").isNotNull)
        .select(concat(col("w"), lit(" "), col("nw")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("r"))
        .groupBy("r").agg(count(lit(1)).as("n_r"))
      nr.withColumn("next_r", lead(col("r"), 1).over(Window.orderBy("r")))
        .withColumn("next_n", lead(col("n_r"), 1).over(Window.orderBy("r")))
        .withColumn("rk", row_number().over(Window.orderBy("r")))
        .filter(col("rk") <= 10)
        .select(col("r"), col("n_r"),
          when(col("next_r") === col("r") + 1,
            expr("1000 * (r + 1) * next_n div n_r")).otherwise(lit(0L))
            .as("rstar_milli"))
        .orderBy("r")
    }),

    // Goodman–Kruskal gamma between a customer's balance quartile and
    // spend quartile: concordant/discordant pair counts from the 4×4
    // contingency table (16 cells → a 256-row broadcast self-join, never
    // the n² customer pairs); deterministic ntile tie-break by custkey,
    // gamma = (C−D)/(C+D) exact in milli (both engines truncate the
    // signed quotient toward zero)
    "q583_gk_gamma" -> ((s, dir) => {
      val sp = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("spend"))
      val qt = Tables.customer(s, dir)
        .select(col("c_custkey"), centsOf(col("c_acctbal")).as("ab"))
        .join(sp, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("ab"), col("spend"))
        .withColumn("qa", ntile(4).over(Window.orderBy("ab", "c_custkey"))
          .cast("long"))
        .withColumn("qs", ntile(4).over(Window.orderBy("spend", "c_custkey"))
          .cast("long"))
      val cells = qt.groupBy("qa", "qs").agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val other = cells.select(col("qa").as("qa2"), col("qs").as("qs2"),
        col("n").as("n2"))
      cells.crossJoin(broadcast(other))
        .agg(
          sum(when(col("qa2") > col("qa") && col("qs2") > col("qs"),
            (col("n") * col("n2")).cast(dec38)).otherwise(lit(0).cast(dec38)))
            .as("c_pairs"),
          sum(when(col("qa2") > col("qa") && col("qs2") < col("qs"),
            (col("n") * col("n2")).cast(dec38)).otherwise(lit(0).cast(dec38)))
            .as("d_pairs"))
        .select(col("c_pairs").cast("long").as("concordant"),
          col("d_pairs").cast("long").as("discordant"),
          expr("CAST(1000 * (c_pairs - d_pairs) div (c_pairs + d_pairs)" +
            " AS BIGINT)").as("gamma_milli"))
    }),

    // Nelson–Aalen cumulative hazard over customer lifetimes (q572's
    // risk-set machinery, estimator instead of test): H(t) = Σ_{tᵢ≤t}
    // dᵢ/nᵢ with nᵢ the reverse-cumulative risk set — per-event micro
    // quantization then a running sum, both windows over the BOUNDED
    // distinct-lifetime relation
    "q584_nelson_aalen" -> ((s, dir) => {
      val life = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
          .cast("long").as("t"))
      val et = life.groupBy("t").agg(count(lit(1)).as("d"))
      val after = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val upTo = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      et.withColumn("n_risk", sum(col("d")).over(after))
        .withColumn("term", expr("1000000 * d div n_risk"))
        .withColumn("na_micro", sum(col("term")).over(upTo))
        .select(col("t"), col("d"), col("n_risk"), col("na_micro"))
        .orderBy("t")
    }),

    // Chow structural-break test on daily mean order value at the pinned
    // 1998-04-01 break: F = ((SSR_pooled − SSR₁ − SSR₂)/k) /
    // ((SSR₁+SSR₂)/(n−2k)), k = 2 — all three SSRs from the exact
    // closed form (no per-row residuals), milli scale cancels in the
    // ratio. Numerator ≥ 0 (pooled SSR dominates the split fits)
    "q585_chow_test" -> ((s, dir) => {
      val rows = dailyMeanSpend(s, dir).localCheckpoint(false)
      val break_ = datediff(to_date(lit("1998-04-01")),
        to_date(lit("1995-01-01")))
      val seg = olsSsrMilli(rows, when(col("x") < break_, 1L).otherwise(2L))
      val pool = olsSsrMilli(rows, lit(0L))
        .select(col("n").as("n_days"), col("ssr").as("ssrp"))
      seg.agg(
          min(when(col("g") === 1, col("n"))).as("n_pre"),
          min(when(col("g") === 2, col("n"))).as("n_post"),
          min(when(col("g") === 1, col("ssr"))).as("ssr1"),
          min(when(col("g") === 2, col("ssr"))).as("ssr2"))
        .crossJoin(broadcast(pool))
        .select(col("n_days"), col("n_pre"), col("n_post"),
          col("ssrp").as("ssr_pooled"),
          expr("CAST(1000 * CAST(ssrp - ssr1 - ssr2 AS DECIMAL(38,0))" +
            " * (n_days - 4) div (2 * CAST(ssr1 + ssr2 AS DECIMAL(38,0)))" +
            " AS BIGINT)").as("f_milli"))
    }),

    // Goldfeld–Quandt heteroskedasticity test on the same daily-mean
    // regression: fit OLS separately on the first and last x-tercile
    // (middle third dropped, the classic design) and ratio the
    // df-adjusted SSRs — variance growing with x shows as GQ ≫ 1. Exact
    // rational; tercile by deterministic ntile over unique days
    "q586_goldfeld_quandt" -> ((s, dir) => {
      val rows = dailyMeanSpend(s, dir)
        .withColumn("trc", ntile(3).over(Window.orderBy("x")).cast("long"))
        .filter(col("trc") =!= 2)
      olsSsrMilli(rows, col("trc"))
        .agg(
          min(when(col("g") === 1, col("n"))).as("n_low"),
          min(when(col("g") === 3, col("n"))).as("n_high"),
          min(when(col("g") === 1, col("ssr"))).as("ssr_low"),
          min(when(col("g") === 3, col("ssr"))).as("ssr_high"))
        .select(col("n_low"), col("n_high"), col("ssr_low"),
          col("ssr_high"),
          expr("CAST(1000 * CAST(ssr_high AS DECIMAL(38,0))" +
            " * (n_low - 2) div (CAST(ssr_low AS DECIMAL(38,0))" +
            " * (n_high - 2)) AS BIGINT)").as("gq_milli"))
    }),

    // Murphy/Brier decomposition of a segment-rate urgency forecast:
    // p(segment) = URGENT rate in the pre-1998 train window (ppm),
    // evaluated on the 1998+ test window — reliability (calibration
    // drift), resolution (discrimination), uncertainty (base-rate
    // entropy), each Σ n_k(·)²/(n·1e6) over the 5 forecast bins, all
    // integer ppm/micro arithmetic
    "q587_brier_decomposition" -> ((s, dir) => {
      val seg = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, dir)
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("sg"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("yy"),
          (col("o_orderdate") < to_date(lit("1998-01-01"))).as("is_train"))
        .localCheckpoint(false)
      val p = o.filter(col("is_train"))
        .groupBy("sg")
        .agg(expr("1000000 * sum(yy) div count(1)").as("p_ppm"))
      val k = o.filter(!col("is_train"))
        .groupBy("sg")
        .agg(count(lit(1)).as("nk"), sum(col("yy")).as("uk"))
        .withColumn("o_ppm", expr("1000000 * uk div nk"))
        .join(broadcast(p), "sg")
      val tot = k.agg(sum(col("nk")).as("n"), sum(col("uk")).as("u"))
        .withColumn("obar", expr("1000000 * u div n"))
      k.crossJoin(broadcast(tot))
        .agg(max(col("n")).as("n_test"), max(col("obar")).as("obar"),
          sum(expr("nk * CAST(p_ppm - o_ppm AS DECIMAL(38,0))" +
            " * (p_ppm - o_ppm)")).as("srel"),
          sum(expr("nk * CAST(o_ppm - obar AS DECIMAL(38,0))" +
            " * (o_ppm - obar)")).as("sres"))
        .select(col("n_test"),
          expr("CAST(srel div (CAST(n_test AS DECIMAL(38,0)) * 1000000)" +
            " AS BIGINT)").as("rel_micro"),
          expr("CAST(sres div (CAST(n_test AS DECIMAL(38,0)) * 1000000)" +
            " AS BIGINT)").as("res_micro"),
          expr("obar * (1000000 - obar) div 1000000").as("unc_micro"))
    }),

    // Lorenz curve in deciles over per-customer spend: cumulative spend
    // share (ppm) at each population decile — the curve q204's Gini
    // integrates; deterministic ntile, running sum over the 10-row
    // decile relation only
    "q588_lorenz_deciles" -> ((s, dir) => {
      val sp = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .withColumn("dec", ntile(10).over(Window.orderBy("v", "o_custkey"))
          .cast("long"))
      sp.groupBy("dec")
        .agg(count(lit(1)).as("n_cust"), sum(col("v")).as("sv"))
        .withColumn("cum", sum(col("sv")).over(Window.orderBy("dec")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum(col("sv")).over(Window.partitionBy()))
        .select(col("dec").as("decile"), col("n_cust"),
          expr("CAST(1000000 * CAST(cum AS DECIMAL(38,0)) div tot" +
            " AS BIGINT)").as("cum_share_ppm"))
        .orderBy("decile")
    }),

    // discounted customer-lifetime value per segment: yearly revenue
    // discounted at 10%/yr with PINNED 0.9^k milli constants (k ≤ 6, the
    // data's year span) — no pow(), so both engines replay the same
    // integers; the ppm gap between nominal and discounted reads as
    // revenue-recency: segments earning late lose more
    "q589_clv_discounted" -> ((s, dir) => {
      val dk = "CASE yk WHEN 0 THEN 1000 WHEN 1 THEN 900 WHEN 2 THEN 810" +
        " WHEN 3 THEN 729 WHEN 4 THEN 656 WHEN 5 THEN 590 ELSE 531 END"
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("c_custkey"),
          (year(col("o_orderdate")) - 1995).cast("long").as("yk"),
          centsOf(col("o_totalprice")).as("v"))
        .withColumn("dv", expr(s"v * ($dk) div 1000"))
        .groupBy("segment")
        .agg(countDistinct(col("c_custkey")).as("n_customers"),
          sum(col("v")).as("nominal_cents"),
          sum(col("dv")).as("clv_cents"))
        .withColumn("discount_loss_ppm", expr(
          "CAST(1000000 * CAST(nominal_cents - clv_cents AS DECIMAL(38,0))" +
            " div nominal_cents AS BIGINT)"))
        .orderBy("segment")
    }),

    // nation trade-graph eccentricity: undirected edge where a supplier
    // nation ↔ customer nation pair's revenue exceeds the PAIR MEAN
    // (thins the near-complete graph without a median window), then four
    // fixed min-plus relaxation rounds — enough for these diameters, and
    // a shape the oracle mirrors as a plain CTE chain instead of a
    // recursive fixpoint. The heavy work is ONE lineitem⋈orders join;
    // the graph itself is bounded by |nation|²
    "q590_eccentricity" -> ((s, dir) => {
      val ed = nationTradeEdges(s, dir).localCheckpoint(false)
      val nodes = ed.select(col("a").as("n")).distinct()
      val d0 = nodes.select(col("n").as("src"), col("n").as("dst"),
        lit(0L).as("d"))
        .union(ed.select(col("a").as("src"), col("b").as("dst"),
          lit(1L).as("d")))
      def relax(d: DataFrame): DataFrame = {
        val ext = d.join(ed.select(col("a").as("dst"), col("b").as("nx")),
            "dst")
          .select(col("src"), col("nx").as("dst"), (col("d") + 1).as("d"))
        d.union(ext).groupBy("src", "dst").agg(min(col("d")).as("d"))
          .localCheckpoint(false)
      }
      val dist = relax(relax(relax(relax(d0))))
      dist.groupBy("src")
        .agg(count(lit(1)).as("n_reached"), max(col("d")).as("ecc"))
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
          col("src") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n_reached"), col("ecc"))
        .orderBy("nation")
    }),

    // leveled-LSM write-amplification planner per source: levels from a
    // pinned 4 MiB memtable and size ratio 10 (CASE ladder over powers —
    // no logarithms), WA ≈ 1 + T·(L−1), read-amp = L — which sources'
    // corpora would sit deep in the tree and what ingest costs (the
    // q369/q397 storage-planning family, compaction view)
    "q591_lsm_write_amp" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("text")).cast("long")).as("bytes"))
        .withColumn("levels", expr(
          "CASE WHEN bytes <= 4194304 THEN 1" +
            " WHEN bytes <= 41943040 THEN 2" +
            " WHEN bytes <= 419430400 THEN 3" +
            " WHEN bytes <= 4194304000 THEN 4" +
            " WHEN bytes <= 41943040000 THEN 5" +
            " WHEN bytes <= 419430400000 THEN 6 ELSE 7 END"))
        .select(col("source"), col("n_docs"), col("bytes"),
          col("levels").cast("long").as("levels"),
          expr("CAST(1 + 10 * (levels - 1) AS BIGINT)").as("write_amp"),
          col("levels").cast("long").as("read_amp"))
        .orderBy("source")
    }),

    // Matthews correlation of the q587 segment-rate urgency classifier
    // (predict URGENT where the segment's train rate beats the global
    // train rate): confusion counts on the test window, MCC denominator
    // via the exact isqrt chain over the decimal product — mcc in milli,
    // signed quotient truncates toward zero on both engines
    "q592_mcc" -> ((s, dir) => {
      val seg = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, dir)
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("sg"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("yy"),
          (col("o_orderdate") < to_date(lit("1998-01-01"))).as("is_train"))
        .localCheckpoint(false)
      val tr = o.filter(col("is_train"))
      val p = tr.groupBy("sg")
        .agg(sum(col("yy")).as("uk"), count(lit(1)).as("nk"))
      val gl = tr.agg(sum(col("yy")).as("ug"), count(lit(1)).as("ng"))
      val pred = p.crossJoin(broadcast(gl))
        .select(col("sg"),
          expr("CAST(CASE WHEN uk * ng > ug * nk THEN 1 ELSE 0 END" +
            " AS BIGINT)").as("ph"))
      val cm = o.filter(!col("is_train"))
        .join(broadcast(pred), "sg")
        .agg(sum(expr("CASE WHEN ph = 1 AND yy = 1 THEN 1 ELSE 0 END"))
            .as("tp"),
          sum(expr("CASE WHEN ph = 1 AND yy = 0 THEN 1 ELSE 0 END")).as("fp"),
          sum(expr("CASE WHEN ph = 0 AND yy = 0 THEN 1 ELSE 0 END")).as("tn"),
          sum(expr("CASE WHEN ph = 0 AND yy = 1 THEN 1 ELSE 0 END")).as("fn"))
      cm.withColumn("d2", expr(
          "CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn) * (tn + fp) * (tn + fn)"))
        .withColumn("t0", floor(sqrt(col("d2").cast("double"))).cast(dec38))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + d2 div t0) div 2 ELSE CAST(0 AS DECIMAL(38,0)) END"))
        .withColumn("sq", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= d2 THEN t1 + 1" +
            " WHEN t1 * t1 > d2 THEN t1 - 1 ELSE t1 END"))
        .select(col("tp"), col("fp"), col("tn"), col("fn"),
          expr("CAST(1000 * (CAST(tp AS DECIMAL(38,0)) * tn" +
            " - CAST(fp AS DECIMAL(38,0)) * fn) div sq AS BIGINT)")
            .as("mcc_milli"))
    }),

    // average precision (PR-AUC proxy) of account balance predicting a
    // top-quartile spender: AP = mean over positives of P@k down the
    // ranked list — P@k micro-quantized per cut (deterministic), both
    // cumsum windows over the BOUNDED per-customer relation
    "q593_average_precision" -> ((s, dir) => {
      val sp = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("spend"))
      val scored = Tables.customer(s, dir)
        .select(col("c_custkey"), centsOf(col("c_acctbal")).as("ab"))
        .join(sp, col("c_custkey") === col("o_custkey"))
        .withColumn("rel",
          (ntile(4).over(Window.orderBy("spend", "c_custkey")) === 4)
            .cast("long"))
        .withColumn("k", row_number()
          .over(Window.orderBy(col("ab").desc, col("c_custkey"))).cast("long"))
        .withColumn("tp", sum(col("rel")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      scored.agg(count(lit(1)).as("n"), sum(col("rel")).as("n_pos"),
          sum(when(col("rel") === 1, expr("1000000 * tp div k"))
            .otherwise(0L)).as("sump"))
        .select(col("n"), col("n_pos"),
          expr("sump div n_pos").as("ap_micro"))
    }),

    // Theil–Sen robust slope of monthly revenue: the median of all
    // pairwise slopes — insensitive to the outlier months OLS chases.
    // The month relation is BOUNDED (~80 rows), so the pair join is a
    // few-thousand-row broadcast product, never corpus-scale; slopes
    // micro-quantized (signed div truncates the same both engines),
    // median = mean of the two middle ranks (q570's m2 idiom)
    "q594_theil_sen" -> ((s, dir) => {
      val m = Tables.orders(s, dir)
        .groupBy(((year(col("o_orderdate")) - 1995) * 12
          + month(col("o_orderdate")) - 1).cast("long").as("mo"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
        .localCheckpoint(false)
      val pairs = m.crossJoin(broadcast(
          m.select(col("mo").as("mo2"), col("rev").as("rev2"))))
        .filter(col("mo") < col("mo2"))
        .select(expr("1000000 * (rev2 - rev) div (mo2 - mo)").as("sl"),
          col("mo"), col("mo2"))
      pairs
        .withColumn("rk", row_number()
          .over(Window.orderBy("sl", "mo", "mo2")))
        .withColumn("np", count(lit(1)).over(Window.partitionBy()))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("rk") === expr("(np + 1) div 2"), col("sl"))).as("lo"),
          sum(when(col("rk") === expr("(np + 2) div 2"), col("sl"))).as("hi"))
        .select(col("n_pairs"),
          expr("(lo + hi) div 2").as("theil_sen_micro"))
    }),

    // distinct-n diversity per source: unique-unigram and unique-bigram
    // ratios over the source's whole token stream (the corpus-diversity
    // readout generation-eval calls distinct-1/distinct-2). Bigrams pair
    // via the per-doc lead window (q582's shape); distincts are exact
    "q595_distinct_n" -> ((s, dir) => {
      val w = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("source"), col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val uni = w.groupBy("source")
        .agg(count(lit(1)).as("n_uni"), countDistinct(col("w")).as("d_uni"))
      val bi = w.withColumn("nw", lead(col("w"), 1)
          .over(Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("nw").isNotNull)
        .select(col("source"), concat(col("w"), lit(" "), col("nw")).as("b"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bi"), countDistinct(col("b")).as("d_bi"))
      uni.join(bi, Seq("source"))
        .select(col("source"), col("n_uni"), col("d_uni"),
          expr("1000000 * d_uni div n_uni").as("distinct1_ppm"),
          col("n_bi"), col("d_bi"),
          expr("1000000 * d_bi div n_bi").as("distinct2_ppm"))
        .orderBy("source")
    }),

    // T5 span-corruption batch planner: per doc, mask budget = 15% of
    // tokens (half-away rounding), mean span 3 → sentinel count; encoder
    // keeps n−mask+spans tokens, decoder emits mask+spans+1 — the
    // sequence-length ledger that sizes a denoising pretraining batch,
    // rolled up per source with the sentinel overhead in ppm
    "q596_span_corruption" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .withColumn("nm", expr("(nt * 15 + 50) div 100"))
        .withColumn("ns", expr(
          "CASE WHEN nm = 0 THEN 0 ELSE greatest(1, (nm + 1) div 3) END"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("raw_tokens"),
          sum(expr("nt - nm + ns")).as("encoder_tokens"),
          sum(expr("nm + ns + 1")).as("decoder_tokens"))
        .withColumn("overhead_ppm", expr(
          "1000000 * (encoder_tokens + decoder_tokens - raw_tokens)" +
            " div raw_tokens"))
        .orderBy("source")),

    // actuarial life table over customer lifetimes in 30-day bands:
    // deaths, risk set at band start (reverse cumsum), interval death
    // probability qx, and survival lx as the EMPIRICAL risk-set share —
    // with no censoring in this data the product-limit and empirical
    // forms coincide, so no running product is needed (q584's sibling)
    "q597_life_table" -> ((s, dir) => {
      val life = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
          .cast("long").as("t"))
      val bands = life.groupBy(expr("t div 30").as("band"))
        .agg(count(lit(1)).as("d"))
      val after = Window.orderBy("band")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      bands.withColumn("n_risk", sum(col("d")).over(after))
        .withColumn("total", sum(col("d")).over(Window.partitionBy()))
        .select(col("band"), col("d"), col("n_risk"),
          expr("1000000 * d div n_risk").as("qx_micro"),
          expr("1000000 * n_risk div total").as("lx_ppm"))
        .orderBy("band")
    }),

    // shard rebalancing plan: docs hash into 16 shards (q410's md5
    // uniform); the balanced target is ⌈n/16⌉ for (n mod 16) shards and
    // ⌊n/16⌋ for the rest, caps assigned to the LARGEST shards first
    // (min-move matching, deterministic by (count desc, shard)); moves =
    // Σ max(0, count − cap) — the exact migration volume a rebalance
    // would ship
    "q598_shard_rebalance" -> ((s, dir) => {
      val sh = Tables.documents(s, dir)
        .select(Dedup.md5Long(concat(lit("shard#"),
          col("doc_id").cast("string")), 12).as("h"))
        .groupBy(expr("h % 16").as("shard"))
        .agg(count(lit(1)).as("cnt"))
      sh.withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("cnt").desc, col("shard"))).cast("long"))
        .withColumn("cap", expr(
          "CASE WHEN rk <= n % 16 THEN n div 16 + 1 ELSE n div 16 END"))
        .agg(max(col("n")).as("n_docs"), count(lit(1)).as("n_shards"),
          max(col("cnt")).as("max_shard"), min(col("cnt")).as("min_shard"),
          sum(greatest(col("cnt") - col("cap"), lit(0L))).as("moves"))
        .withColumn("moves_ppm", expr("1000000 * moves div n_docs"))
    }),

    // decision-stump Gini audit: which single feature (market segment vs
    // customer nation) splits URGENT orders best — weighted post-split
    // Gini Σ_v 2·u_v(n_v−u_v)/(n_v·n) vs the root impurity, per-value
    // micro quantization (q572 discipline); the feature-selection readout
    // a tree/GBM pipeline derives its first split from
    "q599_split_gini" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("c_nationkey").cast("string").as("nat"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("yy"))
        .localCheckpoint(false)
      val tot = o.agg(count(lit(1)).as("n"), sum(col("yy")).as("u"))
      def forFeature(fcol: String, fname: String): DataFrame =
        o.groupBy(col(fcol).as("v"))
          .agg(count(lit(1)).as("nv"), sum(col("yy")).as("uv"))
          .crossJoin(broadcast(tot))
          .withColumn("term", expr(
            "CAST(2000000 * CAST(uv AS DECIMAL(38,0)) * (nv - uv)" +
              " div (CAST(nv AS DECIMAL(38,0)) * n) AS BIGINT)"))
          .agg(count(lit(1)).as("n_values"),
            sum(col("term")).as("split_gini_micro"),
            max(expr("CAST(2000000 * CAST(u AS DECIMAL(38,0)) * (n - u)" +
              " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
              .as("root_gini_micro"))
          .select(lit(fname).as("feature"), col("n_values"),
            col("root_gini_micro"), col("split_gini_micro"),
            (col("root_gini_micro") - col("split_gini_micro"))
              .as("gain_micro"))
      forFeature("seg", "mktsegment").unionByName(forFeature("nat", "nation"))
        .orderBy("feature")
    }),

    // centroid silhouette of the IVF bucketing (q549/q550's third lens):
    // per vector, a² = squared distance to the OWN centroid, b² = to the
    // nearest OTHER — s = (b²−a²)/max(a²,b²) in micro, the squared-
    // distance silhouette variant that needs no sqrt and no pair scan
    // (8 broadcast centroids per vector, never vector×vector)
    "q600_silhouette" -> ((s, dir) => {
      val qv = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"),
          posexplode(col("emb_d").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("bucket"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val cent = qv.groupBy("bucket", "pos")
        .agg(expr("sum(qv) div count(1)").as("cq"))
        .select(col("bucket").as("cb"), col("pos"), col("cq"))
      val d2 = qv.join(broadcast(cent), "pos")
        .groupBy("vec_id", "bucket", "cb")
        .agg(sum(expr("(qv - cq) * (qv - cq)")).as("d2"))
      val ab = d2.groupBy("vec_id", "bucket")
        .agg(min(when(col("cb") === col("bucket"), col("d2"))).as("a2"),
          min(when(col("cb") =!= col("bucket"), col("d2"))).as("b2"))
        .filter(greatest(col("a2"), col("b2")) > 0)
        .withColumn("sm", expr(
          "1000000 * (b2 - a2) div greatest(a2, b2)"))
      ab.groupBy("bucket")
        .agg(count(lit(1)).as("n_vectors"),
          expr("sum(sm) div count(1)").as("mean_sil_micro"))
        .orderBy("bucket")
    }),

    // synchronous label propagation on the thinned nation trade graph:
    // four fixed rounds of "adopt the modal neighbor label" (self vote
    // included; ties → smallest label) — the cheap community detector
    // beside q264's modularity readout. Fixed rounds keep the oracle a
    // plain CTE chain; labels are node ids so the output is reproducible
    "q601_label_propagation" -> ((s, dir) => {
      val ed = nationTradeEdges(s, dir).localCheckpoint(false)
      var l = ed.select(col("a").as("n")).distinct()
        .select(col("n"), col("n").as("lbl"))
      for (_ <- 1 to 4) {
        val votes = ed.join(l.select(col("n").as("b2"), col("lbl")),
            col("b") === col("b2"))
          .select(col("a").as("n"), col("lbl"))
          .union(l)
          .groupBy("n", "lbl").agg(count(lit(1)).as("c"))
        l = votes.groupBy("n")
          .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("n"), (-col("m.nl")).as("lbl"))
          .localCheckpoint(false)
      }
      l.groupBy(col("lbl").cast("long").as("community"))
        .agg(count(lit(1)).as("size"))
        .orderBy("community")
    }),

    // region mixing assortativity: the directed supplier-region →
    // customer-region revenue matrix, Newman's attribute assortativity
    // r = (Σe_ii − Σa_i·b_i)/(1 − Σa_i·b_i) as ONE exact rational over
    // the common denominator W² — does trade stay within regions (r > 0)
    // or cross them. The matrix is |region|², built from one fact pass
    "q602_region_mixing" -> ((s, dir) => {
      val natReg = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey"))
      val w = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(natReg.select(col("n_nationkey").as("sn"),
          col("n_regionkey").as("ri"))), col("s_nationkey") === col("sn"))
        .join(broadcast(natReg.select(col("n_nationkey").as("cn"),
          col("n_regionkey").as("rj"))), col("c_nationkey") === col("cn"))
        .groupBy("ri", "rj")
        .agg(sum(centsOf(col("l_extendedprice"))).as("w"))
        .localCheckpoint(false)
      val rs = w.groupBy("ri").agg(sum(col("w")).as("rw"))
      val cs = w.groupBy("rj").agg(sum(col("w")).as("cw"))
      val sprod = rs.join(cs, col("ri") === col("rj"))
        .agg(sum(expr("CAST(rw AS DECIMAL(38,0)) * cw")).as("sprod"))
      w.agg(sum(col("w").cast(dec38)).as("tw"),
          sum(when(col("ri") === col("rj"), col("w")).otherwise(0L))
            .as("diag"))
        .crossJoin(broadcast(sprod))
        .select(col("tw").cast("long").as("total_cents"),
          col("diag").as("intra_cents"),
          expr("CAST(1000 * (tw * CAST(diag AS DECIMAL(38,0)) - sprod)" +
            " div (tw * tw - sprod) AS BIGINT)").as("assort_milli"))
    }),

    // bond-percolation sweep on the weighted nation trade graph: keep the
    // top (4−k)/4 of edges by revenue RANK (k = 1..3 — value thresholds
    // would tie-break unpredictably), exact connected components per
    // threshold, and the giant-component share of all nations — where
    // the trade network fragments as weak links drop
    "q603_percolation_sweep" -> ((s, dir) => {
      val rev = nationTradeRev(s, dir)
        .withColumn("rk", row_number().over(Window.orderBy("w", "a", "b"))
          .cast("long"))
        .withColumn("np", count(lit(1)).over(Window.partitionBy()))
        .localCheckpoint(false)
      val nNations = Tables.nation(s, dir).count()
      val parts = (1 to 3).map { k =>
        val edges = rev.filter(expr(s"rk > $k * np div 4")).select("a", "b")
        val nEdges = edges.count()
        graft.operators.ConnectedComponents.labels(edges, "a", "b")
          .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_components"),
            sum(col("sz")).as("n_connected"), max(col("sz")).as("giant"))
          .select(lit(k.toLong).as("quartile"), lit(nEdges).as("n_edges"),
            col("n_components"), col("n_connected"),
            col("giant").as("giant_size"),
            expr(s"1000000 * giant div ${nNations}L").as("giant_frac_ppm"))
      }
      parts.reduce(_.unionByName(_)).orderBy("quartile")
    }),

    // Borda rank aggregation: each market segment "votes" a brand ranking
    // by its revenue (deterministic rank), top-10 get points 10..1; the
    // aggregate ranking is the consensus preference — ordinal vote fusion
    // beside q541's cardinal Bradley–Terry. One fact pass; everything
    // downstream is |segment|·|brand| rows
    "q604_borda_brands" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("p_brand").as("brand"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("rev"))
      rev.withColumn("rk", row_number().over(Window.partitionBy("seg")
          .orderBy(col("rev").desc, col("brand"))).cast("long"))
        .withColumn("pts", greatest(lit(11L) - col("rk"), lit(0L)))
        .groupBy("brand")
        .agg(sum(col("pts")).as("borda_points"),
          sum(when(col("rk") <= 10, 1L).otherwise(0L)).as("n_ballots"))
        .filter(col("borda_points") > 0)
        .orderBy(col("borda_points").desc, col("brand"))
    }),

    // MAUVE-proxy: per embedding LABEL, the Jensen–Shannon divergence
    // between the label's IVF-bucket histogram and the global one — the
    // cluster-histogram divergence MAUVE builds its curve from, over the
    // exact 8-bucket assignment. Per-bucket pinned-ln micro terms (q573
    // discipline) over a zero-filled label×bucket grid
    "q605_mauve_proxy" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"))
        .join(Tables.embeddings(s, dir).filter(col("label").isNotNull)
          .select(col("vec_id").as("vid2"), col("label")),
          col("vec_id") === col("vid2"))
        .select(col("label").cast("long").as("label"), col("bucket"))
        .localCheckpoint(false)
      val c = asg.groupBy("label", "bucket").agg(count(lit(1)).as("craw"))
      val nl = c.groupBy("label").agg(sum(col("craw")).as("n"))
      val g = c.groupBy("bucket").agg(sum(col("craw")).as("gc"))
      val ng = c.agg(sum(col("craw")).as("ntot"))
      val grid = nl.crossJoin(broadcast(g)).crossJoin(broadcast(ng))
        .join(c, Seq("label", "bucket"), "left")
        .select(col("label"), col("bucket"),
          coalesce(col("craw"), lit(0L)).as("c"),
          col("n"), col("gc"), col("ntot"))
      grid
        .withColumn("t1", expr(
          "CASE WHEN c = 0 THEN 0 ELSE c * CAST(round(ln(" +
            "CAST(2 * c * ntot AS DOUBLE) / (c * ntot + gc * n)) * 1000000)" +
            " AS BIGINT) div n END"))
        .withColumn("t2", expr(
          "gc * CAST(round(ln(CAST(2 * gc * n AS DOUBLE)" +
            " / (c * ntot + gc * n)) * 1000000) AS BIGINT) div ntot"))
        .groupBy("label")
        .agg(max(col("n")).as("n_vecs"),
          expr("(sum(t1) + sum(t2)) div 2").as("jsd_micro"))
        .orderBy("label")
    }),

    // Hopkins clusterability statistic: m = 64 md5-chosen corpus vectors'
    // nearest-neighbor distances (W) vs 64 md5-synthesized uniform points
    // in the per-dim quantized bounding box (U); H = ΣU/(ΣU+ΣW) → 1 when
    // the corpus clusters, ½ when it's itself uniform. Everything is
    // bounded m·|N| squared-distance pairs — exact integers, and the
    // pseudo-uniform refs replay from md5 on both engines
    "q606_hopkins" -> ((s, dir) => {
      val qv = Tables.embeddings(s, dir)
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val ids = qv.select("vec_id").distinct()
        .withColumn("h", Dedup.md5Long(concat(lit("hop#"),
          col("vec_id").cast("string")), 12))
        .withColumn("rk", row_number().over(Window.orderBy("h", "vec_id")))
        .filter(col("rk") <= 64)
        .select(col("vec_id").as("sid"))
      val sampleQ = qv.join(broadcast(ids), col("vec_id") === col("sid"))
        .select(col("sid"), col("pos"), col("qv").as("sq"))
      val w = sampleQ.join(qv.withColumnRenamed("vec_id", "oid"), "pos")
        .filter(col("oid") =!= col("sid"))
        .groupBy("sid", "oid")
        .agg(sum(expr("(sq - qv) * (sq - qv)")).as("d2"))
        .groupBy("sid").agg(min(col("d2")).as("nn2"))
        .agg(sum(col("nn2")).as("sum_w"), count(lit(1)).as("m"))
      val dims = qv.groupBy("pos")
        .agg(min(col("qv")).as("lo"), max(col("qv")).as("hi"))
      val refs = s.range(64).toDF("r")
        .crossJoin(broadcast(dims))
        .select(col("r"), col("pos"),
          (col("lo") + Dedup.md5Long(concat(lit("hopu#"),
            col("r").cast("string"), lit("#"), col("pos").cast("string")), 12)
            % (col("hi") - col("lo") + 1)).as("uq"))
      val u = refs.join(qv, "pos")
        .groupBy("r", "vec_id")
        .agg(sum(expr("(uq - qv) * (uq - qv)")).as("d2"))
        .groupBy("r").agg(min(col("d2")).as("nn2"))
        .agg(sum(col("nn2")).as("sum_u"))
      w.crossJoin(broadcast(u))
        .select(col("m"), col("sum_u"), col("sum_w"),
          expr("CAST(1000000 * CAST(sum_u AS DECIMAL(38,0))" +
            " div (CAST(sum_u AS DECIMAL(38,0)) + sum_w) AS BIGINT)")
            .as("hopkins_micro"))
    }),

    // order-backlog aging at the data's horizon: non-finished orders
    // bucketed by 180-day age bands (capped at 5) per status — the
    // open-work ledger an ops review reads; cutoff = max order date so
    // the query is reproducible at any SF
    "q607_backlog_aging" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("cutoff", max(col("o_orderdate"))
          .over(Window.partitionBy()))
        .filter(col("o_orderstatus") =!= "F")
        .select(col("o_orderstatus").as("status"),
          datediff(col("cutoff"), col("o_orderdate")).cast("long").as("age"),
          centsOf(col("o_totalprice")).as("v"))
        .groupBy(col("status"), least(expr("age div 180"), lit(5L)).as("band"))
        .agg(count(lit(1)).as("n_orders"), sum(col("v")).as("value_cents"))
        .orderBy("status", "band")),

    // autoscaling headroom: hourly event arrival rates → mean, exact-rank
    // p95 hour, replicas at 1000 events/hour capacity (ceil), and the
    // burst ratio — the capacity-planning readout beside q513's queueing
    // delay. The hour relation is bounded by the time span, never |events|
    "q608_autoscaling" -> ((s, dir) => {
      val hours = Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
      hours
        .withColumn("rk", row_number().over(Window.orderBy("cnt", "h"))
          .cast("long"))
        .withColumn("nh", count(lit(1)).over(Window.partitionBy()))
        .agg(max(col("nh")).as("n_hours"),
          expr("sum(cnt) div count(1)").as("mean_per_hour"),
          max(when(col("rk") === expr("(19 * nh + 19) div 20"), col("cnt")))
            .as("p95_per_hour"))
        .select(col("n_hours"), col("mean_per_hour"), col("p95_per_hour"),
          expr("(p95_per_hour + 999) div 1000").as("replicas"),
          expr("1000000 * p95_per_hour div mean_per_hour")
            .as("burst_ratio_ppm"))
    }),

    // content-defined chunking audit (Rabin-style): a cut lands wherever
    // the 8-char window hash ≡ 0 (mod 64) — chunk boundaries survive
    // insertions, unlike q97's fixed offsets, which is WHY dedup stores
    // chunk this way. Per source: measured cut density vs the 1/64
    // design point and the resulting mean chunk length. Position scan is
    // one explode, O(total chars), no window
    "q609_cdc_chunking" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("source"), col("doc_id"), col("text"),
          length(col("text")).cast("long").as("len"))
        .localCheckpoint(false)
      val cuts = base.filter(col("len") >= 8)
        .select(col("source"),
          explode(expr("sequence(1, len - 7)")).as("i"), col("text"))
        .select(col("source"),
          (Dedup.md5Long(expr("substring(text, i, 8)"), 12) % 64 === 0)
            .cast("long").as("isCut"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_positions"), sum(col("isCut")).as("n_cuts"))
      base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_chars"))
        .join(cuts, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_chars"), col("n_cuts"),
          expr("n_chars div (n_cuts + n_docs)").as("mean_chunk_len"),
          expr("1000000 * n_cuts div n_positions").as("cut_rate_ppm"))
        .orderBy("source")
    }),

    // cross-source near-dup contamination matrix: q21's MinHash/LSH
    // candidate pairs rolled up by (source, source) — which corpora leak
    // into each other (the off-diagonal mass is what decontamination
    // actually has to move). Reuses the flagship band-join verbatim;
    // the roll-up is two broadcast dim joins on the candidate relation
    "q610_cross_source_dups" -> ((s, dir) => {
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
      val cand = Dedup.minhashCandidates(
        Tables.documents(s, dir), "doc_id", "text")
      cand
        .join(broadcast(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa"))), "doc_a")
        .join(broadcast(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb"))), "doc_b")
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    }),

    // encoding/index advisor over the order columns: per column, NDV,
    // runs in o_orderkey order (unique key — deterministic lag), and the
    // pinned rule ladder (long runs + tiny NDV → RLE; small NDV → dict;
    // huge NDV → minmax zone maps only). ONE scan via stack(), runs from
    // a per-column lag window — the storage-layout recommendation the
    // q591/q369 planners consume
    "q611_index_advisor" -> ((s, dir) => {
      val melted = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("stack(4, 'o_custkey', CAST(o_custkey AS STRING)," +
            " 'o_orderdate', CAST(o_orderdate AS STRING)," +
            " 'o_orderpriority', o_orderpriority," +
            " 'o_orderstatus', o_orderstatus)")
            .as(Seq("colname", "val")))
      val byKey = Window.partitionBy("colname").orderBy("o_orderkey")
      melted
        .withColumn("chg",
          when(col("val") === lag(col("val"), 1).over(byKey), 0L)
            .otherwise(1L))
        .groupBy("colname")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("val")).as("ndv"), sum(col("chg")).as("runs"))
        .withColumn("avg_run_len", expr("n_rows div runs"))
        .withColumn("advice", expr(
          "CASE WHEN ndv <= 16 AND avg_run_len >= 4 THEN 'rle'" +
            " WHEN ndv <= 1024 THEN 'dict'" +
            " WHEN ndv * 10 >= n_rows THEN 'minmax'" +
            " ELSE 'bloom' END"))
        .orderBy("colname")
    }),

    // Benford SECOND-digit test on order totals (cents): the forensic
    // refinement that survives unit changes better than the leading
    // digit; expected ppm per digit are the PINNED Σ log10(1 + 1/(10a+d))
    // constants, so no logarithm runs in-query and the χ² contribution
    // per digit is pure integer arithmetic
    "q612_benford_second" -> ((s, dir) => {
      val exp = "CASE d2 WHEN 0 THEN 119679 WHEN 1 THEN 113890" +
        " WHEN 2 THEN 108821 WHEN 3 THEN 104330 WHEN 4 THEN 100308" +
        " WHEN 5 THEN 96677 WHEN 6 THEN 93375 WHEN 7 THEN 90352" +
        " WHEN 8 THEN 87570 ELSE 84997 END"
      Tables.orders(s, dir)
        .select(centsOf(col("o_totalprice")).as("v"))
        .filter(col("v") >= 10)
        .select(expr("CAST(substring(CAST(v AS STRING), 2, 1) AS BIGINT)")
          .as("d2"))
        .groupBy("d2").agg(count(lit(1)).as("n_obs"))
        .withColumn("n", sum(col("n_obs")).over(Window.partitionBy()))
        .select(col("d2").as("digit"), col("n_obs"),
          expr("1000000 * n_obs div n").as("obs_ppm"),
          expr(s"CAST($exp AS BIGINT)").as("exp_ppm"),
          expr(s"1000000 * n_obs div n - ($exp)").as("dev_ppm"))
        .orderBy("digit")
    }),

    // winner's-curse audit (regression to the mean): the top spend-decile
    // of the FIRST half-window keeps only part of its lead in the second
    // — their H2/H1 ppm ratio vs everyone's; the gap is the shrinkage a
    // naive "reward last period's winners" policy ignores (q-EB
    // shrinkage's empirical cousin)
    "q613_winners_curse" -> ((s, dir) => {
      val h = Tables.orders(s, dir)
        .select(col("o_custkey"),
          (col("o_orderdate") < to_date(lit("1998-07-01"))).as("h1"),
          centsOf(col("o_totalprice")).as("v"))
        .groupBy("o_custkey")
        .agg(sum(when(col("h1"), col("v")).otherwise(0L)).as("s1"),
          sum(when(!col("h1"), col("v")).otherwise(0L)).as("s2"))
        .filter(col("s1") > 0)
      val t = h.withColumn("dec",
        ntile(10).over(Window.orderBy("s1", "o_custkey")))
      t.agg(
          sum(when(col("dec") === 10, 1L).otherwise(0L)).as("n_top"),
          sum(when(col("dec") === 10, col("s1")).otherwise(0L)).as("top_h1"),
          sum(when(col("dec") === 10, col("s2")).otherwise(0L)).as("top_h2"),
          sum(col("s1")).as("all_h1"), sum(col("s2")).as("all_h2"))
        .select(col("n_top"), col("top_h1"), col("top_h2"),
          expr("CAST(1000000 * CAST(top_h2 AS DECIMAL(38,0)) div top_h1" +
            " AS BIGINT)").as("top_ratio_ppm"),
          expr("CAST(1000000 * CAST(all_h2 AS DECIMAL(38,0)) div all_h1" +
            " AS BIGINT)").as("all_ratio_ppm"),
          expr("CAST(1000000 * CAST(all_h2 AS DECIMAL(38,0)) div all_h1" +
            " - 1000000 * CAST(top_h2 AS DECIMAL(38,0)) div top_h1" +
            " AS BIGINT)").as("regression_gap_ppm"))
    }),

    // scalar-quantization sweep for the embedding store: 4/6/8-bit
    // per-dim codes in the exact bounding box, half-away integer
    // round-trip, exact squared reconstruction error — the bits-vs-MSE
    // curve that picks an SQ width before committing an index (q?PQ
    // audit's scalar sibling). One pass; the ×3 width fan-out is a
    // map-side explode
    "q614_sq_sweep" -> ((s, dir) => {
      val qv = Tables.embeddings(s, dir).filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("pos", "xx")))
        .select(col("pos").cast("long").as("pos"),
          round(col("xx") * 1000000, 0).cast("long").as("x"))
      val dims = qv.groupBy("pos")
        .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      qv.join(broadcast(dims), "pos")
        .select(col("x"), col("lo"), (col("hi") - col("lo")).as("span"))
        .withColumn("b", explode(array(lit(4L), lit(6L), lit(8L))))
        .withColumn("lv", expr(
          "CASE b WHEN 4 THEN 15 WHEN 6 THEN 63 ELSE 255 END"))
        .withColumn("code", expr("CASE WHEN span = 0 THEN 0" +
          " ELSE ((x - lo) * lv + span div 2) div span END"))
        .withColumn("recon", expr(
          "lo + (code * span + lv div 2) div lv"))
        .withColumn("err", expr("(x - recon) * (x - recon)"))
        .groupBy("b")
        .agg(count(lit(1)).as("n_vals"),
          sum(col("err").cast(dec38)).as("se"))
        .select(col("b").as("bits"), col("n_vals"),
          expr("CAST(se div n_vals AS BIGINT)").as("mse_per_val"),
          expr("1000000 * b div 32").as("size_vs_f32_ppm"))
        .orderBy("bits")
    }),

    // Dobrushin ergodicity coefficient of the event-type Markov chain:
    // δ = ½ max over state pairs of the TV distance between their
    // outgoing rows — δ < 1 certifies geometric mixing, and the arg-max
    // pair names the two states that disagree most about what follows.
    // Exact rational on the common n_i·n_i' denominator over the
    // zero-filled |states|² grid; transitions from ONE lead window
    "q615_dobrushin" -> ((s, dir) => {
      // event_id is the arrival-order key: ordering by raw ts would
      // tie-break differently across engines after the µs truncation
      val tr = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1)
          .over(Window.partitionBy("user_id").orderBy("event_id")))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val states = tr.select(col("cur").as("st")).distinct()
      val rows_ = tr.groupBy("cur").agg(sum(col("c")).as("n"))
      val grid = rows_.crossJoin(broadcast(states))
        .join(tr.withColumnRenamed("nxt", "st"), Seq("cur", "st"), "left")
        .select(col("cur"), col("st"),
          coalesce(col("c"), lit(0L)).as("c"), col("n"))
      val pair = grid.as("x")
        .join(grid.withColumnRenamed("cur", "cur2")
          .withColumnRenamed("c", "c2").withColumnRenamed("n", "n2").as("y"),
          Seq("st"))
        .filter(col("cur") < col("cur2"))
        .groupBy(col("cur").as("state_a"), col("cur2").as("state_b"))
        .agg(max(col("n")).as("n1"), max(col("n2")).as("n2"),
          sum(abs(col("c") * col("n2") - col("c2") * col("n")).cast(dec38))
            .as("sad"))
        .select(col("state_a"), col("state_b"),
          expr("CAST(1000000 * sad div (2 * CAST(n1 AS DECIMAL(38,0)) * n2)" +
            " AS BIGINT)").as("tv_ppm"))
      val nTot = tr.agg(sum(col("c")).as("n_transitions"),
        countDistinct(col("cur")).as("n_states"))
      pair.orderBy(col("tv_ppm").desc, col("state_a"), col("state_b"))
        .limit(1)
        .crossJoin(broadcast(nTot))
        .select(col("n_states"), col("n_transitions"),
          col("state_a"), col("state_b"),
          col("tv_ppm").as("dobrushin_ppm"))
    }),

    // 0-order character entropy per source (nats, micro): H = ln n −
    // (Σ c·ln c)/n over the bounded character alphabet — the
    // byte-level signal that separates prose from markup/code where
    // the word-level entropies can't (q?entropy-rate's char sibling).
    // Pinned-ln per count (q573 discipline); the char explode is one
    // O(total chars) pass
    "q616_char_entropy" -> ((s, dir) => {
      val ch = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("source"), col("text"),
          length(col("text")).cast("long").as("len"))
        .filter(col("len") > 0)
        .select(col("source"), explode(expr("sequence(1, len)")).as("i"),
          col("text"))
        .select(col("source"), expr("substring(text, i, 1)").as("ch"))
        .groupBy("source", "ch").agg(count(lit(1)).as("c"))
      ch.groupBy("source")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct_chars"),
          sum(expr("c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000)" +
            " AS BIGINT)")).as("scl"))
        .select(col("source"), col("n").as("n_chars"),
          col("n_distinct_chars"),
          expr("CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)" +
            " - scl div n").as("entropy_micro"))
        .orderBy("source")
    }),

    // price-ending forensics: the cents-mod-100 distribution of order
    // totals — psychological pricing (.99) or rounding artifacts show
    // as mass away from the uniform 1% line; top-10 endings with their
    // ppm deviation (Benford's retail cousin, q612's neighbor)
    "q617_price_endings" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select((centsOf(col("o_totalprice")) % 100).as("ending"))
        .groupBy("ending").agg(count(lit(1)).as("n_obs"))
        .withColumn("n", sum(col("n_obs")).over(Window.partitionBy()))
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("n_obs").desc, col("ending"))))
        .filter(col("rk") <= 10)
        .select(col("ending"), col("n_obs"),
          expr("1000000 * n_obs div n").as("obs_ppm"),
          expr("1000000 * n_obs div n - 10000").as("dev_ppm"))
        .orderBy(col("n_obs").desc, col("ending"))),

    // two-sample Kolmogorov–Smirnov: D = max |F₁ − F₂| between
    // AUTOMOBILE customers' spend distribution and everyone else's —
    // exact on the common n₁·n₂ denominator at every distinct value
    // (ties accumulate correctly because the grid is per-VALUE), with
    // the √(n₁n₂/(n₁+n₂)) scaling via the exact isqrt chain
    "q618_ks_two_sample" -> ((s, dir) => {
      val sp = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"),
          (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("g1"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
      val byV = sp.groupBy("v")
        .agg(sum(col("g1")).as("d1"), sum(lit(1L) - col("g1")).as("d2"))
      val upTo = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byV
        .withColumn("c1", sum(col("d1")).over(upTo))
        .withColumn("c2", sum(col("d2")).over(upTo))
        .withColumn("n1", sum(col("d1")).over(Window.partitionBy()))
        .withColumn("n2", sum(col("d2")).over(Window.partitionBy()))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(expr("1000000 * abs(c1 * n2 - c2 * n1)" +
            " div (n1 * n2)")).as("d_ppm"))
        .withColumn("x", expr("1000000 * n1 * n2 div (n1 + n2)"))
        .withColumn("t0", floor(sqrt(col("x").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + x div t0) div 2 ELSE 0 END"))
        .withColumn("sq", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= x THEN t1 + 1" +
            " WHEN t1 * t1 > x THEN t1 - 1 ELSE t1 END"))
        .select(col("n1"), col("n2"), col("d_ppm"),
          expr("d_ppm * sq div 1000000").as("ks_lambda_milli"))
    }),

    // Spearman footrule distance between the revenue and the quantity
    // brand rankings: F = Σ|r₁ − r₂| normalized by its ⌊n²/2⌋ maximum —
    // the displacement metric (how far did positions MOVE) next to
    // q254's concordance view; two rank windows over the bounded brand
    // relation from one fact pass
    "q619_footrule" -> ((s, dir) => {
      val b = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("rev"),
          sum(col("l_quantity").cast("long")).as("qty"))
      b.withColumn("r1", row_number()
          .over(Window.orderBy(col("rev").desc, col("brand"))).cast("long"))
        .withColumn("r2", row_number()
          .over(Window.orderBy(col("qty").desc, col("brand"))).cast("long"))
        .agg(count(lit(1)).as("n_brands"),
          sum(abs(col("r1") - col("r2"))).as("footrule_sum"))
        .select(col("n_brands"), col("footrule_sum"),
          expr("1000000 * footrule_sum div (n_brands * n_brands div 2)")
            .as("footrule_ppm"))
    }),

    // German tank estimator: from k = 200 md5-sampled orders, estimate
    // the maximum order key as m̂ = m + m/k − 1 (the serial-number MVU
    // estimator) and audit it against the true max — the classic
    // estimate-population-from-a-sample drill, useful as a key-space
    // probe when scanning the full table is off-budget
    "q620_german_tank" -> ((s, dir) => {
      val sample = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          Dedup.md5Long(concat(lit("tank#"),
            col("o_orderkey").cast("string")), 12).as("h"))
        .withColumn("rk", row_number().over(Window.orderBy("h", "o_orderkey")))
        .filter(col("rk") <= 200)
        .agg(count(lit(1)).as("k"), max(col("o_orderkey")).as("max_seen"))
      val truth = Tables.orders(s, dir)
        .agg(max(col("o_orderkey")).as("true_max"))
      sample.crossJoin(broadcast(truth))
        .select(col("k"), col("max_seen"),
          expr("max_seen + max_seen div k - 1").as("estimate"),
          col("true_max"),
          expr("1000000 * (max_seen + max_seen div k - 1 - true_max)" +
            " div true_max").as("err_ppm"))
    }),

    // Chao1 richness estimator over per-source word BIGRAMS (unigrams
    // saturate here — q582's reasoning): Ŝ = S + F₁(F₁−1)/(2(F₂+1)),
    // the bias-corrected form that reads how much unseen vocabulary the
    // singleton/doubleton head implies — the "how much is left" twin of
    // Good–Turing's unseen mass
    "q621_chao1" -> ((s, dir) => {
      val bg = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("source"), col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("nw", lead(col("w"), 1)
          .over(Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("nw").isNotNull)
        .groupBy(col("source"), concat(col("w"), lit(" "), col("nw")).as("b"))
        .agg(count(lit(1)).as("c"))
      bg.groupBy("source")
        .agg(count(lit(1)).as("s_obs"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("source"), col("s_obs"), col("f1"), col("f2"),
          expr("s_obs + f1 * (f1 - 1) div (2 * (f2 + 1))").as("chao1"))
        .orderBy("source")
    }),

    // birthday-paradox hash audit: docs hashed into 4096 md5 buckets —
    // observed colliding pairs Σ C(c,2) vs the uniform expectation
    // C(n,2)/m as ONE exact ratio; a ratio far from 1e6 ppm means the
    // hash (or the id space) is not behaving uniformly — the q598
    // rebalancer's pre-flight check
    "q622_birthday_audit" -> ((s, dir) => {
      val c = Tables.documents(s, dir)
        .select((Dedup.md5Long(concat(lit("bday#"),
          col("doc_id").cast("string")), 12) % 4096).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      c.agg(sum(col("c")).as("n"),
          sum(expr("c * (c - 1) div 2")).as("obs_pairs"))
        .select(col("n"), lit(4096L).as("m"), col("obs_pairs"),
          expr("n * (n - 1) div 2 div 4096").as("exp_pairs"),
          expr("CAST(1000000 * CAST(obs_pairs AS DECIMAL(38,0)) * 4096" +
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1) div 2) AS BIGINT)")
            .as("ratio_ppm"))
    }),

    // fan-out tail amplification: a request touching one event of EACH
    // type is slow if ANY leg is slow (value > 15) — P(any) = 1 − Π(1−pᵢ)
    // via summed pinned micro-nat logs and ONE exp (q573's geomean
    // discipline), against the worst single leg; the "tail at scale"
    // readout for fan-out services
    "q623_fanout_tail" -> ((s, dir) => {
      val p = Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > 15.0, 1L).otherwise(0L)).as("slow"))
        .withColumn("l", expr(
          "CAST(round(ln(CAST(n - slow AS DOUBLE) / n) * 1000000) AS BIGINT)"))
        .withColumn("p_ppm", expr("1000000 * slow div n"))
      p.agg(count(lit(1)).as("n_types"), sum(col("l")).as("lsum"),
          max(col("p_ppm")).as("max_single_ppm"))
        .withColumn("surv_ppm", expr(
          "CAST(round(exp(CAST(lsum AS DOUBLE) / 1000000.0) * 1000000)" +
            " AS BIGINT)"))
        .select(col("n_types"), col("max_single_ppm"),
          (lit(1000000L) - col("surv_ppm")).as("any_slow_ppm"),
          expr("1000 * (1000000 - surv_ppm) div max_single_ppm")
            .as("amplification_milli"))
    }),

    // ROC curve at decile cuts: account balance scoring the top-quartile
    // spender label (q593's pair), one (tpr, fpr, precision) point per
    // score decile — the table a threshold choice actually reads, next
    // to the single-number AUC/AP/Youden family. Cumulative counts over
    // the 10-row decile relation only
    "q624_roc_deciles" -> ((s, dir) => {
      val sp = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("spend"))
      val scored = Tables.customer(s, dir)
        .select(col("c_custkey"), centsOf(col("c_acctbal")).as("ab"))
        .join(sp, col("c_custkey") === col("o_custkey"))
        .withColumn("rel",
          (ntile(4).over(Window.orderBy("spend", "c_custkey")) === 4)
            .cast("long"))
        .withColumn("dec", ntile(10)
          .over(Window.orderBy(col("ab").desc, col("c_custkey"))).cast("long"))
      val d = scored.groupBy("dec")
        .agg(sum(col("rel")).as("pos"), sum(lit(1L) - col("rel")).as("neg"))
      val upTo = Window.orderBy("dec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("tp", sum(col("pos")).over(upTo))
        .withColumn("fp", sum(col("neg")).over(upTo))
        .withColumn("p", sum(col("pos")).over(Window.partitionBy()))
        .withColumn("ng", sum(col("neg")).over(Window.partitionBy()))
        .select(col("dec").as("decile"),
          expr("1000000 * tp div p").as("tpr_ppm"),
          expr("1000000 * fp div ng").as("fpr_ppm"),
          expr("1000000 * tp div (tp + fp)").as("precision_ppm"))
        .orderBy("decile")
    }),

    // strongly connected components of the DIRECTED trade graph
    // (supplier nation → customer nation, above-mean pair revenue):
    // exact reach closure by path doubling (converges in ⌈log₂ diam⌉
    // driver rounds, actions on counts only — the CC-labels discipline),
    // SCC id = min mutually-reachable node. The oracle replays the
    // closure as a recursive CTE fixpoint
    "q625_scc_directed" -> ((s, dir) => {
      val d0 = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("s_nationkey").as("a"), col("c_nationkey").as("b"))
        .agg(sum(centsOf(col("l_extendedprice"))).as("w"))
        .filter(col("a") =!= col("b"))
        .localCheckpoint(false)
      val tot = d0.agg(sum(col("w").cast(dec38)).as("tw"),
        count(lit(1)).as("np"))
      var reach = d0.crossJoin(broadcast(tot))
        .filter(expr("CAST(w AS DECIMAL(38,0)) * np > tw"))
        .select("a", "b").localCheckpoint(false)
      var n = reach.count()
      var grown = true
      var rounds = 0
      while (grown && rounds < 6) {
        val nxt = reach.union(
            reach.join(reach.select(col("a").as("m"), col("b").as("b2")),
              col("b") === col("m"))
              .select(col("a"), col("b2").as("b")))
          .distinct().localCheckpoint(false)
        val n2 = nxt.count()
        grown = n2 > n
        n = n2
        reach = nxt
        rounds += 1
      }
      val mutual = reach
        .join(reach.select(col("b").as("a"), col("a").as("b")),
          Seq("a", "b"), "left_semi")
      val nodes = reach.select(col("a").as("node"))
        .union(reach.select(col("b").as("node"))).distinct()
      nodes
        .join(mutual.select(col("a").as("node"), col("b").as("m")),
          Seq("node"), "left")
        .groupBy("node")
        .agg(least(min(col("m")), min(col("node"))).as("scc"))
        .groupBy(col("scc").cast("long").as("scc_id"))
        .agg(count(lit(1)).as("size"))
        .orderBy("scc_id")
    }),

    // absorption reach of the event chain: P(hit 'purchase' within k
    // steps) from each state, k = 1 and 4 — the "how close is every
    // state to converting" readout; four exact ppm value-iteration
    // rounds over the bounded transition matrix (each round one join on
    // |states|² rows), event_id arrival order (q615's convention)
    "q626_absorption_reach" -> ((s, dir) => {
      val tr = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1)
          .over(Window.partitionBy("user_id").orderBy("event_id")))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val rows_ = tr.groupBy("cur").agg(sum(col("c")).as("n"))
      val direct = rows_.join(
          tr.filter(col("nxt") === "purchase")
            .select(col("cur"), col("c").as("cp")), Seq("cur"), "left")
        .select(col("cur"), col("n"), coalesce(col("cp"), lit(0L)).as("cp"))
        .localCheckpoint(false)
      val cont = tr.filter(col("nxt") =!= "purchase")
      var r = direct.select(col("cur").as("st"),
        expr("1000000 * cp div n").as("rp"))
      val r1 = r
      for (_ <- 1 to 3) {
        val step = cont.join(r.withColumnRenamed("st", "nxt"), "nxt")
          .groupBy("cur").agg(sum(expr("c * rp")).as("srp"))
        r = direct.join(step, Seq("cur"), "left")
          .select(col("cur").as("st"),
            expr("(1000000 * cp + coalesce(srp, 0)) div n").as("rp"))
          .localCheckpoint(false)
      }
      direct.select(col("cur").as("st"), col("n"))
        .join(r1.select(col("st"), col("rp").as("reach1_ppm")), "st")
        .join(r.select(col("st"), col("rp").as("reach4_ppm")), "st")
        .filter(col("st") =!= "purchase")
        .select(col("st").as("state"), col("n").as("n_out"),
          col("reach1_ppm"), col("reach4_ppm"))
        .orderBy("state")
    }),

    // Gorilla timestamp-compression audit: per event type, the
    // delta-of-delta bit classes of the (µs) arrival stream — share of
    // dod = 0 (1 bit), |dod| ≤ 64 (9), ≤ 256 (12), ≤ 2048 (16), else
    // (36) — and the implied bits/timestamp vs the raw 64: the TSDB
    // encoding readout for the events table. Two lags per user stream
    "q627_gorilla_ts" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      val dod = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
        .withColumn("d", col("t") - lag(col("t"), 1).over(byUser))
        .withColumn("dod", col("d") - lag(col("d"), 1).over(byUser))
        .filter(col("dod").isNotNull)
        .withColumn("bits", expr("CASE WHEN dod = 0 THEN 1" +
          " WHEN abs(dod) <= 64 THEN 9 WHEN abs(dod) <= 256 THEN 12" +
          " WHEN abs(dod) <= 2048 THEN 16 ELSE 36 END"))
      dod.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("dod") === 0, 1L).otherwise(0L)).as("n_zero"),
          sum(col("bits").cast("long")).as("total_bits"))
        .select(col("event_type"), col("n"),
          expr("1000000 * n_zero div n").as("zero_dod_ppm"),
          expr("1000 * total_bits div n").as("bits_per_ts_milli"),
          expr("1000000 * total_bits div (64 * n)").as("vs_raw_ppm"))
        .orderBy("event_type")
    }),

    // cohort LTV payback: for each signup quarter, the months until
    // cumulative revenue reaches 2× the cohort's first month — the
    // "when does a cohort repay acquisition" curve; month index is
    // integer calendar arithmetic, cumulative over the bounded
    // (cohort × month) relation
    "q628_ltv_payback" -> ((s, dir) => {
      val first = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(min(col("o_orderdate")).as("f"))
        .select(col("o_custkey").as("ck"),
          date_trunc("quarter", col("f")).as("cohort"))
      val mrev = Tables.orders(s, dir)
        .join(first, col("o_custkey") === col("ck"))
        .groupBy(col("cohort"),
          ((year(col("o_orderdate")) - year(col("cohort"))) * 12
            + month(col("o_orderdate")) - month(col("cohort")))
            .cast("long").as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
      val nc = first.groupBy("cohort")
        .agg(countDistinct(col("ck")).as("n_customers"))
      val upTo = Window.partitionBy("cohort").orderBy("mi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      mrev.withColumn("cum", sum(col("rev")).over(upTo))
        .withColumn("m0", first_value(col("rev"))
          .over(Window.partitionBy("cohort").orderBy("mi")))
        .groupBy("cohort")
        .agg(max(col("m0")).as("m0_cents"),
          min(when(col("cum") >= lit(2L) * col("m0"), col("mi")))
            .as("payback"))
        .join(broadcast(nc), "cohort")
        .select(date_format(col("cohort"), "yyyy-MM").as("cohort"),
          col("n_customers"), col("m0_cents"),
          coalesce(col("payback"), lit(-1L)).as("payback_month"))
        .orderBy("cohort")
    }),

    // request-hedging audit: per event type the exact-rank p50/p90/p99 of
    // `value`, the independence identity hedged-p99 = single-p90 (fire a
    // duplicate after p50 → both-slow probability squares), and the
    // extra-load share — the "tail at scale" hedging trade-off in one
    // table. Quantiles are VALUES FROM THE DATA (no interpolation), so
    // doubles cross engines untouched
    "q629_hedging_audit" -> ((s, dir) => {
      val byT = Window.partitionBy("event_type").orderBy("value", "event_id")
      val r = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rk", row_number().over(byT).cast("long"))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy("event_type")))
      r.groupBy("event_type")
        .agg(max(col("n")).as("n"),
          max(when(col("rk") === expr("(n + 1) div 2"), col("value")))
            .as("p50"),
          max(when(col("rk") === expr("(9 * n + 9) div 10"), col("value")))
            .as("p90"),
          max(when(col("rk") === expr("(99 * n + 99) div 100"), col("value")))
            .as("p99"))
        .select(col("event_type"), col("n"), col("p50"), col("p90"),
          col("p99"), col("p90").as("hedged_p99"),
          expr("1000000 * (n - (n + 1) div 2) div n").as("extra_load_ppm"))
        .orderBy("event_type")
    }),

    // histogram bin-count rules on per-customer spend: Freedman–Diaconis
    // (2·IQR/n^⅓), Scott (3.49σ/n^⅓), Sturges (1+log₂n) — the three
    // classic widths disagree exactly when the tail is heavy, which is
    // the decision this panel surfaces. n^⅓ by exact integer cbrt
    // (double seed ±1 adjust), σ by the isqrt chain, log₂ from bin()
    // length — no float in any ratio
    "q630_bin_width_rules" -> ((s, dir) => {
      val sp = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
      val r = sp.withColumn("rk", row_number()
          .over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      r.agg(max(col("n")).as("n"), min(col("v")).as("mn"),
          max(col("v")).as("mx"),
          max(when(col("rk") === expr("(n + 3) div 4"), col("v"))).as("q1"),
          max(when(col("rk") === expr("(3 * n + 3) div 4"), col("v")))
            .as("q3"),
          sum(col("v").cast(dec38)).as("sx"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("sxx"))
        .withColumn("iqr", col("q3") - col("q1"))
        .withColumn("vr", expr(
          "CAST((n * sxx - sx * sx) div (CAST(n AS DECIMAL(38,0)) * n)" +
            " AS BIGINT)"))
        .withColumn("s0", floor(sqrt(col("vr").cast("double"))).cast("long"))
        .withColumn("s1", expr(
          "CASE WHEN s0 > 0 THEN (s0 + vr div s0) div 2 ELSE 0 END"))
        .withColumn("sig", expr(
          "CASE WHEN (s1 + 1) * (s1 + 1) <= vr THEN s1 + 1" +
            " WHEN s1 * s1 > vr THEN s1 - 1 ELSE s1 END"))
        .withColumn("c0", expr(
          "CAST(round(pow(CAST(n AS DOUBLE), 0.3333333333333333)) AS BIGINT)"))
        .withColumn("cb", expr(
          "CASE WHEN (c0 + 1) * (c0 + 1) * (c0 + 1) <= n THEN c0 + 1" +
            " WHEN c0 * c0 * c0 > n THEN c0 - 1 ELSE c0 END"))
        .select(col("n"), col("iqr").as("iqr_cents"),
          col("sig").as("sigma_cents"),
          expr("(mx - mn) * cb div (2 * iqr)").as("bins_fd"),
          expr("(mx - mn) * cb * 1000 div (3490 * sig)").as("bins_scott"),
          length(expr("bin(n)")).cast("long").as("bins_sturges"))
    }),

    // log-rank hazard ratio, AUTOMOBILE vs HOUSEHOLD lifetimes: observed
    // vs expected events per arm from q572's shared risk-set pass,
    // HR = (O₁/E₁)/(O₂/E₂) — the effect-SIZE readout the q572 χ² only
    // tests; expected events per-time micro-quantized, micro cancels in
    // the ratio
    "q631_hazard_ratio" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(col("c_custkey"),
          (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("g1"))
      val life = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey", "g1")
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
          .as("t"))
      val et = life.groupBy("t")
        .agg(sum(col("g1")).as("d1"), count(lit(1)).as("d"))
      val after = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      et.withColumn("n1t", sum(col("d1")).over(after))
        .withColumn("nt", sum(col("d")).over(after))
        .agg(sum(col("d1")).as("o1"),
          sum(expr("1000000 * d * n1t div nt")).as("e1_micro"),
          sum(expr("d - d1")).as("o2"),
          sum(expr("1000000 * d * (nt - n1t) div nt")).as("e2_micro"))
        .select(col("o1"), col("e1_micro"), col("o2"), col("e2_micro"),
          expr("CAST(1000 * CAST(o1 AS DECIMAL(38,0)) * e2_micro" +
            " div (CAST(o2 AS DECIMAL(38,0)) * e1_micro) AS BIGINT)")
            .as("hr_milli"))
    }),

    // Stuart–Maxwell marginal-homogeneity test: each customer's modal
    // order status in the two half-windows forms a paired 3×3 table; did
    // the status MARGINS shift between halves? χ² from the exact 2×2
    // inverse closed form — all integer, the paired-categorical
    // counterpart of q567's CMH
    "q632_stuart_maxwell" -> ((s, dir) => {
      def modal(half: Column, name: String): DataFrame =
        Tables.orders(s, dir).filter(half)
          .groupBy("o_custkey", "o_orderstatus")
          .agg(count(lit(1)).as("c"))
          .groupBy("o_custkey")
          .agg(max(struct(col("c"),
            (-ascii(col("o_orderstatus"))).as("neg"),
            col("o_orderstatus").as("st"))).as("m"))
          .select(col("o_custkey").as(s"ck_$name"),
            col("m.st").as(s"st_$name"))
      val pairs = modal(col("o_orderdate") < to_date(lit("1998-07-01")), "a")
        .join(modal(col("o_orderdate") >= to_date(lit("1998-07-01")), "b"),
          col("ck_a") === col("ck_b"))
        .groupBy(col("st_a"), col("st_b")).agg(count(lit(1)).as("nij"))
        .localCheckpoint(false)
      val m = pairs.agg(
        sum(col("nij")).as("np"),
        sum(when(col("st_a") === "F", col("nij")).otherwise(0L)).as("r1"),
        sum(when(col("st_a") === "O", col("nij")).otherwise(0L)).as("r2"),
        sum(when(col("st_b") === "F", col("nij")).otherwise(0L)).as("c1"),
        sum(when(col("st_b") === "O", col("nij")).otherwise(0L)).as("c2"),
        sum(when(col("st_a") === "F" && col("st_b") === "F", col("nij"))
          .otherwise(0L)).as("n11"),
        sum(when(col("st_a") === "O" && col("st_b") === "O", col("nij"))
          .otherwise(0L)).as("n22"),
        sum(when(col("st_a") === "F" && col("st_b") === "O", col("nij"))
          .otherwise(0L)).as("n12"),
        sum(when(col("st_a") === "O" && col("st_b") === "F", col("nij"))
          .otherwise(0L)).as("n21"))
      m.select(col("np").as("n_pairs"),
          (col("r1") - col("c1")).as("d1"), (col("r2") - col("c2")).as("d2"),
          expr("CAST(1000 * ((r2 + c2 - 2 * n22)" +
            " * CAST(r1 - c1 AS DECIMAL(38,0)) * (r1 - c1)" +
            " + 2 * (n12 + n21) * CAST(r1 - c1 AS DECIMAL(38,0)) * (r2 - c2)" +
            " + (r1 + c1 - 2 * n11) * CAST(r2 - c2 AS DECIMAL(38,0)) * (r2 - c2))" +
            " div ((r1 + c1 - 2 * n11) * CAST(r2 + c2 - 2 * n22 AS DECIMAL(38,0))" +
            " - CAST(n12 + n21 AS DECIMAL(38,0)) * (n12 + n21)) AS BIGINT)")
            .as("chi2_milli"))
    }),

    // grace-hash-join partitioning plan: for each fact table (measured
    // rows × pinned row width) and memory budget, the partition fan-out
    // needed, recursion depth at fan-out 256, and the I/O multiplier
    // (2 passes per level + final probe) — the q591 ladder aimed at
    // join spill instead of compaction
    "q633_grace_hash_plan" -> ((s, dir) => {
      val sizes = Seq(
        ("lineitem", Tables.lineitem(s, dir), 120L),
        ("orders", Tables.orders(s, dir), 100L),
        ("customer", Tables.customer(s, dir), 180L),
        ("documents", Tables.documents(s, dir), 300L))
      val rows = sizes.map { case (name, df, w) =>
        df.agg((count(lit(1)) * w).as("bytes"))
          .select(lit(name).as("tbl"), col("bytes"))
      }.reduce(_.unionByName(_))
      rows
        .withColumn("mem", explode(array(lit(67108864L), lit(268435456L),
          lit(1073741824L))))
        .withColumn("partitions", expr(
          "CASE WHEN bytes <= mem THEN 1" +
            " ELSE (bytes * 6 div 5 + mem - 1) div mem END"))
        .withColumn("depth", expr(
          "CAST(CASE WHEN bytes <= mem THEN 0" +
            " WHEN bytes <= mem * 256 THEN 1" +
            " WHEN bytes <= mem * 65536 THEN 2 ELSE 3 END AS BIGINT)"))
        .select(col("tbl"), col("bytes"), col("mem"), col("partitions"),
          col("depth"),
          expr("2 * depth + 1").as("io_multiplier"))
        .orderBy("tbl", "mem")
    }),

    // multimodal: opaque binary column + stub decode metadata
    "q31_multimodal_meta" -> ((s, dir) => {
      val nb = octet_length(col("text").cast("binary")).cast("long")
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          nb.as("n_bytes"),
          (nb % 512).as("width"),
          (nb * 7 % 512).as("height"),
          (nb % 16).as("n_frames"))
        .orderBy("doc_id")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query is oracled.
    */
  def oracleSql: Map[String, String] = OracleSql.sql
}
