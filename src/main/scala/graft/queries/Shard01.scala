package graft
package queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{EsmTokenizer, TextFunctions}
import graft.operators.{AsOfJoin, Cooccurrence, CorpusStats, Curation, Dedup, EventWindows, GraphMetrics, Indexing, Multimodal, NaiveBayes, RangeJoin, Similarity, SnapshotDiff}
import graft.plans.JaroWinkler
import graft.ops.{ClassWeights, LabelEncode, Stats, StratifiedSplit}
import Shared._

/** Query-registry shard (insertion-order slice) — moved verbatim out of
  * the former SparkEntry monolith (round-7 split; the driver contract
  * `SparkEntry.queries` is unchanged, shards concatenate in order).
  */
private[graft] object Shard01 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

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
  )
}
