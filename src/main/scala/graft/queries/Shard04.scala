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
private[graft] object Shard04 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

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
          // rank×weight is O(n_users·events) per term — decimal before
          // the multiply (wraps LONG past ~3e9 users)
          sum(col("i").cast(dec38) * col("x")).as("siw"))
        .select(
          col("n_users"), col("total_events"),
          (expr("(2 * (2 * siw - CAST(n_users + 1 AS DECIMAL(38,0)) * total_events)" +
            " * 1000000 " +
            "+ CAST(n_users AS DECIMAL(38,0)) * total_events)" +
            " div (2 * CAST(n_users AS DECIMAL(38,0)) * total_events)")
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
      // two-pass binned form (r13 re-land of the r12-proven rewrite):
      // the direct cumulative window has parallelism |return flags| = 3 —
      // a guaranteed straggler at scale. Pass A finds each flag's target
      // 65536-cent bin from the bounded per-bin aggregate (and the
      // cumulative weight BEFORE that bin); pass B runs the cumulative
      // window over the target bin's prices only (≤ 65536 rows per flag
      // by construction). Same first-crossing price: the target bin is
      // the first whose cumulative reaches half, so the global crossing
      // happens inside it at base + within-bin cumulative.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          centsOf(col("l_extendedprice")).as("price_c"),
          round(col("l_quantity"), 0).cast("long").as("qty"))
        .groupBy("l_returnflag", "price_c")
        .agg(sum(col("qty")).as("w"))
        .localCheckpoint(false) // both passes read this relation
      val wBin = Window.partitionBy("l_returnflag").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
      val target = li
        .groupBy(col("l_returnflag"), expr("price_c div 65536").as("bin"))
        .agg(sum(col("w")).as("bw"))
        .withColumn("cumbw", sum(col("bw")).over(wBin))
        .withColumn("totw", sum(col("bw")).over(
          Window.partitionBy("l_returnflag")))
        .filter(col("cumbw") * 2 >= col("totw"))
        .groupBy("l_returnflag")
        .agg(min(struct(col("bin"), (col("cumbw") - col("bw")).as("base"))).as("t"),
          max(col("totw")).as("totw"))
        .select(col("l_returnflag"), col("t.bin").as("tbin"),
          col("t.base").as("base"), col("totw"))
      val wIn = Window.partitionBy("l_returnflag").orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, 0)
      li.join(broadcast(target), Seq("l_returnflag"))
        .filter(expr("price_c div 65536") === col("tbin"))
        .withColumn("cumw", col("base") + sum(col("w")).over(wIn))
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
      // probe side spread pinned (r13, the q310 shape): the broadcast
      // block join otherwise runs every per-pair Levenshtein inside the
      // one scan task of the single-row-group input
      val lhs = b.select(col("k").as("part_a"), col("p_brand").as("brand"),
        col("ln"), col("p_name").as("name_a"))
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("brand"), col("ln"))
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

    // Theil-Sen robust slope of retail price vs size per brand, EXACT,
    // over a genuinely dictionary-bounded point set: the fact table is
    // first collapsed to one point per (brand, size) — y = floor mean
    // cents, computed as an exact decimal sum div count — and the pair
    // relation is built over THOSE points, so it holds ≤ C(50,2) = 1,225
    // pairs per brand at ANY corpus size (p_size is a 1..50 dictionary;
    // brand is 25 values). Until round 8 this query paired raw part rows
    // (O(Σ n_b²) over an SF-growing dim — the registry's last known
    // scale-killer, 7.6 s at sf0.1 and quadratic beyond); the raw-row
    // robust path at scale is q634/ops.TheilSen (point-sampled, ≤ k²/2
    // pairs per group). Slope stays a half-away-rounded milli integer
    // (sign split keeps div semantics engine-identical), lower median by
    // rank over the ≤1,225-row per-brand windows
    "q235_theilsen_slope" -> ((s, dir) => {
      val pts = Tables.part(s, dir)
        .select(col("p_brand"), col("p_size").cast("long").as("x"),
          centsOf(col("p_retailprice")).as("y"))
        .groupBy(col("p_brand"), col("x"))
        // exact decimal sum BEFORE the floor-mean div: cents × rows/cell
        // wraps long only past ~1e14 rows per (brand, size) — decimal38
        // makes it a non-issue at any SF (the width-audit discipline)
        .agg(expr("CAST(sum(CAST(y AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("y"))
        .withColumnRenamed("p_brand", "pb")
      val pairs = pts.as("a")
        .join(pts.as("b"),
          col("a.pb") === col("b.pb") && col("a.x") < col("b.x"))
        .select(col("a.pb").as("p_brand"),
          // outer x-guard: predicate pushdown may evaluate this expression
          // alongside (not after) the a.x < b.x join residual — under ANSI
          // an unguarded div would throw on the x-equal rows it never keeps
          expr("CASE WHEN (b.x - a.x) <= 0 THEN NULL" +
            " WHEN (b.y - a.y) >= 0" +
            " THEN (2 * (b.y - a.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))" +
            " ELSE -((2 * (a.y - b.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))) END")
            .as("slope_milli"))
      // ≤ 30,625 pairs total: a direct per-brand rank window is the right
      // plan (the two-pass histogram median this replaced was built for
      // the 8M-row raw-pair relation that no longer exists)
      pairs
        .withColumn("rn", row_number().over(
          Window.partitionBy("p_brand").orderBy("slope_milli")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("p_brand")))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("p_brand"), col("n").as("n_pairs"),
          col("slope_milli").as("median_slope_milli"))
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
        // keyed repartition off the one-task scan (r13): the brand probe
        // and the collect_set partials otherwise run serially, and
        // hash(l_orderkey) satisfies the basket aggregate so this
        // REPLACES the aggregate's exchange (same shuffle count)
        .select("l_partkey", "l_orderkey")
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("l_orderkey"))
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
  )
}
