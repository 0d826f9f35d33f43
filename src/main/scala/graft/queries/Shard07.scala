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
private[graft] object Shard07 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

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
      val nsp = s.sessionState.conf.numShufflePartitions
      // keyed repartition off the one-task scan (r13, the q382 shape):
      // the dimension probes and the distinct's partials ran serially;
      // the join's key equivalence (o_orderkey = l_orderkey) lets the
      // (cust, order, date, brand) distinct reuse this same exchange
      val ob = Tables.lineitem(s, dir)
        .select("l_partkey", "l_orderkey")
        .repartition(nsp, col("l_orderkey"))
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
      // one pinned hash(cust) exchange serves the order-grain distinct
      // (subset clustering) AND the lead() window — the unhinted form
      // exchanged twice on different keys
      val seq_ = ob.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .repartition(nsp, col("o_custkey"))
        .distinct()
        .withColumn("next_ok", lead(col("o_orderkey"), 1).over(w))
        .filter(col("next_ok").isNotNull)
      // both brand attachments broadcast the checkpointed (orderkey,
      // brand) projection (bounded: distinct order-brand pairs) — the
      // sort-merge form shuffled the sequence relation twice on different
      // keys (guide §3.1: the small side is known, force it)
      seq_.join(broadcast(ob.select(col("o_orderkey"), col("p_brand").as("brand_a"))),
          Seq("o_orderkey"))
        .join(broadcast(ob.select(col("o_orderkey").as("next_ok"),
          col("p_brand").as("brand_b"))), Seq("next_ok"))
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
      // pinned doc-key spread before the ~150× position explode (r13
      // q500 shape): split+explode+checkpoint of the 300k-row word
      // relation otherwise all run inside the single scan task
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
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
      // the α=0.3/β=0.2 milli recursion is a pure left fold over the
      // month-sorted array: one `aggregate` HOF job replaces the
      // recursive CTE's 24 sequential Spark jobs (q359 rationale; the
      // DuckDB oracle still replays WITH RECURSIVE level-by-level, and
      // RecursiveRewriteSpec pins rewrite ≡ recursive CTE). Anchor
      // semantics preserved: level seeds at mi = 0 (absent ⇒ empty),
      // consumption stops at the first month gap.
      Tables.orders(s, dir)
        .groupBy(expr("CAST((year(o_orderdate) - 1995) * 12" +
          " + month(o_orderdate) - 1 AS BIGINT)").as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
        .filter(col("mi") >= 0 && col("mi") < 24)
        .agg(sort_array(collect_list(struct(col("mi"), col("rev_c")))).as("g"))
        .select(explode(expr(
          """aggregate(g,
            |  struct(CAST(-1 AS BIGINT) AS prev, CAST(0 AS BIGINT) AS l,
            |    CAST(0 AS BIGINT) AS b,
            |    CAST(array() AS ARRAY<STRUCT<mi: BIGINT, l: BIGINT, b: BIGINT>>) AS out),
            |  (acc, x) -> IF(x.mi = acc.prev + 1,
            |    IF(acc.prev = -1,
            |      named_struct('prev', x.mi, 'l', x.rev_c,
            |        'b', CAST(0 AS BIGINT),
            |        'out', array_append(acc.out, named_struct('mi', x.mi,
            |          'l', x.rev_c, 'b', CAST(0 AS BIGINT)))),
            |      named_struct('prev', x.mi,
            |        'l', (300 * x.rev_c + 700 * (acc.l + acc.b)) div 1000,
            |        'b', (200 * (((300 * x.rev_c + 700 * (acc.l + acc.b)) div 1000)
            |          - acc.l) + 800 * acc.b) div 1000,
            |        'out', array_append(acc.out, named_struct('mi', x.mi,
            |          'l', (300 * x.rev_c + 700 * (acc.l + acc.b)) div 1000,
            |          'b', (200 * (((300 * x.rev_c + 700 * (acc.l + acc.b)) div 1000)
            |            - acc.l) + 800 * acc.b) div 1000)))),
            |    acc),
            |  acc -> acc.out)""".stripMargin)).as("r"))
        .select(col("r.mi").as("month_index"), col("r.l").as("level_cents"),
          col("r.b").as("trend_cents"),
          (col("r.l") + col("r.b")).as("forecast_next_cents"))
        .orderBy("month_index")
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
    // limiter at the mean rate drop during bursts? Sequential by nature,
    // but the horizon is 24 rows: the recurrence runs as one `aggregate`
    // HOF left fold over the hour-sorted grid array instead of the
    // recursive CTE's 24 sequential Spark jobs (q359 rationale; the
    // DuckDB oracle still replays WITH RECURSIVE, RecursiveRewriteSpec
    // pins rewrite ≡ recursive CTE). Anchor preserved: hour 0 starts
    // with a FULL bucket (available = cap), every later hour refills
    // r capped at cap — encoded as available = IF(first, cap, …).
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
        .agg(sort_array(collect_list(
          struct(col("hi"), col("arr"), col("r"), col("cap")))).as("g"))
        .select(explode(expr(
          """aggregate(g,
            |  struct(CAST(-1 AS BIGINT) AS prev, CAST(0 AS BIGINT) AS b,
            |    CAST(array() AS ARRAY<STRUCT<hi: BIGINT, arr: BIGINT,
            |      served: BIGINT, dropped: BIGINT, b: BIGINT>>) AS out),
            |  (acc, x) -> IF(x.hi = acc.prev + 1,
            |    named_struct('prev', x.hi,
            |      'b', IF(acc.prev = -1, x.cap, least(x.cap, acc.b + x.r))
            |        - least(x.arr, IF(acc.prev = -1, x.cap, least(x.cap, acc.b + x.r))),
            |      'out', array_append(acc.out, named_struct(
            |        'hi', x.hi, 'arr', x.arr,
            |        'served', least(x.arr,
            |          IF(acc.prev = -1, x.cap, least(x.cap, acc.b + x.r))),
            |        'dropped', x.arr - least(x.arr,
            |          IF(acc.prev = -1, x.cap, least(x.cap, acc.b + x.r))),
            |        'b', IF(acc.prev = -1, x.cap, least(x.cap, acc.b + x.r))
            |          - least(x.arr,
            |            IF(acc.prev = -1, x.cap, least(x.cap, acc.b + x.r)))))),
            |    acc),
            |  acc -> acc.out)""".stripMargin)).as("t"))
        .select(col("t.hi").as("hour_index"), col("t.arr").as("arrivals"),
          col("t.served").as("served"), col("t.dropped").as("dropped"),
          col("t.b").as("bucket_end"))
        .orderBy("hour_index")
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
          sum(col("c").cast(dec38) * col("score")).as("ssum"))  // hot-bigram count × micro-log wraps LONG at the 1e18 edge
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
          // cast BEFORE the square: z ~ months × monthly-mean grows with
          // SF and z² wraps LONG near z ≈ 3e9
          sum(col("z").cast(dec38) * col("z")).as("c0"),
          sum(col("z").cast(dec38) * col("z1")).as("c1"),
          sum(col("z").cast(dec38) * col("z2")).as("c2"))
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
  )
}
