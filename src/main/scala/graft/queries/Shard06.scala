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
private[graft] object Shard06 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

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
      // the part-pair edge graph (same block + similar names) contracts
      // exactly onto (brand, type, name) supernodes — the iterative CC
      // over 52k part-pair edges (quadratic in block size at scale)
      // collapses to one supernode aggregation + a per-block union-find
      // over the bounded name dictionary; equivalence vs the
      // uncontracted ConnectedComponents pipeline pinned in
      // GoldenRecordSpec, results hash-matched by the recursive-CTE
      // oracle
      graft.operators.GoldenRecord.clusters(b,
          Seq("p_brand", "p_type"), "p_name", "k", "price_c", "psize",
          simNames)
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

    // linear recursion (month-over-month cash projection: balance =
    // prior − 10% drawdown + that month's revenue cents) — the DuckDB
    // oracle replays it as WITH RECURSIVE statement-for-statement, and
    // the engine used to as well (Spark 4's recursive CTE). That
    // execution pays ONE SEQUENTIAL SPARK JOB PER LEVEL (24 jobs of
    // fixed scheduling cost for 24 rows; r12 bench 3.8 s). The
    // recurrence is a pure left fold over the month-sorted array, so
    // one `aggregate` HOF over the collected 24-row grid computes the
    // identical BIGINT algebra in a single job (guide §1.2: fix the
    // distributed algorithm — don't pay 24 barriers for 24 rows).
    // Recursion semantics preserved exactly: consumption starts at
    // mi = 0 and stops at the first gap (the CTE's join-empties
    // termination); RecursiveRewriteSpec pins rewrite ≡ recursive CTE.
    "q359_recursive_projection" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(expr("CAST((year(o_orderdate) - 1995) * 12" +
          " + month(o_orderdate) - 1 AS BIGINT)").as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
        // 24-month horizon — the projection length IS the latency knob
        .filter(col("mi") < 24)
        .agg(sort_array(collect_list(struct(col("mi"), col("rev_c")))).as("g"))
        .select(explode(expr(
          """aggregate(g,
            |  struct(CAST(-1 AS BIGINT) AS prev, CAST(0 AS BIGINT) AS b,
            |    CAST(array() AS ARRAY<STRUCT<mi: BIGINT, b: BIGINT>>) AS out),
            |  (acc, x) -> IF(x.mi = acc.prev + 1,
            |    named_struct('prev', x.mi,
            |      'b', acc.b - acc.b div 10 + x.rev_c,
            |      'out', array_append(acc.out, named_struct('mi', x.mi,
            |        'b', acc.b - acc.b div 10 + x.rev_c))),
            |    acc),
            |  acc -> acc.out)""".stripMargin)).as("r"))
        .select(col("r.mi").as("month_index"), col("r.b").as("balance_cents"))
        .orderBy("month_index")
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
      // baskets are REPARTITIONED BY cust (AFTER the checkpoint — a
      // LogicalRDD reports UnknownPartitioning, so the repartition node
      // is what downstream operators see): every keyed step — the pair
      // self-join (cust), the score groupBy (cust, rec), the seen-brand
      // anti-join (cust, rec), and the top-3 window (cust) — is then
      // satisfied by hash(cust) clustering, so the 24-way sims fan-out
      // (~7M rows at sf0.1) aggregates WITHOUT an exchange and all
      // consumers read the ONE reused cust exchange (guide §2.4:
      // establish the partitioning once)
      // lineitem repartitioned on the orders-join key straight off the
      // scan (r13): the single-row-group input scans as ONE task, so the
      // two dimension probes and the distinct's partial aggregation ran
      // serially; at scale this exchange coincides with the shuffle a
      // non-broadcast orders join needs anyway
      val baskets = Tables.lineitem(s, dir)
        .select("l_partkey", "l_orderkey")
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("l_orderkey"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("b")).distinct()
        .localCheckpoint(false)
        // partition count PINNED (r13): the advisory repartition(cust)
        // carries only a few MB, so AQE's byte-sized coalescing collapsed
        // it to ~one partition and serialized the 24-way fan-out
        // aggregate below (measured 4.6×: fan-out agg 1.38 → 0.30 s)
        .repartition(s.sessionState.conf.numShufflePartitions, col("cust"))
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
      // the anti side broadcasts (the basket relation is a bounded
      // |cust|·|brand| key list): a shuffled anti-join would force BOTH
      // sides onto hash(cust, rec) — co-partitioned joins require all
      // keys by default — re-exchanging the score relation the window
      // then re-exchanges back to hash(cust)
      val scores = baskets.join(broadcast(simsBoth), col("b") === col("ba"))
        .groupBy(col("cust"), col("bb").as("rec"))
        .agg(sum(col("sim_u")).as("score_u"))
        .join(broadcast(baskets.select(col("cust"), col("b").as("rec"))),
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
  )
}
