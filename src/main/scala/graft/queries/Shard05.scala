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
private[graft] object Shard05 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

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
      // the label relation is candidate-bounded — broadcast its three
      // attachments (8 nested SortMergeJoins over ≤ thousands of rows
      // otherwise)
      val cin = cand
        .join(broadcast(lbl.select(col("u").as("doc_a"), col("l").as("la"))), "doc_a")
        .join(broadcast(lbl.select(col("u").as("doc_b"), col("l").as("lb"))), "doc_b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("l")).agg(count(lit(1)).as("in_c"))
      val cdeg = und.groupBy("u").agg(count(lit(1)).as("d"))
        .join(broadcast(lbl), "u")
        .groupBy("l").agg(sum(col("d")).as("deg_c"))
      val agg = cdeg.join(broadcast(cin), Seq("l"), "left").na.fill(0L, Seq("in_c"))
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
          // cast BEFORE the product: a pathological dup cluster can push
          // pair-graph degrees toward corpus scale, wrapping degree² LONGs
          sum(col("du").cast(dec38) * col("du")).as("sx2"),
          sum(col("du").cast(dec38) * col("dv")).as("sxy"))
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
      // the filtered edge relation is ≤ brands²/2 rows — broadcast the
      // two-hop attachment and the known-edge anti side (4 nested
      // SortMergeJoins over a few hundred rows otherwise)
      val ed = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val deg = ed.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      val twoHop = ed.select(col("u").as("a"), col("v").as("wnode"))
        .join(broadcast(ed.select(col("u").as("wnode"), col("v").as("b"))), "wnode")
        .filter(col("a") < col("b"))
        .join(broadcast(edges.select(col("u").as("a"), col("v").as("b"))),
          Seq("a", "b"), "left_anti")
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
          // cumulative-count × group-count products wrap LONG past
          // ~3e9 customers: widen before multiplying
          (abs(col("ca").cast(dec38) * col("nb")
            - col("cb").cast(dec38) * col("na")) *
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
      // cand feeds CC round-0 AND the undirected edge list, whose
      // references multiply through the three relaxation levels (up to 7
      // copies of the LSH candidate subtree in the final plan) — one lazy
      // localCheckpoint pins the signature pass to a single execution
      // (guide §5); the downstream joins then read executor-local blocks.
      val cand = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_a", "doc_b").localCheckpoint(false)
      val und = cand.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(cand.select(col("doc_b").as("u"), col("doc_a").as("v")))
      var dist = graft.operators.ConnectedComponents.labels(cand, "doc_a", "doc_b")
        .select(col("node").as("u"),
          when(col("node") === col("cluster_id"), 0L).otherwise(1000000L).as("d"))
      // the frontier relations are candidate-bounded (≤ nodes rows):
      // broadcast them so the 3 relaxation levels don't nest 56 tiny
      // SortMergeJoins (each 2 exchanges + 2 sorts) through the fan-out
      for (_ <- 1 to 3) {
        val nd = und.join(broadcast(dist), "u")
          .groupBy(col("v")).agg((min(col("d")) + lit(1L)).as("nd"))
        dist = dist.join(broadcast(nd.withColumnRenamed("v", "u")), Seq("u"), "left")
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
      // probe side spread across the cluster (r13): the broadcast block
      // join evaluates a JaroWinkler per matched pair in the JOIN
      // CONDITION, and a single-row-group part scan would run every one
      // of those ~5·|part| evaluations inside one task; pinned count
      // because AQE sizes coalescing by the exchange's (tiny) bytes
      val lhs = b.select(col("k").as("part_a"), col("p_brand").as("brand"),
        col("p_type").as("ptype"), col("p_name").as("name_a"))
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("brand"), col("ptype"))
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
  )
}
